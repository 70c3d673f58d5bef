"""Sampled operator corpus at PRODUCTION parameters on the real chip.

The default-tier corpus (tests/test_operator_corpus_full.py) pins
operator SEMANTICS at noiseless TOY params; bench.py's decrypt gate
covers one LUT shape at production params. This bridges the gap
(VERDICT r4 item 4): every radix op family, one width, enc-enc AND
scalar variants, at PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 with
REAL noise, decrypt-verified element by element on whatever backend is
default (the TPU chip under the driver). Writes BENCH_CORPUS_CHIP.json
with per-op pass counts.

Reference analog: fhevmOperations1-13.ts runs its 2,394 cases at the
real coprocessor parameter set; this is the sampled equivalent.

Usage: python scripts/bench_corpus_chip.py [artifact_path]
The case table is importable (`CASES`, `run_corpus`) so the slow-tier
test (tests/test_corpus_chip.py) reuses it.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _cases():
    """[(name, fn(sk, a_ct, b_ct, scalar) -> ct_or_bool, clear fn,
    kind)] with kind in {bin, cmp, un, scalar, shift, select, cast,
    divrem}. One width (8 bits), NVEC vector elements per case."""
    from tfhe_tpu.models import integer as ri

    cases = []
    bin_ops = [
        ("add", ri.add, lambda a, b: (a + b) % 256),
        ("sub", ri.sub, lambda a, b: (a - b) % 256),
        ("mul", ri.mul, lambda a, b: (a * b) % 256),
        ("bitand", ri.bitand, lambda a, b: a & b),
        ("bitor", ri.bitor, lambda a, b: a | b),
        ("bitxor", ri.bitxor, lambda a, b: a ^ b),
        ("min", ri.min_, lambda a, b: min(a, b)),
        ("max", ri.max_, lambda a, b: max(a, b)),
    ]
    for name, fn, clear in bin_ops:
        cases.append((name, "bin", fn, clear))
    cmp_ops = [
        ("eq", ri.eq, lambda a, b: int(a == b)),
        ("ne", ri.ne, lambda a, b: int(a != b)),
        ("lt", ri.lt, lambda a, b: int(a < b)),
        ("le", ri.le, lambda a, b: int(a <= b)),
        ("gt", ri.gt, lambda a, b: int(a > b)),
        ("ge", ri.ge, lambda a, b: int(a >= b)),
    ]
    for name, fn, clear in cmp_ops:
        cases.append((name, "cmp", fn, clear))
    cases.append(("neg", "un", ri.neg, lambda a: (-a) % 256))
    cases.append(("bitnot", "un", ri.bitnot, lambda a: a ^ 0xFF))
    scalar_ops = [
        ("scalar_add", ri.scalar_add, lambda a, s: (a + s) % 256),
        ("scalar_sub", ri.scalar_sub, lambda a, s: (a - s) % 256),
        ("scalar_mul", ri.scalar_mul, lambda a, s: (a * s) % 256),
        ("scalar_bitand", ri.scalar_bitand, lambda a, s: a & s),
        ("scalar_eq", ri.scalar_eq, lambda a, s: int(a == s)),
        ("scalar_div", ri.scalar_div, lambda a, s: a // s),
        ("scalar_rem", ri.scalar_rem, lambda a, s: a % s),
    ]
    for name, fn, clear in scalar_ops:
        cases.append((name, "scalar", fn, clear))
    shift_ops = [
        ("shl", ri.shl, lambda a, r: (a << r) % 256),
        ("shr", ri.shr, lambda a, r: a >> r),
        ("rotl", ri.rotl, lambda a, r: ((a << r) | (a >> (8 - r))) % 256),
        ("rotr", ri.rotr, lambda a, r: ((a >> r) | (a << (8 - r))) % 256),
    ]
    for name, fn, clear in shift_ops:
        cases.append((name, "shift", fn, clear))
    cases.append(("div_rem", "divrem", ri.div_rem,
                  lambda a, b: (a // b, a % b)))
    cases.append(("select", "select", ri.select, None))
    cases.append(("cast_8_16", "cast", lambda sk, a: ri.cast(sk, a, 16),
                  lambda a: a))
    cases.append(("cast_8_4", "cast", lambda sk, a: ri.cast(sk, a, 4),
                  lambda a: a % 16))
    cases.append(("shl_enc", "shift_enc", ri.shl_enc,
                  lambda a, r: (a << r) % 256))
    return cases


CASE_NAMES = [
    "add", "sub", "mul", "bitand", "bitor", "bitxor", "min", "max",
    "eq", "ne", "lt", "le", "gt", "ge", "neg", "bitnot",
    "scalar_add", "scalar_sub", "scalar_mul", "scalar_bitand",
    "scalar_eq", "scalar_div", "scalar_rem",
    "shl", "shr", "rotl", "rotr", "div_rem", "select",
    "cast_8_16", "cast_8_4", "shl_enc",
]


def run_corpus(params=None, nvec: int = 8, ops=None, progress=print):
    """Run the sampled corpus; returns the result dict (per-op counts).

    Every (op, variant) is one device program over an nvec-element
    batch; each element decrypt-compares against Python clear math."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tfhe_tpu import params as tp
    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng
    from tfhe_tpu.utils import keycache

    P = params or tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    t0 = time.time()
    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
    keygen_s = time.time() - t0
    progress(f"keygen {keygen_s:.0f}s (warm={kinfo['hit']})")

    rng = np.random.default_rng(77)
    a_v = rng.integers(0, 256, size=nvec, dtype=np.uint64)
    b_v = rng.integers(0, 256, size=nvec, dtype=np.uint64)
    # edges in every vector: 0, max, equal pair
    a_v[0], b_v[0] = 0, 255
    a_v[1], b_v[1] = 255, 255
    a_v[2], b_v[2] = 170, 170
    b_nz = np.where(b_v == 0, np.uint64(1), b_v)  # div needs nonzero

    U64 = jnp.uint64
    enc = lambda v, seed: ri.encrypt_radix(
        ck, jnp.asarray(v, dtype=U64), 8, FheRng(seed)
    )
    a_ct = enc(a_v, 31)
    b_ct = enc(b_v, 32)
    bnz_ct = enc(b_nz, 33)

    results, total_pass, total_fail = {}, 0, 0
    wanted = set(ops) if ops else None
    for case in _cases():
        name, kind = case[0], case[1]
        if wanted and name not in wanted:
            continue
        t1 = time.time()
        try:
            if kind == "bin":
                _, fn, clear = case[0], case[2], case[3]
                out = ri.decrypt_radix(ck, fn(sk, a_ct, b_ct))
                want = [clear(int(a), int(b)) for a, b in zip(a_v, b_v)]
            elif kind == "cmp":
                fn, clear = case[2], case[3]
                res = fn(sk, a_ct, b_ct)
                out = si.decrypt(ck, res) if isinstance(res, si.Ciphertext) \
                    else ri.decrypt_radix(ck, res)
                want = [clear(int(a), int(b)) for a, b in zip(a_v, b_v)]
            elif kind == "un":
                fn, clear = case[2], case[3]
                out = ri.decrypt_radix(ck, fn(sk, a_ct))
                want = [clear(int(a)) for a in a_v]
            elif kind == "scalar":
                fn, clear = case[2], case[3]
                s = 29
                res = fn(sk, a_ct, s)
                out = si.decrypt(ck, res) if isinstance(res, si.Ciphertext) \
                    else ri.decrypt_radix(ck, res)
                want = [clear(int(a), s) for a in a_v]
            elif kind == "shift":
                fn, clear = case[2], case[3]
                r = 3
                out = ri.decrypt_radix(ck, fn(sk, a_ct, r))
                want = [clear(int(a), r) for a in a_v]
            elif kind == "shift_enc":
                fn, clear = case[2], case[3]
                amt = enc(np.full(nvec, 3, dtype=np.uint64), 34)
                out = ri.decrypt_radix(ck, fn(sk, a_ct, amt))
                want = [clear(int(a), 3) for a in a_v]
            elif kind == "divrem":
                fn, clear = case[2], case[3]
                q, r_ = fn(sk, a_ct, bnz_ct)
                out = list(np.asarray(ri.decrypt_radix(ck, q))) + list(
                    np.asarray(ri.decrypt_radix(ck, r_))
                )
                want = [clear(int(a), int(b))[0] for a, b in zip(a_v, b_nz)]
                want += [clear(int(a), int(b))[1] for a, b in zip(a_v, b_nz)]
            elif kind == "select":
                cond_bits = (a_v % 2).astype(np.uint64)
                cond = si.encrypt(ck, jnp.asarray(cond_bits), FheRng(35))
                out = ri.decrypt_radix(ck, ri.select(sk, cond, a_ct, b_ct))
                want = [int(a) if c else int(b)
                        for a, b, c in zip(a_v, b_v, cond_bits)]
            elif kind == "cast":
                fn, clear = case[2], case[3]
                out = ri.decrypt_radix(ck, fn(sk, a_ct))
                want = [clear(int(a)) for a in a_v]
            out = [int(x) for x in np.asarray(out).ravel()]
            npass = sum(int(o == w) for o, w in zip(out, want))
            nfail = len(want) - npass
        except Exception as exc:  # noqa: BLE001 -- per-op isolation
            npass, nfail = 0, nvec
            results[name] = {"pass": 0, "fail": nvec,
                             "error": str(exc)[:200]}
            progress(f"{name}: ERROR {exc}")
            total_fail += nfail
            continue
        dt = time.time() - t1
        results[name] = {"pass": npass, "fail": nfail,
                         "seconds": round(dt, 1)}
        total_pass += npass
        total_fail += nfail
        progress(f"{name}: {npass}/{npass + nfail} in {dt:.0f}s")

    return {
        "metric": "corpus_chip_pass_rate",
        "value": round(total_pass / max(total_pass + total_fail, 1), 4),
        "unit": "fraction",
        "vs_baseline": 1.0,
        "detail": {
            "params": P.name,
            "backend": jax.default_backend(),
            "nvec": nvec,
            "element_assertions": total_pass + total_fail,
            "passed": total_pass,
            "failed": total_fail,
            "keygen_s": round(keygen_s, 1),
            "per_op": results,
        },
    }


def main():
    art = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_CORPUS_CHIP.json"
    )
    from tfhe_tpu.utils.xlacache import enable_persistent_cache

    enable_persistent_cache()
    res = run_corpus()
    with open(art, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "detail"}))
    print(json.dumps(res["detail"]["per_op"], indent=1))
    sys.exit(0 if res["detail"]["failed"] == 0 else 1)


if __name__ == "__main__":
    main()
