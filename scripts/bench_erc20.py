"""BASELINE config 4: encrypted-ERC20 transfer throughput.

One transfer (EncryptedERC20.sol semantics; reference benchmark flow
e2e_old/test/benchmarks/erc20.ts:20-76):

    canPay = amount <= balance[from]   (FHE.le, euint64)
    moved  = select(canPay, amount, 0)
    balance[from] -= moved; balance[to] += moved

All four ops run BATCHED over `batch` independent transfers (the
production serving shape: the radix layer carries a leading batch axis),
at the full fhevm parameter set on the default backend. Writes
BENCH_ERC20.json. Run: python scripts/bench_erc20.py [batch] [iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from tfhe_tpu.utils.xlacache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from tfhe_tpu import params as tp
    from tfhe_tpu.models import integer as ri
    from tfhe_tpu.models import shortint as si
    from tfhe_tpu.rng import FheRng

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    bits = 64

    # multi-bit server key by default (the production engine; 1.8x the
    # classic PBS rate); TFHE_BENCH_CLASSIC=1 uses the classic key
    import os

    if os.environ.get("TFHE_BENCH_CLASSIC"):
        P = tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
        mb_group = None
    else:
        P = tp.PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
        mb_group = 3
    from tfhe_tpu.utils import keycache

    ck, sk, kinfo = keycache.load_or_keygen(P, seed=1, multibit_group=mb_group)
    jax.device_get(sk.bsk.bsk_ntt.ravel()[:1])
    keygen_s = kinfo["seconds"]

    rng = np.random.default_rng(3)
    bal = rng.integers(0, 1 << 32, batch, dtype=np.uint64)
    amt = rng.integers(0, 1 << 33, batch, dtype=np.uint64)  # some overdraw
    e_bal = ri.encrypt_radix(ck, jnp.asarray(bal), bits, FheRng(5))
    e_amt = ri.encrypt_radix(ck, jnp.asarray(amt), bits, FheRng(6))

    def transfer(balance, amount):
        can_pay = ri.le(sk, amount, balance)
        zero = ri.trivial_radix(P, jnp.zeros(amount.batch_shape, dtype=jnp.uint64), bits)
        moved = ri.select(sk, can_pay, amount, zero)  # trivial-zero fast path
        # one stacked carry chain for both balance updates
        new_to, new_from = ri.add_sub(sk, balance, moved)
        return new_from, new_to

    t1 = time.time()
    nf, nt = transfer(e_bal, e_amt)
    jax.device_get(nf.blocks.ravel()[:1])
    compile_s = time.time() - t1

    # correctness gate
    got_f = np.asarray(ri.decrypt_radix(ck, nf))
    moved = np.where(amt <= bal, amt, 0)
    np.testing.assert_array_equal(got_f, bal - moved)

    t2 = time.time()
    for _ in range(iters):
        nf, nt = transfer(e_bal, e_amt)
    jax.device_get(nf.blocks.ravel()[:1])
    dt = time.time() - t2

    per_s = batch * iters / dt
    result = {
        "metric": "erc20_transfers_per_sec_per_chip",
        "value": round(per_s, 3),
        "unit": "transfers/s",
        "detail": {
            "params": P.name,
            "bits": bits,
            "batch": batch,
            "iters": iters,
            "s_per_transfer_batched": round(dt / (batch * iters), 3),
            "keygen_s": round(keygen_s, 1),
            "keygen_warm_start": kinfo["hit"],
            "compile_s": round(compile_s, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_ERC20.json"), "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
