"""Distributed PBS: batch sharding + intra-PBS tensor sharding via shard_map.

The full step (keyswitch -> blind rotate -> sample extract) runs under
`jax.shard_map` over a ("data", "model") mesh:

  * ciphertext batch is sharded over "data" (no communication),
  * the keyswitch key is sharded over its input dimension and the bootstrap
    key over its GGSW decomposition rows along "model"; each device MACs its
    shard in the NTT domain and the partial residue sums are reduced with
    `lax.psum` over ICI before the inverse transform.

This is the TPU-native replacement for the reference's service-level
distribution (redis queue + worker pool + rayon; SURVEY.md section 2
"Distributed communication backend"): collectives inside one program
instead of microservices.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tfhe_tpu.core.bootstrap import BootstrapKey
from tfhe_tpu.core.ggsw import (
    contract_residues,
    decompose_forward,
    finalize_residues,
)
from tfhe_tpu.core.lwe import KeyswitchKey, sample_extract
from tfhe_tpu.ops.polynomial import NegacyclicEngine
from tfhe_tpu.torus import mod_switch, negacyclic_monomial_rotate, signed_decompose

U64 = jnp.uint64


def _keyswitch_sharded(ct, ksk_local, gadget, axis: str):
    """Keyswitch with the KSK sharded over its n_in axis along `axis`.

    Same int8-limb contraction as core.lwe.keyswitch (TPUs have no 64-bit
    dot); partial sums psum over the model axis.
    """
    from tfhe_tpu.core.lwe import _u64_to_nibbles

    n_loc, level, m = ksk_local.shape
    idx = lax.axis_index(axis)
    mask = ct[..., :-1]
    body = ct[..., -1]
    digits = signed_decompose(mask, gadget)  # (..., n_in, level)
    local = lax.dynamic_slice_in_dim(digits, idx * n_loc, n_loc, axis=-2)
    flat = local.reshape(*local.shape[:-2], n_loc * level).astype(jnp.int8)
    limbs = _u64_to_nibbles(ksk_local.reshape(n_loc * level, m))
    partial = None
    for l in range(16):
        p = jnp.matmul(flat, limbs[l], preferred_element_type=jnp.int32)
        term = p.astype(jnp.int64).astype(U64) << U64(4 * l)
        partial = term if partial is None else partial + term
    total = lax.psum(partial, axis)
    out = -total
    return out.at[..., -1].add(body)


def _blind_rotate_sharded(
    lut, lwe_ct, bsk_local, gadget, engine, axis: str, shift: int = 0
):
    """Blind rotation with the BSK sharded over GGSW rows along `axis`."""
    n_poly = lut.shape[-1]
    two_n = 2 * n_poly
    log_2n = int(math.log2(two_n))
    d_loc = bsk_local.shape[1]
    idx = lax.axis_index(axis)

    ms = mod_switch(lwe_ct, log_2n)
    a_t = ms[..., :-1]
    b_t = ms[..., -1]
    acc = negacyclic_monomial_rotate(lut, (U64(two_n) - b_t)[..., None])
    acc = jnp.broadcast_to(acc, b_t.shape + (lut.shape[-2], n_poly))
    a_steps = jnp.moveaxis(a_t, -1, 0)

    def step(carry, xs):
        bsk_j, a_j = xs  # (D_loc, k+1, P, N), (...,)
        rot = negacyclic_monomial_rotate(carry, a_j[..., None])
        fd = decompose_forward(rot - carry, gadget, engine)  # (..., D, P, N)
        fd_loc = lax.dynamic_slice_in_dim(fd, idx * d_loc, d_loc, axis=-3)
        res = contract_residues(bsk_j, fd_loc, engine)
        res = lax.psum(res, axis)
        carry = carry + finalize_residues(res, engine, shift=shift)
        return carry, None

    acc, _ = jax.lax.scan(step, acc, (bsk_local, a_steps))
    return acc


def make_sharded_pbs_step(
    mesh: Mesh,
    engine: NegacyclicEngine,
    ks_gadget,
    pbs_gadget,
    bsk_shift: int | None = None,
):
    """Build the jitted distributed PBS step.

    Returns step(cts, lut, bsk_ntt, ksk_arr) where
      cts:     (B, big_n+1) u64, sharded over "data"
      lut:     (k+1, N) u64, replicated
      bsk_ntt: (n, D, k+1, P, L, N), sharded over "model" on the D axis
      ksk_arr: (n_in, level, n_small+1), sharded over "model" on n_in
    and returns (B, big_n+1) bootstrapped ciphertexts sharded over "data".

    bsk_shift MUST match the key's modulus-switched storage
    (BootstrapKey.shift -- keygen now derives it from the CRT headroom,
    so a hardcoded value goes silently wrong).
    """
    assert bsk_shift is not None, "pass bsk_shift=sk.bsk.shift"

    def step(cts, lut, bsk_ntt, ksk_arr):
        small = _keyswitch_sharded(cts, ksk_arr, ks_gadget, "model")
        acc = _blind_rotate_sharded(
            lut, small, bsk_ntt, pbs_gadget, engine, "model", shift=bsk_shift
        )
        return sample_extract(acc, 0)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("data", None),
            P(None, None),
            P(None, "model", None, None, None),
            P("model", None, None),
        ),
        out_specs=P("data", None),
        check_vma=False,
    )
    return jax.jit(sharded)
