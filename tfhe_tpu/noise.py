"""Analytic noise estimation for parameter validation and simulation mode.

The reference ships empirical noise profiles keyed by crypto-params hash
(reference: ml/extensions/src/concrete_ml_extensions/utils_simulation.py
:48-70 + noise_profiles/MANIFEST.json) and relies on tfhe-rs' parameter
optimizer for the shortint sets. This module provides the standard TFHE
variance calculus instead: closed-form variances for each pipeline stage,
composed into a per-parameter-set failure probability. Used by tests to
validate that the shipped parameter sets actually decrypt, and by the
simulation mode to sample realistic noise without running crypto.

Conventions: variances in absolute torus units (q = 2^64); binary secrets
(mean 1/2, variance 1/4).
"""

from __future__ import annotations

import math

from tfhe_tpu.params import (
    BooleanParams,
    GadgetParams,
    Q_BITS,
    ShortintParams,
)

Q = 2.0**Q_BITS


def keyswitch_variance(
    n_in: int, gadget: GadgetParams, key_noise_var: float
) -> float:
    """Added variance of an LWE keyswitch with balanced base-B digits.

    Two terms: (1) decomposition rounding -- the discarded low bits act as
    uniform noise of width q/B^level per input coefficient times the
    secret; (2) digit-weighted key noise.
    """
    b, l = gadget.base_log, gadget.level
    base = 2.0**b
    # digit variance for balanced digits ~ Uniform(-B/2, B/2): B^2/12
    digit_var = (base**2) / 12.0
    key_term = n_in * l * digit_var * key_noise_var
    # rounding: dropped tail is ~ Uniform(0, q/B^l) times binary secret
    tail = Q / (base**l)
    round_term = n_in * (tail**2 / 12.0) * 0.25
    return key_term + round_term


def external_product_variance(
    k: int, n_poly: int, gadget: GadgetParams, key_noise_var: float
) -> float:
    """Added variance of one external product (GGSW x GLWE)."""
    b, l = gadget.base_log, gadget.level
    base = 2.0**b
    digit_var = (base**2) / 12.0
    key_term = (k + 1) * l * n_poly * digit_var * key_noise_var
    tail = Q / (base**l)
    round_term = k * n_poly * (tail**2 / 12.0) * 0.25
    return key_term + round_term


def blind_rotate_variance(
    n_lwe: int, k: int, n_poly: int, gadget: GadgetParams, key_noise_var: float
) -> float:
    """n CMuxes, each one external product.

    The fused TPU kernel evaluates CMux as acc += (X^a - 1) * EP(acc)
    (ops/pallas_blind_rotate.py): the (X^a - 1) factor doubles the EP
    noise variance (two monomial copies), hence the factor 2 -- a
    conservative bound that also covers the rotate-then-EP form the XLA
    scan uses (whose factor is 1)."""
    return 2.0 * n_lwe * external_product_variance(
        k, n_poly, gadget, key_noise_var
    )


def mod_switch_variance(n_lwe: int, n_poly: int) -> float:
    """Rounding q -> 2N before blind rotation (scaled back to q units)."""
    step = Q / (2 * n_poly)
    return (n_lwe * 0.25 + 1.0) * (step**2) / 12.0


def pbs_output_variance(p: ShortintParams | BooleanParams) -> float:
    """Variance of a fresh PBS output (before any linear ops)."""
    return blind_rotate_variance(
        p.lwe_dimension,
        p.glwe_dimension,
        p.polynomial_size,
        p.pbs,
        p.glwe_noise.variance_torus(),
    )


def atom_input_variance(p: ShortintParams | BooleanParams, noise_level: int = 1) -> float:
    """Variance at the input of the blind rotation for the standard atom:
    fresh/PBS ct (scaled by noise_level) -> keyswitch -> mod switch."""
    v = pbs_output_variance(p) * noise_level
    v += keyswitch_variance(
        p.glwe_dimension * p.polynomial_size, p.ks, p.lwe_noise.variance_torus()
    )
    v += mod_switch_variance(p.lwe_dimension, p.polynomial_size)
    return v


def failure_probability(p: ShortintParams, noise_level: int | None = None) -> float:
    """Per-PBS decryption/rotation failure probability for the shortint
    atom: the phase must stay within half a LUT box of its code.

    noise_level defaults to the scheme's worst legal pre-PBS state
    (message+carry space fully used; tfhe-rs max_noise_level analog).
    """
    if noise_level is None:
        noise_level = p.message_modulus  # conservative: several summed cts
    var = atom_input_variance(p, noise_level)
    std = math.sqrt(var)
    # margin: half a plaintext box
    margin = Q / (2 * p.plaintext_modulus)
    return math.erfc(margin / (std * math.sqrt(2.0)))


def boolean_failure_probability(p: BooleanParams) -> float:
    """Gate failure: after the linear combination of <= 2 cts + constant,
    the phase must stay within 1/16 of the torus of its nominal point
    (gap between the +-1/8 codes and the sign boundary is 1/8; linear
    combos double input noise)."""
    v = 2.0 * atom_input_variance(p, 1)
    std = math.sqrt(v)
    margin = Q / 16.0
    return math.erfc(margin / (std * math.sqrt(2.0)))
