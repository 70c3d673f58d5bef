"""Noise estimator: shipped parameter sets must have sound margins, and the
analytic model must agree with measured noise on toy params."""

import math

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import noise, params
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng


def test_fhevm_params_fail_below_2e64():
    p = params.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    pfail = noise.failure_probability(p)
    assert pfail < 2.0**-64, f"p_fail={pfail:.3e}"


def test_1_1_params_sound():
    p = params.PARAM_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128
    assert noise.failure_probability(p) < 2.0**-64


def test_boolean_params_sound():
    p = params.BOOLEAN_PARAMS_128
    assert noise.boolean_failure_probability(p) < 2.0**-64


def test_toy_params_usable():
    # toy sets trade security AND margin for speed (N=128 makes the
    # mod-switch term dominant); 2^-25 per PBS keeps a multi-thousand-PBS
    # test suite reliable
    assert noise.failure_probability(params.TOY_SHORTINT) < 2.0**-25


def test_measured_pbs_noise_within_model():
    """Empirical PBS output noise should sit near (and within ~4x of) the
    analytic prediction -- the simulation-mode contract."""
    p = params.TOY_SHORTINT
    ck, sk = si.keygen(p, seed=61)
    rng = FheRng(62)
    vals = jnp.zeros((256,), dtype=jnp.uint64)
    c = si.encrypt(ck, vals, rng)
    out = si.apply_function(sk, c, lambda v: v)
    from tfhe_tpu.core.lwe import decrypt_lwe

    phase = np.asarray(decrypt_lwe(ck.big_lwe_key, out.ct)).astype(np.int64)
    measured_var = float(np.mean(phase.astype(np.float64) ** 2))
    predicted = noise.pbs_output_variance(p)
    assert measured_var < 16.0 * predicted
    assert measured_var > predicted / 16.0
