"""End-to-end FHE inference: a small CNN with ZERO client-side
nonlinearities (VERDICT round-1 item 8; reference concrete-ml
EXECUTE-mode semantics, quantized_module.py forward)."""

import numpy as np
import pytest

from tfhe_tpu import params as tp
from tfhe_tpu.ml.fhe_pipeline import (
    AccumulatorOverflow,
    FheLinear,
    FheSequential,
    FheTlu,
    conv2d_as_linear,
)

P = tp.TOY_SHORTINT  # space = 16 (2-bit msg x 2-bit carry)


def relu_q(v: int) -> int:
    return max(0, min(int(v), 3))  # ReLU clipped back to 2-bit activations


def test_linear_tlu_roundtrip():
    w = np.array([[1, -1], [1, 1], [-1, 1]])  # (C=3, O=2)
    net = FheSequential(
        [FheLinear(w, b_int=np.array([1, 0])), FheTlu(relu_q)], P, seed=5
    )
    net.compile(input_hi=3)
    x = np.array([[3, 0, 1], [2, 2, 2], [0, 3, 3]])
    enc = net.encrypt(x)
    out = net.run(enc)
    got = net.decrypt(out)
    np.testing.assert_array_equal(got, net.clear_forward(x))


def test_two_layer_mlp_end_to_end():
    """encrypt once -> linear -> TLU -> linear -> TLU -> decrypt once."""
    w1 = np.array([[1, -1, 1], [1, 1, -1]])  # (2, 3)
    w2 = np.array([[1, 1], [-1, 1], [1, -1]])  # (3, 2)
    net = FheSequential(
        [FheLinear(w1), FheTlu(relu_q), FheLinear(w2), FheTlu(relu_q)],
        P, seed=6,
    )
    net.compile(input_hi=3)
    x = np.array([[3, 1], [0, 2], [2, 3], [1, 1]])
    got = net.decrypt(net.run(net.encrypt(x)))
    np.testing.assert_array_equal(got, net.clear_forward(x))


def test_small_cnn_zero_client_nonlinearities():
    """3x3 ternary conv -> ReLU TLU -> 1x1 'pool'/classifier -> TLU on a
    4x4 single-channel image, fully under FHE."""
    rng = np.random.default_rng(3)
    conv_w = rng.integers(-1, 2, size=(2, 1, 3, 3))  # ternary (Cout=2)
    conv = conv2d_as_linear(conv_w, in_hw=(4, 4))
    # classifier over the 2x(2x2) conv outputs, ternary
    head = FheLinear(rng.integers(-1, 2, size=(8, 2)))
    net = FheSequential(
        [conv, FheTlu(relu_q), head, FheTlu(lambda v: max(-8, min(7, v)) + 8)],
        P, seed=7,
    )
    net.compile(input_hi=1)  # binary pixels keep the conv accumulator small
    img = rng.integers(0, 2, size=(2, 16))  # batch of 2 flat images
    got = net.decrypt(net.run(net.encrypt(img)))
    np.testing.assert_array_equal(got, net.clear_forward(img))


def test_accumulator_overflow_fails_closed():
    w = np.full((8, 1), 3)  # sum up to 8*3*3 = 72 >> 16
    net = FheSequential([FheLinear(w), FheTlu(relu_q)], P)
    with pytest.raises(AccumulatorOverflow, match="accumulator"):
        net.compile(input_hi=3)


def test_signed_offset_encoding():
    """Negative accumulators are offset into the table correctly."""
    w = np.array([[-1], [-1]])  # acc in [-6, 0]
    net = FheSequential(
        [FheLinear(w), FheTlu(lambda v: abs(v) % 4)], P, seed=8
    )
    net.compile(input_hi=3)
    x = np.array([[3, 3], [1, 2], [0, 0]])
    got = net.decrypt(net.run(net.encrypt(x)))
    np.testing.assert_array_equal(got, net.clear_forward(x))
