"""Stroke classification under FULL FHE: encrypt once, every layer
(conv, thresholds, linear head) runs server-side, decrypt once.

The flagship ML path (the reference's concrete-ml EXECUTE semantics:
quantized_module.py forward runs the whole circuit, TLUs included,
under FHE). A small integer conv net classifies 5x5 images into
horizontal-bar / vertical-bar / diagonal strokes (synthetic — this
image has zero egress), evaluated homomorphically: the server sees only
LWE ciphertexts. The net demonstrates the accumulator discipline the
compile() gate enforces: every linear combination fits the 16-value
msg*carry space before the next PBS requantizes it.

Run: python examples/fhe_digits_demo.py  (CPU, ~2 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tfhe_tpu import params as tp
from tfhe_tpu.ml.fhe_pipeline import (
    FheLinear,
    FheSequential,
    FheTlu,
    conv2d_as_linear,
)

P = tp.TOY_SHORTINT  # 2-bit message x 2-bit carry = 16-value space


def make_strokes(n_per_class: int, rng):
    """5x5 images, pixel values in [0, 3]: a full-intensity stroke over
    0/1 speckle noise. Classes: horizontal bar, vertical bar, diagonal."""
    X, y = [], []
    for cls in range(3):
        for _ in range(n_per_class):
            img = rng.integers(0, 2, (5, 5))
            pos = rng.integers(1, 4)
            if cls == 0:
                img[pos, :] = 3
            elif cls == 1:
                img[:, pos] = 3
            else:
                for i in range(5):
                    img[i, i] = 3
            X.append(img)
            y.append(cls)
    return np.array(X), np.array(y)


def main():
    rng = np.random.default_rng(0)
    Xte, yte = make_strokes(8, rng)

    # integer feature detectors (QAT-style weights): each 3x3 kernel has
    # two +1 taps aligned with its stroke direction. On-stroke both taps
    # read 3 (sum 6); any other class crosses at most ONE tap (sum <= 4),
    # so a >=5 threshold TLU fires only on the true class.
    kern = np.zeros((3, 1, 3, 3), dtype=np.int64)
    kern[0, 0, 1, 0] = kern[0, 0, 1, 2] = 1  # horizontal pair
    kern[1, 0, 0, 1] = kern[1, 0, 2, 1] = 1  # vertical pair
    kern[2, 0, 0, 0] = kern[2, 0, 2, 2] = 1  # diagonal pair

    def fires(v: int) -> int:
        return 1 if v >= 5 else 0  # strong-activation detector

    conv = conv2d_as_linear(kern, in_hw=(5, 5))  # (3 classes x 3x3 grid)
    # head: count firings per class channel; a stroke fires 3 of the 9
    # positions, so the accumulator stays in [0, 9] (< 16-value space)
    head = FheLinear(np.kron(np.eye(3, dtype=np.int64),
                             np.ones((9, 1), dtype=np.int64)))
    net = FheSequential([conv, FheTlu(fires), head], P, seed=3)
    net.compile(input_hi=3)

    enc = net.encrypt(Xte.reshape(len(Xte), -1))
    out = net.run(enc)  # every op under FHE server-side
    scores = net.decrypt(out)  # (B, 3)
    pred = np.argmax(scores, axis=1)
    acc = float((pred == yte).mean())

    clear = net.clear_forward(Xte.reshape(len(Xte), -1))
    agree = float((np.argmax(clear, axis=1) == pred).mean())
    print(f"FHE accuracy: {acc:.2f} over {len(yte)} strokes "
          f"(agreement with clear pipeline: {agree:.2f})")
    assert agree == 1.0, "FHE run must match the clear integer pipeline"
    assert acc >= 0.9, acc
    print("OK: conv + threshold TLU + linear head, all under FHE")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
