"""tfhe-tpu: a TPU-native TFHE (torus fully homomorphic encryption) framework.

Built from scratch in JAX/XLA/Pallas. The reference ecosystem (`luxfi/tfhe`,
see /root/repo/SURVEY.md) delegates its crypto engine to tfhe-rs consumed via
WASM/pyo3; this framework implements the whole pipeline natively as batched
TPU programs:

  - torus arithmetic mod 2^64 on uint64 tensors (wrapping semantics),
  - exact negacyclic polynomial multiplication via CRT-NTT over 31-bit
    primes with 16-bit limb decomposition (no f64 FFT -- TPUs have none),
  - GLWE/LWE/GGSW encryption, gadget decomposition, external product, CMux,
  - programmable bootstrapping (blind rotation as a `lax.scan` of batched
    CMuxes with NTT-domain bootstrap keys resident in HBM),
  - LWE keyswitch / packing keyswitch / sample extract / modulus switch,
  - boolean gate, shortint (2-bit message + 2-bit carry) and radix big-int
    layers (ebool, euint8..euint256) whose operation semantics mirror the
    reference's fhevm operator corpus (reference:
    tests/fhevm-suite/e2e/contracts/operations/*.sol),
  - batch/key sharding over `jax.sharding.Mesh` + a batched-PBS dispatcher.

Everything is batched over a leading ciphertext axis from day one: a
"ciphertext" is a tensor, a thousand bootstraps is the same program as one.
"""

import jax as _jax

# The entire framework computes on the 64-bit discretized torus: torus
# elements are uint64 with natural wraparound. JAX disables 64-bit types by
# default; enable them before any tfhe_tpu array is created.
_jax.config.update("jax_enable_x64", True)

from tfhe_tpu import params as params
from tfhe_tpu import rng as rng
from tfhe_tpu.version import __version__ as __version__
