"""Parameter sets for the TPU-native TFHE framework.

Parameters follow the "canonical JSON + SHA-256 hash" convention of the
reference (reference: ml/extensions/rust/src/fhext_classes.rs:100-114 and
ml/extensions/src/concrete_ml_extensions/utils_simulation.py:9-12), which is
what makes test vectors and noise profiles reproducible: a parameter set
serializes to a canonical JSON blob and is keyed by its hash.

Naming mirrors the reference's default sets (reference:
sdk/relayer/src/tfhe.ts:14-26, ml/extensions/rust/src/radix_utils.rs:11-18):
`PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128` is the fhevm workhorse
(2-bit message + 2-bit carry shortint blocks over a q=2^64 torus). The exact
numeric constants of tfhe-rs live in the external pinned crate and are not
vendored in the reference checkout, so the sets below are re-derived from the
same structure (k, N, decomposition levels, TUniform noise) with bounds
validated by this package's noise estimator (`tfhe_tpu.noise`); operation
semantics -- what the fhevm operator corpus actually pins -- are preserved
exactly.

All ciphertext moduli are q = 2^64 (native u64 wraparound).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import math
from typing import Optional

Q_BITS = 64  # ciphertext modulus log2: q = 2^64, native uint64 wraparound


@dataclasses.dataclass(frozen=True)
class NoiseDistribution:
    """Noise sampler spec.

    kind:
      - "tuniform": TUniform(bound_log2) -- uniform over [-2^b, 2^b] where
        every value has probability 2^-(b+1) except the two bounds which have
        2^-(b+2) (the tfhe-rs TUniform definition; reference param names end
        in _TUNIFORM_2M128, e.g. sdk/relayer/src/tfhe.ts:14).
      - "gaussian": centered gaussian with std expressed in torus units
        (fraction of q), rounded to u64.
      - "zero": no noise (toy/test parameters only).
    """

    kind: str
    bound_log2: Optional[int] = None  # tuniform
    std: Optional[float] = None  # gaussian, as fraction of q

    def variance_torus(self) -> float:
        """Variance in absolute u64 units (q = 2^64)."""
        if self.kind == "zero":
            return 0.0
        if self.kind == "tuniform":
            # Var of TUniform(b): (2^(2b+1) + 1) / 6  (exact).
            b = self.bound_log2
            return (2.0 ** (2 * b + 1) + 1.0) / 6.0
        if self.kind == "gaussian":
            return (self.std * 2.0**Q_BITS) ** 2
        raise ValueError(f"unknown noise kind {self.kind}")

    @staticmethod
    def tuniform(bound_log2: int) -> "NoiseDistribution":
        return NoiseDistribution(kind="tuniform", bound_log2=bound_log2)

    @staticmethod
    def gaussian(std: float) -> "NoiseDistribution":
        return NoiseDistribution(kind="gaussian", std=std)

    @staticmethod
    def zero() -> "NoiseDistribution":
        return NoiseDistribution(kind="zero")


@dataclasses.dataclass(frozen=True)
class GadgetParams:
    """Gadget (signed radix) decomposition: `level` digits of `base_log` bits.

    Matches tfhe-rs SignedDecomposer semantics (reference:
    ml/extensions/rust/src/encryption.rs:152-166): balanced digits in
    (-B/2, B/2], decomposing the `level * base_log` most significant bits
    of a u64 with round-to-closest.
    """

    base_log: int
    level: int

    def __post_init__(self):
        assert self.base_log * self.level <= Q_BITS


@dataclasses.dataclass(frozen=True)
class ShortintParams:
    """Parameters for one shortint block (the PBS workhorse unit).

    The fhevm radix integers (euint8..euint256) are vectors of these blocks
    (reference: ml/extensions/rust/src/radix_utils.rs:21-51).
    """

    name: str
    lwe_dimension: int  # n: small-LWE dimension (post keyswitch)
    glwe_dimension: int  # k
    polynomial_size: int  # N (power of two)
    lwe_noise: NoiseDistribution
    glwe_noise: NoiseDistribution
    pbs: GadgetParams  # bootstrap (external product) decomposition
    ks: GadgetParams  # LWE keyswitch decomposition
    message_modulus: int  # e.g. 4 -> 2-bit messages
    carry_modulus: int  # e.g. 4 -> 2-bit carry space

    @property
    def big_lwe_dimension(self) -> int:
        """Dimension of LWE samples extracted from GLWE (= k*N)."""
        return self.glwe_dimension * self.polynomial_size

    @property
    def plaintext_modulus(self) -> int:
        """Total plaintext space incl. the padding bit: 2 * msg * carry."""
        return 2 * self.message_modulus * self.carry_modulus

    @property
    def delta(self) -> int:
        """Encoding scale: plaintext p encrypts as p * delta on the torus."""
        return 2**Q_BITS // self.plaintext_modulus

    def to_json(self) -> str:
        return _canonical_json(self)

    @property
    def hash(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()


@dataclasses.dataclass(frozen=True)
class BooleanParams:
    """Parameters for the boolean (single-bit gate bootstrap) scheme.

    Plaintext space {0,1} encoded at +-1/8 of the torus; every gate is one
    linear combination + PBS with a sign test vector.
    """

    name: str
    lwe_dimension: int
    glwe_dimension: int
    polynomial_size: int
    lwe_noise: NoiseDistribution
    glwe_noise: NoiseDistribution
    pbs: GadgetParams
    ks: GadgetParams

    @property
    def big_lwe_dimension(self) -> int:
        return self.glwe_dimension * self.polynomial_size

    def to_json(self) -> str:
        return _canonical_json(self)

    @property
    def hash(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()


@dataclasses.dataclass(frozen=True)
class MatmulParams:
    """GLWE encrypted-clear matmul parameters (reference:
    ml/extensions/rust/src/fhext_classes.rs:100-114 `PARAMS_8B_2048_NEW`).

    Encrypted vectors are packed into GLWE polynomials of size N; a dot
    product is a negacyclic polymul against the clear operand with the
    result landing in one coefficient.
    """

    name: str
    glwe_dimension: int  # k
    polynomial_size: int  # N
    glwe_noise: NoiseDistribution
    bits_reserved_for_computation: int  # plaintext headroom (27 in reference)
    packing_ks: GadgetParams  # packing keyswitch (level 2 / base_log 14)
    packing_ks_noise: NoiseDistribution
    ct_modulus_in_bits: int = 39  # storage modulus for inputs (q_in = 2^39)
    ct_modulus_out_bits: int = 26  # storage modulus for outputs (q_out = 2^26)

    def to_json(self) -> str:
        return _canonical_json(self)

    @property
    def hash(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()


def _canonical_json(obj) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        raise TypeError(type(o))

    return json.dumps(
        dataclasses.asdict(obj), sort_keys=True, separators=(",", ":"), default=default
    )


# ---------------------------------------------------------------------------
# Named parameter sets
# ---------------------------------------------------------------------------

# The fhevm default: 2-bit message + 2-bit carry shortint blocks
# (reference name at sdk/relayer/src/tfhe.ts:14-16). Structure: k=1, N=2048,
# single-level 23-bit PBS decomposition, 5-level 3-bit keyswitch, TUniform
# noise. Noise margins validated in tests/test_noise.py via tfhe_tpu.noise.
PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = ShortintParams(
    name="PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
    lwe_dimension=880,
    glwe_dimension=1,
    polynomial_size=2048,
    lwe_noise=NoiseDistribution.tuniform(46),
    glwe_noise=NoiseDistribution.tuniform(17),
    pbs=GadgetParams(base_log=23, level=1),
    ks=GadgetParams(base_log=3, level=5),
    message_modulus=4,
    carry_modulus=4,
)

# A 1-bit message / 1-bit carry set for cheaper gates over bit-sliced data.
PARAM_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128 = ShortintParams(
    name="PARAM_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128",
    lwe_dimension=780,
    glwe_dimension=2,
    polynomial_size=1024,
    lwe_noise=NoiseDistribution.tuniform(47),
    glwe_noise=NoiseDistribution.tuniform(17),
    pbs=GadgetParams(base_log=17, level=1),
    ks=GadgetParams(base_log=4, level=3),
    message_modulus=2,
    carry_modulus=2,
)

# Multi-bit PBS variants (tfhe-rs PARAM_MULTI_BIT_GROUP_{2,3}_MESSAGE_2_
# CARRY_2_KS_PBS_TUNIFORM_2M128 analogs -- the parameter family the
# GPU coprocessor bootstraps with). Same GLWE/N/noise/message layout as
# the classic set; the LWE dimension for group 3 rises 880 -> 882 so n
# is divisible by the group size (slightly MORE secure at equal noise;
# this engine's constants are re-derived, see the header note).
PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = (
    dataclasses.replace(
        PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        name="PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
    )
)
PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = (
    dataclasses.replace(
        PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        name="PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
        lwe_dimension=882,
    )
)
# Group-4 variant (n=880 divisible by 4). tfhe-rs names GROUP_2/3 sets
# for this message layout; this wider grouping is this framework's
# extension (same GLWE/N/noise; measured +2.4% PBS/s over GROUP_3 on
# chip, decrypt-verified -- BENCH_MULTIBIT_G4.json). Key-storage msb
# drops one bit vs GROUP_3 (gen_multibit_bootstrap_key's CRT bound);
# the bench's decrypt gate and the toy-corpus test cover it.
PARAM_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128 = (
    dataclasses.replace(
        PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        name="PARAM_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128",
    )
)

# Boolean gate-bootstrap parameters (BASELINE.json config 1: N=1024 GLWE).
BOOLEAN_PARAMS_128 = BooleanParams(
    name="BOOLEAN_PARAMS_128",
    lwe_dimension=680,
    glwe_dimension=2,
    polynomial_size=1024,
    lwe_noise=NoiseDistribution.tuniform(48),
    glwe_noise=NoiseDistribution.tuniform(17),
    pbs=GadgetParams(base_log=9, level=3),
    ks=GadgetParams(base_log=4, level=3),
)

# GLWE encrypted-clear matmul defaults, mirroring PARAMS_8B_2048_NEW
# (reference: fhext_classes.rs:100-114): N=2048, k=1, q=2^64, 27 compute
# bits, packing KS level 2 / base_log 14.
PARAMS_8B_2048 = MatmulParams(
    name="PARAMS_8B_2048",
    glwe_dimension=1,
    polynomial_size=2048,
    glwe_noise=NoiseDistribution.tuniform(17),
    bits_reserved_for_computation=27,
    packing_ks=GadgetParams(base_log=14, level=2),
    packing_ks_noise=NoiseDistribution.tuniform(17),
    ct_modulus_in_bits=39,
    ct_modulus_out_bits=26,
)

# Tree-ensemble matmul params: the tree lowering consumes EXACT small
# integers (threshold steps, leaf-path equality counts), so the decrypt
# error must sit far below 0.5 accumulator LSB. PARAMS_8B_2048's 26-bit
# output storage leaves ~13.5 LSB of modulus-switch noise (fine for
# wide 8-bit dot products, fatal for equality): widening the output
# modulus to 32 bits and spending fewer compute bits (values are < 2^8)
# puts the noise at ~0.002 LSB.
TREES_MATMUL = dataclasses.replace(
    PARAMS_8B_2048,
    name="TREES_MATMUL",
    bits_reserved_for_computation=20,
    ct_modulus_out_bits=32,
)

# ---------------------------------------------------------------------------
# Toy sets: NO security, exact algorithms. Used by the CPU test-suite so the
# full pipeline (NTT -> external product -> blind rotation -> keyswitch) runs
# in milliseconds. Noise is zero or tiny so correctness checks are exact.
# ---------------------------------------------------------------------------

TOY_SHORTINT = ShortintParams(
    name="TOY_SHORTINT",
    lwe_dimension=16,
    glwe_dimension=1,
    polynomial_size=128,
    lwe_noise=NoiseDistribution.tuniform(10),
    glwe_noise=NoiseDistribution.tuniform(6),
    pbs=GadgetParams(base_log=12, level=2),
    ks=GadgetParams(base_log=4, level=3),
    message_modulus=4,
    carry_modulus=4,
)

TOY_SHORTINT_NOISELESS = dataclasses.replace(
    TOY_SHORTINT,
    name="TOY_SHORTINT_NOISELESS",
    lwe_noise=NoiseDistribution.zero(),
    glwe_noise=NoiseDistribution.zero(),
)

# Operator-corpus params: N=256 doubles the PBS mod-switch margin (the
# rounding drift of n+1 mask terms into 2N buckets is the ONLY error
# source left at zero noise, and at N=128 it sits within one LUT box of
# the boundary for long op chains -- mask-seed-flaky division results).
TOY_SHORTINT_CORPUS = dataclasses.replace(
    TOY_SHORTINT_NOISELESS,
    name="TOY_SHORTINT_CORPUS",
    polynomial_size=256,
    # drift also scales with the LWE dimension (n+1 rounded mask terms):
    # n=8 halves it again AND halves the blind-rotation steps, keeping
    # corpus runtime near the N=128/n=16 set's
    lwe_dimension=8,
)

TOY_BOOLEAN = BooleanParams(
    name="TOY_BOOLEAN",
    lwe_dimension=16,
    glwe_dimension=1,
    polynomial_size=128,
    lwe_noise=NoiseDistribution.tuniform(8),
    glwe_noise=NoiseDistribution.tuniform(5),
    pbs=GadgetParams(base_log=10, level=2),
    ks=GadgetParams(base_log=4, level=3),
)

TOY_MATMUL = MatmulParams(
    name="TOY_MATMUL",
    glwe_dimension=1,
    polynomial_size=256,
    glwe_noise=NoiseDistribution.tuniform(6),
    bits_reserved_for_computation=20,
    packing_ks=GadgetParams(base_log=14, level=2),
    packing_ks_noise=NoiseDistribution.tuniform(6),
    ct_modulus_in_bits=39,
    ct_modulus_out_bits=26,
)

_REGISTRY = {
    p.name: p
    for p in [
        PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        PARAM_MESSAGE_1_CARRY_1_KS_PBS_TUNIFORM_2M128,
        PARAM_MULTI_BIT_GROUP_2_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        PARAM_MULTI_BIT_GROUP_3_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        PARAM_MULTI_BIT_GROUP_4_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128,
        BOOLEAN_PARAMS_128,
        PARAMS_8B_2048,
        TOY_SHORTINT,
        TOY_SHORTINT_NOISELESS,
        TOY_SHORTINT_CORPUS,
        TOY_BOOLEAN,
        TOY_MATMUL,
    ]
}


def by_name(name: str):
    return _REGISTRY[name]


def registry():
    return dict(_REGISTRY)
