"""Encrypted DataFrames with encrypted merge.

TPU-native analog of the reference's concrete-ml pandas layer
(reference: ml/concrete-ml/src/concrete/ml/pandas/dataframe.py
EncryptedDataFrame :29 with encrypted `merge` :173, client_engine.py
keygen/encrypt/decrypt): every cell is a radix-encrypted small uint;
`merge` evaluates key equality homomorphically (PBS-backed radix eq)
and gathers the matching right-row values as eq-masked sums, so the
server learns nothing about key values or match positions.

Values are quantized to `value_bits` unsigned ints with 0 reserved as
the NaN/no-match marker, matching the reference's quantized-cell design.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from tfhe_tpu import params as tp
from tfhe_tpu.models import integer as ri
from tfhe_tpu.models import shortint as si
from tfhe_tpu.rng import FheRng

U64 = jnp.uint64


class DataFrameClient:
    """Key owner: keygen + encrypt/decrypt of dataframes (reference
    pandas/client_engine.py ClientEngine)."""

    def __init__(self, params=None, seed: int = 0, value_bits: int = 4):
        self.params = params or tp.TOY_SHORTINT
        self.value_bits = value_bits
        self.ck, self.sk = si.keygen(self.params, seed=seed)
        self._rng = FheRng(seed + 1)

    def encrypt_from_pandas(self, df) -> "EncryptedDataFrame":
        """pandas.DataFrame of small non-negative ints -> encrypted."""
        cols = {}
        n = len(df)
        for name in df.columns:
            vals = np.asarray(df[name], dtype=np.uint64)
            assert vals.max(initial=0) < 2**self.value_bits, (
                f"column {name} exceeds {self.value_bits}-bit range"
            )
            cols[name] = ri.encrypt_radix(
                self.ck, jnp.asarray(vals), self.value_bits, self._rng
            )
        return EncryptedDataFrame(
            columns=cols, n_rows=n, value_bits=self.value_bits, sk=self.sk
        )

    def decrypt_to_pandas(self, edf: "EncryptedDataFrame"):
        import pandas as pd

        data = {}
        for name, ct in edf.columns.items():
            data[name] = np.asarray(ri.decrypt_radix(self.ck, ct)).astype(np.int64)
        return pd.DataFrame(data)


@dataclasses.dataclass
class EncryptedDataFrame:
    """columns: {name: RadixCiphertext of shape (n_rows,)}."""

    columns: dict
    n_rows: int
    value_bits: int
    sk: object  # server key: merge runs server-side

    @property
    def column_names(self) -> list:
        return list(self.columns.keys())

    def merge(
        self,
        right: "EncryptedDataFrame",
        on: str,
        how: str = "left",
    ) -> "EncryptedDataFrame":
        """Encrypted left merge on a unique-key column (the reference
        supports exactly this shape: dataframe.py merge `how in
        {left, right}` with unique keys).

        For each left row i and right column c:
            out_c[i] = sum_j eq(K_left[i], K_right[j]) * V_c[j]
        -- one PBS-backed radix equality per (i, j) pair plus masked
        accumulation; non-matching rows decrypt to 0 (the NaN marker).
        """
        assert how in ("left", "right"), "unique-key left/right merge only"
        if how == "right":
            return right.merge(self, on=on, how="left")
        sk = self.sk
        lkey = self.columns[on]
        rkey = right.columns[on]
        nl, nr = self.n_rows, right.n_rows

        out_cols = {on: lkey}
        for name, ct in self.columns.items():
            if name != on:
                out_cols[name] = ct

        # eq matrix: broadcast left rows against right rows blockwise.
        # eq_{ij} as a 0/1 shortint; then out = sum_j eq_ij * v_j via the
        # bivariate PBS (mul) + additive accumulation.
        right_value_cols = [n for n in right.column_names if n != on]
        zero = ri.trivial_radix(
            sk.params, jnp.zeros((nl,), dtype=U64), self.value_bits
        )
        for name in right_value_cols:
            vcol = right.columns[name]
            acc = None
            for j in range(nr):
                kj = ri.RadixCiphertext(
                    blocks=jnp.broadcast_to(
                        rkey.blocks[j], (nl,) + rkey.blocks.shape[1:]
                    ),
                    params=rkey.params,
                    degrees=rkey.degrees,
                )
                eq_ij = ri.eq(sk, lkey, kj)  # (nl,) encrypted 0/1
                vj = ri.RadixCiphertext(
                    blocks=jnp.broadcast_to(
                        vcol.blocks[j], (nl,) + vcol.blocks.shape[1:]
                    ),
                    params=vcol.params,
                    degrees=vcol.degrees,
                )
                # eq-masked gather: select(eq, v_j, 0), accumulated
                term = ri.select(sk, eq_ij, vj, zero)
                acc = term if acc is None else ri.add(sk, acc, term)
            out_cols[name if name not in out_cols else f"{name}_right"] = acc
        return EncryptedDataFrame(
            columns=out_cols,
            n_rows=nl,
            value_bits=self.value_bits,
            sk=sk,
        )

    # -- serialization (reference dataframe.py save/load) -------------------

    def save(self, path: str):
        from tfhe_tpu.utils.serialization import serialize

        with open(path, "wb") as f:
            f.write(
                serialize(
                    {
                        "columns": dict(self.columns),
                        "n_rows": self.n_rows,
                        "value_bits": self.value_bits,
                    }
                )
            )

    @staticmethod
    def load(path: str, sk) -> "EncryptedDataFrame":
        from tfhe_tpu.utils.serialization import deserialize

        with open(path, "rb") as f:
            d = deserialize(f.read())
        return EncryptedDataFrame(
            columns=d["columns"],
            n_rows=d["n_rows"],
            value_bits=d["value_bits"],
            sk=sk,
        )
