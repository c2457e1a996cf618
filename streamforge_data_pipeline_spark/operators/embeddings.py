"""Embedding-pipeline kernels: L2 normalize and int8 quantize.

Training-data pipelines run these over every embedding in the corpus
(normalize before ANN / clustering; quantize for compact storage), so
they are implemented as Arrow-batched NumPy `mapInPandas` kernels —
one vectorized pass per batch, no per-row Python, no shuffle at all
(narrow map over however the corpus is partitioned).

Parity notes (DuckDB oracle):
- Quantization is exact across engines: ``scale = 127 / max(|x|)`` and
  ``q_i = floor(x_i * scale + 0.5)`` are elementwise IEEE-double ops
  with no accumulation order, so NumPy and DuckDB produce identical
  integers. ``floor(x+0.5)`` (not ``round``) sidesteps NumPy's
  half-to-even vs SQL half-away rounding difference.
- The L2 norm is a sum of squares: NumPy's pairwise summation can
  differ from a sequential fold in the last ulp, so norm-derived
  outputs are rounded to 4 decimals (same tolerance discipline as the
  cosine operators, asserted bit-stable in tests at two SFs).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    return it


def normalize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize each embedding; zero vectors pass through as zeros.

    Output: ``id_col``, ``normalized`` (array<double>), ``norm``
    (double, pre-normalization L2 norm).
    """
    import numpy as np

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("normalized", T.ArrayType(T.DoubleType())),
            T.StructField("norm", T.DoubleType()),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            safe = np.where(norms == 0.0, 1.0, norms)
            out = mat / safe[:, None]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "normalized": list(out),
                    "norm": norms,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 quantization: ``q = floor(x * 127/max|x| + 0.5)``.

    Output: ``id_col``, ``q`` (array<int>, values in [-127, 127]),
    ``scale`` (double — multiply q by ``1/scale`` to dequantize).
    Zero vectors quantize to all zeros with scale 0.
    """
    import numpy as np

    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("q", T.ArrayType(T.IntegerType())),
            T.StructField("scale", T.DoubleType()),
        ]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            maxabs = np.abs(mat).max(axis=1)
            scale = np.where(maxabs == 0.0, 0.0, 127.0 / np.where(maxabs == 0.0, 1.0, maxabs))
            q = np.floor(mat * scale[:, None] + 0.5).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "q": list(q),
                    "scale": scale,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema)
