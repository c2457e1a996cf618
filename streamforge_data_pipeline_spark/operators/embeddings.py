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

from streamforge_data_pipeline_spark.functions import local_rows


def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    return it


def embedding_norm_outliers(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    z: float = 3.5,
) -> DataFrame:
    """Embedding hygiene: flag vectors whose L2 norm is a ROBUST
    outlier vs the corpus — |norm - median| / (1.4826 * MAD) > z, the
    median-absolute-deviation rule (Iglewicz & Hoaglin's modified
    z-score; 1.4826 scales MAD to sigma under normality). Broken
    encoders produce near-zero or exploded norms; mean/stddev would
    let a few exploded vectors mask each other, the median/MAD pair
    does not. Emits (id, norm, robust_z, is_outlier) for every
    vector.

    Determinism: norms are the sequential-double dot fold (the proven
    cross-engine recipe); both medians are exact linear-interpolated
    percentiles (Spark ``percentile`` == DuckDB ``quantile_cont``);
    robust_z is rounded to 4 dp BEFORE the > z comparison, so the
    flag is a function of the checked value. The two medians ride on
    broadcast 1-row scalars.

    Scale note: exact percentile aggregates buffer their group's
    values — fine for one double per vector well past 10^9 rows on a
    cluster, but the documented swap-in at extreme scale is the
    mergeable approx_percentile twin (the value_percentiles /
    value_percentiles_approx pairing, applied to norms)."""
    from pyspark.sql import functions as F

    from streamforge_data_pipeline_spark.functions import dot_double

    n = vectors.select(
        F.col(id_col),
        F.sqrt(dot_double(F.col(vec_col), F.col(vec_col))).alias("norm"),
    )
    med = n.agg(F.percentile("norm", F.lit(0.5)).alias("med"))
    dev = n.crossJoin(F.broadcast(med)).select(
        id_col,
        "norm",
        "med",
        F.abs(F.col("norm") - F.col("med")).alias("ad"),
    )
    mad = dev.agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    out = dev.crossJoin(F.broadcast(mad))
    rz = F.when(
        F.col("mad") > 0,
        F.round(F.col("ad") / (F.lit(1.4826) * F.col("mad")), 4),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.round("norm", 4).alias("norm"),
        rz.alias("robust_z"),
        (rz > z).alias("is_outlier"),
    )


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


# --- Product quantization (Jegou/Douze/Schmid, TPAMI 2011) -----------------


def _pq_assign(v, bk):
    """(n, m) int32 nearest-centroid codes for subvectors ``v`` of
    shape (n, m, dsub) against codebooks ``bk`` (m, ks, dsub) — the
    one assignment kernel pq_train and pq_encode share."""
    import numpy as np

    n, m, _ = v.shape
    codes = np.empty((n, m), dtype=np.int32)
    for s in range(m):
        c = bk[s]
        d2 = (c * c).sum(1)[None, :] - 2.0 * (v[:, s, :] @ c.T)
        codes[:, s] = np.argmin(d2, axis=1)
    return codes


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train product-quantization codebooks: split the ``D``-dim space
    into ``m`` subspaces of D/m dims and k-means each subspace to
    ``ks`` centroids -> ndarray (m, ks, D/m). PQ is the standard
    memory story for corpus-scale vector search: codes are m
    small-integer ids per vector (m=8, ks=16 -> 8 nibbles = 4 bytes
    against 256 bytes of float32), and distances against a query are
    table lookups (see :func:`pq_topk`).

    Spark shape: seeding picks the ``ks`` vectors with the smallest
    md5-derived id hash (seedless determinism — same trick as
    similarity.kmeans_centroids). Each iteration is ONE linear pass:
    an Arrow-batched kernel assigns every subvector to its nearest
    centroid and emits per-partition PARTIAL sums/counts — at most
    partitions x m x ks tiny rows reach the driver (the house
    bounded-collect rule), where they reduce to the new codebooks. All
    m subspaces train inside the same pass, so iteration cost does not
    scale with m; no shuffle anywhere.
    """
    import numpy as np

    from pyspark.sql import functions as F

    seed_rows = (
        vectors.select(id_col, vec_col)
        .withColumn(
            "__h",
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("long"),
        )
        .orderBy("__h", id_col)
        .limit(ks)
        .collect()
    )
    if len(seed_rows) < ks:
        raise ValueError(
            f"pq_train needs at least ks={ks} vectors to seed codebooks; "
            f"corpus has {len(seed_rows)}"
        )
    X = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)  # (ks, D)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = X.reshape(ks, m, dsub).transpose(1, 0, 2).copy()  # (m, ks, dsub)
    sc = vectors.sparkSession.sparkContext

    schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("sums", T.ArrayType(T.DoubleType())),
        ]
    )
    for _ in range(iters):
        b = sc.broadcast(books)

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np

            bk = b.value
            sums = np.zeros((m, ks, dsub))
            cnts = np.zeros((m, ks), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                v = (
                    np.stack(pdf[vec_col].to_numpy())
                    .astype(np.float64)
                    .reshape(len(pdf), m, dsub)
                )
                codes = _pq_assign(v, bk)
                for s in range(m):
                    np.add.at(sums[s], codes[:, s], v[:, s, :])
                    np.add.at(cnts[s], codes[:, s], 1)
            rows = [
                (s, cde, int(cnts[s, cde]), [float(x) for x in sums[s, cde]])
                for s in range(m)
                for cde in range(ks)
                if cnts[s, cde]
            ]
            if rows:
                yield pd.DataFrame(rows, columns=["sub", "code", "cnt", "sums"])

        parts = vectors.select(vec_col).mapInPandas(_partials, schema).collect()
        # the collect consumed this iteration's broadcast — release it
        # instead of letting superseded codebook generations pin
        # executor memory until driver GC (same storage-creep class as
        # the r4 lsh_probe_dedup persist fix)
        b.destroy()
        new = books.copy()  # empty cells keep their previous centroid
        tot_s = np.zeros((m, ks, dsub))
        tot_n = np.zeros((m, ks), dtype=np.int64)
        # deterministic reduce order: sort partials by (sub, code)
        for r in sorted(parts, key=lambda r: (r["sub"], r["code"])):
            tot_s[r["sub"], r["code"]] += np.array(r["sums"])
            tot_n[r["sub"], r["code"]] += r["cnt"]
        nz = tot_n > 0
        new[nz] = tot_s[nz] / tot_n[nz][:, None]
        if np.allclose(new, books):
            break
        books = new
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector's nearest centroid per
    subspace. One Arrow-batched argmin pass, no shuffle — the
    write-time index build at corpus scale."""
    import numpy as np

    bk = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = bk.shape
    sc = vectors.sparkSession.sparkContext
    b = sc.broadcast(bk)
    id_field = vectors.select(id_col).schema.fields[0]
    schema = T.StructType(
        [id_field, T.StructField("codes", T.ArrayType(T.IntegerType()))]
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        bkv = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = (
                np.stack(pdf[vec_col].to_numpy())
                .astype(np.float64)
                .reshape(len(pdf), m, dsub)
            )
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(_pq_assign(v, bkv))}
            )

    return vectors.select(id_col, vec_col).mapInPandas(_enc, schema)


def pq_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    iters: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine via PQ asymmetric distance (ADC) + an
    exact rerank of the per-query ``shortlist``: approx dot(q, x) =
    sum over subspaces of a precomputed (query x codebook) lookup
    table indexed by x's code; approx |x| from the reconstructed
    per-code subspace norms. The shortlist (ADC order) is then
    exactly reranked with true cosine — same output contract as
    ann_topk_lsh: (q_id, vec_id, sim, rank), recall asserted against
    the brute-force baseline in tests.

    Scale shape: codes are 4 bytes/vector (the 100 TB memory story:
    a billion-vector index fits one node's RAM); the scoring pass is
    a table-gather per Arrow batch over the codes relation, queries
    broadcast; per-query candidate flow is bounded by ``shortlist``
    before any join happens, and the exact rerank touches only
    shortlist x queries vectors.
    """
    import numpy as np

    from pyspark.sql import Window, functions as F

    from streamforge_data_pipeline_spark.functions import cosine

    books = pq_train(vectors, m=m, ks=ks, iters=iters, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(vectors, books, id_col=id_col, vec_col=vec_col)

    q_rows = query.select(id_col, vec_col).collect()  # queries are few
    q_ids = np.array([r[id_col] for r in q_rows])
    Q = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    dsub = books.shape[2]
    nq = len(q_rows)
    # LUT[i, s, c] = dot(q_i restricted to subspace s, centroid c)
    lut = np.einsum("isd,scd->isc", Q.reshape(nq, m, dsub), books)
    code_norm2 = (books * books).sum(axis=2)  # (m, ks)
    q_norm = np.sqrt((Q * Q).sum(axis=1))  # (nq,)
    sc = vectors.sparkSession.sparkContext
    b = sc.broadcast((q_ids, lut, code_norm2, q_norm))

    id_field = vectors.select(id_col).schema.fields[0]
    schema = T.StructType(
        [
            T.StructField("q_id", id_field.dataType),
            id_field,
            T.StructField("approx", T.DoubleType()),
        ]
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        qi, lt, cn2, qn = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            cd = np.stack(pdf["codes"].to_numpy())  # (n, m)
            n = len(pdf)
            sub_idx = np.arange(m)[None, :]
            dots = lt[:, sub_idx, cd].sum(axis=2)  # (nq, n)
            xnorm = np.sqrt(cn2[sub_idx, cd].sum(axis=1))  # (n,)
            sim = dots / (qn[:, None] * np.maximum(xnorm, 1e-12)[None, :])
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "q_id": np.repeat(qi, n),
                    id_col: np.tile(ids, nq),
                    "approx": sim.reshape(-1),
                }
            )

    scored = codes.mapInPandas(_score, schema).filter(
        F.col("q_id") != F.col(id_col)
    )
    ws = Window.partitionBy("q_id").orderBy(F.desc("approx"), F.col(id_col))
    short = (
        scored.withColumn("__r", F.row_number().over(ws))
        .filter(F.col("__r") <= shortlist)
        .select("q_id", id_col)
    )
    rer = (
        short.join(
            vectors.select(F.col(id_col), F.col(vec_col).alias("__v")), id_col
        )
        .join(
            F.broadcast(
                query.select(
                    F.col(id_col).alias("q_id"), F.col(vec_col).alias("__q")
                )
            ),
            "q_id",
        )
        .select(
            "q_id",
            id_col,
            F.round(cosine(F.col("__v"), F.col("__q")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )


def pq_topk_seeded(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 8,
    ks: int = 16,
    shortlist: int = 200,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`pq_topk`'s encode -> ADC table-gather -> shortlist ->
    exact-rerank stages made fully DETERMINISTIC and SQL-expressible
    (r5 brief #2, the semantic_dedup_cells move): the codebook is the
    ``ks`` md5-seeded vectors THEMSELVES (pq_train's init, zero k-means
    iterations), and all PQ arithmetic runs over the int8-QUANTIZED
    embeddings (quantize_embeddings' exact floor(x*127/max|x| + 0.5)
    recipe) — so every subspace distance, ADC dot product, and
    reconstructed norm is a small exact integer, bit-identical between
    Spark and the DuckDB oracle with no float-summation-order slack
    anywhere before the final division. The shortlist's exact rerank
    then uses the house float-cosine recipe (double fold, round 4,
    id tie-break) already oracle-proven by topk_cosine.

    This key exists to hash-verify the quadratic-risk PQ machinery;
    the production path stays :func:`pq_topk` (trained codebooks,
    Arrow-batched kernels), whose training step alone remains
    rows-only with a recall curve. Implementation is pure JVM
    expressions (zip_with/aggregate integer folds) — n x m x ks
    distance rows, fine for verification corpora; the Arrow kernel is
    the 100 TB encode.

    Output: (q_id, vec_id, sim, rank) — the ann_* contract.
    """
    from pyspark.sql import Window, functions as F

    from streamforge_data_pipeline_spark.functions import cosine

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    spark = vectors.sparkSession

    def quantized(df: DataFrame, out_id: str) -> DataFrame:
        mx = F.array_max(
            F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
        )
        with_mx = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col), mx.alias("__mx")
        )
        scale = F.when(F.col("__mx") == 0.0, F.lit(0.0)).otherwise(
            F.lit(127.0) / F.col("__mx")
        )
        q = F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
        )
        return with_mx.select(out_id, q.alias("q"))

    def sub_explode(q8: DataFrame, out_id: str) -> DataFrame:
        entries = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice("q", s * dsub + 1, dsub).alias("qs"),
                )
                for s in range(m)
            ]
        )
        return q8.select(out_id, F.explode(entries).alias("e")).select(
            out_id, F.col("e.sub").alias("sub"), F.col("e.qs").alias("qs")
        )

    izero = F.lit(0).cast("long")
    idot = lambda a, b: F.aggregate(  # noqa: E731 — exact integer fold
        F.zip_with(a, b, lambda x, y: x * y), izero, lambda acc, v: acc + v
    )
    idist2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        izero,
        lambda acc, v: acc + v,
    )

    from streamforge_data_pipeline_spark.functions import fan_out

    # fan_out both quantized sides (r11): each rides its source scan's
    # split count — ONE split at bench SFs — so the interpreted
    # integer folds (idot/idist2 over n x m x ks rows) ran serialized
    # (measured: three 1-task 350-460 ms stages per run at sf0.1).
    q8 = quantized(fan_out(vectors), id_col)
    # codebook: the ks (md5-hash, id)-smallest QUANTIZED vectors,
    # code index = that order — a bounded collect (ks rows)
    seed_rows = (
        q8.withColumn(
            "__h",
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("long"),
        )
        .orderBy("__h", id_col)
        .limit(ks)
        .collect()
    )
    if len(seed_rows) < ks:
        raise ValueError(f"need >= ks={ks} vectors, got {len(seed_rows)}")
    cb_rows = []
    for code, r in enumerate(seed_rows):
        for s in range(m):
            cs = r["q"][s * dsub : (s + 1) * dsub]
            cn2 = sum(int(x) * int(x) for x in cs)
            cb_rows.append((code, s, cs, cn2))
    cb = local_rows(spark, 
        cb_rows, "code int, sub int, cs array<long>, cn2 long"
    )

    # encode every corpus vector: per-subspace argmin over exact
    # integer distances, ties -> lowest code
    enc = (
        sub_explode(q8, id_col)
        .join(F.broadcast(cb), "sub")
        .withColumn("__d", idist2(F.col("qs"), F.col("cs")))
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct(F.col("__d"), F.col("code"), F.col("cn2"))).alias("__m"))
        .select(
            id_col,
            "sub",
            F.col("__m.code").alias("code"),
            F.col("__m.cn2").alias("cn2"),
        )
    )

    # query-side ADC lookup table: exact integer dots vs every codeword
    q8q = quantized(fan_out(query), "q_id")
    qlut = (
        sub_explode(q8q, "q_id")
        .join(F.broadcast(cb), "sub")
        .select("q_id", "sub", "code", idot(F.col("qs"), F.col("cs")).alias("dot"))
    )
    qn2 = q8q.select("q_id", idot(F.col("q"), F.col("q")).alias("qn2"))

    scored = (
        enc.join(F.broadcast(qlut), ["sub", "code"])
        .groupBy("q_id", id_col)
        .agg(F.sum("dot").alias("__dot"), F.sum("cn2").alias("__xn2"))
        .join(F.broadcast(qn2), "q_id")
        # zero-norm guard (house rule): 0/0 is NaN and NaN >= / sorts
        # above everything in Spark
        .filter((F.col("__xn2") > 0) & (F.col("qn2") > 0))
        .filter(F.col("q_id") != F.col(id_col))
        .select(
            "q_id",
            id_col,
            # dot and norms are exact integers -> these doubles are
            # bit-identical across engines; floor-half-up keeps the
            # ROUNDED ranking key engine-portable too
            (
                F.floor(
                    F.col("__dot")
                    / (F.sqrt("qn2") * F.sqrt("__xn2"))
                    * 1e4
                    + 0.5
                )
                / 1e4
            ).alias("approx"),
        )
    )
    ws = Window.partitionBy("q_id").orderBy(F.desc("approx"), F.col(id_col))
    short = (
        scored.withColumn("__r", F.row_number().over(ws))
        .filter(F.col("__r") <= shortlist)
        .select("q_id", id_col)
    )
    rer = (
        short.join(vectors.select(id_col, F.col(vec_col).alias("__v")), id_col)
        .join(
            F.broadcast(
                query.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__q"))
            ),
            "q_id",
        )
        .select(
            "q_id",
            id_col,
            F.round(cosine(F.col("__v"), F.col("__q")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", id_col, "sim", "rank")
    )
