"""Z-order layout: key correctness vs a Python reference, and the
property that actually matters — per-file min/max rectangles tight in
BOTH dimensions, so parquet stats can prune 2-D predicates."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.functions import zorder_key
from streamforge_data_pipeline_spark.sources.store import TableStore


def _ref_z(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 3, 255, 65535) for b in (0, 2, 7, 1024, 65535)],
        "a long, b long",
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _ref_z(a, b), (a, b)


def _mean_file_spans(spark, path_glob: str) -> tuple[float, float]:
    """Mean per-file (x-span, y-span) — a predicate on a dimension can
    skip a file iff the file's span misses it, so small spans in BOTH
    dims = 2-D data skipping."""
    xs, ys = [], []
    for f in sorted(glob.glob(path_glob)):
        mm = (
            spark.read.parquet(f)
            .agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            )
            .collect()[0]
        )
        xs.append(mm["x1"] - mm["x0"])
        ys.append(mm["y1"] - mm["y0"])
    return sum(xs) / len(xs), sum(ys) / len(ys)


def test_zordered_files_cover_small_rectangles(spark, tmp_path):
    # deterministic pseudo-uniform grid points in [0, 1000)^2
    df = spark.range(0, 20000).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64(F.col("id") + 1) % 1000).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))

    store = TableStore(str(tmp_path / "store"))
    store.write_zordered(df, "pts_z", "x", "y", files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "store" / "pts_x"))
    )

    zx, zy = _mean_file_spans(spark, str(tmp_path / "store" / "pts_z" / "part-*"))
    sx, sy = _mean_file_spans(spark, str(tmp_path / "store" / "pts_x" / "part-*"))
    # the x-sorted layout prunes x (narrow strips) but every file
    # spans ~the full y range; z-order must stay narrow in BOTH.
    assert sy > 900, (sx, sy)          # sanity: strips really span y
    assert zy < 0.5 * sy, (zy, sy)     # z files prune y too
    assert zx < 600, (zx, sx)          # ...without giving up x
