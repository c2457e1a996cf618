"""Parquet-backed table store — the engine's 'Postgres'.

Reference sinks: atomic whole-file insert (saveAll+flush,
BackgroundCsvProcessor.java:150-156) and chunked 1000-row commits
(:170-220). Spark-first: one distributed write; job-level atomicity
comes from the Spark commit protocol (S5), micro-batch semantics from
foreachBatch in the streaming path (S6, streaming/ingest_stream.py).
A driver-side 1000-row loop would be the anti-pattern at scale.

The id column (SERIAL PK, V2__create_items.sql:2) is generated with
monotonically_increasing_id(): unique and distributed; global
contiguity is not required by any reference query (SURVEY §1.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamforge_data_pipeline_spark.functions import empty_df


class TableStore:
    def __init__(self, root: str):
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def append(self, df: DataFrame, table: str) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        df.write.mode("overwrite").parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        # mergeSchema: V3-style evolution = nullable column adds.
        return spark.read.option("mergeSchema", True).parquet(self.path(table))

    def insert_items(self, typed: DataFrame, table: str = "items") -> None:
        """SERIAL-PK-style id assignment: monotonically_increasing_id
        restarts at (partition<<33) each job, so appended uploads are
        offset by the current max id to stay unique across uploads
        (single-writer assumption — the reference serializes through
        one Postgres sequence; concurrent writers would need a
        coordinator or a (upload_uuid, row) composite key)."""
        spark = typed.sparkSession
        if os.path.exists(self.path(table)):
            base = (self.read(spark, table).agg(F.max("id")).collect()[0][0] or 0) + 1
        else:
            base = 0
        self.append(
            typed.withColumn("id", F.monotonically_increasing_id() + F.lit(base)),
            table,
        )

    def append_partitioned(
        self, df: DataFrame, table: str, partition_cols: list[str]
    ) -> None:
        """Hive-style partitioned layout (e.g. by ingest date): readers
        filtering on partition columns prune whole directories — the
        standard 100 TB layout for time-keyed tables."""
        df.write.mode("append").partitionBy(*partition_cols).parquet(self.path(table))

    def overwrite_partitioned(
        self, df: DataFrame, table: str, partition_cols: list[str]
    ) -> None:
        """Partitioned overwrite — the re-layout job (e.g. re-celling a
        vector corpus after a quantizer retrain). Callers overwriting a
        table they are lazily READING must materialize first
        (localCheckpoint) — Spark cannot overwrite its own input path."""
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            self.path(table)
        )

    def overwrite_partitioned_atomic(
        self, df: DataFrame, table: str, partition_cols: list[str]
    ) -> None:
        """Partitioned overwrite via STAGE + RENAME SWAP (the
        compact_partitioned discipline): the new layout is fully
        written to a sibling ``__stage`` directory first, then swapped
        in with two directory renames — a crash at any point leaves
        either the complete old table or the complete new one on the
        final path, never a half-written directory (r8 ADVICE: the
        static overwrite whose only source was a memory-only
        localCheckpoint could lose the table outright). Because the
        write targets the stage path, the source may lazily READ the
        table being replaced without the materialize-first caveat.
        Not concurrent-reader-safe across the swap instant — the
        standard OPTIMIZE-style maintenance contract.

        Crash window (r9 ADVICE): between ``rename(final, old)`` and
        ``rename(stage, final)`` NO table sits at the final path — both
        complete copies are parked in ``__replaced``/``__stage``. Entry
        therefore SELF-HEALS before any cleanup: if the final path is
        missing, promote the staged copy when its ``_SUCCESS`` commit
        marker proves the write finished (the marker is written by
        Spark's output committer strictly before the old table is moved
        aside, so ``old``-present implies ``stage``-complete), else
        restore the parked old table. Only after the heal are the
        scratch directories cleared."""
        import shutil

        final = self.path(table)
        stage = final + "__stage"
        old = final + "__replaced"
        self._heal_swap(final, stage, old)
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(stage)
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(stage, final)
        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _heal_swap(final: str, stage: str, old: str) -> None:
        """Recover from a crash inside the rename-swap window: a
        missing final path with a parked copy beside it means the
        previous swap died between its two renames. Prefer the staged
        NEW table when its Spark ``_SUCCESS`` marker is present (the
        swap only moves the old table aside after the stage write
        committed); a stage directory without the marker is a
        partial first-ever write and is never promoted. One atomic
        rename either way — re-crash-safe."""
        if os.path.exists(final):
            return
        if os.path.exists(os.path.join(stage, "_SUCCESS")):
            os.rename(stage, final)
        elif os.path.exists(old):
            os.rename(old, final)

    def write_json(self, df: DataFrame, table: str) -> None:
        """JSON sink (interchange format for downstream consumers)."""
        df.write.mode("overwrite").json(self.path(table) + "_json")

    def write_orc(self, df: DataFrame, table: str) -> None:
        """ORC sink — the other columnar interchange format (Hive
        ecosystems); same predicate-pushdown/column-pruning properties
        as parquet, tested in tests/test_store_formats.py."""
        df.write.mode("overwrite").orc(self.path(table) + "_orc")

    def read_orc(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.orc(self.path(table) + "_orc")

    def read_json(self, spark: SparkSession, table: str, schema=None) -> DataFrame:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.json(self.path(table) + "_json")

    # The short name "avro" resolves only when the external spark-avro
    # module's DataSourceRegister is deployed; the FileFormat class
    # itself ships on this distribution's classpath, and DataSource
    # lookup accepts the fully-qualified class name — so the store uses
    # the FQCN and works either way.
    _AVRO_FMT = "org.apache.spark.sql.avro.AvroFileFormat"

    @classmethod
    def avro_available(cls, spark: SparkSession) -> bool:
        """Probe via a real JVM class load (py4j package lookups are
        lazy and never raise)."""
        try:
            spark._jvm.java.lang.Class.forName(cls._AVRO_FMT)
            return True
        except Exception:
            return False

    def write_avro(self, df: DataFrame, table: str) -> None:
        """Avro sink (row-oriented interchange: Kafka/schema-registry
        ecosystems). Raises a clear error when no Avro FileFormat is
        on the classpath instead of Spark's raw lookup failure."""
        if not self.avro_available(df.sparkSession):
            raise RuntimeError(
                "avro format needs org.apache.spark.sql.avro on the classpath "
                "(deploy org.apache.spark:spark-avro_2.13)"
            )
        df.write.mode("overwrite").format(self._AVRO_FMT).save(self.path(table) + "_avro")

    def read_avro(self, spark: SparkSession, table: str) -> DataFrame:
        if not self.avro_available(spark):
            raise RuntimeError(
                "avro format needs org.apache.spark.sql.avro on the classpath "
                "(deploy org.apache.spark:spark-avro_2.13)"
            )
        return spark.read.format(self._AVRO_FMT).load(self.path(table) + "_avro")

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        key: str,
        buckets: int = 8,
        catalog_name: str | None = None,
    ) -> str:
        """Bucketed+sorted layout for shuffle-free co-located joins.

        Two tables bucketed the same way on the join key sort-merge
        join WITHOUT an Exchange on either side — at 100 TB that's the
        difference between re-shuffling the fact table per query and
        never shuffling it. Spark requires the catalog for bucket
        metadata (saveAsTable); the files live under this store's root.
        """
        name = catalog_name or f"sfdp_{table}"
        (
            df.write.bucketBy(buckets, key)
            .sortBy(key)
            .option("path", self.path(table))
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
        return name

    def write_zordered(
        self,
        df: DataFrame,
        table: str,
        col_a: str,
        col_b: str,
        files: int = 16,
        bits: int = 16,
    ) -> str:
        """Z-order (Morton) layout on two columns: min-max scale each
        into [0, 2^bits), interleave bits, range-partition + sort by
        the key, one file per range.

        Every output file then covers a small rectangle of the
        (col_a, col_b) plane, so parquet min/max stats prune
        predicates on EITHER column (or both); a single-column sort
        only ever prunes its own column. The global min/max pass is
        one tiny agg broadcast into the projection.
        """
        from streamforge_data_pipeline_spark.functions import zorder_key

        mm = df.agg(
            F.min(col_a).alias("__a0"), F.max(col_a).alias("__a1"),
            F.min(col_b).alias("__b0"), F.max(col_b).alias("__b1"),
        )
        top = (1 << bits) - 1

        def scaled(c: str, lo: str, hi: str):
            rng = F.when(F.col(hi) > F.col(lo), F.col(hi) - F.col(lo)).otherwise(F.lit(1))
            return F.least(
                F.lit(top),
                ((F.col(c) - F.col(lo)) / rng * top).cast("long"),
            )

        keyed = df.join(F.broadcast(mm)).withColumn(
            "__z", zorder_key(scaled(col_a, "__a0", "__a1"),
                              scaled(col_b, "__b0", "__b1"), bits=bits)
        ).drop("__a0", "__a1", "__b0", "__b1")
        (
            keyed.repartitionByRange(files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
            .write.mode("overwrite")
            .parquet(self.path(table))
        )
        return self.path(table)

    def write_manifest(self, spark: SparkSession, table: str) -> dict:
        """Shard manifest for downstream consumers (training jobs
        verify completeness against it before reading): per-file row
        counts + byte sizes, totals, and the schema — written as
        `_manifest.json` next to the data. Row counts come from ONE
        column-pruned scan grouped by input_file_name; byte sizes from
        the filesystem listing. Returns the manifest dict.
        """
        import glob as _glob
        import json as _json
        from urllib.parse import unquote, urlparse

        df = self.read(spark, table)
        # Key per-file rows by NORMALIZED filesystem path: Spark's
        # input_file_name() returns a URI whose characters (spaces,
        # '%', '#'...) are percent-encoded, so a raw string compare
        # against the glob path under-counts silently (r3 advice).
        per_file = {}
        for r in (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ):
            parsed = urlparse(r["f"])
            key = unquote(parsed.path) if parsed.scheme else r["f"]
            per_file[os.path.normpath(key)] = r["rows"]
        files = []
        for p in sorted(_glob.glob(os.path.join(self.path(table), "part-*"))):
            files.append(
                {
                    "path": os.path.basename(p),
                    "bytes": os.path.getsize(p),
                    "rows": per_file.get(os.path.normpath(p), 0),
                }
            )
        manifest = {
            "table": table,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
            "total_bytes": sum(f["bytes"] for f in files),
            "schema": df.schema.jsonValue(),
        }
        # completeness is the manifest's whole purpose: a key mismatch
        # must fail loudly, never write rows=0
        scanned_total = sum(per_file.values())
        if manifest["total_rows"] != scanned_total:
            raise ValueError(
                f"manifest row accounting mismatch for {table!r}: "
                f"per-file sum {manifest['total_rows']} != scanned {scanned_total} "
                f"(input_file_name keys: {sorted(per_file)[:3]}...)"
            )
        with open(os.path.join(self.path(table), "_manifest.json"), "w") as fh:
            _json.dump(manifest, fh, indent=1, sort_keys=True)
        return manifest

    def compact(self, spark: SparkSession, table: str, target_files: int) -> int:
        """Small-files compaction — the operational chore of any
        streaming/chunked sink at scale (each micro-batch writes >=1
        file per partition; readers drown in metadata). Rewrites the
        table into `target_files` files and returns the new count.
        """
        import glob

        df = self.read(spark, table)
        tmp = self.path(table) + "__compact"
        df.repartition(target_files).write.mode("overwrite").parquet(tmp)
        final = self.path(table)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(final)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        return len(glob.glob(os.path.join(final, "part-*")))

    def compact_partitioned(
        self, spark: SparkSession, table: str, partition_cols: list[str]
    ) -> int:
        """Small-file compaction for a HIVE-PARTITIONED table,
        preserving its directory layout — the maintenance job an
        append-per-batch partitioned index (exact_dedup_stream's
        ``index_buckets``, the trained semantic corpus's cell
        partitioning) needs between batches: each micro-batch appends
        one file per touched partition, so a long-lived index
        accumulates files linearly with batch count while its LOGICAL
        size stays corpus-bound.

        One shuffle on the partition columns (every partition's rows
        land in one task -> exactly one file per partition directory),
        staged into a sibling temp dir and swapped in with two renames
        — a single data rewrite, unlike the flat :meth:`compact`'s
        double write. Run it quiesced (between batches / with the
        stream stopped): the swap is not concurrent-reader-safe, which
        is the standard contract for OPTIMIZE-style maintenance.
        Returns the new data-file count. Layout sidecars (e.g. the
        dedup index's ``__layout``) are untouched — the partition
        values, column set, and row contents are identical by
        construction, only file boundaries change.
        """
        import glob
        import shutil

        final = self.path(table)
        tmp = final + "__compact"
        old = final + "__precompact"
        df = self.read(spark, table)
        (
            df.repartition(*[F.col(c) for c in partition_cols])
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
        os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old, ignore_errors=True)
        return len(glob.glob(os.path.join(final, "**", "part-*"), recursive=True))

    def existing_ids(self, spark: SparkSession, table: str = "items") -> DataFrame:
        """S3/P1: projection pushdown — only external_id reaches the scan
        (the reference's prefetch query, ItemRepository.java:16-17)."""
        return self.read(spark, table).select("external_id")

    def existing_ids_or_empty(self, spark: SparkSession, table: str = "items") -> DataFrame:
        """Prefetch that treats ONLY a missing table as empty. Any
        other failure (corrupt footer, permissions) re-raises — a
        swallowed error here would silently disable dedup and
        re-insert committed rows."""
        import os as _os

        if not _os.path.exists(self.path(table)):
            return empty_df(spark, "external_id string")
        return self.existing_ids(spark, table)
