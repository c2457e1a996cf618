"""JDBC-backed table store — the reference's ACTUAL storage path.

The reference persists to PostgreSQL over JDBC (pom.xml:47-59 pulls the
postgresql driver; application.properties:9-12 configures the
datasource) and its prefetch query is a single-column JDBC projection
(ItemRepository.java:16-17). `TableStore` (store.py) re-homes that on
Parquet; this class keeps the SAME interface on a real JDBC database so
the ingest pipeline (plans/ingest.py, duck-typed on the store) runs
unchanged against either backend.

Tested against Apache Derby EMBEDDED (the only JDBC engine shipped with
this Spark distribution — no server to install). Embedded Derby lives
inside the driver JVM, which is exactly right for local[] sessions; on
a real cluster every executor opens its own connection, so production
points the same code at a networked URL (jdbc:postgresql://...) and
nothing else changes — the URL is the deployment switch, as it is for
the reference.

Scale mapping of each reference behavior:
- chunked 1000-row commits (BackgroundCsvProcessor.java:91,215-220):
  Spark's JDBC writer commits per PARTITION with `batchsize` rows per
  JDBC batch — default 1000, the same constant; partial success per
  chunk maps to partial success per partition task.
- prefetch projection (ItemRepository.java:16-17): column pruning
  pushes into the generated SELECT (only external_id crosses the
  wire); equality filters push as WHERE clauses
  (tests/test_jdbc_store.py asserts both in the physical plan).
- full-table reads at scale: `read_partitioned` issues numPartitions
  range-bounded SELECTs in parallel (partitionColumn/lower/upper) —
  the standard pattern for draining a big table into a cluster without
  a single-connection bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from streamforge_data_pipeline_spark.functions import empty_df

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# SQLStates meaning "relation does not exist": Derby 42X05, Postgres
# 42P01. Only these map to an empty prefetch; anything else re-raises
# (a swallowed connection error would silently disable dedup).
_NO_TABLE_STATES = ("42X05", "42P01")


class JdbcTableStore:
    """`TableStore`-shaped store over any JDBC database."""

    def __init__(self, url: str, driver: str = DERBY_DRIVER,
                 properties: dict[str, str] | None = None):
        self.url = url
        self.properties = {"driver": driver, **(properties or {})}

    # -- sinks ---------------------------------------------------------

    def _writer(self, df: DataFrame, batchsize: int):
        """String columns are created as VARCHAR(255) — the reference's
        own DDL (V2__create_items.sql:3-4); the dialect default (CLOB
        on Derby) would reject equality predicates, breaking the
        prefetch anti-join, point lookups, and pushed filters."""
        from pyspark.sql import types as T

        w = df.write.option("batchsize", batchsize)
        strings = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
        if strings:
            w = w.option(
                "createTableColumnTypes",
                ", ".join(f"{c} VARCHAR(255)" for c in strings),
            )
        return w

    def append(self, df: DataFrame, table: str, batchsize: int = 1000) -> None:
        """S5/S6: distributed insert; one transaction per partition,
        `batchsize` rows per JDBC batch (reference chunk size :91)."""
        self._writer(df, batchsize).jdbc(
            self.url, table, mode="append", properties=self.properties
        )

    def overwrite(self, df: DataFrame, table: str, batchsize: int = 1000) -> None:
        self._writer(df, batchsize).option("truncate", False).jdbc(
            self.url, table, mode="overwrite", properties=self.properties
        )

    def insert_items(self, typed: DataFrame, table: str = "items") -> None:
        """SERIAL-PK parity (V2__create_items.sql:2): ids offset past
        the current max so appended uploads stay unique — same
        single-writer contract as TableStore.insert_items."""
        spark = typed.sparkSession
        base = 0
        try:
            # aggregate pushed to the database: one row crosses the
            # wire. Column quoted: Spark's JDBC writer creates quoted
            # (case-preserved) columns, while unquoted identifiers fold
            # to uppercase in Derby/Postgres.
            row = spark.read.jdbc(
                self.url,
                f'(SELECT MAX("id") AS mx FROM {table}) tmax',
                properties=self.properties,
            ).collect()[0]
            base = (row[0] or 0) + 1  # positional: alias case folds per dialect
        except Exception as e:  # noqa: BLE001 - SQLState-gated below
            if not _is_missing_table(e):
                raise
        self.append(
            typed.withColumn("id", F.monotonically_increasing_id() + F.lit(base)),
            table,
        )

    # -- sources -------------------------------------------------------

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.jdbc(self.url, table, properties=self.properties)

    def read_partitioned(
        self,
        spark: SparkSession,
        table: str,
        column: str,
        num_partitions: int,
        lower: int | None = None,
        upper: int | None = None,
    ) -> DataFrame:
        """Parallel range-partitioned scan: numPartitions concurrent
        SELECTs each bounded on `column`. Bounds default to the table's
        actual min/max (one pushed-down aggregate query)."""
        if lower is None or upper is None:
            row = spark.read.jdbc(
                self.url,
                f'(SELECT MIN("{column}") AS lo, MAX("{column}") AS hi FROM {table}) b',
                properties=self.properties,
            ).collect()[0]
            lower = row[0] if lower is None else lower
            upper = row[1] if upper is None else upper
        return spark.read.jdbc(
            self.url,
            table,
            column=column,
            lowerBound=int(lower or 0),
            upperBound=int(upper or 0) + 1,
            numPartitions=num_partitions,
            properties=self.properties,
        )

    def existing_ids(self, spark: SparkSession, table: str = "items") -> DataFrame:
        """S3/P1 prefetch: the projection prunes into the generated
        JDBC SELECT — only external_id leaves the database."""
        return self.read(spark, table).select("external_id")

    def existing_ids_or_empty(self, spark: SparkSession, table: str = "items") -> DataFrame:
        """Missing table == empty set; every other failure re-raises."""
        try:
            ids = self.existing_ids(spark, table)
            ids.schema  # force resolution so a missing table fails HERE
            return ids
        except Exception as e:  # noqa: BLE001 - SQLState-gated below
            if _is_missing_table(e):
                return empty_df(spark, "external_id string")
            raise


def _is_missing_table(e: Exception) -> bool:
    msg = str(e)
    return any(state in msg for state in _NO_TABLE_STATES)
