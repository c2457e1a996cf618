"""Explicit StructTypes for the engine's persistent + intake relations.

Mirrors the reference's declared schemas (cited file:line into
/root/reference):
- CSV intake: 4 positional string columns; header extracted then
  ignored (service/BackgroundCsvProcessor.java:81,229-232; header
  string service/CsvGenerator.java:41). We read with an explicit
  all-string schema — never schema inference — because the reference
  semantics are "strings in, explicit casts with per-row error
  capture".
- items (post-V3): db/migration/V2__create_items.sql:1-7 +
  V3__add_columns.sql:1-3; entity model/Item.java:9-21.
- users: db/migration/V4__create_users.sql:1-11; model/User.java:14-33.
- job_status: transient Status record keyed by jobId
  (service/CsvUploadService.java:20,25).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Positional intake columns (BackgroundCsvProcessor.java:229-232).
INTAKE_COLUMNS = ["externalId", "name", "quantity", "expiryDate"]

INTAKE_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in INTAKE_COLUMNS]
)

ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("external_id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("expiry_date", T.DateType(), True),
        # V3__add_columns.sql:1-3 — schema evolution = nullable adds.
        T.StructField("description", T.StringType(), True),
        T.StructField("last_updated", T.TimestampType(), True),
    ]
)

USERS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # UUID
        T.StructField("username", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("password", T.StringType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("enabled", T.BooleanType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# security/Role.java:3-7
ROLES = ("ROLE_USER", "ROLE_ADMIN", "ROLE_EDITOR")

JOB_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("step", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("processed_rows", T.LongType(), True),
        T.StructField("total_rows", T.LongType(), True),
    ]
)

# Job state machine labels (SURVEY §2.8; CsvUploadService.java:69,80 and
# BackgroundCsvProcessor.java:60-185).
JOB_STEPS = (
    "INIT DB_PREFETCH PREFETCH_COMPLETE COUNTING_ROWS COUNTING_COMPLETE "
    "PROCESS_ALL_OR_NOTHING PROCESS_CHUNK_COMMIT PROCESSING DB_COMMIT "
    "DB_COMMIT_SUCCESS DB_COMMIT_FAILED JOB_COMPLETE JOB_FAILED "
    "UPLOAD_FAILED FILE_WRITE_FAILED NOT_FOUND "
    # pool-admission states (AsyncConfig.java:13-21 bounded executor:
    # a job past maxPoolSize waits in the queue; past queueCapacity it
    # is rejected — surfaced by the reference as an executor error,
    # surfaced here as an explicit status)
    "QUEUED REJECTED"
).split()
