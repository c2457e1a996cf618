"""The reference's auth-path data operations (§3.3): register/login are
JPA-derived point queries + guarded inserts over the users table
(AuthenticationService.java:55-84, UserRepository.java:12-19).
Re-expressed: eq-filter point lookup, EXISTS probes, CHECK-style role
validation, and insert-if-absent via anti-join."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.joins import exists_semi, not_exists_anti
from streamforge_data_pipeline_spark.schemas import ROLES, USERS_SCHEMA
from streamforge_data_pipeline_spark.sources.store import TableStore


def _users(spark):
    now = datetime.datetime(2026, 1, 1)
    rows = [
        ("u1", "alice", "alice@x.io", "h1", "ROLE_ADMIN", True, now),
        ("u2", "bob", "bob@x.io", "h2", "ROLE_USER", True, now),
        ("u3", "carol", "carol@x.io", "h3", "ROLE_EDITOR", False, now),
        ("u4", "dave", "dave@x.io", "h4", "ROLE_HACKER", True, now),  # invalid role
    ]
    return spark.createDataFrame(rows, USERS_SCHEMA)


def test_register_login_flows(spark, tmp_path):
    store = TableStore(str(tmp_path))
    users = _users(spark)

    # CHECK-style role validation (V4 role domain, security/Role.java:3-7)
    valid = users.filter(F.col("role").isin(*ROLES))
    assert {r["username"] for r in valid.collect()} == {"alice", "bob", "carol"}
    store.overwrite(valid, "users")

    tbl = store.read(spark, "users")
    # findByUsername (point lookup)
    row = tbl.filter(F.col("username") == "alice").collect()
    assert len(row) == 1 and row[0]["role"] == "ROLE_ADMIN"
    # getAllByEnabled
    assert {r["username"] for r in tbl.filter(F.col("enabled")).collect()} == {"alice", "bob"}

    # register: existsByEmail guard -> insert only novel users (anti-join)
    incoming = _users(spark).filter(F.col("role").isin(*ROLES)).union(
        spark.createDataFrame(
            [("u5", "erin", "erin@x.io", "h5", "ROLE_USER", True,
              datetime.datetime(2026, 1, 2))],
            USERS_SCHEMA,
        )
    )
    novel = not_exists_anti(incoming, tbl.select("email"), "email")
    assert [r["username"] for r in novel.collect()] == ["erin"]
    store.append(novel, "users")
    assert store.read(spark, "users").count() == 4

    # existsByUsername == semi-join membership
    probe = spark.createDataFrame([("erin",), ("zed",)], "username string")
    hits = exists_semi(probe, store.read(spark, "users").select("username"), "username")
    assert {r["username"] for r in hits.collect()} == {"erin"}
