"""Every oracle-backed registry query must hash-match DuckDB at
sf0.001 — the same gate the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from streamforge_data_pipeline_spark.registry import REGISTRY

from tests.conftest import SF_SMALL
from tests.utils import compare, duckdb_connection

ORACLE_KEYS = sorted(k for k, s in REGISTRY.items() if s.oracle)
NO_ORACLE_KEYS = sorted(k for k, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMALL)
    yield c
    c.close()


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_matches_oracle(spark, con, key):
    spec = REGISTRY[key]
    df = spec.fn(spark, SF_SMALL)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{key}: {msg}"


@pytest.mark.parametrize("key", NO_ORACLE_KEYS)
def test_no_oracle_queries_run(spark, key):
    df = REGISTRY[key].fn(spark, SF_SMALL)
    assert df.count() >= 0
