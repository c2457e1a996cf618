"""Property-based tests (hypothesis) for the validation operator —
invariants that hold for ANY intake, not just the fixture files:

1. split partition: valid ∪ rejected == input, disjoint;
2. valid rows satisfy every rule (parse-clean, unique, not-existing);
3. first-wins: among claim-eligible rows of an id, exactly the first
   (by row order) is not labeled duplicate — unless the id exists in
   the table, in which case all are duplicates;
4. error labels come only from the reference's fixed vocabulary.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from streamforge_data_pipeline_spark.operators.validate import (
    ERR_DATE,
    ERR_DUP,
    ERR_ID_EMPTY,
    ERR_NAME_EMPTY,
    ERR_QTY,
    ERR_TOO_FEW,
    validate,
)

LABELS = {ERR_TOO_FEW, ERR_ID_EMPTY, ERR_NAME_EMPTY, ERR_DUP, ERR_QTY, ERR_DATE}

cell = st.one_of(
    st.none(),
    st.sampled_from(["", " ", "A1", "A2", "B7", "xyz", "5", "-3", "12.5", "lots",
                     "2026-09-01", "2026/09/01", "0000-99-99", " A1 "]),
    st.text(alphabet="abc19-/ ", max_size=6),
)

rows = st.lists(
    st.tuples(cell, cell, cell, cell), min_size=1, max_size=25
)

existing = st.lists(st.sampled_from(["A1", "B7", "zz"]), max_size=3, unique=True)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@given(data=rows, ex=existing)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_validation_invariants(_spark, data, ex):
    spark = _spark
    df = spark.createDataFrame(
        [(i, a, b, c, d) for i, (a, b, c, d) in enumerate(data)],
        "row_id long, externalId string, name string, quantity string, expiryDate string",
    )
    ex_df = spark.createDataFrame([(e,) for e in ex], "external_id string") if ex \
        else spark.createDataFrame([], "external_id string")

    out = validate(df, ex_df, "row_id").collect()

    # 1. partition: every input row appears exactly once
    assert sorted(r["row_id"] for r in out) == list(range(len(data)))

    # 4. label vocabulary
    assert {r["error"] for r in out if r["error"] is not None} <= LABELS

    # 2+3. replicate reference semantics in plain Python
    claimed = set(ex)
    for r in sorted(out, key=lambda r: r["row_id"]):
        eid, name, qty, date = data[r["row_id"]]
        eid_t = (eid or "").strip()
        name_t = (name or "").strip()
        if qty is None and date is None:
            expected = ERR_TOO_FEW
        elif eid_t == "":
            expected = ERR_ID_EMPTY
        elif name_t == "":
            expected = ERR_NAME_EMPTY
        elif eid_t in claimed:
            expected = ERR_DUP
        else:
            claimed.add(eid_t)
            qty_t = (qty or "").strip()
            import re

            if not re.fullmatch(r"[+-]?[0-9]{1,10}", qty_t) or not (
                -(2**31) <= int(qty_t) < 2**31
            ):
                expected = ERR_QTY
            else:
                date_t = (date or "").strip()
                import datetime

                ok = bool(re.fullmatch(r"\d{4}-\d{2}-\d{2}", date_t))
                if ok:
                    try:
                        datetime.date.fromisoformat(date_t)
                    except ValueError:
                        ok = False
                expected = None if ok else ERR_DATE
        assert r["error"] == expected, (
            f"row {r['row_id']} {data[r['row_id']]}: got {r['error']}, want {expected}"
        )
