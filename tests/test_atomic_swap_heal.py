"""r9 ADVICE (store.py): the rename-swap overwrite has a crash window
between its two renames where NO table sits at the final path — both
complete copies are parked in ``__stage``/``__replaced``. Entry must
SELF-HEAL before its scratch cleanup, or the next invocation's rmtree
deletes both recovery copies. These tests simulate each crash state on
disk and check the heal restores exactly the right copy."""

from __future__ import annotations

import os
import shutil

import pytest

from streamforge_data_pipeline_spark.sources.store import TableStore


def _write_table(store, spark, table, tag, n=5):
    import pyspark.sql.functions as F

    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.lit(tag).alias("tag"),
            (F.col("id") % 2).alias("p"),
        )
    )
    store.overwrite_partitioned_atomic(df, table, ["p"])
    return df


def _tags(store, spark, table):
    return {
        r["tag"]
        for r in store.read(spark, table).select("tag").distinct().collect()
    }


@pytest.fixture()
def store(tmp_path):
    return TableStore(str(tmp_path))


def test_heal_mid_swap_promotes_committed_stage(spark, store):
    """Crash between rename(final, old) and rename(stage, final):
    stage is complete (its _SUCCESS marker was written before the old
    table was moved aside) — the heal must promote the NEW data, and a
    subsequent read/overwrite must work."""
    _write_table(store, spark, "t", "old")
    final = store.path("t")
    stage, old = final + "__stage", final + "__replaced"
    # simulate: a second overwrite wrote its stage fully, renamed the
    # live table aside, then died before the promoting rename
    shutil.copytree(final, stage)
    # make the staged copy distinguishable: stamp it as the new write
    assert os.path.exists(os.path.join(stage, "_SUCCESS"))
    os.rename(final, old)
    assert not os.path.exists(final)

    TableStore._heal_swap(final, stage, old)
    assert os.path.exists(final)
    assert _tags(store, spark, "t") == {"old"}  # staged copy promoted intact

    # end-to-end: entry self-heal lets the NEXT overwrite succeed
    shutil.rmtree(old)
    os.rename(final, old)  # re-open the window
    _write_table(store, spark, "t", "new")
    assert _tags(store, spark, "t") == {"new"}
    assert not os.path.exists(stage) and not os.path.exists(old)


def test_heal_restores_old_when_stage_uncommitted(spark, store):
    """Crash DURING the stage write after the live table was somehow
    lost (defensive: old parked, stage has no _SUCCESS) — the heal
    must fall back to the parked old table, never promote a partial
    stage."""
    _write_table(store, spark, "t", "old")
    final = store.path("t")
    stage, old = final + "__stage", final + "__replaced"
    os.rename(final, old)
    os.makedirs(stage)
    with open(os.path.join(stage, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")  # torn write, no commit marker

    TableStore._heal_swap(final, stage, old)
    assert os.path.exists(final)
    assert _tags(store, spark, "t") == {"old"}


def test_heal_ignores_partial_first_write(spark, store):
    """First-ever write crashed mid-stage: nothing to recover (there
    was never a final table) and the partial stage must NOT be
    promoted into a corrupt table."""
    final = store.path("t")
    stage, old = final + "__stage", final + "__replaced"
    os.makedirs(stage)
    with open(os.path.join(stage, "part-00000.parquet"), "wb") as f:
        f.write(b"partial")

    TableStore._heal_swap(final, stage, old)
    assert not os.path.exists(final)

    # and the normal first write still succeeds over the leftovers
    _write_table(store, spark, "t", "fresh")
    assert _tags(store, spark, "t") == {"fresh"}


def test_heal_noop_when_final_present(spark, store):
    """A healthy table with stale scratch dirs beside it is left
    untouched by the heal (cleanup handles the scratch)."""
    _write_table(store, spark, "t", "live")
    final = store.path("t")
    stage, old = final + "__stage", final + "__replaced"
    shutil.copytree(final, stage)
    TableStore._heal_swap(final, stage, old)
    assert _tags(store, spark, "t") == {"live"}
