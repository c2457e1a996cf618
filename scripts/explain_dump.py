#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for registry keys to files.

Usage: python scripts/explain_dump.py OUTDIR SUFFIX KEY [KEY...]

Writes OUTDIR/<key>_<SUFFIX>.txt for each key — the plans/r10
deliverable (judge checks plan claims against these files). The repo
root whose registry is imported is the script's own parent directory,
so running the copy inside a git worktree dumps THAT commit's plans.

Because several heavy queries flatten lineage with eager
``localCheckpoint`` (the final plan is then just ``Scan ExistingRDD``),
the script monkeypatches ``DataFrame.localCheckpoint`` to ALSO record
the formatted plan of every checkpointed intermediate — that is where
the join/exchange shapes the claims are about actually live. The first
``MAX_INTERMEDIATES`` are written below the final plan (iterative
algorithms checkpoint per iteration; the remainder is counted).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from streamforge_data_pipeline_spark.registry import REGISTRY  # noqa: E402
from streamforge_data_pipeline_spark.session import get_session  # noqa: E402

MAX_INTERMEDIATES = 6

_captured: list[str] = []
_orig_local_checkpoint = DataFrame.localCheckpoint


def _fmt(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _capturing_local_checkpoint(self, *args, **kwargs):  # noqa: ANN001
    try:
        _captured.append(_fmt(self))
    except Exception as exc:  # pragma: no cover - capture is best-effort
        _captured.append(f"<plan capture failed: {exc}>")
    return _orig_local_checkpoint(self, *args, **kwargs)


DataFrame.localCheckpoint = _capturing_local_checkpoint


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        _captured.clear()
        df = REGISTRY[key].fn(spark, sf_dir)
        parts = ["== FINAL DECLARED PLAN ==\n" + _fmt(df)]
        for i, plan in enumerate(_captured[:MAX_INTERMEDIATES], 1):
            parts.append(
                f"== localCheckpointed INTERMEDIATE #{i} "
                f"(plan at checkpoint time) ==\n{plan}"
            )
        if len(_captured) > MAX_INTERMEDIATES:
            parts.append(
                f"== {len(_captured) - MAX_INTERMEDIATES} further "
                "checkpointed intermediates elided (iterative loop) =="
            )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write("\n\n".join(parts) + "\n")
        print(f"wrote {path} ({len(_captured)} intermediates)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
