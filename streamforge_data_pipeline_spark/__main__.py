"""CLI — the service surface of the engine.

Mirrors the reference's REST endpoints as commands (§3.1-3.2):

  python -m streamforge_data_pipeline_spark ingest <csv-path> --store DIR
      POST /api/uploads: validate + dedup + commit, print UploadResult.
  python -m streamforge_data_pipeline_spark ingest-stream <dir> --store DIR
      chunked-commit streaming ingest over an arriving-files directory.
  python -m streamforge_data_pipeline_spark datagen <rows> <out-dir>
      synthetic intake generator (CsvGenerator parity).
  python -m streamforge_data_pipeline_spark query <key> [--sf-dir DIR]
      run any registry query and show the result.
"""

from __future__ import annotations

import argparse
import json
import sys
import uuid


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="streamforge_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="batch CSV ingest (POST /api/uploads)")
    pi.add_argument("csv_path")
    pi.add_argument("--store", required=True)
    pi.add_argument("--error-report")

    ps = sub.add_parser("ingest-stream", help="chunked-commit streaming ingest")
    ps.add_argument("input_dir")
    ps.add_argument("--store", required=True)
    ps.add_argument("--checkpoint", required=True)

    pd = sub.add_parser("datagen", help="generate synthetic intake CSV")
    pd.add_argument("rows", type=int)
    pd.add_argument("out_dir")

    pq = sub.add_parser("query", help="run a registry query")
    pq.add_argument("key")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from streamforge_data_pipeline_spark.session import get_session

    spark = get_session("streamforge-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "ingest":
            from streamforge_data_pipeline_spark.plans.ingest import run_upload
            from streamforge_data_pipeline_spark.sources.store import TableStore

            res = run_upload(
                spark,
                args.csv_path,
                TableStore(args.store),
                error_report_path=args.error_report,
            )
            print(json.dumps(res.__dict__))
        elif args.cmd == "ingest-stream":
            from streamforge_data_pipeline_spark.sources.store import TableStore
            from streamforge_data_pipeline_spark.streaming.ingest_stream import (
                finish,
                start_stream_ingest,
            )
            from streamforge_data_pipeline_spark.streaming.status import StatusStore

            status = StatusStore()
            job_id = str(uuid.uuid4())
            q = start_stream_ingest(
                spark, args.input_dir, TableStore(args.store), args.checkpoint,
                job_id, status,
            )
            finish(q, status, job_id)
            print(json.dumps({"job_id": job_id, "step": status.get(job_id).step}))
        elif args.cmd == "datagen":
            from streamforge_data_pipeline_spark.sources.datagen import (
                generate_intake,
                write_csv,
            )

            write_csv(generate_intake(spark, args.rows), args.out_dir)
            print(json.dumps({"rows": args.rows, "out": args.out_dir}))
        elif args.cmd == "query":
            from streamforge_data_pipeline_spark.registry import REGISTRY

            if args.key not in REGISTRY:
                print(f"unknown key; known: {sorted(REGISTRY)}", file=sys.stderr)
                return 2
            REGISTRY[args.key].fn(spark, args.sf_dir).show(args.limit, truncate=False)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
