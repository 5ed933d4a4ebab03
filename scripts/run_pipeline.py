"""spark-submit entrypoint for the quality-filter pipeline.

Cluster:
  spark-submit --py-files contessa_spark.zip scripts/run_pipeline.py \
      --input s3://bucket/cc_pages --base s3://bucket/runs/2025-08-01 \
      --buckets 65536 --mode full

Local smoke:
  python scripts/run_pipeline.py --generate 10000 --base /tmp/run1

Resumability: re-running with the same --base skips buckets whose
lineage rows exist (kill it mid-run and re-submit; completed buckets
are not recomputed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="parquet/Iceberg path of web pages")
    ap.add_argument("--warc", help="directory of WARC files (text extracted on read)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic pages instead of --input")
    ap.add_argument("--base", required=True, help="run directory (output/lineage/quality)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--bucket-by", default="url",
                    choices=["url", "input_partition"],
                    help="checkpoint unit: url-hash bucket (layout-independent, "
                         "costs a shuffle) or input shard (no shuffle; resume "
                         "valid while the input listing is unchanged)")
    ap.add_argument("--mode", choices=["full", "validate"], default="full")
    ap.add_argument("--task-ts", default=None, help="ISO timestamp; default now")
    ap.add_argument("--master", default=None)
    ap.add_argument("--task-cpus", type=int, default=2,
                    help="2 for UDF-heavy stages (JVM serde + python worker per task)")
    args = ap.parse_args()

    from contessa_spark.pipeline import PipelineConfig, QualityFilterPipeline
    from contessa_spark.session import get_spark

    spark = get_spark("quality_filter_pipeline", master=args.master,
                      task_cpus=args.task_cpus)

    if args.generate:
        from contessa_spark.sources.webgen import generate

        df = generate(spark, args.generate, seed=42)
    elif args.warc:
        from contessa_spark.sources.warc import read_warc

        df = read_warc(spark, args.warc)
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        ap.error("need --input, --warc, or --generate")

    task_ts = (
        datetime.fromisoformat(args.task_ts) if args.task_ts else datetime.now()
    )
    pipe = QualityFilterPipeline(
        spark, args.base,
        PipelineConfig(n_buckets=args.buckets, bucket_by=args.bucket_by),
    )
    summary = pipe.run(df, task_ts=task_ts, mode=args.mode)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
