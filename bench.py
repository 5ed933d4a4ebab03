"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...,
   "cores": ...}

The web_pipeline entry is the north-star job (generate → annotate →
filter → scrub → write + lineage); its docs/sec is the throughput
number BASELINE.md tracks at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pipeline corpus size scales with sf: sf0.1 → 20k docs
_sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
SF = float(_sf_match.group(1)) if _sf_match else 0.1
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", str(int(200_000 * SF))))


def main() -> None:
    from contessa_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )

    timings = {}
    docs_per_sec = None

    # ---- north-star pipeline -------------------------------------
    from contessa_spark.pipeline import PipelineConfig, QualityFilterPipeline
    from contessa_spark.sources.webgen import generate

    # warmup: JIT the codegen paths + fork the Arrow python workers once,
    # so timings below measure steady-state throughput, not session boot.
    # Same PipelineConfig as the timed run — codegen caches on generated
    # source, which embeds the config literals.
    # input_partition bucketing: the input below is a freshly-written
    # parquet table, so the no-shuffle shard-checkpoint mode applies
    # (bucket = input split; measured +17 s of stage barrier + text-row
    # serde saved at 16 cores on the 2M-doc corpus vs url-hash mode)
    cfg = PipelineConfig(n_buckets=max(CPUS * 2, 16), bucket_by="input_partition")
    warm = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        QualityFilterPipeline(spark, warm, cfg).run(
            generate(spark, 256, seed=1), task_ts=datetime(2025, 8, 1)
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    base = tempfile.mkdtemp(prefix="bench_pipe_")
    try:
        # input materialized to parquet first (untimed): the production
        # job reads an Iceberg/parquet table, not an in-flight generator
        input_path = os.path.join(base, "input")
        generate(spark, N_DOCS, seed=42).write.parquet(input_path)
        web = spark.read.parquet(input_path)
        pipe = QualityFilterPipeline(spark, os.path.join(base, "run"), cfg)
        t0 = time.perf_counter()
        summary = pipe.run(web, task_ts=datetime(2025, 8, 1, 12, 0))
        dt = time.perf_counter() - t0
        timings["web_pipeline"] = round(dt, 3)
        docs_per_sec = round(summary["input"] / dt, 1)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # ---- operator headliners (driver-contract queries) -----------
    queries = entry_mod.queries()
    # warm the query path too (python workers for the shingle/band UDFs,
    # codegen for the join shapes) on the tiny sf so the timed loop
    # below measures steady-state operator cost, matching the pipeline
    # warmup above. sf0.001 keeps this < a second per query.
    for name in ["dedup_minhash_lsh", "dedup_ngram_jaccard", "ann_topk_bruteforce"]:
        queries[name](spark, "/root/testdata/sf0.001").count()
    for name in [
        "rule_counts_lineitem",
        "consistency_diff",
        "doc_quality_scores",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "embedding_near_dups",
        "ann_topk_bruteforce",
        "events_hourly_rollup",
    ]:
        t0 = time.perf_counter()
        n = queries[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF,
                "docs": N_DOCS,
                "docs_per_sec": docs_per_sec,
                "cores": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
