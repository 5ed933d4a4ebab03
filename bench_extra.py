"""Per-query isolation bench (guide §1.4): times individual declared
queries with the noop sink so the computation, not the sink or the
bench harness, is measured. Does NOT replace bench.py (frozen for
measurement) — cite these numbers in OPTIMIZATION_r07.md.

Usage: python bench_extra.py <query1,query2,...> [reps]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0)
       SPARK_GRAFT_CPUS   (default 32)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from contessa_spark.session import get_spark

    import __spark_entry__ as entry_mod

    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark(
        "bench_extra", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8)
    )
    qs = entry_mod.queries()
    # warm python workers / codegen once on the tiny sf
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    out = {}
    for name in names:
        samples = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
    print(json.dumps({"sf_dir": SF_DIR, "cores": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
