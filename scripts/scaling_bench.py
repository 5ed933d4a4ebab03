"""Two-parallelism scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the same pipeline job runs
at two parallelism levels — N and 4N cores — over the SAME parquet
input, as the stand-in for N vs 4N executors. Methodology (each point
below was validated against a measured failure mode of the naive
version):

* CPU PINNING: ``local[N]`` only caps *task slots*; python UDF
  workers, GC, and writer threads run on extra cores, so an unpinned
  "4-core" run really uses ~8 — inflating the low level and biasing
  efficiency down. Each level's process is pinned with
  ``taskset -c 0..cores-1`` so JVM + python workers together get
  exactly the advertised cores (what a real executor's cgroup does).
* INTERLEAVED REPS: machine throughput drifts several percent over
  minutes (thermal/background); running all low reps then all high
  reps aliases that drift into the ratio. Reps alternate
  low, high, low, high, … in fresh processes; medians per level.
* per-process warmup (JIT + codegen + python worker forks) on a small
  slice; task_ts varied per rep (Spark 4.1 reuses identical-plan
  results in-session).

Prints a JSON report and (with --write) refreshes the measured-numbers
section of BENCH.md.

Usage: python scripts/scaling_bench.py [--docs 2000000] [--low 4]
       [--reps 3] [--write] [--bucket-by input_partition] [--no-pin]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r"""
import sys, time, tempfile, shutil, json
sys.path.insert(0, {repo!r})
from datetime import datetime
from contessa_spark.session import get_spark
from contessa_spark.pipeline import QualityFilterPipeline, PipelineConfig, annotate
from pyspark.sql import functions as F

def _host_sample():
    # loadavg (includes our own runnable threads) + /proc/stat total
    # and steal jiffies: steal measures CPU the HOST took from this
    # guest — the direct multi-tenancy signal loadavg can't separate
    # from self-load
    load1 = float(open("/proc/loadavg").read().split()[0])
    vals = list(map(int, open("/proc/stat").readline().split()[1:]))
    return load1, sum(vals), (vals[7] if len(vals) > 7 else 0)


cores = {cores}
spark = get_spark("scaling", master=f"local[{{cores}}]", shuffle_partitions=cores,
                  task_cpus={task_cpus})
inp = spark.read.parquet({input_path!r})
cfg = PipelineConfig(n_buckets={buckets}, bucket_by={bucket_by!r})

# warmup: same plan shape, small slice — JIT + python worker pool
w = tempfile.mkdtemp()
QualityFilterPipeline(spark, w, cfg).run(inp.limit(20000), task_ts=datetime(2025, 7, 1))
shutil.rmtree(w)

b = tempfile.mkdtemp()
load_before, tot0, steal0 = _host_sample()
t0 = time.perf_counter()
# task_ts varies per rep (arg): Spark 4.1 reuses identical-plan results
s = QualityFilterPipeline(spark, b, cfg).run(inp, task_ts=datetime(2025, 8, 1, 0, {rep}))
wall = time.perf_counter() - t0
load_after, tot1, steal1 = _host_sample()
steal_pct = round(100.0 * (steal1 - steal0) / max(1, tot1 - tot0), 2)
shutil.rmtree(b)

# compute-stage-only (annotate UDF over the narrow input, noop sink):
# isolates the dominant compute from write/lineage
narrow = inp.select("url", "warc_ts", "text", "lang")
d = annotate(narrow).withColumn("_salt", F.lit(1000 + {rep}))
t0 = time.perf_counter()
d.write.mode("overwrite").format("noop").save()
comp = time.perf_counter() - t0

print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 2),
                               "compute_wall_sec": round(comp, 2),
                               "docs": s["input"],
                               "load1_before": load_before,
                               "load1_after": load_after,
                               "steal_pct": steal_pct}}))
"""

GEN_TEMPLATE = r"""
import sys
sys.path.insert(0, {repo!r})
from contessa_spark.session import get_spark
from contessa_spark.sources.webgen import generate
spark = get_spark("gen", master="local[32]", shuffle_partitions=32)
generate(spark, {docs}, seed=42).write.mode("overwrite").parquet({input_path!r})
print("GENERATED")
"""


def run_py(code: str, pin_cores: int = 0) -> str:
    cmd = [sys.executable, "-c", code]
    if pin_cores and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin_cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(1)
    return out.stdout


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--task-cpus", type=int, default=1)
    ap.add_argument("--bucket-by", default="input_partition",
                    choices=["url", "input_partition"],
                    help="checkpoint unit: input shard (no shuffle) or url-hash bucket")
    ap.add_argument("--no-pin", action="store_true",
                    help="skip taskset CPU pinning (NOT recommended: unpinned "
                         "local[N] uses ~2N cores via python workers)")
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--json-out", default=None,
                    help="also write the JSON report to this repo-relative "
                         "path (auditable artifact, e.g. SCALING_r3.json)")
    args = ap.parse_args()
    high = args.low * 4
    pin = not args.no_pin

    input_path = os.path.join(tempfile.gettempdir(), f"scaling_input_{args.docs}")
    if not os.path.exists(input_path):
        run_py(GEN_TEMPLATE.format(repo=REPO, docs=args.docs, input_path=input_path))

    raw = {args.low: [], high: []}
    for rep in range(args.reps):
        # interleave levels so machine drift cancels out of the ratio
        for cores in (args.low, high):
            out = run_py(
                RUN_TEMPLATE.format(
                    repo=REPO,
                    cores=cores,
                    input_path=input_path,
                    buckets=high * 2,
                    rep=rep,
                    task_cpus=args.task_cpus,
                    bucket_by=args.bucket_by,
                ),
                pin_cores=cores if pin else 0,
            )
            line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
            raw[cores].append(json.loads(line[len("RESULT "):]))

    # a rep is CONTENDED when the host stole more than this share of
    # CPU during its timed window (/proc/stat steal delta) — the
    # formalized version of the by-eye "one high rep 1.9x the others"
    # discard rule BENCH.md used to apply manually. loadavg alone
    # can't make this call: it counts our own runnable threads too.
    steal_limit = 5.0
    results = {}
    for cores, reps in raw.items():
        clean = [r for r in reps if r.get("steal_pct", 0.0) <= steal_limit]
        used = clean if clean else reps
        med = statistics.median(r["wall_sec"] for r in used)
        comp = statistics.median(r["compute_wall_sec"] for r in used)
        docs = used[0]["docs"]
        results[cores] = {
            "cores": cores,
            "wall_sec": round(med, 2),
            "all_reps_sec": [r["wall_sec"] for r in reps],
            "rep_host_load": [
                {
                    "wall_sec": r["wall_sec"],
                    "load1_before": r.get("load1_before"),
                    "load1_after": r.get("load1_after"),
                    "steal_pct": r.get("steal_pct"),
                    "clean": r.get("steal_pct", 0.0) <= steal_limit,
                }
                for r in reps
            ],
            "clean_reps_used": len(used),
            "contended_reps_discarded": len(reps) - len(used),
            "all_reps_contended": not clean,
            "compute_wall_sec": round(comp, 2),
            "docs": docs,
            "docs_per_sec": round(docs / med, 1),
            "compute_docs_per_sec": round(docs / comp, 1),
        }

    low, high_r = results[args.low], results[high]
    efficiency = (high_r["docs_per_sec"] / low["docs_per_sec"]) / (high / args.low)
    comp_eff = (
        high_r["compute_docs_per_sec"] / low["compute_docs_per_sec"]
    ) / (high / args.low)
    report = {
        "docs": args.docs,
        "pinned": pin,
        "bucket_by": args.bucket_by,
        "steal_limit_pct": steal_limit,
        "efficiency_from_clean_reps_only": True,
        "low": low,
        "high": high_r,
        "core_ratio": high / args.low,
        "throughput_ratio": round(high_r["docs_per_sec"] / low["docs_per_sec"], 3),
        "scaling_efficiency": round(efficiency, 3),
        "compute_scaling_efficiency": round(comp_eff, 3),
    }
    print(json.dumps(report))

    if args.json_out:
        import datetime

        report_out = dict(report)
        report_out["argv"] = sys.argv[1:]
        report_out["measured_at"] = datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat()
        with open(os.path.join(REPO, args.json_out), "w") as f:
            json.dump(report_out, f, indent=1)

    if args.write:
        md = (
            "\n## Measured scaling (sandbox two-level evidence)\n\n"
            f"Same job (quality-filter pipeline, {args.bucket_by} checkpointing, "
            f"parquet input of {args.docs:,} synthetic web pages, seed 42), two "
            "parallelism levels as the stand-in for N vs 4N executors. Each "
            "level's process is PINNED to exactly that many physical cores "
            "with taskset (an unpinned local[N] run uses ~2N cores — python "
            "UDF workers live outside the task-slot budget); low/high reps "
            f"are interleaved to cancel machine drift; median of {args.reps}.\n\n"
            "| cores (pinned) | full job wall (s) | full docs/sec | annotate stage wall (s) | annotate docs/sec |\n|---|---|---|---|---|\n"
            f"| {args.low} | {low['wall_sec']} | {low['docs_per_sec']} | {low['compute_wall_sec']} | {low['compute_docs_per_sec']} |\n"
            f"| {high} | {high_r['wall_sec']} | {high_r['docs_per_sec']} | {high_r['compute_wall_sec']} | {high_r['compute_docs_per_sec']} |\n\n"
            f"Full-job throughput ratio {report['throughput_ratio']}× over a "
            f"{report['core_ratio']}× core ratio → **end-to-end efficiency "
            f"{report['scaling_efficiency']}**; annotation stage alone "
            f"**{report['compute_scaling_efficiency']}**. All reps: "
            f"low {low['all_reps_sec']}, high {high_r['all_reps_sec']}. "
            "Each rep records /proc/loadavg and the /proc/stat steal "
            f"delta over its timed window; reps with steal > "
            f"{report['steal_limit_pct']} % (host multi-tenancy) are "
            "auto-discarded from the medians "
            f"({low['contended_reps_discarded']} low / "
            f"{high_r['contended_reps_discarded']} high discarded here; "
            "per-rep fields in the JSON artifact).\n"
        )
        path = os.path.join(REPO, "BENCH.md")
        existing = ""
        if os.path.exists(path):
            existing = open(path).read().split("\n## Measured scaling")[0]
        with open(path, "w") as f:
            f.write(existing + md)


if __name__ == "__main__":
    main()
