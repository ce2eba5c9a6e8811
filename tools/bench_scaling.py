"""Scaling-efficiency bench: same job at N and 4N cores (north rule).

The BASELINE.json north rule requires >=0.8 throughput scaling efficiency
between cluster sizes N and 4N executors.  This sandbox has one machine, so
parallelism levels stand in for cluster sizes: the flagship pages pipeline
runs in fresh subprocesses at local[8] and local[32] on the SAME input size
and we report docs/sec at both plus efficiency = (T_32 / T_8) / 4.

Writes BENCH/BASELINE.md.  Usage: python tools/bench_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, ".")
from opentelemetry_collector_components_spark.session import get_spark
from opentelemetry_collector_components_spark.sources.pages import generate_pages
from opentelemetry_collector_components_spark.operators.aggregate import interval_rollup_union
from opentelemetry_collector_components_spark.plans.pipeline import DEFAULT_SPEC

rows = int(sys.argv[1])
core_seq = [int(c) for c in sys.argv[2].split(",")]

def measure(cores):
    spark = get_spark(
        app_name=f"scale-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
        # default G1 + modest heap: robust to the sandbox VM's erratic
        # memory-bandwidth throttling (big-young-gen ParallelGC wins 2x in
        # clean windows but loses 6-10x in throttled ones)
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    def run(n):
        routed = DEFAULT_SPEC.build(generate_pages(spark, n, partitions=cores * 4), spark)
        interval_rollup_union(routed, keys=["sink", "geo"]).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
    run(100_000)  # warm
    t0 = time.time(); run(rows); sec = time.time() - t0
    spark.stop()
    return {"cores": cores, "sec": sec, "docs_per_sec": rows / sec}

# both levels in ONE process back-to-back (SparkContext restart) so the
# pair fits inside one clean CPU window of the bursty sandbox VM
for c in core_seq:
    print(json.dumps(measure(c)), flush=True)
"""


def run_at(cores: int, rows: int) -> dict:
    return run_seq([cores], rows)[0]


def run_seq(core_seq: list[int], rows: int) -> list[dict]:
    out = subprocess.run(
        [sys.executable, "-c", BENCH_SNIPPET, str(rows), ",".join(map(str, core_seq))],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    return [json.loads(l) for l in lines]


def main() -> None:
    """Interleave the two levels and keep per-level best: the sandbox VM's
    CPU allocation is bursty (credit throttling after sustained load), so
    back-to-back runs of one level then the other would bias whichever ran
    first.  Alternating reps + min() gives both levels the same shot at an
    unthrottled window."""
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    lo_cores = int(os.environ.get("SCALE_N", "8"))
    hi_cores = lo_cores * 4
    r8, r32 = None, None
    for i in range(reps):
        a = run_at(lo_cores, rows)
        b = run_at(hi_cores, rows)
        r8 = a if r8 is None or a["sec"] < r8["sec"] else r8
        r32 = b if r32 is None or b["sec"] < r32["sec"] else r32
        print(json.dumps({"rep": i, "lo": a, "hi": b}), flush=True)
        time.sleep(20)  # let the VM's CPU budget recover between bursts
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4
    report = {
        "rows": rows,
        "n_cores": r8,
        "n4_cores": r32,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — measured baseline ({time.strftime('%Y-%m-%d')})

Flagship e2e pipeline (synthetic pages -> parse -> broadcast enrich ->
data-stream route -> 1m/10m/60m interval rollup, single action, noop sink),
{rows:,} docs, same input at two parallelism levels (cluster-size stand-in
per the north rule: local[{lo_cores}] = N executors, local[{hi_cores}] = 4N).
Interleaved reps, per-level best (the sandbox VM throttles CPU after
sustained load, so single-shot timings are biased).

| parallelism | wall sec | docs/sec |
|---|---|---|
| local[{lo_cores}] (N) | {r8['sec']:.2f} | {r8['docs_per_sec']:,.0f} |
| local[{hi_cores}] (4N) | {r32['sec']:.2f} | {r32['docs_per_sec']:,.0f} |

**Scaling efficiency** = (docs/sec@4N / docs/sec@N) / 4 = **{eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Headline per-query timings land in `BENCH_r{{N}}.json` via `bench.py`.
""")


if __name__ == "__main__":
    main()
