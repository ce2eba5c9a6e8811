"""ANN recall/cost curve at bench scale (VERDICT r4 directive #6).

Measures recall@10 AND wall time of the approximate ANN ladder at
$SPARK_GRAFT_SF_DIR (default sf0.1 — a scale where the IVF probe filter
actually prunes, unlike the sf0.01 gate fixture), including the
nprobe-sensitivity sweep (1/2/4 of the 5 seed cells) that records the
knob's recall/cost trade.  One markdown table row per arm on stdout;
numbers are committed to BENCH/BASELINE.md.

Usage: python tools/bench_ann_recall.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from opentelemetry_collector_components_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_topk,
        lsh_topk_literal,
        md5_plane_signs,
        pq_adc_topk,
        pq_codebooks_from_seeds,
        topk_cosine,
    )
    from opentelemetry_collector_components_spark.queries import load
    from opentelemetry_collector_components_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ann-recall", master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    seeds = emb.filter(F.col("vec_id") < 5).orderBy("vec_id").collect()
    cents = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in seeds]
    qvec = cents[0][1]
    cbs = pq_codebooks_from_seeds(emb, m=8, ksub=16)
    planes = md5_plane_signs(4, 64)

    truth = {r["vec_id"] for r in topk_cosine(emb, qvec, k=10).collect()}

    arms = {
        "exact": lambda: topk_cosine(emb, qvec, k=10),
        "ivf_nprobe1": lambda: ivf_topk(emb, qvec, cents, k=10, nprobe=1),
        "ivf_nprobe2": lambda: ivf_topk(emb, qvec, cents, k=10, nprobe=2),
        "ivf_nprobe4": lambda: ivf_topk(emb, qvec, cents, k=10, nprobe=4),
        "ivf_pq_nprobe1": lambda: ivf_pq_topk(emb, qvec, cents, cbs, k=10, nprobe=1),
        "ivf_pq_nprobe2": lambda: ivf_pq_topk(emb, qvec, cents, cbs, k=10, nprobe=2),
        "ivf_pq_nprobe4": lambda: ivf_pq_topk(emb, qvec, cents, cbs, k=10, nprobe=4),
        "lsh_md5": lambda: lsh_topk_literal(emb, qvec, planes, k=10),
        "pq_adc": lambda: pq_adc_topk(emb, qvec, cbs, k=10),
    }

    print(f"| arm | recall@10 | sec | ({n} vectors, {sf_dir}, local[{cpus}]) |")
    print("|---|---|---|---|")
    for name, build in arms.items():
        build().collect()  # warm: codegen + file listing
        t0 = time.time()
        ids = {r["vec_id"] for r in build().collect()}
        sec = time.time() - t0
        recall = len(ids & truth) / 10.0
        print(f"| {name} | {recall:.2f} | {sec:.2f} | |")


if __name__ == "__main__":
    main()
