"""Scale-stress the round-4 cost-dominant scan shapes at 10x (r4 #4).

The four shapes the r4 bench identified as the new heavy rows —
main-content extraction, WARC->HTTP parse, redirect resolution, and the
vectorized SemDeDup — each run at their bench volume (1x) and at 10x,
reporting rows/sec at both plus the ratio.  Linear shapes hold or
improve per-row throughput as fixed overheads amortize; a quadratic
stage would show as a collapse at 10x.

SemDeDup honesty note: within-cluster pair search is quadratic in
CLUSTER SIZE by definition, so the honest scale story (SemDeDup paper,
operator docstring) grows k with the corpus — this stress scales
centroids 25 -> 250 alongside rows 2k -> 20k so cluster volume stays
constant and total work grows linearly, exactly how a production
deployment would run it.  Replica vectors are perturbed in one
dimension per replica so the 10x corpus is distinct but
distribution-alike.

Quiet-host protocol: run nothing else concurrently.
Usage: python tools/bench_scan_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opentelemetry_collector_components_spark.caching import (  # noqa: E402
    scoped_intermediates,
)
from opentelemetry_collector_components_spark.session import get_spark  # noqa: E402


def timed(build):
    """Noop-sink materialization (same trigger as bench.py) — a bare
    count() would let Catalyst prune every computed column and time an
    empty scan; the row count comes from a cheap second count()."""
    with scoped_intermediates():
        t0 = time.monotonic()
        build().write.mode("overwrite").format("noop").save()
        sec = time.monotonic() - t0
    with scoped_intermediates():
        n = build().count()
    return sec, n


def main() -> None:
    from opentelemetry_collector_components_spark.functions.webtext import (
        add_main_content,
        decode_entities,
    )
    from opentelemetry_collector_components_spark.operators.redirects import (
        resolve_redirects,
    )
    from opentelemetry_collector_components_spark.operators.similarity import (
        semantic_dedup_pairs_vectorized,
    )
    from opentelemetry_collector_components_spark.queries import load
    from opentelemetry_collector_components_spark.sources.pages import (
        generate_article_pages,
        generate_fetch_log,
    )
    from opentelemetry_collector_components_spark.sources.warc import (
        generate_warc_records,
        parse_http_response,
        parse_warc_records,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scan-scale", master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    n_vecs = load(spark, sf_dir, "embeddings").count()

    def semdedup_build(factor: int):
        emb = load(spark, sf_dir, "embeddings")
        reps = None
        for k in range(factor):
            r = emb.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: F.when(i == k % 64, x + F.lit(0.01) * k).otherwise(x),
                ).alias("embedding"),
            )
            reps = r if reps is None else reps.unionByName(r)
        corpus = reps
        cent_rows = corpus.where(
            (F.col("vec_id") % 10_000_000) < 25
        ).orderBy("vec_id").collect()
        cents = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in cent_rows
        ]
        return lambda: semantic_dedup_pairs_vectorized(
            corpus, cents, threshold=0.35
        )

    shapes = {
        "main_content": lambda n: lambda: add_main_content(
            generate_article_pages(spark, n)
        ).select("doc_id", decode_entities(F.col("main_text")).alias("text")),
        "warc_http_responses": lambda n: lambda: parse_http_response(
            parse_warc_records(generate_warc_records(spark, n))
        ),
        "redirect_resolution": lambda n: lambda: resolve_redirects(
            generate_fetch_log(spark, n)
        ),
    }
    base = {
        "main_content": 1_000_000,
        "warc_http_responses": 2_000_000,
        "redirect_resolution": 1_000_000,
    }

    print("| shape | rows 1x | sec 1x | rows/s 1x | rows 10x | sec 10x"
          " | rows/s 10x | ratio |")
    print("|---|---|---|---|---|---|---|---|")
    for name, mk in shapes.items():
        s1, n1 = timed(mk(base[name]))
        s10, n10 = timed(mk(base[name] * 10))
        r1, r10 = n1 / s1, n10 / s10
        print(f"| {name} | {n1} | {s1:.1f} | {r1:,.0f} | {n10} | {s10:.1f}"
              f" | {r10:,.0f} | {r10 / r1:.2f} |")

    s1, n1 = timed(semdedup_build(1))
    s10, n10 = timed(semdedup_build(10))
    # rows/s on CORPUS volume (fixture count x factor), not output pairs
    r1, r10 = n_vecs / s1, n_vecs * 10 / s10
    print(f"| semantic_dedup_vec (k=25->250) | pairs {n1} | {s1:.1f} | {r1:,.0f}"
          f" | pairs {n10} | {s10:.1f} | {r10:,.0f} | {r10 / r1:.2f} |")


if __name__ == "__main__":
    main()
