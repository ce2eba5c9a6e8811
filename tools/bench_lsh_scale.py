"""Scale-stress the LSH candidate-verification paths (VERDICT r3 #7).

Runs ``minhash_lsh_pairs`` and ``contaminated_ids_fuzzy`` on the sf0.1
documents table and on a 10x replica of it (the sf1 stand-in — no sf1
fixture exists), measuring docs/sec at both sizes.  Each replica k gets
an id offset and a distinct leading token; the token perturbs only the
first shingles, so every doc keeps ~9 near-identical cross-replica
copies (Jaccard ~0.9) and TRUE pair volume grows ~100x, not 10x —
measured: 256 pairs at 1x vs ~250k at 10x.  That makes this a
deliberately adversarial dup-density stress: the candidate-verification
stage must stay bounded by real candidate-pair volume (linear in
matches) rather than corpus size squared.  A quadratic stage would show
as a docs/sec collapse at 10x; the measured ratio is >= 1 (per-doc
throughput improves as fixed overheads amortize) even at this density.

Quiet-host protocol: run nothing else concurrently; interleaved reps,
best-of per level.  Usage: python tools/bench_lsh_scale.py [reps]
"""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from opentelemetry_collector_components_spark.caching import scoped_intermediates  # noqa: E402
from opentelemetry_collector_components_spark.operators.dedup import (  # noqa: E402
    contaminated_ids_fuzzy,
    minhash_lsh_pairs,
)
from opentelemetry_collector_components_spark.queries import load_docs_spread  # noqa: E402
from opentelemetry_collector_components_spark.session import get_spark  # noqa: E402


def replicate(docs, factor: int):
    """k-th replica: offset ids, prefix a replica token to the text."""
    reps = None
    for k in range(factor):
        r = docs.select(
            (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
            F.concat(F.lit(f"rep{k} "), F.col("text")).alias("text"),
        )
        reps = r if reps is None else reps.unionByName(r)
    return reps


def run_op(docs, op):
    with scoped_intermediates():
        if op == "minhash":
            out = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.2, engine="md5")
        else:
            bench = docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 100_000_000).alias("doc_id"),
                F.substring("text", 1, 200).alias("text"),
            )
            out = contaminated_ids_fuzzy(docs, bench, threshold=0.2, engine="md5")
        t0 = time.monotonic()
        n = out.count()
        return time.monotonic() - t0, n


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="lsh-scale", master="local[32]")
    # BOTH levels persist and pre-materialize, so each timed rep pays the
    # same (zero) input-scan cost — an unpersisted 1x side would inflate
    # per-doc cost at 1x and bias the scaling ratio upward
    base = (
        load_docs_spread(spark, "/root/testdata/sf0.1")
        .select("doc_id", "text")
        .persist()
    )
    big = replicate(base, 10).repartition(64).persist()
    n_base, n_big = base.count(), big.count()
    results = {}
    for op in ("minhash", "fuzzy"):
        for label, docs, n in (("1x", base, n_base), ("10x", big, n_big)):
            best, pairs = None, None
            for _ in range(reps):
                sec, cnt = run_op(docs, op)
                best = sec if best is None or sec < best else best
                pairs = cnt
            results[(op, label)] = (n, best, n / best, pairs)
            print(f"{op:8s} {label:3s} docs={n:6d} best={best:7.2f}s "
                  f"docs/s={n / best:9.0f} out_rows={pairs}")
    for op in ("minhash", "fuzzy"):
        r1, r10 = results[(op, "1x")], results[(op, "10x")]
        print(f"{op}: throughput ratio 10x/1x = {r10[2] / r1[2]:.2f} "
              f"(1.0 = perfectly linear)")


if __name__ == "__main__":
    main()
