"""spark-submit entry point for the flagship pipeline (north-rule run mode).

The package ships as a zip on --py-files, so this file imports it the way a
cluster executor would — from the distributed archive, not a checkout.

    python tools/make_pyfiles_zip.py                       # -> /tmp/otelcol_spark.zip
    spark-submit --master local[8]  --py-files /tmp/otelcol_spark.zip \
        tools/submit_job.py 2000000
    spark-submit --master local[32] --py-files /tmp/otelcol_spark.zip \
        tools/submit_job.py 2000000

Prints one JSON line: {"cores":..., "rows":..., "sec":..., "docs_per_sec":...}.
On a real cluster, swap --master for the cluster manager URL and the two
parallelism levels for N- and 4N-executor submissions.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = SparkSession.builder.getOrCreate()
    # the package must come off --py-files (no repo dir on sys.path here)
    from opentelemetry_collector_components_spark.operators.aggregate import (
        interval_rollup_union,
    )
    from opentelemetry_collector_components_spark.plans.pipeline import DEFAULT_SPEC
    from opentelemetry_collector_components_spark.sources.pages import generate_pages

    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def run(n: int) -> None:
        routed = DEFAULT_SPEC.build(generate_pages(spark, n, partitions=cores * 4), spark)
        agg = interval_rollup_union(routed, keys=["sink", "geo"])
        agg.write.mode("overwrite").format("noop").save()

    run(100_000)  # warm codegen + JIT
    t0 = time.time()
    run(rows)
    sec = time.time() - t0
    print(
        json.dumps(
            {
                "mode": "spark-submit --py-files",
                "cores": cores,
                "rows": rows,
                "sec": round(sec, 3),
                "docs_per_sec": round(rows / sec),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
