"""Signals -> metrics — the contrib ``signaltometricsconnector``.

Shipped in the reference distribution
(distributions/elastic-components/manifest.yaml:23, the
Elastic-contributed contrib connector): config declares metrics to
DERIVE from a signal stream — each with OTTL ``conditions`` selecting
which records contribute, ``attributes`` naming the dimensions, and a
metric body (``sum`` with a value expression, ``counter``, or
``histogram`` with explicit bounds).  The classic use is span streams
-> RED metrics without touching instrumentation.

Spec model (mirrors the connector's YAML):

    {"name": "http.errors",
     "conditions": ['attributes["code"] >= "500"'],   # OR'd; [] = all
     "attributes": {"svc": 'resource.attributes["svc"]', ...},
     "type": "counter"}                               # or:
    {"type": "sum", "value": "value"}                 # OTTL operand
    {"type": "histogram", "value": "...", "bounds": [0, 10, 100]}
    {"type": "exponential_histogram", "value": "...", "scale": 2}

Conditions and value/dimension operands compile through the OTTL-lite
compiler (operators/filtering.py) — so selection predicates on scan
columns push down, and everything stays a Catalyst expression.
Records are INCLUDED when any condition is definitely true (the
connector's semantics — the mirror image of filterprocessor's drop).

Output (one unioned frame, fixed schema): ``metric_name``, ``dims``
(map<string,string> of dimension name -> stringified value; NULL
dimension values keep the record with a NULL map entry dropped, as
pcommon maps cannot hold nils), ``n`` (contributing records),
``sum_milli`` (half-up milli of the summed value; NULL for counter),
``bucket_counts`` (per-bucket counts, len(bounds)+1 with overflow
last; NULL for non-histograms), and for exponential histograms the
base-2 OTel buckets as a SPARSE ``exp_buckets`` string
("idx:count,..." sorted by idx — index = ceil(log2(v)·2^scale) − 1,
the standard mapping shared with operators/exphist.py) plus
``zero_count`` (values ≤ 0 land in the zero bucket; this body targets
non-negative measurements — durations, sizes).

Scale shape: per spec, one filtered scan projection + ONE partial-
aggregated groupBy on the dimension tuple; specs union after
aggregation (tiny frames).  Histogram buckets are conditional sums in
the same aggregate — no extra pass, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .filtering import compile_condition


def _include(conditions: list[str]) -> Column:
    sel = None
    for c in conditions:
        col = compile_condition(c)
        sel = col if sel is None else (sel | col)
    if sel is None:
        return F.lit(True)
    return F.coalesce(sel, F.lit(False))


def _one_metric(df: DataFrame, spec: dict) -> DataFrame:
    mtype = spec.get("type", "counter")
    dims = spec.get("attributes", {})
    dim_cols = {
        name: compile_condition(expr).cast("string")
        for name, expr in dims.items()
    }
    src = df.where(_include(spec.get("conditions", []))).select(
        *[c.alias(f"_d_{n}") for n, c in dim_cols.items()],
        *(
            [compile_condition(spec["value"]).cast("double").alias("_v")]
            if mtype in ("sum", "histogram", "exponential_histogram")
            else []
        ),
    )
    if mtype == "exponential_histogram":
        return _exp_hist_metric(src, spec, dim_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    if mtype in ("sum", "histogram"):
        aggs.append(
            F.floor(F.sum("_v") * 1000 + F.lit(0.5)).cast("long").alias("sum_milli")
        )
    else:
        aggs.append(F.lit(None).cast("long").alias("sum_milli"))
    if mtype == "histogram":
        bounds = spec["bounds"]
        buckets = []
        prev = None
        for b in bounds:
            cond = F.col("_v") <= F.lit(float(b))
            if prev is not None:
                cond = cond & (F.col("_v") > F.lit(float(prev)))
            buckets.append(F.sum(cond.cast("long")))
            prev = b
        buckets.append(F.sum((F.col("_v") > F.lit(float(bounds[-1]))).cast("long")))
        aggs.append(F.array(*buckets).alias("bucket_counts"))
    else:
        aggs.append(F.lit(None).cast("array<long>").alias("bucket_counts"))
    grouped = src.groupBy(*[f"_d_{n}" for n in dim_cols]).agg(*aggs)
    return grouped.select(
        F.lit(spec["name"]).alias("metric_name"),
        _dims_map(dim_cols).alias("dims"),
        "n",
        "sum_milli",
        "bucket_counts",
        F.lit(None).cast("string").alias("exp_buckets"),
        F.lit(None).cast("long").alias("zero_count"),
    )


def _dims_map(dim_cols: dict) -> Column:
    entries = []
    for n in dim_cols:
        entries += [F.lit(n), F.col(f"_d_{n}")]
    if not entries:
        return F.create_map().cast("map<string,string>")
    return F.map_filter(
        F.map_from_arrays(F.array(*entries[0::2]), F.array(*entries[1::2])),
        lambda _, v: v.isNotNull(),
    )


def _exp_hist_metric(src: DataFrame, spec: dict, dim_cols: dict) -> DataFrame:
    """Base-2 exponential buckets, fully JVM: per-record bucket index ->
    two partial-aggregated groupBys (dims+idx counts, then dims fold into
    the sparse sorted "idx:count" string)."""
    scale = int(spec.get("scale", 0))
    v = F.col("_v")
    idx = F.when(
        v > 0, (F.ceil(F.log2(v) * F.lit(float(2 ** scale))) - 1).cast("long")
    )
    dkeys = [f"_d_{n}" for n in dim_cols]
    per_bucket = (
        src.select(*dkeys, idx.alias("_idx"), v.alias("_v"))
        .groupBy(*dkeys, "_idx")
        .agg(
            F.count(F.lit(1)).alias("_bn"),
            # raw double partials: milli-rounding only ONCE at the end,
            # matching the other bodies' single-phase floor
            F.sum("_v").alias("_bsum"),
        )
    )
    folded = per_bucket.groupBy(*dkeys).agg(
        F.sum("_bn").alias("n"),
        F.floor(F.sum("_bsum") * 1000 + F.lit(0.5)).cast("long").alias("sum_milli"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("_idx").isNotNull(),
                            F.struct(F.col("_idx").alias("i"), F.col("_bn").alias("c")),
                        )
                    )
                ),
                lambda e: F.concat(
                    e["i"].cast("string"), F.lit(":"), e["c"].cast("string")
                ),
            ),
            ",",
        ).alias("exp_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("_idx").isNull(), F.col("_bn"))), F.lit(0)
        ).alias("zero_count"),
    )
    return folded.select(
        F.lit(spec["name"]).alias("metric_name"),
        _dims_map(dim_cols).alias("dims"),
        "n",
        "sum_milli",
        F.lit(None).cast("array<long>").alias("bucket_counts"),
        "exp_buckets",
        "zero_count",
    )


def signal_to_metrics(df: DataFrame, specs: list[dict]) -> DataFrame:
    """Derive every spec'd metric from the signal frame; one unioned
    result (see module docstring for schema and spec model)."""
    if not specs:
        raise ValueError("signal_to_metrics needs at least one spec")
    out = None
    for spec in specs:
        m = _one_metric(df, spec)
        out = m if out is None else out.unionByName(m)
    return out
