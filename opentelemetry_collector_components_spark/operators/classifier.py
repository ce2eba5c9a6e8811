"""Supervised quality-classifier training in pure Spark aggregations.

Web-scale training-data pipelines gate documents with a LEARNED quality
filter (CCNet trains a linear classifier against a trusted target
corpus; DCLM and RefinedWeb train binary quality classifiers the same
way).  The essential distributed shape of that training step is: the
MODEL is a tiny vector that lives on the driver, and each iteration is
ONE full-batch aggregation job over the corpus that reduces to a
gradient of the model's size — the corpus itself is never shuffled.

This module implements that shape as logistic regression trained by
full-batch gradient descent with every quantity QUANTIZED to integer
micro-units (1e-6):

  z_i      = sum_j w_j * x_ij                (BIGINT micro; x integer)
  p_i      = FLOOR(1e6 * sigmoid(z_i / 1e6)) (BIGINT micro)
  grad_j   = sum_i (p_i - 1e6 * y_i) * x_ij  (BIGINT, exact)
  w_j     <- w_j - FLOOR(grad_j / (lr_inv * n))

Because the gradient is an integer SUM of integer per-row terms, it is
exactly associative — the result is identical under any partitioning,
any reduce-tree shape, and any engine, so the whole T-iteration
trajectory is deterministic and a SQL engine can replay it to the same
final weights (the DuckDB oracle does exactly that, T unrolled CTE
rounds).  The only float touchpoints are sigmoid and the lr division,
both immediately floored to micro-units — the same cross-engine
discretization idiom as the DSIR scores (sampling.py).

Scale: each iteration is a column-pruned scan + a k-term reduce
(k = number of features); no shuffle at all — Spark's partial
aggregation builds the reduce tree.  The weights are inlined into the
next iteration's expressions as literals, i.e. broadcast by
construction.  At 100 TB that is T scan jobs, embarrassingly parallel.

Reference behavioral provenance: the reference pipeline has no trained
classifier (it is an OTel collector), but its two-phase
aggregate-then-finalize discipline (lsminterval processor) is the same
partial-agg contract this training loop leans on.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def _p_micro(z_micro: Column) -> Column:
    """FLOOR(1e6 * sigmoid(z/1e6)) — the quantized prediction."""
    return F.floor(
        F.lit(float(MICRO)) / (F.lit(1.0) + F.exp(-z_micro.cast("double") / F.lit(float(MICRO))))
    ).cast("long")


def train_logreg_quantized(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str],
    iterations: int = 3,
    lr_inv: int = 100,
) -> dict[str, int]:
    """Full-batch quantized gradient descent; returns {feature: w_micro}.

    ``df`` must carry integer feature columns and a 0/1 integer label.
    One aggregation job per iteration; the row count rides along in the
    first job's aggregate (no separate count scan).  lr = 1 / lr_inv.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if lr_inv < 1:
        raise ValueError(f"lr_inv must be >= 1, got {lr_inv}")
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    w = {f: 0 for f in feature_cols}
    n = None
    for it in range(iterations):
        z = None
        null_flag = F.col(label_col).isNull()
        for f in feature_cols:
            term = F.lit(w[f]) * F.col(f).cast("long")
            z = term if z is None else z + term
            null_flag = null_flag | F.col(f).isNull()
        resid = _p_micro(z) - F.lit(MICRO) * F.col(label_col).cast("long")
        # per-row product stays in BIGINT (|resid| <= 1e6 micro; features
        # would need magnitude > 9.2e12 to overflow it) but the corpus
        # SUM goes through decimal(38,0) — 128-bit, like the SQL engines'
        # BIGINT-sum accumulators — so 1e11-row gradients cannot wrap
        aggs = [
            F.sum((resid * F.col(f).cast("long")).cast("decimal(38,0)")).alias(f)
            for f in feature_cols
        ]
        aggs.append(F.count(F.lit(1)).alias("_n"))
        if it == 0:
            aggs.append(F.sum(null_flag.cast("long")).alias("_nulls"))
        row = df.agg(*aggs).collect()[0]
        if n is None:
            n = row["_n"]
            if n == 0:
                raise ValueError("cannot train on an empty DataFrame")
            if row["_nulls"]:
                # a NULL label or feature silently vanishes from SUM while
                # still counting in n — the gradient would quietly shrink
                raise ValueError(
                    f"{row['_nulls']} rows have NULL label/features — "
                    "coalesce or filter them upstream"
                )
        for f in feature_cols:
            w[f] -= math.floor(int(row[f]) / float(lr_inv * n))
    return w


def score_logreg_quantized(
    df: DataFrame,
    weights: dict[str, int],
    id_cols: list[str],
) -> DataFrame:
    """Score rows with trained micro-weights: (ids, score_micro,
    prob_micro, predicted).  Pure JVM column expressions — the inference
    path is a projection, no shuffle, no Python."""
    z = None
    for f, wv in weights.items():
        term = F.lit(wv) * F.col(f).cast("long")
        z = term if z is None else z + term
    p = _p_micro(z)
    return df.select(
        *id_cols,
        z.alias("score_micro"),
        p.alias("prob_micro"),
        (p >= F.lit(MICRO // 2)).cast("int").alias("predicted"),
    )


def weights_table(df: DataFrame, weights: dict[str, int]) -> DataFrame:
    """Materialize a trained weight dict as a (feature, weight_micro)
    DataFrame — the model-registry handoff shape."""
    spark = df.sparkSession
    return spark.createDataFrame(
        [(f, int(v)) for f, v in weights.items()],
        schema="feature string, weight_micro long",
    )
