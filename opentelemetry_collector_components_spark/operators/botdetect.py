"""Behavioral bot detection over web access logs.

Crawl hygiene for a Common-Crawl-style corpus: separate declared and
undeclared crawlers from human traffic BEFORE the documents they fetch
feed training-data statistics (bot-inflated pageview counts poison
quality/popularity signals the samplers downstream consume).  Beside the
declarative signals already in the repo (`functions/uaparse.py` declared
bot UAs, `operators/robots.py` compliance), this scores BEHAVIOR:
request rate, path repetition, cadence regularity, error share,
robots.txt probing.

Every decision is EXACT INTEGER arithmetic — thresholds are rational
inequalities cleared of division (rate > R/min becomes
``60*n > R*(span+60)``; coefficient-of-variation < c over per-minute
counts becomes ``4*m*(m*Σx² − S²) < (m−1)*S²`` for c = 1/2) — so the
same verdict replays bit-identically in any SQL engine and no
double-summation-order flake can flip a boundary row.

Scale shape: one groupBy per feature family — per-(client, minute)
counts first (map-side combine), then per-client aggregation of the
minute rows; no per-client ordered window, so a mega-bot with 10^9
requests costs two partial-aggregated shuffles, never a single-task
sort.  Feature columns are kept raw (counts, sums of squares) so the
score is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: declared-crawler UA fragments (lower-cased substring match) — the
#: self-identifying set; behavioral scoring exists for the rest
BOT_UA_TOKENS = ("bot", "crawler", "spider", "curl", "wget", "python-requests")


def client_features(
    logs: DataFrame,
    client_col: str = "client",
    ts_col: str = "ts",
    path_col: str = "path",
    status_col: str = "status",
    agent_col: str = "agent",
) -> DataFrame:
    """Per-client behavioral features from raw access rows.

    Returns one row per client: ``n_requests``, ``distinct_paths``,
    ``errors`` (status >= 400), ``span_s`` (whole-second activity span),
    ``minutes_active`` and ``minute_sumsq`` (count and sum-of-squares of
    per-minute request counts — the cadence-regularity ingredients),
    ``ua_bot`` (declared UA), ``robots_probes`` (/robots.txt hits).
    """
    sec = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    base = logs.select(
        F.col(client_col).alias("client"),
        sec.alias("_sec"),
        (sec / 60).cast("long").alias("_minute"),
        F.col(path_col).alias("_path"),
        F.col(status_col).cast("int").alias("_status"),
        F.lower(F.coalesce(F.col(agent_col), F.lit(""))).alias("_agent"),
    )
    ua_bot = F.max(
        F.when(
            F.array_contains(
                F.array(
                    *[
                        F.col("_agent").contains(t)
                        for t in BOT_UA_TOKENS
                    ]
                ),
                True,
            ),
            1,
        ).otherwise(0)
    )
    per_client = base.groupBy("client").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.countDistinct("_path").alias("distinct_paths"),
        F.sum(F.when(F.col("_status") >= 400, 1).otherwise(0)).alias("errors"),
        (F.max("_sec") - F.min("_sec")).alias("span_s"),
        ua_bot.alias("_ua_bot"),
        F.sum(
            F.when(F.col("_path") == "/robots.txt", 1).otherwise(0)
        ).alias("robots_probes"),
    )
    per_minute = (
        base.groupBy("client", "_minute")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("client")
        .agg(
            F.count(F.lit(1)).alias("minutes_active"),
            F.sum(F.col("_c") * F.col("_c")).alias("minute_sumsq"),
        )
    )
    return (
        per_client.join(per_minute, "client")
        .withColumn("ua_bot", (F.col("_ua_bot") == 1))
        .drop("_ua_bot")
    )


def score_bots(
    features: DataFrame,
    rate_per_min: int = 30,
    bot_threshold: int = 4,
) -> DataFrame:
    """Rule scores over ``client_features`` output; exact-integer
    comparisons only.

    Flags (each worth the listed points):

    - ``ua_bot`` (3): self-declared crawler UA
    - ``robots_probe`` (2): fetched /robots.txt at least once
    - ``high_rate`` (2): > ``rate_per_min`` requests/min over the span
      (``60·n > rate·(span+60)``; +60 s grace so a 1-request client
      can't divide by zero into an infinite rate)
    - ``high_repeat`` (1): > 80 % repeated paths (``n > 5·distinct``)
    - ``regular_cadence`` (1): per-minute count CV < 1/2 with ≥ 3
      active minutes AND ≥ 10 requests (``4m(m·Σx²−n²) < (m−1)·n²`` —
      metronome traffic; the volume floor matters: a human with a
      handful of single-request minutes has zero variance too)
    - ``high_error`` (1): > 30 % error responses (``10·err > 3·n``)

    ``is_bot`` when the score reaches ``bot_threshold`` (default 4: one
    strong signal plus corroboration, or several weak ones).
    """
    n = F.col("n_requests")
    m = F.col("minutes_active")
    flags = {
        "robots_probe": F.col("robots_probes") > 0,
        "high_rate": F.lit(60) * n > F.lit(rate_per_min) * (F.col("span_s") + 60),
        "high_repeat": n > F.lit(5) * F.col("distinct_paths"),
        "regular_cadence": (m >= 3)
        & (n >= 10)
        & (
            F.lit(4) * m * (m * F.col("minute_sumsq") - n * n)
            < (m - 1) * n * n
        ),
        "high_error": F.lit(10) * F.col("errors") > F.lit(3) * n,
    }
    out = features
    for name, cond in flags.items():
        out = out.withColumn(name, cond)
    score = (
        F.when(F.col("ua_bot"), 3).otherwise(0)
        + F.when(F.col("robots_probe"), 2).otherwise(0)
        + F.when(F.col("high_rate"), 2).otherwise(0)
        + F.when(F.col("high_repeat"), 1).otherwise(0)
        + F.when(F.col("regular_cadence"), 1).otherwise(0)
        + F.when(F.col("high_error"), 1).otherwise(0)
    )
    return out.withColumn("bot_score", score.cast("int")).withColumn(
        "is_bot", F.col("bot_score") >= bot_threshold
    )
