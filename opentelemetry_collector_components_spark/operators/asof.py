"""As-of (temporal) join: attach the latest dimension version at event time.

The entityanalytics source (S6) syncs slowly-changing entity attributes;
joining events against *the version that was current when the event
happened* is the temporal-correctness form of E7's broadcast enrich — and
a classic operator Spark's DataFrame API lacks natively.  Two Spark-first
implementations with identical output (equality is test-pinned, and both
match DuckDB's native ``ASOF JOIN`` in the oracle gate):

- ``asof_join_range`` — versions get validity intervals via ``lead()``
  (one tiny window over the DIM table), then an equi-join on key with the
  interval containment as a join-side range predicate.  Shuffles on key
  once; per-key cost is events/key x versions/key, the right shape when
  versions per key are bounded (slowly-changing dims — the common case).
- ``asof_join_union`` — tags and unions events with dim rows, one window
  per key ordered by (ts, dim-first) filling the latest attributes
  forward (``last(..., ignorenulls=True)``).  One shuffle, linear per-key
  cost even with high-frequency dim churn; a single pathological hot key
  serializes its window partition (same caveat as every per-key scan
  here — shard by time range if that key dominates).

Ties (event ts == version ts) take the version effective AT the event
timestamp, matching DuckDB ``ASOF JOIN ... ON e.ts >= d.ts``.  Events
with no prior version keep NULL attributes (left-join semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _versioned(dims: DataFrame, key_cols: list[str], dim_ts_col: str):
    w = Window.partitionBy(*key_cols).orderBy(dim_ts_col)
    return dims.withColumn("_valid_to", F.lead(dim_ts_col).over(w))


def asof_join_range(
    events: DataFrame,
    dims: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    dim_ts_col: str = "dim_ts",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Interval form: version v covers [v.ts, next_version.ts)."""
    attrs = attrs or [
        c for c in dims.columns if c not in set(key_cols) | {dim_ts_col}
    ]
    v = _versioned(dims.select(*key_cols, dim_ts_col, *attrs), key_cols, dim_ts_col)
    cond = F.col(f"e.{ts_col}") >= F.col(f"d.{dim_ts_col}")
    cond = cond & (
        F.col("d._valid_to").isNull() | (F.col(f"e.{ts_col}") < F.col("d._valid_to"))
    )
    for k in key_cols:
        cond = cond & (F.col(f"e.{k}") == F.col(f"d.{k}"))
    joined = events.alias("e").join(v.alias("d"), cond, "left")
    return joined.select(
        *[F.col(f"e.{c}") for c in events.columns],
        *[F.col(f"d.{a}").alias(a) for a in attrs],
    )


def scd2_from_changes(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Build an SCD2 (type-2 slowly-changing-dimension) history from a
    change log: (keys..., attrs..., valid_from, valid_to, is_current,
    version INT 1-based).

    Change logs re-emit unchanged snapshots (full-state syncs, heartbeat
    upserts — the entityanalytics full-sync shape); consecutive rows whose
    attributes are unchanged are COMPACTED into one version (null-safe
    struct compare against the previous row, so a NULL attribute value is
    a faithful state, not a wildcard).  ``valid_to`` is the next
    version's ``valid_from`` (half-open [from, to) — the contract
    ``asof_join_range`` joins against); the latest version per key is
    ``is_current`` with NULL ``valid_to``.

    One shuffle on the key: the compaction lag and the post-compaction
    lead/row_number all cluster on the same key partitioning (Spark
    re-sorts, never re-shuffles).  (key, ts) pairs are assumed unique —
    the change-log contract; duplicated instants would make "previous
    row" ill-defined in any engine.
    """
    attrs = attrs or [
        c for c in changes.columns if c not in set(key_cols) | {ts_col}
    ]
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    snap = F.struct(*[F.col(a) for a in attrs])
    compacted = (
        changes.select(*key_cols, ts_col, *attrs)
        .withColumn("_prev", F.lag(snap).over(w))
        .where(F.col("_prev").isNull() | ~snap.eqNullSafe(F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col)
    return (
        compacted.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w2).cast("int"))
        .drop(ts_col)
    )


def asof_join_union(
    events: DataFrame,
    dims: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    dim_ts_col: str = "dim_ts",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Union-window form: one shuffle, linear per-key cost.

    The fill carries the whole version as ONE struct, not per-attribute
    columns: a per-attr ``last(attr, ignorenulls=True)`` would skip a
    version whose attribute is legitimately NULL (returning a stale older
    value) and could even mix attributes from different versions — the
    struct is non-null whenever a version row exists, so NULL attribute
    values propagate faithfully and versions stay atomic."""
    attrs = attrs or [
        c for c in dims.columns if c not in set(key_cols) | {dim_ts_col}
    ]
    ver_type = ", ".join(
        f"`{a}`: {dims.schema[a].dataType.simpleString()}" for a in attrs
    )
    e = events.withColumn("_ver", F.lit(None).cast(f"struct<{ver_type}>"))
    e = e.withColumn("_is_dim", F.lit(0))
    d = dims.select(
        *key_cols,
        F.col(dim_ts_col).alias(ts_col),
        F.struct(*[F.col(a) for a in attrs]).alias("_ver"),
    ).withColumn("_is_dim", F.lit(1))
    for c in events.columns:
        if c not in d.columns:
            d = d.withColumn(c, F.lit(None).cast(events.schema[c].dataType))
    unioned = e.unionByName(d.select(*e.columns))
    # dim rows sort BEFORE events at the same timestamp (_is_dim desc), so
    # a version effective exactly at the event instant is visible to it
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_is_dim").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_filled", F.last("_ver", ignorenulls=True).over(w))
    return filled.filter(F.col("_is_dim") == 0).select(
        *events.columns,
        *[F.col("_filled")[a].alias(a) for a in attrs],
    )


def point_in_time_features(
    labels: DataFrame,
    feature_tables: list[tuple[str, DataFrame, str]],
    key_cols: list[str],
    ts_col: str = "ts",
    strict: bool = True,
) -> DataFrame:
    """Point-in-time-correct training-set builder — the feature-store
    join that prevents temporal leakage: every label row picks up, from
    each feature table, the newest snapshot visible AT its timestamp and
    never a later one.  ``feature_tables`` is ``[(prefix, df,
    snapshot_ts_col), ...]``; each table's attributes land prefixed
    (``<prefix>_<attr>``) so sources never collide.

    ``strict=True`` (the TRAINING default) excludes snapshots stamped at
    exactly the label instant — a feature computed FROM the label event
    shares its timestamp, and including it is the classic half-leak; the
    label time is shifted one microsecond back for the lookup only
    (serving-time lookups, where the event itself is not a feature
    source, pass ``strict=False`` for the inclusive as-of).

    One ``asof_join_union`` pass per feature table — each is one shuffle
    on the key with linear per-key cost; tables chain, labels never
    self-join."""
    if not feature_tables:
        raise ValueError("feature_tables must be non-empty")
    names = [p for p, _, _ in feature_tables]
    if len(set(names)) != len(names):
        raise ValueError("feature table prefixes must be unique")
    lookup_ts = "_pit_ts"
    out = labels.withColumn(
        lookup_ts,
        F.col(ts_col) - F.expr("INTERVAL 1 MICROSECOND")
        if strict
        else F.col(ts_col),
    )
    for prefix, fdf, fts in feature_tables:
        attrs = [c for c in fdf.columns if c not in set(key_cols) | {fts}]
        # prefix BEFORE the join so a feature attr can never collide with
        # a label column (or another table's) inside the union fill
        renamed = fdf
        for a in attrs:
            renamed = renamed.withColumnRenamed(a, f"{prefix}_{a}")
        out = asof_join_union(
            out,
            renamed,
            key_cols,
            ts_col=lookup_ts,
            dim_ts_col=fts,
            attrs=[f"{prefix}_{a}" for a in attrs],
        )
    return out.drop(lookup_ts)
