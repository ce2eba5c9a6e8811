"""JSON schema profiling + drift: what key paths do the logs carry, and
what started appearing.

Structured-log payloads (the ``props``/``attributes`` blob every intake
row carries) evolve without announcements: a deploy adds ``exp_id``, a
team nests a new ``user.geo`` object, a type flips from scalar to
object.  This operator family profiles the OBSERVED schema — key paths
to bounded depth with a coarse JSON type — and flags the paths that are
new per time bucket, the schema-drift twin of
``textmine.template_novelty`` (which watches message shapes; this
watches payload structure).

Type attestation uses the VARIANT path (``from_json`` to
``map<string,variant>`` + ``schema_of_variant``), which preserves JSON
types exactly: a STRING whose content happens to look like
``"[GC pause]"`` or ``"{...}"`` classifies as scalar and is never
descended into (the ``map<string,string>`` re-render trick would
misread both and fabricate child paths from message text).  Classes
are deliberately coarse — {object, array, scalar, null} — so the grid
stays stable across numeric-type wobble (int vs double) while still
catching the structural flips that break consumers.

Scale shape: path extraction is a JVM expression forest (variant map
parse + ``explode`` per nested level — no Python, no UDF); one row
explodes to (paths <= keys*depth) rows, then ONE partial-aggregated
groupBy collapses the corpus to the (bucket, path, type) grid.
Novelty is a self-join of that tiny grid against its per-path minimum
— never against raw rows.  Depth is bounded (default 2 levels) —
deeper objects profile as type 'object' at their parent path, the
standard truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _classify(vtype: Column) -> Column:
    """Coarse class from a ``schema_of_variant`` string — the type the
    parse itself attests, not a content sniff."""
    return (
        F.when(vtype == "VOID", F.lit("null"))
        .when(vtype.startswith("OBJECT"), F.lit("object"))
        .when(vtype.startswith("ARRAY"), F.lit("array"))
        .otherwise(F.lit("scalar"))
    )


def json_key_paths(
    df: DataFrame,
    json_col: str,
    keep_cols: list[str] | None = None,
    max_depth: int = 2,
) -> DataFrame:
    """One row per (keep_cols..., path, jtype) for every key path in the
    JSON column, to ``max_depth`` levels ('a.b' paths; dots inside keys
    are not escaped — payload keys are identifiers in practice).  Only
    true OBJECT values are descended into."""
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    keep = list(keep_cols or [])
    levels = []
    cur = df.select(
        *keep,
        F.lit("").alias("prefix"),
        F.explode(
            F.from_json(F.col(json_col), "map<string,variant>")
        ).alias("k", "v"),
    ).select(
        *keep,
        F.concat(F.col("prefix"), F.col("k")).alias("path"),
        F.col("v"),
        F.schema_of_variant(F.col("v")).alias("vt"),
    )
    levels.append(
        cur.select(*keep, "path", _classify(F.col("vt")).alias("jtype"))
    )
    for _ in range(1, max_depth):
        cur = cur.where(F.col("vt").startswith("OBJECT")).select(
            *keep,
            F.concat(F.col("path"), F.lit(".")).alias("prefix"),
            F.explode(
                F.from_json(F.col("v").cast("string"), "map<string,variant>")
            ).alias("k", "v"),
        ).select(
            *keep,
            F.concat(F.col("prefix"), F.col("k")).alias("path"),
            F.col("v"),
            F.schema_of_variant(F.col("v")).alias("vt"),
        )
        levels.append(
            cur.select(*keep, "path", _classify(F.col("vt")).alias("jtype"))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def json_schema_profile(
    df: DataFrame,
    json_col: str,
    group_cols: list[str] | None = None,
    max_depth: int = 2,
) -> DataFrame:
    """(group_cols..., path, jtype, n) — the observed-schema grid."""
    groups = list(group_cols or [])
    paths = json_key_paths(df, json_col, keep_cols=groups, max_depth=max_depth)
    return paths.groupBy(*groups, "path", "jtype").agg(
        F.count(F.lit(1)).alias("n")
    )


def schema_novelty(
    profile: DataFrame, time_col: str, path_col: str = "path"
) -> DataFrame:
    """Adds ``is_new``: true on the profile rows whose time bucket is the
    path's first appearance — the drift alert feed.  Join of the grid
    against its own per-path minimum (both tiny; the corpus is long
    gone by here)."""
    first = profile.groupBy(path_col).agg(F.min(time_col).alias("__first"))
    return (
        profile.join(first, path_col)
        .withColumn("is_new", F.col(time_col) == F.col("__first"))
        .drop("__first")
    )
