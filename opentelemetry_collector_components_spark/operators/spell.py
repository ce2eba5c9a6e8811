"""SymSpell-style dictionary spell correction via delete-neighborhood
blocking (Garbe's public SymSpell algorithm; the delete-variant trick of
FAROO 2012).

The query-side complement of ``editjoin.py``'s PassJoin self-join: given a
(term, freq) dictionary and a stream of possibly-misspelled tokens, find
each token's best dictionary correction within ``max_edits`` — the
query-log / log-template normalization shape, where the dictionary is the
small side and tokens arrive in bulk.

Blocking: every string maps to its depth-1 delete neighborhood (itself +
each single-character deletion).  For edit distance <= 1 the neighborhoods
of query and term always intersect (substitution: delete the differing
position from both; insertion/deletion: the shorter IS a variant of the
longer), so an equi-join on variants finds every candidate — ~(len+1)
index entries per string instead of an all-pairs cross join.  Exactness
is restored by a ``levenshtein`` verify (both engines implement plain
Levenshtein identically).  Depth-k deletes generalize to max_edits = k;
this implementation fixes depth 1 (the log-normalization sweet spot —
deeper neighborhoods grow combinatorially, PassJoin covers larger k).

Correction policy (deterministic): smallest distance, then highest
``freq``, then lexicographically smallest term.

Scale shape: two scan-fused explodes + one hash equi-join on the variant
key + distinct + verify + one two-phase arg-min groupBy.  No UDF, no
unpartitioned window, no driver collect.  A skewed variant key (many
same-length terms sharing a deletion) inflates candidates, not
correctness — the same published caveat as PassJoin's shared segments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_variants(col: str) -> Column:
    """Depth-1 delete neighborhood as an array column: the string itself
    plus every single-character deletion (JVM expression only)."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(0, length({col}) - 1),"
        f" i -> concat(substring({col}, 1, i), substring({col}, i + 2, 1000000))))"
    )


def spell_correct(
    queries: DataFrame,
    vocab: DataFrame,
    query_col: str = "q",
    term_col: str = "term",
    freq_col: str = "freq",
) -> DataFrame:
    """Best dictionary correction within edit distance 1 per query token.
    Output: (``query_col``, ``term_col``, distance INT, ``freq_col``) —
    queries with no candidate are absent (callers left-join back if they
    need the miss set)."""
    qv = queries.select(query_col, F.explode(delete_variants(query_col)).alias("_v"))
    tv = vocab.select(
        term_col, freq_col, F.explode(delete_variants(term_col)).alias("_v")
    )
    cand = qv.join(tv, "_v").select(query_col, term_col, freq_col).distinct()
    ver = cand.withColumn(
        "distance", F.levenshtein(F.col(query_col), F.col(term_col))
    ).where(F.col("distance") <= 1)
    # two-phase arg-min: pack the policy into one orderable struct so the
    # groupBy min is a partial-aggregated shuffle, not a window
    ranked = ver.select(
        query_col,
        F.struct(
            F.col("distance"),
            (-F.col(freq_col)).alias("_negfreq"),
            F.col(term_col).alias(term_col),
            F.col(freq_col).alias(freq_col),
        ).alias("_pick"),
    )
    best = ranked.groupBy(query_col).agg(F.min("_pick").alias("_pick"))
    return best.select(
        query_col,
        F.col(f"_pick.{term_col}").alias(term_col),
        F.col("_pick.distance").alias("distance"),
        F.col(f"_pick.{freq_col}").alias(freq_col),
    )


def spell_correct_oracle_sql(
    queries_sql: str,
    vocab_sql: str,
    query_col: str = "q",
    term_col: str = "term",
    freq_col: str = "freq",
) -> str:
    """DuckDB restatement: identical delete neighborhoods via list
    comprehension, identical levenshtein verify, identical policy."""
    variants = (
        "list_prepend({c}, list_transform(range(0, length({c})),"
        " i -> substring({c}, 1, i) || substring({c}, i + 2, 1000000)))"
    )
    qvar = variants.format(c=query_col)
    tvar = variants.format(c=term_col)
    return f"""
    WITH qv AS (
        SELECT {query_col}, UNNEST({qvar}) AS v
        FROM ({queries_sql}) qq
    ), tv AS (
        SELECT {term_col}, {freq_col}, UNNEST({tvar}) AS v
        FROM ({vocab_sql}) vv
    ), cand AS (
        SELECT DISTINCT qv.{query_col}, tv.{term_col}, tv.{freq_col}
        FROM qv JOIN tv ON qv.v = tv.v
    ), ver AS (
        SELECT {query_col}, {term_col}, {freq_col},
               levenshtein({query_col}, {term_col}) AS distance
        FROM cand
        WHERE levenshtein({query_col}, {term_col}) <= 1
    ), ranked AS (
        SELECT {query_col}, {term_col}, distance, {freq_col},
               ROW_NUMBER() OVER (
                   PARTITION BY {query_col}
                   ORDER BY distance, {freq_col} DESC, {term_col}
               ) AS rn
        FROM ver
    )
    SELECT {query_col}, {term_col}, CAST(distance AS INT) AS distance, {freq_col}
    FROM ranked WHERE rn = 1
    """
