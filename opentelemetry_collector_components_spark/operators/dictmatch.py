"""Dictionary phrase matching as a token n-gram JOIN — the 100k-phrase path.

``blocklist.blocklist_matches`` compiles each category into one regex
alternation: perfect for tens-to-hundreds of phrases, but the pattern
(and the per-row scan cost) grows with dictionary SIZE, and past a few
thousand phrases the regex is the bottleneck.  This operator is the
scale regime's answer: phrase matching over a canonical token stream is
n-gram EQUALITY, and equality against a big set is a JOIN, which Spark
already knows how to do at any dictionary size (broadcast when the
dictionary fits, shuffle hash join on the gram key when it doesn't —
an Aho-Corasick automaton in Python would fight the engine instead).

Canonical-token semantics (differs deliberately from the regex
operator's raw-text word boundaries): text is lowercased and split on
non-alphanumeric runs; a phrase hits wherever its token sequence
appears in the document's token sequence.  So ``"foo bar"`` matches
``"Foo-Bar!"`` — dictionary matching for hygiene filters wants
punctuation-robustness; keep ``blocklist_matches`` when exact surface
boundaries matter.  Occurrences are counted at EVERY token offset —
a periodic phrase (``"a b a"`` over ``"a b a b a"``) counts both
overlapping offsets; that is the natural join semantics and the
oracle replays it positionally rather than by sequential deletion.

Scale shape: one scan pass builds the token array; one ``transform``
per distinct phrase LENGTH (a handful — lengths, not phrases) emits
the gram arrays; one explode; one join against the (category, phrase)
table — broadcast for small dictionaries, shuffle on the gram key for
huge ones where AQE handles hot grams; one partial-aggregated count.
No UDF anywhere; the dictionary never touches a regex engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(col: Column) -> Column:
    """Canonical token array: lowercase, split on non-alphanumeric runs,
    empties (leading/trailing separators) removed."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def normalize_phrase(phrase: str) -> str:
    """A phrase's canonical form: its own token stream joined by single
    spaces — the join key grams are built to equal."""
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not toks:
        raise ValueError(f"phrase {phrase!r} has no tokens")
    return " ".join(toks)


def phrase_table(
    spark: SparkSession, categories: dict[str, list[str]]
) -> DataFrame:
    """(category, phrase, n_tokens) rows from a literal dict — the
    small-dictionary convenience constructor; big dictionaries arrive
    as DataFrames from their own source table."""
    rows = []
    for cat, phrases in categories.items():
        if not phrases:
            raise ValueError(f"category {cat!r} has no phrases")
        for p in phrases:
            norm = normalize_phrase(p)
            rows.append((cat, norm, norm.count(" ") + 1))
    return spark.createDataFrame(
        rows, "category string, phrase string, n_tokens int"
    ).distinct()


def dictionary_phrase_match(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrases: DataFrame,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Count phrase occurrences: (``id_col``, category, phrase, n_hits),
    rows only for phrases that hit.

    ``phrases`` must carry (category, phrase, n_tokens) with phrase
    already in canonical form (``phrase_table`` / ``normalize_phrase``).
    ``broadcast_dict=False`` switches to a shuffle join on the gram key
    — the >100k-phrase regime where the dictionary no longer ships to
    every executor.
    """
    lengths = [
        r["n_tokens"]
        for r in phrases.select("n_tokens").distinct().collect()
    ]
    if not lengths:
        raise ValueError("empty phrase table")

    toks = tokenize(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_toks"))

    def grams_of(n: int) -> Column:
        # offsets 0..size-n; slice is 1-based. Guard short docs: an
        # unguarded sequence(0, size-n) would run DESCENDING when
        # size < n and fabricate negative offsets.
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - n),
                lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # ONE projection emits every length's grams (a union of per-length
    # selects would re-scan and re-tokenize the corpus once per length)
    all_grams = F.flatten(F.array(*[grams_of(n) for n in sorted(lengths)]))
    grams = base.select(id_col, F.explode(all_grams).alias("gram"))

    dict_side = phrases.select("category", "phrase")
    if broadcast_dict:
        dict_side = F.broadcast(dict_side)
    return (
        grams.join(dict_side, grams["gram"] == dict_side["phrase"], "inner")
        .groupBy(id_col, "category", "phrase")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def phrase_match_oracle_sql(
    docs_sql: str,
    id_col: str,
    text_col: str,
    categories: dict[str, list[str]],
) -> str:
    """DuckDB replay via the wrapped-token-string trick: the canonical
    token stream rendered as ``|t1||t2||...|`` (tokens are [a-z0-9]+ so
    ``|`` cannot occur inside one); a phrase rendered the same way
    matches the wrapped string exactly at the char positions that are
    whole-token offsets, so counting ALL positions where the substring
    equals the wrapped phrase counts exactly the token offsets the
    n-gram join counts — including overlapping occurrences of periodic
    phrases, which a sequential ``replace`` count would miss."""
    selects = []
    for cat, phrases in categories.items():
        seen: set[str] = set()
        for p in phrases:
            norm = normalize_phrase(p)
            if norm in seen:
                # phrase_table() dedups normalized forms; mirror it here
                # or duplicate raw spellings emit phantom double rows
                continue
            seen.add(norm)
            wrapped = "|" + norm.replace(" ", "||") + "|"
            lit = wrapped.replace("'", "''")
            L = len(wrapped)
            selects.append(
                f"SELECT {id_col}, '{cat}' AS category, "
                f"'{norm}' AS phrase, "
                f"CAST(len(list_filter("
                f"range(1, greatest(length(w) - {L} + 2, 1)), "
                f"pos -> substr(w, pos, {L}) = '{lit}')) AS BIGINT) "
                f"AS n_hits FROM t"
            )
    unions = " UNION ALL ".join(selects)
    return f"""
    WITH t AS (
        SELECT {id_col},
               '|' || array_to_string(
                   regexp_extract_all(lower({text_col}), '[a-z0-9]+'),
                   '||') || '|' AS w
        FROM ({docs_sql}) src
    )
    SELECT * FROM ({unions}) hits WHERE n_hits > 0
    """
