"""Log template mining + TF-IDF term scoring over text columns.

- ``log_template`` / ``log_template_counts``: Drain-lite template
  extraction — variable tokens (ISO timestamps, UUIDs, IPs, hex ids,
  numbers) mask to typed placeholders, collapsing a log stream's millions
  of distinct lines into its handful of structural templates.  The
  anomaly-surface every log-analytics backend builds first; a pure
  regexp_replace chain in the Java∩RE2 subset (scan-fused, counts are
  one partial-aggregated groupBy on low-cardinality templates).
- ``pmi_collocations``: corpus-level bigram collocation mining by
  pointwise mutual information — the vocabulary-induction companion
  (multi-word expressions: "new york", "stack trace") and a cheap
  corpus-quality probe (a boilerplate-heavy crawl shows pathological
  PMI mass in template phrases).  PMI is quantized to integer
  micro-nats from one double ratio of exact BIGINT counts (the lm.py /
  retrieval.py discipline) so rankings are engine-exact; the BIGINT
  sub-products bound the exact form at ~3e9 corpus tokens — past that,
  rank on the float ``pmi`` column (per-row transcendental, no
  association order).
- ``tfidf_top_terms``: per-document top-N terms by tf-idf.  Document
  frequency is one token-level aggregate; ranking uses an INTEGER
  surrogate key (tf * 1_000_000 // (df + 1)) so the order is bit-exact
  across engines (ranking on a float tf*ln(N/df) score invites
  last-ulp tie flips between libm implementations); the float tf-idf is
  still emitted, rounded, for consumers.  Top-N per doc goes through the
  shared skew-proof ``two_phase_top_n``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# ordered masking rules (first match wins where patterns overlap: UUID
# before hex, ISO timestamp before bare numbers).  Java∩RE2 subset.
MASK_RULES: list[tuple[str, str]] = [
    (r"[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?Z?", "<TS>"),
    (
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<UUID>",
    ),
    # word-bounded so a 4+-digit trailing octet ("10.0.1.1234") masks
    # uniformly as <NUM> runs instead of fragmenting into <IP><NUM>; a
    # dotted version string ("1.2.3.4.5") still IP-masks its first four
    # components — inherent to regex-only masking, documented trade
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"0x[0-9a-fA-F]+|\b[0-9a-fA-F]{16,}\b", "<HEX>"),
    (r"\b[0-9]+(\.[0-9]+)?\b", "<NUM>"),
]


def log_template(text: Column) -> Column:
    out = text
    for pattern, token in MASK_RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def log_template_counts(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(template, n_lines) — the structural fingerprint of a log stream."""
    return (
        df.select(log_template(F.col(text_col)).alias("template"))
        .groupBy("template")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )


def template_novelty(
    df: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    period: str = "day",
) -> DataFrame:
    """Per-period template population and novelty: ``(period, n_lines,
    n_templates, n_new_templates)``.

    The operational question behind template mining is not "what templates
    exist" but "what STARTED appearing" — a new template in today's logs is
    a deploy, a new failure mode, or an injection attempt.  Each line masks
    to its structural template (``log_template``), periods come from
    ``date_trunc``; a template is *new* in the period of its first
    occurrence (earlier periods are the history — the first period
    trivially reports all templates as new).

    Scale shape: one groupBy on (template, period) collapses the corpus to
    the tiny template-period table; min-period per template and the final
    per-period rollup run on that table (second shuffle, rows = distinct
    templates x periods).  Corpus rows are touched exactly once.
    """
    tp = (
        df.select(
            F.date_trunc(period, F.col(ts_col)).alias("period"),
            log_template(F.col(text_col)).alias("template"),
        )
        .groupBy("template", "period")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    )
    first = Window.partitionBy("template")
    flagged = tp.withColumn("_first", F.min("period").over(first))
    return (
        flagged.groupBy("period")
        .agg(
            F.sum("n_lines").cast("long").alias("n_lines"),
            F.count(F.lit(1)).cast("long").alias("n_templates"),
            F.sum((F.col("period") == F.col("_first")).cast("long")).alias(
                "n_new_templates"
            ),
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
) -> DataFrame:
    """Top-N terms per doc: (id, term, tf, df, tfidf, term_rank).

    tfidf = tf * (ln((n_docs + 1) / (df + 1)) + 1) — the smoothed idf —
    rounded to 4; the RANKING key is the integer surrogate
    tf * 1_000_000 // (df + 1), ties to the lexicographically smaller
    term, so results are engine-exact."""
    from .partition import two_phase_top_n

    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    docfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_rank_key", F.floor(F.col("tf") * 1_000_000 / (F.col("df") + 1))
        )
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("_n") + 1) / (F.col("df") + 1)) + 1),
                4,
            ),
        )
    )
    top = two_phase_top_n(
        scored,
        [id_col],
        [F.col("_rank_key").desc(), F.col("term").asc()],
        top_n,
        rank_col="term_rank",
    )
    return top.select(id_col, "term", "tf", "df", "tfidf", "term_rank")


def pmi_collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus bigram collocations scored by pointwise mutual information.

    Returns (x, y, c_xy, c_x, c_y, pmi_micro BIGINT, pmi DOUBLE 6dp) for
    every adjacent lowercase-token bigram occurring >= ``min_count``
    times.  With N total tokens and B total bigrams,

        PMI = ln( p(x,y) / (p(x) p(y)) )
            = ln( (c_xy * N * N) / (B * c_x * c_y) )

    computed as ``floor(1e6 * ln(...))`` over ONE left-to-right double
    chain of exact BIGINT sub-products (``c_xy*N``, ``B*c_x`` stay in
    BIGINT — exact while the corpus is under ~3e9 tokens; module
    docstring) so both engines agree bit-for-bit.

    Scale shape: one explode for unigram counts, one transform+explode
    for bigram counts (each a partial-aggregated groupBy on the
    vocabulary, never the corpus); (N, B) is a one-row aggregate
    broadcast back; the ``min_count`` filter prunes the bigram table
    BEFORE the two vocabulary joins, so the join input is the collocation
    candidates, not the full bigram universe.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    from .retrieval import tokens_expr

    base = df.select(F.col(id_col).alias("_id"), tokens_expr(text_col).alias("toks"))
    uni = base.select(F.explode("toks").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    big = (
        base.select(
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
                    " (t, i) -> struct(t AS x, toks[i + 1] AS y))"
                )
            ).alias("bg")
        )
        .select(F.col("bg.x").alias("x"), F.col("bg.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .where(F.col("c_xy") >= F.lit(min_count))
    )
    stats = base.select(
        F.sum(F.size("toks")).cast("long").alias("n_tokens"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0)))
        .cast("long")
        .alias("n_bigrams"),
    )
    scored = (
        big.join(uni.withColumnRenamed("term", "x").withColumnRenamed("c", "c_x"), "x")
        .join(uni.withColumnRenamed("term", "y").withColumnRenamed("c", "c_y"), "y")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "pmi_micro",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    F.expr(
                        "CAST(c_xy * n_tokens AS DOUBLE)"
                        " * CAST(n_tokens AS DOUBLE)"
                        " / CAST(n_bigrams * c_x AS DOUBLE)"
                        " / CAST(c_y AS DOUBLE)"
                    )
                )
            ),
        )
        .withColumn("pmi", F.round(F.col("pmi_micro") / 1000000.0, 6))
    )
    return scored.select("x", "y", "c_xy", "c_x", "c_y", "pmi_micro", "pmi")


def keyword_topic_counts(
    df: DataFrame,
    topics: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dictionary-based topic tagging: (id, topic, n_matches) per document
    and matching topic.

    ``topics`` maps a topic name to its keyword list; each topic compiles
    to ONE word-bounded alternation regex evaluated with ``regexp_count``
    — a single scan-fused projection pass over the corpus, no explode, no
    token join, no Python.  This is the classifier-free taxonomy tagger
    every corpus pipeline starts with (CC domain buckets, quality tiers,
    safety keyword screens); emits only topics that matched so the output
    stays sparse at web scale.

    Keywords are matched case-insensitively as whole words; regex
    metacharacters in keywords are escaped (they are phrases, not
    patterns).  A ``\\b`` word boundary is only anchored against keyword
    edges that are word characters — ``c++`` ends at a non-word char, where
    ``\\b`` can never match, so that side uses a lookaround against word
    characters instead.
    """
    if not topics:
        raise ValueError("topics must be a non-empty {name: [keywords]} dict")
    import re as _re

    def bounded(k: str) -> str:
        lead = r"\b" if _re.match(r"\w", k) else r"(?<!\w)"
        trail = r"\b" if _re.search(r"\w$", k) else r"(?!\w)"
        return lead + _re.escape(k) + trail

    text = F.lower(F.col(text_col))
    counts = []
    for name in sorted(topics):
        kws = topics[name]
        if not kws:
            raise ValueError(f"topic {name!r} has no keywords")
        alt = "|".join(bounded(k.lower()) for k in sorted(kws))
        pat = F.lit(f"({alt})")
        counts.append(
            F.struct(
                F.lit(name).alias("topic"),
                F.regexp_count(text, pat).cast("long").alias("n_matches"),
            )
        )
    exploded = df.select(
        F.col(id_col), F.explode(F.array(*counts)).alias("tc")
    ).select(id_col, "tc.topic", "tc.n_matches")
    return exploded.where(F.col("n_matches") > 0)


def assign_topics(
    df: DataFrame,
    topics: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per document: the argmax topic (ties → lexicographically
    first topic name, deterministic) plus its match count; documents with
    no matches get topic NULL and n_matches 0 — kept, so the output is a
    total labeling the downstream mixture sampler can join on."""
    counts = keyword_topic_counts(df, topics, text_col=text_col, id_col=id_col)
    best = counts.groupBy(id_col).agg(
        # min over (-count, name): highest count first, lexicographically
        # first topic name on ties — one deterministic struct ordering
        F.min_by(
            F.col("topic"),
            F.struct((-F.col("n_matches")).alias("negn"), F.col("topic")),
        ).alias("topic"),
        F.max("n_matches").alias("n_matches"),
    )
    ids = df.select(F.col(id_col)).distinct()
    return (
        ids.join(best, id_col, "left")
        .withColumn("n_matches", F.coalesce("n_matches", F.lit(0)).cast("long"))
    )


def _milli_ols(pts: DataFrame, n_alias: str, slope_alias: str) -> DataFrame:
    """Shared exact-integer OLS over milli-nat (x, y) points — the single
    copy of the moment/slope/intercept arithmetic behind ``zipf_fit`` and
    ``heaps_fit`` (the two gates' cross-engine contracts must stay
    bit-identical, so there is exactly one implementation).  Emits the
    four BIGINT moments, the BIGINT slope fraction, and the derived
    doubles; empty below 2 points or on a zero denominator."""
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias(n_alias),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).where(F.col(n_alias) >= 2)
    n = F.col(n_alias)
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n * F.col("sxx") - F.col("sx") * F.col("sx")
    return mom.select(
        n_alias,
        "sx",
        "sy",
        "sxy",
        "sxx",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.round(num / den.cast("double"), 6).alias(slope_alias),
        F.round(
            (F.col("sy") / n - num / den.cast("double") * (F.col("sx") / n))
            / 1000.0,
            4,
        ).alias("intercept_ln"),
    ).where(F.col("slope_den") > 0)


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    max_rank: int = 10_000,
    min_rank: int = 1,
) -> DataFrame:
    """Zipf's-law slope of the corpus vocabulary — the one-number
    language-health diagnostic: natural text sits near slope -1 on the
    log-log rank-frequency line; machine-generated spam, template
    farms, and boilerplate-heavy crawls bend it (flatter head = vocab
    too uniform; steeper = a few tokens dominating).  Tracked per crawl
    snapshot it is an early-warning gauge the per-document quality
    features cannot give (they never see the corpus distribution).

    Fit: OLS of y = ln(term frequency) on x = ln(rank) over ranks
    [min_rank, max_rank] (capping at the head is standard practice —
    the hapax tail always departs from the power law and would drown
    the fit; 10k ranks also keeps every moment in BIGINT).  Logs are
    floored at MILLI precision (x_i = floor(1000*ln i), y_i likewise),
    then the four moments sum exactly:

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)

    Both numerator and denominator are emitted as BIGINTs; slope and
    the intercept (in ln-frequency units) are derived doubles.  Ranks
    order by (frequency desc, token asc) — total and engine-exact.
    Milli flooring bounds the slope error ~1e-3, far inside the
    +/-0.1 band any health check would use.  Overflow: the binding
    products are Sx*Sy and n*Sxy ~ R^2 * (ln R * 1e3) * (ln F * 1e3);
    at R = 1e5 they stay under 9.2e18 for term frequencies to ~1e12
    (any real crawl), so the guard caps max_rank at 1e5.

    Output: ONE row (n_ranks, sx, sy, sxy, sxx BIGINT, slope_num,
    slope_den BIGINT, slope DOUBLE 6dp, intercept_ln DOUBLE 4dp).
    Empty corpora yield an empty frame.

    Scale shape: one tokenize + one partial-aggregated groupBy(term)
    over the corpus; the rank cut is the shared skew-proof top-N shape
    (a TakeOrderedAndProject of max_rank rows), and the fit aggregates
    those max_rank rows — never corpus rows — in one tiny pass.
    """
    if not 1 <= min_rank <= max_rank:
        raise ValueError(f"need 1 <= min_rank <= max_rank, got {min_rank}..{max_rank}")
    if max_rank > 100_000:
        raise ValueError("max_rank > 1e5 would overflow the BIGINT moments")
    freqs = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    head = freqs.orderBy(F.col("tf").desc(), F.col("term").asc()).limit(max_rank)
    ranked = head.select(
        F.row_number()
        .over(
            Window.partitionBy(F.lit(1)).orderBy(
                F.col("tf").desc(), F.col("term").asc()
            )
        )
        .cast("long")
        .alias("rank"),
        "tf",
    ).where(F.col("rank") >= min_rank)
    pts = ranked.select(
        F.floor(F.lit(1000.0) * F.log(F.col("rank").cast("double"))).alias("x"),
        F.floor(F.lit(1000.0) * F.log(F.col("tf").cast("double"))).alias("y"),
    )
    return _milli_ols(pts, "n_ranks", "slope")


def heaps_fit(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law exponent across corpus slices — vocabulary growth
    V(N) ~ K * N^beta, the companion gauge to ``zipf_fit``: natural
    text grows vocabulary at beta ~ 0.4-0.6 as tokens accumulate;
    template farms and boilerplate mills flatten beta toward 0 (same
    words forever), random-ish junk pushes it toward 1 (every token
    new).  Each GROUP (source, crawl snapshot, domain bucket) is one
    point (x = ln total tokens, y = ln distinct tokens); the fit is the
    same milli-nat exact-integer OLS as zipf_fit.

    Groups with zero tokens are excluded; needs >= 2 groups with
    distinct x to fit (empty frame otherwise — same contract as
    zipf_fit).  Output: ONE row (n_groups, sx, sy, sxy, sxx BIGINT,
    slope_num, slope_den BIGINT, beta DOUBLE 6dp, intercept_ln
    DOUBLE 4dp).

    Scale shape: one tokenize pass, one groupBy(group, term) for
    distincts, one groupBy(group) — the fit aggregates |groups| rows.
    Overflow: sx terms are ln(N)*1e3 <= ~5e4 per group; safe to ~1e9
    groups, far beyond any slicing.
    """
    toks = (
        df.select(
            F.col(group_col).alias("_g"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    per_term = toks.groupBy("_g", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    per_group = per_term.groupBy("_g").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
    )
    pts = per_group.where(F.col("n_tokens") > 0).select(
        F.floor(F.lit(1000.0) * F.log(F.col("n_tokens").cast("double"))).alias("x"),
        F.floor(F.lit(1000.0) * F.log(F.col("n_vocab").cast("double"))).alias("y"),
    )
    return _milli_ols(pts, "n_groups", "beta")


def segment_language_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\.",
) -> DataFrame:
    """Per-SEGMENT language profile of each document — the CCNet-style
    upgrade over whole-document lang-ID (``functions/textstats.py::
    lang_id``): web pages are routinely mixed-language (boilerplate in
    one language, content in another), and corpus filters want "is the
    DOMINANT language X and how contested is it", not a single global
    vote.

    Split on ``sep`` (regex; default sentence-ish '.'), drop empty
    segments, run the same shared lang-ID heuristic per segment, then
    per document: (n_segments, n_langs, dominant_lang, dominant_ppm)
    with the dominant picked by (count DESC, lang ASC) — a total order,
    engine-exact; dominant_ppm is the positive truncating division.

    Scale shape: one explode bounded by segments-per-doc, one
    (doc, lang) partial aggregate, one window over the per-doc lang
    table (bounded by |langs| = 6 rows per doc)."""
    from pyspark.sql.window import Window

    from ..functions.textstats import lang_id

    segs = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), sep)).alias("_seg"),
    ).select(id_col, F.trim(F.col("_seg")).alias("_seg"))
    segs = segs.where(F.col("_seg") != "")
    counts = segs.select(id_col, lang_id(F.col("_seg")).alias("lang")).groupBy(
        id_col, "lang"
    ).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(id_col).orderBy(F.col("_n").desc(), F.col("lang"))
    ranked = counts.withColumn("_rk", F.row_number().over(w))
    totals = counts.groupBy(id_col).agg(
        F.sum("_n").cast("long").alias("n_segments"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    dom = ranked.where(F.col("_rk") == 1).select(
        id_col,
        F.col("lang").alias("dominant_lang"),
        F.col("_n").alias("_dn"),
    )
    return totals.join(dom, id_col).select(
        id_col,
        "n_segments",
        "n_langs",
        "dominant_lang",
        F.expr("(_dn * 1000000) div n_segments").cast("long").alias(
            "dominant_ppm"
        ),
    )
