"""BM25 lexical retrieval + reciprocal-rank fusion (hybrid search).

The retrieval half of a corpus pipeline: score documents against a term
query with BM25 (Robertson/Spärck Jones probabilistic ranking — the
default lexical ranker in Lucene/Elasticsearch, the reference's storage
backend), and fuse a lexical ranking with an embedding (ANN) ranking via
reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) — the
standard hybrid-retrieval shape for dedup triage and eval-set mining.

Engine-exact arithmetic (the repo-wide rank-key discipline): BM25's
floats are replaced by integers wherever ordering depends on them.

- idf uses the Lucene always-positive form ``ln(1 + (N-df+0.5)/(df+0.5))
  = ln((2N+2)/(2df+1))`` quantized to micro-nats:
  ``idf_micro = floor(1e6 * ln((2N+2)/(2df+1)))`` — one double division
  of exact BIGINTs then one ``ln`` (the ``operators/lm.py`` precedent).
- the tf saturation term with the standard constants k1 = 1.2, b = 0.75
  clears to an integer rational: with T = total corpus tokens, N = docs,
  dl = this doc's tokens,

      tf*(k1+1) / (tf + k1*(1 - b + b*dl/(T/N)))
    = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)           (multiply by 10*T)

  so the per-(doc, term) score is the pure-BIGINT
  ``(idf_micro * 22 * T * tf) div (10*T*tf + 3*T + 9*dl*N)`` — every
  factor nonnegative, so truncating division is unambiguous and both
  engines (Spark ``div``, DuckDB ``//``) agree bit-for-bit.

Overflow bound: the widest product ``idf_micro * 22 * T * tf`` needs
``T * tf < ~4e11`` at idf ~ 2e7 — far past gate scale but NOT past a
trillion-token corpus; at that scale rank on the float ``bm25`` column
(association-order-free: a per-row product, summed over the |q| query
terms only) and keep the integer key as the small-scale conformance form.

Scale shape: doc length is a per-row array-size expression (no explode,
no dl shuffle — it rides through the tf groupBy as a functionally-
dependent grouping column, so no corpus-wide join is ever paid); the
exploded postings are restricted to the QUERY'S terms before the only
wide operation (|q| terms x the docs containing them flow into the
groupBy, never the corpus vocabulary); corpus stats (N, T) are a one-row
aggregate broadcast back via crossJoin (never collected); per-term df is
an aggregate of the already-restricted tf table; top-k is
``orderBy().limit(k)`` = TakeOrderedAndProject (per-partition heap + k-row
driver merge, no global sort).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokens_expr(text_col):
    """Lowercase whitespace token array with EMPTY TOKENS DROPPED — the
    ONE token recipe shared by BM25 (this module) and PMI collocations
    (operators/textmine.py), so the documented count compatibility
    between the two cannot drift.  NOT identical to
    textstats.token_count_ws, which counts split artifacts from
    leading/multiple whitespace; term statistics must count real terms."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != "")


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, toks array<string>, dl) — ``tokens_expr`` tokenization.
    ``dl`` is a per-row array-size expression — no explode, no shuffle.
    Docs with zero tokens (empty/NULL text) are excluded: they can never
    match and must not enter N or avgdl."""
    toks = tokens_expr(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.size(toks).cast("long").alias("dl"),
    ).filter(F.col("dl") > 0)


def _term_scores(tf: DataFrame, stats: DataFrame) -> DataFrame:
    """Per-(doc, term) engine-exact BM25 partial score — the single copy
    of the integer rank-key arithmetic (module docstring) shared by
    ``bm25_scores`` and ``bm25_join``.

    ``tf``: exactly ONE row per (doc_id, term) carrying (doc_id, dl,
    term, tf) — per-term document frequency is therefore a plain count
    (no distinct pass).  ``stats``: the one-row (n_docs, total_tokens)
    corpus aggregate, broadcast back via crossJoin.
    """
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_micro",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (F.lit(2) * F.col("n_docs") + F.lit(2)).cast("double")
                    / (F.lit(2) * F.col("df") + F.lit(1)).cast("double")
                )
            ),
        )
        .withColumn(
            "score_micro",
            F.expr(
                "(idf_micro * 22 * total_tokens * tf)"
                " div (10*total_tokens*tf + 3*total_tokens + 9*dl*n_docs)"
            ),
        )
    )


def _sum_scores(scored: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold per-(doc, term) partial scores into the output rows:
    (*group_cols, score_micro BIGINT, matched_terms BIGINT, bm25 DOUBLE
    4dp).  BIGINT sum — associative, engine-exact."""
    return scored.groupBy(*group_cols).agg(
        F.sum("score_micro").cast("long").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
        F.round(F.sum(F.col("score_micro")) / 1000000.0, 4).alias("bm25"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score for one term query.

    Returns (doc_id, score_micro BIGINT, matched_terms BIGINT, bm25
    DOUBLE rounded 4dp) for every document matching >= 1 query term.
    ``score_micro`` is the engine-exact rank key (module docstring);
    ``bm25`` is the same quantity in natural units for consumers.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # matching is case-insensitive, so dedup on the lowered forms (a
    # duplicate term cannot double-count — tf groups on the data-side
    # term — so folding silently is both safe and the useful behavior)
    terms = sorted({t.lower() for t in query_terms})

    base = _tokenized(df, id_col, text_col)
    # one-row corpus stats from the per-row dl column (broadcast back,
    # never collected); the corpus is scanned ONCE — dl rides along as a
    # grouping column (functionally dependent on doc_id, zero extra cost)
    # so no corpus-wide dl join is ever paid
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return _sum_scores(_term_scores(tf, stats), ["doc_id"])


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25, with a 1-based ``rank`` column.

    Total order (score_micro desc, doc_id asc); ``orderBy().limit(k)``
    compiles to TakeOrderedAndProject, and the rank window runs over the
    <= k surviving rows only (bounded by construction, not a corpus-wide
    unpartitioned window).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    top = (
        bm25_scores(df, query_terms, id_col, text_col)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def bm25_join(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Batch BM25: top-k documents for EVERY query in one job — the
    lexical twin of ``similarity.knn_join`` (a per-query ``bm25_topk``
    loop is |Q| corpus scans; mining pipelines run thousands of queries).

    ``queries``: (query_id, terms array<string>) — a broadcast-scale
    table (the query set, not the corpus).  Scoring is identical to
    ``bm25_scores`` (same integer rank key, module docstring); per-term
    document frequency is computed ONCE from the distinct (doc, term)
    postings even when queries share terms.

    Output: (query_id, doc_id, score_micro, matched_terms, bm25, rank)
    with rank 1..k per query (score desc, doc_id asc).

    Scale shape: the corpus explodes once and immediately semi-restricts
    against the broadcast DISTINCT term universe (union of all queries'
    terms); tf and the per-(doc, term) scores are aggregated ONCE,
    query-independently — the per-query fan-out (broadcast join onto
    qterms) happens only AFTER the heavy groupBy, so a term shared by a
    thousand queries costs one shuffle of its postings, not a thousand.
    The per-query top-k cut is the shared skew-proof ``two_phase_top_n``
    — a hot query matching half the corpus never sorts on one task.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from .partition import two_phase_top_n

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.col(terms_col)).alias("term"),
    ).select("query_id", F.lower(F.col("term")).alias("term")).distinct()

    base = _tokenized(df, id_col, text_col)
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    # corpus postings restricted to the DISTINCT term universe; tf and
    # the per-(doc, term) scores are query-independent, so aggregate and
    # score ONCE and fan out per query only afterwards (broadcast join
    # onto the small scored-postings-per-query-term set)
    universe = qterms.select("term").distinct()
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(universe), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    scored = _sum_scores(
        _term_scores(tf, stats).join(F.broadcast(qterms), "term"),
        ["query_id", "doc_id"],
    )
    top = two_phase_top_n(
        scored,
        ["query_id"],
        [F.col("score_micro").desc(), F.col("doc_id").asc()],
        k,
        rank_col="rank",
    )
    return top.select(
        "query_id", "doc_id", "score_micro", "matched_terms", "bm25",
        F.col("rank").cast("int").alias("rank"),
    )


def phrase_match(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-adjacent phrase search: docs where the query terms
    occur consecutively (``tokens_expr`` tokenization, so BM25 and phrase
    constraints agree on what a term is).

    Returns (id_col, n_occurrences BIGINT, first_pos INT 1-based) for
    matching docs only — the positional-postings AND every search engine
    layers over its inverted index, re-expressed as per-row array
    expressions: candidate start offsets x a k-way conjunction of
    ``get(toks, i+j)`` lookups.  Embarrassingly parallel — NO explode,
    NO join, NO shuffle; the corpus is scanned once and the filter runs
    inside whole-stage codegen.  (An inverted-index route pays a
    per-term explode + k-way self-join; for one phrase over a corpus the
    scan-fused form is strictly cheaper and never skews.)
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    k = len(terms)
    toks = tokens_expr(text_col)
    base = df.select(F.col(id_col), toks.alias("_toks"))
    # 0-based candidate starts; Spark's sequence(a, b) DESCENDS when
    # a > b, so the too-short case must be an explicit empty array
    starts = F.when(
        F.size("_toks") >= k,
        F.sequence(F.lit(0), F.size("_toks") - F.lit(k)),
    ).otherwise(F.array().cast("array<int>"))

    def _is_hit(i):
        conds = [
            F.get(F.col("_toks"), i + F.lit(j)) == F.lit(t)
            for j, t in enumerate(terms)
        ]
        return reduce(lambda a, b: a & b, conds)

    hits = F.filter(starts, _is_hit)
    return (
        base.select(
            id_col,
            F.size(hits).cast("long").alias("n_occurrences"),
            (F.element_at(hits, 1) + 1).cast("int").alias("first_pos"),
        )
        .where(F.col("n_occurrences") > 0)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of >= 2 rank lists (SIGIR 2009).

    Each input carries (id_col, rank_col 1-based).  Fused score is the
    integer ``sum over lists of 1_000_000 div (k + rank)`` (``rrf_ppm``)
    — exact in both engines, no float association order.  An item absent
    from a list contributes nothing (the union-groupBy form of a full
    outer join).  Output: (id, rrf_ppm BIGINT, n_lists BIGINT), plus
    ``fused_rank`` over (rrf_ppm desc, id asc).

    Rank lists are top-k products (tiny by construction), so the fused
    window is bounded by ``sum of list lengths`` — document-scale inputs
    should be cut to top-k BEFORE fusion.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs >= 2 rank lists")
    if k < 1:
        raise ValueError("k must be >= 1")
    tagged = [
        r.select(F.col(id_col).alias("_id"), F.col(rank_col).cast("long").alias("_rk"))
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    fused = unioned.groupBy(F.col("_id").alias(id_col)).agg(
        F.sum(F.expr(f"1000000 div ({k} + _rk)")).cast("long").alias("rrf_ppm"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.orderBy(F.col("rrf_ppm").desc(), F.col(id_col))
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Materialize the inverted index: (term, df, postings) where
    ``postings`` is the sorted doc-id list DELTA-ENCODED and comma-joined
    (``5,3,14`` = docs 5, 8, 22) — the storage form real indexes use,
    since gaps compress and reconstruct with one prefix sum.

    ``max_df`` drops terms appearing in more documents (stopword cap) —
    this is also the scale guard: a posting list is assembled per term
    with collect_list, so an uncapped hot term ("the") would build a list
    the size of the corpus on one task.  With the cap, df counts are
    aggregated FIRST (partial-combined, skew-safe) and only surviving
    terms reach the list-building pass via a semi-join, so no oversized
    list is ever materialized.  Without a cap (small/gated corpora) it is
    a single groupBy.

    Doc ids must be non-negative (delta decoding starts the prefix sum at
    0; ids are table keys in practice).
    """
    tok = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens_expr(text_col)).alias("term"),
        )
        .distinct()
    )
    if max_df is not None:
        keep = (
            tok.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("term")
        )
        tok = tok.join(keep, ["term"], "left_semi")
    lists = tok.groupBy("term").agg(
        F.sort_array(F.collect_list("doc_id")).alias("_ids")
    )
    # if() guards the i=0 branch so ANSI mode never sees index -1
    postings = F.expr(
        "array_join(transform(_ids, (x, i) ->"
        " cast(x - if(i = 0, 0L, _ids[i-1]) as string)), ',')"
    )
    return lists.select(
        "term",
        F.size("_ids").cast("long").alias("df"),
        postings.alias("postings"),
    )


def ql_scores(
    df: DataFrame,
    query_terms: list[str],
    mu: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood scores (Zhai & Lafferty,
    SIGIR 2001) — the language-modeling ranker beside BM25, the second
    of Lucene's two classic similarities.

        score(d) = sum over query terms t of
                   ln( (tf + mu * cf_t / T) / (dl + mu) )

    with cf_t = corpus frequency of t and T = total corpus tokens.
    Decomposed so only MATCHED (doc, term) pairs pay a join (the
    standard trick; the unmatched background folds into per-doc and
    per-query constants):

        score(d) = sum over matched t of ln((tf*T + mu*cf_t)/(mu*cf_t))
                 + sum over t in q of ln(mu * cf_t / T)     [K, constant]
                 - |q| * ln(dl + mu)

    Engine-exact form (module docstring discipline): each ln is
    evaluated once on a ratio of exact BIGINTs and quantized to
    micro-nats with floor; the three parts combine with BIGINT
    arithmetic, so ``score_micro`` is bit-identical across engines.
    Query terms absent from the corpus (cf = 0) are dropped (their
    smoothed probability is 0 for every document — they cannot rank).
    Only documents matching >= 1 surviving term are emitted.

    Scale shape: identical to ``bm25_scores`` — postings restricted to
    the query's terms before the one wide groupBy; cf/K are a |q|-row
    aggregate broadcast back; dl rides as a grouping column.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if mu < 1:
        raise ValueError("mu must be >= 1")
    terms = sorted({t.lower() for t in query_terms})

    base = _tokenized(df, id_col, text_col)
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    # per-term corpus frequency over the restricted postings (= cf, the
    # restriction only removes other terms), one row per surviving term
    cf = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("cf"))
    # K_micro + |q_eff| : a one-row broadcast (terms with cf=0 never
    # appear in tf, so they are dropped here by construction)
    qconst = (
        cf.crossJoin(F.broadcast(stats))
        .agg(
            F.sum(
                F.floor(
                    F.lit(1000000.0)
                    * F.log(
                        (F.lit(mu) * F.col("cf")).cast("double")
                        / F.col("total_tokens").cast("double")
                    )
                )
            ).cast("long").alias("k_micro"),
            F.count(F.lit(1)).cast("long").alias("q_eff"),
        )
    )
    match_micro = F.floor(
        F.lit(1000000.0)
        * F.log(
            (F.col("tf") * F.col("total_tokens") + F.lit(mu) * F.col("cf"))
            .cast("double")
            / (F.lit(mu) * F.col("cf")).cast("double")
        )
    ).cast("long")
    per_doc = (
        tf.join(F.broadcast(cf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_m", match_micro)
        .groupBy("doc_id", "dl")
        .agg(
            F.sum("_m").cast("long").alias("match_micro"),
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
        )
    )
    dl_micro = F.floor(
        F.lit(1000000.0) * F.log((F.col("dl") + F.lit(mu)).cast("double"))
    ).cast("long")
    return (
        per_doc.crossJoin(F.broadcast(qconst))
        .withColumn(
            "score_micro",
            F.col("match_micro") + F.col("k_micro") - F.col("q_eff") * dl_micro,
        )
        .select(
            "doc_id",
            "score_micro",
            "matched_terms",
            F.round(F.col("score_micro") / 1000000.0, 4).alias("ql"),
        )
    )


def ql_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    mu: int = 2000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by Dirichlet query likelihood, 1-based ``rank``.

    Total order (score_micro desc, doc_id asc); TakeOrderedAndProject
    then a window over the <= k survivors (same shape as ``bm25_topk``).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    top = (
        ql_scores(df, query_terms, mu, id_col, text_col)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
