"""Text analysis functions for large-scale training-data pipelines.

Not part of the reference's surface — these are the document-quality /
language-ID / tokenization operators a 100 TB web-text pipeline needs on
top of the parse->route->aggregate core.  All pure JVM expressions
(whole-stage codegen); every one has an exact SQL restatement so it is
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "un"],
    "es": ["el", "los", "y", "las", "una"],
}


def tokens_ws(text: Column) -> Column:
    """Whitespace tokenization (split on runs of spaces)."""
    return F.split(text, r"\s+")


def token_count_ws(text: Column) -> Column:
    return F.size(tokens_ws(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / punct)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_RE), F.lit(0)))


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_ws(F.lower(text))
    return F.round(_count_in(toks, STOPWORDS[lang]) / F.size(toks), 4)


def quality_features(text: Column) -> dict[str, Column]:
    """Document quality scoring features (length / punct / stopword ratios)."""
    toks = tokens_ws(F.lower(text))
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "avg_token_len": F.round((n_chars - n_tokens + 1) / n_tokens, 4),
        "stopword_ratio": F.round(_count_in(toks, STOPWORDS["en"]) / n_tokens, 4),
        "uniq_token_ratio": F.round(F.size(F.array_distinct(toks)) / n_tokens, 4),
    }


def lang_id(text: Column) -> Column:
    """N-gram/stopword language-ID heuristic.

    CJK codepoints -> zh; otherwise the language whose stopword list hits
    most tokens (ties broken in en>de>fr>es order); no hits -> 'und'.
    """
    toks = tokens_ws(F.lower(text))
    counts = {lg: _count_in(toks, ws) for lg, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    out = F.when(text.rlike(r"[一-鿿]"), F.lit("zh")).when(best == 0, F.lit("und"))
    for lg in ["en", "de", "fr", "es"]:  # tie-break order
        out = out.when(counts[lg] == best, F.lit(lg))
    return out


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized,
    lowercased text (rolling-hash analog; md5 exists in both engines)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def md5_hash60(s: Column) -> Column:
    """THE repo-wide cross-engine integer hash: 60-bit value from the
    first 15 hex chars of md5 (DuckDB:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``).  Single definition —
    seeded variants (MinHash/SimHash in operators/dedup.py) wrap it with
    a ``value:seed`` concat; changing the width here changes every
    oracle's hash contract at once, never one side alone."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def winnow_fingerprints(text: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    hash every word ``k``-gram, slide a window of ``w`` consecutive gram
    hashes, keep each window's minimum, distinct the selections.

    The local guarantee the plain rolling-hash fingerprint can't give:
    any shared run of at least ``w + k - 1`` words between two documents
    contributes at least one IDENTICAL selected fingerprint — so overlap
    detection needs only an equi-join on fingerprints, never an alignment.
    Density is ~2/(w+1) of grams, i.e. the index is a fixed fraction of
    corpus size.  (Min-by-value per window rather than the paper's
    rightmost-min tie rule: the selected SET is what downstream joins use,
    and value-min makes the selection order-free and engine-portable.)

    Pure JVM expression forest (sequence/transform/slice/array_min) —
    whole-stage codegen, no shuffle; docs shorter than ``k`` words yield
    an empty set, docs with fewer than ``w`` grams yield the single
    global-min gram hash."""
    toks = tokens_ws(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))
    n = F.size(toks)
    hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: md5_hash60(F.concat_ws(" ", F.slice(toks, i, k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    h_n = F.size(hashes)
    return F.when(h_n == 0, F.array().cast("array<long>")).otherwise(
        F.when(h_n < w, F.array(F.array_min(hashes))).otherwise(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), h_n - w + 1),
                        lambda j: F.array_min(F.slice(hashes, j, w)),
                    )
                )
            )
        )
    )


#: Unicode script ranges for `script_counts` — deliberately the core
#: block of each script (exotic extensions excluded so both engines'
#: regex classes agree byte-for-byte).
SCRIPT_RANGES: dict[str, str] = {
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "digit": "0-9",
    "greek": "Ͱ-Ͽ",
    "hangul": "가-힯",
    "hebrew": "֐-׿",
    "kana": "぀-ヿ",
    "latin": "A-Za-zÀ-ɏ",
}


def script_counts(text: Column) -> dict[str, Column]:
    """Per-script character counts (exact integers) — the writing-system
    profile ``lang_id``'s stopword vote cannot give: stopwords only
    separate languages that SHARE a script, while mixed-script spam,
    mojibake, and wrong-charset decodes show up here first.  One
    ``regexp_count`` per script family, all JVM."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(f"[{rng}]")).cast("long")
        for name, rng in sorted(SCRIPT_RANGES.items())
    }


def dominant_script(text: Column) -> Column:
    """Name of the script with the highest character count; alphabetical
    tie-break (deterministic total order); 'none' when no script char
    occurs at all."""
    counts = script_counts(text)
    m = F.greatest(*counts.values())
    # alphabetical scan, FIRST match wins: nest the chain from the back
    chain = F.lit("none")
    for name in sorted(SCRIPT_RANGES, reverse=True):
        chain = F.when(counts[f"n_{name}"] == m, F.lit(name)).otherwise(chain)
    return F.when(m == 0, F.lit("none")).otherwise(chain)


def readability_counts(text: Column) -> dict[str, Column]:
    """The four classic readability surface counts, as exact BIGINTs:
    letters, words (ASCII letter runs), sentence terminators ([.!?] runs)
    and syllables (vowel-group runs — the standard heuristic; vowel groups
    never span word boundaries so whole-text counting equals per-word
    summing).  Every pattern is a plain character class, so Java regex,
    RE2 and DuckDB agree byte-for-byte."""
    return {
        "n_letters": F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long"),
        "n_words": F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]+"), 0)).cast("long"),
        "n_sentences": F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), 0)).cast("long"),
        "n_syllables": F.size(
            F.regexp_extract_all(text, F.lit("[AEIOUYaeiouy]+"), 0)
        ).cast("long"),
    }


def readability_scores(text: Column) -> dict[str, Column]:
    """Flesch Reading Ease, Flesch-Kincaid grade, ARI and Coleman-Liau
    over :func:`readability_counts` (all four published formulas, public
    constants).  Word/sentence denominators floor at 1 so punctuation-free
    fragments score rather than NULL.  The identical arithmetic restates
    in SQL; callers round for cross-engine hashing."""
    c = readability_counts(text)
    words = F.greatest(c["n_words"], F.lit(1)).cast("double")
    sents = F.greatest(c["n_sentences"], F.lit(1)).cast("double")
    letters = c["n_letters"].cast("double")
    syll = c["n_syllables"].cast("double")
    wps = words / sents
    spw = syll / words
    lpw = letters / words
    return {
        **c,
        "flesch_ease": F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
        "fk_grade": F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
        "ari": F.lit(4.71) * lpw + F.lit(0.5) * wps - F.lit(21.43),
        "coleman_liau": F.lit(0.0588) * (F.lit(100.0) * lpw)
        - F.lit(0.296) * (F.lit(100.0) * sents / words)
        - F.lit(15.8),
    }


READABILITY_COUNTS_SQL = {
    "n_letters": "CAST(LENGTH(REGEXP_REPLACE({t}, '[^A-Za-z]', '', 'g')) AS BIGINT)",
    "n_words": "CAST(LEN(REGEXP_EXTRACT_ALL({t}, '[A-Za-z]+')) AS BIGINT)",
    "n_sentences": "CAST(LEN(REGEXP_EXTRACT_ALL({t}, '[.!?]+')) AS BIGINT)",
    "n_syllables": "CAST(LEN(REGEXP_EXTRACT_ALL({t}, '[AEIOUYaeiouy]+')) AS BIGINT)",
}


def readability_oracle_exprs(text_expr: str) -> dict[str, str]:
    """DuckDB restatement of :func:`readability_scores` (same formula
    text, same operation order — double arithmetic matches bit-for-bit
    before the caller's ROUND)."""
    c = {k: v.format(t=text_expr) for k, v in READABILITY_COUNTS_SQL.items()}
    words = f"CAST(GREATEST({c['n_words']}, 1) AS DOUBLE)"
    sents = f"CAST(GREATEST({c['n_sentences']}, 1) AS DOUBLE)"
    letters = f"CAST({c['n_letters']} AS DOUBLE)"
    syll = f"CAST({c['n_syllables']} AS DOUBLE)"
    wps = f"({words} / {sents})"
    spw = f"({syll} / {words})"
    lpw = f"({letters} / {words})"
    # constants cast to DOUBLE: DuckDB parses bare decimal literals as
    # DECIMAL, whose exact arithmetic differs from IEEE doubles by an ulp
    # at rounding boundaries
    d = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731
    return {
        **c,
        "flesch_ease": f"{d(206.835)} - {d(1.015)} * {wps} - {d(84.6)} * {spw}",
        "fk_grade": f"{d(0.39)} * {wps} + {d(11.8)} * {spw} - {d(15.59)}",
        "ari": f"{d(4.71)} * {lpw} + {d(0.5)} * {wps} - {d(21.43)}",
        "coleman_liau": (
            f"{d(0.0588)} * ({d(100.0)} * {lpw})"
            f" - {d(0.296)} * ({d(100.0)} * {sents} / {words}) - {d(15.8)}"
        ),
    }


def gopher_rules(text: Column) -> dict[str, Column]:
    """The Gopher document-level quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 — the filter set MassiveText/FineWeb-class
    pipelines standardized on), beside ``webtext.repetition_features``
    which covers that paper's repetition section.  Every threshold is an
    integer cross-multiplied comparison (0.8 → ``5·x >= 4·n``), so the
    verdicts replay exactly in any engine — no float ratio boundaries.

    Rules (flag TRUE = passes):

    - ``r_word_count``   50 <= words <= 100,000
    - ``r_mean_word_len``  3 <= mean word length <= 10 (chars-per-word
      via total word chars, whitespace excluded)
    - ``r_symbol_ratio``  (# + … + ...) <= words / 10
    - ``r_bullet_lines``  lines starting with a bullet < 90%
    - ``r_ellipsis_lines`` lines ending with … / ... < 30%
    - ``r_alpha_words``   words containing a letter >= 80%
    - ``r_stopwords``     >= 2 distinct common stopwords present
    - ``gopher_pass``     all of the above
    """
    toks = tokens_ws(F.lower(text))
    n_words = F.size(toks)
    word_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•●▪])"))
    )
    ellipsis = F.size(
        F.filter(lines, lambda l: F.rtrim(l).rlike(r"(…|\.\.\.)$"))
    )
    symbols = (
        F.length(text)
        - F.length(F.regexp_replace(text, r"#|…", ""))
        + F.size(F.split(text, r"\.\.\.")) - 1
    )
    alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in STOPWORDS["en"]]),
            lambda w: F.array_contains(toks, w),
        )
    )
    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (3 * n_words <= word_chars)
        & (word_chars <= 10 * n_words),
        "r_symbol_ratio": symbols * 10 <= n_words,
        "r_bullet_lines": bullet * 10 < n_lines * 9,
        "r_ellipsis_lines": ellipsis * 10 < n_lines * 3,
        "r_alpha_words": alpha * 5 >= n_words * 4,
        "r_stopwords": stop_hits >= 2,
    }
    from functools import reduce as _reduce

    rules["gopher_pass"] = _reduce(lambda a, b: a & b, rules.values())
    return rules
