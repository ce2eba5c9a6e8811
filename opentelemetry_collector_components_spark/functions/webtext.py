"""Web-text corpus hygiene functions for training-data pipelines.

Not part of the reference's surface — these are the repetition-filter /
PII-redaction operators a 100 TB web-text pipeline applies between parse
and dedup (the Gopher/C4 rule families).  All pure JVM higher-order-
function expressions (whole-stage codegen, no Python in the hot path);
every one has an exact SQL restatement so it is oracle-checkable.

Scale notes:
- per-document repetition features are O(L log L) (array_sort + one
  fold over equal-element runs — see ``_run_fold``); ``max_tokens`` caps
  L so the cost per row is bounded regardless of document length (the
  standard practice: quality signals stabilize after the first ~1k
  tokens).
- everything here is a narrow projection — no shuffle, no UDF, safe to
  fuse into any scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Redaction patterns kept to the syntax subset shared by Java regex (Spark)
# and RE2 (DuckDB) so the oracle restatement is exact.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{7,15}",
}
# Scrub order matters: emails first (their domains contain dotted tokens an
# IPv4 pattern could clip), then IPs, then bare international phone numbers.
PII_ORDER = ["email", "ipv4", "phone"]


def chunk_tokens(text: Column, size: int = 8) -> Column:
    """Split ``text`` into pseudo-lines: space-joined chunks of ``size``
    whitespace tokens.  Web text would chunk on '\\n'; the synthetic corpus
    has no newlines, so fixed token windows stand in as the line unit."""
    toks = F.split(text, r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(size)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * size + 1, size), " "),
    )


def _run_fold(units: Column, finish) -> Column:
    """Sort ``units`` and fold once over equal-element runs.

    The accumulator carries (prev element, current run length, best
    run*len seen, chars covered by runs of length > 1).  ``finish``
    receives the closed accumulator (the trailing run folded in) and picks
    the stat.  O(n log n) sort + O(n) fold — the naive
    filter-inside-transform mode count is O(n^2) in interpreted lambda
    evals and measured ~100 ms/doc at 500 tokens; this form is ~1000x
    cheaper and computes identical values (equal elements are contiguous
    after the sort, so a run IS a distinct element's full count)."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("dup"),
    )

    def close(acc):
        # fold the open run into best/dup
        w = acc["run"] * F.length(acc["prev"])
        return F.struct(
            acc["prev"].alias("prev"),
            acc["run"].alias("run"),
            F.greatest(acc["best"], w).alias("best"),
            (acc["dup"] + F.when(acc["run"] > 1, w).otherwise(0)).alias("dup"),
        )

    def step(acc, x):
        cont = F.struct(
            x.alias("prev"),
            (acc["run"] + 1).alias("run"),
            acc["best"].alias("best"),
            acc["dup"].alias("dup"),
        )
        closed = close(acc)
        fresh = F.struct(
            x.alias("prev"),
            F.lit(1).alias("run"),
            closed["best"].alias("best"),
            closed["dup"].alias("dup"),
        )
        return F.when(x == acc["prev"], cont).otherwise(fresh)

    return F.aggregate(
        F.array_sort(units), acc0, step, lambda acc: finish(close(acc))
    )


def repetition_features(
    text: Column, chunk_size: int = 8, max_tokens: int = 512
) -> dict[str, Column]:
    """Gopher-style repetition signals over pseudo-lines and word bigrams.

    - dup_line_frac:        1 - distinct(lines)/lines
    - dup_line_char_frac:   chars inside lines occurring >1 time / chars
    - top_bigram_char_frac: chars covered by the most-covering word bigram
                            (count * len) / chars
    - dup_bigram_frac:      1 - distinct(bigrams)/bigrams
    """
    toks = F.slice(F.split(text, r"\s+"), 1, max_tokens)
    capped = F.array_join(toks, " ")
    lines = chunk_tokens(capped, chunk_size)
    n_lines = F.size(lines)
    n_chars = F.length(capped)
    dup_chars = _run_fold(lines, lambda acc: acc["dup"])
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    top_bi_chars = F.when(
        n_bi > 0, _run_fold(bigrams, lambda acc: acc["best"])
    ).otherwise(F.lit(0))
    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": F.round(1 - F.size(F.array_distinct(lines)) / n_lines, 4),
        "dup_line_char_frac": F.round(F.try_divide(dup_chars, n_chars), 4),
        "top_bigram_char_frac": F.round(F.try_divide(top_bi_chars, n_chars), 4),
        "dup_bigram_frac": F.when(
            n_bi > 0, F.round(1 - F.size(F.array_distinct(bigrams)) / n_bi, 4)
        ).otherwise(F.lit(0.0)),
    }


def add_repetition_features(
    df, text_col: str = "text", chunk_size: int = 8, max_tokens: int = 512
):
    """DataFrame form of ``repetition_features`` that materializes the
    shared token/line/bigram arrays in their own projection first.

    Higher-order functions run on the interpreted (non-codegen) path where
    Catalyst does NO common-subexpression elimination — inlining the array
    builders into all five feature columns re-evaluates split/transform
    per column.  A separate Project whose aliases are referenced more than
    once is NOT collapsed into the consumer (CollapseProject only inlines
    cheap or singly-used aliases), so each array is built exactly once per
    row.  Measured ~3x over the inlined column form."""
    toks = F.slice(F.split(F.col(text_col), r"\s+"), 1, max_tokens)
    capped = F.array_join(toks, " ")
    staged = df.withColumns(
        {"_toks": toks, "_capped": capped, "_lines": chunk_tokens(capped, chunk_size)}
    )
    n_tok = F.size(F.col("_toks"))
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_toks"), i),
                F.element_at(F.col("_toks"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.withColumn("_bigrams", bigrams)
    lines, bi = F.col("_lines"), F.col("_bigrams")
    n_lines, n_bi = F.size(lines), F.size(bi)
    n_chars = F.length(F.col("_capped"))
    feats = {
        "n_lines": n_lines.cast("long"),
        "dup_line_frac": F.round(1 - F.size(F.array_distinct(lines)) / n_lines, 4),
        "dup_line_char_frac": F.round(
            F.try_divide(_run_fold(lines, lambda acc: acc["dup"]), n_chars), 4
        ),
        "top_bigram_char_frac": F.round(
            F.try_divide(
                F.when(n_bi > 0, _run_fold(bi, lambda acc: acc["best"])).otherwise(0),
                n_chars,
            ),
            4,
        ),
        "dup_bigram_frac": F.when(
            n_bi > 0, F.round(1 - F.size(F.array_distinct(bi)) / n_bi, 4)
        ).otherwise(F.lit(0.0)),
    }
    out = staged.withColumns(feats)
    return out.drop("_toks", "_capped", "_lines", "_bigrams")


def pii_counts(text: Column) -> dict[str, Column]:
    return {
        f"n_{name}": F.size(
            F.regexp_extract_all(text, F.lit(pat), F.lit(0))
        ).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def pii_scrub(text: Column) -> Column:
    """Replace each PII class with a typed placeholder token."""
    out = text
    for name in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


# Normalization chain (ordered; Java∩RE2 subset so the oracle restatement
# is exact): lowercase -> control chars to space -> digits fold to '0' ->
# punctuation runs to space -> whitespace collapse -> trim.  The standard
# pre-shingling canonicalization (Lee et al. 2022 / CCNet): near-dup
# detection should not split on case, numerals, or punctuation variants.
NORM_RULES: list[tuple[str, str]] = [
    (r"[\x00-\x1F\x7F]", " "),
    (r"[0-9]", "0"),
    (r"[^a-z0-9\s]+", " "),
    (r"\s+", " "),
]


def normalize_text(text: Column) -> Column:
    """Canonical text form for fingerprinting/shingling (see NORM_RULES).
    A narrow scan-fused projection — apply BEFORE ``exact_dedup`` /
    ``minhash_signatures`` when punctuation/case/numeral variants should
    collapse to one identity.  Idempotent: normalize(normalize(x)) ==
    normalize(x)."""
    out = F.lower(text)
    for pat, rep in NORM_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


# ---------------------------------------------------------------------------
# Main-content extraction (block text/link density) — the Readability /
# JusText step every LLM corpus pipeline runs between fetch and quality
# filtering: drop navigation, footers, and link farms, keep the article.
# ---------------------------------------------------------------------------

# block-level elements end a text block; <br> too.  script/style/noscript
# subtrees are removed wholesale BEFORE splitting (their text is code, not
# content); the close tag is optional so a TRUNCATED fetch body (unclosed
# <script> at end of record — constant in real crawls) drops the dangling
# code instead of leaking it into the block stream as fake content.
_SCRIPT_STYLE = r"(?is)<(script|style|noscript)[^>]*>.*?(</\1\s*>|$)"
_BLOCK_SPLIT = (
    r"(?i)</?(?:html|body|p|div|main|article|section|aside|nav|header|"
    r"footer|table|thead|tbody|tr|td|th|ul|ol|li|h[1-6]|blockquote|pre|"
    r"figure|form)\b[^>]*>|<br\s*/?>"
)
# anchor boundaries are rewritten to sentinel characters BEFORE block
# splitting, so an anchor that wraps block-level children (<a><div>card
# text</div></a> — the nav/card-grid shape) still counts as link text in
# whichever blocks its text lands; a per-block regex would lose the <a>
# context at the block boundary and let pure-link grids through the
# density filter.
_A_OPEN = "\x01"
_A_CLOSE = "\x02"


def _block_text(b: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, r"<[^>]*>", " "), r"\s+", " ")
    )


def _mc_block_stats(
    html: Column,
) -> Column:
    """Per-block (text, chars, link_chars) array for ``main_content``,
    carrying was-inside-an-anchor state across block boundaries (anchors
    are assumed non-nested, as in valid HTML; nesting degrades
    gracefully).

    r6 shape: the sequential pass is reduced to a fold that accumulates
    ONLY the per-block entry-state booleans (cheap array copies); the
    per-block heavy work (sentinel split, tag strip, link-char sum) runs
    once in a non-accumulating ``transform`` over blocks zipped with
    their entry states.  The r5 form accumulated the full stats structs
    in the fold, so every step copied every prior block's text — O(n^2)
    string copies per document of pure interpreted-HOF overhead
    (values identical).

    NOTE: this Column form references the block array twice (entry fold
    + zip) and higher-order functions get no common-subexpression
    elimination, so the marking regexes run twice per row here.  The
    corpus path is ``add_main_content``, which stages ``_mc_blocks`` /
    ``_mc_entry_states`` / ``_mc_stats_from`` as separate columns so
    everything is evaluated exactly once."""
    blocks = _mc_blocks(html)
    return _mc_stats_from(blocks, _mc_entry_states(blocks))


def _mc_blocks(html: Column) -> Column:
    """script/style removal + anchor-sentinel marking + block split —
    the three regex passes and the split, once.  Empty-string elements
    (adjacent block tags — the majority on tag-dense markup) are dropped
    here: they carry no sentinels, so entry states of the surviving
    blocks are unchanged, and their stats would be ('', 0, 0), which no
    downstream consumer can observe (kept-filter needs chars >=
    min_chars > 0, n_blocks counts chars > 0, main_text joins kept text
    only).  Dropping them early keeps BOTH the entry fold and the stats
    transform off dead elements (r6)."""
    cleaned = F.regexp_replace(html, _SCRIPT_STYLE, " ")
    marked = F.regexp_replace(cleaned, r"(?i)<a\b[^>]*>", _A_OPEN)
    marked = F.regexp_replace(marked, r"(?i)</a\s*>", _A_CLOSE)
    return F.filter(F.split(marked, _BLOCK_SPLIT), lambda b: b != "")


def _mc_entry_states(blocks: Column) -> Column:
    # entry-state fold: state after a block = (last sentinel is OPEN) if
    # the block has any sentinel, else unchanged — computed with
    # substring_index tail lengths, no splits, no struct copies
    zero = F.struct(
        F.lit(False).alias("cur"),
        F.expr("CAST(array() AS array<boolean>)").alias("arr"),
    )

    def entry_step(acc, b):
        has_open = b.contains(_A_OPEN)
        has_close = b.contains(_A_CLOSE)
        # tail after the LAST occurrence: shorter tail = later sentinel
        open_tail = F.length(F.substring_index(b, _A_OPEN, -1))
        close_tail = F.length(F.substring_index(b, _A_CLOSE, -1))
        last_is_open = has_open & (~has_close | (open_tail < close_tail))
        nxt = F.when(has_open | has_close, last_is_open).otherwise(acc["cur"])
        return F.struct(
            nxt.alias("cur"),
            F.concat(acc["arr"], F.array(acc["cur"])).alias("arr"),
        )

    return F.aggregate(blocks, zero, entry_step, lambda acc: acc["arr"])


def _mc_stats_from(blocks: Column, entries: Column) -> Column:
    """Per-block stats from staged blocks + entry states — one
    non-accumulating transform, heavy work once per block.

    Anchor-free blocks entered outside an anchor (the typical content
    paragraph) skip the sentinel split + link-sum machinery through a
    lazily-evaluated branch — their link_chars is 0 by construction."""
    zipped = F.arrays_zip(blocks.alias("b"), entries.alias("s"))

    def block_stat(z):
        b = z["b"]
        parts = F.split(b, _A_OPEN)
        first = F.element_at(parts, 1)
        # entry state: text before the first close sentinel was opened in
        # an earlier block
        first_link = F.when(
            z["s"], F.split_part(first, F.lit(_A_CLOSE), F.lit(1))
        ).otherwise(F.lit(""))
        link_sum = F.length(_block_text(first_link)) + F.aggregate(
            F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
            F.lit(0),
            lambda a, q: a
            + F.length(
                _block_text(F.split_part(q, F.lit(_A_CLOSE), F.lit(1)))
            ),
        )
        # no sentinel and not inside an anchor -> no link text at all;
        # the when() keeps the split/aggregate machinery unevaluated
        link_chars = F.when(
            z["s"] | b.contains(_A_OPEN) | b.contains(_A_CLOSE), link_sum
        ).otherwise(F.lit(0))
        # sentinel strip fused into the tag strip (one regex pass less;
        # the patterns are disjoint and both replace with a space)
        text = F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    b, f"<[^>]*>|[{_A_OPEN}{_A_CLOSE}]", " "
                ),
                r"\s+",
                " ",
            )
        )
        return F.struct(
            text.alias("text"),
            F.length(text).cast("int").alias("chars"),
            link_chars.cast("int").alias("link_chars"),
        )

    return F.transform(zipped, block_stat)


def _mc_keep_pred(min_chars: int, max_link_pct: int):
    return lambda s: (s["chars"] >= F.lit(min_chars)) & (
        s["link_chars"] * F.lit(100) <= F.lit(max_link_pct) * s["chars"]
    )


def main_content(
    html: Column,
    min_chars: int = 30,
    max_link_pct: int = 33,
) -> Column:
    """Extract the main content of an HTML document as a struct
    ``(main_text, n_blocks INT, n_kept INT, content_chars INT)``.

    Density heuristic (JusText/Readability family, deterministic):
    script/style subtrees are removed, the document is split into blocks
    at block-level tags, and a block survives when its visible text has
    at least ``min_chars`` characters AND its anchor-text share is at
    most ``max_link_pct`` percent (integer arithmetic —
    ``link_chars * 100 <= max_link_pct * chars`` — so the SQL oracle
    restatement is exact).  Navigation bars, footers, and link farms are
    link-dense and short; article paragraphs are neither.  ``main_text``
    joins surviving blocks in document order.  ``n_blocks`` counts
    non-empty blocks before filtering.

    Anchor text is tracked ACROSS block boundaries (sentinel rewrite +
    one stateful fold), so card grids whose anchors wrap block-level
    children are still link-dense; an unclosed <script> at end of body
    (truncated fetch) is dropped, not kept as content.

    Pure JVM (split + transform/filter/aggregate) — scan-fused, no
    shuffle, no UDF; cost is linear in document length.  HTML entities
    are left as-is (``decode_entities`` is the follow-up stage).

    NOTE: higher-order functions run on the interpreted path with no
    common-subexpression elimination, and this struct's four fields each
    inline the block-stats fold — fine for one field or tiny rows, but
    when extracting SEVERAL fields per document use ``add_main_content``,
    which stages the fold once per row (same pattern and rationale as
    ``add_repetition_features``).
    """
    stats = _mc_block_stats(html)
    kept = F.filter(stats, _mc_keep_pred(min_chars, max_link_pct))
    return F.struct(
        F.array_join(
            F.transform(kept, lambda s: s["text"]), " "
        ).alias("main_text"),
        F.size(F.filter(stats, lambda s: s["chars"] > 0)).cast("int").alias(
            "n_blocks"
        ),
        F.size(kept).cast("int").alias("n_kept"),
        F.aggregate(kept, F.lit(0), lambda a, s: a + s["chars"])
        .cast("int")
        .alias("content_chars"),
    )


def add_main_content(
    df,
    html_col: str = "html",
    min_chars: int = 30,
    max_link_pct: int = 33,
):
    """DataFrame form of ``main_content`` that materializes the block
    array, the entry states, and the block stats ONCE per row each
    (separate multi-referenced projections are not collapsed by
    Catalyst — see ``add_repetition_features``), then derives
    ``main_text`` / ``n_blocks`` / ``n_kept`` / ``content_chars``
    columns from the staged arrays.  Use this for the corpus pipeline;
    the Column form re-evaluates shared pieces per extracted field."""
    staged = (
        df.withColumn("_mc_blocks", _mc_blocks(F.col(html_col).cast("string")))
        .withColumn("_mc_entries", _mc_entry_states(F.col("_mc_blocks")))
        .withColumn(
            "_mc_stats",
            _mc_stats_from(F.col("_mc_blocks"), F.col("_mc_entries")),
        )
        .withColumn(
            "_mc_kept",
            F.filter(
                F.col("_mc_stats"), _mc_keep_pred(min_chars, max_link_pct)
            ),
        )
    )
    kept, stats = F.col("_mc_kept"), F.col("_mc_stats")
    out = staged.withColumns(
        {
            "main_text": F.array_join(
                F.transform(kept, lambda s: s["text"]), " "
            ),
            "n_blocks": F.size(
                F.filter(stats, lambda s: s["chars"] > 0)
            ).cast("int"),
            "n_kept": F.size(kept).cast("int"),
            "content_chars": F.aggregate(
                kept, F.lit(0), lambda a, s: a + s["chars"]
            ).cast("int"),
        }
    )
    return out.drop("_mc_blocks", "_mc_entries", "_mc_stats", "_mc_kept")


# ---------------------------------------------------------------------------
# HTML entity decoding — the step main_content leaves as-is: &amp; &#233;
# &#x20AC; ... back to characters.  Spark's chr() truncates codepoints mod
# 256, so multi-byte characters are produced by computing the UTF-8 byte
# sequence arithmetically and decoding it (decode(unhex(...), 'UTF-8')) —
# still pure JVM expressions, no UDF.
# ---------------------------------------------------------------------------

_NAMED_ENTITIES = [
    ("amp", "&"),
    ("lt", "<"),
    ("gt", ">"),
    ("quot", '"'),
    ("apos", "'"),
    ("nbsp", " "),
]


def _utf8_hex(cp: Column) -> Column:
    """Hex string of the UTF-8 encoding of codepoint ``cp`` (valid input
    assumed; caller range-checks)."""
    h = lambda x: F.lpad(F.conv(x.cast("string"), 10, 16), 2, "0")  # noqa: E731
    cont = lambda x: h(x.bitwiseAND(F.lit(0x3F)).bitwiseOR(F.lit(0x80)))  # noqa: E731
    return (
        F.when(cp <= 0x7F, h(cp))
        .when(
            cp <= 0x7FF,
            F.concat(h(F.shiftright(cp, 6).bitwiseOR(F.lit(0xC0))), cont(cp)),
        )
        .when(
            cp <= 0xFFFF,
            F.concat(
                h(F.shiftright(cp, 12).bitwiseOR(F.lit(0xE0))),
                cont(F.shiftright(cp, 6)),
                cont(cp),
            ),
        )
        .otherwise(
            F.concat(
                h(F.shiftright(cp, 18).bitwiseOR(F.lit(0xF0))),
                cont(F.shiftright(cp, 12)),
                cont(F.shiftright(cp, 6)),
                cont(cp),
            )
        )
    )


def _decode_entity_piece(p: Column) -> Column:
    """Decode the entity (if any) at the START of a '&'-split piece; a
    piece that starts with no well-formed entity keeps its literal '&'."""
    dec = F.regexp_extract(p, r"^#([0-9]{1,7});", 1)
    hexm = F.regexp_extract(p, r"^#[xX]([0-9a-fA-F]{1,6});", 1)
    cp_dec = dec.cast("long")
    cp_hex = F.conv(hexm, 16, 10).cast("long")
    valid = lambda cp: (  # noqa: E731
        (cp >= 1) & (cp <= 0x10FFFF) & ~cp.between(0xD800, 0xDFFF)
    )
    tail = lambda skip: p.substr(skip, F.lit(2147483647))  # noqa: E731
    out = F.when(
        (dec != "") & valid(cp_dec),
        F.concat(
            F.decode(F.unhex(_utf8_hex(cp_dec)), "UTF-8"),
            tail(F.length(dec) + F.lit(3)),  # '#' + digits + ';' consumed
        ),
    ).when(
        (hexm != "") & valid(cp_hex),
        F.concat(
            F.decode(F.unhex(_utf8_hex(cp_hex)), "UTF-8"),
            tail(F.length(hexm) + F.lit(4)),  # '#x' + hex + ';'
        ),
    )
    for name, ch in _NAMED_ENTITIES:
        out = out.when(
            p.startswith(name + ";"),
            F.concat(F.lit(ch), tail(F.lit(len(name) + 2))),
        )
    return out.otherwise(F.concat(F.lit("&"), p))


def decode_entities(text: Column) -> Column:
    """Replace HTML character references with their characters: the six
    predefined named entities (&amp; &lt; &gt; &quot; &apos; &nbsp;) and
    ALL numeric references, decimal and hex (&#233; &#x20AC; ...), full
    Unicode range via arithmetic UTF-8 byte construction.  Malformed or
    out-of-range references (unknown names, surrogates, > U+10FFFF,
    missing ';') stay literal.  Idempotence is NOT implied (decoding
    '&amp;#65;' yields '&#65;' by design — standard single-pass
    reference semantics).

    Scan-fused: one split on '&' plus per-piece prefix checks, all JVM.
    """
    parts = F.split(text, "&", -1)
    decoded = F.transform(
        parts,
        lambda p, i: F.when(i == 0, p).otherwise(_decode_entity_piece(p)),
    )
    return F.array_join(decoded, "")


# ---------------------------------------------------------------------------
# Luhn-validated card detection: the precision upgrade over the bare
# PII digit-run regex (most 16-digit runs in web text are order ids,
# not cards — the mod-10 checksum rejects 90% of random runs).
# ---------------------------------------------------------------------------

# boundary anchors must bind ACROSS separators too: without the
# two-char lookarounds, a 20-digit spaced run yields a 16-digit
# sub-run match ending before its last group
_CARD_RUN_RE = (
    r"(?<![0-9])(?<![0-9][ -])(?:[0-9][ -]?){12,18}[0-9](?![ -]?[0-9])"
)


def luhn_valid(digits: Column) -> Column:
    """Luhn mod-10 checksum over a pure-digit string (ISO/IEC 7812):
    from the RIGHT, double every second digit, fold >9 by subtracting
    9, valid iff the total ends in 0.  One JVM ``aggregate`` over the
    reversed characters — no UDF; empty/non-digit input yields false.
    """
    rev = F.reverse(digits)

    def _digit(i):
        return F.ascii(F.substr(rev, i, F.lit(1))) - 48

    total = F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(i % 2 == 1, _digit(i)).otherwise(
            F.when(_digit(i) < 5, _digit(i) * 2).otherwise(_digit(i) * 2 - 9)
        ),
    )
    return (
        (F.length(digits) > 0)
        & (digits == F.regexp_replace(digits, "[^0-9]", ""))
        & (total % 10 == 0)
    )


def card_candidates(
    df, id_col: str = "doc_id", text_col: str = "text"
):
    """Extract card-like digit runs (13-19 digits, optional space/dash
    separators, digit-boundary anchored) and Luhn-validate each:
    one row per candidate ``(id, digits, luhn_ok)``.  The validated
    subset is what a release scrubber should act on; the rejected rest
    is the false-positive mass the bare ``PII_PATTERNS`` regex would
    have scrubbed.  Pure explode + expressions, scan-side."""
    cand = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(_CARD_RUN_RE), F.lit(0))
        ).alias("_raw"),
    ).select(
        id_col,
        F.regexp_replace("_raw", "[ -]", "").alias("digits"),
    )
    cand = cand.where(F.length("digits").between(13, 19))
    return cand.withColumn("luhn_ok", luhn_valid(F.col("digits")))
