"""Distributed BPE (byte-pair-encoding) vocabulary induction + encoding.

The tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn the
``n_merges`` most frequent adjacent symbol pairs from a corpus, then
encode text with the learned merge ranks.

Scale shape — the key observation is that BPE statistics live on the
WORD-FREQUENCY table, not the corpus: one corpus-sized aggregate collapses
10^12 documents into |vocab| (word, freq) rows (Zipf: millions, not
trillions), and every learning iteration runs on that table alone.
Per iteration:

1. pair counts: explode each word's adjacent symbol pairs weighted by the
   word's corpus frequency — one partial-aggregated groupBy;
2. argmax pair: ``ORDER BY count DESC, pair LIMIT 1`` =
   TakeOrderedAndProject, a 1-row collect (deterministic lexicographic
   tie-break, so training is reproducible run-to-run);
3. merge: rewrite every word's symbol array with a JVM ``aggregate`` fold
   (left-to-right non-overlapping, the reference semantics) — no Python
   in the loop;
4. ``localCheckpoint`` the word table each round — the plan otherwise
   grows by one fold per merge and the driver OOMs building plan strings
   long before executors feel it (same lesson as
   ``dedup.near_dedup_components``).

Learning is inherently iterative (each argmax depends on the previous
merge), so there is no single-statement SQL restatement — correctness is
pinned by golden parity with a pure-Python reference implementation on
planted corpora (tests) and a rows-style registry gate.

Encoding the full corpus afterwards uses an Arrow-batched pandas UDF with
the merge ranks in a broadcast dict — the production tokenizer shape
(HF tokenizers applies ranked merges the same way); a JVM expression
chain of ``n_merges`` nested folds would blow codegen depth at realistic
vocabulary sizes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# end-of-word marker (GPT-2 style uses a leading space; the suffix marker
# of the original BPE paper keeps the fold simple and test-readable)
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace tokens — the ONE corpus-sized pass."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = F.explode(F.split(txt, r"\s+")).alias("word")
    return (
        df.select(toks)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Character symbols + end-of-word marker: "low" -> [l, o, w, </w>]."""
    return F.concat(
        F.split(word, ""),
        F.array(F.lit(EOW)),
    )


def _merge_fold(sym_col: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b as a
    JVM fold: "aaa" under (a,a) becomes [aa, a], matching the reference."""
    merged = a + b
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_: NULL (not ANSI error) on the empty accumulator
            (F.try_element_at(acc, F.lit(-1)) == a) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word frequency."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("a"),
            F.element_at(F.col("syms"), i + 1).alias("b"),
        ),
    )
    return (
        words.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def learn_bpe_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """The ranked merge list (highest-frequency first).  Stops early when
    no pair reaches ``min_pair_freq``.  See module docstring for the
    per-iteration plan shape and why the word table is checkpointed.

    Storage discipline: each round's localCheckpoint blocks are released
    as soon as the NEXT round's checkpoint materializes (a plain
    ``unpersist()`` would be a no-op on checkpoint storage, and an eager
    release would break the frame — ``caching.local_checkpoint_tracked``)
    so peak executor storage is two word tables, not ``n_merges``."""
    from ..caching import local_checkpoint_tracked

    words, release = local_checkpoint_tracked(
        word_frequencies(df, text_col, lowercase).select(
            _initial_symbols(F.col("word")).alias("syms"), "freq"
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words, next_release = local_checkpoint_tracked(
            words.select(_merge_fold(F.col("syms"), a, b).alias("syms"), "freq")
        )
        release()  # previous round's blocks now unreachable
        release = next_release
    release()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply the learned merges (in rank order, each exhaustively
    left-to-right — the reference encoder) to every document; emits an
    ``array<string>`` token column.  Arrow-batched pandas UDF with the
    rank table in the closure — the production tokenizer path."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str) -> list[str]:
        syms = list(word) + [EOW]
        while len(syms) >= 2:
            best, best_rank = None, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_rank:
                    best, best_rank = (syms[i], syms[i + 1]), r
            if best is None or best_rank == len(ranks):
                break
            a, b = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    @pandas_udf("array<string>")
    def _enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc_doc(t):
            toks: list[str] = []
            for w in (t or "").split():
                if w not in cache:
                    cache[w] = _encode_word(w)
                toks.extend(cache[w])
            return toks

        return texts.map(enc_doc)

    src = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return df.withColumn(out_col, _enc(src))


# framing bytes for the literal-replace encoder: symbol = SOT sym EOT,
# words separated by SEP.  Never valid in text (stripped first), so a
# replace of "SOT a EOT SOT b EOT" can only ever match a whole adjacent
# symbol pair — both boundaries are anchored without regex lookaround.
_SOT, _EOT, _SEP = "\x01", "\x02", "\x03"


def bpe_encode_expr(
    text: Column, merges: list[tuple[str, str]], lowercase: bool = True
) -> Column:
    """JVM-only BPE apply: the merge table inlined as a chain of literal
    ``replace`` expressions — zero Python in the hot path, and exactly
    restatable in any SQL engine (each merge is one ``replace`` call),
    which makes the tokenizer ORACLE-GATEABLE, unlike the pandas-UDF
    :func:`bpe_encode`.

    Equivalence: applying merges exhaustively in rank order equals the
    encoder's iterative best-rank loop (a rank-k merge can never create
    a lower-rank pair's input that wasn't already merged — Sennrich
    BPE's standard apply), and each ``replace`` is left-to-right
    non-overlapping, the same fold as ``_merge_fold``; pinned against
    :func:`bpe_encode` in tests.  Framing: each symbol is wrapped
    ``\\x01 sym \\x02`` so adjacent matches share no bytes (a bare
    separator breaks on chains like "a b a b", where match 1 would
    consume the boundary byte match 2 needs).

    Scope: expression depth grows with ``len(merges)`` — right for the
    bounded merge tables this restates (domain tokenizers, gates);
    realistic 30k-merge vocabularies stay on the pandas-UDF path (see
    module docstring).  Bytes ``\\x01-\\x03`` are stripped from input
    first (framing must stay unambiguous).  Returns ``array<string>``
    tokens, each word suffixed with the ``</w>`` EOW symbol.
    """
    t = F.lower(text) if lowercase else text
    t = F.regexp_replace(t, "[" + _SOT + _EOT + _SEP + "]", "")
    # full \s trim (F.trim strips ASCII spaces only — a tab-led document
    # would otherwise frame an empty leading word)
    t = F.regexp_replace(t, r"^\s+|\s+$", "")
    s = F.regexp_replace(t, r"\s+", _SEP)
    s = F.regexp_replace(s, "([^" + _SEP + "])", _SOT + "$1" + _EOT)
    eow = _SOT + EOW + _EOT
    s = F.when(
        t == "", F.lit("")
    ).otherwise(F.concat(F.regexp_replace(s, _SEP, eow + _SEP), F.lit(eow)))
    for a, b in merges:
        s = F.replace(
            s, F.lit(_SOT + a + _EOT + _SOT + b + _EOT), F.lit(_SOT + a + b + _EOT)
        )
    return F.filter(
        F.split(F.replace(s, F.lit(_SEP), F.lit("")), "[" + _SOT + _EOT + "]+"),
        lambda x: x != "",
    )
