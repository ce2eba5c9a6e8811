"""Corpus sampling and sequence packing for training-data pipelines.

Two staples of LLM data preparation on top of the hygiene/dedup passes:

- ``sample_by_rates``: deterministic per-source subsampling (the
  temperature-reweighting step: upweight rare sources, downsample the
  Common-Crawl firehose).  The keep decision is a pure function of
  (id, seed) — md5-derived uniform in [0, 1) — so the sample is stable
  across reruns, resumable, and exactly restatable in any SQL engine;
  no RNG state, no shuffle, fully scan-fused.

- ``pack_sequences``: GPT-style concat-and-chunk packing.  Documents are
  concatenated in id order within a partition column and the token stream
  is cut every ``budget`` tokens; each document is labeled with the
  sequence (bin) its first token lands in and whether it straddles a cut.
  One window cumulative sum per partition — the window key is the
  partition column, so at corpus scale each source packs independently
  (no global ordering bottleneck)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^60: the md5-prefix hash below is 15 hex digits = 60 bits
_HASH_SPACE = float(1 << 60)


def deterministic_uniform(col: Column, seed: int = 0) -> Column:
    """Uniform [0, 1) as a pure function of (col, seed): the shared
    md5-prefix 60-bit hash (one recipe, one home — ``dedup._seeded_hash64``
    with the md5 engine) divided by 2^60.  DuckDB restatement:
    ``('0x' || substr(md5(col || ':seed'), 1, 15))::BIGINT / 2^60``."""
    from .dedup import _seeded_hash64

    return _seeded_hash64(col.cast("string"), seed, "md5") / F.lit(_HASH_SPACE)


def sample_by_rates(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 1.0,
) -> DataFrame:
    """Keep each row with probability ``rates[key]`` (deterministic in the
    row id).  The rate table is a literal CASE map — no join, no shuffle."""
    rate = F.lit(default_rate)
    for k, r in sorted(rates.items()):
        rate = F.when(F.col(key_col) == k, F.lit(float(r))).otherwise(rate)
    return df.where(deterministic_uniform(F.col(id_col), seed) < rate)


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    part_col: str = "source",
) -> DataFrame:
    """Concat-and-chunk packing: within ``part_col`` (id order), documents
    form one token stream cut every ``budget`` tokens.

    Adds: ``start_offset`` (exclusive cumulative tokens), ``seq_id``
    (bin of the first token), ``end_seq_id`` (bin of the last token) and
    ``straddles`` (doc crosses a cut — a real loader would split it)."""
    w = Window.partitionBy(part_col).orderBy(id_col)
    cum = F.sum(token_col).over(w)
    out = df.withColumn("start_offset", cum - F.col(token_col))
    out = out.withColumn(
        "seq_id", F.floor(F.col("start_offset") / budget)
    ).withColumn(
        "end_seq_id",
        F.floor((F.col("start_offset") + F.col(token_col) - 1) / budget),
    )
    return out.withColumn("straddles", F.col("seq_id") != F.col("end_seq_id"))
