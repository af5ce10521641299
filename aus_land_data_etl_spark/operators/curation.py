"""Corpus curation operators: domain caps, benchmark decontamination,
sequence packing.

The three filters every LLM pretraining-data build runs between dedup
and tokenization, expressed as pure Catalyst (no UDFs — window
functions, semi/anti joins, array expressions), each with an exact
ANSI-SQL mirror so the driver oracle value-checks them:

- **domain caps** (anti-spam): unbounded per-source document counts let
  one boilerplate-heavy domain dominate the corpus; keep at most N
  documents per group, preferring high quality, deterministic ties.
- **decontamination**: drop any document sharing a word n-gram with a
  benchmark/eval set (the n-gram-overlap rule from the GPT-3/PaLM
  appendix family) — a shingle semi-join, never a cross join.
- **sequence packing**: assign documents to fixed-token-budget bins in
  a deterministic order (the streaming-dataloader contiguous-fill
  policy) — a running-sum window, so the assignment is reproducible
  and partition-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_tokens(text: Column) -> Column:
    """Whitespace-normalised lowercase tokens — identical in SQL via
    REGEXP_SPLIT_TO_ARRAY(TRIM(REGEXP_REPLACE(LOWER(t),'\\s+',' ')), ' ')."""
    t = F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " "))
    return F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column, n: int = 5) -> Column:
    """All ``n``-word shingles of ``text`` (space-joined), [] if shorter."""
    toks = _norm_tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")),
    ).otherwise(F.array().cast("array<string>"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    max_per_group: int,
    rank_col: str = "_rk",
) -> DataFrame:
    """Keep the top ``max_per_group`` rows per group under ``order_by``
    (callers pass a deterministic total order — e.g. quality DESC,
    id ASC).  One window, no UDF; at scale this is one shuffle on the
    group key with partial top-k pushdown (WindowGroupLimit)."""
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= max_per_group)
        .drop(rank_col)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Drop documents sharing any ``n``-word shingle with the benchmark
    set.  Shingle explode + LEFT ANTI join on the shingle — work is
    O(doc shingles + bench shingles), distributed on the shingle hash;
    the benchmark side is typically tiny and broadcasts."""
    exploded = docs.select(
        id_col, F.explode(word_shingles(F.col(text_col), n)).alias("_sh")
    )
    bench_sh = benchmark.select(
        F.explode(word_shingles(F.col(bench_text_col), n)).alias("_sh")
    ).distinct()
    dirty = (
        exploded.join(F.broadcast(bench_sh), "_sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(dirty, id_col, "left_anti")


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: list[Column],
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign rows to fixed-token-budget bins by contiguous fill over a
    deterministic total order (the streaming-dataloader packing policy:
    documents are concatenated in order and cut every ``budget``
    tokens; a document longer than the budget occupies its own bin(s)).

    ``bin_id = floor(exclusive_running_sum / budget)`` — one global
    running sum.  NOTE the single-ordering window is intentionally the
    exact dataloader semantic; for embarrassingly parallel packing,
    pre-split by a hash bucket and pack within buckets (compose with
    ``split_bucket``)."""
    w = Window.orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running = F.sum(token_col).over(w) - F.col(token_col)  # exclusive
    return df.withColumn(
        bin_col, F.floor(running / F.lit(budget)).cast("long")
    )


def pack_sequences_bucketed(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    order_by: list[Column],
    n_buckets: int = 32,
    bin_col: str = "bin_id",
    bucket_col: str = "pack_bucket",
    salt: str = "v1",
) -> DataFrame:
    """Embarrassingly parallel packing: the scale path for
    :func:`pack_sequences` (whose single global ordering is the exact
    dataloader semantic but a one-task window at 100×).

    Rows are pre-split into ``n_buckets`` deterministic hash buckets
    (``split_bucket(key) % n_buckets`` — md5-based, so engine-portable
    and stable under repartitioning/incremental arrival), then
    contiguous-filled WITHIN each bucket under ``order_by``.  The window
    partitions by the bucket, so the plan is one hash exchange on the
    bucket followed by n_buckets independent running sums — no
    SinglePartition exchange anywhere.  Global
    ``bin_id = local_bin * n_buckets + bucket`` keeps ids disjoint
    across buckets and a pure function of (key set, order, salt).
    Fill efficiency is within one partially-filled bin per bucket of
    the global policy: wasted capacity ≤ n_buckets·budget tokens total.
    """
    from aus_land_data_etl_spark.functions.sampling import split_bucket

    out = df.withColumn(
        bucket_col,
        F.pmod(split_bucket(key_col, salt), F.lit(n_buckets)).cast("long"),
    )
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(token_col).over(w) - F.col(token_col)  # exclusive
    local_bin = F.floor(running / F.lit(budget))
    return out.withColumn(
        bin_col,
        (local_bin * F.lit(n_buckets) + F.col(bucket_col)).cast("long"),
    )


def dup_ngram_frac(text: Column, n: int = 3) -> Column:
    """Fraction of duplicated word ``n``-grams: 1 − distinct/total (0.0
    for texts with <2 n-grams).  The Gopher-family repetition signal —
    boilerplate and spam repeat phrases, prose doesn't; filter rows
    above a threshold before training.  Pure array expressions."""
    sh = word_shingles(text, n)
    total = F.size(sh)
    return F.when(
        total > 1,
        F.round(
            1.0 - F.size(F.array_distinct(sh)) / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    delim: str = "\n",
) -> DataFrame:
    """Remove lines that repeat across ≥ ``min_docs`` distinct documents
    (the CCNet/RefinedWeb boilerplate pass: nav bars, cookie banners and
    footers repeat verbatim across a site; prose doesn't).

    Returns one row per input document with ``text_col`` rebuilt from
    the surviving lines (original casing/order preserved; duplicate
    detection is on the lowercased trimmed line), plus ``n_lines`` /
    ``n_kept`` so callers can filter husks (docs that were all
    boilerplate come back with an empty string, never disappear).

    Scale shape: posexplode (no shuffle) → line-key groupBy with
    map-side partial ``count_distinct`` (shuffle 1) → anti join against
    the duplicated-line set (shuffle 2) → per-doc rebuild (shuffle 3).
    The duplicated-line set is NOT broadcast — at web scale it is
    heavy-hitters-sized but unbounded, so the join is left to AQE
    (which will broadcast it when a site-level slice makes it small).
    Blank lines are structure, not boilerplate — never counted, always
    kept.
    """
    line_key = F.lower(F.trim(F.col("_line")))
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), delim, -1)
        ).alias("_pos", "_line"),
    )
    boiler = (
        lines.filter(line_key != "")
        .groupBy(line_key.alias("_k"))
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_k")
    )
    kept = lines.join(boiler, line_key == F.col("_k"), "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda x: x["_line"],
            ),
            delim,
        ).alias(text_col),
        F.count("*").alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.col("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
