"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query ids × corpus → top-k neighbours by
cosine):

- ``cosine_topk_bruteforce`` — the exact baseline: query×corpus join with
  the small side broadcast, dot products as Catalyst ``zip_with`` /
  ``aggregate`` expressions (JVM-side, no Python), top-k per query via
  window partial top-k.  Right answer at any scale where |queries|·|corpus|
  rows of arithmetic is acceptable.
- ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH signatures
  bucket the corpus; each query only scores its own buckets (multi-probe
  across ``n_tables`` independent tables for recall).  Hyperplanes are
  seeded-deterministic and shipped as literal arrays (broadcast by the
  plan), so replay is reproducible.  This is the IVF-style pruning a
  10^10-row corpus needs: per-query work drops from |corpus| to the
  bucket population.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float arrays (0 when either is zero)."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbours per query (excluding self-matches).

    Queries are broadcast (the small side by construction); the corpus
    never shuffles.  Output: (query_id, neighbour_id, cosine_sim, rank).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbour_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbour_id"))
        .select(
            "query_id",
            "neighbour_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbour_id")
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (driver-side constants, broadcast)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane signature: one bit per plane, packed to a long."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for p, w in enumerate(planes):
        wcol = F.array(*[F.lit(x) for x in w])
        proj = _dot(vec.cast("array<double>"), wcol)
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long"))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in any of ``n_tables`` independent tables."""
    from pyspark.sql import Window

    def with_sigs(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        cols = [F.col(id_col).alias(id_alias), F.col(vec_col).cast("array<double>").alias(vec_alias)]
        for t in range(n_tables):
            cols.append(
                lsh_signature(F.col(vec_col), dim, n_planes, seed + 1000 * t).alias(f"sig{t}")
            )
        return df.select(*cols)

    c = with_sigs(corpus, "neighbour_id", "cv")
    q = with_sigs(queries, "query_id", "qv")
    c_buckets = c.select(
        "neighbour_id",
        "cv",
        F.posexplode(F.array(*[F.col(f"sig{t}") for t in range(n_tables)])).alias(
            "table", "bucket"
        ),
    )
    q_buckets = q.select(
        "query_id",
        "qv",
        F.posexplode(F.array(*[F.col(f"sig{t}") for t in range(n_tables)])).alias(
            "table", "bucket"
        ),
    )
    cand = (
        c_buckets.join(F.broadcast(q_buckets), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbour_id"))
        .select("query_id", "neighbour_id", "qv", "cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbour_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbour_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )
