"""Deterministic hash-based dataset splitting and sampling.

Training-data builds need splits that are (a) reproducible run-to-run,
(b) independent of partitioning/row order, (c) stable under incremental
arrivals (a document's split never changes when new data lands), and
(d) recomputable OUTSIDE Spark for audits.  Random sampling has none of
these; hash bucketing has all four.

The bucket function is md5 — not xxhash64/murmur — deliberately: md5 is
byte-identical in every engine (Spark, DuckDB, Postgres, Python), so the
assignment is portable and the DuckDB oracle recomputes it exactly
(``dataset_split`` driver query).  First 8 hex chars → uint32 → ppm
bucket in [0, 1e6): plenty of resolution for per-mille split weights,
and the truncation keeps the value inside a signed 64-bit cast in every
engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket resolution: parts-per-million
_PPM = 1_000_000


def split_bucket(key: Column | str, salt: str = "v1") -> Column:
    """Deterministic ppm bucket in [0, 1e6) for a key column — the
    portable primitive behind :func:`hash_split` / :func:`hash_sample`.

    Exactly ``conv(substring(md5(key || '|' || salt), 1, 8), 16, 10) %
    1e6`` — recomputable in any engine with md5.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws("|", k.cast("string"), F.lit(salt)))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(_PPM)
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "v1",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    ``weights`` maps split name → fraction; fractions must sum to 1
    (±1e-9).  Assignment is a pure function of (key, salt): stable under
    repartitioning, re-runs, and incremental data arrival.  Vary
    ``salt`` to draw an independent split.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(key_col, salt)
    names = list(weights)
    # cumulative ppm thresholds; last split absorbs rounding residue
    cum, expr = 0, None
    for name in names[:-1]:
        cum += int(round(weights[name] * _PPM))
        cond = bucket < F.lit(cum)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "v1"
) -> DataFrame:
    """Deterministic ~``fraction`` sample by key hash: the same keys are
    selected on every run and on every engine (auditable sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(
        split_bucket(key_col, salt) < F.lit(int(round(fraction * _PPM)))
    )


def hash_sample_by(
    df: DataFrame,
    key_col: str,
    group_col: str,
    fractions: dict,
    default: float = 0.0,
    salt: str = "v1",
) -> DataFrame:
    """Deterministic stratified sampling: keep ~``fractions[group]`` of
    each group's rows by key hash (``sampleBy``'s semantics, but
    reproducible across runs, partitionings, engines, and incremental
    arrivals — the domain-mixing / temperature-sampling op of a
    pretraining data build, where each source domain is up- or
    down-weighted to its target share).  Groups absent from
    ``fractions`` keep ``default`` (0 = dropped).  One filter, no
    shuffle, no UDF; the plan stays a single scan + filter.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0,1], got {f}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0,1], got {default}")
    bucket = split_bucket(key_col, salt)
    thr = None
    for g, f in fractions.items():
        cond = F.col(group_col) == F.lit(g)
        lit = F.lit(int(round(f * _PPM)))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        F.lit(int(round(default * _PPM)))
        if thr is None
        else thr.otherwise(F.lit(int(round(default * _PPM))))
    )
    return df.filter(bucket < thr)
