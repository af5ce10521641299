"""Scalar column functions — all pure Catalyst expressions (no Python UDFs).

Each function mirrors a scalar operation in the reference pipeline (SURVEY.md
§2.9) but is expressed as a JVM-side column expression so it stays inside
whole-stage codegen.  Reference citations use file:line of
/root/reference (read-only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_id(*parts: Column | str) -> Column:
    """Content-derived 64-hex row id.

    Replaces the reference's nondeterministic ``uuid_generate_v4()`` /
    ``uuid4`` row-id minting (sql/nsw_vg/tasks/from_raw_derive/002_source.sql:16,
    lib/pipeline/nsw_vg/property_sales/factories.py:51-56).  Determinism is a
    hard requirement for byte-identical replay convergence: the same source
    row must mint the same id on every run (SURVEY.md §7.4).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.sha2(F.concat_ws("", *[c.cast("string") for c in cols]), 256)


def effective_date(*candidates: Column | str) -> Column:
    """COALESCE fallback chain for the event-time column.

    Reference: ``COALESCE(contract_date, settlement_date, date_provided)``
    (sql/nsw_vg/tasks/from_raw_derive/005_populate_lrs/001_setup.sql:19).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in candidates]
    return F.coalesce(*cols)


def sqm_area(area: Column | str, unit: Column | str) -> Column:
    """Unit-normalised area: hectares ×10_000, square metres ×1, else NULL.

    Reference plpgsql fn ``sqm_area`` (005_populate_lrs/001_setup.sql:1-10).
    """
    area_c = F.col(area) if isinstance(area, str) else area
    unit_c = F.col(unit) if isinstance(unit, str) else unit
    return (
        F.when(unit_c == "H", area_c * F.lit(10000.0))
        .when(unit_c == "M", area_c.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


#: Legacy single-letter zoning codes (pre-EP&A-2006 standard).
_LEGACY_ZONES = [
    "A", "B", "C", "D", "E", "I", "M", "N", "O", "P", "R", "S", "T", "U",
    "V", "W", "X", "Y", "Z",
]


def zone_standard(zone: Column | str) -> Column:
    """Classify a zoning code into its standard vintage.

    Reference classifier lib/pipeline/nsw_vg/raw_data/rows.py:24-53 (tested
    exhaustively in raw_data/tests/test_rows.py): single legacy letters →
    'legacy_vg_2011'; EP&A prefix+digit (e.g. R2, IN1, MU1) → 'ep&a_2006';
    anything else → 'unknown'.
    """
    z = F.col(zone) if isinstance(zone, str) else zone
    return (
        F.when(z.isNull(), F.lit(None).cast("string"))
        .when(z.isin(_LEGACY_ZONES), F.lit("legacy_vg_2011"))
        .when(z.rlike("^(IN|MU|RE|RU|SP|AGB|B|C|E|R|W)[0-9]$"), F.lit("ep&a_2006"))
        .otherwise(F.lit("unknown"))
    )


def code_label(code: Column | str, mapping: dict[str, str], default: str | None = None) -> Column:
    """CASE-WHEN code→label mapping.

    Reference: property-nature mapping 'V'→'Vaccant' [sic], 'R'→'Residence',
    '3'→'Other' (005_nature_of_property.sql:17-23).
    """
    c = F.col(code) if isinstance(code, str) else code
    expr = None
    for k, v in mapping.items():
        expr = F.when(c == k, F.lit(v)) if expr is None else expr.when(c == k, F.lit(v))
    assert expr is not None
    return expr.otherwise(F.lit(default).cast("string"))


def parse_compact_date(col: Column | str) -> Column:
    """``yyyyMMdd`` → date (reference raw_data/rows.py:7-14)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "yyyyMMdd")


def parse_dmy_date(col: Column | str) -> Column:
    """``dd/MM/yyyy`` (pre-2002 formats) → date (raw_data/rows.py:140-147)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(c, "dd/MM/yyyy")


def normalised_key(key: Column | str, sub_key: Column | str, sentinel: int = -1) -> Column:
    """Null-safe composite join key.

    Reference composite type ``normalised_property_id AS (property_id,
    COALESCE(strata_lot_number, -1))`` used because NULL != NULL breaks
    equi-joins (sql/nsw_lrs/schema/001_APPLY_init.sql:3-15).  Spark analog:
    a struct with the NULL replaced by a sentinel (alternative: ``<=>``
    null-safe equality, see operators.joins.null_safe_join).
    """
    k = F.col(key) if isinstance(key, str) else key
    s = F.col(sub_key) if isinstance(sub_key, str) else sub_key
    return F.struct(k.alias("key"), F.coalesce(s, F.lit(sentinel)).alias("sub_key"))


def ms_epoch_to_ts(col: Column | str) -> Column:
    """Millisecond epoch → timestamp with the reference's overflow guard.

    Reference lib/utility/df/prepare_for_sql.py:36-40 rejects values at or
    beyond 2^31·1000 ms.
    """
    c = F.col(col) if isinstance(col, str) else col
    bound = F.lit(2**31 * 1000)
    return F.when(c < bound, F.timestamp_millis(c.cast("long"))).otherwise(
        F.lit(None).cast("timestamp")
    )


def validated_postcode(col: Column | str) -> Column:
    """Postcode validation: exactly 4 digits else NULL (rows.py:100-113)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.rlike("^[0-9]{4}$"), c).otherwise(F.lit(None).cast("string"))
