"""Versioned positional row factories for the multi-record ``.DAT`` scan
(S1 / SURVEY §1.3 depth).

Reference: five positional syntaxes are selected by data vintage
(``get_columns_and_syntax`` — /root/reference/lib/pipeline/nsw_vg/
property_sales/file_format/syntax.py:10-63), each mapping semicolon-
positional fields onto typed record classes (``factories.py:35-265``),
with 2001-07 files additionally disambiguating TWO C/D row variants
*within one file* by probing semicolon counts (``parse.py:136-166``).

Spark-first restatement:

- the vintage dispatch is a pure driver-side function (``select_vintage``)
  over (download_date, published_year) — identical decision table;
- each (vintage, kind) positional mapping is a Catalyst projection over
  the raw ``fields`` array from ``scan_delimited_records`` —
  ``element_at`` + ``try_cast`` / ``try_to_timestamp``, so malformed
  cells become NULL instead of killing a 100 TB scan;
- the **in-file variant probe** is a per-row column expression: the
  reference's "read to the Nth semicolon, fall back if a newline appears
  early" is, on a record-split scan, exactly "which declared field count
  does this row have" — ``size(fields)`` against the syntax table picks
  the variant per row, so one file can mix both C/D layouts;
- all vintages project onto ONE superset schema per record kind
  (columns a vintage lacks are NULL) — the schema-evolution contract the
  CDC registry applies to change events, applied here to file formats;
- parent linkage (B→A, C→B, D→C) is the S1 context-carry window
  (``last(..., ignorenulls)`` over file position), surfacing the parent
  record's position for lineage instead of nesting objects.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aus_land_data_etl_spark.functions.core import zone_standard

# --------------------------------------------------------------------------
# Vintage dispatch (syntax.py:10-63)
# --------------------------------------------------------------------------

#: kind -> expected semicolon counts; lists are (count, variant) tried in
#: descending count order — the reference's in-file variant table.
SYNTAXES: dict[str, dict[str, list[tuple[int, str | None]]]] = {
    "1990": {"A": [(5, None)], "B": [(21, None)], "Z": [(3, None)]},
    "2001_07": {
        "A": [(4, None)],
        "B": [(24, None)],
        "C": [(6, None), (5, "missing_property_id")],
        "D": [(11, None), (10, "missing_property_id")],
        "Z": [(5, None)],
    },
    "2002": {
        "A": [(4, None)],
        "B": [(24, None)],
        "C": [(6, None)],
        "D": [(11, None)],
        "Z": [(5, None)],
    },
    "2012": {
        "A": [(5, None)],
        "B": [(24, None)],
        "C": [(6, None)],
        "D": [(11, None)],
        "Z": [(5, None)],
    },
    "2021": {
        "A": [(5, None)],
        "B": [(24, None)],
        "C": [(6, None)],
        "D": [(12, None)],
        "Z": [(5, None)],
    },
}


def select_vintage(download_date: datetime | None, published_year: int) -> str:
    """The reference's vintage decision table, verbatim semantics."""
    if download_date is None:
        if published_year <= 2001:
            return "1990"
        raise TypeError("missing download date, cannot parse")
    d, y = download_date, published_year
    if y == 2001:
        if d.year > 2001 or d.month >= 8:
            return "2002"
        return "2001_07"
    if y < 2012:
        return "2002"
    if y == 2012:
        if d.month < 3 or (d.month == 3 and d.day < 13):
            return "2002"
        return "2012"
    if y == 2021:
        if (d.month, d.day) == (8, 23):
            return "2021"
        return "2012"
    return "2012"


# --------------------------------------------------------------------------
# Field readers (raw_data/rows.py analogs, NULL-on-malformed)
# --------------------------------------------------------------------------


def _fld(i: int) -> Column:
    # element_at is 1-based; returns NULL past the end (short rows)
    return F.element_at(F.col("fields"), i + 1)


def _s(i: int) -> Column:
    return F.nullif(_fld(i), F.lit(""))


def _i(i: int) -> Column:
    return _s(i).try_cast("int")


def _l(i: int) -> Column:
    return _s(i).try_cast("long")


def _f(i: int) -> Column:
    return _s(i).try_cast("double")


def _dt(i: int) -> Column:
    return F.try_to_timestamp(_s(i), F.lit("yyyyMMdd H:mm"))


def _date(i: int) -> Column:
    return F.try_to_timestamp(_s(i), F.lit("yyyyMMdd")).cast("date")


def _date_pre2002(i: int) -> Column:
    return F.try_to_timestamp(_s(i), F.lit("d/M/yyyy")).cast("date")


def _postcode(i: int) -> Column:
    return F.when(F.length(_s(i)) == 4, _s(i))


def _area_type(i: int) -> Column:
    return F.when(_s(i).isin("M", "H", "U"), _s(i))


def _null() -> Column:
    # built lazily: F.lit needs an active SparkContext
    return F.lit(None).cast("string")


# --------------------------------------------------------------------------
# Per-(vintage, kind, variant) positional mappings → superset columns
# --------------------------------------------------------------------------

#: superset column -> expression, per vintage/kind.  Mirrors the
#: reference factories field-for-field (factories.py:35-265).
def _a_mapping(vintage: str) -> dict[str, Column]:
    if vintage == "1990":
        # col 0 is always empty in the 1990 format
        return {
            "file_type": _null(),
            "district_code": F.lit(None).cast("int"),
            "submitting_user_id": _s(1),
            "date_provided": _dt(2),
        }
    if vintage in ("2001_07", "2002"):
        return {
            "file_type": _null(),
            "district_code": _i(0),
            "date_provided": _dt(1),
            "submitting_user_id": _s(2),
        }
    return {  # 2012 / 2021 (current): leading file_type column
        "file_type": _s(0),
        "district_code": _i(1),
        "date_provided": _dt(2),
        "submitting_user_id": _s(3),
    }


def _b_mapping(vintage: str) -> dict[str, Column]:
    if vintage == "1990":
        return {
            "district_code": _i(0),
            "source": _s(1),
            "valuation_number": _s(2),
            "property_id": _l(3),
            "unit_number": _s(4),
            "house_number": _s(5),
            "street_name": _s(6),
            "locality_name": _s(7),
            "postcode": _postcode(8),
            "contract_date": _date_pre2002(9),
            "purchase_price": _f(10),
            "land_description": _s(11),
            "area": _f(12),
            "area_type": _area_type(13),
            "dimensions": _s(14),
            "comp_code": _s(15),
            "zone_code": F.when(F.length(_s(16)) <= 4, _s(16)),
            "zone_standard": zone_standard(F.coalesce(_s(16), F.lit(""))),
        }
    # 2001_07 / 2002 (legacy_vg_2011, zone len 4) and current (ep&a_2006,
    # zone len 3) share positions; only the zone metadata differs.
    legacy = vintage in ("2001_07", "2002")
    zlen = 4 if legacy else 3
    return {
        "district_code": _i(0),
        "property_id": _l(1),
        "sale_counter": _i(2),
        "date_provided": _dt(3),
        "property_name": _s(4),
        "unit_number": _s(5),
        "house_number": _s(6),
        "street_name": _s(7),
        "locality_name": _s(8),
        "postcode": _postcode(9),
        "area": _f(10),
        "area_type": _area_type(11),
        "contract_date": _date(12),
        "settlement_date": _date(13),
        "purchase_price": _f(14),
        "zone_code": F.when(F.length(_s(15)) <= zlen, _s(15)),
        "zone_standard": F.when(
            _s(15).isNotNull(),
            F.lit("legacy_vg_2011" if legacy else "ep&a_2006"),
        ),
        "nature_of_property": _s(16),
        "primary_purpose": _s(17),
        "strata_lot_number": _i(18),
        "comp_code": _s(19),
        "sale_code": _s(20),
        "interest_of_sale": _i(21),
        "dealing_number": _s(22),
    }


def _c_mapping(variant: str | None) -> dict[str, Column]:
    if variant == "missing_property_id":
        return {
            "district_code": _i(0),
            "property_id": F.lit(None).cast("long"),
            "sale_counter": _i(1),
            "date_provided": _dt(2),
            "property_description": _s(3),
        }
    return {
        "district_code": _i(0),
        "property_id": _l(1),
        "sale_counter": _i(2),
        "date_provided": _dt(3),
        "property_description": _s(4),
    }


def _d_mapping(variant: str | None) -> dict[str, Column]:
    if variant == "missing_property_id":
        return {
            "district_code": _i(0),
            "property_id": F.lit(None).cast("long"),
            "sale_counter": _i(1),
            "date_provided": _dt(2),
            "participant": _s(3),
        }
    return {
        "district_code": _i(0),
        "property_id": _l(1),
        "sale_counter": _i(2),
        "date_provided": _dt(3),
        "participant": _s(4),
    }


def _z_mapping(vintage: str) -> dict[str, Column]:
    if vintage == "1990":
        return {
            "total_records": _i(0),
            "total_sale_property_details": _i(1),
            # fields not provided in the 1990 format
            "total_sale_property_legal_descriptions": F.lit(0),
            "total_sale_participants": F.lit(0),
        }
    return {
        "total_records": _i(0),
        "total_sale_property_details": _i(1),
        "total_sale_property_legal_descriptions": _i(2),
        "total_sale_participants": _i(3),
    }


#: canonical type per superset column — columns a vintage lacks are
#: emitted as NULL of THIS type (not string), so every vintage of a kind
#: yields one stable schema and multi-year scans union without coercion
_CANONICAL_TYPES: dict[str, str] = {
    "district_code": "int",
    "property_id": "long",
    "sale_counter": "int",
    "date_provided": "timestamp",
    "contract_date": "date",
    "settlement_date": "date",
    "purchase_price": "double",
    "area": "double",
    "strata_lot_number": "int",
    "interest_of_sale": "int",
    "total_records": "int",
    "total_sale_property_details": "int",
    "total_sale_property_legal_descriptions": "int",
    "total_sale_participants": "int",
}

#: superset column order per kind (stable output schemas)
A_COLS = ["file_type", "district_code", "date_provided", "submitting_user_id"]
B_COLS = [
    "district_code", "property_id", "sale_counter", "date_provided",
    "property_name", "unit_number", "house_number", "street_name",
    "locality_name", "postcode", "area", "area_type", "contract_date",
    "settlement_date", "purchase_price", "zone_code", "zone_standard",
    "nature_of_property", "primary_purpose", "strata_lot_number",
    "comp_code", "sale_code", "interest_of_sale", "dealing_number",
    "source", "valuation_number", "land_description", "dimensions",
]
C_COLS = [
    "district_code", "property_id", "sale_counter", "date_provided",
    "property_description",
]
D_COLS = [
    "district_code", "property_id", "sale_counter", "date_provided",
    "participant",
]
Z_COLS = [
    "total_records", "total_sale_property_details",
    "total_sale_property_legal_descriptions", "total_sale_participants",
]

_LINEAGE = ["source_file", "position"]


def _project(records: DataFrame, kind: str, cols: list[str],
             mapping_for_variant, syntax, extra: list[Column]) -> DataFrame:
    """One kind's rows → superset columns, per-row variant probe included."""
    rows = records.filter(F.col("kind") == kind)
    variants = syntax.get(kind)
    if variants is None:
        # kind not allowed in this vintage (e.g. C/D rows in 1990 format):
        # surfaced as an empty frame, the engine-side analog of the
        # reference's TypeError('c record not allowed in 1990 format')
        rows = rows.filter(F.lit(False))
        variants = [(0, None)]
    ordered = sorted(variants, key=lambda cv: cv[0], reverse=True)
    n = F.size("fields")
    out_cols = []
    for col in cols:
        expr = None
        # match declared counts in descending order, exactly like the probe
        for count, variant in ordered:
            m = mapping_for_variant(variant)
            e = m.get(col)
            if e is None:
                continue
            cond = n == count
            expr = F.when(cond, e) if expr is None else expr.when(cond, e)
        canonical = _CANONICAL_TYPES.get(col, "string")
        out_cols.append(
            (
                F.lit(None).cast(canonical)
                if expr is None
                else expr.otherwise(F.lit(None).cast(canonical))
            ).alias(col)
        )
    variant_expr = None
    for count, variant in ordered:
        cond = n == count
        v = F.lit(variant) if variant else _null()
        variant_expr = (
            F.when(cond, v) if variant_expr is None else variant_expr.when(cond, v)
        )
    return rows.select(
        *_LINEAGE,
        *out_cols,
        variant_expr.alias("variant"),
        (~n.isin([c for c, _ in ordered])).alias("malformed"),
        *extra,
    )


def parse_dat_records(
    records: DataFrame,
    download_date: datetime | None,
    published_year: int,
) -> dict[str, DataFrame]:
    """Typed, vintage-projected record frames from a raw S1 scan.

    Returns {'A': ..., 'B': ..., 'C': ..., 'D': ..., 'Z': ...} superset
    frames plus the parent record's position (``parent_position``) for
    B→A, C→B and D→C linkage.  ``year_of_sale`` / ``vintage`` lineage
    columns match the reference record types.
    """
    vintage = select_vintage(download_date, published_year)
    syntax = SYNTAXES[vintage]

    w = (
        Window.partitionBy("source_file")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def parent_pos(parent_kind: str) -> Column:
        p = F.when(F.col("kind") == parent_kind, F.col("position"))
        return F.last(p, ignorenulls=True).over(w)

    base = records.select(
        "*",
        parent_pos("A").alias("_a_pos"),
        parent_pos("B").alias("_b_pos"),
        parent_pos("C").alias("_c_pos"),
    )
    lineage = [
        F.lit(published_year).alias("year_of_sale"),
        F.lit(vintage).alias("vintage"),
    ]

    def mk(kind, cols, mapping, parent_col):
        extra = list(lineage)
        if parent_col is not None:
            extra.append(F.col(parent_col).alias("parent_position"))
        return _project(base, kind, cols, mapping, syntax, extra)

    return {
        "A": mk("A", A_COLS, lambda v: _a_mapping(vintage), None),
        "B": mk("B", B_COLS, lambda v: _b_mapping(vintage), "_a_pos"),
        "C": mk("C", C_COLS, _c_mapping, "_b_pos"),
        "D": mk("D", D_COLS, _d_mapping, "_c_pos"),
        "Z": mk("Z", Z_COLS, lambda v: _z_mapping(vintage), "_a_pos"),
    }
