"""Compressed parcel-list grammar (the reference's hardest vectorization).

Reference: ``ParcelsParser`` walks a property-description string with a
cursor, expanding compressed lot lists — ``'1, PT 2, 3/313'`` → folios
``1/313``, ``2/313`` (part), ``3/313`` — and stopping at the first token
that breaks the grammar, returning the rest as residue
(/root/reference/lib/pipeline/nsw_lrs/property_description/parse/
parcel_parser.py:17-175, cases in parse/tests/test_parse.py:11-342).

Spark-first restatement — NO UDF, no cursor: the sequential state machine
becomes token classification (JVM regex) plus three window functions:

1. tokenize: ``posexplode(split(desc, ' '))`` → (pos, tok);
2. classify each token: full parcel / trailing-comma lot / ``PT`` marker /
   plan-only terminal / strata (``CP/SP``) / numeric / other;
3. **suffix distribution** (the ``3/313`` denominator distributing over
   ``1, PT 2``): each comma-lot binds to the FIRST following non-group
   token; validity requires that token to be a terminal, and
   ``first(... ignorenulls)`` over the following frame fetches its plan
   suffix — the whole "carry the denominator backwards" state is one
   window expression;
4. **stop-at-first-invalid**: per-token validity is context-local
   (lag/lead + the linkage above), so the reference's cursor stop is
   ``min(pos) FILTER (WHERE NOT ok)`` over the document — tokens past it
   are residue.

Scales: per-document work only (window partitions by doc id), everything
whole-stage-codegen'd JVM regex/string ops; a 100 TB description corpus
shuffles once on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: lot(1-5 word chars) "/" [sec(1-4)? "/"] plan((SP)?digits)
FULL_RE = r"^[A-Za-z0-9]{1,5}/(?:[A-Za-z0-9]{1,4}/|/)?(?:SP)?[0-9]{1,9}$"
#: trailing-comma lot inside a compressed group: "2," / "PT102,"
LOT_COMMA_RE = r"^[A-Za-z0-9]{1,5},$"
#: plan-only group terminal: "/755532", "/SP23170"
PARTIAL_RE = r"^/(?:SP)?[0-9]{1,9}$"
NUMERIC_RE = r"^[0-9]+$"


def _classify(toks: DataFrame) -> DataFrame:
    t = F.col("tok")
    return toks.select(
        "*",
        t.rlike(FULL_RE).alias("is_full"),
        t.rlike(LOT_COMMA_RE).alias("is_lot"),
        (t == "PT").alias("is_pt"),
        t.rlike(PARTIAL_RE).alias("is_partial"),
        t.isin("CP/SP", "CP//SP").alias("is_strata"),
        t.rlike(NUMERIC_RE).alias("is_num"),
    )


def _parse_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared token pipeline: classify, link, validate, locate the stop."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    toks = _classify(toks)

    w = Window.partitionBy(id_col).orderBy("pos")
    after = w.rowsBetween(1, Window.unboundedFollowing)
    prev_tok = F.lag("tok").over(w)
    next_tok = F.lead("tok").over(w)
    next_is_num = F.coalesce(F.lead("is_num").over(w), F.lit(False))
    is_group = F.col("is_lot") | F.col("is_pt")
    is_terminal = (
        F.col("is_full")
        | F.col("is_partial")
        | (F.col("is_strata") & next_is_num)
    )
    # the terminal's plan suffix, e.g. "2/123"→"/123", "/755532"→itself,
    # "CP/SP"+"23170"→"/SP23170"
    term_suffix = F.when(F.col("is_full"), F.expr("substring(tok, instr(tok, '/'))")).when(
        F.col("is_partial"), F.col("tok")
    ).when(
        F.col("is_strata") & next_is_num,
        F.concat(F.expr("substring(tok, instr(tok, '/'))"), next_tok),
    )
    toks = toks.select(
        "*",
        prev_tok.alias("prev_tok"),
        next_tok.alias("next_tok"),
        next_is_num.alias("next_is_num"),
        is_terminal.alias("is_terminal"),
        term_suffix.alias("term_suffix"),
        # what the FIRST following non-group token is / carries — the
        # backward-carried denominator of the compressed list
        F.first(F.when(~is_group, is_terminal), ignorenulls=True)
        .over(after)
        .alias("next_nongroup_is_terminal"),
        F.first(F.when(~is_group, term_suffix), ignorenulls=True)
        .over(after)
        .alias("next_suffix"),
    )
    next_tok_is = lambda *pats: F.coalesce(
        F.col("next_tok").rlike("|".join(pats)), F.lit(False)
    )
    ok = (
        F.when(F.col("is_full"), F.lit(True))
        .when(F.col("is_pt"), next_tok_is(FULL_RE, LOT_COMMA_RE))
        .when(
            F.col("is_lot"),
            F.coalesce(F.col("next_nongroup_is_terminal"), F.lit(False)),
        )
        .when(
            F.col("is_partial"),
            F.coalesce(F.col("prev_tok").rlike(LOT_COMMA_RE), F.lit(False)),
        )
        .when(
            F.col("is_strata"),
            F.col("next_is_num")
            & F.coalesce(F.col("prev_tok").rlike(LOT_COMMA_RE), F.lit(False)),
        )
        .when(
            F.col("is_num"),
            F.coalesce(F.lag("is_strata").over(w), F.lit(False)),
        )
        .otherwise(F.lit(False))
    )
    toks = toks.withColumn("ok", ok)
    stop = Window.partitionBy(id_col)
    return toks.withColumn(
        "stopped_at",
        F.coalesce(
            F.min(F.when(~F.col("ok"), F.col("pos"))).over(stop),
            F.lit(2_147_483_647),
        ),
    )


def expand_parcels(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "desc"
) -> DataFrame:
    """Expand property descriptions into (id, pos, folio_id, part) rows.

    ``'B/100895 6, PT 20/755520'`` → ``B/100895``, ``6/755520``,
    ``20/755520`` (part) — reading order preserved via ``pos``.
    """
    toks = _parse_tokens(df, id_col, text_col)
    live = toks.filter(F.col("pos") < F.col("stopped_at"))
    part = F.coalesce(F.col("prev_tok") == "PT", F.lit(False))
    folio = (
        F.when(F.col("is_full"), F.col("tok"))
        .when(
            F.col("is_lot"),
            F.concat(F.expr("rtrim(',', tok)"), F.col("next_suffix")),
        )
        .when(
            F.col("is_strata") & F.col("next_is_num"),
            F.concat(
                F.expr("substring(tok, 1, instr(tok, '/') - 1)"),
                F.expr("substring(tok, instr(tok, '/'))"),
                F.col("next_tok"),
            ),
        )
    )
    # no orderBy here: a global sort is a second (range) shuffle the
    # operator doesn't need — reading order is recoverable from pos
    return live.filter(folio.isNotNull()).select(
        F.col(id_col),
        F.col("pos"),
        F.replace(folio, F.lit("//"), F.lit("/")).alias("folio_id"),
        part.alias("part"),
    )


def parcel_residue(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "desc"
) -> DataFrame:
    """Per-document residue: the space-joined tokens from the first
    grammar break onward (the reference's ``remains``; empty string when
    the whole description parses)."""
    toks = _parse_tokens(df, id_col, text_col)
    rest = toks.filter(F.col("pos") >= F.col("stopped_at"))
    joined = rest.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("residue")
    )
    return (
        df.select(id_col)
        .distinct()
        .join(joined, id_col, "left")
        .select(id_col, F.coalesce("residue", F.lit("")).alias("residue"))
    )
