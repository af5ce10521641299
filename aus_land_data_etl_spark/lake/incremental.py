"""Incremental materialized-view maintenance over the changelog.

The reference keeps derived tables fresh by re-running full SQL over
Postgres after each ingest (the staged clean→dedup→partition flow,
``/root/reference/sql/nsw_vg/tasks``).  At 100 TB a full recompute per
micro-batch is not an option; this module maintains grouped aggregates
*incrementally* from the net changelog (``als/lake/changelog.py``):
refresh cost is O(interval changes + touched view buckets), never
O(base table) — the Materialize/Flink "retractable aggregate" model
expressed as plain DataFrame ops.

How it works
------------
A view is just another :class:`LakeTable`, keyed by the encoded group
key, versioned by the *source* snapshot version it reflects.  Each
``refresh``:

1. reads ``read_changes(source, v_from, v_to, with_preimages=True)`` —
   Delta-CDF rows where ``update_preimage``/``delete`` retract the old
   row's contribution and ``update_postimage``/``insert`` add the new
   one (the +1/-1 multiset algebra that makes SUM/COUNT maintainable);
2. aggregates signed contributions per group — one shuffle over the
   *changes* (map-side partial combine), never over the base table;
3. reads current state for ONLY the view buckets holding a changed
   group (bucket-pruned, probe bounded by n_buckets), full-outer joins
   it with the delta groups, and merges the new totals back through the
   ordinary LWW ``merge_into``; groups whose live row count reaches
   zero become tombstones;
4. commits with ``epoch_id = "mv:<v_from>-><v_to>"`` and records
   ``mv_source_version`` in the snapshot properties, so a crashed or
   replayed refresh is a no-op (the same exactly-once machinery the
   ingest side uses).

Supported aggregates: the decomposable-with-inverse ones — ``count``
(live rows per group), ``count_col``/``sum`` over a column (null-aware:
a non-null counter per sum lets ``read`` return SQL-faithful NULL for
all-null groups), ``avg`` derived from (sum, count) at read time — and
``min``/``max``, which have no inverse under deletes and are instead
maintained by a bounded per-group retraction reserve (top-RESERVE_K
distinct values with exact live counts): retractions at the extremum
fall back within the reserve, and only a group that exhausts all
tracked values pays a recompute from the base table's live view.  See
``AggSpec`` for the exact cost model.

Group keys may be *derived* expressions (``derived={"etype":
"substring_index(text, ' ', 1)"}``) evaluated on the change rows — the
analog of grouping a 100 TB web table by registered domain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.lake.changelog import CHANGE_TYPE_COL, read_changes
from aus_land_data_etl_spark.lake.merge import DELETED_COL, OP_COL, merge_into
from aus_land_data_etl_spark.lake.table import LakeTable, bucket_expr

#: encoded multi-column group key (the view table's key column)
MV_KEY_COL = "mv_key"
#: source snapshot version a view row reflects (the view's version column)
MV_VERSION_COL = "mv_src_version"
#: tiebreak for the view's LWW merge (refreshes are totally ordered by
#: source version, so it just mirrors the version)
MV_SEQ_COL = "mv_seq"
#: live-row count per group; <= 0 ⇒ the group is dead (tombstoned)
MV_ROWS_COL = "mv_rows"

#: min/max retraction reserve: per group, the top-K *distinct* live
#: values with exact live counts (Flink's retractable-min/max value→count
#: state, bounded).  A retraction at the extremum falls back to the next
#: reserve value instead of rescanning the source; only a group that
#: exhausts all K tracked values (and is not marked exhaustive) pays the
#: dirty recompute.  K=8 makes the worst case need 8 extremum deletions
#: of 8 distinct values between refreshes before any source scan.
RESERVE_K = 8
_RESERVE_T = "array<struct<v:double,c:bigint>>"


def _res_cmp(kind: str):
    """Best-first comparator for reserve entries (asc for min, desc for
    max); values are distinct by construction so 0 never matters."""
    if kind == "min":
        return lambda l, r: (
            F.when(l["v"] < r["v"], -1).when(l["v"] > r["v"], 1).otherwise(0)
        )
    return lambda l, r: (
        F.when(l["v"] > r["v"], -1).when(l["v"] < r["v"], 1).otherwise(0)
    )


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: ``kind`` ∈ count | count_col | sum | avg
    | min | max.

    ``count`` ignores ``col`` (COUNT(*)); the other kinds require it.

    ``min``/``max`` are NOT purely additive: a retraction at the stored
    extremum invalidates it.  They are maintained with a bounded
    *retraction reserve* (Flink's retractable-min/max value→count state,
    capped): each group stores its top-``RESERVE_K`` distinct live
    values with exact counts, so a retraction at the extremum falls back
    to the next reserve value — pure expression fold, no source touch.
    Only a group whose tracked values are ALL retracted between
    refreshes (and that is not marked exhaustive) pays the dirty-group
    recompute from the source's live view (broadcast semi-join on the
    group key, column-pruned, top-K rebuilt via window rank).  That
    residual worst case needs ≥ RESERVE_K distinct-value extremum
    deletions per group per interval — at a 100 TB source this turns
    "min/max views are O(source) under deletes" into a rare event
    instead of a steady cost.
    """

    name: str
    kind: str
    col: str | None = None

    def __post_init__(self) -> None:
        if self.kind not in ("count", "count_col", "sum", "avg", "min", "max"):
            raise ValueError(f"unsupported agg kind: {self.kind!r}")
        if self.kind != "count" and not self.col:
            raise ValueError(f"{self.kind} aggregate {self.name!r} needs col")


def _key_expr(keys: list[str]) -> Column:
    """Null-safe encoding of the group key tuple into one string key.

    ``\\x1f`` separates columns, ``\\x00`` marks NULL — so (NULL, 'a')
    and ('', 'a') stay distinct and NULL groups get a stable merge key.
    """
    return F.concat_ws(
        "\x1f",
        *[
            F.when(F.col(k).isNull(), F.lit("\x00")).otherwise(
                F.col(k).cast("string")
            )
            for k in keys
        ],
    )


def _storage_aggs(aggs: list[AggSpec]) -> list[AggSpec]:
    """Physical additive columns backing the requested aggregates.

    ``sum x`` → signed sum ``<name>`` (double) + non-null counter
    ``_nn_<name>``; ``avg x`` → ``_s_<name>`` + ``_nn_<name>``;
    ``count`` → nothing extra (MV_ROWS_COL already tracks it);
    ``count_col`` → its own signed counter.
    """
    out: list[AggSpec] = []
    seen: set[str] = set()

    def add(name: str, kind: str, col: str | None) -> None:
        if name not in seen:
            seen.add(name)
            out.append(AggSpec(name, kind, col))

    for a in aggs:
        if a.kind == "count":
            continue
        if a.kind == "count_col":
            add(a.name, "count_col", a.col)
        elif a.kind == "sum":
            add(a.name, "sum", a.col)
            add(f"_nn_{a.name}", "count_col", a.col)
        elif a.kind in ("min", "max"):
            add(a.name, a.kind, a.col)
        else:  # avg
            add(f"_s_{a.name}", "sum", a.col)
            add(f"_nn_{a.name}", "count_col", a.col)
    return out


class AggView:
    """Handle to an incrementally-maintained grouped-aggregate view."""

    def __init__(
        self,
        table: LakeTable,
        source: LakeTable,
        keys: list[str],
        aggs: list[AggSpec],
        derived: dict[str, str] | None = None,
        tiebreak_col: str = "event_id",
    ):
        self.table = table
        self.source = source
        self.keys = keys
        self.aggs = aggs
        self.derived = derived or {}
        self.tiebreak_col = tiebreak_col

    # -- lifecycle --------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        source: LakeTable,
        keys: list[str],
        aggs: list[AggSpec],
        derived: dict[str, str] | None = None,
        n_buckets: int = 8,
        tiebreak_col: str = "event_id",
    ) -> "AggView":
        key_schema = cls._key_schema(source, keys, derived or {})
        fields = [T.StructField(MV_KEY_COL, T.StringType(), False)]
        fields += [T.StructField(k, key_schema[k].dataType, True) for k in keys]
        fields += [
            T.StructField(MV_VERSION_COL, T.LongType(), False),
            T.StructField(MV_SEQ_COL, T.LongType(), False),
            T.StructField(MV_ROWS_COL, T.LongType(), True),
        ]
        for a in _storage_aggs(aggs):
            fields.append(
                T.StructField(
                    a.name,
                    T.LongType() if a.kind == "count_col" else T.DoubleType(),
                    True,
                )
            )
            if a.kind in ("min", "max"):
                fields.append(
                    T.StructField(
                        f"_res_{a.name}",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("v", T.DoubleType()),
                                    T.StructField("c", T.LongType()),
                                ]
                            )
                        ),
                        True,
                    )
                )
                fields.append(
                    T.StructField(f"_resx_{a.name}", T.BooleanType(), True)
                )
        table = LakeTable.create(
            spark,
            root,
            schema=T.StructType(fields),
            key_col=MV_KEY_COL,
            version_col=MV_VERSION_COL,
            n_buckets=n_buckets,
            properties={"mv_source_version": 0, "mv_keys": keys},
        )
        return cls(table, source, keys, aggs, derived, tiebreak_col)

    @staticmethod
    def _key_schema(
        source: LakeTable, keys: list[str], derived: dict[str, str]
    ) -> T.StructType:
        """Types of (payload ∪ derived) group keys, via a zero-row plan."""
        empty = source.read(buckets=[]).limit(0)
        for name, expr in derived.items():
            empty = empty.withColumn(name, F.expr(expr))
        missing = [k for k in keys if k not in empty.columns]
        if missing:
            raise ValueError(f"group keys not in source/derived: {missing}")
        return empty.select(*keys).schema

    # -- refresh ----------------------------------------------------------
    def refreshed_through(self) -> int:
        return int(self.table.snapshot().properties.get("mv_source_version", 0))

    def refresh(self) -> int:
        """Advance the view to the source's current snapshot.

        One changelog scan → one grouped delta (shuffled on the group
        key, O(changes)) → one bucket-pruned state join + LWW merge.
        Idempotent: a replayed interval hits the epoch guard; nothing
        new is a no-op.  Returns the view's committed snapshot version.
        """
        v_from, v_to = self.refreshed_through(), self.source.current_version()
        if v_to == v_from:
            return self.table.current_version()

        ch = read_changes(
            self.source, v_from, v_to, self.tiebreak_col, with_preimages=True
        )
        for name, expr in self.derived.items():
            ch = ch.withColumn(name, F.expr(expr))
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))

        storage = _storage_aggs(self.aggs)
        additive = [a for a in storage if a.kind in ("count_col", "sum")]
        extremal = [a for a in storage if a.kind in ("min", "max")]

        def contribution(a: AggSpec) -> Column:
            if a.kind == "count_col":
                return F.when(F.col(a.col).isNotNull(), sign).otherwise(F.lit(0))
            return sign.cast("double") * F.coalesce(
                F.col(a.col).cast("double"), F.lit(0.0)
            )

        deltas = ch.groupBy(_key_expr(self.keys).alias(MV_KEY_COL), *self.keys).agg(
            F.sum(sign).cast("long").alias(f"_d_{MV_ROWS_COL}"),
            *[
                F.sum(contribution(a))
                .cast("double" if a.kind == "sum" else "long")
                .alias(f"_d_{a.name}")
                for a in additive
            ],
        )
        # min/max reserve maintenance needs the interval's net count
        # change PER DISTINCT VALUE (the value→count retraction state),
        # not just the interval extremes: one extra grouped pass over
        # the (small) change set per extremal aggregate
        for a in extremal:
            val = F.col(a.col).cast("double")
            per_val = (
                ch.groupBy(
                    _key_expr(self.keys).alias(MV_KEY_COL), val.alias("_v")
                )
                .agg(F.sum(sign).cast("long").alias("_c"))
                .filter(F.col("_v").isNotNull() & (F.col("_c") != 0))
                .groupBy(MV_KEY_COL)
                .agg(
                    F.collect_list(
                        F.struct(F.col("_v").alias("v"), F.col("_c").alias("c"))
                    ).alias(f"_dv_{a.name}")
                )
            )
            deltas = deltas.join(per_val, MV_KEY_COL, "left")
        # small (O(changed groups)); pin it so the bucket probe below
        # doesn't recompute the changelog join — and never a bare
        # .cache(): the probe must see a durable copy
        deltas = deltas.localCheckpoint(eager=True)

        snap = self.table.snapshot()
        touched = sorted(
            r["b"]
            for r in deltas.select(
                bucket_expr(MV_KEY_COL, snap.n_buckets).alias("b")
            )
            .distinct()
            .collect()
        )
        state = self.table.read_resolved(buckets=touched, tiebreak_col=MV_SEQ_COL)
        if DELETED_COL in state.columns:
            state = state.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        res_cols = [
            c
            for a in extremal
            for c in (f"_res_{a.name}", f"_resx_{a.name}")
        ]
        state = state.select(
            MV_KEY_COL,
            *self.keys,
            MV_ROWS_COL,
            *[a.name for a in storage],
            *res_cols,
        )

        joined = state.alias("s").join(
            deltas.alias("d"), on=[MV_KEY_COL], how="full_outer"
        )

        def reserve_merge(a: AggSpec):
            """Fold the interval's per-value count deltas into the stored
            top-K reserve; returns (reserve', exhaustive', extremum',
            needs_recompute).

            Invariant: the reserve holds ALL distinct live values better
            than its worst entry (the cutoff), each with its exact live
            count; ``exhaustive`` means it holds every distinct live
            value.  So a value absent from the reserve has prior count 0
            if it is strictly better than the cutoff (or the reserve is
            exhaustive) — insertable; otherwise its prior count is
            unknown and it is dropped (it cannot be the extremum: the
            cutoff is better).  The extremum is exact whenever the
            merged reserve is non-empty; recompute is needed only when
            every tracked value was retracted AND untracked values may
            exist."""
            stored = F.coalesce(
                F.col(f"s._res_{a.name}"), F.expr(f"CAST(array() AS {_RESERVE_T})")
            )
            sx = F.coalesce(F.col(f"s._resx_{a.name}"), F.lit(True))
            # try_: ANSI mode (Spark 4 default) makes plain element_at THROW
            # on an empty array instead of returning NULL
            cutoff = F.try_element_at(stored, F.lit(-1))["v"]
            better = (
                (lambda k: k < cutoff)
                if a.kind == "min"
                else (lambda k: k > cutoff)
            )
            dmap = F.map_from_entries(
                F.coalesce(
                    F.col(f"d._dv_{a.name}"),
                    F.expr(f"CAST(array() AS {_RESERVE_T})"),
                )
            )
            merged_map = F.map_zip_with(
                F.map_from_entries(stored),
                dmap,
                lambda k, sc, dc: F.when(
                    sc.isNotNull(), sc + F.coalesce(dc, F.lit(0))
                )
                .when(sx, dc)
                .when(better(k), dc)
                .otherwise(F.lit(None).cast("long")),
            )
            entries = F.transform(
                F.filter(
                    F.map_entries(merged_map),
                    lambda e: e["value"].isNotNull() & (e["value"] > 0),
                ),
                lambda e: F.struct(
                    e["key"].alias("v"), e["value"].alias("c")
                ),
            )
            entries = F.array_sort(entries, _res_cmp(a.kind))
            reserve_new = F.slice(entries, 1, RESERVE_K)
            resx_new = sx & ~(F.size(entries) > RESERVE_K)
            ext_new = F.try_element_at(reserve_new, F.lit(1))["v"]
            needs = (F.size(reserve_new) == 0) & ~resx_new
            return reserve_new, resx_new, ext_new, needs

        rows_new = (
            F.coalesce(F.col(f"s.{MV_ROWS_COL}"), F.lit(0))
            + F.coalesce(F.col(f"_d_{MV_ROWS_COL}"), F.lit(0))
        ).cast("long")
        ext_merged = {a.name: reserve_merge(a) for a in extremal}
        dirty = F.lit(False)
        for a in extremal:
            dirty = dirty | ext_merged[a.name][3]
        merged = joined.select(
            F.col(MV_KEY_COL),
            *[
                F.coalesce(F.col(f"d.{k}"), F.col(f"s.{k}")).alias(k)
                for k in self.keys
            ],
            F.lit(v_to).cast("long").alias(MV_VERSION_COL),
            F.lit(v_to).cast("long").alias(MV_SEQ_COL),
            rows_new.alias(MV_ROWS_COL),
            *[
                (
                    F.coalesce(F.col(f"s.{a.name}"), F.lit(0))
                    + F.coalesce(F.col(f"_d_{a.name}"), F.lit(0))
                )
                .cast("double" if a.kind == "sum" else "long")
                .alias(a.name)
                for a in additive
            ],
            *[ext_merged[a.name][2].alias(a.name) for a in extremal],
            *[
                ext_merged[a.name][0].alias(f"_res_{a.name}")
                for a in extremal
            ],
            *[
                ext_merged[a.name][1].alias(f"_resx_{a.name}")
                for a in extremal
            ],
            # dead groups take the tombstone path regardless of dirtiness
            (dirty & (rows_new > 0)).alias("_dirty"),
        ).filter(
            # a state-only row means the interval didn't touch that group
            # (bucket collision) — it is already correct; don't rewrite it
            F.col(f"_d_{MV_ROWS_COL}").isNotNull()
        )
        if extremal:
            # used by both the clean and the dirty branch below
            merged = merged.localCheckpoint(eager=True)
            clean = merged.filter(~F.col("_dirty")).drop("_dirty")
            dirty_keys = merged.filter(F.col("_dirty")).select(
                MV_KEY_COL, *self.keys
            )
            # short-circuit on the (cheap, checkpointed) dirty count: the
            # recompute frame scans the source live view, and a lazy
            # union would execute that scan even when no group is dirty —
            # the reserve's whole point is that this branch almost never
            # runs (tests/test_incremental pins zero recompute calls for
            # reserve-served retractions)
            if dirty_keys.count() > 0:
                batch = clean.unionByName(
                    self._recompute_groups(dirty_keys, v_to),
                    allowMissingColumns=False,
                )
            else:
                batch = clean
        else:
            batch = merged.drop("_dirty")
        batch = batch.withColumn(
            OP_COL,
            F.when(F.col(MV_ROWS_COL) <= 0, F.lit("delete")).otherwise(
                F.lit("update")
            ),
        )
        merge_into(
            self.table,
            batch,
            tiebreak_col=MV_SEQ_COL,
            epoch_id=f"mv:{v_from}->{v_to}",
            touched=touched,
            properties_update={"mv_source_version": v_to},
        )
        return self.table.current_version()

    def _source_live(self, version: int | None = None) -> DataFrame:
        """Source's live view (+ derived columns) at a snapshot."""
        from aus_land_data_etl_spark.lake.changelog import _live_view

        v = self.source.current_version() if version is None else version
        snap = self.source.snapshot(v)
        payload = [
            f.name
            for f in snap.schema.fields
            if f.name not in (DELETED_COL, OP_COL)
        ]
        df = _live_view(self.source, v, None, self.tiebreak_col, payload)
        for name, expr in self.derived.items():
            df = df.withColumn(name, F.expr(expr))
        return df

    def _recompute_groups(self, dirty_keys: DataFrame, v_to: int) -> DataFrame:
        """Recompute ALL storage aggregates for the dirty groups from the
        source live view — a broadcast semi-join on the encoded group key
        (dirty groups per interval are few; the scan is column-pruned).
        min/max reserves are rebuilt as the top-``RESERVE_K`` distinct
        values with live counts (window rank bounds the per-group state
        collected — never a full distinct-value list)."""
        from pyspark.sql import Window

        keyed = self._source_live(v_to).withColumn(
            MV_KEY_COL, _key_expr(self.keys)
        )
        hit = keyed.join(
            F.broadcast(dirty_keys.select(MV_KEY_COL).distinct()),
            MV_KEY_COL,
            "inner",
        )

        def agg_col(a: AggSpec) -> Column:
            if a.kind == "count_col":
                return F.count(a.col).cast("long")
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[a.kind]
            return fn(F.col(a.col).cast("double"))

        storage = _storage_aggs(self.aggs)
        extremal = [a for a in storage if a.kind in ("min", "max")]
        out = hit.groupBy(MV_KEY_COL, *self.keys).agg(
            F.count("*").cast("long").alias(MV_ROWS_COL),
            *[agg_col(a).alias(a.name) for a in storage],
        )
        for a in extremal:
            val = F.col(a.col).cast("double")
            vals = (
                hit.select(MV_KEY_COL, val.alias("_v"))
                .filter(F.col("_v").isNotNull())
                .groupBy(MV_KEY_COL, "_v")
                .agg(F.count("*").cast("long").alias("_c"))
            )
            order = F.asc("_v") if a.kind == "min" else F.desc("_v")
            w = Window.partitionBy(MV_KEY_COL).orderBy(order)
            res = (
                vals.withColumn("_rn", F.row_number().over(w))
                .groupBy(MV_KEY_COL)
                .agg(
                    F.count("*").alias("_nd"),
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") <= RESERVE_K,
                                F.struct(
                                    F.col("_v").alias("v"),
                                    F.col("_c").alias("c"),
                                ),
                            )
                        ),
                        _res_cmp(a.kind),
                    ).alias(f"_res_{a.name}"),
                )
                .select(
                    MV_KEY_COL,
                    f"_res_{a.name}",
                    (F.col("_nd") <= RESERVE_K).alias(f"_resx_{a.name}"),
                )
            )
            out = out.join(res, MV_KEY_COL, "left")
        return out.select(
            MV_KEY_COL,
            *self.keys,
            F.lit(v_to).cast("long").alias(MV_VERSION_COL),
            F.lit(v_to).cast("long").alias(MV_SEQ_COL),
            MV_ROWS_COL,
            *[a.name for a in storage],
            *[
                c
                for a in extremal
                for c in (
                    F.coalesce(
                        F.col(f"_res_{a.name}"),
                        F.expr(f"CAST(array() AS {_RESERVE_T})"),
                    ).alias(f"_res_{a.name}"),
                    F.coalesce(F.col(f"_resx_{a.name}"), F.lit(True)).alias(
                        f"_resx_{a.name}"
                    ),
                )
            ],
        )

    # -- read -------------------------------------------------------------
    def read(self) -> DataFrame:
        """Live view rows: group keys + the requested aggregates.

        ``sum``/``avg`` return NULL for all-null groups (SQL semantics),
        via the per-sum non-null counter maintained in storage.
        """
        live = self.table.read_resolved(tiebreak_col=MV_SEQ_COL)
        if DELETED_COL in live.columns:
            live = live.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False)))
        live = live.filter(F.col(MV_ROWS_COL) > 0)
        cols: list[Column] = [F.col(k) for k in self.keys]
        for a in self.aggs:
            if a.kind == "count":
                cols.append(F.col(MV_ROWS_COL).cast("long").alias(a.name))
            elif a.kind == "count_col":
                cols.append(F.col(a.name).cast("long").alias(a.name))
            elif a.kind == "sum":
                cols.append(
                    F.when(F.col(f"_nn_{a.name}") > 0, F.col(a.name)).alias(
                        a.name
                    )
                )
            elif a.kind in ("min", "max"):
                # storage is NULL exactly when the group has no non-null
                # values — already SQL-faithful
                cols.append(F.col(a.name))
            else:  # avg
                cols.append(
                    F.when(
                        F.col(f"_nn_{a.name}") > 0,
                        F.col(f"_s_{a.name}") / F.col(f"_nn_{a.name}"),
                    ).alias(a.name)
                )
        return live.select(*cols)


def full_compute(view: AggView, version: int | None = None) -> DataFrame:
    """Ground truth: the same aggregates recomputed from the source's live
    view in one pass — what the refresh-maintained state must equal
    (pinned by ``tests/test_incremental.py``)."""
    df = view._source_live(version)
    aggs: list[Column] = []
    for a in view.aggs:
        if a.kind == "count":
            aggs.append(F.count("*").alias(a.name))
        elif a.kind == "count_col":
            aggs.append(F.count(a.col).alias(a.name))
        elif a.kind in ("sum", "min", "max"):
            fn = {"sum": F.sum, "min": F.min, "max": F.max}[a.kind]
            aggs.append(fn(F.col(a.col).cast("double")).alias(a.name))
        else:
            aggs.append(F.avg(F.col(a.col).cast("double")).alias(a.name))
    return df.groupBy(*view.keys).agg(*aggs)
