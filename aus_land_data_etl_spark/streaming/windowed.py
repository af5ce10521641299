"""Event-time streaming operators: watermarked windows, bounded dedup,
custom stateful latest-per-key.

The reference pipeline is batch-only, but its incremental semantics
(SURVEY.md §2.10) imply three event-time operators the CDC engine needs
at 10^10-event scale, where unbounded state is not an option:

- **watermarked tumbling-window rollup** — the streaming form of the
  telemetry fold (reference: lib/pipeline/nsw_vg/land_values/telemetry.py
  :25-84 sums per-file counters; here the engine aggregates per
  event-time window with a watermark bounding how long a window stays
  open, so state is O(open windows), not O(stream)).
- **watermark-bounded duplicate drop** — the at-least-once transport
  dedup (reference analog: ON CONFLICT DO NOTHING on unique keys,
  sql/nsw_vg/schema/003_APPLY_create_raw.sql:11,54).  A global
  ``dropDuplicates`` on event_id would keep every id ever seen;
  ``dropDuplicatesWithinWatermark`` evicts ids older than the watermark
  (duplicates from a binlog shipper retry arrive within seconds, so a
  short horizon suffices — SURVEY.md §7.4 risk 3).
- **stateful latest-per-key** (``applyInPandasWithState``) — a custom
  stateful restatement of the LWW resolution (W3) that emits, per
  micro-batch, only the keys whose latest version changed; per-key state
  is a single (warc_ts, event_id) pair, the minimum possible.  The
  MERGE path remains the production apply; this operator exists for
  downstream consumers that want a *changelog* (url, new latest) rather
  than a table scan.

All three are pure event-time constructs: same code path in batch tests
(deterministic WAL files + availableNow drain) and a live tail.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def domain_of(url_col: str = "url") -> F.Column:
    """Extract the domain from a url column (JVM-side regex, no UDF)."""
    return F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)/", 1)


def windowed_rollup(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-(event-time window, domain) change-rate rollup.

    On a stream, the watermark bounds aggregation state: a window closes
    (and, in append mode, emits) once the watermark passes its end, and
    events later than the watermark are dropped — the documented
    late-data contract.  On a batch DataFrame the same expression is a
    plain groupBy (watermark is a no-op), which is what the oracle
    checks.
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            domain_of().alias("domain"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
            F.max(ts_col).alias("max_ts"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "domain",
            "n_events",
            "n_deletes",
            "max_ts",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    id_cols: Iterable[str] = ("event_id",),
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Drop duplicate deliveries by event id with bounded state.

    Streaming: ``dropDuplicatesWithinWatermark`` — state for an id is
    evicted once the watermark passes its event time, so memory is
    O(ids within the watermark horizon), not O(stream).  Batch: plain
    ``dropDuplicates`` (exact, no state concern).
    """
    cols = list(id_cols)
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            cols
        )
    return events.dropDuplicates(cols)


#: changelog rows emitted by latest_per_key_stateful
CHANGELOG_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("event_id", StringType()),
        StructField("op", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("warc_ts_us", LongType()),  # event-time micros (total order 1/2)
        StructField("event_id", StringType()),  # tiebreak (total order 2/2)
        StructField("op", StringType()),
    ]
)


def _parse_duration_ms(s: str) -> int:
    """'30 days' / '2 hours' / '15 minutes' / '10 seconds' → milliseconds."""
    n, unit = s.split()
    mult = {
        "day": 86_400_000,
        "hour": 3_600_000,
        "minute": 60_000,
        "second": 1_000,
        "millisecond": 1,
    }
    return int(float(n) * mult[unit.rstrip("s")])


def _lww_state_fn_factory(ttl_ms: int | None):
    """Build the per-key fold.  With a TTL, keys idle (no version advance)
    for ``ttl`` past the event-time watermark are evicted — state is then
    O(keys active within the TTL horizon), not O(distinct urls ever seen).
    After eviction a sufficiently-late stale delivery could re-emit as a
    fresh latest, but such events sit beyond the combined
    watermark + TTL lateness contract (same trade Flink state TTL makes).
    """

    def _lww_state_fn(key, pdf_iter, state: GroupState):
        """Fold a url's micro-batch rows into (max warc_ts, event_id)
        state; emit one changelog row iff the latest version advanced.

        Vectorized: each Arrow batch is reduced with a pandas sort — no
        per-row Python loop (input_hint).  The total order is
        (warc_ts, event_id), matching lake.merge LWW exactly.
        """
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        best_ts, best_id, best_op = None, None, None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            # lexicographic max over (warc_ts, event_id), vectorized
            pdf = pdf.sort_values(["warc_ts", "event_id"], kind="mergesort")
            row = pdf.iloc[-1]
            ts_us = int(row["warc_ts"].value // 1_000)  # ns → us
            cand = (ts_us, str(row["event_id"]))
            if best_ts is None or cand > (best_ts, best_id):
                best_ts, best_id, best_op = cand[0], cand[1], str(row["op"])
        if best_ts is None:
            return
        if state.exists:
            (cur_ts, cur_id, _cur_op) = state.get
            if (best_ts, best_id) <= (cur_ts, cur_id):
                return  # batch contained only stale versions — no emit
        state.update((best_ts, best_id, best_op))
        if ttl_ms is not None:
            # must exceed the current watermark; anchor on the later of
            # (watermark, this key's event time)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(wm_ms, best_ts // 1_000) + ttl_ms)
        yield pd.DataFrame(
            {
                "url": [key[0]],
                "warc_ts": [pd.Timestamp(best_ts, unit="us")],
                "event_id": [best_id],
                "op": [best_op],
            }
        )

    return _lww_state_fn


def latest_per_key_stateful(
    events: DataFrame,
    state_ttl: str | None = None,
    ts_col: str = "warc_ts",
    watermark_delay: str = "30 minutes",
) -> DataFrame:
    """Streaming changelog of LWW winners per url via
    ``applyInPandasWithState`` (the brief's custom-stateful-operator
    surface).  Emits (url, warc_ts, event_id, op) whenever a url's
    latest version advances; suppresses stale/duplicate deliveries.

    ``state_ttl`` (e.g. ``"30 days"``) bounds per-key state via an
    event-time timeout: a key idle for the TTL past the watermark is
    evicted, making state O(active keys), the contract a 10^10-event
    stream needs.  ``state_ttl=None`` keeps every key forever — exact
    changelog semantics for bounded key universes.
    """
    if state_ttl is None:
        return events.groupBy("url").applyInPandasWithState(
            _lww_state_fn_factory(None),
            outputStructType=CHANGELOG_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark_delay)
    return events.groupBy("url").applyInPandasWithState(
        _lww_state_fn_factory(_parse_duration_ms(state_ttl)),
        outputStructType=CHANGELOG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
