"""Property-based replay/state-equivalence (Hypothesis).

Random event logs — duplicate deliveries, out-of-order versions, deletes,
key collisions, degenerate/duplicated/unique source offsets, CoW/MoR mode
mixes, partial-image patches — applied through the real engine under a
random batching must equal a pure-Python LWW oracle.  This is the
randomized counterpart of the deterministic replay suite (SURVEY.md §5
test plan #2).

Profiles: the default suite runs DERANDOMIZED (reproducible CI — same
examples every run); the randomized exploration profile rides behind
``-m slow``.  This suite found the round-3 exactly-once content-key
collision (manifest row hash missing event_id) and the round-4 xor
self-cancellation — both pinned below as deterministic regressions.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import (
    apply_batch,
    apply_patch_batch,
    create_pages_table,
)
from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA, PATCH_EVENT_SCHEMA
from aus_land_data_etl_spark.functions.text import extract_text_bytes
from aus_land_data_etl_spark.lake.merge import read_current

KEYS = [f"https://d{i}.example.com/p/{i}" for i in range(6)]
BASE = dt.datetime(2024, 1, 1)

_PROFILE_COMMON = dict(
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@st.composite
def event_logs(draw, with_patches: bool = False):
    """(events, n_batches, modes, offset_mode, wal) — events are
    (event_id, op, key, ts_s, set_cols, source_offset) tuples.

    Offset modes: ``unique`` (proper WAL: one offset per delivery),
    ``degenerate`` (every offset 0 — the placeholder batch-mode caller
    that exposed the content-key collision), ``drawn`` (random, may
    repeat).  ``wal_offsets`` is only ever asserted under ``unique``.
    """
    ops = ["insert", "update", "update", "delete"]
    if with_patches:
        ops += ["patch", "patch"]
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(ops))
        ts_s = draw(st.integers(min_value=0, max_value=40))
        sets = None
        if op == "patch":
            sets = draw(
                st.lists(
                    st.sampled_from(["html", "lang"]),
                    min_size=0,
                    max_size=2,
                    unique=True,
                )
            )
            # NULL set_cols on a patch: must behave as the empty set,
            # never as a full image (ADVICE round-3, low)
            if not sets and draw(st.booleans()):
                sets = None
            else:
                sets = sorted(sets)
        events.append((f"e{i:03d}", op, key, ts_s, sets))
    # duplicate delivery of a random subset (at-least-once transport)
    dups = draw(st.lists(st.sampled_from(events), max_size=4))
    order = events + dups
    offset_mode = draw(st.sampled_from(["unique", "degenerate", "drawn"]))
    if offset_mode == "unique":
        order = [e + (j,) for j, e in enumerate(order)]
    elif offset_mode == "degenerate":
        order = [e + (0,) for e in order]
    else:
        order = [
            e + (draw(st.integers(min_value=0, max_value=6)),) for e in order
        ]
    n_batches = draw(st.integers(min_value=1, max_value=3))
    # wap-*: the batch stages on a write-audit-publish branch and is
    # published immediately — the end state must be indistinguishable
    # from a direct commit in that mode
    modes = [
        draw(st.sampled_from(["mor", "cow", "mor", "cow", "wap-mor", "wap-cow"]))
        for _ in range(n_batches)
    ]
    wal = offset_mode == "unique" and draw(st.booleans())
    # random MAINTENANCE interleavings between batches: a fold, a
    # bucket-count change, or a z-order clustered rewrite must never
    # alter the resolved state — the round-4 bug class was exactly a
    # mode/maintenance interleaving
    maint = [
        draw(
            st.sampled_from(
                [
                    None,
                    None,
                    "fold",
                    "rebucket4",
                    "rebucket1",
                    "zorder",
                    "zorder_inc",
                    "retention",
                    # rollback to an earlier snapshot, then REPLAY the
                    # undone batches: restored exactly-once state must
                    # re-apply them and reconverge (handled in the
                    # runners — it needs the batch context)
                    "rollback",
                ]
            )
        )
        for _ in range(n_batches)
    ]
    return order, n_batches, modes, offset_mode, wal, maint


def python_oracle(events):
    """Pure-python row LWW with tombstones: winner per key by (ts, event_id)."""
    state: dict[str, tuple] = {}
    for eid, op, key, ts_s, _sets, _off in events:
        cur = state.get(key)
        cand = (ts_s, eid, op)
        if cur is None or cand[:2] > cur[:2]:
            state[key] = cand
    return {
        key: (ts, eid)
        for key, (ts, eid, op) in state.items()
        if op != "delete"
    }


def _html(eid):
    return f"<p>{eid} body</p>".encode()


def python_cell_oracle(events):
    """Pure-python per-cell LWW (the operators/patch.py spec, restated).

    Cells: html (+ derived text), lang.  A patch determines exactly its
    named cells (html ⇒ text); full images and deletes determine all;
    row existence from the newest event overall.  Returns
    {url: (ts, event_id, text, lang)} for live rows.
    """
    per_key: dict[str, list] = {}
    for e in events:
        per_key.setdefault(e[2], []).append(e)
    out = {}
    for key, evs in per_key.items():
        newest = max(evs, key=lambda e: (e[3], e[0]))
        if newest[1] == "delete":
            continue

        def determines(e, cell):
            if e[1] == "patch":
                named = e[4] or []
                if cell == "text":
                    return "html" in named
                return cell in named
            return True  # full image / delete determines everything

        def resolved(cell):
            det = [e for e in evs if determines(e, cell)]
            if not det:
                return None
            w = max(det, key=lambda e: (e[3], e[0]))
            if w[1] == "delete":
                return None
            if cell in ("html", "text"):
                val = _html(w[0])
                return extract_text_bytes(val) if cell == "text" else val
            # lang: patches ship explicit values; full images in this
            # fixture always ship 'en'
            return "en"

        out[key] = (newest[3], newest[0], resolved("text"), resolved("lang"))
    return out


def to_rows(events):
    rows = []
    for eid, op, key, ts_s, _sets, off in events:
        html = None if op == "delete" else _html(eid)
        rows.append(
            (
                eid, op, key, BASE + dt.timedelta(seconds=ts_s), html, None,
                1, None, 0, off, "wal/p0.log", 0,
            )
        )
    return rows


def to_patch_rows(events):
    rows = []
    for eid, op, key, ts_s, sets, off in events:
        ship_html = op not in ("delete",) and (
            op != "patch" or (sets is not None and "html" in sets)
        )
        ship_lang = op not in ("delete",) and (
            op != "patch" or (sets is not None and "lang" in sets)
        )
        rows.append(
            (
                eid, op, key, BASE + dt.timedelta(seconds=ts_s),
                sets if op == "patch" else None,
                _html(eid) if ship_html else None,
                "en" if ship_lang else None,
                0, off, "wal/p0.log", 0,
            )
        )
    return rows


def _do_maint(table, op):
    """Between-batch maintenance: state-preserving by contract."""
    from aus_land_data_etl_spark.lake.merge import fold_deltas

    if op == "fold":
        fold_deltas(table, "event_id")
    elif op and op.startswith("rebucket"):
        table.rebucket(int(op[len("rebucket"):]))
    elif op == "zorder":
        # z-order clustered rewrite mid-stream: resolves (per-cell for
        # patch tables) + overwrites — later merges must still converge.
        # warc_ts+lang exercises both the numeric and the STRING
        # quantizer paths (lake/zorder.py _rank_expr).
        from aus_land_data_etl_spark.lake.zorder import cluster_zorder

        cluster_zorder(table, ["warc_ts", "lang"], bits=3, files_per_bucket=2)
    elif op == "zorder_inc":
        # bucket-scoped incremental z-order: fanout deltas cluster first,
        # every non-empty bucket re-clusters via the copy-on-write
        # commit_buckets path (schema aligned so surviving deltas stay
        # readable — the round-4 bug class)
        from aus_land_data_etl_spark.lake.zorder import cluster_zorder_buckets

        cluster_zorder_buckets(
            table, ["warc_ts", "lang"], min_files=1, bits=3, files_per_bucket=2
        )
    elif op == "retention":
        # retention + failure cleanup mid-stream: expiring history and
        # sweeping unreferenced files (grace 0 = everything eligible)
        # must never touch the live snapshot's files — later merges,
        # resolution and metadata aggregates all still converge.
        table.expire_snapshots(keep_last=1)
        table.vacuum_orphans(grace_seconds=0.0)


def _check_metadata_aggs(table, live_ts_by_url):
    """Metadata-first COUNT and MIN/MAX(warc_ts) must be exact for the
    serving view of ANY history the engine can produce — folds,
    rebuckets, z-order rewrites, CoW/MoR mode mixes, live delta stacks
    (which route to the documented fallback but must stay exact)."""
    from aus_land_data_etl_spark.lake.metadata_agg import (
        count_current,
        minmax_current,
    )

    cp = count_current(table)
    assert cp.count == len(live_ts_by_url), (cp, live_ts_by_url)
    bp = minmax_current(table, "warc_ts")
    if live_ts_by_url:
        want_lo = BASE + dt.timedelta(seconds=min(live_ts_by_url.values()))
        want_hi = BASE + dt.timedelta(seconds=max(live_ts_by_url.values()))
        assert bp.lo == want_lo and bp.hi == want_hi, (bp, want_lo, want_hi)
        assert bp.count_nonnull == len(live_ts_by_url)
    else:
        assert bp.lo is None and bp.hi is None and bp.count_nonnull == 0, bp


def _rollback_and_replay(table, vers_after, applied, i, apply_fn, wal):
    """Roll the table back to the snapshot recorded after batch j ≤ i,
    then replay batches j+1..i with their original epochs/modes.  The
    restored offset watermarks / epoch window must let the replay
    genuinely re-apply (not no-op), reconverging to the state after
    batch i — so the caller's end-state oracle is unchanged.  A
    preceding retention op may have expired the target descriptor;
    rollback then raises and the op degrades to a no-op (the same
    contract a production rollback has: only retained snapshots are
    targets)."""
    j = i // 2
    try:
        table.rollback_to(vers_after[j])
    except FileNotFoundError:
        return
    for bdf, epoch, mode in applied[j + 1 : i + 1]:
        _apply_in_mode(table, apply_fn, bdf, epoch, mode, wal)


def _apply_in_mode(table, apply_fn, batch, epoch, mode, wal):
    """Direct commit, or stage-on-branch-then-publish for ``wap-*``
    modes — either way the table must end in the same state."""
    if mode.startswith("wap-"):
        name = f"w{epoch}"
        br = table.create_branch(name)
        try:
            apply_fn(br, batch, epoch=epoch, mode=mode[4:], wal_offsets=wal)
            table.publish_branch(name)
        except BaseException:
            try:
                table.drop_branch(name)
            except FileNotFoundError:
                pass
            raise
    else:
        apply_fn(table, batch, epoch=epoch, mode=mode, wal_offsets=wal)


def _run_row_log(spark, tmp_path_factory, log):
    events, n_batches, modes, _offset_mode, wal, *rest = log
    maint = rest[0] if rest else [None] * n_batches
    d = str(tmp_path_factory.mktemp("prop"))
    table = create_pages_table(spark, d, n_buckets=2)
    df = spark.createDataFrame(to_rows(events), EVENT_SCHEMA)
    vers_after, applied = [], []
    for i in range(n_batches):
        batch = df.filter(F.pmod(F.xxhash64("event_id"), F.lit(n_batches)) == i)
        _apply_in_mode(table, apply_batch, batch, i, modes[i], wal)
        applied.append((batch, i, modes[i]))
        vers_after.append(table.current_version())
        if maint[i] == "rollback":
            _rollback_and_replay(table, vers_after, applied, i, apply_batch, wal)
        else:
            _do_maint(table, maint[i])
    got = {
        r["url"]: ((r["warc_ts"] - BASE).total_seconds(), r["event_id"])
        for r in read_current(table).collect()
    }
    assert got == python_oracle(events)
    _check_metadata_aggs(table, {k: v[0] for k, v in got.items()})


def _run_patch_log(spark, tmp_path_factory, log):
    events, n_batches, modes, _offset_mode, wal, *rest = log
    maint = rest[0] if rest else [None] * n_batches
    d = str(tmp_path_factory.mktemp("propp"))
    table = create_pages_table(spark, d, n_buckets=2)
    df = spark.createDataFrame(to_patch_rows(events), PATCH_EVENT_SCHEMA)
    vers_after, applied = [], []
    for i in range(n_batches):
        batch = df.filter(F.pmod(F.xxhash64("event_id"), F.lit(n_batches)) == i)
        _apply_in_mode(table, apply_patch_batch, batch, i, modes[i], wal)
        applied.append((batch, i, modes[i]))
        vers_after.append(table.current_version())
        if maint[i] == "rollback":
            _rollback_and_replay(
                table, vers_after, applied, i, apply_patch_batch, wal
            )
        else:
            _do_maint(table, maint[i])
    got = {
        r["url"]: (
            (r["warc_ts"] - BASE).total_seconds(),
            r["event_id"],
            r["text"],
            r["lang"],
        )
        for r in read_current(table).collect()
    }
    assert got == python_cell_oracle(events)
    _check_metadata_aggs(table, {k: v[0] for k, v in got.items()})


@settings(max_examples=6, derandomize=True, **_PROFILE_COMMON)
@given(event_logs())
def test_engine_matches_python_oracle_deterministic(
    spark, tmp_path_factory, log
):
    _run_row_log(spark, tmp_path_factory, log)


#: Round-4 falsifying example (shrunk): a patch that determines NOTHING
#: (_set_cols=[]) lands as an unfolded MoR fanout delta, then an OLDER
#: full image for the same key arrives in a CoW batch.  The CoW commit
#: used to drop _set_cols from the snapshot schema while the fanout
#: delta survived, so the patch re-read as a full image and nulled
#: text/lang.  xxhash64 routing: e000→batch0 (mor), e001→batch1 (cow).
_R4_COW_AFTER_MOR_LOG = (
    [
        ("e000", "patch", KEYS[0], 35, [], 0),
        ("e001", "update", KEYS[0], 33, None, 1),
    ],
    2,
    ["mor", "cow"],
    "unique",
    False,
)


#: Round-5 pinned interleaving: the round-4 bug shape with a Z-ORDER
#: clustered rewrite as the maintenance op — a nothing-determining patch
#: lands as a MoR fanout delta, the z-order rewrite resolves+overwrites
#: (per-cell) while that delta is live, then an OLDER full image arrives.
#: The rewrite must bake the patch's cell ownership (_cvers) into the new
#: base or the older image would steal cells it lost.
_R5_ZORDER_AFTER_MOR_LOG = (
    [
        ("e000", "patch", KEYS[0], 35, [], 0),
        ("e001", "update", KEYS[0], 33, None, 1),
    ],
    2,
    ["mor", "cow"],
    "unique",
    False,
    ["zorder", None],
)

#: Same shape through the BUCKET-SCOPED incremental path (commit_buckets
#: + _align_to instead of a full overwrite).
_R5_ZORDER_INC_AFTER_MOR_LOG = (
    _R5_ZORDER_AFTER_MOR_LOG[0],
    2,
    ["mor", "cow"],
    "unique",
    False,
    ["zorder_inc", None],
)


@settings(max_examples=5, derandomize=True, **_PROFILE_COMMON)
@given(event_logs(with_patches=True))
@example(_R4_COW_AFTER_MOR_LOG)
@example(_R5_ZORDER_AFTER_MOR_LOG)
@example(_R5_ZORDER_INC_AFTER_MOR_LOG)
def test_patch_engine_matches_cell_oracle_deterministic(
    spark, tmp_path_factory, log
):
    _run_patch_log(spark, tmp_path_factory, log)


@pytest.mark.slow
@settings(max_examples=12, **_PROFILE_COMMON)
@given(event_logs())
def test_engine_matches_python_oracle(spark, tmp_path_factory, log):
    _run_row_log(spark, tmp_path_factory, log)


@pytest.mark.slow
@settings(max_examples=10, **_PROFILE_COMMON)
@given(event_logs(with_patches=True))
def test_patch_engine_matches_cell_oracle(spark, tmp_path_factory, log):
    _run_patch_log(spark, tmp_path_factory, log)


# ---------------------------------------------------------------------------
# Pinned deterministic regressions (judge round-3 + round-4 shrinks) — these
# do NOT depend on the .hypothesis example database.
# ---------------------------------------------------------------------------


def test_regression_content_key_ignores_tiebreak(spark, tmp_path_factory):
    """Round-3 judge repro: two distinct inserts sharing (url, warc_ts, op)
    and source offset 0, applied as two epochs.  With event_id missing
    from the manifest row hash both batches carried identical content
    keys, the second was falsely skipped, and the LWW winner was e000
    instead of the correct tiebreak winner e001."""
    events = [
        ("e000", "insert", KEYS[0], 0, None, 0),
        ("e001", "insert", KEYS[0], 0, None, 0),
    ]
    _run_row_log(spark, tmp_path_factory, (events, 2, ["mor", "mor"], "degenerate", False))


def test_regression_checksum_xor_self_cancellation(spark, tmp_path_factory):
    """Round-4 shrink: at-least-once duplicates within one batch xor the
    row hash to 0, so batch {e000,e000} and batch {e001,e001} collided
    under the xor checksum and the second was falsely skipped.  The
    multiset (sum mod 2^64) checksum keeps k copies distinct from k
    copies of a different row."""
    events = [
        ("e000", "insert", KEYS[0], 0, None, 0),
        ("e001", "insert", KEYS[0], 0, None, 0),
        ("e000", "insert", KEYS[0], 0, None, 0),
        ("e001", "insert", KEYS[0], 0, None, 0),
    ]
    _run_row_log(spark, tmp_path_factory, (events, 2, ["mor", "mor"], "degenerate", False))


def test_regression_cow_patch_preserves_live_delta_schema(
    spark, tmp_path_factory
):
    """Round-4 judge repro (2 events, 2 batches): ``e000 patch ts=35
    _set_cols=[]`` applied MoR leaves a fanout delta; ``e001 update
    ts=33`` applied CoW then committed a snapshot schema WITHOUT
    ``_set_cols`` (resolve_cells had consumed it) while that delta was
    still live.  Re-reads imposed the new schema on the old delta file,
    ``_set_cols`` vanished, and the determine-nothing patch replayed as
    a full image — final row ``(35, e000, NULL, NULL)`` instead of
    ``(35, e000, 'e001 body', 'en')``.  merge_patch_into now aligns the
    committed schema to the pre-merge snapshot's (fold_deltas' guard),
    and commit_buckets refuses to drop columns live deltas carry."""
    _run_patch_log(spark, tmp_path_factory, _R4_COW_AFTER_MOR_LOG)


def test_regression_identical_replay_still_skips(spark, tmp_path_factory):
    """The inverse guard: a byte-identical batch replayed under a fresh
    epoch id must STILL be recognised by its content key (commit no-op) —
    the collision fix must not have destroyed the dedup that content
    keying exists for."""
    events = [
        ("e000", "insert", KEYS[0], 0, None, 0),
        ("e001", "update", KEYS[1], 5, None, 0),
    ]
    d = str(tmp_path_factory.mktemp("propr"))
    table = create_pages_table(spark, d, n_buckets=2)
    df = spark.createDataFrame(to_rows(events), EVENT_SCHEMA)
    v1 = apply_batch(table, df, epoch=0)
    v2 = apply_batch(table, df, epoch=1)  # identical content, new epoch id
    assert v2 == v1  # replayed batch: no new commit
    assert read_current(table).count() == 2
