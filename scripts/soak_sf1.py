#!/usr/bin/env python
"""sf1 soak: the full CDC maintenance machinery composed at ~10x bench
scale (round-3 verdict #8).

One run drives >=2M events through >=16 streaming micro-batches in four
WAL tranches over ONE checkpoint lineage, with — all live at once —
  - leveled delta folds across compact_depth (MoR default path),
  - auto expire_snapshots + vacuum_orphans on the maintenance tick,
  - an inline incrementally-maintained AggView (refreshed per batch),
  - a durable ChangelogSubscription consumer polled between tranches,
    mirroring net changes into its own keyed sink,
  - (round 5) incremental Z-ORDER maintenance: a bucket-scoped
    ``cluster_zorder_buckets`` after tranche 1 with the AggView and the
    subscription live (the changelog must emit a NO-OP across it — the
    mirror and the view would drift otherwise), and a final full-depth
    pass; the run then asserts a warc_ts window prunes files,
then audits the lineage trail (no offset gaps/overlaps, contiguous
coverage) and verifies convergence three ways:
  1. final table LWW winners == a DuckDB oracle over the raw event
     metadata (url, warc_ts, event_id), value-compared;
  2. the subscription mirror == the final live view (same winners);
  3. the AggView == a full recompute over the final table;
  4. per-row text == extraction of the winning event's html bytes
     (the byte-identical text-per-url invariant, checked exhaustively).

Writes one JSON line to stdout and SOAK_r05.json at the repo root.

Usage: python scripts/soak_sf1.py [n_events] [cores]
Defaults: 2_000_000 events, 32 cores (local[32]).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_tranches = 4
    files_per_tranche = 8
    max_files_per_trigger = 2  # -> 4 micro-batches per tranche, 16 total

    from pyspark.sql import functions as F

    from aus_land_data_etl_spark.cdc.apply import create_pages_table
    from aus_land_data_etl_spark.cdc.audit import coverage_summary, offset_gaps
    from aus_land_data_etl_spark.cdc.generator import generate_events
    from aus_land_data_etl_spark.functions.text import extract_text_udf
    from aus_land_data_etl_spark.lake.changelog import ChangelogSubscription
    from aus_land_data_etl_spark.lake.incremental import (
        AggSpec,
        AggView,
        full_compute,
    )
    from aus_land_data_etl_spark.lake.merge import read_current
    from aus_land_data_etl_spark.session import get_spark
    from aus_land_data_etl_spark.streaming.runner import (
        run_stream,
        write_event_log,
    )

    spark = get_spark("soak_sf1", cores=cores, shuffle_partitions=cores)
    root = tempfile.mkdtemp(prefix="soak_sf1_")
    result: dict = {"n_events": n_events, "cores": cores}
    t_all = time.monotonic()
    try:
        wal = os.path.join(root, "wal")
        ckpt = os.path.join(root, "ckpt")
        table = create_pages_table(
            spark, os.path.join(root, "pages"), n_buckets=32
        )
        view = AggView.create(
            spark,
            os.path.join(root, "mv"),
            table,
            keys=["grp"],
            aggs=[
                AggSpec("n_pages", "count"),
                AggSpec("sum_len", "sum", "tl"),
                AggSpec("avg_len", "avg", "tl"),
            ],
            derived={"grp": "pmod(xxhash64(url), 16)", "tl": "length(text)"},
            n_buckets=8,
        )
        sub = ChangelogSubscription(
            table, os.path.join(root, "cursor.json"), start_at="current"
        )
        mirror: dict[str, tuple] = {}  # url -> (warc_ts, event_id, text_h)

        events = generate_events(spark, n_events, seed=42)
        n_physical = events.count()
        result["n_physical_rows"] = n_physical
        per = n_events // n_tranches

        def drain_subscription() -> int:
            polled = sub.poll(materialize=False)
            if polled is None:
                return 0
            changes, v = polled
            rows = (
                changes.select(
                    "change_type",
                    "url",
                    F.col("warc_ts").cast("string").alias("warc_ts"),
                    "event_id",
                    F.xxhash64("text").alias("text_h"),
                )
            ).collect()
            for r in rows:
                if r["change_type"] == "delete":
                    mirror.pop(r["url"], None)
                else:  # insert/update net image
                    mirror[r["url"]] = (r["warc_ts"], r["event_id"], r["text_h"])
            sub.ack(v)
            return len(rows)

        batches = 0
        stream_secs = 0.0
        for t in range(n_tranches):
            lo, hi = t * per, (t + 1) * per if t < n_tranches - 1 else n_events
            tranche = events.filter(
                (F.col("source_pos") >= lo) & (F.col("source_pos") < hi)
            )
            write_event_log(tranche, wal, n_files=files_per_tranche)
            t0 = time.monotonic()
            res = run_stream(
                spark,
                table,
                wal,
                ckpt,
                max_files_per_trigger=max_files_per_trigger,
                views=[view],
                expire_every=8,
                expire_keep_last=12,
                vacuum_grace_seconds=0.0,  # vacuum eagerly inside the soak
            )
            stream_secs += time.monotonic() - t0
            batches += res.batches
            if t == 1:
                # mid-stream incremental z-order with the AggView + the
                # subscription cursor live: must be a changelog no-op
                from aus_land_data_etl_spark.lake.zorder import (
                    cluster_zorder_buckets,
                )

                cluster_zorder_buckets(
                    table, ["warc_ts", "lang"], min_files=2, bits=5,
                    files_per_bucket=2,
                )
            polled_rows = drain_subscription()
            print(
                f"tranche {t}: batches={res.batches} rows={res.rows} "
                f"version={res.final_version} mirror+={polled_rows}",
                file=sys.stderr,
            )
        result["micro_batches"] = batches
        result["stream_secs"] = round(stream_secs, 1)
        result["events_per_sec"] = round(n_physical / stream_secs, 1)
        # final full-depth incremental z-order, then the pruning claim:
        # LWW winners concentrate near the top of the warc_ts range, so
        # probe at the 95% mark (window must both keep and skip files)
        from aus_land_data_etl_spark.lake.zorder import cluster_zorder_buckets

        cluster_zorder_buckets(
            table, ["warc_ts", "lang"], min_files=1, bits=6,
            files_per_bucket=4,
        )
        polled_rows = drain_subscription()  # zorder diff must be empty
        result["mirror_rows_after_final_zorder"] = polled_rows
        view.refresh()  # O(changes)=0 across the zorder commit
        mnmx = table.read().agg(
            F.min("warc_ts").alias("mn"), F.max("warc_ts").alias("mx")
        ).first()
        cut = mnmx["mn"] + (mnmx["mx"] - mnmx["mn"]) * 19 // 20
        zo_kept, zo_skipped = table.plan_scan(
            predicates=[("warc_ts", "<", cut)]
        )
        result["zorder_files_kept"] = len(zo_kept)
        result["zorder_files_skipped"] = len(zo_skipped)
        result["final_version"] = table.current_version()
        snap = table.snapshot()
        result["delta_stacks_remaining"] = sum(
            len(v) for v in snap.delta_files.values()
        )

        # ---- lineage audit ------------------------------------------------
        gaps = offset_gaps(table).collect()
        result["offset_gap_kinds"] = sorted({r["kind"] for r in gaps})
        cov = coverage_summary(table).collect()
        result["coverage_partitions"] = len(cov)
        result["coverage_contiguous"] = all(r["contiguous"] for r in cov)
        result["rows_applied"] = int(sum(r["rows_applied"] for r in cov))
        assert result["offset_gap_kinds"] == [], gaps[:5]
        assert result["coverage_contiguous"]
        assert result["rows_applied"] == n_physical

        # ---- convergence vs DuckDB oracle --------------------------------
        import duckdb

        meta_dir = os.path.join(root, "event_meta")
        events.select(
            "url", F.col("warc_ts").cast("string").alias("warc_ts"),
            "event_id", "op",
        ).write.mode("overwrite").parquet(meta_dir)
        con = duckdb.connect()
        oracle = con.execute(
            f"""
            SELECT url, warc_ts, event_id FROM (
              SELECT url, CAST(warc_ts AS VARCHAR) AS warc_ts, event_id, op,
                     ROW_NUMBER() OVER (
                       PARTITION BY url
                       ORDER BY warc_ts DESC, event_id DESC) AS rn
              FROM read_parquet('{meta_dir}/*.parquet')
            ) WHERE rn = 1 AND op <> 'delete'
            ORDER BY url
            """
        ).df()
        final = (
            read_current(table)
            .select(
                "url",
                F.col("warc_ts").cast("string").alias("warc_ts"),
                "event_id",
                F.xxhash64("text").alias("text_h"),
            )
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        result["final_rows"] = len(final)
        result["oracle_rows"] = len(oracle)
        assert len(final) == len(oracle)
        same = (
            (final["url"].values == oracle["url"].values).all()
            and (final["warc_ts"].values == oracle["warc_ts"].values).all()
            and (final["event_id"].values == oracle["event_id"].values).all()
        )
        result["duckdb_oracle_match"] = bool(same)
        assert same

        # ---- subscription mirror == live view ----------------------------
        live = {
            url: (ts, eid, th)
            for url, ts, eid, th in final[
                ["url", "warc_ts", "event_id", "text_h"]
            ].itertuples(index=False, name=None)
        }
        result["mirror_rows"] = len(mirror)
        result["mirror_match"] = mirror == live
        assert result["mirror_match"]

        # ---- AggView == full recompute ------------------------------------
        def rows(df):
            return sorted(
                tuple(
                    round(v, 6) if isinstance(v, float) else v for v in r
                )
                for r in df.collect()
            )

        assert view.refreshed_through() == table.current_version()
        result["aggview_match"] = rows(view.read()) == rows(full_compute(view))
        assert result["aggview_match"]

        # ---- byte-identical text invariant (exhaustive) -------------------
        cur = read_current(table)
        mismatches = cur.filter(
            ~F.coalesce(
                extract_text_udf(F.col("html")).eqNullSafe(F.col("text")),
                F.lit(False),
            )
        ).count()
        result["text_invariant_mismatches"] = int(mismatches)
        assert mismatches == 0

        assert result["zorder_files_skipped"] > 0, "z-order window skipped nothing"
        assert result["zorder_files_kept"] > 0, "z-order window kept nothing"
        result["wall_secs"] = round(time.monotonic() - t_all, 1)
        result["ok"] = True
    finally:
        shutil.rmtree(root, ignore_errors=True)

    line = json.dumps(result)
    print(line)
    with open(os.path.join(_REPO, "SOAK_r05.json"), "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
