#!/usr/bin/env python
"""Ops-tier soak (round 5): the operational surfaces composed at ~100×
correctness-fixture scale on one table lifecycle — write-audit-publish
branch staging, tag-anchored rollback + stream replay, dead-letter
drain after a registry upgrade, retention + vacuum with tags live, and
a durable changelog subscription mirroring EVERY interval (direct
commits, a branch publish, a rollback, the replay, the dlq drain).

Stream shape: three WAL segments with CONTINUED binlog positions
(``offset_base``) — a real binlog never restarts at 0:

  A  direct exactly-once batches (mor) + a mid-stream fold, then tag
     ``post-A``;
  B  staged entirely on branch ``segB`` (main must not move), ~2% of
     its rows carrying an UNKNOWN schema_version → quarantined to the
     dead-letter store during staging; published atomically, tag
     ``post-B``;
  C  direct batches — then the "bad deploy" flow: rollback to
     ``post-B`` (metadata-only, exactly-once state restored) and replay
     every C batch from the WAL; the state must be byte-identical to
     the pre-rollback fingerprint;
  +  ``replay_dead_letters`` under a registry that learned the unknown
     version → quarantine drains, rows land;
  +  final fold, ``expire_snapshots`` (tags anchor retention),
     ``vacuum_orphans`` grace 0, metadata-only COUNT == live rows.

Final gate: DuckDB LWW oracle over the union of all three segments
(including the once-quarantined rows) == the table's live view, and the
subscription mirror == the live view.

Writes one JSON line to stdout and SOAK_OPS_r05.json at the repo root.
Usage: python scripts/soak_ops.py [n_events_total] [cores]
Defaults: 600_000, 32.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_a, n_b = n_total // 2, n_total // 4
    n_c = n_total - n_a - n_b

    import duckdb
    from pyspark.sql import functions as F

    from aus_land_data_etl_spark.cdc.apply import (
        apply_batch,
        create_pages_table,
        read_dead_letters,
        replay_dead_letters,
    )
    from aus_land_data_etl_spark.cdc.generator import generate_events
    from aus_land_data_etl_spark.cdc.registry import SchemaRegistry
    from aus_land_data_etl_spark.lake.changelog import ChangelogSubscription
    from aus_land_data_etl_spark.lake.merge import fold_deltas, read_current
    from aus_land_data_etl_spark.lake.metadata_agg import count_current
    from aus_land_data_etl_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("soak-ops", cores=cores, shuffle_partitions=cores)
    work = tempfile.mkdtemp(prefix="soako_")
    result: dict = {"n_events": n_total, "cores": cores}
    try:
        seg_a = generate_events(spark, n_a, seed=42)
        seg_b = generate_events(spark, n_b, seed=43, offset_base=n_a).withColumn(
            "schema_version",
            F.when(
                F.pmod(F.col("source_pos"), F.lit(50)) == 0, F.lit(99)
            ).otherwise(F.col("schema_version")),
        )
        seg_c = generate_events(spark, n_c, seed=44, offset_base=n_a + n_b)
        n_poison = seg_b.filter(F.col("schema_version") == 99).count()
        result["poisoned_rows"] = n_poison

        root = os.path.join(work, "tbl")
        table = create_pages_table(spark, root, n_buckets=16)
        table.set_properties({"stats_cols": ["warc_ts"]})

        # subscription mirror across EVERY interval kind
        sub = ChangelogSubscription(
            table, os.path.join(work, "cursor.json"), start_at="origin"
        )
        mirror: dict = {}

        def consume():
            got = sub.poll()
            if got is None:
                return
            df, target = got
            for r in df.select(
                "change_type", "url", "warc_ts", "event_id"
            ).collect():
                if r["change_type"] == "delete":
                    mirror.pop(r["url"], None)
                else:
                    mirror[r["url"]] = (str(r["warc_ts"]), r["event_id"])
            sub.ack(target)

        # ---- segment A: direct batches + fold, tag ------------------------
        for i in range(8):
            b = seg_a.filter(F.pmod(F.col("source_pos"), F.lit(8)) == i)
            apply_batch(table, b, epoch=f"a{i}", mode="mor", compact_depth=6)
            if i == 4:
                fold_deltas(table, "event_id")
            consume()
        table.tag("post-A")
        main_after_a = table.current_version()

        # ---- segment B: staged on a branch, quarantine, publish -----------
        br = table.create_branch("segB")
        for i in range(4):
            b = seg_b.filter(F.pmod(F.col("source_pos"), F.lit(4)) == i)
            apply_batch(br, b, epoch=f"b{i}", mode="mor", compact_depth=6)
        assert table.current_version() == main_after_a, "staging leaked to main"
        assert sub.poll() is None, "subscriber saw staged commits"
        staged_rows = read_current(br).count()
        result["staged_rows_at_publish"] = staged_rows
        table.publish_branch("segB")
        consume()  # ONE net interval for the whole publish
        table.tag("post-B")
        result["dead_letters_after_B"] = read_dead_letters(table).count()
        assert result["dead_letters_after_B"] == n_poison

        # ---- segment C, then the bad-deploy flow: rollback + replay -------
        for i in range(4):
            b = seg_c.filter(F.pmod(F.col("source_pos"), F.lit(4)) == i)
            apply_batch(table, b, epoch=f"c{i}", mode="mor", compact_depth=6)
            consume()

        def fp():
            r = read_current(table).select(
                F.bit_xor(
                    F.xxhash64("url", F.col("warc_ts").cast("string"), "event_id")
                ).alias("h"),
                F.count("*").alias("n"),
            ).collect()[0]
            return (int(r["h"] or 0), int(r["n"]))

        before_rb = fp()
        table.rollback_to("post-B")
        consume()  # the undo interval
        for i in range(4):  # replay C from the WAL — must re-apply
            b = seg_c.filter(F.pmod(F.col("source_pos"), F.lit(4)) == i)
            apply_batch(table, b, epoch=f"c{i}", mode="mor", compact_depth=6)
            consume()
        after_replay = fp()
        result["rollback_replay_reconverged"] = after_replay == before_rb
        assert after_replay == before_rb

        # ---- dead-letter drain under the upgraded registry ----------------
        knows = SchemaRegistry(versions=(1, 2, 3, 4, 99))
        drained = replay_dead_letters(table, registry=knows)
        consume()
        result["dlq_replayed"] = drained["replayed"]
        result["dlq_still_dead"] = drained["still_dead"]
        assert drained["replayed"] == n_poison and drained["still_dead"] == 0
        assert read_dead_letters(table).count() == 0

        # ---- maintenance: fold, retention (tags anchor), vacuum -----------
        fold_deltas(table, "event_id")
        consume()  # fold is a no-op interval for the mirror
        table.expire_snapshots(keep_last=2)
        table.vacuum_orphans(grace_seconds=0.0)
        assert table.snapshot(table.resolve_ref("post-A")).version >= 0
        result["final_version"] = table.current_version()
        result["tags"] = table.tags()

        # ---- DuckDB LWW oracle over ALL segments --------------------------
        all_ev = seg_a.unionByName(seg_b).unionByName(seg_c)
        meta_dir = os.path.join(work, "event_meta")
        all_ev.select(
            "url",
            F.col("warc_ts").cast("string").alias("warc_ts"),
            "event_id",
            "op",
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
        con.close()
        final = (
            read_current(table)
            .select(
                "url",
                F.col("warc_ts").cast("string").alias("warc_ts"),
                "event_id",
            )
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        result["final_rows"] = len(final)
        result["oracle_rows"] = len(oracle)
        same = (
            len(final) == len(oracle)
            and (final["url"].values == oracle["url"].values).all()
            and (final["warc_ts"].values == oracle["warc_ts"].values).all()
            and (final["event_id"].values == oracle["event_id"].values).all()
        )
        result["duckdb_oracle_match"] = bool(same)
        assert same

        # ---- mirror == live view ------------------------------------------
        live = {
            u: (ts, eid)
            for u, ts, eid in final[["url", "warc_ts", "event_id"]].itertuples(
                index=False, name=None
            )
        }
        result["mirror_rows"] = len(mirror)
        result["mirror_match"] = mirror == live
        assert result["mirror_match"]

        # ---- metadata-only COUNT over the final folded state --------------
        cp = count_current(table)
        result["metadata_count"] = cp.count
        result["metadata_count_scanned_files"] = len(cp.scanned_files)
        assert cp.count == len(final)

        result["wall_secs"] = round(time.time() - t0, 1)
        result["events_per_sec"] = round(n_total / result["wall_secs"], 1)
        result["ok"] = True
        line = json.dumps(result)
        print(line)
        with open(os.path.join(_REPO, "SOAK_OPS_r05.json"), "w") as f:
            f.write(line + "\n")
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
