#!/usr/bin/env python
"""Dedup-index soak (round 5): the persisted incremental LSH near-dup
index fed the FULL insert/update/delete shape of a real CDC feed at
~250× its unit-test scale.

Flow: a generated change stream (hot-domain skew, duplicates, deletes,
disorder) lands in the lake through exactly-once batches; a durable
changelog subscription maps each net interval onto the index — deletes
→ ``remove``, updates → ``remove`` (old text) + ``add`` (new text),
inserts → ``add`` — so the index tracks the serving view continuously.
After the stream drains, ``compact`` purges tombstoned/stale rows and
the gates assert the index IS the corpus:

1. the purged signature set holds exactly the live urls (count + set);
2. a probe batch of live documents answers IDENTICALLY to a fresh
   ``build`` over the final live corpus (same hash family, so equality
   is exact, not approximate);
3. per-cycle cost stayed O(batch): the band probe read only the bucket
   partitions the batch's hashes landed in (spot-asserted via the
   partition filter in the executed plan).

Writes one JSON line to stdout and SOAK_INDEX_r05.json at the repo
root.  Usage: python scripts/soak_index.py [n_events] [cores]
Defaults: 120_000, 32.
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
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_batches = 8

    from pyspark.sql import functions as F

    from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
    from aus_land_data_etl_spark.cdc.generator import generate_events
    from aus_land_data_etl_spark.lake.changelog import ChangelogSubscription
    from aus_land_data_etl_spark.lake.merge import read_current
    from aus_land_data_etl_spark.operators.neardup_index import NearDupIndex
    from aus_land_data_etl_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("soak-index", cores=cores, shuffle_partitions=cores)
    work = tempfile.mkdtemp(prefix="soaki_")
    result: dict = {"n_events": n_events, "cores": cores}
    try:
        ev = generate_events(spark, n_events, seed=91)
        t = create_pages_table(spark, os.path.join(work, "lake"), n_buckets=16)
        idx = NearDupIndex.create(
            spark,
            os.path.join(work, "ndi"),
            k=16,
            n_bands=4,
            shingle_n=5,
            seed=42,
            n_buckets=32,
            id_type="string",
        )
        sub = ChangelogSubscription(
            t, os.path.join(work, "cursor.json"), start_at="origin"
        )

        n_add = n_rm = 0
        t_index = 0.0
        for e in range(n_batches):
            apply_batch(
                t,
                ev.filter(F.pmod(F.col("source_pos"), F.lit(n_batches)) == e),
                epoch=e,
            )
            got = sub.poll()
            if got is None:
                continue
            df, target = got
            df = df.localCheckpoint(eager=True)
            ti = time.time()
            stale = (
                df.filter(F.col("change_type").isin(["delete", "update"]))
                .select(F.col("url").alias("doc_id"))
            )
            if stale.count():
                idx.remove(stale)
                n_rm += 1
            upserts = df.filter(F.col("change_type") != "delete").select(
                "url", "text"
            )
            if upserts.count():
                idx.add(upserts, id_col="url", text_col="text")
                n_add += 1
            t_index += time.time() - ti
            sub.ack(target)

        result["intervals_added"] = n_add
        result["intervals_removed"] = n_rm
        result["index_feed_secs"] = round(t_index, 1)

        ti = time.time()
        idx.compact()
        result["compact_secs"] = round(time.time() - ti, 1)

        live = read_current(t).select("url", "text").localCheckpoint(eager=True)
        n_live = live.count()
        result["live_docs"] = n_live
        sig_ids = idx.sigs().select("doc_id").distinct()
        result["index_docs"] = sig_ids.count()
        missing = (
            live.select(F.col("url").alias("doc_id"))
            .join(sig_ids, "doc_id", "left_anti")
            .count()
        )
        extra = (
            sig_ids.join(
                live.select(F.col("url").alias("doc_id")), "doc_id", "left_anti"
            ).count()
        )
        result["docs_missing_from_index"] = missing
        result["docs_extra_in_index"] = extra
        assert missing == 0 and extra == 0

        # probe equality vs a fresh build over the live corpus
        fresh = NearDupIndex.build(
            live,
            os.path.join(work, "fresh"),
            id_col="url",
            text_col="text",
            k=16,
            n_bands=4,
            shingle_n=5,
            seed=42,
            n_buckets=32,
            id_type="string",
        )
        probe = live.orderBy("url").limit(100).localCheckpoint(eager=True)

        ti = time.time()
        p_inc = idx.candidates_for(
            probe, id_col="url", text_col="text"
        ).localCheckpoint(eager=True)
        result["probe_secs"] = round(time.time() - ti, 1)
        p_fresh = fresh.candidates_for(
            probe, id_col="url", text_col="text"
        ).localCheckpoint(eager=True)
        result["probe_pairs"] = p_inc.count()
        diff = p_inc.exceptAll(p_fresh).count() + p_fresh.exceptAll(p_inc).count()
        result["probe_pair_diff_vs_fresh_build"] = diff
        result["probe_equal_fresh_build"] = diff == 0
        assert diff == 0

        # plan spot-check: the probe read carries the bucket partition filter
        one = live.limit(1)
        sigs1 = idx._signatures(one, "url", "text", idx.current_gen() + 1)
        probed = sorted(
            r["bucket"]
            for r in idx._bands_with_bucket(sigs1).select("bucket").distinct().collect()
        )
        plan_df = idx.bands().filter(F.col("bucket").isin(probed))
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        result["probe_partition_filtered"] = "PartitionFilters: [bucket" in plan
        assert result["probe_partition_filtered"]

        result["wall_secs"] = round(time.time() - t0, 1)
        result["ok"] = True
        line = json.dumps(result)
        print(line)
        with open(os.path.join(_REPO, "SOAK_INDEX_r05.json"), "w") as f:
            f.write(line + "\n")
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
