#!/usr/bin/env bash
# End-to-end `spark-submit --py-files` packaging smoke (north rule:
# "packaged for spark-submit --py-files").
#
# Runs OUTSIDE the repo working directory with only the built zip on
# --py-files, so every `aus_land_data_etl_spark.*` import must resolve
# from the zip — proving the package is self-contained the way a real
# cluster submit requires.  Pipeline: generate a deterministic WAL →
# streaming ingest (checkpointed, exactly-once) → compact → re-ingest
# the same WAL (replay must be a no-op) -> incremental z-order -> audit.
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
bash scripts/package.sh >/dev/null
ZIP="$REPO/dist/aus_land_data_etl_spark.zip"
CORES="${SMOKE_CORES:-8}"
N_EVENTS="${SMOKE_EVENTS:-50000}"

WORK="$(mktemp -d /tmp/submit_smoke.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT
cp aus_land_data_etl_spark/cli.py "$WORK/driver.py"
cd "$WORK"

SUBMIT=(spark-submit --master "local[$CORES]" --py-files "$ZIP")

"${SUBMIT[@]}" driver.py generate \
    --wal "$WORK/wal" --table "$WORK/tbl" --n-events "$N_EVENTS" \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_generate.json"

"${SUBMIT[@]}" driver.py ingest \
    --wal "$WORK/wal" --table "$WORK/tbl" --checkpoint "$WORK/ckpt" \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_ingest.json"

# replay from a FRESH checkpoint: exactly-once sink must apply 0 new rows
# and commit no new snapshot
"${SUBMIT[@]}" driver.py ingest \
    --wal "$WORK/wal" --table "$WORK/tbl" --checkpoint "$WORK/ckpt2" \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_replay.json"

"${SUBMIT[@]}" driver.py compact \
    --table "$WORK/tbl" --cores "$CORES" 2>/dev/null \
    | tail -1 | tee "$WORK/out_compact.json"

# anchor the post-compact snapshot: the tag must survive the keep-last-1
# vacuum below and remain a valid rollback target at the end
"${SUBMIT[@]}" driver.py tag \
    --table "$WORK/tbl" --name post-compact \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_tag.json"

"${SUBMIT[@]}" driver.py zorder \
    --table "$WORK/tbl" --zorder-cols warc_ts,lang --incremental \
    --min-files 1 --files-per-bucket 2 \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_zorder.json"

"${SUBMIT[@]}" driver.py audit \
    --table "$WORK/tbl" --cores "$CORES" 2>/dev/null \
    | tail -1 | tee "$WORK/out_audit.json"

# metadata-first COUNT: after compact+zorder the count must come from
# manifests alone (zero files opened) and equal the ingest's live count
"${SUBMIT[@]}" driver.py stats \
    --table "$WORK/tbl" --cores "$CORES" 2>/dev/null \
    | tail -1 | tee "$WORK/out_stats.json"

# retention + orphan cleanup must reclaim the superseded pre-zorder
# files and leave the serving view (and its metadata count) intact
"${SUBMIT[@]}" driver.py vacuum \
    --table "$WORK/tbl" --keep-last 1 --grace-hours 0 \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_vacuum.json"

"${SUBMIT[@]}" driver.py stats \
    --table "$WORK/tbl" --cores "$CORES" 2>/dev/null \
    | tail -1 | tee "$WORK/out_stats2.json"

# the tagged snapshot outlived keep-last-1 retention: roll back to it
# (metadata-only) and the serving view must still hold every page
"${SUBMIT[@]}" driver.py rollback \
    --table "$WORK/tbl" --to post-compact \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_rollback.json"

# write-audit-publish: stage a second WAL segment (continued binlog
# positions) on a branch — main must not move — then publish
"${SUBMIT[@]}" driver.py branch \
    --table "$WORK/tbl" --create --name cand \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_brcreate.json"

"${SUBMIT[@]}" driver.py generate \
    --wal "$WORK/wal2" --table "$WORK/tbl" --n-events 20000 --seed 7 \
    --offset-base "$N_EVENTS" \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_generate2.json"

"${SUBMIT[@]}" driver.py ingest \
    --wal "$WORK/wal2" --table "$WORK/tbl" --checkpoint "$WORK/ckpt3" \
    --branch cand \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_bringest.json"

"${SUBMIT[@]}" driver.py stats \
    --table "$WORK/tbl" --cores "$CORES" 2>/dev/null \
    | tail -1 | tee "$WORK/out_stats_main.json"

"${SUBMIT[@]}" driver.py branch \
    --table "$WORK/tbl" --publish --name cand \
    --cores "$CORES" 2>/dev/null | tail -1 | tee "$WORK/out_brpublish.json"

python3 - "$WORK" <<'EOF'
import json, sys
w = sys.argv[1]
ing = json.load(open(f"{w}/out_ingest.json"))
rep = json.load(open(f"{w}/out_replay.json"))
comp = json.load(open(f"{w}/out_compact.json"))
zo = json.load(open(f"{w}/out_zorder.json"))
aud = json.load(open(f"{w}/out_audit.json"))
st = json.load(open(f"{w}/out_stats.json"))
vac = json.load(open(f"{w}/out_vacuum.json"))
st2 = json.load(open(f"{w}/out_stats2.json"))
assert ing["live_pages"] > 0, ing
assert aud["contiguous"] is True and aud["missing_offsets"] == 0, aud
assert aud["dead_letters"] == 0, aud
assert rep["live_pages"] == ing["live_pages"], (ing, rep)
assert rep["snapshot"] == ing["snapshot"], (ing, rep)
assert comp["snapshot"] > ing["snapshot"], (ing, comp)
assert zo["snapshot"] > comp["snapshot"] and zo["incremental"], zo
assert zo["n_files"] > 0, zo
assert st["count"] == ing["live_pages"], (st, ing)
assert st["count_plan"]["scanned_files"] == 0, st
assert st["count_plan"]["fallback"] is False, st
assert vac["data_files"] > 0, vac
assert st2["count"] == ing["live_pages"], (st2, ing)
assert st2["count_plan"]["scanned_files"] == 0, st2
tag = json.load(open(f"{w}/out_tag.json"))
rb = json.load(open(f"{w}/out_rollback.json"))
# compact mode may commit twice (data rewrite + manifest merge): the tag
# names whatever the current snapshot is at tag time
assert tag["version"] >= comp["snapshot"], (tag, comp)
assert rb["snapshot"] > st2["snapshot"], (rb, st2)
assert rb["live_pages"] == ing["live_pages"], (rb, ing)
bring = json.load(open(f"{w}/out_bringest.json"))
stm = json.load(open(f"{w}/out_stats_main.json"))
pub = json.load(open(f"{w}/out_brpublish.json"))
assert bring["rows"] > 0, bring  # segment 2 genuinely applied on the branch
assert stm["count"] == ing["live_pages"], (stm, ing)  # staged invisible
assert pub["live_pages"] == bring["live_pages"], (pub, bring)
assert pub["snapshot"] == rb["snapshot"] + 1, (pub, rb)  # metadata-only ff
print(json.dumps({"submit_smoke": "ok", "live_pages": ing["live_pages"],
                  "stats_count_metadata_only": True,
                  "vacuum_reclaimed_files": vac["data_files"],
                  "ingest_batches": ing["batches"],
                  "replay_noop": True, "audit_contiguous": True,
                  "zorder_files": zo["n_files"]}))
EOF
