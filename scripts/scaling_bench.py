"""Two-parallelism scaling evidence (sandbox stand-in for N vs 4N executors).

The north rule requires change-apply throughput scaling efficiency ≥ 0.8
from N to 4N executors.  No real cluster exists in this sandbox, so — per
the driver's instruction — we run the *same* CDC apply job on the *same*
deterministic input at ``local[8]`` and ``local[32]`` (fresh JVM each, so
nothing is shared), and report events/s at both plus
``efficiency = (throughput_32 / throughput_8) / 4``.

Results are appended to BASELINE.md under "## Scaling evidence".

Usage: python scripts/scaling_bench.py [n_events] [low_cores] [high_cores]
"""

from __future__ import annotations

import json
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from aus_land_data_etl_spark.session import get_spark
from bench import bench_cdc

cores = {cores}
spark = get_spark("scaling-bench", cores=cores, shuffle_partitions=cores)
sec, n, _trials = bench_cdc(spark, {n_events}, n_batches={n_batches}, n_buckets={n_buckets}, trials=1)
print(json.dumps({{"cores": cores, "sec": round(sec, 3), "events": n,
                   "events_per_sec": round(n / sec, 1)}}))
"""


def run_at(cores: int, n_events: int, n_batches: int, n_buckets: int) -> dict:
    script = CHILD.format(
        repo=str(REPO), cores=cores, n_events=n_events,
        n_batches=n_batches, n_buckets=n_buckets,
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, cwd=str(REPO), check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    n_batches, n_buckets = 4, 32

    # The sandbox VM's effective CPU speed fluctuates (noisy neighbours):
    # alternate configs and keep the best trial per config — noise only
    # ever slows a run, so max-throughput is the faithful estimate.
    lows, highs = [], []
    for i in range(trials):
        lows.append(run_at(low, n_events, n_batches, n_buckets))
        highs.append(run_at(high, n_events, n_batches, n_buckets))
        print(f"trial {i}: low={lows[-1]['events_per_sec']} high={highs[-1]['events_per_sec']}", file=sys.stderr)
    r_low = max(lows, key=lambda r: r["events_per_sec"])
    r_high = max(highs, key=lambda r: r["events_per_sec"])
    ratio = r_high["events_per_sec"] / r_low["events_per_sec"]
    efficiency = ratio / (high / low)
    result = {
        "n_events": n_events,
        "low": r_low,
        "high": r_high,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(result))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    section = f"""
## Scaling evidence ({stamp})

Same CDC apply job (generate → project → extract → salted LWW →
bucket-pruned MERGE, {n_batches} micro-batches, {n_buckets} buckets) on the
same deterministic input ({n_events:,} events, seed=42), fresh JVM per run:

| parallelism | wall-clock (s) | events/s |
|---|---|---|
| local[{low}] | {r_low['sec']} | {r_low['events_per_sec']:,} |
| local[{high}] | {r_high['sec']} | {r_high['events_per_sec']:,} |

Speedup {low}→{high} cores: **{ratio:.2f}×** → scaling efficiency
(speedup / {high // low}) = **{efficiency:.3f}** (north-rule target ≥ 0.8).
"""
    # APPEND — prior runs are evidence too (the VM's noise makes any
    # single run unrepresentative; keep the history)
    baseline = REPO / "BASELINE.md"
    baseline.write_text(baseline.read_text().rstrip() + "\n" + section)


if __name__ == "__main__":
    main()
