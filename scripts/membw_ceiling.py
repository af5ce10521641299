"""Memory-bandwidth parallel-scaling ceiling — second control for the
scaling runs (companion to ``cpu_ceiling.py``).

Spark's shuffle, parquet encode/decode and Arrow transfer phases are
memory-bandwidth-bound, not instruction-bound.  A host whose memory bus
saturates at K cores caps ANY engine's bandwidth-bound phases at K-core
throughput no matter how many vCPUs are visible.  This control measures
exactly that: P worker processes stream a fixed total number of 64 MiB
array copies; ideal hardware completes the same total work 4x faster at
4N processes than at N.

Usage: python scripts/membw_ceiling.py [low=8] [high=32] [trials=5]
Prints one JSON line (best trial per config; first trial is page-fault
warm-up and effectively never the best).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

#: 64 MiB per array -> each copy unit streams ~128 MiB through memory
_ELEMS = 8 * 1024 * 1024


def _worker(units: int) -> None:
    a = np.ones(_ELEMS, dtype=np.float64)
    b = np.empty_like(a)
    for _ in range(units):
        np.copyto(b, a)


def measure(procs: int, total_units: int) -> float:
    per = total_units // procs
    ps = [mp.Process(target=_worker, args=(per,)) for _ in range(procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return time.monotonic() - t0


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    total_units = 32 * 12  # divisible by both configs

    lows, highs = [], []
    for i in range(trials):
        lows.append(measure(low, total_units))
        highs.append(measure(high, total_units))
        print(
            f"trial {i}: low={lows[-1]:.2f}s high={highs[-1]:.2f}s",
            file=sys.stderr,
        )
    t_low, t_high = min(lows), min(highs)
    print(
        json.dumps(
            {
                "control": "memcopy-multiprocess (no engine, no I/O)",
                "low_procs": low,
                "high_procs": high,
                "t_low_sec": round(t_low, 2),
                "t_high_sec": round(t_high, 2),
                "low_trials": [round(t, 2) for t in lows],
                "high_trials": [round(t, 2) for t in highs],
                "speedup": round(t_low / t_high, 3),
                "machine_ceiling_efficiency": round(t_low / t_high / (high / low), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
