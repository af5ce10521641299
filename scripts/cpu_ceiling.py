"""Machine parallel-scaling ceiling — pure-CPU control for the scaling runs.

The north-rule scaling evidence divides throughput at 4N cores by
throughput at N cores.  That quotient measures the *platform* as much as
the engine: if the sandbox VM cannot run 32 compute-bound threads at
4x the speed of 8 (hypervisor steal, sibling-shared cores, frequency
scaling), no engine measured on it can show efficiency 1.0.

This control removes the engine entirely: P worker *processes* (no GIL,
no JVM, no shuffle, no I/O) each hash a fixed buffer with
``hashlib.sha256`` until a fixed total amount of work W is done.  Ideal
hardware gives throughput(4N) / throughput(N) = 4.  Whatever ratio this
prints is the ceiling any engine can reach on this box at this moment;
engine scaling efficiency should be judged relative to it.

Usage: python scripts/cpu_ceiling.py [low=8] [high=32] [trials=3]
Prints one JSON line; appends nothing (callers record it).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

#: sha256 rounds per work unit; one unit ~ 8 ms of one 2020s core
_ROUNDS = 2_000
_BUF = b"\xab" * 4096


def _unit() -> None:
    h = hashlib.sha256()
    for _ in range(_ROUNDS):
        h.update(_BUF)


def _worker(n_units: int) -> None:
    for _ in range(n_units):
        _unit()


def measure(procs: int, total_units: int) -> float:
    """Wall seconds to complete ``total_units`` across ``procs`` processes."""
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
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    total_units = 32 * 160  # ~40s of single-core work; divisible by 8 and 32

    lows, highs = [], []
    for i in range(trials):
        lows.append(measure(low, total_units))
        highs.append(measure(high, total_units))
        print(
            f"trial {i}: low={lows[-1]:.2f}s high={highs[-1]:.2f}s",
            file=sys.stderr,
        )
    t_low, t_high = min(lows), min(highs)
    ratio = t_low / t_high
    result = {
        "control": "sha256-multiprocess (no engine, no I/O)",
        "low_procs": low,
        "high_procs": high,
        "t_low_sec": round(t_low, 2),
        "t_high_sec": round(t_high, 2),
        "low_trials": [round(t, 2) for t in lows],
        "high_trials": [round(t, 2) for t in highs],
        "speedup": round(ratio, 3),
        "machine_ceiling_efficiency": round(ratio / (high / low), 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
