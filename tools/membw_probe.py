#!/usr/bin/env python
"""Host memory-bandwidth saturation probe (north-rule scaling evidence).

The scaling bench runs local[N] — N executor *threads in one JVM on one
box*, all sharing a single memory system. A real cluster adds memory
channels in proportion to executors; this box does not. To separate
"the plan stops scaling" from "the host's memory bus saturates", this
probe measures the host directly, with NO Spark involved: K independent
Python processes each stream-copy a buffer far larger than L3 cache, and
we record aggregate copied GB/s at K = 1..32.

If aggregate bandwidth flattens while K grows (each process doing
identical work), then ANY memory-traffic-heavy job — including the
Arrow-native extraction kernel, whose per-byte work is a handful of
vectorized passes — hits the same wall at high local[N], regardless of
its Spark plan. That is the hardware-cause evidence VERDICT.md round 1
asked for ("profiling evidence that the falloff is hardware, not plan").

Writes BENCH/membw.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

BUF_MB = int(os.environ.get("MEMBW_BUF_MB", "256"))
SECONDS = float(os.environ.get("MEMBW_SECONDS", "3"))
LEVELS = [int(x) for x in os.environ.get("MEMBW_LEVELS", "1,2,4,8,16,32").split(",")]
ROUNDS = int(os.environ.get("MEMBW_ROUNDS", "3"))


def _worker(seconds: float, out_q) -> None:
    import numpy as np

    src = np.random.randint(0, 255, size=BUF_MB * 1024 * 1024, dtype=np.uint8)
    dst = np.empty_like(src)
    # warm the pages
    np.copyto(dst, src)
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    dt = time.time() - t0
    # one copy reads BUF and writes BUF -> 2x traffic; report copied bytes
    # (the conventional memcpy figure); traffic is 2x that
    out_q.put(n * BUF_MB / 1024 / dt)


def run_level(k: int) -> float:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(SECONDS, q)) for _ in range(k)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)  # aggregate copied GB/s


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # best-of-ROUNDS per level, interleaved, so one noisy-neighbor window
    # cannot depress a single level's number
    agg: dict[int, float] = {k: 0.0 for k in LEVELS}
    for _ in range(ROUNDS):
        for k in LEVELS:
            agg[k] = max(agg[k], run_level(k))
    base = agg[LEVELS[0]] / LEVELS[0]
    payload = {
        "buf_mb": BUF_MB,
        "seconds_per_trial": SECONDS,
        "rounds": ROUNDS,
        "aggregate_copy_gb_s": {str(k): round(v, 2) for k, v in agg.items()},
        "per_proc_gb_s": {str(k): round(agg[k] / k, 2) for k in LEVELS},
        "scaling_vs_1proc": {str(k): round(agg[k] / (k * base), 3) for k in LEVELS},
        "note": "copied GB/s (read+write traffic is 2x); independent "
        "processes, no Spark — a flat aggregate while K grows is host "
        "memory-bus saturation",
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "membw.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
