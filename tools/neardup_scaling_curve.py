#!/usr/bin/env python
"""Linear-scaling evidence for the fused near-dup RESOLUTION contract
across three corpus sizes (round-4 scale confidence).

The 100 TB design claim for embedding_dup_clusters is that wall time is
LINEAR in corpus size: candidates are bounded per bucket (max_bucket),
the star kernel emits O(group) edges, and global CC runs on a
linear-size edge set. One tier cannot evidence that claim; this tool
runs the fused contract at 20.8k / 208k / 2.08M vectors (star_sf1 /
star_sf10 / star_sf100 — the last generated embeddings-only via
make_star_tier --tables embeddings) and reports wall seconds plus
vectors/second per tier. A flat-or-rising vectors/second line across
two decades of corpus size is the linearity evidence; the pair-LIST
contract is measured at the two smaller tiers for contrast (its output
is quadratic in cluster size — at sf100 it is run under the same
watchdog and an exceeded watchdog is recorded as evidence, not error).

Noise protocol (memory: measurement-traps): tiers interleaved across
rounds, best-of per (tier, contract).

Usage: python tools/neardup_scaling_curve.py [--rounds 2]
       [--out BENCH/neardup_scaling.json] [--skip-pairs-sf100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TIERS = [
    (".data/star_sf1", 20_800),
    (".data/star_sf10", 208_000),
    (".data/star_sf100", 2_080_000),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "neardup_scaling.json"))
    ap.add_argument("--kill-after", type=int, default=900)
    ap.add_argument("--skip-pairs-sf100", action="store_true")
    args = ap.parse_args()

    from docling_nlp_api_spark.operators.dedup import (
        embedding_dup_clusters,
        embedding_near_dup,
    )
    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("neardup_scaling", cores=32, shuffle_partitions=64)

    report: dict = {"tiers": {}, "rounds": args.rounds}

    def run(tag: str, fn) -> tuple[float | None, int | None, str | None]:
        group = f"curve-{tag}-{time.time()}"
        cancelled = threading.Event()

        def _cancel() -> None:
            cancelled.set()
            spark.sparkContext.cancelJobGroup(group)

        timer = threading.Timer(args.kill_after, _cancel)
        timer.start()
        t0 = time.time()
        try:
            spark.sparkContext.setJobGroup(group, tag, interruptOnCancel=True)
            n = fn()
            return round(time.time() - t0, 2), int(n), None
        except Exception as exc:
            if cancelled.is_set():
                return None, None, f"exceeded_{args.kill_after}s_watchdog"
            return None, None, f"{type(exc).__name__}: {str(exc)[:200]}"
        finally:
            timer.cancel()

    for rnd in range(args.rounds):
        for sf_dir, n_vecs in TIERS:
            tier = report["tiers"].setdefault(
                os.path.basename(sf_dir), {"n_vectors": n_vecs}
            )
            sec, rows, err = run(
                f"fused-{sf_dir}",
                lambda d=sf_dir: embedding_dup_clusters(spark, d).count(),
            )
            print(f"round {rnd} {sf_dir} fused: {sec}s rows={rows} err={err}",
                  flush=True)
            if sec is not None and sec < tier.get("fused_sec", float("inf")):
                tier["fused_sec"] = sec
                tier["fused_rows"] = rows
                tier["fused_vectors_per_sec"] = round(n_vecs / sec)
            if err:
                tier["fused_err"] = err
            if sf_dir.endswith("sf100") and args.skip_pairs_sf100:
                continue
            sec, rows, err = run(
                f"pairs-{sf_dir}",
                lambda d=sf_dir: embedding_near_dup(spark, d).count(),
            )
            print(f"round {rnd} {sf_dir} pairs: {sec}s rows={rows} err={err}",
                  flush=True)
            if sec is not None and sec < tier.get("pairs_sec", float("inf")):
                tier["pairs_sec"] = sec
                tier["pairs_rows"] = rows
            if err and "pairs_sec" not in tier:
                tier["pairs_err"] = err

    report["note"] = (
        "fused contract (embedding_dup_clusters) output is one row per "
        "clustered vector — linear; vectors_per_sec flat-or-rising across "
        "20.8k -> 2.08M vectors is the 100 TB extrapolation evidence. "
        "pair-list contract (embedding_near_dup) output grows with the "
        "SQUARE of cluster sizes; included for contrast."
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
