#!/usr/bin/env python
"""100x-scale dry run of the FULL catalog (round-4 scale evidence).

Runs every catalog queries() entry against a tools/make_star_tier.py
tier (default .data/star_sf10 = 100x the driver's sf0.1 testdata) and
records per-query wall seconds to a JSON report. Purpose is NOT
correctness (oracles run at sf0.01) — it is to catch anything that is
"metadata-scale at sf0.1 but corpus-scale at 100x": driver collects
that grow with the data, LSH bucket skew, plans that flip to
SortMergeJoin and spill, super-linear blowups.

With --ref-json (a prior run of this tool at sf0.1) the report adds a
growth ratio per query: sec@100x / sec@sf0.1. Data grew 100x, so with
fixed overhead dominating the small run, healthy ratios sit WELL under
100; ratios near/above 100x are flagged as super-linear suspects.

Noise protocol (memory: measurement-traps): one pass of all queries is
interleaved-by-construction (each query runs once per pass, so a noisy
window smears few queries, not one query's all trials); --passes 2
keeps the min per query.

Usage:
  python tools/scale_dryrun.py --dir /root/testdata/sf0.1 --out BENCH/dryrun_sf0.1.json
  python tools/scale_dryrun.py --dir .data/star_sf10 --ref-json BENCH/dryrun_sf0.1.json \
      --out BENCH/sf10.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, ".data", "star_sf10"))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "sf10.json"))
    ap.add_argument("--ref-json", default=None,
                    help="prior report at sf0.1 for growth ratios")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--only", default=None, help="comma-separated query subset")
    ap.add_argument("--skip", default=None, help="comma-separated queries to skip")
    ap.add_argument("--timeout-note", type=int, default=120,
                    help="flag queries slower than this many seconds")
    ap.add_argument("--kill-after", type=int, default=900,
                    help="cancel a query's Spark jobs after this many seconds "
                         "and record err=cancelled (watchdog: the first sf10 "
                         "sweep lost an hour to one unbounded query)")
    args = ap.parse_args()

    from docling_nlp_api_spark.catalog import QUERIES
    from docling_nlp_api_spark.session import get_spark

    spark = get_spark("scale_dryrun", cores=args.cores,
                      shuffle_partitions=max(args.cores, 64))
    names = list(QUERIES)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]
    if args.skip:
        drop = set(args.skip.split(","))
        names = [n for n in names if n not in drop]

    results: dict[str, dict] = {n: {"sec": None, "err": None} for n in names}

    def dump_partial() -> None:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out + ".partial", "w") as f:
            json.dump({"dir": args.dir, "queries": results}, f, indent=1)

    t_start = time.time()
    for p in range(args.passes):
        for i, name in enumerate(names):
            # watchdog: cancel the query's jobs if it exceeds --kill-after
            # (a query whose candidate set blows up at 100x must cost one
            # bounded slot, not the whole sweep)
            import threading
            cancelled = threading.Event()
            # cancellation is scoped to THIS query's job group: a timer
            # that fires in the gap between query completion and
            # timer.cancel() must not kill the NEXT query's jobs (which
            # cancelAllJobs would — a spurious FAIL on the wrong query)
            group = f"dryrun-p{p}-{name}"

            def _cancel() -> None:
                cancelled.set()
                spark.sparkContext.cancelJobGroup(group)

            timer = threading.Timer(args.kill_after, _cancel)
            timer.start()
            t0 = time.time()
            try:
                spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
                df = QUERIES[name](spark, args.dir)
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                prev = results[name]["sec"]
                results[name]["sec"] = dt if prev is None else min(prev, dt)
                # any SUCCESS clears an earlier pass's transient failure:
                # "failed" below means "never produced a valid time"
                results[name]["err"] = None
            except Exception as exc:
                if cancelled.is_set():
                    err = f"cancelled_after_{args.kill_after}s"
                else:
                    err = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
                # a failure never overrides an earlier pass's valid time:
                # err (and hence the "failed" list) tracks queries with NO
                # successful pass; a flaky later pass is logged only
                if results[name]["sec"] is None:
                    results[name]["err"] = err
                print(f"FAIL {name} (pass {p + 1}): {err}", flush=True)
                traceback.print_exc(limit=3)
            finally:
                timer.cancel()
            print(
                f"[pass {p + 1} {i + 1}/{len(names)}] {name}: "
                f"{results[name]['sec']}s", flush=True,
            )
            dump_partial()

    ref = {}
    if args.ref_json and os.path.exists(args.ref_json):
        with open(args.ref_json) as f:
            ref = json.load(f).get("queries", {})
    for name, r in results.items():
        base = (ref.get(name) or {}).get("sec")
        if r["sec"] and base:
            r["ratio_vs_ref"] = round(r["sec"] / base, 1)

    failed = sorted(n for n, r in results.items() if r["err"])
    slow = sorted(
        (n for n, r in results.items()
         if r["sec"] and r["sec"] > args.timeout_note),
        key=lambda n: -results[n]["sec"],
    )
    superlinear = sorted(
        (n for n, r in results.items() if r.get("ratio_vs_ref", 0) >= 100),
        key=lambda n: -results[n]["ratio_vs_ref"],
    )
    report = {
        "dir": args.dir,
        "cores": args.cores,
        "passes": args.passes,
        "n_queries": len(names),
        "failed": failed,
        "slowest_over_timeout_note": slow,
        "superlinear_suspects_ratio_ge_100": superlinear,
        "total_sec": round(sum(r["sec"] or 0 for r in results.values()), 1),
        "wall_sec": round(time.time() - t_start, 1),
        "queries": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=False)
    print(json.dumps({k: report[k] for k in
                      ("dir", "n_queries", "failed", "total_sec", "wall_sec")}))
    spark.stop()


if __name__ == "__main__":
    main()
