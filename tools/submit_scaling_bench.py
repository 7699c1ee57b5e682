#!/usr/bin/env python
"""North-rule deployment evidence: the extraction job run THROUGH
`spark-submit --py-files dist/docling_nlp_api_spark.zip` at two
parallelism levels (N and 4N cores) on identical input, reporting
throughput at both plus scaling efficiency.

What makes this evidence rather than ceremony:
- the job file is COPIED OUTSIDE the repo before submission, so its
  repo-relative sys.path insert points at an empty temp dir and the
  package can only come from the --py-files zip — a broken/incomplete
  zip fails the run instead of silently importing the checkout;
- each submission is a fresh JVM (the cluster deployment shape), and
  levels are interleaved across trial rounds per the repo's noisy-VM
  protocol (BENCH/BASELINE.md "Measurement honesty");
- the sandbox has one machine, so N is local[N] cores and the pair
  (1, 4) is used — the pair where local[N] best approximates an N-core
  cluster (higher N saturates the single shared memory bus; see the
  memcpy envelope in BENCH/BASELINE.md).

Usage: python tools/submit_scaling_bench.py [--input .data/spans_sf0.5]
       [--levels 1,4] [--trials 3] [--json BENCH/submit_scaling.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=".data/spans_sf0.5")
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--json", default="BENCH/submit_scaling.json")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    assert len(levels) == 2 and levels[1] == 4 * levels[0], "need N and 4N"

    # package zip + the job file exiled outside the repo
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py")],
        check=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "docling_nlp_api_spark.zip")
    stage = tempfile.mkdtemp(prefix="submit_bench_")
    job = os.path.join(stage, "extract_job.py")
    shutil.copy(os.path.join(REPO, "jobs", "extract_job.py"), job)

    input_path = os.path.abspath(os.path.join(REPO, args.input))
    n_docs = None
    times: dict[int, list[float]] = {lvl: [] for lvl in levels}
    job_times: dict[int, list[float]] = {lvl: [] for lvl in levels}
    for rnd in range(args.trials):
        for lvl in levels:
            out = os.path.join(stage, f"out_{lvl}")
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            proc = subprocess.run(
                [
                    SPARK_SUBMIT,
                    "--master", f"local[{lvl}]",
                    # MUST be a submit-time flag: the driver JVM already
                    # exists when get_spark's builder runs, so its
                    # spark.driver.memory config is silently ignored under
                    # spark-submit — the 1g default OOMs at local[4]
                    # (found by this bench's first run)
                    "--driver-memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
                    "--py-files", zip_path,
                    job,
                    "--input", input_path,
                    "--output", out,
                    "--run-id", f"submit{lvl}r{rnd}",
                    "--partitions", "32",
                    "--batch-size", "32",  # one commit batch: pure job time
                    "--cores", str(lvl),
                ],
                cwd=stage,  # NOT the repo: the zip must supply the package
                capture_output=True, text=True, timeout=1800,
            )
            sec = time.time() - t0
            if proc.returncode != 0:
                print(proc.stdout[-2000:], proc.stderr[-2000:])
                raise SystemExit(f"submit at local[{lvl}] failed")
            summary = json.loads(
                [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            )
            n_docs = summary["docs_out"]
            times[lvl].append(round(sec, 2))
            job_times[lvl].append(summary["wall_sec"])
            print(f"round {rnd}: local[{lvl}] = {sec:.1f}s ({summary})", flush=True)
    shutil.rmtree(stage, ignore_errors=True)

    best = {lvl: min(ts) for lvl, ts in times.items()}
    jbest = {lvl: min(ts) for lvl, ts in job_times.items()}
    thr = {lvl: round(n_docs / best[lvl], 1) for lvl in levels}
    jthr = {lvl: round(n_docs / jbest[lvl], 1) for lvl in levels}
    eff = round(thr[levels[1]] / (4 * thr[levels[0]]), 3)
    jeff = round(jthr[levels[1]] / (4 * jthr[levels[0]]), 3)
    result = {
        "mechanism": "spark-submit --py-files (job file outside the repo; "
        "package importable only from the zip)",
        "input": args.input,
        "n_docs": n_docs,
        "levels": levels,
        "trials_sec": times,
        "job_trials_sec": job_times,
        "best_sec": best,
        "job_best_sec": jbest,
        "docs_per_sec": thr,
        "job_docs_per_sec": jthr,
        "scaling_efficiency_N_to_4N_total": eff,
        "scaling_efficiency_N_to_4N_job_phase": jeff,
        "pass_0.8_job_phase": jeff >= 0.8,
        "note": "total = end-to-end submit wall (includes ~20 s fixed "
        "JVM/session startup, which does not parallelize and amortizes to "
        "zero on a long cluster job); job_phase = the pipeline pass itself "
        "(input scan -> kernel -> parquet write + checkpoint commit), one "
        "commit batch. Both efficiencies reported; job_phase is the "
        "throughput-scaling number the north rule targets.",
    }
    with open(os.path.join(REPO, args.json), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
