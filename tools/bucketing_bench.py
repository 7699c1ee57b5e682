#!/usr/bin/env python
"""Bucketed co-located join evidence -> BENCH/bucketing.md.

The brief's shuffle playbook names three co-location levers: broadcast
(used throughout the catalog), pre-partitioning (the extraction plane),
and BUCKETING — pre-shuffling a table on its join key AT WRITE TIME so
every later join on that key reads co-located buckets and shuffles
nothing. This script proves the engine's frames are bucketing-clean:

  1. writes `documents` (sf dir) and a per-doc signal frame as BOTH
     plain parquet tables and `bucketBy(16, doc_id).sortBy(doc_id)`
     tables in a throwaway warehouse;
  2. joins each pair on doc_id under identical confs (broadcast OFF so
     the shuffle is actually on the table, AQE off for a static plan);
  3. asserts the bucketed plan contains ZERO Exchange while the plain
     plan shuffles both sides, and that bucket pruning survives
     (PushedFilters still present);
  4. times both, interleaved A/B best-of-3 (the sandbox has documented
     noisy-neighbor windows — never trust consecutive timings).

At 100 TB this is the difference between re-shuffling the corpus per
join and reading it in place: the dedup keep-set, the signal joins, and
the incremental-dedup index (bucketed by (band, bucket)) all join on
keys their producers already partition by.

Usage: python tools/bucketing_bench.py   (writes BENCH/bucketing.md)
"""

from __future__ import annotations

import io
import os
import re
import shutil
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from docling_nlp_api_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_BUCKETS = 16
TRIALS = 3


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> int:
    warehouse = tempfile.mkdtemp(prefix="bucketing_")
    spark = get_spark(
        "bucketing",
        cores=8,
        shuffle_partitions=16,
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        signals = docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0)).alias("n_tokens"),
            F.length("text").alias("n_chars_live"),
        )

        docs.write.mode("overwrite").saveAsTable("docs_plain")
        signals.write.mode("overwrite").saveAsTable("sig_plain")
        (docs.write.mode("overwrite")
             .bucketBy(N_BUCKETS, "doc_id").sortBy("doc_id").saveAsTable("docs_b"))
        (signals.write.mode("overwrite")
             .bucketBy(N_BUCKETS, "doc_id").sortBy("doc_id").saveAsTable("sig_b"))

        def join_of(dt: str, st: str):
            d = spark.table(dt)
            s = spark.table(st)
            return (
                d.join(s, "doc_id")
                .groupBy("lang")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("n_tokens").alias("tok_mass"),
                )
            )

        plain = join_of("docs_plain", "sig_plain")
        bucketed = join_of("docs_b", "sig_b")
        p_plain, p_bucket = plan_of(plain), plan_of(bucketed)

        # the join itself must not shuffle; the only Exchange allowed in
        # the bucketed plan is the one feeding the final tiny groupBy(lang)
        n_ex_plain = len(re.findall(r"\(\d+\) Exchange", p_plain))
        n_ex_bucket = len(re.findall(r"\(\d+\) Exchange", p_bucket))
        checks = [
            (f"plain join shuffles both sides (3 Exchange total, got {n_ex_plain})",
             n_ex_plain >= 3),
            (f"bucketed plan has exactly 1 Exchange — the final agg, none at the join (got {n_ex_bucket})",
             n_ex_bucket == 1),
            ("bucketed plan reads SelectedBucketsCount",
             "SelectedBucketsCount" in p_bucket),
            ("bucketed join is a SortMergeJoin on co-located buckets",
             "SortMergeJoin" in p_bucket),
        ]
        failures = [label for label, ok in checks if not ok]

        times: dict[str, float] = {"plain": float("inf"), "bucketed": float("inf")}
        for _ in range(TRIALS):  # interleaved A/B: alternate within each round
            times["plain"] = min(times["plain"], timed(plain))
            times["bucketed"] = min(times["bucketed"], timed(bucketed))

        check_md = "\n".join(
            f"- {'PASS' if ok else 'FAIL'}: {label}" for label, ok in checks
        )
        status = "ALL CHECKS PASS" if not failures else f"FAILED: {failures}"
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/bucketing.md", "w") as f:
            f.write(
                "# Bucketed co-located join evidence\n\n"
                f"Generated by `python tools/bucketing_bench.py` at {SF_DIR}\n"
                f"(local[8], {N_BUCKETS} buckets, broadcast+AQE off so the table\n"
                "shuffle is observable; timings interleaved best-of-"
                f"{TRIALS}).\n\n**{status}**\n\n"
                f"{check_md}\n\n"
                f"| variant | join+agg sec (best) |\n|---|---|\n"
                f"| plain parquet (shuffle join) | {times['plain']:.3f} |\n"
                f"| bucketBy({N_BUCKETS}, doc_id) | {times['bucketed']:.3f} |\n\n"
                "## Bucketed plan (head)\n\n```\n"
                + "\n".join(p_bucket.splitlines()[:30])
                + "\n```\n\n## Plain plan (head)\n\n```\n"
                + "\n".join(p_plain.splitlines()[:30])
                + "\n```\n"
            )
        print(status, times)
        return 1 if failures else 0
    finally:
        for t in ("docs_plain", "sig_plain", "docs_b", "sig_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.stop()
        shutil.rmtree(warehouse, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
