"""End-to-end test for the curation job (jobs/curation_job.py): the
gate/dedup operators are oracle-verified individually; this pins their
composition — funnel-audit coverage, metrics arithmetic, shard
assignment, and that gate selection actually changes the keep-set."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.curation_job import run_curation  # noqa: E402


def test_curation_job_end_to_end(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="curation_job_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        m = run_curation(spark, docs, out, shards=4, gates=("funnel", "c4_page"))

        # metrics arithmetic: stages are monotone and account for every doc
        assert m["n_docs_in"] == docs.count()
        assert m["n_after_gates"] == m["n_docs_in"] - m["n_dropped_gates"]
        assert m["n_docs_out"] == m["n_after_gates"] - m["n_dropped_neardup"]
        assert 0 < m["n_docs_out"] <= m["n_docs_in"]

        # the audit table covers EVERY input doc, kept or not
        audit = spark.read.parquet(os.path.join(out, "funnel"))
        assert audit.count() == m["n_docs_in"]
        assert set(audit.columns) == {
            "doc_id", "verdict", "gopher_verdict", "c4_verdict"
        }

        # shard assignment: values in range, every output doc sharded
        corpus = spark.read.parquet(os.path.join(out, "corpus"))
        shards = [r.shard for r in corpus.select("shard").distinct().collect()]
        assert all(0 <= s < 4 for s in shards)
        assert corpus.count() == m["n_docs_out"]

        # metrics.json on disk mirrors the returned dict
        with open(os.path.join(out, "metrics.json")) as f:
            assert json.load(f) == m

        # unknown / conflicting gate names raise instead of silently
        # disabling a quality gate (a --gates typo must not ship an
        # under-filtered corpus)
        import pytest as _pytest
        with _pytest.raises(ValueError, match="unknown gates"):
            run_curation(spark, docs, out, gates=("funnel", "gopherr"))
        with _pytest.raises(ValueError, match="pick one"):
            run_curation(spark, docs, out, gates=("c4", "c4_page"))

        # tightening the gate set can only shrink the keep-set
        out2 = tempfile.mkdtemp(prefix="curation_job_strict_")
        try:
            m2 = run_curation(
                spark, docs, out2, shards=4, gates=("funnel", "gopher", "c4")
            )
            assert m2["n_after_gates"] <= m["n_after_gates"]
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
