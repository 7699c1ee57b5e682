"""End-to-end test for the training-batch export job (jobs/pack_job.py):
pack_sequences and with_split are oracle-verified individually; this pins
their composition — split isolation (no sequence straddles a split),
exact token accounting against a Python mirror, determinism across
re-runs, and the zero-token-doc edge the stream verdicts must survive."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.pack_job import run_pack  # noqa: E402

MAX_TOKENS = 64
SHARDS = 4


def _py_bucket(salt: str, key, mod: int) -> int:
    """Python mirror of sampling._bucket (first 4 md5 hex digits mod n)."""
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:4], 16) % mod


def _doc_map_rows(spark, out):
    df = spark.read.parquet(os.path.join(out, "doc_map"))
    return sorted(
        (
            (r.split, r.shard, r.doc_id, r.n_tokens, r.start_off, r.seq_idx, r.seq_off)
            for r in df.collect()
        )
    )


def test_pack_job_end_to_end(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="pack_job_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        m = run_pack(spark, docs, out, max_tokens=MAX_TOKENS, shards=SHARDS)

        # placement is lossless and duplicate-free, across all splits
        assert m["n_docs_in"] == docs.count()
        assert m["n_docs_placed"] == m["n_docs_in"]
        assert m["n_tokens_placed"] == m["n_tokens_in"] > 0
        assert m["bad_streams"] == 0
        assert set(m["splits"]) <= {"train", "val", "test"}
        assert sum(v["n_docs"] for v in m["splits"].values()) == m["n_docs_in"]

        rows = _doc_map_rows(spark, out)

        # split/shard assignment matches the md5 contract row for row
        for split, shard, doc_id, *_ in rows[:500]:
            b = _py_bucket("split:v1", doc_id, 100)
            assert split == ("val" if b < 5 else "test" if b < 10 else "train")
            assert shard == _py_bucket("pack:v1", doc_id, SHARDS)

        # Python mirror of the packing arithmetic: within each
        # (split, shard) stream, docs concatenated in doc_id order tile
        # the token axis exactly — no gap, no overlap, correct chunk ids
        streams: dict = {}
        for split, shard, doc_id, n_tok, start, seq_idx, seq_off in rows:
            streams.setdefault((split, shard), []).append(
                (doc_id, n_tok, start, seq_idx, seq_off)
            )
        assert len(streams) > 1
        for key, members in streams.items():
            members.sort()
            off = 0
            for _doc, n_tok, start, seq_idx, seq_off in members:
                assert start == off, (key, _doc)
                assert seq_idx == off // MAX_TOKENS
                assert seq_off == off % MAX_TOKENS
                off += n_tok

        # streams table reconciles with the doc_map it summarizes
        st = {
            (r.split, r.shard): r
            for r in spark.read.parquet(os.path.join(out, "streams")).collect()
        }
        assert set(st) == set(streams)
        for key, members in streams.items():
            total = sum(n for _, n, *_ in members)
            assert st[key].n_tokens == total
            assert st[key].n_seqs == (total + MAX_TOKENS - 1) // MAX_TOKENS
            assert st[key].tail_tokens == total % MAX_TOKENS
            assert st[key].cumsum_ok and st[key].chunk_ok

        # metrics.json on disk mirrors the returned dict
        with open(os.path.join(out, "metrics.json")) as f:
            assert json.load(f) == m

        # determinism: a re-run lands byte-identical placement
        out2 = tempfile.mkdtemp(prefix="pack_job_rerun_")
        try:
            m2 = run_pack(spark, docs, out2, max_tokens=MAX_TOKENS, shards=SHARDS)
            assert m2 == m
            assert _doc_map_rows(spark, out2) == rows
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pack_job_materialize(spark, sf_dir):
    """--materialize writes the consumable sequences table; its content
    must reconcile with the placement accounting AND, stream by stream,
    equal the member docs' tokens concatenated in doc_id order."""
    out = tempfile.mkdtemp(prefix="pack_job_mat_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        m = run_pack(
            spark, docs, out, max_tokens=MAX_TOKENS, shards=SHARDS,
            materialize=True,
        )
        assert m["sequences"]["bad_streams"] == 0
        assert m["sequences"]["n_seqs"] == sum(
            v["n_seqs"] for v in m["splits"].values()
        )

        # one stream, end to end: concatenating its sequences in seq_idx
        # order reproduces the member docs' tokens in doc_id order
        seqs = spark.read.parquet(os.path.join(out, "sequences"))
        first = seqs.select("split", "shard").first()
        got = [
            t
            for r in seqs.filter(
                (seqs.split == first.split) & (seqs.shard == first.shard)
            )
            .orderBy("seq_idx")
            .collect()
            for t in r.tokens
        ]
        members = sorted(
            (r.doc_id, r.text)
            for r in docs.collect()
            if _py_bucket("pack:v1", r.doc_id, SHARDS) == first.shard
            and (
                "val"
                if _py_bucket("split:v1", r.doc_id, 100) < 5
                else "test"
                if _py_bucket("split:v1", r.doc_id, 100) < 10
                else "train"
            )
            == first.split
        )
        want = [t for _, text in members for t in text.split()]
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_pack_job_zero_token_docs(spark):
    """Whitespace-only and empty docs occupy no tokens but must still be
    placed (lossless) without tripping the stream verdicts — including
    when one sorts PAST the last real token of its stream."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, ""),
            (3, " \t \n "),
            (4, "delta " * 100),  # straddles sequence boundaries
            (5, "epsilon"),
            (9_999_999, ""),  # zero-token doc sorting last in its stream
        ],
        "doc_id long, text string",
    )
    out = tempfile.mkdtemp(prefix="pack_job_zero_")
    try:
        m = run_pack(spark, docs, out, max_tokens=8, shards=2)
        assert m["n_docs_placed"] == 6
        assert m["n_tokens_placed"] == m["n_tokens_in"] == 3 + 0 + 0 + 100 + 1 + 0
        assert m["bad_streams"] == 0

        # an all-zero-token corpus: placement rows exist, sequences/ is
        # empty, and the stream reconciliation must accept the NULL side
        empty = spark.createDataFrame(
            [(1, ""), (2, " \t ")], "doc_id long, text string"
        )
        out2 = tempfile.mkdtemp(prefix="pack_job_allzero_")
        try:
            m2 = run_pack(spark, empty, out2, max_tokens=8, shards=1,
                          materialize=True)
            assert m2["n_docs_placed"] == 2 and m2["n_tokens_placed"] == 0
            assert m2["sequences"] == {"n_seqs": 0, "bad_streams": 0}
        finally:
            shutil.rmtree(out2, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
