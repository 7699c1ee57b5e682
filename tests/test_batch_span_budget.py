"""The Arrow kernel's per-invocation memory bound is measured in spans, not
docs: arrow.maxRecordsPerBatch (1024 docs) cannot stop several mega-docs from
landing in one batch, so _bounded_slices re-cuts oversized batches zero-copy.
Sliced processing must be byte-identical to unsliced."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from docling_nlp_api_spark.operators.extract_arrow import (
    BATCH_SPAN_BUDGET,
    _bounded_slices,
    extract_record_batch,
)

SPAN_T = pa.list_(
    pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
)


def _mk(span_counts):
    ids = pa.array([f"d{i}" for i in range(len(span_counts))])
    spans = pa.array(
        [
            [{"kind": "body", "text": f"word{j} text here", "media_ref": None, "offset": j}
             for j in range(k)]
            for k in span_counts
        ],
        type=SPAN_T,
    )
    return pa.RecordBatch.from_arrays([ids, spans], names=["doc_id", "spans"])


def test_small_batch_untouched():
    b = _mk([10, 20, 30])
    assert [s.num_rows for s in _bounded_slices(b)] == [3]


def test_mega_docs_never_share_a_slice():
    b = _mk([50000, 30, 50000, 30, 40])
    slices = list(_bounded_slices(b))
    assert sum(s.num_rows for s in slices) == b.num_rows
    for s in slices:
        spans = int(np.asarray(s.column(1).value_lengths(), dtype=np.int64).sum())
        assert spans <= BATCH_SPAN_BUDGET or s.num_rows == 1


def test_single_doc_over_budget_is_own_slice():
    b = _mk([BATCH_SPAN_BUDGET + 1000, 5])
    slices = list(_bounded_slices(b))
    assert [s.num_rows for s in slices] == [1, 1]


def test_sliced_equals_unsliced():
    b = _mk([50000, 30, 50000, 30, 40])
    whole = pa.Table.from_batches([extract_record_batch(b)])
    parts = pa.Table.from_batches([extract_record_batch(s) for s in _bounded_slices(b)])
    assert whole.equals(parts)
