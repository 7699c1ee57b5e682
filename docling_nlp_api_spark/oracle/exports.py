"""Single-node oracle for the S8 structured NLP JSON — a straightforward
per-document rendering of the reference's `_create_nlp_structured_json`
(/root/reference/app/services/docling_service.py:221-374) over the span
model, used by tests/test_json_parity.py to pin the Spark render.

Deltas vs the reference, both deliberate and mirrored by the engine:
- headings/lists are populated from heading/li spans (the reference
  declares the keys but never fills them — :246,249);
- keyword ties are pinned by (frequency desc, word asc): the reference's
  Counter.most_common insertion order is not reproducible across engines;
- tables carry media_ref as the raw anchor instead of docling's table dict;
- the keyword score is quantized HALF_UP (the reference emits the RAW
  float, :348 — round-6 is this repo's cross-engine convention, and both
  engines round half away from zero: Spark F.round and DuckDB ROUND).
  CPython's round() is banker's and would diverge on exact decimal ties
  (e.g. 5/128 = 0.0390625 -> 0.039062, engines 0.039063).
"""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from ..spec import MEDIA_KINDS, STOPWORDS_40, TOKEN_RE
from .extract import ExtractResult


def _round_half_up(x: float, nd: int) -> float:
    """Spark F.round parity: BigDecimal.valueOf(double) quantized HALF_UP
    — Decimal(repr(x)) is the same shortest-roundtrip decimal form."""
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), rounding=ROUND_HALF_UP))

_HEAD_LEVEL = {"h1": 1, "title": 1, "h2": 2, "heading": 2, "h3": 3}


def full_text(res: ExtractResult) -> str:
    return "\n".join(s.text for s in res.spans if s.kind not in MEDIA_KINDS)


def _counted(items: list[str]) -> list[dict]:
    return [
        {"id": i, "text": t, "word_count": len(t.split()), "char_count": len(t)}
        for i, t in enumerate(items)
    ]


def detect_lang(text: str) -> str:
    """Python mirror of textquality.lang_pred_col: marker-word counts
    with \\b boundaries on the lowered text, CJK short-circuit, argmax
    with lexicographic (de < en < es < fr) tiebreak, unknown at 0."""
    from ..operators.textquality import LANG_MARKERS

    if re.search(r"[一-鿿]", text):
        return "zh"
    low = text.lower()
    scores = {
        lg: len(re.findall(r"\b(" + "|".join(ms) + r")\b", low))
        for lg, ms in LANG_MARKERS.items()
    }
    best = max(scores.values())
    if best == 0:
        return "unknown"
    return min(lg for lg, s in scores.items() if s == best)


def nlp_json(res: ExtractResult, k: int = 20, detect_language: bool = False) -> dict:
    assert res.status == "completed", "render the JSON for completed docs only"
    ft = full_text(res)
    paras = [p.strip() for p in ft.split("\n\n") if p.strip()]
    sents: list[str] = []
    for p in paras:
        sents.extend(s.strip() for s in re.split(r"[.!?]+", p) if s.strip())

    toks = re.findall(TOKEN_RE, ft.lower())
    total = len(toks)
    counts = Counter(w for w in toks if w not in STOPWORDS_40)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    keywords = [
        {"word": w, "frequency": c, "score": _round_half_up(c / total, 6)} for w, c in top
    ]

    heads = [s for s in res.spans if s.kind in _HEAD_LEVEL]
    lis = [s for s in res.spans if s.kind == "li"]
    tables = [s for s in res.spans if s.kind == "table"]
    images = [s for s in res.spans if s.kind == "image"]

    page_count = int(res.metadata["page_count"])
    bbs = res.bboxes if res.bboxes is not None else [None] * len(res.spans)
    pages = []
    for pno in range(1, page_count + 1):
        on_page = [
            (s, bb) for s, pg, bb in zip(res.spans, res.pages, bbs)
            if pg == pno and s.kind not in MEDIA_KINDS
        ]
        pages.append(
            {
                "page_number": pno,
                "text": "".join(s.text + " " for s, _ in on_page),
                "elements": [
                    # text_elem.get('bbox', []) — [] when the parser gave none
                    {"type": "text", "content": s.text, "bbox": (bb or [])}
                    for s, bb in on_page
                ],
                # initialized and never filled by the reference
                # (docling_service.py:260)
                "bounding_boxes": [],
            }
        )

    return {
        "document_info": {
            "total_pages": page_count,
            "total_words": int(res.metadata["word_count"]),
            "total_characters": int(res.metadata["char_count"]),
            "has_tables": res.metadata["has_tables"] == "true",
            "has_images": res.metadata["has_images"] == "true",
            "language": detect_lang(ft) if detect_language else "en",
        },
        "content": {
            "full_text": ft,
            "paragraphs": _counted(paras),
            "sentences": _counted(sents),
            "entities": [],
            "keywords": keywords,
        },
        "structure": {
            "headings": [
                {"id": i, "level": _HEAD_LEVEL[s.kind], "text": s.text}
                for i, s in enumerate(heads)
            ],
            "tables": [
                {"id": i, "rows": [], "columns": [], "cell_count": 0, "media_ref": s.media_ref}
                for i, s in enumerate(tables)
            ],
            "lists": [{"id": i, "text": s.text} for i, s in enumerate(lis)],
            "images": [
                {"id": i, "type": "image", "metadata": {"media_ref": s.media_ref}}
                for i, s in enumerate(images)
            ],
        },
        "pages": pages,
    }
