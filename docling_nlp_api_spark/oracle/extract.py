"""Single-node pure-Python oracle for the extraction SPEC (SPEC.md).

Deliberately written as straightforward per-document loops — this is the
*comparator* for the Spark kernel, not the engine. Mirrors the reference's
per-document semantics (reading-order loops at
/root/reference/app/services/docling_service.py:253-279, media surfacing at
:207-208,310-333, failure rows at :82-91) as pinned by SPEC.md.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

from ..spec import (
    ALL_KINDS,
    FLAVOR_HTML,
    FLAVOR_PDF,
    FLAVOR_PLAIN,
    HTML_BOILER_KINDS,
    HTML_CANDIDATE_KINDS,
    HTML_CONTENT_KINDS,
    HTML_KINDS,
    MEDIA_KINDS,
    MIN_CONTENT_WORDS,
    PDF_BOILER_KINDS,
    PDF_KINDS,
    REPEAT_MAX_WORDS,
    REPEAT_MIN_COUNT,
)


@dataclass
class OutSpan:
    kind: str
    text: str
    media_ref: str
    order: int


@dataclass
class ExtractResult:
    doc_id: str
    spans: list[OutSpan]
    status: str
    metadata: dict[str, str]
    pages: list[int] | None = None  # per-kept-span page number, parallel to spans
    bboxes: list | None = None      # per-kept-span layout bbox (or None), parallel


def extract_doc(doc_id: str, spans: list[dict]) -> ExtractResult:
    """Apply the full SPEC to one document."""
    # failure scan (SPEC §2): unknown kind with smallest offset
    unknown = [s for s in spans if s["kind"] not in ALL_KINDS]
    if unknown:
        bad = min(unknown, key=lambda s: s["offset"])
        return ExtractResult(doc_id, [], "failed", {"error": f"unknown kind: {bad['kind']}"}, [], [])

    ordered = sorted(spans, key=lambda s: s["offset"])

    # page derivation (A7 / S8 pages[], reference metadata page_count at
    # docling_service.py:196-207): a 'pageno' span marks a page START, so a
    # span's page = max(1, inclusive count of pageno spans at-or-before it)
    # (front-matter before the first marker belongs to page 1);
    # page_count = number of pageno markers (0 for docs without pages).
    pg = 0
    for s in ordered:
        if s["kind"] == "pageno":
            pg += 1
        s["page"] = max(1, pg)
    page_count = pg
    kinds = {s["kind"] for s in ordered}
    if kinds & HTML_KINDS:
        flavor = FLAVOR_HTML
    elif kinds & PDF_KINDS:
        flavor = FLAVOR_PDF
    else:
        flavor = FLAVOR_PLAIN

    if flavor == FLAVOR_HTML:
        content = _classify_html(ordered)
    elif flavor == FLAVOR_PDF:
        content = _merge_hyphens(_classify_pdf(ordered))
    else:
        content = list(ordered)

    out = [
        OutSpan(kind=s["kind"], text=s["text"], media_ref=s["media_ref"], order=i)
        for i, s in enumerate(content)
    ]
    pages = [s["page"] for s in content]
    # merged hyphen groups keep piece 1's dict (and thus its bbox);
    # inputs without a bbox key yield None per span
    bboxes = [s.get("bbox") for s in content]
    full_text = "\n".join(s.text for s in out if s.kind not in MEDIA_KINDS)
    metadata = {
        "word_count": str(len(full_text.split())),
        "char_count": str(len(full_text)),
        "page_count": str(page_count),
        "has_images": "true" if any(s.kind == "image" for s in out) else "false",
        "has_tables": "true" if any(s.kind == "table" for s in out) else "false",
    }
    return ExtractResult(doc_id, out, "completed", metadata, pages, bboxes)


def _classify_html(ordered: list[dict]) -> list[dict]:
    """SPEC §3.1: priors + neighborhood smoothing."""
    CONTENT, BOILER, UNDECIDED, MEDIA = "c", "b", "u", "m"
    labels: list[str] = []
    for s in ordered:
        k = s["kind"]
        if k in MEDIA_KINDS:
            labels.append(MEDIA)
        elif k in HTML_BOILER_KINDS:
            labels.append(BOILER)
        elif k in HTML_CONTENT_KINDS:
            labels.append(CONTENT)
        elif k in HTML_CANDIDATE_KINDS:
            labels.append(CONTENT if len(s["text"].split()) >= MIN_CONTENT_WORDS else UNDECIDED)
        else:  # caption already covered; PDF kinds impossible in html flavor? keep strict
            labels.append(CONTENT)

    final = list(labels)
    for i, lab in enumerate(labels):
        if lab != UNDECIDED:
            continue
        prev_lab = next((labels[j] for j in range(i - 1, -1, -1) if labels[j] in ("c", "b")), BOILER)
        next_lab = next((labels[j] for j in range(i + 1, len(labels)) if labels[j] in ("c", "b")), BOILER)
        final[i] = CONTENT if (prev_lab == CONTENT and next_lab == CONTENT) else BOILER
    return [s for s, lab in zip(ordered, final) if lab in (CONTENT, MEDIA)]


def _classify_pdf(ordered: list[dict]) -> list[dict]:
    """SPEC §3.2 pass 1: kind priors + repeated-short rule."""
    text_counts = Counter(s["text"] for s in ordered if s["kind"] not in MEDIA_KINDS)
    content: list[dict] = []
    for s in ordered:
        k = s["kind"]
        if k in MEDIA_KINDS:
            content.append(s)
        elif k in PDF_BOILER_KINDS:
            continue
        elif text_counts[s["text"]] >= REPEAT_MIN_COUNT and len(s["text"].split()) <= REPEAT_MAX_WORDS:
            continue
        else:
            content.append(s)
    return content


def _hyph(s: dict) -> bool:
    rt = s["text"].rstrip()
    return s["kind"] == "body" and len(rt) > 1 and rt.endswith("-")


def _merge_hyphens(content: list[dict]) -> list[dict]:
    """SPEC §3.2 hyphen merge. Join decisions are a pure function of the
    ORIGINAL texts; media spans pass through without breaking adjacency."""
    texts = [s for s in content if s["kind"] not in MEDIA_KINDS]
    media = [s for s in content if s["kind"] in MEDIA_KINDS]

    # group consecutive join-runs
    groups: list[list[dict]] = []
    for i, s in enumerate(texts):
        joins = i > 0 and _hyph(texts[i - 1]) and s["kind"] == "body"
        if joins:
            groups[-1].append(s)
        else:
            groups.append([s])

    merged: list[dict] = []
    for g in groups:
        if len(g) == 1:
            merged.append(dict(g[0]))
        else:
            pieces = [g[0]["text"].rstrip()[:-1]]
            pieces += [t["text"].strip()[:-1] for t in g[1:-1]]
            pieces.append(g[-1]["text"].lstrip())
            first = dict(g[0])
            first["text"] = "".join(pieces)
            merged.append(first)

    out = merged + [dict(s) for s in media]
    out.sort(key=lambda s: s["offset"])
    return out
