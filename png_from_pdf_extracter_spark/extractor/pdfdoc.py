"""Parser for the simplified PDF-like text-layer payload.

The reference shells out to ImageMagick/GhostScript to fan one PDF out into N
page images (``/root/reference/src/services/pdf_converter.py:50-160``). We
re-express that as an in-process text-layer walk over a *simplified PDF-like
grammar* (defined here and produced by ``datagen/``; the image/pdf decode libs
are not in this container, so the structural walk is the real, tested part):

    %PDF-1.4
    1 0 obj << /Type /Page >> stream
    BT (Hello world) Tj ET
    BT (Second segment) Tj ET
    endstream endobj
    ... more page objects ...
    trailer << /Root 1 0 R >>
    %%EOF

Classification table (mirrors ``pdf_converter.py:100-139``):
- ``/Encrypt`` anywhere            -> protected   (stderr "password|encrypted")
- missing ``%%EOF`` terminator     -> corrupted   (stderr "corrupt|invalid")
- zero ``/Type /Page`` objects     -> zero pages  ("PDF may be empty")
- else N pages in document order, text per page = newline-joined Tj segments,
  spans pointing at the raw segment bytes inside the parentheses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

ERR_PROTECTED = "protected"
ERR_CORRUPTED = "corrupted"

_PAGE_RE = re.compile(
    r"\d+\s+\d+\s+obj\s*<<[^>]*?/Type\s*/Page\b[^>]*?>>(.*?)endobj",
    re.DOTALL,
)
# "unrolled loop" form of (?:\\.|[^\\()])* — same language (a run of
# non-special chars, then any number of escape+run tails), but ~3x faster
# in CPython's backtracking engine because the common no-escape case is a
# single character-class scan instead of a per-character alternation.
_TJ_RE = re.compile(r"\(([^\\()]*(?:\\.[^\\()]*)*)\)\s*Tj")
_UNESCAPE_RE = re.compile(r"\\([()\\nrt])")
_UNESCAPE_MAP = {"(": "(", ")": ")", "\\": "\\", "n": "\n", "r": "\r", "t": "\t"}


def _unescape(s: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _UNESCAPE_MAP[m.group(1)], s)


def escape_text(s: str) -> str:
    """Inverse of ``_unescape`` — used by the data generator."""
    return (
        s.replace("\\", r"\\")
        .replace("(", r"\(")
        .replace(")", r"\)")
        .replace("\n", r"\n")
        .replace("\r", r"\r")
        .replace("\t", r"\t")
    )


@dataclass
class Page:
    text: str
    spans: List[Tuple[int, int]] = field(default_factory=list)  # raw offsets


@dataclass
class Parsed:
    pages: List[Page] = field(default_factory=list)
    error: Optional[str] = None


def parse(blob: str) -> Parsed:
    """Parse a PDF-like blob (already sliced to start at ``%PDF-``)."""
    if "/Encrypt" in blob:
        return Parsed(error=ERR_PROTECTED)
    if "%%EOF" not in blob:
        return Parsed(error=ERR_CORRUPTED)

    pages: List[Page] = []
    for pm in _PAGE_RE.finditer(blob):
        body_start = pm.start(1)
        body = pm.group(1)
        seg_texts: List[str] = []
        spans: List[Tuple[int, int]] = []
        for tm in _TJ_RE.finditer(body):
            s = tm.group(1)
            # skip the sub() entirely for the common escape-free segment
            seg_texts.append(_unescape(s) if "\\" in s else s)
            b, e = tm.span(1)
            spans.append((body_start + b, body_start + e))
        pages.append(Page(text="\n".join(seg_texts), spans=spans))
    return Parsed(pages=pages)
