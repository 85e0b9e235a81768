"""HTML tokenizer + DOM-lite block walk + text/link-density scoring.

Main-content selection in the spirit of Arc90 Readability / Boilerpipe
(see PAPERS.md; "Boilerplate Detection using Shallow Text Features", WSDM 2010):
segment the document into text blocks at block-level tag boundaries, score each
block by text length and link density, keep high-density non-boilerplate
blocks. This generalizes the reference's body-part selection
(``/root/reference/src/services/imap_service.py:184-191`` — pick the text/plain
part out of a multipart tree) from "pick one MIME leaf" to "pick the
main-content blocks of a tag tree".

Pure stdlib, single forward pass, O(len(html)). Deterministic: whitespace is
collapsed exactly once per block, entities decoded exactly once per text node.
"""

from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field
from typing import List, Tuple

# Tags whose subtree is boilerplate by construction (Arc90 "negative" classes).
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside"})
# Tags whose content is never text (dropped wholesale).
DROP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head"})
# Block-level boundaries: opening/closing one of these flushes the current block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
        "blockquote", "pre", "article", "section", "main", "ul", "ol",
        "table", "tr", "title", "body", "html", "dd", "dt", "dl",
        "figure", "figcaption", "form", "fieldset", "address",
    }
    | BOILERPLATE_TAGS
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "title"})
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

_TOKEN_RE = re.compile(
    r"<!--.*?-->"                                   # comment
    r"|<!\[CDATA\[.*?\]\]>"                         # cdata
    r"|<!(?:[^>]*)>"                                 # doctype / decls
    r"|<(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>"
    r"|([^<]+)",
    re.DOTALL,
)

_MARKUP_HINT_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|h[1-6]|span|a|b|i|em|strong|table|tr|td|br|blockquote|pre|code)\b",
    re.IGNORECASE,
)

_WS_RE = re.compile(r"\s+")


def looks_like_markup(text: str) -> bool:
    """Cheap sniff: does this look like an HTML fragment (tags without an
    <html> wrapper)? Used by the kernel's payload sniffer."""
    return _MARKUP_HINT_RE.search(text) is not None


def _collapse(s: str) -> str:
    # identical semantics to _WS_RE.sub(" ", s).strip() — str.split() uses
    # the same Unicode whitespace set as \s — but ~3x faster in the hot loop
    return " ".join(s.split())


@dataclass
class Block:
    """One text block with its provenance into the raw string."""

    tag: str  # deepest block-level element open when the block was flushed
    text: str = ""  # entity-decoded, whitespace-collapsed
    link_chars: int = 0
    raw_start: int = -1  # offset of first contributing text node in raw html
    raw_end: int = -1  # end offset of last contributing text node
    boilerplate: bool = False

    @property
    def is_heading(self) -> bool:
        return self.tag in HEADING_TAGS

    @property
    def link_density(self) -> float:
        return (self.link_chars / len(self.text)) if self.text else 0.0


@dataclass
class _Walker:
    stack: List[str] = field(default_factory=list)
    drop_depth: int = 0
    anchor_depth: int = 0
    # Incremental twins of the stack scans the hot flush() used to do:
    # block_stack mirrors the BLOCK_TAGS members of ``stack`` (in order),
    # boiler_depth counts the BOILERPLATE_TAGS members. Both are kept in
    # lockstep with every push AND every implicit pop, so
    # block_stack[-1] / boiler_depth > 0 equal the old O(depth) scans.
    block_stack: List[str] = field(default_factory=list)
    boiler_depth: int = 0
    parts: List[str] = field(default_factory=list)
    link_len: int = 0
    start: int = -1
    end: int = -1
    blocks: List[Block] = field(default_factory=list)

    def flush(self) -> None:
        if not self.parts:
            return
        text = _collapse("".join(self.parts))
        if text:
            self.blocks.append(
                Block(
                    tag=self.block_stack[-1] if self.block_stack else "body",
                    text=text,
                    link_chars=min(self.link_len, len(text)),
                    raw_start=self.start,
                    raw_end=self.end,
                    boilerplate=self.boiler_depth > 0,
                )
            )
        self.parts = []
        self.link_len = 0
        self.start = -1
        self.end = -1

    def text_node(self, raw: str, start: int, end: int) -> None:
        if self.drop_depth > 0:
            return
        decoded = _htmllib.unescape(raw)
        if not decoded or decoded.isspace():
            # pure-whitespace node: contributes separation, not provenance
            if self.parts:
                self.parts.append(" ")
            return
        if self.start == -1:
            self.start = start
        self.end = end
        self.parts.append(decoded)
        if self.anchor_depth > 0:
            self.link_len += len(_collapse(decoded))


def extract_blocks(
    html: str,
    *,
    min_block_chars: int = 25,
    min_heading_chars: int = 8,
    max_link_density: float = 0.33,
    keep_all: bool = False,
) -> List[Block]:
    """Tokenize ``html`` and return the kept content blocks in document order.

    ``keep_all`` (fragment mode) keeps every non-boilerplate block regardless
    of density — the analog of extracting the whole selected body part rather
    than scoring a full document.
    """
    w = _Walker()
    for m in _TOKEN_RE.finditer(html):
        # lastindex discriminates the alternation in O(1): 5 = text node,
        # 4 = tag (groups 1-4 all participate, group 4 is highest),
        # None = comment / doctype / cdata.
        li = m.lastindex
        if li == 5:  # text node
            w.text_node(m.group(5), m.start(5), m.end(5))
            continue
        if li != 4:  # comment / doctype / cdata
            continue
        slash, tag, close_slash = m.group(1, 2, 4)
        tag = tag.lower()
        closing = slash == "/"
        self_closing = close_slash == "/" or tag in VOID_TAGS

        if not closing and self_closing:
            if tag == "br" and w.parts:
                w.parts.append(" ")
            continue

        if closing:
            if tag in BLOCK_TAGS:
                w.flush()
            if tag in DROP_TAGS:
                if w.drop_depth > 0:
                    w.drop_depth -= 1
            if tag == "a" and w.anchor_depth > 0:
                w.anchor_depth -= 1
            # pop to matching open tag if present; implicit pops keep the
            # incremental block/boiler state in lockstep with the stack
            if tag in w.stack:
                while w.stack:
                    t = w.stack.pop()
                    if t in BLOCK_TAGS:
                        w.block_stack.pop()
                        if t in BOILERPLATE_TAGS:
                            w.boiler_depth -= 1
                    if t == tag:
                        break
        else:
            if tag in BLOCK_TAGS:
                w.flush()
                w.block_stack.append(tag)
                if tag in BOILERPLATE_TAGS:
                    w.boiler_depth += 1
            if tag in DROP_TAGS:
                w.drop_depth += 1
            if tag == "a":
                w.anchor_depth += 1
            w.stack.append(tag)
    w.flush()

    kept: List[Block] = []
    for b in w.blocks:
        if b.boilerplate:
            continue
        if keep_all:
            kept.append(b)
            continue
        if b.link_density >= max_link_density:
            continue
        if b.is_heading:
            if len(b.text) >= min_heading_chars:
                kept.append(b)
        elif len(b.text) >= min_block_chars:
            kept.append(b)
    if not keep_all:
        # Headings only count as content when followed by a body block (a
        # heading-only document is boilerplate) — deterministic trailing prune.
        while kept and kept[-1].is_heading:
            kept.pop()
    return kept
