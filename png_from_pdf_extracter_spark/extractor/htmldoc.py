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
from dataclasses import dataclass
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


# whitespace collapse in the hot loop is ``" ".join(s.split())`` — identical
# semantics to ``_WS_RE.sub(" ", s).strip()`` (str.split() uses the same
# Unicode whitespace set as \s) but ~3x faster; inlined at its use sites


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

    The walker state lives in flat locals and flush/text_node are inlined:
    this loop runs once per token of a 100 TB corpus' HTML payloads, and in
    CPython the attribute/method dispatch of the earlier dataclass walker was
    ~25% of kernel time (output pinned identical by the pipeline-equality
    suite, goldens, and property tests). ``block_stack`` mirrors the
    BLOCK_TAGS members of ``stack`` (in order) and ``boiler_depth`` counts
    the BOILERPLATE_TAGS members — incremental twins of the O(depth) scans a
    naive flush would do, kept in lockstep on every push and implicit pop.
    """
    stack: List[str] = []
    drop_depth = 0
    anchor_depth = 0
    block_stack: List[str] = []
    boiler_depth = 0
    parts: List[str] = []
    link_len = 0
    start = -1
    end = -1
    blocks: List[Block] = []
    unescape = _htmllib.unescape
    parts_append = parts.append  # parts is cleared in place, never rebound
    blocks_append = blocks.append

    for m in _TOKEN_RE.finditer(html):
        # lastindex discriminates the alternation in O(1): 5 = text node,
        # 4 = tag (groups 1-4 all participate, group 4 is highest),
        # None = comment / doctype / cdata.
        li = m.lastindex
        if li == 5:  # text node (inlined text_node)
            if drop_depth == 0:
                decoded = unescape(m[5])
                if not decoded or decoded.isspace():
                    # pure-whitespace node: separation, not provenance
                    if parts:
                        parts_append(" ")
                else:
                    if start == -1:
                        start = m.start(5)
                    end = m.end(5)
                    parts_append(decoded)
                    if anchor_depth > 0:
                        link_len += len(" ".join(decoded.split()))
            continue
        if li != 4:  # comment / doctype / cdata
            continue
        tag = m[2].lower()
        closing = m[1] == "/"
        self_closing = m[4] == "/" or tag in VOID_TAGS

        if not closing and self_closing:
            if tag == "br" and parts:
                parts_append(" ")
            continue

        if closing:
            if tag in BLOCK_TAGS:
                if parts:  # inlined flush
                    text = " ".join("".join(parts).split())
                    if text:
                        blocks_append(Block(
                            tag=block_stack[-1] if block_stack else "body",
                            text=text,
                            link_chars=min(link_len, len(text)),
                            raw_start=start,
                            raw_end=end,
                            boilerplate=boiler_depth > 0,
                        ))
                    parts.clear()
                    link_len = 0
                    start = -1
                    end = -1
            if tag in DROP_TAGS:
                if drop_depth > 0:
                    drop_depth -= 1
            if tag == "a" and anchor_depth > 0:
                anchor_depth -= 1
            # pop to matching open tag if present; implicit pops keep the
            # incremental block/boiler state in lockstep with the stack
            if tag in stack:
                while stack:
                    t = stack.pop()
                    if t in BLOCK_TAGS:
                        block_stack.pop()
                        if t in BOILERPLATE_TAGS:
                            boiler_depth -= 1
                    if t == tag:
                        break
        else:
            if tag in BLOCK_TAGS:
                if parts:  # inlined flush
                    text = " ".join("".join(parts).split())
                    if text:
                        blocks_append(Block(
                            tag=block_stack[-1] if block_stack else "body",
                            text=text,
                            link_chars=min(link_len, len(text)),
                            raw_start=start,
                            raw_end=end,
                            boilerplate=boiler_depth > 0,
                        ))
                    parts.clear()
                    link_len = 0
                    start = -1
                    end = -1
                block_stack.append(tag)
                if tag in BOILERPLATE_TAGS:
                    boiler_depth += 1
            if tag in DROP_TAGS:
                drop_depth += 1
            if tag == "a":
                anchor_depth += 1
            stack.append(tag)
    if parts:  # final flush
        text = " ".join("".join(parts).split())
        if text:
            blocks_append(Block(
                tag=block_stack[-1] if block_stack else "body",
                text=text,
                link_chars=min(link_len, len(text)),
                raw_start=start,
                raw_end=end,
                boilerplate=boiler_depth > 0,
            ))

    kept: List[Block] = []
    for b in blocks:
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
