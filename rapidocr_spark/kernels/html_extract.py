"""DOM-heuristic main-content extraction (boilerplate stripping).

The north rule pairs the det→cls→rec chain with "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" for markup payloads.  The reference
contributes the *shape*, not code (SURVEY.md §2.8 tail): region proposal
(block segmentation ≈ K4), region scoring/filtering (text-density
thresholds ≈ F3–F7), and reading-order assembly (≈ W1/W2).

Readability/boilerpipe-style heuristic on stdlib html.parser:

1. segment the DOM into block-level regions (block "proposal");
2. score each block: text length, link density (chars inside <a> / total),
   boilerplate tag/class–id patterns (nav, footer, ads, sidebar, ...);
3. keep blocks whose score clears the thresholds (the det box_thresh
   analog);
4. assemble kept blocks in document order, lines joined by '\n' — the same
   assembly contract as the bitmap path (.NET StrRes, OcrLite.cs:139-147).

Pure stdlib + deterministic: it is both the executor kernel and the
single-node oracle.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "body", "li", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "figcaption",
}
SKIP_SUBTREE_TAGS = {
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "iframe", "svg", "template", "button", "select", "title",
}
VOID_TAGS = {"br", "img", "hr", "input", "meta", "link", "area", "base",
             "col", "embed", "source", "track", "wbr"}
_BOILER_PAT = re.compile(
    r"(?:^|[-_ ])(?:ad|ads|advert|banner|promo|sponsor|sidebar|comment|"
    r"share|social|related|breadcrumb|menu|nav|footer|header|cookie|popup|"
    r"subscribe|newsletter)(?:$|[-_ ])",
    re.IGNORECASE,
)
MIN_BLOCK_CHARS = 3
MAX_LINK_DENSITY = 0.5


@dataclass
class _Block:
    order: int
    chars: list[str] = field(default_factory=list)
    link_chars: int = 0
    boiler: bool = False

    def text(self) -> str:
        return re.sub(r"[ \t\r\f\v]+", " ", "".join(self.chars)).strip()


@dataclass
class _Elem:
    tag: str
    boiler: bool
    skip: bool
    block: _Block | None


class _Extractor(HTMLParser):
    """Element-stack parser: boiler/skip state scopes to the element's
    subtree and unwinds correctly on (possibly mismatched) end tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._stack: list[_Elem] = []
        self._order = 0

    # -- state helpers -----------------------------------------------------
    def _in_skip(self) -> bool:
        return any(e.skip for e in self._stack)

    def _in_boiler(self) -> bool:
        return any(e.boiler for e in self._stack)

    def _cur_block(self) -> _Block | None:
        for e in reversed(self._stack):
            if e.block is not None:
                return e.block
        return None

    def _in_anchor(self) -> bool:
        return any(e.tag == "a" for e in self._stack)

    # -- parser hooks ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in VOID_TAGS:
            if tag == "br":
                blk = self._cur_block()
                if blk is not None and not self._in_skip():
                    blk.chars.append("\n")
            return
        attr_blob = " ".join(v or "" for k, v in attrs if k in ("class", "id", "role"))
        boiler = bool(_BOILER_PAT.search(attr_blob)) or any(
            k == "role" and v in ("navigation", "banner", "contentinfo")
            for k, v in attrs
        )
        skip = tag in SKIP_SUBTREE_TAGS
        block: _Block | None = None
        if tag in BLOCK_TAGS and not self._in_skip() and not skip:
            block = _Block(order=self._order, boiler=boiler or self._in_boiler())
            self._order += 1
            self.blocks.append(block)
        self._stack.append(_Elem(tag, boiler, skip, block))

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "br":
            blk = self._cur_block()
            if blk is not None and not self._in_skip():
                blk.chars.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # pop to the nearest matching open tag (tolerate malformed nesting)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if self._in_skip():
            return
        blk = self._cur_block()
        if blk is None:
            return
        blk.chars.append(data)
        if self._in_anchor():
            blk.link_chars += len(data.strip())
        if self._in_boiler():
            blk.boiler = True


def extract_main_content(markup: str) -> str:
    """Markup → main-content text, blocks in document order, '\n'-joined."""
    parser = _Extractor()
    try:
        parser.feed(markup)
        parser.close()
    except Exception:  # noqa: BLE001 — malformed markup degrades, never crashes
        pass
    kept: list[tuple[int, str]] = []
    for blk in parser.blocks:
        txt = blk.text()
        if not txt or len(txt) < MIN_BLOCK_CHARS:
            continue
        if blk.boiler:
            continue
        if blk.link_chars / max(len(txt), 1) > MAX_LINK_DENSITY:
            continue
        kept.append((blk.order, txt))
    kept.sort(key=lambda t: t[0])  # document order = reading order (W2 analog)
    lines: list[str] = []
    for _, txt in kept:
        lines.extend(s.strip() for s in txt.split("\n") if s.strip())
    return "\n".join(lines)
