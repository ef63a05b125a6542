"""Main-content extraction for HTML pages — the north-rule's "HTML
boilerplate strip, DOM heuristics" axis, built from scratch on stdlib
``html.parser`` (no external deps, Spark-free like the rest of core/).

Model (the classic Boilerpipe/jusText/Readability signal set,
re-implemented, not ported):

1. Parse the page into text BLOCKS: a block is the text run delimited by
   block-level tag boundaries (p, div, li, h1..h6, td, ...). Inline tags
   (a, b, span, em, ...) do NOT break a block. Subtrees that can never
   contain content (script, style, noscript, template, head, svg,
   iframe) are dropped structurally.
2. Score each block with DOM heuristics:
   - word count (boilerplate runs short: nav items, copyright lines);
   - link density = words under <a> / words (navigation, related-links,
     tag clouds and footers are link-dense; body prose is not).
3. A block is CONTENT iff it has >= MIN_CONTENT_WORDS words and link
   density <= MAX_LINK_DENSITY. Main text = content blocks joined with
   a newline.

The thresholds are the published ones (Boilerpipe's densometric
classifier treats ~1/3 link density as the boilerplate boundary; jusText
uses short-block pruning); they are constants here so the DuckDB oracle
can mirror classification decisions exactly on generator-built pages.

Malformed input is contained, never raised: ``html.parser`` is lenient
by design, bytes are decoded via charset sniffing (BOM > <meta charset>
prescan > UTF-8, HTML5 §13.2.3.2 simplified) with replacement, and a
page with no content blocks extracts to the empty string.
"""
from __future__ import annotations

import codecs
import re
from html.parser import HTMLParser

MIN_CONTENT_WORDS = 4
MAX_LINK_DENSITY = 1 / 3

# tags whose entire subtree is dropped (never contains readable text).
# `head` is deliberately NOT here: html.parser does no implicit closing,
# so a page with an omitted </head> (spec-legal, common in the wild)
# would leave the drop-depth stuck and silently swallow the whole page.
# head's only text-bearing child is <title>, which is dropped directly;
# meta/link/base contribute no text.
_DROP_SUBTREE = frozenset(
    "script style noscript template title svg iframe object embed".split()
)
# tags that delimit text blocks; everything else is inline
_BLOCK_TAGS = frozenset(
    "p div section article main li ul ol td th tr table h1 h2 h3 h4 h5 h6 "
    "pre blockquote figcaption figure nav header footer aside form dl dt dd "
    "hr br body html head".split()
)

_WS_RE = re.compile(r"\s+")

# HTML5 §13.2.3.2 prescan, simplified: BOM first, else a <meta charset>
# / <meta http-equiv="content-type"> declaration in the first 1024
# bytes, else UTF-8. The meta scan is byte-level ASCII (charset names
# are ASCII by construction) so it works before any decode. Comments in
# the window are skipped like the spec's tokenizer; declarations inside
# script strings are a known (rare) over-match.
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I
)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
_PRESCAN_BYTES = 1024


def sniff_charset(page: bytes) -> str:
    """Detect a page's encoding: BOM > meta declaration > utf-8."""
    if page[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if page[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    head = _COMMENT_RE.sub(b"", page[:_PRESCAN_BYTES])
    # an unterminated comment swallows the rest of the window
    open_comment = head.find(b"<!--")
    if open_comment >= 0:
        head = head[:open_comment]
    m = _META_CHARSET_RE.search(head)
    if m:
        try:
            name = m.group(1).decode("ascii")
            resolved = codecs.lookup(name).name
            # spec: utf-16 meta labels remap to UTF-8 (an ASCII-readable
            # declaration cannot itself be utf-16 encoded)
            if resolved.startswith("utf-16") or resolved.startswith("utf-32"):
                return "utf-8"
            return name
        except LookupError:
            pass
    return "utf-8"


def decode_page(page: bytes | str) -> str:
    """Charset-sniffed lenient decode (errors replaced, never raised)."""
    if isinstance(page, str):
        return page
    page = bytes(page)
    try:
        return page.decode(sniff_charset(page), errors="replace")
    except Exception:  # noqa: BLE001 — codecs like idna reject errors=
        return page.decode("utf-8", errors="replace")


class _BlockCollector(HTMLParser):
    """Streams the document into (text, n_words, n_link_words) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        # words are counted per ANCHOR, not per concatenated link text:
        # adjacent <a>x</a><a>y</a> must count 2 words even though the
        # inter-anchor whitespace lives outside both anchors
        self._anchor_parts: list[str] = []
        self._link_words = 0
        self._drop_depth = 0
        self._link_depth = 0

    def _close_anchor(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._anchor_parts)).strip()
        self._anchor_parts.clear()
        if text:
            self._link_words += len(text.split(" "))

    def _flush(self) -> None:
        if self._anchor_parts:
            self._close_anchor()
        text = _WS_RE.sub(" ", "".join(self._parts)).strip()
        self._parts.clear()
        n_link_words = self._link_words
        self._link_words = 0
        if not text:
            return
        self.blocks.append(
            {
                "text": text,
                "n_words": len(text.split(" ")),
                "n_link_words": n_link_words,
            }
        )

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            if self._link_depth == 0:
                self._close_anchor()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if not self._drop_depth and tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._parts.append(data)
        if self._link_depth:
            self._anchor_parts.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


class _LinkCollector(HTMLParser):
    """Collects every anchor's (href, text) in document order, skipping
    non-content subtrees (script/style/svg/...) like the block parser.
    A nested <a> auto-closes the open anchor first (anchors cannot nest
    in the DOM; browsers emit them as siblings with disjoint text)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[dict] = []
        self._drop_depth = 0
        self._frames: list[tuple[str | None, list[str]]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            if self._frames:  # nested <a>: auto-close the open anchor
                self._emit()
            href = next((v for k, v in attrs if k == "href"), None)
            self._frames.append((href, []))

    def _emit(self) -> None:
        href, parts = self._frames.pop()
        if href is not None:
            text = _WS_RE.sub(" ", "".join(parts)).strip()
            self.links.append({"href": href, "text": text})

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_SUBTREE:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "a" and self._frames:
            self._emit()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        for _, parts in self._frames:
            parts.append(data)


def parse_links(page: bytes | str) -> list[dict]:
    """Page bytes -> anchors in document order: dicts of href (attribute
    value, charrefs decoded) and text (whitespace-flattened anchor text).
    href-less anchors (<a name=...>) are omitted; unclosed anchors at EOF
    are dropped (no reliable text extent)."""
    page = decode_page(page)
    collector = _LinkCollector()
    collector.feed(page)
    collector.close()
    return collector.links


def parse_blocks(page: bytes | str) -> list[dict]:
    """Page bytes -> scored blocks: each dict has text, n_words,
    n_link_words, link_density, is_content."""
    page = decode_page(page)
    collector = _BlockCollector()
    collector.feed(page)
    collector.close()
    out = []
    for b in collector.blocks:
        density = b["n_link_words"] / b["n_words"] if b["n_words"] else 0.0
        out.append(
            {
                **b,
                "link_density": density,
                "is_content": (
                    b["n_words"] >= MIN_CONTENT_WORDS
                    and density <= MAX_LINK_DENSITY
                ),
            }
        )
    return out


def extract_main_text(page: bytes | str) -> str:
    """Boilerplate-stripped main text: content blocks joined by \\n."""
    return "\n".join(b["text"] for b in parse_blocks(page) if b["is_content"])


def block_stats(page: bytes | str) -> dict:
    """Per-page DOM-heuristic summary (content/boilerplate split)."""
    blocks = parse_blocks(page)
    content = [b for b in blocks if b["is_content"]]
    boiler = [b for b in blocks if not b["is_content"]]
    return {
        "n_blocks": len(blocks),
        "n_content_blocks": len(content),
        "n_boiler_blocks": len(boiler),
        "n_content_words": sum(b["n_words"] for b in content),
        "n_boiler_words": sum(b["n_words"] for b in boiler),
    }
