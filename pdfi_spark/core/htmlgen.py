"""Deterministic Common-Crawl-style HTML page generator (the webtext twin
of pdfgen.py): wraps a document's text in realistic boilerplate — nav
link lists, header branding, aside ad units, link-dense footers — so the
DOM-heuristic stripper (core/html.py) must actively REMOVE markup to
recover the golden text. Every recipe returns ``(page_bytes,
expected_main_text)`` where the expectation is closed-form (the oracle
SQL is just the text column when per_block covers the whole document).

The boilerplate is engineered to be *genuinely* boilerplate-shaped so
classification is earned, not tag-keyed: nav items are 1-word pure
links, ads are 100% link density, the footer mixes copy with enough
links to cross MAX_LINK_DENSITY, and branding is under
MIN_CONTENT_WORDS. Content paragraphs are plain prose (zero links, many
words). Texts shorter than MIN_CONTENT_WORDS words would not classify as
content; the generator asserts against that (driver corpora are far
longer).
"""
from __future__ import annotations

from .html import MIN_CONTENT_WORDS
from .pdfgen import split_blocks, wrap_text

ORACLE_PER_BLOCK = 1_000_000  # single paragraph => expected == input text

_NAV_ITEMS = ["home", "news", "sports", "about"]
_ADS = ["buy cheap deals now", "subscribe premium offer today"]
_FOOTER = (
    '<footer><div>© 2026 example corp · <a href="/p">privacy</a> '
    '<a href="/t">terms</a> <a href="/c">contact</a></div></footer>'
)
_HEAD = (
    "<head><title>example page</title>"
    "<style>body{margin:0}</style>"
    "<script>var t=1;</script></head>"
)


def _nav() -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in _NAV_ITEMS
    )
    return f"<nav><ul>{items}</ul></nav>"


def _aside() -> str:
    ads = "".join(f'<div><a href="/ad">{ad}</a></div>' for ad in _ADS)
    return f"<aside>{ads}</aside>"


def _paragraphs(text: str, per_block: int) -> list[str]:
    blocks = split_blocks(wrap_text(text), per_block)
    paras = [" ".join(block) for block in blocks if block]
    for p in paras:
        assert len(p.split(" ")) >= MIN_CONTENT_WORDS, (
            "content paragraph shorter than MIN_CONTENT_WORDS"
        )
    return paras


# single-pass escape: markup-special chars in the source text must not
# produce broken pages (extraction decodes them back, so expected text
# keeps the RAW characters)
_ESCAPE = str.maketrans({"&": "&amp;", "<": "&lt;", ">": "&gt;"})
# the entities recipe merges a/e/o charref-encoding into the SAME table:
# translating in two passes would corrupt the '&' of an earlier escape
_ESCAPE_AND_CHARREF = str.maketrans({
    "&": "&amp;", "<": "&lt;", ">": "&gt;",
    "a": "&#97;", "e": "&#101;", "o": "&#111;",
})


def _page(body: str) -> bytes:
    return f"<!DOCTYPE html><html>{_HEAD}<body>{body}</body></html>".encode()


def recipe_plain(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Minimal article: paragraphs only, no boilerplate."""
    paras = _paragraphs(text, per_block)
    body = "<article>" + "".join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras) + "</article>"
    return _page(body), "\n".join(paras)


def recipe_boiler(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """The full Common-Crawl shape: head noise + nav + branding header +
    article + ad aside + link-dense footer. Expected output is the
    article text alone."""
    paras = _paragraphs(text, per_block)
    body = (
        _nav()
        + "<header><div>example site</div></header>"
        + "<article>"
        + "".join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras)
        + "</article>"
        + _aside()
        + _FOOTER
    )
    return _page(body), "\n".join(paras)


def recipe_linkfarm(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Content paragraphs interleaved with related-links blocks (each a
    pure link list): classification must drop every other block."""
    paras = _paragraphs(text, per_block)
    related = (
        '<div class="rel"><a href="/r1">related story</a> '
        '<a href="/r2">more coverage</a></div>'
    )
    body = related + related.join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras) + related
    return _page(body), "\n".join(paras)


def recipe_entities(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Character references in the content: a/e/o ride as decimal
    charrefs and must decode back to the exact golden text."""
    paras = _paragraphs(text, per_block)
    body = _nav() + "".join(
        f"<p>{p.translate(_ESCAPE_AND_CHARREF)}</p>" for p in paras
    ) + _FOOTER
    return _page(body), "\n".join(paras)


def recipe_nested(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Content buried four wrapper divs deep, boilerplate at multiple
    nesting levels (block flushes must not double-count wrappers)."""
    paras = _paragraphs(text, per_block)
    inner = "".join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras)
    body = (
        _nav()
        + '<div id="l1"><div id="l2">'
        + _aside()
        + f'<div id="l3"><div id="l4"><article>{inner}</article></div></div>'
        + "</div></div>"
        + _FOOTER
    )
    return _page(body), "\n".join(paras)


def recipe_malformed(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Tag-soup containment: unclosed <b> and <p>, a stray </div>, an
    unquoted attribute — extraction must still recover the text (the
    parser is lenient; errors are contained, never raised)."""
    paras = _paragraphs(text, per_block)
    # <p> never closed: the next <p> (or footer) flushes the block
    body = (
        "</div>"
        + _nav()
        + "<div class=main>"
        + "".join(f"<p><b>{p.translate(_ESCAPE)}" for p in paras)
        + _FOOTER
    )
    return _page(body), "\n".join(paras)


# -- deterministic outlink planting (the Common-Crawl link-graph axis) --
# out-degree and targets are closed-form in doc_id so the DuckDB oracle
# reconstructs the expected edge list with pure SQL arithmetic; strides
# 31/17 keep the ≤4 targets of one page distinct for any corpus ≥ 52 docs
OUTLINK_BASE_DEGREE = 2  # out-degree = 2 + doc_id % 3


def outlink_targets(doc_id: int, n_docs: int) -> list[int]:
    k = OUTLINK_BASE_DEGREE + doc_id % 3
    return [(doc_id * 31 + 17 * i + 7) % n_docs for i in range(k)]


def build_linked_page(doc_id: int, n_docs: int, text: str,
                      per_block: int = 6) -> tuple[bytes, list[int]]:
    """Boiler-shaped page whose article cites other documents via
    ``/doc/{target}`` anchors; extraction must find the planted citation
    links among the page's boilerplate links (nav, ads, footer)."""
    targets = outlink_targets(doc_id, n_docs)
    paras = _paragraphs(text, per_block)
    cites = "".join(
        f'<p>for background see <a href="/doc/{t}">document {t}</a> '
        "and the related coverage</p>"
        for t in targets
    )
    body = (
        _nav()
        + "<article>"
        + "".join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras)
        + cites
        + "</article>"
        + _aside()
        + _FOOTER
    )
    return _page(body), targets


# accent injection for the latin1 recipe: closed-form in SQL
# (replace(text, 'a', 'á') twice-over), and every mapped char is outside
# ASCII so a UTF-8 misdecode of the ISO-8859-1 bytes CANNOT roundtrip —
# the recipe actually proves the charset sniff ran
_ACCENTS = str.maketrans({"a": "á", "e": "é"})  # á é


def recipe_latin1(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """ISO-8859-1 page with a <meta charset> declaration and accented
    content: extraction must prescan the charset, decode latin-1, and
    recover the accented golden text exactly."""
    accented = text.translate(_ACCENTS)
    # total on any input: chars outside latin-1 become '?' BEFORE the
    # golden text is fixed, so page and expectation stay in lockstep
    accented = accented.encode("iso-8859-1", "replace").decode("iso-8859-1")
    paras = _paragraphs(accented, per_block)
    body = (
        _nav()
        + "<article>"
        + "".join(f"<p>{p.translate(_ESCAPE)}</p>" for p in paras)
        + "</article>"
        + _FOOTER
    )
    page = (
        "<!DOCTYPE html><html><head><title>example page</title>"
        '<meta charset="iso-8859-1"></head>'
        f"<body>{body}</body></html>"
    ).encode("iso-8859-1")
    return page, "\n".join(paras)


HTML_RECIPES = {
    "plain": recipe_plain,
    "boiler": recipe_boiler,
    "linkfarm": recipe_linkfarm,
    "entities": recipe_entities,
    "nested": recipe_nested,
    "malformed": recipe_malformed,
    "latin1": recipe_latin1,
}


def build_html(text: str, recipe: str = "boiler",
               per_block: int = 6) -> tuple[bytes, str]:
    return HTML_RECIPES[recipe](text, per_block)
