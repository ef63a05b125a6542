"""Page rendering pipeline and document-level assembly:
content stream -> TextSpans -> lines/words/columns/paragraphs -> sections
-> Paper -> flattened string.

Re-expresses /root/reference/graphics/index.ts (renderLayout,
groupSections, paperFromParagraphs) and /root/reference/index.ts:49-53
(string flattening).
"""
from __future__ import annotations

import re

from .content import TextAtomDrawingContext
from .encoding import normalize
from .geometry import make_rectangle, transform_point
from .layout import group_columns, group_lines, partition_words, split_paragraphs
from .util import Multiset, quantile, unwrap_lines


def render_text_spans(outer_bounds: dict, content_stream_buffer: bytes,
                      resources) -> list[dict]:
    """Interpret a content stream and flip to a top-left origin: the
    TextSpan sequence BEFORE clustering (reference graphics/index.ts:36-45).
    Also the row type of the exploded-DataFrame layout demo (SURVEY §7.0)."""
    text_atoms: list[dict] = []
    context = TextAtomDrawingContext(text_atoms, resources)
    context.apply_content_stream(content_stream_buffer)
    d_y = outer_bounds["maxY"] - outer_bounds["minY"]
    text_spans = []
    for span in text_atoms:
        min_x, min_y = transform_point(span["x"], span["y"], 1, 0, 0, -1, 0, d_y)
        font = span["font"]
        text_spans.append({
            "minX": min_x,
            "minY": min_y,
            "maxX": min_x + span["width"],
            "maxY": min_y + span["height"],
            "text": span["text"],
            "buffer": span["buffer"],
            "fontName": span["fontName"],
            "fontSize": span["height"],
            "fontBold": font.bold,
            "fontItalic": font.italic,
        })
    return text_spans


def page_text_spans(page) -> list[dict]:
    """Pre-clustering TextSpans for one page."""
    media_box = page.media_box
    outer_bounds = make_rectangle(media_box[0], media_box[1], media_box[2], media_box[3])
    return render_text_spans(outer_bounds, page.join_contents(b"\n"), page.resources)


def render_layout(outer_bounds: dict, content_stream_buffer: bytes, resources) -> list[dict]:
    """Interpret a content stream, flip to a top-left origin, and cluster
    into paragraphs-of-lines-of-wordgroups-of-spans
    (reference graphics/index.ts:36-62)."""
    text_spans = render_text_spans(outer_bounds, content_stream_buffer, resources)
    lines = group_lines(text_spans)
    line_containers = [
        {
            "minX": ln["minX"], "minY": ln["minY"],
            "maxX": ln["maxX"], "maxY": ln["maxY"],
            "elements": partition_words(ln["elements"]),
        }
        for ln in lines
    ]
    columns = group_columns(line_containers)
    paragraphs = []
    for column in columns:
        paragraphs.extend(split_paragraphs(column))
    return paragraphs


def render_layout_from_page(page) -> list[dict]:
    media_box = page.media_box
    outer_bounds = make_rectangle(media_box[0], media_box[1], media_box[2], media_box[3])
    return render_layout(outer_bounds, page.join_contents(b"\n"), page.resources)


def _iter_spans(paragraph: dict):
    for line in paragraph["elements"]:
        for word_group in line["elements"]:
            yield from word_group["elements"]


def group_sections(paragraphs: list[dict], header_font_size: float) -> list[dict]:
    """Stateful fold: an all-header-sized or leading-all-bold paragraph
    starts a new section; whitespace paragraphs route to title vs body by
    position (reference graphics/index.ts:85-126)."""
    sections: list[dict] = []
    current = {"title": [], "paragraphs": []}
    for paragraph in paragraphs:
        spans = list(_iter_spans(paragraph))
        is_header_sized = all(s["fontSize"] > header_font_size for s in spans)
        font_bold = all(s["fontBold"] for s in spans)
        is_leading_bold = font_bold and len(current["paragraphs"]) == 0
        is_whitespace = all(not re.search(r"\S", s["text"]) for s in spans)
        if is_whitespace:
            if current["paragraphs"]:
                current["paragraphs"].append(paragraph)
            else:
                current["title"].append(paragraph)
        elif is_header_sized or is_leading_bold:
            if current["paragraphs"]:
                sections.append(current)
                current = {"title": [], "paragraphs": []}
            current["title"].append(paragraph)
        else:
            current["paragraphs"].append(paragraph)
    sections.append(current)
    return sections


def join_paragraph(paragraph: dict, bag_of_words: Multiset) -> str:
    """Words joined '', word-groups ' ', then dehyphenate + normalize
    (reference graphics/index.ts:128-133)."""
    lines = []
    for line in paragraph["elements"]:
        lines.append(
            " ".join(
                "".join(span["text"] for span in word_group["elements"])
                for word_group in line["elements"]
            )
        )
    return normalize(unwrap_lines(lines, bag_of_words))


def paper_from_paragraphs(paragraphs: list[dict]) -> dict:
    """Document-level aggregation: 75th-percentile font size sets the
    header threshold (+0.5); a whole-document bag-of-words feeds
    dehyphenation (reference graphics/index.ts:142-177)."""
    spans = [s for p in paragraphs for s in _iter_spans(p)]
    font_sizes = [s["fontSize"] for s in spans]
    if font_sizes:
        content_font_size = quantile(font_sizes, 4)[3]
    else:
        content_font_size = 0.0
    header_font_size = content_font_size + 0.5

    bag_of_words = Multiset()
    for paragraph in paragraphs:
        for line in paragraph["elements"]:
            for word_group in line["elements"]:
                word = "".join(span["text"] for span in word_group["elements"])
                bag_of_words.add(word.lower())

    sections = group_sections(paragraphs, header_font_size)
    paper_sections = []
    for section in sections:
        title = " ".join(join_paragraph(p, bag_of_words) for p in section["title"])
        body = [join_paragraph(p, bag_of_words) for p in section["paragraphs"]]
        paper_sections.append({"title": title, "paragraphs": body})
    return {"sections": paper_sections}


def paper_to_string(paper: dict) -> str:
    """'# {title}\\n{paragraphs..}' joined with blank lines
    (reference index.ts:49-53)."""
    return "\n\n".join(
        "# {}\n{}".format(section["title"], "\n".join(section["paragraphs"]))
        for section in paper["sections"]
    )
