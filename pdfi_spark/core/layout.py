"""Layout clustering: ordered sessionization folds over span sequences
(reference /root/reference/graphics/layout.ts). Each operator starts a new
group when the gap to the previous element exceeds a threshold — the
lag->flag->cumsum->groupBy pattern, kept sequential in-document for exact
tie-breaking (see SURVEY.md §7.0)."""
from __future__ import annotations

from .geometry import INF, add_elements, distance_to_rectangle, make_container
from .util import median


def group_lines(elements: list[dict], dy_threshold: float = 5.0) -> list[dict]:
    """New line when |minY - currentContainer.minY| > threshold
    (layout.ts:30-52). 5 is approximately half the mean font size."""
    containers: list[dict] = []
    current: dict | None = None
    for element in elements:
        dy = (element["minY"] - current["minY"]) if current is not None else INF
        if abs(dy) > dy_threshold:
            if current is not None:
                containers.append(current)
            current = make_container()
        add_elements(current, element)
    if current is not None:
        containers.append(current)
    return containers


def group_columns(
    elements: list[dict], threshold_dx: float = 0.0, threshold_dy: float = 5.0
) -> list[dict]:
    """New column when the rect-gap to the previous element exceeds
    (dx, dy) thresholds (layout.ts:57-80)."""
    containers: list[dict] = []
    current: dict | None = None
    previous: dict | None = None
    for element in elements:
        dx, dy = (
            distance_to_rectangle(previous, element) if previous is not None else (INF, INF)
        )
        if dx > threshold_dx or dy > threshold_dy:
            if current is not None:
                containers.append(current)
            current = make_container()
        add_elements(current, element)
        previous = element
    if current is not None:
        containers.append(current)
    return containers


def partition_words(elements: list[dict], space_width: float = 1.0) -> list[dict]:
    """Within a line: new word-group when minX - prev.maxX > spaceWidth
    (layout.ts:87-108)."""
    containers: list[dict] = []
    current: dict | None = None
    previous: dict | None = None
    for element in elements:
        dx = (element["minX"] - previous["maxX"]) if previous is not None else 0.0
        if dx > space_width or current is None:
            if current is not None:
                containers.append(current)
            current = make_container()
        add_elements(current, element)
        previous = element
    if current is not None:
        containers.append(current)
    return containers


def median_left_offset(container: dict, elements: list[dict]) -> float:
    """Median of element-vs-container left offsets; for exactly 2 elements
    the SECOND is 'typical' (the first signals a paragraph change)
    (layout.ts:117-126)."""
    left_offsets = [el["minX"] - container["minX"] for el in elements]
    if len(elements) == 2:
        return left_offsets[1]
    return median(left_offsets)


def split_paragraphs(column: dict, indent_threshold: float = 5.0) -> list[dict]:
    """Paragraphs are distinguished by an unusual first-line left offset
    (layout.ts:142-169)."""
    typical = median_left_offset(column, column["elements"])
    paragraphs: list[dict] = []
    current: dict | None = None
    for element in column["elements"]:
        left_offset = element["minX"] - column["minX"]
        if abs(typical - left_offset) > indent_threshold or current is None:
            if current is not None:
                paragraphs.append(current)
            current = make_container()
        add_elements(current, element)
    if current is not None:
        paragraphs.append(current)
    return paragraphs
