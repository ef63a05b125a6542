"""Points, rectangles, containers, 3x3 matrices
(reference /root/reference/graphics/geometry.ts)."""
from __future__ import annotations

INF = float("inf")

# Mat3 is a row-major 9-tuple [a b 0, c d 0, e f 1] (geometry.ts:132-140)
MAT3_IDENT = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def mat3mul(A, B):
    """Full 3x3 multiply, op-order identical to geometry.ts:147-159."""
    return (
        (A[0] * B[0]) + (A[1] * B[3]) + (A[2] * B[6]),
        (A[0] * B[1]) + (A[1] * B[4]) + (A[2] * B[7]),
        (A[0] * B[2]) + (A[1] * B[5]) + (A[2] * B[8]),
        (A[3] * B[0]) + (A[4] * B[3]) + (A[5] * B[6]),
        (A[3] * B[1]) + (A[4] * B[4]) + (A[5] * B[7]),
        (A[3] * B[2]) + (A[4] * B[5]) + (A[5] * B[8]),
        (A[6] * B[0]) + (A[7] * B[3]) + (A[8] * B[6]),
        (A[6] * B[1]) + (A[7] * B[4]) + (A[8] * B[7]),
        (A[6] * B[2]) + (A[7] * B[5]) + (A[8] * B[8]),
    )


def transform_point(x, y, a, c, b, d, tx=0.0, ty=0.0):
    """CSS-matrix-style point transform (geometry.ts:13-21)."""
    return (a * x) + (b * y) + tx, (c * x) + (d * y) + ty


def make_rectangle(min_x, min_y, max_x, max_y) -> dict:
    return {"minX": min_x, "minY": min_y, "maxX": max_x, "maxY": max_y}


def distance_to_rectangle(frm: dict, to: dict) -> tuple[float, float]:
    """Per-axis gap between two rectangles; 0 on overlap (geometry.ts:47-70)."""
    dx = 0.0
    if to["maxX"] < frm["minX"]:
        dx = frm["minX"] - to["maxX"]
    elif to["minX"] > frm["maxX"]:
        dx = to["minX"] - frm["maxX"]
    dy = 0.0
    if to["maxY"] < frm["minY"]:
        dy = frm["minY"] - to["maxY"]
    elif to["minY"] > frm["maxY"]:
        dy = to["minY"] - frm["maxY"]
    return dx, dy


def contains_rectangle(source: dict, target: dict) -> bool:
    return (
        source["minX"] <= target["minX"]
        and source["minY"] <= target["minY"]
        and source["maxX"] >= target["maxX"]
        and source["maxY"] >= target["maxY"]
    )


def format_rectangle(rect: dict, digits: int = 0) -> str:
    return "[{0:.{d}f}, {1:.{d}f}, {2:.{d}f}, {3:.{d}f}]".format(
        rect["minX"], rect["minY"], rect["maxX"], rect["maxY"], d=digits
    )


def make_container() -> dict:
    return {"elements": [], "minX": INF, "minY": INF, "maxX": -INF, "maxY": -INF}


def add_elements(container: dict, *new_elements: dict) -> dict:
    """Append elements, growing the bounding box (geometry.ts:111-114).
    Mutates in place (the reference allocates; observable result identical)."""
    for el in new_elements:
        container["minX"] = min(container["minX"], el["minX"])
        container["minY"] = min(container["minY"], el["minY"])
        container["maxX"] = max(container["maxX"], el["maxX"])
        container["maxY"] = max(container["maxY"], el["maxY"])
        container["elements"].append(el)
    return container
