"""Glyph-name resolution, Differences expansion, text normalization and
PDF text-string decoding (reference /root/reference/encoding/index.ts)."""
from __future__ import annotations

import re
import unicodedata

from .glyphlist import GLYPHLIST
from .glyphmaps import GLYPHMAPS, PDFDocEncoding, StandardEncoding, WinAnsiEncoding, MacRomanEncoding  # noqa: F401

PDFDocUnicode: dict[int, str] = {
    code: GLYPHLIST[name] for code, name in PDFDocEncoding.items() if name in GLYPHLIST
}


def expand_differences(differences: list) -> dict[int, str]:
    """[code, name, name, code, name...] -> {code: glyphname}
    (reference encoding/index.ts:21-36)."""
    mapping: dict[int, str] = {}
    current = 0
    for item in differences or []:
        if isinstance(item, bool):
            # JS would coerce; PDFs don't contain booleans here — skip.
            continue
        if isinstance(item, (int, float)):
            current = int(item)
        else:
            mapping[current] = item
            current += 1
    return mapping


_UNI_RE = re.compile(r"^uni([0-9A-F]+)$")
_CHAR_RE = re.compile(r"^char([0-9a-f]{2})$")


def decode_glyphname(glyphname: str | None) -> str | None:
    """Glyphname -> unicode string via the glyph list, or the uniXXXX /
    charXX conventions; '.notdef' and unknown names -> None
    (reference encoding/index.ts:151-172)."""
    if glyphname is None or glyphname == ".notdef":
        return None
    s = GLYPHLIST.get(glyphname)
    if s is not None:
        return s
    m = _UNI_RE.match(glyphname)
    if m:
        code = int(m.group(1), 16)
        # String.fromCharCode truncates to 16 bits
        return chr(code & 0xFFFF)
    m = _CHAR_RE.match(glyphname)
    if m:
        return chr(int(m.group(1), 16))
    return None


# Modifier (PDF-style, precedes its letter) -> combining (Unicode-style)
# diacritic repair table (reference encoding/index.ts:60-78).
MODIFIER_TO_COMBINER = {
    "^": "̂", "`": "̀", "¨": "̈",
    "¯": "̄", "´": "́", "¸": "̧",
    "ˆ": "̂", "ˇ": "̌", "ˊ": "́",
    "ˋ": "̀", "˘": "̆", "˙": "̇",
    "˚": "̊", "˛": "̨", "˜": "̃",
    "˝": "̋",
}
_MODIFICATION_RE = re.compile(
    "([\\^\u0060\u00A8\u00AF\u00B4\u00B8\u02B0-\u02FF])(.)", re.DOTALL
)


# JS /\s/ exactly (reference runs on V8): includes U+FEFF, excludes the
# C0 separators \x1c-\x1f and NEL \x85 that Python's str \s matches —
# the difference is visible because C0 stripping happens AFTER flattening
_JS_WS_RE = re.compile(
    "[ \\f\\n\\r\\t\\v\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff]+"
)


def normalize(raw: str) -> str:
    """Whitespace flatten -> strip C0 controls -> modifier->combiner repair
    -> NFKC (reference encoding/index.ts:103-128)."""
    flattened = _JS_WS_RE.sub(" ", raw)
    visible = re.sub(r"[\x00-\x1F]", "", flattened)

    def repair(m):
        modifier, modified = m.group(1), m.group(2)
        combiner = MODIFIER_TO_COMBINER.get(modifier)
        if combiner:
            return combiner if modified == " " else modified + combiner
        return modifier + modified

    repaired = _MODIFICATION_RE.sub(repair, visible)
    return unicodedata.normalize("NFKC", repaired)


def swap_endian(buffer: bytes) -> bytes:
    """Swap every byte pair; odd trailing byte untouched
    (reference util.ts:149-157)."""
    out = bytearray(buffer)
    for i in range(0, len(out) - 1, 2):
        out[i], out[i + 1] = out[i + 1], out[i]
    return bytes(out)


def decode_buffer(buffer: bytes) -> str:
    """PDF text string: UTF-16BE if BOM, else PDFDocEncoding
    (reference encoding/index.ts:181-191)."""
    if len(buffer) >= 2 and buffer[0] == 254 and buffer[1] == 255:
        swapped = swap_endian(buffer)
        n = len(swapped) - (len(swapped) % 2)
        return swapped[:n].decode("utf-16-le", errors="surrogatepass")
    return "".join(PDFDocUnicode.get(b, "") for b in buffer)
