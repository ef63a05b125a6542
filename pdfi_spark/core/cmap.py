"""ToUnicode CMap parsing (reference /root/reference/parsers/states.ts:552-795).

A CMap maps character codes (1..n byte sequences) to Unicode strings.
Collects codespace ranges plus bfchar/bfrange mappings; everything else
(cidrange, notdefrange, PostScript syntax) is skipped token-by-token, as
in the reference's CMAP machine.
"""
from __future__ import annotations

import re

from .lexing import Buf, ParseError
from .objects import consume_hexstring, parse_array

_WS_RE = re.compile(rb"\s+")
_NEWLINE_RE = re.compile(rb"\r\n|\r|\n")
_TOKEN_RE = re.compile(rb"\S+")


def _decode_utf16be(buffer: bytes) -> str:
    """UTF-16BE decode preserving lone surrogates (JS string semantics).

    Valid surrogate PAIRS combine into one astral code point — that is
    byte-identical to the reference's output once serialized (V8 encodes
    the pair as the same UTF-8 astral char), but it means Python ``len``
    diverges from JS ``text.length``; length-sensitive sites must use
    ``util.utf16_length`` (see showString's charSpacing advance)."""
    if len(buffer) % 2 == 1:
        buffer = buffer[:-1] if len(buffer) > 1 else b""
    return buffer.decode("utf-16-be", errors="surrogatepass")


def _ucs_char(code: int) -> str:
    """reference parsers/states.ts:611-624 — splits >16-bit codes into two
    16-bit units verbatim (NOT surrogate encoding), matching the reference."""
    if code > 0xFFFFFFFF:
        raise ValueError(f"Cannot decode numbers larger than 32 bits ({code})")
    if code > 0xFFFF:
        return chr(code >> 16) + chr(code & 0xFFFF)
    return chr(code)


def _parse_stack_section(buf: Buf, end_token: bytes, on_line):
    """Shared shape of CODESPACERANGE / BFCHAR / BFRANGE: hexstrings (and,
    for bfrange, arrays) accumulate on a stack that is flushed at each
    newline via ``on_line(stack)``."""
    data = buf.data
    stack: list = []
    while True:
        if buf.pos >= len(data):
            raise ParseError("CMAP-section", data, buf.pos)
        m = _NEWLINE_RE.match(data, buf.pos)
        if m:
            buf.pos = m.end()
            if stack:
                on_line(stack)
                stack = []
            continue
        m = _WS_RE.match(data, buf.pos)
        if m:
            buf.pos = m.end()
            continue
        if data.startswith(end_token, buf.pos):
            buf.pos += len(end_token)
            return
        if data.startswith(b"<", buf.pos):
            buf.pos += 1
            stack.append(consume_hexstring(buf))
            continue
        if data.startswith(b"[", buf.pos):
            buf.pos += 1
            stack.append(parse_array(buf))
            continue
        raise ParseError("CMAP-section", data, buf.pos)


def parse_cmap(buffer: bytes) -> dict:
    """Returns {'codeSpaceRanges': [{'low','high'}], 'mappings': [...],
    'byteLength': int} — shape of reference CMap (states.ts:751-755)."""
    buf = Buf(buffer)
    data = buffer
    code_space_ranges: list[dict] = []
    mappings: list[dict] = []

    def on_codespace(stack):
        if len(stack) != 2:
            raise ValueError(
                f"Parsing CODESPACERANGE failed; argument stack must be 2-long: {stack}"
            )
        low, high = (int.from_bytes(b, "big") for b in stack)
        code_space_ranges.append({"low": low, "high": high})

    def on_bfchar(stack):
        if len(stack) != 2:
            raise ValueError(f"Parsing BFCHAR failed; argument stack must be 2-long: {stack}")
        src_buffer, dst_buffer = stack
        mappings.append({
            "src": int.from_bytes(src_buffer, "big"),
            "dst": _decode_utf16be(dst_buffer),
            "byteLength": len(src_buffer),
        })

    def on_bfrange(stack):
        if len(stack) != 3:
            raise ValueError(f"Parsing BFRANGE failed; argument stack must be 3-long: {stack}")
        lo_buf, hi_buf, dst = stack
        byte_length = len(lo_buf)
        if len(hi_buf) != byte_length:
            raise ValueError(
                f"Parsing BFRANGE failed; high offset has byteLength={len(hi_buf)} "
                f"but low offset has byteLength={byte_length}"
            )
        src_lo = int.from_bytes(lo_buf, "big")
        src_hi = int.from_bytes(hi_buf, "big")
        offset = src_hi - src_lo
        if isinstance(dst, list):
            if offset + 1 != len(dst):
                raise ValueError(
                    f"Parsing BFRANGE failed; destination offset array has "
                    f"length={len(dst)} but high ({src_hi}) - low ({src_lo}) = {offset}"
                )
            for i, dst_buffer in enumerate(dst):
                mappings.append({
                    "src": src_lo + i,
                    "dst": _decode_utf16be(dst_buffer),
                    "byteLength": byte_length,
                })
        else:
            dst_lo = int.from_bytes(dst, "big")
            for i in range(offset + 1):
                mappings.append({
                    "src": src_lo + i,
                    "dst": _ucs_char(dst_lo + i),
                    "byteLength": byte_length,
                })

    while True:
        if buf.pos >= len(data):
            break
        m = _WS_RE.match(data, buf.pos)
        if m:
            buf.pos = m.end()
            continue
        for token, handler, end in (
            (b"begincodespacerange", on_codespace, b"endcodespacerange"),
            (b"beginbfchar", on_bfchar, b"endbfchar"),
            (b"beginbfrange", on_bfrange, b"endbfrange"),
        ):
            if data.startswith(token, buf.pos):
                after = buf.pos + len(token)
                mw = _WS_RE.match(data, after)
                if mw:  # reference rules require trailing whitespace
                    buf.pos = mw.end()
                    _parse_stack_section(buf, end, handler)
                    break
        else:
            mt = _TOKEN_RE.match(data, buf.pos)
            if mt:
                buf.pos = mt.end()
                continue
            break

    byte_lengths = [m["byteLength"] for m in mappings]
    return {
        "codeSpaceRanges": code_space_ranges,
        "mappings": mappings,
        "byteLength": byte_lengths[0] if byte_lengths else 1,
    }
