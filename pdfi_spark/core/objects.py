"""PDF object / xref / trailer parsers.

Re-expresses the grammar of the reference's regex state machines
(/root/reference/parsers/states.ts:223-550 and parsers/consumers.ts) as
direct-dispatch parsers over a (bytes, pos) cursor. Output value shapes
match the reference exactly (see /root/reference/test/pdfobject.ts,
test/xref.ts goldens, ported in tests/test_objects.py):

- name        -> str
- bytestring  -> bytes
- hexstring   -> bytes
- int/float   -> int/float
- true/false  -> bool, null -> None
- array       -> list
- dictionary  -> dict
- reference   -> {'object_number': int, 'generation_number': int}
- indirect obj-> {'object_number', 'generation_number', 'value'}
- stream      -> {'dictionary': dict, 'buffer': bytes}
"""
from __future__ import annotations

import re

from .lexing import Buf, ParseError
from .filters import apply_filters

# PDF name charset (reference parsers/states.ts:299; also :246 in DICTIONARY)
_NAME_RE = re.compile(rb"/([!-'*-.0-;=?-Z\\^-z|~]+)")
_WS_RE = re.compile(rb"\s+")
_REF_RE = re.compile(rb"([0-9]+)\s+([0-9]+)\s+R")
_INDIRECT_RE = re.compile(rb"([0-9]+)\s+([0-9]+)\s+obj")
_FLOAT_RE = re.compile(rb"-?\d*\.\d+")
_INT_RE = re.compile(rb"-?\d+")
_STREAM_START_RE = re.compile(rb">>\s*stream(\r\n|\n)")
# one-shot digit-led token: "N G R" | "N G obj" | float | int
_DIGIT_TOKEN_RE = re.compile(rb"(?:([0-9]+)\s+([0-9]+)\s+(R|obj))|([0-9]*\.[0-9]+)|([0-9]+)")
# whole-body match for arrays containing ONLY numbers (Widths, MediaBox,
# FontMatrix, CID W lists...): same number grammar as parse_object
# (-?\d+ | -?\d*.\d+, whitespace- or ]-terminated); possessive
# quantifiers so a non-number element fails fast with zero backtracking
_NUM_ARRAY_RE = re.compile(
    rb"\s*+((?:-?+(?:[0-9]*+\.[0-9]++|[0-9]++)(?:\s++|(?=\])))++)\]"
)
_ENDSTREAM_RE = re.compile(rb"\s*endstream")
_ENDOBJ_RE = re.compile(rb"\s*endobj")
_NAME_ESCAPE_RE = re.compile(rb"#([A-Fa-f0-9]{2})")


def unescape_name(raw: bytes) -> str:
    """Unescape #xx sequences in a name (reference parsers/states.ts:14-16)."""
    if 0x23 not in raw:  # no '#': the overwhelmingly common case
        return raw.decode("latin-1")
    unescaped = _NAME_ESCAPE_RE.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
    return unescaped.decode("latin-1")


def is_reference(obj) -> bool:
    """Duck-typed indirect-reference test (reference models.ts:28-31)."""
    return (
        isinstance(obj, dict)
        and "object_number" in obj
        and "generation_number" in obj
        and "value" not in obj
        and "dictionary" not in obj
    )


def is_stream(obj) -> bool:
    return isinstance(obj, dict) and "dictionary" in obj and "buffer" in obj


def as_array(obj) -> list:
    """tarry asArray: None -> [], list -> list, x -> [x]."""
    if obj is None:
        return []
    if isinstance(obj, list):
        return list(obj)
    return [obj]


_WS_BYTES = frozenset(b" \t\r\n\f\x0b")


def skip_whitespace(buf: Buf) -> None:
    pos = buf.pos
    if pos < len(buf.data) and buf.data[pos] in _WS_BYTES:
        buf.pos = _WS_RE.match(buf.data, pos).end()


# ---------------------------------------------------------------------------
# String consumers (reference parsers/consumers.ts:47-170)
# ---------------------------------------------------------------------------

_STR_SPECIAL_RE = re.compile(rb"[()\\]")


def consume_string(buf: Buf) -> bytes:
    """Read a (nestable) PDF literal string body; opening '(' already consumed.

    Nested strings keep their parens; escapes: \\053 octal, \\n \\r \\f,
    line continuations, and escaped delimiters \\\\ \\( \\) \\[ \\].
    Plain runs between special bytes are copied wholesale (same output as
    the reference's byte loop, parsers/consumers.ts:47-127).
    """
    data, out = buf.data, bytearray()
    pos, end = buf.pos, len(buf.data)
    depth = 0
    while pos < end:
        m = _STR_SPECIAL_RE.search(data, pos)
        if m is None:
            pos = end
            break
        if m.start() > pos:
            out += data[pos:m.start()]
            pos = m.start()
        b = data[pos]
        if b == 0x29:  # )
            if depth == 0:
                buf.pos = pos + 1
                return bytes(out)
            depth -= 1
            out.append(b)
            pos += 1
        elif b == 0x28:  # (
            depth += 1
            out.append(b)
            pos += 1
        elif b == 0x5C:  # backslash
            nxt = data[pos + 1] if pos + 1 < end else None
            if nxt is not None and 0x30 <= nxt <= 0x39 and pos + 3 < end \
                    and 0x30 <= data[pos + 2] <= 0x39 and 0x30 <= data[pos + 3] <= 0x39:
                # JS parseInt(str, 8) semantics: parse the longest valid
                # octal PREFIX of the three digits ('128' -> 0o12, '779'
                # -> 0o77); a leading 8/9 parses to 0 (NaN | 0)
                digits = data[pos + 1:pos + 4]
                k = 0
                while k < 3 and 0x30 <= digits[k] <= 0x37:
                    k += 1
                out.append((int(digits[:k], 8) & 0xFF) if k else 0)
                pos += 4
            elif nxt == 0x6E:  # n
                out.append(0x0A)
                pos += 2
            elif nxt == 0x72:  # r
                out.append(0x0D)
                pos += 2
            elif nxt == 0x66:  # f
                out.append(0x0C)
                pos += 2
            elif nxt in (0x0A, 0x0D):  # line continuation
                pos += 2
            elif nxt in (0x5C, 0x28, 0x29, 0x5B, 0x5D):
                out.append(nxt)
                pos += 2
            else:
                # Unknown escape: the reference would fail here
                # (parsers/consumers.ts:113-115 TODO); per PDF spec the
                # backslash is dropped and the next byte kept.
                pos += 1
        else:
            out.append(b)
            pos += 1
    buf.pos = pos
    raise ParseError("STRING", data, pos)


_HEX_WS = frozenset((0x20, 0x09, 0x0D, 0x0A, 0x0C))


def consume_hexstring(buf: Buf) -> bytes:
    """Read a hex string body; opening '<' already consumed.

    Whitespace skipped; odd digit counts padded with a trailing 0 nibble
    (reference parsers/consumers.ts:129-170).
    """
    data = buf.data
    pos, end = buf.pos, len(data)
    digits = bytearray()
    while pos < end:
        b = data[pos]
        if b == 0x3E:  # >
            pos += 1
            break
        if b in _HEX_WS:
            pos += 1
            continue
        if (0x30 <= b <= 0x39) or (0x41 <= b <= 0x46) or (0x61 <= b <= 0x66):
            digits.append(b)
            pos += 1
        else:
            raise ParseError("HEXSTRING", data, pos)
    buf.pos = pos
    if len(digits) % 2 == 1:
        digits.append(0x30)  # implied final 0
    return bytes.fromhex(digits.decode("ascii"))


# ---------------------------------------------------------------------------
# OBJECT and friends (reference parsers/states.ts:223-351)
# ---------------------------------------------------------------------------

def parse_object(buf: Buf):
    """First-byte-dispatch PDF value parser. Same grammar and precedence
    as the reference's OBJECT machine (parsers/states.ts:289-351); the
    dispatch only prunes alternatives that cannot match the lead byte."""
    data = buf.data
    skip_whitespace(buf)
    pos = buf.pos
    if pos >= len(data):
        raise ParseError("OBJECT", data, pos)
    b = data[pos]
    if b == 0x3C:  # '<'
        if data.startswith(b"<<", pos):
            buf.pos = pos + 2
            return parse_dictionary(buf)
        buf.pos = pos + 1
        return consume_hexstring(buf)
    if b == 0x5B:  # '['
        buf.pos = pos + 1
        return parse_array(buf)
    if b == 0x28:  # '('
        buf.pos = pos + 1
        return consume_string(buf)
    if b == 0x2F:  # '/'
        m = _NAME_RE.match(data, pos)
        if m:
            buf.pos = m.end()
            return unescape_name(m.group(1))
        raise ParseError("OBJECT", data, pos)
    if 0x30 <= b <= 0x39:  # digit: reference, indirect object, or number
        m = _DIGIT_TOKEN_RE.match(data, pos)
        if m:
            buf.pos = m.end()
            kw = m.group(3)
            if kw is not None:
                if kw == b"R":
                    return {
                        "object_number": int(m.group(1)),
                        "generation_number": int(m.group(2)),
                    }
                return {
                    "object_number": int(m.group(1)),
                    "generation_number": int(m.group(2)),
                    "value": parse_indirect_object_value(buf),
                }
            g = m.group(4)
            if g is not None:
                return float(g)
            return int(m.group(5))
    elif b == 0x74:  # 't'
        if data.startswith(b"true", pos):
            buf.pos = pos + 4
            return True
    elif b == 0x66:  # 'f'
        if data.startswith(b"false", pos):
            buf.pos = pos + 5
            return False
    elif b == 0x6E:  # 'n'
        if data.startswith(b"null", pos):
            buf.pos = pos + 4
            return None
    m = _FLOAT_RE.match(data, pos)
    if m:
        buf.pos = m.end()
        return float(m.group(0))
    m = _INT_RE.match(data, pos)
    if m:
        buf.pos = m.end()
        return int(m.group(0))
    raise ParseError("OBJECT", data, pos)


def parse_array(buf: Buf) -> list:
    data = buf.data
    # all-numbers fast path: one regex + split instead of a dispatch per
    # element. Anything else (strings, names, refs "n g R", nested
    # arrays/dicts) fails the match immediately and takes the loop.
    m = _NUM_ARRAY_RE.match(data, buf.pos)
    if m is not None:
        buf.pos = m.end()
        return [float(t) if b"." in t else int(t) for t in m.group(1).split()]
    out = []
    end = len(data)
    append = out.append
    match_digit = _DIGIT_TOKEN_RE.match
    while True:
        pos = buf.pos
        if pos < end and data[pos] in _WS_BYTES:
            buf.pos = pos = _WS_RE.match(data, pos).end()
        if pos >= end:
            raise ParseError("ARRAY", data, pos)
        b = data[pos]
        if b == 0x5D:  # ']'
            buf.pos = pos + 1
            return out
        if 0x30 <= b <= 0x39:
            # inline fast path for the dominant array payload — plain
            # numbers (Widths, kern arrays, matrices, Differences codes).
            # Byte-identical semantics to parse_object's digit branch:
            # the same regex decides number vs "n g R" reference, and
            # references (kw match) fall through to parse_object, which
            # re-dispatches identically.
            m = match_digit(data, pos)
            if m is not None and m.group(3) is None:
                buf.pos = m.end()
                g = m.group(4)
                append(float(g) if g is not None else int(m.group(5)))
                continue
        append(parse_object(buf))


def parse_dictionary(buf: Buf):
    """Parse a dictionary body (after '<<'); may return a stream object.

    The '>> stream' branch resolves an indirect /Length through
    ``buf.resolve`` — the reference's "stream hack"
    (parsers/states.ts:253-274).
    """
    value: dict = {}
    data = buf.data
    end = len(data)
    while True:
        pos = buf.pos
        if pos >= end:
            raise ParseError("DICTIONARY", data, pos)
        b = data[pos]
        if b == 0x2F:  # '/': key
            mn = _NAME_RE.match(data, pos)
            if mn:
                buf.pos = mn.end()
                value[unescape_name(mn.group(1))] = parse_object(buf)
                continue
            raise ParseError("DICTIONARY", data, pos)
        if b in _WS_BYTES:
            buf.pos = _WS_RE.match(data, pos).end()
            continue
        if b == 0x3E:  # '>': '>> stream' or plain '>>'
            m = _STREAM_START_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                stream_length = value.get("Length")
                if not isinstance(stream_length, (int, float)):
                    if buf.resolve is None:
                        raise ParseError("DICTIONARY(stream-length)", data, buf.pos)
                    stream_length = buf.resolve(stream_length)
                buffer = buf.next(int(stream_length))
                m2 = _ENDSTREAM_RE.match(data, buf.pos)
                if not m2:
                    raise ParseError("STREAM", data, buf.pos)
                buf.pos = m2.end()
                return {"dictionary": value, "buffer": buffer}
            if data.startswith(b">>", pos):
                buf.pos = pos + 2
                return value
        raise ParseError("DICTIONARY", data, pos)


def parse_indirect_object_value(buf: Buf):
    data = buf.data
    value = None
    while True:
        skip_whitespace(buf)
        if data.startswith(b"endobj", buf.pos):
            buf.pos += 6
            return value
        if buf.pos >= len(data):
            raise ParseError("INDIRECT_OBJECT_VALUE", data, buf.pos)
        value = parse_object(buf)


# ---------------------------------------------------------------------------
# Cross-reference tables and streams (reference parsers/states.ts:353-530)
# ---------------------------------------------------------------------------

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)\s+%%EOF")
_XREF_SECTION_RE = re.compile(rb"(\d+)\s+(\d+)\s*(\r\n|\n|\r)")
_XREF_ENTRY_RE = re.compile(rb"(\d{10}) (\d{5}) (f|n)( \r| \n|\r\n)")
_COMMENT_RE = re.compile(rb"%.*\n")


def parse_startxref(buf: Buf) -> int:
    m = _STARTXREF_RE.match(buf.data, buf.pos)
    if not m:
        raise ParseError("STARTXREF", buf.data, buf.pos)
    buf.pos = m.end()
    return int(m.group(1))


def parse_xref(buf: Buf) -> list:
    """Classic xref table: multi-section headers + 20-byte rows."""
    data = buf.data
    refs = []
    if data.startswith(b"xref", buf.pos):
        buf.pos += 4
    while True:
        mw = _WS_RE.match(data, buf.pos)
        if mw:
            buf.pos = mw.end()
        m = _XREF_SECTION_RE.match(data, buf.pos)
        if not m:
            return refs
        buf.pos = m.end()
        start, count = int(m.group(1)), int(m.group(2))
        for i in range(count):
            me = _XREF_ENTRY_RE.match(data, buf.pos)
            if not me:
                raise ParseError("XREF_REFERENCE", data, buf.pos)
            buf.pos = me.end()
            refs.append({
                "object_number": start + i,
                "offset": int(me.group(1)),
                "generation_number": int(me.group(2)),
                "in_use": me.group(3) == b"n",
            })


def parse_xref_with_trailer(buf: Buf) -> dict:
    """One step of the xref/trailer chain: either a classic ``xref`` table
    followed by ``trailer << .. >> startxref N %%EOF``, or a PDF-1.5
    cross-reference *stream* (an indirect stream object whose binary rows
    are sliced by the /W field widths and zipped with /Index windows;
    reference parsers/states.ts:375-468).
    """
    data = buf.data
    value: dict = {}
    while True:
        mw = _WS_RE.match(data, buf.pos)
        if mw:
            buf.pos = mw.end()
            continue
        mc = _COMMENT_RE.match(data, buf.pos)
        if mc:
            buf.pos = mc.end()
            continue
        if data.startswith(b"xref", buf.pos):
            value["cross_references"] = parse_xref(buf)
            continue
        if data.startswith(b"trailer", buf.pos):
            buf.pos += 7
            value["trailer"] = parse_object(buf)
            continue
        m = _STARTXREF_RE.match(data, buf.pos)
        if m:
            buf.pos = m.end()
            value["startxref"] = int(m.group(1))
            return value
        m = _INDIRECT_RE.match(data, buf.pos)
        if m:
            buf.pos = m.end()
            stream = parse_indirect_object_value(buf)
            d = stream["dictionary"]
            buffer = apply_filters(
                stream["buffer"], as_array(d.get("Filter")), as_array(d.get("DecodeParms"))
            )
            index = d.get("Index") or [0, d.get("Size")]
            pairs = [(index[i], index[i + 1]) for i in range(0, len(index), 2)]
            w = d["W"]
            f_type, f2, f3 = int(w[0]), int(w[1]), int(w[2])
            columns = f_type + f2 + f3
            partials = []
            for off in range(0, len(buffer), columns):
                # int.from_bytes(b'') == 0; a 0-width type field means
                # "type 1" per PDF spec 7.5.8.3 (the reference leaves
                # 0-width fields unimplemented, parsers/states.ts:427).
                ft = int.from_bytes(buffer[off:off + f_type], "big") if f_type else 1
                v2 = int.from_bytes(buffer[off + f_type:off + f_type + f2], "big")
                v3 = int.from_bytes(buffer[off + f_type + f2:off + columns], "big")
                if ft == 0:
                    partials.append({"in_use": False, "generation_number": 0})
                elif ft == 1:
                    partials.append({"in_use": True, "offset": v2, "generation_number": v3})
                else:
                    partials.append({
                        "in_use": True,
                        "generation_number": 0,
                        "object_stream_object_number": v2,
                        "object_stream_index": v3,
                    })
            refs = []
            it = iter(partials)
            for start, size in pairs:
                for i in range(int(size)):
                    partial = next(it)
                    entry = {"object_number": int(start) + i}
                    entry.update(partial)
                    refs.append(entry)
            value["cross_references"] = refs
            value["trailer"] = d
            value["startxref"] = d.get("Prev")
            return value
        raise ParseError("XREF_WITH_TRAILER", data, buf.pos)
