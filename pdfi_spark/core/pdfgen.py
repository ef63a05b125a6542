"""Deterministic synthetic PDF writer.

Builds spec-minimal PDFs whose extracted text is exactly predictable, so
the Spark pipeline can be oracle-checked: generate(text) -> extract ->
byte-identical expected string. Recipes mirror FIXTURES.md §3 (P1..P14),
each exercising a different slice of the engine (filters, fonts, xref
styles, layout operators).

Only the standard library + this package are used; output is strictly a
function of the input text and recipe (no randomness, no clock).
"""
from __future__ import annotations

import zlib

from .filters import BitIterator  # noqa: F401  (symmetry with decoder tests)

LINE_WIDTH = 48       # wrap width in characters
FONT_SIZE = 10
LEADING = 14
BLOCK_GAP = 30        # vertical gap that forces a new column/paragraph
PAGE_X = 72
PAGE_TOP = 720
PAGE_MIN_Y = 80
HEADER_FONT_SIZE = 14


# ---------------------------------------------------------------------------
# serialization helpers
# ---------------------------------------------------------------------------

class Name(str):
    """A PDF name (serialized as /Name)."""


class Ref(int):
    """An indirect reference to object number N (gen 0)."""


def _escape_string(data: bytes) -> bytes:
    return (
        data.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def ser(value) -> bytes:
    if isinstance(value, Name):
        return b"/" + value.encode("latin-1")
    if isinstance(value, Ref):
        return b"%d 0 R" % int(value)
    if isinstance(value, bool):
        return b"true" if value else b"false"
    if value is None:
        return b"null"
    if isinstance(value, int):
        return b"%d" % value
    if isinstance(value, float):
        return ("%g" % value).encode("ascii")
    if isinstance(value, bytes):
        return b"(" + _escape_string(value) + b")"
    if isinstance(value, str):
        return b"(" + _escape_string(value.encode("latin-1")) + b")"
    if isinstance(value, list):
        return b"[ " + b" ".join(ser(v) for v in value) + b" ]"
    if isinstance(value, dict):
        parts = [b"/" + k.encode("latin-1") + b" " + ser(v) for k, v in value.items()]
        return b"<< " + b" ".join(parts) + b" >>"
    raise TypeError(f"cannot serialize {type(value)}")


def encode_ascii85(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        k = len(chunk)
        padded = chunk + b"\x00" * (4 - k)
        total = int.from_bytes(padded, "big")
        digits = []
        for _ in range(5):
            digits.append(total % 85)
            total //= 85
        digits.reverse()
        group = bytes(d + 33 for d in digits)
        if k == 4 and group == b"!!!!!":
            out.extend(b"z")
        else:
            out.extend(group[: k + 1])
    out.extend(b"~>")
    return bytes(out)


def encode_lzw(data: bytes) -> bytes:
    """Minimal valid LZW: clear-table marker then literal codes only,
    with code width tracking the decoder's table growth."""
    bits: list[tuple[int, int]] = [(256, 9)]  # (code, width)
    code_length = 9
    table_max = 257
    for byte in data:
        bits.append((byte, code_length))
        table_index = table_max + 1
        if table_index in (511, 1023, 2047):
            code_length += 1
        table_max += 1
    bits.append((257, code_length))
    acc = 0
    acc_bits = 0
    out = bytearray()
    for code, width in bits:
        acc = (acc << width) | code
        acc_bits += width
        while acc_bits >= 8:
            acc_bits -= 8
            out.append((acc >> acc_bits) & 0xFF)
    if acc_bits:
        out.append((acc << (8 - acc_bits)) & 0xFF)
    return bytes(out)


ENCODERS = {
    "FlateDecode": lambda d: zlib.compress(d),
    "ASCIIHexDecode": lambda d: d.hex().encode("ascii") + b">",
    "ASCII85Decode": encode_ascii85,
    "LZWDecode": encode_lzw,
}


class PDFWriter:
    """Accumulates numbered objects, then emits a classic-xref or
    xref-stream (+ object-stream) file."""

    def __init__(self):
        self.objects: list[bytes | None] = []       # bodies, 1-based object numbers
        self.is_stream: list[bool] = []

    def add(self, value) -> Ref:
        self.objects.append(ser(value))
        self.is_stream.append(False)
        return Ref(len(self.objects))

    def reserve(self) -> Ref:
        self.objects.append(None)
        self.is_stream.append(False)
        return Ref(len(self.objects))

    def set(self, ref: Ref, value) -> None:
        self.objects[int(ref) - 1] = ser(value)

    def add_stream(self, dictionary: dict, data: bytes, filters: list[str] | None = None) -> Ref:
        encoded = data
        for name in reversed(filters or []):
            encoded = ENCODERS[name](encoded)
        d = dict(dictionary)
        d["Length"] = len(encoded)
        if filters:
            d["Filter"] = [Name(f) for f in filters] if len(filters) > 1 else Name(filters[0])
        body = ser(d) + b"\nstream\n" + encoded + b"\nendstream"
        self.objects.append(body)
        self.is_stream.append(True)
        return Ref(len(self.objects))

    def build(self, root: Ref, info: Ref | None = None) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0] * (len(self.objects) + 1)
        for i, body in enumerate(self.objects, start=1):
            offsets[i] = len(out)
            out.extend(b"%d 0 obj\n" % i)
            out.extend(body)
            out.extend(b"\nendobj\n")
        xref_pos = len(out)
        n = len(self.objects) + 1
        out.extend(b"xref\n0 %d\n" % n)
        out.extend(b"0000000000 65535 f \n")
        for i in range(1, n):
            out.extend(b"%010d 00000 n \n" % offsets[i])
        trailer = {"Size": n, "Root": root}
        if info is not None:
            trailer["Info"] = info
        out.extend(b"trailer\n" + ser(trailer) + b"\nstartxref\n%d\n%%%%EOF" % xref_pos)
        return bytes(out)

    def build_xref_stream(self, root: Ref, use_objstm: bool = True,
                          predictor: bool = False) -> bytes:
        """PDF-1.5 output: non-stream objects packed into an /ObjStm,
        cross references in a compressed xref stream."""
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        n_existing = len(self.objects)
        objstm_num = n_existing + 1 if use_objstm else None
        xref_num = n_existing + (2 if use_objstm else 1)

        entries: dict[int, tuple[int, int, int]] = {0: (0, 0, 65535)}
        packed: list[int] = []
        if use_objstm:
            packed = [i + 1 for i in range(n_existing) if not self.is_stream[i]]

        # top-level objects
        for i, body in enumerate(self.objects, start=1):
            if use_objstm and i in packed:
                continue
            entries[i] = (1, len(out), 0)
            out.extend(b"%d 0 obj\n" % i)
            out.extend(body)
            out.extend(b"\nendobj\n")

        if use_objstm:
            pair_parts = []
            data_parts = []
            offset = 0
            for idx, objnum in enumerate(packed):
                body = self.objects[objnum - 1]
                pair_parts.append(b"%d %d" % (objnum, offset))
                data_parts.append(body + b"\n")
                offset += len(body) + 1
                entries[objnum] = (2, objstm_num, idx)
            prefix = b" ".join(pair_parts) + b"\n"
            objstm_data = prefix + b"".join(data_parts)
            objstm_encoded = zlib.compress(objstm_data)
            entries[objstm_num] = (1, len(out), 0)
            objstm_dict = {
                "Type": Name("ObjStm"),
                "N": len(packed),
                "First": len(prefix),
                "Filter": Name("FlateDecode"),
                "Length": len(objstm_encoded),
            }
            out.extend(b"%d 0 obj\n" % objstm_num)
            out.extend(ser(objstm_dict) + b"\nstream\n" + objstm_encoded + b"\nendstream")
            out.extend(b"\nendobj\n")

        # xref stream rows: W = [1 4 2]
        xref_pos = len(out)
        size = xref_num + 1
        rows = bytearray()
        for i in range(size):
            t, f2, f3 = entries.get(i, (0, 0, 0)) if i != xref_num else (1, xref_pos, 0)
            rows.append(t)
            rows.extend(f2.to_bytes(4, "big"))
            rows.extend(f3.to_bytes(2, "big"))
        columns = 7
        xref_dict = {
            "Type": Name("XRef"),
            "Size": size,
            "W": [1, 4, 2],
            "Root": root,
            "Filter": Name("FlateDecode"),
        }
        if predictor:
            n_rows = len(rows) // columns
            pred_rows = bytearray()
            prev = bytes(columns)
            for r in range(n_rows):
                row = rows[r * columns:(r + 1) * columns]
                pred_rows.append(2)  # PNG Up filter tag
                pred_rows.extend((row[c] - prev[c]) & 0xFF for c in range(columns))
                prev = row
            encoded = zlib.compress(bytes(pred_rows))
            xref_dict["DecodeParms"] = {"Predictor": 12, "Columns": columns}
        else:
            encoded = zlib.compress(bytes(rows))
        xref_dict["Length"] = len(encoded)
        out.extend(b"%d 0 obj\n" % xref_num)
        out.extend(ser(xref_dict) + b"\nstream\n" + encoded + b"\nendstream")
        out.extend(b"\nendobj\n")
        out.extend(b"startxref\n%d\n%%%%EOF" % xref_pos)
        return bytes(out)


# ---------------------------------------------------------------------------
# text layout planning
# ---------------------------------------------------------------------------

def wrap_text(text: str, width: int = LINE_WIDTH) -> list[str]:
    """Deterministic greedy wrap at single spaces."""
    words = text.split(" ")
    lines: list[str] = []
    current = ""
    for word in words:
        if not current:
            current = word
        elif len(current) + 1 + len(word) <= width:
            current = current + " " + word
        else:
            lines.append(current)
            current = word
    if current:
        lines.append(current)
    return lines


def split_blocks(lines: list[str], per_block: int = 6) -> list[list[str]]:
    return [lines[i:i + per_block] for i in range(0, len(lines), per_block)] or [[]]


def _esc(line: str) -> bytes:
    return _escape_string(line.encode("latin-1"))


def content_ops_simple(blocks: list[list[str]], font: str = "F1") -> bytes:
    """One Tm per line; blocks separated by BLOCK_GAP (distinct columns →
    distinct paragraphs)."""
    ops = [b"BT /%s %d Tf" % (font.encode(), FONT_SIZE)]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _esc(line)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    return b"\n".join(ops)


def standard_widths() -> list[int]:
    return [500] * 95  # codes 32..126


def base_font_object() -> dict:
    return {
        "Type": Name("Font"),
        "Subtype": Name("Type1"),
        "BaseFont": Name("Helvetica"),
        "FirstChar": 32,
        "LastChar": 126,
        "Widths": standard_widths(),
        "FontDescriptor": {"Type": Name("FontDescriptor"), "MissingWidth": 500},
    }


def expected_string(paragraph_blocks: list[list[str]]) -> str:
    """The extractor output for a headerless document: one section with an
    empty title, one paragraph per block."""
    return "# \n" + "\n".join(" ".join(block) for block in paragraph_blocks if block)


def make_single_page(content: bytes, font_objects: dict | None = None,
                     filters: list[str] | None = None,
                     xref: str = "table", predictor: bool = False) -> bytes:
    w = PDFWriter()
    font_objects = font_objects or {"F1": base_font_object()}
    font_refs = {name: w.add(obj) for name, obj in font_objects.items()}
    content_ref = w.add_stream({}, content, filters)
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {k: v for k, v in font_refs.items()}},
        "Contents": content_ref,
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    if xref == "stream":
        return w.build_xref_stream(root_ref, use_objstm=True, predictor=predictor)
    return w.build(root_ref)


# ---------------------------------------------------------------------------
# recipes: text -> (pdf_bytes, expected_extracted_string)
# ---------------------------------------------------------------------------

def recipe_simple(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P1: one page, Type1 font, Tm/Tj per line."""
    blocks = split_blocks(wrap_text(text), per_block)
    return make_single_page(content_ops_simple(blocks)), expected_string(blocks)


def recipe_positioning(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P4: exercise Td/TD/Tm/T*/'/\" line positioning."""
    blocks = split_blocks(wrap_text(text), per_block)
    ops = [b"BT /F1 %d Tf %d TL" % (FONT_SIZE, LEADING)]
    y = PAGE_TOP
    for block in blocks:
        for i, line in enumerate(block):
            e = _esc(line)
            if i == 0:
                ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, e))
            elif i == 1:
                ops.append(b"0 -%d TD (%s) Tj" % (LEADING, e))
            elif i == 2:
                ops.append(b"T* (%s) Tj" % e)
            elif i == 3:
                ops.append(b"(%s) '" % e)
            else:
                ops.append(b"0 0 (%s) \"" % e)
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    blocks_expected = blocks
    return make_single_page(b"\n".join(ops)), expected_string(blocks_expected)


def recipe_tj_kerning(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P3: TJ arrays with word-gap shifts (-300 => 3pt at 10pt font) and a
    small kern (-50 => 0.5pt, below the 1pt word threshold) inside the
    first word pair of each line."""
    blocks = split_blocks(wrap_text(text), per_block)
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    expected_blocks = []
    for block in blocks:
        expected_block = []
        for line in block:
            words = line.split(" ")
            parts = []
            for i, word in enumerate(words):
                if i > 0:
                    parts.append(b"-300")
                parts.append(b"(%s)" % _esc(word))
            ops.append(b"1 0 0 1 %d %d Tm [ %s ] TJ" % (PAGE_X, y, b" ".join(parts)))
            expected_block.append(" ".join(words))
            y -= LEADING
        expected_blocks.append(expected_block)
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    return make_single_page(b"\n".join(ops)), expected_string(expected_blocks)


def recipe_flate(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P5: content stream wrapped in FlateDecode."""
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(content_ops_simple(blocks), filters=["FlateDecode"])
    return pdf, expected_string(blocks)


def recipe_asciihex(text: str, per_block: int = 6) -> tuple[bytes, str]:
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(content_ops_simple(blocks), filters=["ASCIIHexDecode"])
    return pdf, expected_string(blocks)


def recipe_ascii85(text: str, per_block: int = 6) -> tuple[bytes, str]:
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(content_ops_simple(blocks), filters=["ASCII85Decode"])
    return pdf, expected_string(blocks)


def recipe_lzw(text: str, per_block: int = 6) -> tuple[bytes, str]:
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(content_ops_simple(blocks), filters=["LZWDecode"])
    return pdf, expected_string(blocks)


def recipe_filter_chain(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Filter pipeline: ASCIIHex over Flate (decode order: hex -> inflate)."""
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(
        content_ops_simple(blocks), filters=["FlateDecode", "ASCIIHexDecode"]
    )
    return pdf, expected_string(blocks)


def recipe_xref_stream(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P9: PDF-1.5 xref stream + object stream (+ Up predictor)."""
    blocks = split_blocks(wrap_text(text), per_block)
    pdf = make_single_page(content_ops_simple(blocks), xref="stream", predictor=True)
    return pdf, expected_string(blocks)


def recipe_type0_cmap(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P7: Type0/CIDFontType2 with 2-byte codes and a ToUnicode CMap
    (bfrange + a few bfchars)."""
    blocks = split_blocks(wrap_text(text), per_block)
    cmap = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Custom-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfrange
<0020> <007e> <0020>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""
    w = PDFWriter()
    cmap_ref = w.add_stream({}, cmap)
    cid_font = {
        "Type": Name("Font"),
        "Subtype": Name("CIDFontType2"),
        "BaseFont": Name("CustomCID"),
        "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity", "Supplement": 0},
        "DW": 500,
        "W": [32, 126, 500],
    }
    cid_ref = w.add(cid_font)
    font_ref = w.add({
        "Type": Name("Font"),
        "Subtype": Name("Type0"),
        "BaseFont": Name("CustomCID"),
        "Encoding": Name("Identity-H"),
        "DescendantFonts": [cid_ref],
        "ToUnicode": cmap_ref,
    })
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            hexcodes = "".join(format(ord(c), "04x") for c in line)
            ops.append(b"1 0 0 1 %d %d Tm <%s> Tj" % (PAGE_X, y, hexcodes.encode()))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    content_ref = w.add_stream({}, b"\n".join(ops))
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {"F1": font_ref}},
        "Contents": content_ref,
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    return w.build(root_ref), expected_string(blocks)


def recipe_astral_cmap(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Type0 font whose ToUnicode CMap maps a-z to ASTRAL characters
    (MATHEMATICAL BOLD SMALL A.., U+1D41A..) via surrogate-pair bfchar
    destinations, with a non-zero Tc so the x-advance depends on counting
    UTF-16 CODE UNITS (2 per astral char — JS text.length semantics,
    reference graphics/stream.ts:884-886). NFKC in normalize() folds the
    math-bold letters back to ASCII, so expected == plain text."""
    blocks = split_blocks(wrap_text(text), per_block)
    alphabet = sorted(set("".join(" ".join(b) for b in blocks)))

    def target(ch: str) -> str:
        if "a" <= ch <= "z":
            return chr(0x1D41A + ord(ch) - ord("a"))
        return ch

    bfchar_lines = []
    for ch in alphabet:
        dest = target(ch).encode("utf-16-be", errors="surrogatepass").hex()
        bfchar_lines.append(f"<{ord(ch):04x}> <{dest}>".encode())
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /Astral-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        + (b"%d beginbfchar\n" % len(bfchar_lines))
        + b"\n".join(bfchar_lines)
        + b"\nendbfchar\nendcmap\n"
        b"CMapName currentdict /CMap defineresource pop\nend\nend"
    )
    w = PDFWriter()
    cmap_ref = w.add_stream({}, cmap)
    cid_font = {
        "Type": Name("Font"),
        "Subtype": Name("CIDFontType2"),
        "BaseFont": Name("AstralCID"),
        "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity", "Supplement": 0},
        "DW": 500,
        "W": [32, 126, 500],
    }
    cid_ref = w.add(cid_font)
    font_ref = w.add({
        "Type": Name("Font"),
        "Subtype": Name("Type0"),
        "BaseFont": Name("AstralCID"),
        "Encoding": Name("Identity-H"),
        "DescendantFonts": [cid_ref],
        "ToUnicode": cmap_ref,
    })
    # 0.5 Tc: every glyph advance now includes charSpacing * nchars, and
    # nchars must be the CODE-UNIT count for astral targets
    ops = [b"BT /F1 %d Tf 0.5 Tc" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            hexcodes = "".join(format(ord(c), "04x") for c in line)
            ops.append(b"1 0 0 1 %d %d Tm <%s> Tj" % (PAGE_X, y, hexcodes.encode()))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    content_ref = w.add_stream({}, b"\n".join(ops))
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {"F1": font_ref}},
        "Contents": content_ref,
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    return w.build(root_ref), expected_string(blocks)


def recipe_differences(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P8: Encoding /Differences overlay with uniXXXX glyph names; bytes
    128+k are remapped to the distinct characters of the text."""
    blocks = split_blocks(wrap_text(text), per_block)
    alphabet = sorted(set("".join(" ".join(b) for b in blocks)))
    assert len(alphabet) <= 96, "differences recipe supports <=96 distinct chars"
    code_of = {ch: 128 + i for i, ch in enumerate(alphabet)}
    differences: list = [128]
    differences.extend(Name("uni%04X" % ord(ch)) for ch in alphabet)
    font = base_font_object()
    font["FirstChar"] = 128
    font["LastChar"] = 128 + len(alphabet) - 1
    font["Widths"] = [500] * len(alphabet)
    font["Encoding"] = {
        "Type": Name("Encoding"),
        "BaseEncoding": Name("WinAnsiEncoding"),
        "Differences": differences,
    }
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            encoded = bytes(code_of[ch] for ch in line)
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _escape_string(encoded)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    pdf = make_single_page(b"\n".join(ops), font_objects={"F1": font})
    return pdf, expected_string(blocks)


# no bold variants here: an all-bold document is folded into a section
# title by groupSections, which would change the expected structure
CORE14_RECIPE_FONTS = ["Helvetica", "Times-Roman", "Courier"]


def recipe_core14_nowidths(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Type1 font with a Core-14 BaseFont and NO /Widths, /FirstChar,
    /FontDescriptor: measuring must fall back to the public AFM width
    tables (reference font/index.ts:389-411; repo core/afm.py) and the
    encoding to the Standard fallback. Lines are per-word TJ arrays with
    -300 kern gaps, so every word advance runs through an AFM width sum.
    The BaseFont is a deterministic function of the text length."""
    blocks = split_blocks(wrap_text(text), per_block)
    base = CORE14_RECIPE_FONTS[len(text) % len(CORE14_RECIPE_FONTS)]
    font = {
        "Type": Name("Font"),
        "Subtype": Name("Type1"),
        "BaseFont": Name(base),
    }
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            parts = []
            for i, word in enumerate(line.split(" ")):
                if i > 0:
                    parts.append(b"-300")
                parts.append(b"(%s)" % _esc(word))
            ops.append(b"1 0 0 1 %d %d Tm [ %s ] TJ" % (PAGE_X, y, b" ".join(parts)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    pdf = make_single_page(b"\n".join(ops), font_objects={"F1": font})
    return pdf, expected_string(blocks)


# a-z -> non-Latin chars reached ONLY through real Adobe-Glyph-List names
# (Greek, Cyrillic afiiNNNNN, Hebrew, math): exercises the full AGL table,
# not the uniXXXX escape hatch. Every target is NFKC-stable and outside the
# modifier-repair ranges so normalize() passes it through untouched.
GLYPHNAME_TRANSLATE_SRC = "abcdefghijklmnopqrstuvwxyz"
GLYPHNAME_TARGETS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda",
    "afii10017", "afii10018", "afii10019", "afii10020", "afii10021",
    "afii10022", "afii10024", "afii10025",
    "alef", "bet", "gimel",
    "partialdiff", "infinity", "arrowright", "universal",
]


def _glyphname_table() -> tuple[dict[str, str], str]:
    """(char -> AGL name for a-z, translate destination string)."""
    from .encoding.glyphlist import GLYPHLIST

    name_of = dict(zip(GLYPHNAME_TRANSLATE_SRC, GLYPHNAME_TARGETS))
    dst = "".join(GLYPHLIST[n] for n in GLYPHNAME_TARGETS)
    return name_of, dst


def recipe_glyphnames(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Encoding /Differences overlay with REAL AGL glyph names: a-z map to
    Greek/Cyrillic/Hebrew/math characters via names like `alpha`,
    `afii10017`, `alef` (reference resolves them through its bundled AGL,
    encoding/glyphlist.ts); all other characters go through uniXXXX names
    as in recipe_differences. Expected output = translate(text)."""
    name_of, dst = _glyphname_table()
    trans = str.maketrans(GLYPHNAME_TRANSLATE_SRC, dst)
    blocks = split_blocks(wrap_text(text), per_block)
    alphabet = sorted(set("".join(" ".join(b) for b in blocks)))
    assert len(alphabet) <= 96, "glyphnames recipe supports <=96 distinct chars"
    code_of = {ch: 128 + i for i, ch in enumerate(alphabet)}
    differences: list = [128]
    differences.extend(
        Name(name_of[ch]) if ch in name_of else Name("uni%04X" % ord(ch))
        for ch in alphabet
    )
    font = base_font_object()
    font["FirstChar"] = 128
    font["LastChar"] = 128 + len(alphabet) - 1
    font["Widths"] = [500] * len(alphabet)
    font["Encoding"] = {
        "Type": Name("Encoding"),
        "BaseEncoding": Name("WinAnsiEncoding"),
        "Differences": differences,
    }
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            encoded = bytes(code_of[ch] for ch in line)
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _escape_string(encoded)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    pdf = make_single_page(b"\n".join(ops), font_objects={"F1": font})
    expected_blocks = [[line.translate(trans) for line in b] for b in blocks]
    return pdf, expected_string(expected_blocks)


def recipe_xobject(text: str, per_block: int = 6, depth: int = 1) -> tuple[bytes, str]:
    """P10: the text lives inside a chain of `depth` nested Form XObjects.
    Depth <= 4 renders; deeper chains are skipped by the recursion cap."""
    blocks = split_blocks(wrap_text(text), per_block)
    w = PDFWriter()
    font_ref = w.add(base_font_object())
    inner_content = content_ops_simple(blocks)
    xobj_ref = None
    for level in range(depth):
        body = inner_content if level == 0 else b"/X1 Do"
        resources: dict = {"Font": {"F1": font_ref}}
        if level > 0:
            resources["XObject"] = {"X1": xobj_ref}
        xobj_ref = w.add_stream({
            "Type": Name("XObject"),
            "Subtype": Name("Form"),
            "BBox": [0, 0, 612, 792],
            "Resources": resources,
        }, body)
    content_ref = w.add_stream({}, b"q /X1 Do Q")
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {"F1": font_ref}, "XObject": {"X1": xobj_ref}},
        "Contents": content_ref,
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    expected = expected_string(blocks) if depth <= 4 else "# \n"
    return w.build(root_ref), expected


def recipe_multicolumn(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P11: two columns; reading order column 1 then column 2."""
    lines = wrap_text(text, width=24)
    half = (len(lines) + 1) // 2
    col1, col2 = lines[:half], lines[half:]
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    for x, col in ((PAGE_X, col1), (PAGE_X + 250, col2)):
        y = PAGE_TOP
        for line in col:
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, _esc(line)))
            y -= LEADING
    ops.append(b"ET")
    blocks = [b for b in (col1, col2) if b]
    return make_single_page(b"\n".join(ops)), expected_string(blocks)


def recipe_multipage(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Multiple pages, one block per page."""
    blocks = split_blocks(wrap_text(text), per_block)
    w = PDFWriter()
    font_ref = w.add(base_font_object())
    pages_ref = w.reserve()
    kids = []
    for block in blocks:
        content = content_ops_simple([block])
        content_ref = w.add_stream({}, content)
        kids.append(w.add({
            "Type": Name("Page"),
            "Parent": pages_ref,
            "MediaBox": [0, 0, 612, 792],
            "Resources": {"Font": {"F1": font_ref}},
            "Contents": content_ref,
        }))
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": kids, "Count": len(kids)})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    return w.build(root_ref), expected_string(blocks)


def recipe_multistream(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P14: page Contents is an ARRAY of streams, split between blocks."""
    blocks = split_blocks(wrap_text(text), per_block)
    mid = max(1, len(blocks) // 2)
    w = PDFWriter()
    font_ref = w.add(base_font_object())
    # second stream continues lower on the page
    ops2 = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP - (sum(len(b) for b in blocks[:mid]) * LEADING
                    + len(blocks[:mid]) * (BLOCK_GAP - LEADING))
    for block in blocks[mid:]:
        for line in block:
            ops2.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _esc(line)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops2.append(b"ET")
    c1 = w.add_stream({}, content_ops_simple(blocks[:mid]))
    c2 = w.add_stream({}, b"\n".join(ops2))
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {"F1": font_ref}},
        "Contents": [c1, c2],
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    return w.build(root_ref), expected_string(blocks)


def recipe_sections(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """P12: alternating header (14pt) and body (10pt) blocks. Headers are
    larger than the 75th-percentile content size + 0.5 => section titles."""
    lines = wrap_text(text)
    body_blocks = split_blocks(lines, max(per_block, 8))
    ops = [b"BT"]
    y = PAGE_TOP
    sections = []
    for i, block in enumerate(body_blocks):
        title = f"section {i}"
        ops.append(b"/F1 %d Tf 1 0 0 1 %d %d Tm (%s) Tj"
                   % (HEADER_FONT_SIZE, PAGE_X, y, _esc(title)))
        y -= BLOCK_GAP + 4
        ops.append(b"/F1 %d Tf" % FONT_SIZE)
        for line in block:
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _esc(line)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
        sections.append((title, " ".join(block)))
    ops.append(b"ET")
    expected = "\n\n".join(f"# {t}\n{b}" for t, b in sections)
    return make_single_page(b"\n".join(ops)), expected


RECIPES = {
    "simple": recipe_simple,
    "positioning": recipe_positioning,
    "tj_kerning": recipe_tj_kerning,
    "flate": recipe_flate,
    "asciihex": recipe_asciihex,
    "ascii85": recipe_ascii85,
    "lzw": recipe_lzw,
    "filter_chain": recipe_filter_chain,
    "xref_stream": recipe_xref_stream,
    "type0_cmap": recipe_type0_cmap,
    "astral_cmap": recipe_astral_cmap,
    "differences": recipe_differences,
    "glyphnames": recipe_glyphnames,
    "core14_nowidths": recipe_core14_nowidths,
    "xobject": recipe_xobject,
    "multicolumn": recipe_multicolumn,
    "multipage": recipe_multipage,
    "multistream": recipe_multistream,
    "sections": recipe_sections,
}


def build_pdf(text: str, recipe: str = "simple", per_block: int = 6) -> tuple[bytes, str]:
    """Build a synthetic PDF embedding `text`; returns (pdf_bytes,
    expected_extracted_string). per_block controls lines-per-paragraph;
    a huge per_block yields a single paragraph whose text round-trips
    to exactly the input (SQL-expressible oracle)."""
    return RECIPES[recipe](text, per_block)


# ---------------------------------------------------------------------------
# oracle variants: expected output is a pure SQL expression over `text`
# ---------------------------------------------------------------------------

def recipe_multicolumn_oracle(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Two columns where column 1 carries the whole text and column 2 a
    constant sentinel, so the expected string is SQL-expressible."""
    col1 = wrap_text(text, width=24)
    col2 = ["end of document"]
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    # column 2 starts half a leading lower so it never shares a line band
    # with a 1-line column 1
    for x, y, col in ((PAGE_X, PAGE_TOP, col1), (PAGE_X + 250, PAGE_TOP - 7, col2)):
        for line in col:
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, _esc(line)))
            y -= LEADING
    ops.append(b"ET")
    expected = "# \n" + text + "\nend of document"
    return make_single_page(b"\n".join(ops)), expected


def recipe_sections_oracle(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """A leading all-bold title paragraph + the whole text as one body
    paragraph. Bold (not size) marks the title so the 75th-percentile font
    size stays stable for arbitrarily short bodies."""
    lines = wrap_text(text)
    bold_font = base_font_object()
    bold_font["BaseFont"] = Name("Helvetica-Bold")
    ops = [b"BT"]
    y = PAGE_TOP
    ops.append(b"/FB %d Tf 1 0 0 1 %d %d Tm (section 0) Tj" % (FONT_SIZE, PAGE_X, y))
    y -= BLOCK_GAP
    ops.append(b"/F1 %d Tf" % FONT_SIZE)
    for line in lines:
        ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _esc(line)))
        y -= LEADING
    ops.append(b"ET")
    expected = "# section 0\n" + text
    pdf = make_single_page(
        b"\n".join(ops),
        font_objects={"F1": base_font_object(), "FB": bold_font},
    )
    return pdf, expected


RECIPES["multicolumn_oracle"] = recipe_multicolumn_oracle
RECIPES["sections_oracle"] = recipe_sections_oracle

# DuckDB SQL expression (over column name injected as {col}) computing the
# expected extracted string for each oracle-able recipe, when built with
# per_block large enough for a single paragraph.
_DEFAULT_EXPECTED_SQL = "'# ' || chr(10) || {col}"
ORACLE_EXPECTED_SQL: dict[str, str] = {
    "simple": _DEFAULT_EXPECTED_SQL,
    "positioning": _DEFAULT_EXPECTED_SQL,
    "tj_kerning": _DEFAULT_EXPECTED_SQL,
    "flate": _DEFAULT_EXPECTED_SQL,
    "asciihex": _DEFAULT_EXPECTED_SQL,
    "ascii85": _DEFAULT_EXPECTED_SQL,
    "lzw": _DEFAULT_EXPECTED_SQL,
    "filter_chain": _DEFAULT_EXPECTED_SQL,
    "xref_stream": _DEFAULT_EXPECTED_SQL,
    "type0_cmap": _DEFAULT_EXPECTED_SQL,
    "differences": _DEFAULT_EXPECTED_SQL,
    "xobject": _DEFAULT_EXPECTED_SQL,
    "multipage": _DEFAULT_EXPECTED_SQL,
    "multistream": _DEFAULT_EXPECTED_SQL,
    "multicolumn_oracle": "'# ' || chr(10) || {col} || chr(10) || 'end of document'",
    "sections_oracle": "'# section 0' || chr(10) || {col}",
}
ORACLE_EXPECTED_SQL["core14_nowidths"] = _DEFAULT_EXPECTED_SQL
ORACLE_EXPECTED_SQL["astral_cmap"] = _DEFAULT_EXPECTED_SQL
ORACLE_EXPECTED_SQL["glyphnames"] = (
    "'# ' || chr(10) || translate({col}, '%s', '%s')"
    % (GLYPHNAME_TRANSLATE_SRC, _glyphname_table()[1])
)

ORACLE_PER_BLOCK = 1_000_000  # single paragraph => expected == input text


def recipe_word_grid(text: str, words_per_line: int = 8) -> tuple[bytes, str]:
    """One span per WORD on a clean grid: line j at y = PAGE_TOP - j*LEADING,
    word k at x = PAGE_X + k*60. Purpose-built for the exploded-DataFrame
    layout demo: the span sequence (and so the lag/cumsum line grouping)
    is exactly derivable from the input text in plain SQL."""
    words = [w for w in text.split(" ") if w]
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    for idx, word in enumerate(words):
        line, col = divmod(idx, words_per_line)
        x = PAGE_X + col * 60
        y = PAGE_TOP - line * LEADING
        ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, _esc(word)))
    ops.append(b"ET")
    # full-pipeline expected: one column (line gap 4pt <= 5), one
    # paragraph (uniform left offsets), words re-joined by spaces
    return make_single_page(b"\n".join(ops)), "# \n" + " ".join(words)


RECIPES["word_grid"] = recipe_word_grid


def recipe_macroman(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """BaseEncoding /MacRomanEncoding with every SPACE encoded as byte
    0xCA (MacRoman `nbspace` -> U+00A0): decoding walks the MacRoman
    glyphmap for a high byte, and normalize()'s JS-\\s flatten folds the
    NBSP back to a plain space — so expected == the simple extraction.
    ASCII letters ride the MacRoman low range (identical to ASCII)."""
    blocks = split_blocks(wrap_text(text), per_block)
    font = base_font_object()
    font["FirstChar"] = 32
    font["LastChar"] = 255
    font["Widths"] = [500] * (255 - 32 + 1)
    font["Encoding"] = {
        "Type": Name("Encoding"),
        "BaseEncoding": Name("MacRomanEncoding"),
    }
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            encoded = bytes(0xCA if ch == " " else ord(ch) for ch in line)
            ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (PAGE_X, y, _escape_string(encoded)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    pdf = make_single_page(b"\n".join(ops), font_objects={"F1": font})
    return pdf, expected_string(blocks)


RECIPES["macroman"] = recipe_macroman
ORACLE_EXPECTED_SQL["macroman"] = _DEFAULT_EXPECTED_SQL


# a-p -> dingbat characters reached through the AGL-decodable aN glyph
# names (all normalize()-stable); remaining chars go through uniXXXX
ZAPF_TRANSLATE_SRC = "abcdefghijklmnop"
ZAPF_GLYPH_NAMES = [
    "a1", "a2", "a3", "a4", "a40", "a41", "a42", "a43",
    "a48", "a49", "a50", "a51", "a58", "a59", "a60", "a61",
]


def _zapf_table() -> tuple[dict[str, str], str]:
    """(char -> ZapfDingbats glyph name for a-p, translate destination)."""
    from .encoding.glyphlist import GLYPHLIST

    name_of = dict(zip(ZAPF_TRANSLATE_SRC, ZAPF_GLYPH_NAMES))
    dst = "".join(GLYPHLIST[n] for n in ZAPF_GLYPH_NAMES)
    return name_of, dst


def recipe_zapf_dingbats(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Widths-less /ZapfDingbats Type1 font: measuring must fall back to
    the full ZapfDingbats AFM table (core/afm.py; reference
    font/index.ts:389-411), and the per-word TJ kern gaps mean every word
    advance runs through real a1..a191 dingbat widths. Letters a-p map
    via Encoding /Differences to dingbat aN names the AGL can decode;
    everything else goes through uniXXXX (those codes measure at the
    AFM-miss behavior: the None-key catch-all / 1000 default). Expected
    output = translate(text)."""
    name_of, dst = _zapf_table()
    trans = str.maketrans(ZAPF_TRANSLATE_SRC, dst)
    blocks = split_blocks(wrap_text(text), per_block)
    alphabet = sorted(set("".join(" ".join(b) for b in blocks)))
    assert len(alphabet) <= 96, "zapf recipe supports <=96 distinct chars"
    code_of = {ch: 128 + i for i, ch in enumerate(alphabet)}
    differences: list = [128]
    differences.extend(
        Name(name_of[ch]) if ch in name_of else Name("uni%04X" % ord(ch))
        for ch in alphabet
    )
    font = {
        "Type": Name("Font"),
        "Subtype": Name("Type1"),
        "BaseFont": Name("ZapfDingbats"),
        "Encoding": {
            "Type": Name("Encoding"),
            "BaseEncoding": Name("WinAnsiEncoding"),
            "Differences": differences,
        },
    }
    ops = [b"BT /F1 %d Tf" % FONT_SIZE]
    y = PAGE_TOP
    for block in blocks:
        for line in block:
            parts = []
            for i, word in enumerate(line.split(" ")):
                if i > 0:
                    parts.append(b"-300")
                encoded = bytes(code_of[ch] for ch in word)
                parts.append(b"(%s)" % _escape_string(encoded))
            ops.append(b"1 0 0 1 %d %d Tm [ %s ] TJ" % (PAGE_X, y, b" ".join(parts)))
            y -= LEADING
        y -= BLOCK_GAP - LEADING
    ops.append(b"ET")
    pdf = make_single_page(b"\n".join(ops), font_objects={"F1": font})
    expected_blocks = [[line.translate(trans) for line in b] for b in blocks]
    return pdf, expected_string(expected_blocks)


RECIPES["zapf_dingbats"] = recipe_zapf_dingbats
ORACLE_EXPECTED_SQL["zapf_dingbats"] = (
    "'# ' || chr(10) || translate({col}, '%s', '%s')"
    % (ZAPF_TRANSLATE_SRC, _zapf_table()[1])
)


INFO_AUTHOR = "pdfgen synthetic corpus"


def info_title_for(text: str) -> str:
    """Deterministic Info /Title for a doc: 'é ' + first 3 words (the
    accent forces the UTF-16BE-with-BOM text-string path)."""
    return "é " + " ".join(text.split(" ")[:3])


def recipe_info_unicode(text: str, per_block: int = 6) -> tuple[bytes, str]:
    """Simple page plus a trailer /Info dict: /Title as a UTF-16BE+BOM
    text string (decodeBuffer's BOM branch, reference
    encoding/index.ts:181-191), /Author as a PDFDocEncoding string."""
    blocks = split_blocks(wrap_text(text), per_block)
    w = PDFWriter()
    font_ref = w.add(base_font_object())
    content_ref = w.add_stream({}, content_ops_simple(blocks))
    pages_ref = w.reserve()
    page_ref = w.add({
        "Type": Name("Page"),
        "Parent": pages_ref,
        "MediaBox": [0, 0, 612, 792],
        "Resources": {"Font": {"F1": font_ref}},
        "Contents": content_ref,
    })
    w.set(pages_ref, {"Type": Name("Pages"), "Kids": [page_ref], "Count": 1})
    root_ref = w.add({"Type": Name("Catalog"), "Pages": pages_ref})
    title_bytes = b"\xfe\xff" + info_title_for(text).encode("utf-16-be")
    info_ref = w.add({"Title": title_bytes, "Author": INFO_AUTHOR.encode("ascii")})
    return w.build(root_ref, info=info_ref), expected_string(blocks)


RECIPES["info_unicode"] = recipe_info_unicode
