"""Fonts: charcode->Unicode encoding merge and glyph-width measurement.

Re-expresses /root/reference/font/index.ts (Font/Type1Font/Type0Font/CIDFont)
and font/descriptor.ts (FontDescriptor). Fonts hold a reference to their
PDFDocument for lazy indirect-reference resolution, mirroring the Model
pattern (reference models.ts:56-100).
"""
from __future__ import annotations

import re
from functools import cached_property

from .afm import AFM_DEFAULT_WIDTH, CORE14_WIDTHS
from .cmap import parse_cmap
from .encoding import GLYPHMAPS, StandardEncoding, decode_glyphname, expand_differences
from .encoding.glyphlist import GLYPHLIST
from .util import read_char_codes

# charcode -> unicode for the Standard encoding fallback
# (reference font/index.ts:13 StandardUnicode)
STANDARD_UNICODE: dict[int, str] = {
    code: GLYPHLIST[name] for code, name in StandardEncoding.items() if name in GLYPHLIST
}

# Core-14 font metrics: full public Adobe AFM width tables (core/afm.py),
# matching the reference's `afm` package fallback (font/index.ts:389-411).
# Non-Core-14 fonts without /Widths raise, like the reference
# (font/index.ts:410-412).

_BOLD_RE = re.compile(r"bold", re.IGNORECASE)
_ITALIC_RE = re.compile(r"italic", re.IGNORECASE)


class FontDescriptor:
    """reference font/descriptor.ts:32-100."""

    def __init__(self, doc, obj):
        from .doc import NULL_DOC

        self._doc = doc if doc is not None else NULL_DOC
        self.object = self._doc.resolve(obj)

    def get(self, key):
        return self._doc.resolve(self.object.get(key)) if self.object else None

    @property
    def char_set(self) -> list[str]:
        cs = self.get("CharSet")
        if not cs:
            return []
        if isinstance(cs, bytes):
            cs = cs.decode("latin-1")
        return str(cs)[1:].split("/")

    def _type1_font_program_cleartext(self) -> str | None:
        font_file = self.object.get("FontFile") if self.object else None
        if font_file is None:
            return None
        from .doc import ContentStream

        stream = ContentStream(self._doc, font_file)
        if stream.object is None:
            return None
        length1 = stream.dictionary.get("Length1")
        return stream.buffer[: int(length1)].decode("latin-1")

    def get_weight(self) -> str | None:
        text = self._type1_font_program_cleartext()
        if text:
            # JS-exact classes (CLAUDE.md fidelity traps): the program
            # text is latin-1-decoded, where Python \s also matches
            # \x1c-\x1f/\x85 and \w matches accented letters that V8's
            # ASCII-only \s/\w do not
            m = re.search(r"/Weight[ \t\n\r\f\v\xa0]+\(([^\)]+)\)", text)
            if m:
                return m.group(1)
        return None

    def get_glyphmap(self) -> dict[int, str]:
        """Parse `/Encoding ... dup N /glyph put` from the embedded Type1
        font program (reference font/descriptor.ts:10-27,93-99)."""
        text = self._type1_font_program_cleartext()
        if not text:
            return {}
        start = text.find("/Encoding")
        section = text[start:] if start >= 0 else text
        glyphmap: dict[int, str] = {}
        m = re.search(
            r"/Encoding[ \t\n\r\f\v\xa0]+"
            r"(StandardEncoding|MacRomanEncoding|WinAnsiEncoding|PDFDocEncoding)",
            section,
        )
        if m:
            glyphmap.update(GLYPHMAPS.get(m.group(1), {}))
        for dm in re.finditer(r"dup ([0-9]+) /([A-Za-z0-9_]+) put", section):
            glyphmap[int(dm.group(1))] = dm.group(2)
        return glyphmap


class Font:
    """Base font: encoding merge + decode (reference font/index.ts:44-301)."""

    _skip_table: dict | None = None
    _placeholder_table: dict | None = None

    def __init__(self, doc, obj):
        from .doc import NULL_DOC

        self._doc = doc if doc is not None else NULL_DOC
        self.object = self._doc.resolve(obj)
        self.name: str | None = None  # populated by Resources.get_font

    def get(self, key):
        return self._doc.resolve(self.object.get(key))

    @property
    def subtype(self):
        return self.get("Subtype")

    @property
    def base_font(self):
        return self.get("BaseFont")

    @property
    def base_encoding(self):
        enc = self.get("Encoding")
        if isinstance(enc, dict) and enc.get("BaseEncoding"):
            return enc["BaseEncoding"]
        if isinstance(enc, str):
            return enc
        return None

    @property
    def differences(self):
        enc = self.get("Encoding")
        if isinstance(enc, dict):
            return self._doc.resolve(enc.get("Differences")) or None
        return None

    @property
    def font_descriptor(self) -> FontDescriptor | None:
        obj = self.object.get("FontDescriptor")
        return FontDescriptor(self._doc, obj) if obj is not None else None

    @property
    def first_char(self):
        return self.get("FirstChar")

    @property
    def last_char(self):
        return self.get("LastChar")

    @cached_property
    def bold(self) -> bool:
        base_font = self.base_font
        if base_font and _BOLD_RE.search(str(base_font)):
            return True
        fd = self.font_descriptor
        if fd:
            font_name = fd.get("FontName")
            if font_name and _BOLD_RE.search(str(font_name)):
                return True
            weight = fd.get("FontWeight")
            if weight and weight >= 700:
                return True
            if fd.get_weight() == "Bold":
                return True
        return False

    @cached_property
    def italic(self) -> bool:
        base_font = self.base_font
        if base_font and _ITALIC_RE.search(str(base_font)):
            return True
        fd = self.font_descriptor
        if fd:
            font_name = fd.get("FontName")
            if font_name and _ITALIC_RE.search(str(font_name)):
                return True
            angle = fd.get("ItalicAngle")
            if angle:
                return True
        return False

    @cached_property
    def encoding(self) -> dict:
        """Layered merge (reference font/index.ts:161-224):
        BaseEncoding glyphmap -> FontDescriptor glyphmap -> ToUnicode CMap
        (sets characterByteLength) -> Standard fallback if nothing mapped ->
        Differences overlay last.

        Returns {'mapping': dict[int, str], 'characterByteLength': int}.
        """
        glyphmap: dict[int, str] = {}
        character_byte_length = 1

        base_encoding = self.base_encoding
        if base_encoding in GLYPHMAPS:
            glyphmap.update(GLYPHMAPS[base_encoding])
        # 'Identity-H' recognized but does not set characterByteLength
        # (reference font/index.ts:172-175)

        fd = self.font_descriptor
        if fd is not None:
            first_char, last_char = self.first_char, self.last_char
            char_set = fd.char_set
            if first_char and last_char and first_char == last_char and len(char_set) == 1:
                glyphmap[first_char] = char_set[0]
            else:
                glyphmap.update(fd.get_glyphmap())

        stringmap: dict[int, str] = {}
        for code, glyphname in glyphmap.items():
            s = decode_glyphname(glyphname)
            if s is not None:
                stringmap[code] = s
        touched = len(glyphmap) > 0

        to_unicode = self.object.get("ToUnicode")
        if to_unicode is not None:
            from .doc import ContentStream

            stream = ContentStream(self._doc, to_unicode)
            if stream.object is not None:
                cmap = parse_cmap(stream.buffer)
                character_byte_length = cmap["byteLength"]
                for m in cmap["mappings"]:
                    stringmap[m["src"]] = m["dst"]
                touched = touched or len(cmap["mappings"]) > 0

        if not touched:
            # no mapping found at all: low-confidence Standard-charset fallback
            stringmap.update(STANDARD_UNICODE)

        for code, glyphname in expand_differences(self.differences or []).items():
            s = decode_glyphname(glyphname)
            if s is not None:
                stringmap[code] = s

        return {"mapping": stringmap, "characterByteLength": character_byte_length}

    def decode_string(self, buffer: bytes, skip_missing: bool = False) -> str:
        """bytes -> charCodes -> mapped text; missing codes skipped or
        rendered as \\u{xx} placeholders (reference font/index.ts:238-256)."""
        encoding = self.encoding
        if encoding["characterByteLength"] == 1:
            # one C-level translate: byte -> mapped string (None deletes,
            # mirroring skip_missing), placeholder otherwise
            table = (
                self._skip_table if skip_missing else self._placeholder_table
            )
            if table is None:
                mapping = encoding["mapping"]
                table = {}
                for code in range(256):
                    s = mapping.get(code)
                    if s is not None:
                        table[code] = s
                    elif skip_missing:
                        table[code] = None
                    else:
                        table[code] = "\\u{%s}" % format(code, "x")
                if skip_missing:
                    self._skip_table = table
                else:
                    self._placeholder_table = table
            return buffer.decode("latin-1").translate(table)
        mapping = encoding["mapping"]
        out = []
        for char_code in read_char_codes(buffer, encoding["characterByteLength"]):
            s = mapping.get(char_code)
            if s is None:
                out.append("" if skip_missing else "\\u{%s}" % format(char_code, "x"))
            else:
                out.append(s)
        return "".join(out)

    def measure(self, buffer: bytes) -> float:  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def get_constructor(subtype):
        """Subtype dispatch (reference font/index.ts:283-300): Type0 ->
        Type0Font; Type1/TrueType/Type3/anything else -> Type1Font."""
        return Type0Font if subtype == "Type0" else Type1Font


class Type1Font(Font):
    """reference font/index.ts:354-419."""

    _width_mapping: dict | None = None
    _default_width: float | None = None

    def _initialize_width_mapping(self) -> None:
        base_font = self.base_font
        base_font_name = str(base_font).split(",")[0] if base_font else None
        widths = self.get("Widths")
        font_matrix = self.get("FontMatrix")
        multiplier = (font_matrix[0] / 0.001) if font_matrix else 1
        if widths is not None:
            # NO default for a missing /FirstChar: the reference computes
            # undefined + i = NaN, so every width collapses onto
            # widthMapping[undefined] (last writer wins) and all mapped
            # glyphs measure at the default (font/index.ts:389-394)
            first_char = self.get("FirstChar")
            mapping = self.encoding["mapping"]
            self._width_mapping = {}
            for i, width in enumerate(widths):
                s = (mapping.get(first_char + i)
                     if first_char is not None else None)
                self._width_mapping[s] = width * multiplier
            fd = self.font_descriptor
            missing = fd.get("MissingWidth") if fd else None
            self._default_width = missing or 0
        elif base_font_name in CORE14_WIDTHS:
            # Core-14 AFM fallback: key by DECODED STRING via the AGL,
            # exactly like the reference (font/index.ts:402-408
            # widthMapping[glyphlist[cm.name]] = cm.width; default 1000).
            # Names the AGL cannot decode collapse to the None key —
            # mirroring JS, where widthMapping[undefined] is one shared
            # "undefined" property that each such name overwrites (last
            # writer in AFM order wins) and that encoding-less char codes
            # then look up. Matters for ZapfDingbats, whose aN names are
            # mostly non-AGL.
            self._width_mapping = {}
            for glyph_name, width in CORE14_WIDTHS[base_font_name].items():
                self._width_mapping[GLYPHLIST.get(glyph_name)] = width
            self._default_width = AFM_DEFAULT_WIDTH
        else:
            raise ValueError(
                f"Font[{self.name}] Cannot initialize width mapping for "
                'Type 1 Font without "Widths" field'
            )

    _code_widths: dict | None = None
    _unmapped_width: float | None = None

    def _build_code_widths(self) -> None:
        """Flatten charCode -> glyph -> width into one charCode -> width
        table so measure() is a single dict lookup per code. Numerically
        identical to the two-step lookup (same float values, same adds)."""
        mapping = self.encoding["mapping"]
        wm, default = self._width_mapping, self._default_width
        # codes absent from the encoding map to glyph None; the two-step
        # path then checks `None in width_mapping`
        self._unmapped_width = wm[None] if None in wm else default
        self._code_widths = {
            code: (wm[s] if s in wm else default) for code, s in mapping.items()
        }

    def measure(self, buffer: bytes) -> float:
        if self._width_mapping is None or self._default_width is None:
            self._initialize_width_mapping()
        if self._code_widths is None:
            self._build_code_widths()
        code_widths, unmapped = self._code_widths, self._unmapped_width
        total = 0.0
        if self.encoding["characterByteLength"] == 1:
            for char_code in buffer:
                total += code_widths.get(char_code, unmapped)
        else:
            for char_code in read_char_codes(buffer, self.encoding["characterByteLength"]):
                total += code_widths.get(char_code, unmapped)
        return total


class CIDFont:
    """reference font/index.ts:488-544."""

    def __init__(self, doc, obj):
        from .doc import NULL_DOC

        self._doc = doc if doc is not None else NULL_DOC
        self.object = self._doc.resolve(obj)

    def get(self, key):
        return self._doc.resolve(self.object.get(key))

    def get_default_width(self):
        return self.get("DW")

    def get_width_mapping(self) -> dict[int, float]:
        """Expand the /W array, both `c [w..]` and `c_first c_last w` forms."""
        mapping: dict[int, float] = {}
        cid_widths = self.get("W") or []
        index, length = 0, len(cid_widths)
        while index < length:
            if isinstance(cid_widths[index + 1], list):
                start = int(cid_widths[index])
                for off, width in enumerate(cid_widths[index + 1]):
                    mapping[start + off] = width
                index += 2
            else:
                c_first = int(cid_widths[index])
                c_last = int(cid_widths[index + 1])
                width = cid_widths[index + 2]
                for cid in range(c_first, c_last + 1):
                    mapping[cid] = width
                index += 3
        return mapping


class Type0Font(Font):
    """Composite font (reference font/index.ts:436-468)."""

    _width_mapping: dict | None = None
    _default_width: float | None = None

    @property
    def descendant_font(self) -> CIDFont:
        array = self.get("DescendantFonts")
        return CIDFont(self._doc, array[0])

    def _initialize_width_mapping(self) -> None:
        df = self.descendant_font
        self._width_mapping = df.get_width_mapping()
        self._default_width = df.get_default_width()

    def measure(self, buffer: bytes) -> float:
        if self._width_mapping is None or self._default_width is None:
            self._initialize_width_mapping()
        default = self._default_width or 0
        total = 0.0
        for char_code in read_char_codes(buffer, self.encoding["characterByteLength"]):
            total += self._width_mapping.get(char_code, default)
        return total
