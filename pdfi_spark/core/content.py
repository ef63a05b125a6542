"""Content-stream tokenizer and the text-positioning interpreter
(reference /root/reference/parsers/states.ts:18-221 CONTENT_STREAM/IMAGEDATA
and /root/reference/graphics/stream.ts).

The tokenizer produces {'operands': [...], 'operator': str, 'alias': str}
operations; the interpreter executes the semantically live subset (text
state/positioning/showing, graphics state, XObject recursion) and treats
path/color/clip/shading/marked-content operators as operand-consuming
no-ops, exactly as the reference does.
"""
from __future__ import annotations

import re

from .geometry import MAT3_IDENT, mat3mul
from .lexing import Buf
from .util import utf16_length
from .objects import (
    _WS_BYTES,
    consume_string,
    parse_array,
    parse_dictionary,
    unescape_name,
)

# Table of the 72 aliased operators (reference parsers/states.ts:36-126;
# operator set from PDF 32000-1:2008 Annex A).
OPERATOR_ALIASES = {
    "w": "setLineWidth", "J": "setLineCap", "j": "setLineJoin",
    "M": "setMiterLimit", "d": "setDashPattern", "ri": "setRenderingIntent",
    "i": "setFlatnessTolerance", "gs": "setGraphicsStateParameters",
    "q": "pushGraphicsState", "Q": "popGraphicsState", "cm": "setCTM",
    "m": "moveTo", "l": "appendLine", "c": "appendCurve123",
    "v": "appendCurve23", "y": "appendCurve13", "h": "closePath",
    "re": "appendRectangle",
    "S": "stroke", "s": "closeAndStroke", "f": "fill", "F": "fillCompat",
    "f*": "fillEvenOdd", "B": "fillThenStroke", "B*": "fillThenStrokeEvenOdd",
    "b": "closeAndFillThenStroke", "b*": "closeAndFillThenStrokeEvenOdd",
    "n": "closePathNoop",
    "W": "clip", "W*": "clipEvenOdd",
    "BT": "startTextBlock", "ET": "endTextBlock",
    "Tc": "setCharSpacing", "Tw": "setWordSpacing", "Tz": "setHorizontalScale",
    "TL": "setLeading", "Tf": "setFont", "Tr": "setRenderingMode",
    "Ts": "setRise",
    "Td": "adjustCurrentPosition", "TD": "adjustCurrentPositionWithLeading",
    "Tm": "setTextMatrix", "T*": "newLine",
    "Tj": "showString", "TJ": "showStrings",
    "'": "newLineAndShowString", '"': "newLineAndShowStringWithSpacing",
    "d0": "setType3FontCharWidthShapeColor", "d1": "setType3FontCharWidthShape",
    "CS": "setStrokeColorSpace", "cs": "setFillColorSpace",
    "SC": "setStrokeColorSpace2", "SCN": "setStrokeColorSpace3",
    "sc": "setFillColorSpace2", "scn": "setFillColorSpace3",
    "G": "setStrokeGray", "g": "setFillGray",
    "RG": "setStrokeColor", "rg": "setFillColor",
    "K": "setStrokeCMYK", "k": "setFillCMYK",
    "sh": "shadingPattern",
    "BI": "beginInlineImage", "EI": "endInlineImage",
    "Do": "drawObject",
    "MP": "designatedMarkedContentPoint",
    "DP": "designatedMarkedContentPointProperties",
    "BMC": "beginMarkedContent", "BDC": "beginMarkedContentWithDictionary",
    "EMC": "endMarkedContent",
    "BX": "beginCompatibility", "EX": "endCompatibility",
}

_WS_RE = re.compile(rb"\s+")
_HEX_RE = re.compile(rb"<([A-Fa-f0-9 \r\n]*)>")
_BOOL_RE = re.compile(rb"(true|false)")
_NAME_RE = re.compile(rb"/([!-'*-.0-;=?-Z\\^-z|~]+)")
_FLOAT_RE = re.compile(rb"-?[0-9]*\.[0-9]+")
_INT_RE = re.compile(rb"-?[0-9]+")
# one match for either numeric form (float alternative first, same
# precedence as the FLOAT-then-INT attempts it replaces)
_NUMBER_RE = re.compile(rb"-?(?:[0-9]*\.[0-9]+|[0-9]+)")
_COMMENT_RE = re.compile(rb"%.+?(\r\n|\n|\r)")
_OPERATOR_RE = re.compile(rb"[A-Za-z'\"]+[01*]?")
_NONSPACE_RE = re.compile(rb"\S+")


def _consume_image_data(buf: Buf) -> bytes:
    """Raw inline-image bytes until an `EI` token boundary
    (reference parsers/states.ts:18-34 IMAGEDATA)."""
    data = buf.data
    out = bytearray()
    while buf.pos < len(data):
        if data.startswith(b"EI", buf.pos):
            buf.pos += 2
            return bytes(out)
        m = _NONSPACE_RE.match(data, buf.pos)
        if m:
            out.extend(m.group(0))
            buf.pos = m.end()
        else:
            out.append(data[buf.pos])
            buf.pos += 1
    return bytes(out)


_CLEAN_WS_RE = re.compile(rb"\s+")


def parse_content_stream(buffer: bytes) -> list[dict]:
    """Tokenize a content stream into operations.

    First-byte dispatch over the same token grammar (and the same
    precedence: bool before name/number before operator) as the
    reference's CONTENT_STREAM machine (parsers/states.ts:134-221)."""
    buf = Buf(buffer)
    data = buffer
    end = len(data)
    operations: list[dict] = []
    stack: list = []
    while buf.pos < end:
        pos = buf.pos
        b = data[pos]
        if b in _WS_BYTES:
            buf.pos = _WS_RE.match(data, pos).end()
            continue
        if 0x30 <= b <= 0x39 or b == 0x2D or b == 0x2E:  # digit - .
            m = _NUMBER_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                tok = m.group(0)
                stack.append(float(tok) if b"." in tok else int(tok))
                continue
        elif b == 0x28:  # (
            buf.pos = pos + 1
            stack.append(consume_string(buf))
            continue
        elif b == 0x2F:  # /
            m = _NAME_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                stack.append(unescape_name(m.group(1)))
                continue
        elif b == 0x3C:  # <
            if data.startswith(b"<<", pos):
                buf.pos = pos + 2
                stack.append(parse_dictionary(buf))
                continue
            m = _HEX_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                hexstring = _CLEAN_WS_RE.sub(b"", m.group(1))
                if len(hexstring) % 2 == 1:
                    hexstring = hexstring[:-1]  # JS Buffer.from(.., 'hex') drops odd tail
                stack.append(bytes.fromhex(hexstring.decode("ascii")))
                continue
        elif b == 0x5B:  # [
            buf.pos = pos + 1
            stack.append(parse_array(buf))
            continue
        elif b == 0x25:  # %
            m = _COMMENT_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                continue
        else:
            if data.startswith(b"ID", pos):
                buf.pos = pos + 2
                image_data = _consume_image_data(buf)
                stack.append(image_data)
                operations.append(
                    {"operands": stack, "operator": "EI", "alias": "endInlineImage"}
                )
                stack = []
                continue
            m = _BOOL_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                stack.append(m.group(0) == b"true")
                continue
            m = _OPERATOR_RE.match(data, pos)
            if m:
                buf.pos = m.end()
                operator = m.group(0).decode("latin-1")
                operations.append({
                    "operands": stack,
                    "operator": operator,
                    "alias": OPERATOR_ALIASES.get(operator),
                })
                stack = []
                continue
        raise ValueError(
            f"Invalid content stream at {buf.pos}: {data[buf.pos:buf.pos + 64]!r}"
        )
    return operations


class TextState:
    """reference graphics/stream.ts:67-80."""

    __slots__ = (
        "char_spacing", "word_spacing", "horizontal_scaling", "leading",
        "font_name", "font_size", "rendering_mode", "rise",
    )

    def __init__(self):
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.horizontal_scaling = 100.0
        self.leading = 0.0
        self.font_name = None
        self.font_size = None
        self.rendering_mode = 0
        self.rise = 0.0

    def clone(self) -> "TextState":
        other = TextState.__new__(TextState)
        for slot in TextState.__slots__:
            setattr(other, slot, getattr(self, slot))
        return other


class GraphicsState:
    """reference graphics/stream.ts:87-109."""

    __slots__ = (
        "ct_matrix", "stroke_color", "fill_color", "line_width", "line_cap",
        "line_join", "miter_limit", "dash_array", "dash_phase",
        "rendering_intent", "flatness_tolerance", "text_state",
    )

    def __init__(self):
        self.ct_matrix = MAT3_IDENT
        self.stroke_color = None
        self.fill_color = None
        self.line_width = None
        self.line_cap = None
        self.line_join = None
        self.miter_limit = None
        self.dash_array = None
        self.dash_phase = None
        self.rendering_intent = None
        self.flatness_tolerance = None
        self.text_state = TextState()

    def clone(self) -> "GraphicsState":
        other = GraphicsState.__new__(GraphicsState)
        for slot in GraphicsState.__slots__:
            value = getattr(self, slot)
            if slot == "text_state":
                value = value.clone()
            elif isinstance(value, list):
                value = list(value)
            setattr(other, slot, value)
        return other


class DrawingContext:
    """Stateful interpreter; subclass and override show_string / emission
    (reference graphics/stream.ts:122-894). The textMatrix/textLineMatrix
    do not persist across BT..ET blocks; textState does."""

    def __init__(self, resources, depth: int = 0):
        self.resources_stack = [resources]
        self.graphics_state_stack = [GraphicsState()]
        self.text_matrix = None
        self.text_line_matrix = None
        self.depth = depth
        # font memo (used by TextAtomDrawingContext.showString); lives on
        # the base so drawObject can invalidate it around resource swaps
        self._memo_font_key: tuple[int, str] | None = None
        self._memo_font = None

    @property
    def graphics_state(self) -> GraphicsState:
        return self.graphics_state_stack[-1]

    @property
    def resources(self):
        return self.resources_stack[-1]

    # -- geometry helpers (graphics/stream.ts:157-194) -----------------------

    def advance_text_matrix(self, width_units: float, chars: int, spaces: int) -> float:
        ts = self.graphics_state.text_state
        tx = (
            ((width_units / 1000.0) * ts.font_size)
            + (ts.char_spacing * chars)
            + (ts.word_spacing * spaces)
        ) * (ts.horizontal_scaling / 100.0)
        a, b, _, c, d, _, e, f, _ = self.text_matrix
        self.text_matrix = (a, b, 0.0, c, d, 0.0, tx * a + e, tx * b + f, 1.0)
        return tx

    def get_text_position(self) -> tuple[float, float]:
        ts = self.graphics_state.text_state
        composed = mat3mul(self.text_matrix, self.graphics_state.ct_matrix)
        return (
            (ts.rise * composed[3]) + composed[6],
            (ts.rise * composed[4]) + composed[7],
        )

    def get_text_size(self) -> float:
        tm, ct = self.text_matrix, self.graphics_state.ct_matrix
        d = (tm[3] * ct[1]) + (tm[4] * ct[4]) + (tm[5] * ct[7])
        return d * self.graphics_state.text_state.font_size

    # -- dispatch -------------------------------------------------------------

    def apply_operation(self, alias, operands: list) -> None:
        func = getattr(self, alias, None) if alias else None
        if func is not None:
            func(*operands)
        # unknown/unaliased operators: consume operands and continue
        # (reference graphics/stream.ts:791-793)

    def apply_content_stream(self, content_stream_buffer: bytes) -> None:
        for op in parse_content_stream(content_stream_buffer):
            self.apply_operation(op["alias"], op["operands"])

    # -- special graphics state (q, Q, cm) ------------------------------------

    def pushGraphicsState(self):
        self.graphics_state_stack.append(self.graphics_state.clone())

    def popGraphicsState(self):
        self.graphics_state_stack.pop()

    def setCTM(self, a, b, c, d, e, f):
        self.graphics_state.ct_matrix = mat3mul(
            (a, b, 0.0, c, d, 0.0, e, f, 1.0), self.graphics_state.ct_matrix
        )

    # -- XObjects (Do): reference graphics/stream.ts:803-846 ------------------

    def drawObject(self, name):
        xobject = self.resources.get_xobject(name)
        if xobject is None:
            raise ValueError(f"Cannot draw undefined XObject: {name}")
        if xobject.subtype != "Form":
            return  # Image/PS XObjects ignored
        object_depth = self.depth + 1
        if object_depth >= 5:
            return  # recursion cap (reference :815)
        self.pushGraphicsState()
        matrix = xobject.dictionary.get("Matrix")
        if matrix:
            self.setCTM(*matrix)
        next_resources = xobject.resources or self.resources
        self.resources_stack.append(next_resources)
        # the id()-keyed font memo could alias a recycled Resources
        # object across pushes: invalidate at both swap points
        self._memo_font_key = None
        self.depth += 1
        self.apply_content_stream(xobject.buffer)
        self.depth -= 1
        self.resources_stack.pop()
        self._memo_font_key = None
        self.popGraphicsState()

    # -- general graphics state (stored only) ----------------------------------

    def setLineWidth(self, w):
        self.graphics_state.line_width = w

    def setLineCap(self, c):
        self.graphics_state.line_cap = c

    def setLineJoin(self, j):
        self.graphics_state.line_join = j

    def setMiterLimit(self, m):
        self.graphics_state.miter_limit = m

    def setDashPattern(self, dash_array, dash_phase):
        self.graphics_state.dash_array = dash_array
        self.graphics_state.dash_phase = dash_phase

    def setRenderingIntent(self, intent):
        self.graphics_state.rendering_intent = intent

    def setFlatnessTolerance(self, flatness):
        self.graphics_state.flatness_tolerance = flatness

    def setGraphicsStateParameters(self, dict_name):
        # ExtGState keys are looked up then ignored (reference :334-341)
        if self.resources is not None:
            self.resources.get_ext_gstate(dict_name)

    # -- path construction / painting / clipping: logged no-ops ----------------

    def moveTo(self, x, y):
        pass

    def appendLine(self, x, y):
        pass

    def appendCurve123(self, x1, y1, x2, y2, x3, y3):
        pass

    def appendCurve23(self, x2, y2, x3, y3):
        pass

    def appendCurve13(self, x1, y1, x3, y3):
        pass

    def closePath(self):
        pass

    def appendRectangle(self, x, y, width, height):
        pass

    def stroke(self):
        pass

    def closeAndStroke(self):
        self.closePath()
        self.stroke()

    def fill(self):
        pass

    def fillCompat(self):
        self.fill()

    def fillEvenOdd(self):
        pass

    def fillThenStroke(self):
        pass

    def fillThenStrokeEvenOdd(self):
        pass

    def closeAndFillThenStroke(self):
        self.closePath()
        self.fillThenStroke()

    def closeAndFillThenStrokeEvenOdd(self):
        self.closePath()
        self.fillThenStrokeEvenOdd()

    def closePathNoop(self):
        pass

    def clip(self):
        pass

    def clipEvenOdd(self):
        pass

    # -- colors (stored only; tuples stand in for the Color classes) -----------

    def setStrokeColorSpace(self, name):
        pass

    def setFillColorSpace(self, name):
        pass

    def setStrokeColorSpace2(self, *components):
        pass

    def setStrokeColorSpace3(self, *components):
        pass

    def setFillColorSpace2(self, *components):
        pass

    def setFillColorSpace3(self, *components):
        pass

    def setStrokeGray(self, gray):
        self.graphics_state.stroke_color = ("gray", gray)

    def setFillGray(self, gray):
        self.graphics_state.fill_color = ("gray", gray)

    def setStrokeColor(self, r, g, b):
        self.graphics_state.stroke_color = ("rgb", r, g, b)

    def setFillColor(self, r, g, b):
        self.graphics_state.fill_color = ("rgb", r, g, b)

    def setStrokeCMYK(self, c, m, y, k):
        self.graphics_state.stroke_color = ("cmyk", c, m, y, k)

    def setFillCMYK(self, c, m, y, k):
        self.graphics_state.fill_color = ("cmyk", c, m, y, k)

    def shadingPattern(self, name):
        pass

    def beginInlineImage(self):
        pass

    def endInlineImage(self, *args):
        pass

    # -- text objects -----------------------------------------------------------

    def startTextBlock(self):
        self.text_matrix = self.text_line_matrix = MAT3_IDENT

    def endTextBlock(self):
        self.text_matrix = self.text_line_matrix = None

    # -- text state --------------------------------------------------------------

    def setCharSpacing(self, char_space):
        self.graphics_state.text_state.char_spacing = char_space

    def setWordSpacing(self, word_space):
        self.graphics_state.text_state.word_spacing = word_space

    def setHorizontalScale(self, scale):
        self.graphics_state.text_state.horizontal_scaling = scale

    def setLeading(self, leading):
        self.graphics_state.text_state.leading = leading

    def setFont(self, font, size):
        self.graphics_state.text_state.font_name = font
        self.graphics_state.text_state.font_size = size

    def setRenderingMode(self, render):
        self.graphics_state.text_state.rendering_mode = render

    def setRise(self, rise):
        self.graphics_state.text_state.rise = rise

    # -- text positioning ----------------------------------------------------------

    def adjustCurrentPosition(self, x, y):
        a, b, _, c, d, _, e, f, _ = self.text_line_matrix
        self.text_matrix = self.text_line_matrix = (
            a, b, 0.0, c, d, 0.0,
            (x * a) + (y * c) + e, (x * b) + (y * d) + f, 1.0,
        )

    def adjustCurrentPositionWithLeading(self, x, y):
        self.setLeading(-y)
        self.adjustCurrentPosition(x, y)

    def setTextMatrix(self, a, b, c, d, e, f):
        self.text_matrix = self.text_line_matrix = (a, b, 0.0, c, d, 0.0, e, f, 1.0)

    def newLine(self):
        self.adjustCurrentPosition(0, -self.graphics_state.text_state.leading)

    # -- text showing -----------------------------------------------------------------

    def showString(self, buffer: bytes):  # pragma: no cover - abstract
        raise NotImplementedError

    def showStrings(self, array: list):
        for item in array:
            if isinstance(item, bytes):
                self.showString(item)
            else:
                # negative numbers move rightward (spaces); positive = kerning
                self.advance_text_matrix(-item, 0, 0)

    def newLineAndShowString(self, buffer: bytes):
        self.newLine()
        self.showString(buffer)

    def newLineAndShowStringWithSpacing(self, word_space, char_space, buffer: bytes):
        self.setWordSpacing(word_space)
        self.setCharSpacing(char_space)
        self.newLineAndShowString(buffer)

    # -- marked content / compatibility: no-ops -----------------------------------------

    def designatedMarkedContentPoint(self, tag):
        pass

    def designatedMarkedContentPointProperties(self, tag, properties):
        pass

    def beginMarkedContent(self, tag):
        pass

    def beginMarkedContentWithDictionary(self, tag, dictionary):
        pass

    def endMarkedContent(self):
        pass

    def beginCompatibility(self):
        pass

    def endCompatibility(self):
        pass

    def setType3FontCharWidthShapeColor(self, *args):
        pass

    def setType3FontCharWidthShape(self, *args):
        pass


class TextAtomDrawingContext(DrawingContext):
    """Collects positioned TextAtoms (reference graphics/stream.ts:859-894)."""

    def __init__(self, text_atoms: list, resources, depth: int = 0):
        super().__init__(resources, depth)
        self.text_atoms = text_atoms

    def showString(self, buffer: bytes):
        font_name = self.graphics_state.text_state.font_name
        resources = self.resources
        key = (id(resources), font_name)
        if key == self._memo_font_key:
            font = self._memo_font
        else:
            font = resources.get_font(font_name)
            self._memo_font_key = key
            self._memo_font = font
        if font is None:
            raise ValueError(f'Cannot find font "{font_name}" in Resources')
        x, y = self.get_text_position()
        height = self.get_text_size()
        width_units = font.measure(buffer)
        text = font.decode_string(buffer, skip_missing=True)
        # UTF-16 code units, not code points: JS text.length counts astral
        # chars as 2, and charSpacing advances per code unit
        # (reference graphics/stream.ts:884-886)
        nchars = utf16_length(text)
        nspaces = text.count(" ")
        self.advance_text_matrix(width_units, nchars, nspaces)
        width = self.get_text_position()[0] - x
        self.text_atoms.append({
            "x": x, "y": y, "width": width, "height": height,
            "fontName": font_name, "font": font, "buffer": buffer, "text": text,
        })
