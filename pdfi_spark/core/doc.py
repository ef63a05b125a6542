"""Document model: xref/trailer chain, object resolution, page tree,
resources (reference /root/reference/PDF.ts and models.ts)."""
from __future__ import annotations

from .filters import apply_filters
from .lexing import Buf, rfind
from .objects import (
    as_array,
    is_reference,
    parse_object,
    parse_startxref,
    parse_xref_with_trailer,
)


class PDFDocument:
    """One parsed PDF byte payload.

    Object lookup replaces the reference's linear xref scan
    (PDF.ts:91-100) with a first-match-wins dict — output-identical,
    O(1) per lookup.
    """

    def __init__(self, data: bytes):
        self.data = data
        self._trailer_objects: list[dict] | None = None
        self.cross_references: list[dict] = []
        self._xref_index: dict[tuple[int, int], dict] = {}
        self._cached_objects: dict[tuple[int, int], object] = {}
        self._cached_fonts: dict = {}
        self._cached_object_streams: dict[int, list] = {}

    # -- trailer / xref chain (reference PDF.ts:31-50) -----------------------

    def read_trailers(self) -> None:
        startxref_position = rfind(self.data, b"startxref")
        if startxref_position < 0:
            raise ValueError('Could not find "startxref" marker in file')
        next_xref_position = parse_startxref(Buf(self.data, startxref_position, self._resolve_ref))
        self._trailer_objects = []
        seen_positions = set()
        while next_xref_position:
            if next_xref_position in seen_positions:
                break  # cycle guard (malformed Prev chains)
            seen_positions.add(next_xref_position)
            xt = parse_xref_with_trailer(Buf(self.data, next_xref_position, self._resolve_ref))
            next_xref_position = (xt.get("trailer") or {}).get("Prev")
            for ref in xt.get("cross_references", ()):
                self.cross_references.append(ref)
                if ref.get("in_use"):
                    key = (ref["object_number"], ref["generation_number"])
                    self._xref_index.setdefault(key, ref)
            self._trailer_objects.append(xt.get("trailer") or {})

    @property
    def trailer(self) -> dict:
        """Merged trailer dict. The reference merges via
        assign({}, newest, ..., oldest) — later (older) trailers override
        (models.ts:454-457); reproduced as sequential update in read order."""
        if self._trailer_objects is None:
            self.read_trailers()
        merged: dict = {}
        for obj in self._trailer_objects:
            merged.update(obj)
        return merged

    # -- object resolution (reference PDF.ts:91-161) --------------------------

    def find_cross_reference(self, object_number: int, generation_number: int) -> dict:
        if self._trailer_objects is None:
            self.read_trailers()
        ref = self._xref_index.get((object_number, generation_number))
        if ref is None:
            raise ValueError(
                f"Could not find a cross reference for {object_number}:{generation_number}"
            )
        return ref

    def get_object(self, object_number: int, generation_number: int):
        key = (object_number, generation_number)
        if key not in self._cached_objects:
            self._cached_objects[key] = self._read_object(object_number, generation_number)
        return self._cached_objects[key]

    def _read_object(self, object_number: int, generation_number: int):
        ref = self.find_cross_reference(object_number, generation_number)
        if ref.get("offset"):
            indirect = parse_object(Buf(self.data, ref["offset"], self._resolve_ref))
        else:
            # decode + parse each /ObjStm once per document, not per lookup
            objstm_number = ref["object_stream_object_number"]
            objects = self._cached_object_streams.get(objstm_number)
            if objects is None:
                objects = ObjectStream(
                    self, self.get_object(objstm_number, 0)
                ).objects
                self._cached_object_streams[objstm_number] = objects
            indirect = objects[ref["object_stream_index"]]
        if indirect["object_number"] != ref["object_number"]:
            raise ValueError(
                f"PDF cross references are incorrect; the offset {ref.get('offset')} "
                f"does not lead to an object numbered {ref['object_number']}; instead, "
                f"the object at that offset is {indirect['object_number']}"
            )
        return indirect["value"]

    def resolve(self, obj):
        """Resolve a potential indirect reference (reference PDF.ts:192-197)."""
        if is_reference(obj):
            return self.get_object(obj["object_number"], obj["generation_number"])
        return obj

    def _resolve_ref(self, obj):
        return self.resolve(obj)

    # -- page tree (reference PDF.ts:166-168) ---------------------------------

    @property
    def pages(self) -> list["Page"]:
        catalog = self.resolve(self.trailer["Root"])
        return Pages(self, catalog["Pages"]).get_leaves()


class _NullDoc:
    """Stand-in document for inline (reference-free) object graphs, e.g.
    the mock Resources in the reference's textparser tests."""

    def resolve(self, obj):
        return obj

    def _resolve_ref(self, obj):
        return obj


NULL_DOC = _NullDoc()


class Model:
    def __init__(self, doc, obj):
        self._doc = doc if doc is not None else NULL_DOC
        self.object = self._doc.resolve(obj)

    def get(self, key):
        return self._doc.resolve(self.object.get(key)) if self.object else None


class Pages(Model):
    """Pages tree node (reference models.ts:108-157)."""

    @property
    def parent(self):
        p = self.object.get("Parent")
        return Pages(self._doc, p) if p is not None else None

    @property
    def media_box(self):
        mb = self.get("MediaBox")
        if mb is None and self.parent is not None:
            return self.parent.media_box
        return mb

    def get_leaves(self) -> list["Page"]:
        leaves: list[Page] = []
        for kid in self.object["Kids"]:
            kid_object = self._doc.resolve(kid)
            if kid_object.get("Type") == "Pages":
                leaves.extend(Pages(self._doc, kid_object).get_leaves())
            else:
                leaves.append(Page(self._doc, kid_object))
        return leaves


class Page(Model):
    """reference models.ts:178-240."""

    @property
    def parent(self) -> Pages:
        return Pages(self._doc, self.object["Parent"])

    @property
    def media_box(self):
        mb = self.get("MediaBox")
        if mb is None:
            return self.parent.media_box
        return mb

    @property
    def resources(self) -> "Resources":
        return Resources(self._doc, self.object.get("Resources"))

    def join_contents(self, separator: bytes) -> bytes:
        """Concatenate 1..n decoded content streams with a token-boundary
        separator (reference models.ts:219-229)."""
        contents = self._doc.resolve(self.object.get("Contents"))
        chunks = []
        for stream in as_array(contents):
            chunks.append(ContentStream(self._doc, stream).buffer)
        return separator.join(chunks)


class ContentStream(Model):
    """{dictionary, buffer} stream with lazy filter decode
    (reference models.ts:251-290)."""

    @property
    def dictionary(self) -> dict:
        return self.object["dictionary"]

    @property
    def subtype(self):
        return self.dictionary.get("Subtype")

    @property
    def resources(self):
        obj = self.dictionary.get("Resources")
        return Resources(self._doc, obj) if obj is not None else None

    @property
    def buffer(self) -> bytes:
        return apply_filters(
            self.object["buffer"],
            as_array(self.dictionary.get("Filter")),
            [self._doc.resolve(p) for p in as_array(self.dictionary.get("DecodeParms"))],
        )


class ObjectStream(ContentStream):
    """PDF-1.5 /ObjStm: (objnum, offset) prefix pairs + packed objects
    (reference models.ts:295-315)."""

    @property
    def objects(self) -> list[dict]:
        buffer = self.buffer
        first = int(self.dictionary["First"])
        prefix = buffer[:first].decode("ascii")
        numbers = [int(x) for x in prefix.split()]
        out = []
        for i in range(0, len(numbers), 2):
            object_number, offset = numbers[i], numbers[i + 1]
            value = parse_object(Buf(buffer, first + offset, self._doc._resolve_ref))
            out.append({
                "object_number": object_number,
                "generation_number": 0,
                "value": value,
            })
        return out


class Resources(Model):
    """Font/XObject/ExtGState lookups with per-Resources font caching
    (reference models.ts:330-404)."""

    def __init__(self, doc, obj):
        super().__init__(doc, obj)
        self._cached_fonts: dict = {}

    def get_xobject(self, name: str) -> ContentStream | None:
        xobjects = self.get("XObject") or {}
        obj = xobjects.get(name)
        return ContentStream(self._doc, obj) if obj is not None else None

    def get_font(self, name: str):
        from .fonts import Font

        cached = self._cached_fonts.get(name)
        if cached is None:
            font_dictionary = self.get("Font") or {}
            dictionary_value = font_dictionary.get(name)
            font_object = self._doc.resolve(dictionary_value)
            if font_object is None:
                raise ValueError(f"Cannot find font object for name={name}")
            ctor = Font.get_constructor(font_object.get("Subtype"))
            if is_reference(dictionary_value):
                # document-level model cache so per-font memoized encodings
                # are shared across Resources (reference PDF.ts:116-128)
                key = (
                    ctor.__name__,
                    dictionary_value["object_number"],
                    dictionary_value["generation_number"],
                )
                cached = self._doc._cached_fonts.get(key)
                if cached is None:
                    cached = ctor(self._doc, font_object)
                    self._doc._cached_fonts[key] = cached
            else:
                cached = ctor(self._doc, font_object)
            cached.name = name
            self._cached_fonts[name] = cached
        return cached

    def get_ext_gstate(self, name: str):
        gstates = self.get("ExtGState") or {}
        obj = gstates.get(name)
        return Model(self._doc, obj) if obj is not None else None
