"""Golden tests ported from the reference's ava suite:
/root/reference/test/pdfobject.ts (14 cases),
/root/reference/test/consumers.ts (4 cases),
/root/reference/test/xref.ts (4 cases, incl. both PDF spec 7.5.4 examples).
"""
import pytest

from pdfi_spark.core.lexing import Buf
from pdfi_spark.core.objects import (
    consume_string,
    parse_object,
    parse_xref,
)


def check(input_str: str, expected):
    buf = Buf(input_str.encode("latin-1"))
    assert parse_object(buf) == expected


def test_short_binary_string():
    check("<ea68d4>", bytes([234, 104, 212]))


def test_string_with_escaped_line_break_literals():
    check("(/G18/G19/G20\\\n/G21/G22/G23\\\n/G24)", b"/G18/G19/G20/G21/G22/G23/G24")


def test_dictionary_with_indirect_references():
    check(
        "<<\n/Size 369\n/Info 339 0 R\n/Root 342 0 R\n/Prev 632196\n"
        "/ID[<7e19ea68d47cd58418bb9001776e808b><7e19ea68d47cd58418bb9001776e808b>]\n>>",
        {
            "Size": 369,
            "Info": {"object_number": 339, "generation_number": 0},
            "Root": {"object_number": 342, "generation_number": 0},
            "Prev": 632196,
            "ID": [
                bytes([126, 25, 234, 104, 212, 124, 213, 132, 24, 187, 144, 1, 119, 110, 128, 139]),
                bytes([126, 25, 234, 104, 212, 124, 213, 132, 24, 187, 144, 1, 119, 110, 128, 139]),
            ],
        },
    )


def test_simple_dictionary():
    check(
        "<<\n/Size 369\n/Info 339\n/Root 342\n/Prev 632196\n/ID (7e19 808b)\n>>",
        {"Size": 369, "Info": 339, "Root": 342, "Prev": 632196, "ID": b"7e19 808b"},
    )


def test_real_dictionary():
    check(
        "<< /Author (Kenneth Ward Church) /CreationDate (D:20020326140046-05'00') "
        "/ModDate (D:20020403103951-05'00') /Title (Char align: A Program for "
        "Aligning Parallel Texts at the Character Level) >>",
        {
            "Author": b"Kenneth Ward Church",
            "CreationDate": b"D:20020326140046-05'00'",
            "ModDate": b"D:20020403103951-05'00'",
            "Title": b"Char align: A Program for Aligning Parallel Texts at the Character Level",
        },
    )


def test_real_dictionary_2():
    check(
        "<< /Contents [ 17 0 R 18 0 R 19 0 R 20 0 R 21 0 R 22 0 R 23 0 R 24 0 R ] "
        "/CropBox [ 0 0 612 792 ] /MediaBox [ 0 0 612 792 ] /Parent 5 0 R "
        "/Resources << /Font << /F0 25 0 R /F1 26 0 R /F2 27 0 R >> /ProcSet 28 0 R "
        "/XObject << /Im1 29 0 R >> >> /Rotate 0 /Thumb 30 0 R /Type /Page >>",
        {
            "Contents": [
                {"object_number": n, "generation_number": 0}
                for n in (17, 18, 19, 20, 21, 22, 23, 24)
            ],
            "CropBox": [0, 0, 612, 792],
            "MediaBox": [0, 0, 612, 792],
            "Parent": {"object_number": 5, "generation_number": 0},
            "Resources": {
                "Font": {
                    "F0": {"object_number": 25, "generation_number": 0},
                    "F1": {"object_number": 26, "generation_number": 0},
                    "F2": {"object_number": 27, "generation_number": 0},
                },
                "ProcSet": {"object_number": 28, "generation_number": 0},
                "XObject": {"Im1": {"object_number": 29, "generation_number": 0}},
            },
            "Rotate": 0,
            "Thumb": {"object_number": 30, "generation_number": 0},
            "Type": "Page",
        },
    )


def test_nested_dictionary():
    check(
        "<<\n/Fields [ ]\n"
        "/DR << /Font << /ZaDb 316 0 R /Helv 317 0 R >> /Encoding << /PDFDocEncoding 318 0 R >> >>\n"
        "/DA (/Helv 0 Tf 0 g )\n>>",
        {
            "Fields": [],
            "DR": {
                "Font": {
                    "ZaDb": {"object_number": 316, "generation_number": 0},
                    "Helv": {"object_number": 317, "generation_number": 0},
                },
                "Encoding": {"PDFDocEncoding": {"object_number": 318, "generation_number": 0}},
            },
            "DA": b"/Helv 0 Tf 0 g ",
        },
    )


def test_array_of_names():
    check("[\n/PDF /Text /ImageB\n]", ["PDF", "Text", "ImageB"])


def test_array_of_references():
    check(
        "[\n4 0 R 6 0 R 8 0 R 10 0 R\n]",
        [{"object_number": n, "generation_number": 0} for n in (4, 6, 8, 10)],
    )


def test_indirect_object():
    check(
        "4 0 obj\n<< /Length 81 >>\nendobj",
        {"object_number": 4, "generation_number": 0, "value": {"Length": 81}},
    )


def test_list_of_booleans():
    check("[true false true true ]", [True, False, True, True])


def test_stream():
    check(
        "<< /Length 25 >>\nstream\nhello there\ni am a stream\nendstream",
        {"dictionary": {"Length": 25}, "buffer": b"hello there\ni am a stream"},
    )


def test_zero_length_stream():
    check(
        "<< /Type /XObject /BBox [ 0 0 10 10] /Length 0 >> stream\n\nendstream",
        {"dictionary": {"Type": "XObject", "BBox": [0, 0, 10, 10], "Length": 0}, "buffer": b""},
    )


# --- consumers.ts ---------------------------------------------------------

def consume(s: str) -> bytes:
    return consume_string(Buf(s.encode("latin-1")))


def test_consume_typical_string():
    assert consume("Hello world) >>\n2 0 obj") == b"Hello world"


def test_consume_nested_string():
    assert consume("Hello (world)!) >>") == b"Hello (world)!"


def test_consume_double_nested_string():
    assert consume("Hello (world (hi))!) >>") == b"Hello (world (hi))!"


def test_consume_unusual_characters():
    assert consume("Hello \\(world\\)!) >>") == b"Hello (world)!"


def test_consume_octal_escape():
    assert consume("a\\053b)") == b"a+b"


# --- xref.ts ---------------------------------------------------------------

def check_xref(input_str: str, expected):
    buf = Buf(input_str.encode("latin-1"))
    assert parse_xref(buf) == expected


def test_xref_short_with_trailing_newline():
    check_xref(
        "xref\n0 2\n0000000000 65535 f\r\n0000000015 00000 n\r\n",
        [
            {"object_number": 0, "offset": 0, "generation_number": 65535, "in_use": False},
            {"object_number": 1, "offset": 15, "generation_number": 0, "in_use": True},
        ],
    )


def test_xref_another_with_trailing_newline():
    check_xref(
        "xref\n100 3\n0000000197 00000 n\r\n0000000556 00000 n\r\n0001000023 00000 n\r\n",
        [
            {"object_number": 100, "offset": 197, "generation_number": 0, "in_use": True},
            {"object_number": 101, "offset": 556, "generation_number": 0, "in_use": True},
            {"object_number": 102, "offset": 1000023, "generation_number": 0, "in_use": True},
        ],
    )


def test_xref_spec_example_2():
    check_xref(
        "xref\n0 6\n"
        "0000000003 65535 f\r\n0000000017 00000 n\r\n0000000081 00000 n\r\n"
        "0000000000 00007 f\r\n0000000331 00000 n\r\n0000000409 00000 n\r\n",
        [
            {"offset": 3, "generation_number": 65535, "in_use": False, "object_number": 0},
            {"offset": 17, "generation_number": 0, "in_use": True, "object_number": 1},
            {"offset": 81, "generation_number": 0, "in_use": True, "object_number": 2},
            {"offset": 0, "generation_number": 7, "in_use": False, "object_number": 3},
            {"offset": 331, "generation_number": 0, "in_use": True, "object_number": 4},
            {"offset": 409, "generation_number": 0, "in_use": True, "object_number": 5},
        ],
    )


def test_xref_spec_example_3():
    check_xref(
        "xref\n0 1\n0000000000 65535 f\r\n"
        "3 1\n0000025325 00000 n\r\n"
        "23 2\n0000025518 00002 n\r\n0000025635 00000 n\r\n"
        "30 1\n0000025777 00000 n\r\n",
        [
            {"object_number": 0, "offset": 0, "generation_number": 65535, "in_use": False},
            {"object_number": 3, "offset": 25325, "generation_number": 0, "in_use": True},
            {"object_number": 23, "offset": 25518, "generation_number": 2, "in_use": True},
            {"object_number": 24, "offset": 25635, "generation_number": 0, "in_use": True},
            {"object_number": 30, "offset": 25777, "generation_number": 0, "in_use": True},
        ],
    )


def test_trailer_merge_oldest_wins_reference_quirk():
    """The reference pushes trailers newest-first and merges with
    Object.assign({}, ...objects) — later (older) sources override
    (/root/reference/models.ts:443-457, incl. its own contradictory
    comment). Behavior, not the comment, is what byte-identity needs."""
    from pdfi_spark.core.doc import PDFDocument

    doc = PDFDocument(b"")
    doc._trailer_objects = [
        {"Size": 10, "Info": "newest"},
        {"Size": 8, "Info": "oldest"},
    ]
    assert doc.trailer["Info"] == "oldest"
    assert doc.trailer["Size"] == 8


def test_page_mediabox_inherited_from_parent():
    """MediaBox walks the Parent chain when missing on the leaf
    (/root/reference/models.ts:140-149,183-189)."""
    from pdfi_spark.core.doc import Page

    grandparent = {"Type": "Pages", "MediaBox": [0, 0, 612, 792]}
    parent = {"Type": "Pages", "Parent": grandparent}
    page = Page(None, {"Type": "Page", "Parent": parent})
    assert page.media_box == [0, 0, 612, 792]

    own = Page(None, {"Type": "Page", "Parent": parent, "MediaBox": [0, 0, 100, 100]})
    assert own.media_box == [0, 0, 100, 100]


def test_octal_escape_parseint_prefix_semantics():
    # JS parseInt(s, 8) parses the longest valid octal PREFIX but the
    # full 3-digit escape is consumed (reference consumers.ts:26-41,66-70):
    # '128' -> 0o12, '779' -> 0o77, '899' -> NaN -> byte 0, '777' & 0xFF
    from pdfi_spark.core.lexing import Buf
    from pdfi_spark.core.objects import consume_string

    def s(body):
        return consume_string(Buf(body))

    assert s(b"\\128)") == b"\x0a"
    assert s(b"\\779)") == b"\x3f"
    assert s(b"\\899)") == b"\x00"
    assert s(b"\\777)") == b"\xff"
    assert s(b"a\\053b)") == b"a+b"
