"""Golden tests ported from /root/reference/test/cmap.ts (5 cases)."""
from pdfi_spark.core.cmap import parse_cmap


def check(input_str: str, expected):
    assert parse_cmap(input_str.encode("latin-1")) == expected


def test_simple_bytelength1_bfrange():
    check(
        """/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapType 2 def
/CMapName/R109 def
1 begincodespacerange
<00><ff>
endcodespacerange
4 beginbfrange
<00><00><2212>
<01><01><00b7>
<02><02><00d7>
<14><15><2264>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end end""",
        {
            "codeSpaceRanges": [{"low": 0, "high": 255}],
            "mappings": [
                {"src": 0, "dst": "−", "byteLength": 1},
                {"src": 1, "dst": "·", "byteLength": 1},
                {"src": 2, "dst": "×", "byteLength": 1},
                {"src": 20, "dst": "≤", "byteLength": 1},
                {"src": 21, "dst": "≥", "byteLength": 1},
            ],
            "byteLength": 1,
        },
    )


def test_simple_bytelength2_bfchar():
    check(
        """/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo
<< /Registry (Softland) /Ordering (Identity) /Supplement 0 >> def
/CMapName /Softland def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
4 beginbfchar
<010F> <0062>
<03EC> <0030>
<03ED> <0031>
<03EE> <0032>
endbfchar
endcmap
CMapName currentdict /CMap defineresource pop
end
end""",
        {
            "codeSpaceRanges": [{"low": 0, "high": 65535}],
            "mappings": [
                {"src": 271, "dst": "b", "byteLength": 2},
                {"src": 1004, "dst": "0", "byteLength": 2},
                {"src": 1005, "dst": "1", "byteLength": 2},
                {"src": 1006, "dst": "2", "byteLength": 2},
            ],
            "byteLength": 2,
        },
    )


def test_single_bfchar():
    check(
        """/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo
<< /Registry (Adobe)
/Ordering (UCS) /Supplement 0 >> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfchar
<0078> <2022>
endbfchar
endcmap CMapName currentdict /CMap defineresource pop end end""",
        {
            "codeSpaceRanges": [{"low": 0, "high": 65535}],
            "mappings": [{"src": 120, "dst": "•", "byteLength": 2}],
            "byteLength": 2,
        },
    )


def test_multiple_bfchars_and_bfrange():
    check(
        """/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo <<
/Registry (Adobe)
/Ordering (UCS)
/Supplement 0
>> def
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<00><FF>
endcodespacerange
1 beginbfchar
<2c><0009 000d 0020 00a0>
endbfchar
1 beginbfchar
<43><002d 00ad 2010>
endbfchar
6 beginbfrange
<21><21><0031>
<22><22><002e>
<23><23><0049>
<24><24><006e>
<25><25><0074>
<26><26><0072>
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end""",
        {
            "codeSpaceRanges": [{"low": 0, "high": 255}],
            "mappings": [
                {"src": 44, "dst": "\t\r \xa0", "byteLength": 1},
                {"src": 67, "dst": "-\xad‐", "byteLength": 1},
                {"src": 33, "dst": "1", "byteLength": 1},
                {"src": 34, "dst": ".", "byteLength": 1},
                {"src": 35, "dst": "I", "byteLength": 1},
                {"src": 36, "dst": "n", "byteLength": 1},
                {"src": 37, "dst": "t", "byteLength": 1},
                {"src": 38, "dst": "r", "byteLength": 1},
            ],
            "byteLength": 1,
        },
    )


def test_multiple_code_space_ranges():
    check(
        """%!PS-Adobe-3.0 Resource-CMap
%%DocumentNeededResources: ProcSet (CIDInit)
%%IncludeResource: ProcSet (CIDInit)
%%BeginResource: CMap (90ms-RKSJ-H)
%%Title: (90ms-RKSJ-H Adobe Japan1 2)
%%Version: 10.001
%%Copyright: Copyright 1990-2001 Adobe Systems Inc.
%%Copyright: All Rights Reserved.
%%EndComments
/CIDInit /ProcSet findresource begin 12 dict begin
begincmap
/CIDSystemInfo
3 dict dup begin /Registry (Adobe) def /Ordering (Japan1) def /Supplement 2 def
end def
/CMapName /90ms-RKSJ-H def /CMapVersion 10.001 def /CMapType 1 def
/UIDOffset 950 def
/XUID [1 10 25343] def /WMode 0 def
4 begincodespacerange
<00> <80>
<8140> <9FFC>
<A0> <DF>
<E040> <FCFC>
endcodespacerange
1 beginnotdefrange
<00> <1F> 231
endnotdefrange
100 begincidrange
<20> <7D> 231
<7E> <7E> 631
<8140> <817E> 633
<8180> <81AC> 696
<81B8> <81BF> 741
<81C8> <81CE> 749
<FB40> <FB7E> 8518
<FB80> <FBFC> 8581
<FC40> <FC4B> 8706
endcidrange
endcmap
CMapName currentdict /CMap defineresource pop end
end
%%EndResource
%%EOF""",
        {
            "codeSpaceRanges": [
                {"low": 0, "high": 128},
                {"low": 33088, "high": 40956},
                {"low": 160, "high": 223},
                {"low": 57408, "high": 64764},
            ],
            "mappings": [],
            "byteLength": 1,
        },
    )


def test_astral_tounicode_counts_utf16_code_units():
    """charSpacing advances per UTF-16 code unit (JS text.length), so an
    astral ToUnicode target counts 2 (reference graphics/stream.ts:884-886)."""
    from pdfi_spark.core.api import extract_spans
    from pdfi_spark.core.pdfgen import ORACLE_PER_BLOCK, build_pdf

    pdf, _ = build_pdf("ab", "astral_cmap", per_block=ORACLE_PER_BLOCK)
    spans = extract_spans(pdf)
    assert len(spans) == 1
    span = spans[0]
    assert span["text"] == "\U0001d41a\U0001d41b"
    # W=500/1000 * 10pt * 2 codes = 10pt, plus Tc 0.5 * 4 CODE UNITS = 2pt
    assert span["maxX"] - span["minX"] == 12.0


def test_astral_cmap_roundtrip_nfkc_folds_to_ascii():
    from pdfi_spark.core.api import read_pdf
    from pdfi_spark.core.pdfgen import ORACLE_PER_BLOCK, build_pdf

    pdf, expected = build_pdf("math bold words", "astral_cmap",
                              per_block=ORACLE_PER_BLOCK)
    assert expected == "# \nmath bold words"
    assert read_pdf(pdf, type="string") == expected


def test_astral_bfchar_decodes_pair_and_counts_two_units():
    """A bfchar (not just bfrange) whose target is a UTF-16BE surrogate
    PAIR must decode to ONE astral character — and charSpacing-sensitive
    sites must still count it as TWO code units (JS text.length), which
    is what util.utf16_length feeds showString (content.py)."""
    from pdfi_spark.core.util import utf16_length

    check(
        """/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0041> <D835DC00>
<0042> <D83DDE00>
endbfchar
endcmap end end""",
        {
            "codeSpaceRanges": [{"low": 0, "high": 65535}],
            "mappings": [
                {"src": 0x41, "dst": "\U0001d400", "byteLength": 2},
                {"src": 0x42, "dst": "\U0001f600", "byteLength": 2},
            ],
            "byteLength": 2,
        },
    )
    assert utf16_length("\U0001d400") == 2
    assert utf16_length("\U0001f600") == 2
    assert utf16_length("a\U0001f600b") == 4


def test_lone_surrogate_bfchar_survives():
    """A malformed bfchar target that is a LONE high surrogate must pass
    through unpaired (JS string semantics; _decode_utf16be surrogatepass)
    and count as one code unit."""
    from pdfi_spark.core.cmap import _decode_utf16be
    from pdfi_spark.core.util import utf16_length

    lone = _decode_utf16be(b"\xd8\x3d")
    assert lone == "\ud83d"
    assert utf16_length(lone) == 1
