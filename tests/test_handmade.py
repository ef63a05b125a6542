"""Hand-assembled whole-PDF fixtures (not pdfgen output) extract correctly."""
import pytest

from pdfi_spark.core.api import read_pdf

from fixtures_handmade import HANDMADE


@pytest.mark.parametrize("name", sorted(HANDMADE))
def test_handmade_fixture_extracts(name):
    pdf, expected = HANDMADE[name]
    assert read_pdf(pdf, type="string") == expected


def test_incremental_update_metadata_follows_prev_chain():
    pdf, _ = HANDMADE["incremental"]
    # two trailers merged newer-wins; Size stays 6
    assert read_pdf(pdf, type="metadata")["Size"] == 6
    xrefs = read_pdf(pdf, type="xref")
    # update xref (free head + new obj 4) accumulates before the base
    # table's 6 entries
    assert len(xrefs) == 8
    # the updated object 4 row appears first and points past the base file
    updated = [x for x in xrefs if x["object_number"] == 4 and x["in_use"]]
    assert updated[0]["offset"] > 1000


def test_linearized_follows_last_startxref_then_prev_chain():
    pdf, _ = HANDMADE["linearized"]
    # the mid-file dummy "startxref 0" must NOT be the entry point:
    # lastIndexOf finds the EOF marker, which leads front-xref -> /Prev
    assert pdf.count(b"startxref") == 2
    assert b"startxref\n0\n%%EOF" in pdf
    meta = read_pdf(pdf, type="metadata")
    assert meta["Size"] == 11
    xrefs = read_pdf(pdf, type="xref")
    in_use = {x["object_number"] for x in xrefs if x["in_use"]}
    # front table contributes 7,8,10; main table 1,2,3; 9 is a gap
    assert in_use == {1, 2, 3, 7, 8, 10}


def test_hybrid_xrefstm_hint_is_ignored_like_reference():
    pdf, expected = HANDMADE["hybrid_xrefstm"]
    # both content objects are physically present...
    assert b"(hybrid stream honored)" in pdf
    assert b"(classic table wins)" in pdf
    # ...but only the classic table's object 4 surfaces: the reference
    # follows /Prev only (PDF.ts:31-50) and so do we
    text = read_pdf(pdf, type="string")
    assert text == expected
    assert "hybrid stream honored" not in text
    # the classic table's object-4 offset (the later copy) is live
    xrefs = read_pdf(pdf, type="xref")
    row4 = [x for x in xrefs if x["object_number"] == 4 and x["in_use"]][0]
    assert pdf[row4["offset"]:row4["offset"] + 7] == b"4 0 obj"
    assert b"(classic table wins)" in pdf[row4["offset"]:row4["offset"] + 200]


def test_incremental_xref_stream_chain():
    pdf, expected = HANDMADE["inc_xrefstream"]
    assert read_pdf(pdf, type="string") == expected
    # newer OBJECT wins; merged TRAILER is oldest-wins (reference
    # models.ts:454-457 parity): base Size 7 overrides update Size 8
    meta = read_pdf(pdf, type="metadata")
    assert meta["Size"] == 7
    xrefs = read_pdf(pdf, type="xref")
    # update's sparse /Index [4 1 7 1] contributes exactly rows 4 and 7
    # ahead of the base stream's full 0-6 coverage
    nums = [x["object_number"] for x in xrefs]
    assert nums[:2] == [4, 7]
    live4 = [x for x in xrefs if x["object_number"] == 4][0]
    assert b"(xref stream chain wins)" in pdf[live4["offset"]:live4["offset"] + 200]


def test_multisubsection_xref_has_gap_objects_absent():
    pdf, _ = HANDMADE["multisubsection"]
    xrefs = read_pdf(pdf, type="xref")
    nums = {x["object_number"] for x in xrefs if x["in_use"]}
    assert nums == {1, 2, 3, 6, 7}
