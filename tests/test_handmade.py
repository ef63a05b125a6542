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


def test_multisubsection_xref_has_gap_objects_absent():
    pdf, _ = HANDMADE["multisubsection"]
    xrefs = read_pdf(pdf, type="xref")
    nums = {x["object_number"] for x in xrefs if x["in_use"]}
    assert nums == {1, 2, 3, 6, 7}
