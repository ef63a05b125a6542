"""Property-based containment guarantee: extract_record must NEVER raise,
for any byte payload — truncations, flips, splices of valid PDFs, or pure
garbage. This is the north-rule error-containment contract (malformed
rows become error values, tasks never fail) under adversarial input.
"""
from hypothesis import given, settings, strategies as st

from pdfi_spark.core.api import extract_record
from pdfi_spark.core.pdfgen import RECIPES, build_pdf

BASE_PDFS = [
    build_pdf("the quick brown fox jumps over the lazy dog", r)[0]
    for r in sorted(RECIPES)
]


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_garbage_bytes_contained(payload):
    record = extract_record("u", payload)
    assert set(record) == {"url", "text", "n_pages", "n_chars", "error"}
    assert (record["error"] is None) == (record["text"] is not None)


@given(
    st.integers(min_value=0, max_value=len(BASE_PDFS) - 1),
    st.integers(min_value=0, max_value=4095),
)
@settings(max_examples=200, deadline=None)
def test_truncated_pdfs_contained(which, cut):
    pdf = BASE_PDFS[which]
    record = extract_record("u", pdf[: cut % (len(pdf) + 1)])
    assert set(record) == {"url", "text", "n_pages", "n_chars", "error"}


@given(
    st.integers(min_value=0, max_value=len(BASE_PDFS) - 1),
    st.integers(min_value=0, max_value=4095),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=300, deadline=None)
def test_byteflipped_pdfs_contained(which, pos, value):
    pdf = bytearray(BASE_PDFS[which])
    pdf[pos % len(pdf)] = value
    record = extract_record("u", bytes(pdf))
    assert set(record) == {"url", "text", "n_pages", "n_chars", "error"}


@given(
    st.integers(min_value=0, max_value=len(BASE_PDFS) - 1),
    st.integers(min_value=0, max_value=len(BASE_PDFS) - 1),
    st.integers(min_value=0, max_value=4095),
)
@settings(max_examples=100, deadline=None)
def test_spliced_pdfs_contained(a, b, split):
    pa, pb = BASE_PDFS[a], BASE_PDFS[b]
    spliced = pa[: split % len(pa)] + pb[split % len(pb):]
    record = extract_record("u", spliced)
    assert set(record) == {"url", "text", "n_pages", "n_chars", "error"}
