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


# positive property: for ANY well-formed text, generation -> extraction
# is the identity on representative recipes (the containment tests above
# cover the negative side)
_ROUNDTRIP_RECIPES = ["simple", "flate", "tj_kerning", "differences",
                      "core14_nowidths", "zapf_dingbats"]


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=9),
        min_size=1, max_size=40,
    ),
    st.integers(min_value=0, max_value=len(_ROUNDTRIP_RECIPES) - 1),
)
@settings(max_examples=120, deadline=None)
def test_random_texts_roundtrip_exactly(words, which):
    from pdfi_spark.core.api import read_pdf
    from pdfi_spark.core.pdfgen import ORACLE_PER_BLOCK

    text = " ".join(words)
    pdf, expected = build_pdf(
        text, _ROUNDTRIP_RECIPES[which], per_block=ORACLE_PER_BLOCK
    )
    assert read_pdf(pdf, type="string") == expected


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=9),
        min_size=6, max_size=40,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=120, deadline=None)
def test_random_texts_html_roundtrip(words, which):
    from pdfi_spark.core.html import extract_main_text
    from pdfi_spark.core.htmlgen import HTML_RECIPES, ORACLE_PER_BLOCK, build_html

    text = " ".join(words)
    recipe = sorted(HTML_RECIPES)[which]
    page, expected = build_html(text, recipe, per_block=ORACLE_PER_BLOCK)
    assert extract_main_text(page) == expected


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_parse_links_contained_on_garbage(payload):
    from pdfi_spark.core.html import parse_links

    # anchor collection never raises and every link has a non-None href
    for link in parse_links(payload):
        assert link["href"] is not None
        assert link["text"] == link["text"].strip()


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=9),
        min_size=6, max_size=40,
    ),
    st.integers(min_value=0, max_value=499),
)
@settings(max_examples=80, deadline=None)
def test_random_texts_planted_links_recovered(words, doc_id):
    from pdfi_spark.core.html import parse_links
    from pdfi_spark.core.htmlgen import ORACLE_PER_BLOCK, build_linked_page

    page, targets = build_linked_page(
        doc_id, 500, " ".join(words), per_block=ORACLE_PER_BLOCK
    )
    cites = [l for l in parse_links(page) if l["href"].startswith("/doc/")]
    assert [int(l["href"][5:]) for l in cites] == targets


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=400), st.binary(max_size=200))
def test_warc_resync_recovers_good_records_after_garbage(garbage, payload):
    """A well-formed record must survive arbitrary leading garbage —
    either the scan stops cleanly (no magic in the garbage) or it
    resyncs and still yields the good record; it must NEVER raise and
    NEVER yield a malformed record."""
    from pdfi_spark.core.warc import build_record, parse_records

    good = build_record("response", {"WARC-Target-URI": "u"}, payload)
    recs = parse_records(garbage + b"\r\n" + good)
    for r in recs:
        assert r["type"] in ("response", "") or isinstance(r["type"], str)
        assert isinstance(r["payload"], bytes)
    # the good record is recovered whenever the garbage contains no
    # spurious record magic to derail framing before it
    if b"WARC/1.0" not in garbage:
        assert any(
            r["payload"] == payload and r["type"] == "response"
            for r in recs
        ), recs
