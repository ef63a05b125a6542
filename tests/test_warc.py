"""WARC/1.0 container (core/warc.py + the read_warc_pages connector)."""
from hypothesis import given, settings, strategies as st

from pdfi_spark.core.warc import (
    build_capture,
    build_capture_records,
    build_record,
    gunzip_members,
    gzip_member,
    parse_records,
    responses,
    split_http_payload,
)

PAGE = b"<html><body><p>real content words live here today</p></body></html>"


def test_record_roundtrip():
    raw = build_record("response", {"WARC-Target-URI": "https://x/1"}, b"abc")
    recs = parse_records(raw)
    assert len(recs) == 1
    assert recs[0]["type"] == "response"
    assert recs[0]["payload"] == b"abc"
    assert recs[0]["headers"]["WARC-Target-URI"] == "https://x/1"


def test_capture_triple_and_response_selection():
    raw = build_capture("https://x/2", "2026-01-01T00:00:00Z", PAGE, "feed")
    recs = parse_records(raw)
    assert [r["type"] for r in recs] == ["request", "response", "metadata"]
    caps = responses(raw)
    assert len(caps) == 1
    assert caps[0]["url"] == "https://x/2"
    assert caps[0]["page"] == PAGE  # HTTP head stripped exactly


def test_content_length_framing_not_delimiter_scanning():
    # a payload that CONTAINS record magic + fake headers must not
    # desync the scan: Content-Length framing skips it byte-exactly
    evil = b"WARC/1.0\r\nContent-Length: 999999\r\n\r\nnot a record"
    raw = (build_record("response", {"WARC-Target-URI": "u"},
                        b"head\r\n\r\n" + evil)
           + build_record("metadata", {}, b"after"))
    recs = parse_records(raw)
    assert [r["type"] for r in recs] == ["response", "metadata"]
    assert recs[0]["payload"].endswith(evil)


def test_truncation_and_garbage_contained():
    raw = build_capture("https://x/3", "2026-01-01T00:00:00Z", PAGE, "00")
    # cut inside the metadata record: first two records still recovered
    cut = raw[: len(raw) - 10]
    assert [r["type"] for r in parse_records(cut)] == ["request", "response"]
    assert parse_records(b"") == []
    assert parse_records(b"HTTP/1.1 200 OK\r\n\r\n") == []
    # missing Content-Length on the only record: scan ends cleanly
    assert parse_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n") == []


def test_header_names_case_insensitive():
    # ISO 28500 §4: field names are case-insensitive. A writer that emits
    # lowercase/odd casing must still parse and frame correctly.
    raw = (b"WARC/1.0\r\nwarc-type: response\r\n"
           b"WARC-TARGET-URI: https://x/ci\r\n"
           b"content-length: 3\r\n\r\nabc\r\n\r\n")
    recs = parse_records(raw)
    assert len(recs) == 1
    assert recs[0]["type"] == "response"
    assert recs[0]["payload"] == b"abc"
    # canonical-case lookups hit the odd-cased fields
    assert recs[0]["headers"]["Content-Length"] == "3"
    assert recs[0]["headers"].get("WARC-Target-URI") == "https://x/ci"
    assert "Warc-Type" in recs[0]["headers"]
    assert recs[0]["headers"].get("No-Such-Field") is None
    # on-the-wire casing is preserved for iteration/display
    assert "warc-type" in list(recs[0]["headers"].keys())
    # responses() goes through the same case-insensitive path
    caps = responses(raw + build_record("metadata", {}, b"m"))
    assert [c["url"] for c in caps] == ["https://x/ci"]


def test_header_writes_case_insensitive_last_writer_wins():
    # duplicate header lines differing only in case must collapse onto
    # ONE entry (first-seen casing kept, last value wins) — otherwise
    # lookups would return whichever casing happened to parse first
    raw = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"X-Field: first\r\nx-field: second\r\n"
           b"Content-Length: 1\r\n\r\na\r\n\r\n")
    hdrs = parse_records(raw)[0]["headers"]
    assert hdrs["X-Field"] == "second"
    assert hdrs["x-FIELD"] == "second"
    assert list(hdrs.keys()).count("X-Field") == 1
    assert "x-field" not in list(hdrs.keys())


def test_header_update_and_setdefault_case_insensitive():
    from pdfi_spark.core.warc import Headers

    h = Headers()
    h["Content-Length"] = "1"
    h.update({"content-LENGTH": "2", "X-New": "a"})
    assert h["content-length"] == "2"
    assert list(h.keys()) == ["Content-Length", "X-New"]
    assert h.setdefault("x-new", "b") == "a"      # existing wins
    assert h.setdefault("X-Other", "c") == "c"    # inserted as given
    assert h["x-other"] == "c"


def test_bad_content_length_skips_one_record_not_the_rest():
    # one unframeable record (missing/garbage Content-Length) must not
    # swallow the records after it: the scan resyncs on the next magic
    bad = b"WARC/1.0\r\nWARC-Type: broken\r\nContent-Length: oops\r\n\r\n"
    good = build_record("response", {"WARC-Target-URI": "u2"}, b"ok")
    recs = parse_records(bad + good)
    assert [r["type"] for r in recs] == ["response"]
    assert recs[0]["payload"] == b"ok"
    no_len = b"WARC/1.0\r\nWARC-Type: broken\r\n\r\n"
    assert [r["type"] for r in parse_records(no_len + good)] == ["response"]


def test_gzip_member_per_record_layout():
    recs = build_capture_records("https://x/4", "2026-01-01T00:00:00Z",
                                 PAGE, "01")
    blob = b"".join(gzip_member(r) for r in recs)
    assert gunzip_members(blob) == b"".join(recs)
    # deterministic (mtime pinned) so oracle runs are reproducible
    assert blob == b"".join(gzip_member(r) for r in recs)
    # truncated final member: earlier members still decompress
    partial = gunzip_members(blob[: len(blob) - 8])
    assert partial.startswith(recs[0])
    assert gunzip_members(b"\x1f\x8bgarbage") == b""


def test_split_http_payload_without_head():
    assert split_http_payload(b"no head here") == b"no head here"


def test_read_warc_pages_connector(spark):
    from pdfi_spark.ops.webtext import read_warc_pages

    good = b"".join(
        gzip_member(r)
        for r in build_capture_records("https://x/5", "2026-01-01T00:00:00Z",
                                       PAGE, "02")
    )
    df = spark.createDataFrame(
        [("s3://seg/a.warc.gz", good),
         ("s3://seg/bad.warc.gz", b"\x1f\x8bnot gzip"),
         ("s3://seg/plain.warc", build_capture(
             "https://x/6", "2026-01-02T00:00:00Z", PAGE, "03"))],
        "path string, content binary",
    )
    rows = {r["url"]: r for r in read_warc_pages(df).collect()}
    assert set(rows) == {"https://x/5", "https://x/6"}
    assert bytes(rows["https://x/5"]["page"]) == PAGE
    assert rows["https://x/6"]["path"] == "s3://seg/plain.warc"
    assert rows["https://x/6"]["warc_date"] == "2026-01-02T00:00:00Z"


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_parse_never_raises_on_garbage(data):
    for rec in parse_records(data):
        assert isinstance(rec["payload"], bytes)
    gunzip_members(data)


@given(st.binary(max_size=512), st.integers(min_value=0, max_value=400))
@settings(max_examples=100, deadline=None)
def test_any_payload_roundtrips_and_any_cut_is_contained(payload, cut):
    raw = build_record("response", {"WARC-Target-URI": "u"}, payload)
    recs = parse_records(raw)
    assert len(recs) == 1 and recs[0]["payload"] == payload
    parse_records(raw[:cut])  # never raises


@given(st.lists(st.binary(max_size=300), min_size=0, max_size=8))
@settings(max_examples=60, deadline=None)
def test_multi_record_gzip_roundtrip(payloads):
    recs = [
        build_record("response", {"WARC-Target-URI": f"u{i}"}, p)
        for i, p in enumerate(payloads)
    ]
    blob = b"".join(gzip_member(r) for r in recs)
    parsed = parse_records(gunzip_members(blob))
    assert [r["payload"] for r in parsed] == payloads
    assert [r["headers"]["WARC-Target-URI"] for r in parsed] == [
        f"u{i}" for i in range(len(payloads))
    ]
