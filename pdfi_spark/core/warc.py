"""WARC/1.0 container support — the Common-Crawl archive format the
production pipeline reads pages from (ISO 28500). Spark-free like the
rest of core/; built from the public spec, no reference counterpart
(chbrown/pdfi has no container format; this is north-rule plumbing).

Format essentials implemented here:

- A record is ``WARC/1.0\\r\\n`` + header lines (``Name: value\\r\\n``) +
  ``\\r\\n`` + exactly Content-Length payload bytes + ``\\r\\n\\r\\n``.
- Records concatenate into a .warc file; Common Crawl ships .warc.gz
  where each record is its OWN gzip member (so a byte-range fetch can
  decompress one record without the rest of the file) — mirrored here
  by compressing per record and concatenating the members.
- A crawl capture is a request/response/metadata record triple sharing
  a WARC-Date; the page bytes live in the ``response`` record's payload
  after the HTTP response head (split at the first ``\\r\\n\\r\\n``).

Parsing is containment-first and resync-capable: a truncated payload
ends the scan without raising (records recovered so far are returned);
leading garbage or a record with a missing/unparsable Content-Length is
skipped by resyncing to the next record magic (a real archive's later
records must survive junk and one bad record); header-field names match
case-insensitively per ISO 28500 §4 (real-world writers emit
``content-length``/``WARC-TARGET-URI`` etc.). For well-formed records,
Content-Length framing (never delimiter scanning) makes payloads that
themselves contain ``WARC/1.0`` safe — resync scanning only runs once
framing is already lost.
"""
from __future__ import annotations

import gzip
import io
import zlib

_CRLF = b"\r\n"
_MAGIC = b"WARC/1.0"


class Headers(dict):
    """WARC named fields with ISO 28500 §4 case-insensitive lookup.

    Keys keep their on-the-wire casing (callers that iterate or display
    see the archive's bytes); ``[]`` / ``get`` / ``in`` match any casing,
    so ``headers["Content-Length"]`` finds ``content-length``. Writes
    are case-insensitive too: assigning ``content-length`` when
    ``Content-Length`` exists REPLACES the value under the first-seen
    casing (one canonical entry per field, last writer wins — duplicate
    header lines differing only in case can't fork into two entries).
    Records carry ~6 fields, so the linear scan is cheaper than keeping
    a parallel lowercased index in every record dict.

    Known limitation: ``__delitem__``/``pop`` remain case-SENSITIVE
    (plain dict semantics) — no caller deletes header fields; route any
    future deletion through ``_key`` first.
    """

    def _key(self, name: str) -> str | None:
        if dict.__contains__(self, name):  # fast path: canonical casing
            return name
        low = name.lower()
        for k in self:
            if k.lower() == low:
                return k
        return None

    def __getitem__(self, name: str):
        k = self._key(name)
        if k is None:
            raise KeyError(name)
        return dict.__getitem__(self, k)

    def get(self, name: str, default=None):
        k = self._key(name)
        return default if k is None else dict.__getitem__(self, k)

    def __contains__(self, name) -> bool:
        return self._key(name) is not None

    def __setitem__(self, name: str, value) -> None:
        k = self._key(name)
        dict.__setitem__(self, name if k is None else k, value)

    def update(self, *args, **kwargs) -> None:
        # dict.update bypasses __setitem__; route it through the
        # case-insensitive write path
        for k, v in dict(*args, **kwargs).items():
            self[k] = v

    def setdefault(self, name: str, default=None):
        k = self._key(name)
        if k is not None:
            return dict.__getitem__(self, k)
        dict.__setitem__(self, name, default)
        return default


def build_record(warc_type: str, headers: dict[str, str],
                 payload: bytes) -> bytes:
    lines = [_MAGIC, f"WARC-Type: {warc_type}".encode()]
    lines += [f"{k}: {v}".encode() for k, v in headers.items()]
    lines.append(f"Content-Length: {len(payload)}".encode())
    return _CRLF.join(lines) + _CRLF * 2 + payload + _CRLF * 2


def build_capture_records(url: str, date: str, page: bytes,
                          record_id: str) -> list[bytes]:
    """Request/response/metadata triple for one page capture, matching
    the Common-Crawl layout, as separate record byte runs (so callers
    can gzip member-per-record). The page rides behind a minimal
    HTTP/1.1 response head inside the response record."""
    http_head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(page)}".encode() + _CRLF * 2
    )
    common = {"WARC-Target-URI": url, "WARC-Date": date,
              "WARC-Record-ID": f"<urn:uuid:{record_id}>"}
    return [
        build_record("request", common,
                     f"GET {url} HTTP/1.1\r\nHost: x\r\n\r\n".encode()),
        build_record("response",
                     {**common, "Content-Type":
                      "application/http; msgtype=response"},
                     http_head + page),
        build_record("metadata", common, b"fetchTimeMs: 7\r\n"),
    ]


def build_capture(url: str, date: str, page: bytes,
                  record_id: str) -> bytes:
    return b"".join(build_capture_records(url, date, page, record_id))


def parse_records(data: bytes) -> list[dict]:
    """Concatenated WARC records -> [{type, headers, payload}]."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(_MAGIC, pos):
            # not at a record boundary (leading junk, or we lost framing):
            # resync to the next magic — a real archive's records must
            # survive preceding garbage
            nxt = data.find(_MAGIC, pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        head_end = data.find(_CRLF * 2, pos)
        if head_end < 0:
            break
        headers = Headers()
        for line in data[pos + len(_MAGIC):head_end].split(_CRLF):
            name, sep, value = line.partition(b":")
            if sep:
                headers[name.strip().decode("ascii", "replace")] = (
                    value.strip().decode("ascii", "replace"))
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            # unframeable record: skip it by resyncing to the next magic
            # (an early break here would silently drop every record after
            # one bad one — fatal for a real multi-capture archive)
            nxt = data.find(_CRLF + _MAGIC, head_end)
            if nxt < 0:
                break
            pos = nxt + 2
            continue
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated payload: keep what we have
        out.append({
            "type": headers.get("WARC-Type", ""),
            "headers": headers,
            "payload": data[body_start:body_start + length],
        })
        pos = body_start + length
    return out


def split_http_payload(payload: bytes) -> bytes:
    """Response-record payload -> page bytes (drop the HTTP head)."""
    sep = payload.find(_CRLF * 2)
    return payload[sep + 4:] if sep >= 0 else payload


def responses(data: bytes) -> list[dict]:
    """Response captures only: [{url, date, page}]."""
    return [
        {
            "url": r["headers"].get("WARC-Target-URI", ""),
            "date": r["headers"].get("WARC-Date", ""),
            "page": split_http_payload(r["payload"]),
        }
        for r in parse_records(data)
        if r["type"] == "response"
    ]


def gzip_member(record: bytes) -> bytes:
    """One record -> one gzip member (mtime pinned for determinism)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(record)
    return buf.getvalue()


def gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes (the
    member-per-record layout decompresses member by member; malformed
    tail data is dropped, never raised)."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
        except zlib.error:
            break
        if not d.eof:
            break  # truncated final member: keep what decompressed
        data = d.unused_data
    return b"".join(out)
