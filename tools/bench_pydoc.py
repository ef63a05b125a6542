#!/usr/bin/env python
"""Per-document Python-side microbenchmarks (guide §1: measure first,
§4.2: per-task work). Times the pure-Python per-doc work that runs
inside each mapInPandas hot path — OUTSIDE Spark, so the numbers are
the per-core compute floor of each UDF stage, uncontaminated by
scheduling/shuffle overhead. Run: python tools/bench_pydoc.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, fn, n_docs, repeat=3):
    best = None
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{label:36s} {best:7.3f}s  {1e6 * best / n_docs:8.1f} us/doc")
    return best


def main():
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = tbl["doc_id"].to_pylist()
    texts = tbl["text"].to_pylist()
    n = len(texts)
    print(f"{n} docs from {SF_DIR}")

    from pdfi_spark.core.htmlgen import (ORACLE_PER_BLOCK, build_html,
                                         build_linked_page)
    from pdfi_spark.core.html import extract_main_text, parse_links, block_stats

    pages_linked = None
    pages_boiler = None

    def gen_linked():
        nonlocal pages_linked
        pages_linked = [
            build_linked_page(int(d), n, t, per_block=ORACLE_PER_BLOCK)[0]
            for d, t in zip(doc_ids, texts)
        ]

    def gen_boiler():
        nonlocal pages_boiler
        pages_boiler = [
            build_html(t, "boiler", per_block=ORACLE_PER_BLOCK)[0]
            for t in texts
        ]

    timed("build_linked_page", gen_linked, n)
    timed("parse_links", lambda: [parse_links(p) for p in pages_linked], n)
    timed("build_html(boiler)", gen_boiler, n)
    timed("extract_main_text", lambda: [extract_main_text(p) for p in pages_boiler], n)
    timed("block_stats", lambda: [block_stats(p) for p in pages_boiler], n)

    # warc roundtrip (the warc_extract per-doc body)
    from pdfi_spark.core.warc import (build_capture_records, gunzip_members,
                                      gzip_member, parse_records,
                                      split_http_payload)

    def warc_roundtrip():
        for d, page in zip(doc_ids, pages_boiler):
            url = f"https://example.org/page/{int(d)}"
            blob = b"".join(
                gzip_member(rec)
                for rec in build_capture_records(
                    url, "2026-01-01T00:00:00Z", page, record_id=f"{int(d):08x}"
                )
            )
            recs = parse_records(gunzip_members(blob))
            caps = [r for r in recs if r["type"] == "response"]
            if caps:
                extract_main_text(split_http_payload(caps[0]["payload"]))

    timed("warc roundtrip (gzip+parse+strip)", warc_roundtrip, n)

    def warc_gzip_only():
        for d, page in zip(doc_ids, pages_boiler):
            url = f"https://example.org/page/{int(d)}"
            for rec in build_capture_records(
                url, "2026-01-01T00:00:00Z", page, record_id=f"{int(d):08x}"
            ):
                gzip_member(rec)

    timed("warc gzip_member only", warc_gzip_only, n)

    # minhash128 artifacts fold (one big batch, the mapInPandas body):
    # r5 body (one md5 + 128-lane expansion per PER-DOC-distinct word)
    # vs r6 body (once per BATCH-distinct word, then gather)
    import pandas as pd
    import numpy as np
    from pdfi_spark.ops import dedup as dd

    batch = pd.DataFrame({"doc_id": doc_ids, "text": texts})
    params = dd._minhash128_params()
    import hashlib
    A = np.asarray([p[0] for p in params], dtype=np.int64)
    B = np.asarray([p[1] for p in params], dtype=np.int64)
    IDX = np.asarray([p[2] for p in params], dtype=np.int64)
    P = np.int64(dd.MINHASH128_P)
    md5 = hashlib.md5

    def fold_r5():
        raw_per_doc = [str(t).split(" ") for t in batch["text"]]
        words_per_doc = [list(dict.fromkeys(ws)) for ws in raw_per_doc]
        counts = np.asarray([len(w) for w in words_per_doc])
        digests = b"".join(
            md5(w.encode("utf-8")).digest()
            for ws in words_per_doc for w in ws
        )
        lanes = np.frombuffer(digests, dtype=">u4").reshape(-1, 4)
        vals = (lanes.astype(np.int64)[:, IDX] * A + B) % P
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        return np.minimum.reduceat(vals, starts, axis=0)

    def fold_r6():
        raw_per_doc = [str(t).split(" ") for t in batch["text"]]
        words_per_doc = [list(dict.fromkeys(ws)) for ws in raw_per_doc]
        counts = np.asarray([len(w) for w in words_per_doc])
        vocab, setdefault = {}, None
        setdefault = vocab.setdefault
        widx = [setdefault(w, len(vocab))
                for ws in words_per_doc for w in ws]
        digests = b"".join(md5(w.encode("utf-8")).digest() for w in vocab)
        lanes = np.frombuffer(digests, dtype=">u4").reshape(-1, 4)
        vals_u = (lanes.astype(np.int64)[:, IDX] * A + B) % P
        vals = vals_u[np.asarray(widx, dtype=np.int64)]
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        return np.minimum.reduceat(vals, starts, axis=0)

    timed("minhash128 fold (r5 body)", fold_r5, n)
    timed("minhash128 fold (r6 vocab-dedup)", fold_r6, n)
    assert (fold_r5() == fold_r6()).all()

    # word stats
    raw = [t.split(" ") for t in texts]
    uniq = [list(dict.fromkeys(ws)) for ws in raw]
    total_words = sum(len(w) for w in raw)
    total_uniq = sum(len(w) for w in uniq)
    vocab = set()
    for ws in uniq:
        vocab.update(ws)
    print(f"words total={total_words} uniq/doc sum={total_uniq} "
          f"corpus vocab={len(vocab)}")


if __name__ == "__main__":
    main()
