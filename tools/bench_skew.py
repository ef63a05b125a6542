"""Skew-defusal evidence: WHY the salted repartition exists.

Builds a skewed corpus (0.5% of documents are ~700 KB / ~100 ms jumbo
multi-page PDFs — the scanned-monograph tail of a real crawl) written
with an ADVERSARIAL file layout: all jumbo documents clustered into the
last few files. Then times extraction at local[32] two ways:

- direct: read the files as-is (the pre-bucketed fast path) -> the few
  tasks owning the big-doc files straggle while 30 cores idle;
- salted: repartition(4x slots, pmod(xxhash64(url), n)) first -> big
  documents scatter uniformly, stragglers disappear.

Prints one JSON line with both times; on uniform corpora the direct
path wins (no shuffle), on skewed layouts the salt wins — which is
exactly the policy the pipeline documents (salt at ingest OR when the
input layout is untrusted).
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from pdfi_spark.pipeline import extract_text, make_spark  # noqa: E402


def main() -> int:
    corpus = os.path.join(REPO, ".bench", "corpus_skew_adversarial_v2")
    spark = make_spark("skew-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")

    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        import datetime

        import pandas as pd

        from pdfi_spark.core.pdfgen import build_pdf
        from pdfi_spark.datagen import DOCUMENTS_SCHEMA, MIXED_RECIPES, url_for

        base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet") \
            .select("doc_id", "text", "lang")
        base = base.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(3)))
        ).withColumn("doc_id", F.col("doc_id") * 4 + F.col("rep")).drop("rep")

        def generate(iterator):
            epoch = datetime.datetime(2020, 1, 1)
            for batch in iterator:
                rows = []
                for doc_id, text, lang in zip(batch["doc_id"], batch["text"], batch["lang"]):
                    doc_id = int(doc_id)
                    if doc_id % 200 == 0:
                        # 0.5% jumbo documents, ~300x text: the scanned-
                        # monograph tail of a real crawl
                        big = " ".join([text] * 300)
                        pdf, expected = build_pdf(big, "multipage", per_block=40)
                    else:
                        r = MIXED_RECIPES[doc_id % len(MIXED_RECIPES)]
                        pdf, expected = build_pdf(text, r)
                    rows.append({
                        "url": url_for(doc_id),
                        "warc_ts": epoch + datetime.timedelta(seconds=doc_id),
                        "html": pdf, "text": expected, "lang": lang,
                    })
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

        docs = base.mapInPandas(generate, schema=DOCUMENTS_SCHEMA)
        # adversarial placement: every jumbo document lands in the last files
        docs.withColumn("big", (F.length("html") > 100000).cast("int")) \
            .repartitionByRange(64, "big", "url") \
            .write.mode("overwrite").parquet(corpus)

    documents = spark.read.parquet(corpus).drop("big")
    n_docs = documents.count()
    n_big = documents.filter(F.length("html") > 100000).count()

    def run(n_partitions):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            extract_text(documents, payload_col="html", n_partitions=n_partitions) \
                .select("url", "n_chars", "error") \
                .write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    run(None)  # warm-up (discarded)
    direct = run(None)
    salted = run(128)
    print(json.dumps({
        "n_docs": n_docs,
        "n_big_docs": n_big,
        "direct_sec": direct,
        "salted_sec": salted,
        "speedup_from_salting": round(direct / salted, 2),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
