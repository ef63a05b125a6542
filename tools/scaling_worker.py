"""Interleaved-trial worker for the scaling bench.

Holds a local[N] SparkSession open and runs one timed extraction job per
"go" line on stdin, printing "done <sec>" — so the parent can alternate
trials across parallelism levels and host noise hits every level
equally. Exits on "quit" or EOF.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfi_spark.pipeline import extract_text, make_spark  # noqa: E402


def main() -> int:
    corpus, cpus = sys.argv[1], int(sys.argv[2])
    # 'shuffle' = cold input + salted repartition (skew defusal at read);
    # 'direct'  = pre-bucketed input (production: the Iceberg table is
    # bucket-written by xxhash64(url) at ingest, so no runtime shuffle)
    job = sys.argv[3] if len(sys.argv) > 3 else "shuffle"
    # salt granularity (slots multiplier) comes from the caller so the
    # ledger can tag every trial with the exact job config it ran —
    # best-of is only ever taken WITHIN one config (ADVICE r3: a best-of
    # spanning 4x and 8x trials would compare heterogeneous jobs)
    salt_slots = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    n_partitions = cpus * salt_slots if job == "shuffle" else None
    spark = make_spark(f"scale-{cpus}", master=f"local[{cpus}]",
                       shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    documents = spark.read.parquet(corpus)
    n_docs = documents.count()
    print(f"ready {n_docs}", flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "quit" or not cmd:
            break
        t0 = time.time()
        extract_text(documents, payload_col="html", n_partitions=n_partitions) \
            .select("url", "n_chars", "error") \
            .write.mode("overwrite").format("noop").save()
        print(f"done {time.time() - t0:.3f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
