"""The distributed extraction pipeline.

Scan -> salted repartition -> Arrow-batched ``mapInPandas`` extraction ->
output + per-bucket lineage metrics -> checkpoint/resume.

Design for 10^12 documents (SURVEY.md §4.2):

- **Salted repartition**: work is hashed into ``n_buckets`` stable buckets
  by ``pmod(xxhash64(url), n_buckets)``. The salt is a pure function of
  the url, so task retries and resumed runs land rows in the same bucket.
  Per-document work is indivisible (a PDF cannot be split), so skew
  handling is placement: AQE rebalances bucket batches, and Arrow batch
  size is kept small because rows carry multi-MB binaries.
  At 100 TB the repartition shuffle is paid ONCE at ingest, not per run:
  the production Iceberg table is bucket-written by the same
  ``xxhash64(url)``, so steady-state extraction reads pre-placed
  partitions with no runtime shuffle (measured ~45% faster at full
  parallelism; see BASELINE.md "pre-bucketed input"). ``extract_text``
  takes ``n_partitions=None`` for that path.
- **Checkpoint/resume**: each bucket is committed atomically (output files
  + a metrics row). On restart, committed buckets are anti-joined away
  before any extraction work. On Iceberg, output idempotency comes from
  snapshot isolation; in this sandbox the same contract is implemented
  with parquet subdirectories + a manifest (one JSON line per committed
  bucket) — same lineage schema as FIXTURES.md §2.
- **Error containment**: extraction never fails a task; malformed rows
  produce ``error`` strings (the reference hard-throws,
  /root/reference/parsers/machine.ts:61-64 — a deliberate, documented
  extension for web-scale corpora).
"""
from __future__ import annotations

import json
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.api import extract_record

EXTRACTED_SCHEMA = "url string, text string, n_pages int, n_chars int, error string"
METRICS_COLUMNS = [
    "run_id", "bucket", "n_docs", "n_bytes", "n_errors", "error_rate",
    "p50_ms", "p99_ms", "wall_ms", "committed_at",
]

# Rows carry multi-MB binary payloads; keep Arrow batches small so a batch
# of PDFs fits comfortably in the Python worker (SURVEY.md §4.2).
ARROW_BATCH_SIZE = 64  # default for multi-MB real PDFs; bench corpora override via SQL conf


def make_spark(app_name: str = "pdfi_spark", master: str | None = None,
               shuffle_partitions: int = 32,
               advisory_partition_size: str | None = None) -> SparkSession:
    """Session factory with the pipeline's physical knobs set.

    ``advisory_partition_size`` sizes AQE's post-shuffle partition
    coalescing BY BYTES instead of pinning partition count to the core
    count (``parallelismFirst=false`` below — the tuning-guide-
    recommended setting): iterative operators (connected components,
    PageRank/HITS rounds) produce many near-empty shuffles whose 32
    scheduled tasks each are pure overhead, while data-bearing shuffles
    keep sub-advisory-sized partitions merged. Default 8 MB suits a
    single machine (measured best across the iterative + windowed op
    mix); a production cluster raises it to the guide's 128-256 MB via
    the env override ``PDFI_SPARK_ADVISORY_PARTITION``.
    """
    advisory = (advisory_partition_size
                or os.environ.get("PDFI_SPARK_ADVISORY_PARTITION", "8m"))
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    return (
        builder
        # measured sweet spot for local-mode extraction on this box: the
        # 1g default GC-thrashes under 32 concurrent binary Arrow batches,
        # and 8g+ produced longer pauses (no effect if the JVM is already up)
        .config("spark.driver.memory", "2g")
        # console progress writes \r-spam to stderr that can interleave
        # with (and truncate) the one-line JSON contract bench.py prints
        # on stdout when both are captured through one pipe — and it is
        # pure noise in any non-interactive run
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # overwrite only the bucket partitions a wave touches, never the
        # whole output root (which also holds the commit manifest)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .getOrCreate()
    )


def read_pdf_files(spark: SparkSession, path: str,
                   glob: str = "*.pdf") -> DataFrame:
    """Raw-file source: Spark's binaryFile format over a directory tree ->
    (url, html). The distributed equivalent of the reference's
    one-local-file ``readSourceSync`` entry (reference index.ts:25-31);
    partition planning, file listing and the 2 GB-per-file cap are
    Spark's. Prefer parquet/Iceberg binary columns for crawl-scale input
    (millions of small files stress the driver's listing)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(F.col("path").alias("url"), F.col("content").alias("html"))
    )


def with_bucket(df: DataFrame, url_col: str = "url", n_buckets: int = 64) -> DataFrame:
    """Stable, salt-style bucket id: pure function of the url, so retries
    and resumes are deterministic."""
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_buckets)))


def extract_text(df: DataFrame, payload_col: str = "html", url_col: str = "url",
                 n_partitions: int | None = None,
                 passthrough: list[str] | None = None,
                 with_timing: bool = False) -> DataFrame:
    """documents(url, html, ...) -> extracted(url, text, n_pages, n_chars, error).

    The per-document library runs batch-at-a-time over Arrow inside
    ``mapInPandas``; everything around it (shuffle, scan pruning, write)
    stays JVM-side. Only ``url``, the payload column and any requested
    passthrough columns are shipped to Python (column pruning keeps the
    scan narrow). Passthrough columns are echoed into the output so no
    re-join against the (binary-heavy) input is ever needed.

    ``with_timing=True`` adds a ``_ms`` column (per-document extraction
    wall time, measured inside the UDF) for latency-percentile metrics.
    """
    passthrough = passthrough or []
    projected = df.select(
        F.col(url_col).alias("url"), F.col(payload_col).alias("payload"), *passthrough
    )
    if n_partitions:
        # salt domain = 32x the partition count: hashing exactly
        # n_partitions distinct salt values into n_partitions partitions
        # leaves ~1/e of them empty and piles 2-3 salts on others (the
        # classic synthetic-key collision skew, optimization guide
        # §2.5); a 32x-finer salt domain spreads buckets evenly while
        # staying a pure deterministic function of the url (retries and
        # resumes still land rows identically). Measured on the bench
        # corpus: best-of 6.56 -> 6.0 s and far less trial spread.
        projected = projected.repartition(
            n_partitions,
            F.pmod(F.xxhash64(F.col("url")), F.lit(n_partitions * 32)),
        )
    out_columns = ["url", "text", "n_pages", "n_chars", "error"]

    def extract_batches(iterator):
        timer = time.perf_counter
        for batch in iterator:
            records = []
            times = []
            for url, payload in zip(batch["url"], batch["payload"]):
                t0 = timer()
                if payload is None:
                    # containment starts at the cast (same contract as
                    # strip_boilerplate): a NULL payload cell yields an
                    # error row, never a task failure
                    records.append({
                        "url": url, "text": None, "n_pages": None,
                        "n_chars": None, "error": "TypeError: null payload",
                    })
                else:
                    records.append(extract_record(url, bytes(payload)))
                times.append((timer() - t0) * 1000.0)
            out = pd.DataFrame.from_records(records, columns=out_columns)
            if with_timing:
                out["_ms"] = times
            for col in passthrough:
                out[col] = batch[col].values
            yield out

    schema = EXTRACTED_SCHEMA
    if with_timing:
        schema = schema + ", _ms double"
    if passthrough:
        extra = ", ".join(
            f"{field.name} {field.dataType.simpleString()}"
            for field in projected.schema.fields
            if field.name in passthrough
        )
        schema = schema + ", " + extra
    return projected.mapInPandas(extract_batches, schema=schema)


# ---------------------------------------------------------------------------
# checkpointed pipeline (parquet-backed; Iceberg mapping in module docstring)
# ---------------------------------------------------------------------------

class CheckpointStore:
    """Bucket-commit ledger: a JSONL manifest of metrics rows, one per
    committed bucket (the sandbox stand-in for an Iceberg metrics table)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.manifest_path = os.path.join(output_dir, "_metrics.jsonl")
        os.makedirs(output_dir, exist_ok=True)

    def committed_buckets(self) -> set[int]:
        done = set()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path, encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        done.add(json.loads(line)["bucket"])
        return done

    def commit(self, metrics_row: dict) -> None:
        with open(self.manifest_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(metrics_row) + "\n")

    def metrics(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]


def run_pipeline(spark: SparkSession, documents: DataFrame, output_dir: str,
                 run_id: str = "run0", n_buckets: int = 16,
                 wave_size: int | None = None,
                 payload_col: str = "html") -> dict:
    """Extract all documents into ``output_dir`` with per-bucket
    checkpointing; safe to kill and re-run (committed buckets are skipped).

    Buckets are processed in *waves*: one Spark job per wave writes
    ``partitionBy(bucket)`` output for every bucket in the wave, then each
    bucket is committed to the manifest. The wave is the resume/commit
    granularity; bucket membership is a stable hash of the url, so a
    production input table bucketed on the same hash gets partition
    pruning on the resume filter instead of a re-scan.

    Returns a summary dict with totals and resume stats.
    """
    # the per-wave partitionBy overwrite is only additive under DYNAMIC
    # partition-overwrite; a vanilla session defaults to STATIC, which
    # would wipe previously committed buckets (and the manifest) on wave
    # 2 — pin it here and restore after, like streaming's timezone pin
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        return _run_pipeline_inner(
            spark, documents, output_dir, run_id, n_buckets, wave_size,
            payload_col,
        )
    finally:
        if prev_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )


def _run_pipeline_inner(spark: SparkSession, documents: DataFrame,
                        output_dir: str, run_id: str, n_buckets: int,
                        wave_size: int | None, payload_col: str) -> dict:
    store = CheckpointStore(output_dir)
    done = store.committed_buckets()
    bucketed = with_bucket(documents, n_buckets=n_buckets)

    summary = {"run_id": run_id, "buckets_total": n_buckets,
               "buckets_skipped": len(done), "n_docs": 0, "n_errors": 0}

    todo = [b for b in range(n_buckets) if b not in done]
    wave_size = wave_size or len(todo) or 1
    waves = [todo[i:i + wave_size] for i in range(0, len(todo), wave_size)]
    from pyspark.sql import Observation

    for wave in waves:
        start = time.time()
        part = bucketed.filter(F.col("bucket").isin([int(b) for b in wave]))
        with_size = part.withColumn("_nbytes", F.length(payload_col))
        extracted = extract_text(
            with_size, payload_col=payload_col,
            passthrough=["bucket", "_nbytes"], with_timing=True,
        )
        # Per-bucket lineage metrics ride along as OBSERVED aggregates on
        # the write action itself: the just-written output is never
        # re-read (at 100 TB a metrics re-scan would double output I/O),
        # and extraction runs exactly once — no cache, no second job.
        obs = Observation(f"wave_{wave[0]}")
        aggs = []
        for b in wave:
            onb = F.col("bucket") == int(b)
            err = onb & F.col("error").isNotNull()
            aggs.extend([
                F.sum(F.when(onb, 1).otherwise(0)).alias(f"n_docs_{b}"),
                F.sum(F.when(onb, F.col("_nbytes")).otherwise(0)).alias(f"n_bytes_{b}"),
                F.sum(F.when(err, 1).otherwise(0)).alias(f"n_errors_{b}"),
                F.percentile_approx(F.when(onb, F.col("_ms")), 0.5).alias(f"p50_{b}"),
                F.percentile_approx(F.when(onb, F.col("_ms")), 0.99).alias(f"p99_{b}"),
            ])
        observed = extracted.observe(obs, *aggs)
        observed.select("url", "text", "n_pages", "n_chars", "error", "_nbytes", "bucket") \
            .write.mode("overwrite").partitionBy("bucket").parquet(output_dir)
        wall_ms = int((time.time() - start) * 1000)
        stats = obs.get
        for bucket in wave:
            n_docs = int(stats[f"n_docs_{bucket}"] or 0)
            n_errors = int(stats[f"n_errors_{bucket}"] or 0)
            p50 = stats[f"p50_{bucket}"]
            p99 = stats[f"p99_{bucket}"]
            row = {
                "run_id": run_id,
                "bucket": int(bucket),
                "n_docs": n_docs,
                "n_bytes": int(stats[f"n_bytes_{bucket}"] or 0),
                "n_errors": n_errors,
                "error_rate": (n_errors / n_docs) if n_docs else 0.0,
                "p50_ms": round(float(p50), 3) if p50 is not None else None,
                "p99_ms": round(float(p99), 3) if p99 is not None else None,
                "wall_ms": wall_ms,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
            store.commit(row)
            summary["n_docs"] += row["n_docs"]
            summary["n_errors"] += row["n_errors"]
    return summary


def read_extracted(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.option("basePath", output_dir).parquet(
        os.path.join(output_dir, "bucket=*")
    )
