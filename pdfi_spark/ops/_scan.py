"""Scan fan-out for under-split inputs.

A parquet file is splittable only at row-group granularity, so a
single-file single-row-group table scans as ONE task no matter how many
cores the cluster has — and every narrow stage above it (Arrow UDF
passes, per-row expression folds, map-side partial aggregates) runs
serially until the first exchange. That is the canonical "unsplittable
input" skew case (spark_optimization_guide §2.5: "one huge unsplittable
file ... repartition immediately after the read").

``read_parquet_fanned`` reads a parquet path and, ONLY when the scan
plans fewer splits than the cluster's parallelism, round-robin
repartitions right above the scan. At production scale (many files /
many row groups / bucketed layouts) the scan already yields >= cores
splits and this is a NO-OP — the repartition never appears in the plan,
so the zero-extra-exchange shape of every operator is preserved exactly
where it matters. Round-robin repartition is deterministic under task
retries (sort-before-repartition is on by default, SPARK-23207), and
column pruning / filter pushdown both traverse a Repartition node, so
PushedFilters/ReadSchema still reach the scan.

The split count is planning metadata (file listing), memoized per
(session, path) so repeated reads inside one bench process don't re-plan
the probe; no data or results are ever cached.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCAN_PARTS: dict[tuple[int, str], int] = {}


def scan_partitions(spark: SparkSession, path: str, df: DataFrame) -> int:
    key = (id(spark), path)
    n = _SCAN_PARTS.get(key)
    if n is None:
        try:
            n = df.rdd.getNumPartitions()
        except Exception:  # pragma: no cover — exotic sources
            n = 1 << 30
        _SCAN_PARTS[key] = n
    return n


def read_parquet_fanned(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet(path), fanned out to the cluster's parallelism
    iff the scan itself is under-split (see module docstring)."""
    df = spark.read.parquet(path)
    p = spark.sparkContext.defaultParallelism
    if scan_partitions(spark, path, df) < p:
        return df.repartition(p)
    return df


# Below this input size the fan-out exchange costs more than the serial
# narrow work it parallelizes for aggregate-/exchange-bound operators
# (measured at sf0.1, where the 0.6 MB documents file favored the raw
# scan by 0.2-0.7 s per query); at ~10x that size (3.4 MB compressed)
# the same operators' serial narrow work dominates instead (measured:
# bigram_surprisal 5.4 s raw vs ~2 s fanned at 10x) and fanning wins.
# Size is a coarse proxy for rows x per-row work, which is what
# actually serializes.
MIN_FAN_BYTES = 2 << 20


def parquet_num_rows(spark: SparkSession, path: str) -> int:
    """Exact row count from the parquet FOOTER (the file's own
    authoritative metadata) — a driver-side footer read instead of a
    count-star job, for the generator-modulus/count scalars several
    operators embed. Falls back to a Spark count for non-local /
    multi-file inputs (where a count-star is metadata-cheap anyway:
    Spark reads only row-group headers)."""
    import os

    try:
        if os.path.isfile(path):
            import pyarrow.parquet as pq

            return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # pragma: no cover — unreadable footer etc.
        pass
    return spark.read.parquet(path).count()


def read_parquet_auto(spark: SparkSession, path: str,
                      min_fan_bytes: int = MIN_FAN_BYTES) -> DataFrame:
    """Size-adaptive reader for operators whose fan-out break-even
    depends on input volume: RAW scan below ``min_fan_bytes`` (tiny
    inputs: an exchange is pure overhead next to their map-side partial
    aggregation), fanned above it. Multi-file/directory inputs skip the
    size probe and use the ordinary under-split rule (production inputs
    are many-split, where both paths are the same no-op)."""
    import os

    try:
        size = os.path.getsize(path) if os.path.isfile(path) else None
    except OSError:  # pragma: no cover — exotic paths
        size = None
    if size is not None and size < min_fan_bytes:
        return spark.read.parquet(path)
    return read_parquet_fanned(spark, path)
