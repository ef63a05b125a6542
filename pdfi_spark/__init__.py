"""pdfi_spark — a PySpark-native PDF text-extraction analytics engine.

A from-scratch reimplementation of the capabilities of chbrown/pdfi
(reference at /root/reference) designed Spark-first:

- ``pdfi_spark.core``  : pure-Python per-document extraction library
  (zero Spark imports; unit-testable with pytest alone).
- ``pdfi_spark.pipeline`` : the distributed pipeline — Iceberg/parquet scan
  → salted repartition → Arrow-batched ``mapInPandas`` extraction →
  output + metrics tables, with checkpoint/resume.
- ``pdfi_spark.ops``   : large-scale training-data operators (dedup,
  similarity search, text analysis) expressed in DataFrame operations.
"""

__version__ = "0.1.0"
