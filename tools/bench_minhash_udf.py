"""Measure the MinHash-128 signature fold: Catalyst HOF fold vs the
vectorized numpy mapInPandas variant (both bit-identical; see
tests/test_dedup_clusters.py). Round-4 watch item #1: the HOF fold is
lambda-interpretation-bound, so the sketch family was ~28 s of the
88 s headline. Adoption bar per VERDICT r4 ask #6: >= 2x on the fold.

Usage: python tools/bench_minhash_udf.py [--sf-dir DIR] [--trials N]
Prints per-variant wall times (force = count over an md5 digest of the
signature, so every lane is computed) and the speedup ratio.
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdfi_spark.ops import dedup as D
    from pdfi_spark.pipeline import make_spark

    spark = make_spark("mh-bench", master="local[32]", shuffle_partitions=32)
    docs = D._docs(spark, args.sf_dir)
    docs.count()  # warm the scan

    def force(df):
        # digest every lane so neither variant can short-circuit
        joined = F.concat_ws(",", F.transform("sig", lambda x: x.cast("string")))
        return df.select(F.md5(joined).alias("d")).count()

    results = {}
    for name, fn in (("hof", D._minhash128_sig_hof),
                     ("numpy", D._minhash128_sig_np)):
        times = []
        for t in range(args.trials + 1):
            t0 = time.monotonic()
            n = force(fn(docs))
            dt = time.monotonic() - t0
            if t > 0:  # discard codegen/UDF-worker warm-up
                times.append(dt)
            print(f"{name} trial {t}: {dt:.2f}s ({n} rows)", flush=True)
        results[name] = min(times)
        print(f"{name}: best {results[name]:.2f}s "
              f"median {statistics.median(times):.2f}s", flush=True)
    print(f"speedup numpy vs hof: {results['hof'] / results['numpy']:.2f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
