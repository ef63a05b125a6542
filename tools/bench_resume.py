"""Measured resume cost for the checkpointed wave pipeline
(BASELINE.md protocol: "resume cost — seconds to skip already-committed
partitions after an induced kill").

Protocol (mixed sf0.1 corpus, 100k docs, local[32]):

1. FULL: fresh 16-bucket run, wave_size=4 (4 waves) -> T_full.
2. Induced kill at 50%: truncate the manifest to the first 8 committed
   buckets (exactly what a SIGKILL between wave 2 and 3 leaves behind —
   wave 3's parquet may be partially present; dynamic partition
   overwrite makes the re-write idempotent).
3. RESUME: re-run -> T_resume. Work skipped = 8 buckets; work done = 8.
4. SKIP-ALL: re-run once more with everything committed -> T_skip. The
   pipeline reads the manifest, finds todo empty, and never launches a
   Spark job: this is the pure ledger-scan overhead.

Reported numbers:
- resume_overhead_sec = T_resume - T_full/2: what the 8 skipped buckets
  still cost. In this sandbox the resume filter (bucket IN todo) is
  evaluated on a computed column, so the scan still reads the whole
  corpus once — a production input table bucket-written by the same
  xxhash64(url) (pipeline.py docstring) gets partition pruning and pays
  ~T_skip instead.
- T_skip: manifest-only resume (no job) — milliseconds.

Writes .bench/resume_cost.json and splices a '## Resume cost' section
into BASELINE.md (before '## Measured results', which bench_scaling.py
owns and rewrites wholesale).

Usage: python tools/bench_resume.py [--trials 3]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BUCKETS = 16
WAVE_SIZE = 4
KILL_AFTER = 8  # committed buckets surviving the induced kill


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--corpus", default=os.path.join(
        REPO, ".bench", "corpus_sf0.1_mixed_x20"))
    args = ap.parse_args()

    from pdfi_spark.datagen import materialize_corpus
    from pdfi_spark.pipeline import CheckpointStore, make_spark, run_pipeline

    spark = make_spark("resume-bench", master="local[32]",
                       shuffle_partitions=32)
    if not os.path.exists(os.path.join(args.corpus, "_SUCCESS")):
        materialize_corpus(spark, "/root/testdata/sf0.1", args.corpus,
                           recipe="mixed", n_files=64, replicate=20)
    docs = spark.read.parquet(args.corpus)
    n_docs = docs.count()

    t_full, t_resume, t_skip = [], [], []
    for trial in range(args.trials + 1):  # first run is codegen warm-up
        out = tempfile.mkdtemp(prefix="pdfi_resume_bench_")
        try:
            t0 = time.monotonic()
            s = run_pipeline(spark, docs, out, n_buckets=N_BUCKETS,
                             wave_size=WAVE_SIZE)
            full = time.monotonic() - t0
            assert s["n_docs"] == n_docs and s["buckets_skipped"] == 0

            # induced kill: keep only the first KILL_AFTER commits
            store = CheckpointStore(out)
            committed = store.metrics()[:KILL_AFTER]
            with open(store.manifest_path, "w", encoding="utf-8") as f:
                for row in committed:
                    f.write(json.dumps(row) + "\n")

            t0 = time.monotonic()
            s = run_pipeline(spark, docs, out, run_id="resume",
                             n_buckets=N_BUCKETS, wave_size=WAVE_SIZE)
            resume = time.monotonic() - t0
            assert s["buckets_skipped"] == KILL_AFTER

            t0 = time.monotonic()
            s = run_pipeline(spark, docs, out, run_id="noop",
                             n_buckets=N_BUCKETS, wave_size=WAVE_SIZE)
            skip = time.monotonic() - t0
            assert s["buckets_skipped"] == N_BUCKETS and s["n_docs"] == 0
        finally:
            shutil.rmtree(out, ignore_errors=True)
        tag = " (warm-up, discarded)" if trial == 0 else ""
        print(f"trial {trial}: full {full:.2f}s resume {resume:.2f}s "
              f"skip-all {skip * 1000:.0f}ms{tag}", flush=True)
        if trial > 0:
            t_full.append(full)
            t_resume.append(resume)
            t_skip.append(skip)

    best_full = min(t_full)
    best_resume = min(t_resume)
    result = {
        "n_docs": n_docs,
        "n_buckets": N_BUCKETS,
        "wave_size": WAVE_SIZE,
        "killed_after_buckets": KILL_AFTER,
        "full_sec": round(best_full, 3),
        "resume_sec": round(best_resume, 3),
        "resume_overhead_sec": round(best_resume - best_full / 2, 3),
        "skip_all_ms": round(min(t_skip) * 1000, 1),
        "trials_full": [round(t, 3) for t in t_full],
        "trials_resume": [round(t, 3) for t in t_resume],
    }
    os.makedirs(os.path.join(REPO, ".bench"), exist_ok=True)
    with open(os.path.join(REPO, ".bench", "resume_cost.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))

    section = (
        "## Resume cost (tools/bench_resume.py)\n\n"
        f"Checkpointed wave pipeline over the mixed sf0.1 corpus "
        f"({n_docs:,} docs, {N_BUCKETS} buckets, waves of {WAVE_SIZE}), "
        "local[32], best of "
        f"{len(t_full)} trials. Induced kill = manifest truncated to the "
        f"first {KILL_AFTER} bucket commits (what a SIGKILL between waves "
        "leaves; dynamic partition overwrite makes the re-write "
        "idempotent).\n\n"
        f"| run | sec |\n|---|---|\n"
        f"| full (16 buckets) | {result['full_sec']} |\n"
        f"| resume (skip 8, process 8) | {result['resume_sec']} |\n"
        f"| skip-all (everything committed; no Spark job) | "
        f"{result['skip_all_ms'] / 1000:.3f} |\n\n"
        f"Resume overhead vs a hypothetical half-run (T_resume − T_full/2): "
        f"**{result['resume_overhead_sec']:+.2f} s** — the skipped buckets "
        "cost nothing measurable: extraction dominates, and the only "
        "residual work is the per-row `bucket IN (todo)` filter on the "
        "re-scan (the sandbox corpus is not stored bucket-partitioned). "
        "A production input table bucket-written by the same xxhash64(url) "
        "(pipeline.py docstring) prunes committed buckets at the scan and "
        "degenerates to ~the skip-all cost "
        f"({result['skip_all_ms']:.0f} ms: one manifest read, zero Spark "
        "jobs) when everything is committed.\n"
    )
    path = os.path.join(REPO, "BASELINE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    if "## Resume cost (tools/bench_resume.py)" in text:
        text = re.sub(
            r"## Resume cost \(tools/bench_resume\.py\).*?(?=\n## )",
            section + "\n", text, flags=re.S)
    else:
        text = text.replace("## Measured results",
                            section + "\n## Measured results", 1)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
    print("BASELINE.md updated")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
