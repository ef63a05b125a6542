"""Pure-multiprocessing host-ceiling control (no Spark).

Measures extraction throughput with N plain Python processes splitting
a corpus's parquet part-files (each worker: pyarrow read ->
extract_record per row). The N -> 4N scaling efficiency of THIS job is
the host's memory-bandwidth ceiling for that pair — the yardstick
BASELINE.md's "Host context" note measures Spark's saturation-bound
pairs against.

--style heavy (default) writes .bench/mp_baseline.json (the 8->32
saturation yardstick); --style mixed writes .bench/mp_baseline_mixed.json
(the 4->16 yardstick for the salted ~1.5 KB tier). Trials accumulate in
per-style ledgers; `tools/bench_scaling.py` interpolates the note's
figures from these files, so the prose can never drift from the
measurements.

Usage: python tools/bench_mp_control.py [--levels 8,32] [--trials 3]
                                        [--style heavy|mixed]
"""
from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPORA = {
    "heavy": os.path.join(REPO, ".bench", "corpus_sf0.1_heavy_x4"),
    "mixed": os.path.join(REPO, ".bench", "corpus_sf0.1_mixed_x20"),
}
OUTS = {
    "heavy": os.path.join(REPO, ".bench", "mp_baseline.json"),
    "mixed": os.path.join(REPO, ".bench", "mp_baseline_mixed.json"),
}


def _worker(files: list[str]) -> int:
    import pyarrow.parquet as pq

    from pdfi_spark.core.api import extract_record

    n = 0
    for path in files:
        table = pq.read_table(path, columns=["url", "html"])
        for url, html in zip(table["url"].to_pylist(), table["html"].to_pylist()):
            extract_record(url, html)
            n += 1
    return n


def run_level(files: list[str], n_procs: int) -> tuple[float, int]:
    chunks = [files[i::n_procs] for i in range(n_procs)]
    start = time.time()
    with mp.Pool(n_procs) as pool:
        counts = pool.map(_worker, chunks)
    return time.time() - start, sum(counts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--style", choices=["heavy", "mixed"], default="heavy")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    corpus = CORPORA[args.style]
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    if not files:
        print(f"no corpus at {corpus}; run tools/bench_scaling.py "
              f"--style {args.style} first")
        return 1

    # interleave trials round-robin so host noise hits each level equally;
    # trials ACCUMULATE in a ledger across invocations (best-of basis,
    # same protocol as tools/bench_scaling.py — a single noisy window
    # must not overwrite a better measurement)
    sfx = "" if args.style == "heavy" else f"_{args.style}"
    ledger = os.path.join(REPO, ".bench", f"mp_trials{sfx}.jsonl")
    n_docs = None
    for t in range(args.trials):
        for n in levels:
            wall, docs = run_level(files, n)
            n_docs = docs
            with open(ledger, "a") as f:
                f.write(json.dumps({"procs": n, "wall": round(wall, 3),
                                    "n_docs": docs}) + "\n")
            print(f"trial {t} procs={n}: {wall:.2f}s ({docs / wall:.0f} docs/sec)")
    all_trials: dict[int, list[float]] = {}
    with open(ledger) as f:
        for line in f:
            row = json.loads(line)
            n_docs = n_docs or row["n_docs"]
            all_trials.setdefault(row["procs"], []).append(row["wall"])
    results: dict[str, dict] = {}
    for n in sorted(all_trials):
        best = min(all_trials[n])
        results[str(n)] = {
            "best_sec": round(best, 2),
            "docs_per_sec": round(n_docs / best, 1),
            "trials": [round(x, 2) for x in all_trials[n]],
        }
    levels = sorted(all_trials)
    effs = {}
    for lo, hi in zip(levels, levels[1:]):
        if hi == lo * 4:
            eff = (results[str(hi)]["docs_per_sec"] / results[str(lo)]["docs_per_sec"]) / 4
            effs[f"{lo}->{hi}"] = round(eff, 3)
    out = {"corpus": args.style, "n_docs": n_docs, "results": results,
           "efficiency": effs}
    with open(OUTS[args.style], "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["efficiency"]))

    from bench_scaling import update_baseline_md  # noqa: E402

    update_baseline_md()
    print("BASELINE.md updated")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
