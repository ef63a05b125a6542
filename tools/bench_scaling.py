"""Two-cluster-size scaling evidence (sandbox proxy for the north rule).

No real cluster exists here, so the N -> 4N executor criterion is
evidenced by running the SAME extraction job at two parallelism levels
on the SAME materialized input (fresh JVM per level via subprocess) and
reporting throughput at both plus scaling efficiency
``(tp_4N / tp_N) / 4`` (target >= 0.8).

Two pairs are reported:

- **2 -> 8 cores** (primary): both levels are far below this 32-core
  box's capacity, so the measurement reflects framework scaling — what
  adding executors on a real cluster does — rather than host saturation.
- **8 -> 32 cores** (saturation-bound): at local[32] the 32 Python
  workers + JVM scan/Arrow threads oversubscribe the box (a real 4N
  cluster adds machines instead), so this pair is a lower bound.

Usage: python tools/bench_scaling.py [--trials 3] [--replicate 20]
Writes results into BASELINE.md under '## Measured results'.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(corpus: str, cpus: int, trials: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_runner.py"),
         corpus, str(cpus), str(trials)],
        capture_output=True, text=True, cwd=REPO, check=False,
    )
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"runner local[{cpus}] failed:\n{proc.stderr[-3000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--replicate", type=int, default=20)
    ap.add_argument("--levels", type=str, default="2,8,32")
    args = ap.parse_args()

    corpus = os.path.join(REPO, ".bench", f"corpus_sf0.1_x{args.replicate}")
    if not os.path.exists(os.path.join(corpus, "_SUCCESS")):
        from pdfi_spark.datagen import materialize_corpus
        from pdfi_spark.pipeline import make_spark
        spark = make_spark("scaling-gen", master="local[32]", shuffle_partitions=32)
        materialize_corpus(spark, "/root/testdata/sf0.1", corpus,
                           recipe="mixed", n_files=64, replicate=args.replicate)
        spark.stop()

    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for cpus in levels:
        t0 = time.time()
        results[cpus] = run_level(corpus, cpus, args.trials)
        r = results[cpus]
        print(f"local[{cpus}]: median {r['median_sec']}s, {r['docs_per_sec']} docs/sec "
              f"(trials {r['trials']}, {time.time() - t0:.0f}s incl. JVM)", flush=True)

    pairs = [(levels[i], levels[i + 1]) for i in range(len(levels) - 1)
             if levels[i + 1] == 4 * levels[i]]
    effs = {}
    for n, n4 in pairs:
        eff = (results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]) / 4
        effs[f"{n}->{n4}"] = round(eff, 3)
        print(f"scaling efficiency {n} -> {n4} cores: {eff:.3f}")

    out = {"results": {str(k): v for k, v in results.items()}, "efficiency": effs}
    with open(os.path.join(REPO, ".bench", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)

    update_baseline_md(results, effs)
    print("BASELINE.md updated")
    return 0


def update_baseline_md(results: dict, effs: dict) -> None:
    lines = ["", "## Measured results (sandbox, 32-core local mode)", "",
             "Same job (parquet scan -> salted repartition(4x slots) -> "
             "mapInPandas extraction -> noop sink) over the same materialized "
             "100k-doc mixed-recipe corpus; median of 3 trials after a "
             "discarded warm-up, fresh JVM per level.", "",
             "| cores | median sec | docs/sec |", "|---|---|---|"]
    for cpus, r in sorted(results.items()):
        lines.append(f"| local[{cpus}] | {r['median_sec']} | {r['docs_per_sec']} |")
    lines.append("")
    for pair, eff in effs.items():
        tag = "**primary, both levels below host saturation**" if pair == "2->8" \
            else "saturation-bound lower bound (32 Python workers + JVM threads oversubscribe the 32-core box; a real 4N cluster adds machines)"
        lines.append(f"- Scaling efficiency {pair} cores: **{eff}** ({tag})")
    lines.append("")
    block = "\n".join(lines)

    path = os.path.join(REPO, "BASELINE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    text = re.sub(r"\n## Measured results.*\Z", "", text, flags=re.S)
    with open(path, "w", encoding="utf-8") as f:
        f.write(text.rstrip("\n") + "\n" + block)


if __name__ == "__main__":
    raise SystemExit(main())
