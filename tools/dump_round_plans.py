#!/usr/bin/env python
"""Dump .explain("formatted") for the round-6-touched queries.

Usage: python tools/dump_round_plans.py <repo_root> <out_dir> <suffix>

Run once from a worktree of the round-start commit (suffix "before")
and once from the optimized tree (suffix "after"); the judge checks
OPTIMIZATION_r06.md's plan claims against these files.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "dedup_clusters_128", "minhash128_jaccard_estimates",
    "minhash128_signatures", "minhash128_lsh_buckets",
    "dedup_clusters", "minhash_signatures", "minhash_lsh_buckets",
    "simhash", "ngram_jaccard_pairs", "doc_fingerprint",
    "html_block_stats", "warc_extract", "wet_export",
    "anchor_text_index", "link_graph_degrees", "link_graph_pagerank",
    "link_graph_hits", "link_graph_triangles", "robots_filter",
    "frontier_schedule", "semdedup", "ivf_train_cells",
    "ivf_cell_counts", "ivf_topk", "cosine_topk",
    "embedding_neardup_topk", "exact_substring_dup",
    "exact_substring_excise", "pmi_collocations", "bm25_topk",
    "unigram_surprisal", "paragraph_dedup", "media_features",
    "quality_scores", "token_counts", "tfidf_top_terms",
]

NAME_MAP = {"ngram_jaccard_pairs": "ngram_jaccard"}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    from pdfi_spark import ops
    from pdfi_spark.pipeline import make_spark

    spark = make_spark("dump-plans", master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # the LSH candidate-pair stage lives behind an eager checkpoint in
    # the final dedup plans; dump its own plan so the window+self-join
    # -> single-aggregate rewrite is visible to the judge
    def _candidates(spark, sf):
        from pdfi_spark.ops.dedup import _lsh128_members, _pairs_from_members
        return _pairs_from_members(_lsh128_members(spark, sf))

    extra = [("lsh128_candidate_pairs", _candidates)]
    for qname, fn in list(zip(QUERIES, [None] * len(QUERIES))) + extra:
        if fn is not None:
            df = fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            path = os.path.join(OUT, f"{qname}_{SUFFIX}.txt")
            with open(path, "w", encoding="utf-8") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
            continue
        qfn = getattr(ops, qname, None)
        if qfn is None:
            print(f"skip {qname} (absent)")
            continue
        df = qfn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        out_name = NAME_MAP.get(qname, qname)
        path = os.path.join(OUT, f"{out_name}_{SUFFIX}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
