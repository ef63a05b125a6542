#!/usr/bin/env python
"""Per-round benchmark harness (driver contract).

Runs the headline queries on ``local[$SPARK_GRAFT_CPUS]`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is end-to-end extraction throughput over a
materialized synthetic PDF corpus (mixed recipes, FIXTURES.md §3) built
deterministically from the driver's ``documents`` table. The corpus is
written to a scratch dir first so the timed run measures scan ->
salted repartition -> mapInPandas extraction -> aggregation, not
generation. Training-data ops run over the driver's parquet tables
directly.

Env knobs:
    SPARK_GRAFT_SF_DIR    input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS      local[] parallelism (default 32)
    BENCH_REPLICATE       corpus fan-out factor (default 20 -> 100k docs at sf0.1)
    BENCH_SCRATCH         scratch dir (default <repo>/.bench)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pdfi_spark import ops  # noqa: E402
from pdfi_spark.datagen import materialize_corpus  # noqa: E402
from pdfi_spark.pipeline import extract_text, make_spark  # noqa: E402

REPO = os.path.dirname(os.path.abspath(__file__))


def force(df) -> int:
    """Fully evaluate a DataFrame without sink cost."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("BENCH_REPLICATE", "20"))
    scratch = os.environ.get("BENCH_SCRATCH", os.path.join(REPO, ".bench"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = make_spark("pdfi-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # bench corpus rows are ~1.5 KB PDFs; large Arrow batches amortize the
    # JVM<->Python pipe (production multi-MB PDFs use the small default)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- flagship: PDF extraction over the materialized corpus ------------
    corpus = os.path.join(scratch, f"corpus_{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}")
    t0 = time.time()
    marker = os.path.join(corpus, "_SUCCESS")
    if not os.path.exists(marker):
        materialize_corpus(spark, sf_dir, corpus, recipe="mixed",
                           n_files=cpus * 2, replicate=replicate)
    extras["corpus_build_sec"] = round(time.time() - t0, 3)

    documents = spark.read.parquet(corpus)
    n_docs = documents.count()

    # best-of-3: co-tenant noise on this shared host only slows trials
    trials = []
    for _ in range(3):
        t0 = time.time()
        # 8x slots measured best for ~KB docs at local[32]: finer salted
        # buckets smooth per-partition skew/stragglers (4x was ~25% slower;
        # >16x re-adds scheduling overhead)
        extracted = extract_text(documents, payload_col="html", n_partitions=cpus * 8)
        force(extracted.select("url", "n_chars", "error"))
        trials.append(round(time.time() - t0, 3))
    timings["extract"] = min(trials)
    extras["extract_trials"] = trials
    extras["extract_docs_per_sec"] = round(n_docs / timings["extract"], 1)
    extras["extract_n_docs"] = n_docs

    # steady-state production layout: input pre-bucketed at ingest, so no
    # runtime shuffle before the UDF
    trials_direct = []
    for _ in range(2):
        t0 = time.time()
        force(extract_text(documents, payload_col="html")
              .select("url", "n_chars", "error"))
        trials_direct.append(round(time.time() - t0, 3))
    timings["extract_prebucketed"] = min(trials_direct)
    extras["extract_prebucketed_docs_per_sec"] = round(
        n_docs / timings["extract_prebucketed"], 1
    )

    # --- training-data / analytics ops over the driver tables -------------
    op_queries = {
        "dedup_exact": ops.dedup_exact,
        "minhash_signatures": ops.minhash_signatures,
        "minhash_lsh_buckets": ops.minhash_lsh_buckets,
        "minhash128_signatures": ops.minhash128_signatures,
        "minhash128_lsh_buckets": ops.minhash128_lsh_buckets,
        "simhash": ops.simhash,
        "ngram_jaccard": ops.ngram_jaccard_pairs,
        "cosine_topk": ops.cosine_topk,
        "cosine_adjacent": ops.cosine_adjacent_pairs,
        "lsh_ann_buckets": ops.lsh_ann_buckets,
        "ivf_cell_counts": ops.ivf_cell_counts,
        "ivf_topk": ops.ivf_topk,
        "lang_stopwords": ops.lang_stopword_counts,
        "quality_scores": ops.quality_scores,
        "token_counts": ops.token_counts,
        "doc_fingerprint": ops.doc_fingerprint,
        "media_metadata": ops.media_metadata,
        "media_features": ops.media_features,
        "dedup_clusters": ops.dedup_clusters,
        "dedup_clusters_128": ops.dedup_clusters_128,
        "embedding_neardup_topk": ops.embedding_neardup_topk,
        "ivf_train_cells": ops.ivf_train_cells,
        "nation_revenue_topk": ops.nation_revenue_topk,
        "html_main_content": ops.html_main_content("boiler"),
        "html_block_stats": ops.html_block_stats,
        "link_graph_degrees": ops.link_graph_degrees,
        "link_graph_pagerank": ops.link_graph_pagerank,
        "link_graph_pagerank_dangling": ops.link_graph_pagerank_dangling,
        "warc_extract": ops.warc_extract,
        "wet_export": ops.wet_export,
        "url_canonicalize": ops.url_canonicalize,
        "url_dedup_counts": ops.url_dedup_counts,
        "host_stats": ops.host_stats,
        "robots_filter": ops.robots_filter,
        "minhash128_jaccard_estimates": ops.minhash128_jaccard_estimates,
        "lang_balance_sample": ops.lang_balance_sample,
        "tfidf_top_terms": ops.tfidf_top_terms,
        "unigram_surprisal": ops.unigram_surprisal,
        "anchor_text_index": ops.anchor_text_index,
        "frontier_schedule": ops.frontier_schedule,
        "paragraph_dedup": ops.paragraph_dedup,
        "pack_training_shards": ops.pack_training_shards,
        "training_shuffle_manifest": ops.training_shuffle_manifest,
        "semdedup": ops.semdedup,
        "bigram_surprisal": ops.bigram_surprisal,
        "crawl_diff": ops.crawl_diff,
        "incremental_content_dedup": ops.incremental_content_dedup,
        "exact_substring_dup": ops.exact_substring_dup,
        "exact_substring_excise": ops.exact_substring_excise,
        "bm25_topk": ops.bm25_topk,
        "surprisal_buckets": ops.surprisal_buckets,
        "link_graph_hits": ops.link_graph_hits,
        "cdx_index": ops.cdx_index,
        "pq_codes": ops.pq_codes,
        "pq_topk": ops.pq_topk,
        "pq_topk_refine": ops.pq_topk_refine,
        "host_url_hll": ops.host_url_hll,
        "cms_heavy_hitters": ops.cms_heavy_hitters,
        "bloom_dedup_gate": ops.bloom_dedup_gate,
        "host_cap_sample": ops.host_cap_sample,
        "pmi_collocations": ops.pmi_collocations,
        "weighted_sample": ops.weighted_sample,
        "length_histogram_quantiles": ops.length_histogram_quantiles,
        "q1_pricing_summary": ops.q1_pricing_summary,
        "q3_shipping_priority": ops.q3_shipping_priority,
        "q5_local_supplier_volume": ops.q5_local_supplier_volume,
        "q14_promo_revenue": ops.q14_promo_revenue,
        "q4_order_priority": ops.q4_order_priority,
        "q18_large_volume_customer": ops.q18_large_volume_customer,
        "link_graph_triangles": ops.link_graph_triangles,
    }
    round1_set = {
        "extract", "extract_prebucketed", "dedup_exact", "minhash_signatures",
        "minhash_lsh_buckets", "simhash", "ngram_jaccard", "cosine_topk",
        "cosine_adjacent", "lsh_ann_buckets", "ivf_cell_counts", "ivf_topk",
        "lang_stopwords", "quality_scores", "token_counts", "doc_fingerprint",
        "media_metadata", "media_features",
    }
    # best-of-2 with interleaved full passes: co-tenant noise on this
    # host only ever slows a trial, so min() per query approximates the
    # unloaded figure, and interleaving keeps a noisy minute from biasing
    # one query instead of one pass
    for _pass in range(2):
        for name, fn in op_queries.items():
            t0 = time.time()
            force(fn(spark, sf_dir))
            elapsed = round(time.time() - t0, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    # two more extract trials AFTER the op passes: the run is minutes
    # long, so late trials are decorrelated from whatever co-tenant noise
    # wave hit the early ones (a noisy first minute used to poison all
    # three consecutive extract trials at once)
    for _ in range(2):
        t0 = time.time()
        extracted = extract_text(documents, payload_col="html",
                                 n_partitions=cpus * 8)
        force(extracted.select("url", "n_chars", "error"))
        trials.append(round(time.time() - t0, 3))
    timings["extract"] = min(trials)
    extras["extract_trials"] = trials
    extras["extract_docs_per_sec"] = round(n_docs / timings["extract"], 1)

    total = round(sum(timings.values()), 3)
    # apples-to-apples vs BENCH_r01 (new round-2 queries grow the total)
    extras["round1_queries_total"] = round(
        sum(v for k, v in timings.items() if k in round1_set), 3
    )
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        # measurement basis, so cross-round comparisons know what they
        # compare: op-query timings are best-of-2 interleaved passes
        # (min) since round 3 — BENCH_r01/r02 ran each op query ONCE, so
        # op-query deltas vs those rounds conflate real speedups with
        # the basis change. extract/extract_prebucketed have been
        # best-of-3/2 since round 1 (extract_trials lists the raws).
        "basis": "min",
        "trials": 2,
        "trials_extract": 5,  # 3 up-front + 2 after the op passes
        **extras,
    }
    spark.stop()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
