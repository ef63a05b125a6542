"""Fast in-suite replica of the driver's correctness gate: a
representative subset of __spark_entry__ queries vs their DuckDB oracles
at sf0.001 (the full all-query sweep at sf0.01 lives in
tools/check_oracles.py, ~4 min). Comparison is the same
order-insensitive sorted-column value hash the driver uses."""
import hashlib

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
# fast, non-streaming, non-pipeline queries spanning every op family
SUBSET = [
    "extract_simple",
    "extract_zapf_dingbats",
    "dedup_exact",
    "minhash_signatures",
    "minhash128_signatures",
    "minhash128_lsh_buckets",
    "dedup_clusters_128",
    "minhash128_jaccard_estimates",
    "simhash",
    "cosine_topk",
    "ivf_cell_counts",
    "lang_id_ngram",
    "token_counts",
    "length_percentiles",
    "html_boiler",
    "html_latin1",
    "html_block_stats",
    "html_outlinks",
    "html_content_spans",
    "corpus_build_counts",
    "link_graph_degrees",
    "link_graph_pagerank",
    "link_graph_pagerank_dangling",
    "warc_extract",
    "wet_export",
    "url_canonicalize",
    "url_dedup_counts",
    "host_stats",
    "robots_filter",
    "lang_balance_sample",
    "tfidf_top_terms",
    "unigram_surprisal",
    "bigram_surprisal",
    "anchor_text_index",
    "frontier_schedule",
    "paragraph_dedup",
    "pack_training_shards",
    "training_shuffle_manifest",
    "semdedup",
    "crawl_diff",
    "incremental_content_dedup",
    "exact_substring_dup",
    "exact_substring_excise",
    "bm25_topk",
    "surprisal_buckets",
    "link_graph_hits",
    "cdx_index",
    "pq_codes",
    "pq_topk",
    "pq_topk_refine",
    "host_url_hll",
    "cms_heavy_hitters",
    "bloom_dedup_gate",
    "host_cap_sample",
    "pmi_collocations",
    "weighted_sample",
    "length_histogram_quantiles",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q14_promo_revenue",
    "q4_order_priority",
    "q18_large_volume_customer",
    "link_graph_triangles",
    "media_metadata",
    "top_events_per_user",
    "asof_join_events",
    "range_join_counts",
    "json_props_stats",
]


def _canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        parts = []
        for v in row:
            parts.append(f"{v:.6f}" if isinstance(v, float) else str(v))
        rows.append("\x1f".join(parts))
    rows.sort()
    return (
        len(df),
        list(df.columns),
        hashlib.md5("\x1e".join(rows).encode()).hexdigest(),
    )


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as entrymod

    return entrymod


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, entry, name):
    spark_df = entry.queries()[name](spark, SF).toPandas()
    duck_df = duck.execute(entry.oracle_sql()[name]).df()
    sn, scols, shash = _canon(spark_df)
    dn, dcols, dhash = _canon(duck_df)
    assert sn == dn, f"rows {sn} != {dn}"
    assert scols == dcols, f"cols {scols} != {dcols}"
    assert shash == dhash, "value hash mismatch"
