"""Connected-components keep-list (the dedup pipeline's final stage)."""
from pyspark.sql import functions as F

from pdfi_spark.ops.dedup import connected_components


def test_transitive_chain_forms_one_cluster(spark):
    # 1-2 and 2-3 are near-dups; 1-3 never directly compared -> still one
    # cluster. 5 is a singleton.
    nodes = spark.createDataFrame([(1,), (2,), (3,), (5,)], "doc_id long")
    pairs = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs], "u long, v long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 5}


def test_two_components_and_keeper_flags(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = [(1, 4), (2, 6), (6, 7)]
    edges = spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs], "u long, v long"
    )
    labels = connected_components(edges, nodes)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {1: 1, 4: 1, 2: 2, 6: 2, 7: 2, 3: 3, 5: 5}
    keepers = {
        r["doc_id"]
        for r in labels.where(F.col("cluster_id") == F.col("doc_id")).collect()
    }
    assert keepers == {1, 2, 3, 5}
