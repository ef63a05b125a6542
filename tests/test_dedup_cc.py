"""Large-star/small-star connected components: O(log n) convergence on
adversarial long-chain components, and the explicit cap warning.

The plain hash-min loop this replaced needs O(diameter) rounds on a path
graph; the star alternation (Kiveris et al.) needs O(log n). A 64-node
path converging well under 64 rounds (and with no truncation warning) is
the regression witness for that upgrade.
"""
import warnings

from pdfi_spark.ops.dedup import connected_components


def _path_graph(spark, n):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs],
        "u long, v long",
    )
    return nodes, edges


def test_long_chain_converges_in_log_rounds(spark):
    # 64-node path: diameter 63. Hash-min would need >60 rounds; the star
    # alternation must finish (fixpoint OBSERVED, so no warning) within
    # 12 rounds ~ c*log2(64).
    nodes, edges = _path_graph(spark, 64)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any truncation warning -> fail
        labels = connected_components(edges, nodes, max_iters=12)
        got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(64)}


def test_round_cap_raises_warning(spark):
    # 1 round cannot finish a 32-node path; the truncation must WARN, not
    # return silently (labels may be mid-merge).
    nodes, edges = _path_graph(spark, 32)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(edges, nodes, max_iters=1).collect()
    assert any("cap" in str(w.message) for w in caught)


def test_empty_edge_set_is_all_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    edges = spark.createDataFrame([], "u long, v long")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # empty graph must converge round 1
        labels = connected_components(edges, nodes)
        got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: i for i in range(5)}


def test_zero_round_cap_returns_singletons_with_warning(spark):
    nodes, edges = _path_graph(spark, 4)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(edges, nodes, max_iters=0).collect()
        }
    assert got == {i: i for i in range(4)}
    assert any("cap" in str(w.message) for w in caught)
