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


def test_minhash128_sketch_behavior(spark):
    """Sketch-quality sanity for the production-scale 128-perm MinHash:
    identical docs collide on every band, a 1-word-in-50 edit (Jaccard
    ~0.96, above the 16x8 s-curve threshold ~0.71) still shares
    bucket(s), and disjoint-vocabulary docs share none."""
    from pdfi_spark.ops.dedup import (
        MINHASH128_BANDS,
        MINHASH128_PERMS,
        _minhash128_sig,
    )

    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(("CHANGED" if i == 17 else f"w{i}") for i in range(50))
    far = " ".join(f"z{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sig = {r["doc_id"]: r["sig"] for r in _minhash128_sig(docs).collect()}
    assert all(len(s) == MINHASH128_PERMS for s in sig.values())
    assert sig[0] == sig[1]  # identical text -> identical signature
    agree_near = sum(a == b for a, b in zip(sig[0], sig[2]))
    agree_far = sum(a == b for a, b in zip(sig[0], sig[3]))
    # E[agree] = J * 128: ~125 for the near pair, ~0 for disjoint vocab
    assert agree_near > 100, agree_near
    assert agree_far < 10, agree_far

    def bands(s):
        return {
            tuple(s[b * 8:(b + 1) * 8]) for b in range(MINHASH128_BANDS)
        }

    assert bands(sig[0]) & bands(sig[2])  # near-dup: candidate pair
    assert not (bands(sig[0]) & bands(sig[3]))  # unrelated: no collision


def test_minhash128_numpy_fold_matches_hof_fold(spark):
    """The vectorized numpy fold (the default _minhash128_sig) and the
    Catalyst-HOF fold are the SAME function: lane-for-lane identical on
    awkward inputs — empty string, repeated/duplicate words, consecutive
    spaces (split(' ') emits empty-string words), non-ASCII (md5 over
    UTF-8 bytes), and a single-word doc."""
    from pdfi_spark.ops.dedup import _minhash128_sig_hof, _minhash128_sig_np

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "one"),
            (2, "a a b b a"),
            (3, "x  y   z"),   # consecutive spaces -> empty-string words
            (4, "héllo wörld ünïcode"),
            (5, " ".join(f"w{i}" for i in range(200))),
        ],
        "doc_id long, text string",
    )
    hof = {r["doc_id"]: list(r["sig"])
           for r in _minhash128_sig_hof(docs).collect()}
    np_ = {r["doc_id"]: list(r["sig"])
           for r in _minhash128_sig_np(docs).collect()}
    assert hof == np_
