"""Deterministic Lloyd iterations for the IVF codebook (exact on
hand-computable inputs; the sf-scale query ivf_train_cells takes the
driver's rows-only check)."""
from pdfi_spark.ops.similarity import _ivf_assign, kmeans_codebook


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_one_lloyd_iteration_exact_means(spark):
    emb = _emb_df(spark, [
        (0, [1.0, 0.0]),    # centroid 0 init
        (1, [0.0, 1.0]),    # centroid 1 init
        (2, [1.0, 0.1]),
        (3, [0.1, 1.0]),
        (4, [1.0, -0.1]),
    ])
    cent = {r["centroid_id"]: r["cvec"] for r in
            kmeans_codebook(emb, n=2, iters=1).collect()}
    # cell 0 = {v0, v2, v4} -> mean [1.0, 0.0]; cell 1 = {v1, v3} -> [0.05, 1.0]
    assert [round(x, 6) for x in cent[0]] == [1.0, 0.0]
    assert [round(x, 6) for x in cent[1]] == [0.05, 1.0]


def test_semdedup_removes_within_cell_neardups_keeps_lowest_id(spark):
    from pdfi_spark.ops.similarity import _semdedup_from

    emb = _emb_df(spark, [
        (0, [1.0, 0.0]),     # centroid 0 init
        (1, [0.0, 1.0]),     # centroid 1 init
        (2, [1.0, 0.01]),    # near-dup of v0 (cos ~0.99995) — removed
        (3, [0.01, 1.0]),    # near-dup of v1 — removed
        (4, [0.6, -0.8]),    # lands in cell 0 but cos(v0,v4)=0.6 — kept
    ])
    out = {r["vec_id"]: r["kept"]
           for r in _semdedup_from(emb, iters=1, tau=0.9, n=2).collect()}
    assert out == {0: True, 1: True, 2: False, 3: False, 4: True}


def test_trained_codebook_reassigns_all_vectors(spark):
    emb = _emb_df(spark, [
        (0, [1.0, 0.0]), (1, [0.0, 1.0]),
        (2, [0.9, 0.2]), (3, [0.2, 0.9]), (4, [-1.0, 0.05]),
    ])
    codebook = kmeans_codebook(emb, n=2, iters=2)
    assigned = _ivf_assign(emb, centroids=codebook)
    cells = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert len(cells) == 5
    assert cells[0] == cells[2] and cells[1] == cells[3]
