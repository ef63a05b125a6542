"""Deduplication operators: exact, MinHash(+LSH banding), SimHash, n-gram
Jaccard. All JVM-side (explode/groupBy/higher-order functions); hashes are
md5-derived so the DuckDB oracles can reproduce them bit-for-bit.

Scale notes (100 TB): every operator below is a single shuffle on its
grouping key (doc key, band bucket, or word). MinHash/SimHash shuffle
exploded words — at 10^12 docs use `spark.sql.shuffle.partitions` sized to
keep ~128MB per partition, and AQE handles stragglers; the band-bucket
join output is the only potentially skewed stage (popular buckets), which
AQE skew-join splitting covers.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MINHASH_SEEDS = ["#1", "#2", "#3", "#4"]
SIMHASH_BITS = 32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _hash32(col):
    """First 8 hex digits of md5 as an unsigned 32-bit value in a long —
    reproducible in DuckDB as ('0x' || substr(md5(x),1,8))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 5-word prefix key: one hash-aggregate shuffle."""
    docs = _docs(spark, sf_dir)
    key = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 5))
    return (
        docs.select(key.alias("dedup_key"), "doc_id")
        .groupBy("dedup_key")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_id"))
    )


def _doc_words(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-permutation MinHash over the distinct word set of each document,
    computed as a NARROW per-row map: array_distinct for the word set,
    array_min over a transform for each permutation. NO explode and NO
    shuffle — the signature never leaves the row (an explode+groupBy
    formulation shuffles one row per word: a 10^15-row exchange at 10^12
    docs; this plan exchanges nothing)."""
    docs = _docs(spark, sf_dir)
    words = F.array_distinct(F.split("text", " "))

    def perm_min(seed: str):
        # single-arg lambda from a closure: a two-arg lambda would be
        # treated by transform() as (element, index)
        return F.array_min(
            F.transform(words, lambda w: _hash32(F.concat(w, F.lit(seed))))
        )

    cols = [perm_min(seed).alias(f"h{i + 1}") for i, seed in enumerate(MINHASH_SEEDS)]
    return docs.select("doc_id", *cols)


def minhash_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding of the MinHash signature: band1=(h1,h2), band2=(h3,h4);
    bucket sizes per band — near-duplicate candidates share a bucket."""
    sig = minhash_signatures(spark, sf_dir)
    b1 = sig.select(F.lit(1).alias("band"), F.concat_ws(":", "h1", "h2").alias("bucket"))
    b2 = sig.select(F.lit(2).alias("band"), F.concat_ws(":", "h3", "h4").alias("bucket"))
    return b1.unionAll(b2).groupBy("band", "bucket").agg(F.count("*").alias("n_docs"))


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash with word-frequency weights, computed as a NARROW
    per-row fold: hash each word once (transform), accumulate the 32
    per-bit +-1 counts with aggregate/zip_with, recombine sign bits —
    all inside the row, no explode shuffle (same 10^15-row-exchange
    argument as minhash_signatures)."""
    docs = _docs(spark, sf_dir)
    hashes = F.transform(F.split("text", " "), lambda w: _hash32(w))
    bit_counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                # shiftright needs a literal shift, so test bit b with a
                # column bitmask 2^b instead (exact: b <= 31)
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                lambda b: F.when(
                    h.bitwiseAND(
                        F.pow(F.lit(2.0), b.cast("double")).cast("long")
                    ) != 0,
                    F.lit(1),
                ).otherwise(F.lit(-1)).cast("long"),
            ),
            lambda a, d: a + d,
        ),
    )
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    sim = F.aggregate(
        F.zip_with(
            bit_counts, powers,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select("doc_id", sim.alias("simhash"))


def _shingles(col="text", n=3):
    """Distinct word n-gram shingles as an array<string> expression."""
    words = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


JACCARD_THRESHOLD = 0.5
CC_MAX_ITERS = 20
# LSH buckets larger than this are dropped before pairing: a bucket
# holding a large fraction of the corpus means that band carries no
# near-dup signal (tiny shared vocab / stop-signature collisions), and
# its B^2 pair blowup is pure waste — every production dedup pipeline
# caps or re-bands such buckets. True near-dup clusters are far smaller.
MAX_LSH_BUCKET = 64


def _lsh_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, bucket, doc_id) membership rows — the joinable form of
    minhash_lsh_buckets."""
    sig = minhash_signatures(spark, sf_dir)
    b1 = sig.select(
        F.lit(1).alias("band"), F.concat_ws(":", "h1", "h2").alias("bucket"), "doc_id"
    )
    b2 = sig.select(
        F.lit(2).alias("band"), F.concat_ws(":", "h3", "h4").alias("bucket"), "doc_id"
    )
    return b1.unionAll(b2)


def candidate_pairs(spark: SparkSession, sf_dir: str,
                    max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """Near-dup candidate pairs = docs sharing an LSH band bucket
    (doc_a < doc_b, distinct across bands). The self-join is keyed on
    (band, bucket), so its cost is sum(bucket_size^2) — the whole point
    of LSH banding vs the all-pairs cross join. Buckets larger than
    ``max_bucket`` are dropped first (see MAX_LSH_BUCKET — this is an
    explicit coverage cap, mirrored in the DuckDB oracle, not a silent
    one); residual moderate-bucket skew is AQE skew-join territory."""
    from pyspark.sql import Window

    members = _lsh_members(spark, sf_dir).withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bucket"))
    ).filter(F.col("bucket_n") <= max_bucket).drop("bucket_n")
    a = members.alias("a")
    b = members.alias("b")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """Hash-min label propagation: every node's label converges to the
    smallest doc_id in its component. Each iteration is one join + one
    aggregate (both on doc_id); lineage is cut per iteration with
    localCheckpoint so plans stay flat. Iterations ~ component diameter
    (near-dup clusters are shallow); at 10^12-doc scale swap the loop
    body for the large-star/small-star variant, which is the same joins
    with an extra degree test.

    Convergence is detected for free: labels only ever DECREASE under
    min-propagation, so sum(cluster_id) is a fixpoint witness — it is
    collected as an observed metric on the checkpoint job itself, so each
    iteration costs exactly one Spark job (no compare-join, no extra
    action).

    edges: (u, v) directed both ways; nodes: (doc_id). Returns
    (doc_id, cluster_id)."""
    from pyspark.sql import Observation

    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = None
    for i in range(max_iters):
        msgs = (
            edges.join(labels, edges["v"] == labels["doc_id"])
            .select(edges["u"].alias("doc_id"), "cluster_id")
        )
        obs = Observation(f"cc_iter_{i}")
        new_labels = (
            labels.unionAll(msgs)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .observe(obs, F.sum("cluster_id").alias("label_sum"))
            .localCheckpoint(eager=True)
        )
        label_sum = obs.get["label_sum"]
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data dedup path: LSH candidate pairs -> word-3-gram
    Jaccard verification (>= 0.5) -> connected components -> keep-list.
    Every doc gets a cluster_id (= smallest doc_id in its near-dup
    component; singletons map to themselves) and is_keeper marks the one
    row per cluster a pipeline would retain."""
    docs = _docs(spark, sf_dir)
    pairs = candidate_pairs(spark, sf_dir)
    sh = (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", _shingles().alias("shingles"))
    )
    verified = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"),
                             F.col("shingles").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"),
                        F.col("shingles").alias("sh_b")), "doc_b")
        .where(
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b"))
            >= JACCARD_THRESHOLD
        )
        .select("doc_a", "doc_b")
    )
    edges = verified.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(
        verified.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    labels = connected_components(edges, docs.select("doc_id"))
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_keeper"),
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard stats between consecutive doc_ids (a linear
    candidate chain keeps this a broadcast-able self-join at test scale;
    the production bucket->pair->verify->cluster path is materialized in
    ``dedup_clusters`` above)."""
    docs = _docs(spark, sf_dir).filter(F.size(F.split("text", " ")) >= 3)
    sh = docs.select("doc_id", _shingles().alias("shingles"))
    right = sh.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("shingles").alias("shingles_b")
    )
    joined = sh.join(right, "doc_id")
    return joined.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + 1).alias("doc_b"),
        F.size(F.array_intersect("shingles", "shingles_b")).alias("n_intersect"),
        F.size(F.array_union("shingles", "shingles_b")).alias("n_union"),
    )
