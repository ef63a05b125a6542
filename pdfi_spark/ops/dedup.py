"""Deduplication operators: exact, MinHash(+LSH banding), SimHash, n-gram
Jaccard, and the end-to-end LSH -> verify -> connected-components keep-list.
All JVM-side (higher-order functions / groupBy); hashes are md5-derived so
the DuckDB oracles can reproduce them bit-for-bit, and each word is hashed
exactly ONCE per operator (the md5 digest's four 32-bit lanes supply the
MinHash permutations).

Scale notes (100 TB): MinHash/SimHash are ZERO-exchange narrow per-row
folds (the signature never leaves the row); dedup_exact and LSH banding
are a single shuffle on their grouping key. The band-bucket pair join is
the only potentially skewed stage (popular buckets) — buckets are capped
at MAX_LSH_BUCKET first, and residual moderate skew is AQE skew-join
territory. Connected components uses the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond"), which converges in O(log n) rounds even on long-chain
components.
"""
from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._scan import read_parquet_fanned

MINHASH_PERMS = 4
# hex-digit start offsets (1-based) of the four 32-bit lanes of one md5
MINHASH_LANE_OFFSETS = [1 + 8 * i for i in range(MINHASH_PERMS)]
SIMHASH_BITS = 32

# --- production-scale MinHash: 128 permutations from the SAME one md5 ---
# GPT-3/Gopher-style near-dup dedup runs ~128 permutations in ~9-16 bands
# for usable precision/recall at a ~0.8 Jaccard bar; the 4-perm sketch
# above is the didactic core. 16 bands x 8 rows puts the LSH s-curve
# threshold at (1/16)^(1/8) ~= 0.71.
MINHASH128_PERMS = 128
MINHASH128_BANDS = 16
MINHASH128_ROWS = 8
MINHASH128_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def _minhash128_params() -> list[tuple[int, int, int]]:
    """(a, b, lane) per permutation: universal-hash coefficients over
    Z_P applied to one of the four 32-bit md5 lanes — still exactly ONE
    md5 call per distinct word; the other 127 "hash functions" are two
    integer ops each. a*h < P * 2^32 < 2^63, so the arithmetic is exact
    in signed 64-bit on BOTH engines (no overflow; ANSI-safe).
    Deterministic seed => the DuckDB twin regenerates identical
    coefficients from this same function."""
    rng = random.Random(0x5EED128)
    return [
        (rng.randrange(1, MINHASH128_P), rng.randrange(0, MINHASH128_P),
         i % MINHASH_PERMS)
        for i in range(MINHASH128_PERMS)
    ]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_fanned(spark, f"{sf_dir}/documents.parquet")


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
    computed as a NARROW per-row map with ONE md5 per distinct word: the
    128-bit digest is sliced into four independent 32-bit lanes (hex
    digits [8i, 8i+8)), so the k "permutations" cost substrings, not k
    hash invocations — at 100 TB the hash calls are the dominant CPU term
    of this operator, and this is a straight 4x cut. The digest transform
    is the aggregate's INPUT (evaluated once per word); the four running
    minima accumulate in a single fold; h1..h4 are projected from the
    result array in a SEPARATE select, which Catalyst keeps separate
    because CollapseProject refuses to duplicate non-cheap producer
    expressions. NO explode and NO shuffle — the signature never leaves
    the row (an explode+groupBy formulation shuffles one row per word: a
    10^15-row exchange at 10^12 docs; this plan exchanges nothing).
    Single-evaluation + zero-exchange are both asserted in
    tests/test_plans.py."""
    docs = _docs(spark, sf_dir)
    words = F.array_distinct(F.split("text", " "))
    digests = F.transform(words, lambda w: F.md5(w))
    offsets = F.array(*[F.lit(o) for o in MINHASH_LANE_OFFSETS])
    init = F.array_repeat(F.lit(1 << 32).cast("long"), MINHASH_PERMS)
    mins = F.aggregate(
        digests,
        init,
        lambda acc, hx: F.zip_with(
            acc,
            offsets,
            lambda m, off: F.least(
                m, F.conv(hx.substr(off, F.lit(8)), 16, 10).cast("long")
            ),
        ),
    )
    sig = docs.select("doc_id", mins.alias("sig"))
    return sig.select(
        "doc_id",
        *[
            F.element_at("sig", i + 1).alias(f"h{i + 1}")
            for i in range(MINHASH_PERMS)
        ],
    )


def minhash_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding of the MinHash signature: band1=(h1,h2), band2=(h3,h4);
    bucket sizes per band — near-duplicate candidates share a bucket."""
    return (
        _lsh_members(spark, sf_dir)
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"))
    )


def _minhash128_sig_hof(docs: DataFrame) -> DataFrame:
    """(doc_id, sig: array<long>[128]) — the 128-permutation signature as
    a NARROW zero-exchange per-row fold, still ONE md5 per distinct word:
    the nested transform materializes each word's digest once and slices
    it into the four 32-bit base lanes; the fold then runs all 128
    universal-hash lanes ((a*h+b) mod P over the lane picked per
    permutation) as a zip_with against a LITERAL params array (built once
    at plan time). Per word that is 1 hash + ~384 integer ops — the hash
    stays the dominant CPU term, so 32x more permutations than
    minhash_signatures costs far less than 32x. The signature never
    leaves the row (no explode shuffle: the same 10^15-row-exchange
    argument as minhash_signatures); the fold output is projected in a
    SEPARATE select, which Catalyst keeps separate because
    CollapseProject refuses to duplicate non-cheap producer
    expressions. Single-evaluation is asserted in tests/test_plans.py."""
    words = F.array_distinct(F.split("text", " "))
    lanes = F.transform(
        F.transform(words, F.md5),
        lambda hx: F.array(*[
            F.conv(hx.substr(off, 8), 16, 10).cast("long")
            for off in MINHASH_LANE_OFFSETS
        ]),
    )
    params = F.array(*[
        F.struct(
            F.lit(a).cast("long").alias("a"),
            F.lit(b).cast("long").alias("b"),
            F.lit(lane + 1).alias("li"),
        )
        for a, b, lane in _minhash128_params()
    ])
    init = F.array_repeat(
        F.lit(MINHASH128_P).cast("long"), MINHASH128_PERMS
    )
    mins = F.aggregate(
        lanes,
        init,
        lambda acc, lv: F.zip_with(
            acc,
            params,
            lambda m, p: F.least(
                m,
                (p["a"] * F.element_at(lv, p["li"]) + p["b"])
                % F.lit(MINHASH128_P).cast("long"),
            ),
        ),
    )
    return docs.select("doc_id", mins.alias("sig"))


def _minhash128_artifacts(docs: DataFrame, with_words: bool = False,
                          with_shingles: bool = False,
                          shingle_n: int = 3) -> DataFrame:
    """ONE fused Arrow pass producing every per-doc artifact the sketch
    family needs: the 128-lane signature (always), and optionally the
    distinct word set (`words`, for true-Jaccard audits) and the
    distinct n-gram shingles (`shingles`, for pair verification).

    Signature math is the bit-identical numpy twin of the HOF fold in
    ``_minhash128_sig_hof``: Catalyst higher-order functions never
    enter whole-stage codegen (every lambda element is interpreted, so
    the 128-lane fold costs ~8x the 4-lane op for 32x the permutations
    — measured; CLAUDE.md). Here all words of an Arrow batch are hashed
    in one hashlib loop (one md5 per distinct word), digests framed as
    a (W,4) big-endian uint32 lane matrix (exactly the hex substrings
    at offsets 1/9/17/25), expanded to (W,128) by column gather, and
    segment-reduced per doc with np.minimum.reduceat; a_i*h+b_i < 2^63
    stays exact in int64 (same ANSI-safety argument as the JVM side).

    The optional columns exist so downstream consumers scan the corpus
    ONCE: dedup_clusters_128 previously ran a second scan+fold for
    shingles, and the estimator audit a third for word sets — at 100 TB
    each extra pass is a full read of the corpus. `shingles` matches
    ops.dedup._shingles (n-grams over the RAW word sequence, first-
    occurrence dedup; consumers only take intersect/union sizes, which
    are order-insensitive). Still a NARROW zero-exchange map — scan
    pruned to doc_id+text -> mapInPandas (asserted in test_plans)."""
    import numpy as np
    import pandas as pd

    params = _minhash128_params()
    a_np = [p[0] for p in params]
    b_np = [p[1] for p in params]
    idx_np = [p[2] for p in params]

    def fold(iterator):
        import hashlib

        A = np.asarray(a_np, dtype=np.int64)
        B = np.asarray(b_np, dtype=np.int64)
        IDX = np.asarray(idx_np, dtype=np.int64)
        P = np.int64(MINHASH128_P)
        md5 = hashlib.md5
        for batch in iterator:
            raw_per_doc = [str(t).split(" ") for t in batch["text"]]
            words_per_doc = [
                list(dict.fromkeys(ws)) for ws in raw_per_doc
            ]
            counts = np.asarray([len(w) for w in words_per_doc])
            # hash each BATCH-distinct word once and gather: real corpora
            # share vocabulary across documents, so the md5 calls and the
            # (a*h+b) mod P lane expansion both collapse from
            # sum(per-doc distinct words) rows to batch-vocabulary rows —
            # per-word results are identical, so signatures are
            # bit-for-bit unchanged (pinned against the HOF fold in
            # test_dedup_clusters.py)
            vocab: dict[str, int] = {}
            setdefault = vocab.setdefault
            widx = [
                setdefault(w, len(vocab))
                for ws in words_per_doc for w in ws
            ]
            digests = b"".join(
                md5(w.encode("utf-8")).digest() for w in vocab
            )
            # digest bytes [4i,4i+4) big-endian == hex[8i:8i+8] parsed
            lanes = np.frombuffer(digests, dtype=">u4").reshape(-1, 4)
            vals_u = (lanes.astype(np.int64)[:, IDX] * A + B) % P
            vals = vals_u[np.asarray(widx, dtype=np.int64)]
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            mins = np.minimum.reduceat(vals, starts, axis=0)
            out = {"doc_id": batch["doc_id"], "sig": list(mins)}
            if with_words:
                out["words"] = words_per_doc
            if with_shingles:
                out["shingles"] = [
                    list(dict.fromkeys(
                        " ".join(ws[i:i + shingle_n])
                        for i in range(len(ws) - shingle_n + 1)
                    ))
                    for ws in raw_per_doc
                ]
            yield pd.DataFrame(out)

    schema = "doc_id long, sig array<long>"
    if with_words:
        schema += ", words array<string>"
    if with_shingles:
        schema += ", shingles array<string>"
    return docs.select("doc_id", "text").mapInPandas(fold, schema=schema)


def _minhash128_sig_np(docs: DataFrame) -> DataFrame:
    """Signature-only view of the fused artifacts pass (the default
    _minhash128_sig)."""
    return _minhash128_artifacts(docs)


# default signature path: the vectorized variant (bit-identical to the
# HOF fold — tests/test_dedup_clusters.py compares them lane-for-lane;
# tools/bench_minhash_udf.py holds the measured ratio)
_minhash128_sig = _minhash128_sig_np


def minhash128_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest view of the 128-perm signature: (doc_id, sig_md5) where
    sig_md5 = md5 of the comma-joined lane minima — 2 columns instead of
    128, but the value hash still pins every lane bit-for-bit against
    the DuckDB twin."""
    sig = _minhash128_sig(_docs(spark, sf_dir))
    joined = F.concat_ws(
        ",", F.transform("sig", lambda x: x.cast("string"))
    )
    return sig.select("doc_id", F.md5(joined).alias("sig_md5"))


def _minhash128_bands():
    """Literal 16-struct array expression over column ``sig``: per band,
    (band, bucket=md5 of the band's comma-joined 8 lanes)."""
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws(",", F.transform(
                F.slice("sig", b * MINHASH128_ROWS + 1, MINHASH128_ROWS),
                lambda x: x.cast("string"),
            ))).alias("bucket"),
        )
        for b in range(MINHASH128_BANDS)
    ])


def _lsh128_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, bucket, doc_id) membership rows of the 128-perm sketch.
    The signature is localCheckpoint'ed before banding for the same
    subtree-reuse reason as _lsh_members: downstream self-joins would
    otherwise re-run the 128-lane fold per join side."""
    sig = _minhash128_sig(_docs(spark, sf_dir)).localCheckpoint(eager=True)
    return (
        sig.select("doc_id", F.explode(_minhash128_bands()).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )


def minhash128_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding of the 128-perm signature: 16 bands x 8 rows, bucket
    key = md5 of the band's comma-joined lanes. One groupBy shuffle on
    (band, bucket) — the banding explode multiplies rows 16x but each
    row is ~50 bytes, and at 10^12 docs the exchange is keyed and
    combiner-friendly (map-side partial counts)."""
    sig = _minhash128_sig(_docs(spark, sf_dir))
    return (
        sig.select("doc_id", F.explode(_minhash128_bands()).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"))
    )


def minhash128_jaccard_estimates(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The estimator the sketch exists for: for every 16-band candidate
    pair, the MinHash Jaccard estimate (fraction of agreeing lanes,
    E[est] = J) next to the TRUE word-set Jaccard — the per-pair error
    a production pipeline monitors when tuning bands/rows. Signature
    agreement is a zip_with+filter over the two checkpointed 128-lane
    arrays (never a re-fold); true Jaccard is array_intersect/union on
    distinct word sets. Everything downstream of the capped candidate
    join is narrow. The fused artifacts pass emits signature AND word
    set together (the corpus is scanned once, not twice), so each pair
    side is a single join against the checkpointed artifacts instead of
    two."""
    art = _minhash128_artifacts(
        _docs(spark, sf_dir), with_words=True
    ).localCheckpoint(eager=True)
    members = (
        art.select("doc_id", F.explode(_minhash128_bands()).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )
    pairs = _pairs_from_members(members)
    est = (
        pairs
        .join(art.select(F.col("doc_id").alias("doc_a"),
                         F.col("sig").alias("sig_a"),
                         F.col("words").alias("ws_a")), "doc_a")
        .join(art.select(F.col("doc_id").alias("doc_b"),
                         F.col("sig").alias("sig_b"),
                         F.col("words").alias("ws_b")), "doc_b")
    )
    agree = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
        lambda x: x,
    ))
    return est.select(
        "doc_a",
        "doc_b",
        F.round(agree.cast("double") / F.lit(float(MINHASH128_PERMS)), 6)
        .alias("est_jaccard"),
        F.round(
            F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
            / F.size(F.array_union("ws_a", "ws_b")),
            6,
        ).alias("true_jaccard"),
    )


def _simhash_np(docs: DataFrame) -> DataFrame:
    """Vectorized numpy twin of the HOF SimHash fold (the default —
    same precedent as _minhash128_sig_np: Catalyst HOF lambdas are
    interpreted per element, so the 32-lane zip_with costs ~32
    interpreter steps per WORD; here a batch's distinct words hash once
    each, the +-1 bit matrix expands once per distinct word, and the
    per-doc accumulation is one np.add.reduceat). All-integer math in
    the identical bit layout (first 4 md5 bytes big-endian == the
    conv(substr(md5,1,8)) lane), so the result is bit-identical to the
    HOF fold — pinned lane-for-lane in tests/test_dedup_clusters.py."""
    import numpy as np
    import pandas as pd

    def fold(iterator):
        import hashlib

        md5 = hashlib.md5
        powers = 1 << np.arange(SIMHASH_BITS, dtype=np.int64)
        shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
        for batch in iterator:
            words_per_doc = [str(t).split(" ") for t in batch["text"]]
            counts = np.asarray([len(ws) for ws in words_per_doc])
            vocab: dict[str, int] = {}
            setdefault = vocab.setdefault
            widx = [
                setdefault(w, len(vocab))
                for ws in words_per_doc for w in ws
            ]
            digests = b"".join(
                md5(w.encode("utf-8")).digest()[:4] for w in vocab
            )
            h = np.frombuffer(digests, dtype=">u4").astype(np.int64)
            # (vocab, 32) of +-1: bit b set -> +1 else -1
            bits = (((h[:, None] >> shifts) & 1) * 2 - 1)
            vals = bits[np.asarray(widx, dtype=np.int64)]
            starts = np.zeros(len(counts), dtype=np.int64)
            np.cumsum(counts[:-1], out=starts[1:])
            acc = np.add.reduceat(vals, starts, axis=0)
            sim = ((acc > 0) * powers).sum(axis=1)
            yield pd.DataFrame({"doc_id": batch["doc_id"], "simhash": sim})

    return docs.select("doc_id", "text").mapInPandas(
        fold, schema="doc_id long, simhash long"
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash with word-frequency weights — vectorized numpy
    default (see _simhash_np); the Catalyst-HOF fold below remains as
    the cross-check twin."""
    return _simhash_np(_docs(spark, sf_dir))


def _simhash_hof(docs: DataFrame) -> DataFrame:
    """32-bit SimHash as a NARROW per-row Catalyst fold: hash each word
    once (transform), accumulate the 32 per-bit +-1 counts with
    aggregate/zip_with, recombine sign bits — all inside the row, no
    explode shuffle (same 10^15-row-exchange argument as
    minhash_signatures). Kept as the JVM cross-check for _simhash_np."""
    hashes = F.transform(F.split("text", " "), lambda w: _hash32(w))
    # bit masks as a LITERAL array: the old sequence+pow formulation
    # recomputed pow(2.0, b) per word per bit — 32 pow calls/word of pure
    # waste; a literal array is built once at plan time
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(SIMHASH_BITS)])
    bit_counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda mask: F.when(h.bitwiseAND(mask) != 0, F.lit(1))
                .otherwise(F.lit(-1))
                .cast("long"),
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


SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 8
SIMHASH_HAM_THRESHOLD = 3


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing at the 100 TB shape: the 32-bit signature
    is banded into four 8-bit keys — by pigeonhole, any pair within
    hamming distance 3 agrees exactly on at least one band — candidates
    bucket-join on (band, key) (sum(bucket^2), never N^2), and the exact
    hamming check is bit_count(xor), all whole-stage codegen. The
    four-way union of literal shifts keeps shiftright on a literal (a
    per-row band column would force a non-codegen path).

    The signature table is localCheckpoint'ed first: it is referenced by
    4 union branches on each of 2 join sides, and Catalyst does not share
    subtrees across union branches — without materialization the
    per-word SimHash fold (the operator's dominant CPU term) would
    execute 8x. At production scale signatures are materialized to a
    table for exactly the same reason (they are 16 bytes/doc)."""
    sig = simhash(spark, sf_dir).localCheckpoint(eager=True)
    parts = [
        sig.select(
            F.lit(i).alias("band"),
            F.shiftright("simhash", SIMHASH_BAND_BITS * i)
            .bitwiseAND(F.lit((1 << SIMHASH_BAND_BITS) - 1))
            .alias("key"),
            "doc_id",
            F.col("simhash").alias("s"),
        )
        for i in range(SIMHASH_BANDS)
    ]
    members = parts[0]
    for p in parts[1:]:
        members = members.unionAll(p)
    a = members.select(
        "band", "key", F.col("doc_id").alias("doc_a"), F.col("s").alias("sa")
    )
    b = members.select(
        "band", "key", F.col("doc_id").alias("doc_b"), F.col("s").alias("sb")
    )
    return (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= SIMHASH_HAM_THRESHOLD)
    )


def _shingles(col="text", n=3):
    """Distinct word n-gram shingles as an array<string> expression
    (Catalyst-HOF form; callers must pre-filter docs with >= n words).
    Kept as the JVM cross-check / expression-level consumer form —
    the scan-level builder below is the vectorized default."""
    words = F.split(col, " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def _shingles_df(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles): distinct word n-gram shingles built in
    Python per Arrow batch — the same first-occurrence-distinct set as
    the _shingles HOF expression (pinned element-for-element in
    tests/test_dedup_clusters.py), without the per-window interpreted
    concat_ws/slice lambdas (the HOF fold never enters whole-stage
    codegen; one Python join per window is measurably cheaper). Callers
    must pre-filter docs with >= n words, exactly like _shingles."""
    import pandas as pd

    def fold(iterator):
        for batch in iterator:
            sh = [
                list(dict.fromkeys(
                    " ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)
                ))
                for ws in (str(t).split(" ") for t in batch["text"])
            ]
            yield pd.DataFrame({"doc_id": batch["doc_id"], "shingles": sh})

    return docs.select("doc_id", "text").mapInPandas(
        fold, schema="doc_id long, shingles array<string>"
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
    minhash_lsh_buckets.

    Signatures are localCheckpoint'ed first: the two band branches (and,
    in candidate_pairs, the two self-join sides on top of them) are
    separate subtrees to Catalyst, so without materialization the
    per-word MinHash fold — the operator's dominant CPU term — would
    re-execute up to 4x. Signatures are 5 longs/doc; at production scale
    they'd be written to a table for the same reason."""
    sig = minhash_signatures(spark, sf_dir).localCheckpoint(eager=True)
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
    return _pairs_from_members(_lsh_members(spark, sf_dir), max_bucket)


def _pairs_from_members(members: DataFrame,
                        max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """(band, bucket, doc_id) membership rows -> distinct candidate
    pairs, with oversized buckets capped first (see candidate_pairs).

    Shape: ONE keyed aggregate collects each bucket's member list, the
    cap filter drops oversized buckets, and the <= C(max_bucket, 2)
    pairs per bucket generate IN-ROW (sorted doc list -> i<j
    combinations) — replacing the old count-window + keyed SELF-JOIN,
    which shuffled the membership twice (Catalyst re-plans the windowed
    subtree per join side) and re-sorted both sides. Same exchange
    bytes (the member lists), one fewer shuffle + no join, identical
    pair set: within a (band, bucket) every doc_id is distinct, so
    sorted i<j combinations == the join's doc_a < doc_b condition; the
    final distinct() still dedupes across bands."""
    ids = F.array_sort(F.collect_list("doc_id"))
    grouped = (
        members.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") <= max_bucket)
    )
    pairs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    exploded = (
        grouped.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
    )
    # candidate pairs are BYTES-tiny (16 B/row) but every pair pays real
    # array math downstream (shingle Jaccard / 128-lane agreement), so
    # size-based AQE coalescing would funnel the verify stage onto one
    # or two cores. Spreading and dedup FUSE into one exchange: the
    # explicit hash repartition on the pair key (pinned partition count
    # — AQE leaves it alone) satisfies the distinct's partitioning
    # requirement, so the aggregate runs in place with no second
    # shuffle; the exchange moves only id pairs, a rounding error next
    # to the artifact joins.
    sc = exploded.sparkSession.sparkContext
    return exploded.repartition(
        sc.defaultParallelism, "doc_a", "doc_b"
    ).distinct()


def _large_star(sym: DataFrame) -> DataFrame:
    """Large-star step over the SYMMETRIC edge list: for each node u with
    m(u) = min(Gamma(u) + {u}), attach every strictly-larger neighbor v
    to m(u). Output is directed (child, parent) with parent < child."""
    m = (
        sym.groupBy("u").agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    # no dedup here: duplicate (child, m) rows cannot change any
    # downstream min/relink (small_star's final distinct restores the
    # set property each round, so rounds stay bounded), and the join
    # output multiset is deterministic so the convergence witness still
    # observes a stable fixpoint — dropping the exchange saves one
    # shuffle per CC round
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(directed: DataFrame) -> DataFrame:
    """Small-star step over directed (child, parent) edges (parent <
    child): for each child u with parent set P(u), m = min(P(u)); relink
    every other parent to m and keep (u, m)."""
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        directed.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    keep = m.select("u", F.col("m").alias("v"))
    return relink.unionAll(keep).distinct()


def connected_components(edges: DataFrame, nodes: DataFrame,
                         max_iters: int = CC_MAX_ITERS) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    each round is two groupBy-min + join passes, and the edge set
    converges to a forest of stars centered at each component's minimum
    node in O(log n) rounds — including on adversarial long-chain
    components, where plain hash-min label propagation needs O(diameter)
    rounds (both pinned in tests/test_dedup_cc.py). Lineage is cut per
    round with localCheckpoint so plans stay flat.

    Convergence is detected for free on the checkpoint job itself via an
    Observation: the star steps are deterministic, so an unchanged edge
    multiset is a fixpoint. The multiset is witnessed by exact aggregates
    (count, sum(u), sum(v), and a bit-mixed xxhash64 checksum); the sums
    use try_sum, so a (theoretical, 10^12-scale) overflow yields NULL,
    which is treated as "not converged" — the loop then just runs more
    rounds, never falsely stops.

    If the round cap is hit before the fixpoint is observed, a
    UserWarning is raised (labels may be truncated mid-merge) rather than
    returning silently.

    edges: (u, v) directed both ways; nodes: (doc_id). Returns
    (doc_id, cluster_id) where cluster_id = the smallest doc_id in the
    node's component (singletons map to themselves)."""
    import warnings

    from pyspark.sql import Observation

    directed: DataFrame | None = None
    prev: tuple | None = None
    converged = False
    for i in range(max_iters):
        if directed is None:
            sym = edges.select("u", "v")
        else:
            sym = directed.unionAll(
                directed.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
        obs = Observation(f"cc_round_{i}")
        stepped = (
            _small_star(_large_star(sym))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.try_sum("u").alias("su"),
                F.try_sum("v").alias("sv"),
                F.try_sum(F.shiftright(F.xxhash64("u", "v"), 8)).alias("ck"),
            )
            .localCheckpoint(eager=True)
        )
        got = obs.get
        cur = (got["n"], got["su"], got["sv"], got["ck"])
        directed = stepped
        if cur[0] == 0 or (cur == prev and all(x is not None for x in cur)):
            converged = True
            break
        prev = cur
    if not converged:
        warnings.warn(
            f"connected_components hit the {max_iters}-round cap before "
            "the star-forest fixpoint was observed; labels may be "
            "truncated mid-merge",
            stacklevel=2,
        )
    if directed is None:  # max_iters <= 0: no rounds ran, all singletons
        return nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    parents = directed.groupBy("u").agg(F.min("v").alias("parent"))
    return (
        nodes.join(parents, nodes["doc_id"] == parents["u"], "left")
        .select(
            "doc_id",
            F.coalesce("parent", F.col("doc_id")).alias("cluster_id"),
        )
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data dedup path: LSH candidate pairs -> word-3-gram
    Jaccard verification (>= 0.5) -> connected components -> keep-list.
    Every doc gets a cluster_id (= smallest doc_id in its near-dup
    component; singletons map to themselves) and is_keeper marks the one
    row per cluster a pipeline would retain."""
    return _dedup_clusters_from(spark, sf_dir,
                                candidate_pairs(spark, sf_dir))


def dedup_clusters_128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup path fed by the PRODUCTION 128-permutation
    sketch: 16-band LSH candidates (s-curve ~0.71) -> the same capped
    buckets, Jaccard verification, and large-star/small-star connected
    components as dedup_clusters. Same output contract; only the
    candidate generator differs — this is the configuration a
    GPT-3/Gopher-style pipeline would actually run, with the 4-perm
    variant kept as the didactic/regression twin. Signature and
    verification shingles come out of ONE fused Arrow pass (at 100 TB
    a second scan+fold for shingles is a second full read of the
    corpus); a doc with <3 words gets an empty shingle array, whose
    Jaccard against anything is NULL/0 — dropped by the >= threshold
    filter exactly like the old inner-join-on-filtered-docs shape."""
    art = _minhash128_artifacts(
        _docs(spark, sf_dir), with_shingles=True
    ).localCheckpoint(eager=True)
    members = (
        art.select("doc_id", F.explode(_minhash128_bands()).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )
    return _dedup_clusters_from(
        spark, sf_dir, _pairs_from_members(members),
        shingle_df=art.select("doc_id", "shingles"),
    )


def _dedup_clusters_from(spark: SparkSession, sf_dir: str,
                         pairs: DataFrame,
                         shingle_df: DataFrame | None = None) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # subtree-reuse rule (CLAUDE.md): the shingle fold feeds BOTH join
    # sides and the verified pairs feed BOTH union branches — without
    # materialization the scan+fold runs 4x and the pair join + Jaccard
    # verification 2x (measured in the executed plan). A caller that
    # already materialized shingles (the fused 128-perm artifacts pass)
    # hands them in; the 4-perm path keeps the standalone HOF fold.
    sh = shingle_df if shingle_df is not None else (
        _shingles_df(docs.filter(F.size(F.split("text", " ")) >= 3))
        .localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
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
    # the shingle fold feeds both self-join sides: materialize once
    sh = _shingles_df(docs).localCheckpoint(eager=True)
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


DUP_WINDOW_WORDS = 8


def exact_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication census (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    every rolling DUP_WINDOW_WORDS-word window, is that exact word
    sequence repeated ANYWHERE in the corpus (any doc, including the
    same one)? Returns per doc (doc_id, n_windows, n_dup_windows,
    dup_frac) — the span-level duplication fraction pipelines threshold
    on before paying substring excision. Docs shorter than the window
    produce no row (same convention as doc_fingerprint).

    Scale shape: the single-machine reference algorithm is a suffix
    array; the distributed re-expression is rolling-window HASHES — one
    narrow in-row fold builds md5 per window (JVM-side, one md5 per
    window), then the corpus-wide repeat test is ONE keyed aggregate on
    the 16-byte hash and one keyed join back (never text-to-text).
    Per-(doc,window) counts aggregate BEFORE the global count, so the
    shuffle carries distinct (doc_id, whash) rows, and the final
    per-doc rollup is a second keyed aggregate. Boilerplate windows
    skew-cluster on popular hashes; AQE splits those reduce partitions.
    The (doc_id, whash) aggregate feeds both the global-count branch
    and the join side; AQE's ReuseExchange dedupes the two canonically
    identical shuffles at runtime, so the window fold executes ONCE
    (pinned in test_plans — no localCheckpoint needed here).
    """
    docs = _docs(spark, sf_dir)
    k = DUP_WINDOW_WORDS
    words = F.split("text", " ")
    whashes = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    inst = (
        docs.select("doc_id", F.explode(whashes).alias("whash"))
        .groupBy("doc_id", "whash")
        .agg(F.count("*").alias("cnt"))
    )
    glob = inst.groupBy("whash").agg(F.sum("cnt").alias("gcnt"))
    dup_cnt = F.sum(
        F.when(F.col("gcnt") >= 2, F.col("cnt")).otherwise(F.lit(0))
    )
    per_doc = (
        inst.join(glob, "whash")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("n_windows"),
             dup_cnt.alias("n_dup_windows"))
    )
    return per_doc.select(
        "doc_id", "n_windows", "n_dup_windows",
        F.round(F.col("n_dup_windows") / F.col("n_windows"), 6)
        .alias("dup_frac"),
    )


def exact_substring_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The action half of exact_substring_dup (Lee et al. 2021): remove
    every word covered by a corpus-repeated DUP_WINDOW_WORDS-word
    window and reassemble the doc. Returns one row per doc (doc_id,
    clean_text, n_removed_words) — short docs and dup-free docs pass
    through verbatim with 0 removed.

    Scale shape: same repeat test as the census — per-(doc, offset)
    window hashes are a narrow in-row fold, the repeated-hash set is
    one keyed aggregate, and the duplicated offsets come back as ONE
    keyed join + per-doc collect_list (offset lists are as small as
    the duplication they describe). Excision itself is in-row: a
    filter-with-index lambda drops positions covered by any duplicated
    offset — the text never joins against text. The inst subtree feeds
    both the repeat aggregate and the offsets join; AQE ReuseExchange
    dedupes the two whash shuffles at runtime (same property as the
    census, pinned there)."""
    docs = _docs(spark, sf_dir)
    k = DUP_WINDOW_WORDS
    wdocs = docs.select("doc_id", F.split("text", " ").alias("ws"))
    whashes = F.when(
        F.size("ws") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("ws") - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice("ws", i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    inst = wdocs.select(
        "doc_id", F.posexplode(whashes).alias("off", "whash")
    )
    dup_hashes = (
        inst.groupBy("whash").agg(F.count("*").alias("gcnt"))
        .filter(F.col("gcnt") >= 2).select("whash")
    )
    offs_tbl = (
        inst.join(dup_hashes, "whash")
        .groupBy("doc_id")
        .agg(F.collect_list("off").alias("offs"))
    )
    joined = wdocs.join(offs_tbl, "doc_id", "left")
    offs = F.coalesce(F.col("offs"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("ws"),
        lambda w, i: ~F.exists(offs, lambda o: (i >= o) & (i <= o + k - 1)),
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("ws") - F.size(kept)).cast("long")
        .alias("n_removed_words"),
    )
