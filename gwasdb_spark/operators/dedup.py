"""Deduplication operators for large-scale document corpora.

Four families, each a composition of DataFrame ops designed for the 100 TB
case (no driver-side loops, no O(n^2) pair enumeration except within
LSH buckets):

- exact:        hash-groupBy on content (or normalized fingerprint)
- ngram-jaccard: shingle → explode → shingle-equi-join → group. Exact
                 similarity, pruned by dropping ultra-frequent shingles
                 (stopword shingles otherwise quadratically blow up the join)
- minhash-lsh:  shingle → k minhashes (xxhash64 seeded) → band buckets →
                 candidate pairs only within buckets
- simhash:      token-hash sign aggregation → 64-bit signature → hamming
                 band join

All hashing uses Spark-native xxhash64 (JVM, codegen'd, deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Documents shorter than n words yield an empty array. ANSI-safe: the
    sequence/element_at branch only evaluates when size >= n."""
    tokens = F.split(F.trim(text), r"\s+")
    size = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), size - n),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j + 1) for j in range(n)]),
    )
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct content.
    Scale: a single hash-aggregate shuffle on a 128-bit content digest —
    group on md5(text), never on the raw text (shuffling full documents
    doubles the IO for no benefit)."""
    digest = F.md5(F.col(text_col))
    return (
        df.select(F.col(id_col), digest.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_docs: int = 100,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= threshold).

    Plan shape: explode distinct shingles → drop shingles present in more
    than `max_shingle_docs` docs (the quadratic-blowup guard; standard in
    web-dedup pipelines) → self-equi-join on shingle → count shared →
    jaccard from exact per-doc shingle counts. Jaccard is an exact integer
    ratio — engine-portable without rounding."""
    # One shingle pipeline, exploded once; downstream works on 8-byte
    # xxhash64 keys — the pair join shuffles (long, long) rows, never
    # strings. (Hash collisions would perturb counts; at 64 bits the
    # probability is ~n^2/2^64 — negligible even at corpus scale.)
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).select("doc", F.xxhash64("shingle").alias("sh"))
    sizes = exploded.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    # Frequency prune: ultra-common shingles contribute pairs quadratically
    # but little similarity signal.
    rare = (
        exploded.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") <= max_shingle_docs)
        .select("sh")
    )
    pruned = exploded.join(rare, "sh", "left_semi")
    a = pruned.select(F.col("doc").alias("id_a"), "sh")
    b = pruned.select(F.col("doc").alias("id_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """k-minhash signature per document: minhash_i = min over shingles of
    xxhash64(shingle, seed=i).

    Shape: explode shingles → k seeded hashes per row → groupBy(doc) with k
    min() aggregates → pack into an array. The aggregation exchange
    MATERIALIZES the signature: downstream band expressions and self-join
    sides read k longs instead of re-deriving the whole shingle pipeline
    (the naive nested-array formulation re-inlines that tree into every
    band × join-side, a >100× expression blowup measured at sf0.1)."""
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    hashed = exploded.select(
        "doc",
        *[
            F.xxhash64(F.col("shingle"), F.lit(i)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    sigs = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(num_hashes)]
    )
    return sigs.select(
        "doc",
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.2,
) -> DataFrame:
    """MinHash+LSH near-dup candidates with estimated Jaccard.

    shingle → signature → band keys (xxhash64 over each signature slice) →
    explode bands → equi-join on (band_idx, band_key) → candidate pairs →
    estimated jaccard = fraction of equal minhashes. Only bucket-mates are
    ever paired: at 100 TB the band join shuffles O(n·bands) skinny rows,
    never O(n^2)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.xxhash64(
                *[F.element_at("signature", b * rows_per_band + r + 1) for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc", "signature", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc", "signature", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.signature").alias("sig_a"),
            F.col("b.signature").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )
    return cands.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= min_est_jaccard
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per document, fully native: token hashes → per-bit
    +1/-1 vote aggregation → sign bits packed into a long. Expression-only
    (codegen), no Python."""
    exploded = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("token"),
    ).select("doc", F.xxhash64("token").alias("h"))
    # per-bit ±1 vote sums as aggregates — the exchange materializes the 64
    # sums, so the packed signature is cheap to inline downstream
    votes = exploded.groupBy("doc").agg(
        *[
            F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(
                f"v{j}"
            )
            for j in range(bits)
        ]
    )
    packed = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, j)
        packed = term if packed is None else packed.bitwiseXOR(term)
    return votes.select("doc", packed.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs within a hamming radius, via band-bucket join
    (pigeonhole: pairs within radius < bands share ≥1 exact band)."""
    width = 64 // bands
    sigs = simhash_signatures(df, id_col, text_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("simhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc", "simhash", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc", "simhash", "band.band_idx", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    xor = F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def keep_first_per_cluster(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Given near-dup pairs, drop every doc that appears as the larger id of
    a pair (greedy min-id survivor; a full connected-components pass is the
    iterative extension)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
