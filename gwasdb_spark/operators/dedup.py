"""Deduplication operators for large-scale document corpora.

Four families, each a composition of DataFrame ops designed for the 100 TB
case (no driver-side loops, no O(n^2) pair enumeration except within
bounded LSH buckets):

- exact:         hash-groupBy on a 128-bit content digest
- ngram-jaccard: shingle → explode → bucket-by-shingle → bounded pair
                 explode → group. Exact similarity, pruned by dropping
                 ultra-frequent shingles (stopword shingles otherwise
                 quadratically blow up the pair count)
- minhash-lsh:   shingle → k minhashes → band buckets → candidate pairs
                 only within buckets
- simhash:       token-hash sign aggregation → 64-bit signature → hamming
                 band buckets

All hashing uses Spark-native xxhash64 (JVM, codegen'd, deterministic).

Physical-plan notes (measured at sf0.1, local[32]):

1. **Higher-order functions defeat common-subexpression elimination.**
   Referencing `split(text)` inside a `transform()` lambda re-inlines the
   split into every `element_at` call — ~150 regex splits of the full text
   per document. Every pipeline here therefore materializes the token
   array in its own Project (`_tokenized`) so the lambda references a
   bound attribute. This alone was a 4× win on the shingle explode.
2. **Pair enumeration is a bounded per-row explode, not a self-join.**
   Self-joining the exploded shingle table recomputes the whole upstream
   pipeline per join side and shuffles it twice; collecting the (capped)
   doc list per shingle/bucket pays one aggregation shuffle of 8-byte
   keys and generates pairs locally.
3. **`_spread` repartitions tiny scans up to cluster parallelism.** A
   single small parquet file arrives as one partition and would serialize
   the CPU-heavy shingle explode on one core; at real scale the input is
   already split and this is a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Documents shorter than n words yield an empty array.

    NOTE: one-shot convenience only. In a pipeline, materialize the token
    array first (`_tokenized`) and build grams with `_gram_array` — using
    this column inside further higher-order functions re-evaluates the
    tokenizing split per element (see module docstring, note 1)."""
    return _gram_array(F.split(F.trim(text), r"\s+"), n)


def _gram_array(tokens: Column, n: int) -> Column:
    """n-gram array over an ALREADY-MATERIALIZED token array column.
    ANSI-safe: the sequence/element_at branch only evaluates when
    size >= n."""
    size = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(0), size - n),
        lambda i: F.concat_ws(" ", *[F.element_at(tokens, i + j + 1) for j in range(n)]),
    )
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, toks) projection: whitespace tokens materialized ONCE per row,
    in their own Project node, so downstream lambdas reference an attribute
    instead of re-inlining the split (module docstring, note 1)."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("toks"),
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to cluster parallelism when the scan reads only a
    few SMALL files (local test data). Decided from file metadata only —
    `df.rdd.getNumPartitions()` would force an RDD conversion of the
    analyzed plan on every pipeline build. No-op at real input scale
    (many files, or few-but-large files that the reader already splits
    by spark.sql.files.maxPartitionBytes) and for non-file frames."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    from urllib.parse import urlparse

    try:
        total = sum(os.path.getsize(urlparse(f).path) for f in files)
    except OSError:
        return df
    if total < 128 * 1024 * 1024:  # under one default maxPartitionBytes
        return df.repartition(target)
    return df


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


def _pairs_from_groups(grouped: DataFrame, docs_col: str = "docs") -> DataFrame:
    """Emit all (id_a < id_b) pairs from each row's sorted `docs` array via
    a bounded double explode — pair enumeration WITHOUT a self-join
    (module docstring, note 2). Group sizes are capped by the caller, so
    the fan-out is bounded (no skew amplification at scale)."""
    pos = F.posexplode(docs_col)
    return (
        grouped.select(F.col(docs_col), pos.alias("i", "id_a"))
        # slice is 1-indexed: elements strictly after position i.
        .select(
            F.col("id_a"),
            F.explode(
                F.slice(F.col(docs_col), F.col("i") + 2, F.size(docs_col))
            ).alias("id_b"),
        )
    )


def _exploded_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, hash_fn=None
) -> DataFrame:
    """(doc, sh) rows: one per word-n-gram OCCURRENCE per document (not
    de-duplicated — callers use collect_set / countDistinct / min, all of
    which are multiset-insensitive), shingle pre-hashed to an 8-byte
    xxhash64 key. Downstream aggregations shuffle (long, long) rows, never
    strings. (Hash collisions would perturb counts; at 64 bits the
    probability is ~n^2/2^64 — negligible even at corpus scale.)

    Shingles are built as arrays_zip over n shifted slices of the token
    array, NOT with transform(): higher-order functions are
    CodegenFallback — interpreted per element — and benchmarked ~5x
    slower than this whole-stage-codegen formulation at sf0.1."""
    toks = _spread(_tokenized(df, id_col, text_col))
    size = F.size("toks")
    width = F.greatest(size - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice("toks", j + 1, width) for j in range(n)])
    gram = F.concat_ws(" ", *[F.col("g").getField(str(j)) for j in range(n)])
    hcol = hash_fn(gram) if hash_fn is not None else F.xxhash64(gram)
    return (
        toks.select("doc", F.explode(zipped).alias("g"))
        .select("doc", hcol.alias("sh"))
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

    Plan shape: explode distinct shingles → ONE hash-aggregate on the
    8-byte shingle hash collecting the (sorted, bounded) doc list → drop
    shingles present in more than `max_shingle_docs` docs (the
    quadratic-blowup guard; standard in web-dedup pipelines) → per-row
    pair explode → count shared → jaccard from exact per-doc shingle
    counts (computed narrow, no shuffle). Jaccard is an exact integer
    ratio — engine-portable without rounding."""
    # Explicit repartition by shingle hash: BOTH consumers (pair buckets,
    # per-doc sizes) sit directly above this one exchange, whose subtree —
    # scan + tokenize + shingle-hash explode — is fully deterministic, so
    # the physical planner dedupes it (ReusedExchange): the document
    # pipeline runs ONCE and its shuffle is written once, read twice.
    # (Letting each groupBy plant its own exchange instead computes the
    # whole pipeline per consumer: collect_set is flagged nondeterministic,
    # which disqualifies any exchange containing it from reuse, and
    # RemoveRedundantAggregates strips a pre-distinct under collect_set —
    # both reuse-via-aggregate routes are dead ends. Plan-asserted in
    # tests/test_plan_shape.py.)
    #
    # The explicit isNotNull matters for the same reason: the sizes⋈shared
    # inner join infers IsNotNull(id) and pushes it into ONE branch's scan;
    # stating it up front keeps both subtrees byte-identical so the
    # exchange canonicalizes equal.
    exploded = _exploded_shingle_hashes(
        df.filter(F.col(id_col).isNotNull()), id_col, text_col, n
    ).repartition("sh")
    # collect_set absorbs repeated shingles within a doc (set semantics);
    # the input is already sh-partitioned so this aggregates without a
    # further exchange. The frequency prune bounds every retained group at
    # max_shingle_docs elements (quadratic-blowup guard); singleton
    # shingles produce no pairs — dropping them kills most of the explode
    # volume.
    bounded = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_set("doc")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= max_shingle_docs))
    )
    shared = (
        _pairs_from_groups(bounded)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # Exact distinct-shingle count per doc; the partial distinct-aggregate
    # dedupes (doc, sh) map-side on the reused shuffle before the skinny
    # (long, long) exchange by doc.
    sizes = exploded.groupBy("doc").agg(
        F.count_distinct("sh").alias("n_shingles")
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


def shingle_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_docs: int = 100,
) -> DataFrame:
    """Exact DIRECTED n-gram containment pairs: C(A→B) = |sh(A) ∩ sh(B)|
    / |sh(A)| ≥ threshold — the subset-duplicate detector Jaccard misses
    (a quote inside a long doc: tiny union ratio, containment ≈ 1). The
    quote/boilerplate/benchmark-decontamination primitive.

    Identical physical shape to ngram_jaccard_pairs (one reused shingle
    exchange, bounded bucket pair explode); the ordered pair set is the
    unordered set plus a projection flip — no second enumeration pass.
    Containment is an exact integer quotient, divided once."""
    exploded = _exploded_shingle_hashes(
        df.filter(F.col(id_col).isNotNull()), id_col, text_col, n
    ).repartition("sh")
    bounded = (
        exploded.groupBy("sh")
        .agg(F.array_sort(F.collect_set("doc")).alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= max_shingle_docs))
    )
    unordered = _pairs_from_groups(bounded).groupBy("id_a", "id_b").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    # both directions from one enumeration: |A∩B| is symmetric
    shared = unordered.unionByName(
        unordered.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "n_shared",
        )
    )
    sizes = exploded.groupBy("doc").agg(F.count_distinct("sh").alias("n_shingles"))
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_shingles").alias("n_a"))
    cont = F.col("n_shared").cast("double") / F.col("n_a").cast("double")
    return (
        shared.join(sa, "id_a")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    shingle_hash_fn=None,
    perm_params=None,
) -> DataFrame:
    """k-minhash signature per document: minhash_i = min over shingles of
    a seeded hash of the shingle.

    Shape: explode shingles → hash the (variable-length) shingle string
    ONCE to an 8-byte key → derive the k family members by hashing that
    fixed-width long with the seed (k string hashes per shingle → 1 string
    hash + k long hashes; the dominant cost of signature building) →
    groupBy(doc) with k min() aggregates → pack into an array. The
    aggregation exchange MATERIALIZES the signature: downstream band
    expressions read k longs instead of re-deriving the whole shingle
    pipeline.

    Cross-engine hooks (the x04 graduation recipe applied to minhash):
    `shingle_hash_fn` (gram Column → long Column) replaces the xxhash64
    shingle key; `perm_params = (p, [(a_i, b_i), ...])` replaces the
    seeded-xxhash64 family with the classic affine permutations
    (a_i·h + b_i) mod p. With the shingle hash bounded below 2^32 and
    a_i, b_i below 2^30 every product stays under 2^63 — NO int64
    overflow on either engine — so the whole signature is
    SQL-replayable in DuckDB (the x03 oracle path). Defaults unchanged
    for other callers."""
    exploded = _exploded_shingle_hashes(
        df, id_col, text_col, n, hash_fn=shingle_hash_fn
    )
    if perm_params is None:
        family = [F.xxhash64("sh", F.lit(i)) for i in range(num_hashes)]
    else:
        p, ab = perm_params
        if len(ab) < num_hashes:
            raise ValueError("perm_params needs >= num_hashes (a, b) pairs")
        family = [
            (F.lit(a) * F.col("sh") + F.lit(b)) % F.lit(p)
            for a, b in ab[:num_hashes]
        ]
    hashed = exploded.select(
        "doc", *[h.alias(f"h{i}") for i, h in enumerate(family)]
    )
    sigs = hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"mh{i}") for i in range(num_hashes)]
    )
    return sigs.select(
        "doc",
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("signature"),
    )


def _bucket_pairs(
    banded: DataFrame, payload: list[str], max_bucket_docs: int | None
) -> DataFrame:
    """Group band-exploded rows into buckets and emit member pairs (a, b)
    with a.doc < b.doc, each carrying the payload columns as struct fields.
    One aggregation shuffle; bounded per-bucket pair explode (module
    docstring, note 2). `max_bucket_docs=None` disables the oversized-
    bucket drop — the EXHAUSTIVE configuration an SQL-replay oracle
    requires (the capped default silently loses pairs the oracle emits
    when a band key is skewed past the cap)."""
    member = F.struct("doc", *payload)
    size_ok = F.size("members") >= 2
    if max_bucket_docs is not None:
        size_ok = size_ok & (F.size("members") <= max_bucket_docs)
    buckets = (
        banded.groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_list(member)).alias("members"))
        .filter(size_ok)
    )
    pos = F.posexplode("members")
    return buckets.select(F.col("members"), pos.alias("i", "a")).select(
        F.col("a"),
        F.explode(
            F.slice(F.col("members"), F.col("i") + 2, F.size("members"))
        ).alias("b"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    min_est_jaccard: float = 0.2,
    max_bucket_docs: int | None = 10_000,
    shingle_hash_fn=None,
    perm_params=None,
    band_hash_fn=None,
) -> DataFrame:
    """MinHash+LSH near-dup candidates with estimated Jaccard.

    shingle → signature → band keys (xxhash64 over each signature slice) →
    explode bands → bucket aggregation on (band_idx, band_key) → bounded
    per-bucket pair explode → estimated jaccard = fraction of equal
    minhashes. Only bucket-mates are ever paired: at 100 TB the band
    aggregation shuffles O(n·bands) skinny rows, never O(n^2), and
    `max_bucket_docs` caps per-bucket fan-out (skew guard for
    boilerplate-heavy corpora).

    `shingle_hash_fn` / `perm_params` thread through to
    minhash_signatures; `band_hash_fn` (list of row Columns → long
    Column) replaces the xxhash64 band key — together they make the
    whole candidate pipeline SQL-replayable (x03's DuckDB oracle)."""
    banded = minhash_bands(
        df, id_col, text_col, n, num_hashes, bands,
        shingle_hash_fn=shingle_hash_fn, perm_params=perm_params,
        band_hash_fn=band_hash_fn,
    )
    pairs = _bucket_pairs(banded, payload=["signature"], max_bucket_docs=max_bucket_docs)
    est = est_jaccard(
        F.col("a.signature"), F.col("b.signature"), num_hashes
    )
    return (
        pairs.select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["id_a", "id_b"])
    )


def est_jaccard(sig_a: Column, sig_b: Column, num_hashes: int) -> Column:
    """Estimated Jaccard = fraction of agreeing minhashes (exact k/n
    quotient — binary-exact on both engines)."""
    return (
        F.size(
            F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                     lambda eq: eq)
        ).cast("double")
        / F.lit(float(num_hashes))
    )


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_hash_fn=None,
    perm_params=None,
    band_hash_fn=None,
) -> DataFrame:
    """(doc, signature, band_idx, band_key) — the banded signature
    relation minhash_lsh_pairs buckets on, exposed as the PERSISTABLE
    near-dup index artifact: write it partitioned/bucketed by
    (band_idx, band_key) and incremental batches probe only colliding
    buckets (x171's LSM discipline — the x62 postings / x153 ANN cell
    pattern applied to the minhash family)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, n, num_hashes,
        shingle_hash_fn=shingle_hash_fn, perm_params=perm_params,
    )

    def _band_key(b: int):
        rows = [
            F.element_at("signature", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        return band_hash_fn(rows) if band_hash_fn else F.xxhash64(*rows)

    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            _band_key(b).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc", "signature", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc", "signature", "band.band_idx", "band.band_key")


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, hash_fn=None
) -> DataFrame:
    """64-bit SimHash per document, fully native: token hashes → per-bit
    +1/-1 vote aggregation → sign bits packed into a long. Expression-only
    (codegen), no Python. `hash_fn` (token Column → long Column) defaults
    to xxhash64; an md5-based hash (mining_ops h60) makes the whole
    signature SQL-replayable in DuckDB — the x04 oracle path — at the
    cost of bits 60-63 voting uniformly negative (a 60-bit effective
    signature, deterministic on both engines)."""
    toks = _spread(_tokenized(df, id_col, text_col))
    hcol = (
        hash_fn(F.col("token")) if hash_fn is not None
        else F.xxhash64("token")
    )
    exploded = (
        toks.select(
            "doc", F.explode(F.array_distinct(F.col("toks"))).alias("token")
        )
        # split(trim(''), '\s+') yields [''] — drop the empty token so a
        # blank/whitespace-only doc gets NO signature (the oracle's
        # token <> '' semantics; x170 already filters the same way).
        .filter(F.col("token") != "")
        .select("doc", hcol.alias("h"))
    )
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
    max_bucket_docs: int | None = 10_000,
    hash_fn=None,
) -> DataFrame:
    """SimHash near-dup pairs within a hamming radius, via band buckets
    (pigeonhole: pairs within radius < bands share ≥1 exact band).
    Same bucket-aggregate + bounded pair explode shape as MinHash-LSH."""
    width = 64 // bands
    sigs = simhash_signatures(df, id_col, text_col, hash_fn=hash_fn)
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
    pairs = _bucket_pairs(banded, payload=["simhash"], max_bucket_docs=max_bucket_docs)
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        pairs.select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def keep_first_per_cluster(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Given near-dup pairs, drop every doc that appears as the larger id of
    a pair (greedy min-id survivor; a full connected-components pass is the
    iterative extension)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination scan: corpus documents sharing at least one
    word n-gram with any benchmark document, with the count of distinct
    shared shingles — the train/eval leakage check every training-data
    pipeline runs before a model ships.

    Scale shape: both sides reduce to (doc, 8-byte shingle hash) rows
    before any join; the benchmark side collapses to a DISTINCT hash set
    and broadcasts (benchmark suites are fixed-size by nature — this is a
    dim-table broadcast, not an sf-proportional one). The corpus is
    touched once; shuffle volume is the hit set, not the corpus."""
    c = _exploded_shingle_hashes(corpus, id_col, text_col, n).dropDuplicates(
        ["doc", "sh"]
    )
    b = (
        _exploded_shingle_hashes(benchmark, id_col, text_col, n)
        .select("sh")
        .distinct()
    )
    return (
        c.join(F.broadcast(b), "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .select(F.col("doc").alias(id_col), "n_shared_shingles")
    )


def keep_best_per_content(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection: one survivor per distinct content,
    ranked by quality (desc) with id as the deterministic tiebreak —
    dedup as CURATION (pick the best copy, keep its metadata) rather
    than exact_duplicates' min-id bookkeeping.

    Scale: the rank runs over (digest, quality, id) — a window
    partitioned by the 128-bit content hash, so partitions are duplicate
    groups (tiny; bounded by copy count, not corpus size) and the raw
    text never shuffles. Returns the surviving rows plus each group's
    copy count."""
    digest = F.md5(F.col(text_col)).alias("digest")
    w = Window.partitionBy("digest").orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    wg = Window.partitionBy("digest")
    ranked = df.select(F.col(id_col), F.col(quality_col), digest).select(
        "*",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wg).cast("long").alias("n_copies"),
    )
    return ranked.filter(F.col("rk") == 1).drop("rk")


def source_overlap_matrix(
    df: DataFrame, group_col: str = "source", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Pairwise SOURCE-level n-gram Jaccard overlap — the dataset-mixing
    diagnostic run before blending crawls/dumps into one training mix
    (two mirrors of the same site show up as a near-1.0 cell; the
    cross-source counterpart of x02's per-document pairs, answering
    "which SOURCES duplicate each other" before any doc-grain dedup).

    Grain is the distinct (source, shingle-hash) set, so the self-join
    fan-out per shingle is bounded by |sources|² — independent of corpus
    size — and no frequency prune is needed (unlike doc-grain pairs).
    The distinct relation is computed ONCE (lazy localCheckpoint) and
    feeds the per-source sizes and both join sides; everything that
    shuffles is (string-key, long) rows, never text.

    Returns (source_a < source_b, n_shared, jaccard) for pairs sharing
    at least one shingle; jaccard is an exact integer ratio.
    """
    sh = (
        _exploded_shingle_hashes(
            df.filter(F.col(group_col).isNotNull()), group_col, text_col, n
        )
        .select(F.col("doc").alias(group_col), "sh")
        .distinct()
        .localCheckpoint(eager=False)  # feeds sizes AND both join sides
    )
    sizes = sh.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(group_col).alias("source_a"), "sh")
    b = sh.select(F.col(group_col).alias("source_b"), "sh")
    shared = (
        a.join(b, "sh")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col(group_col).alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(group_col).alias("source_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    ).cast("double")
    return (
        shared.join(sa, "source_a")
        .join(sb, "source_b")
        .select("source_a", "source_b", "n_shared", jac.alias("jaccard"))
    )


def contamination_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_col: str = "split",
    n: int = 13,
    train: str = "train",
    test: str = "test",
) -> DataFrame:
    """Eval-set contamination report (the GPT-3 App. C decontamination
    method): for every `test`-split row, the count and fraction of its
    distinct word n-grams that occur anywhere in the `train` split.

    Scale shape: one tokenize+shingle scan; shingles are md5'd to
    60-bit digests AT THE SCAN so the train-side DISTINCT and the
    membership join shuffle 8-byte keys, never n-word strings (the
    digest discipline of span_dedup; the 2^-60 per-pair false-hit rate
    is engine-identical by construction). Rows shorter than n words
    keep a report row with frac 0.0 — silence is not cleanliness.

    Returns (id, n_shingles, n_contaminated, contaminated_frac,
    is_contaminated), one row per test-split input row."""
    # Materialize the token array in its OWN projection before the gram
    # lambda (module docstring note 1: a lambda over the inlined split
    # re-tokenizes per element — measured 30+ s vs <2 s on 5k docs), and
    # spread the CPU-heavy explode across the cluster when the input is
    # a few small local files.
    tok = _spread(df).select(
        F.col(id_col),
        F.col(split_col).alias("__split"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    ex = (
        tok.select(
            id_col,
            "__split",
            F.explode_outer(_gram_array(F.col("__toks"), n)).alias("__g"),
        )
        .select(
            id_col,
            "__split",
            F.conv(
                F.substring(F.md5(F.col("__g").cast("binary")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("__h"),
        )
        # feeds the train-side DISTINCT and the test side: pin so the
        # tokenize + shingle + md5 explode runs once, not per consumer
        .localCheckpoint(eager=False)
    )
    train_h = (
        ex.filter(F.col("__split") == train)
        .filter(F.col("__h").isNotNull())
        .select("__h")
        .distinct()
    )
    te = ex.filter(F.col("__split") == test)
    hits = (
        te.filter(F.col("__h").isNotNull())
        .join(train_h.withColumn("__hit", F.lit(1)), "__h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )
    base = te.select(id_col).distinct()
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0))
    n_bad = F.coalesce(F.col("n_contaminated"), F.lit(0))
    return base.join(hits, id_col, "left").select(
        id_col,
        n_sh.alias("n_shingles"),
        n_bad.alias("n_contaminated"),
        F.when(n_sh > 0, F.round(n_bad.cast("double") / n_sh.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("contaminated_frac"),
        (n_bad > 0).alias("is_contaminated"),
    )
