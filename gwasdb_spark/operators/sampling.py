"""Dataset-assembly operators for training-data pipelines: deterministic
splits, sequence packing, per-group quotas.

These are the operations between "corpus is clean" (c01) and "tokens hit
the trainer": carve a reproducible train/val/test split, pack documents
into fixed-token-budget rows, cap any one domain/language's share. All
three are pure DataFrame plans — no UDFs, no driver data.

Scale notes:
- `hash_split` is a projection — embarrassingly parallel, stable under
  repartitioning and re-runs (content-addressed, not rand()-seeded, so
  adding new documents never reshuffles old ones across splits).
- `packed_sequences` needs a GLOBAL running token count — the classic
  single-task window trap. A bare `Window.orderBy(id)` serializes 100 TB
  through one task; here the scan is two-level: per-bucket cumsums run
  in parallel (window partitioned by a fixed-width id bucket) and only
  the per-bucket TOTALS — thousands of rows, not documents — pass
  through the one global window, then broadcast-join back.
- `quota_per_group` partitions by the group key — parallel per group;
  skewed groups are bounded by the quota itself (top-k per partition
  can pre-prune under AQE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_label(id_col: Column) -> Column:
    """Deterministic 12/2/2-sixteenths train/val/test label from the
    first hex nibble of md5(id-as-string). Content-addressed: the same
    id lands in the same split in every run, on every engine (md5 hex is
    engine-portable, unlike hash()/xxhash64 seeds)."""
    nibble = F.substring(F.md5(id_col.cast("string").cast("binary")), 1, 1)
    return (
        F.when(nibble.isin("c", "d"), F.lit("val"))
        .when(nibble.isin("e", "f"), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def hash_split(df: DataFrame, id_col: str) -> DataFrame:
    """df + a `split` column (train ~75%, val ~12.5%, test ~12.5%)."""
    return df.withColumn("split", split_label(F.col(id_col)))


def packed_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    budget: int,
    bucket_width: int = 4096,
) -> DataFrame:
    """Concat-and-chunk packing (GPT-style): documents concatenated in
    id order, the token stream chunked every `budget` tokens; each doc is
    assigned the pack where it STARTS plus its offset inside that pack.

    Returns (id, n_tokens, start_offset, pack_id). The global cumsum is
    computed two-level (see module docstring) so no single task ever
    sees more than one id-bucket of rows."""
    base = df.select(
        F.col(id_col).alias("id"), tokens_col.cast("long").alias("n_tokens")
    ).withColumn("bucket", (F.col("id") / bucket_width).cast("long"))

    in_bucket = Window.partitionBy("bucket").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = base.withColumn("local_cum", F.sum("n_tokens").over(in_bucket))

    totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    prior = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    # one global window over BUCKET TOTALS only (rows = #buckets)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_total").over(prior), F.lit(0)).alias("bucket_offset"),
    )

    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "id",
            "n_tokens",
            (F.col("bucket_offset") + F.col("local_cum") - F.col("n_tokens")).alias(
                "start"
            ),
        )
        .select(
            "id",
            "n_tokens",
            F.pmod(F.col("start"), F.lit(budget)).alias("start_offset"),
            (F.col("start") / budget).cast("long").alias("pack_id"),
        )
    )


def quota_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """Keep at most `k` rows per group, best-first by `order_by` (pass a
    deterministic tiebreak as the last key). The domain/language-balance
    primitive: no group exceeds its quota regardless of corpus skew."""
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    scale: float = 8.0,
) -> DataFrame:
    """Square-root temperature resampling: keep up to ⌈scale·√n_g⌉ rows
    per group of size n_g, in deterministic md5(id) pseudo-random order.

    Sub-linear per-group quotas flatten the group-size distribution —
    rare languages/domains keep (nearly) everything, dominant ones are
    downsampled toward the √ law, the standard mixture-rebalancing move
    for multilingual pre-training corpora (temperature τ=0.5 on group
    mass). The quota uses only per-group scalars: √ is a correctly
    rounded IEEE op and `scale` should stay a power of two, so the
    cut-off is bit-identical in any engine — no cross-group float sums
    whose order could drift.

    Scale: one count per group (partial-agg'd), one per-group window
    rank over md5(id) (same portable pseudo-random order as
    split_label / reservoir_per_group), one broadcast-sized join on the
    group key (group cardinality ≪ rows). Returns the kept rows plus
    (sample_rank, group_size, group_quota)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("group_size"))
    quota = F.ceil(F.lit(float(scale)) * F.sqrt(F.col("group_size").cast("double")))
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(counts.withColumn("group_quota", quota)), group_col)
        .filter(F.col("sample_rank") <= F.col("group_quota"))
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed batching: documents ordered by (n_tokens, id) and
    cut into fixed-count batches, so each batch holds similar-length
    sequences and padding waste (batch_size × max_len − Σlen) is
    minimized — the dynamic-batching prep every training loader wants.

    Returns (id, n_tokens, batch_id, batch_max_tokens, batch_padding).
    The global (n_tokens, id) rank is computed TWO-LEVEL — per-length
    local rank plus a cumulative offset over the (small, bounded) set of
    distinct lengths — because an unpartitioned row_number window would
    pull every row into one task. Same discipline as packed_sequences;
    batch stats are one skinny (batch_id) aggregate."""
    base = df.select(
        F.col(id_col).alias("id"), F.col(n_tokens_col).cast("long").alias("n_tokens")
    )
    in_len = Window.partitionBy("n_tokens").orderBy("id")
    local = base.withColumn("local_rk", F.row_number().over(in_len))
    counts = base.groupBy("n_tokens").agg(F.count(F.lit(1)).alias("n_at_len"))
    prior = Window.orderBy("n_tokens").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    # window over DISTINCT LENGTHS only (bounded: sequence lengths, not docs)
    offsets = counts.select(
        "n_tokens",
        F.coalesce(F.sum("n_at_len").over(prior), F.lit(0)).alias("len_offset"),
    )
    ranked = (
        local.join(F.broadcast(offsets), "n_tokens")
        .withColumn(
            # Integer floor-division (`div`), never double `/`-then-cast:
            # at very large global ranks a double quotient can round
            # across an integer boundary for non-power-of-two batch sizes.
            "batch_id",
            F.expr(f"(len_offset + local_rk - 1) div {int(batch_size)}"),
        )
    )
    stats = ranked.groupBy("batch_id").agg(
        F.max("n_tokens").alias("batch_max_tokens"),
        (
            F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens")
        ).cast("long").alias("batch_padding"),
    )
    return ranked.join(stats, "batch_id").select(
        "id", "n_tokens", "batch_id", "batch_max_tokens", "batch_padding"
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global 1-based row number under `order_by` WITHOUT a
    single-task window — the distributed replacement for
    ``row_number().over(Window.orderBy(...))`` when the input is
    unbounded.

    Physical shape: one range exchange on the sort key (every partition
    holds a contiguous key range, sorted within), then
    `monotonically_increasing_id` — contiguous per partition by
    construction — gives each row its 0-based in-partition position via
    ``mid - min(mid)``. Per-partition (count, min_mid) stats are a
    #partitions-row relation; their cumulative sum (the only
    unpartitioned window, bounded by the partition count — audit
    allowlist) yields each partition's global offset, broadcast-joined
    back. rank = offset + in-partition position + 1.

    Exactness does NOT depend on where the range sampler places the
    boundaries: any boundary split of a totally ordered stream plus
    per-partition offsets reproduces the same global order. `order_by`
    must therefore be a TOTAL order (include a unique id tiebreak) —
    with ties straddling a boundary the rank would still be a valid
    row_number, but not deterministic across runs."""
    if num_partitions:
        nparts = int(num_partitions)
    else:
        # Managed distros may set shuffle.partitions to a non-numeric
        # value (e.g. "auto"); degrade to the input's partitioning.
        try:
            nparts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except (TypeError, ValueError):
            nparts = df.rdd.getNumPartitions()
    ranged = (
        df.repartitionByRange(nparts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin mid/pid; feeds stats AND result
    )
    stats = ranged.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"), F.min("__mid").alias("__min_mid")
    )
    prior = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = stats.select(
        "__pid",
        "__min_mid",
        F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__offset"),
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col,
            (F.col("__offset") + (F.col("__mid") - F.col("__min_mid")) + 1).cast(
                "long"
            ),
        )
        .drop("__mid", "__pid", "__min_mid", "__offset", "__n")
    )


def exact_ntile(
    df: DataFrame,
    n: int,
    order_by: list[Column],
    tile_col: str = "tile",
) -> DataFrame:
    """Exact SQL NTILE(n) under `order_by`, distributed — same bucket
    boundaries as the standard window function (first ``N mod n`` tiles
    get ``ceil(N/n)`` rows, the rest ``floor(N/n)``) but computed from
    `global_row_number` plus arithmetic, so the corpus never funnels
    through one task. N rides in-plan as a broadcast 1-row aggregate.
    `order_by` must be a total order (see global_row_number)."""
    ranked = global_row_number(df, order_by, rank_col="__rk")
    total = ranked.agg(F.count(F.lit(1)).alias("__N"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("__q", F.expr(f"__N div {int(n)}"))
        .withColumn("__m", F.expr(f"__N % {int(n)}"))
        .withColumn(
            tile_col,
            F.when(
                F.col("__rk") <= F.col("__m") * (F.col("__q") + 1),
                F.expr("(__rk - 1) div (__q + 1) + 1"),
            )
            .otherwise(
                F.col("__m")
                + F.expr("(__rk - __m * (__q + 1) - 1) div __q + 1")
            )
            .cast("int"),
        )
        .drop("__rk", "__N", "__q", "__m")
    )


def ring_negatives(
    df: DataFrame, id_col: str, k: int = 4, bucket_chars: int = 4
) -> DataFrame:
    """Deterministic negative sampling by consistent hashing: k
    negatives per anchor id, each the ring successor of probe position
    md5(anchor:slot) on the md5(id) ring (wrapping). Uniform,
    reproducible with no RNG state, and stable under corpus growth —
    inserting an id only steals the probes that now land directly
    before it (the consistent-hashing property).

    Scale shape: NEVER an all-pairs argmin, and never a quadratic
    bucket. Probes equi-join ring members on the first `bucket_chars`
    hex chars of position (16^bucket_chars buckets; default 65536) and
    take MIN among strictly-later positions — per-bucket fan-out is
    n_probes · n/16^bucket_chars, tuned O(1) ring members per bucket
    at the target scale (raise bucket_chars for larger rings). Probes
    whose successor lies past their bucket resolve via ONE broadcast
    equi-join against the full bucket SPINE carrying the exclusive
    suffix-minimum (min position over all strictly-later buckets,
    precomputed with one ordered window over the fixed-size spine —
    bounded by construction, not by data); wraparound against a
    broadcast 1-row global min. Positions are 15-char lowercase-hex
    strings (lexicographic = numeric, engine-portable); the min key
    appends ':' + zero-padded id so position-collision ties break on
    id. Ids must be NON-NEGATIVE int64 — the tiebreak pads to the full
    19-digit int64 width so lexicographic = numeric for every legal
    value (lpad silently truncates past its width, and '-' breaks
    ordering, so negatives fail fast at runtime instead of decoding to
    a wrong neg_id). Rare self-successor rows (P = 1/n) are dropped.

    Returns (anchor, neg_slot, neg_id)."""
    d = df.select(F.col(id_col).alias("__id"))
    # Fail fast on negative ids (folded into the key expression so
    # column pruning can't elide the check).
    id_str = F.when(
        F.col("__id") >= 0, F.col("__id").cast("string")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("ring_negatives: id_col must be non-negative, got "),
                F.col("__id").cast("string"),
            )
        )
    )
    r = F.substring(F.md5(id_str.cast("binary")), 1, 15)
    ring = d.select(
        r.alias("__r"),
        F.concat(r, F.lit(":"), F.lpad(id_str, 19, "0")).alias("__rkey"),
        # feeds pass 1, the bucket minima, and the global min — pin so
        # the id scan + md5 runs once, not once per consumer
    ).localCheckpoint(eager=False)
    spark = df.sparkSession
    slots = spark.range(0, k).select(F.col("id").cast("int").alias("neg_slot"))
    probes = d.crossJoin(F.broadcast(slots)).select(
        F.col("__id").alias("anchor"),
        "neg_slot",
        F.substring(
            F.md5(
                F.concat(
                    F.col("__id").cast("string"),
                    F.lit(":"),
                    F.col("neg_slot").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ).alias("__p"),
        # feeds pass 1, pass 2, and the output spine
    ).localCheckpoint(eager=False)
    bucket = lambda c: F.substring(c, 1, bucket_chars)
    p1 = (
        probes.withColumn("__b", bucket(F.col("__p")))
        .join(ring.withColumn("__b", bucket(F.col("__r"))), "__b")
        .filter(F.col("__r") > F.col("__p"))
        .groupBy("anchor", "neg_slot")
        .agg(F.min("__rkey").alias("__k1"))
    )
    # Full bucket spine (FIXED 16^bucket_chars rows — bounded by hex-space
    # construction, independent of data size) with the EXCLUSIVE suffix
    # minimum: for bucket b, the min position over all buckets > b.
    bmin = ring.groupBy(bucket(F.col("__r")).alias("__b")).agg(
        F.min("__rkey").alias("__bk")
    )
    spine = spark.range(16**bucket_chars).select(
        F.lower(
            F.lpad(F.conv(F.col("id").cast("string"), 10, 16), bucket_chars, "0")
        ).alias("__b")  # conv() emits uppercase hex; md5 prefixes are lower
    )
    wsuf = Window.orderBy(F.col("__b").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    suffix = spine.join(bmin, "__b", "left").select(
        "__b", F.min("__bk").over(wsuf).alias("__k2")
    )
    p2 = probes.join(
        F.broadcast(suffix), bucket(F.col("__p")) == F.col("__b"), "left"
    ).select("anchor", "neg_slot", "__k2")
    gmin = ring.agg(F.min("__rkey").alias("__kg"))
    skey = F.coalesce(F.col("__k1"), F.col("__k2"), F.col("__kg"))
    out = (
        p2.join(p1, ["anchor", "neg_slot"], "left")
        .crossJoin(F.broadcast(gmin))
        .select(
            "anchor",
            "neg_slot",
            F.substring(skey, 17, 19).cast("long").alias("neg_id"),
        )
    )
    return out.filter(F.col("neg_id") != F.col("anchor"))


def global_cumsum(
    df: DataFrame,
    weight_col: str,
    order_by: list[Column],
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE global running sum of `weight_col` under
    `order_by` — `global_row_number`'s weighted sibling, replacing
    ``sum(w).over(Window.orderBy(...))`` (a single-task sort of
    everything) with one range exchange + per-partition cumsums + a
    partition-count-bounded offset window. `order_by` must be a total
    order (unique tiebreak), same contract as global_row_number."""
    if num_partitions:
        nparts = int(num_partitions)
    else:
        try:
            nparts = int(
                df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
            )
        except (TypeError, ValueError):
            nparts = df.rdd.getNumPartitions()
    ranged = (
        df.repartitionByRange(nparts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # pin pid; feeds stats AND result
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stats = ranged.groupBy("__pid").agg(F.sum(weight_col).alias("__w"))
    prior = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = stats.select(
        "__pid",
        F.coalesce(F.sum("__w").over(prior), F.lit(0)).alias("__offset"),
    )
    return (
        ranged.withColumn("__loc", F.sum(weight_col).over(wloc))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(cum_col, (F.col("__offset") + F.col("__loc")).cast("long"))
        .drop("__pid", "__loc", "__offset")
    )
