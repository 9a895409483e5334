"""Deterministic sampling / splitting for training-data pipelines.

No reference analogue (Beam's builtin Sample is random-seeded); these
are north-star extensions. All variants key the decision on a HASH of
a stable id — not on a seeded RNG — because at 100 TB reproducibility
is the requirement: the same row lands in the same sample/split on
every run, every engine, every cluster size, and adding rows never
reshuffles existing assignments (the property seeded ``df.sample`` and
``randomSplit`` lack; their draws depend on partitioning).

Execution shape: a narrow per-row filter — no shuffle, no RNG state,
pipelineable into whatever reads the sample. md5 is the hash (not
xxhash64) so the DuckDB oracle reproduces the exact bucket values;
swap in xxhash64 for a ~3x cheaper bucket at scale if cross-engine
parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .portable import trunc_dp

BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = BUCKETS) -> Column:
    """Stable bucket in [0, buckets) from md5 of the key's string form.

    First 8 hex chars -> 32-bit int -> mod. DuckDB twin (bit-identical,
    verified in tests):
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
    % buckets``."""
    h = F.conv(F.substring(F.md5(col.cast("string").cast("binary")), 1, 8), 16, 10)
    return (h.cast("bigint") % buckets).alias("bucket")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = BUCKETS
) -> DataFrame:
    """Keep rows whose hash bucket falls below fraction*buckets — a
    reproducible ~fraction sample keyed on ``key_col``."""
    cutoff = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(key_col), buckets) < cutoff)


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its
    own fraction (0 for strata absent from ``fractions``). The
    downsample-the-overrepresented-source move in corpus building."""
    cutoff = F.lit(0)
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * buckets)))
        ).otherwise(cutoff)
    return df.filter(hash_bucket(F.col(key_col), buckets) < cutoff)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, buckets: int = BUCKETS
) -> DataFrame:
    """Label every row 'test' or 'train' by hash bucket. One pass, no
    shuffle; downstream writers partition by the label. Stable under
    corpus growth: new rows never move old rows across the split."""
    cutoff = int(round(test_fraction * buckets))
    return df.withColumn(
        "split",
        F.when(hash_bucket(F.col(key_col), buckets) < cutoff, "test").otherwise("train"),
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight: Column, buckets: int = BUCKETS
) -> DataFrame:
    """Per-row weighted inclusion: keep a row iff its hash-uniform draw
    in [0, 1) falls below ``weight`` (a Column in [0, 1]; clamp before
    passing). The quality/importance-weighted corpus downsampler —
    higher-scored documents survive proportionally more often, and the
    decision stays deterministic per key (same row, same verdict, every
    run and engine). Same narrow no-shuffle shape as
    ``deterministic_sample``; that function is the constant-weight
    special case."""
    u = hash_bucket(F.col(key_col), buckets).cast("double") / F.lit(float(buckets))
    return df.filter(u < weight)


def topk_per_stratum(
    df: DataFrame, key_col: str, strata_col: str, k: int
) -> DataFrame:
    """Deterministic k-row sample per stratum: rank rows inside each
    stratum by (md5(key), key) and keep the first k. The distributed
    stand-in for per-group reservoir sampling — same k rows on every
    run/engine, one shuffle on the stratum, per-partition sort only
    (no global sort). The hash order makes the pick uniform-ish rather
    than biased by storage order."""
    from pyspark.sql import Window

    order = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(strata_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def cap_per_group(
    df: DataFrame, key_col: str, group_col: str, cap: int
) -> DataFrame:
    """Hard per-group cap: keep at most ``cap`` rows per group, picked
    deterministically by (md5(key), key) order — the web-corpus
    "max N documents per domain" rule (C4/RefinedWeb-style host
    balancing), which bounds any single source's share of the corpus
    regardless of how skewed the crawl is.

    Differs from :func:`topk_per_stratum` only in intent (a quota,
    not a sample) and in keeping the full row set semantics: groups
    under the cap pass through untouched. Same scale shape: one
    shuffle on the group, per-partition sort, no global order. The
    hash order decorrelates the pick from storage/crawl order, so the
    survivors are a uniform-ish draw rather than "first N fetched"."""
    from pyspark.sql import Window

    order = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def split_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    test_pct: int = 20,
    out_col: str = "split",
) -> DataFrame:
    """Stratified train/test split with EXACT per-stratum proportions:
    rank rows inside each stratum by (md5(key), key) and mark test
    rows with the INTERLEAVED slot rule ``(rn · test_pct) % 100 <
    test_pct`` (Bresenham line-drawing spread) — test slots are evenly
    laced through the rank order, so EVERY prefix holds the ratio and
    each stratum lands within one row of the target, however small
    (a plain ``rn % 100 < test_pct`` rule would dump a <100-row
    stratum's whole head into test). Unlike the hash-threshold split
    (:func:`train_test_split`) whose per-stratum ratio only converges
    statistically. Deterministic and growth-UNSTABLE by design
    (inserting rows reshifts ranks): use the hash split when rows
    must never migrate, this one when per-stratum balance is the
    contract (small or skewed strata). One shuffle on the stratum."""
    from pyspark.sql import Window

    order = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(strata_col).orderBy(order, F.col(key_col))
    rn = F.row_number().over(w) - 1
    return df.withColumn(
        out_col,
        F.when(
            (rn * test_pct) % 100 < test_pct, F.lit("test")
        ).otherwise(F.lit("train")),
    )


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_weights: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Rebalance a corpus to an EXACT target domain mixture at maximum
    yield — the DoReMi/Pile-style "domain reweighting" step a training
    pipeline runs before tokenization.

    Given target proportions ``target_weights`` (domain -> weight,
    summing to 1), the kept sample satisfies E[n_kept(s)] = C * w_s
    with the largest C for which no domain needs more rows than it
    has: C = min_s(n_s / w_s). Domains absent from the weight map are
    dropped. Selection is the deterministic md5 hash-bucket filter
    (same rows every run/engine/layout); the per-domain rate is
    rate_s = C * w_s / n_s, computed DISTRIBUTED: one partial-agg
    count per domain, one global min — both tiny aggregates — then a
    broadcast join back, so no driver-side collect and no second scan
    of the corpus.

    Returns the kept rows with a ``mix_rate`` column (the domain's
    sampling rate). Exact IEEE parity of the rate across engines holds
    because it is a fixed chain of integer-to-double divisions of
    identical inputs — pin the weight literals textually when writing
    an oracle twin.
    """
    w_expr = F.create_map(
        *[F.lit(x) for kv in target_weights.items() for x in kv]
    )[F.col(domain_col)]
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    ratios = counts.withColumn("__w", w_expr).filter(F.col("__w").isNotNull())
    c = ratios.agg(
        F.min(F.col("__n").cast("double") / F.col("__w")).alias("__c")
    )
    rates = ratios.crossJoin(F.broadcast(c)).select(
        domain_col,
        (
            F.col("__c") * F.col("__w") / F.col("__n").cast("double")
        ).alias("mix_rate"),
    )
    out = df.join(F.broadcast(rates), domain_col)
    return out.filter(
        hash_bucket(F.col(key_col), buckets).cast("double")
        < F.col("mix_rate") * buckets
    )


def negative_samples(
    keys: DataFrame,
    key_col: str,
    positives: DataFrame,
    pos_key: str,
    pos_item: str,
    item_count: DataFrame,
    k: int = 4,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every anchor key, ``k`` pseudo-random candidate items drawn by
    the portable md5 hash (same candidates on any engine/run/layout),
    minus any that are actually positives (anti-join) — the
    (anchor, negative) side of a two-tower / contrastive dataset.

    ``item_count`` is a 1-row frame with column ``np`` (the item-id
    space size); it broadcasts, so the generator is a narrow explode —
    no scan of the item table per anchor. Collision-dropped candidates
    are NOT re-drawn (yield is k minus the tiny positive-collision
    rate, ~|order|/|items|); callers needing exactly-k oversample and
    window-trim. The anti-join shuffles on (key, item) — the same key
    the positives table is already organized by."""
    cand = keys.select(key_col).withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    cand = cand.crossJoin(F.broadcast(item_count))
    seed = F.concat(
        F.col(key_col).cast("string"), F.lit("_"), F.col("i").cast("string")
    )
    h = F.conv(F.substring(F.md5(seed.cast("binary")), 1, 8), 16, 10).cast("bigint")
    cand = cand.withColumn("neg_item", (h % F.col("np")) + 1).drop("np")
    pos = positives.select(
        F.col(pos_key).alias("__pk"), F.col(pos_item).alias("__pi")
    ).distinct()
    return cand.join(
        pos,
        (cand[key_col] == F.col("__pk")) & (cand["neg_item"] == F.col("__pi")),
        "left_anti",
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle for training-data ordering:
    every row gets a (shard, shard_pos) address derived solely from
    md5(key || ':' || seed) — reproducible across runs, engines, and
    cluster sizes, unlike ORDER BY rand() (non-reproducible) or
    zipWithIndex (partitioning-dependent RDD API).

    The first hex byte of the digest is the shard (256-way split) and
    rank-within-shard orders by the full digest — so there is NO
    global window: one shuffle on the shard key, a per-shard
    row_number, each shard ~n/256 rows. A trainer streams shards in
    order (or shuffles shard order per epoch) and gets a uniform
    random permutation with O(n/256) per-task state. Changing the
    seed re-permutes everything.
    """
    from pyspark.sql import Window

    hx = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")).cast("binary")
    )
    w = Window.partitionBy(shard_col).orderBy("__hx", key_col)
    return (
        df.withColumn("__hx", hx)
        .withColumn(shard_col, F.substring(F.col("__hx"), 1, 2))
        .withColumn(pos_col, F.row_number().over(w).cast("bigint"))
        .drop("__hx")
    )


def split_kfold(
    df: DataFrame,
    key_col: str,
    strata_col: str | None = None,
    k: int = 5,
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment, stratified
    when ``strata_col`` is given: rows rank inside each stratum by
    (md5(key), key) and fold = rank mod k — round-robin dealing, so
    every stratum's rows spread across folds within one row of n/k
    (the mod rule IS the interleave here, unlike a threshold split).
    Same determinism/growth trade-off as :func:`split_stratified`:
    reproducible under any partitioning, ranks reshift on insert.
    One shuffle on the stratum (or one global-ish window under a
    single constant stratum when unstratified — use a real stratum
    column at scale)."""
    from pyspark.sql import Window

    order = F.md5(F.col(key_col).cast("string").cast("binary"))
    part = [strata_col] if strata_col else [F.lit(0)]
    w = Window.partitionBy(*part).orderBy(order, F.col(key_col))
    return df.withColumn(
        out_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


def group_kfold(
    df: DataFrame,
    group_col: str,
    k: int = 5,
    out_col: str = "fold",
) -> DataFrame:
    """GROUP-aware k-fold assignment: fold = hash_bucket(group) % k, so
    every row of a group (user, session, document cluster) lands in the
    SAME fold — the leakage-free CV split for grouped data, where
    row-level k-fold (:func:`split_kfold`) would let one user's events
    straddle train and validation and leak identity features across
    the boundary.

    Narrow per-row expression — no shuffle, no window, no driver state;
    stable under corpus growth (new groups never move old ones)."""
    return df.withColumn(
        out_col, (hash_bucket(F.col(group_col)) % k).cast("int")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.7,
    n_target: int = 200,
) -> DataFrame:
    """Temperature-scaled source mixture: sample ~``n_target`` rows with
    per-group shares proportional to n_g^alpha (alpha < 1 upweights
    small groups) — the multilingual-LM language-mix rule (mT5/XLM-R
    style) that keeps head languages from drowning the tail. Each
    group's quota is floor(n_target * share) capped at the group's own
    size; members are picked in (md5(key), key) hash order, so the
    draw is deterministic under any partitioning and decorrelated from
    storage order.

    Parity shape (NOTES.md): n^alpha rounds to 9 dp into DECIMAL
    before the associative share denominator; the share and quota are
    one fixed double chain (round 12 dp before the floor, so the
    boundary cannot flip on a last-ulp difference).

    Scale shape: quotas come from one partial-agg pass reduced to
    |groups| rows that BROADCAST back; member ranking is one shuffle
    on the group with per-partition sort (row_number), no global
    sort."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    p9 = trunc_dp(F.pow(F.col("__n").cast("double"), F.lit(alpha)), 9).cast(
        "decimal(18,9)"
    )
    wall = Window.partitionBy()
    share = trunc_dp(
        F.col("__p").cast("double") / F.sum("__p").over(wall).cast("double"), 12
    )
    quotas = (
        counts.select(group_col, "__n", p9.alias("__p"))
        .select(
            group_col,
            F.least(
                F.col("__n"),
                F.floor(F.lit(float(n_target)) * share).cast("long"),
            ).alias("__quota"),
        )
    )
    order = F.md5(F.col(key_col).cast("string").cast("binary"))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.join(F.broadcast(quotas), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def epoch_repeat(
    df: DataFrame,
    group_col: str,
    key_col: str,
    factors: dict[str, float],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Fractional-epoch upsampling: repeat each group's rows by its
    recipe factor — factor 2.3 means two full copies of every row plus
    a deterministic ~30% hash-picked third copy. The data-mixture
    "repeat factor" from LM training recipes (small high-quality
    sources see >1 epoch per pass over the mixture). Groups absent
    from ``factors`` default to 1.0; emitted rows carry ``copy_idx``
    (1-based) so downstream shuffles can decorrelate copies.

    Determinism: the fractional copy keys on the same md5 bucket as
    :func:`deterministic_sample` — same rows selected on every
    run/engine/partitioning.

    Scale shape: the factor table is a broadcast literal; repetition
    is a narrow ``explode(sequence(...))`` — output size is the
    recipe's own blow-up, with no shuffle at all."""
    fac = df.sparkSession.createDataFrame(
        [(g, float(f)) for g, f in factors.items()], f"{group_col} STRING, __f DOUBLE"
    )
    cut = (F.col("__f") % 1.0) * buckets
    n_copies = (
        F.floor(F.col("__f")).cast("int")
        + (hash_bucket(F.col(key_col), buckets) < cut).cast("int")
    )
    return (
        df.join(F.broadcast(fac), group_col, "left")
        .withColumn("__f", F.coalesce(F.col("__f"), F.lit(1.0)))
        .withColumn("__n", n_copies)
        .filter(F.col("__n") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__f", "__n")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    seq_len: int = 512,
    shards: int = 16,
    buckets: int = BUCKETS,
) -> DataFrame:
    """(shard, bin_id, id, n_tokens): first-fit-decreasing sequence
    packing — assign documents to fixed-capacity training sequences so
    padding waste is minimized (the pretraining "sequence packing"
    step; FFD fills >= ~99% on heavy-tailed length mixes vs ~60% for
    one-doc-per-sequence). Documents longer than ``seq_len`` get a
    singleton bin (truncation is the chunker's job, not the packer's).

    Packing is greedy-stateful, so it runs per SHARD inside an
    Arrow-batched applyInPandas kernel: shard = md5 hash of the id
    (deterministic under any partitioning), docs sort (len desc, id)
    inside the shard, bins are per-shard-local. State is one shard's
    (id, len) pairs — size the shard count so that fits an executor
    (a 100M-doc corpus at 64 shards is ~1.5M pairs/shard, trivially
    in-memory; the BLOBS never enter the kernel, only lengths).
    Deterministic: same shard split + same sort = same bins
    everywhere; parity with a python reference model is pinned in
    tests."""
    import pandas as pd

    shard = (hash_bucket(F.col(id_col), buckets) % shards).alias("shard")
    src = df.select(shard, F.col(id_col), F.col(len_col))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([len_col, id_col], ascending=[False, True])
        bins: list[int] = []  # remaining capacity per bin
        out_bin = []
        for ln in pdf[len_col]:
            ln = int(min(ln, seq_len))
            placed = None
            for i, rem in enumerate(bins):
                if rem >= ln:
                    placed = i
                    bins[i] = rem - ln
                    break
            if placed is None:
                bins.append(seq_len - ln)
                placed = len(bins) - 1
            out_bin.append(placed)
        pdf = pdf.copy()
        pdf["bin_id"] = out_bin
        return pdf

    out_schema = f"shard BIGINT, {id_col} BIGINT, {len_col} BIGINT, bin_id INT"
    return (
        src.groupBy("shard")
        .applyInPandas(pack, schema=out_schema)
        .withColumnRenamed(len_col, "n_tokens")
    )


def time_series_cv_folds(
    df: DataFrame,
    ts_col: str,
    k: int = 5,
    horizon_days: int = 7,
) -> DataFrame:
    """(fold, train_end, test_end, n_train, n_test): rolling-origin
    (expanding-window) cross-validation folds for time-series models —
    fold i trains on everything up to cut_i and tests on the next
    ``horizon_days``; cuts spread evenly over the usable span. The
    backtesting split that random k-fold gets WRONG for temporal data
    (it leaks the future into training).

    All cut arithmetic is integer epoch-days (engine-portable);
    counts are counts. One bounds aggregate reduces to a scalar row;
    the fold table is a k-row literal range; membership is one narrow
    k-way conditional fan-out of the fact plus a bounded hash agg —
    the fact is scanned once and never shuffled by more than the
    k-row aggregate."""
    day = F.floor(F.col(ts_col).cast("timestamp").cast("double") / 86400.0).cast(
        "long"
    )
    src = df.select(day.alias("__d"))
    bounds = src.agg(
        F.min("__d").alias("__mn"), F.max("__d").alias("__mx")
    )
    folds = df.sparkSession.range(k).select(F.col("id").alias("fold"))
    cuts = folds.crossJoin(F.broadcast(bounds)).select(
        "fold",
        (
            F.col("__mn")
            + F.floor(
                (F.col("fold") + 1)
                * (F.col("__mx") - F.lit(horizon_days) - F.col("__mn"))
                / F.lit(k)
            )
        ).alias("train_end"),
    ).withColumn("test_end", F.col("train_end") + F.lit(horizon_days))
    joined = src.crossJoin(F.broadcast(cuts))
    return (
        joined.groupBy("fold", "train_end", "test_end")
        .agg(
            F.count(F.when(F.col("__d") <= F.col("train_end"), 1)).alias(
                "n_train"
            ),
            F.count(
                F.when(
                    (F.col("__d") > F.col("train_end"))
                    & (F.col("__d") <= F.col("test_end")),
                    1,
                )
            ).alias("n_test"),
        )
    )


def concat_chunk_pack(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int = 2048,
    nshards: int = 64,
    materialize: bool = False,
) -> DataFrame:
    """Concat-and-chunk packing (the GPT-pretraining layout): documents
    are concatenated in deterministic ``id_col`` order into one global
    token stream and split at fixed ``capacity`` boundaries — documents
    span chunks rather than leaving tail padding (the complement of
    :func:`pack_sequences`' FFD bins, which never split a document but
    can't be expressed without sequential state).

    Returns one row per document: (id, n_tokens, start_off,
    first_chunk, last_chunk, chunks_spanned) — everything a loader
    needs to materialize any chunk, all exact integers.

    Scale shape (the dense_ids pattern): the global exclusive running
    sum is computed by value-range sharding on the id — each shard runs
    ONE bounded local cumsum window, and per-shard base offsets (the
    only driver state: nshards totals) lift local sums to global
    offsets. No single-reducer global window anywhere; at 100 TB every
    shard packs independently. The oracle twin IS the plain global
    window — sharding is a lossless physical optimization."""
    from pyspark.sql import Window

    rows = df.select(
        F.col(id_col).alias("__id"),
        F.col(len_col).cast("long").alias("__len"),
    )
    # Three consumers follow (max(__id) action, per-shard totals
    # collect, final offset plan), so the (id, len) frame — two longs
    # per row — is worth materializing across the TWO driver actions
    # below. Default cache(): the result stays RECOMPUTABLE after
    # executor loss (localCheckpoint blocks are unreplicated — under
    # dynamic allocation at 100 TB a lost executor fails the job), and
    # the entry is UNPERSISTED before returning so repeated calls never
    # accumulate CacheManager entries (the measured winnowing failure
    # mode, NOTES r8); the returned lazy plan recomputes the narrow
    # (id, len) projection once at action time. ``materialize=True``
    # opts into the eager localCheckpoint (blocks live until GC) for
    # callers who want the final pass served from memory too — the
    # same gate incremental_neardup uses.
    rows = rows.localCheckpoint() if materialize else rows.cache()
    mx = rows.agg(F.max("__id").alias("m")).first()["m"]
    if mx is None:
        if not materialize:
            rows.unpersist(False)
        return rows.select(
            F.col("__id").alias(id_col),
            F.col("__len").alias("n_tokens"),
            F.lit(None).cast("long").alias("start_off"),
            F.lit(None).cast("long").alias("first_chunk"),
            F.lit(None).cast("long").alias("last_chunk"),
            F.lit(None).cast("long").alias("chunks_spanned"),
        )
    width = max(1, int(mx) // nshards + 1)
    sharded = rows.withColumn(
        "__shard", (F.col("__id").cast("long") / width).cast("long")
    )
    totals = (
        sharded.groupBy("__shard").agg(F.sum("__len").alias("t")).collect()
    )
    base, run = {}, 0
    for r in sorted(totals, key=lambda r: r["__shard"]):
        base[r["__shard"]] = run
        run += r["t"]
    omap = F.create_map(
        *[F.lit(v) for kv in sorted(base.items()) for v in kv]
    )
    w = (
        Window.partitionBy("__shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        F.coalesce(F.sum("__len").over(w), F.lit(0)) + omap[F.col("__shard")]
    ).cast("long")
    out = sharded.select(
        F.col("__id").alias(id_col),
        F.col("__len").alias("n_tokens"),
        start.alias("start_off"),
    )
    first = F.expr(f"start_off div {capacity}")
    last = F.expr(
        f"CASE WHEN n_tokens > 0 THEN (start_off + n_tokens - 1) div {capacity}"
        f" ELSE start_off div {capacity} END"
    )
    if not materialize:
        rows.unpersist(False)
    return out.select(
        id_col,
        "n_tokens",
        "start_off",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last - first + 1).cast("long").alias("chunks_spanned"),
    )
