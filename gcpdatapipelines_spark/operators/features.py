"""Feature engineering for model-training pipelines: smoothed target
encoding and exact equal-frequency (quantile) binning.

The two table-stakes tabular-feature transforms between a raw fact
table and a trainer: categorical columns become leak-resistant numeric
encodings, numeric columns become balanced ordinal bins. No reference
analogue (the reference's pipelines stop at aggregation,
pipeline.py:44-71) — this is training-data-pipeline surface.

Scale shape: both operators reduce the fact to a bounded aggregate
(|categories| rows, or one quantile row) before any second pass; the
per-row binning join is a broadcast of ONE scalar row, so the fact
never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .portable import trunc_dp


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 50.0,
    ndigits: int = 4,
) -> DataFrame:
    """(category, n_obs, target_enc): smoothed mean-target encoding
    enc_c = (sum_c + m * prior) / (n_c + m), prior = global mean —
    the standard high-cardinality categorical encoding (Micci-Barreca
    2001). ``m`` is the pseudo-count pulling rare categories toward
    the prior.

    Parity shape (NOTES.md): both sums are EXACT decimals (immune to
    partial-agg reassociation); the encoding is ONE fixed double chain
    shared textually with the oracle. The global totals come from an
    unbounded window over the per-category AGGREGATE (|categories|
    rows), never a second fact scan.

    Scale shape: one map-side-combinable hash aggregate on the
    category; everything after runs on the bounded aggregate."""
    per = df.groupBy(cat_col).agg(
        F.sum(F.col(target_col).cast("decimal(18,2)")).alias("__s"),
        F.count(target_col).alias("__c"),
    )
    w = Window.partitionBy()
    prior = F.sum("__s").over(w).cast("double") / F.sum("__c").over(w)
    return per.select(
        F.col(cat_col),
        F.col("__c").alias("n_obs"),
        trunc_dp(
            (F.col("__s").cast("double") + F.lit(m) * prior)
            / (F.col("__c") + F.lit(m)),
            ndigits,
        ).alias("target_enc"),
    )


def quantile_bin_summary(
    df: DataFrame,
    value_col: str,
    nbins: int = 4,
) -> DataFrame:
    """(bin, n_rows, lo, hi): equal-frequency binning against EXACT
    interpolated quantile cutpoints, summarized per bin — the
    discretization behind ordinal features, stratified samplers, and
    score calibration buckets. Boundary values (x == cutpoint) fall in
    the LOWER bin.

    Parity shape: Spark's exact ``percentile`` and DuckDB's
    ``quantile_cont`` both interpolate h=(n-1)p between the same order
    statistics (proven bit-identical by a18), and bin assignment is
    pure comparison — no arithmetic survives into the output (lo/hi
    are copies of raw values).

    Scale shape: the quantile pass reduces to ONE row that broadcasts
    back over the fact (scalar cross join — never a shuffle of the
    fact); the per-bin summary is one map-side-combinable hash
    aggregate on <= nbins keys. Exact percentile sorts per partition
    at scale — swap in approx_percentile upstream when cutpoint
    exactness stops mattering."""
    probs = [i / nbins for i in range(1, nbins)]
    cuts = df.agg(
        F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs])).alias(
            "__q"
        )
    )
    x = F.col(value_col)
    bin_expr = F.lit(1)
    for i in range(len(probs)):
        bin_expr = bin_expr + (x > F.get(F.col("__q"), i)).cast("int")
    return (
        df.join(F.broadcast(cuts))
        .select(bin_expr.alias("bin"), x)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    event_col,
    ndigits: int = 6,
) -> DataFrame:
    """Weight-of-evidence encoding + information value per category —
    the classic credit-scoring / feature-screening transform for a
    categorical predictor against a binary outcome.

    ``event_col``: boolean Column marking the positive class.
    Per category: woe = ln((ev_c/ev_tot)/(ne_c/ne_tot)), iv_term =
    (ev_c/ev_tot - ne_c/ne_tot)·woe; ``iv_total`` (repeated on every
    row) is the whole feature's screening score.

    Parity shape: all the ratios reduce to integer-count arithmetic;
    woe is ONE log of an integer-product ratio
    (ln(ev_c·ne_tot / (ne_c·ev_tot))) and iv_total is folded over the
    category-sorted term array (NOTES.md fold parity), so every value
    is bit-identical across engines. Categories with a zero class
    count are excluded (their WoE is ±inf; production applies
    Laplace smoothing, which would put a tuning constant under the
    oracle for no test value).

    Scale shape: one partial+final hash aggregate to the category
    dictionary; everything after runs on that tiny frame."""
    cats = df.groupBy(cat_col).agg(
        F.count(F.when(event_col, 1)).alias("n_event"),
        F.count(F.when(~event_col, 1)).alias("n_nonevent"),
    ).filter((F.col("n_event") > 0) & (F.col("n_nonevent") > 0))
    from pyspark.sql import Window

    wa = Window.partitionBy()
    withtot = cats.select(
        F.col(cat_col),
        "n_event",
        "n_nonevent",
        F.sum("n_event").over(wa).alias("__et"),
        F.sum("n_nonevent").over(wa).alias("__nt"),
    )
    ev = F.col("n_event").cast("double")
    ne = F.col("n_nonevent").cast("double")
    et = F.col("__et").cast("double")
    nt = F.col("__nt").cast("double")
    woe = F.log((ev * nt) / (ne * et))
    term = (ev / et - ne / nt) * woe
    scored = withtot.select(
        F.col(cat_col),
        "n_event",
        "n_nonevent",
        trunc_dp(woe, ndigits).alias("woe"),
        trunc_dp(term, ndigits).alias("iv_term"),
        term.alias("__term"),
    )
    total = scored.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(cat_col), F.col("__term")))
        ).alias("__terms")
    ).select(
        trunc_dp(
            F.aggregate(
                F.col("__terms"),
                F.lit(0.0),
                lambda acc, x: acc + x.getField("__term"),
            ),
            ndigits,
        ).alias("iv_total")
    )
    return scored.drop("__term").crossJoin(F.broadcast(total))
