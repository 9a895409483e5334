"""Regenerate PLANS.md: formatted physical plans of the headline
queries with the scale-relevant properties called out. Run after plan-
affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcpdatapipelines_spark import plans
from gcpdatapipelines_spark.queries import SPARK_QUERIES
from gcpdatapipelines_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"

HEADLINERS = {
    "text_line_dedup": (
        "C4 line dedup: first-owner election is a combiner-safe "
        "min(struct) hash agg + equi-join on the line hash — never a "
        "row_number window over a skewable hash partition."
    ),
    "pipeline_c4_funnel": (
        "Five cleaning stages fused into ONE plan: narrow flag "
        "expressions at the scan, line/exact dedup as agg+join, one "
        "doc-keyed funnel join, one source rollup."
    ),
    "j13_interval_overlap": (
        "Range x range overlap join as an epoch-grid EQUI join; the "
        "bucket-of-overlap-start rule dedupes without a distinct."
    ),
    "dedup_sorted_neighborhood": (
        "SNM window pairing: NO join operator in the plan at all — "
        "O(n*w) lead() comparisons inside content-blocked partitions."
    ),
    "ts_cusum_alarm": (
        "Sequential CUSUM fold scoped to bounded (key, period) arrays; "
        "reference moments broadcast back — the fact is never "
        "shuffled for a join."
    ),
    "a44_ks_test": (
        "KS statistic: conditional counts combine map-side; the "
        "cumulative window runs over the bounded distinct-value grid, "
        "not the fact."
    ),
    "q15_top_supplier": (
        "ONE lineitem scan: the max-revenue subquery is a window over "
        "the supplier-sized aggregate, not a second CTE scan."
    ),
    "sketch_quantile_bottomk": (
        "Bottom-k sample window ranks only the hash-threshold "
        "survivors (u <= 4k/n broadcast-joined); the fact is never "
        "shuffle-sorted."
    ),
    "sketch_hll_sliding_wau": (
        "Per-day HLL registers collapse BEFORE the 7-day fan-out — "
        "window state fixed at 2^9 rows/day regardless of user count."
    ),
    "seq_pattern_negation": (
        "CEP negative pattern in ONE window pass (conditional "
        "next-goal/next-blocker mins over the following frame); no "
        "self-join anywhere."
    ),
    "profile_join_size": (
        "Join cardinality from tiny sampled-key histograms; the full "
        "fact reduces to per-key counts once, the histograms join "
        "tiny-to-tiny."
    ),
    "flagship_nation_rollup": (
        "3 dimension joins all broadcast; lineitem scan pruned to 4/11 "
        "columns; single exchange (the final groupBy)."
    ),
    "q1_pricing_summary": (
        "Date predicate in PushedFilters; partial+final hash aggregate "
        "(map-side combine before the one shuffle)."
    ),
    "q6_forecast_revenue": (
        "All four predicates reach the scan; no shuffle beyond the "
        "single-row aggregate."
    ),
    "j1_broadcast_enrich": "Pure broadcast enrichment: zero exchanges.",
    "pivot_returnflag": (
        "Dynamic pivot as two hash aggregates; scan pruned to the 3 "
        "involved columns."
    ),
    "dedup_ngram_jaccard": (
        "Shingle self-join shuffles on shingle content; sizes/intersections "
        "partial-aggregated before their shuffles."
    ),
    "sim_topk_bruteforce": (
        "Query side broadcast (BroadcastNestedLoopJoin over 3 query rows); "
        "per-query ranking window is the only shuffle."
    ),
    "sim_embedding_neardup": (
        "Pruned pair scan: centroid assignment is inlined literal "
        "scalar arithmetic (zero shuffles, no crossJoin), candidate "
        "cell pairs are a driver-computed literal frame (broadcast), "
        "and the vector sides hash-join EQUI on cell id — no cartesian "
        "or nested-loop node anywhere in the plan."
    ),
    "j6_asof_join": (
        "As-of join as union+window: exactly ONE exchange (the per-key "
        "sort); no join node, no pair materialization."
    ),
    "merge_upsert": (
        "Full-row MERGE as broadcast-anti + union: the target side has "
        "zero exchanges — at 100 TB the fact table never shuffles."
    ),
    "q7_volume_shipping": (
        "The nation dimension joined twice under different aliases — "
        "both instances broadcast, so the lineitem fact flows through "
        "five joins with only the final aggregate exchange."
    ),
    "q17_small_qty_revenue": (
        "Correlated scalar subquery decorrelated: ONE aggregate over "
        "lineitem joined back on l_partkey — no per-row re-aggregation."
    ),
    "text_contamination": (
        "Benchmark shingles broadcast to the candidate side (left "
        "broadcast join on shingle), then one per-doc aggregation — the "
        "corpus never self-joins."
    ),
    "scd2_event_history": (
        "Change-detection lag and validity lead share one (user, ts) "
        "partitioning: ONE exchange for the whole SCD2 build."
    ),
    "diff_snapshots": (
        "Full-outer key join carries presence markers; payload compare "
        "is column-wise in the join projection — one shuffle, no "
        "driver-side comparison."
    ),
    "profile_orders": (
        "All per-column stats in one scan: single aggregate with an "
        "Expand for the multi-column exact distincts, stack() unpivot."
    ),
    "seq_user_events": (
        "collect_list + in-array sort: one shuffle on user_id; ordering "
        "does not rely on shuffle order (deterministic under retries)."
    ),
    "w9_rolling_mean": (
        "Decimal moving sum in a rowsBetween frame over one (user, ts) "
        "sort — engine-exact means with a single exchange."
    ),
    "ts_gapfill_ffill": (
        "Per-key day grid via sequence+explode (narrow, no global "
        "calendar cross join); grid join and forward-fill window share "
        "the (user, day) partitioning."
    ),
    "dedup_span_detect": (
        "No document-pair join anywhere: one shingle-frequency shuffle "
        "(partial-agg count-distinct), one equi-join back on shingle, "
        "then per-doc gaps-and-islands windows on one (doc) partitioning."
    ),
    "dedup_jaccard_prefix": (
        "Prefix-filtered All-Pairs: the candidate join sees only each "
        "doc's rarest (1-t)|d|+1 shingles; verify restricted to "
        "candidate docs by semi-join. Lossless (shares the exact "
        "oracle); no cartesian."
    ),
    "graph_triangles": (
        "Degree-oriented wedge join (out-degree O(sqrt m) bounds the "
        "only super-linear step); triangles exploded once into member "
        "nodes — no 3-way self-union re-execution."
    ),
    "w15_attribution": (
        "Both attribution models from ONE strictly-preceding window "
        "frame (last+first ignorenulls share the sort); two channel "
        "rollups are partial-agg."
    ),
    "sim_pq_adc": (
        "ADC scan reads only the m-int codes (posexplode) against a "
        "broadcast per-query LUT — the corpus vectors are never touched "
        "at query time; the m-bytes-per-row scan is PQ's point."
    ),
    "ts_resample_ohlc": (
        "ONE partial+final aggregate (min_by/max_by combine map-side on "
        "the portable string sort key); a (user, hour) row per map task "
        "crosses the wire."
    ),
    "sim_tfidf_cosine": (
        "Candidates via token equi-joins with the query side broadcast — "
        "no doc-by-doc cartesian; dots/norms are decimal-exact sums, so "
        "the plan carries plain hash aggregates."
    ),
    "sim_quantize_int8": (
        "Fully narrow codegen: zero exchanges — the corpus scan IS the "
        "quantization."
    ),
    "text_chunk_overlap": (
        "Narrow tokenize + sequence + slice pipeline, zero shuffles; "
        "chunk starts generated per row."
    ),
    "sim_opq_topk": (
        "Rotation/codebooks are driver-side sample-trained metadata; the "
        "distributed plan is ONE fused Arrow kernel (rotate + per-sub "
        "argmin encode, no unrolled codegen) + broadcast LUT ADC scan."
    ),
    "sim_ivf_topk": (
        "Deterministic seeded IVF, oracle-backed end to end: broadcast-"
        "seed assignment argmax, per-query probe window over nlist rows, "
        "broadcast probe-list candidate join — scanned fraction "
        "~nprobe/nlist, no cartesian."
    ),
    "w18_rolling_distinct_users": (
        "Bounded 7x fan-out of distinct (user, day) pairs + one distinct "
        "aggregate — no per-day re-scan, no window COUNT DISTINCT."
    ),
    "w17_session_table": (
        "ONE (user, ts, event_id) sort shared by the gap-lag and "
        "session-sum windows, one rollup; bounds emitted relative to a "
        "broadcast 1-row corpus min — shift-invariant, no single-"
        "partition window anywhere."
    ),
    "sketch_bloom_filter": (
        "k salted bit positions from ONE scan per side via "
        "explode(array(h0..h6)) — the k-armed union form re-read each "
        "side k times; bit set and membership audit stay broadcast-"
        "joined aggregates."
    ),
    "dedup_incremental_neardup": (
        "Corpus state is distinct band keys; increment signatures join it "
        "bucket-keyed (anti), then bucket-min — no O(n^2), no text "
        "retention."
    ),
    "layout_zorder": (
        "Morton interleave as a pure codegen'd shift/or chain over "
        "pre-bucketed ints — no exchange at all until a writer "
        "range-partitions on z."
    ),
    "ts_merge_intervals": (
        "Gaps-and-islands in ONE user-partitioned window family plus a "
        "co-partitioned agg — no self-join, no join node at all."
    ),
    "graph_adamic_adar": (
        "Wedges from a center-keyed equi self-join of the annotated "
        "adjacency; existing edges leave via a hash anti-join; the cut "
        "is TakeOrderedAndProject — no cartesian, no global sort."
    ),
    "feat_quantile_bin": (
        "Exact quantile cutpoints reduce to ONE scalar row that "
        "broadcasts back over the fact (BroadcastNestedLoopJoin over "
        "one row) — the fact never shuffles for the binning."
    ),
    "text_bigram_nll": (
        "Bigrams from a narrow indexed transform (no window, no "
        "self-join); count dictionaries partial-agg; vocabulary rides "
        "one broadcast scalar row."
    ),
    "pipeline_session_analytics": (
        "Five audited operators fused into one plan: session windows "
        "and conversion flags both keyed on user_id (AQE coalesces "
        "their exchanges at the per-user join); dimensions broadcast; "
        "nation rollup is a bounded hash agg."
    ),
    "a43_theil_sen": (
        "Robust trend: fact collapses to the calendar-bounded daily "
        "grid FIRST (partial+final decimal agg), so the pairwise-slope "
        "self-join is |days|^2/2 per key — bounded by the calendar, "
        "never fact rows; median is a bounded per-key window."
    ),
    "graph_jaccard_neighbors": (
        "Wedge self-equi-join on the shared-neighbor center (bounded "
        "by max degree), exact-integer ppm score, TakeOrdered cut — "
        "no global sort, no cartesian, no doubles."
    ),
    "sample_concat_chunks": (
        "Concat-and-chunk packing: global exclusive prefix sum via "
        "value-range shards (bounded local cumsum windows + driver "
        "shard offsets) — never a single-reducer global window."
    ),
    "w30_shapley_attribution": (
        "Exact-integer Shapley with NO 2^k enumeration: one "
        "user-keyed window pass, hash aggs to <= 2^k observed "
        "coalitions, then a bounded channels x coalitions broadcast "
        "join — fully distributed, zero doubles."
    ),
    "a26_hll_rollup": (
        "Mergeable rollup: per-shard md5 registers (bounded "
        "shards x 2^9 rows) max-merged, dyadic-exact estimate fold; "
        "the fact is scanned once, only registers shuffle."
    ),
}


def main() -> None:
    spark = get_spark("dump-plans")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        "Generated by `python tools/dump_plans.py` at sf0.01. These are the",
        "plans the engine is designed to produce; tests/test_plans.py pins",
        "the load-bearing properties so regressions fail CI.",
        "",
    ]
    for name, note in HEADLINERS.items():
        df = SPARK_QUERIES[name](spark, SF_DIR)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why this plan scales:** {note}")
        out.append("")
        out.append("```")
        out.append(plans.formatted_plan(df).strip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(HEADLINERS)} plans")


if __name__ == "__main__":
    main()
