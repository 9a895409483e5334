"""Benchmark harness: runs the catalog's queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output (driver tail-captures stdout with a bounded buffer — round 2's
single giant line overflowed it): several short
``{"metric": "catalog_queries_part", ...}`` lines carrying the
per-query map in <=1.2 KB chunks, then ONE compact summary line LAST:

    {"metric": "catalog_total_wall", "value": N, "unit": "sec", ...}

The complete record is also written to BENCH_SELF.json next to this
file. One SparkSession for the whole run (JVM startup amortized —
BASELINE.md); each query is timed over a no-op write so the full plan
executes without driver-side collection costs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcpdatapipelines_spark.session import get_spark

import __spark_entry__ as entry_mod


def run_once(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark("bench")

    # JVM warmup outside the timed loop: first-ever job pays class
    # loading, codegen-compiler, and parquet-reader init (~5 s) that
    # belongs to session startup, not to whichever query runs first.
    # Touches only a trivial range agg + the smallest dimension table.
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()

    # Shared-prep pre-warm (r8 verdict #1b): the dedup/text family all
    # reads the same persisted token/shingle/signature preps; filling
    # those caches inside the timed window charges the one-time build
    # to whichever consumer runs first, so its number wanders
    # round-over-round. At 100 TB the preps are materialized once per
    # corpus snapshot — warming them here matches that cost model.
    prewarm_sec = 0.0
    if hasattr(entry_mod, "prewarm"):
        t_pw = time.time()
        try:
            entry_mod.prewarm(spark, sf_dir)
        except Exception as exc:
            # a broken prep must not kill the whole bench: the affected
            # family will rebuild (or record -1) inside its own timed
            # try/except, the other ~280 queries still report
            print(f"bench prewarm failed (continuing): {exc}", file=sys.stderr)
        # On the record (r10 verdict #5): how many seconds of shared-prep
        # work the untimed window absorbed, so extensions of the prewarm
        # list can never silently flatter round-over-round deltas.
        prewarm_sec = round(time.time() - t_pw, 3)

    queries = entry_mod.queries()
    # Two passes over the catalog, per-query time = min of the two.
    # Pass 1 carries each query's one-shot costs (whole-stage-codegen
    # compile, Python-worker spinup, parquet footer reads) plus any
    # host-noise spike (this box is a shared microVM — single runs of
    # the dedup heavies have swung 5-10x between back-to-back bench
    # runs); the min is the reproducible steady-state cost of the
    # PLAN, which is what round-over-round comparison needs. Both
    # totals are reported: cold_total_wall (pass-1 sum, the old
    # single-run methodology) and the headline min-based value.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    t_all = time.time()
    # Reps run BACK-TO-BACK per query (r9): with the old
    # whole-catalog-then-repeat interleaving, 285 other queries evicted
    # every plan-level cache (janino ~100-class LRU, analysis
    # structures) between a query's two passes, so min-of-2 stayed COLD
    # for any query with expensive unique codegen — the measured number
    # was "compile cost under eviction", not the steady-state plan cost
    # this bench documents itself as reporting (solo-verified: the
    # heavy ANN family runs 1.5-3 s warm but 6-7 s under the old
    # interleaving). Pass 1 still lands in cold[] (first-run cost, the
    # old single-run methodology), so both totals remain comparable.
    for name, fn in queries.items():
        for rep in range(max(1, reps)):
            t0 = time.time()
            try:
                run_once(fn(spark, sf_dir))
                t = round(time.time() - t0, 3)
            except Exception as exc:  # keep the bench line parseable on failure
                t = -1.0
                if rep == 0:
                    print(f"bench error in {name}: {exc}", file=sys.stderr)
            if rep == 0:
                cold[name] = t
                timings[name] = t
            elif t >= 0 and (timings[name] < 0 or t < timings[name]):
                timings[name] = t
    wall = round(time.time() - t_all, 3)
    total = round(sum(v for v in timings.values() if v > 0), 3)
    cold_total = round(sum(v for v in cold.values() if v > 0), 3)

    # The driver tail-captures stdout with a bounded buffer: one giant
    # line with all 127 per-query timings overflowed it in round 2
    # ("parsed": null). Emit the per-query map CHUNKED across short
    # earlier lines, then a compact summary (total first) as the FINAL
    # line so the last line always fits the buffer and parses alone.
    # Chunks are ordered FASTEST queries first (r10 verdict #2): the
    # driver's tail buffer keeps only the last few KB, so the chunks
    # nearest the summary — the ones that survive — carry the slowest
    # queries, which are the ones per-query regression tracking needs.
    names = sorted(timings, key=lambda n: timings[n])
    chunk: dict[str, float] = {}
    chunks: list[dict[str, float]] = []
    for n in names:
        chunk[n] = timings[n]
        if len(json.dumps(chunk)) > 1200:
            chunks.append(chunk)
            chunk = {}
    if chunk:
        chunks.append(chunk)
    for i, part in enumerate(chunks, 1):
        print(
            json.dumps(
                {
                    "metric": "catalog_queries_part",
                    "part": i,
                    "of": len(chunks),
                    "queries": part,
                }
            )
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:8]
    )
    # Per-query deltas vs the PREVIOUS bench run on this machine
    # (BENCH_SELF.json before we overwrite it below): the largest
    # absolute regressions/improvements ride inside the summary line
    # itself, so the driver's bounded tail always sees them even when
    # the full per-query chunks scroll out of its buffer (r10 verdict
    # #2 — PERF_r10 had per_query: {} / n_common: 0).
    top_deltas: dict[str, list[float]] = {}
    self_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF.json"
    )
    try:
        with open(self_path) as fh:
            prev = json.load(fh).get("queries", {})
        deltas = sorted(
            (
                (n, prev[n], t)
                for n, t in timings.items()
                if n in prev and prev[n] > 0 and t > 0
            ),
            key=lambda x: abs(x[2] - x[1]),
            reverse=True,
        )
        top_deltas = {n: [p, t] for n, p, t in deltas[:8]}
    except Exception:
        pass
    summary = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": sum(1 for v in timings.values() if v < 0),
        # Methodology version for cross-round tooling (r9 ADVICE):
        # rev 1 = whole-catalog-then-repeat interleaving, no prewarm
        #         (rounds 1-8);
        # rev 2 = back-to-back reps per query + shared preps pre-warmed
        #         outside the timed window (round 9+). cold_total_wall
        #         stays the pass-1 sum under whichever rev produced it.
        "bench_rev": 2,
        "method": f"min of {reps} back-to-back passes per query, "
        "one shared session, shared preps pre-warmed",
        "cold_total_wall": cold_total,
        "bench_wall": wall,
        "prewarm_sec": prewarm_sec,
        "slowest": slowest,
        "top_deltas": top_deltas,
    }
    # Full machine-readable record on disk regardless of stdout capture.
    with open(self_path, "w") as fh:
        json.dump({**summary, "queries": timings, "cold_queries": cold}, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
