"""Cold-pass decomposition for the BENCH_SELF top cold-warm gaps.

For each named query, runs pass1 (cold) and pass2 (warm) back-to-back
in one warmed session (same shape as bench.py) and records per pass:
  - build_s: python-side plan construction time (queries()[name] call)
  - exec_s:  noop-write execution time
  - cg_n / cg_ms: delta of the JVM whole-stage-codegen compile
    counter / total compile time (CodegenMetrics histograms), i.e. how
    much of the cold cost is janino.
Usage: python tools/prof_cold.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcpdatapipelines_spark.session import get_spark

import __spark_entry__ as entry_mod

DEFAULT = [
    "sim_neardup_blas",
    "sim_srp_lsh",
    "sim_opq_topk",
    "dedup_cluster_assign",
    "dedup_jaccard_prefix",
    "dedup_winnowing",
    "dedup_incremental_neardup",
    "w27_peak_concurrency",
    "j5_resolver_enrich",
    "q16_supplier_cnt",
    "set_except",
    "dedup_semantic_keep",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prof-cold")
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.mode("overwrite").format(
        "noop"
    ).save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()
    if hasattr(entry_mod, "prewarm"):
        entry_mod.prewarm(spark, sf_dir)

    jvm = spark.sparkContext._jvm
    cg = jvm.org.apache.spark.metrics.source.CodegenMetrics
    t_hist = cg.METRIC_COMPILATION_TIME()

    def cg_state():
        return t_hist.getCount(), t_hist.getSnapshot().getMean() * t_hist.getCount()

    queries = entry_mod.queries()
    out = {}
    for name in names:
        fn = queries[name]
        rec = []
        for rep in range(2):
            n0, ms0 = cg_state()
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.time()
            n1, ms1 = cg_state()
            rec.append(
                {
                    "build_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "cg_n": int(n1 - n0),
                    "cg_ms": round(ms1 - ms0),
                }
            )
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
