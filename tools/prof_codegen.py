"""Catalog-wide codegen-compile census: how much of the cold pass is
janino, and how much the compile cache actually shares across queries.

Runs the whole catalog ONCE (cold shape: every query's first run) in a
warmed, prep-prewarmed session and reports the number of unique
generated classes compiled (CodegenMetrics.METRIC_COMPILATION_TIME
count delta — WSCG fragments plus generated projections / orderings /
predicates) and the reservoir-mean compile latency.

The two session confs under test (r10 cold-pass work, see NOTES.md):

  --cache N       spark.sql.codegen.cache.maxEntries (STATIC conf;
                  default engine value 4096, Spark default 100)
  --use-id        spark.sql.codegen.useIdInClassName=true (Spark
                  default; engine default false) — a per-plan stage ID
                  in the class NAME makes byte-identical stages from
                  different queries miss the source-keyed cache

Measured on the 286-query catalog at sf0.1 (2026-08-16):
  cache=100,  use-id=true :  4453 compiles   (Spark defaults)
  cache=4096, use-id=true :  3116 compiles
  cache=4096, use-id=false:  2653 compiles   (engine defaults)
Compile counts are deterministic per configuration; wall-clock on the
shared bench host is not (±15% same-code swings) — compare counts.

Usage: python tools/prof_codegen.py [--cache N] [--use-id] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcpdatapipelines_spark.session import get_spark

import __spark_entry__ as entry_mod


def main() -> None:
    args = [a for a in sys.argv[1:]]
    cache = "4096"
    use_id = "false"
    if "--cache" in args:
        i = args.index("--cache")
        cache = args[i + 1]
        del args[i : i + 2]
    if "--use-id" in args:
        use_id = "true"
        args.remove("--use-id")
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    spark = get_spark(
        "prof_codegen",
        extra_conf={
            "spark.sql.codegen.cache.maxEntries": cache,
            "spark.sql.codegen.useIdInClassName": use_id,
        },
    )
    jvm = spark.sparkContext._jvm
    hist = jvm.org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME()

    # session warmup + shared preps outside the census, same as bench.py
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.mode(
        "overwrite"
    ).format("noop").save()
    entry_mod.prewarm(spark, sf_dir)

    c_pre = hist.getCount()
    t0 = time.time()
    for name, fn in entry_mod.queries().items():
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    n = hist.getCount() - c_pre
    mean_ms = hist.getSnapshot().getMean()
    print(
        f"cache={cache} use_id={use_id} cold_pass_wall={wall:.1f}s "
        f"classes_compiled={n} mean_compile_ms={mean_ms:.1f} "
        f"est_total_compile_s={n * mean_ms / 1000:.1f}"
    )


if __name__ == "__main__":
    main()
