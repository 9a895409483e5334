"""Isolated per-query benchmark: min/median of N passes per query in a
fresh session, for adjudicating driver-bench outliers against host
noise (r8 verdict: solo-verify the weak queries on a quiet host).

    python tools/solo_bench.py [--reps N] [--sf DIR] [--prewarm] q1 [q2 ...]

Prints one JSON line per query: {"query": ..., "times": [...],
"min": ..., "median": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcpdatapipelines_spark.session import get_spark

import __spark_entry__ as entry_mod


def main() -> None:
    args = sys.argv[1:]
    reps, sf_dir, do_prewarm = 5, "/root/testdata/sf0.1", False
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--prewarm":
            do_prewarm = True; i += 1
        else:
            names.append(args[i]); i += 1
    spark = get_spark("solo-bench")
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).write.mode(
        "overwrite"
    ).format("noop").save()
    if do_prewarm and hasattr(entry_mod, "prewarm"):
        entry_mod.prewarm(spark, sf_dir)
    queries = entry_mod.queries()
    for name in names:
        fn = queries[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": sf_dir,
                    "prewarm": do_prewarm,
                    "times": times,
                    "min": min(times),
                    "median": round(statistics.median(times), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
