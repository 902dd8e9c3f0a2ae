#!/usr/bin/env python
"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the official bench (bench.py is frozen for measurement) — this file
exists so optimization work can time one query at a time with the noop
sink, capture `.explain("formatted")` plans, and compare before/after
without touching the driver contract.

  python bench_extra.py --sf /root/testdata/sf1.0 \
      --queries q_sort_lineitem,q_dedup_minhash --repeat 3 \
      --explain plans/r07 --suffix _before

Prints one JSON line: {"queries": {name: [t1, t2, ...]}, "sf": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CPUS, build_spark, warmup  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma list; default = bench HEADLINE")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps")
    ap.add_argument("--flagship", action="store_true", help="also run flagship_pipeline")
    args = ap.parse_args()

    from bench import HEADLINE
    from external_merge_sort_loser_tree_ovc_spark.queries import QUERIES

    names = args.queries.split(",") if args.queries else list(HEADLINE)

    spark = build_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark, args.sf)

    out: dict[str, list[float]] = {}
    for name in names:
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        ts = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = ts
        print(f"# {name}: {ts}", file=sys.stderr)

    if args.flagship:
        from external_merge_sort_loser_tree_ovc_spark.plans.pipeline import flagship_pipeline
        from external_merge_sort_loser_tree_ovc_spark.sources.pages import synth_pages

        ts = []
        stages = []
        for _ in range(args.repeat):
            pages = synth_pages(spark, 500_000)
            t0 = time.perf_counter()
            m = flagship_pipeline(spark, pages, num_partitions=CPUS)
            ts.append(round(time.perf_counter() - t0, 3))
            stages.append({k: round(v, 3) for k, v in m.items() if k.startswith("s_")})
            spark.catalog.clearCache()
        out["flagship_pipeline"] = ts
        print(f"# flagship: {ts} stages={stages}", file=sys.stderr)

    print(json.dumps({"queries": out, "sf": args.sf, "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
