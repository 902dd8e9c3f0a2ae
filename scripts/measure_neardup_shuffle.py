#!/usr/bin/env python
"""Measure the neardup fallback band's actual shuffle movement at sf1.

r4 verdict #2 asked for MEASURED evidence that the over-cap fallback's
replication is O(n * sqrt(B)), not O(n * B): this runs q_ann_neardup
over the sf1 embeddings with the Spark UI enabled and reads per-stage
shuffle-write record counts from the REST API.  With n vectors, B
shuffle partitions and g = ceil(sqrt(B)), the grid bands should write
about

  probe band:    n (home rows, one bucket each) + n (probe markers;
                 all rows are over-cap at the gate threshold so the
                 bucket>=0 band is empty)
  fallback grid: n * g (home side) + n_overcap * g (probe side)

shuffled records — versus the round-4 shape's n * B + n.  The script
prints one JSON line with the measured total, the two models, and
which model the measurement matches.

  python scripts/measure_neardup_shuffle.py [--sf-dir /tmp/emsort-sf1]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/emsort-sf1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ui-port", type=int, default=4049)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from external_merge_sort_loser_tree_ovc_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("neardup-shuffle-measure")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(args.ui_port))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").count()
    out_rows = QUERIES["q_ann_neardup"](spark, args.sf_dir).count()

    base = f"http://localhost:{args.ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/applications/{app_id}/stages"))
    write_recs = sum(s.get("shuffleWriteRecords", 0) for s in stages)

    B = args.cpus
    g = math.isqrt(B)
    g += int(g * g < B)
    # + n probe markers + n home-bucket rows for the (empty) probe band,
    # + final distinct shuffle of the output pairs
    model_grid = 2 * n * g + 2 * n + out_rows
    model_r4 = n * B + 3 * n + out_rows
    doc = {
        "metric": "neardup sf1 total shuffle write records",
        "n_vectors": n,
        "partitions": B,
        "grid_g": g,
        "measured_records": write_recs,
        "model_grid_OnSqrtB": model_grid,
        "model_r4_OnB": model_r4,
        "matches": (
            "grid"
            if abs(write_recs - model_grid) < abs(write_recs - model_r4)
            else "r4"
        ),
        "out_pairs": out_rows,
    }
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
