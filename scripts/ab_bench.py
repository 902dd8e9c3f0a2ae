#!/usr/bin/env python
"""Interleaved A/B per-query benchmark across git refs — ONE window.

Answers "did commit X make query Q slower, or was the box busier?":
runs the same queries under two (or more) checkouts in alternating
blocks inside a single measurement window, with memory-bandwidth
contention stamps before/between/after.  If the refs' best times agree
and the membw stamps are level, a cross-round regression was window
contention; if a ref is consistently slower WITHIN one window, the
regression is real.

  python scripts/ab_bench.py --refs 88b4936,HEAD \
      --queries q_tpch_q1,q_pip_join,q_cell_counts --blocks 2 --runs 2

Each (block, ref) pair is a fresh subprocess/JVM with the same session
config as bench.py; per-query best-of over all blocks is reported per
ref, plus the raw per-block times so the variance is visible.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from pyspark.sql import SparkSession

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
queries = sys.argv[1].split(",")
runs = int(sys.argv[2])

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("emsort-ab")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
spark.range(1_000_000).select(F.sum("id")).collect()
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
li.groupBy("l_returnflag").agg(F.count(F.lit(1))).collect()

from external_merge_sort_loser_tree_ovc_spark.queries import QUERIES

out = {}
for name in queries:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    out[name] = ts
spark.stop()
print("ABRESULT " + json.dumps(out))
"""


def _checkout(ref: str) -> str:
    if ref in ("HEAD", "WORKTREE"):
        # measures the LIVE working tree (uncommitted edits included);
        # the output doc carries a worktree_dirty flag so a dirty tree
        # can't be silently attributed to the HEAD commit
        return REPO
    sha = subprocess.run(
        ["git", "rev-parse", "--short", ref], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    path = os.path.join(tempfile.gettempdir(), f"emsort-ab-{sha}")
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, sha],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--refs", required=True, help="comma list, e.g. 88b4936,HEAD")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from bench import membw_probe

    refs = args.refs.split(",")
    dirs = {r: _checkout(r) for r in refs}
    membw = [round(membw_probe(), 1)]
    raw: dict[str, dict[str, list[float]]] = {r: {} for r in refs}
    for block in range(args.blocks):
        for ref in refs:
            env = dict(os.environ)
            env.pop("PYTHONPATH", None)
            p = subprocess.run(
                [sys.executable, "-c", _WORKER, args.queries, str(args.runs)],
                cwd=dirs[ref], env=env, capture_output=True, text=True,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")),
                None,
            )
            if line is None:
                sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
                raise SystemExit(f"worker failed for {ref} block {block}")
            for q, ts in json.loads(line[len("ABRESULT "):]).items():
                raw[ref].setdefault(q, []).extend(ts)
        membw.append(round(membw_probe(), 1))

    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip()
    ) if any(r in ("HEAD", "WORKTREE") for r in refs) else False
    doc = {
        "metric": "interleaved A/B per-query best (one window)",
        "unit": "sec",
        "refs": refs,
        "worktree_dirty": dirty,
        "best": {r: {q: min(ts) for q, ts in raw[r].items()} for r in refs},
        "raw": raw,
        "membw_gbps": membw,
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
