#!/usr/bin/env python
"""At-scale correctness gate: every oracle-gated query at sf1.

Runs each registry query on Spark (local[N]) over the sf1 parquet built
by scripts/make_sf1.py AND its DuckDB oracle over the same files, then
compares the constant-size hash-invariant fingerprints from
``external_merge_sort_loser_tree_ovc_spark.atscale`` (n_rows, xor-fold,
modular sum of a per-row 31-bit mix) instead of materializing
multi-million-row outputs driver-side.  The fingerprint scheme itself
is validated against the driver-style full compare at sf0.01 in
pytest/verify before this gate is trusted.

Output: one JSON file (default SF1_CORRECTNESS.json) in the driver's
CORRECTNESS format plus per-engine timings.

  python scripts/sf1_gate.py [--sf-dir /tmp/emsort-sf1] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# oracles that are O(n^2) in a base table at sf1 (DuckDB-side cost, not
# an engine limitation) run a SAMPLED content check instead: the DuckDB
# side brute-forces only pairs touching a deterministic ~5% id sample
# (O(0.05*n^2), tractable at 20k vectors) and the Spark side filters
# its full output with the same predicate before fingerprinting.  r4
# verdict #3: the old rows-only criterion here was literally n >= 0 —
# it recorded "ran without crashing" as rows_match=true while the
# operator was returning wrong answers.
QUADRATIC_ORACLES = {"q_ann_neardup", "q_ann_neardup_probe", "q_dedup_embed_cosine"}
SAMPLE_MOD, SAMPLE_KEEP = 100, 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/emsort-sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "SF1_CORRECTNESS.json"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--only", default=None, help="comma list of query names")
    args = ap.parse_args()

    import duckdb

    from bench import build_spark
    from external_merge_sort_loser_tree_ovc_spark.atscale import (
        duck_fingerprint_sql,
        spark_fingerprint,
    )
    from external_merge_sort_loser_tree_ovc_spark.queries import ORACLES, QUERIES

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cpus))
    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # schema parity: sf1 parquet must read with the SAME Spark schema as
    # the source sf dir, or every downstream comparison is suspect
    for t in TABLES:
        s1 = spark.read.parquet(f"{args.sf_dir}/{t}.parquet").schema
        s0 = spark.read.parquet(f"/root/testdata/sf0.1/{t}.parquet").schema
        assert s1 == s0, f"schema drift in {t}: {s1} != {s0}"

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    from pyspark.sql import functions as F

    from external_merge_sort_loser_tree_ovc_spark.functions.similarity import (
        cosine_neardup_sampled_oracle_sql,
        neardup_sample_filter_sql,
        neardup_sampled_oracle_sql,
    )
    from external_merge_sort_loser_tree_ovc_spark.queries import (
        COSINE_NEARDUP_DIST2,
        NEARDUP_DIST2,
        NEARDUP_PROBE_DIST2,
        NEARDUP_PROBE_SRC,
    )

    sampled_oracle = {
        "q_ann_neardup": neardup_sampled_oracle_sql(
            "embeddings", NEARDUP_DIST2, mod=SAMPLE_MOD, keep=SAMPLE_KEEP
        ),
        "q_ann_neardup_probe": neardup_sampled_oracle_sql(
            NEARDUP_PROBE_SRC, NEARDUP_PROBE_DIST2, mod=SAMPLE_MOD, keep=SAMPLE_KEEP
        ),
        "q_dedup_embed_cosine": cosine_neardup_sampled_oracle_sql(
            "embeddings", COSINE_NEARDUP_DIST2, mod=SAMPLE_MOD, keep=SAMPLE_KEEP
        ),
    }

    names = list(QUERIES) if not args.only else args.only.split(",")
    results: dict[str, dict] = {}
    for name in names:
        rec: dict = {"err": None}
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, args.sf_dir)
            if name in QUADRATIC_ORACLES:
                # content check on the deterministic id sample: same
                # predicate, same int64 arithmetic, both engines
                sdf = sdf.filter(
                    F.expr(neardup_sample_filter_sql(mod=SAMPLE_MOD, keep=SAMPLE_KEEP))
                )
                oracle_sql = sampled_oracle[name]
                mode = f"sampled_oracle ({SAMPLE_KEEP}% ids)"
            else:
                oracle_sql = ORACLES.get(name)
                mode = "fingerprint"
            if oracle_sql is not None:
                cols = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
                fp_s = spark_fingerprint(sdf).collect()[0].asDict()
                rec["spark_sec"] = round(time.perf_counter() - t0, 2)
                t1 = time.perf_counter()
                fp_d = dict(
                    zip(
                        ("n_rows", "xmix", "smix"),
                        con.execute(
                            duck_fingerprint_sql(oracle_sql, cols)
                        ).fetchone(),
                    )
                )
                rec["oracle_sec"] = round(time.perf_counter() - t1, 2)
                rec.update(
                    rows_match=fp_s["n_rows"] == fp_d["n_rows"],
                    hash_match=fp_s == fp_d,
                    spark_rows=fp_s["n_rows"],
                    oracle_rows=fp_d["n_rows"],
                    checked=True,
                    mode=mode,
                )
            else:
                # approximate-by-design (lsh/ivf): no oracle exists;
                # record honestly as an unchecked smoke run, NOT as a
                # match (r4 verdict #3)
                n = sdf.count()
                rec.update(
                    spark_rows=n,
                    rows_match=None,
                    hash_match=None,
                    checked=False,
                    mode="smoke (approximate by design; recall gated in pytest)",
                    spark_sec=round(time.perf_counter() - t0, 2),
                )
        except Exception as e:  # noqa: BLE001 — gate must record, not die
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            rec["rows_match"] = rec["hash_match"] = False
            rec["checked"] = True
        results[name] = rec
        # release operator-internal persists between queries
        spark.catalog.clearCache()
        ok = rec["err"] is None and (
            rec["hash_match"] or not rec.get("checked", True)
        )
        status = "OK " if ok else "FAIL"
        print(f"{status} {name} {json.dumps(rec)[:200]}", flush=True)

    spark.stop()
    if args.only and os.path.exists(args.out):
        # partial (--only) runs MERGE into the existing artifact so a
        # single-query refresh never clobbers the full-registry record;
        # rows for queries no longer in the registry are dropped
        try:
            with open(args.out) as f:
                prior = json.load(f).get("results", {})
            merged = {k: v for k, v in prior.items() if k in QUERIES}
            merged.update(results)
            # keep registry order for readability
            results = {k: merged[k] for k in QUERIES if k in merged}
        except (json.JSONDecodeError, OSError):
            pass
    full = sum(1 for r in results.values() if r.get("hash_match"))
    smoke = sum(1 for r in results.values() if not r.get("checked", True))
    doc = {
        "sf_dir": args.sf_dir,
        "cpus": args.cpus,
        "n_queries": len(results),
        "full_match": full,
        "smoke_unchecked": smoke,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"\n{full}/{len(results)} fingerprint-green -> {args.out}")


if __name__ == "__main__":
    main()
