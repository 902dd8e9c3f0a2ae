"""Replicates the driver's correctness gate: for every oracle-gated
query, run the Spark query AND the DuckDB oracle on the same parquet,
compare row count + column set + order-insensitive values.

Runs at sf0.001 for speed (the driver uses sf0.01 — same shapes).
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from external_merge_sort_loser_tree_ovc_spark.queries import ORACLES, QUERIES

import os

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.reindex(sorted(pdf.columns), axis=1)
    return out.sort_values(list(out.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    exp = _normalize(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        # the driver's value hash is dtype-sensitive (Spark BIGINT vs DuckDB
        # HUGEINT hash differently even for equal values) — compare dtypes
        # too, so pytest catches what CORRECTNESS_r*.json would flag.
        # Datetime unit (ns vs us) is a pandas-conversion artifact the driver
        # normalizes (timestamp queries passed the r01 hash), so compare
        # datetime columns at kind level only.
        if g.dtype.kind == "M" or e.dtype.kind == "M":
            assert g.dtype.kind == e.dtype.kind, f"{name}.{c}: {g.dtype} vs {e.dtype}"
        else:
            assert g.dtype == e.dtype, (
                f"{name}.{c}: spark dtype {g.dtype} != oracle dtype {e.dtype} "
                "(driver value-hash would mismatch; CAST the oracle)"
            )
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            assert np.allclose(
                g.astype(float), e.astype(float), rtol=0, atol=1e-12, equal_nan=True
            ), f"{name}.{c}"
        else:
            ga, ea = g.to_numpy(), e.to_numpy()
            assert (ga == ea).all(), (
                f"{name}.{c}: first diff at "
                f"{np.nonzero(ga != ea)[0][:5]}"
            )


def test_registry_driver_window_contract():
    """r6 verdict #7: pin the driver-window invariants directly so the
    round-5 starvation regression (queries that had never had a
    driver-green row sorting OUTSIDE the 50-row window) cannot silently
    recur.  The driver evaluates ``list(QUERIES)[:50]``:

    1. every window entry must carry an oracle (a rows-only row wastes
       a window slot the hash-checked queries need);
    2. every registered query that has never had a fully-green driver
       row (across all committed CORRECTNESS_r*.json) must sort into
       the window — except the two approximate-by-design indexes,
       which CANNOT be hash-green and whose recall derivatives are
       oracle-gated instead."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(QUERIES)
    window = set(names[:50])
    assert window <= set(ORACLES), sorted(window - set(ORACLES))

    green: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r0*.json"))):
        with open(f) as fh:
            doc = json.load(fh)
        for k, v in doc.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("hash_match")
                and not v.get("err")
            ):
                green.add(k)
    assert green, "no CORRECTNESS_r*.json history found"
    approximate_rows_only = {"q_ann_lsh", "q_ann_ivf"}
    starved = [
        n
        for n in names
        if n not in green and n not in window and n not in approximate_rows_only
    ]
    assert starved == [], (
        f"queries with no historical driver-green row outside the "
        f"50-row driver window: {starved}"
    )


def test_all_queries_have_oracle_or_reason():
    missing = set(QUERIES) - set(ORACLES)
    # only genuinely approximate/non-SQL ops may omit the oracle
    assert missing == {"q_ann_lsh", "q_ann_ivf"}, missing


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {r["poly_id"] for r in rows} <= {1, 2, 3}
