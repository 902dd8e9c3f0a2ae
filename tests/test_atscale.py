"""At-scale fingerprint helper: the sf1 gate's comparator must agree
with the driver-style full compare wherever both are computable, and
must actually DETECT corruption (a fingerprint that never fails would
gate nothing)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from external_merge_sort_loser_tree_ovc_spark.atscale import (
    duck_fingerprint_sql,
    row_mix_sql,
    spark_fingerprint,
)

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize(
    "name",
    [
        "q_tpch_q1",          # int aggregates
        "q_percentiles",      # window + integer interpolation
        "q_sort_lineitem",    # full-width rows incl doubles + timestamps
        "q_string_date_funcs",  # strings + date parts + date_trunc ts
        "q_dedup_exact",      # string-keyed grouping
    ],
)
def test_fingerprint_matches_oracle(spark, name):
    from external_merge_sort_loser_tree_ovc_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF)
    cols = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
    fp_s = spark_fingerprint(sdf).collect()[0].asDict()
    fp_d = dict(
        zip(
            ("n_rows", "xmix", "smix"),
            _con().execute(duck_fingerprint_sql(ORACLES[name], cols)).fetchone(),
        )
    )
    assert fp_s == fp_d, (name, fp_s, fp_d)


def test_fingerprint_detects_corruption():
    """One changed value, one dropped row, one duplicated row, and a
    row swap must each change the fingerprint (swap excepted: the mix
    is order-INDEPENDENT by design, so a pure reorder must NOT)."""
    con = duckdb.connect()
    base = pd.DataFrame(
        {
            "k": np.arange(20, dtype=np.int64),
            "v": (np.arange(20, dtype=np.int64) * 7) % 5,
            "s": [f"txt{i % 4}{'y' * (i % 11)}" for i in range(20)],
        }
    )
    cols = [("k", "BIGINT"), ("v", "BIGINT"), ("s", "VARCHAR")]

    def fp(df):
        con.register("t", df)
        out = con.execute(duck_fingerprint_sql("SELECT * FROM t", cols)).fetchone()
        con.unregister("t")
        return out

    ref = fp(base)
    changed = base.copy()
    changed.loc[7, "v"] += 1
    assert fp(changed) != ref
    assert fp(base.iloc[:-1]) != ref
    assert fp(pd.concat([base, base.iloc[[3]]], ignore_index=True)) != ref
    assert fp(base.iloc[::-1].reset_index(drop=True)) == ref


def test_fingerprint_detects_middle_of_long_string_corruption():
    """Length-preserving corruption in the MIDDLE of a long string must
    flip the fingerprint.  The round-4 scheme hashed only the first 8 +
    last 8 chars + length, so this exact corruption (the shape a long
    q_doc_chunks chunk_text could suffer) collided with probability 1
    (r4 advice); the md5 full-string fold catches it."""
    con = duckdb.connect()
    cols = [("s", "VARCHAR")]

    def fp(df):
        con.register("t", df)
        out = con.execute(duck_fingerprint_sql("SELECT * FROM t", cols)).fetchone()
        con.unregister("t")
        return out

    long = "prefix01" + "a" * 48 + "suffix99"
    corrupt = "prefix01" + "a" * 20 + "B" + "a" * 27 + "suffix99"
    assert len(long) == len(corrupt) and long[:8] == corrupt[:8] and long[-8:] == corrupt[-8:]
    assert fp(pd.DataFrame({"s": [long]})) != fp(pd.DataFrame({"s": [corrupt]}))


def test_row_mix_rejects_unfingerprintable():
    with pytest.raises(ValueError, match="unsupported"):
        row_mix_sql([("a", "ARRAY<FLOAT>")], "spark")
