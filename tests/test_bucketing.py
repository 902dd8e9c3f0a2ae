"""Bucketed (co-located) joins: the shuffle-free join technique.

At 100 TB the dominant join cost is the shuffle; pre-bucketing both
sides on the join key at write time removes it entirely — every future
join on that key reads co-located buckets and sort-merges in place.
This test writes lineitem and orders bucketed by their order key and
asserts the join plan contains ZERO Exchange operators (versus two for
the plain-parquet join) and still produces the correct row count.
"""

import os
import uuid

import pytest

SF = "/root/testdata/sf0.001"


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    tag = uuid.uuid4().hex[:8]
    t_li, t_ord = f"li_b_{tag}", f"ord_b_{tag}"
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge so the Exchange count is the signal (a tiny
        # table would otherwise broadcast and trivially skip shuffles)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            li.write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(str(tmp_path), t_li))
            .saveAsTable(t_li)
        )
        (
            orders.write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(str(tmp_path), t_ord))
            .saveAsTable(t_ord)
        )
        joined = spark.table(t_li).join(
            spark.table(t_ord),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must read co-located buckets with no shuffle"
        )
        # and the co-located join is still CORRECT
        expect = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == expect

        # control: the same join over plain parquet DOES shuffle both
        # sides — the bucketing is what removed the Exchanges
        plain = _plan_of(
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        )
        assert plain.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
        spark.sql(f"DROP TABLE IF EXISTS {t_ord}")
