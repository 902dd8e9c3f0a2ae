"""AQE skew-join: the runtime backstop for key skew.

The engine salts known-hot keys explicitly (operators/sort.py), but
unknown skew at 100 TB is handled by Adaptive Query Execution
splitting oversized join partitions at runtime.  This test builds a
join where one key holds ~80% of the left side, forces a sort-merge
join, executes it, and asserts the FINAL adaptive plan actually
applied the skew split (``skew=true`` on the join) — evidence the
backstop fires, not just that the conf is set.
"""

import pytest


def test_aqe_splits_skewed_join(spark):
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so the synthetic hot partition qualifies
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(300_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            # fat payload so the hot partition crosses the byte threshold
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
        )
        # k=0 is already in the step-5 range, so every left key (0 and
        # the id%5==0 ids) has exactly one right match
        right = spark.range(0, 300_000, 5).select(
            F.col("id").alias("k"), F.lit(1).alias("r")
        )
        joined = left.join(right, "k")
        # execute THIS DataFrame's own query execution (count() builds
        # a separate one whose adaptive plan never finalizes here)
        n = len(joined.collect())
        assert n == 300_000  # every left row matches exactly one right row
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, (
            "AQE did not split the skewed partition:\n" + final[:2000]
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
