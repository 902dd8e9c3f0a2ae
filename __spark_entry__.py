"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship geospatial pipeline; ``queries`` /
``oracle_sql`` expose every implemented operator with its DuckDB
oracle (see external_merge_sort_loser_tree_ovc_spark/queries.py — the
registry aligns column names and keeps gate-facing values
integer-exact so hashes can't drift on float summation order).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from external_merge_sort_loser_tree_ovc_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode -> cell encode -> PIP join -> per-polygon page
    counts on sf0.001 (the full north-star pipeline in one query)."""
    from pyspark.sql import functions as F

    from external_merge_sort_loser_tree_ovc_spark.queries import q_pip_join

    hits = q_pip_join(spark, "/root/testdata/sf0.001")
    return hits.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n_pages"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
