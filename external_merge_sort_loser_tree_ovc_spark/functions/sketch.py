"""Cardinality sketches: KMV (k-minimum-values) distinct counting.

The at-scale cardinality shape (r5 verdict #3): the round-5 gate query
computed the exact ``distinct()`` alongside the estimate — a full
shuffle of every distinct hash, i.e. exactly the cost the sketch exists
to avoid.  This module provides the estimator-ALONE plan:

    scan -> project(hash) -> mapInPandas(per-partition k smallest
    DISTINCT hashes, bounded O(k) state) -> tiny merge (<= partitions*k
    rows) -> k-th order statistic -> (k-1)*M / h_k

The only Exchange in the plan sits ABOVE the mapInPandas sketch node,
so at most ``partitions * k`` 8-byte rows ever shuffle regardless of
corpus size (plan contract in tests/test_plan_shapes.py).  The
per-partition k smallest distinct values are a superset-closed merge:
the global k smallest distinct hashes are always contained in the union
of per-partition k smallest distinct hashes, so the estimator is
BIT-IDENTICAL to the full-distinct formulation — which is why the
approximate estimate itself gates bit-exact against a DuckDB oracle
that computes the same order statistic by brute force (unlike engine
HLLs, which are implementation-specific and never cross-engine
comparable).

Estimator: with ``k_used = k`` distinct hashes retained and ``h_k`` the
k-th smallest over the hash domain [0, M): est = (k-1) * M DIV h_k
(the classic KMV/bottom-k estimator, Bar-Yossef et al. 2002).  When the
corpus holds fewer than k distinct values the sketch retains ALL of
them and the count is exact: est = k_used.

Reference scope note: the reference engine (sort kernel) has no sketch
operators; this is part of the training-pipeline layer the task
mandates (SURVEY.md §2 additions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def kmv_kth_distinct(hashes: DataFrame, k: int, *, col: str = "h") -> DataFrame:
    """(k_used, hk): number of retained minima (= min(k, n_distinct))
    and the k_used-th smallest distinct value of ``hashes.col``.

    Bounded-state scale path: every partition keeps at most ``k``
    distinct minima in O(k) memory (np.unique per Arrow batch, then
    truncate), so the merge input is <= partitions * k rows no matter
    the input cardinality."""
    schema = StructType([StructField(col, LongType())])

    def local_minima(it):
        best: np.ndarray | None = None
        for pdf in it:
            if pdf.empty:
                continue
            h = pdf[col].to_numpy(dtype=np.int64)
            best = h if best is None else np.concatenate([best, h])
            best = np.unique(best)  # sorted ascending, distinct
            if len(best) > k:
                best = best[:k]
        if best is not None:
            yield pd.DataFrame({col: best})

    part = hashes.select(F.col(col).cast("bigint").alias(col)).mapInPandas(
        local_minima, schema=schema
    )
    # merge: distinct + k smallest over the tiny per-partition sketch
    # union (cross-partition duplicates of the same hash must collapse
    # before the order statistic — the sketch counts DISTINCT values)
    return (
        part.distinct()
        .orderBy(col)
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.max(col).cast("bigint").alias("hk"),
        )
    )


def kmv_estimate(
    hashes: DataFrame,
    k: int,
    domain: int,
    *,
    col: str = "h",
    include_exact: bool = False,
) -> DataFrame:
    """(k_used, hk, est_distinct[, n_exact]): KMV distinct-count
    estimate over hash values in [0, ``domain``).

    ``include_exact`` bolts on the true distinct count (a FULL shuffle
    of every distinct hash) for error-context at gate scale — never use
    it on the at-scale path; the estimator alone is the production
    plan."""
    est = kmv_kth_distinct(hashes, k, col=col).select(
        "k_used",
        "hk",
        F.expr(
            f"CAST(CASE WHEN k_used < {k} THEN k_used "
            f"ELSE ({k - 1} * CAST({domain} AS BIGINT)) DIV GREATEST(hk, 1) "
            f"END AS BIGINT)"
        ).alias("est_distinct"),
    )
    if not include_exact:
        return est
    exact = hashes.select(col).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return est.crossJoin(exact)  # 1x1 scalar join


def kmv_estimate_oracle_sql(
    source_sql: str, k: int, domain: int, *, col: str = "h"
) -> str:
    """DuckDB oracle computing the identical estimator by brute force:
    full distinct, k-th order statistic, same integer division."""
    return f"""
WITH hs AS (SELECT DISTINCT {col} FROM ({source_sql}) src),
kth AS (
  SELECT COUNT(*) AS k_used, MAX({col}) AS hk
  FROM (SELECT {col} FROM hs ORDER BY {col} LIMIT {k}) t
)
SELECT CAST(k_used AS BIGINT) AS k_used, CAST(hk AS BIGINT) AS hk,
       CAST(CASE WHEN k_used < {k} THEN k_used
                 ELSE ({k - 1} * CAST({domain} AS BIGINT)) // GREATEST(hk, 1)
            END AS BIGINT) AS est_distinct
FROM kth
"""
