"""Cogroup with a grouping-key type contract.

Every cogrouped-rerank / blocked-NLJ kernel in this engine pairs two
DataFrames by a shared grouping key (bucket / cluster / grid cell) and
applies a pandas function per key.  Spark's CoGroup physical operator
aligns the two sides by the RAW grouping expressions and does NOT
insert an implicit cast when the two sides' key types differ: with an
int32 key on one side and int64 on the other, each key value is
delivered TWICE — once with only the left rows, once with only the
right rows — so the function silently sees an empty side and the join
quietly loses pairs.  Worse, the failure is partitioning-dependent
(hash(int32 v) != hash(int64 v) routing), so a small-partition test can
pass while production loses most of the output (the round-4
``q_ann_neardup`` regression: 15/15 pairs at 8 shuffle partitions, 1/15
at 200).

``cogroup_apply`` is therefore the ONLY way this codebase builds a
cogroup: it asserts the two key lists have identical Spark dataTypes at
plan-build time, then runs the standard
``groupBy().cogroup().applyInPandas`` chain.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def cogroup_apply(
    left: DataFrame,
    left_keys: Sequence[str],
    right: DataFrame,
    right_keys: Sequence[str],
    func: Callable,
    schema: StructType,
) -> DataFrame:
    """``left.groupBy(*left_keys).cogroup(right.groupBy(*right_keys))
    .applyInPandas(func, schema)`` with a key-type contract.

    Raises ``TypeError`` at plan-build time if the paired grouping keys
    do not have byte-identical Spark dataTypes (see module docstring for
    why a type mismatch is silent data loss, not an error, in Spark).
    """
    if len(left_keys) != len(right_keys):
        raise TypeError(
            f"cogroup key arity mismatch: {list(left_keys)} vs {list(right_keys)}"
        )
    lt = [left.schema[k].dataType for k in left_keys]
    rt = [right.schema[k].dataType for k in right_keys]
    if lt != rt:
        raise TypeError(
            "cogroup grouping-key dataTypes differ — Spark CoGroup would "
            "silently mis-align the groups (round-4 q_ann_neardup bug): "
            f"left {list(zip(left_keys, (t.simpleString() for t in lt)))} vs "
            f"right {list(zip(right_keys, (t.simpleString() for t in rt)))}"
        )
    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(func, schema=schema)
    )
