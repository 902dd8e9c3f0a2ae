"""kNN join via cell-ring expansion (H3 grid_ring analogue).

Exact k-nearest-neighbours of each query point against a big point
table, without a cross join:

  round 0: search the disk of index cells of radius ``start_radius``
           around each query's cell;
  round i: explode the *still-unsatisfied* queries to the hollow ring at
           Chebyshev cell distance c, join candidates by cell, keep the
           running top-k per query;
  finish:  after searching out to radius c, any unseen point sits in a
           cell at Chebyshev distance >= c+1, hence at squared distance
           > (c * cell_span)^2 — a query whose k-th best is <= that
           bound can never improve, so it leaves the pending set.

Every round is one shuffle-light Spark job over the shrinking
unsatisfied set; the big point table is touched only through its cell
index (a handful of cells per query), never cross-joined.

Metric: integer squared euclidean on fine-grid coords (exact in int64,
so the DuckDB oracle — a brute-force cross join, ``knn_oracle_sql`` —
matches bit-for-bit).  Geographic float inputs snap to a fine grid
first; choose the fine resolution so snapping error is below tolerance.

Reference parity: the reference has no joins at all (SURVEY.md §2.2);
this operator is mandated by BASELINE.json north_star ("kNN via
cell-ring expansion").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _offsets(lo: int, hi: int) -> list[tuple[int, int]]:
    """All (dx, dy) with lo <= chebyshev(dx, dy) <= hi."""
    return [
        (dx, dy)
        for dx in range(-hi, hi + 1)
        for dy in range(-hi, hi + 1)
        if lo <= max(abs(dx), abs(dy)) <= hi
    ]


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    point_id: str = "point_id",
    query_id: str = "query_id",
    x: str = "xi",
    y: str = "yi",
    index_shift: int | None = 6,
    start_radius: int = 1,
    max_rounds: int = 64,
    target_cell_points: int = 24,
) -> DataFrame:
    """Exact kNN: (query_id, point_id, dist2, rank) with deterministic
    tie-break (dist2, point_id).  Coords are nonnegative integers; the
    index cell is coord >> index_shift (cell_span = 2^index_shift).

    ``index_shift=None`` picks the cell span ADAPTIVELY from the point
    density (one tiny aggregate over the cached point table): span ~
    sqrt(area * target_cell_points / n), so the radius-1 disk holds
    ~9 * target points at every scale — a constant tuned for one scale
    factor otherwise explodes the candidate set at 10x the density
    (guide §2: make partitioning scale-adaptive, not a constant).  The
    shift NEVER affects results (the ring expansion is exact at any
    granularity), only candidate volume and round count."""
    spark = points.sparkSession
    raw_pts = points.select(
        F.col(point_id).alias("_pid"),
        F.col(x).cast("bigint").alias("_px"),
        F.col(y).cast("bigint").alias("_py"),
    )
    raw_pts.cache()
    if index_shift is None:
        stats = raw_pts.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_px").alias("x0"),
            F.max("_px").alias("x1"),
            F.min("_py").alias("y0"),
            F.max("_py").alias("y1"),
        ).collect()[0]
        n_pts = stats["n"] or 0
        if n_pts == 0:
            index_shift = 6
        else:
            area = max(1, (stats["x1"] - stats["x0"] + 1)) * max(
                1, (stats["y1"] - stats["y0"] + 1)
            )
            import math

            span_f = math.sqrt(area * target_cell_points / n_pts)
            index_shift = max(0, min(40, round(math.log2(max(1.0, span_f)))))
    span = 1 << index_shift
    pts = raw_pts.select(
        "_pid",
        "_px",
        "_py",
        F.shiftright(F.col("_px"), index_shift).alias("_pcx"),
        F.shiftright(F.col("_py"), index_shift).alias("_pcy"),
    )
    pts = pts.cache()

    pending = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(x).cast("bigint").alias("_qx"),
        F.col(y).cast("bigint").alias("_qy"),
        F.shiftright(F.col(x).cast("bigint"), index_shift).alias("_qcx"),
        F.shiftright(F.col(y).cast("bigint"), index_shift).alias("_qcy"),
    )
    best = None  # running top-k: (_qid, _pid, dist2)
    searched = -1  # max Chebyshev radius fully searched so far
    rounds = 0
    n_pending = pending.count()
    while rounds < max_rounds and n_pending > 0:
        lo, hi = searched + 1, max(searched + 1, start_radius if rounds == 0 else 0)
        off_df = F.broadcast(
            spark.createDataFrame(_offsets(lo, hi), ["_dx", "_dy"])
        )
        cand = (
            pending.crossJoin(off_df)
            .withColumn("_pcx", F.col("_qcx") + F.col("_dx"))
            .withColumn("_pcy", F.col("_qcy") + F.col("_dy"))
            .join(pts, ["_pcx", "_pcy"])
            .select(
                "_qid",
                "_pid",
                (
                    (F.col("_px") - F.col("_qx")) * (F.col("_px") - F.col("_qx"))
                    + (F.col("_py") - F.col("_qy")) * (F.col("_py") - F.col("_qy"))
                ).alias("dist2"),
            )
        )
        merged = (
            cand
            if best is None
            else cand.unionByName(best.select("_qid", "_pid", "dist2"))
        )
        w = Window.partitionBy("_qid").orderBy(F.col("dist2"), F.col("_pid"))
        topk = (
            merged.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .cache()
        )
        topk.count()  # cut lineage before the old cache goes away
        if best is not None:
            best.unpersist()
        best = topk
        searched = hi
        # a query stays pending unless it has k hits whose worst dist2
        # can no longer be beaten by anything outside radius `searched`
        bound = (searched * span) * (searched * span)
        kth = topk.groupBy("_qid").agg(
            F.max("dist2").alias("_dk"), F.count(F.lit(1)).alias("_nk")
        )
        new_pending = (
            pending.join(kth, "_qid", "left")
            .filter(
                F.col("_nk").isNull()
                | (F.col("_nk") < k)
                | (F.col("_dk") > F.lit(bound))
            )
            .select("_qid", "_qx", "_qy", "_qcx", "_qcy")
            .cache()  # cut lineage: otherwise round r recomputes rounds 1..r-1
        )
        n_pending = new_pending.count()
        pending.unpersist()
        pending = new_pending
        rounds += 1
    pts.unpersist()
    raw_pts.unpersist()
    if best is None:
        return spark.createDataFrame(
            [], f"{query_id} long, {point_id} long, dist2 long, rank int"
        )
    out = best.select(
        F.col("_qid").alias(query_id),
        F.col("_pid").alias(point_id),
        F.col("dist2").cast("bigint").alias("dist2"),
        F.col("rank").cast("int").alias("rank"),
    )
    return out


def knn_oracle_sql(
    points_sql: str,
    queries_sql: str,
    k: int,
    *,
    point_id: str = "point_id",
    query_id: str = "query_id",
    x: str = "xi",
    y: str = "yi",
) -> str:
    """Brute-force cross-join oracle with identical tie-break."""
    return f"""
WITH p AS ({points_sql}), q AS ({queries_sql}),
d AS (
  SELECT q.{query_id} AS {query_id}, p.{point_id} AS {point_id},
         (p.{x} - q.{x}) * (p.{x} - q.{x})
         + (p.{y} - q.{y}) * (p.{y} - q.{y}) AS dist2
  FROM q CROSS JOIN p
),
r AS (
  SELECT {query_id}, {point_id}, CAST(dist2 AS BIGINT) AS dist2,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY {query_id} ORDER BY dist2, {point_id}
         ) AS INT) AS rank
  FROM d
)
SELECT * FROM r WHERE rank <= {k}
"""
