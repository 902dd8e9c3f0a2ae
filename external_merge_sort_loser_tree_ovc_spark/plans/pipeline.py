"""Flagship pipeline: the north-star job end to end.

  pages --geocode/cell-encode (codegen)--> morton key
        --salted repartitionByRange (the explicit skew-safe shuffle)-->
        per-partition OVC loser-tree external sort (mapInPandas kernel)
        --> point-in-polygon join (broadcast cover + ray-cast refine)
        --> raster tile counts
        + per-partition lineage/metrics (runs, passes, spill, compares)

This is SURVEY §3.4's lifecycle as one callable, used by ``bench.py``
(throughput + scaling efficiency) and the e2e tests.  The sort stage
also runs in ``exact`` mode over the integer key projection to report
the reference-style merge comparison counts (TreeOfLosers.cpp ``ct``).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sort import external_sort_df, salted_repartition_by_range
from ..runtime import default_spill_root
from ..operators.witness import witness_summary
from ..spatial.ops import pip_join, with_grid, with_morton, with_tile
from ..spatial.pip import default_polygons


def flagship_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    *,
    cell_res: int = 12,
    tile_zoom: int = 6,
    num_partitions: int | None = None,
    salt_buckets: int = 8,
    memory_budget_rows: int = 1 << 19,
    count_compares: bool = True,
    keep_lineage: bool = False,
    cache_input: bool = True,
    checkpoint_dir: str | None = None,
) -> dict:
    """Run the full pipeline; returns a metrics dict (wall seconds per
    stage, pages/sec, merge comparisons/sec, witness parity in==out)."""
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    out: dict = {}
    t0 = time.perf_counter()

    enc = with_morton(with_grid(pages, "lat", "lon", cell_res))
    enc = enc.select("url", "warc_ts", "text", "lang", "lat", "lon", "cell", "morton")
    # the encoded input feeds FOUR passes (witness-in, range sampler, the
    # shuffle itself, and the exact-mode compare leg).  Against a real
    # storage-backed table each extra pass is a column-pruned scan; when
    # the input is a synthesized/derived plan, recomputing it per pass
    # times the generator, not the engine — persist serialized (rows go
    # to spark.local.dir scratch if memory is short).
    if cache_input:
        enc = enc.persist(StorageLevel.MEMORY_AND_DISK)

    # witness below the sort (reference plan shape: Witness(Sort(Witness(...))))
    w_in = witness_summary(enc, ["url", "text"])
    t1 = time.perf_counter()
    out["s_encode_witness"] = t1 - t0

    spill_root = default_spill_root()
    # an explicit checkpoint_dir persists across invocations: re-running
    # the job with the same dir replays committed per-partition runs
    # (fingerprint-verified) instead of re-sorting — the north_rule's
    # resumability.  Without one, a private dir is used and removed.
    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="emsort-flagship-", dir=spill_root)
    os.makedirs(ckpt, exist_ok=True)
    try:
        salted = salted_repartition_by_range(
            enc, ["morton"], salt_buckets=salt_buckets, num_partitions=n_parts
        )
        sorted_df = external_sort_df(
            salted,
            ["morton", "url"],
            memory_budget_rows=memory_budget_rows,
            checkpoint_dir=ckpt,
            skip_shuffle=True,
        )
        sorted_df = sorted_df.persist(StorageLevel.MEMORY_AND_DISK)
        n_pages = sorted_df.count()
        t2 = time.perf_counter()
        out["s_sort"] = t2 - t1
        out["n_pages"] = n_pages

        w_out = witness_summary(sorted_df, ["url", "text"])
        assert w_out == w_in, f"witness violated: {w_in} != {w_out}"
        t3 = time.perf_counter()
        out["s_witness_out"] = t3 - t2

        hits = pip_join(
            sorted_df, default_polygons(), res=6, keep_cols=["url"]
        )
        pip_counts = (
            hits.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n")).collect()
        )
        out["pip_hits"] = {int(r["poly_id"]): int(r["n"]) for r in pip_counts}
        t4 = time.perf_counter()
        out["s_pip"] = t4 - t3

        tiles = with_tile(sorted_df, "lat", "lon", tile_zoom)
        tile_counts = tiles.groupBy("tile_id").agg(F.count(F.lit(1)).alias("n"))
        out["n_tiles"] = tile_counts.count()
        t5 = time.perf_counter()
        out["s_tiles"] = t5 - t4

        # lineage / instrumentation from the kernel's per-partition metrics
        mdir = os.path.join(ckpt, "_metrics")
        lineage = []
        if os.path.isdir(mdir):
            for f_ in sorted(os.listdir(mdir)):
                if f_.startswith("partition-"):
                    with open(os.path.join(mdir, f_)) as fh:
                        lineage.append(json.load(fh))
        out["spill_rows"] = sum(m.get("spill_rows", 0) for m in lineage)
        out["runs_formed"] = sum(m.get("runs_formed", 0) for m in lineage)
        out["merge_passes_max"] = max((m.get("passes", 0) for m in lineage), default=0)
        out["partitions_resumed"] = sum(1 for m in lineage if m.get("resumed"))
        if keep_lineage:
            out["lineage"] = lineage
        sorted_df.unpersist()
    finally:
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)

    # exact-mode comparison counting over the integer key projection
    if count_compares:
        t6 = time.perf_counter()
        keys_only = enc.select(
            F.col("morton"), F.xxhash64("url").alias("urlh")
        )
        ckpt2 = tempfile.mkdtemp(prefix="emsort-exact-", dir=spill_root)
        try:
            # size the budget so each partition forms ~8 external runs —
            # otherwise small inputs sort in-memory and no merge (hence no
            # tree comparisons) ever happens
            exact_budget = max(512, out["n_pages"] // (n_parts * 8))
            exact = external_sort_df(
                keys_only,
                ["morton", "urlh"],
                memory_budget_rows=exact_budget,
                batch_rows=max(1024, exact_budget // 4),
                mode="exact",
                checkpoint_dir=ckpt2,
                num_partitions=n_parts,
            )
            exact.write.format("noop").mode("overwrite").save()
            mdir2 = os.path.join(ckpt2, "_metrics")
            ovc = col = 0
            for f_ in os.listdir(mdir2):
                if f_.startswith("partition-"):
                    with open(os.path.join(mdir2, f_)) as fh:
                        m = json.load(fh)
                    ovc += m.get("ovc_compares", 0)
                    col += m.get("col_compares", 0)
            t7 = time.perf_counter()
            out["s_exact_sort"] = t7 - t6
            out["ovc_compares"] = ovc
            out["col_compares"] = col
            out["merge_comparisons_per_sec"] = (
                (ovc + col) / (t7 - t6) if t7 > t6 else 0.0
            )
        finally:
            shutil.rmtree(ckpt2, ignore_errors=True)

    if cache_input:
        enc.unpersist()
    total = time.perf_counter() - t0
    out["total_sec"] = total
    core = out["s_sort"] + out["s_pip"] + out["s_tiles"]
    out["pages_per_sec"] = out["n_pages"] / core if core > 0 else 0.0
    return out
