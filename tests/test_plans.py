"""Physical-plan quality gates — the plans we WANT, not just plans that
pass (SURVEY.md §4: pushdown/pruning/broadcast are the 100 TB levers)."""

from __future__ import annotations

from whakoom_webscrapper_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = Q.SPARK_QUERIES[name](spark, SF)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # only the 7 referenced columns reach the scan, not all 11
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_region_rollup_broadcasts_dimensions(spark):
    plan = _plan(spark, "region_rollup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pending_filter_pushes_equality(spark):
    plan = _plan(spark, "pending_filter")
    assert "EqualTo(o_orderstatus,O)" in plan


def test_anti_join_stays_anti(spark):
    plan = _plan(spark, "orders_without_items")
    assert "LeftAnti" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_covers_text_stats(spark):
    # text analysis must stay JVM-side: no Python/Arrow eval nodes
    df = Q.SPARK_QUERIES["text_stats"](spark, SF)
    # the parallelism-floor exchange makes the plan adaptive, and AQE
    # only annotates codegen ('*' prefix) on the FINAL plan — execute
    # first, then assert on what actually ran
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "* Project" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_stratified_sample_is_map_only(spark):
    # the rebalancing pass claims ZERO shuffle (docs/COVERAGE.md): the rate
    # table must stay a plan-literal CASE, never become a join, and no
    # Exchange may appear beyond the parallelism-floor repartition of the
    # scan itself (which is round-robin, not a key shuffle)
    plan = _plan(spark, "stratified_sample_docs")
    assert "Join" not in plan
    assert "hashpartitioning" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_minhash_verified_pairs_has_no_cartesian(spark):
    # verify stage must stay keyed: candidate pairs join the shingle frame
    # by doc id + shingle equality — a cartesian/NLJ anywhere means the
    # all-pairs blowup the candidate->verify split exists to avoid
    plan = _plan(spark, "minhash_verified_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
