"""Physical-plan audits: the 100 TB design properties must be visible in
the optimized plans, not just assumed (SURVEY §4).

Each test renders .explain(formatted/extended) and asserts the plan
shape: filters/projections reach the parquet scan, small dimensions
broadcast, aggregations split partial/final, whole-stage codegen covers
the hot expressions.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

import clickhouse_learning_spark.queries_pipeline  # noqa: F401
import clickhouse_learning_spark.queries_streaming  # noqa: F401
from clickhouse_learning_spark.mv.mainpage import mainpage_mv, prepare_events
from clickhouse_learning_spark.queries import QUERIES

from .conftest import SF_SMOKE


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_and_projection_pushed_to_scan(spark):
    """P1-P4: the day/value filter and the 3-column projection must reach
    the parquet scan (PushedFilters + narrow ReadSchema)."""
    df = QUERIES["filter_project_prune"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "PushedFilters:" in p
    assert "GreaterThan(value,100.0)" in p or "GreaterThan(value, 100.0)" in p
    # scan must not read the whole events schema — props/event_id pruned
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert read_schema and "props" not in read_schema[0]


def test_partition_filter_prunes_lineitem_scan(spark):
    df = QUERIES["pricing_summary"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "LessThanOrEqual(l_shipdate" in p  # pushed to scan
    rs = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    for needed in ("l_quantity", "l_extendedprice", "l_discount"):
        assert needed in rs
    assert "l_comment" not in rs and "l_partkey" not in rs


def test_dimension_join_is_broadcast(spark):
    """J1/J5: the customer dim must join as BroadcastHashJoin — no
    shuffle on the fact side (the dictGet/dictionary semantics)."""
    df = QUERIES["dict_enrich_join"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_merge_query_uses_partial_final_agg(spark, tmp_path):
    """E2: the state-table rollup must show the two-level (shard →
    initiator) aggregation: partial aggregate before the exchange,
    final after — Spark's partial/final HashAggregate split."""
    mv = mainpage_mv(str(tmp_path / "state"))
    mv.append_batch(prepare_events(spark, SF_SMOKE))
    df = mv.merge_query(spark, ["day", "segment"], ["view_cnt", "value_sum"])
    p = plan_text(df, "extended")
    lower = p.lower()
    assert lower.count("hashaggregate") >= 2
    assert "exchange hashpartitioning" in lower


def test_semi_join_plan(spark):
    p = plan_text(QUERIES["semi_join_exists"](spark, SF_SMOKE))
    assert "LeftSemi" in p


def test_hot_expressions_in_wholestage_codegen(spark):
    """The conditional-agg pipeline (scan → project → partial agg) must
    sit inside WholeStageCodegen spans. AQE defers codegen until
    execution, so audit the static plan with AQE off."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p = plan_text(QUERIES["conditional_agg"](spark, SF_SMOKE), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "Found 0 WholeStageCodegen subtrees" not in p
    assert "WholeStageCodegen" in p


def test_minhash_signature_plan_has_single_shuffle_before_bands(spark):
    """The signature stage is: fan-out repartition (deliberate — spreads
    the shingle explode across cores when the input has few files) →
    explode → partial min-agg → exchange. At most those two
    hash-exchanges, and no interpreted-lambda operators (ArrayTransform
    etc.) in the signature subtree."""
    from clickhouse_learning_spark.operators.dedup import minhash_signatures_df
    from clickhouse_learning_spark.schemas import load_table

    # earlier tests may have left the signature frame persisted; a cached
    # plan shows InMemoryTableScan with no exchanges
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMOKE, "documents")
    p = plan_text(minhash_signatures_df(docs), "extended")
    lower = p.lower()
    assert 1 <= lower.count("exchange hashpartitioning") <= 2
    physical = p[p.index("== Physical Plan =="):]
    assert "transform(" not in physical  # no higher-order fn survives
    assert "Generate explode" in physical or "explode" in physical.lower()


def test_topk_broadcasts_query_side(spark):
    p = plan_text(QUERIES["ann_cosine_topk"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_state_table_scan_prunes_day_partition(spark, tmp_path):
    """The state table is day-partitioned; a day-filtered merge query
    must show a PartitionFilters entry (metadata-only pruning)."""
    mv = mainpage_mv(str(tmp_path / "state"))
    ev = prepare_events(spark, SF_SMOKE)
    mv.append_batch(ev)
    one_day = str(ev.select("day").distinct().limit(1).collect()[0]["day"])
    df = mv.merge_query(spark, ["segment"], ["event_cnt"], where=F.col("day") == one_day)
    p = plan_text(df)
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and "day" in pf[0] and "isnotnull" in pf[0] or "equals" in pf[0].lower() or "=" in pf[0]


def test_contamination_eval_set_broadcasts(spark):
    """Decontamination at 100 TB: the eval gram set must broadcast —
    the train corpus side joins without shuffling beyond its own n-gram
    fan-out — and the n-gram path must stay out of interpreted lambdas
    (explode+slice+array_join, no transform())."""
    df = QUERIES["contamination_check"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "transform(" not in plan_text(df, "extended")


def test_sample_and_chunk_are_single_window_ops(spark):
    """packing.sample_per_group / chunk_assign: exactly one exchange
    (the group partitioning) feeding one Window — no extra shuffles."""
    import re

    for name in ("sample_stratified", "chunk_assignment"):
        p = plan_text(QUERIES[name](spark, SF_SMOKE))
        # formatted mode lists each node twice (tree + detail) — count
        # the detail headers
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, (name, p)
        assert "Window" in p


def test_greedy_pack_is_the_only_python_stage(spark):
    """training_pipeline: the single Python stage in the whole chain is
    the sequential packing walk (Arrow-batched applyInPandas); every
    upstream stage (quality gate, dedup, decontaminate, sample) stays
    JVM-side."""
    import re

    p = plan_text(QUERIES["training_pipeline"](spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", p)) == 1
    assert "BatchEvalPython" not in p  # no row-at-a-time Python UDFs


def test_global_topk_is_take_ordered(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-
    partition top-k + driver merge), never a global Sort exchange."""
    from clickhouse_learning_spark.queries import QUERIES

    df = QUERIES["global_topk_orders"](spark, SF_SMOKE)
    plan = plan_text(df)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan


def test_with_fill_calendar_is_broadcast(spark):
    """WITH FILL: the exploded min/max calendar is a 1-row-aggregate
    derivation — its join onto the rollup must be broadcast, never a
    shuffle of the (big) aggregate side."""
    import clickhouse_learning_spark.queries_behavior  # noqa: F401

    df = QUERIES["with_fill_days"](spark, SF_SMOKE)
    plan = plan_text(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_summap_precount_is_two_level_hash_agg(spark):
    """summap write path: relational pre-aggregation — two HashAggregate
    levels over (dims, key), no ObjectHashAggregate carrying raw rows in
    the pre-count subtree (the collect into the state array is the only
    object agg, over already-compact per-key rows)."""
    df = QUERIES["summap_event_values"](spark, SF_SMOKE)
    plan = plan_text(df, mode="extended")
    # the per-(day,hour,event_type) SUM(weight) pre-aggregation exists
    assert plan.lower().count("hashaggregate") >= 4, plan[:3000]


def test_retention_single_exchange(spark):
    """retention_flags: one shuffle (the groupBy) — conditional max
    flags are plain codegen aggregates."""
    from clickhouse_learning_spark.functions import funnel as FN
    from clickhouse_learning_spark.queries import _events

    ev = _events(spark, SF_SMOKE)
    df = FN.retention_flags(
        ev, ["uid"], ["event_type = 'view'", "event_type = 'click'"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_quantized_ivf_probe_prunes_partitions(spark, tmp_path):
    """The int8-quantized index probe must keep the cell partition
    pruning of the float index."""
    from clickhouse_learning_spark.operators.similarity import IvfIndex
    from clickhouse_learning_spark.schemas import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = IvfIndex(str(tmp_path / "q")).build(emb, n_centroids=8, quantized=True)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = plan_text(idx.search(spark, q, k=5, n_probes=2))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cell" in pf[0], plan[:2000]


def test_rfm_segments_has_no_global_window(spark):
    """rfm_segments (round-3 rewrite): quartile scoring must carry NO
    window operator at all — the ntile form moved the whole customer
    rollup to a single partition three times. The plan is two
    HashAggregate pairs (per-customer rollup, 9-value percentile
    boundary reduce) plus a 1-row broadcast join for score assignment."""
    import clickhouse_learning_spark.queries_tpch  # noqa: F401

    p = plan_text(QUERIES["rfm_segments"](spark, SF_SMOKE))
    assert "Window" not in p, p[:3000]
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert p.count("HashAggregate") >= 2


def test_vocab_top_is_take_ordered(spark):
    """vocab_top (round-3 rewrite): the top-``size`` vocabulary cut must
    compile to TakeOrderedAndProject (per-partition top-k over the
    distinct-token counts), never a single-partition row_number window —
    distinct tokens at web scale are O(billions)."""
    from clickhouse_learning_spark.operators.text import vocab_top
    from clickhouse_learning_spark.schemas import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    p = plan_text(vocab_top(docs, size=100))
    assert "TakeOrderedAndProject" in p, p[:3000]
    assert "Window" not in p


def test_small_quantity_revenue_plan(spark):
    """Q17 decorrelation shape: the per-part pre-aggregation and its
    join back to lineitem both key on l_partkey (co-partitioned — no
    extra exchange beyond the key shuffle), and the part dimension
    broadcasts."""
    import clickhouse_learning_spark.queries_tpch  # noqa: F401

    df = QUERIES["small_quantity_revenue"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "BroadcastHashJoin" in p  # part side
    # the l_partkey self-join must be a hash join keyed on l_partkey,
    # not a nested-loop/cartesian
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # partial/final split on the final brand rollup
    assert p.count("HashAggregate") >= 2


def test_decorrelation_shapes(spark):
    """Round-3 TPC-H decorrelation additions: EXISTS → LeftSemi with
    the date range as residual (no nested-loop), IN-HAVING → LeftSemi
    over the pre-aggregated key set, NOT EXISTS → LeftAnti, and the
    1-row global-aggregate comparisons broadcast."""
    import clickhouse_learning_spark.queries_tpch  # noqa: F401

    p4 = plan_text(QUERIES["late_ship_priority"](spark, SF_SMOKE))
    assert "LeftSemi" in p4 and "CartesianProduct" not in p4

    p18 = plan_text(QUERIES["large_volume_orders"](spark, SF_SMOKE))
    assert "LeftSemi" in p18

    p22 = plan_text(QUERIES["idle_rich_customers"](spark, SF_SMOKE))
    assert "LeftAnti" in p22
    assert "BroadcastNestedLoopJoin" in p22 or "BroadcastHashJoin" in p22


def test_targeted_salted_join_plan(spark):
    """targeted_salted_join (round-3b): the strategy must stay pinned to
    sort-merge (the whole point is a non-broadcastable dim), with no
    broadcast of the exploded side; the salt explode must appear once on
    the dim side only (Generate node), and the fact side carries a
    branching salt projection, not an explode."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators.skew import targeted_salted_join
    from clickhouse_learning_spark.schemas import load_table

    ev = load_table(spark, SF_SMOKE, "events").withColumnRenamed("user_id", "uid")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("uid"), "c_mktsegment"
    )
    p = plan_text(targeted_salted_join(ev, dim, "uid", hot_keys=[1, 2, 3]))
    assert "SortMergeJoin" in p, p[:3000]
    import re as _re

    # one explode (numbered node), on the dim side only — the formatted
    # plan names each node twice (tree + details)
    assert len(_re.findall(r"\(\d+\) Generate", p)) == 1, p[:3000]


def test_lm_scoring_plan_is_jvm_side(spark):
    """lm_quality_scores (round-4): training counts and the scoring
    joins must stay JVM-side — no Python UDF stages anywhere (the
    tokenize/bigram explosion is regexp_extract_all + transform), and
    the only nested-loop join is the 1-row corpus-total broadcast."""
    from clickhouse_learning_spark.operators import lm as LM
    from clickhouse_learning_spark.schemas import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    model = LM.train_bigram_lm(docs)
    p = plan_text(LM.score_docs(docs, model))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    # the total enters as a broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p[:3000]


def test_window_funnel_fold_single_shuffle(spark):
    """ch_window_funnel_dialect's fold (round-4): the whole
    windowFunnel aggregate must be ONE aggregation over the events
    scan — a single exchange pair (partial/final ObjectHashAggregate
    around one shuffle), no Python stages, no joins."""
    import clickhouse_learning_spark.queries_behavior  # noqa: F401
    from clickhouse_learning_spark.queries import QUERIES

    df = QUERIES["ch_window_funnel_dialect"](spark, SF_SMOKE)
    p = plan_text(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p, p[:2000]
    # two grouping levels (per-user fold, then the level histogram)
    assert p.count("Exchange") <= 4, p[:2000]


def test_nb_train_is_single_exchange(spark):
    """Naive-Bayes training (operators/classifier.py) must be ONE count
    shuffle over the exploded token stream — the conditional class
    counts are map-side-combinable columns of the same hash aggregate,
    never a second exchange or a driver collect."""
    import re

    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators import classifier as NB

    docs = spark.range(100).select(
        (F.col("id") % 2 == 0).alias("label"),
        F.concat(F.lit("w"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    model = NB.train_nb(docs)
    p = plan_text(model.word_llr)
    # the counts frame is cached, so the corpus-side count shuffle
    # appears ONCE; the totals branch reads the cache (its own global
    # agg moves O(vocab) pre-aggregated rows, not corpus tokens)
    assert "InMemoryTableScan" in p, p[:4000]
    corpus_shuffles = [
        m.start() for m in re.finditer(r"Exchange hashpartitioning\(w", p)
    ]
    assert len(corpus_shuffles) <= 1, p[:4000]


def test_vector_and_scalar_with_queries_are_map_only(spark):
    """ch_vector_dialect / ch_scalar_with_dialect are pure per-row
    projections over one scan — zero exchanges (the 100 TB shape for
    embedding feature extraction and text probing)."""
    import re

    import clickhouse_learning_spark.queries_reference  # noqa: F401
    from clickhouse_learning_spark.queries import QUERIES

    for name in ("ch_vector_dialect", "ch_scalar_with_dialect"):
        df = QUERIES[name](spark, SF_SMOKE)
        p = plan_text(df)
        assert not re.search(r"\(\d+\) Exchange", p), (name, p[:3000])


def test_quantiles_and_assoc_queries_single_shuffle(spark):
    """The collected-fold aggregate queries (quantile rank rules,
    association coefficients) group once — a single hash-partitioned
    exchange on the grouping key, everything else inside codegen."""
    import re

    import clickhouse_learning_spark.queries_reference  # noqa: F401
    from clickhouse_learning_spark.queries import QUERIES

    for name in ("ch_quantiles_dialect", "ch_stats_assoc_dialect"):
        df = QUERIES[name](spark, SF_SMOKE)
        p = plan_text(df)
        shuffles = re.findall(r"\(\d+\) Exchange", p)
        assert len(shuffles) <= 1, (name, len(shuffles), p[:3000])


def test_sq8_pipeline_is_pure_catalyst(spark):
    """SQ8 (r6): encode and the symmetric top-k must be JVM-side
    end-to-end — integer codes via transform literals, dequantized
    cosine via zip_with/aggregate, no Python stages; the query side
    enters as a broadcast."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    mins, spans = S.sq8_calibrate(emb)
    codes = S.sq8_encode(emb, mins, spans)
    q = codes.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "codes"
    )
    p = plan_text(S.sq8_topk(codes, q, mins, spans, k=5))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_jl_projection_is_map_only(spark):
    """JL projection (r6): a literal sign matrix folded per row — no
    shuffle, no Python stage, no join in the projection itself."""
    from clickhouse_learning_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    p = plan_text(S.random_projection(emb, 8))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Exchange" not in p, p[:2000]
    assert "Join" not in p


def test_wordpiece_count_is_single_exchange(spark):
    """WordPiece training's distributed half (r6) must be ONE count
    shuffle over the exploded token stream + the TakeOrdered cap —
    same contract as train_bpe."""
    from pyspark.sql import functions as F

    from clickhouse_learning_spark.operators.text import TOKEN_RE
    from clickhouse_learning_spark.schemas import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    counts = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_RE), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(50_000)
    )
    p = plan_text(counts)
    assert "TakeOrderedAndProject" in p
    # formatted mode prints each node twice (tree line + detail header)
    assert p.count("Exchange") <= 2, p[:2000]


def test_ivfpq_scan_is_pure_catalyst(spark, tmp_path):
    """IVF-PQ (r7): the probe scan must be JVM-side — the per-cell ADC
    tables enter as literals, the scan is a CASE of element_at sums
    over the cell filter; no Python stage, no join. The codes table is
    read from parquet PARTITIONED BY cell (the at-scale layout:
    training/encode are offline), so the probe filter must show up as
    a partition PRUNE, not a post-scan filter."""
    from clickhouse_learning_spark.operators import pq as PQ

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents, books = PQ.train_ivfpq(emb, n_cells=4, m=4, k=8)
    out = str(tmp_path / "ivfpq_codes")
    PQ.encode_ivfpq(emb, cents, books).write.partitionBy(
        "cell").parquet(out)
    codes_tbl = spark.read.parquet(out)
    q = [float(x) for x in
         emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    p = plan_text(PQ.ivfpq_topk(codes_tbl, q, cents, books,
                                n_probes=2, top_k=5))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Join" not in p and "CartesianProduct" not in p
    assert "PartitionFilters: [cell" in p.replace("\n", " ") or \
        "cell#" in p.split("PartitionFilters")[1][:200], p[:3000]


def test_r10_graded_queries_plan_shapes(spark):
    """The r10-staged graded queries keep their declared scale
    shapes: ch_subseq_net_dialect is map-only except the IPv6-UDF
    lane (no Exchange); ch_split_window_dialect is one shuffle on
    the (window, type) key; ch_combinator_cross_dialect is exactly
    two (partial key, then bucket) with map-side partial aggregation
    before each. All three scans are column-pruned."""
    import re

    import clickhouse_learning_spark.queries_reference  # noqa: F401

    df = QUERIES["ch_subseq_net_dialect"](spark, SF_SMOKE)
    p = plan_text(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 0, p[:2000]
    assert "ReadSchema" in p and "text" in p.split("ReadSchema")[1][:200]

    df = QUERIES["ch_split_window_dialect"](spark, SF_SMOKE)
    p = plan_text(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:2000]
    # partial + final aggregation around the one shuffle (hash or
    # object-hash, depending on the buffer types)
    n_aggs = len(re.findall(
        r"\(\d+\) (?:ObjectHash|Hash|Sort)Aggregate", p))
    assert n_aggs == 2, p[:2000]

    df = QUERIES["ch_combinator_cross_dialect"](spark, SF_SMOKE)
    p = plan_text(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2, p[:2000]
    # 4-column pruned scan
    rs = p.split("ReadSchema")[1][:250]
    assert "o_orderkey" in rs and "o_totalprice" in rs
    assert "o_orderdate" not in rs
