"""Physical-plan shape tests — the 100 TB contract, asserted (SURVEY.md §4).

Correctness says the operator computes the right rows; these say it
computes them with the plan you'd want on a 1000-executor cluster:
pruned scans, pushed filters, broadcast dims, no redundant exchanges,
bucketing eliminating the join shuffle entirely.
"""

import pytest
from pyspark.sql import functions as F

from nyc_tlc_trip_data_pipelines_spark.catalog import load_table
from nyc_tlc_trip_data_pipelines_spark.io import write_bucketed
from nyc_tlc_trip_data_pipelines_spark.plans import (
    exchange_count,
    node_count,
    plan_string,
    scan_read_schema,
)


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    schemas = scan_read_schema(li)
    assert schemas and all("l_extendedprice" not in s for s in schemas)
    assert any("l_quantity" in s for s in schemas)


def test_agg_has_partial_and_final(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    # partial (map-side) + final hash aggregate around one exchange
    assert node_count(out, "HashAggregate") == 2
    assert exchange_count(out) == 1


def test_window_shared_grain_reuses_exchange(spark, sf_dir):
    # two windows over the same partition spec must not add a second shuffle
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    out = ev.select(
        "event_id", F.avg("value").over(w).alias("a"), F.max("value").over(w).alias("b")
    )
    assert exchange_count(out) == 1
    assert node_count(out, "Window") == 1


def test_bucketed_join_no_exchange(spark, sf_dir, tmp_path):
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8)
    write_bucketed(o, "ord_bucketed", ["o_orderkey"], 8)
    with_aqe_off = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        lb = spark.table("li_bucketed")
        ob = spark.table("ord_bucketed")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        # bucketed on the join key both sides: no shuffle exchange at all
        assert exchange_count(joined) == 0
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", with_aqe_off)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_salted_join_matches_plain_join(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, on=["l_orderkey"]).count()
    salted = salted_join(li, o, on=["l_orderkey"], salt_buckets=8).count()
    assert salted == plain


def test_topk_no_global_sort(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    top = li.orderBy(F.col("l_extendedprice").desc()).limit(7)
    p = plan_string(top, "simple")
    assert "TakeOrderedAndProject" in p
    # a global Sort node would mean a range exchange of the full table
    assert "rangepartitioning" not in p.lower()


def test_entry_queries_have_pruned_scans(spark):
    """Spot-check flagship: TPC-H Q1 shape reads only the 7 needed cols."""
    import __spark_entry__ as E

    df = E.q_agg_basic(spark, "/root/testdata/sf0.001")
    schemas = scan_read_schema(df)
    assert schemas and all("l_partkey" not in s for s in schemas)


def test_sessionize_single_exchange(spark, sf_dir):
    # sessionize = lag flag + running sum over the SAME (entity, ts) spec:
    # one shuffle on the entity key, both passes in shared Window nodes
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.sessionize(ev, "user_id", "ts", 1800, tiebreak_cols=("event_id",))
    assert exchange_count(out) == 1


def test_asof_join_single_exchange_no_join_node(spark, sf_dir):
    # union-merge as-of: one shuffle on the entity key and NO join operator
    # (the naive formulation would be a BroadcastNestedLoopJoin)
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = TS.asof_join(clicks, purchases, "user_id", "ts", "ts")
    assert exchange_count(out) == 1
    plan = plan_string(out)
    assert "Join" not in plan


def test_tfidf_broadcasts_small_sides(spark, sf_dir):
    import __spark_entry__ as E

    out = E.q_text_tfidf(spark, sf_dir)
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_text_pack_window_is_sharded_not_global(spark, sf_dir):
    """VERDICT r1 #3: the contract pack query must run a PARTITIONED
    running-sum window — a global (single-partition) sort of the corpus
    is the one 100 TB scale-killer found in round 1."""
    import __spark_entry__ as E

    out = E.q_text_pack(spark, sf_dir)
    plan = plan_string(out)
    # the pack window itself must shuffle by shard...
    assert "hashpartitioning(__shard" in plan
    # ...and nothing below the final presentation sort may funnel the
    # data through one partition (the final orderBy is fine: Spark plans
    # it as rangepartitioning, not SinglePartition)
    assert "Exchange SinglePartition" not in plan


def test_pack_default_is_sharded_no_single_partition_window(spark, sf_dir):
    """Round-5 advice: the DEFAULT pack_documents call (no shard_col)
    must hash-shard the window — the shard_col=None fallback used to be
    a single-task global sort of the corpus, the one API footgun left
    after round 4. Explicit shard_col still works (q_text_pack)."""
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.pack_documents(docs, token_budget=2000)
    plan = plan_string(out)
    assert "hashpartitioning(__shard" in plan
    assert "Exchange SinglePartition" not in plan
    # packs are keyed per shard and the default shard count holds
    n_shards = out.select("shard").distinct().count()
    assert 1 < n_shards <= 64


def test_triangle_count_no_nested_loop_join(spark, sf_dir):
    """Round-5: the triangle closure must be an equi-join against the
    canonical edge set — an OR-condition closing join planned as
    BroadcastNestedLoopJoin is O(|2paths| x |edges|), the graph-op
    scale-killer this fence pins out."""
    import __spark_entry__ as E

    out = E.q_graph_triangles(spark, sf_dir)
    plan = plan_string(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_pipeline_exchange_ceiling(spark, sf_dir):
    """VERDICT r1 #8: regression fence for the staged dedup pipeline —
    PLANS.md recorded 10 exchanges in round 1; a regression (e.g. losing
    the persisted-signature reuse or a join reshuffle) shows up here as
    a count blowout long before it shows up as a 100 TB incident."""
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.near_duplicate_groups(docs, jaccard_threshold=0.4)
    # 12 as of round 2 (sig-join refactor added two cheap id joins); the
    # displayed count includes the persisted signature subtree once per
    # reference, so a blowout here means a lost persist or a new shuffle
    assert exchange_count(out) <= 12


def test_minhash_core_exchange_ceiling(spark, sf_dir):
    # the un-persisted LSH core is where exchange counting is honest
    # (persisted plans re-display cached subtrees per reference): shingle
    # agg + band bucket self-join + pair groupBy + 2 sig re-joins
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.minhash_near_duplicates(docs, persist_signatures=False)
    assert exchange_count(out) <= 8


def test_tpch_q19_or_of_ands_pushes_scan_filters(spark):
    """Q19's OR-of-ANDs must still prune at the scan: Catalyst extracts
    the common brand/size disjunction into parquet pushed filters."""
    import __spark_entry__ as E

    df = E.q_sql_tpch_q19(spark, "/root/testdata/sf0.001")
    plan = plan_string(df)
    assert "PushedFilters: [" in plan
    # the part-side scan must carry an Or() pushdown, not a bare scan
    assert "Or(" in plan


def test_tpch_q21_self_correlations_stay_hash_joins(spark):
    """Q21's EXISTS/NOT EXISTS self-correlations must plan as hash
    semi/anti joins (never BroadcastNestedLoop over lineitem)."""
    import __spark_entry__ as E

    df = E.q_sql_tpch_q21(spark, "/root/testdata/sf0.001")
    plan = plan_string(df)
    assert "NestedLoop" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_join_hints_are_honored(spark, sf_dir):
    """Optimizer-control surface: SHUFFLE_HASH / MERGE / BROADCAST
    hints must pick the corresponding physical join — the manual
    override lever when AQE's choice is wrong for a known workload."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cases = [
        ("shuffle_hash", "ShuffledHashJoin"),
        ("merge", "SortMergeJoin"),
        ("broadcast", "BroadcastHashJoin"),
    ]
    for hint, node in cases:
        joined = li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
        assert node in plan_string(joined), hint


def test_minhash_verified_broadcasts_candidates(spark, sf_dir):
    # verified pairs: candidate set is broadcast back onto the corpus
    # (left_semi) so the shingle table is never shuffled for the verify,
    # and the candidate subtree is cache-reused, not recomputed
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.minhash_verified_pairs(docs, threshold=0.8)
    plan = plan_string(out, "simple")
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan


def test_ohlc_single_exchange_no_window(spark, sf_dir):
    # the whole bar is ONE hash aggregate per (entity, bucket): one
    # exchange, partial+final agg, and no Window node at all
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.ohlc(ev)
    assert exchange_count(out) == 1
    assert node_count(out, "Window") == 0
    # struct-valued MIN/MAX buffers force SortAggregate (not hash), but
    # the partial+final pair around a single exchange must remain
    assert node_count(out, "SortAggregate") == 2


def test_time_weighted_avg_exchange_ceiling(spark, sf_dir):
    # one shuffle for the (entity, ts) window + one for the final agg —
    # the lead() window and the aggregate must share the entity key
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.time_weighted_avg(ev)
    assert exchange_count(out) <= 2
    assert node_count(out, "Window") == 1


def test_decontaminate_is_gram_keyed_not_quadratic(spark, sf_dir):
    # the train/test overlap must be an equi-join on the gram key —
    # never a nested-loop/cartesian pair expansion
    from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP

    docs = load_table(spark, sf_dir, "documents")
    out = CP.train_test_overlap(
        docs.filter(F.col("doc_id") % 10 != 0), docs.filter(F.col("doc_id") % 10 == 0)
    )
    p = plan_string(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_quality_filter_no_expand_rewrite(spark, sf_dir):
    # the word stats avoid COUNT(DISTINCT): no Expand node may appear
    from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP

    docs = load_table(spark, sf_dir, "documents")
    out = CP.quality_filter(docs)
    assert node_count(out, "Expand") == 0


def test_minhash_signatures_no_expand_and_codegen_shingles(spark, sf_dir):
    # with_size must use the explicit pre-dedup (no Expand), and the
    # shingle pipeline must be the codegen substring path (a Generate
    # over a sequence, not a higher-order transform over an array build)
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.minhash_signatures(docs, with_size=True)
    p = plan_string(out)
    assert node_count(out, "Expand") == 0
    assert "substring(" in p and "sequence(1" in p


def test_zorder_key_is_flat_codegen_expression(spark, sf_dir):
    # the Morton key must stay a single projection over the scan — no
    # exchange, no UDF/python eval in the plan
    from nyc_tlc_trip_data_pipelines_spark.operators import layout as LO

    o = load_table(spark, sf_dir, "orders")
    out = o.select(LO.zorder_key(F.col("o_custkey") % 256, F.col("o_orderkey") % 256))
    assert exchange_count(out) == 0
    p = plan_string(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_containment_is_posting_list_not_all_pairs(spark, sf_dir):
    # the self-join must key on the shingle hash (inverted index), not
    # bare block equality (all-pairs within a language block), and no
    # shingle ARRAY may cross an exchange — posting rows are fixed-width
    from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP

    docs = load_table(spark, sf_dir, "documents")
    out = CP.containment_pairs(docs)
    p = plan_string(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the equi-join keys appear in the plan's join node arguments; the
    # shingle column must be among them for the pair-generation join
    assert "shingle" in p
    assert "array_intersect" not in p  # per-pair array intersection is the old shape


def test_dq_profile_is_single_aggregate_pass(spark, sf_dir):
    # the profiler must compute every column's stats in ONE aggregate
    # over the scan: exactly one exchange (partial -> final), and the
    # approx-ndv default must not Expand the scan
    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ

    li = load_table(spark, sf_dir, "lineitem")
    out = DQ.profile(li, cols=["l_orderkey", "l_returnflag", "l_shipdate"])
    assert exchange_count(out) <= 1
    assert node_count(out, "Expand") == 0


def test_sample_per_group_single_window_exchange(spark, sf_dir):
    # k-per-group sampling is one hash exchange on the group key plus a
    # window — no join, no second shuffle. Spark additionally plans a
    # WindowGroupLimit (partial map-side + final top-k per group), so
    # rows beyond k die BEFORE the exchange — assert the optimization
    # stays in the plan; losing it means the full corpus shuffles.
    from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP

    docs = load_table(spark, sf_dir, "documents")
    out = CP.sample_per_group(docs, k=10)
    assert exchange_count(out) == 1
    p = plan_string(out)
    assert "WindowGroupLimit" in p
    assert "Join" not in p


def test_bpe_pairs_aggregates_vocabulary_before_exploding(spark, sf_dir):
    # pair explosion must run over the deduped word-frequency table, not
    # the raw corpus: the plan is agg(words) -> explode -> agg(pairs),
    # i.e. the position-explode Generate sits ABOVE the first aggregate
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.bpe_pair_stats(docs, top_k=50)
    p = plan_string(out)
    gen = p.index("Generate")
    assert "HashAggregate" in p[:gen], "explode must come after the vocab aggregate"
    assert node_count(out, "BatchEvalPython") == 0


def test_doc_chunk_zero_exchanges(spark, sf_dir):
    # chunking is row-local codegen (tokenize + sequence/explode +
    # slice): scan -> project -> generate, NO shuffle anywhere — at
    # 100 TB this pipelines straight from scan to sink
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.chunk_sliding(docs, window=64, stride=48)
    assert exchange_count(out) == 0
    assert node_count(out, "Join") == 0


def test_bm25_broadcasts_stats_and_vocabulary(spark, sf_dir):
    # corpus stats (1 row) and the query-term df table (|terms| rows)
    # must ride in as broadcasts; the only corpus-sized shuffles are
    # the token aggregates — no sort-merge join anywhere
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.bm25_rank(docs, ("spark", "join", "window"), top_k=10)
    p = plan_string(out)
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    # global top-k must be TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in p


def test_feature_hash_single_exchange_no_joins(spark, sf_dir):
    # hashing-trick featurization: tokenize -> hash -> one (doc,
    # bucket) aggregate; fixed dimensionality means NO vocabulary
    # join ever appears
    import __spark_entry__ as E

    out = E.q_feature_hash(spark, sf_dir)
    p = plan_string(out)
    assert "Join" not in p
    assert exchange_count(out) == 1


def test_lm_perplexity_model_tables_broadcast(spark, sf_dir):
    # unigram/bigram model tables and the vocab scalar must broadcast
    # onto the bigram stream — no sort-merge join in the scoring path
    import __spark_entry__ as E

    out = E.q_lm_perplexity(spark, sf_dir)
    p = plan_string(out)
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_rolling_median_shares_one_window_exchange(spark, sf_dir):
    # the frame aggregate and the completeness row_number ride the same
    # (user_id; ts, event_id) spec: one exchange, one sort
    import __spark_entry__ as E

    out = E.q_rolling_median(spark, sf_dir)
    assert exchange_count(out) == 1


def test_crosstab_marginals_broadcast(spark, sf_dir):
    # row/col marginals and the grand total must broadcast onto the
    # cell table — the fact side shuffles exactly once for its own agg
    import __spark_entry__ as E

    out = E.q_crosstab_chi2(spark, sf_dir)
    p = plan_string(out)
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_nullsafe_join_stays_hash_join(spark, sf_dir):
    # <=> must plan as a (broadcast) hash join — the OR-emulation
    # (a = b OR (a IS NULL AND b IS NULL)) degrades to nested-loop
    import __spark_entry__ as E

    out = E.q_join_nullsafe(spark, sf_dir)
    p = plan_string(out)
    assert "HashJoin" in p  # BroadcastHashJoin or ShuffledHashJoin
    assert "BroadcastNestedLoopJoin" not in p


def test_lateral_decorrelates_to_window_topk(spark, sf_dir):
    # Catalyst must rewrite the LATERAL into a join + per-group limit,
    # not re-execute the subquery per outer row (no nested-loop join
    # carrying a LocalLimit)
    import __spark_entry__ as E

    out = E.q_lateral_topk(spark, sf_dir)
    p = plan_string(out)
    assert "Join" in p


def test_phrase_search_single_hits_sized_exchange(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    docs = load_table(spark, sf_dir, "documents")
    out = TX.phrase_count(docs, ["table", "value"])
    # codegen position-explode + scalar adjacency filter BEFORE the
    # aggregate: one hits-sized exchange, no join, no Python, and no
    # interpreted higher-order lambda (the in-array filter formulation
    # measured 10× slower at sf0.1)
    assert exchange_count(out) == 1
    assert node_count(out, "Join") == 0
    s = plan_string(out)
    assert "ArrayFilter" not in s and "Python" not in s


def test_skyline_is_agg_plus_window_not_join(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import windows as W

    li = load_table(spark, sf_dir, "lineitem")
    out = W.skyline_2d(li, "l_quantity", "l_extendedprice")
    s = plan_string(out)
    # sort-based frontier: no NOT-EXISTS self-join, no nested loop
    assert node_count(out, "Join") == 0
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s
    assert node_count(out, "Window") == 1


def test_bloom_prefilter_filter_is_codegen_no_join(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import joins as J

    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    pruned = J.bloom_prefilter(li, "l_partkey", parts, "p_partkey", min_big_bytes=0)
    s = plan_string(pruned)
    # the probe side is a pure filter over the scan: no join, no
    # exchange, no Python eval — the bitset is a literal array
    assert node_count(pruned, "Join") == 0
    assert exchange_count(pruned) == 0
    assert "Python" not in s


def test_markov_reuses_lag_exchange(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.markov_transitions(ev, "event_type", ["user_id"], [F.col("ts"), F.col("event_id")])
    # lag window (1 exchange) + pair aggregate (1) + broadcast-sized
    # totals window over prev_state (1): the corpus shuffles ONCE
    assert exchange_count(out) <= 3
    assert node_count(out, "HashAggregate") == 2  # partial + final


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    # The 100 TB star-join contract: a partitioned fact joined to a
    # FILTERED dim must scan only the partitions the dim filter selects
    # — Spark injects a dynamicpruning subquery into the fact scan.
    fact_path = str(tmp_path / "fact_part")
    li = load_table(spark, sf_dir, "lineitem").limit(20000)
    li.withColumn("pk", F.col("l_partkey") % 10).write.partitionBy("pk").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(10).select(
        F.col("id").alias("pk"), (F.col("id") * 100).alias("attr")
    ).filter(F.col("attr") == 300)
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        out = fact.join(dim, "pk").groupBy("pk").count()
        s = plan_string(out).lower()
        assert "dynamicpruning" in s or "dynamicpruningexpression" in s
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_kmv_sketch_uses_take_ordered_no_global_sort(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg

    ev = load_table(spark, sf_dir, "events")
    sk = agg.kmv_sketch(ev, F.col("user_id"), k=256)
    p = plan_string(sk, "simple")
    # k smallest hashes at 100 TB = per-partition heaps + k-row merge,
    # never a full range-exchange sort of the distinct set
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p.lower()


def test_assoc_rules_broadcasts_item_counts(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import mining as MN

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", (F.pmod(F.col("l_partkey"), F.lit(40))).alias("item"))
    out = MN.assoc_rules(baskets, "l_orderkey", "item", min_pair_count=5)
    p = plan_string(out, "simple")
    # the |items|-row count tables join broadcast; the only shuffles
    # are group-to-sets and the pair aggregate — the round-8 rework
    # removed the basket self-join, so NO sort-merge/shuffled-hash
    # join may appear in the plan
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_collocations_prunes_vocab_with_broadcast_semi(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import mining as MN

    d = load_table(spark, sf_dir, "documents")
    out = MN.collocations_pmi(d, min_df=20, min_pair_df=10)
    p = plan_string(out, "simple")
    # vocab prune BEFORE pair generation must be a broadcast semi join
    assert "LeftSemi, BuildRight" in p or ("LeftSemi" in p and "BroadcastHashJoin" in p)


def test_rolling_distinct_broadcasts_day_spine(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    e = load_table(spark, sf_dir, "events")
    out = TS.rolling_distinct_count(e, "ts", "user_id", 7)
    p = plan_string(out, "simple")
    # the few-hundred-row day spine joins as a broadcast nested loop
    # (range predicate) — the fact side must never range-shuffle
    assert "BroadcastNestedLoopJoin" in p
    assert "rangepartitioning" not in p.lower()


def test_welch_ttest_single_aggregate_pass(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg

    e = load_table(spark, sf_dir, "events")
    out = agg.welch_ttest(
        e, ["event_type"], F.round(F.col("value") * 100, 0),
        F.col("ts") < F.to_timestamp(F.lit("2024-01-08")),
    )
    # both arms' sufficient statistics in ONE partial+final aggregate
    assert node_count(out, "HashAggregate") == 2
    assert exchange_count(out) == 1


def test_checksum_diff_shuffles_only_summaries(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import dq as DQ

    e = load_table(spark, sf_dir, "events")
    out = DQ.checksum_diff(e, e.where(F.col("event_id") % 97 != 0),
                           ["event_id", "user_id", "event_type"], 16)
    # each side reduces map-side before its exchange: 2 checksum
    # exchanges + the tiny full-outer join; no raw-row exchange
    assert node_count(out, "HashAggregate") == 4  # partial+final per side


def test_minhash_accuracy_verify_is_array_intersect(spark, sf_dir):
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    d = load_table(spark, sf_dir, "documents")
    out = TX.minhash_accuracy(d)
    p = plan_string(out, "simple")
    # the exact stage must be the per-pair array intersect, never the
    # |pairs|x|doc| posting explode (measured 7.7s -> 1s at sf0.1)
    assert "array_intersect" in p


def test_image_dedup_shuffles_hashes_not_payloads(spark):
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_bmp_media(spark, 8)
    out = (
        M.ahash_images(media)
        .groupBy("ahash")
        .agg(F.min("media_id").alias("first_media"), F.count(F.lit(1)).alias("n"))
    )
    # exactly one exchange, keyed on the 8-byte hash — the payload
    # cannot cross it because the decode UDF's output schema is
    # (media_id, ahash): the exchange sits ABOVE MapInPandas
    p = plan_string(out, "simple")
    assert exchange_count(out) == 1
    assert "hashpartitioning(ahash" in p
    assert p.index("Exchange") < p.index("MapInPandas")


def test_url_dedup_single_keyed_exchange(spark, sf_dir):
    # canonicalization is scan-stage codegen; the ONLY exchange is the
    # canonical-key groupBy (partial + final hash aggregate around it)
    from nyc_tlc_trip_data_pipelines_spark.operators import web as WB

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("https://h.com/"), F.col("doc_id").cast("string")).alias("url")
    )
    out = WB.url_dedup(d)
    assert exchange_count(out) == 1
    assert "hashpartitioning(canonical_url" in plan_string(out, "simple")
    assert node_count(out, "HashAggregate") == 2


def test_html_strip_is_codegen_no_extra_exchange(spark, sf_dir):
    # the whole strip pipeline lives in one WholeStageCodegen project
    # over the scan; a per-source rollup adds exactly one exchange
    from nyc_tlc_trip_data_pipelines_spark.operators import web as WB

    d = load_table(spark, sf_dir, "documents")
    html = F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
    out = (
        d.select("source", WB.strip_html(html).alias("t"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = plan_string(out, "simple")
    assert exchange_count(out) == 1
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_token_entropy_two_keyed_exchanges(spark, sf_dir):
    # (id, w) count then (id) rollup — both hash-keyed, both with
    # map-side partial aggregation; no windows, no Python
    from nyc_tlc_trip_data_pipelines_spark.operators import corpus as CP

    out = CP.token_entropy(load_table(spark, sf_dir, "documents"))
    p = plan_string(out, "simple")
    assert exchange_count(out) == 2
    assert node_count(out, "HashAggregate") == 4
    assert "Window" not in p and "BatchEvalPython" not in p


def test_curation_pipeline_composes_without_python_or_bnlj(spark, sf_dir):
    # flagship composition: dedup window keyed on the md5 fingerprint,
    # id-keyed joins stay hash joins, every stage codegen (no Python)
    import __spark_entry__ as E

    out = E.queries()["q_curation_pipeline"](spark, sf_dir)
    p = plan_string(out, "simple")
    assert "hashpartitioning(_w0" in p or "hashpartitioning(md5" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "MapInPandas" not in p


def test_audio_dedup_shuffles_hashes_not_payloads(spark):
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.operators import multimodal as M

    media = M.make_wav_media(spark, 8)
    out = (
        M.ehash_audio(media)
        .groupBy("ehash")
        .agg(F.min("media_id").alias("first_media"), F.count(F.lit(1)).alias("n"))
    )
    # exactly one exchange, keyed on the 8-byte hash, sitting ABOVE the
    # decode UDF — the payload cannot cross it
    p = plan_string(out, "simple")
    assert exchange_count(out) == 1
    assert "hashpartitioning(ehash" in p
    assert p.index("Exchange") < p.index("MapInPandas")


def test_bootstrap_explode_folds_before_exchange(spark, sf_dir):
    """The Poisson bootstrap's B-fold Generate must reduce in the SAME
    stage's partial HashAggregate — the shuffle carries groups x B
    cells, never rows x B (the Chamandy one-pass property)."""
    from pyspark.sql import functions as F

    from nyc_tlc_trip_data_pipelines_spark.catalog import load_table
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg

    e = load_table(spark, sf_dir, "events")
    out = agg.poisson_bootstrap_ci(e, ["event_type"], F.col("value"), "event_id")
    p = plan_string(out, "simple")
    gen = p.index("Generate")
    # a partial aggregate sits between the explode and the first
    # exchange ABOVE it (plans print top-down: Exchange appears before
    # Generate in the string, HashAggregate between them)
    above = p[:gen]
    last_exchange = above.rindex("Exchange")
    assert "HashAggregate" in above[last_exchange:], (
        "no map-side combine between explode and shuffle"
    )


def test_ivfpq_lut_join_is_broadcast(spark, sf_dir):
    """The ADC lookup table (n_probe*m*k rows) must broadcast — the
    probed-cell code scan is never shuffled for the lookup join."""
    from nyc_tlc_trip_data_pipelines_spark.catalog import load_table
    from nyc_tlc_trip_data_pipelines_spark.operators import vectors as V

    emb = load_table(spark, sf_dir, "embeddings")
    out = V.ivfpq_topk(emb, [1.0] * 64, kc=4, n_probe=2, m=4, k_codes=4)
    p = plan_string(out, "simple")
    assert "BroadcastHashJoin" in p


def test_acf_pairs_join_runs_on_reduced_series(spark, sf_dir):
    """Round 8: the ACF lag join must operate on the per-grain
    aggregate SERIES (time-range-sized), never on raw event rows —
    exactly one join, fed by hash aggregates on both sides."""
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.autocorrelation(ev, "ts", "value", 3600, 12)
    p = plan_string(out, "simple")
    # exactly two joins: the lag equi-join over the series, plus the
    # 1-row broadcast global-stats attach (a benign BNLJ by design)
    assert node_count(out, "Join") == 2
    assert "CartesianProduct" not in p
    # both lag-join inputs are aggregates: >= 2 grouping aggregates
    # before the join plus the per-k one after it
    assert node_count(out, "HashAggregate") >= 4


def test_cuped_single_corpus_aggregate(spark, sf_dir):
    """Round 8: CUPED reduces the corpus in ONE keyed aggregate pass
    (partial + final); the pooled window then runs over the per-arm
    rows only — no second corpus shuffle, no Python."""
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg
    from nyc_tlc_trip_data_pipelines_spark.operators import text as TX

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("int")).alias("x"),
        F.sum(F.round(F.col("value") * 1e6, 0).cast("long")).alias("y"),
    )
    h = TX.portable_hash60(F.concat_ws("\x1f", F.col("user_id").cast("string"), F.lit("37")))
    arms = users.select((h % 2).cast("int").alias("arm"), "x", "y")
    out = agg.cuped_adjust(arms, "arm", F.col("x"), F.col("y"))
    p = plan_string(out, "simple")
    assert "Python" not in p
    assert node_count(out, "Window") == 1


def test_gini_one_rank_window_one_aggregate(spark, sf_dir):
    """Round 8: Gini = one group-partitioned rank window + one hash
    aggregate; the rank exchange is reused by the aggregate (same
    key), so the operator adds no extra shuffle beyond the sort."""
    from nyc_tlc_trip_data_pipelines_spark.operators import aggregates as agg

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 1e6, 0).cast("long")).alias("v")
    ).withColumn("g", F.pmod(F.col("o_custkey"), F.lit(25)))
    out = agg.gini_group(rev, ["g"], F.col("v"), F.col("o_custkey"))
    assert node_count(out, "Window") == 1
    assert "Python" not in plan_string(out, "simple")


def test_km_survival_windows_over_cells_not_subjects(spark, sf_dir):
    """Round 8: KM's windows must consume the per-duration CELL table
    (one hash aggregate below every window), so window volume is
    time-grain-sized regardless of subject count."""
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias("dur"),
        F.lit(1).alias("e"),
    )
    out = TS.km_survival(users, F.col("dur"), F.col("e"))
    p = plan_string(out, "simple")
    # the duration-cell aggregate sits between subjects and windows
    assert node_count(out, "HashAggregate") >= 2
    assert node_count(out, "Window") >= 1
    assert "Python" not in p


def test_seq_pairs_and_item_cf_no_shuffled_join(spark, sf_dir):
    """Round 8: every pair-generation op on the sorted-array
    higher-order expansion (seq pairs, item CF) must plan WITHOUT a
    shuffled join — broadcast joins for the count/total attach only."""
    import __spark_entry__ as E

    for q in ("q_seq_pairs", "q_item_cf"):
        out = E.queries()[q](spark, sf_dir)
        p = plan_string(out, "simple")
        assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, q


def test_ccf_joins_after_reduction(spark, sf_dir):
    """Round 8: the CCF lag join runs over the per-grain aggregate
    series (two joins total: lag equi-join + 1-row stats broadcast)."""
    from nyc_tlc_trip_data_pipelines_spark.operators import timeseries as TS

    ev = load_table(spark, sf_dir, "events")
    out = TS.cross_correlation(
        ev, "ts",
        (F.col("event_type") == "click").cast("int"),
        F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0)),
        3600, 6,
    )
    assert node_count(out, "Join") == 2
    assert "CartesianProduct" not in plan_string(out, "simple")


def test_path_mining_take_ordered_top(spark, sf_dir):
    """Round 8: the top-N path report must serve its top via
    TakeOrderedAndProject, not a global sort."""
    import __spark_entry__ as E

    out = E.queries()["q_path_mining"](spark, sf_dir)
    p = plan_string(out, "simple")
    assert "TakeOrderedAndProject" in p
    assert "rangepartitioning" not in p.lower()


def test_size_gated_broadcast_small_and_large(spark, sf_dir):
    """Round-9 (verdict item 3): under the size gate the hint applies
    (BroadcastHashJoin); with the gate forced closed (max_bytes=0) the
    hint is dropped and results stay byte-identical."""
    from nyc_tlc_trip_data_pipelines_spark.operators.joins import (
        size_gated_broadcast,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    dim = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_partkey").agg(F.count(F.lit(1)).alias("n"))
    )
    hinted = li.join(size_gated_broadcast(dim), li.l_partkey == dim.p_partkey)
    assert "BroadcastHashJoin" in plan_string(hinted, "simple")
    # large-side branch: gate closed -> no explicit hint survives the
    # helper (auto-broadcast may still fire at fixture scale, so assert
    # on the helper's output object, then on byte-identical results)
    gated = size_gated_broadcast(dim, max_bytes=0)
    assert gated is dim
    a = sorted(map(tuple, hinted.collect()))
    b = sorted(map(tuple, li.join(gated, li.l_partkey == dim.p_partkey).collect()))
    assert a == b


def test_node_jaccard_gated_paths_identical(spark):
    """Both broadcast-gate branches of node_jaccard produce the same
    rows (the hint only picks physical strategy)."""
    from nyc_tlc_trip_data_pipelines_spark.operators.graph import node_jaccard

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)], "src int, dst int"
    )
    base = sorted(map(tuple, node_jaccard(edges).collect()))
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import nyc_tlc_trip_data_pipelines_spark.operators.graph as G
        import nyc_tlc_trip_data_pipelines_spark.operators.joins as J
        orig = G.size_gated_broadcast
        G.size_gated_broadcast = lambda df, max_bytes=0: J.size_gated_broadcast(df, 0)
        try:
            forced = sorted(map(tuple, node_jaccard(edges).collect()))
        finally:
            G.size_gated_broadcast = orig
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert forced == base


def test_mmr_diversify_releases_cache(spark):
    """Round-9 (r8 ADVICE): mmr_diversify unpersists its pool/sims
    caches before returning — no persistent RDDs leak per call."""
    from nyc_tlc_trip_data_pipelines_spark.operators.vectors import mmr_diversify

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    mmr_diversify(df, [1.0, 0.2], k=2, pool=4).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before


def test_stats_serial_windows_are_sketch_sized(spark, sf_dir):
    """Round-10 verdict item 6: several statistics operators argue
    "the only serial (single-partition) stage is sketch-sized" — their
    global windows/sorts run on a post-aggregate grain table, never on
    the fact table. Fence it mechanically: every FileScan beneath every
    Exchange SinglePartition must pass through an Aggregate first, so a
    future edit can't silently move a global window onto raw rows."""
    import __spark_entry__ as E

    from nyc_tlc_trip_data_pipelines_spark.plans import (
        serial_exchange_inputs_are_aggregated,
    )

    qs = E.queries()
    for q in [
        "q_ks_test",
        "q_changepoint_cusum",
        "q_acf",
        "q_ccf",
        "q_stats_equidepth",
        "q_stl_decompose",
        "q_mannwhitney",
    ]:
        assert serial_exchange_inputs_are_aggregated(qs[q](spark, sf_dir)), (
            f"{q}: a single-partition exchange consumes an un-aggregated "
            "scan — the serial stage is no longer sketch-sized"
        )


def test_serial_exchange_fence_rejects_global_window_on_facts(spark, sf_dir):
    """The mutated-plan red case for the fence above: a global
    (unpartitioned) window straight over the events fact table is
    exactly the 100 TB scale-killer the check exists to catch."""
    from pyspark.sql import Window

    from nyc_tlc_trip_data_pipelines_spark.plans import (
        serial_exchange_inputs_are_aggregated,
    )

    ev = load_table(spark, sf_dir, "events")
    bad = ev.select(
        "event_id", F.sum("value").over(Window.orderBy("ts")).alias("r")
    )
    assert not serial_exchange_inputs_are_aggregated(bad)
