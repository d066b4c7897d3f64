"""Physical-plan quality gates: these assert the *plans*, not results.

A correct answer computed with a bad plan fails at 100 TB: filters must
reach the parquet scan (PushedFilters), projections must prune columns
(ReadSchema), dimension joins must broadcast, and aggregations must have
a map-side partial phase. These tests pin those properties so a refactor
that silently de-optimizes a plan fails CI.
"""

import datetime as dt

from pyspark.sql import functions as F

from pydin_spark import Day, Pipeline, Select


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_date_window_filter_pushed_to_scan(spark, views, sf_dir):
    # orders has native timestamps → the window must reach the scan.
    shell = Pipeline(date=Day(dt.datetime(1996, 6, 1)), spark=spark)
    model = Select(text="SELECT o_orderkey, o_orderdate FROM orders",
                   date_field="o_orderdate")
    model.pipeline = shell
    plan = plan_of(model.extract())
    assert "PushedFilters" in plan
    # the window bounds must appear as pushed predicates, not post-filters
    assert ("GreaterThanOrEqual(o_orderdate" in plan
            and "LessThanOrEqual(o_orderdate" in plan)


def test_events_date_window_pushed_after_staged_ingest(spark, views, sf_dir):
    # events is TIMESTAMP(NANOS) at rest; load_table stages a µs copy at
    # ingest so ts is a *stored* column — the date window must reach the
    # scan, not sit above a computed timestamp_micros projection.
    shell = Pipeline(date=Day(dt.datetime(2024, 1, 2)), spark=spark)
    model = Select(text="SELECT event_id, ts FROM events", date_field="ts")
    model.pipeline = shell
    plan = plan_of(model.extract())
    assert ("GreaterThanOrEqual(ts" in plan
            and "LessThanOrEqual(ts" in plan), plan


def test_column_pruning_reaches_scan(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.token_stats(spark.table("documents")))
    # only doc_id + text are read; lang/source/n_chars pruned at the scan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "lang" not in read_schema[0]
    assert "text" in read_schema[0]


def test_dimension_joins_broadcast(spark, views):
    import __spark_entry__ as entrymod
    plan = plan_of(spark.sql(entrymod.DUAL_SQL["q5_local_supplier_volume"]))
    assert "BroadcastHashJoin" in plan       # nation/region/supplier dims
    assert "CartesianProduct" not in plan


def test_aggregation_has_partial_phase(spark, views):
    import __spark_entry__ as entrymod
    plan = plan_of(spark.sql(entrymod.DUAL_SQL["q1_pricing_summary"]))
    # two HashAggregate operators = map-side partial + final merge
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_watermark_filter_pushed(spark, views):
    model = Select(text="SELECT o_orderkey, o_totalprice FROM orders",
                   value_field="o_orderkey", target_value=7000)
    plan = plan_of(model.extract())
    assert "GreaterThan(o_orderkey,7000)" in plan.replace(" ", "").replace(
        "L)", ")")


def test_asof_join_single_shuffle(spark, views):
    from pydin_spark.operators.relational import asof_join
    events = spark.table("events")
    left = events.where("event_type = 'purchase'").select(
        "event_id", "user_id", "ts")
    right = (events.where("event_type = 'signup'")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("signup_id")))
    plan = plan_of(asof_join(left, right, right_cols=("signup_id",)))
    # no join operator at all — the asof compiles to union + window
    assert "Join" not in plan or "BroadcastNestedLoop" not in plan
    assert "Window" in plan


def test_exact_dedup_single_exchange(spark, views):
    from pydin_spark.operators import dedup
    plan = plan_of(dedup.exact_dedup(spark.table("documents")))
    # one shuffle for the fingerprint groupBy; the fingerprint is
    # computed map-side before the exchange
    assert plan.count(" Exchange (") == 1


def test_language_id_ngram_stays_narrow(spark, views):
    """Trigram language ID must stay a single-pass scan: pruned read
    schema, no shuffle, no Python evaluation."""
    from pydin_spark.operators import text
    plan = plan_of(text.language_id_ngram(spark.table("documents")))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" in read_schema[0]
    assert "lang" not in read_schema[0]
    assert "Exchange" not in plan
    assert "Python" not in plan          # no UDF in the hot path


def test_cosine_block_stage_not_coalesced(spark, views):
    """The block-matrix candidate stage must keep one task per block
    pair: an explicit fixed-N repartition (REPARTITION_BY_NUM) that AQE
    cannot coalesce, and no driver-side collect anywhere (the plan is
    pure exchange + ArrowEvalPython/MapInPandas)."""
    from pydin_spark.operators.similarity import _cosine_candidates_blocks
    emb = spark.table("embeddings")
    plan = plan_of(_cosine_candidates_blocks(emb, 0.4, "vec_id",
                                             "embedding", 64))
    assert "REPARTITION_BY_NUM" in plan or "RoundRobin" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan


def test_no_cartesian_product_in_any_sql_query(spark, views, sf_dir):
    """Blanket gate: every dual-engine SQL query plans without a
    CartesianProduct — comma-join syntax with equality predicates must
    always resolve to hash/broadcast/sort-merge joins."""
    import __spark_entry__ as entrymod
    offenders = []
    for name, sql in entrymod.DUAL_SQL.items():
        plan = plan_of(spark.sql(sql))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_range_join_is_hash_join_not_nested_loop(spark, views, sf_dir):
    """The binned range join must plan as an equi (hash/SMJ) join — a
    keyless BETWEEN predicate alone nested-loops."""
    import __spark_entry__ as entrymod
    df = entrymod.queries()["q_range_join"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_lambda_join_broadcasts(spark, views):
    """The B-row lambda table must reach the per-doc features by
    BROADCAST (a shuffle join on the bucket key would move the whole
    feature frame for a 256-row dimension)."""
    from pydin_spark.operators.curation import importance_weights
    docs = spark.table("documents")
    w = importance_weights(docs, docs.where("lang = 'en'"))
    plan = plan_of(w)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semantic_dedup_clustered_join_is_hash_not_nested(spark, sf_dir):
    """With nlist > 1 the within-cluster pair join must be an
    equi-join on list_id (hash/sort-merge), never a nested loop —
    the clustering IS the quadratic-cost bound."""
    from pydin_spark import load_table
    from pydin_spark.operators.similarity import semantic_dup_pairs
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = semantic_dup_pairs(emb, threshold=0.4, nlist=4, max_iter=2)
    plan = plan_of(pairs)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_corpus_report_dup_membership_join_shape(spark, views):
    """corpus_report: no cartesian anywhere, and the report never
    shuffles more than the fingerprint/strata aggregates need."""
    from pydin_spark.operators.curation import corpus_report
    plan = plan_of(corpus_report(spark.table("documents")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_summary_single_aggregation_chain(spark, views):
    """The grouped heavy-hitter serve must not re-shuffle the summary
    between the merge aggregate and the rank window (same keys)."""
    from pydin_spark.operators.rollup import heavy_hitters
    hh = heavy_hitters(spark.table("events"), "user_id", k=5,
                       capacity=64, group_cols=("event_type",))
    plan = plan_of(hh)
    assert "CartesianProduct" not in plan


def test_knn_graph_rescore_joins_shuffle_light(spark, views):
    """The kNN graph's exact re-score must be hash/broadcast joins of
    the candidate frame against the corpus — never a nested loop or
    cartesian (those would reintroduce the n² the candidate stage
    exists to avoid)."""
    from pydin_spark.operators.similarity import knn_graph
    plan = knn_graph(spark.table("embeddings"), k=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temperature_mixture_is_pure_filter(spark, views):
    """Temperature resampling must compile to a scan + a broadcast
    rate join — no SHUFFLE exchange (the K-row count aggregate runs
    eagerly at build time; the per-stratum rates ride back as a
    broadcast hash join rather than a CASE chain, which would hit
    codegen limits at high stratum cardinality — ADVICE r3)."""
    from pydin_spark.operators.curation import temperature_mixture
    plan = temperature_mixture(spark.table("documents"), alpha=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_keep_top_fraction_approx_has_no_rank_window(spark, views):
    """The approx path exists precisely to avoid the per-stratum rank
    window: its plan must contain no Window operator, and the cutoff
    join must be broadcast."""
    from pydin_spark.operators.curation import keep_top_fraction
    plan = keep_top_fraction(spark.table("documents"), "n_chars", 0.5,
                             strata_col="source", approx=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_strip_markup_zero_shuffle_and_pruned_scan(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.strip_markup(spark.table("documents")))
    assert "Exchange" not in plan            # pure column scan
    assert "BatchEvalPython" not in plan     # zero Python
    assert "ArrowEvalPython" not in plan


def test_c4_line_filter_single_regroup_exchange(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.c4_line_filter(spark.table("documents")))
    # one exchange: the doc-key regroup after the line explode; every
    # rule is line-local (no corpus-wide join/broadcast)
    assert plan.count(" Exchange (") == 1, plan
    assert "Join" not in plan
    assert "partial_count" in plan           # map-side partial agg


def test_top_ngrams_take_ordered_not_global_sort(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.top_ngrams(spark.table("documents"), n=3, k=20))
    # global top-k must be TakeOrdered (per-partition k + driver merge)
    assert "TakeOrderedAndProject" in plan, plan
    # the count agg combines map-side before the shuffle
    assert "partial_count" in plan
    # the only full sort is the 20-row window rank, which sits ABOVE
    # TakeOrdered; no Exchange rangepartitioning (global sort) anywhere
    assert "Exchange rangepartitioning" not in plan


def test_deterministic_shuffle_single_exchange(spark, views):
    from pydin_spark.operators import curation
    plan = plan_of(curation.deterministic_shuffle(
        spark.table("documents"), n_shards=8))
    # one exchange on the shard key feeding the rank window; the md5
    # keys are computed in the scan stage (no second pass)
    assert plan.count(" Exchange (") == 1, plan
    assert "Window" in plan


def test_mad_outliers_sketch_tier_objecthashagg_free_merge(spark, views):
    from pydin_spark.operators import rollup
    sketch = plan_of(rollup.mad_outliers(
        spark.table("events"), approx_accuracy=10000))
    # both median aggregates have a partial (map-side) phase and the
    # group-row joins back are broadcasts — no sort-merge join of the
    # events table against itself
    assert "partial_percentile_approx" in sketch, sketch
    assert "BroadcastHashJoin" in sketch
    assert "SortMergeJoin" not in sketch


def test_char_entropy_two_partial_aggregates_no_window(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.char_entropy(spark.table("documents")))
    # both histogram aggregates combine map-side, so the shuffle is
    # bounded by docs x alphabet, never corpus characters
    assert "partial_count" in plan, plan
    assert "partial_sum" in plan
    # no window, no join, no sort: pure two-stage hash aggregation
    assert "Window" not in plan and "Join" not in plan
    # only the doc/text columns are read
    assert "ReadSchema" in plan and "n_chars" not in plan.split(
        "ReadSchema")[1].split("\n")[0]


def test_split_sentences_zero_shuffle_generate(spark, views):
    from pydin_spark.operators import text
    plan = plan_of(text.split_sentences(spark.table("documents")))
    # scan-linear: one Generate (posexplode) in the scan stage — no
    # exchange of any kind, sentences stay co-located with the parent
    assert "Generate" in plan, plan
    assert " Exchange (" not in plan


def test_edit_dup_pairs_candidate_bounded_plan(spark, views):
    from pydin_spark.operators import dedup
    plan = plan_of(dedup.edit_dup_pairs(spark.table("documents"),
                                        max_dist=4, min_shared=5))
    # the pair join is an equi-join on the shingle key (posting lists),
    # never a cartesian/nested-loop over documents
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    # levenshtein runs AFTER the length lower bound in the same filter
    # (cheap tier first); both appear as plan expressions
    assert "levenshtein" in plan
    # map-side partial phase on the shared-shingle count
    assert "partial_count" in plan


def test_curriculum_order_no_single_task_rank(spark, views):
    from pydin_spark.operators import curation
    # checkpoint=False exposes the real rank plan (the default cuts
    # lineage, hiding it behind a checkpoint scan)
    out = curation.curriculum_order(spark.table("documents"),
                                    score_col="n_chars", n_shards=7,
                                    checkpoint=False)
    plan = plan_of(out)
    # the global order arrives via RANGE partitioning + the per-
    # partition rank window — never an Exchange SinglePartition
    # (the single-task global window this operator exists to avoid)
    assert "rangepartitioning" in plan, plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan
    assert dict(out.dtypes)["shard"] == "int"
    # pos/rk are BIGINT: a single shard can exceed 2^31 rows at the
    # corpus sizes this operator targets
    assert dict(out.dtypes)["pos"] == "bigint"
    assert dict(out.dtypes)["rk"] == "bigint"
    spark.catalog.clearCache()  # plan-inspection mode leaves `part` cached


def test_pagerank_iteration_plan_is_joins_not_cartesian(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    # checkpoint=False exposes one full iteration's plan
    out = graph.pagerank(edges, iterations=1, checkpoint=False)
    plan = plan_of(out)
    # Pregel cost model: edge-keyed hash joins + map-side-combined
    # sum — never a cartesian / nested-loop over nodes
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan
    assert dict(out.dtypes)["pr_fp"] == "bigint"


def test_projection_zero_shuffle_codegen(spark, views):
    from pydin_spark.operators import similarity
    plan = plan_of(similarity.project_embeddings(
        spark.table("embeddings"), out_dim=8, in_dim=64))
    # pure per-row arithmetic: single codegen stage, no exchange, no
    # Python evaluation anywhere
    assert " Exchange (" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "codegen id" in plan


def test_pq_encode_zero_shuffle_no_python(spark, views):
    from pydin_spark.operators import similarity
    book = similarity.pq_codebook(seed=42, m=8, ksub=16, dsub=8)
    plan = plan_of(similarity.pq_encode(spark.table("embeddings"),
                                        book))
    # encode is a pure per-row scan: m*ksub*dsub arithmetic inside
    # the scan stage, no exchange, no Python evaluation
    assert " Exchange (" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_lpa_iteration_single_exchange_no_cartesian(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    out = graph.label_propagation(edges, iterations=1, checkpoint=False)
    plan = plan_of(out)
    # the label-frequency count is the only corpus shuffle; the argmax
    # window runs over the (node, label) frame; never a nested loop
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_hard_negatives_broadcast_queries_corpus_unshuffled(spark, views):
    from pydin_spark.operators import similarity
    emb = spark.table("embeddings")
    q = emb.where("vec_id < 10").selectExpr(
        "vec_id AS query_id", "embedding", "label")
    plan = plan_of(similarity.hard_negatives(emb, q, k=5))
    # the exact tier's contract: queries broadcast, the corpus side
    # reaches the scorer without an Exchange below the rank window
    assert "BroadcastExchange" in plan
    head = plan.split("Window")[0]
    assert head.count("Exchange hashpartitioning") == 0, plan


def test_snapshot_diff_fingerprint_join_prunes_text(spark, views):
    from pydin_spark.operators import curation
    docs = spark.table("documents").select("doc_id", "text")
    df = curation.snapshot_diff(docs, docs)
    plan = plan_of(df)
    # the full-outer join moves (id, 32-byte md5), never document text
    assert "FullOuter" in plan or "full_outer" in plan.lower()
    # the formatted plan lists each Exchange/Join node's carried
    # columns (Input/Output) in its detail section: none of the
    # shuffle-side sections may reference a text attribute — the md5
    # projection must happen BELOW the exchange, at the scan
    for section in plan.split("\n\n"):
        if section.lstrip().startswith("(") and (
                "Exchange" in section.splitlines()[0]
                or "SortMergeJoin" in section.splitlines()[0]):
            assert "text#" not in section, section
    assert "text" not in dict(df.dtypes)


def test_extract_urls_zero_shuffle_generate(spark, views):
    from pydin_spark.operators import text as text_ops
    plan = plan_of(text_ops.extract_urls(
        spark.table("documents"), blocklist=["x.example.com"]))
    assert " Exchange (" not in plan, plan
    assert "Generate" in plan  # the explode
    assert "BatchEvalPython" not in plan


def test_vocab_coverage_take_ordered_not_global_sort(spark, views):
    from pydin_spark.operators import text as text_ops
    plan = plan_of(text_ops.vocab_coverage(spark.table("documents"),
                                           k=50))
    # global top-k must be TakeOrdered (per-partition k, driver merge).
    # The token-count aggregate is materialized via localCheckpoint
    # (one corpus scan shared by total + top-k), so the final plan
    # reads it as an ExistingRDD — its map-side partial phase lives in
    # the checkpointed stage, not here
    assert "TakeOrderedAndProject" in plan, plan
    assert "Scan ExistingRDD" in plan


def test_triangles_degree_ordered_no_cartesian(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    plan = plan_of(graph.triangles(edges))
    # wedge pivot + closing-edge lookup are equi-joins over the DAG,
    # never a nested loop over node pairs; the per-node census has a
    # map-side partial phase
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan
    dtypes = dict(graph.triangles(edges).dtypes)
    assert dtypes["tri_cnt"] == "bigint" and dtypes["lcc"] == "double"


def test_kcore_round_is_agg_plus_semi_joins(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    # checkpoint=False exposes one peel round's plan
    plan = plan_of(graph.kcore(edges, k=2, rounds=1, checkpoint=False))
    # per round: one map-side-combined degree count + two SEMI joins
    # against the node-sized survivor set — never an outer/inner join
    # materializing edge x node, never a nested loop
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan, plan
    assert "partial_count" in plan


def test_hits_iteration_joins_not_cartesian(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    plan = plan_of(graph.hits(edges, iterations=1, checkpoint=False))
    # two map-side-combined sums per iteration + 1-row total
    # broadcasts — never a nested loop over node pairs
    assert "CartesianProduct" not in plan, plan
    assert "partial_sum" in plan
    dtypes = dict(graph.hits(edges, iterations=1,
                             checkpoint=False).dtypes)
    assert dtypes["auth_fp"] == "bigint" and dtypes["hub_fp"] == "bigint"


def test_degree_histogram_two_aggregates_no_window(spark, views):
    from pydin_spark.operators import graph
    edges = spark.table("events").selectExpr(
        "user_id as src", "cast(value as bigint) % 50 as dst").limit(200)
    plan = plan_of(graph.degree_histogram(edges))
    # distinct + degree agg + 64-row-max bucket agg: all partial/final
    # pairs, no window, no join
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "Join" not in plan, plan


def test_compression_ratio_single_arrow_stage_no_shuffle(spark, views):
    from pydin_spark.operators import text as text_ops
    plan = plan_of(text_ops.compression_ratio(spark.table("documents")))
    # one Arrow-batched python stage over the scan; never a shuffle,
    # never row-at-a-time python
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    assert " Exchange (" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_icws_lsh_candidates_bucket_equijoin(spark, views):
    from pydin_spark.operators import dedup
    plan = plan_of(dedup.icws_lsh_pairs(spark.table("documents"),
                                        num_hashes=16, bands=8,
                                        verify=False))
    # band-bucket equi-join, never a cross product; the signature agg
    # has a map-side partial phase
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min_by" in plan or "min_by" in plan, plan


def test_bucketed_fact_join_has_no_exchange(spark, views, sf_dir):
    """The StoredBuckets q3 shape: both fact scans read bucketed
    (Bucketed: true) and the l_orderkey = o_orderkey SortMergeJoin
    needs NO Exchange on either side — the staged shuffle is the only
    one this join ever pays, the property that amortizes at 100 TB."""
    import __spark_entry__ as entrymod
    li, od = entrymod._staged_fact_buckets(spark, sf_dir)
    li.attach(spark, "lineitem_sb")
    od.attach(spark, "orders_sb")
    df = spark.sql(
        entrymod.DUAL_SQL["q3_shipping_priority"].replace(
            "customer, orders, lineitem",
            "customer, orders_sb, lineitem_sb"))
    plan = plan_of(df)
    assert plan.count("Bucketed: true") == 2, plan
    assert "hashpartitioning(l_orderkey" not in plan, plan
    assert "hashpartitioning(o_orderkey" not in plan, plan
