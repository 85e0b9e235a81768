"""Physical-plan regression tests: the plan properties that matter at 100 TB
are asserted, not just eyeballed — a refactor that silently adds a shuffle,
drops a broadcast, or un-prunes a scan fails here.
"""

from pyspark.sql import functions as F

from png_from_pdf_extracter_spark.datagen import GenConfig, gen_pandas
from png_from_pdf_extracter_spark.plans import JobParams, extract_turns
from png_from_pdf_extracter_spark.sources.transcripts import TRANSCRIPTS_SCHEMA

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _transcripts(spark, tmp_path):
    # parquet-backed source: a Catalyst LocalRelation would be constant-
    # folded (filters evaluated at plan time), hiding the nodes under test
    tdf, _ = gen_pandas(GenConfig(n_convs=10))
    path = str(tmp_path / "transcripts")
    spark.createDataFrame(tdf, schema=TRANSCRIPTS_SCHEMA).write.mode(
        "overwrite"
    ).parquet(path)
    return spark.read.parquet(path)


def test_flagship_single_exchange_and_filter_before_shuffle(spark, tmp_path):
    df = extract_turns(
        spark,
        _transcripts(spark, tmp_path),
        JobParams(n_buckets=16, num_partitions=4),
    )
    plan = _plan(df)
    assert plan.count("Exchange") == 1, plan
    # whitelist evaluated below (before) the exchange: RLIKE appears after
    # the Exchange line in the tree dump (children print below parents)
    assert plan.index("Exchange") < plan.index("RLIKE")


def test_flagship_never_mode_no_shuffle(spark, tmp_path):
    df = extract_turns(
        spark,
        _transcripts(spark, tmp_path),
        JobParams(n_buckets=16, num_partitions=4, salt_mode="never"),
    )
    assert "Exchange" not in _plan(df)


def test_join_topn_broadcasts_both_dims(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["q_join_topn"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan


def test_tpch_q1_pushdown_and_pruning(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["q_tpch_q1"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: comment column never read
    assert "l_comment" not in plan
    # map-side partial aggregation present
    assert "partial_sum" in plan


def test_minhash_signature_single_exchange(spark):
    from png_from_pdf_extracter_spark.functions.dedup import minhash_signatures

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(minhash_signatures(d, "doc_id", "text"))
    assert plan.count("Exchange") == 1, plan


def test_minhash_lsh_pairs_joinless(spark):
    """Round-2 plan: signature = ONE id-keyed aggregation (8 min columns),
    candidates from bucket aggregate + direct pair emission — no join
    operator of any kind may appear."""
    from png_from_pdf_extracter_spark.functions.dedup import minhash_lsh_pairs

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = minhash_lsh_pairs(d, "doc_id", "text")
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node
    # three exchanges: signature agg, bucket agg, final distinct
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_ngram_jaccard_no_selfjoin_and_broadcast_sizes(spark):
    """Round-2 plan: no shingle self-join (pair emission from grouped id
    lists); the small per-doc sizes side must broadcast into the final
    joins, never sort-merge."""
    from png_from_pdf_extracter_spark.functions import dedup

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5)
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    dedup.release(out)


def test_contamination_benchmark_side_broadcast(spark):
    """The benchmark shingle table must broadcast — the corpus side never
    shuffles for the join."""
    from png_from_pdf_extracter_spark.functions.dedup import contamination_check

    d = spark.read.parquet(f"{SF}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    out = contamination_check(d, bench, "doc_id", "text", n=2)
    out.write.format("noop").mode("overwrite").save()
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_resume_antijoin_is_broadcast(spark, tmp_path):
    from png_from_pdf_extracter_spark.operators import (
        completed_partitions,
        pending_only,
    )
    from png_from_pdf_extracter_spark.plans.metrics import METRICS_SCHEMA
    from png_from_pdf_extracter_spark.sources.transcripts import with_partition_id

    t = with_partition_id(_transcripts(spark, tmp_path), 16)
    metrics = spark.createDataFrame([], METRICS_SCHEMA)
    pending = pending_only(t, completed_partitions(metrics, "0.1.0"))
    plan = _plan(pending)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan


def test_warehouse_partition_pruning(spark, tmp_path):
    """A bucket-filtered read of the hive-partitioned warehouse must prune
    at the partition level (scan only the matching partition_id dirs) —
    this is what makes per-bucket re-extraction and downstream
    bucket-scoped queries O(bucket), not O(table)."""
    from png_from_pdf_extracter_spark.sources.catalog import Catalog

    catalog = Catalog(str(tmp_path / "wh"))
    df = (
        spark.range(0, 1000)
        .selectExpr(
            "concat('c', id % 7) AS conv_id",
            "cast(id % 16 AS int) AS partition_id",
            "cast(id AS string) AS payload",
        )
    )
    df.write.partitionBy("partition_id").parquet(catalog.path("t"))

    got = catalog.read(spark, "t").filter(F.col("partition_id") == 3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(partition_id" in plan, plan
    # partition filter must NOT degrade to a post-scan data filter
    assert "PushedFilters: [IsNotNull(partition_id)" not in plan, plan
    assert got.count() == len([i for i in range(1000) if i % 16 == 3])


def test_duplicate_spans_window_shape(spark):
    """ExactSubstr spans: window enumeration is map-side (no join to a
    position table), the occurrence count is ONE hash aggregate, and the
    only join is the hash-group equi-join back — no nested-loop or
    cartesian anywhere."""
    from png_from_pdf_extracter_spark.functions.dedup import duplicate_spans

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(duplicate_spans(d, window=8))
    for node in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node
    assert "partial_count" in plan  # map-side combine on the hash group


def test_bm25_takeordered_no_global_window(spark):
    """BM25 top-k must plan as TakeOrderedAndProject (per-partition
    partial top-k), never a single-partition global sort/window over the
    full match set; the df and scalar sides must broadcast."""
    from png_from_pdf_extracter_spark.functions.search import bm25_topk

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(bm25_topk(d, ["vector", "stream"], top_k=10))
    assert "TakeOrderedAndProject" in plan, plan
    # a global sort would show as a rangepartitioning exchange
    assert "Exchange rangepartitioning" not in plan, plan
    # the only single-partition exchange allowed is the one-ROW (N, avgdl)
    # scalar aggregate; the match set itself must never funnel to one task
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_embed_covariance_single_pass_no_smj(spark):
    """One corpus pass (a single MapInPandas node feeding the persisted
    dim^2 aggregate) and every post-aggregate join broadcast — the
    O(dim^2)-shuffle-keys contract of embedding_covariance."""
    from png_from_pdf_extracter_spark.functions import dedup, similarity

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = similarity.embedding_covariance(e)
    plan = _plan(df)
    # the four consumers (count / means as sx1 / means as sx2 / gram) all
    # read the PERSISTED dim^2 aggregate — the corpus scan + BLAS pass
    # materializes once at runtime even though each InMemoryTableScan
    # prints its lineage
    assert plan.count("InMemoryTableScan") == 4, plan
    assert "SortMergeJoin" not in plan, plan
    dedup.release(df)


def test_kmeans_assignment_map_only(spark):
    """After centroid training, the per-row cluster assignment is a pure
    map-side projection — no Exchange in the returned plan (the folded
    centroid constant travels with the task, not through a shuffle)."""
    from png_from_pdf_extracter_spark.functions import similarity

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(
        similarity.kmeans_assign(e, n_clusters=4, iterations=1)
    )
    assert "Exchange" not in plan, plan


def test_pmi_and_chi2_takeordered_broadcast_only(spark):
    """Quantized top-k compiles to TakeOrderedAndProject (per-partition
    partial top-k, no global sort) and all dictionary joins broadcast."""
    import __spark_entry__ as em

    for q in ("q_pmi_bigrams", "q_chi2_terms"):
        plan = _plan(em.queries()[q](spark, SF))
        assert "TakeOrderedAndProject" in plan, (q, plan)
        assert "SortMergeJoin" not in plan, (q, plan)


def test_edit_distance_block_join_is_equi(spark):
    """The blocked candidate join must be an EQUI join on the prefix key
    — never a cartesian/nested-loop all-pairs plan."""
    from png_from_pdf_extracter_spark.functions import dedup

    p = spark.read.parquet(f"{SF}/part.parquet")
    plan = _plan(
        dedup.edit_distance_pairs(p, "p_partkey", "p_name")
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_event_transitions_totals_broadcast(spark):
    import __spark_entry__ as em

    plan = _plan(em.queries()["q_event_transitions"](spark, SF))
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_triangle_and_jaccard_prefix_no_allpairs(spark):
    """The hub-safe graph/set-similarity operators must plan as EQUI
    joins only — a cartesian or nested-loop node means the orientation /
    prefix filter silently stopped driving candidate generation."""
    import __spark_entry__ as em
    from png_from_pdf_extracter_spark.functions import dedup

    for k in ("q_triangles", "q_jaccard_prefix"):
        df = em.queries()[k](spark, SF)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, (k, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (k, plan)
        dedup.release(df)


def test_jaccard_prefix_shingles_cached_once(spark):
    """The shingle table feeds four consumers; the plan must read the
    persisted copy (InMemoryTableScan), not re-tokenize the corpus."""
    from png_from_pdf_extracter_spark.functions import dedup

    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup.jaccard_prefix_join(d, "doc_id", "text")
    plan = _plan(out)
    assert "InMemoryTableScan" in plan, plan
    dedup.release(out)


def test_skew_report_single_width_window(spark):
    """skew_report's rank window must run over the aggregated key table
    (input to Window is a HashAggregate), never the raw rows."""
    from png_from_pdf_extracter_spark.operators.salting import skew_report

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(skew_report(ev, "user_id", ("event_type",)))
    assert "Window" in plan, plan
    # children print below parents: a (group,key) HashAggregate must sit
    # BELOW the window node (= the window's input is the aggregated key
    # table, evaluated first)
    below_window = plan[plan.index("Window"):]
    assert "HashAggregate" in below_window, plan


def test_calibration_bins_single_aggregate(spark):
    """One combinable aggregation pass — no window, no join."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        calibration_bins,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(
        calibration_bins(
            d, F.length("text") / 10000.0, F.col("doc_id") % 2
        )
    )
    assert "Window" not in plan and "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_chunk_sliding_zero_shuffles(spark):
    """Map-side chunker: tokenize -> sequence -> explode -> slice with
    NO exchange — the chunk table inherits the corpus partitioning."""
    from png_from_pdf_extracter_spark.functions import curate

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(curate.chunk_sliding(d))
    assert "Exchange" not in plan, plan


def test_scalar_quantize_map_only(spark):
    from png_from_pdf_extracter_spark.functions.similarity import (
        scalar_quantize,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(scalar_quantize(e))
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_autocorr_window_and_agg_share_one_exchange(spark):
    """autocorr_lag1's lead() window and its Pearson-sums groupBy both
    key on the group column — one hashpartitioning Exchange total, so
    the operator costs a single shuffle at any scale."""
    from png_from_pdf_extracter_spark.functions.stats import autocorr_lag1

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        autocorr_lag1(ev, ("user_id",), ("ts", "event_id"), "value")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_mann_whitney_no_raw_row_sort(spark):
    """mann_whitney_u must rank DISTINCT quantized values, never sort
    the raw rows: the only single-partition stage is the running sum
    over the distinct-value table (bounded by value cardinality)."""
    from png_from_pdf_extracter_spark.functions.stats import mann_whitney_u

    c = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(
        mann_whitney_u(c, "c_acctbal", "c_mktsegment", "BUILDING",
                       "MACHINERY")
    )
    # one pre-aggregation before any SinglePartition exchange: the
    # distinct-value count table is what gets globally ordered
    assert plan.count("Exchange SinglePartition") <= 2, plan
    first_single = plan.index("Exchange SinglePartition")
    assert "HashAggregate" in plan[:first_single], plan


def test_ewma_single_shuffle_no_python(spark):
    """ewma is one groupBy exchange and stays JVM-side (no Python/Arrow
    eval nodes): the fold is F.aggregate over a collected array."""
    from png_from_pdf_extracter_spark.operators.temporal import ewma

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(ewma(ev, ("user_id",), ("ts", "event_id"), "value"))
    assert plan.count("Exchange") == 1, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_kmv_distinct_before_window_bounds_state(spark):
    """kmv_build must collapse to DISTINCT (group, hash) pairs BEFORE
    the rank window: the partial aggregate bounds shuffle state by
    cardinality, and the window then keeps only k rows per group. A
    raw-row window here would sort the whole corpus."""
    from png_from_pdf_extracter_spark.functions.sketch import kmv_build

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(kmv_build(ev, "user_id", ("event_type",), k=64))
    # dedup aggregate appears before the window sort in the plan text
    # (children print below parents: window first textually)
    assert "HashAggregate" in plan and "Window" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_changepoint_single_group_exchange(spark):
    """changepoint_single's prefix sums, totals, score and argmax rank
    are all windows keyed by the group — exactly one hashpartitioning
    Exchange in the whole plan."""
    from png_from_pdf_extracter_spark.functions.stats import (
        changepoint_single,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        changepoint_single(ev, ("user_id",), ("ts", "event_id"), "value")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_correlogram_single_shuffle_any_max_lag(spark):
    """All lags come from sibling lead() columns on ONE window exchange;
    the (group, lag) aggregate reuses it — one hashpartitioning total."""
    from png_from_pdf_extracter_spark.functions.stats import correlogram

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        correlogram(ev, ("user_id",), ("ts", "event_id"), "value", 8)
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_gini_window_runs_on_distinct_group_table(spark):
    """gini_concentration's ordered rank window must run AFTER the
    group collapse: the aggregate keyed on the group column sits below
    the single-partition window in the plan, so the global sort is
    bounded by GROUP cardinality, never corpus rows."""
    from png_from_pdf_extracter_spark.functions.stats import (
        gini_concentration,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(gini_concentration(d, "source", "n_chars"))
    # the corpus-collapsing aggregate keys on the group column and is
    # map-side combinable (partial_... aggregate present)
    assert "partial" in plan.lower(), plan
    i_window = plan.index("Window")
    i_agg = plan.rindex("HashAggregate")
    assert i_window < i_agg, plan  # window above (consumes) the agg


def test_cooccur_no_cartesian_and_broadcast_totals(spark):
    """cooccur_lift's pair generation must be an equi-join on the
    basket key (never a cartesian/theta join) and the scalar totals a
    broadcast."""
    from png_from_pdf_extracter_spark.functions.itemsets import (
        cooccur_lift,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    )
    plan = _plan(cooccur_lift(li, "bk", "it"))
    assert "CartesianProduct" not in plan, plan
    # the pair join is an equi-join keyed on the basket column (AQE may
    # pick broadcast-hash at small scale; the key is what matters)
    assert (
        "Join [__bk" in plan
        or "HashJoin [__bk" in plan
        or "SortMergeJoin [__bk" in plan
    ), plan


def test_bootstrap_single_corpus_shuffle(spark):
    """poisson_bootstrap_ci: the replica fan-out is map-side (Generate
    below the first Exchange), the (group, replica) aggregation is
    map-combinable, and the only other shuffle handles R-bounded rows."""
    from png_from_pdf_extracter_spark.functions.stats import (
        poisson_bootstrap_ci,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        poisson_bootstrap_ci(
            ev, "event_id", "value", group_cols=("event_type",), replicas=8
        )
    )
    assert "Generate explode" in plan, plan
    # explode sits BELOW (after in dump order) the first exchange: the
    # fan-out never crosses the wire un-aggregated
    assert plan.index("Exchange") < plan.index("Generate explode"), plan


def test_chi2_margins_from_cell_table_one_corpus_pass(spark):
    """chi2_independence reads the corpus ONCE: row/column totals are
    re-aggregations of the cell table, visible as exactly one scan of
    the parquet source feeding a shared aggregate."""
    from png_from_pdf_extracter_spark.functions.stats import (
        chi2_independence,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(chi2_independence(d, "lang", "source"))
    # margins joined back broadcast (cells are |A|x|B|-bounded)
    assert plan.count("BroadcastExchange") >= 2, plan


def test_quantile_normalize_anchor_join_is_broadcast(spark):
    """quantile_normalize joins every corpus row to the B+1-row anchor
    table: that join must be a broadcast, never a shuffle of the
    corpus on the anchor index."""
    from png_from_pdf_extracter_spark.functions.drift import (
        quantile_normalize,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(
        quantile_normalize(d, "source", "doc_id", "n_chars", anchors=32)
    )
    assert "BroadcastHashJoin" in plan, plan


def test_negative_sample_antijoin_and_rank_share_anchor_key(spark):
    """negative_sample: candidate explode is map-side; the positive
    exclusion is an anti-join; no cartesian anywhere."""
    from png_from_pdf_extracter_spark.functions.curate import (
        negative_sample,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = d.select(
        F.col("doc_id").alias("anchor_id"),
        ((F.col("doc_id") + 1) % 50).alias("pos_id"),
    )
    plan = _plan(negative_sample(pairs, n_items=50, k=4))
    assert "Generate explode" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_theil_sen_pairs_join_on_group_key_only(spark):
    """theil_sen_slope's pair join must be an equi-join on the group
    key (per-group O(k^2)), never a cartesian."""
    from png_from_pdf_extracter_spark.functions.stats import (
        theil_sen_slope,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.col("event_id").alias("x"), "value"
    )
    plan = _plan(theil_sen_slope(ev, ("user_id",), "x", "value"))
    assert "CartesianProduct" not in plan, plan
    assert (
        "Join [user_id" in plan
        or "HashJoin [user_id" in plan
        or "SortMergeJoin [user_id" in plan
    ), plan


def test_tfidf_cosine_pairs_join_on_term_key(spark):
    """tfidf_cosine_pairs: the pair generation must be an equi-join on
    the TERM posting key — never a cartesian; norms/dots are
    map-combinable aggregates."""
    from png_from_pdf_extracter_spark.functions.dedup import (
        tfidf_cosine_pairs,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(tfidf_cosine_pairs(d))
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan.lower(), plan


def test_apply_dedup_best_antijoin_and_no_corpus_shuffle_for_scores(spark):
    """apply_dedup_best: the corpus exits through a LEFT ANTI join
    against the loser set; scores join the dup-member table, not the
    other way around."""
    from png_from_pdf_extracter_spark.functions.dedup import (
        apply_dedup_best,
        release,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id1 long, id2 long")
    out = apply_dedup_best(d, pairs, "n_chars")
    plan = _plan(out)
    release(out)
    assert "LeftAnti" in plan, plan


def test_kruskal_wallis_no_raw_row_join_back(spark):
    """kruskal_wallis: every join/window input is an AGGREGATED table
    (distinct-value or per-class) — the raw rows are consumed by exactly
    one combinable count; no sort of the input anywhere."""
    from png_from_pdf_extracter_spark.functions.stats import kruskal_wallis

    o = spark.read.parquet(f"{SF}/orders.parquet")
    plan = _plan(kruskal_wallis(o, "o_totalprice", "o_orderpriority"))
    # partial aggregation before the first shuffle = map-side combine
    # of the (value, class) count
    assert "partial_count" in plan or "partial count" in plan.lower(), plan
    # no cartesian anywhere; the final assembly is a 1x1 cross of two
    # single-row frames (BroadcastNestedLoop on single rows is fine)
    assert "CartesianProduct" not in plan


def test_bh_fdr_two_windows_no_join(spark):
    """bh_fdr: the whole operator is windows over ONE group exchange —
    no join back, no extra shuffle beyond the group partition."""
    from png_from_pdf_extracter_spark.functions.stats import bh_fdr

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", (F.col("value") / 500).alias("p")
    )
    plan = _plan(bh_fdr(ev, "p", group_cols=("event_type",)))
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    # exactly one exchange: hashpartitioning on the group key feeds
    # every window
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_winsorize_thresholds_join_on_group_key_only(spark):
    """winsorize: the clamp thresholds come back to the rows via a
    GROUP-keyed equi-join (tiny per-group threshold tables), never a
    re-sort of the raw rows."""
    from png_from_pdf_extracter_spark.functions.stats import winsorize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(winsorize(ev, "value", ("event_type",)))
    assert "CartesianProduct" not in plan
    # threshold tables are aggregates of the distinct-value table:
    # map-side combine present for the (group, value) count
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_keyness_g2_broadcasts_totals_only(spark):
    """keyness_g2: the single-row totals frame is broadcast; the term
    table never broadcasts and never cartesian-joins anything bigger
    than that one row."""
    from png_from_pdf_extracter_spark.functions.lm import keyness_g2

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(keyness_g2(d, "lang", "en", min_count=1, top_k=10))
    assert "CartesianProduct" not in plan
    # top-k is a TakeOrdered, not a global sort + limit
    assert "TakeOrderedAndProject" in plan, plan


def test_jl_project_is_shuffle_free(spark):
    """jl_project must stay MAP-ONLY: no Exchange, no UDF — the whole
    projection is codegen'd array folds plus a posexplode."""
    from png_from_pdf_extracter_spark.functions.similarity import jl_project

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(jl_project(e, out_dim=4))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_link_prediction_no_cartesian_and_cap_below_wedge_join(spark):
    """link_prediction_scores: the wedge join must be an equi-join on
    the pivot key, never a cartesian, and the hub-degree cap filter
    must sit BELOW the wedge join (pivots dropped before fan-out)."""
    from png_from_pdf_extracter_spark.functions.graph import (
        link_prediction_scores,
    )

    o = spark.read.parquet(f"{SF}/orders.parquet")
    edges = o.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") % 300).alias("dst"),
    )
    plan = _plan(link_prediction_scores(edges, max_hub_degree=100))
    assert "CartesianProduct" not in plan, plan
    # the cap predicate appears in the tree below (after) the last join
    assert plan.rindex("Join") < plan.rindex("100"), plan


def test_hodges_lehmann_pairs_on_count_table_not_rows(spark):
    """hodges_lehmann: the Walsh self-join must consume the aggregated
    (group, value) COUNT table — a HashAggregate must sit below each
    join input — and join on the group key, never a cartesian."""
    from png_from_pdf_extracter_spark.functions.stats import hodges_lehmann

    c = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(hodges_lehmann(c, "c_acctbal", ("c_nationkey",)))
    assert "CartesianProduct" not in plan, plan
    # count aggregation happens before pairing: the plan's last Join has
    # HashAggregate descendants (children print below parents)
    assert plan.rindex("Join") < plan.rindex("HashAggregate"), plan


def test_kendall_tau_pairs_join_on_group_key_only(spark):
    """kendall_tau_b shares theil_sen's bounded-group contract: pair
    enumeration is an equi-join on the GROUP key."""
    from png_from_pdf_extracter_spark.functions.stats import kendall_tau_b

    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.length("c_name").cast("double").alias("nl"),
    )
    plan = _plan(
        kendall_tau_b(c, ("c_nationkey",), "c_acctbal", "nl", "c_custkey")
    )
    assert "CartesianProduct" not in plan, plan
    assert (
        "Join [c_nationkey" in plan
        or "HashJoin [c_nationkey" in plan
        or "SortMergeJoin [c_nationkey" in plan
        or "Join c_nationkey" in plan
    ), plan


def test_conformal_window_over_value_table(spark):
    """conformal_threshold: the rank-reach window runs over the
    aggregated distinct-value table (HashAggregate below the Window),
    never over raw rows."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        conformal_threshold,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(conformal_threshold(ev, "value", ("event_type",)))
    # children print below parents: the (group, value) count aggregate
    # must appear BELOW (after) the windows in the tree dump
    assert plan.rindex("Window") < plan.rindex("HashAggregate"), plan


def test_heavy_hitters_exact_count_joins_broadcast_candidates(spark):
    """heavy_hitters: the verify phase counts ONLY rows matching the
    broadcast candidate list — a BroadcastHashJoin must sit in the
    plan, and the MG candidate stage is a zero-shuffle mapInPandas
    (no Exchange between scan and the python fan-in)."""
    from png_from_pdf_extracter_spark.functions.sketch import heavy_hitters

    d = spark.read.parquet(f"{SF}/documents.parquet")
    occ = d.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("word")
    )
    plan = _plan(heavy_hitters(occ, "word", threshold_frac=0.01))
    assert "BroadcastHashJoin" in plan, plan
    # MG summary runs map-side: the python eval feeds the join build
    # side without an exchange above the scan on its branch
    assert "MapInPandas" in plan, plan


def test_naive_bayes_models_broadcast_to_predict(spark):
    """naive_bayes_predict: both the word model and the label model
    reach the scoring join as broadcasts — the corpus side never
    shuffles for the model."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        naive_bayes_predict,
        naive_bayes_train,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        "lang",
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"),
            lambda x: F.length(x) > 0,
        ).alias("toks"),
    )
    wm, lm = naive_bayes_train(d, "toks", "lang")
    plan = _plan(naive_bayes_predict(d, "doc_id", "toks", wm, lm))
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # k-row label fan


def test_label_propagation_pregel_no_cartesian(spark):
    """label_propagation: every round is equi-join + aggregate on the
    node key — no cartesian product anywhere in 3 unrolled rounds."""
    from png_from_pdf_extracter_spark.functions.graph import (
        label_propagation,
    )

    o = spark.read.parquet(f"{SF}/orders.parquet")
    edges = o.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") % 1500).alias("dst"),
    ).filter(F.col("src") != F.col("dst")).distinct()
    c = spark.read.parquet(f"{SF}/customer.parquet")
    seeds = c.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("node"),
        F.col("c_mktsegment").alias("label"),
    )
    plan = _plan(label_propagation(edges, seeds, rounds=3))
    assert "CartesianProduct" not in plan, plan


def test_prf_rerank_second_pass_terms_broadcast(spark):
    """prf_rerank: the expanded term set reaches the second BM25 pass
    as a broadcast build side (never a shuffled join against the
    exploded corpus), and no driver collect exists — the whole loop is
    one plan."""
    from png_from_pdf_extracter_spark.functions.search import prf_rerank

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(
        prf_rerank(d, ["vector", "stream"], fb_docs=5, n_expansion=3,
                   max_df_frac=1.0, top_k=5)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hill_tail_windows_over_distinct_count_table(spark):
    """hill_tail_index: every window runs over the aggregated
    distinct-value table (HashAggregate below the windows), never raw
    rows."""
    from png_from_pdf_extracter_spark.functions.stats import (
        hill_tail_index,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(hill_tail_index(ev, "value", k=50, quantize=2))
    assert plan.rindex("Window") < plan.rindex("HashAggregate"), plan


def test_cuped_single_one_row_aggregate(spark):
    """cuped_adjust: ONE conditional aggregate regardless of input
    size — exactly one exchange pair (partial/final over a 1-row
    group) beyond the broadcast min, no joins on the data path except
    the two scalar broadcasts."""
    from png_from_pdf_extracter_spark.functions.stats import cuped_adjust

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("value").alias("pre"),
        (F.col("value") * 2).alias("post"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
    )
    plan = _plan(cuped_adjust(ev, "pre", "post", "arm"))
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_yuen_windows_over_count_table_single_shuffle(spark):
    """yuen_trimmed_t: the per-arm windows run over the (arm, value)
    count table (HashAggregate below the windows), never raw rows;
    the winsorization join-back builds broadcast from the 2-row arm
    table."""
    from png_from_pdf_extracter_spark.functions.stats import (
        yuen_trimmed_t,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "value", (F.col("user_id") % 2).cast("int").alias("arm")
    )
    plan = _plan(yuen_trimmed_t(ev, "value", "arm"))
    assert plan.rindex("Window") < plan.rindex("HashAggregate"), plan
    assert "BroadcastHashJoin" in plan, plan


def test_token_wer_vocab_broadcast_no_cartesian(spark):
    """token_edit_distance_pairs: the token->char vocabulary reaches
    the encode join as a broadcast; no cartesian anywhere."""
    from png_from_pdf_extracter_spark.functions.dedup import (
        token_edit_distance_pairs,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda x: F.length(x) > 0,
        ).alias("toks"),
    )
    pairs = d.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 1).alias("id_b"),
    )
    plan = _plan(token_edit_distance_pairs(d, pairs, "doc_id", "toks"))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_holm_two_range_windows_no_join(spark):
    """holm_bonferroni: pure window plan — no join back to the input,
    no sort beyond the in-group p order."""
    from png_from_pdf_extracter_spark.functions.stats import (
        holm_bonferroni,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", (F.col("value") / 1000).alias("p")
    )
    plan = _plan(holm_bonferroni(ev, "p", group_cols=("event_type",)))
    assert "Join" not in plan, plan


def test_slope_break_no_join_no_explode(spark):
    """slope_break: candidates live on the group's own rows — no join,
    no explode, windows over the group exchange only."""
    from png_from_pdf_extracter_spark.functions.stats import slope_break

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        slope_break(ev, ("event_type",), ("ts", "event_id"), "value")
    )
    assert "Generate" not in plan, plan  # no explode
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_partition_agreement_margins_broadcast(spark):
    """partition_agreement: the margin/index pair-count aggregates and
    totals all reach the final row as broadcasts of 1-row frames."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        partition_agreement,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(partition_agreement(d, "lang", "source"))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_average_precision_single_group_exchange(spark):
    """average_precision: one exchange on the group key; both windows
    share it (no second shuffle for the rank-order accumulation)."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        average_precision,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "doc_id", (F.col("n_chars") > 500).cast("int").alias("y"),
        F.col("n_chars").alias("score"),
    )
    plan = _plan(
        average_precision(d, "score", "y", "doc_id", ("source",))
    )
    import re

    exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert exchanges <= 2, plan


def test_rake_top_k_is_take_ordered_not_global_window(spark):
    """rake_keyphrases: the top-k cut plans as TakeOrderedAndProject
    (partial per-partition top-k), never a single-partition window
    over every distinct phrase."""
    from png_from_pdf_extracter_spark.functions.keywords import (
        rake_keyphrases,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(rake_keyphrases(d, top_k=15))
    assert "TakeOrderedAndProject" in plan, plan


def test_concordance_single_exchange_one_aggregate(spark):
    """concordance_agreement: ONE combinable moment aggregate per
    group — exactly one Exchange (the group-key partial/final
    aggregate pair), no window, no join."""
    from png_from_pdf_extracter_spark.functions.stats import (
        concordance_agreement,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source",
        F.col("n_chars").cast("double").alias("x"),
        (F.col("n_chars") * 2).cast("double").alias("y"),
    )
    plan = _plan(concordance_agreement(d, "x", "y", ("source",)))
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" not in plan and "Window" not in plan, plan


def test_reliability_broadcast_combine_no_smj(spark):
    """interrater_reliability: the subject/item/grand stats combine
    through single-row broadcasts — no sort-merge join anywhere."""
    from png_from_pdf_extracter_spark.functions.stats import (
        interrater_reliability,
    )

    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        interrater_reliability(e, "user_id", "event_type", "value")
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_ljung_box_single_window_pass(spark):
    """ljung_box: all five lag columns come off ONE ordered window
    (one Window node over the raw rows), then one aggregate; the
    second Window runs over the 5-row lag table."""
    from png_from_pdf_extracter_spark.functions.stats import ljung_box

    e = spark.read.parquet(f"{SF}/events.parquet")
    plan = _plan(
        ljung_box(e, ("event_type",), ("ts", "event_id"), "value")
    )
    # one window over raw rows + one over the exploded lag table
    assert plan.count("Window") <= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_ql_topk_term_set_broadcast_and_take_ordered(spark):
    """ql_topk: the query-term set joins the exploded corpus as a
    BROADCAST (never shuffling the token stream against 3 terms) and
    the top-k cut is TakeOrderedAndProject."""
    from png_from_pdf_extracter_spark.functions.search import ql_topk

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(ql_topk(d, ["vector", "stream", "merge"], top_k=10))
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_graph_profile_reuses_triangle_cache(spark):
    """graph_profile: the triangle pipeline's persisted oriented edge
    list is propagated for dedup.release — the profile must expose the
    cached-deps contract attribute."""
    from png_from_pdf_extracter_spark.functions.graph import graph_profile

    o = spark.read.parquet(f"{SF}/orders.parquet")
    edges = o.select(
        F.col("o_custkey").alias("src"),
        (F.col("o_orderkey") % 97).alias("dst"),
    )
    prof = graph_profile(edges)
    cached = getattr(prof, "_spark_graft_cached", None)
    assert cached, "triangle cache not propagated"
    for c in cached:
        c.unpersist()


def test_linear_cka_dim2_shuffle_not_rows(spark):
    """linear_cka: the shuffle after the partial-gram mapInPandas is
    keyed by (d1, d2) — hashpartitioning on the dim pair, never on a
    row id — so the exchanged volume is O(dim^2), not O(n)."""
    from png_from_pdf_extracter_spark.functions.similarity import linear_cka

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    qz = lambda c: F.round(c.cast("double") * 1000, 0).cast("long")  # noqa: E731
    d = e.select(
        F.transform(F.col("embedding"), lambda v: qz(v)).alias("xq"),
        F.transform(F.col("embedding"), lambda v: qz(v)).alias("yq"),
    )
    out = linear_cka(d, "xq", "yq")
    plan = _plan(out)
    assert "hashpartitioning(d1" in plan, plan
    for c in getattr(out, "_spark_graft_cached", []):
        c.unpersist()


def test_brunner_munzel_single_value_count_shuffle(spark):
    """brunner_munzel: mann_whitney's plan shape — one value-count
    aggregate, one distinct-value window, no join back to raw rows."""
    from png_from_pdf_extracter_spark.functions.stats import (
        brunner_munzel,
    )

    c = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(
        brunner_munzel(
            c, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
        )
    )
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_effect_sizes_one_pass_no_join(spark):
    """effect_sizes: one combinable conditional aggregate — no join,
    no window, a single aggregate pair in the plan."""
    from png_from_pdf_extracter_spark.functions.stats import effect_sizes

    c = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(
        effect_sizes(
            c, "c_acctbal", "c_mktsegment", "BUILDING", "MACHINERY"
        )
    )
    assert "Join" not in plan and "Window" not in plan, plan


def test_partial_corr_single_aggregate(spark):
    """partial_corr: all nine moments in ONE aggregate — exactly one
    Exchange (the global partial/final pair), no second pass."""
    from png_from_pdf_extracter_spark.functions.stats import partial_corr

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = _plan(
        partial_corr(
            li, "l_extendedprice", "l_quantity", "l_discount"
        )
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_juilland_take_ordered_top_k(spark):
    """juilland_dispersion: the top-k cut is TakeOrderedAndProject,
    never a global single-partition sort of the vocabulary."""
    from png_from_pdf_extracter_spark.functions.keywords import (
        juilland_dispersion,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(juilland_dispersion(d, "source", "text", top_k=20))
    assert "TakeOrderedAndProject" in plan, plan


def test_ordinal_assoc_cell_self_join_broadcast(spark):
    """ordinal_association: the concordance join is over the k x k
    CELL table (broadcast nested-loop on counts), never a row-level
    self-join — no SortMergeJoin of the raw input anywhere."""
    from png_from_pdf_extracter_spark.functions.stats import (
        ordinal_association,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        (F.col("n_chars") % 4 + 1).alias("x"),
        (F.col("doc_id") % 4 + 1).alias("y"),
    )
    plan = _plan(ordinal_association(d, "x", "y"))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_wilcoxon_single_count_shuffle_no_join(spark):
    """wilcoxon_signed_rank: one |diff|-count aggregate + one
    distinct-value window — no join at all."""
    from png_from_pdf_extracter_spark.functions.stats import (
        wilcoxon_signed_rank,
    )

    c = spark.read.parquet(f"{SF}/customer.parquet")
    plan = _plan(
        wilcoxon_signed_rank(
            c, "c_acctbal", m0_q=450000, group_cols=("c_mktsegment",)
        )
    )
    assert "Join" not in plan, plan


def test_lift_table_single_global_window(spark):
    """lift_table: ntile needs ONE global-sort window (the documented
    trade-off) and nothing else joins — exactly the windows expected,
    no SortMergeJoin."""
    from png_from_pdf_extracter_spark.functions.evalmetrics import (
        lift_table,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        (F.col("doc_id") % 2).alias("y"),
        (F.col("n_chars")).cast("double").alias("score"),
    )
    plan = _plan(lift_table(d, "score", "y", "doc_id", 10))
    assert "SortMergeJoin" not in plan, plan
    assert "ntile" in plan or "Window" in plan, plan
