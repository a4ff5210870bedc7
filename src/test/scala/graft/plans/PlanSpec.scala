package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression guard: pins the properties that make the
  * headline queries scale — filter pushdown into the parquet scan,
  * column pruning, broadcast on the dimension side, bloom pruning
  * before the join — so a refactor that silently loses one fails CI,
  * not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  // explainString(formatted) renders the full initial plan even under
  // AQE (the unexecuted AdaptiveSparkPlanExec is a leaf — tree traversal
  // would stop at it)
  private def fmtOf(name: String): String =
    SparkEntry.queries(name)(spark, SfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q02: predicates and column pruning reach the parquet scan") {
    val s = fmtOf("q02_filter_project")
    assert(s.contains("PushedFilters:"), s)
    // all three pushable predicates present in some pushed form
    assert(s.contains("GreaterThanOrEqual(l_shipdate") &&
      s.contains("LessThan(l_quantity") && s.contains("GreaterThan(l_discount"),
      "date/qty predicates not pushed:\n" + s)
    val scanLine = s.linesIterator.find(_.contains("ReadSchema")).get
    // 4 projected + 3 filter columns and nothing else (16-col table)
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_tax"),
      "scan reads columns the query never touches: " + scanLine)
  }

  test("q05: all dimension joins are broadcast, no cartesian") {
    val s = fmtOf("q05_revenue_by_nation")
    assert(!s.contains("CartesianProduct"))
    // customer/nation/region sides must be broadcast (explicit hints)
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3,
      "expected >=3 broadcast joins:\n" + s)
  }

  test("q50: bloom might_contain filters the big side before the join") {
    val s = fmtOf("q50_bloom_semi_revenue")
    val filterIdx = s.indexOf("might_contain")
    val joinIdx   = s.indexOf("LeftSemi")
    assert(filterIdx >= 0, "bloom filter missing from plan:\n" + s)
    assert(joinIdx >= 0, "semi join missing from plan:\n" + s)
  }

  test("q24: brute-force knn has no shuffle before the top-k") {
    // cosine + TakeOrdered: per-partition local top-k, single exchange
    val s = fmtOf("q24_knn_bruteforce")
    assert(s.contains("TakeOrderedAndProject"),
      "top-k not planned as TakeOrderedAndProject:\n" + s)
  }

  test("q01: aggregation is partial (map-side combine) before the exchange") {
    val s = fmtOf("q01_pricing_summary")
    val nAggs = "HashAggregate".r.findAllIn(s).size
    assert(nAggs >= 2, s"expected partial+final HashAggregate:\n$s")
  }

  test("q47: KMV is one partial-aggregate pass — no distinct, no windows") {
    val s = fmtOf("q47_kmv_distinct_parts")
    assert(s.contains("kmv_distinct"), "native aggregate not in plan:\n" + s)
    // partial + final of the typed aggregate (map-side k-heap)
    assert("ObjectHashAggregate".r.findAllIn(s).size >= 2,
      "expected partial+final ObjectHashAggregate:\n" + s)
    assert(!s.contains("Window"), "windows crept back into KMV:\n" + s)
  }

  test("q45: dimension joins stay broadcast under rollup") {
    val s = fmtOf("q45_revenue_rollup")
    assert(s.contains("Expand"), "rollup not planned via Expand:\n" + s)
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 3,
      "broadcast hints lost under rollup:\n" + s)
    assert(!s.contains("SortMergeJoin"),
      "dimension join degraded to SMJ under rollup:\n" + s)
  }

  test("q48: session groupBy reuses the window's exchange (one shuffle)") {
    val s = fmtOf("q48_sessions")
    // the per-user window and the per-(user, session) aggregate share the
    // user_id hash partitioning: the second must reuse, not re-shuffle
    assert(s.contains("ReusedExchange") ||
      "Exchange hashpartitioning".r.findAllIn(s).size <= 1,
      "session aggregate re-shuffles after the window:\n" + s)
  }

  test("q57: tf-idf scan reads only the two columns it needs") {
    val s = fmtOf("q57_tfidf_embed_profile")
    val scanLines = s.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scanLines.nonEmpty)
    scanLines.foreach { l =>
      assert(!l.contains("lang") && !l.contains("source") && !l.contains("n_chars"),
        "tf-idf scan reads unused columns: " + l)
    }
  }

  test("q70: disjunctive join broadcasts part; quantity bounds pushed") {
    val s = fmtOf("q70_disjunctive_revenue")
    assert(s.contains("BroadcastHashJoin"),
      "part side not broadcast:\n" + s)
    assert(!s.contains("CartesianProduct"))
    // the OR-of-ANDs must not defeat scan-level pruning: BOTH scans
    // carry a pushed Or(...) over their own columns (quantity ranges on
    // lineitem, brand/size on part)
    val pushed = s.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.count(_.contains("Or(")) >= 2,
      "disjunction not pushed to both scans:\n" + pushed.mkString("\n"))
  }

  test("q69: max-sim is partial-aggregated and top-k'd without global sort") {
    val s = fmtOf("q69_maxsim_groups")
    assert(s.contains("TakeOrderedAndProject"),
      "top-k not TakeOrderedAndProject:\n" + s)
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "max-sim aggregate not partial (map-side combine):\n" + s)
  }

  test("q84: exists/not-exists plan as one semi + one anti join, no nested loop") {
    val s = fmtOf("q84_sole_blame_suppliers")
    assert(s.contains("LeftSemi"), "EXISTS not planned as semi join:\n" + s)
    assert(s.contains("LeftAnti"), "NOT EXISTS not planned as anti join:\n" + s)
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "correlation fell back to a nested loop:\n" + s)
  }

  test("q85: rank profile runs NO window over the base table") {
    val s = fmtOf("q85_quantity_rank_profile")
    // the scale-killer shape is percent_rank/cume_dist over a 3-value
    // partition key (one task sorts a flag's entire row set); the fixed
    // plan aggregates first and does integer rank algebra on the grid
    assert(!s.contains("percent_rank") && !s.contains("cume_dist"),
      "rank functions crept back over the base table:\n" + s)
    assert(s.contains("sum(__cnt"),
      "window does not run over the aggregated grid:\n" + s)
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "grid aggregate not partial (map-side combine):\n" + s)
  }

  test("q20: pair generation is bounded-collect groupBy, not a self-join") {
    val s = fmtOf("q20_minhash_near_dup_pairs")
    assert(s.contains("bounded_collect_set"),
      "hot-key-capped collect missing:\n" + s)
    // one scan lineage: signatures are computed once, not on both join sides
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      "pair generation regressed to a join:\n" + s)
  }

  test("q91/q93: batch serving fuses with k-bounded aggs, no per-query window") {
    // a hot query matching 100M docs must never become a single-task
    // window sort; both batch paths rank per query with the k-bounded
    // aggregate and broadcast their tiny probe/query relations
    Seq("q91_batch_hybrid", "q93_ivf_batch_knn").foreach { q =>
      val s = fmtOf(q)
      assert(!s.contains("Window"), s"$q plans a window:\n" + s)
      assert(s.contains("topk_by_score"), s"$q lost the bounded agg:\n" + s)
      assert(s.contains("BroadcastHashJoin"),
        s"$q probe relation not broadcast:\n" + s)
    }
  }

  test("q94: rerank joins the candidate side broadcast (corpus streams)") {
    val s = fmtOf("q94_rerank_chain")
    // the 50-candidate relation must be the build side; the documents
    // scan streams through — never a shuffle join keyed on the corpus
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q95: packing runs on ONE data shuffle; groupBy reuses the window partitioning") {
    val s = fmtOf("q95_sequence_packing")
    // tree nodes: spread repartition + the (lang, shard) hash for the
    // window + the final presentation sort — and NOTHING between the
    // window and its aggregate (same keys ⇒ exchange-free groupBy)
    val exchanges = s.linesIterator
      .count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 3, s"extra exchange crept in ($exchanges):\n" + s)
    assert(s.contains("Window"), s)
  }

  test("q92: delete-then-search probe stays partition-pruned") {
    val s = fmtOf("q92_index_doc_delete")
    // the post-delete index serves exactly like a fresh one: the scan
    // carries the term_bucket partition filter, not a corpus scan
    assert(s.contains("term_bucket"), "bucket pruning lost:\n" + s)
    assert(!s.contains("Window"), "window crept into bm25:\n" + s)
  }

  test("q96: dup decision is partial-agg min/max — no distinct-count, no pairs") {
    val s = fmtOf("q96_substring_dup_spans")
    // the 100 TB property: "window occurs in >1 doc" must be decided by
    // two longs per hash map-side (partial_min/partial_max), never a
    // count(DISTINCT doc) shuffle of raw rows or a pair self-join
    assert(s.contains("partial_min") && s.contains("partial_max"),
      "min/max dup decision lost partial aggregation:\n" + s)
    assert(!s.contains("distinct"), "distinct crept into dup decision:\n" + s)
    // the only window is the per-doc islands merge (bounded by doc len)
    val winArgs = s.linesIterator.filter(_.contains("partitionBy")).toSeq
    assert(winArgs.isEmpty || !s.contains("No Partition Defined"), s)
  }

  test("q97: facets plan as ONE Expand pass over one probe, not unioned groupBys") {
    val s = fmtOf("q97_faceted_search")
    assert(s.contains("Expand"), "grouping sets not planned via Expand:\n" + s)
    assert(!s.contains("Union"), "facets degraded to unioned groupBys:\n" + s)
    // the hits side comes off the pruned index probe
    assert(s.contains("term_bucket"), "bucket pruning lost:\n" + s)
  }

  test("q107: foreground read is broadcast off a pruned probe — no corpus SMJ") {
    val s = fmtOf("q107_significant_terms")
    assert(s.contains("term_bucket"), "postings probe not pruned:\n" + s)
    assert(s.contains("BroadcastHashJoin"), "fg join not broadcast:\n" + s)
    assert(!s.contains("SortMergeJoin"),
      "a metadata-scale side degraded to a sort-merge join:\n" + s)
  }

  test("q109/q110: keyset page is TakeOrdered off a pruned probe; suggest reads only the dictionary") {
    val s9 = fmtOf("q109_search_after")
    assert(s9.contains("TakeOrderedAndProject"), "page lost top-k plan:\n" + s9)
    assert(s9.contains("term_bucket"), "bucket pruning lost:\n" + s9)
    assert(!s9.contains("Window"), "window crept into pagination:\n" + s9)
    val s10 = fmtOf("q110_suggest")
    assert(s10.contains("docfreq"), s10)
    assert(!s10.contains("postings") && !s10.contains("vectors"),
      "suggest touched a corpus-scale table:\n" + s10)
  }

  test("q112: PMI pairs are per-doc combinations + broadcast marginals") {
    val s = fmtOf("q112_pmi_pairs")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      "pair generation degraded to a corpus join:\n" + s)
    assert("BroadcastHashJoin".r.findAllIn(s).size >= 2,
      "marginals not broadcast:\n" + s)
  }

  test("q118: bool query is ONE pruned probe — clause flags, never an anti-join") {
    val s = fmtOf("q118_bool_search")
    assert(!s.contains("LeftAnti"), "must_not degraded to an anti-join:\n" + s)
    val pf = s.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("term_bucket"), "postings probe not partition-pruned:\n" + s)
    // all four clauses share ONE postings scan (flags from one aggregate)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("postings")) === 1,
      "bool clauses read postings more than once:\n" + s)
  }

  test("q122: shard positions rank within shard partitions, never globally") {
    val s = fmtOf("q122_shuffle_shards")
    assert(s.contains("windowspecdefinition(shard"),
      "position window not partitioned by shard:\n" + s)
  }

  test("q123: ivf-pq rerank stays cell-pruned with point-lookup pushdown") {
    val s = fmtOf("q123_ivfpq_knn")
    val pf = s.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("ivf_cell"), "cell pruning lost:\n" + s)
    assert(s.contains("In(doc_id"), "candidate point-lookup not pushed:\n" + s)
    assert(s.contains("TakeOrderedAndProject"), "top-k not TakeOrdered:\n" + s)
  }

  test("q124: standing queries broadcast; the corpus streams through once") {
    val s = fmtOf("q124_percolate")
    assert(s.contains("BroadcastHashJoin"),
      "query relation not broadcast:\n" + s)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents")) === 1,
      "corpus scanned more than once:\n" + s)
  }

  test("q126: pair generation is in-group combinations over ONE cached basket relation") {
    val s = fmtOf("q126_item_lift")
    assert(s.contains("pairs_asc"),
      "pair generation not the native in-group expression:\n" + s)
    assert(!s.contains("CartesianProduct"))
    // the (basket, item) relation is materialized once (checkpointed)
    // and re-read as a shared RDD scan by all three consumers — the
    // events source must never appear per-consumer
    assert(s.contains("Scan ExistingRDD"),
      "basket relation not materialized once:\n" + s)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("events")) <= 1,
      "events scanned per consumer:\n" + s)
  }

  test("q119/q121: proximity probes pruned position buckets; stats never reads postings") {
    val s119 = fmtOf("q119_indexed_proximity")
    val pf = s119.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("term_bucket"),
      "positions probe not partition-pruned:\n" + s119)
    val s121 = fmtOf("q121_index_stats")
    assert(!s121.contains("/postings") && !s121.contains("/positions") &&
      !s121.contains("/vectors"),
      "index stats touched corpus-scale tables:\n" + s121)
  }

  test("q120: function_score fetch join touches candidates, not a second corpus agg") {
    val s = fmtOf("q120_function_score")
    // one documents scan (the n_chars fetch); the text side reads the
    // pruned index, never re-tokenizes the corpus
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents")) === 1,
      "documents scanned more than once:\n" + s)
    val pf = s.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("term_bucket"), "postings probe not pruned:\n" + s)
  }

  test("q125: retention reads events once through the materialized user-week relation") {
    val s = fmtOf("q125_retention_cohorts")
    assert(s.contains("Scan ExistingRDD"),
      "user-week relation not materialized once:\n" + s)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("events")) <= 1,
      "events scanned per consumer:\n" + s)
  }

  test("q128/q129: wildcard and phrase-prefix probes stay partition-pruned") {
    val s1 = fmtOf("q128_wildcard_bm25")
    val pf1 = s1.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString
    assert(pf1.contains("term_bucket"), "wildcard probe not pruned:\n" + s1)
    assert(!s1.contains("Window"), "window crept into wildcard bm25:\n" + s1)
    val s2 = fmtOf("q129_phrase_prefix")
    val pf2 = s2.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString
    assert(pf2.contains("term_bucket"),
      "phrase-prefix positions probe not pruned:\n" + s2)
    // expansion set joins in as a broadcast, never a dictionary SMJ
    assert(s2.contains("BroadcastHashJoin"), s2)
  }

  test("q130: the bigram LM is aggregate state — partial aggs, no window, no cartesian blow-up") {
    val s = fmtOf("q130_bigram_perplexity")
    assert(!s.contains("Window"), "window crept into LM scoring:\n" + s)
    assert(!s.contains("CartesianProduct"),
      "corpus-side cartesian product:\n" + s)
    // bigram/unigram counts partial-aggregate map-side
    assert("HashAggregate".r.findAllIn(s).size >= 4,
      "count relations lost partial aggregation:\n" + s)
  }

  test("q131/q134: semdedup assignment is a broadcast against the centroid relation") {
    for (q <- Seq("q131_semdedup", "q134_semdedup_incremental")) {
      val s = fmtOf(q)
      // 8-row centroid relation: broadcast nested-loop, never a shuffle
      // of the corpus against it
      assert(s.contains("BroadcastNestedLoopJoin"),
        s"$q centroid crossJoin not broadcast:\n" + s)
      assert(!s.contains("CartesianProduct"),
        s"$q corpus-side cartesian:\n" + s)
      // pair generation is in-group combinations (explode of grouped
      // cells) — the embeddings relation is never self-joined: its scan
      // appears at most twice (corpus + batch side in the incremental
      // form), not once per pair side
      assert(s.linesIterator.count(l =>
        l.contains("Location") && l.contains("embeddings")) <= 2,
        s"$q embeddings scanned per pair side:\n" + s)
    }
  }

  test("q132: binary shortlist is TakeOrdered over one scan; rerank never re-scans") {
    val s = fmtOf("q132_binary_knn")
    assert(s.contains("TakeOrderedAndProject"),
      "shortlist not planned as TakeOrderedAndProject:\n" + s)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("embeddings")) === 1,
      "embeddings scanned more than once:\n" + s)
  }

  test("q133: classifier scoring is one shuffle-free scan") {
    val s = fmtOf("q133_quality_classifier")
    assert(!s.contains("Window") && !s.contains("Join"),
      "scoring is not a pure scan:\n" + s)
    assert(s.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents")) === 1,
      "documents scanned more than once:\n" + s)
    // the only exchange is the output ordering's range partitioning
    val exchanges = s.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"unexpected shuffles in scoring:\n$s")
  }

  test("q135: HLL runs as the native partial aggregate, no distinct shuffle for the sketch leg") {
    val s = fmtOf("q135_hll_cardinality")
    assert(s.contains("hll_distinct"), "native aggregate not in plan:\n" + s)
    assert("ObjectHashAggregate".r.findAllIn(s).size >= 2,
      "expected partial+final ObjectHashAggregate:\n" + s)
    assert(!s.contains("Window"), "window crept into HLL:\n" + s)
  }

  test("q137: gopher rules are a shuffle-free scan") {
    val s = fmtOf("q137_gopher_rules")
    assert(!s.contains("Window") && !s.contains("Join"),
      "gopher metrics should be pure column algebra:\n" + s)
    val exchanges = s.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"only the output sort may shuffle:\n$s")
  }

  test("q139: corpus block dedup never windows over the corpus") {
    val s = fmtOf("q139_block_dedup")
    assert(!s.contains("Window"), "corpus-wide window in block dedup:\n" + s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q140: textrank terminal plan is TakeOrdered over the " +
      "checkpointed ranks; the round joins the partitioned cache " +
      "exchange-free") {
    // round-14 shape: the iterations run against ONE src-partitioned
    // persisted edge copy and the result is eagerly checkpointed, so
    // the terminal plan is a 2-node scan (compare the 324-operator /
    // 34-scan unrolled plan it replaced, plans/r14). The round shape
    // itself is pinned like the LPA round below: edge cache partitioned
    // by the join key ⇒ the per-round join is exchange-free on the
    // corpus side.
    val s = fmtOf("q140_textrank")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("TakeOrderedAndProject"),
      "final top-25 should be TakeOrdered:\n" + s)
    assert(s.contains("ExistingRDD"),
      "ranks should be checkpoint-materialized (2-node terminal plan):\n"
        + s)
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val en = (0L until 2000L).map(i => (s"t${i % 97}", s"t${i % 53}", 0.1))
      .toDF("src", "dst", "wn").repartition(col("src")).persist()
    en.count()
    try {
      val pr = (0 until 97).map(i => (s"t$i", 0.01)).toDF("src", "pr")
      val round = en.join(pr, "src")
        .groupBy("dst").agg(sum(col("wn") * col("pr")).as("s"))
      val rs = round.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(rs.contains("InMemoryTableScan"), rs)
      // partial+final agg pair present; the only hashpartitioning
      // exchanges are the rank side + the groupBy — the cached edge
      // side must not re-shuffle
      assert("HashAggregate".r.findAllIn(rs).size >= 2, rs)
      val outer = rs.linesIterator.takeWhile(l0 =>
        !l0.contains("InMemoryTableScan")).mkString("\n")
      assert("Exchange hashpartitioning".r.findAllIn(outer).size <= 2,
        "edge cache re-shuffled above the per-round join:\n" + rs)
    } finally en.unpersist(blocking = true)
  }

  test("q141: date histogram picks top_type without a window") {
    val s = fmtOf("q141_date_histogram")
    assert(!s.contains("Window"),
      "struct-min argmax degraded to a window:\n" + s)
  }

  test("q142: the weighted draw is TakeOrdered, not a global sort") {
    val s = fmtOf("q142_weighted_sample")
    assert(s.contains("TakeOrderedAndProject"),
      "A-ES draw should plan as per-partition top-k:\n" + s)
  }

  test("q144: composite-agg after-key filter pushes into the scan") {
    val s = fmtOf("q144_composite_agg")
    assert(s.contains("TakeOrderedAndProject"),
      "bucket page should plan as TakeOrdered:\n" + s)
    assert(s.contains("PushedFilters:") && s.contains("src12"),
      "after-key predicate not pushed to parquet:\n" + s)
  }

  test("q145: pipeline aggs window over the bucket grid, events aggregate partially") {
    val s = fmtOf("q145_pipeline_aggs")
    // the corpus-scale pass is a partial-agg groupBy; the windows exist
    // but run AFTER the daily rollup (bucket grid), so at most one
    // single-partition exchange feeds them
    assert(s.contains("HashAggregate"), s)
    assert(s.contains("Window"), s)
  }

  test("q146: the DSIR log-ratio model is broadcast to the scoring join") {
    val s = fmtOf("q146_dsir_weights")
    assert(s.contains("BroadcastHashJoin"),
      "bucket-model join must broadcast the B-row model:\n" + s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q147: welch moments partial-aggregate; no window, no join") {
    val s = fmtOf("q147_welch_ttest")
    assert(!s.contains("Window"), s)
    assert(!s.contains("SortMergeJoin"),
      "t-test should be two stacked aggregates, not a join:\n" + s)
  }

  test("q151: conversion latency is two min-aggregates on the user key, no window") {
    val s = fmtOf("q151_time_to_convert")
    assert(!s.contains("Window"),
      "latency must come from min-aggs, not per-user sort windows:\n" + s)
  }

  test("q152: the curriculum page is TakeOrdered, never a global sort") {
    val s = fmtOf("q152_curriculum_order")
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("q153: MMR is one aggregate over a TakeOrdered shortlist — no chained shuffles") {
    val s = fmtOf("q153_mmr_rerank")
    assert(s.contains("TakeOrderedAndProject"),
      "shortlist must plan as top-k:\n" + s)
    assert(s.contains("mmr_select"),
      "selection must run as the native expression:\n" + s)
    assert(!s.contains("Window"), s)
    // one shortlist pass: a single partial/final collect pair (each
    // node appears twice in formatted output — tree + details)
    assert("ObjectHashAggregate".r.findAllIn(s).size <= 4,
      "more aggregate passes than the single collect:\n" + s)
  }

  test("q149/q150: rare_terms reads only the dictionary; dis_max probe is pruned") {
    val s = fmtOf("q149_rare_terms")
    assert(!s.contains("postings") && !s.contains("positions"),
      "rare_terms must never scan postings:\n" + s)
    val d = fmtOf("q150_dismax_boosting")
    assert(d.contains("term_bucket"),
      "dis_max probe lost its bucket pruning:\n" + d)
    assert("BroadcastHashJoin".r.findAllIn(d).size >= 1,
      "docfreq/stats sides must broadcast:\n" + d)
  }

  test("q157: ER blocking is an equi-join on the block key, never cartesian") {
    val s = fmtOf("q157_entity_resolution")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("Window"),
      "pairs/survivorship must be joins + aggs, not windows:\n" + s)
  }

  test("q159: per-bucket top hits run as the k-bounded aggregate, no window") {
    val s = fmtOf("q159_top_hits")
    assert(!s.contains("Window"),
      "top_hits must use TopKByScoreAgg, not row_number:\n" + s)
    assert(s.contains("ObjectHashAggregate"), s)
  }

  test("q160: adjacency matrix is ONE scan of conditional aggs — no join, no repeat passes") {
    val s = fmtOf("q160_adjacency_matrix")
    assert(!s.contains("Join"), s)
    // formatted output names each node twice (tree + details)
    assert("Scan parquet".r.findAllIn(s).size <= 2,
      "matrix must come from a single scan:\n" + s)
  }

  test("q161: auto interval choice is a broadcast 1-row relation, buckets partial-aggregate") {
    val s = fmtOf("q161_auto_date_histogram")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"),
      "interval stats must broadcast:\n" + s)
    assert(s.contains("partial_count") || s.contains("HashAggregate"), s)
  }

  test("q164: wedge and closure joins are hash joins, never cartesian") {
    val s = fmtOf("q164_triangle_count")
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("Window"), s)
  }

  test("q165: per-doc top-k is a bounded collect, not a corpus window") {
    val s = fmtOf("q165_doc_keywords")
    assert(!s.contains("Window"),
      "keyword ranking must be the bounded collect, not row_number:\n" + s)
  }

  test("q168: collapse runs over the pruned index probe without a window") {
    val s = fmtOf("q168_search_collapse")
    assert(s.contains("term_bucket"),
      "collapse lost the probe's bucket pruning:\n" + s)
    assert(!s.contains("Window"),
      "best-per-source must be the min-struct agg:\n" + s)
  }

  test("q173: the blocklist gate is ONE scan — no join, no window") {
    val s = fmtOf("q173_blocklist_filter")
    assert(!s.contains("Join") && !s.contains("Window"), s)
    assert("Scan parquet".r.findAllIn(s).size <= 2, s)
  }

  test("q174: ROUGE eval joins only LSH candidates; final page is TakeOrdered") {
    val s = fmtOf("q174_rouge_eval")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("q175: attribution is the keyed as-of carry plus a broadcast total") {
    val s = fmtOf("q175_revenue_attribution")
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"), s)
  }

  test("q180: the export flagship is pure scans + aggs — zero windows, no cartesian") {
    val s = fmtOf("q180_corpus_export")
    assert(!s.contains("Window") && !s.contains("CartesianProduct"), s)
  }

  test("q43/q64/q76: admission windows are bucketed — never a bare per-language corpus window") {
    // the 100 TB killer shape: Window.partitionBy(lang) running-sum over
    // raw docs serializes each language onto one task. The bucketed
    // prefix-sum form allows only (a) windows with a composite
    // (stratum, hash-bucket) partition spec over data rows, or (b)
    // windows over an already-aggregated metadata grid.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (q <- Seq("q43_token_budget", "q64_mixture_sample",
        "q76_training_corpus", "q44_stratified_take")) {
      val plan = SparkEntry.queries(q)(spark, SfDir)
        .queryExecution.optimizedPlan
      plan.foreach {
        case w: LWindow =>
          val overGrid = w.child.collectFirst { case a: Aggregate => a }.isDefined
          assert(w.partitionSpec.size >= 2 || overGrid,
            s"$q windows the corpus on a single key: ${w.partitionSpec}")
        case _ =>
      }
    }
  }

  test("q162/q163: domain stats broadcast back over the corpus, no window") {
    val a = fmtOf("q162_domain_prior")
    assert(!a.contains("Window") && !a.contains("CartesianProduct"), a)
    val b = fmtOf("q163_mixture_temperature")
    assert(!b.contains("Window") && !b.contains("CartesianProduct"), b)
    assert(b.contains("BroadcastHashJoin"),
      "per-domain rates must broadcast to the admission scan:\n" + b)
  }

  test("q190/q191: privacy audit and target encoding are pure aggregates — no window, no cartesian") {
    for (q <- Seq("q190_kanonymity_audit", "q191_target_encoding")) {
      val s = fmtOf(q)
      assert(!s.contains("Window"), s"$q grew a window:\n$s")
      assert(!s.contains("CartesianProduct"), s"$q went cartesian:\n$s")
      assert("HashAggregate".r.findAllIn(s).size >= 2,
        s"$q lost partial aggregation:\n$s")
    }
    // the 1-row global prior must ride a broadcast, not a shuffle
    assert(fmtOf("q191_target_encoding").contains("BroadcastNestedLoopJoin"),
      "q191 prior is not broadcast")
  }

  test("q192: gap-fill windows partition by the entity key, never globally") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = SparkEntry.queries("q192_gap_fill")(spark, SfDir)
      .queryExecution.optimizedPlan
    var sawWindow = false
    plan.foreach {
      case w: LWindow =>
        sawWindow = true
        assert(w.partitionSpec.nonEmpty,
          s"q192 window is GLOBAL (one task at any scale): $w")
      case _ =>
    }
    assert(sawWindow, "q192 lost its ffill window entirely")
  }

  test("q193/q195: assembly and weak labels have no window; LF stats ride a broadcast") {
    val a = fmtOf("q193_sft_assembly")
    assert(!a.contains("Window") && !a.contains("CartesianProduct"), a)
    assert("ObjectHashAggregate".r.findAllIn(a).size >= 2,
      "q193 collect_list lost partial aggregation:\n" + a)
    val b = fmtOf("q195_weak_labels")
    assert(!b.contains("Window") && !b.contains("CartesianProduct"), b)
    assert(b.contains("BroadcastNestedLoopJoin"),
      "q195 reliability stats must broadcast back:\n" + b)
  }

  test("q194/q196: centroid rides a broadcast; novelty never goes cartesian") {
    val a = fmtOf("q194_embedding_health")
    assert(a.contains("BroadcastNestedLoopJoin"),
      "q194 global centroid must broadcast:\n" + a)
    assert(!a.contains("CartesianProduct"), a)
    val b = fmtOf("q196_ngram_novelty")
    assert(!b.contains("CartesianProduct") && !b.contains("Window"), b)
  }

  test("HITS round: the per-iteration aggregation is exchange-free on " +
      "the group-key-partitioned cached edge copy") {
    // the round-12 find: a localCheckpoint's LogicalRDD surfaces as
    // UnknownPartitioning under AQE, silently re-inserting an edge-
    // scale Exchange into EVERY iteration of the graph operators. The
    // copies are persist()ed and keyed by the GROUP BY column now;
    // this pins the resulting plan shape so a refactor that loses it
    // fails here, not on the 100 TB run.
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val edges = (0L until 2000L).map(i => (i % 97, i % 53))
      .toDF("hub", "auth")
    import graft.operators.Ckpt.CkptOps
    val e = edges.distinct().graftCheckpoint(false)
    val eByAuth = e.repartition(col("auth")).persist()
    eByAuth.count() // materialize the cache (as hits() does via hubs)
    val state = spark.createDataFrame(
      java.util.Arrays.asList((0L until 97L).map(h =>
        org.apache.spark.sql.Row(h, 1000000L)): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("hub",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hs12",
          org.apache.spark.sql.types.LongType))))
    val agg = eByAuth.join(broadcast(state), "hub")
      .groupBy("auth").agg(sum(col("hs12")).as("ar12"))
    val s = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // partial+final aggregate ADJACENT in the outer tree = no exchange
    // between them (the one hashpartitioning Exchange in the output is
    // the cache-BUILD shuffle rendered inside the InMemoryRelation)
    assert("""HashAggregate \(\d+\)\s*\n\s*\+- HashAggregate""".r
      .findFirstIn(s).isDefined,
      "group-by re-shuffled the partitioned cache:\n" + s)
    assert(s.contains("InMemoryTableScan"),
      "cached copy not used:\n" + s)
    // and the checkpointed form really does lose the partitioning —
    // the hazard this guard exists for (if Spark ever starts
    // preserving it, the persist() workaround can be retired)
    val eCk = e.repartition(col("auth")).graftCheckpoint(true)
    val s2 = eCk.join(broadcast(state), "hub")
      .groupBy("auth").agg(sum(col("hs12")).as("ar12"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""HashAggregate \(\d+\)\s*\n\s*\+- Exchange""".r
      .findFirstIn(s2).isDefined,
      "checkpoint now preserves partitioning — retire the workaround:\n" + s2)
  }

  test("q231 LPA broadcast-path round: the v-partitioned cached copy " +
      "makes the neighbour join AND both groupBys exchange-free") {
    // mirrors Graph.labelPropagationAssignments' bc-path round step:
    // nbrs is repartition(v).persist()ed, labels broadcast on n, and
    // v-hash-partitioning satisfies BOTH groupBy clusterings (v,label)
    // and (v) — the round plan must carry ZERO shuffles.
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val nbrs0 = (0L until 2000L).map(i => (i % 97, i % 53))
      .toDF("v", "n")
    val nbrs = nbrs0.repartition(col("v")).persist()
    nbrs.count()
    try {
      val l = (0L until 53L).map(i => (i, i)).toDF("n", "label")
      val round = nbrs.join(broadcast(l), "n")
        .groupBy("v", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("v")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l")))
          .as("m"))
        .select(col("v"), col("m.l").as("label"))
      val s = round.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(s.contains("BroadcastHashJoin"),
        "label relation not broadcast:\n" + s)
      assert(s.contains("InMemoryTableScan"), "cached copy not used:\n" + s)
      // no shuffle anywhere above the cache: the only Exchange allowed
      // in the tree is the broadcast build
      val outer = s.linesIterator.takeWhile(l0 =>
        !l0.contains("InMemoryTableScan")).mkString("\n")
      assert(!"Exchange hashpartitioning".r.findFirstIn(outer).isDefined,
        "LPA round re-shuffles above the v-partitioned cache:\n" + s)
    } finally nbrs.unpersist(blocking = true)
  }

  test("iterative corpus joins: a join-key-partitioned cached copy is " +
      "exchange-free on the corpus side (pathCentrality/BFS/cheapest-" +
      "paths/nearDupClusters distributed rounds)") {
    // round-13 sweep of the round-12 hazard: the DISTRIBUTED fallback
    // loops of pathCentralityDist, bfsHopHistogram, cheapestPaths and
    // nearDupClusters join per-round against a static adjacency/edge
    // relation. Those copies are persist()ed keyed by the JOIN column
    // now; this pins the join shape — the corpus side reads the cache
    // with NO Exchange above it (the state side is the only per-round
    // shuffle). A checkpointed copy would re-shuffle (proven by the
    // HITS pin's second half).
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    import graft.operators.Ckpt.CkptOps
    val e = (0L until 2000L).map(i => (i % 97, i % 53))
      .toDF("v", "n").distinct().graftCheckpoint(false)
    val nbrsByV = e.repartition(col("v")).persist()
    nbrsByV.count() // materialize (the operators do, via their counts)
    val state = (0L until 97L).map(i => (i, 1L)).toDF("v", "sigma")
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = state.join(nbrsByV, "v")
        .groupBy(col("n")).agg(sum(col("sigma")).as("sigma"))
      val s = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(s.contains("InMemoryTableScan"), "cached copy not used:\n" + s)
      // corpus side: Sort (SMJ) or bare scan (SHJ) directly over the
      // cache — NO Exchange between the join and the InMemoryTableScan
      assert(
        """(Sort \(\d+\)\s*\n\s*\+- InMemoryTableScan)|(\+- InMemoryTableScan)""".r
          .findFirstIn(s).isDefined, s)
      val joinSide = s.linesIterator.dropWhile(l =>
        !l.contains("InMemoryTableScan")).toSeq
      // the OUTER tree carries exactly one hashpartitioning Exchange —
      // the state side (cache-build shuffles render inside the
      // InMemoryRelation block, after the scan line)
      val outer = s.linesIterator.takeWhile(l =>
        !l.contains("InMemoryTableScan")).mkString("\n")
      assert("Exchange hashpartitioning".r.findAllIn(outer).size <= 2,
        "corpus side re-shuffled above the cache:\n" + s)
      assert(joinSide.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        prev.getOrElse("10485760"))
      nbrsByV.unpersist(blocking = true)
    }
  }
}
