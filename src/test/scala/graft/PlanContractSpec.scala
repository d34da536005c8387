package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan CONTRACTS for the scale-critical queries — the properties that
  * make these plans survive a 100× scale-up, pinned as assertions so a
  * refactor that silently un-pushes a filter, widens a scan, or adds a
  * corpus-wide shuffle fails the build, not the next benchmark.
  *
  * AQE is toggled off per-assertion (the executed plan is otherwise an
  * opaque AdaptiveSparkPlan wrapper pre-execution); harness sessions
  * keep AQE on.
  */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def staticPlan(build: => DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec => s }

  /** Every node of `p` INCLUDING those inside cached (InMemoryRelation)
    * subtrees — a pinned frame hides its build plan from plain
    * collect(). */
  private def allPlans(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case q => q } ++ p.collect {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        allPlans(s.relation.cachedPlan)
    }.flatten

  /** Scans of the published lang_routes fixture (round 18: routing is
    * a stored assignment — route once, key every stage off it; the
    * scoring pass stays live-pinned in q_langid_trained's contract).
    * Looks through cache pins: consumers pin the routed frame. */
  private def routeStoreScans(p: SparkPlan): Seq[FileSourceScanExec] =
    allPlans(p).collect { case s: FileSourceScanExec => s }
      .filter(_.metadata.get("Location").exists(_.contains("frame_lang_routes")))

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    p.collect { case e: ShuffleExchangeExec => e }

  test("q1_agg: shipdate predicate reaches the parquet scan; unused columns pruned") {
    val plan = staticPlan(graft.queries.KpiQueries.q1Agg(spark, sf))
    val scan = scans(plan).head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("l_shipdate"), s"shipdate not pushed: $pushed")
    val read = scan.metadata("ReadSchema")
    // the 7 aggregate inputs + 2 keys + the filter column only
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_shipdate").foreach(c =>
      assert(read.contains(c), s"$c missing from ReadSchema: $read"))
    Seq("l_comment", "l_partkey", "l_orderkey", "l_shipmode").foreach(c =>
      assert(!read.contains(c), s"$c NOT pruned from ReadSchema: $read"))
  }

  test("q_minmax_norm: both branches scan exactly the two needed customer columns") {
    val plan = staticPlan(graft.queries.KpiQueries.minmaxNorm(spark, sf))
    val reads = scans(plan).map(_.metadata("ReadSchema"))
    assert(reads.nonEmpty)
    // the agg branch prunes to c_acctbal ALONE; the projection branch
    // reads the two output columns; nothing reads the wide columns
    reads.foreach { read =>
      assert(read.contains("c_acctbal"), read)
      assert(!read.contains("c_name") && !read.contains("c_address") &&
        !read.contains("c_comment"), s"customer scan not pruned: $read")
    }
    assert(reads.exists(_.contains("c_custkey")), reads.mkString("; "))
  }

  test("q_dedup_minhash: no corpus-wide shuffle beyond the compute-spreading id repartition") {
    // 3 shuffles total: signature repartition(id), candidate-pair
    // distinct (a |pairs|-sized frame), output sort. The verify branch
    // must stay broadcast-only — a 4th+ shuffle means the full shingle
    // stream is being moved again.
    val plan = staticPlan(graft.queries.DedupQueries.dedupMinhash(spark, sf))
    val ex = shuffles(plan)
    assert(ex.size <= 3, s"minhash grew a shuffle: ${ex.size}\n${ex.map(_.outputPartitioning)}")
    spark.catalog.clearCache() // dedupMinhash pins sig + candidates
  }

  test("q_dedup_winnow: narrow map — exactly the id repartition plus the output sort") {
    val plan = staticPlan(graft.queries.DedupQueries.dedupWinnow(spark, sf))
    assert(shuffles(plan).size == 2,
      s"winnow must not re-grow window/distinct exchanges:\n$plan")
  }

  test("q_limit_topn: zero exchanges (TakeOrderedAndProject, no global sort)") {
    val plan = staticPlan(graft.queries.RelationalQueries.limitTopN(spark, sf))
    assert(shuffles(plan).isEmpty, s"top-n must not shuffle:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
  }

  test("q_asof_join: no join operator at all — union + keyed window, one shuffle per side") {
    val plan = staticPlan(graft.queries.JoinQueries.asofJoin(spark, sf))
    val s = plan.toString
    // the as-of must NOT plan as an inequality join (BroadcastNestedLoop
    // explodes at scale); the union+window formulation has no join node
    assert(!s.contains("NestedLoopJoin") && !s.contains("CartesianProduct"),
      s"as-of degenerated into an all-pairs join:\n$s")
    // shuffles: the keyed window partition + the pre-agg of the order
    // side + output sort; crucially NO whole-frame (empty-partition)
    // window — assert on the actual WindowExec nodes, not plan strings
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected the as-of carry window in:\n$s")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"whole-frame window in as-of plan:\n$w"))
    assert(shuffles(plan).size <= 3, s"as-of grew a shuffle: ${shuffles(plan).size}\n$s")
  }

  test("q_range_join: bucketed equi-join — never BroadcastNestedLoop/Cartesian") {
    val plan = staticPlan(graft.queries.JoinQueries.rangeJoin(spark, sf))
    val s = plan.toString
    assert(!s.contains("NestedLoopJoin") && !s.contains("CartesianProduct"),
      s"range join must equi-join on buckets, not all-pairs:\n$s")
  }

  test("q_dedup_semantic: within-cell equi-join (never all-pairs); keep step broadcasts") {
    // the pair stage: cell assignment is map-side (no join to a centroid
    // frame), pairing is a cell equi-join — a cartesian here is the
    // corpus all-pairing SemDeDup exists to avoid
    val emb = graft.Tables.embeddings(spark, sf)
    val prepped = graft.operators.Similarity.prep(
      emb, org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val pairPlan = staticPlan(
      graft.operators.Similarity.semanticPairs(prepped, stride = 31, threshold = 0.35))
    val ps = pairPlan.toString
    assert(!ps.contains("NestedLoopJoin") && !ps.contains("CartesianProduct"),
      s"semantic pairing must equi-join on cell, not all-pairs:\n$ps")
    assert(ps.contains("SortMergeJoin") || ps.contains("ShuffledHashJoin") ||
      ps.contains("BroadcastHashJoin"), s"cell equi-join missing:\n$ps")
    // the keep stage: drop/rep id sets are cluster-sized → broadcast
    val keepPlan = staticPlan(graft.queries.SimilarityQueries.dedupSemantic(spark, sf))
    val ks = keepPlan.toString
    assert(!ks.contains("CartesianProduct"), ks)
    assert(ks.contains("BroadcastHashJoin"), s"keep-list joins must broadcast:\n$ks")
    spark.catalog.clearCache()
  }

  /** The similarity scorers must rank through the bounded top_k_by
    * aggregate — a WindowExec here means a single-task sort over one
    * query's full candidate set at scale. */
  private def assertBoundedTopK(p: SparkPlan): Unit = {
    val windows = p.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, s"per-query ranking regressed to a window sort:\n$p")
    assert(p.toString.contains("top_k_by"), s"bounded top_k_by aggregate missing:\n$p")
  }

  test("q_sim_topk: queries broadcast; ranking is the bounded top_k_by aggregate, no window") {
    val plan = staticPlan(graft.queries.SimilarityQueries.simTopK(spark, sf))
    assert(plan.toString.contains("BroadcastNestedLoopJoin") ||
      plan.toString.contains("BroadcastHashJoin") ||
      plan.toString.contains("BroadcastExchange"),
      s"expected a broadcast for the query side:\n$plan")
    assertBoundedTopK(plan)
    // the per-query top-k aggregate exchange (k rows per partition per
    // query after map-side combine) + the output sort
    assert(shuffles(plan).size <= 2, s"sim_topk grew an exchange:\n$plan")
  }

  test("q_sim_pq: queries broadcast; corpus crosses only the top-k aggregate + output sort") {
    val plan = staticPlan(graft.queries.SimilarityQueries.simPq(spark, sf))
    val s = plan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"the query-table join must broadcast, not shuffle the encoded corpus:\n$s")
    assertBoundedTopK(plan)
    // per-query aggregate exchange + output sort; encoding itself is map-side
    assert(shuffles(plan).size <= 2, s"pq grew an exchange:\n$s")
    spark.catalog.clearCache() // simPq pins the prepped frame
  }

  test("q_sim_ivfpq: cell join broadcasts the query tables; bounded top-k aggregate") {
    val plan = staticPlan(graft.queries.SimilarityQueries.simIvfPq(spark, sf))
    val s = plan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"the cell join must broadcast the queries, not shuffle the encoded corpus:\n$s")
    assertBoundedTopK(plan)
    assert(shuffles(plan).size <= 2, s"ivfpq grew an exchange:\n$s")
    spark.catalog.clearCache() // simIvfPq pins prepped + cells
  }

  test("q_sim_ivfpq_res: residual coding keeps the ivfpq contract — broadcast cell join, bounded top-k") {
    val plan = staticPlan(graft.queries.SimilarityQueries.simIvfPqRes(spark, sf))
    val s = plan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"the cell join must broadcast the queries, not shuffle the encoded residuals:\n$s")
    // (the cached ivfCells lineage carries the documented bounded
    // centroid-scoring BNLJ — corpus × #centroids — same as q_sim_ivfpq)
    assertBoundedTopK(plan)
    assert(shuffles(plan).size <= 2, s"ivfpq_res grew an exchange:\n$s")
    spark.catalog.clearCache() // simIvfPqRes pins prepped + cells + residuals
  }

  test("q_cube: ONE expand + hash-aggregate pass — no per-grouping-set re-scan, no join") {
    val plan = staticPlan(graft.queries.RelationalQueries.cubeStatusYear(spark, sf))
    assert(scans(plan).size == 1, s"cube re-scanned the input:\n$plan")
    val expands = plan.collect { case e: org.apache.spark.sql.execution.ExpandExec => e }
    assert(expands.size == 1, s"expected exactly one Expand, got ${expands.size}:\n$plan")
    // expand fan-out + partial agg + final agg exchange + output sort only
    assert(shuffles(plan).size <= 2, s"cube grew a shuffle: ${shuffles(plan).size}\n$plan")
  }

  test("q_window_funcs: all five functions share ONE per-customer window (single sort, no whole-frame window)") {
    val plan = staticPlan(graft.queries.RelationalQueries.windowFuncs(spark, sf))
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 1,
      s"expected one fused WindowExec, got ${windows.size} — the functions split specs:\n$plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, s"whole-frame window:\n$w"))
    // the customer partition exchange + the output sort
    assert(shuffles(plan).size <= 2, s"window query grew a shuffle: ${shuffles(plan).size}\n$plan")
  }

  test("q_set_ops: intersect/except plan as hash joins on the key — never nested-loop/cartesian") {
    val plan = staticPlan(graft.queries.RelationalQueries.setOps(spark, sf))
    val s = plan.toString
    assert(!s.contains("NestedLoopJoin") && !s.contains("CartesianProduct"),
      s"set ops degenerated to all-pairs:\n$s")
  }

  test("bloom decontamination: the corpus fingerprint stream is filtered by bloom_contains BEFORE any join") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val fps = graft.operators.Dedup.winnowFingerprints(docs, col("doc_id"), col("text"), 3, 4)
    val evalFps = fps.filter(pmod(col("id"), lit(50)) === 0)
    val plan = staticPlan(
      graft.operators.Dedup.bloomDecontaminate(docs, col("doc_id"), fps, evalFps))
    val s = plan.toString
    assert(s.contains("bloom_contains"), s"bloom probe missing from the plan:\n$s")
    // the verify joins stay broadcast — the corpus/fingerprint stream is
    // never shuffled FOR A JOIN (winnow's internal per-doc repartition is
    // the only legitimate exchange family here)
    assert(s.contains("BroadcastExchange"), s"verify joins must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"verify join shuffled the fingerprint stream:\n$s")
  }

  test("q_zorder_key: pure map over one pruned scan — only the output sort exchanges") {
    val plan = staticPlan(graft.queries.RelationalQueries.zorderKey(spark, sf))
    val scanList = scans(plan)
    assert(scanList.size == 1, s"expected one scan, got ${scanList.size}")
    val read = scanList.head.metadata("ReadSchema")
    Seq("o_orderkey", "o_custkey", "o_orderdate").foreach(c =>
      assert(read.contains(c), s"$c missing: $read"))
    assert(!read.contains("o_totalprice") && !read.contains("o_comment"),
      s"orders scan not pruned: $read")
    assert(shuffles(plan).size <= 1, s"bit-interleave grew a shuffle:\n$plan")
  }

  test("q_heavy_hitters: cms_query gates the scan BEFORE the only per-key exchange") {
    // the sketch pass runs eagerly at construction; the returned plan is
    // the candidate pass — scan → cms filter → recount (+ output sort)
    val plan = staticPlan(graft.queries.TextQueries.heavyHitters(spark, sf))
    val s = plan.toString
    assert(s.contains("cms_query"), s"cms probe missing from the plan:\n$s")
    assert(scans(plan).size == 1, s"candidate pass re-scans:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("NestedLoopJoin"),
      s"heavy hitters must not join:\n$s")
    // candidate-count aggregate + output sort only
    assert(shuffles(plan).size <= 2, s"extra exchange in the recount:\n$plan")
  }

  test("q_text_repetition: pure per-row map — one scan, only the output-sort exchange") {
    val plan = staticPlan(graft.queries.TextQueries.textRepetition(spark, sf))
    assert(scans(plan).size == 1, s"repetition re-scans documents:\n$plan")
    assert(shuffles(plan).size <= 1, s"repetition grew an exchange beyond the sort:\n$plan")
    assert(!plan.toString.contains("Join"), s"repetition must not join:\n$plan")
  }

  test("q_chunk_overlap: one scan + map-side Generate; only the output-sort exchange") {
    val plan = staticPlan(graft.queries.TextQueries.chunkOverlap(spark, sf))
    assert(scans(plan).size == 1, s"chunking re-scans documents:\n$plan")
    assert(plan.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.nonEmpty,
      s"expected the posexplode Generate:\n$plan")
    assert(shuffles(plan).size <= 1, s"chunking grew an exchange beyond the sort:\n$plan")
  }

  test("q_rolling_range: one orders scan, one partitioned RANGE window, no whole-frame sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.RelationalQueries.rollingRange(spark, sf))
    assert(scans(plan).size == 1, s"rolling range re-scans orders:\n$plan")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 1, s"both frame aggregates must fuse onto one WindowExec:\n$plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, s"whole-frame window:\n$w"))
    // customer partition + output sort only
    assert(shuffles(plan).size <= 2, s"rolling range grew an exchange:\n$plan")
  }

  test("q_sample_balance: corpus never shuffles — factor join broadcasts, fan-out is map-side") {
    val plan = staticPlan(graft.queries.SampleQueries.sampleBalance(spark, sf))
    val s = plan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"),
      s"the factor join must broadcast, not shuffle the corpus:\n$s")
    assert(plan.collect { case g: org.apache.spark.sql.execution.GenerateExec => g }.nonEmpty,
      s"expected the epoch explode Generate:\n$s")
    // exactly two scans: the counts pass + the corpus pass (the max
    // must NOT re-plan the counts subtree a third time)
    assert(scans(plan).size == 2, s"balance re-scans documents:\n$s")
    // counts aggregate (|groups| rows) + the tiny single-partition max
    // window + the output sort; the replicated corpus crosses no exchange
    assert(shuffles(plan).size <= 3, s"balance grew an exchange:\n$s")
  }

  test("q_funnel: one events scan; the chained step windows share one user partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.EventQueries.funnel(spark, sf))
    assert(scans(plan).size == 1,
      s"funnel re-scans events (the staged-join spelling):\n$plan")
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.size == 3, s"expected 3 chained step windows, got ${windows.size}")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, s"whole-frame window:\n$w"))
    // user_id exchange + output sort only — the windows and the final
    // per-user aggregate all reuse the first partitioning
    assert(shuffles(plan).size <= 2, s"funnel grew an exchange:\n$plan")
  }

  test("q_quality_prune: the corpus never joins or sorts — histogram threshold broadcasts back") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, SortMergeJoinExec}
    val plan = staticPlan(graft.queries.TextQueries.qualityPrune(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"quality_prune sort-merge-joins the corpus:\n$plan")
    // the 1-row threshold rides the MinMax crossJoin pattern
    assert(plan.collect { case j: BroadcastNestedLoopJoinExec => j }.size == 1)
    // histogram agg + the two tiny window exchanges + output sort; the
    // corpus side contributes its aggregate map pass only
    assert(shuffles(plan).size <= 4, s"quality_prune grew an exchange:\n$plan")
  }

  test("q_corpus_mix: weight lookup and epoch fan-out are map-side — no join in the plan") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
    val plan = staticPlan(graft.queries.SampleQueries.corpusMix(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty &&
      plan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"corpus_mix joins for its weights:\n$plan")
    // the interleave rank's range sort + the output sort only
    assert(shuffles(plan).size <= 2, s"corpus_mix grew an exchange:\n$plan")
  }

  test("date-partitioned layout: a partition-key filter prunes to one partition's files at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString + "/events"
    import spark.implicits._
    // one writer partition → exactly one file per day directory, so the
    // file-count assertion pins pruning itself, not the test parallelism
    (0 until 1000).map(i => (i.toLong, s"2024-01-0${i % 5 + 1}"))
      .toDF("id", "day").repartition(1).write.partitionBy("day").parquet(dir)
    val plan = staticPlan(
      spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col("day") === "2024-01-03"))
    val scan = scans(plan).head
    // the predicate must reach the scan as a PARTITION filter (directory
    // pruning — no data file of the other four days is even opened),
    // not a post-scan Filter over a full-table read
    assert(scan.metadata("PartitionFilters").contains("day"),
      s"day filter not a partition filter: ${scan.metadata}")
    plan.executeCollect()
    assert(scan.metrics("numFiles").value == 1,
      s"scan read ${scan.metrics("numFiles").value} of 5 files — partition pruning lost")
  }

  test("q_profile: no Expand, no sort aggregation — hash fold + per-column pruned distinct legs") {
    val plan = staticPlan(graft.queries.ProfileQueries.profileOrders(spark, sf))
    // r18 shape: the multi-distinct Expand (k+1 replicas of every row,
    // sort-aggregated because string MIN/MAX buffers are var-width) is
    // gone — a regression to it re-plans an ExpandExec or SortAggregate
    val expands = plan.collect { case e: org.apache.spark.sql.execution.ExpandExec => e }
    assert(expands.isEmpty, s"exact profile re-grew the multi-distinct Expand:\n$plan")
    val sortAggs = plan.collect {
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
        if a.groupingExpressions.nonEmpty => a
    }
    assert(sortAggs.isEmpty, s"profile re-grew a grouped sort aggregate:\n$plan")
    // one base scan + one single-column scan per distinct leg, each
    // pruned to exactly its own column (columnar: same bytes as one pass)
    val scanWidths = scans(plan).map(_.schema.fields.length).sorted
    assert(scanWidths == Seq(1, 1, 1, 1, 1, 1, 6),
      s"distinct legs lost column pruning: $scanWidths\n$plan")
  }

  test("q_snapshot_diff: digests computed below the join — the join carries key+digest only") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = staticPlan(graft.queries.ProfileQueries.snapshotDiff(spark, sf))
    val joins = plan.collect { case j: SortMergeJoinExec => j }
    assert(joins.size == 1, s"expected the one full-outer key join:\n$plan")
    // every join input column is a key or a digest: full rows never shuffle
    joins.head.children.foreach { side =>
      val cols = side.output.map(_.name)
      assert(cols.forall(c => c == "o_orderkey" || c.startsWith("__d")),
        s"full row columns reached the diff join: $cols")
    }
    assert(shuffles(plan).size <= 3, s"diff grew an exchange:\n$plan")
  }

  test("q_text_search: broadcast stats join + bounded top-k, no global sort") {
    val plan = staticPlan(graft.queries.TextQueries.textSearch(spark, sf))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded TakeOrdered, not a global sort:\n$plan")
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"query-term stats must broadcast, not shuffle-join:\n$plan")
  }

  test("q_simjoin: candidate-confined — every join broadcast, no corpus pair join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = staticPlan(graft.queries.DedupQueries.simJoin(spark, sf))
    // the token stream must never be pair-joined: candidates and the
    // verification attaches ride broadcast joins over candidate-sized
    // frames; an SMJ here means a corpus-sized side started shuffling
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"simjoin grew a shuffled join:\n$plan")
    assert(!plan.toString.contains("Cartesian") &&
      !plan.toString.contains("BroadcastNestedLoop"), s"unbounded join:\n$plan")
    assert(shuffles(plan).size <= 4, s"simjoin grew an exchange:\n$plan")
    spark.catalog.clearCache() // similarPairs pins toks + docs
  }

  test("q_matview_delta: retraction rides a broadcast semi-join, bounded exchanges") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val plan = staticPlan(graft.queries.ProfileQueries.matviewDelta(spark, sf))
    val semis = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType.toString == "LeftSemi" => j }
    assert(semis.nonEmpty,
      s"the base-table retraction must be a feed-confined broadcast semi-join:\n$plan")
    assert(shuffles(plan).size <= 5, s"matview refresh grew an exchange:\n$plan")
  }

  test("q_bucket_join: co-bucketed SMJ — zero exchanges below the join") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = staticPlan(graft.queries.IngestQueries.bucketJoin(spark, sf))
    val joins = plan.collect { case j: SortMergeJoinExec => j }
    assert(joins.size == 1, s"expected one sort-merge join:\n$plan")
    // the whole point of the bucketed layout: both join inputs read
    // their buckets in place — any Exchange here re-pays the shuffle
    // the write already paid
    assert(joins.head.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"bucketed join shuffled an input:\n$plan")
  }

  test("q_quality_clf: weight join broadcasts (the model is dim+1 rows); never sort-merge") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val plan = staticPlan(graft.queries.CurationQueries.qualityClf(spark, sf))
    assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"the dim+1-row weight table must broadcast, not sort-merge:\n$plan")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    // the feature pass is the native one-pass expression, not a
    // per-window substr chain
    assert(s.contains("fnv_ngrams"), s"fnv_ngrams missing from:\n$plan")
  }

  test("q_domain_cap: the cap is the bounded top_k_by aggregate — no Window operator") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.CurationQueries.domainCap(spark, sf))
    // a window ROW_NUMBER here would funnel every domain's documents
    // through one task's sort — the low-cardinality-group failure mode
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"per-domain cap must not be a window:\n$plan")
    assert(plan.toString.contains("top_k_by"), s"top_k_by missing from:\n$plan")
  }

  test("q_curriculum_order: position is the distributed dense rank — no whole-frame window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.CurationQueries.curriculumOrder(spark, sf))
    val frames = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(frames.isEmpty,
      s"curriculum position must be the range-sort dense id, not a 1-partition window:\n$plan")
  }

  test("q_curation_pipeline: filter stages inherit their operators' shapes — no Window, native features, bounded cap") {
    import org.apache.spark.sql.execution.window.WindowExec
    // stages 1-6 (the rank/pack tail's RDD hop hides upstream plans —
    // DenseId/PrefixSum shapes are pinned by their own contracts above)
    val plan = staticPlan(graft.queries.CurationQueries.curationSurvivors(spark, sf))
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"no pipeline stage may funnel the corpus through a window sort:\n$plan")
    val s = plan.toString
    assert(s.contains("fnv_ngrams"),
      s"classifier stage must use the native one-pass feature hash:\n$plan")
    assert(s.contains("top_k_by"),
      s"domain cap must be the bounded top_k_by aggregate:\n$plan")
    spark.catalog.clearCache() // pipeline pins pv/lms/enriched + pair caches
  }

  test("q_tokenizer_eval: ONE corpus scan carries all five native encoders — no per-family re-read") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.TextQueries.tokenizerEval(spark, sf))
    val docScans = scans(plan).filter(_.toString.contains("documents"))
    assert(docScans.size == 1,
      s"expected exactly one documents scan, got ${docScans.size}:\n$plan")
    val ps = plan.toString
    Seq("bpe_encode", "bpe_encode_bytes", "unigram_encode",
        "unigram_encode_bytes", "wordpiece_encode").foreach { f =>
      assert(ps.contains(s"$f("), s"encoder $f missing from the single pass:\n$plan")
    }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"the eval is one aggregate, never a window:\n$plan")
  }

  test("q_langid_trained: native feature hash, broadcast model join, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.TextQueries.langIdTrained(spark, sf))
    val ps = plan.toString
    assert(ps.contains("fnv_ngrams"),
      s"lang-ID scoring must use the native one-pass feature hash:\n$plan")
    assert(ps.contains("BroadcastHashJoin"),
      s"the L*(dim+1)-row model must ride a broadcast join:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"per-class scores are one grouped aggregate, never a window:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_tokenizer_eval_lang: one encode scan + one routing scan, all five encoders, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(graft.queries.TextQueries.tokenizerEvalByLang(spark, sf))
    // exactly ONE documents scan: the ENCODE pass (q_tokenizer_eval's
    // one-scan contract, joined BY doc_id to the STORED routing
    // assignment — round 18: routing reads the published lang_routes
    // fixture; the scoring pass is q_langid_trained's contract) — a
    // per-family encode re-read fails here
    val docScans = scans(plan).filter(_.toString.contains("documents"))
    assert(docScans.size == 1,
      s"expected exactly the encode documents scan, got ${docScans.size}:\n$plan")
    assert(routeStoreScans(plan).nonEmpty,
      s"routing must read the published lang_routes store:\n$plan")
    val ps = plan.toString
    Seq("bpe_encode", "bpe_encode_bytes", "unigram_encode",
        "unigram_encode_bytes", "wordpiece_encode").foreach { f =>
      assert(ps.contains(s"$f("), s"encoder $f missing from the single pass:\n$plan")
    }
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"the per-language eval is grouped aggregates, never a window:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_multilingual_curation: keyed aggregates end to end — no window, no cartesian corpus pair") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(graft.queries.TextQueries.multilingualCuration(spark, sf))
    val ps = plan.toString
    assert(routeStoreScans(plan).nonEmpty,
      s"routing must read the published lang_routes store:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"per-language thresholds are bounded aggregates, never a window:\n$plan")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"no stage may cross-pair the corpus:\n$plan")
    assert(ps.contains("BroadcastHashJoin"),
      s"per-language vocab/threshold frames must ride broadcast joins:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_multilingual_neardup: the language is IN the bucket key — no cross-language pairing, no cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val plan = staticPlan(graft.queries.TextQueries.multilingualNearDup(spark, sf))
    val ps = plan.toString
    assert(routeStoreScans(plan).nonEmpty,
      s"routing must read the published lang_routes store:\n$plan")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
      s"no stage may cross-pair the corpus:\n$plan")
    // the ONLY pairing join is the bucket self-join; its equi-keys must
    // carry predicted_lang alongside the band columns — a rewrite that
    // drops the language from the bucket key would pair across
    // languages and fails here. The candidate frame is pinned, so the
    // bucket join lives inside an InMemoryRelation — allPlans expands
    // those.
    val equiKeySets = allPlans(plan).collect {
      case j: SortMergeJoinExec => j.leftKeys.map(_.toString)
      case j: ShuffledHashJoinExec => j.leftKeys.map(_.toString)
      case j: BroadcastHashJoinExec => j.leftKeys.map(_.toString)
    }
    val bucketJoins = equiKeySets.filter(_.exists(_.contains("band_val")))
    assert(bucketJoins.nonEmpty,
      s"expected the banded bucket self-join in the plan:\n$plan")
    bucketJoins.foreach { keys =>
      assert(keys.exists(_.contains("predicted_lang")),
        s"bucket join lost the language from its key: $keys\n$plan")
    }
    spark.catalog.clearCache()
  }

  test("q_quality_clf_lang: one keyed aggregate, broadcast totals, native feature hash, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(graft.queries.CurationQueries.qualityClfLang(spark, sf))
    val ps = plan.toString
    assert(ps.contains("fnv_ngrams"),
      s"keyed training must use the native one-pass feature hash:\n$plan")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"per-key rates are keyed aggregates, never a window:\n$plan")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, ps)
    assert(ps.contains("BroadcastHashJoin"),
      s"the per-key totals frame must ride a broadcast join:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_tokenizer_mix: the corpus is never shuffled — counts collapse map-side, thresholds broadcast") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val plan = staticPlan(graft.queries.TextQueries.tokenizerMix(spark, sf))
    val ps = plan.toString
    assert(ps.contains("bpe_encode_bytes"),
      s"the shared-vocab encode must be the native expression:\n$plan")
    assert(routeStoreScans(plan).nonEmpty,
      s"routing must read the published lang_routes store:\n$plan")
    // temperatureMix's only window runs over the ALREADY-AGGREGATED
    // L-row domain-count frame (the documented shape); assert no
    // window consumes a corpus-sized input by checking every window's
    // child is downstream of an aggregate
    val windows = plan.collect { case w: WindowExec => w }
    windows.foreach { w =>
      assert(w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
        }.isDefined,
        s"a window without an aggregate below it consumes the corpus:\n$w")
    }
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, ps)
    assert(ps.contains("BroadcastHashJoin"),
      s"admission thresholds must ride a broadcast join:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_multilingual_decontaminate: eval side broadcasts, corpus never shuffles, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
    val plan = staticPlan(graft.queries.TextQueries.multilingualDecontaminate(spark, sf))
    val ps = plan.toString
    assert(routeStoreScans(plan).nonEmpty,
      s"routing must read the published lang_routes store:\n$plan")
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty, ps)
    // the screen itself: the bad-id set reaches the corpus as a
    // broadcast anti-join (left_anti over a broadcast relation)
    val antiJoins = plan.collect {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antiJoins.nonEmpty,
      s"the contamination screen must be a broadcast anti-join:\n$plan")
    spark.catalog.clearCache()
  }

  test("q_pack_by_lang: one routing/mix pass + L bounded prefix-sum branches, never a corpus window") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    // Stage 1 — the routing/mix pass (everything above the prefix
    // sum's RDD boundary, so it must be pinned HERE; the final plan
    // cannot see it): native feature hash, no window, no cartesian.
    val mixPlan = staticPlan(graft.queries.TextQueries.packByLangMixed(spark, sf))
    val mps = mixPlan.toString
    assert(routeStoreScans(mixPlan).nonEmpty,
      s"routing must read the published lang_routes store:\n$mixPlan")
    assert(mixPlan.collect { case w: WindowExec => w }.isEmpty,
      s"the mix gate is a per-row md5 threshold, never a window:\n$mixPlan")
    assert(mixPlan.collect { case c: CartesianProductExec => c }.isEmpty, mps)
    // Stage 2 — the full query: exactly L language branches under ONE
    // union (each the RDD-backed distributed prefix sum), and no
    // WindowExec anywhere — a global-window rewrite of the pack
    // (sum().over(orderBy) with no partition key: the one-task funnel)
    // fails here.
    val plan = staticPlan(graft.queries.TextQueries.packByLang(spark, sf))
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"the pack is the two-phase prefix sum, never a corpus window:\n$plan")
    val rddScans = plan.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(rddScans.size == 5,
      s"expected L=5 per-language prefix-sum branches, got ${rddScans.size}:\n$plan")
    spark.catalog.clearCache()
  }
}
