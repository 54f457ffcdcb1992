package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (the 100 TB stance, SURVEY §4): these
  * assertions pin the PLAN, not just the result — a regression that
  * flips a broadcast join to a shuffle, drops parquet pushdown, or
  * sneaks a cartesian product into a scale path fails here long before
  * it shows up as a bench number.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q02 filtered scan: predicate and projection reach the parquet reader") {
    val p = plan("q02_filtered_scan")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan.*"), p)
    // projection pruning: the wide lineitem table is read with few columns
    assert(!p.contains("l_comment"), "scan reads pruned column:\n" + p)
  }

  test("q06 dim join broadcasts the dimension side, not the fact") {
    val p = plan("q06_revenue_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q24 MinHash LSH: no cartesian/nested-loop anywhere in the scale path") {
    val p = plan("q24_minhash_lsh")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q32 LSH buckets: equi-join on the bucket key, not a theta join") {
    val p = plan("q32_lsh_buckets")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38 restrict check: the fact table is probed broadcast, never shuffled") {
    // use the tree rendering (parents print above children): no shuffle
    // Exchange may sit between the first BroadcastHashJoin (the lineitem
    // probe) and the lineitem scan below it — the only shuffles allowed
    // are AFTER the distinct key-set reduction
    val p = SparkEntry.queries("q38_restrict_check")(spark, sf)
      .queryExecution.executedPlan.toString
    // exactly one lineitem scan (no accidental double-read), and its
    // nearest enclosing join above it in the tree must be the LeftSemi
    // probe with no shuffle Exchange in between; the distinct's Exchange
    // sits above that join (after the probe in dataflow) — allowed
    val liScan = p.indexOf("lineitem.parquet")
    assert(liScan >= 0 && p.indexOf("lineitem.parquet", liScan + 1) < 0,
      s"expected exactly one lineitem scan:\n$p")
    val probeJoin = p.lastIndexOf("BroadcastHashJoin", liScan)
    assert(probeJoin >= 0, p)
    val joinLine = p.substring(probeJoin, p.indexOf('\n', probeJoin))
    assert(joinLine.contains("LeftSemi"),
      s"nearest join above the lineitem scan is not the semi probe:\n$p")
    val between = p.substring(probeJoin, liScan)
    assert(!between.contains("Exchange hashpartitioning"),
      s"shuffle between the lineitem scan and its probe join:\n$p")
  }

  test("q53 IVF search: centroids and query broadcast; one aggregate shuffle") {
    val p = plan("q53_ivf_topk")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q93 SimHash Hamming: candidates ride the band equi-join — no " +
      "cartesian/nested-loop; verification precedes the distinct") {
    val p = plan("q93_simhash_hamming")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the dedup aggregate must consume the bit_count FILTER's output,
    // not raw band collisions: filter on the join side of the exchange
    val agg = p.indexOf("HashAggregate")
    val flt = p.indexOf("bit_count")
    assert(agg >= 0 && flt >= 0, p)
  }

  test("q98 SemDedup: pair stage is an equi-join on the centroid key, " +
      "no non-broadcast cartesian") {
    val p = plan("q98_semantic_dedup")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q96 PQ search: codebooks/table/shortlist all broadcast; the " +
      "shortlist rides TakeOrderedAndProject; no cartesian") {
    val p = plan("q96_pq_search")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q102 IVF-PQ: the probed-list semi join bounds BOTH reads of the " +
      "corpus (scoring explode and re-rank), everything small broadcast") {
    val p = SparkEntry.queries("q102_ivfpq_search")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange"), p)
    // exactly ONE subspace explode (the PQ scoring pass)...
    assert("Generate".r.findAllIn(p).size == 1,
      s"expected exactly 1 Generate (subspace posexplode):\n$p")
    // ...and the probed-cluster LeftSemi restriction present on BOTH
    // corpus subtrees — dropping it from the scoring side (reverting to
    // a flat-PQ full scan) leaves only the re-rank's copy and fails here
    assert("LeftSemi".r.findAllIn(p).size == 2,
      s"expected the probed-list semi join under scoring AND re-rank:\n$p")
    // the explode consumes the RESTRICTED corpus: its subtree (printed
    // directly below it, depth-first) carries a LeftSemi before any
    // other Generate could appear (there is only one)
    val gen = p.indexOf("Generate")
    assert(p.indexOf("LeftSemi", gen) > gen,
      s"no probed-list restriction below the subspace explode:\n$p")
  }

  test("q107 index serve: the serving plan reads the STORED index only — " +
      "no training, static partition pruning, one shuffle") {
    val p = plan("q107_index_serve")
    // reads the persisted index, not retrained intermediates
    assert(p.contains("graft_ann_index"), p)
    // zero Lloyd iterations / no PQ encode: training and encoding both
    // posexplode the corpus into subspaces — a serving plan with ANY
    // Generate has smuggled training back in
    assert(!p.contains("Generate"), s"subspace explode in serving plan:\n$p")
    // the probe set prunes the codes scan at PLANNING time
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*centroid[^\\]]*IN.*"),
      s"probe filter did not reach PartitionFilters:\n$p")
    // one combining shuffle (the per-vector score aggregation); all else
    // rides broadcasts
    assert("(?<!Broadcast)Exchange \\(".r.findAllIn(p).size == 1,
      s"expected exactly 1 shuffle exchange in serving plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q150 filtered ANN: the label predicate is a PUSHED data filter " +
      "on the stored codes scan, under the static partition pruning — " +
      "no corpus join decides eligibility") {
    val p = plan("q150_filtered_ann")
    // still the stored-index serving shape (q107's gates)
    assert(p.contains("graft_ann_index"), p)
    assert(!p.contains("Generate"), s"training smuggled into serving:\n$p")
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*centroid[^\\]]*IN.*"),
      s"probe filter did not reach PartitionFilters:\n$p")
    // the metadata predicate reaches the codes parquet reader
    assert(p.matches(
      "(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(label,3\\)[^\\]]*\\].*"),
      s"label filter not pushed to the codes scan:\n$p")
    assert("(?<!Broadcast)Exchange \\(".r.findAllIn(p).size == 1,
      s"expected exactly 1 shuffle exchange in serving plan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q155 batch ANN: one stored-codes scan serves the whole batch — " +
      "union probe set prunes partitions, per-query cuts are window " +
      "limits, no training in the plan") {
    val p = plan("q155_batch_ann")
    assert(p.contains("graft_ann_index"), p)
    assert(!p.contains("Generate"), s"training smuggled into serving:\n$p")
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*centroid[^\\]]*IN.*"),
      s"union probe filter did not reach PartitionFilters:\n$p")
    // the shortlist and top-k cuts are per-q_id rank filters pushed to
    // WindowGroupLimit — not global sorts of the scored space
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one scan of the stored codes table feeds the whole batch
    assert("graft_ann_index[^\\n]*codes".r.findAllIn(p).size == 1,
      s"expected exactly 1 stored-codes scan for the batch:\n$p")
  }

  test("q152/q156 global rank: the two-pass range/offset shape — no " +
      "single-partition window anywhere in the plan") {
    for (q <- Seq("q152_shard_pack", "q156_equidepth")) {
      val p = plan(q)
      assert(!p.contains("SinglePartition"),
        s"$q rank degraded to a single-partition window:\n$p")
    }
  }

  test("q158 interval-overlap join: bin equi-join carries the pairs — " +
      "no nested-loop/theta join anywhere") {
    val p = plan("q158_overlap_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q105 hard negatives: bucket equi-join (no cartesian), per-anchor " +
      "top-k pushed below the sort (WindowGroupLimit)") {
    val p = plan("q105_hard_negatives")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q71 stratified sample: per-group limit pushed below the sort " +
      "(WindowGroupLimit), no stratum fully sorted") {
    val p = plan("q71_stratified_sample")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q73 token budget: window and final aggregate share one exchange " +
      "on the stratum key") {
    val p = plan("q73_token_budget")
    // the cumsum window partitions by source; the groupBy(source) after it
    // must reuse that clustering, not shuffle again (the one remaining
    // rangepartitioning exchange is the final tiny ORDER BY)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
  }

  test("q75 gap fill: generated calendar broadcasts; facts shuffle only " +
      "for their aggregate") {
    val p = plan("q75_gap_fill")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q76 fuzzy lookup: per-row argmin — NO join of any kind, one " +
      "exchange for the final aggregate") {
    val p = plan("q76_fuzzy_lookup")
    // the lexicon rides the plan as an array literal (Curation
    // fuzzyNormalize), so there is nothing to join or broadcast — strictly
    // stronger than the broadcast-join gate this replaces
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Join"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange (the 5-group agg):\n$p")
  }

  test("q80 SCD2 islands: every window shares one exchange on user_id") {
    val p = plan("q80_scd2_islands")
    // chg/rn/count/lead all partition by user_id; the island reduction is
    // a filter, not a groupBy — so exactly one hash Exchange in the plan
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
  }

  test("q82 outliers: 5-row stats broadcast back onto the fact side") {
    val p = plan("q82_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q81 collocations: marginals hash-join; only the 1-row total " +
      "rides a broadcast loop join") {
    val p = plan("q81_collocations")
    assert(!p.contains("CartesianProduct"), p)
    // tree line form ("... Cross BuildRight"): formatted mode prints each
    // operator again in the details section, so count tree entries only
    assert("BroadcastNestedLoopJoin Cross".r.findAllIn(p).size == 1,
      s"expected exactly the 1-row-total BNLJ:\n$p")
  }

  test("q79 cohort retention: no cartesian; cohort join is an equi-join") {
    val p = plan("q79_cohort_retention")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q83 tfidf: per-source top-k pushed below the sort (WindowGroupLimit)") {
    val p = plan("q83_tfidf_terms")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q84 snapshot diff: sort-merge full outer, no broadcast of " +
      "table-sized sides") {
    val p = plan("q84_snapshot_diff")
    assert(p.contains("SortMergeJoin FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q91 order stats: cumulative window sorts the distinct-value " +
      "list, never the fact table") {
    val p = plan("q91_order_stats")
    // the only operators under the window must be the (type, v) hash
    // aggregate — i.e. the Sort's child chain contains HashAggregate
    // before any parquet scan line
    val sortIdx = p.indexOf("(1) Scan parquet")
    assert(sortIdx >= 0, p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    // two hash exchanges: (type, v) aggregate + type window/aggregate
    assert("hashpartitioning".r.findAllIn(p).size <= 2,
      s"expected at most 2 hash Exchanges:\n$p")
  }

  test("q92 chunk rebuild: no cartesian, equi-join on doc_id only") {
    val p = plan("q92_chunk_rebuild")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q04 top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q04_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("partitioned writes prune partitions at the scan (PartitionFilters)") {
    // date-partitioned layout — the 100 TB layout for the events feed:
    // a day filter must prune directories, not read-and-filter
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sf)
      .withColumn("day", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val oneDay = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("day") === "2024-01-02")
    val p = oneDay.queryExecution.explainString(FormattedMode)
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"),
      s"day filter did not reach PartitionFilters:\n$p")
    assert(oneDay.count() > 0)
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // InjectRuntimeFilter: with the size thresholds lowered, a selective
    // dim filter should inject bloom_filter_might_contain on the fact
    // scan — the shuffle-reduction mechanism for fact-fact joins at
    // scale where the dim side is too big to broadcast.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the fact side is "large" relative to test data
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      // disable broadcast so the join is a genuine shuffle join (the
      // bloom filter is pointless under a broadcast join)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(spark, sf)
      val ord = Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") ===
          "1-URGENT")
      val joined = li.join(ord,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // complement to operators.Skew's explicit salting: AQE's runtime
    // re-plan must split a hot key's partition without code changes —
    // thresholds lowered so the 190k-row key counts as skew at test size
    import org.apache.spark.sql.functions.{col, when}
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 200000)
        .select(when(col("id") < 190000, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(0, 1000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // execute THIS dataset's queryExecution (count() would plan its own)
      assert(j.collect().length > 0)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot scalar paths stay inside whole-stage codegen") {
    // the refine chain (q34) and winnowing (q49) must not fall back to
    // interpreted eval. AQE's formatted plan hides codegen spans until
    // execution, so run the query and read the FINAL adaptive plan.
    for (q <- Seq("q34_refine_urls", "q49_winnowing")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      // only the Final Plan carries codegen markers (the Initial Plan
      // rendering never shows them)
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // codegen stages render as "*(n) Operator" in the executed plan
      assert(p.contains("*(1)"), s"$q has no codegen stage:\n$p")
      // and the scalar Projects specifically must be inside one
      assert(!p.contains("+- Project ["),
        s"$q has an interpreted Project outside codegen:\n$p")
    }
  }

  test("q112 stored dedup gate: equi-join probes only — no cartesian / " +
      "nested-loop anywhere; archive text can't appear by construction") {
    // The archive-never-rescanned property is STRUCTURAL: DedupIndex.gate
    // takes only (dir, incoming) — there is no archive frame to re-derive
    // from — and DedupSpec proves stored == one-shot behaviorally. The
    // final plan here can't show the index scans at all: the operator's
    // eager localCheckpoints (multi-consumer band/survivor tables)
    // truncate lineage to RDD scans, so this gate pins the join hygiene
    // of the post-checkpoint stages.
    SparkEntry.queries("q112_dedup_index_gate")(spark, sf).count()
    val p = plan("q112_dedup_index_gate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q115 bloom gate: the 1-row bitmap broadcasts (probe is a " +
      "broadcast nested-loop against a SINGLE row, not a shuffle), and " +
      "the exact confirm join runs only behind the maybe_present filter") {
    val p = plan("q115_bloom_gate")
    // the bitmap rides a BroadcastExchange; the 1-row cross join is the
    // one sanctioned BNLJ shape (broadcast singleton — same rule as the
    // corpus-total joins elsewhere)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the confirm semi-join's probe side is the maybe-filtered slice:
    // maybe_present must appear as a Filter condition, not only as output
    assert(p.matches("(?s).*Condition.*maybe_present.*"),
      "maybe filter missing from the confirm path:\n" + p)
    // band-key work stays equi-join: no sort-merge on the tiny key sets
    assert(p.contains("LeftSemi"), p)
  }

  test("q118 z-order audit: pure per-row arithmetic — the only exchange " +
      "is the final tile aggregate; no join of any kind") {
    val p = plan("q118_zorder_layout")
    Seq("Join", "CartesianProduct").foreach(bad =>
      assert(!p.contains(bad), s"unexpected $bad:\n$p"))
    // one hash aggregate pair (partial + final) over the z-bucket
    assert(p.contains("HashAggregate"), p)
  }

  test("q117 CDC chunking: the native cut kernel runs ONCE per row — no " +
      "join, no interpreted HOF filter, no optimizer-inferred generate " +
      "pre-filter re-evaluating the kernel") {
    val p = plan("q117_cdc_chunks")
    Seq("Join", "CartesianProduct", "ArrayFilter").foreach(bad =>
      assert(!p.contains(bad), s"unexpected $bad:\n$p"))
    val kernelCalls = "graft_cdc_cuts".r.findAllIn(p).size
    assert(kernelCalls == 1,
      s"cut kernel must appear exactly once (one eval per row), got $kernelCalls:\n$p")
  }

  test("q120 epoch expansion: explode + per-row keys — the only sort is " +
      "the deterministic training order; no join, no aggregate") {
    val p = plan("q120_epoch_expand")
    Seq("Join", "CartesianProduct", "HashAggregate").foreach(bad =>
      assert(!p.contains(bad), s"unexpected $bad:\n$p"))
    assert(p.contains("Generate"), p) // the epoch explode
  }

  test("q124 BM25: the ranked result is a TakeOrderedAndProject (never a " +
      "global sort), df/tot ride broadcasts, and no cartesian appears " +
      "beyond the 1-row (L,N) broadcast") {
    val p = plan("q124_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastExchange") || p.contains("Broadcast"), p)
  }

  test("q127 stored-index BM25: the serving plan never touches the corpus " +
      "text — no Generate (no explode/split), the term predicate is PUSHED " +
      "to the postings scan, and the ranked result is a " +
      "TakeOrderedAndProject") {
    val p = plan("q127_text_index_serve")
    assert(!p.contains("Generate"),
      s"serving plan re-derived postings from text:\n$p")
    assert(p.contains("PushedFilters: [In(term"),
      s"term predicate not pushed to the postings scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q332 served bitext mining: candidates ride the stored-cell " +
      "equi-join — the serving plan reads the persisted assignment, no " +
      "training (no Generate), no cartesian, no corpus-by-corpus " +
      "nested loop") {
    // the composed operator checkpoints its candidate table (read by
    // four window branches), which truncates lineage — pin the
    // candidate stage's own plan, then the composed tail
    val e = Tables.embeddings(spark, sf)
    import org.apache.spark.sql.functions.col
    val cents = e.filter(col("vec_id") % 128 === 0)
      .select(col("vec_id").as("c_id"),
        graft.operators.Similarity.vecD(col("embedding")).as("cv"))
    val dir = graft.operators.AnnIndex.defaultDir(sf + "#cells128")
    graft.operators.AnnIndex.buildIfAbsent(e, "vec_id", "embedding",
      cents, m = 1, subDim = 64, ksub = 1, iters = 0,
      dir = dir, corpusTag = sf + "#cells128")
    val cand = graft.operators.Similarity.marginServedCandidates(
        spark, dir, e.filter(col("label") < 5),
        e.filter(col("label") >= 5), "vec_id", "embedding", 0L)
      .queryExecution.explainString(FormattedMode)
    // the stored assignment parquet is the candidate structure
    assert(cand.contains("graft_ann_index"),
      s"candidate stage does not read the stored index:\n$cand")
    // training/encoding posexplode the corpus — any Generate means the
    // build smuggled itself into the serve plan
    assert(!cand.contains("Generate"), s"training in serving plan:\n$cand")
    assert(!cand.contains("CartesianProduct"), cand)
    assert(!cand.contains("BroadcastNestedLoopJoin"),
      s"candidate pairing must be an equi-join on the cell key:\n$cand")
    val p = plan("q332_bitext_served")
    assert(!p.contains("Generate"), s"training in composed tail:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q126 phrase search: one generate, two aggregates, ZERO joins — " +
      "the anchor-vote form never pairs rows") {
    val p = plan("q126_phrase_search")
    assert(!p.contains("Join"), s"phrase search grew a join:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("q122/q123 postings: exactly one aggregate exchange (token " +
      "groupBy); the corpus text never shuffles twice") {
    Seq("q122_postings", "q123_positional_index").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join:\n$p")
      val shuffles = "hashpartitioning".r.findAllIn(p).size
      assert(shuffles == 1,
        s"$q expected exactly 1 hash exchange, got $shuffles:\n$p")
    }
  }

  test("q134 profile: ONE pass — a single scan of documents feeds every " +
      "per-column aggregate (Expand, not repeated scans)") {
    val p = plan("q134_profile")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"profile re-scans the table ($scans scans):\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q135 CMS: the dxw sketch broadcasts to the probe side — point " +
      "estimates never shuffle the sketch") {
    val p = plan("q135_cms_freq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q136 skyline: no global single-partition sort — the only " +
      "unpartitioned window runs over the bucket summary aggregate") {
    val p = plan("q136_skyline")
    // the frontier path's big-table window is partitioned by bucket;
    // SinglePartition exchanges may exist only for the tiny bucket
    // summary (fed by an aggregate, not a raw scan) and the final sort
    assert(p.matches("(?s).*windowspecdefinition\\(_bkt#\\d+L, n_chars.*"),
      "per-bucket window missing:\n" + p)
    assert(p.contains("BroadcastExchange"), "bucket summary must broadcast:\n" + p)
  }

  test("q140 fuzzy join: blocks make it an equi-join — no cartesian, no " +
      "nested loop, histogram gate sits under the join") {
    val p = plan("q140_fuzzy_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("levenshtein"), p)
  }

  test("q141 containment: prefix-side candidates ride equi-joins only") {
    val p = plan("q141_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q139 matview serve: the serving plan scans STORED state only — " +
      "no events scan, no re-aggregation of history") {
    val p = plan("q139_matview_cdc")
    assert(!p.contains("events.parquet"),
      "serving plan must not read the fact table:\n" + p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected only the state scan, got $scans:\n$p")
  }

  test("q165 priority sample: top-(k+1) is TakeOrderedAndProject (heap), " +
      "never a global sort of the corpus") {
    val p = plan("q165_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q166 kmv quantiles: one map-side-combining aggregate, no joins") {
    val p = plan("q166_kmv_quantiles")
    assert(!p.contains("Join"), s"sketch profiling must be join-free:\n$p")
    // partial + final aggregation around exactly one hash exchange
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
  }

  test("q170 survivorship: both attribute windows and the final groupBy " +
      "share ONE exchange on the key") {
    val p = plan("q170_survivorship")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q172 target encode: only the 1-row global-stats frame rides a " +
      "broadcast loop; the fact table is never joined") {
    val p = plan("q172_target_encode")
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin Cross".r.findAllIn(p).size == 1,
      s"expected exactly the 1-row-stats BNLJ:\n$p")
  }

  test("q174 heavy hitters: the exact rescan restricts by BROADCAST of " +
      "the <=k candidates — no shuffle join against the fact") {
    val p = plan("q174_heavy_exact")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q173 weighted median: the total and cumulative windows share " +
      "ONE exchange on the group key") {
    val p = plan("q173_weighted_median")
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q204 sequence support: the pair frame is an equi-join on the " +
      "user key — no cartesian, no nested loop against the spans") {
    val p = plan("q204_seq_support")
    assert(!p.contains("CartesianProduct"), p)
    // the only BNLJ allowed is the 1-row user-count broadcast
    assert("BroadcastNestedLoopJoin Cross".r.findAllIn(p).size <= 1, p)
  }

  test("q192 temporal split: pure per-row arithmetic — the only " +
      "exchange is the final grouped report") {
    val p = plan("q192_temporal_split")
    assert(!p.contains("Join"), p)
    assert("hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly 1 hash Exchange:\n$p")
  }

  test("q220 LM serving: the train corpus appears nowhere — exactly " +
      "one documents scan (the probe batch) plus the stored bigram " +
      "model") {
    val p = plan("q220_lm_index_serve")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected only the probe's documents scan:\n$p")
    assert(p.contains("bigrams"),
      s"stored bigram model not in the serving plan:\n$p")
  }

  test("q335 trigram-LM serving: the train corpus appears nowhere — " +
      "exactly one documents scan (the probe batch) plus the stored " +
      "trigram table feeding every backoff level") {
    val p = plan("q335_trigram_index_serve")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected only the probe's documents scan:\n$p")
    assert(p.contains("trigrams"),
      s"stored trigram model not in the serving plan:\n$p")
  }

  test("q343 Kneser-Ney serving: the SHARED stored trigram table feeds " +
      "the KN derivation too — the train corpus appears nowhere (the " +
      "q335 gate extended to the second smoothing tier)") {
    val p = plan("q343_kn_trigram_serve")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected only the probe's documents scan:\n$p")
    assert(p.contains("trigrams"),
      s"stored trigram model not in the serving plan:\n$p")
    // the probe's own trigram explode is legitimate (and shares the
    // HOF shape a train pass would use), so the load-bearing assertion
    // is the single documents scan above: every KN level (context
    // totals, continuation counts, unigram types) must derive from the
    // stored table, never a second corpus read
  }

  test("q357 bucket-pruned BQ serving: the shortlist rides the probe " +
      "equi-join on the bucket key — the ONLY nested-loop join is the " +
      "k-row re-rank broadcast (q327's full-table cross shape is gone)") {
    val p = plan("q357_bq_multiprobe_serve")
    assert(p.contains("_bkt"),
      s"bucket join key missing — shortlist not probe-pruned:\n$p")
    // count NODES, not mentions: formatted plans print each operator
    // twice (tree line + "(N) Op" detail header)
    val nlj = "\\(\\d+\\) BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 1,
      s"expected at most the re-rank nested loop, found $nlj:\n$p")
  }

  test("q367 probe escalation: BOTH rungs keep the bucket equi-join " +
      "shape — the flips=2 pair-probe set explodes QUERY-side " +
      "(sequence over the C(bits,2) pair index) and never degrades " +
      "to a corpus-side fan-out or cartesian") {
    val p = plan("q367_bq_probe_escalation")
    // the probe arrays' sequence(...) literals constant-fold to
    // UnsafeArrayData, so gate on the structural shapes instead
    assert(p.contains("Left keys [1]: [_bkt"),
      s"bucket EQUI-join missing — shortlists not probe-pruned:\n$p")
    assert(p.contains("explode(transform("),
      s"flips=1 query-side probe explode missing:\n$p")
    assert(p.contains("explode(concat(transform(") &&
      p.contains("filter(") && p.contains("div 8)"),
      s"flips=2 pair-probe explode (concat + pair-index filter) " +
        s"missing:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"escalation must not introduce a cartesian:\n$p")
  }

  test("q339/q341 paired k-sample tests: every window is partitioned " +
      "BY BLOCK — no corpus-sized single partition anywhere") {
    Seq("q339_friedman", "q341_cochran_q").foreach { q =>
      val p = plan(q)
      // 1-row global aggregates legitimately combine via
      // SinglePartition; the dangerous shape is a WINDOW with an empty
      // partition spec (whole-corpus sort on one task). Formatted
      // Window details print Arguments: [exprs], [partition], [order] —
      // an empty partition spec renders as ", [], [".
      val windows = p.split("\n\n").filter(b =>
        b.linesIterator.nextOption.exists(_.matches("\\(\\d+\\) Window.*")))
      assert(windows.nonEmpty, s"$q plan lost its rank windows:\n$p")
      windows.foreach { b =>
        assert(!b.contains(", [], ["),
          s"$q has an unpartitioned (single-task) window:\n$b")
      }
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("q337 phrase blocklist: ONE corpus scan, zero joins — the " +
      "whole policy matches in a single codegen'd automaton pass") {
    val p = plan("q337_phrase_blocklist")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected exactly one corpus scan:\n$p")
    assert(!p.contains("Join"),
      s"phrase gate grew a join (per-phrase scans?):\n$p")
    assert(!p.contains("Generate"),
      s"phrase gate exploded tokens (second text pass?):\n$p")
    // codegen markers only render in the executed plan ("*(n) Op" —
    // the hot-scalar-paths test's device)
    val df = SparkEntry.queries("q337_phrase_blocklist")(spark, sf)
    df.collect()
    val ex = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the text-sized work (the AC scan itself) must be inside a codegen
    // stage; the downstream fold over the |phrases|-element count array
    // uses HOFs (CodegenFallback in Spark) — array-sized, acceptable
    val acLine = ex.linesIterator
      .find(_.contains("graft_ac_counts")).getOrElse("")
    assert(acLine.contains("*("),
      s"the AC scan projection fell out of codegen:\n$ex")
  }

  test("q209 phrase serving: zero corpus scans — the plan reads ONLY " +
      "stored positional postings with the phrase terms pushed to the " +
      "parquet reader") {
    val p = plan("q209_phrase_index_serve")
    assert(!p.contains("documents.parquet"),
      s"serving plan still scans the corpus:\n$p")
    assert(p.contains("pospostings"),
      s"stored positional postings not in the plan:\n$p")
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(term.*"),
      s"phrase terms not pushed to the postings scan:\n$p")
  }

  test("q207 vocab growth: the whole ladder costs ONE corpus scan — " +
      "a linear pipeline through the bucket×token aggregate, rungs " +
      "attached by a broadcast range-join") {
    val p = plan("q207_vocab_growth")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected exactly one documents scan for the 5-rung ladder:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"rung spine not attached as a broadcast range-join:\n$p")
  }

  test("q208 text extraction: per-row string kernels — no join, no " +
      "exchange before the presentation sort, projection pruned") {
    val p = plan("q208_extract_text")
    assert(!p.contains("Join"), p)
    assert(!p.contains("hashpartitioning"),
      s"unexpected hash exchange in a per-row kernel:\n$p")
    // only doc_id and text feed the page synthesis — lang/source pruned
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan reads pruned columns:\n$p")
  }

  test("q293 line-index serving: the corpus appears once (the batch " +
      "being cleaned) and frequencies come from the stored lines " +
      "table — the archive is never re-counted in-plan") {
    val p = plan("q293_line_index_serve")
    val first = p.indexOf("documents.parquet")
    assert(first >= 0 && p.indexOf("documents.parquet", first + 1) < 0,
      s"expected only the batch's documents scan:\n$p")
    assert(p.contains("lines"),
      s"stored line-frequency table not in the serving plan:\n$p")
  }

  test("q288 staleness audit: zero training jobs — one embeddings " +
      "scan (the batch) assigned against stored centroids, stored " +
      "codes aggregated, no Lloyd iteration artifacts") {
    val p = plan("q288_index_staleness")
    val first = p.indexOf("embeddings.parquet")
    assert(first >= 0 && p.indexOf("embeddings.parquet", first + 1) < 0,
      s"expected only the batch's embeddings scan:\n$p")
    assert(p.contains("codes"),
      s"stored codes not in the audit plan:\n$p")
    // r13: stored centroids are READ by a separate bounded job (the
    // codebook-sized collect in ivfAssign) and inlined as a literal, so
    // the audit plan itself carries no centroid scan and no join for the
    // assignment — pin the stronger property instead: the batch side
    // reaches the full-outer compare without ANY join below it
    assert(!p.contains("BroadcastHashJoin"),
      s"assignment must be a per-row map, not a broadcast join:\n$p")
  }

  test("q294 distortion audit: zero training jobs — one embeddings " +
      "scan against stored codebooks and codes") {
    val p = plan("q294_codebook_distortion")
    val first = p.indexOf("embeddings.parquet")
    assert(first >= 0 && p.indexOf("embeddings.parquet", first + 1) < 0,
      s"expected only the corpus scan:\n$p")
    assert(p.contains("codebooks"),
      s"stored codebooks not in the audit plan:\n$p")
    assert(p.contains("codes"),
      s"stored codes not in the audit plan:\n$p")
  }

  test("q378 HRW placement: pure projection — pruned 2-column scan, " +
      "no join, one aggregate exchange") {
    val p = plan("q378_hrw_shard_balance")
    // the placement function is per-row arithmetic: no lookup table
    // means no join of ANY kind in the plan
    assert(!p.contains("Join"), s"placement must not join:\n$p")
    // column pruning: documents is read as (doc_id, n_chars) only —
    // the wide text column never leaves the reader
    assert(p.matches(
      "(?s).*ReadSchema: struct<doc_id:bigint,n_chars:bigint>.*"),
      s"scan not pruned to (doc_id, n_chars):\n$p")
  }

  test("q389 stored-ANALYZE serve: the join-size estimate reads the " +
      "stored cells only — the described table is NOT in the plan") {
    val p = plan("q389_stats_index_serve")
    assert(p.contains("graft_stats_index"),
      s"stored cells not in the serve plan:\n$p")
    assert(!p.contains("events.parquet"),
      s"serve plan touches the described table:\n$p")
  }

  test("q400 broadcast-advised join: the stored-count hint lands as a " +
      "BroadcastHashJoin with the dimension side built") {
    val p = plan("q400_broadcast_advised_join")
    assert(p.contains("BroadcastHashJoin"),
      s"the stored 25-row nation count must pre-plan a broadcast:\n$p")
  }

  test("q394 sketch join order: the ORDER DECISION reads stored cells " +
      "only — no base table of the chain is in the serve plan") {
    val p = plan("q394_sketch_join_order")
    assert(p.contains("graft_stats_index"),
      s"stored cells not in the serve plan:\n$p")
    for (t <- Seq("orders.parquet", "lineitem.parquet",
        "customer.parquet"))
      assert(!p.contains(t),
        s"the join-order decision must cost 4 d×w artifacts, not a " +
          s"scan of $t:\n$p")
  }
}
