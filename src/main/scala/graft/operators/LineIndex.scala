package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [NS] Line-frequency INDEX lifecycle — the stored-artifact treatment
  * ([[AnnIndex]]/[[TextIndex]]/[[LmIndex]]/[[DedupIndex]]) applied to
  * the C4 global-repetition boilerplate stage. [[Curation
  * .dedupCorpusLines]] recounts every line's document frequency from
  * the whole corpus inside every run; at 100 TB the corpus-wide count
  * table is exactly the thing to build ONCE and probe forever — a new
  * crawl batch needs the archive's line frequencies, not the archive.
  *
  *  - [[build]] / [[buildIfAbsent]]: one corpus pass → (_h = md5(line),
  *    _nd = distinct-doc count), range-partitioned and sorted by _h (a
  *    probe's line hashes prune row groups on the sort key). Stored
  *    rows are line-vocabulary-sized, not corpus-sized.
  *  - [[mergeBatch]]: fold a batch of NEW documents in without
  *    re-reading the archive. Batches must be doc-DISJOINT (each
  *    document's lines arrive in exactly one batch — the [[RecModel]]
  *    disjoint-user contract); then per-line distinct-doc counts are
  *    SUMS and the merge is [[LmIndex]]'s left-join + batch-only-
  *    remainder fold under [[TextIndex]]'s generation pointer with the
  *    replayed-epoch no-op guard.
  *  - [[serve]]: clean an incoming batch from the STORED table only —
  *    the archive appears nowhere in the plan. A line the index has
  *    never seen coalesces to zero stored docs and is KEPT (fresh
  *    content is not boilerplate). Built on corpus C and served ON C,
  *    the output is identical to `dedupCorpusLines(C)` by shared-tail
  *    construction ([[Curation.cleanFromLineFreq]]) — q293's oracle is
  *    q227's verbatim.
  */
object LineIndex {

  def tablePath(dir: String): String = {
    val (g, _) = TextIndex.current(dir)
    s"${TextIndex.genDir(dir, g.max(0L))}/lines"
  }

  def defaultDir(corpusTag: String): String =
    "/tmp/graft_line_index/" + corpusTag.replaceAll("[^A-Za-z0-9._-]", "_")

  private def writeGen(freq: DataFrame, dir: String, gen: Long): Unit =
    freq.repartitionByRange(col("_h"))
      .sortWithinPartitions(col("_h"))
      .write.mode("overwrite")
      .parquet(s"${TextIndex.genDir(dir, gen)}/lines")

  /** One corpus pass → (_h, _nd) as generation 0. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    writeGen(Curation.lineFrame(corpus, idCol, textCol)
      .groupBy(col("_h")).agg(countDistinct(col(idCol)).as("_nd")),
      dir, 0L)
    TextIndex.advance(dir, 0L, -1L)
  }

  /** [[build]] unless a fingerprint-matching table exists. */
  def buildIfAbsent(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, corpusTag: String): Unit =
    TextIndex.withFingerprint(dir, corpusTag) {
      build(corpus, idCol, textCol, dir)
    }

  def storedFreq(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.read.schema(StructType(Seq(
        StructField("_h", StringType), StructField("_nd", LongType))))
      .parquet(tablePath(dir))
  }

  /** Fold a doc-disjoint NEW batch into the stored table: distinct-doc
    * counts are sums under the disjointness contract, so untouched
    * lines pass through byte-identical and colliding lines add.
    * `epoch` ≥ 0 arms the replayed-delivery no-op guard. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String, epoch: Long = -1L,
      fenceTag: String = ""): Unit = {
    val (gen, _) = TextIndex.current(dir)
    val lastEpoch = TextIndex.fenceOf(dir, fenceTag)
    require(gen >= 0,
      s"LineIndex.mergeBatch: no index at $dir — build() first")
    if (epoch >= 0 && epoch <= lastEpoch) return
    val bc = Curation.lineFrame(batch, idCol, textCol)
      .groupBy(col("_h")).agg(countDistinct(col(idCol)).as("_bnd"))
      .localCheckpoint(true)
    val stored = storedFreq(spark, dir)
    val merged = stored
      .join(bc, Seq("_h"), "left")
      .select(col("_h"),
        (col("_nd") + coalesce(col("_bnd"), lit(0L))).as("_nd"))
      .unionByName(bc
        .join(stored.select(col("_h"), lit(1).as("_seen")),
          Seq("_h"), "left_anti")
        .select(col("_h"), col("_bnd").as("_nd")))
    TextIndex.withGenClaim(dir, gen) {
      writeGen(merged, dir, gen + 1)
      TextIndex.advance(dir, gen + 1, epoch.max(lastEpoch), fenceTag,
        basedOnGen = gen)
    }
  }

  /** Right-to-be-forgotten removal: distinct-doc line counts are sums
    * under doc-disjointness, so forgetting documents is the exact
    * inverse of [[mergeBatch]] — subtract the removed docs' per-line
    * document counts, drop rows that reach zero. The batch must be a
    * subset of what was indexed (guarded); `epoch` arms the replay
    * no-op guard (subtraction is not idempotent without it). The
    * forget law (decremental ≡ rebuild-on-the-remaining) extended to
    * the line-frequency artifact. */
  def removeBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String, epoch: Long = -1L,
      fenceTag: String = ""): Unit = {
    val (gen, _) = TextIndex.current(dir)
    val lastEpoch = TextIndex.fenceOf(dir, fenceTag)
    require(gen >= 0,
      s"LineIndex.removeBatch: no index at $dir — build() first")
    if (epoch >= 0 && epoch <= lastEpoch) return
    val bc = Curation.lineFrame(batch, idCol, textCol)
      .groupBy(col("_h")).agg(countDistinct(col(idCol)).as("_bnd"))
      .localCheckpoint(true)
    val stored = storedFreq(spark, dir)
    val merged = stored
      .join(bc, Seq("_h"), "left")
      .select(col("_h"),
        (col("_nd") - coalesce(col("_bnd"), lit(0L))).as("_nd"))
    val bad = merged.filter(col("_nd") < 0).count()
    require(bad == 0,
      s"LineIndex.removeBatch: $bad line counts would go negative — " +
        "the removal batch is not a subset of the indexed corpus")
    TextIndex.withGenClaim(dir, gen) {
      writeGen(merged.filter(col("_nd") > 0), dir, gen + 1)
      TextIndex.advance(dir, gen + 1, epoch.max(lastEpoch), fenceTag,
        basedOnGen = gen)
    }
  }

  /** [NS] — Structured Streaming ingest hook: each doc-disjoint
    * micro-batch folds into the stored table via [[mergeBatch]] with
    * batchId as the epoch, so checkpoint-replayed deliveries are
    * no-ops (the [[RecModel.foreachBatchMerge]] protocol). */
  def foreachBatchMerge(spark: SparkSession, dir: String, idCol: String,
      textCol: String, streamTag: String = ""): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      mergeBatch(spark, batch, idCol, textCol, dir, epoch = batchId,
        fenceTag = streamTag)

  /** Clean `batch` against the STORED line frequencies only — zero
    * archive scans in the plan; unseen lines are kept. */
  def serve(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String, maxDocs: Long): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    Curation.cleanFromLineFreq(
      Curation.lineFrame(batch, idCol, textCol),
      storedFreq(spark, dir), idCol, maxDocs)
  }
}
