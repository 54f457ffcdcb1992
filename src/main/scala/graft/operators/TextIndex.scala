package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-retrieval index LIFECYCLE — build once, persist, serve many: the
  * [[AnnIndex]] move applied to the BM25 path. [[Curation.bm25TopK]]
  * composes the right serving plan but re-derives tf/df/dl from the raw
  * corpus inside every query; at scale, index construction is an offline
  * stage and serving must read STORED postings (the reference's
  * skip-if-archived probe, `cmds/archive.py:126-129`, is the same
  * precomputed-state-reused shape).
  *
  *  - [[build]] / [[buildIfAbsent]]: one pass over the corpus → a FULLY
  *    DENORMALIZED postings relation (term, doc_id, tf, dl, df) written
  *    range-partitioned + sorted by term (term predicates prune parquet
  *    row groups via min/max stats — the flat-file analogue of q107's
  *    hive-partitioned codes; a directory per term would be the wrong
  *    layout at vocabulary scale), plus a 1-row (L, N) stats table and a
  *    fingerprint (`_graft_index_meta.json`) making rebuilds idempotent.
  *    Denormalizing dl and df into each posting costs 2 longs/row and
  *    removes BOTH serving-time joins — the impact-file trade every
  *    production engine takes.
  *  - [[serveBm25]]: scan postings with the term predicate PUSHED to the
  *    scan, broadcast the 1-row stats, score with [[Curation.bm25Rank]]
  *    (the exact expression tree [[Curation.bm25TopK]] uses — shared
  *    code, so stored-path scores are bit-identical by construction),
  *    one combining exchange on doc, TakeOrderedAndProject. The corpus
  *    text is NEVER read: no split, no explode, no Generate in the plan
  *    (plan-pinned in PlanQualitySpec).
  *
  * Scale: postings are the corpus's (doc, term) distinct pairs — large,
  * but the only table serving touches, and only the probed terms' row
  * groups at that. Stopword-class terms are the documented skew: cap or
  * drop df > threshold terms at build (they carry no BM25 signal — idf
  * ≈ 0) exactly as [[Curation.invertedIndex]]'s contract states.
  */
object TextIndex {

  /** Bump when the on-disk layout or scoring semantics change. */
  private val FormatVersion = 1

  def postingsPath(dir: String) = s"$dir/postings"
  def statsPath(dir: String)    = s"$dir/stats"
  private def metaPath(dir: String) = s"$dir/_graft_index_meta.json"

  /** Per-corpus location, one directory per corpus tag (same contract as
    * [[AnnIndex.defaultDir]] — concurrent scale factors never clobber). */
  def defaultDir(corpusTag: String): String =
    "/tmp/graft_text_index/" + corpusTag.replaceAll("[^A-Za-z0-9._-]", "_")

  private def fingerprint(corpus: String): String =
    s"""{"version":$FormatVersion,"corpus":"$corpus"}"""

  /** One corpus pass → postings + stats on disk. Whitespace tokenization
    * with empty tokens dropped, the convention every text operator here
    * shares ([[Curation.invertedIndex]], q83, q104). */
  def build(df: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    val words = split(col(textCol), " ")
    val dl = df.select(col(idCol),
      size(filter(words, w => length(w) > 0)).cast("long").as("dl"))
    dl.agg(sum(col("dl")).as("_L"), count(lit(1)).as("_N"))
      .coalesce(1).write.mode("overwrite").parquet(statsPath(dir))
    val hits = df.select(col(idCol), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    hits.join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .select(col("term"), col(idCol), col("tf"), col("dl"), col("df"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"), col(idCol))
      .write.mode("overwrite").parquet(postingsPath(dir))
  }

  /** Run `work` unless `dir`'s fingerprint already records `tag` — the
    * idempotence guard shared by [[buildIfAbsent]] and callers composing
    * build + [[mergeBatch]] sequences (a repeated invocation must not
    * re-apply a merge: postings are state, not a view). */
  def withFingerprint(dir: String, tag: String)(work: => Unit): Unit = {
    val fp = fingerprint(tag)
    val meta = java.nio.file.Paths.get(metaPath(dir))
    val fresh = java.nio.file.Files.exists(meta) &&
      java.nio.file.Files.readString(meta) == fp
    if (!fresh) {
      work
      java.nio.file.Files.createDirectories(meta.getParent)
      java.nio.file.Files.writeString(meta, fp)
    }
  }

  /** [[build]] unless a fingerprint-matching index already exists — the
    * build-once half: bench repeats and re-verification skip the corpus
    * pass entirely. */
  def buildIfAbsent(df: DataFrame, idCol: String, textCol: String,
      dir: String, corpusTag: String): Unit =
    withFingerprint(dir, corpusTag) { build(df, idCol, textCol, dir) }

  /** Incremental maintenance: fold a NEW document batch into the stored
    * index without re-reading the old corpus — the ops-side reason the
    * denormalization is (tf, dl, df) and not a join: tf and dl are
    * per-(doc, term) facts that never change once written, so the only
    * stored rows a batch touches are the df counters of terms THE BATCH
    * CONTAINS (one left join against the batch's term-df table; rows of
    * unseen terms pass through byte-identical), plus the 1-row stats.
    * Contract: batch doc ids are NEW (disjoint from the indexed corpus)
    * — an id-overwriting upsert is [[build]]'s job, not a merge's.
    *
    * At this fixture scale the whole postings relation is rewritten;
    * at 100 TB the same plan applies per term-range partition, and only
    * ranges containing batch terms are rewritten (the write is already
    * range-partitioned by term to make that split natural). The merged
    * frames are eagerly materialized (localCheckpoint) BEFORE the
    * overwrite — Spark cannot atomically overwrite its own input. */
  def mergeBatch(spark: SparkSession, batch: DataFrame, idCol: String,
      textCol: String, dir: String): Unit = {
    import org.apache.spark.sql.types._
    val stored = spark.read.schema(StructType(Seq(
        StructField("term", StringType), StructField(idCol, LongType),
        StructField("tf", LongType), StructField("dl", LongType),
        StructField("df", LongType))))
      .parquet(postingsPath(dir))
    val stats = spark.read.schema(StructType(Seq(
        StructField("_L", LongType), StructField("_N", LongType))))
      .parquet(statsPath(dir))

    val words = split(col(textCol), " ")
    val bdl = batch.select(col(idCol),
      size(filter(words, w => length(w) > 0)).cast("long").as("dl"))
    val bhits = batch.select(col(idCol), explode(words).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val bdf = bhits.groupBy(col("term")).agg(count(lit(1)).as("bdf"))

    // stored df per term, read once from the postings themselves (df is
    // constant within a term by construction — max is just a reader)
    val sdf = stored.groupBy(col("term")).agg(max(col("df")).as("sdf"))
    val mergedPostings = stored.drop("df")
      .join(broadcast(bdf), Seq("term"), "left")
      .join(sdf, Seq("term")) // vocab-sized: no broadcast hint, AQE picks
      .select(col("term"), col(idCol), col("tf"), col("dl"),
        (col("sdf") + coalesce(col("bdf"), lit(0L))).as("df"))
      .unionByName(bhits
        .join(bdl, Seq(idCol))
        .join(broadcast(bdf), Seq("term"))
        .join(sdf, Seq("term"), "left")
        .select(col("term"), col(idCol), col("tf"), col("dl"),
          (col("bdf") + coalesce(col("sdf"), lit(0L))).as("df")))
      .localCheckpoint(true)
    val mergedStats = stats.crossJoin(broadcast(
        bdl.agg(sum(col("dl")).as("_bL"), count(lit(1)).as("_bN"))))
      .select((col("_L") + col("_bL")).as("_L"),
        (col("_N") + col("_bN")).as("_N"))
      .localCheckpoint(true)

    mergedPostings
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"), col(idCol))
      .write.mode("overwrite").parquet(postingsPath(dir))
    mergedStats.coalesce(1).write.mode("overwrite").parquet(statsPath(dir))
  }

  /** BM25 top-k from the STORED index: postings scan (term predicate
    * pushed — only the query terms' row groups are decoded), 1-row stats
    * broadcast, [[Curation.bm25Rank]]'s shared scoring tail. Explicit
    * schemas: the format is ours and versioned, so serving never pays
    * per-query footer inference (the [[AnnIndex.serve]] convention). */
  def serveBm25(spark: SparkSession, dir: String, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val postings = spark.read.schema(StructType(Seq(
        StructField("term", StringType), StructField(idCol, LongType),
        StructField("tf", LongType), StructField("dl", LongType),
        StructField("df", LongType))))
      .parquet(postingsPath(dir))
    val stats = spark.read.schema(StructType(Seq(
        StructField("_L", LongType), StructField("_N", LongType))))
      .parquet(statsPath(dir))
    Curation.bm25Rank(
      postings.filter(col("term").isin(terms: _*))
        .crossJoin(broadcast(stats)),
      idCol, k)
  }
}
