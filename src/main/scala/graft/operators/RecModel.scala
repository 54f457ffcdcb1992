package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recommender-model LIFECYCLE — train once, persist, serve many: the
  * [[AnnIndex]]/[[TextIndex]] move applied to the item-item
  * co-occurrence recommender that q201/q244 train in-query. At scale
  * the interaction log is the 100 TB object; the MODEL is not — the
  * degree-capped co-occurrence table is bounded by capM²·|users| pair
  * generation and collapses to ≤ capM·|items| retained similarities —
  * so serving must read the stored model and NEVER the log. (Reference
  * precedent: the archive's precomputed-state-reused probe shape,
  * `cmds/archive.py:126-129`.)
  *
  *  - [[build]]: one [[Graph.coOccurrence]] pass over (user, item)
  *    interactions → two stored relations: `sims` (anchor → neighbor
  *    with n_users, BOTH directions materialized so serving is a single
  *    equi-join — the denormalize-at-build trade [[TextIndex]] makes
  *    for df/dl), range-partitioned + sorted by anchor for row-group
  *    pruning; and `anchors` (user → that user's strongest train item,
  *    w desc / item asc — the per-user serving state).
  *  - [[buildIfAbsent]]: fingerprint guard, the build-once half — bench
  *    repeats and re-verification never retrain.
  *  - [[serveTopK]]: stored anchors ⋈ stored sims, one per-user rank
  *    window, top-k — model-sized I/O, zero interaction-log reads.
  */
object RecModel {

  private val FormatVersion = 1

  def defaultDir(tag: String): String =
    "/tmp/graft_rec_model/" + tag.replaceAll("[^A-Za-z0-9._-]", "_")

  private def metaPath(dir: String) =
    java.nio.file.Paths.get(dir, "_graft_rec_meta.json")

  private def fingerprint(tag: String): String =
    s"""{"version":$FormatVersion,"model":"$tag"}"""

  def simsPath(dir: String): String = s"$dir/sims"
  def anchorsPath(dir: String): String = s"$dir/anchors"

  /** Train the co-occurrence model and persist sims + anchors. */
  def build(interactions: DataFrame, userCol: String, itemCol: String,
      capM: Int, minCount: Long, dir: String): Unit = {
    val pairs = Graph.coOccurrence(interactions, userCol, itemCol,
      capM, minCount)
    val sym = pairs
      .select(col("item_a").as("anchor"), col("item_b").as("nb"),
        col("n_users"))
      .unionByName(pairs.select(col("item_b").as("anchor"),
        col("item_a").as("nb"), col("n_users")))
    sym.repartitionByRange(col("anchor"))
      .sortWithinPartitions(col("anchor"), col("n_users").desc,
        col("nb"))
      .write.mode("overwrite").parquet(simsPath(dir))
    import org.apache.spark.sql.expressions.Window
    interactions
      .groupBy(col(userCol), col(itemCol))
      .agg(count(lit(1)).as("_w"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(userCol))
          .orderBy(col("_w").desc, col(itemCol).asc)))
      .filter(col("_rn") === 1)
      .select(col(userCol), col(itemCol).as("anchor"))
      .write.mode("overwrite").parquet(anchorsPath(dir))
  }

  /** [[build]] unless a fingerprint-matching model already exists. */
  def buildIfAbsent(interactions: DataFrame, userCol: String,
      itemCol: String, capM: Int, minCount: Long, dir: String,
      tag: String): Unit = {
    val fp = fingerprint(tag)
    val meta = metaPath(dir)
    val fresh = java.nio.file.Files.exists(meta) &&
      java.nio.file.Files.readString(meta) == fp
    if (!fresh) {
      build(interactions, userCol, itemCol, capM, minCount, dir)
      java.nio.file.Files.createDirectories(meta.getParent)
      java.nio.file.Files.writeString(meta, fp)
    }
  }

  /** Stored anchors ⋈ stored sims → per-user top-k recommendations
    * (n_users desc, nb asc — the q201/q244 ranking), as
    * (userCol, nb, rk). Model-sized: no interaction-log input. */
  def serveTopK(spark: SparkSession, dir: String, userCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = spark.read.parquet(anchorsPath(dir))
    val sims = spark.read.parquet(simsPath(dir))
    anchors.join(sims, Seq("anchor"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(userCol))
          .orderBy(col("n_users").desc, col("nb"))))
      .filter(col("rk") <= k)
      .select(col(userCol), col("nb"), col("rk"))
  }
}
