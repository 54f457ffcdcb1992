package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's write semantics (SURVEY §2.4 W1-W8) as MERGE-shaped
  * DataFrame algebra over an immutable base — the verify-mode twin of the
  * JDBC foreachBatch sink (graft.streaming). Keyed on PKs so replays are
  * idempotent (the exactly-once story at the sink).
  *
  * Scale: `incoming` batches are typically much smaller than `base`
  * (micro-batch vs full table) → incoming side broadcasts in the anti
  * joins; the full-outer merge shuffles both sides on the key once.
  */
object Upsert {

  /** W1 — INSERT OR IGNORE (cmds/archive.py:133,144,147,191-192): append
    * only incoming rows whose key is absent; first occurrence wins within
    * the batch (the reference processes rows serially — dedup on key with
    * a deterministic order column keeps that semantics). */
  def insertIfAbsent(base: DataFrame, incoming: DataFrame, keys: Seq[String],
      orderCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCol.map(col).getOrElse(monotonically_increasing_id()))
    val batchDeduped = incoming
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // incoming ≪ base, so the anti-join must never broadcast the base
    // key set (at 100 TB that side is the unbroadcastable one and a
    // broadcast hint there OOMs the driver). Left-anti keeps the probe
    // side on the left; AQE picks broadcast only if base keys turn out
    // tiny at runtime.
    val fresh = batchDeduped.join(
      base.select(keys.map(col): _*), keys, "left_anti")
    base.unionByName(fresh)
  }

  /** W2 — guarded insert-else-update (cmds/archive.py:152-175): insert new
    * keys; update existing keys ONLY when `guard` holds on the incoming row
    * (the reference's never-downgrade rule, line 162: all of
    * fulltitle/channel_id/filesize/duration non-null). `setCols` are the
    * columns the update overwrites; all others keep the base value.
    *
    * Incoming columns must be named `<col>` like base; key collision is
    * resolved by suffixing incoming with "_in" internally. */
  def guardedUpsert(base: DataFrame, incoming: DataFrame, key: String,
      guardOnIncoming: Column, setCols: Seq[String]): DataFrame = {
    val in = incoming.columns.foldLeft(incoming)((d, c) =>
      d.withColumnRenamed(c, c + "_in"))
    // caller builds guardOnIncoming with colIn(...) so it binds to the
    // suffixed incoming side after the join
    val joined = base.join(in, base(key) === in(key + "_in"), "full_outer")
    val isInsert = base(key).isNull
    val doUpdate = in(key + "_in").isNotNull && guardOnIncoming
    val merged = base.columns.map { c =>
      val incomingVal = joined(c + "_in")
      when(isInsert, incomingVal)
        .when(doUpdate && lit(setCols.contains(c)), incomingVal)
        .otherwise(joined(c))
        .as(c)
    }
    joined.select(merged.toIndexedSeq: _*)
  }

  /** Column reference helper for [[guardedUpsert]] guards: the incoming
    * side's column (suffixed internally). */
  def colIn(name: String): Column = col(name + "_in")

  /** W4 — delete-then-insert overwrite (playlist replace,
    * cmds/archive.py:289-294): all base rows with matching keys are
    * replaced by the incoming rows. */
  def replaceByKey(base: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    base.join(broadcast(incoming.select(keys.map(col): _*).distinct()),
      keys, "left_anti")
      .unionByName(incoming)

  /** W6 — bulk delete with cascade to a child table
    * (cmds/archive.py:421-426): truncate parent; child keeps only rows
    * whose FK no longer resolves → empty too. Returned for symmetry. */
  def truncate(df: DataFrame): DataFrame = df.limit(0)

  /** W8 — ingest-time default column (schema.sql:66): coalesce with a
    * default expression (e.g. current_timestamp for `archived`). */
  def withDefault(df: DataFrame, colName: String, default: Column): DataFrame =
    df.withColumn(colName, coalesce(col(colName), default))
}
