package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal join operators (SURVEY §2.3 [NS]) — the two time-join shapes
  * Spark has no native operator for:
  *
  *   - AS-OF ("latest earlier row") lives in EventQueries.q21 as a
  *     union+window, which never materializes candidate pairs at all;
  *   - RANGE ("rows within [lower, upper] of mine") is implemented here
  *     by time-bucketing, the standard rewrite that turns an inequality
  *     join (theta → BroadcastNestedLoopJoin, quadratic per key) into an
  *     EQUI-join on (key, bucket).
  */
object Temporal {

  /** Range join: pairs (l, r) with the same `key` and
    * `r[rts] − l[lts] ∈ [lowerUs, upperUs]` (timestamps as epoch-µs LONG
    * columns with distinct names).
    *
    * Buckets are `width = upperUs − lowerUs` wide, so a left row's window
    * spans at most two consecutive buckets: explode left twofold, equi-join
    * on (key, bucket), then apply the exact inequality. Scale: the only
    * shuffle is the (key, bucket) equi-join — candidate fan-out is 2× left
    * rows plus true in-window pairs, never |L|×|R| per key; skewed keys
    * split across buckets by construction. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      lts: String, rts: String, lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs >= lowerUs, s"empty window [$lowerUs, $upperUs]")
    // a point window [x, x] is valid — bucket width floors at 1
    val width = math.max(upperUs - lowerUs, 1L)
    val r = right.withColumn("_rb", floor(col(rts) / width))
    val l = left
      .withColumn("_lb0", floor((col(lts) + lowerUs) / width))
      .withColumn("_boff", explode(sequence(lit(0), lit(1))))
      .withColumn("_rb", col("_lb0") + col("_boff"))
      .drop("_lb0", "_boff")
    l.join(r, Seq(key, "_rb"))
      .filter(col(rts) >= col(lts) + lowerUs &&
        col(rts) <= col(lts) + upperUs)
      .drop("_rb")
  }
}
