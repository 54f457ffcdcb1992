package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [NS] Stable data placement — rendezvous (highest-random-weight)
  * hashing (Thaler & Ravishankar 1996; the public algorithm behind
  * Ceph/Cassandra-style placement and cache routing).
  *
  * The 100 TB problem this solves: a corpus sharded by `id % n` moves
  * (n−1)/n of ALL its bytes when n changes — reshuffling a petabyte to
  * add one shard. Under HRW every id independently picks the shard
  * maximizing hash(id, shard), so growing n→m relocates exactly the
  * rows whose new max landed on a NEW shard (expected (m−n)/m), and a
  * row never moves between two surviving shards — the minimal-disruption
  * property, which [[reshardCertificate]] verifies exactly (the
  * `illegal_moves` column is a theorem made a count: it must be 0).
  *
  * Plan shape: assignment is one codegen'd projection (n md5 calls +
  * an argmax over the array — no shuffle, no lookup table, no driver
  * state); every audit below is that projection plus one bounded-key
  * aggregate. Nothing here materializes per-shard data.
  *
  * Engine-portable by construction: scores are md5 hex strings, and a
  * fixed-length lowercase hex compare IS the numeric compare of the
  * 128-bit value, so any engine with md5 replays the placement
  * byte-identically (the DuckDB oracles recompute it from scratch).
  */
object Shard {

  /** The n HRW score strings for one id: md5("<id>:<s>") per shard s. */
  private def hrwScores(id: Column, nShards: Int): Column =
    array((0 until nShards).map(s =>
      md5(concat(id.cast("string"), lit(s":$s")))): _*)

  /** Assign each row its HRW shard in [0, nShards) as `outCol` (long).
    * Pure per-row arithmetic: the placement function is the code, not a
    * stored table — two jobs that agree on (idCol, nShards) agree on
    * placement with zero coordination. */
  def rendezvousAssign(df: DataFrame, idCol: String, nShards: Int,
      outCol: String = "shard"): DataFrame = {
    require(nShards >= 1 && nShards <= 1024,
      s"nShards=$nShards out of range (HRW scoring is O(n) per row)")
    df.withColumn("_hrw", hrwScores(col(idCol), nShards))
      .withColumn(outCol,
        (expr("array_position(_hrw, array_max(_hrw))") - 1L).cast("long"))
      .drop("_hrw")
  }

  /** Movement matrix for a reshard nFrom→nTo: one row per
    * (shard_from, shard_to) with the exact row count — the migration
    * manifest (which shard pairs actually ship data, and how much). */
  def reshardMatrix(df: DataFrame, idCol: String, nFrom: Int,
      nTo: Int): DataFrame =
    rendezvousAssign(rendezvousAssign(df, idCol, nFrom, "shard_from"),
        idCol, nTo, "shard_to")
      .groupBy(col("shard_from"), col("shard_to"))
      .agg(count(lit(1)).as("n_rows"))

  /** One-row reshard certificate for nFrom→nTo:
    * (n_total, n_moved, moved_ppm, expected_moved_ppm, illegal_moves).
    * `expected_moved_ppm` is HRW's theoretical movement floor
    * |m−n|/max(m,n) — ANY placement must move at least the rows the
    * shard-count delta implies; `illegal_moves` counts rows that moved
    * BETWEEN two shards present in both configurations, which the HRW
    * argmax makes impossible (the relative order of surviving shards'
    * scores never changes) — a nonzero value means the placement
    * function drifted, not that data chose to move. */
  def reshardCertificate(df: DataFrame, idCol: String, nFrom: Int,
      nTo: Int): DataFrame = {
    val minN = math.min(nFrom, nTo)
    val maxN = math.max(nFrom, nTo)
    val moved = col("shard_from") =!= col("shard_to")
    rendezvousAssign(rendezvousAssign(df, idCol, nFrom, "shard_from"),
        idCol, nTo, "shard_to")
      .agg(count(lit(1)).as("n_total"),
        sum(when(moved, 1L).otherwise(0L)).as("n_moved"),
        sum(when(moved && col("shard_from") < minN &&
          col("shard_to") < minN, 1L).otherwise(0L)).as("illegal_moves"))
      .select(col("n_total"), col("n_moved"),
        expr("(1000000 * n_moved) div n_total").as("moved_ppm"),
        lit(1000000L * (maxN - minN) / maxN).as("expected_moved_ppm"),
        col("illegal_moves"))
  }

  /** Weighted HRW via virtual nodes: shard s with weight w_s owns w_s
    * vnodes "s#0".."s#(w_s−1)", each scored independently; a row lands
    * on the shard owning its max-scoring vnode, so expected load is
    * proportional to weight — heterogeneous capacity (storage tiers,
    * mixed hardware) without losing the minimal-disruption property:
    * raising one shard's weight adds vnodes whose wins can only pull
    * rows TO that shard, and weight 0 drains a shard by moving exactly
    * its own rows (every other row's winning vnode still stands). Same
    * plan shape as [[rendezvousAssign]]: one projection, Σw md5 calls,
    * an argmax, and a literal vnode→shard lookup array. */
  def rendezvousAssignWeighted(df: DataFrame, idCol: String,
      weights: Seq[Int], outCol: String = "shard"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ >= 0) &&
      weights.sum >= 1 && weights.sum <= 1024,
      s"bad weights $weights (need Σw in [1,1024], none negative)")
    val scores = for { s <- weights.indices; v <- 0 until weights(s) }
      yield md5(concat(col(idCol).cast("string"), lit(s":$s#$v")))
    val owners = weights.indices.flatMap(s => Seq.fill(weights(s))(s))
    df.withColumn("_hrw", array(scores: _*))
      .withColumn(outCol, expr(
        s"element_at(array(${owners.mkString(",")}), " +
          "cast(array_position(_hrw, array_max(_hrw)) as int))")
        .cast("long"))
      .drop("_hrw")
  }

  /** One-row certificate for a capacity change `before`→`after` (same
    * shard count, per-shard weights change in ONE direction — all ≥ or
    * all ≤; a mixed change has no closed movement floor). Columns as
    * [[reshardCertificate]]: `expected_moved_ppm` = |ΣΔw|/Σw_max (the
    * vnode-share floor), `illegal_moves` counts movers that violate
    * the direction theorem — under growth a mover must LAND on an
    * up-weighted shard (only new vnodes win anything new); under
    * shrink a mover must ORIGINATE on a down-weighted shard (every
    * other row's winning vnode survived). Zero on both is the
    * weighted minimal-disruption property, counted.
    *
    * The floor is NOT simply |ΣΔw|/Σw_max: a new vnode winning for a
    * shard that ALREADY held the row is not a move. Exactly: under
    * growth a row moves to s iff its after-max lands on one of s's Δw_s
    * new vnodes (Δw_s/va) AND its before-max was not already s
    * ((vb−w_s)/vb, independent — the before-max is the max of the
    * surviving vnodes); summed over gaining shards. Shrink is the
    * mirror. [[reshardCertificate]]'s (m−n)/m is the w_s = 0 special
    * case. */
  def reweightCertificate(df: DataFrame, idCol: String,
      before: Seq[Int], after: Seq[Int]): DataFrame = {
    require(before.size == after.size,
      "reweight keeps the shard count; use reshardCertificate to grow it")
    val growth = before.zip(after).forall { case (b, a) => a >= b }
    val shrink = before.zip(after).forall { case (b, a) => a <= b }
    require(growth || shrink,
      s"mixed reweight $before -> $after has no closed movement floor")
    val (vb, va) = (before.sum.toLong, after.sum.toLong)
    val expPpm = if (growth)
      1000000L * before.indices.map(s =>
        (after(s) - before(s)).toLong * (vb - before(s))).sum / (va * vb)
    else
      1000000L * before.indices.map(s =>
        (before(s) - after(s)).toLong * (va - after(s))).sum / (vb * va)
    val changed = before.indices
      .map(s => if (after(s) != before(s)) 1 else 0)
    val moved = col("shard_from") =!= col("shard_to")
    // growth: mover must land on a gained shard; shrink: mover must
    // originate on a shrunk one
    val endCol = if (growth) "shard_to" else "shard_from"
    val illegal = moved && expr(
      s"element_at(array(${changed.mkString(",")}), " +
        s"cast($endCol as int) + 1)") === 0
    rendezvousAssignWeighted(
        rendezvousAssignWeighted(df, idCol, before, "shard_from"),
        idCol, after, "shard_to")
      .agg(count(lit(1)).as("n_total"),
        sum(when(moved, 1L).otherwise(0L)).as("n_moved"),
        sum(when(illegal, 1L).otherwise(0L)).as("illegal_moves"))
      .select(col("n_total"), col("n_moved"),
        expr("(1000000 * n_moved) div n_total").as("moved_ppm"),
        lit(expPpm).as("expected_moved_ppm"), col("illegal_moves"))
  }

  /** Placement-strategy comparison over a component-labeled corpus
    * (`labeled` carries idCol + repCol, e.g. near-dup CC output with
    * singletons self-labeled): route by document id vs by component
    * representative. Two rows (strategy ∈ {by_doc, by_component}), each
    * with n_docs, n_components, n_spanning_components, n_shards_used,
    * max/min shard load.
    *
    * The decision this prices: `by_doc` balances best but splits
    * near-dup components across shards — every FUTURE dedup pass over
    * the sharded corpus needs a global shuffle to re-link them.
    * `by_component` hashes the representative instead, so components
    * land whole (n_spanning_components = 0 structurally) and dedup
    * becomes shard-local / embarrassingly parallel at 100 TB — paid for
    * with whatever imbalance the component size distribution carries
    * (the max_shard_docs delta between the two rows IS that price). */
  def colocationCompare(labeled: DataFrame, idCol: String,
      repCol: String, nShards: Int): DataFrame = {
    val byDoc = rendezvousAssign(labeled, idCol, nShards)
    val byComp = rendezvousAssign(labeled, repCol, nShards)
    audit(byDoc, repCol, "by_doc")
      .unionByName(audit(byComp, repCol, "by_component"))
  }

  private def audit(df: DataFrame, repCol: String,
      label: String): DataFrame = {
    val perComp = df.groupBy(col(repCol))
      .agg(countDistinct(col("shard")).as("_ns"),
        count(lit(1)).as("_nd"))
    val comps = perComp.agg(count(lit(1)).as("n_components"),
      sum(when(col("_ns") > 1, 1L).otherwise(0L))
        .as("n_spanning_components"),
      sum(col("_nd")).as("n_docs"))
    val loads = df.groupBy(col("shard")).agg(count(lit(1)).as("_n"))
      .agg(count(lit(1)).as("n_shards_used"),
        max(col("_n")).as("max_shard_docs"),
        min(col("_n")).as("min_shard_docs"))
    comps.crossJoin(loads).select(lit(label).as("strategy"),
      col("n_docs"), col("n_components"), col("n_spanning_components"),
      col("n_shards_used"), col("max_shard_docs"), col("min_shard_docs"))
  }

  /** Size-CAPPED component colocation: route each doc by its component
    * representative UNLESS the component holds more than
    * `maxComponentDocs` docs — those fall back to by-doc routing, and
    * the count of such components is REPORTED (`n_capped_components`)
    * instead of silently unbalancing a shard.
    *
    * The regime this exists for (r12 verdict): the skew campaign's
    * corpus family carries mega-components — at skew100 one near-dup
    * family holds 20% of the corpus, and pure `by_component` routing
    * puts all of it on ONE shard (the honest number q380 never
    * measured). The cap bounds any component's contribution to a shard
    * at `maxComponentDocs`, so max_shard_docs stays within
    * corpus/nShards + cap-sized slack; the price is that capped
    * components span shards again (their dedup re-link goes back to a
    * global shuffle — but only for THOSE components, counted, not for
    * the corpus). Cap = Long.MaxValue reduces to `by_component`
    * exactly (spec-pinned: same hash input, same argmax).
    *
    * Same plan shape as [[rendezvousAssign]] plus ONE aggregate and
    * one shuffle join on the rep key to learn component sizes — at
    * 100 TB the size table is |components| rows and the join is the
    * same co-partitioning the CC labeling already produced. */
  def colocationCappedAssign(labeled: DataFrame, idCol: String,
      repCol: String, nShards: Int, maxComponentDocs: Long,
      outCol: String = "shard"): DataFrame = {
    require(maxComponentDocs >= 1L,
      s"maxComponentDocs=$maxComponentDocs must be >= 1")
    val sizes = labeled.groupBy(col(repCol))
      .agg(count(lit(1)).as("_csize"))
    val routed = labeled.join(sizes, Seq(repCol))
      .withColumn("_capped", col("_csize") > maxComponentDocs)
      .withColumn("_rkey",
        when(col("_capped"), col(idCol).cast("string"))
          .otherwise(col(repCol).cast("string")))
    rendezvousAssign(routed, "_rkey", nShards, outCol)
      .drop("_rkey", "_csize")
  }

  /** One-row audit of [[colocationCappedAssign]] — the
    * [[colocationCompare]] columns plus `n_capped_components` (the
    * components that fell back to by-doc routing; every spanning
    * component must be one of these, so n_spanning_components ≤
    * n_capped_components structurally). */
  def colocationCapped(labeled: DataFrame, idCol: String,
      repCol: String, nShards: Int, maxComponentDocs: Long): DataFrame = {
    val a = colocationCappedAssign(labeled, idCol, repCol, nShards,
      maxComponentDocs)
    val capped = a.groupBy(col(repCol))
      .agg(max(when(col("_capped"), 1L).otherwise(0L)).as("_ov"))
      .agg(coalesce(sum(col("_ov")), lit(0L)).as("n_capped_components"))
    audit(a, repCol, "by_component_capped").crossJoin(capped)
  }
}
