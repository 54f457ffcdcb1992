package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Rendezvous (HRW) placement: assignment agrees with a from-scratch
  * reference, the minimal-disruption theorem holds as an exact count in
  * BOTH reshard directions, and component colocation lands components
  * whole while conserving totals. */
class ShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  /** Reference HRW in plain Scala: argmax over md5 hex of "id:s". */
  private def refShard(id: Long, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).maxBy { s =>
      md.reset()
      md.digest(s"$id:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
  }

  test("assignment matches the from-scratch reference on every id") {
    val got = Shard.rendezvousAssign(ids(500), "id", 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 500L).foreach { id =>
      assert(got(id) === refShard(id, 7).toLong, s"id=$id")
    }
  }

  test("growth reshard: zero illegal moves, movement near the floor") {
    val r = Shard.reshardCertificate(ids(2000), "id", 8, 10).collect()(0)
    assert(r.getAs[Long]("n_total") === 2000L)
    assert(r.getAs[Long]("illegal_moves") === 0L,
      "a row moved between two surviving shards — HRW argmax broken")
    assert(r.getAs[Long]("expected_moved_ppm") === 200000L)
    val ppm = r.getAs[Long]("moved_ppm")
    // binomial(2000, 0.2): ±5 sd band ≈ ±45k ppm
    assert(ppm > 155000L && ppm < 245000L, s"moved_ppm=$ppm")
  }

  test("shrink reshard: survivors keep every row they had") {
    val cert = Shard.reshardCertificate(ids(2000), "id", 10, 8)
      .collect()(0)
    assert(cert.getAs[Long]("illegal_moves") === 0L)
    // matrix view: every moved row originates on a removed shard
    val m = Shard.reshardMatrix(ids(2000), "id", 10, 8).collect()
    m.filter(r => r.getLong(0) != r.getLong(1)).foreach { r =>
      assert(r.getLong(0) >= 8L,
        s"row moved off surviving shard ${r.getLong(0)}")
    }
    assert(m.map(_.getAs[Long]("n_rows")).sum === 2000L)
  }

  /** Reference weighted HRW: argmax over vnodes "id:s#v". */
  private def refShardW(id: Long, weights: Seq[Int]): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val scored = for { s <- weights.indices; v <- 0 until weights(s) }
      yield {
        md.reset()
        (md.digest(s"$id:$s#$v".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, s)
      }
    scored.maxBy(_._1)._2
  }

  test("weighted assignment matches the reference; load tracks weight") {
    val w = Seq(1, 3)
    val got = Shard.rendezvousAssignWeighted(ids(2000), "id", w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 2000L).foreach { id =>
      assert(got(id) === refShardW(id, w).toLong, s"id=$id")
    }
    // weight 3 of 4 ⇒ expected share 0.75; binomial ±5 sd ≈ ±0.05
    val share1 = got.values.count(_ == 1L).toDouble / 2000
    assert(share1 > 0.70 && share1 < 0.80, s"shard1 share=$share1")
  }

  test("capacity upgrade: movers land only on the up-weighted shard") {
    val r = Shard.reweightCertificate(ids(2000), "id",
      Seq(1, 2, 3, 2), Seq(1, 2, 3, 4)).collect()(0)
    assert(r.getAs[Long]("illegal_moves") === 0L)
    // exact floor: new-vnode wins that change shard = (2/10)·(6/8)
    assert(r.getAs[Long]("expected_moved_ppm") === 150000L)
    val ppm = r.getAs[Long]("moved_ppm")
    // binomial(2000, 0.15): ±5 sd ≈ ±40k ppm
    assert(ppm > 110000L && ppm < 190000L, s"moved_ppm=$ppm")
  }

  test("drain via weight 0: exactly the drained shard's rows move") {
    val before = Seq(2, 2, 2); val after = Seq(2, 0, 2)
    val r = Shard.reweightCertificate(ids(2000), "id", before, after)
      .collect()(0)
    assert(r.getAs[Long]("illegal_moves") === 0L,
      "a row moved off a shard whose weight did not change")
    // every pre-drain shard-1 row moved, and ONLY those rows
    val pre = Shard.rendezvousAssignWeighted(ids(2000), "id", before)
      .collect().count(_.getLong(1) == 1L).toLong
    assert(r.getAs[Long]("n_moved") === pre)
  }

  test("mixed reweight is refused (no closed movement floor)") {
    intercept[IllegalArgumentException] {
      Shard.reweightCertificate(ids(10), "id", Seq(2, 2), Seq(1, 3))
    }
  }

  test("colocation: components land whole, totals conserved") {
    // 3 components of 40 docs each (ids dense enough that by_doc
    // provably splits them over 8 shards) + 80 singletons
    val labeled = ((1L to 120L).map(i => (i, (i - 1) / 40 * 1000)) ++
      (201L to 280L).map(i => (i, i))).toDF("doc_id", "rep")
    val rows = Shard.colocationCompare(labeled, "doc_id", "rep", 8)
      .collect().map(r => r.getString(0) -> r).toMap
    val byDoc = rows("by_doc"); val byComp = rows("by_component")
    assert(byComp.getAs[Long]("n_spanning_components") === 0L)
    assert(byDoc.getAs[Long]("n_spanning_components") >= 3L,
      "40-doc components must span shards under by-doc routing")
    Seq("n_docs", "n_components").foreach { c =>
      assert(byDoc.getAs[Long](c) === byComp.getAs[Long](c))
    }
    assert(byDoc.getAs[Long]("n_docs") === 200L)
    assert(byDoc.getAs[Long]("n_components") === 83L)
  }

  test("capped colocation: the mega-component falls back to by-doc " +
      "routing and is REPORTED; small components still land whole; " +
      "cap = MaxValue reduces to by_component exactly") {
    // the skew-campaign shape: one planted 120-doc mega-component, 10
    // pairs, 70 singletons — 4 shards, so pure by_component puts 60%
    // of the corpus on one shard
    val labeled = ((1L to 120L).map(i => (i, 5000L)) ++
      (201L to 220L).map(i => (i, (i - 201L) / 2 * 10 + 300L)) ++
      (401L to 470L).map(i => (i, i))).toDF("doc_id", "rep")
    val capped = Shard.colocationCapped(labeled, "doc_id", "rep", 4, 10L)
      .collect()(0)
    assert(capped.getAs[Long]("n_docs") === 210L)
    assert(capped.getAs[Long]("n_components") === 81L)
    assert(capped.getAs[Long]("n_capped_components") === 1L,
      "exactly the 120-doc component is over the cap — and reported")
    // the mega-component's docs spread by doc id: it must span shards,
    // and every spanning component must be a capped one
    assert(capped.getAs[Long]("n_spanning_components") >= 1L)
    assert(capped.getAs[Long]("n_spanning_components") <=
      capped.getAs[Long]("n_capped_components"))
    // the balance payoff: no shard holds the whole mega-component
    // (by_component would put all 120 + colocated small comps on one)
    assert(capped.getAs[Long]("max_shard_docs") < 120L,
      "cap must break the mega-component's single-shard pile-up")
    // assignment level: small components route by rep (identical to
    // pure component routing), mega docs route by doc id
    val a = Shard.colocationCappedAssign(labeled, "doc_id", "rep", 4,
        10L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Boolean]("_capped"))).toMap
    val byRep = Shard.rendezvousAssign(labeled, "rep", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("shard")).toMap
    val byDoc = Shard.rendezvousAssign(labeled, "doc_id", 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("shard")).toMap
    labeled.collect().foreach { r =>
      val id = r.getLong(0)
      if (id <= 120L) assert(a(id) === ((byDoc(id), true)), s"doc $id")
      else assert(a(id) === ((byRep(id), false)), s"doc $id")
    }
    // cap = MaxValue: all seven audit columns equal q380's by_component
    val uncapped = Shard.colocationCapped(labeled, "doc_id", "rep", 4,
      Long.MaxValue).collect()(0)
    val byComp = Shard.colocationCompare(labeled, "doc_id", "rep", 4)
      .collect().map(r => r.getString(0) -> r).toMap.apply("by_component")
    for (c <- Seq("n_docs", "n_components", "n_spanning_components",
        "n_shards_used", "max_shard_docs", "min_shard_docs"))
      assert(uncapped.getAs[Long](c) === byComp.getAs[Long](c),
        s"cap=MaxValue must reduce to by_component on $c")
    assert(uncapped.getAs[Long]("n_capped_components") === 0L)
  }
}
