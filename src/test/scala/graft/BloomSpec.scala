package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Dedup}

/** Bloom-filter gate: bit placement matches the md5 contract, the build
  * is mergeable (partitioning-invariant), members always pass, and the
  * near-dup composition never loses a true band hit (false positives
  * allowed, false negatives never). */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val M = 1024
  private val K = 3

  /** Scala twin of Bloom.positions — the oracle-side contract. */
  private def refPositions(s: String): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until K).map(j =>
      java.lang.Long.parseLong(hex.substring(8 * j, 8 * j + 8), 16) % M)
  }

  test("positions match the md5 slice contract (engine-portable)") {
    import spark.implicits._
    val keys = Seq("alpha", "0:the quick fox", "", "π-unicode")
    val got = keys.toDF("k")
      .select($"k", Bloom.positions($"k", M, K).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    keys.foreach { s => assert(got(s) === refPositions(s), s"key $s") }
  }

  test("build is partitioning-invariant (mergeable OR) and members pass") {
    import spark.implicits._
    val keys = (1 to 300).map(i => s"key-$i").toDF("k")
    def words(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Bloom.build(df, "k", M, K).collect().head.getSeq[Long](0)
    val one = words(keys.coalesce(1))
    val many = words(keys.repartition(7))
    assert(one === many)
    assert(one.length === M / 64)
    // every inserted key must probe maybe=true (no false negatives)
    val probed = keys
      .withColumn("_pos", Bloom.positions($"k", M, K))
      .crossJoin(broadcast(Bloom.build(keys, "k", M, K)))
      .withColumn("hit", Bloom.mightContain("bloom", "_pos"))
    assert(probed.filter(!$"hit").count() === 0)
  }

  test("gate: confirmed ⇒ maybe; definitely-absent rows skip the probe join") {
    import spark.implicits._
    val archive = (1 to 200).map(i => s"a-$i").toDF("k")
    val batch = ((1 to 50).map(i => s"a-$i") ++ (1 to 400).map(i => s"b-$i"))
      .toDF("k")
    val out = Bloom.gate(batch, archive, "k", "k", M, K)
      .select("k", "maybe_present", "confirmed")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    // every true member is maybe AND confirmed
    out.filter(_._1.startsWith("a-")).foreach { case (k, m, c) =>
      assert(m && c, s"member $k must be maybe+confirmed")
    }
    // confirmed implies maybe, and non-members are never confirmed
    out.foreach { case (k, m, c) =>
      assert(!c || m, s"$k confirmed without maybe")
      if (k.startsWith("b-")) assert(!c, s"non-member $k confirmed")
    }
    // with m=1024 and 200*3 set bits, most of the 400 non-members must be
    // pruned outright (fill ≈ 0.44 → per-key fp ≈ 9%); allow generous slack
    val fp = out.count { case (k, m, _) => k.startsWith("b-") && m }
    assert(fp < 100, s"$fp of 400 non-members passed — filter not pruning")
  }

  test("gateNearDups: never loses a true band hit vs the direct band join") {
    val docs = Tables.documents(spark, sf)
    val archive = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val out = Bloom.gateNearDups(archive, batch, "doc_id", "text",
      mBits = 8192, bloomK = K)
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(got.size === batch.count())
    // ground truth: the un-filtered archive band probe (dedupIncremental
    // layer 3 shape)
    val keyCols = Seq("band", "v0", "v1")
    val aB = Dedup.bandTable(archive, "doc_id", "text", 3, 8, 4)
      .select(keyCols.map(col): _*).distinct()
    val truth = Dedup.bandTable(batch, "doc_id", "text", 3, 8, 4)
      .join(aB, keyCols, "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(truth.nonEmpty, "fixture must contain real archive band hits")
    truth.foreach { id =>
      assert(got(id) === ((true, true)), s"true hit $id lost by the filter")
    }
    got.foreach { case (id, (m, c)) =>
      assert(!c || m, s"$id confirmed without maybe")
      if (c) assert(truth.contains(id), s"$id confirmed but not a real hit")
    }
  }

  test("advisor: internally consistent (fill/est recomputed from its " +
      "own row) and its measured FP count equals the REAL bitmap " +
      "gate's maybe-and-not-confirmed count") {
    import spark.implicits._
    val m = 4096
    val archive = (1 to 50).map(i => s"arc$i").toDF("k")
    // 25 members + 25 non-members
    val probe = ((1 to 25).map(i => s"arc$i") ++
      (1 to 25).map(i => s"new$i")).toDF("k")
    val r = Bloom.advisor(archive, probe, "k", "k", mBits = m, k = 3)
      .collect().head
    val (nk, ones, fill, est, nonmem, nfp) = (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(nk === 50L && nonmem === 25L)
    assert(ones >= 1L && ones <= 150L)
    assert(fill === 1000000L * ones / m)
    assert(est === 1000000L * ones * ones * ones / (m.toLong * m * m))
    // cross-implementation law: the relational position math must
    // agree with the BloomFilterAggregator's actual bit placement
    val gateFp = Bloom.gate(probe, archive, "k", "k", m, 3)
      .filter(col("maybe_present") && !col("confirmed")).count()
    assert(nfp === gateFp, s"advisor $nfp vs gate $gateFp")
  }
}
