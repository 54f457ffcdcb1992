package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AnnIndex, Similarity}

/** ANN index lifecycle (q107): train once / persist / serve many.
  * Pins (1) result equality between the stored-index serving path and
  * the in-query [[Similarity.ivfPqSearch]], (2) that a fingerprint-fresh
  * index is NOT retrained, (3) that serving's partition pruning is
  * behavioral — a poisoned unprobed partition is never opened. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (m, subDim, ksub, iters) = (16, 4, 16, 2)

  private def fixture() = {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
    val cents = e.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), Similarity.vecD($"embedding").as("cv"))
    val qv = e.orderBy($"vec_id".desc).limit(1)
      .select($"vec_id".as("q_id"), Similarity.vecD($"embedding").as("qv"))
    (e, cents, qv)
  }

  test("serve from stored index == in-query ivfPqSearch, row for row") {
    val (e, cents, qv) = fixture()
    val dir = Files.createTempDirectory("graft_annidx_eq").toString
    AnnIndex.build(e, "vec_id", "embedding", cents, m, subDim, ksub,
      iters, dir)
    val served = AnnIndex.serve(spark, dir, e, "vec_id", "embedding", qv,
      m, subDim, nProbe = 2, shortlist = 50, k = 10).collect().toSeq
    val inQuery = Similarity.ivfPqSearch(e, "vec_id", "embedding", cents,
      Similarity.pqTrain(e, "vec_id", "embedding", m, subDim, ksub, iters),
      qv, m, subDim, nProbe = 2, shortlist = 50, k = 10).collect().toSeq
    assert(served === inQuery)
  }

  test("buildIfAbsent: fingerprint-fresh index is served, not retrained") {
    val (e, cents, _) = fixture()
    val dir = Files.createTempDirectory("graft_annidx_fresh").toString
    AnnIndex.buildIfAbsent(e, "vec_id", "embedding", cents, m, subDim,
      ksub, iters, dir, corpusTag = sf)
    def mtimes = Files.walk(Paths.get(dir)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".parquet")).sorted
      .map(p => p -> Files.getLastModifiedTime(Paths.get(p)).toMillis)
    val before = mtimes
    assert(before.nonEmpty)
    AnnIndex.buildIfAbsent(e, "vec_id", "embedding", cents, m, subDim,
      ksub, iters, dir, corpusTag = sf)
    assert(mtimes === before, "second buildIfAbsent rewrote the index")
    // a DIFFERENT corpus tag (e.g. another scale factor) does rebuild
    AnnIndex.buildIfAbsent(e, "vec_id", "embedding", cents, m, subDim,
      ksub, iters, dir, corpusTag = sf + "-other")
    assert(mtimes !== before, "stale-fingerprint index was not rebuilt")
  }

  test("serving scan prunes unprobed partitions behaviorally " +
      "(poison file never opened)") {
    import spark.implicits._
    val (e, cents, qv) = fixture()
    val dir = Files.createTempDirectory("graft_annidx_poison").toString
    AnnIndex.build(e, "vec_id", "embedding", cents, m, subDim, ksub,
      iters, dir)
    // the probe set at this geometry (mirrors serve's probe step)
    val probed = cents.crossJoin(broadcast(qv))
      .withColumn("qc", round(Similarity.cosine($"cv", $"qv"), 6))
      .orderBy($"qc".desc, $"c_id".asc).limit(2)
      .select($"c_id").collect().map(_.getLong(0)).toSeq
    val lists = spark.read.parquet(AnnIndex.codesPath(dir))
      .select($"centroid".cast("long")).distinct()
      .collect().map(_.getLong(0))
    val unprobed = lists.filterNot(probed.contains)
    assert(unprobed.nonEmpty, "fixture degenerate: every list probed")
    Files.write(Paths.get(AnnIndex.codesPath(dir),
      s"centroid=${unprobed.head}", "part-99999-poison.snappy.parquet"),
      "not a parquet file".getBytes)
    val served = AnnIndex.serve(spark, dir, e, "vec_id", "embedding", qv,
      m, subDim, nProbe = 2, shortlist = 50, k = 10)
    assert(served.count() === 10) // poison partition never opened
  }

  test("appendBatch: build(base) + append(delta) stores exactly the codes " +
      "a one-pass encode with the same frozen quantizers produces, and " +
      "appendIfAbsent replays are no-ops") {
    import spark.implicits._
    val (e, _, qv) = fixture()
    val base = e.filter($"vec_id" < 40)
    val delta = e.filter($"vec_id" >= 40)
    val cents = base.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), Similarity.vecD($"embedding").as("cv"))
    val dir = Files.createTempDirectory("graft_annidx_append").toString
    AnnIndex.build(base, "vec_id", "embedding", cents, m, subDim, ksub,
      iters, dir)
    AnnIndex.appendIfAbsent(spark, dir, delta, "vec_id", "embedding",
      m, subDim, batchTag = "b1")
    def codes = spark.read.parquet(AnnIndex.codesPath(dir))
      .select($"vec_id".cast("long"), $"sub".cast("int"),
        $"code".cast("long"), $"centroid".cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val appended = codes
    // one-pass twin: same frozen quantizers over base+delta
    val cbs = Similarity.pqTrain(base, "vec_id", "embedding", m, subDim,
      ksub, iters)
    val onePass = Similarity.pqEncode(e, "vec_id", "embedding", cbs, m,
        subDim)
      .join(Similarity.ivfAssign(e, "vec_id", "embedding", cents)
        .select($"vec_id", $"centroid"), Seq("vec_id"))
      .select($"vec_id".cast("long"), $"sub".cast("int"),
        $"code".cast("long"), $"centroid".cast("long"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(appended === onePass)
    // replayed batch tag: ledger makes it a no-op, codes unchanged
    AnnIndex.appendIfAbsent(spark, dir, delta, "vec_id", "embedding",
      m, subDim, batchTag = "b1")
    assert(codes === appended, "replayed append duplicated codes")
    // serving the appended index == in-query search with the same
    // frozen quantizers over the full corpus (delta rows servable)
    val served = AnnIndex.serve(spark, dir, e, "vec_id", "embedding", qv,
      m, subDim, nProbe = 2, shortlist = 50, k = 10).collect().toSeq
    val inQuery = Similarity.ivfPqSearch(e, "vec_id", "embedding", cents,
      cbs, qv, m, subDim, nProbe = 2, shortlist = 50, k = 10)
      .collect().toSeq
    assert(served === inQuery)
  }

  test("appendBatch refuses a geometry or metaCols mismatch against the " +
      "stored fingerprint — mixed-schema codes can never reach the index") {
    import spark.implicits._
    val (e, _, _) = fixture()
    val base = e.filter($"vec_id" < 40).withColumn("label", $"vec_id" % 3)
    val delta = e.filter($"vec_id" >= 40).withColumn("label", $"vec_id" % 3)
    val cents = base.orderBy($"vec_id").limit(8)
      .select($"vec_id".as("c_id"), Similarity.vecD($"embedding").as("cv"))
    val dir = Files.createTempDirectory("graft_annidx_guard").toString
    AnnIndex.buildIfAbsent(base, "vec_id", "embedding", cents, m, subDim,
      ksub, iters, dir, corpusTag = "guard", metaCols = Seq("label"))
    val wrongGeom = intercept[IllegalArgumentException] {
      AnnIndex.appendBatch(spark, dir, delta, "vec_id", "embedding",
        m + 1, subDim, metaCols = Seq("label"))
    }
    assert(wrongGeom.getMessage.contains("geometry"))
    val wrongMeta = intercept[IllegalArgumentException] {
      AnnIndex.appendBatch(spark, dir, delta, "vec_id", "embedding",
        m, subDim, metaCols = Nil)
    }
    assert(wrongMeta.getMessage.contains("metaCols"))
    // the matching append still works
    AnnIndex.appendBatch(spark, dir, delta, "vec_id", "embedding",
      m, subDim, metaCols = Seq("label"))
    val n = spark.read.parquet(AnnIndex.codesPath(dir)).count()
    assert(n == e.count() * m)
  }

  test("removeVectors: forgotten ids leave the codes entirely, " +
      "survivors' rows are byte-identical, removal is idempotent, " +
      "serving cannot recall a removed vector") {
    import spark.implicits._
    val (e, cents, qv) = fixture()
    val dir = Files.createTempDirectory("graft_annidx_rm").toString
    AnnIndex.build(e, "vec_id", "embedding", cents, m, subDim, ksub,
      iters, dir)
    val before = spark.read.parquet(AnnIndex.codesPath(dir))
      .collect().map(_.toString).sorted
    val rmIds = e.filter($"vec_id" % 7 === 0).select($"vec_id")
    val rmSet = rmIds.collect().map(_.getLong(0)).toSet
    AnnIndex.removeVectors(spark, dir, rmIds, "vec_id")
    val after = spark.read.parquet(AnnIndex.codesPath(dir))
      .collect()
    assert(!after.exists(r =>
      rmSet.contains(r.getAs[Long]("vec_id"))), "removed id survived")
    // survivors byte-identical: after == before minus removed rows
    assert(after.map(_.toString).sorted.toSeq ===
      before.filterNot(s => rmSet.exists(id => s.startsWith(s"[$id,")))
        .toSeq, "a survivor row changed")
    // idempotent: removing again is a no-op
    AnnIndex.removeVectors(spark, dir, rmIds, "vec_id")
    assert(spark.read.parquet(AnnIndex.codesPath(dir)).count()
      === after.length.toLong)
    // serving after removal never returns a removed id
    val served = AnnIndex.serve(spark, dir, e, "vec_id", "embedding",
      qv, m, subDim, nProbe = 8, shortlist = 100, k = 20)
      .collect().map(_.getLong(0))
    assert(served.nonEmpty && !served.exists(rmSet.contains),
      served.mkString(","))
  }

  test("stalenessAudit: hand-computed shares/TVD on planted clusters; " +
      "skewed traffic trips the verdict, matching traffic does not") {
    import spark.implicits._
    def v(a: Double, b: Double) =
      Array(a, b, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // corpus: 4 vectors on the c100 axis, 2 on the c200 axis
    val corpus = Seq(
      (1L, v(10, 1)), (2L, v(9, 1)), (3L, v(8, 1)), (4L, v(7, 1)),
      (5L, v(1, 10)), (6L, v(1, 9)))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, v(1, 0)), (200L, v(0, 1)))
      .toDF("c_id", "cv")
    val dir = Files.createTempDirectory("graft_annidx_stale").toString
    AnnIndex.build(corpus, "vec_id", "embedding", cents,
      m = 2, subDim = 4, ksub = 2, iters = 1, dir)

    // skewed traffic: 1 : 3 against the stored 4 : 2
    val skewed = Seq((11L, v(20, 1)), (12L, v(1, 20)), (13L, v(1, 19)),
      (14L, v(1, 18))).toDF("vec_id", "embedding")
    val got = AnnIndex.stalenessAudit(spark, dir, skewed, "vec_id",
      "embedding", thresholdPpm = 100000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap
    // stored shares 4/6, 2/6; batch 1/4, 3/4; tvd = (416666+416667) div 2
    assert(got(100L) ===
      ((4L, 1L, 666666L, 250000L, -416666L, 416666L, true)))
    assert(got(200L) ===
      ((2L, 3L, 333333L, 750000L, 416667L, 416666L, true)))

    // matching traffic: same 2 : 1 mix as the stored index
    val matching = Seq((21L, v(20, 1)), (22L, v(19, 1)),
      (23L, v(1, 20))).toDF("vec_id", "embedding")
    val ok = AnnIndex.stalenessAudit(spark, dir, matching, "vec_id",
      "embedding", thresholdPpm = 100000L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap
    // 666666 vs 666666 and 333333 vs 333333: zero shift, not stale
    assert(ok(100L) === ((0L, 0L, false)))
    assert(ok(200L) === ((0L, 0L, false)))
  }

  test("distortionAudit: hand-computed integer reconstruction error; " +
      "the heterogeneous small list trips refit, the uniform one not") {
    import spark.implicits._
    def v(a: Double, b: Double) =
      Array(a, b, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // list c100: two far-apart vectors (ids 1, 2 also seed the PQ
    // init); list c200: eight identical vectors
    val corpus = (Seq((1L, v(10, 1)), (2L, v(30, 5))) ++
      (11L to 18L).map(id => (id, v(1, 10))))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, v(1, 0)), (200L, v(0, 1)))
      .toDF("c_id", "cv")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_annidx_dist").toString
    AnnIndex.build(corpus, "vec_id", "embedding", cents,
      m = 2, subDim = 4, ksub = 2, iters = 1, dir)
    val got = AnnIndex.distortionAudit(spark, dir, corpus, "vec_id",
      "embedding", m = 2, subDim = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // PQ sub-0 Lloyd: cw1 = mean{(10,1),(1,10)x8} = (2,9,0,0),
    // cw2 = (30,5,0,0). Encodings: (10,1)->cw1 d2 = (8e6)^2+(8e6)^2 =
    // 128e12; (30,5)->cw2 exact; (1,10)->cw1 d2 = 2e12. Sub-1 slices
    // are all zeros -> zero. c100: mean 128e12 div 2, c200: 2e12.
    // global = 144e12 div 10 = 14.4e12; only c100 exceeds 2x global.
    assert(got(100L) === ((2L, 64000000000000L, 128000000000000L,
      14400000000000L, true)), got(100L).toString)
    assert(got(200L) === ((8L, 2000000000000L, 2000000000000L,
      14400000000000L, false)), got(200L).toString)
  }
}
