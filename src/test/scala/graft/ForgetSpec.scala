package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Cross-artifact RTBF orchestrator (q350): one purgeDocs call must
  * equal the individual per-artifact removers row for row (certificate
  * comparison over SEVEN artifact classes incl. ANN), and a replayed
  * epoch must leave every store untouched. */
class ForgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("purgeDocs composite == the individual removers (certificates " +
      "identical across 7 artifact classes); replayed epoch is a no-op") {
    import spark.implicits._
    import graft.operators._

    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "beta gamma delta epsilon zeta eta", "en"),
      (3L, "one two three four five six", "de"),
      (4L, "alpha beta gamma delta epsilon", "en"), // exact twin of 1
      (5L, "totally different words here now too", "de")
    ).toDF("doc_id", "text", "lang")
    // binaryQuantize's contract is exactly-64-dim vectors
    val emb = (1L to 5L).map(i => (i, Array.tabulate(64)(j =>
      (((i * 31 + j * 17) % 13) - 6).toFloat / 10f)))
      .toDF("vec_id", "embedding")
    // hand-made IVF-PQ code rows: (vec_id, sub, code, centroid) — the
    // removal path only touches the codes table, so a fake exercises it
    val annCodes = Seq(
      (1L, 0, 3, 0), (1L, 1, 2, 0), (2L, 0, 1, 1), (2L, 1, 0, 1),
      (3L, 0, 2, 0), (3L, 1, 1, 0), (4L, 0, 3, 1), (4L, 1, 2, 1),
      (5L, 0, 0, 0), (5L, 1, 3, 0)
    ).toDF("vec_id", "sub", "code", "centroid")
    val gone = docs.filter($"doc_id".isin(2L, 4L))
    val ids = gone.select($"doc_id")

    def buildAll(): (String, String, String, String, String, String,
        String) = {
      val (t, dd, tri, ln, imp, bq, ann) = (tmp("f_text"), tmp("f_dedup"),
        tmp("f_tri"), tmp("f_line"), tmp("f_imp"), tmp("f_bq"),
        tmp("f_ann"))
      TextIndex.build(docs, "doc_id", "text", t)
      DedupIndex.build(docs, "doc_id", "text", 3, 8, 4, dd)
      LmIndex.buildTrigram(docs, "doc_id", "text", tri)
      LineIndex.build(docs, "doc_id", "text", ln)
      Importance.buildModel(
        Importance.docBuckets(docs, "doc_id", "text", 8, Seq("lang")),
        col("lang") === "en", 8, imp)
      BqIndex.build(spark, bq, emb, "vec_id", "embedding")
      annCodes.write.mode("overwrite").partitionBy("centroid")
        .parquet(AnnIndex.codesPath(ann))
      (t, dd, tri, ln, imp, bq, ann)
    }
    def targetsOf(t: String, dd: String, tri: String, ln: String,
        imp: String, bq: String, ann: String): Seq[Forget.Target] = Seq(
      Forget.TextTarget(t, "doc_id"),
      Forget.DedupTarget(dd),
      Forget.TrigramTarget(tri, "text"),
      Forget.LineTarget(ln, "text"),
      Forget.ImportanceTarget(imp, "text", 8, col("lang") === "en",
        Seq("lang")),
      Forget.BqTarget(bq),
      Forget.AnnTarget(ann, "vec_id"))

    // A: one orchestrated purge
    val (ta, dda, tria, lna, impa, bqa, anna) = buildAll()
    val targetsA = targetsOf(ta, dda, tria, lna, impa, bqa, anna)
    Forget.purgeDocs(spark, gone, "doc_id", targetsA, epoch = 0L)

    // B: the seven individual entry points, called by hand
    val (tb, ddb, trib, lnb, impb, bqb, annb) = buildAll()
    TextIndex.removeDocs(spark, ids, "doc_id", tb, epoch = 0L)
    DedupIndex.removeDocs(spark, ddb, ids, "doc_id", epoch = 0L)
    LmIndex.removeTrigramBatch(spark, gone, "doc_id", "text", trib,
      epoch = 0L)
    LineIndex.removeBatch(spark, gone, "doc_id", "text", lnb,
      epoch = 0L)
    Importance.removeBatch(spark,
      Importance.docBuckets(gone, "doc_id", "text", 8, Seq("lang")),
      col("lang") === "en", impb, epoch = 0L)
    BqIndex.removeIds(spark, bqb, ids)
    AnnIndex.removeVectors(spark, annb,
      ids.select($"doc_id".as("vec_id")), "vec_id")

    def cert(ts: Seq[Forget.Target]) =
      Forget.certificate(spark, ts).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    val a = cert(targetsA)
    val b = cert(targetsOf(tb, ddb, trib, lnb, impb, bqb, annb))
    assert(a === b, "composite purge must equal the individual removers")

    // sanity on the certified content: every per-doc artifact's id xor
    // is the xor over the SURVIVORS {1, 3, 5}
    val xor135 = spark.sql("SELECT bit_xor(cast(conv(substring(" +
      "md5(cast(id as string)), 1, 15), 16, 10) AS BIGINT)) FROM " +
      "VALUES (1), (3), (5) AS t(id)").collect()(0).getLong(0)
    val byName = a.map(r => r._1 -> r).toMap
    for (n <- Seq("text_index", "dedup_index", "bq_index", "ann_index"))
      assert(byName(n)._4 === xor135, s"$n survivor-id xor")
    // the shared-text twin: doc 1 survives although its exact twin 4
    // was purged — dedup keeps exactly 3 hash rows (1, 3, 5)
    assert(byName("dedup_index")._2 === 3L)

    // replay the SAME epoch: guarded artifacts no-op, idempotent ones
    // rewrite identically — the certificate must not move
    Forget.purgeDocs(spark, gone, "doc_id", targetsA, epoch = 0L)
    assert(cert(targetsA) === a, "replayed purge must not move state")
  }

  test("foreachBatchPurge: streamed deletion requests purge exactly " +
      "once across a full restart — final state equals the one-shot " +
      "purge of all requests") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    import graft.operators._

    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "beta gamma delta epsilon zeta eta", "en"),
      (3L, "one two three four five six", "de"),
      (4L, "seven eight nine ten eleven twelve", "en"),
      (5L, "totally different words here now too", "de")
    ).toDF("doc_id", "text", "lang")

    def buildThree(): (String, String, String) = {
      val (t, dd, tri) = (tmp("fs_text"), tmp("fs_dedup"), tmp("fs_tri"))
      TextIndex.build(docs, "doc_id", "text", t)
      DedupIndex.build(docs, "doc_id", "text", 3, 8, 4, dd)
      LmIndex.buildTrigram(docs, "doc_id", "text", tri)
      (t, dd, tri)
    }
    def targetsOf(t: String, dd: String, tri: String) = Seq(
      Forget.TextTarget(t, "doc_id"),
      Forget.DedupTarget(dd),
      Forget.TrigramTarget(tri, "text"))

    val (ta, dda, tria) = buildThree() // streamed
    val (tb, ddb, trib) = buildThree() // one-shot twin
    val targetsA = targetsOf(ta, dda, tria)

    val srcDir = tmp("fs_src")
    val ckpt = tmp("fs_ckpt")
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING, lang STRING")
        .json(srcDir)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(Forget.foreachBatchPurge(spark, "doc_id",
          targetsA))
        .start()
      q.awaitTermination()
    }
    // epoch 1: purge doc 2; FULL restart; epoch 2: purge doc 4
    docs.filter($"doc_id" === 2L).coalesce(1)
      .write.mode("append").json(srcDir)
    runOnce()
    docs.filter($"doc_id" === 4L).coalesce(1)
      .write.mode("append").json(srcDir)
    runOnce()

    Forget.purgeDocs(spark, docs.filter($"doc_id".isin(2L, 4L)),
      "doc_id", targetsOf(tb, ddb, trib), epoch = 0L)

    def cert(ts: Seq[Forget.Target]) =
      Forget.certificate(spark, ts).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
    assert(cert(targetsA) === cert(targetsOf(tb, ddb, trib)),
      "streamed purge must equal the one-shot purge of all requests")
    // a rerun with no new files replays nothing — state must not move
    val before = cert(targetsA)
    runOnce()
    assert(cert(targetsA) === before,
      "an empty replay must not move state")
  }
}
