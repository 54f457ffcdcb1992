package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Similarity}

/** [NS] multimodal plumbing: binary columns, partition-batched decode
  * (stubbed codec), feature extraction feeding similarity ops. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val blobs = {
    import spark.implicits._
    Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
  }

  test("decodeMeta: typed output, byte counts exact, deterministic stub") {
    implicit val s = spark
    val meta = Multimodal.decodeMeta(blobs)
    assert(meta.count() === 50)
    val r = meta.filter(_.id == 0L).collect()(0)
    assert(r.n_bytes > 0)
    assert(Seq("jpeg", "png", "webp").contains(r.format))
    // deterministic across runs
    val again = Multimodal.decodeMeta(blobs).filter(_.id == 0L).collect()(0)
    assert(r === again)
  }

  test("extractFeatures: fixed-dim vectors usable by Similarity.cosineTopK") {
    implicit val s = spark
    import spark.implicits._
    val feats = Multimodal.extractFeatures(blobs, dim = 16).toDF()
    val q = feats.orderBy("id").limit(1)
      .select(Similarity.vecD(col("feature")).as("qv"))
    val top = Similarity.cosineTopK(feats, "id", "feature", q, 5).collect()
    assert(top.length === 5)
    assert(top(0).getDouble(1) <= 1.000001)
  }

  test("resize: bounds dimensions, preserves aspect, deterministic") {
    implicit val s = spark
    val out = Multimodal.resize(blobs, 128, 128).collect()
    assert(out.length === 50)
    out.foreach { r =>
      assert(r.width <= 128 && r.height <= 128)
      assert(r.payload.nonEmpty)
    }
    val again = Multimodal.resize(blobs, 128, 128).collect()
    assert(out.map(r => (r.id, r.width, r.height)).toSet ===
      again.map(r => (r.id, r.width, r.height)).toSet)
  }

  test("sampleFrames: bounded fan-out with monotone offsets per id") {
    implicit val s = spark
    val frames = Multimodal.sampleFrames(blobs, everyMs = 1000, maxFrames = 4)
      .collect()
    assert(frames.nonEmpty)
    frames.groupBy(_.id).foreach { case (_, fs) =>
      assert(fs.length <= 4)
      assert(fs.sortBy(_.frame_idx).map(_.offset_ms).toSeq ===
        fs.map(_.frame_idx.toLong * 1000).sorted.toSeq)
    }
  }

  test("repartitionByBytes bounds partition count by payload volume") {
    val df = Multimodal.repartitionByBytes(blobs, totalBytes = 512L * 1024 * 1024,
      targetMB = 128)
    assert(df.rdd.getNumPartitions === 4)
  }
}
