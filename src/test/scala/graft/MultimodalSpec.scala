package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, Similarity}

/** [NS] multimodal plumbing: binary columns, partition-batched REAL image
  * decode (JDK ImageIO) with a deterministic stub fallback for unreadable
  * payloads, feature extraction feeding similarity ops. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val blobs = {
    import spark.implicits._
    Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("payload"))
  }

  /** Synthesize a real image driver-side: gradient fill so resampling has
    * signal, encoded with the JDK's own writers. */
  private def imageBytes(w: Int, h: Int, fmt: String,
      rgb: (Int, Int) => Int = (x, y) => ((x * 7) ^ (y * 13)) & 0xffffff): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb(x, y))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private lazy val imageBlobs = {
    import spark.implicits._
    Seq(
      (1L, imageBytes(400, 200, "png")),
      (2L, imageBytes(64, 48, "jpeg")),
      (3L, imageBytes(100, 300, "png")),
      (4L, "definitely not an image".getBytes("UTF-8"))
    ).toDF("id", "payload")
  }

  test("decodeMeta: real ImageIO decode — true formats and dimensions") {
    implicit val s = spark
    val meta = Multimodal.decodeMeta(imageBlobs).collect().map(m => m.id -> m).toMap
    assert(meta(1L).format === "png" && meta(1L).width === 400 &&
      meta(1L).height === 200 && meta(1L).decoded)
    assert(meta(2L).format === "jpeg" && meta(2L).width === 64 &&
      meta(2L).height === 48 && meta(2L).decoded)
    assert(meta(3L).width === 100 && meta(3L).height === 300)
    // unreadable payload routes to the deterministic stub fallback
    assert(!meta(4L).decoded)
    assert(meta(4L).n_bytes === "definitely not an image".getBytes("UTF-8").length)
  }

  test("decodeMeta: typed output, byte counts exact, deterministic fallback") {
    implicit val s = spark
    val meta = Multimodal.decodeMeta(blobs)
    assert(meta.count() === 50)
    val r = meta.filter(_.id == 0L).collect()(0)
    assert(r.n_bytes > 0)
    assert(!r.decoded) // text bytes are not an image — stub fallback
    assert(Seq("jpeg", "png", "webp").contains(r.format))
    // deterministic across runs
    val again = Multimodal.decodeMeta(blobs).filter(_.id == 0L).collect()(0)
    assert(r === again)
  }

  test("perceptualHash + hammingPairs64: re-encoded/lightly-noised image " +
      "pairs found, distinct images do not pair, junk flagged undecoded") {
    implicit val s = spark
    import spark.implicits._
    // a strong-signal gradient; A' = same pixels PNG-encoded at another
    // size via real resize (aHash is the invariant that survives this);
    // B = the inverted gradient (designed far from A)
    def grad(x: Int, y: Int): Int = { val v = math.min(255, x); (v << 16) | (v << 8) | v }
    def inv(x: Int, y: Int): Int = { val v = math.min(255, 255 - x); (v << 16) | (v << 8) | v }
    val a = imageBytes(256, 64, "png", grad)
    val aJpeg = imageBytes(256, 64, "jpeg", grad) // lossy re-encode of A
    val b = imageBytes(256, 64, "png", inv)
    val blobs = Seq((1L, a), (2L, aJpeg), (3L, b),
      (4L, "junk bytes".getBytes("UTF-8")),
      (5L, "different junk".getBytes("UTF-8"))).toDF("id", "payload")
    val hashes = Multimodal.perceptualHash(blobs)
    val hm = hashes.collect().map(h => h.id -> h).toMap
    assert(hm(1L).decoded && hm(2L).decoded && hm(3L).decoded)
    assert(!hm(4L).decoded && !hm(5L).decoded) // junk: stub hash, marked
    // full-width stub: distinct junk blobs land far apart in all four
    // 16-bit bands (the old 32-bit stub shared its upper two bands)
    assert((0 until 4).forall { b =>
      ((hm(4L).phash >>> (b * 16)) & 0xffffL) !=
        ((hm(5L).phash >>> (b * 16)) & 0xffffL)
    }, f"junk stubs share a band: ${hm(4L).phash}%016x ${hm(5L).phash}%016x")
    // dedup over the hashes rides the generic 64-bit band join —
    // decoded=false rows are filtered first per the perceptualHash
    // contract (near-Hamming on a byte hash is meaningless)
    val pairs = graft.operators.Dedup
      .hammingPairs64(hashes.filter(_.decoded).toDF(), "id", "phash",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"re-encode pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"inverted gradient must not pair: $pairs")
  }

  test("imageDedup: stub rows NEVER reach the band join — undecodables " +
      "pair only as exact byte copies, decoded images only perceptually") {
    implicit val s = spark
    import spark.implicits._
    def grad(x: Int, y: Int): Int = { val v = math.min(255, x); (v << 16) | (v << 8) | v }
    val a = imageBytes(256, 64, "png", grad)
    val aJpeg = imageBytes(256, 64, "jpeg", grad)
    val junk = "junk bytes".getBytes("UTF-8")
    val blobs = Seq(
      (1L, a), (2L, aJpeg),               // near-dup decoded pair
      (4L, junk), (5L, "different junk".getBytes("UTF-8")),
      (6L, junk.clone())                  // exact byte copy of 4
    ).toDF("id", "payload")
    val pairs = Multimodal.imageDedup(blobs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    assert(pairs.keySet === Set((1L, 2L), (4L, 6L)), pairs)
    assert(!pairs((1L, 2L))._2, "decoded pair wrongly flagged exact_stub")
    assert(pairs((4L, 6L)) === ((0L, true)),
      "byte-copy stubs must pair exactly at hamming 0")
    // the load-bearing negative: id 5 (distinct junk) pairs with NOTHING
    // — through the wrapper a stub can never band-collide its way in
    assert(!pairs.keySet.exists(p => p._1 == 5L || p._2 == 5L), pairs)
  }

  test("resize: real pixel scale — aspect preserved, output decodes to claimed dims") {
    implicit val s = spark
    val out = Multimodal.resize(imageBlobs, 128, 128).collect()
      .map(r => r.id -> r).toMap
    // 400x200 → bounded by width: 128x64
    assert(out(1L).width === 128 && out(1L).height === 64)
    // 100x300 → bounded by height: 42x128
    assert(out(3L).width === 42 && out(3L).height === 128)
    // the resized payload is a real PNG of exactly the claimed dimensions
    val reread = ImageIO.read(new ByteArrayInputStream(out(1L).payload))
    assert(reread.getWidth === 128 && reread.getHeight === 64)
    // already inside the box → byte-identical passthrough (no recompress)
    assert(out(2L).width === 64 && out(2L).height === 48)
    assert(out(2L).payload.toSeq === imageBytes(64, 48, "jpeg").toSeq)
  }

  test("extractFeatures: real luminance grid on images, stub on junk") {
    implicit val s = spark
    // uniform mid-gray image → every grid cell ≈ 0 after [-1,1] scaling
    import spark.implicits._
    val gray = Seq((1L, imageBytes(32, 32, "png", (_, _) => 0x808080)))
      .toDF("id", "payload")
    val feat = Multimodal.extractFeatures(gray, dim = 16).collect()(0).feature
    assert(feat.length === 16)
    assert(feat.forall(v => math.abs(v) < 0.02))
    // junk payload still yields a deterministic fixed-dim vector
    val junk = Multimodal.extractFeatures(imageBlobs.filter($"id" === 4L),
      dim = 16).collect()(0).feature
    assert(junk.length === 16)
    assert(junk.forall(v => v >= -1.0f && v <= 1.0f))
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

  /** Multi-frame animated GIF via the JDK's own writer. */
  private def animatedGif(frames: Int, w: Int, h: Int): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        for (x <- 0 until w; y <- 0 until h)
          img.setRGB(x, y, (f * 40) << 16 | (x * 8) << 8 | (y * 8))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  test("sampleFrames: real frames from an animated GIF, stub for junk") {
    implicit val s = spark
    import spark.implicits._
    val media = Seq((1L, animatedGif(6, 20, 20))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(media, everyMs = 500, maxFrames = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.length === 3)
    assert(frames.map(_.offset_ms).toSeq === Seq(0L, 500L, 1000L))
    // every sampled frame is a real decodable image of the GIF's dims
    frames.foreach { f =>
      val img = ImageIO.read(new ByteArrayInputStream(f.payload))
      assert(img.getWidth === 20 && img.getHeight === 20)
    }
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

  test("decodeAudioMeta: real javax.sound probe — true WAV parameters") {
    import spark.implicits._
    implicit val s = spark
    val wavs = Seq(
      (1L, Multimodal.synthWavBytes(8000, 1, 4000)),
      (2L, Multimodal.synthWavBytes(44100, 2, 22050)),
      (3L, "definitely not audio".getBytes("UTF-8"))
    ).toDF("id", "payload")
    val metas = Multimodal.decodeAudioMeta(wavs).collect()
      .map(m => m.id -> m).toMap
    assert(metas(1L).decoded && metas(1L).container === "wave")
    assert(metas(1L).sample_rate === 8000 && metas(1L).channels === 1)
    assert(metas(1L).n_frames === 4000L)
    assert(metas(2L).sample_rate === 44100 && metas(2L).channels === 2)
    assert(metas(2L).n_frames === 22050L)
    // canonical RIFF container: 44-byte header + frames * ch * 2
    assert(metas(1L).n_bytes === 44L + 4000 * 1 * 2)
    assert(metas(2L).n_bytes === 44L + 22050 * 2 * 2)
    assert(!metas(3L).decoded) // junk routes to the stub, never throws
  }

  test("extractAudioFeatures: RMS grid — silence is zero, sine is the " +
      "known RMS, junk falls back to the stub") {
    import spark.implicits._
    implicit val s = spark
    val wavs = Seq(
      (1L, Multimodal.synthWavBytes(8000, 1, 8000, amplitude = 0.0)),
      (2L, Multimodal.synthWavBytes(8000, 1, 8000, freqHz = 440,
        amplitude = 0.5)),
      (3L, Array[Byte](1, 2, 3))
    ).toDF("id", "payload")
    val feats = Multimodal.extractAudioFeatures(wavs, dim = 8).collect()
      .map(f => f.id -> f.feature).toMap
    assert(feats.values.forall(_.length === 8))
    assert(feats(1L).forall(v => math.abs(v) < 1e-6), "silence must be 0")
    // sine RMS = amplitude / sqrt(2) ≈ 0.3536; generous tolerance for
    // 16-bit quantization and segment boundaries
    assert(feats(2L).forall(v => math.abs(v - 0.3536f) < 0.01),
      feats(2L).mkString(","))
    assert(feats(3L).exists(v => v != 0.0f)) // stub features, deterministic
  }

  test("syntheticFrameEnergy: rms² ≡ mean-square before the floor, " +
      "peak bounds rms, amplitude steps separate frames") {
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val out = Multimodal.syntheticFrameEnergy(
        Seq(0L, 1L, 5L).toDF("id"), 2048, 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getFloat(4)))
    assert(out.length === 24)
    for ((id, f, meanSq, peak, rms) <- out) {
      // mean_sq is the floored rms²: rms² ∈ [mean_sq, mean_sq + 1),
      // up to the float cast's 2^-24 relative error (≈2·meanSq·2^-24
      // after squaring)
      val r2 = rms.toDouble * rms.toDouble
      val tol = meanSq.toDouble * 2.5e-7 + 1e-3
      assert(r2 >= meanSq - tol && r2 < meanSq + 1.0 + tol,
        s"id=$id f=$f rms²=$r2 mean_sq=$meanSq")
      assert(peak.toDouble >= rms - 1e-3, s"peak $peak < rms $rms")
      assert(peak <= 32768L) // |−32768| at full amplitude
    }
    // id 0: divisor = 1 + (frame % 4) → frames 0 and 4 are the loud
    // full-amplitude ones, frame 3 is quartered
    val byFrame = out.filter(_._1 == 0L).map(r => r._2 -> r._3).toMap
    assert(byFrame(0) > byFrame(3) && byFrame(4) > byFrame(7),
      byFrame.toString)
    // deterministic: a second run is bit-identical
    val again = Multimodal.syntheticFrameEnergy(
        Seq(0L, 1L, 5L).toDF("id"), 2048, 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getFloat(4)))
    assert(out.sortBy(r => (r._1, r._2)).toSeq ===
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
