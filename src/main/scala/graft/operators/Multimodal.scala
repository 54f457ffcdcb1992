package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [NS] multimodal-column plumbing: image/audio/video payloads as opaque
  * BinaryType columns with typed metadata, processed batch-at-a-time in
  * executor partitions (the Scala analogue of mapInPandas batches).
  *
  * The codec itself is STUBBED — no image/audio libraries exist in this
  * environment — with a deterministic fake decoder, clearly marked below.
  * Everything around it is real and load-bearing: schema, partition-size
  * control (blobs never enter wide shuffles; operate on (id, payload) and
  * join scalars back), batch shape, and typed output.
  *
  * Reference precedent: the BLOB thumbnail column + fetch/dump stages
  * (schema.sql:49; cmds/archive.py:84-95, 201-221).
  */
object Multimodal {

  /** Decoded-media metadata row. */
  case class MediaMeta(id: Long, n_bytes: Long, format: String,
      width: Int, height: Int)

  /** Fixed-size feature row (embedding-like). */
  case class MediaFeature(id: Long, feature: Array[Float])

  // ======================================================================
  // STUB — deterministic fake codec. Replace with a real decoder (e.g.
  // javax.imageio / ffmpeg bindings) when the runtime has codecs. The
  // fake derives all outputs from the payload bytes so tests are stable.
  // ======================================================================
  private[operators] def decodeStub(bytes: Array[Byte]): (String, Int, Int) = {
    val h = java.util.Arrays.hashCode(bytes)
    val fmt = Seq("jpeg", "png", "webp")(math.floorMod(h, 3))
    val w = 64 + math.floorMod(h >> 2, 1024)
    val hgt = 64 + math.floorMod(h >> 12, 1024)
    (fmt, w, hgt)
  }

  private[operators] def featureStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var acc = 0x9e3779b9
    var i = 0
    while (i < dim) {
      acc = acc * 31 + (if (bytes.isEmpty) i else bytes(i % bytes.length).toInt)
      out(i) = (math.floorMod(acc, 2048) - 1024) / 1024.0f
      i += 1
    }
    out
  }
  // ======================================================================

  /** Decode pass: (id, payload BINARY) → MediaMeta, partition-at-a-time.
    * mapPartitions (not per-row UDF) so a real codec can amortize init
    * (decoder contexts, native buffers) across the batch — the same reason
    * mapInPandas batches exist. */
  def decodeMeta(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: init decoder once per partition here
        rows.map { case (id, bytes) =>
          val (fmt, w, h) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, fmt, w, h)
        }
      }
  }

  /** Feature-extraction pass: (id, payload) → fixed-dim float vector,
    * ready for the Similarity operators. */
  def extractFeatures(df: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        MediaFeature(id, featureStub(bytes, dim))
      })
  }

  /** Resized-media row: payload replaced by the (stub-)resized bytes. */
  case class ResizedMedia(id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Sampled frame: one row per extracted frame. */
  case class Frame(id: Long, frame_idx: Int, offset_ms: Long,
      payload: Array[Byte])

  /** Resize pass: (id, payload) → target box, aspect preserved. The codec
    * is the stub (real impl: scale pixels); the plumbing — partition-
    * batched transform, metadata recompute, byte output — is real. */
  def resize(df: DataFrame, maxW: Int, maxH: Int)(
      implicit spark: SparkSession): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        val (_, w, h) = decodeStub(bytes)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val (nw, nh) = (math.max(1, (w * scale).toInt),
          math.max(1, (h * scale).toInt))
        // STUB: real impl re-encodes pixels; fake keeps a size-scaled slice
        val outLen = math.max(1, (bytes.length * scale * scale).toInt)
        ResizedMedia(id, nw, nh, bytes.take(outLen))
      })
  }

  /** Frame sampling (video-style): every `everyMs` up to `maxFrames` per
    * payload — one output row per frame, exploded executor-side (no
    * driver fan-out). STUB decodes a deterministic slice per frame. */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000, maxFrames: Int = 8)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    df.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val durationMs = 500L + (math.abs(
          java.util.Arrays.hashCode(bytes)) % 10000) // STUB duration probe
        val n = math.min(maxFrames, (durationMs / everyMs + 1).toInt)
        (0 until n).map { i =>
          val off = i * everyMs
          val start = (off % math.max(1, bytes.length)).toInt
          Frame(id, i, off, bytes.slice(start,
            math.min(bytes.length, start + 16))) // STUB frame bytes
        }
      }
  }

  /** Size-bounded repartition for blob processing: target ~`targetMB` of
    * payload per partition so decoder memory stays bounded regardless of
    * row count — the knob that matters at 100 TB (row-count partitioning
    * explodes when blob sizes are skewed). */
  def repartitionByBytes(df: DataFrame, totalBytes: Long,
      targetMB: Int = 128): DataFrame = {
    val parts = math.max(1, (totalBytes / (targetMB * 1024L * 1024L)).toInt)
    df.repartition(parts, col("id"))
  }
}
