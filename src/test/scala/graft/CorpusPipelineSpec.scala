package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Curation, Dedup}

/** [NS] end-to-end corpus curation: the training-data flow composed from
  * the operators the queries certify individually — near-dup clustering →
  * representative survivors → deterministic split → chunk → pack — with
  * the cross-stage invariants a production pipeline owes its corpus
  * asserted in ONE run over the real testdata fixtures (the golden-flow
  * companion to GoldenPipelineSpec's yark write path).
  */
class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("documents → dedup clusters → survivors → split → chunk → pack") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val total = docs.count()

    // 1. near-dup clusters: LSH candidates closed transitively; keep the
    // cluster representative (min id) plus every unclustered doc
    val pairs = Dedup.minhashLshCandidates(docs, "doc_id", "text",
      shingleN = 3, k = 8, bands = 4)
    val clustered = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("rep"))
    val survivors = docs.join(clustered, Seq("doc_id"), "left")
      .filter($"rep".isNull || $"rep" === $"doc_id")
      .drop("rep")
      .localCheckpoint(true)
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv < total, s"survivors $nSurv of $total")
    // invariant: no two survivors share a cluster
    val shared = survivors.join(clustered, Seq("doc_id"))
      .groupBy($"rep").agg(count(lit(1)).as("n")).filter($"n" > 1)
    assert(shared.isEmpty, "two survivors share a near-dup cluster")

    // 1b. duplicate-SPAN removal over the survivors (the C4/Dolma
    // boilerplate cut composes after doc-level dedup): rebuilt text only
    // ever shrinks, every kept doc still has content, and the op is
    // idempotent — a second pass changes nothing (all segments are
    // already first occurrences of themselves)
    val cleaned = Curation.dedupSpans(survivors, "doc_id", "text", n = 10)
      .withColumnRenamed("clean_text", "text")
      .localCheckpoint(true)
    assert(cleaned.count() > 0)
    assert(cleaned.join(survivors.select($"doc_id",
        length($"text").as("l0")), Seq("doc_id"))
      .filter(length($"text") > $"l0").isEmpty,
      "span removal must never grow a document")
    val twice = Curation.dedupSpans(cleaned, "doc_id", "text", n = 10)
      .withColumnRenamed("clean_text", "text")
    assert(twice.select($"doc_id", md5($"text").as("h")).sort("doc_id")
      .collect().toSeq ===
      cleaned.select($"doc_id", md5($"text").as("h")).sort("doc_id")
        .collect().toSeq,
      "dedupSpans must be idempotent")

    // 2. deterministic split partitions the survivors exactly
    val split = Curation.assignSplit(survivors, "doc_id")
    val bySplit = split.groupBy($"split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum === nSurv, "split must partition survivors")
    assert(bySplit("train") > bySplit.getOrElse("val", 0L),
      "80/10/10 shape: train dominates")

    // 3. chunking with stride == size covers the training text exactly:
    // total chunk length equals total text length (nothing lost, nothing
    // duplicated)
    val train = split.filter($"split" === "train")
    val chunks = Curation.chunk(train, "doc_id", "text",
      size = 200, stride = 200).localCheckpoint(true)
    val trainLen = train.agg(sum(length($"text"))).first().getLong(0)
    assert(chunks.agg(sum($"chunk_len")).first().getLong(0) === trainLen)

    // 4. packing: every chunk lands in exactly one pack, lengths are
    // conserved, and pack membership is deterministic
    val packed = Curation.packChunks(chunks, "doc_id", "chunk_idx",
      "chunk_len", ctxLen = 400, shards = 8)
    assert(packed.count() === chunks.count(), "chunks must pack exactly once")
    assert(packed.select($"doc_id", $"chunk_idx").distinct().count()
      === chunks.count())
    assert(packed.agg(sum($"chunk_len")).first().getLong(0) === trainLen)
    val packs = packed.groupBy($"pack_id")
      .agg(sum($"chunk_len").as("l")).cache()
    try {
      // greedy cumsum: a pack may overflow by at most one chunk (< 200)
      assert(packs.filter($"l" > 400 + 200).isEmpty,
        "pack exceeds budget by more than one chunk")
      assert(packs.count() >= trainLen / 600,
        "fewer packs than the budget bound allows")
    } finally packs.unpersist(blocking = false)
  }
}
