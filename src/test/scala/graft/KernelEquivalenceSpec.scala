package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

/** The native text kernels (TextKernels via the graft_* expressions)
  * claim exact equivalence with their composable Spark-SQL forms — these
  * properties check that claim on adversarial strings: repeated/leading/
  * trailing spaces, empty strings, non-ASCII, astral-plane codepoints
  * (SQL substring counts codepoints, not UTF-16 units). The driver's
  * DuckDB oracle covers real data; this covers the corners real corpora
  * will eventually contain.
  */
object KernelEquivalenceSpec extends Properties("graft-kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** words incl. unicode + astral chars, joined with 1-2 spaces, with
    * occasional leading/trailing space */
  private val nastyText: Gen[String] = for {
    n <- Gen.choose(0, 12)
    words <- Gen.listOfN(n, Gen.oneOf(
      "the", "quick", "fox", "naïve", "日本語", "😀emoji",
      "𐀀x", "", "a"))
    sep <- Gen.oneOf(" ", "  ")
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ")
  } yield lead + words.mkString(sep) + trail

  private def df1(s: String) = Seq(Tuple1(s)).toDF("text")

  /** Composable distinct word n-gram SQL (empty when fewer than n words). */
  private def shinglesSql(n: Int): String =
    s"""CASE WHEN size(split(text, ' ')) < $n THEN array()
       ELSE array_distinct(transform(
         sequence(1, size(split(text, ' ')) - $n + 1),
         i -> concat_ws(' ', slice(split(text, ' '), i, $n)))) END"""

  property("graft_shingles == distinct n-grams of split(text,' ')") =
    forAll(nastyText, Gen.choose(1, 4)) { (text, n) =>
      val native = df1(text).select(
        graft.functions.ShingleExpression.wordShingles(col("text"), n))
        .collect()(0).getSeq[String](0)
      val composed = df1(text).selectExpr(shinglesSql(n))
        .collect()(0).getSeq[String](0)
      native.toList == composed.toList
    }

  property("graft_shingle_hashes == xxhash64 over the shingle set") =
    forAll(nastyText, Gen.choose(1, 4)) { (text, n) =>
      val native = df1(text).select(
        graft.functions.ShingleExpression.wordShingleHashes(col("text"), n))
        .collect()(0).getSeq[Long](0)
      val viaStrings = df1(text).select(
        transform(graft.functions.ShingleExpression.wordShingles(col("text"), n),
          g => xxhash64(g)))
        .collect()(0).getSeq[Long](0)
      native.toList == viaStrings.toList
    }

  property("graft_winnow == sorted distinct window-md5 prefix (codepoints)") =
    forAll(nastyText, Gen.choose(2, 6), Gen.choose(1, 4)) { (text, w, k) =>
      val native = df1(text).select(
        graft.functions.WinnowExpression.winnowFingerprint(col("text"), w, k))
        .collect()(0).getString(0)
      val composed = df1(text).selectExpr(
        s"""array_join(slice(array_sort(array_distinct(transform(
           sequence(1, greatest(length(text) - ${w - 1}, 1)),
           i -> md5(cast(substring(text, i, $w) AS BINARY))))), 1, $k), '|')""")
        .collect()(0).getString(0)
      native == composed
    }

  property("graft_minhash == min-agg of md5-half signatures over shingles") =
    forAll(nastyText) { text =>
      val native = df1(text).select(
        graft.functions.MinHashExpression.minhashSignature(col("text"), 3, 8))
        .collect()(0)
      val sh = graft.operators.Dedup.shingles(
        df1(text).withColumn("id", lit(1L)), "id", "text", 3)
      val agg = graft.operators.Dedup.minhashSignature(sh, "id", 8).collect()
      if (agg.isEmpty) native.isNullAt(0)
      else {
        val sig = native.getSeq[Long](0)
        (0 until 8).forall(i => sig(i) == agg(0).getLong(i + 1))
      }
    }

  property("graft_simhash == the SQL nibble-math pipeline") =
    forAll(nastyText) { text =>
      val native = df1(text).select(
        graft.functions.SimHashExpression.simhash32(col("text")))
        .collect()(0).getString(0)
      // the composable form the kernel replaced (per-word md5 nibbles)
      val composed = df1(text)
        .select(explode(array_distinct(split(col("text"), " "))).as("w"))
        .selectExpr("md5(cast(w AS BINARY)) AS h")
        .selectExpr("h", "explode(sequence(0, 31)) AS j")
        .selectExpr("j",
          "CAST(conv(substring(h, CAST(j / 4 AS INT) + 1, 1), 16, 10) AS LONG) AS nib")
        .selectExpr("j",
          "CAST(floor(nib / pow(2.0, CAST(3 - j % 4 AS DOUBLE))) AS LONG) % 2 AS bit")
        .groupBy(col("j"))
        .agg(sum(when(col("bit") === 1, 1).otherwise(-1)).as("s"))
        .withColumn("ch", when(col("s") >= 0, "1").otherwise("0"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("j"), col("ch")))),
          _.getField("ch")), "").as("sim"))
        .collect()(0).getString(0)
      native == composed
    }

  property("graft_simhash64 upper half == graft_simhash (same digest prefix)") =
    forAll(nastyText) { text =>
      // bits 0..31 of both signatures come from the first four md5 bytes
      // with the same vote rule, so the 64-bit long's upper half must be
      // exactly the 32-bit signature's bit string
      val row = df1(text).select(
        graft.functions.SimHashExpression.simhash64(col("text")).as("s64"),
        graft.functions.SimHashExpression.simhash32(col("text")).as("s32"))
        .collect()(0)
      val upper = row.getLong(0) >>> 32
      val s32 = java.lang.Long.parseLong(row.getString(1), 2)
      upper == s32
    }

  property("graft_simhash64 == per-bit vote over the first 8 digest bytes") =
    forAll(nastyText) { text =>
      val native = df1(text).select(
        graft.functions.SimHashExpression.simhash64(col("text")))
        .collect()(0).getLong(0)
      // reference: JVM-side recompute with independent byte math
      val words = text.split(" ", -1).distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      val acc = new Array[Int](64)
      words.foreach { w =>
        val dig = md.digest(w.getBytes("UTF-8"))
        val v = java.nio.ByteBuffer.wrap(dig, 0, 8).getLong
        (0 until 64).foreach(j =>
          acc(j) += (if (((v >>> (63 - j)) & 1L) == 1L) 1 else -1))
      }
      val expected = (0 until 64).foldLeft(0L)((s, j) =>
        if (acc(j) >= 0) s | (1L << (63 - j)) else s)
      native == expected
    }

  property("graft_sorted_isect == size(array_intersect) on sorted sets") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L)), Gen.listOf(Gen.choose(-50L, 50L))) {
      (a, b) =>
        val sa = a.distinct.sorted
        val sb = b.distinct.sorted
        val row = Seq((sa, sb)).toDF("a", "b")
          .select(
            graft.functions.VectorExpressions
              .sortedIntersectSize(col("a"), col("b")).as("native"),
            size(array_intersect(col("a"), col("b"))).cast("long")
              .as("composed"))
          .collect()(0)
        row.getLong(0) == row.getLong(1)
    }

  // containsNull=true TYPES must analyze (transform/lambda outputs are
  // typed that way even when null-free); the null-free CONTRACT moves to
  // runtime — an actual null element raises instead of corrupting the count
  property("graft_sorted_isect accepts containsNull=true null-free input") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L))) { a =>
      val sa = a.distinct.sorted
      val row = Seq(Tuple1(sa)).toDF("raw")
        // transform(x -> x) retypes the array containsNull=true
        .select(transform(col("raw"), x => x).as("a"))
        .select(graft.functions.VectorExpressions
          .sortedIntersectSize(col("a"), col("a")).as("native"))
        .collect()(0)
      row.getLong(0) == sa.size.toLong
    }

  property("graft_sorted_isect raises on an actual null element") =
    forAll(Gen.choose(-50L, 50L)) { v =>
      val df = Seq(Tuple1(Seq[java.lang.Long](null, v)))
        .toDF("a")
        .select(col("a").cast("array<long>").as("a"))
      try {
        df.select(graft.functions.VectorExpressions
          .sortedIntersectSize(col("a"), col("a"))).collect()
        false
      } catch {
        case e: Throwable =>
          var c: Throwable = e
          while (c.getCause != null && !c.getMessage.contains("null element"))
            c = c.getCause
          c.getMessage.contains("null element")
      }
    }

  property("graft_cdc_cuts == the HOF md5-slice filter (codepoints)") =
    forAll(nastyText, Gen.choose(2, 6), Gen.choose(1, 6)) { (text, w, bits) =>
      val native = df1(text).select(
        graft.functions.CdcExpression.cdcCuts(col("text"), w, bits))
        .collect()(0).getSeq[Int](0)
      val mod = 1 << bits
      val composed = df1(text).selectExpr(
        s"""CASE WHEN length(text) >= $w THEN
              filter(sequence($w, length(text)), i -> i < length(text) AND
                cast(conv(substring(md5(substring(text, i - ${w - 1}, $w)),
                  1, 8), 16, 10) as bigint) % $mod = 0)
            ELSE array() END""")
        .collect()(0).getSeq[Int](0)
      native.toList == composed.toList
    }
}
