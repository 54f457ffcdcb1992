package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** §2.10 — the custom Catalyst expressions are callable from SQL after
  * registration, with the same semantics as the Column API. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot and graft_shingles work on the SQL surface") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(dot === 32.0)
    val grams = spark.sql(
      "SELECT graft_shingles('a b c d a b c', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(grams === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("graft_simhash and graft_winnow work on the SQL surface") {
    GraftFunctions.register(spark)
    val sh = spark.sql("SELECT graft_simhash('the quick brown fox') AS s")
      .collect()(0).getString(0)
    assert(sh.length === 32 && sh.forall(c => c == '0' || c == '1'))
    // identical words → identical signature; distinct-word dedup means
    // repetition does not move any vote
    val same = spark.sql(
      "SELECT graft_simhash('fox quick the brown the') AS s")
      .collect()(0).getString(0)
    assert(same === sh)
    val fp = spark.sql("SELECT graft_winnow('abcdefghij', 4, 3) AS f")
      .collect()(0).getString(0)
    assert(fp.split('|').length === 3 && fp.matches("[0-9a-f|]+"))
    // graft_minhash: k longs for >= n words, NULL below n words
    val mh = spark.sql("SELECT graft_minhash('a b c d e', 3, 8) AS m")
      .collect()(0).getSeq[Long](0)
    assert(mh.length === 8)
    val short = spark.sql("SELECT graft_minhash('a b', 3, 8) AS m").collect()(0)
    assert(short.isNullAt(0))
    // graft_shingle_hashes == xxhash64 of each gram
    val gh = spark.sql(
      "SELECT graft_shingle_hashes('a b c d', 2) AS g").collect()(0)
      .getSeq[Long](0)
    val exp = spark.sql(
      "SELECT transform(graft_shingles('a b c d', 2), g -> xxhash64(g)) AS g")
      .collect()(0).getSeq[Long](0)
    assert(gh === exp)
  }

  test("graft_minhash_union Aggregator: incremental signature union on SQL") {
    GraftFunctions.register(spark)
    // three docs in two sources; per-doc 4-component signatures
    spark.sql("""SELECT * FROM VALUES
        ('a', array(5L, 9L, 2L, 7L)),
        ('a', array(3L, 11L, 4L, 7L)),
        ('b', array(1L, 1L, 1L, 1L))
      AS t(src, sig)""").createOrReplaceTempView("sigs")
    val rows = spark.sql(
      """SELECT src, graft_minhash_union(sig) AS u FROM sigs
        GROUP BY src ORDER BY src""").collect()
    // union = element-wise min: signature of the merged doc set
    assert(rows(0).getSeq[Long](1) === Seq(3L, 9L, 2L, 7L))
    assert(rows(1).getSeq[Long](1) === Seq(1L, 1L, 1L, 1L))
    // incremental property: fold a new batch into a stored signature
    val inc = spark.sql(
      """SELECT graft_minhash_union(sig) AS u FROM (
          SELECT array(3L, 9L, 2L, 7L) AS sig  -- stored union of src 'a'
          UNION ALL SELECT array(4L, 2L, 8L, 6L))""").collect()(0)
    assert(inc.getSeq[Long](0) === Seq(3L, 2L, 2L, 6L))
  }

  test("graft_bloom8k / graft_heavy64: sketch Aggregators on the SQL surface") {
    GraftFunctions.register(spark)
    // bloom: words sized for 8192 bits; member probes pass via the same
    // md5-position arithmetic the Scala side uses
    val bloomRow = spark.sql(
      """SELECT graft_bloom8k(transform(sequence(0, 2), j ->
          cast(conv(substring(md5(k), 1 + 8*j, 8), 16, 10) as bigint) % 8192))
            AS bloom
        FROM VALUES ('x'), ('y'), ('z') AS t(k)""").collect()(0)
    assert(bloomRow.getSeq[Long](0).length === 8192 / 64)
    spark.sql("SELECT * FROM VALUES ('x'), ('q') AS t(k)")
      .createOrReplaceTempView("bloom_probe_keys")
    val probes = spark.sql(
      """WITH b AS (SELECT graft_bloom8k(transform(sequence(0, 2), j ->
            cast(conv(substring(md5(k), 1 + 8*j, 8), 16, 10) as bigint) % 8192))
              AS bloom
          FROM VALUES ('x'), ('y'), ('z') AS t(k))
        SELECT k, forall(transform(sequence(0, 2), j ->
            cast(conv(substring(md5(k), 1 + 8*j, 8), 16, 10) as bigint) % 8192),
          p -> (shiftright(element_at(b.bloom, cast(shiftright(p, 6) as int) + 1),
                cast(p & 63 as int)) & 1) = 1) AS hit
        FROM bloom_probe_keys, b ORDER BY k""").collect()
    assert(probes.find(_.getString(0) == "x").get.getBoolean(1),
      "member must probe true")
    // heavy hitters: exact regime on SQL
    val m = spark.sql(
      """SELECT graft_heavy64(t) AS m FROM VALUES
        ('a'), ('a'), ('b') AS v(t)""").collect()(0)
      .getMap[String, Long](0)
    assert(m === Map("a" -> 2L, "b" -> 1L))
    // KMV: the sketch of a small hashed set is the sorted distinct set
    val kv = spark.sql(
      """SELECT graft_kmv256(cast(conv(substring(md5(k), 1, 15), 16, 10)
          AS bigint)) AS sk
        FROM VALUES ('x'), ('y'), ('z'), ('x') AS t(k)""").collect()(0)
      .getSeq[Long](0)
    assert(kv.length === 3 && kv === kv.sorted,
      "kmv sketch must be the sorted distinct hash set below k")
  }

  test("constant-arg builders reject columns and wrong arity with clear errors") {
    GraftFunctions.register(spark)
    val colArg = intercept[Exception] {
      spark.sql("SELECT graft_minhash(text, doc_id, 8) FROM VALUES ('a b c', 3) AS t(text, doc_id)").collect()
    }
    assert(colArg.getMessage.contains("graft_minhash"), colArg.getMessage)
    val arity = intercept[Exception] {
      spark.sql("SELECT graft_winnow('abc')").collect()
    }
    assert(arity.getMessage.contains("graft_winnow"), arity.getMessage)
  }

  test("graft_nfc: composes decomposed forms, identity on NFC input, " +
      "matches java.text.Normalizer on adversarial unicode") {
    GraftFunctions.register(spark)
    // decomposed e + combining acute -> precomposed e-acute
    val r = spark.sql("SELECT graft_nfc('cafe\\u0301') AS c").collect()(0)
    assert(r.getString(0) === "caf\u00e9")
    // already-NFC (incl. plain ASCII) passes through unchanged
    assert(spark.sql("SELECT graft_nfc('plain ascii') AS c")
      .collect()(0).getString(0) === "plain ascii")
    // adversarial: Hangul jamo composition, astral chars, combining
    // marks that do and don't compose, empty string
    val cases = Seq("\u1100\u1161",        // jamo -> precomposed syllable
      "\ud83d\ude00 A\u030a",             // astral emoji + A + ring
      "A\u0301\u0316", "")                 // above+below marks, empty
    cases.foreach { s0 =>
      val got = spark.createDataset(Seq(s0))(spark.implicits.newStringEncoder)
        .toDF("t").selectExpr("graft_nfc(t) AS c").collect()(0).getString(0)
      val want = java.text.Normalizer
        .normalize(s0, java.text.Normalizer.Form.NFC)
      assert(got === want, s"input codepoints: ${s0.map(_.toInt)}")
    }
    assert(spark.sql("SELECT graft_nfc(CAST(NULL AS STRING)) AS c")
      .collect()(0).isNullAt(0))
  }

  test("graft_top3: equals the window form — ties break on id, short " +
      "groups return all rows, result invariant under repartitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    // group a: 5 rows with a score tie at the k-boundary (two 30s);
    // group b: fewer rows than k
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 50L),
      ("a", 5L, 20L),
      ("b", 6L, 7L), ("b", 7L, 7L)).toDF("g", "id", "score")
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"g").agg(expr("graft_top3(score, id)").as("t"))
      .select($"g", posexplode($"t").as(Seq("i", "p")))
      .select($"g", $"i", $"p._2".as("id"), $"p._1".as("score"))
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val got = run(rows)
    assert(got === Set(
      ("a", 0, 4L, 50L), ("a", 1, 2L, 30L), ("a", 2, 3L, 30L),
      ("b", 0, 6L, 7L), ("b", 1, 7L, 7L)))
    // partitioning must not change anything (mergeable partial buffers)
    assert(run(rows.repartition(7)) === got)
    // Long.MinValue score must rank WORST, not best (negation overflow)
    val extreme = Seq(("x", 1L, Long.MinValue), ("x", 2L, 0L))
      .toDF("g", "id", "score")
    assert(run(extreme) === Set(
      ("x", 0, 2L, 0L), ("x", 1, 1L, Long.MinValue)))
  }

  test("registration is idempotent and null-safe") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(NULL, array(1.0D)) AS d").collect()(0)
    assert(r.isNullAt(0))
    val s = spark.sql("SELECT graft_shingles('a b', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(s === Seq.empty)
  }

  test("graft_ac_counts: Aho-Corasick phrase counts — token boundaries, " +
      "case folding, overlapping matches, shared prefixes via fail links") {
    GraftFunctions.register(spark)
    def counts(text: String, phrases: String): Seq[Long] =
      spark.sql(s"SELECT graft_ac_counts('$text', '$phrases') AS c")
        .collect()(0).getSeq[Long](0)
    // token-boundary: 'low key' must NOT match inside 'slow key'
    assert(counts("the slow key turns", "low key|slow key") ===
      Seq(0L, 1L))
    // case folding on both sides (phrase config and document text)
    assert(counts("BAD Word here", "bad word") === Seq(1L))
    // overlapping matches all count: 'a a' in 'a a a' occurs twice
    assert(counts("a a a", "a a") === Seq(2L))
    // fail links: after matching 'a b', the automaton must still catch
    // 'b c' (suffix continuation), and a 1-token phrase nested inside a
    // longer one counts independently
    assert(counts("a b c d", "a b|b c|c") === Seq(1L, 1L, 1L))
    assert(counts("x a a a y", "a|a a a") === Seq(3L, 1L))
    // absent phrase → 0; empty text → all zeros
    assert(counts("nothing to see", "free money now") === Seq(0L))
    assert(counts("", "a|b c") === Seq(0L, 0L))
    // malformed phrase lists are rejected LOUDLY at registration, not
    // silently mangled: a trailing '|' would drop a segment, an
    // interior '||' would build an empty-token phrase that matches the
    // empty tokens consecutive document spaces produce
    for (bad <- Seq("a|", "a||b", "|a", " |a")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_ac_counts('x', '$bad')").collect()
      }
      assert(e.getMessage.contains("blank phrase") ||
        Option(e.getCause).exists(_.getMessage.contains("blank phrase")),
        s"for '$bad': ${e.getMessage}")
    }
    // a phrase with consecutive interior spaces (empty token) is
    // rejected by the automaton builder itself
    val e2 = intercept[Exception] {
      graft.functions.AcAutomaton.build(Seq("a  b"))
    }
    assert(e2.getMessage.contains("empty token"))
  }

  test("phraseBlocklistGate: gate columns fold the count array — " +
      "inclusive budget, pass/block verdicts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean text with nothing listed"),
      (2L, "slow key appears once only"),
      (3L, "slow key slow key slow key")).toDF("doc_id", "text")
    val got = graft.operators.Curation.phraseBlocklistGate(
        docs, "doc_id", "text", Seq("Slow Key", "free money"),
        maxHits = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, true),
      (2L, 1L, 1L, true),   // inclusive budget: 1 <= 2 passes
      (3L, 3L, 1L, false))) // 3 > 2 blocks
  }
}
