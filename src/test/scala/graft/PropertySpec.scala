package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions.col
import graft.operators.{Dedup, Integrity, Upsert}

/** SURVEY §5.3 — property-based invariants: upsert idempotence, cascade
  * soundness (no orphans), replace-by-key completeness, dedup accounting.
  * Few-but-large property runs (Spark jobs are the cost). */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val kvBatch: Gen[List[(String, String)]] =
    Gen.listOfN(12, Gen.zip(
      Gen.oneOf((1 to 6).map("k" + _)), Gen.alphaStr.map(_.take(4))))

  property("W1 insertIfAbsent is idempotent: f(f(base,b),b) == f(base,b)") =
    forAll(kvBatch, kvBatch) { (baseRows, batchRows) =>
      val base = baseRows.toDF("k", "v").dropDuplicates("k")
      val batch = batchRows.toDF("k", "v")
      val once = Upsert.insertIfAbsent(base, batch, Seq("k"), Some("v"))
      val twice = Upsert.insertIfAbsent(once, batch, Seq("k"), Some("v"))
      val a = once.collect().map(r => (r.getString(0), r.getString(1))).toSet
      val b = twice.collect().map(r => (r.getString(0), r.getString(1))).toSet
      a == b
    }

  private val edges: Gen[List[(String, Option[String])]] = for {
    n <- Gen.choose(4, 10)
  } yield (1 to n).map { i =>
    // parent is always a lower id → acyclic forest
    val parent = if (i == 1) None else Some("c" + (1 + (i * 7) % (i - 1)))
    ("c" + i, parent)
  }.toList

  property("J3 cascadeRecursive leaves no orphans (every survivor's parent survives)") =
    forAll(edges) { es =>
      val df = es.map { case (id, p) => (id, p.orNull) }
        .toDF("comment_id", "parent")
      val deleted = Integrity.cascadeRecursive(df, "comment_id", "parent",
        Seq("c1").toDF("comment_id"))
        .as[String].collect().toSet
      val survivors = es.map(_._1).filterNot(deleted.contains).toSet
      es.forall { case (id, p) =>
        !survivors.contains(id) || p.forall(survivors.contains)
      } && deleted.contains("c1")
    }

  property("W4 replaceByKey: incoming wins, other keys untouched") =
    forAll(kvBatch, kvBatch) { (baseRows, replRows) =>
      val base = baseRows.toDF("k", "v").dropDuplicates("k")
      val repl = replRows.toDF("k", "v").dropDuplicates("k")
      val out = Upsert.replaceByKey(base, repl, Seq("k"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val baseM = base.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val replM = repl.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      (baseM.keySet ++ replM.keySet) == out.keySet &&
        replM.forall { case (k, v) => out(k) == v } &&
        (baseM -- replM.keySet).forall { case (k, v) => out(k) == v }
    }

  property("D5 exactGroups partitions the corpus: sum(n_copies) == row count") =
    forAll(Gen.listOfN(10, Gen.oneOf("alpha", "beta", "gamma", "delta"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val groups = Dedup.exactGroups(df, "doc_id", "text").collect()
      groups.map(_.getAs[Long]("n_copies")).sum == texts.length &&
        groups.length == texts.distinct.length
    }

  private val randomPairs: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 14)
    pairs <- Gen.listOfN(n,
      Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
  } yield pairs.filter { case (a, b) => a != b }.map {
    case (a, b) => (math.min(a, b), math.max(a, b))
  }

  property("D5 connectedComponents == reference union-find closure on random graphs") =
    forAll(randomPairs) { pairs =>
      pairs.isEmpty || {
        // driver-side union-find as the independent reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap
        val df = pairs.toDF("doc_a", "doc_b")
        val got = Dedup.connectedComponents(df, "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val gotDoubling = Dedup
          .connectedComponentsDoubling(df, "doc_a", "doc_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // hybrid with an aggressive stall trigger so random graphs also
        // exercise the escalated (doubling) phase, not just hash-min
        val gotHybrid = Dedup
          .connectedComponentsHybrid(df, "doc_a", "doc_b", stallRounds = 1)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == expected && gotDoubling == expected && gotHybrid == expected
      }
    }

  // magnitudes far past sf0.1 (±1e9 ≈ ±$10M money values) with duplicates:
  // pins the decimal-widened path where long sums of squares would overflow
  private val outlierVals: Gen[List[Long]] = for {
    base <- Gen.nonEmptyListOf(Gen.choose(-1000000000L, 1000000000L))
    rep <- Gen.choose(1, 4)
  } yield List.fill(rep)(base).flatten.take(60)

  property("[NS] exactOutliers matches a BigInt reference (incl. negatives)") =
    forAll(outlierVals, Gen.choose(1, 3)) { (vals, k) =>
      val n = BigInt(vals.size)
      val s = vals.map(BigInt(_)).sum
      val ss = vals.map(v => BigInt(v) * v).sum
      val expected = vals.zipWithIndex.map { case (x, i) =>
        val dev = n * x - s
        (i.toLong, dev * dev > k * k * (n * ss - s * s))
      }.toMap
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("i", "grp", "v")
      val got = graft.operators.Curation.exactOutliers(df, "grp", "v", k)
        .collect().map(r => r.getAs[Long]("i") -> r.getAs[Boolean]("is_out"))
        .toMap
      got == expected
    }

  // docs over a tiny vocab so cross-doc segment collisions are common —
  // exactly what the global-first-occurrence rule must arbitrate
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    docs <- Gen.listOfN(nDocs, Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("[NS] dedupSpans matches a JVM first-occurrence reference") =
    forAll(corpusGen, Gen.choose(1, 3)) { (docs, n) =>
      // reference: global first occurrence by (doc_id, seg_idx), kept
      // segments reassembled in order — independent re-derivation of the
      // C4/Dolma cut over the same segmentation
      val segs = docs.filter(_._2.nonEmpty).flatMap { case (id, t) =>
        t.split(" ", -1).grouped(n).zipWithIndex
          .map { case (ws, i) => (id, i.toLong, ws.mkString(" ")) }
      }
      val firsts = segs.groupBy(_._3).map { case (seg, occ) =>
        seg -> occ.map(o => (o._1, o._2)).min
      }
      val expected = segs
        .filter(s => firsts(s._3) == ((s._1, s._2)))
        .groupBy(_._1)
        .map { case (id, kept) =>
          id -> ((kept.sortBy(_._2).map(_._3).mkString(" "),
            kept.size.toLong))
        }
      val got = graft.operators.Curation
        .dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      got == expected
    }

  property("[NS] scd2Apply == scd2Build from scratch at ANY cutoff " +
      "(random streams incl. equal timestamps)") =
    forAll(
      Gen.listOfN(18, Gen.zip(Gen.choose(1L, 4L), Gen.oneOf("a", "b", "c"),
        Gen.choose(0L, 9L))),
      Gen.choose(0L, 9L)) { (evs, cutoff) =>
      // ordinal doubles as unique tiebreak; ts collisions on purpose
      val rows = evs.zipWithIndex.map { case ((u, a, t), i) =>
        (u, a, new java.sql.Timestamp(t * 3600000L), i.toLong)
      }
      val cols = Seq("user_id", "event_type", "ts", "event_id")
      val df = rows.toDF(cols: _*)
      val cutTs = new java.sql.Timestamp(cutoff * 3600000L)
      val hist = df.filter($"ts" < cutTs)
      val delta = df.filter($"ts" >= cutTs)
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4)))
          .sortBy(t => (t._1, t._3.getTime, t._2, t._5))
      val applied = graft.operators.Analytics.scd2Apply(
        graft.operators.Analytics.scd2Build(hist, "user_id",
          "event_type", "ts", $"event_id"),
        delta, "user_id", "event_type", "ts", "event_id")
      val scratch = graft.operators.Analytics.scd2Build(df, "user_id",
        "event_type", "ts", $"event_id")
      canon(applied).sameElements(canon(scratch))
    }

  property("[NS] KMV sketch == sorted distinct bottom-k for arbitrary " +
      "inputs and partitionings") =
    forAll(Gen.listOf(Gen.choose(0L, 200L)), Gen.choose(1, 5),
      Gen.choose(1, 6)) { (hs, k, parts) =>
      hs.isEmpty || {
        val kmvU = org.apache.spark.sql.functions.udaf(
          graft.functions.KmvSketchAggregator(k))
        val got = hs.toDF("h").repartition(parts)
          .agg(kmvU($"h").as("sk")).collect()(0).getSeq[Long](0)
        got == hs.distinct.sorted.take(k)
      }
    }

  property("[NS] kmeans centroids invariant under repartitioning") =
    forAll(Gen.choose(2, 5), Gen.choose(1, 7)) { (k, parts) =>
      val vecs = (0L until 20L).map(i =>
        (i, Array(i % 7 * 1.5f, (i % 3).toFloat, (i % 5) / 2.0f)))
      val df = vecs.toDF("vec_id", "embedding")
      def run(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Similarity.kmeans(d, "vec_id", "embedding", k, 2)
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
      run(df) == run(df.repartition(parts))
    }

  private val snapshot: Gen[List[(Long, Long)]] =
    Gen.listOfN(10, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 99L)))
      .map(_.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }.toList)

  property("[NS] cdcFromSnapshots round trip: applying the derived " +
      "delta to A reproduces B, for arbitrary snapshot pairs") =
    forAll(snapshot, snapshot) { (aRows, bRows) =>
      val a = aRows.toDF("k", "x")
      val b = bRows.toDF("k", "x")
      val cdc = graft.operators.Analytics
        .cdcFromSnapshots(a, b, Seq("k"), Seq("x"))
      val folded = a.withColumn("s", org.apache.spark.sql.functions.lit(1L))
        .unionByName(cdc.withColumn("s",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("op") === "I", 1L)
            .otherwise(-1L)).drop("op"))
        .groupBy($"k", $"x")
        .agg(org.apache.spark.sql.functions.sum($"s").as("n"))
        .filter($"n" =!= 0L)
        .select($"k", $"x")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      folded == bRows.toSet
    }

  property("[NS] quantileNormalize equalizes: equal-size groups end " +
      "with IDENTICAL normalized value multisets") =
    forAll(Gen.choose(2, 8), Gen.choose(1L, 1000L)) { (m, seed) =>
      // 3 groups × m rows of seeded arbitrary values
      val rows = for (g <- Seq("a", "b", "c"); i <- 1 to m)
        yield (g, (seed * 31 + g.hashCode * 7 + i * 13) % 97,
          (g.hashCode.toLong << 8) + i)
      val df = rows.toDF("g", "v", "id")
      val out = graft.operators.Analytics
        .quantileNormalize(df, "g", "v", "id")
        .collect()
        .groupBy(_.getString(0))
        .map { case (g, rs) => g -> rs.map(_.getLong(3)).sorted.toSeq }
      out("a") == out("b") && out("b") == out("c")
    }

  property("[NS] topMovers antisymmetry: swapping the populations " +
      "negates every delta") =
    forAll(Gen.listOfN(12, Gen.oneOf("x", "y", "z")),
        Gen.listOfN(12, Gen.oneOf("x", "y", "w"))) { (aKeys, bKeys) =>
      val a = aKeys.toDF("k")
      val b = bKeys.toDF("k")
      def run(l: org.apache.spark.sql.DataFrame,
          r: org.apache.spark.sql.DataFrame) =
        graft.operators.Analytics.topMovers(l, r, "k", n = 10,
            minCount = 1L)
          .collect().map(x => x.getString(0) -> x.getLong(5)).toMap
      val fwd = run(a, b)
      val rev = run(b, a)
      fwd.keySet == rev.keySet &&
        fwd.forall { case (k, d) => rev(k) == -d }
    }

  property("[NS] prioritySample membership is a pure function of the " +
      "row set (partition/order invariant), always exactly min(k, n)") =
    forAll(Gen.choose(5, 40), Gen.choose(1, 7)) { (n, parts) =>
      val df = (1L to n.toLong).map(i => (i, (i % 11) + 1)).toDF("id", "w")
      def run(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Curation.prioritySample(d, "id", "w", k = 10)
          .select("id").collect().map(_.getLong(0)).toSet
      val base = run(df)
      base.size == math.min(10, n) && run(df.repartition(parts)) == base
    }

  // arbitrary junk mixed with URL-ish fragments — crawls contain both
  private val urlish: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(30)),
    for {
      scheme <- Gen.oneOf("http", "https", "ftp", "")
      host <- Gen.oneOf("a.b.c", "x.example.com", "localhost", "..", "")
      path <- Gen.oneOf("", "/", "/p/q", "//", "/a b")
    } yield (if (scheme.isEmpty) "" else scheme + "://") + host + path)

  property("[NS] parseUrl is TOTAL on junk: never null fields, depth " +
      "equals the path's slash count, is_https iff scheme is https") =
    forAll(Gen.listOfN(8, urlish)) { urls =>
      val rows = graft.operators.Curation.parseUrl(
          urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
            .toDF("id", "url"), "url")
        .select("scheme", "host", "path", "path_depth", "is_https")
        .collect()
      rows.forall { r =>
        val (scheme, host, path) =
          (r.getString(0), r.getString(1), r.getString(2))
        scheme != null && host != null && path != null &&
          r.getLong(3) == path.count(_ == '/') &&
          r.getBoolean(4) == (scheme == "https")
      }
    }

  property("[NS] extractText is TOTAL on junk markup and never leaks a " +
      "script/style body or a whole surviving tag") =
    forAll(Gen.listOfN(6, Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(60)),
      Gen.const("<script>SECRETBODY if(a<b)</script><p>real words " +
        "kept here</p>"),
      Gen.const("<style>BODYRULE{x:1}</style><div>three words here" +
        "</div>"),
      Gen.const("<p>unclosed <b tag soup everywhere maybe kept</p>"),
      Gen.const("")))) { pages =>
      val rows = graft.operators.Curation.extractText(
          pages.zipWithIndex.map { case (h, i) => (i.toLong, h) }
            .toDF("id", "html"), "id", "html")
        .collect()
      rows.forall { r =>
        val t = r.getString(1)
        t != null && r.getLong(2) >= 0 && r.getLong(3) >= 0 &&
          !t.contains("SECRETBODY") && !t.contains("BODYRULE") &&
          !t.matches("(?s).*<[a-zA-Z][^>]*>.*")
      }
    }

  property("[NS] domainGate matches on label boundaries only: a host " +
      "is blocked iff it equals a blocked domain or ends with '.'+it") =
    forAll(Gen.listOfN(10, Gen.oneOf("spam.example", "cdn.spam.example",
      "notspam.example", "spam.example.org", "a.b.spam.example",
      "spamexample", "ok.example", ""))) { hosts =>
      val blocked = Seq("spam.example", "ok.example")
      val got = graft.operators.Curation.domainGate(
          hosts.zipWithIndex.map { case (h, i) => (i.toLong, h) }
            .toDF("id", "host"), "host", blocked)
        .collect().map(r => r.getString(1) -> r.getBoolean(2))
      got.forall { case (h, b) =>
        b == blocked.exists(d => h == d || h.endsWith("." + d))
      }
    }

  property("[NS] hitsExact: L1 mass never exceeds scale on either axis " +
      "and scores are non-negative, for random small digraphs") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(1L, 6L),
      Gen.choose(1L, 6L)))) { es =>
      val edges = es.filter(e => e._1 != e._2)
      edges.isEmpty || {
        val got = graft.operators.Graph
          .hitsExact(edges.toDF("s", "t"), "s", "t", iters = 2)
          .collect().map(r => (r.getLong(1), r.getLong(2)))
        val scale = 1000000000L
        got.forall(r => r._1 >= 0 && r._2 >= 0) &&
          got.map(_._1).sum <= scale && got.map(_._2).sum <= scale
      }
    }

  property("[NS] dupSpanCoverage: coverage_ppm ∈ [0, 1e6], covered " +
      "positions only on docs sharing a gram, twins always fully covered") =
    forAll(Gen.choose(2, 6), Gen.listOfN(4,
      Gen.listOfN(9, Gen.oneOf("aa", "bb", "cc", "dd")))) { (g, wordss) =>
      val docs = wordss.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) } ++
        Seq((90L, wordss.head.mkString(" "))) // planted twin of doc 0
      val got = graft.operators.Dedup
        .dupSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", g)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(4)))).toMap
      got.values.forall(v => v._3 >= 0 && v._3 <= 1000000L) &&
        got(0L)._3 == 1000000L && got(90L)._3 == 1000000L
    }

  private val docGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(0L, 99L),
      Gen.listOfN(6, Gen.oneOf("the", "cat", "hund", "park", "a", "der"))
        .map(_.mkString(" ")),
      Gen.oneOf("en", "de")))
      .map(_.groupBy(_._1).map { case (k, vs) =>
        (k, vs.head._2, vs.head._3) }.toList)

  property("[NS] importance lambda + scores invariant under " +
      "repartitioning; scores bounded by the lambda range") =
    forAll(docGen, Gen.choose(1, 7)) { (docs, parts) =>
      docs.nonEmpty ==> {
        val df = docs.toDF("doc_id", "text", "lang")
        def run(d: org.apache.spark.sql.DataFrame) = {
          val tb = graft.operators.Importance.docBuckets(
            d, "doc_id", "text", 8, carryCols = Seq("lang"))
          val lam = graft.operators.Importance.lambdaTable(
            tb, col("lang") === "en", 8)
          val sc = graft.operators.Importance.score(tb, lam, "doc_id")
            .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
          val lm = lam.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          (lm, sc)
        }
        val (lam1, sc1) = run(df)
        val (lam2, sc2) = run(df.repartition(parts))
        val bounded = sc1.values.forall(v =>
          lam1.values.min <= v && v <= lam1.values.max)
        lam1 == lam2 && sc1 == sc2 && bounded
      }
    }

  property("[NS] contextFitReport monotone in L: more docs fit and " +
      "fewer tokens are lost as the context grows; totals constant") =
    forAll(Gen.listOfN(10, Gen.zip(Gen.choose(0L, 999L),
        Gen.choose(0L, 200L)))) { raw =>
      val docs = raw.groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }
        .toList
      docs.nonEmpty ==> {
        val rep = graft.operators.Curation.contextFitReport(
          docs.toDF("doc_id", "n_tok"), "doc_id", "n_tok",
          Seq(16L, 64L, 256L))
          .collect().map(r => r.getLong(0) -> ((r.getLong(2),
            r.getLong(4), r.getLong(5)))).toMap.toSeq.sortBy(_._1)
        val fits = rep.map(_._2._1)
        val tots = rep.map(_._2._2)
        val losses = rep.map(_._2._3)
        fits.zip(fits.tail).forall { case (a, b) => a <= b } &&
          losses.zip(losses.tail).forall { case (a, b) => a >= b } &&
          tots.distinct.size == 1
      }
    }

  property("[NS] pairGroupMatrix accounting: cell counts sum to the " +
      "pair count and shares sum to 1e6 up to truncation") =
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0L, 9L),
        Gen.choose(0L, 9L))),
      Gen.listOfN(10, Gen.oneOf("x", "y", "z"))) { (rawPairs, gs) =>
      val pairs = rawPairs.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
      pairs.nonEmpty ==> {
        val meta = (0L to 9L).map(i =>
          (i, gs(i.toInt))).toDF("doc_id", "g")
        val cells = graft.operators.Dedup.pairGroupMatrix(
          pairs.toDF("doc_a", "doc_b"), meta, "doc_id", "g")
          .collect().map(r => (r.getLong(2), r.getLong(4)))
        cells.map(_._1).sum == pairs.length.toLong &&
          cells.map(_._2).sum <= 1000000L &&
          cells.map(_._2).sum > 1000000L - cells.length
      }
    }

  property("[NS] epochAdvisor conservation: effective + excess = " +
      "wanted; the 4-epoch flag agrees with the exact ppm ratio") =
    forAll(Gen.listOfN(6, Gen.zip(Gen.alphaLowerStr.map(_.take(3)),
        Gen.choose(0L, 50L), Gen.choose(0L, 500L)))) { raw =>
      val rows = raw.groupBy(_._1).map(_._2.head).toList
      rows.nonEmpty ==> {
        val got = graft.operators.Curation.epochAdvisor(
          rows.toDF("s", "u", "w"), "s", "u", "w")
          .collect().map(r => (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            r.getBoolean(4), r.getLong(5), r.getLong(6)))
        got.forall { case (u, w, e, gt4, eff, ex) =>
          eff + ex == w &&
            (u == 0L || (gt4 == (e.get > 4000000L) ||
              (e.get == 4000000L && !gt4)))
        }
      }
    }

  // Aho–Corasick vs the obvious quadratic matcher: on random token
  // streams and random phrase sets (shared prefixes, nested phrases,
  // repeats), per-phrase counts must agree exactly — the automaton's
  // fail links and output closure carry the whole burden here. Pure
  // JVM (no Spark job), so this property can afford many runs.
  private val acVocab = Gen.oneOf("a", "b", "c", "ab")
  private val acCase = forAll(
    Gen.listOfN(40, acVocab),
    Gen.nonEmptyListOf(Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, acVocab).map(_.mkString(" "))))
      .map(_.distinct.take(6))) { (tokens, phrases) =>
    val auto = graft.functions.AcAutomaton.build(phrases)
    val counts = new Array[Long](phrases.length)
    auto.countInto(tokens.toArray, counts)
    val naive = phrases.map { p =>
      val pt = p.split(" ")
      (0 to tokens.length - pt.length).count(i =>
        pt.indices.forall(j => tokens(i + j) == pt(j))).toLong
    }
    counts.toSeq == naive
  }
  property("AcAutomaton counts == naive all-positions matcher " +
    "(fail links, output closure, overlaps)") = acCase

  // Friedman on random complete blocks with heavy ties vs an
  // independent BigInt reference of the doubled-midrank Q identity.
  private val friedmanBlocks: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(3, 6)
    vals <- Gen.listOfN(n * 3, Gen.choose(0L, 4L)) // small range → ties
  } yield vals.grouped(3).zipWithIndex.flatMap { case (vs, b) =>
    vs.zip(Seq("A", "B", "C")).map { case (v, t) => (b.toLong, t, v) }
  }.toList

  property("friedman == BigInt doubled-midrank reference on random " +
    "tied complete blocks") = forAll(friedmanBlocks) { rows =>
    val got = graft.operators.Analytics.friedman(
        rows.toDF("b", "t", "v").repartition(3), "b", "t", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4))).toMap
    // reference: per block, doubled midrank of each value; Q from the
    // cleared-denominator identity
    val k = 3
    val r2sums = rows.groupBy(_._1).values.toSeq.foldLeft(
      Map.empty[String, Long].withDefaultValue(0L)) { (acc, block) =>
      val vs = block.map(_._3)
      block.foldLeft(acc) { case (a, (_, t, v)) =>
        val less = vs.count(_ < v)
        val ties = vs.count(_ == v)
        a.updated(t, a(t) + (2 * less + ties + 1))
      }
    }
    val n = BigInt(rows.map(_._1).distinct.size)
    val ss = r2sums.values.map(x => BigInt(x) * x).sum
    val q = (BigInt(3000000) * ss) / (n * k * (k + 1)) -
      BigInt(3000000) * n * (k + 1)
    Seq("A", "B", "C").forall { t =>
      got(t)._1 == r2sums(t) && got(t)._2 == q.toLong
    }
  }

  // Cochran's Q vs the textbook definition computed in BigInt.
  private val cochranBlocks: Gen[List[(Long, String, Boolean)]] = for {
    n <- Gen.choose(3, 7)
    bits <- Gen.listOfN(n * 3, Gen.oneOf(true, false))
  } yield bits.grouped(3).zipWithIndex.flatMap { case (vs, b) =>
    vs.zip(Seq("A", "B", "C")).map { case (v, t) => (b.toLong, t, v) }
  }.toList

  property("cochranQ == BigInt cleared-denominator reference on " +
    "random binary blocks (incl. degenerate)") =
    forAll(cochranBlocks) { rows =>
      val got = graft.operators.Analytics.cochranQ(
          rows.toDF("b", "t", "f").repartition(3), "b", "t", "f")
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
      val k = 3
      val cj = Seq("A", "B", "C").map(t =>
        BigInt(rows.count(r => r._2 == t && r._3)))
      val ri = rows.groupBy(_._1).values.map(b =>
        BigInt(b.count(_._3)))
      val t = ri.sum
      val den = k * t - ri.map(x => x * x).sum
      val expect =
        if (den == 0) None
        else Some(((BigInt(1000000) * (k - 1) *
          (k * cj.map(x => x * x).sum - t * t)) / den).toLong)
      Seq("A", "B", "C").forall(tr => got(tr) == expect)
    }
}
