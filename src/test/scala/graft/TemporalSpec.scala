package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** SURVEY §2.3 [NS] — range join by time-bucketing: exact inequality
  * semantics, including windows that straddle bucket boundaries, with an
  * equi-join plan (never a nested-loop). */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overlapJoin: equals brute force incl. touching endpoints, emits " +
      "each pair EXACTLY once across bin-straddling intervals") {
    val rnd = new scala.util.Random(13)
    // intervals deliberately spanning 0–5 bins of width 100, plus
    // touching pairs ([0,50],[50,80] overlap at one point)
    val as = (1L to 60L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(400)) }
    val bs = (101L to 160L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(400)) }
    val aDf = as.toDF("a_id", "a_s", "a_e")
    val bDf = bs.toDF("b_id", "b_s", "b_e")
    val got = Temporal.overlapJoin(aDf, bDf, "a_s", "a_e", "b_s", "b_e",
        widthUs = 100L)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (ai, bi)
    assert(got.length === got.distinct.length,
      "a pair must be emitted exactly once")
    assert(got.toSet === want.toSet)
    // touching endpoints count as overlap (inclusive semantics)
    val t = Temporal.overlapJoin(
      Seq((1L, 0L, 50L)).toDF("a_id", "a_s", "a_e"),
      Seq((2L, 50L, 80L)).toDF("b_id", "b_s", "b_e"),
      "a_s", "a_e", "b_s", "b_e", widthUs = 100L).count()
    assert(t === 1L)
  }

  test("rangeJoin matches the brute-force inequality join exactly") {
    // timestamps chosen to straddle bucket boundaries (width = 100):
    // pairs at distance 0, 99, 100, 101 test both inclusive ends
    val left = Seq((1L, 0L), (1L, 95L), (2L, 250L), (3L, 10L))
      .toDF("k", "lt")
    val right = Seq((1L, 0L), (1L, 99L), (1L, 195L), (1L, 196L),
      (2L, 350L), (2L, 351L), (9L, 10L)).toDF("k", "rt")
    val got = Temporal.rangeJoin(left, right, "k", "lt", "rt", 0L, 100L)
      .select("k", "lt", "rt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = left.join(right, Seq("k"))
      .filter($"rt" >= $"lt" && $"rt" <= $"lt" + 100)
      .select("k", "lt", "rt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === brute)
    // (1,95)->(1,195) crosses the bucket border and is in-window;
    // (1,95)->(1,196) is outside by 1µs
    assert(got.contains((1L, 95L, 195L)) && !got.contains((1L, 95L, 196L)))
  }

  test("rangeJoin supports a point window [x, x]") {
    val left = Seq((1L, 100L), (1L, 50L)).toDF("k", "lt")
    val right = Seq((1L, 100L), (1L, 101L)).toDF("k", "rt")
    val got = Temporal.rangeJoin(left, right, "k", "lt", "rt", 0L, 0L)
      .select("lt", "rt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 100L)))
  }

  test("rangeJoin plans as an equi-join, not a nested loop") {
    val left = spark.range(1000)
      .select(($"id" % 7).as("k"), ($"id" * 13).as("lt"))
    val right = spark.range(1000)
      .select(($"id" % 7).as("k"), ($"id" * 17).as("rt"))
    val j = Temporal.rangeJoin(left, right, "k", "lt", "rt", 0L, 500L)
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
  }

  test("pitJoin: from-inclusive / to-exclusive version pick, NULL before " +
      "the first version, across gaps, and for keys with no versions") {
    // key 1: [10,20)→a, [20,30)→b, gap, [40,∞)→c
    val dim = Seq(
      (1L, 10L, Some(20L), "a"), (1L, 20L, Some(30L), "b"),
      (1L, 40L, None, "c"))
      .toDF("k", "from_us", "to_us", "state")
    val facts = Seq(
      (1L, 100L, 5L),   // before any version
      (1L, 101L, 10L),  // exactly at a's from → a
      (1L, 102L, 19L),  // inside a
      (1L, 103L, 20L),  // boundary: a ends, b begins → b
      (1L, 104L, 35L),  // in the gap → NULL
      (1L, 105L, 99L),  // open interval → c
      (2L, 200L, 15L))  // key with no versions at all
      .toDF("k", "fid", "ts_us")
    val got = Temporal.pitJoin(facts, dim, "k", "ts_us", "from_us",
        "to_us", Seq("state"))
      .collect().map(r => r.getLong(1) -> Option(r.getString(3))).toMap
    assert(got === Map(
      100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 104L -> None, 105L -> Some("c"),
      200L -> None))
    // the plan is the union+window form: no join operator of any kind
    val p = Temporal.pitJoin(facts, dim, "k", "ts_us", "from_us",
        "to_us", Seq("state"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"pitJoin materialized a join:\n$p")
  }

  // ---- nearestJoin ----

  test("nearestJoin: argmin |gap| in the window, equidistant tie breaks " +
      "toward the earlier right row, out-of-window left rows drop") {
    import spark.implicits._
    val left = Seq(
      (1L, "k", 1000L),  // candidates at 900 (gap -100) and 1090 (gap +90)
      (2L, "k", 5000L),  // equidistant: 4990 and 5010 -> earlier wins
      (3L, "k", 9000L),  // nothing within ±200
      (4L, "x", 100L)    // other key: only x-candidates eligible
    ).toDF("lid", "k", "lts")
    val right = Seq(
      (10L, "k", 900L), (11L, "k", 1090L),
      (12L, "k", 4990L), (13L, "k", 5010L),
      (14L, "x", 250L), (15L, "k", 120L)
    ).toDF("rid", "k", "rts")
    val got = Temporal.nearestJoin(left, right, "k", "lid", "lts", "rts",
        maxGapUs = 200L, tieCols = Seq("rid"))
      .select($"lid", $"rid", $"gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 11L, 90L),    // +90 beats -100
      (2L, 12L, -10L),   // tie |10|: earlier rts wins
      (4L, 14L, 150L)))  // keyed: k-candidates never cross to x
  }

  test("timeRespectingReach: time-ordered chains reach, " +
      "backwards chains don't, a later parallel contact rescues") {
    // contacts: 1-2 @t=100, 2-3 @t=50 (BEFORE 1-2: static path 1-2-3
    // exists, temporal path does not), 2-4 @t=200 (reachable),
    // 2-3 ALSO @t=300 (the later contact rescues 3), 4-5 @t=150
    // (before arrival at 4=200 → 5 stays unreached in 3 rounds)
    val contacts = Seq(
      (1L, 2L, 100L), (2L, 3L, 50L), (2L, 4L, 200L),
      (2L, 3L, 300L), (4L, 5L, 150L)).toDF("a", "b", "ct")
    val seeds = Seq(1L).toDF("node")
    val got = Temporal
      .timeRespectingReach(contacts, "a", "b", "ct", seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 100L, 3L -> 300L, 4L -> 200L),
      s"got $got")
    // drop the rescue contact: 3 must vanish from the reached set
    val noRescue = Temporal.timeRespectingReach(
        contacts.filter(!(col("b") === 3L && col("ct") === 300L)),
        "a", "b", "ct", seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!noRescue.contains(3L), s"static-only path leaked: $noRescue")
  }
}
