package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryDsl._

/** Coverage extensions: cube, ranking window functions, sliding windows
  * in batch form, the SQL surface (same text runs on Spark SQL and the
  * DuckDB oracle), and HLL approximate distinct (rows-only check —
  * approximation is engine-specific by design).
  */
object ExtraQueries {

  /** SURVEY §2.5 [NS] — full cube over (region, segment). */
  val q42Cube = Q(
    "q42_cube",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .cube($"r_name", $"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          grouping($"r_name").cast("long").as("g_r"),
          grouping($"c_mktsegment").cast("long").as("g_m"))
        .orderBy($"g_r", $"g_m", $"r_name", $"c_mktsegment")
    },
    Some("""SELECT r_name, c_mktsegment, count(*) AS n,
        CAST(GROUPING(r_name) AS BIGINT) AS g_r,
        CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_m
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY CUBE (r_name, c_mktsegment)
      ORDER BY g_r, g_m, r_name, c_mktsegment"""),
    doc = "SURVEY §2.5 [NS] cube/grouping sets")

  /** SURVEY §2.6 [NS] — dense_rank + ntile buckets per order status. */
  val q43RankFuncs = Q(
    "q43_rank_funcs",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("dr", dense_rank().over(w).cast("long"))
        .withColumn("tile", ntile(4).over(w).cast("long"))
        .groupBy($"o_orderstatus", $"tile")
        .agg(count(lit(1)).as("n"), min($"dr").as("min_rank"),
          max($"dr").as("max_rank"),
          exactSum($"o_totalprice", 2).as("sum_price"))
        .orderBy($"o_orderstatus", $"tile")
    },
    Some(s"""SELECT o_orderstatus, tile, count(*) AS n,
      min(dr) AS min_rank, max(dr) AS max_rank,
      ${exactSumSql("o_totalprice", 2)} AS sum_price
      FROM (
        SELECT o_orderstatus, o_totalprice,
          CAST(dense_rank() OVER w AS BIGINT) AS dr,
          CAST(ntile(4) OVER w AS BIGINT) AS tile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
          ORDER BY o_totalprice DESC, o_orderkey ASC)) t
      GROUP BY o_orderstatus, tile ORDER BY o_orderstatus, tile"""),
    doc = "SURVEY §2.6 [NS] dense_rank/ntile")

  /** SURVEY §2.9 [NS] — sliding window (10 min width, 5 min slide) in
    * batch form via the native window() generator: each event lands in
    * exactly two windows; counts per window start. */
  val q44SlidingWindow = Q(
    "q44_sliding_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"),
          $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("window_start"), $"event_type", $"n")
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT make_timestamp(ws) AS window_start, event_type,
        count(*) AS n
      FROM (SELECT unnest(ARRAY[
          (epoch_us(ts) // 300000000) * 300000000 - 300000000,
          (epoch_us(ts) // 300000000) * 300000000]) AS ws, event_type
        FROM events) t
      GROUP BY ws, event_type ORDER BY window_start, event_type"""),
    doc = "SURVEY §2.9 [NS] sliding windows (batch twin)")

  /** The SQL surface: the catalog registers every table as a view and the
    * SAME SQL text runs on Spark SQL and on the DuckDB oracle (§1.4
    * "both the DataFrame and spark.sql surfaces work"). */
  private val sharedSql =
    """SELECT n_name, count(DISTINCT s_suppkey) AS n_suppliers,
      sum(round(l_extendedprice * (1.0 - l_discount) * 10000.0)) / 10000.0
        AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""

  val q45SqlSurface = Q(
    "q45_sql_surface",
    (s, d) => { Tables.registerAll(s, d); s.sql(sharedSql) },
    Some(sharedSql),
    doc = "catalog + spark.sql surface; identical text on both engines")

  /** SURVEY §2.5 A5 — approx_count_distinct (HLL±5%). The raw estimate is
    * engine-specific, so the oracle-checked contract is the tolerance
    * boolean: |approx − exact| / exact <= 0.05. Both engines' HLLs land
    * within 5% deterministically, so `within_tol` hash-matches while the
    * operator under test stays the HLL sketch. */
  val q46HllDistinct = Q(
    "q46_hll_distinct",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag", $"n_rows",
          (abs($"approx_parts" - $"exact_parts").cast("double") /
            $"exact_parts" <= 0.05).as("within_tol"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_rows,
      abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
        - count(DISTINCT l_partkey)) / count(DISTINCT l_partkey) <= 0.05
        AS within_tol
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "SURVEY §2.5 A5 HLL approx distinct (tolerance-boolean oracle)")

  /** SURVEY §4 / 100 TB — salted two-phase aggregation: identical result
    * to the plain groupBy (the oracle IS the plain groupBy), but the hot
    * key's partial work spreads across 16 reducers. Sums ride the
    * scaled-integer trick so partial-then-final double sums stay exact. */
  val q47SaltedAgg = Q(
    "q47_salted_agg",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
        .withColumn("qty_c", round($"l_quantity" * 100, 0))
      graft.operators.Skew.saltedSumCount(li, "l_returnflag", Seq("qty_c"))
        .select($"l_returnflag", (col("sum_qty_c") / 100.0).as("sum_qty"),
          col("n"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      sum(round(l_quantity * 100)) / 100.0 AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "SURVEY §4 skew: salted agg ≡ plain agg (oracle is the plain form)")

  /** SURVEY §2.5 [NS] — exact continuous percentiles (median/p90) per
    * status; interpolation on money doubles rounded to 4. */
  val q48Percentiles = Q(
    "q48_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
      round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
      count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    doc = "SURVEY §2.5 [NS] exact percentiles (sort-based)")

  /** SURVEY §2.5 [NS] — pivot: event counts per user day, event types as
    * columns (Spark plans PivotFirst; the oracle is the equivalent
    * conditional aggregation — identical result relation). */
  val q50Pivot = Q(
    "q50_pivot",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
        count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      FROM events GROUP BY user_id ORDER BY user_id"""),
    doc = "SURVEY §2.5 [NS] pivot (PivotFirst ≡ conditional agg oracle)")

  /** SURVEY §2.6 [NS] — RANGE frame spec: 7-day rolling spend per
    * customer, keyed on days-since-epoch so the frame is value-based
    * (peers with the same date aggregate together — the semantics
    * rowsBetween cannot express). Money summed with the scaled-integer
    * trick inside the frame for engine-exact doubles. */
  val q59RangeWindow = Q(
    "q59_range_window",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy(datediff($"o_orderdate", lit("1992-01-01")))
        .rangeBetween(-6, Window.currentRow)
      Tables.orders(s, d)
        .filter($"o_custkey" < 100)
        .withColumn("spend_7d",
          sum(round($"o_totalprice" * 100, 0)).over(w) / 100)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"spend_7d")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        sum(round(o_totalprice * 100)) OVER (
          PARTITION BY o_custkey
          ORDER BY date_diff('day', DATE '1992-01-01', o_orderdate)
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100 AS spend_7d
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""),
    doc = "SURVEY §2.6 [NS] RANGE frame (value-based rolling window)")

  /** SURVEY §2.5 A5 [NS] — approximate percentile sketch vs exact, as a
    * tolerance-boolean contract (the q46 HLL pattern): each engine's
    * sketch differs, but both must land within 5% of the exact median /
    * p90, so both deterministically output true. The sketch is the scale
    * path (mergeable partial state); the exact form is the oracle twin. */
  val q60ApproxPercentiles = Q(
    "q60_approx_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          percentile_approx($"l_extendedprice", lit(0.5), lit(1000))
            .as("ap50"),
          percentile_approx($"l_extendedprice", lit(0.9), lit(1000))
            .as("ap90"),
          expr("percentile(l_extendedprice, 0.5)").as("ex50"),
          expr("percentile(l_extendedprice, 0.9)").as("ex90"),
          count(lit(1)).as("n_rows"))
        .select($"l_returnflag", $"n_rows",
          (abs($"ap50" - $"ex50") / $"ex50" <= 0.05).as("p50_within_tol"),
          (abs($"ap90" - $"ex90") / $"ex90" <= 0.05).as("p90_within_tol"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_rows,
        abs(approx_quantile(l_extendedprice, 0.5)
          - quantile_cont(l_extendedprice, 0.5))
          / quantile_cont(l_extendedprice, 0.5) <= 0.05 AS p50_within_tol,
        abs(approx_quantile(l_extendedprice, 0.9)
          - quantile_cont(l_extendedprice, 0.9))
          / quantile_cont(l_extendedprice, 0.9) <= 0.05 AS p90_within_tol
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "SURVEY §2.5 A5 [NS] approx percentile sketch (tolerance-boolean)")

  /** SURVEY §2.6 [NS] — distribution-position windows (percent_rank /
    * cume_dist) as a per-stratum quality gate: keep the top half of each
    * source by document length. Both functions are integer-ratio doubles
    * ((rank−1)/(n−1), rows≤cur/n) over a unique ordering, so the gate is
    * bit-deterministic across engines and partitionings — the windowed
    * form of "filter to the pXX+ of each stratum" that a curation
    * pipeline applies before expensive scoring. */
  val q74PercentGate = Q(
    "q74_percent_gate",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy($"n_chars".desc, $"doc_id".asc)
      Tables.documents(s, d)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .filter($"pr" < 0.5)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), min($"n_chars").as("min_chars"),
          round(max($"pr"), 6).as("max_pr"), round(max($"cd"), 6).as("max_cd"))
        .orderBy($"source")
    },
    Some("""SELECT source, count(*) AS n_kept, min(n_chars) AS min_chars,
        round(max(pr), 6) AS max_pr, round(max(cd), 6) AS max_cd
      FROM (
        SELECT source, n_chars,
          percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC))
      WHERE pr < 0.5 GROUP BY source ORDER BY source"""),
    doc = "SURVEY §2.6 [NS] percent_rank/cume_dist stratum quality gate")

  /** [NS] — time-series gap filling: densify per-priority daily order
    * counts over the full calendar (generated date sequence × priorities,
    * zero-filled gaps) — the resample-then-aggregate shape every
    * time-series pipeline needs before rolling math. Scale: the calendar
    * is generated (days, tiny) and broadcast against the distinct-key
    * side; the fact table is touched once by the count aggregate. */
  val q75GapFill = Q(
    "q75_gap_fill",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderpriority".as("prio"), $"o_orderdate".as("dt"))
      val cal = o.agg(min($"dt").as("lo"), max($"dt").as("hi"))
        .select(explode(sequence($"lo", $"hi")).as("dt"))
      val grid = o.select($"prio").distinct().crossJoin(broadcast(cal))
      val counts = o.groupBy($"prio", $"dt").agg(count(lit(1)).as("n"))
      grid.join(counts, Seq("prio", "dt"), "left")
        .na.fill(0L, Seq("n"))
        .groupBy($"prio")
        .agg(count(lit(1)).as("n_days"),
          sum(when($"n" === 0, 1L).otherwise(0L)).as("n_gap_days"),
          sum($"n").as("n_orders"))
        .orderBy($"prio")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS prio, o_orderdate AS dt
        FROM orders),
      cal AS (SELECT CAST(unnest(generate_series(
          (SELECT min(dt) FROM o), (SELECT max(dt) FROM o),
          INTERVAL 1 DAY)) AS DATE) AS dt),
      grid AS (SELECT prio, dt FROM (SELECT DISTINCT prio FROM o), cal),
      counts AS (SELECT prio, dt, count(*) AS n FROM o GROUP BY prio, dt)
      SELECT g.prio, count(*) AS n_days,
        CAST(sum(CASE WHEN coalesce(c.n, 0) = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_gap_days,
        CAST(sum(coalesce(c.n, 0)) AS BIGINT) AS n_orders
      FROM grid g LEFT JOIN counts c ON c.prio = g.prio AND c.dt = g.dt
      GROUP BY g.prio ORDER BY g.prio"""),
    doc = "[NS] calendar densification / gap filling (generated dim broadcast)")

  /** [NS] — MERGEABLE sketch maintenance: per-source DataSketches HLL
    * sketches unioned into a global estimate — the incremental shape
    * (per-shard sketches fold without rescanning the corpus; the union
    * is associative, so map-side partial aggregation applies). Contract
    * is q46's tolerance boolean: the merged estimate must land within 5%
    * of the exact global distinct, which both engines' HLLs satisfy
    * deterministically. */
  val q86SketchUnion = Q(
    "q86_sketch_union",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
        .select($"source", md5($"text").as("sig"))
      val perSource = docs.groupBy($"source")
        .agg(expr("hll_sketch_agg(sig, 12)").as("sk"))
      val mergedEst = perSource.agg(count(lit(1)).as("n_sources"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = docs.agg(countDistinct($"sig").as("exact_global"))
      mergedEst.crossJoin(exact)
        .select($"n_sources", $"exact_global",
          (abs($"est" - $"exact_global").cast("double") /
            $"exact_global" <= 0.05).as("within_tol"))
    },
    Some("""WITH dd AS (SELECT source, md5(text) AS sig FROM documents)
      SELECT (SELECT count(DISTINCT source) FROM dd) AS n_sources,
        (SELECT count(DISTINCT sig) FROM dd) AS exact_global,
        abs(CAST((SELECT approx_count_distinct(sig) FROM dd) AS DOUBLE)
            - (SELECT count(DISTINCT sig) FROM dd))
          / (SELECT count(DISTINCT sig) FROM dd) <= 0.05 AS within_tol"""),
    doc = "[NS] mergeable HLL sketch union (incremental distinct maintenance)")

  private val groupingSetsSql = """SELECT l_returnflag, l_linestatus,
      count(*) AS n, sum(round(l_quantity * 100.0)) / 100.0 AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY GROUPING(l_returnflag), GROUPING(l_linestatus),
      l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  /** SURVEY §2.5 A5 — GROUPING SETS, the general form behind q11's rollup
    * and q42's cube: explicit per-dimension marginals + grand total in
    * one pass (Spark expands to a single Expand + hash aggregate — one
    * shuffle, not one scan per set). Identical SQL text on both engines;
    * NULLS FIRST pinned because the engines' ASC null order defaults
    * differ. */
  val q87GroupingSets = Q(
    "q87_grouping_sets",
    (s, d) => { Tables.registerAll(s, d); s.sql(groupingSetsSql) },
    Some(groupingSetsSql),
    doc = "SURVEY §2.5 A5 GROUPING SETS (shared SQL text)")

  /** [NS] — snapshot reconciliation (CDC derivation): full-outer join of
    * two table versions on the key, rows classified added / removed /
    * changed / unchanged — how an incremental corpus update is derived
    * when the upstream can't emit a changelog. Snapshots are synthesized
    * deterministically from `orders` (drops on key mod, price bump on
    * mod-13) so the diff is oracle-checkable. Scale: one shuffle per
    * side on the key into a sort-merge full-outer — no broadcast (both
    * sides are table-sized), no cartesian; the classification is a
    * per-row case over the merged pair. */
  val q84SnapshotDiff = Q(
    "q84_snapshot_diff",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderkey".as("k"),
          round($"o_totalprice" * 100, 0).cast("long").as("p100"))
      val prev = o.filter($"k" % 97 =!= 0)
        .select($"k", $"p100".as("p_old"))
      val curr = o.filter($"k" % 89 =!= 0)
        .select($"k",
          when($"k" % 13 === 0, $"p100" + 100L).otherwise($"p100")
            .as("p_new"))
      prev.join(curr, Seq("k"), "full_outer")
        .withColumn("status",
          when($"p_old".isNull, "added")
            .when($"p_new".isNull, "removed")
            .when($"p_old" =!= $"p_new", "changed")
            .otherwise("unchanged"))
        .groupBy($"status")
        .agg(count(lit(1)).as("n"), sum($"k").as("key_sum"))
        .orderBy($"status")
    },
    Some("""WITH o AS (SELECT o_orderkey AS k,
        CAST(round(o_totalprice * 100) AS BIGINT) AS p100 FROM orders),
      prev AS (SELECT k, p100 AS p_old FROM o WHERE k % 97 <> 0),
      curr AS (SELECT k, CASE WHEN k % 13 = 0 THEN p100 + 100
          ELSE p100 END AS p_new FROM o WHERE k % 89 <> 0)
      SELECT CASE WHEN p_old IS NULL THEN 'added'
          WHEN p_new IS NULL THEN 'removed'
          WHEN p_old <> p_new THEN 'changed'
          ELSE 'unchanged' END AS status,
        count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
      FROM prev FULL JOIN curr USING (k)
      GROUP BY 1 ORDER BY status"""),
    doc = "[NS] snapshot diff / CDC derivation (full-outer reconcile)")

  /** [NS] — CDC round-trip, closing q84's loop: apply the derived
    * changelog (delete removed/changed keys, insert added/changed rows)
    * back onto the OLD snapshot and prove the result reconstructs the
    * NEW snapshot exactly — count plus an order-independent xor digest
    * over (key, value) rows, computed identically for both sides. The
    * contract a changelog consumer relies on: diff-then-apply is
    * lossless. Anti-join + union, one shuffle each — no row-at-a-time
    * apply loop. */
  val q95CdcApply = Q(
    "q95_cdc_apply",
    (s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
        .select($"o_orderkey".as("k"),
          round($"o_totalprice" * 100, 0).cast("long").as("p100"))
      val prev = o.filter($"k" % 97 =!= 0)
        .select($"k", $"p100".as("p_old"))
      val curr = o.filter($"k" % 89 =!= 0)
        .select($"k",
          when($"k" % 13 === 0, $"p100" + 100L).otherwise($"p100")
            .as("p_new"))
      val diff = prev.join(curr, Seq("k"), "full_outer")
        .withColumn("status",
          when($"p_old".isNull, "added")
            .when($"p_new".isNull, "removed")
            .when($"p_old" =!= $"p_new", "changed")
            .otherwise("unchanged"))
        .localCheckpoint(true)
      val applied = prev
        .join(diff.filter($"status".isin("removed", "changed"))
          .select($"k"), Seq("k"), "left_anti")
        .unionByName(diff.filter($"status".isin("added", "changed"))
          .select($"k", $"p_new".as("p_old")))
      val digest = (df: org.apache.spark.sql.DataFrame) => df
        .select($"k", col(df.columns(1)).as("p"))
        .agg(count(lit(1)).as("n"),
          expr("""bit_xor(cast(conv(substring(
            md5(concat(cast(k AS string), ':', cast(p AS string))),
            1, 15), 16, 10) AS BIGINT))""").as("x"))
      digest(curr).alias("c").crossJoin(digest(applied).alias("a"))
        .select(col("c.n").as("n_curr"), col("a.n").as("n_applied"),
          (col("c.n") === col("a.n") && col("c.x") <=> col("a.x"))
            .as("roundtrip_exact"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS k,
        CAST(round(o_totalprice * 100) AS BIGINT) AS p100 FROM orders),
      prev AS (SELECT k, p100 AS p_old FROM o WHERE k % 97 <> 0),
      curr AS (SELECT k, CASE WHEN k % 13 = 0 THEN p100 + 100
          ELSE p100 END AS p_new FROM o WHERE k % 89 <> 0),
      diff AS (SELECT k, p_old, p_new,
          CASE WHEN p_old IS NULL THEN 'added'
            WHEN p_new IS NULL THEN 'removed'
            WHEN p_old <> p_new THEN 'changed'
            ELSE 'unchanged' END AS status
        FROM prev FULL JOIN curr USING (k)),
      applied AS (
        SELECT k, p_old FROM prev
        WHERE k NOT IN (SELECT k FROM diff
          WHERE status IN ('removed', 'changed'))
        UNION ALL
        SELECT k, p_new FROM diff WHERE status IN ('added', 'changed')),
      dc AS (SELECT count(*) AS n, bit_xor(CAST('0x' || substr(
          md5(CAST(k AS VARCHAR) || ':' || CAST(p_new AS VARCHAR)),
          1, 15) AS BIGINT)) AS x FROM curr),
      da AS (SELECT count(*) AS n, bit_xor(CAST('0x' || substr(
          md5(CAST(k AS VARCHAR) || ':' || CAST(p_old AS VARCHAR)),
          1, 15) AS BIGINT)) AS x FROM applied)
      SELECT dc.n AS n_curr, da.n AS n_applied,
        (dc.n = da.n AND dc.x IS NOT DISTINCT FROM da.x)
          AS roundtrip_exact
      FROM dc, da"""),
    doc = "[NS] CDC apply round-trip: diff-then-apply reconstructs the snapshot")

  /** SQL twin of [[graft.operators.Layout.zorder]] over two dims at 16
    * bits: the identical unrolled shift/mask/add, generated so both
    * engines compute the same 32-term sum. */
  private def zorder2Sql(x: String, y: String): String =
    (0 until 16).flatMap { i =>
      Seq(s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }.mkString("(", " + ", ")")

  /** [NS] — Z-order layout audit (q118): every order keyed by the
    * Morton interleave of (custkey & 65535, epoch-day & 65535)
    * ([[graft.operators.Layout.zorder]]), then the curve's 2^18-aligned
    * tiles (512×512 in dim units) summarized with per-tile min/max of
    * BOTH dims. The
    * min/max spans are the pruning statistics a zone map would hold:
    * each bucket covers a narrow range of customer AND date
    * simultaneously — one sort key, two prunable predicates — which is
    * the entire point of Z-ordering a 100 TB fact table. Bit-exact
    * across engines (integer shifts only), so the oracle certifies
    * every interleaved bit. */
  val q118ZorderLayout = Q(
    "q118_zorder_layout",
    (s, d) => {
      import s.implicits._
      // dims normalized to span from 0 (part of the layout contract:
      // un-offset dims waste high bits and collapse the curve's prefix)
      val x = col("o_custkey").bitwiseAND(lit(65535L))
      val y = datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long").bitwiseAND(lit(65535L))
      Tables.orders(s, d)
        .select(graft.operators.Layout.zorder2(x, y).as("z"),
          x.as("xd"), y.as("yd"))
        .groupBy(shiftright($"z", 18).as("z_bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min($"xd").as("min_cust"), max($"xd").as("max_cust"),
          min($"yd").as("min_day"), max($"yd").as("max_day"))
        .orderBy($"z_bucket")
    },
    Some(s"""WITH dxy AS (SELECT (o_custkey & 65535) AS x,
        (date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
          & 65535) AS y
      FROM orders),
      z AS (SELECT x, y, ${zorder2Sql("x", "y")} AS zk FROM dxy)
      SELECT zk >> 18 AS z_bucket, count(*) AS n_orders,
        min(x) AS min_cust, max(x) AS max_cust,
        min(y) AS min_day, max(y) AS max_day
      FROM z GROUP BY z_bucket ORDER BY z_bucket"""),
    doc = "[NS] Z-order (Morton) layout keys + zone-map audit of both dims")

  /** [NS] — data-skipping advisor (q234): [[graft.operators.Layout
    * .pruningEfficiency]] simulates three candidate layouts for
    * lineitem — shipdate-sorted, partkey-sorted, and the Z-order
    * interleave of both — and measures how many 4096-row zone-map
    * buckets a partkey range predicate could prune under each. The
    * decision table for "is the Z-ORDER rewrite worth it": the
    * partkey sort prunes nearly everything for THIS predicate (and
    * nothing for a date predicate), the date sort prunes nothing, the
    * Z-order sits in between on BOTH — measured, not guessed, before
    * any data is rewritten. */
  val q234LayoutAdvisor = Q(
    "q234_layout_advisor",
    (s, d) => {
      import s.implicits._
      // all three simulated layouts rank the SAME 2-column projection —
      // materialize it once so each candidate sort reads the resident
      // rows instead of re-scanning lineitem (3 scans → 1)
      val li = Tables.lineitem(s, d)
        .withColumn("sd", datediff($"l_shipdate".cast("date"),
          lit("1995-01-01").cast("date")).cast("long"))
        .select($"l_partkey", $"sd")
        .localCheckpoint(true)
      val (lo, hi, bucket) = (100L, 200L, 4096L)
      def run(sorts: Seq[org.apache.spark.sql.Column], label: String) =
        graft.operators.Layout.pruningEfficiency(li, sorts,
          "l_partkey", bucket, lo, hi, label)
      val z = graft.operators.Layout.zorder2(
        $"l_partkey".bitwiseAND(lit(65535L)),
        $"sd".bitwiseAND(lit(65535L)))
      run(Seq($"sd"), "by_shipdate")
        .unionByName(run(Seq($"l_partkey"), "by_partkey"))
        .unionByName(run(Seq(z), "by_zorder"))
        .orderBy($"layout")
    },
    Some(s"""WITH base AS (SELECT l_partkey AS v,
          date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
            AS sd
        FROM lineitem),
      bz AS (SELECT v, sd,
          ${zorder2Sql("v & 65535", "sd & 65535")} AS zk FROM base),
      l1 AS (SELECT v, row_number() OVER (ORDER BY sd, v) - 1 AS rk
        FROM bz),
      l2 AS (SELECT v, row_number() OVER (ORDER BY v, v) - 1 AS rk
        FROM bz),
      l3 AS (SELECT v, row_number() OVER (ORDER BY zk, v) - 1 AS rk
        FROM bz),
      b1 AS (SELECT rk // 4096 AS b, min(v) AS mn, max(v) AS mx,
          sum(CASE WHEN v BETWEEN 100 AND 200 THEN 1 ELSE 0 END) AS hit
        FROM l1 GROUP BY 1),
      b2 AS (SELECT rk // 4096 AS b, min(v) AS mn, max(v) AS mx,
          sum(CASE WHEN v BETWEEN 100 AND 200 THEN 1 ELSE 0 END) AS hit
        FROM l2 GROUP BY 1),
      b3 AS (SELECT rk // 4096 AS b, min(v) AS mn, max(v) AS mx,
          sum(CASE WHEN v BETWEEN 100 AND 200 THEN 1 ELSE 0 END) AS hit
        FROM l3 GROUP BY 1),
      r AS (
        SELECT 'by_shipdate' AS layout, count(*) AS nb,
          sum(CASE WHEN mx < 100 OR mn > 200 THEN 1 ELSE 0 END) AS np,
          sum(hit) AS nh FROM b1
        UNION ALL
        SELECT 'by_partkey', count(*),
          sum(CASE WHEN mx < 100 OR mn > 200 THEN 1 ELSE 0 END),
          sum(hit) FROM b2
        UNION ALL
        SELECT 'by_zorder', count(*),
          sum(CASE WHEN mx < 100 OR mn > 200 THEN 1 ELSE 0 END),
          sum(hit) FROM b3)
      SELECT layout, CAST(nb AS BIGINT) AS n_buckets,
        CAST(np AS BIGINT) AS n_pruned,
        CAST((1000000 * np) // nb AS BIGINT) AS pruned_ppm,
        CAST(nh AS BIGINT) AS n_rows_hit
      FROM r ORDER BY layout"""),
    doc = "[NS] data-skipping advisor (zone-map pruning simulated per candidate layout)")

  /** [NS] — string-encoding advisor (q239): [[graft.operators.Layout
    * .stringEncodingAdvisor]] over the corpus token stream — the
    * distinct ratio prices a dictionary encoding (31 distinct tokens
    * over ~2M occurrences: near-total win), and the summed
    * sort-neighbor common prefixes price front-coding of the
    * dictionary itself. Exact integers; the prefix walk runs over the
    * VOCABULARY frame, never the data. */
  val q239StringEncoding = Q(
    "q239_string_encoding",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("tok"))
        .filter(length($"tok") > 0)
      graft.operators.Layout.stringEncodingAdvisor(toks, "tok")
    },
    Some("""WITH vals AS (SELECT tok AS v FROM (SELECT
          unnest(string_split(text, ' ')) AS tok FROM documents)
        WHERE length(tok) > 0),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_values,
          CAST(sum(length(v)) AS BIGINT) AS raw_bytes FROM vals),
      dv AS (SELECT DISTINCT v FROM vals),
      wp AS (SELECT v, lag(v, 1) OVER (ORDER BY v) AS p FROM dv),
      l AS (SELECT CAST(coalesce(sum(
          len(list_filter(range(1, least(length(v), length(p)) + 1),
            i -> substr(v, 1, CAST(i AS INT)) =
              substr(p, 1, CAST(i AS INT))))), 0) AS BIGINT)
          AS prefix_saved_bytes
        FROM wp WHERE p IS NOT NULL),
      dd AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
          CAST(sum(length(v)) AS BIGINT) AS dict_bytes FROM dv)
      SELECT n_values, n_distinct,
        CAST((1000000 * n_distinct) // n_values AS BIGINT)
          AS distinct_ppm,
        raw_bytes, dict_bytes, prefix_saved_bytes
      FROM t, dd, l"""),
    doc = "[NS] string-encoding advisor (dictionary + front-coding savings, exact)")

  val all: Seq[Q] = Seq(q42Cube, q43RankFuncs, q44SlidingWindow,
    q45SqlSurface, q46HllDistinct, q47SaltedAgg, q48Percentiles, q50Pivot,
    q59RangeWindow, q60ApproxPercentiles, q74PercentGate, q75GapFill,
    q84SnapshotDiff, q86SketchUnion, q87GroupingSets, q95CdcApply,
    q118ZorderLayout, q234LayoutAdvisor, q239StringEncoding)
}
