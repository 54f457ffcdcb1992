package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryDsl._

/** TPC-H-style queries over the star schema: scans, joins, aggregations,
  * windows, set ops. Each maps to a SURVEY.md §2 operator row.
  *
  * Scale stance: dimension joins are explicitly `broadcast()` (region,
  * nation, supplier, part are tiny relative to facts at any SF); fact-fact
  * joins shuffle on their equi-keys and rely on AQE for skew; every filter
  * and projection is declarative so Catalyst pushes them into the parquet
  * scan (`PushedFilters` / pruned `ReadSchema`).
  */
object StarQueries {

  /** SURVEY §2.5 A5 — TPC-H Q1-style pricing summary: hash aggregate with
    * partial (map-side) + final phases, grouped on low-cardinality keys. */
  val q01PricingSummary = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          exactSum($"l_quantity", 2).as("sum_qty"),
          exactSum($"l_extendedprice", 2).as("sum_base_price"),
          exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
            .as("sum_disc_price"),
          exactAvg($"l_quantity", 2).as("avg_qty"),
          exactAvg($"l_discount", 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${exactSumSql("l_quantity", 2)} AS sum_qty,
      ${exactSumSql("l_extendedprice", 2)} AS sum_base_price,
      ${exactSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
      ${exactAvgSql("l_quantity", 2)} AS avg_qty,
      ${exactAvgSql("l_discount", 2)} AS avg_disc,
      count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    doc = "ref: SURVEY §2.5 A5 (hash agg, partial+final)")

  /** SURVEY §2.1 S3 + §2.2 P7 — filtered scan with projection; predicate and
    * column pruning must reach the parquet reader. */
  val q02FilteredScan = Q(
    "q02_filtered_scan",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= lit("2001-06-01").cast("timestamp") &&
          $"l_discount" > 0.06 && $"l_quantity".isNotNull)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
        AND l_discount > 0.06 AND l_quantity IS NOT NULL
      ORDER BY l_orderkey, l_linenumber"""),
    doc = "ref: cmds/archive.py:356 (filtered scan S3)")

  /** SURVEY §2.2 P1 — point lookup via scalar subquery (min key), planned as
    * a broadcast join of a 1-row aggregate against the fact scan. */
  val q03PointLookup = Q(
    "q03_point_lookup",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val k = Tables.orders(s, d).agg(min($"o_orderkey").as("k"))
      li.join(broadcast(k), $"l_orderkey" === $"k")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .orderBy($"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
      ORDER BY l_linenumber"""),
    doc = "ref: cmds/archive.py:126-127 (PK probe P1)")

  /** SURVEY §2.6 — top-k = orderBy().limit(k); Spark plans
    * TakeOrderedAndProject (no full sort at scale). Tie-broken on the PK so
    * the result is total-ordered and hash-stable. */
  val q04TopkOrders = Q(
    "q04_topk_orders",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
    doc = "SURVEY §2.6 top-k (TakeOrderedAndProject)")

  /** SURVEY §2.3 J6 — dimension join chain customer⋈nation⋈region, both dims
    * broadcast; then hash agg per region. */
  val q05JoinDims = Q(
    "q05_join_dims",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"),
          exactSum($"c_acctbal", 2).as("sum_acctbal"))
        .orderBy($"r_name")
    },
    Some(s"""SELECT r_name, count(*) AS n_customers,
      ${exactSumSql("c_acctbal", 2)} AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""),
    doc = "SURVEY §2.3 J6 (broadcast dim joins)")

  /** SURVEY §2.3 J6 — fact-fact equi join lineitem⋈orders (shuffle on
    * orderkey; AQE handles skew), revenue per priority. */
  val q06RevenueJoin = Q(
    "q06_revenue_join",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          exactSum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
            .as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"o_orderpriority")
    },
    Some(s"""SELECT o_orderpriority,
      ${exactSumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
      count(DISTINCT o_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    doc = "SURVEY §2.3 J6 (fact-fact sort-merge/shuffle join)")

  /** SURVEY §2.3 J1/D1 — left-anti join: customers with no orders (the
    * reference's NOT-EXISTS / insert-validation shape). */
  val q07AntiJoin = Q(
    "q07_anti_join",
    (s, d) => {
      import s.implicits._
      val bigOrders = Tables.orders(s, d).filter($"o_totalprice" > 300000.0)
      Tables.customer(s, d)
        .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey"""),
    doc = "ref: schema.sql FKs → SURVEY §2.3 J1 (left-anti)")

  /** SURVEY §2.3 J4 — left-semi join: brands having shipped lineitems (the
    * reference's EXISTS / restrict-guard shape). */
  val q08SemiJoin = Q(
    "q08_semi_join",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), $"p_partkey" === $"l_partkey", "left_semi")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand, count(*) AS n_parts FROM part
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      GROUP BY p_brand ORDER BY p_brand"""),
    doc = "ref: cmds/archive.py:180 (EXISTS probe) → SURVEY §2.3 J4")

  /** SURVEY §2.6 — ranking window: top-3 orders per customer by price,
    * row_number over (custkey / price desc, orderkey) — deterministic. */
  val q09WindowRank = Q(
    "q09_window_rank",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rn")
    },
    Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""),
    doc = "SURVEY §2.6 ranking window")

  /** SURVEY §2.6 — frame-spec window: per-supplier rolling 3-row quantity
    * sum over ship order, reduced to max per supplier (bounded output). */
  val q10WindowRolling = Q(
    "q10_window_rolling",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
        .rowsBetween(-2, 0)
      Tables.lineitem(s, d)
        .withColumn("rolling_qty", sum($"l_quantity").over(w))
        .groupBy($"l_suppkey")
        .agg(exactSum($"rolling_qty", 2).as("sum_rolling"),
          max($"rolling_qty").as("max_rolling"))
        .orderBy($"l_suppkey")
    },
    Some(s"""SELECT l_suppkey,
      ${exactSumSql("rolling_qty", 2)} AS sum_rolling,
      max(rolling_qty) AS max_rolling
      FROM (
        SELECT l_suppkey, sum(l_quantity) OVER (PARTITION BY l_suppkey
          ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_qty
        FROM lineitem) t
      GROUP BY l_suppkey ORDER BY l_suppkey"""),
    doc = "SURVEY §2.6 frame-spec window (rowsBetween)")

  /** SURVEY §2.5 [NS] — rollup over region/nation hierarchy with GROUPING()
    * markers (maps to GROUPING SETS physical agg). */
  val q11Rollup = Q(
    "q11_rollup",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"),
          grouping($"r_name").cast("long").as("g_region"),
          grouping($"n_name").cast("long").as("g_nation"))
        .orderBy($"g_region", $"g_nation", $"r_name", $"n_name")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_customers,
        CAST(GROUPING(r_name) AS BIGINT) AS g_region,
        CAST(GROUPING(n_name) AS BIGINT) AS g_nation
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY g_region, g_nation, r_name, n_name"""),
    doc = "SURVEY §2.5 A5 [NS] rollup/grouping-sets")

  /** SURVEY §2.6 [NS] — set ops: segment-A customers ∪ segment-B, minus
    * those with F-status orders, ∩ positive balances. */
  val q12SetOps = Q(
    "q12_set_ops",
    (s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val ab = c.filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
        .union(c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey"))
      val withF = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("c_custkey"))
      val pos = c.filter($"c_acctbal" > 0).select($"c_custkey")
      ab.except(withF).intersect(pos).orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey FROM (
        SELECT c_custkey FROM (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
          UNION
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') u
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F') e
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 0
      ORDER BY c_custkey"""),
    doc = "SURVEY §2.6 [NS] union/except/intersect")

  /** SURVEY §2.5 — distinct aggregation: exact distinct counts per group
    * (expand-based distinct agg; HLL variant covered in tests). */
  val q13DistinctAgg = Q(
    "q13_distinct_agg",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(countDistinct($"l_suppkey").as("n_supp"),
          countDistinct($"l_partkey").as("n_part"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
      count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    doc = "SURVEY §2.5 distinct agg")

  /** SURVEY §2.5 A1-A3 — conditional counts (count(when ...)), the
    * reference's counter idiom, one output row. */
  val q14ConditionalCount = Q(
    "q14_conditional_count",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).agg(
        count(when($"o_orderstatus" === "F", 1)).as("n_f"),
        count(when($"o_orderstatus" === "O", 1)).as("n_o"),
        count(when($"o_totalprice" > 100000.0, 1)).as("n_big"),
        count(lit(1)).as("n_all"))
    },
    Some("""SELECT count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      count(CASE WHEN o_totalprice > 100000.0 THEN 1 END) AS n_big,
      count(*) AS n_all FROM orders"""),
    doc = "ref: cmds/archive.py:208,330,357 (conditional counters A1-A3)")

  val all: Seq[Q] = Seq(
    q01PricingSummary, q02FilteredScan, q03PointLookup, q04TopkOrders,
    q05JoinDims, q06RevenueJoin, q07AntiJoin, q08SemiJoin, q09WindowRank,
    q10WindowRolling, q11Rollup, q12SetOps, q13DistinctAgg,
    q14ConditionalCount)
}
