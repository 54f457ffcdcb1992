package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import QueryDsl._

/** The reference's load-bearing ETL semantics re-expressed on the star
  * schema: the refine scalar pipeline (yark `__refine_metadata`,
  * cmds/archive.py:82-120), FK insert-validation, cascade / restrict
  * deletes (schema.sql FK policies), and the guarded upsert
  * (cmds/archive.py:152-175). Spark has no FKs or MERGE on parquet, so
  * each is join algebra: validation = anti-join, cascade = semi-join chain
  * + anti-join rewrite, upsert = full-outer coalesce with the
  * never-downgrade guard.
  */
object YarkQueries {

  /** SURVEY §2.7 F1/F2/F10/F11 — the refine scalar chain on synthesized
    * URLs: build a watch-URL per event, strip the query string (F2),
    * extract the video id (F10), validate the 11-char id alphabet (F1),
    * scrub whitespace (F11). Deterministic: ids derive from md5. */
  val q34RefineUrls = Q(
    "q34_refine_urls",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("vid", substring(md5($"event_id".cast("string")), 1, 11))
        .withColumn("url",
          concat(lit("https://www.youtube.com/watch?v="), $"vid",
            lit("&t="), $"user_id".cast("string")))
        .withColumn("base_url", split_part($"url", lit("?"), lit(1)))
        .withColumn("extracted",
          regexp_extract($"url", "v=([0-9A-Za-z_-]{11})", 1))
        .withColumn("valid",
          (length($"extracted") === 11 &&
            $"extracted".rlike("^[0-9A-Za-z_-]{11}$")).cast("long"))
        .groupBy($"base_url")
        .agg(count(lit(1)).as("n"), sum($"valid").as("n_valid"),
          countDistinct($"extracted").as("n_ids"))
        .orderBy($"base_url")
    },
    Some("""WITH u AS (
        SELECT 'https://www.youtube.com/watch?v='
            || substr(md5(CAST(event_id AS VARCHAR)), 1, 11)
            || '&t=' || CAST(user_id AS VARCHAR) AS url,
          substr(md5(CAST(event_id AS VARCHAR)), 1, 11) AS vid
        FROM events),
      r AS (SELECT split_part(url, '?', 1) AS base_url,
          regexp_extract(url, 'v=([0-9A-Za-z_-]{11})', 1) AS extracted
        FROM u)
      SELECT base_url, count(*) AS n,
        CAST(sum(CASE WHEN length(extracted) = 11
          AND regexp_matches(extracted, '^[0-9A-Za-z_-]{11}$')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        count(DISTINCT extracted) AS n_ids
      FROM r GROUP BY base_url ORDER BY base_url"""),
    doc = "ref: utils.py:19-24 (F1), cmds/archive.py:88,334 (F2/F10)")

  /** SURVEY §2.7 F4/F5/F9 — null-coalescing + sentinel→NULL + default
    * blanking, the `__refine_metadata` core, on orders columns. */
  val q35RefineNulls = Q(
    "q35_refine_nulls",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("prio_clean",
          when($"o_orderpriority" === "1-URGENT", lit(null).cast("string"))
            .otherwise($"o_orderpriority"))
        .withColumn("prio_final", coalesce($"prio_clean", lit("UNSET")))
        .withColumn("status_blank",
          when($"o_orderstatus" === "P", "").otherwise($"o_orderstatus"))
        .groupBy($"prio_final", $"status_blank")
        .agg(count(lit(1)).as("n"))
        .orderBy($"prio_final", $"status_blank")
    },
    Some("""SELECT coalesce(CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
          ELSE o_orderpriority END, 'UNSET') AS prio_final,
        CASE WHEN o_orderstatus = 'P' THEN '' ELSE o_orderstatus END AS status_blank,
        count(*) AS n
      FROM orders GROUP BY 1, 2 ORDER BY prio_final, status_blank"""),
    doc = "ref: cmds/archive.py:105,114-117,183 (F4/F5/F9)")

  /** SURVEY §2.3 J1 — FK insert-validation by left-anti join: stage child
    * rows with half their part keys shifted out of range; violations =
    * staged keys with no parent in `part`. */
  val q36FkValidate = Q(
    "q36_fk_validate",
    (s, d) => {
      import s.implicits._
      val maxPart = Tables.part(s, d).agg(max($"p_partkey").as("mx"))
      val staged = Tables.lineitem(s, d)
        .join(broadcast(maxPart))
        .select($"l_orderkey", $"l_linenumber",
          when($"l_linenumber" % 2 === 0, $"l_partkey" + $"mx")
            .otherwise($"l_partkey").as("fk_part"))
      val violations = staged.join(Tables.part(s, d),
        staged("fk_part") === col("p_partkey"), "left_anti")
      violations.agg(count(lit(1)).as("n_violations"),
        countDistinct($"fk_part").as("n_bad_keys"))
    },
    Some("""WITH staged AS (
        SELECT l_orderkey, l_linenumber,
          CASE WHEN l_linenumber % 2 = 0
            THEN l_partkey + (SELECT max(p_partkey) FROM part)
            ELSE l_partkey END AS fk_part
        FROM lineitem)
      SELECT count(*) AS n_violations, count(DISTINCT fk_part) AS n_bad_keys
      FROM staged WHERE NOT EXISTS
        (SELECT 1 FROM part WHERE p_partkey = staged.fk_part)"""),
    doc = "ref: schema.sql FKs; IntegrityError at cmds/archive.py:160 (J1)")

  /** SURVEY §2.3 J2 + §2.4 W5 — cascade delete: deleting the min-key region
    * cascades region→nation→customer→orders→lineitem; output = surviving
    * row counts (single row). Each level is a semi-join against deleted
    * parent keys; survivors via anti-join. */
  val q37CascadeDelete = Q(
    "q37_cascade_delete",
    (s, d) => {
      import s.implicits._
      // Deleted-key sets materialize ONCE (eager localCheckpoint) — they
      // feed both the next cascade level and the surviving-count
      // anti-join, and recomputing them re-runs the whole upstream chain.
      // Each set is the deleted region's slice of its table, so
      // broadcasting it into the anti-join keeps every base table to a
      // single unshuffled scan. (At true 100 TB the delOrders set can
      // outgrow a broadcast; there the anti-join falls back to a shuffle
      // on the key — drop the hint, semantics unchanged.)
      val delRegion = Tables.region(s, d)
        .agg(min($"r_regionkey").as("rk"))
      val delNation = Tables.nation(s, d)
        .join(broadcast(delRegion), $"n_regionkey" === $"rk", "left_semi")
        .select($"n_nationkey".as("del_nkey")).localCheckpoint()
      val delCust = Tables.customer(s, d)
        .join(broadcast(delNation), $"c_nationkey" === $"del_nkey", "left_semi")
        .select($"c_custkey".as("del_ckey")).localCheckpoint()
      val delOrders = Tables.orders(s, d)
        .join(broadcast(delCust), $"o_custkey" === $"del_ckey", "left_semi")
        .select($"o_orderkey".as("del_okey")).localCheckpoint()
      val survNation = Tables.nation(s, d)
        .join(broadcast(delNation), $"n_nationkey" === $"del_nkey", "left_anti")
      val survCust = Tables.customer(s, d)
        .join(broadcast(delNation), $"c_nationkey" === $"del_nkey", "left_anti")
      val survOrders = Tables.orders(s, d)
        .join(broadcast(delCust), $"o_custkey" === $"del_ckey", "left_anti")
      val survLine = Tables.lineitem(s, d)
        .join(broadcast(delOrders), $"l_orderkey" === $"del_okey", "left_anti")
      survNation.agg(count(lit(1)).as("n_nation"))
        .crossJoin(survCust.agg(count(lit(1)).as("n_customer")))
        .crossJoin(survOrders.agg(count(lit(1)).as("n_orders")))
        .crossJoin(survLine.agg(count(lit(1)).as("n_lineitem")))
    },
    Some("""WITH delr AS (SELECT min(r_regionkey) AS rk FROM region),
      deln AS (SELECT n_nationkey FROM nation, delr WHERE n_regionkey = rk),
      delc AS (SELECT c_custkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM deln)),
      delo AS (SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM delc))
      SELECT
        (SELECT count(*) FROM nation
          WHERE n_nationkey NOT IN (SELECT n_nationkey FROM deln)) AS n_nation,
        (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN (SELECT c_custkey FROM delc)) AS n_customer,
        (SELECT count(*) FROM orders
          WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delo)) AS n_orders,
        (SELECT count(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM delo)) AS n_lineitem"""),
    doc = "ref: schema.sql:25-41 ON DELETE CASCADE; cmds/archive.py:408 (J2/W5)")

  /** SURVEY §2.3 J4 — restrict-delete guard: suppliers with negative
    * balance are delete candidates; those still referenced by lineitem are
    * restricted (semi-join) — the reference's ON DELETE RESTRICT probe. */
  val q38RestrictCheck = Q(
    "q38_restrict_check",
    (s, d) => {
      import s.implicits._
      // Probe direction matters at scale: broadcasting the small filtered
      // candidate set into a lineitem scan keeps the fact table
      // UNSHUFFLED (semi-join the other way would sort-merge both sides
      // on suppkey). The distinct referenced-key set is tiny and
      // map-side partial aggregation shrinks it before the one shuffle.
      val candidates = Tables.supplier(s, d).filter($"s_acctbal" < 0)
      val referenced = Tables.lineitem(s, d)
        .join(broadcast(candidates.select($"s_suppkey")),
          $"l_suppkey" === $"s_suppkey", "left_semi")
        .select($"l_suppkey").distinct()
      candidates
        .join(referenced, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name").orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE s_acctbal < 0 AND EXISTS
        (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
      ORDER BY s_suppkey"""),
    doc = "ref: schema.sql:14,67 ON DELETE RESTRICT (J4)")

  /** SURVEY §2.4 W1/W2 — guarded upsert (MERGE-as-join on parquet): stage
    * updates (every 7th order repriced +10%, plus key-shifted brand-new
    * rows), merge into orders with the reference's never-downgrade guard
    * (only update when the staged price is non-null and higher —
    * cmds/archive.py:162). Output = checksum of the merged table. */
  val q39UpsertMerge = Q(
    "q39_upsert_merge",
    (s, d) => {
      import s.implicits._
      val base = Tables.orders(s, d)
      val mx = base.agg(max($"o_orderkey").as("mx"))
      val updates = base.join(broadcast(mx))
        .filter($"o_orderkey" % 7 === 0)
        .select(
          when($"o_orderkey" % 14 === 0, $"o_orderkey" + $"mx" + 1)
            .otherwise($"o_orderkey").as("u_orderkey"),
          (round($"o_totalprice" * lit(1.1) * 100, 0) / 100).as("u_totalprice"),
          lit("U").as("u_status"))
      val merged = base.join(updates, $"o_orderkey" === $"u_orderkey", "full_outer")
        .select(
          coalesce($"o_orderkey", $"u_orderkey").as("orderkey"),
          when($"o_orderkey".isNull, $"u_totalprice") // insert branch
            .when($"u_totalprice".isNotNull && $"u_totalprice" > $"o_totalprice",
              $"u_totalprice") // guarded update branch
            .otherwise($"o_totalprice").as("totalprice"),
          when($"o_orderkey".isNull, $"u_status")
            .when($"u_totalprice".isNotNull && $"u_totalprice" > $"o_totalprice",
              $"u_status")
            .otherwise($"o_orderstatus").as("status"))
      merged.groupBy($"status")
        .agg(count(lit(1)).as("n"), exactSum($"totalprice", 2).as("sum_price"))
        .orderBy($"status")
    },
    Some(s"""WITH mx AS (SELECT max(o_orderkey) AS mx FROM orders),
      updates AS (SELECT
          CASE WHEN o_orderkey % 14 = 0 THEN o_orderkey + mx + 1
            ELSE o_orderkey END AS u_orderkey,
          round(o_totalprice * 1.1 * 100) / 100 AS u_totalprice,
          'U' AS u_status
        FROM orders, mx WHERE o_orderkey % 7 = 0),
      merged AS (SELECT
          coalesce(o_orderkey, u_orderkey) AS orderkey,
          CASE WHEN o_orderkey IS NULL THEN u_totalprice
            WHEN u_totalprice IS NOT NULL AND u_totalprice > o_totalprice
              THEN u_totalprice
            ELSE o_totalprice END AS totalprice,
          CASE WHEN o_orderkey IS NULL THEN u_status
            WHEN u_totalprice IS NOT NULL AND u_totalprice > o_totalprice
              THEN u_status
            ELSE o_orderstatus END AS status
        FROM orders FULL OUTER JOIN updates ON o_orderkey = u_orderkey)
      SELECT status, count(*) AS n, ${exactSumSql("totalprice", 2)} AS sum_price
      FROM merged GROUP BY status ORDER BY status"""),
    doc = "ref: cmds/archive.py:152-175 guarded upsert W2 (MERGE-as-join)")

  /** SURVEY §2.4 W1 — insert-if-absent (INSERT OR IGNORE): incoming batch
    * is half-existing / half-new customer keys; only absent keys append.
    * Anti-join implementation; output = post-insert segment counts. */
  val q40InsertIfAbsent = Q(
    "q40_insert_if_absent",
    (s, d) => {
      import s.implicits._
      val base = Tables.customer(s, d)
      val mx = base.agg(max($"c_custkey").as("mx"))
      val incoming = base.join(broadcast(mx))
        .filter($"c_custkey" % 5 === 0)
        .select(
          when($"c_custkey" % 10 === 0, $"c_custkey" + $"mx" + 1)
            .otherwise($"c_custkey").as("c_custkey"),
          lit("INCOMING").as("c_mktsegment"))
      val toInsert = incoming.join(base.select($"c_custkey"),
        Seq("c_custkey"), "left_anti")
      base.select($"c_custkey", $"c_mktsegment")
        .unionByName(toInsert)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    },
    Some("""WITH mx AS (SELECT max(c_custkey) AS mx FROM customer),
      incoming AS (SELECT
          CASE WHEN c_custkey % 10 = 0 THEN c_custkey + mx + 1
            ELSE c_custkey END AS c_custkey,
          'INCOMING' AS c_mktsegment
        FROM customer, mx WHERE c_custkey % 5 = 0),
      merged AS (
        SELECT c_custkey, c_mktsegment FROM customer
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM incoming
        WHERE NOT EXISTS (SELECT 1 FROM customer c2
          WHERE c2.c_custkey = incoming.c_custkey))
      SELECT c_mktsegment, count(*) AS n FROM merged
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    doc = "ref: cmds/archive.py:133,144-150 INSERT OR IGNORE (W1)")

  /** SURVEY §2.1 S9/S10 [NS multimodal] — binary-column plumbing: treat the
    * text payload as opaque bytes (BinaryType), compute byte lengths and a
    * binary prefix signature — blobs stay out of wide shuffles (only
    * aggregated scalars move). */
  val q41BinaryMeta = Q(
    "q41_binary_meta",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("payload", $"text".cast("binary"))
        .withColumn("n_bytes", octet_length($"payload").cast("long"))
        .withColumn("sig", md5($"payload"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_blobs"), sum($"n_bytes").as("total_bytes"),
          max($"n_bytes").as("max_bytes"),
          countDistinct($"sig").as("n_distinct_sigs"))
        .orderBy($"source")
    },
    Some("""SELECT source, count(*) AS n_blobs,
      CAST(sum(CAST(strlen(text) AS BIGINT)) AS BIGINT) AS total_bytes,
      max(CAST(strlen(text) AS BIGINT)) AS max_bytes,
      count(DISTINCT md5(text)) AS n_distinct_sigs
      FROM documents GROUP BY source ORDER BY source"""),
    doc = "ref: schema.sql:49 BLOB column; SURVEY §2.1 S9/S10 (binary meta)")

  /** SURVEY §2.3 J3 — recursive cascade over a self-FK tree (the comment
    * reply tree, schema.sql:41, exercised by cmds/archive.py:408): a
    * parent chain synthesized over orders (parent = o_orderkey div 2),
    * seeded at keys 32..39, cascaded to fixpoint. The oracle is DuckDB's
    * WITH RECURSIVE — the driver-checkable twin of the plan-iterating
    * fixpoint in [[graft.operators.Integrity.cascadeRecursive]]. */
  val q51RecursiveCascade = Q(
    "q51_recursive_cascade",
    (s, d) => {
      import s.implicits._
      val nodes = Tables.orders(s, d)
        .select($"o_orderkey", expr("o_orderkey div 2").as("parent"))
      val seeds = nodes.filter($"o_orderkey".between(32, 39))
        .select($"o_orderkey")
      graft.operators.Integrity
        .cascadeRecursive(nodes, "o_orderkey", "parent", seeds)
        .agg(count(lit(1)).as("n_deleted"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"),
          sum($"o_orderkey").as("sum_keys"))
    },
    Some("""WITH RECURSIVE del AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey BETWEEN 32 AND 39
        UNION
        SELECT o.o_orderkey FROM orders o JOIN del ON o.o_orderkey // 2 = del.k)
      SELECT count(*) AS n_deleted, min(k) AS min_key, max(k) AS max_key,
        CAST(sum(k) AS BIGINT) AS sum_keys
      FROM del"""),
    doc = "ref: schema.sql:41 self-FK; cmds/archive.py:408 (J3 fixpoint)")

  /** J3 scale variant — the SAME recursive cascade computed by pointer
    * doubling (log-depth self-join rounds instead of depth frontier
    * rounds; Integrity.cascadeRecursiveDoubling). Identical oracle to
    * q51: both strategies must produce the same deleted set. */
  val q55CascadeDoubling = Q(
    "q55_cascade_doubling",
    (s, d) => {
      import s.implicits._
      val nodes = Tables.orders(s, d)
        .select($"o_orderkey", expr("o_orderkey div 2").as("parent"))
      val seeds = nodes.filter($"o_orderkey".between(32, 39))
        .select($"o_orderkey")
      graft.operators.Integrity
        .cascadeRecursiveDoubling(nodes, "o_orderkey", "parent", seeds)
        .agg(count(lit(1)).as("n_deleted"),
          min($"o_orderkey").as("min_key"), max($"o_orderkey").as("max_key"),
          sum($"o_orderkey").as("sum_keys"))
    },
    Some("""WITH RECURSIVE del AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey BETWEEN 32 AND 39
        UNION
        SELECT o.o_orderkey FROM orders o JOIN del ON o.o_orderkey // 2 = del.k)
      SELECT count(*) AS n_deleted, min(k) AS min_key, max(k) AS max_key,
        CAST(sum(k) AS BIGINT) AS sum_keys
      FROM del"""),
    doc = "ref: schema.sql:41 self-FK; J3 via pointer doubling (log-depth)")

  /** SURVEY §2.7 F3/F12/F13/F16 — the scalar quirks previously covered
    * only by ScalaTest, oracle-checked on synthesized inputs: file
    * extension extraction (split('.')[-1].split('?')[0]), sec→min→hr
    * duration formatting with floor-to-1-decimal, ANSI escape stripping
    * (anchored on ESC — plain "[2m" survives), and the yes/maybe/no
    * reply classification with the reference's exact word lists. */
  val q61RefineScalars = Q(
    "q61_refine_scalars",
    (s, d) => {
      import s.implicits._
      import graft.functions.Refine
      val replies = array(Seq("yes", "nah", "maybe", "what", "ok", "dont",
        "probably", "go ahead").map(lit): _*)
      val exts = array(Seq("jpg", "webp", "png").map(lit): _*)
      Tables.events(s, d)
        .filter($"event_id" < 200)
        .withColumn("fname",
          concat(lit("clip_"), ($"event_id" % 50).cast("string"), lit("."),
            element_at(exts, ($"event_id" % 3 + 1).cast("int")),
            when($"event_id" % 3 === 0,
              concat(lit("?t="), $"user_id".cast("string")))
              .otherwise(lit(""))))
        .withColumn("sec", ($"event_id" * 37) % 7200)
        .withColumn("colored",
          concat(lit("\u001B[31m"), $"fname", lit("\u001B[0m ok [2m")))
        .select($"event_id",
          Refine.fileExt($"fname").as("ext"),
          Refine.fmtDuration($"sec").as("dur"),
          Refine.stripAnsi($"colored").as("clean"),
          Refine.yesNo(element_at(replies, ($"event_id" % 8 + 1).cast("int")))
            .as("reply_code"))
        .orderBy($"event_id")
    },
    Some("""WITH base AS (
        SELECT event_id,
          'clip_' || CAST(event_id % 50 AS VARCHAR) || '.' ||
            (['jpg','webp','png'])[(event_id % 3) + 1] ||
            CASE WHEN event_id % 3 = 0
              THEN '?t=' || CAST(user_id AS VARCHAR) ELSE '' END AS fname,
          (event_id * 37) % 7200 AS sec,
          (['yes','nah','maybe','what','ok','dont','probably','go ahead'])
            [(event_id % 8) + 1] AS reply
        FROM events WHERE event_id < 200)
      SELECT event_id,
        split_part(split_part(fname, '.', -1), '?', 1) AS ext,
        CASE WHEN sec < 60 THEN CAST(sec AS VARCHAR) || ' seconds'
          WHEN sec < 3600
            THEN CAST(floor(sec / 60 * 10) / 10 AS VARCHAR) || ' minutes'
          ELSE CAST(floor(sec / 3600 * 10) / 10 AS VARCHAR) || ' hours'
          END AS dur,
        regexp_replace(
          chr(27) || '[31m' || fname || chr(27) || '[0m ok [2m',
          '\x1B(?:[@-Z\\-_]|\[[0-?]*[ -/]*[@-~])', '', 'g') AS clean,
        CASE WHEN reply IN ('yes','y','yep','sure','ight','ok','okey',
            'go ahead','cool','ye','yeh','yee','do it','why not') THEN 1
          WHEN reply IN ('maybe','perhaps','possibly','conceivably',
            'probably') THEN -1
          WHEN reply IN ('no','n','nah','nou','dont','don''t') THEN 0
          ELSE -2 END AS reply_code
      FROM base ORDER BY event_id"""),
    doc = "SURVEY §2.7 F3/F12/F13/F16 scalar quirks (oracle-checked)")

  /** SURVEY §2.3 J5 — pre-insert author backfill (cmds/archive.py:180-181):
    * referenced authors (orders.o_custkey as the FK) missing from the
    * simulated user registry (every 3rd customer) are found by anti-join
    * and union-inserted before the child insert can satisfy its FK. */
  val q62AuthorBackfill = Q(
    "q62_author_backfill",
    (s, d) => {
      import s.implicits._
      val users = Tables.customer(s, d)
        .filter($"c_custkey" % 3 === 0).select($"c_custkey")
      val referenced = Tables.orders(s, d).select($"o_custkey").distinct()
      val missing = referenced
        .join(users, $"o_custkey" === $"c_custkey", "left_anti")
      val after = users.unionByName(missing.select($"o_custkey".as("c_custkey")))
      users.agg(count(lit(1)).as("n_existing"))
        .crossJoin(missing.agg(count(lit(1)).as("n_backfilled")))
        .crossJoin(after.agg(count(lit(1)).as("n_after")))
    },
    Some("""WITH users AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0),
      referenced AS (SELECT DISTINCT o_custkey FROM orders),
      missing AS (SELECT o_custkey FROM referenced
        WHERE o_custkey NOT IN (SELECT c_custkey FROM users))
      SELECT (SELECT count(*) FROM users) AS n_existing,
        (SELECT count(*) FROM missing) AS n_backfilled,
        (SELECT count(*) FROM users) + (SELECT count(*) FROM missing) AS n_after"""),
    doc = "ref: cmds/archive.py:180-181 (J5 anti-join backfill + union-insert)")

  /** SURVEY §2.4 W4 — delete-then-insert replace (playlist replace,
    * cmds/archive.py:289-294) as DataFrame algebra: base rows whose key
    * matches incoming are dropped, incoming appended. Exact-sum checksum
    * proves value-level equality, not just counts. */
  val q63ReplaceByKey = Q(
    "q63_replace_by_key",
    (s, d) => {
      import s.implicits._
      val base = Tables.supplier(s, d)
        .select($"s_suppkey", $"s_name", $"s_acctbal")
      val incoming = base.filter($"s_suppkey" % 10 === 0)
        .select($"s_suppkey", concat(lit("R_"), $"s_name").as("s_name"),
          lit(0.0).as("s_acctbal"))
      graft.operators.Upsert.replaceByKey(base, incoming, Seq("s_suppkey"))
        .agg(count(lit(1)).as("n"),
          exactSum($"s_acctbal", 2).as("sum_bal"),
          count(when($"s_name".startsWith("R_"), 1)).as("n_replaced"))
    },
    Some("""WITH base AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier),
      incoming AS (SELECT s_suppkey, 'R_' || s_name AS s_name,
          0.0 AS s_acctbal FROM base WHERE s_suppkey % 10 = 0),
      replaced AS (
        SELECT * FROM base
        WHERE s_suppkey NOT IN (SELECT s_suppkey FROM incoming)
        UNION ALL SELECT * FROM incoming)
      SELECT count(*) AS n, """ + exactSumSql("s_acctbal", 2) + """ AS sum_bal,
        CAST(sum(CASE WHEN s_name LIKE 'R\_%' ESCAPE '\' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_replaced
      FROM replaced"""),
    doc = "ref: cmds/archive.py:289-294 (W4 delete-then-insert replace)")

  /** SURVEY §2.1 S9 [NS multimodal] — REAL audio decode round-trip: WAV
    * containers synthesized per doc (16-bit PCM sine, doc_id-derived
    * channel count and frame length, written by the JDK's own WAVE
    * writer), then header-probed back via javax.sound. The oracle knows
    * nothing about audio — it recomputes every expected value (channels,
    * frames, exact container byte size = 44 + frames·ch·2) from doc_id
    * arithmetic, so a green row proves the decoder reads TRUE parameters
    * out of a real RIFF container, not echoes of a stub. Blobs stay in
    * executor partitions; only scalar metadata is shuffled. */
  val q85AudioMeta = Q(
    "q85_audio_meta",
    (s, d) => {
      import s.implicits._
      implicit val sp: SparkSession = s
      val media = Tables.documents(s, d).select($"doc_id").as[Long]
        .mapPartitions(_.map { id =>
          val ch = 1 + (id % 2).toInt
          val frames = (400 + (id % 50) * 40).toInt
          (id, graft.operators.Multimodal.synthWavBytes(8000, ch, frames))
        }).toDF("id", "payload")
      graft.operators.Multimodal.decodeAudioMeta(media)
        .groupBy($"channels")
        .agg(count(lit(1)).as("n"),
          count(when($"decoded" && $"container" === "wave" &&
            $"sample_rate" === 8000, 1)).as("n_decoded"),
          sum($"n_frames").as("total_frames"),
          min($"n_frames").as("min_frames"),
          max($"n_frames").as("max_frames"),
          sum($"n_bytes").as("total_bytes"))
        .orderBy($"channels")
    },
    Some("""WITH m AS (SELECT 1 + doc_id % 2 AS channels,
        400 + (doc_id % 50) * 40 AS n_frames FROM documents)
      SELECT CAST(channels AS INT) AS channels, count(*) AS n,
        count(*) AS n_decoded,
        CAST(sum(n_frames) AS BIGINT) AS total_frames,
        CAST(min(n_frames) AS BIGINT) AS min_frames,
        CAST(max(n_frames) AS BIGINT) AS max_frames,
        CAST(sum(44 + n_frames * channels * 2) AS BIGINT) AS total_bytes
      FROM m GROUP BY 1 ORDER BY channels"""),
    doc = "[NS] real WAV decode (javax.sound) vs arithmetic oracle (S9 audio)")

  val all: Seq[Q] = Seq(q34RefineUrls, q35RefineNulls, q36FkValidate,
    q37CascadeDelete, q38RestrictCheck, q39UpsertMerge, q40InsertIfAbsent,
    q41BinaryMeta, q51RecursiveCascade, q55CascadeDoubling, q61RefineScalars,
    q62AuthorBackfill, q63ReplaceByKey, q85AudioMeta)
}
