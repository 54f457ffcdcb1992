package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** [NS] streaming analytics over event feeds (SURVEY §2.9): tumbling /
  * sliding / session windows with watermarks, plus a custom stateful
  * per-key sessionizer via flatMapGroupsWithState.
  *
  * All transforms take a DataFrame with (ts TIMESTAMP, user_id LONG,
  * event_type STRING, value DOUBLE) and work on both batch and streaming
  * inputs (unified API); watermarks only apply when streaming.
  */
object EventStream {

  /** Tumbling window count/sum per event_type. */
  def tumbling(events: DataFrame, width: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"),
        col("sum_value"))

  /** Sliding window (width, slide) event counts. */
  def sliding(events: DataFrame, width: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"))

  /** Session window (gap-based) per user. */
  def session(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join (the streaming twin of
    * operators.Temporal.rangeJoin / q64): pairs each left event with the
    * right events of the same user within `window` AFTER it. Watermarks
    * on BOTH sides plus the event-time range condition bound the join
    * state — Spark evicts buffered rows once they fall behind
    * watermark − window, which is what makes an unbounded stream-stream
    * join feasible at all. Works unchanged on batch inputs (the
    * watermark is a no-op there).
    *
    * Inputs need (ts TIMESTAMP, user_id LONG); output one row per
    * in-window pair. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withWatermark("ts", watermark).alias("r")
    l.join(r, expr(
      s"""l.user_id = r.user_id AND
          r.ts >= l.ts AND r.ts <= l.ts + interval $window"""))
      .select(col("l.user_id").as("user_id"), col("l.ts").as("left_ts"),
        col("r.ts").as("right_ts"))
  }

  /** The three funnel-stage tables of the ordered view→click→purchase
    * funnel: per user, t1 = first view, t2 = first click strictly after
    * t1, t3 = first purchase strictly after t2. Each stage is one
    * combining aggregate plus an equi-join on user_id against the (small)
    * prior-stage table; the ordering constraint is a plain predicate —
    * no window, no per-user event sort anywhere. */
  private def funnelTimes(e: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    (t1, t2, t3)
  }

  /** Batch funnel — per-stage user counts (q77's operator home). */
  def funnelStages(e: DataFrame): DataFrame = {
    val (t1, t2, t3) = funnelTimes(e)
    t1.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
      .unionByName(t2.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("2_click")))
      .unionByName(t3.agg(count(lit(1)).as("n_users"))
        .withColumn("stage", lit("3_purchase")))
      .select(col("stage"), col("n_users"))
      .orderBy(col("stage"))
  }

  /** Batch funnel — per-user qualifying times (user_id, t1, t2, t3;
    * t2/t3 NULL where the user never reached the stage). The granular
    * form the streaming twin is asserted against. */
  def funnelUserTimes(e: DataFrame): DataFrame = {
    val (t1, t2, t3) = funnelTimes(e)
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
  }

  /** Per-user funnel state: earliest qualifying timestamp per stage
    * (epoch micros) — three optional longs, BOUNDED regardless of how
    * many events a user produces. */
  case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** Emitted per touched user per trigger; fields are monotone (a set
    * stage never unsets), so the latest row per user is the final state. */
  case class FunnelUser(user_id: Long, t1: Option[Long], t2: Option[Long],
      t3: Option[Long])

  /** [NS] — STREAMING twin of [[funnelStages]]/q77 via
    * flatMapGroupsWithState: the multi-stage stateful funnel the
    * windowed/join streaming surface can't express. Input rows are
    * (user_id, ts epoch-micros, event_type).
    *
    * Within a micro-batch the user's rows are replayed in ascending-ts
    * order (the post-shuffle iterator has NO order guarantee), so the
    * state machine — t1 := first view; t2 := first click > t1;
    * t3 := first purchase > t2, all strict — lands exactly on the batch
    * definition for any within-batch arrival disorder. Across batches
    * the state carries forward; equality with the batch form holds under
    * event-time-ordered batch boundaries (the watermark contract), since
    * a stage decided from batch N's events is never re-opened by a
    * LATER-arriving EARLIER event — the price every bounded-state
    * streaming funnel pays. The in-batch sort buffers ONE user's
    * one-batch events, not corpus-wide state. */
  def funnelStateful(events: Dataset[(Long, Long, String)])(
      implicit spark: SparkSession): Dataset[FunnelUser] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, String)],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, et) =>
            et match {
              case "view" =>
                if (st.t1.isEmpty) st = st.copy(t1 = Some(ts))
              case "click" =>
                if (st.t2.isEmpty && st.t1.exists(ts > _))
                  st = st.copy(t2 = Some(ts))
              case "purchase" =>
                if (st.t3.isEmpty && st.t2.exists(ts > _))
                  st = st.copy(t3 = Some(ts))
              case _ => ()
            }
          }
          state.update(st)
          Iterator(FunnelUser(uid, st.t1, st.t2, st.t3))
      }
  }

  /** First-sight key state: event time (epoch ms) of the first
    * occurrence — one long per live key. */
  case class FirstSeen(firstMs: Long)

  /** [NS] — streaming FIRST-SIGHT dedup with watermark-driven state
    * EVICTION: emit a key's first occurrence, suppress duplicates for
    * `ttlMs` of EVENT time after that first sight, then let the state
    * die via `GroupStateTimeout.EventTimeTimeout` — the bounded-state
    * contract an unbounded keyspace demands (keep-forever state, which
    * `dropDuplicates` on a stream implies, OOMs a 100 TB pipeline; a
    * TTL is the standard trade: a duplicate arriving after eviction
    * re-emits, exactly like re-archiving after retention).
    *
    * Eviction is deterministic in event time: timeout fires once the
    * watermark passes firstSight + ttl (clamped above the current
    * watermark as the API requires) and the key is absent from the
    * trigger. Duplicates do NOT extend the TTL (fixed window after
    * first sight, not sliding). Input: (keyCol, tsCol TIMESTAMP);
    * output: (key, first_ts), append-mode. */
  def firstSightDedup(events: DataFrame, keyCol: String, tsCol: String,
      watermark: String, ttlMs: Long)(
      implicit spark: SparkSession): DataFrame = {
    require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")
    import spark.implicits._
    events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"))
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FirstSeen, (String, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
            state: GroupState[FirstSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // duplicate within the TTL window — suppressed, but the
            // timeout MUST be re-armed: Spark clears a group's timeout
            // on every invocation, so a duplicate would otherwise make
            // the state immortal. Re-arm from the ORIGINAL first sight
            // (fixed window, duplicates don't slide it).
            state.setTimeoutTimestamp(math.max(
              state.get.firstMs + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          } else {
            // earliest event time in the batch, NOT iterator order (the
            // post-shuffle iterator has no ordering guarantee)
            val first = rows.minBy(_._2.getTime)
            state.update(FirstSeen(first._2.getTime))
            state.setTimeoutTimestamp(math.max(
              first._2.getTime + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator((key, first._2))
          }
      }.toDF("key", "first_ts")
  }

  /** Per-user running state for the custom stateful path. */
  case class UserAgg(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user latest-event state: the event-time watermark of the value. */
  case class UserLatest(user_id: Long, n_events: Long, latest_ts: Long,
      latest_value: Double)

  /** mapGroupsWithState form: one output row per key per trigger — the
    * latest watch position per user (the reference's "most recent state"
    * reads). Exactly-one-row-per-key semantics vs flatMap's zero-or-more.
    *
    * "Latest" is decided by the event timestamp carried in the input
    * (epoch micros), NOT by iterator order — the within-batch iterator
    * after the groupByKey shuffle has no ordering guarantee, so a
    * max-by-timestamp reduce is the only deterministic definition.
    * Ties (same ts) break toward the larger value for determinism. */
  def latestPerUser(events: Dataset[(Long, Long, Double)])(
      implicit spark: SparkSession): Dataset[UserLatest] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[UserLatest, UserLatest](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Double)],
            state: GroupState[UserLatest]) =>
          val prev = state.getOption
            .getOrElse(UserLatest(uid, 0L, Long.MinValue, 0.0))
          var n = prev.n_events
          var ts = prev.latest_ts
          var last = prev.latest_value
          rows.foreach { case (_, t, v) =>
            n += 1
            if (t > ts || (t == ts && v > last)) { ts = t; last = v }
          }
          val next = UserLatest(uid, n, ts, last)
          state.update(next)
          next
      }
  }

  /** Custom stateful aggregation via flatMapGroupsWithState (SURVEY §2.9
    * [NS]): running per-user totals emitted on every update — the shape
    * used when built-in windows can't express the state machine. */
  def statefulTotals(events: Dataset[(Long, Double)])(
      implicit spark: SparkSession): Dataset[UserAgg] = {
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { case (_, v) => n += 1; s += v }
          val next = UserAgg(uid, n, s)
          state.update(next)
          Iterator(next)
      }
  }

  /** Per-(band, key) claim state: event time + id of the first holder. */
  case class BandClaimState(firstMs: Long, firstId: Long)

  /** [NS] — STREAMING first-sight NEAR-dup gate, the ingest shape of a
    * training-data pipeline: each arriving document's 64-bit SimHash
    * splits into the same 4×16-bit band keys as [[graft.operators.Dedup
    * .hammingPairs64]], and every (band, key) keeps first-holder state
    * with [[firstSightDedup]]'s TTL eviction contract (event-time
    * timeout, fixed window from first sight, duplicates re-arm but never
    * slide it). The operator emits one CLAIM row (band, key, id,
    * first_ts) per key per TTL window — a document is ADMITTED iff it
    * claims all four of its bands, which
    * [[admittedClaims]] computes in the batch domain of a foreachBatch
    * (a doc's four band rows always share its micro-batch, so the
    * conjunction never spans triggers; chaining a streaming aggregation
    * after flatMapGroupsWithState is unsupported anyway). Claims are
    * unconditional — a rejected doc still claims its fresh bands — so
    * admission never feeds back into state and the gate equals
    * [[graft.operators.Dedup.nearDupGateBatch]] under event-time-ordered
    * batch boundaries (unique or co-batched timestamps, no eviction
    * inside the window): any doc within Hamming ≤ 3 of an admitted
    * earlier doc shares ≥ 1 band by pigeonhole and is rejected at the
    * cost of ZERO pair comparisons — band-collision false rejects are
    * the documented price of a verification-free ingest gate.
    *
    * State is one (long, long) per live band key — bounded by TTL, not
    * by corpus size; the only exchange is the groupByKey on (band, key).
    * Input: (idCol, textCol, tsCol TIMESTAMP); output claims,
    * append-mode. */
  def bandFirstSight(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, ttlMs: Long)(
      implicit spark: SparkSession): DataFrame = {
    require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")
    import spark.implicits._
    docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.functions.SimHashExpression.simhash64(col(textCol))
          .as("sig"))
      .select(col("id"), col("ts"),
        posexplode(array((0 until 4).map(b =>
          expr(s"shiftrightunsigned(sig, ${48 - 16 * b}) & 65535")): _*))
          .as(Seq("band", "key")))
      .as[(Long, java.sql.Timestamp, Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BandClaimState,
        (Int, Long, Long, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, key), rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
            state: GroupState[BandClaimState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // key already claimed in this TTL window — suppress, re-arm
            // from the ORIGINAL first sight (same rationale as
            // firstSightDedup: Spark clears the timeout per invocation)
            state.setTimeoutTimestamp(math.max(
              state.get.firstMs + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          } else {
            // (event-time, id)-first row of the batch, not iterator order
            val first = rows.minBy(r => (r._2.getTime, r._1))
            state.update(BandClaimState(first._2.getTime, first._1))
            state.setTimeoutTimestamp(math.max(
              first._2.getTime + ttlMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator((band, key, first._1, first._2))
          }
      }.toDF("band", "key", "id", "first_ts")
  }

  /** The admission conjunction over [[bandFirstSight]]'s claims — run
    * inside foreachBatch (batch domain): a doc is admitted iff it holds
    * all 4 of its band claims. Output: (id, ts). */
  def admittedClaims(claims: DataFrame): DataFrame =
    claims.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bands"), min(col("first_ts")).as("ts"))
      .filter(col("n_bands") === 4)
      .select(col("id"), col("ts"))

  /** Per-user gap-monitor state: last event (ts, id) + running gap
    * moments + the first-`cap` DISTINCT gap values seen. The set's
    * CONTENT is arrival-order-dependent, but its SIZE is exactly
    * min(total distinct, cap) under ANY order — which is the only thing
    * emitted, keeping the twin deterministic AND the state bounded
    * (cap longs per user, never per-event). */
  case class GapState(lastTs: Long, lastId: Long, nGaps: Long,
      sumGaps: Long, minGap: Long, gaps: Set[Long])

  case class GapStats(user_id: Long, n_gaps: Long,
      n_distinct_capped: Long, min_gap_us: Long, mean_gap_us: Long,
      regularity_ppm: Long)

  /** [NS] — STREAMING twin of the q246 automation-rate audit via
    * mapGroupsWithState: per-user inter-event-gap regularity maintained
    * live, so scripted traffic is flagged while it is still running
    * instead of in tomorrow's batch. Input rows are (user_id,
    * ts epoch-micros, event_id).
    *
    * Same ordering contract as [[funnelStateful]]: within a micro-batch
    * the user's rows replay in ascending (ts, event_id) order; across
    * batches gaps bridge via the carried (lastTs, lastId), exact under
    * event-time-ordered batch boundaries. Distinct gaps are counted
    * capped (see [[GapState]]) — the batch twin compares against
    * least(count(DISTINCT gap), cap), and the regularity score uses the
    * capped count, so both sides compute the identical number. */
  def gapMonitor(events: Dataset[(Long, Long, Long)], cap: Int = 64)(
      implicit spark: SparkSession): Dataset[GapStats] = {
    import spark.implicits._
    require(cap >= 1, s"distinct cap must be >= 1, got $cap")
    events.groupByKey(_._1)
      .mapGroupsWithState[GapState, GapStats](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[GapState]) =>
          var st = state.getOption.getOrElse(
            GapState(Long.MinValue, 0L, 0L, 0L, Long.MaxValue,
              Set.empty[Long]))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, id) =>
            if (st.lastTs != Long.MinValue) {
              val g = t - st.lastTs
              st = st.copy(nGaps = st.nGaps + 1, sumGaps = st.sumGaps + g,
                minGap = math.min(st.minGap, g),
                gaps = if (st.gaps.size < cap) st.gaps + g else st.gaps)
            }
            st = st.copy(lastTs = t, lastId = id)
          }
          state.update(st)
          val nd = st.gaps.size.toLong
          GapStats(uid, st.nGaps, nd,
            if (st.nGaps > 0) st.minGap else 0L,
            if (st.nGaps > 0) st.sumGaps / st.nGaps else 0L,
            if (st.nGaps > 0) 1000000L * nd / st.nGaps else 0L)
      }
  }
}
