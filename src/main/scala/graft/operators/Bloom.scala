package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [NS] Bloom-filter membership gate — the shuffle-free archive probe.
  *
  * The reference's skip-if-archived probe (`cmds/archive.py:126-129`)
  * asks "is this key already in the archive?" per incoming row. At
  * 100 TB the archive side of that probe is billions of keys; joining
  * every batch against it shuffles the batch every time. The Bloom
  * shape fixes the constant: fold the archive's keys ONCE into an
  * m-bit filter ([[graft.functions.BloomFilterAggregator]] — mergeable,
  * so the build is map-side partial aggregation and only mBits/8 bytes
  * per partition cross the wire), broadcast the single-row bitmap, and
  * gate each batch row with per-row bit arithmetic: no shuffle, no join.
  * "Definitely absent" rows (any unset bit) skip the exact probe
  * entirely; only the "maybe present" residue — a false-positive-rate
  * sliver of the batch — reaches the real (expensive) membership join.
  * False positives cost extra work, never wrong answers.
  *
  * Positions are md5-derived (the [[Curation.hashBucket]] convention),
  * so the DuckDB oracle reproduces the exact bit placement: position j
  * of key s is `CAST('0x'||substr(md5(s), 1+8j, 8) AS BIGINT) % mBits`.
  * Everything below is built-in codegen'd expressions — no UDF in the
  * probe path; the only non-builtin piece is the build-side Aggregator.
  *
  * Sizing at scale: ~10 bits/key gives ~1% false positives with k=3;
  * 10^9 archive keys → a 1.2 GB bitmap, at the edge of broadcast. Past
  * that, shard the filter by key-hash prefix into B independent filters
  * and probe the matching shard (same math, B-row build output).
  */
object Bloom {

  /** The k bit positions of a key: independent 32-bit slices of the
    * key's md5, reduced mod mBits. k ≤ 4 keeps every slice inside one
    * 128-bit digest (32 hex chars); positions are engine-portable and
    * per-row codegen'd. */
  def positions(key: Column, mBits: Int, k: Int): Column = {
    require(k >= 1 && k <= 4, s"k must be 1..4 (md5 yields four 32-bit slices), got $k")
    array((0 until k).map { j =>
      conv(substring(md5(key.cast("string")), 1 + 8 * j, 8), 16, 10)
        .cast("long") % mBits
    }: _*)
  }

  /** Build the filter over `keys(keyCol)`: one row, one `bloom` column
    * (Array[Long] bit words). Map-side partial aggregation; duplicate
    * keys are harmless (idempotent ORs). */
  def build(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    val agg = udaf(graft.functions.BloomFilterAggregator(mBits))
    keys.select(positions(col(keyCol), mBits, k).as("_pos"))
      .agg(agg(col("_pos")).as("bloom"))
  }

  /** Membership verdict for a positions column against a bit-words
    * column: true iff every position's bit is set (the Bloom "maybe");
    * any clear bit proves absence. Variable-amount shifts need the SQL
    * form of shiftright (the Scala wrapper only takes literal shifts),
    * hence the expr — still built-in, still codegen'd. */
  def mightContain(bloomCol: String, posCol: String): Column =
    expr(s"""forall($posCol, p ->
      (shiftright(element_at($bloomCol, cast(shiftright(p, 6) as int) + 1),
                  cast(p & 63 as int)) & 1) = 1)""")

  /** Gate a batch's rows against an archive key set: returns the batch
    * with `maybe_present` (Bloom verdict, shuffle-free) and `confirmed`
    * (exact membership, computed by joining ONLY the maybe rows against
    * the archive keys — the filter prunes the join's probe side).
    * `confirmed` ⇒ `maybe_present`; a false positive is maybe ∧ ¬confirmed. */
  def gate(batch: DataFrame, archiveKeys: DataFrame, batchKey: String,
      archiveKey: String, mBits: Int, k: Int): DataFrame = {
    val bloom = build(archiveKeys, archiveKey, mBits, k)
    val flagged = batch
      .withColumn("_pos", positions(col(batchKey), mBits, k))
      .crossJoin(broadcast(bloom))
      .withColumn("maybe_present", mightContain("bloom", "_pos"))
      .drop("_pos", "bloom")
    val confirmedKeys = flagged.filter(col("maybe_present"))
      .select(col(batchKey))
      .join(archiveKeys.select(col(archiveKey).as(batchKey)).distinct(),
        Seq(batchKey), "left_semi")
      .distinct()
      .withColumn("confirmed", lit(true))
    flagged.join(confirmedKeys, Seq(batchKey), "left")
      .withColumn("confirmed", coalesce(col("confirmed"), lit(false)))
  }

  /** [NS] — Bloom PARAMETER advisor: for a (mBits, k) configuration,
    * the filter's measured fill ratio, the classic fill^k
    * false-positive estimate, and the ACTUAL false-positive rate
    * against a probe key set — estimated vs measured on the same row,
    * the number that decides "is 8192 bits enough for this archive"
    * before anyone ships the gate. Fully relational (no bitmap
    * aggregator): because bit placement is deterministic md5
    * arithmetic, the set bits ARE the distinct positions of the
    * archive keys, and a probe key is a Bloom "maybe" iff its distinct
    * positions all land in that set — one explode + two semi-join
    * aggregates, oracle-replayable bit for bit. fp_est uses integer
    * powers (ones^k·10⁶ div m^k) computed in decimal(38,0) — a long
    * numerator wraps silently past ones_bits ≈ 21000 at k = 3, so the
    * product is widened before the integer division (decimal-safe for
    * k ≤ 3 at m ≤ 2^17: 10⁶·(2^17)³ ≈ 2.3e21 ≪ 10^38);
    * fp_measured = false positives over NON-member probes. */
  def advisor(archiveKeys: DataFrame, probeKeys: DataFrame,
      archiveKey: String, probeKey: String, mBits: Int,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 3, s"advisor supports k <= 3, got $k")
    require(BigInt(1000000) * BigInt(mBits).pow(k) < BigInt(10).pow(38),
      s"fp_est_ppm numerator must fit decimal(38,0): mBits=$mBits k=$k")
    val aks = archiveKeys.select(col(archiveKey).cast("string").as("_ak"))
      .distinct()
    val ones = aks
      .select(explode(positions(col("_ak"), mBits, k)).as("p"))
      .distinct()
    val pks = probeKeys.select(col(probeKey).cast("string").as("_pk"))
      .distinct()
    val pPos = pks.select(col("_pk"),
        explode(positions(col("_pk"), mBits, k)).as("p"))
      .distinct()
    val tot = pPos.groupBy(col("_pk")).agg(count(lit(1)).as("_nt"))
    val hit = pPos.join(ones, Seq("p"), "left_semi")
      .groupBy(col("_pk")).agg(count(lit(1)).as("_nh"))
    val member = pks.join(aks.select(col("_ak").as("_pk")),
        Seq("_pk"), "left_semi")
      .withColumn("_mem", lit(true))
    val verdicts = tot.join(hit, Seq("_pk"), "left")
      .withColumn("maybe", coalesce(col("_nh"), lit(0L)) === col("_nt"))
      .join(member, Seq("_pk"), "left")
      .withColumn("mem", coalesce(col("_mem"), lit(false)))
    val onesN = ones.agg(count(lit(1)).as("ones_bits"))
    val aN = aks.agg(count(lit(1)).as("n_keys"))
    val probeAgg = verdicts.agg(
      sum(when(!col("mem"), 1L).otherwise(0L)).as("n_nonmember"),
      sum(when(col("maybe") && !col("mem"), 1L).otherwise(0L)).as("n_fp"))
    aN.crossJoin(onesN).crossJoin(probeAgg)
      .select(lit(mBits.toLong).as("m_bits"), lit(k.toLong).as("k_hashes"),
        col("n_keys"), col("ones_bits"),
        expr(s"(1000000 * ones_bits) div $mBits").as("fill_ppm"),
        expr(s"(cast(1000000 as decimal(38,0)) * ${(0 until k)
          .map(_ => "ones_bits").mkString(" * ")}) div cast(${BigInt(mBits)
          .pow(k)} as decimal(38,0))").as("fp_est_ppm"),
        col("n_nonmember"), col("n_fp"),
        expr("case when n_nonmember > 0 then " +
          "(1000000 * n_fp) div n_nonmember end").as("fp_measured_ppm"))
  }

  /** The near-dup composition: gate batch DOCS against the archive's
    * MinHash band keys. A batch doc is `maybe_near` iff ANY of its band
    * keys passes the Bloom filter, `confirmed` iff a passing key
    * actually exists in the archive band table (the [[Dedup
    * .dedupIncremental]] layer-3 probe, here pruned by the filter so
    * definitely-novel docs never enter the band join). Docs too short
    * to shingle have no band keys → (false, false). */
  def gateNearDups(archive: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, mBits: Int, bloomK: Int, shingleN: Int = 3,
      k: Int = 8, bands: Int = 4): DataFrame = {
    val rows = k / bands
    val keyCols = "band" +: (0 until rows).map(r => s"v$r")
    def bandKey: Column =
      concat_ws(":", keyCols.map(c => col(c).cast("string")): _*)
    val aKeys = Dedup.bandTable(archive, idCol, textCol, shingleN, k, bands)
      .select(bandKey.as("_bk")).distinct()
    val iBands = Dedup.bandTable(batch, idCol, textCol, shingleN, k, bands)
      .withColumn("_bk", bandKey)
    val gated = gate(iBands, aKeys, "_bk", "_bk", mBits, bloomK)
    val perDoc = gated.groupBy(col(idCol)).agg(
      max(col("maybe_present")).as("maybe_near"),
      max(col("confirmed")).as("confirmed"))
    batch.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("maybe_near", coalesce(col("maybe_near"), lit(false)))
      .withColumn("confirmed", coalesce(col("confirmed"), lit(false)))
  }
}
