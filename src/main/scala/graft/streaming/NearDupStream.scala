package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate detection — the MinHash-LSH half of the dedup
  * family applied to a live feed (a crawler re-discovering boilerplate
  * variants minutes apart), where [[StreamIngest.dedupStream]] only drops
  * exact id re-deliveries.
  *
  * Shape: each document fans out to its LSH BAND KEYS (shingle → 64-bit
  * hash → k minhashes → bands of r rows each, same banding algebra as the
  * batch d3 operator); state lives per band key and holds only the FIRST
  * document that presented it. A document is a near-dup candidate iff any
  * of its bands was already claimed — the exact OR-over-bands semantics of
  * batch LSH, restated incrementally. Emission is per (band, doc) verdict;
  * the per-doc reduce (`dup = max over bands`) is a stateless grouped
  * aggregate the caller runs inside its micro-batch sink, where the exact
  * re-rank against the claimed doc would also live (the v5 pattern:
  * candidates from LSH, verdicts from the exact kernel).
  *
  * Scale: state is ONE long per active band key, hash-distributed across
  * executors; the event-time timeout evicts keys older than the dedup
  * horizon, so state is bounded by (active-window docs × bands), not
  * stream length. In-batch ties resolve to (min ts, min doc_id), so
  * verdicts are deterministic under any arrival interleaving within a
  * batch — re-deliveries and restarts cannot flip a winner.
  *
  * The reference has no streaming dedup at all (its only stateful construct
  * is the open-blocks flush map, /root/reference/blockManager.go:54-114);
  * this is north-star extension surface like the rest of §2.2.
  */
object NearDupStream {

  case class Doc(doc_id: Long, ts_us: Long, text: String)
  case class BandRow(band_key: Long, doc_id: Long, ts_us: Long)
  case class BandState(winner_id: Long, ts_us: Long)
  case class BandVerdict(band_key: Long, doc_id: Long, kept_id: Long, dup: Boolean)
  // gram-claim rows carry the occurrence POSITION: the downstream cut
  // needs which token interval [p, p+L) to excise, and the claiming row
  // itself is identified by the full (ts, doc, p) triple
  case class GramState(winner_id: Long, ts_us: Long, p: Long)
  case class GramVerdict(gram_key: Long, doc_id: Long, p: Long,
                         kept_id: Long, dup: Boolean)

  val DefaultShingle = 3   // words per shingle
  val DefaultHashes  = 8   // minhash signature length
  val DefaultBands   = 4   // bands of DefaultHashes/DefaultBands rows

  /** FNV-1a 64-bit over a string — matches the spirit of the batch
    * tier's engine-stable hashing (graft.functions.FnvHash64).
    */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** The band keys of one document: word shingles → FNV hash → k affine
    * re-hashes (h*odd + band-salt) minimized per hash slot → r slots
    * concatenated per band and re-hashed. Pure and deterministic — the
    * same text always claims the same bands, on any executor.
    */
  def bandKeys(text: String, shingle: Int = DefaultShingle,
               numHashes: Int = DefaultHashes, bands: Int = DefaultBands): Array[Long] = {
    // integer division below would silently DROP trailing signature slots
    // for a non-divisible parameterization, weakening the band signature
    // with no signal — refuse loudly instead
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands)")
    val words = text.toLowerCase.split(" ").filter(_.nonEmpty)
    // Empty/whitespace-only documents still get ONE band (the hash of the
    // empty shingle): they are trivially identical content, so they claim
    // one shared slot and all but the first flag dup — and, critically,
    // every doc emits at least one verdict row, so callers reducing
    // per-doc never lose a document from the labeled stream.
    if (words.length == 0) return Array(fnv64(""))
    val shingles =
      if (words.length < shingle) Array(fnv64(words.mkString(" ")))
      else words.sliding(shingle).map(w => fnv64(w.mkString(" "))).toArray
    val rows = numHashes / bands
    val sig = Array.tabulate(numHashes) { k =>
      // affine re-hash per slot: odd multiplier + slot salt, then min
      var mn = Long.MaxValue
      val mult = 0x9e3779b97f4a7c15L + 2L * k
      var i = 0
      while (i < shingles.length) {
        val v = shingles(i) * mult + k
        if (v < mn) mn = v
        i += 1
      }
      mn
    }
    Array.tabulate(bands) { b =>
      var h = 0xcbf29ce484222325L ^ b
      var r = 0
      while (r < rows) { h ^= sig(b * rows + r); h *= 0x100000001b3L; r += 1 }
      h
    }
  }

  /** Splitmix-derived affine minhash constants (precomputed 64-bit
    * wraparound folds of the public golden-ratio constants — the
    * [[graft.ops.Dedup.minhashSig]] convention at indices i+1 / i+7),
    * inlined as LITERALS so the DuckDB oracle can carry the identical
    * values without wraparound arithmetic. a_k is odd and < 2^31; with
    * x < 2^28 and b_k < 2^61, a·x + b < 2^62 — no overflow in either
    * engine's signed-64 arithmetic.
    */
  val MinhashP: Long = 2305843009213693951L // 2^61 - 1
  val MinhashA: Array[Long] =
    Array.tabulate(DefaultHashes)(i => ((0x9E3779B97F4A7C15L * (i + 1)) >>> 33) | 1L)
  val MinhashB: Array[Long] =
    Array.tabulate(DefaultHashes)(i => (0xBF58476D1CE4E5B9L * (i + 7)) >>> 3)

  /** ENGINE-SHARED banding for the batch replay's DuckDB oracle: the same
    * shingle → hash → minhash → band algebra as [[bandKeys]], with the
    * two engine-private steps swapped for primitives both engines compute
    * bit-identically — md5 (28 bits of it) replaces FNV as the shingle
    * hash, and a band is identified by its TUPLE of signature slots
    * (band, s0, s1) instead of a wraparound fold (grouping by the tuple
    * is the same partition as hashing it, without needing 64-bit wrap in
    * SQL). Same degenerate-doc stance as bandKeys: zero words hash the
    * empty shingle, < `shingle` words hash the whole text once.
    */
  def oracleBands(text: String): Seq[(Long, Long, Long)] = {
    val words = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val shingles: Array[String] =
      if (words.length == 0) Array("")
      else if (words.length < DefaultShingle) Array(words.mkString(" "))
      else words.sliding(DefaultShingle).map(_.mkString(" ")).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(DefaultHashes)(Long.MaxValue)
    shingles.foreach { sh =>
      val dg = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 7 hex chars = the digest's top 28 bits, extracted directly
      // (== parseLong(hexString.take(7), 16); the per-byte String.format
      // hex render cost ~1 s per million shingles — the d13 hot loop)
      val x = ((dg(0) & 0xffL) << 20) | ((dg(1) & 0xffL) << 12) |
        ((dg(2) & 0xffL) << 4) | ((dg(3) & 0xffL) >>> 4)
      var k = 0
      while (k < DefaultHashes) {
        val h = Math.floorMod(MinhashA(k) * x + MinhashB(k), MinhashP)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    val rows = DefaultHashes / DefaultBands
    (0 until DefaultBands).map(b => (b.toLong, sig(b * rows), sig(b * rows + 1)))
  }

  /** [[bandKeys]] in the triple shape [[batchReplay]] takes, so the spec
    * can drive the stream and the replay through the SAME band function.
    * The band index is NOT part of the triple — the stream groups by the
    * folded key alone (the band salt is already folded in), and the
    * replay must group by exactly the same partition.
    */
  def fnvBandTriples(text: String, shingle: Int = DefaultShingle,
                     numHashes: Int = DefaultHashes,
                     bands: Int = DefaultBands): Seq[(Long, Long, Long)] =
    bandKeys(text, shingle, numHashes, bands).toSeq.map(k => (0L, k, 0L))

  /** BATCH REPLAY of the stream's band-claim decision table: per band,
    * the winner is the first claimant in (ts, doc_id) order — exactly
    * [[updateRows]]' semantics for a ts-ORDERED arrival inside the dedup
    * horizon — and every (band, doc) pair gets the stream's verdict row.
    * SCOPE OF THE EQUIVALENCE: an out-of-order arrival (an earlier-ts doc
    * landing in a LATER batch, within the watermark) keeps the stream's
    * already-live claim — append mode cannot retract emitted verdicts —
    * while the replay crowns the globally earliest (ts, doc_id). Online
    * dedup decisions are inherently arrival-dependent in that case; the
    * replay certifies the canonical-order decision table, which is also
    * what a backfill over historical (sorted) data produces.
    * Two relational operators (a band-keyed window, a comparison), so the
    * decision table is SQL-expressible and the d13 registry entry
    * hash-checks it against DuckDB; StreamingSpec pins stream ≡ replay
    * over the identical (fnv) band function. One band-keyed shuffle, no
    * state — the replay is how a backfill over historical data runs the
    * same dedup the live stream applies going forward.
    */
  def batchReplay(spark: SparkSession, docs: Dataset[Doc],
                  bandsOf: String => Seq[(Long, Long, Long)])
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, first}
    val rows = docs.flatMap(d => bandsOf(d.text).map { case (b, s0, s1) =>
      (b, s0, s1, d.doc_id, d.ts_us)
    }).toDF("band", "s0", "s1", "doc_id", "ts_us")
    val w = Window.partitionBy(col("band"), col("s0"), col("s1"))
      .orderBy(col("ts_us"), col("doc_id"))
    rows.withColumn("kept_id", first(col("doc_id")).over(w))
      .withColumn("dup", col("doc_id") =!= col("kept_id"))
  }

  private def update(bandKey: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
                     state: GroupState[BandState]): Iterator[BandVerdict] =
    updateRows(bandKey, rows.map(r => BandRow(r._1, r._2, r._3)), state)

  private def updateRows(bandKey: Long, rows: Iterator[BandRow],
                     state: GroupState[BandState]): Iterator[BandVerdict] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // deterministic in-batch winner: (ts, doc_id) order
      val batch = rows.toSeq.sortBy(r => (r.ts_us, r.doc_id))
      if (batch.isEmpty) Iterator.empty
      else {
        // The timeout callback only fires for groups with NO data in the
        // batch, so a band re-seen just past the horizon would still meet
        // its stale claim — enforce the horizon here too: a claim the
        // watermark has passed is dead even if the eviction hasn't run.
        val wm = state.getCurrentWatermarkMs()
        val live = state.getOption.filter(st => st.ts_us / 1000 + 1 > wm)
        val winner = live.getOrElse(BandState(batch.head.doc_id, batch.head.ts_us))
        if (live.isEmpty) state.update(winner)
        // horizon: evict the claim when the watermark passes its ts (ms)
        state.setTimeoutTimestamp(math.max(winner.ts_us / 1000 + 1, wm + 1))
        batch.iterator.map(r =>
          BandVerdict(bandKey, r.doc_id, winner.winner_id,
            dup = r.doc_id != winner.winner_id))
      }
    }
  }

  /** Wire the stateful band claims onto a typed document stream. The
    * caller reduces per doc (`max(dup) over its bands`) in its sink.
    *
    * The event-time column is attached AFTER the band fan-out (the
    * streaming checker requires a watermarked attribute to be present in
    * the stateful operator's input, so it must survive the flatMap).
    */
  def bandVerdicts(spark: SparkSession, docs: Dataset[Doc],
                   delay: String = "10 minutes",
                   shingle: Int = DefaultShingle,
                   numHashes: Int = DefaultHashes,
                   bands: Int = DefaultBands): Dataset[BandVerdict] =
    keyVerdicts(spark, docs, delay,
      t => bandKeys(t, shingle, numHashes, bands))

  /** The claim machinery with a pluggable key function — one key set per
    * document, one first-claimant state cell per key. [[bandVerdicts]]
    * plugs the LSH banding in; [[exactVerdicts]] plugs a single
    * content-digest key in (streaming EXACT dedup). Same state bound,
    * same horizon semantics, same deterministic in-batch (ts, id) winner.
    */
  def keyVerdicts(spark: SparkSession, docs: Dataset[Doc],
                  delay: String, keysOf: String => Array[Long]): Dataset[BandVerdict] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    docs
      .flatMap(d => keysOf(d.text).map(k => BandRow(k, d.doc_id, d.ts_us)))
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update)
  }

  /** Streaming ExactSubstr — d15's cut pass as an incremental operator
    * (the d12/d16 claim-index pattern at GRAM grain): every arriving
    * document fans out to its L-gram occurrences, each gram's FIRST
    * presenter in (ts, doc_id, p) order claims it, and every later
    * occurrence emits a dup verdict whose [p, p+L) interval the caller's
    * micro-batch sink merges and cuts (the d15 span-union + two-pointer
    * kernel, doc-local). The first document through stays intact —
    * append-mode streams cannot retro-cut emitted text — which is the
    * production shape for incremental ingestion: new crawl text is
    * cleaned against everything already admitted. Re-delivery of the
    * claiming row itself compares equal on the full triple and stays
    * non-dup (idempotent reprocessing).
    *
    * Scale: state is one (winner, ts, p) cell per LIVE gram key,
    * hash-partitioned, event-time evicted at the horizon — bounded by
    * the dedup window's token count, not stream length. Keys are the
    * 64-bit xxhash64 of the gram (8-byte shuffle rows, the d14
    * discipline); `d17_stream_substr_replay` hash-checks the same
    * keep-first decision geometry via an engine-shared md5 keying
    * (strictly finer at 128 bits; both coarsenings carry the d7
    * birthday-bound argument).
    */
  def gramVerdicts(spark: SparkSession, docs: Dataset[Doc],
                   delay: String = "10 minutes",
                   gramLen: Int = graft.ops.Dedup.SubstrL): Dataset[GramVerdict] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    docs
      .flatMap(d => graft.ops.Dedup.gramPosHashSeq(d.text, gramLen)
        .iterator.zipWithIndex
        .map { case (h, p) => (h, d.doc_id, d.ts_us, p.toLong) })
      .withColumn("ts", timestamp_micros(col("_3")))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .withWatermark("ts", delay)
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        gramUpdate)
  }

  private def gramUpdate(gramKey: Long,
                         rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
                         state: GroupState[GramState]): Iterator[GramVerdict] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      // deterministic in-batch winner: (ts, doc_id, p) order
      val batch = rows.map(r => (r._2, r._3, r._4)).toSeq.sortBy(identity)
      if (batch.isEmpty) Iterator.empty
      else {
        // same dead-claim guard as updateRows: a claim the watermark has
        // passed is void even if its eviction callback hasn't fired yet
        val wm = state.getCurrentWatermarkMs()
        val live = state.getOption.filter(st => st.ts_us / 1000 + 1 > wm)
        val winner = live.getOrElse(
          GramState(batch.head._1, batch.head._2, batch.head._3))
        if (live.isEmpty) state.update(winner)
        state.setTimeoutTimestamp(math.max(winner.ts_us / 1000 + 1, wm + 1))
        batch.iterator.map { case (id, ts, p) =>
          GramVerdict(gramKey, id, p, winner.winner_id,
            dup = !(id == winner.winner_id && ts == winner.ts_us && p == winner.p))
        }
      }
    }
  }

  /** One 64-bit content key per document: the md5 digest's top 8 bytes.
    * md5 (not FNV) so the BATCH replay of the decision table is
    * engine-shared — DuckDB's md5 is bit-identical, which is what lets
    * `d16_stream_dedup_replay` hash-check the claim semantics end to end
    * (the d13 discipline; FNV/xxhash are not replayable in SQL).
    * The fold is strictly COARSER than the full 128-bit digest the
    * replay keys on: a 64-bit collision would make the live operator
    * flag a false dup the oracle cannot see. That is a birthday-bound
    * risk (~2^32 distinct live contents before even-odds of one
    * collision anywhere — the d7 argument), accepted for the one-long
    * state cell; key on both digest halves if the dedup window can hold
    * billions of distinct documents.
    */
  def exactKey(text: String): Long = {
    val dg = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
    h
  }

  /** Streaming EXACT dedup — the steady-state form of d1/d12 on a live
    * feed: the first arrival of each content claims it (deterministic
    * (ts, doc_id) winner within a batch), later re-deliveries flag
    * `dup = true` with the keeper's id, and the event-time horizon
    * evicts claims the watermark has passed so state is bounded by the
    * dedup window, not stream length. State: ONE cell per distinct live
    * content — at 100 TB ingest this is the md5-key table of d12's
    * index, kept hot and hash-partitioned instead of re-scanned.
    */
  def exactVerdicts(spark: SparkSession, docs: Dataset[Doc],
                    delay: String = "10 minutes"): Dataset[BandVerdict] =
    keyVerdicts(spark, docs, delay, t => Array(exactKey(t)))
}
