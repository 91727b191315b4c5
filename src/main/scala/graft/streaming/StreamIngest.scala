package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ingest.BlockWriter

/** Streaming ingestion — the reference's core lifecycle (SURVEY.md §3.1:
  * StreamAdapter → BlockManager → StorageAdapter) as one Structured
  * Streaming sink.
  *
  * Mapping of the reference's flush machinery
  * (/root/reference/blockManager.go:29-114):
  *  - per-partition-key grouping  → partitionBy(bucket) layout (same
  *    bucketed scheme as the batch BlockWriter, so RangeQuery reads both);
  *  - MaxSize row cap (8192)      → maxRecordsPerFile;
  *  - MaxAge flush + 1 s ticker   → Trigger.ProcessingTime(maxAgeMs):
  *    every open "block" (micro-batch buffer) is committed at least every
  *    maxAgeMs — the same bound the ticker enforces;
  *  - at-least-once retry loop → exactly-once file-sink commit protocol
  *    (checkpointed offsets + transactional file manifest), strictly
  *    stronger than the reference's content-hash idempotency (§1.2).
  *
  * Scale: the sink parallelizes per input partition; bucket count bounds
  * file fan-out per micro-batch (numBuckets files/batch worst case, vs the
  * reference's one-dir-per-user small-files explosion).
  */
object StreamIngest {

  def start(stream: DataFrame, base: String, checkpoint: String,
            partitionCol: String, keyCol: String,
            numBuckets: Int = BlockWriter.DefaultBuckets,
            maxRecordsPerFile: Long = BlockWriter.DefaultMaxRecordsPerFile,
            maxAgeMs: Long = 1000L): StreamingQuery =
    stream
      .withColumn("bucket", BlockWriter.bucketCol(partitionCol, numBuckets))
      .writeStream
      .format("parquet")
      .option("path", base)
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .trigger(Trigger.ProcessingTime(maxAgeMs))
      .outputMode("append")
      .start()

  /** One-shot backfill/catch-up of the SAME sink as [[start]]: process
    * everything currently available, then stop. `Trigger.AvailableNow`
    * (not the deprecated `Trigger.Once`) carves the backlog into
    * rate-limited micro-batches, so a month of parked input replays as
    * bounded batches instead of one giant one — the only shape that
    * survives a 100 TB catch-up. Shares the checkpoint contract with the
    * live stream: a drain after a crash resumes from committed offsets,
    * and a drain with nothing new commits nothing (exactly-once).
    */
  def drain(stream: DataFrame, base: String, checkpoint: String,
            partitionCol: String, keyCol: String,
            numBuckets: Int = BlockWriter.DefaultBuckets,
            maxRecordsPerFile: Long = BlockWriter.DefaultMaxRecordsPerFile): StreamingQuery =
    stream
      .withColumn("bucket", BlockWriter.bucketCol(partitionCol, numBuckets))
      .writeStream
      .format("parquet")
      .option("path", base)
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("bucket")
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()

  /** Stream-stream inner join: each left event pairs with right events for
    * the same key within `within` after it. Both sides watermarked so the
    * join state is bounded — the condition gives Spark the range it needs
    * to evict buffered rows (unbounded state is the failure mode of naive
    * stream joins at scale).
    */
  def streamJoin(left: DataFrame, leftKey: String, leftTs: String,
                 right: DataFrame, rightKey: String, rightTs: String,
                 delay: String, within: String): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay),
        col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"))

  /** Stream-stream LEFT OUTER join with the same bounded-state contract as
    * [[streamJoin]]: unmatched left events are emitted null-padded once the
    * watermark proves no matching right event can still arrive. The
    * time-range condition is what makes the outer side decidable — without
    * it Spark cannot know when to give up on a left row and the query is
    * rejected. (The reference has no join surface at all; this is the
    * streaming form of j8_outer_join.)
    */
  def streamJoinLeftOuter(left: DataFrame, leftKey: String, leftTs: String,
                          right: DataFrame, rightKey: String, rightTs: String,
                          delay: String, within: String): DataFrame =
    left.withWatermark(leftTs, delay)
      .join(right.withWatermark(rightTs, delay),
        col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"),
        "left_outer")

  /** Streaming exact dedup: drop re-deliveries of the same id arriving
    * within the watermark delay. State holds one entry per id and is
    * evicted as the watermark passes — the bounded-state streaming form of
    * the batch d1_exact_dedup (at 100 TB/day the delay bound is what keeps
    * dedup state from growing without limit).
    */
  def dedupStream(events: DataFrame, idCol: String, tsCol: String,
                  delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream → snapshot table → incrementally-maintained materialized
    * view, one micro-batch at a time: each batch appends to the
    * [[graft.ingest.Snapshots]] table at `srcBase` and then brings the
    * count/sum view at `mvBase` up to date through
    * [[graft.ingest.MatView.refresh]] — the serving layer a streaming
    * aggregation pipeline actually exposes, kept fresh at file-diff cost.
    *
    * Exactly-once across foreachBatch's at-least-once re-deliveries: the
    * batch id rides the source commit's manifest mode tag, and a
    * re-delivered batch whose tag already heads the lineage is skipped
    * whole. A crash BETWEEN the commit and the refresh needs no special
    * case — the next refresh consumes both deltas (the MV watermark is
    * versions-based, not batch-based).
    */
  def commitStreamWithView(updates: DataFrame, srcBase: String, mvBase: String,
                           checkpoint: String, keyCols: Seq[String],
                           valCol: String,
                           maxAgeMs: Long = 1000L,
                           distinctCol: String = null): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(maxAgeMs))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatchWithView(batch, id, srcBase, mvBase, keyCols, valCol,
          distinctCol)
      }
      .start()

  /** The foreachBatch body of [[commitStreamWithView]], visible so the
    * re-delivery and crash-window behaviors are directly testable.
    */
  def commitBatchWithView(batch: DataFrame, batchId: Long, srcBase: String,
                          mvBase: String, keyCols: Seq[String],
                          valCol: String, distinctCol: String = null): Unit = {
    import graft.ingest.{MatView, Snapshots}
    val tag = s"append:b$batchId"
    // Re-delivery detection must survive interleaved foreign commits: if a
    // maintenance writer (compact, a manual Snapshots.commit, a DV delete)
    // lands on srcBase between the original delivery and a re-delivery,
    // the batch tag is no longer the HEAD version. Walk newest→oldest to
    // the most recent append:b* commit — foreachBatch re-delivers only the
    // last uncommitted batch, so the newest batch tag is either this
    // batch's (re-delivery → skip) or the previous batch's (fresh). The
    // walk is previous-batch-bounded, not history-length-bounded.
    val delivered = Snapshots.versions(srcBase).sorted.reverse.iterator
      .map(v => Snapshots.modeOf(srcBase, v))
      .collectFirst { case m if m.startsWith("append:b") => m }
      .contains(tag)
    if (!delivered && !batch.isEmpty)
      Snapshots.commit(batch.sparkSession, batch, srcBase, mode = tag)
    if (Snapshots.versions(srcBase).nonEmpty)
      MatView.refresh(batch.sparkSession, mvBase, srcBase, keyCols, valCol,
        distinctCol = distinctCol)
    ()
  }

  /** Streaming MERGE: maintain a keyed latest-state [[graft.ingest.
    * Snapshots]] table under `base` from an update stream — the streaming
    * complement of the batch `mrg1_upsert` operator, and the write
    * pattern the reference's append-only block store cannot express.
    * State lives in the table, not executor memory; per-batch cost is a
    * batch-vs-keys join plus a batch-sized write (see [[upsertBatch]]).
    * The table is a full citizen of the snapshot layer: time travel shows
    * the state as of any batch, and [[graft.ingest.MatView.refresh]]
    * maintains aggregates over it incrementally (the merge's removed rows
    * subtract through `Snapshots.removedRows`).
    */
  def upsertStream(updates: DataFrame, base: String, checkpoint: String,
                   keyCol: String, tsCol: String,
                   maxAgeMs: Long = 1000L): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(maxAgeMs))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatch(batch, id, base, keyCol, tsCol)
      }
      .start()

  /** The foreachBatch body of [[upsertStream]] — a [[graft.ingest.
    * Snapshots.merge]] per micro-batch against a real snapshot table.
    * Until round 7 this path rewrote the whole snapshot per batch behind
    * a dir-swap; merge-on-read replaces that with a DV-delete of matched
    * keys plus a batch-sized append, published atomically — per-batch
    * write cost drops from table-sized to batch-sized, and the table
    * gains time travel, tags, and MV refresh for free.
    *
    * Cross-batch ordering: a row only upserts when its ts is >= the ts
    * currently stored for its key, so a late or re-delivered update from
    * an earlier micro-batch cannot regress state. Exactly-once across
    * foreachBatch re-deliveries: the batch id tags the commit mode, and a
    * re-delivered batch whose tag already appears at the newest
    * batch-tagged commit skips whole (same walk as
    * [[commitBatchWithView]] — robust to interleaved foreign commits).
    */
  def upsertBatch(batch: DataFrame, batchId: Long, base: String,
                  keyCol: String, tsCol: String): Unit = {
    import graft.ingest.Snapshots
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    // Batch-internal re-deliveries collapse to the latest row per key
    // first (deterministic: ties on ts broken by the later row losing —
    // row_number, not rank).
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).desc)
    val latest = batch
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    if (latest.isEmpty) return
    val appendTag = s"append:b$batchId"
    val mergeTag = s"merge:b$batchId"
    val delivered = Snapshots.versions(base).sorted.reverse.iterator
      .map(v => Snapshots.modeOf(base, v))
      .collectFirst { case m if m.startsWith("append:b") || m.startsWith("merge:b") => m }
      .exists(m => m == appendTag || m == mergeTag)
    if (delivered) return
    if (Snapshots.versions(base).isEmpty) {
      Snapshots.commit(spark, latest, base, mode = appendTag, sortCols = Seq(keyCol),
        applyGenerators = false) // upsert swap carries complete rows
      ()
    } else {
      // Stale-ts guard: rows older than the stored state for their key
      // drop BEFORE the merge (merge itself takes source rows whole).
      // One key-projected target scan — batch-vs-keys sized, the same
      // class as the merge's own semi join.
      val cur = Snapshots.read(spark, base)
        .select(col(keyCol).as("_cur_k"), col(tsCol).as("_cur_ts"))
      val fresh = latest.join(cur, latest(keyCol) === col("_cur_k"), "left")
        .filter(col("_cur_k").isNull || col(tsCol) >= col("_cur_ts"))
        .drop("_cur_k", "_cur_ts")
      if (!fresh.isEmpty) {
        Snapshots.merge(spark, base, fresh, Seq(keyCol), modeTag = s"b$batchId")
        ()
      }
    }
  }

  /** Table→table replication INCLUDING deletes — the consumption side of
    * the change feed (`readChangeFeed`): each micro-batch carries the
    * source's per-commit insert AND delete rows, and [[replicateBatch]]
    * replays them commit by commit into the destination. The append-only
    * replication the plain graft stream gives (ConnectorSpec's
    * graft→graft case) cannot propagate a DV/equality delete; this can —
    * a downstream mirror tracks upserts and deletes at batch-sized cost.
    */
  def replicateStream(spark: org.apache.spark.sql.SparkSession,
                      srcBase: String, dstBase: String,
                      checkpoint: String,
                      keyCols: Seq[String] = Nil): StreamingQuery =
    spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(srcBase)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        replicateBatch(batch, dstBase, keyCols)
      }
      .start()

  /** Apply one CDC micro-batch to `dstBase`: group rows by source
    * `_commit_version` ascending and replay each as ONE atomic
    * [[graft.ingest.Snapshots.applyDelta]] commit (equality-delete the
    * delete half's keys — zero target IO — and append the insert half),
    * tagged `merge-eq:r<srcVersion>`. Exactly-once across foreachBatch
    * re-deliveries and mid-batch crashes: the highest applied source
    * version is recovered from the newest `:r<N>` tag in the
    * destination's commit modes (robust to interleaved foreign
    * commits), and already-applied source commits skip whole. A source
    * merge's update pair (delete old + insert new of the same key)
    * therefore lands atomically at the destination too.
    *
    * The feed carries whole deleted rows, so replication needs no
    * side-channel key agreement: with `keyCols` empty, a delete removes
    * rows matching the FULL column tuple; naming `keyCols` explicitly
    * deletes by that identity instead — equivalent on a key-unique table
    * and cheaper when keys are a small projection.
    *
    * NULL precondition: equality deletes use SQL `=` semantics, so a
    * delete tuple with a NULL component can never match — applyDelta
    * drops such tuples, and a mirror that silently dropped a real
    * source delete would diverge without any error. replicateBatch
    * therefore REFUSES a batch containing NULL-bearing delete
    * identities: pass `keyCols` naming NOT-NULL identity columns (the
    * table's key), which is also the only identity under which "delete
    * by tuple" is well-defined for NULL-bearing rows.
    */
  def replicateBatch(batch: DataFrame, dstBase: String,
                     keyCols: Seq[String] = Nil): Unit = {
    import graft.ingest.Snapshots
    val spark = batch.sparkSession
    val Marker = ".*:r(\\d+)$".r
    // One metadata walk per batch, not per contained version: the newest
    // :rN marker bounds what is already applied; versions applied in
    // this loop advance the bound locally.
    def appliedThrough: Long =
      Snapshots.versions(dstBase).sorted.reverse.iterator
        .map(v => Snapshots.modeOf(dstBase, v))
        .collectFirst { case Marker(n) => n.toLong }.getOrElse(0L)
    val cdcCols = Seq("_change_type", "_commit_version", "_commit_ts")
    val dataCols = batch.columns.filterNot(cdcCols.contains).toSeq
    val keys = if (keyCols.nonEmpty) keyCols else dataCols
    val versions = batch.select(col("_commit_version")).distinct()
      .collect().map(_.getLong(0)).sorted
    if (versions.isEmpty) return
    // The batch frame re-evaluates per version below; localCheckpoint
    // once so the (possibly expensive) feed plan runs a single time.
    val mat = batch.localCheckpoint(true)
    val dstExists = Snapshots.versions(dstBase).nonEmpty
    var applied = if (dstExists) appliedThrough else 0L
    for (v <- versions) {
      val done = dstExists && applied >= v
      if (!done) {
        val slice = mat.filter(col("_commit_version") === v)
        val inserts = slice.filter(col("_change_type") === "insert")
          .select(dataCols.map(col): _*)
        val deletes = slice.filter(col("_change_type") === "delete")
          .select(keys.map(col): _*)
        // A NULL component in a delete identity can never equality-match:
        // applyDelta would drop the tuple and the mirror would silently
        // diverge from the source. Fail loudly with the fix in hand.
        if (!deletes.filter(keys.map(col(_).isNull).reduce(_ || _)).isEmpty)
          throw new IllegalStateException(
            s"source v$v deletes row(s) with NULL in the delete identity " +
              s"(${keys.mkString(", ")}) - equality deletes cannot match " +
              "NULL; call replicateBatch/replicateStream with keyCols " +
              "naming NOT-NULL identity columns of the table")
        if (Snapshots.versions(dstBase).isEmpty)
          // first ever commit CREATES the destination (no deletes can
          // precede existence in a well-formed feed)
          Snapshots.commit(spark, inserts, dstBase, mode = s"append:r$v",
            applyGenerators = false) // replication carries complete rows
        else
          Snapshots.applyDelta(spark, dstBase,
            deleteKeys = Some(deletes), inserts = Some(inserts),
            modeTag = s"r$v")
        applied = v
      }
    }
  }

  /** Event-time tumbling-window counts with a watermark — the late-data
    * policy the reference lacks (SURVEY.md §2.2: late rows there just open
    * a new block; here they merge into their true event-time window until
    * the watermark closes it).
    */
  def windowedCounts(events: DataFrame, tsCol: String, delay: String,
                     window_ : String): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
}
