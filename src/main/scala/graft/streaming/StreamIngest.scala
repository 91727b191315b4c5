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
