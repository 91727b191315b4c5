package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.Filter
import graft.ingest.{FileStats, Snapshots}

/** Runtime file pruning for joins against snapshot tables — the
  * Iceberg-style "dynamic file filtering" idea (and the join-time
  * generalization of the reference's scatter-gather block skipping,
  * /root/reference/filesystemStorageAdapter.go:128-163: consult the
  * key-range index, read only blocks that can match).
  *
  * A star join at 100 TB reads the whole fact table even when the dim
  * side's filter admits a handful of join keys, because static planning
  * cannot see the dim VALUES. This operator runs the build side first —
  * one dimension-sized job collecting the distinct join keys (bounded)
  * or just their min/max (unbounded) — and turns them into data-source
  * filters that [[Snapshots.scanPinned]] checks against each fact file's
  * commit-time footer stats. Fact files that provably contain none of
  * the dim keys never reach Spark's scan: on a fact table clustered on
  * the join key (range-partitioned ingest, [[Snapshots.compact]] sorted /
  * z-ordered layouts), a selective dim prunes a 10⁵-file scan to the
  * handful of files actually joined, at PLANNING time — no tasks, no
  * listing, no IO for the rest.
  *
  * Why not Spark's own runtime filtering: dynamic partition pruning and
  * `SupportsRuntimeV2Filtering` both require the V2 `Batch` scan path,
  * which would mean re-implementing the Parquet reader (losing the
  * vectorized, codegen'd scan the connector's V1 fallback keeps), and
  * the built-in runtime BLOOM filter (`InjectRuntimeFilter`) filters
  * ROWS after the scan, not files before it. Running the build side
  * eagerly costs one small extra job and buys file-level skipping with
  * the fast scan intact — at fact-table scale that is the right trade.
  *
  * Correctness never depends on the pruning: [[FileStats.prune]] is
  * conservative (stat-less files survive, untranslatable values survive),
  * and the actual equi-join still evaluates the full condition on every
  * surviving row. Pruning the FACT side is only sound for join types
  * that keep fact rows solely when matched — inner, left_semi (fact on
  * the left), and right_outer (unmatched DIM rows survive untouched;
  * unmatched fact rows are dropped by the join anyway) — so exactly
  * those are accepted.
  */
object RuntimePrune {

  private val Supported = Set("inner", "left_semi", "leftsemi", "semi", "right",
    "right_outer", "rightouter")

  /** Data-source filters equivalent to "factKey ∈ dim[dimKey]", derived
    * by RUNNING the dim side: `[min ≤ factKey ≤ max]` always, plus the
    * exact key set as an `In` when the distinct count fits `maxInKeys`
    * (the range check is O(1) per file and short-circuits the O(keys)
    * `In` scan to range-surviving files). None = the dim side has no
    * non-null key at all — every fact file is prunable.
    */
  def filtersFor(factKey: String, dim: DataFrame, dimKey: String,
                 maxInKeys: Int = 10000): Option[Seq[Filter]] =
    FileStats.keyFilters(
      dim.select(col(dimKey).as(factKey)).where(col(factKey).isNotNull).distinct(),
      maxInKeys)

  /** Equi-join `snapshot(factBase).factKey = dim.dimKey` with runtime
    * file pruning on the fact side. `joinType` must be fact-prunable
    * (inner / left_semi / right_outer — see object doc). The dim side is
    * left unhinted: AQE (plus the connector's manifest-stats propagation)
    * already broadcasts a dimension-sized build side at runtime.
    */
  def join(spark: SparkSession, factBase: String, factKey: String,
           dim: DataFrame, dimKey: String, joinType: String = "inner",
           asOf: Option[Long] = None, maxInKeys: Int = 10000): DataFrame = {
    val jt = joinType.toLowerCase.replace("_", "")
    require(Supported.map(_.replace("_", "")).contains(jt),
      s"join type '$joinType' cannot prune the fact side: an unmatched " +
        "fact row would survive the join but not the prune. Use inner, " +
        "left_semi or right_outer, or join without runtime pruning.")
    val pin = asOf.map(Snapshots.Pin.AsOf(_): Snapshots.Pin)
      .getOrElse(Snapshots.Pin.Latest)
    val fact = filtersFor(factKey, dim, dimKey, maxInKeys) match {
      case Some(fs) => Snapshots.scanPinned(spark, factBase, pin, fs)
      case None     => Snapshots.scanPinned(spark, factBase, pin).where(lit(false))
    }
    fact.join(dim, fact.col(factKey) === dim.col(dimKey), joinType)
  }

  /** (surviving fact files, total live files) under the runtime filters —
    * the pruning-effectiveness probe (test- and ops-facing, the same
    * shape as [[graft.ingest.BloomIndex.candidateFiles]]).
    */
  def candidateFiles(spark: SparkSession, factBase: String, factKey: String,
                     dim: DataFrame, dimKey: String,
                     asOf: Option[Long] = None,
                     maxInKeys: Int = 10000): (Seq[String], Int) = {
    val v = asOf.getOrElse(Snapshots.versions(factBase).max)
    val live = Snapshots.liveFiles(factBase, v)
    val conf = spark.sparkContext.hadoopConfiguration
    filtersFor(factKey, dim, dimKey, maxInKeys) match {
      case Some(fs) => (FileStats.prune(conf, live, fs), live.size)
      case None     => (Nil, live.size)
    }
  }
}
