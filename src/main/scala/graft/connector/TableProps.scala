package graft.connector

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-level properties persisted beside the snapshot tree
  * (`<base>/_table_props`, java.util.Properties text format — human-
  * readable, append-free, atomic via `create(overwrite)` of a tiny
  * file). Shared by the catalog (DDL `TBLPROPERTIES`, `ALTER TABLE SET`)
  * and the write path, which honors:
  *
  *  - `write.cluster-by` = comma-separated column names. Every batch
  *    write through the connector range-repartitions + sorts on these
  *    columns before committing, so each data file owns a narrow key
  *    range and the commit-time footer stats ([[graft.ingest.FileStats]])
  *    stay selective — static filter pushdown AND
  *    [[graft.query.RuntimePrune]] join-time file skipping then prune on
  *    every write, not only after a manual compact. The 100 TB point:
  *    clustering at WRITE time costs one shuffle the load pipeline was
  *    usually paying anyway, while clustering after the fact costs a
  *    full-table rewrite.
  *
  * Missing columns degrade gracefully: a cluster column absent from the
  * written frame (legitimate after `DROP COLUMN`, or a stale property)
  * skips clustering for that write rather than failing it — layout is an
  * optimization, never a correctness gate.
  *
  * Public: path-based (non-catalog) tables declare clustering by calling
  * [[write]] directly — the SQL route is `TBLPROPERTIES` / `ALTER TABLE
  * SET` through the catalog.
  */
object TableProps {
  val ClusterBy = "write.cluster-by"

  /** `partition.transforms` = the non-identity `PARTITIONED BY`
    * transforms exactly as declared (`days(ts)`, `bucket(16, k)`, …).
    * Purely descriptive: the engine re-expresses every transform as
    * range-clustering on its base column (see GraftCatalog.createTable),
    * but the original DDL intent stays visible through SHOW
    * TBLPROPERTIES and the `t.properties` metadata table so a migrating
    * user can audit what the table was declared as.
    */
  val PartitionTransforms = "partition.transforms"

  /** `write.eq-delete.max-batches` = N: after an equality-delete-writing
    * commit ([[graft.ingest.Snapshots.upsertByKeys]] / `deleteByKeys` /
    * `applyDelta`, incl. the streaming sink's eq-upsert mode), when the
    * table holds MORE than N outstanding eq batches the committing writer
    * auto-runs `convertEqToDv`, folding them into one deletion vector.
    * Readers then pay one coordinate anti join instead of one join per
    * batch — the read-cost bound an external maintenance scheduler would
    * otherwise have to enforce. Unset = manual maintenance (the default;
    * conversion scans the eq-referenced files, a cost a high-frequency
    * writer may prefer to schedule off-peak).
    */
  val EqDeleteMaxBatches = "write.eq-delete.max-batches"

  /** `write.binpack.max-small-files` = N: after an append/overwrite
    * commit, when more than N live files sit below
    * `write.binpack.small-bytes` (default 32 MiB) the committing writer
    * auto-runs a binpack compact of just those files — Delta's
    * auto-optimize shape, bounding small-file debt from streaming
    * ingests without an external scheduler. Unset = manual compaction.
    */
  val BinpackMaxSmallFiles = "write.binpack.max-small-files"
  val BinpackSmallBytes = "write.binpack.small-bytes"

  /** `history.expire.max-age-ms` / `history.expire.min-snapshots-to-keep`:
    * auto-retention, completing the auto-maintenance family (auto-fold,
    * auto-binpack). When either is set, every commit through
    * [[graft.ingest.Snapshots.commit]] runs `expire` afterwards —
    * an unattended streaming table then bounds its manifest/file history
    * without an external scheduler. `min-snapshots-to-keep` (default 1,
    * must be >= 1) is the count floor: that many newest versions always
    * survive. `max-age-ms`, when set, additionally protects YOUNG
    * versions: only versions older than the age (by their recorded
    * commit instant; legacy instant-less manifests are never
    * age-expired) are dropped. Tagged versions and branch forks survive
    * like any manual expire, and a lost maintenance race is non-fatal —
    * the data commit is already durable.
    */
  val ExpireMaxAgeMs = "history.expire.max-age-ms"
  val ExpireMinSnapshots = "history.expire.min-snapshots-to-keep"

  /** `write.check.<name>` = SQL predicate: every NEW-data write
    * (append/overwrite commits, upsert/merge/replication insert legs)
    * refuses when any written row makes the predicate FALSE (SQL CHECK
    * semantics — NULL passes). Delta's CHECK-constraint shape. Setting a
    * constraint does NOT validate existing rows (document or recommit);
    * maintenance rewrites (compact) deliberately do not re-check, so a
    * later-added constraint can never brick compaction of older data.
    */
  val CheckPrefix = "write.check."

  /** The (name, predicate) CHECK constraints of `base`. */
  def checks(base: String): Seq[(String, String)] =
    read(base).toSeq.collect {
      case (k, v) if k.startsWith(CheckPrefix) && v.trim.nonEmpty =>
        k.stripPrefix(CheckPrefix) -> v
    }.sortBy(_._1)

  private def propsFile(base: String) = new Path(base, "_table_props")

  private def fsFor(base: String) = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    new Path(base).getFileSystem(conf)
  }

  def read(base: String): Map[String, String] = {
    val fs = fsFor(base)
    val p = propsFile(base)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try {
        val props = new java.util.Properties()
        props.load(in)
        import scala.jdk.CollectionConverters._
        props.asScala.toMap
      } finally in.close()
    }
  }

  def write(base: String, m: Map[String, String]): Unit = {
    val props = new java.util.Properties()
    m.foreach { case (k, v) => props.setProperty(k, v) }
    val out = fsFor(base).create(propsFile(base), true)
    try props.store(out, null) finally out.close()
  }

  /** The cluster-by column list of `base` (empty = unclustered). */
  def clusterBy(base: String): Seq[String] =
    read(base).get(ClusterBy).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
}
