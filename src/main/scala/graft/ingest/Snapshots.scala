package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.io.File
import java.nio.file.{Files, FileAlreadyExistsException, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot isolation + time travel over the Parquet block layout — the
  * table-format core the reference's name points at but its code never
  * grew (/root/reference has no manifest, versioning, or commit protocol;
  * blocks become visible the moment the storage adapter writes them,
  * blockManager.go:84-114).
  *
  * Design, scaled down from the Iceberg/Delta idea to what the layout
  * needs:
  *  - data files land under `<base>/data/b_<uuid>/` — INVISIBLE until a
  *    manifest references them, so a failed job leaves garbage, never a
  *    torn table;
  *  - a manifest `_snapshots/vNNNNNNNN.manifest` is one header line
  *    (version, parent, mode) plus the BASE-RELATIVE path of every live
  *    file — the complete state of that version, no chain-walking at read
  *    time. Relative paths make the whole tree RELOCATABLE (rename/copy
  *    the base dir and every snapshot still reads — Delta's choice, vs
  *    Iceberg's absolute URIs which need a rewrite tool to move a table);
  *    absolute lines from older manifests still resolve for back-compat;
  *  - commits serialize the metadata write (resolve parent → compose file
  *    list → atomic manifest move) under a lock file with stale-holder
  *    takeover — the local-FS stand-in for Iceberg's metadata-pointer
  *    CAS; data-file writes stay fully parallel outside the lock;
  *  - readers list manifests and `spark.read.parquet(files…)` — time
  *    travel is "read an older manifest", incremental consumption is a
  *    file-list diff, and snapshot isolation falls out because appends
  *    and overwrites only ever ADD data files.
  *
  * Scale notes: a manifest holds file paths only (a 100 TB table at 1 GB
  * files ≈ 10⁵ lines, single-digit MB); the read path hands Spark an
  * explicit file list, so planning cost is listing one manifest instead
  * of a recursive directory walk over the whole table. Footer-stats
  * pruning still applies per file when `sortCols` clusters the data.
  */
object Snapshots {

  private def snapDir(base: String) = new File(base, "_snapshots")
  private def dataDir(base: String) = new File(base, "data")
  private def manifestFile(base: String, v: Long) =
    new File(snapDir(base), f"v$v%08d.manifest")

  private def versionFiles(base: String): Seq[File] =
    Option(snapDir(base).listFiles()).getOrElse(Array.empty[File]).toSeq
      .filter(_.getName.matches("v\\d{8}\\.manifest"))

  private def versionOf(f: File): Long =
    f.getName.stripPrefix("v").stripSuffix(".manifest").toLong

  /** Committed versions, ascending. Zero-length manifests are in-flight
    * claims (see [[commit]]) and are not listed.
    */
  def versions(base: String): Seq[Long] =
    versionFiles(base).filter(_.length > 0).map(versionOf).sorted

  private case class Manifest(version: Long, parent: Long, mode: String, files: Seq[String])

  /** Manifest lines are base-relative; everything in memory is absolute.
    * Relativize at the WRITE boundary, resolve at the READ boundary, so
    * all internal set logic (carried files, delete/compact diffs, vacuum)
    * compares one consistent form.
    */
  private def relativize(base: String, path: String): String = {
    val b = new File(base).getAbsolutePath + File.separator
    if (path.startsWith(b)) path.substring(b.length) else path
  }

  private def resolve(base: String, line: String): String =
    if (new File(line).isAbsolute) line // legacy absolute manifest line
    else new File(base, line).getAbsolutePath

  private def readManifest(base: String, v: Long): Manifest = {
    val lines = Files.readAllLines(manifestFile(base, v).toPath).asScala.toSeq
    val header = lines.head.split("\t").map { kv =>
      val Array(k, value) = kv.split("=", 2); k -> value
    }.toMap
    Manifest(header("version").toLong, header("parent").toLong,
      header("mode"), lines.tail.filter(_.nonEmpty).map(resolve(base, _)))
  }

  /** Write `df`'s files under a fresh uncommitted batch dir. */
  private def writeBatch(df: DataFrame, base: String, sortCols: Seq[String]): Seq[String] = {
    val batchId = java.util.UUID.randomUUID().toString.take(8)
    val batchPath = new File(dataDir(base), s"b_$batchId")
    val clustered =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    clustered.write.parquet(batchPath.toString)
    Option(batchPath.listFiles()).getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted.toSeq
  }

  /** Mutual exclusion for the METADATA commit only — the ~ms manifest
    * read-compute-write, never the data-file writes (those stay fully
    * parallel and happen before publish). A lock file plays the role of
    * Iceberg's metadata-pointer CAS: without it, a writer that resolves
    * its parent while another commit is in flight publishes a lineage
    * missing that commit's files — a lost update. A crashed holder's lock
    * is taken over once it ages past `StaleLockMs` (commits under the
    * lock are milliseconds, so a minute-old lock is dead, not slow).
    */
  private val StaleLockMs = 60000L

  private def withCommitLock[T](base: String)(body: => T): T = {
    snapDir(base).mkdirs()
    val lock = new File(snapDir(base), ".commit.lock")
    var held = false
    while (!held) {
      try {
        Files.createFile(lock.toPath)
        held = true
      } catch {
        case _: FileAlreadyExistsException =>
          val mtime = lock.lastModified
          if (mtime > 0 && System.currentTimeMillis - mtime > StaleLockMs) {
            // Takeover must be single-winner: deleting the shared path off a
            // stale mtime read is a TOCTOU race (two waiters can each delete
            // a lock — the second one deleting the FRESH lock the first just
            // created, letting two writers into the critical section).
            // Renaming the stale lock to a unique tombstone is atomic: only
            // one renamer succeeds, and it removes only the file it renamed.
            val tomb = new File(snapDir(base), s".commit.lock.dead_${System.nanoTime()}")
            if (lock.renameTo(tomb)) tomb.delete()
            // next loop re-races createFile for the now-absent lock
          } else Thread.sleep(5)
      }
    }
    try body finally lock.delete()
  }

  /** Publish `carried(parent) ++ newFiles` as the next version. The parent
    * is resolved UNDER the commit lock, so `carried` always sees the true
    * newest committed state — concurrent appends serialize instead of
    * dropping each other's files from the lineage.
    */
  private def publish(base: String, newFiles: Seq[String], mode: String,
                      carried: Long => Seq[String]): Long =
    withCommitLock(base) {
      val vs = versions(base)
      val parent = if (vs.isEmpty) 0L else vs.max
      // Number PAST any zero-length claim a pre-lock-era writer (or a
      // crashed one) may have left: such a file is not a committed
      // version, but its number is burned.
      val next = (0L +: versionFiles(base).map(versionOf)).max.max(parent) + 1
      val target = manifestFile(base, next)
      val tmp = new File(snapDir(base), s".tmp_${next}_${System.nanoTime()}")
      Files.writeString(tmp.toPath,
        (s"version=$next\tparent=$parent\tmode=$mode" +:
          (carried(parent) ++ newFiles).map(relativize(base, _)))
          .mkString("\n"))
      // Atomic move: the manifest appears fully written or not at all.
      Files.move(tmp.toPath, target.toPath,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      next
    }

  /** Write `df` as a new snapshot of the table at `base`; returns the new
    * version. `append` carries the parent's files forward; `overwrite`
    * starts the file list fresh (the old files stay on disk for older
    * snapshots until [[expire]]). `sortCols` clusters rows inside each
    * task so Parquet footer min/max stats stay selective.
    */
  def commit(spark: SparkSession, df: DataFrame, base: String,
             mode: String = "append", sortCols: Seq[String] = Nil): Long = {
    require(mode == "append" || mode == "overwrite", s"unknown mode $mode")
    val newFiles = writeBatch(df, base, sortCols)
    publish(base, newFiles, mode,
      parent => if (mode == "append" && parent > 0) readManifest(base, parent).files else Nil)
  }

  /** The live file list of a version — public so tests and external
    * compactors can reason about file-granular behavior.
    */
  def liveFiles(base: String, v: Long): Seq[String] = readManifest(base, v).files

  /** Copy-on-write DELETE at FILE granularity: only files that actually
    * contain a matching row are rewritten (without the matching rows);
    * every other live file is carried into the new snapshot BY PATH,
    * untouched. At 100 TB a selective delete therefore rewrites a handful
    * of files, not the table — the same trick Iceberg's copy-on-write
    * uses, with `input_file_name()` standing in for its file-scoped scan
    * tasks. Returns the new version (or the current one when nothing
    * matched — an empty delete publishes nothing).
    */
  /** `beforePublish` is a test seam: it runs after the touched-file scan
    * and rewrite, immediately before the commit-lock publish — the window
    * a concurrent writer's commit lands in. Production callers leave it.
    */
  def deleteWhere(spark: SparkSession, base: String,
                  cond: org.apache.spark.sql.Column,
                  beforePublish: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val files = readManifest(base, vs.max).files
    val touched = spark.read.parquet(files: _*).filter(cond)
      .select(org.apache.spark.sql.functions.input_file_name().as("f")).distinct()
      .collect().map(r => new java.net.URI(r.getString(0)).getPath).toSet
    if (touched.isEmpty) return vs.max
    // SQL DELETE semantics: only rows where cond is TRUE are deleted; rows
    // where cond is NULL (three-valued logic) must SURVIVE the rewrite, so
    // keep !coalesce(cond, false), never a bare !cond.
    val rewritten = spark.read.parquet(touched.toSeq: _*)
      .filter(!coalesce(cond, lit(false)))
    val newFiles = writeBatch(rewritten, base, Nil)
    val v0 = vs.max
    beforePublish()
    // Carried files are recomputed from the CURRENT parent inside publish's
    // claim loop: a concurrent append that commits between our manifest read
    // above and the claim contributes files that are (by construction) not
    // in `touched`, and they carry forward instead of being lost. A
    // concurrent OVERWRITE (compact or replace) is a different story: if it
    // rewrote any `touched` file away, the parent now holds files that still
    // CONTAIN the cond-matching rows — carrying them would resurrect deleted
    // rows and duplicate survivors from our rewrite. Abort loudly instead
    // (mirror of compact's conflict check).
    publish(base, newFiles, mode = "delete", parent =>
      if (parent == 0) Nil
      else if (parent == v0) readManifest(base, parent).files.filterNot(touched)
      else {
        val pf = readManifest(base, parent).files
        val rewrittenAway = touched -- pf.toSet
        if (rewrittenAway.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteWhere based on v$v0 conflicts with a concurrent overwrite " +
              s"that rewrote ${rewrittenAway.size} of its ${touched.size} touched " +
              "file(s); retry the delete from the new version")
        pf.filterNot(touched)
      })
  }

  /** Small-files compaction as a snapshot: rewrite the latest version's
    * data into `numFiles` files and publish it as a fresh file list. Old
    * snapshots keep reading their own files; [[expire]] reclaims the
    * small ones once no kept version references them.
    */
  def compact(spark: SparkSession, base: String, numFiles: Int,
              sortCols: Seq[String] = Nil): Long = {
    val v0 = versions(base).max
    val files0 = readManifest(base, v0).files.toSet
    val compacted = read(spark, base, Some(v0)).repartition(numFiles)
    val newFiles = writeBatch(compacted, base, sortCols)
    // Conflict handling inside the claim loop: files appended concurrently
    // (parent files not in our compacted input) carry forward untouched; a
    // concurrent DELETE of a file we already rewrote would resurrect its
    // rows, so that case aborts loudly instead of losing the delete.
    publish(base, newFiles, mode = "overwrite", parent => {
      if (parent == v0) Nil
      else {
        val pf = readManifest(base, parent).files
        val removed = files0 -- pf.toSet
        if (removed.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"compact of v$v0 conflicts with a concurrent delete of " +
              s"${removed.size} file(s); retry compaction from the new version")
        pf.filterNot(files0)
      }
    })
  }

  /** Read the table at `asOf` (default: latest committed version). */
  def read(spark: SparkSession, base: String, asOf: Option[Long] = None): DataFrame = {
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v = asOf.getOrElse(vs.max)
    require(vs.contains(v), s"snapshot $v not found (have ${vs.mkString(",")})")
    val m = readManifest(base, v)
    spark.read.parquet(m.files: _*)
  }

  /** Incremental read: rows in `toV`'s file set but not `fromV`'s — the
    * appended data between two snapshots, consumed as a file-list diff
    * (no data-side anti join; CDC for the append-only path).
    */
  def changes(spark: SparkSession, base: String, fromV: Long, toV: Long): DataFrame = {
    val before = readManifest(base, fromV).files.toSet
    val added = readManifest(base, toV).files.filterNot(before)
    spark.read.parquet(added: _*)
  }

  /** Drop all but the newest `keepLast` snapshots, then delete data files
    * no surviving manifest references (the vacuum that makes overwrites
    * and compactions actually reclaim space). Readers of expired versions
    * fail on the missing manifest, not with silently wrong rows.
    */
  def expire(base: String, keepLast: Int = 1): Unit = {
    val vs = versions(base)
    val (drop, keep) = vs.splitAt(math.max(0, vs.size - keepLast))
    drop.foreach(v => manifestFile(base, v).delete())
    val live = keep.flatMap(v => readManifest(base, v).files).toSet
    Option(dataDir(base).listFiles()).getOrElse(Array.empty[File]).foreach { batch =>
      Option(batch.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.getName.endsWith(".parquet") && !live(f.getAbsolutePath))
        .foreach(_.delete())
      if (Option(batch.listFiles()).exists(_.forall(!_.getName.endsWith(".parquet"))))
        org.apache.commons.io.FileUtils.deleteDirectory(batch)
    }
  }
}
