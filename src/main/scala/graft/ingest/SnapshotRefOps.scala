package graft.ingest

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import java.nio.charset.StandardCharsets.UTF_8

/** Refs and maintenance: rollback, tags, branches, history/files/stats
  * metadata tables, orphan removal and snapshot expiry.
  *
  * Split from the monolithic Snapshots.scala along its section seams
  * (round 16); mixed into [[Snapshots]], whose scaladoc carries the
  * design overview. `private[ingest]` on members is the trait-split
  * rendering of the old object-private visibility.
  */
trait SnapshotRefOps { self: Snapshots.type =>


  /** Roll the table back to version `v` — published as a NEW commit whose
    * file list is `v`'s (Iceberg's rollback semantics): history stays
    * intact, time travel still reaches the rolled-back-over versions, and
    * the operation is itself undoable by another rollback. Metadata-only:
    * no data file is read, written, or deleted (expire reclaims the
    * orphaned ones once their versions age out).
    */
  def rollback(base: String, v: Long): Long = {
    val vs = versions(base)
    require(vs.contains(v), s"cannot roll back to unknown version $v")
    val target = readManifest(base, v)
    // The rolled-back-to era's schema comes along with its files — a
    // rollback across a rename restores the old name too.
    publish(base, Nil, Nil, mode = s"rollback:$v",
      _ => (target.files, target.dvs, target.eqs),
      schemaFor = _ => target.schema.map(_.json))
  }

  /** Named tags: an immutable label → version pointer (Iceberg's refs,
    * minus branches) — "training-set-v3 = snapshot 17". A tagged version
    * survives [[expire]] regardless of age, which is the point: tags make
    * dataset versions REPRODUCIBLE (re-run training months later against
    * the exact bytes) without disabling vacuum for the whole table. One
    * file per tag under `_snapshots/`, created atomically and never
    * overwritten — retagging a name is an error, not a silent repoint.
    */
  def tag(base: String, name: String, v: Long): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid tag name $name")
    require(versions(base).contains(v), s"cannot tag unknown version $v")
    val fs = fsFor(base)
    val f = new Path(snapDir(base), s"tag_$name")
    // create-new CAS: retagging a name is an error, not a silent repoint
    try writeStringNew(fs, f, v.toString)
    catch {
      case e: java.io.IOException =>
        if (!fs.exists(f)) throw e
        throw new IllegalArgumentException(
          s"tag $name already exists (points at version ${tagVersion(base, name)})")
    }
    ()
  }

  def tagVersion(base: String, name: String): Long =
    readString(fsFor(base), new Path(snapDir(base), s"tag_$name")).trim.toLong

  def tags(base: String): Map[String, Long] = {
    val fs = fsFor(base)
    listDir(fs, snapDir(base))
      .filter(_.getPath.getName.startsWith("tag_"))
      .map(s => s.getPath.getName.stripPrefix("tag_") ->
        readString(fs, s.getPath).trim.toLong).toMap
  }

  def dropTag(base: String, name: String): Unit = {
    fsFor(base).delete(new Path(snapDir(base), s"tag_$name"), false); ()
  }

  /** Read the table at a named tag. */
  def readTag(spark: SparkSession, base: String, name: String): DataFrame =
    read(spark, base, Some(tagVersion(base, name)))

  // ---------------------------------------------------------------------
  // Branches: named MUTABLE lineages forked from a main version (Iceberg
  // refs, the half tags leave out). The write-audit-publish workflow rides
  // them: stage commits on a branch (invisible to main readers), audit the
  // branch, then fast-forward main to the branch head — one atomic
  // metadata publish, no data rewrite.
  //
  // Mechanics: branch manifests live beside main's under
  // `_snapshots/branch-<name>.vNNNNNNNN.manifest` with a branch-LOCAL
  // version sequence; the fork point (a main version) sits in a
  // `branch_<name>` pointer file and is pinned against [[expire]] exactly
  // like a tag. Data files of branch commits share the main data/ dir —
  // they are invisible until a manifest (branch or main) references them,
  // and expire counts every branch manifest's files as live.
  // ---------------------------------------------------------------------

  private[ingest] def branchPointer(base: String, name: String) =
    new Path(snapDir(base), s"branch_$name")

  private[ingest] def branchManifest(base: String, name: String, v: Long) =
    new Path(snapDir(base), f"branch-$name.v$v%08d.manifest")

  private[ingest] def branchStatuses(base: String, name: String): Seq[FileStatus] =
    listDir(fsFor(base), snapDir(base))
      .filter(_.getPath.getName.matches(
        s"branch-${java.util.regex.Pattern.quote(name)}\\.v\\d{8}\\.manifest"))

  private[ingest] def branchVersionOf(name: String): Long =
    name.substring(name.lastIndexOf(".v") + 2).stripSuffix(".manifest").toLong

  /** Branch-local committed versions, ascending (empty for a fresh branch
    * that only points at its fork).
    */
  def branchVersions(base: String, name: String): Seq[Long] =
    branchStatuses(base, name).filter(_.getLen > 0)
      .map(s => branchVersionOf(s.getPath.getName)).sorted

  /** The main version a branch forked from. */
  def branchFork(base: String, name: String): Long =
    readString(fsFor(base), branchPointer(base, name)).trim.toLong

  def branches(base: String): Map[String, Long] = {
    val fs = fsFor(base)
    listDir(fs, snapDir(base))
      .filter(_.getPath.getName.startsWith("branch_"))
      .map(s => s.getPath.getName.stripPrefix("branch_") ->
        readString(fs, s.getPath).trim.toLong).toMap
  }

  /** Fork a branch from `from` (default: the current main head). Same
    * create-new CAS as [[tag]] — re-creating an existing branch is an
    * error, not a silent re-fork.
    */
  def createBranch(base: String, name: String, from: Option[Long] = None): Long = {
    require(name.matches("[A-Za-z0-9._-]+"), s"invalid branch name $name")
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val fork = from.getOrElse(vs.max)
    require(vs.contains(fork), s"cannot branch from unknown version $fork")
    val fs = fsFor(base)
    try writeStringNew(fs, branchPointer(base, name), fork.toString)
    catch {
      case e: java.io.IOException =>
        if (!fs.exists(branchPointer(base, name))) throw e
        throw new IllegalArgumentException(s"branch $name already exists")
    }
    fork
  }

  /** The (files, dvs, eqs) state at a branch's head: its newest branch
    * commit, or the fork-point main manifest when the branch has none yet.
    */
  private[ingest] def branchHeadState(base: String, name: String): (Seq[String], Seq[String], Seq[String]) = {
    val bvs = branchVersions(base, name)
    if (bvs.isEmpty) {
      val m = readManifest(base, branchFork(base, name))
      (m.files, m.dvs, m.eqs)
    } else {
      val text = readString(fsFor(base), branchManifest(base, name, bvs.max))
      val lines = text.split("\n", -1).toSeq
      val body = lines.tail.filter(_.nonEmpty)
      val eqLines = body.filter(_.startsWith("eq:"))
      val (dvLines, dataLines) =
        body.filterNot(_.startsWith("eq:")).partition(_.startsWith("dv:"))
      (dataLines.map(resolve(base, _)),
        dvLines.map(l => resolve(base, l.stripPrefix("dv:"))),
        eqLines.map(l => resolve(base, l.stripPrefix("eq:"))))
    }
  }

  /** Append `df` to a branch: data files land in the shared data/ dir
    * (invisible to main), the branch manifest carries the branch head's
    * files plus the new batch, and main's lineage is untouched. Runs
    * under the same commit lock as main publishes.
    */
  def commitToBranch(spark: SparkSession, df: DataFrame, base: String,
                     name: String, sortCols: Seq[String] = Nil): Long = {
    val fs = fsFor(base)
    require(fs.exists(branchPointer(base, name)), s"no branch $name under $base")
    // Branch data aligns to the FORK era's field ids (no schema evolution
    // on branches — a WAP stage shares the table's shape), so published
    // files are indistinguishable from main-written ones.
    val toWrite = readManifest(base, branchFork(base, name)).schema match {
      case Some(s) =>
        require(df.columns.toSet == s.fieldNames.toSet,
          s"branch commit columns ${df.columns.mkString(",")} must match " +
            s"the fork schema ${s.fieldNames.mkString(",")}")
        df.select(s.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq: _*)
      case None => df
    }
    // Branch commits are new data too: a WAP branch that admits violating
    // rows would fast-forward them into main unchecked.
    val newFiles = writeBatch(toWrite, base, sortCols, checkNewData = true)
    withCommitLock(base) {
      val (headFiles, headDvs, headEqs) = branchHeadState(base, name)
      val bvs = branchVersions(base, name)
      val next = (0L +: bvs).max + 1
      val target = branchManifest(base, name, next)
      val tmp = new Path(snapDir(base), s".tmp_b_${name}_${next}_${System.nanoTime()}")
      writeStringNew(fs, tmp,
        (s"version=$next\tparent=${next - 1}\tmode=append" +:
          ((headFiles ++ newFiles).map(relativize(base, _)) ++
            headDvs.map(f => "dv:" + relativize(base, f)) ++
            headEqs.map(f => "eq:" + relativize(base, f)))).mkString("\n"))
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(s"failed to publish branch manifest $target")
      next
    }
  }

  /** Read a branch's head (staged-but-unpublished state — the audit read
    * of write-audit-publish).
    */
  def readBranch(spark: SparkSession, base: String, name: String): DataFrame =
    scanPinned(spark, base, Pin.AtBranch(name))

  /** Publish a branch into main — the WAP publish step. Strict
    * fast-forward semantics (Iceberg's fastForward): main must still sit
    * at the branch's fork point; if main advanced past it the branches
    * diverged, and silently taking the branch state would drop main's
    * commits — abort and let the caller re-stage. The publish itself is
    * one metadata commit (mode `fastforward:<name>`); the branch pointer
    * stays for [[dropBranch]].
    */
  def fastForward(base: String, name: String): Long = {
    val fork = branchFork(base, name)
    val (files, dvs, eqs) = branchHeadState(base, name)
    publish(base, Nil, Nil, mode = s"fastforward:$name", parent => {
      if (parent != fork)
        throw new java.util.ConcurrentModificationException(
          s"branch $name forked at v$fork but main is at v$parent - " +
            "not a fast-forward; re-stage the branch from the new head")
      (files, dvs, eqs)
    })
  }

  /** Delete a branch's pointer and manifests. Its data files become
    * unreferenced (unless published) and the next [[expire]] reclaims
    * them.
    */
  def dropBranch(base: String, name: String): Unit = {
    val fs = fsFor(base)
    branchStatuses(base, name).foreach(s => fs.delete(s.getPath, false))
    fs.delete(branchPointer(base, name), false)
    ()
  }

  /** Metadata table: one row per committed version — (version, parent,
    * mode, n_files, n_dvs, n_eqs, tags) — the `history` introspection surface
    * (Iceberg's snapshots/history metadata tables). Manifest-sized work,
    * no data file touched.
    */
  def history(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    val tagged = tags(base).toSeq.groupMap(_._2)(_._1)
    versions(base).map { v =>
      val m = readManifest(base, v)
      // Legacy (pre-commitTs) manifests display their file mtime — best
      // effort and copy-fragile, but more useful than a 0; resolution
      // (`versionAt`) applies the same fallback.
      val ts = m.commitTs.getOrElse(
        try fsFor(base).getFileStatus(manifestFile(base, v)).getModificationTime
        catch { case _: Exception => 0L })
      (m.version, m.parent, m.mode, m.files.size.toLong, m.dvs.size.toLong,
        m.eqs.size.toLong, tagged.getOrElse(v, Nil).sorted, ts)
    }.toDF("version", "parent", "mode", "n_files", "n_dvs", "n_eqs", "tags",
      "committed_at_ms")
  }

  /** Metadata table: the live data files of a version with their sizes —
    * the `files` introspection surface. Listing-sized, no file opened.
    */
  def filesTable(spark: SparkSession, base: String, asOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val vs = versions(base)
    val m = readManifest(base, asOf.getOrElse(vs.max))
    val fs = fsFor(base)
    m.files.map(f => (relKey(f), fs.getFileStatus(new Path(f)).getLen))
      .toDF("file", "size_bytes")
  }

  /** Metadata table: the commit-time footer stats of a version's live
    * files — (file, column, domain, min, max, null_count, row_count), one
    * row per (file, stat-carrying column). The introspection surface for
    * [[readWhere]]'s pruning (Iceberg's `files` table exposes
    * lower/upper_bounds the same way); sidecar-sized driver IO, no data
    * file opened. Files committed before stats existed simply have no
    * rows here.
    */
  def statsTable(spark: SparkSession, base: String, asOf: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val m = pinnedManifest(base, asOf.map(Pin.AsOf).getOrElse(Pin.Latest))
    val conf = hadoopConf
    m.files.groupBy(f => new Path(f).getParent).toSeq.flatMap { case (dir, files) =>
      val stats = FileStats.readSidecar(conf, dir).getOrElse(Map.empty)
      files.flatMap { f =>
        val name = new Path(f).getName
        stats.get(name).toSeq.flatMap { fs =>
          fs.cols.toSeq.sortBy(_._1).map { case (c, st) =>
            (relKey(f), c, st.t, st.min.orNull, st.max.orNull, st.nulls, fs.rows,
              fs.ndv.get(c).map(sk => FileStats.mergeNdv(Seq(sk))))
          }
        }
      }
    }.toDF("file", "column", "domain", "min", "max", "null_count", "row_count", "ndv")
  }

  /** Drop all but the newest `keepLast` snapshots, then delete data files
    * no surviving manifest references (the vacuum that makes overwrites
    * and compactions actually reclaim space). TAGGED versions are always
    * kept — expiring a pinned dataset version would break the
    * reproducibility contract tags exist for. Readers of expired versions
    * fail on the missing manifest, not with silently wrong rows.
    */
  /** Delete data files NO manifest (main, any version, or any branch
    * head) references — the garbage a crashed writer leaves: [[expire]]
    * only reclaims files that were once LIVE, while a job that died
    * between `writeBatch` and `publish` leaves files nothing ever pointed
    * at. Only files older than `olderThanMs` are candidates, so an
    * IN-FLIGHT commit's just-written (not yet published) batch is never
    * swept — the same grace-period discipline as Iceberg's
    * remove_orphan_files (default 3 days; tests shrink it). Returns the
    * deleted paths. Listing-sized driver work, no data file opened.
    */
  def removeOrphans(base: String, olderThanMs: Long = 3L * 24 * 3600 * 1000): Seq[String] = {
    val fs = fsFor(base)
    val cutoff = System.currentTimeMillis() - olderThanMs
    val live = (versions(base).flatMap { v =>
      val m = readManifest(base, v); m.files ++ m.dvs ++ m.eqs
    } ++ branches(base).keys.toSeq.flatMap { b =>
      val (f, d, e) = branchHeadState(base, b); f ++ d ++ e
    }).map(uriPath).toSet
    val deleted = Seq.newBuilder[String]
    listDir(fs, dataDir(base)).filter(_.isDirectory).foreach { batch =>
      listDir(fs, batch.getPath)
        .filter(f => f.getPath.getName.endsWith(".parquet") &&
          f.getModificationTime < cutoff &&
          !live(uriPath(f.getPath.toString)))
        .foreach { f =>
          if (fs.delete(f.getPath, false)) deleted += f.getPath.toString
        }
      if (listDir(fs, batch.getPath).forall(f => !f.getPath.getName.endsWith(".parquet")))
        fs.delete(batch.getPath, true)
    }
    deleted.result()
  }

  def expire(base: String, keepLast: Int = 1,
             maxAgeMs: Option[Long] = None): Unit = {
    val fs = fsFor(base)
    val vs = versions(base)
    // Tagged versions are reproducibility pins; branch FORK versions stay
    // readable so an empty branch (and fastForward's conflict check) still
    // resolves its state.
    val pinned = tags(base).values.toSet ++ branches(base).values
    // Age guard (opt-in): a version younger than the cutoff — or one
    // whose manifest predates recorded commit instants, where age can't
    // be PROVEN — survives even past the count bound. Conservative by
    // construction: retention never deletes what it can't date.
    val cutoff = maxAgeMs.map(a => System.currentTimeMillis() - a)
    def oldEnough(v: Long): Boolean = cutoff match {
      case None    => true
      case Some(c) => commitTsOf(base, v).exists(ts => ts > 0 && ts < c)
    }
    val (dropCand, keepTail) = vs.splitAt(math.max(0, vs.size - keepLast))
    val (kept, drop) = dropCand.partition(v => pinned(v) || !oldEnough(v))
    val keep = kept ++ keepTail
    drop.foreach(v => fs.delete(manifestFile(base, v), false))
    // Liveness compares uriPath-canonical forms: manifest lines resolve
    // unqualified while FileSystem listings come back fully qualified.
    // Staged-but-unpublished BRANCH data shares the data/ dir and must
    // survive the sweep: every branch head's files count as live.
    val branchLive = branches(base).keys.toSeq.flatMap { b =>
      val (f, d, e) = branchHeadState(base, b); f ++ d ++ e
    }
    val live = (keep.flatMap { v =>
      val m = readManifest(base, v); m.files ++ m.dvs ++ m.eqs
    } ++ branchLive).map(uriPath).toSet
    listDir(fs, dataDir(base)).filter(_.isDirectory).foreach { batch =>
      listDir(fs, batch.getPath)
        .filter(f => f.getPath.getName.endsWith(".parquet") &&
          !live(uriPath(f.getPath.toString)))
        .foreach(f => fs.delete(f.getPath, false))
      if (listDir(fs, batch.getPath).forall(f => !f.getPath.getName.endsWith(".parquet")))
        fs.delete(batch.getPath, true)
    }
  }
}
