package graft.ingest

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import java.nio.charset.StandardCharsets.UTF_8

/** The commit protocol: lock strategies, atomic publish, identity
  * ranges, commit/staged-write/abort, retention, auto-binpack, clone
  * and addFiles.
  *
  * Split from the monolithic Snapshots.scala along its section seams
  * (round 16); mixed into [[Snapshots]], whose scaladoc carries the
  * design overview. `private[ingest]` on members is the trait-split
  * rendering of the old object-private visibility.
  */
trait SnapshotCommitOps { self: Snapshots.type =>


  /** Mutual exclusion for the METADATA commit only — the ~ms manifest
    * read-compute-write, never the data-file writes (those stay fully
    * parallel and happen before publish). A lock file plays the role of
    * Iceberg's metadata-pointer CAS: without it, a writer that resolves
    * its parent while another commit is in flight publishes a lineage
    * missing that commit's files — a lost update. A crashed holder's lock
    * is taken over once it ages past `StaleLockMs` (commits under the
    * lock are milliseconds, so a minute-old lock is dead, not slow).
    */
  private[ingest] val StaleLockMs = 60000L

  private[ingest] def runtimeConf(key: String, dflt: String): String =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(key)).getOrElse(dflt)

  private[ingest] val lockCache =
    new java.util.concurrent.ConcurrentHashMap[String, CommitLock]()

  /** Route the commit critical section through the configured
    * [[CommitLock]] strategy; the default file lock first guards against
    * known non-atomic stores (see the [[CommitLock]] matrix) — failing
    * loudly at commit time beats a silently lost update discovered in an
    * audit.
    */
  private[ingest] def withCommitLock[T](base: String)(body: => T): T =
    runtimeConf("spark.graft.commit.lockStrategy", "file") match {
      case "file" =>
        val scheme = Option(new Path(base).toUri.getScheme).getOrElse("file")
        val lax = runtimeConf("spark.graft.commit.nonAtomicSchemes", "s3,s3a,s3n,oss")
          .split(",").map(_.trim).filter(_.nonEmpty).toSet
        if (lax(scheme) &&
            runtimeConf("spark.graft.commit.allowNonAtomicStore", "false") != "true")
          throw new IllegalStateException(
            s"refusing to commit to $base: scheme '$scheme' does not provide " +
              "exclusive create or atomic rename-no-overwrite, so the default " +
              "file-lock commit protocol could LOSE a concurrent commit " +
              "silently. Configure spark.graft.commit.lockStrategy with an " +
              "external CommitLock implementation, or set " +
              "spark.graft.commit.allowNonAtomicStore=true if writers are " +
              "serialized outside this library.")
        fileLock(base)(body)
      case fqcn =>
        lockCache.computeIfAbsent(fqcn, cls =>
          Class.forName(cls).getDeclaredConstructor().newInstance()
            .asInstanceOf[CommitLock]).withLock(base)(body)
    }

  /** Atomically claim `p` as a brand-new file; false when it already
    * exists. On RawLocalFileSystem this CANNOT be `create(overwrite =
    * false)` — that implementation is exists()-then-create, so two local
    * writers can both pass the check, and POSIX rename() silently
    * OVERWRITES files, so nothing downstream catches the double entry
    * either (the round-8 concurrency stress lost 2/20 commits to exactly
    * this once the critical section grew by one header read).
    * `File.createNewFile` is O_CREAT|O_EXCL — a true kernel-level CAS.
    * The local file is resolved through `pathToFile`, not `p.toUri`, so a
    * RawLocalFileSystem SUBCLASS that remaps paths (a chroot-style test
    * FS, a relocating wrapper) still gets its CAS on the file it actually
    * stores — keying the branch on the Hadoop path string would race such
    * a wrapper against itself on a path nobody writes.
    * Every other supported FileSystem (HDFS, ABFS, GCS) implements
    * exclusive create atomically server-side; genuinely non-atomic
    * stores are refused up front by the scheme guard.
    */
  private[ingest] def tryClaim(fs: FileSystem, p: Path): Boolean = fs match {
    case raw: org.apache.hadoop.fs.RawLocalFileSystem =>
      raw.pathToFile(p).createNewFile()
    case _ =>
      try { fs.create(p, false).close(); true }
      catch { case e: java.io.IOException =>
        // FS implementations differ on the exception for an existing
        // path; with the lock present it reads as contention, otherwise
        // it is a genuine IO failure that must not spin as a phantom lock.
        if (fs.exists(p)) false else throw e }
  }

  private[ingest] def fileLock[T](base: String)(body: => T): T = {
    val fs = fsFor(base)
    fs.mkdirs(snapDir(base))
    val lock = new Path(snapDir(base), ".commit.lock")
    var held = false
    while (!held) {
      if (tryClaim(fs, lock)) held = true
      else {
        if (fs.exists(lock)) {
          val mtime =
            try fs.getFileStatus(lock).getModificationTime
            catch { case _: java.io.FileNotFoundException => 0L } // freed already
          if (mtime > 0 && System.currentTimeMillis - mtime > StaleLockMs) {
            // Takeover must be single-winner: deleting the shared path off a
            // stale mtime read is a TOCTOU race (two waiters can each delete
            // a lock — the second one deleting the FRESH lock the first just
            // created, letting two writers into the critical section).
            // Renaming the stale lock to a unique tombstone is atomic: only
            // one renamer succeeds, and it removes only the file it renamed.
            val tomb = new Path(snapDir(base), s".commit.lock.dead_${System.nanoTime()}")
            if (try fs.rename(lock, tomb) catch { case _: java.io.IOException => false })
              fs.delete(tomb, false)
            // next loop re-races the claim for the now-absent lock
          } else Thread.sleep(5)
        }
        // lock vanished between the failed claim and the exists probe:
        // just re-race the claim immediately
      }
    }
    try body finally fs.delete(lock, false)
  }

  /** Publish `carried(parent) ++ (newFiles, newDvs)` as the next version.
    * `carried` returns (data files, deletion-vector files) to carry from
    * the parent; it is resolved UNDER the commit lock, so it always sees
    * the true newest committed state — concurrent appends serialize
    * instead of dropping each other's files from the lineage.
    */
  /** `schemaFor` supplies the schema header of the new manifest given the
    * resolved parent (default: inherit the parent's era schema verbatim —
    * correct for every operation that doesn't change the table's shape).
    */
  /** `lastIdFor` supplies the last-column-id header given the resolved
    * parent (default: inherit the parent's — monotone across every
    * non-minting commit, including DROP of the highest-id column and
    * rollback past an ADD). Only id-MINTING commits override it.
    */
  private[ingest] def publish(base: String, newFiles: Seq[String], newDvs: Seq[String],
                      mode: String,
                      carried: Long => (Seq[String], Seq[String], Seq[String]),
                      schemaFor: Long => Option[String] = null,
                      lastIdFor: Long => Option[Long] = null,
                      newEqs: Seq[String] = Nil): Long =
    withCommitLock(base) {
      val schemaOf: Long => Option[String] =
        if (schemaFor != null) schemaFor
        else parent => if (parent <= 0) None else readManifest(base, parent).schema.map(_.json)
      val lastIdOf: Long => Option[Long] =
        if (lastIdFor != null) lastIdFor
        else parent => if (parent <= 0) None
          else {
            val m = readManifest(base, parent)
            // The FIRST header this table ever writes must come from the
            // full mint floor (surviving-history scan on pre-header
            // tables) — inheriting the parent's era-schema max would
            // permanently record a floor that forgets pre-upgrade drops.
            if (m.schema.isEmpty && m.lastColumnId.isEmpty) None
            else Some(mintFloor(base, m))
          }
      val fs = fsFor(base)
      // Optimistic claim loop. The LOCK is the correctness anchor: its
      // claim is a true atomic CAS on every supported store (O_EXCL via
      // File.createNewFile on raw local — see tryClaim — and server-side
      // exclusive create on HDFS/ABFS/GCS), so at most one writer is in
      // this section per table. The RENAME is the publish point and a
      // SECONDARY guard: on HDFS/ABFS rename fails when the destination
      // exists, catching even a pathological double entry (stale-lock
      // takeover of a live-but-stalled holder); POSIX rename OVERWRITES,
      // so on raw local the lock alone carries the guarantee — which is
      // why its claim had to be O_EXCL, not check-then-act. A loser
      // recomputes parent (and with it `carried`'s conflict checks) and
      // retries — Iceberg's optimistic-commit shape.
      var out = -1L
      var attempts = 0
      while (out < 0) {
        val vs = versions(base)
        val parent = if (vs.isEmpty) 0L else vs.max
        // Number PAST any zero-length claim a pre-lock-era writer (or a
        // crashed one) may have left: such a file is not a committed
        // version, but its number is burned.
        val next = (0L +: versionStatuses(base).map(s => versionOf(s.getPath.getName)))
          .max.max(parent) + 1
        val target = manifestFile(base, next)
        val tmp = new Path(snapDir(base), s".tmp_${next}_${System.nanoTime()}")
        val (carriedFiles, carriedDvs, carriedEqs) = carried(parent)
        // Compact JSON holds no tabs/newlines, so the schema rides the
        // one-line header like any other kv — era schemas travel WITH
        // their manifests, which is what makes time travel see old names.
        val schemaKv = schemaOf(parent).map(j => s"\tschema=$j").getOrElse("")
        val lastIdKv = lastIdOf(parent).map(v => s"\tlastColumnId=$v").getOrElse("")
        // Wall-clock commit instant, recorded IN the manifest so it
        // survives relocation/copy (mtimes don't) — what `TIMESTAMP AS
        // OF` resolves against. Publish-attempt time, not rename time:
        // the gap is milliseconds and only ordering between commits
        // matters. CLAMPED to the parent's instant so commitTs is
        // monotone with version even across a clock regression (NTP
        // step, restart on a skewed host) — versionAt's newest-first
        // early exit depends on exactly this invariant, and the clamp
        // costs one header read under the lock.
        val parentTs =
          if (parent <= 0) 0L else commitTsOf(base, parent).getOrElse(0L)
        val tsKv = s"\tcommitTs=${System.currentTimeMillis.max(parentTs)}"
        writeStringNew(fs, tmp,
          (s"version=$next\tparent=$parent\tmode=$mode$tsKv$schemaKv$lastIdKv" +:
            ((carriedFiles ++ newFiles).map(relativize(base, _)) ++
              (carriedDvs ++ newDvs).map(f => "dv:" + relativize(base, f)) ++
              (carriedEqs ++ newEqs).map(f => "eq:" + relativize(base, f))))
            .mkString("\n"))
        // Atomic rename: the manifest appears fully written or not at all.
        if (fs.rename(tmp, target)) out = next
        else {
          fs.delete(tmp, false)
          attempts += 1
          if (attempts > 100) throw new java.io.IOException(
            s"failed to publish manifest $target after $attempts attempts")
        }
      }
      out
    }

  /** Write `df` as a new snapshot of the table at `base`; returns the new
    * version. `append` carries the parent's files forward; `overwrite`
    * starts the file list fresh (the old files stay on disk for older
    * snapshots until [[expire]]). `sortCols` clusters rows inside each
    * task so Parquet footer min/max stats stay selective.
    */
  /** Claim `n` consecutive identity-allocation indices for `colName` —
    * returns the first. The ledger is a directory of empty marker files
    * whose NAMES carry the claimed high-water mark (`<base>/_idseq/
    * <col>.<k>`): a claim is durable the instant its create-exclusive
    * succeeds, so a crash between claim and data write burns a gap
    * (standard identity semantics — Delta and every SQL sequence allow
    * gaps) but can never double-allocate. Serialized by the table's
    * commit lock; the claim itself is a metadata touch, so the lock hold
    * is microseconds, never the duration of a data write.
    */
  private[ingest] def claimIdentityRange(base: String, colName: String, n: Long): Long = {
    withCommitLock(base) {
      val fs = fsFor(base)
      val dir = new Path(base, "_idseq")
      fs.mkdirs(dir)
      val prefix = colName + "."
      val entries = listDir(fs, dir).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .flatMap(nm => scala.util.Try(nm.stripPrefix(prefix).toLong).toOption)
      val cur = if (entries.isEmpty) 0L else entries.max
      writeStringNew(fs, new Path(dir, prefix + (cur + n)), "")
      // best-effort prune of superseded markers (claim already durable)
      entries.filter(_ < cur).foreach(k =>
        try fs.delete(new Path(dir, prefix + k), false) catch { case _: Exception => () })
      cur
    }
  }

  /** Fill GENERATED ALWAYS AS (expr) and IDENTITY columns on a user
    * write, per the table's schema-header metadata (the standard
    * StructField keys GraftCatalog persists at CREATE):
    *
    *  - generated: any explicit non-NULL value refuses (Spark null-fills
    *    omitted columns, so non-NULL means the user wrote one); the
    *    column is then computed row-wise from the stored expression —
    *    deterministic by the analyzer's own validation, so recomputation
    *    hazards don't arise.
    *  - identity: explicit values refuse unless the spec says BY DEFAULT;
    *    NULL slots fill from a claimed range (start + step * k). The
    *    frame is locally checkpointed FIRST so the count, the claim and
    *    the assignment all see one row set even over a non-deterministic
    *    source — identity writes pay one materialization, documented.
    *
    * MERGE insert legs and table-to-table replication bypass this path
    * deliberately (they carry complete rows); streaming appends and all
    * SQL INSERT/writer paths route through [[commit]] and get it.
    */
  private[graft] def applyColumnGenerators(spark: SparkSession, df: DataFrame,
                                    base: String,
                                    parentSchema: Option[StructType],
                                    enforce: Boolean = true): DataFrame = {
    import org.apache.spark.sql.catalyst.util.{GeneratedColumn, IdentityColumn}
    import org.apache.spark.sql.functions.{col, lit}
    val fields = parentSchema.map(_.fields.toSeq).getOrElse(Nil)
    val gens = fields.filter(f =>
      f.metadata.contains(GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY))
    val idents = fields.filter(IdentityColumn.isIdentityColumn)
    if (gens.isEmpty && idents.isEmpty) return df
    var out = df
    gens.foreach { f =>
      if (enforce && out.columns.contains(f.name) &&
          !out.filter(out(f.name).isNotNull).isEmpty)
        throw new IllegalArgumentException(
          s"column ${f.name} is GENERATED ALWAYS AS (...) - explicit " +
            "values are not accepted; omit the column")
      val e = f.metadata.getString(
        GeneratedColumn.GENERATION_EXPRESSION_METADATA_KEY)
      out = out.withColumn(f.name,
        org.apache.spark.sql.functions.expr(e).cast(f.dataType))
    }
    idents.foreach { f =>
      val spec = IdentityColumn.getIdentityInfo(f).get
      val present = out.columns.contains(f.name)
      val withCol =
        if (present) out
        else out.withColumn(f.name, lit(null).cast(f.dataType))
      val snap = withCol.localCheckpoint()
      // The ALWAYS refusal checks the CHECKPOINTED frame — the same rows
      // the fill and the write will see. Checking the pre-checkpoint
      // plan would re-execute it, and a non-deterministic source could
      // pass an all-NULL check yet materialize explicit values (the
      // check-vs-commit race the CHECK-constraint path also closes by
      // validating committed rows).
      if (enforce && present && !spec.isAllowExplicitInsert &&
          !snap.filter(snap(f.name).isNotNull).isEmpty)
        throw new IllegalArgumentException(
          s"column ${f.name} is GENERATED ALWAYS AS IDENTITY - explicit " +
            "values are not accepted; omit the column (or declare it " +
            "GENERATED BY DEFAULT)")
      val nulls = snap.filter(snap(f.name).isNull)
      val n = nulls.count()
      if (n == 0L) { out = snap }
      else {
        val k0 = claimIdentityRange(base, f.name, n)
        val idxField = "__graft_identity_idx"
        val indexed = spark.createDataFrame(
          nulls.rdd.zipWithIndex().map { case (r, i) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
          },
          nulls.schema.add(idxField, org.apache.spark.sql.types.LongType))
        val filled = indexed
          .withColumn(f.name,
            (lit(spec.getStart) +
              lit(spec.getStep) * (lit(k0) + col(idxField))).cast(f.dataType))
          .drop(idxField)
        out = snap.filter(snap(f.name).isNotNull).unionByName(filled)
      }
    }
    out
  }

  /** `applyGenerators = false` is for carriers of COMPLETE rows (table
    * replication, upsert snapshot swaps): their frames legitimately hold
    * values for identity/generated columns that ordinary user writes
    * must not supply.
    */
  def commit(spark: SparkSession, df: DataFrame, base: String,
             mode: String = "append", sortCols: Seq[String] = Nil,
             applyGenerators: Boolean = true): Long = {
    // A mode may carry a ":<tag>" suffix (e.g. "append:v12" for a
    // materialized view recording its source watermark) — the tag rides
    // the manifest header, so it is exactly as durable and atomic as the
    // commit itself.
    val base0 = mode.takeWhile(_ != ':')
    require(base0 == "append" || base0 == "overwrite", s"unknown mode $mode")
    // Field-id tracking engages for NEW tables and stays on for tables
    // already carrying a schema header; legacy (header-less) tables keep
    // their name-based path so their id-less files never meet an id read.
    val vs0 = versions(base)
    val parentM = if (vs0.isEmpty) None else Some(readManifest(base, vs0.max))
    val parentSchema = parentM.flatMap(_.schema)
    val tracked = vs0.isEmpty || parentSchema.isDefined
    val parentLast = parentM.map(mintFloor(base, _)).getOrElse(0L)
    // `_row_id` is engine-assigned on lineage tables — a user frame
    // carrying one would pollute the id space (and withFieldIds would
    // leak the reserved name into the table schema). Internal carriers
    // (compact, applyRowChanges) write through writeBatch, never here.
    require(!(df.columns.contains(RowIdCol) && rowLineageEnabled(base)),
      s"column $RowIdCol is reserved on a row-lineage table - ids are " +
        "engine-assigned; drop the column (readLineage surfaces it)")
    val dfG =
      if (applyGenerators) applyColumnGenerators(spark, df, base, parentSchema)
      else df
    val (toWrite, tableSchema, newLast) =
      if (tracked) withFieldIds(dfG, parentSchema,
        keepParentFields = base0 == "append", parentLastId = parentLast)
      else (dfG, null, 0L)
    val newFiles = writeBatch(toWrite, base, sortCols, checkNewData = true)
    val committed = publish(base, newFiles, Nil, mode, parent =>
      if (base0 == "append" && parent > 0) {
        val p = readManifest(base, parent)
        (p.files, p.dvs, p.eqs)
      } else (Nil, Nil, Nil),
      schemaFor = if (!tracked) null else _ => Some(tableSchema.json),
      // Floored at the RESOLVED parent's recorded id: if a concurrent
      // alter minted past our pre-lock snapshot, the retried publish must
      // not write a REGRESSED header (the schema itself stays the
      // single-writer contract; the id floor at least remains monotone).
      lastIdFor = if (!tracked) null else parent =>
        Some(newLast.max(
          if (parent <= 0) 0L else mintFloor(base, readManifest(base, parent)))))
    val v = maybeAutoBinpack(spark, base, committed, sortCols)
    maybeAutoExpire(base)
    v
  }

  /** Auto-retention hook honoring `history.expire.max-age-ms` /
    * `history.expire.min-snapshots-to-keep`
    * ([[graft.connector.TableProps]]): when either is set, the
    * committing writer expires history afterwards — the retention bound
    * an external scheduler would otherwise have to enforce, completing
    * the auto-maintenance family (auto-fold, auto-binpack). Tags and
    * branch forks survive exactly as in a manual [[expire]]; failures
    * are non-fatal (the data commit is already durable; stale history
    * merely waits for the next commit). Why it is SAFE to run unlocked
    * after every commit: expire never touches the newest `keepLast >= 1`
    * manifests (so a racing reader/committer's parent resolution is
    * unaffected) and sweeps only files referenced by NO surviving
    * manifest and no branch head.
    */
  /** The newest committed version's schema header (None for legacy
    * header-less tables or empty trees) — what DML layers consult for
    * column semantics (identity/generated metadata) that Spark's V2
    * column conversion does not reliably carry into plan attributes.
    */
  private[graft] def headSchema(base: String): Option[StructType] = {
    val vs = versions(base)
    if (vs.isEmpty) None else readManifest(base, vs.max).schema
  }

  /** Parse (and validate) the auto-retention properties: returns
    * None when neither is set, Some((maxAge, keepLast)) otherwise;
    * throws IllegalArgumentException on malformed values. Public to the
    * connector so SET TBLPROPERTIES can refuse bad values at DDL time —
    * the one moment an error can still reach the user who typed them.
    */
  private[graft] def parseRetentionProps(props: Map[String, String])
      : Option[(Option[Long], Int)] = {
    val ageRaw = props.get(graft.connector.TableProps.ExpireMaxAgeMs)
    val keepRaw = props.get(graft.connector.TableProps.ExpireMinSnapshots)
    if (ageRaw.isEmpty && keepRaw.isEmpty) return None
    val maxAge = ageRaw.map { raw =>
      val a =
        try raw.trim.toLong
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"table property history.expire.max-age-ms must be a " +
              s"millisecond count, got '$raw'")
        }
      require(a >= 0, s"history.expire.max-age-ms must be >= 0, got $a")
      a
    }
    val keepLast = keepRaw.map { raw =>
      val k =
        try raw.trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"table property history.expire.min-snapshots-to-keep must " +
              s"be an integer, got '$raw'")
        }
      require(k >= 1,
        s"history.expire.min-snapshots-to-keep must be >= 1, got $k")
      k
    }.getOrElse(1)
    Some((maxAge, keepLast))
  }

  private[ingest] def maybeAutoExpire(base: String): Unit =
    // The WHOLE hook — property parse included — is warn-and-skip: it
    // runs after publish() has made the commit durable, so any throw
    // from here reports a failed write that actually committed and a
    // retry double-writes. Malformed values are refused at SET
    // TBLPROPERTIES time (GraftCatalog.alterTable); values that slipped
    // in through a path-level TableProps.write merely log.
    try parseRetentionProps(graft.connector.TableProps.read(base)).foreach {
      case (maxAge, keepLast) => expire(base, keepLast, maxAge)
    } catch { case e: Exception =>
      System.err.println(
        s"[graft] auto expire on $base skipped (will retry on the next " +
          s"commit): ${e.getMessage}")
    }

  /** A written-but-unpublished batch: the two-phase seam atomic RTAS
    * (`CREATE OR REPLACE TABLE ... AS SELECT`) needs — data files land
    * under the table's data dir (unreferenced, invisible to every
    * reader) at write time, and the single manifest publish at commit
    * time makes schema + content visible together. Abort = delete the
    * batch dir; nothing ever referenced it.
    */
  private[graft] case class StagedWrite(base: String, files: Seq[String],
                                        schema: StructType, newLast: Long)

  /** Phase 1 of atomic RTAS: write the data as an unpublished batch. The
    * new schema era minted like any overwrite commit (names matching the
    * current parent keep their ids; fresh names mint above the floor —
    * the floor re-maxes against the TRUE parent inside publish).
    */
  private[graft] def stageWrite(spark: SparkSession, df: DataFrame,
                                base: String,
                                sortCols: Seq[String] = Nil): StagedWrite = {
    val vs0 = versions(base)
    val parentM = if (vs0.isEmpty) None else Some(readManifest(base, vs0.max))
    val parentSchema = parentM.flatMap(_.schema)
    val parentLast = parentM.map(mintFloor(base, _)).getOrElse(0L)
    // Mirror commit's reserved-name refusal: an RTAS whose SELECT emits
    // `_row_id` onto a lineage-enabled REPLACE target would write it as a
    // physical column, making user-supplied values authoritative lineage
    // ids (assignRowIdRanges skips files whose footer carries the name) —
    // colliding with ledger-assigned ids.
    require(!(df.columns.contains(RowIdCol) && rowLineageEnabled(base)),
      s"column $RowIdCol is reserved on a row-lineage table - ids are " +
        "engine-assigned; drop the column (readLineage surfaces it)")
    val (toWrite, tableSchema, newLast) = withFieldIds(df, parentSchema,
      keepParentFields = false, parentLastId = parentLast)
    val files = writeBatch(toWrite, base, sortCols, checkNewData = true)
    StagedWrite(base, files, tableSchema, newLast)
  }

  /** Phase 2: the atomic publish. `create = true` = RTAS-create
    * semantics — a concurrent CREATE of the same name loses (the commit
    * refuses rather than silently appending a v2 over the winner).
    *
    * Mode taxonomy matters for CDC: `rtas-create` is the table's FIRST
    * content — row-attributable, so the change feed delivers it as
    * inserts and incremental append scans deliver its files. A
    * `replace-table` redefines content (and usually schema) WHOLESALE —
    * no row-level attribution exists, so the change feed refuses loudly
    * across it (the rollback stance) and append scans skip it like any
    * replacement.
    */
  private[graft] def publishStaged(sw: StagedWrite, create: Boolean): Long = {
    val mode = if (create) "rtas-create" else "replace-table"
    // Lineage ranges were already assigned by writeBatch (stageWrite
    // writes through it) — a second assignRowIdRanges here would give
    // each staged file two conflicting sidecar entries, leaving the
    // served `_row_id` values to directory-listing order.
    publish(sw.base, sw.files, Nil, mode,
      parent => {
        if (create && parent != 0)
          throw new java.util.ConcurrentModificationException(
            s"staged CREATE of ${sw.base} lost to a concurrent create " +
              "(table now exists); use CREATE OR REPLACE to take over")
        (Nil, Nil, Nil)
      },
      schemaFor = _ => Some(sw.schema.json),
      lastIdFor = parent => Some(sw.newLast.max(
        if (parent <= 0) 0L else mintFloor(sw.base, readManifest(sw.base, parent)))))
  }

  /** Abort of a staged write: remove the (never-referenced) batch dir. */
  private[graft] def abortStaged(sw: StagedWrite): Unit =
    if (sw.files.nonEmpty)
      fsFor(sw.base).delete(new Path(sw.files.head).getParent, true)

  /** Auto-maintenance hook honoring `write.binpack.max-small-files`
    * ([[graft.connector.TableProps]]): after an append/overwrite commit,
    * when the live file set holds MORE than the bound's worth of files
    * below `write.binpack.small-bytes` (default 32 MiB), the committing
    * writer binpacks them — Delta's auto-optimize shape, bounding the
    * small-file debt a streaming ingest accretes without an external
    * scheduler. The rewrite targets ~4× the small-file threshold per
    * output file; when the table is smaller than that, the single merged
    * output stays "small", and a rewrite only fires while it can REDUCE
    * the small-file count (output target < inputs) — so even max=0 on a
    * tiny table settles at one merged file instead of re-binpacking it
    * on every commit. Same race posture as
    * [[maybeConvertEq]]: the data
    * commit is already durable; a lost compaction race defers to the
    * next commit.
    */
  private[ingest] def maybeAutoBinpack(spark: SparkSession, base: String,
                               committed: Long, sortCols: Seq[String]): Long = {
    val props = graft.connector.TableProps.read(base)
    props.get(graft.connector.TableProps.BinpackMaxSmallFiles) match {
      case None => committed
      case Some(raw) =>
        val max =
          try raw.trim.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"table property write.binpack.max-small-files must be an " +
                s"integer, got '$raw'")
          }
        require(max >= 0, s"write.binpack.max-small-files must be >= 0, got $max")
        val smallBytes = props.get(graft.connector.TableProps.BinpackSmallBytes)
          .map { raw =>
            try raw.trim.toLong
            catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"table property write.binpack.small-bytes must be a byte " +
                  s"count, got '$raw'")
            }
          }.getOrElse(32L << 20)
        require(smallBytes > 0,
          s"write.binpack.small-bytes must be > 0, got $smallBytes")
        val fs = fsFor(base)
        val sizes = readManifest(base, committed).files.flatMap { f =>
          try Some(fs.getFileStatus(new Path(f)).getLen)
          catch { case _: Exception => None }
        }.filter(_ < smallBytes)
        val numFiles = math.max(1L, sizes.sum / (smallBytes * 4)).toInt
        // Second guard: a rewrite that cannot REDUCE the small-file count
        // (target output count >= inputs — e.g. max=0 on a table whose
        // whole content is one still-small merged file) would re-trigger
        // on every commit while accomplishing nothing; skip until fresh
        // debt makes merging productive.
        if (sizes.size <= max || numFiles >= sizes.size) committed
        else {
          try compact(spark, base, numFiles, sortCols,
            onlySmallerThan = Some(smallBytes))
          catch { case e: java.util.ConcurrentModificationException =>
            System.err.println(
              s"[graft] auto binpack on $base lost a commit race (will " +
                s"retry on the next commit): ${e.getMessage}")
            committed
          }
        }
    }
  }

  /** Register EXISTING parquet files as a new snapshot — zero-copy
    * migration (Iceberg's add_files/migrate): the manifest records the
    * foreign files' absolute paths, no byte is read beyond a schema
    * probe, no byte is written beyond the manifest. The onboarding path
    * for a 100 TB directory tree: adopting it costs a listing + one
    * metadata commit, not a rewrite.
    *
    * Contract and degradations, all deliberate:
    *  - the table runs in NAME-resolved (legacy, header-less) mode —
    *    foreign footers carry no graft field ids, and publishing an
    *    id-carrying schema header over id-less files would break
    *    id-based reads. Rename/drop evolution therefore refuses (as on
    *    any legacy table) until the data is recommitted;
    *  - appending into an id-TRACKED table refuses for the same reason;
    *  - foreign files have no stats sidecars: planning-time pruning
    *    keeps them (conservative) and metadata aggregates fall back to
    *    real scans — correctness never depends on stats existing;
    *  - [[expire]]/[[removeOrphans]] sweep only under `<base>/data/`, so
    *    adopted files are never deleted by maintenance (they remain
    *    owned by their producer); a [[compact]] rewrites them into
    *    managed, stats-carrying files under the table and retires the
    *    foreign references from the live manifest.
    *
    * Returns the new version. `paths` may be files or directories
    * (listed non-recursively for `.parquet` files).
    */
  /** Zero-copy SHALLOW CLONE: `dst` becomes a new table whose v1
    * manifest references `src`'s data files (at `version`, default head)
    * by ABSOLUTE path — no byte of data copied, the Delta
    * `CREATE TABLE ... SHALLOW CLONE` / dev-test-branch primitive. The
    * clone then diverges freely: appends land under dst's own tree,
    * DV/equality deletes reference the shared files by their relocation-
    * stable rel-keys, and a `compact` graduates shared data into
    * dst-owned files (the [[addFiles]] adoption physics, but keeping
    * field-id schemas — the source's schema header travels with the
    * clone, so era binding and type widening history keep working).
    *
    * Safety properties, inherited rather than re-implemented:
    *  - dst maintenance ([[expire]]/[[removeOrphans]]) sweeps only under
    *    `<dst>/data/`, so the shared source files are never deleted;
    *  - per-batch stats sidecars are discovered from each data file's
    *    OWN directory, so planning-time pruning and metadata aggregates
    *    keep working through the absolute paths;
    *  - src `expire` CAN delete files the clone still references (same
    *    contract as Delta: retention on the source governs clones) —
    *    clone from a tagged version when the source must keep it.
    *
    * Refuses: an existing dst table (clone creates, never merges), and a
    * source version with outstanding DV/equality deletes (their sidecar
    * files live in src's history and would couple the clone to src's
    * MUTABLE delete state — compact first; data files are immutable, so
    * sharing those is safe).
    */
  def clone(spark: SparkSession, src: String, dst: String,
            version: Option[Long] = None): Long = {
    val vs = versions(src)
    require(vs.nonEmpty, s"clone source $src has no committed versions")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"clone source version $v does not exist (have ${vs.sorted.mkString(",")})")
    require(versions(dst).isEmpty, s"clone target $dst already exists")
    val m = readManifest(src, v)
    require(m.dvs.isEmpty && m.eqs.isEmpty,
      s"source version $v carries outstanding row-level deletes - " +
        "compact the source first (a clone must not reference another " +
        "table's mutable delete sidecars)")
    // rel-key uniqueness is a src invariant, but re-check against the
    // clone's own delete machinery before committing to it
    val dupKeys = m.files.map(relKey).groupBy(identity)
      .collect { case (k, fs) if fs.size > 1 => k }
    require(dupKeys.isEmpty,
      s"source files collide on rel-keys ${dupKeys.take(3).mkString(", ")}")
    // carry table properties (CHECK constraints, clustering, retention)
    // plus lineage; dst can diverge them with ALTER TABLE SET afterwards
    val srcProps = graft.connector.TableProps.read(src)
    val out = publish(dst, m.files, Nil, mode = "clone",
      carried = _ => (Nil, Nil, Nil),
      schemaFor = _ => m.schema.map(_.json),
      lastIdFor = _ => m.lastColumnId)
    graft.connector.TableProps.write(dst,
      srcProps + ("clone.source" -> s"$src@$v"))
    // An identity table's allocation ledger must travel with the clone:
    // the carried rows hold already-allocated values, and a dst ledger
    // restarting at zero would re-issue them on the first insert.
    val srcSeq = new Path(src, "_idseq")
    val srcFs = fsFor(src)
    if (srcFs.exists(srcSeq)) {
      val dstFs = fsFor(dst)
      val dstSeq = new Path(dst, "_idseq")
      dstFs.mkdirs(dstSeq)
      listDir(srcFs, srcSeq).foreach { st =>
        try writeStringNew(dstFs, new Path(dstSeq, st.getPath.getName), "")
        catch { case _: Exception => () } // marker exists = already carried
      }
    }
    // Row-lineage state travels too: the clone shares the source's data
    // files BY PATH, so their metadata id assignments (keyed by relKey)
    // must resolve at the destination; the `_row_id` ledger high-water
    // already traveled with the _idseq markers above, so post-clone
    // writes on either side can never re-issue a carried id.
    val srcRids = rowIdsDir(src)
    if (srcFs.exists(srcRids)) {
      val dstFs = fsFor(dst)
      dstFs.mkdirs(rowIdsDir(dst))
      listDir(srcFs, srcRids).foreach { st =>
        try writeStringNew(dstFs, new Path(rowIdsDir(dst), st.getPath.getName),
          if (st.getLen == 0) "" else readString(srcFs, st.getPath))
        catch { case _: Exception => () } // exists = already carried
      }
    }
    out
  }

  def addFiles(spark: SparkSession, base: String, paths: Seq[String],
               mode: String = "append"): Long = {
    require(paths.nonEmpty, "addFiles needs at least one path")
    val base0 = mode.takeWhile(_ != ':')
    require(base0 == "append" || base0 == "overwrite", s"unknown mode $mode")
    val files = paths.flatMap { p =>
      val fs = fsFor(p)
      val path = new Path(p)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        listDir(fs, path).filter(_.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted
      else Seq(path.toString)
    }
    require(files.nonEmpty, s"no parquet files under ${paths.mkString(",")}")
    // Schema compatibility probe (footers only, no data read): the
    // adopted files must agree among themselves and with any existing
    // table state by NAME.
    val adopted = spark.read.parquet(files: _*).schema
    val vs0 = versions(base)
    if (vs0.nonEmpty) {
      val m = readManifest(base, vs0.max)
      require(m.schema.isEmpty,
        "cannot add foreign (field-id-less) files to a field-id-tracked " +
          "table - their footers carry no ids; write through commit() or " +
          "adopt into a fresh table")
      if (base0 == "append" && m.files.nonEmpty) {
        val existing = readWithSchema(spark, None, m.files).schema
        require(adopted.fieldNames.sorted.sameElements(existing.fieldNames.sorted),
          s"adopted schema ${adopted.fieldNames.mkString(",")} does not match " +
            s"the table's ${existing.fieldNames.mkString(",")}")
      }
    }
    // DV coordinates and eq-delete refs identify data files by their
    // last-3-segment relative key ([[relKey]]) so they survive table
    // relocation — but adopted foreign paths are arbitrary, and two live
    // files sharing that key would let a row-level delete referencing one
    // silently hide same-position/same-key rows in the other. Refuse
    // adoption on collision; checked INSIDE the claim against the actual
    // carried parent so a concurrent append cannot slip a collision in.
    def requireUniqueRelKeys(live: Seq[String]): Unit = {
      val dups = live.map(relKey).groupBy(identity)
        .collect { case (k, fs) if fs.size > 1 => k }
      require(dups.isEmpty,
        s"addFiles would create rel-key collision(s) on " +
          s"${dups.take(3).mkString(", ")} - row-level deletes identify " +
          "files by their last 3 path segments; rename the source " +
          "files/directories so the keys are unique")
    }
    publish(base, files, Nil, mode, parent =>
      if (base0 == "append" && parent > 0) {
        val p = readManifest(base, parent)
        requireUniqueRelKeys(p.files ++ files)
        (p.files, p.dvs, p.eqs)
      } else { requireUniqueRelKeys(files); (Nil, Nil, Nil) },
      // explicit no-header: the adopted table is name-resolved
      schemaFor = _ => None, lastIdFor = _ => None)
  }

  /** The mode string a version was committed with (including any ":<tag>"
    * suffix) — public so MV refresh watermarks and ops tooling can read
    * lineage metadata without parsing manifests.
    */
  def modeOf(base: String, v: Long): String = readManifest(base, v).mode

  /** The live file list of a version — public so tests and external
    * compactors can reason about file-granular behavior.
    */
  def liveFiles(base: String, v: Long): Seq[String] = readManifest(base, v).files
}
