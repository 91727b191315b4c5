package graft.ingest

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.charset.StandardCharsets.UTF_8

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

  /** Commit-serialization seam. The default strategy is the lock FILE
    * below ([[withCommitLock]]) — correct wherever
    * `create(overwrite=false)` is exclusive and rename refuses an
    * existing destination. Supported-store matrix for the DEFAULT
    * strategy:
    *
    *  - HDFS, ABFS (`abfss://`), GCS (`gs://`): exclusive create AND
    *    atomic rename-no-overwrite — the full CAS holds.
    *  - local `file://` (incl. tests): exclusive create is check-then-act
    *    in RawLocalFileSystem, but rename-fails-on-existing makes the
    *    manifest's appearance at its versioned name the single-winner
    *    commit point — holds.
    *  - plain S3 (`s3://`, `s3a://`, `s3n://`), OSS: NEITHER primitive is
    *    exclusive — a lost update would be SILENT. Commits to these
    *    schemes therefore fail LOUDLY up front (conf
    *    `spark.graft.commit.nonAtomicSchemes`, default "s3,s3a,s3n,oss")
    *    unless the deployment either (a) plugs an external lock via
    *    `spark.graft.commit.lockStrategy` = FQCN of a [[CommitLock]]
    *    (DynamoDB-style lock table, S3 conditional writes, a catalog
    *    service — Iceberg's answer), or (b) sets
    *    `spark.graft.commit.allowNonAtomicStore=true`, asserting that
    *    writer serialization exists OUTSIDE this library (single-writer
    *    pipelines). With a correct external lock the whole
    *    list→compose→rename sequence is serialized, so rename atomicity
    *    is no longer load-bearing against other lock holders.
    */
  trait CommitLock {
    def withLock[T](base: String)(body: => T): T
  }

  /** ALL metadata IO goes through the Hadoop FileSystem resolved from the
    * base URI's scheme — the same registry seam BlockWriter's data path
    * uses — so the manifest/lock/tag layer runs unchanged on `file://`,
    * the `graftfs://` test scheme, or a real object-store connector
    * (`abfss://`, `s3a://`), mirroring the reference's storage-adapter
    * role (/root/reference/azureStorageAdapter.go:34-147). The conf comes
    * from the active Spark session (connectors and test schemes register
    * there); outside a session the default Hadoop conf still serves
    * `file://`.
    *
    * Atomicity notes per operation, in object-store terms: the commit
    * lock is create-no-overwrite (a true CAS on HDFS/ABFS/GCS; S3 needs
    * its conditional-write mode or an external lock table); the manifest
    * publish is write-temp + rename (atomic on HDFS/ABFS; copy+delete on
    * S3, acceptable because it happens under the lock).
    */
  private def hadoopConf =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsFor(base: String): FileSystem =
    new Path(base).getFileSystem(hadoopConf) match {
      // Metadata bypasses the client-side checksum wrapper (local FS):
      // KB-scale manifests gain nothing from .crc sidecars, and a manifest
      // written by another tool (legacy trees, external writers) would
      // fail checksum verification against a stale sidecar. HDFS/object
      // stores are not ChecksumFileSystems — unaffected.
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }

  private def snapDir(base: String) = new Path(base, "_snapshots")
  private def dataDir(base: String) = new Path(base, "data")
  private def manifestFile(base: String, v: Long) =
    new Path(snapDir(base), f"v$v%08d.manifest")

  private def listDir(fs: FileSystem, dir: Path): Seq[FileStatus] =
    if (!fs.exists(dir)) Nil else fs.listStatus(dir).toSeq

  private def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), UTF_8)
    finally in.close()
  }

  /** Create-new + write + close; the create(overwrite=false) is the CAS
    * primitive (throws when the path exists).
    */
  private def writeStringNew(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, false)
    try out.write(s.getBytes(UTF_8)) finally out.close()
  }

  /** Scheme/authority-insensitive canonical form for comparing paths that
    * arrive from different producers (manifest lines, FileSystem listings,
    * `input_file_name()` URIs) — `file:/x`, `file:///x` and `/x` all
    * compare equal as `/x`. Comparison only; never used for IO.
    */
  private def uriPath(p: String): String = {
    val u = try new java.net.URI(p) catch { case _: Exception => null }
    if (u == null || u.getPath == null || u.getPath.isEmpty) p else u.getPath
  }

  private def versionStatuses(base: String): Seq[FileStatus] =
    listDir(fsFor(base), snapDir(base))
      .filter(_.getPath.getName.matches("v\\d{8}\\.manifest"))

  private def versionOf(name: String): Long =
    name.stripPrefix("v").stripSuffix(".manifest").toLong

  /** Committed versions, ascending. Zero-length manifests are in-flight
    * claims (see [[commit]]) and are not listed.
    */
  def versions(base: String): Seq[Long] =
    versionStatuses(base).filter(_.getLen > 0)
      .map(s => versionOf(s.getPath.getName)).sorted

  private case class Manifest(version: Long, parent: Long, mode: String,
                              files: Seq[String], dvs: Seq[String],
                              eqs: Seq[String],
                              schema: Option[org.apache.spark.sql.types.StructType],
                              lastColumnId: Option[Long],
                              commitTs: Option[Long])

  /** Manifest lines are base-relative; everything in memory is absolute.
    * Relativize at the WRITE boundary, resolve at the READ boundary, so
    * all internal set logic (carried files, delete/compact diffs, vacuum)
    * compares one consistent form.
    */
  private def relativize(base: String, path: String): String = {
    // Compare in uriPath form so a fully-qualified listing entry
    // (`file:/tmp/t/data/...`) still relativizes against a bare base
    // (`/tmp/t`) — and vice versa.
    val b = uriPath(new Path(base).toString)
    val p = uriPath(path)
    if (p.startsWith(b + "/")) p.substring(b.length + 1) else path
  }

  private def resolve(base: String, line: String): String =
    // Absolute (legacy manifests, or a foreign-scheme URI) passes through;
    // relative lines resolve against the base — carrying its scheme, which
    // is what makes the tree relocatable ACROSS filesystems too.
    if (line.startsWith("/") || line.contains(":/")) line
    else new Path(base, line).toString

  /** Deletion-vector manifest lines are tagged `dv:`, equality-delete key
    * files `eq:`; every other line is a data file. Old manifests have no
    * tagged lines and parse unchanged.
    */
  private def readManifest(base: String, v: Long): Manifest = {
    val lines = readString(fsFor(base), manifestFile(base, v)).split("\n", -1).toSeq
    val header = lines.head.split("\t").map { kv =>
      val Array(k, value) = kv.split("=", 2); k -> value
    }.toMap
    val body = lines.tail.filter(_.nonEmpty)
    val eqLines = body.filter(_.startsWith("eq:"))
    val (dvLines, dataLines) =
      body.filterNot(_.startsWith("eq:")).partition(_.startsWith("dv:"))
    Manifest(header("version").toLong, header("parent").toLong,
      header("mode"), dataLines.map(resolve(base, _)),
      dvLines.map(l => resolve(base, l.stripPrefix("dv:"))),
      eqLines.map(l => resolve(base, l.stripPrefix("eq:"))),
      header.get("schema").map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]),
      header.get("lastColumnId").map(_.toLong),
      header.get("commitTs").map(_.toLong))
  }

  /** The first (header) line of a manifest without materializing the file
    * list — `versionAt` scans every version's header, so at 10⁵-line
    * manifests reading whole files would turn timestamp time travel into
    * an O(versions × manifest-size) read. A '\n' byte can never occur
    * inside a UTF-8 multi-byte sequence, so splitting on the raw byte
    * before decoding is safe for any column names the schema JSON carries.
    */
  private def readHeaderLine(fs: FileSystem, p: Path): String = {
    val in = new java.io.BufferedInputStream(fs.open(p), 64 * 1024)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      var c = in.read()
      while (c != -1 && c != '\n') { buf.write(c); c = in.read() }
      new String(buf.toByteArray, UTF_8)
    } finally in.close()
  }

  /** The wall-clock commit instant recorded in a version's manifest
    * header, if present (manifests written before commitTs existed have
    * none).
    */
  private def commitTsOf(base: String, v: Long): Option[Long] =
    readHeaderLine(fsFor(base), manifestFile(base, v))
      .split("\t").iterator
      .map(_.split("=", 2))
      .collectFirst { case Array("commitTs", value) => value.toLong }

  /** The highest field id this table has EVER assigned, as of `m` —
    * Iceberg's last-column-id. Recorded in the manifest header from the
    * first id-minting commit onward (so it survives [[expire]] pruning
    * history and DROP COLUMN removing the id from the schema); manifests
    * from before the header derive it from their era schema, which is
    * exact as long as no high-id column was dropped before the header
    * existed.
    */
  private def lastColumnIdOf(m: Manifest): Option[Long] =
    m.lastColumnId.orElse(m.schema.map(s => (0L +: s.fields.map(fieldId).toSeq).max))

  /** The id floor for MINTING at `m`: the recorded last-column-id, or —
    * for pre-header tables only — the max id over every SURVIVING
    * manifest's era schema, so a high id dropped before the header
    * existed stays burned as long as any manifest remembers it. Paid
    * once: the first minting commit writes the header and the scan never
    * runs again.
    */
  private def mintFloor(base: String, m: Manifest): Long =
    m.lastColumnId.getOrElse {
      versions(base).iterator
        .flatMap(v => readManifest(base, v).schema)
        .flatMap(_.fields.map(fieldId))
        .foldLeft(0L)(_ max _)
    }

  /** Enforce the table's `write.check.*` CHECK constraints
    * ([[graft.connector.TableProps.CheckPrefix]]) on NEW data: a write
    * refuses when any row makes a predicate FALSE (SQL CHECK semantics —
    * NULL passes). Runs over the JUST-WRITTEN batch files, never the
    * input plan: re-executing the plan for the check would let a
    * non-deterministic source (rand(), a re-read of mutating external
    * input) pass the probe yet commit different, violating rows — the
    * checked rows must provably BE the committed rows (Delta enforces
    * invariants during the write for the same reason). Called by every
    * new-data path via [[writeBatch]]'s `checkNewData`; maintenance
    * rewrites (compact) deliberately skip it so a later-added constraint
    * can never brick compaction of pre-constraint data. Cost: one
    * count-limited re-read of the new batch per constraint, zero when no
    * constraint is set.
    */
  private def enforceChecks(spark: SparkSession, base: String,
                            files: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val checks = graft.connector.TableProps.checks(base)
    if (checks.isEmpty || files.isEmpty) return
    val df = spark.read.parquet(files: _*)
    for ((name, pred) <- checks) {
      val violating =
        try df.filter(coalesce(expr(pred), lit(true)) === lit(false))
        catch { case e: Exception =>
          throw new IllegalArgumentException(
            s"CHECK constraint '$name' ($pred) cannot be evaluated " +
              s"against the written schema: ${e.getMessage}")
        }
      val sample = violating.limit(3).collect()
      if (sample.nonEmpty)
        throw new IllegalArgumentException(
          s"CHECK constraint '$name' violated by the write: rows where " +
            s"NOT ($pred), e.g. ${sample.mkString("; ")}")
    }
  }

  /** Write `df`'s files under a fresh uncommitted batch dir.
    * `checkNewData = true` (every new-data path) validates the written
    * files against the table's CHECK constraints before returning —
    * a violation deletes the batch and throws, so nothing reaches
    * publish; maintenance rewrites pass false.
    */
  private def writeBatch(df: DataFrame, base: String, sortCols: Seq[String],
                         checkNewData: Boolean = false): Seq[String] = {
    val batchId = java.util.UUID.randomUUID().toString.take(8)
    val batchPath = new Path(dataDir(base), s"b_$batchId")
    // Field ids ride the df's schema metadata into the parquet footers
    // (default-on in Spark, pinned here because id-tracked tables DEPEND
    // on every data file carrying ids).
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    // Table-format physical encoding: timestamps are INT64 micros (the
    // Iceberg spec's choice), never legacy INT96 — INT96 carries no
    // usable footer stats, so it would silently disable both row-group
    // skipping and [[FileStats]] planning-time pruning on time columns.
    // SCOPED to this write (save/restore): leaking it session-wide would
    // change the encoding of every unrelated parquet write on the session.
    // A racing writer that sees the restored value merely writes INT96 —
    // stats absent for its ts columns, pruning conservative, rows correct.
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = df.sparkSession.conf.getOption(tsKey)
    df.sparkSession.conf.set(tsKey, "TIMESTAMP_MICROS")
    val clustered =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*) else df
    try clustered.write.parquet(batchPath.toString)
    finally prevTs match {
      case Some(v) => df.sparkSession.conf.set(tsKey, v)
      case None    => df.sparkSession.conf.unset(tsKey)
    }
    val files = listParquet(df.sparkSession, batchPath)
    if (checkNewData) {
      try enforceChecks(df.sparkSession, base, files)
      catch { case e: Throwable => fsFor(base).delete(batchPath, true); throw e }
    }
    // Commit-time footer stats → batch-dir sidecar, so filtered reads
    // ([[readWhere]], the `graft` connector) prune files at PLANNING time.
    // Best-effort by design: a failed footer read costs pruning power,
    // never the commit. NDV sketches ride the same sidecar (one columnar
    // re-read of the just-written batch — `spark.graft.stats.ndv false`
    // opts a latency-critical ingest out; everything degrades to the
    // pre-NDV behavior).
    val ndv =
      if (runtimeConf("spark.graft.stats.ndv", "true").toBoolean)
        FileStats.collectNdv(df.sparkSession, files)
      else Map.empty[String, Map[String, Array[Byte]]]
    // Signed-log2 histogram counts ride beside the NDV sketches
    // (`spark.graft.stats.histograms false` opts out) — they are what
    // lets CBO range selectivity see skew instead of assuming uniformity.
    val hist =
      if (runtimeConf("spark.graft.stats.histograms", "true").toBoolean)
        FileStats.collectHistograms(df.sparkSession, files)
      else Map.empty[String, Map[String, Map[Int, Long]]]
    FileStats.writeSidecar(df.sparkSession.sparkContext.hadoopConfiguration,
      batchPath, files, ndv, hist)
    // Row-lineage assignment (when the table opted in): frames carrying a
    // physical `_row_id` (compaction/merge rewrites) ride their bytes;
    // everything else gets a metadata range per file — footer reads plus
    // one KB-scale sidecar, never a data pass. Runs BEFORE publish so a
    // reader of the committed version always resolves ids.
    if (!df.columns.contains(RowIdCol) && rowLineageEnabled(base))
      assignRowIdRanges(base, files)
    files
  }

  // ---------------------------------------------------------------------
  // Field-id schema tracking (Iceberg's column-identity model via Spark's
  // native parquet field-id support): every column of an id-TRACKED table
  // owns a stable numeric id, written into each parquet footer
  // (`parquet.field.id` metadata + fieldId.write conf) and matched by id
  // at read time (fieldId.read conf + an explicit id-carrying read
  // schema). Names then become labels: [[renameColumn]] and
  // [[dropColumn]] are metadata-only commits that rewrite the CURRENT
  // schema header — old files resolve renamed columns by id, dropped
  // columns simply stop being requested, and time travel reads each era
  // under its own manifest's schema. Tables created before schema headers
  // existed stay name-based end to end (their files carry no ids).
  // ---------------------------------------------------------------------

  private val FieldIdKey = "parquet.field.id"

  import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

  private def fieldId(f: StructField): Long = f.metadata.getLong(FieldIdKey)

  /** Current-era name → field id from a manifest's schema header (empty
    * for legacy header-less tables). The alias guard for name-keyed
    * sidecar stats: after a rename chain that reuses a name, stats a
    * file recorded under that name in an EARLIER era describe a
    * different physical column — consumers pass this map so such stats
    * are ignored (conservative) instead of misread.
    */
  private def eraIds(m: Manifest): Map[String, Long] =
    m.schema.map(_.fields.toSeq.flatMap(f =>
      if (f.metadata.contains(FieldIdKey)) Some(f.name -> fieldId(f)) else None
    ).toMap).getOrElse(Map.empty)

  /** Align `df` to the table's id space: columns matching a parent-schema
    * name keep that field's id, new columns mint fresh ids. Returns the
    * id-attached frame plus the table schema AFTER this commit —
    * `keepParentFields` keeps parent columns absent from `df` in the
    * schema (append semantics: an old column stays readable, null for new
    * files); overwrite replaces the column set. Id assignment reads the
    * parent outside the commit lock, so concurrent commits that both ADD
    * columns can race ids — schema changes are single-writer by contract,
    * same as Iceberg's catalog-serialized schema updates.
    */
  /** `parentLastId` floors fresh-id minting at the table's last-column-id
    * so a NEW column never reuses an id a DROPPED column's files still
    * carry — the current schema's max alone forgets dropped high ids.
    * Returns the frame, the post-commit schema, and the new last id.
    */
  private def withFieldIds(df: DataFrame, parentSchema: Option[StructType],
                           keepParentFields: Boolean,
                           parentLastId: Long): (DataFrame, StructType, Long) = {
    val parentFields = parentSchema.map(_.fields.toSeq).getOrElse(Nil)
    val byName = parentFields.map(f => f.name -> f).toMap
    var next = ((0L +: parentFields.map(fieldId)).max).max(parentLastId)
    val dfFields = df.schema.fields.toSeq.map { f =>
      val parent = byName.get(f.name)
      val id = parent.map(fieldId).getOrElse { next += 1; next }
      // A name-matched field keeps the PARENT's metadata verbatim — the
      // table's truth (identity specs, generation expressions, default
      // values). The incoming frame's metadata is deliberately ignored:
      // a plain INSERT carries bare fields (using them would strip the
      // header's column metadata on the first append after CREATE), and
      // an INSERT ... SELECT from another graft table carries THAT
      // table's specs and ids (using them would silently graft a foreign
      // identity/default onto this column). A genuinely new field gets
      // ONLY its minted id for the same leak reason — column metadata
      // becomes table schema through DDL, never as an insert side
      // effect. (The CREATE path itself goes through the overwrite
      // branch with no parent fields... so its frame IS the DDL schema:
      // see the tableSchema construction below, which keeps dfFields'
      // types while createTable supplies the frame.)
      val meta = parent match {
        case Some(pf) =>
          new MetadataBuilder().withMetadata(pf.metadata)
            .putLong(FieldIdKey, id).build()
        case None if parentFields.isEmpty =>
          // first commit of a new table: the frame's schema IS the DDL
          // schema (createTable passes it), so its metadata is
          // authoritative, not a leak
          new MetadataBuilder().withMetadata(f.metadata)
            .putLong(FieldIdKey, id).build()
        case None =>
          new MetadataBuilder().putLong(FieldIdKey, id).build()
      }
      StructField(f.name, f.dataType, nullable = true, meta)
    }
    val aligned = df.select(dfFields.map(f => col(f.name).as(f.name, f.metadata)): _*)
    val table =
      if (keepParentFields)
        StructType(parentFields.map(pf => dfFields.find(_.name == pf.name).getOrElse(pf)) ++
          dfFields.filterNot(f => byName.contains(f.name)))
      else StructType(dfFields)
    (aligned, table, next)
  }

  /** The current schema of an id-tracked table (None for legacy tables). */
  def currentSchema(base: String): Option[StructType] = {
    val vs = versions(base)
    if (vs.isEmpty) None else readManifest(base, vs.max).schema
  }

  private def readWithSchema(spark: SparkSession, schema: Option[StructType],
                             files: Seq[String],
                             mergeSchema: Boolean = false): DataFrame =
    schema match {
      case Some(s) =>
        // Id-based column resolution: the explicit schema carries the
        // CURRENT names + ids; files written under old names still bind
        // (rename), files missing an id null-fill (late-added column).
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        spark.read.schema(s).parquet(files: _*)
      case None =>
        spark.read.option("mergeSchema", mergeSchema).parquet(files: _*)
    }

  /** Rename a column, metadata-only: one commit rewriting the schema
    * header. Every existing data file keeps its bytes; reads bind the new
    * name to the old field id. Time travel before this commit still sees
    * the old name.
    */
  def renameColumn(base: String, from: String, to: String): Long =
    alterSchema(base, s"alter:rename:$from:$to",
      m => { guardEqKeyColumn(from)(m); guardNameReuse(m, from, to) }) { (s, last) =>
      require(s.fieldNames.contains(from), s"no column $from to rename")
      require(!s.fieldNames.contains(to), s"column $to already exists")
      (StructType(s.fields.map(f => if (f.name == from) f.copy(name = to) else f)), last)
    }

  /** Refuse renaming INTO a name that live data files still carry from
    * an earlier schema era (it was dropped or renamed away while its
    * bytes remain). Reusing such a name would alias two different
    * physical columns under one name in era-mixed scans: Spark's parquet
    * row-group pushdown and any name-keyed stats would then apply one
    * column's statistics to the other's data — silent wrong row-group
    * skipping, the worst failure mode. Detection is sidecar-based (one
    * metadata read at DDL time): a live file recording stats for `to`
    * proves the stale bytes exist. Columns with no stats domain
    * (binary/array/decimal) can evade detection — compact first if a
    * refused name must be reclaimed, which rewrites files under the
    * current era and retires the stale bytes.
    *
    * Renaming a column BACK to a name its own bytes carry (a → b → a) is
    * legitimate and allowed: files recording `to` under `from`'s OWN
    * field id are the same physical column. Pre-round-10 sidecars carry
    * no ids and refuse conservatively — `CALL collect_stats` refreshes
    * them with ids.
    */
  private def guardNameReuse(m: Manifest, from: String, to: String): Unit = {
    val conf = hadoopConf
    val fromId: Option[Long] = m.schema.flatMap(
      _.fields.find(_.name == from).filter(_.metadata.contains(FieldIdKey))
        .map(fieldId))
    val sidecars = m.files.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(conf, d).getOrElse(Map.empty))
      .toMap
    val stale = m.files.exists { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName).exists(_.cols.get(to).exists(c =>
        (c.id, fromId) match {
          case (Some(x), Some(e)) => x != e // same physical column is fine
          case _                  => true   // unprovable — refuse
        }))
    }
    if (stale)
      throw new IllegalStateException(
        s"cannot rename into '$to': live data files still carry a column " +
          "of that name from an earlier schema era, and reusing it would " +
          "alias two physical columns in era-mixed scans (wrong row-group " +
          "skipping); compact() first to rewrite the table under the " +
          "current era, then rename")
  }

  /** ADD COLUMN's half of the stale-name defense: refuse re-adding a
    * name a live file's sidecar still records ID-LESS stats for
    * (pre-field-id sidecars). The fresh column mints a fresh id, so
    * id-CARRYING stale stats can never serve it (`idCompatible`
    * mismatches) — but id-less stats match ANY reader id permissively,
    * and the old physical column's min/max/null counts would then feed
    * the EXACT aggregate pushdown and file pruning for the new column:
    * wrong results, not estimates. `CALL collect_stats` (which rewrites
    * sidecars with current ids) is the documented repair path; after it,
    * the stale entries either vanish (column truly dropped from live
    * files' schema) or carry the old id and become harmless.
    */
  private def guardAddNameReuse(m: Manifest, name: String): Unit = {
    val conf = hadoopConf
    val sidecars = m.files.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(conf, d).getOrElse(Map.empty))
      .toMap
    val stale = m.files.exists { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName)
        .exists(_.cols.get(name).exists(_.id.isEmpty))
    }
    if (stale)
      throw new IllegalStateException(
        s"cannot add column '$name': live data files still carry id-less " +
          "sidecar stats under that name from an earlier schema era, and " +
          "they would serve the new column's pruning and exact aggregate " +
          "pushdown (wrong results); run CALL <cat>.system.collect_stats " +
          "(or compact()) first, then re-add")
  }

  /** Drop a column, metadata-only: the field leaves the schema header, so
    * no read requests it again — the bytes stay in old files for time
    * travel and are reclaimed as their versions expire.
    */
  def dropColumn(base: String, name: String): Long =
    alterSchema(base, s"alter:drop:$name", guardEqKeyColumn(name)) { (s, last) =>
      require(s.fieldNames.contains(name), s"no column $name to drop")
      require(s.fields.length > 1, "cannot drop the last column")
      // last-column-id is UNCHANGED: the dropped id stays burned so no
      // future column can reuse it while old files still carry its bytes
      (StructType(s.fields.filterNot(_.name == name)), last)
    }

  /** Add a nullable column, metadata-only: the field joins the schema
    * header under a freshly-minted field id — no data file is touched, and
    * every existing file null-fills the new column on read (it carries no
    * such id). The additive half of `ALTER TABLE`, symmetric with
    * [[renameColumn]]/[[dropColumn]].
    */
  def addColumn(base: String, name: String,
                dataType: org.apache.spark.sql.types.DataType,
                defaultSql: Option[String] = None): Long =
    // The fresh id must clear the max id EVER assigned, not the current
    // schema's max: after DROP of the highest-id column, current-max+1
    // would REUSE the dropped id, and id-based reads would bind the new
    // column to the dropped column's bytes in old files (type crash at
    // best, silent data resurrection at worst). The persisted
    // last-column-id (resolved against the true parent INSIDE the commit
    // lock, so concurrent adds cannot race to the same id, and monotone
    // through expire/rollback) is the floor — Iceberg's model.
    //
    // `defaultSql` (a constant SQL expression) makes this Iceberg's
    // initial-default / Delta's default-value shape, riding Spark's OWN
    // schema-metadata machinery: EXISTS_DEFAULT is applied by the
    // parquet reader ONLY to files physically missing the column (so
    // pre-add rows surface the default while a real NULL written after
    // the add stays NULL — era-correct with no per-file branching), and
    // CURRENT_DEFAULT is what the analyzer fills into INSERTs that omit
    // the column (catalog route). Validation: the expression must parse,
    // fold to a constant, and cast to the column type.
    alterSchema(base, s"alter:add:$name",
      m => guardAddNameReuse(m, name)) { (s, last) =>
      require(!s.fieldNames.contains(name), s"column $name already exists")
      val mb = new MetadataBuilder().putLong(FieldIdKey, last + 1)
      defaultSql.foreach { sql =>
        val lit =
          try org.apache.spark.sql.SparkSession.active
            .sql(s"SELECT CAST(($sql) AS ${dataType.sql})").head.get(0)
          catch { case e: Exception =>
            throw new IllegalArgumentException(
              s"default for $name must be a constant expression of type " +
                s"${dataType.simpleString}: $sql (${e.getMessage})")
          }
        require(lit != null,
          s"default for $name must not evaluate to NULL - omit the " +
            "default instead (absent columns already read as NULL)")
        mb.putString("CURRENT_DEFAULT", sql)
        mb.putString("EXISTS_DEFAULT", sql)
      }
      (StructType(s.fields :+ StructField(name, dataType, nullable = true,
        mb.build())), last + 1)
    }

  /** Widen a column's type in place, metadata-only (Iceberg's safe type
    * promotions): byte/short/int up the integer ladder to long,
    * float → double, decimal(p,s) → decimal(p',s) with p' > p. The field
    * id is UNCHANGED, so old files keep their narrow physical encoding
    * and read through Spark's parquet read-time type widening under the
    * new header (one scan, no per-era union); time travel reads each era
    * under its own manifest's schema, so a pre-widening version still
    * returns the narrow type. Footer-stats pruning stays sound: all
    * integer widths already share the sidecars' "long" comparison domain
    * and float/double share "double" (decimal columns carry no stats —
    * pruning was already conservative there), so old-file stats compare
    * correctly against wide-domain predicates.
    *
    * A Bloom sidecar on the column is INVALIDATED (deleted): its bits
    * were built from xxhash64 over the narrow read type, and post-widen
    * probes hash the wide type — bit-different, so keeping the index
    * would claim "definitely absent" for files that DO contain the
    * probed value. The delete happens BEFORE the schema commit: a crash
    * (or a failed delete) between the two orders "committed widen +
    * stale narrow-hash index" — silently dropped rows at probe time —
    * whereas "index deleted + widen never landed" only costs pruning
    * power. A cheap pre-validation (current-schema widenability) keeps a
    * bogus widen call from destroying a healthy index; the authoritative
    * re-validation still runs against the true parent inside the commit
    * lock. Dropping the index costs pruning power, never correctness;
    * rebuild with `BloomIndex.build`. Key columns of outstanding
    * equality deletes refuse like rename/drop (compact first) — the
    * delete files persist narrow-typed key values whose join behavior
    * must not change under them.
    */
  def widenColumn(base: String, name: String,
                  to: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    def widens(from: DataType, target: DataType): Boolean = (from, target) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType)            => true
      case (IntegerType, LongType)                        => true
      case (FloatType, DoubleType)                        => true
      case (f: DecimalType, t: DecimalType) =>
        t.scale == f.scale && t.precision > f.precision
      case _ => false
    }
    def check(s: StructType): Unit = {
      val i = s.fieldNames.indexOf(name)
      require(i >= 0, s"no column $name to widen")
      val from = s.fields(i).dataType
      require(widens(from, to),
        s"cannot widen $name from ${from.simpleString} to " +
          s"${to.simpleString} - safe widenings are byte/short/int up " +
          "to long, float to double, and decimal precision growth at " +
          "the same scale")
    }
    // Pre-validate against the current snapshot so an invalid call
    // refuses without touching the index, then invalidate the sidecar
    // ahead of the durable schema change (see Scaladoc for the ordering
    // argument). The eq-key guard runs here too: a widen that the
    // commit-time guard would refuse must not have already destroyed a
    // healthy Bloom index. A concurrent alter between the pre-check and
    // the lock re-validates inside alterSchema.
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val current = readManifest(base, vs.max)
    current.schema.foreach(check)
    guardEqKeyColumn(name)(current)
    val bloom = new Path(BloomIndex.sidecar(base, name))
    val fs = fsFor(base)
    if (fs.exists(bloom)) {
      fs.delete(bloom, true)
      System.err.println(
        s"[graft] widen of $name invalidated its Bloom index sidecar " +
          "(hash domain changed); rebuild with BloomIndex.build")
    }
    alterSchema(base, s"alter:widen:$name", guardEqKeyColumn(name)) {
      (s, last) =>
        check(s)
        (StructType(s.fields.map(f =>
          if (f.name == name) f.copy(dataType = to) else f)), last)
    }
  }

  /** Change (or with None, drop) a column's WRITE default — what future
    * INSERTs that omit the column will fill. The EXISTS default (what
    * pre-add rows read, Iceberg's immutable initial-default) is
    * deliberately untouched: changing it would rewrite history's meaning
    * without rewriting a byte.
    */
  def setColumnDefault(base: String, name: String,
                       defaultSql: Option[String]): Long =
    alterSchema(base, s"alter:default:$name") { (s, last) =>
      val i = s.fieldNames.indexOf(name)
      require(i >= 0, s"no column $name")
      val f = s.fields(i)
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      defaultSql match {
        case Some(sql) =>
          try org.apache.spark.sql.SparkSession.active
            .sql(s"SELECT CAST(($sql) AS ${f.dataType.sql})").head.get(0)
          catch { case e: Exception =>
            throw new IllegalArgumentException(
              s"default for $name must be a constant expression of type " +
                s"${f.dataType.simpleString}: $sql (${e.getMessage})")
          }
          mb.putString("CURRENT_DEFAULT", sql)
        case None => mb.remove("CURRENT_DEFAULT")
      }
      (StructType(s.fields.updated(i, f.copy(metadata = mb.build()))), last)
    }

  /** The newest version committed at or before `tsMillis` (wall-clock
    * time travel — `TIMESTAMP AS OF`). Resolution PREFERS the `commitTs`
    * recorded in each manifest header at publish time: file mtimes are
    * copy-fragile — relocating a table (a supported operation: manifests
    * are base-relative) resets every mtime to the copy instant, which
    * would silently re-date history and resolve timestamps to wrong
    * versions. Manifests from before the header field fall back to mtime
    * (correct until the tree is copied — the documented legacy caveat).
    */
  def versionAt(base: String, tsMillis: Long): Long = {
    // Newest-first walk with EARLY EXIT: publishes serialize under the
    // commit lock, so commitTs is monotone with version and the first
    // (highest) version at or before `ts` is the answer — one header
    // read for a recent timestamp instead of O(versions) metadata RPCs
    // per lookup on an object store. Clock regressions across restarts
    // would break strict monotonicity; the walk then returns the highest
    // version whose recorded instant qualifies, which is still the
    // defensible read ("the table as the newest commit at that time").
    val newestFirst = versionStatuses(base).filter(_.getLen > 0)
      .sortBy(s => -versionOf(s.getPath.getName))
    newestFirst.iterator.map { s =>
      val v = versionOf(s.getPath.getName)
      (v, commitTsOf(base, v).getOrElse(s.getModificationTime))
    }.collectFirst { case (v, ts) if ts <= tsMillis => v }
      .getOrElse(throw new IllegalArgumentException(
        s"requirement failed: no snapshot committed at or before timestamp " +
          s"$tsMillis under $base"))
  }

  /** Refuses a rename/drop of a column an OUTSTANDING equality delete
    * keys on: eq keys bind by name at read time, so changing the name
    * would silently detach the delete. Metadata-only check (refs-sidecar
    * headers); compact materializes the deletes and lifts the refusal.
    */
  private def guardEqKeyColumn(name: String): Manifest => Unit = m =>
    if (loadEqBatches(m).exists(_.keyCols.contains(name)))
      throw new IllegalStateException(
        s"column $name is a key column of an outstanding equality delete " +
          "(eq keys bind by name) - run compact() to materialize row-level " +
          "deletes before renaming or dropping it")

  /** `xf` maps (parent schema, parent last-column-id) → (new schema, new
    * last-column-id), resolved against the true parent INSIDE the commit
    * lock — a retried publish re-runs it against the winner's state.
    */
  private def alterSchema(base: String, mode: String,
                          guard: Manifest => Unit = _ => ())(
      xf: (StructType, Long) => (StructType, Long)): Long = {
    require(versions(base).nonEmpty, s"no committed snapshots under $base")
    // One resolution per distinct parent, shared by schemaFor/lastIdFor
    // (publish consults both per attempt — no duplicate manifest read/xf).
    val memo = new java.util.concurrent.ConcurrentHashMap[Long, (StructType, Long)]()
    def resolved(parent: Long): (StructType, Long) =
      memo.computeIfAbsent(parent, { p =>
        val m = readManifest(base, p)
        guard(m)
        val s = m.schema.getOrElse(
          throw new IllegalStateException(
            "table predates field-id tracking (no schema header); rename/drop " +
              "need id-carrying files - recommit the data to a fresh base"))
        xf(s, mintFloor(base, m))
      })
    publish(base, Nil, Nil, mode,
      parent => { val p = readManifest(base, parent); (p.files, p.dvs, p.eqs) },
      schemaFor = parent => Some(resolved(parent)._1.json),
      lastIdFor = parent => Some(resolved(parent)._2))
  }

  /** The .parquet files of a just-written dir, sorted, as path strings. */
  private def listParquet(spark: SparkSession, dir: Path): Seq[String] =
    listDir(dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted

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

  private def runtimeConf(key: String, dflt: String): String =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption(key)).getOrElse(dflt)

  private val lockCache =
    new java.util.concurrent.ConcurrentHashMap[String, CommitLock]()

  /** Route the commit critical section through the configured
    * [[CommitLock]] strategy; the default file lock first guards against
    * known non-atomic stores (see the [[CommitLock]] matrix) — failing
    * loudly at commit time beats a silently lost update discovered in an
    * audit.
    */
  private def withCommitLock[T](base: String)(body: => T): T =
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
  private def tryClaim(fs: FileSystem, p: Path): Boolean = fs match {
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

  private def fileLock[T](base: String)(body: => T): T = {
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
  private def publish(base: String, newFiles: Seq[String], newDvs: Seq[String],
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
  private def claimIdentityRange(base: String, colName: String, n: Long): Long = {
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

  private def maybeAutoExpire(base: String): Unit =
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
  private def maybeAutoBinpack(spark: SparkSession, base: String,
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
    val m0 = readManifest(base, vs.max)
    // The touched-file scan reads raw parquet; under deletion vectors it
    // would resurrect DV-deleted rows into the rewrite. Materialize first.
    require(m0.dvs.isEmpty,
      "table has deletion vectors - run compact() to materialize them " +
        "before a copy-on-write delete, or use deleteWhereDV")
    // Same hazard for equality deletes: the raw rewrite would resurrect
    // key-deleted rows into the surviving files.
    require(m0.eqs.isEmpty,
      "table has equality deletes - run compact() to materialize them " +
        "before a copy-on-write delete, or use deleteWhereDV")
    val files = m0.files
    // Keep the scan's full URIs for READING (they carry the scheme); the
    // comparison set is uriPath-canonical so it matches manifest paths
    // whatever their qualification. Reads go through the era schema so a
    // post-rename cond binds by field id in pre-rename files.
    val touchedUris = readWithSchema(spark, m0.schema, files).filter(cond)
      .select(org.apache.spark.sql.functions.input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSeq
    val touched = touchedUris.map(uriPath).toSet
    if (touched.isEmpty) return vs.max
    // SQL DELETE semantics: only rows where cond is TRUE are deleted; rows
    // where cond is NULL (three-valued logic) must SURVIVE the rewrite, so
    // keep !coalesce(cond, false), never a bare !cond. The rewrite's df
    // carries the era schema's field ids, so its files stay id-tracked.
    // Lineage tables rewrite survivors WITH their `_row_id` (same
    // materialize-on-rewrite rule as compact).
    val rewriteScan =
      if (!rowLineageEnabled(base)) readWithSchema(spark, m0.schema, touchedUris)
      else decorateRowIds(
        readWithSchema(spark, m0.schema.map(withRowIdField), touchedUris),
        lineageFirsts(base))
    val rewritten = rewriteScan.filter(!coalesce(cond, lit(false)))
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
    publish(base, newFiles, Nil, mode = "delete", parent =>
      if (parent == 0) (Nil, Nil, Nil)
      else if (parent == v0)
        (readManifest(base, parent).files.filterNot(f => touched(uriPath(f))), Nil, Nil)
      else {
        val p = readManifest(base, parent)
        val rewrittenAway = touched -- p.files.map(uriPath).toSet
        if (rewrittenAway.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteWhere based on v$v0 conflicts with a concurrent overwrite " +
              s"that rewrote ${rewrittenAway.size} of its ${touched.size} touched " +
              "file(s); retry the delete from the new version")
        // A concurrent DV/equality delete may reference a file we just
        // rewrote - carrying it would re-hide rows our rewrite kept, and
        // dropping it would resurrect that delete. Abort loudly.
        if (p.dvs.nonEmpty || p.eqs.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteWhere based on v$v0 conflicts with a concurrent " +
              "row-level (DV or equality) delete; retry from the new version")
        (p.files.filterNot(f => touched(uriPath(f))), Nil, Nil)
      })
  }

  /** Last-3-components key (`data/b_<uuid>/<file>.parquet`) — the file
    * identity deletion vectors store. Scheme- and base-independent, so DV
    * contents survive table relocation just like the manifest's relative
    * paths. Holds because [[writeBatch]] and DV batches never nest
    * partition subdirectories under the batch dir.
    */
  private def relKey(absFile: String): String =
    absFile.split('/').takeRight(3).mkString("/")

  /** Merge-on-read DELETE via deletion vectors (the Iceberg v3 / Delta DV
    * mechanism): instead of rewriting every touched data file, write one
    * small parquet of (dv_file, dv_pos) row coordinates and publish a
    * manifest that carries ALL parent data files plus the new vector.
    * [[read]] subtracts the vectors at scan time; [[compact]] materializes
    * them away. Returns the new version (no-op deletes publish nothing).
    *
    * Copy-on-write [[deleteWhere]] rewrites whole files on the write path;
    * this writes rows-deleted-sized metadata instead — at 100 TB a delete
    * of 1k rows scattered across 1k files costs one scan + a KB-scale
    * write, not a 1k-file rewrite. The read path pays the anti join, but
    * ONLY on files a vector actually references (clean files take the
    * plain scan path), so an untouched partition never slows down.
    */
  def deleteWhereDV(spark: SparkSession, base: String,
                    cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    // Scan WITH row coordinates, existing vectors applied — a row already
    // DV-deleted must not be re-matched (a cond hitting only such rows is
    // a no-op, not a new version). ONE scan: coordinates are written
    // straight out, and the emptiness check + referenced-file list come
    // from the written (KB-scale) sidecar, never a target re-scan.
    // The scan plans only files whose footer stats admit `cond` (the
    // readWhere translation): a selective delete on a clustered column
    // costs a neighborhood scan, not a table scan. Pure optimization —
    // pruned files contain no matching row, so no coordinate is lost.
    val schema = m.schema.getOrElse(scanWithDvs(spark, m, keepCoords = false).schema)
    val pruneFs = org.apache.spark.sql.graft.Bridge.pushableFilters(spark, schema, cond)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFs, eraIds(m))
    val matchScan =
      if (kept.isEmpty && m.files.nonEmpty)
        scanWithDvs(spark, m, keepCoords = true)
          .filter(org.apache.spark.sql.functions.lit(false))
      else scanWithDvs(spark, m.copy(files = kept), keepCoords = true)
    val matches = matchScan
      .filter(cond)
      .select(col(DvFileCol).as("dv_file"), col(DvPosCol).as("dv_pos"))
    val dvPath = new Path(dataDir(base), s"dv_${java.util.UUID.randomUUID().toString.take(8)}")
    matches.write.parquet(dvPath.toString)
    val newDvs = listParquet(spark, dvPath)
    // Files this vector references — for the conflict check below.
    val referenced = spark.read.parquet(newDvs: _*)
      .select("dv_file").distinct().collect().map(_.getString(0)).toSet
    // No-op delete: publish nothing, and remove the staged (empty) vector
    // dir eagerly — it is unreferenced, so nothing else ever would, and
    // expire's sweep only reclaims .parquet files, leaving empty dirs to
    // accumulate across repeated no-op deletes.
    if (referenced.isEmpty) {
      fsFor(base).delete(dvPath, true)
      return v0
    }
    publish(base, Nil, newDvs, mode = "delete-dv", parent =>
      if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        // Concurrent appends carry fine (a DV never references their
        // files); an overwrite that rewrote a file this vector points at
        // would orphan its coordinates AND resurrect the delete - abort.
        // Concurrent DV/equality DELETES commute with this delete (both
        // only hide rows; double-hiding is idempotent) and carry fine.
        val gone = referenced -- p.files.map(relKey).toSet
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteWhereDV based on v$v0 conflicts with a concurrent " +
              s"overwrite of ${gone.size} referenced file(s); retry from " +
              "the new version")
        (p.files, p.dvs, p.eqs)
      })
  }

  /** Predicate-scoped atomic replacement (Delta's `replaceWhere` / the
    * `REPLACE WHERE` backfill primitive): ONE commit that row-level-
    * deletes every existing row matching `cond` (a deletion vector over
    * the footer-stats-pruned file neighborhood — untouched files carry
    * by path, nothing is rewritten) and appends `df`. Re-running the
    * same backfill is idempotent in table STATE: the second run's vector
    * hides the first run's rows before re-appending them, so the visible
    * rows are identical (history gains a version, as any re-run would).
    *
    * `enforce = true` (default) refuses when any WRITTEN row does not
    * satisfy `cond` — a backfill writing outside its declared scope is
    * almost always a bug (Delta enforces the same invariant). The check
    * reads the just-written batch files back, so the rows checked are
    * provably the rows committed even for non-deterministic inputs
    * (same posture as CHECK enforcement); a violation removes the staged
    * batch and throws.
    *
    * Concurrency: snapshot-isolated against its base version, the
    * [[deleteWhereDV]] stance — concurrent appends carry forward
    * untouched (their rows are NOT subject to this replace's predicate),
    * and a concurrent overwrite that rewrote a vector-referenced file
    * aborts loudly. The commit's base mode is `replace-where`, NOT
    * `overwrite`: the change feed then attributes it row-level (appended
    * files = inserts, the vector's hidden rows = deletes) instead of
    * skipping it as a physical rewrite, and incremental append scans
    * deliver the new rows.
    *
    * At 100 TB: cost is the new data's write + one planning-time-pruned
    * neighborhood scan for coordinates + a KB-scale vector write. A
    * day-partitioned backfill of one day touches that day's files only.
    */
  def replaceWhere(spark: SparkSession, df: DataFrame, base: String,
                   cond: org.apache.spark.sql.Column,
                   enforce: Boolean = true,
                   sortCols: Seq[String] = Nil): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    // New data rides the same field-id path as an appending commit —
    // including identity/generated fill (a backfill is a user write).
    val tracked = m.schema.isDefined
    val parentLast = mintFloor(base, m)
    val dfG = applyColumnGenerators(spark, df, base, m.schema)
    val (toWrite, tableSchema, newLast) =
      if (tracked) withFieldIds(dfG, m.schema, keepParentFields = true,
        parentLastId = parentLast)
      else (dfG, null, 0L)
    val newFiles = writeBatch(toWrite, base, sortCols, checkNewData = true)
    val batchDir = new Path(newFiles.head).getParent
    if (enforce) {
      val outside =
        try spark.read.parquet(newFiles: _*)
          .filter(!coalesce(cond, lit(false))).limit(1).count()
        catch { case e: Throwable =>
          fsFor(base).delete(batchDir, true); throw e
        }
      if (outside > 0) {
        fsFor(base).delete(batchDir, true)
        throw new IllegalArgumentException(
          s"replaceWhere: a written row does not satisfy the replace " +
            s"predicate [$cond] - a backfill writing outside its declared " +
            "scope is refused (pass enforce = false to allow it)")
      }
    }
    // Row-level delete of the replaced region — [[deleteWhereDV]]'s plan:
    // coordinates over the stats-pruned neighborhood, existing vectors
    // applied so an already-hidden row is never re-matched.
    val schema = m.schema.getOrElse(scanWithDvs(spark, m, keepCoords = false).schema)
    val pruneFs = org.apache.spark.sql.graft.Bridge.pushableFilters(spark, schema, cond)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFs, eraIds(m))
    val matchScan =
      if (kept.isEmpty && m.files.nonEmpty)
        scanWithDvs(spark, m, keepCoords = true).filter(lit(false))
      else scanWithDvs(spark, m.copy(files = kept), keepCoords = true)
    val dvPath = new Path(dataDir(base),
      s"dv_${java.util.UUID.randomUUID().toString.take(8)}")
    matchScan.filter(cond)
      .select(col(DvFileCol).as("dv_file"), col(DvPosCol).as("dv_pos"))
      .write.parquet(dvPath.toString)
    val staged = listParquet(spark, dvPath)
    val referenced = spark.read.parquet(staged: _*)
      .select("dv_file").distinct().collect().map(_.getString(0)).toSet
    // An empty vector (nothing matched — first run of a backfill into
    // fresh territory) adds nothing: publish the append alone.
    val newDvs =
      if (referenced.isEmpty) { fsFor(base).delete(dvPath, true); Nil }
      else staged
    publish(base, newFiles, newDvs, mode = "replace-where", parent =>
      if (parent == 0) (Nil, Nil, Nil)
      else if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        val gone = referenced -- p.files.map(relKey).toSet
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"replaceWhere based on v$v0 conflicts with a concurrent " +
              s"overwrite of ${gone.size} vector-referenced file(s); " +
              "retry from the new version")
        (p.files, p.dvs, p.eqs)
      },
      schemaFor = if (!tracked) null else _ => Some(tableSchema.json),
      lastIdFor = if (!tracked) null else parent =>
        Some(newLast.max(
          if (parent <= 0) 0L else mintFloor(base, readManifest(base, parent)))))
  }

  /** Equality delete (the Iceberg v2 equality-delete file, re-expressed):
    * remove every row whose key tuple appears in `keys` (column names =
    * key columns) with ZERO target data IO — no target file is scanned,
    * rewritten, or even opened. The write costs one aggregate over `keys`
    * (its min/max envelope), a footer-stats metadata prune to pin the
    * files the delete applies to, and a keys-sized parquet write; readers
    * anti-join the key set against ONLY those referenced files, and
    * [[compact]] materializes the delete away. This is the streaming-CDC
    * write primitive: at 100 TB, a positional (DV) delete must first SCAN
    * the target to find coordinates — even runtime-pruned, that's data IO
    * per batch — while an equality delete defers all data IO to reads of
    * the touched neighborhood and to compaction (exactly why Flink writes
    * equality deletes into Iceberg v2 tables).
    *
    * Semantics: refs are pinned at this delete's commit, so keys
    * re-inserted LATER are untouched (sequence-number behavior); rows
    * with a NULL key component never match (SQL equality); the delete is
    * snapshot-isolated against its base version — concurrently APPENDED
    * rows are not affected (same stance as [[deleteWhereDV]] toward
    * concurrent appends). Key columns bind by NAME at read time;
    * [[renameColumn]]/[[dropColumn]] refuse while an outstanding equality
    * delete references the column (compact first).
    *
    * Returns the new version; a delete whose keys provably touch no live
    * file (empty keys, all-NULL keys, or full stats prune) publishes
    * nothing and returns the current version.
    */
  def deleteByKeys(spark: SparkSession, base: String, keys: DataFrame,
                   beforePublish: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.functions.col
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    val keyCols = keys.columns.toSeq
    require(keyCols.nonEmpty, "deleteByKeys needs at least one key column")
    m.schema.foreach { s =>
      val missing = keyCols.filterNot(s.fieldNames.contains)
      require(missing.isEmpty,
        s"key column(s) ${missing.mkString(",")} not in table schema " +
          s"${s.fieldNames.mkString(",")}")
    }
    // NULL-component tuples can never match (SQL equality) — dropping
    // them up front keeps the stored key set and the read-side join
    // build minimal.
    val k = keys.filter(keyCols.map(col(_).isNotNull).reduce(_ && _)).distinct()
    val maxInKeys = runtimeConf("spark.graft.prune.maxInKeys", "10000").toInt
    val refs = FileStats.keyFilters(k, maxInKeys) match {
      case None => Nil // no non-null key tuple: nothing can match
      case Some(fs) => FileStats.prune(hadoopConf, m.files, fs, eraIds(m)).map(relKey)
    }
    if (refs.isEmpty) return v0
    val eqPath = new Path(dataDir(base), s"eq_${java.util.UUID.randomUUID().toString.take(8)}")
    k.write.parquet(eqPath.toString)
    val keyFiles = listParquet(spark, eqPath)
    writeStringNew(fsFor(base), new Path(eqPath, EqRefsName),
      (keyCols.mkString("\t") +: refs).mkString("\n"))
    beforePublish()
    maybeConvertEq(spark, base, publish(base, Nil, Nil, mode = "delete-eq", parent =>
      if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        // Concurrent appends/deletes commute (refs are pinned; deletes
        // only hide rows); an overwrite that rewrote a referenced file
        // MATERIALIZED rows this delete targets into files it does not
        // reference — the delete would be silently lost. Abort.
        val gone = refs.toSet -- p.files.map(relKey).toSet
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"deleteByKeys based on v$v0 conflicts with a concurrent " +
              s"overwrite of ${gone.size} referenced file(s); retry from " +
              "the new version")
        (p.files, p.dvs, p.eqs)
      }, newEqs = keyFiles))
  }

  /** No-scan upsert: [[merge]]'s WHEN MATCHED UPDATE / NOT MATCHED INSERT
    * semantics with the matched leg expressed as an EQUALITY delete
    * instead of a DV-coordinate scan — the write path never opens a
    * target data file. One atomic commit: the source appends as new
    * files, and an equality delete pinned to the PRE-commit file set
    * hides the old rows of matched keys (the new files are not in its
    * refs, so the fresh rows survive — same-commit sequence semantics).
    * This is what a per-batch streaming upsert should write at 100 TB:
    * cost is one source aggregate + a source-sized write, independent of
    * target size and of target IO entirely; reads of the touched
    * neighborhood pay the key anti-join until [[compact]] folds it in.
    *
    * Same contract as [[merge]]: `source` must be key-unique and share
    * the table's schema. Source rows with a NULL key component simply
    * append (they can match nothing).
    */
  def upsertByKeys(spark: SparkSession, base: String, source: DataFrame,
                   keyCols: Seq[String], modeTag: String = "",
                   beforePublish: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "upsertByKeys needs at least one key column")
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    val src = m.schema match {
      case Some(s) =>
        require(source.columns.toSet == s.fieldNames.toSet,
          s"upsert source columns ${source.columns.mkString(",")} must match " +
            s"the table schema ${s.fieldNames.mkString(",")}")
        source.select(s.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq: _*)
      case None => source
    }
    val srcKeys = src.select(keyCols.map(col): _*)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _)).distinct()
    val maxInKeys = runtimeConf("spark.graft.prune.maxInKeys", "10000").toInt
    val refs = FileStats.keyFilters(srcKeys, maxInKeys) match {
      case None => Nil
      case Some(fs) => FileStats.prune(hadoopConf, m.files, fs, eraIds(m)).map(relKey)
    }
    // Pure-insert fast path: no live file can hold a matched key, so the
    // commit is a plain append of the source (no eq sidecar at all).
    val newEqs: Seq[String] =
      if (refs.isEmpty) Nil
      else {
        val eqPath = new Path(dataDir(base),
          s"eq_${java.util.UUID.randomUUID().toString.take(8)}")
        srcKeys.write.parquet(eqPath.toString)
        val keyFiles = listParquet(spark, eqPath)
        writeStringNew(fsFor(base), new Path(eqPath, EqRefsName),
          (keyCols.mkString("\t") +: refs).mkString("\n"))
        keyFiles
      }
    val newFiles = writeBatch(src, base, keyCols, checkNewData = true)
    beforePublish()
    maybeConvertEq(spark, base, publish(base, newFiles, Nil,
      mode = if (modeTag.isEmpty) "merge-eq" else s"merge-eq:$modeTag", parent =>
      if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        // Serializable behavior, mirroring [[merge]]: a concurrent append
        // may hold keys this upsert targets (refs pinned at v0 would miss
        // them — duplicate keys); a concurrent overwrite of a referenced
        // file materializes target rows outside the refs (lost update); a
        // concurrent equality delete's keys were chosen against a state
        // this upsert changes. Abort on all three; concurrent DVs commute
        // (they only hide rows this upsert also hides or never touches).
        val added = p.files.toSet -- m.files.toSet
        val gone = refs.toSet -- p.files.map(relKey).toSet
        if (added.nonEmpty || gone.nonEmpty || p.eqs.toSet != m.eqs.toSet)
          throw new java.util.ConcurrentModificationException(
            s"upsertByKeys based on v$v0 conflicts with a concurrent " +
              s"commit (${added.size} file(s) added, ${gone.size} referenced " +
              "file(s) rewritten); retry from the new version")
        (p.files, p.dvs, p.eqs)
      }, newEqs = newEqs))
  }

  /** Convert every outstanding equality delete into ONE deletion vector
    * (Iceberg's "convert equality deletes to position deletes"
    * maintenance op): scan only the eq-referenced files, locate the rows
    * the key sets hide, write their (file, row) coordinates as a DV, and
    * publish a metadata commit that carries all data files + existing
    * DVs + the new vector and DROPS the eq lines. No data file is
    * rewritten.
    *
    * Why it matters: a high-frequency eq-upsert stream accumulates one
    * eq batch per micro-batch, and every reader pays one anti join PER
    * BATCH (each batch pins its own refs). DVs union into a single
    * frame, so after conversion readers pay ONE coordinate anti join no
    * matter how many deletes accumulated — this op is the cheap
    * maintenance step between streaming ingest and full [[compact]]
    * (which also materializes DVs away but rewrites data files to do
    * it). Returns the current version unchanged when no eq delete is
    * outstanding.
    */
  def convertEqToDv(spark: SparkSession, base: String): Long = {
    import org.apache.spark.sql.functions.col
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    if (m.eqs.isEmpty) return v0
    // Rows hidden by the eq state = (eq-dirty scan with coords, existing
    // DVs subtracted) MINUS the same scan with eqs also applied — i.e.
    // the coordinates scanWithDvs would drop. Compute directly: rows in
    // eq-referenced files, visible under DVs, matched by any eq batch.
    val eqBatches = loadEqBatches(m)
    val liveRel = m.files.map(relKey).toSet
    val dirtyRel = eqBatches.flatMap(_.refs).filter(liveRel).toSet
    val dirty = m.files.filter(f => dirtyRel(relKey(f)))
    if (dirty.isEmpty) return v0
    val scan0 = {
      import org.apache.spark.sql.functions.substring_index
      readWithSchema(spark, m.schema, dirty)
        .withColumn(DvFileCol, substring_index(col("_metadata.file_path"), "/", -3))
        .withColumn(DvPosCol, col("_metadata.row_index"))
    }
    val noDv =
      if (m.dvs.isEmpty) scan0
      else scan0.join(
        spark.read.parquet(m.dvs: _*)
          .withColumnRenamed("dv_file", DvFileCol)
          .withColumnRenamed("dv_pos", DvPosCol),
        Seq(DvFileCol, DvPosCol), "left_anti")
    // Semi per batch, union, dedup by coordinate (a row matched by two
    // batches must coord once).
    val hidden = eqBatches.filter(_.refs.exists(liveRel)).map { b =>
      val keys = spark.read.parquet(b.keyFiles: _*)
        .select(b.keyCols.map(c => col(c).as(s"_graft_eq_$c")): _*)
      val cond = b.keyCols.map(c => noDv(c) === keys(s"_graft_eq_$c"))
        .reduce(_ && _) &&
        noDv(DvFileCol).isInCollection(b.refs.filter(liveRel))
      noDv.join(keys, cond, "left_semi")
    }.reduce(_.unionByName(_))
      .select(col(DvFileCol).as("dv_file"), col(DvPosCol).as("dv_pos"))
      .dropDuplicates("dv_file", "dv_pos")
    val dvPath = new Path(dataDir(base), s"dv_${java.util.UUID.randomUUID().toString.take(8)}")
    hidden.write.parquet(dvPath.toString)
    val written = listParquet(spark, dvPath)
    val referenced = spark.read.parquet(written: _*)
      .select("dv_file").distinct().collect().map(_.getString(0)).toSet
    val newDvs =
      if (referenced.isEmpty) { fsFor(base).delete(dvPath, true); Nil }
      else written
    publish(base, Nil, newDvs, mode = "eq-convert", parent =>
      if (parent == v0) (m.files, m.dvs, Nil)
      else {
        val p = readManifest(base, parent)
        // The conversion snapshot-read the v0 eq/dv/file state; ANY
        // concurrent change to it invalidates the computed coordinates
        // (a new eq delete would be silently DROPPED by our eq-free
        // manifest). Abort on any difference.
        if (p.files.toSet != m.files.toSet || p.dvs.toSet != m.dvs.toSet ||
            p.eqs.toSet != m.eqs.toSet)
          throw new java.util.ConcurrentModificationException(
            s"convertEqToDv based on v$v0 conflicts with a concurrent " +
              "commit; retry from the new version")
        (p.files, p.dvs, Nil)
      })
  }

  /** Auto-maintenance hook honoring the `write.eq-delete.max-batches`
    * table property ([[graft.connector.TableProps.EqDeleteMaxBatches]]):
    * called by every eq-writing commit with the freshly published
    * version; when the outstanding eq BATCH count (distinct sidecar
    * dirs — one per delete/upsert commit) exceeds the bound, fold them
    * into one deletion vector via [[convertEqToDv]] so read cost stays
    * bounded without an external scheduler. Returns the post-conversion
    * version (or `committed` unchanged). Losing a conversion race is
    * non-fatal — the data commit already published; the next eq commit
    * retries the fold.
    */
  private def maybeConvertEq(spark: SparkSession, base: String,
                             committed: Long): Long = {
    val prop = graft.connector.TableProps.read(base)
      .get(graft.connector.TableProps.EqDeleteMaxBatches)
    prop match {
      case None => committed
      case Some(raw) =>
        val max =
          try raw.trim.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"table property write.eq-delete.max-batches must be an " +
                s"integer, got '$raw'")
          }
        require(max >= 0, s"write.eq-delete.max-batches must be >= 0, got $max")
        val m = readManifest(base, committed)
        val batches = m.eqs.map(f => new Path(f).getParent.toString).distinct.size
        if (batches <= max) committed
        else
          try convertEqToDv(spark, base)
          catch { case e: java.util.ConcurrentModificationException =>
            // the eq commit itself is durable; maintenance retries later
            System.err.println(
              s"[graft] auto convert_eq_deletes on $base lost a commit " +
                s"race (will retry on the next eq commit): ${e.getMessage}")
            committed
          }
    }
  }

  /** Generalized one-commit delta: equality-delete `deleteKeys` (column
    * names = key columns; may be empty) AND append `inserts` (may be
    * empty), published atomically as ONE `merge-eq[:tag]` commit — the
    * CDC APPLY primitive. [[upsertByKeys]] is the special case where the
    * delete keys are the insert rows' keys; replication of a source
    * commit whose delete and insert sets differ (a pure delete, a pure
    * append, or a merge) needs them independent. Same zero-target-IO
    * physics and refs-pinning semantics as [[deleteByKeys]] (the eq
    * delete never references this commit's own inserts), same
    * serializable conflict behavior as [[upsertByKeys]].
    *
    * Publishes even when both legs are empty iff `modeTag` is non-empty
    * — the tag is an idempotency MARKER for exactly-once replay
    * ([[graft.streaming.StreamIngest.replicateBatch]]), and a marker
    * that silently vanished on an empty delta would re-apply its source
    * commit forever.
    */
  def applyDelta(spark: SparkSession, base: String,
                 deleteKeys: Option[DataFrame], inserts: Option[DataFrame],
                 modeTag: String = ""): Long = {
    import org.apache.spark.sql.functions.col
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    val ins = inserts.map { df =>
      m.schema match {
        case Some(s) =>
          require(df.columns.toSet == s.fieldNames.toSet,
            s"delta inserts (${df.columns.mkString(",")}) must match " +
              s"the table schema (${s.fieldNames.mkString(",")})")
          df.select(s.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq: _*)
        case None => df
      }
    }
    val maxInKeys = runtimeConf("spark.graft.prune.maxInKeys", "10000").toInt
    val (newEqs: Seq[String], refs: Seq[String]) = deleteKeys match {
      case None => (Nil, Nil)
      case Some(keysDf) =>
        val keyCols = keysDf.columns.toSeq
        require(keyCols.nonEmpty, "applyDelta delete keys need >= 1 column")
        // Same schema-membership check as [[deleteByKeys]]: a misspelled
        // key column would otherwise write an eq sidecar keyed on a
        // nonexistent column, poisoning every subsequent read of the
        // referenced files until compact().
        m.schema.foreach { s =>
          val missing = keyCols.filterNot(s.fieldNames.contains)
          require(missing.isEmpty,
            s"delete-key column(s) ${missing.mkString(",")} not in table " +
              s"schema ${s.fieldNames.mkString(",")}")
        }
        val k = keysDf
          .filter(keyCols.map(col(_).isNotNull).reduce(_ && _)).distinct()
        val rs = FileStats.keyFilters(k, maxInKeys) match {
          case None => Nil
          case Some(fs) => FileStats.prune(hadoopConf, m.files, fs, eraIds(m)).map(relKey)
        }
        if (rs.isEmpty) (Nil, Nil)
        else {
          val eqPath = new Path(dataDir(base),
            s"eq_${java.util.UUID.randomUUID().toString.take(8)}")
          k.write.parquet(eqPath.toString)
          val keyFiles = listParquet(spark, eqPath)
          writeStringNew(fsFor(base), new Path(eqPath, EqRefsName),
            (keyCols.mkString("\t") +: rs).mkString("\n"))
          (keyFiles, rs)
        }
    }
    val newFiles = ins.map(writeBatch(_, base, Nil, checkNewData = true)).getOrElse(Nil)
    if (newFiles.isEmpty && newEqs.isEmpty && modeTag.isEmpty) return v0
    maybeConvertEq(spark, base, publish(base, newFiles, Nil,
      mode = if (modeTag.isEmpty) "merge-eq" else s"merge-eq:$modeTag", parent =>
      if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        val added = p.files.toSet -- m.files.toSet
        val gone = refs.toSet -- p.files.map(relKey).toSet
        if (added.nonEmpty || gone.nonEmpty || p.eqs.toSet != m.eqs.toSet)
          throw new java.util.ConcurrentModificationException(
            s"applyDelta based on v$v0 conflicts with a concurrent commit " +
              s"(${added.size} file(s) added, ${gone.size} referenced " +
              "file(s) rewritten); retry from the new version")
        (p.files, p.dvs, p.eqs)
      }, newEqs = newEqs))
  }

  /** Batch MERGE (upsert): rows from `source` replace same-key rows in the
    * table and new keys append — SQL MERGE's WHEN MATCHED THEN UPDATE /
    * WHEN NOT MATCHED THEN INSERT, taking source rows WHOLE. Built on
    * deletion vectors: matched target rows are DV-deleted (a semi join
    * against the broadcast-able source key set — no target file is
    * rewritten), and the entire source appends as new files; both legs
    * publish as ONE commit, so readers see the upsert atomically or not
    * at all. At 100 TB a merge touching 0.1% of rows costs one target
    * scan + a source-sized write — the merge-on-read economics Iceberg
    * v3 moved to, vs copy-on-write's rewrite of every touched file.
    *
    * `source` must be key-unique (enforce upstream with dropDuplicates;
    * duplicate source keys would append twice). Requires the source to
    * share the table's schema.
    */
  /** `beforePublish` is the same test seam as [[deleteWhere]]'s: it runs
    * after both legs are written, immediately before the locked publish.
    */
  def merge(spark: SparkSession, base: String, source: DataFrame,
            keyCols: Seq[String], modeTag: String = "",
            beforePublish: () => Unit = () => ()): Long = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val v0 = vs.max
    val m = readManifest(base, v0)
    // On an id-tracked table the source aligns to the table's field ids
    // (same names required — the documented merge contract), so its
    // insert-leg files are id-carrying like every other data file.
    val src = m.schema match {
      case Some(s) =>
        require(source.columns.toSet == s.fieldNames.toSet,
          s"merge source columns ${source.columns.mkString(",")} must match " +
            s"the table schema ${s.fieldNames.mkString(",")}")
        source.select(s.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq: _*)
      case None => source
    }
    // Coordinates of target rows whose key appears in the source: the
    // DV-delete leg. left_semi keeps the scan side's columns only, so the
    // projection is (coords + keys) — column pruning drops the rest. ONE
    // scan: the coordinate set is written first, and the emptiness check
    // and referenced-file list both come from the written (KB-scale)
    // sidecar, never from re-running the target scan.
    //
    // The scan is RUNTIME-PRUNED by the source's key envelope
    // ([[FileStats.keyFilters]]): on a key-clustered table, a batch-sized
    // upsert touches a batch-sized file neighborhood, and target files
    // whose footer stats can't hold any source key never reach the
    // left_semi join — the merge cost tracks the SOURCE size, not the
    // table size. Safe because this scan only feeds the matched
    // (equi-join) leg; the insert leg below never reads the target.
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    val maxInKeys = runtimeConf("spark.graft.prune.maxInKeys", "10000").toInt
    val matchedScan = FileStats.keyFilters(srcKeys, maxInKeys) match {
      case None => // no joinable source key at all: nothing can match
        scanWithDvs(spark, m, keepCoords = true)
          .filter(org.apache.spark.sql.functions.lit(false))
      case Some(fs) =>
        val kept = FileStats.prune(hadoopConf, m.files, fs, eraIds(m))
        if (kept.isEmpty && m.files.nonEmpty)
          scanWithDvs(spark, m, keepCoords = true)
            .filter(org.apache.spark.sql.functions.lit(false))
        else scanWithDvs(spark, m.copy(files = kept), keepCoords = true)
    }
    val matched = matchedScan
      .join(srcKeys, keyCols, "left_semi")
      .select(col(DvFileCol).as("dv_file"), col(DvPosCol).as("dv_pos"))
    val dvPath = new Path(dataDir(base), s"dv_${java.util.UUID.randomUUID().toString.take(8)}")
    matched.write.parquet(dvPath.toString)
    val written = listParquet(spark, dvPath)
    val referenced = spark.read.parquet(written: _*)
      .select("dv_file").distinct().collect().map(_.getString(0)).toSet
    // An insert-only merge (no matched keys) drops its empty vector dir
    // eagerly, same as a no-op DV delete.
    val newDvs =
      if (referenced.isEmpty) { fsFor(base).delete(dvPath, true); Nil }
      else written
    // The insert leg: the whole source (updates are delete+insert).
    val newFiles = writeBatch(src, base, keyCols, checkNewData = true)
    beforePublish()
    publish(base, newFiles, newDvs,
      mode = if (modeTag.isEmpty) "merge" else s"merge:$modeTag", parent =>
      if (parent == v0) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        // A concurrent APPEND may have added rows for keys this merge is
        // upserting — carrying its files uninspected would leave duplicate
        // key rows, silently breaking the upsert invariant. Serializable
        // behavior (Iceberg's choice for MERGE): abort on ANY concurrent
        // data-file change and let the caller retry against the new state.
        // Same for a concurrent EQUALITY delete: its keys were chosen
        // against a state this merge is changing (it may delete keys the
        // merge re-inserts, or miss the merge's inserts) — no serial
        // order reproduces carrying both.
        val added = p.files.toSet -- m.files.toSet
        val gone = referenced -- p.files.map(relKey).toSet
        if (added.nonEmpty || gone.nonEmpty || p.eqs.toSet != m.eqs.toSet)
          throw new java.util.ConcurrentModificationException(
            s"merge based on v$v0 conflicts with a concurrent commit " +
              s"(${added.size} file(s) added, ${gone.size} referenced file(s) " +
              "rewritten); retry from the new version")
        (p.files, p.dvs, p.eqs)
      })
  }

  private val DvFileCol = "_graft_dv_file"
  private val DvPosCol = "_graft_dv_pos"

  /** Per-eq-batch sidecar: first line = tab-joined key column names, one
    * referenced data-file rel key per following line. Rel keys make the
    * delete relocation-safe, same as DV coordinates.
    */
  private val EqRefsName = "_refs.txt"

  /** The (file, position) coordinate column names of [[scanWithCoords]]
    * output — public so row-level executors (SQL MERGE/UPDATE) can name
    * them without hardcoding. */
  def rowCoordColumns: (String, String) = (DvFileCol, DvPosCol)

  /** The latest version's rows WITH their row coordinates (existing DVs
    * already subtracted), plus that version number — the read half of a
    * generalized row-level change; feed the coordinates of rows to
    * remove into [[applyRowChanges]] against the returned version.
    */
  def scanWithCoords(spark: SparkSession, base: String): (DataFrame, Long) =
    scanWithCoords(spark, base, Nil)

  /** [[scanWithCoords]] with planning-time file pruning: files whose
    * footer stats prove no row satisfies `pruneFilters` never reach the
    * scan. Callers must only prune when unseen rows cannot matter (e.g.
    * a MERGE without NOT MATCHED BY SOURCE prunes by the source's key
    * envelope: unmatched target rows produce nothing, and pruned files
    * can't hold matched ones).
    */
  def scanWithCoords(spark: SparkSession, base: String,
                     pruneFilters: Seq[org.apache.spark.sql.sources.Filter]): (DataFrame, Long) = {
    import org.apache.spark.sql.functions.lit
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val m = readManifest(base, vs.max)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    // On a lineage table the coordinate scan also carries `_row_id`, so a
    // row-change consumer (SQL MERGE/UPDATE) can hand each update leg's
    // row its own id back through [[applyRowChanges]].
    val rowIds =
      if (rowLineageEnabled(base)) Some(lineageFirsts(base)) else None
    val scan =
      if (kept.isEmpty && m.files.nonEmpty)
        scanWithDvs(spark, m, keepCoords = true, rowIds = rowIds)
          .filter(lit(false))
      else scanWithDvs(spark, m.copy(files = kept), keepCoords = true,
        rowIds = rowIds)
    (scan, vs.max)
  }

  /** `cols` of the CURRENT version's rows that row-level deletes HIDE —
    * physically present in live data files but subtracted from every
    * read by a deletion vector or an outstanding equality-delete batch.
    * The serving-side subtraction set for external indexes built over
    * raw live files (e.g. [[graft.ops.AnnIndex]], whose inverted lists
    * index every row a file holds): probe results anti-join this frame
    * so soft-deleted rows never serve, without the index paying a
    * rewrite per delete. `cols` may include the [[rowCoordColumns]]
    * names — the hidden rows' physical (rel-key file, position)
    * coordinates, the RIGHT anti-join grain for an index that can hold
    * several physical copies of one logical key (an upsert hides only
    * the OLD copy; a key-level subtraction would kill the live one too).
    *
    * Cost discipline: only delete-REFERENCED files scan (the same dirty
    * slice [[read]] already decorates), so the frame is bounded by
    * outstanding-delete traffic, never the table. Compaction
    * materializes deletes away and empties this frame.
    */
  def hiddenRows(spark: SparkSession, base: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, substring_index}
    val vs = versions(base)
    require(vs.nonEmpty, s"no committed snapshots under $base")
    val m = readManifest(base, vs.max)
    val eqBatches = loadEqBatches(m)
    // the empty frame also answers coordinate-column requests, which the
    // plain read does not carry
    def empty = read(spark, base)
      .withColumn(DvFileCol, lit(null).cast("string"))
      .withColumn(DvPosCol, lit(null).cast("long"))
      .select(cols.map(col): _*).filter(lit(false))
    if (m.dvs.isEmpty && eqBatches.isEmpty) return empty
    val dvOpt =
      if (m.dvs.isEmpty) None
      else Some(spark.read.parquet(m.dvs: _*)
        .withColumnRenamed("dv_file", DvFileCol)
        .withColumnRenamed("dv_pos", DvPosCol))
    val dvDirtyRel = dvOpt.map(
        _.select(DvFileCol).distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty[String])
    val liveRel = m.files.map(relKey).toSet
    val eqDirtyRel = eqBatches.flatMap(_.refs).filter(liveRel).toSet
    val dirty = m.files.filter(f => (dvDirtyRel ++ eqDirtyRel)(relKey(f)))
    if (dirty.isEmpty) return empty
    val decorated = readWithSchema(spark, m.schema, dirty, mergeSchema = false)
      .withColumn(DvFileCol, substring_index(col("_metadata.file_path"), "/", -3))
      .withColumn(DvPosCol, col("_metadata.row_index"))
    val dvHidden = dvOpt.map(dv =>
      decorated.join(dv, Seq(DvFileCol, DvPosCol), "left_semi"))
    val eqHidden = eqBatches.filter(_.refs.exists(liveRel)).map { b =>
      val keys = spark.read.parquet(b.keyFiles: _*)
        .select(b.keyCols.map(c => col(c).as(s"_graft_eq_$c")): _*)
      val cond = b.keyCols.map(c => decorated(c) === keys(s"_graft_eq_$c"))
        .reduce(_ && _) &&
        decorated(DvFileCol).isInCollection(b.refs.filter(liveRel))
      decorated.join(keys, cond, "left_semi")
    }
    // a row both DV- and eq-hidden must not double-count: dedupe on its
    // physical coordinate before projecting the caller's columns
    (dvHidden.toSeq ++ eqHidden).reduce(_.unionByName(_))
      .dropDuplicates(DvFileCol, DvPosCol)
      .select(cols.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // Row lineage (stable row ids) — Iceberg v3's row-id model re-expressed
  // (spec's row-lineage section; Delta calls it row tracking): every row
  // of a lineage-enabled table owns a durable long `_row_id`, assigned by
  // the commit that first wrote it and identical forever after — through
  // compaction, clustering, binpack, clone and SQL UPDATE/MERGE. Appends
  // pay NOTHING on the data path: ids are assigned as METADATA (per new
  // file, a `first_row_id` range claimed from the same crash-safe ledger
  // identity columns use; a row's id is first + its parquet row index),
  // recorded in `_rowids/a_*.tsv` sidecars — at 100 TB a bulk ingest's
  // lineage cost is one footer read per new file plus a KB-scale sidecar,
  // never a data pass. Only REWRITES (compact, CoW delete, MERGE/UPDATE
  // legs) materialize `_row_id` as a physical parquet column: they
  // rewrite the bytes anyway, and position-derived ids die with the old
  // positions (the Iceberg v3 rule — "first-row-id inheritance until the
  // file is rewritten"). Reads resolve
  // `coalesce(physical, first_row_id(file) + row_index)`.
  //
  // Id-retirement stances (documented, not accidental): an equality-
  // delete upsert ([[upsertByKeys]], [[replaceWhere]]) writes its new
  // rows BLIND — no target scan is the whole point — so the new copy of
  // a key mints a FRESH id and the old id retires with the hidden row;
  // SQL MERGE/UPDATE scan the target anyway, so their update legs KEEP
  // the row's id (Delta row tracking's preserved-on-update semantics).
  // ---------------------------------------------------------------------

  /** The reserved row-lineage column name. Hidden from plain [[read]]
    * (rewritten files carry it physically, but the table schema never
    * lists it, so scans don't request it); surfaced by [[readLineage]]
    * and `changeFeed(withRowIds = true)`. */
  val RowIdCol = "_row_id"

  private def rowIdsDir(base: String) = new Path(base, "_rowids")

  /** Whether the table opted into row lineage ([[enableRowLineage]]) —
    * one fs.exists, the same metadata class as the lock probe. */
  def rowLineageEnabled(base: String): Boolean =
    try fsFor(base).exists(new Path(rowIdsDir(base), "_enabled"))
    catch { case _: Exception => false }

  /** Exact footer row count + whether the file physically carries
    * `_row_id`. Unlike the best-effort stats sidecar, lineage assignment
    * REQUIRES exact counts — a failed footer read fails the commit
    * loudly instead of minting a wrong id range. */
  private def footerRows(file: String): (Long, Boolean) = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new Path(file), hadoopConf))
    try {
      import scala.jdk.CollectionConverters._
      val hasRid = rd.getFooter.getFileMetaData.getSchema.getFields.asScala
        .exists(_.getName == RowIdCol)
      (rd.getRecordCount, hasRid)
    } finally rd.close()
  }

  /** Metadata-assign row-id ranges to new data files: ONE ledger claim
    * for the batch total (lock held microseconds, like identity claims),
    * then one `_rowids/a_*.tsv` sidecar recording `relKey \t first \t
    * rows` per file. Files already carrying a physical `_row_id` column
    * skip (their ids ride the bytes); files are processed in sorted-name
    * order so assignment is deterministic given deterministic input.
    * Orphan entries for files whose publish later loses its CAS are
    * harmless dead keys (same stance as burned identity gaps). */
  private def assignRowIdRanges(base: String, files: Seq[String]): Long = {
    val metas = files.sorted.map(f => (relKey(f), footerRows(f)))
      .collect { case (k, (rows, hasRid)) if !hasRid && rows > 0 => (k, rows) }
    if (metas.isEmpty) return 0L
    var next = claimIdentityRange(base, RowIdCol, metas.map(_._2).sum)
    val sb = new StringBuilder
    metas.foreach { case (k, rows) =>
      sb.append(k).append('\t').append(next).append('\t').append(rows).append('\n')
      next += rows
    }
    writeStringNew(fsFor(base), new Path(rowIdsDir(base),
      s"a_${java.util.UUID.randomUUID().toString.take(8)}.tsv"), sb.toString)
    metas.size.toLong
  }

  /** relKey → first_row_id for every metadata-assigned file. Driver IO
    * bounded by lineage-commit count (one sidecar each), the manifest-
    * listing metadata class; entries for expired files ride along as
    * harmless dead keys. */
  private[graft] def lineageFirsts(base: String): Map[String, Long] = {
    val fs = fsFor(base)
    val dir = rowIdsDir(base)
    if (!(try fs.exists(dir) catch { case _: Exception => false })) return Map.empty
    listDir(fs, dir).filter(_.getPath.getName.startsWith("a_"))
      .flatMap(st => readString(fs, st.getPath).split("\n", -1).filter(_.nonEmpty)
        .map { l => val Array(k, f, _) = l.split("\t", 3); k -> f.toLong })
      .toMap
  }

  /** The table schema plus the lineage read column (no field id — the
    * physical `_row_id` in rewritten files is written id-less, so this
    * field name-matches there and null-fills in metadata-assigned
    * files). */
  private def withRowIdField(s: StructType): StructType =
    if (s.fieldNames.contains(RowIdCol)) s
    else s.add(RowIdCol, org.apache.spark.sql.types.LongType, nullable = true)

  /** `_row_id` resolution over a SCAN-ROOTED frame (it reads `_metadata`,
    * which joins above the file scan would break): the physical column
    * when the file carries one, else the file's metadata-assigned first
    * id + the row's parquet position. The firsts map rides the plan as a
    * literal — bounded by the SCANNED file count needing metadata
    * resolution, the same driver-material class as the manifest file
    * list itself, and it shrinks as compaction materializes ids into
    * bytes. A file missing from the map (enable raced an in-flight
    * write) resolves NULL — loud in any uniqueness check; repair with
    * [[backfillRowIds]]. */
  private def decorateRowIds(df: DataFrame, firsts: Map[String, Long]): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, element_at, lit, substring_index, typedLit}
    val physical =
      if (df.columns.contains(RowIdCol)) col(RowIdCol)
      else lit(null).cast("long")
    df.withColumn(RowIdCol, coalesce(physical,
      element_at(typedLit(firsts),
        substring_index(col("_metadata.file_path"), "/", -3)) +
        col("_metadata.row_index")))
  }

  /** Opt the table into row lineage: drop the `_enabled` marker and
    * backfill metadata assignments for every live file (footer reads
    * only — no data pass). Idempotent. Requires a schema-tracked table
    * whose schema does not already use the reserved name. DDL-vs-write
    * discipline: like schema changes, enablement is single-writer — a
    * data write in flight while lineage turns on (files written before
    * the marker, published after this backfill) gets no assignment;
    * its rows read `_row_id` NULL until [[backfillRowIds]] repairs. */
  def enableRowLineage(base: String): Long = {
    val vs = versions(base)
    if (vs.nonEmpty) {
      val m = readManifest(base, vs.max)
      require(m.schema.isDefined,
        s"row lineage requires a schema-tracked table - $base is legacy " +
          "name-based (its files carry no field ids)")
      require(!m.schema.get.fieldNames.contains(RowIdCol),
        s"table schema already has a column named $RowIdCol - rename it " +
          "before enabling row lineage (the name is reserved)")
    }
    val fs = fsFor(base)
    fs.mkdirs(rowIdsDir(base))
    try writeStringNew(fs, new Path(rowIdsDir(base), "_enabled"), "")
    catch { case _: Exception => () } // marker exists = already enabled
    backfillRowIds(base)
  }

  /** Assign row-id ranges to live files that have neither a physical
    * `_row_id` column nor a metadata assignment — the enable-time
    * backfill, and the repair for a write that raced enablement.
    * Idempotent; metadata-only (footer reads, one sidecar write). */
  def backfillRowIds(base: String): Long = {
    require(rowLineageEnabled(base), s"row lineage not enabled on $base")
    val vs = versions(base)
    if (vs.isEmpty) return 0L
    val have = lineageFirsts(base).keySet
    assignRowIdRanges(base,
      readManifest(base, vs.max).files.filterNot(f => have(relKey(f))))
  }

  /** [[read]] plus the durable `_row_id` lineage column — the surfaced
    * half of row lineage (plain reads never see the column). Same DV/
    * equality-delete subtraction, time travel and era-schema behavior as
    * [[read]]. */
  def readLineage(spark: SparkSession, base: String,
                  asOf: Option[Long] = None): DataFrame = {
    require(rowLineageEnabled(base),
      s"row lineage not enabled on $base - call enableRowLineage first")
    scanPinned(spark, base, asOf.map(Pin.AsOf).getOrElse(Pin.Latest),
      withRowIds = true)
  }

  /** Fill NULL `_row_id` slots (a MERGE's insert-leg rows) from a claimed
    * ledger range. Changed-rows-sized frames only — appends take the
    * zero-cost metadata path instead. Same one-materialization
    * discipline as the identity fill: the checkpoint pins one row set
    * that the count, the claim and the write all see. */
  private def fillRowIds(spark: SparkSession, df: DataFrame, base: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val snap = df.localCheckpoint()
    val nulls = snap.filter(snap(RowIdCol).isNull)
    val n = nulls.count()
    if (n == 0L) return snap
    val k0 = claimIdentityRange(base, RowIdCol, n)
    val idxField = "__graft_rowid_idx"
    val indexed = spark.createDataFrame(
      nulls.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      },
      nulls.schema.add(idxField, org.apache.spark.sql.types.LongType))
    snap.filter(snap(RowIdCol).isNotNull).unionByName(
      indexed.withColumn(RowIdCol, (lit(k0) + col(idxField)).cast("long"))
        .drop(idxField))
  }

  /** Generalized atomic row change against `fromVersion` (the version
    * [[scanWithCoords]] was taken at): DV-delete every coordinate in
    * `deleteCoords` (columns [[rowCoordColumns]]) and append `inserts`,
    * published as ONE `merge` commit — SQL MERGE/UPDATE's storage
    * primitive. Same merge-on-read economics and serializable conflict
    * behavior as [[merge]]: no data file is rewritten, and ANY concurrent
    * data-file change aborts (a concurrent append could hold rows the
    * caller's join never saw).
    */
  def applyRowChanges(spark: SparkSession, base: String, fromVersion: Long,
                      deleteCoords: DataFrame, inserts: Option[DataFrame],
                      modeTag: String = ""): Long = {
    import org.apache.spark.sql.functions.col
    val m = readManifest(base, fromVersion)
    val lineage = rowLineageEnabled(base)
    val aligned = inserts.map { ins =>
      // Lineage carrier contract: inserts MAY carry `_row_id` (update
      // legs keep their row's id; insert legs carry NULL and fill from a
      // claimed range below). When the TABLE SCHEMA itself has a
      // `_row_id` field it is a legitimate user data column (only
      // possible on non-lineage tables — enablement refuses the name),
      // so it flows as data, not as a carrier. Otherwise, without
      // lineage the name is refused — a reserved column reaching the
      // write path is a caller bug.
      val schemaHasRid = m.schema.exists(_.fieldNames.contains(RowIdCol))
      val hasRid = !schemaHasRid && ins.columns.contains(RowIdCol)
      require(lineage || !hasRid,
        s"row-change inserts carry reserved column $RowIdCol but row " +
          s"lineage is not enabled on $base")
      m.schema match {
        case Some(s) =>
          require(ins.columns.filterNot(c => hasRid && c == RowIdCol).toSet
              == s.fieldNames.toSet,
            s"row-change inserts (${ins.columns.mkString(",")}) must match " +
              s"the table schema (${s.fieldNames.mkString(",")})")
          // carrier-mode generators: a merge's update rows carry their
          // identity values (kept), its insert rows carry NULL slots
          // (filled from a claimed range), and generated columns are
          // recomputed UNCONDITIONALLY so the row-wise invariant
          // survives UPDATE legs that changed an input column. An
          // assignment (or star expansion) that named a generated column
          // is therefore OVERRIDDEN by the recompute — the invariant
          // wins over the assignment, Delta's generated-column stance.
          // metadata re-attached AFTER generation: withColumn replaces
          // the generated/identity fields and strips their field-id
          // metadata, and a written file without ids reads back NULL on
          // an id-tracked table.
          val gen = applyColumnGenerators(spark, ins, base, Some(s), enforce = false)
            .select((s.fields.map(f => col(f.name).as(f.name, f.metadata)).toSeq ++
              (if (hasRid) Seq(col(RowIdCol)) else Nil)): _*)
          if (hasRid) fillRowIds(spark, gen, base) else gen
        case None => ins
      }
    }
    val dvPath = new Path(dataDir(base), s"dv_${java.util.UUID.randomUUID().toString.take(8)}")
    deleteCoords
      .select(col(DvFileCol).as("dv_file"), col(DvPosCol).as("dv_pos"))
      .write.parquet(dvPath.toString)
    val written = listParquet(spark, dvPath)
    val referenced = spark.read.parquet(written: _*)
      .select("dv_file").distinct().collect().map(_.getString(0)).toSet
    val newDvs =
      if (referenced.isEmpty) { fsFor(base).delete(dvPath, true); Nil }
      else written
    val newFiles = aligned.map(writeBatch(_, base, Nil, checkNewData = true)).getOrElse(Nil)
    if (newDvs.isEmpty && newFiles.isEmpty) return fromVersion // full no-op
    publish(base, newFiles, newDvs,
      mode = if (modeTag.isEmpty) "merge" else s"merge:$modeTag", parent =>
      if (parent == fromVersion) (m.files, m.dvs, m.eqs)
      else {
        val p = readManifest(base, parent)
        val added = p.files.toSet -- m.files.toSet
        val gone = referenced -- p.files.map(relKey).toSet
        // A concurrent DV or equality commit deleted rows this change's
        // insert leg may have READ pre-delete and be re-inserting —
        // carrying it would resurrect the delete (no serial order
        // produces that). Same abort discipline as deleteWhere's
        // file-level check.
        val dvChanged = p.dvs.toSet != m.dvs.toSet || p.eqs.toSet != m.eqs.toSet
        if (added.nonEmpty || gone.nonEmpty || dvChanged)
          throw new java.util.ConcurrentModificationException(
            s"row change based on v$fromVersion conflicts with a concurrent " +
              s"commit (${added.size} file(s) added, ${gone.size} referenced " +
              s"file(s) rewritten, row-level-delete change: $dvChanged); " +
              "retry from the new version")
        (p.files, p.dvs, p.eqs)
      })
  }

  /** One equality-delete batch as loaded from its sidecar: the key column
    * names, the files it applies to (live-intersected rel keys), and the
    * key-tuple parquet paths.
    */
  private case class EqBatch(keyCols: Seq[String], refs: Seq[String],
                             keyFiles: Seq[String])

  /** Load the latest state of a manifest's equality deletes: one batch per
    * eq dir, refs intersected with the live file set (a ref whose file was
    * since rewritten away contributes nothing). Metadata-sized driver IO —
    * one `_refs.txt` read per eq batch.
    */
  private def loadEqBatches(m: Manifest): Seq[EqBatch] = {
    if (m.eqs.isEmpty) return Nil
    m.eqs.groupBy(f => new Path(f).getParent).toSeq.sortBy(_._1.toString)
      .flatMap { case (dir, keyFiles) =>
        val fs = dir.getFileSystem(hadoopConf)
        val lines = readString(fs, new Path(dir, EqRefsName)).split("\n", -1)
          .toSeq.filter(_.nonEmpty)
        val keyCols = lines.head.split("\t").toSeq
        val refs = lines.tail
        if (refs.isEmpty) None else Some(EqBatch(keyCols, refs, keyFiles))
      }
  }

  /** Scan of a manifest with row-level deletes applied — deletion vectors
    * (positional) AND equality deletes (key-tuple). Row coordinates
    * (`_graft_dv_file` relocatable last-3 key + `_graft_dv_pos` parquet
    * row index) come from Spark's `_metadata` struct — no shuffle, no
    * row-number window. Only files a delete actually REFERENCES pay the
    * anti joins; every clean file takes the plain scan path, so at scale
    * the subtraction cost is proportional to the dirty file set, not the
    * table. Build sides are rows-deleted-sized (DV) or key-set-sized
    * (equality: the anti join keys on the key columns and checks the
    * delete's referenced-file membership as an InSet residual on the
    * matched pair — never a keys×refs product, so an unclustered table
    * with file-spanning refs still pays only a keys-sized build) and
    * hash-partition like any join — AQE broadcasts them when small.
    *
    * Equality semantics: a delete's keys remove rows ONLY in the files the
    * delete referenced at its commit (refs pinned at write), so rows
    * re-inserted for a deleted key AFTER the delete are never touched —
    * the Iceberg v2 sequence-number rule, carried by the refs list
    * instead of per-file sequence numbers. NULL key components never
    * match (SQL equality), mirroring MERGE's join.
    */
  private def scanWithDvs(spark: SparkSession, m: Manifest,
                          keepCoords: Boolean,
                          mergeSchema: Boolean = false,
                          rowIds: Option[Map[String, Long]] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, substring_index}
    // `rowIds` = Some(firsts): decorate every file scan with the lineage
    // `_row_id` column (physical where present, metadata-derived
    // otherwise) BEFORE any delete anti join — the column then rides the
    // joins like any data column.
    def readFiles(files: Seq[String]) = rowIds match {
      case None => readWithSchema(spark, m.schema, files, mergeSchema)
      case Some(firsts) => decorateRowIds(
        readWithSchema(spark, m.schema.map(withRowIdField), files, mergeSchema),
        firsts)
    }
    def coords(df: DataFrame) = df
      .withColumn(DvFileCol, substring_index(col("_metadata.file_path"), "/", -3))
      .withColumn(DvPosCol, col("_metadata.row_index"))
    val eqBatches = loadEqBatches(m)
    if (m.dvs.isEmpty && eqBatches.isEmpty) {
      val scan = readFiles(m.files)
      return if (keepCoords) coords(scan) else scan
    }
    val dvOpt =
      if (m.dvs.isEmpty) None
      else Some(spark.read.parquet(m.dvs: _*)
        .withColumnRenamed("dv_file", DvFileCol)
        .withColumnRenamed("dv_pos", DvPosCol))
    // Dirty-file set: same cardinality class as the manifest listing
    // itself (bounded by file count), so the driver hop is the one the
    // read path already makes. Equality refs are already rel keys.
    val dvDirtyRel = dvOpt.map(
        _.select(DvFileCol).distinct().collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty[String])
    val liveRel = m.files.map(relKey).toSet
    val eqDirtyRel = eqBatches.flatMap(_.refs).filter(liveRel).toSet
    val dirtyRel = dvDirtyRel ++ eqDirtyRel
    val (dirty, clean) = m.files.partition(f => dirtyRel(relKey(f)))
    // One decorated scan for every dirty file; a row in a DV-only file
    // meets the equality anti join too (and vice versa) — no match, only
    // join traffic, and the traffic is bounded by the dirty slice.
    def applyEq(df: DataFrame): DataFrame =
      eqBatches.filter(_.refs.exists(liveRel)).foldLeft(df) { (d, b) =>
        val keys = spark.read.parquet(b.keyFiles: _*)
          .select(b.keyCols.map(c => col(c).as(s"_graft_eq_$c")): _*)
        val cond = b.keyCols.map(c => d(c) === keys(s"_graft_eq_$c"))
          .reduce(_ && _) &&
          d(DvFileCol).isInCollection(b.refs.filter(liveRel))
        d.join(keys, cond, "left_anti")
      }
    val parts = Seq(
      if (clean.isEmpty) None
      else Some {
        val scan = readFiles(clean)
        if (keepCoords) coords(scan) else scan
      },
      if (dirty.isEmpty) None
      else Some {
        val decorated = coords(readFiles(dirty))
        val sub0 = dvOpt.map(dv =>
          decorated.join(dv, Seq(DvFileCol, DvPosCol), "left_anti"))
          .getOrElse(decorated)
        val sub = applyEq(sub0)
        if (keepCoords) sub else sub.drop(DvFileCol, DvPosCol)
      }).flatten
    // Under mergeSchema the clean and dirty slices may expose different
    // column sets (each merges only its own footers) — fill the gaps with
    // NULLs, which is exactly the additive-evolution contract.
    parts.reduce(_.unionByName(_, allowMissingColumns = mergeSchema))
  }

  /** Small-files compaction as a snapshot: rewrite the latest version's
    * data into `numFiles` files and publish it as a fresh file list. Old
    * snapshots keep reading their own files; [[expire]] reclaims the
    * small ones once no kept version references them.
    */
  /** [[read]] applies deletion vectors, so compaction also MATERIALIZES
    * them: the rewritten files carry no deleted rows and the new manifest
    * carries no dv lines — compact is the DV table's maintenance op.
    */
  /** `layout` overrides the default `repartition(numFiles)` with a custom
    * physical arrangement of the rewritten rows (e.g. Z-order) — the
    * conflict protocol is unchanged, so every layout strategy shares it.
    *
    * `onlySmallerThan` selects BINPACK compaction: only live files below
    * the byte threshold rewrite (their row-level deletes applied); every
    * larger file carries by path, untouched, along with the table's
    * DVs/equality deletes (still needed by the carried files; entries
    * referencing only rewritten files become inert). Maintenance cost is
    * proportional to the small-file debt, never the table — the shape a
    * streaming-ingested 100 TB table needs nightly, where the full
    * rewrite is a quarterly event. A full compact (None) also
    * MATERIALIZES all row-level deletes away.
    *
    * `onlyMatching` selects PREDICATE-SCOPED rewrite (Iceberg's
    * `rewrite_data_files(where)`): only files whose commit-time footer
    * stats might hold a matching row rewrite (row-level deletes applied),
    * everything else carries by path — re-cluster or re-sort a hot key
    * region for the cost of that region. Mutually exclusive with
    * `onlySmallerThan`.
    */
  def compact(spark: SparkSession, base: String, numFiles: Int,
              sortCols: Seq[String] = Nil,
              layout: Option[DataFrame => DataFrame] = None,
              onlySmallerThan: Option[Long] = None,
              onlyMatching: Option[org.apache.spark.sql.Column] = None): Long = {
    require(onlySmallerThan.isEmpty || onlyMatching.isEmpty,
      "choose ONE selector: onlySmallerThan (binpack) or onlyMatching " +
        "(predicate-scoped rewrite)")
    val v0 = versions(base).max
    val m0 = readManifest(base, v0)
    val fs = fsFor(base)
    val (smalls, bigs) = (onlySmallerThan, onlyMatching) match {
      case (None, None) => (m0.files, Seq.empty[String])
      case (Some(t), _) => m0.files.partition { f =>
        // a stat failure counts as small: the rewrite READS the file, so
        // a genuinely missing file fails loudly instead of silently
        // surviving as "big"
        (try fs.getFileStatus(new Path(f)).getLen
         catch { case _: Exception => 0L }) < t
      }
      case (_, Some(cond)) =>
        // Predicate-scoped rewrite (Iceberg's rewrite_data_files(where)):
        // only files whose footer stats say they MIGHT hold a matching
        // row rewrite — re-cluster a hot key region for the cost of that
        // region, never the table. Selection is file-granular, so rows
        // of a selected file that do NOT match the predicate rewrite
        // along with it (compaction moves bytes, never changes rows).
        val schema = pinnedSchema(base, Pin.AsOf(v0))
          .getOrElse(scanPinned(spark, base, Pin.AsOf(v0)).schema)
        val filters = org.apache.spark.sql.graft.Bridge
          .pushableFilters(spark, schema, cond)
        require(filters.nonEmpty,
          s"onlyMatching predicate '$cond' has no stats-translatable " +
            "conjunct - it would select every file; run a full compact " +
            "instead")
        val kept = FileStats.prune(hadoopConf, m0.files, filters, eraIds(m0)).toSet
        m0.files.partition(kept)
    }
    if (smalls.isEmpty) return v0
    val files0 = smalls.toSet
    // Lineage tables rewrite WITH `_row_id`: position-derived ids die
    // with the old positions, so the rewrite materializes them as a
    // physical column (writeBatch sees the column and skips metadata
    // assignment) — ids survive compaction byte-identically.
    val full = scanWithDvs(spark, m0.copy(files = smalls), keepCoords = false,
      rowIds = if (rowLineageEnabled(base)) Some(lineageFirsts(base)) else None)
    val compacted = layout.map(_(full)).getOrElse(full.repartition(numFiles))
    val newFiles = writeBatch(compacted, base, sortCols)
    val binpack = onlySmallerThan.isDefined || onlyMatching.isDefined
    // Conflict handling inside the claim loop: files appended concurrently
    // (parent files not in our compacted input) carry forward untouched; a
    // concurrent DELETE of a file we already rewrote would resurrect its
    // rows, so that case aborts loudly instead of losing the delete.
    publish(base, newFiles, Nil, mode = "overwrite", parent => {
      if (parent == v0)
        (bigs, if (binpack) m0.dvs else Nil, if (binpack) m0.eqs else Nil)
      else {
        val p = readManifest(base, parent)
        val removed = files0 -- p.files.toSet
        if (removed.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"compact of v$v0 conflicts with a concurrent delete of " +
              s"${removed.size} file(s); retry compaction from the new version")
        // A DV or equality delete published after our rewrite started
        // references pre-compact state — our output already lacks its
        // rows-to-hide, so carrying it is wrong and dropping it loses the
        // delete. Abort loudly.
        if (p.dvs.toSet != m0.dvs.toSet || p.eqs.toSet != m0.eqs.toSet)
          throw new java.util.ConcurrentModificationException(
            s"compact of v$v0 conflicts with a concurrent row-level " +
              "delete; retry compaction from the new version")
        (p.files.filterNot(files0),
          if (binpack) p.dvs else Nil, if (binpack) p.eqs else Nil)
      }
    })
  }

  /** Where a read is pinned: the latest committed version, an explicit
    * version (time travel), a named tag, or a branch head — ONE vocabulary
    * shared by the Scala API and the `graft` DataSource V2 connector's
    * options, so both resolve state through the same code path.
    */
  sealed trait Pin
  object Pin {
    case object Latest extends Pin
    final case class AsOf(v: Long) extends Pin
    final case class AtTag(name: String) extends Pin
    final case class AtBranch(name: String) extends Pin
  }

  private def pinnedManifest(base: String, pin: Pin): Manifest = pin match {
    case Pin.Latest =>
      val vs = versions(base)
      require(vs.nonEmpty, s"no committed snapshots under $base")
      readManifest(base, vs.max)
    case Pin.AsOf(v) =>
      val vs = versions(base)
      require(vs.nonEmpty, s"no committed snapshots under $base")
      require(vs.contains(v), s"snapshot $v not found (have ${vs.mkString(",")})")
      readManifest(base, v)
    case Pin.AtTag(n) => pinnedManifest(base, Pin.AsOf(tagVersion(base, n)))
    case Pin.AtBranch(n) =>
      val (files, dvs, eqs) = branchHeadState(base, n)
      val fork = readManifest(base, branchFork(base, n))
      Manifest(0L, 0L, "branch", files, dvs, eqs, fork.schema,
        fork.lastColumnId, fork.commitTs)
  }

  /** The era schema of a pinned state WITHOUT planning a scan — metadata
    * IO only, so schema inference (the connector's hot path) never lists
    * or validates data files. None for legacy (header-less) tables.
    */
  def pinnedSchema(base: String, pin: Pin): Option[StructType] =
    pinnedManifest(base, pin).schema

  /** The DV-aware scan of a pinned state, with OPTIONAL planning-time file
    * pruning: `pruneFilters` (data-source `Filter`s, the connector's
    * currency) are checked against each file's commit-time footer stats
    * ([[FileStats]]) and files that provably contain no matching row never
    * reach Spark's scan — at 100 TB, a selective filter on a sort-
    * clustered column turns a 10⁵-task scan into a handful of tasks at
    * PLANNING time. Pruning is conservative (stat-less files survive) and
    * the caller still applies the full predicate to surviving rows.
    */
  def scanPinned(spark: SparkSession, base: String, pin: Pin = Pin.Latest,
                 pruneFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                 mergeSchema: Boolean = false,
                 withRowIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val m = pinnedManifest(base, pin)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    val rowIds = if (withRowIds) Some(lineageFirsts(base)) else None
    // All files pruned: an empty result with the right schema — plan over
    // the full list behind a false literal (the optimizer folds it to an
    // empty LocalRelation; no task ever launches).
    if (kept.isEmpty && m.files.nonEmpty)
      scanWithDvs(spark, m, keepCoords = false, mergeSchema = mergeSchema,
        rowIds = rowIds)
        .filter(lit(false))
    else
      scanWithDvs(spark, m.copy(files = kept), keepCoords = false,
        mergeSchema = mergeSchema, rowIds = rowIds)
  }

  /** Planning-time size/row estimate of a pinned scan AFTER stats
    * pruning — what the connector reports to Catalyst so join strategy
    * sees real numbers instead of the "unknown, assume huge" default: a
    * dimension-sized snapshot table then auto-broadcasts with no hint,
    * and a selective pruned scan stops looking like a full table to the
    * optimizer. Driver cost is one `getFileStatus` + one sidecar load per
    * file/batch — the same metadata class as the manifest listing itself.
    * Row counts are pre-DV (a merge-on-read delete leaves them slightly
    * high — an ESTIMATE, conservative in the safe direction); None when
    * any surviving file predates stats sidecars.
    */
  def scanStats(base: String, pin: Pin = Pin.Latest,
                pruneFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil): (Option[Long], Option[Long]) = {
    val m = pinnedManifest(base, pin)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    val fs = fsFor(base)
    // A failed status call (concurrent expire, transient FS error) means
    // UNKNOWN, never 0 — an undercounted size would let join selection
    // broadcast a huge table. Unknown is exactly the pre-stats behavior.
    val sizes = kept.map { f =>
      try Some(fs.getFileStatus(new Path(f)).getLen)
      catch { case _: Exception => None }
    }
    val bytes = if (sizes.forall(_.isDefined)) Some(sizes.flatten.sum) else None
    val sidecars = kept.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(hadoopConf, d).getOrElse(Map.empty))
      .toMap
    val counts = kept.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName).map(_.rows)
    }
    (bytes, if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None)
  }

  /** Backfill/refresh stats sidecars (min/max/null-count AND the r9 NDV
    * sketches) for the live file set's batch dirs — the ANALYZE-equivalent
    * for tables whose data predates stats collection: legacy trees,
    * `spark.graft.stats.ndv false` ingests, and (opt-in) adopted foreign
    * directories. A dir rewrites only when some live file lacks a sidecar
    * entry or its NDV sketch, so re-running is cheap; managed dirs cover
    * every parquet they hold (other versions' files share the sidecar),
    * foreign dirs (`includeForeign = true` — it writes a hidden sidecar
    * file into the producer's directory, which strict adopt-only
    * deployments may not want) cover only the manifest's files. Returns
    * the number of dirs refreshed. Metadata-free operation: no manifest
    * changes, readers pick the new sidecars up immediately and a torn
    * sidecar read degrades to no-pruning.
    */
  def collectStats(spark: SparkSession, base: String,
                   includeForeign: Boolean = false): Long = {
    val m = pinnedManifest(base, Pin.Latest)
    val conf = hadoopConf
    val dataRoot = uriPath(dataDir(base).toString) + "/"
    var refreshed = 0L
    for ((dir, files) <- m.files.groupBy(f => new Path(f).getParent)) {
      val managed = (uriPath(dir.toString) + "/").startsWith(dataRoot)
      if (managed || includeForeign) {
        val existing = FileStats.readSidecar(conf, dir).getOrElse(Map.empty)
        val needs = files.exists { f =>
          existing.get(new Path(f).getName).forall(_.ndv.isEmpty)
        }
        if (needs) {
          val covered =
            if (managed)
              listDir(dir.getFileSystem(conf), dir)
                .filter(_.getPath.getName.endsWith(".parquet"))
                .map(_.getPath.toString).sorted
            else files.sorted
          FileStats.writeSidecar(conf, dir, covered,
            FileStats.collectNdv(spark, covered),
            FileStats.collectHistograms(spark, covered))
          refreshed += 1
        }
      }
    }
    refreshed
  }

  /** Approximate distinct counts per column over the (stats-pruned) live
    * file set, merged from the sidecars' per-file HLL sketches —
    * manifest-read cost, no data file opened. A column reports only when
    * EVERY surviving file carries its sketch: a partial union would
    * UNDERcount, and an undercounted NDV makes CBO over-broadcast (the
    * unsafe direction); absence degrades to the pre-NDV "unknown".
    * Rows hidden by DVs/equality deletes still count (an overcount —
    * safe for cardinality estimation, same stance as Iceberg manifests).
    */
  def scanNdv(base: String, pin: Pin = Pin.Latest,
              pruneFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil): Map[String, Long] = {
    val m = pinnedManifest(base, pin)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    if (kept.isEmpty) return Map.empty
    val sidecars = kept.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(hadoopConf, d).getOrElse(Map.empty))
      .toMap
    val perFile = kept.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName).map(_.ndv).getOrElse(Map.empty)
    }
    val common = perFile.map(_.keySet).reduce(_ intersect _)
    common.toSeq.map { c =>
      c -> FileStats.mergeNdv(perFile.map(_(c)))
    }.toMap
  }

  /** Merged per-column signed-log2 histogram counts over the
    * (stats-pruned) live file set. The buckets' FIXED boundaries make the
    * merge a plain per-bucket sum — manifest/sidecar-read cost only, no
    * data IO. A column reports only when EVERY surviving file carries
    * counts (a partial histogram would misstate the distribution);
    * [[FileStats.equiHeightBins]] turns the result into the equi-height
    * form Catalyst's filter estimation consumes.
    */
  def scanHistograms(base: String, pin: Pin = Pin.Latest,
                     pruneFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil): Map[String, Map[Int, Long]] = {
    val m = pinnedManifest(base, pin)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    if (kept.isEmpty) return Map.empty
    val sidecars = kept.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(hadoopConf, d).getOrElse(Map.empty))
      .toMap
    // Zero-row files (a CREATE's empty schema commit) legitimately carry
    // no counts and must not veto the whole table's histogram.
    val perFile = kept.flatMap { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName) match {
        case Some(fs) if fs.rows == 0 => None
        case Some(fs)                 => Some(fs.hist)
        case None                     => Some(Map.empty[String, Map[Int, Long]])
      }
    }
    if (perFile.isEmpty) return Map.empty
    val common = perFile.map(_.keySet).reduce(_ intersect _)
    common.toSeq.map { c =>
      c -> perFile.flatMap(_(c).toSeq)
        .groupBy(_._1).map { case (b, cs) => b -> cs.map(_._2).sum }
    }.toMap
  }

  /** Exact per-column NULL counts over the (stats-pruned) live file set,
    * from the min/max sidecar lines — a column reports only when every
    * surviving file carries it. Catalyst's `hasCountStats` gate needs
    * nullCount BESIDE distinctCount before aggregate estimation engages,
    * so [[scanNdv]]'s sketches are only half the CBO story.
    */
  def scanNullCounts(base: String, pin: Pin = Pin.Latest,
                     pruneFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil): Map[String, Long] = {
    val m = pinnedManifest(base, pin)
    val kept = FileStats.prune(hadoopConf, m.files, pruneFilters, eraIds(m))
    if (kept.isEmpty) return Map.empty
    val sidecars = kept.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(hadoopConf, d).getOrElse(Map.empty))
      .toMap
    val perFile = kept.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName).map(_.cols).getOrElse(Map.empty)
    }
    val common = perFile.map(_.keySet).reduce(_ intersect _)
    common.toSeq.map(c => c -> perFile.map(_(c).nulls).sum).toMap
  }

  /** The EXACT row count of a pinned state from metadata alone, or None
    * when metadata can't answer exactly: any outstanding deletion vector
    * or equality delete hides rows the sidecars still count, and any
    * live file without a sidecar row count (pre-stats era) leaves a gap.
    * When Some, the value equals `read(...).count()` without opening a
    * single data file — what lets `SELECT count(*)` on a 100 TB table
    * finish in manifest-read time (the connector's aggregate pushdown
    * rides this).
    */
  def exactRowCount(base: String, pin: Pin = Pin.Latest): Option[Long] = {
    val m = pinnedManifest(base, pin)
    if (m.dvs.nonEmpty || m.eqs.nonEmpty) return None
    val conf = hadoopConf
    val sidecars = m.files.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(conf, d).getOrElse(Map.empty))
      .toMap
    val counts = m.files.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName).map(_.rows)
    }
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  /** Exact per-column NULL counts from metadata alone, under the
    * [[exactRowCount]] preconditions (no row-level delete outstanding,
    * complete sidecar coverage): Some(map) of column → total NULLs for
    * every column EVERY live file carries stats for (all domains —
    * parquet null counts are exact regardless of value type). This is
    * what answers `count(col)` = rows − nulls with zero data IO.
    */
  def exactNullCounts(base: String, pin: Pin = Pin.Latest): Option[Map[String, Long]] = {
    val m = pinnedManifest(base, pin)
    if (m.dvs.nonEmpty || m.eqs.nonEmpty) return None
    val conf = hadoopConf
    val sidecars = m.files.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(conf, d).getOrElse(Map.empty))
      .toMap
    val stats = m.files.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName)
    }
    if (stats.exists(_.isEmpty)) return None
    val fs = stats.flatten
    if (fs.isEmpty) return Some(Map.empty)
    // Zero-row files carry no per-column lines; they contribute zero
    // NULLs to every column and must not veto the intersection.
    val bearing = fs.filter(_.rows > 0)
    if (bearing.isEmpty) return Some(Map.empty)
    val ids = eraIds(m)
    val common = bearing.map(_.cols.keySet).reduce(_ intersect _)
      .filter(c => bearing.forall(f => idCompatible(f.cols(c), ids.get(c))))
    Some(common.toSeq.map(c => c -> bearing.map(_.cols(c).nulls).sum).toMap)
  }

  /** A name-keyed stat may serve the current era only when its recorded
    * field id matches (or either side predates ids — legacy files and
    * pre-round-10 sidecars stay usable). A mismatch means the name was
    * reused across rename eras for a different physical column.
    */
  private def idCompatible(c: FileStats.ColStat, expected: Option[Long]): Boolean =
    (c.id, expected) match {
      case (Some(x), Some(e)) => x == e
      case _                  => true
    }

  /** Exact per-column BIGINT min/max from metadata alone, over a pinned
    * state whose [[exactRowCount]] preconditions hold (no row-level
    * delete outstanding, complete sidecar coverage): Some(map) of
    * column → (min, max) for every `long`-domain column EVERY live file
    * carries stats for; a column's pair is (None, None) when all values
    * are NULL. Parquet keeps integer footer stats exact (no truncation —
    * unlike binary/string stats), which is what makes MIN/MAX answerable
    * without opening a file; other domains are deliberately absent
    * (string stats may be truncated, double stats are NaN-hostile).
    */
  def exactLongRanges(base: String, pin: Pin = Pin.Latest): Option[Map[String, (Option[Long], Option[Long])]] = {
    val m = pinnedManifest(base, pin)
    if (m.dvs.nonEmpty || m.eqs.nonEmpty) return None
    val conf = hadoopConf
    val sidecars = m.files.groupBy(f => new Path(f).getParent).keys
      .map(d => d -> FileStats.readSidecar(conf, d).getOrElse(Map.empty))
      .toMap
    val stats = m.files.map { f =>
      val p = new Path(f)
      sidecars(p.getParent).get(p.getName)
    }
    if (stats.exists(_.isEmpty)) return None
    val fs = stats.flatten
    if (fs.isEmpty) return Some(Map.empty)
    val ids = eraIds(m)
    val common = fs.map(_.cols.keySet).reduce(_ intersect _)
      .filter(c => fs.forall(f => idCompatible(f.cols(c), ids.get(c))))
    Some(common.toSeq.flatMap { c =>
      val cs = fs.map(_.cols(c))
      if (cs.exists(_.t != "long")) None
      else {
        val mins = cs.flatMap(_.min).map(_.toLong)
        val maxs = cs.flatMap(_.max).map(_.toLong)
        Some(c -> (mins.minOption, maxs.maxOption))
      }
    }.toMap)
  }

  /** [[read]] with a pushed-down predicate: `cond`'s conjuncts translate
    * to data-source filters (the same translation Spark's own scan
    * planning uses), prune files through the stats sidecars, and the FULL
    * `cond` still filters surviving rows — so this is exactly
    * `read(...).filter(cond)` with planning-time file skipping on top.
    */
  def readWhere(spark: SparkSession, base: String,
                cond: org.apache.spark.sql.Column,
                asOf: Option[Long] = None): DataFrame = {
    val pin = asOf.map(Pin.AsOf).getOrElse(Pin.Latest)
    // Translation needs the table schema only (an analyzer probe over an
    // empty frame — no file IO, so pruning can drop files the plan never
    // has to see). Legacy header-less tables infer from their footers.
    val schema = pinnedSchema(base, pin)
      .getOrElse(scanPinned(spark, base, pin).schema)
    val filters = org.apache.spark.sql.graft.Bridge.pushableFilters(spark, schema, cond)
    scanPinned(spark, base, pin, filters).filter(cond)
  }

  /** Read the table at `asOf` (default: latest committed version).
    * `mergeSchema = true` unions the footers of every live file, so a
    * table that gained columns across appends reads with the full schema
    * (old rows NULL in the new columns) — additive evolution, the same
    * contract as `RangeQuery.queryEvolved`. Off by default: footer-union
    * planning costs one footer read per file and the common case is a
    * stable schema.
    */
  def read(spark: SparkSession, base: String, asOf: Option[Long] = None,
           mergeSchema: Boolean = false): DataFrame =
    scanPinned(spark, base, asOf.map(Pin.AsOf).getOrElse(Pin.Latest),
      mergeSchema = mergeSchema)

  /** Incremental read: rows in `toV`'s file set but not `fromV`'s — the
    * appended data between two snapshots, consumed as a file-list diff
    * (no data-side anti join; CDC for the append-only path). Deletion-
    * vector deletes are metadata-only and deliberately do NOT appear here;
    * diff the versions' dv lines for a row-level delete feed.
    */
  def changes(spark: SparkSession, base: String, fromV: Long, toV: Long,
              withRowIds: Boolean = false): DataFrame = {
    val before = readManifest(base, fromV).files.toSet
    val added = readManifest(base, toV).files.filterNot(before)
    // A no-file delta (empty-DataFrame commit, or fromV == toV) must be an
    // empty result with the right schema, not a zero-path read error.
    if (added.isEmpty)
      scanPinned(spark, base, Pin.AsOf(toV), withRowIds = withRowIds)
        .filter(org.apache.spark.sql.functions.lit(false))
    // Added files read under toV's era schema (they were written in it);
    // an id-tracked delta therefore surfaces current names.
    else {
      val sch = readManifest(base, toV).schema
      if (!withRowIds) readWithSchema(spark, sch, added)
      else decorateRowIds(
        readWithSchema(spark, sch.map(withRowIdField), added),
        lineageFirsts(base))
    }
  }

  /** [[changes]] restricted to files added by APPENDING commits: each
    * step's file diff is attributed to its commit, and steps whose base
    * mode is `overwrite` (compaction / replacement), `rollback` or
    * `fastforward` contribute nothing — so a mid-stream compact does not
    * re-deliver the rows it physically rewrote. This is the
    * `skipOverwrites` contract of [[graft.connector.GraftDataSource]]'s
    * stream source (Iceberg's incremental append scan takes the same
    * stance). Files appended then compacted away INSIDE the window still
    * deliver from their original batch dirs — retention (`expire` age)
    * must therefore cover consumer lag, the standard incremental-read
    * contract.
    */
  def changesSkippingOverwrites(spark: SparkSession, base: String,
                                fromV: Long, toV: Long): DataFrame = {
    val window = versions(base).filter(v => v > fromV && v <= toV).sorted
    val skip = Set("overwrite", "rollback", "fastforward", "replace-table")
    var prev =
      if (fromV == 0) Set.empty[String] else readManifest(base, fromV).files.toSet
    val added = Seq.newBuilder[String]
    for (v <- window) {
      val m = readManifest(base, v)
      if (!skip(modeOf(base, v).takeWhile(_ != ':')))
        added ++= m.files.filterNot(prev)
      prev = m.files.toSet
    }
    val files = added.result()
    if (files.isEmpty)
      read(spark, base, Some(toV)).filter(org.apache.spark.sql.functions.lit(false))
    else readWithSchema(spark, readManifest(base, toV).schema, files)
  }

  /** The complement of [[changes]]: rows HIDDEN between two versions by
    * deletion vectors added in the window — the subtractive half of a
    * row-level change feed (changes = inserts, removedRows = deletes;
    * a merge's updates appear in both, new value there, old value here).
    * Cost is proportional to the DV-dirty file set, never the table:
    * only files the new vectors reference are read, inner-joined against
    * the (rows-deleted-sized) vector coordinates.
    */
  def removedRows(spark: SparkSession, base: String, fromV: Long, toV: Long,
                  withRowIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, substring_index}
    val mFrom = readManifest(base, fromV)
    val mTo = readManifest(base, toV)
    val newDvs = mTo.dvs.filterNot(mFrom.dvs.toSet)
    val newEqPaths = mTo.eqs.filterNot(mFrom.eqs.toSet).toSet
    val toEqBatches = loadEqBatches(mTo)
    val newEqBatches = toEqBatches.filter(_.keyFiles.exists(newEqPaths))
    val oldEqBatches = toEqBatches.filterNot(_.keyFiles.exists(newEqPaths))
    if (newDvs.isEmpty && newEqBatches.isEmpty)
      return scanPinned(spark, base, Pin.AsOf(toV), withRowIds = withRowIds)
        .filter(lit(false))
    // Lineage decoration happens at the scan root (before the coordinate
    // joins), so the delete half of a row-id feed names WHICH row died.
    def readF(sch: Option[StructType], files: Seq[String]) =
      if (!withRowIds) readWithSchema(spark, sch, files)
      else decorateRowIds(
        readWithSchema(spark, sch.map(withRowIdField), files),
        lineageFirsts(base))
    def coords(df: DataFrame) = df
      .withColumn(DvFileCol, substring_index(col("_metadata.file_path"), "/", -3))
      .withColumn(DvPosCol, col("_metadata.row_index"))
    val liveRel = mTo.files.map(relKey).toSet
    // Equality anti/semi join against a batch's key set (file membership
    // as an InSet residual, same shape as the read path) — `semi=false`
    // subtracts matched rows, `semi=true` keeps only them.
    def eqJoin(df: DataFrame, batches: Seq[EqBatch], semi: Boolean): DataFrame =
      batches.filter(_.refs.exists(liveRel)).foldLeft(df) { (d, b) =>
        val keys = spark.read.parquet(b.keyFiles: _*)
          .select(b.keyCols.map(c => col(c).as(s"_graft_eq_$c")): _*)
        val cond = b.keyCols.map(c => d(c) === keys(s"_graft_eq_$c"))
          .reduce(_ && _) &&
          d(DvFileCol).isInCollection(b.refs.filter(liveRel))
        d.join(keys, cond, if (semi) "left_semi" else "left_anti")
      }
    // Semi over the UNION of new-eq batches needs one pass per batch with
    // accumulation, not a fold of semis (a fold would intersect). Collect
    // each batch's hits and de-duplicate by coordinate.
    def eqHits(df: DataFrame): Option[DataFrame] = {
      val hits = newEqBatches.filter(_.refs.exists(liveRel)).map(b =>
        eqJoin(df, Seq(b), semi = true))
      if (hits.isEmpty) None
      else Some(hits.reduce(_.unionByName(_)).dropDuplicates(DvFileCol, DvPosCol))
    }
    // The referenced files are live at toV (merge/delete carry all parent
    // files); read them under toV's schema so a post-rename consumer sees
    // current names in BOTH halves of the feed.
    val dvHalf: Option[DataFrame] =
      if (newDvs.isEmpty) None
      else {
        val dv = spark.read.parquet(newDvs: _*)
          .withColumnRenamed("dv_file", DvFileCol)
          .withColumnRenamed("dv_pos", DvPosCol)
        val dirtyRel = dv.select(DvFileCol).distinct().collect().map(_.getString(0)).toSet
        val dirty = mTo.files.filter(f => dirtyRel(relKey(f)))
        // DV WRITERS scan with all deletes applied, so their vectors
        // never reference rows already hidden at their commit — but
        // [[convertEqToDv]]'s vector references EXACTLY the rows fromV's
        // equality deletes were hiding. Subtract fromV's eq state so a
        // window spanning a conversion reports nothing for it (the rows
        // were not visible at fromV).
        val raw = coords(readF(mTo.schema, dirty))
          .join(dv, Seq(DvFileCol, DvPosCol), "inner")
        Some(eqJoin(raw, loadEqBatches(mFrom), semi = false))
      }
    // Equality half: rows hidden by the window's new eq batches that were
    // VISIBLE at fromV — eq deletes are written blind (no target scan), so
    // their keys may hit rows already DV- or eq-hidden; subtract the full
    // toV DV state (covers old and new vectors — a row can't be removed
    // here if a DV also claims it: the dv half owns it) and fromV's eq
    // state before keeping the new-eq matches.
    val eqHalf: Option[DataFrame] =
      if (newEqBatches.isEmpty) None
      else {
        val eqDirtyRel = newEqBatches.flatMap(_.refs).filter(liveRel).toSet
        val dirty = mTo.files.filter(f => eqDirtyRel(relKey(f)))
        if (dirty.isEmpty) None
        else {
          val scan0 = coords(readF(mTo.schema, dirty))
          val noDv =
            if (mTo.dvs.isEmpty) scan0
            else scan0.join(
              spark.read.parquet(mTo.dvs: _*)
                .withColumnRenamed("dv_file", DvFileCol)
                .withColumnRenamed("dv_pos", DvPosCol),
              Seq(DvFileCol, DvPosCol), "left_anti")
          val visibleAtFrom = eqJoin(noDv, oldEqBatches, semi = false)
          eqHits(visibleAtFrom)
        }
      }
    val parts = Seq(dvHalf, eqHalf).flatten
    if (parts.isEmpty)
      scanPinned(spark, base, Pin.AsOf(toV), withRowIds = withRowIds)
        .filter(lit(false))
    else parts.reduce(_.unionByName(_)).drop(DvFileCol, DvPosCol)
  }

  /** Change data feed (Delta's CDF / Iceberg's changelog, re-expressed):
    * every row-level change in `(fromV, toV]`, one commit at a time, as
    * the table's columns plus `_change_type` ('insert' | 'delete'),
    * `_commit_version` and `_commit_ts`. A merge's update appears as a
    * delete of the old row and an insert of the new one (the storage
    * truth — consumers needing update pairing join the halves on key).
    * `fromV = 0` starts before the first commit, so v1's rows feed as
    * inserts.
    *
    * Cost is proportional to CHANGED data, never the table: the insert
    * half of each step is a manifest file-diff ([[changes]]) and the
    * delete half reads only delete-referenced files ([[removedRows]]).
    * A row inserted and deleted within the window appears twice (once per
    * commit) — the feed is a log, not a net diff, so downstream
    * accumulators (incremental MVs) stay exact.
    *
    * Commit modes and the feed:
    *  - `append` / `merge` / `merge-eq` / `delete-dv` / `delete-eq` /
    *    `alter:*` feed exactly;
    *  - `overwrite` (compaction / full replacement) commits are SKIPPED:
    *    a compact is a physical rewrite with no logical change (skipping
    *    is exact), and a full replacement's row-level feed would be the
    *    whole table, which callers should read directly (Iceberg's
    *    incremental read takes the same stance);
    *  - `rollback` / `fastforward` commits REFUSE loudly: they rewrite
    *    table state wholesale with no incremental attribution, and
    *    skipping them would silently diverge feed consumers (mirrors);
    *    re-seed downstream from a full read, then resume the feed;
    *  - copy-on-write `delete` commits REFUSE loudly: the file diff
    *    cannot attribute their rewritten survivors, so a CDC-consumed
    *    table should delete via [[deleteWhereDV]] / [[deleteByKeys]]
    *    (merge-on-read) instead.
    */
  /** `withRowIds = true` (lineage tables only) adds the durable `_row_id`
    * to every feed row: a merge's update pairs by ID instead of by key
    * (the delete half carries the id the insert half keeps), the
    * mechanical join downstream CDC consumers actually want. */
  def changeFeed(spark: SparkSession, base: String, fromV: Long,
                 toV: Long, withRowIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(!withRowIds || rowLineageEnabled(base),
      s"changeFeed(withRowIds) requires row lineage on $base - call " +
        "enableRowLineage first")
    val vs = versions(base)
    require(fromV == 0 || vs.contains(fromV),
      s"unknown feed start version $fromV")
    require(vs.contains(toV), s"unknown feed end version $toV")
    require(fromV < toV, s"empty feed window ($fromV, $toV]")
    val window = vs.filter(v => v > fromV && v <= toV).sorted
    def stamp(df: DataFrame, tpe: String, v: Long): DataFrame = {
      // The three feed metadata columns are appended to each step's era
      // schema; a table column with the same name would be silently
      // REPLACED by withColumn — refuse feed construction instead of
      // emitting a feed whose "_change_type" is not what the consumer
      // thinks it is.
      val clash = df.columns.toSet
        .intersect(Set("_change_type", "_commit_version", "_commit_ts"))
      require(clash.isEmpty,
        s"table schema already contains feed metadata column(s) " +
          s"${clash.mkString(", ")} - rename them (ALTER TABLE ... RENAME " +
          "COLUMN) before consuming the change feed")
      df.withColumn("_change_type", lit(tpe))
        .withColumn("_commit_version", lit(v))
        .withColumn("_commit_ts", lit(commitTsOf(base, v).getOrElse(0L)))
    }
    val steps = window.foldLeft((fromV, Seq.empty[DataFrame])) {
      case ((prev, acc), v) =>
        val mode = modeOf(base, v).takeWhile(_ != ':')
        mode match {
          case "delete" =>
            throw new IllegalStateException(
              s"v$v is a copy-on-write delete - its rewritten files cannot " +
                "be attributed row-level; CDC-consumed tables should delete " +
                "via deleteWhereDV/deleteByKeys (merge-on-read)")
          case "rollback" | "fastforward" | "replace-table" =>
            // A rollback/fast-forward rewrites table state WHOLESALE:
            // rows it restores or removes have no incremental
            // attribution, so silently skipping it (pre-round-9
            // behavior) made replication mirrors diverge without any
            // error. Refuse loudly, like the CoW-delete case — a
            // consumer that rolled back upstream must re-seed from a
            // full read (Iceberg's incremental read takes the same
            // stance on replace operations).
            throw new IllegalStateException(
              s"v$v is a $mode commit - its state change has no row-level " +
                "attribution and skipping it would silently diverge feed " +
                "consumers; re-seed downstream from a full read at or " +
                s"after v$v, then resume the feed from there")
          case "overwrite" | "eq-convert" =>
            // physical rewrite: no row-level feed (see scaladoc);
            // eq-convert is a logical no-op (its vector re-hides rows
            // equality deletes already hid). The step still advances the
            // diff base.
            (v, acc)
          case _ =>
            val ins =
              if (prev == 0) stamp(
                scanPinned(spark, base, Pin.AsOf(v), withRowIds = withRowIds),
                "insert", v)
              else stamp(changes(spark, base, prev, v, withRowIds), "insert", v)
            val del =
              if (prev == 0) None
              else Some(stamp(
                removedRows(spark, base, prev, v, withRowIds), "delete", v))
            (v, acc ++ (Some(ins) ++ del))
        }
    }._2
    if (steps.isEmpty)
      stamp(scanPinned(spark, base, Pin.AsOf(toV), withRowIds = withRowIds),
        "insert", toV).filter(lit(false))
    // Era schemas may differ across the window (renames/adds) — align by
    // name, null-filling columns a step's era lacks (the additive
    // contract; renamed columns fragment by design, same as mergeSchema).
    else if (steps.size <= 64)
      steps.reduce(_.unionByName(_, allowMissingColumns = true))
    else
      // A thousand-commit window would otherwise union a thousand frames
      // into one O(window)-wide Catalyst plan (driver analysis cost, not
      // executor work). Fold in chunks through eager localCheckpoints so
      // the plan stays O(chunk) wide — the feed turns partially eager
      // for monster windows, which every consumer of such a window
      // (replication catch-up, full-history t.changes) materializes
      // anyway.
      steps.grouped(32).map(
        _.reduce(_.unionByName(_, allowMissingColumns = true)).localCheckpoint(true))
        .reduce(_.unionByName(_, allowMissingColumns = true))
  }

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

  private def branchPointer(base: String, name: String) =
    new Path(snapDir(base), s"branch_$name")

  private def branchManifest(base: String, name: String, v: Long) =
    new Path(snapDir(base), f"branch-$name.v$v%08d.manifest")

  private def branchStatuses(base: String, name: String): Seq[FileStatus] =
    listDir(fsFor(base), snapDir(base))
      .filter(_.getPath.getName.matches(
        s"branch-${java.util.regex.Pattern.quote(name)}\\.v\\d{8}\\.manifest"))

  private def branchVersionOf(name: String): Long =
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
  private def branchHeadState(base: String, name: String): (Seq[String], Seq[String], Seq[String]) = {
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
