package graft.ingest

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}
import java.nio.charset.StandardCharsets.UTF_8

/** Field-id schema tracking: column identity, rename/drop/add/widen/
  * default, time-travel era schemas.
  *
  * Split from the monolithic Snapshots.scala along its section seams
  * (round 16); mixed into [[Snapshots]], whose scaladoc carries the
  * design overview. `private[ingest]` on members is the trait-split
  * rendering of the old object-private visibility.
  */
trait SnapshotSchemaOps { self: Snapshots.type =>


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

  private[ingest] val FieldIdKey = "parquet.field.id"

  import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

  private[ingest] def fieldId(f: StructField): Long = f.metadata.getLong(FieldIdKey)

  /** Current-era name → field id from a manifest's schema header (empty
    * for legacy header-less tables). The alias guard for name-keyed
    * sidecar stats: after a rename chain that reuses a name, stats a
    * file recorded under that name in an EARLIER era describe a
    * different physical column — consumers pass this map so such stats
    * are ignored (conservative) instead of misread.
    */
  private[ingest] def eraIds(m: Manifest): Map[String, Long] =
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
  private[ingest] def withFieldIds(df: DataFrame, parentSchema: Option[StructType],
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

  private[ingest] def readWithSchema(spark: SparkSession, schema: Option[StructType],
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
  private[ingest] def guardNameReuse(m: Manifest, from: String, to: String): Unit = {
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
  private[ingest] def guardAddNameReuse(m: Manifest, name: String): Unit = {
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
  private[ingest] def guardEqKeyColumn(name: String): Manifest => Unit = m =>
    if (loadEqBatches(m).exists(_.keyCols.contains(name)))
      throw new IllegalStateException(
        s"column $name is a key column of an outstanding equality delete " +
          "(eq keys bind by name) - run compact() to materialize row-level " +
          "deletes before renaming or dropping it")

  /** `xf` maps (parent schema, parent last-column-id) → (new schema, new
    * last-column-id), resolved against the true parent INSIDE the commit
    * lock — a retried publish re-runs it against the winner's state.
    */
  private[ingest] def alterSchema(base: String, mode: String,
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
  private[ingest] def listParquet(spark: SparkSession, dir: Path): Seq[String] =
    listDir(dir.getFileSystem(spark.sparkContext.hadoopConfiguration), dir)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
}
