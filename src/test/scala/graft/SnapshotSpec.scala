package graft

import org.apache.spark.sql.functions._
import graft.ingest.Snapshots

/** Guarantees of the snapshot/time-travel layer that the DuckDB oracle
  * can't express: isolation across overwrites, commit-conflict retry,
  * vacuum semantics, and uncommitted-data invisibility.
  */
class SnapshotSpec extends SparkSuite {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("id")).collect().map(_.getLong(0)).toSet

  test("shallow clone: zero-copy create, divergence, maintenance isolation") {
    val sess = spark
    import sess.implicits._
    val src = tmpDir("graft_clone_src")
    Snapshots.commit(spark, (1L to 5L).toDF("id"), src)            // v1
    Snapshots.commit(spark, (6L to 8L).toDF("id"), src)            // v2
    graft.connector.TableProps.write(src, Map("owner" -> "team-a"))
    val dst = tmpDir("graft_clone_dst") + "/t"
    // clone at head: same rows, ZERO data files under the clone's tree
    Snapshots.clone(spark, src, dst)
    assert(ids(Snapshots.read(spark, dst)) === (1L to 8L).toSet)
    val dstData = new java.io.File(dst, "data")
    def ownFiles(d: java.io.File): Seq[String] =
      if (!d.exists) Nil
      else d.listFiles.toSeq.flatMap(b =>
        Option(b.listFiles).toSeq.flatten.map(_.getName))
        .filter(_.endsWith(".parquet"))
    assert(ownFiles(dstData).isEmpty, "clone copied data")
    // a version-pinned clone sees that version's rows
    val dstV1 = tmpDir("graft_clone_dstv1") + "/t"
    Snapshots.clone(spark, src, dstV1, Some(Snapshots.versions(src).min))
    assert(ids(Snapshots.read(spark, dstV1)) === (1L to 5L).toSet)
    // properties carried + lineage recorded
    val props = graft.connector.TableProps.read(dst)
    assert(props("owner") === "team-a")
    assert(props("clone.source").startsWith(src))
    // divergence: append + DV delete on the clone; source unchanged
    Snapshots.commit(spark, (9L to 10L).toDF("id"), dst)
    Snapshots.deleteWhereDV(spark, dst, col("id") === 1L)
    assert(ids(Snapshots.read(spark, dst)) === (2L to 10L).toSet)
    assert(ids(Snapshots.read(spark, src)) === (1L to 8L).toSet)
    // schema divergence: rename on the clone binds shared files by field
    // id; the source keeps its name
    Snapshots.renameColumn(dst, "id", "key")
    assert(Snapshots.read(spark, dst).columns.toSeq === Seq("key"))
    assert(Snapshots.read(spark, src).columns.toSeq === Seq("id"))
    // clone maintenance never deletes shared files: expire to last
    // version + orphan sweep on dst leaves src fully readable
    Snapshots.expire(dst, keepLast = 1)
    Snapshots.removeOrphans(dst, olderThanMs = 0L)
    assert(ids(Snapshots.read(spark, src)) === (1L to 8L).toSet)
    assert(Snapshots.read(spark, dst).count() === 9L)
    // refusals: existing target; source version with outstanding deletes
    intercept[IllegalArgumentException] { Snapshots.clone(spark, src, dst) }
    Snapshots.deleteWhereDV(spark, src, col("id") === 2L)
    val eDv = intercept[IllegalArgumentException] {
      Snapshots.clone(spark, src, tmpDir("graft_clone_dst2") + "/t")
    }
    assert(eDv.getMessage.contains("outstanding row-level deletes"))
    // ...but a pre-delete version still clones
    val preDelete = Snapshots.versions(src).sorted.takeRight(2).head
    val dst3 = tmpDir("graft_clone_dst3") + "/t"
    Snapshots.clone(spark, src, dst3, Some(preDelete))
    assert(ids(Snapshots.read(spark, dst3)) === (1L to 8L).toSet)
  }

  test("addFiles adopts foreign parquet zero-copy; maintenance never touches it") {
    val sess = spark
    import sess.implicits._
    // a "pre-existing" parquet tree produced by some other system
    val foreign1 = tmpDir("graft_adopt_src1")
    val foreign2 = tmpDir("graft_adopt_src2")
    (1L to 50L).toDF("id").write.mode("overwrite").parquet(foreign1)
    (51L to 80L).toDF("id").write.mode("overwrite").parquet(foreign2)
    val base = tmpDir("graft_adopt") + "/t"
    val v1 = Snapshots.addFiles(spark, base, Seq(foreign1))
    assert(ids(Snapshots.read(spark, base)) === (1L to 50L).toSet)
    // adopted files live OUTSIDE the table tree, referenced absolutely
    assert(Snapshots.liveFiles(base, v1).forall(_.contains(foreign1)))
    val v2 = Snapshots.addFiles(spark, base, Seq(foreign2))
    assert(ids(Snapshots.read(spark, base)) === (1L to 80L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 50L).toSet)
    // managed commits, DV deletes and the whole table lifecycle compose
    Snapshots.commit(spark, (81L to 90L).toDF("id"), base)
    Snapshots.deleteWhereDV(spark, base, col("id") === 5L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 90L).toSet - 5L))
    // compact rewrites into MANAGED files; the foreign bytes stay put
    Snapshots.compact(spark, base, numFiles = 2)
    assert(Snapshots.liveFiles(base, Snapshots.versions(base).max)
      .forall(f => !f.contains(foreign1) && !f.contains(foreign2)))
    Snapshots.expire(base, keepLast = 1)
    // the producer's files survive every maintenance op
    assert(spark.read.parquet(foreign1).count() === 50L)
    assert(spark.read.parquet(foreign2).count() === 30L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 90L).toSet - 5L))
    // id-tracked tables refuse foreign (id-less) adoption
    val tracked = tmpDir("graft_adopt_tracked")
    Snapshots.commit(spark, (1L to 3L).toDF("id"), tracked)
    intercept[IllegalArgumentException] {
      Snapshots.addFiles(spark, tracked, Seq(foreign1))
    }
  }

  test("append, time travel, and incremental reads see exactly their snapshot") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_tt")
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, (6L to 8L).toDF("id"), base)
    assert(Snapshots.versions(base) === Seq(v1, v2))
    assert(ids(Snapshots.read(spark, base)) === (1L to 8L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 5L).toSet)
    assert(ids(Snapshots.changes(spark, base, v1, v2)) === (6L to 8L).toSet)
  }

  test("the full table lifecycle runs against a non-file scheme (graftfs://)") {
    // The object-store seam for the METADATA layer: manifests, the commit
    // lock, tags, DV sidecars, rollback and expire must all resolve their
    // FileSystem from the base URI's scheme (the registry entry an
    // abfss:// deployment uses), not from java.io. graftfs:// is
    // registered only through fs.graftfs.impl, so any hardcoded local-FS
    // assumption fails here.
    val sess = spark
    import sess.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val base = "graftfs://" + tmpDir("graft_snapshot_scheme") + "/table"
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, (6L to 8L).toDF("id"), base)
    assert(ids(Snapshots.read(spark, base)) === (1L to 8L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 5L).toSet)
    assert(ids(Snapshots.changes(spark, base, v1, v2)) === (6L to 8L).toSet)
    // merge-on-read delete + batch merge, metadata-only ops, introspection
    Snapshots.deleteWhereDV(spark, base, col("id") === 3L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 3L))
    Snapshots.merge(spark, base,
      Seq(2L, 100L).toDF("id"), Seq("id"))
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 3L) + 100L)
    Snapshots.tag(base, "pinned", v1)
    assert(Snapshots.tagVersion(base, "pinned") === v1)
    assert(ids(Snapshots.readTag(spark, base, "pinned")) === (1L to 5L).toSet)
    val rb = Snapshots.rollback(base, v2)
    assert(ids(Snapshots.read(spark, base)) === (1L to 8L).toSet)
    assert(Snapshots.history(spark, base).count() === Snapshots.versions(base).size.toLong)
    assert(Snapshots.filesTable(spark, base).collect().forall(_.getLong(1) > 0))
    // vacuum: tagged v1 survives, dropped versions fail loudly
    Snapshots.expire(base, keepLast = 1)
    assert(ids(Snapshots.readTag(spark, base, "pinned")) === (1L to 5L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(rb))) === (1L to 8L).toSet)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, Some(v2)).collect()
    }
    // round-8 surfaces on the same non-file scheme: equality deletes
    // (keys parquet + _refs.txt sidecar), no-scan upserts, eq→DV
    // conversion and the change feed all resolve their FS by URI scheme
    val fromV = Snapshots.versions(base).max
    Snapshots.deleteByKeys(spark, base, Seq(2L).toDF("id"))
    Snapshots.upsertByKeys(spark, base, Seq(4L, 200L).toDF("id"), Seq("id"))
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 2L) + 200L)
    Snapshots.convertEqToDv(spark, base)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 2L) + 200L)
    val feed = Snapshots.changeFeed(spark, base, fromV, Snapshots.versions(base).max)
      .select(col("_change_type"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed === Set(("delete", 2L), ("delete", 4L),
      ("insert", 4L), ("insert", 200L)))
  }

  test("the full table lifecycle runs on Hadoop's own second FS (viewfs://)") {
    // r14: the same metadata-layer lifecycle as the graftfs case, against
    // a FileSystem implementation we did NOT write — Hadoop's
    // ViewFileSystem, whose client-side mount table re-resolves every
    // path and whose rename REFUSES cross-mount moves. The commit
    // protocol's lock/rename/expire surviving it is stronger seam
    // evidence than a RawLocal subclass: an accidental default-FS
    // assumption, absolute-path rewrite, or cross-root rename all fail
    // loudly here.
    val sess = spark
    import sess.implicits._
    val local = tmpDir("graft_viewfs_snap")
    spark.sparkContext.hadoopConfiguration
      .set("fs.viewfs.mounttable.graftsnap.link./warehouse", "file:" + local)
    val base = "viewfs://graftsnap/warehouse/table"
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, (6L to 8L).toDF("id"), base)
    assert(ids(Snapshots.read(spark, base)) === (1L to 8L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 5L).toSet)
    assert(ids(Snapshots.changes(spark, base, v1, v2)) === (6L to 8L).toSet)
    Snapshots.deleteWhereDV(spark, base, col("id") === 3L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 3L))
    Snapshots.merge(spark, base, Seq(2L, 100L).toDF("id"), Seq("id"))
    assert(ids(Snapshots.read(spark, base)) === ((1L to 8L).toSet - 3L) + 100L)
    Snapshots.tag(base, "pinned", v1)
    assert(ids(Snapshots.readTag(spark, base, "pinned")) === (1L to 5L).toSet)
    val rb = Snapshots.rollback(base, v2)
    assert(ids(Snapshots.read(spark, base)) === (1L to 8L).toSet)
    Snapshots.expire(base, keepLast = 1)
    assert(ids(Snapshots.readTag(spark, base, "pinned")) === (1L to 5L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(rb))) === (1L to 8L).toSet)
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, Some(v2)).collect()
    }
  }

  test("rename/drop resolve by field id across eras (non-additive evolution)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_evolve")
    val v1 = Snapshots.commit(spark, Seq((1L, 10L), (2L, 20L)).toDF("k", "c"), base)
    // metadata-only rename: zero data files rewritten
    val filesBefore = Snapshots.liveFiles(base, v1).toSet
    Snapshots.renameColumn(base, "c", "cust")
    assert(Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet === filesBefore)
    // a new-era file under the new name joins old-era files seamlessly
    Snapshots.commit(spark, Seq((3L, 30L)).toDF("k", "cust"), base)
    def state = Snapshots.read(spark, base).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toSet
    assert(Snapshots.read(spark, base).columns.toSeq === Seq("k", "cust"))
    assert(state === Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "old files must bind the renamed column BY FIELD ID, not by name")
    // time travel BEFORE the rename still sees the era name
    assert(Snapshots.read(spark, base, Some(v1)).columns.toSeq === Seq("k", "c"))
    // additive add (null-fills old files by missing id), then drop it again
    Snapshots.commit(spark, Seq((4L, 40L, "x")).toDF("k", "cust", "note"), base)
    val withNote = Snapshots.read(spark, base)
    assert(withNote.columns.toSeq === Seq("k", "cust", "note"))
    assert(withNote.filter(col("k") === 1L).select("note").head().isNullAt(0))
    Snapshots.dropColumn(base, "note")
    assert(Snapshots.read(spark, base).columns.toSeq === Seq("k", "cust"))
    assert(state === Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    // write-path ops bind the CURRENT name in old-era files too
    Snapshots.deleteWhereDV(spark, base, col("cust") === 10L)
    assert(state === Set((2L, 20L), (3L, 30L), (4L, 40L)))
    Snapshots.merge(spark, base, Seq((2L, 200L)).toDF("k", "cust"), Seq("k"))
    assert(state === Set((2L, 200L), (3L, 30L), (4L, 40L)))
    // compaction materializes under the current schema and stays readable
    Snapshots.compact(spark, base, numFiles = 1)
    assert(state === Set((2L, 200L), (3L, 30L), (4L, 40L)))
    // rollback across the rename restores the old era's NAME as well
    Snapshots.rollback(base, v1)
    assert(Snapshots.read(spark, base).columns.toSeq === Seq("k", "c"))
  }

  test("branches stage commits invisibly; fast-forward publishes atomically (WAP)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_wap")
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id"), base)
    Snapshots.createBranch(base, "audit")
    Snapshots.commitToBranch(spark, (6L to 9L).toDF("id"), base, "audit")
    // staged rows are INVISIBLE to main readers — the audit gate's premise
    assert(ids(Snapshots.read(spark, base)) === (1L to 5L).toSet)
    assert(Snapshots.versions(base) === Seq(v1))
    // the audit read sees fork + staged
    assert(ids(Snapshots.readBranch(spark, base, "audit")) === (1L to 9L).toSet)
    // a second staged commit stacks on the branch
    Snapshots.commitToBranch(spark, Seq(10L).toDF("id"), base, "audit")
    assert(ids(Snapshots.readBranch(spark, base, "audit")) === (1L to 10L).toSet)
    // publish: one metadata commit, main now reflects the branch head
    val v2 = Snapshots.fastForward(base, "audit")
    assert(ids(Snapshots.read(spark, base)) === (1L to 10L).toSet)
    assert(Snapshots.modeOf(base, v2) === "fastforward:audit")
    // pre-publish main is intact under time travel
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 5L).toSet)
    Snapshots.dropBranch(base, "audit")
    assert(Snapshots.branches(base).isEmpty)
    // published data survives the branch's removal and an expire
    Snapshots.expire(base, keepLast = 1)
    assert(ids(Snapshots.read(spark, base)) === (1L to 10L).toSet)
  }

  test("fast-forward refuses a diverged main; expire keeps staged branch data") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_wap_div")
    Snapshots.commit(spark, (1L to 3L).toDF("id"), base)
    Snapshots.createBranch(base, "stage")
    Snapshots.commitToBranch(spark, (4L to 6L).toDF("id"), base, "stage")
    // main advances past the fork — publishing the branch now would drop
    // main's commit, so fastForward must refuse
    Snapshots.commit(spark, (7L to 9L).toDF("id"), base)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.fastForward(base, "stage")
    }
    // vacuum with the branch still staged: the fork manifest is pinned
    // and the branch's data files are live — the audit read must survive
    Snapshots.expire(base, keepLast = 1)
    assert(ids(Snapshots.readBranch(spark, base, "stage")) === (1L to 6L).toSet)
    // duplicate branch names are refused, like tags
    intercept[IllegalArgumentException] { Snapshots.createBranch(base, "stage") }
  }

  test("a renamed table base keeps every snapshot readable (relocatable manifests)") {
    // Manifests store base-relative paths, so moving the whole tree —
    // rename, cp -r, a staging-dir promote like RefParity's snapshot
    // cache — must leave time travel, changes, and deletes working from
    // the new location.
    val sess = spark
    import sess.implicits._
    val staged = tmpDir("graft_snapshot_move") + "/staged"
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id"), staged)
    val v2 = Snapshots.commit(spark, (6L to 8L).toDF("id"), staged)
    val promoted = staged.stripSuffix("staged") + "final"
    assert(new java.io.File(staged).renameTo(new java.io.File(promoted)))
    assert(ids(Snapshots.read(spark, promoted, Some(v1))) === (1L to 5L).toSet)
    assert(ids(Snapshots.read(spark, promoted)) === (1L to 8L).toSet)
    assert(ids(Snapshots.changes(spark, promoted, v1, v2)) === (6L to 8L).toSet)
    // Mutation from the new location still works (deleteWhere reads
    // input_file_name paths — absolute — against resolved manifest lines).
    Snapshots.deleteWhere(spark, promoted, col("id") === 7L)
    assert(ids(Snapshots.read(spark, promoted)) === (1L to 8L).toSet - 7L)
  }

  test("legacy manifests with absolute file paths still resolve") {
    // Manifests written before the relocatable (base-relative) format
    // carry absolute lines; the reader must keep honoring them verbatim.
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_legacy")
    val v1 = Snapshots.commit(spark, (1L to 4L).toDF("id"), base)
    // Rewrite v1's manifest to the legacy absolute form in place.
    val mf = new java.io.File(base, f"_snapshots/v$v1%08d.manifest")
    val lines = java.nio.file.Files.readAllLines(mf.toPath)
    val absolute = new java.lang.StringBuilder(lines.get(0))
    for (i <- 1 until lines.size) {
      absolute.append('\n')
        .append(new java.io.File(base, lines.get(i)).getAbsolutePath)
    }
    java.nio.file.Files.writeString(mf.toPath, absolute.toString)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 4L).toSet)
    // An append on top of a legacy manifest carries its files forward
    // (re-relativized where they live under base).
    val v2 = Snapshots.commit(spark, Seq(5L).toDF("id"), base)
    assert(ids(Snapshots.read(spark, base, Some(v2))) === (1L to 5L).toSet)
  }

  test("overwrite isolates old readers until expire reclaims their files") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_ow")
    val v1 = Snapshots.commit(spark, (1L to 4L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, (10L to 12L).toDF("id"), base, mode = "overwrite")
    // new readers see only the overwrite; v1 stays fully readable
    assert(ids(Snapshots.read(spark, base)) === (10L to 12L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(v1))) === (1L to 4L).toSet)
    Snapshots.expire(base, keepLast = 1)
    assert(Snapshots.versions(base) === Seq(v2))
    // the expired version fails loudly; the survivor still reads in full
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, base, Some(v1))
    }
    assert(ids(Snapshots.read(spark, base)) === (10L to 12L).toSet)
  }

  test("a conflicting claim on the next version is retried, not clobbered") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_cc")
    val v1 = Snapshots.commit(spark, Seq(1L).toDF("id"), base)
    // another writer has claimed v2 but not finished: zero-length manifest
    val claimed = new java.io.File(s"$base/_snapshots", "v00000002.manifest")
    java.nio.file.Files.createFile(claimed.toPath)
    val v = Snapshots.commit(spark, Seq(2L).toDF("id"), base)
    assert(v === 3L, "commit must skip the claimed version, not overwrite it")
    assert(claimed.length() === 0, "the in-flight claim must be untouched")
    // the in-flight v2 never committed, so reads resolve latest = v3
    assert(ids(Snapshots.read(spark, base)) === Set(1L, 2L))
    assert(ids(Snapshots.changes(spark, base, v1, v)) === Set(2L))
  }

  test("deleteWhere rewrites only files containing matches, carrying the rest by path") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_del")
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id").repartition(1), base)
    val v2 = Snapshots.commit(spark, (6L to 10L).toDF("id").repartition(1), base)
    val v3 = Snapshots.deleteWhere(spark, base, col("id") === 7L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 10L).toSet - 7L))
    // time travel still sees the deleted row
    assert(ids(Snapshots.read(spark, base, Some(v2))).contains(7L))
    // file granularity: the 1..5 file must be carried verbatim, the 6..10
    // file replaced — exactly one shared path between v2 and v3
    val before = Snapshots.liveFiles(base, v2).toSet
    val after = Snapshots.liveFiles(base, v3).toSet
    assert((before intersect after).size === 1, "untouched file should carry by path")
    assert((after diff before).nonEmpty, "matching file should be rewritten")
    // no-match delete publishes nothing
    assert(Snapshots.deleteWhere(spark, base, col("id") === 999L) === v3)
  }

  test("deleteWhere keeps NULL-predicate rows (SQL DELETE three-valued logic)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_delnull")
    // one file holding a NULL-x row alongside the matching row
    val df = Seq((1L, Some(7L)), (2L, None: Option[Long]), (3L, Some(9L)))
      .toDF("id", "x").repartition(1)
    Snapshots.commit(spark, df, base)
    Snapshots.deleteWhere(spark, base, col("x") === 7L)
    // only x=7 is deleted; the NULL-x row in the rewritten file SURVIVES —
    // a bare filter(!cond) would silently drop it (cond is NULL there)
    assert(ids(Snapshots.read(spark, base)) === Set(2L, 3L))
  }

  test("deleteWhere aborts when a concurrent overwrite rewrote its touched files") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_delconf")
    Snapshots.commit(spark, (1L to 5L).toDF("id").repartition(1), base)
    Snapshots.commit(spark, (6L to 10L).toDF("id").repartition(1), base)
    // A compact lands between deleteWhere's manifest read and its publish:
    // the parent manifest now holds compacted files that still CONTAIN
    // id=7 — carrying them would resurrect the deleted row and duplicate
    // the survivors from the rewrite. Must abort, not silently corrupt.
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.deleteWhere(spark, base, col("id") === 7L,
        beforePublish = () => { Snapshots.compact(spark, base, numFiles = 1); () })
    }
    // the table is untouched by the failed delete: compact's rows all live
    assert(ids(Snapshots.read(spark, base)) === (1L to 10L).toSet)
    // a concurrent APPEND during the same window still carries fine
    val v = Snapshots.deleteWhere(spark, base, col("id") === 7L,
      beforePublish = () =>
        { Snapshots.commit(spark, Seq(99L).toDF("id").repartition(1), base); () })
    assert(ids(Snapshots.read(spark, base, Some(v))) === ((1L to 10L).toSet - 7L) + 99L)
  }

  test("compact shrinks the live file count without changing rows or history") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_cp")
    for (i <- 0 until 4)
      Snapshots.commit(spark, Seq(i.toLong).toDF("id").repartition(1), base)
    val pre = Snapshots.versions(base).max
    assert(Snapshots.liveFiles(base, pre).size === 4)
    val vc = Snapshots.compact(spark, base, numFiles = 1)
    assert(Snapshots.liveFiles(base, vc).size === 1)
    assert(ids(Snapshots.read(spark, base)) === (0L to 3L).toSet)
    assert(ids(Snapshots.read(spark, base, Some(pre))) === (0L to 3L).toSet)
  }

  test("concurrent appends from racing writers all land (optimistic commit stress)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_race")
    // 8 writers: the 4-writer variant never tripped the raw-local
    // check-then-act lock hole (POSIX rename overwrites, so a double
    // entry CLOBBERS a manifest silently) that the O_EXCL claim fixes —
    // more contention keeps the regression reachable.
    val writers = 8
    val perWriter = 5
    // Each thread commits its own disjoint id batches; the claim loop must
    // serialize them so no append is lost and versions stay contiguous.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            for (i <- 0 until perWriter) {
              val id = (w * perWriter + i).toLong
              Snapshots.commit(spark, Seq(id).toDF("id"), base)
            }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val vs = Snapshots.versions(base)
    assert(vs.size === writers * perWriter, s"every commit must publish: $vs")
    assert(ids(Snapshots.read(spark, base)) === (0L until (writers * perWriter).toLong).toSet,
      "no append may be lost to a commit race")
  }

  test("data files without a manifest are invisible to readers") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_gc")
    Snapshots.commit(spark, Seq(1L, 2L).toDF("id"), base)
    // simulate a failed job: files written under data/ but never committed
    Seq(99L).toDF("id").write.parquet(s"$base/data/b_orphan")
    assert(ids(Snapshots.read(spark, base)) === Set(1L, 2L))
  }

  test("deletion-vector delete hides rows without rewriting any data file") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_dv")
    val v1 = Snapshots.commit(spark, (1L to 5L).toDF("id").repartition(1), base)
    val v2 = Snapshots.commit(spark, (6L to 10L).toDF("id").repartition(1), base)
    val v3 = Snapshots.deleteWhereDV(spark, base, col("id") === 7L)
    // merge-on-read result ≡ the copy-on-write result
    assert(ids(Snapshots.read(spark, base)) === ((1L to 10L).toSet - 7L))
    // but EVERY data file carries by path — nothing was rewritten
    assert(Snapshots.liveFiles(base, v3).toSet === Snapshots.liveFiles(base, v2).toSet)
    // time travel still sees the deleted row
    assert(ids(Snapshots.read(spark, base, Some(v2))).contains(7L))
    // deleting an already-DV-deleted row is a no-op, not a new version —
    // and its staged (empty, unreferenced) vector dir is removed, not
    // left to accumulate under data/
    def dvDirs = new java.io.File(base, "data").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("dv_"))
    val dvDirsBefore = dvDirs
    assert(Snapshots.deleteWhereDV(spark, base, col("id") === 7L) === v3)
    assert(dvDirs === dvDirsBefore, "no-op delete must not leave an orphan dv dir")
    // a second vector stacks on the first
    Snapshots.deleteWhereDV(spark, base, col("id") === 2L)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 10L).toSet -- Set(2L, 7L)))
    // NULL-predicate rows survive (SQL DELETE three-valued logic)
    val v5 = Snapshots.deleteWhereDV(spark, base, col("id") =!= col("id"))
    assert(ids(Snapshots.read(spark, base, Some(v5))) === ((1L to 10L).toSet -- Set(2L, 7L)))
  }

  test("DV read plans the anti join on the dirty slice only (clean files scan plain)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_dvplan")
    Snapshots.commit(spark, (1L to 5L).toDF("id").repartition(1), base)
    Snapshots.commit(spark, (6L to 10L).toDF("id").repartition(1), base)
    Snapshots.deleteWhereDV(spark, base, col("id") === 7L)
    val df = Snapshots.read(spark, base)
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val extra = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ extra).flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    // exactly one anti join — the dirty file's subtraction; the clean
    // file's branch reaches the union as a bare scan with no join above it
    val joins = nodes.filter(_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(joins.size === 1, s"expected one anti join, got:\n${df.queryExecution.executedPlan}")
    assert(joins.head.asInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]
      .joinType.toString == "LeftAnti")
    val scans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    // data-file scans: one clean + one dirty (+1 for the dv sidecar read)
    assert(scans.size === 3, s"expected 3 scans, got ${scans.size}")
  }

  test("rollback restores an old version as a new commit, history intact") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_rb")
    val v1 = Snapshots.commit(spark, (1L to 3L).toDF("id"), base)
    Snapshots.commit(spark, (4L to 6L).toDF("id"), base)
    Snapshots.deleteWhereDV(spark, base, col("id") === 2L)
    val rb = Snapshots.rollback(base, v1)
    // latest reads v1's exact state (pre-append, pre-delete, DVs dropped)
    assert(ids(Snapshots.read(spark, base)) === (1L to 3L).toSet)
    // history is append-only: the rolled-over versions still time-travel
    assert(ids(Snapshots.read(spark, base, Some(rb - 1))) === ((1L to 6L).toSet - 2L))
    // the rollback is itself undoable
    Snapshots.rollback(base, rb - 1)
    assert(ids(Snapshots.read(spark, base)) === ((1L to 6L).toSet - 2L))
  }

  test("tags pin versions through expire; history and files tables introspect") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_tag")
    val v1 = Snapshots.commit(spark, (1L to 3L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, (4L to 6L).toDF("id"), base)
    val v3 = Snapshots.commit(spark, (7L to 9L).toDF("id"), base)
    Snapshots.tag(base, "train-v1", v1)
    // retagging an existing name must fail, not repoint
    intercept[IllegalArgumentException] { Snapshots.tag(base, "train-v1", v2) }
    assert(ids(Snapshots.readTag(spark, base, "train-v1")) === (1L to 3L).toSet)
    // history rows carry lineage + tag labels without touching data files
    val h = Snapshots.history(spark, base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getSeq[String](r.fieldIndex("tags"))))
    assert(h.map(x => (x._1, x._2)).toSeq === Seq((v1, 0L), (v2, v1), (v3, v2)))
    assert(h.find(_._1 == v1).get._4 === Seq("train-v1"))
    assert(Snapshots.filesTable(spark, base).collect()
      .forall(r => r.getString(0).startsWith("data/") && r.getLong(1) > 0))
    // expire keeps the newest AND the tagged version; v2 goes
    Snapshots.expire(base, keepLast = 1)
    assert(Snapshots.versions(base) === Seq(v1, v3))
    assert(ids(Snapshots.readTag(spark, base, "train-v1")) === (1L to 3L).toSet)
    // dropping the tag releases the pin
    Snapshots.dropTag(base, "train-v1")
    Snapshots.expire(base, keepLast = 1)
    assert(Snapshots.versions(base) === Seq(v3))
  }

  test("merge upserts atomically: updates replace, inserts append, no file rewritten") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_merge")
    val v1 = Snapshots.commit(spark,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v").repartition(1), base)
    // update k=2, insert k=9
    val v2 = Snapshots.merge(spark,
      base, Seq((2L, 99L), (9L, 90L)).toDF("k", "v"), Seq("k"))
    val after = Snapshots.read(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === Set((1L, 10L), (2L, 99L), (3L, 30L), (9L, 90L)))
    // merge-on-read: the v1 data file carries by path (plus the new batch)
    assert(Snapshots.liveFiles(base, v1).toSet.subsetOf(
      Snapshots.liveFiles(base, v2).toSet))
    // time travel pre-merge
    assert(Snapshots.read(spark, base, Some(v1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // a second merge updating the FIRST merge's insert hits the appended
    // file's rows through a stacked vector
    Snapshots.merge(spark, base, Seq((9L, 91L)).toDF("k", "v"), Seq("k"))
    assert(Snapshots.read(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (2L, 99L), (3L, 30L), (9L, 91L)))
  }

  test("merge aborts on ANY concurrent data commit (upsert serializability)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_mergeconf")
    Snapshots.commit(spark, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), base)
    // A concurrent append lands between merge's scan and its publish; if
    // it carried silently, both its (2L, 77L) and the merge's (2L, 99L)
    // would survive — duplicate keys. Must abort instead.
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.merge(spark, base, Seq((2L, 99L)).toDF("k", "v"), Seq("k"),
        beforePublish = () => {
          Snapshots.commit(spark, Seq((2L, 77L)).toDF("k", "v"), base); ()
        })
    }
    // the failed merge left no visible state; a retry from the new
    // version upserts cleanly over both rows for k=2
    Snapshots.merge(spark, base, Seq((2L, 99L)).toDF("k", "v"), Seq("k"))
    assert(Snapshots.read(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 10L), (2L, 99L)))
  }

  test("additive schema evolution: mergeSchema read unions columns across appends") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_evo")
    Snapshots.commit(spark, Seq((1L, "x")).toDF("id", "a"), base)
    Snapshots.commit(spark, Seq((2L, "y", 9L)).toDF("id", "a", "b"), base)
    // default read keeps a stable schema; evolved read unions footers —
    // old rows NULL in the new column
    val evolved = Snapshots.read(spark, base, mergeSchema = true)
    assert(evolved.columns.toSet === Set("id", "a", "b"))
    val rows = evolved.select("id", "b").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(rows === Set((1L, None), (2L, Some(9L))))
    // evolution composes with deletion vectors: DV-delete an old-schema
    // row, evolved read still unions and subtracts correctly
    Snapshots.deleteWhereDV(spark, base, col("id") === 1L)
    assert(Snapshots.read(spark, base, mergeSchema = true)
      .select("id").collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("changes over a no-file delta is empty with the right schema") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_emptydelta")
    val v1 = Snapshots.commit(spark, Seq(1L).toDF("id"), base)
    val v2 = Snapshots.commit(spark, spark.emptyDataset[Long].toDF("id"), base)
    val d = Snapshots.changes(spark, base, v1, v2)
    assert(d.columns.toSeq === Seq("id") && d.isEmpty)
  }

  test("compact materializes deletion vectors; relocation keeps them valid") {
    val sess = spark
    import sess.implicits._
    val staged = tmpDir("graft_snapshot_dvmove") + "/staged"
    Snapshots.commit(spark, (1L to 8L).toDF("id").repartition(2), staged)
    Snapshots.deleteWhereDV(spark, staged, col("id") >= 7L)
    // DV coordinates are base-relative like manifest lines — a renamed
    // table tree must keep subtracting them
    val promoted = staged.stripSuffix("staged") + "final"
    assert(new java.io.File(staged).renameTo(new java.io.File(promoted)))
    assert(ids(Snapshots.read(spark, promoted)) === (1L to 6L).toSet)
    // copy-on-write delete refuses while vectors are outstanding (its raw
    // touched-file rewrite would resurrect DV-deleted rows)
    intercept[IllegalArgumentException] {
      Snapshots.deleteWhere(spark, promoted, col("id") === 1L)
    }
    // compaction folds the vectors into plain files: same rows, no dv
    // entries left, and copy-on-write works again
    val vc = Snapshots.compact(spark, promoted, numFiles = 1)
    assert(ids(Snapshots.read(spark, promoted, Some(vc))) === (1L to 6L).toSet)
    Snapshots.deleteWhere(spark, promoted, col("id") === 1L)
    assert(ids(Snapshots.read(spark, promoted)) === (2L to 6L).toSet)
  }

  test("removeOrphans reclaims unreferenced files, respects grace + branches") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_orphan")
    Snapshots.commit(spark, (1L to 5L).toDF("id"), base)
    Snapshots.createBranch(base, "wip")
    Snapshots.commitToBranch(spark, (6L to 7L).toDF("id"), base, "wip")
    // a crashed writer's never-published batch: bytes on disk, no manifest
    val orphanDir = new java.io.File(base, "data/b_orphan00")
    orphanDir.mkdirs()
    (8L to 9L).toDF("id").repartition(1).write.mode("overwrite")
      .parquet(orphanDir.getPath + "/stage")
    val orphan = new java.io.File(orphanDir.getPath + "/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(orphan.renameTo(new java.io.File(orphanDir, "part-orphan.parquet")))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(orphanDir.getPath + "/stage"))
    // inside the grace period nothing moves (an in-flight commit's batch
    // looks exactly like this)
    assert(Snapshots.removeOrphans(base).isEmpty)
    // past the grace period: the orphan goes, live + branch files stay
    val swept = Snapshots.removeOrphans(base, olderThanMs = -10000L)
    assert(swept.size === 1 && swept.head.contains("part-orphan"))
    assert(!orphanDir.exists()) // emptied batch dir removed too
    assert(ids(Snapshots.read(spark, base)) === (1L to 5L).toSet)
    assert(ids(Snapshots.readBranch(spark, base, "wip")) === (1L to 7L).toSet)
    // idempotent
    assert(Snapshots.removeOrphans(base, olderThanMs = -10000L).isEmpty)
  }

  test("last-column-id survives drop + expire; neither evolution path reuses ids") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_lastid")
    Snapshots.commit(spark,
      Seq((1L, "old-b1"), (2L, "old-b2")).toDF("a", "b"), base)
    Snapshots.dropColumn(base, "b")
    // expire prunes the pre-drop manifests - the burned id must survive
    // in the CURRENT manifest's header, not be re-derived from history
    Snapshots.expire(base, keepLast = 1)
    // path 1: APPEND with a fresh column (commit-side minting). Id reuse
    // would bind c to b's bytes in the v1 files -> 'old-b1' not null.
    Snapshots.commit(spark, Seq((3L, "new-c")).toDF("a", "c"), base)
    val got = Snapshots.read(spark, base).orderBy("a").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got === Seq(1L -> None, 2L -> None, 3L -> Some("new-c")))
    // path 2: ALTER ADD with another fresh column after another drop of
    // the (again) highest id
    Snapshots.dropColumn(base, "c")
    Snapshots.addColumn(base, "d", org.apache.spark.sql.types.StringType)
    val got2 = Snapshots.read(spark, base).orderBy("a").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got2 === Seq(1L -> None, 2L -> None, 3L -> None))
  }

  test("ADD COLUMN refuses id-less stale sidecar stats under the re-added name") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_addreuse")
    Snapshots.commit(spark, Seq((1L, 10L), (2L, 20L)).toDF("a", "x"), base)
    // Regress the live files' sidecars to the pre-field-id era: drop the
    // trailing id column from every `c` line (7-field legacy format).
    // idCompatible's (None, _) => true would then serve x's old min/max/
    // null stats to ANY reader id — including a freshly re-added x.
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = Snapshots.liveFiles(base, Snapshots.versions(base).max)
      .map(f => new org.apache.hadoop.fs.Path(f).getParent).distinct
    def sidecarOf(d: org.apache.hadoop.fs.Path) =
      new org.apache.hadoop.fs.Path(d, graft.ingest.FileStats.SidecarName)
    dirs.foreach { d =>
      val fs = d.getFileSystem(conf)
      val in = fs.open(sidecarOf(d))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val legacy = text.linesIterator.map { l =>
        val p = l.split("\t", -1)
        if (p.head == "c" && p.length == 8) p.init.mkString("\t") else l
      }.mkString("\n")
      val out = fs.create(sidecarOf(d), true)
      try out.write(legacy.getBytes("UTF-8")) finally out.close()
    }
    Snapshots.dropColumn(base, "x")
    val e = intercept[IllegalStateException] {
      Snapshots.addColumn(base, "x", org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("id-less"), e.getMessage)
    // a name never recorded in any sidecar adds fine
    Snapshots.addColumn(base, "y", org.apache.spark.sql.types.LongType)
    // repair path: rewriting the sidecars from the footers records the
    // old physical x under its own field id, which the fresh column's
    // new id can never match — the re-add then proceeds
    dirs.foreach { d =>
      val files = d.getFileSystem(conf).listStatus(d)
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq
      graft.ingest.FileStats.writeSidecar(conf, d, files)
    }
    Snapshots.addColumn(base, "x", org.apache.spark.sql.types.LongType)
    val got = Snapshots.read(spark, base).orderBy("a")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    assert(got === Seq(1L -> None, 2L -> None), got.toString)
  }

  test("commits to a non-atomic store fail loudly, not as silent lost updates") {
    // The default file-lock protocol's CAS primitives (exclusive create,
    // rename-no-overwrite) do not exist on plain S3-class stores — there
    // a concurrent commit would be LOST SILENTLY. The guard must turn
    // that into an up-front refusal with remediation in the message,
    // removable only by an explicit conf assertion. graftfs:// stands in
    // for the lax store by listing it in nonAtomicSchemes.
    val sess = spark
    import sess.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val base = "graftfs://" + tmpDir("graft_lax_store") + "/table"
    spark.conf.set("spark.graft.commit.nonAtomicSchemes", "s3,s3a,s3n,oss,graftfs")
    try {
      val e = intercept[IllegalStateException] {
        Snapshots.commit(spark, Seq(1L).toDF("id"), base)
      }
      assert(e.getMessage.contains("lockStrategy"))
      // no torn state: the refused commit left nothing behind
      assert(Snapshots.versions(base).isEmpty)
      // explicit override (externally-serialized writers) proceeds
      spark.conf.set("spark.graft.commit.allowNonAtomicStore", "true")
      Snapshots.commit(spark, Seq(1L, 2L).toDF("id"), base)
      assert(Snapshots.read(spark, base).count() === 2)
    } finally {
      spark.conf.unset("spark.graft.commit.nonAtomicSchemes")
      spark.conf.unset("spark.graft.commit.allowNonAtomicStore")
    }
  }

  test("an external CommitLock strategy plugs in by FQCN and serializes commits") {
    val sess = spark
    import sess.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val base = "graftfs://" + tmpDir("graft_lock_seam") + "/table"
    // An external lock on a lax-listed scheme must BYPASS the guard: the
    // user-provided strategy is the assertion that commits are serialized.
    spark.conf.set("spark.graft.commit.nonAtomicSchemes", "s3,s3a,s3n,oss,graftfs")
    spark.conf.set("spark.graft.commit.lockStrategy",
      classOf[CountingCommitLock].getName)
    try {
      CountingCommitLock.acquisitions.set(0)
      val v1 = Snapshots.commit(spark, Seq(1L, 2L).toDF("id"), base)
      Snapshots.commit(spark, Seq(3L).toDF("id"), base)
      assert(CountingCommitLock.acquisitions.get() >= 2,
        "every commit must pass through the configured lock")
      assert(Snapshots.read(spark, base).count() === 3)
      assert(Snapshots.read(spark, base, Some(v1)).count() === 2)
    } finally {
      spark.conf.unset("spark.graft.commit.lockStrategy")
      spark.conf.unset("spark.graft.commit.nonAtomicSchemes")
    }
  }

  test("merge and DV-delete plan only the files their keys/condition can touch") {
    val sess = spark
    import sess.implicits._
    import graft.ingest.FileStats
    val base = tmpDir("graft_merge_prune")
    Snapshots.commit(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      base, sortCols = Seq("id"))
    val conf = spark.sparkContext.hadoopConfiguration
    val all = Snapshots.liveFiles(base, Snapshots.versions(base).max)
    assert(all.size >= 3)
    // the missing-file proof (same as ConnectorSpec's): delete a file
    // whose stats CANNOT hold any id <= 10 — if the merge/delete scans
    // were unpruned they would plan it and fail
    val lowCapable = FileStats.prune(conf, all,
      Seq(org.apache.spark.sql.sources.LessThanOrEqual("id", 10L))).toSet
    val victim = (all.toSet -- lowCapable).head
    new java.io.File(new java.net.URI("file:" + victim).getPath).delete()
    intercept[Exception] { Snapshots.read(spark, base).count() }
    // batch-sized upsert against low keys: target scan prunes to the low
    // files, so the missing high file is never planned
    Snapshots.merge(spark, base,
      Seq((3L, "NEW3"), (7L, "NEW7"), (200L, "ins")).toDF("id", "v"), Seq("id"))
    // selective DV delete, same discipline through the cond translation
    Snapshots.deleteWhereDV(spark, base, col("id") === 4L)
    val state = Snapshots.readWhere(spark, base, col("id") <= 10L || col("id") === 200L)
      .as[(Long, String)].collect().toMap
    assert(state(3L) === "NEW3" && state(7L) === "NEW7" && state(200L) === "ins")
    assert(!state.contains(4L) && state(5L) === "v5")
  }

  test("write.binpack.max-small-files auto-compacts small-file debt") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snap_autobin")
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.BinpackMaxSmallFiles -> "3"))
    // tiny commits accrete small files until the count bound trips; then
    // the COMMITTING WRITER binpacks - latest mode flips to overwrite and
    // the live set collapses to the single merged file
    var v = 0L
    var rounds = 0
    while (Snapshots.modeOf(base,
        { v = Snapshots.commit(spark,
            Seq((rounds.toLong, rounds.toLong)).toDF("k", "s"), base); v })
        .takeWhile(_ != ':') != "overwrite" && rounds < 10) rounds += 1
    assert(rounds < 10, "auto binpack never triggered")
    assert(Snapshots.liveFiles(base, v).size === 1)
    // rows all survived the fold
    assert(Snapshots.read(spark, base).count() === rounds + 1L)
    // debt below the bound after the fold: the next commit does NOT
    // immediately re-binpack
    val v2 = Snapshots.commit(spark, Seq((100L, 100L)).toDF("k", "s"), base)
    assert(Snapshots.modeOf(base, v2).takeWhile(_ != ':') === "append")
    // malformed bound refuses loudly
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.BinpackMaxSmallFiles -> "soon"))
    intercept[IllegalArgumentException] {
      Snapshots.commit(spark, Seq((200L, 200L)).toDF("k", "s"), base)
    }
  }

  test("history.expire.* auto-retention bounds history; tags survive; age guards") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snap_autoexp")
    // two pre-retention commits; tag the FIRST as a reproducibility pin
    Snapshots.commit(spark, Seq((1L, 1L)).toDF("k", "s"), base)
    Snapshots.commit(spark, Seq((2L, 2L)).toDF("k", "s"), base)
    val pinnedV = Snapshots.versions(base).min
    Snapshots.tag(base, "pin", pinnedV)
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.ExpireMinSnapshots -> "3"))
    // N appends past the bound: history stays at <= 3 + the pinned tag
    (3L to 10L).foreach(i =>
      Snapshots.commit(spark, Seq((i, i)).toDF("k", "s"), base))
    val vs = Snapshots.versions(base)
    assert(vs.size === 4, s"expected 3 kept + 1 pinned, got ${vs.size}")
    assert(vs.contains(pinnedV))
    // the pinned version still reads, and the head lost no rows
    assert(Snapshots.read(spark, base, Some(pinnedV)).count() === 1)
    assert(Snapshots.read(spark, base).count() === 10)
    // age guard: an enormous max-age protects everything young — history
    // grows past the count bound
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.ExpireMinSnapshots -> "3",
        graft.connector.TableProps.ExpireMaxAgeMs -> (24L * 3600 * 1000).toString))
    (11L to 13L).foreach(i =>
      Snapshots.commit(spark, Seq((i, i)).toDF("k", "s"), base))
    assert(Snapshots.versions(base).size === 7)
    // age 0 = every version past the count bound is old enough
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.ExpireMinSnapshots -> "3",
        graft.connector.TableProps.ExpireMaxAgeMs -> "0"))
    Snapshots.commit(spark, Seq((14L, 14L)).toDF("k", "s"), base)
    assert(Snapshots.versions(base).size === 4)
    assert(Snapshots.read(spark, base).count() === 14)
    // malformed properties must NOT fail the commit: the hook runs after
    // publish() made it durable, so a throw here would report a failed
    // write that actually committed (and a retry double-writes). The DDL
    // route refuses bad values at SET TBLPROPERTIES time instead
    // (CatalogSpec); the path-level smuggle warn-and-skips.
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.ExpireMinSnapshots -> "several"))
    Snapshots.commit(spark, Seq((15L, 15L)).toDF("k", "s"), base)
    assert(Snapshots.read(spark, base).count() === 15)
    // and history is untouched by the skipped hook
    assert(Snapshots.versions(base).size === 5)
  }

  test("auto-retention on the streaming sink path bounds an unattended table") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmpDir("graft_snap_autoexp_sink")
    // keepLast = 2 keeps the newest batch-tagged commit alive even if a
    // maintenance commit lands after it, preserving the sink's
    // re-delivery detection
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.ExpireMinSnapshots -> "2"))
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("k").writeStream.format("graft")
      .option("path", base)
      .option("checkpointLocation", tmpDir("graft_snap_autoexp_ckpt"))
      .start()
    try {
      (1L to 6L).foreach { i => mem.addData(i); q.processAllAvailable() }
    } finally q.stop()
    // six micro-batch commits, history bounded at 2, all rows live
    assert(Snapshots.versions(base).size === 2)
    assert(Snapshots.read(spark, base).count() === 6)
  }

  test("write.check.* constraints gate every new-data path, NULLs pass") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_snap_check")
    Snapshots.commit(spark, Seq((1L, 10L)).toDF("k", "v"), base)
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.CheckPrefix + "v_positive" -> "v > 0"))
    // valid append passes; violating append refuses and commits NOTHING
    Snapshots.commit(spark, Seq((2L, 20L)).toDF("k", "v"), base)
    val vBefore = Snapshots.versions(base).max
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(spark, Seq((3L, -1L)).toDF("k", "v"), base)
    }
    assert(e.getMessage.contains("v_positive"))
    assert(Snapshots.versions(base).max === vBefore)
    // SQL CHECK semantics: a NULL predicate outcome PASSES
    Snapshots.commit(spark,
      Seq((4L, null.asInstanceOf[java.lang.Long])).toDF("k", "v"), base)
    // upsert and merge insert legs are gated too
    intercept[IllegalArgumentException] {
      Snapshots.upsertByKeys(spark, base, Seq((1L, -5L)).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Snapshots.merge(spark, base, Seq((1L, -5L)).toDF("k", "v"), Seq("k"))
    }
    // deletes (no new data) remain unaffected
    Snapshots.deleteByKeys(spark, base, Seq(2L).toDF("k"))
    assert(kvState(base) === Map(1L -> Some(10L), 4L -> None))
    // an unevaluable predicate names itself instead of a planner stack
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.CheckPrefix + "bad" -> "no_such_col > 0"))
    val e2 = intercept[IllegalArgumentException] {
      Snapshots.commit(spark, Seq((5L, 50L)).toDF("k", "v"), base)
    }
    assert(e2.getMessage.contains("bad"))
  }

  test("CHECK validates the rows actually committed, not a plan re-execution") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val base = tmpDir("graft_snap_check_nondet")
    Snapshots.commit(spark, Seq((1L, 10L)).toDF("k", "v"), base)
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.CheckPrefix + "v_positive" -> "v > 0"))
    FlakySource.executions.set(0)
    val flaky = udf(() => FlakySource.next()).asNondeterministic()
    // Single row: one udf invocation per plan execution. Execution #1
    // (the write itself) yields a VALID row; any RE-execution yields a
    // violating one. The gate must bless exactly the written rows — so
    // this commit succeeds and the committed value is the first
    // execution's. A check-the-input-plan-then-write scheme either
    // commits the violating re-executed row (silent bypass) or refuses a
    // write whose actual data was valid.
    Snapshots.commit(spark,
      spark.range(1).select((col("id") + 100L).as("k"), flaky().as("v")), base)
    val vs = Snapshots.read(spark, base).select("v").as[Long].collect()
    assert(vs.forall(_ > 0), s"committed rows must satisfy the CHECK, got ${vs.toSeq}")
  }

  private def kvState(base: String): Map[Long, Option[Long]] =
    Snapshots.read(spark, base).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("keyFilters derives sound envelopes from a key frame") {
    val sess = spark
    import sess.implicits._
    import graft.ingest.FileStats
    // multi-column keys: per-column range + In envelopes
    val keys = Seq((5L, "b"), (9L, "a")).toDF("k1", "k2")
    val fs = FileStats.keyFilters(keys).get
    import org.apache.spark.sql.sources._
    assert(fs.contains(GreaterThanOrEqual("k1", 5L)) && fs.contains(LessThanOrEqual("k1", 9L)))
    assert(fs.collect { case In("k2", vs) => vs.toSet }.head === Set("a", "b"))
    // an all-null key column can never equi-match: everything prunable
    assert(FileStats.keyFilters(
      Seq((1L, null), (2L, null)).map { case (a, b) => (a, b: String) }.toDF("k1", "k2")).isEmpty)
    // empty frame: same
    assert(FileStats.keyFilters(Seq.empty[(Long, String)].toDF("k1", "k2")).isEmpty)
    // over-cap: range-only (no In), still Some
    val big = FileStats.keyFilters(spark.range(100).toDF("k"), maxInKeys = 10).get
    assert(big.exists { case _: GreaterThanOrEqual => true; case _ => false })
    assert(!big.exists { case _: In => true; case _ => false })
  }
}

/** Test [[graft.ingest.Snapshots.CommitLock]]: counts acquisitions and
  * serializes through a JVM-local mutex (what a DynamoDB/ZooKeeper-backed
  * implementation would do across drivers). Top-level with a no-arg
  * constructor — the seam instantiates it reflectively from conf.
  */
class CountingCommitLock extends graft.ingest.Snapshots.CommitLock {
  def withLock[T](base: String)(body: => T): T =
    CountingCommitLock.synchronized {
      CountingCommitLock.acquisitions.incrementAndGet()
      body
    }
}

object CountingCommitLock {
  val acquisitions = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Deliberately non-deterministic "source" for the CHECK re-execution
  * probe: the first plan execution yields a valid value, every later one
  * a violating value. Static singleton so executor-side invocations
  * (same JVM in local mode) share the counter.
  */
object FlakySource {
  val executions = new java.util.concurrent.atomic.AtomicInteger(0)
  def next(): Long = if (executions.getAndIncrement() == 0) 5L else -100L
}
