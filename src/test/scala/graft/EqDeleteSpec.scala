package graft

import org.apache.spark.sql.functions._
import graft.ingest.Snapshots

/** Equality deletes ([[Snapshots.deleteByKeys]] / [[Snapshots.upsertByKeys]])
  * and the change feed ([[Snapshots.changeFeed]]) — the guarantees SQL
  * can't express: zero-target-IO physics, sequence (refs-pinning)
  * semantics, DV/eq stacking, compaction materialization, relocation,
  * conflict aborts, and exact removedRows accounting under blind deletes.
  */
class EqDeleteSpec extends SparkSuite {

  private def kv(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("k"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def seed(base: String, n: Int = 20): Long = {
    val sess = spark
    import sess.implicits._
    Snapshots.commit(spark,
      (1L to n.toLong).map(i => (i, i * 10L)).toDF("k", "v"),
      base, sortCols = Seq("k"))
  }

  test("deleteByKeys hides matching rows with no data file written or rewritten") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_basic")
    val v1 = seed(base)
    val filesBefore = Snapshots.liveFiles(base, v1)
    val v2 = Snapshots.deleteByKeys(spark, base,
      Seq(3L, 7L, 999L).toDF("k")) // 999 absent: matches nothing, still fine
    assert(v2 > v1)
    // physics: the data file list is IDENTICAL — no rewrite, no new files
    assert(Snapshots.liveFiles(base, v2) === filesBefore)
    assert(kv(Snapshots.read(spark, base)).keySet === ((1L to 20L).toSet -- Set(3L, 7L)))
    // time travel still sees the pre-delete rows
    assert(kv(Snapshots.read(spark, base, Some(v1))).keySet === (1L to 20L).toSet)
  }

  test("rows re-inserted after an equality delete survive (refs pinned at commit)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_seq")
    seed(base)
    Snapshots.deleteByKeys(spark, base, Seq(5L).toDF("k"))
    assert(!kv(Snapshots.read(spark, base)).contains(5L))
    // re-insert the key: the new file is not in the delete's refs
    Snapshots.commit(spark, Seq((5L, 5000L)).toDF("k", "v"), base)
    assert(kv(Snapshots.read(spark, base))(5L) === 5000L)
    // and deleting it AGAIN hides only the new row's generation
    Snapshots.deleteByKeys(spark, base, Seq(5L).toDF("k"))
    assert(!kv(Snapshots.read(spark, base)).contains(5L))
  }

  test("no-op equality deletes publish nothing") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_noop")
    val v1 = seed(base)
    // empty keys, all-NULL keys, and fully-pruned keys all return v1
    assert(Snapshots.deleteByKeys(spark, base,
      Seq.empty[Long].toDF("k")) === v1)
    assert(Snapshots.deleteByKeys(spark, base,
      Seq[java.lang.Long](null).toDF("k")) === v1)
    assert(Snapshots.deleteByKeys(spark, base,
      Seq(java.lang.Long.MAX_VALUE).toDF("k")) === v1)
    assert(Snapshots.versions(base) === Seq(v1))
  }

  test("upsertByKeys matches merge semantics without touching target data") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_upsert")
    val v1 = seed(base)
    val filesBefore = Snapshots.liveFiles(base, v1).toSet
    val src = Seq((2L, 222L), (4L, 444L), (100L, 1000L)).toDF("k", "v")
    val v2 = Snapshots.upsertByKeys(spark, base, src, Seq("k"))
    val got = kv(Snapshots.read(spark, base))
    assert(got(2L) === 222L && got(4L) === 444L && got(100L) === 1000L)
    assert(got(1L) === 10L && got.size === 21)
    // old files all carried untouched; only the source batch is new
    assert(filesBefore.subsetOf(Snapshots.liveFiles(base, v2).toSet))
    // equivalent merge on a sibling table produces the same rows
    val base2 = tmpDir("graft_eq_upsert_ref")
    seed(base2)
    Snapshots.merge(spark, base2, src, Seq("k"))
    assert(kv(Snapshots.read(spark, base2)) === got)
  }

  test("DV deletes and equality deletes stack on the same table") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_stack")
    seed(base)
    Snapshots.deleteWhereDV(spark, base, col("k") <= 2L)     // hides 1, 2
    Snapshots.deleteByKeys(spark, base, Seq(2L, 3L).toDF("k")) // 2 doubly, 3 newly
    Snapshots.upsertByKeys(spark, base,
      Seq((4L, 40404L), (1L, 10101L)).toDF("k", "v"), Seq("k"))
    val got = kv(Snapshots.read(spark, base))
    assert(!got.contains(2L) && !got.contains(3L))
    assert(got(1L) === 10101L) // upsert resurrects a DV-deleted key with new value
    assert(got(4L) === 40404L)
    assert(got(5L) === 50L)
    assert(got.size === 18)
  }

  test("compact materializes equality deletes and lifts the rename guard") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_compact")
    seed(base)
    Snapshots.deleteByKeys(spark, base, Seq(1L, 2L).toDF("k"))
    // rename of the eq key column refuses while the delete is outstanding
    val e = intercept[IllegalStateException] {
      Snapshots.renameColumn(base, "k", "key")
    }
    assert(e.getMessage.contains("equality delete"))
    val expected = kv(Snapshots.read(spark, base))
    Snapshots.compact(spark, base, numFiles = 2)
    assert(kv(Snapshots.read(spark, base)) === expected)
    // materialized: a fresh CoW delete (which refuses under eqs) now works
    Snapshots.deleteWhere(spark, base, col("k") === 4L)
    assert(!kv(Snapshots.read(spark, base)).contains(4L))
    Snapshots.renameColumn(base, "k", "key") // guard lifted
    assert(Snapshots.read(spark, base).columns.contains("key"))
  }

  test("a widen refused for an outstanding eq key keeps its Bloom sidecar") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_widen_guard")
    Snapshots.commit(spark,
      (1 to 10).map(i => (i, i * 10L)).toDF("k", "v"), base)
    Snapshots.deleteByKeys(spark, base, Seq(3).toDF("k"))
    // a staged directory stands in for the index (the contract under
    // test is "refused widen touches nothing", not the index build)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sc = new org.apache.hadoop.fs.Path(
      graft.ingest.BloomIndex.sidecar(base, "k"))
    fs.mkdirs(sc)
    // widening an outstanding eq delete's key column refuses in the
    // PRE-check — before the sidecar invalidation, not only inside the
    // commit lock — so the healthy index survives the refusal
    val e = intercept[IllegalStateException] {
      Snapshots.widenColumn(base, "k", org.apache.spark.sql.types.LongType)
    }
    assert(e.getMessage.contains("equality delete"))
    assert(fs.exists(sc), "refused widen must not destroy the Bloom sidecar")
    // compaction materializes the delete; the widen then lands and
    // invalidates the sidecar as designed
    Snapshots.compact(spark, base, numFiles = 1)
    Snapshots.widenColumn(base, "k", org.apache.spark.sql.types.LongType)
    assert(!fs.exists(sc))
    assert(kv(Snapshots.read(spark, base)).keySet === ((1L to 10L).toSet - 3L))
  }

  test("a relocated table still applies its equality deletes") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_move") + "/t"
    seed(base)
    Snapshots.deleteByKeys(spark, base, Seq(9L, 10L).toDF("k"))
    val moved = tmpDir("graft_eq_moved") + "/t2"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(base), new java.io.File(moved))
    assert(kv(Snapshots.read(spark, moved)).keySet ===
      ((1L to 20L).toSet -- Set(9L, 10L)))
  }

  test("concurrent compact aborts an in-flight deleteByKeys; appends abort upsertByKeys") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_conflict")
    seed(base)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.deleteByKeys(spark, base, Seq(1L).toDF("k"),
        beforePublish = () => { Snapshots.compact(spark, base, 1); () })
    }
    val base2 = tmpDir("graft_eq_conflict2")
    seed(base2)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.upsertByKeys(spark, base2,
        Seq((1L, 111L)).toDF("k", "v"), Seq("k"),
        beforePublish = () =>
          { Snapshots.commit(spark, Seq((50L, 500L)).toDF("k", "v"), base2); () })
    }
  }

  test("removedRows accounts equality deletes exactly (no double count, blind keys)") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_removed")
    val v1 = seed(base, n = 10)
    // DV-hide 1 first; then a BLIND eq delete of {1, 2}: 1 was already
    // hidden, so the window's removed rows must be exactly {1's dv row}
    // then {2} — never 1 twice.
    val v2 = Snapshots.deleteWhereDV(spark, base, col("k") === 1L)
    val v3 = Snapshots.deleteByKeys(spark, base, Seq(1L, 2L).toDF("k"))
    assert(kv(Snapshots.removedRows(spark, base, v2, v3)).keySet === Set(2L))
    assert(kv(Snapshots.removedRows(spark, base, v1, v3)).keySet === Set(1L, 2L))
    // an upsert window: removed = old generations of matched keys only
    val v4 = Snapshots.upsertByKeys(spark, base,
      Seq((3L, 303L), (77L, 770L)).toDF("k", "v"), Seq("k"))
    val rem = Snapshots.removedRows(spark, base, v3, v4)
    assert(kv(rem) === Map(3L -> 30L))
  }

  test("incremental MV refresh stays exact across upsertByKeys and deleteByKeys") {
    val sess = spark
    import sess.implicits._
    val src = tmpDir("graft_eq_mv") + "/src"
    val mv = tmpDir("graft_eq_mv") + "/mv"
    // groups of 4 keys each sharing g = k % 5
    Snapshots.commit(spark,
      (1L to 20L).map(i => (i, i % 5, i * 10L)).toDF("k", "g", "v"), src,
      sortCols = Seq("k"))
    graft.ingest.MatView.refresh(spark, mv, src, Seq("g"), "v")
    Snapshots.upsertByKeys(spark, src,
      Seq((2L, 2L % 5, 99999L), (21L, 21L % 5, 7L)).toDF("k", "g", "v"), Seq("k"))
    Snapshots.deleteByKeys(spark, src, Seq(5L, 10L).toDF("k"))
    graft.ingest.MatView.refresh(spark, mv, src, Seq("g"), "v")
    val got = Snapshots.read(spark, mv)
      .select(col("g"), col("n_rows"), col("sum_v")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = Snapshots.read(spark, src)
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("changeFeed replays inserts and deletes per commit") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_cdc")
    val v1 = seed(base, n = 6) // 1..6
    val v2 = Snapshots.commit(spark,
      Seq((7L, 70L), (8L, 80L)).toDF("k", "v"), base)
    val v3 = Snapshots.deleteWhereDV(spark, base, col("k") === 2L)
    val v4 = Snapshots.upsertByKeys(spark, base,
      Seq((3L, 333L), (9L, 90L)).toDF("k", "v"), Seq("k"))
    val feed = Snapshots.changeFeed(spark, base, 0L, v4)
      .select(col("_commit_version"), col("_change_type"), col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = (1L to 6L).map(i => (v1, "insert", i, i * 10L)).toSet ++
      Set((v2, "insert", 7L, 70L), (v2, "insert", 8L, 80L),
        (v3, "delete", 2L, 20L),
        (v4, "insert", 3L, 333L), (v4, "insert", 9L, 90L),
        (v4, "delete", 3L, 30L))
    assert(feed === want)
    // commit timestamps ride every row and are monotone with version
    val ts = Snapshots.changeFeed(spark, base, 0L, v4)
      .select(col("_commit_version"), col("_commit_ts")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ts.map(_._2).sorted === ts.map(_._2).toSeq)
    assert(ts.forall(_._2 > 0L))
  }

  test("changeFeed skips compaction and refuses copy-on-write deletes") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_cdc2")
    val v1 = seed(base, n = 4)
    val v2 = Snapshots.compact(spark, base, numFiles = 1)
    val v3 = Snapshots.commit(spark, Seq((5L, 50L)).toDF("k", "v"), base)
    // compact contributes nothing; the append after it feeds normally
    val feed = Snapshots.changeFeed(spark, base, v1, v3)
      .select(col("_commit_version"), col("_change_type"), col("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(feed === Set((v3, "insert", 5L)))
    val v4 = Snapshots.deleteWhere(spark, base, col("k") === 1L)
    val e = intercept[IllegalStateException] {
      Snapshots.changeFeed(spark, base, v3, v4)
    }
    assert(e.getMessage.contains("copy-on-write"))
  }

  test("convertEqToDv folds accumulated eq deletes into one vector, rows unchanged") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_eq_convert")
    seed(base)
    // a small DV first, then a stack of eq batches (the streaming shape)
    Snapshots.deleteWhereDV(spark, base, col("k") === 20L)
    Snapshots.deleteByKeys(spark, base, Seq(1L).toDF("k"))
    Snapshots.upsertByKeys(spark, base, Seq((2L, 222L), (30L, 300L)).toDF("k", "v"), Seq("k"))
    Snapshots.deleteByKeys(spark, base, Seq(3L, 30L).toDF("k"))
    val before = kv(Snapshots.read(spark, base))
    assert(before.get(2L).contains(222L) && !before.contains(30L) &&
      !before.contains(1L) && !before.contains(3L) && !before.contains(20L))
    val filesBefore = Snapshots.liveFiles(base, Snapshots.versions(base).max)
    val v = Snapshots.convertEqToDv(spark, base)
    // physics: same data files, no eq lines left, rows identical
    assert(Snapshots.liveFiles(base, v) === filesBefore)
    assert(Snapshots.history(spark, base)
      .filter(col("version") === v)
      .select("n_eqs").head().getLong(0) === 0L)
    assert(kv(Snapshots.read(spark, base)) === before)
    // idempotent: nothing outstanding -> no new version
    assert(Snapshots.convertEqToDv(spark, base) === v)
    // time travel to the pre-conversion version still applies eqs
    assert(kv(Snapshots.read(spark, base, Some(v - 1))) === before)
    // and post-conversion life continues: another upsert + read
    Snapshots.upsertByKeys(spark, base, Seq((2L, 7L)).toDF("k", "v"), Seq("k"))
    assert(kv(Snapshots.read(spark, base))(2L) === 7L)
  }

  test("write.eq-delete.max-batches auto-folds outstanding eq batches") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_eq_auto")
    seed(base)
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.EqDeleteMaxBatches -> "2"))
    def latestMode = Snapshots.modeOf(base, Snapshots.versions(base).max)
    def nEqsLatest = Snapshots.history(spark, base)
      .orderBy(col("version").desc).select("n_eqs").head().getLong(0)
    // batches 1 and 2 stay at/under the bound: no conversion commit
    Snapshots.upsertByKeys(spark, base, Seq((1L, 11L)).toDF("k", "v"), Seq("k"))
    Snapshots.deleteByKeys(spark, base, Seq(2L).toDF("k"))
    assert(latestMode === "delete-eq")
    assert(nEqsLatest > 0L)
    // batch 3 exceeds the bound: the writer itself folds them into one DV
    val v = Snapshots.upsertByKeys(spark, base,
      Seq((3L, 33L), (30L, 300L)).toDF("k", "v"), Seq("k"))
    assert(latestMode === "eq-convert")
    assert(Snapshots.versions(base).max === v) // returned version IS post-fold
    assert(nEqsLatest === 0L) // <= 1 outstanding batch (here: zero)
    // state is exact after the fold
    val got = kv(Snapshots.read(spark, base))
    assert(got(1L) === 11L && !got.contains(2L) && got(3L) === 33L &&
      got(30L) === 300L && got(4L) === 40L)
    // and a malformed bound refuses loudly instead of silently skipping
    graft.connector.TableProps.write(base,
      Map(graft.connector.TableProps.EqDeleteMaxBatches -> "often"))
    intercept[IllegalArgumentException] {
      Snapshots.upsertByKeys(spark, base, Seq((5L, 55L)).toDF("k", "v"), Seq("k"))
    }
  }

  test("auto maintenance interplay: eq-fold + binpack stay exact under a mixed op stream") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_eq_automix")
    seed(base, 10)
    graft.connector.TableProps.write(base, Map(
      graft.connector.TableProps.EqDeleteMaxBatches -> "2",
      graft.connector.TableProps.BinpackMaxSmallFiles -> "8"))
    val model = scala.collection.mutable.Map((1L to 10L).map(i => i -> i * 10L): _*)
    // deterministic 18-op mix: appends, keyed upserts, keyed deletes
    for (i <- 1 to 18) {
      i % 3 match {
        case 0 => // append a fresh key
          val k = 100L + i
          Snapshots.commit(spark, Seq((k, k)).toDF("k", "v"), base)
          model(k) = k
        case 1 => // upsert an existing + a fresh key
          val (k1, k2) = ((i % 10) + 1L, 200L + i)
          Snapshots.upsertByKeys(spark, base,
            Seq((k1, i * 1000L), (k2, k2)).toDF("k", "v"), Seq("k"))
          model(k1) = i * 1000L; model(k2) = k2
        case _ => // delete a key (may or may not exist)
          val k = (i % 12) + 1L
          Snapshots.deleteByKeys(spark, base, Seq(k).toDF("k"))
          model.remove(k)
      }
      assert(kv(Snapshots.read(spark, base)) === model.toMap, s"diverged after op $i")
    }
    // both debts bounded by their properties at the end of the stream
    val m = Snapshots.versions(base).max
    val eqBatches = Snapshots.history(spark, base)
      .orderBy(col("version").desc).select("n_eqs").head().getLong(0)
    assert(eqBatches <= 2L * 4, // <= max-batches worth of sidecar FILES (4 shuffle parts)
      s"eq debt unbounded: $eqBatches sidecar files at v$m")
    assert(Snapshots.liveFiles(base, m).size <= 8 + 4,
      s"small-file debt unbounded: ${Snapshots.liveFiles(base, m).size} files")
  }

  test("changeFeed refuses rollback/fastforward commits instead of diverging") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_feed_rb")
    val v1 = seed(base, 5)
    val v2 = Snapshots.commit(spark, Seq((50L, 500L)).toDF("k", "v"), base)
    val v3 = Snapshots.rollback(base, v1)
    // a window ending before the rollback still feeds
    assert(Snapshots.changeFeed(spark, base, 0, v2).count() === 6L)
    // any window containing it refuses with the re-seed instruction
    val e = intercept[IllegalStateException] {
      Snapshots.changeFeed(spark, base, v1, v3).count()
    }
    assert(e.getMessage.contains("rollback"))
    assert(e.getMessage.contains("re-seed"))
  }

  test("changeFeed refuses tables whose schema collides with feed metadata columns") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_feed_meta")
    Snapshots.commit(spark, Seq((1L, "x")).toDF("k", "_change_type"), base)
    val v2 = Snapshots.commit(spark, Seq((2L, "y")).toDF("k", "_change_type"), base)
    val e = intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, base, 0, v2)
    }
    assert(e.getMessage.contains("_change_type"))
  }

  test("windows spanning a conversion stay exact: feed, removedRows, MV") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val root = tmpDir("graft_eq_convwin")
    val (src, mv) = (root + "/src", root + "/mv")
    Snapshots.commit(spark,
      (1L to 12L).map(i => (i, i % 3, i * 10L)).toDF("k", "g", "v"), src,
      sortCols = Seq("k"))
    graft.ingest.MatView.refresh(spark, mv, src, Seq("g"), "v")
    val v1 = Snapshots.versions(src).max
    // eq-delete BEFORE the window of interest, then convert INSIDE it:
    // the conversion's vector re-hides rows already hidden at v2 — the
    // window (v2, v3] must report NOTHING removed.
    val v2 = Snapshots.deleteByKeys(spark, src, Seq(1L, 2L).toDF("k"))
    val v3 = Snapshots.convertEqToDv(spark, src)
    assert(Snapshots.removedRows(spark, src, v2, v3).count() === 0L)
    assert(Snapshots.changeFeed(spark, src, v2, v3).count() === 0L)
    // a window containing BOTH the delete and its conversion reports the
    // deleted rows exactly once (via the conversion's vector)
    assert(Snapshots.removedRows(spark, src, v1, v3)
      .select(col("k")).collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // incremental MV refresh across delete + conversion stays ≡ recompute
    graft.ingest.MatView.refresh(spark, mv, src, Seq("g"), "v")
    val got = Snapshots.read(spark, mv)
      .select(col("g"), col("n_rows"), col("sum_v")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = Snapshots.read(spark, src)
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("binpack compaction rewrites only small files and keeps deletes live") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_eq_binpack")
    // one big commit (coalesced) + many tiny ones — the streaming shape
    Snapshots.commit(spark,
      (1L to 2000L).map(i => (i, i * 10L)).toDF("k", "v").coalesce(1),
      base, sortCols = Seq("k"))
    for (i <- 0 until 4)
      Snapshots.commit(spark,
        Seq((3000L + i, 1L)).toDF("k", "v").coalesce(1), base)
    // row-level deletes against BOTH size classes
    Snapshots.deleteWhereDV(spark, base, col("k") === 10L)    // in the big file
    Snapshots.deleteByKeys(spark, base, Seq(3001L).toDF("k")) // in a tiny file
    val before = kv(Snapshots.read(spark, base))
    val all = Snapshots.liveFiles(base, Snapshots.versions(base).max)
    val sizes = all.map(f => new java.io.File(new java.net.URI("file:" + f).getPath).length)
    val threshold = sizes.max // everything but the biggest is "small"
    val big = all(sizes.indexOf(sizes.max))
    val v = Snapshots.compact(spark, base, numFiles = 1,
      onlySmallerThan = Some(threshold))
    val after = Snapshots.liveFiles(base, v)
    // the big file carried BY PATH; the tiny ones are gone
    assert(after.contains(big))
    assert(!after.exists(f => f != big && all.contains(f)))
    assert(after.size === 2) // big + one packed file
    // rows identical, deletes still honored (the big file's DV is live)
    assert(kv(Snapshots.read(spark, base)) === before)
    assert(!kv(Snapshots.read(spark, base)).contains(10L))
    assert(!kv(Snapshots.read(spark, base)).contains(3001L))
    // nothing small left: a repeat binpack is a no-op version-wise
    assert(Snapshots.compact(spark, base, 1,
      onlySmallerThan = Some(1L)) === v)
  }

  test("predicate-scoped compact rewrites only the matching key region") {
    val sess = spark
    import sess.implicits._
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft_eq_pcompact")
    Snapshots.commit(spark,
      (1L to 20L).map(i => (i, i * 10L)).toDF("k", "v"), base, sortCols = Seq("k"))
    val lowFiles = Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet
    Snapshots.commit(spark,
      (100L to 120L).map(i => (i, i * 10L)).toDF("k", "v"), base, sortCols = Seq("k"))
    val highFiles =
      Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet -- lowFiles
    // row-level deletes in BOTH regions before the scoped rewrite
    Snapshots.deleteWhereDV(spark, base, col("k") === 5L)   // carried region
    Snapshots.deleteWhereDV(spark, base, col("k") === 105L) // rewritten region
    val before = kv(Snapshots.read(spark, base))
    val v = Snapshots.compact(spark, base, numFiles = 1, sortCols = Seq("k"),
      onlyMatching = Some(col("k") >= 100L))
    val post = Snapshots.liveFiles(base, v).toSet
    // the low region carried BY PATH; the high region's files are gone
    assert(lowFiles.subsetOf(post), "non-matching files must carry untouched")
    assert(post.intersect(highFiles).isEmpty, "matching files must rewrite")
    // rows identical: the carried DV still hides 5, the rewrite dropped 105
    assert(kv(Snapshots.read(spark, base)) === before)
    // selector conflict and stats-untranslatable predicates refuse loudly
    intercept[IllegalArgumentException] {
      Snapshots.compact(spark, base, 1, onlySmallerThan = Some(1L),
        onlyMatching = Some(col("k") === 1L))
    }
    intercept[IllegalArgumentException] {
      Snapshots.compact(spark, base, 1,
        onlyMatching = Some(col("k") + col("v") > 0L))
    }
  }

  test("randomized op sequence: table state tracks the model under every mix") {
    val sess = spark
    import sess.implicits._
    // Deterministic LCG drives a 40-op interleaving of upserts, equality
    // deletes, DV deletes, conversions and both compaction flavors; after
    // every op the table must equal the reference Map. This is the
    // many-interleavings net the single-scenario tests can't cast —
    // e.g. delete-after-convert-after-binpack-after-reinsert.
    var seed = 0x5DEECE66DL
    def nextInt(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val base = tmpDir("graft_eq_fuzz")
    val model = scala.collection.mutable.Map[Long, Long]()
    def seedRows = (1L to 30L).map(i => (i, i * 100L))
    Snapshots.commit(spark, seedRows.toDF("k", "v"), base, sortCols = Seq("k"))
    model ++= seedRows
    var convertsRun = 0
    for (step <- 1 to 40) {
      nextInt(6) match {
        case 0 | 1 => // upsert a small batch (some existing, some fresh keys)
          val ks = (0 until 1 + nextInt(4)).map(_ => 1L + nextInt(45))
          val rows = ks.distinct.map(k => (k, k * 1000L + step))
          Snapshots.upsertByKeys(spark, base, rows.toDF("k", "v"), Seq("k"))
          model ++= rows
        case 2 => // equality delete (possibly absent keys)
          val ks = (0 until 1 + nextInt(3)).map(_ => 1L + nextInt(45)).distinct
          Snapshots.deleteByKeys(spark, base, ks.toDF("k"))
          ks.foreach(model.remove)
        case 3 => // DV delete by predicate
          val pivot = 1L + nextInt(45)
          Snapshots.deleteWhereDV(spark, base,
            org.apache.spark.sql.functions.col("k") === pivot)
          model.remove(pivot)
        case 4 =>
          Snapshots.convertEqToDv(spark, base); convertsRun += 1
        case 5 =>
          if (step % 2 == 0) Snapshots.compact(spark, base, numFiles = 2)
          else Snapshots.compact(spark, base, numFiles = 2,
            onlySmallerThan = Some(4096L))
      }
      val got = kv(Snapshots.read(spark, base))
      assert(got === model.toMap, s"divergence after step $step")
    }
    assert(convertsRun > 0) // the mix actually exercised conversion
  }

  test("changeFeed over a many-commit window folds through checkpoints") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_widefeed")
    // 70 commits: past the 64-frame chunking threshold
    for (i <- 1 to 70)
      Snapshots.commit(spark, Seq((i.toLong, i * 10L)).toDF("k", "v"), base)
    val feed = Snapshots.changeFeed(spark, base, 0L, Snapshots.versions(base).max)
    assert(feed.count() === 70L)
    assert(feed.select(col("k")).collect().map(_.getLong(0)).toSet ===
      (1L to 70L).toSet)
    assert(feed.select(col("_commit_version")).distinct().count() === 70L)
  }

  test("expire keeps live eq sidecars and reclaims materialized ones") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_eq_expire")
    seed(base)
    Snapshots.deleteByKeys(spark, base, Seq(1L).toDF("k"))
    Snapshots.expire(base, keepLast = 1)
    // the delete's key file must survive (its manifest is the head)
    assert(!kv(Snapshots.read(spark, base)).contains(1L))
    val expected = kv(Snapshots.read(spark, base))
    Snapshots.compact(spark, base, numFiles = 1)
    Snapshots.expire(base, keepLast = 1)
    // eq parquet now unreferenced: swept, and reads stay correct
    val eqDirs = new java.io.File(base, "data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("eq_"))
    assert(eqDirs.forall(d =>
      !d.exists() || d.listFiles().forall(!_.getName.endsWith(".parquet"))))
    assert(kv(Snapshots.read(spark, base)) === expected)
  }
}
