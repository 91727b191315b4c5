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

  test("data files without a manifest are invisible to readers") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_snapshot_gc")
    Snapshots.commit(spark, Seq(1L, 2L).toDF("id"), base)
    // simulate a failed job: files written under data/ but never committed
    Seq(99L).toDF("id").write.parquet(s"$base/data/b_orphan")
    assert(ids(Snapshots.read(spark, base)) === Set(1L, 2L))
  }
}
