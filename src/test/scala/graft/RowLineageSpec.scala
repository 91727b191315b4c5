package graft

import org.apache.spark.sql.functions._
import graft.ingest.Snapshots

/** Row lineage (stable row ids — [[Snapshots.enableRowLineage]] /
  * [[Snapshots.readLineage]]): ids assign once (as metadata on appends,
  * physical bytes on rewrites), survive compaction and clone
  * byte-identically, ride SQL UPDATE/MERGE update legs, and surface in
  * the change feed so CDC consumers pair a merge's halves by id.
  */
class RowLineageSpec extends SparkSuite {

  private lazy val cat: String = {
    val wh = tmpDir("graft_rl_wh")
    spark.conf.set("spark.sql.catalog.rl", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rl.d")
    "rl"
  }

  private def catTableBase(name: String): String =
    new java.io.File(new java.io.File(
      spark.conf.get("spark.sql.catalog.rl.warehouse"), "d"), name).toString

  private def idsByKey(base: String): Map[Long, Long] =
    Snapshots.readLineage(spark, base).select("id", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def freshLineageTable(n: Int): String = {
    val base = tmpDir("graft_rl")
    Snapshots.commit(spark,
      spark.range(n).select(col("id"), (col("id") * 10).as("v")), base)
    Snapshots.enableRowLineage(base)
    base
  }

  test("enable backfills every live row with a unique id; plain read stays clean") {
    val base = tmpDir("graft_rl")
    // two pre-enable commits: backfill must cover both eras' files
    Snapshots.commit(spark, spark.range(0, 60).select(col("id"), (col("id") * 10).as("v")), base)
    Snapshots.commit(spark, spark.range(60, 100).select(col("id"), (col("id") * 10).as("v")), base)
    Snapshots.enableRowLineage(base)
    val lin = Snapshots.readLineage(spark, base)
    assert(lin.columns.contains("_row_id"))
    val ids = lin.select("_row_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted
    assert(ids.length === 100)
    assert(ids.toSeq === (0L until 100L)) // one claim, contiguous from 0
    // the lineage column never leaks into the plain read
    assert(!Snapshots.read(spark, base).columns.contains("_row_id"))
    // idempotent: re-enabling assigns nothing new
    val before = idsByKey(base)
    Snapshots.enableRowLineage(base)
    assert(idsByKey(base) === before)
  }

  test("appends after enable assign metadata ranges: ids continue, no overlap, no data rewrite") {
    val base = freshLineageTable(50)
    val v1Files = Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet
    Snapshots.commit(spark,
      spark.range(50, 80).select(col("id"), (col("id") * 10).as("v")), base)
    // append-only: every v1 file carried untouched (ids were metadata)
    val v2Files = Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet
    assert(v1Files.subsetOf(v2Files))
    val ids = Snapshots.readLineage(spark, base)
      .select("_row_id").collect().map(_.getLong(0))
    assert(ids.distinct.length === 80)
    assert(ids.min === 0L && ids.max === 79L)
    // time travel reads the old era's ids unchanged
    val v1 = Snapshots.versions(base).min
    assert(Snapshots.readLineage(spark, base, Some(v1))
      .select("_row_id").collect().map(_.getLong(0)).sorted.toSeq === (0L until 50L))
  }

  test("a user frame carrying _row_id is refused on a lineage table") {
    val base = freshLineageTable(5)
    val bad = spark.range(5, 8).select(col("id"), (col("id") * 10).as("v"),
      lit(999L).as("_row_id"))
    val e = intercept[IllegalArgumentException] {
      Snapshots.commit(spark, bad, base)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("compact preserves every id byte-identically (physical materialization)") {
    val base = freshLineageTable(40)
    Snapshots.commit(spark, spark.range(40, 64).select(col("id"), (col("id") * 10).as("v")), base)
    val before = idsByKey(base)
    Snapshots.compact(spark, base, numFiles = 2)
    assert(idsByKey(base) === before)
    // the rewritten files carry _row_id physically (footer truth, not map)
    val files = Snapshots.liveFiles(base, Snapshots.versions(base).max)
    val raw = spark.read.parquet(files: _*)
    assert(raw.columns.contains("_row_id"))
    assert(raw.filter(col("_row_id").isNull).count() === 0)
    // ...and the plain read STILL hides the column
    assert(!Snapshots.read(spark, base).columns.contains("_row_id"))
    // a second compact (now physical → physical) is also id-stable
    Snapshots.compact(spark, base, numFiles = 1)
    assert(idsByKey(base) === before)
  }

  test("clone carries ids and the ledger high-water") {
    val base = freshLineageTable(30)
    Snapshots.compact(spark, base, numFiles = 1) // mix physical into the clone
    Snapshots.commit(spark, spark.range(30, 45).select(col("id"), (col("id") * 10).as("v")), base)
    val dst = tmpDir("graft_rl_clone")
    Snapshots.clone(spark, base, dst)
    assert(idsByKey(dst) === idsByKey(base))
    // post-clone appends mint ABOVE the carried high-water — never reuse
    val carriedMax = idsByKey(dst).values.max
    Snapshots.commit(spark, spark.range(45, 50).select(col("id"), (col("id") * 10).as("v")), dst)
    val fresh = Snapshots.readLineage(spark, dst)
      .filter(col("id") >= 45).select("_row_id").collect().map(_.getLong(0))
    assert(fresh.forall(_ > carriedMax))
    assert(Snapshots.readLineage(spark, dst).select("_row_id")
      .distinct().count() === 50)
  }

  test("row-level deletes keep survivor ids (DV and copy-on-write)") {
    val base = freshLineageTable(20)
    val before = idsByKey(base)
    Snapshots.deleteWhereDV(spark, base, col("id") === 3 || col("id") === 7)
    val afterDv = idsByKey(base)
    assert(afterDv.keySet === before.keySet -- Set(3L, 7L))
    assert(afterDv === (before -- Set(3L, 7L)))
    // CoW delete rewrites touched files — survivors keep ids physically
    Snapshots.compact(spark, base, numFiles = 2) // materialize DVs first
    Snapshots.deleteWhere(spark, base, col("id") === 11)
    val afterCow = idsByKey(base)
    assert(afterCow === (before -- Set(3L, 7L, 11L)))
  }

  test("SQL UPDATE keeps the row's id; the change feed pairs the halves by it") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.t1")
    spark.sql(s"CREATE TABLE $cat.d.t1 AS SELECT id, id * 10 AS v FROM range(12)")
    val base = catTableBase("t1")
    Snapshots.enableRowLineage(base)
    val before = idsByKey(base)
    val v0 = Snapshots.versions(base).max
    spark.sql("UPDATE rl.d.t1 SET v = -1 WHERE id IN (4, 9)")
    // updated rows keep their ids; untouched rows untouched
    assert(idsByKey(base) === before)
    assert(spark.table("rl.d.t1").filter(col("v") === -1).count() === 2)
    // feed: the delete half and the insert half carry the SAME id
    val v1 = Snapshots.versions(base).max
    val feed = Snapshots.changeFeed(spark, base, v0, v1, withRowIds = true)
    val byType = feed.select("_change_type", "_row_id", "id").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(r => (r.getLong(2), r.getLong(1))).toSet)
    assert(byType("delete") === Set(4L -> before(4L), 9L -> before(9L)))
    assert(byType("insert") === Set(4L -> before(4L), 9L -> before(9L)))
  }

  test("SQL MERGE: update legs keep ids, insert legs mint fresh ones") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.t2")
    spark.sql(s"CREATE TABLE $cat.d.t2 AS SELECT id, id * 10 AS v FROM range(10)")
    val base = catTableBase("t2")
    Snapshots.enableRowLineage(base)
    val before = idsByKey(base)
    spark.range(5, 15).select(col("id"), lit(-1L).as("v"))
      .createOrReplaceTempView("rl_src")
    spark.sql(
      """MERGE INTO rl.d.t2 AS t USING rl_src AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        |""".stripMargin)
    val after = idsByKey(base)
    // updated rows (5..9) and untouched rows (0..4) keep their ids
    (0L until 10L).foreach(k => assert(after(k) === before(k), s"id drifted for key $k"))
    // inserted rows (10..14) mint fresh ids above the prior high-water
    val hw = before.values.max
    (10L until 15L).foreach(k => assert(after(k) > hw, s"insert reused an id for key $k"))
    assert(after.values.toSeq.distinct.length === after.size)
  }

  test("eq-delete upsert mints a fresh id for the new copy (documented stance)") {
    val base = freshLineageTable(10)
    val before = idsByKey(base)
    Snapshots.upsertByKeys(spark, base,
      spark.range(3, 5).select(col("id"), lit(-5L).as("v")), Seq("id"))
    val after = idsByKey(base)
    val hw = before.values.max
    assert(after(3L) > hw && after(4L) > hw) // fresh copies, fresh ids
    assert((before.keySet -- Set(3L, 4L)).forall(k => after(k) === before(k)))
    // uniqueness holds: the old copies' ids retired with the hidden rows
    assert(after.values.toSeq.distinct.length === after.size)
  }

  test("SQL surfaces _row_id as a DSv2 metadata column, never in SELECT *") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.t3")
    spark.sql(s"CREATE TABLE $cat.d.t3 AS SELECT id, id * 10 AS v FROM range(8)")
    val base = catTableBase("t3")
    // pure-SQL enablement via the stored procedure
    val assigned = spark.sql(
      s"CALL $cat.system.enable_row_lineage(table => 'd.t3')")
      .collect().head.getLong(0)
    assert(assigned >= 1L)
    assert(spark.sql(s"CALL $cat.system.backfill_row_ids(table => 'd.t3')")
      .collect().head.getLong(0) === 0L) // idempotent: nothing left
    // metadata column, not schema: SELECT * stays clean
    assert(spark.table(s"$cat.d.t3").columns.toSeq === Seq("id", "v"))
    val got = spark.sql(s"SELECT id, _row_id FROM $cat.d.t3").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === idsByKey(base))
    // same read path after compaction (physical ids) — SQL still matches
    Snapshots.compact(spark, base, numFiles = 1)
    assert(spark.sql(s"SELECT id, _row_id FROM $cat.d.t3").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === got)
    // on a non-lineage table the name does not resolve at all
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.t4")
    spark.sql(s"CREATE TABLE $cat.d.t4 AS SELECT id FROM range(3)")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT _row_id FROM $cat.d.t4").collect()
    }
    assert(e.getMessage.toLowerCase.contains("_row_id"))
  }

  /** Every relKey's occurrence count across the `_rowids/a_*.tsv`
    * sidecars — a file with two entries has NONDETERMINISTIC ids (the
    * reader's .toMap picks a winner by listing order). */
  private def sidecarEntryCounts(base: String): Map[String, Int] = {
    val dir = new java.io.File(base, "_rowids")
    if (!dir.isDirectory) Map.empty
    else dir.listFiles().filter(_.getName.startsWith("a_")).toSeq
      .flatMap(f => scala.io.Source.fromFile(f).getLines()
        .filter(_.nonEmpty).map(_.split("\t", 3)(0)))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("RTAS over a lineage table assigns each staged file exactly ONE id range") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.rt1")
    spark.sql(s"CREATE TABLE $cat.d.rt1 AS SELECT id, id * 10 AS v FROM range(6)")
    val base = catTableBase("rt1")
    Snapshots.enableRowLineage(base)
    spark.sql(s"CREATE OR REPLACE TABLE $cat.d.rt1 AS " +
      "SELECT id, id * 100 AS v FROM range(20)")
    // the replaced content resolves fresh, unique, deterministic ids
    val ids = Snapshots.readLineage(spark, base)
      .select("_row_id").collect().map(_.getLong(0))
    assert(ids.length === 20 && ids.distinct.length === 20)
    // no staged file carries two sidecar entries (the r12 double-assign:
    // writeBatch AND publishStaged both ranged the same files)
    val dup = sidecarEntryCounts(base).filter(_._2 > 1)
    assert(dup.isEmpty, s"files with conflicting id assignments: $dup")
  }

  test("RTAS emitting _row_id onto a lineage table is refused at stage time") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.rt2")
    spark.sql(s"CREATE TABLE $cat.d.rt2 AS SELECT id, id * 10 AS v FROM range(4)")
    val base = catTableBase("rt2")
    Snapshots.enableRowLineage(base)
    val before = idsByKey(base)
    val e = intercept[Exception] {
      spark.sql(s"CREATE OR REPLACE TABLE $cat.d.rt2 AS " +
        "SELECT id, id AS v, id + 1000 AS _row_id FROM range(4)")
    }
    assert(e.getMessage.contains("_row_id"))
    // the refused stage never published: table content and ids untouched
    assert(idsByKey(base) === before)
  }
}
