package graft

import org.apache.spark.sql.functions._
import graft.ingest.Snapshots

/** SQL `MERGE INTO` / `UPDATE` on graft tables ([[graft.connector.GraftMergeStrategy]]):
  * full three-group clause semantics, first-match-wins ordering, the
  * cardinality contract, merge-on-read physics (DV leg, no file rewrite),
  * and atomic time travel across the change.
  */
class MergeSqlSpec extends SparkSuite {

  private lazy val cat: String = {
    val wh = tmpDir("graft_merge_wh")
    spark.conf.set("spark.sql.catalog.gm", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gm.d")
    "gm"
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  private def freshTable(name: String, n: Int): String = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.$name")
    spark.sql(s"CREATE TABLE $cat.d.$name AS " +
      s"SELECT id, id * 10 AS v FROM range($n)")
    s"$cat.d.$name"
  }

  test("MERGE: update, conditional delete, insert, not-matched-by-source") {
    val t = freshTable("m1", 10) // ids 0..9, v = id*10
    spark.range(5, 15).select(col("id"), lit(-1L).as("v"))
      .createOrReplaceTempView("m1_src") // ids 5..14
    spark.sql(
      s"""MERGE INTO $t AS t USING m1_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.id = 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = t.v + 1
         |WHEN NOT MATCHED AND s.id < 13 THEN INSERT (id, v) VALUES (s.id, 0)
         |WHEN NOT MATCHED BY SOURCE AND t.id < 2 THEN UPDATE SET v = -t.v
         |""".stripMargin)
    val got = spark.table(t).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = Seq(
      0L -> 0L,     // nbs + id<2: v = -0
      1L -> -10L,   // nbs + id<2: negated
      2L -> 20L, 3L -> 30L, 4L -> 40L, // nbs, condition false: untouched
      // 5 deleted
      6L -> 61L, 7L -> 71L, 8L -> 81L, 9L -> 91L, // matched update
      10L -> 0L, 11L -> 0L, 12L -> 0L) // inserts; 13, 14 filtered out
    assert(got === expected)
  }

  test("MERGE is merge-on-read and atomic: DV leg, no rewrite, time travel") {
    val t = freshTable("m2", 1000)
    val base = tableBase("m2")
    val preVs = Snapshots.versions(base).sorted
    val preFiles = Snapshots.liveFiles(base, preVs.last).toSet
    spark.range(0, 1000, 100).select(col("id"), lit(0L).as("v"))
      .createOrReplaceTempView("m2_src")
    spark.sql(
      s"""MERGE INTO $t AS t USING m2_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = -1""".stripMargin)
    val vs = Snapshots.versions(base).sorted
    assert(vs.size === preVs.size + 1, "one atomic commit")
    assert(Snapshots.modeOf(base, vs.last) === "merge:sql")
    // every pre-merge data file survives untouched (the delete leg is a
    // deletion vector); the update leg appends
    assert(preFiles.subsetOf(Snapshots.liveFiles(base, vs.last).toSet))
    assert(rows(s"SELECT count(*), sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) FROM $t").head ===
      Seq(1000L, 10L))
    // time travel to the pre-merge version still sees the original rows
    assert(rows(s"SELECT sum(v) FROM $t VERSION AS OF ${preVs.last}").head ===
      Seq((0 until 1000).map(_ * 10L).sum))
  }

  test("MERGE star forms and duplicate-source cardinality error") {
    val t = freshTable("m3", 6)
    spark.range(3, 9).select(col("id"), lit(7L).as("v"))
      .createOrReplaceTempView("m3_src")
    spark.sql(
      s"""MERGE INTO $t AS t USING m3_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(s"SELECT count(*), sum(v) FROM $t").head ===
      Seq(9L, 0L + 10 + 20 + 7 * 6))
    // duplicate source matches for one target row must error, not
    // nondeterministically pick one
    spark.range(2).select(lit(1L).as("id"), col("id").as("v"))
      .createOrReplaceTempView("m3_dup")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t AS t USING m3_dup AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("cardinality"))
  }

  test("MERGE inflated join multiplicity: probe caps the single-pass cache") {
    // small target + small source stats, but a many-to-many ON condition
    // inflates matched pairs (30 x 30 = 900) far past both inputs — the
    // count-limited probe must veto the single-pass matched-pair cache and
    // route through the two-pass cardinality check, which refuses. With
    // the cap back at its roomy default the same statement still refuses
    // identically — the probe changes the memory shape, never the answer.
    val t = freshTable("m3b", 30)
    spark.range(30).select(col("id"), lit(1L).as("v"))
      .createOrReplaceTempView("m3b_src")
    val mergeSql =
      s"""MERGE INTO $t AS t USING m3b_src AS s ON t.v >= 0
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin
    spark.conf.set("spark.graft.merge.smallTargetMaxMatched", "8")
    try {
      val e = intercept[Exception] { spark.sql(mergeSql) }
      assert(e.getMessage.toLowerCase.contains("cardinality"))
    } finally spark.conf.unset("spark.graft.merge.smallTargetMaxMatched")
    val e2 = intercept[Exception] { spark.sql(mergeSql) }
    assert(e2.getMessage.toLowerCase.contains("cardinality"))
  }

  test("MERGE with aggregated/joined source plan") {
    val t = freshTable("m4", 5)
    // source is a non-trivial plan: aggregate over a generated frame
    spark.range(20).select((col("id") % 5).as("k"), col("id").as("x"))
      .createOrReplaceTempView("m4_raw")
    spark.sql(
      s"""MERGE INTO $t AS t
         |USING (SELECT k, sum(x) AS sx FROM m4_raw GROUP BY k) AS s
         |ON t.id = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sx""".stripMargin)
    // sum over {k, k+5, k+10, k+15} = 4k + 30
    val got = spark.table(t).orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got === (0 until 5).map(k => 4L * k + 30))
  }

  test("UPDATE statement: expressions, WHERE, merge-on-read commit") {
    val t = freshTable("u1", 100)
    val base = tableBase("u1")
    val preFiles = Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet
    spark.sql(s"UPDATE $t SET v = v + id WHERE id % 10 = 3")
    assert(Snapshots.modeOf(base, Snapshots.versions(base).max) === "merge:sql-update")
    assert(preFiles.subsetOf(
      Snapshots.liveFiles(base, Snapshots.versions(base).max).toSet))
    val got = spark.table(t).orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got === (0 until 100).map(i => if (i % 10 == 3) i * 10L + i else i * 10L))
    // unconditional UPDATE touches every row
    spark.sql(s"UPDATE $t SET v = 1")
    assert(rows(s"SELECT sum(v) FROM $t").head === Seq(100L))
  }

  test("DELETE with untranslatable predicates falls back to the DV strategy") {
    val t = freshTable("d1", 100)
    val base = tableBase("d1")
    // pmod(id*7, 13) = 2 has no data-source Filter shape - SupportsDelete
    // refuses it (canDeleteWhere false) and the strategy takes over
    spark.sql(s"DELETE FROM $t WHERE pmod(id * 7, 13) = 2")
    val survivors = (0 until 100).filterNot(i => ((i * 7) % 13) == 2)
    assert(Snapshots.modeOf(base, Snapshots.versions(base).max) === "delete-dv")
    assert(rows(s"SELECT count(*), sum(id) FROM $t").head ===
      Seq(survivors.size.toLong, survivors.map(_.toLong).sum))
    // a plain translatable predicate still deletes (SupportsDelete path)
    spark.sql(s"DELETE FROM $t WHERE id < 10")
    assert(rows(s"SELECT count(*), min(id) FROM $t").head ===
      Seq(survivors.count(_ >= 10).toLong, survivors.filter(_ >= 10).min.toLong))
  }

  test("nested-field assignments refuse loudly instead of no-oping") {
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.nest")
    spark.sql(s"CREATE TABLE $cat.d.nest AS " +
      "SELECT id, named_struct('x', id * 10) AS s FROM range(4)")
    val eu = intercept[Exception] {
      spark.sql(s"UPDATE $cat.d.nest SET s.x = 99 WHERE id = 1")
    }
    assert(eu.getMessage.toLowerCase.contains("nested"))
    spark.range(4).createOrReplaceTempView("nest_src")
    val em = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.d.nest AS t USING nest_src AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET t.s.x = 99""".stripMargin)
    }
    assert(em.getMessage.toLowerCase.contains("nested"))
    // and nothing changed
    assert(spark.table(s"$cat.d.nest").selectExpr("sum(s.x)").collect()(0).getLong(0) === 60L)
  }

  test("MERGE guards: version pin refused, path-loaded evolution refused") {
    val t = freshTable("g1", 5)
    spark.range(5).createOrReplaceTempView("g1_src")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t VERSION AS OF 1 AS t USING g1_src AS s ON t.id = s.id
           |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    // WITH SCHEMA EVOLUTION against a PATH-loaded table: the analyzer
    // rule has no catalog identifier to ALTER, so honoring the keyword
    // silently would drop the requested evolution — refuse instead.
    spark.read.format("graft").load(tableBase("g1"))
      .createOrReplaceTempView("g1_path")
    spark.range(5).select(col("id"), lit(1L).as("v"), lit("e").as("extra"))
      .createOrReplaceTempView("g1_src_extra")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO g1_path AS t USING g1_src_extra AS s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("catalog-managed"),
      s"wrong refusal: ${e.getMessage}")
  }

  test("MERGE WITH SCHEMA EVOLUTION: new column + type widening, then merge") {
    // target (id, v INT); source carries v BIGINT (beyond Int range) and
    // a brand-new `extra` column. The analyzer must ALTER the target —
    // add `extra`, widen v to BIGINT — through the catalog, then run the
    // merge against the evolved schema.
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.me1")
    spark.sql(s"CREATE TABLE $cat.d.me1 (id BIGINT, v INT)")
    spark.sql(s"INSERT INTO $cat.d.me1 SELECT id, CAST(id * 10 AS INT) FROM range(6)")
    spark.range(3, 9).select(col("id"),
        (col("id") + lit(4000000000L)).as("v"), // > Int.MaxValue
        concat(lit("x"), col("id")).as("extra"))
      .createOrReplaceTempView("me1_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.d.me1 AS t USING me1_src AS s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val sch = spark.table(s"$cat.d.me1").schema
    assert(sch("v").dataType === org.apache.spark.sql.types.LongType)
    assert(sch("extra").dataType === org.apache.spark.sql.types.StringType)
    val got = spark.table(s"$cat.d.me1").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    val expected =
      (0L to 2L).map(i => (i, i * 10, null)) ++        // untouched, NULL extra
      (3L to 8L).map(i => (i, i + 4000000000L, s"x$i")) // updated / inserted
    assert(got === expected)
    // the same merge WITHOUT the keyword must not evolve: an explicit
    // assignment to a column the target lacks fails analysis.
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.me2")
    spark.sql(s"CREATE TABLE $cat.d.me2 (id BIGINT, v INT)")
    intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $cat.d.me2 AS t USING me1_src AS s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, v, extra) VALUES (s.id, 0, s.extra)""".stripMargin)
    }
  }

  test("MERGE/UPDATE prune the target scan by the source key envelope") {
    val sess = spark
    import sess.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.pr")
    spark.sql(s"CREATE TABLE $cat.d.pr (id BIGINT, v BIGINT) PARTITIONED BY (id)")
    // clustered multi-file layout (the connector's write clustering +
    // a record cap so the tiny sorted shuffle still splits into files)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
    // force the envelope path for this toy-sized table
    spark.conf.set("spark.graft.merge.smallTargetBytes", "0")
    try {
      spark.sql(s"INSERT INTO $cat.d.pr SELECT id, id * 10 AS v FROM range(100)")
      val base = tableBase("pr")
      val all = Snapshots.liveFiles(base, Snapshots.versions(base).max)
      assert(all.size >= 3)
      // missing-file proof: drop a file that cannot hold any id <= 10
      val lowCapable = graft.ingest.FileStats.prune(
        spark.sparkContext.hadoopConfiguration, all,
        Seq(org.apache.spark.sql.sources.LessThanOrEqual("id", 10L))).toSet
      val victim = (all.toSet -- lowCapable).head
      new java.io.File(new java.net.URI("file:" + victim).getPath).delete()
      // (sum, not count: a bare count() answers from manifest metadata
      // by design and would never open the missing file)
      intercept[Exception] {
        spark.table(s"$cat.d.pr").agg(org.apache.spark.sql.functions.sum("v")).head()
      }
      // equi-ON MERGE with no NOT-MATCHED-BY-SOURCE: target scan prunes
      // to the source envelope, so the missing file is never planned
      Seq((3L, 1L), (7L, 1L), (200L, 1L)).toDF("id", "v")
        .createOrReplaceTempView("pr_src")
      spark.sql(
        s"""MERGE INTO $cat.d.pr AS t USING pr_src AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
           |""".stripMargin)
      // UPDATE with a selective pushable WHERE prunes the same way
      spark.sql(s"UPDATE $cat.d.pr SET v = -1 WHERE id = 5")
      val state = Snapshots.readWhere(spark, base, col("id") <= 10L || col("id") === 200L)
        .as[(Long, Long)].collect().toMap
      assert(state(3L) === 1L && state(7L) === 1L && state(200L) === 1L)
      assert(state(5L) === -1L && state(6L) === 60L)
      // a NOT-MATCHED-BY-SOURCE merge needs every target row: unpruned
      // scan, which must now fail on the missing file — proving the
      // pruned variants above genuinely skipped it
      val e = intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $cat.d.pr AS t USING pr_src AS s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET v = s.v
             |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 0
             |""".stripMargin)
      }
      assert(e.getMessage != null)
    } finally {
      spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      spark.conf.unset("spark.graft.merge.smallTargetBytes")
    }
  }

  private def tableBase(name: String): String =
    new java.io.File(new java.io.File(
      spark.conf.get("spark.sql.catalog.gm.warehouse"), "d"), name).toString

  test("a user _row_id DATA column on a non-lineage table survives UPDATE and MERGE") {
    // `_row_id` is only reserved once lineage is ENABLED — on a plain
    // table it is a legal user column, and the merge path must treat it
    // as data (r12 keyed on the name alone, dropping it from dataCols
    // and failing every UPDATE/MERGE with a bogus schema-drift error).
    spark.sql(s"DROP TABLE IF EXISTS $cat.d.urid")
    spark.sql(s"CREATE TABLE $cat.d.urid AS " +
      "SELECT id, id * 10 AS v, id + 500 AS _row_id FROM range(6)")
    spark.sql(s"UPDATE $cat.d.urid SET v = -1 WHERE id = 2")
    val afterUpdate = spark.table(s"$cat.d.urid")
      .select("id", "v", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterUpdate.contains((2L, -1L, 502L)))
    assert(afterUpdate.size === 6)
    spark.range(4, 8).selectExpr("id", "id AS v", "id + 900 AS _row_id")
      .createOrReplaceTempView("urid_src")
    spark.sql(
      s"""MERGE INTO $cat.d.urid AS t USING urid_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v, _row_id = s._row_id
         |WHEN NOT MATCHED THEN INSERT (id, v, _row_id) VALUES (s.id, s.v, s._row_id)
         |""".stripMargin)
    val after = spark.table(s"$cat.d.urid")
      .select("id", "v", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after.size === 8)
    assert(after.contains((5L, 5L, 905L)))  // matched: user column assignable
    assert(after.contains((7L, 7L, 907L)))  // inserted: user column carried
  }
}
