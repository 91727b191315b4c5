package graft

import org.apache.spark.sql.SparkSession

/** The config-driven extension path: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must expose
  * graft's native functions without any registration call.
  */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects fnv64 into a fresh session") {
    val old = spark // keep the shared session alive (same SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions is the programmatic form of
      // --conf spark.sql.extensions=graft.functions.GraftExtensions
      // (the config path instantiates this same class at context startup,
      // which a suite sharing one SparkContext cannot re-trigger).
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne old, "expected a new session over the shared context")
      val viaExt = s2.sql("SELECT fnv64('hello') AS h").collect().head.getLong(0)
      // must equal the expression the explicit registration path produces
      graft.functions.GraftFunctions.register(old)
      val viaReg = old.sql("SELECT fnv64('hello') AS h").collect().head.getLong(0)
      assert(viaExt === viaReg)
      // the injected Generator works in LATERAL VIEW position too
      val grams = s2.sql(
        """SELECT g.pos, g.gram
          |FROM VALUES ('The quick Brown fox') AS t(txt)
          |LATERAL VIEW ngrams(txt, 3) g AS pos, gram""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(grams === Seq((0L, "the quick brown"), (1L, "quick brown fox")))
    } finally {
      SparkSession.setActiveSession(old)
      SparkSession.setDefaultSession(old)
    }
  }

  test("ngrams generator edge cases: short input, null, n=1") {
    graft.functions.GraftFunctions.register(spark)
    // fewer words than n → zero rows, not an error
    assert(spark.sql(
      "SELECT * FROM VALUES ('one two') t(x) LATERAL VIEW ngrams(x, 3) g AS p, w")
      .count() === 0L)
    // NULL text → zero rows
    assert(spark.sql(
      "SELECT * FROM VALUES (CAST(NULL AS STRING)) t(x) LATERAL VIEW ngrams(x, 2) g AS p, w")
      .count() === 0L)
    // n=1 degenerates to posexplode(split(lower(x)))
    val uni = spark.sql(
      "SELECT g.w FROM VALUES ('A b C') t(x) LATERAL VIEW ngrams(x, 1) g AS p, w")
      .collect().map(_.getString(0)).toSeq
    assert(uni === Seq("a", "b", "c"))
  }
}
