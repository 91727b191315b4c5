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
    } finally {
      SparkSession.setActiveSession(old)
      SparkSession.setDefaultSession(old)
    }
  }
}
