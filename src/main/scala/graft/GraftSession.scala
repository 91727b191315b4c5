package graft

import org.apache.spark.sql.SparkSession
import graft.functions.GraftFunctions
import graft.tables.Tables

/** Library entry point: a SparkSession configured the way graft expects,
  * with graft's native SQL functions registered and (optionally) the
  * standard tables of a data directory exposed as views — after which the
  * whole engine is usable from pure SQL (`session.sql("SELECT fnv64(text)
  * … FROM documents")`).
  *
  * Settings rationale (100 TB posture, scaled to one machine here):
  * shuffle partitions sized to cores (not the 200 default — at cluster
  * scale set ≈2-3× total cores); AQE left on (runtime coalescing, skew
  * split); UTC session timezone so event-time semantics are
  * deployment-independent.
  */
object GraftSession {

  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  def create(master: String = "local[*]",
             cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  /** Register every standard table of `dataDir` as a temp view (plus
    * `events` with its normalized `ts_us`/`ts_t` columns).
    */
  def registerViews(s: SparkSession, dataDir: String): Unit = {
    TableNames.foreach { t =>
      Tables.table(s, dataDir, t).createOrReplaceTempView(t)
    }
    Tables.events(s, dataDir).createOrReplaceTempView("events")
  }
}
