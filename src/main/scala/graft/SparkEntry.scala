package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._
import graft.query.RefParity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2): reference
  * parity (range query over ingested block layout) plus the extension
  * surface (aggregations, joins, windows, set ops, scalar functions,
  * time windows, dedup, similarity, text analysis, multimodal).
  * `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible query; same column names both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    raw.map { case (name, fn) =>
      name -> { (s: SparkSession, d: String) =>
        // Engine-level optimizations apply to EVERY registered query (the
        // config-free equivalent of spark.sql.extensions=GraftExtensions):
        // the window-top-k → bounded-heap rewrite fires wherever a query
        // uses the row_number-filter idiom (w1, kNN ranking, keep-first
        // dedup), not only through the explicit TopK API.
        graft.plans.TopKRewriteRule.install(s)
        graft.connector.StatsPropagationRule.install(s)
        fn(s, d)
      }
    }

  private def raw: Map[String, (SparkSession, String) => DataFrame] =
    RefParity.queries ++
    Relational.queries ++
    Windows.queries ++
    Fns.queries ++
    TextAnalysis.queries ++
    Bpe.queries ++
    Dedup.queries ++
    Sim.queries ++
    TimeWindows.queries ++
    Stats.queries ++
    Shapes.queries ++
    Skyline.queries ++
    Quality.queries ++
    Profiling.queries ++
    Behavior.queries ++
    Graph.queries ++
    Packing.queries ++
    Multimodal.queries ++
    Formats.queries

  def oracleSql: Map[String, String] =
    RefParity.oracleSql ++
    Relational.oracleSql ++
    Windows.oracleSql ++
    Fns.oracleSql ++
    TextAnalysis.oracleSql ++
    Bpe.oracleSql ++
    Dedup.oracleSql ++
    Sim.oracleSql ++
    TimeWindows.oracleSql ++
    Stats.oracleSql ++
    Shapes.oracleSql ++
    Skyline.oracleSql ++
    Quality.oracleSql ++
    Profiling.oracleSql ++
    Behavior.oracleSql ++
    Graph.oracleSql ++
    Packing.oracleSql ++
    Multimodal.oracleSql ++
    Formats.oracleSql
}
