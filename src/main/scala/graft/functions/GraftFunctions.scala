package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for graft's native SQL functions. */
object GraftFunctions {

  /** Idempotently register all graft functions on a session
    * (`SELECT fnv64(text) ...` / `expr("fnv64(text)")`).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64", exprs => FnvHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams", exprs => NGrams(exprs.head, exprs(1)), "scala_udf")
  }
}
