package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for graft's native SQL functions. */
object GraftFunctions {

  /** Idempotently register all graft functions on a session
    * (`SELECT fnv64(text) ...` / `expr("fnv64(text)")`).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Skip names that are already registered: createOrReplaceTempFunction
    // on an existing name logs a "replaced a previously registered
    // function" WARN per call, and register() runs inside query lambdas
    // that execute hundreds of times per bench pass.
    def once(name: String)(builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    once("fnv64")(exprs => FnvHash64(exprs.head))
    once("ngrams")(exprs => NGrams(exprs.head, exprs(1)))
  }
}
