package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Minimal bridge into `private[sql]` surface: wrapping a custom
  * [[LogicalPlan]] node into a DataFrame has no public API (the standard
  * extension-library technique — a one-liner in the `org.apache.spark.sql`
  * namespace — rather than reflection). Everything else in graft uses
  * public APIs only; keep it that way.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
