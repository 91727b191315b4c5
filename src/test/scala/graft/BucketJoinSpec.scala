package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ingest.BucketTables
import graft.tables.Tables

/** Co-located joins through native bucketing: two tables bucketed on their
  * join keys must join with ZERO shuffle exchanges — the ingest-time
  * pre-shuffle that makes the dominant fact-fact join free at 100 TB.
  */
class BucketJoinSpec extends SparkSuite {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    p +: (p.children ++ extra).flatMap(flatten)
  }

  test("same-bucketed tables join with zero shuffle exchanges") {
    BucketTables.save(Tables.table(spark, sf, "orders"), "orders_bkt", "o_orderkey", 4)
    BucketTables.save(Tables.table(spark, sf, "lineitem"), "lineitem_bkt", "l_orderkey", 4)
    // force a non-broadcast join so the exchange (or its absence) is visible
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketTables.coLocatedJoin(spark, "lineitem_bkt", "l_orderkey",
        "orders_bkt", "o_orderkey")
      val n = j.count()
      assert(n === Tables.table(spark, sf, "lineitem").count(),
        "every lineitem row matches exactly one order")
      j.collect()
      val shuffles = flatten(j.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join should be co-located, found ${shuffles.size} shuffles")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregation on the bucket key avoids the shuffle too") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = spark.table("lineitem_bkt")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      agg.collect()
      val shuffles = flatten(agg.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"groupBy on the bucket key should reuse bucketing, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
