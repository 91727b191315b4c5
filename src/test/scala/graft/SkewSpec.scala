package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.tables.Tables

/** Salted join produces exactly the unsalted join's rows, and AQE's
  * runtime skew-split engages on a pathological key distribution.
  */
class SkewSpec extends SparkSuite {

  test("saltedJoin == plain join on (orders ⋈ customer)") {
    val o = Tables.table(spark, sf, "orders").select(col("o_custkey"), col("o_orderkey"))
    val c = Tables.table(spark, sf, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment"))
    val salted = Skew.saltedJoin(o, "o_custkey", c, "c_custkey", numSalts = 8)
      .select(col("o_orderkey"), col("c_mktsegment"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("AQE splits a skewed shuffle partition at join time") {
    val s = spark
    import s.implicits._
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ extra).flatMap(flatten)
    }
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 1 hot key with 50k rows vs 50 keys with 200 rows each
      val left = spark.range(50000).map(i => (0L, i)).toDF("k", "v")
        .union(spark.range(10000).map(i => (1 + i % 50, i)).toDF("k", "v"))
      val right = spark.range(51).map(i => (i, s"r$i")).toDF("k2", "name")
        .union(spark.range(51).map(i => (i, s"s$i")).toDF("k2", "name"))
      val j = left.join(right, col("k") === col("k2"))
      assert(j.collect().length === 2 * 60000) // executes THIS plan (AQE finalizes)
      val skewReads = flatten(j.queryExecution.executedPlan)
        .collect { case r: AQEShuffleReadExec if r.hasSkewedPartition => r }
      assert(skewReads.nonEmpty,
        s"expected AQE skew-split reads in:\n${j.queryExecution.executedPlan}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
