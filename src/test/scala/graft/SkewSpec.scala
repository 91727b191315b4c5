package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.tables.Tables

/** Salted join produces exactly the unsalted join's rows. */
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
}
