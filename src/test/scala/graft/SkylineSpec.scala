package graft

import org.apache.spark.sql.functions._
import graft.ops.Skyline

/** The two-phase skyline must equal the quadratic NOT-EXISTS semantics
  * for any partitioning — the local prune is an optimization, never a
  * semantics change.
  */
class SkylineSpec extends SparkSuite {

  private def brute(pts: Seq[(Double, Int)]): Set[(Double, Int)] =
    pts.filter { case (p, s) =>
      !pts.exists { case (p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.toSet

  private def viaOp(pts: Seq[(Double, Int)], parts: Int): Set[(Double, Int)] = {
    val sess = spark
    import sess.implicits._
    Skyline.skyline2D(pts.toDF("price", "size").repartition(parts), "price", "size")
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
  }

  test("skyline equals brute-force dominance for any partition count") {
    // staircase + interior dominated points + one-dimension ties
    val pts = Seq(
      (1.0, 5), (2.0, 8), (3.0, 10),  // the front
      (2.5, 7), (3.0, 9), (4.0, 10),  // dominated (incl. ties on one dim)
      (1.0, 3), (5.0, 1))             // dominated corners
    val expect = brute(pts)
    assert(expect === Set((1.0, 5), (2.0, 8), (3.0, 10)))
    for (parts <- Seq(1, 2, 7)) {
      assert(viaOp(pts, parts) === expect, s"partitions=$parts")
    }
  }

  test("single point and fully-dominated chains behave") {
    assert(viaOp(Seq((1.0, 1)), 3) === Set((1.0, 1.toInt)))
    // a chain where each point dominates the next: only the best survives
    val chain = (1 to 6).map(i => (i.toDouble, 10 - i))
    assert(viaOp(chain, 4) === Set((1.0, 9)))
  }

  test("sf front matches the quadratic oracle semantics on real data") {
    val sess = spark
    import sess.implicits._
    val pts = graft.tables.Tables.table(spark, sf, "part")
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    val raw = pts.select(col("price"), col("size"))
      .as[(Double, Int)].collect().toSeq
    val got = Skyline.skyline2D(pts, "price", "size")
      .select(col("price"), col("size")).as[(Double, Int)].collect().toSet
    assert(got === brute(raw))
    assert(got.nonEmpty)
  }

  private def bruteBand(pts: Seq[(Double, Int)], k: Int): Map[(Double, Int), Long] =
    pts.map { case (p, s) =>
      (p, s) -> pts.count { case (p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }.toLong
    }.filter(_._2 < k).toMap

  test("k-skyband equals brute-force dominator counts for any partitioning") {
    val sess = spark
    import sess.implicits._
    // layered staircases with one-dimension ties and deep interiors
    val pts = Seq(
      (1.0, 5), (2.0, 8), (3.0, 10),          // layer 1
      (2.5, 7), (3.0, 9), (4.0, 10),          // layer 2 (ties on one dim)
      (2.6, 6), (3.5, 9), (1.0, 3), (5.0, 1), // deeper
      (6.0, 10), (2.7, 5))
    for (k <- Seq(1, 2, 3); parts <- Seq(1, 2, 7)) {
      val expect = bruteBand(pts, k)
      val got = Skyline.skyband2D(
          pts.toDF("price", "size").repartition(parts), "price", "size", k)
        .collect().map(r => (r.getDouble(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(got === expect, s"k=$k partitions=$parts")
    }
    // k=1 skyband is exactly the skyline
    val sky = Skyline.skyline2D(pts.toDF("price", "size"), "price", "size")
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toSet
    assert(bruteBand(pts, 1).keySet === sky)
  }
}
