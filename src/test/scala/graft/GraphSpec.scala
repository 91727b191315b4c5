package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank invariants the DuckDB oracle doesn't cover (it pins the exact
  * values on the trade graph; these pin the math on graphs small enough
  * to reason about by hand).
  */
class GraphSpec extends SparkSuite {

  private def ranksOf(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val sess = spark
    import sess.implicits._
    val e = edges.toDF("src", "dst")
    val undirected = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRank(spark, undirected)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("two symmetric nodes hold rank 0.5 exactly at any iteration count") {
    // r(A) = (1-d)/2 + d·r(B); from the symmetric start both stay at the
    // exact fixpoint 0.5 — any drift means the recurrence is wrong.
    val r = ranksOf(Seq((1L, 2L)))
    assert(r(1L) === 0.5)
    assert(r(2L) === 0.5)
  }

  test("star graph: mass sums to 1, center outranks leaves, leaves tie") {
    val r = ranksOf(Seq((10L, 1L), (10L, 2L), (10L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"rank mass ${r.values.sum}")
    assert(r(10L) > r(1L), "hub must outrank a leaf")
    assert(r(1L) === r(2L) && r(2L) === r(3L), "symmetric leaves must tie")
  }

  test("directed sinks: dangling mass conserved; skip flag fails loudly") {
    val sess = spark
    import sess.implicits._
    // 1 -> 2 -> 3, node 3 a pure sink: without redistribution total mass
    // decays toward (1-d)/(1-... ) < 1; with it, sum stays exactly 1.
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(spark, chain, handleDangling = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size === 3)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"rank mass ${r.values.sum}")
    assert(r(3L) > r(2L) && r(2L) > r(1L), "rank must accumulate downstream")
    // The no-sink assertion is checked, not trusted.
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(spark, chain, handleDangling = false)
    }
    assert(ex.getMessage.contains("assertion failed"))
    // The OTHER half of the invariant: a SOURCE node (out-edges, no
    // in-edges) passes a naive dst⊆src sink check, but the sink-free loop
    // rebuilds ranks from the contribution aggregate, so the node would
    // silently vanish after iteration 1 — must also fail loudly.
    val withSource = Seq((1L, 2L), (2L, 1L), (4L, 1L)).toDF("src", "dst")
    val ex2 = intercept[IllegalArgumentException] {
      Graph.pageRank(spark, withSource, handleDangling = false)
    }
    assert(ex2.getMessage.contains("assertion failed"))
    // ...and the dangling path handles it: node 4 keeps a rank row.
    val r2 = Graph.pageRank(spark, withSource, handleDangling = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r2.size === 3 && math.abs(r2.values.sum - 1.0) < 1e-9)
    assert(r2(4L) > 0)
  }

  test("trade-graph query emits one finite rank per node") {
    val out = Graph.queries("g1_pagerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length === out.length, "one row per node")
    assert(out.forall(x => x._2 > 0 && !x._2.isNaN && !x._2.isInfinite))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-3, "rank mass conserved")
  }
}
