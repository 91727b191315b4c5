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

  private def trianglesOf(edges: Seq[(Int, Long, Long)]): Map[Int, Long] = {
    val sess = spark
    import sess.implicits._
    Graph.triangleCount(edges.toDF("nk", "u", "v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  test("triangle count: K4 has 4, a path has 0, nations stay separate") {
    // K4 on {1,2,3,4}: C(4,3) = 4 triangles; nation 9's 3-path has none.
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (0, a, b)
    val path = Seq((9, 10L, 11L), (9, 11L, 12L))
    val t = trianglesOf(k4 ++ path)
    assert(t === Map(0 -> 4L), s"got $t")
  }

  test("degree orientation counts exactly what id orientation counts") {
    // A skewed graph: hub 1 connected to all of 2..8, plus a few rim
    // edges. Degree orientation points rim→hub; the count must equal the
    // brute-force id-oriented enumeration (the oracle's form).
    val edges = (2L to 8L).map(b => (0, 1L, b)) ++
      Seq((0, 2L, 3L), (0, 3L, 4L), (0, 5L, 6L), (0, 2L, 8L))
    val got = trianglesOf(edges)
    // id-oriented brute force: u<v holds for every input pair already
    val set = edges.map(e => (e._2, e._3)).toSet
    val verts = set.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var expect = 0L
    for {
      a <- verts; b <- verts if a < b && set((a, b))
      c <- verts if b < c && set((b, c)) && set((a, c))
    } expect += 1
    assert(got.getOrElse(0, 0L) === expect, s"got $got expect $expect")
  }

  test("label propagation: barbell communities split; brute-force parity at sf") {
    val sess = spark
    import sess.implicits._
    // Two triangles joined by one bridge edge: connected components would
    // merge everything into one label; LPA keeps two communities because
    // each triangle's majority beats the single bridge vote.
    val barbell = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val nodes = (1L to 6L).toDF("id")
    val lbl = Graph.labelPropagation(spark, barbell, nodes, Graph.LpaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl(1L) === lbl(2L) && lbl(2L) === lbl(3L), "left triangle must agree")
    assert(lbl(4L) === lbl(5L) && lbl(5L) === lbl(6L), "right triangle must agree")
    assert(lbl(1L) !== lbl(4L), "the bridge must NOT merge the communities")

    // Brute-force parity on the real balance graph: synchronous rounds,
    // neighbor majority, min-label ties — a from-scratch map fold.
    val edges = Graph.balanceEdges(spark, sf, Graph.BalanceEps)
      .select(col("u"), col("v")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2) }
    val ids = graft.tables.Tables.table(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    var labels = ids.map(i => i -> i).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      val next = ids.map { i =>
        adj.get(i) match {
          case Some(nbs) if nbs.nonEmpty =>
            val counts = nbs.groupBy(labels).map { case (l, xs) => (l, xs.length) }
            i -> counts.minBy { case (l, c) => (-c, l) }._1
          case _ => i -> labels(i)
        }
      }.toMap
      labels = next
    }
    val got = Graph.queries("g5_label_propagation")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === labels, "distributed LPA diverged from the brute force")
    // communities are strictly finer than one-per-node and coarser than all-in-one
    assert(got.values.toSet.size > 1 && got.values.toSet.size < ids.length)
  }

  test("banded balance edges equal the all-pairs filter exactly") {
    val sess = spark
    import sess.implicits._
    val banded = Graph.balanceEdges(spark, sf, Graph.BalanceEps)
      .as[(Int, Long, Long)].collect().toSet
    val c = graft.tables.Tables.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val brute = c.alias("a").join(c.alias("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          abs(col("a.c_acctbal") - col("b.c_acctbal")) < Graph.BalanceEps)
      .select(col("a.c_nationkey"), col("a.c_custkey"), col("b.c_custkey"))
      .as[(Int, Long, Long)].collect().toSet
    assert(banded === brute)
    assert(banded.nonEmpty, "graph must be non-trivial at sf0.001")
  }

  test("bfsHops: min-hop distances on a known graph, bounded depth") {
    val sess = spark
    import sess.implicits._
    // path 1-2-3-4-5 with shortcut 1-4 (both directions)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.bfsHops(spark, edges, 1L, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the shortcut wins: 4 at hop 1, so 3 and 5 at hop 2; nothing deeper
    assert(got === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2))
    // depth bound: maxHops = 1 must not see 3 or 5
    val shallow = Graph.bfsHops(spark, edges, 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shallow === Map(1L -> 0, 2L -> 1, 4L -> 1))
  }
}
