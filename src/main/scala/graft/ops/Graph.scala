package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Iterative graph analytics over relation-derived graphs — the second
  * iterative-fixpoint operator family beside Dedup.neardupClusters
  * (connected components). Absent from the reference (SURVEY.md §2.2).
  *
  * PageRank here runs a FIXED number of power iterations, which makes it
  * oracle-checkable: the same recurrence unrolls into chained CTEs on the
  * DuckDB side, so an iterative distributed computation gets an exact
  * row/hash gate instead of a rows-only waiver.
  *
  * Scale design: each iteration is one join of the slim (src → rank/deg)
  * contribution stream with the edge list plus one aggregate on dst —
  * both shuffles are edge/node-sized, never corpus-sized. The edge list
  * (joined with out-degrees once, up front) persists across iterations;
  * ranks localCheckpoint eagerly per iteration so the logical plan stays
  * O(1) deep instead of O(iterations) (same lineage discipline as d6's
  * label propagation). Node count N is computed once on the driver and
  * amortized over all iterations. Dangling-mass handling adds one
  * node-sized aggregate + one broadcast scalar per iteration — nothing
  * edge-sized.
  */
object Graph {

  val Damping = 0.85
  val Iterations = 8
  /** Supplier node ids offset into their own range so the bipartite
    * customer↔supplier graph has disjoint id spaces.
    */
  val SupplierOffset = 1000000L

  /** PageRank over a directed edge list, with dangling-mass
    * redistribution: rank held by nodes with NO out-edges is spread
    * uniformly each iteration (the standard Page-Brin-Motwani-Winograd
    * correction — without it the recurrence leaks mass and converges to
    * the wrong vector on any directed graph with sinks).
    *
    * `handleDangling = false` skips the per-iteration dangling aggregate
    * for graphs the CALLER asserts are sink-free (e.g. undirected edge
    * lists containing both directions); the assertion is CHECKED once up
    * front — a dangling node under the skip flag fails loudly instead of
    * silently computing the mass-leaking recurrence.
    */
  /** `trustSinkFree = true` additionally skips the one-job
    * src-set == dst-set probe on the `handleDangling = false` path, for
    * callers whose edge list is symmetric BY CONSTRUCTION (e.g.
    * [[tradeEdges]], which unions every pair with its mirror — the
    * invariant holds algebraically, no data can break it). Only set it
    * when the symmetry is a construction-level proof, never a belief
    * about the data: a violating edge list silently computes the
    * mass-leaking recurrence.
    */
  def pageRank(s: SparkSession, edges: DataFrame, iterations: Int = Iterations,
               damping: Double = Damping, handleDangling: Boolean = false,
               trustSinkFree: Boolean = false): DataFrame = {
    // AQE stays ON for the loop (an A/B measured disabling it 1.5x
    // SLOWER): its runtime size discovery is what turns each
    // iteration's rank-side join into a broadcast after the first
    // shuffle, where static planning would sort-merge node frames.
    // Materialize the caller's edge DERIVATION exactly once: the degree
    // aggregate and the degree join below both consume the edge list, and
    // feeding them the raw plan would run a possibly join-heavy
    // derivation (g1/g2's orders⋈lineitem distinct) once per consumer —
    // measured as HALF of g2's wall before this landed (the loop itself
    // is node-sized and cheap; setup re-derivation was the real cost).
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Hash-partition the (big) edge list by src ONCE before caching: the
    // cached scan keeps its outputPartitioning, so every iteration's
    // contribution join shuffles only the node-sized rank side — the edge
    // list never moves again. This is the partitioning-reuse lever the
    // brief calls out; at 8 iterations it removes 8 edge-list exchanges.
    // 8 partitions, not the session default 32: every per-iteration job
    // (contribution join, aggregate, checkpoint) launches tasks per
    // partition, and on node-sized frames the task-launch overhead
    // dominates compute — fewer, fuller tasks win until the edge list
    // genuinely needs the width (then raise spark.sql.shuffle.partitions
    // for the session; the join still co-partitions on src).
    val withDeg = e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(8, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Node set covers BOTH endpoints: a sink appears only as dst. On the
      // sink-free path src-distinct is the same set, computed from half
      // the rows; the assertion is then one anti-join PROBE (any dst not
      // among the srcs?) instead of a per-node degree materialization —
      // the guard costs one node-sized job, not a checkpoint.
      // On the dangling path the node set is fused INTO the nodeDeg
      // checkpoint below — one eager setup job, not two.
      lazy val nodes =
        (if (handleDangling)
          withDeg.select(col("src").as("id")).union(withDeg.select(col("dst").as("id")))
        else withDeg.select(col("src").as("id")))
          .distinct().localCheckpoint(true)
      if (!handleDangling && !trustSinkFree) {
        // The fast path needs BOTH halves of the undirected invariant:
        // every dst has out-edges (no sinks — else mass leaks), and every
        // src has in-edges (the loop rebuilds ranks from the contribution
        // aggregate, so an in-edge-less node would silently VANISH from
        // the rank vector after iteration 1). One symmetric-difference
        // probe checks both directions.
        val dsts = withDeg.select(col("dst").as("id")).distinct()
        // ONE probe job for both directions (each anti join is node-sized;
        // a union of the two violation sets is empty iff both are)
        val sinkFree = dsts.join(nodes, Seq("id"), "left_anti")
          .unionByName(nodes.join(dsts, Seq("id"), "left_anti"))
          .isEmpty
        require(sinkFree,
          "directed node(s) in a pageRank(handleDangling=false) call — " +
            "the src-set == dst-set assertion failed (sink or source " +
            "node present); pass handleDangling=true")
      }
      // deg carried on the rank rows (null = dangling) so dangling-ness
      // is a row-local predicate, never a per-iteration join. Computed
      // once — out-degrees never change, and the per-src degree is read
      // from the CACHED withDeg rows (distinct (src, deg)), never by
      // re-running the caller's edge derivation. Skipped entirely on the
      // sink-free path (degrees live only in the cached edge list).
      val nodeDeg =
        if (handleDangling)
          withDeg.select(col("src").as("id")).union(withDeg.select(col("dst").as("id")))
            .distinct()
            .join(withDeg.select(col("src"), col("deg")).distinct(),
              col("id") === col("src"), "left")
            .select(col("id"), col("deg")).localCheckpoint(true)
        else nodes.withColumn("deg", lit(1L))
      val n = if (handleDangling) nodeDeg.count() else nodes.count()
      // The dangling path also carries LAST iteration's dangling mass as
      // a COLUMN (`dm`, identical on every row): riding it through the
      // aggregate via the zero-leg's max() means the scalar is already
      // resident where iteration k+1 needs it — no per-iteration dm
      // aggregate job (the r9 broadcast-one-row form still launched one
      // concurrent job per step; at node-sized frames job latency, not
      // compute, dominated g2). The NEXT mass is folded into the same
      // plan as an unpartitioned window over the aggregate's node-sized
      // output — bounded because the node set is entity-sized, orders
      // below the edge set (for billion-node graphs, swap the window for
      // a two-level partial-sum aggregate; the recurrence is unchanged).
      val dmW = org.apache.spark.sql.expressions.Window
        .rowsBetween(Long.MinValue, Long.MaxValue)
      // ranks₀ needs no checkpoint of its own: it is a map-only
      // projection over the already-cached nodeDeg, so iteration 1's two
      // references each cost a cache scan, not a re-derivation.
      var ranks =
        if (!handleDangling) nodeDeg.withColumn("rank", lit(1.0 / n))
        else {
          val d = nodeDeg.filter(col("deg").isNull).count()
          nodeDeg.withColumn("rank", lit(1.0 / n))
            .withColumn("dm", lit(d.toDouble / n))
        }
      for (k <- 1 to iterations) {
        val next =
          if (handleDangling) {
            // Two references to `ranks` per step (contribution join,
            // zero-row carry), both reading the cached node-sized rows.
            // The per-node carry is NOT a left join against the
            // contribution aggregate but a zero-contribution leg UNIONED
            // in before it — missing nodes surface as groups summing to
            // their 0.0 leg (bit-exact: 0.0 + x = x for the positive
            // ranks), and the static `deg` plus the carried `dm` ride
            // the zero leg via max() (contribution legs carry nulls, and
            // the zero leg covers EVERY node, so max() always resolves) —
            // each iteration is ONE node+edge-sized shuffle, one window
            // pass, zero extra jobs.
            withDeg
              .join(ranks.select(col("id"), col("rank")), col("src") === col("id"))
              .select(col("dst"), (col("rank") / col("deg")).as("c"),
                lit(null).cast("long").as("deg"),
                lit(null).cast("double").as("dm"))
              .unionByName(ranks.select(col("id").as("dst"), lit(0.0).as("c"),
                col("deg"), col("dm")))
              // explicit 8-way exchange ahead of the aggregate (matching
              // the edge cache's width): the final agg reuses it, so the
              // iteration launches 8 fuller tasks instead of 32 slivers
              .repartition(8, col("dst"))
              .groupBy(col("dst"))
              .agg(sum(col("c")).as("in_rank"), max(col("deg")).as("deg"),
                max(col("dm")).as("dm_prev"))
              .select(col("dst").as("id"), col("deg"),
                (lit((1 - damping) / n) + lit(damping) *
                  (col("in_rank") + col("dm_prev") / n)).as("rank"))
              .withColumn("dm",
                sum(when(col("deg").isNull, col("rank")).otherwise(lit(0.0)))
                  .over(dmW))
          } else {
            // Sink-free ⇒ every node has an out-edge; with both directions
            // present every node also has an in-edge, so the contribution
            // aggregate already covers every node — no nodes re-join per
            // iteration (that join would double the per-iteration shuffle
            // count for rows that can never be missing).
            withDeg
              .join(ranks.select(col("id"), col("rank")), col("src") === col("id"))
              .select(col("dst"), (col("rank") / col("deg")).as("c"))
              // explicit 8-way exchange ahead of the aggregate (matching
              // the edge cache's width): the final agg reuses it — 8
              // fuller tasks instead of 32 slivers (3.77s -> 3.32s)
              .repartition(8, col("dst"))
              .groupBy(col("dst")).agg(sum(col("c")).as("in_rank"))
              .select(col("dst").as("id"), lit(1L).as("deg"),
                (lit((1 - damping) / n) + lit(damping) * col("in_rank")).as("rank"))
          }
        ranks = next
        // Sink-free path: checkpoint every FOURTH iteration (and the
        // last) — each eager localCheckpoint is a full job, and chained
        // join+agg levels with a SINGLE rank reference per step plan and
        // pipeline fine, so stretching the cadence cuts the loop's job
        // count (every-2 took 7.75s -> 6.5s when it landed; every-4
        // measured another step down at sf0.1 — per-job fixed latency,
        // not compute, dominates node-sized rounds). The dangling path
        // checkpoints EVERY iteration: it references `ranks` twice per
        // step (contribution join + zero-carry leg), and chaining two
        // un-materialized iterations was MEASURED to re-execute the
        // embedded subplan instead of reusing its exchange (5.9s vs
        // 3.1s min-of-4 at sf0.1) — with the dm column riding the
        // aggregate there is no per-step scalar job left to amortize,
        // so eager-every-step is the cheaper shape.
        if (handleDangling || k % 4 == 0 || k == iterations)
          ranks = ranks.localCheckpoint(true)
      }
      ranks.select(col("id"), col("rank"))
    } finally withDeg.unpersist(false)
  }

  /** BFS min-hop distances from `source`, bounded at `maxHops` — the
    * reachability/radius primitive (friend-of-friend expansion, blast-
    * radius queries). Each round is ONE relaxation: current distances
    * unioned with frontier-extended candidates, then a min-per-node
    * aggregate — the same shape the unrolled-CTE oracle replays, so an
    * iterative traversal gets an exact row/hash gate. All-integer state.
    *
    * Scale: per round, one edge⋈distance join (edge side cached and
    * pre-partitioned by the caller via [[pageRank]]'s discipline — here
    * distances are node-sized and rounds few, so the plain join wins) +
    * one node-sized aggregate; localCheckpoint bounds lineage per round.
    */
  def bfsHops(s: SparkSession, edges: DataFrame, source: Long,
              maxHops: Int): DataFrame = {
    // Materialize the edge list ONCE: each round's relaxation references
    // it, and without this every per-round checkpoint job would re-derive
    // the (possibly join-heavy) edge expression maxHops times.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var dist = s.range(1).select(lit(source).as("id"), lit(0).as("hops"))
      .localCheckpoint(true)
    for (k <- 1 to maxHops) {
      // SINGLE-reference relaxation: instead of `dist UNION (dist ⋈ e)`
      // (two reads of dist per round — chaining such rounds re-executes
      // the embedded subplan, the g2 lesson), LEFT-join once and emit
      // both the carried row and its neighbor candidates from the SAME
      // join output via explode. One dist reference per round means
      // rounds CHAIN safely, so the loop checkpoints every second round
      // (and the last) — half the per-round job count, which is the
      // dominant cost on node-sized frames.
      dist = dist
        .join(e, col("id") === col("src"), "left")
        .select(explode(array(
          struct(col("id"), col("hops")),
          struct(col("dst").as("id"), (col("hops") + 1).as("hops")))).as("x"))
        .filter(col("x.id").isNotNull) // left-join miss: carried row only
        // same width discipline as pageRank: node-sized rounds want few
        // full tasks, not 32 slivers
        .repartition(8, col("x.id"))
        .groupBy(col("x.id").as("id"))
        .agg(min(col("x.hops")).as("hops"))
      // single-ref rounds chain safely; checkpoint every fourth (and the
      // last) to bound lineage for deep traversals without paying a
      // materialization job per round
      if (k % 4 == 0 || k == maxHops) dist = dist.localCheckpoint(true)
    }
    dist
  }

  /** The customer↔supplier trade graph: an (undirected) edge per distinct
    * customer–supplier pair that ever traded, derived from orders ⋈
    * lineitem.
    */
  def tradeEdges(s: SparkSession, d: String): DataFrame = {
    // Both union legs embed the same orders⋈lineitem distinct subplan;
    // exchange reuse deduplicates the heavy join inside the consumer's
    // one materialization job (A/B-measured: pre-checkpointing the
    // directed half into its own job was SLOWER — the extra eager job
    // cost more than the reuse it tried to buy).
    val pairs = directedTradeEdges(s, d)
    pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** The DIRECTED half: customers point at the suppliers they bought
    * from. Every supplier is a sink (no out-edges) — the graph shape that
    * exercises dangling-mass redistribution maximally.
    */
  def directedTradeEdges(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "orders")
      .join(Tables.table(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + SupplierOffset).as("dst"))
      .distinct()

  /** Balance-affinity graph: customers of the same nation whose account
    * balances differ by less than `eps` — a deterministic, reproducible
    * similarity graph (no RNG), dense enough to contain triangles at
    * every sf.
    *
    * Candidate generation is BANDED, not all-pairs: each row lands in
    * band floor(bal/eps); a qualifying pair's bands differ by at most 1,
    * so joining one side exploded to {band-1, band, band+1} against the
    * other side's single band finds every pair EXACTLY once (the three
    * exploded values are distinct) while the join key (nation, band)
    * keeps candidate groups O(points per band), never O(points per
    * nation)². The residual `abs(a-b) < eps` is applied identically on
    * both engines, so banding is purely a pruning strategy — the edge
    * set is exact.
    */
  def balanceEdges(s: SparkSession, d: String, eps: Double): DataFrame = {
    val c = Tables.table(s, d, "customer")
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        col("c_acctbal").as("bal"))
    val band = floor(col("bal") / eps).cast("long")
    val probe = c.withColumn("band",
      explode(array(band - 1, band, band + 1)))
    val build = c.withColumn("band", band)
    probe.alias("x").join(build.alias("y"),
        col("x.nk") === col("y.nk") && col("x.band") === col("y.band") &&
          col("x.k") < col("y.k") &&
          abs(col("x.bal") - col("y.bal")) < eps)
      .select(col("x.nk").as("nk"), col("x.k").as("u"), col("y.k").as("v"))
  }

  /** Exact triangle count per nation over [[balanceEdges]], using the
    * degree-ordered orientation (Ortmann–Brandes / "compact-forward"):
    * orient every edge from the lower-(degree, id) endpoint to the
    * higher, enumerate wedges a→b→c, close them against the oriented
    * edge (a, c).
    *
    * Scale design: with degree orientation a vertex's out-degree is
    * O(√m), so the wedge join — the only quadratic-risk step — is
    * bounded per vertex even on skewed (power-law) graphs; orienting by
    * raw id instead would let one popular hub generate deg² wedges.
    * Three hash joins + one aggregate, all keyed on vertex ids — no
    * all-pairs step anywhere. The triangle COUNT is invariant under the
    * orientation's total order, which is what makes the simple
    * id-oriented SQL oracle an exact gate for the degree-oriented plan.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("k"))
      .unionAll(edges.select(col("v").as("k")))
      .groupBy(col("k")).agg(count(lit(1)).as("deg"))
    val oriented = edges
      .join(deg.select(col("k").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("k").as("v"), col("deg").as("dv")), "v")
      // u < v by construction, so (deg, id) ordering reduces to: u leads
      // unless v has strictly smaller degree.
      .select(col("nk"),
        when(col("du") <= col("dv"), col("u")).otherwise(col("v")).as("a"),
        when(col("du") <= col("dv"), col("v")).otherwise(col("u")).as("b"))
    val wedges = oriented.alias("p").join(oriented.alias("q"),
        col("p.b") === col("q.a"))
      .select(col("p.nk").as("nk"), col("p.a").as("a"), col("q.b").as("c"))
    wedges.join(oriented.select(col("a").as("ca"), col("b").as("cb")).alias("r"),
        col("a") === col("ca") && col("c") === col("cb"))
      .groupBy(col("nk")).agg(count(lit(1)).as("n_triangles"))
  }

  val BalanceEps = 50.0
  val LpaRounds = 4

  /** Synchronous label propagation (Raghavan et al. 2007) made
    * deterministic: every node starts as its own label; each round every
    * node adopts the most frequent label among its NEIGHBORS, ties broken
    * by the smallest label (the asynchronous/random variant of the paper
    * is not engine-replayable; the synchronous min-tiebreak one is a pure
    * dataflow). Isolated nodes keep their own label. Unlike
    * [[labelComponents]]-style connected components (d6), LPA yields
    * sub-component communities — dense cores absorb their periphery while
    * weak bridges don't merge.
    *
    * Scale: per round one edge⋈label join + a (node, label)-keyed count +
    * a node-keyed argmax — all hash-partitioned on node ids, nothing
    * quadratic; rounds are fixed ([[LpaRounds]]) and node-sized frames
    * localCheckpoint per round to bound lineage (the bfsHops discipline).
    */
  def labelPropagation(s: SparkSession, edges: DataFrame, nodes: DataFrame,
                       rounds: Int): DataFrame = {
    val e = edges.select(col("u"), col("v"))
      .union(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val nb = e.join(labels.select(col("id").as("v"), col("lbl")), "v")
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
      // argmax by (count, -label): highest count, ties to the SMALLEST
      // label — a total order per node since labels are distinct per group
      val pick = nb.groupBy(col("u").as("id"))
        .agg(max_by(col("lbl"), struct(col("c"), negate(col("lbl")))).as("new_lbl"))
      labels = labels.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g5_label_propagation" -> { (s, d) =>
      // Communities over the balance-affinity graph (g3's edge set): the
      // deterministic synchronous LPA above, fixed LpaRounds rounds.
      labelPropagation(s,
        balanceEdges(s, d, BalanceEps).select(col("u"), col("v")),
        Tables.table(s, d, "customer").select(col("c_custkey").as("id")),
        LpaRounds)
        .select(col("id"), col("lbl").as("community"))
    },
    "g1_pagerank" -> { (s, d) =>
      // trustSinkFree: tradeEdges mirrors every pair, so src-set ==
      // dst-set holds by construction — the probe job is provably
      // redundant here (the guard stays on for arbitrary caller edges)
      pageRank(s, tradeEdges(s, d), trustSinkFree = true)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },
    "g3_triangle_count" -> { (s, d) =>
      triangleCount(balanceEdges(s, d, BalanceEps))
    },
    "g2_pagerank_directed" -> { (s, d) =>
      // Directed graph where every supplier is a sink: rank flows
      // customer → supplier and returns only through the dangling-mass
      // term, so a leaky implementation diverges from the oracle in
      // iteration 2 (suppliers would hoard mass; total would decay).
      pageRank(s, directedTradeEdges(s, d), handleDangling = true)
        .select(col("id"), round(col("rank"), 6).as("rank"))
    },
    "g4_bfs_hops" -> { (s, d) =>
      bfsHops(s, tradeEdges(s, d), BfsSource, BfsMaxHops)
    }
  )

  val BfsSource = 1L   // customer 1 exists at every sf
  val BfsMaxHops = 4

  /** The same power iteration unrolled into chained CTEs — r1..rK each
    * computed from its predecessor exactly as the Spark loop does, with
    * an optional dangling-mass scalar per step mirroring
    * `handleDangling = true`.
    */
  private def pageRankOracle(iterations: Int, damping: Double,
                             directed: Boolean): String = {
    val pairsSql =
      s"""  SELECT DISTINCT o_custkey AS src, l_suppkey + $SupplierOffset AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin
    val edgesSql =
      if (directed) "SELECT src, dst FROM pairs"
      else "SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs"
    val base =
      s"""WITH pairs AS (
         |$pairsSql),
         |edges AS ($edgesSql),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT id FROM (
         |  SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges) u),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { k =>
      val dmCte =
        s"""dm$k AS (
           |  SELECT coalesce(sum(r${k - 1}.rank), 0) AS dm
           |  FROM r${k - 1} LEFT JOIN deg ON deg.src = r${k - 1}.id
           |  WHERE deg.src IS NULL)""".stripMargin
      val dmTerm = if (directed) s" + (SELECT dm FROM dm$k) / (SELECT n FROM nn)" else ""
      val rCte =
        s"""r$k AS (
           |  SELECT nodes.id,
           |    (1 - $damping) / (SELECT n FROM nn)
           |      + $damping * (coalesce(sum(r${k - 1}.rank / deg.deg), 0)$dmTerm) AS rank
           |  FROM nodes
           |  LEFT JOIN edges ON edges.dst = nodes.id
           |  LEFT JOIN deg ON deg.src = edges.src
           |  LEFT JOIN r${k - 1} ON r${k - 1}.id = edges.src
           |  GROUP BY nodes.id)""".stripMargin
      if (directed) s"$dmCte,\n$rCte" else rCte
    }
    (base +: iters).mkString(",\n") +
      s"\nSELECT id, round(rank, 6) AS rank FROM r$iterations"
  }

  /** BFS unrolled: each CTE is one min-relaxation round, exactly the
    * Spark loop's union + min aggregate.
    */
  private def bfsOracle(maxHops: Int): String = {
    val rounds = (1 to maxHops).map { k =>
      s"""d$k AS MATERIALIZED (
         |  SELECT id, CAST(min(hops) AS INT) AS hops FROM (
         |    SELECT id, hops FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, d.hops + 1 AS hops
         |    FROM edges e JOIN d${k - 1} d ON e.src = d.id)
         |  GROUP BY id
         |)""".stripMargin
    }
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS src, l_suppkey + $SupplierOffset AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
       |d0 AS (SELECT CAST($BfsSource AS BIGINT) AS id, CAST(0 AS INT) AS hops),
       |${rounds.mkString(",\n")}
       |SELECT id, hops FROM d$maxHops""".stripMargin
  }

  /** LPA unrolled: each CTE trio (neighbor-label counts → per-node
    * argmax via row_number(ORDER BY c DESC, lbl) → carried label) is one
    * synchronous round, exactly the Spark loop's three steps.
    */
  private def lpaOracle(rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      s"""nb$k AS (
         |  SELECT e.u AS id, l.lbl, count(*) AS c
         |  FROM edges e JOIN l${k - 1} l ON e.v = l.id GROUP BY 1, 2),
         |pk$k AS (
         |  SELECT id, lbl FROM (
         |    SELECT id, lbl,
         |      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
         |    FROM nb$k) z WHERE rn = 1),
         |l$k AS (
         |  SELECT l.id, coalesce(p.lbl, l.lbl) AS lbl
         |  FROM l${k - 1} l LEFT JOIN pk$k p ON l.id = p.id)""".stripMargin
    }
    s"""WITH e0 AS (
       |  SELECT a.c_custkey AS u, b.c_custkey AS v
       |  FROM customer a JOIN customer b
       |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
       |   AND abs(a.c_acctbal - b.c_acctbal) < $BalanceEps),
       |edges AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       |l0 AS (SELECT c_custkey AS id, c_custkey AS lbl FROM customer),
       |${iters.mkString(",\n")}
       |SELECT id, lbl AS community FROM l$rounds""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "g5_label_propagation" -> lpaOracle(LpaRounds),
    "g4_bfs_hops" -> bfsOracle(BfsMaxHops),
    "g1_pagerank" -> pageRankOracle(Iterations, Damping, directed = false),
    "g2_pagerank_directed" -> pageRankOracle(Iterations, Damping, directed = true),
    // The oracle orients by id (a<b<c); the Spark side orients by
    // (degree, id). Both are acyclic total orders, and every triangle
    // {x,y,z} contributes exactly one wedge-plus-closing-edge under ANY
    // acyclic orientation, so the per-nation counts are identical.
    "g3_triangle_count" ->
      s"""WITH e AS (
         |  SELECT a.c_nationkey AS nk, a.c_custkey AS a, b.c_custkey AS b
         |  FROM customer a JOIN customer b
         |    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
         |   AND abs(a.c_acctbal - b.c_acctbal) < $BalanceEps)
         |SELECT e1.nk AS nk, count(*) AS n_triangles
         |FROM e e1
         |JOIN e e2 ON e1.b = e2.a
         |JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b
         |GROUP BY e1.nk""".stripMargin
  )
}
