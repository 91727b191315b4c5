package graft.ops

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Dense-vector kernels for the similarity operators.
  *
  * Pairwise cosine over Array[Float] embeddings is the one hot loop where
  * Catalyst expressions lose badly: higher-order functions (zip_with +
  * aggregate) are interpreted per pair, so an O(n²·d) scoring pass pays
  * boxing + expression-eval overhead on every multiply (measured 33 s for
  * 2M pairs at sf0.1). The blocked design — broadcast one side as plain
  * float arrays, tight JVM loop in mapPartitions on the other — is also
  * the shape that scales: at 100 TB the broadcast side becomes a tiled
  * chunk (or an LSH/IVF-pruned candidate block, see Sim), and each
  * executor multiplies its partition against the resident tile at memory
  * bandwidth, zero shuffle.
  *
  * Arithmetic is a sequential fold over dims in doubles — the exact order
  * the previous expression formulation and the DuckDB oracle use, so
  * results are bit-identical.
  */
object VecOps {

  final case class Vec(id: Long, emb: Array[Float], norm: Double)

  def dotD(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  def normD(a: Array[Float]): Double = math.sqrt(dotD(a, a))

  /** Spark round() semantics: BigDecimal HALF_UP on the double value. */
  def round4(x: Double): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x).setScale(4, RoundingMode.HALF_UP)).toDouble

  /** Load (id, embedding, norm) vectors from a table's id + array column. */
  def vectors(s: SparkSession, df: DataFrame, idCol: String, embCol: String): Array[Vec] =
    df.select(col(idCol), col(embCol)).collect().map { r =>
      val emb = r.getSeq[Float](1).toArray
      Vec(r.getLong(0), emb, normD(emb))
    }

  /** All id-ordered pairs with cosine ≥ threshold: broadcast block × scan.
    * At this sf the whole base side fits in one broadcast tile; the tiled
    * variant below is the same algorithm with bounded driver/broadcast
    * memory.
    */
  def cosinePairs(s: SparkSession, df: DataFrame, idCol: String, embCol: String,
                  threshold: Double): DataFrame =
    cosinePairsTiled(s, df, idCol, embCol, threshold, numTiles = 1)

  /** The 100 TB form of [[cosinePairs]]: the broadcast side is split into
    * `numTiles` hash tiles (`id % numTiles`), and the scan side multiplies
    * against one resident tile per round — driver and executor memory hold
    * ONE tile of vectors regardless of corpus size, while the scan side
    * streams from storage each round. Tile membership by key hash needs no
    * id collection or range computation, and the `tile.id > id` guard keeps
    * the union over rounds an exact, duplicate-free enumeration of all
    * ordered pairs. Cost is numTiles scans of the base side — the
    * standard blocked matrix-product trade (compute unchanged, memory
    * bounded); in practice the LSH/IVF paths (Sim) prune candidates first
    * and this exact kernel runs on the pruned block.
    */
  def cosinePairsTiled(s: SparkSession, df: DataFrame, idCol: String, embCol: String,
                       threshold: Double, numTiles: Int): DataFrame = {
    import s.implicits._
    require(numTiles >= 1, s"numTiles must be >= 1, got $numTiles")
    val base = df.select(col(idCol), col(embCol)).as[(Long, Array[Float])]
    (0 until numTiles).map { t =>
      val tileVecs = vectors(s,
        if (numTiles == 1) df
        else df.filter(org.apache.spark.sql.functions.pmod(col(idCol), org.apache.spark.sql.functions.lit(numTiles)) === t),
        idCol, embCol).sortBy(_.id)
      val block = s.sparkContext.broadcast(tileVecs)
      base.mapPartitions { it =>
        val tile = block.value
        it.flatMap { case (id, emb) =>
          val n = normD(emb)
          tile.iterator
            .filter(_.id > id)
            .map(v => (id, v.id, round4(dotD(emb, v.emb) / (n * v.norm))))
            .filter(_._3 >= threshold)
        }
      }.toDF("vec_a", "vec_b", "cos")
    }.reduce(_ union _)
  }

  /** Driver-bypass form of [[cosinePairsTiled]]: the SAME blocked all-pairs
    * enumeration, but tiles meet in a SHUFFLE JOIN on a pair-block key
    * instead of riding a driver `collect()` + broadcast — no vector ever
    * touches the driver, and the per-key right-side buffer is Spark's
    * spilling row array, so an over-sized tile degrades to disk instead of
    * OOM.
    *
    * Layout: tile(v) = id mod numTiles; block (i,j), i <= j, pairs tile i
    * (A side) with tile j (B side). A row in tile t is replicated to its
    * blocks — shuffle volume n·(numTiles+1)/2 rows per side, the classic
    * blocked-matrix-product trade. Same-tile blocks dedup with id_a < id_b;
    * cross-tile pairs occur in exactly one block and are emitted
    * min-id-first. Arithmetic (sequential double fold, shared norms,
    * HALF_UP round4) is IDENTICAL to the broadcast kernel, so results are
    * bit-equal (DedupSimSpec pins it).
    *
    * WHEN TO USE WHICH: the broadcast tile costs one driver copy + one
    * in-memory tile per executor — fastest while a tile (≈ rows/numTiles ·
    * dim · 4 B) fits comfortably beside the executor heap (the same
    * regime as a broadcast join, ≲ a few hundred MB per tile). Past that —
    * growing numTiles would trade it for numTiles full rescans — switch
    * here: memory per task is bounded by the spillable join buffer, the
    * driver is out of the data path entirely, and the replication factor
    * grows only linearly with numTiles.
    */
  def cosinePairsShuffled(s: SparkSession, df: DataFrame, idCol: String, embCol: String,
                          threshold: Double, numTiles: Int): DataFrame = {
    import s.implicits._
    require(numTiles >= 1, s"numTiles must be >= 1, got $numTiles")
    val base = df.select(col(idCol), col(embCol)).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        (id, emb, normD(emb), java.lang.Math.floorMod(id, numTiles.toLong).toInt)
      }
    val aSide = base.flatMap { case (id, emb, n, t) =>
      (t until numTiles).map(j => (t * numTiles + j, id, emb, n))
    }
    val bSide = base.flatMap { case (id, emb, n, u) =>
      (0 to u).map(i => (i * numTiles + u, id, emb, n))
    }
    // Cogroup, not join: a pair-block join would MATERIALIZE n²/2 wide
    // (emb_a, emb_b) rows through the join output before scoring —
    // measured quadratic-slow from row traffic alone. Here the B tile
    // buffers once per block (the same ~n/numTiles-vector residency the
    // broadcast kernel holds, sized by numTiles) while the A side
    // STREAMS through the tight loop, so nothing wider than the final
    // (vec_a, vec_b, cos) hits a row. The sort-based cogroup shuffle
    // spills to disk; only the buffered tile must fit memory.
    aSide.groupByKey(_._1).cogroup(bSide.groupByKey(_._1)) { (block, aIt, bIt) =>
      val tile = bIt.map { case (_, id, emb, n) => (id, emb, n) }.toArray
      val sameTile = block / numTiles == block % numTiles
      aIt.flatMap { case (_, ia, ea, na) =>
        tile.iterator.flatMap { case (ib, eb, nb) =>
          if (sameTile && ia >= ib) Iterator.empty
          else {
            val c = round4(dotD(ea, eb) / (na * nb))
            if (c >= threshold)
              Iterator.single(if (ia < ib) (ia, ib, c) else (ib, ia, c))
            else Iterator.empty
          }
        }
      }
    }.toDF("vec_a", "vec_b", "cos")
  }

  /** Which exact all-pairs kernel to run, decided by
    * [[chooseExactKernel]] from table stats — see [[exactCosinePairs]].
    */
  sealed trait ExactKernelChoice { def numTiles: Int }
  final case class BroadcastTiles(numTiles: Int) extends ExactKernelChoice
  final case class ShuffledTiles(numTiles: Int) extends ExactKernelChoice

  /** One resident tile of vectors per executor — the broadcast-join
    * regime. 256 MB beside a multi-GB executor heap; at 64-d float
    * embeddings that is ~900k vectors per tile.
    */
  val DefaultTileBudgetBytes: Long = 256L << 20

  /** Past this many broadcast tiles, the tiles × full-rescan I/O of the
    * broadcast kernel loses to the shuffled kernel's ~(tiles+1)/2-row
    * linear replication, and the driver copy per tile stops being free.
    */
  val MaxBroadcastTiles: Int = 8

  /** The exact-pairs crossover as a PURE function of table stats, so the
    * decision is unit-testable and the dispatcher can never refuse:
    * estimate resident bytes per vector (dim floats + id + norm + JVM
    * array headers), size the tile count so ONE tile fits the budget,
    * then pick the kernel by what that tile count costs — `numTiles`
    * full rescans of the base side under the broadcast kernel (fastest
    * while rescans are few: tile residency is memory-speed, zero
    * shuffle) vs the cogroup kernel's shuffle of ~(numTiles+1)/2 copies
    * of each row (driver out of the data path, spillable buffer, linear
    * in numTiles). Rows/dim of zero degrade to the single-tile broadcast
    * — an empty scoring pass, never an error.
    */
  def chooseExactKernel(rows: Long, dim: Int,
                        tileBudgetBytes: Long = DefaultTileBudgetBytes,
                        maxBroadcastTiles: Int = MaxBroadcastTiles): ExactKernelChoice = {
    require(tileBudgetBytes > 0, s"tileBudgetBytes must be positive, got $tileBudgetBytes")
    val perVec = dim.toLong * 4 + 48 // floats + (id, norm) + object/array headers
    val total = math.max(0L, rows) * perVec
    val tiles = math.max(1L, (total + tileBudgetBytes - 1) / tileBudgetBytes)
    if (tiles <= maxBroadcastTiles) BroadcastTiles(tiles.toInt)
    else ShuffledTiles(math.min(tiles, Int.MaxValue.toLong).toInt)
  }

  /** Exact all-pairs cosine ≥ threshold with the KERNEL CHOSEN FROM TABLE
    * STATS — the dispatch form of the d5 (broadcast-tile) vs d9 (cogroup
    * shuffle) crossover, so callers at any corpus size get the right
    * plan instead of an OOM or a hand-tuned numTiles. Row count comes
    * from Catalyst plan stats when the optimizer knows it (CBO/ANALYZE'd
    * tables) and otherwise from one id-column count — metadata-cheap
    * against parquet, never a vector collect; dim from one row's array
    * length. Both kernels emit bit-identical results (DedupSimSpec), so
    * the dispatch is invisible in the output — pure execution strategy,
    * the same stance as the tiling itself.
    */
  def exactCosinePairs(s: SparkSession, df: DataFrame, idCol: String,
                       embCol: String, threshold: Double,
                       tileBudgetBytes: Long = DefaultTileBudgetBytes,
                       maxBroadcastTiles: Int = MaxBroadcastTiles,
                       rowsHint: Option[Long] = None): DataFrame = {
    // Plan-stats row counts are trusted ONLY while CBO is off: with CBO
    // on, stats.rowCount after a Filter is an ESTIMATE, and an
    // underestimate would dispatch a corpus-sized broadcast tile — the
    // exact OOM this function exists to prevent. CBO-off rowCounts come
    // only from exact sources (local/cached relations, ranges). Callers
    // holding exact metadata counts (FileStats sidecars, AnnIndex) pass
    // rowsHint; otherwise one id-column count settles it.
    val cboOff = s.conf.get("spark.sql.cbo.enabled", "false") != "true"
    val rows = rowsHint
      .orElse(if (cboOff) df.queryExecution.optimizedPlan.stats.rowCount
        .map(_.toLong) else None)
      .getOrElse(df.select(col(idCol)).count())
    // headOption, not head: a nonzero hint/stat over an actually-empty
    // frame must degrade to the empty single-tile pass, not throw
    val dim =
      if (rows == 0L) 0
      else df.select(org.apache.spark.sql.functions.size(col(embCol)))
        .head(1).headOption.map(_.getInt(0)).getOrElse(0)
    chooseExactKernel(rows, dim, tileBudgetBytes, maxBroadcastTiles) match {
      case BroadcastTiles(t) => cosinePairsTiled(s, df, idCol, embCol, threshold, t)
      case ShuffledTiles(t)  => cosinePairsShuffled(s, df, idCol, embCol, threshold, t)
    }
  }

  /** Deterministic sqrt-scaled IVF cell count: C = ceil(sqrt(n)). Scaling
    * the cell count with the corpus is what makes cell-pruned kernels
    * subquadratic — assignment costs n·C·d and within-cell scoring
    * n·(n/C)·d, both n^1.5·d when C ~ sqrt(n), vs the exact kernels'
    * n²·d. SQL-expressible (ceil(sqrt(count(*)))) so the DuckDB oracle
    * reproduces the exact same pruning.
    */
  def sqrtCells(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** Deterministic SEED centroids: the C lowest-id vectors, sorted by id
    * (the [[graft.ops.AnnIndex]] one-shot quantizer discipline). Also
    * iteration 0 of [[trainedCentroids]], which refines these with
    * Lloyd's on a fixed sample.
    */
  def centroids(s: SparkSession, df: DataFrame, idCol: String, embCol: String,
                c: Int): Array[Vec] =
    vectors(s, df.filter(col(idCol) <
      org.apache.spark.sql.functions.lit(c.toLong)), idCol, embCol).sortBy(_.id)

  /** K-MEANS-TRAINED cell centroids (r14): Lloyd's iterations over a
    * fixed deterministic sample (the `sampleFactor`·C lowest-id vectors
    * — FAISS-style points-per-cell sizing, so the sample grows with the
    * CELL count, sublinear in the corpus), initialized from
    * [[centroids]] (the C lowest-id vectors — iteration 0 of the same
    * convention the one-shot quantizer uses). Every arithmetic step is
    * chosen to be ENGINE-EXACT so the DuckDB oracle replays the trained
    * cells bit-for-bit:
    *  - assignment ranks by unrounded cosine (sequential double fold,
    *    ties to the lower cell id) — the [[AnnIndex.nearestCell]] /
    *    `row_number() ORDER BY cos DESC, cell` pair already pinned by
    *    the untrained oracles;
    *  - the centroid update is a FIXED-POINT INTEGER mean:
    *    `floor(v·1e6)` per coordinate summed as longs (order-independent,
    *    exact — a double mean would depend on Spark's partition-visit
    *    order and could diverge from DuckDB in the last ulp, flipping a
    *    knife-edge assignment), divided once in double and narrowed to
    *    float (IEEE round-to-nearest-even in both engines);
    *  - empty cells keep their previous centroid (the [[Sim.kmeans]]
    *    convention).
    * Driver/shuffle state per iteration is C×dim sum rows + the C×dim
    * broadcast — cells-sized, never corpus-sized; the sample scan is the
    * only data-sized work and it runs `iters` times over sampleFactor·C
    * rows. Returns float-embedded [[Vec]]s (cell id = the seed vector's
    * id), so every downstream kernel (assignment, probe ranking) is
    * unchanged.
    */
  /** Training-sample sizing and iteration count — referenced by BOTH the
    * Scala trainer and the SQL replay builder below, so the two sides
    * can never drift.
    */
  val TrainSampleFactor: Int = 16
  val TrainIters: Int = 2

  def trainedCentroids(s: SparkSession, df: DataFrame, idCol: String,
                       embCol: String, c: Int,
                       sampleFactor: Int = TrainSampleFactor,
                       iters: Int = TrainIters): Array[Vec] = {
    import s.implicits._
    var cents = centroids(s, df, idCol, embCol, c)
    if (cents.isEmpty) return cents
    val sample = df
      .filter(col(idCol) < org.apache.spark.sql.functions.lit(c.toLong * sampleFactor))
      .select(col(idCol), col(embCol)).as[(Long, Array[Float])]
    for (_ <- 0 until iters) {
      val bc = s.sparkContext.broadcast(cents)
      // (cell, dim) → (Σ floor(v·1e6), count): longs all the way, so the
      // shuffle's combine order cannot change a single bit
      val sums = sample.flatMap { case (id, emb) =>
        // the SQL replay counts every member at every dim up to the
        // table max — a ragged embedding would silently diverge the
        // fixed-point means between engines, so refuse loudly instead
        require(emb.length == bc.value(0).emb.length,
          s"ragged embedding: vec $id has dim ${emb.length}, " +
            s"centroids have ${bc.value(0).emb.length}")
        val cell = AnnIndex.nearestCell(emb, bc.value)
        emb.iterator.zipWithIndex.map { case (v, d) =>
          ((cell, d), (math.floor(v.toDouble * 1e6).toLong, 1L))
        }
      }.rdd.reduceByKey((x, y) => (x._1 + y._1, x._2 + y._2))
        .collect()
      bc.destroy()
      val byCell = sums.groupBy(_._1._1)
      cents = cents.map { prev =>
        byCell.get(prev.id) match {
          case None => prev // empty cell keeps its centroid
          case Some(rows) =>
            val dim = prev.emb.length
            val emb = new Array[Float](dim)
            rows.foreach { case ((_, d), (isum, cnt)) =>
              emb(d) = (isum.toDouble / (cnt.toDouble * 1e6)).toFloat
            }
            Vec(prev.id, emb, normD(emb))
        }
      }
    }
    cents
  }

  /** Rank of every (vector, centroid) pair by descending cosine then
    * centroid id — rank 1 is [[AnnIndex.nearestCell]]'s assignment, ranks
    * <= p are the multi-probe list. Raw-double compare, same sequential
    * fold as the oracle's list_sum, so the ranking is engine-identical.
    */
  private def probeCells(emb: Array[Float], n: Double, cents: Array[Vec],
                         p: Int): Array[Long] =
    cents.map(ct => (ct.id, dotD(emb, ct.emb) / (n * ct.norm)))
      .sortBy { case (id, c) => (-c, id) }.take(p).map(_._1)

  /** SemDeDup-style cell-pruned cosine pairs: vectors assign to their
    * nearest of ceil(sqrt(n)) K-MEANS-TRAINED centroids (r14:
    * [[trainedCentroids]] — Lloyd's on a fixed sample, engine-exact
    * arithmetic so the oracle replays the training), and ONLY same-cell
    * pairs score through the exact kernel (the published SemDeDup shape —
    * k-means cluster, then pairwise within the cluster). Compute is
    * n^1.5·d instead of n²·d; the shuffle carries n vector rows keyed by
    * cell; per-task memory is one cell (~sqrt(n) vectors). Emitted pairs
    * are exact cosines min-id-first — a deterministic SUBSET of the
    * exact kernel's pairs, reproduced verbatim by the DuckDB oracle.
    */
  def cellCosinePairs(s: SparkSession, df: DataFrame, idCol: String,
                      embCol: String, threshold: Double): DataFrame = {
    import s.implicits._
    val c = sqrtCells(df.count())
    val bc = s.sparkContext.broadcast(trainedCentroids(s, df, idCol, embCol, c))
    df.select(col(idCol), col(embCol)).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        (AnnIndex.nearestCell(emb, bc.value), id, emb, normD(emb))
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val vs = it.map { case (_, id, emb, n) => (id, emb, n) }
          .toArray.sortBy(_._1)
        for {
          i <- (0 until vs.length).iterator
          j <- (i + 1 until vs.length).iterator
          cos = round4(dotD(vs(i)._2, vs(j)._2) / (vs(i)._3 * vs(j)._3))
          if cos >= threshold
        } yield (vs(i)._1, vs(j)._1, cos)
      }.toDF("vec_a", "vec_b", "cos")
  }

  /** ANN-mined hard negatives: for each anchor, the top-scoring vector in
    * the cosine band [lo, hi) among the members of the anchor's `probes`
    * nearest cells (the DPR/ANCE mining shape — negatives come from an
    * ANN index probe, not an exact corpus sweep). Cells are k-means-
    * trained and assignment follows [[cellCosinePairs]]; anchors replicate to their probe cells (shuffle
    * = (probes+1)·n vector rows), each cell's members buffer once
    * (~sqrt(n) vectors) while its anchors stream through, and only the
    * per-cell top-1 survives to the final (n-row) global top-1. Fully
    * deterministic: band filter and ranking on HALF_UP-rounded cosines,
    * ties to the lower neg_id — the DuckDB oracle replays all of it.
    */
  def cellBandTop1(s: SparkSession, df: DataFrame, idCol: String,
                   embCol: String, lo: Double, hi: Double,
                   probes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    import s.implicits._
    val c = sqrtCells(df.count())
    val bc = s.sparkContext.broadcast(trainedCentroids(s, df, idCol, embCol, c))
    val base = df.select(col(idCol), col(embCol)).as[(Long, Array[Float])]
    val members = base.map { case (id, emb) =>
      (AnnIndex.nearestCell(emb, bc.value), id, emb, normD(emb))
    }
    val anchors = base.flatMap { case (id, emb) =>
      val n = normD(emb)
      probeCells(emb, n, bc.value, probes).iterator.map(cell => (cell, id, emb, n))
    }
    val partial = members.groupByKey(_._1).cogroup(anchors.groupByKey(_._1)) {
      (_, mIt, aIt) =>
        val ms = mIt.map { case (_, id, emb, n) => (id, emb, n) }.toArray
        aIt.flatMap { case (_, aid, aemb, an) =>
          var bestId = -1L
          var bestCos = Double.NegativeInfinity
          var i = 0
          while (i < ms.length) {
            val (mid, memb, mn) = ms(i)
            if (mid != aid) {
              val cos = round4(dotD(aemb, memb) / (an * mn))
              if (cos >= lo && cos < hi &&
                  (cos > bestCos || (cos == bestCos && mid < bestId))) {
                bestCos = cos; bestId = mid
              }
            }
            i += 1
          }
          if (bestId >= 0) Iterator.single((aid, bestId, bestCos)) else Iterator.empty
        }
    }.toDF("anchor", "neg_id", "cos")
    // global top-1 over the <= probes-per-anchor partials (rank-1 window,
    // auto-rewritten to the bounded-heap TopKPerKey operator)
    val w = Window.partitionBy(col("anchor")).orderBy(col("cos").desc, col("neg_id"))
    partial.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor"), col("neg_id"), col("cos").as("neg_cos"))
  }

  /** The trained-cells CTE chain for the DuckDB oracles (d8/d8b/pair2/
    * pair2b): replays [[trainedCentroids]] + the final assignment
    * bit-for-bit. Defines, over the `embeddings` table:
    * `e` (vectors + norms), `nc` (cell count), `dims`, `samp` (the
    * fixed training sample), `c0..c${TrainIters}` (centroid iterates —
    * float-narrowed fixed-point means, empty cells carried), `cents`
    * (the trained centroids), `rnk` (every vector's cells ranked by
    * unrounded cos, ties to the lower cell) and `asg` (rank 1). Exactness
    * argument: floor(v·1e6) is exact (float·1e6 fits a double's 53 bits),
    * BIGINT sums are order-independent, the one division runs in double
    * and narrows to REAL under the same IEEE round-to-nearest-even both
    * engines use, and every dot/norm is the sequential double fold the
    * untrained oracles already pinned.
    */
  val TrainedCellsSql: String = {
    def iteration(i: Int): String = {
      val prev = s"c${i - 1}" // c0 is the seed iterate
      s"""a$i AS (SELECT vec_id, cell FROM (
         |    SELECT s.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY
         |        list_sum(list_transform(range(1, len(s.embedding) + 1),
         |          i -> CAST(s.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE)))
         |          / (s.norm * c.norm) DESC, c.cell) AS rn
         |    FROM samp s CROSS JOIN $prev c) WHERE rn = 1),
         |m$i AS (SELECT a.cell, d.i AS dim,
         |    SUM(CAST(floor(CAST(s.embedding[d.i] AS DOUBLE) * 1000000) AS BIGINT)) AS isum,
         |    COUNT(*) AS cnt
         |  FROM a$i a JOIN samp s USING (vec_id) CROSS JOIN dims d
         |  GROUP BY 1, 2),
         |c$i AS (SELECT cell, cent,
         |    sqrt(list_sum(list_transform(cent, x -> CAST(x AS DOUBLE) * x))) AS norm
         |  FROM (SELECT c.cell, coalesce(m.cent, c.cent) AS cent
         |        FROM $prev c LEFT JOIN (
         |          SELECT cell,
         |            list(CAST(CAST(isum AS DOUBLE) / (cnt * 1000000.0) AS REAL)
         |                 ORDER BY dim) AS cent
         |          FROM m$i GROUP BY cell) m USING (cell)))""".stripMargin
    }
    val iterations = (1 to TrainIters).map(iteration).mkString(",\n")
    s"""e AS (SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
       |  FROM embeddings),
       |nc AS (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS c FROM e),
       |dims AS (SELECT unnest(range(1, (SELECT max(len(embedding)) FROM e) + 1)) AS i),
       |samp AS (SELECT e.* FROM e, nc WHERE e.vec_id < nc.c * $TrainSampleFactor),
       |c0 AS (SELECT e.vec_id AS cell, e.embedding AS cent, e.norm
       |       FROM e, nc WHERE e.vec_id < nc.c),
       |$iterations,
       |cents AS (SELECT cell, cent, norm FROM c$TrainIters),
       |rnk AS (
       |  SELECT v.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      list_sum(list_transform(range(1, len(v.embedding) + 1),
       |        i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.cent[i] AS DOUBLE)))
       |        / (v.norm * c.norm) DESC, c.cell) AS rn
       |  FROM e v CROSS JOIN cents c),
       |asg AS (SELECT vec_id, cell FROM rnk WHERE rn = 1)""".stripMargin
  }

  /** Cosine of every (query, base) pair, queries broadcast. */
  def scoreAgainst(s: SparkSession, df: DataFrame, idCol: String, embCol: String,
                   queries: Array[Vec]): DataFrame = {
    import s.implicits._
    val q = s.sparkContext.broadcast(queries)
    val base = df.select(col(idCol), col(embCol)).as[(Long, Array[Float])]
    base.mapPartitions { it =>
      val qs = q.value
      it.flatMap { case (id, emb) =>
        val n = normD(emb)
        qs.iterator
          .filter(_.id != id)
          .map(v => (v.id, id, round4(dotD(emb, v.emb) / (n * v.norm))))
      }
    }.toDF("q_id", "vec_id", "cos")
  }
}
