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
    }.toDF("block", "id_a", "emb_a", "norm_a")
    val bSide = base.flatMap { case (id, emb, n, u) =>
      (0 to u).map(i => (i * numTiles + u, id, emb, n))
    }.toDF("block", "id_b", "emb_b", "norm_b")
    aSide.join(bSide, "block")
      .select(col("id_a"), col("emb_a"), col("norm_a"),
        col("id_b"), col("emb_b"), col("norm_b"))
      .as[(Long, Array[Float], Double, Long, Array[Float], Double)]
      .mapPartitions { it =>
        it.flatMap { case (ia, ea, na, ib, eb, nb) =>
          if (ia >= ib && java.lang.Math.floorMod(ia, numTiles.toLong) ==
              java.lang.Math.floorMod(ib, numTiles.toLong)) Iterator.empty
          else {
            val c = round4(dotD(ea, eb) / (na * nb))
            if (c >= threshold)
              Iterator.single(if (ia < ib) (ia, ib, c) else (ib, ia, c))
            else Iterator.empty
          }
        }
      }.toDF("vec_a", "vec_b", "cos")
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
