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
