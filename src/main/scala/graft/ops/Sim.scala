package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-d float vectors). Absent from the reference (SURVEY.md §2.2).
  *
  * Three tiers, trading recall for scan cost:
  *  - v1 brute force: broadcast the query set, score every base vector,
  *    top-k per query via window — exact, cost O(|base|·|queries|), the
  *    right plan when queries are few (the common batch-scoring shape);
  *  - v2 random-hyperplane LSH: 16-bit signs signature, candidates must
  *    share one of 4 pigeonhole bands — cost collapses to matching buckets;
  *  - v3 IVF: coarse quantizer of K deterministic centroids, probe the
  *    nearest 2 cells — the FAISS-style scale path where only ~2/K of the
  *    base set is scanned per query.
  * v2/v3 are approximate → no SQL oracle; SimSpec measures recall against
  * v1 instead. v1 is DuckDB-oracle-checked.
  */
object Sim {

  val K = 5
  val NumQueries = 8 // query set = vec_id < 8

  /** Sequential-fold double dot product — same arithmetic order as the
    * DuckDB oracle's list_sum(list_transform(...)) so values match exactly.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, p) => acc + p)

  def norm(v: Column): Column = sqrt(dot(v, v))

  private def base(s: SparkSession, d: String): DataFrame =
    Tables.table(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    base(s, d).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))

  private def topK(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** Exact top-k: broadcast queries, score via the blocked VecOps kernel
    * (tight JVM loop — the interpreted zip_with formulation measured 6 s
    * for 16k pairs at sf0.1), then per-query window top-k.
    */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    val tbl = Tables.table(s, d, "embeddings")
    val qs = VecOps.vectors(s, tbl.filter(col("vec_id") < NumQueries), "vec_id", "embedding")
    topK(VecOps.scoreAgainst(s, tbl, "vec_id", "embedding", qs))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 of the pair, folded to ±[0,1). Public splitmix-style trick —
    * no RNG state, so executors agree without broadcasting planes.
    */
  private def planeComponent(plane: Int, dim: Column): Column = {
    val h = xxhash64(lit(plane.toLong) * 131071L + dim)
    (pmod(h, lit(2000001L)) - 1000000L).cast("double") / 1000000.0
  }

  /** 16-bit random-hyperplane signature of a vector column. */
  def rhpSignature(v: Column, numPlanes: Int = 16): Column =
    (0 until numPlanes).map { p =>
      val proj = aggregate(zip_with(v, sequence(lit(0), lit(63)),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0d), (acc, t) => acc + t)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** LSH ANN: candidates share ≥1 of 8 2-bit signature bands. At the
    * target similarity (cos ≈ 0.4 ⇒ per-plane agreement ≈ 0.63) this gives
    * recall ≈ 1-(1-0.63²)^8 ≈ 0.98; wider bands collapse the candidate set
    * harder but recall drops fast (4-bit bands measured 0.52 on testdata).
    */
  def knnLsh(s: SparkSession, d: String): DataFrame = {
    def banded(df: DataFrame, idCol: String, sigIn: Column): DataFrame =
      df.withColumn("sig", sigIn)
        .select(col("*"), explode(array((0 until 8).map(bnd =>
          struct(lit(bnd).as("band"),
            shiftright(col("sig"), bnd * 2).bitwiseAND(0x3L).as("chunk"))): _*)).as("bk"))
        .select(col(idCol), col("bk.band"), col("bk.chunk"))
    val b = base(s, d).withColumn("sig", rhpSignature(col("embedding")))
    val q = queriesDf(s, d).withColumn("sig", rhpSignature(col("q_emb")))
    val bB = banded(b, "vec_id", col("sig"))
    val bQ = banded(q, "q_id", col("sig"))
    val cands = bQ.join(bB, Seq("band", "chunk"))
      .select(col("q_id"), col("vec_id")).dropDuplicates("q_id", "vec_id")
      .filter(col("q_id") =!= col("vec_id"))
    val scored = cands
      .join(b.select(col("vec_id"), col("embedding"), col("nrm")), "vec_id")
      .join(broadcast(q.select(col("q_id"), col("q_emb"), col("q_nrm"))), "q_id")
      .withColumn("cos", round(dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")), 4))
    topK(scored)
  }

  val NumCells = 16
  val NumProbes = 2

  /** IVF ANN: coarse centroids = the first NumCells base vectors (a
    * deterministic seed choice; production swaps in k-means iterates —
    * same plan shape). Every base vector is assigned to its nearest
    * centroid once (a broadcast join), queries probe their NumProbes
    * nearest cells, and only those cells are scanned.
    */
  def knnIvf(s: SparkSession, d: String): DataFrame = {
    val cent = base(s, d).filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    def nearestCells(df: DataFrame, vec: Column, vnrm: Column, n: Int, idCol: String): DataFrame = {
      val w = Window.partitionBy(col(idCol)).orderBy(col("c_cos").desc, col("cell"))
      df.crossJoin(broadcast(cent))
        .withColumn("c_cos", dot(vec, col("c_emb")) / (vnrm * col("c_nrm")))
        .withColumn("c_rank", row_number().over(w))
        .filter(col("c_rank") <= n)
    }
    val assigned = nearestCells(base(s, d), col("embedding"), col("nrm"), 1, "vec_id")
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell"))
    val probes = nearestCells(queriesDf(s, d), col("q_emb"), col("q_nrm"), NumProbes, "q_id")
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cell"))
    val scored = probes.join(assigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", round(dot(col("embedding"), col("q_emb")) / (col("nrm") * col("q_nrm")), 4))
    topK(scored)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_knn_brute" -> { (s, d) => knnBrute(s, d) },
    "v2_knn_lsh" -> { (s, d) => knnLsh(s, d) },
    "v3_knn_ivf" -> { (s, d) => knnIvf(s, d) }
  )

  val oracleSql: Map[String, String] = Map(
    "v1_knn_brute" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS q_id, b.vec_id AS vec_id,
        |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (q.nrm * b.nrm), 4) AS cos
        |  FROM e q JOIN e b ON q.vec_id < 8 AND b.vec_id <> q.vec_id)
        |SELECT q_id, vec_id, cos, rank FROM (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored) t
        |WHERE rank <= 5""".stripMargin
    // v2/v3: approximate — recall measured against v1 in SimSpec, no oracle.
  )
}
