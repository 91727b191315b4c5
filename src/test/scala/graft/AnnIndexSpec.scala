package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, Sim, VecOps}

/** The persisted ANN index ([[graft.ops.AnnIndex]]): build-once /
  * serve-many equivalence with the train-per-call tiers, incremental
  * maintenance proportional to appended data, and recall preservation
  * across appends.
  */
class AnnIndexSpec extends SparkSuite {

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("q_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("indexed IVF and PQ coincide with the train-per-call forms") {
    val base = Sim.annDir(spark, sf)
    // IVF: cell assignment was precomputed at build time with the same
    // centroids and tie-breaks → candidate set and exact scores identical
    assert(rows(Sim.knnIvfIndexed(spark, base)) === rows(Sim.knnIvf(spark, sf)))
    // PQ: same codebooks → same codes → same ADC candidates and re-rank
    assert(rows(Sim.knnPqIndexed(spark, base)) === rows(Sim.knnPq(spark, sf)))
    // the sidecar is underscore-hidden: a data scan of the base sees only
    // the embeddings
    assert(spark.read.parquet(base).columns.toSet === Set("vec_id", "embedding"))
  }

  /** Exact top-K neighbor ids per query over an arbitrary base — the
    * ground truth the incremental-recall case measures against.
    */
  private def bruteTop(base: String): Map[Long, Set[Long]] = {
    val df = spark.read.parquet(base)
    val qs = VecOps.vectors(spark,
      df.filter(col("vec_id") < Sim.NumQueries), "vec_id", "embedding")
    val scored = VecOps.scoreAgainst(spark, df, "vec_id", "embedding", qs)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("r", row_number().over(w)).filter(col("r") <= Sim.K)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def centroidSnapshot(sc: String): Seq[(Long, Seq[Float])] =
    AnnIndex.loadModel(spark, sc).cents.toSeq.map(v => (v.id, v.emb.toSeq))

  test("update indexes only appended files, keeps the model, keeps recall") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_ann_incr") + "/emb"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // initial corpus: vec_ids 0..399 in 3 files
    all.filter(col("vec_id") < 400).repartitionByRange(3, col("vec_id"))
      .write.parquet(base)
    val sc = AnnIndex.buildAt(spark, base)
    val n0 = AnnIndex.assignments(spark, sc).count()
    assert(n0 === 400L)
    val model0 = centroidSnapshot(sc)
    // a no-op update touches nothing
    assert(AnnIndex.update(spark, base) === 0)
    // append the remaining 100 vectors as 2 NEW files
    all.filter(col("vec_id") >= 400).repartitionByRange(2, col("vec_id"))
      .write.mode("append").parquet(base)
    val filesNow = spark.read.parquet(base).inputFiles.length
    // exactly the appended files get encoded — never the covered ones
    assert(AnnIndex.update(spark, base) === filesNow - 3)
    assert(AnnIndex.assignments(spark, sc).count() === 500L)
    // pre-append rows carried verbatim; new rows attributed to new files
    val perFile = AnnIndex.assignments(spark, sc).groupBy(col("file")).count()
    assert(perFile.count() === filesNow.toLong)
    // the persisted model did NOT retrain (codes stay comparable)
    assert(centroidSnapshot(sc) === model0)
    // a second update is a no-op again
    assert(AnnIndex.update(spark, base) === 0)
    // recall over the GROWN corpus still clears the IVF floor
    val truth = bruteTop(base)
    val got = Sim.knnIvfIndexed(spark, base)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = truth.keys.toSeq.map { q =>
      (got.getOrElse(q, Set.empty) & truth(q)).size.toDouble / Sim.K
    }
    assert(recall.sum / recall.size >= 0.7,
      s"aggregate IVF recall after append ${recall.sum / recall.size}")
    // and the PQ path (exact re-rank over ADC survivors) stays near-exact
    val gotPq = Sim.knnPqIndexed(spark, base)
      .select(col("q_id"), col("vec_id")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recallPq = truth.keys.toSeq.map { q =>
      (gotPq.getOrElse(q, Set.empty) & truth(q)).size.toDouble / Sim.K
    }
    assert(recallPq.sum / recallPq.size >= 0.6,
      s"aggregate PQ recall after append ${recallPq.sum / recallPq.size}")
  }

  test("a torn sidecar rebuilds loudly instead of serving partial answers") {
    val sess = spark
    import sess.implicits._
    val base = tmpDir("graft_ann_torn") + "/emb"
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 100).coalesce(1).write.parquet(base)
    val sc = AnnIndex.ensure(spark, base)
    val before = rows(Sim.knnIvfIndexed(spark, base))
    // simulate a crash mid-update: marker gone, assign dir gone
    val fs = new org.apache.hadoop.fs.Path(sc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sc, AnnIndex.Marker), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sc/assign"), true)
    // the next probe rebuilds and serves the same answers
    assert(rows(Sim.knnIvfIndexed(spark, base)) === before)
    assert(fs.exists(new org.apache.hadoop.fs.Path(sc, AnnIndex.Marker)))
  }
}
