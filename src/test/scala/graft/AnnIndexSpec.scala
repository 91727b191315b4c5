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

  test("live-table lifecycle: append / delete / upsert / compact never serve a dead vector") {
    import graft.ingest.Snapshots
    val table = tmpDir("graft_ann_live") + "/t"
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def liveFileCount: Int =
      Snapshots.liveFiles(table, Snapshots.versions(table).max).length
    def liveTop(probe: => DataFrame): Map[Long, Seq[Long]] =
      probe.select(col("q_id"), col("vec_id"), col("rank")).collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    def liveTruth(): Map[Long, Set[Long]] = {
      val live = Snapshots.read(spark, table)
      val qs = VecOps.vectors(spark,
        live.filter(col("vec_id") < Sim.NumQueries), "vec_id", "embedding")
      val scored = VecOps.scoreAgainst(spark, live, "vec_id", "embedding", qs)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= Sim.K)
        .select(col("q_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    def recallOf(got: Map[Long, Seq[Long]], floor: Double): Unit = {
      val truth = liveTruth()
      val recall = truth.keys.toSeq.map { q =>
        (got.getOrElse(q, Nil).toSet & truth(q)).size.toDouble / Sim.K
      }
      assert(recall.sum / recall.size >= floor,
        s"live recall ${recall.sum / recall.size} below $floor")
    }

    // 1. create: first updateTable = full build over the live file set
    Snapshots.commit(spark, all.filter(col("vec_id") < 400)
      .repartitionByRange(3, col("vec_id")), table)
    val files1 = liveFileCount
    assert(AnnIndex.updateTable(spark, table) === ((files1, 0)))
    val sc = AnnIndex.sidecar(table, "embedding")
    assert(AnnIndex.assignments(spark, sc).count() === 400L)
    val model0 = centroidSnapshot(sc)

    // 2. append: only the NEW files encode; the model never retrains
    Snapshots.commit(spark, all.filter(col("vec_id") >= 400)
      .repartitionByRange(2, col("vec_id")), table)
    val files2 = liveFileCount
    assert(AnnIndex.updateTable(spark, table) === ((files2 - files1, 0)))
    assert(AnnIndex.assignments(spark, sc).count() === 500L)
    assert(centroidSnapshot(sc) === model0)
    assert(AnnIndex.updateTable(spark, table) === ((0, 0)))

    // 3. delete the currently best-served neighbor: the index keeps the
    // row (metadata-only delete) but no probe may serve it again
    val sess = spark
    import sess.implicits._
    val before = liveTop(Sim.knnIvfLive(spark, table))
    val victim = before.values.flatten.find(_ >= Sim.NumQueries).get
    Snapshots.deleteByKeys(spark, table, Seq(victim).toDF("vec_id"))
    assert(AnnIndex.updateTable(spark, table) === ((0, 0)),
      "a row-level delete must not trigger an index rewrite")
    assert(AnnIndex.assignments(spark, sc).count() === 500L)
    val afterDel = liveTop(Sim.knnIvfLive(spark, table))
    assert(!afterDel.values.flatten.toSet.contains(victim),
      s"deleted vector $victim served by the IVF live probe")
    assert(afterDel.values.forall(_.size === Sim.K),
      "the k slots must refill with live rows, not shrink")
    val afterDelPq = liveTop(Sim.knnPqLive(spark, table))
    assert(!afterDelPq.values.flatten.toSet.contains(victim),
      s"deleted vector $victim served by the PQ live probe")
    recallOf(afterDel, 0.7)
    recallOf(afterDelPq, 0.6)

    // 4. upsert: replace a key's embedding with query 0's exact vector —
    // the OLD copy is eq-hidden (must not serve), the NEW copy lives in
    // a fresh file the update must index, and cos(q0, new) = 1.0 puts it
    // at rank 1 for q0
    val q0 = VecOps.vectors(spark,
      Snapshots.read(spark, table).filter(col("vec_id") === 0),
      "vec_id", "embedding").head
    val upsertId = 480L
    Snapshots.upsertByKeys(spark, table,
      Seq((upsertId, q0.emb)).toDF("vec_id", "embedding"), Seq("vec_id"))
    val files3 = liveFileCount
    assert(AnnIndex.updateTable(spark, table) === ((files3 - files2, 0)))
    val afterUp = liveTop(Sim.knnIvfLive(spark, table))
    assert(afterUp(0L).head === upsertId,
      s"upserted twin of q0 must serve at rank 1, got ${afterUp(0L)}")
    assert(liveTop(Sim.knnPqLive(spark, table))(0L).contains(upsertId))

    // 5. compact: deletes materialize away, dead files' assign rows drop,
    // the hidden frame empties, and probes still match the live truth
    Snapshots.compact(spark, table, numFiles = 2)
    val files4 = liveFileCount
    val (fresh4, dead4) = AnnIndex.updateTable(spark, table)
    assert(fresh4 === files4 && dead4 === files3,
      s"compaction must re-encode the outputs ($fresh4/$files4) and drop " +
        s"every retired input ($dead4/$files3)")
    val liveRows = Snapshots.read(spark, table).count()
    assert(AnnIndex.assignments(spark, sc).count() === liveRows)
    assert(Snapshots.hiddenRows(spark, table, Seq("vec_id")).count() === 0L)
    val afterCompact = liveTop(Sim.knnIvfLive(spark, table))
    assert(!afterCompact.values.flatten.toSet.contains(victim))
    assert(afterCompact(0L).head === upsertId)
    recallOf(afterCompact, 0.7)
  }

  test("filtered kNN widens probes under selective filters, never under-fills k") {
    val base = Sim.annDir(spark, sf)
    // exact filtered top-k ground truth over an arbitrary predicate
    def truth(pred: Long => Boolean): Map[Long, Seq[(Long, Double)]] = {
      val df = spark.read.parquet(base)
      val qs = VecOps.vectors(spark,
        df.filter(col("vec_id") < Sim.NumQueries), "vec_id", "embedding")
      val scored = VecOps.scoreAgainst(spark, df, "vec_id", "embedding", qs)
      scored.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (q, id, _) => pred(id) && id != q }
        .groupBy(_._1).view.mapValues(_.toSeq
          .sortBy { case (_, id, c) => (-c, id) }.take(Sim.K)
          .map { case (_, id, c) => (id, c) }).toMap
    }
    def run(pred: org.apache.spark.sql.Column) =
      Sim.knnIvfFilteredWithProbes(spark, base, pred, Sim.K)
    // PERMISSIVE filter: every query's two probed cells already hold
    // >= k eligible vectors, so nobody widens and every query fills k
    val (loose, looseProbes) = run(col("vec_id") % 2 === 0)
    val looseCounts = loose.collect().groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(looseCounts.values.forall(_ === Sim.K))
    assert(looseProbes.values.forall(_ === Sim.NumProbes),
      s"permissive filter must not widen: $looseProbes")
    // SELECTIVE filter leaving <= k eligible corpus-wide (ids 7, 108,
    // 209, 310, 411): a query stops widening only once its probed cells
    // hold every eligible vector, so the answer EQUALS the exact
    // filtered top-k — nothing eligible may hide in unprobed cells.
    // Query 7 (itself eligible-excluded) can never fill k and must
    // exhaust ALL cells rather than silently under-fill.
    val (tight, tightProbes) = run(col("vec_id") % 101 === 7)
    assert(tightProbes.values.forall(_ > Sim.NumProbes),
      s"selective filter must widen: $tightProbes")
    assert(tightProbes(7L) === Sim.NumCells,
      s"a query that cannot fill k must probe every cell: $tightProbes")
    val want = truth(_ % 101 == 7)
    val got = tight.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy { case (_, id, c) => (-c, id) }
        .map { case (_, id, c) => (id, c) }).toMap
    assert(got === want.filter(_._2.nonEmpty))
    // a filter matching NOTHING terminates (all cells probed) and
    // returns the schema-correct empty result
    val (none, noneProbes) = run(col("vec_id") === -1L)
    assert(none.count() === 0L)
    assert(noneProbes.values.forall(_ === Sim.NumCells))
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
