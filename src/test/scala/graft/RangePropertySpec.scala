package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ingest.BlockWriter
import graft.query.RangeQuery

/** The zone-map soundness property promised in SURVEY.md §5: for generated
  * keyed rows, ingest→range-query ≡ in-memory filter for arbitrary ranges —
  * pruning never drops a qualifying row, bounds stay inclusive at both
  * ends, and empty/inverted/degenerate ranges behave.
  */
class RangePropertySpec extends SparkSuite {

  /** Drive a ScalaCheck Gen deterministically (no scalatestplus bridge in
    * the offline cache): one sample per seed.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // One seeded random dataset, ingested once; properties range over queries.
  private val rnd = new scala.util.Random(42)
  private val rows: Seq[(Long, Long, Double)] =
    Seq.fill(2000)((rnd.nextInt(37).toLong, rnd.nextInt(100000).toLong, rnd.nextDouble()))

  private lazy val base: String = {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    val df = rows.toDF("user_id", "ts_us", "value")
    val dir = tmpDir("graft_prop_ingest")
    BlockWriter.write(df, dir, "user_id", "ts_us", numBuckets = 8, maxRecordsPerFile = 128)
    dir
  }

  private val genCase = for {
    pk <- Gen.chooseNum(-2L, 40L) // includes keys with no data
    a <- Gen.chooseNum(-1000L, 101000L)
    b <- Gen.chooseNum(-1000L, 101000L)
  } yield (pk, a, b)

  test("ingest→query ≡ in-memory filter for arbitrary (pk, range)") {
    samples(genCase, 25).foreach { case (pk, a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val expected = rows.count(r => r._1 == pk && r._2 >= lo && r._2 <= hi)
      val got = RangeQuery.query(spark, base, "user_id", "ts_us",
        lit(pk), lit(lo), lit(hi), numBuckets = 8).count()
      assert(got === expected, s"pk=$pk range=[$lo,$hi]")
    }
  }

  test("inverted ranges are empty for any pk") {
    samples(Gen.chooseNum(0L, 36L), 8).foreach { pk =>
      assert(RangeQuery.query(spark, base, "user_id", "ts_us",
        lit(pk), lit(50000L), lit(49999L), numBuckets = 8).count() === 0L)
    }
  }
}
