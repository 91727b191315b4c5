package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency sketching over Spark's built-in `count_min_sketch` aggregate
  * (a Catalyst TypedImperativeAggregate — partials merge map-side, the
  * shuffled state is the fixed-size sketch, never the keys).
  *
  * Complements the other sketch tiers in the catalog: HLL
  * (a3, distinct count), bitmap (a10, exact distinct), and this — per-key
  * FREQUENCY estimates with the classic CMS guarantee: estimates never
  * undercount, and overcount by at most eps·N with probability
  * ≥ confidence. At 100 TB that bounded-size property is the only way a
  * "how often does each of these keys occur" question avoids a full
  * key-carrying shuffle.
  */
object Sketches {

  /** One-pass count-min sketch of a column (long/int/string), collected to
    * the driver as a queryable object. Takes the column NAME (not an
    * arbitrary Column — the sketch aggregate is addressed through the SQL
    * registry, so a computed expression should be projected and aliased
    * first). eps bounds relative overcount; depth follows confidence.
    * Deterministic seed so runs agree.
    */
  def countMin(df: DataFrame, colName: String, eps: Double = 0.001,
               confidence: Double = 0.99): CountMinSketch = {
    val bytes = df.agg(
        expr(s"count_min_sketch(`$colName`, CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Heavy hitters: keys whose sketched frequency is ≥ `threshold`.
    * `candidates` supplies the key universe to probe (CMS cannot enumerate
    * keys — the standard pattern probes a candidate set, e.g. a sample or
    * a dimension table). Because CMS never undercounts, the result is a
    * SUPERSET of the true heavy hitters — callers needing exactness verify
    * the (small) survivor set with one filtered aggregation.
    */
  def heavyHitters(sketch: CountMinSketch, candidates: Seq[Long],
                   threshold: Long): Seq[(Long, Long)] =
    candidates.map(k => k -> sketch.estimateCount(Long.box(k)))
      .filter(_._2 >= threshold)
}
