package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two order-preserving
  * 32-bit normalized keys so that sorting by the combined value gives
  * locality in BOTH dimensions — every output file's (minA,maxA,minB,maxB)
  * box is tight, and Parquet footer stats can skip files for 2-dimensional
  * range predicates, not just the primary sort key.
  *
  * The reference's zone maps (filename min/max, /root/reference/
  * block.go:109-115) are one-dimensional — its layout can only skip on
  * KeyColumn. Z-ordering is the standard lakehouse upgrade when queries
  * constrain two dimensions (entity AND time, or time AND attribute) and
  * is a pure layout choice: same files, same reader, same query plans —
  * only the sort key changes.
  *
  * All bit-spreading is plain shift/and/or column arithmetic — fully
  * codegen'd, no lambdas (see Dedup/VecOps for why that matters).
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to even bit positions (classic
    * magic-mask sequence).
    */
  def spreadBits(x: Column): Column = {
    val m0 = lit(0x00000000FFFFFFFFL)
    val a = x.bitwiseAND(m0)
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton code of two 32-bit values (a in even bits, b in odd bits). */
  def zValue(a32: Column, b32: Column): Column =
    spreadBits(a32).bitwiseOR(shiftleft(spreadBits(b32), 1))

  /** Spread the low 21 bits of `x` to every THIRD bit position (the 3-D
    * magic-mask sequence) — 3 × 21 = 63 bits fills a long.
    */
  def spreadBits3(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x1FFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 32)).bitwiseAND(lit(0x001F00000000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 16)).bitwiseAND(lit(0x001F0000FF0000FFL))
    val d = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val e = d.bitwiseOR(shiftleft(d, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Spread the low 15 bits of `x` to every FOURTH bit position (the 4-D
    * magic-mask sequence) — 4 × 15 = 60 bits of a long.
    */
  def spreadBits4(x: Column): Column = {
    val a = x.bitwiseAND(lit(0x7FFFL))
    val b = a.bitwiseOR(shiftleft(a, 24)).bitwiseAND(lit(0x000000FF000000FFL))
    val c = b.bitwiseOR(shiftleft(b, 12)).bitwiseAND(lit(0x000F000F000F000FL))
    val d = c.bitwiseOR(shiftleft(c, 6)).bitwiseAND(lit(0x0303030303030303L))
    d.bitwiseOR(shiftleft(d, 3)).bitwiseAND(lit(0x1111111111111111L))
  }

  /** The widest arity with a magic-mask spread; beyond it the per-bit
    * interleave's expression tree grows linearly with arity while
    * per-dimension resolution shrinks below 13 bits — at that point a
    * multi-column sort key expresses the layout better than a space-
    * filling curve, so zValueN refuses rather than degrades.
    */
  val MaxDims = 4

  /** Bits per dimension at arity `n`: the widest equal split of a long's
    * 63 usable bits (32 for the classic 2-D path, 21 for 3-D, 15 for
    * 4-D).
    */
  def bitsPerDim(n: Int): Int = if (n == 2) 32 else 63 / n

  /** Morton code of N normalized keys, each [[bitsPerDim]] bits wide —
    * dimension d occupies bit positions i*N + d. Every supported arity
    * (2–4) uses a magic-mask spread: 4–6 shift/mask ops per key, fully
    * codegen'd, constant-size expression trees.
    */
  def zValueN(keys: Seq[Column]): Column = keys match {
    case Seq(a, b) => zValue(a, b)
    case Seq(a, b, c) =>
      spreadBits3(a)
        .bitwiseOR(shiftleft(spreadBits3(b), 1))
        .bitwiseOR(shiftleft(spreadBits3(c), 2))
    case Seq(a, b, c, d) =>
      spreadBits4(a)
        .bitwiseOR(shiftleft(spreadBits4(b), 1))
        .bitwiseOR(shiftleft(spreadBits4(c), 2))
        .bitwiseOR(shiftleft(spreadBits4(d), 3))
    case ks => throw new IllegalArgumentException(
      s"z-order supports 2 to $MaxDims keys, got ${ks.size}: beyond " +
        s"$MaxDims dimensions per-dimension resolution drops below " +
        "13 bits and a plain multi-column sort clusters better")
  }

  /** Order-preserving normalization of a numeric column to [0, 2^bits),
    * clamped at both ends: bounds are collected as truncated longs, so a
    * fractional value epsilon past the max must saturate rather than
    * carry into a neighboring dimension's bit positions.
    */
  def normalizeBits(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val top = (1L << bits) - 1
    when(mx > mn,
      least(greatest(
        ((v.cast("double") - mn.cast("double")) / (mx.cast("double") - mn.cast("double"))
          * top.toDouble).cast("long"), lit(0L)), lit(top)))
      .otherwise(lit(0L))
  }

  /** Order-preserving normalization of a numeric column to [0, 2^32). */
  def normalize32(v: Column, mn: Column, mx: Column): Column =
    normalizeBits(v, mn, mx, 32)

  /** Write `df` sorted by the Morton code of (colA, colB), files capped at
    * `maxRecordsPerFile` rows. Normalization bounds are computed in one
    * pre-pass aggregation (batch layout jobs can afford the extra scan).
    */
  /** `df` range-partitioned and sorted by the Morton code of (colA,
    * colB) — the reusable layout step behind [[writeZOrdered]] and
    * z-ordered snapshot compaction. Normalization bounds are computed in
    * one pre-pass aggregation (batch layout jobs can afford the extra
    * scan).
    */
  def layout(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame =
    layoutN(df, Seq(colA, colB), numFiles)

  /** N-dimensional generalization: range-partition + sort by the Morton
    * code of `cols` (each normalized to [[bitsPerDim]] bits). One bounds
    * aggregation pre-pass over all N columns — same single extra scan as
    * the 2-D path regardless of arity. Event tables commonly constrain
    * THREE dimensions (entity, time, attribute); at N=3 each keeps 21
    * bits ≈ 2M distinct buckets of resolution, far beyond file-count
    * granularity.
    */
  def layoutN(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.size >= 2, s"z-order needs at least 2 columns, got ${cols.mkString(",")}")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val bounds = cols.indices.map(i => (b.getLong(2 * i), b.getLong(2 * i + 1)))
    val bits = bitsPerDim(cols.size)
    val keys = cols.zip(bounds).map { case (c, (mn, mx)) =>
      normalizeBits(col(c), lit(mn), lit(mx), bits)
    }
    df.withColumn("_z", zValueN(keys))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Write `df` sorted by the Morton code of (colA, colB), files capped at
    * `maxRecordsPerFile` rows.
    */
  def writeZOrdered(df: DataFrame, base: String, colA: String, colB: String,
                    numFiles: Int = 32,
                    maxRecordsPerFile: Long = BlockWriter.DefaultMaxRecordsPerFile): Unit = {
    layout(df, colA, colB, numFiles)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(base)
  }

  // ----- Hilbert curve (2-D)

  /** Hilbert index of a 2-D cell — the standard iterative xy2d form
    * (rotate/reflect per level, public-domain algorithm). Hilbert beats
    * Morton on locality: consecutive indices are ALWAYS adjacent cells
    * (no quadrant jumps), so range-partitioned files cover tighter
    * (minA,maxA,minB,maxB) boxes on average. The loop carries rotation
    * state, which has no compact Column-arithmetic form — so the curve
    * runs as a plain JVM function inside a layout-time UDF: a layout job
    * pays it once per row at REWRITE time; no query plan ever contains
    * it (reads prune on footer stats exactly as with Morton).
    */
  def hilbertIndex(order: Int, x0: Long, y0: Long): Long = {
    var (x, y) = (x0, y0)
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the quadrant so the sub-curve orients correctly
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse of [[hilbertIndex]] (d2xy) — test/introspection surface for
    * the adjacency property that defines the curve.
    */
  def hilbertCell(order: Int, d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var d = d0
    var s = 1L
    while (s < (1L << order)) {
      val rx = 1L & (d / 2)
      val ry = 1L & (d ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      x += s * rx
      y += s * ry
      d /= 4
      s <<= 1
    }
    (x, y)
  }

  /** `df` range-partitioned and sorted by the HILBERT index of (colA,
    * colB) — same contract as [[layout]], better worst-case locality.
    * 21-bit keys per dimension (42-bit index), same one-pass bounds
    * normalization.
    */
  def layoutHilbert(df: DataFrame, colA: String, colB: String,
                    numFiles: Int): DataFrame = {
    val b = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (aMn, aMx, bMn, bMx) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val order = 21
    val h = udf((x: Long, y: Long) => hilbertIndex(order, x, y))
    df.withColumn("_h", h(
        normalizeBits(col(colA), lit(aMn), lit(aMx), order),
        normalizeBits(col(colB), lit(bMn), lit(bMx), order)))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }
}
