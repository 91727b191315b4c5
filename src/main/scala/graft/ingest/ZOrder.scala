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

  /** Order-preserving normalization of a numeric column to [0, 2^32). */
  def normalize32(v: Column, mn: Column, mx: Column): Column =
    when(mx > mn,
      ((v.cast("double") - mn.cast("double")) / (mx.cast("double") - mn.cast("double"))
        * 4294967295.0).cast("long"))
      .otherwise(lit(0L))

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
  def layout(df: DataFrame, colA: String, colB: String, numFiles: Int): DataFrame = {
    val b = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (aMn, aMx, bMn, bMx) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    df.withColumn("_z", zValue(
        normalize32(col(colA), lit(aMn), lit(aMx)),
        normalize32(col(colB), lit(bMn), lit(bMx))))
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
}
