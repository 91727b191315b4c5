package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Driver-built Bloom filter for runtime semi-join pushdown.
  *
  * The 100 TB pattern: a selective dimension predicate should prune the
  * fact-side SCAN, not just the join — shuffling 100 TB of fact rows to
  * discard 99% of them at the join is the canonical scale failure. The
  * classic fix (the same idea behind Catalyst's InjectRuntimeFilter rule)
  * is: aggregate the filtered dimension keys into a Bloom filter (one pass,
  * tiny result), ship it to every fact task, and drop non-matching rows
  * map-side before the shuffle. False positives are harmless — the join
  * that follows removes them — so the result is EXACTLY the plain join's,
  * which is what the DuckDB oracle checks.
  *
  * We build the filter with plain codegen'd expressions (xxhash64 + two
  * derived hashes, bit-positions via aggregate over a sequence) rather than
  * a UDF, and represent it as an Array[Long] bitset small enough to embed
  * as a literal in the fact-side filter expression (a 1M-bit filter ≈
  * 125 KB — broadcast-sized, like any dimension hash table).
  *
  * The reference has no joins at all (SURVEY.md §2.2); this extends its
  * block-skipping idea (block.go:143-199 — prune before reading) to the
  * join input: prune before shuffling.
  */
object Bloom {

  /** Number of 64-bit words for a filter with `numBits` bits. */
  private def words(numBits: Int): Int = (numBits + 63) / 64

  /** Collect the distinct values of `keyDf`'s single Long column into a
    * driver-side Bloom bitset. One distributed aggregation pass: each
    * partition ORs its local bitset, the driver ORs the partials.
    *
    * Sizing: bits ≈ 10×n gives ~1% false positives with k=7 hashes; both
    * are caller-tunable. The bitset is dense Array[Long] — at the default
    * 2^20 bits that is 128 KB regardless of n.
    */
  def build(keyDf: DataFrame, keyCol: String,
            numBits: Int = 1 << 20, numHashes: Int = 7): Array[Long] = {
    val nWords = words(numBits)
    val rows = keyDf.select(col(keyCol).cast("long"))
      .na.drop()
      .rdd.mapPartitions { it =>
        val bits = new Array[Long](nWords)
        it.foreach { r =>
          val key = r.getLong(0)
          var i = 0
          // Double hashing (Kirsch–Mitzenmatcher): h_i = h1 + i*h2 gives k
          // independent-enough probes from two base hashes.
          val h1 = scala.util.hashing.MurmurHash3.productHash(Tuple1(key)).toLong & 0x7fffffffL
          val h2 = (FnvHash64.hashLong(key) & 0x7fffffffffffffffL) | 1L
          while (i < numHashes) {
            val bit = (((h1 + i * h2) & 0x7fffffffffffffffL) % numBits).toInt
            bits(bit >>> 6) |= (1L << (bit & 63))
            i += 1
          }
        }
        Iterator.single(bits)
      }
      .reduce { (a, b) =>
        var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
      }
    rows
  }

  /** Membership-test Column over the driver-built bitset: true if every
    * probe bit is set. Mirrors `build`'s hashing exactly. The bitset rides
    * a TorrentBroadcast — a closure-captured array would instead be
    * serialized into EVERY task binary (128 KB × tasks of network and
    * driver-serialization work per stage at scale).
    */
  def mightContain(spark: org.apache.spark.sql.SparkSession, bits: Array[Long],
                   numBits: Int = 1 << 20, numHashes: Int = 7): Column => Column = {
    val bc = spark.sparkContext.broadcast(bits)
    val test = udf { (key: java.lang.Long) =>
      if (key == null) false
      else {
        val b = bc.value
        val h1 = scala.util.hashing.MurmurHash3.productHash(Tuple1(key.longValue)).toLong & 0x7fffffffL
        val h2 = (FnvHash64.hashLong(key.longValue) & 0x7fffffffffffffffL) | 1L
        var i = 0
        var all = true
        while (all && i < numHashes) {
          val bit = (((h1 + i * h2) & 0x7fffffffffffffffL) % numBits).toInt
          all = (b(bit >>> 6) & (1L << (bit & 63))) != 0
          i += 1
        }
        all
      }
    }
    c => test(c)
  }
}
