package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

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
  * [[build]] returns a [[BloomFilter]] carrying its own (bits, numBits,
  * numHashes): the probe side consumes the same object, so build and probe
  * parameters CANNOT diverge (a mismatched probe would turn "false
  * positives are harmless" into silent false NEGATIVES — rows wrongly
  * dropped before the join).
  *
  * The membership test is a native codegen'd Catalyst [[BloomMightContain]]
  * expression, not a UDF: the probe stays inside whole-stage codegen (no
  * boxing, no interpreted call per row), which is what a filter sitting on
  * the 100 TB fact scan needs. The bitset rides the expression's reference
  * array inside the stage's task binary — which Spark itself ships via a
  * per-stage TorrentBroadcast — so it crosses the wire once per stage, not
  * once per task.
  *
  * The reference has no joins at all (SURVEY.md §2.2); this extends its
  * block-skipping idea (block.go:143-199 — prune before reading) to the
  * join input: prune before shuffling.
  */
object Bloom {

  /** Number of 64-bit words for a filter with `numBits` bits. */
  private def words(numBits: Int): Int = (numBits + 63) / 64

  /** A built filter: the dense bitset plus the exact parameters it was
    * built with. Probe via [[mightContain]] (or `filter.col(...)`).
    */
  final case class BloomFilter(bits: Array[Long], numBits: Int, numHashes: Int) {
    /** Membership-test Column over this filter — see [[mightContain]]. */
    def col(key: Column): Column = mightContain(this)(key)
  }

  /** Shared probe kernel: mirrors the build-side hashing exactly. Public
    * because the generated code calls it (the codegen target, like
    * [[FnvHash64.hash]]).
    */
  def test(bits: Array[Long], key: Long, numBits: Int, numHashes: Int): Boolean = {
    val h1 = scala.util.hashing.MurmurHash3.productHash(Tuple1(key)).toLong & 0x7fffffffL
    val h2 = (FnvHash64.hashLong(key) & 0x7fffffffffffffffL) | 1L
    var i = 0
    var all = true
    while (all && i < numHashes) {
      val bit = (((h1 + i * h2) & 0x7fffffffffffffffL) % numBits).toInt
      all = (bits(bit >>> 6) & (1L << (bit & 63))) != 0
      i += 1
    }
    all
  }

  /** Build-side kernel: set `key`'s k probe bits in `bits`. Mirrors
    * [[test]] exactly — shared by [[build]] and the per-file data-skipping
    * index ([[graft.ingest.BloomIndex]]), so a build/probe hash divergence
    * is structurally impossible.
    *
    * Double hashing (Kirsch–Mitzenmatcher): h_i = h1 + i*h2 gives k
    * independent-enough probes from two base hashes.
    */
  def add(bits: Array[Long], key: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.productHash(Tuple1(key)).toLong & 0x7fffffffL
    val h2 = (FnvHash64.hashLong(key) & 0x7fffffffffffffffL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = (((h1 + i * h2) & 0x7fffffffffffffffL) % numBits).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Number of 64-bit words backing a `numBits`-bit filter — sizing helper
    * for callers that allocate their own bitsets (the per-file index).
    */
  def numWords(numBits: Int): Int = words(numBits)

  /** Collect the distinct values of `keyDf`'s single Long column into a
    * driver-side Bloom bitset. One distributed aggregation pass: each
    * partition ORs its local bitset, the driver ORs the partials.
    *
    * Sizing: bits ≈ 10×n gives ~1% false positives with k=7 hashes; both
    * are caller-tunable and travel WITH the returned filter. The bitset is
    * dense Array[Long] — at the default 2^20 bits that is 128 KB
    * regardless of n.
    */
  def build(keyDf: DataFrame, keyCol: String,
            numBits: Int = 1 << 20, numHashes: Int = 7): BloomFilter = {
    val nWords = words(numBits)
    val bits = keyDf.select(col(keyCol).cast("long"))
      .na.drop()
      .rdd.mapPartitions { it =>
        val local = new Array[Long](nWords)
        it.foreach(r => add(local, r.getLong(0), numBits, numHashes))
        Iterator.single(local)
      }
      .reduce { (a, b) =>
        var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
      }
    BloomFilter(bits, numBits, numHashes)
  }

  /** Membership-test Column over a built filter: true iff every probe bit
    * is set; a NULL key tests false (it can never match an equi-join
    * anyway). Parameters come from the filter itself, never from caller
    * defaults.
    */
  def mightContain(filter: BloomFilter): Column => Column =
    c => org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(c.cast("long")),
        filter.bits, filter.numBits, filter.numHashes))
}

/** Codegen'd Bloom-membership probe. Lives inside whole-stage codegen —
  * the per-row cost is the two base hashes plus k bit tests, with the
  * bitset fetched once per stage from the expression's reference array.
  * Never null: a NULL key yields false (drop), matching equi-join
  * semantics for NULL keys.
  */
case class BloomMightContain(child: Expression, bits: Array[Long],
                             numBits: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else Bloom.test(bits, v.asInstanceOf[Long], numBits, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bitsRef = ctx.addReferenceObj("graftBloomBits", bits, "long[]")
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.Bloom.test(
            $bitsRef, ${childGen.value}, $numBits, $numHashes);
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
