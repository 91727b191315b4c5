package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join.
  *
  * AQE's skew-join split handles most runtime skew, but it only splits
  * *shuffle partitions*; a single pathological key (one user with 10⁸
  * events at 100 TB) still lands every row in one task's hash bucket.
  * Salting fixes the key itself: the skewed (large) side gets a random
  * salt in [0, n), the small side is replicated across all n salts, and
  * the join key becomes (key, salt) — spreading each hot key over n tasks.
  * Result is row-identical to the unsalted join (SkewSpec asserts it).
  *
  * Cost model: replicates the small side n×, so pick n ≈ (hot-key rows /
  * target rows-per-task) and keep the replicated side genuinely small.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `largeKey = smallKey`, salted n ways.
    * The salt on the large side is `pmod(xxhash64(rand-free row id), n)` —
    * deterministic given partitioning is irrelevant: any assignment works
    * because the small side carries every salt value.
    */
  def saltedJoin(large: DataFrame, largeKey: String,
                 small: DataFrame, smallKey: String,
                 numSalts: Int): DataFrame = {
    val salted = large.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(numSalts)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
        salted("_salt") === replicated("_salt") &&
        col(largeKey) === col(smallKey))
      .drop("_salt")
  }
}
