package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** The certification harness's output-schema contract, enforced at
  * registration time instead of discovered at certification time.
  *
  * The driver's comparator loads each query's parquet dump into pandas and
  * sorts the frame by every column before hashing. A top-level
  * array/map/struct column arrives as a numpy.ndarray / dict cell —
  * unhashable and unsortable — so the comparison ERRORS rather than
  * failing cleanly (round 14's `seq1_user_sequences` burned exactly this
  * way: `TypeError: unhashable type: 'numpy.ndarray'`). The local
  * `scripts/oracle_check.py` mirror canonicalizes cells via `repr` and
  * masks the gap, which is why the guard must live in the build, not in
  * the local checker.
  *
  * Contract: every registered query's output schema is scalar-only at the
  * top level. A query whose natural result is a sequence/struct serializes
  * it first — `array_join`/`concat_ws` for arrays of strings, `to_json`
  * for anything nested — and mirrors the same serialization in its DuckDB
  * oracle (`array_to_string`, `to_json`). PlanAuditSpec enforces this over
  * the whole registry; Verify refuses to dump a violating result so a slip
  * shows up as a LOUD missing-dump failure, never a comparator crash.
  */
object ComparatorContract {

  private def isComplex(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  /** Names (with type) of top-level columns the comparator cannot sort. */
  def complexColumns(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case StructField(name, dt, _, _) if isComplex(dt) =>
        s"$name: ${dt.simpleString}"
    }
}
