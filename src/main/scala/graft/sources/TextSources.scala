package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema'd text-format sources/sinks (CSV, JSON lines) and the binary-file
  * source for media payloads.
  *
  * Stance carried over from the reference: the schema is FIXED and EXTERNAL
  * (an Avro codec supplied at construction — /root/reference/block.go:17,
  * fixtures.go:10-32). These readers therefore always take an explicit
  * `StructType` and never infer: inference is a second full pass over the
  * data at 100 TB, and a schema that drifts with the data is how silent
  * corruption enters a pipeline.
  */
object TextSources {

  /** CSV with explicit schema; malformed rows land in a quarantine column
    * instead of failing the job (PERMISSIVE + columnNameOfCorruptRecord) —
    * the lenient half of the reference's skip-what-doesn't-parse behavior,
    * made auditable.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines with explicit schema — same no-inference stance. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** Whole files as rows: (path, modificationTime, length, content binary)
    * — the on-disk entry point for the Multimodal pipeline (images/audio
    * land as `content` payloads with path-derived metadata). Push a glob
    * via `pathGlobFilter` so non-media files never enter the scan.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
}
