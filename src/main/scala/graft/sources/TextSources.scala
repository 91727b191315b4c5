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

  /** Raw line-text: one string row per line (column `value`), path captured
    * alongside for provenance — the entry point for corpora that arrive as
    * plain .txt shards. No schema to supply: lines are the schema.
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    spark.read.text(path)
      .select(col("value"), input_file_name().as("src_file"))
  }

  /** ORC read with the same explicit-schema, no-inference stance as CSV /
    * JSON. ORC ships in Spark's core distribution (unlike Avro connectors)
    * and carries footer min/max stats like Parquet, so the zone-map
    * pruning story (SURVEY.md §4) holds for it unchanged.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC write, mirroring BlockWriter's bounded-file stance. */
  def writeOrc(df: DataFrame, path: String, maxRecordsPerFile: Int = 8192): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .orc(path)

  /** CSV write, bounded files, header on — the inverse of [[readCsv]].
    * Spark renders doubles via shortest-round-trip `toString` and quotes
    * fields containing the delimiter/quote, so a schema'd read-back is
    * value-exact for long/double and for strings WITH TWO CSV-INHERENT
    * CAVEATS: empty strings come back as NULL (CSV has no quoted-empty vs
    * absent distinction on Spark's reader), and embedded newlines need
    * `multiLine` on the read side. Whitespace-edged strings DO roundtrip —
    * the writer's default trim is disabled below so the bytes written are
    * the bytes stored.
    */
  def writeCsv(df: DataFrame, path: String, maxRecordsPerFile: Int = 8192): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .csv(path)

  /** JSON-lines write, bounded files — the inverse of [[readJsonLines]]. */
  def writeJsonLines(df: DataFrame, path: String, maxRecordsPerFile: Int = 8192): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
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
