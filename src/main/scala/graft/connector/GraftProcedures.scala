package graft.connector

import graft.ingest.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the table-maintenance surface —
  * `CALL graft.system.compact(table => 'sales.orders', num_files => 4)` —
  * the same catalog-procedure shape Iceberg ships, over graft's snapshot
  * ops. Every op here already exists on the Scala API; the procedures
  * make the MAINTENANCE lifecycle (compaction, retention, refs, rollback,
  * orphan sweep) reachable from a pure-SQL deployment, which at 100 TB is
  * usually an orchestrated SQL job, not a Scala program.
  *
  * Each call returns a one-row result (new version / counts) as a
  * [[LocalScan]] — Spark's analyzer requires procedure results to be
  * driver-local rows, which maintenance summaries are.
  */
private[connector] class GraftProcedures(resolve: String => String,
                                         resolveNew: String => String) {

  import ProcedureParameter.in

  private def spark = SparkSession.active

  private def out(fields: (String, org.apache.spark.sql.types.DataType)*) =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  private abstract class Proc(procName: String, desc: String,
                              ps: Seq[ProcedureParameter], outSchema: StructType)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = ps.toArray
    override def isDeterministic: Boolean = false

    /** Computed result row; strings must already be UTF8String. */
    protected def exec(args: InternalRow): Seq[Any]

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val row = InternalRow.fromSeq(exec(input))
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = outSchema
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString
  private def table(r: InternalRow, i: Int = 0): String = resolve(str(r, i))
  /** Resolve a name whose directory may not exist yet (a view table the
    * first refresh creates). */
  private def tableOrNew(name: String): String = resolveNew(name)
  private val tableParam = in("table", StringType)
    .comment("table name relative to this catalog, e.g. 'ns.t'").build()

  val all: Map[String, UnboundProcedure] = Seq[Proc](

    new Proc("compact", "rewrite the current snapshot into num_files files " +
        "(materializing deletion vectors), published as a new version; " +
        "zorder takes two or more numeric columns for a space-filling-curve " +
        "layout so N-D box predicates prune files on every listed dimension; " +
        "curve picks morton (any arity) or hilbert (2-D, tighter locality)",
      Seq(tableParam, in("num_files", IntegerType).defaultValue("4").build(),
        in("sort_cols", StringType).defaultValue("''")
          .comment("comma-separated cluster columns").build(),
        in("zorder", StringType).defaultValue("''")
          .comment("two or more comma-separated numeric columns").build(),
        in("curve", StringType).defaultValue("'morton'")
          .comment("morton | hilbert (hilbert needs exactly two columns)").build(),
        in("smaller_than_bytes", LongType).defaultValue("0")
          .comment("binpack: rewrite ONLY files below this size, carrying " +
            "larger ones untouched (0 = full rewrite)").build(),
        in("where", StringType).defaultValue("''")
          .comment("predicate-scoped rewrite: only files whose stats might " +
            "hold a matching row rewrite ('' = full rewrite)").build()),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val sorts = str(r, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val z = str(r, 3).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val n = r.getInt(1)
        val curve = str(r, 4)
        val smallerThan = Some(r.getLong(5)).filter(_ > 0L)
        val onlyMatching = Some(str(r, 6)).filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
        val zLayout = z match {
          case Seq() => None
          case one if one.size < 2 => throw new IllegalArgumentException(
            s"zorder needs at least two columns, got ${one.mkString(",")}")
          case zs =>
            require(sorts.isEmpty, "sort_cols and zorder are mutually exclusive")
            curve match {
              case "morton" => Some((df: org.apache.spark.sql.DataFrame) =>
                graft.ingest.ZOrder.layoutN(df, zs, n))
              case "hilbert" =>
                require(zs.size == 2,
                  s"hilbert curve layout is 2-D; got ${zs.size} columns")
                Some((df: org.apache.spark.sql.DataFrame) =>
                  graft.ingest.ZOrder.layoutHilbert(df, zs.head, zs(1), n))
              case other => throw new IllegalArgumentException(
                s"unknown curve '$other' (morton | hilbert)")
            }
        }
        Seq(Snapshots.compact(spark, table(r), n, sorts, zLayout,
          onlySmallerThan = smallerThan, onlyMatching = onlyMatching))
      }
    },

    new Proc("expire", "drop all but the newest keep_last snapshots " +
        "(tagged versions always survive; with max_age_ms >= 0 only " +
        "versions older than that age are dropped) and reclaim " +
        "unreferenced data files",
      Seq(tableParam, in("keep_last", IntegerType).defaultValue("1").build(),
        in("max_age_ms", LongType).defaultValue("-1").build()),
      out("versions_kept" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val t = table(r)
        val age = r.getLong(2)
        Snapshots.expire(t, r.getInt(1), if (age < 0) None else Some(age))
        Seq(Snapshots.versions(t).size.toLong)
      }
    },

    new Proc("rollback", "publish a new version whose content is an older " +
        "version's - history is preserved, nothing is deleted",
      Seq(tableParam, in("version", LongType).build()),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.rollback(table(r), r.getLong(1)))
    },

    new Proc("create_tag", "pin a version (default: latest) under an " +
        "immutable name that expire never reclaims",
      Seq(tableParam, in("name", StringType).build(),
        in("version", LongType).defaultValue("-1").build()),
      out("tagged_version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val t = table(r)
        val v = if (r.getLong(2) >= 0) r.getLong(2) else Snapshots.versions(t).max
        Snapshots.tag(t, str(r, 1), v)
        Seq(v)
      }
    },

    new Proc("drop_tag", "release a named version pin",
      Seq(tableParam, in("name", StringType).build()),
      out("dropped_tag" -> StringType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        Snapshots.dropTag(table(r), str(r, 1))
        Seq(UTF8String.fromString(str(r, 1)))
      }
    },

    new Proc("create_branch", "fork an isolated line of commits from a " +
        "version (default: latest) - the write-audit-publish staging surface",
      Seq(tableParam, in("name", StringType).build(),
        in("from_version", LongType).defaultValue("-1").build()),
      out("fork_version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val from = if (r.getLong(2) >= 0) Some(r.getLong(2)) else None
        Seq(Snapshots.createBranch(table(r), str(r, 1), from))
      }
    },

    new Proc("drop_branch", "delete a branch head (its staged-only files " +
        "become orphans for remove_orphans)",
      Seq(tableParam, in("name", StringType).build()),
      out("dropped_branch" -> StringType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        Snapshots.dropBranch(table(r), str(r, 1))
        Seq(UTF8String.fromString(str(r, 1)))
      }
    },

    new Proc("fast_forward", "publish a branch head onto main as a new " +
        "version (the WAP publish step)",
      Seq(tableParam, in("branch", StringType).build()),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.fastForward(table(r), str(r, 1)))
    },

    new Proc("remove_orphans", "delete data files no manifest or branch " +
        "references, older than the grace period - a crashed writer's litter",
      Seq(tableParam,
        in("older_than_hours", IntegerType).defaultValue("72").build()),
      out("removed_files" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.removeOrphans(table(r),
          r.getInt(1).toLong * 3600 * 1000).size.toLong)
    },

    new Proc("add_files", "register existing parquet files/directories " +
        "as a snapshot commit WITHOUT rewriting a byte (zero-copy " +
        "migration; the adopted table is name-resolved and maintenance " +
        "never deletes the foreign files)",
      Seq(in("table", StringType)
          .comment("table name relative to this catalog; created on first add").build(),
        in("source_path", StringType).build()),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.addFiles(spark, tableOrNew(str(r, 0)), Seq(str(r, 1))))
    },

    new Proc("clone", "zero-copy SHALLOW CLONE: dest becomes a new table " +
        "whose v1 references the source's data files at the given version " +
        "(default head) by absolute path - no data copied; the clone " +
        "diverges freely and its maintenance never deletes shared files",
      Seq(in("source", StringType)
          .comment("existing table name relative to this catalog").build(),
        in("dest", StringType)
          .comment("new table name relative to this catalog").build(),
        in("version", LongType).defaultValue("-1")
          .comment("source version to clone (-1 = current head)").build()),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val v = r.getLong(2)
        Seq(Snapshots.clone(spark, table(r, 0), tableOrNew(str(r, 1)),
          if (v < 0) None else Some(v)))
      }
    },

    new Proc("collect_stats", "backfill/refresh stats sidecars (min/max/" +
        "null-count + NDV sketches) for live batch dirs missing them - " +
        "the ANALYZE equivalent for legacy trees, stats-disabled ingests " +
        "and (include_foreign) adopted directories; no manifest change, " +
        "readers pick the new sidecars up immediately",
      Seq(tableParam,
        in("include_foreign", BooleanType).defaultValue("false")
          .comment("also write sidecars into adopted (add_files) producer dirs").build()),
      out("dirs_refreshed" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.collectStats(spark, table(r), r.getBoolean(1)))
    },

    new Proc("enable_row_lineage", "opt the table into durable row ids " +
        "(_row_id, Iceberg v3's row-lineage model): existing live files " +
        "backfill METADATA id ranges (footer reads only, no data pass), " +
        "appends assign at commit time, rewrites carry ids physically; " +
        "read ids via the _row_id metadata column (SELECT _row_id, ... - " +
        "never in SELECT *) or the Scala readLineage/changeFeed surface",
      Seq(tableParam),
      out("files_assigned" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.enableRowLineage(table(r)))
    },

    new Proc("backfill_row_ids", "assign row-id ranges to live files that " +
        "have neither a physical _row_id column nor a metadata assignment " +
        "- the repair for a write that raced enable_row_lineage (such " +
        "rows read _row_id NULL until repaired); idempotent, metadata-only",
      Seq(tableParam),
      out("files_assigned" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.backfillRowIds(table(r)))
    },

    new Proc("convert_eq_deletes", "fold every outstanding equality " +
        "delete into one deletion vector (no data file rewritten): after " +
        "a stream of eq-upserts, readers pay one coordinate anti join " +
        "again instead of one join per accumulated delete batch",
      Seq(tableParam),
      out("version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] =
        Seq(Snapshots.convertEqToDv(spark, table(r)))
    },

    new Proc("refresh_mv", "incrementally refresh a materialized aggregate " +
        "view (count/sum per key group; optionally min/max) from its source " +
        "table: scans only files appended since the stored watermark, " +
        "subtracts merge/DV-removed rows, upserts only touched groups, " +
        "publishes state+watermark atomically; min/max recompute only the " +
        "groups whose deletes threaten a stored extremum",
      Seq(in("view", StringType)
          .comment("view table name relative to this catalog; created on first refresh").build(),
        in("source", StringType).build(),
        in("keys", StringType).comment("comma-separated group columns").build(),
        in("value", StringType).comment("summed column").build(),
        in("with_minmax", BooleanType).defaultValue("false")
          .comment("also maintain min_v/max_v (choose at CREATION; the view schema is fixed)").build(),
        in("distinct_col", StringType).defaultValue("''")
          .comment("also maintain an ndv_sketch (approx distinct) of this " +
            "column; choose at CREATION and pass on every refresh").build()),
      out("view_version" -> LongType)) {
      override def exec(r: InternalRow): Seq[Any] = {
        val viewDir = tableOrNew(str(r, 0))
        val keys = str(r, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(graft.ingest.MatView.refresh(spark, viewDir, table(r, 1),
          keys, str(r, 3), withMinMax = r.getBoolean(4),
          distinctCol = Some(str(r, 5)).filter(_.nonEmpty).orNull))
      }
    }
  ).map(p => p.name() -> (p: UnboundProcedure)).toMap
}
