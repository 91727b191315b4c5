package graft.connector

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{Identifier, View, ViewInfo}
import org.apache.spark.sql.types.{DataType, StructType}

/** View metadata persistence for [[GraftCatalog]]: one `<name>.view`
  * properties FILE per view next to the table directories — a file can
  * never be confused with a table (a directory with `_snapshots`) or a
  * namespace (any other directory), so existence checks stay
  * listing-shaped. The stored fields are exactly Spark's [[ViewInfo]]:
  * the original SQL text plus the name-resolution context (current
  * catalog/namespace) it must re-analyze under, the analyzed schema, and
  * the column aliases/comments.
  */
private[connector] object GraftViews {

  val Suffix = ".view"

  private def esc(parts: Seq[String], props: java.util.Properties,
                  key: String): Unit = {
    props.setProperty(s"$key.n", parts.size.toString)
    parts.zipWithIndex.foreach { case (p, i) =>
      if (p != null) props.setProperty(s"$key.$i", p)
    }
  }

  private def unesc(props: java.util.Properties, key: String): Array[String] = {
    val n = Option(props.getProperty(s"$key.n")).map(_.toInt).getOrElse(0)
    Array.tabulate(n)(i => props.getProperty(s"$key.$i")) // absent => null
  }

  def write(fs: FileSystem, file: Path, info: ViewInfo, overwrite: Boolean): Unit = {
    val props = new java.util.Properties()
    props.setProperty("sql", info.sql)
    props.setProperty("currentCatalog", info.currentCatalog)
    esc(info.currentNamespace.toSeq, props, "ns")
    props.setProperty("schema", info.schema.json)
    esc(info.queryColumnNames.toSeq, props, "qcn")
    esc(info.columnAliases.toSeq, props, "alias")
    esc(info.columnComments.toSeq, props, "comment")
    import scala.jdk.CollectionConverters._
    info.properties.asScala.foreach { case (k, v) =>
      props.setProperty(s"p.$k", v)
    }
    // create-exclusive unless replacing: the filesystem's create(=false)
    // is the same commit CAS the snapshot layer uses
    val out = fs.create(file, overwrite)
    try props.store(out, null) finally out.close()
  }

  def read(fs: FileSystem, file: Path, viewName: String): View = {
    val in = fs.open(file)
    val props = new java.util.Properties()
    try props.load(in) finally in.close()
    import scala.jdk.CollectionConverters._
    val extra = props.stringPropertyNames().asScala
      .filter(_.startsWith("p."))
      .map(k => k.stripPrefix("p.") -> props.getProperty(k)).toMap
    new View {
      override def name(): String = viewName
      override def query(): String = props.getProperty("sql")
      override def currentCatalog(): String = props.getProperty("currentCatalog")
      override def currentNamespace(): Array[String] = unesc(props, "ns")
      override def schema(): StructType =
        DataType.fromJson(props.getProperty("schema")).asInstanceOf[StructType]
      override def queryColumnNames(): Array[String] = unesc(props, "qcn")
      override def columnAliases(): Array[String] = unesc(props, "alias")
      override def columnComments(): Array[String] = unesc(props, "comment")
      override def properties(): java.util.Map[String, String] = extra.asJava
    }
  }
}
