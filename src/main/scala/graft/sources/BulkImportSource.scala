package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** Read-side twin of [[BulkImportSink]]: loads a Neo4j *bulk import*
  * (`neo4j-admin import`) CSV layout back into a [[PropertyGraph]] — the
  * offline migration path OUT of a Neo4j staging area without a driver
  * jar or network. Labels and file locations are taken from the layout
  * itself (`import.sh`'s `--nodes:A:B` / `--relationships:T` arguments);
  * each element table's `schema.csv` one-line header (`:ID` /
  * `:START_ID` / `:END_ID` / `prop:type`) supplies names and types.
  *
  * Scale shape: every `data/` directory is one parallel `spark.read.csv`
  * with an all-string schema and per-column typed casts — no driver-side
  * row handling; only the one-line headers and the script are read on
  * the driver. Relationship ids are synthesized (table-index high byte +
  * `monotonically_increasing_id`, unique across rel tables) because the
  * admin layout carries none.
  *
  * Round-trip caveats (inherent to the CSV medium, spec-locked):
  * empty string vs null is indistinguishable for string properties, and
  * non-string nulls come back as nulls via cast of ''.
  */
object BulkImportSource {

  private def sparkType(neo: String): DataType = neo match {
    case "string" => StringType
    case "int" | "long" => LongType
    case "boolean" => BooleanType
    case "double" | "float" => DoubleType
    case "date" => DateType
    case "datetime" => TimestampNTZType
    case arr if arr.endsWith("[]") =>
      ArrayType(sparkType(arr.dropRight(2)))
    case other => throw new IllegalArgumentException(
      s"unknown bulk-import property type `$other`")
  }

  private def readText(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** cast a raw string column to the header-declared type. */
  private def typed(c: org.apache.spark.sql.Column, dt: DataType,
      arrayDelimiter: String): org.apache.spark.sql.Column = dt match {
    case StringType => c
    case DateType => to_date(c, "yyyy-MM-dd")
    case TimestampNTZType =>
      to_timestamp_ntz(c, lit("yyyy-MM-dd'T'HH:mm:ss"))
    case ArrayType(inner, _) =>
      // sink writes arrays joined with the delimiter; '' means empty
      when(c.isNull || c === "", lit(null).cast(ArrayType(inner)))
        .otherwise(transform(
          split(c, java.util.regex.Pattern.quote(arrayDelimiter)),
          e => typed(e, inner, arrayDelimiter)))
    case other => c.cast(other)
  }

  private def readTable(spark: SparkSession, dir: String, header: String,
      arrayDelimiter: String): (DataFrame, Seq[(String, DataType)]) = {
    val fields = header.split(",").toSeq.map { h =>
      h.split(":") match {
        case Array("", t) => s"@$t" -> t // ":START_ID" → "@START_ID"
        case Array(name, t) => name -> t
        case _ => throw new IllegalArgumentException(s"bad header cell `$h`")
      }
    }
    val raw = spark.read
      .schema(StructType(fields.map { case (n, _) =>
        StructField(n, StringType) }))
      .csv(s"$dir/data")
    val out = raw.select(fields.map { case (n, t) =>
      val dt = t match {
        case "ID" | "START_ID" | "END_ID" => LongType
        case other => sparkType(other)
      }
      typed(col(s"`$n`"), dt, arrayDelimiter).as(n)
    }: _*)
    (out, fields.map { case (n, t) => n ->
      (t match { case "ID" | "START_ID" | "END_ID" => LongType
                 case other => sparkType(other) }) })
  }

  /** Loads `rootPath/<dbName>/` (a [[BulkImportSink.write]] layout or a
    * hand-built admin staging area following the same conventions). */
  def read(spark: SparkSession, rootPath: String, dbName: String = "graph",
      arrayDelimiter: String = "|"): PropertyGraph = {
    val fs = FileSystem.get(new Path(rootPath).toUri,
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(rootPath, dbName)
    val script = readText(fs, new Path(base, "import.sh"))

    // `--nodes:A:B "<dir>/schema.csv,<dir>/data/part.*\.csv"`
    val nodeSpec = """--nodes((?::[^ "]+)*) "([^,"]+)/schema\.csv""".r
    val relSpec = """--relationships:([^ "]+) "([^,"]+)/schema\.csv""".r

    val nodeTables = nodeSpec.findAllMatchIn(script).map { m =>
      val labels = Option(m.group(1)).getOrElse("")
        .split(":").filter(_.nonEmpty).toSet
      val dir = m.group(2)
      val header = readText(fs, new Path(dir, "schema.csv"))
      val (df, fields) = readTable(spark, dir, header, arrayDelimiter)
      val props = fields.collect {
        case (n, _) if n != "__id" => n -> n }.toMap
      NodeTable(labels, df, "__id", props)
    }.toSeq

    val relTables = relSpec.findAllMatchIn(script).zipWithIndex.map {
      case (m, tableIndex) =>
      val relType = m.group(1)
      val dir = m.group(2)
      val header = readText(fs, new Path(dir, "schema.csv"))
      val (df0, fields) = readTable(spark, dir, header, arrayDelimiter)
      // Namespace ids per rel table (high byte = table index): bare
      // monotonically_increasing_id restarts at 0 per table, so ids would
      // collide ACROSS relationship types — breaking id(r), DISTINCT r,
      // and untyped rel-uniqueness predicates that compare ids.
      val df = df0.withColumn("@rid",
        lit(tableIndex.toLong << 56) + monotonically_increasing_id())
      val props = fields.collect {
        case (n, _) if n != "@START_ID" && n != "@END_ID" => n -> n }.toMap
      RelTable(relType, df, "@rid", "@START_ID", "@END_ID", props)
    }.toSeq

    new PropertyGraph(nodeTables, relTables, spark)
  }
}
