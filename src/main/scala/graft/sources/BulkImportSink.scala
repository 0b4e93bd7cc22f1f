package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.PropertyGraph

/** Write-only sink producing the Neo4j *bulk import* (offline
  * `neo4j-admin import`) layout: per-label-combination node CSVs and
  * per-type relationship CSVs, each with a one-line `schema.csv` header
  * (`:ID` / `:START_ID` / `:END_ID` / `prop:type` conventions), plus an
  * `import.sh` that assembles the admin command. No driver jar or
  * network involved — this is the reference's offline initial-load path
  * (reference: Neo4jBulkCSVDataSink.scala:44-188), re-expressed directly
  * over our element tables.
  *
  * Scale shape: each element table is written by executors as
  * partitioned CSV parts (`df.write.csv` — parallel, no driver
  * collect); only the one-line schema headers and the shell script are
  * driver-side writes. Array properties are flattened with
  * `concat_ws(arrayDelimiter)` (the admin tool's array convention);
  * temporal columns are rendered as ISO strings — the header still
  * declares the ORIGINAL type (`int[]`, `date`, …) so the admin tool
  * parses them back.
  */
object BulkImportSink {

  /** neo4j-admin's property-type vocabulary for the header line. */
  private def neoType(dt: DataType): String = dt match {
    case StringType => "string"
    case LongType | IntegerType | ShortType | ByteType => "int"
    case BooleanType => "boolean"
    case DoubleType | FloatType | _: DecimalType => "double"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "datetime"
    case ArrayType(inner, _) => s"${neoType(inner)}[]"
    case NullType => "string"
    case other => throw new IllegalArgumentException(
      s"type ${other.simpleString} has no Neo4j bulk-import mapping")
  }

  /** CSV-safe projection: arrays joined with the delimiter, temporals to
    * ISO-8601, everything else as-is. */
  private def csvReady(df: DataFrame, arrayDelimiter: String): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType =>
          concat_ws(arrayDelimiter, col(s"`${f.name}`")).as(f.name)
        case DateType =>
          date_format(col(s"`${f.name}`"), "yyyy-MM-dd").as(f.name)
        case TimestampType | TimestampNTZType =>
          date_format(col(s"`${f.name}`"), "yyyy-MM-dd'T'HH:mm:ss")
            .as(f.name)
        case _ => col(s"`${f.name}`")
      }
    }.toIndexedSeq: _*)

  private def writeText(fs: FileSystem, path: Path, content: String): Unit = {
    val out = fs.create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def comboDir(labels: Set[String]): String =
    if (labels.isEmpty) "_unlabeled" else labels.toSeq.sorted.mkString("_")

  /** Writes `graph` under `rootPath/<dbName>/` and returns the path of
    * the generated import script. */
  def write(graph: PropertyGraph, rootPath: String, dbName: String = "graph",
      arrayDelimiter: String = "|"): String = {
    val spark = graph.spark
    val fs = FileSystem.get(new Path(rootPath).toUri,
      spark.sparkContext.hadoopConfiguration)
    val base = new Path(rootPath, dbName)

    val nodeArgs = graph.nodeTables.map { nt =>
      val dir = new Path(new Path(base, "nodes"), comboDir(nt.labels))
      val props = nt.propCols.toSeq.sortBy(_._1)
      // id + properties in stable order; ids keep the engine's Long
      // values (`--id-type=INTEGER` in the script)
      val projected = nt.df.select(
        (col(s"`${nt.idCol}`").as("__id") +:
          props.map { case (p, c) => col(s"`$c`").as(p) }): _*)
      val header = ("__id:ID" +: props.map { case (p, _) =>
        s"$p:${neoType(projected.schema(p).dataType)}" }).mkString(",")
      csvReady(projected, arrayDelimiter).write.mode("overwrite")
        .option("emptyValue", "").csv(new Path(dir, "data").toString)
      writeText(fs, new Path(dir, "schema.csv"), header)
      val labelSuffix =
        if (nt.labels.isEmpty) "" else s":${nt.labels.toSeq.sorted.mkString(":")}"
      s"""--nodes$labelSuffix "$dir/schema.csv,$dir/data/part.*\\.csv""""
    }

    val relArgs = graph.relTables.map { rt =>
      val dir = new Path(new Path(base, "relationships"), rt.relType)
      val props = rt.propCols.toSeq.sortBy(_._1)
      val projected = rt.df.select(
        (Seq(col(s"`${rt.srcCol}`").as("__src"),
          col(s"`${rt.dstCol}`").as("__dst")) ++
          props.map { case (p, c) => col(s"`$c`").as(p) }): _*)
      val header = (Seq(":START_ID", ":END_ID") ++ props.map { case (p, _) =>
        s"$p:${neoType(projected.schema(p).dataType)}" }).mkString(",")
      csvReady(projected, arrayDelimiter).write.mode("overwrite")
        .option("emptyValue", "").csv(new Path(dir, "data").toString)
      writeText(fs, new Path(dir, "schema.csv"), header)
      s"""--relationships:${rt.relType} "$dir/schema.csv,$dir/data/part.*\\.csv""""
    }

    val script =
      s"""#!/bin/sh
         |if [ $$# -ne 1 ]
         |then
         |  echo "Please provide the path to your Neo4j installation (e.g. /usr/share/neo4j/)"
         |else
         |  $${1}bin/neo4j-admin import \\
         |  --database=$dbName \\
         |  --delimiter="," \\
         |  --array-delimiter="$arrayDelimiter" \\
         |  --id-type=INTEGER \\
         |${nodeArgs.mkString("  ", " \\\n  ", "")} \\
         |${relArgs.mkString("  ", " \\\n  ", "")}
         |fi
         |""".stripMargin
    val scriptPath = new Path(base, "import.sh")
    writeText(fs, scriptPath, script)
    scriptPath.toString
  }
}
