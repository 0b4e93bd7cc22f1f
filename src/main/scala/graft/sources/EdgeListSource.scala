package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.graph.{NodeTable, PropertyGraph, RelTable}

/** SNAP-style edge-list reader: whitespace-separated `src dst` pairs, `#`
  * comments (role of the reference's EdgeListDataSource,
  * morpheus-spark-cypher/.../api/io/edgelist/EdgeListDataSource.scala:42-105).
  * Nodes get label `V`, relationships type `E`; node set = distinct ids on
  * either side. Edge ids are the line's (src, dst) pair packed via a
  * shuffle-free monotonic id.
  */
object EdgeListSource {

  def load(spark: SparkSession, path: String,
      nodeLabel: String = "V", relType: String = "E"): PropertyGraph = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    val edges = spark.read
      .option("delimiter", " ")
      .option("comment", "#")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .schema(schema)
      .csv(path)
      .where(col("src").isNotNull && col("dst").isNotNull)

    val rels = edges.select(
      monotonically_increasing_id().as("_gid"),
      col("src").as("_src"), col("dst").as("_dst"))

    val nodes = edges.select(col("src").as("_gid"))
      .unionByName(edges.select(col("dst").as("_gid")))
      .distinct()

    new PropertyGraph(
      Seq(NodeTable(Set(nodeLabel), nodes, "_gid", Map.empty)),
      Seq(RelTable(relType, rels, "_gid", "_src", "_dst", Map.empty)),
      spark)
  }
}
