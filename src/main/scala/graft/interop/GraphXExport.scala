package graft.interop

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.rdd.RDD

import graft.graph.PropertyGraph

/** Export to GraphX for iterative graph algorithms (PageRank, connected
  * components, …) — mirrors the reference's interop posture: GraphX is
  * NOT the engine (SURVEY §0), just an exit ramp
  * (morpheus-examples/.../GraphXPageRankExample.scala:63-69).
  *
  * Vertex attribute = label set; edge attribute = relationship type. The
  * conversion is two narrow RDD maps over the already-aligned element
  * tables — no shuffle beyond what GraphX itself does.
  */
object GraphXExport {

  def toGraphX(graph: PropertyGraph): XGraph[Set[String], String] = {
    val vertices: RDD[(Long, Set[String])] = graph.nodeTables.map { t =>
      val labels = t.labels
      t.df.select(t.idCol).rdd.map(r => (r.getLong(0), labels))
    }.reduce(_ union _)

    val edges: RDD[Edge[String]] = graph.relTables.map { t =>
      val tpe = t.relType
      t.df.select(t.srcCol, t.dstCol).rdd
        .map(r => Edge(r.getLong(0), r.getLong(1), tpe))
    }.reduce(_ union _)

    XGraph(vertices, edges)
  }

  /** PageRank over the property graph, back as a DataFrame (id, rank). */
  def pageRank(graph: PropertyGraph, tol: Double = 0.001)
      : org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    toGraphX(graph).pageRank(tol).vertices.toDF("id", "rank")
  }
}
