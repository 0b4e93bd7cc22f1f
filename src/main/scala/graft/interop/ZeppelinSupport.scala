package graft.interop

import org.apache.spark.sql.{DataFrame, Row}

import graft.graph.PropertyGraph

/** Zeppelin notebook rendering (role of the reference's
  * okapi-api/.../api/util/ZeppelinSupport.scala): query records as a
  * `%table` block, entity-bearing records and whole graphs as the
  * `%network` JSON shape ({nodes, edges, labels → color, types,
  * directed}).
  *
  * Driver-side by necessity — a notebook paragraph renders a bounded
  * preview, so every entry point takes a `limit` applied BEFORE the
  * collect (the only rows that ever reach the driver). Rendering a
  * 100 TB graph means rendering a capped sample of it, same as the
  * reference.
  */
object ZeppelinSupport {

  /** value formatting matching the reference's defaultValueFormatter:
    * strings single-quoted in tables, everything stringified. */
  private def fmtTable(v: Any): String = v match {
    case null => "null"
    case s: String => s"'$s'"
    case other => other.toString
  }

  /** Records as a Zeppelin table: header row + one TSV line per record
    * (reference `toZeppelinTable`). */
  def toZeppelinTable(df: DataFrame, limit: Int = 1000): String = {
    val header = df.columns.mkString("\t")
    val rows = df.limit(limit).collect()
      .map(_.toSeq.map(fmtTable).mkString("\t"))
    (header +: rows).mkString("\n")
  }

  /** The `%table` paragraph form (reference `printTable`). */
  def printTable(df: DataFrame, limit: Int = 1000): Unit =
    println(s"%table\n${toZeppelinTable(df, limit)}")

  // ------------------------------------------------------------ %network

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def jstr(s: String): String = "\"" + esc(s) + "\""

  /** deterministic per-label color (reference colorForLabel hashes the
    * label): first 6 hex chars of the label's md5. */
  private def colorForLabel(label: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(label.getBytes("UTF-8"))
    f"#${d(0) & 0xff}%02x${d(1) & 0xff}%02x${d(2) & 0xff}%02x"
  }

  /** reference id rendering: hex, zero-padded to an even width. */
  private def hexId(id: Long): String = {
    val h = java.lang.Long.toHexString(id)
    if (h.length % 2 == 0) h else "0" + h
  }

  private def jdata(props: Seq[(String, Any)]): String =
    props.filter(_._2 != null).sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: ${jstr(String.valueOf(v))}" }
      .mkString("{", ", ", "}")

  private case class JNode(id: Long, labels: Seq[String],
      props: Seq[(String, Any)]) {
    def json: String = {
      val ls = labels.sorted
      s"""{"id": ${jstr(hexId(id))}, "label": ${jstr(ls.lastOption.getOrElse(""))}, """ +
        s""""labels": ${ls.map(jstr).mkString("[", ", ", "]")}, "data": ${jdata(props)}}"""
    }
  }
  private case class JEdge(id: Long, src: Long, dst: Long, typ: String,
      props: Seq[(String, Any)]) {
    def json: String =
      s"""{"id": ${jstr(hexId(id))}, "source": ${jstr(hexId(src))}, """ +
        s""""target": ${jstr(hexId(dst))}, "label": ${jstr(typ)}, "data": ${jdata(props)}}"""
  }

  private def networkJson(nodes: Seq[JNode], edges: Seq[JEdge]): String = {
    val labels = nodes.flatMap(_.labels).distinct.sorted
    val types = edges.map(_.typ).distinct.sorted
    s"""{
       |  "nodes": [${nodes.map(_.json).mkString(", ")}],
       |  "edges": [${edges.map(_.json).mkString(", ")}],
       |  "labels": {${labels.map(l =>
            s"${jstr(l)}: ${jstr(colorForLabel(l))}").mkString(", ")}},
       |  "types": [${types.map(jstr).mkString(", ")}],
       |  "directed": true
       |}""".stripMargin
  }

  /** Whole graph as Zeppelin `%network` JSON (reference
    * `graph.toZeppelinJson`): every node/rel table contributes up to
    * `limit` rows. */
  def toZeppelinJson(g: PropertyGraph, limit: Int = 1000): String = {
    val nodes = g.nodeTables.flatMap { t =>
      val cols = s"CAST(`${t.idCol}` AS BIGINT)" +:
        t.propCols.values.toSeq.map(c => s"`$c`")
      t.df.selectExpr(cols: _*).limit(limit).collect()
        .map { r =>
          JNode(r.getLong(0), t.labels.toSeq,
            t.propCols.keys.toSeq.zipWithIndex.map { case (k, i) =>
              k -> r.get(i + 1) })
        }
    }
    val edges = g.relTables.flatMap { t =>
      val cols = Seq(t.idCol, t.srcCol, t.dstCol)
        .map(c => s"CAST(`$c` AS BIGINT)") ++
        t.propCols.values.toSeq.map(c => s"`$c`")
      t.df.selectExpr(cols: _*).limit(limit).collect()
        .map { r =>
          JEdge(r.getLong(0), r.getLong(1), r.getLong(2), t.relType,
            t.propCols.keys.toSeq.zipWithIndex.map { case (k, i) =>
              k -> r.get(i + 3) })
        }
    }
    networkJson(nodes, edges)
  }

  /** Entity-bearing query records as `%network` JSON (reference
    * `records.toZeppelinGraph`): node structs ({@id, @labels, props…})
    * and relationship structs ({@id, @src, @dst, @type, props…}) in the
    * result columns become the rendered graph, deduplicated by id. */
  def toZeppelinGraph(records: DataFrame, limit: Int = 1000): String = {
    val rows = records.limit(limit).collect()
    val nodes = scala.collection.mutable.LinkedHashMap.empty[Long, JNode]
    val edges = scala.collection.mutable.LinkedHashMap.empty[Long, JEdge]
    def visit(v: Any): Unit = v match {
      case r: Row if r.schema != null =>
        val fields = r.schema.fieldNames
        if (fields.contains("@id") && fields.contains("@labels") && !r.isNullAt(r.fieldIndex("@id"))) {
          val id = r.getLong(r.fieldIndex("@id"))
          val labels = r.getSeq[String](r.fieldIndex("@labels"))
          val props = fields.filterNot(_.startsWith("@")).toSeq
            .map(f => f -> r.get(r.fieldIndex(f)))
          nodes(id) = JNode(id, labels, props)
        } else if (fields.contains("@id") && fields.contains("@src") && !r.isNullAt(r.fieldIndex("@id"))) {
          val id = r.getLong(r.fieldIndex("@id"))
          val props = fields.filterNot(_.startsWith("@")).toSeq
            .map(f => f -> r.get(r.fieldIndex(f)))
          edges(id) = JEdge(id, r.getLong(r.fieldIndex("@src")),
            r.getLong(r.fieldIndex("@dst")),
            r.getString(r.fieldIndex("@type")), props)
        } else r.toSeq.foreach(visit)
      case s: scala.collection.Seq[_] => s.foreach(visit)
      case _ => ()
    }
    rows.foreach(_.toSeq.foreach(visit))
    networkJson(nodes.values.toSeq, edges.values.toSeq)
  }

  /** The `%network` paragraph forms (reference `printGraph`). */
  def printGraph(g: PropertyGraph, limit: Int = 1000): Unit =
    println(s"%network\n${toZeppelinJson(g, limit)}")
  def printGraph(records: DataFrame): Unit =
    println(s"%network\n${toZeppelinGraph(records)}")
}
