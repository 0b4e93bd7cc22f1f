package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.interop.ZeppelinSupport

/** Zeppelin rendering shim (reference ZeppelinSupportTest shapes):
  * `%table` TSV records, `%network` JSON for entity records and whole
  * graphs. */
class ZeppelinSupportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  lazy val g = gs.createGraphFromCypher("""
    CREATE (a:Person {name: 'Mats', luckyNumber: 23})
    CREATE (b:Person:Swedish {name: 'Martin', luckyNumber: 42})
    CREATE (a)-[:KNOWS {since: 2015}]->(b)
  """)

  test("toZeppelinTable: header + tab-separated rows, strings quoted") {
    val df = gs.cypher(g,
      """MATCH (p:Person) RETURN p.name AS name,
        |p.luckyNumber AS lucky ORDER BY lucky""".stripMargin)
    val table = ZeppelinSupport.toZeppelinTable(df)
    assert(table ===
      "name\tlucky\n'Mats'\t23\n'Martin'\t42")
  }

  test("toZeppelinGraph: entity records render nodes/edges/labels/types") {
    val df = gs.cypher(g,
      "MATCH (p:Person)-[k:KNOWS]->(q) RETURN p, k, q")
    val json = ZeppelinSupport.toZeppelinGraph(df)
    // two nodes (deduped by id), one edge, both labels colored
    assert(json.contains("\"labels\": [\"Person\"]"))
    assert(json.contains("\"labels\": [\"Person\", \"Swedish\"]"))
    // the display label is the last sorted label (reference behavior)
    assert(json.contains("\"label\": \"Swedish\""))
    assert(json.contains("\"label\": \"KNOWS\""))
    assert(json.contains("\"since\": \"2015\""))
    assert(json.contains("\"types\": [\"KNOWS\"]"))
    assert(json.contains("\"directed\": true"))
    assert("\"source\":".r.findAllIn(json).size === 1)
    // colors are deterministic per label
    val c1 = "\"Person\": \"(#[0-9a-f]{6})\"".r
      .findFirstMatchIn(json).get.group(1)
    assert(ZeppelinSupport.toZeppelinGraph(df).contains(c1))
  }

  test("toZeppelinJson: whole graph renders every element") {
    val json = ZeppelinSupport.toZeppelinJson(g)
    assert("\"id\":".r.findAllIn(json).size === 3) // 2 nodes + 1 edge
    assert(json.contains("\"name\": \"Mats\""))
    assert(json.contains("\"label\": \"KNOWS\""))
  }

  test("limit caps the collected preview") {
    val df = gs.cypher(g, "MATCH (p:Person) RETURN p.name AS name")
    val t = ZeppelinSupport.toZeppelinTable(df, limit = 1)
    assert(t.linesIterator.size === 2) // header + 1 row
  }
}
