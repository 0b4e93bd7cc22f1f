package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.TpchGraph

/** Named paths: `p = (a)-[r*]->(b)` with length/nodes/relationships and
  * path rendering. Extension beyond the reference (which blacklists path
  * scenarios in its TCK run, morpheus-tck/src/test/resources). All path
  * functions are pure column combinations over ids the pattern already
  * carries — the specs in PlanQualitySpec-style assert no extra joins by
  * construction (same plan as the unnamed pattern).
  */
class PathSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val gs = GraftSession(spark)
  lazy val g = TpchGraph.load(spark, dir)
  lazy val customer = spark.read.parquet(s"$dir/customer.parquet")

  test("single-hop named path: length/nodes/relationships") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation)
        |RETURN length(p) AS len, size(nodes(p)) AS nn,
        |       size(relationships(p)) AS nr""".stripMargin)
    val rows = df.collect()
    assert(rows.length == customer.count())
    assert(rows.forall(r => r.getLong(0) == 1 && r.getLong(1) == 2 && r.getLong(2) == 1))
  }

  test("multi-segment named path spans the whole pattern part") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN length(p) AS len, size(nodes(p)) AS nn ORDER BY len LIMIT 1""".stripMargin)
    val row = df.head
    assert(row.getLong(0) == 2 && row.getLong(1) == 3)
  }

  test("var-length named path: length tracks traversed steps") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN length(p) AS len, size(nodes(p)) AS nn,
        |       size(relationships(p)) AS nr""".stripMargin)
    val byLen = df.groupBy("len").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = customer.count()
    assert(byLen(1L) == nCust) // customer -> nation
    assert(byLen(2L) == nCust) // customer -> nation -> region
    // nodes = rels + 1 on every row
    assert(df.where(col("nn") =!= col("nr") + 1).count() == 0)
    assert(df.where(col("len") =!= col("nr")).count() == 0)
  }

  test("zero-length branch yields an empty relationship list") {
    val df = gs.cypher(g,
      """MATCH p = (n:Nation)-[:IN_REGION*0..1]->(x)
        |RETURN length(p) AS len, size(nodes(p)) AS nn""".stripMargin)
    val byLen = df.groupBy("len").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLen(0L) == 25) // each nation pairs with itself
    assert(byLen(1L) == 25) // each nation -> its region
    // zero-length paths still have one node
    assert(df.where(col("len") === 0 && col("nn") =!= 1).count() == 0)
  }

  test("nodes(p) lists interior nodes of var-length segments in order") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*2..2]->(x)
        |RETURN nodes(p) AS ns, id(c) AS cid, id(x) AS xid""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getSeq[Long](0)
      assert(ns.length == 3)
      assert(ns.head == r.getLong(1)) // starts at c
      assert(ns.last == r.getLong(2)) // ends at x
    }
  }

  test("RETURN p renders node and relationship id lists") {
    val df = gs.cypher(g,
      """MATCH p = (n:Nation)-[:IN_REGION]->(r:Region) RETURN p""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val s = r.getStruct(0)
      assert(s.getSeq[Long](s.fieldIndex("@nodes")).length == 2)
      assert(s.getSeq[Long](s.fieldIndex("@rels")).length == 1)
    }
  }

  test("OPTIONAL MATCH non-matching path is null") {
    val df = gs.cypher(g,
      """MATCH (r:Region)
        |OPTIONAL MATCH p = (r)-[:IN_REGION]->(x)
        |RETURN r.r_name AS name, length(p) AS len, p
        |ORDER BY name""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5) // regions have no outgoing IN_REGION
    rows.foreach { r =>
      assert(r.isNullAt(1), "length(p) must be null on a non-match")
      assert(r.isNullAt(2), "p must be null on a non-match")
    }
  }

  test("path survives WITH and aggregation keys") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation)
        |WITH p, n WHERE n.n_name STARTS WITH 'NATION_1'
        |RETURN n.n_name AS name, count(*) AS n_paths, max(length(p)) AS maxlen
        |ORDER BY name""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) == 1))
  }
}
