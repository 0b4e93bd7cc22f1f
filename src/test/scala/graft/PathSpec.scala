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

  test("node VALUES along a path: [n IN nodes(p) | n.prop]") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN c.c_custkey AS ck, length(p) AS len,
        |       [n IN nodes(p) | coalesce(n.n_name, n.r_name, n.c_name)] AS names
        |ORDER BY ck, len""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val cnames = customer.select("c_custkey", "c_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val names = r.getSeq[String](2)
      // one name per node, in path order, starting at the customer
      assert(names.length == r.getLong(1) + 1)
      assert(names.head == cnames(r.getLong(0)))
      assert(names.forall(_ != null))
    }
    // length-2 paths end at a region
    val regions = spark.read.parquet(s"$dir/region.parquet")
      .select("r_name").collect().map(_.getString(0)).toSet
    assert(rows.filter(_.getLong(1) == 2)
      .forall(r => regions(r.getSeq[String](2).last)))
  }

  test("labels() and id() on node values in lambda scope") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION*1..1]->(x)
        |RETURN [n IN nodes(p) | labels(n)[0]] AS lbls,
        |       [n IN nodes(p) | id(n)] AS ids
        |LIMIT 10""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == Seq("Customer", "Nation"))
      val ids = r.getSeq[Long](1)
      assert(ids.length == 2 && ids.forall(_ != 0L))
    }
  }

  test("UNWIND nodes(p) yields node values with property access") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation)
        |WHERE c.c_custkey = 1
        |UNWIND nodes(p) AS m
        |RETURN labels(m)[0] AS lbl, coalesce(m.c_name, m.n_name) AS name
        |ORDER BY lbl""".stripMargin)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Customer", "Nation"))
    assert(rows.forall(!_.isNullAt(1)))
  }

  test("reduce over node values") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*2..2]->(x)
        |WHERE c.c_custkey = 1
        |RETURN reduce(s = '', n IN nodes(p) |
        |         s + coalesce(n.n_name, n.r_name, 'C')) AS trail""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 1)
    val trail = rows.head.getString(0)
    // C + the nation name + the region name, in path order
    assert(trail.startsWith("C") && trail.contains("NATION"))
    assert(trail.length > "CNATION_0".length, "region name must follow")
  }

  test("node-value struct is pruned to the fields the lambda reads") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN [n IN nodes(p) | coalesce(n.n_name, n.r_name)] AS names
        |LIMIT 5""".stripMargin)
    // the enrichment collect's output list must carry only id + the two
    // demanded keys — not the graph's full (wide) node property schema
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val valsAttr = df.queryExecution.analyzed
      .collect { case a: Aggregate => a }.flatMap(_.output)
      .find(_.name.contains("_nodevals"))
    assert(valsAttr.isDefined, "enrichment aggregate not found")
    valsAttr.get.dataType match {
      case ArrayType(st: StructType, _) =>
        assert(st.fieldNames.toSet == Set("id", "n_name", "r_name"))
      case other => fail(s"unexpected node-value list type $other")
    }
    assert(df.collect().length == 5)
  }

  test("schema patterns prune the node-value lookup to reachable combos") {
    val q = """MATCH p = (c:Customer)-[:IN_NATION*1..1]->(n:Nation)
              |RETURN [x IN nodes(p) | x.n_name] AS ns LIMIT 3""".stripMargin
    // with the registry (TpchGraph declares its FK topology): only
    // Customer/Nation tables back the lookup — orders/part/supplier/
    // region parquet never enter the plan
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.getName).toSet
            case _ => Set.empty[String]
          }
      }.flatten.toSet
    val pruned = scannedFiles(gs.cypher(g, q))
    // (supplier.parquet still backs the supplier-side IN_NATION rel table)
    Seq("orders.parquet", "part.parquet", "region.parquet").foreach { f =>
      assert(!pruned.contains(f), s"unreachable table $f scanned: $pruned")
    }
    // without it, the lookup unions every node table
    val bare = scannedFiles(gs.cypher(g.withSchemaPatterns(Nil), q))
    assert(bare.contains("orders.parquet"),
      s"control query should scan all node tables without a registry: $bare")
    // results identical either way
    assert(gs.cypher(g, q).collect().map(_.getSeq[String](0)).toSeq ===
      gs.cypher(g.withSchemaPatterns(Nil), q).collect()
        .map(_.getSeq[String](0)).toSeq)
  }

  test("deriveSchemaPatterns infers the FK topology from data") {
    import graft.graph.SchemaPattern
    val derived = g.withSchemaPatterns(Nil).deriveSchemaPatterns()
    assert(derived.contains(
      SchemaPattern(Set("Customer"), "IN_NATION", Set("Nation"))))
    assert(derived.contains(
      SchemaPattern(Set("Nation"), "IN_REGION", Set("Region"))))
    assert(derived.contains(
      SchemaPattern(Set("Order"), "CONTAINS", Set("Part"))))
    // nothing invented: derived patterns are exactly the declared set
    assert(derived.toSet === g.schemaPatterns.toSet)
  }

  test("nonexistent property on a node value is null, not an error") {
    val df = gs.cypher(g,
      """MATCH p = (c:Customer)-[:IN_NATION]->(n:Nation)
        |RETURN [x IN nodes(p) | x.no_such_prop] AS vals LIMIT 3""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getSeq[Any](0).forall(_ == null)))
  }

  test("node values of a non-matching OPTIONAL path are null") {
    val df = gs.cypher(g,
      """MATCH (r:Region)
        |OPTIONAL MATCH p = (r)-[:IN_REGION]->(x)
        |RETURN r.r_name AS name, [n IN nodes(p) | n.r_name] AS names
        |ORDER BY name""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.isNullAt(1), "nodes(p) of a null path is null"))
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
