package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.TypedGraphDdl
import graft.sources.TypedGraphDdl._

/** Parser-parity batch over the reference Graph DDL grammar — the same
  * inputs the reference's GraphDdlParserTest.scala:85-551 accepts, parsed
  * into this engine's AST — plus end-to-end graph builds with typed
  * element types, inheritance, and JOIN ON mappings. */
class TypedGraphDdlSpec extends AnyFunSuite {

  // ------------------------------------------------- element types
  test("element type: bare, empty parens, typed and nullable props") {
    assert(parseElementType("A") ===
      ElementTypeDef("A", Set.empty, Map.empty, None))
    assert(parseElementType("A ()") ===
      ElementTypeDef("A", Set.empty, Map.empty, None))
    assert(parseElementType("A ( foo  string? )") ===
      ElementTypeDef("A", Set.empty,
        Map("foo" -> PropType("string", nullable = true)), None))
    assert(parseElementType("A ( key FLOAT )") ===
      ElementTypeDef("A", Set.empty,
        Map("key" -> PropType("FLOAT", nullable = false)), None))
    assert(parseElementType("A ( key1 FLOAT, key2 STRING)").props.keySet ===
      Set("key1", "key2"))
    assert(parseElementType("A ( key LOCALDATETIME? )")
      .props("key").nullable)
  }

  test("element type: EXTENDS and <: inheritance, single and multiple") {
    assert(parseElementType("A EXTENDS B ()").parents === Set("B"))
    assert(parseElementType("A <: B ()").parents === Set("B"))
    assert(parseElementType("A EXTENDS B, C ()").parents === Set("B", "C"))
    assert(parseElementType("A <: B, C ( key STRING )") ===
      ElementTypeDef("A", Set("B", "C"),
        Map("key" -> PropType("STRING", nullable = false)), None))
  }

  test("element type: unknown property types are rejected") {
    intercept[IllegalArgumentException](parseElementType("A ( prop char )"))
    intercept[IllegalArgumentException](parseElementType("A ( key _ STRING )"))
  }

  test("catalog element type: CREATE ELEMENT TYPE with KEY clause") {
    assert(parseGlobalElementType("CREATE ELEMENT TYPE A") ===
      ElementTypeDef("A", Set.empty, Map.empty, None))
    assert(parseGlobalElementType("CREATE ELEMENT TYPE A ( foo STRING ) ")
      .props === Map("foo" -> PropType("STRING", nullable = false)))
    assert(parseGlobalElementType("CREATE ELEMENT TYPE A KEY A_NK   (foo,   bar)")
      .key === Some("A_NK" -> Set("foo", "bar")))
    assert(parseGlobalElementType(
      "CREATE ELEMENT TYPE A ( foo STRING ) KEY A_NK (foo,   bar)")
      .key === Some("A_NK" -> Set("foo", "bar")))
    intercept[IllegalArgumentException](
      parseGlobalElementType("CREATE ELEMENT TYPE A ( foo STRING ) KEY A ()"))
  }

  // ------------------------------------------------- schema patterns
  test("node and relationship type definitions") {
    assert(parseNodeType("(A)") === NodeTypeDef(Seq("A")))
    assert(parseNodeType("(A,B)") === NodeTypeDef(Seq("A", "B")))
    assert(parseRelType("(A)-[R]->(B)") ===
      RelTypeDef(NodeTypeDef(Seq("A")), Seq("R"), NodeTypeDef(Seq("B"))))
    assert(parseRelType("(A)-[R,S]->(B)").relTypes === Seq("R", "S"))
  }

  test("SET SCHEMA with and without trailing semicolon") {
    assert(parseSetSchema("SET SCHEMA foo.bar") === ("foo", "bar"))
    assert(parseSetSchema("SET SCHEMA foo.bar;") === ("foo", "bar"))
  }

  test("graph type: node types, rel types, comments, any order") {
    val g = parseGraphType(
      """CREATE GRAPH TYPE mySchema (
        |
        |  --NODES
        |  (A),
        |  (B),
        |  (A, B),
        |
        |  --EDGES
        |  (A)-[TYPE_1]->(B),
        |  (A, B)-[TYPE_2]->(A)
        |)""".stripMargin)
    assert(g.name === "mySchema")
    assert(g.nodeTypes === Seq(NodeTypeDef(Seq("A")), NodeTypeDef(Seq("B")),
      NodeTypeDef(Seq("A", "B"))))
    assert(g.relTypes.map(_.relTypes) === Seq(Seq("TYPE_1"), Seq("TYPE_2")))
    val g2 = parseGraphType(
      "CREATE GRAPH TYPE mySchema ( (A)-[TYPE]->(B) )")
    assert(g2.relTypes.size === 1 && g2.nodeTypes.isEmpty)
    // interleaved order preserved by category
    val g3 = parseGraphType(
      """CREATE GRAPH TYPE mySchema (
        |  (A, B)-[TYPE_1]->(B),
        |  (A),
        |  (B)-[TYPE_2]->(A, B)
        |)""".stripMargin)
    assert(g3.nodeTypes === Seq(NodeTypeDef(Seq("A"))) &&
      g3.relTypes.size === 2)
  }

  // ------------------------------------------------- mappings
  test("node mappings: views, property maps, multiple views, backticks") {
    assert(parseNodeMapping("(A) FROM view") ===
      NodeMappingDef(NodeTypeDef(Seq("A")),
        Seq(ViewMapping(Seq("view"), None))))
    assert(parseNodeMapping(
      "(A) FROM view (column1 AS propertyKey1, column2 AS propertyKey2)")
      .views.head.propToCol ===
      Some(Map("propertyKey1" -> "column1", "propertyKey2" -> "column2")))
    assert(parseNodeMapping("(A) FROM viewA FROM viewB").views.map(_.view) ===
      Seq(Seq("viewA"), Seq("viewB")))
    assert(parseNodeMapping("(A) FROM `foo.json`").views.head.view ===
      Seq("foo.json"))
  }

  test("relationship mapping: START/END NODES with JOIN ON, both alias orders") {
    val m = parseRelMapping(
      """(X)-[Y]->(Z) FROM baz alias_baz
        |  START NODES (A, B) FROM foo alias_foo
        |      JOIN ON alias_foo.COLUMN_A = edge.COLUMN_A
        |          AND alias_foo.COLUMN_C = edge.COLUMN_D
        |  END NODES (C) FROM bar alias_bar
        |      JOIN ON alias_bar.COLUMN_A = edge.COLUMN_A""".stripMargin)
    assert(m.rel.relTypes === Seq("Y"))
    val v = m.views.head
    assert(v.view === Seq("baz") && v.alias === "alias_baz")
    assert(v.start.node === NodeTypeDef(Seq("A", "B")))
    assert(v.start.joins ===
      Seq(("COLUMN_A", "COLUMN_A"), ("COLUMN_C", "COLUMN_D")))
    assert(v.end.joins === Seq(("COLUMN_A", "COLUMN_A")))
    // edge alias on the left of `=` resolves the same way
    val m2 = parseRelMapping(
      """(A)-[R]->(A) FROM r e
        |  START NODES (A) FROM a n JOIN ON e.src = n.id
        |  END   NODES (A) FROM a n JOIN ON e.dst = n.id""".stripMargin)
    assert(m2.views.head.start.joins === Seq(("id", "src")))
    assert(m2.views.head.end.joins === Seq(("id", "dst")))
  }

  test("relationship mapping: custom property map and repeated FROM blocks") {
    val m = parseRelMapping(
      """(a)-[a]->(a) FROM baz alias_baz ( colA AS foo, colB AS bar )
        |  START NODES (A, B) FROM foo alias_foo JOIN ON alias_foo.COLUMN_A = edge.COLUMN_A
        |  END NODES   (C)    FROM bar alias_bar JOIN ON alias_bar.COLUMN_A = edge.COLUMN_A""".stripMargin)
    assert(m.views.head.propToCol ===
      Some(Map("foo" -> "colA", "bar" -> "colB")))
    val m2 = parseRelMapping(
      """(A)-[TYPE_1]->(B)
        |  FROM baz edge
        |    START NODES (A) FROM foo alias_foo JOIN ON alias_foo.COLUMN_A = edge.COLUMN_A
        |    END NODES   (B) FROM bar alias_bar JOIN ON alias_bar.COLUMN_A = edge.COLUMN_A
        |  FROM baz edge
        |    START NODES (A) FROM foo alias_foo JOIN ON alias_foo.COLUMN_A = edge.COLUMN_A
        |    END NODES   (B) FROM bar alias_bar JOIN ON alias_bar.COLUMN_A = edge.COLUMN_A""".stripMargin)
    assert(m2.views.size === 2)
  }

  test("full document: SET SCHEMA + element types + graph type + graph OF") {
    val doc = parseDocument(
      """|SET SCHEMA foo.bar
         |
         |CREATE ELEMENT TYPE A ( name STRING )
         |
         |CREATE ELEMENT TYPE B ( sequence INTEGER, nationality STRING?, age INTEGER? )
         |
         |CREATE ELEMENT TYPE TYPE_1
         |
         |CREATE GRAPH TYPE mySchema (
         |  (A), (B),
         |  (A)-[TYPE_1]->(B)
         |)
         |CREATE GRAPH myGraph OF mySchema ()""".stripMargin)
    assert(doc.setSchema === Some(("foo", "bar")))
    assert(doc.elementTypes.map(_.name) === Seq("A", "B", "TYPE_1"))
    assert(doc.elementTypes(1).props("nationality").nullable)
    assert(!doc.elementTypes(1).props("sequence").nullable)
    assert(doc.graphs.head.ofType === Some("mySchema"))
  }

  test("inline graph definition mixes local element types and mappings") {
    val g = parseGraph(
      """|CREATE GRAPH myGraph (
         | A ( foo STRING ) ,
         | B,
         | (A, B),
         | (A, B)-[B]->(C),
         | (A,B) FROM view_a_b,
         | (A, B)-[B]->(C) FROM baz alias_baz
         |  START NODES (A, B) FROM foo alias_foo
         |      JOIN ON alias_foo.COLUMN_A = edge.COLUMN_A
         |          AND alias_foo.COLUMN_C = edge.COLUMN_D
         |  END NODES (C) FROM bar alias_bar
         |      JOIN ON alias_bar.COLUMN_A = edge.COLUMN_A
         |)""".stripMargin)
    assert(g.elements.map(_.name) === Seq("A", "B"))
    assert(g.nodeTypes === Seq(NodeTypeDef(Seq("A", "B"))))
    assert(g.relTypes.size === 1)
    assert(g.nodeMappings.size === 1 && g.relMappings.size === 1)
  }

  test("old bracket-only syntax is rejected") {
    intercept[IllegalArgumentException](parseGraphType(
      """CREATE GRAPH TYPE mySchema (
        |  (A),
        |  [FOO]
        |)""".stripMargin))
  }

  // ------------------------------------------------- end-to-end build
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("typed DDL builds a queryable graph: inheritance, JOIN ON, NOT NULL") {
    val s = spark
    import s.implicits._
    Seq((1L, "Ann"), (2L, "Ben")).toDF("id", "name")
      .createOrReplaceTempView("persons_v")
    Seq((10L, "Acme")).toDF("id", "org_name")
      .createOrReplaceTempView("orgs_v")
    Seq((1L, 10L, 2020L), (2L, 10L, 2021L)).toDF("p", "o", "since")
      .createOrReplaceTempView("works_v")

    val graphs = TypedGraphDdl.createGraphs(spark,
      """|CREATE ELEMENT TYPE Entity ( name STRING? )
         |CREATE ELEMENT TYPE Person EXTENDS Entity ()
         |CREATE ELEMENT TYPE Org ( org_name STRING )
         |CREATE ELEMENT TYPE WORKS_AT ( since INTEGER )
         |
         |CREATE GRAPH TYPE hr (
         |  (Person), (Org),
         |  (Person)-[WORKS_AT]->(Org)
         |)
         |CREATE GRAPH work OF hr (
         |  (Person) FROM persons_v,
         |  (Org)    FROM orgs_v,
         |  (Person)-[WORKS_AT]->(Org) FROM works_v e
         |    START NODES (Person) FROM persons_v n JOIN ON e.p = n.id
         |    END   NODES (Org)    FROM orgs_v   n JOIN ON e.o = n.id
         |)""".stripMargin)
    val g = graphs("work")
    // inheritance: Person nodes carry the Entity label too
    assert(g.allLabels === Set("Entity", "Person", "Org"))
    val gs = GraftSession(spark)
    val rows = gs.cypher(g,
      """MATCH (p:Person)-[w:WORKS_AT]->(o:Org)
        |RETURN p.name AS pn, o.org_name AS on, w.since AS y
        |ORDER BY pn""".stripMargin).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      === Seq(("Ann", "Acme", 2020L), ("Ben", "Acme", 2021L)))
    // the Entity parent label is queryable
    assert(gs.cypher(g, "MATCH (e:Entity) RETURN count(*) AS n")
      .head.getLong(0) === 2L)
  }

  test("NOT NULL property constraint is enforced at build time") {
    val s = spark
    import s.implicits._
    Seq((1L, Some("x")), (2L, Option.empty[String])).toDF("id", "org_name")
      .createOrReplaceTempView("orgs_nulls_v")
    val ex = intercept[IllegalArgumentException] {
      TypedGraphDdl.createGraphs(spark,
        """|CREATE ELEMENT TYPE Org ( org_name STRING )
           |CREATE GRAPH g1 ( (Org) FROM orgs_nulls_v )""".stripMargin)
    }
    assert(ex.getMessage.contains("NOT NULL"))
    // nullable declaration accepts the same data
    val ok = TypedGraphDdl.createGraphs(spark,
      """|CREATE ELEMENT TYPE Org ( org_name STRING? )
         |CREATE GRAPH g2 ( (Org) FROM orgs_nulls_v )""".stripMargin)
    assert(ok("g2").nodeTables.head.df.count() === 2L)
  }

  test("SET SCHEMA prefixes unqualified view names") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS ddl_sch")
    spark.sql("DROP TABLE IF EXISTS ddl_sch.things")
    // a prior JVM's managed-table directory blocks CREATE even after the
    // catalog forgot the table — clear the location too
    val warehouse = new java.io.File("spark-warehouse/ddl_sch.db/things")
    if (warehouse.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(warehouse)
    Seq((1L, "n1")).toDF("id", "name")
      .write.mode("overwrite").saveAsTable("ddl_sch.things")
    val g = TypedGraphDdl.createGraphs(spark,
      """|SET SCHEMA ds.ddl_sch
         |CREATE ELEMENT TYPE Thing ( name STRING )
         |CREATE GRAPH g3 ( (Thing) FROM things )""".stripMargin)
    assert(g("g3").nodeTables.head.df.count() === 1L)
  }
}
