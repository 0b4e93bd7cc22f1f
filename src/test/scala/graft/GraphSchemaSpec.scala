package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.{GraphSchema, NodeTable, PropertyGraph, RelTable, SchemaPattern}

/** Schema API parity (reference: PropertyGraph.schema,
  * PropertyGraphSchema.scala:85-180 behaviors re-checked over Spark
  * types). */
class GraphSchemaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false").getOrCreate()
  lazy val gs = GraftSession(spark)

  private def graph: PropertyGraph = {
    val s = spark
    import s.implicits._
    new PropertyGraph(
      Seq(
        NodeTable(Set("Person"), Seq((1L, "Ann", 30)).toDF("id", "name", "age"),
          "id", Map("name" -> "name", "age" -> "age")),
        NodeTable(Set("Person", "Admin"),
          Seq((2L, "Dave", 9.5)).toDF("id", "name", "score"),
          "id", Map("name" -> "name", "score" -> "score")),
        NodeTable(Set("Robot"), Seq((3L, 7L)).toDF("id", "serial"),
          "id", Map("serial" -> "serial"))),
      Seq(RelTable("KNOWS", Seq((10L, 1L, 2L, 2020)).toDF("rid", "s", "d", "since"),
        "rid", "s", "d", Map("since" -> "since"))),
      spark,
      schemaPatterns = Seq(SchemaPattern(Set("Person"), "KNOWS", Set("Person"))))
  }

  test("label combinations, labels, relationship types") {
    val sc = graph.schema
    assert(sc.labelCombinations ===
      Set(Set("Person"), Set("Person", "Admin"), Set("Robot")))
    assert(sc.labels === Set("Person", "Admin", "Robot"))
    assert(sc.relationshipTypes === Set("KNOWS"))
  }

  test("property keys normalize and widen per combination") {
    val sc = graph.schema
    assert(sc.nodePropertyKeys(Set("Person")) ===
      Map("name" -> StringType, "age" -> LongType)) // int normalized to long
    assert(sc.nodePropertyKeys(Set("Person", "Admin"))("score") === DoubleType)
    assert(sc.relationshipPropertyKeys("KNOWS") === Map("since" -> LongType))
    assert(sc.nodePropertyKeys(Set("NoSuch")) === Map.empty)
  }

  test("combinationsFor and impliedLabels") {
    val sc = graph.schema
    assert(sc.combinationsFor(Set("Person")) ===
      Set(Set("Person"), Set("Person", "Admin")))
    assert(sc.combinationsFor(Set("Admin")) === Set(Set("Person", "Admin")))
    // every Admin combination carries Person → Admin implies Person
    assert(sc.impliedLabels(Set("Admin")) === Set("Person", "Admin"))
    assert(sc.impliedLabels(Set("Person")) === Set("Person"))
  }

  test("property key types join across combinations") {
    val sc = graph.schema
    // name is string everywhere; age appears only on bare Person
    assert(sc.nodePropertyKeyType(Set("Person"), "name") === Some(StringType))
    assert(sc.nodePropertyKeyType(Set("Person"), "age") === Some(LongType))
    assert(sc.nodePropertyKeyType(Set("Robot"), "age") === None)
    val all = sc.nodePropertyKeysForCombinations(sc.combinationsFor(Set("Person")))
    assert(all.keySet === Set("name", "age", "score"))
  }

  test("explicit schema patterns win; none declared → cross product") {
    val sc = graph.schema
    assert(sc.schemaPatterns ===
      Set(SchemaPattern(Set("Person"), "KNOWS", Set("Person"))))
    val bare = GraphSchema(Set(Set("A"), Set("B")), Set("T"),
      Map.empty, Map.empty, Set.empty)
    assert(bare.schemaPatterns.size === 4)
  }

  test("pretty renders a readable summary") {
    val p = graph.schema.pretty
    assert(p.contains(":Admin:Person") && p.contains("[:KNOWS"))
    assert(p.contains("age: bigint") && p.contains("score: double"))
  }

  test("graph-level cypher entry point (reference PropertyGraph.cypher)") {
    val g = gs.createGraphFromCypher(
      "CREATE (:P {v: 1})-[:R]->(:P {v: 2})")
    val rows = g.cypher("MATCH (a:P)-[:R]->(b:P) RETURN b.v AS v").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
    assert(g.cypher("MATCH (x:P) WHERE x.v > $lo RETURN count(*) AS n",
      Map("lo" -> 1)).head.getLong(0) === 1L)
  }

  test("typed DDL graphs declare their graph type's schema patterns") {
    val s = spark
    import s.implicits._
    Seq((1L, "n")).toDF("id", "name").createOrReplaceTempView("sp_people")
    Seq((1L, 1L)).toDF("a", "b").createOrReplaceTempView("sp_knows")
    val g = graft.sources.TypedGraphDdl.createGraphs(spark,
      """CREATE ELEMENT TYPE Person ( name STRING )
        |CREATE ELEMENT TYPE KNOWS ()
        |CREATE GRAPH TYPE t ( (Person), (Person)-[KNOWS]->(Person) )
        |CREATE GRAPH spg OF t (
        |  (Person) FROM sp_people,
        |  (Person)-[KNOWS]->(Person) FROM sp_knows e
        |    START NODES (Person) FROM sp_people n JOIN ON e.a = n.id
        |    END   NODES (Person) FROM sp_people n JOIN ON e.b = n.id
        |)""".stripMargin)("spg")
    assert(g.schema.explicitSchemaPatterns ===
      Set(graft.graph.SchemaPattern(Set("Person"), "KNOWS", Set("Person"))))
  }

  test("schema of a CREATE-fixture graph") {
    val g = gs.createGraphFromCypher(
      "CREATE (:P {v: 1})-[:R {w: 1.5}]->(:Q {s: 'x'})")
    val sc = g.schema
    assert(sc.labelCombinations === Set(Set("P"), Set("Q")))
    assert(sc.nodePropertyKeys(Set("P"))("v") === LongType)
    assert(sc.relationshipPropertyKeys("R")("w") === DoubleType)
  }
}
