package graft.tck

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.graph.PropertyGraph

/** Runs every `.feature` file under src/test/resources/features/ through
  * the engine — the openCypher TCK execution mechanism (CREATE fixture →
  * query → expected table / expected error), so official TCK scenario
  * files can be vendored verbatim when the artifact is available. The
  * files shipped here are hand-authored in the identical syntax.
  */
class FeatureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val gs = GraftSession(spark)
  private val graphCache =
    scala.collection.mutable.HashMap.empty[String, PropertyGraph]
  private def graphFor(create: String): PropertyGraph = synchronized {
    graphCache.getOrElseUpdate(create,
      if (create.trim.isEmpty)
        new PropertyGraph(Nil, Nil, spark)
      else gs.createGraphFromCypher(create))
  }

  // value rendering shared with expected-side parsing so both sides
  // canonicalize identically (mirrors TckStyleSpec.norm)
  private def norm(v: Any): Any = v match {
    case null => null
    case n: Byte => n.toLong
    case n: Short => n.toLong
    case n: Int => n.toLong
    case f: Float => f.toDouble
    case d: java.math.BigDecimal => d.doubleValue()
    case r: Row
        if r.schema != null &&
          r.schema.fieldNames.sameElements(Array("@k", "i", "f", "s", "b")) =>
      r.getAs[Int]("@k") match {
        case 1 => r.getAs[Long]("i")
        case 2 => r.getAs[Double]("f")
        case 3 => r.getAs[String]("s")
        case 4 => r.getAs[Boolean]("b")
        case _ => null
      }
    case r: Row => r.schema.fieldNames.zip(r.toSeq.map(norm)).toMap
    case m: Map[_, _] => m.map { case (k, x) => k.toString -> norm(x) }
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case a: Array[_] => a.map(norm).toList
    case other => other
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1)
      .map { case (k, x) => s"$k: ${render(x)}" }.mkString("{", ", ", "}")
    case s: List[_] => s.map(render).mkString("[", ", ", "]")
    case d: Double if d.isNaN || d.isInfinite => d.toString
    case d: Double =>
      BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    case other => other.toString
  }

  private def featureFiles: Seq[(String, String)] = {
    val dir = getClass.getResource("/features")
    if (dir == null) Seq.empty
    else {
      val d = new java.io.File(dir.toURI)
      d.listFiles().filter(_.getName.endsWith(".feature")).sortBy(_.getName)
        .map(f => f.getName ->
          scala.io.Source.fromFile(f, "UTF-8").mkString).toSeq
    }
  }

  private val scenarios = featureFiles.flatMap { case (fn, text) =>
    Gherkin.parseFile(text).map(fn -> _)
  }

  test("feature corpus loads and is non-empty") {
    assert(scenarios.nonEmpty, "no .feature files found")
    val dupes = scenarios.map(s => (s._2.feature, s._2.name))
      .groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate scenario names: $dupes")
  }

  scenarios.foreach { case (fn, sc) =>
    test(s"[$fn] ${sc.feature}: ${sc.name}") {
      val g = graphFor(sc.given)
      sc.expectError match {
        case Some(_) =>
          intercept[Throwable] { gs.cypher(g, sc.query, sc.params).collect() }
        case None =>
          val df = gs.cypher(g, sc.query, sc.params)
          // `Then the result should be empty` carries no table at all
          if (sc.columns.isEmpty)
            assert(df.collect().isEmpty, s"\nquery: ${sc.query}")
          else {
            val cols = df.columns.toSeq
            assert(cols.sorted === sc.columns.sorted,
              s"\nquery: ${sc.query}\ncolumn mismatch")
            // reorder actual to the table's column order, render both sides
            val order = sc.columns.map(cols.indexOf)
            val actual = df.collect().toSeq.map(r =>
              order.map(i => render(norm(r.get(i)))).mkString("|"))
            val expected = sc.rows.map(_.map(c =>
              render(norm(Gherkin.parseValue(c)))).mkString("|"))
            if (sc.ordered)
              assert(actual === expected, s"\nquery: ${sc.query}")
            else
              assert(actual.sorted === expected.sorted, s"\nquery: ${sc.query}")
          }
      }
    }
  }
}
