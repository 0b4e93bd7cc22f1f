package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession
import graft.sources.TpchGraph

class CypherEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"
  lazy val gs = GraftSession(spark)
  lazy val g = TpchGraph.load(spark, dir)
  lazy val customer = spark.read.parquet(s"$dir/customer.parquet")
  lazy val orders = spark.read.parquet(s"$dir/orders.parquet")
  lazy val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

  test("node scan with label and filter") {
    val df = gs.cypher(g,
      "MATCH (c:Customer) WHERE c.c_acctbal > 9000.0 RETURN c.c_custkey AS k, c.c_name AS name")
    val expected = customer.where(col("c_acctbal") > 9000.0).count()
    assert(df.count() == expected)
    assert(df.columns.toSeq == Seq("k", "name"))
  }

  test("expand one hop matches FK join") {
    val df = gs.cypher(g,
      "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN c.c_custkey AS ck, o.o_orderkey AS ok")
    assert(df.count() == orders.count())
  }

  test("two-hop expand with rel properties") {
    val df = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)-[li:CONTAINS]->(p:Part)
        |WHERE li.l_quantity > 45.0
        |RETURN c.c_custkey AS ck, o.o_orderkey AS ok, p.p_partkey AS pk, li.l_quantity AS qty""".stripMargin)
    val expected = lineitem.where(col("l_quantity") > 45.0).count()
    assert(df.count() == expected)
  }

  test("aggregation with grouping") {
    val df = gs.cypher(g,
      "MATCH (o:Order) RETURN o.o_orderstatus AS st, count(*) AS n, sum(o.o_totalprice) AS total")
    val exp = orders.groupBy(col("o_orderstatus")).count().count()
    assert(df.count() == exp)
    val total = df.agg(sum(col("n"))).head.getLong(0)
    assert(total == orders.count())
  }

  test("global aggregation") {
    val df = gs.cypher(g, "MATCH (c:Customer) RETURN count(*) AS n, avg(c.c_acctbal) AS a")
    val row = df.head
    assert(row.getLong(0) == customer.count())
  }

  test("order by / skip / limit") {
    val df = gs.cypher(g,
      "MATCH (o:Order) RETURN o.o_orderkey AS k, o.o_totalprice AS p ORDER BY p DESC, k ASC SKIP 5 LIMIT 10")
    val exp = orders.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).slice(5, 15)
    assert(df.collect().map(_.getLong(0)).toSeq == exp.toSeq)
  }

  test("optional match keeps all lhs rows") {
    val df = gs.cypher(g,
      """MATCH (n:Nation) OPTIONAL MATCH (c:Customer)-[:IN_NATION]->(n)
        |RETURN n.n_name AS nation, count(c) AS members""".stripMargin)
    assert(df.count() == 25)
  }

  test("exists pattern predicate (semi-join)") {
    val df = gs.cypher(g,
      "MATCH (c:Customer) WHERE (c)-[:PLACED]->() RETURN c.c_custkey AS k")
    val expected = orders.select("o_custkey").distinct().count()
    assert(df.count() == expected)
  }

  test("negated pattern predicate (anti-join)") {
    val withO = orders.select("o_custkey").distinct().count()
    val df = gs.cypher(g,
      "MATCH (c:Customer) WHERE NOT (c)-[:PLACED]->() RETURN c.c_custkey AS k")
    assert(df.count() == customer.count() - withO)
  }

  test("var-length expand 1..2") {
    val df = gs.cypher(g,
      """MATCH (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
        |RETURN c.c_custkey AS k, x""".stripMargin)
    // each customer reaches exactly its nation (1 hop) and region (2 hops)
    assert(df.count() == 2 * customer.count())
  }

  test("undirected expand") {
    val df = gs.cypher(g,
      "MATCH (n:Nation)-[:IN_REGION]-(r:Region) RETURN n.n_name AS nn, r.r_name AS rn")
    assert(df.count() == 25)
  }

  test("unwind + params + with-chain") {
    val df = gs.cypher(g,
      """UNWIND $ks AS k
        |MATCH (c:Customer) WHERE c.c_custkey = k
        |WITH c.c_name AS name, k AS k ORDER BY k
        |RETURN k, name""".stripMargin,
      Map("ks" -> Seq(1L, 2L, 3L)))
    assert(df.count() == 3)
  }

  test("case expression + string functions") {
    val df = gs.cypher(g,
      """MATCH (r:Region)
        |RETURN r.r_name AS name, toLower(r.r_name) AS lo,
        |       CASE WHEN r.r_regionkey < 2 THEN 'low' ELSE 'high' END AS bucket""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getString(1) == r.getString(0).toLowerCase))
  }

  test("distinct projection") {
    val df = gs.cypher(g, "MATCH (o:Order) RETURN DISTINCT o.o_orderstatus AS st")
    assert(df.count() == orders.select("o_orderstatus").distinct().count())
  }

  test("union all and union distinct") {
    val all = gs.cypher(g,
      "MATCH (r:Region) RETURN r.r_name AS name UNION ALL MATCH (r:Region) RETURN r.r_name AS name")
    assert(all.count() == 10)
    val dist = gs.cypher(g,
      "MATCH (r:Region) RETURN r.r_name AS name UNION MATCH (r:Region) RETURN r.r_name AS name")
    assert(dist.count() == 5)
  }

  test("list expressions, comprehension, reduce") {
    val df = gs.cypher(g,
      """RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS evens,
        |       reduce(acc = 0, x IN [1,2,3] | acc + x) AS total,
        |       size([1,2,3]) AS sz, head([7,8]) AS h, last([7,8]) AS l""".stripMargin)
    val r = df.head
    assert(r.getSeq[Long](0) == Seq(20L, 40L))
    assert(r.getLong(1) == 6L)
    assert(r.getLong(2) == 3L)
    assert(r.getLong(3) == 7L && r.getLong(4) == 8L)
  }

  test("expand into (cycle-free bound-endpoints join)") {
    val df = gs.cypher(g,
      """MATCH (c:Customer)-[:IN_NATION]->(n:Nation), (c)-[:PLACED]->(o:Order)
        |RETURN count(*) AS n""".stripMargin)
    assert(df.head.getLong(0) == orders.count())
  }

  test("labels/id/type/keys functions") {
    val df = gs.cypher(g,
      "MATCH (n:Nation)-[r:IN_REGION]->() RETURN labels(n) AS ls, type(r) AS t LIMIT 1")
    val row = df.head
    assert(row.getSeq[String](0) == Seq("Nation"))
    assert(row.getString(1) == "IN_REGION")
  }

  test("map projection with props, overrides, and .*") {
    val df = gs.cypher(g,
      """MATCH (n:Nation) WHERE n.n_name = 'NATION_0'
        |RETURN n {.n_name, lowered: toLower(n.n_name), nk: n.n_nationkey} AS m""".stripMargin)
    val m = df.head.getStruct(0)
    assert(m.getAs[String]("n_name") == "NATION_0")
    assert(m.getAs[String]("lowered") == "nation_0")
    val all = gs.cypher(g,
      "MATCH (r:Region) RETURN r {.*} AS m LIMIT 1").head.getStruct(0)
    assert(all.schema.fieldNames.contains("r_name"))
  }

  test("pattern comprehension collects per-row matches") {
    val df = gs.cypher(g,
      """MATCH (n:Nation)
        |RETURN n.n_name AS nn,
        |       size([(c:Customer)-[:IN_NATION]->(n) | c.c_custkey]) AS n_cust
        |ORDER BY nn""".stripMargin)
    val viaJoin = customer.groupBy(col("c_nationkey")).count().collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val nations = spark.read.parquet(s"$dir/nation.parquet").collect()
      .map(r => (r.getString(1), r.get(0).toString.toLong)).toMap
    df.collect().foreach { r =>
      val expect = viaJoin.getOrElse(nations(r.getString(0)), 0L)
      assert(r.getLong(1) === expect, r.getString(0))
    }
  }

  test("size(pattern) degree predicate in WHERE") {
    val df = gs.cypher(g,
      """MATCH (n:Nation) WHERE size((:Customer)-[:IN_NATION]->(n)) >= 1
        |RETURN count(*) AS nations""".stripMargin)
    val expected = customer.select("c_nationkey").distinct().count()
    assert(df.head.getLong(0) === expected)
  }

  test("EXISTS { MATCH ... WHERE ... } subquery form") {
    val df = gs.cypher(g,
      """MATCH (c:Customer)
        |WHERE EXISTS { MATCH (c)-[:PLACED]->(o:Order)
        |               WHERE o.o_totalprice > 100000.0 }
        |RETURN count(*) AS n""".stripMargin)
    val expected = orders.where(col("o_totalprice") > 100000.0)
      .select("o_custkey").distinct().count()
    assert(df.head.getLong(0) === expected)
  }

  test("pattern predicate as a value and in ORDER BY") {
    val df = gs.cypher(g,
      """MATCH (n:Nation)
        |RETURN n.n_name AS nn, exists((:Customer)-[:IN_NATION]->(n)) AS has_cust
        |ORDER BY size((:Customer)-[:IN_NATION]->(n)) DESC, nn
        |LIMIT 3""".stripMargin).collect()
    assert(df.length === 3)
    assert(df.forall(_.getBoolean(1)))
    // top-3 by customer count must match a direct aggregation
    val top = customer.groupBy(col("c_nationkey")).count()
      .orderBy(col("count").desc).limit(3)
      .collect().map(_.getLong(1)).toSet
    val topNames = gs.cypher(g,
      """MATCH (n:Nation)
        |RETURN size([(c:Customer)-[:IN_NATION]->(n) | c]) AS cnt
        |ORDER BY cnt DESC LIMIT 3""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(topNames === top)
  }

  test("scan of a nonexistent label yields empty records") {
    val df = gs.cypher(g, "MATCH (x:NoSuchLabel) RETURN count(*) AS n")
    assert(df.head.getLong(0) === 0L)
    assert(gs.cypher(g,
      "MATCH (x:NoSuchLabel)-[:PLACED]->(o:Order) RETURN id(o) AS i").count() === 0L)
  }

  test("keys over map literals; round with precision") {
    val r = gs.cypher(g,
      """RETURN keys({b: 1, a: 2}) AS ks, round(3.14159, 2) AS r2,
        |       round(2.5) AS r0""".stripMargin).head
    // round 9: map keys() preserves INSERTION order (reference
    // FunctionTests); entity keys stay sorted
    assert(r.getSeq[String](0) == Seq("b", "a"))
    assert(r.getDouble(1) === 3.14)
    assert(r.getDouble(2) === 3.0)
  }

  test("bitwise functions") {
    val r = gs.cypher(g,
      """RETURN bitwiseAnd(12, 10) AS a, bitwiseOr(12, 10) AS o,
        |       bitwiseXor(12, 10) AS x, shiftLeft(1, 4) AS sl,
        |       shiftRightUnsigned(-1, 56) AS sr""".stripMargin).head
    assert(r.getLong(0) === 8L && r.getLong(1) === 14L && r.getLong(2) === 6L)
    assert(r.getLong(3) === 16L && r.getLong(4) === 255L)
  }

  test("WITH * plus extra items keeps scope and adds bindings") {
    val df = gs.cypher(g,
      """MATCH (n:Nation)
        |WITH *, n.n_name AS nm
        |RETURN n.n_nationkey AS k, nm ORDER BY k LIMIT 2""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 2 && rows(0).getString(1) == "NATION_0")
  }

  test("var-length expand applies inline property map on every step") {
    // one-hop: must match exactly the lineitem rows with quantity 50
    val df1 = gs.cypher(g,
      """MATCH (o:Order)-[:CONTAINS*1..1 {l_quantity: 50.0}]->(p:Part)
        |RETURN o.o_orderkey AS ok""".stripMargin)
    val exp1 = lineitem.where(col("l_quantity") === 50.0).count()
    assert(df1.count() === exp1)

    // two-hop over CONTAINS then SUPPLIED_BY: both steps filtered
    val df2 = gs.cypher(g,
      """MATCH (o:Order)-[:CONTAINS|SUPPLIED_BY*2..2 {l_quantity: 50.0}]->(x)
        |RETURN o.o_orderkey AS ok""".stripMargin)
    val l1 = lineitem.where(col("l_quantity") === 50.0)
      .select(col("l_orderkey"), col("l_partkey"))
    val l2 = lineitem.where(col("l_quantity") === 50.0)
      .select(col("l_partkey").as("pk2"), col("l_suppkey"))
    val exp2 = l1.join(l2, col("l_partkey") === col("pk2")).count()
    assert(df2.count() === exp2)
  }

  test("zero-length var-length binds dst with full properties") {
    val rows = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED*0..1]->(x)
        |WHERE c.c_custkey = 1
        |RETURN id(c) AS ci, id(x) AS xi, x.c_name AS xname
        |ORDER BY xi""".stripMargin).collect()
    // length-0 row: x = c with c's own properties present
    val self = rows.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.length === 1)
    assert(self.head.getString(2) != null)
  }

  test("temporal: month durations, ISO strings, date/timestamp arithmetic") {
    val r = gs.cypher(g,
      """RETURN date('2020-01-31') + duration({months: 1}) AS leap,
        |       date('2000-01-01') + duration('P1Y6M10D') AS iso,
        |       date('2020-03-15') - duration({days: 20}) AS back,
        |       localdatetime('2020-01-01T10:30:00') + duration({hours: 26}) AS ts,
        |       date({year: 2021, month: 7, day: 4}) AS made""".stripMargin).head
    assert(r.getDate(0).toString === "2020-02-29")
    assert(r.getDate(1).toString === "2001-07-11")
    assert(r.getDate(2).toString === "2020-02-24")
    // localdatetime is TIMESTAMP_NTZ: collects as java.time.LocalDateTime
    assert(r.getAs[java.time.LocalDateTime](3).toString
      .startsWith("2020-01-02T12:30"))
    assert(r.getDate(4).toString === "2021-07-04")
  }

  test("temporal: property-style accessors on dates, timestamps, durations") {
    val r = gs.cypher(g,
      """WITH date('2021-03-15') AS d,
        |     localdatetime('2021-03-15T13:45:30') AS ts,
        |     duration({days: 3, hours: 5, minutes: 7}) AS dur
        |RETURN d.year AS y, d.month AS m, d.day AS dom, d.quarter AS q,
        |       d.week AS w, d.dayOfWeek AS dow, d.ordinalDay AS od,
        |       ts.hour AS h, ts.minute AS mi, ts.second AS sec,
        |       dur.days AS dd, dur.hours AS dh, dur.minutes AS dm""".stripMargin).head
    assert(r.getLong(0) === 2021L && r.getLong(1) === 3L && r.getLong(2) === 15L)
    assert(r.getLong(3) === 1L) // Q1
    assert(r.getLong(4) === 11L) // ISO week 11
    assert(r.getLong(5) === 1L) // 2021-03-15 is a Monday
    assert(r.getLong(6) === 74L)
    assert(r.getLong(7) === 13L && r.getLong(8) === 45L && r.getLong(9) === 30L)
    // duration time accessors are cumulative over the sub-day remainder
    // (reference TemporalUdfs.scala:131): .minutes = 5h7m in minutes
    assert(r.getLong(10) === 3L && r.getLong(11) === 5L && r.getLong(12) === 307L)
  }

  test("durations are summable but NOT orderable (Neo4j: month lengths vary)") {
    val r = gs.cypher(g,
      """WITH duration({days: 1, hours: 2}) AS a, duration('PT3H') AS b
        |RETURN a > b AS cmp, a + b AS total, a = a AS eq""".stripMargin).head
    assert(r.isNullAt(0)) // ordering durations yields null, not a sort
    assert(r.get(1) != null)
    assert(r.getBoolean(2)) // equality stays component-wise
  }

  test("OPTIONAL MATCH as first clause yields one null row when empty") {
    val rows = gs.cypher(g,
      "OPTIONAL MATCH (n:NoSuchLabel) RETURN n").collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(0))
  }

  test("ORDER BY un-aliased aggregate and hidden aggregate") {
    val rows = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS ck, count(*)
        |ORDER BY count(*) DESC, ck ASC LIMIT 3""".stripMargin).collect()
    val exp = orders.groupBy(col("o_custkey")).count()
      .orderBy(col("count").desc, col("o_custkey").asc)
      .limit(3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === exp.toSeq)

    // aggregate in ORDER BY that is not projected → hidden sort column
    val rows2 = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |RETURN c.c_custkey AS ck, count(*) AS n
        |ORDER BY sum(o.o_totalprice) DESC LIMIT 3""".stripMargin).collect()
    val exp2 = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("s"))
      .orderBy(col("s").desc).limit(3).collect().map(_.getLong(0))
    assert(rows2.map(_.getLong(0)).toSeq === exp2.toSeq)
    assert(rows2.head.schema.fieldNames.toSeq === Seq("ck", "n"))
  }

  test("sketch aggregates: approxCountDistinct and percentileApprox") {
    val row = gs.cypher(g,
      """MATCH (c:Customer)
        |RETURN approxCountDistinct(c.c_nationkey) AS apx,
        |       count(DISTINCT c.c_nationkey) AS exact,
        |       percentileApprox(c.c_acctbal, 0.5) AS med_apx,
        |       percentileCont(c.c_acctbal, 0.5) AS med""".stripMargin).head
    val (apx, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(apx - exact).toDouble / exact < 0.1)
    // percentile_approx default accuracy is within ~1 rank of exact here
    assert(math.abs(row.getDouble(2) - row.getDouble(3)) <
      0.05 * math.abs(row.getDouble(3)).max(1.0))
  }

  test("driving table binds columns as variables") {
    import spark.implicits._
    val drive = Seq((1L, "a"), (3L, "b"), (9999L, "c"))
      .toDF("want_key", "tag")
    val df = gs.cypher(g,
      """MATCH (c:Customer) WHERE c.c_custkey = want_key
        |RETURN want_key, tag, c.c_name AS name ORDER BY want_key""".stripMargin,
      Map.empty, drive)
    val rows = df.collect()
    // 9999 has no matching customer at sf0.001 → row drops (plain MATCH)
    val present = customer.where(col("c_custkey").isin(1L, 3L, 9999L))
      .select("c_custkey").as[Long].collect().toSet
    assert(rows.map(_.getLong(0)).toSeq ===
      Seq(1L, 3L, 9999L).filter(present))
    assert(df.columns.toSeq === Seq("want_key", "tag", "name"))

    // OPTIONAL MATCH keeps non-matching driving rows with nulls
    val opt = gs.cypher(g,
      """OPTIONAL MATCH (c:Customer) WHERE c.c_custkey = want_key
        |RETURN want_key, c.c_name AS name ORDER BY want_key""".stripMargin,
      Map.empty, drive).collect()
    assert(opt.length == 3)
    assert(opt.count(_.isNullAt(1)) == 3 - present.size)

    // driving rows survive aggregation and UNWIND composition
    val agg = gs.cypher(g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE c.c_custkey = want_key
        |RETURN want_key, count(*) AS n ORDER BY want_key""".stripMargin,
      Map.empty, drive).collect()
    val expN = orders.where(col("o_custkey").isin(1L, 3L))
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg.map(r => r.getLong(0) -> r.getLong(1)).toMap === expN)
  }
}
