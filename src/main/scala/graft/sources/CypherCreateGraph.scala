package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.cypher.CypherParser
import graft.cypher.Ast._
import graft.graph.{NodeTable, PropertyGraph, RelTable, SchemaPattern, SparkTypes}

/** Builds an in-memory [[PropertyGraph]] from openCypher `CREATE`
  * statements — the fixture format of the openCypher TCK (the reference
  * builds its TCK graphs the same way: okapi-testing
  * CreateGraphFactory/CreateQueryParser). Property values must be
  * literals; variables are shared across statements, so
  * `CREATE (a:A) CREATE (a)-[:R]->(b:B)` wires one edge between two nodes.
  *
  * Data lands as one DataFrame per label combination / relationship type
  * (the engine's ScanGraph layout) with schema inferred through the same
  * type lattice the scans use — so fixture graphs behave exactly like
  * source-loaded ones.
  */
object CypherCreateGraph {

  def apply(spark: SparkSession, createText: String): PropertyGraph = {
    if (createText.trim.isEmpty)
      return new PropertyGraph(Seq.empty, Seq.empty, spark)
    val pattern = CypherParser.parseCreate(createText)

    // ---- walk the parts, assigning ids
    case class Node(id: Long, var labels: Set[String],
        props: scala.collection.mutable.LinkedHashMap[String, Any])
    val byVar = scala.collection.mutable.LinkedHashMap.empty[String, Node]
    val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
    val rels = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String, Map[String, Any])]
    var nextNodeId = 0L
    var nextRelId = 1L << 40 // disjoint from node ids

    def bindNode(np: NodePattern): Node = {
      val existing = np.variable.flatMap(byVar.get)
      existing match {
        case Some(n) =>
          n.labels ++= np.labels
          np.properties.foreach { case (k, e) => n.props(k) = literal(e) }
          n
        case None =>
          nextNodeId += 1
          val n = Node(nextNodeId, np.labels.toSet,
            scala.collection.mutable.LinkedHashMap(
              np.properties.map { case (k, e) => k -> literal(e) }: _*))
          np.variable.foreach(v => byVar(v) = n)
          nodes += n
          n
      }
    }

    pattern.parts.foreach { part =>
      var prev = bindNode(part.start)
      part.chain.foreach { case (rel, nodePat) =>
        require(rel.varLength.isEmpty, "CREATE cannot use var-length patterns")
        require(rel.types.size == 1,
          s"CREATE relationship needs exactly one type, got ${rel.types}")
        require(rel.direction != Undirected,
          "CREATE relationships must be directed")
        val next = bindNode(nodePat)
        val (src, dst) = rel.direction match {
          case Incoming => (next.id, prev.id)
          case _ => (prev.id, next.id)
        }
        nextRelId += 1
        rels += ((nextRelId, src, dst, rel.types.head,
          rel.properties.map { case (k, e) => k -> literal(e) }.toMap))
        prev = next
      }
    }

    // ---- node tables: one per label combination
    val nodeTables = nodes.groupBy(_.labels).toSeq
      .sortBy(_._1.toSeq.sorted.mkString(","))
      .map { case (labels, ns) =>
        val keys = ns.flatMap(_.props.keys).distinct.sorted.toList
        val schema = StructType(StructField("_gid", LongType, nullable = false) +:
          keys.map(k => StructField(s"_p_$k",
            inferType(ns.flatMap(_.props.get(k)).toSeq), nullable = true)))
        val rows = ns.map { n =>
          Row.fromSeq(n.id +: keys.map(k =>
            convert(n.props.get(k).orNull,
              schema(s"_p_$k").dataType)))
        }
        NodeTable(labels, spark.createDataFrame(rows.asJava, schema),
          "_gid", keys.map(k => k -> s"_p_$k").toMap)
      }

    // ---- rel tables: one per type
    val relTables = rels.groupBy(_._4).toSeq.sortBy(_._1).map { case (tpe, rs) =>
      val keys = rs.flatMap(_._5.keys).distinct.sorted.toList
      val schema = StructType(Seq(
        StructField("_gid", LongType, nullable = false),
        StructField("_src", LongType, nullable = false),
        StructField("_dst", LongType, nullable = false)) ++
        keys.map(k => StructField(s"_p_$k",
          inferType(rs.flatMap(_._5.get(k)).toSeq), nullable = true)))
      val rows = rs.map { case (id, src, dst, _, props) =>
        Row.fromSeq(Seq(id, src, dst) ++ keys.map(k =>
          convert(props.get(k).orNull, schema(s"_p_$k").dataType)))
      }
      RelTable(tpe, spark.createDataFrame(rows.asJava, schema),
        "_gid", "_src", "_dst", keys.map(k => k -> s"_p_$k").toMap)
    }

    // ---- schema patterns: exact, derived driver-side from the CREATE
    // statements themselves (each rel's endpoint label combos are known
    // here — no Spark job). Planners use them to prune unlabeled expand
    // targets and path node-value lookups to reachable node tables.
    val nodeById = nodes.map(n => n.id -> n.labels).toMap
    val patterns = rels.map { case (_, src, dst, tpe, _) =>
      SchemaPattern(nodeById(src), tpe, nodeById(dst))
    }.distinct.sortBy(p => (p.relType,
      p.srcLabels.toSeq.sorted.mkString(","),
      p.dstLabels.toSeq.sorted.mkString(",")))

    new PropertyGraph(nodeTables, relTables, spark,
      schemaPatterns = patterns.toSeq)
  }

  /** literal evaluator for CREATE property values. */
  private def literal(e: Expr): Any = e match {
    case IntLit(v) => v
    case FloatLit(v) => v
    case StringLit(v) => v
    case BoolLit(v) => v
    case NullLit => null
    case ListLit(items) => items.map(literal)
    // sorted keys: a deterministic StructType regardless of written order,
    // so equal-shaped maps across rows widen to the same type
    case MapLit(items) => scala.collection.immutable.ListMap(
      items.map { case (k, e) => k -> literal(e) }.sortBy(_._1): _*)
    case Neg(IntLit(v)) => -v
    case Neg(FloatLit(v)) => -v
    // temporal constructors over literal strings — fixtures carrying
    // date-typed properties (TCK temporal scenarios, sink round-trips)
    case Func("date", _, List(StringLit(s))) => java.sql.Date.valueOf(s)
    case Func("localdatetime", _, List(StringLit(s))) =>
      java.time.LocalDateTime.parse(s)
    // zoned datetime: the engine's struct encoding ({@zdt instant, off,
    // zid} — see ExprCompiler zonedDtFields) so fixture-stored datetimes
    // flow through accessors/comparisons/arithmetic unchanged
    case Func("datetime", _, List(StringLit(s))) =>
      val (inst, off, zid) =
        graft.plans.ExprCompiler.parseIsoZonedDatetime(s)
      scala.collection.immutable.ListMap(
        "@zdt" -> java.sql.Timestamp.from(inst), "off" -> off,
        "zid" -> zid)
    // TIME/LOCALTIME use the engine's struct encoding ({"@lt": micros} /
    // {"@zt": utc micros, "off": offset sec} — see ExprCompiler): a
    // ListMap here widens to exactly that struct, so fixture-stored
    // times flow through accessors/comparisons/toString unchanged
    case Func("localtime", _, List(StringLit(s))) =>
      scala.collection.immutable.ListMap(
        "@lt" -> graft.plans.ExprCompiler.parseIsoTime(s)._1)
    case Func("time", _, List(StringLit(s))) =>
      val (mic, off) = graft.plans.ExprCompiler.parseIsoTime(s)
      val o = off.getOrElse(0)
      scala.collection.immutable.ListMap(
        "@zt" -> java.lang.Math.floorMod(mic - o * 1000000L, 86400000000L),
        "off" -> o)
    // durations: the CalendarInterval triple, exactly the engine's
    // duration({...}) columnar value
    case Func("duration", _, List(MapLit(items))) =>
      val m = items.toMap
      val bad = m.keySet -- graft.plans.ExprCompiler.durationComponents
      if (bad.nonEmpty) throw new IllegalArgumentException(
        s"unknown duration component(s): ${bad.toSeq.sorted.mkString(", ")} " +
          "(supported: " +
          graft.plans.ExprCompiler.durationComponents.toSeq.sorted
            .mkString(", ") + ")")
      def num(k: String): Double = m.get(k).map(literal).map {
        case l: Long => l.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"duration component $k must be numeric, got $other")
      }.getOrElse(0.0)
      new org.apache.spark.unsafe.types.CalendarInterval(
        (num("years") * 12 + num("quarters") * 3 + num("months")).toInt,
        (num("weeks") * 7 + num("days")).toInt,
        ((num("hours") * 3600 + num("minutes") * 60 + num("seconds")) *
          1000000L).toLong +
          (num("milliseconds") * 1000L).toLong +
          num("microseconds").toLong +
          (num("nanoseconds") / 1000L).toLong)
    // point (round 8): the engine's {@crs, px, py} struct encoding so
    // fixture-stored points flow through accessors/equality/distance()
    case Func("point", _, List(MapLit(items))) =>
      val m = items.toMap
      if (m.keySet.exists(k => k == "z" || k == "height"))
        throw new IllegalArgumentException(
          "3D points are not supported (z/height)")
      def num(k: String): Double = m.get(k).map(literal).map {
        case l: Long => l.toDouble
        case d: Double => d
        case other => throw new IllegalArgumentException(
          s"point component $k must be numeric, got $other")
      }.getOrElse(throw new IllegalArgumentException(
        s"point() fixture literal needs component $k"))
      if (m.contains("latitude")) {
        val lat = num("latitude")
        require(math.abs(lat) <= 90.0,
          "point() latitude must be in [-90, 90]")
        scala.collection.immutable.ListMap(
          "@crs" -> "wgs-84", "px" -> num("longitude"), "py" -> lat)
      } else {
        val crs = m.get("crs") match {
          case Some(StringLit(c)) => c
          case None => "cartesian"
          case Some(other) => throw new IllegalArgumentException(
            s"point() crs must be a literal string, got $other")
        }
        require(crs == "cartesian" || crs == "wgs-84",
          s"point() crs must be 'cartesian' or 'wgs-84', got '$crs'")
        scala.collection.immutable.ListMap(
          "@crs" -> crs, "px" -> num("x"), "py" -> num("y"))
      }
    case other => throw new IllegalArgumentException(
      s"CREATE property values must be literals, got $other")
  }

  private def typeOfValue(v: Any): DataType = v match {
    case null => NullType
    case _: Long => LongType
    case _: Int => IntegerType // time-struct offset field
    case _: Double => DoubleType
    case _: String => StringType
    case _: Boolean => BooleanType
    case _: java.sql.Date => DateType
    case _: java.sql.Timestamp => TimestampType // zoned-datetime @zdt field
    case _: java.time.LocalDateTime => TimestampNTZType
    case _: org.apache.spark.unsafe.types.CalendarInterval =>
      CalendarIntervalType
    case s: Seq[_] =>
      ArrayType(s.map(typeOfValue).reduceOption(SparkTypes.widen)
        .getOrElse(NullType))
    case m: Map[_, _] => StructType(m.toSeq.map { case (k, x) =>
      StructField(k.toString, typeOfValue(x)) })
    case other => throw new IllegalArgumentException(
      s"unsupported CREATE literal: $other (${other.getClass})")
  }

  private def inferType(values: Seq[Any]): DataType = {
    val t = values.map(typeOfValue).reduceOption(SparkTypes.widen)
      .getOrElse(NullType)
    if (t == NullType) StringType
    else t match { case ArrayType(NullType, n) => ArrayType(StringType, n); case x => x }
  }

  /** align a literal to the widened column type (Long → Double, anything
    * → String when the lattice fell back to StringType — without the
    * string case a mixed-type property key, legal in a TCK fixture,
    * places a Long in a StringType column and crashes at evaluation). */
  private def convert(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (l: Long, DoubleType) => l.toDouble
    case (s: Seq[_], ArrayType(et, _)) => s.map(convert(_, et))
    case (m: Map[_, _], st: StructType) =>
      val mm = m.asInstanceOf[Map[String, Any]]
      Row.fromSeq(st.fields.toSeq.map(f =>
        convert(mm.getOrElse(f.name, null), f.dataType)))
    case (x, StringType) if !x.isInstanceOf[String] => x.toString
    case (x, _) => x
  }
}
