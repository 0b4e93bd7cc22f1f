package graft.interop

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.rdd.RDD

import graft.graph.PropertyGraph

/** Export to GraphX for iterative graph algorithms (PageRank, connected
  * components, …) — mirrors the reference's interop posture: GraphX is
  * NOT the engine (SURVEY §0), just an exit ramp
  * (morpheus-examples/.../GraphXPageRankExample.scala:63-69).
  *
  * Vertex attribute = label set; edge attribute = relationship type. The
  * conversion is two narrow RDD maps over the already-aligned element
  * tables — no shuffle beyond what GraphX itself does.
  */
object GraphXExport {

  def toGraphX(graph: PropertyGraph): XGraph[Set[String], String] = {
    val vertices: RDD[(Long, Set[String])] = graph.nodeTables.map { t =>
      val labels = t.labels
      t.df.select(t.idCol).rdd.map(r => (r.getLong(0), labels))
    }.reduce(_ union _)

    val edges: RDD[Edge[String]] = graph.relTables.map { t =>
      val tpe = t.relType
      t.df.select(t.srcCol, t.dstCol).rdd
        .map(r => Edge(r.getLong(0), r.getLong(1), tpe))
    }.reduce(_ union _)

    XGraph(vertices, edges)
  }

  /** PageRank over the property graph, back as a DataFrame (id, rank). */
  def pageRank(graph: PropertyGraph, tol: Double = 0.001)
      : org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    toGraphX(graph).pageRank(tol).vertices.toDF("id", "rank")
  }

  /** Per-vertex triangle counts (`graphx.lib.TriangleCount`) — the
    * clustering-coefficient building block. GraphX requires canonical
    * src<dst orientation and no self-loops/duplicates; normalized here so
    * callers can pass any property graph. Returns (id, triangles). */
  def triangleCount(graph: PropertyGraph): org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val g = toGraphX(graph)
      .subgraph(epred = e => e.srcId != e.dstId)
      .convertToCanonicalEdges()
    g.triangleCount().vertices.toDF("id", "triangles")
  }

  /** Strongly connected components (`graphx.lib.StronglyConnectedComponents`,
    * direction-respecting — unlike the near-dup clustering's undirected
    * components). Returns (id, component) with component = lowest vertex
    * id in the SCC. */
  def stronglyConnectedComponents(graph: PropertyGraph, numIter: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    org.apache.spark.graphx.lib.StronglyConnectedComponents
      .run(toGraphX(graph), numIter)
      .vertices.toDF("id", "component")
  }

  /** Community detection via label propagation
    * (`graphx.lib.LabelPropagation`, synchronous Pregel): each vertex
    * adopts its neighbors' most frequent community each round. Cheap and
    * fully distributed; communities are ids of some member vertex.
    * Returns (id, community). */
  def labelPropagation(graph: PropertyGraph, maxSteps: Int = 10)
      : org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    org.apache.spark.graphx.lib.LabelPropagation
      .run(toGraphX(graph), maxSteps)
      .vertices.toDF("id", "community")
  }

  /** Unbounded BFS shortest-path hop counts to landmark nodes via Pregel
    * (`graphx.lib.ShortestPaths`) — the scale path when the Cypher-level
    * `shortestPath()`'s bounded unroll would be too deep: each Pregel
    * round is one join-shaped shuffle and only frontier deltas
    * propagate, so depth costs rounds, not an exponential path union.
    * Returns (id, landmark, dist) rows for every vertex that reaches a
    * landmark following edge direction (or either way if `undirected`).
    */
  /** last BFS route chosen ("graphx"/"sql") — test-observable so the
    * route plumbing is lockable */
  @volatile private[graft] var lastBfsRoute: String = ""

  /** the engine the last call actually used: "sql" | "graphx" (differs
    * from [[lastBfsRoute]] under measured auto-routing) */
  @volatile private[graft] var lastBfsResolved: String = ""

  /** Route: `graft.bfs.route` = "auto" (default, round 9 — starts the
    * DataFrame-native frontier loop and escapes to Pregel if the frontier
    * saturates: by round 2 it already covers more than `escapeFrac` of
    * the edge-touching vertices, the high-fan-in regime where Pregel's
    * co-partitioned delta shipping beats per-round Catalyst planning),
    * "graphx" (force Pregel) or "sql" (force the fully DataFrame-native
    * BFS, [[shortestPathLengthsDf]] — AQE re-plans each round, no RDD
    * lineage, no GraphX dependency at runtime). Identical (id, landmark,
    * dist) rows on every route (PipelineSpec parity locks). */
  /** auto-route decisions memoized by the selected edge tables' SEMANTIC
    * HASHES + orientation (round 10, ADVICE: plan-object keys pinned
    * LocalRelation row data and session state; the Int digests hold no
    * references): the FIRST auto call pays the measured probe (SQL
    * frontier rounds 1-2); identical later calls — bench reps, retry
    * loops, per-landmark-batch pipelines over the same graph — go
    * straight to the measured winner instead of re-probing and, on
    * escape, discarding the probe rounds. The key deliberately OMITS the
    * landmark set: frontier-saturation is a property of the graph's
    * degree structure far more than of the seed set, so the first
    * landmark set's measured decision is reused for all later sets on
    * the same edge tables. A stale/collided/landmark-mismatched hit only
    * affects the route choice (both routes are exact). */
  private val bfsRouteCache =
    new java.util.LinkedHashMap[(Seq[Int], Boolean), String](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Seq[Int], Boolean), String]): Boolean =
        size > 64
    }

  def shortestPathLengths(graph: PropertyGraph, landmarks: Seq[Long],
      undirected: Boolean = false,
      relTypes: Set[String] = Set.empty): org.apache.spark.sql.DataFrame = {
    val route = graph.spark.conf.get("graft.bfs.route", "auto")
    lastBfsRoute = route
    route match {
      case "sql" =>
        lastBfsResolved = "sql"
        shortestPathLengthsDf(graph, landmarks, undirected, relTypes)
      case "graphx" =>
        lastBfsResolved = "graphx"
        shortestPathLengthsGraphX(graph, landmarks, undirected, relTypes)
      case _ =>
        val tables =
          if (relTypes.isEmpty) graph.relTables
          else graph.relTables.filter(t => relTypes.contains(t.relType))
        val key = (tables.map(_.df.queryExecution.analyzed.semanticHash()),
          undirected)
        bfsRouteCache.synchronized { Option(bfsRouteCache.get(key)) } match {
          case Some("sql") =>
            lastBfsResolved = "sql"
            shortestPathLengthsDf(graph, landmarks, undirected, relTypes)
          case Some(_) =>
            lastBfsResolved = "graphx"
            shortestPathLengthsGraphX(graph, landmarks, undirected, relTypes)
          case None =>
            bfsDf(graph, landmarks, undirected, relTypes,
                escapeDepth = 2, escapeFrac = 0.5) match {
              case Right(df) =>
                lastBfsResolved = "sql"
                bfsRouteCache.synchronized { bfsRouteCache.put(key, "sql") }
                df
              case Left((reached, frontier, depth, edges)) =>
                // SEED Pregel with the probe rounds' exact partial
                // distances (round 10, VERDICT item 5) instead of
                // restarting from the landmarks — the escape's first-call
                // cost drops by roughly the probe cost, exactly like
                // ccGraphXSeeded does for the CC escape.
                lastBfsResolved = "graphx"
                bfsRouteCache.synchronized { bfsRouteCache.put(key, "graphx") }
                shortestPathLengthsGraphXSeeded(graph, reached, edges)
            }
        }
    }
  }

  /** DataFrame-native BFS twin of [[shortestPathLengthsGraphX]]: a
    * per-depth frontier loop — join the frontier backward over the edge
    * list, dedupe, anti-join the reached set, checkpoint — exactly the
    * shape of the planner's deep var-length frontier (Planner.scala),
    * so the same scale arguments hold: one shuffle per depth, lineage
    * truncated per round, early exit on an empty frontier. Use when the
    * cluster bans RDD-based jobs or wants AQE skew handling per round;
    * GraphX still wins when the frontier revisits most vertices each
    * round (Pregel ships only CHANGED labels, the SQL loop re-shuffles
    * the whole frontier). */
  def shortestPathLengthsDf(graph: PropertyGraph, landmarks: Seq[Long],
      undirected: Boolean = false,
      relTypes: Set[String] = Set.empty): org.apache.spark.sql.DataFrame =
    bfsDf(graph, landmarks, undirected, relTypes,
      escapeDepth = 0, escapeFrac = 1.0)
      .getOrElse(throw new IllegalStateException("bfsDf escaped at depth 0"))

  /** Frontier-loop body. With `escapeDepth > 0` (measured auto-routing),
    * returns Left((reached, frontier, depth, edges)) when the frontier at
    * depth ≤ `escapeDepth` already covers more than `escapeFrac` of the
    * edge-touching vertices — the saturated-frontier regime Pregel
    * handles better; the partial state seeds the Pregel continuation so
    * the probe rounds are never discarded (`edges` stays checkpointed
    * for the continuation to consume and unpersist). */
  private def bfsDf(graph: PropertyGraph, landmarks: Seq[Long],
      undirected: Boolean, relTypes: Set[String],
      escapeDepth: Int, escapeFrac: Double)
      : Either[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Long, org.apache.spark.sql.DataFrame),
        org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val spark = graph.spark
    import spark.implicits._
    val tables =
      if (relTypes.isEmpty) graph.relTables
      else graph.relTables.filter(t => relTypes.contains(t.relType))
    require(tables.nonEmpty, s"no relationship tables match $relTypes")
    val edges0 = tables.map(t => t.df.select(
      t.df.col(t.srcCol).cast(LongType).as("s"),
      t.df.col(t.dstCol).cast(LongType).as("d"))).reduce(_ unionByName _)
    val edges = (if (undirected)
      edges0.union(edges0.select(col("d").as("s"), col("s").as("d")))
    else edges0).localCheckpoint(true)
    // GraphX ShortestPaths counts hops v → landmark ALONG edge
    // direction, so expansion walks edges BACKWARD from the reached set;
    // landmark vertices not present on any selected edge are omitted,
    // matching the Pregel result's vertex set
    val onEdges = edges.select(col("s").as("v"))
      .union(edges.select(col("d").as("v"))).distinct()
    val nV = if (escapeDepth > 0) math.max(1L, onEdges.count()) else 1L
    var reached = landmarks.toDF("landmark")
      .join(onEdges, col("landmark") === col("v"))
      .select(col("landmark").as("id"), col("landmark"),
        lit(0).cast(LongType).as("dist"))
      .localCheckpoint(true)
    var frontier = reached
    var depth = 0L
    var frontierSize = frontier.count()
    while (frontierSize > 0) {
      if (depth > 0 && depth <= escapeDepth &&
          frontierSize.toDouble / nV > escapeFrac) {
        return Left((reached, frontier, depth, edges))
      }
      depth += 1
      val next = edges
        .join(frontier.select(col("id").as("@d"), col("landmark")),
          col("d") === col("@d"))
        .select(col("s").as("id"), col("landmark")).distinct()
        .join(reached.select("id", "landmark"), Seq("id", "landmark"),
          "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint(true)
      reached = reached.union(next)
      frontier = next
      frontierSize = frontier.count()
    }
    edges.unpersist()
    Right(reached)
  }

  /** Pregel continuation of an escaped [[bfsDf]] run: vertices start from
    * the probe rounds' exact partial distance maps (everything at
    * dist ≤ `depth` is final BFS truth) and only the frontier keeps
    * expanding — min-merge Pregel over (landmark → dist) maps, messages
    * flowing dst → src like `graphx.lib.ShortestPaths` (hop counts TO the
    * landmarks along edge direction). Identical results to a fresh
    * ShortestPaths run (PipelineSpec parity): seeding with correct
    * partial minima cannot change a min fixpoint. */
  private def shortestPathLengthsGraphXSeeded(graph: PropertyGraph,
      reached: org.apache.spark.sql.DataFrame,
      edges: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    type SPMap = Map[Long, Long]
    def mergeMaps(a: SPMap, b: SPMap): SPMap =
      (a.keySet ++ b.keySet).iterator.map { k =>
        k -> math.min(a.getOrElse(k, Long.MaxValue),
          b.getOrElse(k, Long.MaxValue))
      }.toMap
    // seed attr: the exact (landmark → dist) entries found so far
    val seedRdd = reached.select("id", "landmark", "dist").rdd
      .map(r => (r.getLong(0), Map(r.getLong(1) -> r.getLong(2))))
      .reduceByKey(mergeMaps)
    // the SQL loop walked edges BACKWARD (s reaches landmark via d), so
    // Pregel messages flow dst → src with dst's map incremented
    val edgeRdd = edges.select("s", "d").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val g = XGraph(seedRdd, edgeRdd, Map.empty[Long, Long])
    val res = g.pregel(Map.empty[Long, Long])(
      (_, attr, msg) => mergeMaps(attr, msg),
      t => {
        val inc = t.dstAttr.map { case (k, v) => k -> (v + 1L) }
        if (mergeMaps(t.srcAttr, inc) != t.srcAttr) Iterator((t.srcId, inc))
        else Iterator.empty
      },
      mergeMaps)
    val out = res.vertices
      .flatMap { case (id, m) => m.map { case (lm, d) => (id, lm, d) } }
      .toDF("id", "landmark", "dist").localCheckpoint(true)
    g.unpersist(blocking = false)
    res.unpersist(blocking = false)
    edges.unpersist()
    out
  }

  def shortestPathLengthsGraphX(graph: PropertyGraph, landmarks: Seq[Long],
      undirected: Boolean = false,
      relTypes: Set[String] = Set.empty): org.apache.spark.sql.DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    // build from ONLY the selected relationship tables: node tables are
    // never scanned (vertices derive from edge endpoints), so a
    // type-restricted BFS over a 100 TB graph reads just the relevant
    // edge lists. Vertices on no selected edge are unreachable by
    // construction and are omitted from the result.
    val tables =
      if (relTypes.isEmpty) graph.relTables
      else graph.relTables.filter(t => relTypes.contains(t.relType))
    require(tables.nonEmpty, s"no relationship tables match $relTypes")
    val edges: RDD[Edge[String]] = tables.map { t =>
      val tpe = t.relType
      t.df.select(t.srcCol, t.dstCol).rdd
        .map(r => Edge(r.getLong(0), r.getLong(1), tpe))
    }.reduce(_ union _)
    val oriented =
      if (!undirected) edges
      else edges.union(edges.map(e => Edge(e.dstId, e.srcId, e.attr)))
    val g = XGraph.fromEdges(oriented, Set.empty[String])
    org.apache.spark.graphx.lib.ShortestPaths.run(g, landmarks)
      .vertices
      .flatMap { case (id, spMap) =>
        spMap.map { case (landmark, dist) => (id, landmark, dist.toLong) } }
      .toDF("id", "landmark", "dist")
  }
}
