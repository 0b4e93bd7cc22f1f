package graft.graph

import org.apache.spark.sql.types.DataType

/** Static schema of a [[PropertyGraph]] — the role of the reference's
  * `PropertyGraph.schema` / `PropertyGraphSchema`
  * (okapi-api PropertyGraph.scala:52, PropertyGraphSchema.scala:85-180),
  * re-derived over Spark types: label combinations, per-combination and
  * per-relationship-type property keys with their (lattice-normalized)
  * Spark types, implied labels, and declared schema patterns. Derivation
  * is pure schema analysis — no job runs.
  */
case class GraphSchema(
    labelCombinations: Set[Set[String]],
    relationshipTypes: Set[String],
    nodeProps: Map[Set[String], Map[String, DataType]],
    relProps: Map[String, Map[String, DataType]],
    explicitSchemaPatterns: Set[SchemaPattern]) {

  def labels: Set[String] = labelCombinations.flatten

  /** combinations a node with (at least) `knownLabels` can have. */
  def combinationsFor(knownLabels: Set[String]): Set[Set[String]] =
    labelCombinations.filter(knownLabels.subsetOf(_))

  /** labels a node with `knownLabels` MUST have: the intersection of
    * every combination containing them (reference impliedLabels). */
  def impliedLabels(knownLabels: Set[String]): Set[String] = {
    val combos = combinationsFor(knownLabels)
    if (combos.isEmpty) knownLabels
    else combos.reduce(_ intersect _)
  }

  /** property keys + types for one exact label combination. */
  def nodePropertyKeys(labelCombination: Set[String]): Map[String, DataType] =
    nodeProps.getOrElse(labelCombination, Map.empty)

  /** property keys across every combination containing `knownLabels`,
    * conflicting types joined through the widening lattice. */
  def nodePropertyKeysForCombinations(
      combos: Set[Set[String]]): Map[String, DataType] =
    combos.toSeq.flatMap(c => nodeProps.getOrElse(c, Map.empty).toSeq)
      .groupBy(_._1).map { case (k, ts) =>
        k -> ts.map(_._2).reduce(SparkTypes.widen) }

  def nodePropertyKeyType(knownLabels: Set[String],
      key: String): Option[DataType] = {
    val ts = combinationsFor(knownLabels).toSeq
      .flatMap(c => nodeProps.getOrElse(c, Map.empty).get(key))
    if (ts.isEmpty) None else Some(ts.reduce(SparkTypes.widen))
  }

  def relationshipPropertyKeys(relType: String): Map[String, DataType] =
    relProps.getOrElse(relType, Map.empty)

  /** declared patterns, or — reference behavior when none are declared —
    * every (combination, relType, combination) cross product. */
  def schemaPatterns: Set[SchemaPattern] =
    if (explicitSchemaPatterns.nonEmpty) explicitSchemaPatterns
    else for {
      s <- labelCombinations; t <- relationshipTypes; d <- labelCombinations
    } yield SchemaPattern(s, t, d)

  /** printable summary (the reference Schema's toString role). */
  def pretty: String = {
    val nodes = nodeProps.toSeq.sortBy(_._1.toSeq.sorted.mkString(":"))
      .map { case (ls, ps) =>
        val l = if (ls.isEmpty) "()" else ls.toSeq.sorted.mkString(":", ":", "")
        val p = ps.toSeq.sortBy(_._1)
          .map { case (k, t) => s"$k: ${t.simpleString}" }.mkString(", ")
        s"  ($l { $p })"
      }
    val rels = relProps.toSeq.sortBy(_._1).map { case (t, ps) =>
      val p = ps.toSeq.sortBy(_._1)
        .map { case (k, ty) => s"$k: ${ty.simpleString}" }.mkString(", ")
      s"  [:$t { $p }]"
    }
    (Seq("nodes:") ++ nodes ++ Seq("relationships:") ++ rels).mkString("\n")
  }
}
