package graft.api

import scala.annotation.StaticAnnotation
import scala.reflect.runtime.universe._

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.graph.{NodeTable, PropertyGraph, RelTable, SparkTypes}

/** Case-class graph elements: build a [[PropertyGraph]] straight from
  * `Seq`s (or `Dataset`s) of plain case classes, no manual table wiring.
  *
  * Conventions (reference semantics: morpheus-spark-cypher
  * api/io/GraphElement.scala:34-90, MorpheusSession.scala:77-86):
  *   - a node class extends [[GraphNode]] and has an `id: Long` field; its
  *     labels default to the class's simple name, overridable with
  *     `@Labels("Person", "Employee")`;
  *   - a relationship class extends [[GraphRelationship]] with `id`,
  *     `source`, `target` Long fields; its type defaults to the class name
  *     upper-cased, overridable with `@RelationshipType("FRIEND_OF")`;
  *   - every other field becomes a property column (Spark's product
  *     encoder defines the schema; Int/Float etc. normalize to the
  *     engine's Long/Double lattice).
  *
  * Spark-first re-expression: the reference reflects on fields itself and
  * builds binary-id element mappings; here the product encoder does the
  * schema work and ids stay Longs (SURVEY §1.5 design note).
  */
trait GraphNode extends Product { def id: Long }

trait GraphRelationship extends Product {
  def id: Long
  def source: Long
  def target: Long
}

/** Node label override, e.g. `@Labels("Person", "Employee")`. */
case class Labels(labels: String*) extends StaticAnnotation

/** Relationship type override, e.g. `@RelationshipType("FRIEND_OF")`. */
case class RelationshipType(relType: String) extends StaticAnnotation

object GraphElements {

  /** String literal arguments of annotation `A` on class `T`, if present. */
  private def annotationStrings[T: TypeTag, A: TypeTag]: Option[Seq[String]] =
    typeOf[T].typeSymbol.annotations
      .find(_.tree.tpe =:= typeOf[A])
      .map(_.tree.children.tail.flatMap {
        case Literal(Constant(s: String)) => Seq(s)
        // varargs lower to a single Typed(Apply(...)) wrapping the literals
        case tree => tree.collect { case Literal(Constant(s: String)) => s }
      })

  def labelsOf[N <: GraphNode: TypeTag]: Set[String] =
    annotationStrings[N, Labels].map(_.toSet)
      .getOrElse(Set(typeOf[N].typeSymbol.name.toString))

  def relTypeOf[R <: GraphRelationship: TypeTag]: String =
    annotationStrings[R, RelationshipType].map(_.head)
      .getOrElse(typeOf[R].typeSymbol.name.toString.toUpperCase)

  /** Normalize encoder-produced columns to the engine's type lattice
    * (Int → Long, Float → Double, …) so properties from case classes meet
    * properties from parquet on equal footing. */
  private def normalized(ds: Dataset[_]): org.apache.spark.sql.DataFrame = {
    val df = ds.toDF()
    df.select(df.schema.fields.map { f =>
      val t = SparkTypes.normalize(f.dataType)
      if (t == f.dataType) col(f.name) else col(f.name).cast(t).as(f.name)
    }.toIndexedSeq: _*)
  }

  def nodeTable[N <: GraphNode: TypeTag](ds: Dataset[N]): NodeTable = {
    val df = normalized(ds)
    val props = df.columns.filterNot(_ == "id").map(c => c -> c).toMap
    NodeTable(labelsOf[N], df, "id", props)
  }

  def relTable[R <: GraphRelationship: TypeTag](ds: Dataset[R]): RelTable = {
    val df = normalized(ds)
    val meta = Set("id", "source", "target")
    val props = df.columns.filterNot(meta).map(c => c -> c).toMap
    RelTable(relTypeOf[R], df, "id", "source", "target", props)
  }

  def nodeTable[N <: GraphNode: TypeTag](spark: SparkSession,
      nodes: Seq[N]): NodeTable =
    nodeTable(spark.createDataset(nodes)(
      org.apache.spark.sql.Encoders.product[N]))

  def relTable[R <: GraphRelationship: TypeTag](spark: SparkSession,
      rels: Seq[R]): RelTable =
    relTable(spark.createDataset(rels)(
      org.apache.spark.sql.Encoders.product[R]))
}
