package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Raw component access on CalendarIntervalType values.
  *
  * Neo4j durations keep their (months, days, seconds, nanos) groups
  * separate — `duration({hours: 26})` has `.days = 0` and `.hours = 26`
  * (reference okapi Duration semantics, TemporalUdfs.scala:118-142).
  * Spark's `date_part`/extract on CalendarIntervalType FOLDS whole days
  * out of the microsecond field (`IntervalUtils.getDays` adds
  * `microseconds / MICROS_PER_DAY` to the day count), so the digit view
  * reports `.days = 1, .hours = 2` for the same value. CalendarInterval
  * itself stores the raw triple; this expression reads it directly, one
  * field per call, codegen'd into whole-stage pipelines.
  */
case class CalendarIntervalField(child: Expression, field: String)
    extends UnaryExpression {
  require(CalendarIntervalField.fields.contains(field),
    s"unknown CalendarInterval field $field")
  override def dataType: DataType = LongType
  override def prettyName: String = s"interval_$field"

  override def nullSafeEval(v: Any): Any = {
    val i = v.asInstanceOf[CalendarInterval]
    field match {
      case "months" => i.months.toLong
      case "days" => i.days.toLong
      case "micros" => i.microseconds
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => field match {
      case "months" => s"(long) $c.months"
      case "days" => s"(long) $c.days"
      case "micros" => s"$c.microseconds"
    })

  override protected def withNewChildInternal(nc: Expression) =
    copy(child = nc)
}

object CalendarIntervalField {
  val fields: Set[String] = Set("months", "days", "micros")
}

object IntervalFunctions {
  private def field(c: Column, f: String): Column =
    ColumnBridge.column(CalendarIntervalField(ColumnBridge.expression(c), f))
  def intervalMonths(c: Column): Column = field(c, "months")
  def intervalDays(c: Column): Column = field(c, "days")
  def intervalMicros(c: Column): Column = field(c, "micros")
}
