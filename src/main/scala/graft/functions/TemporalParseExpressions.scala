package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** Row-level ISO-8601 temporal parsing for COLUMN-valued constructor
  * arguments — `datetime(n.iso_col)`, `date(col)`, `time(col)`,
  * `duration(col)` over data columns (CSV/JDBC-ingested graphs carry
  * temporal values as strings; the reference's FS sources only load
  * natively-typed temporal columns, SparkConversions.scala:62-64, and
  * its Neo4j value mapping has no in-query string upgrade either).
  *
  * The static helpers below delegate to the SAME driver-side parsers the
  * literal path uses (ExprCompiler.parseIsoDate / parseIsoTime /
  * parseIsoZonedDatetime, IsoDuration) so a column value and an equal
  * string literal construct identical encodings — week dates, ordinal
  * dates, compact forms and all. A malformed non-null string raises the
  * parser's typed IllegalArgumentException per row (Neo4j raises too);
  * null input stays null. Codegen'd (no Scala UDF): the generated code
  * calls the static forwarders directly, keeping whole-stage pipelines
  * intact. */
object TemporalParse {
  import graft.plans.ExprCompiler.{parseIsoDate, parseIsoTime,
    parseIsoZonedDatetime}

  /** java.time parse failures surface as the engine's typed error with
    * the offending value quoted (the driver-side parsers mostly do this
    * already; the calendar-date fallthrough throws the raw
    * DateTimeParseException) */
  private def typed[A](what: String, s: UTF8String)(body: => A): A =
    try body catch {
      case e: java.time.DateTimeException =>
        throw new IllegalArgumentException(
          s"$what(): cannot parse '$s': ${e.getMessage}")
    }

  def dateDays(s: UTF8String): Int =
    typed("date", s)(parseIsoDate(s.toString).toEpochDay.toInt)

  def localTimeMicros(s: UTF8String): Long =
    typed("localtime", s)(parseIsoTime(s.toString)._1)

  def timeRow(s: UTF8String): InternalRow = typed("time", s) {
    val (mic, off) = parseIsoTime(s.toString)
    val o = off.getOrElse(0)
    new GenericInternalRow(Array[Any](
      java.lang.Math.floorMod(mic - o * 1000000L, 86400000000L), o))
  }

  def zdtRow(s: UTF8String): InternalRow = typed("datetime", s) {
    val (inst, off, zid) = parseIsoZonedDatetime(s.toString)
    new GenericInternalRow(Array[Any](
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L, off,
      UTF8String.fromString(zid)))
  }

  /** local wall clock of the parsed value (strings without an offset
    * read verbatim; an explicit offset/zone contributes its local
    * clock, like localdatetime(zoned) selection) */
  def localDtMicros(s: UTF8String): Long = typed("localdatetime", s) {
    val (inst, off, _) = parseIsoZonedDatetime(s.toString)
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L + off * 1000000L
  }

  def duration(s: UTF8String): CalendarInterval = {
    val p = graft.plans.IsoDuration.parse(s.toString)
    new CalendarInterval(p.years * 12 + p.months, p.days,
      p.hours * 3600000000L + p.minutes * 60000000L +
        java.lang.Math.round(p.seconds * 1000000d))
  }
}

/** `what` selects the parse: date | localtime | time | localdatetime |
  * datetime | duration. Struct-encoded results (time, datetime) return
  * the engine's standard field layouts. */
case class ParseTemporal(child: Expression, what: String)
    extends UnaryExpression {
  require(ParseTemporal.types.contains(what),
    s"unknown temporal parse target $what")
  override def dataType: DataType = ParseTemporal.types(what)
  override def prettyName: String = s"parse_$what"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    what match {
      case "date" => TemporalParse.dateDays(s)
      case "localtime" => TemporalParse.localTimeMicros(s)
      case "time" => TemporalParse.timeRow(s)
      case "localdatetime" => TemporalParse.localDtMicros(s)
      case "datetime" => TemporalParse.zdtRow(s)
      case "duration" => TemporalParse.duration(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => what match {
      case "date" => s"graft.functions.TemporalParse.dateDays($c)"
      case "localtime" => s"graft.functions.TemporalParse.localTimeMicros($c)"
      case "time" => s"graft.functions.TemporalParse.timeRow($c)"
      case "localdatetime" =>
        s"graft.functions.TemporalParse.localDtMicros($c)"
      case "datetime" => s"graft.functions.TemporalParse.zdtRow($c)"
      case "duration" => s"graft.functions.TemporalParse.duration($c)"
    })

  override protected def withNewChildInternal(nc: Expression) =
    copy(child = nc)
}

object ParseTemporal {
  val types: Map[String, DataType] = Map(
    "date" -> DateType,
    "localtime" -> LongType,
    "time" -> StructType(Seq(
      StructField("@zt", LongType, nullable = false),
      StructField("off", IntegerType, nullable = false))),
    "localdatetime" -> TimestampNTZType,
    "datetime" -> StructType(Seq(
      StructField("@zdt", TimestampType, nullable = false),
      StructField("off", IntegerType, nullable = false),
      StructField("zid", StringType, nullable = false))),
    "duration" -> CalendarIntervalType)

  def parse(c: Column, what: String): Column =
    ColumnBridge.column(ParseTemporal(ColumnBridge.expression(c), what))
}
