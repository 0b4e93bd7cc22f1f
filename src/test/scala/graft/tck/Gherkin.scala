package graft.tck

/** Minimal Gherkin parser for openCypher TCK `.feature` files (the
  * format of github.com/opencypher/openCypher/tck — reference runner:
  * morpheus-tck/.../TckSparkCypherTest.scala uses the official TCK API;
  * zero-egress blocks that artifact here, so this parser lets scenario
  * text be vendored VERBATIM under src/test/resources/features/ the day
  * it becomes available, and runs hand-authored files in the identical
  * syntax until then).
  *
  * Supported subset (what TCK scenarios actually use):
  *  - `Feature:` / `Scenario:` headers, `#` comments
  *  - `Background:` — its Given steps prepend to every scenario in the
  *    feature (fixture CREATEs concatenate before the scenario's own)
  *  - `Scenario Outline:` + one or more `Examples:` tables — `<name>`
  *    placeholders substitute per example row, yielding one scenario per
  *    row (named `… #k`)
  *  - `Given an empty graph` / `Given any graph`
  *  - `[Given|And] having executed:` + triple-quoted CREATE docstring
  *  - `When executing query:` + docstring
  *  - `Then the result should be, in any order:` / `, in order:` +
  *    result table; `Then the result should be empty`
  *  - `Then a <ErrorType> should be raised at <phase>: <detail>`
  *  - `[And|Given] parameters are:` + a headerless name|value table —
  *    values parse with the TCK cell syntax and bind as query parameters
  *  - `And no side effects` (read-only engine — always true, ignored)
  */
object Gherkin {

  case class TckScenario(feature: String, name: String, given: String,
      query: String, columns: Seq[String], rows: Seq[Seq[String]],
      ordered: Boolean, expectError: Option[String],
      params: Map[String, Any] = Map.empty)

  private case class Body(given: String, query: String,
      columns: Seq[String], rows: Seq[Seq[String]], ordered: Boolean,
      expectError: Option[String], params: Map[String, Any])

  private def isHeader(s: String): Boolean =
    s.startsWith("Feature:") || s.startsWith("Background:") ||
      s.startsWith("Scenario:") || s.startsWith("Scenario Outline:") ||
      s.startsWith("Examples:")

  /** parse the steps of one scenario/background body (raw lines, already
    * placeholder-substituted for outline instances)
    */
  private def parseBody(lines: Vector[String]): Body = {
    var i = 0
    def peek: String = if (i < lines.length) lines(i).trim else ""

    def docString(): String = {
      while (i < lines.length && !peek.startsWith("\"\"\"")) i += 1
      require(i < lines.length, "unterminated docstring")
      val indent = lines(i).indexOf("\"\"\"")
      i += 1
      val body = Vector.newBuilder[String]
      while (i < lines.length && !peek.startsWith("\"\"\"")) {
        val raw = lines(i)
        body += (if (raw.length >= indent) raw.drop(indent) else raw.trim)
        i += 1
      }
      i += 1 // closing """
      body.result().mkString("\n")
    }

    def table(): (Seq[String], Seq[Seq[String]]) = {
      def cells(l: String): Seq[String] =
        splitRow(l.trim.stripPrefix("|").stripSuffix("|"))
      require(peek.startsWith("|"), s"expected a result table, got: $peek")
      val header = cells(peek); i += 1
      val rows = Vector.newBuilder[Seq[String]]
      while (peek.startsWith("|")) { rows += cells(peek); i += 1 }
      (header, rows.result())
    }

    var given = ""
    var query = ""
    var cols: Seq[String] = Nil
    var rows: Seq[Seq[String]] = Nil
    var ordered = false
    var err: Option[String] = None
    var params: Map[String, Any] = Map.empty
    while (i < lines.length) {
      val s = peek
      i += 1
      if (s == "Given an empty graph" || s == "Given any graph") ()
      else if (s.endsWith("having executed:"))
        given = (if (given.isEmpty) "" else given + "\n") + docString()
      else if (s.endsWith("parameters are:")) {
        // headerless name|value table, one parameter binding per row
        val t = table()
        (t._1 +: t._2).foreach { r =>
          require(r.length == 2, s"parameter row needs 2 cells, got $r")
          params += (r.head -> parseValue(r(1)))
        }
      }
      else if (s == "When executing query:" ||
        s == "When executing control query:") query = docString()
      else if (s.startsWith("Then the result should be, in any order:") ||
        s.startsWith("Then the result should be:")) {
        val t = table(); cols = t._1; rows = t._2
      } else if (s.startsWith("Then the result should be, in order:")) {
        val t = table(); cols = t._1; rows = t._2; ordered = true
      } else if (s == "Then the result should be empty") { cols = Nil; rows = Nil }
      else if (s.startsWith("Then a ") && s.contains("should be raised")) {
        err = Some(s.substring(7, s.indexOf(" should be raised")).trim)
      }
      // `And no side effects`, comments, blanks: ignored
    }
    Body(given, query, cols, rows, ordered, err, params)
  }

  def parseFile(text: String): Seq[TckScenario] = {
    val lines = text.linesIterator.toVector
    var i = 0
    var feature = ""
    var background = "" // Background fixture CREATEs for the current feature
    val out = Vector.newBuilder[TckScenario]

    def peek: String = if (i < lines.length) lines(i).trim else ""

    def blockUntilHeader(): Vector[String] = {
      val b = Vector.newBuilder[String]
      while (i < lines.length && !isHeader(lines(i).trim)) {
        b += lines(i); i += 1
      }
      b.result()
    }

    def withBackground(own: String): String =
      if (background.isEmpty) own
      else if (own.isEmpty) background
      else background + "\n" + own

    while (i < lines.length) {
      val l = peek
      if (l.startsWith("Feature:")) {
        feature = l.drop(8).trim; background = ""; i += 1
      } else if (l.startsWith("Background:")) {
        i += 1
        background = parseBody(blockUntilHeader()).given
      } else if (l.startsWith("Scenario Outline:")) {
        val name = l.drop(17).trim; i += 1
        val block = blockUntilHeader()
        var exampleNo = 0
        while (peek.startsWith("Examples:")) {
          i += 1
          val exBlock = blockUntilHeader()
          val tableLines = exBlock.map(_.trim).filter(_.startsWith("|"))
          require(tableLines.nonEmpty, s"Examples without a table in $name")
          def cells(ln: String): Seq[String] =
            splitRow(ln.stripPrefix("|").stripSuffix("|"))
          val hdr = cells(tableLines.head)
          tableLines.tail.foreach { ln =>
            exampleNo += 1
            val vals = cells(ln)
            val substituted = block.map { raw =>
              hdr.zip(vals).foldLeft(raw) { case (acc, (h, v)) =>
                acc.replace(s"<$h>", v)
              }
            }
            val b = parseBody(substituted)
            out += TckScenario(feature, s"$name #$exampleNo",
              withBackground(b.given), b.query, b.columns, b.rows,
              b.ordered, b.expectError, b.params)
          }
        }
        require(exampleNo > 0, s"Scenario Outline '$name' has no Examples")
      } else if (l.startsWith("Scenario:")) {
        val name = l.drop(9).trim; i += 1
        val b = parseBody(blockUntilHeader())
        out += TckScenario(feature, name, withBackground(b.given), b.query,
          b.columns, b.rows, b.ordered, b.expectError, b.params)
      } else i += 1
    }
    out.result()
  }

  /** split a table row on unquoted, unbracketed `|`. */
  private def splitRow(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\'' && (j == 0 || s.charAt(j - 1) != '\\')) inStr = !inStr
      if (!inStr && (c == '[' || c == '{' || c == '(')) depth += 1
      if (!inStr && (c == ']' || c == '}' || c == ')')) depth -= 1
      if (c == '|' && depth == 0 && !inStr) {
        out += cur.result().trim; cur.clear()
      } else cur += c
      j += 1
    }
    out += cur.result().trim
    out.result()
  }

  /** TCK result-cell syntax → comparable Scala value: integers, floats,
    * single-quoted strings, booleans, null, lists, maps. */
  def parseValue(cell: String): Any = {
    val s = cell.trim
    if (s == "null") null
    else if (s == "true") true
    else if (s == "false") false
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1).replace("\\'", "'")
    else if (s.startsWith("[") && s.endsWith("]"))
      splitTop(s.substring(1, s.length - 1)).map(parseValue).toList
    else if (s.startsWith("{") && s.endsWith("}"))
      splitTop(s.substring(1, s.length - 1)).filter(_.nonEmpty).map { kv =>
        val c = kv.indexOf(':')
        kv.take(c).trim -> parseValue(kv.drop(c + 1))
      }.toMap
    else if (s.matches("-?\\d+")) s.toLong
    else if (s.matches("-?\\d*\\.\\d+([eE][+-]?\\d+)?|-?\\d+[eE][+-]?\\d+"))
      s.toDouble
    else s // bare symbol (e.g. a label expression) — compared as string
  }

  /** split on top-level commas (outside quotes/brackets). */
  private def splitTop(s: String): Seq[String] = {
    if (s.trim.isEmpty) return Seq.empty
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var j = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (c == '\'' && (j == 0 || s.charAt(j - 1) != '\\')) inStr = !inStr
      if (!inStr && (c == '[' || c == '{' || c == '(')) depth += 1
      if (!inStr && (c == ']' || c == '}' || c == ')')) depth -= 1
      if (c == ',' && depth == 0 && !inStr) {
        out += cur.result().trim; cur.clear()
      } else cur += c
      j += 1
    }
    out += cur.result().trim
    out.result()
  }
}
