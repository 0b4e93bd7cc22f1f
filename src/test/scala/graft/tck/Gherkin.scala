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
  *  - `Given an empty graph` / `Given any graph`
  *  - `[Given|And] having executed:` + triple-quoted CREATE docstring
  *  - `When executing query:` + docstring
  *  - `Then the result should be, in any order:` / `, in order:` +
  *    result table; `Then the result should be empty`
  *  - `Then a <ErrorType> should be raised at <phase>: <detail>`
  *  - `And no side effects` (read-only engine — always true, ignored)
  */
object Gherkin {

  case class TckScenario(feature: String, name: String, given: String,
      query: String, columns: Seq[String], rows: Seq[Seq[String]],
      ordered: Boolean, expectError: Option[String])

  def parseFile(text: String): Seq[TckScenario] = {
    val lines = text.linesIterator.toVector
    var i = 0
    var feature = ""
    val out = Vector.newBuilder[TckScenario]

    def peek: String = if (i < lines.length) lines(i).trim else ""
    def advance(): String = { val l = peek; i += 1; l }

    def docString(): String = {
      // skip to the opening """ then read until the closing one
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
      val header = cells(advance())
      val rows = Vector.newBuilder[Seq[String]]
      while (peek.startsWith("|")) rows += cells(advance())
      (header, rows.result())
    }

    while (i < lines.length) {
      val l = advance()
      if (l.startsWith("Feature:")) feature = l.drop(8).trim
      else if (l.startsWith("Scenario:")) {
        val name = l.drop(9).trim
        var given = ""
        var query = ""
        var cols: Seq[String] = Nil
        var rows: Seq[Seq[String]] = Nil
        var ordered = false
        var err: Option[String] = None
        var done = false
        while (!done && i < lines.length) {
          val s = peek
          if (s.startsWith("Scenario:") || s.startsWith("Feature:")) done = true
          else {
            i += 1
            if (s == "Given an empty graph" || s == "Given any graph") ()
            else if (s.endsWith("having executed:")) given = docString()
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
        }
        out += TckScenario(feature, name, given, query, cols, rows,
          ordered, err)
      }
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
