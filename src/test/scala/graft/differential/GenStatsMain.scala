package graft.differential

/** Prints construct-occurrence counts over a rendered query sample —
  * sanity check that grammar extensions are actually sampled.
  */
object GenStatsMain {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val queries = (0 until n).map { i =>
      DiffGen.genQuery.pureApply(
        org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong))
    }
    val texts = queries.map(_.render)
    val probes = List(
      "CASE" -> "CASE WHEN", "coalesce" -> "coalesce(",
      "toUpper" -> "toUpper(", "reverse" -> "reverse(",
      "substring" -> "substring(", "left" -> "left(",
      "right" -> "right(", "replace" -> "replace(",
      "trim" -> "trim(", "strSize" -> "size(", "abs" -> "abs(",
      "sign" -> "sign(", "STARTS" -> "STARTS WITH",
      "ENDS" -> "ENDS WITH", "CONTAINS" -> "CONTAINS",
      "EXISTS{}" -> "EXISTS {", "patpred" -> "]->()",
      "OPTIONAL" -> "OPTIONAL", "UNWIND" -> "UNWIND",
      "varlen" -> "*", "WITH" -> "WITH ", "ORDER" -> "ORDER BY",
      "DISTINCT" -> "DISTINCT", "collect" -> "collect(",
      // round-5 list/union/path extensions
      "range" -> "range(", "slice" -> "..", "head" -> "head(",
      "last" -> "last(", "IN-expr" -> " IN ", "quantAll" -> "all(qv",
      "quantAny" -> "any(qv", "quantNone" -> "none(qv",
      "quantSingle" -> "single(qv", "listComp" -> "[lcv IN",
      "patCompSz" -> "size([(", "UNION" -> "UNION",
      "UNION ALL" -> "UNION ALL", "namedPath" -> " = (",
      "pathLen" -> "length(pth", "entityEq" -> "AS ", // placeholder
      "rename" -> " AS w",
      // round-6 extensions: temporal, maps, path fns, vl quantifiers,
      // CONSTRUCT blocks
      "date" -> "date('", "durArith" -> "duration({days:",
      "datePart" -> ".year", "mapLit" -> "{a:", "mapProj" -> " {.",
      "pathNodes" -> "nodes(pth", "pathRels" -> "relationships(pth",
      "quantVl" -> "(qv IN r", "CONSTRUCT" -> "CONSTRUCT",
      // round-7 construct forms
      "COPY OF" -> "COPY OF", "relCloneNew" -> ")-[r",
      // round-7 zoned datetime family
      "zdtLit" -> "datetime('", "zdtProp" -> ".zd",
      "zdtPart" -> "epochSeconds",
      // round-8: zdt ± duration arithmetic, duration.between/inX over
      // zdts, column-valued datetime(string prop) parses
      "zdtArith" -> "hours:", "durBetween" -> "duration.between(",
      "durInX" -> "duration.in", "dtParse" -> ".zs)",
      // round-8 point family
      "pointLit" -> "point({", "pointProp" -> ".pt",
      "distance" -> "distance(", "setLabel" -> " SET cp")
    val withCut = queries.count(_.stages.exists {
      case Model.SWith(_, _, _, _, sk, lm) => sk.isDefined || lm.isDefined
      case _ => false
    })
    val withOrd = queries.count(_.stages.exists {
      case Model.SWith(_, _, _, o, _, _) => o.nonEmpty
      case _ => false
    })
    val withPreOrd = queries.count(_.stages.exists {
      case Model.SWith(_, _, _, o, _, _) => o.exists(_.pre)
      case _ => false
    })
    probes.foreach { case (name, pat) =>
      println(f"$name%-11s ${texts.count(_.contains(pat))}%5d / $n")
    }
    // round-7 families (AST-level where the text can't show them)
    val nestedOpt = texts.count(t =>
      "OPTIONAL MATCH".r.findAllIn(t).size >= 2)
    val whenSpan = """(?s)WHEN (.+?) THEN""".r
    val caseExists = texts.count(t => whenSpan.findAllMatchIn(t).exists(m =>
      m.group(1).contains("EXISTS {") || m.group(1).contains("]-")))
    val driving = queries.count(_.driving.isDefined)
    // round-9 construct families (VERDICT item 4)
    val consecutive = texts.count(t => "CONSTRUCT".r.findAllIn(t).size >= 2)
    val vlConstruct = texts.count { t =>
      val ci = t.indexOf("CONSTRUCT")
      ci > 0 && t.substring(0, ci).contains("*")
    }
    val ptConstruct = texts.count(t => t.contains("CONSTRUCT") &&
      (t.contains(".pt") || t.contains("distance(")))
    println(f"consecCons  $consecutive%5d / $n (two CONSTRUCT blocks)")
    println(f"vlConstruct $vlConstruct%5d / $n (var-length driving match before CONSTRUCT)")
    println(f"ptConstruct $ptConstruct%5d / $n (point exprs in a CONSTRUCT query)")
    println(f"nestedOPT   $nestedOpt%5d / $n (queries with >=2 OPTIONAL MATCH)")
    println(f"caseEXISTS  $caseExists%5d / $n (EXISTS/pattern pred in a CASE condition)")
    println(f"driving     $driving%5d / $n (driving-table cases)")
    println(f"withCut     $withCut%5d / $n (WITH ... ORDER BY + SKIP/LIMIT)")
    println(f"withOrd     $withOrd%5d / $n (WITH ... ORDER BY, cut or not)")
    println(f"withPreOrd  $withPreOrd%5d / $n (ORDER BY an unprojected entity)")
    println("catalog     runner-side: i%8==3 -> FROM GRAPH, i%8==7 -> " +
      "identity view (25% combined of non-driving cases)")
    println("--- sample with UNION:")
    texts.find(_.contains("UNION")).foreach(println)
    println("--- sample with named path:")
    texts.find(_.contains("length(pth")).foreach(println)
  }
}
