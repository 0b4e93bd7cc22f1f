package graft

object AstDumpMain {
  def main(args: Array[String]): Unit = {
    Seq(
      "RETURN time('13:37:01').hour AS h",
      "RETURN datetime('2024-01-01T00:00Z').epochMillis AS em",
      "RETURN (time('13:37:01')).hour AS h"
    ).foreach { q =>
      println(q)
      println("  " + graft.cypher.CypherParser.parse(q))
    }
  }
}
