package graft.differential
object CaseDumpMain {
  def main(args: Array[String]): Unit = {
    args.foreach { a =>
      val i = a.toLong
      val g = DiffGen.genGraph.pureApply(
        org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i / 10))
      val q = DiffGen.genQuery.pureApply(
        org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(i))
      println(s"=== case $i\n--- graph\n${g.toCreate}--- query\n${q.render}\n")
    }
  }
}
