package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 scale-headroom fixture (VERDICT item 3): derive an sf1-sized
  * dataset (~6M lineitems, 50k documents) from the driver's sf0.1
  * parquet by replicating each table 10× with key offsets that preserve
  * referential structure (each copy is a disjoint subgraph wired exactly
  * like the original). Documents get a per-copy deterministic word
  * shuffle so cross-copy texts are NOT near-duplicates — the dedup
  * gates' pair population scales ~linearly with the corpus instead of
  * quadratically with the copy count. Writes to /root/repo/testdata_sf1
  * (never touches /root/testdata). Used by R9BenchSf1Main as a cliff
  * detector only — no oracle runs at this scale.
  */
object GenSf1Main {
  val OutDir = "/root/repo/testdata_sf1"
  val Copies = 10

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    // one row per (original row, copy), keys shifted per copy
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val copies = explode(sequence(lit(0), lit(Copies - 1))).as("_copy")
      df.select(col("*"), copies).select(
        df.columns.map { c =>
          shifts.get(c) match {
            case Some(off) => (col(c) + col("_copy") * lit(off)).as(c)
            case None => col(c)
          }
        }: _*)
    }

    val CK = 1000000L; val OK = 10000000L; val PK = 1000000L
    val SK = 100000L; val DOC = 100000L

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$OutDir/$name.parquet")
      println(s"wrote $name: ${spark.read.parquet(s"$OutDir/$name.parquet").count()} rows")
    }

    // dimensions stay shared across copies (nation/region keys unshifted)
    write(t("region"), "region")
    write(t("nation"), "nation")
    write(replicate(t("customer"), Map("c_custkey" -> CK)), "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> SK)), "supplier")
    write(replicate(t("part"), Map("p_partkey" -> PK)), "part")
    write(replicate(t("orders"),
      Map("o_orderkey" -> OK, "o_custkey" -> CK)), "orders")
    write(replicate(t("lineitem"),
      Map("l_orderkey" -> OK, "l_partkey" -> PK, "l_suppkey" -> SK)),
      "lineitem")

    // documents: copy 0 verbatim; copies ≥1 shuffle words by a
    // copy-salted hash so shingle sets diverge across copies
    val docs = t("documents")
    val repl = docs.select(col("*"),
      explode(sequence(lit(0), lit(Copies - 1))).as("_copy"))
    val shuffled = repl.select(
      (col("doc_id") + col("_copy") * lit(DOC)).as("doc_id"),
      when(col("_copy") === 0, col("text")).otherwise(
        array_join(transform(
          array_sort(transform(split(col("text"), " "),
            w => struct(xxhash64(w, col("_copy")).as("h"), w.as("w")))),
          s => s.getField("w")), " ")).as("text"),
      col("lang"), col("source"), col("n_chars"))
    write(shuffled, "documents")
    spark.stop()
  }
}
