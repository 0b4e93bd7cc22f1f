package graft

import org.apache.spark.sql.SparkSession
import graft.sources.TpchGraph

/** Times the consolidated-triplet materialization that dominates
  * c5_global_agg's first call (round-6 item 6). */
object TripletMatProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = TpchGraph.load(spark, "/root/testdata/sf0.1")
    // warm parquet/JVM
    g.nodes("p", Set("Part")).count()
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("same join unpersisted count") {
      val g3 = g.withTriplet("CONTAINS", Set("Order"), Set("Part"),
        persist = false)
      g3.tripletTables.head.df.count()
    }
    t("persist MEMORY_AND_DISK") {
      val g2 = g.withTriplet("CONTAINS", Set("Order"), Set("Part"),
        persist = false)
      val df = g2.tripletTables.head.df
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count(); df.unpersist(true); n
    }
    t("persist MEMORY_AND_DISK_SER") {
      val g2 = g.withTriplet("CONTAINS", Set("Order"), Set("Part"),
        persist = false)
      val df = g2.tripletTables.head.df
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val n = df.count(); df.unpersist(true); n
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    t("persist MEMORY_AND_DISK uncompressed") {
      val g2 = g.withTriplet("CONTAINS", Set("Order"), Set("Part"),
        persist = false)
      val df = g2.tripletTables.head.df
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count(); df.unpersist(true); n
    }
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "100000")
    t("persist MEMORY_AND_DISK batch100k") {
      val g2 = g.withTriplet("CONTAINS", Set("Order"), Set("Part"),
        persist = false)
      val df = g2.tripletTables.head.df
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = df.count(); df.unpersist(true); n
    }
    spark.stop()
  }
}
