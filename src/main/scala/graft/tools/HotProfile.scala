package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: steady-state timing of the slowest bench queries. */
object HotProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.sources.DocSynth.cachedDocs(spark, dir).count()
    val names = args.toSeq match {
      case Nil => Seq("q_sor", "q_knn_delta", "q_ror", "q_chipper", "q_dedup_cc")
      case xs  => xs
    }
    for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
