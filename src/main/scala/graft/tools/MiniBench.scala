package graft
import org.apache.spark.sql.SparkSession
/** Debugging scratch driver: repeats the historically noisy bench queries
  * twice in one JVM to separate host-load noise from real regressions
  * (companion to tools/LazTry). Not part of the driver contract. */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.DocSynth.cachedDocs(spark, sfDir).count()
    val names = Seq("q_chipper", "q_stream_window", "q_dedup_cc", "q_sor", "q_minhash_dedup", "q_pmf_ground", "q_colorize")
    for (round <- 1 to 2; n <- names) {
      val t = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"round$round $n ${(System.nanoTime()-t)/1e9}%.2f s")
    }
    spark.stop()
  }
}
