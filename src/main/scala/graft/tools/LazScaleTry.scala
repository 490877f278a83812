// scratch driver: diagnose the .laz-ingest scaling pair — times the
// executor-parallel decode at two core counts and reports the JVM's
// accumulated GC time for each phase (allocation-rate contention is the
// single-JVM suspect for sub-linear decode scaling). Not part of the
// build contract. Run: sbt "runMain graft.tools.LazScaleTry [replicas]"
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object LazScaleTry {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cores]")
      .appName(s"laztry-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 24
    val sfDir = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("lazscaletry").toString
    val s0 = session(16)
    val n = try {
      val pts = graft.model.Model.explodePoints(
          graft.sources.DocSynth.docTableReplicated(s0, sfDir, replicas))
        .withColumn("shard", pmod(col("span_idx") + length(col("doc_id")), lit(64)))
      graft.sources.LasWriter.writeSharded(dir, pts, 1,
        graft.sources.LasWriter.XForms(0.001, 0.001, 0.001, 0, 0, 0),
        "shard", compress = true)
      pts.count()
    } finally { s0.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    println(s"setup: $n points in 64 shards at $dir")

    Seq(2, 8, 8, 2).foreach { cores =>
      val sp = session(cores)
      try {
        sp.read.format("binaryFile").load(s"$dir/*.laz").count() // warm fs cache
        graft.sources.LasDecode.asDistributedDataFrame(sp, s"$dir/*.laz").count() // warm JIT
        val gc0 = gcMillis; val t0 = System.nanoTime()
        (0 until 2).foreach { _ =>
          val c = graft.sources.LasDecode.asDistributedDataFrame(sp, s"$dir/*.laz").count()
          require(c == n)
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val gc = (gcMillis - gc0) / 1e3
        println(f"cores=$cores wall=$wall%.2f s  gc=$gc%.2f s (${100 * gc / wall}%.0f%%)  thr=${2 * n / wall}%.0f pts/s (${2 * n / wall / cores}%.0f /core)")
      } finally { sp.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    }
  }
}
