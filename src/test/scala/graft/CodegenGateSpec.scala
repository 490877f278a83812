package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Runtime codegen gate. PlanQualitySpec pins the `*` markers in the plan
  * STRING, which stay green even when the generated Java never compiles
  * (Spark silently falls back to interpreted eval). This suite closes that
  * gap: it runs every query whose hot path goes through our custom
  * codegen'd expressions (Dot*, ArgMaxDots, MinHashBands, SimHash64,
  * rolling fingerprints, cell/morton/PIP) under
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` with
  * `spark.sql.codegen.fallback=false`, so any Janino compile failure
  * throws instead of degrading — and, belt-and-braces, captures the
  * CodeGenerator log stream and fails on any "Failed to compile" event.
  */
class CodegenGateSpec extends AnyFunSuite {
  import TestSpark._

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plans contain the expression families the round-3
    * verdict found running interpreted (minhash bands, dot products),
    * plus the spatial expression family for completeness. */
  private val gatedQueries = Seq(
    "q_ann_cosine", "q_ann_lsh", "q_ann_ivf", "q_ann_ivf_stored",
    "q_near_dup", "q_minhash_dedup", "q_dedup_cc",
    "q_simhash", "q_fingerprint", "q_crop_polygon", "q_morton_sort",
    "q_token_bpe", "q_ann_ivf_pq", "q_grid_shift", "q_reproject",
    "q_bloom_delta", "q_hexbin")

  test("hot-path expressions compile under CODEGEN_ONLY with zero fallback") {
    val compileFailures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    val appender = new AbstractAppender(
      "graft-codegen-capture", null, null, true, Array.empty) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if ((m.contains("Failed to compile") || m.contains("failed to compile")) ||
            e.getThrown != null && e.getThrown.toString.contains("CompileException"))
          compileFailures.add(m.linesIterator.take(3).mkString(" | ").take(400))
      }
    }
    appender.start()
    config.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()

    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      conf.set("spark.sql.codegen.fallback", "false")
      gatedQueries.foreach { q =>
        val n = SparkEntry.queries(q)(spark, sfDir).count()
        assert(n > 0, s"$q returned no rows under CODEGEN_ONLY")
      }
    } finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        v => conf.set("spark.sql.codegen.factoryMode", v))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        v => conf.set("spark.sql.codegen.fallback", v))
      config.getRootLogger.removeAppender("graft-codegen-capture")
      ctx.updateLoggers()
      appender.stop()
    }
    assert(compileFailures.isEmpty,
      s"codegen compile failures logged:\n${compileFailures.toArray.mkString("\n")}")
  }
}
