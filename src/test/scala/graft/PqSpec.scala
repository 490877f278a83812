package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import graft.operators.AnnOps

/** IVF-PQ (product-quantized residual codes over the stored layout):
  * recall vs brute force, partitioning-invariance of the integer-exact
  * codebook training, and the two plan properties the 100 TB story
  * rests on — partition pruning to the probed lists and a codes-only
  * (embedding-free) ADC scan. */
class PqSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val dims = 16

  private def vecs = spark.range(0, 2000).select(col("id").as("vec_id"),
    lit(0).as("label"),
    transform(sequence(lit(1), lit(dims)),
      d => sin(col("id") * d).cast(FloatType)).as("embedding"))

  private def tmpDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graftpq$tag").toString + "/store"

  private def pqTopK(df: org.apache.spark.sql.DataFrame, tag: String) =
    AnnOps.ivfPqStoredTopK(Array.tabulate(dims)(d => math.sin(500.0 * (d + 1))),
      k = 10, nLists = 8, nProbe = 4, m = 4, codebookK = 16, nCand = 60,
      storageDir = tmpDir(tag))(df)

  test("PQ probe finds most of brute-force top-k; identical vector survives the ADC cut") {
    val q = Array.tabulate(dims)(d => math.sin(500.0 * (d + 1)))
    val exact = AnnOps.cosineTopK(q, 10)(vecs).select("vec_id").as[Long].collect().toSet
    val approx = pqTopK(vecs, "rec").select("vec_id").as[Long].collect().toSet
    // vector 500 IS the query: its ADC distance is the quantization
    // error alone, so it must survive the candidate cut and rerank
    assert(approx.contains(500L), "identical vector lost by the PQ candidate cut")
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF-PQ recall $recall too low")
  }

  test("PQ result is partitioning-invariant (integer-exact codebook training)") {
    val a = pqTopK(vecs.repartition(4), "p4").collect().map(_.toString).toSeq
    val b = pqTopK(vecs.repartition(32), "p32").collect().map(_.toString).toSeq
    assert(a === b, "PQ top-k differs across input partitionings")
  }

  test("recall on the fixture embeddings table meets the measured floor") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = Array.tabulate(64)(d => math.sin(d + 1.0))
    val exact = AnnOps.cosineTopK(q, 20)(embs).select("vec_id").as[Long].collect().toSet
    val approx = AnnOps.ivfPqStoredTopK(q, k = 20, nLists = 16, nProbe = 4,
      m = 8, codebookK = 16, nCand = 60, storageDir = tmpDir("fix"))(embs)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // measured 0.45 (the 4/16-list probe ceiling is 0.55; the C=60 ADC
    // cut keeps 9 of the 11 reachable) — floor set below with headroom
    assert(recall >= 0.4, s"fixture recall $recall below the pinned floor")
  }

  test("ADC scan reads codes without embeddings and prunes to probed lists") {
    val top = pqTopK(vecs, "plan")
    val plan = top.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("list"),
      s"PQ probe does not prune list partitions:\n$plan")
    // the candidate phase must scan the store WITHOUT the float
    // vectors: some scan of the store reads codes but not embedding
    val scanSchemas = plan.linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(scanSchemas.exists(s => s.contains("codes") && !s.contains("embedding")),
      s"no codes-only ADC scan found:\n${scanSchemas.mkString("\n")}")
    assert(top.count() === 10)
  }
}
