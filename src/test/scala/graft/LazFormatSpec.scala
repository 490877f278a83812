package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LasDecode

/** LASzip (.laz) decode: the clean-room decompressor must reproduce the
  * uncompressed ground-truth fixtures BIT-FOR-BIT — every field of every
  * point — for both the point-wise compressor 1 (item versions 1) and
  * the chunked compressor 2 (item versions 2), across files produced by
  * two different encoders (laszip and liblas) plus a padded variant. */
class LazFormatSpec extends AnyFunSuite {
  import TestSpark._

  private def assertBitExact(lazPath: String, lasPath: String): Unit = {
    val (hz, laz) = LasDecode.readPoints(lazPath)
    val (h0, las) = LasDecode.readPoints(lasPath)
    assert(hz.pointCount === h0.pointCount)
    assert(hz.pointFormat === h0.pointFormat)
    assert(laz.size === las.size)
    laz.zip(las).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"point $i differs")
    }
  }

  test("compressor 1 (point-wise, item v1): simple.laz == simple.las bit-for-bit") {
    assertBitExact(s"$RefData/laz/simple.laz", s"$RefData/las/simple.las")
  }

  test("compressor 2 (chunked, item v2): laszip-generated.laz == basefile.las") {
    assertBitExact(s"$RefData/laszip/laszip-generated.laz", s"$RefData/laszip/basefile.las")
  }

  test("compressor 2 from a different encoder: liblas-generated.laz == basefile.las") {
    assertBitExact(s"$RefData/laszip/liblas-generated.laz", s"$RefData/laszip/basefile.las")
  }

  test("padded variant decodes identically") {
    assertBitExact(s"$RefData/laszip/laszip-generated_with2bytespadding.laz",
      s"$RefData/laszip/basefile.las")
  }

  test("distributed ingest decompresses .laz in executors (same rows as .las)") {
    val laz = LasDecode.asDistributedDataFrame(spark, s"$RefData/laz/simple.laz")
      .drop("doc_id")
    val las = LasDecode.asDistributedDataFrame(spark, s"$RefData/las/simple.las")
      .drop("doc_id")
    assert(laz.count() === 1065)
    assert(laz.exceptAll(las).isEmpty && las.exceptAll(laz).isEmpty)
  }

  test("pipeline readers.las reads .laz transparently") {
    val out = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$RefData/laz/simple.laz"},
         |  {"type": "filters.range",
         |   "limits": [{"dimension": "classification", "min": 2, "max": 2}]}
         |]}""".stripMargin).df
    val truth = LasDecode.asDataFrame(spark, s"$RefData/las/simple.las")
      .filter(org.apache.spark.sql.functions.col("classification") === 2)
    assert(out.count() === truth.count() && out.count() > 0)
  }

  test("offset-split ingest refuses compressed streams loudly") {
    val ex = intercept[IllegalArgumentException] {
      LasDecode.asSplitDataFrame(spark, s"$RefData/laz/simple.laz", 2).count()
    }
    assert(ex.getMessage.contains("uncompressed"))
  }
}
