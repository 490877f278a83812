package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Hdf5Lite, Icebridge}

/** readers.icebridge via the clean-room minimal-HDF5 parser, pinned to
  * the reference's own golden (IcebridgeReaderTest.cpp testRead: both
  * points of icebridge/twoPoints.h5, every dimension). */
class IcebridgeSpec extends AnyFunSuite {
  import TestSpark._

  private val H5 = s"$RefData/icebridge/twoPoints.h5"

  test("twoPoints.h5 golden: both points, all 12 dimensions") {
    val df = Icebridge.asDataFrame(spark, H5).orderBy("span_idx")
    assert(df.count() === 2)
    val r = df.collect()
    def chk(i: Int, time: Float, lat: Float, lon: Float, elev: Float,
            xmt: Int, rcv: Int, az: Float, pitch: Float, roll: Float,
            pdop: Float, pw: Float, rel: Float): Unit = {
      assert(r(i).getAs[Float]("offset_time") === time)
      assert(r(i).getAs[Double]("y").toFloat === lat)
      assert(r(i).getAs[Double]("x").toFloat === lon)
      assert(r(i).getAs[Double]("z").toFloat === elev)
      assert(r(i).getAs[Int]("start_pulse") === xmt)
      assert(r(i).getAs[Int]("reflected_pulse") === rcv)
      assert(r(i).getAs[Float]("scan_angle_rank") === az)
      assert(r(i).getAs[Float]("pitch") === pitch)
      assert(r(i).getAs[Float]("roll") === roll)
      assert(r(i).getAs[Float]("pdop") === pdop)
      assert(r(i).getAs[Float]("pulse_width") === pw)
      assert(r(i).getAs[Float]("gps_time") === rel)
    }
    // IcebridgeReaderTest.cpp:77-103
    chk(0, 141437548f, 82.605319f, 301.406196f, 18.678f, 2408, 181,
      49.91f, -4.376f, 0.608f, 2.9f, 20.0f, 0.0f)
    chk(1, 141437548f, 82.605287f, 301.404862f, 18.688f, 2642, 173,
      52.006f, -4.376f, 0.609f, 2.9f, 17.0f, 0.0f)
  }

  test("distributed ingest equals driver decode; pipeline stage runs") {
    val driver = Icebridge.asDataFrame(spark, H5).orderBy("span_idx").collect().toSeq
    val dist = Icebridge.asDistributedDataFrame(spark, H5).orderBy("span_idx").collect().toSeq
    assert(dist === driver)
    val spec = s"""{"pipeline":[
      {"type":"readers.icebridge","path":"$H5"},
      {"type":"filters.range","limits":[{"dimension":"z","min":18.68,"max":19.0}]}
    ]}"""
    assert(graft.plans.Pipeline.run(spark, spec).df.count() === 1)
  }

  test("parser fails loudly outside the supported subset") {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(H5))
    val f = new Hdf5Lite.File(bytes)
    val boom = intercept[IllegalArgumentException] { f.readVector("no_such_dataset") }
    assert(boom.getMessage.contains("no object"))
    val bad = bytes.clone(); bad(8) = 2 // superblock v2
    val boom2 = intercept[IllegalArgumentException] { new Hdf5Lite.File(bad) }
    assert(boom2.getMessage.contains("superblock"))
  }
}
