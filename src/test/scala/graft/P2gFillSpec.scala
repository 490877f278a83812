package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AggOps
import graft.plans.{Pipeline, PipelineXml}

/** writers.p2g nodata window fill (P2gWriter.cpp:62-63,185 hands
  * fill_window_size, default 3, to points2grid; the library's published
  * fill takes the 1/d^2-weighted mean of non-empty neighbors at
  * Chebyshev distance d within the (2w+1)^2 window, w = size/2).
  * Points sit exactly on cell centers so every observed cell holds one
  * exact z and the filled values are closed-form. */
class P2gFillSpec extends AnyFunSuite {
  import TestSpark._

  // cells (0,0)=10 and (3,0)=20 observed; (1,0) and (2,0) are holes
  private lazy val sparse = {
    import spark.implicits._
    Seq((0.5, 0.5, 10.0), (3.5, 0.5, 20.0)).toDF("x", "y", "z")
  }

  private def raster(win: Int) =
    AggOps.p2gRaster(1, 1, 0.1, 0, 0, fillWindowSize = win)(sparse)
      .select("px", "py", "den", "zmean")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap

  test("fill_window_size=0 leaves holes; observed cells unchanged") {
    val m = raster(0)
    assert(m.keySet === Set((0L, 0L), (3L, 0L)))
    assert(m((0L, 0L)) === ((1L, 10.0)))
    assert(m((3L, 0L)) === ((1L, 20.0)))
  }

  test("window 3: each hole takes its single Chebyshev-1 neighbor, den=0") {
    val m = raster(3)
    assert(m.keySet === Set((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L)))
    assert(m((1L, 0L)) === ((0L, 10.0)))
    assert(m((2L, 0L)) === ((0L, 20.0)))
    // observed cells keep their values and counts
    assert(m((0L, 0L)) === ((1L, 10.0)))
    assert(m((3L, 0L)) === ((1L, 20.0)))
  }

  test("window 5: 1/d^2 weighting blends both neighbors (WEIGHTER=2)") {
    val m = raster(5)
    // hole (1,0): d=1 to z=10, d=2 to z=20 -> (10 + 20/4) / (1 + 1/4) = 12
    assert(math.abs(m((1L, 0L))._2 - 12.0) < 1e-12)
    // hole (2,0): symmetric -> 18
    assert(math.abs(m((2L, 0L))._2 - 18.0) < 1e-12)
  }

  test("fill never reaches outside the observed grid extent") {
    val m = raster(5)
    assert(m.keySet.forall { case (px, py) => px >= 0 && px <= 3 && py === 0L })
  }

  test("reference-native XML p2g pipelines default to fill_window_size 3") {
    val json = PipelineXml.toJsonSpec("""<?xml version="1.0"?>
      <Pipeline version="1.0">
        <Writer type="writers.p2g">
          <Option name="filename">/tmp/p2g-fill-xml</Option>
          <Option name="grid_dist_x">1</Option>
          <Option name="grid_dist_y">1</Option>
          <Option name="radius">0.1</Option>
          <Reader type="readers.faux">
            <Option name="mode">ramp</Option>
            <Option name="count">10</Option>
          </Reader>
        </Writer>
      </Pipeline>""")
    assert(json.contains("\"fill_window_size\":3"))
  }
}
