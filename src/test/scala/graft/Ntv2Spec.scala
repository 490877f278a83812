package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.ByteOrder
import graft.sources.Ntv2
import graft.operators.{Proj, Reproject}

/** NTv2 datum grid shift — clean-room codec + bilinear shift + the
  * nad27:* SRS registry spellings (the reference reaches NTv2/NADCON
  * grids through GDAL/OSR, ReprojectionFilter.cpp:131-180). The grid
  * here is synthetic (no external data): node values come from known
  * closed-form generators, so interpolation is checked against an
  * independently-written bilinear evaluator and exact node pins. */
class Ntv2Spec extends AnyFunSuite {
  import TestSpark._

  /** Two-subgrid fixture: coarse parent 40..50N / 120..130W at 0.5 deg,
    * dense child 44..46N / 123..125W at 0.125 deg, different generator
    * functions so subgrid selection is observable. */
  private def twoLevelGrid(): Ntv2.Grid = {
    def mk(name: String, parent: String, sLatD: Int, nLatD: Int,
           eLonD: Int, wLonD: Int, incSec: Double,
           f: (Double, Double) => Float, g: (Double, Double) => Float) = {
      val sLat = sLatD * 3600.0; val nLat = nLatD * 3600.0
      val eLon = eLonD * 3600.0; val wLon = wLonD * 3600.0
      val nr = math.round((nLat - sLat) / incSec).toInt + 1
      val nc = math.round((wLon - eLon) / incSec).toInt + 1
      val ls = new Array[Float](nr * nc); val os = new Array[Float](nr * nc)
      val acc = new Array[Float](nr * nc)
      for (r <- 0 until nr; c <- 0 until nc) {
        val lat = sLat + r * incSec; val lon = eLon + c * incSec
        ls(r * nc + c) = f(lat, lon); os(r * nc + c) = g(lat, lon)
      }
      Ntv2.SubGrid(name, parent, sLat, nLat, eLon, wLon, incSec, incSec,
        ls, os, acc, acc)
    }
    Ntv2.Grid("NAD27", "NAD83", Array(
      mk("PARENT", "NONE", 40, 50, 120, 130, 1800.0,
        (la, lo) => (1.0 + la * 1e-6).toFloat, (la, lo) => (2.0 - lo * 1e-7).toFloat),
      mk("CHILD", "PARENT", 44, 46, 123, 125, 450.0,
        (la, lo) => (9.0 + lo * 1e-7).toFloat, (la, lo) => (-3.0 + la * 1e-6).toFloat)))
  }

  test("write -> parse round-trips exactly, both byte orders") {
    val g = twoLevelGrid()
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val back = Ntv2.parse(Ntv2.write(g, order))
      assert(back.systemFrom == "NAD27" && back.systemTo == "NAD83")
      assert(back.subs.length == 2)
      back.subs.zip(g.subs).foreach { case (a, b) =>
        assert(a.name == b.name && a.parent == b.parent)
        assert(a.sLat == b.sLat && a.nLat == b.nLat &&
          a.eLonW == b.eLonW && a.wLonW == b.wLonW)
        assert(a.latInc == b.latInc && a.lonInc == b.lonInc)
        assert(a.latShift.sameElements(b.latShift))
        assert(a.lonShift.sameElements(b.lonShift))
      }
    }
  }

  test("bilinear interpolation: exact at nodes, matches independent evaluator between them") {
    val g = twoLevelGrid()
    val sub = g.subs(0)
    // exact node pin: at a grid node the interpolated value IS the node
    val (dLat, dLon) = Ntv2.bilinear(sub, sub.sLat + 3 * 1800.0, sub.eLonW + 5 * 1800.0)
    assert(dLat == sub.latShift(3 * sub.nCols + 5).toDouble)
    assert(dLon == sub.lonShift(3 * sub.nCols + 5).toDouble)
    // independent bilinear evaluator (different code path/shape)
    def indep(vals: Array[Float], latSec: Double, lonSec: Double): Double = {
      val ry = (latSec - sub.sLat) / sub.latInc
      val cx = (lonSec - sub.eLonW) / sub.lonInc
      val r0 = ry.toInt; val c0 = cx.toInt
      def v(r: Int, c: Int) = vals(r * sub.nCols + c).toDouble
      val top = v(r0, c0) + (v(r0, c0 + 1) - v(r0, c0)) * (cx - c0)
      val bot = v(r0 + 1, c0) + (v(r0 + 1, c0 + 1) - v(r0 + 1, c0)) * (cx - c0)
      top + (bot - top) * (ry - r0)
    }
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val la = sub.sLat + rnd.nextDouble() * (sub.nLat - sub.sLat)
      val lo = sub.eLonW + rnd.nextDouble() * (sub.wLonW - sub.eLonW)
      val (a, b) = Ntv2.bilinear(sub, la, lo)
      assert(math.abs(a - indep(sub.latShift, la, lo)) < 1e-12)
      assert(math.abs(b - indep(sub.lonShift, la, lo)) < 1e-12)
    }
  }

  test("subgrid selection: the dense child wins inside its extent, parent elsewhere") {
    val g = twoLevelGrid()
    assert(Ntv2.select(g, 45 * 3600.0, 124 * 3600.0).name == "CHILD")
    assert(Ntv2.select(g, 42 * 3600.0, 124 * 3600.0).name == "PARENT")
    assert(Ntv2.select(g, 45 * 3600.0, 128 * 3600.0).name == "PARENT")
    // outside everything: loud by default, identity under pass
    val ex = intercept[IllegalArgumentException] {
      Ntv2.forward(g, -110.0, 45.0, pass = false)
    }
    assert(ex.getMessage.contains("outside every subgrid"))
    assert(Ntv2.forward(g, -110.0, 45.0, pass = true) == ((-110.0, 45.0)))
  }

  test("forward-inverse identity below 1e-10 degrees across the grid") {
    val g = twoLevelGrid()
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val lat = 40.5 + rnd.nextDouble() * 9.0
      val lon = -(120.5 + rnd.nextDouble() * 9.0)
      val (flon, flat) = Ntv2.forward(g, lon, lat, pass = false)
      val (blon, blat) = Ntv2.inverse(g, flon, flat, pass = false)
      assert(math.abs(blon - lon) < 1e-10, s"lon $lon -> $blon")
      assert(math.abs(blat - lat) < 1e-10, s"lat $lat -> $blat")
    }
  }

  test("forward shift signs: +lat shift moves north, +lonW shift moves west") {
    val g = twoLevelGrid()
    // parent generators are ~1" lat (positive) and ~1.6" lonW (positive)
    val (lon2, lat2) = Ntv2.forward(g, -128.0, 41.0, pass = false)
    assert(lat2 > 41.0, "positive arc-second lat shift must increase latitude")
    assert(lon2 < -128.0, "positive west lon shift must decrease east longitude")
    // magnitudes in the arc-second band of the generators
    assert(math.abs((lat2 - 41.0) * 3600.0 - 1.1476) < 0.01)
  }

  test("NAD27 UTM projects on Clarke 1866 and round-trips to sub-mm") {
    // Clarke 1866 vs GRS80 at the same UTM coordinate differ by ~100 m
    // in geographic output at mid-latitude — the ellipsoid matters
    val (lonC, latC) = Proj.utmToGeo(500000.0, 4649776.0, 10, northern = true, Proj.Clarke1866)
    val (lonG, latG) = Proj.utmToGeo(500000.0, 4649776.0, 10, northern = true, Proj.GRS80)
    assert(math.abs(latC - latG) * 111320.0 > 20.0, "Clarke 1866 must differ from GRS80")
    val (e2, n2) = Proj.geoToUtm(lonC, latC, 10, northern = true, Proj.Clarke1866)
    assert(math.abs(e2 - 500000.0) < 1e-3 && math.abs(n2 - 4649776.0) < 1e-3)
  }

  test("registry: nad27:utm composes shift + Clarke 1866; grid-less stays loud") {
    import spark.implicits._
    val g = twoLevelGrid()
    // a point at ~45N 124W in NAD27 UTM zone 10 (Clarke 1866 forward)
    val (e0, n0) = Proj.geoToUtm(-124.0, 45.0, 10, northern = true, Proj.Clarke1866)
    val df = Seq(("d", 0, e0, n0, 7.0)).toDF("doc_id", "span_idx", "x", "y", "z")
    val out = Reproject.transform("nad27:utm:10", "EPSG:4326", Some(g))(df)
      .select("x", "y").head()
    val (expLon, expLat) = Ntv2.forward(g, -124.0, 45.0, pass = false)
    assert(math.abs(out.getDouble(0) - expLon) < 1e-9)
    assert(math.abs(out.getDouble(1) - expLat) < 1e-9)
    // and back: EPSG:4326 -> nad27:utm:10 recovers the UTM coordinate
    val back = Reproject.transform("EPSG:4326", "nad27:utm:10", Some(g))(
      Seq(("d", 0, expLon, expLat, 7.0)).toDF("doc_id", "span_idx", "x", "y", "z"))
      .select("x", "y").head()
    assert(math.abs(back.getDouble(0) - e0) < 1e-4)
    assert(math.abs(back.getDouble(1) - n0) < 1e-4)
    // grid-less nad27 is still a loud error
    val ex = intercept[IllegalArgumentException] {
      Reproject.transform("nad27:utm:10", "EPSG:4326")
    }
    assert(ex.getMessage.contains("NTv2 grid"))
  }

  test("pipeline stage: filters.reprojection consumes a .gsb via the grid option") {
    import spark.implicits._
    val g = twoLevelGrid()
    val dir = java.nio.file.Files.createTempDirectory("ntv2").toFile
    val gsb = new java.io.File(dir, "demo.gsb")
    java.nio.file.Files.write(gsb.toPath, Ntv2.write(g))
    val inPath = new java.io.File(dir, "in.parquet").getAbsolutePath
    Seq(("d", 0, -124.0, 45.0, 1.0), ("d", 1, -128.5, 42.25, 2.0))
      .toDF("doc_id", "span_idx", "x", "y", "z")
      .write.mode("overwrite").parquet(inPath)
    val spec =
      s"""{"pipeline":[
         |  {"type":"readers.parquet","path":"$inPath"},
         |  {"type":"filters.reprojection","in_srs":"nad27:geo",
         |   "out_srs":"EPSG:4326","grid":"${gsb.getAbsolutePath}"}
         |]}""".stripMargin
    val out = graft.plans.Pipeline.run(spark, spec).df
      .orderBy("span_idx").select("x", "y").collect()
    val exp = Seq(Ntv2.forward(g, -124.0, 45.0, pass = false),
      Ntv2.forward(g, -128.5, 42.25, pass = false))
    out.zip(exp).foreach { case (row, (elon, elat)) =>
      assert(math.abs(row.getDouble(0) - elon) < 1e-12)
      assert(math.abs(row.getDouble(1) - elat) < 1e-12)
    }
  }

  test("demo grid: codec round-trip construction and generator pins") {
    val g = Ntv2.demoGrid()
    val s = g.subs.head
    assert(s.nRows == 21 && s.nCols == 23)
    assert(s.latShift(0) == Ntv2.demoLatShift(0, 0))
    assert(s.latShift(5 * 23 + 7) == Ntv2.demoLatShift(5, 7))
    assert(s.lonShift(20 * 23 + 22) == Ntv2.demoLonShift(20, 22))
  }

  test("degenerate 1-row subgrid is rejected at construction (bilinear needs 2x2)") {
    // 1 row x 3 cols: would clamp bilinear's base row to 0 and read
    // past the node array — must fail loudly instead
    val ex = intercept[IllegalArgumentException] {
      Ntv2.SubGrid("BAD", "NONE", 0.0, 0.0, 0.0, 7200.0, 3600.0, 3600.0,
        new Array[Float](3), new Array[Float](3),
        new Array[Float](3), new Array[Float](3))
    }
    assert(ex.getMessage.contains("degenerate extent"))
  }

  test("corrupt GS_COUNT near Int overflow fails the truncation guard loudly") {
    // craft a file whose subgrid header claims GS_COUNT = 2^27+1:
    // count * 16 overflows Int; the long-arithmetic guard must catch it
    val g = Ntv2.demoGrid()
    val bytes = Ntv2.write(g)
    // GS_COUNT is subgrid record 10 (0-based): offset 11*16 + 10*16 + 8
    val at = 11 * 16 + 10 * 16 + 8
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(at, (1 << 27) + 1)
    val ex = intercept[IllegalArgumentException] { Ntv2.parse(bytes) }
    assert(ex.getMessage.contains("truncated node data"), ex.getMessage)
  }
}
