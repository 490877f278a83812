package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SmoothOps
import graft.index.CellSpace

/** filters.smooth — MLS surface smoothing (SmoothKernel.cpp via
  * pcl::MovingLeastSquares, PCLPipeline.hpp:552-575). Verified by
  * algebraic invariants (no SQL oracle can express an eigen solve):
  * plane fixed-point, quadratic-surface noise reduction vs the known
  * ground truth, small-neighborhood pass-through, eigensolver unit
  * cases, and the pipeline stage. */
class SmoothSpec extends AnyFunSuite {
  import TestSpark._

  private val space = CellSpace(0, 0, 1024, 1024)

  /** Deterministic grid cloud on z = f(x,y) + noise(i). */
  private def cloud(f: (Double, Double) => Double,
                    noise: Int => Double) = {
    import spark.implicits._
    val pts = for (i <- 0 until 40; j <- 0 until 40) yield {
      val x = 100.0 + i * 0.5
      val y = 100.0 + j * 0.5
      ("d0", i * 40 + j, x, y, f(x, y) + noise(i * 40 + j))
    }
    pts.toDF("doc_id", "span_idx", "x", "y", "z")
  }

  test("eigensolver: diagonal, axis-aligned and known anisotropic matrices") {
    val e1 = SmoothOps.smallestEigvec(3.0, 0, 0, 2.0, 0, 1.0)
    assert(e1.toSeq === Seq(0.0, 0.0, 1.0))
    // covariance of points spread in x/y, flat in z => normal ~ z
    val e2 = SmoothOps.smallestEigvec(5.0, 0.1, 0.0, 4.0, 0.0, 0.01)
    assert(math.abs(e2(2)) > 0.999)
    // rotated: plane x=y (normal (1,-1,0)/sqrt2): cov = I - nnT scaled
    val e3 = SmoothOps.smallestEigvec(0.5, 0.5, 0.0, 0.5, 0.0, 1.0)
    assert(math.abs(e3(0) + e3(1)) < 1e-9) // +-(1,-1,0)/sqrt2
    assert(math.abs(math.abs(e3(0)) - math.sqrt(0.5)) < 1e-9)
  }

  test("points already on a plane are a fixed point (projection + zero poly)") {
    val df = cloud((x, y) => 2.0 * x + 3.0 * y + 5.0, _ => 0.0)
    val out = SmoothOps.mlsSmooth(radius = 2.0, level = 8, space = space)(df)
    val moved = out.select(
      max(abs(col("z") - (col("x") * 2.0 + col("y") * 3.0 + 5.0))).as("dz"))
      .head().getDouble(0)
    assert(moved < 1e-6, s"plane points moved by $moved")
    assert(out.count() === 1600)
  }

  test("noisy quadratic surface: MLS shrinks RMS residual to ground truth") {
    def truth(x: Double, y: Double) =
      0.02 * (x - 110) * (x - 110) + 0.01 * (x - 110) * (y - 110) + 0.3 * y
    // deterministic +-0.25 alternating pseudo-noise
    val df = cloud(truth, i => (((i * 2654435761L) >>> 16) % 501 - 250) / 1000.0)
    val out = SmoothOps.mlsSmooth(radius = 2.0, level = 8, space = space)(df)
    def rms(d: org.apache.spark.sql.DataFrame): Double = {
      val r = d.select(avg(pow(col("z") -
        (lit(0.02) * (col("x") - 110) * (col("x") - 110) +
         lit(0.01) * (col("x") - 110) * (col("y") - 110) +
         lit(0.3) * col("y")), 2.0)).as("ms")).head().getDouble(0)
      math.sqrt(r)
    }
    val before = rms(df)
    val after = rms(out)
    assert(after < before / 2.0,
      s"MLS did not denoise: rms $before -> $after")
    // x/y barely move for a height-noise field (plane is near-horizontal
    // locally after the quadratic trend; projection shifts are bounded
    // by the noise scale)
    val dxy = out.select(col("doc_id"), col("span_idx"), col("x").as("ox"))
      .join(df.select(col("doc_id"), col("span_idx"), col("x").as("ix")),
        Seq("doc_id", "span_idx"))
      .select(max(abs(col("ox") - col("ix")))).head().getDouble(0)
    assert(dxy < 0.5)
  }

  test("isolated points (fewer than 3 neighbors) pass through unchanged") {
    import spark.implicits._
    val df = Seq(("d0", 0, 10.0, 10.0, 7.0), ("d0", 1, 500.0, 500.0, 3.0))
      .toDF("doc_id", "span_idx", "x", "y", "z")
    val out = SmoothOps.mlsSmooth(radius = 2.0, level = 8, space = space)(df)
      .orderBy("span_idx").collect()
    assert(out(0).getAs[Double]("z") === 7.0)
    assert(out(1).getAs[Double]("z") === 3.0)
  }

  test("non-xyz columns and row count survive; pipeline stage runs") {
    import spark.implicits._
    val base = cloud((x, y) => 0.5 * x, _ => 0.1)
      .withColumn("intensity", (col("span_idx") % 100).cast("int"))
    val out = SmoothOps.mlsSmooth(2.0, 8, space = space)(base)
    assert(out.count() === 1600)
    assert(out.filter(col("intensity") === col("span_idx") % 100).count() === 1600)

    val spec = s"""{"pipeline":[
      {"type":"readers.faux","mode":"ramp","bounds":[100,100,0,120,120,10],"count":500},
      {"type":"filters.smooth","radius":2.0,"level":8,
       "space":[0.0,0.0,1024.0,1024.0]}
    ]}"""
    val df = graft.plans.Pipeline.run(spark, spec).df
    assert(df.count() === 500)
  }
}
