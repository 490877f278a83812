package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.JoinOps

/** Property test for the exact-kNN machinery (certificate + level
  * escalation): for ARBITRARY small point sets — including duplicate
  * coordinates and isolated far points that force escalation — the
  * distributed result must equal a trivial in-memory brute force,
  * distance-by-distance and neighbor-by-neighbor. This quantifies what
  * the fixed oracles sample: no configuration of points can make the
  * grid approximation silently resurface. */
class KnnPropertySpec extends AnyFunSuite {
  import TestSpark._

  private case class P(doc: String, span: Int, x: Double, y: Double, z: Double)

  // quantized coordinates (0.25 grid) over the full space so duplicate
  // points and exact distance ties are COMMON, plus a huge range so
  // nearest neighbors frequently sit outside the level-6 ring
  private val genPoint: Gen[(Double, Double, Double)] = for {
    xi <- Gen.choose(0, 4095); yi <- Gen.choose(0, 4095); zi <- Gen.choose(0, 512)
  } yield (xi * 0.25, yi * 0.25, zi * 0.25)

  private def brute(pts: Seq[P], k: Int, dims3: Boolean): Map[(String, Int), Seq[Double]] =
    pts.map { p =>
      val ds = pts.filterNot(q => q.doc == p.doc && q.span == p.span)
        .map { q =>
          val dx = p.x - q.x; val dy = p.y - q.y; val dz = p.z - q.z
          val d2 = dx * dx + dy * dy + (if (dims3) dz * dz else 0.0)
          (d2, q.doc, q.span)
        }
        .sortBy(t => (t._1, t._2, t._3))
        .take(k).map(_._1)
      (p.doc, p.span) -> ds
    }.toMap

  test("exactKnnDistances equals brute force on arbitrary point sets (property)") {
    (1 to 6).foreach { trial =>
      val n = 5 + (trial * 11) % 50
      val coords = Gen.listOfN(n, genPoint)
        .apply(Gen.Parameters.default, Seed(1234L + trial)).getOrElse(Nil)
      val pts = coords.zipWithIndex.map { case ((x, y, z), i) => P(s"d$i", i, x, y, z) }
      val df = spark.createDataFrame(pts).toDF("doc_id", "span_idx", "x", "y", "z")
      val k = 1 + trial % 4
      val got = JoinOps.exactKnnDistances(df, df, k, startLevel = 6,
        dims3 = true, excludeSelf = true)
        .select(col("doc_id"), col("span_idx"), col("__nnd2"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq)
        .toMap
      val want = brute(pts, k, dims3 = true).filter(_._2.nonEmpty)
      assert(got.keySet === want.keySet, s"trial $trial point-set mismatch")
      want.foreach { case (key, ds) =>
        assert(got(key) === ds, s"trial $trial k=$k point $key")
      }
    }
  }

  test("exactNearest picks the brute-force nearest with the (d2, doc, span) tie-break") {
    (1 to 4).foreach { trial =>
      val n = 30
      val coords = Gen.listOfN(n, genPoint)
        .apply(Gen.Parameters.default, Seed(777L + trial)).getOrElse(Nil)
      // duplicate a few points exactly to force distance-0 and tied cases
      val pts0 = coords.zipWithIndex.map { case ((x, y, z), i) => P(s"d$i", i, x, y, z) }
      val pts = pts0 ++ pts0.take(5).zipWithIndex.map { case (p, i) =>
        P(s"dup$i", 1000 + i, p.x, p.y, p.z)
      }
      val df = spark.createDataFrame(pts).toDF("doc_id", "span_idx", "x", "y", "z")
      val src = df.filter(col("span_idx") < 1000)
      val got = JoinOps.exactNearest(src, df, startLevel = 6, dims3 = false)
        .select(col("doc_id"), col("__n.nx"), col("__n.ny")).collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      pts0.foreach { p =>
        val best = pts
          .map { q =>
            val dx = p.x - q.x; val dy = p.y - q.y
            (dx * dx + dy * dy, q.doc, q.span, q)
          }
          .minBy(t => (t._1, t._2, t._3))._4
        assert(got(p.doc) === ((best.x, best.y)), s"trial $trial point ${p.doc}")
      }
    }
  }
}
