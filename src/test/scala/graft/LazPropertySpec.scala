package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.{LasDecode, LasWriter}
import org.apache.spark.sql.Row

/** ScalaCheck property for the clean-room LASzip codec: ARBITRARY point
  * clouds (adversarial coordinate jumps, full-range intensities/returns/
  * classifications, random gps times and colors, duplicate points)
  * survive writeLaz -> readPoints EXACTLY on the quantized grid — the
  * fixture round-trips quantified. Multi-chunk included (chunk size
  * smaller than the cloud). */
class LazPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val genPoint: Gen[Row] = for {
    // mix smooth neighborhoods with violent jumps (k up to 32 correctors)
    x <- Gen.frequency((3, Gen.choose(-1000.0, 1000.0)),
      (1, Gen.oneOf(-1.0e6, 1.0e6, 0.0))) // 1e9 grid steps: k ~ 30-31 correctors
    y <- Gen.frequency((3, Gen.choose(-1000.0, 1000.0)),
      (1, Gen.oneOf(-1.0e6, 1.0e6, 123.456)))
    z <- Gen.choose(-100.0, 4000.0)
    intensity <- Gen.frequency((3, Gen.choose(0, 300)), (1, Gen.oneOf(0, 65535)))
    ret <- Gen.choose(1, 7)
    num <- Gen.choose(1, 7)
    cls <- Gen.frequency((3, Gen.choose(0, 2)), (1, Gen.choose(0, 255)))
    ang <- Gen.choose(-90, 90)
    usr <- Gen.choose(0, 255)
    psid <- Gen.frequency((3, Gen.choose(0, 10)), (1, Gen.choose(0, 65535)))
    gps <- Gen.frequency((3, Gen.choose(0.0, 1.0e6)),
      (1, Gen.oneOf(0.0, -1.5e-200, 1.7e300)))
    r <- Gen.choose(0, 65535); g <- Gen.choose(0, 65535); b <- Gen.choose(0, 65535)
    grey <- Gen.prob(0.3) // some points with r==g==b (the copied-rgb path)
  } yield Row("p", 0, x, y, z, intensity, ret.toShort, num.toShort, cls.toShort,
    ang.toFloat, usr.toShort, psid, gps,
    r, if (grey) r else g, if (grey) r else b, 0, 0.toShort)

  test("writeLaz -> readPoints is lossless on the quantized grid (property, multi-chunk)") {
    val xf = LasWriter.XForms(0.001, 0.001, 0.001, 0, 0, 0)
    (1 to 6).foreach { seedId =>
      val n = 120 + seedId * 37
      val rows = Gen.listOfN(n, genPoint)
        .apply(Gen.Parameters.default, Seed(seedId.toLong)).get
        .zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq.updated(1, i)) // span_idx
        }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), LasDecode.schema)
        .orderBy("span_idx")
      val out = java.nio.file.Files.createTempFile(s"graftlazprop$seedId", ".laz").toString
      // chunkSize 50 -> several chunks per file
      LasWriter.writeLaz(out, df, pointFormat = 3, xf, chunkSize = 50)
      val (h, decoded) = LasDecode.readPoints(out)
      assert(h.pointCount === n.toLong, s"seed $seedId count")
      val want = df.collect()
      decoded.zip(want).zipWithIndex.foreach { case ((d, w), i) =>
        // coordinates compare on the quantized grid (scale 0.001)
        Seq(2, 3, 4).foreach { f =>
          assert(math.abs(d.getDouble(f) - w.getDouble(f)) <= 0.0005 + 1e-9,
            s"seed $seedId row $i coord field $f: ${d.getDouble(f)} vs ${w.getDouble(f)}")
        }
        // every other field must be EXACT (gps doubles bit-for-bit)
        Seq(5, 6, 7, 8, 10, 11, 12, 13, 14, 15).foreach { f =>
          assert(d.get(f) === w.get(f), s"seed $seedId row $i field $f")
        }
      }
    }
  }
}
