package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.model.Model

/** ScalaCheck property: for ARBITRARY well-formed doc tables (any mix of
  * span kinds, any text/media payloads, any offsets), explode -> identity
  * -> implode reproduces the exact span sequence — the BASELINE.json
  * per-row invariant, quantified instead of fixtured. */
class SpanCodecPropertySpec extends AnyFunSuite {
  import TestSpark._

  private val genText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '|', ':', 'ü', '句')))
      .map(_.mkString).map(_.take(40))

  private val genPointPayload: Gen[String] = for {
    xi <- Gen.choose(0L, 2047L); yi <- Gen.choose(0L, 2047L)
    zi <- Gen.choose(0L, 4000L); in <- Gen.choose(0, 65535)
    pid <- Gen.choose(0L, 1000000L)
  } yield s"$xi,$yi,$zi,$in,$pid"

  private val genSpan: Gen[(String, String, String)] = Gen.frequency(
    (3, genPointPayload.map(p => ("point", p, ""))),
    (2, genText.map(t => ("text", t, ""))),
    (1, Gen.choose(0, 99999).map(i => ("media", "", s"blob://$i"))))

  private val genDoc: Gen[(String, Seq[(String, String, String, Int)])] = for {
    id <- Gen.choose(0, 100000).map(_.toString)
    n <- Gen.choose(1, 12)
    spans <- Gen.listOfN(n, genSpan)
  } yield (id, spans.zipWithIndex.map { case ((k, t, m), i) => (k, t, m, i) })

  test("explode -> implode is the identity on span sequences (property)") {
    // plain-scalacheck sampling (the scalatest+scalacheck bridge isn't in
    // the offline artifact cache): 8 deterministic seeds, 8 docs each
    (1 to 8).foreach { trial =>
      val docsGen = Gen.listOfN(8, genDoc)
        .apply(Gen.Parameters.default, Seed(42L + trial)).getOrElse(Nil)
      val distinct = docsGen.distinctBy(_._1)
      if (distinct.nonEmpty) {
        val rows = distinct.map { case (id, spans) =>
          Row(id, spans.map { case (k, t, m, o) => Row(k, t, m, o) })
        }
        val docs = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), Model.docSchema)
        val roundTrip = Model.implode(docs, Model.explodePoints(docs))
        val got = Model.spanSignature(roundTrip).orderBy("doc_id").collect()
        val want = Model.spanSignature(docs).orderBy("doc_id").collect()
        assert(got.toSeq === want.toSeq)
      }
    }
  }
}
