package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Byte-pair-merge tokenizer (TextOps.Bpe): pinned encodings, the
  * rank-sequential == classic-priority-loop equivalence property (the
  * well-formedness argument in the Bpe scaladoc, checked empirically
  * over random strings), and the Spark expression against the driver
  * encoder. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import TextOps.Bpe

  test("pinned encodings over the fixture merge table") {
    assert(Bpe.tokens("the") === Seq("the"))
    assert(Bpe.tokens("and") === Seq("and"))
    // (t,h) then (th,e) fire inside 'other'; 'e' is consumed so (e,r)
    // cannot apply afterwards
    assert(Bpe.tokens("other") === Seq("o", "the", "r"))
    assert(Bpe.tokens("ingot") === Seq("ing", "o", "t"))
    assert(Bpe.tokens("standing") === Seq("st", "and", "ing"))
    assert(Bpe.tokens("the fast") === Seq("the", " ", "f", "a", "st"))
    assert(Bpe.tokens("") === Seq.empty)
    assert(Bpe.tokens("q") === Seq("q"))
    // greedy left-to-right non-overlap: 'ttt' + (t,t) absent; 'aaa' has
    // no (a,a) merge — pick one that exists: 'ononon' with (o,n)
    assert(Bpe.tokens("ononon") === Seq("on", "on", "on"))
  }

  /** Classic BPE encode: repeatedly merge ALL (leftmost-first,
    * non-overlapping) occurrences of the lowest-rank applicable pair. */
  private def classic(text: String): IndexedSeq[String] = {
    var toks: Vector[String] = text.map(_.toString).toVector
    val rank = Bpe.merges.zipWithIndex.toMap
    var done = false
    while (!done) {
      val present = toks.indices.dropRight(1)
        .flatMap(i => rank.get((toks(i), toks(i + 1))))
      if (present.isEmpty) done = true
      else {
        val (a, b) = Bpe.merges(present.min)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  test("rank-sequential application equals the classic priority loop") {
    val alphabet = "thetheandinorstofgchr ed"
    val rnd = new scala.util.Random(20260818L)
    for (_ <- 0 until 500) {
      val s = (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Bpe.tokens(s) === classic(s), s"diverged on '$s'")
    }
  }

  test("Spark expression matches the driver encoder on the documents table") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("doc_id", col("doc_id").cast("string"))
    val got = TextOps.bpeTokenCounts(d).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val want = d.select("doc_id", "text").collect()
      .map(r => r.getString(0) -> Bpe.tokens(r.getString(1)).length).toMap
    assert(got === want)
  }
}
