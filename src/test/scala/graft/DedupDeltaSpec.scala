package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Substring-level exact dedup + Bloom corpus-delta dedup — invariants
  * beyond the SQL oracles: hand-crafted span counts, zero-row edges, and
  * the exactness-under-false-positives property (a deliberately tiny,
  * collision-heavy Bloom filter must not change the output). */
class DedupDeltaSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("substringDup counts duplicated n-gram spans exactly on crafted docs") {
    // d1/d2 share the 3-gram "alpha beta gamma" (one position each);
    // d3 repeats "x y z" twice WITHIN itself; d4 has no duplicates;
    // d5 is too short for any 3-gram
    val docs = Seq(
      ("1", "alpha beta gamma delta"),
      ("2", "zz alpha beta gamma"),
      ("3", "x y z w x y z"),
      ("4", "unique words only here"),
      ("5", "tiny doc")
    ).toDF("doc_id", "text")
    val out = TextOps.substringDup(3)(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // d3: grams x-y-z (pos 1), y-z-w, z-w-x, w-x-y, x-y-z (pos 5)
    //  -> "x y z" occurs twice => 2 dup positions, 1 distinct dup gram
    assert(out === Seq(
      ("1", 1L, 1L), ("2", 1L, 1L), ("3", 2L, 1L), ("4", 0L, 0L), ("5", 0L, 0L)))
  }

  test("substringDup on an empty frame returns an empty frame") {
    val empty = Seq.empty[(String, String)].toDF("doc_id", "text")
    assert(TextOps.substringDup(3)(empty).count() === 0L)
  }

  test("bloomDeltaDedup equals a plain anti-join, even with a collision-heavy filter") {
    val corpus = Seq(("c1", "shared text one"), ("c2", "corpus only"),
      ("c3", "shared text two")).toDF("doc_id", "text")
    val batch = Seq(("b1", "shared text one"), ("b2", "brand new"),
      ("b3", "shared text two"), ("b4", "also new"), ("b5", "brand new"))
      .toDF("doc_id", "text")
    val expected = TextOps.fingerprint(batch)
      .join(TextOps.fingerprint(corpus).select("fp"), Seq("fp"), "left_anti")
      .select("doc_id").as[String].collect().sorted.toSeq
    // normal parameters
    val out1 = TextOps.bloomDeltaDedup(corpus, batch)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(out1 === expected)
    assert(out1 === Seq("b2", "b4", "b5")) // batch-internal dups kept (corpus-delta only)
    // 1-item expectation + 40% fpp => the BF saturates and false
    // positives are near-certain; the exact confirm must strip them all
    val out2 = TextOps.bloomDeltaDedup(corpus, batch, expectedItems = 1L, fpp = 0.4)
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(out2 === expected)
  }

  test("bloomDeltaDedup: disjoint corpus keeps the whole batch; identical corpus empties it") {
    val a = Seq(("1", "aa"), ("2", "bb")).toDF("doc_id", "text")
    val b = Seq(("9", "cc"), ("8", "dd")).toDF("doc_id", "text")
    assert(TextOps.bloomDeltaDedup(a, b).count() === 2L)
    assert(TextOps.bloomDeltaDedup(a, a).count() === 0L)
  }
}
