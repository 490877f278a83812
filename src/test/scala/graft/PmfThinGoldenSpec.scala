package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LasDecode
import graft.plans.PclBlock

/** The reference's RUN_SLOW_TESTS exact-PMF expectations
  * (plugins/pcl/test/PCLBlockFilterTest.cpp:192-217) on
  * autzen-thin.las (10653 points) — disabled in the reference's CI for
  * speed, recorded with expected counts when written. They sweep every
  * PMF parameter one at a time off the defaults (CellSize, WindowSize,
  * Slope, MaxDistance, InitialDistance, Base, Exponential=false —
  * the LINEAR window schedule — and Negative=true), so together they
  * falsify the whole published schedule, both ladder branches, the
  * double-cellSize threshold quirk, and the keep/negative extraction.
  * The bucketed window joins run the 10k-point sweep in seconds. */
class PmfThinGoldenSpec extends AnyFunSuite {
  import TestSpark._

  private val FixDir = s"$RefData/filters/pcl"
  private lazy val thin =
    LasDecode.asDataFrame(spark, s"$RefData/autzen/autzen-thin.las")
      .localCheckpoint(true)

  private def runFixture(json: String): Long =
    PclBlock.runFile(thin, s"$FixDir/$json.json").count()

  test("filter_PMF_1 thin -> 9223 (all defaults)") {
    assert(runFixture("filter_PMF_1") === 9223L)
  }
  test("filter_PMF_2 thin -> 8298 (CellSize 3)") {
    assert(runFixture("filter_PMF_2") === 8298L)
  }
  test("filter_PMF_3 thin -> 7970 (MaxWindowSize 50)") {
    assert(runFixture("filter_PMF_3") === 7970L)
  }
  test("filter_PMF_4 thin -> 9206 (Slope 0.25)") {
    assert(runFixture("filter_PMF_4") === 9206L)
  }
  test("filter_PMF_5 thin -> 9373 (MaxDistance 5)") {
    assert(runFixture("filter_PMF_5") === 9373L)
  }
  test("filter_PMF_6 thin -> 9229 (InitialDistance 0.25)") {
    assert(runFixture("filter_PMF_6") === 9229L)
  }
  test("filter_PMF_7 thin -> 8298 (Base 3)") {
    assert(runFixture("filter_PMF_7") === 8298L)
  }
  test("filter_PMF_8 thin -> 9138 (Exponential=false: the LINEAR schedule)") {
    assert(runFixture("filter_PMF_8") === 9138L)
  }
  test("filter_PMF_9 thin -> 1430 (Negative=true: the non-ground complement)") {
    assert(runFixture("filter_PMF_9") === 1430L)
  }
}
