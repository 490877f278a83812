package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Progressive Morphological Filter ground classification (Zhang et al.
  * 2003), the algorithm behind the reference's filters.ground /
  * filters.pclblock PMF (plugins/pcl/filters/GroundFilter.cpp:80-195;
  * parameters PCLPipeline.hpp:371-418: cellSize, maxWindowSize, slope,
  * initialDistance, maxDistance, exponential base).
  *
  * Distributed shape (the "raster side" of raster<->vector): the min-Z
  * surface is a cell-keyed DataFrame; each morphological erosion/dilation
  * is a SEPARABLE neighbor-expansion: explode each cell along one axis
  * then aggregate min (or max) — two passes of (2hw+1)x fan-out per op
  * instead of one (2hw+1)^2 pass (square-window min/max is separable into
  * row then column passes; van Herk's 3-ops-per-pixel scan is the next
  * step if window sizes grow). k iterations = 4k hash aggregates, all on
  * the RASTER (cell count), never on the full point set; the point set is
  * touched exactly twice: the initial min aggregate and the final
  * classification join.
  */
object GroundOps {

  final case class PmfParams(
    cellSize: Double = 1.0,
    maxWindowSize: Double = 33.0,
    slope: Double = 1.0,
    initialDistance: Double = 0.15,
    maxDistance: Double = 2.5,
    base: Double = 2.0,
    exponential: Boolean = true)

  /** Window half-size ladder, PCL ProgressiveMorphologicalFilter
    * semantics: window_size_k = 2*base^k+1 (exponential) or 2*k*base+1
    * (linear), until > maxWindowSize. */
  def windowLadder(p: PmfParams): Seq[Int] = {
    Iterator.from(0)
      .map { k =>
        val hw = if (p.exponential) math.pow(p.base, k) else (k + 1) * p.base
        hw.toInt
      }
      .map(hw => 2 * hw + 1)
      .takeWhile(_ <= p.maxWindowSize)
      .toSeq.distinct
  }

  /** One separable morphological pass (min or max over a (2hw+1)^2 cell
    * neighborhood) over a raster DF keyed (cx, cy) with value column `v`. */
  private def morph(raster: DataFrame, hw: Int, isMin: Boolean): DataFrame = {
    val offs = array((-hw to hw).map(lit): _*)
    def pass(df: DataFrame, key: String): DataFrame = {
      val aggFn: Column => Column = if (isMin) min else max
      df.withColumn("__o", explode(offs))
        .withColumn(key, col(key) + col("__o"))
        .groupBy(col("cx"), col("cy"))
        .agg(aggFn(col("v")).as("v"))
    }
    pass(pass(raster, "cx"), "cy")
  }

  /** Classify ground points: returns df with `classification` set to 2
    * (ASPRS ground, GroundFilter.cpp:159) for ground hits, or — with
    * `extract = true` — only the ground points (GroundFilter.cpp:166-175).
    */
  def pmf(p: PmfParams = PmfParams(), extract: Boolean = false)(df: DataFrame): DataFrame = {
    val cx = floor(col("x") / p.cellSize).cast(LongType)
    val cy = floor(col("y") / p.cellSize).cast(LongType)
    // min-Z surface raster (only occupied cells; morphology over occupied
    // cells only — matching a point-cloud PMF rather than a dense raster)
    // materialized once (eager localCheckpoint, ContextCleaner-freed —
    // not a CacheManager entry that outlives the query): read by the
    // first erosion AND by `occupied` on every morphology round
    var surface = df.select(cx.as("cx"), cy.as("cy"), col("z"))
      .groupBy("cx", "cy").agg(min("z").as("v"))
      .localCheckpoint(eager = true)
    val occupied = surface.select("cx", "cy")

    val windows = windowLadder(p)
    var prevW = windows.headOption.getOrElse(1)
    var dh = p.initialDistance
    for (w <- windows) {
      val hw = (w - 1) / 2
      dh = math.min(p.slope * (w - prevW) * p.cellSize + p.initialDistance, p.maxDistance)
      // opening = erosion then dilation, clipped back to occupied cells
      val opened = morph(morph(surface, hw, isMin = true), hw, isMin = false)
        .join(occupied, Seq("cx", "cy"), "left_semi")
      // progressive surface: cells rising more than dh above the opened
      // surface are non-ground returns — replace with opened value
      surface = surface.as("s").join(opened.as("o"), Seq("cx", "cy"))
        .select(col("cx"), col("cy"),
          when(col("s.v") - col("o.v") > dh, col("o.v")).otherwise(col("s.v")).as("v"))
        .localCheckpoint(eager = false)
      prevW = w
    }
    val lastDh = dh
    val classified = df
      .withColumn("__cx", cx).withColumn("__cy", cy)
      .join(surface.withColumnRenamed("cx", "__cx").withColumnRenamed("cy", "__cy"),
        Seq("__cx", "__cy"), "left")
      .withColumn("__ground", col("v").isNotNull && (col("z") - col("v") <= lit(lastDh)))
      .drop("v")
    val out =
      if (extract) classified.filter(col("__ground"))
      else {
        val existing = if (df.columns.contains("classification")) col("classification")
                       else lit(0).cast(ShortType)
        classified.withColumn("classification",
          when(col("__ground"), lit(2).cast(ShortType)).otherwise(existing))
      }
    out.drop("__cx", "__cy", "__ground")
  }
}
