package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SpatialFunctions
import graft.index.CellSpace

/** Skew handling for dense tiles — the two mechanisms the engine uses
  * at scale (dense urban cells in an otherwise sparse cloud are the
  * norm, not the exception):
  *
  *  1. salted repartition: spread one hot key over S sub-partitions
  *     with a salt that is a PURE function of (key, doc_id) so reruns
  *     and resumed runs place rows identically (deterministic-salt
  *     requirement from SURVEY.md §7 hard parts).
  *  2. adaptive cell-resolution splitting: cells whose population
  *     exceeds a budget recursively split to finer levels, giving a
  *     mixed-resolution tiling whose per-cell counts are bounded —
  *     the declarative analog of the chipper's capacity contract, and
  *     of AQE's skew-split applied to spatial keys.
  */
object SkewOps {

  /** Deterministic salt in [0, salts): pure function of the row's
    * (key, doc_id, span_idx) — identical across reruns. */
  def salt(salts: Int): Column =
    pmod(xxhash64(col("doc_id"), col("span_idx")), lit(salts.toLong))

  /** Salted two-stage aggregation: partial per (key, salt), final per
    * key. Same result as a direct groupBy, but a hot key's partial
    * state is built on `salts` cores instead of one. Aggregations must
    * be algebraic pairs (partialExprs on rows, finalExprs on partials). */
  def saltedAgg(keys: Seq[Column], salts: Int,
                partialExprs: Seq[Column], finalExprs: Seq[Column])
               (df: DataFrame): DataFrame = {
    // the final stage groups by the partial output's key COLUMNS (the
    // original key expressions referenced pre-aggregation columns)
    val keyNames = df.select(keys: _*).schema.fieldNames.toSeq
    df.withColumn("__salt", salt(salts))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
      .groupBy(keyNames.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }

  /** Salted repartition: co-locate by (key, salt) instead of key so one
    * hot tile spreads over `salts` tasks; downstream per-tile work that
    * is associative (local indexes, per-chunk encoders, writers) runs
    * on the sub-partitions. */
  def saltedRepartition(keys: Seq[Column], salts: Int)(df: DataFrame): DataFrame =
    df.withColumn("__salt", salt(salts))
      .repartition((keys :+ col("__salt")): _*)

  /** Adaptive cell-resolution splitting: assign each point the id of
    * the FINEST ancestor cell, starting at `baseLevel`, such that the
    * chosen cell's population <= budget (or `maxLevel` is reached).
    * Dense cells descend the ladder; sparse regions stay coarse.
    *
    * Shape: one aggregate per refinement round over ONLY the still-dense
    * subset (shrinks geometrically); the dense-cell set rides the plan
    * as a broadcast hash set. Deterministic: depends only on data and
    * budget. Returns df + `cell` (mixed levels). */
  def adaptiveCells(budget: Long, baseLevel: Int, maxLevel: Int,
                    space: CellSpace = CellSpace.default)(df: DataFrame): DataFrame = {
    require(maxLevel >= baseLevel)
    var level = baseLevel
    var out = df.withColumn("cell",
      SpatialFunctions.cellId(col("x"), col("y"), baseLevel, space))
    // iteratively: find over-budget cells at the current level, push
    // ONLY their points one level down
    while (level < maxLevel) {
      val dense = out.filter(lvlOf(col("cell")) === level)
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        .filter(col("n") > budget)
        .select("cell").collect().map(_.getLong(0))
      if (dense.isEmpty) return out
      val denseSet = {
        val s = new java.util.HashSet[java.lang.Long](dense.length * 2)
        dense.foreach(s.add(_)); s
      }
      val inDense = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        CellSetContains(org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("cell")),
          denseSet))
      level += 1
      out = out.withColumn("cell",
        when(inDense, SpatialFunctions.cellId(col("x"), col("y"), level, space))
          .otherwise(col("cell")))
    }
    out
  }

  private def lvlOf(cell: Column): Column = cell.bitwiseAND(lit(63L)).cast(IntegerType)
}
