package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column independent of catalyst Expressions; the official
  * bridge (classic.ExpressionUtils) is private[sql]. This shim lives in a
  * subpackage of org.apache.spark.sql purely to re-export the two
  * conversions our custom expressions need. No Spark internals are
  * reimplemented here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an RDD of InternalRows without the external-Row
    * encoder layer (the official `internalCreateDataFrame` is
    * private[sql]). The fast path for binary-format ingest: decoders
    * write UnsafeRows directly instead of boxing ~20 objects per point
    * through Row + RowEncoder. */
  def internalCreateDataFrame(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Number of plans pinned in the session's CacheManager. Used by the
    * cache-hygiene spec: operators that `.cache()` internally must
    * release the entry before returning (a leaked entry is pinned for
    * the session's lifetime — steady memory creep in long-lived
    * sessions), so running them must not change this count.
    * `sharedState` is private[sql] and `cachedData` class-private,
    * hence this bridge + reflection. */
  def cacheEntryCount(spark: SparkSession): Int = {
    val cm = spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[scala.collection.immutable.IndexedSeq[_]].size
  }
}
