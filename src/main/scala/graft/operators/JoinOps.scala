package graft.operators

import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import org.locationtech.jts.geom.Geometry
import graft.functions.SpatialFunctions
import graft.index.{CellSpace, PolygonCover, GeomCache, CellCover}

/** O(1) membership test against a driver-computed cell set (rides the
  * plan as a reference object; small — a polygon cover). */
case class CellSetContains(child: Expression, cells: java.util.HashSet[java.lang.Long])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_set_contains"
  override protected def nullSafeEval(v: Any): Any = cells.contains(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addReferenceObj("cells", cells, "java.util.HashSet<Long>")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $set.contains($c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bounded k-smallest mean: keeps the k smallest values seen in a
  * max-heap-ordered buffer (reference stats::Summary-style streaming
  * aggregate object, SURVEY.md §2.6 -> Aggregator). Mergeable, so Spark
  * runs it partial+final with map-side combine. */
class KnnMeanAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Double, Array[Double], Double] {
  import org.apache.spark.sql.{Encoder, Encoders}
  // buffer: the up-to-k smallest values, max at slot 0 (binary max-heap)
  override def zero: Array[Double] = Array.empty
  private def siftUpDown(h: Array[Double]): Unit = {
    // restore heap after replacing the root
    var i = 0
    val n = h.length
    while (true) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < n && h(l) > h(m)) m = l
      if (r < n && h(r) > h(m)) m = r
      if (m == i) return
      val t = h(i); h(i) = h(m); h(m) = t
      i = m
    }
  }
  override def reduce(b: Array[Double], v: Double): Array[Double] = {
    if (b.length < k) {
      val nb = java.util.Arrays.copyOf(b, b.length + 1)
      nb(b.length) = v
      // sift up the new leaf
      var i = b.length
      while (i > 0 && nb((i - 1) / 2) < nb(i)) {
        val p = (i - 1) / 2; val t = nb(p); nb(p) = nb(i); nb(i) = t; i = p
      }
      nb
    } else if (v < b(0)) { b(0) = v; siftUpDown(b); b }
    else b
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(reduce)
  override def finish(b: Array[Double]): Double =
    if (b.isEmpty) Double.NaN else b.sum / b.length
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Spatial joins. The common machinery is the cell-cover prefilter
  * generalizing the reference's bbox + prepared-geometry pattern
  * (CropFilter.cpp:139-151; AttributeFilter.cpp:307-330 QuadIndex bbox
  * query then exact contains): interior-cell points skip the exact test
  * entirely; boundary-cell points get one prepared-geometry call. */
object JoinOps {
  import ExpressionUtils.{column => toCol, expression => toExpr}

  private def cellSet(ids: Array[Long]): java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](math.max(16, ids.length * 2))
    ids.foreach(i => s.add(i))
    s
  }

  /** filters.crop, polygon mode (CropFilter.cpp:108-151, 242-270): keep
    * points inside the WKT polygon (or outside, with the flag). Planned
    * as: bbox filter (pushes to the scan) AND (interior-cell OR exact
    * prepared contains). Single broadcast-free pass — the polygon and
    * its cover ride the plan as literals (they are O(perimeter) small).
    */
  def cropPolygon(wkt: String, outside: Boolean = false,
                  space: CellSpace = CellSpace.default,
                  coverLevel: Int = -1)(df: DataFrame): DataFrame = {
    val geom = PolygonCover.fromWkt(wkt)
    val env = geom.getEnvelopeInternal
    val level = if (coverLevel >= 0) coverLevel else PolygonCover.autoLevel(geom, space)
    val cover = PolygonCover.cover(geom, space, level)
    val wkb = GeomCache.toWkb(geom)
    // interior cells kept compact (mixed levels): test membership of the
    // point's ancestor cell at each distinct interior level (few).
    val interiorLevels = cover.interior.map(CellSpace.level).distinct.sorted
    val bbox = col("x").between(env.getMinX, env.getMaxX) &&
      col("y").between(env.getMinY, env.getMaxY)
    val interiorHit: Column = interiorLevels.map { lvl =>
      val ids = cover.interior.filter(CellSpace.level(_) == lvl)
      toCol(CellSetContains(
        toExpr(SpatialFunctions.cellId(col("x"), col("y"), lvl, space)), cellSet(ids)))
    }.foldLeft(lit(false))(_ || _)
    val exact = SpatialFunctions.stContainsXY(wkb, col("x"), col("y"))
    val boundaryHit = toCol(CellSetContains(
      toExpr(SpatialFunctions.cellId(col("x"), col("y"), level, space)),
      cellSet(cover.boundary))) && exact
    val inside = bbox && (interiorHit || boundaryHit)
    df.filter(if (outside) !inside else inside)
  }

  /** Document-level crop: prune whole documents by their stored bbox
    * columns BEFORE exploding spans — the Iceberg-manifest / tindex
    * analog (reference kernels/tindex/TIndexKernel.cpp:285-397 prunes
    * files by boundary polygon before reading them). On a doc table
    * written with [[graft.sources.DocSynth.withDocBounds]] the bbox
    * conjunction reaches the parquet scan as min/max-stat row-group
    * skipping, so documents wholly outside the polygon are never
    * decoded. Survivors explode and get the exact PIP filter. */
  def cropPolygonDocs(wkt: String, space: CellSpace = CellSpace.default)
                     (docs: DataFrame): DataFrame = {
    val geom = PolygonCover.fromWkt(wkt)
    val env = geom.getEnvelopeInternal
    val pruned =
      if (docs.columns.contains("minx"))
        docs.filter(col("maxx") >= env.getMinX && col("minx") <= env.getMaxX &&
          col("maxy") >= env.getMinY && col("miny") <= env.getMaxY)
      else docs
    cropPolygon(wkt, space = space)(graft.model.Model.explodePoints(pruned))
  }

  /** filters.attribute, PIP mode (AttributeFilter.cpp:238-336): for each
    * point, find the polygons containing it and set `dim` to the LAST
    * matching feature's value (the reference iterates features in order,
    * each overwriting). Points matching nothing keep their old value.
    *
    * Physical shape: polygons' uniform-level cell covers explode into a
    * (cell, feature) table, broadcast-joined to points on cell id (the
    * polygon set is the small side by assumption; pass broadcastThreshold
    * = false to let it shuffle on cell for huge polygon sets), exact test
    * on boundary cells only, max(feature ordinal) per point, left-join
    * back. Two shuffles max; none if broadcast.
    */
  def attributeJoin(features: Seq[(String, Double)], dim: String,
                    space: CellSpace = CellSpace.default,
                    coverLevel: Int = -1, // -1 = auto from feature perimeters
                    broadcastCover: Boolean = true)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val geoms = features.map { case (wkt, v) => (PolygonCover.fromWkt(wkt), v) }
    val level =
      if (coverLevel >= 0) coverLevel
      else geoms.map(g => PolygonCover.autoLevel(g._1, space)).max
    // COMPACT covers: interior cells stay at their coarse levels —
    // O(perimeter) rows total, never O(area). Boundary rows carry the
    // feature WKB for the exact test; interior rows don't need it.
    val rows = geoms.zipWithIndex.flatMap { case ((geom, value), fi) =>
      val cover = PolygonCover.cover(geom, space, level)
      val wkb = GeomCache.toWkb(geom)
      cover.interior.map(c => (c, fi, value, null: Array[Byte])) ++
        cover.boundary.map(c => (c, fi, value, wkb))
    }
    val coverLevels = rows.map(r => CellSpace.level(r._1)).distinct.sorted
    var coverDf = rows.toDF("cell", "fi", "value", "wkb")
    if (broadcastCover) coverDf = broadcast(coverDf)
    // each point explodes to its ancestor cell at every level present in
    // any cover (a handful) — the mixed-level equi-join key
    val ancestors = array(coverLevels.map(l =>
      SpatialFunctions.cellId(col("x"), col("y"), l, space)): _*)
    val pid = Seq(col("doc_id"), col("span_idx"))
    val matches = df
      .select(pid ++ Seq(col("x"), col("y")): _*)
      .withColumn("__cell", explode(ancestors))
      .join(coverDf, col("__cell") === col("cell"), "inner")
      .filter(col("wkb").isNull ||
        toCol(graft.functions.STContainsDyn(toExpr(col("wkb")), toExpr(col("x")), toExpr(col("y")))))
      .groupBy(pid: _*)
      .agg(max_by(col("value"), col("fi")).as("__attr"))
    df.join(matches, Seq("doc_id", "span_idx"), "left")
      .withColumn(dim, coalesce(col("__attr"), col(dim)))
      .drop("__attr")
  }

  /** filters.colorization — raster -> vector sample join
    * (ColorizationFilter.cpp:176-240): inverse-geotransform each point to
    * a pixel/line, read band values, dim := pixel * scale; points outside
    * the raster are left untouched. The raster is a DataFrame of
    * (px, py, band...) tiles — broadcast when small. Geotransform gt is
    * GDAL-style [originX, pixelW, rotX, originY, rotY, pixelH].
    */
  def colorize(raster: DataFrame, gt: Array[Double],
               bands: Seq[(String, String, Double)], // (rasterCol, dim, scale)
               broadcastRaster: Boolean = true)(df: DataFrame): DataFrame = {
    require(gt.length == 6, "geotransform needs 6 coefficients")
    require(gt(2) == 0 && gt(4) == 0, "rotated rasters unsupported (as in p2g)")
    val px = floor((col("x") - gt(0)) / gt(1)).cast(LongType)
    val py = floor((col("y") - gt(3)) / gt(5)).cast(LongType)
    val r0 = if (broadcastRaster) broadcast(raster) else raster
    val r = r0.select(
      col("px").as("__rpx"), col("py").as("__rpy"),
      struct(bands.map { case (rc, _, _) => col(rc).as(rc) }: _*).as("__bands"))
    val joined = df
      .withColumn("__px", px).withColumn("__py", py)
      .join(r, col("__px") === col("__rpx") && col("__py") === col("__rpy"), "left")
    bands.foldLeft(joined) { case (d, (rc, dim, scale)) =>
      val existing = if (df.columns.contains(dim)) col(dim) else lit(0.0)
      d.withColumn(dim, coalesce(col("__bands").getField(rc) * scale, existing))
    }.drop("__px", "__py", "__rpx", "__rpy", "__bands")
  }

  /** Grid-partitioned kNN pair generation: for each left point, all right
    * points within the 3x3 neighborhood of its level-`level` cell, with
    * their 2D/3D distance. The contract callers must respect (documented
    * reference KDIndex semantics, KDIndex.hpp:54-106): the cell side
    * length at `level` must be >= the largest kNN radius of interest, or
    * far neighbors are missed. Right side is replicated 9x (the classic
    * neighbor-ring replication join); left side shuffles once on cell.
    */
  def knnPairs(left: DataFrame, right: DataFrame, level: Int,
               space: CellSpace = CellSpace.default,
               dims3: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    val nbrUdf = udf((cell: Long) => space.neighborhood(cell))
    val l = left.withColumn("__cell", SpatialFunctions.cellId(col("x"), col("y"), level, space))
    val r = right
      .withColumn("__c0", SpatialFunctions.cellId(col("x"), col("y"), level, space))
      .withColumn("__cell", explode(nbrUdf(col("__c0"))))
      .select(col("__cell"), struct(right.columns.map(col): _*).as("__r"))
    // explicit products, not pow(): bit-identical to the SQL oracle's x*x
    val ddx = col("x") - col("__r.x"); val ddy = col("y") - col("__r.y")
    val dist2d = ddx * ddx + ddy * ddy
    val ddz = col("z") - col("__r.z")
    val dist = if (dims3) sqrt(dist2d + ddz * ddz) else sqrt(dist2d)
    l.join(r, "__cell").withColumn("__dist", dist).drop("__cell", "__c0")
  }

  /** `pdal delta` (DeltaKernel.cpp:114-150, 269-330): for each source
    * point the single nearest candidate point; emits per-point deltas
    * plus min/max/mean/median summary of each delta dimension.
    * Nearest-1 is a min_by hash aggregate (tie-break = the lexicographic
    * (dist, doc, span) struct ordering), NOT a window — no sort of the
    * pair fan-out, map-side combinable. */
  def delta(src: DataFrame, candidates: DataFrame, level: Int,
            space: CellSpace = CellSpace.default,
            detail: Boolean = true): DataFrame = {
    // slim both sides to id + coords before the 9x replication join
    val slim = Seq("doc_id", "span_idx", "x", "y", "z").map(col)
    val pairs = knnPairs(src.select(slim: _*), candidates.select(slim: _*),
      level, space, dims3 = false)
    val nearest = pairs
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(min_by(
        struct((col("x") - col("__r.x")).as("dx"),
          (col("y") - col("__r.y")).as("dy"),
          (col("z") - col("__r.z")).as("dz")),
        struct(col("__dist"), col("__r.doc_id"), col("__r.span_idx"))).as("d"))
      .select(col("doc_id"), col("span_idx"),
        col("d.dx").as("dx"), col("d.dy").as("dy"), col("d.dz").as("dz"))
    if (detail) nearest
    else nearest.agg(
      min("dx").as("min_dx"), max("dx").as("max_dx"), avg("dx").as("mean_dx"), median(col("dx")).as("median_dx"),
      min("dy").as("min_dy"), max("dy").as("max_dy"), avg("dy").as("mean_dy"), median(col("dy")).as("median_dy"),
      min("dz").as("min_dz"), max("dz").as("max_dz"), avg("dz").as("mean_dz"), median(col("dz")).as("median_dz"))
  }

  /** Statistical outlier removal (PCL SOR semantics via filters.pclblock,
    * PCLPipeline.hpp:278-300): per point the mean distance to its k
    * nearest neighbors; keep points with meanDist <= mu + mult * sigma of
    * the global distribution of mean distances. Two jobs: the kNN
    * aggregate, then a scalar threshold broadcast back as a literal-free
    * cross join (1-row DF) filter.
    */
  def statisticalOutlierRemoval(k: Int, multThresh: Double, level: Int,
                                space: CellSpace = CellSpace.default)(df: DataFrame): DataFrame = {
    val pts = df.cache()
    val slim = pts.select("doc_id", "span_idx", "x", "y", "z")
    val pairs = knnPairs(slim, slim, level, space, dims3 = true)
      .filter(!(col("doc_id") === col("__r.doc_id") && col("span_idx") === col("__r.span_idx")))
    // mean distance to the k nearest via a bounded top-k aggregate —
    // one partial+final hash agg over the pair fan-out instead of a
    // window sort of it. Ties at the k boundary have equal distances,
    // so the mean is identical to the rank-based selection.
    // the Aggregator runs via ObjectHashAggregate, which falls back to
    // sort-based after 128 distinct keys by default — catastrophic for
    // per-point grouping (measured 16.8s -> 6.1s on the sf0.1 SOR query)
    df.sparkSession.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
    val knnMean = org.apache.spark.sql.functions.udaf(new KnnMeanAgg(k))
    // cache: meanDist is tiny (one row per point) but feeds BOTH the
    // global threshold and the final join — without it the whole
    // neighbor-pair aggregation runs twice
    val meanDist = pairs
      .groupBy(col("doc_id"), col("span_idx"))
      .agg(knnMean(col("__dist")).as("__md"))
      .cache()
    val thresh = meanDist.agg(
      (avg("__md") + lit(multThresh) * stddev_samp(col("__md"))).as("__t"))
    pts.join(meanDist, Seq("doc_id", "span_idx"), "left")
      .join(broadcast(thresh))
      .filter(col("__md").isNotNull && col("__md") <= col("__t"))
      .drop("__md", "__t")
  }
}
