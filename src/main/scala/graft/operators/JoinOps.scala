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

/** Bounded k-smallest collector: keeps the k smallest values seen in a
  * max-heap-ordered buffer (reference stats::Summary-style streaming
  * aggregate object, SURVEY.md §2.6 -> Aggregator). Mergeable, so Spark
  * runs it partial+final with map-side combine. `finish` returns the
  * values in ASCENDING order so every downstream reduction (mean,
  * k-th distance certificate) is deterministic regardless of the
  * partitioning that fed the heap. */
class TopKDistAgg(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Double, Array[Double], Array[Double]] {
  import org.apache.spark.sql.Encoder
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
  override def finish(b: Array[Double]): Array[Double] = {
    val out = java.util.Arrays.copyOf(b, b.length)
    java.util.Arrays.sort(out)
    out
  }
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Codegen'd 3x3 neighbor-ring of a cell id (the kNN replication keys).
  * Replaces the Scala UDF that used to break whole-stage codegen on the
  * replicated side of the engine's biggest shuffles (SOR/ROR/delta). */
case class NeighborCellsExpr(child: Expression, space: CellSpace)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "neighbor_cells"
  override protected def nullSafeEval(v: Any): Any =
    JoinOps.neighborCellsData(space, v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sp = ctx.addReferenceObj("space", space, classOf[CellSpace].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.operators.JoinOps.neighborCellsData($sp, $c);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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

  /** ArrayData ring for the codegen'd [[NeighborCellsExpr]]. */
  def neighborCellsData(space: CellSpace, cell: Long): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(space.neighborhood(cell))

  private def neighborRing(cell: Column, space: CellSpace): Column =
    toCol(NeighborCellsExpr(toExpr(cell), space))

  /** Grid-partitioned kNN pair generation: for each left point, all right
    * points within the 3x3 neighborhood of its level-`level` cell, with
    * their SQUARED 2D/3D distance `__d2` (sqrt is monotonic — callers
    * compare against squared radii and take at most k roots after
    * aggregation, not one per pair). The contract callers must respect
    * (documented reference KDIndex semantics, KDIndex.hpp:54-106): the
    * cell side length at `level` must be >= the largest kNN radius of
    * interest, or far neighbors are missed — radius-bounded callers
    * `require` this; unbounded-kNN callers go through [[escalateKnn]],
    * which proves it per point with a distance certificate. Right side
    * is replicated 9x via a codegen'd ring expression (the classic
    * neighbor-ring replication join); left side shuffles once on cell.
    */
  def knnPairs(left: DataFrame, right: DataFrame, level: Int,
               space: CellSpace = CellSpace.default,
               dims3: Boolean = false): DataFrame =
    ringPairs(left, right, level, space, dims3, None)

  private def ringPairs(left: DataFrame, right: DataFrame, level: Int,
                        space: CellSpace, dims3: Boolean,
                        keepCells: Option[java.util.HashSet[java.lang.Long]]): DataFrame = {
    val l = left.withColumn("__cell", SpatialFunctions.cellId(col("x"), col("y"), level, space))
    var rc = right.withColumn("__cell",
      explode(neighborRing(SpatialFunctions.cellId(col("x"), col("y"), level, space), space)))
    // escalation rounds: only ring cells that still hold uncertified left
    // points matter — filter map-side, before the shuffle
    keepCells.foreach(s => rc = rc.filter(toCol(CellSetContains(toExpr(col("__cell")), s))))
    val r = rc.select(col("__cell"), struct(right.columns.map(col): _*).as("__r"))
    // explicit products, not pow(): bit-identical to the SQL oracle's x*x
    val ddx = col("x") - col("__r.x"); val ddy = col("y") - col("__r.y")
    val d2d = ddx * ddx + ddy * ddy
    val ddz = col("z") - col("__r.z")
    val d2 = if (dims3) d2d + ddz * ddz else d2d
    l.join(r, "__cell").withColumn("__d2", d2).drop("__cell")
  }

  /** [[ringPairs]] twin for the escalation loop's narrow frames: left is
    * (__pid, x, y, z) — renamed __lpid to keep the pair row free of
    * ambiguity — right is (__pid, x, y, z[, doc_id, span_idx]). No
    * strings on the pair row unless the caller's aggregate needs the
    * right-side identity (exactNearest's tie-break). */
  private def ringPairsPid(left: DataFrame, right: DataFrame, level: Int,
                           space: CellSpace, dims3: Boolean,
                           keepCells: Option[java.util.HashSet[java.lang.Long]]): DataFrame = {
    val l = left.select(col("__pid").as("__lpid"), col("x"), col("y"), col("z"))
      .withColumn("__cell", SpatialFunctions.cellId(col("x"), col("y"), level, space))
    var rc = right.withColumn("__cell",
      explode(neighborRing(SpatialFunctions.cellId(col("x"), col("y"), level, space), space)))
    keepCells.foreach(s => rc = rc.filter(toCol(CellSetContains(toExpr(col("__cell")), s))))
    val r = rc.select(col("__cell"), struct(right.columns.map(col): _*).as("__r"))
    val ddx = col("x") - col("__r.x"); val ddy = col("y") - col("__r.y")
    val d2d = ddx * ddx + ddy * ddy
    val ddz = col("z") - col("__r.z")
    val d2 = if (dims3) d2d + ddz * ddz else d2d
    l.join(r, "__cell").withColumn("__d2", d2).drop("__cell")
  }

  /** EXACT distributed kNN via grid-ring candidates + a per-point distance
    * certificate with level escalation. A ring join at level L provably
    * contains every neighbor within cellSide(L) of a point, so any point
    * whose k-th ring candidate lies within that radius has its exact kNN
    * (certificate passes). The (typically tiny) uncertified remainder —
    * isolated points in sparse regions — re-runs at a 4x-coarser level
    * against only the ring cells it touches, until level 0 (one cell =
    * full cross join, exact by construction). This removes the silent
    * approximation the reference's exact KDIndex (KDIndex.hpp:54-106)
    * never had, while keeping the scale-friendly single-ring plan for
    * ~all points.
    *
    * `agg` must aggregate [[ringPairsPid]] output to one row per left
    * point, grouped on (and keeping) `__lpid`; `certify(guard)` must
    * return a boolean column that is true iff the per-point result is
    * provably exact when every neighbor within `guard` was among the
    * candidates. (doc_id, span_idx, x, y, z) are joined back onto the
    * result after the loop.
    */
  /** Sentinel for the kNN family's `level` parameters: pick the start
    * level from candidate density instead of a caller constant. */
  val AutoLevel: Int = -1

  /** Density-based start level for certificate-escalation kNN: the
    * finest grid whose cell side still makes per-point certification
    * likely. Certification at level L needs the k-th neighbor within one
    * cell side; under ~uniform density E[candidates within cellSide(L)]
    * = n*pi/4^L (relative to the space's area), so we pick the largest L
    * with that expectation >= margin*k. Too-coarse start levels are the
    * scale foot-gun (ring fan-out grows 4x per level too coarse); a
    * too-fine start only costs extra escalation rounds on the sparse
    * tail — the result is exact either way, so this is purely a plan
    * choice, like AQE picking shuffle partition counts. */
  def knnAutoLevel(nRight: Long, k: Int, margin: Double = 6.0): Int =
    knnAutoLevel(nRight, k, CellSpace.default, 0.0, margin)

  /** 3D-aware variant: certification needs the k-th neighbor within one
    * XY cell side `s` in FULL 3D distance, and when points spread over a
    * vertical extent H >> s only ~4s/(3H) of the ring candidates are
    * also within a 3D ball of radius s (sphere volume over ring-slab
    * volume). Ignoring this picks a grid one or two levels too fine and
    * every point escalates — a full extra pass over the data. `zSpread`
    * = 0 recovers the planar formula. */
  def knnAutoLevel(nRight: Long, k: Int, space: CellSpace, zSpread: Double,
                   margin: Double): Int = {
    val area = (space.maxx - space.minx) * (space.maxy - space.miny)
    val minSide = math.min(space.maxx - space.minx, space.maxy - space.miny)
    def expected(l: Int): Double = {
      val s = minSide / (1L << l).toDouble
      val zf = if (zSpread <= 0) 1.0 else math.min(1.0, 4.0 * s / (3.0 * zSpread))
      nRight * math.Pi * s * s / area * zf
    }
    (12 to 0 by -1).find(l => expected(l) >= margin * math.max(1, k)).getOrElse(0)
  }

  private def escalateKnn(left: DataFrame, right: DataFrame, startLevel: Int,
                          space: CellSpace, dims3: Boolean, excludeSelf: Boolean,
                          kHint: Int = 1, carryRightIds: Boolean = false)
                         (agg: DataFrame => DataFrame)
                         (certify: Double => Column): DataFrame = {
    require(!excludeSelf || (left eq right),
      "excludeSelf requires the same frame reference on both sides " +
        "(self identity is tracked by the internal point id)")
    val slim = Seq("doc_id", "span_idx", "x", "y", "z").map(col)
    // HOT-PATH SHAPE: the ring join fans each point out ~9x density
    // candidates, so every byte on a pair row is multiplied millions of
    // times. Identity therefore travels as ONE packed long (`__pid`,
    // frozen by the eager checkpoint) and the (doc_id, span_idx) strings
    // are restored by a single narrow join at the very end — the pair
    // stream carries only longs and doubles. The slim projections are
    // materialized once (blocks ContextCleaner-freed when the caller
    // drops the result); self-joins (SOR) share one checkpoint.
    val rP = right.select(slim: _*)
      .withColumn("__pid", monotonically_increasing_id())
      .localCheckpoint(eager = true)
    val lP = if (left eq right) rP
      else left.select(slim: _*)
        .withColumn("__pid", monotonically_increasing_id())
        .localCheckpoint(eager = true)
    val rNarrowCols =
      (Seq("__pid", "x", "y", "z") ++
        (if (carryRightIds) Seq("doc_id", "span_idx") else Nil)).map(col)
    val rNarrow = rP.select(rNarrowCols: _*)
    var pending = lP.select(col("__pid"), col("x"), col("y"), col("z"))
    var out: Option[DataFrame] = None
    var lvl =
      if (startLevel >= 0) startLevel
      else if (!dims3) knnAutoLevel(rP.count(), kHint)
      else {
        // one tiny aggregate over the checkpointed slim side: row count +
        // robust vertical spread (p05..p95) for the 3D-aware level pick
        val st = rP.agg(count(lit(1)).as("n"),
          expr("percentile_approx(z, array(0.05d, 0.95d))").as("zq")).head()
        val zq = if (st.isNullAt(1)) null else st.getSeq[Double](1)
        val spread = if (zq == null || zq.length < 2) 0.0 else zq(1) - zq(0)
        knnAutoLevel(st.getLong(0), kHint, space, spread, margin = 6.0)
      }
    val dbg = sys.env.contains("GRAFT_KNN_DEBUG")
    var firstRound = true
    var done = false
    while (!done) {
      val tRound = System.nanoTime()
      val guard = math.min(space.maxx - space.minx, space.maxy - space.miny) / (1L << lvl).toDouble
      val keep =
        if (firstRound) None
        else {
          val cells = pending
            .select(SpatialFunctions.cellId(col("x"), col("y"), lvl, space).as("c"))
            .distinct().collect().map(_.getLong(0))
          if (cells.length <= (1 << 16)) Some(cellSet(cells)) else None
        }
      var pairs = ringPairsPid(pending, rNarrow, lvl, space, dims3, keep)
      if (excludeSelf)
        pairs = pairs.filter(col("__lpid") =!= col("__r.__pid"))
      // EXACTNESS-PRESERVING guard filter: a certified result only ever
      // uses neighbors within `guard` (the certificate is precisely "the
      // k-th candidate lies within guard"), so pairs farther than guard
      // cannot change a certified answer — and an uncertified point
      // escalates and recomputes anyway. Filtering here is a codegen'd
      // comparison that keeps the ~9x ring fan-out out of the per-group
      // aggregate. At level 0 the ring IS the full cross join and the
      // certificate is vacuous, so every pair must be kept.
      if (lvl > 0)
        pairs = pairs.filter(col("__d2") <= lit(guard * guard))
      // materialize once — feeds both the certified and escalation branch
      val nn = agg(pairs).localCheckpoint()
      val cert = if (lvl == 0) lit(true) else certify(guard)
      val ok = nn.filter(cert)
      out = Some(out.map(_.unionByName(ok)).getOrElse(ok))
      if (lvl == 0) done = true
      else {
        // uncertified + points with zero ring candidates (absent from nn):
        // one anti-join of the narrow pending frame against the certified ids
        val bad = pending.join(ok.select(col("__lpid")),
            pending("__pid") === col("__lpid"), "left_anti")
          .localCheckpoint()
        val nBad = bad.count()
        if (dbg) println(f"[knn] level $lvl round done in " +
          f"${(System.nanoTime() - tRound) / 1e9}%.2fs, uncertified=$nBad")
        if (nBad == 0) done = true
        else { pending = bad; lvl = math.max(0, lvl - 2) }
      }
      if (dbg && done) println(f"[knn] final level $lvl round in " +
        f"${(System.nanoTime() - tRound) / 1e9}%.2fs")
      firstRound = false
    }
    // restore (doc_id, span_idx) and coordinates with one narrow join
    out.get.join(lP, col("__lpid") === lP("__pid"))
      .drop("__lpid", "__pid")
  }

  /** Exact k-nearest squared distances per left point: (doc_id, span_idx,
    * x, y, z, __nnd2 array<double> ascending). */
  def exactKnnDistances(left: DataFrame, right: DataFrame, k: Int, startLevel: Int,
                        space: CellSpace = CellSpace.default, dims3: Boolean = false,
                        excludeSelf: Boolean = false): DataFrame = {
    val topk = udaf(new TopKDistAgg(k))
    escalateKnn(left, right, startLevel, space, dims3, excludeSelf, kHint = k)(pairs =>
      pairs.groupBy(col("__lpid"))
        .agg(topk(col("__d2")).as("__nnd2")))(g =>
      size(col("__nnd2")) === k && element_at(col("__nnd2"), k) <= lit(g * g))
  }

  /** Exact nearest-1 neighbor coords per left point (ties broken by the
    * lexicographic (d2, doc, span) ordering — the reference's stable
    * KDIndex order). */
  def exactNearest(left: DataFrame, right: DataFrame, startLevel: Int,
                   space: CellSpace = CellSpace.default,
                   dims3: Boolean = false): DataFrame =
    escalateKnn(left, right, startLevel, space, dims3, excludeSelf = false,
      kHint = 1, carryRightIds = true)(pairs =>
      pairs.groupBy(col("__lpid"))
        .agg(
          min_by(struct(col("__r.x").as("nx"), col("__r.y").as("ny"), col("__r.z").as("nz")),
            struct(col("__d2"), col("__r.doc_id"), col("__r.span_idx"))).as("__n"),
          min(col("__d2")).as("__d2min")))(g =>
      col("__d2min") <= lit(g * g))

  /** `pdal delta` (DeltaKernel.cpp:114-150, 269-330): for each source
    * point the single nearest candidate point (EXACT — certificate +
    * escalation, see [[escalateKnn]]); emits per-point deltas plus
    * min/max/mean/median summary of each delta dimension. Nearest-1 is a
    * min_by hash aggregate (tie-break = the lexicographic (d2, doc, span)
    * struct ordering), NOT a window — no sort of the pair fan-out,
    * map-side combinable. */
  def delta(src: DataFrame, candidates: DataFrame, level: Int,
            space: CellSpace = CellSpace.default,
            detail: Boolean = true): DataFrame = {
    val nn = exactNearest(src, candidates, level, space, dims3 = false)
    val nearest = nn.select(col("doc_id"), col("span_idx"),
      (col("x") - col("__n.nx")).as("dx"),
      (col("y") - col("__n.ny")).as("dy"),
      (col("z") - col("__n.nz")).as("dz"))
    if (detail) nearest
    else nearest.agg(
      min("dx").as("min_dx"), max("dx").as("max_dx"), avg("dx").as("mean_dx"), median(col("dx")).as("median_dx"),
      min("dy").as("min_dy"), max("dy").as("max_dy"), avg("dy").as("mean_dy"), median(col("dy")).as("median_dy"),
      min("dz").as("min_dz"), max("dz").as("max_dz"), avg("dz").as("mean_dz"), median(col("dz")).as("median_dz"))
  }

  /** Statistical outlier removal (PCL SOR semantics via filters.pclblock,
    * PCLPipeline.hpp:278-300): per point the mean distance to its k
    * EXACT nearest neighbors (certificate + escalation); keep points with
    * meanDist <= mu + mult * sigma of the global distribution of mean
    * distances. The kNN aggregate keeps squared distances; the k square
    * roots per point happen once, summed in ascending order
    * (deterministic), after aggregation.
    *
    * DETERMINISTIC THRESHOLD: mu and sigma are computed from mean
    * distances quantized to 1e-6 and summed as exact integers (decimal
    * sums are order-free, unlike double partial aggregation), then
    * combined on the driver in one fixed op sequence — so the kept set
    * is bit-identical across partitionings/executor counts and exactly
    * mirrorable in SQL (the r2 VERDICT's last-ulp membership flake is
    * structurally gone). Quantizing at a micrometer is far below any
    * physical meaning of the PCL threshold.
    *
    * NOTE: the top-k Aggregator runs via ObjectHashAggregate, whose
    * default sort-based fallback threshold (128 keys) is catastrophic for
    * per-point grouping. Callers' sessions should raise
    * spark.sql.objectHashAggregate.sortBased.fallbackThreshold (Verify/
    * Bench/tests set 5e6) — deliberately NOT set here: an operator must
    * not silently rewire session config (doc-synthesis sessions need the
    * default's bounded-memory fallback). */
  def statisticalOutlierRemoval(k: Int, multThresh: Double, level: Int,
                                space: CellSpace = CellSpace.default)(df: DataFrame): DataFrame = {
    val nn = exactKnnDistances(df, df, k, level, space, dims3 = true, excludeSelf = true)
    // meanDist is tiny (one narrow row per point) but feeds BOTH the
    // global threshold and the final join: materialize once via eager
    // localCheckpoint (SOR is already eager through the escalation loop)
    // so the blocks are ContextCleaner-freed when the caller drops the
    // frame, instead of pinning a CacheManager entry forever.
    val meanDist = nn.select(col("doc_id"), col("span_idx"),
      (aggregate(transform(col("__nnd2"), d => sqrt(d)), lit(0.0), (a, v) => a + v)
        / size(col("__nnd2"))).as("__md"))
      .withColumn("__q", floor(col("__md") * lit(1000000.0) + lit(0.5)))
      .localCheckpoint(eager = true)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val mom = meanDist.agg(
      sum(col("__q").cast(dec)).as("s1"),
      sum(col("__q").cast(dec) * col("__q").cast(dec)).as("s2"),
      count(lit(1)).as("n")).head()
    if (mom.getLong(2) < 2) return df.limit(0) // sigma undefined (matches prior null-threshold behavior)
    val n = mom.getLong(2)
    val s1 = mom.getDecimal(0).toBigInteger.doubleValue()
    val s2 = mom.getDecimal(1).toBigInteger.doubleValue()
    // fixed scalar op sequence — mirrored token-for-token in the oracle
    val mean = s1 / n
    val varS = (s2 - s1 * s1 / n) / (n - 1)
    val t = mean + multThresh * math.sqrt(math.max(varS, 0.0))
    df.join(meanDist.filter(col("__q") <= lit(t)).select("doc_id", "span_idx"),
      Seq("doc_id", "span_idx"), "left_semi")
  }
}
