package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators._
import graft.sources.{Bpf, DocSynth, Faux, Icebridge, LasDecode, LasWriter, Nitf, Optech, Pcd, Ply, Qfit, RasterWrite, RialtoWrite, Sbet, Terrasolid}
import graft.model.Model
import graft.index.CellSpace

/** Declarative pipeline runner — the engine's PipelineManager analog
  * (reference src/PipelineReader.cpp:495-508 parses a stage tree and
  * src/PipelineManager.cpp executes it; ours folds a JSON stage list
  * over a DataFrame and lets Catalyst plan the whole composition as ONE
  * job, fusing adjacent projections/filters that the reference runs as
  * separate per-view loops).
  *
  * Spec shape (PDAL-style JSON stage list):
  * {{{
  * { "pipeline": [
  *     {"type": "readers.faux", "mode": "ramp",
  *      "bounds": [0,0,0,10,100,1000], "count": 1000},
  *     {"type": "filters.range",
  *      "limits": [{"dimension": "z", "min": 4, "max": 6}]},
  *     {"type": "filters.splitter", "length": 100},
  *     {"type": "writers.parquet", "path": "/tmp/out"}
  * ], "checkpoint_root": "/tmp/ck" }
  * }}}
  *
  * With `checkpoint_root` set, every stage marked `"checkpoint": true`
  * (and every writer) persists its output + per-partition lineage
  * manifest; a re-run resumes mid-pipeline at the last stage whose
  * fingerprint (config + upstream fingerprints) still matches.
  */
object Pipeline {
  private implicit val fmt: Formats = DefaultFormats

  final case class StageSpec(typ: String, config: JObject) {
    def str(k: String): Option[String] = (config \ k).extractOpt[String]
    def dbl(k: String): Option[Double] = (config \ k).extractOpt[Double]
    def int(k: String): Option[Int] = (config \ k).extractOpt[Int]
    def bool(k: String): Option[Boolean] = (config \ k).extractOpt[Boolean]
    // json4s extracts a MISSING field as Some(Nil) for collection types;
    // only a PRESENT array counts (a caller doing .map(a => a(0)) on a
    // defaulted empty Seq would blow up)
    def dbls(k: String): Option[Seq[Double]] = (config \ k) match {
      case JArray(_) => (config \ k).extractOpt[Seq[Double]]
      case _ => None
    }
    def strs(k: String): Option[Seq[String]] = (config \ k) match {
      case JArray(_) => (config \ k).extractOpt[Seq[String]]
      case _ => None
    }
    def fingerprintSource: String = typ + JsonMethods.compact(JsonMethods.render(config))
  }

  def parse(specJson: String): (Seq[StageSpec], Option[String]) = {
    val j = JsonMethods.parse(specJson)
    val stages = (j \ "pipeline") match {
      case JArray(items) => items.collect { case o: JObject =>
        StageSpec((o \ "type").extract[String], o)
      }
      case _ => throw new IllegalArgumentException("spec needs a 'pipeline' array")
    }
    (stages, (j \ "checkpoint_root").extractOpt[String])
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Per-run mutable context: the SRS inferred from the last LAS
    * reader's VLRs, consumed by filters.reprojection when `in_srs` is
    * absent or "auto" (the reference's ReprojectionFilter takes the
    * stage input's spatial reference the same way). */
  final class RunCtx {
    var inferredSrs: Option[String] = None
    /** Row count the reader already knows for free (LAS header point
      * count, faux count param) — lets downstream auto-routing decisions
      * (filters.chipper) avoid a full count() scan job. Upper bound once
      * filters run, which is the conservative direction for routing. */
    var inferredCount: Option[Long] = None
    /** Side-channel per-stage stats (the reference's filters.stats sends
      * its summary to the METADATA tree and passes points through,
      * StatsFilter.cpp:59-71 — mid-chain XML pipelines rely on that).
      * Keyed by stage tag. */
    var sideStats: List[(String, Array[org.apache.spark.sql.Row])] = Nil
  }

  /** Build one stage's transformation. Readers ignore their input. */
  def build(spark: SparkSession, st: StageSpec,
            ctx: RunCtx = new RunCtx): Option[DataFrame] => DataFrame = {
    val t = st.typ
    in => t match {
      // ---- readers -----------------------------------------------------
      case "readers.doc" =>
        val docs = st.str("path") match {
          case Some(p) => spark.read.parquet(p)
          case None => DocSynth.cachedDocs(spark, st.str("sf_dir")
            .getOrElse(throw new IllegalArgumentException("readers.doc needs path or sf_dir")))
        }
        Model.explodePoints(docs)
      case "readers.ply" =>
        // one task per file for globs; driver decode for one fixture
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Ply.asDistributedDataFrame(spark, p)
        else Ply.asDataFrame(spark, p)
      case "readers.parquet" =>
        spark.read.parquet(st.str("path").get)
      case "readers.nitf" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Nitf.asDistributedDataFrame(spark, p)
        else Nitf.asDataFrame(spark, p)
      case "readers.icebridge" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Icebridge.asDistributedDataFrame(spark, p)
        else Icebridge.asDataFrame(spark, p,
          // `count` prunes the HDF5 chunk B-tree walk to rows [0, count)
          st.int("count").map(_.toLong).getOrElse(Long.MaxValue))
      case "readers.pcd" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Pcd.asDistributedDataFrame(spark, p)
        else Pcd.asDataFrame(spark, p)
      case "readers.bpf" =>
        val p = st.str("path").get
        val cols = st.strs("columns").getOrElse(Nil)
        if (p.exists("*?[".contains(_))) Bpf.asDistributedDataFrame(spark, p, cols)
        else Bpf.asDataFrame(spark, p, st.int("count").getOrElse(Int.MaxValue), cols)
      case "readers.sbet" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Sbet.asDistributedDataFrame(spark, p)
        else Sbet.asDataFrame(spark, p)
      case "readers.qfit" =>
        val p = st.str("path").get
        val flip = st.bool("flip_coordinates").getOrElse(true)
        val sz = st.dbl("scale_z").getOrElse(0.001)
        if (p.exists("*?[".contains(_)))
          Qfit.asDistributedDataFrame(spark, p, flip, sz)
        else Qfit.asDataFrame(spark, p, flip, sz)
      case "readers.terrasolid" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Terrasolid.asDistributedDataFrame(spark, p)
        else Terrasolid.asDataFrame(spark, p)
      case "readers.optech" =>
        val p = st.str("path").get
        if (p.exists("*?[".contains(_))) Optech.asDistributedDataFrame(spark, p)
        else Optech.asDataFrame(spark, p)
      case "readers.faux" =>
        val b = st.dbls("bounds").map(a => Faux.Box3(a(0), a(1), a(2), a(3), a(4), a(5)))
          .getOrElse(Faux.Box3(0, 0, 0, 1, 1, 1))
        val n = st.int("count").getOrElse(1000).toLong
        ctx.inferredCount = Some(n)
        st.str("mode").getOrElse("ramp") match {
          case "ramp" => Faux.ramp(spark, b, n)
          case "constant" => Faux.constant(spark, b, n)
          case "uniform" => Faux.uniform(spark, b, n, st.int("seed").getOrElse(42).toLong)
          case "normal" =>
            val mean = st.dbls("mean").getOrElse(Seq(0.0, 0.0, 0.0))
            val stdev = st.dbls("stdev").getOrElse(Seq(1.0, 1.0, 1.0))
            Faux.normal(spark, (mean(0), mean(1), mean(2)),
              (stdev(0), stdev(1), stdev(2)), n, st.int("seed").getOrElse(42).toLong)
          case m => throw new IllegalArgumentException(s"faux mode $m")
        }
      case "readers.las" =>
        // "splits": N fans ONE large file across N tasks at record
        // offsets; "distributed": one task per matched file (glob);
        // default stays the driver decode for single-fixture parity runs
        val path = st.str("path").get
        // infer the file's SRS from its VLR GeoTIFF keys / WKT record for
        // downstream filters.reprojection auto mode (glob paths skipped)
        if (!path.exists("*?[".contains(_))) {
          ctx.inferredSrs = LasDecode.srsOf(path)
          ctx.inferredCount = Some(LasDecode.headerOf(path).pointCount)
        }
        // "columns": project the read — on layered .laz via the chunk
        // path this prunes whole entropy layers INSIDE the codec
        // (selective decompression); elsewhere a post-decode projection
        val colsCfg = st.strs("columns").getOrElse(Nil)
        def project(df: DataFrame): DataFrame =
          if (colsCfg.isEmpty) df
          else df.select(((Seq("doc_id", "span_idx", "x", "y") ++ colsCfg).distinct
            .filter(df.columns.contains)).map(org.apache.spark.sql.functions.col): _*)
        st.int("splits") match {
          case Some(_) if LasDecode.isLaszip(path) =>
            // compressed records aren't offset-splittable; LAZ chunks
            // are the natural parallel unit instead. "bounds" prunes
            // whole chunks via the spatial sidecar before any read
            // (exactness still comes from a downstream filters.crop)
            LasDecode.asChunkSplitDataFrame(spark, path, columns = colsCfg,
              bounds = st.dbls("bounds").getOrElse(Nil))
          case Some(n) => project(LasDecode.asSplitDataFrame(spark, path, n))
          case None if st.bool("distributed").getOrElse(false) =>
            project(LasDecode.asDistributedDataFrame(spark, path))
          case None => project(LasDecode.asDataFrame(spark, path))
        }

      // ---- filters -----------------------------------------------------
      case "filters.range" =>
        val limits = (st.config \ "limits") match {
          case JArray(ls) => ls.map { l =>
            PointOps.DimRange((l \ "dimension").extract[String],
              (l \ "min").extractOpt[Double].getOrElse(Double.NegativeInfinity),
              (l \ "max").extractOpt[Double].getOrElse(Double.PositiveInfinity))
          }
          case _ => throw new IllegalArgumentException("filters.range needs limits")
        }
        PointOps.range(limits)(in.get)
      case "filters.crop" =>
        (st.str("polygon"), st.dbls("bounds")) match {
          case (Some(wkt), _) =>
            JoinOps.cropPolygon(wkt, st.bool("outside").getOrElse(false),
              space(st))(in.get)
          case (_, Some(a)) =>
            val b = if (a.length == 6) PointOps.Box3D(a(0), a(1), a(2), a(3), a(4), a(5))
                    else PointOps.Box3D(a(0), a(1), Double.NegativeInfinity,
                      a(2), a(3), Double.PositiveInfinity)
            PointOps.cropBox(b, st.bool("outside").getOrElse(false))(in.get)
          case _ => throw new IllegalArgumentException("filters.crop needs polygon or bounds")
        }
      case "filters.decimation" =>
        PointOps.decimation(st.int("step").getOrElse(1), st.int("offset").getOrElse(0),
          st.int("limit").map(_.toLong), st.str("ordinal").getOrElse("span_idx"))(in.get)
      case "filters.ferry" =>
        val pairs = st.strs("dimensions").getOrElse(Nil).map { d =>
          val Array(from, to) = d.split("=>").map(_.trim); (from, to)
        }
        PointOps.ferry(pairs)(in.get)
      case "filters.transformation" =>
        val m = st.str("matrix").get.trim.split("\\s+").map(_.toDouble)
        PointOps.transformation(m)(in.get)
      case "filters.assign" =>
        PointOps.assignConstant(st.str("dimension").get, st.dbl("value").get)(in.get)
      case "filters.sort" =>
        PointOps.sortBy(st.str("dimension").getOrElse("x"))(in.get)
      case "filters.mortonorder" =>
        PointOps.mortonOrder(space(st))(in.get)
      case "filters.splitter" =>
        // origin defaults to the FIRST point like the reference
        // (SplitterFilter.cpp:101-106); "first" in a distributed frame =
        // the (doc_id, span_idx)-least row, which for file ingest is the
        // file's first record. One bounded single-row job, only when
        // the origin is left unspecified.
        val (ox, oy) = (st.dbl("origin_x"), st.dbl("origin_y")) match {
          case (Some(a), Some(b)) => (a, b)
          case (optX, optY) =>
            // SplitterFilter::run emits an empty set for empty input —
            // fall back to (0,0) (any origin works for zero points)
            // rather than throwing from head() on an empty frame
            val first = in.get.orderBy(col("doc_id"), col("span_idx"))
              .select(col("x"), col("y")).take(1).headOption
            (optX.getOrElse(first.map(_.getDouble(0)).getOrElse(0.0)),
             optY.getOrElse(first.map(_.getDouble(1)).getOrElse(0.0)))
        }
        TileOps.splitter(st.dbl("length").getOrElse(1000.0), ox, oy)(in.get)
      case "filters.chipper" =>
        // "exact" reproduces the reference's chip sizes bit-for-bit
        // (iterative rank windows — fixture-parity path); "approx" is
        // the 100x-scale path (one aggregate per round, map-only
        // assignment, sizes within the quantile sketch's error of
        // capacity); "auto" routes on input size.
        val capacity = st.int("capacity").getOrElse(5000).toLong
        st.str("method").getOrElse("exact") match {
          case "exact"  => TileOps.chipper(capacity)(in.get)
          case "approx" => TileOps.chipperApprox(capacity)(in.get)
          case "auto" =>
            val threshold = st.int("auto_threshold").getOrElse(10000000).toLong
            val df = in.get
            // route on a ZERO-JOB estimate when one exists — the reader's
            // own declared count (LAS header / faux count), else
            // Catalyst's plan-stats row count; only when neither knows
            // does routing cost a count() scan. At 100x scale the extra
            // full-input scan just to pick a method is the bug.
            val est: Long = ctx.inferredCount
              .orElse(df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong))
              .getOrElse(df.count())
            if (est > threshold) TileOps.chipperApprox(capacity)(df)
            else TileOps.chipper(capacity)(df)
          case m => throw new IllegalArgumentException(
            s"filters.chipper method must be exact|approx|auto, got $m")
        }
      case "filters.stats" =>
        AggOps.stats(st.strs("dimensions").getOrElse(Seq("x", "y", "z")),
          st.strs("enumerate").getOrElse(Nil).toSet)(in.get)
      case "filters.stats_passthrough" =>
        // the reference's actual stats-filter contract: points flow
        // through unchanged, the summary goes to the side channel
        val d = in.get
        val dims = st.strs("dimensions").getOrElse(Seq("x", "y", "z"))
          .filter(d.columns.contains)
        ctx.sideStats ::= (st.str("tag").getOrElse("stats"),
          AggOps.stats(dims, st.strs("enumerate").getOrElse(Nil)
            .filter(d.columns.contains).toSet)(d).collect())
        d
      case "filters.voxelgrid" =>
        AggOps.voxelGrid(st.dbl("lx").getOrElse(1.0), st.dbl("ly").getOrElse(1.0),
          st.dbl("lz").getOrElse(1.0))(in.get)
      case "filters.gridmin" =>
        AggOps.gridMinimum(st.dbl("cell").getOrElse(1.0))(in.get)
      case "filters.hexbin" =>
        // reference option surface (HexBin.cpp:54-74): edge_length with
        // edge_size as the legacy alias; edge absent/0 -> estimated.
        // hexer's sample-based sizing lives in the external hexer lib;
        // the engine's documented estimator is density-matched sizing
        // edge = 2*sqrt(bbox_area / n) over the FULL frame (one
        // aggregate) — deterministic and partition-invariant, unlike a
        // limit()-sample; sample_size is accepted for spec compat but
        // exact stats make it unnecessary
        val edgeOpt = st.dbl("edge_length").orElse(st.dbl("edge_size"))
          .orElse(st.dbl("edge")).filter(_ != 0.0)
        val edge = edgeOpt.getOrElse {
          val s = in.get
            .agg(min("x"), max("x"), min("y"), max("y"), count(lit(1))).head()
          if (s.isNullAt(0)) 10.0 // empty input: any edge yields an empty grid
          else {
            val n = math.max(s.getLong(4), 1L)
            val area = math.max((s.getDouble(1) - s.getDouble(0)) *
              (s.getDouble(3) - s.getDouble(2)), 1e-12)
            2.0 * math.sqrt(area / n.toDouble)
          }
        }
        TileOps.hexDensity(edge)(in.get)
      case "filters.reprojection" =>
        // any registered SRS pair composes through geographic coordinates.
        // in_srs "auto" (or absent, when a LAS reader inferred one) takes
        // the SRS read from the source file's VLRs — the reference takes
        // the stage input's spatial reference the same way
        // (ReprojectionFilter.cpp:131-180).
        val inSrs = st.str("in_srs") match {
          case Some("auto") => ctx.inferredSrs.getOrElse(
            throw new IllegalArgumentException(
              "in_srs=auto but no SRS could be inferred from the source " +
                "(no LASF_Projection VLR, or EPSG code outside the registry)"))
          case Some(s) => s
          case None => ctx.inferredSrs.getOrElse("")
        }
        // optional NTv2 datum grid (.gsb) for nad27:* endpoints — read
        // through the Hadoop FS so object-store paths work; parsed once
        // on the driver, broadcast to executors inside the expression
        val grid = st.str("grid").map { gp =>
          val hp = new org.apache.hadoop.fs.Path(gp)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val in2 = fs.open(hp)
          val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in2)
          finally in2.close()
          graft.sources.Ntv2.parse(bytes)
        }
        val outsidePass = st.str("outside").contains("pass")
        Reproject.transform(inSrs, st.str("out_srs").getOrElse("EPSG:4326"),
          grid, outsidePass)(in.get)
      case "filters.ground" =>
        val gp = GroundOps.PmfParams(
          cellSize = st.dbl("cell_size").getOrElse(1.0),
          maxWindowSize = st.dbl("max_window_size").getOrElse(33.0),
          slope = st.dbl("slope").getOrElse(1.0),
          initialDistance = st.dbl("initial_distance").getOrElse(0.15),
          maxDistance = st.dbl("max_distance").getOrElse(2.5))
        val gext = st.bool("extract").getOrElse(false)
        // reference default approximate=false -> the EXACT per-point
        // PMF; approximate=true -> the grid PMF (GroundFilter.cpp:72,119)
        if (st.bool("approximate").getOrElse(false))
          GroundOps.pmf(gp, gext)(in.get)
        else GroundOps.pmfExact(gp, gext)(in.get)
      case "filters.pclblock" =>
        // PCL sub-pipeline (PCLBlock.cpp:58-62: filename or inline json)
        (st.str("filename"), st.str("json")) match {
          case (Some(fn), _) => PclBlock.runFile(in.get, fn)
          case (None, Some(js)) => PclBlock.run(in.get, js)
          case _ => throw new IllegalArgumentException(
            "filters.pclblock needs 'filename' or 'json' (No PCL pipeline specified!)")
        }
      case "filters.outlier" =>
        // level omitted -> density-based auto start (JoinOps.knnAutoLevel)
        JoinOps.statisticalOutlierRemoval(st.int("mean_k").getOrElse(8),
          st.dbl("multiplier").getOrElse(2.0),
          st.int("level").getOrElse(JoinOps.AutoLevel), space(st))(in.get)
      case "filters.smooth" =>
        SmoothOps.mlsSmooth(st.dbl("radius").getOrElse(1.0),
          st.int("level").getOrElse(8),
          st.int("polynomial_order").getOrElse(2), space(st))(in.get)
      case "filters.merge" =>
        in.get // n-ary merge handled by the runner (union of its inputs)
      case "writers.rialto" =>
        val d = in.get
        RialtoWrite.write(st.str("path").get, d,
          st.int("max_level").getOrElse(16),
          st.str("ordinal").getOrElse("span_idx"),
          st.bool("overwrite").getOrElse(false)): Unit
        d
      case "filters.lod" =>
        TileOps.lodPyramid(st.int("max_level").getOrElse(4), space(st),
          st.str("ordinal").getOrElse("span_idx"))(in.get)
      case "filters.radiusoutlier" =>
        InfoOps.radiusOutlierRemoval(st.dbl("radius").getOrElse(1.0),
          st.int("min_neighbors").getOrElse(2), st.int("level").getOrElse(6),
          space(st))(in.get)
      case "filters.adaptivecells" =>
        SkewOps.adaptiveCells(st.int("budget").getOrElse(100000).toLong,
          st.int("base_level").getOrElse(4), st.int("max_level").getOrElse(12),
          space(st))(in.get)
      case "filters.colorization" =>
        // raster from parquet (px, py, band columns) or a .tif written
        // by writers.p2g (single Float32 band named "band1"; the
        // geotransform comes from its ModelPixelScale/ModelTiepoint
        // tags — like the reference's GDALOpen path)
        val rPath = st.str("raster").get
        val (raster, gt) =
          if (rPath.toLowerCase.endsWith(".tif")) {
            val (w, h, (sx, sy), (ox, oy), vals) = RasterWrite.readGeoTiff(
              java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(rPath)))
            val rows = for (r <- 0 until h; c <- 0 until w;
                v = vals(r * w + c); if v != RasterWrite.NoData.toFloat)
              yield (c.toLong, r.toLong, v.toDouble)
            import spark.implicits._
            (spark.createDataset(rows).toDF("px", "py", "band1"),
              Array(ox, sx, 0.0, oy, 0.0, -sy))
          } else (spark.read.parquet(rPath), st.dbls("geotransform").get.toArray)
        val bands = st.strs("bands").getOrElse(Nil).map { b =>
          val Array(rc, dim, sc) = b.split(":"); (rc, dim, sc.toDouble)
        }
        JoinOps.colorize(raster, gt, bands)(in.get)
      case "writers.p2g" =>
        val (dx, dy) = (st.dbl("dx").getOrElse(1.0), st.dbl("dy").getOrElse(1.0))
        val (ox, oy) = (st.dbl("origin_x").getOrElse(0.0), st.dbl("origin_y").getOrElse(0.0))
        val d = AggOps.p2gRaster(dx, dy,
          st.dbl("radius").getOrElse(0.7), ox, oy,
          st.int("fill_window_size").getOrElse(0))(in.get)
        // `path` = the scale path (partitioned cell table); `filename` =
        // the reference's single-file raster emit, one file per
        // output_type x output_format (P2gWriter.cpp options)
        st.str("path").foreach(p => d.write.mode("overwrite").parquet(p))
        st.str("filename").foreach { f =>
          RasterWrite.writeP2g(f, d, dx, dy, ox, oy,
            st.strs("output_type").getOrElse(Nil),
            st.str("output_format").getOrElse("grid")): Unit
        }
        require(st.str("path").isDefined || st.str("filename").isDefined,
          "writers.p2g: need `path` (cell table) or `filename` (raster files)")
        d

      // ---- writers -----------------------------------------------------
      case "writers.parquet" =>
        val d0 = in.get
        val byTile = st.strs("partition_by").getOrElse(Nil)
        // optional deterministic salting: hot tiles write from `salts`
        // tasks instead of one (the db-block writers' chip-then-write
        // discipline, skew-proofed)
        val d = st.int("salts") match {
          case Some(s) if s > 1 && byTile.nonEmpty =>
            SkewOps.saltedRepartition(byTile.map(col), s)(d0).drop("__salt")
          case _ => d0
        }
        val w = d.write.mode("overwrite")
        (if (byTile.nonEmpty) w.partitionBy(byTile: _*) else w).parquet(st.str("path").get)
        d
      case "writers.ply" =>
        val d = st.strs("order_by").filter(_.nonEmpty)
          .map(cs => in.get.orderBy(cs.map(col): _*)).getOrElse(in.get)
        // shard_column routes to the executor-parallel sharded writer
        st.str("shard_column") match {
          case Some(sc) => Ply.writeSharded(st.str("path").get, d, sc,
            st.str("format").getOrElse("binary_little_endian"))
          case None => Ply.write(st.str("path").get, d,
            st.str("format").getOrElse("ascii"))
        }
        d
      case "writers.sbet" =>
        Sbet.write(st.str("path").get, in.get)
        in.get
      case "writers.nitf" =>
        val d = st.strs("order_by").filter(_.nonEmpty)
          .map(cs => in.get.orderBy(cs.map(col): _*)).getOrElse(in.get)
        val xf = (st.dbls("scale"), st.dbls("offset")) match {
          case (Some(s0), Some(o)) =>
            LasWriter.XForms(s0(0), s0(1), s0(2), o(0), o(1), o(2))
          case _ => LasWriter.XForms(0.01, 0.01, 0.01, 0, 0, 0)
        }
        Nitf.write(st.str("path").get, d, st.int("format").getOrElse(1), xf)
        d
      case "writers.pcd" =>
        val d = st.strs("order_by").filter(_.nonEmpty)
          .map(cs => in.get.orderBy(cs.map(col): _*)).getOrElse(in.get)
        // compression=true mirrors the reference's binary_compressed path
        val mode = st.str("data").getOrElse(
          if (st.bool("compression").getOrElse(false)) "binary_compressed"
          else "ascii")
        // shard_column routes to the executor-parallel sharded writer
        st.str("shard_column") match {
          case Some(sc) => Pcd.writeSharded(st.str("path").get, d, sc, mode,
            st.bool("shift_origin").getOrElse(false))
          case None => Pcd.write(st.str("path").get, d, mode,
            st.bool("shift_origin").getOrElse(false))
        }
        d
      case "writers.bpf" =>
        val d = st.strs("order_by").filter(_.nonEmpty)
          .map(cs => in.get.orderBy(cs.map(col): _*)).getOrElse(in.get)
        val fmt = st.str("format").getOrElse("dimension").toUpperCase match {
          case f if f.contains("POINT") => Bpf.PointMajor
          case f if f.contains("BYTE")  => Bpf.ByteMajor
          case _                        => Bpf.DimMajor
        }
        val bpfOpts = Bpf.WriteOpts(
          format = fmt,
          compression = st.bool("compression").getOrElse(false),
          coordId = st.int("coord_id").getOrElse(0))
        st.str("shard_column") match {
          case Some(sc) => Bpf.writeSharded(st.str("path").get, d, sc, bpfOpts)
          case None => Bpf.write(st.str("path").get, d, bpfOpts)
        }
        d
      case "writers.las" =>
        // optional deterministic file order (a LAS byte stream is
        // sequential; unordered writes are iterator-order)
        val d = st.strs("order_by").filter(_.nonEmpty)
          .map(cs => in.get.orderBy(cs.map(col): _*)).getOrElse(in.get)
        val fmt = st.int("format").getOrElse(3)
        val xf = (st.dbls("scale"), st.dbls("offset")) match {
          case (Some(s), Some(o)) => LasWriter.XForms(s(0), s(1), s(2), o(0), o(1), o(2))
          case _ =>
            // auto mode: offset = data min, scale = range / int32 max
            // (reference src/Writer.cpp:86-148 setAutoXForm)
            val a = Quantize.autoXForm(d, Seq("x", "y", "z"))
            LasWriter.XForms(a("x").scale, a("y").scale, a("z").scale,
              a("x").offset, a("y").offset, a("z").offset)
        }
        // shard_column routes to the executor-parallel sharded writer
        // (one LAS per distinct shard value under "path" as a directory);
        // a .laz path (or "compression": true) emits LASzip; default
        // stays the single-file driver emit for fixture parity
        val wpath = st.str("path").get
        val compressed = wpath.endsWith(".laz") || st.bool("compression").getOrElse(false)
        st.str("shard_column") match {
          case Some(sc) =>
            LasWriter.writeSharded(wpath, d, fmt, xf, sc, compress = compressed)
          case None if compressed => LasWriter.writeLaz(wpath, d, fmt, xf)
          case None => LasWriter.write(wpath, d, fmt, xf)
        }
        d
      case "writers.csv" =>
        val d = in.get
        d.write.mode("overwrite").option("header", "true").csv(st.str("path").get)
        d
      case "writers.noop" =>
        val d = in.get; d.write.format("noop").mode("overwrite").save(); d
      case "writers.doc" =>
        // re-implode points into the canonical doc table before writing
        val docs = Model.implode(DocSynth.cachedDocs(spark, st.str("sf_dir").get), in.get)
        docs.write.mode("overwrite").parquet(st.str("path").get)
        docs

      case other => throw new IllegalArgumentException(s"unknown stage type $other")
    }
  }

  private def space(st: StageSpec): CellSpace =
    st.dbls("space").map(a => CellSpace(a(0), a(1), a(2), a(3)))
      .getOrElse(CellSpace.default)

  final case class RunResult(df: DataFrame, resumedStages: Seq[String],
                             ranStages: Seq[String])

  /** Execute a pipeline spec — a DAG, not just a chain. Stages may carry
    * a `"tag"` and reference earlier tags via `"inputs": [tag, ...]`
    * (the reference's multi-input stage graph, src/PipelineReader.cpp:
    * 362,440 setInput loops; kernels/merge/MergeKernel.cpp). A stage
    * without explicit inputs consumes the previous stage's output;
    * `filters.merge` unions ALL its inputs (n-ary).
    *
    * Fingerprints are content-addressed per stage: md5(own config +
    * every input's fingerprint) — any upstream edit invalidates exactly
    * the downstream cone. With a checkpoint root, stages marked
    * `"checkpoint": true` (and writers) persist output + lineage; a
    * re-run resumes every stage whose fingerprint still matches. A
    * resumed WRITER additionally re-verifies its external destination
    * and re-runs if the destination has been deleted out from under the
    * checkpoint (the checkpoint proves the work, not the side effect). */
  def run(spark: SparkSession, specJson: String): RunResult = {
    val (stages, ckRoot) = parse(specJson)
    require(stages.nonEmpty, "empty pipeline")
    val ctx = new RunCtx
    var prev: Option[(DataFrame, String)] = None
    val byTag = scala.collection.mutable.Map.empty[String, (DataFrame, String)]
    var resumed = Vector.empty[String]
    var ran = Vector.empty[String]
    stages.zipWithIndex.foreach { case (st, i) =>
      val stageId = f"$i%03d_${st.typ.replace('.', '_')}"
      // json4s extracts a MISSING array field as Some(Nil) — only a
      // present, non-empty "inputs" array is an explicit input list
      val explicitInputs = (st.config \ "inputs") match {
        case JArray(tags) if tags.nonEmpty => st.strs("inputs")
        case _ => None
      }
      val inputs: Seq[(DataFrame, String)] = explicitInputs match {
        case Some(tags) => tags.map(t => byTag.getOrElse(t,
          throw new IllegalArgumentException(s"stage $stageId references unknown tag '$t'")))
        case None => if (st.typ.startsWith("readers.")) Nil else prev.toSeq
      }
      val fingerprint = md5Hex(inputs.map(_._2).mkString("|") + st.fingerprintSource)
      val wantCk = ckRoot.isDefined &&
        (st.bool("checkpoint").getOrElse(false) || st.typ.startsWith("writers."))
      // a resumed writer whose declared output path no longer exists must
      // re-run — resuming would report success with no output materialized.
      // Resolved through the session's Hadoop FileSystem so hdfs://,
      // s3a:// and file:// destinations are all checked (a bare
      // Files.exists would see every remote URI as absent and force a
      // rewrite on every resume).
      val destinationIntact = !st.typ.startsWith("writers.") ||
        st.str("path").forall { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
        }
      // optional deep check: recompute the checkpoint's lineage digests
      // before trusting it (bit rot / out-of-band edits)
      def digestsIntact = !st.bool("validate_resume").getOrElse(false) ||
        Manifest.validate(spark, ckRoot.get, stageId)
      val df =
        if (wantCk && Manifest.resumable(ckRoot.get, stageId, fingerprint) &&
            destinationIntact && digestsIntact) {
          resumed :+= stageId
          // a resumed LAS reader still feeds SRS inference downstream
          // (header+VLR read only — no point data)
          if (st.typ == "readers.las")
            st.str("path").filterNot(_.exists("*?[".contains(_)))
              .foreach(p => ctx.inferredSrs = LasDecode.srsOf(p))
          Manifest.readData(spark, ckRoot.get, stageId)
        } else {
          var out = st.typ match {
            case "filters.merge" if inputs.size > 1 =>
              inputs.map(_._1).reduce(_ unionByName _)
            case _ => build(spark, st, ctx)(inputs.headOption.map(_._1))
          }
          if (wantCk) {
            Manifest.checkpoint(ckRoot.get, stageId, fingerprint,
              explicitInputs.getOrElse(if (i > 0) Seq(f"${i - 1}%03d") else Nil), out)
            out = Manifest.readData(spark, ckRoot.get, stageId)
          }
          ran :+= stageId
          out
        }
      st.str("tag").foreach(t => byTag(t) = (df, fingerprint))
      prev = Some((df, fingerprint))
    }
    RunResult(prev.get._1, resumed, ran)
  }
}
