package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.DataFrame

/** Raster FILE emit for `writers.p2g` — the reference hands its cell
  * grid to the external points2grid library, whose finish() writes one
  * file per requested output type in the requested format
  * (`plugins/p2g/io/P2gWriter.cpp:91-106` format map, `:222` finish).
  * Clean-room from the PUBLIC raster format definitions:
  *
  *  - `asc`  — ESRI ARC ASCII grid (ncols/nrows/xllcorner/yllcorner/
  *    cellsize/NODATA_value header, rows top-down);
  *  - `grid` — GRASS ASCII grid (north/south/east/west/rows/cols
  *    header, rows top-down) — the reference's default "grid" format;
  *  - `tif`  — minimal baseline GeoTIFF: little-endian, single strip,
  *    uncompressed Float32 band (SampleFormat=IEEE float), with the
  *    ModelPixelScale + ModelTiepoint GeoTIFF tags carrying the same
  *    geotransform the reference builds (P2gWriter.cpp:211-217:
  *    origin at minx - dx/2, maxy + dy/2, negative y step).
  *
  * The raster is cell-table-sized, not point-count-sized; the single-
  * file emit materializes it on the driver with a loud cell-count
  * guard (a 100 TB pipeline keeps rasters as the partitioned cell
  * TABLE — `writers.p2g` `path` — and uses this emit for the
  * reference's own single-file semantics). Value formatting is this
  * engine's canonical decimal rendering; the formats above don't pin
  * one, so byte parity with points2grid output is not claimed —
  * structure and values are spec'd by golden + self-parse round-trip.
  */
object RasterWrite {

  val NoData = -9999.0

  /** type name -> cell-table column, in the reference's option order
    * (P2gWriter.cpp output_type min/max/mean/idw/den/std). */
  val TypeCols: Seq[(String, String)] = Seq(
    "min" -> "zmin", "max" -> "zmax", "mean" -> "zmean",
    "idw" -> "zidw", "den" -> "den", "std" -> "zstd")

  private def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

  /** Dense row-major grid (top row first) from the sparse cell list. */
  final case class Grid(pxMin: Long, pyMin: Long, w: Int, h: Int,
                        vals: Array[Double]) {
    def at(cx: Int, cyTop: Int): Double = vals(cyTop * w + cx)
  }

  def toGrid(cells: Seq[(Long, Long, Double)]): Grid = {
    require(cells.nonEmpty, "p2g raster emit: empty cell table")
    val pxMin = cells.iterator.map(_._1).min
    val pxMax = cells.iterator.map(_._1).max
    val pyMin = cells.iterator.map(_._2).min
    val pyMax = cells.iterator.map(_._2).max
    // long arithmetic BEFORE the Int narrowing: a sparse cell table with
    // far-apart ids would wrap (pxMax - pxMin + 1).toInt and bypass the
    // guard (negative-size array crash instead of the loud message)
    val wL = pxMax - pxMin + 1
    val hL = pyMax - pyMin + 1
    require(wL <= 50000000L && hL <= 50000000L && wL * hL <= 50000000L,
      s"p2g raster emit: $wL x $hL cells exceed the single-file guard — " +
        "write the partitioned cell table (path option) instead")
    val w = wL.toInt
    val h = hL.toInt
    val vals = Array.fill(w * h)(NoData)
    cells.foreach { case (px, py, v) =>
      // row 0 = TOP row (max py), like the reference's negative y step
      vals(((pyMax - py) * w + (px - pxMin)).toInt) = v
    }
    Grid(pxMin, pyMin, w, h, vals)
  }

  /** ESRI ARC ASCII (requires square cells like the format itself). */
  def arcAscii(g: Grid, dx: Double, dy: Double,
               originX: Double, originY: Double): String = {
    require(dx == dy, s"asc format requires square cells, got $dx x $dy")
    val sb = new StringBuilder
    sb.append(s"ncols ${g.w}\n").append(s"nrows ${g.h}\n")
      .append(s"xllcorner ${fmt(originX + g.pxMin * dx)}\n")
      .append(s"yllcorner ${fmt(originY + g.pyMin * dy)}\n")
      .append(s"cellsize ${fmt(dx)}\n")
      .append(s"NODATA_value ${fmt(NoData)}\n")
    appendRows(sb, g)
  }

  /** GRASS ASCII grid (the reference's default "grid" output_format). */
  def gridAscii(g: Grid, dx: Double, dy: Double,
                originX: Double, originY: Double): String = {
    val sb = new StringBuilder
    sb.append(s"north: ${fmt(originY + (g.pyMin + g.h) * dy)}\n")
      .append(s"south: ${fmt(originY + g.pyMin * dy)}\n")
      .append(s"east: ${fmt(originX + (g.pxMin + g.w) * dx)}\n")
      .append(s"west: ${fmt(originX + g.pxMin * dx)}\n")
      .append(s"rows: ${g.h}\n").append(s"cols: ${g.w}\n")
    appendRows(sb, g)
  }

  private def appendRows(sb: StringBuilder, g: Grid): String = {
    var r = 0
    while (r < g.h) {
      var c = 0
      while (c < g.w) {
        if (c > 0) sb.append(' ')
        sb.append(fmt(g.at(c, r)))
        c += 1
      }
      sb.append('\n')
      r += 1
    }
    sb.toString
  }

  /** Minimal baseline GeoTIFF: II byte order, one IFD, one uncompressed
    * strip of Float32 samples, ModelPixelScale + ModelTiepoint tags.
    * The tiepoint maps raster (0,0) [top-left corner] to the same world
    * origin as the reference's geotransform. */
  def geoTiff(g: Grid, dx: Double, dy: Double,
              originX: Double, originY: Double): Array[Byte] = {
    val nTags = 13
    val ifdOff = 8
    val ifdSize = 2 + nTags * 12 + 4
    val scaleOff = ifdOff + ifdSize        // 3 doubles
    val tieOff = scaleOff + 24             // 6 doubles
    val geoKeyOff = tieOff + 48            // 4 shorts
    val dataOff = geoKeyOff + 8
    val dataLen = g.w * g.h * 4
    val bb = ByteBuffer.allocate(dataOff + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    bb.putShort(nTags.toShort)
    def tag(id: Int, tpe: Int, count: Int, value: Int): Unit = {
      bb.putShort(id.toShort).putShort(tpe.toShort).putInt(count)
      if (tpe == 3 && count == 1) bb.putShort(value.toShort).putShort(0)
      else bb.putInt(value)
    }
    tag(256, 3, 1, g.w)           // ImageWidth
    tag(257, 3, 1, g.h)           // ImageLength
    tag(258, 3, 1, 32)            // BitsPerSample
    tag(259, 3, 1, 1)             // Compression = none
    tag(262, 3, 1, 1)             // Photometric = BlackIsZero
    tag(273, 4, 1, dataOff)       // StripOffsets
    tag(277, 3, 1, 1)             // SamplesPerPixel
    tag(278, 3, 1, g.h)           // RowsPerStrip (single strip)
    tag(279, 4, 1, dataLen)       // StripByteCounts
    tag(284, 3, 1, 1)             // PlanarConfiguration
    tag(33550, 12, 3, scaleOff)   // ModelPixelScaleTag
    tag(33922, 12, 6, tieOff)     // ModelTiepointTag
    tag(34735, 3, 4, geoKeyOff)   // GeoKeyDirectoryTag (header only)
    bb.putInt(0)                  // next IFD = none
    bb.putDouble(dx).putDouble(dy).putDouble(0.0)
    // raster (0,0,0) -> world (west edge, north edge, 0)
    bb.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    bb.putDouble(originX + g.pxMin * dx)
      .putDouble(originY + (g.pyMin + g.h) * dy)
      .putDouble(0.0)
    bb.putShort(1).putShort(1).putShort(0).putShort(0) // GeoKey v1.1.0, 0 keys
    var i = 0
    while (i < g.vals.length) { bb.putFloat(g.vals(i).toFloat); i += 1 }
    bb.array()
  }

  /** Sanity reader for the minimal GeoTIFF above (spec round-trips). */
  def readGeoTiff(bytes: Array[Byte]): (Int, Int, (Double, Double),
      (Double, Double), Array[Float]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getShort(0) == ('I' | ('I' << 8)).toShort && bb.getShort(2) == 42,
      "not a little-endian TIFF")
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xFFFF
    var w = 0; var h = 0; var dataOff = 0; var dataLen = 0
    var scaleOff = 0; var tieOff = 0
    (0 until n).foreach { i =>
      val p = ifd + 2 + i * 12
      val id = bb.getShort(p) & 0xFFFF
      val tpe = bb.getShort(p + 2) & 0xFFFF
      val v = if (tpe == 3) bb.getShort(p + 8) & 0xFFFF else bb.getInt(p + 8)
      id match {
        case 256 => w = v
        case 257 => h = v
        case 273 => dataOff = v
        case 279 => dataLen = v
        case 33550 => scaleOff = bb.getInt(p + 8)
        case 33922 => tieOff = bb.getInt(p + 8)
        case _ =>
      }
    }
    val scale = (bb.getDouble(scaleOff), bb.getDouble(scaleOff + 8))
    val origin = (bb.getDouble(tieOff + 24), bb.getDouble(tieOff + 32))
    val vals = Array.tabulate(w * h)(i => bb.getFloat(dataOff + i * 4))
    (w, h, scale, origin, vals)
  }

  /** Emit one file per (type x format) from the aggregated cell table,
    * points2grid-style naming: `<filename>.<type>.<ext>`. Returns the
    * written paths. */
  def writeP2g(filename: String, cells: DataFrame, dx: Double, dy: Double,
               originX: Double, originY: Double,
               types: Seq[String], format: String): Seq[String] = {
    val wanted =
      if (types.isEmpty || types.contains("all")) TypeCols
      else TypeCols.filter { case (t, _) => types.contains(t) }
    require(wanted.nonEmpty, s"writers.p2g: no valid output_type in $types")
    val formats = format match {
      case "all" => Seq("grid", "asc", "tif")
      case f @ ("grid" | "asc" | "tif") => Seq(f)
      case other => throw new IllegalArgumentException(
        s"Unrecognized output format $other") // P2gWriter.cpp:106 wording
    }
    import org.apache.spark.sql.functions.col
    val rows = cells.select(
        Seq(col("px"), col("py")) ++ wanted.map(w => col(w._2)): _*)
      .collect()
    val paths = for (((t, _), ti) <- wanted.zipWithIndex; f <- formats) yield {
      val g = toGrid(rows.toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.get(ti + 2) match {
          case null => NoData
          case l: java.lang.Long => l.toDouble
          case d: java.lang.Double => d
          case x => x.toString.toDouble
        })))
      val p = s"$filename.$t.$f"
      val bytes = f match {
        case "asc" => arcAscii(g, dx, dy, originX, originY).getBytes("US-ASCII")
        case "grid" => gridAscii(g, dx, dy, originX, originY).getBytes("US-ASCII")
        case "tif" => geoTiff(g, dx, dy, originX, originY)
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
      p
    }
    paths
  }
}
