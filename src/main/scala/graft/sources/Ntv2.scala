package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** NTv2 datum grid-shift file (.gsb) — clean-room reader/writer from the
  * public format description (Geodetic Survey of Canada, "National
  * Transformation version 2, Developer's Guide"; the same layout PROJ and
  * GDAL consume). The reference gets NAD27-era datum shifts through
  * GDAL/OSR (filters/reprojection/ReprojectionFilter.cpp:131-180); this
  * engine reads the grid itself and applies the shift as a codegen'd
  * per-row expression over a broadcast float table — no native library.
  *
  * File layout (all records 16 bytes: 8-byte ASCII name + 8-byte value):
  *   - 11 overview records: NUM_OREC(i32), NUM_SREC(i32), NUM_FILE(i32),
  *     GS_TYPE, VERSION, SYSTEM_F, SYSTEM_T (8-char), MAJOR_F, MINOR_F,
  *     MAJOR_T, MINOR_T (f64).
  *   - per subgrid, 11 records: SUB_NAME, PARENT, CREATED, UPDATED
  *     (8-char), S_LAT, N_LAT, E_LONG, W_LONG, LAT_INC, LONG_INC (f64,
  *     arc-seconds, longitude positive WEST), GS_COUNT (i32);
  *     then GS_COUNT nodes x 16 bytes: lat shift, lon shift, lat
  *     accuracy, lon accuracy — four f32, shifts in arc-seconds,
  *     longitude shift positive west.
  *   - node order: row-major south->north; within a row east->west
  *     (i.e. increasing positive-west longitude).
  * Endianness is not declared — sniffed from NUM_OREC == 11.
  *
  * SCALE: a national grid is a few MB of float32 (NADCON CONUS ~ 6 MB);
  * the parsed [[Grid]] rides the plan as a reference object, so on a
  * 1000-executor cluster it broadcasts once per executor and the shift
  * stays inside whole-stage codegen — no join, no shuffle, O(1) per row.
  */
object Ntv2 {

  final case class SubGrid(
      name: String, parent: String,
      sLat: Double, nLat: Double, eLonW: Double, wLonW: Double,
      latInc: Double, lonInc: Double,
      latShift: Array[Float], lonShift: Array[Float],
      latAcc: Array[Float], lonAcc: Array[Float]) extends Serializable {
    val nRows: Int = math.round((nLat - sLat) / latInc).toInt + 1
    val nCols: Int = math.round((wLonW - eLonW) / lonInc).toInt + 1
    require(latShift.length == nRows * nCols,
      s"ntv2: subgrid $name GS_COUNT ${latShift.length} != $nRows rows x $nCols cols")
    // bilinear() reads a 2x2 node window; a 1-row/1-col subgrid would
    // clamp its base index to 0 and read past the node array — reject
    // the degenerate extent loudly at parse time instead
    require(nRows >= 2 && nCols >= 2,
      s"ntv2: subgrid $name degenerate extent ($nRows rows x $nCols cols; need >= 2x2 for bilinear)")
    def contains(latSec: Double, lonWSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat && lonWSec >= eLonW && lonWSec <= wLonW
  }

  final case class Grid(systemFrom: String, systemTo: String,
                        subs: Array[SubGrid]) extends Serializable {
    require(subs.nonEmpty, "ntv2: no subgrids")
  }

  // ---- parse -----------------------------------------------------------

  def parse(bytes: Array[Byte]): Grid = {
    require(bytes.length >= 11 * 16, "ntv2: file shorter than overview header")
    // endian sniff: NUM_OREC's value (record 0, offset 8) must be 11
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val order =
      if (le.getInt(8) == 11) ByteOrder.LITTLE_ENDIAN
      else {
        val be = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        require(be.getInt(8) == 11, "ntv2: NUM_OREC != 11 in either byte order")
        ByteOrder.BIG_ENDIAN
      }
    val bb = ByteBuffer.wrap(bytes).order(order)
    def name(at: Int) = new String(bytes, at, 8, StandardCharsets.US_ASCII).trim
    def str(at: Int) = new String(bytes, at + 8, 8, StandardCharsets.US_ASCII).trim

    var numFile = -1; var sysF = ""; var sysT = ""
    (0 until 11).foreach { i =>
      val at = i * 16
      name(at) match {
        case "NUM_OREC" => require(bb.getInt(at + 8) == 11, "ntv2: NUM_OREC != 11")
        case "NUM_SREC" => require(bb.getInt(at + 8) == 11, "ntv2: NUM_SREC != 11")
        case "NUM_FILE" => numFile = bb.getInt(at + 8)
        case "GS_TYPE" =>
          require(str(at) == "SECONDS", s"ntv2: GS_TYPE '${str(at)}' unsupported (SECONDS only)")
        case "SYSTEM_F" => sysF = str(at)
        case "SYSTEM_T" => sysT = str(at)
        case "VERSION" | "MAJOR_F" | "MINOR_F" | "MAJOR_T" | "MINOR_T" => // informative
        case other => throw new IllegalArgumentException(s"ntv2: unknown overview record '$other'")
      }
    }
    require(numFile > 0, "ntv2: NUM_FILE missing or non-positive")

    var pos = 11 * 16
    val subs = Array.newBuilder[SubGrid]
    (0 until numFile).foreach { _ =>
      require(bytes.length >= pos + 11 * 16, "ntv2: truncated subgrid header")
      var subName = ""; var parent = ""
      var sLat = 0.0; var nLat = 0.0; var eLon = 0.0; var wLon = 0.0
      var latInc = 0.0; var lonInc = 0.0; var count = -1
      (0 until 11).foreach { i =>
        val at = pos + i * 16
        name(at) match {
          case "SUB_NAME" => subName = str(at)
          case "PARENT" => parent = str(at)
          case "CREATED" | "UPDATED" => // informative
          case "S_LAT" => sLat = bb.getDouble(at + 8)
          case "N_LAT" => nLat = bb.getDouble(at + 8)
          case "E_LONG" => eLon = bb.getDouble(at + 8)
          case "W_LONG" => wLon = bb.getDouble(at + 8)
          case "LAT_INC" => latInc = bb.getDouble(at + 8)
          case "LONG_INC" => lonInc = bb.getDouble(at + 8)
          case "GS_COUNT" => count = bb.getInt(at + 8)
          case other => throw new IllegalArgumentException(s"ntv2: unknown subgrid record '$other'")
        }
      }
      require(count > 0 && latInc > 0 && lonInc > 0,
        s"ntv2: subgrid $subName bad GS_COUNT/INC ($count, $latInc, $lonInc)")
      pos += 11 * 16
      // long arithmetic: a corrupt GS_COUNT near 2^27 overflows
      // count * 16 as Int and would slip past this guard into a crash
      require(bytes.length.toLong >= pos.toLong + count.toLong * 16,
        s"ntv2: truncated node data in $subName (GS_COUNT $count)")
      val latShift = new Array[Float](count); val lonShift = new Array[Float](count)
      val latAcc = new Array[Float](count); val lonAcc = new Array[Float](count)
      var k = 0
      while (k < count) {
        latShift(k) = bb.getFloat(pos); lonShift(k) = bb.getFloat(pos + 4)
        latAcc(k) = bb.getFloat(pos + 8); lonAcc(k) = bb.getFloat(pos + 12)
        pos += 16; k += 1
      }
      subs += SubGrid(subName, parent, sLat, nLat, eLon, wLon, latInc, lonInc,
        latShift, lonShift, latAcc, lonAcc)
    }
    Grid(sysF, sysT, subs.result())
  }

  // ---- write (fixture synthesis + round-trip validation) ---------------

  def write(g: Grid, order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val size = 11 * 16 + g.subs.map(s => 11 * 16 + s.latShift.length * 16).sum
    val bb = ByteBuffer.allocate(size).order(order)
    def rec(nm: String)(put: => Unit): Unit = {
      bb.put(String.format("%-8s", nm).getBytes(StandardCharsets.US_ASCII))
      val mark = bb.position(); put
      while (bb.position() < mark + 8) bb.put(' '.toByte)
    }
    def recI(nm: String, v: Int): Unit = rec(nm) { bb.putInt(v) }
    def recD(nm: String, v: Double): Unit = rec(nm) { bb.putDouble(v) }
    def recS(nm: String, v: String): Unit = rec(nm) {
      bb.put(String.format("%-8s", v).getBytes(StandardCharsets.US_ASCII))
    }
    recI("NUM_OREC", 11); recI("NUM_SREC", 11); recI("NUM_FILE", g.subs.length)
    recS("GS_TYPE", "SECONDS"); recS("VERSION", "NTv2.0")
    recS("SYSTEM_F", g.systemFrom); recS("SYSTEM_T", g.systemTo)
    // Clarke 1866 -> GRS80, the NAD27->NAD83 pairing (informative)
    recD("MAJOR_F", 6378206.4); recD("MINOR_F", 6356583.8)
    recD("MAJOR_T", 6378137.0); recD("MINOR_T", 6356752.314140356)
    g.subs.foreach { s =>
      recS("SUB_NAME", s.name); recS("PARENT", s.parent)
      recS("CREATED", "20260818"); recS("UPDATED", "20260818")
      recD("S_LAT", s.sLat); recD("N_LAT", s.nLat)
      recD("E_LONG", s.eLonW); recD("W_LONG", s.wLonW)
      recD("LAT_INC", s.latInc); recD("LONG_INC", s.lonInc)
      recI("GS_COUNT", s.latShift.length)
      var k = 0
      while (k < s.latShift.length) {
        bb.putFloat(s.latShift(k)); bb.putFloat(s.lonShift(k))
        bb.putFloat(s.latAcc(k)); bb.putFloat(s.lonAcc(k))
        k += 1
      }
    }
    bb.array()
  }

  // ---- shift application ------------------------------------------------

  /** Densest subgrid containing the point (NTv2 parent/child descent:
    * a well-formed file nests children inside parents with strictly
    * finer increments, so min-increment-containing == deepest child). */
  def select(g: Grid, latSec: Double, lonWSec: Double): SubGrid = {
    var best: SubGrid = null
    var i = 0
    while (i < g.subs.length) {
      val s = g.subs(i)
      if (s.contains(latSec, lonWSec) &&
          (best == null || s.latInc < best.latInc ||
            (s.latInc == best.latInc && s.lonInc < best.lonInc)))
        best = s
      i += 1
    }
    if (best == null)
      throw new IllegalArgumentException(
        f"ntv2: point (lat ${latSec / 3600}%.6f, lonW ${lonWSec / 3600}%.6f deg) " +
          "outside every subgrid (pass outside=pass to leave such points unshifted)")
    best
  }

  /** Bilinear shift at (latSec, lonWSec) in arc-seconds.
    * KEEP THE OPERATION ORDER IN SYNC with the q_grid_shift oracle SQL
    * (EntryPipelines.gridShiftSql) — the oracle mirrors this arithmetic
    * term for term so both sides are bit-identical doubles. */
  def bilinear(s: SubGrid, latSec: Double, lonWSec: Double): (Double, Double) = {
    val row = (latSec - s.sLat) / s.latInc
    val colF = (lonWSec - s.eLonW) / s.lonInc
    var r0 = math.floor(row).toInt
    var c0 = math.floor(colF).toInt
    if (r0 > s.nRows - 2) r0 = s.nRows - 2
    if (c0 > s.nCols - 2) c0 = s.nCols - 2
    if (r0 < 0) r0 = 0
    if (c0 < 0) c0 = 0
    val fy = row - r0
    val fx = colF - c0
    val w00 = (1 - fx) * (1 - fy); val w10 = fx * (1 - fy)
    val w01 = (1 - fx) * fy; val w11 = fx * fy
    val i00 = r0 * s.nCols + c0
    val dLat = w00 * s.latShift(i00) + w10 * s.latShift(i00 + 1) +
      w01 * s.latShift(i00 + s.nCols) + w11 * s.latShift(i00 + s.nCols + 1)
    val dLonW = w00 * s.lonShift(i00) + w10 * s.lonShift(i00 + 1) +
      w01 * s.lonShift(i00 + s.nCols) + w11 * s.lonShift(i00 + s.nCols + 1)
    (dLat, dLonW)
  }

  /** Forward shift: source-datum (lonE, lat) degrees -> target datum.
    * `pass` leaves outside-grid points unshifted instead of throwing
    * (GDAL's CHECK_WITH_INVERT_PROJ=NO legacy behavior); default loud. */
  def forward(g: Grid, lonEDeg: Double, latDeg: Double, pass: Boolean): (Double, Double) = {
    val latSec = latDeg * 3600.0
    val lonWSec = -lonEDeg * 3600.0
    val sub = selectOrNull(g, latSec, lonWSec, pass)
    if (sub == null) return (lonEDeg, latDeg)
    val (dLat, dLonW) = bilinear(sub, latSec, lonWSec)
    (lonEDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
  }

  /** Inverse shift (target -> source datum): fixed-point iteration like
    * PROJ's ntv2 inverse — the shift field is smooth and ~1e2 arcsec at
    * most, so 6 rounds converge far below 1e-12 deg. */
  def inverse(g: Grid, lonEDeg: Double, latDeg: Double, pass: Boolean): (Double, Double) = {
    var lonE = lonEDeg; var lat = latDeg
    var i = 0
    while (i < 6) {
      val sub = selectOrNull(g, lat * 3600.0, -lonE * 3600.0, pass)
      if (sub == null) return (lonEDeg, latDeg)
      val (dLat, dLonW) = bilinear(sub, lat * 3600.0, -lonE * 3600.0)
      lonE = lonEDeg + dLonW / 3600.0
      lat = latDeg - dLat / 3600.0
      i += 1
    }
    (lonE, lat)
  }

  private def selectOrNull(g: Grid, latSec: Double, lonWSec: Double,
                           pass: Boolean): SubGrid =
    if (!pass) select(g, latSec, lonWSec)
    else {
      var best: SubGrid = null
      var i = 0
      while (i < g.subs.length) {
        val s = g.subs(i)
        if (s.contains(latSec, lonWSec) &&
            (best == null || s.latInc < best.latInc ||
              (s.latInc == best.latInc && s.lonInc < best.lonInc)))
          best = s
        i += 1
      }
      best
    }

  // ---- static entry points for codegen (which-style, like Proj.*) ------

  def fwdLon(lon: Double, lat: Double, g: Grid, pass: Boolean): Double =
    forward(g, lon, lat, pass)._1
  def fwdLat(lon: Double, lat: Double, g: Grid, pass: Boolean): Double =
    forward(g, lon, lat, pass)._2
  def invLon(lon: Double, lat: Double, g: Grid, pass: Boolean): Double =
    inverse(g, lon, lat, pass)._1
  def invLat(lon: Double, lat: Double, g: Grid, pass: Boolean): Double =
    inverse(g, lon, lat, pass)._2

  // ---- deterministic synthetic grid (tests + q_grid_shift oracle) ------

  /** Node generators for the oracle grid — SQL-mirrorable arithmetic
    * (exact-int row/col in double, one float32 quantization at the end).
    * KEEP IN SYNC with EntryPipelines.gridShiftSql. */
  def demoLatShift(r: Int, c: Int): Float =
    (0.8 + 0.01 * r + 0.002 * c + 0.0001 * (r * c)).toFloat
  def demoLonShift(r: Int, c: Int): Float =
    (1.5 - 0.004 * r + 0.03 * c + 0.0002 * (r * c)).toFloat

  /** One-subgrid demo grid: lat 39..49 N, lon 115..126 W, 0.5 deg steps
    * (arc-second header values are exact integers). Written+re-parsed so
    * every query/spec crosses the real codec. */
  def demoGrid(): Grid = {
    val sLat = 39 * 3600.0; val nLatV = 49 * 3600.0
    val eLon = 115 * 3600.0; val wLon = 126 * 3600.0
    val inc = 1800.0
    val nRows = 21; val nCols = 23
    val latShift = new Array[Float](nRows * nCols)
    val lonShift = new Array[Float](nRows * nCols)
    val acc = new Array[Float](nRows * nCols)
    var r = 0
    while (r < nRows) {
      var c = 0
      while (c < nCols) {
        latShift(r * nCols + c) = demoLatShift(r, c)
        lonShift(r * nCols + c) = demoLonShift(r, c)
        c += 1
      }
      r += 1
    }
    val g = Grid("NAD27", "NAD83",
      Array(SubGrid("DEMO", "NONE", sLat, nLatV, eLon, wLon, inc, inc,
        latShift, lonShift, acc, acc)))
    parse(write(g)) // round-trip through the codec on every construction
  }
}
