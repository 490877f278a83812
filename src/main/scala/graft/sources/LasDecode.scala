package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/** Minimal LAS 1.0-1.2 point decoder (point record formats 0-3), from the
  * public ASPRS LAS specification; field layout cross-checked against the
  * reference's record decode (io/las/LasReader.cpp:651-720 loadPointV10:
  * int32 x,y,z scaled+offset, u16 intensity, flag byte, classification,
  * i8 scan angle, u8 user data, u16 point source id, then f64 gps time
  * [fmt 1,3], 3x u16 rgb [fmt 2,3]).
  *
  * Purpose: decoding the reference's small golden fixtures (P1065 =
  * test/data/las/1.2-with-color.las) into the engine's point frame for
  * row-for-row parity tests. Driver-side read, fixture-scale only — the
  * production ingest path is the parquet/doc-table source.
  */
object LasDecode {
  final case class LasHeader(
    versionMajor: Int, versionMinor: Int, pointFormat: Int, recordLen: Int,
    pointCount: Long, dataOffset: Long,
    sx: Double, sy: Double, sz: Double, ox: Double, oy: Double, oz: Double,
    maxx: Double, minx: Double, maxy: Double, miny: Double, maxz: Double, minz: Double)

  def readHeader(bb: ByteBuffer): LasHeader = {
    bb.order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get(0) == 'L' && bb.get(1) == 'A' && bb.get(2) == 'S' && bb.get(3) == 'F',
      "not a LAS file")
    LasHeader(
      versionMajor = bb.get(24) & 0xff, versionMinor = bb.get(25) & 0xff,
      pointFormat = bb.get(104) & 0xff, recordLen = bb.getShort(105) & 0xffff,
      pointCount = bb.getInt(107) & 0xffffffffL, dataOffset = bb.getInt(96) & 0xffffffffL,
      sx = bb.getDouble(131), sy = bb.getDouble(139), sz = bb.getDouble(147),
      ox = bb.getDouble(155), oy = bb.getDouble(163), oz = bb.getDouble(171),
      maxx = bb.getDouble(179), minx = bb.getDouble(187),
      maxy = bb.getDouble(195), miny = bb.getDouble(203),
      maxz = bb.getDouble(211), minz = bb.getDouble(219))
  }

  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("span_idx", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("z", DoubleType, nullable = false),
    StructField("intensity", IntegerType, nullable = false),
    StructField("return_number", ShortType, nullable = false),
    StructField("number_of_returns", ShortType, nullable = false),
    StructField("classification", ShortType, nullable = false),
    StructField("scan_angle_rank", FloatType, nullable = false),
    StructField("user_data", ShortType, nullable = false),
    StructField("point_source_id", IntegerType, nullable = false),
    StructField("gps_time", DoubleType, nullable = false),
    StructField("red", IntegerType, nullable = false),
    StructField("green", IntegerType, nullable = false),
    StructField("blue", IntegerType, nullable = false)))

  def readPoints(path: String, docId: String = "las"): (LasHeader, Vector[Row]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val h = readHeader(bb)
    require(h.pointFormat <= 3, s"unsupported point format ${h.pointFormat}")
    val rows = Vector.newBuilder[Row]
    var i = 0L
    while (i < h.pointCount) {
      val base = (h.dataOffset + i * h.recordLen).toInt
      val xi = bb.getInt(base); val yi = bb.getInt(base + 4); val zi = bb.getInt(base + 8)
      val intensity = bb.getShort(base + 12) & 0xffff
      val flags = bb.get(base + 14) & 0xff
      val cls = bb.get(base + 15) & 0xff
      val angle = bb.get(base + 16).toFloat // i8, degrees
      val user = bb.get(base + 17) & 0xff
      val psid = bb.getShort(base + 18) & 0xffff
      var off = base + 20
      val gps = if (h.pointFormat == 1 || h.pointFormat == 3) {
        val g = bb.getDouble(off); off += 8; g
      } else 0.0
      val (r, g2, b) = if (h.pointFormat == 2 || h.pointFormat == 3) {
        (bb.getShort(off) & 0xffff, bb.getShort(off + 2) & 0xffff, bb.getShort(off + 4) & 0xffff)
      } else (0, 0, 0)
      rows += Row(docId, i.toInt,
        xi * h.sx + h.ox, yi * h.sy + h.oy, zi * h.sz + h.oz,
        intensity,
        (flags & 0x7).toShort, ((flags >> 3) & 0x7).toShort,
        cls.toShort, angle, user.toShort, psid, gps, r, g2, b)
      i += 1
    }
    (h, rows.result())
  }

  def asDataFrame(spark: SparkSession, path: String, docId: String = "las"): DataFrame = {
    val (_, rows) = readPoints(path, docId)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }
}
