package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/** LAS 1.0-1.4 point decoder (point record formats 0-10), from the public
  * ASPRS LAS specification; field layout cross-checked against the
  * reference's record decode:
  *  - formats 0-5 (io/las/LasReader.cpp:651-720 loadPoint/loadPointV10:
  *    int32 x,y,z scaled+offset, u16 intensity, flag byte (return 3 bits,
  *    #returns 3 bits, scan dir, edge), classification, i8 scan angle,
  *    u8 user data, u16 point source id, then f64 gps time [fmt 1,3,4,5],
  *    3x u16 rgb [fmt 2,3,5]; wave packets [fmt 4,5] skipped)
  *  - formats 6-10 (io/las/LasReader.cpp:722-788 loadPointV14: int32
  *    x,y,z, u16 intensity, returns byte (4+4 bits), flags byte (class
  *    flags 4, scanner channel 2, scan dir 1, edge 1), u8 classification,
  *    u8 user data, i16 scan angle * 0.006 deg, u16 point source id,
  *    f64 gps time, rgb [fmt 7,8,10], u16 NIR [fmt 8,10])
  *  - header (io/las/LasHeader.cpp:200-255): legacy u32 count at 107;
  *    1.3+ adds the waveform offset; 1.4 stores the real u64 count at
  *    byte 247 and 15 u64 per-return counts; point-format byte masks
  *    off the two laszip compression bits (~0xC0).
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
    val minor = bb.get(25) & 0xff
    // the two high bits of the format byte flag laszip compression
    // (LasHeader.cpp:222-226); mask them off like the reference
    val fmt = bb.get(104) & 0x3f
    val legacyCount = bb.getInt(107) & 0xffffffffL
    // LAS 1.4: the authoritative u64 count lives at byte 247 (legacy u32
    // is zero when the cloud exceeds u32 or uses formats 6+)
    val count =
      if (minor >= 4) { val c = bb.getLong(247); if (c != 0) c else legacyCount }
      else legacyCount
    LasHeader(
      versionMajor = bb.get(24) & 0xff, versionMinor = minor,
      pointFormat = fmt, recordLen = bb.getShort(105) & 0xffff,
      pointCount = count, dataOffset = bb.getInt(96) & 0xffffffffL,
      sx = bb.getDouble(131), sy = bb.getDouble(139), sz = bb.getDouble(147),
      ox = bb.getDouble(155), oy = bb.getDouble(163), oz = bb.getDouble(171),
      maxx = bb.getDouble(179), minx = bb.getDouble(187),
      maxy = bb.getDouble(195), miny = bb.getDouble(203),
      maxz = bb.getDouble(211), minz = bb.getDouble(219))
  }

  // ---- VLRs + SRS inference -------------------------------------------

  /** One variable-length record: 54-byte header (reserved u16, user_id
    * char[16], record_id u16, payload length u16, description char[32])
    * followed by the payload (io/las/VariableLengthRecord.hpp layout). */
  final case class Vlr(userId: String, recordId: Int, description: String,
                       payload: Array[Byte])

  private def cString(bytes: Array[Byte]): String = {
    val n = bytes.indexOf(0.toByte)
    new String(bytes, 0, if (n < 0) bytes.length else n, "US-ASCII").trim
  }

  /** Parse the VLR block between the header and the point data
    * (io/las/LasReader.cpp:307-380 VLR loop). Tolerant of truncation:
    * stops at the first record that would run past the data offset. */
  def readVlrs(bb: ByteBuffer): Seq[Vlr] = {
    bb.order(ByteOrder.LITTLE_ENDIAN)
    val headerSize = bb.getShort(94) & 0xffff
    val nVlrs = bb.getInt(100)
    val dataOffset = bb.getInt(96) & 0xffffffffL
    val out = Vector.newBuilder[Vlr]
    var off = headerSize
    var i = 0
    while (i < nVlrs && off + 54 <= math.min(dataOffset, bb.capacity().toLong)) {
      val uid = new Array[Byte](16); val desc = new Array[Byte](32)
      var p = off + 2
      (0 until 16).foreach { j => uid(j) = bb.get(p + j) }; p += 16
      val rid = bb.getShort(p) & 0xffff; p += 2
      val len = bb.getShort(p) & 0xffff; p += 2
      (0 until 32).foreach { j => desc(j) = bb.get(p + j) }; p += 32
      if (p + len <= bb.capacity()) {
        val payload = new Array[Byte](len)
        (0 until len).foreach { j => payload(j) = bb.get(p + j) }
        out += Vlr(cString(uid), rid, cString(desc), payload)
      }
      off = p + len
      i += 1
    }
    out.result()
  }

  /** EPSG code from the LASF_Projection VLRs: GeoTIFF GeoKeyDirectoryTag
    * (record 34735; short entries (keyId, tagLoc, count, value) after the
    * 4-short directory header — GeoTIFF spec 2.4) with
    * ProjectedCSTypeGeoKey 3072 taking precedence over
    * GeographicTypeGeoKey 2048; falls back to an OGC WKT record (2112)
    * AUTHORITY tail. 32767 = user-defined -> unknown. Mirrors what the
    * reference extracts via GDAL in ReprojectionFilter.cpp:131-180. */
  def epsgOf(vlrs: Seq[Vlr]): Option[Int] = {
    val geoKeys = vlrs.find(v => v.userId == "LASF_Projection" && v.recordId == 34735)
      .map { v =>
        val p = ByteBuffer.wrap(v.payload).order(ByteOrder.LITTLE_ENDIAN)
        val n = p.getShort(6) & 0xffff
        (0 until n).map { k =>
          (p.getShort(8 + 8 * k) & 0xffff, p.getShort(10 + 8 * k) & 0xffff,
            p.getShort(14 + 8 * k) & 0xffff)
        }
      }.getOrElse(Nil)
    def key(id: Int): Option[Int] = geoKeys.collectFirst {
      case (kid, 0, value) if kid == id && value != 32767 => value
    }
    key(3072).orElse(key(2048)).orElse {
      // OGC coordinate system WKT (LAS 1.4 record 2112)
      vlrs.find(v => v.userId == "LASF_Projection" && v.recordId == 2112)
        .flatMap { v =>
          val wkt = cString(v.payload)
          """(?s).*(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
            .findFirstMatchIn(wkt).map(_.group(1).toInt)
        }
    }
  }

  /** Map an EPSG code onto the engine's named-SRS registry
    * ([[graft.operators.Reproject]]). NAD83 UTM zones map to the WGS84
    * ellipsoid zones — the registry has NO datum shifts (documented
    * loudly there); NAD83 and WGS84 differ by under 2 m, which matches
    * the no-GDAL contract. Unknown codes -> None (callers fail loudly
    * when asked to auto-infer). */
  def registrySrsForEpsg(code: Int): Option[String] = code match {
    case 4326 | 4269 => Some("EPSG:4326") // NAD83 geographic ~ WGS84 (no datum shift)
    case 3857 | 900913 => Some("EPSG:3857")
    case c if c >= 32601 && c <= 32660 => Some(s"utm:${c - 32600}")
    case c if c >= 26901 && c <= 26923 => Some(s"utm:${c - 26900}") // NAD83 zones
    case _ => None
  }

  /** Parse the LAS 1.4 EXTENDED VLRs (EVLRs) of a file: the header's
    * u64 EVLR offset (byte 235) and u32 count (byte 243) point past the
    * point data; each record is a 60-byte header (reserved u16, user_id
    * char[16], record_id u16, payload length u64, description char[32])
    * plus payload. A 1.4 file may carry its WKT SRS (record 2112) ONLY
    * here, after the points — [[srsOf]] folds these in. Reads just the
    * EVLR region (seek + bounded reads), never the point data; payloads
    * above `maxPayload` are skipped (a waveform-data EVLR can be GBs). */
  def readEvlrs(path: String, maxPayload: Int = 16 << 20): Seq[Vlr] = {
    val head = {
      val in = Files.newInputStream(Paths.get(path))
      try in.readNBytes(375) finally in.close()
    }
    if (head.length < 375 || (head(25) & 0xff) < 4) return Nil
    val hb = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
    val evlrOff = hb.getLong(235)
    val n = hb.getInt(243)
    val fileLen = Files.size(Paths.get(path))
    if (evlrOff <= 0 || n <= 0 || evlrOff + 60 > fileLen) return Nil
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    try {
      val out = Vector.newBuilder[Vlr]
      var off = evlrOff
      var i = 0
      while (i < n && off + 60 <= fileLen) {
        val hdr = ByteBuffer.allocate(60).order(ByteOrder.LITTLE_ENDIAN)
        ch.read(hdr, off)
        hdr.flip()
        val uid = new Array[Byte](16); val desc = new Array[Byte](32)
        hdr.position(2); hdr.get(uid)
        val rid = hdr.getShort() & 0xffff
        val len = hdr.getLong()
        hdr.get(desc)
        if (len >= 0 && len <= maxPayload && off + 60 + len <= fileLen) {
          val payload = ByteBuffer.allocate(len.toInt)
          ch.read(payload, off + 60)
          out += Vlr(cString(uid), rid, cString(desc), payload.array())
        }
        off += 60 + math.max(0L, len)
        i += 1
      }
      out.result()
    } finally ch.close()
  }

  /** Header of a LAS file from its first bytes only (zero Spark jobs) —
    * the free row-count/extent source for pipeline routing decisions. */
  def headerOf(path: String): LasHeader = {
    val in = Files.newInputStream(Paths.get(path))
    val head = try in.readNBytes(375) finally in.close()
    readHeader(ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN))
  }

  /** Inferred registry SRS of a LAS file, from its VLRs ("in_srs"
    * auto-detection — ReprojectionFilter.cpp:131-180 discipline). Reads
    * only the header + VLR block, never the point data. */
  def srsOf(path: String): Option[String] = {
    val in = Files.newInputStream(Paths.get(path))
    val bytes = try {
      val head = in.readNBytes(375)
      val dataOffset = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
        .getInt(96) & 0xffffffffL
      head ++ in.readNBytes(math.max(0L, dataOffset - head.length).toInt)
    } finally in.close()
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // a 1.4 file may carry the WKT record 2112 only as an EVLR after the
    // point data — fold those in behind the inline VLRs
    epsgOf(readVlrs(bb) ++ readEvlrs(path)).flatMap(registrySrsForEpsg)
  }

  // ---- extra-bytes dimensions (VLR LASF_Spec record 4) -----------------

  /** One extra per-point dimension: record-relative byte offset, LAS
    * type code (1-10 scalars; the spec's multi-element codes 11-30 are
    * flattened to scalars with 0/1/2 name suffixes, matching the
    * reference's Colors0/Colors1/... naming, LasReaderTest.cpp:318-323),
    * optional scale/offset when the descriptor's options flags set them. */
  final case class ExtraDim(name: String, typeCode: Int, offset: Int,
                            scale: Option[Double], offsetV: Option[Double])

  private val ExtraTypeSize = Array(0, 1, 1, 2, 2, 4, 4, 8, 8, 4, 8)

  /** Parse the 192-byte extra-bytes descriptors (LAS 1.4 spec §
    * "Extra Bytes VLR"): reserved u16, data_type u8, options u8,
    * name[32], unused[4], no_data/min/max (3x8 each), scale[3x f64],
    * offset[3x f64], description[32]. Type 0 = `options` opaque bytes
    * (skipped but its width advances the cursor). `baseLen` is the
    * format's standard record length — extras follow it. */
  def extraDimsOf(vlrs: Seq[Vlr], baseLen: Int): Seq[ExtraDim] = {
    vlrs.find(v => v.userId == "LASF_Spec" && v.recordId == 4).map { v =>
      val bb = ByteBuffer.wrap(v.payload).order(ByteOrder.LITTLE_ENDIAN)
      val out = Seq.newBuilder[ExtraDim]
      var off = baseLen
      (0 until v.payload.length / 192).foreach { k =>
        val base = k * 192
        val t = bb.get(base + 2) & 0xFF
        val options = bb.get(base + 3) & 0xFF
        val name = cString(v.payload.slice(base + 4, base + 36))
        if (t == 0) off += options // opaque filler bytes advance the cursor
        else {
          require(t <= 30, s"extra-bytes type $t unsupported")
          val (scalar, n) =
            if (t <= 10) (t, 1) else if (t <= 20) (t - 10, 2) else (t - 20, 3)
          val size = ExtraTypeSize(scalar)
          (0 until n).foreach { e =>
            out += ExtraDim(
              if (n == 1) name else s"$name$e",
              scalar, off + e * size,
              if ((options & 0x08) != 0) Some(bb.getDouble(base + 112 + 8 * e)) else None,
              if ((options & 0x10) != 0) Some(bb.getDouble(base + 136 + 8 * e)) else None)
          }
          off += n * size
        }
      }
      out.result()
    }.getOrElse(Nil)
  }

  private def readExtra(bb: ByteBuffer, recBase: Int, d: ExtraDim): Any = {
    val p = recBase + d.offset
    val raw: Double = d.typeCode match {
      case 1 => (bb.get(p) & 0xFF).toDouble
      case 2 => bb.get(p).toDouble
      case 3 => (bb.getShort(p) & 0xFFFF).toDouble
      case 4 => bb.getShort(p).toDouble
      case 5 => (bb.getInt(p) & 0xFFFFFFFFL).toDouble
      case 6 => bb.getInt(p).toDouble
      case 7 | 8 => bb.getLong(p).toDouble // u64 > 2^63 out of scope
      case 9 => bb.getFloat(p).toDouble
      case 10 => bb.getDouble(p)
    }
    d.scale.map(s => raw * s + d.offsetV.getOrElse(0.0))
      .orElse(d.offsetV.map(raw + _))
      .getOrElse(raw)
  }

  /** Driver decode INCLUDING extra-bytes dimensions as appended DOUBLE
    * columns (the reference registers them as typed proprietary dims,
    * LasReader.cpp extra-dims path; doubles carry every fixture value
    * exactly and keep the schema Spark-simple). */
  def asDataFrameWithExtras(spark: SparkSession, path: String,
                            docId: String = "las"): DataFrame = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val h = readHeader(bb)
    requireSingleBuffer(h)
    val base = baseRecordLen(h.pointFormat)
    val extras = extraDimsOf(readVlrs(bb), base)
    val (pb, off0) = pointBytes(bytes, bb, h)
    // Spark resolves column names case-insensitively: an extra dim named
    // like a standard column (the fixture's "Intensity") gets an extra_
    // prefix instead of shadowing it
    val baseNames = schema.fieldNames.map(_.toLowerCase).toSet
    def colName(d: ExtraDim): String =
      if (baseNames.contains(d.name.toLowerCase)) s"extra_${d.name}" else d.name
    val fullSchema = StructType(schema.fields ++
      extras.map(d => StructField(colName(d), DoubleType, nullable = false)))
    val rows = (0L until h.pointCount).map { i =>
      val recBase = (off0 + i * h.recordLen).toInt
      val std = decodeRecord(pb, recBase, h, docId, i.toInt)
      Row.fromSeq(std.toSeq ++ extras.map(readExtra(pb, recBase, _)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), fullSchema)
  }

  /** Standard (pre-extra-bytes) record length by point format. */
  def baseRecordLen(fmt: Int): Int = fmt match {
    case 0 => 20; case 1 => 28; case 2 => 26; case 3 => 34
    case 4 => 57; case 5 => 63
    case 6 => 30; case 7 => 36; case 8 => 38; case 9 => 59; case 10 => 67
  }

  /** Capability predicates by point format (LasHeader.hpp:310-333). */
  def hasTime(fmt: Int): Boolean = fmt == 1 || (fmt >= 3 && fmt <= 5) || fmt >= 6
  def hasColor(fmt: Int): Boolean = fmt == 2 || fmt == 3 || fmt == 5 || fmt == 7 || fmt == 8 || fmt == 10
  def hasInfrared(fmt: Int): Boolean = fmt == 8 || fmt == 10
  def hasWave(fmt: Int): Boolean = fmt == 4 || fmt == 5 || fmt == 9 || fmt == 10
  def isV14(fmt: Int): Boolean = fmt >= 6

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
    StructField("blue", IntegerType, nullable = false),
    StructField("nir", IntegerType, nullable = false),
    StructField("scanner_channel", ShortType, nullable = false)))

  /** Single-buffer decodes index with Int offsets: fail clearly on
    * files past 2 GiB (1.4's u64 counts allow them) instead of wrapped
    * offsets and garbage records — large files go through
    * [[asSplitDataFrame]], which bounds each task's buffer. */
  private def requireSingleBuffer(h: LasHeader): Unit =
    require(h.dataOffset + h.pointCount * h.recordLen <= Int.MaxValue,
      s"file too large for single-buffer decode (${h.pointCount} records); " +
        "use the offset-split ingest (asSplitDataFrame / splits config)")

  /** The "laszip encoded" VLR, if this is a .laz stream. */
  def lazVlrOf(bb: ByteBuffer): Option[laz.LazDecoder.LazVlr] =
    readVlrs(bb).find(v => v.userId == "laszip encoded" && v.recordId == 22204)
      .map(v => laz.LazDecoder.parseVlr(v.payload))

  /** Point-record bytes of `bb`, decompressing LASzip streams into raw
    * records first (so every caller decodes through the same
    * golden-pinned [[decodeRecord]]). Returns (buffer, offset of record
    * 0 inside it). */
  private def pointBytes(bytes: Array[Byte], bb: ByteBuffer, h: LasHeader): (ByteBuffer, Long) =
    lazVlrOf(bb) match {
      case Some(vlr) =>
        val raw = laz.LazDecoder.decompress(bytes, h.dataOffset.toInt,
          h.pointCount.toInt, h.recordLen, vlr)
        (ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN), 0L)
      case None => (bb, h.dataOffset)
    }

  def readPoints(path: String, docId: String = "las"): (LasHeader, Vector[Row]) = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val h = readHeader(bb)
    require(h.pointFormat <= 10, s"unsupported point format ${h.pointFormat}")
    (h, decodeAll(bytes, bb, h, docId).toVector)
  }

  /** One point record -> one Row (schema above). */
  def decodeRecord(bb: ByteBuffer, base: Int, h: LasHeader,
                   docId: String, idx: Int): Row = {
    val fmt = h.pointFormat
    val xi = bb.getInt(base); val yi = bb.getInt(base + 4); val zi = bb.getInt(base + 8)
    val intensity = bb.getShort(base + 12) & 0xffff
    val x = xi * h.sx + h.ox; val y = yi * h.sy + h.oy; val z = zi * h.sz + h.oz
    if (!isV14(fmt)) {
      val flags = bb.get(base + 14) & 0xff
      val cls = bb.get(base + 15) & 0xff
      val angle = bb.get(base + 16).toFloat // i8, whole degrees
      val user = bb.get(base + 17) & 0xff
      val psid = bb.getShort(base + 18) & 0xffff
      var off = base + 20
      val gps = if (hasTime(fmt)) { val g = bb.getDouble(off); off += 8; g } else 0.0
      val (r, g2, b) = if (hasColor(fmt)) {
        (bb.getShort(off) & 0xffff, bb.getShort(off + 2) & 0xffff, bb.getShort(off + 4) & 0xffff)
      } else (0, 0, 0)
      // fmt 4/5 wave packet descriptors follow — skipped (vendor laszip
      // territory in the reference too)
      Row(docId, idx, x, y, z, intensity,
        (flags & 0x7).toShort, ((flags >> 3) & 0x7).toShort,
        cls.toShort, angle, user.toShort, psid, gps, r, g2, b, 0, 0.toShort)
    } else {
      val returnInfo = bb.get(base + 14) & 0xff
      val flags = bb.get(base + 15) & 0xff
      val cls = bb.get(base + 16) & 0xff
      val user = bb.get(base + 17) & 0xff
      val angle = (bb.getShort(base + 18) * 0.006).toFloat // i16 * 0.006 deg
      val psid = bb.getShort(base + 20) & 0xffff
      val gps = bb.getDouble(base + 22)
      var off = base + 30
      val (r, g2, b) = if (hasColor(fmt)) {
        val c = (bb.getShort(off) & 0xffff, bb.getShort(off + 2) & 0xffff, bb.getShort(off + 4) & 0xffff)
        off += 6; c
      } else (0, 0, 0)
      val nir = if (hasInfrared(fmt)) { val n = bb.getShort(off) & 0xffff; off += 2; n } else 0
      Row(docId, idx, x, y, z, intensity,
        (returnInfo & 0xf).toShort, ((returnInfo >> 4) & 0xf).toShort,
        cls.toShort, angle, user.toShort, psid, gps, r, g2, b, nir,
        ((flags >> 4) & 0x3).toShort)
    }
  }

  def asDataFrame(spark: SparkSession, path: String, docId: String = "las"): DataFrame = {
    val (_, rows) = readPoints(path, docId)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }

  /** [[decodeRecord]]'s zero-boxing twin for the PRODUCTION ingest
    * paths: writes the same 18 fields straight into a reusable
    * UnsafeRowWriter and returns a materialized copy — 2 allocations
    * per point instead of ~20 (external Row + field boxing + the
    * RowEncoder conversion projection). At 8+ concurrent decode tasks
    * in one JVM the allocation-rate/cache pressure of the boxed path
    * was the measured scaling bottleneck (LazScaleTry: GC <= 5% but
    * per-core throughput halved 2 -> 8 cores). Field-for-field
    * identical to decodeRecord; the distributed==driver equality specs
    * pin that. */
  def decodeRecordUnsafe(bb: ByteBuffer, base: Int, h: LasHeader,
                         docId: org.apache.spark.unsafe.types.UTF8String, idx: Int,
                         w: org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val fmt = h.pointFormat
    val xi = bb.getInt(base); val yi = bb.getInt(base + 4); val zi = bb.getInt(base + 8)
    val intensity = bb.getShort(base + 12) & 0xffff
    w.reset()
    w.write(0, docId)
    w.write(1, idx)
    w.write(2, xi * h.sx + h.ox)
    w.write(3, yi * h.sy + h.oy)
    w.write(4, zi * h.sz + h.oz)
    w.write(5, intensity)
    if (!isV14(fmt)) {
      val flags = bb.get(base + 14) & 0xff
      w.write(6, (flags & 0x7).toShort)
      w.write(7, ((flags >> 3) & 0x7).toShort)
      w.write(8, (bb.get(base + 15) & 0xff).toShort)
      w.write(9, bb.get(base + 16).toFloat)
      w.write(10, (bb.get(base + 17) & 0xff).toShort)
      w.write(11, bb.getShort(base + 18) & 0xffff)
      var off = base + 20
      if (hasTime(fmt)) { w.write(12, bb.getDouble(off)); off += 8 } else w.write(12, 0.0)
      if (hasColor(fmt)) {
        w.write(13, bb.getShort(off) & 0xffff)
        w.write(14, bb.getShort(off + 2) & 0xffff)
        w.write(15, bb.getShort(off + 4) & 0xffff)
      } else { w.write(13, 0); w.write(14, 0); w.write(15, 0) }
      w.write(16, 0)
      w.write(17, 0.toShort)
    } else {
      val returnInfo = bb.get(base + 14) & 0xff
      val flags = bb.get(base + 15) & 0xff
      w.write(6, (returnInfo & 0xf).toShort)
      w.write(7, ((returnInfo >> 4) & 0xf).toShort)
      w.write(8, (bb.get(base + 16) & 0xff).toShort)
      w.write(9, (bb.getShort(base + 18) * 0.006).toFloat)
      w.write(10, (bb.get(base + 17) & 0xff).toShort)
      w.write(11, bb.getShort(base + 20) & 0xffff)
      w.write(12, bb.getDouble(base + 22))
      var off = base + 30
      if (hasColor(fmt)) {
        w.write(13, bb.getShort(off) & 0xffff)
        w.write(14, bb.getShort(off + 2) & 0xffff)
        w.write(15, bb.getShort(off + 4) & 0xffff)
        off += 6
      } else { w.write(13, 0); w.write(14, 0); w.write(15, 0) }
      w.write(16, if (hasInfrared(fmt)) bb.getShort(off) & 0xffff else 0)
      w.write(17, ((flags >> 4) & 0x3).toShort)
    }
    w.getRow.copy()
  }

  /** Every record of a whole-file buffer as InternalRows (laszip
    * decompressed) — the per-file unit of the zero-boxing distributed
    * ingest. Same clamping as [[decodeAll]]. */
  def decodeAllUnsafe(bytes: Array[Byte], bb: ByteBuffer, h: LasHeader,
                      docId: String): Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    requireSingleBuffer(h)
    val (pb, off0) = pointBytes(bytes, bb, h)
    val present = math.max(0L, (pb.capacity() - off0) / h.recordLen)
    val id = org.apache.spark.unsafe.types.UTF8String.fromString(docId)
    val w = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(schema.length)
    (0L until math.min(h.pointCount, present)).iterator.map { i =>
      decodeRecordUnsafe(pb, (off0 + i * h.recordLen).toInt, h, id, i.toInt, w)
    }
  }

  /** DISTRIBUTED LAS ingest: one executor task per file via Spark's
    * binaryFile source — the natural parallel unit for LAS (each file is
    * self-describing; the reference reads files serially, one Stage per
    * file). `pathGlob` may match many files; doc_id = file name. The
    * per-record decode is the same [[decodeRecord]] the driver path and
    * the byte-fixture goldens pin. Files too large for one task's buffer
    * go through [[asSplitDataFrame]] instead (fail-fast guard here). */
  def asDistributedDataFrame(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.Row
    // A glob in the PATH makes FileStreamSink.hasMetadata probe the glob
    // as a literal directory and log a FileNotFoundException stack on
    // every load; a pathGlobFilter over the parent directory lists the
    // same files with clean logs.
    val slash = pathGlob.lastIndexOf('/')
    val (dir, leaf) =
      if (slash >= 0) (pathGlob.substring(0, slash), pathGlob.substring(slash + 1))
      else (".", pathGlob)
    val reader = spark.read.format("binaryFile")
    val bin = (if (leaf.exists(c => c == '*' || c == '?' || c == '['))
        reader.option("pathGlobFilter", leaf).load(dir)
      else reader.load(pathGlob))
      .select("path", "content")
    // zero-boxing lane: decode straight to UnsafeRows (no external Row,
    // no RowEncoder projection) — the boxed path's allocation rate was
    // the measured multi-core decode bottleneck
    val rdd = bin.rdd.flatMap { r =>
      val path = r.getString(0)
      val docId = path.substring(path.lastIndexOf('/') + 1)
      val bytes = r.getAs[Array[Byte]](1)
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      decodeAllUnsafe(bytes, bb, readHeader(bb), docId)
    }
    org.apache.spark.sql.graftbridge.ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
  }

  /** Every record of a whole-file LAS/LAZ buffer as Rows (decompressing
    * laszip streams first) — the per-file unit the distributed and
    * streaming ingests share. A header whose count overruns the actual
    * file (the reference's 1.2-no-points.las fixture declares 1065
    * points over zero bytes) clamps to the records physically present,
    * the reference reader's read-until-EOF behavior. */
  def decodeAll(bytes: Array[Byte], bb: ByteBuffer, h: LasHeader,
                docId: String): Iterator[Row] = {
    requireSingleBuffer(h)
    val (pb, off0) = pointBytes(bytes, bb, h)
    val present = math.max(0L, (pb.capacity() - off0) / h.recordLen)
    (0L until math.min(h.pointCount, present)).iterator.map { i =>
      decodeRecord(pb, (off0 + i * h.recordLen).toInt, h, docId, i.toInt)
    }
  }

  /** True iff the file's point-format byte carries the laszip
    * compression bits (header peek only). */
  def isLaszip(path: String): Boolean = {
    val in = Files.newInputStream(Paths.get(path))
    val head = try in.readNBytes(105) finally in.close()
    head.length > 104 && (head(104) & 0xC0) != 0
  }

  /** CHUNK-parallel LASzip ingest: ONE large .laz fanned across
    * executors at LAZ chunk boundaries. Chunks are self-contained by
    * design (raw seed point + fresh entropy models), and the chunk
    * table gives their exact byte offsets, so each task reads only its
    * chunk's byte range through the Hadoop FileSystem and decodes it
    * independently — the compressed counterpart of
    * [[asSplitDataFrame]]: a 500 GB .laz (50k-point chunks) becomes
    * tens of thousands of parallel units instead of one pinned
    * executor. span_idx stays the absolute record index, so chunk
    * parallelism never changes the decoded frame. */
  /** One spatially-chunked-archive sidecar entry
    * ([[LasWriter.writeLazTiled]]): the chunk's point count and padded
    * bbox. */
  final case class ChunkBox(count: Int, minx: Double, miny: Double,
                            maxx: Double, maxy: Double)

  def chunkBoxesOf(json: String): Seq[ChunkBox] = {
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    org.json4s.jackson.JsonMethods.parse(json).extract[List[ChunkBox]]
  }

  def asChunkSplitDataFrame(spark: SparkSession, path: String,
                            docId: String = "las",
                            columns: Seq[String] = Nil,
                            bounds: Seq[Double] = Nil): DataFrame = {
    // SELECTIVE DECOMPRESSION: on layered (compressor 3) streams a
    // non-empty `columns` prunes whole entropy layers inside the codec —
    // an x/y/z query decodes 2 of 9+ layers and never touches gps/rgb/
    // extra bytes (LazLayered.LayerMask). Compressor 1/2 interleave all
    // fields, so there the projection happens after decode as usual.
    val mask =
      if (columns.isEmpty) laz.LazLayered.LayerMask.All
      else laz.LazLayered.LayerMask.forColumns(columns)
    val absPath = Paths.get(path).toAbsolutePath.toString
    // driver reads ONLY header + VLR block + chunk table
    val headBlock = {
      val in = Files.newInputStream(Paths.get(absPath))
      try {
        val head = in.readNBytes(375)
        val dataOffset = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN)
          .getInt(96) & 0xffffffffL
        head ++ in.readNBytes(math.max(0L, dataOffset + 8 - head.length).toInt)
      } finally in.close()
    }
    val bb = ByteBuffer.wrap(headBlock).order(ByteOrder.LITTLE_ENDIAN)
    val h = readHeader(bb)
    // span_idx is int32 in the frame schema; past 2^31 records the
    // absolute-index identity (dedup/split-equality) would silently wrap
    require(h.pointCount <= Int.MaxValue,
      s"$path holds ${h.pointCount} records; span_idx is int32 — shard the file (2^31-1 records max per file)")
    val vlr = lazVlrOf(bb).getOrElse(
      throw new IllegalArgumentException(s"$path is not a LASzip stream"))
    val fileLen = Files.size(Paths.get(absPath))
    val variable = vlr.compressor >= 2 && vlr.chunkSize == laz.LazDecoder.VarChunkSentinel
    val chunk =
      if (vlr.compressor >= 2 && !variable && vlr.chunkSize > 0) vlr.chunkSize.toInt
      else h.pointCount.toInt
    val nChunksFixed = math.max(1, ((h.pointCount + chunk - 1) / chunk).toInt)
    val tableOff = if (vlr.compressor >= 2) bb.getLong(h.dataOffset.toInt) else fileLen
    def tableBytes(): Array[Byte] = {
      // read ONLY the table region — never the chunk data
      require(tableOff > 0 && tableOff + 8 <= fileLen,
        s"laszip chunk table offset $tableOff outside $path")
      val in = Files.newInputStream(Paths.get(absPath))
      try { in.skipNBytes(tableOff); in.readNBytes((fileLen - tableOff).toInt) }
      finally in.close()
    }
    val (starts: Seq[Long], counts: Seq[Int]) =
      if (variable) {
        // variable-size chunking: boundaries live in the (count, bytes)
        // pairs of the chunk table
        val ct = laz.LazDecoder.chunkTableFromBytes(tableBytes(), variable = true, 0)
        require(ct.counts.map(_.toLong).sum == h.pointCount,
          s"variable chunk counts sum != point count in $path")
        if (ct.sizes.isEmpty) (Seq(h.dataOffset + 8), Seq(0))
        else (ct.sizes.init.map(_.toLong).scanLeft(h.dataOffset + 8)(_ + _).toSeq,
          ct.counts.toSeq)
      } else if (vlr.compressor >= 2 && nChunksFixed > 1) {
        (laz.LazDecoder.chunkSizesFromTable(tableBytes(), nChunksFixed - 1)
          .map(_.toLong).scanLeft(h.dataOffset + 8)(_ + _),
          (0 until nChunksFixed)
            .map(i => math.min(chunk.toLong, h.pointCount - i.toLong * chunk).toInt))
      } else if (vlr.compressor >= 2) (Seq(h.dataOffset + 8), Seq(h.pointCount.toInt))
      else (Seq(h.dataOffset), Seq(h.pointCount.toInt))
    val chunksEnd = if (tableOff > 0 && tableOff <= fileLen) tableOff else fileLen
    val bases = counts.map(_.toLong).scanLeft(0L)(_ + _)
    val allDescs = starts.zipWithIndex.map { case (s, i) =>
      // +8 slack: the arithmetic decoder primes lookahead bytes past a
      // chunk's own payload
      val end = (if (i + 1 < starts.size) starts(i + 1) else chunksEnd) + 8
      (i, s, math.min(end, fileLen), counts(i), bases(i))
    }
    // CHUNK-LEVEL SPATIAL PRUNING: a `bounds` query box against a
    // spatially-chunked archive ([[LasWriter.writeLazTiled]] sidecar)
    // drops whole chunks before any byte is read or decompressed.
    // Pruning is an optimization, never a filter: kept chunks may hold
    // out-of-box points (callers crop exactly downstream), and a
    // missing or stale sidecar falls back to decoding every chunk.
    val descs =
      if (bounds.size == 4 && Files.exists(Paths.get(absPath + ".chunks.json"))) {
        val boxes = chunkBoxesOf(Files.readString(Paths.get(absPath + ".chunks.json")))
        if (boxes.size == allDescs.size &&
            boxes.map(_.count.toLong).sum == h.pointCount) {
          val Seq(qminx, qminy, qmaxx, qmaxy) = bounds
          allDescs.zip(boxes).collect {
            case (d, b) if b.maxx >= qminx && b.minx <= qmaxx &&
              b.maxy >= qminy && b.miny <= qmaxy => d
          }
        } else allDescs // stale sidecar: correct, just unpruned
      } else allDescs
    val rdd = spark.sparkContext.parallelize(descs, math.max(1, descs.size))
      .flatMap { case (ci, start, end, count, base) =>
        val hp = new org.apache.hadoop.fs.Path(absPath)
        val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(hp)
        val buf = new Array[Byte]((end - start).toInt)
        try in.readFully(start.toLong, buf, 0, buf.length)
        finally in.close()
        val raw = laz.LazDecoder.decompressChunk(buf, 0, count, h.recordLen, vlr, mask)
        val rb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        val id = org.apache.spark.unsafe.types.UTF8String.fromString(docId)
        val w = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(schema.length)
        (0 until count).iterator.map { i =>
          decodeRecordUnsafe(rb, i * h.recordLen, h, id, (base + i).toInt, w)
        }
      }
    val decoded =
      org.apache.spark.sql.graftbridge.ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
    if (columns.isEmpty) decoded
    else {
      val keep = (Seq("doc_id", "span_idx", "x", "y") ++ columns).distinct
        .filter(schema.fieldNames.contains)
      decoded.select(keep.map(org.apache.spark.sql.functions.col): _*)
    }
  }

  /** Offset-SPLIT LAS ingest: ONE large file fanned across `numSplits`
    * executor tasks at record boundaries (records are fixed-length, so a
    * split is a pure [startRecord, endRecord) range — the same move
    * Parquet/CSV splittable sources make). The driver reads only the
    * header; each task opens the file through the Hadoop FileSystem
    * (file://, hdfs://, s3a:// all resolve), seeks to its range, and
    * decodes with the same [[decodeRecord]] the goldens pin. span_idx
    * stays the ABSOLUTE record index, so split count never changes the
    * decoded frame. A single 500 GB LAS file becomes numSplits parallel
    * scans instead of pinning one executor. */
  def asSplitDataFrame(spark: SparkSession, path: String, numSplits: Int,
                       docId: String = "las"): DataFrame = {
    require(numSplits >= 1, s"numSplits must be >= 1, got $numSplits")
    val headBytes = {
      val in = Files.newInputStream(Paths.get(path))
      try in.readNBytes(375) finally in.close()
    }
    val h = readHeader(ByteBuffer.wrap(headBytes).order(ByteOrder.LITTLE_ENDIAN))
    require(h.pointFormat <= 10, s"unsupported point format ${h.pointFormat}")
    require(h.pointCount <= Int.MaxValue,
      s"$path holds ${h.pointCount} records; span_idx is int32 — shard the file (2^31-1 records max per file)")
    // laszip bits in the raw format byte: compressed records are not
    // fixed-length, so offset splitting cannot apply — decode via the
    // whole-file paths (which decompress), splitting at chunk boundaries
    // is the future refinement
    require((headBytes(104) & 0xC0) == 0,
      "offset-split ingest needs uncompressed LAS; use readers.las without splits for .laz")
    val per = (h.pointCount + numSplits - 1) / numSplits
    require(per * h.recordLen <= Int.MaxValue,
      s"split of $per records exceeds one task's buffer; raise numSplits")
    val ranges = (0 until numSplits)
      .map(i => (i * per, math.min((i + 1) * per, h.pointCount)))
      .filter { case (s, e) => e > s }
    val absPath = Paths.get(path).toAbsolutePath.toString
    val rdd = spark.sparkContext.parallelize(ranges, ranges.size)
      .flatMap { case (startRec, endRec) =>
        val hp = new org.apache.hadoop.fs.Path(absPath)
        val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(hp)
        val len = ((endRec - startRec) * h.recordLen).toInt
        val buf = new Array[Byte](len)
        try in.readFully(h.dataOffset + startRec * h.recordLen, buf, 0, len)
        finally in.close()
        val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
        val id = org.apache.spark.unsafe.types.UTF8String.fromString(docId)
        val w = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(schema.length)
        (startRec until endRec).iterator.map { i =>
          decodeRecordUnsafe(bb, ((i - startRec) * h.recordLen).toInt, h, id, i.toInt, w)
        }
      }
    org.apache.spark.sql.graftbridge.ColumnBridge.internalCreateDataFrame(spark, rdd, schema)
  }
}
