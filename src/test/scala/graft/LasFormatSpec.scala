package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.{LasDecode, LasWriter}

/** LAS 1.4 decode goldens + the write-then-read byte round-trip.
  *
  * The 1.4 fixtures are hand-crafted here byte-by-byte from the public
  * ASPRS LAS 1.4 specification (header field offsets, V14 record layout)
  * — an INDEPENDENT anchor for the decoder: the expected values below
  * were chosen first and the bytes written from the spec, not produced
  * by the code under test. Layout cross-checked against the reference
  * decoder (io/las/LasReader.cpp:722-788, io/las/LasHeader.cpp:200-255).
  */
class LasFormatSpec extends AnyFunSuite {
  import TestSpark._

  private def fv[T](r: org.apache.spark.sql.Row, name: String): T =
    r.get(LasDecode.schema.fieldIndex(name)).asInstanceOf[T]

  // ---- hand-crafted LAS 1.4 fixture -----------------------------------

  /** Build a minimal 1.4 header (375 bytes) + the given records. */
  private def v14File(fmt: Int, recLen: Int, records: Seq[Array[Byte]],
                      sx: Double = 0.01, ox: Double = 100.0): Array[Byte] = {
    val HeaderSize = 375
    val bb = ByteBuffer.allocate(HeaderSize + records.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put("LASF".getBytes("US-ASCII"))
    bb.position(24); bb.put(1.toByte); bb.put(4.toByte)     // version 1.4
    bb.position(94); bb.putShort(HeaderSize.toShort)        // header size
    bb.putInt(HeaderSize)                                   // 96: data offset
    bb.putInt(0)                                            // 100: #VLRs
    bb.put(fmt.toByte)                                      // 104: format
    bb.putShort(recLen.toShort)                             // 105: record len
    bb.putInt(0)                                            // 107: LEGACY count = 0 (1.4 style)
    bb.position(131)
    bb.putDouble(sx); bb.putDouble(sx); bb.putDouble(sx)    // scales
    bb.putDouble(ox); bb.putDouble(ox); bb.putDouble(ox)    // offsets
    bb.position(247)
    bb.putLong(records.size.toLong)                         // 247: u64 count
    bb.position(HeaderSize)
    records.foreach(bb.put)
    bb.array()
  }

  /** One format-8 record with the documented layout:
    * xyz i32 | intensity u16 | returns u8 | flags u8 | class u8 | user u8
    * | scan angle i16 (*0.006 deg) | psid u16 | gps f64 | rgb 3xu16
    * | nir u16  (38 bytes). */
  private def fmt8Record(): Array[Byte] = {
    val r = ByteBuffer.allocate(38).order(ByteOrder.LITTLE_ENDIAN)
    r.putInt(150000); r.putInt(-50000); r.putInt(123456)    // xi, yi, zi
    r.putShort(3000.toShort)                                // intensity
    r.put(((2 & 0xf) | ((5 & 0xf) << 4)).toByte)            // return 2 of 5
    r.put((0x1 | (2 << 4) | (1 << 6)).toByte)               // classFlags=1, channel=2, scanDir=1
    r.put(17.toByte)                                        // classification
    r.put(42.toByte)                                        // user data
    r.putShort(5000.toShort)                                // scan angle = 30.0 deg
    r.putShort(777.toShort)                                 // point source id
    r.putDouble(123456.789)                                 // gps time
    r.putShort(1000.toShort); r.putShort(2000.toShort); r.putShort(3000.toShort)
    r.putShort(4000.toShort)                                // NIR
    r.array()
  }

  test("LAS 1.4 header: u64 point count at byte 247, legacy count zero") {
    val bytes = v14File(8, 38, Seq(fmt8Record(), fmt8Record()))
    val h = LasDecode.readHeader(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))
    assert(h.versionMajor === 1 && h.versionMinor === 4)
    assert(h.pointFormat === 8 && h.recordLen === 38)
    assert(h.pointCount === 2L && h.dataOffset === 375L)
    assert(h.sx === 0.01 && h.ox === 100.0)
  }

  test("format 8 record decodes every V14 field (incl. NIR, scanner channel, i16 scan angle)") {
    val bytes = v14File(8, 38, Seq(fmt8Record()))
    val (h, rows) = {
      val p = java.nio.file.Files.createTempFile("graft14", ".las")
      java.nio.file.Files.write(p, bytes)
      LasDecode.readPoints(p.toString)
    }
    assert(h.pointFormat === 8)
    val r = rows.head
    assert(fv[Double](r, "x") === 150000 * 0.01 + 100.0)   // 1600.0
    assert(fv[Double](r, "y") === -50000 * 0.01 + 100.0)   // -400.0
    assert(fv[Double](r, "z") === 123456 * 0.01 + 100.0)
    assert(fv[Int](r, "intensity") === 3000)
    assert(fv[Short](r, "return_number") === 2)
    assert(fv[Short](r, "number_of_returns") === 5)
    assert(fv[Short](r, "classification") === 17)
    assert(fv[Float](r, "scan_angle_rank") === 30.0f)      // 5000 * 0.006
    assert(fv[Short](r, "user_data") === 42)
    assert(fv[Int](r, "point_source_id") === 777)
    assert(fv[Double](r, "gps_time") === 123456.789)
    assert(fv[Int](r, "red") === 1000 && fv[Int](r, "green") === 2000)
    assert(fv[Int](r, "blue") === 3000)
    assert(fv[Int](r, "nir") === 4000)
    assert(fv[Short](r, "scanner_channel") === 2)
  }

  test("format 6 record (no color, no NIR) and laszip high-bit masking") {
    val r6 = ByteBuffer.allocate(30).order(ByteOrder.LITTLE_ENDIAN)
    r6.putInt(0); r6.putInt(0); r6.putInt(0)
    r6.putShort(7.toShort)
    r6.put(((1 & 0xf) | ((1 & 0xf) << 4)).toByte)
    r6.put(0.toByte); r6.put(2.toByte); r6.put(0.toByte)
    r6.putShort((-5000).toShort)                             // -30.0 deg
    r6.putShort(1.toShort); r6.putDouble(9.5)
    val bytes = v14File(6, 30, Seq(r6.array()))
    // set the laszip compression bit on the format byte — must be masked
    bytes(104) = (bytes(104) | 0x80).toByte
    val p = java.nio.file.Files.createTempFile("graft14f6", ".las")
    java.nio.file.Files.write(p, bytes)
    val (h, rows) = LasDecode.readPoints(p.toString)
    assert(h.pointFormat === 6)
    val r = rows.head
    assert(fv[Double](r, "x") === 100.0)                   // 0 * s + 100
    assert(fv[Int](r, "intensity") === 7)
    assert(fv[Short](r, "classification") === 2)
    assert(fv[Float](r, "scan_angle_rank") === -30.0f)
    assert(fv[Double](r, "gps_time") === 9.5)
    assert(fv[Int](r, "red") === 0 && fv[Int](r, "nir") === 0)
  }

  test("format 4 (V10 + wave packet) decodes base fields and gps time") {
    // fmt 4 = fmt 1 (28 bytes) + 29-byte wave packet descriptor = 57
    val r4 = ByteBuffer.allocate(57).order(ByteOrder.LITTLE_ENDIAN)
    r4.putInt(100); r4.putInt(200); r4.putInt(300)
    r4.putShort(11.toShort)
    r4.put(((3 & 0x7) | ((4 & 0x7) << 3)).toByte)            // return 3 of 4 (V10: 3 bits each)
    r4.put(9.toByte)                                         // classification
    r4.put((-12).toByte)                                     // i8 scan angle
    r4.put(5.toByte)
    r4.putShort(99.toShort)
    r4.putDouble(42.25)
    // wave packet bytes left zero — skipped by the decoder
    val HeaderSize = 227
    val bb = ByteBuffer.allocate(HeaderSize + 57).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("LASF".getBytes("US-ASCII"))
    bb.position(24); bb.put(1.toByte); bb.put(3.toByte)      // LAS 1.3
    bb.position(94); bb.putShort(235.toShort)
    bb.putInt(HeaderSize); bb.putInt(0)
    bb.put(4.toByte); bb.putShort(57.toShort); bb.putInt(1)  // fmt 4, 1 point
    bb.position(131)
    bb.putDouble(0.5); bb.putDouble(0.5); bb.putDouble(0.5)
    bb.putDouble(0.0); bb.putDouble(0.0); bb.putDouble(0.0)
    bb.position(HeaderSize); bb.put(r4.array())
    val p = java.nio.file.Files.createTempFile("graft13f4", ".las")
    java.nio.file.Files.write(p, bb.array())
    val (h, rows) = LasDecode.readPoints(p.toString)
    assert(h.versionMinor === 3 && h.pointFormat === 4)
    val r = rows.head
    assert(fv[Double](r, "x") === 50.0 && fv[Double](r, "y") === 100.0)
    assert(fv[Short](r, "return_number") === 3)
    assert(fv[Short](r, "number_of_returns") === 4)
    assert(fv[Short](r, "classification") === 9)
    assert(fv[Float](r, "scan_angle_rank") === -12.0f)
    assert(fv[Double](r, "gps_time") === 42.25)
  }

  // ---- write-then-read round trip (reference diff_files discipline,
  // test/unit/Support.hpp:82-99) ---------------------------------------

  test("P1065 write-then-decode round-trips rows and header fields") {
    val (h0, rows0) = LasDecode.readPoints(P1065)
    val df = LasDecode.asDataFrame(spark, P1065).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftrt", ".las").toString
    val hw = LasWriter.write(out, df, pointFormat = h0.pointFormat,
      LasWriter.XForms(h0.sx, h0.sy, h0.sz, h0.ox, h0.oy, h0.oz))
    // header-field equality with the original (bounds come from data;
    // the reference's writer finalizes them the same way)
    val (h1, rows1) = LasDecode.readPoints(out)
    assert(h1.pointFormat === h0.pointFormat && h1.recordLen === h0.recordLen)
    assert(h1.pointCount === h0.pointCount)
    assert(h1.sx === h0.sx && h1.sy === h0.sy && h1.sz === h0.sz)
    assert(h1.ox === h0.ox && h1.oy === h0.oy && h1.oz === h0.oz)
    assert(h1.minx === h0.minx && h1.maxx === h0.maxx)
    assert(h1.miny === h0.miny && h1.maxy === h0.maxy)
    assert(h1.minz === h0.minz && h1.maxz === h0.maxz)
    // row-for-row equality (quantize with the original xform is exact)
    assert(rows1.size === rows0.size)
    rows0.zip(rows1).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"row $i differs")
    }
  }

  test("LAS 1.4 format-8 write-then-decode round-trips (u64 count, NIR, channel, i16 angle)") {
    import org.apache.spark.sql.functions._
    val (h0, _) = LasDecode.readPoints(P1065)
    // upgrade the P1065 cloud to a V14 record: give every point a NIR
    // value and a scanner channel, then emit as LAS 1.4 format 8
    val df = LasDecode.asDataFrame(spark, P1065)
      .withColumn("nir", (col("intensity") + 7).cast("int"))
      .withColumn("scanner_channel", lit(2).cast("short"))
      .orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftrt14", ".las").toString
    LasWriter.write(out, df, pointFormat = 8,
      LasWriter.XForms(h0.sx, h0.sy, h0.sz, h0.ox, h0.oy, h0.oz))
    val (h1, rows1) = LasDecode.readPoints(out)
    assert(h1.versionMinor === 4 && h1.pointFormat === 8 && h1.recordLen === 38)
    assert(h1.pointCount === 1065L)
    val want = df.collect()
    assert(rows1.size === want.length)
    val ai = LasDecode.schema.fieldIndex("scan_angle_rank")
    want.zip(rows1).zipWithIndex.foreach { case ((a, b), i) =>
      LasDecode.schema.fieldNames.indices.foreach { f =>
        if (f != ai)
          assert(a.get(f) === b.get(f), s"row $i field ${LasDecode.schema.fieldNames(f)}")
      }
      // the V14 angle grid is 0.006-degree steps — whole degrees are NOT
      // on it (only multiples of 3 are), so the write is lossy by at
      // most half a step, exactly like the reference's i16 conversion
      assert(math.abs(a.getFloat(ai) - b.getFloat(ai)) <= 0.003f + 1e-6f,
        s"row $i scan angle ${a.getFloat(ai)} -> ${b.getFloat(ai)}")
    }
  }

  test("distributed LAS ingest (binaryFile, task per file) equals the driver decode") {
    val dist = LasDecode.asDistributedDataFrame(spark, P1065)
    val drv = LasDecode.asDataFrame(spark, P1065)
      .drop("doc_id") // driver path uses the "las" default id, dist uses the file name
    val d2 = dist.drop("doc_id")
    assert(dist.count() === 1065)
    assert(d2.exceptAll(drv).isEmpty && drv.exceptAll(d2).isEmpty)
    assert(dist.select("doc_id").distinct().head().getString(0) === "1.2-with-color.las")
  }

  test("sharded LAS write: P1065 as 4+ executor-written shards re-decodes row-for-row") {
    import org.apache.spark.sql.functions._
    val (h0, _) = LasDecode.readPoints(P1065)
    val df = LasDecode.asDataFrame(spark, P1065)
      .withColumn("shard", pmod(col("span_idx"), lit(4)))
    val dir = java.nio.file.Files.createTempDirectory("graftshard").toString
    val files = LasWriter.writeSharded(dir, df, pointFormat = h0.pointFormat,
      LasWriter.XForms(h0.sx, h0.sy, h0.sz, h0.ox, h0.oy, h0.oz), "shard")
    assert(files.size === 4, s"expected 4 shards, got $files")
    assert(files === Seq("shard_0.las", "shard_1.las", "shard_2.las", "shard_3.las"))
    // each shard's header is its own finalized summary
    val perShard = files.map { f =>
      val (h, rows) = LasDecode.readPoints(s"$dir/$f")
      assert(h.pointCount === rows.size)
      assert(rows.forall(r => r.getDouble(2) >= h.minx && r.getDouble(2) <= h.maxx))
      rows
    }
    assert(perShard.map(_.size).sum === 1065)
    // distributed re-decode of all shards == original cloud (payload
    // multiset; doc_id/span_idx are per-file identities by design)
    val redecoded = LasDecode.asDistributedDataFrame(spark, s"$dir/*.las")
      .drop("doc_id", "span_idx")
    val original = LasDecode.asDataFrame(spark, P1065).drop("doc_id", "span_idx")
    assert(redecoded.count() === 1065)
    assert(redecoded.exceptAll(original).isEmpty && original.exceptAll(redecoded).isEmpty)
  }

  test("two-phase sharded write over a file: URI re-decodes row-for-row (.las and .laz)") {
    import org.apache.spark.sql.functions._
    val (h0, _) = LasDecode.readPoints(P1065)
    val df = LasDecode.asDataFrame(spark, P1065)
      .withColumn("shard", pmod(col("span_idx"), lit(3)))
    val original = LasDecode.asDataFrame(spark, P1065).drop("doc_id", "span_idx")
    Seq(false, true).foreach { compress =>
      val plainDir = java.nio.file.Files.createTempDirectory(s"grafts2p$compress").toString
      // scheme'd destination -> Hadoop FS + task-local temp + rename
      val files = LasWriter.writeSharded(s"file:$plainDir", df,
        pointFormat = h0.pointFormat,
        LasWriter.XForms(h0.sx, h0.sy, h0.sz, h0.ox, h0.oy, h0.oz), "shard",
        compress = compress)
      val ext = if (compress) "laz" else "las"
      assert(files === Seq(s"shard_0.$ext", s"shard_1.$ext", s"shard_2.$ext"))
      // no .inprogress residue — every shard committed via rename
      val residue = new java.io.File(plainDir).list().filter(_.endsWith(".inprogress"))
      assert(residue.isEmpty, s"uncommitted shards left behind: ${residue.mkString(",")}")
      val redecoded = LasDecode.asDistributedDataFrame(spark, s"$plainDir/*.$ext")
        .drop("doc_id", "span_idx")
      assert(redecoded.count() === 1065)
      assert(redecoded.exceptAll(original).isEmpty && original.exceptAll(redecoded).isEmpty)
    }
  }

  test("EVLR-only WKT SRS (LAS 1.4) is parsed and feeds in_srs=auto") {
    import org.apache.spark.sql.functions._
    // build a 1.4 format-6 file whose ONLY SRS record is a WKT EVLR
    // after the point data (header bytes 235/243), the layout ASPRS 1.4
    // prescribes for formats 6+
    val df = LasDecode.asDataFrame(spark, P1065)
      .withColumn("x", col("x") / 1e6 - 0.2) // degree-range lon/lat
      .withColumn("y", col("y") / 1e6 + 45.0)
      .orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftevlr", ".las").toString
    LasWriter.write(out, df, pointFormat = 6,
      LasWriter.XForms(1e-7, 1e-7, 0.01, 0, 0, 0))
    val wkt = """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],AUTHORITY["EPSG","4326"]]"""
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(LasDecode.srsOf(out) === None, "no SRS expected before the EVLR")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      LasWriter.appendWktEvlr(bytes, wkt))
    // EVLR parse: record surfaces with the right id and payload
    val evlrs = LasDecode.readEvlrs(out)
    assert(evlrs.map(v => (v.userId, v.recordId)) === Seq(("LASF_Projection", 2112)))
    assert(LasDecode.srsOf(out) === Some("EPSG:4326"))
    // and the point data still decodes (EVLR sits after it, untouched)
    assert(LasDecode.readPoints(out)._2.size === 1065)
    // in_srs=auto through the pipeline: geographic -> web mercator
    val proj = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$out"},
         |  {"type": "filters.reprojection", "in_srs": "auto",
         |   "out_srs": "EPSG:3857"}
         |]}""".stripMargin).df
    val r = proj.agg(min("x"), max("x")).head()
    // lon ~ +0.435..0.44 deg -> ~48.4-49.0 km in web mercator
    assert(r.getDouble(0) > 40000 && r.getDouble(1) < 60000,
      s"mercator x out of range: ${r.getDouble(0)}..${r.getDouble(1)}")
  }

  test("offset-split ingest of one file equals the driver decode (2 and 3 splits)") {
    val drv = LasDecode.asDataFrame(spark, P1065)
    Seq(2, 3).foreach { n =>
      val split = LasDecode.asSplitDataFrame(spark, P1065, n)
      assert(split.rdd.getNumPartitions === n)
      assert(split.count() === 1065)
      // span_idx is the absolute record index, so frames are EQUAL, not
      // just payload-equivalent
      assert(split.exceptAll(drv).isEmpty && drv.exceptAll(split).isEmpty,
        s"split decode at n=$n differs from driver decode")
    }
  }

  test("VLR parse + GeoTIFF keys recover the SRS of the reference fixtures") {
    import java.nio.{ByteBuffer, ByteOrder}
    // epsg_4326.las: GeographicTypeGeoKey 2048 = 4326
    val b4326 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$RefData/las/epsg_4326.las"))
    val vlrs = LasDecode.readVlrs(ByteBuffer.wrap(b4326).order(ByteOrder.LITTLE_ENDIAN))
    assert(vlrs.size === 3)
    assert(vlrs.forall(_.userId === "LASF_Projection"))
    assert(vlrs.map(_.recordId) === Seq(34735, 34736, 34737))
    assert(LasDecode.epsgOf(vlrs) === Some(4326))
    assert(LasDecode.srsOf(s"$RefData/las/epsg_4326.las") === Some("EPSG:4326"))
    // utm15.las: ProjectedCSTypeGeoKey 3072 = 26915 (NAD83 UTM 15N)
    assert(LasDecode.srsOf(s"$RefData/las/utm15.las") === Some("utm:15"))
    // utm17.las (LAS 1.0): 3072 = 32617 (WGS84 UTM 17N)
    assert(LasDecode.srsOf(s"$RefData/las/utm17.las") === Some("utm:17"))
    // interesting.las: 3072 and 2048 are both 32767 (user-defined) -> None
    assert(LasDecode.srsOf(s"$RefData/las/interesting.las") === None)
    // P1065 carries no VLRs at all
    assert(LasDecode.srsOf(P1065) === None)
  }

  test("pipeline reprojection infers in_srs=auto from the LAS file's VLRs") {
    import graft.plans.Pipeline
    val utm17 = s"$RefData/las/utm17.las"
    val auto = Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$utm17"},
         |  {"type": "filters.reprojection", "in_srs": "auto",
         |   "out_srs": "EPSG:4326"}
         |]}""".stripMargin).df
    val explicit = graft.operators.Reproject.transform("utm:17", "EPSG:4326")(
      LasDecode.asDataFrame(spark, utm17))
    val a = auto.orderBy("span_idx").select("x", "y").collect()
    val e = explicit.orderBy("span_idx").select("x", "y").collect()
    assert(a.length === e.length && a.length > 0)
    a.zip(e).foreach { case (ra, re) =>
      assert(ra.getDouble(0) === re.getDouble(0) && ra.getDouble(1) === re.getDouble(1))
    }
    // degrees in a plausible UTM-17 longitude band
    assert(a.forall(r => r.getDouble(0) > -84 && r.getDouble(0) < -78))
    // auto with no inferable SRS fails loudly
    val ex = intercept[IllegalArgumentException] {
      Pipeline.run(spark,
        s"""{ "pipeline": [
           |  {"type": "readers.las", "path": "$P1065"},
           |  {"type": "filters.reprojection", "in_srs": "auto"}
           |]}""".stripMargin)
    }
    assert(ex.getMessage.contains("no SRS could be inferred"))
  }

  test("extra-bytes dims decode with the reference's golden relations (extrabytes.las)") {
    // the reference's own assertions (LasReaderTest.cpp:309-370
    // extraBytes): the fixture's extra dims mirror its standard dims —
    // Colors == RGB, Flags == return/number-of-returns, extra Intensity
    // == intensity, extra Time == gps_time truncated (NEAR 1.0)
    import java.nio.{ByteBuffer, ByteOrder}
    val p = s"$RefData/las/extrabytes.las"
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dims = LasDecode.extraDimsOf(LasDecode.readVlrs(bb),
      LasDecode.baseRecordLen(3))
    assert(dims.map(_.name) ===
      Seq("Colors0", "Colors1", "Colors2", "Flags0", "Flags1", "Intensity", "Time"))
    assert(dims.map(_.typeCode) === Seq(3, 3, 3, 2, 2, 5, 7))
    val df = LasDecode.asDataFrameWithExtras(spark, p)
    assert(df.count() === 1065)
    import org.apache.spark.sql.functions._
    def mismatches(c: org.apache.spark.sql.Column): Long = df.filter(c).count()
    assert(mismatches(col("Colors0") =!= col("red")) === 0)
    assert(mismatches(col("Colors1") =!= col("green")) === 0)
    assert(mismatches(col("Colors2") =!= col("blue")) === 0)
    assert(mismatches(col("Flags0") =!= col("return_number").cast("double")) === 0)
    assert(mismatches(col("Flags1") =!= col("number_of_returns").cast("double")) === 0)
    assert(mismatches(col("extra_Intensity") =!= col("intensity").cast("double")) === 0)
    assert(mismatches(abs(col("Time") - col("gps_time")) > 1.0) === 0)
  }

  test("version x format permutation sweep matches the reference's test_a_format goldens") {
    // LasReaderTest.cpp:218-227: every (version, format) permutation
    // holds ONE point at (470692.44, 4602888.90, 16.0); formats with
    // time carry 1205902800.0, formats with color carry (255, 12, 234)
    val cases = Seq(
      ("1.0_0.las", 0, 1, 0), ("1.0_1.las", 1, 1, 0),
      ("1.1_0.las", 0, 1, 1), ("1.1_1.las", 1, 1, 1),
      ("1.2_0.las", 0, 1, 2), ("1.2_1.las", 1, 1, 2),
      ("1.2_2.las", 2, 1, 2), ("1.2_3.las", 3, 1, 2))
    cases.foreach { case (file, fmt, vMaj, vMin) =>
      val (h, rows) = LasDecode.readPoints(s"$RefData/las/permutations/$file")
      assert(h.versionMajor === vMaj && h.versionMinor === vMin, file)
      assert(h.pointFormat === fmt, file)
      assert(rows.size === 1, file)
      val r = rows.head
      assert(math.abs(r.getDouble(2) - 470692.44) < 1e-6, s"$file x")
      assert(math.abs(r.getDouble(3) - 4602888.90) < 1e-6, s"$file y")
      assert(math.abs(r.getDouble(4) - 16.0) < 1e-6, s"$file z")
      val wantTime = if (LasDecode.hasTime(fmt)) 1205902800.0 else 0.0
      assert(r.getDouble(12) === wantTime, s"$file time")
      val (wr, wg, wb) = if (LasDecode.hasColor(fmt)) (255, 12, 234) else (0, 0, 0)
      assert(r.getInt(13) === wr && r.getInt(14) === wg && r.getInt(15) === wb,
        s"$file rgb")
    }
    // the no-points permutation HEADER claims 1065 points over zero data
    // bytes — decode clamps to the records physically present (the
    // reference's read-until-EOF behavior) instead of exploding
    val (he, re) = LasDecode.readPoints(s"$RefData/las/permutations/1.2-no-points.las")
    assert(he.pointCount === 1065 && re.isEmpty)
  }

  test("quantization overflow throws instead of wrapping") {
    intercept[IllegalArgumentException] {
      LasWriter.write(java.nio.file.Files.createTempFile("graftovf", ".las").toString,
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row("d", 0, 1e18, 0.0, 0.0, 0, 1.toShort, 1.toShort,
              0.toShort, 0.0f, 0.toShort, 0, 0.0, 0, 0, 0, 0, 0.toShort))),
          LasDecode.schema),
        pointFormat = 0, LasWriter.XForms(0.01, 0.01, 0.01, 0, 0, 0))
    }
  }
}
