package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.sources.{LasDecode, LasWriter}
import graft.sources.laz.{LazDecoder, LazLayered}
import java.nio.{ByteBuffer, ByteOrder}

/** WAVEPACKET13 (formats 4/5, chunked compressor 2) and WAVEPACKET14
  * (formats 9/10, layered compressor 3) codec coverage. No wave-packet
  * .laz fixture exists anywhere in the reference tree (its .laz era
  * predates routine waveform archives, and even its LAS readers skip
  * waveform payloads — io/las/LasReader.cpp), so as with compressor 3
  * the encoder is the fixture source: fixtures are built by BYTE
  * SURGERY on uncompressed files this engine wrote (append a crafted
  * 29-byte descriptor per record, patch format + record length), the
  * crafted descriptors force every offset-kind branch (unchanged /
  * contiguous / 32-bit diff / raw-64), and round-trips must be
  * bit-exact at the raw-record level. */
class LazWavepacketSpec extends AnyFunSuite {
  import TestSpark._

  private val xf = LasWriter.XForms(0.001, 0.001, 0.001, 0, 0, 0)

  /** Crafted descriptor stream: every offset-kind branch, huge u32
    * sizes, float parameter vectors, duplicated descriptors. */
  private def wpDescriptor(i: Int, prevOffset: Long, prevSize: Int): (Array[Byte], Long, Int) = {
    val offset: Long = (i % 5) match {
      case 0 => prevOffset + (prevSize & 0xFFFFFFFFL) // contiguous -> sym 1
      case 1 => prevOffset                            // unchanged  -> sym 0
      case 2 => prevOffset + 123456L * (i % 17 + 1)   // 32-bit diff -> sym 2
      case 3 => prevOffset + 0x100000000L + i         // > 32 bits  -> sym 3 (raw 64)
      case _ => math.max(0L, prevOffset - 7777L)      // negative 32-bit diff
    }
    val size = if (i % 11 == 0) 0xF0000000 + i else 64 + (i % 900) * 3
    val b = new Array[Byte](29)
    val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    bb.put((i % 251).toByte)
    bb.putLong(offset)
    bb.putInt(size)
    bb.putInt(java.lang.Float.floatToIntBits(i * 0.5f))
    bb.putInt(java.lang.Float.floatToIntBits(0.001f * i))
    bb.putInt(java.lang.Float.floatToIntBits(-0.002f * i))
    bb.putInt(java.lang.Float.floatToIntBits(if (i % 3 == 0) 1.0f else -0.25f))
    (b, offset, size)
  }

  /** Byte surgery: append a crafted wave-packet descriptor to every
    * record of an uncompressed LAS file and patch format/record length
    * (fmt 1->4, 3->5, 6->9, 8->10). */
  private def addWavepackets(src: Array[Byte], newFmt: Int): Array[Byte] = {
    val bb = ByteBuffer.wrap(src).order(ByteOrder.LITTLE_ENDIAN)
    val h = LasDecode.readHeader(bb)
    require(LasDecode.baseRecordLen(newFmt) == h.recordLen + 29, "format pairing")
    val n = h.pointCount.toInt
    val newLen = h.recordLen + 29
    val out = new Array[Byte](h.dataOffset.toInt + n * newLen)
    System.arraycopy(src, 0, out, 0, h.dataOffset.toInt)
    out(104) = ((src(104) & 0xC0) | newFmt).toByte
    out(105) = newLen.toByte; out(106) = (newLen >> 8).toByte
    var prevOffset = 0L; var prevSize = 0
    (0 until n).foreach { i =>
      System.arraycopy(src, h.dataOffset.toInt + i * h.recordLen,
        out, h.dataOffset.toInt + i * newLen, h.recordLen)
      val (wp, o, s) = wpDescriptor(i, prevOffset, prevSize)
      prevOffset = o; prevSize = s
      System.arraycopy(wp, 0, out, h.dataOffset.toInt + i * newLen + h.recordLen, 29)
    }
    out
  }

  /** Raw record block of an uncompressed buffer. */
  private def rawRecords(las: Array[Byte]): (LasDecode.LasHeader, Array[Byte]) = {
    val h = LasDecode.readHeader(ByteBuffer.wrap(las).order(ByteOrder.LITTLE_ENDIAN))
    (h, java.util.Arrays.copyOfRange(las, h.dataOffset.toInt,
      h.dataOffset.toInt + h.pointCount.toInt * h.recordLen))
  }

  /** lasToLaz the fixture, decompress it back, require bit-exact raw
    * records (wave-packet bytes included), and return the .laz bytes. */
  private def roundTrip(las: Array[Byte], chunkSize: Int): Array[Byte] = {
    val laz = LasWriter.lasToLaz(las, chunkSize = chunkSize)
    assert(laz.length < las.length, "wave-packet stream did not compress")
    val (h, want) = rawRecords(las)
    val zb = ByteBuffer.wrap(laz).order(ByteOrder.LITTLE_ENDIAN)
    val zh = LasDecode.readHeader(zb)
    val vlr = LazDecoder.parseVlr(LasDecode.readVlrs(zb)
      .find(v => v.userId == "laszip encoded" && v.recordId == 22204).get.payload)
    val got = LazDecoder.decompress(laz, zh.dataOffset.toInt,
      zh.pointCount.toInt, zh.recordLen, vlr)
    assert(got.length === want.length)
    val diffAt = got.indices.find(i => got(i) != want(i))
    assert(diffAt.isEmpty,
      s"raw records diverge at byte ${diffAt.getOrElse(-1)} of record len ${zh.recordLen}")
    laz
  }

  /** Uncompressed base fixture via this engine's writer. */
  private def baseLas(fmt: Int, n: Int): Array[Byte] = {
    val rows = (0 until n).map { i =>
      Row("w", i, i * 0.25, (i % 37) * 1.0, 10.0 + (i % 5), i % 3000,
        (1 + i % 5).toShort, (1 + i % 5).toShort, (i % 32).toShort,
        ((i % 101 - 50) * 0.006).toFloat, (i % 256).toShort, i % 7,
        1000.0 + i * 0.0001, (i * 7) % 65536, (i * 13) % 65536,
        (i * 29) % 65536, (i * 31) % 65536, (i % 4).toShort)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LasDecode.schema).orderBy("span_idx")
    val p = java.nio.file.Files.createTempFile(s"graftwpbase$fmt", ".las").toString
    LasWriter.write(p, df, pointFormat = fmt, xf)
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
  }

  test("fmt 4 (gps + wavepacket) round-trip is bit-exact, multi-chunk") {
    roundTrip(addWavepackets(baseLas(1, 700), 4), chunkSize = 160)
  }

  test("fmt 5 (reference fixture base): wavepacket13 round-trip is bit-exact") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$RefData/las/interesting.las")) // fmt 3, 1065 pts
    roundTrip(addWavepackets(src, 5), chunkSize = 200)
  }

  test("fmt 9 (layered) wavepacket14 round-trip is bit-exact across chunks and channels") {
    roundTrip(addWavepackets(baseLas(6, 800), 9), chunkSize = 150)
  }

  test("fmt 10 (layered rgb + nir + wavepacket) round-trip is bit-exact") {
    roundTrip(addWavepackets(baseLas(8, 600), 10), chunkSize = 170)
  }

  test("fmt 10 .laz decodes chunk-parallel equal to the driver decode") {
    val las = addWavepackets(baseLas(8, 500), 10)
    val laz = roundTrip(las, chunkSize = 125)
    val p = java.nio.file.Files.createTempFile("graftwp10", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(p), laz)
    val par = LasDecode.asChunkSplitDataFrame(spark, p)
    assert(par.rdd.getNumPartitions === 4, "one task per chunk")
    val drv = spark.createDataFrame(
      spark.sparkContext.parallelize(LasDecode.readPoints(p)._2, 2), LasDecode.schema)
    assert(par.count() === 500)
    assert(par.exceptAll(drv).isEmpty && drv.exceptAll(par).isEmpty)
  }

  test("selective decompression skips the wavepacket layer (corrupted layer, xyz decode unaffected)") {
    val las = addWavepackets(baseLas(6, 400), 9)
    val laz = roundTrip(las, chunkSize = 100000) // one chunk
    val p = java.nio.file.Files.createTempFile("graftwp9", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(p), laz)
    val full = LasDecode.asChunkSplitDataFrame(spark, p)
      .select("span_idx", "x", "y", "z").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet

    // fmt 9 chunk = [seed 59B][10 u32 layer sizes: 9 POINT14 + 1 WP][blobs]
    val bb = ByteBuffer.wrap(laz).order(ByteOrder.LITTLE_ENDIAN)
    val h = LasDecode.readHeader(bb)
    val chunkStart = h.dataOffset.toInt + 8
    val sizesOff = chunkStart + 59
    val layerSizes = (0 until 10).map(i => bb.getInt(sizesOff + 4 * i))
    val wpOff = sizesOff + 40 + layerSizes.take(9).sum
    val wpLen = layerSizes(9)
    assert(wpLen > 0, "wavepacket layer unexpectedly empty")
    (0 until wpLen).foreach(i => laz(wpOff + i) = 0x55.toByte)
    val trashed = java.nio.file.Files.createTempFile("graftwp9x", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(trashed), laz)

    // pruned decode never touches the trashed layer
    val pruned = LasDecode.asChunkSplitDataFrame(spark, trashed, columns = Seq("z"))
      .select("span_idx", "x", "y", "z").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(pruned === full, "pruned decode changed after corrupting the unread wavepacket layer")
    // ... while a FULL raw decode consumes it and yields different bytes
    val vlr = LazDecoder.parseVlr(LasDecode.readVlrs(bb)
      .find(v => v.userId == "laszip encoded" && v.recordId == 22204).get.payload)
    val fullRaw = LazDecoder.decompress(laz, h.dataOffset.toInt,
      h.pointCount.toInt, h.recordLen, vlr)
    val (_, want) = rawRecords(las)
    assert(!java.util.Arrays.equals(fullRaw, want),
      "corrupting the wavepacket layer should change a full decode")
  }

  test("unknown laszip items still fail loudly") {
    val vlr = LazDecoder.LazVlr(3, 50000,
      Seq((LazDecoder.ItemPoint14, 30, 3), (99, 16, 3)))
    val ex = intercept[IllegalArgumentException](LazDecoder.requireSupported(vlr))
    assert(ex.getMessage.contains("unsupported"))
    // wave-packet item sets are supported now, both compressor families
    LazDecoder.requireSupported(LazDecoder.LazVlr(3, 50000,
      Seq((LazDecoder.ItemPoint14, 30, 3), (LazDecoder.ItemWavepacket14, 29, 3))))
    LazDecoder.requireSupported(LazDecoder.LazVlr(2, 50000,
      Seq((LazDecoder.ItemPoint10, 20, 2), (LazDecoder.ItemGpsTime11, 8, 2),
        (LazDecoder.ItemWavepacket13, 29, 1))))
  }
}
