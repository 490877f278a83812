package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.{LasDecode, LasWriter}
import org.apache.spark.sql.Row

/** LAS 1.4 LAYERED compressor 3 (formats 6-8), the compressed
  * extra-bytes BYTE item, and the gps-time multi-table branch golden.
  * No reference fixture exists for any of these (the reference's
  * vendored-laszip era predates compressor 3 and its .laz fixtures
  * carry no extra bytes), so the encoder is the fixture source:
  * round-trips must be EXACT, multi-chunk, across context switches. */
class LazLayeredSpec extends AnyFunSuite {
  import TestSpark._

  private val xf = LasWriter.XForms(0.001, 0.001, 0.001, 0, 0, 0)

  /** Synthetic v14 cloud: alternating scanner channels (context
    * switches), 4-bit returns, full-range fields, mixed gps behavior. */
  private def v14Rows(n: Int, seedId: Long): Seq[Row] = {
    val gen: Gen[Row] = for {
      x <- Gen.frequency((4, Gen.choose(-1000.0, 1000.0)), (1, Gen.oneOf(-1.0e6, 1.0e6)))
      y <- Gen.frequency((4, Gen.choose(-1000.0, 1000.0)), (1, Gen.oneOf(-1.0e6, 123.456)))
      z <- Gen.choose(-100.0, 4000.0)
      intensity <- Gen.frequency((3, Gen.choose(0, 300)), (1, Gen.oneOf(0, 65535)))
      ret <- Gen.choose(1, 15)
      num <- Gen.choose(1, 15)
      cls <- Gen.frequency((3, Gen.choose(0, 5)), (1, Gen.choose(0, 255)))
      angHundredths <- Gen.choose(-15000, 15000)
      usr <- Gen.choose(0, 255)
      psid <- Gen.frequency((3, Gen.choose(0, 10)), (1, Gen.choose(0, 65535)))
      gps <- Gen.frequency((3, Gen.choose(1000.0, 1000.5)), (1, Gen.oneOf(0.0, 1.7e300)))
      r <- Gen.choose(0, 65535); g <- Gen.choose(0, 65535); b <- Gen.choose(0, 65535)
      nir <- Gen.choose(0, 65535)
      chan <- Gen.frequency((5, Gen.const(0)), (2, Gen.choose(0, 3)))
    } yield Row("p", 0, x, y, z, intensity, ret.toShort, num.toShort, cls.toShort,
      // the v14 writer quantizes angle to 0.006-degree steps; feed it
      // exact multiples so the round-trip compare can be exact
      (angHundredths * 0.006).toFloat, usr.toShort, psid, gps, r, g, b, nir, chan.toShort)
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seedId)).get
      .zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq.updated(1, i)) }
  }

  private def roundTrip(fmt: Int, n: Int, seedId: Long, chunkSize: Int): Unit = {
    val rows = v14Rows(n, seedId)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile(s"graftlazl$fmt$seedId", ".laz").toString
    val h = LasWriter.writeLaz(out, df, pointFormat = fmt, xf, chunkSize = chunkSize)
    assert(h.versionMinor === 4 && h.pointFormat === fmt)
    val (h1, decoded) = LasDecode.readPoints(out)
    assert(h1.pointCount === n.toLong)
    val want = df.collect()
    decoded.zip(want).zipWithIndex.foreach { case ((d, w), i) =>
      Seq(2, 3, 4).foreach { f =>
        assert(math.abs(d.getDouble(f) - w.getDouble(f)) <= 0.0005 + 1e-9,
          s"fmt $fmt seed $seedId row $i coord $f")
      }
      assert(math.abs(d.getFloat(9) - w.getFloat(9)) <= 0.003f,
        s"fmt $fmt row $i scan angle")
      // everything else exact: intensity, returns, class, user, psid,
      // gps bits, rgb, nir, scanner channel
      (Seq(5, 6, 7, 8, 10, 11, 12) ++
        (if (fmt >= 7) Seq(13, 14, 15) else Nil) ++
        (if (fmt == 8) Seq(16) else Nil) ++ Seq(17)).foreach { f =>
        assert(d.get(f) === w.get(f), s"fmt $fmt seed $seedId row $i field $f")
      }
    }
  }

  test("layered fmt 6 multi-chunk round-trip is exact (context switches included)") {
    roundTrip(fmt = 6, n = 400, seedId = 1, chunkSize = 120)
  }

  test("layered fmt 7 (rgb) round-trip is exact") {
    roundTrip(fmt = 7, n = 300, seedId = 2, chunkSize = 90)
  }

  test("layered fmt 8 (rgb + nir) round-trip is exact, multiple seeds") {
    (3 to 5).foreach(s => roundTrip(fmt = 8, n = 250, seedId = s, chunkSize = 80))
  }

  test("layered .laz decodes chunk-parallel, equal to the driver decode") {
    val rows = v14Rows(500, 7)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftlazlcp", ".laz").toString
    LasWriter.writeLaz(out, df, pointFormat = 8, xf, chunkSize = 125)
    val par = LasDecode.asChunkSplitDataFrame(spark, out)
    assert(par.rdd.getNumPartitions === 4, "one task per layered chunk")
    val drv = spark.createDataFrame(
      spark.sparkContext.parallelize(LasDecode.readPoints(out)._2, 2), LasDecode.schema)
    assert(par.count() === 500)
    assert(par.exceptAll(drv).isEmpty && drv.exceptAll(par).isEmpty)
  }

  test("selective decompression: pruned layers are never read (gps layer corrupted, xyz decode unaffected)") {
    import org.apache.spark.sql.functions.col
    val rows = v14Rows(300, 11)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftlazsel", ".laz").toString
    LasWriter.writeLaz(out, df, pointFormat = 8, xf, chunkSize = 100000) // one chunk
    val full = LasDecode.asChunkSplitDataFrame(spark, out)
      .select("span_idx", "x", "y", "z", "intensity").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet

    // locate and trash the gps-time layer's bytes: chunk = [seed record
    // 38B][9+2 u32 layer sizes][layer blobs 0..8, rgb, nir]
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val h = LasDecode.readHeader(bb)
    val chunkStart = h.dataOffset.toInt + 8
    val sizesOff = chunkStart + 38
    val layerSizes = (0 until 11).map(i => bb.getInt(sizesOff + 4 * i))
    val gpsOff = sizesOff + 44 + layerSizes.take(8).sum
    val gpsLen = layerSizes(8)
    assert(gpsLen > 0, "gps layer unexpectedly empty")
    (0 until gpsLen).foreach(i => bytes(gpsOff + i) = 0xAA.toByte)
    val trashed = java.nio.file.Files.createTempFile("graftlazselx", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(trashed), bytes)

    // pruned decode (z + intensity): identical despite the trashed layer —
    // PROOF the pruned gps stream is never even decompressed
    val pruned = LasDecode.asChunkSplitDataFrame(spark, trashed,
      columns = Seq("z", "intensity"))
    assert(pruned.columns === Array("doc_id", "span_idx", "x", "y", "z", "intensity"))
    val got = pruned.select("span_idx", "x", "y", "z", "intensity").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet
    assert(got === full, "pruned decode changed after corrupting an unread layer")
    // whereas a FULL decode of the trashed file does consume the layer
    // and yields different gps times
    val gpsOrig = LasDecode.asChunkSplitDataFrame(spark, out)
      .select("span_idx", "gps_time").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    val gpsTrash = LasDecode.asChunkSplitDataFrame(spark, trashed)
      .select("span_idx", "gps_time").collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(gpsOrig !== gpsTrash, "corrupting the gps layer should change a full decode")
  }

  test("pipeline readers.las with columns prunes layers through the chunk-split path") {
    import org.apache.spark.sql.functions.col
    val rows = v14Rows(200, 13)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftlazselp", ".laz").toString
    LasWriter.writeLaz(out, df, pointFormat = 8, xf, chunkSize = 60)
    val pruned = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$out", "splits": 4,
         |   "columns": ["z"]},
         |  {"type": "filters.crop", "bounds": [-2000, -2000, 2000, 2000]}
         |]}""".stripMargin).df
    assert(pruned.columns === Array("doc_id", "span_idx", "x", "y", "z"))
    val fullCrop = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$out", "splits": 4},
         |  {"type": "filters.crop", "bounds": [-2000, -2000, 2000, 2000]}
         |]}""".stripMargin).df.select("doc_id", "span_idx", "x", "y", "z")
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(fullCrop).isEmpty && fullCrop.exceptAll(pruned).isEmpty)
  }

  // ---- variable-size chunking (chunk_size sentinel 0xFFFFFFFF) ---------

  test("variable-size chunking round-trips bit-for-bit and decodes chunk-parallel (compressor 2)") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$RefData/las/interesting.las")) // 1065 pts
    val counts = Seq(400, 65, 600)
    val laz = LasWriter.lasToLaz(src, chunkCounts = counts)
    val out = java.nio.file.Files.createTempFile("graftlazvar", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(out), laz)
    // sentinel is really in the VLR
    val zb = java.nio.ByteBuffer.wrap(laz).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val vlr = graft.sources.laz.LazDecoder.parseVlr(LasDecode.readVlrs(zb)
      .find(v => v.userId == "laszip encoded" && v.recordId == 22204).get.payload)
    assert(vlr.chunkSize === graft.sources.laz.LazDecoder.VarChunkSentinel)
    // driver decode: bit-for-bit vs the uncompressed original
    val (h0, rows0) = LasDecode.readPoints(s"$RefData/las/interesting.las")
    val (h1, rows1) = LasDecode.readPoints(out)
    assert(h1.pointCount === h0.pointCount)
    rows0.zip(rows1).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"point $i differs through variable chunking")
    }
    // chunk-parallel decode: one task per VARIABLE chunk, same rows
    val par = LasDecode.asChunkSplitDataFrame(spark, out)
    assert(par.rdd.getNumPartitions === counts.size, "one task per variable chunk")
    val drv = spark.createDataFrame(
      spark.sparkContext.parallelize(rows1, 2), LasDecode.schema)
    assert(par.count() === 1065)
    assert(par.exceptAll(drv).isEmpty && drv.exceptAll(par).isEmpty)
  }

  test("variable-size chunking round-trips for the layered compressor 3") {
    val rows = v14Rows(500, 17)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema).orderBy("span_idx")
    val las = java.nio.file.Files.createTempFile("graftlazvl", ".las").toString
    LasWriter.write(las, df, pointFormat = 8, xf)
    val src = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(las))
    val counts = Seq(123, 7, 250, 120)
    val laz = LasWriter.lasToLaz(src, chunkCounts = counts)
    val out = java.nio.file.Files.createTempFile("graftlazvl", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(out), laz)
    val (h0, rows0) = LasDecode.readPoints(las)
    val (h1, rows1) = LasDecode.readPoints(out)
    assert(h1.pointCount === h0.pointCount)
    rows0.zip(rows1).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"point $i differs through layered variable chunking")
    }
    val par = LasDecode.asChunkSplitDataFrame(spark, out)
    assert(par.rdd.getNumPartitions === counts.size)
    assert(par.count() === 500)
    val drv = spark.createDataFrame(
      spark.sparkContext.parallelize(rows1, 2), LasDecode.schema)
    assert(par.exceptAll(drv).isEmpty && drv.exceptAll(par).isEmpty)
  }

  test("spatially-chunked archive: bounds prunes whole chunks before decompression") {
    // 1000 pts across a 4x4 tile grid on [0,16)^2
    val rows = (0 until 1000).map { i =>
      val x = (i % 40) * 0.4 + 0.01 // 0.01 .. 15.6
      val y = (i / 40) * 0.64 + 0.01
      org.apache.spark.sql.Row("t", i, x, y, 1.0 + (i % 7), i % 100,
        1.toShort, 1.toShort, 0.toShort, 0.0f, 0.toShort, 0, 0.0, 0, 0, 0, 0, 0.toShort)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema)
    val out = java.nio.file.Files.createTempFile("graftlaztiled", ".laz").toString
    val h = LasWriter.writeLazTiled(out, df, pointFormat = 0, xf, tileSize = 4.0)
    assert(h.pointCount === 1000L)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(out + ".chunks.json")))
    val boxes = LasDecode.chunkBoxesOf(
      java.nio.file.Files.readString(java.nio.file.Paths.get(out + ".chunks.json")))
    assert(boxes.size === 16, "one chunk per non-empty 4x4 tile")
    assert(boxes.map(_.count).sum === 1000)

    val full = LasDecode.asChunkSplitDataFrame(spark, out)
    assert(full.rdd.getNumPartitions === 16)
    // query box inside one tile: exactly one chunk survives pruning
    val q = Seq(1.0, 1.0, 3.0, 3.0)
    val pruned = LasDecode.asChunkSplitDataFrame(spark, out, bounds = q)
    assert(pruned.rdd.getNumPartitions === 1, "bounds should keep exactly one chunk")
    // pruning is an optimization, not a filter: after the EXACT crop the
    // pruned read equals the full read
    import org.apache.spark.sql.functions.col
    def crop(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("x") >= q(0) && col("x") <= q(2) && col("y") >= q(1) && col("y") <= q(3))
        .select("span_idx", "x", "y", "z")
    val a = crop(full).collect().map(_.toSeq).toSet
    val b = crop(pruned).collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
    // off-grid box prunes everything
    assert(LasDecode.asChunkSplitDataFrame(spark, out,
      bounds = Seq(100.0, 100.0, 200.0, 200.0)).count() === 0L)
    // a STALE sidecar (entry counts disagree) falls back to full decode
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out + ".chunks.json"),
      """[{"count":5,"minx":0,"miny":0,"maxx":1,"maxy":1}]""")
    val stale = LasDecode.asChunkSplitDataFrame(spark, out, bounds = q)
    assert(stale.rdd.getNumPartitions === 16, "stale sidecar must not prune")
    assert(crop(stale).collect().map(_.toSeq).toSet === a)
  }

  test("pipeline readers.las bounds + filters.crop over a tiled .laz matches the unpruned run") {
    val rows = v14Rows(600, 23)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), LasDecode.schema)
    val out = java.nio.file.Files.createTempFile("graftlaztp", ".laz").toString
    LasWriter.writeLazTiled(out, df, pointFormat = 6, xf, tileSize = 500.0, maxChunk = 100)
    val q = "[-400, -400, 400, 400]"
    val pruned = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$out", "splits": 4, "bounds": $q},
         |  {"type": "filters.crop", "bounds": $q}
         |]}""".stripMargin).df
    val full = graft.plans.Pipeline.run(spark,
      s"""{ "pipeline": [
         |  {"type": "readers.las", "path": "$out", "splits": 4},
         |  {"type": "filters.crop", "bounds": $q}
         |]}""".stripMargin).df
    assert(pruned.count() > 0)
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
  }

  test("variable-size sentinel on the unchunked compressor 1 still fails loudly") {
    val vlr = graft.sources.laz.LazDecoder.LazVlr(1, 0xFFFFFFFFL,
      Seq((graft.sources.laz.LazDecoder.ItemPoint10, 20, 1)))
    val ex = intercept[IllegalArgumentException] {
      graft.sources.laz.LazDecoder.requireSupported(vlr)
    }
    assert(ex.getMessage.contains("variable-size"))
  }

  // ---- compressed extra bytes (BYTE item) ------------------------------

  test("lasToLaz compresses extrabytes.las; extras decode identically through the BYTE item") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$RefData/las/extrabytes.las"))
    val laz = LasWriter.lasToLaz(src, chunkSize = 100)
    val out = java.nio.file.Files.createTempFile("graftlazeb", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(out), laz)
    assert(LasDecode.isLaszip(out), "laszip format bit missing")
    // full typed decode INCLUDING extra dims must equal the uncompressed twin
    val a = LasDecode.asDataFrameWithExtras(spark, s"$RefData/las/extrabytes.las")
    val b = LasDecode.asDataFrameWithExtras(spark, out)
    assert(a.columns === b.columns, "extra-dim columns differ")
    assert(b.count() === a.count() && a.count() > 0)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty,
      "extras differ after laz round-trip")
    // and it actually compresses
    assert(laz.length < src.length, s"laz ${laz.length} not smaller than ${src.length}")
  }

  test("lasToLaz round-trips a plain fixture bit-for-bit (fmt 1, gps times)") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$RefData/las/interesting.las"))
    val laz = LasWriter.lasToLaz(src, chunkSize = 300)
    val out = java.nio.file.Files.createTempFile("graftlaz2l", ".laz").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(out), laz)
    val (h0, rows0) = LasDecode.readPoints(s"$RefData/las/interesting.las")
    val (h1, rows1) = LasDecode.readPoints(out)
    assert(h1.pointCount === h0.pointCount && h1.pointFormat === h0.pointFormat)
    rows0.zip(rows1).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"point $i differs after lasToLaz")
    }
  }

  // ---- gps-time multi-table branch golden ------------------------------

  test("gps multi-table golden: crafted time series drives every multiplier branch exactly") {
    // Bit-space construction: gps values are the BASE double's raw bits
    // plus planned bit-diffs, so each point's multiplier (diff ratio per
    // the spec's I32_QUANTIZE rule) is exact by construction.
    val base = java.lang.Double.doubleToRawLongBits(1000.0)
    val far = java.lang.Double.doubleToRawLongBits(1.0e9)
    val d = 1000L
    val bitPlan = scala.collection.mutable.ArrayBuffer[Long](base)
    def step(delta: Long): Unit = bitPlan += bitPlan.last + delta
    step(d)        // 0diff branch -> 32-bit diff (m0Diff 1), lastDiff = d
    step(d)        // multi == 1
    step(d)        // multi == 1
    step(5 * d)    // multi 5   (2..9 family)
    step(50 * d)   // multi 50  (10..499 family)
    step(600 * d)  // multi 600 -> >=500 family (extreme 1)
    step(0)        // unchanged (511)
    step(-3 * d)   // multi -3  (-1..-9 family)
    step(-50 * d)  // multi -50 -> <=-10 family (extreme 2)
    step(d / 3)    // ratio 0.33 -> multi 0 (extreme 3)
    step(d / 3)    // multi 0 again -> extreme 4 > 3: lastDiff takeover (333)
    step(d / 3)    // multi 1 on the taken-over diff
    bitPlan += far            // doesn't fit 32 bits, no other frame -> FULL (512), frame 1
    bitPlan += far + d        // frame 1: 0diff branch 32-bit diff
    bitPlan += far            // multi-branch unchanged? no: lastDiff(1)=d -> multi... -1? -> -1 family; keep simple: back near frame 0
    bitPlan += base + 12 * d  // frame 1 can't reach (huge diff); frame 0 CAN -> frame-switch (513..515), then multi on frame 0
    bitPlan += base + 13 * d  // multi ~3 on frame 0 (333 lastDiff)
    val times = bitPlan.toSeq.map(java.lang.Double.longBitsToDouble)
    // sanity: the planned ratios really cover every family
    def i32q(x: Double): Long = if (x >= 0) (x + 0.5).toLong else (x - 0.5).toLong
    val ratios = Seq(1L, 1L, 5L, 50L, 600L, -3L, -50L).map(m => i32q(m * d.toDouble / d))
    assert(ratios.contains(1L) && ratios.exists(r => r >= 2 && r <= 9) &&
      ratios.exists(r => r >= 10 && r <= 499) && ratios.exists(_ >= 500) &&
      ratios.exists(r => r <= -1 && r >= -9) && ratios.exists(_ <= -10))

    val rows = times.zipWithIndex.map { case (t, i) =>
      Row("g", i, i * 1.0, 0.0, 0.0, 0, 1.toShort, 1.toShort, 0.toShort,
        0.0f, 0.toShort, 0, t, 0, 0, 0, 0, 0.toShort)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LasDecode.schema).orderBy("span_idx")
    val out = java.nio.file.Files.createTempFile("graftgpsmt", ".laz").toString
    LasWriter.writeLaz(out, df, pointFormat = 1, xf, chunkSize = 100000)
    val (_, decoded) = LasDecode.readPoints(out)
    assert(decoded.size === times.size)
    // gps doubles BIT-exact (raw-bit compare, not just ==)
    decoded.zip(times).zipWithIndex.foreach { case ((row, want), i) =>
      assert(java.lang.Double.doubleToRawLongBits(row.getDouble(12)) ===
        java.lang.Double.doubleToRawLongBits(want), s"gps point $i")
    }
  }
}
