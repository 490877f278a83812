package graft.sources.laz

import java.nio.{ByteBuffer, ByteOrder}

/** LASzip (.laz) stream decompressor: turns the compressed point block
  * of a LAZ file into the equivalent RAW uncompressed LAS point records,
  * which then flow through the regular golden-pinned record decode.
  *
  * Supports the original point-wise compressor (1, item versions 1) and
  * the chunked compressor (2, item versions 2) for POINT10 + GPSTIME11 +
  * RGB12 + WAVEPACKET13 + BYTE — i.e. LAS 1.0-1.3 point formats 0-5
  * (+extra bytes) — and the layered chunked compressor 3
  * ([[LazLayered]]) for LAS 1.4 formats 6-10. Variable-size chunking
  * fails loudly.
  *
  * Clean-room implementation from the published LAZ specification /
  * Isenburg's LASzip paper (the reference consumes the format through
  * the external laszip library — io/las/ZipPoint.cpp — whose source is
  * not part of the reference tree); verified bit-for-bit by decoding the
  * reference's .laz fixtures against their uncompressed .las twins. */
object LazDecoder {

  /** Parsed "laszip encoded" VLR (user LASF spec record 22204). */
  final case class LazVlr(compressor: Int, chunkSize: Long,
                          items: Seq[(Int, Int, Int)]) // (type, size, version)

  val ItemByte = 0
  val ItemPoint10 = 6
  val ItemGpsTime11 = 7
  val ItemRgb12 = 8
  val ItemWavepacket13 = 9
  val ItemPoint14 = 10
  val ItemRgb14 = 11
  val ItemRgbNir14 = 12
  val ItemWavepacket14 = 13
  val ItemByte14 = 14

  def parseVlr(payload: Array[Byte]): LazVlr = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val compressor = bb.getShort(0) & 0xFFFF
    val chunkSize = bb.getInt(12) & 0xFFFFFFFFL
    val nItems = bb.getShort(32) & 0xFFFF
    val items = (0 until nItems).map { i =>
      (bb.getShort(34 + 6 * i) & 0xFFFF,
        bb.getShort(36 + 6 * i) & 0xFFFF,
        bb.getShort(38 + 6 * i) & 0xFFFF)
    }
    LazVlr(compressor, chunkSize, items)
  }

  /** Chunk start offsets inside `data` for a compressor-2 stream, from
    * the chunk table (spec: i64 table offset stored at `dataOffset`;
    * the table is u32 version + u32 chunk count followed by the per-
    * chunk compressed byte counts, themselves entropy-coded with a
    * 32-bit integer decompressor over 2 contexts, context 1, each
    * predicted by the previous count). Exact starts matter because the
    * decoder primes 4 lookahead bytes per chunk — sequential
    * "contiguous" decoding would misalign on every chunk boundary. */
  def chunkStarts(data: Array[Byte], dataOffset: Int, nChunks: Int): Seq[Int] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val tableOff = bb.getLong(dataOffset)
    val first = dataOffset + 8
    if (nChunks <= 1) return Seq(first)
    require(tableOff > 0 && tableOff + 8 <= data.length,
      s"laszip chunk table offset $tableOff outside file (truncated stream?)")
    val sizes = chunkSizesFromTable(
      data.slice(tableOff.toInt, data.length), nChunks - 1)
    sizes.scanLeft(first)(_ + _)
  }

  /** Per-chunk compressed byte counts from the chunk-table BYTES alone
    * (u32 version, u32 count, entropy-coded deltas) — so a driver can
    * read just the table region of a huge file, never the chunks. */
  def chunkSizesFromTable(table: Array[Byte], needed: Int): Seq[Int] =
    chunkTableFromBytes(table, variable = false, needed).sizes.toSeq

  /** laszip's chunk_size sentinel for VARIABLE-size chunking: the
    * writer picks each chunk's point count (spatially coherent groups,
    * COPC-style layouts) and the chunk table carries (count, bytes)
    * pairs instead of bytes alone. */
  val VarChunkSentinel = 0xFFFFFFFFL

  final case class ChunkTable(counts: Array[Int], sizes: Array[Int])

  /** Decode the chunk table: u32 version(0), u32 stored-entry count,
    * then one IC(32,2)-coded entry per chunk — variable tables
    * interleave the point count (context 0, predicted by the previous
    * count) before each byte size (context 1, predicted by the previous
    * size); fixed tables carry sizes only and `counts` is left empty.
    * `needed` caps how many entries are decoded for fixed tables (the
    * last chunk's size is never required); variable tables always
    * decode every stored entry (the counts define the boundaries). */
  def chunkTableFromBytes(table: Array[Byte], variable: Boolean,
                          needed: Int): ChunkTable = {
    val tb = ByteBuffer.wrap(table).order(ByteOrder.LITTLE_ENDIAN)
    val version = tb.getInt(0)
    val stored = tb.getInt(4)
    require(version == 0, s"laszip chunk table version $version")
    val n = if (variable) stored else needed
    require(stored >= n, s"chunk table holds $stored entries, need $n")
    val dec = new ArithmeticDecoder(table, 8)
    dec.init()
    val ic = new IntegerDecompressor(dec, 32, 2)
    val counts = if (variable) new Array[Int](n) else Array.emptyIntArray
    val sizes = new Array[Int](n)
    var prevC = 0
    var prevS = 0
    var i = 0
    while (i < n) {
      if (variable) { prevC = ic.decompress(prevC, 0); counts(i) = prevC }
      prevS = ic.decompress(prevS, 1); sizes(i) = prevS
      i += 1
    }
    ChunkTable(counts, sizes)
  }

  /** Every chunk's (start offset, point count) for a compressor-2/3
    * stream — fixed-size chunking derives counts from the VLR chunk
    * size; variable chunking (sentinel) reads them from the table. */
  def chunkBoundaries(data: Array[Byte], dataOffset: Int, pointCount: Int,
                      vlr: LazVlr): (Seq[Int], Seq[Int]) = {
    val first = dataOffset + 8
    if (vlr.chunkSize == VarChunkSentinel) {
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val tableOff = bb.getLong(dataOffset)
      require(tableOff > 0 && tableOff + 8 <= data.length,
        s"laszip chunk table offset $tableOff outside file (truncated stream?)")
      val ct = chunkTableFromBytes(
        data.slice(tableOff.toInt, data.length), variable = true, 0)
      require(ct.counts.map(_.toLong).sum == pointCount,
        s"variable chunk counts sum ${ct.counts.map(_.toLong).sum} != point count $pointCount")
      if (ct.sizes.isEmpty) (Seq.empty, Seq.empty)
      else (ct.sizes.init.scanLeft(first)(_ + _).toSeq, ct.counts.toSeq)
    } else {
      val chunk = if (vlr.chunkSize > 0) vlr.chunkSize.toInt else pointCount
      val nChunks = math.max(1, (pointCount + chunk - 1) / chunk)
      val counts = (0 until nChunks)
        .map(i => math.min(chunk.toLong, pointCount - i.toLong * chunk).toInt)
      (chunkStarts(data, dataOffset, nChunks), counts)
    }
  }

  /** Decompress `pointCount` records of `recordLen` bytes each from
    * `data` starting at `dataOffset`, per the laszip VLR `vlr`. Returns
    * the raw little-endian record bytes (pointCount * recordLen). */
  /** Check `vlr` names a decodable stream, failing loudly otherwise:
    * compressor 1/2 with POINT10 [GPSTIME11] [RGB12] [BYTE] items, or
    * layered compressor 3 with POINT14 [RGB14|RGBNIR14] [BYTE14]. */
  def requireSupported(vlr: LazVlr): Unit = {
    require(vlr.compressor >= 1 && vlr.compressor <= 3,
      s"unsupported laszip compressor ${vlr.compressor}")
    // chunk_size 0xFFFFFFFF is the variable-size-chunking sentinel —
    // legal for the chunked compressors (boundaries come from the chunk
    // table), meaningless for the unchunked compressor 1
    require(vlr.compressor >= 2 || vlr.chunkSize < VarChunkSentinel,
      "variable-size chunk sentinel on the unchunked compressor 1")
    if (vlr.compressor == 3) {
      require(vlr.items.map(_._1) == vlr.items.map(_._1).intersect(
        Seq(ItemPoint14, ItemRgb14, ItemRgbNir14, ItemWavepacket14, ItemByte14)) &&
        vlr.items.nonEmpty && vlr.items.head._1 == ItemPoint14,
        s"unsupported laszip 1.4 item set ${vlr.items}")
    } else {
      require(vlr.items.map(_._1) == vlr.items.map(_._1).intersect(
        Seq(ItemPoint10, ItemGpsTime11, ItemRgb12, ItemWavepacket13, ItemByte)) &&
        vlr.items.nonEmpty && vlr.items.head._1 == ItemPoint10,
        s"unsupported laszip item set ${vlr.items}")
    }
  }

  def decompress(data: Array[Byte], dataOffset: Int, pointCount: Int,
                 recordLen: Int, vlr: LazVlr): Array[Byte] = {
    requireSupported(vlr)
    val out = new Array[Byte](pointCount * recordLen)
    val (starts, counts) =
      if (vlr.compressor >= 2) chunkBoundaries(data, dataOffset, pointCount, vlr)
      else (Seq(dataOffset), Seq(pointCount)) // compressor 1: one unchunked stream
    var decoded = 0
    var ci = 0
    while (decoded < pointCount) {
      decodeChunk(data, starts(ci), out, decoded * recordLen, counts(ci), recordLen, vlr)
      decoded += counts(ci)
      ci += 1
    }
    out
  }

  /** Decode ONE chunk in isolation (chunks are self-contained by
    * design: raw seed point + fresh models) — the unit of parallel
    * decode for [[graft.sources.LasDecode.asChunkSplitDataFrame]].
    * `mask` selects layers for compressor-3 streams
    * ([[LazLayered.LayerMask]]); compressor 1/2 interleave all fields
    * in one stream, so the mask is a no-op there. */
  def decompressChunk(data: Array[Byte], chunkStart: Int, n: Int,
                      recordLen: Int, vlr: LazVlr,
                      mask: Int = LazLayered.LayerMask.All): Array[Byte] = {
    val out = new Array[Byte](n * recordLen)
    if (vlr.compressor == 3)
      LazLayered.decodeChunk(data, chunkStart, out, 0, n, recordLen, vlr, mask)
    else
      decodeChunk(data, chunkStart, out, 0, n, recordLen, vlr)
    out
  }

  /** One chunk: raw first point, then arithmetic-coded rest with fresh
    * models (compressor 1/2), or the layered LAS 1.4 layout (compressor
    * 3, [[LazLayered]]). Returns the stream position after the chunk. */
  private def decodeChunk(data: Array[Byte], start: Int, out: Array[Byte],
                          outOff: Int, n: Int, recordLen: Int, vlr: LazVlr): Int = {
    if (vlr.compressor == 3)
      return LazLayered.decodeChunk(data, start, out, outOff, n, recordLen, vlr)
    // first point is stored raw (it seeds every item's prediction state)
    System.arraycopy(data, start, out, outOff, recordLen)
    val dec = new ArithmeticDecoder(data, start + recordLen)
    val v2 = vlr.compressor == 2
    // item readers in VLR order, seeded from the raw point's fields
    var fieldOff = 0
    val readers: Seq[(Int, (Array[Byte], Int) => Unit, (Array[Byte], Int) => Unit)] =
      vlr.items.map { case (t, size, _) =>
        val rel = fieldOff; fieldOff += size
        val (initF, readF): ((Array[Byte], Int) => Unit, (Array[Byte], Int) => Unit) = t match {
          case ItemPoint10 =>
            if (v2) { val r = new LazItems.Point10V2(dec); (r.init _, r.read _) }
            else { val r = new LazItems.Point10V1(dec); (r.init _, r.read _) }
          case ItemGpsTime11 =>
            if (v2) { val r = new LazItems.GpsTime11V2(dec); (r.init _, r.read _) }
            else { val r = new LazItems.GpsTime11V1(dec); (r.init _, r.read _) }
          case ItemRgb12 =>
            if (v2) { val r = new LazItems.Rgb12V2(dec); (r.init _, r.read _) }
            else { val r = new LazItems.Rgb12V1(dec); (r.init _, r.read _) }
          case ItemWavepacket13 =>
            // wave packets only ever shipped at item version 1 — the
            // same coder serves compressor 1 and 2 streams
            val r = new LazItems.Wavepacket13V1(dec); (r.init _, r.read _)
          case ItemByte =>
            if (v2) { val r = new LazItems.ByteV2(dec, size); (r.init _, r.read _) }
            else { val r = new LazItems.ByteV1(dec, size); (r.init _, r.read _) }
          case other => throw new IllegalArgumentException(s"laszip item $other")
        }
        (rel, initF, readF)
      }
    readers.foreach { case (rel, initF, _) => initF(out, outOff + rel) }
    if (n > 1) {
      dec.init()
      var i = 1
      while (i < n) {
        val po = outOff + i * recordLen
        readers.foreach { case (rel, _, readF) => readF(out, po + rel) }
        i += 1
      }
    }
    dec.pos
  }
}
