package graft.sources.laz

import ArithmeticDecoder.SymbolModel
import LazItems.{StreamingMedian5, NumberReturnMap, NumberReturnLevel, u8fold}
import LazEncoder.{ArithmeticEncoder, IntegerCompressorEnc}

/** LASzip LAYERED chunked compressor (compressor 3) for the LAS 1.4
  * point record formats 6-10: POINT14 (item 10), RGB14 (11), RGBNIR14
  * (12), WAVEPACKET14 (13) and BYTE14 (14) at item version 3.
  *
  * Clean-room from the published LAZ 1.4 extension of the LASzip
  * specification. The STRUCTURE follows the spec exactly:
  *
  *  - each chunk starts with the raw seed point record, then every
  *    item's per-layer byte counts (u32 each), then every item's layer
  *    blobs in order — so each field family (returns+XY, Z,
  *    classification, flags, intensity, scan angle, user data, point
  *    source, gps time; rgb; nir; each extra byte) is its own
  *    independently entropy-coded byte layer;
  *  - model state lives in four SCANNER-CHANNEL CONTEXTS; the coder
  *    switches context when the channel changes, seeding a
  *    first-touched context's value state from the previous context's
  *    last point (models start fresh);
  *  - per-field prediction reuses the proven POINT10/GPSTIME11/RGB12
  *    machinery: streaming-median XY diffs with return-map contexts,
  *    per-return-level Z, the 4-frame multiplier gps coder, the
  *    red-delta-predicted color coder.
  *
  * Where the spec's reference implementation makes finer-grained model
  * choices than the published document pins down (exact model counts
  * and context formulas inside each layer), this codec makes its own
  * deterministic choices — encoder and decoder here mirror each other
  * case-for-case and are pinned by round-trip + ScalaCheck property
  * specs. The field-by-field SPEC-vs-MIRROR classification, with the
  * laszip v3 construct each MIRROR row should be diffed against, is
  * the conformance table in SCALE.md ("Compressor-3 conformance
  * table"); `tools/external_validate.sh` automates the falsification
  * given a real laszip. NO external 1.4 .laz fixture exists in the reference tree
  * (its vendored-laszip era predates compressor 3), so bit-parity with
  * external laszip streams is not claimable from this sandbox; decoding
  * a third-party compressor-3 file is NOT supported and this module is
  * honest about that — see README/SCALE.md. What it delivers: this
  * engine's OWN 1.4 format 6-8 archives compress and decompress
  * losslessly with the spec's layered layout and its parallel-decode
  * properties (chunk table + per-chunk independence intact).
  */
object LazLayered {

  /** v14 base record layout (30 bytes):
    * 0 x i32 | 4 y | 8 z | 12 intensity u16 | 14 returnByte (ret:4|n:4)
    * | 15 flagsByte (classFlags:4|channel:2|scanDir:1|edge:1) | 16 cls
    * | 17 userData | 18 scanAngle i16 | 20 psid u16 | 22 gpsTime f64 */
  final class Point14 {
    var x = 0; var y = 0; var z = 0
    var intensity = 0     // u16
    var retByte = 0       // u8
    var flagsByte = 0     // u8
    var classification = 0
    var userData = 0
    var scanAngle = 0     // i16 carried as u16 bits
    var psid = 0          // u16
    var gpsBits = 0L      // raw f64 bits

    def r: Int = retByte & 0xF
    def n: Int = (retByte >> 4) & 0xF
    def channel: Int = (flagsByte >> 4) & 3
    /** classFlags(4) | scanDir(1)<<4 | edge(1)<<5 — the 6 bits the
      * flags layer codes (channel travels in layer 0). */
    def flags6: Int = (flagsByte & 0xF) | (((flagsByte >> 6) & 3) << 4)

    def copyFrom(o: Point14): Unit = {
      x = o.x; y = o.y; z = o.z; intensity = o.intensity
      retByte = o.retByte; flagsByte = o.flagsByte
      classification = o.classification; userData = o.userData
      scanAngle = o.scanAngle; psid = o.psid; gpsBits = o.gpsBits
    }

    def setFrom(b: Array[Byte], off: Int): Unit = {
      def i32(o: Int) = (b(off + o) & 0xFF) | ((b(off + o + 1) & 0xFF) << 8) |
        ((b(off + o + 2) & 0xFF) << 16) | ((b(off + o + 3) & 0xFF) << 24)
      def u16(o: Int) = (b(off + o) & 0xFF) | ((b(off + o + 1) & 0xFF) << 8)
      x = i32(0); y = i32(4); z = i32(8)
      intensity = u16(12); retByte = b(off + 14) & 0xFF; flagsByte = b(off + 15) & 0xFF
      classification = b(off + 16) & 0xFF; userData = b(off + 17) & 0xFF
      scanAngle = u16(18); psid = u16(20)
      var v = 0L; var i = 29
      while (i >= 22) { v = (v << 8) | (b(off + i) & 0xFF); i -= 1 }
      gpsBits = v
    }

    def writeTo(b: Array[Byte], off: Int): Unit = {
      def i32(o: Int, v: Int): Unit = {
        b(off + o) = v.toByte; b(off + o + 1) = (v >> 8).toByte
        b(off + o + 2) = (v >> 16).toByte; b(off + o + 3) = (v >> 24).toByte
      }
      i32(0, x); i32(4, y); i32(8, z)
      b(off + 12) = intensity.toByte; b(off + 13) = (intensity >> 8).toByte
      b(off + 14) = retByte.toByte; b(off + 15) = flagsByte.toByte
      b(off + 16) = classification.toByte; b(off + 17) = userData.toByte
      b(off + 18) = scanAngle.toByte; b(off + 19) = (scanAngle >> 8).toByte
      b(off + 20) = psid.toByte; b(off + 21) = (psid >> 8).toByte
      var v = gpsBits; var i = 22
      while (i < 30) { b(off + i) = (v & 0xFF).toByte; v >>>= 8; i += 1 }
    }
  }

  // POINT14 layer indices
  private val LChanXY = 0; private val LZ = 1; private val LClass = 2
  private val LFlags = 3; private val LIntens = 4; private val LAngle = 5
  private val LUser = 6; private val LPsid = 7; private val LGps = 8
  val Point14Layers = 9

  /** SELECTIVE DECOMPRESSION mask — the point of the layered design:
    * every layer is an independent entropy stream, and only
    * channel_returns_XY carries control flow (the per-point changed
    * bits, return numbers and k-contexts everything else keys off).
    * A query that needs x/y/z therefore decodes 2 of 9+ layers and
    * never touches the gps/rgb/user/extra bytes AT ALL — column
    * pruning pushed inside the codec. Pruned fields are UNDEFINED in
    * the output records (seed-value or zero filled) — callers project
    * them away. */
  object LayerMask {
    val XY = 1 << 0 // structurally required, always decoded
    val Z = 1 << 1
    val Classification = 1 << 2
    val Flags = 1 << 3
    val Intensity = 1 << 4
    val ScanAngle = 1 << 5
    val UserData = 1 << 6
    val PointSource = 1 << 7
    val GpsTime = 1 << 8
    val Rgb = 1 << 9
    val Nir = 1 << 10
    val Extra = 1 << 11
    val Wavepacket = 1 << 12
    val All = (1 << 13) - 1

    /** Mask for a set of point-frame column names (unknown names are
      * ignored; x/y and the identity columns ride the mandatory XY
      * layer). */
    def forColumns(cols: Iterable[String]): Int = {
      var m = XY
      cols.foreach {
        case "z" => m |= Z
        case "classification" => m |= Classification
        case "intensity" => m |= Intensity
        case "scan_angle_rank" => m |= ScanAngle
        case "user_data" => m |= UserData
        case "point_source_id" => m |= PointSource
        case "gps_time" => m |= GpsTime
        case "red" | "green" | "blue" => m |= Rgb
        case "nir" => m |= Nir
        case _ => ()
      }
      m
    }
  }

  /** Per-item layer counts in VLR order. */
  def layerCounts(items: Seq[(Int, Int, Int)]): Seq[Int] = items.map {
    case (LazDecoder.ItemPoint14, _, _) => Point14Layers
    case (LazDecoder.ItemRgb14, _, _) => 1
    case (LazDecoder.ItemRgbNir14, _, _) => 2
    case (LazDecoder.ItemWavepacket14, _, _) => 1
    case (LazDecoder.ItemByte14, size, _) => size
    case (t, _, _) => throw new IllegalArgumentException(s"laszip 1.4 item $t unsupported")
  }

  // ---- POINT14 decoder --------------------------------------------------

  /** One scanner-channel context's model + value state (decode side).
    * IntegerDecompressors bind to the SHARED layer decoders; only the
    * adaptive state is per-context. */
  private final class Ctx14(dec: Array[ArithmeticDecoder]) {
    var used = false
    val last = new Point14
    var prevGpsDiff = false
    val mChanged = Array.fill(8)(new SymbolModel(128))
    val mScannerChannel = new SymbolModel(3)
    val mNumReturns = new Array[SymbolModel](16)
    val mReturnNumber = new Array[SymbolModel](16)
    val lastXDiff = Array.fill(16)(new StreamingMedian5)
    val lastYDiff = Array.fill(16)(new StreamingMedian5)
    val icDx = new IntegerDecompressor(dec(LChanXY), 32, 2)
    val icDy = new IntegerDecompressor(dec(LChanXY), 32, 22)
    val icZ = new IntegerDecompressor(dec(LZ), 32, 20)
    val lastZ = new Array[Int](8)
    val mClass = new Array[SymbolModel](256)
    val mFlags = new Array[SymbolModel](64)
    val icIntensity = new IntegerDecompressor(dec(LIntens), 16, 4)
    val lastIntensity = new Array[Int](4)
    val icScanAngle = new IntegerDecompressor(dec(LAngle), 16, 2)
    val mUserData = new Array[SymbolModel](64)
    val icPsid = new IntegerDecompressor(dec(LPsid), 16)
    val gps = new LazItems.GpsTime11V2(dec(LGps))

    def seedFrom(p: Point14): Unit = {
      last.copyFrom(p)
      gps.initValue(p.gpsBits)
      java.util.Arrays.fill(lastZ, p.z)
      java.util.Arrays.fill(lastIntensity, p.intensity)
      prevGpsDiff = false
      used = true
    }
  }

  final class Point14V3Dec(dec: Array[ArithmeticDecoder], mask: Int = LayerMask.All) {
    private val ctxs = Array.fill(4)(new Ctx14(dec))
    private var cur = 0
    private def on(bit: Int): Boolean = (mask & bit) != 0

    def init(raw: Array[Byte], off: Int): Unit = {
      val seed = new Point14
      seed.setFrom(raw, off)
      cur = seed.channel
      ctxs(cur).seedFrom(seed)
    }

    /** Decode one point into `out` at `off`; returns the point's
      * scanner channel (the context downstream items share). */
    def read(out: Array[Byte], off: Int): Int = {
      var cc = ctxs(cur)
      val lpr = (if (cc.last.r == 1) 1 else 0) |
        (if (cc.last.r >= cc.last.n) 2 else 0) |
        (if (cc.prevGpsDiff) 4 else 0)
      val changed = dec(LChanXY).decodeSymbol(cc.mChanged(lpr))
      if ((changed & 64) != 0) {
        val d = dec(LChanXY).decodeSymbol(cc.mScannerChannel)
        val target = (cur + d + 1) & 3
        if (!ctxs(target).used) ctxs(target).seedFrom(cc.last)
        cur = target
        cc = ctxs(cur)
      }
      val lastR = cc.last.r; val lastN = cc.last.n
      val n =
        if ((changed & 4) != 0) {
          if (cc.mNumReturns(lastN) == null) cc.mNumReturns(lastN) = new SymbolModel(16)
          dec(LChanXY).decodeSymbol(cc.mNumReturns(lastN))
        } else lastN
      val r = (changed & 3) match {
        case 0 => lastR
        case 1 => (lastR + 1) & 15
        case 2 => (lastR + 15) & 15
        case _ =>
          if (cc.mReturnNumber(lastR) == null) cc.mReturnNumber(lastR) = new SymbolModel(16)
          dec(LChanXY).decodeSymbol(cc.mReturnNumber(lastR))
      }
      val m = NumberReturnMap(math.min(n, 7))(math.min(r, 7))
      val l = NumberReturnLevel(math.min(n, 7))(math.min(r, 7))
      val ctx1 = if (n == 1) 1 else 0
      val dx = cc.icDx.decompress(cc.lastXDiff(m).get, ctx1)
      cc.last.x += dx
      cc.lastXDiff(m).add(dx)
      val kx = cc.icDx.lastK
      val dy = cc.icDy.decompress(cc.lastYDiff(m).get,
        ctx1 + (if (kx < 20) kx & 0xFE else 20))
      cc.last.y += dy
      cc.lastYDiff(m).add(dy)
      if (on(LayerMask.Z)) {
        val kz = (kx + cc.icDy.lastK) / 2
        cc.last.z = cc.icZ.decompress(cc.lastZ(l), ctx1 + (if (kz < 18) kz & 0xFE else 18))
        cc.lastZ(l) = cc.last.z
      }
      if (on(LayerMask.Classification)) {
        val lastCls = cc.last.classification
        if (cc.mClass(lastCls) == null) cc.mClass(lastCls) = new SymbolModel(256)
        cc.last.classification = dec(LClass).decodeSymbol(cc.mClass(lastCls))
      }
      if (on(LayerMask.Flags)) {
        val lastF6 = cc.last.flags6
        if (cc.mFlags(lastF6) == null) cc.mFlags(lastF6) = new SymbolModel(64)
        val f6 = dec(LFlags).decodeSymbol(cc.mFlags(lastF6))
        cc.last.flagsByte = (f6 & 0xF) | (cur << 4) | ((f6 >> 4) << 6)
      } else {
        // flags layer pruned: keep the stale flag bits but the CHANNEL
        // bits must track the layer-0 decision (downstream contexts)
        cc.last.flagsByte = (cc.last.flagsByte & 0xCF) | (cur << 4)
      }
      if (on(LayerMask.Intensity)) {
        val cpr = (if (r == 1) 1 else 0) | (if (r >= n) 2 else 0)
        cc.last.intensity = cc.icIntensity.decompress(cc.lastIntensity(cpr), cpr) & 0xFFFF
        cc.lastIntensity(cpr) = cc.last.intensity
      }
      if ((changed & 8) != 0 && on(LayerMask.ScanAngle))
        cc.last.scanAngle = cc.icScanAngle.decompress(cc.last.scanAngle,
          if (cc.prevGpsDiff) 1 else 0) & 0xFFFF
      if (on(LayerMask.UserData)) {
        val udCtx = cc.last.userData >> 2
        if (cc.mUserData(udCtx) == null) cc.mUserData(udCtx) = new SymbolModel(256)
        cc.last.userData = dec(LUser).decodeSymbol(cc.mUserData(udCtx))
      }
      if ((changed & 32) != 0 && on(LayerMask.PointSource))
        cc.last.psid = cc.icPsid.decompress(cc.last.psid) & 0xFFFF
      val gpsChanged = (changed & 16) != 0
      if (gpsChanged && on(LayerMask.GpsTime)) cc.last.gpsBits = cc.gps.readValue()
      cc.prevGpsDiff = gpsChanged
      cc.last.retByte = r | (n << 4)
      cc.last.writeTo(out, off)
      cur
    }
  }

  // ---- POINT14 encoder --------------------------------------------------

  private final class Ctx14Enc(enc: Array[ArithmeticEncoder]) {
    var used = false
    val last = new Point14
    var prevGpsDiff = false
    val mChanged = Array.fill(8)(new SymbolModel(128))
    val mScannerChannel = new SymbolModel(3)
    val mNumReturns = new Array[SymbolModel](16)
    val mReturnNumber = new Array[SymbolModel](16)
    val lastXDiff = Array.fill(16)(new StreamingMedian5)
    val lastYDiff = Array.fill(16)(new StreamingMedian5)
    val icDx = new IntegerCompressorEnc(enc(LChanXY), 32, 2)
    val icDy = new IntegerCompressorEnc(enc(LChanXY), 32, 22)
    val icZ = new IntegerCompressorEnc(enc(LZ), 32, 20)
    val lastZ = new Array[Int](8)
    val mClass = new Array[SymbolModel](256)
    val mFlags = new Array[SymbolModel](64)
    val icIntensity = new IntegerCompressorEnc(enc(LIntens), 16, 4)
    val lastIntensity = new Array[Int](4)
    val icScanAngle = new IntegerCompressorEnc(enc(LAngle), 16, 2)
    val mUserData = new Array[SymbolModel](64)
    val icPsid = new IntegerCompressorEnc(enc(LPsid), 16)
    val gps = new LazEncoder.GpsTime11V2Enc(enc(LGps))

    def seedFrom(p: Point14): Unit = {
      last.copyFrom(p)
      gps.initValue(p.gpsBits)
      java.util.Arrays.fill(lastZ, p.z)
      java.util.Arrays.fill(lastIntensity, p.intensity)
      prevGpsDiff = false
      used = true
    }
  }

  final class Point14V3Enc(enc: Array[ArithmeticEncoder]) {
    private val ctxs = Array.fill(4)(new Ctx14Enc(enc))
    private var cur = 0

    def init(raw: Array[Byte], off: Int): Unit = {
      val seed = new Point14
      seed.setFrom(raw, off)
      cur = seed.channel
      ctxs(cur).seedFrom(seed)
    }

    /** Encode one point; returns its scanner channel. */
    def write(p: Point14): Int = {
      val old = ctxs(cur)
      val lpr = (if (old.last.r == 1) 1 else 0) |
        (if (old.last.r >= old.last.n) 2 else 0) |
        (if (old.prevGpsDiff) 4 else 0)
      val target = p.channel
      val chanChanged = target != cur
      if (chanChanged && !ctxs(target).used) ctxs(target).seedFrom(old.last)
      val cc = if (chanChanged) ctxs(target) else old
      val lastR = cc.last.r; val lastN = cc.last.n
      val rCode =
        if (p.r == lastR) 0
        else if (p.r == ((lastR + 1) & 15)) 1
        else if (p.r == ((lastR + 15) & 15)) 2
        else 3
      val changed =
        (if (chanChanged) 64 else 0) |
        (if (p.psid != cc.last.psid) 32 else 0) |
        (if (p.gpsBits != cc.last.gpsBits) 16 else 0) |
        (if (p.scanAngle != cc.last.scanAngle) 8 else 0) |
        (if (p.n != lastN) 4 else 0) |
        rCode
      enc(LChanXY).encodeSymbol(old.mChanged(lpr), changed)
      if (chanChanged) {
        enc(LChanXY).encodeSymbol(old.mScannerChannel, (target - cur - 1) & 3)
        cur = target
      }
      if ((changed & 4) != 0) {
        if (cc.mNumReturns(lastN) == null) cc.mNumReturns(lastN) = new SymbolModel(16)
        enc(LChanXY).encodeSymbol(cc.mNumReturns(lastN), p.n)
      }
      if (rCode == 3) {
        if (cc.mReturnNumber(lastR) == null) cc.mReturnNumber(lastR) = new SymbolModel(16)
        enc(LChanXY).encodeSymbol(cc.mReturnNumber(lastR), p.r)
      }
      val m = NumberReturnMap(math.min(p.n, 7))(math.min(p.r, 7))
      val l = NumberReturnLevel(math.min(p.n, 7))(math.min(p.r, 7))
      val ctx1 = if (p.n == 1) 1 else 0
      val dx = p.x - cc.last.x
      cc.icDx.compress(cc.lastXDiff(m).get, dx, ctx1)
      cc.last.x = p.x
      cc.lastXDiff(m).add(dx)
      val kx = cc.icDx.lastK
      val dy = p.y - cc.last.y
      cc.icDy.compress(cc.lastYDiff(m).get, dy, ctx1 + (if (kx < 20) kx & 0xFE else 20))
      cc.last.y = p.y
      cc.lastYDiff(m).add(dy)
      val kz = (kx + cc.icDy.lastK) / 2
      cc.icZ.compress(cc.lastZ(l), p.z, ctx1 + (if (kz < 18) kz & 0xFE else 18))
      cc.last.z = p.z
      cc.lastZ(l) = p.z
      val lastCls = cc.last.classification
      if (cc.mClass(lastCls) == null) cc.mClass(lastCls) = new SymbolModel(256)
      enc(LClass).encodeSymbol(cc.mClass(lastCls), p.classification)
      cc.last.classification = p.classification
      val lastF6 = cc.last.flags6
      if (cc.mFlags(lastF6) == null) cc.mFlags(lastF6) = new SymbolModel(64)
      enc(LFlags).encodeSymbol(cc.mFlags(lastF6), p.flags6)
      cc.last.flagsByte = p.flagsByte
      val cpr = (if (p.r == 1) 1 else 0) | (if (p.r >= p.n) 2 else 0)
      cc.icIntensity.compress(cc.lastIntensity(cpr), p.intensity, cpr)
      cc.last.intensity = p.intensity
      cc.lastIntensity(cpr) = p.intensity
      if ((changed & 8) != 0) {
        cc.icScanAngle.compress(cc.last.scanAngle, p.scanAngle,
          if (cc.prevGpsDiff) 1 else 0)
        cc.last.scanAngle = p.scanAngle
      }
      val udCtx = cc.last.userData >> 2
      if (cc.mUserData(udCtx) == null) cc.mUserData(udCtx) = new SymbolModel(256)
      enc(LUser).encodeSymbol(cc.mUserData(udCtx), p.userData)
      cc.last.userData = p.userData
      if ((changed & 32) != 0) {
        cc.icPsid.compress(cc.last.psid, p.psid)
        cc.last.psid = p.psid
      }
      if ((changed & 16) != 0) {
        cc.gps.write(p.gpsBits)
        cc.last.gpsBits = p.gpsBits
      }
      cc.prevGpsDiff = (changed & 16) != 0
      cc.last.retByte = p.retByte
      cur
    }
  }

  // ---- RGB14 / NIR14 / BYTE14 ------------------------------------------

  final class Rgb14V3Dec(dec: ArithmeticDecoder) {
    private val ctxs = new Array[LazItems.Rgb12V2](4)
    private def ctx(c: Int, seedC: Int): LazItems.Rgb12V2 = {
      if (ctxs(c) == null) {
        ctxs(c) = new LazItems.Rgb12V2(dec)
        val src = ctxs(seedC)
        if (src != null && c != seedC) ctxs(c).seed(src.lastR, src.lastG, src.lastB)
      }
      ctxs(c)
    }
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      lastC = channel
      ctx(channel, channel).init(raw, off)
    }
    def read(out: Array[Byte], off: Int, channel: Int): Unit = {
      val c = ctx(channel, lastC); lastC = channel
      c.read(out, off)
    }
  }

  final class Rgb14V3Enc(enc: ArithmeticEncoder) {
    private val ctxs = new Array[LazEncoder.Rgb12V2Enc](4)
    private def ctx(c: Int, seedC: Int): LazEncoder.Rgb12V2Enc = {
      if (ctxs(c) == null) {
        ctxs(c) = new LazEncoder.Rgb12V2Enc(enc)
        val src = ctxs(seedC)
        if (src != null && c != seedC) ctxs(c).seed(src.lastR, src.lastG, src.lastB)
      }
      ctxs(c)
    }
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      lastC = channel
      ctx(channel, channel).init(raw, off)
    }
    def write(r: Int, g: Int, b: Int, channel: Int): Unit = {
      val c = ctx(channel, lastC); lastC = channel
      c.write(r, g, b)
    }
  }

  final class Nir14V3Dec(dec: ArithmeticDecoder) {
    private val ic = new IntegerDecompressor(dec, 16, 4)
    private val last = new Array[Int](4)
    private val used = new Array[Boolean](4)
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      last(channel) = (raw(off) & 0xFF) | ((raw(off + 1) & 0xFF) << 8)
      used(channel) = true
      lastC = channel
    }
    def read(out: Array[Byte], off: Int, channel: Int): Unit = {
      if (!used(channel)) { last(channel) = last(lastC); used(channel) = true }
      lastC = channel
      val v = ic.decompress(last(channel), channel) & 0xFFFF
      last(channel) = v
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
  }

  final class Nir14V3Enc(enc: ArithmeticEncoder) {
    private val ic = new IntegerCompressorEnc(enc, 16, 4)
    private val last = new Array[Int](4)
    private val used = new Array[Boolean](4)
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      last(channel) = (raw(off) & 0xFF) | ((raw(off + 1) & 0xFF) << 8)
      used(channel) = true
      lastC = channel
    }
    def write(v: Int, channel: Int): Unit = {
      if (!used(channel)) { last(channel) = last(lastC); used(channel) = true }
      lastC = channel
      ic.compress(last(channel), v, channel)
      last(channel) = v
    }
  }

  /** WAVEPACKET14: one layer; per-scanner-channel contexts each running
    * the proven [[LazItems.Wavepacket13V1]] coder, value state seeded
    * from the previously active context on first touch (models fresh) —
    * the same context discipline as RGB14. */
  final class Wavepacket14V3Dec(dec: ArithmeticDecoder) {
    private val ctxs = new Array[LazItems.Wavepacket13V1](4)
    private def ctx(c: Int, seedC: Int): LazItems.Wavepacket13V1 = {
      if (ctxs(c) == null) {
        ctxs(c) = new LazItems.Wavepacket13V1(dec)
        val src = ctxs(seedC)
        if (src != null && c != seedC) ctxs(c).seed(src.last)
      }
      ctxs(c)
    }
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      lastC = channel
      ctx(channel, channel).init(raw, off)
    }
    def read(out: Array[Byte], off: Int, channel: Int): Unit = {
      val c = ctx(channel, lastC); lastC = channel
      c.read(out, off)
    }
  }

  final class Wavepacket14V3Enc(enc: ArithmeticEncoder) {
    private val ctxs = new Array[LazEncoder.Wavepacket13V1Enc](4)
    private def ctx(c: Int, seedC: Int): LazEncoder.Wavepacket13V1Enc = {
      if (ctxs(c) == null) {
        ctxs(c) = new LazEncoder.Wavepacket13V1Enc(enc)
        val src = ctxs(seedC)
        if (src != null && c != seedC) ctxs(c).seed(src.last)
      }
      ctxs(c)
    }
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      lastC = channel
      ctx(channel, channel).init(raw, off)
    }
    def write(raw: Array[Byte], off: Int, channel: Int): Unit = {
      val c = ctx(channel, lastC); lastC = channel
      c.write(raw, off)
    }
  }

  /** BYTE14: one layer per extra byte; per-channel-context 256-symbol
    * diff models per byte position. */
  final class Byte14V3Dec(dec: Array[ArithmeticDecoder], n: Int) {
    private val models = Array.ofDim[SymbolModel](4, n)
    private val last = Array.ofDim[Int](4, n)
    private val used = new Array[Boolean](4)
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      var i = 0
      while (i < n) { last(channel)(i) = raw(off + i) & 0xFF; i += 1 }
      used(channel) = true
      lastC = channel
    }
    def read(out: Array[Byte], off: Int, channel: Int): Unit = {
      if (!used(channel)) {
        System.arraycopy(last(lastC), 0, last(channel), 0, n); used(channel) = true
      }
      lastC = channel
      var i = 0
      while (i < n) {
        if (models(channel)(i) == null) models(channel)(i) = new SymbolModel(256)
        val v = u8fold(dec(i).decodeSymbol(models(channel)(i)) + last(channel)(i))
        last(channel)(i) = v
        out(off + i) = v.toByte
        i += 1
      }
    }
  }

  final class Byte14V3Enc(enc: Array[ArithmeticEncoder], n: Int) {
    private val models = Array.ofDim[SymbolModel](4, n)
    private val last = Array.ofDim[Int](4, n)
    private val used = new Array[Boolean](4)
    private var lastC = 0
    def init(raw: Array[Byte], off: Int, channel: Int): Unit = {
      var i = 0
      while (i < n) { last(channel)(i) = raw(off + i) & 0xFF; i += 1 }
      used(channel) = true
      lastC = channel
    }
    def write(raw: Array[Byte], off: Int, channel: Int): Unit = {
      if (!used(channel)) {
        System.arraycopy(last(lastC), 0, last(channel), 0, n); used(channel) = true
      }
      lastC = channel
      var i = 0
      while (i < n) {
        if (models(channel)(i) == null) models(channel)(i) = new SymbolModel(256)
        val v = raw(off + i) & 0xFF
        enc(i).encodeSymbol(models(channel)(i), (v - last(channel)(i)) & 0xFF)
        last(channel)(i) = v
        i += 1
      }
    }
  }

  // ---- chunk codec ------------------------------------------------------

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Decode one layered chunk: raw seed record, per-item layer-size
    * words, per-item layer blobs. `mask` ([[LayerMask]]) selects which
    * layers to decompress — pruned layers' decoders are never built and
    * their byte ranges never touched; pruned fields carry the seed's
    * value. Returns the position after the chunk. */
  def decodeChunk(data: Array[Byte], start: Int, out: Array[Byte],
                  outOff: Int, n: Int, recordLen: Int,
                  vlr: LazDecoder.LazVlr, mask: Int = LayerMask.All): Int = {
    val m = mask | LayerMask.XY // layer 0 carries control flow
    System.arraycopy(data, start, out, outOff, recordLen)
    var p = start + recordLen
    val counts = layerCounts(vlr.items)
    val sizes: Seq[Array[Int]] = counts.map { lc =>
      Array.fill(lc) { val v = u32(data, p); p += 4; v }
    }
    // layer start offsets, in the same order the sizes were declared
    val layerStarts: Seq[Array[Int]] = sizes.map(_.map { s =>
      val o = p; p += s; o
    })
    if (n > 1) {
      var rel = 0
      var p14: Point14V3Dec = null
      var rgb: Rgb14V3Dec = null
      var nir: Nir14V3Dec = null
      var wp: Wavepacket14V3Dec = null
      var bytes14: Byte14V3Dec = null
      var relRgb = 0; var relNir = 0; var relWp = 0; var relBytes = 0
      def mkDec(o: Int): ArithmeticDecoder = {
        val d = new ArithmeticDecoder(data, o); d.init(); d
      }
      vlr.items.zip(layerStarts).foreach { case ((t, size, _), starts) =>
        t match {
          case LazDecoder.ItemPoint14 =>
            // POINT14 layer index i == mask bit i by construction
            val decs = starts.zipWithIndex.map { case (o, li) =>
              if ((m & (1 << li)) != 0) mkDec(o) else null
            }
            p14 = new Point14V3Dec(decs, m); p14.init(out, outOff + rel)
          case LazDecoder.ItemRgb14 =>
            if ((m & LayerMask.Rgb) != 0) rgb = new Rgb14V3Dec(mkDec(starts(0)))
            relRgb = rel
          case LazDecoder.ItemRgbNir14 =>
            if ((m & LayerMask.Rgb) != 0) rgb = new Rgb14V3Dec(mkDec(starts(0)))
            if ((m & LayerMask.Nir) != 0) nir = new Nir14V3Dec(mkDec(starts(1)))
            relRgb = rel; relNir = rel + 6
          case LazDecoder.ItemWavepacket14 =>
            if ((m & LayerMask.Wavepacket) != 0) wp = new Wavepacket14V3Dec(mkDec(starts(0)))
            relWp = rel
          case LazDecoder.ItemByte14 =>
            if ((m & LayerMask.Extra) != 0) {
              bytes14 = new Byte14V3Dec(starts.map(mkDec), size)
            }
            relBytes = rel
        }
        rel += size
      }
      val seed = new Point14
      seed.setFrom(out, outOff)
      val ch0 = seed.channel
      if (rgb != null) rgb.init(out, outOff + relRgb, ch0)
      if (nir != null) nir.init(out, outOff + relNir, ch0)
      if (wp != null) wp.init(out, outOff + relWp, ch0)
      if (bytes14 != null) bytes14.init(out, outOff + relBytes, ch0)
      var i = 1
      while (i < n) {
        val po = outOff + i * recordLen
        val ch = p14.read(out, po)
        if (rgb != null) rgb.read(out, po + relRgb, ch)
        if (nir != null) nir.read(out, po + relNir, ch)
        if (wp != null) wp.read(out, po + relWp, ch)
        if (bytes14 != null) bytes14.read(out, po + relBytes, ch)
        i += 1
      }
    }
    p
  }

  /** Encode one layered chunk from raw records. */
  def encodeChunk(raw: Array[Byte], chunkOff: Int, n: Int, recordLen: Int,
                  items: Seq[(Int, Int, Int)]): Array[Byte] = {
    val counts = layerCounts(items)
    // one encoder per layer, grouped per item
    val encs: Seq[Array[ArithmeticEncoder]] = counts.map(lc =>
      Array.fill(lc) { val e = new ArithmeticEncoder; e.init(); e })
    var rel = 0
    var p14: Point14V3Enc = null
    var rgb: Rgb14V3Enc = null
    var nir: Nir14V3Enc = null
    var wp: Wavepacket14V3Enc = null
    var bytes14: Byte14V3Enc = null
    var relRgb = 0; var relNir = 0; var relWp = 0; var relBytes = 0
    items.zip(encs).foreach { case ((t, size, _), es) =>
      t match {
        case LazDecoder.ItemPoint14 =>
          p14 = new Point14V3Enc(es); p14.init(raw, chunkOff + rel)
        case LazDecoder.ItemRgb14 =>
          rgb = new Rgb14V3Enc(es(0)); relRgb = rel
        case LazDecoder.ItemRgbNir14 =>
          rgb = new Rgb14V3Enc(es(0)); nir = new Nir14V3Enc(es(1))
          relRgb = rel; relNir = rel + 6
        case LazDecoder.ItemWavepacket14 =>
          wp = new Wavepacket14V3Enc(es(0)); relWp = rel
        case LazDecoder.ItemByte14 =>
          bytes14 = new Byte14V3Enc(es, size); relBytes = rel
        case other => throw new IllegalArgumentException(s"laszip 1.4 item $other")
      }
      rel += size
    }
    val seed = new Point14
    seed.setFrom(raw, chunkOff)
    val ch0 = seed.channel
    if (rgb != null) rgb.init(raw, chunkOff + relRgb, ch0)
    if (nir != null) nir.init(raw, chunkOff + relNir, ch0)
    if (wp != null) wp.init(raw, chunkOff + relWp, ch0)
    if (bytes14 != null) bytes14.init(raw, chunkOff + relBytes, ch0)
    val pt = new Point14
    def u16(o: Int) = (raw(o) & 0xFF) | ((raw(o + 1) & 0xFF) << 8)
    var i = 1
    while (i < n) {
      val po = chunkOff + i * recordLen
      pt.setFrom(raw, po)
      val ch = p14.write(pt)
      if (rgb != null) rgb.write(u16(po + relRgb), u16(po + relRgb + 2), u16(po + relRgb + 4), ch)
      if (nir != null) nir.write(u16(po + relNir), ch)
      if (wp != null) wp.write(raw, po + relWp, ch)
      if (bytes14 != null) bytes14.write(raw, po + relBytes, ch)
      i += 1
    }
    encs.foreach(_.foreach(_.done()))
    // chunk = seed record | all items' layer sizes | all items' layer bytes
    val total = recordLen + counts.sum * 4 + encs.map(_.map(_.size).sum).sum
    val out = new java.io.ByteArrayOutputStream(total)
    out.write(raw, chunkOff, recordLen)
    val szBuf = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    encs.foreach(_.foreach { e =>
      szBuf.clear(); szBuf.putInt(e.size)
      out.write(szBuf.array(), 0, 4)
    })
    encs.foreach(_.foreach(e => out.write(e.bytes)))
    out.toByteArray
  }
}
