package graft.sources.laz

/** Adaptive arithmetic decoder for LASzip streams, implemented from the
  * published LAZ specification (Isenburg, "LASzip: lossless compression
  * of LiDAR data", PE&RS 2013) whose entropy coder is Amir Said's FastAC
  * ("Introduction to Arithmetic Coding", HPL-2004-76) with the
  * renormalization, model-scaling and update-cycle constants the spec
  * fixes. All u32 state is carried in Longs masked to 32 bits.
  *
  * The reference consumes this format through the external laszip
  * library (io/las/ZipPoint.cpp); nothing here is translated from it —
  * this is a clean-room Scala implementation against the spec, verified
  * bit-for-bit by decoding the reference's .laz fixtures and comparing
  * to their uncompressed .las ground truth (LazFormatSpec).
  */
final class ArithmeticDecoder(buf: Array[Byte], var pos: Int) {
  import ArithmeticDecoder._

  private var value: Long = 0L
  private var length: Long = AcMaxLength

  /** Spec: decoder primes its 32-bit window with 4 bytes, MSB first. */
  def init(): Unit = {
    value = ((nextByte() << 24) | (nextByte() << 16) | (nextByte() << 8) | nextByte()) & 0xFFFFFFFFL
    length = AcMaxLength
  }

  private def nextByte(): Long = {
    val b = if (pos < buf.length) (buf(pos) & 0xFF).toLong else 0L
    pos += 1
    b
  }

  private def renorm(): Unit = {
    do {
      value = ((value << 8) | nextByte()) & 0xFFFFFFFFL
      length = (length << 8) & 0xFFFFFFFFL
    } while (length < AcMinLength)
  }

  def decodeBit(m: BitModel): Int = {
    // the scaled probability uses a shifted TEMP; length itself stays
    // full-width until the interval update
    val x = m.bit0Prob * (length >>> BmLengthShift)
    val sym = if (value >= x) 1 else 0
    if (sym == 0) { length = x; m.bit0Count += 1 }
    else { value -= x; length -= x }
    if (length < AcMinLength) renorm()
    m.bitsUntilUpdate -= 1
    if (m.bitsUntilUpdate == 0) m.update()
    sym
  }

  def decodeSymbol(m: SymbolModel): Int = {
    var sym = 0
    var x = 0L
    var y = length
    if (m.decoderTable != null) {
      length = length >>> DmLengthShift
      val dv = value / length
      val t = (dv >>> m.tableShift).toInt
      sym = m.decoderTable(t)
      var n = m.decoderTable(t + 1) + 1
      while (n > sym + 1) {
        val k = (sym + n) >>> 1
        if (m.distribution(k) > dv) n = k else sym = k
      }
      x = m.distribution(sym) * length
      if (sym != m.symbols - 1) y = m.distribution(sym + 1) * length
    } else {
      length = length >>> DmLengthShift
      var n = m.symbols
      var k = n >>> 1
      // iterative bisection over the cumulative distribution
      while (k != sym) {
        val z = m.distribution(k) * length
        if (z > value) { n = k; y = z } else { sym = k; x = z }
        k = (sym + n) >>> 1
      }
    }
    value -= x
    length = y - x
    if (length < AcMinLength) renorm()
    m.symbolCount(sym) += 1
    m.symbolsUntilUpdate -= 1
    if (m.symbolsUntilUpdate == 0) m.update()
    sym
  }

  /** Raw (uniform) bits — spec: split above 19 bits via a 16-bit read. */
  def readBits(bits: Int): Long = {
    if (bits > 19) {
      val lower = readShort()
      val upper = readBits(bits - 16)
      (upper << 16) | lower
    } else {
      length = length >>> bits
      var sym = value / length
      value -= length * sym
      if (length < AcMinLength) renorm()
      if (sym >= (1L << bits)) sym = (1L << bits) - 1 // clamp (corrupt stream guard)
      sym
    }
  }

  def readShort(): Long = {
    length = length >>> 16
    var sym = value / length
    value -= length * sym
    if (length < AcMinLength) renorm()
    if (sym >= 65536L) sym = 65535L
    sym
  }
}

object ArithmeticDecoder {
  val AcMinLength = 0x01000000L
  val AcMaxLength = 0xFFFFFFFFL
  val BmLengthShift = 13
  val BmMaxCount = 1 << BmLengthShift
  val DmLengthShift = 15
  val DmMaxCount = 1 << DmLengthShift

  /** Adaptive binary model (spec: scaled bit-0 probability, count
    * halving at 2^13, update cycle growing 5/4 capped at 64). */
  final class BitModel {
    var bit0Count = 1L
    var bitCount = 2L
    var bit0Prob = 1L << (BmLengthShift - 1)
    var updateCycle = 4
    var bitsUntilUpdate = 4

    def update(): Unit = {
      bitCount += updateCycle
      if (bitCount > BmMaxCount) {
        bitCount = (bitCount + 1) >>> 1
        bit0Count = (bit0Count + 1) >>> 1
        if (bit0Count == bitCount) bitCount += 1
      }
      val scale = 0x80000000L / bitCount
      bit0Prob = (bit0Count * scale) >>> (31 - BmLengthShift)
      updateCycle = (5 * updateCycle) >>> 2
      if (updateCycle > 64) updateCycle = 64
      bitsUntilUpdate = updateCycle
    }
  }

  /** Adaptive n-ary model with the spec's cumulative-distribution
    * rebuild and (for >16 symbols) a lookup table over the top
    * `tableBits` of the decode value. */
  final class SymbolModel(val symbols: Int) {
    val symbolCount = new Array[Long](symbols)
    val distribution = new Array[Long](symbols)
    var decoderTable: Array[Int] = null
    var tableShift = 0
    private var tableSize = 0
    var totalCount = 0L
    var updateCycle = 0
    var symbolsUntilUpdate = 0

    // table sizing per spec: only for models with more than 16 symbols
    if (symbols > 16) {
      var tableBits = 3
      while (symbols > (1 << (tableBits + 2))) tableBits += 1
      tableSize = 1 << tableBits
      tableShift = DmLengthShift - tableBits
      decoderTable = new Array[Int](tableSize + 2)
    }
    java.util.Arrays.fill(symbolCount, 1L)
    totalCount = 0
    updateCycle = symbols
    update()
    // spec/FastAC reset: the FIRST adaptation round is shorter than the
    // cycle the initial update() computed — (n+6)/2 decodes, not 5n/4
    updateCycle = (symbols + 6) >>> 1
    symbolsUntilUpdate = updateCycle

    def update(): Unit = {
      totalCount += updateCycle
      if (totalCount > DmMaxCount) {
        totalCount = 0
        var k = 0
        while (k < symbols) {
          symbolCount(k) = (symbolCount(k) + 1) >>> 1
          totalCount += symbolCount(k)
          k += 1
        }
      }
      val scale = 0x80000000L / totalCount
      if (decoderTable != null) {
        var sum = 0L
        var s = 0
        var k = 0
        while (k < symbols) {
          distribution(k) = (scale * sum) >>> (31 - DmLengthShift)
          sum += symbolCount(k)
          val w = (distribution(k) >>> tableShift).toInt
          while (s < w) { s += 1; decoderTable(s) = k - 1 }
          k += 1
        }
        decoderTable(0) = 0
        while (s <= tableSize) { s += 1; decoderTable(s) = symbols - 1 }
      } else {
        var sum = 0L
        var k = 0
        while (k < symbols) {
          distribution(k) = (scale * sum) >>> (31 - DmLengthShift)
          sum += symbolCount(k)
          k += 1
        }
      }
      updateCycle = (5 * updateCycle) >>> 2
      val maxCycle = (symbols + 6) << 3
      if (updateCycle > maxCycle) updateCycle = maxCycle
      symbolsUntilUpdate = updateCycle
    }
  }
}
