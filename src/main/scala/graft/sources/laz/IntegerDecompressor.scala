package graft.sources.laz

import ArithmeticDecoder.{BitModel, SymbolModel}

/** LASzip integer decompressor (the spec's "IntegerCompressor", decode
  * side): a predicted int is corrected by a variable-width corrector —
  * a k-symbol (number of magnitude bits) from a per-context model, then
  * the corrector's low bits from per-k models (small k exactly, large k
  * split into a modeled high part and `k - bitsHigh` raw bits), then a
  * translation onto the interval [-(2^k - 1), -2^(k-1)] or
  * [2^(k-1)+1, 2^k] (k = 0 encodes {0, 1} with a single bit model and
  * k = 32 the extreme corr_min). Clean-room from the LAZ spec; verified
  * by fixture decode. */
final class IntegerDecompressor(dec: ArithmeticDecoder, bits: Int = 32,
                                contexts: Int = 1, bitsHigh: Int = 8) {
  private val (corrBits, corrRange, corrMin) =
    if (bits > 0 && bits < 32) {
      val range = 1L << bits
      // the spec trims corr_bits when the range is not a power of two —
      // with power-of-two ranges this is just `bits`
      (bits, range, -(range / 2))
    } else (32, 0L, Int.MinValue.toLong)

  private val mBits = Array.fill(contexts)(new SymbolModel(corrBits + 1))
  private val mCorrector0 = new BitModel
  private val mCorrector: Array[SymbolModel] = Array.tabulate(corrBits + 1) { k =>
    if (k == 0) null
    else new SymbolModel(if (k <= bitsHigh) 1 << k else 1 << bitsHigh)
  }

  /** Number of magnitude bits of the last corrector (context feed for
    * dependent fields, e.g. dy's context from dx's k). */
  var lastK: Int = 0

  def decompress(pred: Int, context: Int = 0): Int = {
    var real = pred + readCorrector(mBits(context))
    if (corrRange != 0) {
      if (real < 0) real += corrRange
      else if (real >= corrRange) real -= corrRange
    }
    real.toInt
  }

  private def readCorrector(model: SymbolModel): Long = {
    val k = dec.decodeSymbol(model)
    lastK = k
    if (k == 0) {
      dec.decodeBit(mCorrector0).toLong
    } else if (k < 32) {
      var c: Long =
        if (k <= bitsHigh) dec.decodeSymbol(mCorrector(k)).toLong
        else {
          val k1 = k - bitsHigh
          val high = dec.decodeSymbol(mCorrector(k)).toLong
          (high << k1) | dec.readBits(k1)
        }
      // translate onto the two magnitude-k intervals
      if (c >= (1L << (k - 1))) c += 1
      else c -= (1L << k) - 1
      c
    } else corrMin
  }
}
