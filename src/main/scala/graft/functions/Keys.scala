package graft.functions

/** Space-filling-curve key math for clustering (SURVEY.md §2 M2).
  *
  * The reference (`brunolmarques/kafka-delta-rs`) has no clustering; the
  * north-star rule requires Z-order (bitwise interleave over
  * doc_id/source/n_tok) and Hilbert-curve keys. Pure, allocation-light
  * Scala so the Catalyst expression ([[ZInterleave]] / [[HilbertIndex]])
  * can call straight into it from generated code.
  */
object Keys {

  /** Interleave the low `bitsPer` bits of each dim into one Long,
    * MSB-first so that lexicographic order on the result is Z-order.
    * Requires dims.length * bitsPer <= 63.
    */
  def zInterleave(dims: Array[Long], bitsPer: Int): Long = {
    val n = dims.length
    require(n * bitsPer <= 63, s"zInterleave: $n dims x $bitsPer bits > 63")
    var out = 0L
    var b = bitsPer - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        out = (out << 1) | ((dims(i) >>> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** 2-dim convenience overload (codegen-friendly, no array alloc). */
  def zInterleave2(a: Long, b: Long, bitsPer: Int): Long = {
    var out = 0L
    var i = bitsPer - 1
    while (i >= 0) {
      out = (out << 2) | (((a >>> i) & 1L) << 1) | ((b >>> i) & 1L)
      i -= 1
    }
    out
  }

  /** 3-dim convenience overload (the doc_id/source/n_tok key). */
  def zInterleave3(a: Long, b: Long, c: Long, bitsPer: Int): Long = {
    var out = 0L
    var i = bitsPer - 1
    while (i >= 0) {
      out = (out << 3) |
        (((a >>> i) & 1L) << 2) | (((b >>> i) & 1L) << 1) | ((c >>> i) & 1L)
      i -= 1
    }
    out
  }

  /** Hilbert index for arbitrary dimension count via Skilling's
    * transpose algorithm ("Programming the Hilbert curve", AIP 2004 —
    * public algorithm). Coordinates must fit in `bitsPer` bits each and
    * dims.length * bitsPer <= 63. Returns the curve position such that
    * consecutive positions are adjacent in the grid.
    */
  def hilbertIndex(coords: Array[Long], bitsPer: Int): Long = {
    val n = coords.length
    require(n * bitsPer <= 63, s"hilbertIndex: $n dims x $bitsPer bits > 63")
    val x = new Array[Long](n)
    System.arraycopy(coords, 0, x, 0, n)
    // Inverse undo excess work
    var q = 1L << (bitsPer - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bitsPer - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0L) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // Interleave transposed bits, MSB-first across dims
    zInterleave(x, bitsPer)
  }

  /** 2-dim Hilbert (no array juggling at call sites). */
  def hilbertIndex2(a: Long, b: Long, bitsPer: Int): Long =
    hilbertIndex(Array(a, b), bitsPer)

  /** 3-dim Hilbert (the doc_id/source/n_tok key). */
  def hilbertIndex3(a: Long, b: Long, c: Long, bitsPer: Int): Long =
    hilbertIndex(Array(a, b, c), bitsPer)

  /** Inverse of [[hilbertIndex]] — used only by property tests to prove
    * bijectivity (index -> coords -> index round-trips).
    */
  def hilbertCoords(index: Long, nDims: Int, bitsPer: Int): Array[Long] = {
    // De-interleave MSB-first into the transposed form
    val x = new Array[Long](nDims)
    var pos = nDims * bitsPer - 1
    var b = bitsPer - 1
    while (b >= 0) {
      var i = 0
      while (i < nDims) {
        x(i) |= ((index >>> pos) & 1L) << b
        pos -= 1
        i += 1
      }
      b -= 1
    }
    // Gray decode
    var t = x(nDims - 1) >>> 1
    var i = nDims - 1
    while (i > 0) { x(i) ^= x(i - 1); i -= 1 }
    x(0) ^= t
    // Undo excess work
    var q = 2L
    while (q != (1L << bitsPer)) {
      val p = q - 1
      i = nDims - 1
      while (i >= 0) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val tt = (x(0) ^ x(i)) & p; x(0) ^= tt; x(i) ^= tt }
        i -= 1
      }
      q <<= 1
    }
    x
  }

  /** Clamp v into [0, 2^bits - 1] — range-scaling for numeric dims. */
  def clampBits(v: Long, bits: Int): Long = {
    val max = (1L << bits) - 1
    if (v < 0L) 0L else if (v > max) max else v
  }
}
