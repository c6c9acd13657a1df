package graft.index

/** Lossy u8 quantization of per-document field lengths (token counts), the
  * Lucene `SmallFloat` byte4 scheme that tantivy-style BM25 uses for
  * fieldnorms (reference touch-point: fieldnorms toggled per-search,
  * `/root/reference/summa-core/src/components/index_holder.rs:385-389`; the
  * quantization itself is `[tantivy, public]` — Lucene-lineage 3-bit-mantissa
  * float with 16 "free" exact low values).
  *
  * Properties (tested):
  *   - values 0..31 encode exactly;
  *   - encode is monotone, decode(encode(x)) <= x (floor semantics);
  *   - encode(decode(id)) == id for all 256 ids.
  */
object FieldNorm {

  /** Decode a 4-bit-mantissa code (0..239) to its value. */
  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private def longToInt4(l: Long): Int = {
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(l)
    if (numBits < 4) l.toInt
    else {
      // keep the top 4 significant bits; the leading 1 is implied, so only
      // the low 3 mantissa bits are stored alongside the exponent
      val shift = numBits - 4
      ((l >>> shift) & 0x07).toInt | ((shift + 1) << 3)
    }
  }

  private val NumFree = 16

  /** Decode table: id (0..255) → representable length. */
  val Table: Array[Long] = Array.tabulate(256) { id =>
    if (id < NumFree) id.toLong else int4ToLong(id - NumFree) + NumFree
  }

  /** Quantize a field length to its u8 norm id (floor to nearest
    * representable value).
    */
  def encode(len: Long): Int = {
    require(len >= 0, s"negative field length: $len")
    if (len < NumFree) len.toInt
    else {
      // longToInt4 truncates the mantissa, so decode(id) <= len; the clamp
      // only matters for astronomically large lengths
      math.min(longToInt4(len - NumFree) + NumFree, 255)
    }
  }

  /** Decoded length for a norm id. */
  def decode(id: Int): Long = Table(id & 0xFF)
}
