package graft.analysis

/** A single analyzed token.
  *
  * Offsets are UTF-8 **byte** offsets into the original input (matching the
  * reference engine's convention, see
  * `/root/reference/summa-core/src/components/tokenizers/tokenizer.rs:18-24`
  * where `offset_to = offset + c.len_utf8()`). `position` is the ordinal of
  * the token in the stream *before* any token filters ran — filters such as
  * stop-word removal drop tokens but never renumber survivors, so phrase
  * adjacency is judged on pre-filter ordinals.
  */
final case class Token(text: String, position: Int, offsetFrom: Int, offsetTo: Int)

object Utf8 {
  /** UTF-8 encoded byte length of a code point. */
  def len(cp: Int): Int =
    if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4
}
