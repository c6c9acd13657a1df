package graft.analysis

/** Markdown/LaTeX-aware tokenizer (T3 — behavioral port of
  * `/root/reference/summa-core/src/components/tokenizers/mmd_tokenizer.rs:1-350`):
  * skips `\begin{table}…\end{table}`-style environments and inline/display
  * math, drops formatting commands (`\footnote`, `\textit`, …) while keeping
  * their braced content, erases markdown emphasis markers (single `*`/`_`
  * split tokens, doubled ones glue), strips heading markers, and skips the
  * `(url)`/`{caption}` part of `[text](url)` links while gluing the
  * bracketed text to adjacent words. Offsets are UTF-8 byte offsets.
  */
object MmdTokenizer {

  val SkipCommands: Map[String, String] = Map(
    "\\begin{table}" -> "\\end{table}",
    "\\(" -> "\\)",
    "\\[" -> "\\]",
    "\\begin{tabular}" -> "\\end{tabular}",
    "\\begin{figure}" -> "\\end{figure}",
    "$$" -> "$$"
  )

  val SkipTokens: Set[String] = Set(
    "#", "##", "###", "####", "#####", "######", "\\",
    "\\begin{theorem}", "\\end{theorem}", "\\begin{lemma}", "\\end{lemma}",
    "\\begin{itemize}", "\\end{itemize}", "\\begin{equation}", "\\end{equation}",
    "\\begin{equation*}", "\\end{equation*}", "\\begin{align}", "\\end{align}",
    "\\begin{align*}", "\\end{align*}", "\\begin{split}", "\\end{split}",
    "\\begin{split*}", "\\end{split*}", "\\begin{gather}", "\\end{gather}",
    "\\begin{gather*}", "\\end{gather*}", "\\end{table}", "\\end{tabular}",
    "\\end{figure}", "\\pagebreak"
  )

  val DropCommands: Set[String] = Set(
    "\\footnote", "\\footnotemark", "\\underline", "\\uline", "\\uwave",
    "\\dashuline", "\\dotuline", "\\sout", "\\xout", "\\title", "\\author",
    "\\section", "\\subsection", "\\subsubsection", "\\textit", "\\textbf", "\\url"
  )

  val KnownCommands: Set[String] = Set("\\pagebreak", "\\begin", "\\end")

  def tokenize(text: String): IndexedSeq[Token] = {
    val st = new Stream(text)
    val out = Vector.newBuilder[Token]
    while (st.advance()) out += st.emit()
    out.result()
  }

  private final class Stream(text: String) {
    // shared code-point cursor (byte offsets), like the Rust CharIndices field
    private var ci = 0
    private var byteOff = 0
    private def hasChar: Boolean = ci < text.length
    private def nextChar(): (Int, Int) = { // (byteOffset, codepoint)
      val cp = text.codePointAt(ci)
      val off = byteOff
      ci += Character.charCount(cp)
      byteOff += Utf8.len(cp)
      (off, cp)
    }

    private var stacked: Option[(Int, Int)] = None // (codepoint, byteOffset)
    private var maybeLink = false

    // current token state
    private var tText = new java.lang.StringBuilder
    private var tPos = -1
    private var tFrom = -1 // -1 == unset (usize::MAX in the reference)
    private var tTo = 0

    def emit(): Token = Token(tText.toString, tPos, tFrom, tTo)

    private def accept(cp: Int, off: Int): Unit = {
      if (tFrom == -1) tFrom = off
      tTo = off + Utf8.len(cp)
      tText.appendCodePoint(cp)
    }

    private def isTokenChar(cp: Int): Boolean =
      SummaTokenizer.isTokenChar(cp) // alnum + '#' + '+'

    /** Faithful port of `advance_token` (`mmd_tokenizer.rs:170-295`). */
    private def advanceToken(updatePosition: Boolean): Boolean = {
      tText = new java.lang.StringBuilder
      if (updatePosition) tPos += 1
      tFrom = -1
      var isCommand = false
      var specCounter = 0
      var startSkipRound = false
      var skippedRound = 0
      var startSkipFigure = false
      var skippedFigure = 0

      stacked match {
        case Some((cp, off)) =>
          stacked = None
          accept(cp, off)
          if (SummaTokenizer.isCjk(cp)) return true
          if (cp == '\\') isCommand = true
          if (cp == '[') maybeLink = true
        case None => ()
      }

      var done = false
      while (!done && hasChar) {
        val (off, cp) = nextChar()
        val c = cp // ASCII comparisons below; CJK handled explicitly
        var continueLoop = false

        if (startSkipRound || skippedRound > 0) {
          startSkipRound = false
          if (c == '(') { skippedRound += 1; continueLoop = true }
          else if (c == ')') {
            skippedRound -= 1
            if (skippedRound == 0) startSkipFigure = true
            continueLoop = true
          } else if (skippedRound > 0) continueLoop = true
        }
        if (!continueLoop && (startSkipFigure || skippedFigure > 0)) {
          startSkipFigure = false
          if (c == '{') { skippedFigure += 1; continueLoop = true }
          else if (c == '}') { skippedFigure -= 1; continueLoop = true }
          else if (skippedFigure > 0) continueLoop = true
        }

        if (!continueLoop) {
          if (SummaTokenizer.isCjk(cp)) {
            if (tText.length > 0) { stacked = Some((cp, off)); return true }
            accept(cp, off)
            return true
          }
          if (c == '\\') {
            if (tText.length > 0) { stacked = Some((cp, off)); return true }
            isCommand = true
            accept(cp, off)
          } else if (c == '[' && !isCommand) {
            if (tText.length > 0) { stacked = Some((cp, off)); return true }
            maybeLink = true
          } else if (c == ']' && maybeLink && !isCommand) {
            maybeLink = false
            startSkipRound = true
          } else if (c == '^' || c == '~') {
            tTo += 1
          } else if (c == '*' || c == '_') {
            specCounter += 1
          } else if (isTokenChar(cp)) {
            if (specCounter == 1) { stacked = Some((cp, off)); return true }
            else if (specCounter > 1) { tTo += specCounter; specCounter = 0 }
            accept(cp, off)
          } else if (isCommand && (c == '(' || c == ')' || c == '[' || c == ']') &&
              tText.length == 1) {
            accept(cp, off)
            done = true
          } else if (isCommand && (c == '{' || c == '}')) {
            if (DropCommands.contains(tText.toString)) {
              isCommand = false
              tText = new java.lang.StringBuilder
              tFrom = -1
            } else if (c == '{' && !KnownCommands.contains(tText.toString)) {
              done = true
            } else {
              accept(cp, off)
              if (c == '}') done = true
            }
          } else if (tText.length > 0) {
            done = true
          }
        }
      }
      tText.length > 0
    }

    /** Faithful port of `advance` (`mmd_tokenizer.rs:295-340`). */
    def advance(): Boolean = {
      var result = advanceToken(updatePosition = true)
      var settled = false
      while (result && !settled) {
        val txt = tText.toString
        if (SkipTokens.contains(txt)) {
          result = advanceToken(updatePosition = false)
        } else {
          SkipCommands.get(txt) match {
            case Some(endCommand) =>
              while (result && tText.toString != endCommand)
                result = advanceToken(updatePosition = false)
              result = advanceToken(updatePosition = false)
            case None =>
              while (tText.length > 0 && tText.charAt(0) == '\\') {
                tFrom += 1
                tText.deleteCharAt(0)
              }
              val t2 = tText.toString
              if (t2 == "]" || t2 == "}" || t2 == ")")
                result = advanceToken(updatePosition = false)
              else settled = true
          }
        }
      }
      result
    }
  }
}
