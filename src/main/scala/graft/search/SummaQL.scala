package graft.search

import graft.analysis.Analyzers
import graft.index.IndexSchema

/** SummaQL free-text query parser — a hand-rolled recursive-descent
  * implementation of the reference grammar
  * (`/root/reference/summa-core/src/components/query_parser/summa_ql.pest:1-44`)
  * and statement semantics (`summa_ql.rs:186-780`):
  *
  *   - bag-of-words: statements OR'd (Should) or dismax'd per `defaultMode`;
  *   - `+term` / `-term` → Must / MustNot (Must over multiple default fields
  *     transposes to per-token AND-of-field-ORs);
  *   - `field:term`, `field:(a b)`, `field:*`; unknown field names degrade to
  *     words on the default fields; `excludedFields` short-circuit to Empty;
  *   - phrases with 5 quote-glyph pairs, optional `~slop`, unclosed quotes
  *     tolerated; `term^2.0` boosts; `[a TO b]` ranges with `*` bounds;
  *     `field:/regex/`;
  *   - exact-matches promoter appends a boosted slop-phrase when the whole
  *     query is plain words;
  *   - `termLimit` truncation (default 16, `configs/core.rs:136-141`);
  *   - rewrites: flatten should-nested booleans / unwrap single-should
  *     (`summa_ql.rs:139-161`), prune empties (`summa_ql.rs:163-182`).
  *
  * ISBN/DOI term-field mappers and morphology expansion are config-gated in
  * the reference and default-off; statements recognized as ISBN/DOI parse to
  * Empty until those mappers are configured.
  */
object SummaQL {

  sealed trait DefaultMode
  object DefaultMode {
    case object BooleanShould extends DefaultMode
    final case class DisjunctionMax(tieBreaker: Double) extends DefaultMode
  }

  final case class ExactMatchesPromoter(
      slop: Int = 0,
      boost: Option[Double] = None,
      fields: Seq[String] = Nil
  )

  final case class Config(
      defaultFields: Seq[String],
      schema: Option[IndexSchema] = None,
      fastFields: Set[String] = Set.empty,
      fieldAliases: Map[String, String] = Map.empty,
      fieldBoosts: Map[String, Double] = Map.empty,
      excludedFields: Set[String] = Set.empty,
      defaultMode: DefaultMode = DefaultMode.BooleanShould,
      exactMatchesPromoter: Option[ExactMatchesPromoter] = None,
      termLimit: Int = 16,
      /** per-field derive-tenses coefficient (reference `MorphologyConfig`) */
      morphologyConfigs: Map[String, Double] = Map.empty,
      queryLanguage: Option[String] = None,
      /** mapper name (doi / doi_isbn / isbn) → target fields
        * (`term_field_mappers.rs:44-128`); default-off like the reference
        */
      termFieldMappers: Map[String, Seq[String]] = Map.empty
  ) {
    def analyzerOf(field: String): String =
      schema.flatMap(_.field(field)).map(_.analyzer).getOrElse("summa")
    def hasPositions(field: String): Boolean =
      schema.flatMap(_.field(field)).forall(_.record == "position")
    def isTextField(field: String): Boolean =
      schema.map(_.field(field).exists(_.fieldType != "json")).getOrElse(true)
    def isKnownField(field: String): Boolean =
      isTextField(field) && schema.isDefined || fastFields.contains(field)

    /** Merge a per-query override over this config — reference
      * `QueryParserConfig::merge` (`configs/core.rs:143-166`): non-empty
      * `default_fields` REPLACES, map-valued configs EXTEND (per-key
      * override), positive `term_limit` replaces, and each `Some` optional
      * replaces; everything else (schema binding, fast/excluded fields)
      * keeps the index default, exactly like the reference merge which
      * leaves unlisted fields untouched.
      */
    def merged(p: ConfigPatch): Config = copy(
      defaultFields = if (p.defaultFields.nonEmpty) p.defaultFields else defaultFields,
      fieldAliases = fieldAliases ++ p.fieldAliases,
      fieldBoosts = fieldBoosts ++ p.fieldBoosts,
      morphologyConfigs = morphologyConfigs ++ p.morphologyConfigs,
      termFieldMappers = termFieldMappers ++ p.termFieldMappers,
      termLimit = if (p.termLimit > 0) p.termLimit else termLimit,
      exactMatchesPromoter = p.exactMatchesPromoter.orElse(exactMatchesPromoter),
      defaultMode = p.defaultMode.getOrElse(defaultMode),
      queryLanguage = p.queryLanguage.orElse(queryLanguage))

    /** Dotted-path resolution against json fields (reference
      * `Schema::find_field` used at `summa_ql.rs:601-602`): the longest
      * schema-field prefix of a dotted name that is a json field wins, the
      * remainder is the json path. A bare json field name (no path) is NOT
      * known — the reference errors (`JsonFieldWithoutPath`); we degrade to
      * default-field words like any unknown field.
      */
    def findJsonPath(name: String): Option[(String, String)] =
      schema.flatMap { sc =>
        if (!name.contains('.')) None
        else {
          val segs = name.split('.')
          (segs.length - 1 to 1 by -1).iterator.flatMap { n =>
            val prefix = segs.take(n).mkString(".")
            sc.field(prefix) match {
              case Some(fd) if fd.fieldType == "json" =>
                Some((prefix, segs.drop(n).mkString(".")))
              case _ => None
            }
          }.nextOption()
        }
      }
  }

  /** Per-query parser-config override carried by [[MatchQuery]] — the Spark
    * rendering of proto `QueryParserConfig` as used for merging
    * (`query.proto:118-121`; merge semantics `configs/core.rs:143-166`).
    * "Unset" is encoded the proto way: empty seq / empty map / 0 / None.
    */
  final case class ConfigPatch(
      defaultFields: Seq[String] = Nil,
      fieldAliases: Map[String, String] = Map.empty,
      fieldBoosts: Map[String, Double] = Map.empty,
      morphologyConfigs: Map[String, Double] = Map.empty,
      termFieldMappers: Map[String, Seq[String]] = Map.empty,
      termLimit: Int = 0,
      exactMatchesPromoter: Option[ExactMatchesPromoter] = None,
      defaultMode: Option[DefaultMode] = None,
      queryLanguage: Option[String] = None)

  // ------------------------------------------------------------------ lexer

  private val QuoteChars: Set[Char] = Set('"', '\'', '`', '’', '“', '”', '‘', '«', '»', '„')

  sealed private trait PreTerm
  private final case class PWord(text: String) extends PreTerm
  private final case class PPhrase(text: String, slop: Int) extends PreTerm
  private final case class PRegex(pattern: String) extends PreTerm
  private final case class PRange(lower: Option[String], upper: Option[String]) extends PreTerm

  sealed private trait Stmt
  private final case class STerm(occur: Occur, pre: PreTerm, boost: Option[Double]) extends Stmt
  private final case class SGroup(occur: Occur, terms: Seq[(Occur, PreTerm)], boost: Option[Double]) extends Stmt
  private final case class SFieldTerm(field: String, occur: Occur, pre: PreTerm, boost: Option[Double]) extends Stmt
  private final case class SFieldGroup(field: String, occur: Occur, terms: Seq[(Occur, PreTerm)], boost: Option[Double]) extends Stmt
  private final case class SFieldStar(field: String, boost: Option[Double]) extends Stmt
  private final case class SIsbn(text: String) extends Stmt
  private final case class SDoi(text: String) extends Stmt

  private final class P(s: String) {
    var p = 0
    def eof: Boolean = p >= s.length
    def cur: Char = s.charAt(p)
    def peek(i: Int): Char = if (p + i < s.length) s.charAt(p + i) else '\u0000'

    private def isWordStart(c: Char): Boolean = Character.isLetter(c) || Character.isDigit(c) ||
      (Character.getType(c) match {
        case Character.LETTER_NUMBER | Character.OTHER_NUMBER => true
        case _ => false
      })
    private def isWordCont(c: Char): Boolean =
      isWordStart(c) || c == '_' || c == '+' || c == '#' || c == '-' || c == '–' || c == '\''

    private def isSepAt(i: Int): Boolean = {
      if (i >= s.length) return false
      val c = s.charAt(i)
      def nextWs = i + 1 >= s.length || Character.isWhitespace(s.charAt(i + 1))
      c match {
        case _ if Character.isWhitespace(c) => true
        case ',' | '.' | ';' | '!' | '?' | '(' | ')' | '/' => true
        case ':' | '-' | '+' => nextWs
        case _ => false
      }
    }

    def skipSeps(): Unit = {
      while (!eof && isSepAt(p)) p += 1
    }

    /** ISBN: `978`? (`-`? digit){7,10} anchored at end of input. */
    private def tryIsbn(): Option[String] = {
      val save = p
      val sb = new StringBuilder
      if (s.startsWith("978", p)) { sb.append("978"); p += 3 }
      var groups = 0
      while (!eof && groups < 10 && {
          val dash = cur == '-' && p + 1 < s.length && s.charAt(p + 1).isDigit
          if (dash) { sb.append('-'); p += 1 }
          if (!eof && cur.isDigit) { sb.append(cur); p += 1; groups += 1; true } else false
        }) ()
      if (groups >= 7 && eof) Some(sb.toString)
      else { p = save; None }
    }

    /** `10.NNNN/suffix`, optionally wrapped in https://(dx.)doi.org/.
      * Returns (full matched text incl. wrapper, inner DOI) — field-scoped
      * terms use the verbatim full text, top-level DOI statements the inner
      * DOI (pest `word = @{ wrapped_doi | … }` vs the `doi` capture).
      */
    private def tryDoi(): Option[(String, String)] = {
      val save = p
      if (s.startsWith("http", p)) {
        p += 4
        if (!eof && cur == 's') p += 1
        if (s.startsWith("://", p)) p += 3 else { p = save; return None }
      }
      if (s.startsWith("dx.", p)) p += 3
      if (s.startsWith("doi.org/", p)) p += 8
      val doiStart = p
      if (!s.startsWith("10.", p)) { p = save; return None }
      p += 3
      val d0 = p
      while (!eof && cur.isDigit) p += 1
      if (p - d0 < 4 || p - d0 > 9) { p = save; return None }
      while (!eof && Character.isWhitespace(cur)) p += 1
      if (!eof && cur == '/') p += 1
      else if (!eof && (s.startsWith("%2f", p) || s.startsWith("%2F", p))) p += 3
      else { p = save; return None }
      while (!eof && Character.isWhitespace(cur)) p += 1
      val sfx = p
      while (!eof && !Character.isWhitespace(cur)) p += 1
      if (p == sfx) { p = save; None }
      else Some((s.substring(save, p), s.substring(doiStart, p)))
    }

    private def readWord(): Option[String] = {
      if (eof || !isWordStart(cur)) return None
      val start = p
      p += 1
      while (!eof && isWordCont(cur)) p += 1
      Some(s.substring(start, p))
    }

    private def readFieldName(): Option[String] = {
      if (eof || !(cur.isLetter && cur < 128)) return None
      val start = p
      p += 1
      while (!eof && ((cur < 128 && (cur.isLetterOrDigit)) || cur == '_' || cur == '.')) p += 1
      Some(s.substring(start, p))
    }

    private def readPhrase(): Option[PPhrase] = {
      if (eof || !QuoteChars.contains(cur)) return None
      val q = cur
      p += 1
      val start = p
      while (!eof && cur != q) p += 1
      val text = s.substring(start, p)
      if (!eof) p += 1 // closing quote (EOI tolerated)
      var slop = 0
      if (!eof && cur == '~') {
        val save = p
        p += 1
        val d0 = p
        while (!eof && cur.isDigit) p += 1
        if (p > d0) slop = s.substring(d0, p).toInt else p = save
      }
      Some(PPhrase(text, slop))
    }

    private def readRegex(): Option[PRegex] = {
      if (eof || cur != '/') return None
      val save = p
      var n = 0
      while (!eof && cur == '/') { n += 1; p += 1 }
      val closing = "/" * n
      val idx = s.indexOf(closing, p)
      if (idx < 0) { p = save; None }
      else {
        val pat = s.substring(p, idx)
        p = idx + n
        Some(PRegex(pat))
      }
    }

    private def readRange(): Option[PRange] = {
      if (eof || cur != '[') return None
      val save = p
      p += 1
      def ws(): Unit = while (!eof && Character.isWhitespace(cur)) p += 1
      def boundary(): Option[Option[String]] =
        if (!eof && cur == '*') { p += 1; Some(None) }
        else if (!eof && QuoteChars.contains(cur)) {
          // quoted boundary: values whose chars aren't word chars (ip
          // literals `"192.168.1.1"`, base64 with `/=`)
          val q = cur
          p += 1
          val start = p
          while (!eof && cur != q) p += 1
          if (eof) None
          else { val w = s.substring(start, p); p += 1; Some(Some(w)) }
        } else {
          val neg = !eof && cur == '-'
          if (neg) p += 1
          readWord() match {
            case Some(w) => Some(Some(if (neg) "-" + w else w))
            case None    => None
          }
        }
      ws()
      val lo = boundary()
      if (lo.isEmpty) { p = save; return None }
      ws()
      if (!(s.regionMatches(true, p, "to", 0, 2))) { p = save; return None }
      p += 2
      ws()
      val hi = boundary()
      if (hi.isEmpty) { p = save; return None }
      ws()
      if (eof || cur != ']') { p = save; return None }
      p += 1
      Some(PRange(lo.get, hi.get))
    }

    private def readPreTerm(): Option[PreTerm] =
      readPhrase().orElse(readRegex()).orElse(readRange()).orElse {
        tryDoi().map { case (full, _) => PWord(full) }.orElse(readWord().map(PWord(_)))
      }

    /** `+w` / `-w` / `w` — sign only binds when directly followed by a term. */
    private def readSignedTerm(): Option[(Occur, PreTerm)] = {
      val save = p
      val occur =
        if (!eof && cur == '+' && !Character.isWhitespace(peek(1))) { p += 1; Occur.Must }
        else if (!eof && cur == '-' && !Character.isWhitespace(peek(1))) { p += 1; Occur.MustNot }
        else Occur.Should
      readPreTerm() match {
        case Some(pt) => Some((occur, pt))
        case None     => p = save; None
      }
    }

    private def readGrouping(): Option[(Occur, Seq[(Occur, PreTerm)])] = {
      val save = p
      val occur =
        if (!eof && cur == '+' && peek(1) == '(') { p += 1; Occur.Must }
        else if (!eof && cur == '-' && peek(1) == '(') { p += 1; Occur.MustNot }
        else Occur.Should
      if (eof || cur != '(') { p = save; return None }
      p += 1
      val terms = Vector.newBuilder[(Occur, PreTerm)]
      var n = 0
      var ok = true
      while (ok) {
        while (!eof && Character.isWhitespace(cur)) p += 1
        if (!eof && cur == ')') { p += 1; ok = false }
        else readSignedTerm() match {
          case Some(t) => terms += t; n += 1
          case None    => p = save; return None
        }
      }
      if (n == 0) { p = save; None } else Some((occur, terms.result()))
    }

    private def readBoost(): Option[Double] = {
      if (eof || cur != '^') return None
      val save = p
      p += 1
      val d0 = p
      while (!eof && (cur.isDigit || cur == '.')) p += 1
      if (p == d0) { p = save; None }
      else
        try Some(s.substring(d0, p).toDouble)
        catch { case _: NumberFormatException => p = save; None }
    }

    def readStatement(): Option[Stmt] = {
      tryIsbn() match {
        case Some(i) => return Some(SIsbn(i))
        case None    => ()
      }
      tryDoi() match {
        case Some((_, inner)) =>
          readBoost() // parsed but unused for DOI statements (reference parity)
          return Some(SDoi(inner))
        case None => ()
      }
      // search_group: field_name ':' (grouping | star | term) — no space after ':'
      val save = p
      readFieldName() match {
        case Some(fn) if !eof && cur == ':' && !Character.isWhitespace(peek(1)) && p + 1 < s.length =>
          p += 1
          if (cur == '*') {
            p += 1
            val b = readBoost()
            return Some(SFieldStar(fn, b))
          }
          readGrouping() match {
            case Some((occ, ts)) =>
              val b = readBoost()
              return Some(SFieldGroup(fn, occ, ts, b))
            case None =>
              readSignedTerm() match {
                case Some((occ, pt)) =>
                  val b = readBoost()
                  return Some(SFieldTerm(fn, occ, pt, b))
                case None => p = save
              }
          }
        case _ => p = save
      }
      readGrouping() match {
        case Some((occ, ts)) =>
          val b = readBoost()
          return Some(SGroup(occ, ts, b))
        case None => ()
      }
      readSignedTerm() match {
        case Some((occ, pt)) =>
          val b = readBoost()
          Some(STerm(occ, pt, b))
        case None => None
      }
    }

    def readStatements(): Seq[Stmt] = {
      val out = Vector.newBuilder[Stmt]
      skipSeps()
      var ok = true
      while (ok && !eof) {
        readStatement() match {
          case Some(st) => out += st; skipSeps()
          case None     => ok = false // pest semantics: unparseable tail is dropped
        }
      }
      out.result()
    }
  }

  // ------------------------------------------------------------- semantics

  private def multiplyBoosts(a: Option[Double], b: Option[Double]): Option[Double] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(x * y)
      case (Some(x), None)    => Some(x)
      case (None, Some(y))    => Some(y)
      case (None, None)       => None
    }

  private def boosted(q: Query, boost: Option[Double]): Query =
    boost.map(BoostQuery(q, _)).getOrElse(q)

  /** Queries for one pre-term against one field (reference `parse_pre_term`,
    * `summa_ql.rs:311-474`).
    */
  private def preTermQueries(
      cfg: Config,
      field: String,
      pre: PreTerm,
      boost0: Option[Double],
      ignorePhraseForNonPositionField: Boolean
  ): Seq[Query] = {
    val boost = multiplyBoosts(cfg.fieldBoosts.get(field), boost0)
    val isText = cfg.schema.exists(_.field(field).isDefined)
    if (!isText) {
      // fast-field (docs-table column): equality = degenerate range
      return pre match {
        case PWord(w)         => Seq(boosted(RangeQuery(field, Some(w), Some(w)), boost))
        case PPhrase(t, _)    => Seq(boosted(RangeQuery(field, Some(t), Some(t)), boost))
        case PRange(lo, hi)   => Seq(boosted(RangeQuery(field, lo, hi), boost))
        case PRegex(_)        => Seq(EmptyQuery)
      }
    }
    // typed scalar fields (reference `parse_pre_term` FieldType::Bytes /
    // IpAddr arms): one canonical hex term per value, ranges lexicographic
    val typedTerm: Option[String => Option[String]] =
      cfg.schema.flatMap(_.field(field)).map(_.fieldType) match {
        case Some("bytes") => Some(graft.index.TypedFields.bytesTerm _)
        case Some("ip")    => Some(graft.index.TypedFields.ipTerm _)
        case _             => None
      }
    typedTerm.foreach { enc =>
      return pre match {
        case PWord(w) =>
          enc(w).map(t => boosted(TermQuery(field, t), boost)).toSeq
        case PPhrase(t, _) =>
          enc(t).map(v => boosted(TermQuery(field, v), boost)).toSeq
        case PRange(lo, hi) =>
          Seq(boosted(TermRangeQuery(field, lo.flatMap(enc), hi.flatMap(enc)), boost))
        case PRegex(_) => Seq(EmptyQuery)
      }
    }
    val analyzer = Analyzers(cfg.analyzerOf(field))
    pre match {
      case PWord(w) =>
        val morphCoeff =
          if (cfg.queryLanguage.contains("en") && w.length < 24) cfg.morphologyConfigs.get(field)
          else None
        analyzer.tokenize(w).map { t =>
          val q = morphCoeff match {
            case Some(coeff) => Morphology.deriveQuery(field, t.text, coeff)
            case None        => TermQuery(field, t.text)
          }
          boosted(q, boost)
        }
      case PPhrase(text, slop) =>
        val toks = analyzer.tokenize(text)
        if (toks.isEmpty) Nil
        else if (toks.size == 1) Seq(boosted(TermQuery(field, toks.head.text), boost))
        else if (cfg.hasPositions(field))
          Seq(boosted(PhraseQuery(field, toks.map(t => (t.position, t.text)), slop), boost))
        else if (ignorePhraseForNonPositionField) Nil
        else Nil
      case PRegex(pat) => Seq(boosted(RegexQuery(field, pat), boost))
      case PRange(lo, hi) =>
        def bnd(o: Option[String]): Option[String] =
          o.flatMap(w => analyzer.tokenize(w).headOption.map(_.text))
        Seq(boosted(TermRangeQuery(field, bnd(lo), bnd(hi)), boost))
    }
  }

  /** Queries for one pre-term against a json field path (reference
    * `parse_pre_term` on `FieldType::JsonObject` + `cast_field_to_term`,
    * `utils.rs:14-37`): unquoted words take the fast-value ladder
    * (i64/f64/bool, else str); phrases force string terms with positions;
    * ranges become typed order-preserving term ranges (the i64/f64 sortable
    * encodings make lexicographic term comparison equal numeric comparison).
    */
  private def jsonPreTermQueries(
      cfg: Config,
      field: String,
      path: String,
      pre: PreTerm,
      boost0: Option[Double]
  ): Seq[Query] = {
    import graft.index.JsonField
    val boost = multiplyBoosts(cfg.fieldBoosts.get(field), boost0)
    val analyzer = Analyzers(cfg.analyzerOf(field))
    pre match {
      case PWord(w) =>
        analyzer.tokenize(w).map(t =>
          boosted(TermQuery(field, JsonField.castToTerm(path, t.text, forceStr = false)), boost))
      case PPhrase(text, slop) =>
        val toks = analyzer.tokenize(text)
        if (toks.isEmpty) Nil
        else if (toks.size == 1)
          Seq(boosted(TermQuery(field, JsonField.castToTerm(path, toks.head.text, forceStr = true)), boost))
        else
          Seq(boosted(PhraseQuery(
            field,
            toks.map(t => (t.position, JsonField.castToTerm(path, t.text, forceStr = true))),
            slop), boost))
      case PRange(lo, hi) => Seq(boosted(jsonRangeQuery(field, path, lo, hi), boost))
      case PRegex(_)      => Seq(EmptyQuery) // regex over json paths: unsupported
    }
  }

  /** Typed term range over a json path; `[* TO *]` is a path-exists scan. */
  private def jsonRangeQuery(
      field: String, path: String, lo: Option[String], hi: Option[String]): Query = {
    import graft.index.JsonField
    def kind(v: String): Char =
      if (v.forall(c => c.isDigit || c == '-') && v.exists(_.isDigit)) 'i'
      else if (scala.util.Try(v.toDouble).isSuccess) 'f'
      else 's'
    // the kind is inferred per BOUND and the bounds must agree: a range like
    // `[2010 TO x]` or `[2010 TO 2014.5]` falls back to the string arm (and
    // i+f widens to f) instead of throwing NumberFormatException out of parse
    val kinds = Seq(lo, hi).flatten.map(kind)
    val k =
      if (kinds.isEmpty) '*'
      else if (kinds.forall(_ == 'i')) 'i'
      else if (kinds.forall(c => c == 'i' || c == 'f')) 'f'
      else 's'
    k match {
      case '*' =>
        TermRangeQuery(field, Some(s"$path${JsonField.Sep}"),
          Some(s"$path${JsonField.SepNext}"), includeUpper = false)
      case 'i' =>
        TermRangeQuery(field,
          Some(JsonField.i64Term(path, lo.map(_.toLong).getOrElse(Long.MinValue))),
          Some(JsonField.i64Term(path, hi.map(_.toLong).getOrElse(Long.MaxValue))))
      case 'f' =>
        TermRangeQuery(field,
          Some(JsonField.f64Term(path, lo.map(_.toDouble).getOrElse(Double.NegativeInfinity))),
          Some(JsonField.f64Term(path, hi.map(_.toDouble).getOrElse(Double.PositiveInfinity))))
      case _ =>
        TermRangeQuery(field,
          Some(s"$path${JsonField.Sep}s" + lo.getOrElse("")),
          hi.map(v => s"$path${JsonField.Sep}s" + v)
            .orElse(Some(s"$path${JsonField.Sep}t")),
          includeUpper = hi.isDefined)
    }
  }

  /** A term over the default fields (reference `default_field_queries`,
    * `summa_ql.rs:225-279`).
    */
  private def defaultFieldQueries(cfg: Config, occur: Occur, pre: PreTerm, boost: Option[Double]): Query = {
    val perField: Seq[Seq[Query]] =
      cfg.defaultFields.map(f => preTermQueries(cfg, f, pre, boost, ignorePhraseForNonPositionField = true))
    occur match {
      case Occur.Should =>
        val flat = perField.flatten
        cfg.defaultMode match {
          case DefaultMode.BooleanShould =>
            BooleanQuery(flat.map((Occur.Should, _)))
          case DefaultMode.DisjunctionMax(tb) =>
            DisjunctionMaxQuery(flat, tb)
        }
      case Occur.MustNot =>
        BooleanQuery(perField.flatten.map((Occur.MustNot, _)))
      case Occur.Must =>
        if (cfg.defaultFields.size == 1)
          BooleanQuery(perField.flatten.map((Occur.Must, _)))
        else {
          // transpose: per token, an OR over fields, AND'd together
          val cols = perField.filter(_.nonEmpty)
          val n = cols.map(_.size).minOption.getOrElse(0)
          val transposed = (0 until n).map(i => cols.map(_(i)))
          BooleanQuery(transposed.map(qs => (Occur.Must, BooleanQuery(qs.map((Occur.Should, _))))))
        }
    }
  }

  private def fieldTermQuery(cfg: Config, field: String, occur: Occur, pre: PreTerm, boost: Option[Double]): Query =
    BooleanQuery(
      preTermQueries(cfg, field, pre, boost, ignorePhraseForNonPositionField = false)
        .map((occur, _))
    )

  private def resolveField(cfg: Config, name: String): String =
    cfg.fieldAliases.getOrElse(name, name)

  private def isExcluded(cfg: Config, name: String): Boolean =
    cfg.excludedFields.contains(name) || name.split('.').headOption.exists(cfg.excludedFields.contains)

  private def statementQuery(cfg: Config, st: Stmt): Query = st match {
    case STerm(occ, pre, b) => defaultFieldQueries(cfg, occ, pre, b)
    case SGroup(occ, terms, b) =>
      val group = BooleanQuery(terms.map { case (o, pt) => (Occur.Should, defaultFieldQueries(cfg, o, pt, b)) })
      occ match {
        case Occur.Should => group
        case o            => BooleanQuery(Seq((o, group)))
      }
    case SFieldTerm(fname, occ, pre, b) =>
      val rf = resolveField(cfg, fname)
      if (cfg.isKnownField(rf)) fieldTermQuery(cfg, rf, occ, pre, b)
      else if (cfg.findJsonPath(rf).isDefined) {
        val (jf, path) = cfg.findJsonPath(rf).get
        BooleanQuery(jsonPreTermQueries(cfg, jf, path, pre, b).map((occ, _)))
      } else if (isExcluded(cfg, fname)) EmptyQuery
      else
        BooleanQuery(Seq(
          (Occur.Should, defaultFieldQueries(cfg, Occur.Should, PWord(fname), b)),
          (Occur.Should, defaultFieldQueries(cfg, occ, pre, b))
        ))
    case SFieldGroup(fname, occ, terms, b) =>
      val rf = resolveField(cfg, fname)
      if (cfg.isKnownField(rf)) {
        val inner = terms.map { case (o, pt) => (Occur.Should, fieldTermQuery(cfg, rf, o, pt, b)) }
        val group = BooleanQuery(inner)
        occ match {
          case Occur.Should => group
          case o            => BooleanQuery(Seq((o, group)))
        }
      } else if (cfg.findJsonPath(rf).isDefined) {
        val (jf, path) = cfg.findJsonPath(rf).get
        val inner: Seq[(Occur, Query)] = terms.map { case (o, pt) =>
          val clauses: Seq[(Occur, Query)] =
            jsonPreTermQueries(cfg, jf, path, pt, b).map(q => (o, q))
          (Occur.Should, BooleanQuery(clauses))
        }
        val group = BooleanQuery(inner)
        occ match {
          case Occur.Should => group
          case o            => BooleanQuery(Seq((o, group)))
        }
      } else if (isExcluded(cfg, fname)) EmptyQuery
      else {
        val parts = (Occur.Should, defaultFieldQueries(cfg, Occur.Should, PWord(fname), b)) +:
          terms.map { case (o, pt) => (Occur.Should, defaultFieldQueries(cfg, o, pt, b)) }
        val group = BooleanQuery(parts)
        occ match {
          case Occur.Should => group
          case o            => BooleanQuery(Seq((o, group)))
        }
      }
    case SFieldStar(fname, b) =>
      val rf = resolveField(cfg, fname)
      if (cfg.isKnownField(rf) || cfg.fastFields.contains(rf)) ExistsQuery(rf)
      else if (cfg.findJsonPath(rf).isDefined) {
        // json path-exists (reference `exists_query.rs:92-98` json range
        // scan): all terms of the path live in [path+Sep, path+SepNext)
        val (jf, path) = cfg.findJsonPath(rf).get
        jsonRangeQuery(jf, path, None, None)
      } else if (isExcluded(cfg, fname)) EmptyQuery
      else defaultFieldQueries(cfg, Occur.Should, PWord(fname), b)
    case SIsbn(text) =>
      // isbn mapper: strip dashes (`term_field_mappers.rs:44-128`)
      val qs = cfg.termFieldMappers.getOrElse("isbn", Nil).map { f =>
        (Occur.Should, TermQuery(f, text.replace("-", "")): Query)
      }
      BooleanQuery(qs) // reduces to Empty when no mapper configured
    case SDoi(text) =>
      val doiQs = cfg.termFieldMappers.getOrElse("doi", Nil).map { f =>
        (Occur.Should, TermQuery(f, text): Query)
      }
      // doi_isbn mapper: a DOI whose suffix embeds a (cbo-prefixed) ISBN-13
      val isbnQs = DoiIsbn.findFirstMatchIn(text).toSeq.flatMap { m =>
        val isbn = m.group(2).replace("-", "")
        cfg.termFieldMappers.getOrElse("doi_isbn", Nil).map { f =>
          (Occur.Should, TermQuery(f, isbn): Query)
        }
      }
      BooleanQuery(doiQs ++ isbnQs)
  }

  /** DOI-embedded ISBN: `10.nnnn/(cbo)?978<10 digits, dashes allowed>`. */
  private val DoiIsbn = """^10\.\d{4,9}\s*/\s*(cbo)?(978(?:-?\d){10})""".r

  /** Plain top-level words (Should, unboosted) — the exact-matches-promoter
    * input (`summa_ql.rs:565-584`).
    */
  private def topLevelPhrase(stmts: Seq[Stmt]): Option[String] = {
    val words = stmts.collect {
      case STerm(Occur.Should, PWord(w), None) => Some(w)
      case _                                   => None
    }
    if (words.nonEmpty && words.forall(_.isDefined)) Some(words.flatten.mkString(" "))
    else None
  }

  // ------------------------------------------------------------- rewrites

  /** Flatten should-nested booleans, unwrap single-should (`summa_ql.rs:139-161`). */
  def reduceShouldClause(q: Query): Query = q match {
    case BooleanQuery(clauses, msm) =>
      val out = clauses.flatMap {
        case (Occur.Should, c) =>
          reduceShouldClause(c) match {
            case BooleanQuery(inner, _) => inner.map { case (o, iq) => (o, reduceShouldClause(iq)) }
            case other                  => Seq((Occur.Should, other))
          }
        case (o, c) => Seq((o, reduceShouldClause(c)))
      }
      out match {
        case Seq((Occur.Should, single)) => single
        case _                           => BooleanQuery(out, msm)
      }
    case other => other
  }

  /** Prune Empty children; empty boolean → Empty (`summa_ql.rs:163-182`).
    * Bottom-up: a Must clause reducing to Empty empties the whole boolean
    * (matching tantivy execution of a must-empty clause); Should/MustNot
    * empties are dropped.
    */
  def reduceEmptyQueries(q: Query): Query = q match {
    case BooleanQuery(clauses, msm) =>
      val reduced = clauses.map { case (o, c) => (o, reduceEmptyQueries(c)) }
      if (reduced.exists { case (o, c) => o == Occur.Must && c == EmptyQuery }) EmptyQuery
      else {
        val kept = reduced.filter(_._2 != EmptyQuery)
        if (kept.isEmpty) EmptyQuery else BooleanQuery(kept, msm)
      }
    case other => other
  }

  // ----------------------------------------------------------------- parse

  def parse(query: String, cfg: Config): Query = {
    val stmts = new P(query).readStatements()
    var subqueries: Seq[(Occur, Query)] =
      stmts.map(st => (Occur.Should, statementQuery(cfg, st)))

    for {
      promoter <- cfg.exactMatchesPromoter
      phrase <- topLevelPhrase(stmts)
    } {
      val fields = if (promoter.fields.isEmpty) cfg.defaultFields else promoter.fields
      subqueries = subqueries ++ fields.flatMap { f0 =>
        val f = resolveField(cfg, f0)
        if (!cfg.schema.exists(_.field(f).isDefined)) None
        else {
          val toks = Analyzers(cfg.analyzerOf(f)).tokenize(phrase)
          if (toks.size > 1 && cfg.hasPositions(f)) {
            val pq = PhraseQuery(f, toks.map(t => (t.position, t.text)), promoter.slop)
            Some((Occur.Should, boosted(pq, multiplyBoosts(promoter.boost, cfg.fieldBoosts.get(f)))))
          } else None
        }
      }
    }

    val q = BooleanQuery(subqueries.take(cfg.termLimit))
    reduceEmptyQueries(reduceShouldClause(q))
  }
}
