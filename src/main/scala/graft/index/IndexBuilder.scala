package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.Analyzers

/** Distributed inverted-index builder.
  *
  * Reference lifecycle analog: ingest → segment build → commit
  * (`/root/reference/summa-core/src/components/index_writer_holder.rs:391-423`),
  * re-expressed as a Spark pipeline:
  *
  *  1. segment assignment: `segment_id = offset + pmod(xxhash64(key), n)` —
  *     content-addressed, independent of parallelism;
  *  2. docId assignment: rank of key within segment via range-partition +
  *     in-partition sort + two-pass offset computation (no single-task sort,
  *     no Window over a whole segment — scales to arbitrarily large
  *     segments). DocIds are a pure function of the data, so N-core and
  *     4N-core builds produce identical ids (BASELINE scaling criterion);
  *  3. tokenize once per document (analyzer per field), carrying per-doc
  *     term groups as array columns;
  *  4. posting blocks: `block_id = doc_id >>> blockBits`, so block assignment
  *     needs no global rank and a head term (stop-word-scale df) shards
  *     across thousands of `(term, block_id)` shuffle keys — block keying IS
  *     the skew salt; pack groups are bounded by the block doc-range;
  *  5. outputs written sorted by `(field, term)` within each segment dir so
  *     Parquet row-group stats give FST-like term-range pruning for free;
  *  6. visibility via [[Snapshots]] (Iceberg-style atomic version commit);
  *     stats are per-segment so merges/deletes never rewrite global state.
  *
  * Layout under `indexDir/`:
  * {{{
  *   docs/segment_id=N/       one row per doc: key, stored fields, per-field len+norm
  *   postings/segment_id=N/   packed posting blocks, term-sorted
  *   termstats/segment_id=N/  (field, term, df, total_tf) per segment
  *   fieldstats/segment_id=N/ (field, n_docs, total_tokens) per segment
  *   deletes/segment_id=N/    tombstone doc_ids; merges drop whole partitions
  *   metrics/                 append-only lineage: one row per (build_id, segment_id)
  *   _snapshots/vNNNNNN.json  live-segment snapshot versions
  * }}}
  */
object IndexBuilder {

  final case class BuildConf(
      numSegments: Int = 8,
      blockBits: Int = 10,
      buildPartitions: Int = 0, // 0 = spark.sql.shuffle.partitions
      persist: StorageLevel = StorageLevel.MEMORY_AND_DISK
  )

  /** Per-segment doc/token totals observed during the docs write. */
  final case class SegStat(segmentId: Int, nDocs: Long, tokensByField: Map[String, Long])

  /** Per-term group inside one document field. `positions` is the doc's
    * position list pre-packed to the block delta-varint layout
    * ([[PostingCodec.packDocPositions]]) so shuffles and the columnar cache
    * move ~1-2 bytes per occurrence, not a boxed int array.
    */
  final case class TermGroup(term: String, tf: Int, positions: Array[Byte])
  /** Analyzed field: token count, quantized fieldnorm id, term groups
    * (sorted by term).
    */
  final case class TokField(len: Int, norm: Int, terms: Array[TermGroup])

  /** One caller-provided token for the pre-tokenized input path — the
    * Spark-native shape of a tantivy `PreTokenizedString` entry
    * (`summa_document.rs:150-160`). Byte offsets are not retained: the
    * index stores positions only.
    */
  final case class PreToken(position: Int, text: String)

  /** The FLAT analyzed-field shape the build pipeline carries: primitive
    * byte blobs instead of an array of [[TermGroup]] structs. Catalyst
    * encodes this far faster than the nested shape, and building it directly
    * from the accumulator map allocates no intermediate TermGroup objects —
    * allocation churn is the memory-bandwidth tax the wide build pays
    * hardest. Terms travel as ONE UTF-8 blob + offsets rather than
    * `array<string>`, and ALL int arrays (term offsets, tfs, position
    * offsets) travel packed inside the varint `meta` section rather than
    * `array<int>` columns: an `array<int>` crosses the external-Row boundary
    * of the pack's mapPartitions through a boxed MapObjects loop (a measured
    * ~27% of the pack's fill cpu in JFR), while a binary column is a single
    * memcpy each way and is consumed by absolute-offset int reads.
    *
    * `blob` layout — the THREE former byte columns (varint meta, UTF-8 term
    * bytes, packed positions) fused into ONE binary column:
    * `[varint metaLen][varint termsLen][meta][termBytes][posFlat]`. A
    * binary struct field costs one defensive copy per row access at the
    * pack's external-Row boundary (`UnsafeRow.getBinary`), so one fused
    * column is one copy + one allocation per (doc, field) instead of three
    * (a measured allocation hot spot at the contended wide phase). The meta
    * section (LEB128 varints — term lengths, tfs and position-run lengths
    * are single-digit-byte values, so varints cut it ~4× vs fixed 4-byte
    * ints): `[k]` then per term `[termLen][tf][posLen]`, consumed
    * SEQUENTIALLY by the pack straight out of the blob (the two header
    * varints give the section bases up front, so decoding stays one-pass).
    * Term i's UTF-8 bytes are `termBase + [termOff(i), termOff(i+1))`
    * (offsets = prefix sums of the lengths); its packed delta-varint
    * positions are `posBase + [posOff(i), posOff(i+1))`.
    */
  final case class TokFlat(len: Int, norm: Int, blob: Array[Byte]) {
    /** Decode the header + meta stream once, lazily (test/debug surface —
      * the pipeline streams it with a reused [[IndexBuilder.MetaReader]];
      * encoders only see the constructor fields, so the memo never travels).
      * Offsets are section-relative: (termBase, posBase, termOff, tfs,
      * posOff).
      */
    private lazy val decode: (Int, Int, Array[Int], Array[Int], Array[Int]) = {
      val r = new MetaReader
      r.reset(blob)
      val metaLen = r.next()
      val termsLen = r.next()
      val termBase = r.position + metaLen
      val posBase = termBase + termsLen
      val k = r.next()
      val termOff = new Array[Int](k + 1)
      val tfs = new Array[Int](k)
      val posOff = new Array[Int](k + 1)
      var i = 0
      while (i < k) {
        termOff(i + 1) = termOff(i) + r.next()
        tfs(i) = r.next()
        posOff(i + 1) = posOff(i) + r.next()
        i += 1
      }
      (termBase, posBase, termOff, tfs, posOff)
    }
    def termCount: Int = decode._3.length - 1
    def termOff(i: Int): Int = decode._3(i)
    def tf(i: Int): Int = decode._4(i)
    def posOff(i: Int): Int = decode._5(i)
    /** The term-bytes section (debug/test copy). */
    def termBytes: Array[Byte] =
      java.util.Arrays.copyOfRange(blob, decode._1, decode._2)
    /** The packed-positions section (debug/test copy). */
    def posFlat: Array[Byte] =
      java.util.Arrays.copyOfRange(blob, decode._2, blob.length)
    def term(i: Int): String = {
      val (base, _, o, _, _) = decode
      new String(blob, base + o(i), o(i + 1) - o(i),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def termsDecoded: Array[String] = Array.tabulate(termCount)(term)
    def posSlice(i: Int): Array[Byte] = {
      val (_, base, _, _, o) = decode
      java.util.Arrays.copyOfRange(blob, base + o(i), base + o(i + 1))
    }
  }

  /** Streaming LEB128 reader over a [[TokFlat]] meta blob; reused across
    * documents (one instance per pack partition, zero per-doc allocation).
    */
  final class MetaReader {
    private var b: Array[Byte] = null
    private var p = 0
    def reset(buf: Array[Byte]): Unit = { b = buf; p = 0 }
    /** Current read offset into the buffer (section-base arithmetic). */
    def position: Int = p
    def next(): Int = {
      // one-byte fast path: meta values (term lengths, tfs, position-run
      // lengths) are single-digit-byte in the common case, and this reader
      // is the pack's hottest frame — skip the shift bookkeeping for it
      val x: Int = b(p)
      if (x >= 0) { p += 1; return x }
      var v = x & 0x7F
      var shift = 7
      var q = p + 1
      var cont = true
      while (cont) {
        val y = b(q)
        q += 1
        v |= (y & 0x7F) << shift
        shift += 7
        cont = (y & 0x80) != 0
      }
      p = q
      v
    }
  }

  @inline private def varIntLen(v: Int): Int =
    if (v < 0x80) 1 else if (v < 0x4000) 2 else if (v < 0x200000) 3
    else if (v < 0x10000000) 4 else 5

  /** Append LEB128 varint; returns the new write position. */
  @inline private def putVarInt(b: Array[Byte], pos: Int, value: Int): Int = {
    var v = value
    var p = pos
    while ((v & 0xFFFFFF80) != 0) {
      b(p) = ((v & 0x7F) | 0x80).toByte; p += 1; v >>>= 7
    }
    b(p) = v.toByte
    p + 1
  }

  /** Assemble a [[TokFlat]] from decoded terms + parallel arrays (the
    * shared tail of every producer path): sizes both varint sections, then
    * writes header, meta, term bytes and positions into ONE exact-size
    * blob — a single allocation per (doc, field) on the analyze side to
    * mirror the single copy on the pack side.
    */
  private def mkTokFlat(len: Int, norm: Int, terms: Array[String],
      tfs: Array[Int], posFlat: Array[Byte], posOff: Array[Int]): TokFlat = {
    val k = terms.length
    val parts = new Array[Array[Byte]](k)
    var metaLen = varIntLen(k)
    var termsLen = 0
    var i = 0
    while (i < k) {
      val b = terms(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      parts(i) = b
      metaLen += varIntLen(b.length) + varIntLen(tfs(i)) +
        varIntLen(posOff(i + 1) - posOff(i))
      termsLen += b.length
      i += 1
    }
    val posLen = posOff(k)
    val blob = new Array[Byte](
      varIntLen(metaLen) + varIntLen(termsLen) + metaLen + termsLen + posLen)
    var p = putVarInt(blob, 0, metaLen)
    p = putVarInt(blob, p, termsLen)
    p = putVarInt(blob, p, k)
    i = 0
    while (i < k) {
      p = putVarInt(blob, p, parts(i).length)
      p = putVarInt(blob, p, tfs(i))
      p = putVarInt(blob, p, posOff(i + 1) - posOff(i))
      i += 1
    }
    i = 0
    while (i < k) {
      System.arraycopy(parts(i), 0, blob, p, parts(i).length)
      p += parts(i).length
      i += 1
    }
    System.arraycopy(posFlat, 0, blob, p, posLen)
    TokFlat(len, norm, blob)
  }

  /** Per-term accumulator for [[analyzeField]]: tf + the delta-varint
    * position bytes written INCREMENTALLY (byte-identical to
    * [[PostingCodec.packDocPositions]] over the collected array). Avoids the
    * per-token churn of the naive TreeMap[String, ArrayBuffer[Int]] grouping
    * — boxed Integers per position and tree nodes per insert were the
    * dominant allocation source of the tokenize phase, and allocation churn
    * is the memory-bandwidth tax the wide build pays hardest.
    */
  private final class TermAcc {
    var buf = new Array[Byte](8)
    var len = 0
    private var lastPos = 0
    var tf = 0
    /** Re-arm for reuse from the [[FusedAcc]] pool (buf capacity is kept). */
    def reset(): Unit = { len = 0; lastPos = 0; tf = 0 }
    def addPos(p: Int): Unit = {
      var v = if (tf == 0) p else p - lastPos
      lastPos = p
      tf += 1
      while ((v & ~0x7F) != 0) {
        if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
        buf(len) = ((v & 0x7F) | 0x80).toByte
        len += 1
        v >>>= 7
      }
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = v.toByte
      len += 1
    }
  }

  /** Tokenize one field value into term groups (deterministic order: terms
    * sorted by natural String order, positions in token order).
    */
  def analyzeField(analyzerName: String, value: String): TokField = {
    if (value == null) return TokField(0, 0, Array.empty)
    val toks = Analyzers(analyzerName).tokenize(value)
    groupTokens(toks.length, i => toks(i).text, i => toks(i).position)
  }

  /** Group caller-provided tokens into term groups, BYPASSING the analyzer —
    * the pre-tokenized string path (reference `summa_document.rs:150-160`:
    * a JSON object on a str field parses as a tantivy `PreTokenizedString`
    * and indexes its given tokens/positions verbatim). Fieldnorm = token
    * count, exactly like the analyzed path.
    */
  def analyzePreTokenized(toks: Seq[PreToken]): TokField = {
    // the position delta-varint accumulator requires non-decreasing
    // positions per term; tokens normally arrive in position order (tantivy
    // contract) but caller input is sorted defensively
    val arr = toks.sortBy(_.position).toIndexedSeq
    groupTokens(arr.length, i => arr(i).text, i => arr(i).position)
  }

  private def groupTokens(n: Int, text: Int => String, pos: Int => Int): TokField = {
    val m = accumulate(n, text, pos)
    val terms = sortedTerms(m)
    val groups = new Array[TermGroup](terms.length)
    var i = 0
    while (i < terms.length) {
      val acc = m.get(terms(i))
      groups(i) = TermGroup(terms(i), acc.tf, java.util.Arrays.copyOf(acc.buf, acc.len))
      i += 1
    }
    TokField(n, FieldNorm.encode(n.toLong), groups)
  }

  private def accumulate(
      n: Int, text: Int => String, pos: Int => Int): java.util.HashMap[String, TermAcc] = {
    val m = new java.util.HashMap[String, TermAcc]()
    var i = 0
    while (i < n) {
      val t = text(i)
      var acc = m.get(t)
      if (acc == null) { acc = new TermAcc; m.put(t, acc) }
      acc.addPos(pos(i))
      i += 1
    }
    m
  }

  private def sortedTerms(m: java.util.HashMap[String, TermAcc]): Array[String] = {
    val terms = m.keySet().toArray(new Array[String](m.size))
    java.util.Arrays.sort(terms.asInstanceOf[Array[AnyRef]])
    terms
  }

  private val EmptyTokFlat =
    mkTokFlat(0, 0, Array.empty, Array.empty, Array.empty, Array(0))

  /** Flat-shape tokenize for the build's hot path: same grouping semantics
    * as [[analyzeField]] (term-sorted, positions in token order, byte-
    * identical packed deltas) with zero intermediate group objects.
    *
    * Word-run analyzers stream through the [[graft.analysis.FusedTokenize]] /
    * [[FusedAcc]] pair (no Token objects, no filter-chain Vector copies, a
    * generation-stamped term table reused across documents); raw analyzers
    * take a closed-form single-token path; everything else (html/mmd/dict
    * bases, whose tokenizers need offsets and skip ranges) falls back to the
    * legacy chain. FusedAnalyzeSpec pins output equality across all routes.
    */
  def analyzeFieldFlat(analyzerName: String, value: String): TokFlat = {
    if (value == null) return EmptyTokFlat
    Analyzers.fusedByName.get(analyzerName) match {
      case Some(spec) =>
        val acc = fusedAccFor(analyzerName, spec)
        acc.reset()
        graft.analysis.FusedTokenize.run(spec.kind, value, acc)
        acc.result()
      case None if analyzerName == "raw" || analyzerName == "raw_ci" =>
        if (value.isEmpty) EmptyTokFlat
        else {
          val term = if (analyzerName == "raw_ci") value.toLowerCase else value
          // single token at position 0: packed position delta-varint = [0x00]
          mkTokFlat(1, FieldNorm.encode(1L),
            Array(term), Array(1), Array(0.toByte), Array(0, 1))
        }
      case None => analyzeFieldFlatLegacy(analyzerName, value)
    }
  }

  /** The pre-fusion flat tokenize (materializes the `Token` vector through
    * the full filter chain) — kept as the semantic reference for the fused
    * path and the route for complex tokenizer bases.
    */
  def analyzeFieldFlatLegacy(analyzerName: String, value: String): TokFlat = {
    if (value == null) return EmptyTokFlat
    val toks = Analyzers(analyzerName).tokenize(value)
    groupTokensFlat(toks.length, i => toks(i).text, i => toks(i).position)
  }

  // fused accumulators are stateful and reused per (thread, analyzer) — UDF
  // lambdas run on executor task threads, so a ThreadLocal registry gives
  // each task its own table with zero cross-doc allocation
  private val fusedTL: ThreadLocal[java.util.HashMap[String, FusedAcc]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, FusedAcc]())

  private def fusedAccFor(name: String, spec: Analyzers.FusedSpec): FusedAcc = {
    val m = fusedTL.get()
    var acc = m.get(name)
    if (acc == null) { acc = new FusedAcc(spec); m.put(name, acc) }
    acc
  }

  // reused copy target for the zero-String tokenize path (one buffer per
  // task thread, grown to the largest document seen)
  private val asciiBytesTL: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8 * 1024))

  /** Tokenize straight from the columnar engine's `UTF8String` — the hot
    * path's entry since the [[TokenizeFlatExpr]] switch. For fused word-run
    * analyzers over pure-ASCII text (the overwhelming web-text case) the
    * bytes are scanned in place via [[graft.analysis.FusedTokenize.runAscii]]
    * with zero String/char[] materialization; the first non-ASCII byte
    * falls back to the String-based [[analyzeFieldFlat]] route, which is
    * pinned output-identical by FusedAnalyzeSpec.
    */
  def analyzeFieldFlatUtf8(analyzerName: String, value: UTF8String): TokFlat = {
    if (value == null) return EmptyTokFlat
    Analyzers.fusedByName.get(analyzerName) match {
      case Some(spec) =>
        val n = value.numBytes
        var buf = asciiBytesTL.get()
        if (buf.length < n) {
          // doubled-power-of-two growth overflows to negative past 2^30 input
          // bytes — allocate exactly n for such (>1 GiB single-field) values
          val doubled = java.lang.Integer.highestOneBit(math.max(n - 1, 1)) * 2
          buf = new Array[Byte](if (doubled >= n) doubled else n)
          asciiBytesTL.set(buf)
        }
        value.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET)
        val acc = fusedAccFor(analyzerName, spec)
        acc.reset()
        if (graft.analysis.FusedTokenize.runAscii(buf, n, spec.kind, acc)) acc.result()
        else {
          acc.reset()
          graft.analysis.FusedTokenize.run(spec.kind, value.toString, acc)
          acc.result()
        }
      case None => analyzeFieldFlat(analyzerName, value.toString)
    }
  }

  private[index] val TokFlatType: StructType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("norm", IntegerType, nullable = false),
    StructField("blob", BinaryType, nullable = true)))

  /** Native tokenize expression for plain text fields: evaluates on the
    * engine's `UTF8String` directly, skipping the ScalaUDF input converter's
    * per-(doc,field) String + backing-array allocation and its output
    * converter layers (measured ~5% of 8c executor samples plus the GC/
    * bandwidth churn of ~1 text copy per document — the wide build phase's
    * known tax). Not codegen'd (neither was the ScalaUDF it replaces).
    * `foldable` keeps UnaryExpression's child-derived default: the call site
    * always feeds an attribute, so constant folding never fires there, and
    * folding a literal child on the driver would be harmless anyway.
    */
  final case class TokenizeFlatExpr(analyzerName: String, child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = TokFlatType
    override def nullable: Boolean = false // null input → EmptyTokFlat row
    override def prettyName: String = "tokenize_flat"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"tokenize_flat requires a string child, got ${child.dataType}")

    override def eval(input: InternalRow): Any = {
      val tf = analyzeFieldFlatUtf8(analyzerName, child.eval(input).asInstanceOf[UTF8String])
      val row = new GenericInternalRow(3)
      row.setInt(0, tf.len)
      row.setInt(1, tf.norm)
      row.update(2, tf.blob)
      row
    }

    override protected def withNewChildInternal(newChild: Expression): TokenizeFlatExpr =
      copy(child = newChild)
  }

  /** Streaming token accumulator: an open-addressed, generation-stamped
    * (term → [[TermAcc]]) table fed directly by [[graft.analysis
    * .FusedTokenize]]. Per steady-state document it allocates ONLY the
    * output blob: term keys live as byte slices in a reused pool (a String
    * key per first-seen distinct term plus its UTF-8 re-encode in the blob
    * assembler were a measured ~13% of build allocation volume — JFR
    * `accFor`/`mkTokFlat` sites — and allocation churn is the memory-
    * bandwidth tax the wide build pays hardest), so the table, the TermAcc
    * pool, the key pool and the lowercase/stop filters all run on reused
    * buffers.
    *
    * ASCII tokens lowercase in place (exactly `String.toLowerCase` for
    * ASCII input under any non-Turkic default locale — guarded below);
    * non-ASCII tokens fall back to the String-based chain, preserving
    * locale/special-casing semantics bit-for-bit with the legacy path.
    * Both paths key the SAME table: hashes follow the `String.hashCode`
    * convention over (byte & 0xFF), which coincides with the char-slice
    * hash for ASCII — so a term reachable via both routes (e.g. Kelvin-sign
    * K lowercasing to ASCII `k`) lands in one accumulator, and the ASCII
    * hot path's table layout (hence blob term order) is bit-identical to
    * the former String-keyed table's.
    */
  private final class FusedAcc(spec: Analyzers.FusedSpec) extends graft.analysis.TokenSink {
    import graft.analysis.FusedTokenize.StopChars

    private var cap = 256
    private var mask = cap - 1
    private var offs = new Array[Int](cap)
    private var lens = new Array[Int](cap)
    private var hs = new Array[Int](cap)
    private var accs = new Array[TermAcc](cap)
    private var gens = new Array[Int](cap)
    private var gen = 0
    private var size = 0
    private var survivors = 0

    // per-doc UTF-8 key bytes (reset rewinds, capacity kept across docs)
    private var termPool = new Array[Byte](1 << 12)
    private var poolEnd = 0
    // live-slot scratch for result()'s emit pass
    private var emit = new Array[Int](256)

    private var pool = new Array[TermAcc](64)
    private var poolN = 0
    private var poolUsed = 0

    def reset(): Unit = { gen += 1; size = 0; survivors = 0; poolUsed = 0; poolEnd = 0 }

    private def takeAcc(): TermAcc = {
      if (poolUsed < poolN) { val a = pool(poolUsed); poolUsed += 1; a.reset(); a }
      else {
        if (poolN == pool.length) pool = java.util.Arrays.copyOf(pool, poolN * 2)
        val a = new TermAcc
        pool(poolN) = a; poolN += 1; poolUsed += 1
        a
      }
    }

    @inline private def spread(h: Int): Int = h ^ (h >>> 16)

    private def grow(): Unit = {
      val oldOffs = offs; val oldLens = lens; val oldHs = hs
      val oldAccs = accs; val oldGens = gens; val oldCap = cap
      cap *= 2; mask = cap - 1
      offs = new Array[Int](cap); lens = new Array[Int](cap); hs = new Array[Int](cap)
      accs = new Array[TermAcc](cap); gens = new Array[Int](cap)
      // fresh gens array is all-0; live entries must carry the CURRENT gen,
      // which may be 0 only before any reset — bump to keep 0 meaning empty
      if (gen == 0) gen = 1
      var i = 0
      while (i < oldCap) {
        if (oldAccs(i) != null && oldGens(i) == gen) {
          var j = spread(oldHs(i)) & mask
          while (accs(j) != null && gens(j) == gen) j = (j + 1) & mask
          offs(j) = oldOffs(i); lens(j) = oldLens(i); hs(j) = oldHs(i)
          accs(j) = oldAccs(i); gens(j) = gen
        }
        i += 1
      }
    }

    private def growPool(need: Int): Unit = {
      var n = termPool.length
      while (n < need) n *= 2
      termPool = java.util.Arrays.copyOf(termPool, n)
    }

    /** Lookup-or-insert by ASCII char slice (hash pre-computed,
      * String.hashCode convention — equals the byte-slice hash for ASCII).
      */
    private def accFor(buf: Array[Char], len: Int, h: Int): TermAcc = {
      var i = spread(h) & mask
      while (true) {
        if (accs(i) == null || gens(i) != gen) {
          if ((size + 1) * 10 > cap * 7) { grow(); return accFor(buf, len, h) }
          val a = takeAcc()
          if (poolEnd + len > termPool.length) growPool(poolEnd + len)
          var j = 0
          while (j < len) { termPool(poolEnd + j) = buf(j).toByte; j += 1 }
          offs(i) = poolEnd; lens(i) = len; hs(i) = h
          poolEnd += len
          accs(i) = a; gens(i) = gen; size += 1
          return a
        }
        if (hs(i) == h && lens(i) == len) {
          val o = offs(i)
          var j = 0
          // a non-ASCII pool byte masks to >= 0x80 and can never equal an
          // ASCII char, so cross-route probes mismatch correctly
          while (j < len && (termPool(o + j) & 0xFF) == buf(j).toInt) j += 1
          if (j == len) return accs(i)
        }
        i = (i + 1) & mask
      }
      null // unreachable
    }

    /** Lookup-or-insert by UTF-8 byte array (the non-ASCII fallback route). */
    private def accForBytes(b: Array[Byte], h: Int): TermAcc = {
      val len = b.length
      var i = spread(h) & mask
      while (true) {
        if (accs(i) == null || gens(i) != gen) {
          if ((size + 1) * 10 > cap * 7) { grow(); return accForBytes(b, h) }
          val a = takeAcc()
          if (poolEnd + len > termPool.length) growPool(poolEnd + len)
          System.arraycopy(b, 0, termPool, poolEnd, len)
          offs(i) = poolEnd; lens(i) = len; hs(i) = h
          poolEnd += len
          accs(i) = a; gens(i) = gen; size += 1
          return a
        }
        if (hs(i) == h && lens(i) == len) {
          val o = offs(i)
          var j = 0
          while (j < len && termPool(o + j) == b(j)) j += 1
          if (j == len) return accs(i)
        }
        i = (i + 1) & mask
      }
      null // unreachable
    }

    /** String.hashCode convention over (byte & 0xFF) — coincides with the
      * char-slice hash for ASCII content.
      */
    private def hashBytes(b: Array[Byte]): Int = {
      var h = 0
      var i = 0
      while (i < b.length) { h = 31 * h + (b(i) & 0xFF); i += 1 }
      h
    }

    override def token(buf: Array[Char], len: Int, rawBytes: Int, pos: Int, ascii: Boolean): Unit = {
      if (spec.removeLong > 0 && rawBytes >= spec.removeLong) return
      if (ascii && FusedAcc.asciiLowerSafe) {
        if (spec.lower) {
          var i = 0
          while (i < len) {
            val c = buf(i)
            if (c >= 'A' && c <= 'Z') buf(i) = (c + 32).toChar
            i += 1
          }
        }
        val h = StopChars.hashOf(buf, len)
        if (spec.stop && StopChars.contains(buf, len, h)) return
        survivors += 1
        accFor(buf, len, h).addPos(pos)
      } else {
        var s = new String(buf, 0, len)
        if (spec.lower) s = s.toLowerCase
        if (spec.stop && graft.analysis.StopWords.All.contains(s)) return
        survivors += 1
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        accForBytes(b, hashBytes(b)).addPos(pos)
      }
    }

    /** Assemble the TokFlat in hash-table scan order — deliberately NOT
      * term-sorted. Per-doc term order is free here: the pack phase keys a
      * hash [[FragMap]] by term slice (doc-arrival order fixes each frag's
      * posting content) and the posting table is globally re-sorted on its
      * unique (segment, field, term, block, first_doc) key afterward, so the
      * final index bytes are identical either way; termstats/fieldstats are
      * order-free aggregates. Skipping the per-doc `Arrays.sort` +
      * sorted-order re-probe was a measured ~6% of build task cpu.
      * FusedAnalyzeSpec pins semantic equality with the (sorted) legacy
      * chain via canonicalized compare.
      */
    def result(): TokFlat = {
      val k = size
      if (k == 0) return mkTokFlat(survivors, FieldNorm.encode(survivors.toLong),
        Array.empty, Array.empty, Array.empty, Array(0))
      if (emit.length < k) emit = new Array[Int](math.max(k, emit.length * 2))
      // pass 1: gather live slots in table-scan order and size every blob
      // section — the blob below is the ONE allocation of a steady-state doc
      var metaLen = varIntLen(k)
      var termsLen = 0
      var posLen = 0
      var i = 0; var t = 0
      while (i < cap) {
        if (accs(i) != null && gens(i) == gen) {
          emit(t) = i; t += 1
          val acc = accs(i)
          metaLen += varIntLen(lens(i)) + varIntLen(acc.tf) + varIntLen(acc.len)
          termsLen += lens(i)
          posLen += acc.len
        }
        i += 1
      }
      val blob = new Array[Byte](
        varIntLen(metaLen) + varIntLen(termsLen) + metaLen + termsLen + posLen)
      var p = putVarInt(blob, 0, metaLen)
      p = putVarInt(blob, p, termsLen)
      p = putVarInt(blob, p, k)
      i = 0
      while (i < k) {
        val s = emit(i)
        p = putVarInt(blob, p, lens(s))
        p = putVarInt(blob, p, accs(s).tf)
        p = putVarInt(blob, p, accs(s).len)
        i += 1
      }
      i = 0
      while (i < k) {
        val s = emit(i)
        System.arraycopy(termPool, offs(s), blob, p, lens(s))
        p += lens(s)
        i += 1
      }
      i = 0
      while (i < k) {
        val a = accs(emit(i))
        System.arraycopy(a.buf, 0, blob, p, a.len)
        p += a.len
        i += 1
      }
      TokFlat(survivors, FieldNorm.encode(survivors.toLong), blob)
    }
  }

  private object FusedAcc {
    /** In-place ASCII lowercasing equals `String.toLowerCase` under every
      * default locale except Turkic ones (tr/az map dotted/dotless I
      * specially even for ASCII input).
      */
    val asciiLowerSafe: Boolean = {
      val l = java.util.Locale.getDefault.getLanguage
      l != "tr" && l != "az"
    }
  }

  private def groupTokensFlat(n: Int, text: Int => String, pos: Int => Int): TokFlat = {
    val m = accumulate(n, text, pos)
    val terms = sortedTerms(m)
    val k = terms.length
    val tfs = new Array[Int](k)
    val posOff = new Array[Int](k + 1)
    var total = 0
    var i = 0
    while (i < k) {
      val acc = m.get(terms(i))
      tfs(i) = acc.tf
      posOff(i) = total
      total += acc.len
      i += 1
    }
    posOff(k) = total
    val posFlat = new Array[Byte](total)
    i = 0
    while (i < k) {
      val acc = m.get(terms(i))
      System.arraycopy(acc.buf, 0, posFlat, posOff(i), acc.len)
      i += 1
    }
    mkTokFlat(n, FieldNorm.encode(n.toLong), terms, tfs, posFlat, posOff)
  }

  /** Nested → flat conversion for the cold token paths (json / bytes / ip
    * analyzers return the nested shape).
    */
  def toFlat(tf: TokField): TokFlat = {
    val k = tf.terms.length
    val terms = new Array[String](k)
    val tfs = new Array[Int](k)
    val posOff = new Array[Int](k + 1)
    var total = 0
    var i = 0
    while (i < k) {
      terms(i) = tf.terms(i).term
      tfs(i) = tf.terms(i).tf
      posOff(i) = total
      total += tf.terms(i).positions.length
      i += 1
    }
    posOff(k) = total
    val posFlat = new Array[Byte](total)
    i = 0
    while (i < k) {
      System.arraycopy(tf.terms(i).positions, 0, posFlat, posOff(i), tf.terms(i).positions.length)
      i += 1
    }
    mkTokFlat(tf.len, tf.norm, terms, tfs, posFlat, posOff)
  }

  /** The canonical doc-order shuffle feeding [[assignDocIds]]: range
    * partition + in-partition sort on (segment, key). `projection` (e.g.
    * tokenization) is applied AFTER the sort so analysis runs exactly once,
    * during pass-1 materialization — the RangePartitioner sampling pass only
    * re-executes the cheap pre-projection scan, never the analyzers.
    * (A hash-sharded doc order was tried and reverted: deterministic and
    * sampling-free, but per-shard-ragged posting blocks inflated fragment
    * counts ~30% and shard-count imbalance straggled the wide build.)
    */
  def shardAndSort(
      df: DataFrame, parts: Int, projection: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.repartitionByRange(parts, col("segment_id"), col("__key"))
      .sortWithinPartitions(col("segment_id"), col("__key"))
      .select(projection: _*)

  /** Assign dense per-segment docIds = rank of `__key` within `segment_id`:
    * range-partition + in-partition sort, then a two-pass offset computation
    * (pass 1 counts rows per (partition, segment); pass 2 is PURE
    * EXPRESSIONS). `df` must come from [[shardAndSort]] and is persisted as
    * the single materialized intermediate of the build.
    *
    * Pass 2 stays declarative on purpose: `monotonically_increasing_id()`
    * exposes each row's in-partition sequence number (low 33 bits), and a
    * broadcast-joined per-(partition, segment) delta rebases it to the
    * global rank — `doc_id = seq + (globalStart − localStart)`. Segments are
    * contiguous within a partition (the sort is `(segment_id, __key)`), so
    * both starts come from the pass-1 counts. An earlier mapPartitions
    * implementation computed the same ids imperatively but acted as a
    * column-pruning barrier: every downstream consumer (the narrow docs
    * write, the pack) paid a full external-Row decode + rebuild of the whole
    * cached row. As expressions, Catalyst prunes the cache scan per consumer
    * and the id math is whole-stage codegen'd. The 33-bit sequence bounds a
    * build partition at 8.6 B rows — orders of magnitude above the partition
    * sizes any sane `buildPartitions` yields at 100 TB.
    *
    * `extraAggs` piggy-back on the pass-1 aggregation (e.g. per-segment
    * token totals): the cache-materializing scan is already paying for the
    * group-by, so segment stats ride along for free instead of re-scanning
    * (or observing during) the docs write.
    *
    * @return (df-with-ids, persisted handle, total rows, pass-1 agg rows
    *         keyed by segment: segment_id -> (count, extra agg values))
    */
  def assignDocIds(
      df: DataFrame,
      parts: Int,
      level: StorageLevel,
      extraAggs: Seq[org.apache.spark.sql.Column] = Nil
  ): (DataFrame, DataFrame, Long, Map[Int, Row]) = {
    val spark = df.sparkSession
    // the partition id is stamped as a column at materialization time — a
    // TaskContext-based id would be wrong when this plan is later embedded
    // under a union (task partition ids shift per branch)
    val sorted = df.withColumn("__pid", spark_partition_id()).persist(level)

    // pass 1: rows per (physical partition, segment) — small driver table
    val pass1 = sorted
      .groupBy("__pid", "segment_id")
      .agg(count(lit(1)).as("__n"), extraAggs: _*)
      .collect()
    val counts = pass1
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))

    // per-segment rollup of the piggy-backed aggs (sum over shards)
    val segAggRows: Map[Int, Row] =
      if (extraAggs.isEmpty) Map.empty
      else pass1
        .groupBy(_.getInt(1))
        .map { case (seg, rs) =>
          val nExtra = extraAggs.size
          val sums = Array.fill[Long](nExtra + 1)(0L)
          rs.foreach { r =>
            sums(0) += r.getLong(2)
            var i = 0
            while (i < nExtra) {
              if (!r.isNullAt(3 + i)) sums(1 + i) += r.getLong(3 + i)
              i += 1
            }
          }
          seg -> Row.fromSeq(sums.toSeq)
        }

    // global start of each (pid, segment): sum of the segment's counts in
    // earlier pids
    val bySeg = counts.groupBy(_._1._2)
    val offsets: Map[(Int, Int), Long] = bySeg.flatMap { case (seg, cs) =>
      var acc = 0L
      cs.sortBy(_._1._1).map { case ((pid, _), n) =>
        val r = ((pid, seg), acc)
        acc += n
        r
      }
    }
    // local start of each (pid, segment): rows of lower-numbered segments in
    // the same partition (segments are contiguous in segment_id order within
    // a sorted partition)
    val byPid = counts.groupBy(_._1._1)
    val localStarts: Map[(Int, Int), Long] = byPid.flatMap { case (pid, cs) =>
      var acc = 0L
      cs.sortBy(_._1._2).map { case ((_, seg), n) =>
        val r = ((pid, seg), acc)
        acc += n
        r
      }
    }
    val deltas = offsets.toSeq.map { case ((pid, seg), gStart) =>
      (pid, seg, gStart - localStarts((pid, seg)))
    }
    import spark.implicits._
    val deltaDf = deltas.toDF("__pid", "segment_id", "__delta")

    // restore the caller's column order (a using-columns join fronts the
    // keys): contract stays "input columns minus __pid, doc_id appended"
    val outCols = df.columns.map(col).toSeq :+ col("doc_id")
    val withIds = sorted
      .withColumn("__seq", monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .join(broadcast(deltaDf), Seq("__pid", "segment_id"))
      .withColumn("doc_id", (col("__seq") + col("__delta")).cast(IntegerType))
      .select(outCols: _*)
    (withIds, sorted, counts.map(_._2).sum, segAggRows)
  }

  val packSchema: StructType = StructType(Seq(
    StructField("field", StringType, false),
    StructField("term", StringType, false),
    StructField("segment_id", IntegerType, false),
    StructField("block_id", IntegerType, false),
    StructField("doc_count", IntegerType, false),
    StructField("first_doc", IntegerType, false),
    StructField("last_doc", IntegerType, false),
    StructField("block_max_tf", IntegerType, false),
    StructField("block_min_norm", IntegerType, false),
    StructField("sum_tf", LongType, false),
    StructField("doc_ids", BinaryType, false),
    StructField("tfs", BinaryType, false),
    StructField("norms", BinaryType, false),
    StructField("positions", BinaryType, true),
    StructField("posting_bytes", LongType, false)
  ))

  /** Pack token rows `(segment_id, doc_id, field, term, tf, norm_id,
    * positions)` into posting-block rows via ONE range shuffle keyed by
    * (segment, field, term, block): block keying spreads head terms across
    * ~(docs/blockSpan) keys (skew salt), range partitioning gives term-sorted
    * output files (Parquet stats pruning), and the streaming sort-merge pack
    * replaces an object hash aggregate (no per-group buffers, fully
    * spillable Tungsten sort). Shared by fresh builds and segment merges.
    */
  def packPostings(
      tokens: DataFrame,
      blockBits: Int,
      parts: Int,
      recordPositions: Map[String, Boolean]
  ): DataFrame = {
    val spark = tokens.sparkSession
    val bcRecPos = spark.sparkContext.broadcast(recordPositions)
    val parted = tokens
      .select(
        col("segment_id"), col("doc_id"), col("field"), col("term"),
        col("tf"), col("norm_id"), col("positions"))
      .withColumn("block_id", shiftright(col("doc_id"), blockBits).cast(IntegerType))
      // hash, not range: RangePartitioning's sampling job would execute the
      // upstream plan (for merges: the posting unpack + rebase join) twice
      .repartition(parts, col("segment_id"), col("field"), col("term"), col("block_id"))
      .sortWithinPartitions("segment_id", "field", "term", "block_id", "doc_id")

    parted.mapPartitions { rows =>
      val recPos = bcRecPos.value
      new Iterator[Row] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val head = it.head
          val seg = head.getInt(0)
          val field = head.getString(2)
          val term = head.getString(3)
          val blockId = head.getInt(7)
          val docIds = new scala.collection.mutable.ArrayBuffer[Int](64)
          val tfs = new scala.collection.mutable.ArrayBuffer[Int](64)
          val norms = new scala.collection.mutable.ArrayBuffer[Int](64)
          val poss = new scala.collection.mutable.ArrayBuffer[Array[Byte]](64)
          var posLen = 0
          val withPos = recPos.getOrElse(field, false)
          var more = true
          while (more && it.hasNext) {
            val r = it.head
            if (r.getInt(0) == seg && r.getString(2) == field && r.getString(3) == term &&
                r.getInt(7) == blockId) {
              it.next()
              docIds += r.getInt(1)
              tfs += r.getInt(4)
              norms += r.getInt(5)
              if (withPos) {
                val pb = r.getAs[Array[Byte]](6)
                poss += pb
                posLen += pb.length
              }
            } else more = false
          }
          val docIdsA = docIds.toArray
          val tfsA = tfs.toArray
          val docIdsB = PostingCodec.packDocIds(docIdsA)
          val tfsB = PostingCodec.packVarInts(tfsA)
          val normsB = norms.map(_.toByte).toArray
          // block positions = concatenation of the pre-packed per-doc runs
          // (bit-identical to packing the decoded arrays here)
          val posB = if (withPos) {
            val b = new Array[Byte](posLen)
            var o = 0
            poss.foreach { pb => System.arraycopy(pb, 0, b, o, pb.length); o += pb.length }
            b
          } else null
          val bytes = docIdsB.length.toLong + tfsB.length + normsB.length +
            (if (posB == null) 0 else posB.length)
          Row(
            field, term, seg, blockId,
            docIdsA.length, docIdsA.head, docIdsA.last,
            tfsA.max, norms.min,
            tfsA.map(_.toLong).sum,
            docIdsB, tfsB, normsB, posB, bytes
          )
        }
      }
    }(Encoders.row(packSchema))
  }

  /** Growable primitive int buffer — `ArrayBuffer[Int]` boxes every append,
    * and the pack phase appends 2 ints per posting; at 10^12 postings the
    * box garbage is pure memory-bandwidth tax on the widest phase (the
    * measured cause of the 8c scaling loss).
    */
  private final class IntBuf(initial: Int) {
    private var a = new Array[Int](initial)
    private var n = 0
    def +=(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v; n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
    def clear(): Unit = n = 0
  }

  /** One in-progress posting fragment: the postings of one (field, term)
    * within the current (segment, block) of one input partition. Pooled and
    * reused across blocks by [[FragMap]] (buffer capacity is retained).
    * norms/pos are [[PostingCodec.ByteVec]]s (primitive, bulk-append with an
    * inline short-copy fast path — position slices copy straight in, no
    * boxed `ArrayBuffer[Byte]` and no per-posting chunk array).
    */
  private final class Frag(withPos: Boolean) {
    val docIds = new IntBuf(8)
    val tfs = new IntBuf(8)
    val norms = new PostingCodec.ByteVec(8)
    val pos: PostingCodec.ByteVec = if (withPos) new PostingCodec.ByteVec(16) else null
    var maxTf = 0
    var minNorm = 255
    var sumTf = 0L
    def reset(): Unit = {
      docIds.clear(); tfs.clear(); norms.clear()
      if (pos != null) pos.clear()
      maxTf = 0; minNorm = 255; sumTf = 0L
    }
  }

  /** Open-addressed (term-bytes → [[Frag]]) table for the map-side pack,
    * addressable by a slice of a document's term blob — no String (or key
    * copy) is allocated per posting occurrence, only one copied byte-array
    * key + one pooled Frag per distinct term per (segment, block). Cleared
    * per block via a generation stamp (no array zeroing); Frags are pooled
    * with retained buffer capacity, so steady-state blocks allocate almost
    * nothing but the emitted output rows.
    */
  private final class FragMap(withPos: Boolean) {
    private var cap = 512
    private var mask = cap - 1
    private var keys = new Array[Array[Byte]](cap)
    private var frags = new Array[Frag](cap)
    private var gens = new Array[Int](cap)
    private var gen = 0
    private var size = 0
    private var pool = new Array[Frag](64)
    private var poolN = 0
    private var poolUsed = 0

    def clear(): Unit = { gen += 1; size = 0; poolUsed = 0 }

    @inline private def spread(h: Int): Int = h ^ (h >>> 16)

    private def hashBytes(a: Array[Byte], from: Int, until: Int): Int = {
      var h = 0
      var i = from
      while (i < until) { h = 31 * h + a(i); i += 1 }
      h
    }

    private def takeFrag(): Frag = {
      if (poolUsed < poolN) { val f = pool(poolUsed); poolUsed += 1; f.reset(); f }
      else {
        if (poolN == pool.length) pool = java.util.Arrays.copyOf(pool, poolN * 2)
        val f = new Frag(withPos)
        pool(poolN) = f; poolN += 1; poolUsed += 1
        f
      }
    }

    private def grow(): Unit = {
      val oldKeys = keys; val oldFrags = frags; val oldGens = gens; val oldCap = cap
      cap *= 2; mask = cap - 1
      keys = new Array[Array[Byte]](cap); frags = new Array[Frag](cap); gens = new Array[Int](cap)
      if (gen == 0) gen = 1
      var i = 0
      while (i < oldCap) {
        if (oldKeys(i) != null && oldGens(i) == gen) {
          var j = spread(hashBytes(oldKeys(i), 0, oldKeys(i).length)) & mask
          while (keys(j) != null && gens(j) == gen) j = (j + 1) & mask
          keys(j) = oldKeys(i); frags(j) = oldFrags(i); gens(j) = gen
        }
        i += 1
      }
    }

    /** Lookup-or-insert by blob slice. */
    def fragFor(blob: Array[Byte], from: Int, until: Int): Frag = {
      val h = hashBytes(blob, from, until)
      val len = until - from
      var i = spread(h) & mask
      while (true) {
        val k = keys(i)
        if (k == null || gens(i) != gen) {
          if ((size + 1) * 10 > cap * 7) { grow(); return fragFor(blob, from, until) }
          keys(i) = java.util.Arrays.copyOfRange(blob, from, until)
          val f = takeFrag()
          frags(i) = f; gens(i) = gen; size += 1
          return f
        }
        if (k.length == len) {
          var j = 0
          while (j < len && k(j) == blob(from + j)) j += 1
          if (j == len) return frags(i)
        }
        i = (i + 1) & mask
      }
      null // unreachable
    }

    /** Iterate live entries (order arbitrary — the fragment shuffle sorts). */
    def forEach(f: (Array[Byte], Frag) => Unit): Unit = {
      var i = 0
      while (i < cap) {
        if (keys(i) != null && gens(i) == gen) f(keys(i), frags(i))
        i += 1
      }
    }
  }

  /** Map-side posting pack over the analyzed doc partitions (the classic
    * inverted-index combiner): each input partition holds docs SORTED by
    * (segment_id, doc_id) with contiguous docId ranges, so posting blocks
    * (`block_id = doc_id >>> blockBits`) can be assembled in memory one
    * block at a time and emitted as packed fragments — the shuffle then
    * moves ~one binary row per (term, block) instead of one row per
    * (doc, term) occurrence. For a head term this is a ~blockSpan× shuffle
    * reduction; it is what keeps build scaling flat when postings dominate
    * (at 10^12 docs the per-posting shuffle was the memory-bandwidth
    * bottleneck at every core count).
    *
    * A block whose docId range straddles an input-partition boundary yields
    * one fragment per partition; the reduce side merges consecutive
    * fragments after a range shuffle on (segment, field, term, block) —
    * fragments never interleave (partitions hold disjoint contiguous doc
    * ranges), so the merged block bytes are IDENTICAL to a single-pass pack:
    * only the absolute first docId varint of each later run is rewritten as
    * a delta.
    */
  def packFromAnalyzed(
      analyzed: DataFrame,
      fields: Seq[FieldDef],
      blockBits: Int,
      parts: Int,
      recordPositions: Map[String, Boolean]
  ): DataFrame = {
    val inSchema = analyzed.schema
    val segIdx = inSchema.fieldIndex("segment_id")
    val docIdx = inSchema.fieldIndex("doc_id")
    val fieldNames = fields.map(_.name).toArray
    val tokIdxs = fieldNames.map(n => inSchema.fieldIndex(s"__tok_$n"))
    val withPosArr = fieldNames.map(n => recordPositions.getOrElse(n, false))
    val nFields = fieldNames.length

    val fragments = analyzed.mapPartitions { rows =>
      new Iterator[Row] {
        private val pending = new java.util.ArrayDeque[Row]()
        private val maps = withPosArr.map(new FragMap(_))
        private val metaReader = new MetaReader
        private var curSeg = Int.MinValue
        private var curBlock = Int.MinValue
        private var finalFlushDone = false

        private def emit(fi: Int, term: Array[Byte], f: Frag, seg: Int, block: Int): Row = {
          val docIdsA = f.docIds.toArray
          val docIdsB = PostingCodec.packDocIds(docIdsA)
          val tfsB = PostingCodec.packVarInts(f.tfs.toArray)
          val normsB = f.norms.toArray
          val posB = if (f.pos == null) null else f.pos.toArray
          val bytes = docIdsB.length.toLong + tfsB.length + normsB.length +
            (if (posB == null) 0 else posB.length)
          Row(fieldNames(fi), new String(term, java.nio.charset.StandardCharsets.UTF_8),
            seg, block,
            docIdsA.length, docIdsA(0), docIdsA(docIdsA.length - 1),
            f.maxTf, f.minNorm, f.sumTf,
            docIdsB, tfsB, normsB, posB, bytes)
        }

        private def flushAll(seg: Int, block: Int): Unit = {
          var fi = 0
          while (fi < nFields) {
            maps(fi).forEach((term, frag) => { pending.add(emit(fi, term, frag, seg, block)); () })
            maps(fi).clear()
            fi += 1
          }
        }

        private def fill(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val r = rows.next()
            val seg = r.getInt(segIdx)
            val doc = r.getInt(docIdx)
            val block = doc >>> blockBits
            if (seg != curSeg || block != curBlock) {
              // docs arrive in (segment, docId) order, so an ended block can
              // never receive postings again in this partition — flush it
              flushAll(curSeg, curBlock)
              curSeg = seg
              curBlock = block
            }
            var fi = 0
            while (fi < nFields) {
              val tok = r.getAs[Row](tokIdxs(fi))
              val norm = tok.getInt(1).toByte
              // everything crosses the Row boundary as ONE binary blob (one
              // memcpy + one allocation per (doc, field)): the term bytes
              // and position runs are consumed as raw slices of the blob,
              // and the per-term ints (term length / tf / position-run
              // length) stream out of its varint meta section — no boxed
              // MapObjects loop, no String decode per posting occurrence
              // anywhere in the pack. The two header varints give the
              // section bases, so the walk stays one-pass.
              val blob = tok.getAs[Array[Byte]](2)
              val withPos = withPosArr(fi)
              val m = maps(fi)
              metaReader.reset(blob)
              val metaLen = metaReader.next()
              val termsLen = metaReader.next()
              val termBase = metaReader.position + metaLen
              val nTerms = metaReader.next()
              var gi = 0
              var termFrom = termBase
              var posFrom = termBase + termsLen
              while (gi < nTerms) {
                val termUntil = termFrom + metaReader.next()
                val tf = metaReader.next()
                val posUntil = posFrom + metaReader.next()
                val frag = m.fragFor(blob, termFrom, termUntil)
                termFrom = termUntil
                frag.docIds += doc
                frag.tfs += tf
                frag.norms += norm
                if (tf > frag.maxTf) frag.maxTf = tf
                val ni = norm & 0xFF
                if (ni < frag.minNorm) frag.minNorm = ni
                frag.sumTf += tf
                if (withPos) frag.pos.append(blob, posFrom, posUntil)
                posFrom = posUntil
                gi += 1
              }
              fi += 1
            }
          }
          if (pending.isEmpty && !rows.hasNext && !finalFlushDone) {
            finalFlushDone = true
            flushAll(curSeg, curBlock)
          }
        }

        def hasNext: Boolean = { fill(); !pending.isEmpty }
        def next(): Row = { fill(); pending.poll() }
      }
    }(Encoders.row(packSchema))

    // reduce: HASH-shuffle the packed fragments on (segment, field, term) and
    // merge the (rare) partition-boundary splits; single-fragment blocks pass
    // through with zero decode. Hash, not range: RangePartitioning runs a
    // sampling job that would EXECUTE THE ENTIRE MAP-SIDE PACK A SECOND TIME
    // just to pick bounds. Hash keeps all of a term's blocks in one file per
    // segment, and the within-partition sort below keeps row-group min/max
    // stats tight for term-predicate pruning — the pruning queries actually
    // use; only cross-FILE range locality is given up.
    fragments
      .repartition(parts, col("segment_id"), col("field"), col("term"))
      .sortWithinPartitions("segment_id", "field", "term", "block_id", "first_doc")
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[Row] {
          def hasNext: Boolean = it.hasNext
          def next(): Row = {
            val head = it.next()
            if (!it.hasNext || !sameKey(head, it.head)) head
            else {
              val run = scala.collection.mutable.ArrayBuffer(head)
              while (it.hasNext && sameKey(head, it.head)) run += it.next()
              mergeFragments(run.toSeq)
            }
          }
        }
      }(Encoders.row(packSchema))
  }

  private def sameKey(a: Row, b: Row): Boolean =
    a.getInt(2) == b.getInt(2) && a.getInt(3) == b.getInt(3) &&
      a.getString(0) == b.getString(0) && a.getString(1) == b.getString(1)

  /** Merge fragments of one (segment, field, term, block), ordered by
    * first_doc: binary runs concatenate; only each later run's leading
    * absolute docId varint is rewritten as a delta from the previous run's
    * last docId — yielding bytes identical to a single-pass pack.
    */
  private def mergeFragments(run: Seq[Row]): Row = {
    var docLen = 0
    var tfLen = 0
    var normLen = 0
    var posLen = 0
    run.foreach { r =>
      docLen += r.getAs[Array[Byte]](10).length
      tfLen += r.getAs[Array[Byte]](11).length
      normLen += r.getAs[Array[Byte]](12).length
      val p = r.getAs[Array[Byte]](13)
      if (p != null) posLen += p.length
    }
    val doc = new PostingCodec.ByteVec(docLen + run.size * 5)
    val tfs = new Array[Byte](tfLen)
    val norms = new Array[Byte](normLen)
    val pos = if (run.head.get(13) == null) null else new Array[Byte](posLen)
    var tfO = 0
    var nO = 0
    var pO = 0
    var prevLast = -1
    var count = 0
    var maxTf = 0
    var minNorm = 255
    var sumTf = 0L
    run.foreach { r =>
      val db = r.getAs[Array[Byte]](10)
      if (prevLast < 0) doc.append(db, 0, db.length)
      else {
        // skip the absolute first-doc varint, re-encode as delta
        var p = 0
        while ((db(p) & 0x80) != 0) p += 1
        p += 1
        doc.addVarInt(r.getInt(5) - prevLast)
        doc.append(db, p, db.length)
      }
      prevLast = r.getInt(6)
      val tb = r.getAs[Array[Byte]](11)
      System.arraycopy(tb, 0, tfs, tfO, tb.length); tfO += tb.length
      val nb = r.getAs[Array[Byte]](12)
      System.arraycopy(nb, 0, norms, nO, nb.length); nO += nb.length
      if (pos != null) {
        val pb = r.getAs[Array[Byte]](13)
        System.arraycopy(pb, 0, pos, pO, pb.length); pO += pb.length
      }
      count += r.getInt(4)
      if (r.getInt(7) > maxTf) maxTf = r.getInt(7)
      if (r.getInt(8) < minNorm) minNorm = r.getInt(8)
      sumTf += r.getLong(9)
    }
    val docB = doc.toArray
    val bytes = docB.length.toLong + tfs.length + norms.length +
      (if (pos == null) 0 else pos.length)
    val h = run.head
    Row(h.getString(0), h.getString(1), h.getInt(2), h.getInt(3),
      count, h.getInt(5), prevLast, maxTf, minNorm, sumTf,
      docB, tfs, norms, pos, bytes)
  }

  private val timing = sys.env.get("GRAFT_BUILD_TIMING").contains("1")
  private def timed[A](name: String)(f: => A): A =
    if (!timing) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[build-timing] $name=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

  /** Write per-segment artifacts (docs, postings, termstats, fieldstats,
    * metrics) for the built segments + metrics lineage. Does NOT publish a
    * snapshot — callers compose segment builds into atomic commits.
    * Segment dirs are replaced with dynamic partition overwrite, so existing
    * segments in the same index are untouched.
    *
    * @return the non-empty segment ids written
    */
  def buildSegments(
      spark: SparkSession,
      pages: DataFrame,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      conf: BuildConf = BuildConf(),
      segOffset: Int = 0,
      mergeDepth: Int = 0,
      parentSegments: Seq[Int] = Nil
  ): Seq[Int] = {
    val parts =
      if (conf.buildPartitions > 0) conf.buildPartitions
      else spark.sessionState.conf.numShufflePartitions

    // project early: key + indexed + stored columns only (column pruning
    // reaches the source scan); the original key column is dropped so the
    // generated doc_id/segment_id/key names can't collide
    val needed = (schema.fields.map(_.name) ++ schema.storedFields).distinct
      .filterNot(_ == schema.keyField)
    require(
      !needed.exists(Set("doc_id", "segment_id", "key", "__key").contains),
      "reserved column name in schema fields: doc_id/segment_id/key/__key")
    val keyed = pages
      .select((schema.keyColumn.as("__key") +: needed.map(col)): _*)
      .withColumn(
        "segment_id",
        (lit(segOffset) + pmod(xxhash64(col("__key")), lit(conf.numSegments))).cast(IntegerType))

    // tokenize each indexed field exactly once, in the projection applied
    // after the segment/key sort — the persisted intermediate carries token
    // groups (and stored fields) but NOT the raw indexed text.
    // A text field whose INPUT COLUMN is `struct<text, tokens:array<struct<
    // position, text>>>` is pre-tokenized (reference
    // `summa_document.rs:150-160` accepts tantivy PreTokenizedString objects
    // for str fields): the provided tokens bypass the analyzer while keeping
    // positions/fieldnorm semantics; a row with a NULL tokens array falls
    // back to analyzing its `text`, mirroring the reference's per-value
    // string-or-object choice — but discriminated by column TYPE at plan
    // time, not by sniffing every row.
    val tokCols: Map[String, org.apache.spark.sql.Column] = schema.fields.map { f =>
      val an = f.analyzer
      val expr = f.fieldType match {
        case "json"  => udf((s: String) => toFlat(JsonField.analyzeJson(an, s))).apply(col(f.name).cast(StringType))
        case "bytes" => udf((s: String) => toFlat(TypedFields.singleTok(Option(s).flatMap(TypedFields.bytesTerm)))).apply(col(f.name).cast(StringType))
        case "ip"    => udf((s: String) => toFlat(TypedFields.singleTok(TypedFields.ipTerm(s)))).apply(col(f.name).cast(StringType))
        case _ =>
          pages.schema.find(_.name == f.name).map(_.dataType) match {
            case Some(st: StructType)
                if st.fieldNames.contains("text") && st.fieldNames.contains("tokens") =>
              udf((text: String, toks: Seq[PreToken]) =>
                if (toks == null) analyzeFieldFlat(an, text)
                else toFlat(analyzePreTokenized(toks)))
                .apply(col(s"${f.name}.text"), col(s"${f.name}.tokens"))
            case _ =>
              // native expression: tokenizes the UTF8String in place (ASCII
              // byte path + String fallback), no ScalaUDF converters
              org.apache.spark.sql.graftbridge.ColumnBridge.column(
                TokenizeFlatExpr(
                  an,
                  org.apache.spark.sql.graftbridge.ColumnBridge.expression(
                    col(f.name).cast(StringType))))
          }
      }
      f.name -> expr
    }.toMap
    val keepCols =
      Seq(col("segment_id"), col("__key")) ++
        schema.storedFields.map(col) ++
        schema.fields.map(f => tokCols(f.name).as(s"__tok_${f.name}"))
    // len/norm are ALSO lifted to top-level int columns in a SECOND select:
    // the columnar cache stores a struct column as one opaque blob per row,
    // so any later read of just `__tok_f.len` (the docs write, the pass-1
    // token totals) would decode every term blob in the cache. Top-level
    // scalar copies make those reads prunable narrow column scans. The
    // separate select matters — CollapseProject refuses to merge it into the
    // projection below because that would duplicate the (expensive) tokenize
    // UDF per extracted field, so the UDF still runs exactly once per row.
    val lifted = schema.fields.flatMap(f => Seq(
      col(s"__tok_${f.name}.len").as(s"__len_${f.name}"),
      col(s"__tok_${f.name}.norm").as(s"__norm_${f.name}")))
    val sortedTok = shardAndSort(keyed, parts, keepCols).select(col("*") +: lifted: _*)

    // per-segment token totals piggy-back on the pass-1 docId aggregation —
    // the cache-materializing scan pays for the group-by anyway, so neither
    // a separate stats job nor per-row CollectMetrics during the docs write
    // is needed (both showed up as the worst-scaling serial tail)
    val lenAggs = schema.fields.map(f => sum(col(s"__len_${f.name}")).as(s"tt_${f.name}"))
    val (analyzed, sortedHandle, totalDocs, segAggs) =
      timed("tokenize+sort+docids")(assignDocIds(sortedTok, parts, conf.persist, lenAggs))
    val segStats: Seq[SegStat] = segAggs.toSeq.sortBy(_._1).map { case (seg, r) =>
      SegStat(seg, r.getLong(0),
        schema.fields.zipWithIndex.map { case (f, i) => f.name -> r.getLong(1 + i) }.toMap)
    }

    // ---- docs table (doc store + fast fields + fieldnorms) ----
    // written DIRECTLY from the cached (segment, key)-sorted partitions: no
    // shuffle, no wave quantization — every core writes its own partition
    // range, files stay sorted by doc_id within each segment dir
    val docsDf = analyzed.select(
      (Seq(col("segment_id"), col("doc_id"), col("__key").as("key")) ++
        schema.storedFields.map(col) ++
        schema.fields.flatMap(f =>
          Seq(
            col(s"__len_${f.name}").as(s"len_${f.name}"),
            col(s"__norm_${f.name}").as(s"norm_${f.name}")))): _*
    )
    // the docs write and the posting pack both read the (already
    // materialized) cache and write disjoint outputs — run them as
    // CONCURRENT jobs so neither adds a serial wall-clock segment
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // zstd effort for the bulk index writes: posting payloads are already
    // entropy-packed varints, so zstd's default level 3 buys ~2% size over
    // level 1 at ~25% of the write stage's cpu — level 1 is the right
    // default for the hot build path (callers can override the option via
    // the standard hadoop conf)
    val zstdLevel = "parquet.compression.codec.zstd.level"
    // (near-)distinct columns make the parquet dictionary writer hash every
    // value only to overflow its 1 MB page and fall back to plain — the
    // dictionary writers were ~8% of build JFR samples. Disable it for:
    // doc_id (sequential, all-distinct), the doc key, analyzed-text stored
    // columns, and temporal/long/double stored columns (timestamps and
    // measures are near-distinct in practice; INT96 timestamps dictionary
    // as fixed-len byte arrays, the costliest hash). Keep it for raw fields
    // (lang/label-like low-cardinality fast fields, where the dictionary
    // also speeds predicate reads) and small-int len/norm columns.
    val analyzedStored = schema.storedFields.filter(n =>
      schema.field(n).exists(f => f.analyzer != "raw" && f.analyzer != "raw_ci"))
    val wideStored = docsDf.schema.fields.collect {
      case f if schema.storedFields.contains(f.name) &&
          (f.dataType == org.apache.spark.sql.types.TimestampType ||
            f.dataType == org.apache.spark.sql.types.LongType ||
            f.dataType == org.apache.spark.sql.types.DoubleType) => f.name
    }.toSeq
    val noDictCols = ("key" +: "doc_id" +: (analyzedStored ++ wideStored)).distinct
      .map(n => s"parquet.enable.dictionary#$n" -> "false").toMap
    val docsJob = Future {
      timed("docs-write")(docsDf
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option(zstdLevel, "1")
        .options(noDictCols)
        .partitionBy("segment_id")
        .parquet(s"$indexDir/docs"))
    }

    // ---- posting blocks (map-side pack + fragment-merge shuffle) ----
    val recordPositions = schema.fields.map(f => f.name -> (f.record == "position")).toMap

    // the docs future is ALWAYS awaited before leaving this scope: if the
    // postings write throws, the detached docs job must not keep writing to
    // $indexDir/docs behind the caller's cleanup/retry — the postings
    // failure stays primary, a concurrent docs failure is secondary
    var primary: Throwable = null
    try {
      timed("postings-pack-write")(
        packFromAnalyzed(analyzed, schema.fields, conf.blockBits, parts, recordPositions).write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .option(zstdLevel, "1")
          // the packed posting payloads are unique-per-row binaries: the
          // dictionary writer hashes every value only to overflow and fall
          // back to plain anyway (its rehash was a top-10 JFR leaf of the
          // build) — turn it off for the payload columns, keep it for the
          // low-cardinality field/term columns
          .option("parquet.enable.dictionary#doc_ids", "false")
          .option("parquet.enable.dictionary#tfs", "false")
          .option("parquet.enable.dictionary#norms", "false")
          .option("parquet.enable.dictionary#positions", "false")
          // near-distinct per-block scalars: same overflow-then-fallback
          // waste as the payloads (doc_count/max_tf/min_norm stay
          // dictionaried — they live in small value ranges)
          .option("parquet.enable.dictionary#first_doc", "false")
          .option("parquet.enable.dictionary#last_doc", "false")
          .option("parquet.enable.dictionary#sum_tf", "false")
          .option("parquet.enable.dictionary#posting_bytes", "false")
          .partitionBy("segment_id")
          .parquet(s"$indexDir/postings"))
    } catch { case t: Throwable => primary = t; throw t }
    finally {
      try Await.result(docsJob, Duration.Inf)
      catch { case t: Throwable => if (primary == null) throw t else primary.addSuppressed(t) }
    }

    // stats re-read ONLY the narrow stat columns of the written blocks —
    // column pruning makes this far cheaper than caching the full blocks
    // (persisting them serialized every posting binary through the columnar
    // cache, a memory-bandwidth tax the pack stage paid at every core count)
    val segIds = (segOffset until segOffset + conf.numSegments).toSeq
    val statCols = spark.read.parquet(s"$indexDir/postings")
      .filter(col("segment_id").isin(segIds.map(Integer.valueOf): _*))
      .select("segment_id", "field", "term", "doc_count", "sum_tf", "posting_bytes")
    // termstats is ~vocab-sized, orders of magnitude below docs — 64k-doc
    // chunks keep its write at a handful of tasks instead of `parts` tiny
    // ones (24 near-empty tasks measured 4× the run-time of 6)
    val segs = timed("stats+metrics")(writeStats(spark, schema, indexDir, buildId, statCols,
      segStats, mergeDepth, parentSegments))

    sortedHandle.unpersist()
    segs
  }

  /** Per-segment termstats/fieldstats from the just-built (still cached)
    * postings/docs DataFrames, plus an append-only metrics lineage row per
    * segment.
    *
    * @return the non-empty segment ids written (from the doc-count agg — no
    *         extra read of the docs table)
    */
  private def writeStats(
      spark: SparkSession,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      postingsRead: DataFrame,
      segStats: Seq[SegStat],
      mergeDepth: Int,
      parentSegments: Seq[Int]
  ): Seq[Int] = {
    // ONE pass over the packed blocks feeds both the termstats table and the
    // per-segment metrics aggregates: the metrics sums ride the termstats
    // WRITE job as per-segment observed aggregates (`Observation`), so this
    // driver-coordinated tail pays exactly two job latencies (termstats,
    // fieldstats — concurrent) plus the tiny metrics append, with no
    // persist/unpersist round-trip of the term-level table (it was the
    // worst-scaling phase: a fixed ~1-2 s tail both core counts pay)
    val termLevel = postingsRead
      .groupBy("segment_id", "field", "term")
      .agg(
        sum("doc_count").cast(LongType).as("df"),
        sum("sum_tf").as("total_tf"),
        sum("posting_bytes").as("pb"))

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val segIds = segStats.map(_.segmentId)
    val obs = org.apache.spark.sql.Observation(s"seg-metrics-$buildId")
    val obsAggs: Seq[org.apache.spark.sql.Column] = segIds.flatMap(s => Seq(
      sum(when(col("segment_id") === s, col("pb")).otherwise(lit(0L))).as(s"pb_$s"),
      sum(when(col("segment_id") === s, lit(1L)).otherwise(lit(0L))).as(s"nt_$s")))
    // no explicit repartition before the write: the output inherits the
    // aggregation's hash partitioning (same distribution an explicit
    // repartition on the full key gave) and AQE coalesces the vocab-sized
    // shuffle to data-proportional tasks — the former repartition(statParts)
    // both forced a second exchange of the table AND pinned the partition
    // count against AQE. Within-file (field, term) ordering is preserved by
    // the sort, so parquet row-group stats still prune term lookups.
    val termstatsJob = Future {
      termLevel
        .observe(obs, obsAggs.head, obsAggs.tail: _*)
        .select("segment_id", "field", "term", "df", "total_tf")
        .sortWithinPartitions("segment_id", "field", "term")
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_id")
        .parquet(s"$indexDir/termstats")
    }

    // fieldstats rows assemble driver-side from the pass-1 piggy-backed
    // aggregates — no extra aggregation job
    val fsRows = segStats.flatMap { st =>
      schema.fields.map(f =>
        Row(f.name, st.nDocs, st.tokensByField(f.name), st.segmentId))
    }
    val fsSchema = StructType(Seq(
      StructField("field", StringType, false),
      StructField("n_docs", LongType, false),
      StructField("total_tokens", LongType, true),
      StructField("segment_id", IntegerType, false)))
    val fieldstatsJob = Future {
      spark
        .createDataFrame(spark.sparkContext.parallelize(fsRows.toSeq, 1), fsSchema)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment_id")
        .parquet(s"$indexDir/fieldstats")
    }

    // ---- per-segment metrics (north-rule lineage table) ----
    // assembled driver-side from the aggregates OBSERVED during the
    // termstats write — no second scan of the term-level table, no extra
    // aggregation job, and the handful-of-rows append goes through a plain
    // parquet-mr writer instead of a Spark job (a job's scheduling
    // round-trip is pure fixed build tail at every core count)
    Await.result(termstatsJob, Duration.Inf)
    val observed = obs.get
    // an all-empty term table observes nulls (SQL sum over zero rows)
    def obsLong(k: String): Long = observed.get(k) match {
      case Some(n: Number) => n.longValue()
      case _               => 0L
    }
    val now = System.currentTimeMillis()
    val parents = parentSegments.map(_.toString)
    val metricRows = segStats.map { st =>
      TinyParquet.MetricRow(buildId, st.segmentId, st.nDocs,
        obsLong(s"nt_${st.segmentId}"), obsLong(s"pb_${st.segmentId}"),
        mergeDepth, parents, now)
    }
    TinyParquet.appendMetrics(
      spark.sparkContext.hadoopConfiguration, s"$indexDir/metrics", metricRows)
    Await.result(fieldstatsJob, Duration.Inf)
    segStats.map(_.segmentId).sorted
  }

  /** Fresh full build: build all segments from `pages` and publish snapshot
    * v1 (or the next version if the index already exists).
    */
  def build(
      spark: SparkSession,
      pages: DataFrame,
      schema: IndexSchema,
      indexDir: String,
      buildId: String,
      conf: BuildConf = BuildConf()
  ): Unit = {
    val segs = buildSegments(spark, pages, schema, indexDir, buildId, conf)
    // self-describing index: readers (and the SQL search() table function)
    // resolve the schema from the dir without caller-side knowledge
    IndexSchema.write(spark, indexDir, schema)
    Snapshots.commit(spark, indexDir, segs, buildId)
  }
}
