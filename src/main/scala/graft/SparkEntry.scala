package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search._

/** Driver contract — every entry here is checked row/schema/hash-identical
  * against its DuckDB `oracleSql` twin at sf0.01 (see /root/repo/SURVEY.md §7
  * and OracleSql for the float-determinism rules).
  */
object SparkEntry {

  /** Flagship: BM25 top-10 for the SummaQL query `spark window` over the
    * documents corpus at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val s = DocsIndex.searcher(spark, "/root/testdata/sf0.001")
    DocsIndex
      .scored(s, MatchQuery("spark window"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- search engine over the documents corpus (Q1/Q2/Q3/Q5/Q6/Q7, C1/C4) ----
    "q_term" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex.scored(s, TermQuery("text", "spark")).orderBy("doc_id")
    }),
    "q_term_topk" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex
        .scored(s, TermQuery("text", "vector"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(10)
    }),
    "q_bool_must" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(Seq(
        (Occur.Must, TermQuery("text", "spark")),
        (Occur.Must, TermQuery("text", "window"))))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_bool_should" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(Seq(
        (Occur.Should, TermQuery("text", "spark")),
        (Occur.Should, TermQuery("text", "window"))))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_bool_must_not" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(Seq(
        (Occur.Should, TermQuery("text", "spark")),
        (Occur.MustNot, TermQuery("text", "window"))))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_dismax" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = DisjunctionMaxQuery(
        Seq(TermQuery("text", "spark"), TermQuery("text", "window")), 0.3)
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_phrase" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = PhraseQuery("text", Seq((0, "spark"), (1, "window")), 0)
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_min_should" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(
        Seq("spark", "window", "batch").map(t => (Occur.Should, TermQuery("text", t): Query)),
        minimumShouldMatch = Some(2))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_bool_phrase_mix" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(Seq(
        (Occur.Must, TermQuery("text", "spark")),
        (Occur.Should, PhraseQuery("text", Seq((0, "merge"), (1, "table")), 0))))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_boost_compose" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = BooleanQuery(Seq(
        (Occur.Should, BoostQuery(TermQuery("text", "spark"), 2.0)),
        (Occur.Should, TermQuery("text", "window"))))
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_phrase_slop" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      val q = PhraseQuery("text", Seq((0, "merge"), (1, "table")), 1)
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_phrase_slop3" -> ((sp, dir) => {
      // 3-term move-based slop (alignment spread <= slop) — distinguishes
      // Lucene matchLength semantics from a per-term window approximation
      val s = DocsIndex.searcher(sp, dir)
      val q = PhraseQuery("text", Seq((0, "table"), (1, "value"), (2, "part")), 2)
      DocsIndex.scored(s, q).orderBy("doc_id")
    }),
    "q_term_nofieldnorms" -> ((sp, dir) => {
      // per-search fieldnorms toggle: constant length 1 (reference
      // query.proto:52 semantics)
      val s0 = DocsIndex.searcher(sp, dir)
      val s = new Searcher(s0.reader, s0.schema, fieldnorms = false)
      DocsIndex.scored(s, TermQuery("text", "spark")).orderBy("doc_id")
    }),
    "q_term_raw" -> ((sp, dir) => {
      // raw single-token stored field → the docs-scan fast path (no posting
      // IO; closed-form BM25 with tf=1, fieldnorm 1, df from termstats)
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex.scored(s, TermQuery("lang", "en")).orderBy("doc_id")
    }),
    "q_count" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      s.search(TermQuery("text", "merge")).agg(count(lit(1)).as("cnt"))
    }),
    "q_range_fast" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex.matchedIds(s, RangeQuery("n_chars", Some("200"), Some("400"))).orderBy("doc_id")
    }),
    "q_regex" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex.matchedIds(s, RegexQuery("text", "s.an")).orderBy("doc_id")
    }),
    "q_match_ql" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      DocsIndex.scored(s, MatchQuery("spark -window batch")).orderBy("doc_id")
    }),
    "q_match_override" -> ((sp, dir) => {
      // per-query parser-config override (query.proto:118-121): the SAME
      // searcher whose index default fields are [text] answers this request
      // against [source] because the MatchQuery carries a config patch —
      // the reference merge's replace-if-non-empty default_fields rule
      val s = DocsIndex.searcher(sp, dir)
      val patch = SummaQL.ConfigPatch(defaultFields = Seq("source"))
      DocsIndex.matchedIds(s, MatchQuery("src3", Some(patch))).orderBy("doc_id")
    }),
    "q_sql_search" -> ((sp, dir) => {
      // the SQL TVF route: same SummaQL query as q_match_ql, issued through
      // spark.sql over the injected search(...) table function
      val s = DocsIndex.searcher(sp, dir)
      graft.plans.GraftSql.install(sp)
      graft.plans.GraftSql.registry.register("docs_oracle", s)
      sp.sql(
        """SELECT CAST(key AS BIGINT) AS doc_id, round(score, 4) AS score
          |FROM search('docs_oracle', 'spark -window batch') ORDER BY doc_id""".stripMargin)
    }),
    "q_explain" -> ((sp, dir) => {
      // per-hit explain decomposition (boost path): top-10 for 2.0*vector,
      // details exploded back out of the explain JSON
      import org.apache.spark.sql.types._
      val s = DocsIndex.searcher(sp, dir)
      val q = BoostQuery(TermQuery("text", "vector"), 2.0)
      val exSchema = StructType(Seq(
        StructField("value", DoubleType),
        StructField("description", StringType),
        StructField("details", ArrayType(StructType(Seq(
          StructField("field", StringType), StructField("term", StringType),
          StructField("kind", StringType), StructField("tf", IntegerType),
          StructField("norm_id", IntegerType), StructField("idf", DoubleType),
          StructField("boost", DoubleType), StructField("contribution", DoubleType)))))))
      s.reader.docs.select(col("segment_id"), col("doc_id"), col("key"))
        .join(s.explainTopDocs(q, 10), Seq("segment_id", "doc_id"))
        .select(col("key").cast("long").as("doc_id"),
          explode(from_json(col("explain"), exSchema).getField("details")).as("d"))
        .select(col("doc_id"), col("d.term").as("term"), col("d.tf").as("tf"),
          col("d.boost").as("boost"), round(col("d.contribution"), 4).as("score"))
        .orderBy("doc_id")
    }),
    "q_explain_phrase" -> ((sp, dir) => {
      // per-hit explain, PHRASE leaf: the phrase explains as one pseudo-term
      // leaf whose contribution equals the boosted clause score and whose
      // positions array lists the matched alignment windows; the oracle
      // recomputes tf/score/first-window from raw positions in SQL
      import org.apache.spark.sql.types._
      val s = DocsIndex.searcher(sp, dir)
      val q = BoostQuery(PhraseQuery("text", Seq((0, "spark"), (1, "window")), 0), 1.5)
      val exSchema = StructType(Seq(
        StructField("value", DoubleType),
        StructField("details", ArrayType(StructType(Seq(
          StructField("term", StringType), StructField("kind", StringType),
          StructField("tf", IntegerType), StructField("boost", DoubleType),
          StructField("contribution", DoubleType),
          StructField("positions", ArrayType(IntegerType))))))))
      s.reader.docs.select(col("segment_id"), col("doc_id"), col("key"))
        .join(s.explainTopDocs(q, 2000), Seq("segment_id", "doc_id"))
        .select(col("key").cast("long").as("doc_id"), round(col("score"), 4).as("score"),
          explode(from_json(col("explain"), exSchema).getField("details")).as("d"))
        .filter(col("d.kind") === "phrase")
        .select(col("doc_id"), col("score"), col("d.term").as("term"),
          col("d.tf").as("tf"), col("d.boost").as("boost"),
          round(col("d.contribution"), 4).as("contribution"),
          element_at(col("d.positions"), 1).as("first_pos"),
          size(col("d.positions")).as("n_windows"))
        .orderBy("doc_id")
    }),

    // ---- json field: typed dotted-path queries (reference test_json) ----
    "q_json_term" -> ((sp, dir) => {
      // str-typed path term through the analyzer (metadata.tag:src3)
      val s = DocsIndex.jsonSearcher(sp, dir)
      DocsIndex.matchedIds(s, MatchQuery("metadata.tag:src3")).orderBy("doc_id")
    }),
    "q_json_range" -> ((sp, dir) => {
      // sortable-i64 term range over a json numeric path
      val s = DocsIndex.jsonSearcher(sp, dir)
      DocsIndex.matchedIds(s, MatchQuery("metadata.year:[2010 TO 2014]")).orderBy("doc_id")
    }),

    // ---- collector analogs over the relational test tables (C2/C5/C6) ----
    "q_facet_counts" -> ((sp, dir) => {
      sp.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type")
    }),
    "q_agg_stats" -> ((sp, dir) => {
      sp.read.parquet(s"$dir/lineitem.parquet")
        .agg(
          count(lit(1)).as("cnt"),
          sum("l_quantity").as("sum_qty"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"))
    }),
    "q_histogram" -> ((sp, dir) => {
      sp.read.parquet(s"$dir/orders.parquet")
        .groupBy((floor(col("o_totalprice") / 10000) * 10000).as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("bucket")
    }),
    "q_date_histogram" -> ((sp, dir) => {
      sp.read.parquet(s"$dir/events.parquet")
        .groupBy(to_date(date_trunc("month", col("ts"))).as("month"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("month")
    }),
    "q_topk_fastfield" -> ((sp, dir) => {
      sp.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    }),

    // ---- reflection / export ----
    "q_top_terms" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      Reflection.topTerms(s.reader, "text", 10)
    }),
    "q_export_filtered" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      Reflection.exportDocuments(s, Some(TermQuery("text", "dup")), Seq("key", "lang"))
        .select(col("key").cast("long").as("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- collectors: eval scorer, aggregations, facets, reservoir, MLT, snippets ----
    "q_eval_topk" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      // over-fetch then re-rank on the rounded score so ties at the k
      // boundary resolve identically to the oracle
      s.topDocsByEval(TermQuery("text", "vector"), "original_score * fastsigm(n_chars, 300)", 50)
        .select(col("key").cast("long").as("doc_id"), round(col("eval_score"), 4).as("eval_score"))
        .orderBy(col("eval_score").desc, col("doc_id").asc)
        .limit(10)
    }),
    "q_agg_terms" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      Collectors.aggregate(s.searchWithDocs(TermQuery("text", "spark")),
        Collectors.TermsAgg("lang", 10))
    }),
    "q_agg_range" -> ((sp, dir) => {
      val s = DocsIndex.searcher(sp, dir)
      Collectors.aggregate(s.searchWithDocs(AllQuery),
        Collectors.RangeAgg("n_chars", Seq((None, Some(200.0)), (Some(200.0), Some(400.0)), (Some(400.0), None))))
    }),
    "q_facet" -> ((sp, dir) => {
      val d = sp.read.parquet(s"$dir/documents.parquet")
        .withColumn("facets", array(lit("/src"), concat(lit("/src/"), col("source"))))
      Collectors.facetCounts(d, "facets", "/src")
    }),
    "q_reservoir" -> ((sp, dir) => {
      // deterministic portable reservoir (Algorithm R + Lehmer LCG) over the
      // doc_id-ordered hit stream — full DuckDB oracle replays the fold; the
      // scale-out skip-gap sampler's contract is pinned in CollectorsSpec
      val s = DocsIndex.searcher(sp, dir)
      val ids = DocsIndex.matchedIds(s, TermQuery("text", "spark"))
      val sample = Collectors.reservoirSampleDeterministic(ids, 15, seed = 42)
      import sp.implicits._
      sample.toSeq.toDF("doc_id").orderBy("doc_id")
    }),
    "q_mlt" -> ((sp, dir) => {
      // MoreLikeThis: deterministic tf*idf expansion of doc 0's text into a
      // should-boolean, BM25-scored — oracle mirrors the expansion in SQL
      val s = DocsIndex.searcher(sp, dir)
      val seedText = sp.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") === 0).select("text").head().getString(0)
      val mlt = MoreLikeThisQuery(Map("text" -> seedText),
        minDocFrequency = 1, minTermFrequency = 2, maxQueryTerms = 5)
      DocsIndex.scored(s, mlt)
        .orderBy(col("score").desc, col("doc_id").asc).limit(10)
    }),
    "q_snippets" -> ((sp, dir) => {
      // deterministic snippet strings over the rounded-score top-5 hits
      // (rounded-score + key tie-break so the doc selection is engine-neutral)
      val s = DocsIndex.searcher(sp, dir)
      val top = DocsIndex.scored(s, TermQuery("text", "vector"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(5)
      val docs = sp.read.parquet(s"$dir/documents.parquet")
        .join(top.select("doc_id"), "doc_id")
      val snip = udf((t: String) =>
        Snippets.generate(t, Set("vector"), graft.analysis.Analyzers.summa, 80).toHtml)
      docs.select(col("doc_id"), snip(col("text")).as("snippet")).orderBy("doc_id")
    }),

    // ---- training-data pipeline ops (dedup / similarity / text analysis) ----
    "q_dedup_exact" -> ((sp, dir) => {
      ops.Dedup.exactGroups(
        sp.read.parquet(s"$dir/documents.parquet"), "doc_id", Seq("lang", "source"))
        .orderBy("rep_id")
    }),
    "q_dedup_ngram" -> ((sp, dir) => {
      ops.Dedup.ngramJaccardPairs(
        sp.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 3, 0.8)
        .orderBy("id_a", "id_b")
    }),
    "q_dedup_minhash" -> ((sp, dir) => {
      // oracle-portable hash family (mod-1e9+7 folds) → full DuckDB oracle;
      // equality with exact jaccard pairs additionally asserted in OpsSpec
      ops.Dedup.minhashLshPairs(
        sp.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 3, 16, 8, 0.8)
        .orderBy("id_a", "id_b")
    }),
    "q_dedup_simhash" -> ((sp, dir) => {
      ops.Dedup.simhashPairs(
        sp.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 7)
        .orderBy("id_a", "id_b")
    }),
    "q_dedup_embed" -> ((sp, dir) => {
      ops.Dedup.cosinePairs(
        sp.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding", 0.45)
        .orderBy("id_a", "id_b")
    }),
    "q_ann_brute" -> ((sp, dir) => {
      val emb = sp.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0).select("embedding").head()
        .getSeq[Float](0).map(_.toDouble).toArray
      ops.Similarity.cosineTopK(emb, "vec_id", "embedding", q, 20)
    }),
    "q_ann_lsh" -> ((sp, dir) => {
      // scale-path ANN; hyperplanes come from the oracle-portable family so
      // the DuckDB oracle reproduces buckets + probes exactly; recall
      // contract additionally tested in OpsSpec on planted clusters
      val emb = sp.read.parquet(s"$dir/embeddings.parquet")
      val q = emb.filter(col("vec_id") === 0).select("embedding").head()
        .getSeq[Float](0).map(_.toDouble).toArray
      ops.Similarity.annTopK(emb, "vec_id", "embedding", q, 10)
    }),
    "q_text_stats" -> ((sp, dir) => {
      val d = sp.read.parquet(s"$dir/documents.parquet")
      d.select(
        col("doc_id"),
        ops.TextStats.tokenCount(col("text")).as("tc"),
        ops.TextStats.round4(ops.TextStats.stopwordRatio(col("text"))).as("swr"),
        ops.TextStats.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),
    "q_text_fingerprint" -> ((sp, dir) => {
      // deterministic wrapping arithmetic — the DuckDB oracle reproduces the
      // exact 64-bit fold with HUGEINT mod-2^64 (langid, a UDF heuristic
      // with no SQL form, is pinned by OpsSpec instead)
      val d = sp.read.parquet(s"$dir/documents.parquet")
      d.select(
        col("doc_id"),
        ops.TextStats.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    "q_multimodal_features" -> ((sp, dir) => {
      // binary decode/feature plumbing over a deterministic fake codec (real
      // codecs don't ship in this container); flattened to scalar columns so
      // the driver compare can sort/hash them, oracle emulates the codec LCG
      val d = ops.Multimodal.withFakeMedia(
        sp.read.parquet(s"$dir/documents.parquet").select("doc_id"), "doc_id")
      val f = ops.Multimodal.extractFeatures(d, "doc_id", "media")
      f.select(
        Seq(col("id"), col("kind"), col("width"), col("height")) ++
          (0 until 8).map(i => round(col("features").getItem(i), 4).as(s"f$i")): _*)
        .orderBy("id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_term" -> OracleSql.termQuery("spark"),
    "q_term_topk" -> OracleSql.termTopK("vector", 10),
    "q_bool_must" -> OracleSql.boolMust("spark", "window"),
    "q_bool_should" -> OracleSql.boolShould("spark", "window"),
    "q_bool_must_not" -> OracleSql.boolMustNot("spark", "window"),
    "q_dismax" -> OracleSql.dismax("spark", "window", 0.3),
    "q_phrase" -> OracleSql.phrase("spark", "window"),
    "q_min_should" ->
      (OracleSql.prologue + OracleSql.termScoreCte("spark", "a") +
        OracleSql.termScoreCte("window", "b") + OracleSql.termScoreCte("batch", "c") +
        """
          |SELECT coalesce(a.doc_id, b.doc_id, c.doc_id) AS doc_id,
          |       round(coalesce(a.score, 0) + coalesce(b.score, 0) + coalesce(c.score, 0), 4) AS score
          |FROM sc_a a
          |FULL OUTER JOIN sc_b b ON a.doc_id = b.doc_id
          |FULL OUTER JOIN sc_c c ON coalesce(a.doc_id, b.doc_id) = c.doc_id
          |WHERE (a.doc_id IS NOT NULL)::INT + (b.doc_id IS NOT NULL)::INT +
          |      (c.doc_id IS NOT NULL)::INT >= 2
          |ORDER BY doc_id""".stripMargin),
    "q_bool_phrase_mix" ->
      (OracleSql.prologue + OracleSql.termScoreCte("spark", "a") +
        """
          |,p1 AS (SELECT doc_id, pos FROM tok WHERE w = 'merge'),
          |p2 AS (SELECT doc_id, pos FROM tok WHERE w = 'table'),
          |ph AS (
          |  SELECT p1.doc_id, count(*)::DOUBLE AS tf
          |  FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.pos = p1.pos + 1
          |  GROUP BY 1
          |),
          |df1 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p1),
          |df2 AS (SELECT count(DISTINCT doc_id)::DOUBLE AS df FROM p2),
          |phs AS (
          |  SELECT ph.doc_id,
          |         (ln(1 + (s.n - d1.df + 0.5) / (d1.df + 0.5)) +
          |          ln(1 + (s.n - d2.df + 0.5) / (d2.df + 0.5))) *
          |         (ph.tf * (1.2 + 1)) / (ph.tf + 1.2 * ((1 - 0.75) + 0.75 * q.qlen / s.avgdl)) AS score
          |  FROM ph, df1 d1, df2 d2, stats s
          |  JOIN qn q ON q.doc_id = ph.doc_id)
          |SELECT a.doc_id, round(a.score + coalesce(p.score, 0), 4) AS score
          |FROM sc_a a LEFT JOIN phs p ON p.doc_id = a.doc_id
          |ORDER BY a.doc_id""".stripMargin),
    "q_boost_compose" ->
      (OracleSql.prologue + OracleSql.termScoreCte("spark", "a") +
        OracleSql.termScoreCte("window", "b") +
        """
          |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
          |       round(coalesce(a.score * 2.0, 0) + coalesce(b.score, 0), 4) AS score
          |FROM sc_a a FULL OUTER JOIN sc_b b ON a.doc_id = b.doc_id
          |ORDER BY doc_id""".stripMargin),
    "q_phrase_slop" -> OracleSql.phraseSlop("merge", "table", 1),
    "q_phrase_slop3" -> OracleSql.phraseSlop3("table", "value", "part", 2),
    "q_mlt" -> OracleSql.moreLikeThis(0, minTf = 2, maxTerms = 5, k = 10),
    "q_snippets" -> OracleSql.snippets("vector", 5, 80),
    "q_term_nofieldnorms" -> OracleSql.termQueryNoFieldnorms("spark"),
    "q_term_raw" -> OracleSql.rawTermQuery("lang", "en"),
    "q_count" -> OracleSql.termCount("merge"),
    "q_range_fast" ->
      "SELECT doc_id FROM documents WHERE n_chars >= 200 AND n_chars <= 400 ORDER BY doc_id",
    "q_regex" -> OracleSql.regex("s.an"),
    "q_match_ql" -> OracleSql.matchShouldShouldNot("spark", "batch", "window"),
    "q_match_override" ->
      "SELECT doc_id FROM documents WHERE source = 'src3' ORDER BY doc_id",
    "q_sql_search" -> OracleSql.matchShouldShouldNot("spark", "batch", "window"),
    "q_explain" -> OracleSql.explainBoostTopK("vector", 2.0, 10),
    "q_explain_phrase" -> OracleSql.explainPhrase("spark", "window", 1.5),
    "q_json_term" ->
      "SELECT doc_id FROM documents WHERE source = 'src3' ORDER BY doc_id",
    "q_json_range" ->
      """SELECT doc_id FROM documents
        |WHERE 2000 + doc_id % 25 BETWEEN 2010 AND 2014 ORDER BY doc_id""".stripMargin,
    "q_facet_counts" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q_agg_stats" ->
      """SELECT count(*) AS cnt, sum(l_quantity) AS sum_qty, min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty, sum(l_quantity) / count(*) AS avg_qty
        |FROM lineitem""".stripMargin,
    "q_histogram" ->
      """SELECT (floor(o_totalprice / 10000) * 10000)::BIGINT AS bucket, count(*) AS cnt
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_date_histogram" ->
      """SELECT date_trunc('month', ts)::DATE AS month, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY month""".stripMargin,
    "q_topk_fastfield" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS rep_id, count(*) AS group_size
        |FROM documents GROUP BY lang, source HAVING count(*) > 1
        |ORDER BY rep_id""".stripMargin,
    "q_top_terms" ->
      (OracleSql.prologue +
        """
          |SELECT w AS term, count(DISTINCT doc_id) AS df
          |FROM ftok GROUP BY w ORDER BY df DESC, term ASC LIMIT 10""".stripMargin),
    "q_export_filtered" ->
      (OracleSql.prologue +
        """
          |SELECT d.doc_id, d.lang FROM documents d
          |WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM ftok WHERE w = 'dup')
          |ORDER BY d.doc_id""".stripMargin),
    "q_eval_topk" ->
      (OracleSql.prologue + OracleSql.termScoreCte("vector", "t") +
        """
          |,ev AS (
          |  SELECT s.doc_id,
          |         s.score * (abs(d.n_chars) / (300.0 + abs(d.n_chars))) AS ev
          |  FROM sc_t s JOIN documents d ON d.doc_id = s.doc_id)
          |SELECT doc_id, round(ev, 4) AS eval_score FROM ev
          |ORDER BY round(ev, 4) DESC, doc_id LIMIT 10""".stripMargin),
    "q_agg_terms" ->
      (OracleSql.prologue +
        """
          |SELECT d.lang AS key, count(*) AS doc_count
          |FROM documents d
          |WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM ftok WHERE w = 'spark')
          |GROUP BY d.lang ORDER BY doc_count DESC, key ASC LIMIT 10""".stripMargin),
    "q_agg_range" ->
      """SELECT key, count(*) AS doc_count FROM (
        |  SELECT CASE WHEN n_chars < 200 THEN '*-200.0'
        |              WHEN n_chars >= 200 AND n_chars < 400 THEN '200.0-400.0'
        |              ELSE '400.0-*' END AS key
        |  FROM documents) GROUP BY key ORDER BY key""".stripMargin,
    "q_facet" ->
      """SELECT '/src/' || source AS facet, count(*) AS cnt
        |FROM documents GROUP BY 1 ORDER BY facet""".stripMargin,
    "q_reservoir" -> OracleSql.reservoirDeterministic("spark", 15, 42L),
    "q_dedup_ngram" -> OracleSql.ngramJaccardPairs(0.8),
    "q_dedup_minhash" -> OracleSql.minhashLshPairs(3, 16, 8, 0.8),
    "q_dedup_simhash" -> OracleSql.simhashPairs(7),
    "q_dedup_embed" -> OracleSql.cosinePairs(0.45),
    "q_ann_brute" -> OracleSql.cosineTopK(20),
    "q_ann_lsh" -> OracleSql.annLsh(10, 4, 8, 64, 42L),
    "q_text_stats" -> OracleSql.textStats,
    "q_text_fingerprint" -> OracleSql.textFingerprint,
    "q_multimodal_features" -> OracleSql.multimodalFeatures
  )
}
