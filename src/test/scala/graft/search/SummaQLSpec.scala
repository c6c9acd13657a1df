package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{FieldDef, IndexSchema}

/** Parser goldens ported from the reference suite
  * (`/root/reference/summa-core/src/components/query_parser/summa_ql.rs:840-1202`),
  * asserted against this engine's AST. Numeric fast-field equality parses to
  * a degenerate RangeQuery (the Spark mapping of a typed numeric TermQuery).
  */
class SummaQLSpec extends AnyFunSuite {

  // create_query_parser analog: default field [title]; body also indexed;
  // timestamp is a numeric fast field; doi a raw text field
  private val schema = IndexSchema(
    keyField = "id",
    fields = Seq(
      FieldDef("title", "summa_without_stop_words", "position"),
      FieldDef("body", "summa_without_stop_words", "position"),
      FieldDef("doi", "raw", "basic"),
      FieldDef("language", "raw", "basic")
    ),
    defaultFields = Seq("title"),
    storedFields = Seq("timestamp")
  )
  private val cfg = SummaQL.Config(
    defaultFields = Seq("title"),
    schema = Some(schema),
    fastFields = Set("timestamp"))
  private val complexCfg = cfg.copy(defaultFields = Seq("title", "body"))

  private def p(q: String, c: SummaQL.Config = cfg): Query = SummaQL.parse(q, c)

  private def T(f: String, v: String) = TermQuery(f, v)
  private def should(qs: Query*) = BooleanQuery(qs.map((Occur.Should, _)))

  test("bag of words over default fields") {
    assert(p("search engine") == should(T("title", "search"), T("title", "engine")))
    assert(p("search engine", complexCfg) ==
      should(T("title", "search"), T("body", "search"), T("title", "engine"), T("body", "engine")))
  }

  test("phrases with positions, slop, unclosed quotes") {
    assert(p("'search engine'") ==
      PhraseQuery("title", Seq((0, "search"), (1, "engine")), 0))
    assert(p("body:'search engine'~4") ==
      PhraseQuery("body", Seq((0, "search"), (1, "engine")), 4))
    assert(p("`non closed") == PhraseQuery("title", Seq((0, "non"), (1, "closed")), 0))
    assert(p("\"non closed") == PhraseQuery("title", Seq((0, "non"), (1, "closed")), 0))
    assert(p("non closed`") == should(T("title", "non"), T("title", "closed")))
    assert(p("+'I sette messaggeri'", complexCfg) == BooleanQuery(Seq(
      (Occur.Must, should(
        PhraseQuery("title", Seq((0, "i"), (1, "sette"), (2, "messaggeri")), 0),
        PhraseQuery("body", Seq((0, "i"), (1, "sette"), (2, "messaggeri")), 0)))))
    )
  }

  test("field scoping; unknown fields degrade to default-field words") {
    assert(p("body:'search engine'") == PhraseQuery("body", Seq((0, "search"), (1, "engine")), 0))
    assert(p("title:search engine") == should(T("title", "search"), T("title", "engine")))
    assert(p("not_field:search engine") ==
      should(T("title", "not"), T("title", "field"), T("title", "search"), T("title", "engine")))
    // ':' followed by whitespace is a separator, not field scoping
    assert(p("поисковые: системы") == should(T("title", "поисковые"), T("title", "системы")))
    assert(p("body:поисковые системы") == should(T("body", "поисковые"), T("title", "системы")))
    assert(p("healthcare cyber–physical system") ==
      should(T("title", "healthcare"), T("title", "cyber"), T("title", "physical"), T("title", "system")))
  }

  test("numeric fast-field terms and ranges") {
    assert(p("timestamp:10") == RangeQuery("timestamp", Some("10"), Some("10")))
    assert(p("timestamp:[ 1000 to 2000 ]") == RangeQuery("timestamp", Some("1000"), Some("2000")))
    assert(p("body:[aaa TO ccc]") == TermRangeQuery("body", Some("aaa"), Some("ccc")))
    assert(p("body:[ a to  * ]") == TermRangeQuery("body", Some("a"), None))
    assert(p("timestamp:(-[1100 to 1200] [ 1000 to 2000 ] -1500 +3000)") == BooleanQuery(Seq(
      (Occur.MustNot, RangeQuery("timestamp", Some("1100"), Some("1200"))),
      (Occur.Should, RangeQuery("timestamp", Some("1000"), Some("2000"))),
      (Occur.MustNot, RangeQuery("timestamp", Some("1500"), Some("1500"))),
      (Occur.Must, RangeQuery("timestamp", Some("3000"), Some("3000"))))))
  }

  test("punctuation, stray chars, pathological inputs") {
    assert(p("Search Engines: The Ultimate, Only Guide!") ==
      should(T("title", "search"), T("title", "engines"), T("title", "the"),
        T("title", "ultimate"), T("title", "only"), T("title", "guide")))
    assert(p("!! HI !! (SEARCH! ENGINES!") ==
      should(T("title", "hi"), T("title", "search"), T("title", "engines")))
    assert(p("``") == EmptyQuery)
    assert(p("```") == EmptyQuery)
    assert(p(")(") == EmptyQuery)
    assert(p("(a)(b)`") == should(T("title", "a"), T("title", "b")))
    assert(p("a + b - c") == should(T("title", "a"), T("title", "b"), T("title", "c")))
    assert(p("10.10 10/10") ==
      should(T("title", "10"), T("title", "10"), T("title", "10"), T("title", "10")))
    // unparseable tail after field:( is dropped (pest semantics)
    assert(p("title:(search ") == T("title", "title"))
    assert(p("title:(search -") == T("title", "title"))
    assert(p("Don't duck with my family") ==
      should(T("title", "don"), T("title", "t"), T("title", "duck"),
        T("title", "with"), T("title", "my"), T("title", "family")))
    assert(p("\"I Don't Want to be Me\"") == PhraseQuery("title",
      Seq((0, "i"), (1, "don"), (2, "t"), (3, "want"), (4, "to"), (5, "be"), (6, "me")), 0))
  }

  test("plus/minus occurs incl. multi-default-field transpose") {
    assert(p("body:+search -engine") == BooleanQuery(Seq(
      (Occur.Must, T("body", "search")),
      (Occur.MustNot, T("title", "engine")))))
    assert(p("body:+'search engine'") == BooleanQuery(Seq(
      (Occur.Must, PhraseQuery("body", Seq((0, "search"), (1, "engine")), 0)))))
    assert(p("+search +engine") == BooleanQuery(Seq(
      (Occur.Must, T("title", "search")), (Occur.Must, T("title", "engine")))))
    assert(p("+search +engine", complexCfg) == BooleanQuery(Seq(
      (Occur.Must, should(T("title", "search"), T("body", "search"))),
      (Occur.Must, should(T("title", "engine"), T("body", "engine"))))))
    assert(p("+search language:+ru", complexCfg) == BooleanQuery(Seq(
      (Occur.Must, should(T("title", "search"), T("body", "search"))),
      (Occur.Must, T("language", "ru")))))
    assert(p("+c++ language:+ru", complexCfg) == BooleanQuery(Seq(
      (Occur.Must, should(T("title", "c++"), T("body", "c++"))),
      (Occur.Must, T("language", "ru")))))
  }

  test("groupings") {
    assert(p("body:+(a b)") == BooleanQuery(Seq(
      (Occur.Must, should(T("body", "a"), T("body", "b"))))))
    assert(p("body:-(a b)") == BooleanQuery(Seq(
      (Occur.MustNot, should(T("body", "a"), T("body", "b"))))))
    assert(p("(test1 test2) -(test3) +(test4 test5)") == BooleanQuery(Seq(
      (Occur.Should, T("title", "test1")),
      (Occur.Should, T("title", "test2")),
      (Occur.MustNot, T("title", "test3")),
      (Occur.Must, should(T("title", "test4"), T("title", "test5"))))))
  }

  test("boosts") {
    assert(p("search^2.0") == BoostQuery(T("title", "search"), 2.0))
    assert(p("'search engine'~3^2.0") ==
      BoostQuery(PhraseQuery("title", Seq((0, "search"), (1, "engine")), 3), 2.0))
    assert(p("search engine^2.0") ==
      should(T("title", "search"), BoostQuery(T("title", "engine"), 2.0)))
    assert(p("body:title^2.0") == BoostQuery(T("body", "title"), 2.0))
    assert(p("body:'title'^2.0") == BoostQuery(T("body", "title"), 2.0))
  }

  test("DOI and ISBN routing via term-field mappers") {
    val c = cfg.copy(termFieldMappers = Map(
      "doi" -> Seq("doi"), "doi_isbn" -> Seq("isbns"), "isbn" -> Seq("isbns")))
    assert(p("10.0000/abcd.0123", c) == T("doi", "10.0000/abcd.0123"))
    assert(p("https://doi.org/10.0000/abcd.0123", c) == T("doi", "10.0000/abcd.0123"))
    assert(p("doi.org/10.0000/abcd.0123", c) == T("doi", "10.0000/abcd.0123"))
    assert(p("10.0000/978123", c) == T("doi", "10.0000/978123"))
    assert(p("10.0000/9781234567890", c) ==
      should(T("doi", "10.0000/9781234567890"), T("isbns", "9781234567890")))
    assert(p("10.0000/978-12345-6789-0", c) ==
      should(T("doi", "10.0000/978-12345-6789-0"), T("isbns", "9781234567890")))
    assert(p("10.0000/978-12345-6789-0.ch11", c) ==
      should(T("doi", "10.0000/978-12345-6789-0.ch11"), T("isbns", "9781234567890")))
    assert(p("10.0000/cbo978-12345-6789-0.ch11", c) ==
      should(T("doi", "10.0000/cbo978-12345-6789-0.ch11"), T("isbns", "9781234567890")))
    assert(p("978-12345-6789-0", c) == T("isbns", "9781234567890"))
    assert(p("9781234567890", c) == T("isbns", "9781234567890"))
    assert(p("10.0000/cbo123", c) == T("doi", "10.0000/cbo123"))
    assert(p("10.1515/12-23", c) == T("doi", "10.1515/12-23"))
    // not ISBN-shaped → plain words (the trailing digit count breaks EOI anchor)
    assert(p("97812-34-5678-909", c) ==
      should(T("title", "97812"), T("title", "34"), T("title", "5678"), T("title", "909")))
    assert(p("123 97812-34-5678-909", c) == should(
      T("title", "123"), T("title", "97812"), T("title", "34"), T("title", "5678"), T("title", "909")))
    // field-scoped DOI keeps the wrapper verbatim (raw field)
    assert(p("doi:https://doi.org/10.0000/abcd.0123", c) ==
      T("doi", "https://doi.org/10.0000/abcd.0123"))
    assert(p("doi:10.1182/blood.v53.1.19.bloodjournal53119", c) ==
      T("doi", "10.1182/blood.v53.1.19.bloodjournal53119"))
    assert(p("doi:'10.1182/blood.v53.1.19.bloodjournal53119'", c) ==
      T("doi", "10.1182/blood.v53.1.19.bloodjournal53119"))
    // with mappers unconfigured, DOI/ISBN statements reduce to Empty
    assert(p("9781234567890") == EmptyQuery)
  }

  test("exact matches promoter") {
    val c = cfg.copy(exactMatchesPromoter =
      Some(SummaQL.ExactMatchesPromoter(slop = 3, boost = Some(2.0))))
    assert(p("old school holy-wood", c) == BooleanQuery(Seq(
      (Occur.Should, T("title", "old")),
      (Occur.Should, T("title", "school")),
      (Occur.Should, T("title", "holy")),
      (Occur.Should, T("title", "wood")),
      (Occur.Should, BoostQuery(PhraseQuery("title",
        Seq((0, "old"), (1, "school"), (2, "holy"), (3, "wood")), 3), 2.0)))))
    // boosted statements suppress the promoter
    assert(p("old^2.0 school", c) ==
      should(BoostQuery(T("title", "old"), 2.0), T("title", "school")))
    // field boost multiplies the promoter boost
    val c2 = c.copy(fieldBoosts = Map("title" -> 3.0))
    assert(p("old school", c2) == BooleanQuery(Seq(
      (Occur.Should, BoostQuery(T("title", "old"), 3.0)),
      (Occur.Should, BoostQuery(T("title", "school"), 3.0)),
      (Occur.Should, BoostQuery(PhraseQuery("title",
        Seq((0, "old"), (1, "school")), 3), 6.0)))))
  }

  test("morphology inflection") {
    val c = cfg.copy(
      morphologyConfigs = Map("title" -> 0.3),
      queryLanguage = Some("en"))
    assert(p("red1 search engine going", c) == BooleanQuery(Seq(
      (Occur.Should, T("title", "red1")),
      (Occur.Should, DisjunctionMaxQuery(Seq(T("title", "search"), T("title", "searches")), 0.3)),
      (Occur.Should, DisjunctionMaxQuery(Seq(T("title", "engine"), T("title", "engines")), 0.3)),
      (Occur.Should, T("title", "going")))))
    assert(p("iso 34-1:2022", c) == BooleanQuery(Seq(
      (Occur.Should, DisjunctionMaxQuery(Seq(T("title", "iso"), T("title", "isos")), 0.3)),
      (Occur.Should, T("title", "34")),
      (Occur.Should, T("title", "1")))))
  }

  test("excluded fields short-circuit to Empty") {
    val c = cfg.copy(excludedFields = Set("secret"))
    assert(p("secret:value") == should(T("title", "secret"), T("title", "value")))
    assert(p("secret:value", c) == EmptyQuery)
  }

  test("per-query config patch merges like QueryParserConfig::merge (core.rs:143-166)") {
    // non-empty default_fields REPLACES the index default
    val redirected = cfg.merged(SummaQL.ConfigPatch(defaultFields = Seq("body")))
    assert(p("search engine", redirected) == should(T("body", "search"), T("body", "engine")))

    // default_mode Some replaces: each statement now dismaxes across the
    // default FIELDS (the reference's per-statement default_mode semantics,
    // `summa_ql.rs:250-256`) instead of OR-ing them
    val dm = complexCfg.merged(SummaQL.ConfigPatch(
      defaultMode = Some(SummaQL.DefaultMode.DisjunctionMax(0.4))))
    assert(p("search engine", dm) == should(
      DisjunctionMaxQuery(Seq(T("title", "search"), T("body", "search")), 0.4),
      DisjunctionMaxQuery(Seq(T("title", "engine"), T("body", "engine")), 0.4)))

    // morphology_configs EXTEND (per-key override); query_language Some
    // replaces — mirrors the reference morphology-enabled parser tests
    val base = cfg.copy(morphologyConfigs = Map("body" -> 0.2))
    val m = base.merged(SummaQL.ConfigPatch(
      morphologyConfigs = Map("title" -> 0.3), queryLanguage = Some("en")))
    assert(m.morphologyConfigs == Map("body" -> 0.2, "title" -> 0.3))
    assert(p("engine", m) ==
      DisjunctionMaxQuery(Seq(T("title", "engine"), T("title", "engines")), 0.3))

    // positive term_limit replaces; zero keeps the default
    assert(cfg.merged(SummaQL.ConfigPatch(termLimit = 3)).termLimit == 3)
    assert(cfg.merged(SummaQL.ConfigPatch()).termLimit == cfg.termLimit)

    // unset patch fields keep every index default (field scoping intact)
    assert(p("body:'search engine'", cfg.merged(SummaQL.ConfigPatch())) ==
      PhraseQuery("body", Seq((0, "search"), (1, "engine")), 0))
  }

  test("ConfigPatchJson parses the proto-JSON query_parser_config rendering") {
    val patch = ConfigPatchJson.parse(
      """{"default_fields": ["body"],
        |  "field_aliases": {"t": "title"},
        |  "field_boosts": {"title": 2.0},
        |  "term_limit": 8,
        |  "default_mode": {"disjunction_max": {"tie_breaker": 0.3}},
        |  "morphology_configs": {"title": {"derive_tenses_coefficient": 0.25}},
        |  "term_field_mappers": {"doi": ["doi"]},
        |  "query_language": "en"}""".stripMargin)
    assert(patch.defaultFields == Seq("body"))
    assert(patch.fieldAliases == Map("t" -> "title"))
    assert(patch.fieldBoosts == Map("title" -> 2.0))
    assert(patch.termLimit == 8)
    assert(patch.defaultMode.contains(SummaQL.DefaultMode.DisjunctionMax(0.3)))
    assert(patch.morphologyConfigs == Map("title" -> 0.25))
    assert(patch.termFieldMappers == Map("doi" -> Seq("doi")))
    assert(patch.queryLanguage.contains("en"))
    // merged parse redirects fields exactly like a directly-built patch.
    // Reference shape: dismax mode wraps each word's per-field queries in a
    // DisjunctionMaxQuery even when there is a single default field
    // (summa_ql.rs:249-254); reduce_should_clause (:139-161) unwraps only
    // singleton BooleanQuery should-clauses, never dismax.
    assert(p("search engine", cfg.merged(patch)) ==
      should(DisjunctionMaxQuery(Seq(T("body", "search")), 0.3),
             DisjunctionMaxQuery(Seq(T("body", "engine")), 0.3)))
    // empty object = no-op patch; unknown fields rejected
    assert(cfg.merged(ConfigPatchJson.parse("{}")) == cfg)
    intercept[IllegalArgumentException](ConfigPatchJson.parse("""{"nope": 1}"""))
    // reference-proto spelling of the dismax mode accepted
    assert(ConfigPatchJson.parse("""{"default_mode":{"disjuction_max":{"tie_breaker":0.5}}}""")
      .defaultMode.contains(SummaQL.DefaultMode.DisjunctionMax(0.5)))
  }
}

/** US/UK spelling expansion (reference english.rs spelling.csv). */
class MorphologySpellingSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("spelling variants expand into the tense dismax") {
    assert(Morphology.deriveSpelling("colour").contains("color"))
    assert(Morphology.deriveSpelling("color").contains("colour"))
    val q = Morphology.deriveQuery("title", "colour", 0.3)
    q match {
      case DisjunctionMaxQuery(ds, tb) =>
        assert(tb == 0.3)
        val terms = ds.collect { case TermQuery(_, t) => t }
        assert(terms.contains("colour") && terms.contains("colours"))
        assert(terms.contains("color") && terms.contains("colors"))
      case other => fail(s"expected dismax, got $other")
    }
    // no spelling entry → plain tense pair
    Morphology.deriveQuery("title", "engine", 0.3) match {
      case DisjunctionMaxQuery(ds, _) =>
        assert(ds == Seq(TermQuery("title", "engine"), TermQuery("title", "engines")))
      case other => fail(s"$other")
    }
  }
}
