package graft.search

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** JSON front-end for the per-query parser-config override — the proto-JSON
  * rendering of `QueryParserConfig` (`query.proto:27-41`), so the SQL TVF
  * surface can carry the same override a gRPC `MatchQuery.query_parser_config`
  * does:
  *
  * {{{
  *   {"default_fields": ["title"],
  *    "field_aliases": {"t": "title"},
  *    "field_boosts": {"title": 2.0},
  *    "term_limit": 8,
  *    "default_mode": {"disjunction_max": {"tie_breaker": 0.3}},
  *    "exact_matches_promoter": {"slop": 1, "boost": 2.0, "fields": []},
  *    "morphology_configs": {"title": {"derive_tenses_coefficient": 0.3}},
  *    "term_field_mappers": {"doi": ["doi"]},
  *    "query_language": "en"}
  * }}}
  *
  * Unset fields keep proto defaults (empty / 0 / None), which
  * [[SummaQL.Config.merged]] treats as "leave the index default alone".
  */
object ConfigPatchJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): SummaQL.ConfigPatch = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, s"query_parser_config must be a JSON object: $json")
    var patch = SummaQL.ConfigPatch()
    root.properties().asScala.foreach { e =>
      val (k, v) = (e.getKey, e.getValue)
      k match {
        case "default_fields" =>
          patch = patch.copy(defaultFields = v.elements().asScala.map(_.asText()).toSeq)
        case "field_aliases" =>
          patch = patch.copy(fieldAliases = strMap(v)(_.asText()))
        case "field_boosts" =>
          patch = patch.copy(fieldBoosts = strMap(v)(_.asDouble()))
        case "term_limit" =>
          patch = patch.copy(termLimit = v.asInt())
        case "default_mode" =>
          patch = patch.copy(defaultMode = Some(parseMode(v)))
        case "exact_matches_promoter" =>
          patch = patch.copy(exactMatchesPromoter = Some(SummaQL.ExactMatchesPromoter(
            slop = Option(v.get("slop")).map(_.asInt()).getOrElse(0),
            boost = Option(v.get("boost")).filter(!_.isNull).map(_.asDouble()),
            fields = Option(v.get("fields"))
              .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil))))
        case "morphology_configs" =>
          patch = patch.copy(morphologyConfigs = strMap(v)(n =>
            Option(n.get("derive_tenses_coefficient")).map(_.asDouble()).getOrElse(0.0)))
        case "term_field_mappers" =>
          patch = patch.copy(termFieldMappers = strMap(v)(n =>
            n.elements().asScala.map(_.asText()).toSeq))
        case "query_language" =>
          patch = patch.copy(queryLanguage = Some(v.asText()))
        case other =>
          throw new IllegalArgumentException(s"unknown query_parser_config field '$other'")
      }
    }
    patch
  }

  private def strMap[A](node: JsonNode)(f: JsonNode => A): Map[String, A] = {
    require(node.isObject, s"expected a JSON object, got $node")
    node.properties().asScala.map(e => e.getKey -> f(e.getValue)).toMap
  }

  /** `default_mode` oneof: `{"boolean_should": {}}` or
    * `{"disjunction_max": {"tie_breaker": 0.3}}` (the reference proto's
    * spelling `disjuction_max` is accepted too).
    */
  private def parseMode(v: JsonNode): SummaQL.DefaultMode = {
    require(v.isObject && v.size() == 1, s"default_mode must carry exactly one mode: $v")
    val kind = v.fieldNames().next()
    kind match {
      case "boolean_should" => SummaQL.DefaultMode.BooleanShould
      case "disjunction_max" | "disjuction_max" =>
        SummaQL.DefaultMode.DisjunctionMax(
          Option(v.get(kind).get("tie_breaker")).map(_.asDouble()).getOrElse(0.0))
      case other => throw new IllegalArgumentException(s"unknown default_mode '$other'")
    }
  }
}
