package graft.search

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.search.Collectors._

/** ES-style JSON front-end for the aggregation DSL (C6): the reference
  * accepts a serialized tantivy `Aggregations` request
  * (`summa-proto/proto/query.proto:256-262`, parsed at
  * `summa-core/src/components/fruit_extractors.rs:193-198`); this parses the
  * same shape into the typed [[Collectors.Agg]] ADT:
  *
  * {{{
  * {"langs":  {"terms": {"field": "lang", "size": 5}},
  *  "years":  {"histogram": {"field": "year", "interval": 10}},
  *  "months": {"date_histogram": {"field": "ts", "calendar_interval": "month"}},
  *  "sizes":  {"range": {"field": "n", "ranges": [{"to": 10}, {"from": 10, "to": 20}, {"from": 20}]}},
  *  "stats":  {"stats": {"field": "n"}},
  *  "pcts":   {"percentiles": {"field": "n", "percents": [50, 95]}}}
  * }}}
  */
object AggJson {

  private val mapper = new ObjectMapper()

  /** Parse an aggregations request: agg name → typed Agg. Unknown agg kinds
    * or malformed bodies raise IllegalArgumentException with the agg name.
    */
  def parse(json: String): Map[String, Agg] = {
    val root = mapper.readTree(json)
    require(root != null && root.isObject, s"aggregation request must be a JSON object: $json")
    root.properties().asScala.map { e =>
      e.getKey -> parseOne(e.getKey, e.getValue)
    }.toMap
  }

  private def field(name: String, body: JsonNode): String = {
    val f = body.get("field")
    require(f != null && f.isTextual, s"aggregation '$name' needs a string 'field'")
    f.asText()
  }

  private def parseOne(name: String, node: JsonNode): Agg = {
    require(node.isObject && node.size() >= 1, s"aggregation '$name' must be an object")
    val kind = node.fieldNames().next()
    val body = node.get(kind)
    kind match {
      case "terms" =>
        TermsAgg(field(name, body),
          size = Option(body.get("size")).map(_.asInt).getOrElse(10))
      case "histogram" =>
        val interval = body.get("interval")
        require(interval != null && interval.isNumber, s"histogram '$name' needs numeric 'interval'")
        HistogramAgg(field(name, body), interval.asDouble)
      case "date_histogram" =>
        // calendar_interval carries the unit (tantivy also accepts
        // fixed_interval like "1d"; common fixed forms map to units)
        val unit = Option(body.get("calendar_interval")).map(_.asText)
          .orElse(Option(body.get("fixed_interval")).map(f => f.asText match {
            case "1d" => "day"
            case "1h" => "hour"
            case other =>
              throw new IllegalArgumentException(
                s"date_histogram '$name': unsupported fixed_interval '$other'")
          }))
          .getOrElse(throw new IllegalArgumentException(
            s"date_histogram '$name' needs calendar_interval or fixed_interval"))
        require(Set("year", "quarter", "month", "week", "day", "hour").contains(unit),
          s"date_histogram '$name': unsupported unit '$unit'")
        DateHistogramAgg(field(name, body), unit)
      case "range" =>
        val rangesNode = body.get("ranges")
        require(rangesNode != null && rangesNode.isArray, s"range '$name' needs a 'ranges' array")
        val ranges = rangesNode.elements().asScala.map { r =>
          (Option(r.get("from")).map(_.asDouble), Option(r.get("to")).map(_.asDouble))
        }.toSeq
        RangeAgg(field(name, body), ranges)
      case "stats" =>
        StatsAgg(field(name, body))
      case "percentiles" =>
        val percents = Option(body.get("percents"))
          .map(_.elements().asScala.map(_.asDouble).toSeq)
          .getOrElse(Seq(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0))
        PercentilesAgg(field(name, body), percents)
      case other =>
        throw new IllegalArgumentException(s"aggregation '$name': unsupported kind '$other'")
    }
  }
}
