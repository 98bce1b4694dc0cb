package graft.api

import graft.core.Json
import graft.query._

/** JSON wire codec for queries — the engine-side equivalent of the
  * reference's HTTP translator (lintdb/server/controllers/v1/
  * query_node_translator.h:17-52: TENSOR -> VectorQueryNode, AND -> And,
  * scalar -> Term) plus Document::fromJson (lintdb/schema/Document.h:32-42).
  * Enables driving searches from JSON payloads (bulk ingest of JSON docs is
  * just `spark.read.json` against the schema's column layout).
  */
object WireCodec {

  def queryToJson(q: QueryNode): String = Json.mapper.writeValueAsString(toMap(q))

  private def toMap(q: QueryNode): Map[String, Any] = q match {
    case TermQuery(f, v) => Map("type" -> "term", "field" -> f, "value" -> v)
    case RangeQuery(f, lo, hi) =>
      Map("type" -> "range", "field" -> f, "lo" -> lo, "hi" -> hi)
    case VectorQuery(f, toks) =>
      Map("type" -> "vector", "field" -> f, "tensor" -> toks.map(_.toSeq).toSeq)
    case AndQuery(cs, comb) =>
      Map("type" -> "and", "combiner" -> comb.toString, "children" -> cs.map(toMap))
    case OrQuery(cs, comb) =>
      Map("type" -> "or", "combiner" -> comb.toString, "children" -> cs.map(toMap))
  }

  def queryFromJson(json: String): QueryNode =
    fromMap(Json.mapper.readValue(json, classOf[Map[String, Any]]))

  private def fromMap(m: Map[String, Any]): QueryNode = m("type") match {
    case "term" => TermQuery(m("field").toString, m("value"))
    case "range" => RangeQuery(m("field").toString,
      m("lo").asInstanceOf[Number].doubleValue(),
      m("hi").asInstanceOf[Number].doubleValue())
    case "vector" =>
      val toks = m("tensor").asInstanceOf[Seq[Any]].map(
        _.asInstanceOf[Seq[Any]].map(_.asInstanceOf[Number].floatValue()).toArray).toArray
      VectorQuery(m("field").toString, toks)
    case "and" => AndQuery(children(m), combiner(m))
    case "or" => OrQuery(children(m), combiner(m))
    case other => throw new IllegalArgumentException(s"unknown query type: $other")
  }

  private def children(m: Map[String, Any]): Seq[QueryNode] =
    m("children").asInstanceOf[Seq[Any]]
      .map(c => fromMap(c.asInstanceOf[Map[String, Any]]))

  private def combiner(m: Map[String, Any]): Combiner.Value =
    m.get("combiner").map(c => Combiner.withName(c.toString)).getOrElse(Combiner.SUM)
}
