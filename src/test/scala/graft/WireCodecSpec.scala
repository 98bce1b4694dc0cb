package graft

import graft.api.WireCodec
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

class WireCodecSpec extends AnyFunSuite {

  test("query tree round-trips through JSON") {
    val q = AndQuery(Seq(
      VectorQuery("colbert", Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f))),
      TermQuery("cat", "news"),
      OrQuery(Seq(TermQuery("num", 1), RangeQuery("num", 0.0, 5.0)), Combiner.MAX)))
    val json = WireCodec.queryToJson(q)
    val back = WireCodec.queryFromJson(json)
    back match {
      case AndQuery(Seq(v: VectorQuery, t: TermQuery, o: OrQuery), Combiner.SUM) =>
        assert(v.field == "colbert")
        assert(v.queryTokens.map(_.toSeq).toSeq == Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)))
        assert(t == TermQuery("cat", "news"))
        assert(o.combiner == Combiner.MAX)
        assert(o.children(1) == RangeQuery("num", 0.0, 5.0))
      case other => fail(s"unexpected: $other")
    }
  }

  test("unknown type is rejected") {
    intercept[IllegalArgumentException] {
      WireCodec.queryFromJson("""{"type":"nope"}""")
    }
  }
}
