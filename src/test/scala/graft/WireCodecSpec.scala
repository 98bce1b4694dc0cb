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

  test("random query trees round-trip (seeded property)") {
    val rnd = new scala.util.Random(99L)
    def randTree(depth: Int): QueryNode =
      if (depth == 0) rnd.nextInt(3) match {
        case 0 => TermQuery(s"f${rnd.nextInt(4)}", rnd.nextLong())
        case 1 => RangeQuery(s"f${rnd.nextInt(4)}", rnd.nextDouble(), 1 + rnd.nextDouble())
        case _ => VectorQuery(s"v${rnd.nextInt(2)}",
          Array.fill(1 + rnd.nextInt(3))(Array.fill(4)(rnd.nextFloat())))
      }
      else {
        val kids = Seq.fill(1 + rnd.nextInt(3))(randTree(depth - 1))
        val comb = Combiner(rnd.nextInt(Combiner.maxId))
        if (rnd.nextBoolean()) AndQuery(kids, comb) else OrQuery(kids, comb)
      }
    // structural equality modulo Array identity: compare via re-serialization
    (1 to 50).foreach { _ =>
      val q = randTree(1 + rnd.nextInt(2))
      val json = WireCodec.queryToJson(q)
      assert(WireCodec.queryToJson(WireCodec.queryFromJson(json)) == json,
        s"round-trip not stable for $json")
    }
  }
}
