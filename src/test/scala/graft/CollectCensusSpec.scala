package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized collect() census (r14 verdict item 5): every `.collect()` in
  * src/main must be visibly driver-bounded, so the per-round hand audit of
  * the census (34 sites at r14 and growing) becomes a build-time check.
  *
  * A site passes when the 12 lines up to and including the call show one of
  * the allowed shapes:
  *
  *   1. an explicit `.limit(` on the collected plan — the collect is capped
  *      by construction;
  *   2. a SCALAR aggregate — `.agg(`/`countDistinct(`/`selectExpr("sum` with
  *      NO `groupBy(` in the window (a grouped aggregate keyed by a
  *      corpus-sized column is exactly the unbounded case this spec exists
  *      to catch, so grouping disqualifies the shape);
  *   3. a `bounded:` annotation stating WHY the result is metadata-sized
  *      (sqrt-subsample, <= K model rows, one row per partition, byte-gated
  *      pool, size-guarded bench corpus, ...) — the human-readable census
  *      entry, kept next to the code it justifies.
  *
  * A new corpus-sized collect matches none of these and fails the build
  * with its file:line, forcing either a plan fix or an explicit, reviewable
  * justification. The spec also pins a floor on the number of sites found,
  * so a regex or layout drift that silently blinds the scanner fails too.
  */
class CollectCensusSpec extends AnyFunSuite {
  private val Window = 12

  private def scalaSources(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toVector
    finally s.close()
  }

  test("every collect() in src/main is limit-capped, a scalar aggregate, " +
      "or carries a bounded: justification") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"spec must run from the repo root (cwd=${System.getProperty("user.dir")})")
    val collectCall = raw"\.collect\(\)".r
    val limitShape = raw"\.limit\(".r
    val scalarAggShape = raw"""\.agg\(|countDistinct\(|selectExpr\("sum""".r
    val groupByShape = raw"groupBy\(".r
    val annotation = "bounded:"

    var sites = 0
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    scalaSources(root).foreach { f =>
      val lines = java.nio.file.Files.readAllLines(f)
      (0 until lines.size).foreach { i =>
        if (collectCall.findFirstIn(lines.get(i)).isDefined) {
          sites += 1
          val window = (math.max(0, i - Window + 1) to i)
            .map(lines.get).mkString("\n")
          val ok = limitShape.findFirstIn(window).isDefined ||
            (scalarAggShape.findFirstIn(window).isDefined &&
              groupByShape.findFirstIn(window).isEmpty) ||
            window.contains(annotation)
          if (!ok) violations += s"$f:${i + 1}"
        }
      }
    }
    assert(violations.isEmpty,
      s"unjustified collect() sites (add a limit, make it a scalar agg, or " +
        s"annotate the bound with '$annotation <why>'):\n  " +
        violations.mkString("\n  "))
    // vacuous-scan guard: the census had 34 sites when this spec landed;
    // finding far fewer means the scanner (not the code) broke
    assert(sites >= 25, s"collect() scanner found only $sites sites — " +
      "the census regex or source layout drifted; fix the spec, don't trust it")
  }
}
