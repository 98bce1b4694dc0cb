package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanized collect() census (r14 verdict item 5, tightened r16): every
  * `.collect()` in src/main must be visibly driver-bounded, so the
  * per-round hand audit of the census (34 sites at r14 and growing) is a
  * build-time check.
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
  *   3. a `bounded:` annotation stating WHY the result is metadata-sized —
  *      and (r16) the annotation must NAME the enforcing construct: an
  *      identifier (a gate constant, a parameter, a filter/cut call) that
  *      actually occurs on a code line of the same file. A bare
  *      `bounded: small` — a justification a reviewer can't verify without
  *      re-deriving the bound — fails the build.
  *
  * A new corpus-sized collect matches none of these and fails the build
  * with its file:line, forcing either a plan fix or an explicit, reviewable
  * justification. The spec also pins a floor on the number of sites found,
  * so a regex or layout drift that silently blinds the scanner fails too.
  */
class CollectCensusSpec extends AnyFunSuite {
  private val Window = 12
  private val collectCall = raw"\.collect\(\)".r
  private val limitShape = raw"\.limit\(".r
  private val scalarAggShape = raw"""\.agg\(|countDistinct\(|selectExpr\("sum""".r
  private val groupByShape = raw"groupBy\(".r
  private val annotation = "bounded:"

  /** Candidate enforcing-construct names in an annotation: backtick-quoted
    * identifiers of any length (`` `k` ``, `` `b` ``) plus bare identifiers
    * of length >= 2 carrying an uppercase letter or an underscore (plain
    * prose words never match; maxSample / DeconBenchMaxShingles / vec_id
    * do). */
  private val backtickToken = raw"`([A-Za-z_][A-Za-z0-9_]*)`".r
  private val bareToken = raw"\b([A-Za-z_][A-Za-z0-9_]*)\b".r

  private def isCommentLine(l: String): Boolean = {
    val t = l.trim
    t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
  }

  /** The annotation text: from `bounded:` to end of line, plus up to two
    * following comment lines (annotations wrap). */
  private def annotationText(lines: IndexedSeq[String], at: Int): String = {
    val head = lines(at).substring(
      lines(at).indexOf(annotation) + annotation.length)
    val cont = (at + 1 to math.min(at + 2, lines.size - 1))
      .map(lines(_)).takeWhile(isCommentLine)
      .map(_.trim.stripPrefix("//").stripPrefix("*"))
    (head +: cont).mkString(" ")
  }

  /** Does the annotation name a construct that exists in this file's CODE
    * (non-comment lines, inline `//` tails stripped)? */
  private def namesEnforcingConstruct(text: String,
      codeLines: Seq[String]): Boolean = {
    val quoted = backtickToken.findAllMatchIn(text).map(_.group(1)).toSet
    val bare = bareToken.findAllMatchIn(text).map(_.group(1))
      .filter(t => t.length >= 2 && (t.exists(_.isUpper) || t.contains("_")))
      .toSet
    val candidates = quoted ++ bare
    candidates.exists { tok =>
      val word = (raw"\b" + java.util.regex.Pattern.quote(tok) + raw"\b").r
      codeLines.exists(l => word.findFirstIn(l).isDefined)
    }
  }

  /** All census violations in one file's lines; returns (sites, messages). */
  private def census(name: String,
      lines: IndexedSeq[String]): (Int, Seq[String]) = {
    val codeLines = lines.filterNot(isCommentLine)
      .map(l => l.indexOf("//") match {
        case -1 => l
        case i => l.substring(0, i)
      })
    var sites = 0
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    (0 until lines.size).foreach { i =>
      if (collectCall.findFirstIn(lines(i)).isDefined) {
        sites += 1
        val lo = math.max(0, i - Window + 1)
        val window = (lo to i).map(lines(_)).mkString("\n")
        val annAt = (lo to i).find(j => lines(j).contains(annotation))
        val ok = limitShape.findFirstIn(window).isDefined ||
          (scalarAggShape.findFirstIn(window).isDefined &&
            groupByShape.findFirstIn(window).isEmpty) ||
          annAt.exists(j =>
            namesEnforcingConstruct(annotationText(lines, j), codeLines))
        if (!ok) violations +=
          (if (annAt.isDefined)
            s"$name:${i + 1} (bounded: annotation names no enforcing " +
              "construct found on a code line of this file)"
          else s"$name:${i + 1}")
      }
    }
    (sites, violations.toSeq)
  }

  private def scalaSources(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala.filter(_.toString.endsWith(".scala")).toVector
    finally s.close()
  }

  test("every collect() in src/main is limit-capped, a scalar aggregate, " +
      "or carries a bounded: justification naming its enforcing construct") {
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"spec must run from the repo root (cwd=${System.getProperty("user.dir")})")
    var sites = 0
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    scalaSources(root).foreach { f =>
      import scala.jdk.CollectionConverters._
      val (s, v) = census(f.toString,
        java.nio.file.Files.readAllLines(f).asScala.toIndexedSeq)
      sites += s
      violations ++= v
    }
    assert(violations.isEmpty,
      s"unjustified collect() sites (add a limit, make it a scalar agg, or " +
        s"annotate the bound with '$annotation <why, naming the enforcing " +
        "gate/cut/parameter>'):\n  " + violations.mkString("\n  "))
    // vacuous-scan guard: the census had 34 sites when this spec landed;
    // finding far fewer means the scanner (not the code) broke
    assert(sites >= 25, s"collect() scanner found only $sites sites — " +
      "the census regex or source layout drifted; fix the spec, don't trust it")
  }

  test("the census rejects a bare 'bounded: small' justification and " +
      "accepts one naming a construct that exists in the file") {
    val bare = IndexedSeq(
      "object X {",
      "  val maxFoo = 5",
      "  // bounded: small",
      "  val rows = df.collect()",
      "}")
    val (s1, v1) = census("synthetic.scala", bare)
    assert(s1 == 1 && v1.size == 1, s"bare justification must fail: $v1")
    assert(v1.head.contains("synthetic.scala:4") &&
      v1.head.contains("no enforcing construct"))

    val named = bare.updated(2, "  // bounded: capped by maxFoo above")
    assert(census("synthetic.scala", named) == (1 -> Seq.empty),
      "an annotation naming a code construct must pass")

    // naming a construct that does NOT exist in the file still fails —
    // annotations can't cite phantom gates
    val phantom = bare.updated(2, "  // bounded: capped by maxBar elsewhere")
    assert(census("synthetic.scala", phantom)._2.size == 1,
      "an annotation citing a construct absent from the file must fail")

    // backtick-quoted short parameters validate against code
    val short = IndexedSeq(
      "def top(k: Int) = {",
      "  // bounded: <= `k` rows by construction",
      "  df.collect()",
      "}")
    assert(census("synthetic.scala", short)._2.isEmpty,
      "backticked short parameter naming must pass when the param exists")
  }
}
