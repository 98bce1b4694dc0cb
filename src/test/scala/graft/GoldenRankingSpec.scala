package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.scalatest.funsuite.AnyFunSuite

/** Shared corpus/query/index builder for the golden ranking fixture — the
  * Spark-side analogue of the reference's golden ColBERT test
  * (tests/colbert_test.cpp:27-104 asserting tests/data/colbert.ranking.tsv
  * exactly). The reference's prebuilt RocksDB index is unreadable without
  * LintDB, so the fixture is GENERATED once from a deterministic seeded
  * corpus ([[GoldenRankingGen]]), checked into src/test/resources, and
  * asserted EXACTLY per codec: any ranking regression fails a diff, not a
  * threshold. */
object GoldenRanking {
  val dim = 16
  val numDocs = 120
  val toksPerDoc = 4
  val numQueries = 8
  val k = 10
  val fixture = "golden_ranking.tsv"

  val codecs: Seq[QuantizerKind.Value] =
    Seq(QuantizerKind.NONE, QuantizerKind.BINARIZER, QuantizerKind.PRODUCT_ENCODER)

  /** Zero-centered seeded token embeddings (same family as IndexSpec: the
    * binarizer trains residual quantiles, all-positive data would collapse
    * to one bucket). */
  lazy val corpus: IndexedSeq[(Long, Seq[Seq[Float]])] = {
    val rnd = new scala.util.Random(20260813L)
    (0L until numDocs.toLong).map { i =>
      i -> Seq.fill(toksPerDoc)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
  }

  /** Query q = doc (q*13)'s tokens, perturbed — a clear best doc plus a
    * meaningfully ordered tail of random near-misses. */
  lazy val queries: IndexedSeq[(Int, Array[Array[Float]])] = {
    val rnd = new scala.util.Random(777L)
    (0 until numQueries).map { q =>
      val base = corpus((q * 13) % numDocs)._2
      q -> base.map(_.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f).toArray).toArray
    }
  }

  def buildIndex(spark: org.apache.spark.sql.SparkSession,
      quant: QuantizerKind.Value): IndexIVF = {
    import spark.implicits._
    val docs = corpus.map { case (i, t) => (i, t) }.toDF("id", "colbert")
    val idx = IndexIVF.create(spark,
      java.nio.file.Files.createTempDirectory(s"idx_golden_$quant").toString,
      GSchema(Seq(GField.colbert("colbert", dim, numCentroids = 8,
        quantization = quant, numIterations = 4, nbits = 2, numSubquantizers = 4))))
    idx.train(docs)
    idx.add(1, docs)
    idx
  }

  def rank(idx: IndexIVF, q: Array[Array[Float]]): Seq[Long] =
    idx.search(1, VectorQuery("colbert", q), k,
        SearchOptions(kTopCentroids = 8, nProbe = 8))
      .select("doc_id").collect().map(_.getLong(0)).toSeq

  /** codec -> query -> ranked doc ids, computed live. */
  def computeAll(spark: org.apache.spark.sql.SparkSession): Seq[String] =
    codecs.flatMap { c =>
      val idx = buildIndex(spark, c)
      queries.flatMap { case (qid, q) =>
        rank(idx, q).zipWithIndex.map { case (doc, r) =>
          s"$c\t$qid\t${r + 1}\t$doc"
        }
      }
    }
}

/** One-time fixture generator:
  * sbt -batch "Test/runMain graft.GoldenRankingGen" writes
  * src/test/resources/golden_ranking.tsv; the TSV is checked in and
  * GoldenRankingSpec asserts against it forever after. */
object GoldenRankingGen {
  def main(args: Array[String]): Unit = {
    val lines = "codec\tquery\trank\tdoc_id" +: GoldenRanking.computeAll(TestSpark.spark)
    val out = java.nio.file.Paths.get("src/test/resources/" + GoldenRanking.fixture)
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, lines.mkString("\n") + "\n")
    println(s"[golden] wrote ${lines.length - 1} rows to $out")
    TestSpark.spark.stop()
  }
}

/** The golden assertion: live top-k rankings, per codec, must equal the
  * checked-in fixture LINE FOR LINE. */
class GoldenRankingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("golden ranking fixture matches exactly across all three codecs") {
    val url = getClass.getClassLoader.getResource(GoldenRanking.fixture)
    assert(url != null, s"missing fixture ${GoldenRanking.fixture} — run " +
      "'Test/runMain graft.GoldenRankingGen' once and commit the file")
    val src = scala.io.Source.fromURL(url)
    val expected = try src.getLines().drop(1).toVector finally src.close()
    val got = GoldenRanking.computeAll(spark).toVector
    // compare with a readable first-difference message, not a 720-line diff
    expected.zip(got).zipWithIndex.collectFirst {
      case ((e, g), i) if e != g => (i, e, g)
    }.foreach { case (i, e, g) =>
      fail(s"golden ranking diverged at data line ${i + 1}: expected '$e', got '$g'")
    }
    assert(got.length == expected.length,
      s"row count ${got.length} != fixture ${expected.length}")
  }
}
