package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pins q_mmr_rerank's semantics on a CRAFTED two-cluster corpus where
  * diversification must change the selection — something the sf-testdata
  * oracle can't show (on natural data MMR may coincide with plain top-k).
  *
  * Construction (dim 4, all unit vectors): the query is e1; cluster A
  * (30 docs) sits at cos 0.90 to the query with pairwise cos ~= 1.0
  * (near-duplicates); cluster B (20 docs) at cos 0.88 on the OPPOSITE
  * side of the query (sin of the angle negated), so cos(A, B) =
  * 0.9*0.88 - 0.43589*0.47497 ~= 0.585. Plain relevance top-10 is all-A
  * (0.90 > 0.88). MMR with lambda = 0.7 in the x10000 integer domain:
  *   pick 1: best-rel A (7*9000 = 63000)
  *   pick 2: any A scores 7*9000 - 3*10000 = 33000; any B scores
  *           7*8800 - 3*5850 = 44050  -> a B MUST be picked
  *   picks 3..10: A = 33000 beats B = 7*8800 - 3*10000 = 31600 -> all A.
  * So the pinned shape is: rank 1 in A, rank 2 in B, exactly one B total —
  * a selection plain top-k can never produce on this corpus.
  */
class MmrSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("MMR diversifies: near-duplicate cluster yields one slot to the diverse cluster") {
    val dir = Files.createTempDirectory("graft_mmr").toFile.getAbsolutePath
    val relA = 0.90; val sinA = math.sqrt(1 - relA * relA)
    val relB = 0.88; val sinB = -math.sqrt(1 - relB * relB)
    def vec(c: Double, s: Double, eps: Double): Array[Float] = {
      val raw = Array(c, s, eps, 0.0)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val aIds = (1L to 30L)
    val bIds = (101L to 120L)
    val rows =
      Seq(Row(0L, Array(1f, 0f, 0f, 0f).toSeq, "query")) ++
        aIds.map(i => Row(i, vec(relA, sinA, 1e-4 * i).toSeq, "a")) ++
        bIds.map(i => Row(i, vec(relB, sinB, 1e-4 * (i - 100)).toSeq, "b"))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val sel = SparkEntry.queries("q_mmr_rerank")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(sel.map(_._1).toSeq == (1L to 10L), "ranks must be exactly 1..10")
    assert(sel.map(_._2).distinct.length == 10, "picked docs must be distinct")
    val picks = sel.map(_._2)
    assert(aIds.contains(picks(0)), s"rank 1 must be the top-relevance cluster-A doc, got ${picks(0)}")
    assert(bIds.contains(picks(1)), s"rank 2 must come from the diverse cluster B, got ${picks(1)}")
    assert(picks.count(bIds.contains) == 1,
      s"exactly one B slot at lambda=0.7 on this construction, got ${picks.count(bIds.contains)}")
    assert(picks.drop(2).forall(aIds.contains), "ranks 3..10 revert to cluster A")
  }

  test("MMR on the sf0.001 corpus: ranks 1..10, rank 1 = top cosine") {
    val sf = "/root/testdata/sf0.001"
    val sel = SparkEntry.queries("q_mmr_rerank")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(sel.map(_._1).toSeq == (1L to 10L))
    assert(sel.map(_._2).distinct.length == 10)
    // rank 1 is pure argmax relevance — must equal the cosine top-1 (the
    // x10000 quantized rel is monotone in q_cosine_topk's round(cos, 4)
    // score and both tie-break on lowest vec_id)
    val top1 = SparkEntry.queries("q_cosine_topk")(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("vec_id"))
      .limit(1).collect().head
    assert(sel.head._2 == top1.getAs[Long]("vec_id"),
      s"MMR rank 1 ${sel.head._2} != cosine top-1 ${top1.getAs[Long]("vec_id")}")
  }
}
