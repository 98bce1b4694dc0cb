package graft

import graft.core._
import graft.index.IndexIVF
import graft.query._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval-quality bar, in the spirit of the reference's LoTTE Success@k
  * evaluation (benchmarks/lotte/common.py:275-305): index the embeddings
  * table as label-documents, query each label with a held-out subset of its
  * own vectors, and require the true label to rank in the top-k. Runs over
  * all quantizers so the lossy codecs are held to the same bar. */
class RetrievalQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def buildIndex(quant: QuantizerKind.Value): (IndexIVF, Map[Long, Array[Array[Float]]]) = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val docs = e.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"))
      .select(col("label").cast("long").as("id"),
        expr("transform(toks, t -> t.embedding)").as("colbert"))
    val idx = IndexIVF.create(spark,
      java.nio.file.Files.createTempDirectory(s"idx_quality_$quant").toString,
      GSchema(Seq(GField.colbert("colbert", 64, numCentroids = 16,
        quantization = quant, numIterations = 4, nbits = 2, numSubquantizers = 8))))
    idx.train(docs)
    idx.add(1, docs)
    // held-out query per label: that label's first 3 member vectors
    val queries = docs.collect().map { r =>
      r.getLong(0) -> r.getSeq[scala.collection.Seq[Float]](1)
        .take(3).map(_.toArray).toArray
    }.toMap
    (idx, queries)
  }

  for (quant <- Seq(QuantizerKind.NONE, QuantizerKind.BINARIZER, QuantizerKind.PRODUCT_ENCODER))
    test(s"$quant: success@3 == 1.0 for label self-retrieval") {
      val (idx, queries) = buildIndex(quant)
      val opts = SearchOptions(kTopCentroids = 8, nProbe = 16)
      val hits = queries.toSeq.sortBy(_._1).map { case (label, q) =>
        val top = idx.search(1, VectorQuery("colbert", q), 3, opts)
          .select("doc_id").collect().map(_.getLong(0))
        if (top.contains(label)) 1 else 0
      }
      val successAt3 = hits.sum.toDouble / hits.size
      assert(successAt3 == 1.0, s"$quant success@3 = $successAt3")
    }
}
