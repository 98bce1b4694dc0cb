package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for scale-sensitivity measurement
  * (ScaleSpec + ProfMain "scale" mode). Writes documents.parquet /
  * embeddings.parquet shaped like the driver's testdata into a caller-owned
  * temp dir — NEVER touches /root/testdata.
  *
  * The corpus is built so that growing n grows the NUMBER of hazards, not
  * their per-key SIZE (the shape real corpora have — more dup clusters, not
  * one ever-bigger cluster), which is exactly the regime where the banded/
  * bucketed dedup plans should stay near-linear:
  *
  *  - docs come in near-dup pairs (2g, 2g+1): `TokensPerDoc` random tokens
  *    from a `Vocab`-word vocabulary, the odd sibling differs in exactly one
  *    mid-doc token -> shingle Jaccard ~0.90, one guaranteed near-dup pair
  *    per group at every scale;
  *  - every chunk of `chunk` docs opens with a `DupCluster`-copy EXACT-dup
  *    cluster (one fixed text per chunk): each of its LSH band buckets has
  *    DupCluster > BucketCap members and each of its shingles has
  *    df = DupCluster > ShingleDfCap, so the hot-key caps MUST fire at every
  *    scale — and fire per chunk, linearly;
  *  - every 10th group carries a fixed 5-token stop-phrase prefix, whose
  *    leading shingles reach df ~ n/10: a second, non-dup-driven df-cap
  *    trigger.
  */
object ScaleData {
  val Vocab = 1000
  val TokensPerDoc = 60
  val DupCluster = 150

  /** Deterministic per-id text (depends only on id and chunk — safe under
    * any partitioning). */
  def docText(id: Long, chunk: Int): String = {
    if (id % chunk < DupCluster) {
      // the chunk's exact-dup cluster: one fixed random text per chunk
      val rnd = new scala.util.Random((id / chunk) * 7919L + 101L)
      Array.fill(TokensPerDoc)("w" + rnd.nextInt(Vocab)).mkString(" ")
    } else {
      val g = id / 2
      val rnd = new scala.util.Random(g * 1000003L + 17L)
      val toks = Array.fill(TokensPerDoc)("w" + rnd.nextInt(Vocab))
      // odd sibling: one token swapped to an out-of-vocab marker
      if (id % 2 == 1) toks(TokensPerDoc / 2) = "x" + rnd.nextInt(Vocab)
      val body = toks.mkString(" ")
      if (g % 10 == 3) "the quick brown fox jumps " + body else body
    }
  }

  /** Deterministic clustered embedding: anchor (id % k) plus per-id noise.
    * With k = n / clusterSize the per-cluster population stays ~constant as
    * n grows — the regime where IVF-clustered near-dup stays linear. */
  def embVec(id: Long, k: Int): Seq[Float] = {
    val ar = new scala.util.Random((id % k) * 7919L + 5L)
    val anchor = Array.fill(64)(ar.nextFloat() * 2f - 1f)
    val rnd = new scala.util.Random(id * 104729L + 11L)
    anchor.map(x => x + (rnd.nextFloat() * 2f - 1f) * 0.3f).toSeq
  }

  /** Write a synthetic corpus into `dir` (documents + embeddings parquet,
    * same names/columns the driver's testdata uses). Returns k, the
    * embedding anchor count ( = centroid count the IVF near-dup measurement
    * should use). */
  def writeCorpus(spark: SparkSession, dir: String, nDocs: Int, nEmb: Int,
      chunk: Int, clusterSize: Int = 150): Int = {
    val textU = udf((id: Long) => docText(id, chunk))
    spark.range(nDocs)
      .select(col("id").as("doc_id"), textU(col("id")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val k = math.max(1, nEmb / clusterSize)
    val embU = udf((id: Long) => embVec(id, k))
    spark.range(nEmb)
      .select(col("id").as("vec_id"),
        embU(col("id")).cast("array<float>").as("embedding"),
        (col("id") % k).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    k
  }

  /** embeddings frame + its first-k centroid frame, in the (emb, cemb)
    * shape Similarity.neardupIvfPairs expects. */
  def embWithCentroids(spark: SparkSession, dir: String, k: Int): (DataFrame, DataFrame) = {
    val e = graft.queries.Tables.emb(spark, dir)
    val c = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("centroid"), col("emb").as("cemb"))
    (e, c)
  }
}
