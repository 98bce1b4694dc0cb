package graft.query

import graft.core.GDataType
import graft.index.IndexIVF
import graft.scoring.Plaid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query compiler + two-phase executor: the Spark re-expression of the
  * reference's iterator algebra and PLAID pipeline (SURVEY §3.1).
  *
  *  - QueryNode -> DataFrame(doc_id, score) replaces QueryNode -> DocIterator
  *    (lintdb/query/QueryNode.cpp): Term = pruned scan of `scalars`,
  *    Vector = centroid-pruned scan of `postings` + phase-1 scoring over
  *    `context` codes, And = multi-way inner join on doc_id, Or = full-outer
  *    union — Catalyst's sort-merge/broadcast joins replace the hand-built
  *    merge iterators (DocIterator.cpp:136-322).
  *  - Query planning (centroid selection, KnnNearestCentroids.cpp) happens
  *    on the driver against the small centroid matrix; the per-query
  *    (numQueryTokens x numCentroids) score matrix is broadcast, never
  *    joined (SURVEY §7.5.3).
  *  - Two-phase ranking (QueryExecutor.cpp:14-71): phase-1 approximate
  *    scores for all candidates -> top num_second_pass -> phase-2 exact
  *    MaxSim on decompressed residuals (normalize=true, ColBERTScorer
  *    semantics: the exact score REPLACES the approximate one) -> top k ->
  *    hydrate Stored fields from `docs`.
  */
object Searcher {

  def search(idx: IndexIVF, tenant: Long, root: QueryNode, k: Int,
      opts: SearchOptions): DataFrame = {
    val spark = idx.spark
    val phase1 = compile(idx, tenant, root, opts)

    val vectorNodes = collectVectors(root)
    val reranked =
      if (opts.secondPass && vectorNodes.nonEmpty) {
        val v = vectorNodes.head
        val f = idx.schema.field(v.field)
        val fid = idx.mapper.id(v.field)
        val dim = f.parameters.dimensions
        val nq = v.queryTokens.length
        val flatQuery = v.queryTokens.flatten
        val bq = spark.sparkContext.broadcast(idx.quantizers(v.field))
        val bquery = spark.sparkContext.broadcast(flatQuery)
        val rerankUdf = udf { (codes: Seq[Long], residuals: Array[Byte]) =>
          val quant = bq.value
          val n = codes.length
          val doc = new Array[Float](n * dim)
          var i = 0
          while (i < n) {
            val tok = quant.decode(java.util.Arrays.copyOfRange(
              residuals, i * quant.codeSize, (i + 1) * quant.codeSize))
            System.arraycopy(tok, 0, doc, i * dim, dim)
            i += 1
          }
          Plaid.scoreByResiduals(bquery.value, nq, doc, n, dim, normalize = true)
            .toDouble
        }
        val pool = phase1
          .orderBy(col("score").desc, col("doc_id"))
          .limit(opts.numSecondPass)
        val ctx = idx.contextDf
          .filter(col("tenant") === tenant && col("field") === fid)
          .dropDuplicates("doc_id")
          .select(col("doc_id"), col("doc_codes"), col("doc_residuals"))
        pool.join(ctx, Seq("doc_id"))
          .select(col("doc_id"),
            rerankUdf(col("doc_codes"), col("doc_residuals")).as("score"))
      } else phase1

    val top = reranked.orderBy(col("score").desc, col("doc_id")).limit(k)

    if (idx.schema.storedFields.nonEmpty) {
      val docs = idx.docsDf.filter(col("tenant") === tenant)
        .dropDuplicates("doc_id").drop("tenant")
      top.join(broadcast(docs).hint("broadcast"), Seq("doc_id"), "left")
        .orderBy(col("score").desc, col("doc_id"))
    } else top
  }

  /** QueryNode -> DataFrame(doc_id, score:double). */
  def compile(idx: IndexIVF, tenant: Long, node: QueryNode,
      opts: SearchOptions): DataFrame = node match {

    case TermQuery(field, value) =>
      val f = idx.schema.field(field)
      val fid = idx.mapper.id(field)
      idx.scalarsDf
        .filter(col("tenant") === tenant && col("field") === fid &&
          col("value_str") === IndexIVF.canonicalValue(f, value))
        .select(col("doc_id")).distinct()
        .withColumn("score", lit(1.0))

    case RangeQuery(field, lo, hi) =>
      val fid = idx.mapper.id(field)
      idx.scalarsDf
        .filter(col("tenant") === tenant && col("field") === fid &&
          col("value_num").between(lo, hi))
        .select(col("doc_id")).distinct()
        .withColumn("score", lit(1.0))

    case v: VectorQuery => compileVector(idx, tenant, v, opts)

    case AndQuery(children, comb) =>
      children.map(c => compile(idx, tenant, c, opts))
        .zipWithIndex
        .map { case (df, i) => df.withColumnRenamed("score", s"s_$i") }
        .reduce((a, b) => a.join(b, Seq("doc_id"), "inner"))
        .select(col("doc_id"),
          combine(comb, children.indices.map(i => col(s"s_$i")), orMode = false)
            .as("score"))

    case OrQuery(children, comb) =>
      children.map(c => compile(idx, tenant, c, opts))
        .zipWithIndex
        .map { case (df, i) => df.withColumnRenamed("score", s"s_$i") }
        .reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
        .select(col("doc_id"),
          combine(comb, children.indices.map(i => col(s"s_$i")), orMode = true)
            .as("score"))
  }

  /** Score combiners (scoring_methods.cpp:61-85). In OR position a child
    * that didn't match contributes the combiner's identity. */
  private def combine(comb: Combiner.Value,
      scores: Seq[org.apache.spark.sql.Column], orMode: Boolean) = comb match {
    case Combiner.SUM =>
      scores.map(s => if (orMode) coalesce(s, lit(0.0)) else s).reduce(_ + _)
    case Combiner.MAX => greatest(scores: _*)
    case Combiner.PRODUCT =>
      scores.map(s => if (orMode) coalesce(s, lit(1.0)) else s).reduce(_ * _)
  }

  /** The ANN leaf (QueryNode.cpp:29-101 + ANNIterator): pick probe
    * centroids on the driver, prune `postings` to those lists, dedup doc
    * ids, phase-1 score via the broadcast query-x-centroid matrix over the
    * doc's stored codes. */
  private def compileVector(idx: IndexIVF, tenant: Long, v: VectorQuery,
      opts: SearchOptions): DataFrame = {
    val spark = idx.spark
    val fid = idx.mapper.id(v.field)
    val cq = idx.coarse.getOrElse(v.field,
      throw new IllegalStateException(s"field ${v.field} is not trained"))
    val nq = v.queryTokens.length
    val nc = cq.numCentroids

    // driver-side query planning: full (nq x nc) score matrix, top
    // k_top_centroids per token -> per-centroid max -> top n_probe
    // (KnnNearestCentroids.cpp:6-110)
    val scoreMatrix = new Array[Float](nq * nc)
    v.queryTokens.zipWithIndex.foreach { case (tok, i) =>
      System.arraycopy(cq.scoreAll(tok), 0, scoreMatrix, i * nc, nc)
    }
    val kTop = math.min(opts.kTopCentroids, nc)
    val high = new Array[Float](nc)
    (0 until nq).foreach { i =>
      val row = (0 until nc).map(c => (c, scoreMatrix(i * nc + c)))
        .sortBy { case (c, s) => (-s, c) }
      row.take(kTop).foreach { case (c, s) => if (s > high(c)) high(c) = s }
    }
    val probes = high.zipWithIndex.filter(_._1 > 0)
      .sortBy { case (s, c) => (-s, c) }
      .take(opts.nProbe).map(_._2.toLong)

    val candidates = idx.postingsDf
      .filter(col("tenant") === tenant && col("field") === fid &&
        col("centroid").isin(probes: _*))
      .select(col("doc_id")).distinct()

    val bScores = spark.sparkContext.broadcast(scoreMatrix)
    val scoreUdf = opts.embeddingScoring match {
      case EmbeddingScoring.PLAID =>
        udf((codes: Seq[Long]) =>
          Plaid.colbertCentroidScore(codes.toArray, bScores.value, nq, nc).toDouble)
      case EmbeddingScoring.CODES =>
        val maxByCentroid = Plaid.maxScoreByCentroid(
          Array.tabulate(nq * nc)(i => i % nc), scoreMatrix, nc)
        val bMax = spark.sparkContext.broadcast(maxByCentroid)
        udf((codes: Seq[Long]) =>
          Plaid.scoreDocumentsByCodes(bMax.value, codes.toArray,
            opts.centroidScoreThreshold).toDouble)
    }

    val ctx = idx.contextDf
      .filter(col("tenant") === tenant && col("field") === fid)
      .dropDuplicates("doc_id")
      .select(col("doc_id"), col("doc_codes"))
    candidates.join(ctx, Seq("doc_id"))
      .select(col("doc_id"), scoreUdf(col("doc_codes")).as("score"))
  }

  private def collectVectors(node: QueryNode): Seq[VectorQuery] = node match {
    case v: VectorQuery => Seq(v)
    case AndQuery(cs, _) => cs.flatMap(collectVectors)
    case OrQuery(cs, _) => cs.flatMap(collectVectors)
    case _ => Seq.empty
  }
}
