package graft.scoring

/** Pure-Scala PLAID/ColBERT scoring kernels (reference:
  * lintdb/scoring/plaid.cpp). These run executor-side inside functions over
  * candidate rows — each call touches one document, so search parallelism is
  * ordinary data parallelism (the Spark analogue of the reference's OpenMP
  * loop at QueryExecutor.cpp:29).
  */
object Plaid {

  /** Phase-1 approximate score (reference colbert_centroid_score,
    * plaid.cpp:65-95): over the document's UNIQUE centroid codes, take the
    * per-query-token max centroid score, then sum over query tokens.
    *
    * @param centroidScores row-major (numQueryTokens x numCentroids)
    */
  def colbertCentroidScore(
      docCodes: Array[Long],
      centroidScores: Array[Float],
      numQueryTokens: Int,
      numCentroids: Int): Float = {
    val perToken = Array.fill(numQueryTokens)(-9999.0f)
    val seen = new java.util.HashSet[Long]()
    var j = 0
    while (j < docCodes.length) {
      val code = docCodes(j)
      if (seen.add(code)) {
        var k = 0
        while (k < numQueryTokens) {
          val s = centroidScores(k * numCentroids + code.toInt)
          if (s > perToken(k)) perToken(k) = s
          k += 1
        }
      }
      j += 1
    }
    var score = 0.0f
    var k = 0
    while (k < numQueryTokens) { score += perToken(k); k += 1 }
    score
  }

  /** Simpler phase-1 variant (reference score_documents_by_codes,
    * plaid.cpp:38-63): sum over unique doc codes of the per-centroid max
    * query score, thresholded. */
  def scoreDocumentsByCodes(
      maxScoresByCentroid: Array[Float],
      docCodes: Array[Long],
      centroidScoreThreshold: Float): Float = {
    val seen = new java.util.HashSet[Long]()
    var score = 0.0f
    var j = 0
    while (j < docCodes.length) {
      val code = docCodes(j)
      val s = maxScoresByCentroid(code.toInt)
      if (s >= centroidScoreThreshold && seen.add(code)) score += s
      j += 1
    }
    score
  }

  /** Per-centroid max score over query tokens (reference
    * max_score_by_centroid, plaid.cpp:98-117): reduces the (token, centroid,
    * score) candidate list; unvisited centroids stay 0. */
  def maxScoreByCentroid(
      coarseIdx: Array[Int],
      distances: Array[Float],
      numCentroids: Int): Array[Float] = {
    val out = new Array[Float](numCentroids)
    var i = 0
    while (i < coarseIdx.length) {
      if (distances(i) > out(coarseIdx(i))) out(coarseIdx(i)) = distances(i)
      i += 1
    }
    out
  }

  /** Phase-2 exact MaxSim (reference score_document_by_residuals,
    * plaid.cpp:119-185): optionally L2-normalize doc tokens, compute the
    * (docTokens x queryTokens) score matrix, take per-query-token max
    * (floored at 0, matching the reference's 0-initialized max), sum.
    *
    * @param query row-major (numQueryTokens x dim)
    * @param docTokens row-major (numDocTokens x dim), mutated if normalize
    */
  def scoreByResiduals(
      query: Array[Float],
      numQueryTokens: Int,
      docTokens: Array[Float],
      numDocTokens: Int,
      dim: Int,
      normalize: Boolean): Float = {
    if (normalize) l2NormalizeInPlace(docTokens, numDocTokens, dim)
    val maxScores = new Array[Float](numQueryTokens) // 0-init, like the reference
    var i = 0
    while (i < numDocTokens) {
      var j = 0
      while (j < numQueryTokens) {
        var s = 0.0f
        var d = 0
        val di = i * dim
        val qj = j * dim
        while (d < dim) { s += docTokens(di + d) * query(qj + d); d += 1 }
        if (s > maxScores(j)) maxScores(j) = s
        j += 1
      }
      i += 1
    }
    var total = 0.0f
    i = 0
    while (i < numQueryTokens) { total += maxScores(i); i += 1 }
    total
  }

  /** reference normalize_vector (lintdb/util.cpp:23-44): rows with zero norm
    * pass through. */
  def l2NormalizeInPlace(x: Array[Float], n: Int, dim: Int): Unit = {
    var i = 0
    while (i < n) {
      var s = 0.0f
      var d = 0
      while (d < dim) { val v = x(i * dim + d); s += v * v; d += 1 }
      val norm = math.sqrt(s).toFloat
      if (norm > 0) {
        d = 0
        while (d < dim) { x(i * dim + d) /= norm; d += 1 }
      }
      i += 1
    }
  }
}
