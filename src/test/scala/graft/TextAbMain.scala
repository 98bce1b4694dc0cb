package graft

import org.apache.spark.sql.SparkSession

/** Same-window text-family A/B runner (r19): times the banded dedup
  * pipelines on a ScaleData corpus big enough that the measured terms are
  * multi-second quiet (VERDICT r18 item 3 — sf0.1's 0.1-0.5 s queries
  * drown real deltas in fixed overhead). Identical copies run in the
  * before/after git worktrees back to back; the calibration probe prints
  * per rep so window drift is visible in the receipt.
  *
  *   sbt -batch "Test/runMain graft.TextAbMain <nDocs> <reps>"
  */
object TextAbMain {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(50000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("textab").toString
    ScaleData.writeCorpus(spark, dir, nDocs, nDocs, chunk = math.min(nDocs, 5000))
    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(200L * 1000 * 1000)
        .selectExpr("sum(cast(hash(id) as bigint))").collect()
      (System.nanoTime() - t0) / 1e6
    }
    cal() // warm the probe
    // warm codegen/kernels on a tiny corpus so rep 1 isn't compile time
    val w = java.nio.file.Files.createTempDirectory("textabW").toString
    ScaleData.writeCorpus(spark, w, 300, 300, chunk = 300)
    Seq("q_dedup_simhash", "q_dedup_minhash", "q_neardup_jaccard").foreach { q =>
      SparkEntry.queries(q)(spark, w).count()
    }
    (1 to reps).foreach { r =>
      graft.queries.DfCache.clear(spark)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val c = cal()
      Seq("q_dedup_simhash", "q_dedup_minhash", "q_neardup_jaccard").foreach { q =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"[ab] rep$r cal=$c%.0fms $q%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $n rows")
      }
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val n = graft.queries.TextPipeline.crossCorpusNearDups(spark,
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 7 =!= 0),
        d.filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0)).count()
      println(f"[ab] rep$r cal=$c%.0fms fuzzy-decon             ${(System.nanoTime() - t0) / 1e9}%7.2f s  $n rows")
    }
    spark.stop()
  }
}
