package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-capture tool (test scope): prints the driver-contract query's
  * `.explain("formatted")` output AFTER materializing it once, so AQE final
  * plans (and any engine-lifecycle side effects the DataFrame's lineage
  * rides on) are real. Used to produce the committed plans/rNN receipts.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt -batch "Test/runMain graft.ExplainMain q_neardup_jaccard ..."
  *
  * Output for query q is delimited by `===== q =====` / `----- end q -----`
  * lines so a shell loop can split one run into per-query files.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()  // materialize caches so AQE final plans are real
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"----- end $q -----")
    }
    spark.stop()
  }
}
