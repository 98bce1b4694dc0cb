package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (fast iteration)
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2).headOption.map(_.split(',').toSet))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A throwing query must be LOUD in the artifact, not just on stderr:
    // in round 9 three queries started crashing at analysis, wrote no
    // output dir, and silently vanished from the driver's correctness
    // artifact (CORRECTNESS_r09 read all-green with 3 queries missing).
    // Every failure is collected and written to _errors.json alongside the
    // results, so a vanished query is detectable from the verify output
    // alone — an empty {} asserts "every query produced output".
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1))).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        // sentinel output: a 1-row frame whose schema can never match an
        // oracle, so the driver's artifact records this query as a LOUD
        // (rows/schema/hash) mismatch instead of silently omitting the key
        // (how round 9's three analysis crashes read as all-green)
        try {
          import spark.implicits._
          Seq(errors(name)).toDF("_graft_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // loud but exit-0: the driver must still collect the partial results
    // and the oracle SQL — a nonzero exit could void the whole round's
    // correctness artifact over one broken query, recreating the blind spot
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} FAILED (see _errors.json): ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
