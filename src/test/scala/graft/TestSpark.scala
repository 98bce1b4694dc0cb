package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites.
  *
  * Core count is env-overridable (`GRAFT_TEST_CPUS`), default 8: the old
  * hard-coded local[4] left a 32-core CI host 7/8 idle and pushed the full
  * suite's wall past the driver's verify window under external contention
  * (r18 `tests_ok: false` — zero failing assertions, the run just
  * outlived the window). Shuffle partitions track the core count; no
  * suite asserts a partition COUNT (plan-shape pins assert exchange
  * presence/absence, which is partition-count-invariant). */
object TestSpark {
  lazy val spark: SparkSession = {
    val cpus = sys.env.getOrElse("GRAFT_TEST_CPUS", "8")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
