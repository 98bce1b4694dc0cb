package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounds for the sketch-based analytics variants (the exact twins are
  * oracle-checked by the driver; sketches can't hash-match a different
  * engine's implementation, so their contract is a relative-error bound).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("q_distinct_hll tracks the exact distinct count within 3x rsd " +
      "at every testdata scale factor") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val approx = SparkEntry.queries("q_distinct_hll")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = SparkEntry.queries("q_distinct_agg")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet, s"$sf: group sets diverge")
      exact.foreach { case (g, ex) =>
        val ap = approx(g)
        val relErr = math.abs(ap - ex).toDouble / ex
        // rsd=0.02 is the HLL++ standard deviation; 3 sigma is a stable bound
        assert(relErr <= 0.06,
          s"$sf group $g: approx $ap vs exact $ex (relErr $relErr > 0.06)")
      }
    }
  }
}
