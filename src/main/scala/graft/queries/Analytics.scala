package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytics supersets beyond the reference's operator inventory (which has
  * no window functions, grouping sets, quantiles, or temporal joins —
  * SURVEY §2.5/§2.6): the operations a training-data/analytics engine is
  * expected to provide at scale, each expressed as the idiomatic declarative
  * plan with a DuckDB oracle.
  */
object Analytics {
  import QueryDef._

  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(
    // AS1 — as-of (temporal) join: each purchase picks up the most recent
    // prior-or-simultaneous click of the same user. Spark has no ASOF JOIN
    // operator; the scalable form is the union + running-last window — ONE
    // shuffle on the join key, no range join, no driver work. The right side
    // is pre-aggregated per (user, ts) so tie semantics match ASOF exactly.
    sql("q_asof_join", Seq("AS1"),
      """WITH l AS (SELECT event_id, user_id, epoch_ms(ts) AS tms FROM events
        |           WHERE event_type = 'purchase'),
        |r AS (SELECT user_id, epoch_ms(ts) AS tms, max(value) AS click_value
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, r.tms AS click_ms, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tms >= r.tms
        |ORDER BY l.event_id""".stripMargin) {
      (s, dir) =>
        val ev = Tables.events(s, dir)
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_millis(col("ts")).as("tms"),
            lit(1).as("side"), col("event_id"),
            lit(null).cast("double").as("cv"))
        val r = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), unix_millis(col("ts")).as("tms"))
          .agg(max(col("value")).as("cv"))
          .select(col("user_id"), col("tms"), lit(0).as("side"),
            lit(null).cast("long").as("event_id"), col("cv"))
        // right rows sort before left rows at equal ts => "<=" semantics
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tms"), col("side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        l.unionByName(r)
          .withColumn("click_ms",
            last(when(col("side") === 0, col("tms")), ignoreNulls = true).over(w))
          .withColumn("click_value",
            last(when(col("side") === 0, col("cv")), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("event_id"), col("user_id"), col("click_ms"), col("click_value"))
          .orderBy("event_id")
    },

    // AGG2 — ROLLUP grouping sets (absent in the reference; free in Spark's
    // hash aggregate with map-side partials over the expanded grouping ids).
    sql("q_rollup", Seq("AGG2"),
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(CAST(l_quantity AS DECIMAL(18,2))),2)::DOUBLE AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity").cast(dec)), 2).cast("double").as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // AGG3 — exact linear-interpolated quantiles per group (Spark
    // `percentile` == DuckDB `quantile_cont`). Both engines interpolate
    // a + (b-a)*h over the sorted values; floorRound pins the cross-engine
    // rounding.
    sql("q_percentile", Seq("AGG3"),
      """SELECT l_returnflag,
        |  floor(quantile_cont(l_quantity, 0.5) * 10000 + 0.5) / 10000 AS p50,
        |  floor(quantile_cont(l_quantity, 0.9) * 10000 + 0.5) / 10000 AS p90,
        |  floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000 AS price_p50
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            QueryDef.floorRound(percentile(col("l_quantity"), lit(0.5)), 4).as("p50"),
            QueryDef.floorRound(percentile(col("l_quantity"), lit(0.9)), 4).as("p90"),
            QueryDef.floorRound(percentile(col("l_extendedprice"), lit(0.5)), 4)
              .as("price_p50"))
          .orderBy("l_returnflag")
    },

    // AGG4 — distinct-count per group (absent in the reference; partial
    // aggregation on (group, value) then a count — two map-side-combined
    // shuffles, the standard scalable shape; swap in approx_count_distinct
    // (HLL) for sketch-sized state at corpus scale).
    sql("q_distinct_agg", Seq("AGG4"),
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"), count(lit(1)).as("n"))
          .orderBy("l_returnflag")
    },

    // AGG4-scale — the HLL sketch twin of q_distinct_agg: constant
    // sketch-sized aggregation state per group instead of the exact path's
    // per-distinct-value state, which is what distinct-count must become at
    // corpus scale. No SQL oracle (DuckDB's approx_count_distinct uses a
    // different HLL implementation, so estimates differ by design); the
    // relative-error bound vs the exact count is asserted in AnalyticsSpec.
    rowsOnly("q_distinct_hll", Seq("AGG4")) { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // ST2 — session windows (gap-based). The Spark side is the SAME
    // `session_window` aggregation that runs incrementally under Structured
    // Streaming with a watermark (StreamingIngest.sessionWindows;
    // StreamingSpec proves the streaming twin); session end = last event +
    // gap, per Spark's definition, which the oracle replicates with a
    // running new-session flag.
    sql("q_session_window", Seq("ST2"),
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS tms FROM events),
        |l AS (SELECT user_id, event_id, tms,
        |  CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) IS NULL
        |       OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) > 1800000
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |g AS (SELECT user_id, tms,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS sid FROM l)
        |SELECT user_id, min(tms) AS session_start_ms,
        |  max(tms) + 1800000 AS session_end_ms, count(*) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_ms""".stripMargin) {
      (s, dir) =>
        graft.streaming.StreamingIngest.sessionWindows(
            Tables.events(s, dir), gap = "30 minutes")
          .orderBy("user_id", "session_start_ms")
    }
  )
}
