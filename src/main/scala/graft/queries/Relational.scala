package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's relational operator surface mapped to Spark primitives
  * (SURVEY.md §2.3-§2.8, §2.11). Each entry is the idiomatic declarative
  * plan: filters/projections push to the parquet scan, intersections/unions
  * are set ops (shuffle on the key only), small sides are broadcast, money
  * aggregates run in DecimalType so sums are order-independent (bit-equal
  * to the DuckDB oracle regardless of partitioning).
  */
object Relational {
  import QueryDef._

  private val dec = DecimalType(18, 2)

  val defs: Seq[QueryDef] = Seq(
    // P1 — TermQueryNode: equality predicate, pushed to the parquet scan
    // (reference: lintdb/query/QueryNode.cpp:15-27 — value is the key prefix).
    sql("q_term_eq", Seq("P1", "SC1"),
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
    },

    // P2 — range predicate (deliberate superset; reference keys are
    // range-ordered but no range node exists, SURVEY §2.3).
    sql("q_term_range", Seq("P2", "SC4"),
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber")
    },

    // J1 — AndIterator: n-ary intersection of posting lists == set intersect
    // on the row key (reference: lintdb/query/DocIterator.cpp:136-235).
    sql("q_and_intersect", Seq("J1"),
      """SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08
        |INTERSECT
        |SELECT l_orderkey FROM lineitem WHERE l_tax < 0.03
        |ORDER BY l_orderkey""".stripMargin) {
      (s, dir) =>
        val li = Tables.t(s, dir, "lineitem")
        li.filter(col("l_discount") > 0.08).select("l_orderkey")
          .intersect(li.filter(col("l_tax") < 0.03).select("l_orderkey"))
          .orderBy("l_orderkey")
    },

    // J2 — OrIterator: union with dedup (reference: DocIterator.cpp:237-322).
    sql("q_or_union", Seq("J2"),
      """SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08
        |UNION
        |SELECT l_orderkey FROM lineitem WHERE l_tax < 0.03
        |ORDER BY l_orderkey""".stripMargin) {
      (s, dir) =>
        val li = Tables.t(s, dir, "lineitem")
        li.filter(col("l_discount") > 0.08).select("l_orderkey")
          .union(li.filter(col("l_tax") < 0.03).select("l_orderkey"))
          .distinct()
          .orderBy("l_orderkey")
    },

    // §2.8 — EXCEPT set op (free in Spark, absent as a reference operator;
    // completes the intersect/union family).
    sql("q_except", Seq("SET1"),
      """SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08
        |EXCEPT
        |SELECT l_orderkey FROM lineitem WHERE l_tax < 0.03
        |ORDER BY l_orderkey""".stripMargin) {
      (s, dir) =>
        val li = Tables.t(s, dir, "lineitem")
        li.filter(col("l_discount") > 0.08).select("l_orderkey")
          .except(li.filter(col("l_tax") < 0.03).select("l_orderkey"))
          .orderBy("l_orderkey")
    },

    // A1 — sum score combiner as hash aggregate with map-side partials
    // (reference: lintdb/scoring/scoring_methods.cpp:61-67). Decimal sums
    // are exact => order-independent => oracle-stable.
    sql("q_agg_sum", Seq("A1"),
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(CAST(l_quantity AS DECIMAL(18,2))),2)::DOUBLE AS sum_qty,
        |  round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))),2)::DOUBLE AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity").cast(dec)), 2).cast("double").as("sum_qty"),
            round(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount")).cast(dec)), 2)
              .cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag", "l_linestatus")
    },

    // A3 — max/min combiners (reference: scoring_methods.cpp:77-85).
    sql("q_agg_minmax", Seq("A3"),
      """SELECT l_returnflag, max(l_extendedprice) AS max_price,
        |  min(l_quantity) AS min_qty, max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            max(col("l_extendedprice")).as("max_price"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_shipdate")).as("last_ship"))
          .orderBy("l_returnflag")
    },

    // A2 — product ("reduce") combiner via exp(sum(ln)) — the log-domain
    // form keeps it a codegen'd hash aggregate (reference:
    // scoring_methods.cpp:69-75).
    sql("q_agg_product", Seq("A2"),
      """SELECT l_orderkey, round(product(1 + l_discount), 6) AS disc_factor,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(
            round(exp(sum(log(lit(1.0) + col("l_discount")))), 6).as("disc_factor"),
            count(lit(1)).as("n_lines"))
          .orderBy("l_orderkey")
    },

    // T1-T3 — global top-k: Catalyst plans orderBy+limit as
    // TakeOrderedAndProject (no full sort materialization).
    sql("q_topk", Seq("T1", "T2", "T3"),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
    },

    // J5/SC3 — forward-index (metadata) join: dimension side broadcast
    // (reference: lintdb/index.cpp:418-448).
    sql("q_meta_join", Seq("J5", "SC3"),
      """SELECT c_custkey, c_name,
        |  round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2)::DOUBLE AS spend,
        |  count(*) AS n_orders
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        Tables.t(s, dir, "orders")
          .join(broadcast(Tables.t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            round(sum(col("o_totalprice").cast(dec)), 2).cast("double").as("spend"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_custkey")
    },

    // J4/SC2 — context lookup join: small candidate set (phase-1 top-k)
    // joined against the big table — candidates broadcast (reference:
    // lintdb/scoring/ContextCollector.h:15-81).
    sql("q_context_join", Seq("J4", "SC2"),
      """WITH cand AS (SELECT o_orderkey, o_totalprice FROM orders
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 50)
        |SELECT o_orderkey, o_totalprice, count(*) AS n_lines,
        |  round(sum(CAST(l_quantity AS DECIMAL(18,2))),2)::DOUBLE AS tot_qty
        |FROM cand JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        val cand = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(50)
        Tables.t(s, dir, "lineitem")
          .join(broadcast(cand), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_totalprice"))
          .agg(
            count(lit(1)).as("n_lines"),
            round(sum(col("l_quantity").cast(dec)), 2).cast("double").as("tot_qty"))
          .orderBy("o_orderkey")
    },

    // S6 — remove: tombstone anti-join (reference delete pattern:
    // lintdb/invlists/RocksdbInvertedList.cpp:22-95; SURVEY §7.5.5).
    sql("q_delete_anti", Seq("S6"),
      """SELECT o_orderkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c
        |  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        val tombstones = Tables.t(s, dir, "customer")
          .filter(col("c_acctbal") < 0).select("c_custkey")
        Tables.t(s, dir, "orders")
          .join(broadcast(tombstones), col("o_custkey") === col("c_custkey"), "left_anti")
          .select("o_orderkey")
          .orderBy("o_orderkey")
    },

    // S8 — merge: unionByName of two index shards then re-aggregate
    // (reference: lintdb/index.cpp:512-535 — trivially a union in Spark).
    sql("q_merge_union", Seq("S8"),
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2)::DOUBLE AS tot
        |FROM (SELECT * FROM orders WHERE o_orderkey % 2 = 0
        |      UNION ALL SELECT * FROM orders WHERE o_orderkey % 2 = 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        val o = Tables.t(s, dir, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .unionByName(o.filter(col("o_orderkey") % 2 === 1))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("o_totalprice").cast(dec)), 2).cast("double").as("tot"))
          .orderBy("o_orderstatus")
    },

    // §2.6 superset — per-group top-n via window rank (flagged superset:
    // the reference has no window functions).
    sql("q_window_rank", Seq("W1"),
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        Tables.t(s, dir, "customer")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
          .orderBy("c_nationkey", "rn")
    },

    // ST2 — gap-based sessionization (30-min inactivity): the batch twin of
    // flatMapGroupsWithState session windows. Ordering/gap math happens at
    // millisecond precision on both engines (the parquet source is
    // nanosecond-precision, which Spark reads truncated — comparing at ms
    // keeps the engines identical).
    sql("q_sessionize", Seq("ST2", "W1"),
      """WITH e AS (SELECT user_id, epoch_ms(ts::TIMESTAMP) AS tms, event_id FROM events),
        |l AS (SELECT user_id, tms,
        |  lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id) AS prev
        |  FROM e)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CASE WHEN prev IS NULL OR tms - prev > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("tms"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), unix_millis(col("ts")).as("tms"), col("event_id"))
          .withColumn("prev", lag(col("tms"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("prev").isNull || col("tms") - col("prev") > 1800000L, 1)
              .otherwise(0)).as("n_sessions"))
          .orderBy("user_id")
    },

    // Semi-structured props: JSON field extraction + aggregation (the events
    // table's props column is a JSON object).
    sql("q_json_extract", Seq("F6"),
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) {
      (s, dir) =>
        // from_json with an explicit schema: single Jackson parse into a
        // typed struct (get_json_object re-walks the document per call).
        // The field parses as STRING + cast — not BIGINT — so a
        // string-encoded number ("5") still extracts, matching the oracle's
        // lenient json_extract + CAST
        Tables.events(s, dir)
          .groupBy(from_json(col("props"), "k STRING",
            Map.empty[String, String]).getField("k").cast("long").as("k"))
          .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"))
          .orderBy("k")
    },

    // §2.11 — the batch shape of the streaming windowed aggregation
    // (tumbling 1h event-time window; Structured Streaming runs the same
    // plan via readStream + watermark — see graft.streaming). The window
    // start is emitted as epoch millis so the oracle compare is free of
    // ns/us timestamp-unit ambiguity.
    sql("q_events_window", Seq("ST1"),
      """SELECT epoch_ms(date_trunc('hour', ts)::TIMESTAMP) AS h_ms, event_type,
        |  count(*) AS n, round(sum(value), 3) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) {
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(unix_millis(date_trunc("hour", col("ts"))).as("h_ms"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
          .orderBy("h_ms", "event_type")
    }
  )
}
