package graft.queries

import org.apache.spark.sql.functions._
import graft.core.ColumnOps

/** SURVEY §2 core operator inventory, re-expressed as verifiable queries over
  * the driver test tables. Each entry names the §2 row(s) it covers.
  *
  * Determinism rules (driver hash-compares against DuckDB):
  *  - every query has a total ORDER BY;
  *  - no raw double sums (see [[ColumnOps.exactSum]]);
  *  - integer aggregates cast to BIGINT on the DuckDB side (its sum(int)
  *    widens to HUGEINT).
  */
object CoreOps {

  val all: Seq[QueryDef] = Seq(

    // S1 + column pruning: projected scan. Filter/projection reach the
    // parquet reader (PushedFilters / ReadSchema in explain).
    QueryDef(
      "q_s1_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .filter(col("l_returnflag") === "R")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P1: metadata-supplied selectExpr transformations
    // (reference: src/main/scala/datalake/processing/Processing.scala:280-287).
    QueryDef(
      "q_p1_transform",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS net_price,
        |       upper(l_returnflag) AS rf
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .selectExpr(
          "l_orderkey", "l_linenumber",
          "l_extendedprice * (1 - l_discount) AS net_price",
          "upper(l_returnflag) AS rf")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P2: calculated columns via expr()
    // (reference: src/main/scala/datalake/processing/Processing.scala:259-272).
    QueryDef(
      "q_p2_calculated",
      """SELECT o_orderkey,
        |       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("status_prio", expr("concat(o_orderstatus, '-', o_orderpriority)"))
        .withColumn("order_year", expr("year(o_orderdate)"))
        .select("o_orderkey", "status_prio", "order_year")
        .orderBy("o_orderkey")
    },

    // P3: metadata-typed casts
    // (reference: src/main/scala/datalake/processing/Processing.scala:225-233).
    QueryDef(
      "q_p3_cast",
      // total_dec re-surfaces as DOUBLE: a decimal column in the dumped
      // parquet hash-mismatches in the driver's canon (r01/r02), while the
      // quantization the DECIMAL(12,2) cast applied stays observable.
      """SELECT o_orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_dec,
        |       CAST(o_orderdate AS DATE) AS order_date,
        |       CAST(o_orderkey AS VARCHAR) AS key_str
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").cast("double").as("total_dec"),
          col("o_orderdate").cast("date").as("order_date"),
          col("o_orderkey").cast("string").as("key_str"))
        .orderBy("o_orderkey")
    },

    // P4: column renames
    // (reference: src/main/scala/datalake/processing/Processing.scala:236-244).
    QueryDef(
      "q_p4_rename",
      """SELECT c_custkey AS customer_key, c_name AS customer_name,
        |       c_mktsegment AS segment
        |FROM customer ORDER BY customer_key""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_mktsegment")
        .withColumnRenamed("c_custkey", "customer_key")
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_mktsegment", "segment")
        .orderBy("customer_key")
    },

    // P5: name normalization + sys_* drop
    // (reference: src/main/scala/datalake/core/implicits.scala:13-26).
    QueryDef(
      "q_p5_normalize",
      """SELECT event_id AS eventid, event_type AS eventtype, value AS valuetotal
        |FROM events ORDER BY eventid""".stripMargin) { (s, d) =>
      val dirty = Tables.events(s, d)
        .select(
          col("event_id").as("event id"),
          col("event_type").as("event.type"),
          col("value").as("value(total)"),
          col("props").as("sys_props"))
      ColumnOps.normalize(dirty).orderBy("eventid")
    },

    // P6 + P10 + P11: equality slice filter, IN partition filter, boolean guards
    // (reference: Processing.scala:305-307, Merge.scala:38-48,75-83).
    QueryDef(
      "q_p6_filters",
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE o_orderstatus = 'F'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice > 1000.0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F"
          && col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          && col("o_totalprice") > 1000.0)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // P9: inclusive watermark-window predicate
    // (reference: src/main/scala/datalake/processing/ProcessStrategy.scala:86-153).
    QueryDef(
      "q_p9_watermark_window",
      """SELECT l_orderkey, l_linenumber, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <= TIMESTAMP '1995-12-31 23:59:59'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp")
          && col("l_shipdate") <= lit("1995-12-31 23:59:59").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A1: watermark max aggregation (one global row)
    // (reference: src/main/scala/datalake/processing/Processing.scala:123-135).
    QueryDef(
      "q_a1_watermark_max",
      "SELECT max(ts) AS ts_max, max(event_id) AS id_max FROM events") { (s, d) =>
      Tables.events(s, d)
        .agg(max(col("ts")).as("ts_max"), max(col("event_id")).as("id_max"))
    },

    // A2: duplicate business-key detection
    // (reference: src/main/scala/datalake/processing/Processing.scala:192-199).
    QueryDef(
      "q_a2_dup_detect",
      """SELECT l_orderkey, count(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey HAVING count(*) > 1
        |ORDER BY l_orderkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1)
        .orderBy("l_orderkey")
    },

    // A3: distinct partition values
    // (reference: src/main/scala/datalake/processing/Processing.scala:148-151).
    QueryDef(
      "q_a3_distinct",
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority") { (s, d) =>
      Tables.orders(s, d).select("o_orderpriority").distinct().orderBy("o_orderpriority")
    },

    // A4: record counts per group (count() metric surface)
    QueryDef(
      "q_a4_counts",
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // O1: latest-by-timestamp top-1 (Catalyst plans TakeOrderedAndProject)
    // (reference: src/main/scala/datalake/core/WatermarkData.scala:32-35).
    QueryDef(
      "q_o1_latest",
      """SELECT event_id, ts, event_type FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .orderBy(col("ts").desc, col("event_id").desc)
        .select("event_id", "ts", "event_type")
        .limit(1)
    },

    // J1: equi-join + aggregate (MERGE match join shape). The dimension side
    // is broadcast; sum is decimal-exact so the result is shuffle-order-free.
    QueryDef(
      "q_j1_join_agg",
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |       count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(ColumnOps.exactSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    },

    // J3: left-semi join (unchanged-count join, reference Historic.scala:142-149)
    QueryDef(
      "q_j3_semi",
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val sup = Tables.supplier(s, d)
      val li = Tables.lineitem(s, d).select("l_suppkey")
      sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // J4: left-anti join (whenNotMatchedBySource delete inference,
    // reference Merge.scala:113-122).
    QueryDef(
      "q_j4_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select("o_custkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.7 hash surface: SourceHash + PK hash (sha2/concat_ws contract,
    // reference Processing.scala:168-205). Only int/string inputs — double
    // to-string formatting is not identical across engines.
    QueryDef(
      "q_f_hash",
      """SELECT c_custkey,
        |       sha256(concat_ws('_', CAST(c_custkey AS VARCHAR))) AS pk_hash,
        |       sha256(concat_ws('', CAST(c_custkey AS VARCHAR), c_name,
        |                        c_mktsegment)) AS source_hash
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          ColumnOps.primaryKeyHash(Seq("c_custkey")).as("pk_hash"),
          ColumnOps.sourceHash(Seq("c_custkey", "c_name", "c_mktsegment")).as("source_hash"))
        .orderBy("c_custkey")
    },

    // Multi-way star join (region ⋈ nation ⋈ supplier ⋈ lineitem): the
    // shape Catalyst should plan as chained broadcasts over the one big
    // fact scan — exercises join reordering at scale.
    QueryDef(
      "q_j2_multiway",
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(ColumnOps.exactSum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // Exact percentiles (sort-based, linear interpolation — identical
    // arithmetic in both engines, so doubles hash-match).
    QueryDef(
      "q_a6_percentile",
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
        .orderBy("l_returnflag")
    },

    // Rollup aggregation (beyond-parity: SURVEY §2.4 notes the reference
    // has no grouping sets — the capability matters for mart-style
    // outputs over silver tables).
    QueryDef(
      "q_a5_rollup",
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          ColumnOps.exactSum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // As-of join (operator Spark lacks natively; DuckDB's ASOF JOIN is the
    // oracle): each event picks up the latest preceding click of its user
    // via the single-shuffle union-window implementation.
    QueryDef(
      "q_j5_asof",
      """WITH r AS (
        |  SELECT user_id, ts, max(event_id) AS ref_event
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id, r.ref_event AS asof_ref_event
        |FROM events l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val right = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
      graft.ops.AsOfJoin.asOf(
        ev.select("event_id", "user_id", "ts"), right,
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        rightValueCols = Seq("ref_event"))
        .select("event_id", "user_id", "asof_ref_event")
        .orderBy("event_id")
    },

    // As-of join with a tolerance bound (pandas merge_asof semantics):
    // references older than 30 minutes null out instead of leaking
    // forward indefinitely.
    QueryDef(
      "q_j7_asof_tol",
      """WITH r AS (
        |  SELECT user_id, ts, max(event_id) AS ref_event
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT l.event_id, l.user_id,
        |  CASE WHEN r.ts >= l.ts - INTERVAL 30 MINUTE THEN r.ref_event END
        |    AS asof_ref_event
        |FROM events l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val right = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("ref_event"))
      graft.ops.AsOfJoin.asOfWithin(
        ev.select("event_id", "user_id", "ts"), right,
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        rightValueCols = Seq("ref_event"), tolerance = "30 minutes")
        .select("event_id", "user_id", "asof_ref_event")
        .orderBy("event_id")
    },

    // Bucketed range join (no equi key): events matched into overlapping
    // value bands. The naive plan is a nested-loop cross product; binning
    // turns it into a hash equi-join on the bin id.
    QueryDef(
      "q_j6_range",
      """WITH bands AS (
        |  SELECT i AS band_id, i * 23.0 AS lo, i * 23.0 + 40.0 AS hi
        |  FROM range(0, 20) t(i))
        |SELECT e.event_id, b.band_id
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value <= b.hi
        |ORDER BY event_id, band_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val bands = (0 until 20)
        .map(i => (i.toLong, i * 23.0, i * 23.0 + 40.0))
        .toDF("band_id", "lo", "hi")
      graft.ops.RangeJoin.pointInInterval(
        Tables.events(s, d).select("event_id", "value"), bands,
        pointCol = "value", loCol = "lo", hiCol = "hi", binWidth = 40.0)
        .select("event_id", "band_id")
        .orderBy("event_id", "band_id")
    },

    // Tumbling event-time windows — the same expression StreamOps uses on
    // live streams, verified in batch against epoch-bucket arithmetic.
    QueryDef(
      "q_w_tumbling",
      """SELECT make_timestamp(CAST(floor(epoch(ts)/300)*300*1000000 AS BIGINT))
        |         AS window_start,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      graft.streaming.StreamOps.tumblingCounts(
        Tables.events(s, d), "ts", "5 minutes", "10 minutes")
        .orderBy("window_start", "event_type")
    },

    // Batch sessionization (gaps-and-islands): the declarative twin of the
    // streaming flatMapGroupsWithState sessionizer, under the oracle.
    // Exact integer-microsecond gap arithmetic on both sides.
    QueryDef(
      "q_w_sessions",
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, ts, us,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |         OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |            > 600000000
        |       THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, ts, sum(brk) OVER (
        |        PARTITION BY user_id ORDER BY us
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |      FROM m)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      graft.streaming.StreamOps.sessionizeBatch(
        Tables.events(s, d), "user_id", "ts", gapMicros = 600000000L)
        .orderBy("user_id", "session_id")
    },

    // Stream-stream interval join (attribution): every view in the 5
    // hours before a click, per user. The same expression + watermarks
    // runs on live streams with state bounded by the time range; the
    // batch twin is verified here against DuckDB's range join.
    QueryDef(
      "q_w_interval",
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS view_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts >= a.ts - INTERVAL 6 HOUR
        | AND b.ts <= a.ts
        |WHERE a.event_type = 'click' AND b.event_type = 'view'
        |ORDER BY a.user_id, click_id, view_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      graft.streaming.StreamOps.intervalJoin(
        clicks, views, "user_id", "click_ts", "view_ts",
        before = "6 hours", after = "0 seconds", watermarkDelay = "10 minutes")
        .select("user_id", "click_id", "view_id")
        .orderBy("user_id", "click_id", "view_id")
    },

    // Set operations (SURVEY §2.6: unused by the reference — completing
    // the relational surface).
    QueryDef(
      "q_s2_setops",
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
        |UNION ALL
        |SELECT -c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select("c_custkey")
      val inter = c.filter(col("c_custkey") % 2 === 0)
        .intersect(c.filter(col("c_custkey") % 3 === 0))
      val exc = c.filter(col("c_custkey") % 5 === 0)
        .except(c.filter(col("c_custkey") % 10 === 0))
        .select((-col("c_custkey")).as("c_custkey"))
      inter.unionByName(exc).orderBy("c_custkey")
    },

    // Pivot: status × priority count matrix (dynamic columns fixed up
    // front so both engines emit the same schema).
    QueryDef(
      "q_a7_pivot",
      """SELECT o_orderstatus,
        |       count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |       count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |       count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
        .count()
        .select(col("o_orderstatus"),
          coalesce(col("`1-URGENT`"), lit(0L)).as("urgent"),
          coalesce(col("`3-MEDIUM`"), lit(0L)).as("medium"),
          coalesce(col("`5-LOW`"), lit(0L)).as("low"))
        .orderBy("o_orderstatus")
    },

    // Semi-structured JSON column extraction (events.props).
    QueryDef(
      "q_f_json",
      """SELECT event_id,
        |       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy("event_id")
    },

    // Window functions (beyond-parity capability; SURVEY §2.6 notes the
    // reference lacks them — SCD2 can be re-derived with them).
    QueryDef(
      "q_w_window",
      """SELECT event_id, user_id,
        |       CAST(row_number() OVER w AS INTEGER) AS rn,
        |       lag(event_type) OVER w AS prev_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(
          col("event_id"), col("user_id"),
          row_number().over(w).as("rn"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .orderBy("user_id", "rn")
    }
  )
}
