package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface over the driver testdata — the exploded-view
  * analogs of SURVEY §2.6 (scan/filter/join/agg/sort/window), with
  * exact-decimal arithmetic so the DuckDB oracle hash-matches bit-for-bit
  * (doubles are only produced by one final cast from an exact decimal sum).
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // scan + filter + group-agg (TPC-H Q1 shape); filter/projection pushed
    // down to the parquet scan, partial aggregation map-side
    "q_rel_pricing" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // 3-way join (broadcast dims) + agg + deterministic top-k
    "q_rel_top_revenue" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust.filter(col("c_nationkey") < 13)),
          ord("o_custkey") === col("c_custkey"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("o_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // window functions: per-customer order sequence + running spend
    "q_rel_window" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_custkey") < 20)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      ord
        .withColumn("rn", row_number().over(w))
        .withColumn("running_spend",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .filter(col("rn") <= 5)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("running_spend"))
        .orderBy("o_custkey", "rn")
    }),

    // rank-family window completeness: ntile/percent_rank/cume_dist per
    // market segment — the compound (acctbal, custkey) order makes every
    // row its own peer group, so all three are position-determined and
    // engine-independent; one shuffle on the partition key
    "q_rel_ntile" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") < 300)
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      cust
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 4))
        .withColumn("cd", round(cume_dist().over(w), 4))
        .select(col("c_mktsegment"), col("c_custkey"), col("quartile"),
          col("pr"), col("cd"))
        .orderBy("c_mktsegment", "c_custkey")
    }),

    // semi/anti join surface: customers with and without orders
    "q_rel_semi_anti" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet").select("o_custkey")
      val withOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      val withoutOrders = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      withOrders.agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
        .unionByName(
          withoutOrders.agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders")))
        .select("kind", "n").orderBy("kind")
    }),

    // multi-level aggregation: ROLLUP over the nation hierarchy —
    // grouping_id distinguishes subtotal levels (Expand operator; one
    // shuffle, partial aggregation per grouping set)
    "q_rel_rollup" -> ((s, dir) => {
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .filter(col("n_nationkey") < 10)
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("spend"),
          grouping_id(col("n_name"), col("o_orderpriority")).cast("int").as("lvl"))
        .orderBy(col("lvl"), col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // correlated scalar subquery: each customer's order count vs their
    // nation's average (decorrelates to two aggregations + broadcast join)
    "q_rel_corr_subquery" -> ((s, dir) => {
      val s2 = s
      s2.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("g_customer")
      s2.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("g_orders")
      s2.sql(
        """SELECT c_custkey, n_orders FROM (
          |  SELECT c.c_custkey,
          |    (SELECT COUNT(*) FROM g_orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
          |    c.c_nationkey
          |  FROM g_customer c) t
          |WHERE n_orders > (
          |  SELECT AVG(cnt) FROM (
          |    SELECT COUNT(*) AS cnt, c2.c_nationkey AS nk
          |    FROM g_customer c2 JOIN g_orders o2 ON o2.o_custkey = c2.c_custkey
          |    GROUP BY c2.c_custkey, c2.c_nationkey) x
          |  WHERE x.nk = t.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // as-of join: each purchase attributed to the user's most recent
    // prior-or-equal click — union + per-key running-last window (one
    // shuffle on user_id, no range-join blow-up); see operators.AsOfJoin
    "q_rel_asof" -> ((s, dir) => {
      val ev = EventTime.eventsWithSeconds(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts_s"))
        .filter(col("user_id") < 50)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts_s", "event_id")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_s"), col("event_id"),
          col("event_id").as("click_id"), col("ts_s").as("click_ts"))
      graft.operators.AsOfJoin
        .joinAsOf(purchases, clicks, "user_id", "ts_s", "event_id",
          Seq("click_id", "click_ts"))
        .filter(col("asof_click_id").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts_s"),
          col("asof_click_id").as("click_id"),
          (col("ts_s") - col("asof_click_ts")).as("gap_s"))
        .orderBy("event_id")
    }),

    // semi-structured surface: JSON field extraction + per-type aggregates
    "q_rel_json" -> ((s, dir) => {
      EventTime.readEvents(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // interval (range) join via banded equi-join — the scale-safe shape
    // for a range predicate (see operators.RangeJoin: 2× bounded right
    // replication + shuffled equi-join, never BroadcastNestedLoopJoin)
    "q_rel_range" -> ((s, dir) => {
      val ev = EventTime.eventsWithSeconds(s, dir)
        .filter(col("user_id") < 200)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts_s"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts_s")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_s"))
      graft.operators.RangeJoin
        .intervalJoin(purchases, clicks, "ts_s", "ts_s",
          lookbackSeconds = 7200L, keys = Seq("user_id"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_clicks"),
          min(col("ts_s") - col("r_ts_s")).as("min_gap_s"),
          max(col("ts_s") - col("r_ts_s")).as("max_gap_s"))
        .orderBy("event_id")
    }),

    // pivot (cross-tab): order-priority counts per nation as columns —
    // fixed value list so the plan is a single groupBy (no extra
    // distinct-values job) and the output schema is static
    "q_rel_pivot" -> ((s, dir) => {
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .groupBy(col("n_name"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "p1_urgent")
        .withColumnRenamed("2-HIGH", "p2_high")
        .withColumnRenamed("3-MEDIUM", "p3_medium")
        .withColumnRenamed("4-NOT SPECIFIED", "p4_notspec")
        .withColumnRenamed("5-LOW", "p5_low")
        .orderBy("n_name")
    }),

    // unpivot (melt): the pivot gate's cross-tab melted back to long form
    // — (n_name, priority, n) rows ≡ the direct groupBy, proving the
    // pivot⇄unpivot pair is lossless
    "q_rel_unpivot" -> ((s, dir) => {
      val wide = queries("q_rel_pivot")(s, dir)
      wide.unpivot(
        Array(col("n_name")),
        Array(col("p1_urgent"), col("p2_high"), col("p3_medium"),
          col("p4_notspec"), col("p5_low")),
        "priority", "n_orders")
        .orderBy("n_name", "priority")
    }),

    // distinct + set-style aggregation over a dimension hierarchy join
    // TPC-H Q17 shape (small-quantity revenue): per-part average via a
    // correlated threshold, made integer-exact as q·5·cnt < Σq over
    // DECIMAL(18,2) — the brand dim broadcasts, the per-part stats agg
    // and the probe share one l_partkey shuffle
    "q_rel_q17" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), dec(col("l_quantity")).as("q"),
          dec(col("l_extendedprice")).as("ep"))
      val stats = li.groupBy("l_partkey")
        .agg(sum("q").as("sq"), count(lit(1)).as("cnt"))
      val pp = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
      li.join(broadcast(pp), li("l_partkey") === pp("p_partkey"))
        .join(stats, "l_partkey")
        .filter(col("q") * 5 * col("cnt") < col("sq"))
        .agg(sum("ep").cast("double").as("small_qty_rev"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q15 shape (top supplier): per-supplier quarter revenue, keep
    // the max — DECIMAL revenue makes the scalar-subquery equality exact
    // (a float max would be ulp-fragile); supplier dim broadcasts
    "q_rel_q15" -> ((s, dir) => {
      val rev = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("tr"))
      val mx = rev.agg(max("tr").as("mx"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_name"))
      rev.crossJoin(broadcast(mx)).filter(col("tr") === col("mx"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("tr").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    }),
    // TPC-H Q11 shape (important share): nations whose revenue exceeds
    // 5% of the global total — per-group sums vs one broadcast scalar,
    // the inequality kept integer-exact on decimals (r·20 > total)
    "q_rel_q11" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), dec(col("o_totalprice")).as("tp"))
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val byNation = ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy("c_nationkey").agg(sum("tp").as("rev"))
      val total = byNation.agg(sum("rev").as("total"))
      byNation.crossJoin(broadcast(total))
        .filter(col("rev") * 20 > col("total"))
        .join(broadcast(nation), col("c_nationkey") === nation("n_nationkey"))
        .select(col("n_name"), col("rev").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q21 shape (waiting suppliers): in finished multi-supplier
    // orders, suppliers who were the ONLY late one. The classic
    // correlated EXISTS/NOT-EXISTS pair is rewritten as one
    // orderkey-keyed aggregation cascade: per-(order, supplier) late
    // flags, then per-order (n_supp, n_late) — the second agg and the
    // join back REUSE the first shuffle's partitioning, so the whole
    // query is one lineitem-sized exchange; supplier dim broadcasts.
    // "Late" = shipped >365 days after the order date (the testdata has
    // no receipt/commit dates; the join/agg/decorrelation shape is the
    // point). Deterministic: (numwait DESC, s_name) totally orders rows
    "q_rel_q21" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val late = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 365, 1)
          .otherwise(0)).as("is_late"))
      val os = late.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("is_late").as("n_late"))
      val sup = s.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_name"))
      late.join(os, "l_orderkey")
        .filter(col("is_late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name").agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }),
    // TPC-H Q22 shape (global sales opportunity): high-balance customers
    // (above the positive-balance average, kept integer-exact as
    // bal·n > Σbal on decimals) in a nation subset with NO recent order —
    // scalar stats broadcast, the NOT EXISTS becomes a left_anti join
    // shuffling only the date-filtered order keys
    "q_rel_q22" -> ((s, dir) => {
      val cs = s.read.parquet(s"$dir/customer.parquet")
        .filter(pmod(col("c_nationkey"), lit(2)) === 1)
        .select(col("c_custkey"), col("c_nationkey"), dec(col("c_acctbal")).as("bal"))
      val st = cs.filter(col("bal") > 0)
        .agg(count(lit(1)).as("n"), sum("bal").as("s"))
      val recent = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cs.crossJoin(broadcast(st))
        .filter(col("bal") * col("n") > col("s"))
        .join(recent, cs("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum("bal").cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // RANGE-frame window (time-based, not row-based): per customer, the
    // trailing-90-day spend at each order — RANGE over epoch seconds so
    // same-day peer rows all enter each other's frame (a ROWS frame
    // would be order-dependent among ties and engine-fragile)
    "q_rel_range_frame" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_custkey") < 50)
        // day-granularity epoch seconds via datediff — timezone-
        // independent (the cast-to-timestamp route shifts per-row under
        // a DST session zone, drifting rows exactly 90 d apart across
        // the RANGE boundary; see EventTime.scala's house pattern)
        .withColumn("ts",
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long") * 86400L)
      val w = Window.partitionBy("o_custkey").orderBy("ts")
        .rangeBetween(-90L * 86400L, 0L)
      ord
        .withColumn("spend_90d",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .withColumn("n_90d", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("spend_90d"), col("n_90d"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    // TPC-H Q18 shape (large-volume customers): the IN-subquery over a
    // HAVING aggregate becomes a join on the SAME key the aggregate
    // grouped by — the orderkey shuffle is planned once and reused by
    // the filter join; customer dim broadcasts. DECIMAL quantity sums,
    // ties under LIMIT broken by o_orderkey
    "q_rel_q18" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), dec(col("l_quantity")).as("q"))
      val big = li.groupBy("l_orderkey")
        .agg(sum("q").as("tq")).filter(col("tq") > 300)
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_name"))
      ord.join(big, ord("o_orderkey") === big("l_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("tq").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),
    // TPC-H Q12 shape (shipmode priority classes; testdata has no
    // l_shipmode, so the class axis is the ship-latency bucket): one
    // orderkey join + a two-way CONDITIONAL aggregation — urgent/high
    // vs lower priorities counted per latency bucket in a single pass.
    // Negative synthetic latencies clamp to 0 BEFORE the integer
    // division (Spark `div` truncates toward zero, DuckDB `//` floors —
    // nonnegative operands make them agree)
    "q_rel_q12" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_shipdate"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .withColumn("bucket",
          least(expr("greatest(datediff(l_shipdate, o_orderdate), 0) div 30"),
            lit(5L)))
        .groupBy("bucket")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("bucket")
    }),
    // TPC-H Q19 shape (disjunctive predicate join): three conjunctive
    // (brand, size-range, quantity-range) clauses OR-ed across the
    // part⋈lineitem join — the part side broadcasts, the disjunction
    // evaluates inside the joined stream in one codegen stage (no
    // union-of-three-joins blowup)
    "q_rel_q19" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"),
          dec(col("l_extendedprice")).as("ep"), dec(col("l_discount")).as("disc"))
      val p = s.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val c1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 20)
      val c2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(11, 25) && col("l_quantity").between(10, 30)
      val c3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(26, 50) && col("l_quantity").between(20, 40)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(c1 || c2 || c3)
        .agg(sum(col("ep") * (lit(1) - col("disc"))).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // explicit GROUPING SETS (beyond cube/rollup): (region, nation),
    // (region), () in ONE Expand + a single shuffle, grouping_id
    // disambiguating subtotal rows from genuine NULL groups
    "q_rel_gsets" -> ((s, dir) => {
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val region = s.read.parquet(s"$dir/region.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupingSets(
          Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
          col("r_name"), col("n_name"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("spend"))
        .select(coalesce(col("r_name"), lit("(all)")).as("r_name"),
          coalesce(col("n_name"), lit("(all)")).as("n_name"),
          col("gid"), col("n_orders"), col("spend"))
        .orderBy("gid", "r_name", "n_name")
    }),

    "q_rel_region_sales" -> ((s, dir) => {
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val region = s.read.parquet(s"$dir/region.parquet")
      val cust = s.read.parquet(s"$dir/customer.parquet")
      val ord = s.read.parquet(s"$dir/orders.parquet")
      ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_spend"))
        .orderBy("r_name")
    }),

    // CUBE: all four grouping sets of (returnflag, linestatus) in one
    // Expand + single shuffle — completes the multi-level-agg family next
    // to q_rel_rollup's hierarchy subtotals
    "q_rel_cube" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          grouping_id(col("l_returnflag"), col("l_linestatus"))
            .cast("int").as("lvl"))
        .orderBy(col("lvl"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Bloom-pruned join (operators.BloomJoin): part keys filtered to a
    // selective dim subset; the fact side is pruned by broadcast Bloom
    // bits BEFORE its shuffle. False positives are removed by the exact
    // join, so the result is row-identical to the plain join the oracle
    // computes — the gate pins exactly that no-false-negative contract.
    "q_rel_bloom_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val dim = s.read.parquet(s"$dir/part.parquet")
        .filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_brand"))
      graft.operators.BloomJoin
        .bloomPrunedJoin(li, dim, "l_partkey", "p_partkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("p_brand")
    }),

    // TPC-H Q13 shape: customer order-count distribution via a LEFT OUTER
    // join with a filtered right side — zero-order customers flow through
    // as c_count = 0, then a second small aggregation over the counts
    "q_rel_custdist" -> ((s, dir) => {
      val cust = s.read.parquet(s"$dir/customer.parquet").select("c_custkey")
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_custkey", "o_orderkey")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // set-operation surface: INTERSECT / EXCEPT / UNION DISTINCT over two
    // customer key sets, reduced to (kind, n, key_sum) rows
    "q_rel_setops" -> ((s, dir) => {
      val ord = s.read.parquet(s"$dir/orders.parquet")
      val a = ord.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val b = ord.filter(col("o_totalprice") > 150000.0).select("o_custkey")
      def stats(df: DataFrame, kind: String) =
        df.agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("key_sum"))
          .withColumn("kind", lit(kind)).select("kind", "n", "key_sum")
      stats(a.intersect(b), "both")
        .unionByName(stats(a.except(b), "urgent_only"))
        .unionByName(stats(a.union(b).distinct(), "either"))
        .orderBy("kind")
    }),

    // correlated EXISTS / NOT EXISTS in one predicate — decorrelates to a
    // semi join and an anti join over the same orders scans
    "q_rel_exists" -> ((s, dir) => {
      s.read.parquet(s"$dir/customer.parquet").createOrReplaceTempView("g2_customer")
      s.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("g2_orders")
      s.sql(
        """SELECT c_custkey FROM g2_customer c
          |WHERE EXISTS (SELECT 1 FROM g2_orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          |  AND NOT EXISTS (SELECT 1 FROM g2_orders o
          |                  WHERE o.o_custkey = c.c_custkey
          |                    AND o.o_orderpriority = '1-URGENT')
          |ORDER BY c_custkey""".stripMargin)
    }),

    // lag/lead window surface: day gaps between consecutive orders and
    // the next order's exact-decimal price delta per customer
    "q_rel_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_custkey") < 30)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(col("o_orderdate"), col("prev_date")).cast("long"))
        .withColumn("next_price_delta",
          (lead(dec(col("o_totalprice")), 1).over(w) - dec(col("o_totalprice")))
            .cast("double"))
        .filter(col("prev_date").isNotNull)
        .select(col("o_custkey"), col("o_orderkey"), col("gap_days"),
          col("next_price_delta"))
        .orderBy("o_custkey", "o_orderkey")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_rel_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_top_revenue" ->
      """SELECT o_orderkey,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_nationkey < 13 AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_rel_window" ->
      """SELECT o_custkey, rn, o_orderkey, running_spend FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS running_spend
        | FROM orders WHERE o_custkey < 20
        |) t WHERE rn <= 5 ORDER BY o_custkey, rn""".stripMargin,
    "q_rel_gsets" ->
      """SELECT coalesce(r_name, '(all)') AS r_name,
        | coalesce(n_name, '(all)') AS n_name,
        | CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        |ORDER BY gid, r_name, n_name""".stripMargin,
    "q_rel_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        | ntile(4) OVER w AS quartile,
        | round(percent_rank() OVER w, 4) AS pr,
        | round(cume_dist() OVER w, 4) AS cd
        |FROM customer WHERE c_custkey < 300
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q_rel_semi_anti" ->
      """SELECT kind, n FROM (
        | SELECT 'with_orders' AS kind, count(*) AS n FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
        | UNION ALL
        | SELECT 'without_orders' AS kind, count(*) AS n FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |) t ORDER BY kind""".stripMargin,
    "q_rel_rollup" ->
      """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        | CAST(GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS INT) AS lvl
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_nationkey < 10
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY lvl, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_rel_corr_subquery" ->
      """SELECT c_custkey, n_orders FROM (
        |  SELECT c.c_custkey,
        |    (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |    c.c_nationkey
        |  FROM customer c) t
        |WHERE n_orders > (
        |  SELECT AVG(cnt) FROM (
        |    SELECT COUNT(*) AS cnt, c2.c_nationkey AS nk
        |    FROM customer c2 JOIN orders o2 ON o2.o_custkey = c2.c_custkey
        |    GROUP BY c2.c_custkey, c2.c_nationkey) x
        |  WHERE x.nk = t.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_rel_asof" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type,
        |        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
        | FROM events WHERE user_id < 50 AND event_type IN ('click', 'purchase')),
        |u AS (
        | SELECT *, CASE WHEN event_type = 'click' THEN event_id END AS c_id,
        |        CASE WHEN event_type = 'click' THEN ts_s END AS c_ts
        | FROM e),
        |w AS (
        | SELECT *,
        |  last_value(c_id IGNORE NULLS) OVER
        |   (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING) AS click_id,
        |  last_value(c_ts IGNORE NULLS) OVER
        |   (PARTITION BY user_id ORDER BY ts_s, event_id ROWS UNBOUNDED PRECEDING) AS click_ts
        | FROM u)
        |SELECT user_id, event_id, ts_s, click_id, ts_s - click_ts AS gap_s
        |FROM w WHERE event_type = 'purchase' AND click_id IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q_rel_range" ->
      """WITH e AS (
        | SELECT user_id, event_id, event_type,
        |        CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_s
        | FROM events WHERE user_id < 200),
        |p AS (SELECT user_id, event_id, ts_s FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id, ts_s AS c_ts FROM e WHERE event_type = 'click')
        |SELECT p.event_id, count(*) AS n_clicks,
        |       min(p.ts_s - c.c_ts) AS min_gap_s,
        |       max(p.ts_s - c.c_ts) AS max_gap_s
        |FROM p JOIN c ON p.user_id = c.user_id
        | AND c.c_ts >= p.ts_s - 7200 AND c.c_ts <= p.ts_s
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q_rel_pivot" ->
      """SELECT n_name,
        | count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
        | count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
        | count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
        | count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
        | count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_rel_unpivot" ->
      """WITH base AS (
        | SELECT n_name, o_orderpriority FROM orders
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey),
        |cnt AS (SELECT n_name, o_orderpriority, count(*) AS n
        |        FROM base GROUP BY 1, 2),
        |pr AS (SELECT * FROM (VALUES
        |  ('1-URGENT', 'p1_urgent'), ('2-HIGH', 'p2_high'),
        |  ('3-MEDIUM', 'p3_medium'), ('4-NOT SPECIFIED', 'p4_notspec'),
        |  ('5-LOW', 'p5_low')) t(op, priority)),
        |grid AS (SELECT b.n_name, pr.op, pr.priority
        |         FROM (SELECT DISTINCT n_name FROM base) b, pr)
        |SELECT g.n_name, g.priority,
        |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
        |FROM grid g LEFT JOIN cnt c
        |  ON g.n_name = c.n_name AND g.op = c.o_orderpriority
        |ORDER BY g.n_name, g.priority""".stripMargin,
    "q_rel_json" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rel_q17" ->
      """WITH li AS (
        | SELECT l_partkey, CAST(l_quantity AS DECIMAL(18,2)) AS q,
        |        CAST(l_extendedprice AS DECIMAL(18,2)) AS ep
        | FROM lineitem),
        |st AS (SELECT l_partkey, sum(q) AS sq, count(*) AS cnt FROM li GROUP BY 1),
        |pp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
        |SELECT CAST(sum(ep) AS DOUBLE) AS small_qty_rev,
        | CAST(count(*) AS BIGINT) AS n_lines
        |FROM li JOIN pp ON li.l_partkey = pp.p_partkey
        | JOIN st ON li.l_partkey = st.l_partkey
        |WHERE q * 5 * cnt < sq""".stripMargin,
    "q_rel_q15" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE tr = (SELECT max(tr) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q_rel_q11" ->
      """WITH bn AS (
        | SELECT c_nationkey,
        |  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        | FROM orders JOIN customer ON o_custkey = c_custkey
        | GROUP BY 1),
        |t AS (SELECT sum(rev) AS total FROM bn)
        |SELECT n_name, CAST(rev AS DOUBLE) AS revenue
        |FROM bn, t JOIN nation ON c_nationkey = n_nationkey
        |WHERE rev * 20 > total
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // the classic correlated form — semantically identical to the Spark
    // side's decorrelated aggregation cascade
    "q_rel_q21" ->
      """WITH late AS (
        | SELECT l_orderkey, l_suppkey,
        |  max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 365
        |       THEN 1 ELSE 0 END) AS is_late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'
        | GROUP BY 1, 2),
        |os AS (SELECT l_orderkey, count(*) AS n_supp, sum(is_late) AS n_late
        |       FROM late GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM late JOIN os USING (l_orderkey)
        | JOIN supplier ON s_suppkey = l_suppkey
        |WHERE late.is_late = 1 AND os.n_supp > 1 AND os.n_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q_rel_q22" ->
      """WITH cs AS (
        | SELECT c_custkey, c_nationkey,
        |        CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        | FROM customer WHERE c_nationkey % 2 = 1),
        |st AS (SELECT count(*) AS n, sum(bal) AS s FROM cs WHERE bal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(bal) AS DOUBLE) AS totacctbal
        |FROM cs, st
        |WHERE bal * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = cs.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rel_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |   RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS spend_90d,
        | count(*) OVER (
        |   PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
        |   RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS n_90d
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_rel_q18" ->
      """WITH big AS (
        | SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
        | FROM lineitem GROUP BY 1 HAVING tq > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(tq AS DOUBLE) AS total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_rel_q12" ->
      """SELECT least(greatest(datediff('day', o_orderdate, l_shipdate), 0) // 30,
        |   5) AS bucket,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rel_q19" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q_rel_region_sales" ->
      """SELECT r_name,
        | COUNT(DISTINCT o_custkey) AS n_customers,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q_rel_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS lvl
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY lvl, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_rel_bloom_join" ->
      """SELECT p_brand, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q_rel_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT JOIN orders
        |   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_rel_setops" ->
      """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000),
        |x AS (SELECT 'both' AS kind, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(o_custkey) AS BIGINT) AS key_sum
        |      FROM (SELECT * FROM a INTERSECT SELECT * FROM b) t
        |      UNION ALL
        |      SELECT 'urgent_only', CAST(count(*) AS BIGINT),
        |        CAST(sum(o_custkey) AS BIGINT)
        |      FROM (SELECT * FROM a EXCEPT SELECT * FROM b) t
        |      UNION ALL
        |      SELECT 'either', CAST(count(*) AS BIGINT),
        |        CAST(sum(o_custkey) AS BIGINT)
        |      FROM (SELECT DISTINCT o_custkey
        |            FROM (SELECT * FROM a UNION ALL SELECT * FROM b) u) t)
        |SELECT kind, n, key_sum FROM x ORDER BY kind""".stripMargin,
    "q_rel_exists" ->
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_rel_lag" ->
      """SELECT o_custkey, o_orderkey, gap_days, next_price_delta FROM (
        | SELECT o_custkey, o_orderkey,
        |  lag(o_orderdate) OVER w AS prev_date,
        |  CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
        |       CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
        |  CAST(lead(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |       - CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS next_price_delta
        | FROM orders WHERE o_custkey < 30
        | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) t WHERE prev_date IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
