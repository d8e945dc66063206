package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.Det._

/** Relational operator inventory (SURVEY.md §2) expressed over the driver's
  * TPC-H-ish corpus. One named query per operator class, each with an ANSI
  * SQL oracle the driver replays in DuckDB.
  *
  * Design rules applied throughout:
  *  - stay declarative (DataFrame API) so Catalyst pushes filters/prunes
  *    columns into the parquet scan and AQE re-plans shuffles;
  *  - `broadcast()` every dimension-sized side explicitly (region/nation/
  *    supplier/agg-scalars) — at 100 TB the fact tables shuffle, dims never
  *    should;
  *  - exact-decimal sums (graft.functions.Det) so double aggregates are
  *    order-insensitive and hash-match the oracle;
  *  - every output column aliased identically in both formulations, with a
  *    deterministic total ORDER BY.
  */
object Relational {

  /** Dataset tag for SQL-text temp-view (and temp-function) names: the
    * session catalog is shared across threads, so a name that encodes
    * only the query would race when two concurrent runs point the same
    * query at different sf dirs — the second registration retargets the
    * first run's view mid-flight (ConcurrentSqlSpec pins this). */
  private def viewTag(d: String): String =
    d.replaceAll("[^A-Za-z0-9]", "_")

  private def netPrice: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  // ---------------------------------------------------------------- q01
  /** A1/A2/A3 + F1: TPC-H Q1-style pricing summary — hash aggregate with
    * partial (map-side) aggregation; the filter is pushed to the scan.
    * Ref: per-read sums BamReader.scala:69-76,138-146. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(netPrice, 4).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** P1/P2/F1/F2: projection + alias + Column predicate + derived column.
    * Catalyst pushes both predicates into the parquet scan and prunes to
    * 5 columns. Ref: MTClassify.scala:172-178. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_returnflag") === "R" && col("l_discount") > 0.05)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"),
        netPrice.as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
      |  l_extendedprice * (1.0 - l_discount) AS net_price
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  /** J1: inner equi-join (USING key) then aggregate — shuffle hash/SMJ on
    * the fact side; AQE picks the physical join. Ref: MTClassifierModel.scala:83. */
  def q03InnerJoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d).withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_price"))
      .orderBy("c_mktsegment")

  val q03Sql: String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_orders,
       |  ${dsumSql("o_totalprice")} AS total_price
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q04
  /** J2: left-semi join (EXISTS). The semi side is reduced before the join;
    * at scale the distinct keyset broadcasts. Ref: MTClassify.scala:189-190. */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).where(col("o_totalprice") > 200000.0)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")

  val q04Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Anti join (NOT EXISTS) — capability beyond the reference (SURVEY §2.3
    * "absent join kinds"). */
  def q05AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** J3/J4: broadcast hash joins against dimension tables — the Spark-native
    * form of the reference's driver-map closure lookups
    * (BamReader.scala:83-88, LD.scala:59-67). Both dims broadcast; zero
    * shuffle of the dims at any scale. */
  def q06BroadcastDims(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_bal"))
      .orderBy("r_name", "n_name")

  val q06Sql: String =
    s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
       |  ${dsumSql("s_acctbal")} AS total_bal
       |FROM supplier
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Union + global aggregate (A3 + §2.5 set op): pooled mean/stddev over
    * two stacked columns — the reference's NormalizeMapQ pattern
    * (MTClassifierModel.scala:128-134), exact-sum formulation. */
  def q07UnionStats(s: SparkSession, d: String): DataFrame = {
    val bal = Tables.customer(s, d).select(col("c_acctbal").as("bal"))
      .union(Tables.supplier(s, d).select(col("s_acctbal").as("bal")))
    bal.agg(
      count(col("bal")).as("n"),
      davg(col("bal")).as("avg_bal"),
      dstddev(col("bal")).as("std_bal"))
  }

  val q07Sql: String =
    s"""SELECT COUNT(bal) AS n, ${davgSql("bal")} AS avg_bal,
       |  ${dstddevSql("bal")} AS std_bal
       |FROM (SELECT c_acctbal AS bal FROM customer
       |      UNION ALL SELECT s_acctbal AS bal FROM supplier)""".stripMargin

  // ---------------------------------------------------------------- q08
  /** P4/A3: z-score normalization — global aggregate scalars distributed via
    * broadcast cross-join (NOT a single-partition window, NOT a driver
    * .first(): the scalar row broadcasts, the fact side never moves).
    * Ref: MTClassifierModel.scala:119-144. */
  def q08Zscore(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val stats = o.agg(
      davg(col("o_totalprice")).as("mu"),
      dstddev(col("o_totalprice")).as("sigma"))
    o.crossJoin(broadcast(stats))
      .select(col("o_orderkey"),
        ((col("o_totalprice") - col("mu")) / col("sigma")).as("z"))
      .orderBy("o_orderkey")
  }

  val q08Sql: String =
    s"""SELECT o_orderkey, (o_totalprice - mu) / sigma AS z
       |FROM orders CROSS JOIN (
       |  SELECT ${davgSql("o_totalprice")} AS mu,
       |         ${dstddevSql("o_totalprice")} AS sigma FROM orders)
       |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q09
  /** A2: groupBy + collect_list with canonical ordering (sort_array) —
    * the reference's variant-list aggregation (BamReader.scala:138-146),
    * rendered as a deterministic string. */
  def q09CollectSorted(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(
          transform(sort_array(collect_list(col("l_linenumber"))),
            x => x.cast(StringType)), ",").as("linenumbers"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_orderkey")

  val q09Sql: String =
    """SELECT l_orderkey,
      |  STRING_AGG(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS linenumbers,
      |  COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Distinct aggregation (absent from the reference, §2.4). */
  def q10Distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  val q10Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Window function: top-3 orders per customer by price, deterministic
    * tie-break. Partition-parallel; no global sort. (§2.5 — absent from
    * reference, required capability.) */
  def q11WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  val q11Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Global top-k: agg then TakeOrderedAndProject (limit pushes into a
    * per-partition top-k, no full sort shuffle). */
  def q12TopK(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(dsum(netPrice, 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  val q12Sql: String =
    s"""SELECT l_orderkey, ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
       |FROM lineitem GROUP BY l_orderkey
       |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q13
  /** Rollup (grouping sets) — subtotals + grand total; NULL group keys
    * coalesced to a sentinel so ordering/hashing is engine-neutral. */
  def q13Rollup(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"), col("l_linenumber")) // r16 fan-out; r17 PK keys
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val q13Sql: String =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       |  COALESCE(l_linestatus, '(all)') AS linestatus,
       |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Scalar string/math/conditional kernel (§2.6): all codegen'd builtins,
    * no UDFs in the hot path. */
  def q14ScalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .where(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        when(col("p_size") > 25, lit("large"))
          .when(col("p_size") > 10, lit("medium"))
          .otherwise(lit("small")).as("size_class"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        (col("p_retailprice") * lit(1.1)).as("marked_up"))
      .orderBy("p_partkey")

  val q14Sql: String =
    """SELECT p_partkey, UPPER(SUBSTR(p_name, 1, 8)) AS name_prefix,
      |  LENGTH(p_name) AS name_len,
      |  CASE WHEN p_size > 25 THEN 'large'
      |       WHEN p_size > 10 THEN 'medium' ELSE 'small' END AS size_class,
      |  p_brand || '#' || p_type AS brand_type,
      |  p_retailprice * 1.1 AS marked_up
      |FROM part WHERE p_name LIKE '%a%'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Tumbling-window aggregation over event time (batch formulation of the
    * streaming query in graft.streaming.EventStreams): date_trunc bucket +
    * hash agg. */
  def q15HourlyEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("hour", "event_type")

  val q15Sql: String =
    s"""SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       |  COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- q16
  /** Theta-augmented equi-join (equi key + range predicate): the join keys
    * shuffle, the range predicate evaluates post-match — Spark plans this
    * as hash/SMJ + filter, not a nested loop. */
  def q16RangeJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late_lines"))
      .orderBy("o_orderpriority")

  val q16Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_late_lines
      |FROM lineitem JOIN orders
      |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q17
  /** As-of join (point-in-time): latest order at-or-before each event for
    * that user. Implemented scale-out as the union-sort trick: tag both
    * sides, sort within user partition by (ts, side), propagate the last
    * seen order key with last_value(ignoreNulls) — one shuffle, no
    * per-row subquery, no quadratic blow-up. Oracle uses DuckDB ASOF JOIN. */
  def q17AsofJoin(s: SparkSession, d: String): DataFrame = {
    // de-dup rhs to one row per (user, date) so the match is unambiguous
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("user_id"), col("o_orderdate").cast(TimestampNTZType).as("ts"),
        col("o_orderkey"), lit(0).as("side"), lit(null).cast(LongType).as("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), lit(null).cast(LongType).as("o_orderkey"),
        lit(1).as("side"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .orderBy("event_id")
  }

  val q17Sql: String =
    """WITH od AS (
      |  SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, od.o_orderkey AS last_orderkey
      |FROM events e ASOF LEFT JOIN od
      |  ON e.user_id = od.user_id AND e.ts >= od.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // ---------------------------------------------------------------- q18
  /** Set operations beyond union: INTERSECT / EXCEPT (distinct semantics
    * in both engines). */
  def q18SetOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val big  = o.where(col("o_totalprice") > 150000.0).select("o_custkey")
    val open = o.where(col("o_orderstatus") === "O").select("o_custkey")
    val frm  = o.where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    big.intersect(open).except(frm)
      .withColumnRenamed("o_custkey", "custkey")
      .orderBy("custkey")
  }

  val q18Sql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q19
  /** Pivot-style conditional aggregation — engine-neutral CASE formulation
    * (column names fully controlled, unlike groupBy().pivot()). */
  def q19ConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_partial"))
      .orderBy("o_orderpriority")

  val q19Sql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q20
  /** JSON extraction (events.props) — scalar JSON path + numeric cast. */
  def q20JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.events(s, d), col("event_id")) // r16 fan-out; r17 PK key
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .where(col("k") > 50)
      .orderBy("event_id")

  val q20Sql: String =
    """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
      |FROM events WHERE CAST(props->>'$.k' AS INTEGER) > 50
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q21
  /** Sessionization via window functions: 30-min inactivity gap → session
    * ids (lag + conditional cumulative sum), then per-user session stats.
    * Same shape covers the streaming session-window case in batch. */
  def q21Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts").cast(TimestampType)))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800L * 1000000L,
          1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")
  }

  val q21Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |         OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |sess AS (
      |  SELECT user_id,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM tagged),
      |per_sess AS (
      |  SELECT user_id, session_id, COUNT(*) AS n_events
      |  FROM sess GROUP BY 1, 2)
      |SELECT user_id, MAX(session_id) AS n_sessions,
      |  MAX(n_events) AS max_session_events
      |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q27
  /** q17's as-of join through the custom physical operator
    * (graft.plans.AsOfJoinExec): co-partitioned sort-merge with a single
    * forward cursor per partition — same oracle as q17. */
  // ---------------------------------------------------------------- q80
  /** The as-of DIRECTION trio on the custom sort-merge plan — pandas
    * `merge_asof`'s full surface (backward / forward / nearest ±
    * tolerance), all riding [[graft.plans.AsOfJoinExec]]'s single
    * forward cursor: the forward candidate is the PEEKED head (never
    * consumed, so later probes keep it), nearest picks the closer side
    * with ties to backward, tolerance null-extends matches farther than
    * the bound. Unique (key, time) on both sides by construction, so
    * every tie rule is closed-form for the oracle's correlated-argmin
    * restatement. Same scale shape as q27: one co-partitioned exchange
    * per side + a streaming merge, three times over. */
  def q80AsofDirections(s: SparkSession, d: String): DataFrame = {
    import graft.plans.AsOf
    val li = Tables.lineitem(s, d)
    val l = li.select((col("l_suppkey") % 40).cast("long").as("k"),
        ((col("l_partkey") * 17) % 1000).cast("long").as("t")).distinct()
    val r = li.select((col("l_partkey") % 40).cast("long").as("rk"),
        ((col("l_suppkey") * 29) % 1000).cast("long").as("rt")).distinct()
      .withColumn("v", col("rk") * 100000L + col("rt"))
    val b = AsOf.join(l, r, "k", "rk", "t", "rt")
      .select(col("k"), col("t"), col("v").as("b_v"))
    val f = AsOf.join(l, r, "k", "rk", "t", "rt", direction = "forward")
      .select(col("k"), col("t"), col("v").as("f_v"))
    val n = AsOf.join(l, r, "k", "rk", "t", "rt",
        direction = "nearest", tolerance = 50L)
      .select(col("k"), col("t"), col("v").as("n_v"))
    b.join(f, Seq("k", "t")).join(n, Seq("k", "t")).orderBy("k", "t")
  }

  val q80Sql: String =
    """WITH l AS (SELECT DISTINCT l_suppkey % 40 AS k,
      |    (l_partkey * 17) % 1000 AS t FROM lineitem),
      |r AS (SELECT rk, rt, rk * 100000 + rt AS v FROM (
      |  SELECT DISTINCT l_partkey % 40 AS rk,
      |    (l_suppkey * 29) % 1000 AS rt FROM lineitem))
      |SELECT CAST(l.k AS BIGINT) AS k, CAST(l.t AS BIGINT) AS t,
      |  CAST((SELECT v FROM r WHERE r.rk = l.k AND r.rt <= l.t
      |        ORDER BY r.rt DESC LIMIT 1) AS BIGINT) AS b_v,
      |  CAST((SELECT v FROM r WHERE r.rk = l.k AND r.rt >= l.t
      |        ORDER BY r.rt ASC LIMIT 1) AS BIGINT) AS f_v,
      |  CAST((SELECT v FROM r WHERE r.rk = l.k AND abs(r.rt - l.t) <= 50
      |        ORDER BY abs(r.rt - l.t), r.rt LIMIT 1) AS BIGINT) AS n_v
      |FROM l ORDER BY k, t""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Misra–Gries HEAVY HITTERS ([[graft.functions.HeavyHitters]]) — the
    * mergeable frequent-items sketch: k counters per partial buffer,
    * map-side combinable, k (item, est) pairs per task across the
    * shuffle — "which keys dominate this column" without shuffling the
    * key space (exact GROUP BY's cost). The sketch CONTENT is
    * partition-order-dependent, so the gate pins only the sketch's
    * deterministic THEOREMS, on a planted key whose true frequency
    * (~n/10) clears the n/(k+1) detection bound with k=20: `found_ok`
    * (every above-bound item is present in the sketch) and `bounds_ok`
    * (est never exceeds truth, and undercounts by at most n/(k+1) across
    * any merge tree). n_rows / f_true are exact for the oracle; a
    * `require` keeps the planted frequency above the bound so the
    * guarantee can never silently go vacuous. */
  def q81HeavyHittersGate(s: SparkSession, d: String): DataFrame = {
    val k = 20
    val planted = 999999999L
    val vals = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 10 === 0, lit(planted))
        .otherwise(col("l_partkey").cast("long")).as("v"))
    val est = vals
      .agg(graft.functions.HeavyHittersExpr.heavyHitters(col("v"), k)
        .as("hh"))
      .select(explode(col("hh")).as("e"))
      .where(col("e.item") === planted)
      .select(col("e.est"))
      .collect().headOption.map(_.getLong(0))
    val n = vals.count()
    val f = vals.where(col("v") === planted).count()
    require(f > n / (k + 1),
      s"q81 fixture degenerate: planted freq $f <= detection bound ${n / (k + 1)}")
    val found = est.isDefined
    val boundsOk = est.exists(e => e <= f && e >= f - n / (k + 1))
    import s.implicits._
    Seq((n, f, found, boundsOk))
      .toDF("n_rows", "f_true", "found_ok", "bounds_ok")
  }

  val q81Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 10 = 0) AS BIGINT)
      |    AS f_true,
      |  true AS found_ok, true AS bounds_ok
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q82
  /** STREAMING heavy hitters — q81's Misra–Gries aggregate as live
    * streaming state: the staged value column replays as a file-source
    * micro-batch stream (repartitioned to 4 files, `maxFilesPerTrigger 1`,
    * so the sketch state MERGES across ≥ 4 batches through the state
    * store's serialize/merge path — the exact surface a single-batch run
    * would leave untested). The mergeable-summaries bound is
    * merge-tree-INDEPENDENT, so the q81 theorems transfer verbatim to
    * the streamed sketch: the planted ~n/10 key must be present and its
    * estimate within [truth − n/(k+1), truth]. Complete-mode memory sink
    * on an isolated session clone, dataset-tagged names (x25
    * discipline). */
  def q82StreamHeavyHittersGate(s: SparkSession, d: String): DataFrame = {
    val k = 20
    val planted = 999999999L
    val vals = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 10 === 0, lit(planted))
        .otherwise(col("l_partkey").cast("long")).as("v"))
    import graft.sources.HadoopIO
    val sfTag = d.replaceAll("[^A-Za-z0-9]", "_")
    val stageDir = s"${HadoopIO.scratchDir(s)}/graft_q82_$sfTag"
    vals.repartition(4).write.mode("overwrite").parquet(stageDir)
    val s2 = s.newSession()
    val stream = s2.readStream.schema(vals.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stageDir)
    val tbl = s"q82_hh_$sfTag"
    val q = stream
      .agg(graft.functions.HeavyHittersExpr.heavyHitters(col("v"), k)
        .as("hh"))
      .writeStream.format("memory").queryName(tbl).outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    val est = s2.table(tbl).select(explode(col("hh")).as("e"))
      .where(col("e.item") === planted)
      .select(col("e.est"))
      .collect().headOption.map(_.getLong(0))
    val n = vals.count()
    val f = vals.where(col("v") === planted).count()
    require(f > n / (k + 1),
      s"q82 fixture degenerate: planted freq $f <= bound ${n / (k + 1)}")
    val boundsOk = est.exists(e => e <= f && e >= f - n / (k + 1))
    import s.implicits._
    Seq((n, f, est.isDefined, boundsOk))
      .toDF("n_rows", "f_true", "found_ok", "bounds_ok")
  }

  val q82Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) FILTER (WHERE l_orderkey % 10 = 0) AS BIGINT)
      |    AS f_true,
      |  true AS found_ok, true AS bounds_ok
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q83
  /** PARTITION-PRUNE (zone-map) GATE — the data-layout contract that
    * makes 100 TB scans affordable: a table written CLUSTERED on a
    * predicate column (directory-partitioned by year here; sort-order +
    * parquet min/max footers are the within-file analogue) must be read
    * with the filter resolved AGAINST THE LAYOUT, touching only the
    * matching partitions. The proof is plan-level, not row-level:
    * `input_file_name` alone cannot distinguish pruning from
    * scan-everything-filter-rows (emitted rows always come from the
    * matching files), so the gate reads `FileSourceScanExec
    * .selectedPartitions` — the number of directories the scan will
    * actually list — and requires exactly one of the seven years, plus
    * the file-level containment check as a sanity layer. The aggregate
    * itself is oracle-checked against the unpartitioned source. */
  def q83PartitionPruneGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q83_$tag"
    Tables.orders(s, d)
      .withColumn("oyear", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("oyear").parquet(root)
    val t = s.read.parquet(root)
    val filtered = t.where(col("oyear") === 1996)
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    require(scans.nonEmpty, "q83: no parquet scan in the executed plan")
    val nSelected = scans.map(_.selectedPartitions.partitionCount).sum
    val nTotal = t.select(col("oyear")).distinct().count()
    val prunedOk = nSelected == 1 && nTotal >= 5
    val filesOk = filtered.select(input_file_name().as("f")).distinct()
      .where(!col("f").contains("oyear=1996")).count() == 0L
    filtered.agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .select(col("n_rows"), col("key_sum"), col("n_cust"),
        lit(prunedOk).as("pruned_ok"), lit(filesOk).as("files_ok"))
  }

  val q83Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  true AS pruned_ok, true AS files_ok
      |FROM orders WHERE year(o_orderdate) = 1996""".stripMargin

  // ---------------------------------------------------------------- q84
  /** INCREMENTAL VIEW MAINTENANCE gate — the aggregate-level sibling of
    * q76's row-level MERGE: a materialized distributive aggregate
    * (count + sum per key) is maintained under a CDC delta batch by
    * merging SIGNED delta partials into the stored aggregates — deletes
    * contribute (−1, −qty), inserts (+1, +qty), and a key whose
    * maintained count reaches zero leaves the view. The base table is
    * NEVER rescanned: the only work is aggregating the delta (tiny by
    * definition) and ONE key-keyed full-outer merge into the view — new
    * delta keys must surface, so the merge is full-outer, and Spark can
    * only build a full-outer hash join from shuffled sides (the
    * preserved side of a broadcast join is illegal to broadcast). That
    * exchange is the view's own hash partitioning: with the view STORED
    * bucketed by key (the q44 layout) the merge co-locates and the
    * shuffle disappears; the delta side is negligible either way. The
    * gate pins the plan to exactly that single equi-merge — no
    * nested-loop or cartesian fallback. The identity maintained ≡
    * recomputed is THE theorem of distributive aggregates, and the gate
    * checks it literally: the row carries an `ivm_ok` boolean from an
    * exceptAll-both-ways comparison against a from-scratch recompute of
    * the post-CDC state. */
  /** The maintenance kernel: signed delta partials (k, dn, dsq) merged
    * into the stored view (k, n, sq); zero-count keys leave the view. */
  private[operators] def ivmMerge(baseAgg: DataFrame,
      deltaAgg: DataFrame): DataFrame =
    baseAgg.join(deltaAgg, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sq"), lit(0L)) + coalesce(col("dsq"), lit(0L)))
          .as("sum_qty"))
      .where(col("n_rows") > 0)

  def q84IvmGate(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("k"),
      col("l_quantity").cast("long").as("qty"),
      col("l_orderkey").as("ok"))
    val base = li.where(col("ok") % 4 =!= 3)
    val baseAgg = base.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
    val deletes = base.where(col("ok") % 8 === 1)
      .select(col("k"), lit(-1L).as("sgn"), col("qty"))
    val inserts = li.where(col("ok") % 4 === 3)
      .select(col("k"), lit(1L).as("sgn"), (col("qty") + 100L).as("qty"))
    val deltaAgg = deletes.unionByName(inserts)
      .groupBy(col("k"))
      .agg(sum(col("sgn")).as("dn"), sum(col("sgn") * col("qty")).as("dsq"))
    val merged = ivmMerge(baseAgg, deltaAgg)
    val plan = merged.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastNestedLoop") &&
        !plan.contains("CartesianProduct"),
      "q84: the delta merge degraded to a non-equi join — maintenance " +
        "must be one key-keyed merge")
    val recomputed = base.where(col("ok") % 8 =!= 1)
      .select(col("k"), col("qty"))
      .unionByName(inserts.select(col("k"), col("qty")))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
    val ivmOk = merged.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(merged).isEmpty
    merged.withColumn("ivm_ok", lit(ivmOk)).orderBy(col("k"))
  }

  val q84Sql: String =
    """WITH li AS (SELECT l_returnflag AS k,
      |    CAST(l_quantity AS BIGINT) AS qty, l_orderkey AS ok
      |  FROM lineitem),
      |fin AS (SELECT k, qty FROM li WHERE ok % 4 <> 3 AND ok % 8 <> 1
      |  UNION ALL SELECT k, qty + 100 FROM li WHERE ok % 4 = 3)
      |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(qty) AS BIGINT) AS sum_qty, true AS ivm_ok
      |FROM fin GROUP BY k ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q85
  /** RETENTION COHORT MATRIX — the product-analytics workhorse every
    * event warehouse serves: users grouped by first-seen day (their
    * cohort), then each (cohort, day-offset) cell counts users still
    * active that many days later. Two aggregates: the user dim (first
    * day per user — one shuffle on user_id, map-side combinable) joins
    * back onto the event stream broadcast (users ≪ events; a
    * billion-user estate swaps the hint for the shuffle join, plan
    * otherwise unchanged), then per-cell DISTINCT users — the dedup
    * pre-aggregates map-side on (cohort, offset, user) before the final
    * cell count, so repeat events collapse before the exchange. */
  def q85RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.join(broadcast(cohort), Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  val q85Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
      |a AS (SELECT DISTINCT c.cohort_day,
      |    CAST(e.day - c.cohort_day AS INT) AS day_offset, e.user_id
      |  FROM e JOIN c USING (user_id))
      |SELECT cohort_day, day_offset, CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM a GROUP BY cohort_day, day_offset
      |ORDER BY cohort_day, day_offset""".stripMargin

  // ---------------------------------------------------------------- q86
  /** COUNT-MIN SKETCH point queries, exactly oracle-checked — the
    * mergeable frequency summary complementing q81's Misra–Gries: MG
    * surfaces which keys dominate, CMS answers "how often is key x" for
    * ANY x in O(depth). CMS is LINEAR (counters are exact sums of
    * colliding items), so unlike MG its CONTENT is order- and
    * merge-tree-independent — the oracle replays every hash collision
    * in SQL and matches the estimates bit-for-bit, and the one-sided
    * guarantee est ≥ true is asserted per probe (`lower_ok`). The
    * sketch aggregates through the real TypedImperativeAggregate
    * ([[graft.functions.CountMinExpr]]) across 8 forced partitions, so
    * partial-update + merge both execute; probes query the array with
    * pure builtin arithmetic (codegen-resident, P = 2³¹−1 hashes chosen
    * to stay overflow-free in engines without wrapping int64). */
  def q86CountMinGate(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CountMinExpr
    val depth = 3; val width = 64
    val vals = Tables.lineitem(s, d).select(
      when(col("l_orderkey") % 3 === 0, lit(7L))
        .otherwise(col("l_orderkey") % 100).cast("long").as("v"))
    val sk = vals.repartition(8)
      .agg(CountMinExpr.countMin(col("v"), depth, width).as("sk"))
    val probes = s.range(0, 10).select(col("id").as("p"))
    val truth = vals.groupBy(col("v").as("p"))
      .agg(count(lit(1)).as("true_cnt"))
    probes.crossJoin(broadcast(sk))
      .join(truth, Seq("p"), "left_outer")
      .select(col("p"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"),
        CountMinExpr.cmsQuery(col("sk"), col("p"), depth, width).as("est"))
      .withColumn("lower_ok", col("est") >= col("true_cnt"))
      .orderBy("p")
  }

  val q86Sql: String =
    """WITH vals AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 7
      |    ELSE l_orderkey % 100 END AS v FROM lineitem),
      |c(d, a, b) AS (VALUES (0, 654435761, 12345), (1, 1000003, 67890),
      |  (2, 999983, 424242)),
      |vh AS (SELECT d, ((v % 2147483647) * a + b) % 2147483647 % 64 AS j
      |  FROM vals, c),
      |counter AS (SELECT d, j, COUNT(*) AS cnt FROM vh GROUP BY d, j),
      |probes AS (SELECT unnest(generate_series(0, 9)) AS p),
      |ph AS (SELECT p, d,
      |    ((p % 2147483647) * a + b) % 2147483647 % 64 AS j
      |  FROM probes, c),
      |e AS (SELECT p, MIN(COALESCE(cnt, 0)) AS est
      |  FROM ph LEFT JOIN counter USING (d, j) GROUP BY p),
      |t AS (SELECT v AS p, COUNT(*) AS true_cnt FROM vals GROUP BY v)
      |SELECT e.p, CAST(COALESCE(t.true_cnt, 0) AS BIGINT) AS true_cnt,
      |  CAST(e.est AS BIGINT) AS est,
      |  e.est >= COALESCE(t.true_cnt, 0) AS lower_ok
      |FROM e LEFT JOIN t USING (p) ORDER BY p""".stripMargin

  // ---------------------------------------------------------------- q87
  /** KMV / BOTTOM-K DISTINCT SKETCH (Bar-Yossef et al. 2002, the
    * ThetaSketch core): keep the k smallest DISTINCT 32-bit hashes of
    * the key; estimate = (k−1)·2³² div h_k. Completes the sketch trio —
    * q32's HLL is opaque (rows-only check), q86's CMS answers point
    * frequencies; KMV answers distinct-count AND, unlike HLL, its
    * CONTENT is fully deterministic given the hash, so the oracle
    * replays the identical md5-derived bottom-k in SQL and the estimate
    * matches bit-for-bit. Bottom-k sketches union by merge-and-truncate
    * (closed under set union), which is exactly what the distributed
    * plan below executes.
    *
    * Scale shape: dedup-by-hash is ONE uniform shuffle on the 32-bit
    * hash key (map-side combined); the global bottom-k plans as
    * TakeOrderedAndProject — per-partition k-heaps merged on the
    * driver, NEVER a global sort exchange (pinned by an in-row plan
    * require — a planner regression flips CORRECTNESS, not a bench
    * number). When fewer than k distinct keys exist the sketch IS the
    * key set and the estimate is exact by rule. */
  def q87KmvSketch(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val mins = Tables.orders(s, d)
      .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct()
      .orderBy("h").limit(k)
    require(mins.queryExecution.executedPlan.toString
        .contains("TakeOrderedAndProject"),
      "bottom-k must plan as TakeOrderedAndProject, not a global sort")
    val exact = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    mins.agg(max(col("h")).as("kth_hash"), count(lit(1)).as("k_actual"))
      .crossJoin(broadcast(exact)) // 1×1 scalar composition
      .withColumn("est_distinct",
        when(col("k_actual") < k, col("exact_distinct"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div kth_hash")))
      .select(col("k_actual"), col("kth_hash"), col("est_distinct"),
        col("exact_distinct"),
        expr("(1000 * abs(est_distinct - exact_distinct)) div exact_distinct")
          .as("err_permille"))
  }

  val q87Sql: String =
    """WITH h AS (SELECT DISTINCT CAST(CONCAT('0x',
      |    substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      |  FROM orders),
      |mins AS (SELECT h FROM h ORDER BY h LIMIT 64),
      |ag AS (SELECT MAX(h) AS kth_hash, COUNT(*) AS k_actual FROM mins),
      |ex AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders),
      |est AS (SELECT k_actual, kth_hash, exact_distinct,
      |    CASE WHEN k_actual < 64 THEN exact_distinct
      |      ELSE (63 * 4294967296) // kth_hash END AS est_distinct
      |  FROM ag, ex)
      |SELECT CAST(k_actual AS BIGINT) AS k_actual,
      |  CAST(kth_hash AS BIGINT) AS kth_hash,
      |  CAST(est_distinct AS BIGINT) AS est_distinct,
      |  CAST(exact_distinct AS BIGINT) AS exact_distinct,
      |  CAST((1000 * abs(est_distinct - exact_distinct)) // exact_distinct
      |    AS BIGINT) AS err_permille
      |FROM est""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Z-ORDER (Morton) LAYOUT GATE — the MULTI-dimensional data-layout
    * contract behind Delta `OPTIMIZE ZORDER BY` / Iceberg sort orders,
    * completing q83's single-column partition pruning: interleaving the
    * bits of two predicate columns makes an aligned 2-D box a SINGLE
    * contiguous z-range, so ONE directory layout serves range queries
    * on EITHER (or both) dimensions — where q83's year-partitioning
    * serves only year. The engine-side query rewrite is the operator:
    * the 2-D box decomposes (driver-side, over the dictionary-sized
    * 16×16 key domain) into the z-buckets it intersects, the bucket
    * IN-list prunes directories at plan time
    * (`FileSourceScanExec.selectedPartitions`, the q83 proof — emitted
    * rows can't distinguish pruning from scan-everything), and the
    * residual row filter keeps exactness. The gate's aligned 4×4 box
    * must touch exactly ONE of 16 buckets; the aggregate itself is
    * oracle-checked against the unpartitioned source. */
  def q88ZorderGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    def morton(x: Int, y: Int): Int = {
      var z = 0
      for (i <- 0 until 4) {
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
      }
      z
    }
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q88_$tag"
    val zExpr = expr(
      """CAST(shiftleft(zx & 8, 4) | shiftleft(zy & 8, 3)
        |   | shiftleft(zx & 4, 3) | shiftleft(zy & 4, 2)
        |   | shiftleft(zx & 2, 2) | shiftleft(zy & 2, 1)
        |   | shiftleft(zx & 1, 1) | (zy & 1) AS INT)""".stripMargin)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(o_custkey % 16 AS INT)").as("zx"),
        expr("CAST((o_orderkey div 7) % 16 AS INT)").as("zy"))
      .withColumn("zbucket", zExpr.cast("int").divide(16).cast("int"))
      .write.mode("overwrite").partitionBy("zbucket").parquet(root)
    val t = s.read.parquet(root)
    val buckets = (for { x <- 4 to 7; y <- 8 to 11 } yield morton(x, y) / 16)
      .distinct.sorted
    val filtered = t
      .where(col("zbucket").isin(buckets: _*) &&
        col("zx").between(4, 7) && col("zy").between(8, 11))
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    require(scans.nonEmpty, "q88: no parquet scan in the executed plan")
    val nSelected = scans.map(_.selectedPartitions.partitionCount).sum
    val nTotal = t.select(col("zbucket")).distinct().count()
    val alignedOk = buckets.size == 1
    val prunedOk = nSelected == buckets.size && nTotal >= 12
    filtered.agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_orderkey")).as("key_sum"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .select(col("n_rows"), col("key_sum"), col("n_cust"),
        lit(alignedOk).as("aligned_ok"), lit(prunedOk).as("pruned_ok"))
  }

  val q88Sql: String =
    """WITH z AS (SELECT o_orderkey, o_custkey,
      |    o_custkey % 16 AS zx, (o_orderkey // 7) % 16 AS zy
      |  FROM orders)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  TRUE AS aligned_ok, TRUE AS pruned_ok
      |FROM z WHERE zx BETWEEN 4 AND 7 AND zy BETWEEN 8 AND 11""".stripMargin

  // ---------------------------------------------------------------- q89
  /** ORDERED FUNNEL (ClickHouse `windowFunnel` / Amplitude funnels) —
    * the product-analytics staple missing between q21's sessionization
    * and q85's retention: per user, step i+1 counts only with an event
    * STRICTLY AFTER step i's completion time and within a fixed window
    * of the STEP-1 ANCHOR; each step reports users reached and
    * conversion vs step 1. The per-step recurrence is a driver-side
    * LOOP over a declarative plan — each stage is one uniform
    * user-keyed equi-join + min-aggregate (map-side combinable), never
    * a per-user event sort or a window over the whole event stream;
    * the step-count roll-up is k single-row aggregates unioned, and
    * conversion joins the step-1 scalar by broadcast. At 100 TB each
    * stage shuffles only the users still in the funnel — monotonically
    * shrinking by construction. */
  def funnel(ev: DataFrame, steps: Seq[String],
      windowMicros: Long): DataFrame = {
    require(steps.size >= 2, "funnel needs at least two steps")
    val base = ev.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast(TimestampType)).as("us"))
    val first = base.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
      .withColumn("anchor", col("t"))
    val frames = steps.tail.scanLeft(first) { (prev, step) =>
      base.where(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("tprev"),
          col("anchor")), Seq("user_id"))
        .where(col("us") > col("tprev") &&
          col("us") <= col("anchor") + windowMicros)
        .groupBy(col("user_id"), col("anchor"))
        .agg(min(col("us")).as("t"))
    }
    val counts = frames.zip(steps).zipWithIndex.map {
      case ((f, step), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1L).as("step"), lit(step).as("event_type"),
            col("n_users"))
    }.reduce(_.unionByName(_))
    val n1 = frames.head.agg(count(lit(1)).as("n1"))
    counts.crossJoin(broadcast(n1)) // k×1 scalar composition
      .select(col("step"), col("event_type"), col("n_users"),
        expr("CASE WHEN n1 = 0 THEN NULL ELSE (1000 * n_users) div n1 END")
          .as("conv_permille"))
      .orderBy("step")
  }

  /** Driver gate: the corpus's natural view → click → purchase journey
    * over a 72 h anchor window. */
  def q89Funnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d), Seq("view", "click", "purchase"),
      72L * 3600L * 1000000L)

  val q89Sql: String =
    """WITH e AS (SELECT user_id, event_type, EPOCH_US(ts) AS us
      |  FROM events),
      |s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, s1.t1, MIN(e.us) AS t2
      |  FROM e JOIN s1 USING (user_id)
      |  WHERE e.event_type = 'click' AND e.us > s1.t1
      |    AND e.us <= s1.t1 + 259200000000
      |  GROUP BY e.user_id, s1.t1),
      |s3 AS (SELECT e.user_id, s2.t1, MIN(e.us) AS t3
      |  FROM e JOIN s2 USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.us > s2.t2
      |    AND e.us <= s2.t1 + 259200000000
      |  GROUP BY e.user_id, s2.t1),
      |n AS (
      |  SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users
      |    FROM s1
      |  UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
      |  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)
      |SELECT CAST(step AS BIGINT) AS step, event_type,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(CASE WHEN (SELECT n_users FROM n WHERE step = 1) = 0
      |    THEN NULL ELSE (1000 * n_users)
      |      // (SELECT n_users FROM n WHERE step = 1) END AS BIGINT)
      |    AS conv_permille
      |FROM n ORDER BY step""".stripMargin

  // ---------------------------------------------------------------- q90
  /** KMV SET OPERATIONS — the payoff of q87's bottom-k sketch being
    * CLOSED UNDER UNION (the ThetaSketch union/intersection algebra):
    * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) exactly (a
    * theorem, not an approximation — the k smallest of a union are
    * among each side's k smallest), so two k-row sketches built on
    * opposite ends of a cluster merge into the union estimate without
    * revisiting either input; Jaccard ≈ |K(U) ∩ K(A) ∩ K(B)| / k and
    * intersection = J · union_est follow from the merged sketch alone.
    * Everything after the two per-set bottom-k scans (each the q87
    * TakeOrderedAndProject shape) operates on k-row frames — the merge
    * IS the distributed-union story at 100 TB. Fully deterministic
    * given the md5 hash; the oracle replays sketch content, estimates,
    * and exact counts bit-for-bit. */
  def q90KmvSetOps(s: SparkSession, d: String): DataFrame = {
    val k = 32
    def hashes(pred: Column): DataFrame = Tables.orders(s, d)
      .where(pred)
      .select(conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
        16, 10).cast("long").as("h"))
      .distinct()
    def bottomK(df: DataFrame): DataFrame = df.orderBy("h").limit(k)
    val ka = bottomK(hashes(col("o_custkey") % 3 =!= 0))
    val kb = bottomK(hashes(col("o_custkey") % 2 === 0))
    // merge-and-truncate: union of the two SKETCHES, never the inputs
    val ku = bottomK(ka.unionByName(kb).distinct())
    val uniStats = ku.agg(max(col("h")).as("u_kth"),
      count(lit(1)).as("u_n"))
    val jaccNum = ku
      .join(ka, Seq("h"), "left_semi").join(kb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("j_num"))
    val exact = Tables.orders(s, d).agg(
      countDistinct(when(col("o_custkey") % 3 =!= 0 ||
        col("o_custkey") % 2 === 0, col("o_custkey"))).as("exact_union"),
      countDistinct(when(col("o_custkey") % 3 =!= 0 &&
        col("o_custkey") % 2 === 0, col("o_custkey"))).as("exact_inter"))
    uniStats.crossJoin(broadcast(jaccNum)).crossJoin(broadcast(exact))
      .withColumn("union_est",
        when(col("u_n") < k, col("u_n").cast("long"))
          .otherwise(expr(s"(${k - 1}L * 4294967296L) div u_kth")))
      .select(lit(k.toLong).as("k"), col("u_kth"), col("union_est"),
        col("j_num"),
        expr(s"(1000 * j_num) div ${k}L").as("jaccard_permille"),
        expr(s"(j_num * union_est) div ${k}L").as("inter_est"),
        col("exact_union"), col("exact_inter"))
  }

  val q90Sql: String =
    """WITH ha AS (SELECT DISTINCT CAST(CONCAT('0x',
      |    substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      |  FROM orders WHERE o_custkey % 3 <> 0),
      |hb AS (SELECT DISTINCT CAST(CONCAT('0x',
      |    substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT) AS h
      |  FROM orders WHERE o_custkey % 2 = 0),
      |ka AS (SELECT h FROM ha ORDER BY h LIMIT 32),
      |kb AS (SELECT h FROM hb ORDER BY h LIMIT 32),
      |ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka
      |    UNION ALL SELECT h FROM kb) ORDER BY h LIMIT 32),
      |us AS (SELECT MAX(h) AS u_kth, COUNT(*) AS u_n FROM ku),
      |jn AS (SELECT COUNT(*) AS j_num FROM ku
      |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
      |ex AS (SELECT
      |    COUNT(DISTINCT CASE WHEN o_custkey % 3 <> 0 OR o_custkey % 2 = 0
      |      THEN o_custkey END) AS exact_union,
      |    COUNT(DISTINCT CASE WHEN o_custkey % 3 <> 0 AND o_custkey % 2 = 0
      |      THEN o_custkey END) AS exact_inter
      |  FROM orders),
      |est AS (SELECT u_kth, u_n, j_num, exact_union, exact_inter,
      |    CASE WHEN u_n < 32 THEN u_n
      |      ELSE (31 * 4294967296) // u_kth END AS union_est
      |  FROM us, jn, ex)
      |SELECT CAST(32 AS BIGINT) AS k, CAST(u_kth AS BIGINT) AS u_kth,
      |  CAST(union_est AS BIGINT) AS union_est,
      |  CAST(j_num AS BIGINT) AS j_num,
      |  CAST((1000 * j_num) // 32 AS BIGINT) AS jaccard_permille,
      |  CAST((j_num * union_est) // 32 AS BIGINT) AS inter_est,
      |  CAST(exact_union AS BIGINT) AS exact_union,
      |  CAST(exact_inter AS BIGINT) AS exact_inter
      |FROM est""".stripMargin

  def q27AsofCustom(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("r_user"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("r_user"),
        col("o_orderdate").cast(TimestampNTZType).as("r_ts"), col("o_orderkey"))
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    graft.plans.AsOf.join(ev, ord, "user_id", "r_user", "ts", "r_ts")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("last_orderkey"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q91
  /** TIME-SERIES RESAMPLING with LOCF (last observation carried
    * forward) — the gap-filling step every metrics/feature pipeline
    * runs before ML (pandas `resample().ffill()`, InfluxDB/Timescale
    * `locf(time_bucket(...))`): each user's irregular event stream
    * projects onto a regular 6-hour grid spanning that user's observed
    * range; the value at a grid instant is the latest event at-or-before
    * it, grid points before the first event stay NULL (LOCF invents
    * nothing). The grid→event lookup is EXACTLY an as-of join, served
    * by the engine's own `AsOfJoinExec` ([[graft.plans.AsOf]]) — one
    * user-keyed sort-merge pass, never a per-grid-point probe; same-
    * timestamp events deduplicate deterministically (max event_id
    * wins) BEFORE the join. Values compare cross-engine as exact
    * milli-integers via floor(double·1000) — an explicit floor, because
    * double→BIGINT casts TRUNCATE in Spark but ROUND in DuckDB. */
  def q91LocfResample(s: SparkSession, d: String): DataFrame = {
    val HourUs = 3600L * 1000000L
    val Period = 6L * HourUs
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts").cast(TimestampType)).as("us"),
      col("event_id"), col("value"))
    // r17: one user_id exchange up front serves the (user_id, us) dedup
    // aggregate AND both user-keyed consumers inside locfResample (the
    // grid aggregate and the as-of sort) — see q94's note
    val obs = ev.repartition(col("user_id"))
      .groupBy(col("user_id"), col("us"))
      .agg(max(struct(col("event_id"), col("value"))).as("mx"))
      .select(col("user_id"), col("us"),
        expr("CAST(floor(mx.value * 1000) AS BIGINT)").as("val_milli"))
    locfResample(obs, Period).orderBy("user_id", "bucket")
  }

  /** LOCF RESAMPLE KERNEL — extracted from q91 (r13) so the q115 fuzz
    * gate can drive it under randomized periods/tick geometry. `obs` is
    * one row per (user_id, us LONG, val_milli LONG); each user's
    * observed span projects onto the `period` grid (bucket = us div
    * period, integer div — a float quotient at 79999.9999999 would
    * disagree with the oracle's //), the value at a grid instant is the
    * latest observation at-or-before it via the custom AsOfJoinExec
    * (plan-asserted — one user-keyed sort-merge pass, never a
    * per-grid-point probe), and grid points before the first
    * observation stay NULL (LOCF invents nothing). */
  def locfResample(obs: DataFrame, period: Long): DataFrame = {
    val grid = obs.groupBy(col("user_id"))
      .agg(expr(s"min(us) div ${period}L").as("lo"),
        expr(s"max(us) div ${period}L").as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi)")).as("bucket"))
      .withColumn("g_us", col("bucket") * period)
    val right = obs.select(col("user_id").as("r_user"),
      col("us").as("r_us"), col("val_milli"))
    val joined = graft.plans.AsOf
      .join(grid, right, "user_id", "r_user", "g_us", "r_us")
    require(joined.queryExecution.executedPlan.toString
        .contains("AsOfJoin"),
      "LOCF must run on the custom AsOfJoinExec, not a rewritten window")
    joined.select(col("user_id"), col("bucket"), col("val_milli"))
  }

  val q91Sql: String =
    """WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_id, value
      |  FROM events),
      |obs AS (SELECT user_id, us,
      |    CAST(floor(arg_max(value, event_id) * 1000) AS BIGINT)
      |      AS val_milli
      |  FROM e GROUP BY user_id, us),
      |sp AS (SELECT user_id, MIN(us) // 21600000000 AS lo,
      |    MAX(us) // 21600000000 AS hi
      |  FROM e GROUP BY user_id),
      |grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS bucket
      |  FROM sp),
      |j AS (SELECT g.user_id, g.bucket, o.us, o.val_milli,
      |    ROW_NUMBER() OVER (PARTITION BY g.user_id, g.bucket
      |      ORDER BY o.us DESC) AS rn
      |  FROM grid g LEFT JOIN obs o
      |    ON o.user_id = g.user_id AND o.us <= g.bucket * 21600000000)
      |SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
      |  CAST(val_milli AS BIGINT) AS val_milli
      |FROM j WHERE rn = 1 ORDER BY user_id, bucket""".stripMargin

  // ---------------------------------------------------------------- q92
  /** TRIANGLE COUNTING on an oriented edge list — the graph-analytics
    * benchmark op after q79's PageRank (clustering coefficient, spam/
    * community detection): orienting every undirected edge low→high
    * makes each triangle appear EXACTLY once as a<b<c wedges closed by
    * an (a,c) edge, turning an O(Σdeg²)-ambiguous self-join into two
    * uniform equi-joins with no dedup pass (the Schank–Wagner /
    * GraphFrames discipline; at scale orientation goes by DEGREE, not
    * id, which bounds every wedge fan-out by √m — same plan, different
    * sort key). Edges synthesize from lineitem pairs, distinct once,
    * then never re-shuffle except on the join keys. */
  def triangleCount(pairs: DataFrame): DataFrame = {
    val edges = pairs.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b")).distinct()
    val wedges = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    val tri = wedges.join(edges,
      col("x") === col("a") && col("z") === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = edges.agg(count(lit(1)).as("n_edges"))
    val nodes = edges.select(col("a").as("n"))
      .unionByName(edges.select(col("b").as("n")))
      .agg(countDistinct(col("n")).as("n_nodes"))
    nodes.crossJoin(broadcast(stats)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  def q92Triangles(s: SparkSession, d: String): DataFrame =
    triangleCount(Tables.lineitem(s, d).select(
      (col("l_partkey") % 24).cast("long").as("u"),
      (col("l_suppkey") % 24).cast("long").as("v")))

  val q92Sql: String =
    """WITH raw AS (SELECT l_partkey % 24 AS u, l_suppkey % 24 AS v
      |  FROM lineitem WHERE l_partkey % 24 <> l_suppkey % 24),
      |edges AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b
      |  FROM raw),
      |tri AS (SELECT COUNT(*) AS n_triangles
      |  FROM edges e1 JOIN edges e2 ON e1.b = e2.a
      |    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
      |st AS (SELECT COUNT(*) AS n_edges FROM edges),
      |nd AS (SELECT COUNT(DISTINCT n) AS n_nodes FROM (
      |  SELECT a AS n FROM edges UNION ALL SELECT b FROM edges))
      |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
      |  CAST(n_edges AS BIGINT) AS n_edges,
      |  CAST(n_triangles AS BIGINT) AS n_triangles
      |FROM nd, st, tri""".stripMargin

  // ---------------------------------------------------------------- q93
  /** SNAPSHOT / TIME-TRAVEL READ (Delta `VERSION AS OF` / Iceberg
    * snapshot reads, manifest-file flavor) — the lakehouse isolation
    * contract q73 (compaction) and q74 (schema evolution) don't cover:
    * a table version IS its manifest (the closed file list captured at
    * commit time), so a reader pinned to the v1 manifest must see
    * EXACTLY the v1 rows no matter how many commits have landed since
    * — time travel is a property of the metadata layer, not the data
    * files. The gate commits twice into one directory, captures the
    * v1 manifest between commits, reads BOTH the pinned manifest and
    * the live directory, and oracle-checks both aggregates; the
    * manifest growth check pins that commit 2 actually added files
    * (otherwise the as-of read proves nothing). Scale shape: the
    * manifest is driver-side METADATA (file paths, the same size
    * class as any table catalog); both reads are plain pruned parquet
    * scans. */
  def q93TimeTravelGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q93_$tag"
    HadoopIO.delete(root, HadoopIO.driverConf())
    val orders = Tables.orders(s, d)
    orders.where(col("o_orderkey") % 2 === 0)
      .write.mode("append").parquet(root)
    def dataFiles(): Seq[String] =
      HadoopIO.listScanTargets(root, HadoopIO.driverConf())
        .map(_._1).filter(_.endsWith(".parquet")).sorted
    val v1Manifest = dataFiles()
    orders.where(col("o_orderkey") % 2 =!= 0)
      .write.mode("append").parquet(root)
    val v2Manifest = dataFiles()
    require(v1Manifest.nonEmpty, "q93: commit 1 produced no data files")
    val asOf = s.read.parquet(v1Manifest: _*)
      .agg(count(lit(1)).as("v1_rows"),
        sum(col("o_orderkey")).as("v1_key_sum"))
    val current = s.read.parquet(root)
      .agg(count(lit(1)).as("current_rows"),
        sum(col("o_orderkey")).as("current_key_sum"))
    val manifestOk = v2Manifest.size > v1Manifest.size &&
      v1Manifest.forall(v2Manifest.contains)
    asOf.crossJoin(broadcast(current)) // 1×1 scalar composition
      .select(col("v1_rows"), col("v1_key_sum"), col("current_rows"),
        col("current_key_sum"), lit(manifestOk).as("manifest_ok"))
  }

  val q93Sql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS v1_rows,
      |  CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey ELSE 0 END)
      |    AS BIGINT) AS v1_key_sum,
      |  CAST(COUNT(*) AS BIGINT) AS current_rows,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS current_key_sum,
      |  TRUE AS manifest_ok
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q28
  /** Top-k values per group via the custom MaxK TypedImperativeAggregate
    * (bounded k-double buffer, map-side combinable) — vs the window
    * formulation that sorts whole groups (q11). Exploded to rows for the
    * oracle. */
  def q28TopkAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.MaxKExpr.maxK(col("o_totalprice"), 3).as("topk"))
      .select(col("o_orderpriority"),
        posexplode(col("topk")).as(Seq("pos", "price")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rank"), col("price"))
      .orderBy("o_orderpriority", "rank")

  val q28Sql: String =
    """SELECT o_orderpriority, rn AS rank, price FROM (
      |  SELECT o_orderpriority, o_totalprice AS price,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, rank""".stripMargin

  // ---------------------------------------------------------------- q22
  /** Full outer join with genuinely unmatched rows on both sides
    * (capability beyond the reference, SURVEY §2.3). */
  def q22FullOuterJoin(s: SparkSession, d: String): DataFrame = {
    val negCust = Tables.customer(s, d)
      .where(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"), col("c_name"))
    val bigOrders = Tables.orders(s, d)
      .where(col("o_totalprice") > 200000.0)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_big"))
    negCust.join(bigOrders, Seq("custkey"), "full_outer")
      .select(col("custkey"),
        coalesce(col("c_name"), lit("(none)")).as("name"),
        coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy("custkey")
  }

  val q22Sql: String =
    """SELECT COALESCE(a.custkey, b.custkey) AS custkey,
      |  COALESCE(a.c_name, '(none)') AS name,
      |  COALESCE(b.n_big, 0) AS n_big
      |FROM (SELECT c_custkey AS custkey, c_name FROM customer WHERE c_acctbal < 0) a
      |FULL OUTER JOIN (SELECT o_custkey AS custkey, COUNT(*) AS n_big
      |                 FROM orders WHERE o_totalprice > 200000.0 GROUP BY 1) b
      |  ON a.custkey = b.custkey
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Exact interpolated percentiles (the p*(n-1) continuous definition,
    * matching DuckDB quantile_cont) — computed via a distributed value
    * histogram instead of the builtin `percentile`, whose aggregator
    * buffers EVERY value per group (per-group memory ∝ group size; a
    * 100 TB group OOMs). Here: count per (group, value) [first shuffle,
    * sized by distinct values], cumulative 0-based index ranges by sorted
    * value, then each target index k is answered by the aggregable
    * `min(v | cum > k)` and interpolated. Scales with distinct values,
    * not rows. */
  def q23Percentiles(s: SparkSession, d: String): DataFrame = {
    // r17 A/B (VERDICT r16 #7), measured and REVERTED: even a narrow
    // 2-column fan-out regressed q23 at sf0.1 (1.7 → 2.2 s). The value
    // histogram's partial aggregate barely reduces (l_extendedprice is
    // near-unique), so the added exchange shuffles ~every row twice to
    // parallelize an agg that saves nothing. At 100 TB the scan is
    // naturally parallel; nothing scale-relevant to fix.
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val byFlag = Window.partitionBy(col("l_returnflag"))
    val wCum = byFlag.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    val hist = counts
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(byFlag))
    def k0(p: Double): Column = floor(lit(p) * (col("total") - 1))
    val agg = hist.groupBy(col("l_returnflag")).agg(
      max(col("total")).as("n"),
      min(when(col("cum") > k0(0.5), col("v"))).as("a50"),
      min(when(col("cum") > k0(0.5) + 1, col("v"))).as("b50"),
      min(when(col("cum") > k0(0.9), col("v"))).as("a90"),
      min(when(col("cum") > k0(0.9) + 1, col("v"))).as("b90"))
    def interp(a: Column, b: Column, p: Double): Column = {
      val r = lit(p) * (col("n") - 1)
      val frac = r - floor(r)
      a + frac * (coalesce(b, a) - a)
    }
    agg.select(col("l_returnflag"),
      round(interp(col("a50"), col("b50"), 0.5), 4).as("p50"),
      round(interp(col("a90"), col("b90"), 0.9), 4).as("p90"))
      .orderBy("l_returnflag")
  }

  val q23Sql: String =
    """SELECT l_returnflag,
      |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Cube: all grouping-set combinations (superset of q13's rollup). */
  def q24Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"))
      .orderBy("returnflag", "linestatus")

  val q24Sql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus, COUNT(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q25
  /** Scalar-subquery pattern: rows above the global average — the scalar
    * aggregates once and broadcasts; the fact side streams (no second scan
    * shuffle, no driver action). */
  def q25AboveAvg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val stats = o.agg(davg(col("o_totalprice")).as("avg_price"))
    o.crossJoin(broadcast(stats))
      .where(col("o_totalprice") > col("avg_price") * 1.5)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val q25Sql: String =
    s"""SELECT o_orderkey, o_totalprice FROM orders
       |WHERE o_totalprice > (SELECT ${davgSql("o_totalprice")} FROM orders) * 1.5
       |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q26
  /** Distinct aggregation (count + sum DISTINCT — the expand+two-phase
    * aggregate path). */
  def q26DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        sum_distinct(col("l_quantity").cast(DecimalType(38, 2)))
          .cast(DoubleType).as("sum_distinct_qty"))
      .orderBy("l_returnflag")

  val q26Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_distinct_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q29
  /** Sliding windows in batch (1 h window, 15 min slide): Spark's window()
    * generator assigns each event to its 4 covering windows. Oracle builds
    * the window set with generate_series and a range join. Mirrors the
    * streaming slidingValue transform. */
  def q29SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))
      .orderBy("w_start", "event_type")

  val q29Sql: String =
    s"""WITH assigned AS (
       |  -- each event belongs to exactly 4 epoch-aligned 15-min-slide,
       |  -- 1-hour windows (same alignment Spark's window() uses)
       |  SELECT make_timestamp(
       |           (epoch_us(e.ts) // 900000000) * 900000000
       |             - CAST(u.k AS BIGINT) * 900000000)
       |         AS w_start,
       |         e.event_type, e.value
       |  FROM events e, UNNEST([0, 1, 2, 3]) AS u(k))
       |SELECT w_start, event_type, COUNT(*) AS n,
       |  ${dsumSql("value")} AS total_value
       |FROM assigned GROUP BY w_start, event_type
       |ORDER BY w_start, event_type""".stripMargin

  // ---------------------------------------------------------------- q30
  /** first_value / last_value / lead over event-time partitions. */
  def q30FirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("first_type", first(col("event_type")).over(wFull))
      .withColumn("last_type", last(col("event_type")).over(wFull))
      .withColumn("next_event", lead(col("event_id"), 1).over(w))
      .where(col("event_id") % 100 === 0)
      .select("event_id", "user_id", "first_type", "last_type", "next_event")
      .orderBy("event_id")
  }

  val q30Sql: String =
    """SELECT event_id, user_id, first_type, last_type, next_event FROM (
      |  SELECT event_id, user_id,
      |    FIRST_VALUE(event_type) OVER wf AS first_type,
      |    LAST_VALUE(event_type) OVER wf AS last_type,
      |    LEAD(event_id, 1) OVER w AS next_event
      |  FROM events
      |  WINDOW
      |    w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
      |    wf AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
      |WHERE event_id % 100 = 0
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q31
  /** Salted skew join: the fact side joins a dimension on `event_type` — a
    * handful of distinct values, so a plain shuffle join funnels each key
    * through ONE reducer (the canonical skew pathology when the dim is too
    * big to broadcast). The salt pattern: tag each fact row with a
    * DETERMINISTIC salt (hash of its unique id, mod S), replicate the dim
    * S× with an explode, join on (key, salt) — every key now spreads over
    * S reducers. The merge hint forces the shuffle join so the pattern
    * (not a broadcast) is what executes; results are identical to the
    * unsalted join (oracle-checked). */
  def q31SaltedSkewJoin(s: SparkSession, d: String): DataFrame = {
    val S = 32
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"))
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(S)).cast(IntegerType))
    val dim = Tables.events(s, d).select(col("event_type")).distinct()
      .withColumn("type_weight", length(col("event_type")))
    val saltedDim = dim.select(col("event_type"), col("type_weight"),
      explode(sequence(lit(0), lit(S - 1))).as("salt"))
    ev.hint("merge").join(saltedDim, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("type_weight")).cast(LongType).as("total_weight"))
      .orderBy("event_type")
  }

  val q31Sql: String =
    """WITH dim AS (
      |  SELECT DISTINCT event_type, length(event_type) AS type_weight
      |  FROM events)
      |SELECT e.event_type, COUNT(*) AS n,
      |  CAST(SUM(type_weight) AS BIGINT) AS total_weight
      |FROM events e JOIN dim USING (event_type)
      |GROUP BY e.event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- q32
  /** Sketched distinct counting: HyperLogLog++ (approx_count_distinct) vs
    * the exact count. The sketch is mergeable — constant memory per
    * partition, one tiny shuffle — which is what a 100 TB cardinality
    * profile runs instead of an exact COUNT(DISTINCT). Spark's HLL++ is
    * deterministic for a given dataset but not SQL-portable, so the
    * driver-checked contract is the exact count plus an error-bound gate
    * (relative error under 5%, well above HLL++'s ~2% at default rsd). */
  def q32ApproxDistinct(s: SparkSession, d: String): DataFrame =
    // r17 A/B (VERDICT r16 #7), measured and REVERTED: a narrow 2-column
    // fan-out regressed q32 at sf0.1 (1.8 → 2.4 s) — the partial distinct
    // reduces 600k rows to ~60k, so the fan-out exchange moves 10× the
    // bytes the single-task partial agg would have saved. At 100 TB the
    // scan is naturally parallel; nothing scale-relevant to fix.
    Tables.lineitem(s, d)
      // dedup FIRST (partial + final distinct), then count and sketch the
      // deduped frame: avoids the expand-by-2 of every input row that a
      // combined countDistinct+HLL aggregate plans, and HLL register
      // insertion is idempotent so the sketch value is identical (2.3x at
      // sf0.1). The sketch alone — the actual 100 TB operator — would skip
      // the distinct entirely; the exact side exists as its gate.
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("exact_parts"),
        // rsd 1%: the 5% gate sits ~5 sigma out, so the boolean cannot
        // flap with data scale (the default 5% rsd would make it ~1 sigma)
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast(DoubleType) /
          col("exact_parts") < 0.05).as("within_5pct"))
      .orderBy("l_returnflag")

  val q32Sql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  true AS within_5pct
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Pivot: per-returnflag row, one column per linestatus value with the
    * summed quantity — the wide-format reporting op. Pivot values are
    * declared explicitly so the plan is a single pass (no values-discovery
    * job) and the output schema is stable for the oracle. */
  def q33Pivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")).cast(LongType))
      .select(col("l_returnflag"),
        coalesce(col("F"), lit(0L)).as("qty_f"),
        coalesce(col("O"), lit(0L)).as("qty_o"))
      .orderBy("l_returnflag")

  val q33Sql: String =
    """SELECT l_returnflag,
      |  CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0) AS BIGINT) AS qty_f,
      |  CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0) AS BIGINT) AS qty_o
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q34
  /** Adversarially skewed salted join: the synthesized key puts ~99% of
    * lineitem on ONE value ("hot"), the degenerate distribution where an
    * unsalted shuffle join funnels the whole corpus through a single
    * reducer. The q31 salt pattern (deterministic per-row salt, dim
    * replicated S×, join on (key, salt)) spreads every key over S
    * reducers regardless of its frequency — RelationalSkewSpec measures
    * the post-shuffle partition sizes and asserts max ≤ 2× mean, and that
    * the UNSALTED form really does violate it. Results are identical to
    * the unsalted join (oracle-checked). */
  private val SkewSalts = 32

  /** The salted join itself, pre-aggregation — exposed so the spec can
    * measure the actual reducer partition sizes. */
  def q34SkewJoined(s: SparkSession, d: String): DataFrame = {
    val ev = q34SkewedFacts(s, d)
      .withColumn("salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(SkewSalts)).cast(IntegerType))
    val dim = q34SkewedFacts(s, d).select(col("k")).distinct()
      .withColumn("k_weight", length(col("k")))
    val saltedDim = dim.select(col("k"), col("k_weight"),
      explode(sequence(lit(0), lit(SkewSalts - 1))).as("salt"))
    ev.hint("merge").join(saltedDim, Seq("k", "salt"))
  }

  /** The same join WITHOUT salting (spec-only, demonstrates the pathology
    * the salt removes). */
  def q34SkewJoinedUnsalted(s: SparkSession, d: String): DataFrame = {
    val dim = q34SkewedFacts(s, d).select(col("k")).distinct()
      .withColumn("k_weight", length(col("k")))
    q34SkewedFacts(s, d).hint("merge").join(dim, Seq("k"))
  }

  private def q34SkewedFacts(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      when(col("l_orderkey") % 100 < 99, lit("hot"))
        .otherwise(concat(lit("cold_"), col("l_orderkey") % 7)).as("k"))

  def q34AdversarialSkewJoin(s: SparkSession, d: String): DataFrame =
    q34SkewJoined(s, d)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_weight")).cast(LongType).as("total_weight"),
        // quantities are integral doubles, so the sum is order-exact
        sum(col("l_quantity")).cast(LongType).as("total_qty"))
      .orderBy("k")

  val q34Sql: String =
    """WITH ev AS (
      |  SELECT CASE WHEN l_orderkey % 100 < 99 THEN 'hot'
      |              ELSE 'cold_' || CAST(l_orderkey % 7 AS VARCHAR) END AS k,
      |         l_quantity
      |  FROM lineitem),
      |dim AS (SELECT DISTINCT k, length(k) AS k_weight FROM ev)
      |SELECT k, COUNT(*) AS n,
      |  CAST(SUM(k_weight) AS BIGINT) AS total_weight,
      |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
      |FROM ev JOIN dim USING (k)
      |GROUP BY k ORDER BY k""".stripMargin

  // ---------------------------------------------------------------- q35
  /** Streaming driver gate (SURVEY §2.10's first CORRECTNESS row): the
    * events parquet replayed through a file-source MICRO-BATCH stream into
    * [[graft.streaming.EventStreams.hourlyByType]] (watermark + tumbling
    * window state), memory-sinked in complete mode, then compared
    * window-by-window against the batch formulation (q15). Counts must
    * match exactly; the value sums within 1e-9 relative (the streaming agg
    * sums doubles in arrival order, the batch oracle decimal-exactly). */
  def q35StreamBatchGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone: the legacy-nanos flag and the memory-sink
    // temp view live on s2, never the caller's session (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    // the file source monitors a DIRECTORY; stage the events file into a
    // scratch dir through the Hadoop FS, re-staging whenever the source's
    // recorded (length, mtime) pair moved — a regenerated dataset must
    // never replay a stale staged copy
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q35_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val staged = s"$stageDir/events.parquet"
    HadoopIO.stageFile(path, staged, conf)
    val raw = s2.readStream.schema(rawSchema).parquet(stageDir)
    // watermarks require TIMESTAMP (tz-aware); the session runs UTC so the
    // cast is value-preserving and the output hour casts back to NTZ below
    val events =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else raw.withColumn("ts", col("ts").cast(TimestampType))
    val tbl = "q35_streamed"
    val q = graft.streaming.EventStreams.hourlyByType(events)
      .writeStream.format("memory").queryName(tbl).outputMode("complete")
      .start()
    try { q.processAllAvailable() } finally q.stop()
    val streamed = s2.table(tbl).select(
      col("hour").cast(TimestampNTZType).as("hour"), col("event_type"),
      col("n").as("sn"), col("total_value").as("sv"))
    val batch = q15HourlyEvents(s2, d).select(col("hour"), col("event_type"),
      col("n").as("bn"), col("total_value").as("bv"))
    streamed.join(batch, Seq("hour", "event_type"), "full_outer")
      .agg(
        count(lit(1)).as("n_windows"),
        (count(lit(1)) === sum(when(
          col("sn").isNotNull && col("bn").isNotNull &&
            (col("sn") === col("bn")) &&
            (abs(col("sv") - col("bv")) <=
              greatest(abs(col("bv")) * 1e-9, lit(1e-9))),
          1).otherwise(0))).as("all_match"))
  }

  val q35Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_windows, true AS all_match
      |FROM (SELECT DATE_TRUNC('hour', ts) AS h, event_type
      |      FROM events GROUP BY 1, 2) t""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Streaming INCREMENTAL DEDUP gate — the continuously-ingesting
    * pipeline's shape: new documents arrive as a micro-batch stream, any
    * doc whose content hash already exists in the HISTORICAL corpus (a
    * static frame, here the even-doc_id half) is dropped by a
    * stream-static left-anti join, and within-stream duplicates collapse
    * via streaming dropDuplicates on the hash. Only order-independent
    * quantities are emitted (distinct-new-hash count + a zero-leak
    * cross-check), so the gate is deterministic and oracle-restatable
    * even though streaming dedup keeps an arbitrary first arrival.
    *
    * Scale shape: the anti join is re-planned per micro-batch like any
    * batch join — no streaming state on the static side; at 100 TB the
    * historical hash set is a bucketed table (or a Bloom-filter
    * prefilter ahead of the join) rather than a broadcast, and the
    * dropDuplicates state holds one 16-byte hash per NEW document within
    * the retention horizon, not per event. */
  def q36StreamDedupGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone: the memory-sink temp view lives on s2 (q37
    // note), so concurrent gate runs cannot collide on the view name
    val s2 = s.newSession()
    val path = s"$d/documents.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q36_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val staged = s"$stageDir/documents.parquet"
    HadoopIO.stageFile(path, staged, conf)
    val stream = s2.readStream.schema(rawSchema).parquet(stageDir)
      .select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("h"))
    val hist = s2.read.parquet(path)
      .where(col("doc_id") % 2 === 0)
      .select(md5(encode(col("text"), "UTF-8")).as("h")).distinct()
    val tbl = "q36_streamed"
    val q = stream
      .join(hist, Seq("h"), "left_anti")
      .dropDuplicates("h")
      .writeStream.format("memory").queryName(tbl).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val kept = s2.table(tbl)
    val leaked = kept.join(hist, Seq("h"))
      .agg(count(lit(1)).as("n_leaked"))
    kept.agg(count_distinct(col("h")).as("n_new_hashes"),
        count(lit(1)).as("n_kept_rows"))
      .crossJoin(leaked)
      .select(col("n_new_hashes"), col("n_kept_rows"), col("n_leaked"),
        (col("n_leaked") === 0 &&
          col("n_kept_rows") === col("n_new_hashes")).as("clean"))
  }

  val q36Sql: String =
    """SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_new_hashes,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_kept_rows,
      |  CAST(0 AS BIGINT) AS n_leaked, true AS clean
      |FROM documents
      |WHERE md5(text) NOT IN (
      |  SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)""".stripMargin

  // ---------------------------------------------------------------- q37
  /** Streaming SESSION-WINDOW gate — dynamic-gap sessionization
    * ([[graft.streaming.EventStreams.userSessions]]: `session_window` with
    * a 30-minute gap, the state store MERGING adjacent sessions as late
    * members arrive) replayed from the staged events file and compared
    * session-by-session against the IDENTICAL batch formulation. Counts
    * and boundaries must match exactly; the value sums within 1e-9
    * relative (streaming sums doubles in arrival order). The emitted
    * n_sessions/n_users come from the STREAMED side, so the DuckDB oracle
    * — a gaps-and-islands restatement with q21's `gap > 30 min` split
    * rule, the same boundary semantics `session_window` implements
    * (events exactly one gap apart merge; StreamingSpec pins this) —
    * genuinely pins the streaming computation, not just the comparison.
    *
    * Scale shape: session state is per (user, open session), not per
    * event — the watermark expires closed sessions, so state size tracks
    * ACTIVE users; the batch side is one shuffle on user_id. */
  def q37StreamSessionGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone: the 8-partition state-store sizing and the
    // legacy-nanos flag must not leak into concurrently planned batch
    // queries in the caller's session — newSession() shares the
    // SparkContext and cached data but carries its own SQLConf, so this
    // gate mutates NOTHING the caller can observe (and each call gets its
    // own temp-view namespace, so concurrent gates cannot collide)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // state store open/commit cost per micro-batch scales with shuffle
    // partitions (q38 note) — size them to the stream volume
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q37_" + d.replaceAll("[^A-Za-z0-9]", "_")
    val staged = s"$stageDir/events.parquet"
    HadoopIO.stageFile(path, staged, conf)
    val raw = s2.readStream.schema(rawSchema).parquet(stageDir)
    val events =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else raw.withColumn("ts", col("ts").cast(TimestampType))
    val tbl = "q37_streamed"
    // complete mode: every session (open or closed) is in the final table,
    // so the one-shot replay needs no watermark advance past the tail
    val q = graft.streaming.EventStreams.userSessions(events)
      .writeStream.format("memory").queryName(tbl).outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    // batch comparison leg re-plans at the caller's sizing (s2 is confined
    // to this call — no race)
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    val streamed = s2.table(tbl).select(
      col("s_start"), col("s_end"), col("user_id"),
      col("n_events").as("sn"), col("session_value").as("sv"))
    val batch = graft.streaming.EventStreams.userSessions(
        Tables.events(s2, d).withColumn("ts", col("ts").cast(TimestampType)))
      .select(col("s_start"), col("s_end"), col("user_id"),
        col("n_events").as("bn"), col("session_value").as("bv"))
    streamed.join(batch, Seq("s_start", "s_end", "user_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_sessions"),
        count_distinct(col("user_id")).as("n_users"),
        (count(lit(1)) === sum(when(
          col("sn").isNotNull && col("bn").isNotNull &&
            (col("sn") === col("bn")) &&
            (abs(col("sv") - col("bv")) <=
              greatest(abs(col("bv")) * 1e-9, lit(1e-9))),
          1).otherwise(0))).as("all_match"))
  }

  val q37Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |      THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
      |SELECT CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  true AS all_match
      |FROM g""".stripMargin

  // ---------------------------------------------------------------- q38
  /** Stream-STREAM join gate — the events file replayed through TWO
    * independent file-source streams into
    * [[graft.streaming.EventStreams.correlate]] (watermarked inner join
    * on user with an event-time range bound: each left event matches
    * right events in its trailing hour; state on both sides expires at
    * watermark − bound, so it tracks the time window, not the stream).
    * The matched pair set is deterministic, so unlike the other
    * streaming gates this one is restated EXACTLY by a plain DuckDB
    * self-join — order-independent integer aggregates (pair count,
    * distinct left events, an id checksum) pin the full result set. The
    * %8 user filter keeps the pair set gate-sized; it reaches both scans
    * as a pushed predicate. */
  def q38StreamJoinGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note): conf sizing stays invisible to
    // the caller's session
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // a stream-stream join keeps TWO state stores per shuffle partition;
    // store open/commit cost per micro-batch scales with the partition
    // count, not the data, so size partitions to the stream volume (the
    // generic 32 costs ~2x the whole gate here)
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q38_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events.parquet", conf)
    def side(): DataFrame = {
      val raw = s2.readStream.schema(rawSchema).parquet(stageDir)
      val ev =
        if (rawSchema("ts").dataType == LongType)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
            .cast(TimestampType))
        else raw.withColumn("ts", col("ts").cast(TimestampType))
      ev.where(col("user_id") % 8 === 0)
    }
    val tbl = "q38_streamed"
    val q = graft.streaming.EventStreams.correlate(side(), side())
      .writeStream.format("memory").queryName(tbl).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.table(tbl).agg(
      count(lit(1)).as("n_pairs"),
      count_distinct(col("l_id")).as("n_left"),
      sum(col("l_id") * 3 + col("r_id")).as("id_checksum"))
  }

  val q38Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(COUNT(DISTINCT l.event_id) AS BIGINT) AS n_left,
      |  CAST(SUM(l.event_id * 3 + r.event_id) AS BIGINT) AS id_checksum
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      |  AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
      |WHERE l.user_id % 8 = 0 AND r.user_id % 8 = 0""".stripMargin

  // ---------------------------------------------------------------- q39
  /** Custom-state gate — [[graft.streaming.EventStreams.runningUserTotals]]
    * (`flatMapGroupsWithState`, the one streaming feature the other gates
    * don't reach) driven at driver visibility. The events file is staged
    * TWICE and replayed one file per micro-batch, so each user's state
    * must accumulate ACROSS batches: the final stat per user is exactly
    * 2× the batch aggregate (counts exact; the double sum within 1e-9
    * relative — streaming adds in arrival order). The final row per user
    * is selected by max-struct on the monotone update stream, so the gate
    * also pins that every batch emitted an update. State is one small
    * struct per user (O(users)); the expiring variant that BOUNDS it is
    * spec-covered (EventStreamsSpec). */
  def q39StreamStateGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note): conf sizing stays invisible to
    // the caller's session
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // state store per shuffle partition (q38 note): size to the stream
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q39_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events_a.parquet", conf)
    HadoopIO.stageFile(path, s"$stageDir/events_b.parquet", conf)
    val raw = s2.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1") // one staged copy per micro-batch
      .parquet(stageDir)
    val events =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else raw.withColumn("ts", col("ts").cast(TimestampType))
    import s2.implicits._
    val typed = events.as[graft.streaming.Event]
    val tbl = "q39_streamed"
    val q = graft.streaming.EventStreams.runningUserTotals(typed).toDF()
      .writeStream.format("memory").queryName(tbl).outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    // per-user FINAL stat: n is strictly increasing (every batch holds
    // every user), so the max-n struct is the last update
    val finals = s2.table(tbl)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("total"))).as("m"))
      .select(col("user_id"), col("m.n").as("sn"), col("m.total").as("sv"))
    val batch = Tables.events(s2, d)
      .groupBy(col("user_id"))
      .agg((count(lit(1)) * 2).as("bn"),
        (sum(col("value")) * 2).as("bv"))
    finals.join(batch, Seq("user_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("sn")).as("sum_n"),
        (count(lit(1)) === sum(when(
          col("sn").isNotNull && col("bn").isNotNull &&
            (col("sn") === col("bn")) &&
            (abs(col("sv") - col("bv")) <=
              greatest(abs(col("bv")) * 1e-9, lit(1e-9))),
          1).otherwise(0))).as("all_match"))
  }

  val q39Sql: String =
    """SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(2 * COUNT(*) AS BIGINT) AS sum_n,
      |  true AS all_match
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q40
  /** Stream-stream LEFT OUTER join gate — the join variant whose output
    * semantics differ in kind from q38's inner form: null-augmented rows
    * may only emit when the watermark PROVES no future match can arrive,
    * so un-matched results are a function of watermark progression, not
    * just of the data. The replay is engineered to make that progression
    * deterministic:
    *
    *  - left stream = events with user_id % 8 = 0; right stream = the
    *    SUBSET user_id % 16 = 0. Every left event self-matches when its
    *    user is ≡ 0 (mod 16); users ≡ 8 (mod 16) have NO right events at
    *    all, so their rows can only surface as watermark-evicted nulls —
    *    the exact semantics under test (a symmetric self-join would
    *    self-match every row and never exercise null emission).
    *  - the corpus replays as batch 1; a single SENTINEL event (far-future
    *    ts = max + 3h, user 0 — present in both streams, self-matching)
    *    replays as batch 2, advancing both watermarks to max + 1h, past
    *    every real left timestamp — so every unmatched left row provably
    *    evicts and emits before the query stops. File order is pinned by
    *    explicit modification times (the file source batches oldest
    *    first); the sentinel is rewritten (and its mtime bumped) every
    *    run so a regenerated corpus can never replay a stale sentinel.
    *
    * The DuckDB oracle restates the full result (pairs + nulls +
    * sentinel) as a plain left join over events ∪ the sentinel row. */
  def q40StreamOuterJoinGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q40_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events_a.parquet", conf)
    def tsFix(df: DataFrame): DataFrame =
      if (rawSchema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else df.withColumn("ts", col("ts").cast(TimestampType))
    // sentinel: one event 3h past the corpus max, user 0, id 10^12 —
    // written fresh every run (same raw schema as the staged file)
    val sentinelTs = tsFix(s2.read.parquet(path))
      .agg(max(col("ts"))).head.getTimestamp(0).getTime + 3L * 3600 * 1000
    val sentinelBuild = s"$stageDir.sentinel_build"
    val raw = tsFix(s2.read.parquet(path))
    // one row in the RAW on-disk schema (nanos corpora store ts as long
    // nanos; any extra columns — props etc. — ride as typed nulls) so one
    // readStream schema covers both files
    val tsRaw: Column =
      if (rawSchema("ts").dataType == LongType)
        lit(sentinelTs * 1000000L) // ms → ns
      else lit(new java.sql.Timestamp(sentinelTs))
    raw.limit(1).select(rawSchema.fields.map { f =>
        (f.name match {
          case "event_id" => lit(1000000000000L).cast(f.dataType)
          case "ts"       => tsRaw.cast(f.dataType)
          case "user_id"  => lit(0L).cast(f.dataType)
          case "event_type" => lit("sentinel").cast(f.dataType)
          case "value"    => lit(1.0).cast(f.dataType)
          case _          => lit(null).cast(f.dataType)
        }).as(f.name)
      }.toIndexedSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(sentinelBuild)
    val part = HadoopIO.listScanTargets(sentinelBuild, conf).map(_._1)
      .filter(p => p.matches(".*/part-[^/]*\\.parquet"))
    require(part.length == 1, s"expected one sentinel part file, got: $part")
    HadoopIO.copy(part.head, s"$stageDir/sentinel.parquet", conf)
    // pin replay order: corpus first, sentinel second (file source
    // batches oldest-mtime first)
    val fs = new org.apache.hadoop.fs.Path(stageDir).getFileSystem(conf)
    val aStat = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$stageDir/events_a.parquet"))
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$stageDir/sentinel.parquet"),
      aStat.getModificationTime + 10000, -1)

    def side(mod: Int): DataFrame = tsFix(
      s2.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stageDir))
      .where(col("user_id") % mod === 0)
    val tbl = "q40_streamed"
    val q = graft.streaming.EventStreams.correlateOuter(side(8), side(16))
      .writeStream.format("memory").queryName(tbl).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.table(tbl).agg(
      count(lit(1)).as("n_rows"),
      sum(col("r_id").isNull.cast("long")).as("n_unmatched"),
      sum(when(col("r_id").isNotNull, col("l_id") * 3 + col("r_id"))
        .otherwise(col("l_id"))).as("id_checksum"))
  }

  val q40Sql: String =
    """WITH ev AS (
      |  SELECT event_id, ts, user_id FROM events WHERE user_id % 8 = 0
      |  UNION ALL
      |  SELECT 1000000000000, (SELECT MAX(ts) FROM events) + INTERVAL 3 HOUR, 0),
      |r AS (SELECT * FROM ev WHERE user_id % 16 = 0),
      |j AS (
      |  SELECT l.event_id AS l_id, r.event_id AS r_id
      |  FROM ev l LEFT JOIN r
      |    ON l.user_id = r.user_id
      |    AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN r_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unmatched,
      |  CAST(SUM(CASE WHEN r_id IS NOT NULL THEN l_id * 3 + r_id
      |    ELSE l_id END) AS BIGINT) AS id_checksum
      |FROM j""".stripMargin

  // ---------------------------------------------------------------- q41
  /** Watermark-BOUNDED streaming dedup gate — `dropDuplicatesWithinWatermark`
    * (Spark 3.5+), the API that fixes q36's operational flaw at 100 TB:
    * plain streaming `dropDuplicates` state grows forever (one entry per
    * key EVER seen), while the within-watermark variant EVICTS a key's
    * state once the watermark passes its event time + delay — state is
    * bounded by the dedup horizon (keys per hour here), not stream
    * lifetime. The trade is explicit: a duplicate arriving after its
    * original's state evicted is re-emitted, which is the correct contract
    * for at-least-once upstreams whose retries cluster in time (the actual
    * production source of streaming duplicates).
    *
    * The replay makes the contract exact: the events file is staged TWICE
    * and replayed one file per micro-batch. Batch 1 (watermark −∞) emits
    * every first arrival and records state; the watermark then advances to
    * max(ts) − 1h. Batch 2 is copy 2: every row is either late (ts <
    * watermark ⇒ dropped) or within the horizon — in which case its
    * original's state provably still lives (ts ≥ wm ⇒ ts + 1h ≥ wm), so it
    * dedups. Output ≡ the distinct event set, exactly — pinned by the
    * oracle's count + id checksum, with the emitted-once invariant as the
    * gate boolean. */
  def q41StreamWmDedupGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q41_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events_a.parquet", conf)
    HadoopIO.stageFile(path, s"$stageDir/events_b.parquet", conf)
    val raw = s2.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1") // one staged copy per micro-batch
      .parquet(stageDir)
    val events =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else raw.withColumn("ts", col("ts").cast(TimestampType))
    val tbl = "q41_streamed"
    val q = events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName(tbl).outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s2.conf.set("spark.sql.shuffle.partitions",
      s.conf.get("spark.sql.shuffle.partitions"))
    s2.table(tbl).agg(
        count(lit(1)).as("n_out"),
        count_distinct(col("event_id")).as("n_ids"),
        sum(col("event_id")).as("id_checksum"))
      .select(col("n_out"), col("n_ids"), col("id_checksum"),
        (col("n_out") === col("n_ids")).as("emitted_once"))
  }

  val q41Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_out,
      |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
      |  CAST(SUM(event_id) AS BIGINT) AS id_checksum,
      |  true AS emitted_once
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Observation-API metrics gate — data-quality counters collected ON
    * the action's own pass (`Dataset.observe`, stable since Spark 3.3):
    * production pipelines attach row counts and quality tallies to every
    * write this way instead of paying a second scan (the aggregates ride
    * the tasks as an AggregatingAccumulator — no shuffle, no extra job).
    * The gate runs a noop-sink action over lineitem with three observed
    * aggregates and returns the OBSERVED values as the row; the oracle
    * recomputes them as plain SQL, so a metric that under- or
    * over-counts (lost partition, double-counted retry, accumulator
    * drift) flips a driver CORRECTNESS row. All three metrics are
    * integer-exact, so the hash compare is tolerance-free. */
  def q42ObserveMetrics(s: SparkSession, d: String): DataFrame = {
    // isolated session clone: a registered Observation lives on in the
    // session's ObservationManager, and that manager is non-serializable
    // once populated — any LATER job on the same session that serializes
    // a session reference inside a task closure (e.g. an MLlib model
    // carrying its training summary) would die with "Task not
    // serializable". The clone keeps the registration out of the shared
    // session entirely.
    val s2 = s.newSession()
    val obs = org.apache.spark.sql.Observation() // unique auto-name per run
    Tables.lineitem(s2, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L))
          .as("n_discounted"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("sum_qty").asInstanceOf[Long],
      m("n_discounted").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "n_discounted")
  }

  val q42Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_discounted
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Dynamic partition pruning gate — the runtime half of the pruning
    * story (static partition pruning is s07's): a fact table PARTITIONED
    * on disk by a join key, joined against a small filtered dim, must
    * skip the partitions whose keys the dim filter eliminated — at
    * runtime, via the broadcast exchange's values injected as a
    * partition filter (`PartitionFilters: [dynamicpruning#...]`). At
    * 100 TB this is the difference between scanning 3/10 of the fact
    * and scanning all of it and filtering after the join.
    *
    * The gate stages a partitioned copy of lineitem (part_key =
    * l_suppkey % 10, ten directories), joins it with a 3-key dim, emits
    * the integer-exact join aggregate PLUS `dpp_planned` — read off the
    * executed plan, so the row fails if a conf or plan regression
    * silently turns the runtime pruning off. The oracle restates the
    * aggregate as a plain filter (the dim is rule-derived). */
  def q43DppGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val sfTag = d.replaceAll("[^A-Za-z0-9]", "_")
    val dir = s"${HadoopIO.scratchDir(s)}/graft_q43_$sfTag"
    Tables.lineitem(s, d)
      .withColumn("part_key", col("l_suppkey") % 10)
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    val dim = s.range(10).select(col("id").as("part_key"))
      .where(col("part_key").isin(2, 5, 7))
    val joined = s.read.parquet(dir)
      .join(broadcast(dim), Seq("part_key"))
    val plan = joined.queryExecution.executedPlan.toString
    joined.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("part_key")).as("sum_part"))
      .select(col("n_rows"), col("sum_qty"), col("sum_part"),
        lit(plan.toLowerCase.contains("dynamicpruning")).as("dpp_planned"))
  }

  val q43Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(l_suppkey % 10) AS BIGINT) AS sum_part,
      |  true AS dpp_planned
      |FROM lineitem WHERE l_suppkey % 10 IN (2, 5, 7)""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Bucketed co-located join gate — the shuffle-elimination lever the
    * 100 TB playbook leads with: both join sides written `bucketBy` the
    * join key (8 buckets, sorted), so the sort-merge join consumes the
    * on-disk bucketing as its distribution AND ordering — NO exchange on
    * either side, no sort, at any data size; the one-time bucketed write
    * amortizes over every subsequent join on that key (the fact-table
    * contract: bucket once, join forever). A `merge` hint pins SMJ so
    * the zero-Exchange claim is about bucketing, not about the dim being
    * broadcastable at test scale.
    *
    * Emits the integer-exact join aggregate PLUS `no_shuffle_planned`
    * read off the executed plan (SortMergeJoin present, zero Exchange
    * operators in the join subtree) — a bucketing-info regression
    * (catalog, reader, bucket-count mismatch) flips the driver row. */
  def q44BucketedJoinGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val sfTag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q44_$sfTag"
    val liTbl = s"graft_q44_li_$sfTag"
    val ordTbl = s"graft_q44_ord_$sfTag"
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$root/li").saveAsTable(liTbl)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$root/ord").saveAsTable(ordTbl)
    val joined = s.table(liTbl).hint("merge")
      .join(s.table(ordTbl), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    val noShuffle = plan.contains("SortMergeJoin") &&
      !plan.contains("Exchange")
    joined.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("o_custkey")).as("sum_cust"))
      .select(col("n_rows"), col("sum_qty"), col("sum_cust"),
        lit(noShuffle).as("no_shuffle_planned"))
  }

  val q44Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  true AS no_shuffle_planned
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q45
  /** AQE skew-join gate — the RUNTIME answer to skew that q31/q34 solve
    * statically with salting: adaptive execution measures the actual
    * shuffle partition sizes and SPLITS the oversized ones (each split
    * joins against a replicated copy of the other side), no key
    * engineering required. The complementary pair matters at 100 TB:
    * salting is the tool when skew is known and keys are in your schema;
    * AQE handles the skew you didn't predict.
    *
    * A quarter of lineitem funnels onto key 0; the per-key-count self
    * join (merge-hinted, broadcast disabled in the session CLONE so the
    * exchange actually exists) executes under lowered skew thresholds,
    * and the gate reads the FINAL adaptive plan — the `skew=true` marker
    * only appears after execution measured real sizes. The join
    * aggregate (Σc and Σc², integer-exact) is the oracle's plain
    * restatement; `skew_handled` pins that the runtime split actually
    * planned. */
  def q45AqeSkewGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note): threshold confs never leak
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    // both SMJ children must be BARE shuffle stages for the runtime split
    // to apply (an aggregate between shuffle and join blocks the skew
    // reader), so the skewed fact joins a plain second table
    // `p` is incompressible ballast: skew detection reads COMPRESSED map
    // output sizes, and 30k copies of the literal key would lz4 away to
    // nothing — real skewed rows carry real payloads, so the fixture's do
    // too (the agg row below re-plans without p; only the marker run
    // carries it)
    val fact = Tables.lineitem(s2, d).select(
      when(col("l_orderkey") % 2 === 0, 1L)
        .otherwise(col("l_orderkey")).as("k"),
      md5(concat_ws("-", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"))).as("p"))
    val dim = Tables.orders(s2, d)
      .select(col("o_orderkey").as("k"), (col("o_custkey") % 7).as("w"))
    // a skewed reducer partition splits at MAPPER granularity: the
    // single-row-group test file yields ONE data-bearing map task, which
    // is unsplittable — spread the fact over 8 mappers first (at 100 TB
    // the scan has thousands of mappers and this exchange doesn't exist)
    val joined = fact.repartition(8).hint("merge").join(dim, Seq("k"))
    // execute THIS dataset's own query execution so the adaptive plan
    // finalizes (runtime stats measured), then read the skew marker off it
    joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    // the precise AQE marker: "SortMergeJoin(skew=true)" appears only in
    // the FINAL adaptive plan once the runtime split actually happened
    val skewHandled = plan.contains("skew=true") || plan.contains("skewed")
    if (sys.env.contains("GRAFT_DEBUG_PLAN"))
      System.err.println("[q45-plan]\n" + plan)
    joined.agg(count(lit(1)).as("n_rows"), sum(col("k")).as("sum_k"),
        sum(col("w")).as("sum_w"))
      .select(col("n_rows"), col("sum_k"), col("sum_w"),
        lit(skewHandled).as("skew_handled"))
  }

  val q45Sql: String =
    """WITH f AS (
      |  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1
      |    ELSE l_orderkey END AS k
      |  FROM lineitem)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(o_custkey % 7) AS BIGINT) AS sum_w,
      |  true AS skew_handled
      |FROM f JOIN orders ON f.k = orders.o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Exactly-once streaming SINK gate — `foreachBatch` + idempotent
    * batch-keyed writes, the pattern that gets end-to-end exactly-once
    * onto stores without transactional sinks: each micro-batch
    * OVERWRITES its own `batch=<id>` directory, so a post-crash replay
    * of the last epoch (Structured Streaming's at-least-once re-delivery
    * into foreachBatch) rewrites identical bytes instead of appending
    * duplicates. The gate replays events as two micro-batches through
    * the sink, then SIMULATES the retry by re-invoking the same sink
    * function on batch 0's input, and scans the artifact: counts and
    * checksum must equal exactly 2× the events table — the retry
    * provably changed nothing. */
  def q46StreamExactlyOnceGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    // isolated session clone (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q46_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events_a.parquet", conf)
    HadoopIO.stageFile(path, s"$stageDir/events_b.parquet", conf)
    val outDir = s"$stageDir.out"
    HadoopIO.delete(outDir, conf) // fresh artifact every run
    // the idempotent sink: batch id IS the overwrite key (no `batch`
    // column in the files — the directory name carries it)
    def sink(df: DataFrame, batchId: Long): Unit =
      df.select(col("event_id"), col("user_id"))
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    val stream = s2.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1") // one staged copy per micro-batch
      .parquet(stageDir)
    val q = stream.writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row], id: Long) => sink(df.toDF(), id))
      .start()
    try q.processAllAvailable() finally q.stop()
    // simulate the post-crash retry: batch 0 re-delivered with the same
    // input — the overwrite must leave the artifact IDENTICAL
    sink(s2.read.parquet(s"$stageDir/events_a.parquet"), 0L)
    s2.read.parquet(outDir).agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("event_id")).as("n_ids"),
        sum(col("event_id") + col("user_id")).as("checksum"))
      .select(col("n_rows"), col("n_ids"), col("checksum"),
        (col("n_rows") === col("n_ids") * 2).as("exactly_once"))
  }

  val q46Sql: String =
    """SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
      |  CAST(2 * SUM(event_id + user_id) AS BIGINT) AS checksum,
      |  true AS exactly_once
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Runtime Bloom-filter join pruning gate — the third runtime scan-
    * reduction lever alongside DPP (q43) and AQE skew handling (q45):
    * when a shuffle join's small side carries a selective filter, the
    * optimizer plants a bloom_filter_agg subquery on that side and
    * rewrites the big side's scan to `might_contain(filter, xxhash64(k))`
    * — rows that cannot join die AT THE SCAN, before the exchange. At
    * 100 TB this converts a full fact-table shuffle into a shuffle of
    * only the ~join-surviving rows; unlike DPP it needs no partition
    * layout, so it is the lever for joins on non-partition keys.
    *
    * Broadcast is disabled in the session CLONE (a broadcast join needs
    * no semi-join reduction — the gate is about the shuffle-join path)
    * and the application-side size threshold is lowered so the test-
    * scale scan qualifies. `bloom_planned` is read off the executed
    * plan — a conf or rule regression that drops the runtime filter
    * flips the driver row. The oracle restates the join aggregate. */
  def q47RuntimeBloomGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note): threshold confs never leak
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    val dim = Tables.orders(s2, d)
      .where(col("o_custkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val fact = Tables.lineitem(s2, d)
      .select(col("l_orderkey"), col("l_quantity"))
    val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    val bloomPlanned =
      plan.contains("might_contain") || plan.contains("bloomfilter")
    if (sys.env.contains("GRAFT_DEBUG_PLAN"))
      System.err.println("[q47-plan]\n" + plan)
    joined.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("o_custkey")).as("sum_cust"))
      .select(col("n_rows"), col("sum_qty"), col("sum_cust"),
        lit(bloomPlanned).as("bloom_planned"))
  }

  val q47Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  true AS bloom_planned
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey % 97 = 0""".stripMargin

  // ---------------------------------------------------------------- q48
  /** GROUPING SETS — the general form q13's rollup and q24's cube are
    * sugar for: an explicitly non-hierarchical set list ((flag, status),
    * (flag), (status), ()) that neither rollup nor cube can express as
    * given (cube would add nothing here, but the POINT is arbitrary set
    * lists — e.g. reporting along two independent dimensions without
    * paying for their cross product). Physical shape is one Expand (4×
    * row multiplication BEFORE the exchange) + one hash aggregate — the
    * multiplied rows partial-aggregate map-side, so the shuffle carries
    * ≤ 4× the group-table size, not 4× the data. NULL keys coalesced to
    * a sentinel (q13's discipline) so ordering/hashing is engine-neutral. */
  def q48GroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"), col("l_linenumber")) // r16 fan-out; r17 PK keys
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val q48Sql: String =
    s"""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       |  COALESCE(l_linestatus, '(all)') AS linestatus,
       |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |  (l_returnflag), (l_linestatus), ())
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q49
  /** RANGE-interval window frame — event-time sliding aggregates per key
    * (how many events, and which, hit this user in the hour ENDING at
    * each event): a physical-offset frame over the µs event-time axis,
    * the frame type q29's ROWS frame cannot express (ROWS counts
    * neighbors; RANGE bounds them by value distance, so gaps and ties
    * behave correctly — all peers at the same timestamp share one
    * frame). One shuffle on user_id, then a single sort per partition;
    * the running frame is O(1) amortized per row (slide, don't rescan).
    * 1 h = 3 600 000 000 µs exactly, so the long-offset frame is
    * bit-identical to the oracle's INTERVAL arithmetic. */
  def q49RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("cnt_1h"),
        sum(col("event_id")).over(w).as("sum_ids_1h"))
      .orderBy("event_id")
  }

  val q49Sql: String =
    """SELECT event_id, user_id,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS cnt_1h,
      |  CAST(SUM(event_id) OVER w AS BIGINT) AS sum_ids_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Correlated scalar subquery — the decorrelation path (q25 gates the
    * UNcorrelated scalar subquery): each order compared against ITS
    * customer's average, written as a correlated subquery and left to
    * Catalyst's RewriteCorrelatedScalarSubquery to decorrelate into an
    * aggregate + join. The gate asserts the rewrite happened (no
    * per-row subquery execution survives in the physical plan — at
    * 100 TB a non-decorrelated scalar subquery is a nested loop over
    * the fact table). Exact-decimal average (Det discipline) so the
    * threshold compare is engine-stable. */
  def q50CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    val tbl = "graft_q50_orders_" + viewTag(d)
    Tables.orders(s, d).createOrReplaceTempView(tbl)
    val df = s.sql(
      s"""SELECT o_orderkey, o_totalprice FROM $tbl o
         |WHERE o_totalprice > 1.5 * (
         |  SELECT ${davgSql("o2.o_totalprice")} FROM $tbl o2
         |  WHERE o2.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    // decorrelated form = aggregate + equi-join; a surviving per-row
    // subquery node would mean a nested loop over the fact table
    require(plan.contains("join") && !plan.contains("scalar-subquery"),
      "correlated scalar subquery did not decorrelate")
    df
  }

  val q50Sql: String =
    s"""SELECT o_orderkey, o_totalprice FROM orders o
       |WHERE o_totalprice > 1.5 * (
       |  SELECT ${davgSql("o2.o_totalprice")} FROM orders o2
       |  WHERE o2.o_custkey = o.o_custkey)
       |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Exchange-reuse gate — the fourth runtime lever in the q43/q45/q47
    * series: when one subplan feeds a query twice (self-join on an
    * aggregate, a CTE consumed by two branches), the physical planner
    * must compute its shuffle ONCE and wire the second consumer to the
    * same exchange (`ReusedExchange` / a reused AQE shuffle stage) — at
    * 100 TB re-executing a fact-table aggregate because a plan node
    * appears twice doubles the dominant cost. The gate self-joins one
    * aggregate subplan (broadcast disabled in the session clone so the
    * exchange exists), executes, and reads the reuse marker off the
    * final adaptive plan; the join aggregate is the oracle's plain
    * restatement (l_orderkey is the agg key, so the self-join is a
    * bijection and both sums equal the group-table sum). */
  def q51ReusedExchangeGate(s: SparkSession, d: String): DataFrame = {
    // isolated session clone (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val agg = Tables.lineitem(s2, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q1"))
    val joined = agg.join(agg.select(col("l_orderkey"),
      col("q1").as("q2")), Seq("l_orderkey")).hint("merge")
    joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString.toLowerCase
    val reused = plan.contains("reused")
    if (sys.env.contains("GRAFT_DEBUG_PLAN"))
      System.err.println("[q51-plan]\n" + plan)
    joined.agg(count(lit(1)).as("n_rows"), sum(col("q1")).as("sum_q1"),
        sum(col("q2")).as("sum_q2"))
      .select(col("n_rows"), col("sum_q1"), col("sum_q2"),
        lit(reused).as("reuse_planned"))
  }

  val q51Sql: String =
    """WITH a AS (
      |  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS q
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(q) AS BIGINT) AS sum_q1,
      |  CAST(SUM(q) AS BIGINT) AS sum_q2,
      |  true AS reuse_planned
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Binned interval join — the SCALE path for pure non-equi (point ∈
    * [lo, hi]) joins. q16's range join rides an equi key; without one
    * Spark plans BroadcastNestedLoopJoin, which dies the moment the
    * interval side outgrows broadcast. The standard fix is binning:
    * explode each interval into its covering bins of width w, give each
    * point its ONE bin, equi-join on bin, re-check the exact predicate.
    * Each (point, interval) pair meets in exactly one bin (the point's),
    * so no dedup is needed; the nested loop becomes a shuffled equi-join
    * that scales with data + interval_len/w fan-out. The gate asserts
    * the plan: a real equi-join, NO BroadcastNestedLoop. */
  def q52BinnedIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val binW = 8
    // deterministic overlapping interval dim (25 rows, rule-derived so
    // the oracle restates it from range())
    val ivals = s.range(25).select(col("id").as("ival_id"),
      (col("id") * 7 % 180).as("lo"),
      (col("id") * 7 % 180 + col("id") % 12 + 1).as("hi"))
      .select(col("ival_id"), col("lo"), col("hi"),
        // integer bin ids (Column./ is double division; `div` floors)
        explode(sequence(expr(s"lo div $binW"), expr(s"hi div $binW")))
          .as("bin"))
    val facts = Tables.lineitem(s, d)
      .select((col("l_partkey") % 200).as("x"),
        col("l_quantity").cast("long").as("qty"))
      .withColumn("bin", expr(s"x div $binW"))
    val joined = facts.join(ivals, Seq("bin"))
      .where(col("x") >= col("lo") && col("x") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastNestedLoop"),
      "binned interval join must not plan a nested loop")
    joined.groupBy(col("ival_id"))
      .agg(count(lit(1)).as("n_points"), sum(col("qty")).as("sum_qty"))
      .orderBy("ival_id")
  }

  val q52Sql: String =
    """WITH iv AS (
      |  SELECT id AS ival_id, (id * 7) % 180 AS lo,
      |    (id * 7) % 180 + id % 12 + 1 AS hi
      |  FROM range(25) t(id)),
      |f AS (SELECT l_partkey % 200 AS x, CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem)
      |SELECT ival_id, CAST(COUNT(*) AS BIGINT) AS n_points,
      |  CAST(SUM(qty) AS BIGINT) AS sum_qty
      |FROM f JOIN iv ON f.x >= iv.lo AND f.x <= iv.hi
      |GROUP BY ival_id ORDER BY ival_id""".stripMargin

  // ---------------------------------------------------------------- q53
  /** Window DISTRIBUTION functions — ntile / percent_rank / cume_dist
    * (the quantile-bucketing trio reporting layers lean on), over a
    * total order made unique by the key tie-break so ranks are
    * deterministic. percent_rank = (rank−1)/(n−1) and cume_dist = rank/n
    * are single IEEE divisions of exact integers — identical trees both
    * engines, no tolerance needed. One shuffle on the partition key. */
  def q53WindowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("o_orderkey")
  }

  val q53Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY o_totalprice ASC, o_orderkey ASC)
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q54
  /** Date/time kernel (§2.6's temporal counterpart): truncation, field
    * extraction, interval arithmetic, day difference — every expression
    * engine-neutral by construction (date_trunc week = ISO Monday in
    * both; DuckDB dayofweek is 0-based Sunday, normalized in the
    * oracle). Narrow scan, zero shuffle before the sort. */
  def q54DatetimeKernel(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        // date_trunc yields LTZ even on NTZ input — cast back so the
        // dumped parquet carries the same NTZ type the oracle produces
        date_trunc("day", col("ts")).cast(TimestampNTZType).as("day"),
        date_trunc("week", col("ts")).cast(TimestampNTZType).as("week"),
        hour(col("ts")).as("hr"),
        dayofweek(col("ts")).as("dow"),
        (col("ts") + expr("INTERVAL 90 MINUTES")).cast(TimestampNTZType)
          .as("plus_90m"),
        datediff(col("ts").cast("date"), lit("1995-01-01").cast("date"))
          .as("days_since"))
      .orderBy("event_id")

  val q54Sql: String =
    """SELECT event_id,
      |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
      |  CAST(hour(ts) AS INT) AS hr,
      |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
      |  ts + INTERVAL 90 MINUTE AS plus_90m,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS INT)
      |    AS days_since
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Incremental-batch RESUME gate — `Trigger.AvailableNow` + a shared
    * checkpoint, the pattern production incremental ETL actually runs
    * (nightly job: process everything new since last run, then STOP —
    * streaming semantics without a resident cluster). q46 pinned the
    * idempotent-sink half; this pins the SOURCE half: the file-source
    * checkpoint must carry seen-file state ACROSS invocations, so run 2
    * processes only the files added after run 1 — a resume regression
    * double-processes run 1's input and flips `exactly_once`. The
    * parquet streaming sink's file log gives transactional output.
    * State at 100 TB: the checkpoint holds file names, not data —
    * invocation cost scales with NEW data only. */
  def q55IncrementalResumeGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    import org.apache.spark.sql.streaming.Trigger
    // isolated session clone (q37 note)
    val s2 = s.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val conf = s.sparkContext.hadoopConfiguration
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q55_$tag"
    HadoopIO.delete(root, conf) // fresh artifact + checkpoint every run
    val (inDir, outDir, ck) = (s"$root/in", s"$root/out", s"$root/ck")
    val ev = Tables.events(s2, d)
      .select(col("event_id"), col("user_id"))
    def runOnce(): Unit = {
      val q = s2.readStream.schema(ev.schema).parquet(inDir)
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: the even half; run 2 must pick up ONLY the odd half's files
    ev.where(col("event_id") % 2 === 0).write.mode("append").parquet(inDir)
    runOnce()
    ev.where(col("event_id") % 2 === 1).write.mode("append").parquet(inDir)
    runOnce()
    s2.read.parquet(outDir).agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("event_id")).as("n_ids"),
        sum(col("event_id")).as("id_checksum"))
      .select(col("n_rows"), col("n_ids"), col("id_checksum"),
        (col("n_rows") === col("n_ids")).as("exactly_once"))
  }

  val q55Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
      |  CAST(SUM(event_id) AS BIGINT) AS id_checksum,
      |  true AS exactly_once
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q56
  /** ORC source/sink gate — the second columnar format large estates
    * actually mix with parquet (Hive-era tables): a lineitem slice
    * written ORC, read back with a filter + 2-column projection, and
    * the plan checked for BOTH pushdowns (`searchArgument`/pushed
    * filters reach the ORC reader; ReadSchema prunes to the projected
    * columns — a scan reading 11 columns for a 2-column query is wrong
    * at any scale). Aggregate parity restated by the oracle over the
    * original parquet. */
  def q56OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val dir = s"${HadoopIO.scratchDir(s)}/graft_q56_$tag"
    Tables.lineitem(s, d).write.mode("overwrite").orc(dir)
    val back = s.read.orc(dir)
      .where(col("l_quantity") >= 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = back.queryExecution.executedPlan.toString
    val pushed = scan.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      scan.toLowerCase.contains("greaterthanorequal(l_quantity,30")
    val pruned = !scan.contains("l_extendedprice")
    back.agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(col("l_orderkey")).as("key_checksum"))
      .select(col("n_rows"), col("sum_qty"), col("key_checksum"),
        lit(pushed && pruned).as("pushdown_ok"))
  }

  val q56Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(l_orderkey) AS BIGINT) AS key_checksum,
      |  true AS pushdown_ok
      |FROM lineitem WHERE l_quantity >= 30""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Array-function kernel (§2.6's collection counterpart): sort /
    * distinct / slice / set-intersect / join over per-doc token arrays —
    * all codegen'd builtins, narrow per-row work, no explode (the
    * corpus-sized fan-out the HOF forms exist to avoid). Order-carrying
    * results are explicitly sorted so both engines agree (Spark's
    * array_intersect keeps left order, DuckDB's list_intersect is
    * unspecified — array_sort normalizes both). */
  def q57ArrayKernel(s: SparkSession, d: String): DataFrame = {
    val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
    val t = split(lower(trim(col("text"))), "\\s+")
    Tables.fanOut(Tables.documents(s, d), col("doc_id")) // r16 fan-out; r17 PK key
      .select(col("doc_id"), t.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tok"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        array_join(slice(array_sort(col("toks")), 1, 5), " ").as("first5"),
        size(array_sort(array_intersect(array_distinct(col("toks")), stop)))
          .as("n_stop"),
        element_at(array_sort(col("toks"), (a, b) =>
          when(length(a) < length(b), -1).when(length(a) > length(b), 1)
            .otherwise(when(a < b, -1).when(a > b, 1).otherwise(0))), -1)
          .as("longest_tok"))
      .orderBy("doc_id")
  }

  val q57Sql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS INT) AS n_tok,
      |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
      |  array_to_string(list_sort(toks)[1:5], ' ') AS first5,
      |  CAST(len(list_intersect(list_distinct(toks),
      |    ['the', 'a', 'of', 'and', 'to'])) AS INT) AS n_stop,
      |  (SELECT u.tok FROM unnest(toks) AS u(tok)
      |   ORDER BY length(u.tok) DESC, u.tok DESC LIMIT 1) AS longest_tok
      |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q58
  /** Null-semantics kernel — coalesce / nullif / null-safe equality
    * (`<=>` ≡ IS NOT DISTINCT FROM) / null-aware aggregation, over
    * derived nulls (the corpus has none — `nullif` plants them
    * deterministically). The null-safe join predicate is the piece
    * naive SQL ports get wrong (NULL = NULL is NULL, NULL <=> NULL is
    * TRUE); count/avg skip nulls while count(*) does not — both
    * contracts pinned by exact aggregates. */
  def q58NullSemantics(s: SparkSession, d: String): DataFrame = {
    val disc = nullif(col("l_discount"), lit(0.0))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), disc.as("disc"),
        coalesce(disc, lit(-1.0)).as("disc_or"),
        (disc <=> lit(0.04)).as("is04"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("disc")).as("n_nonnull"),
        sum(col("is04").cast("long")).as("n_04"),
        dsum(col("disc_or"), 2).as("sum_coalesced"))
      .orderBy("l_returnflag")
  }

  val q58Sql: String =
    s"""SELECT l_returnflag,
       |  CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(NULLIF(l_discount, 0.0)) AS BIGINT) AS n_nonnull,
       |  CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0)
       |    IS NOT DISTINCT FROM 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_04,
       |  ${dsumSql("COALESCE(NULLIF(l_discount, 0.0), -1.0)", 2)}
       |    AS sum_coalesced
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q59
  /** String-function kernel (§2.6 completion alongside q14/q54): pad /
    * reverse / locate / split-part / repeat / translate / edit distance /
    * concat_ws — each a codegen'd built-in evaluated per row in one
    * narrow scan stage (no UDF, no shuffle before the output sort).
    * Cross-engine landmines pinned: `instr` is 1-based with 0-for-absent
    * in BOTH engines (DuckDB `strpos`); `split_part` out-of-range never
    * occurs (p_name is always two words) so ANSI `element_at` is safe;
    * `levenshtein` is the unweighted case-sensitive distance in both. */
  def q59StringKernel(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 10, "*").as("lp"),
        rpad(col("p_type"), 8, ".").as("rp"),
        reverse(col("p_name")).as("rev"),
        instr(col("p_name"), "widget").as("pos"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        repeat(substring(col("p_brand"), 1, 5), 2).as("rep2"),
        translate(col("p_type"), "AEIOU", "01234").as("tr"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
        element_at(split(col("p_brand"), "#"), 2).cast("int").as("brand_num"))
      .orderBy("p_partkey")

  val q59Sql: String =
    """SELECT p_partkey,
      |  lpad(p_brand, 10, '*') AS lp, rpad(p_type, 8, '.') AS rp,
      |  reverse(p_name) AS rev,
      |  CAST(strpos(p_name, 'widget') AS INT) AS pos,
      |  split_part(p_name, ' ', 1) AS first_word,
      |  repeat(substr(p_brand, 1, 5), 2) AS rep2,
      |  translate(p_type, 'AEIOU', '01234') AS tr,
      |  CAST(levenshtein(p_name, p_type) AS INT) AS lev,
      |  concat_ws('-', p_brand, p_type) AS cw,
      |  CAST(split_part(p_brand, '#', 2) AS INT) AS brand_num
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Regex kernel: extract / extract-all count / global replace / match
    * predicate / group capture — the scrubbing primitives every text
    * pipeline leans on (t10's PII pass is built from exactly these).
    * Dialect parity is the point under test: patterns restricted to the
    * Java-regex ∩ RE2 common subset (char classes, alternation, `\b`);
    * Spark's `regexp_replace` is global by default while DuckDB needs
    * the explicit `'g'` flag — the oracle carries it; no-match
    * `regexp_extract` yields `''` (not NULL) in both engines. */
  def q60RegexKernel(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        regexp_extract(col("text"), "b[a-z]+", 0).as("first_b"),
        size(regexp_extract_all(col("text"), lit("\\bs[a-z]+"), lit(0)))
          .as("n_s_words"),
        regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "_")
          .as("masked"),
        col("text").rlike("merge (table|scan)").as("has_ms"),
        regexp_extract(col("text"), "([a-z]+) (join|sort)", 1)
          .as("before_js"))
      .orderBy("doc_id")

  val q60Sql: String =
    """SELECT doc_id,
      |  regexp_extract(text, 'b[a-z]+') AS first_b,
      |  CAST(len(regexp_extract_all(text, '\bs[a-z]+')) AS INT)
      |    AS n_s_words,
      |  regexp_replace(substr(text, 1, 40), '[aeiou]', '_', 'g') AS masked,
      |  regexp_matches(text, 'merge (table|scan)') AS has_ms,
      |  regexp_extract(text, '([a-z]+) (join|sort)', 1) AS before_js
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Bitwise + cryptographic-hash kernel: AND/OR/XOR/shifts/popcount/hex
    * plus md5/sha256 digests — the primitives under every hash-partition,
    * fingerprint, and content-address in the engine (d01's md5 keys, d04's
    * bit banding, t26's bucket splits all compose these). Integer ops are
    * exact by construction; the digest strings pin byte-level agreement
    * (both engines hash the decimal string's UTF-8 bytes and print
    * lowercase hex; `hex` of an integer prints uppercase, no leading
    * zeros, in both). Narrow scan; the conditional fan-out exchange
    * (ADVICE r16: not zero-shuffle at bench SF) parallelizes the digest
    * kernel over single-row-group inputs and vanishes at production file
    * counts. */
  def q61BitwiseKernel(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.orders(s, d), col("o_orderkey")) // r16 fan-out; r17 PK key
      .select(col("o_orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("orr"),
        col("o_orderkey").bitwiseXOR(col("o_custkey").cast("long")).as("xo"),
        shiftleft(col("o_orderkey"), 2).as("shl"),
        shiftright(col("o_orderkey"), 3).as("shr"),
        bit_count(col("o_orderkey")).as("bc"),
        hex(col("o_orderkey")).as("hx"),
        md5(encode(col("o_orderkey").cast("string"), "UTF-8")).as("m5"),
        sha2(encode(col("o_orderkey").cast("string"), "UTF-8"), 256)
          .as("s2"))
      .orderBy("o_orderkey")

  val q61Sql: String =
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS band, o_orderkey | 4096 AS orr,
      |  xor(o_orderkey, CAST(o_custkey AS BIGINT)) AS xo,
      |  o_orderkey << 2 AS shl, o_orderkey >> 3 AS shr,
      |  CAST(bit_count(o_orderkey) AS INT) AS bc,
      |  hex(o_orderkey) AS hx,
      |  md5(CAST(o_orderkey AS VARCHAR)) AS m5,
      |  sha256(CAST(o_orderkey AS VARCHAR)) AS s2
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Null-aware anti join — `NOT IN (subquery)` with a NULL in the value
    * set, the three-valued-logic trap a plain left-anti join gets wrong
    * (x NOT IN (…, NULL) is never TRUE, so ONE null empties the result;
    * left-anti's `=` keeps every non-matching row). Expressed as real SQL
    * subqueries so Catalyst plans its null-aware path (RewritePredicate-
    * Subquery → null-aware broadcast anti join; the value set is
    * dimension-sized, so the fact side never shuffles). Three counts pin
    * the contract: clean NOT IN (rows survive), polluted NOT IN (zero —
    * the trap), polluted IN (nulls drop from IN but matches remain). */
  def q62NullAwareAntiJoin(s: SparkSession, d: String): DataFrame = {
    // view names carry the dataset tag (viewTag): un-tagged names race
    // when two concurrent runs point the same query at different sf dirs
    val t = viewTag(d)
    Tables.lineitem(s, d).createOrReplaceTempView(s"g62_lineitem_$t")
    Tables.supplier(s, d).createOrReplaceTempView(s"g62_supplier_$t")
    s.sql(s"""
      WITH sub AS (
        SELECT s_suppkey AS k FROM g62_supplier_$t WHERE s_suppkey % 7 = 0),
      subn AS (
        SELECT NULLIF(s_suppkey, 7) AS k FROM g62_supplier_$t
        WHERE s_suppkey % 7 = 0)
      SELECT
        (SELECT COUNT(*) FROM g62_lineitem_$t
         WHERE l_suppkey NOT IN (SELECT k FROM sub)) AS n_clean,
        (SELECT COUNT(*) FROM g62_lineitem_$t
         WHERE l_suppkey NOT IN (SELECT k FROM subn)) AS n_polluted,
        (SELECT COUNT(*) FROM g62_lineitem_$t
         WHERE l_suppkey IN (SELECT k FROM subn)) AS n_in_polluted""")
  }

  val q62Sql: String =
    """WITH sub AS (
      |  SELECT s_suppkey AS k FROM supplier WHERE s_suppkey % 7 = 0),
      |subn AS (
      |  SELECT NULLIF(s_suppkey, 7) AS k FROM supplier
      |  WHERE s_suppkey % 7 = 0)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM lineitem
      |    WHERE l_suppkey NOT IN (SELECT k FROM sub)) AS BIGINT) AS n_clean,
      |  CAST((SELECT COUNT(*) FROM lineitem
      |    WHERE l_suppkey NOT IN (SELECT k FROM subn)) AS BIGINT)
      |    AS n_polluted,
      |  CAST((SELECT COUNT(*) FROM lineitem
      |    WHERE l_suppkey IN (SELECT k FROM subn)) AS BIGINT)
      |    AS n_in_polluted""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Approximate-percentile SKETCH gate — q23's exact path has a scale
    * ceiling (exact percentiles cost a per-group value histogram); the
    * production fallback is the mergeable Greenwald-Khanna sketch
    * (`approx_percentile`), whose rank error is bounded by 1/accuracy.
    * Gate: per group, the sketch's median lands within 1% of the value
    * RANGE of the exact median (accuracy 10⁴ on ~10⁴-row groups is far
    * inside that) — both computed in ONE aggregate pass, so the row
    * self-checks the sketch against the exact kernel it replaces. The
    * sketch is partial-aggregable (map-side combine), the property that
    * makes it the 100 TB path. */
  def q63ApproxQuantileGate(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("ep"),
        max(col("l_extendedprice")).as("mx"),
        min(col("l_extendedprice")).as("mn"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("ap") - col("ep")) <= (col("mx") - col("mn")) * 0.01)
          .as("approx_ok"))
      .orderBy("l_returnflag")

  val q63Sql: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  true AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Outer-join kernel completing the join matrix (inner q03, semi q04,
    * anti q05, full-outer q22, null-aware anti q62): LEFT OUTER with
    * engineered orphans (the dimension filtered to c_custkey % 3 ≠ 0, so
    * a third of orders lose their customer — null-side counting pins the
    * preserved-row semantics and `count(col)`'s null-skipping), plus a
    * dimension-preserved outer leg counting childless customers.
    *
    * The left-outer leg broadcasts the dimension (BuildRight — the fact
    * table never shuffles). The dimension-PRESERVED leg cannot: Spark
    * supports broadcast-hash right-outer only as BuildLeft, i.e. it
    * would have to broadcast the FACT side — so a naive `right_outer`
    * with a broadcast dimension silently falls back to a sort-merge
    * that exchanges the whole fact table. Instead the fact side is
    * pre-aggregated to its DISTINCT customer keys (dimension-bounded by
    * definition — map-side partial agg, then broadcastable), and the
    * dimension left-outer-joins that: same childless semantics, zero
    * fact-table exchange. The in-row assert pins both broadcasts. */
  def q64OuterJoinKernel(s: SparkSession, d: String): DataFrame = {
    val csub = Tables.customer(s, d)
      .where(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val lo = Tables.orders(s, d)
      .join(broadcast(csub), col("o_custkey") === col("c_custkey"),
        "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("c_custkey").isNull.cast("long")).as("n_orphans"),
        count(col("c_mktsegment")).as("n_matched"))
    val osub = Tables.orders(s, d).where(col("o_orderkey") % 5 === 0)
      .select(col("o_custkey")).distinct()
    val ro = Tables.customer(s, d).select(col("c_custkey"))
      .join(broadcast(osub), col("c_custkey") === col("o_custkey"),
        "left_outer")
      .agg(countDistinct(col("c_custkey")).as("n_cust"),
        countDistinct(when(col("o_custkey").isNull, col("c_custkey")))
          .as("n_childless"))
    val plan = ro.queryExecution.executedPlan.toString
    require(plan.contains("BroadcastHashJoin") &&
        !plan.contains("SortMergeJoin"),
      "q64: the dimension-preserved leg failed to broadcast the " +
        "pre-aggregated fact keys")
    lo.crossJoin(ro)
      .select(col("o_orderpriority"), col("n_orders"), col("n_orphans"),
        col("n_matched"), col("n_cust"), col("n_childless"))
      .orderBy("o_orderpriority")
  }

  val q64Sql: String =
    """WITH csub AS (
      |  SELECT c_custkey, c_mktsegment FROM customer
      |  WHERE c_custkey % 3 != 0),
      |lo AS (
      |  SELECT o.o_orderpriority, COUNT(*) AS n_orders,
      |    SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS n_orphans,
      |    COUNT(c.c_mktsegment) AS n_matched
      |  FROM orders o LEFT JOIN csub c ON o.o_custkey = c.c_custkey
      |  GROUP BY o.o_orderpriority),
      |osub AS (SELECT o_custkey FROM orders WHERE o_orderkey % 5 = 0),
      |ro AS (
      |  SELECT COUNT(*) AS n_cust,
      |    SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM osub
      |      WHERE osub.o_custkey = customer.c_custkey)
      |      THEN 1 ELSE 0 END) AS n_childless
      |  FROM customer)
      |SELECT lo.o_orderpriority, CAST(lo.n_orders AS BIGINT) AS n_orders,
      |  CAST(lo.n_orphans AS BIGINT) AS n_orphans,
      |  CAST(lo.n_matched AS BIGINT) AS n_matched,
      |  CAST(ro.n_cust AS BIGINT) AS n_cust,
      |  CAST(ro.n_childless AS BIGINT) AS n_childless
      |FROM lo CROSS JOIN ro ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q65
  /** VARIANT kernel — Spark 4's semi-structured type (the engine-native
    * answer to schemaless JSON at scale): `parse_json` once into a binary
    * variant, then typed path extraction (`variant_get` with nested
    * object and array-index paths), `try_variant_get` on a missing path
    * (null, no error), and `is_variant_null` distinguishing JSON null
    * from path absence — the distinction stringly JSON (q20's
    * `get_json_object`) cannot make. Parsing happens ONCE per row
    * regardless of how many paths extract (vs re-tokenizing per
    * `get_json_object` call), which is the production case for wide
    * event payloads. The JSON is synthesized from typed columns with the
    * same concat in both engines, so DuckDB restates every extraction
    * with its JSON operators. */
  def q65VariantKernel(s: SparkSession, d: String): DataFrame = {
    val js = concat(
      lit("{\"id\": "), col("event_id"),
      lit(", \"meta\": {\"type\": \""), col("event_type"),
      lit("\", \"k\": "), get_json_object(col("props"), "$.k"),
      lit("}, \"vals\": ["), col("user_id"), lit("], \"nul\": null}"))
    Tables.fanOut(Tables.events(s, d), col("event_id")) // r16 fan-out; r17 PK key
      .select(col("event_id"), parse_json(js).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.meta.k", "int").as("k"),
        variant_get(col("v"), "$.meta.type", "string").as("etype"),
        variant_get(col("v"), "$.vals[0]", "bigint").as("v0"),
        try_variant_get(col("v"), "$.missing", "int").as("missing"),
        is_variant_null(variant_get(col("v"), "$.nul", "variant"))
          .as("mnull"))
      .orderBy("event_id")
  }

  val q65Sql: String =
    """WITH j AS (
      |  SELECT event_id,
      |    '{"id": ' || event_id || ', "meta": {"type": "' || event_type ||
      |    '", "k": ' || (props->>'$.k') || '}, "vals": [' || user_id ||
      |    '], "nul": null}' AS js
      |  FROM events)
      |SELECT event_id,
      |  CAST(js->>'$.meta.k' AS INT) AS k,
      |  js->>'$.meta.type' AS etype,
      |  CAST(js->>'$.vals[0]' AS BIGINT) AS v0,
      |  CAST(NULL AS INT) AS missing,
      |  COALESCE(json_type(json(js), '$.nul') = 'NULL', false) AS mnull
      |FROM j ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q66
  /** `transformWithState` gate — Spark 4's arbitrary-state streaming API
    * (typed named state variables, explicit TimeMode, RocksDB-backed)
    * driven at driver visibility with q39's replay discipline: the
    * events file staged twice, one file per micro-batch, so per-user
    * state must accumulate ACROSS batches and the final stat per user is
    * exactly 2× the batch aggregate. The processor is the q39 kernel
    * re-expressed on the new API ([[graft.streaming.EventStreams
    * .RunningTotalsProcessor]]) — same state size (one struct per user),
    * same update stream, which is the point: the gate proves API parity,
    * and RocksDB (TWS's only supported backend) spills state off-heap at
    * production key cardinalities where the HDFS-backed store OOMs. */
  def q66TransformWithStateGate(s: SparkSession, d: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val path = s"$d/events.parquet"
    val rawSchema = s2.read.parquet(path).schema
    import graft.sources.HadoopIO
    val conf = s.sparkContext.hadoopConfiguration
    val stageDir =
      s"${HadoopIO.scratchDir(s)}/graft_q66_" + d.replaceAll("[^A-Za-z0-9]", "_")
    HadoopIO.stageFile(path, s"$stageDir/events_a.parquet", conf)
    HadoopIO.stageFile(path, s"$stageDir/events_b.parquet", conf)
    val raw = s2.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir)
    val events =
      if (rawSchema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))
          .cast(TimestampType))
      else raw.withColumn("ts", col("ts").cast(TimestampType))
    import s2.implicits._
    val typed = events.as[graft.streaming.Event]
    val tbl = "q66_streamed"
    val q = graft.streaming.EventStreams.runningUserTotalsTws(typed).toDF()
      .writeStream.format("memory").queryName(tbl).outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    val finals = s2.table(tbl)
      .groupBy(col("user_id"))
      .agg(max(struct(col("n"), col("total"))).as("m"))
      .select(col("user_id"), col("m.n").as("sn"), col("m.total").as("sv"))
    val batch = Tables.events(s2, d)
      .groupBy(col("user_id"))
      .agg((count(lit(1)) * 2).as("bn"),
        (sum(col("value")) * 2).as("bv"))
    finals.join(batch, Seq("user_id"), "full_outer")
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("sn")).as("sum_n"),
        (count(lit(1)) === sum(when(
          col("sn").isNotNull && col("bn").isNotNull &&
            (col("sn") === col("bn")) &&
            (abs(col("sv") - col("bv")) <=
              greatest(abs(col("bv")) * 1e-9, lit(1e-9))),
          1).otherwise(0))).as("all_match"))
  }

  val q66Sql: String =
    """SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(2 * COUNT(*) AS BIGINT) AS sum_n,
      |  true AS all_match
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q67
  /** Correlated LATERAL join — the SQL form of per-row top-n ("for each
    * customer, their single most expensive order"): a lateral subquery
    * with correlated predicate + ORDER BY + LIMIT 1, which Catalyst
    * decorrelates into a DomainJoin-rewritten window/aggregate rather
    * than a per-row nested loop (q50's discipline for scalar subqueries,
    * extended to the table-valued form). Same SQL text runs in DuckDB —
    * a dialect-parity kernel for the construct itself. Customers without
    * orders drop (inner lateral semantics), pinned by the row count. */
  def q67LateralTopN(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.customer(s, d).createOrReplaceTempView(s"g67_customer_$t")
    Tables.orders(s, d).createOrReplaceTempView(s"g67_orders_$t")
    s.sql(s"""SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey,
        o.o_totalprice
      FROM g67_customer_$t c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM g67_orders_$t
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
      ORDER BY c.c_custkey""")
  }

  val q67Sql: String =
    """SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
      |ORDER BY c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- q68
  /** RECURSIVE CTE — Spark 4's iterative-query surface (the SQL form of
    * d12's connected-components loop; DuckDB's recursive CTE is already
    * this engine's CC oracle, so the construct now runs on BOTH sides):
    * every customer walks the implicit digit-hierarchy parent chain
    * (parent = key div 10) to the root, the per-node depth is the walk's
    * max step, and the depth histogram + id checksum pin every level.
    * Each recursion step is one self-join the engine plans as a fresh
    * batch over the frontier — rows leave the frontier exactly when
    * `cur` hits 0, so the iteration count is the max key width (6 here),
    * not the row count. Only the integer-division spelling differs
    * between the dialects (`div` vs `//`). */
  def q68RecursiveCte(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.customer(s, d).createOrReplaceTempView(s"g68_customer_$t")
    s.sql(s"""WITH RECURSIVE walk(node, cur, d) AS (
        SELECT c_custkey, c_custkey, 0 FROM g68_customer_$t
        UNION ALL
        SELECT node, cur div 10, d + 1 FROM walk WHERE cur > 0)
      SELECT d AS depth, COUNT(*) AS n_nodes, SUM(node) AS id_sum
      FROM (SELECT node, MAX(d) AS d FROM walk GROUP BY node)
      GROUP BY d ORDER BY d""")
  }

  val q68Sql: String =
    """WITH RECURSIVE walk(node, cur, d) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT node, cur // 10, d + 1 FROM walk WHERE cur > 0)
      |SELECT CAST(d AS INT) AS depth, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(SUM(node) AS BIGINT) AS id_sum
      |FROM (SELECT node, MAX(d) AS d FROM walk GROUP BY node)
      |GROUP BY d ORDER BY d""".stripMargin

  // ---------------------------------------------------------------- q69
  /** SQL PIPE syntax — Spark 4's composable query form (`FROM … |> WHERE
    * … |> EXTEND … |> AGGREGATE … |> ORDER BY`), the linear dataflow
    * spelling of the same logical plan the nested form produces. The
    * oracle is the classic SELECT restatement, so the row pins that the
    * pipe operators lower to identical semantics (filter before extend
    * before aggregate; AGGREGATE emits group keys + aggregates). Exact
    * integer aggregates only — no float-order hazard. */
  def q69PipeSyntax(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.lineitem(s, d).createOrReplaceTempView(s"g69_lineitem_$t")
    s.sql(s"""FROM g69_lineitem_$t
      |> WHERE l_discount > 0.05
      |> EXTEND CAST(l_quantity AS BIGINT) AS qi
      |> AGGREGATE COUNT(*) AS n_rows, SUM(qi) AS sum_qty,
           COUNT(DISTINCT l_suppkey) AS n_supp GROUP BY l_returnflag
      |> ORDER BY l_returnflag""")
  }

  val q69Sql: String =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |FROM lineitem WHERE l_discount > 0.05
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Bivariate-statistics kernel: `corr` / `covar_samp` builtins gated
    * against the closed forms over ORDER-INSENSITIVE decimal sums (Det
    * discipline — the builtins' own streaming moment updates are
    * float-order-dependent, so their raw values can't hash across
    * engines; the exact-sum formulas CAN, and the in-row gate pins the
    * builtins to them within 1e-9 relative). One aggregate pass computes
    * builtins and exact sums together; scales follow Det's rule (2-dec
    * money ⇒ products 2–4-dec, |value|·10^scale < 2^53). */
  def q70StatsKernel(s: SparkSession, d: String): DataFrame = {
    // both columns INTEGER-VALUED (quantity; discount in whole percent) so
    // every sum total stays under 2^53 — the decimal→double cast of an
    // over-wide total is the one place engines can disagree by an ulp
    // (Det's scale rule), and corr's cancellation amplifies it
    val x = col("l_quantity")
    val y = round(col("l_discount") * 100, 0)
    val a = Tables.fanOut(Tables.lineitem(s, d), col("l_orderkey"), col("l_linenumber")) // r16 fan-out; r17 PK keys
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        corr(x, y).as("bc"), covar_samp(x, y).as("bcv"),
        dsum(x, 2).as("sx"), dsum(y, 2).as("sy"),
        dsum(x * y, 2).as("sxy"), dsum(x * x, 2).as("sxx"),
        dsum(y * y, 2).as("syy"))
      .withColumn("nd", col("n_rows").cast("double"))
    val cExact = (col("nd") * col("sxy") - col("sx") * col("sy")) /
      (sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
        sqrt(col("nd") * col("syy") - col("sy") * col("sy")))
    val cvExact = (col("sxy") - col("sx") * col("sy") / col("nd")) /
      (col("nd") - lit(1.0))
    a.select(col("l_returnflag"), col("n_rows"),
        cExact.as("corr_exact"), cvExact.as("covar_exact"),
        (abs(col("bc") - cExact) <=
          greatest(abs(cExact) * 1e-9, lit(1e-12))).as("corr_ok"),
        (abs(col("bcv") - cvExact) <=
          greatest(abs(cvExact) * 1e-9, lit(1e-12))).as("covar_ok"))
      .orderBy("l_returnflag")
  }

  val q70Sql: String = {
    val n = "CAST(COUNT(*) AS DOUBLE)"
    val yc = "round(l_discount * 100, 0)"
    val sx = dsumSql("l_quantity", 2)
    val sy = dsumSql(yc, 2)
    val sxy = dsumSql(s"l_quantity * $yc", 2)
    val sxx = dsumSql("l_quantity * l_quantity", 2)
    val syy = dsumSql(s"$yc * $yc", 2)
    s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ($n * $sxy - $sx * $sy) /
       |    (SQRT($n * $sxx - $sx * $sx) * SQRT($n * $syy - $sy * $sy))
       |    AS corr_exact,
       |  ($sxy - $sx * $sy / $n) / ($n - 1.0) AS covar_exact,
       |  true AS corr_ok, true AS covar_ok
       |FROM lineitem GROUP BY l_returnflag
       |ORDER BY l_returnflag""".stripMargin
  }

  // ---------------------------------------------------------------- q71
  /** COLLATION kernel — Spark 4's string-collation support (per-column
    * comparison semantics, the engine-native alternative to scattering
    * `lower()` through every predicate): equality, `contains`/
    * `startswith`, and a case-insensitive distinct count under
    * `UTF8_LCASE`, each paired with the binary-collation behavior on the
    * same data so the row pins the DIFFERENCE (ci true where cs false).
    * Mixed-case strings are synthesized from `p_name` (upper-cased first
    * word), and the oracle restates each collated operation with
    * `lower()` — exactly the rewrite collations obviate. Collation
    * comparisons stay codegen'd expressions; the distinct count is one
    * hash aggregate on the collated key. */
  def q71CollationKernel(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.part(s, d).createOrReplaceTempView(s"g71_part_$t")
    s.sql(s"""
      WITH m AS (
        SELECT p_partkey, p_name,
          concat(upper(split_part(p_name, ' ', 1)), ' ',
                 split_part(p_name, ' ', 2)) AS mixed
        FROM g71_part_$t),
      per_row AS (
        SELECT p_partkey,
          collate(mixed, 'UTF8_LCASE') = collate(p_name, 'UTF8_LCASE')
            AS ci_eq,
          mixed = p_name AS cs_eq,
          contains(collate(mixed, 'UTF8_LCASE'), 'WIDGET') AS ci_widget,
          contains(mixed, 'WIDGET') AS cs_widget
        FROM m),
      agg AS (
        SELECT COUNT(DISTINCT collate(mixed, 'UTF8_LCASE')) AS n_ci,
          COUNT(DISTINCT mixed) AS n_cs
        FROM m)
      SELECT p.p_partkey, p.ci_eq, p.cs_eq, p.ci_widget, p.cs_widget,
        a.n_ci, a.n_cs
      FROM per_row p CROSS JOIN agg a
      ORDER BY p.p_partkey""")
  }

  val q71Sql: String =
    """WITH m AS (
      |  SELECT p_partkey, p_name,
      |    concat(upper(split_part(p_name, ' ', 1)), ' ',
      |           split_part(p_name, ' ', 2)) AS mixed
      |  FROM part),
      |per_row AS (
      |  SELECT p_partkey,
      |    lower(mixed) = lower(p_name) AS ci_eq,
      |    mixed = p_name AS cs_eq,
      |    contains(lower(mixed), lower('WIDGET')) AS ci_widget,
      |    contains(mixed, 'WIDGET') AS cs_widget
      |  FROM m),
      |agg AS (
      |  SELECT CAST(COUNT(DISTINCT lower(mixed)) AS BIGINT) AS n_ci,
      |    CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_cs
      |  FROM m)
      |SELECT p.p_partkey, p.ci_eq, p.cs_eq, p.ci_widget, p.cs_widget,
      |  a.n_ci, a.n_cs
      |FROM per_row p CROSS JOIN agg a
      |ORDER BY p.p_partkey""".stripMargin

  // ---------------------------------------------------------------- q72
  /** SQL UDFs (`CREATE FUNCTION … RETURN <expr>`) — Spark 4's declarative
    * user functions: unlike JVM closures they are INLINED into the plan
    * (Catalyst substitutes the body, so pushdown/codegen/constant folding
    * apply — a scalar SQL UDF costs nothing vs writing the expression by
    * hand, the property this row pins). One arithmetic UDF (net price,
    * summed with the Det decimal discipline) and one CASE UDF used as
    * BOTH a projection and the GROUP BY key; the oracle is the inline
    * expansion — identical trees, so values hash-match exactly. */
  def q72SqlUdf(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.lineitem(s, d).createOrReplaceTempView(s"g72_lineitem_$t")
    // function bodies are dataset-independent, but the names are tagged
    // anyway: CREATE OR REPLACE on a function another thread is resolving
    // is a catalog race even when the replacement is byte-identical
    s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION g72_net_$t(
        p DOUBLE, disc DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - disc)""")
    s.sql(s"""CREATE OR REPLACE TEMPORARY FUNCTION g72_band_$t(q DOUBLE)
      RETURNS STRING RETURN CASE WHEN q < 10 THEN 'low'
        WHEN q < 30 THEN 'mid' ELSE 'high' END""")
    s.sql(s"""SELECT g72_band_$t(l_quantity) AS band,
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(g72_net_$t(l_extendedprice, l_discount)
          AS DECIMAL(38,4))) AS DOUBLE) AS net_sum
      FROM g72_lineitem_$t
      GROUP BY g72_band_$t(l_quantity) ORDER BY band""")
  }

  val q72Sql: String =
    """SELECT CASE WHEN l_quantity < 10 THEN 'low'
      |    WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(38,4))) AS DOUBLE) AS net_sum
      |FROM lineitem
      |GROUP BY 1 ORDER BY band""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Small-file compaction gate — the table-maintenance op every large
    * estate runs continuously (streaming ingest leaves thousands of
    * KB-sized files; scan throughput then collapses under per-file open
    * cost and task-schedule overhead, and at 100 TB a million-file table
    * is an operational incident). A lineitem slice is deliberately
    * fragmented into 64 parquet part-files, then compacted by an explicit
    * `repartition(4)` rewrite; the gate measures REAL file counts from
    * the filesystem listing (not plan guesses) and asserts the rewrite
    * preserved the row set — count plus two checksums the oracle restates
    * from the source table. At scale the same rewrite runs per partition
    * with a target file size (`maxRecordsPerFile` bounds the other
    * direction); the repartition shuffle is the entire cost and is
    * round-robin-uniform by construction, so no skew risk. */
  def q73CompactionGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val frag = s"${HadoopIO.scratchDir(s)}/graft_q73_frag_$tag"
    val comp = s"${HadoopIO.scratchDir(s)}/graft_q73_comp_$tag"
    val src = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    src.repartition(64).write.mode("overwrite").parquet(frag)
    val conf = HadoopIO.driverConf()
    val nFrag = HadoopIO.listScanTargets(frag, conf).size
    s.read.parquet(frag).repartition(4)
      .write.mode("overwrite").parquet(comp)
    val nComp = HadoopIO.listScanTargets(comp, conf).size
    s.read.parquet(comp).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_orderkey") * col("l_linenumber")).as("key_checksum"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .select(col("n_rows"), col("key_checksum"), col("sum_qty"),
        lit(nFrag >= 32 && nComp <= 8 && nComp >= 1).as("compacted_ok"))
  }

  val q73Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS key_checksum,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  true AS compacted_ok
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Schema-evolution gate — reading across snapshots written by DIFFERENT
    * pipeline versions is the normal state of a long-lived estate (columns
    * get added; old files stay). Two parquet snapshots of a lineitem slice
    * are written with divergent schemas (v2 adds a column), then scanned
    * together under `mergeSchema=true`: the merged relation must surface
    * the union schema, null-fill the missing column for v1 rows, and keep
    * both snapshots' rows — pinned by count/per-column aggregates the
    * oracle restates (the added column's sum over v2 only; `count(col)`'s
    * null-skip counts exactly the v2 rows). Footer merge cost is
    * per-FILE metadata, not data — the scan itself stays one pass. */
  def q74SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q74_$tag"
    val li = Tables.lineitem(s, d).where(col("l_orderkey") % 2 === 1)
    li.select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(s"$root/v1")
    li.select(col("l_orderkey"), col("l_quantity"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .write.mode("overwrite").parquet(s"$root/v2")
    val merged = s.read.option("mergeSchema", "true")
      .parquet(s"$root/v1", s"$root/v2")
    val schemaOk = merged.columns.sorted.sameElements(
      Array("disc_pct", "l_orderkey", "l_quantity"))
    merged.agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(col("disc_pct")).as("n_with_disc"),
        sum(col("disc_pct")).as("sum_disc"))
      .select(col("n_rows"), col("sum_qty"), col("n_with_disc"),
        col("sum_disc"), lit(schemaOk).as("schema_ok"))
  }

  /** Oracle: both snapshots restated from the source slice — v1+v2 row
    * union doubles the count; the added column exists only in v2. */
  val q74Sql: String =
    """SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(2 * SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n_with_disc,
      |  CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_disc,
      |  true AS schema_ok
      |FROM lineitem WHERE l_orderkey % 2 = 1""".stripMargin

  // ---------------------------------------------------------------- q75
  /** UNPIVOT / melt kernel — q33's pivot inverse (wide metrics → long
    * (key, metric, value) triples), the reshape feeding any generic
    * per-metric aggregation or metric-store ingest. Uses the native
    * `Dataset.unpivot` (Spark 3.4+ melt — a codegen'd Expand, one pass,
    * no join or union of N scans); values normalized to long before the
    * melt so the variable column is single-typed. The oracle restates as
    * a UNION ALL, which is what Expand computes. Narrow: n_metrics× row
    * fan-out inside the scan stage, then a 3-group rollup. */
  def q75Unpivot(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"),
        round(col("l_tax") * 100).cast("long").as("tax_pct"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("qty"), col("disc_pct"), col("tax_pct")),
        "metric", "v")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("sum_v"),
        sum(col("l_orderkey") * col("v")).as("weighted_checksum"))
      .orderBy("metric")
  }

  val q75Sql: String =
    """WITH m AS (
      |  SELECT l_orderkey, 'qty' AS metric,
      |    CAST(l_quantity AS BIGINT) AS v FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'disc_pct', CAST(round(l_discount * 100) AS BIGINT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, 'tax_pct', CAST(round(l_tax * 100) AS BIGINT)
      |  FROM lineitem)
      |SELECT metric, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(SUM(l_orderkey * v) AS BIGINT) AS weighted_checksum
      |FROM m GROUP BY metric ORDER BY metric""".stripMargin

  // ---------------------------------------------------------------- q76
  /** MERGE / upsert kernel — the CDC-apply operation every warehouse
    * table lives on (MERGE INTO target USING changes: matched-update,
    * matched-delete, not-matched-insert). A change feed synthesized from
    * `orders` (delete every key≡0 mod 10, update keys≡1..3 with +1000
    * price, insert fresh keys≡7 offset by 10⁹) merges against the base
    * slice; the result aggregate (counts by disposition + key/price
    * checksums) is restated by the oracle from the generating
    * arithmetic, and the checksums make a lost/duplicated/
    * mis-dispatched row flip the hash.
    *
    * NOT the single full-outer join MERGE is usually lowered to: Spark
    * cannot broadcast-hash a full-outer join, so that form silently
    * sort-merges BOTH sides — the base moves even when the CDC batch is
    * a million× smaller. Decomposed instead into legs that each keep
    * the base un-shuffled (CDC batches ≪ base is the defining property
    * of CDC): (1) APPLY — base LEFT-OUTER broadcast-joins the
    * update/delete changes (BuildRight, supported); (2) INSERT
    * EXISTENCE — base LEFT-SEMI broadcast-probes the insert keys,
    * yielding the already-present keys (a CDC-bounded, not base-bounded,
    * result); (3) the inserts anti-join that small matched set
    * (tiny×tiny). Every base-sided join broadcasts the CDC side — the
    * in-row plan assert (q43 style) pins two BroadcastHashJoins against
    * the base and rejects any SortMergeJoin. Price sums go through
    * Det's decimal image (2-decimal money). */
  def q76MergeUpsert(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Det.dsum
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val m = col("o_orderkey") % 10
    val changes = Tables.orders(s, d).select(col("o_orderkey"), m.as("m"),
        col("o_totalprice"))
      .where(m === 0 || (m >= 1 && m <= 3) || m === 7)
      .select(
        when(col("m") === 7, col("o_orderkey") + 1000000000L)
          .otherwise(col("o_orderkey")).as("k"),
        when(col("m") === 0, lit("D"))
          .when(col("m") === 7, lit("I")).otherwise(lit("U")).as("op"),
        when(col("m") === 7, col("o_totalprice"))
          .otherwise(col("o_totalprice") + 1000.0).as("new_price"))
    val upsDel = changes.where(col("op") =!= "I")
    val applied = base.join(broadcast(upsDel),
        base("o_orderkey") === upsDel("k"), "left_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("k"), col("o_orderkey")).as("key"),
        coalesce(col("new_price"), col("o_totalprice")).as("price"),
        coalesce(col("op"), lit("K")).as("disp"))
    val ins = changes.where(col("op") === "I")
    // not-matched check without moving the base: semi-probe the base with
    // the broadcast insert keys; the survivors (keys ALREADY in the base)
    // are CDC-bounded, so the final anti-join is small×small
    val present = base.join(broadcast(ins.select(col("k"))),
        base("o_orderkey") === col("k"), "left_semi")
      .select(col("o_orderkey").as("k"))
    val inserted = ins.join(broadcast(present), Seq("k"), "left_anti")
      .select(col("k").as("key"), col("new_price").as("price"),
        lit("I").as("disp"))
    val merged = applied.unionByName(inserted)
    val plan = merged.queryExecution.executedPlan.toString
    require(!plan.contains("SortMergeJoin") &&
        "BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "q76: a base-sided MERGE leg failed to broadcast the CDC side")
    merged.agg(
      count(lit(1)).as("n_rows"),
      sum((col("disp") === "K").cast("long")).as("n_kept"),
      sum((col("disp") === "U").cast("long")).as("n_updated"),
      sum((col("disp") === "I").cast("long")).as("n_inserted"),
      sum(col("key")).as("key_checksum"),
      dsum(col("price"), 2).as("price_sum"))
  }

  /** Oracle replays the change-feed arithmetic over the base slice. */
  val q76Sql: String =
    """WITH b AS (SELECT o_orderkey, o_totalprice,
      |    o_orderkey % 10 AS m FROM orders),
      |r AS (
      |  SELECT o_orderkey AS key, o_totalprice AS price, 'K' AS disp
      |  FROM b WHERE m NOT IN (0, 1, 2, 3)
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice + 1000.0, 'U'
      |  FROM b WHERE m IN (1, 2, 3)
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, o_totalprice, 'I'
      |  FROM b WHERE m = 7)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN disp = 'K' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(SUM(CASE WHEN disp = 'U' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_updated,
      |  CAST(SUM(CASE WHEN disp = 'I' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_inserted,
      |  CAST(SUM(key) AS BIGINT) AS key_checksum,
      |  CAST(SUM(CAST(price AS DECIMAL(38,2))) AS DOUBLE) AS price_sum
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q77
  /** SCD Type-2 apply — the dimension-history counterpart to q76's fact
    * upsert (Kimball slowly-changing dimensions: when an attribute
    * changes, close the old row and open a new current version instead of
    * overwriting). Change DETECTION is the real operator: two snapshots
    * of the customer dimension join on the key, attribute inequality
    * drives a conditional 1-or-2-row expansion (closed v1 + current v2
    * for changed keys, untouched current v1 otherwise). The synthesized
    * second snapshot shifts every key≡0 mod 4 balance by +100 so the
    * changed set is oracle-derivable; version/current counts and a
    * version-weighted balance checksum (Det decimal image) pin the
    * expansion. Scale shape: one key-partitioned equi-join (dimension
    * sized — broadcastable in practice), narrow explode bounded by 2. */
  def q77Scd2(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Det.dsum
    val snap1 = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal1"))
    val snap2 = snap1.select(col("k"),
      (col("bal1") + when(col("k") % 4 === 0, 100.0).otherwise(0.0))
        .as("bal2"))
    val rows = snap1.join(snap2, Seq("k"))
      .select(col("k"), explode(
        when(col("bal1") =!= col("bal2"), array(
          struct(col("bal1").as("bal"), lit(1).as("version"),
            lit(false).as("is_current")),
          struct(col("bal2").as("bal"), lit(2).as("version"),
            lit(true).as("is_current"))))
        .otherwise(array(
          struct(col("bal1").as("bal"), lit(1).as("version"),
            lit(true).as("is_current"))))).as("r"))
      .select(col("k"), col("r.*"))
    rows.agg(
      count(lit(1)).as("n_rows"),
      sum(col("is_current").cast("long")).as("n_current"),
      sum((!col("is_current")).cast("long")).as("n_closed"),
      sum(col("k") * col("version")).as("key_checksum"),
      dsum(col("bal") * col("version"), 2).as("bal_checksum"))
  }

  /** Oracle mirrors the expansion row-for-row as a UNION ALL (first
    * branch emits v1 with is_current = NOT changed; second emits the new
    * current v2 for changed keys only). */
  val q77Sql: String =
    """WITH c AS (SELECT c_custkey AS k, c_acctbal AS bal,
      |    c_custkey % 4 = 0 AS ch FROM customer),
      |r AS (
      |  SELECT k, bal, 1 AS version, NOT ch AS is_current FROM c
      |  UNION ALL
      |  SELECT k, bal + 100.0, 2, true FROM c WHERE ch)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE WHEN is_current THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_current,
      |  CAST(SUM(CASE WHEN is_current THEN 0 ELSE 1 END) AS BIGINT)
      |    AS n_closed,
      |  CAST(SUM(k * version) AS BIGINT) AS key_checksum,
      |  CAST(SUM(CAST(bal * version AS DECIMAL(38,2))) AS DOUBLE)
      |    AS bal_checksum
      |FROM r""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Analyst-SQL ergonomics kernel — three modern surfaces in one
    * statement, pinned by running the SAME query text on both engines:
    * `GROUP BY ALL` (group on every non-aggregate projection — the
    * DuckDB-popularized shorthand Spark adopted in 3.4), `ORDER BY ALL`
    * (total order over the whole output row), and LATERAL COLUMN
    * ALIASES in the outer projection (`combo` is built from sibling
    * columns and `combo2` references `combo` BY ALIAS — resolved by
    * Spark's lateral-alias pass, not a subquery; Spark does not yet
    * allow lateral aliases inside a GROUP BY ALL aggregate list, which
    * is why the demo splits into aggregate-then-project). Sugar only:
    * the resolved plan is the plain grouped aggregate + projection, so
    * pushdown/partial-agg behavior is identical to q01's — which is
    * exactly what the exact-hash oracle (same text, DuckDB) proves. */
  def q78GroupByAll(s: SparkSession, d: String): DataFrame = {
    val t = viewTag(d)
    Tables.orders(s, d).createOrReplaceTempView(s"g78_orders_$t")
    s.sql(s"""SELECT o_orderstatus, o_orderpriority, n, sum_cust,
      |  n + sum_cust AS combo, combo * 2 AS combo2
      |FROM (
      |  SELECT o_orderstatus, o_orderpriority,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(o_custkey % 97) AS BIGINT) AS sum_cust
      |  FROM g78_orders_$t GROUP BY ALL) g
      |ORDER BY ALL""".stripMargin)
  }

  val q78Sql: String =
    """SELECT o_orderstatus, o_orderpriority, n, sum_cust,
      |  n + sum_cust AS combo, combo * 2 AS combo2
      |FROM (
      |  SELECT o_orderstatus, o_orderpriority,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(o_custkey % 97) AS BIGINT) AS sum_cust
      |  FROM orders GROUP BY ALL) g
      |ORDER BY ALL""".stripMargin

  // ---------------------------------------------------------------- q79
  /** Iterative fixed-point PAGERANK in integer milli-arithmetic — the
    * canonical BSP-style iterative workload (Page et al. 1999; the
    * GraphX/Pregel reference computation) expressed as a driver loop of
    * declarative join+aggregate rounds, the missing iteration pattern
    * between q68's recursive CTE (monotone set growth) and d12's
    * pointer-doubling (idempotent min-propagation): here every round
    * REPLACES the full rank vector. Each iteration is one uniform
    * shuffle — edges join ranks on src (high-cardinality key, no skew
    * by contract of the hashed gate synthesis), contributions
    * `rank div outdeg` aggregate map-side per dst, and the damping
    * update `150 + (850·inflow) div 1000` is a narrow projection. The
    * rank frame stays distributed end-to-end: nothing driver-sized but
    * the loop counter, and K is fixed (not convergence-probed) so the
    * plan is exactly K exchanges. Integer milli-ranks make the
    * fixed-point oracle-restatable bit-for-bit: DuckDB replays the K
    * rounds as chained CTEs (aggregation is illegal in a recursive CTE
    * term, so the unroll IS the honest SQL restatement). Dangling-node
    * mass is dropped, not redistributed — both engines state the same
    * simplified damping. */
  /** In-row guard for the iterative loops: the analyzed plan must stay
    * CONSTANT-bounded regardless of the iteration count — if a loop
    * loses its lineage-truncation cadence, the plan grows linearly with
    * K (optimizer time, stage-retry recompute cost, executor cache
    * pressure at K=30 on a real graph; VERDICT r11) and this flips the
    * gate instead of rotting silently. */
  private def requireBoundedLineage(df: DataFrame, who: String,
      maxNodes: Int): Unit = {
    val n = df.queryExecution.logical.collect { case p => p }.size
    require(n <= maxNodes,
      s"$who: logical plan grew to $n nodes (> $maxNodes) — iterative " +
        "loop lost its lineage truncation cadence")
  }

  def pageRankMilli(edges: DataFrame, iters: Int): DataFrame = {
    // materialize the static frames ONCE: every round re-probes them,
    // and their source-scan lineage would otherwise re-enter (and
    // re-execute on any stage retry) each round's plan
    val e = Dedup.truncateLineage(edges.select(col("src"), col("dst")))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var rank = nodes.withColumn("rank_milli", lit(1000L))
    for (i <- 1 to iters) {
      val contrib = e
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_milli div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_milli"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150L) + expr("(850 * coalesce(in_milli, 0)) div 1000"))
            .as("rank_milli"))
      // checkpoint cadence: each round otherwise chains the previous
      // round's full plan — truncate every 4 rounds so plan size and
      // recompute depth stay O(1) in K, and assert it in-row
      if (i % 4 == 0 && i < iters) rank = Dedup.truncateLineage(rank)
      requireBoundedLineage(rank, s"pageRankMilli round $i", 150)
    }
    rank.orderBy("node")
  }

  /** Driver gate: a 60-node hashed digraph from lineitem, 3 rounds. */
  def q79PageRank(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d).where(col("l_orderkey") % 19 === 2)
      .select((col("l_partkey") % 60).cast("long").as("src"),
        ((col("l_partkey") * 7 + col("l_suppkey")) % 60).cast("long")
          .as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    pageRankMilli(e, iters = 3)
  }

  val q79Sql: String =
    """WITH e AS (
      |  SELECT DISTINCT l_partkey % 60 AS src,
      |    (l_partkey * 7 + l_suppkey) % 60 AS dst
      |  FROM lineitem WHERE l_orderkey % 19 = 2
      |    AND l_partkey % 60 <> (l_partkey * 7 + l_suppkey) % 60),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
      |r0 AS (SELECT node, 1000 AS rank_milli FROM n),
      |c1 AS (SELECT e.dst AS node, SUM(r0.rank_milli // dg.deg) AS im
      |  FROM e JOIN r0 ON e.src = r0.node JOIN dg ON e.src = dg.src
      |  GROUP BY e.dst),
      |r1 AS (SELECT n.node,
      |    150 + (850 * COALESCE(c1.im, 0)) // 1000 AS rank_milli
      |  FROM n LEFT JOIN c1 ON n.node = c1.node),
      |c2 AS (SELECT e.dst AS node, SUM(r1.rank_milli // dg.deg) AS im
      |  FROM e JOIN r1 ON e.src = r1.node JOIN dg ON e.src = dg.src
      |  GROUP BY e.dst),
      |r2 AS (SELECT n.node,
      |    150 + (850 * COALESCE(c2.im, 0)) // 1000 AS rank_milli
      |  FROM n LEFT JOIN c2 ON n.node = c2.node),
      |c3 AS (SELECT e.dst AS node, SUM(r2.rank_milli // dg.deg) AS im
      |  FROM e JOIN r2 ON e.src = r2.node JOIN dg ON e.src = dg.src
      |  GROUP BY e.dst),
      |r3 AS (SELECT n.node,
      |    150 + (850 * COALESCE(c3.im, 0)) // 1000 AS rank_milli
      |  FROM n LEFT JOIN c3 ON n.node = c3.node)
      |SELECT CAST(node AS BIGINT) AS node,
      |  CAST(rank_milli AS BIGINT) AS rank_milli
      |FROM r3 ORDER BY node""".stripMargin

  // ---------------------------------------------------------------- q94
  /** TIME-SERIES RESAMPLING with LINEAR INTERPOLATION — q91's LOCF
    * sibling and the other half of every resampling API (pandas
    * `resample().interpolate()`, Timescale `interpolate(time_bucket)`):
    * each user's irregular observations project onto the same 6-hour
    * grid, and a grid instant strictly between two observations gets the
    * linear blend, not the stale left value. Each consecutive
    * observation pair OWNS the half-open instant range [t0, t1) — every
    * grid point is emitted exactly once with no dedup pass — and the
    * final observation emits itself iff it lands on-grid (interpolation
    * invents nothing outside the observed span). The blend is exact
    * int64: values enter as milli-ints, and v0·(t1−g) + v1·(g−t0) is
    * bounded by max_v_milli·span_us ≈ 5e5·2.6e12 ≈ 1.3e18 per term —
    * two terms clear of 2⁶³ — so `div` (Spark) and `//` (DuckDB) agree
    * on the nonnegative quotient with no decimal widening needed.
    *
    * Scale shape: one user-keyed window (high-cardinality key) for the
    * LEAD pairing, then a narrow explode whose fan-out is span/period —
    * never corpus-sized; no join at all, unlike the as-of formulation,
    * because interpolation needs BOTH bracketing observations and the
    * pair row already carries them. */
  def q94InterpResample(s: SparkSession, d: String): DataFrame = {
    val P = 6L * 3600L * 1000000L
    // r17 (guide §2.4 "two operations keyed the same way can share one
    // exchange"): partition by user_id ONCE up front — hash partitioning
    // on a key subset satisfies both the (user_id, us) dedup aggregate's
    // and the user_id window's clustering, so the plan carries ONE
    // exchange before the orderBy instead of two ((user_id, us) then
    // user_id). The dedup key is near-unique so its partial aggregate
    // reduced nothing; measured 1.33 → 1.03 s at sf0.1.
    val obs = Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("us"),
        col("event_id"), col("value"))
      .repartition(col("user_id"))
      .groupBy(col("user_id"), col("us"))
      .agg(max(struct(col("event_id"), col("value"))).as("mx"))
      .select(col("user_id"), col("us"),
        expr("CAST(floor(mx.value * 1000) AS BIGINT)").as("v"))
    interpResample(obs, P).orderBy("user_id", "bucket")
  }

  /** LINEAR-INTERPOLATION RESAMPLE KERNEL — extracted from q94 (r13)
    * for the q115 fuzz gate, same contract: `obs` is one row per
    * (user_id, us LONG, v LONG milli-value); consecutive observation
    * pairs own the half-open instant range [t0, t1) so every grid point
    * emits exactly once, the final observation emits itself iff on-grid.
    * The blend widens to decimal(38,0): v_milli·Δus is ~1.3e18 on the
    * events corpus's 30-day spans but clears 2⁶³ once a series spans
    * ~29 years at 10⁶ milli-units — the t34 overflow class; the widened
    * product divides exactly (`div` ≡ DuckDB `//` on nonnegatives) and
    * casts back to BIGINT. */
  def interpResample(obs: DataFrame, period: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val pairs = obs
      .withColumn("us1", lead(col("us"), 1).over(w))
      .withColumn("v1", lead(col("v"), 1).over(w))
    val mid = pairs.where(col("us1").isNotNull)
      .withColumn("lo", expr(s"(us + ${period - 1}L) div ${period}L"))
      .withColumn("hi", expr(s"(us1 - 1L) div ${period}L"))
      // sequence(lo, hi) with lo > hi generates DESCENDING in Spark —
      // an empty-range pair must be dropped before the explode
      .where(col("lo") <= col("hi"))
      .select(col("user_id"), col("us"), col("v"), col("us1"), col("v1"),
        explode(expr("sequence(lo, hi)")).as("bucket"))
      .select(col("user_id"), col("bucket"),
        expr(s"CAST((CAST(v AS DECIMAL(38,0)) * (us1 - bucket * ${period}L)" +
          s" + CAST(v1 AS DECIMAL(38,0)) * (bucket * ${period}L - us))" +
          s" div (us1 - us) AS BIGINT)").as("interp_milli"))
    val last = pairs.where(col("us1").isNull && col("us") % period === 0)
      .select(col("user_id"), expr(s"us div ${period}L").as("bucket"),
        col("v").as("interp_milli"))
    mid.unionByName(last)
  }

  val q94Sql: String =
    """WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_id, value
      |  FROM events),
      |obs AS (SELECT user_id, us,
      |    CAST(floor(arg_max(value, event_id) * 1000) AS BIGINT) AS v
      |  FROM e GROUP BY user_id, us),
      |p AS (SELECT user_id, us, v,
      |    LEAD(us) OVER w AS us1, LEAD(v) OVER w AS v1
      |  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |mid AS (SELECT user_id,
      |    unnest(range((us + 21599999999) // 21600000000,
      |                 (us1 - 1) // 21600000000 + 1)) AS bucket,
      |    us, v, us1, v1
      |  FROM p WHERE us1 IS NOT NULL
      |    AND (us + 21599999999) // 21600000000
      |      <= (us1 - 1) // 21600000000),
      |mi AS (SELECT user_id, bucket,
      |    CAST((CAST(v AS HUGEINT) * (us1 - bucket * 21600000000)
      |     + CAST(v1 AS HUGEINT) * (bucket * 21600000000 - us))
      |     // (us1 - us) AS BIGINT) AS interp_milli
      |  FROM mid),
      |lastp AS (SELECT user_id, us // 21600000000 AS bucket,
      |    v AS interp_milli
      |  FROM p WHERE us1 IS NULL AND us % 21600000000 = 0)
      |SELECT user_id, CAST(bucket AS BIGINT) AS bucket,
      |  CAST(interp_milli AS BIGINT) AS interp_milli
      |FROM (SELECT * FROM mi UNION ALL SELECT * FROM lastp)
      |ORDER BY user_id, bucket""".stripMargin

  // ---------------------------------------------------------------- q95
  /** STAR-SCHEMA MULTI-JOIN (TPC-H Q5 shape) — six tables, the classic
    * join-order benchmark: lineitem⋈orders carries the fact mass,
    * customer/supplier/nation/region are dimensions, the local-supplier
    * predicate (c_nationkey = s_nationkey) correlates the two dim arms,
    * and revenue rolls up per nation. The plan is the one a 100 TB run
    * needs: region→nation prune FIRST (broadcast, cuts both arms to one
    * region before any fact shuffle), supplier/customer broadcast
    * against the facts, and only lineitem⋈orders shuffles — asserted by
    * requiring ≥3 BroadcastHashJoins in the executed plan so a silent
    * regression to shuffling a dimension fails the gate, not just the
    * stopwatch. Revenue is the exact-decimal sum (Det.dsum). */
  def q95StarJoin(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast(TimestampNTZType)
    val hi = lit("1998-01-01").cast(TimestampNTZType)
    val asia = Tables.region(s, d).where(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables.orders(s, d)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"))
    val r = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), netPrice.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("rev"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
    val plan = r.queryExecution.executedPlan.toString
    require("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "q95: dimension arms must broadcast, not shuffle")
    r
  }

  val q95Sql: String =
    s"""SELECT n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |  AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q96
  /** BFS SHORTEST HOP LEVELS — the third graph kernel after q79
    * (PageRank) and q92 (triangles): single-source unweighted shortest
    * paths by frontier expansion. Each round joins the CURRENT frontier
    * (shrinking) against the adjacency list (static, re-shuffled only on
    * its join key), anti-joins the visited set, and stops EARLY when the
    * frontier drains — the driver-side emptiness probe is a scalar
    * aggregate per round, the canonical Pregel-style control loop, never
    * a collect of vertex data. Levels are capped at `maxIter` so the
    * oracle's bounded recursive CTE explores the identical space.
    *
    * Scale shape: per round one uniform node-keyed join + one anti-join
    * + one min-aggregate; frontier and visited are node-sized, not
    * edge-sized. Each round's frontier is lineage-truncated (its plan
    * otherwise embeds the whole visited chain through the anti-join) and
    * visited checkpoints every 4 rounds, so plan size, stage-retry
    * recompute depth, and cache footprint are all O(1) in the round
    * count — asserted in-row via [[requireBoundedLineage]]. */
  def bfsLevels(edges: DataFrame, src: Long, maxIter: Int): DataFrame = {
    // the adjacency is probed once per round — persist it so the round
    // loop re-reads the deduped edge list, not the source scan's lineage
    val bi = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct().persist()
    val sess = edges.sparkSession
    import sess.implicits._
    var visited = Seq((src, 0L)).toDF("node", "lvl")
    var frontier = visited
    var it = 0
    while (it < maxIter && !frontier.isEmpty) {
      val next = frontier.join(bi, col("node") === col("u"))
        .select(col("v").as("node"), (col("lvl") + 1L).as("lvl"))
        .groupBy(col("node")).agg(min(col("lvl")).as("lvl"))
        .join(visited.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
      // truncate BOTH rolling frames: the frontier's plan embeds the
      // whole visited chain through the anti-join — merely persisting it
      // leaves QUADRATIC plan growth in rounds — and visited is a union
      // over every frontier. localCheckpoint materializes each round to
      // executor blocks (so this also replaces the old persist());
      // superseded rounds' blocks release via the ContextCleaner once
      // unreferenced, and reliable-checkpoint mode
      // (spark.graft.checkpointDir) covers executor loss on clusters
      // (VERDICT r11). The in-row bound asserts the cadence never rots.
      frontier = Dedup.truncateLineage(next)
      visited = visited.unionByName(frontier)
      if ((it + 1) % 4 == 0) visited = Dedup.truncateLineage(visited)
      requireBoundedLineage(visited, s"bfsLevels round ${it + 1}", 60)
      it += 1
    }
    bi.unpersist(blocking = false)
    visited.orderBy("node")
  }

  /** Driver gate: a 40-node sparse hashed graph; source 0, 6 rounds. */
  def q96BfsLevels(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d).where(col("l_orderkey") % 23 === 1)
      .select((col("l_partkey") % 40).cast("long").as("u"),
        ((col("l_partkey") * 3 + col("l_suppkey") * 5) % 40).cast("long")
          .as("v"))
    bfsLevels(e, src = 0L, maxIter = 6)
  }

  val q96Sql: String =
    """WITH RECURSIVE raw AS (
      |  SELECT l_partkey % 40 AS u,
      |    (l_partkey * 3 + l_suppkey * 5) % 40 AS v
      |  FROM lineitem WHERE l_orderkey % 23 = 1),
      |bi AS (SELECT DISTINCT u, v FROM (
      |  SELECT u, v FROM raw WHERE u <> v
      |  UNION ALL SELECT v, u FROM raw WHERE u <> v)),
      |r(node, lvl) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT bi.v, r.lvl + 1 FROM r JOIN bi ON bi.u = r.node
      |  WHERE r.lvl < 6)
      |SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl
      |FROM r GROUP BY node ORDER BY node""".stripMargin

  // ---------------------------------------------------------------- q97
  /** EXACT GLOBAL EQUI-DEPTH HISTOGRAM (NTILE without the global sort) —
    * the quantile-binning step feature pipelines run before bucketized
    * training, exact where q63's approx-quantile gate is sketched. A
    * global `ntile(B) OVER (ORDER BY …)` funnels the corpus through ONE
    * reducer; instead the total order (price_milli, id) splits two-level
    * exactly like t30's epoch shuffle: rows hash into VALUE RANGES
    * (price div 2²⁰ — domain-bounded, ~100 cells), per-range counts
    * prefix-sum on the range-cell frame (cell count ≈ domain/2²⁰, never
    * corpus-sized), the offsets broadcast back, and the global rank is
    * offset + within-range rank (a keyed window whose partitions are the
    * ranges — at 100 TB pick the range width so cells ≈ shuffle
    * partitions). NTILE's uneven-bucket arithmetic (first `total mod B`
    * buckets take one extra row) is then a pure rank expression, proved
    * against DuckDB's own NTILE. */
  /** The q97 kernel, parameterized and reusable (fuzzed by q113): exact
    * NTILE(`buckets`) over the total order (v, id) WITHOUT a global
    * sort. Rows hash into value ranges (`v div rangeWidth`), per-range
    * counts prefix-sum on the range-cell frame (cell count ≈
    * domain/rangeWidth, never corpus-sized), offsets broadcast back,
    * global rank = offset + within-range rank (a keyed window), and
    * NTILE's uneven-bucket arithmetic (the first `total mod B` buckets
    * take one extra row; `total < B` degrades to bucket = rank, SQL
    * NTILE's own rule) is a pure rank expression. Input columns: `v`
    * (the ordered value) and `id` (the tie-breaking total-order key);
    * output appends `bucket`. */
  def equidepthNtile(rows0: DataFrame, buckets: Long,
      rangeWidth: Long): DataFrame = {
    val inCols = rows0.columns.toSeq
    val rows = rows0.withColumn("rng", expr(s"v div ${rangeWidth}L"))
    val cells = rows.groupBy(col("rng")).agg(count(lit(1)).as("n"))
    val wc = Window.orderBy(col("rng"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cells
      .withColumn("off", coalesce(sum(col("n")).over(wc), lit(0L)))
      .select(col("rng"), col("off"))
    val tot = rows.agg(count(lit(1)).as("total"))
    val wr = Window.partitionBy(col("rng"))
      .orderBy(col("v"), col("id"))
    rows
      .withColumn("lr", row_number().over(wr).cast("long"))
      .join(broadcast(offsets), Seq("rng"))
      .withColumn("rk", col("off") + col("lr"))
      .crossJoin(broadcast(tot))
      .withColumn("q", expr(s"total div ${buckets}L"))
      .withColumn("rem", expr(s"total % ${buckets}L"))
      .withColumn("bucket",
        when(col("rk") <= col("rem") * (col("q") + 1),
          expr("(rk - 1) div (q + 1) + 1"))
          .otherwise(expr("rem + (rk - rem * (q + 1) - 1) div q + 1")))
      .select((inCols.map(col) :+ col("bucket")): _*)
  }

  def q97EquidepthHist(s: SparkSession, d: String): DataFrame = {
    val rows = Tables.lineitem(s, d)
      .select(expr("CAST(floor(l_extendedprice * 1000) AS BIGINT)")
          .as("v"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
    equidepthNtile(rows, buckets = 8L, rangeWidth = 1048576L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo_milli"),
        max(col("v")).as("hi_milli"))
      .orderBy("bucket")
  }

  val q97Sql: String =
    """WITH r AS (SELECT
      |    CAST(floor(l_extendedprice * 1000) AS BIGINT) AS pm,
      |    l_orderkey * 10 + l_linenumber AS id
      |  FROM lineitem),
      |nt AS (SELECT pm,
      |    CAST(NTILE(8) OVER (ORDER BY pm, id) AS BIGINT) AS bucket
      |  FROM r)
      |SELECT bucket, COUNT(*) AS n, MIN(pm) AS lo_milli,
      |  MAX(pm) AS hi_milli
      |FROM nt GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q98
  /** TIME-WEIGHTED AVERAGE — the aggregate a metrics store computes when
    * observations are irregular (Timescale `time_weight('LOCF', …)`):
    * each observation's value holds until the next one, so the mean
    * weights each value by its holding duration, not by 1/n. Same-ts
    * duplicates collapse first (max event_id wins, q91's rule); the
    * per-segment product v_milli·Δus stays in int64 (≤ 5e5 · 2.6e12 ≈
    * 1.3e18, and the per-user SUM is bounded by max_v·span — the same
    * bound, not n times it). Users with a single distinct instant have
    * no holding span and are excluded (span 0 would divide by zero in
    * both engines rather than disagree).
    *
    * Scale shape: one user-keyed aggregate for the dedup, one user-keyed
    * LEAD window, one user-keyed sum — all on the same high-cardinality
    * key, so AQE coalesces them onto one exchange. */
  def q98TimeWeightedAvg(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    Tables.events(s, d)
      .select(col("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("us"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"), col("us"))
      .agg(max(struct(col("event_id"), col("value"))).as("mx"))
      .select(col("user_id"), col("us"),
        expr("CAST(floor(mx.value * 1000) AS BIGINT)").as("v"))
      .withColumn("us1", lead(col("us"), 1).over(w))
      .where(col("us1").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("us1") - col("us")).as("span_us"),
        // decimal(38,0) accumulation (q94's rule): per-segment
        // v_milli·Δus and their sum clear int64 only below ~29-year
        // spans; the widened sum divides exactly back to milli
        sum(col("v").cast("decimal(38,0)") * (col("us1") - col("us")))
          .as("vt"))
      .select(col("user_id"), col("n_segments"), col("span_us"),
        expr("CAST(vt div span_us AS BIGINT)").as("twa_milli"))
      .orderBy("user_id")
  }

  val q98Sql: String =
    """WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_id, value
      |  FROM events),
      |obs AS (SELECT user_id, us,
      |    CAST(floor(arg_max(value, event_id) * 1000) AS BIGINT) AS v
      |  FROM e GROUP BY user_id, us),
      |p AS (SELECT user_id, us, v, LEAD(us) OVER (
      |    PARTITION BY user_id ORDER BY us) AS us1
      |  FROM obs)
      |SELECT user_id, COUNT(*) AS n_segments,
      |  CAST(SUM(us1 - us) AS BIGINT) AS span_us,
      |  CAST(SUM(CAST(v AS HUGEINT) * (us1 - us)) // SUM(us1 - us)
      |    AS BIGINT) AS twa_milli
      |FROM p WHERE us1 IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** MAP-TYPE FUNCTION KERNEL — the map-column family (q57 covered
    * arrays, q65 VARIANT): per user, event-type→count and
    * event-type→value maps built with `map_from_entries` over pre-
    * aggregated entries (unique keys by construction), combined with
    * `map_zip_with` (integer per-type average), pruned with
    * `map_filter`, rewritten with `transform_values`, keys probed with
    * `element_at`, and exploded back to rows with `map_entries` so
    * every value is oracle-checkable. Collection order inside
    * collect_list is nondeterministic — maps erase it, and the explode
    * is re-sorted, so the output is deterministic anyway.
    *
    * Scale shape: one uniform (user, type) pre-aggregate (map-side
    * combinable), one user-keyed gather whose per-user state is
    * bounded by the TYPE DOMAIN (5 entries), then narrow map ops. */
  def q99MapKernel(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(floor(value * 1000) AS BIGINT)")).as("vm"))
    per.groupBy(col("user_id"))
      .agg(
        map_from_entries(collect_list(
          struct(col("event_type"), col("cnt")))).as("m_cnt"),
        map_from_entries(collect_list(
          struct(col("event_type"), col("vm")))).as("m_val"))
      .withColumn("m_avg",
        expr("map_zip_with(m_cnt, m_val, (k, c, v) -> v div c)"))
      .withColumn("m_hot",
        expr("map_filter(m_avg, (k, v) -> v >= 50000)"))
      .withColumn("m_excess",
        expr("transform_values(m_hot, (k, v) -> v - 50000)"))
      .select(col("user_id"), col("m_cnt"), col("m_hot"),
        explode(expr("map_entries(m_excess)")).as("e"))
      .select(col("user_id"), col("e.key").as("event_type"),
        expr("element_at(m_cnt, e.key)").as("cnt"),
        expr("element_at(m_hot, e.key)").as("avg_milli"),
        col("e.value").as("excess_milli"))
      .orderBy("user_id", "event_type")
  }

  val q99Sql: String =
    """WITH per AS (SELECT user_id, event_type, COUNT(*) AS cnt,
      |    SUM(CAST(floor(value * 1000) AS BIGINT)) AS vm
      |  FROM events GROUP BY user_id, event_type),
      |a AS (SELECT user_id, event_type, cnt, vm // cnt AS avg_milli
      |  FROM per)
      |SELECT user_id, event_type, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(avg_milli AS BIGINT) AS avg_milli,
      |  CAST(avg_milli - 50000 AS BIGINT) AS excess_milli
      |FROM a WHERE avg_milli >= 50000
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- q100
  /** NAVIGATION-WINDOW KERNEL — the window functions q53 (rank-family)
    * and q49 (range frames) do not cover: `nth_value` under an
    * EXPLICIT unbounded ROWS frame (its default frame stops at the
    * current row — the classic silent-wrong-answer; both engines get
    * the explicit frame), `lag` with a non-null default, `lead` at
    * offset 3, `first_value` with IGNORE NULLS over a planted-null
    * column, and a trailing 3-row count. All values integer; the
    * partition key (l_suppkey) is high-cardinality so no reducer sees
    * more than one supplier's rows.
    *
    * Scale shape: ONE exchange on the partition key serves all six
    * functions (same window spec family — Spark collapses them into
    * one Window operator; the plan has a single sort). */
  def q100WindowKernel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("pm").asc, col("id").asc)
    val wFull = w.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wTrail = w.rowsBetween(-2, 0)
    Tables.lineitem(s, d).where(col("l_suppkey") % 40 === 3)
      .select(col("l_suppkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        expr("CAST(floor(l_extendedprice * 1000) AS BIGINT)").as("pm"),
        // planted nulls: every 3rd row's quantity is unknown
        when(col("l_orderkey") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("l_quantity").cast("long")).as("qn"))
      .select(col("l_suppkey"), col("id"),
        nth_value(col("pm"), 2).over(wFull).as("second_lowest"),
        lag(col("pm"), 2, -1L).over(w).as("lag2_or_neg1"),
        lead(col("pm"), 3).over(w).as("lead3"),
        first(col("qn"), ignoreNulls = true).over(wFull)
          .as("first_known_qty"),
        count(lit(1)).over(wTrail).as("trailing3"))
      .orderBy("l_suppkey", "id")
  }

  val q100Sql: String =
    """WITH r AS (SELECT l_suppkey,
      |    l_orderkey * 10 + l_linenumber AS id,
      |    CAST(floor(l_extendedprice * 1000) AS BIGINT) AS pm,
      |    CASE WHEN l_orderkey % 3 = 0 THEN NULL
      |      ELSE CAST(l_quantity AS BIGINT) END AS qn
      |  FROM lineitem WHERE l_suppkey % 40 = 3)
      |SELECT l_suppkey, id,
      |  nth_value(pm, 2) OVER (PARTITION BY l_suppkey
      |    ORDER BY pm, id ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS second_lowest,
      |  lag(pm, 2, -1) OVER w AS lag2_or_neg1,
      |  lead(pm, 3) OVER w AS lead3,
      |  first_value(qn IGNORE NULLS) OVER (PARTITION BY l_suppkey
      |    ORDER BY pm, id ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND UNBOUNDED FOLLOWING) AS first_known_qty,
      |  CAST(COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY pm, id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS trailing3
      |FROM r
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY pm, id)
      |ORDER BY l_suppkey, id""".stripMargin

  // ---------------------------------------------------------------- q101
  /** PROBABILITY-CALIBRATION RELIABILITY TABLE — the eval every scored
    * pipeline (ML quality filters, risk models) publishes before its
    * scores are trusted as probabilities: decile-bin the predicted
    * score, compare the bin's mean prediction against its empirical
    * positive rate; a calibrated model hugs the diagonal, and the
    * per-bin |gap| is the reliability term of the Brier decomposition.
    * Deterministic synthetic scores: a monotone rescale of `value`
    * predicts, and the label fires when a uniform event-keyed hash
    * lands under the value — P(label | value) rises linearly with the
    * score, so the curve is genuinely increasing and the gaps are
    * data, not noise. Everything integer (permille / milli).
    *
    * Scale shape: one narrow scan, ONE 10-row hash aggregate with
    * map-side combine — a map-only stage at any corpus size. */
  def q101CalibrationEval(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      .withColumn("score_permille", expr("(vm * 999) div 490020"))
      .withColumn("label",
        (conv(substring(md5(concat(col("event_id"), lit("cal"))), 1, 8),
          16, 10).cast("long") % 490020L < col("vm")).cast("long"))
      .withColumn("bin", expr("score_permille div 100"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("score_permille")).as("sp"),
        sum(col("label")).as("pos"))
      .select(col("bin"), col("n"),
        expr("sp div n").as("avg_score_permille"),
        expr("(1000 * pos) div n").as("rate_permille"),
        expr("abs(sp div n - (1000 * pos) div n)").as("gap_milli"))
      .orderBy("bin")

  val q101Sql: String =
    """WITH e AS (SELECT event_id,
      |    CAST(floor(value * 1000) AS BIGINT) AS vm
      |  FROM events),
      |s AS (SELECT event_id, vm, (vm * 999) // 490020 AS sp,
      |    CASE WHEN CAST(concat('0x', substring(
      |        md5(CAST(event_id AS VARCHAR) || 'cal'), 1, 8))
      |        AS BIGINT) % 490020 < vm
      |      THEN 1 ELSE 0 END AS label
      |  FROM e),
      |b AS (SELECT sp // 100 AS bin, COUNT(*) AS n, SUM(sp) AS spt,
      |    SUM(label) AS pos
      |  FROM s GROUP BY sp // 100)
      |SELECT CAST(bin AS BIGINT) AS bin, n,
      |  CAST(spt // n AS BIGINT) AS avg_score_permille,
      |  CAST((1000 * pos) // n AS BIGINT) AS rate_permille,
      |  CAST(abs(spt // n - (1000 * pos) // n) AS BIGINT) AS gap_milli
      |FROM b ORDER BY bin""".stripMargin

  // ---------------------------------------------------------------- q102
  /** LAST-TOUCH ATTRIBUTION — the marketing-analytics consumer of the
    * as-of machinery (q17/q27/q80): every purchase attributes its
    * revenue to the user's LATEST preceding click/view within a 24 h
    * lookback, or to 'none' when the window is empty. This is exactly
    * a backward as-of join with tolerance, served by the engine's own
    * `AsOfJoinExec` (plan-pinned) — one co-partitioned sort-merge
    * cursor, never a per-purchase probe; same-instant touches collapse
    * deterministically first (max event_id, q91's rule). Revenue in
    * exact milli.
    *
    * Scale shape: both sides shuffle once on user_id; the attribution
    * rollup is a 3-row aggregate. */
  def q102Attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts").cast(TimestampType)).as("us"),
      col("event_id"), col("event_type"),
      expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"), col("vm"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .groupBy(col("user_id").as("t_user"), col("us").as("t_us"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("mx"))
      .select(col("t_user"), col("t_us"),
        col("mx.event_type").as("channel"))
    val joined = graft.plans.AsOf.join(purchases, touches,
      "user_id", "t_user", "us", "t_us",
      direction = "backward", tolerance = 24L * 3600L * 1000000L)
    require(joined.queryExecution.executedPlan.toString
        .contains("AsOfJoin"),
      "q102: attribution must run on the custom AsOfJoinExec")
    joined
      .withColumn("channel", coalesce(col("channel"), lit("none")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("vm")).as("revenue_milli"))
      .orderBy("channel")
  }

  val q102Sql: String =
    """WITH e AS (SELECT user_id, EPOCH_US(ts) AS us, event_id,
      |    event_type, CAST(floor(value * 1000) AS BIGINT) AS vm
      |  FROM events),
      |p AS (SELECT user_id, us, event_id, vm FROM e
      |  WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, us,
      |    arg_max(event_type, event_id) AS channel
      |  FROM e WHERE event_type IN ('click', 'view')
      |  GROUP BY user_id, us),
      |j AS (SELECT p.user_id, p.us, p.event_id, p.vm, t.channel,
      |    ROW_NUMBER() OVER (PARTITION BY p.user_id, p.us, p.event_id
      |      ORDER BY t.us DESC) AS rn
      |  FROM p LEFT JOIN t
      |    ON t.user_id = p.user_id AND t.us <= p.us
      |    AND p.us - t.us <= 86400000000)
      |SELECT COALESCE(channel, 'none') AS channel,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(vm) AS BIGINT) AS revenue_milli
      |FROM j WHERE rn = 1
      |GROUP BY COALESCE(channel, 'none') ORDER BY channel""".stripMargin

  // ---------------------------------------------------------------- q103
  /** JSON-LINES ROUNDTRIP — the third interchange format after parquet
    * (everywhere) and ORC (q56): the documents slice writes as JSONL
    * and reads back with an EXPLICIT schema (schema inference is a
    * whole extra pass over 100 TB — the gate reads with the schema a
    * catalog would supply), then proves content parity down to an md5
    * checksum of the text bodies, so a quoting/escaping bug in either
    * direction flips the row. Column pruning is asserted off the
    * executed plan: a JSON scan that parses all five fields for a
    * two-column aggregate is wrong (Spark prunes fields inside
    * JacksonParser). */
  def q103JsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val dir = s"${HadoopIO.scratchDir(s)}/graft_q103_$tag"
    Tables.documents(s, d).write.mode("overwrite").json(dir)
    val schema = "doc_id BIGINT, text STRING, lang STRING, " +
      "source STRING, n_chars BIGINT"
    val back = s.read.schema(schema).json(dir)
      .select(col("doc_id"), col("text"))
    val pruned = !back.queryExecution.executedPlan.toString
      .contains("n_chars")
    back.agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("id_checksum"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        count_distinct(md5(encode(col("text"), "UTF-8")))
          .as("distinct_texts"))
      .select(col("n_docs"), col("id_checksum"), col("total_chars"),
        col("distinct_texts"), lit(pruned).as("pruned_ok"))
  }

  val q103Sql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
      |  true AS pruned_ok
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q104
  /** CSV ROUNDTRIP UNDER ADVERSARIAL QUOTING — the delimited format's
    * failure modes are all in the quoting, so the gate MANUFACTURES
    * them: each row carries a field containing commas, double quotes,
    * and an embedded NEWLINE (built deterministically from the text),
    * writes with header + quoting, and reads back with an explicit
    * schema and `multiLine` (a record-per-line reader would shred the
    * embedded newlines into phantom rows — the classic CSV corruption).
    * Parity is proved by count + an md5 checksum over the tricky field,
    * restated by the oracle from the same construction rule.
    *
    * Scale note: multiLine CSV cannot split inside files (quote state
    * is not synchronizable mid-stream) — the write keeps many files so
    * read parallelism comes from file count, the layout contract a
    * 100 TB CSV estate actually uses. */
  def q104CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val dir = s"${HadoopIO.scratchDir(s)}/graft_q104_$tag"
    val tricky = concat(lit("a,\"q\"\n"),
      substring(col("text"), 1, 20), lit(","),
      col("lang"))
    Tables.documents(s, d)
      .select(col("doc_id"), tricky.as("payload"), col("n_chars"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = s.read
      .schema("doc_id BIGINT, payload STRING, n_chars BIGINT")
      .option("header", "true").option("multiLine", "true").csv(dir)
    back.agg(count(lit(1)).as("n_rows"),
        sum(col("doc_id")).as("id_checksum"),
        count_distinct(md5(encode(col("payload"), "UTF-8")))
          .as("distinct_payloads"),
        sum(col("n_chars")).as("chars_checksum"))
      .orderBy("n_rows")
  }

  val q104Sql: String =
    """WITH t AS (SELECT doc_id,
      |    'a,"q"' || chr(10) || substring(text, 1, 20) || ',' || lang
      |      AS payload,
      |    n_chars
      |  FROM documents)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
      |  CAST(COUNT(DISTINCT md5(payload)) AS BIGINT) AS distinct_payloads,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_checksum
      |FROM t""".stripMargin

  // ---------------------------------------------------------------- q105
  /** LATE-DATA ACCOUNTING GATE — the watermark semantics q35–q41 rely
    * on, pinned VALUE-level: a windowed streaming aggregation runs in
    * two checkpointed phases (q55's restart discipline); phase 1
    * ingests the on-time first half, phase 2 ingests the second half
    * PLUS replayed copies of day-1/2 events under fresh ids — rows
    * provably below the watermark the first phase established. Append
    * mode must (a) DROP every replay (their windows are finalized or
    * behind the watermark), (b) carry the still-open windows' state
    * across the restart, and (c) emit exactly the windows whose end
    * the final watermark passed. The oracle restates all three rules
    * arithmetically from the ORIGINAL events — per-window counts AND
    * id checksums, so one leaked replay (its ids are offset by 2·10⁹)
    * flips a value, not just a boolean.
    *
    * Scale shape: the production late-data pattern verbatim — state
    * bounded by open windows × keys, eviction driven by the watermark,
    * exactly-once through the checkpointed file source/sink pair. */
  def q105LateDataGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    import org.apache.spark.sql.streaming.Trigger
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val conf = s.sparkContext.hadoopConfiguration
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q105_$tag"
    HadoopIO.delete(root, conf)
    val (inDir, outDir, ck) = (s"$root/in", s"$root/out", s"$root/ck")
    val ev = Tables.events(s2, d)
      .select(col("event_id"), col("ts").cast(TimestampType).as("ts"))
    val cut = lit("2024-01-16").cast(TimestampType)
    def runOnce(): Unit = {
      val q = s2.readStream
        .schema("event_id BIGINT, ts TIMESTAMP").parquet(inDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("event_id")).as("id_checksum"))
        .select(col("w.start").as("win_start"), col("n_events"),
          col("id_checksum"))
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ev.where(col("ts") < cut).write.mode("append").parquet(inDir)
    runOnce()
    val late = ev.where(col("ts") < lit("2024-01-03").cast(TimestampType))
      .select((col("event_id") + 2000000000L).as("event_id"), col("ts"))
    ev.where(col("ts") >= cut).unionByName(late)
      .write.mode("append").parquet(inDir)
    runOnce()
    s2.read.parquet(outDir)
      .select(unix_micros(col("win_start")).as("win_start_us"),
        col("n_events"), col("id_checksum"))
      .orderBy("win_start_us")
  }

  /** The three rules restated: only original (non-replay) events
    * count, grouped into UTC day windows, keeping windows whose END is
    * at or before the final watermark max(ts) − 1 h. */
  val q105Sql: String =
    """WITH e AS (SELECT event_id, ts FROM events),
      |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm2 FROM e),
      |w AS (SELECT date_trunc('day', ts) AS ws, event_id FROM e)
      |SELECT EPOCH_US(ws) AS win_start_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(event_id) AS BIGINT) AS id_checksum
      |FROM w CROSS JOIN wm
      |WHERE ws + INTERVAL 1 DAY <= wm.wm2
      |GROUP BY ws ORDER BY win_start_us""".stripMargin

  // ---------------------------------------------------------------- q107
  /** STREAMING STATE-EVOLUTION GATE — q105 restarts the SAME query on
    * its checkpoint; real pipelines restart CHANGED queries on old
    * checkpoints. Phase 1 runs a windowed count over the first half of
    * the events and commits its state. The query is then EVOLVED (an
    * added `sum` aggregate — a state value-schema change) and restarted
    * against the same checkpoint: the contract pinned here is that this
    * either migrates state cleanly or FAILS LOUDLY — never silently
    * wrong numbers. Spark's state-store schema compatibility check
    * raises on the widened value row; the gate records that loudness as
    * a VALUE (`evolution_was_loud` — if a future engine version starts
    * migrating silently, the hash flips and the contract gets
    * re-examined), then performs the documented recovery: rerun the
    * evolved query on a FRESH checkpoint, reprocessing the full input.
    * The recovery output is value-checked per window — counts AND id
    * checksums under the final-watermark rule.
    *
    * Scale shape: recovery-by-reprocess is the standard answer to
    * incompatible state evolution; state stays bounded by open windows,
    * and the checkpointed file source replays exactly-once. */
  def q107StateEvolutionGate(s: SparkSession, d: String): DataFrame = {
    import graft.sources.HadoopIO
    import org.apache.spark.sql.streaming.Trigger
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    val conf = s.sparkContext.hadoopConfiguration
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val root = s"${HadoopIO.scratchDir(s)}/graft_q107_$tag"
    HadoopIO.delete(root, conf)
    val inDir = s"$root/in"
    val ev = Tables.events(s2, d)
      .select(col("event_id"), col("ts").cast(TimestampType).as("ts"))
    val cut = lit("2024-01-16").cast(TimestampType)
    def run(evolved: Boolean, out: String, ck: String): Unit = {
      val grouped = s2.readStream
        .schema("event_id BIGINT, ts TIMESTAMP").parquet(inDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day").as("w"))
      val agged =
        if (evolved) grouped.agg(count(lit(1)).as("n_events"),
            sum(col("event_id")).as("id_checksum"))
          .select(col("w.start").as("win_start"), col("n_events"),
            col("id_checksum"))
        else grouped.agg(count(lit(1)).as("n_events"))
          .select(col("w.start").as("win_start"), col("n_events"))
      val q = agged.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    ev.where(col("ts") < cut).write.mode("append").parquet(inDir)
    run(evolved = false, s"$root/out1", s"$root/ck")
    ev.where(col("ts") >= cut).write.mode("append").parquet(inDir)
    // restart the CHANGED query against the OLD checkpoint + sink
    val loud =
      try { run(evolved = true, s"$root/out1", s"$root/ck"); false }
      catch { case _: Throwable => true }
    // documented recovery: fresh checkpoint, full reprocess
    run(evolved = true, s"$root/out2", s"$root/ck2")
    s2.read.parquet(s"$root/out2")
      .select(unix_micros(col("win_start")).as("win_start_us"),
        col("n_events"), col("id_checksum"),
        lit(loud).as("evolution_was_loud"))
      .orderBy("win_start_us")
  }

  /** Recovery output restated: full-input per-window counts and
    * checksums for windows the final watermark closed; the loudness
    * contract as a pinned literal. */
  val q107Sql: String =
    """WITH e AS (SELECT event_id, ts FROM events),
      |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm2 FROM e),
      |w AS (SELECT date_trunc('day', ts) AS ws, event_id FROM e)
      |SELECT EPOCH_US(ws) AS win_start_us,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(event_id) AS BIGINT) AS id_checksum,
      |  true AS evolution_was_loud
      |FROM w CROSS JOIN wm
      |WHERE ws + INTERVAL 1 DAY <= wm.wm2
      |GROUP BY ws ORDER BY win_start_us""".stripMargin

  // ---------------------------------------------------------------- q108
  /** DEEP-ITERATION PAGERANK — q79's kernel at K=12, the round count at
    * which an untruncated loop's linear plan growth becomes visible
    * (VERDICT r11): [[pageRankMilli]] checkpoints every 4 rounds and
    * asserts a CONSTANT plan-size bound in-row, so this gate fails if
    * the cadence is ever removed. The oracle is the honest 12-round CTE
    * unroll (aggregation is illegal in a recursive CTE term). */
  def q108DeepPageRank(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d).where(col("l_orderkey") % 19 === 2)
      .select((col("l_partkey") % 60).cast("long").as("src"),
        ((col("l_partkey") * 7 + col("l_suppkey")) % 60).cast("long")
          .as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    pageRankMilli(e, iters = 12)
  }

  val q108Sql: String = {
    val rounds = (1 to 12).map { i =>
      s"""c$i AS (SELECT e.dst AS node, SUM(r${i - 1}.rank_milli // dg.deg) AS im
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |  JOIN dg ON e.src = dg.src
         |  GROUP BY e.dst),
         |r$i AS (SELECT n.node,
         |    150 + (850 * COALESCE(c$i.im, 0)) // 1000 AS rank_milli
         |  FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT l_partkey % 60 AS src,
       |    (l_partkey * 7 + l_suppkey) % 60 AS dst
       |  FROM lineitem WHERE l_orderkey % 19 = 2
       |    AND l_partkey % 60 <> (l_partkey * 7 + l_suppkey) % 60),
       |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |dg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT node, 1000 AS rank_milli FROM n),
       |$rounds
       |SELECT CAST(node AS BIGINT) AS node,
       |  CAST(rank_milli AS BIGINT) AS rank_milli
       |FROM r12 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q109
  /** DEEP-ITERATION BFS — q96's kernel on a PATH graph (0—1—…—39, so
    * diameter 39 ≫ the round count) at maxIter=12: every round expands
    * the frontier by exactly one node, exercising 12 full rounds of the
    * persist/unpersist + truncation cadence with no early drain. Nodes
    * beyond distance 12 stay unvisited — the oracle's recursive CTE is
    * bounded to the identical search space. */
  def q109DeepBfs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d).where(col("l_orderkey") % 29 === 3)
      .select((col("l_partkey") % 39).cast("long").as("u"))
      .withColumn("v", col("u") + 1L)
    bfsLevels(e, src = 0L, maxIter = 12)
  }

  val q109Sql: String =
    """WITH RECURSIVE raw AS (
      |  SELECT DISTINCT l_partkey % 39 AS u, l_partkey % 39 + 1 AS v
      |  FROM lineitem WHERE l_orderkey % 29 = 3),
      |bi AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),
      |r(node, lvl) AS (
      |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION
      |  SELECT bi.v, r.lvl + 1 FROM r JOIN bi ON bi.u = r.node
      |  WHERE r.lvl < 12)
      |SELECT node, CAST(MIN(lvl) AS BIGINT) AS lvl
      |FROM r GROUP BY node ORDER BY node""".stripMargin

  // ---------------------------------------------------------------- wiring
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project"  -> (q02FilterProject _),
    "q03_inner_join_agg"  -> (q03InnerJoinAgg _),
    "q04_semi_join"       -> (q04SemiJoin _),
    "q05_anti_join"       -> (q05AntiJoin _),
    "q06_broadcast_dims"  -> (q06BroadcastDims _),
    "q07_union_stats"     -> (q07UnionStats _),
    "q08_zscore"          -> (q08Zscore _),
    "q09_collect_sorted"  -> (q09CollectSorted _),
    "q10_distinct"        -> (q10Distinct _),
    "q11_window_rank"     -> (q11WindowRank _),
    "q12_topk"            -> (q12TopK _),
    "q13_rollup"          -> (q13Rollup _),
    "q14_scalar_funcs"    -> (q14ScalarFuncs _),
    "q15_hourly_events"   -> (q15HourlyEvents _),
    "q16_range_join"      -> (q16RangeJoin _),
    "q17_asof_join"       -> (q17AsofJoin _),
    "q18_set_ops"         -> (q18SetOps _),
    "q19_conditional_agg" -> (q19ConditionalAgg _),
    "q20_json_extract"    -> (q20JsonExtract _),
    "q21_sessionize"      -> (q21Sessionize _),
    "q22_full_outer_join" -> (q22FullOuterJoin _),
    "q23_percentiles"     -> (q23Percentiles _),
    "q24_cube"            -> (q24Cube _),
    "q25_above_avg"       -> (q25AboveAvg _),
    "q26_distinct_agg"    -> (q26DistinctAgg _),
    "q27_asof_custom"     -> (q27AsofCustom _),
    "q28_topk_agg"        -> (q28TopkAgg _),
    "q29_sliding_window"  -> (q29SlidingWindow _),
    "q30_first_last"      -> (q30FirstLast _),
    "q31_salted_skew_join" -> (q31SaltedSkewJoin _),
    "q32_approx_distinct" -> (q32ApproxDistinct _),
    "q33_pivot"           -> (q33Pivot _),
    "q34_adversarial_skew_join" -> (q34AdversarialSkewJoin _),
    "q35_stream_batch_gate" -> (q35StreamBatchGate _),
    "q36_stream_dedup_gate" -> (q36StreamDedupGate _),
    "q37_stream_session_gate" -> (q37StreamSessionGate _),
    "q38_stream_join_gate" -> (q38StreamJoinGate _),
    "q39_stream_state_gate" -> (q39StreamStateGate _),
    "q40_stream_outer_join_gate" -> (q40StreamOuterJoinGate _),
    "q41_stream_wm_dedup_gate" -> (q41StreamWmDedupGate _),
    "q42_observe_metrics" -> (q42ObserveMetrics _),
    "q43_dpp_gate" -> (q43DppGate _),
    "q44_bucketed_join_gate" -> (q44BucketedJoinGate _),
    "q45_aqe_skew_gate" -> (q45AqeSkewGate _),
    "q46_stream_exactly_once_gate" -> (q46StreamExactlyOnceGate _),
    "q47_runtime_bloom_gate" -> (q47RuntimeBloomGate _),
    "q48_grouping_sets"   -> (q48GroupingSets _),
    "q49_range_frame"     -> (q49RangeFrame _),
    "q50_correlated_subquery" -> (q50CorrelatedSubquery _),
    "q51_reused_exchange_gate" -> (q51ReusedExchangeGate _),
    "q52_binned_interval_join" -> (q52BinnedIntervalJoin _),
    "q53_window_distribution" -> (q53WindowDistribution _),
    "q54_datetime_kernel" -> (q54DatetimeKernel _),
    "q55_incremental_resume_gate" -> (q55IncrementalResumeGate _),
    "q56_orc_roundtrip" -> (q56OrcRoundtrip _),
    "q57_array_kernel" -> (q57ArrayKernel _),
    "q58_null_semantics" -> (q58NullSemantics _),
    "q59_string_kernel" -> (q59StringKernel _),
    "q60_regex_kernel" -> (q60RegexKernel _),
    "q61_bitwise_kernel" -> (q61BitwiseKernel _),
    "q62_null_aware_anti_join" -> (q62NullAwareAntiJoin _),
    "q63_approx_quantile_gate" -> (q63ApproxQuantileGate _),
    "q64_outer_join_kernel" -> (q64OuterJoinKernel _),
    "q65_variant_kernel" -> (q65VariantKernel _),
    "q66_transform_with_state_gate" -> (q66TransformWithStateGate _),
    "q67_lateral_topn" -> (q67LateralTopN _),
    "q68_recursive_cte" -> (q68RecursiveCte _),
    "q69_pipe_syntax" -> (q69PipeSyntax _),
    "q70_stats_kernel" -> (q70StatsKernel _),
    "q71_collation_kernel" -> (q71CollationKernel _),
    "q72_sql_udf" -> (q72SqlUdf _),
    "q73_compaction_gate" -> (q73CompactionGate _),
    "q74_schema_evolution_gate" -> (q74SchemaEvolution _),
    "q75_unpivot" -> (q75Unpivot _),
    "q76_merge_upsert" -> (q76MergeUpsert _),
    "q77_scd2" -> (q77Scd2 _),
    "q78_group_by_all" -> (q78GroupByAll _),
    "q79_pagerank"     -> (q79PageRank _),
    "q80_asof_directions" -> (q80AsofDirections _),
    "q81_heavy_hitters_gate" -> (q81HeavyHittersGate _),
    "q82_stream_heavy_hitters_gate" -> (q82StreamHeavyHittersGate _),
    "q83_partition_prune_gate" -> (q83PartitionPruneGate _),
    "q84_ivm_gate" -> (q84IvmGate _),
    "q85_retention_cohorts" -> (q85RetentionCohorts _),
    "q86_countmin_gate" -> (q86CountMinGate _),
    "q87_kmv_sketch" -> (q87KmvSketch _),
    "q88_zorder_gate" -> (q88ZorderGate _),
    "q89_funnel" -> (q89Funnel _),
    "q90_kmv_setops" -> (q90KmvSetOps _),
    "q91_locf_resample" -> (q91LocfResample _),
    "q92_triangles" -> (q92Triangles _),
    "q93_time_travel_gate" -> (q93TimeTravelGate _),
    "q94_interp_resample" -> (q94InterpResample _),
    "q95_star_join" -> (q95StarJoin _),
    "q96_bfs_levels" -> (q96BfsLevels _),
    "q97_equidepth_hist" -> (q97EquidepthHist _),
    "q98_time_weighted_avg" -> (q98TimeWeightedAvg _),
    "q99_map_kernel" -> (q99MapKernel _),
    "q100_window_kernel" -> (q100WindowKernel _),
    "q101_calibration_eval" -> (q101CalibrationEval _),
    "q102_attribution" -> (q102Attribution _),
    "q103_jsonl_roundtrip" -> (q103JsonlRoundtrip _),
    "q104_csv_roundtrip" -> (q104CsvRoundtrip _),
    "q105_late_data_gate" -> (q105LateDataGate _),
    "q107_state_evolution_gate" -> (q107StateEvolutionGate _),
    "q108_deep_pagerank_gate" -> (q108DeepPageRank _),
    "q109_deep_bfs_gate"  -> (q109DeepBfs _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project"  -> q02Sql,
    "q03_inner_join_agg"  -> q03Sql,
    "q04_semi_join"       -> q04Sql,
    "q05_anti_join"       -> q05Sql,
    "q06_broadcast_dims"  -> q06Sql,
    "q07_union_stats"     -> q07Sql,
    "q08_zscore"          -> q08Sql,
    "q09_collect_sorted"  -> q09Sql,
    "q10_distinct"        -> q10Sql,
    "q11_window_rank"     -> q11Sql,
    "q12_topk"            -> q12Sql,
    "q13_rollup"          -> q13Sql,
    "q14_scalar_funcs"    -> q14Sql,
    "q15_hourly_events"   -> q15Sql,
    "q16_range_join"      -> q16Sql,
    "q17_asof_join"       -> q17Sql,
    "q18_set_ops"         -> q18Sql,
    "q19_conditional_agg" -> q19Sql,
    "q20_json_extract"    -> q20Sql,
    "q21_sessionize"      -> q21Sql,
    "q22_full_outer_join" -> q22Sql,
    "q23_percentiles"     -> q23Sql,
    "q24_cube"            -> q24Sql,
    "q25_above_avg"       -> q25Sql,
    "q26_distinct_agg"    -> q26Sql,
    "q27_asof_custom"     -> q17Sql, // same semantics, custom physical op
    "q28_topk_agg"        -> q28Sql,
    "q29_sliding_window"  -> q29Sql,
    "q30_first_last"      -> q30Sql,
    "q31_salted_skew_join" -> q31Sql,
    "q32_approx_distinct" -> q32Sql,
    "q33_pivot"           -> q33Sql,
    "q34_adversarial_skew_join" -> q34Sql,
    "q35_stream_batch_gate" -> q35Sql,
    "q36_stream_dedup_gate" -> q36Sql,
    "q37_stream_session_gate" -> q37Sql,
    "q38_stream_join_gate" -> q38Sql,
    "q39_stream_state_gate" -> q39Sql,
    "q40_stream_outer_join_gate" -> q40Sql,
    "q41_stream_wm_dedup_gate" -> q41Sql,
    "q42_observe_metrics" -> q42Sql,
    "q43_dpp_gate" -> q43Sql,
    "q44_bucketed_join_gate" -> q44Sql,
    "q45_aqe_skew_gate" -> q45Sql,
    "q46_stream_exactly_once_gate" -> q46Sql,
    "q47_runtime_bloom_gate" -> q47Sql,
    "q48_grouping_sets"   -> q48Sql,
    "q49_range_frame"     -> q49Sql,
    "q50_correlated_subquery" -> q50Sql,
    "q51_reused_exchange_gate" -> q51Sql,
    "q52_binned_interval_join" -> q52Sql,
    "q53_window_distribution" -> q53Sql,
    "q54_datetime_kernel" -> q54Sql,
    "q55_incremental_resume_gate" -> q55Sql,
    "q56_orc_roundtrip" -> q56Sql,
    "q57_array_kernel" -> q57Sql,
    "q58_null_semantics" -> q58Sql,
    "q59_string_kernel" -> q59Sql,
    "q60_regex_kernel" -> q60Sql,
    "q61_bitwise_kernel" -> q61Sql,
    "q62_null_aware_anti_join" -> q62Sql,
    "q63_approx_quantile_gate" -> q63Sql,
    "q64_outer_join_kernel" -> q64Sql,
    "q65_variant_kernel" -> q65Sql,
    "q66_transform_with_state_gate" -> q66Sql,
    "q67_lateral_topn" -> q67Sql,
    "q68_recursive_cte" -> q68Sql,
    "q69_pipe_syntax" -> q69Sql,
    "q70_stats_kernel" -> q70Sql,
    "q71_collation_kernel" -> q71Sql,
    "q72_sql_udf" -> q72Sql,
    "q73_compaction_gate" -> q73Sql,
    "q74_schema_evolution_gate" -> q74Sql,
    "q75_unpivot" -> q75Sql,
    "q76_merge_upsert" -> q76Sql,
    "q77_scd2" -> q77Sql,
    "q78_group_by_all" -> q78Sql,
    "q79_pagerank"     -> q79Sql,
    "q80_asof_directions" -> q80Sql,
    "q81_heavy_hitters_gate" -> q81Sql,
    "q82_stream_heavy_hitters_gate" -> q82Sql,
    "q83_partition_prune_gate" -> q83Sql,
    "q84_ivm_gate" -> q84Sql,
    "q85_retention_cohorts" -> q85Sql,
    "q86_countmin_gate" -> q86Sql,
    "q87_kmv_sketch" -> q87Sql,
    "q88_zorder_gate" -> q88Sql,
    "q89_funnel" -> q89Sql,
    "q90_kmv_setops" -> q90Sql,
    "q91_locf_resample" -> q91Sql,
    "q92_triangles" -> q92Sql,
    "q93_time_travel_gate" -> q93Sql,
    "q94_interp_resample" -> q94Sql,
    "q95_star_join" -> q95Sql,
    "q96_bfs_levels" -> q96Sql,
    "q97_equidepth_hist" -> q97Sql,
    "q98_time_weighted_avg" -> q98Sql,
    "q99_map_kernel" -> q99Sql,
    "q100_window_kernel" -> q100Sql,
    "q101_calibration_eval" -> q101Sql,
    "q102_attribution" -> q102Sql,
    "q103_jsonl_roundtrip" -> q103Sql,
    "q104_csv_roundtrip" -> q104Sql,
    "q105_late_data_gate" -> q105Sql,
    "q107_state_evolution_gate" -> q107Sql,
    "q108_deep_pagerank_gate" -> q108Sql,
    "q109_deep_bfs_gate"  -> q109Sql)
}
