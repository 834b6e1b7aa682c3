package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Num._
import graft.tables.Tables

/** The relational operator surface (SURVEY §2.8): aggregation, joins of
  * every flavor, window functions, rollup/cube/grouping sets, set ops,
  * sorts/top-k, scalar string/date functions — each as a catalogued query
  * with a DuckDB oracle. All are plain Catalyst plans: filters and
  * projections push into the parquet scan, small dimensions broadcast,
  * doubles aggregate through exact decimals (see graft.functions.Num).
  *
  * Every query ends in a deterministic ORDER BY over a unique key set so
  * results are row-order stable across engines and partitionings.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // ---- q01: full-table aggregation (TPC-H Q1 shape) --------------------
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= expr("timestamp_ntz'2000-12-01 00:00:00'"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- q02: filter + projection (pushdown showcase) --------------------
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("timestamp_ntz'1997-01-01 00:00:00'") &&
          col("l_quantity") < 10
      )
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_quantity < 10
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q03: multi-way join + aggregation (broadcast dims) --------------
  def q03RevenueByNation(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(
        col("o_orderdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp_ntz'1998-01-01 00:00:00'")
      )
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy(col("n_name"))
  }

  val q03Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  // ---- q04: semi join ---------------------------------------------------
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q05: anti join ---------------------------------------------------
  // Customers with no order in 1996 (the plain no-orders-at-all variant is
  // empty on this corpus, which would make a weak test).
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").filter(
      col("o_orderdate") >= expr("timestamp_ntz'1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp_ntz'1997-01-01 00:00:00'")
    )
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |                    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  // ---- q06: top-k (sort + limit) ----------------------------------------
  def q06TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  val q06Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---- q07: ranking window function --------------------------------------
  def q07TopPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  val q07Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
      |  FROM orders) x
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---- q08: running / analytic window functions ---------------------------
  // The window order includes l_quantity because the corpus contains a
  // duplicated (orderkey, linenumber) line with different quantities —
  // without it the order is not total and lag/running sums are
  // engine-dependent at the tie (caught by the sf0.1 oracle run).
  def q08RunningSupplier(s: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    t(s, dir, "lineitem")
      .select(
        col("l_suppkey"),
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_quantity"),
        sum(dec(col("l_quantity")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double")
          .as("running_qty"),
        lag(col("l_quantity"), 1).over(w).as("prev_qty"),
        row_number().over(w).as("rn")
      )
      .orderBy("l_suppkey", "rn")
  }

  val q08Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS running_qty,
      |  LAG(l_quantity, 1) OVER w AS prev_qty,
      |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, rn""".stripMargin

  // ---- q09: rollup --------------------------------------------------------
  def q09Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("n"),
        col("sum_qty")
      )
      .orderBy("returnflag", "linestatus")

  val q09Sql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |       COALESCE(l_linestatus, '(all)') AS linestatus,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // ---- q10: cube ----------------------------------------------------------
  def q10Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("orderpriority"),
        col("n"),
        col("sum_price")
      )
      .orderBy("orderstatus", "orderpriority")

  val q10Sql: String =
    """SELECT COALESCE(o_orderstatus, '(all)') AS orderstatus,
      |       COALESCE(o_orderpriority, '(all)') AS orderpriority,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY orderstatus, orderpriority""".stripMargin

  // ---- q11: distinct -------------------------------------------------------
  def q11Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select("c_mktsegment", "c_nationkey")
      .distinct()
      .orderBy("c_mktsegment", "c_nationkey")

  val q11Sql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey
      |FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  // ---- q12: set operations (intersect + except) ----------------------------
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    def buyersIn(year: Int) =
      o.filter(
          col("o_orderdate") >= expr(s"timestamp_ntz'$year-01-01 00:00:00'") &&
            col("o_orderdate") < expr(s"timestamp_ntz'${year + 1}-01-01 00:00:00'")
        )
        .select(col("o_custkey").as("custkey"))
        .distinct()
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("custkey"))
    buyersIn(1996).intersect(buyersIn(1997)).except(machinery).orderBy("custkey")
  }

  val q12Sql: String =
    """SELECT custkey FROM (
      |  SELECT DISTINCT o_custkey AS custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  INTERSECT
      |  SELECT DISTINCT o_custkey AS custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  EXCEPT
      |  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      |) x ORDER BY custkey""".stripMargin

  // ---- q13: string functions ------------------------------------------------
  def q13StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").like("%re%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_type"), 1, 3).as("type3"),
        concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled")
      )
      .orderBy("p_partkey")

  val q13Sql: String =
    """SELECT p_partkey,
      |  UPPER(p_name) AS name_upper,
      |  SUBSTRING(p_type, 1, 3) AS type3,
      |  p_brand || '#' || p_type AS brand_type,
      |  CAST(LENGTH(p_name) AS INTEGER) AS name_len,
      |  REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part
      |WHERE p_name LIKE '%re%'
      |ORDER BY p_partkey""".stripMargin

  // ---- q14: date functions ----------------------------------------------------
  def q14DateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month")
      )
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_year", "o_month")

  val q14Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
      |       CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY o_year, o_month""".stripMargin

  // ---- q15: count distinct ------------------------------------------------------
  def q15CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders")
      )
      .orderBy("o_orderpriority")

  val q15Sql: String =
    """SELECT o_orderpriority,
      |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
      |       CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- q16: conditional aggregation ------------------------------------------------
  def q16ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "R", dec(col("l_extendedprice"))).otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast("double")
          .as("returned_value"),
        count(when(col("l_returnflag") === "R", lit(1))).as("n_returned"),
        count(lit(1)).as("n_total"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty")
      )
      .orderBy("l_linestatus")

  val q16Sql: String =
    """SELECT l_linestatus,
      |  CAST(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS returned_value,
      |  CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS n_returned,
      |  CAST(COUNT(*) AS BIGINT) AS n_total,
      |  MIN(l_quantity) AS min_qty,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // ---- q17: above-average orders (windowed aggregate, single scan) ------------------
  // The predicate is multiplied through to avoid division: totalprice > 1.5 * avg
  // ⟺ totalprice * cnt > 1.5 * sum — all-decimal, hence engine-exact.
  // Spark side uses window aggregates over one shuffle by custkey instead of
  // the self-join form (which scans and shuffles orders twice); the oracle
  // keeps the equivalent join form — identical results, better plan.
  def q17AboveAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    t(s, dir, "orders")
      .withColumn("sum_tp", sum(dec(col("o_totalprice"))).over(w))
      .withColumn("cnt", count(lit(1)).over(w).cast(DecimalType(10, 0)))
      .filter(dec(col("o_totalprice")) * col("cnt") > col("sum_tp") * lit(BigDecimal("1.5")).cast(DecimalType(2, 1)))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  val q17Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |JOIN (SELECT o_custkey AS k,
      |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS sum_tp,
      |             CAST(COUNT(*) AS DECIMAL(10,0)) AS cnt
      |      FROM orders GROUP BY o_custkey) per
      |  ON o_custkey = k
      |WHERE CAST(o_totalprice AS DECIMAL(18,4)) * cnt > sum_tp * CAST(1.5 AS DECIMAL(2,1))
      |ORDER BY o_orderkey""".stripMargin

  // ---- q18: grouping sets (SQL surface) ------------------------------------------------
  def q18GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql(
      """SELECT COALESCE(c_mktsegment, '(all)') AS seg,
        |       COALESCE(CAST(c_nationkey AS STRING), '(all)') AS nk,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_bal
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY seg, nk""".stripMargin
    )
  }

  val q18Sql: String =
    """SELECT COALESCE(c_mktsegment, '(all)') AS seg,
      |       COALESCE(CAST(c_nationkey AS VARCHAR), '(all)') AS nk,
      |       CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_bal
      |FROM customer
      |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      |ORDER BY seg, nk""".stripMargin

  // ---- q19: join with inequality (range) condition ---------------------------------------
  def q19RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    su.join(broadcast(n), col("s_nationkey") === col("n_nationkey") && col("s_acctbal") > 9000.0)
      .select("s_suppkey", "s_name", "n_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  val q19Sql: String =
    """SELECT s_suppkey, s_name, n_name, s_acctbal
      |FROM supplier JOIN nation
      |  ON s_nationkey = n_nationkey AND s_acctbal > 9000.0
      |ORDER BY s_suppkey""".stripMargin

  // ---- q27: math functions (IEEE-exact subset) -------------------------------------
  // Only operations with bit-defined results across engines: sqrt is
  // IEEE-correctly-rounded, abs/floor/ceil/mod are exact. (ln/exp/pow
  // are NOT — libm last-ulp differences would break the hash compare.)
  def q27MathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") <= 100)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        abs(lit(0.5) - col("l_discount")).as("abs_disc"),
        floor(col("l_extendedprice")).as("floor_price"),
        ceil(col("l_extendedprice")).as("ceil_price"),
        (col("l_orderkey") % 7).as("mod7"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq")
      )
      .orderBy("l_orderkey", "l_linenumber")

  val q27Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  sqrt(l_quantity) AS sqrt_qty,
      |  abs(0.5 - l_discount) AS abs_disc,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
      |  l_orderkey % 7 AS mod7,
      |  l_quantity * l_quantity AS qty_sq
      |FROM lineitem
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q28: null-handling / conditional functions ------------------------------------
  def q28NullFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("(machinery)")).as("seg_masked"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
        when(col("c_acctbal") < 0, lit("debt")).otherwise(lit("credit")).as("bal_class"),
        isnull(nullif(col("c_nationkey"), lit(0))).as("is_nation_zero")
      )
      .orderBy("c_custkey")

  val q28Sql: String =
    """SELECT c_custkey,
      |  COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), '(machinery)') AS seg_masked,
      |  GREATEST(c_acctbal, 0.0) AS bal_floor,
      |  LEAST(c_acctbal, 1000.0) AS bal_cap,
      |  CASE WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_class,
      |  NULLIF(c_nationkey, 0) IS NULL AS is_nation_zero
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---- q29: string functions, part 2 ---------------------------------------------------
  def q29StringFuncs2(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .select(
        col("s_suppkey"),
        lpad(col("s_name"), 24, "*").as("name_lpad"),
        rpad(col("s_name"), 24, "-").as("name_rpad"),
        reverse(col("s_name")).as("name_rev"),
        instr(col("s_name"), "#").as("hash_pos"),
        repeat(lit("ab"), 3).as("rep"),
        translate(col("s_name"), "#0", "_O").as("name_subst"),
        substring_index(col("s_name"), "#", 1).as("name_prefix")
      )
      .orderBy("s_suppkey")

  val q29Sql: String =
    """SELECT s_suppkey,
      |  lpad(s_name, 24, '*') AS name_lpad,
      |  rpad(s_name, 24, '-') AS name_rpad,
      |  reverse(s_name) AS name_rev,
      |  CAST(strpos(s_name, '#') AS INTEGER) AS hash_pos,
      |  repeat('ab', 3) AS rep,
      |  translate(s_name, '#0', '_O') AS name_subst,
      |  split_part(s_name, '#', 1) AS name_prefix
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  // ---- q53: full outer join ---------------------------------------------------
  // High-balance customers vs high-balance suppliers per nation: the
  // filters leave nations populated on only one side, so unmatched rows
  // flow from BOTH sides — a real full-outer test, not a disguised inner.
  def q53FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val su = t(s, dir, "supplier")
      .filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, Seq("nationkey"), "full_outer")
      .select(col("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy("nationkey")
  }

  val q53Sql: String =
    """WITH c AS (SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
      |           FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
      |s AS (SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
      |      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
      |SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, n_cust, n_supp
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  // ---- q54: pivot -------------------------------------------------------------
  // RelationalGroupedDataset.pivot with an explicit value list (the
  // list keeps the output schema static — at scale, pivot without one
  // needs an extra distinct pass over the data).
  def q54Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .orderBy("l_returnflag")

  val q54Sql: String =
    """SELECT l_returnflag,
      |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS F,
      |  CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE) AS O
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- q55: analytic window frames + ranking family -----------------------------
  // dense_rank / percent_rank / ntile and a rows-frame moving sum over
  // each customer's order history — the window-function families q07/q08
  // don't cover. Decimal-summed frame so the double is deterministic.
  def q55WindowFrames(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(-2, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        percent_rank().over(w).as("prank"),
        ntile(4).over(w).as("quartile"),
        sum(dec(col("o_totalprice"))).over(frame).cast("double").as("moving_sum"),
        first(col("o_orderkey")).over(w).as("first_order")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  val q55Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
      |  PERCENT_RANK() OVER w AS prank,
      |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS moving_sum,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q56: unpivot (wide → long) -----------------------------------------------
  def q56Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric",
        "value"
      )
      .orderBy("l_orderkey", "l_linenumber", "metric")

  val q56Sql: String =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      |  FROM lineitem WHERE l_orderkey < 100) u
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  // ---- q68: ratio-to-report (percent-of-total window) -----------------------------
  // Each nation's revenue share of the global total: aggregate once,
  // then an unpartitioned analytic window over the 25-row aggregate —
  // the share computation never touches the fact table twice.
  def q68RevenueShare(s: SparkSession, dir: String): DataFrame = {
    val byNation = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
    val w = Window.partitionBy()
    byNation
      .select(
        col("n_name"),
        col("revenue"),
        // decimal-summed denominator: a double window-sum's order is
        // partition-dependent and would break hash equality
        (col("revenue") / sum(dec(col("revenue"))).over(w).cast("double")).as("share"),
        rank().over(w.orderBy(col("revenue").desc, col("n_name"))).as("rnk")
      )
      .orderBy("n_name")
  }

  val q68Sql: String =
    """WITH byn AS (
      |  SELECT n_name,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, revenue,
      |  revenue / CAST(CAST(SUM(CAST(revenue AS DECIMAL(18,4))) OVER () AS VARCHAR) AS DOUBLE) AS share,
      |  CAST(RANK() OVER (ORDER BY revenue DESC, n_name) AS INTEGER) AS rnk
      |FROM byn
      |ORDER BY n_name""".stripMargin

  // ---- q69: LATERAL correlated subquery (top-2 orders per customer) ---------------
  // The SQL-surface form of per-group top-k: a correlated LATERAL
  // subquery with ORDER BY + LIMIT. Catalyst decorrelates this into a
  // ranked window join (DecorrelateInnerQuery) — same physical shape as
  // q07's explicit window, but the *query language* capability is
  // LATERAL itself, so both engines run the identical SQL text.
  private val q69Text: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer,
      |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |           WHERE o_custkey = c_custkey
      |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top2
      |WHERE c_custkey < 200
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  def q69LateralTopK(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(q69Text)
  }

  val q69Sql: String = q69Text

  // ---- q70: correlated scalar subqueries (TPC-H Q17 shape) ------------------------
  // Lineitems below half their part's average quantity. The avg
  // comparison is multiplied through (qty·cnt·2 < sum) so the whole
  // predicate stays in exact decimal arithmetic — no double division to
  // diverge between engines. Catalyst turns the two identically
  // correlated scalars into ONE aggregate join (MergeScalarSubqueries).
  private val q70Text: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      |FROM lineitem l1
      |WHERE CAST(l_quantity AS DECIMAL(18,4))
      |      * (SELECT CAST(COUNT(*) AS DECIMAL(10,0)) FROM lineitem l2
      |         WHERE l2.l_partkey = l1.l_partkey)
      |      * CAST(2 AS DECIMAL(2,0))
      |    < (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(28,4)) FROM lineitem l2
      |       WHERE l2.l_partkey = l1.l_partkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  def q70SmallQtyParts(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(q70Text)
  }

  val q70Sql: String = q70Text

  // ---- q71: ordered string aggregation (listagg) ----------------------------------
  // Deterministic cross-engine form: sorted DISTINCT set, joined with a
  // fixed separator — collect_set's order is partition-dependent, so
  // sort_array is what makes the result hash-comparable (same reason the
  // oracle needs string_agg's ORDER BY clause).
  def q71StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(sort_array(collect_set(col("c_mktsegment"))), ",").as("segments"),
        countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_cust")
      )
      .select(col("c_nationkey").as("nationkey"), col("segments"), col("n_segments"), col("n_cust"))
      .orderBy("nationkey")

  val q71Sql: String =
    """SELECT c_nationkey AS nationkey,
      |  STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
      |  CAST(COUNT(*) AS BIGINT) AS n_cust
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY nationkey""".stripMargin

  // ---- q72: statistical aggregates from exact sums --------------------------------
  // corr / covar_pop / stddev_pop / regr_slope per return flag. The
  // built-in double aggregates are streaming and order-dependent — their
  // last ulp changes with partitioning, which both breaks oracle hashing
  // and makes cluster runs non-reproducible. Instead: one partial-agg
  // pass collects the five exact DECIMAL component sums, and the moment
  // formulas run in IEEE double over those (identical operand order on
  // both engines ⇒ identical bits).
  def q72StatsExact(s: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    val sums = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy")
      )
    val nd = col("n").cast("double")
    val vx = nd * col("sxx") - col("sx") * col("sx")
    val vy = nd * col("syy") - col("sy") * col("sy")
    val cov = nd * col("sxy") - col("sx") * col("sy")
    sums
      .select(
        col("l_returnflag"),
        col("n"),
        (cov / (sqrt(vx) * sqrt(vy))).as("corr_qty_price"),
        (cov / (nd * nd)).as("covar_pop_qty_price"),
        (sqrt(vx) / nd).as("stddev_pop_qty"),
        (cov / vx).as("regr_slope_price_qty")
      )
      .orderBy("l_returnflag")
  }

  val q72Sql: String =
    """WITH sums AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
      |    -- DECIMAL(19,4) factors force int128 storage in DuckDB (18x18
      |    -- would multiply in int64 and overflow); values stay exact.
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem
      |  GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_pop_qty_price,
      |  SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) / CAST(n AS DOUBLE) AS stddev_pop_qty,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) AS regr_slope_price_qty
      |FROM sums
      |ORDER BY l_returnflag""".stripMargin

  // ---- q75: analytic window family part 2 (lead / cume_dist / nth / frames) -------
  // The analytic functions q55 doesn't cover, each over an explicit
  // frame where the default frame differs per function (nth_value and
  // last_value default to UNBOUNDED PRECEDING..CURRENT ROW — pinned to
  // the full partition here so both engines agree by construction).
  def q75WindowAnalytics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val near = w.rowsBetween(-1, 1)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        cume_dist().over(w).as("cdist"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
        last(col("o_orderkey")).over(full).as("last_key"),
        max(col("o_totalprice")).over(near).as("local_max")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  val q75Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CUME_DIST() OVER w AS cdist,
      |  NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
      |  LAST_VALUE(o_orderkey) OVER wf AS last_key,
      |  MAX(o_totalprice) OVER wn AS local_max
      |FROM orders
      |WHERE o_custkey < 50
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |  wn AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---- q79: KMV sketch — engine-portable approximate distinct ---------------------
  // approx_count_distinct (q45) is HLL whose estimate depends on the
  // engine's private hashing, so it can only be rows-gated. A k-minimum-
  // values sketch over md5 is just as mergeable and bounded (keep the k
  // smallest hashes per group; est = (k-1)/h_k) but every term is
  // engine-portable, so the APPROXIMATION ITSELF hash-matches the
  // oracle. h = first 60 md5 bits scaled by 2^-60 (a power-of-two
  // divide — exact in IEEE, so both engines compute identical doubles).
  def q79KmvDistinct(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val d = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .select(
        col("l_returnflag"),
        (conv(md5(col("l_partkey").cast("string")).substr(1, 15), 16, 10).cast("double") /
          lit(math.pow(2, 60))).as("h")
      )
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("h"))
    d.withColumn("rk", row_number().over(w))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_exact"),
        max(when(col("rk") === k, col("h"))).as("kth_h")
      )
      .select(
        col("l_returnflag"),
        col("n_exact"),
        when(col("kth_h").isNull, col("n_exact").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("kth_h"))
          .as("est_distinct")
      )
      .orderBy("l_returnflag")
  }

  val q79Sql: String =
    """WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
      |h AS (SELECT l_returnflag,
      |        CAST(list_reduce(list_transform(range(1, 16),
      |               ii -> CAST(strpos('0123456789abcdef',
      |                            substr(md5(CAST(l_partkey AS VARCHAR)), ii, 1)) - 1 AS BIGINT)),
      |               (a, x) -> a * 16 + x) AS DOUBLE) / 1152921504606846976.0 AS h
      |      FROM d),
      |r AS (SELECT l_returnflag, h,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
      |      FROM h),
      |a AS (SELECT l_returnflag,
      |        CAST(COUNT(*) AS BIGINT) AS n_exact,
      |        MAX(CASE WHEN rk = 64 THEN h END) AS kth_h
      |      FROM r GROUP BY l_returnflag)
      |SELECT l_returnflag, n_exact,
      |  CASE WHEN kth_h IS NULL THEN CAST(n_exact AS DOUBLE) ELSE 63.0 / kth_h END AS est_distinct
      |FROM a
      |ORDER BY l_returnflag""".stripMargin

  // ---- q105: portable HyperLogLog (hash-gated, unlike q45's engine-private HLL) ----
  // The real HLL algorithm (Flajolet et al. 2007) over an engine-
  // portable hash: h = first 14 md5 hex digits as a 56-bit int, bucket
  // = top 4 bits (m=16), rho = leading zeros of the remaining 52 bits
  // + 1 via LENGTH(bin(rem)) — no ln/log2 anywhere (not bit-defined
  // across engines; see the q27 note). The register sum Σ2^-M_j is
  // kept EXACT by multiplying through by 2^53: Z = Σ 2^(53-M_j) is an
  // integer ≤ 16·2^53 (rho reaches 53), so the estimate α·m²·2^53/Z divides two
  // bit-identical operands. Empty buckets (register 0) enter via a
  // generated (flag × 16) bucket universe — dropping them is the
  // classic HLL implementation bug. Small-range LinearCounting is
  // omitted (needs ln); n ≫ 2.5m here, where raw HLL is the estimator.
  // This is the sketch shape that merges across 1000 executors: 16
  // integer registers per group, constant size at any corpus scale.
  def q105PortableHll(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .select(
        col("l_returnflag"),
        conv(md5(col("l_partkey").cast("string")).substr(1, 14), 16, 10)
          .cast("long")
          .as("h"))
    val regs = d
      .select(
        col("l_returnflag"),
        shiftright(col("h"), 52).as("bucket"),
        col("h").bitwiseAND(lit((1L << 52) - 1)).as("rem"))
      .withColumn(
        "rho",
        when(col("rem") === 0L, lit(53L)).otherwise(lit(53L) - length(bin(col("rem")))))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).as("m_reg"), count(lit(1)).as("n_in_bucket"))
    val universe = d
      .select(col("l_returnflag"))
      .distinct()
      .select(col("l_returnflag"), explode(sequence(lit(0L), lit(15L))).as("bucket"))
    val z = universe
      .join(regs, Seq("l_returnflag", "bucket"), "left")
      .select(
        col("l_returnflag"),
        // scale by 2^53, not 2^52: rho reaches 53 (all 52 remainder
        // bits zero), and 2^(52-53) is shiftleft(1, -1) = 1<<63 in
        // Java (shift counts wrap mod 64) — a sign-flipped Z. With
        // 2^53 the exponent 53-M stays in [0, 53] for every register.
        expr("shiftleft(cast(1 as bigint), cast(53 - coalesce(m_reg, 0L) as int))").as("zterm"),
        coalesce(col("n_in_bucket"), lit(0L)).as("n_in_bucket"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("zterm")).as("z"), sum(col("n_in_bucket")).as("n_exact"))
    z.select(
        col("l_returnflag"),
        col("n_exact"),
        ((lit(0.673) * lit(256.0)) * lit(9007199254740992.0) / col("z").cast("double"))
          .as("est_distinct"))
      .orderBy("l_returnflag")
  }

  val q105Sql: String =
    """WITH d AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
      |h AS (SELECT l_returnflag,
      |        CAST(list_reduce(list_transform(range(1, 15),
      |               ii -> CAST(strpos('0123456789abcdef',
      |                            substr(md5(CAST(l_partkey AS VARCHAR)), ii, 1)) - 1 AS BIGINT)),
      |               (a, x) -> a * 16 + x) AS BIGINT) AS h
      |      FROM d),
      |b AS (SELECT l_returnflag, h >> 52 AS bucket,
      |        h & ((CAST(1 AS BIGINT) << 52) - 1) AS rem
      |      FROM h),
      |regs AS (SELECT l_returnflag, bucket,
      |           MAX(CASE WHEN rem = 0 THEN CAST(53 AS BIGINT)
      |                    ELSE 53 - LENGTH(bin(rem)) END) AS m_reg,
      |           CAST(COUNT(*) AS BIGINT) AS n_in_bucket
      |         FROM b GROUP BY l_returnflag, bucket),
      |universe AS (SELECT l_returnflag, unnest(range(0, 16)) AS bucket
      |             FROM (SELECT DISTINCT l_returnflag FROM d)),
      |z AS (SELECT u.l_returnflag,
      |        CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - COALESCE(m_reg, 0) AS INTEGER))
      |             AS BIGINT) AS z,
      |        CAST(SUM(COALESCE(n_in_bucket, 0)) AS BIGINT) AS n_exact
      |      FROM universe u LEFT JOIN regs r
      |        ON u.l_returnflag = r.l_returnflag AND u.bucket = r.bucket
      |      GROUP BY u.l_returnflag)
      |SELECT l_returnflag, n_exact,
      |  (CAST(0.673 AS DOUBLE) * CAST(256.0 AS DOUBLE)) * CAST(9007199254740992.0 AS DOUBLE)
      |    / CAST(z AS DOUBLE) AS est_distinct
      |FROM z
      |ORDER BY l_returnflag""".stripMargin

  // ---- q109: priority sampling (Duffield, Lund & Thorup 2007) -------------------
  // The weighted complement of the KMV/HLL sketches: a k-row sample
  // per group whose priorities q_i = w_i/u_i (u_i a deterministic
  // md5-uniform) yield UNBIASED subset-sum estimates — est = Σ over
  // the top-k of max(w_i, τ), τ the (k+1)-th priority. Every step is
  // IEEE division/comparison on identical operands, so even the
  // ESTIMATE hash-matches the oracle; the per-group estimate sum runs
  // in exact decimal (non-tie rounding of a double at 4 dp is
  // unambiguous — decimal midpoints carry a 5^5 factor no binary
  // fraction has — so both engines round identically). At scale this
  // is the bounded-memory answer to "total revenue by segment ± ε
  // without scanning twice": k rows of state per group, mergeable.
  def q109PrioritySample(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    // Parallelism floor BEFORE the per-row md5+conv priority kernel
    // (guide §2.5): lineitem is a single row group at bench scale, so
    // the kernel (measured ~1.6 s of task CPU at sf0.1) otherwise runs
    // on the scan's one-to-three tasks no matter the session cores.
    // fanOut is the identity at production scale; the deterministic
    // key keeps retries exact. Both branches (sample + exact total)
    // read the same exchange, so the scan runs once. Values are
    // unaffected: u/p/w are per-row arithmetic, the window order is a
    // total order, and every aggregate is exact decimal or count.
    val d = graft.operators.TextGroups
      .fanOut(
        t(s, dir, "lineitem")
          .select(
            col("l_returnflag"),
            col("l_extendedprice"),
            col("l_discount"),
            col("l_orderkey"),
            col("l_linenumber")),
        col("l_orderkey"))
      .select(
        col("l_returnflag"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("w"),
        (conv(
          md5(concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string")))
            .substr(1, 15),
          16, 10).cast("double") / lit(math.pow(2, 60))).as("u"),
        col("l_orderkey"),
        col("l_linenumber"))
      .withColumn("p", col("w") / col("u"))
    // Sample path: the rank filter sits DIRECTLY above the window so
    // Spark inserts WindowGroupLimit — each task keeps its local
    // top-(k+1) per group before the shuffle, instead of sorting the
    // whole group in one task (l_returnflag has cardinality 3: a full
    // per-group sort would funnel everything through 3 tasks at scale).
    // The exact total rides a plain partial-agg groupBy on a second
    // scan; two cheap scans beat one 3-partition sort at 100 TB.
    val wRk = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("p").desc, col("l_orderkey"), col("l_linenumber"))
    val sample = d
      .withColumn("rk", row_number().over(wRk))
      .filter(col("rk") <= k + 1)
    val est = sample
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("rk") === k + 1, col("p"))).as("tau"),
        // collect_list skips the null rk=k+1 slot; ONE aggregation pass
        // yields both tau and the k sample weights, so the sample
        // subtree is consumed once (no re-scan for a second branch)
        collect_list(when(col("rk") <= k, col("w"))).as("ws"))
      .select(col("l_returnflag"), col("tau"), explode(col("ws")).as("w"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(graft.functions.Num.dec(greatest(col("w"), coalesce(col("tau"), lit(0.0)))))
          .cast("double")
          .as("est_sum"))
    val exact = d
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), graft.functions.Num.dsum(col("w")).as("exact_sum"))
    exact
      .join(est, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"), col("exact_sum"), col("est_sum"))
      .withColumn("rel_err", (col("est_sum") - col("exact_sum")) / col("exact_sum"))
      .orderBy("l_returnflag")
  }

  val q109Sql: String =
    """WITH d AS (
      |  SELECT l_returnflag,
      |    l_extendedprice * (1.0 - l_discount) AS w,
      |    CAST(list_reduce(list_transform(range(1, 16),
      |           ii -> CAST(strpos('0123456789abcdef',
      |                        substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |                                   CAST(l_linenumber AS VARCHAR)), ii, 1)) - 1 AS BIGINT)),
      |           (a, x) -> a * 16 + x) AS DOUBLE) / 1152921504606846976.0 AS u,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |p AS (SELECT *, w / u AS p FROM d),
      |r AS (SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |                           ORDER BY p DESC, l_orderkey, l_linenumber) AS rk
      |      FROM p),
      |tt AS (SELECT *,
      |         MAX(CASE WHEN rk = 65 THEN p END) OVER (PARTITION BY l_returnflag) AS tau
      |       FROM r),
      |a AS (SELECT l_returnflag,
      |        CAST(COUNT(*) AS BIGINT) AS n_rows,
      |        CAST(SUM(CAST(w AS DECIMAL(18,4))) AS DOUBLE) AS exact_sum,
      |        CAST(SUM(CASE WHEN rk <= 64
      |                 THEN CAST(GREATEST(w, COALESCE(tau, 0.0)) AS DECIMAL(18,4)) END)
      |             AS DOUBLE) AS est_sum
      |      FROM tt GROUP BY l_returnflag)
      |SELECT l_returnflag, n_rows, exact_sum, est_sum,
      |  (est_sum - exact_sum) / exact_sum AS rel_err
      |FROM a
      |ORDER BY l_returnflag""".stripMargin

  // ---- q85: regex extraction family (groups, counts, anchors) ---------------------
  def q85RegexFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_partkey") < 500)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+) (\\w+) (\\w+)$", 3).as("type_material"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        // portable vowel count (regexp_count isn't everywhere: strip
        // non-vowels, measure)
        length(regexp_replace(col("p_name"), "[^aeiou]", "")).as("n_vowels"),
        col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words")
      )
      .orderBy("p_partkey")

  val q85Sql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_type, '^(\w+) (\w+) (\w+)$', 3) AS type_material,
      |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  CAST(LENGTH(regexp_replace(p_name, '[^aeiou]', '', 'g')) AS INTEGER) AS n_vowels,
      |  regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words
      |FROM part
      |WHERE p_partkey < 500
      |ORDER BY p_partkey""".stripMargin

  // ---- q86: date arithmetic over a join (lags, clamped month math, ISO dow) -------
  def q86DateArithmetic(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderkey") < 1000)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("ship_lag_days"),
        // dates render as ISO strings: DATE logical types round-trip
        // differently through parquet/pandas per engine, strings don't
        last_day(col("l_shipdate")).cast("string").as("ship_month_end"),
        date_trunc("quarter", col("o_orderdate")).cast("date").cast("string").as("order_quarter"),
        add_months(col("l_shipdate"), 3).cast("string").as("ship_plus_3m"),
        (weekday(col("l_shipdate")) + 1).as("ship_iso_dow") // 1 = Monday on both engines
      )
      .orderBy("l_orderkey", "l_linenumber")

  val q86Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_lag_days,
      |  CAST(last_day(l_shipdate) AS VARCHAR) AS ship_month_end,
      |  CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR) AS order_quarter,
      |  CAST(CAST(l_shipdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS ship_plus_3m,
      |  CAST(isodow(l_shipdate) AS INTEGER) AS ship_iso_dow
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderkey < 1000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- q87: bag set-ops (INTERSECT ALL / EXCEPT ALL) ------------------------------
  // q12 covers the DISTINCT set ops; these preserve multiplicity —
  // different operators entirely (Spark plans them as count-diff
  // generate, not a dedup join). Bags = part keys shipped per year.
  def q87SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    def shipped(year: Int) =
      t(s, dir, "lineitem")
        .filter(
          col("l_shipdate") >= expr(s"timestamp_ntz'$year-01-01 00:00:00'") &&
            col("l_shipdate") < expr(s"timestamp_ntz'${year + 1}-01-01 00:00:00'") &&
            col("l_partkey") < 200
        )
        .select(col("l_partkey").as("pk"))
    val a = shipped(1996)
    val b = shipped(1997)
    a.intersectAll(b)
      .select(lit("intersect_all").as("op"), col("pk"))
      .unionAll(a.exceptAll(b).select(lit("except_all").as("op"), col("pk")))
      .orderBy("op", "pk")
  }

  val q87Sql: String =
    """WITH a AS (SELECT l_partkey AS pk FROM lineitem
      |           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |             AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00' AND l_partkey < 200),
      |b AS (SELECT l_partkey AS pk FROM lineitem
      |      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00' AND l_partkey < 200)
      |SELECT 'intersect_all' AS op, pk FROM (SELECT pk FROM a INTERSECT ALL SELECT pk FROM b) x
      |UNION ALL
      |SELECT 'except_all', pk FROM (SELECT pk FROM a EXCEPT ALL SELECT pk FROM b) y
      |ORDER BY op, pk""".stripMargin

  // ---- q115: z-order layout pruning (Morton clustering) ----------------------
  // Measures what z-order clustering buys a 100 TB table: the same 2-D
  // box predicate (defined in scale-free BUCKET space) counts the
  // chunks — stand-ins for file ranges under repartitionByRange — it
  // touches under arrival order, a single-column sort, and Morton
  // order. Key domains differ per scale factor, so bucket bounds come
  // from a 1-row broadcast stats aggregate (the q104 broadcast-scalar
  // pattern), and every layout's chunk id is pure integer math —
  // bit-replayed by the oracle. Arrival touches one chunk per crossed
  // "row" of the box; z-order keeps the box inside a few Morton cells.
  def q115ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrder
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val stats = li.agg(
      min(col("l_partkey")).as("pk_lo"),
      max(col("l_partkey")).as("pk_hi"),
      min(col("l_suppkey")).as("sk_lo"),
      max(col("l_suppkey")).as("sk_hi"),
      min(col("l_orderkey")).as("ok_lo"),
      max(col("l_orderkey")).as("ok_hi"))
    val b = li
      .crossJoin(broadcast(stats))
      .withColumn("pkb", ZOrder.rangeBucket(col("l_partkey"), col("pk_lo"), col("pk_hi"), 11))
      .withColumn("skb", ZOrder.rangeBucket(col("l_suppkey"), col("sk_lo"), col("sk_hi"), 11))
      .withColumn(
        "chunk_arrival",
        ZOrder.rangeBucket(col("l_orderkey"), col("ok_lo"), col("ok_hi"), 6))
      .withColumn("chunk_single", shiftright(col("pkb"), 5))
      .withColumn("chunk_z", shiftright(ZOrder.zValue(Seq(col("pkb"), col("skb")), 11), 16))
    // box_2d: ~10% of the partkey space × ~20% of the suppkey space —
    // the single-column sort happens to help (partkey leads it).
    // box_sk: suppkey-only — the single-column layout collapses to a
    // full scan while Morton order still bounds the touched cells;
    // that asymmetry is the whole argument for z-order.
    //
    // All 8 measurements come out of ONE conditional aggregate over
    // one scan (countDistinct over when(box, chunk) counts exactly the
    // chunks the box touches) — six per-box-per-layout aggregate
    // branches would re-derive the bucketed base six times in the
    // plan (the q110 replication lesson). The 1-row result then
    // explodes to the 6 output rows.
    val box2d = col("pkb") >= 204 && col("pkb") <= 408 &&
      col("skb") >= 409 && col("skb") <= 817
    val boxSk = col("skb") >= 409 && col("skb") <= 817
    val layouts = Seq(
      ("arrival", "chunk_arrival"),
      ("single_dim", "chunk_single"),
      ("zorder", "chunk_z"))
    val aggs =
      Seq(
        count(when(box2d, 1)).as("n_2d"),
        count(when(boxSk, 1)).as("n_sk")) ++
        layouts.flatMap { case (layout, c) =>
          Seq(
            countDistinct(when(box2d, col(c))).as(s"c_2d_$layout"),
            countDistinct(when(boxSk, col(c))).as(s"c_sk_$layout"))
        }
    b.filter(box2d || boxSk)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(array(
        (for {
          (bn, nCol) <- Seq(("box_2d", "n_2d"), ("box_sk", "n_sk"))
          (layout, _) <- layouts
        } yield struct(
          lit(bn).as("box"),
          lit(layout).as("layout"),
          col(nCol).as("n_rows"),
          col(s"c_${bn.stripPrefix("box_")}_$layout").as("n_chunks_touched"))): _*)).as("r"))
      .select(col("r.box"), col("r.layout"), col("r.n_rows"), col("r.n_chunks_touched"))
      .orderBy("box", "layout")
  }

  val q115Sql: String = {
    val zbits = (0 until 11)
      .map(bb => s"(((pkb >> $bb) & 1) << ${2 * bb}) | (((skb >> $bb) & 1) << ${2 * bb + 1})")
      .mkString(" | ")
    s"""WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem),
       |st AS (SELECT MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi,
       |         MIN(l_suppkey) AS sk_lo, MAX(l_suppkey) AS sk_hi,
       |         MIN(l_orderkey) AS ok_lo, MAX(l_orderkey) AS ok_hi
       |       FROM li),
       |b AS (SELECT
       |        (CAST(l_partkey AS BIGINT) - pk_lo) * 2048 // (pk_hi - pk_lo + 1) AS pkb,
       |        (CAST(l_suppkey AS BIGINT) - sk_lo) * 2048 // (sk_hi - sk_lo + 1) AS skb,
       |        (CAST(l_orderkey AS BIGINT) - ok_lo) * 64 // (ok_hi - ok_lo + 1) AS chunk_arrival
       |      FROM li CROSS JOIN st),
       |z AS (SELECT pkb, skb, chunk_arrival,
       |        pkb >> 5 AS chunk_single,
       |        ($zbits) >> 16 AS chunk_z
       |      FROM b),
       |m2 AS (SELECT * FROM z WHERE pkb BETWEEN 204 AND 408 AND skb BETWEEN 409 AND 817),
       |ms AS (SELECT * FROM z WHERE skb BETWEEN 409 AND 817)
       |SELECT box, layout, n_rows, n_chunks_touched FROM (
       |  SELECT 'box_2d' AS box, 'arrival' AS layout, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    CAST(COUNT(DISTINCT chunk_arrival) AS BIGINT) AS n_chunks_touched FROM m2
       |  UNION ALL SELECT 'box_2d', 'single_dim', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT chunk_single) AS BIGINT) FROM m2
       |  UNION ALL SELECT 'box_2d', 'zorder', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT chunk_z) AS BIGINT) FROM m2
       |  UNION ALL SELECT 'box_sk', 'arrival', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT chunk_arrival) AS BIGINT) FROM ms
       |  UNION ALL SELECT 'box_sk', 'single_dim', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT chunk_single) AS BIGINT) FROM ms
       |  UNION ALL SELECT 'box_sk', 'zorder', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(DISTINCT chunk_z) AS BIGINT) FROM ms)
       |ORDER BY box, layout""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_set_ops_all" -> (q87SetOpsAll _),
    "q115_zorder_layout" -> (q115ZorderLayout _),
    "q85_regex_funcs" -> (q85RegexFuncs _),
    "q86_date_arithmetic" -> (q86DateArithmetic _),
    "q79_kmv_distinct" -> (q79KmvDistinct _),
    "q105_portable_hll" -> (q105PortableHll _),
    "q109_priority_sample" -> (q109PrioritySample _),
    "q69_lateral_topk" -> (q69LateralTopK _),
    "q70_small_qty_parts" -> (q70SmallQtyParts _),
    "q71_string_agg" -> (q71StringAgg _),
    "q72_stats_exact" -> (q72StatsExact _),
    "q75_window_analytics" -> (q75WindowAnalytics _),
    "q68_revenue_share" -> (q68RevenueShare _),
    "q53_full_outer" -> (q53FullOuter _),
    "q54_pivot" -> (q54Pivot _),
    "q55_window_frames" -> (q55WindowFrames _),
    "q56_unpivot" -> (q56Unpivot _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_revenue_by_nation" -> (q03RevenueByNation _),
    "q04_semi_join" -> (q04SemiJoin _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_topk" -> (q06TopK _),
    "q07_top_per_customer" -> (q07TopPerCustomer _),
    "q08_running_supplier" -> (q08RunningSupplier _),
    "q09_rollup" -> (q09Rollup _),
    "q10_cube" -> (q10Cube _),
    "q11_distinct" -> (q11Distinct _),
    "q12_set_ops" -> (q12SetOps _),
    "q13_string_funcs" -> (q13StringFuncs _),
    "q14_date_funcs" -> (q14DateFuncs _),
    "q15_count_distinct" -> (q15CountDistinct _),
    "q16_conditional_agg" -> (q16ConditionalAgg _),
    "q17_above_avg" -> (q17AboveAvg _),
    "q18_grouping_sets" -> (q18GroupingSets _),
    "q19_range_join" -> (q19RangeJoin _),
    "q27_math_funcs" -> (q27MathFuncs _),
    "q28_null_funcs" -> (q28NullFuncs _),
    "q29_string_funcs2" -> (q29StringFuncs2 _)
  )

  val oracles: Map[String, String] = Map(
    "q87_set_ops_all" -> q87Sql,
    "q115_zorder_layout" -> q115Sql,
    "q85_regex_funcs" -> q85Sql,
    "q86_date_arithmetic" -> q86Sql,
    "q79_kmv_distinct" -> q79Sql,
    "q105_portable_hll" -> q105Sql,
    "q109_priority_sample" -> q109Sql,
    "q69_lateral_topk" -> q69Sql,
    "q70_small_qty_parts" -> q70Sql,
    "q71_string_agg" -> q71Sql,
    "q72_stats_exact" -> q72Sql,
    "q75_window_analytics" -> q75Sql,
    "q68_revenue_share" -> q68Sql,
    "q53_full_outer" -> q53Sql,
    "q54_pivot" -> q54Sql,
    "q55_window_frames" -> q55Sql,
    "q56_unpivot" -> q56Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_revenue_by_nation" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_anti_join" -> q05Sql,
    "q06_topk" -> q06Sql,
    "q07_top_per_customer" -> q07Sql,
    "q08_running_supplier" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_cube" -> q10Sql,
    "q11_distinct" -> q11Sql,
    "q12_set_ops" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_date_funcs" -> q14Sql,
    "q15_count_distinct" -> q15Sql,
    "q16_conditional_agg" -> q16Sql,
    "q17_above_avg" -> q17Sql,
    "q18_grouping_sets" -> q18Sql,
    "q19_range_join" -> q19Sql,
    "q27_math_funcs" -> q27Sql,
    "q28_null_funcs" -> q28Sql,
    "q29_string_funcs2" -> q29Sql
  )
}
