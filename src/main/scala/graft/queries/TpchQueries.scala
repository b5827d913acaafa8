package graft.queries

import org.apache.spark.sql.functions._

import Registry.T

/** Classic TPC-H query shapes (Q1/Q3/Q5/Q10) adapted to the driver
  * corpus — the recognizable multi-join/aggregate benchmark workloads
  * the reference itself never ships (SURVEY §5: no TPC corpus there).
  * All run in BENCH at sf0.1.
  *
  * Determinism per the gate rules: money aggregates sum in DECIMAL
  * (exact, order-independent) and cast DOUBLE at the terminal
  * projection; averages are decimal-sum ÷ count (a double AVG's
  * partial-merge order varies run to run); every ORDER BY is totalized
  * with a key tiebreak. Timestamps compare as DATE on both engines.
  */
object TpchQueries {

  private val disc4 = "decimal(18,4)"

  // ---- derived-table contract ------------------------------------------
  // The driver corpus ships no `partsupp` table and no l_shipmode /
  // l_commitdate / l_receiptdate columns, which blocks TPC-H
  // q2/q9/q11/q12/q16/q20/q21. Both engines read the SAME parquet, so the
  // missing data is DERIVED with pure integer/date arithmetic from the
  // keys — the Spark builders below and the `psSql`/`lxSql` oracle
  // fragments restate the identical formulas, making every derived value
  // bit-reproducible on both sides:
  //   partsupp: 4 suppliers per part, ps_suppkey = (p*7 + k*13) % S for
  //     k in 0..3 (S = count(supplier), so the derivation scales with the
  //     corpus; offsets 13/26/39 are distinct mod every S the driver
  //     generates, so the 4 suppliers never collide);
  //     ps_availqty = (p*17 + s*31) % 9999 + 1;
  //     ps_supplycost = ((p*13 + s*7) % 99900)/100.0 + 1.0  (1.00–1000.00)
  //   lineitem extension: l_shipmode = MODES[(okey+line) % 7];
  //     l_commitdate = shipdate + (p % 30 - 15) days;
  //     l_receiptdate = shipdate + (s % 10 + 1) days.
  // At scale the derivation is a narrow, codegen'd projection over part /
  // lineitem — no shuffle, no extra scan, nothing to persist.

  /** Derived partsupp: ps_partkey, ps_suppkey, ps_availqty, ps_supplycost.
    * One row per (part, k<4); explode of a 4-literal array over the part
    * scan plus one broadcast scalar (supplier count) — zero shuffles. */
  private def partsupp(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val sTotal = T(s, dir, "supplier").agg(count(lit(1)).as("s_total"))
    T(s, dir, "part").select(col("p_partkey"))
      .crossJoin(broadcast(sTotal))
      .select(col("p_partkey"),
        explode(array((0 until 4).map(lit): _*)).as("k"), col("s_total"))
      .select(col("p_partkey").as("ps_partkey"),
        ((col("p_partkey") * 7 + col("k") * 13) % col("s_total")).as("ps_suppkey"))
      .withColumn("ps_availqty",
        ((col("ps_partkey") * 17 + col("ps_suppkey") * 31) % 9999 + 1).cast("int"))
      .withColumn("ps_supplycost",
        (col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 99900 / lit(100.0) + 1.0)
  }

  /** Oracle twin of [[partsupp]] (a WITH-clause fragment). */
  private val psSql =
    """s_cnt AS (SELECT count(*) AS s_total FROM supplier),
      |ps AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST((ps_partkey * 17 + ps_suppkey * 31) % 9999 + 1 AS INT) AS ps_availqty,
      |    ((ps_partkey * 13 + ps_suppkey * 7) % 99900) / 100.0 + 1.0 AS ps_supplycost
      |  FROM (SELECT p_partkey AS ps_partkey,
      |          (p_partkey * 7 + k * 13) % s_total AS ps_suppkey
      |        FROM part, s_cnt, (VALUES (0),(1),(2),(3)) AS gen(k)))""".stripMargin

  private val shipModes = Seq("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR")

  /** Lineitem extended with derived l_shipmode / l_commitdate /
    * l_receiptdate — pure per-row projections, pushdown-transparent. */
  private def lineitemExt(s: org.apache.spark.sql.SparkSession, dir: String) =
    T(s, dir, "lineitem")
      .withColumn("l_shipmode", element_at(array(shipModes.map(lit): _*),
        ((col("l_orderkey") + col("l_linenumber")) % 7 + 1).cast("int")))
      .withColumn("l_commitdate",
        date_add(to_date(col("l_shipdate")), (col("l_partkey") % 30 - 15).cast("int")))
      .withColumn("l_receiptdate",
        date_add(to_date(col("l_shipdate")), (col("l_suppkey") % 10 + 1).cast("int")))

  /** Oracle twin of [[lineitemExt]] (a WITH-clause fragment). */
  private val lxSql =
    """lx AS (SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
      |    l_extendedprice, l_discount, l_shipdate,
      |    (['MAIL','SHIP','AIR','TRUCK','RAIL','FOB','REG AIR'])[
      |      CAST((l_orderkey + l_linenumber) % 7 + 1 AS INT)] AS l_shipmode,
      |    CAST(l_shipdate AS DATE) + CAST(l_partkey % 30 - 15 AS INT) AS l_commitdate,
      |    CAST(l_shipdate AS DATE) + CAST(l_suppkey % 10 + 1 AS INT) AS l_receiptdate
      |  FROM lineitem)""".stripMargin

  val defs: Seq[(String, Q)] = Seq(

    "tpch_q1" -> Q((s, dir) =>
      // Q1 pricing summary: the canonical scan-heavy single-shuffle
      // aggregate — filter reaches the parquet scan, everything else is
      // one map-side-combinable hash aggregate.
      T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          // Scale-0 routing (r9 stress find): a fractional-decimal SUM
          // whose integer rep crosses 2^53 (sum_charge: 2.8e10 × 1e6 at
          // sf1) hits DuckDB's two-step DECIMAL(38,s)→DOUBLE cast
          // ((double)int128 / (double)10^s — each step rounds) and lands
          // 1 ulp off Java BigDecimal. Shift to integer units per ROW
          // (exact: decimal×10^s), sum in DECIMAL(38,0) — integer→double
          // is correctly rounded in both engines WHILE the scaled sum
          // stays below 2^64 (DuckDB's hugeint→double is one rounded
          // conversion only with the upper word zero; above 2^64 it
          // composes per-word conversions and the divergence can
          // return — sum_charge in micros units crosses 2^64 around
          // sf≈600, far past any reachable corpus but a real bound; r9
          // advice) — then ONE shared IEEE
          // divide. Grouped revenue sums elsewhere stay fractional: they
          // sit ≥4 orders below the boundary at any reachable sf.
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(disc4).multiply(lit(10000L)).cast("decimal(38,0)"))
            .cast("double") / lit(1.0e4)).as("sum_disc_price"),
          (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).cast("decimal(18,6)")
            .multiply(lit(1000000L)).cast("decimal(38,0)"))
            .cast("double") / lit(1.0e6)).as("sum_charge"),
          (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
             |    * 10000 AS DECIMAL(38,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
             |  CAST(SUM(CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
             |    AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
             |    AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin), bench = true),

    "tpch_q6" -> Q((s, dir) =>
      // Q6 forecasting revenue change: the pure filter-pushdown
      // microbenchmark — every predicate reaches the scan, one global
      // aggregate, no shuffle beyond the final partial merge.
      T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1997-01-01").cast("date") &&
          col("l_discount").between(0.04, 0.08) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount")).cast(disc4))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
             |    AS DOUBLE) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
             |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
             |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin),
      bench = true),

    "tpch_q14" -> Q((s, dir) => {
      // Q14 promotion effect: fact ⋈ part (broadcastable dim) with a
      // conditional-share aggregate — the percent-of-total pattern.
      val l = T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-06-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1996-07-01").cast("date"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val p = T(s, dir, "part").select("p_partkey", "p_type")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
              .otherwise(lit(0).cast(disc4))).cast("double") /
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
              .cast("double")).as("promo_revenue_pct"))
    }, Some("""SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
              |    THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
              |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              |  / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |    AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue_pct
              |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              |WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-06-01'
              |  AND CAST(l.l_shipdate AS DATE) < DATE '1996-07-01'""".stripMargin),
      bench = true),

    "tpch_q3" -> Q((s, dir) => {
      // Q3 shipping priority: selective dim filter → two equi-joins →
      // aggregate → top-10. AQE broadcasts the filtered customer side.
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = T(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) < lit("1998-03-15").cast("date"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) > lit("1998-03-15").cast("date"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .orderBy(col("revenue").desc, col("l_orderkey"))
    }, Some("""SELECT l_orderkey, o_orderdate, revenue FROM (
              |  SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
              |    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              |  FROM customer c
              |  JOIN orders o ON c.c_custkey = o.o_custkey
              |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
              |  WHERE c.c_mktsegment = 'BUILDING'
              |    AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
              |    AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
              |  GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
              |  ORDER BY revenue DESC, l_orderkey LIMIT 10)
              |ORDER BY revenue DESC, l_orderkey""".stripMargin), bench = true),

    "tpch_q5" -> Q((s, dir) => {
      // Q5 local-supplier volume: the 6-way star join — region/nation
      // broadcast down the chain, the c_nationkey = s_nationkey
      // "locality" predicate applied as a residual.
      val r = T(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = T(s, dir, "nation")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = T(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val l = T(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, Some("""SELECT n.n_name, CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              |FROM customer c
              |JOIN orders o ON c.c_custkey = o.o_custkey
              |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
              |JOIN supplier s ON l.l_suppkey = s.s_suppkey
              |  AND c.c_nationkey = s.s_nationkey
              |JOIN nation n ON s.s_nationkey = n.n_nationkey
              |JOIN region r ON n.n_regionkey = r.r_regionkey
              |WHERE r.r_name = 'ASIA'
              |  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
              |  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
              |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true),

    "tpch_q4" -> Q((s, dir) => {
      // Q4 order-priority checking (EXISTS form): orders with at least
      // one late-shipped line — a LEFT SEMI join with a non-equi
      // residual, the decorrelated-EXISTS plan shape.
      val o = T(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-07-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1996-10-01").cast("date"))
      val l = T(s, dir, "lineitem").select(
        col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("ship_d") > to_date(col("o_orderdate")), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }, Some("""SELECT o_orderpriority, count(*) AS order_count
              |FROM orders o
              |WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-07-01'
              |  AND CAST(o.o_orderdate AS DATE) < DATE '1996-10-01'
              |  AND EXISTS (SELECT 1 FROM lineitem l
              |    WHERE l.l_orderkey = o.o_orderkey
              |      AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE))
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      bench = true),

    "tpch_q18" -> Q((s, dir) => {
      // Q18 large-volume customers: HAVING over the fact, then join the
      // qualifying keys BACK to the dims — aggregate-filter-rejoin, with
      // the qualifying set broadcast as a semi filter.
      val big = T(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total_qty"))
        .filter(col("total_qty") > 180)
      val o = T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = T(s, dir, "customer").select("c_custkey", "c_name")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"),
          col("total_qty").cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }, Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
              |  total_qty FROM (
              |  SELECT c.c_name, c.c_custkey, o.o_orderkey,
              |    CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
              |    CAST(b.total_qty AS DOUBLE) AS total_qty
              |  FROM customer c
              |  JOIN orders o ON c.c_custkey = o.o_custkey
              |  JOIN (SELECT l_orderkey,
              |      SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
              |    FROM lineitem GROUP BY l_orderkey
              |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180) b
              |    ON o.o_orderkey = b.l_orderkey
              |  ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20)
              |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin), bench = true),

    "tpch_q7" -> Q((s, dir) => {
      // Q7 volume shipping: supplier-nation × customer-nation trade flow
      // with the DISJUNCTIVE pair predicate — a filter no single join
      // can absorb, applied as a residual over two independently
      // broadcast nation dims; per (pair, year) decimal-exact revenue.
      val n1 = T(s, dir, "nation").select(col("n_nationkey").as("n1_key"),
        col("n_name").as("supp_nation"))
      val n2 = T(s, dir, "nation").select(col("n_nationkey").as("n2_key"),
        col("n_name").as("cust_nation"))
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = T(s, dir, "orders").select("o_orderkey", "o_custkey")
      val l = T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1998-01-01").cast("date"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(to_date(col("l_shipdate"))).as("l_year"),
          col("l_extendedprice"), col("l_discount"))
      sup.join(l, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }, Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
              |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              |FROM supplier s
              |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
              |JOIN orders o ON l.l_orderkey = o.o_orderkey
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
              |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |  AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
              |  AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin), bench = true),

    "tpch_q8" -> Q((s, dir) => {
      // Q8 national market share: the deepest join tree in the set
      // (part + supplier + two nation roles + region + fact), then a
      // share-of-total per year — a conditional sum over the SAME
      // aggregate, no second pass.
      val p = T(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val c = T(s, dir, "customer").select("c_custkey", "c_nationkey")
      val o = T(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1998-01-01").cast("date"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(to_date(col("o_orderdate"))).as("o_year"))
      val l = T(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      val n1 = T(s, dir, "nation").select(col("n_nationkey").as("sup_nkey"),
        col("n_name").as("supp_nation"))
      val n2 = T(s, dir, "nation").select(col("n_nationkey").as("cust_nkey"),
        col("n_regionkey"))
      val r = T(s, dir, "region").filter(col("r_name") === "AMERICA")
        .select("r_regionkey")
      p.join(l, col("p_partkey") === col("l_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n2, col("c_nationkey") === col("cust_nkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sup_nkey"))
        .groupBy("o_year")
        .agg(
          (sum(when(col("supp_nation") === "NATION_3",
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
            .otherwise(lit(0).cast(disc4))).cast("double") /
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
              .cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }, Some("""SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
              |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
              |      THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
              |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
              |    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |      AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
              |FROM part p
              |JOIN lineitem l ON p.p_partkey = l.l_partkey
              |JOIN orders o ON l.l_orderkey = o.o_orderkey
              |JOIN customer c ON o.o_custkey = c.c_custkey
              |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
              |JOIN region r ON n2.n_regionkey = r.r_regionkey
              |JOIN supplier s ON l.l_suppkey = s.s_suppkey
              |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
              |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
              |  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
              |  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
              |GROUP BY 1 ORDER BY o_year""".stripMargin), bench = true),

    "tpch_q13" -> Q((s, dir) => {
      // Q13 customer order-count distribution: LEFT join (customers
      // with no orders must count at cnt=0) feeding a second aggregate
      // — the histogram-of-an-aggregate shape.
      val c = T(s, dir, "customer").select("c_custkey")
      val o = T(s, dir, "orders").select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some("""SELECT c_count, count(*) AS custdist FROM (
              |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
              |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              |  GROUP BY c.c_custkey) cc
              |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
      bench = true),

    "tpch_q15" -> Q((s, dir) => {
      // Q15 top supplier: revenue per supplier in a quarter, keep the
      // supplier(s) achieving the MAX — a scalar aggregate over an
      // aggregate, expressed as a broadcast join against the 1-row max
      // (no window over the whole agg, no second scan of the fact).
      val l = T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1996-04-01").cast("date"))
      val rev = l.groupBy("l_suppkey")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .as("total_rev"))
      val mx = rev.agg(max("total_rev").as("max_rev"))
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_name")
      rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy("s_suppkey")
    }, Some("""WITH rev AS (SELECT l_suppkey,
              |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              |      AS total_rev
              |  FROM lineitem
              |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
              |FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
              |WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
              |ORDER BY s.s_suppkey""".stripMargin), bench = true),

    "tpch_q17" -> Q((s, dir) => {
      // Q17 small-quantity-order revenue: the correlated-subquery
      // classic, decorrelated into a join against the per-part
      // threshold (0.2 × avg qty). The average is decimal-sum ÷ count
      // on BOTH sides — a correlated double AVG would vary with each
      // engine's partial-merge order at the compare boundary.
      val l = T(s, dir, "lineitem")
      val p = T(s, dir, "part").filter(col("p_brand") === "Brand#12")
        .select("p_partkey")
      val thr = l.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2) * sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("qty_thr"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(thr, col("l_partkey") === col("t_partkey"))
        .filter(col("l_quantity") < col("qty_thr"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
          lit(7.0)).as("avg_yearly"))
    }, Some("""WITH thr AS (SELECT l_partkey AS t_partkey,
              |    0.2 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              |      / count(*) AS qty_thr
              |  FROM lineitem GROUP BY l_partkey)
              |SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              |    / 7.0 AS avg_yearly
              |FROM lineitem l
              |JOIN part p ON l.l_partkey = p.p_partkey
              |JOIN thr ON l.l_partkey = thr.t_partkey
              |WHERE p.p_brand = 'Brand#12' AND l.l_quantity < thr.qty_thr""".stripMargin),
      bench = true),

    "tpch_q19" -> Q((s, dir) => {
      // Q19 discounted revenue: the DISJUNCTION of conjunct groups as a
      // join residual — three (brand, size-range, qty-range) branches
      // OR-ed together; the equi-key still drives a hash join and the
      // disjunction stays a residual filter, never a nested loop.
      val l = T(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val p = T(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }, Some("""SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              |  count(*) AS n_rows
              |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
              |    AND l.l_quantity BETWEEN 1 AND 11)
              |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
              |    AND l.l_quantity BETWEEN 10 AND 20)
              |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
              |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin), bench = true),

    "tpch_q22" -> Q((s, dir) => {
      // Q22 global sales opportunity: customers with above-average
      // positive balance and NO urgent orders — scalar threshold from
      // one aggregate (decimal-exact) + broadcast anti-join, grouped by
      // nation in place of the absent phone country code. (Anti-join
      // side restricted to urgent priority: in this corpus every
      // customer has SOME order, which would gate on an empty set.)
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_bal"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    }, Some("""WITH avg_bal AS (SELECT
              |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
              |  FROM customer WHERE c_acctbal > 0.0)
              |SELECT c.c_nationkey, count(*) AS numcust,
              |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
              |FROM customer c, avg_bal
              |WHERE c.c_acctbal > avg_bal.v
              |  AND NOT EXISTS (SELECT 1 FROM orders o
              |    WHERE o.o_custkey = c.c_custkey
              |      AND o.o_orderpriority = '1-URGENT')
              |GROUP BY c.c_nationkey ORDER BY c.c_nationkey""".stripMargin),
      bench = true),

    "tpch_q10" -> Q((s, dir) => {
      // Q10 returned-item reporting: who returned the most revenue in a
      // quarter — join fact to three dims, aggregate per customer,
      // top-20.
      val c = T(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      val o = T(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-10-01").cast("date") &&
          to_date(col("o_orderdate")) < lit("1997-01-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val l = T(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val n = T(s, dir, "nation").select("n_nationkey", "n_name")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(disc4))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .orderBy(col("revenue").desc, col("c_custkey"))
    }, Some("""SELECT c_custkey, c_name, n_name, revenue FROM (
              |  SELECT c.c_custkey, c.c_name, n.n_name,
              |    CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              |  FROM customer c
              |  JOIN orders o ON c.c_custkey = o.o_custkey
              |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
              |  JOIN nation n ON c.c_nationkey = n.n_nationkey
              |  WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-10-01'
              |    AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
              |    AND l.l_returnflag = 'R'
              |  GROUP BY c.c_custkey, c.c_name, n.n_name
              |  ORDER BY revenue DESC, c_custkey LIMIT 20)
              |ORDER BY revenue DESC, c_custkey""".stripMargin), bench = true),

    "tpch_q2" -> Q((s, dir) => {
      // Q2 minimum-cost supplier: per-part MIN over the region-filtered
      // partsupp, joined back as an equality filter — the decorrelated
      // correlated-subquery shape. The min-cost side is a tiny aggregate
      // (one row per regional part), broadcast by AQE.
      val sup = T(s, dir, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      val n = T(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val r = T(s, dir, "region").filter(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val regional = partsupp(s, dir)
        .join(sup, col("ps_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost",
          "s_acctbal", "s_name", "n_name")
      val minCost = regional.groupBy(col("ps_partkey").as("mc_partkey"))
        .agg(min("ps_supplycost").as("min_cost"))
      val p = T(s, dir, "part")
        .filter(col("p_type") === "LARGE" && col("p_size").between(1, 15))
        .select("p_partkey", "p_brand")
      p.join(regional, col("p_partkey") === col("ps_partkey"))
        .join(minCost, col("ps_partkey") === col("mc_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"),
          col("p_brand"), col("ps_supplycost"), col("ps_suppkey"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("ps_suppkey"))
        .limit(100)
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"), col("ps_suppkey"))
    }, Some(s"""WITH $psSql,
              |regional AS (
              |  SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost,
              |    s.s_acctbal, s.s_name, n.n_name
              |  FROM ps
              |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
              |  JOIN nation n ON s.s_nationkey = n.n_nationkey
              |  JOIN region r ON n.n_regionkey = r.r_regionkey
              |  WHERE r.r_name = 'EUROPE'),
              |mincost AS (SELECT ps_partkey AS mc_partkey,
              |    MIN(ps_supplycost) AS min_cost
              |  FROM regional GROUP BY ps_partkey)
              |SELECT rg.s_acctbal, rg.s_name, rg.n_name, p.p_partkey, p.p_brand,
              |  rg.ps_supplycost, rg.ps_suppkey
              |FROM part p
              |JOIN regional rg ON p.p_partkey = rg.ps_partkey
              |JOIN mincost mc ON rg.ps_partkey = mc.mc_partkey
              |  AND rg.ps_supplycost = mc.min_cost
              |WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 1 AND 15
              |ORDER BY rg.s_acctbal DESC, rg.n_name, rg.s_name, p.p_partkey,
              |  rg.ps_suppkey
              |LIMIT 100""".stripMargin), bench = true),

    "tpch_q9" -> Q((s, dir) => {
      // Q9 product-type profit: fact joins part + derived partsupp +
      // supplier + orders + nation; profit = revenue − supply cost,
      // decimal-cast per row so the per-group sum is exact.
      val p = T(s, dir, "part").filter(col("p_name").like("%red%"))
        .select("p_partkey")
      val l = T(s, dir, "lineitem").select("l_orderkey", "l_partkey",
        "l_suppkey", "l_quantity", "l_extendedprice", "l_discount")
      val ps = partsupp(s, dir).select("ps_partkey", "ps_suppkey", "ps_supplycost")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val o = T(s, dir, "orders").select(col("o_orderkey"),
        year(to_date(col("o_orderdate"))).as("o_year"))
      val n = T(s, dir, "nation").select("n_nationkey", "n_name")
      p.join(l, col("p_partkey") === col("l_partkey"))
        .join(ps, col("ps_suppkey") === col("l_suppkey") &&
          col("ps_partkey") === col("l_partkey"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity")).cast(disc4))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }, Some(s"""WITH $psSql
              |SELECT n.n_name AS nation,
              |  CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
              |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
              |    - ps.ps_supplycost * l.l_quantity AS DECIMAL(18,4)))
              |    AS DOUBLE) AS sum_profit
              |FROM part p
              |JOIN lineitem l ON p.p_partkey = l.l_partkey
              |JOIN ps ON ps.ps_suppkey = l.l_suppkey AND ps.ps_partkey = l.l_partkey
              |JOIN supplier s ON s.s_suppkey = l.l_suppkey
              |JOIN orders o ON o.o_orderkey = l.l_orderkey
              |JOIN nation n ON s.s_nationkey = n.n_nationkey
              |WHERE p.p_name LIKE '%red%'
              |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
      bench = true),

    "tpch_q11" -> Q((s, dir) => {
      // Q11 important stock: share-of-total HAVING — the threshold
      // compare stays in exact DECIMAL (value*1000 > total) so no
      // float boundary can flip a row between engines; the 1-row total
      // broadcasts.
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val n = T(s, dir, "nation").filter(col("n_name") === "NATION_1")
        .select("n_nationkey")
      val sn = partsupp(s, dir)
        .join(sup, col("ps_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).cast(disc4).as("v"))
      val tot = sn.agg(sum("v").as("total_v"))
      sn.groupBy("ps_partkey").agg(sum("v").as("pv"))
        .crossJoin(broadcast(tot))
        .filter(col("pv") * 1000 > col("total_v"))
        .select(col("ps_partkey"), col("pv").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }, Some(s"""WITH $psSql,
              |sn AS (
              |  SELECT ps.ps_partkey,
              |    CAST(ps.ps_supplycost * ps.ps_availqty AS DECIMAL(18,4)) AS v
              |  FROM ps
              |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
              |  JOIN nation n ON s.s_nationkey = n.n_nationkey
              |  WHERE n.n_name = 'NATION_1'),
              |tot AS (SELECT SUM(v) AS total_v FROM sn)
              |SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) AS value
              |FROM sn, tot
              |GROUP BY ps_partkey, tot.total_v
              |HAVING SUM(v) * 1000 > tot.total_v
              |ORDER BY value DESC, ps_partkey""".stripMargin), bench = true),

    "tpch_q12" -> Q((s, dir) => {
      // Q12 shipping-mode priority: every filter is over DERIVED columns
      // (shipmode, commit/receipt dates), proving the derivation contract
      // survives predicate pushdown and date arithmetic on both engines.
      val l = lineitemExt(s, dir)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          to_date(col("l_shipdate")) < col("l_commitdate") &&
          col("l_receiptdate") >= lit("1996-01-01").cast("date") &&
          col("l_receiptdate") < lit("1997-01-01").cast("date"))
        .select("l_orderkey", "l_shipmode")
      val o = T(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      l.join(o, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_shipmode")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
        .orderBy("l_shipmode")
    }, Some(s"""WITH $lxSql
              |SELECT l_shipmode,
              |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
              |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
              |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
              |FROM orders o JOIN lx ON o.o_orderkey = lx.l_orderkey
              |WHERE lx.l_shipmode IN ('MAIL','SHIP')
              |  AND lx.l_commitdate < lx.l_receiptdate
              |  AND CAST(lx.l_shipdate AS DATE) < lx.l_commitdate
              |  AND lx.l_receiptdate >= DATE '1996-01-01'
              |  AND lx.l_receiptdate < DATE '1997-01-01'
              |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin),
      bench = true),

    "tpch_q16" -> Q((s, dir) => {
      // Q16 part/supplier relationship: COUNT(DISTINCT) per attribute
      // triple with a NOT-IN supplier exclusion — expressed as a
      // broadcast anti join (keys are non-null, so anti ≡ NOT IN).
      val p = T(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val badSup = T(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      partsupp(s, dir)
        .join(p, col("ps_partkey") === col("p_partkey"))
        .join(badSup, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }, Some(s"""WITH $psSql
              |SELECT p.p_brand, p.p_type, p.p_size,
              |  count(DISTINCT ps.ps_suppkey) AS supplier_cnt
              |FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
              |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
              |  AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
              |  AND ps.ps_suppkey NOT IN
              |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              |GROUP BY p.p_brand, p.p_type, p.p_size
              |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size"""
      .stripMargin), bench = true),

    "tpch_q20" -> Q((s, dir) => {
      // Q20 potential part promotion: suppliers whose derived stock more
      // than doubles a year's shipped quantity — the availqty threshold
      // compares in exact DECIMAL (availqty*2 > sum_qty), and the
      // correlated subquery decorrelates into one (part, supplier)
      // aggregate joined back.
      val qty = T(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01").cast("date") &&
          to_date(col("l_shipdate")) < lit("1997-01-01").cast("date"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"))
      val pSmall = T(s, dir, "part").filter(col("p_name").like("small%"))
        .select("p_partkey")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      val n = T(s, dir, "nation").filter(col("n_name") === "NATION_1")
        .select("n_nationkey")
      partsupp(s, dir)
        .join(pSmall, col("ps_partkey") === col("p_partkey"))
        .join(qty, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty").cast("decimal(18,2)") * 2 > col("sum_qty"))
        .join(sup, col("ps_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name").distinct()
        .orderBy("s_name", "s_suppkey")
    }, Some(s"""WITH $psSql,
              |qty AS (
              |  SELECT l_partkey, l_suppkey,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
              |  FROM lineitem
              |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
              |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
              |  GROUP BY l_partkey, l_suppkey)
              |SELECT DISTINCT s.s_suppkey, s.s_name
              |FROM supplier s
              |JOIN nation n ON s.s_nationkey = n.n_nationkey
              |JOIN ps ON ps.ps_suppkey = s.s_suppkey
              |JOIN part p ON p.p_partkey = ps.ps_partkey
              |JOIN qty ON qty.l_partkey = ps.ps_partkey
              |  AND qty.l_suppkey = ps.ps_suppkey
              |WHERE n.n_name = 'NATION_1' AND p.p_name LIKE 'small%'
              |  AND CAST(ps.ps_availqty AS DECIMAL(18,2)) * 2 > qty.sum_qty
              |ORDER BY s.s_name, s.s_suppkey""".stripMargin), bench = true),

    "tpch_q21" -> Q((s, dir) => {
      // Q21 suppliers who kept orders waiting: the EXISTS/NOT-EXISTS
      // pair over the same fact — one LEFT SEMI and one LEFT ANTI join,
      // each an equi-join on orderkey with a supplier-inequality
      // residual; late-ness comes from the derived receipt/commit dates.
      val l = lineitemExt(s, dir)
        .select("l_orderkey", "l_suppkey", "l_receiptdate", "l_commitdate")
      val l1 = l.filter(col("l_receiptdate") > col("l_commitdate"))
      val o = T(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select("o_orderkey")
      val sup = T(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
      val n = T(s, dir, "nation").filter(col("n_name") === "NATION_2")
        .select("n_nationkey")
      val l2 = l.select(col("l_orderkey").as("l2_orderkey"),
        col("l_suppkey").as("l2_suppkey"))
      val l3 = l1.select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
      l1.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(l2, col("l_orderkey") === col("l2_orderkey") &&
          col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("l_orderkey") === col("l3_orderkey") &&
          col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
        .orderBy(col("numwait").desc, col("s_name"))
    }, Some(s"""WITH $lxSql
              |SELECT s_name, numwait FROM (
              |  SELECT s.s_name, count(*) AS numwait
              |  FROM supplier s
              |  JOIN lx l1 ON s.s_suppkey = l1.l_suppkey
              |  JOIN orders o ON o.o_orderkey = l1.l_orderkey
              |  JOIN nation n ON s.s_nationkey = n.n_nationkey
              |  WHERE o.o_orderstatus = 'F'
              |    AND l1.l_receiptdate > l1.l_commitdate
              |    AND EXISTS (SELECT 1 FROM lx l2
              |      WHERE l2.l_orderkey = l1.l_orderkey
              |        AND l2.l_suppkey <> l1.l_suppkey)
              |    AND NOT EXISTS (SELECT 1 FROM lx l3
              |      WHERE l3.l_orderkey = l1.l_orderkey
              |        AND l3.l_suppkey <> l1.l_suppkey
              |        AND l3.l_receiptdate > l3.l_commitdate)
              |    AND n.n_name = 'NATION_2'
              |  GROUP BY s.s_name
              |  ORDER BY numwait DESC, s.s_name LIMIT 100)
              |ORDER BY numwait DESC, s_name""".stripMargin), bench = true))
}
