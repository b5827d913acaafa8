package graft.queries

import org.apache.spark.sql.functions._

import Registry.T

/** TPC-DS-style decision-support gates (r9 verdict item 8): the
  * grouping-sets/rollup/window machinery exercised at realistic query
  * complexity — multi-way star joins into hierarchical subtotal rollups
  * with grouping-level window ranks, the exact shapes of TPC-DS q18,
  * q22, q36, q67, q86, q89. The driver corpus is TPC-H-shaped, so the
  * star is derived: lineitem⋈orders as the sales fact; part as the item
  * dimension (category = first token of p_type, then brand — the
  * category→brand hierarchy); customer⋈nation as the store/state
  * dimension.
  *
  * Determinism contract (same as TpchQueries): money sums go through
  * DECIMAL casts wide enough to be exact, divides happen ONCE on the
  * decimal-exact operands in DOUBLE on both engines, rollup columns
  * order NULLS FIRST with full tiebreaks, and window ranks order by the
  * decimal-exact value (never a post-divide double) with id tiebreaks.
  */
object TpcdsQueries {

  val defs: Seq[(String, Q)] = Seq(

    // q22 shape: item-hierarchy ROLLUP of average quantity on hand.
    // (SQL text, not .rollup(): sorting rollup output columns through
    // the DataFrame API re-binds the pre-rollup attrs and trips the
    // ambiguous-self-join check.)
    "tpcds_q22_qty_rollup" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds22_sales")
      s.sql("""SELECT p_brand, p_type, p_size,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
              |    AS avg_qty,
              |  count(*) AS n
              |FROM tpcds22_sales
              |GROUP BY ROLLUP (p_brand, p_type, p_size)
              |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST,
              |  p_size NULLS FIRST""".stripMargin)
    }, Some("""SELECT p_brand, p_type, p_size,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             |    AS avg_qty,
             |  count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY ROLLUP (p_brand, p_type, p_size)
             |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST,
             |  p_size NULLS FIRST""".stripMargin)),

    // q36 shape: gross-margin ratio over the category→brand hierarchy
    // with a rank WITHIN each grouping level (lochierarchy = how many
    // hierarchy columns are aggregated away).
    //
    // The discounted-revenue sum goes through scale-0 integer units
    // (the tpch_q1 routing): the rollup's top cells sum the WHOLE fact
    // table, so the scaled integer rep crosses 2^53 around sf≈5 and
    // DuckDB's two-step DECIMAL(38,6)→DOUBLE cast double-rounds 1 ulp
    // off Java BigDecimal (caught by the r10 sf10 stress run). base_d
    // is scale-2 and stays ~3 orders below the boundary.
    "tpcds_q36_margin_rank" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds36_sales")
      s.sql("""WITH r AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category, p_brand,
              |    CAST(grouping(element_at(split(p_type, ' '), 1)) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
              |      * 1000000 AS DECIMAL(38,0))) AS disc_u,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS base_d
              |  FROM tpcds36_sales
              |  GROUP BY ROLLUP (element_at(split(p_type, ' '), 1), p_brand))
              |SELECT category, p_brand, lochierarchy,
              |  CAST(disc_u AS DOUBLE) / 1000000.0 / CAST(base_d AS DOUBLE)
              |    AS margin_ratio,
              |  CAST(rank() OVER (PARTITION BY lochierarchy
              |    ORDER BY disc_u DESC, category ASC NULLS FIRST,
              |      p_brand ASC NULLS FIRST) AS INT) AS rank_within_level
              |FROM r
              |ORDER BY lochierarchy DESC, rank_within_level,
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin)
    }, Some("""WITH r AS (
              |  SELECT string_split(p_type, ' ')[1] AS category, p_brand,
              |    CAST(grouping(string_split(p_type, ' ')[1]) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
              |      * 1000000 AS DECIMAL(38,0))) AS disc_u,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS base_d
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY ROLLUP (string_split(p_type, ' ')[1], p_brand))
              |SELECT category, p_brand, lochierarchy,
              |  CAST(disc_u AS DOUBLE) / 1000000.0 / CAST(base_d AS DOUBLE)
              |    AS margin_ratio,
              |  CAST(rank() OVER (PARTITION BY lochierarchy
              |    ORDER BY disc_u DESC, category ASC NULLS FIRST,
              |      p_brand ASC NULLS FIRST) AS INT) AS rank_within_level
              |FROM r
              |ORDER BY lochierarchy DESC, rank_within_level,
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin)),

    // q67 shape: state×category×brand ROLLUP of sales, then top-10 per
    // state by ranked sales — the windowed-sales-rollup composite.
    "tpcds_q67_top_per_state" -> Q((s, dir) => {
      val sales = T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      sales.createOrReplaceTempView("tpcds67_sales")
      s.sql("""WITH r AS (
              |  SELECT n_name, element_at(split(p_type, ' '), 1) AS category,
              |    p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM tpcds67_sales
              |  GROUP BY ROLLUP (n_name, element_at(split(p_type, ' '), 1), p_brand)),
              |rk AS (
              |  SELECT n_name, category, p_brand,
              |    CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
              |    CAST(rank() OVER (PARTITION BY n_name
              |      ORDER BY sales_u DESC, category ASC NULLS FIRST,
              |        p_brand ASC NULLS FIRST) AS INT) AS rk
              |  FROM r)
              |SELECT n_name, category, p_brand, sales, rk
              |FROM rk WHERE rk <= 10
              |ORDER BY n_name NULLS FIRST, rk,
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin)
    }, Some("""WITH r AS (
              |  SELECT n_name, string_split(p_type, ' ')[1] AS category,
              |    p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN part ON l_partkey = p_partkey
              |  GROUP BY ROLLUP (n_name, string_split(p_type, ' ')[1], p_brand)),
              |rk AS (
              |  SELECT n_name, category, p_brand,
              |    CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
              |    CAST(rank() OVER (PARTITION BY n_name
              |      ORDER BY sales_u DESC, category ASC NULLS FIRST,
              |        p_brand ASC NULLS FIRST) AS INT) AS rk
              |  FROM r)
              |SELECT n_name, category, p_brand, sales, rk
              |FROM rk WHERE rk <= 10
              |ORDER BY n_name NULLS FIRST, rk,
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin)),

    // q86 shape: two-level rollup share-of-hierarchy rank (the compact
    // q36 variant TPC-DS uses for web sales).
    "tpcds_q86_hierarchy_rank" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds86_sales")
      s.sql("""WITH r AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category, p_brand,
              |    CAST(grouping(element_at(split(p_type, ' '), 1)) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
              |  FROM tpcds86_sales
              |  GROUP BY ROLLUP (element_at(split(p_type, ' '), 1), p_brand))
              |SELECT CAST(qty_d AS DOUBLE) AS total_qty, category, p_brand,
              |  lochierarchy,
              |  CAST(rank() OVER (PARTITION BY lochierarchy,
              |      CASE WHEN lochierarchy = 0 THEN category END
              |    ORDER BY qty_d DESC, category ASC NULLS FIRST,
              |      p_brand ASC NULLS FIRST) AS INT) AS rank_within_parent
              |FROM r
              |ORDER BY lochierarchy DESC,
              |  CASE WHEN lochierarchy = 0 THEN category END NULLS FIRST,
              |  rank_within_parent, category NULLS FIRST,
              |  p_brand NULLS FIRST""".stripMargin)
    }, Some("""WITH r AS (
              |  SELECT string_split(p_type, ' ')[1] AS category, p_brand,
              |    CAST(grouping(string_split(p_type, ' ')[1]) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY ROLLUP (string_split(p_type, ' ')[1], p_brand))
              |SELECT CAST(qty_d AS DOUBLE) AS total_qty, category, p_brand,
              |  lochierarchy,
              |  CAST(rank() OVER (PARTITION BY lochierarchy,
              |      CASE WHEN lochierarchy = 0 THEN category END
              |    ORDER BY qty_d DESC, category ASC NULLS FIRST,
              |      p_brand ASC NULLS FIRST) AS INT) AS rank_within_parent
              |FROM r
              |ORDER BY lochierarchy DESC,
              |  CASE WHEN lochierarchy = 0 THEN category END NULLS FIRST,
              |  rank_within_parent, category NULLS FIRST,
              |  p_brand NULLS FIRST""".stripMargin)),

    // q18 shape: multi-way star into a (nation, year) ROLLUP of several
    // averages — the catalog-sales demographic-average query.
    "tpcds_q18_avg_rollup" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          year(to_date(col("o_orderdate"))).as("o_year"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .createOrReplaceTempView("tpcds18_sales")
      s.sql("""SELECT n_name, o_year,
              |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
              |    AS avg_qty,
              |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
              |    AS avg_price,
              |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*)
              |    AS avg_disc,
              |  count(*) AS n
              |FROM tpcds18_sales
              |GROUP BY ROLLUP (n_name, o_year)
              |ORDER BY n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin)
    }, Some("""SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             |    AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             |    AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*)
             |    AS avg_disc,
             |  count(*) AS n
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT))
             |ORDER BY n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin)),

    // q89 shape: within-brand monthly deviation from the brand's mean
    // month — monthly sums windowed per brand, flagging months that
    // deviate >10% (sum and mean stay decimal-exact; the ONE divide
    // happens identically in both engines).
    "tpcds_q89_monthly_dev" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds89_sales")
      s.sql("""WITH m AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM tpcds89_sales GROUP BY p_brand, month(l_shipdate)),
              |w AS (
              |  SELECT p_brand, mon, sales_u,
              |    SUM(sales_u) OVER (PARTITION BY p_brand) AS tot_u,
              |    count(*) OVER (PARTITION BY p_brand) AS nm
              |  FROM m)
              |SELECT p_brand, mon,
              |  CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
              |  CAST(tot_u AS DOUBLE) / 1000000.0 / nm AS avg_monthly,
              |  (CAST(sales_u AS DOUBLE) / 1000000.0) /
              |    (CAST(tot_u AS DOUBLE) / 1000000.0 / nm) > 1.1 AS above_110pct
              |FROM w
              |ORDER BY p_brand, mon""".stripMargin)
    }, Some("""WITH m AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY p_brand, month(l_shipdate)),
              |w AS (
              |  SELECT p_brand, mon, sales_u,
              |    SUM(sales_u) OVER (PARTITION BY p_brand) AS tot_u,
              |    count(*) OVER (PARTITION BY p_brand) AS nm
              |  FROM m)
              |SELECT p_brand, mon,
              |  CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
              |  CAST(tot_u AS DOUBLE) / 1000000.0 / nm AS avg_monthly,
              |  (CAST(sales_u AS DOUBLE) / 1000000.0) /
              |    (CAST(tot_u AS DOUBLE) / 1000000.0 / nm) > 1.1 AS above_110pct
              |FROM w
              |ORDER BY p_brand, mon""".stripMargin)))
}
