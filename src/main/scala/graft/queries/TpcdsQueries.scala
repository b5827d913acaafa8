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
      // NO pre-agg-before-rollup here (unlike q67/q36/q86/q18): q22's
      // rollup key (brand, type, size) is essentially the ITEM key, so
      // the pre-aggregate's group space grows with the corpus (~|part|)
      // and its exchange costs more than Expand saves — measured 8%
      // slower at the sf10 stress corpus. The doctrine: pre-aggregate
      // before ROLLUP exactly when the group space is corpus-invariant.
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
             |  p_size NULLS FIRST""".stripMargin), bench = true),

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
      // Pre-aggregate by the full (category, brand) key before the
      // rollup (see q67): Expand then replicates the group space, not
      // the fact table; decimal sums of exact sums are bit-identical.
      s.sql("""WITH pre AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category, p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
              |      * 1000000 AS DECIMAL(38,0))) AS d_u,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS b_d
              |  FROM tpcds36_sales
              |  GROUP BY element_at(split(p_type, ' '), 1), p_brand),
              |r AS (
              |  SELECT category, p_brand,
              |    CAST(grouping(category) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(d_u) AS disc_u,
              |    SUM(b_d) AS base_d
              |  FROM pre
              |  GROUP BY ROLLUP (category, p_brand))
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
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin), bench = true),

    // q67 shape: state×category×brand ROLLUP of sales, then top-10 per
    // state by ranked sales — the windowed-sales-rollup composite.
    "tpcds_q67_top_per_state" -> Q((s, dir) => {
      val sales = T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      sales.createOrReplaceTempView("tpcds67_sales")
      // Pre-aggregate by the FULL key before the rollup: Spark's Expand
      // replicates every input row once per grouping set BEFORE any
      // aggregation, so a direct rollup pays 4× the fact volume through
      // Expand + partial agg. Summing exact DECIMAL(38,0) partials by
      // (nation, category, brand) first shrinks Expand's input from the
      // fact table to the group space — bit-identical results (sums of
      // exact sums), and the shape that survives a 100 TB fact.
      s.sql("""WITH pre AS (
              |  SELECT n_name, element_at(split(p_type, ' '), 1) AS category,
              |    p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS s_u
              |  FROM tpcds67_sales
              |  GROUP BY n_name, element_at(split(p_type, ' '), 1), p_brand),
              |r AS (
              |  SELECT n_name, category, p_brand, SUM(s_u) AS sales_u
              |  FROM pre
              |  GROUP BY ROLLUP (n_name, category, p_brand)),
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
              |  category NULLS FIRST, p_brand NULLS FIRST""".stripMargin), bench = true),

    // q86 shape: two-level rollup share-of-hierarchy rank (the compact
    // q36 variant TPC-DS uses for web sales).
    "tpcds_q86_hierarchy_rank" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds86_sales")
      // Pre-aggregate before the rollup (see q67) — Expand over the
      // group space, not the fact; exact decimal sums of sums.
      s.sql("""WITH pre AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category, p_brand,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_d
              |  FROM tpcds86_sales
              |  GROUP BY element_at(split(p_type, ' '), 1), p_brand),
              |r AS (
              |  SELECT category, p_brand,
              |    CAST(grouping(category) AS INT) +
              |      CAST(grouping(p_brand) AS INT) AS lochierarchy,
              |    SUM(q_d) AS qty_d
              |  FROM pre
              |  GROUP BY ROLLUP (category, p_brand))
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
              |  p_brand NULLS FIRST""".stripMargin), bench = true),

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
      // Pre-aggregate by (nation, year) before the rollup (see q67):
      // the averages divide sums-of-exact-sums by summed counts, so
      // every output bit matches the direct rollup.
      s.sql("""WITH pre AS (
              |  SELECT n_name, o_year,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_d,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS p_d,
              |    SUM(CAST(l_discount AS DECIMAL(18,6))) AS d_d,
              |    count(*) AS n
              |  FROM tpcds18_sales
              |  GROUP BY n_name, o_year)
              |SELECT n_name, o_year,
              |  CAST(SUM(q_d) AS DOUBLE) / SUM(n) AS avg_qty,
              |  CAST(SUM(p_d) AS DOUBLE) / SUM(n) AS avg_price,
              |  CAST(SUM(d_d) AS DOUBLE) / SUM(n) AS avg_disc,
              |  SUM(n) AS n
              |FROM pre
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
             |ORDER BY n_name NULLS FIRST, o_year NULLS FIRST""".stripMargin), bench = true),

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
              |ORDER BY p_brand, mon""".stripMargin), bench = true),

    // q98 shape: revenue share WITHIN category (revenueratio) — the
    // windowed market-share query: one hash agg, then a category-
    // partitioned window sum ratio. Numerator and denominator are both
    // DECIMAL(38,0) integer units cast to DOUBLE once (the single-step
    // cast that stays exact past 2^53), and the ratio is one fixed-shape
    // double expression on both engines.
    "tpcds_q98_category_share" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds98_sales")
      s.sql("""WITH r AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category, p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
              |  FROM tpcds98_sales
              |  GROUP BY element_at(split(p_type, ' '), 1), p_brand)
              |SELECT category, p_brand,
              |  CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue,
              |  CAST(rev_u AS DOUBLE) * 100.0 /
              |    CAST(SUM(rev_u) OVER (PARTITION BY category) AS DOUBLE)
              |    AS revenueratio
              |FROM r
              |ORDER BY category, p_brand""".stripMargin)
    }, Some("""WITH r AS (
              |  SELECT string_split(p_type, ' ')[1] AS category, p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY string_split(p_type, ' ')[1], p_brand)
              |SELECT category, p_brand,
              |  CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue,
              |  CAST(rev_u AS DOUBLE) * 100.0 /
              |    CAST(SUM(rev_u) OVER (PARTITION BY category) AS DOUBLE)
              |    AS revenueratio
              |FROM r
              |ORDER BY category, p_brand""".stripMargin), bench = true),

    // q33 shape: cross-channel union — three per-channel aggregates
    // UNION ALL'd and re-aggregated by category. The driver corpus has
    // one sales table, so the channel is DERIVED (l_linenumber % 3 —
    // the same integer formula on both engines), exactly like the
    // derived partsupp/shipmode columns in TpchQueries.
    // q33 shape: per-category revenue unioned across the three channel
    // CTEs. The oracle keeps the three-slice UNION ALL; the engine
    // observes that three same-fact channel slices re-unioned are just
    // GROUP BY (category, channel) — the CASE channel column partitions
    // the rows, so the union of the per-channel aggregates IS the
    // two-key aggregate. Three fact scans become one; the channel-count
    // rollup reads the |category×3|-row frame.
    "tpcds_q33_channel_union" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds33_sales")
      s.sql("""WITH base AS (
              |  SELECT element_at(split(p_type, ' '), 1) AS category,
              |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
              |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
              |  FROM tpcds33_sales),
              |u AS (SELECT category, channel, SUM(rev_u) AS rev_u
              |  FROM base GROUP BY category, channel)
              |SELECT category, CAST(SUM(rev_u) AS DOUBLE) / 1000000.0
              |    AS total_sales,
              |  count(*) AS n_channels
              |FROM u GROUP BY category
              |ORDER BY category""".stripMargin)
    }, Some("""WITH base AS (
              |  SELECT string_split(p_type, ' ')[1] AS category,
              |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
              |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
              |  FROM lineitem JOIN part ON l_partkey = p_partkey),
              |ws AS (SELECT category, SUM(rev_u) AS rev_u FROM base
              |  WHERE channel = 'web' GROUP BY category),
              |ss AS (SELECT category, SUM(rev_u) AS rev_u FROM base
              |  WHERE channel = 'store' GROUP BY category),
              |cs AS (SELECT category, SUM(rev_u) AS rev_u FROM base
              |  WHERE channel = 'catalog' GROUP BY category),
              |u AS (SELECT * FROM ws UNION ALL SELECT * FROM ss
              |  UNION ALL SELECT * FROM cs)
              |SELECT category, CAST(SUM(rev_u) AS DOUBLE) / 1000000.0
              |    AS total_sales,
              |  count(*) AS n_channels
              |FROM u GROUP BY category
              |ORDER BY category""".stripMargin), bench = true),

    // q74 shape: year-over-year customer growth — yearly totals paired
    // on consecutive years, keeping customers whose sales grew >10%.
    // The oracle keeps TPC-DS's self-join spelling; the yearly-total CTE
    // referenced twice would re-scan the fact (CTEs inline), so the
    // engine pairs years with lead() PARTITION BY customer (the q39
    // doctrine — years are densely ordered within a customer; the
    // partition key is HIGH-cardinality, so no window concentration).
    // One fact scan, zero joins. Totals stay DECIMAL(18,2)-exact; the
    // ONE growth divide happens on identically-rounded doubles in both
    // engines.
    "tpcds_q74_yoy_growth" -> Q((s, dir) => {
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          year(to_date(col("o_orderdate"))).as("o_year"),
          col("o_totalprice"))
        .createOrReplaceTempView("tpcds74_sales")
      s.sql("""WITH yt AS (
              |  SELECT c_custkey, c_name, o_year,
              |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot_d
              |  FROM tpcds74_sales GROUP BY c_custkey, c_name, o_year),
              |p AS (
              |  SELECT c_custkey, c_name, o_year, tot_d,
              |    lead(o_year) OVER (PARTITION BY c_custkey ORDER BY o_year)
              |      AS y2,
              |    lead(tot_d) OVER (PARTITION BY c_custkey ORDER BY o_year)
              |      AS tot2
              |  FROM yt)
              |SELECT c_custkey, c_name, o_year AS year1,
              |  CAST(tot_d AS DOUBLE) AS sales1,
              |  CAST(tot2 AS DOUBLE) AS sales2,
              |  CAST(tot2 AS DOUBLE) / CAST(tot_d AS DOUBLE) AS growth
              |FROM p
              |WHERE y2 = o_year + 1
              |  AND CAST(tot2 AS DOUBLE) / CAST(tot_d AS DOUBLE) > 1.1
              |ORDER BY c_custkey, o_year""".stripMargin)
    }, Some("""WITH yt AS (
              |  SELECT c_custkey, c_name,
              |    CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
              |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot_d
              |  FROM orders JOIN customer ON o_custkey = c_custkey
              |  GROUP BY c_custkey, c_name, EXTRACT(year FROM o_orderdate))
              |SELECT t1.c_custkey, t1.c_name, t1.o_year AS year1,
              |  CAST(t1.tot_d AS DOUBLE) AS sales1,
              |  CAST(t2.tot_d AS DOUBLE) AS sales2,
              |  CAST(t2.tot_d AS DOUBLE) / CAST(t1.tot_d AS DOUBLE) AS growth
              |FROM yt t1 JOIN yt t2
              |  ON t1.c_custkey = t2.c_custkey AND t2.o_year = t1.o_year + 1
              |WHERE CAST(t2.tot_d AS DOUBLE) / CAST(t1.tot_d AS DOUBLE) > 1.1
              |ORDER BY t1.c_custkey, t1.o_year""".stripMargin), bench = true),

    // q59 shape: same-month sales compared across consecutive years per
    // nation — monthly rollup self-joined on (nation, month, year+1).
    "tpcds_q59_weekly_compare" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          year(to_date(col("o_orderdate"))).as("o_year"),
          month(to_date(col("o_orderdate"))).as("mon"),
          col("l_extendedprice"), col("l_discount"))
        .createOrReplaceTempView("tpcds59_sales")
      // Oracle keeps the self-join; the engine pairs consecutive years
      // with lead() PARTITION BY (nation, month) over the tiny monthly
      // frame (the q39/q74 doctrine) — one fact scan, zero joins.
      s.sql("""WITH ms AS (
              |  SELECT n_name, o_year, mon,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM tpcds59_sales GROUP BY n_name, o_year, mon),
              |p AS (
              |  SELECT n_name, o_year, mon, sales_u,
              |    lead(o_year) OVER (PARTITION BY n_name, mon ORDER BY o_year)
              |      AS y2,
              |    lead(sales_u) OVER (PARTITION BY n_name, mon ORDER BY o_year)
              |      AS sales2_u
              |  FROM ms)
              |SELECT n_name, o_year, mon,
              |  CAST(sales_u AS DOUBLE) / 1000000.0 AS sales_this,
              |  CAST(sales2_u AS DOUBLE) / 1000000.0 AS sales_next,
              |  CAST(sales2_u AS DOUBLE) / CAST(sales_u AS DOUBLE) AS ratio
              |FROM p WHERE y2 = o_year + 1
              |ORDER BY n_name, o_year, mon""".stripMargin)
    }, Some("""WITH ms AS (
              |  SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
              |    CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  GROUP BY n_name, EXTRACT(year FROM o_orderdate),
              |    EXTRACT(month FROM o_orderdate))
              |SELECT a.n_name, a.o_year, a.mon,
              |  CAST(a.sales_u AS DOUBLE) / 1000000.0 AS sales_this,
              |  CAST(b.sales_u AS DOUBLE) / 1000000.0 AS sales_next,
              |  CAST(b.sales_u AS DOUBLE) / CAST(a.sales_u AS DOUBLE) AS ratio
              |FROM ms a JOIN ms b
              |  ON a.n_name = b.n_name AND a.mon = b.mon
              |    AND b.o_year = a.o_year + 1
              |ORDER BY a.n_name, a.o_year, a.mon""".stripMargin), bench = true),

    // q51 shape: per-brand cumulative monthly sales for two derived
    // channels, FULL OUTER joined month-by-month, flagging months where
    // the web cumulative overtakes the store cumulative. The cumulative
    // window is brand-partitioned with an explicit ROWS frame (the
    // RANGE-vs-ROWS default differs in spirit between engines; months
    // are unique per brand per channel here, but the frame is pinned
    // anyway). Cumulative sums stay DECIMAL(38,0) integer units.
    // q51 shape: per-channel cumulative revenue race. The oracle keeps
    // TPC-DS's spelling — two per-channel monthly aggregates, each
    // windowed, FULL OUTER joined. The engine fuses: ONE (brand, month)
    // aggregate with conditional per-channel sums, then both running
    // sums share one brand-keyed window exchange. A channel's cumulative
    // must read NULL on months where that channel had no sales (that's
    // what the outer join produced) — the running sum is computed over
    // the null-ignoring conditional column and then MASKED back to NULL
    // on channel-absent months, which is exactly the per-channel-rows
    // window value because the absent months contribute nothing to the
    // sum. One fact scan, zero joins, one window exchange.
    "tpcds_q51_cumulative" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds51_sales")
      s.sql("""WITH base AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    CASE CAST(l_linenumber % 2 AS INT) WHEN 0 THEN 'web'
              |      ELSE 'store' END AS channel,
              |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
              |  FROM tpcds51_sales),
              |g AS (
              |  SELECT p_brand, mon,
              |    SUM(CASE WHEN channel = 'web' THEN rev_u END) AS web_u,
              |    SUM(CASE WHEN channel = 'store' THEN rev_u END) AS store_u
              |  FROM base GROUP BY p_brand, mon),
              |c AS (
              |  SELECT p_brand, mon, web_u, store_u,
              |    SUM(web_u) OVER (PARTITION BY p_brand ORDER BY mon
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wcum,
              |    SUM(store_u) OVER (PARTITION BY p_brand ORDER BY mon
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scum
              |  FROM g)
              |SELECT p_brand, mon,
              |  CAST(CASE WHEN web_u IS NOT NULL THEN wcum END AS DOUBLE)
              |    / 1000000.0 AS web_cum,
              |  CAST(CASE WHEN store_u IS NOT NULL THEN scum END AS DOUBLE)
              |    / 1000000.0 AS store_cum,
              |  coalesce(CASE WHEN web_u IS NOT NULL THEN wcum END, 0) >
              |    coalesce(CASE WHEN store_u IS NOT NULL THEN scum END, 0)
              |    AS web_ahead
              |FROM c
              |ORDER BY p_brand, mon""".stripMargin)
    }, Some("""WITH base AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    CASE CAST(l_linenumber % 2 AS INT) WHEN 0 THEN 'web'
              |      ELSE 'store' END AS channel,
              |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
              |  FROM lineitem JOIN part ON l_partkey = p_partkey),
              |w AS (SELECT p_brand, mon, SUM(rev_u) AS rev_u FROM base
              |  WHERE channel = 'web' GROUP BY p_brand, mon),
              |st AS (SELECT p_brand, mon, SUM(rev_u) AS rev_u FROM base
              |  WHERE channel = 'store' GROUP BY p_brand, mon),
              |wc AS (SELECT p_brand, mon,
              |  SUM(rev_u) OVER (PARTITION BY p_brand ORDER BY mon
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u
              |  FROM w),
              |sc AS (SELECT p_brand, mon,
              |  SUM(rev_u) OVER (PARTITION BY p_brand ORDER BY mon
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_u
              |  FROM st)
              |SELECT coalesce(wc.p_brand, sc.p_brand) AS p_brand,
              |  coalesce(wc.mon, sc.mon) AS mon,
              |  CAST(wc.cum_u AS DOUBLE) / 1000000.0 AS web_cum,
              |  CAST(sc.cum_u AS DOUBLE) / 1000000.0 AS store_cum,
              |  coalesce(wc.cum_u, 0) > coalesce(sc.cum_u, 0) AS web_ahead
              |FROM wc FULL OUTER JOIN sc
              |  ON wc.p_brand = sc.p_brand AND wc.mon = sc.mon
              |ORDER BY p_brand, mon""".stripMargin), bench = true),

    // q70 shape: hierarchy rollup restricted to the top-5 nations by
    // total sales. The top-5 selection is ORDER BY + LIMIT (TakeOrdered;
    // q70's rank()-subquery spelling would be a partition-less window —
    // the r11 anti-pattern) feeding an IN-subquery semi-join, then the
    // (nation, category) rollup with a rank within each grouping level.
    "tpcds_q70_top_states" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("n_name"),
          element_at(split(col("p_type"), " "), 1).as("category"),
          col("l_extendedprice"), col("l_discount"))
        .createOrReplaceTempView("tpcds70_sales")
      // The top-5 census and the ROLLUP both aggregate the same 5-table
      // join; a CTE would inline twice and re-run the join tree — the
      // last multi-scan-of-a-joined-fact in the bench set (r11 verdict).
      // SUM is reaggregable, so pre-aggregate ONCE to the finest grain
      // either consumer needs — (n_name, category), ~|nation|·|category|
      // rows — and localCheckpoint that tiny frame (the q1/q23 pattern
      // composed with the q67 pre-agg-before-ROLLUP doctrine). At 100 TB
      // this trades the second 5-table join tree for a broadcast-sized
      // materialization.
      s.sql("""SELECT n_name, category,
              |  SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |    AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |FROM tpcds70_sales GROUP BY n_name, category""".stripMargin)
        .localCheckpoint(true)
        .createOrReplaceTempView("tpcds70_grain")
      s.sql("""WITH top5 AS (
              |  SELECT n_name FROM (
              |    SELECT n_name, SUM(sales_u) AS tot_u
              |    FROM tpcds70_grain GROUP BY n_name)
              |  ORDER BY tot_u DESC, n_name LIMIT 5),
              |r AS (
              |  SELECT n_name, category,
              |    CAST(grouping(n_name) AS INT) +
              |      CAST(grouping(category) AS INT) AS lochierarchy,
              |    SUM(sales_u) AS sales_u
              |  FROM tpcds70_grain
              |  WHERE n_name IN (SELECT n_name FROM top5)
              |  GROUP BY ROLLUP (n_name, category))
              |SELECT CAST(sales_u AS DOUBLE) / 1000000.0 AS total_sales,
              |  n_name, category, lochierarchy,
              |  CAST(rank() OVER (PARTITION BY lochierarchy,
              |      CASE WHEN lochierarchy = 0 THEN n_name END
              |    ORDER BY sales_u DESC, n_name ASC NULLS FIRST,
              |      category ASC NULLS FIRST) AS INT) AS rank_within_parent
              |FROM r
              |ORDER BY lochierarchy DESC,
              |  CASE WHEN lochierarchy = 0 THEN n_name END NULLS FIRST,
              |  rank_within_parent, n_name NULLS FIRST,
              |  category NULLS FIRST""".stripMargin)
    }, Some("""WITH base AS (
              |  SELECT n_name, string_split(p_type, ' ')[1] AS category,
              |    l_extendedprice, l_discount
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN part ON l_partkey = p_partkey),
              |top5 AS (
              |  SELECT n_name FROM (
              |    SELECT n_name,
              |      SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |        AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS tot_u
              |    FROM base GROUP BY n_name)
              |  ORDER BY tot_u DESC, n_name LIMIT 5),
              |r AS (
              |  SELECT n_name, category,
              |    CAST(grouping(n_name) AS INT) +
              |      CAST(grouping(category) AS INT) AS lochierarchy,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM base
              |  WHERE n_name IN (SELECT n_name FROM top5)
              |  GROUP BY ROLLUP (n_name, category))
              |SELECT CAST(sales_u AS DOUBLE) / 1000000.0 AS total_sales,
              |  n_name, category, lochierarchy,
              |  CAST(rank() OVER (PARTITION BY lochierarchy,
              |      CASE WHEN lochierarchy = 0 THEN n_name END
              |    ORDER BY sales_u DESC, n_name ASC NULLS FIRST,
              |      category ASC NULLS FIRST) AS INT) AS rank_within_parent
              |FROM r
              |ORDER BY lochierarchy DESC,
              |  CASE WHEN lochierarchy = 0 THEN n_name END NULLS FIRST,
              |  rank_within_parent, n_name NULLS FIRST,
              |  category NULLS FIRST""".stripMargin), bench = true),

    // q97 shape: store-vs-catalog buyer overlap via FULL OUTER JOIN of
    // two de-duplicated (customer, item) channel sets — the one join
    // type no other gate exercises. Both sides are large at scale, so
    // the right plan is a shuffled SMJ on the composite key; the
    // aggregate is three conditional counts over the joined null
    // pattern (no post-join shuffle: AQE folds it into a single-stage
    // partial+final count).
    // q97 shape: channel-overlap census — TPC-DS (and the oracle) spells
    // it as a FULL OUTER JOIN of two per-channel DISTINCT (customer,
    // item) sets, which scans the fact twice and joins two corpus-sized
    // frames. A full-outer join of two projections OF THE SAME FACT is a
    // group-by in disguise: the engine aggregates once to (customer,
    // item) grain with a per-channel presence flag (max(CASE)), and the
    // overlap census is three conditional counts over that frame — one
    // fact scan, one exchange, no join (the q17 fused-slices doctrine).
    "tpcds_q97_channel_overlap" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds97_sales")
      s.sql("""WITH flags AS (
              |  SELECT o_custkey AS cust, l_partkey AS item,
              |    max(CASE WHEN CAST(l_linenumber % 3 AS INT) = 1
              |      THEN 1 ELSE 0 END) AS in_s,
              |    max(CASE WHEN CAST(l_linenumber % 3 AS INT) = 2
              |      THEN 1 ELSE 0 END) AS in_c
              |  FROM tpcds97_sales
              |  WHERE CAST(l_linenumber % 3 AS INT) IN (1, 2)
              |  GROUP BY o_custkey, l_partkey)
              |SELECT
              |  COUNT(CASE WHEN in_s = 1 AND in_c = 0 THEN 1 END) AS store_only,
              |  COUNT(CASE WHEN in_s = 0 AND in_c = 1 THEN 1 END) AS catalog_only,
              |  COUNT(CASE WHEN in_s = 1 AND in_c = 1 THEN 1 END) AS both_channels
              |FROM flags""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, l_partkey, l_linenumber
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |ssci AS (
             |  SELECT DISTINCT o_custkey AS cust, l_partkey AS item
             |  FROM sales WHERE CAST(l_linenumber % 3 AS INT) = 1),
             |csci AS (
             |  SELECT DISTINCT o_custkey AS cust, l_partkey AS item
             |  FROM sales WHERE CAST(l_linenumber % 3 AS INT) = 2)
             |SELECT
             |  COUNT(CASE WHEN ssci.cust IS NOT NULL AND csci.cust IS NULL
             |    THEN 1 END) AS store_only,
             |  COUNT(CASE WHEN ssci.cust IS NULL AND csci.cust IS NOT NULL
             |    THEN 1 END) AS catalog_only,
             |  COUNT(CASE WHEN ssci.cust IS NOT NULL AND csci.cust IS NOT NULL
             |    THEN 1 END) AS both_channels
             |FROM ssci FULL OUTER JOIN csci
             |  ON ssci.cust = csci.cust AND ssci.item = csci.item""".stripMargin), bench = true),

    // q38 shape: customers active in ALL THREE channels in the window.
    // TPC-DS (and the oracle) spells it as a 3-way INTERSECT of
    // per-channel DISTINCT (customer, month) sets — three fact scans
    // and two semi-joins (the INTERSECT lowering itself stays proven by
    // u2_intersect and q14). Set membership over slices OF THE SAME
    // FACT is again a group-by in disguise: one aggregate to (customer,
    // month) grain keeps a presence flag per channel, and "in all
    // three" is a conjunction of the flags — one scan, one exchange,
    // zero joins.
    "tpcds_q38_triple_intersect" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds38_sales")
      s.sql("""WITH g AS (
              |  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
              |  FROM tpcds38_sales
              |  GROUP BY o_custkey, CAST(month(o_orderdate) AS INT)
              |  HAVING max(CASE WHEN CAST(l_linenumber % 3 AS INT) = 0
              |      THEN 1 ELSE 0 END) = 1
              |    AND max(CASE WHEN CAST(l_linenumber % 3 AS INT) = 1
              |      THEN 1 ELSE 0 END) = 1
              |    AND max(CASE WHEN CAST(l_linenumber % 3 AS INT) = 2
              |      THEN 1 ELSE 0 END) = 1)
              |SELECT count(*) AS n_omni_channel FROM g""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, o_orderdate, l_linenumber
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |hot AS (
             |  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST(l_linenumber % 3 AS INT) = 0
             |  INTERSECT
             |  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST(l_linenumber % 3 AS INT) = 1
             |  INTERSECT
             |  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST(l_linenumber % 3 AS INT) = 2)
             |SELECT count(*) AS n_omni_channel FROM hot""".stripMargin), bench = true),

    // q47 shape: monthly brand sales with the brand's average plus the
    // LAG/LEAD neighbor months — the only gate emitting both offset
    // window functions. All four window columns share ONE partition
    // spec (p_brand), so Catalyst plans a single WindowExec over one
    // exchange; month edges yield NULL lag/lead, surfaced as-is (ORDER
    // BY is on the non-null grouping keys, so null placement is moot).
    "tpcds_q47_lag_lead" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds47_sales")
      s.sql("""WITH m AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS sales_u
              |  FROM tpcds47_sales GROUP BY p_brand, month(l_shipdate)),
              |w AS (
              |  SELECT p_brand, mon, sales_u,
              |    SUM(sales_u) OVER (PARTITION BY p_brand) AS tot_u,
              |    count(*) OVER (PARTITION BY p_brand) AS nm,
              |    LAG(sales_u) OVER (PARTITION BY p_brand ORDER BY mon)
              |      AS prev_u,
              |    LEAD(sales_u) OVER (PARTITION BY p_brand ORDER BY mon)
              |      AS next_u
              |  FROM m)
              |SELECT p_brand, mon,
              |  CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
              |  CAST(tot_u AS DOUBLE) / 1000000.0 / nm AS avg_monthly,
              |  CAST(prev_u AS DOUBLE) / 1000000.0 AS prev_sales,
              |  CAST(next_u AS DOUBLE) / 1000000.0 AS next_sales
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
             |    count(*) OVER (PARTITION BY p_brand) AS nm,
             |    LAG(sales_u) OVER (PARTITION BY p_brand ORDER BY mon)
             |      AS prev_u,
             |    LEAD(sales_u) OVER (PARTITION BY p_brand ORDER BY mon)
             |      AS next_u
             |  FROM m)
             |SELECT p_brand, mon,
             |  CAST(sales_u AS DOUBLE) / 1000000.0 AS sales,
             |  CAST(tot_u AS DOUBLE) / 1000000.0 / nm AS avg_monthly,
             |  CAST(prev_u AS DOUBLE) / 1000000.0 AS prev_sales,
             |  CAST(next_u AS DOUBLE) / 1000000.0 AS next_sales
             |FROM w
             |ORDER BY p_brand, mon""".stripMargin), bench = true),

    // q88 shape: eight independently-filtered counts of the same fact
    // assembled into ONE row. TPC-DS spells it as eight scalar
    // subqueries cross-joined — EIGHT full scans of store_sales. The
    // engine side deliberately fuses them into one conditional
    // aggregation (count(CASE …) × 8): one scan, one partial-agg
    // reduction, zero joins — the only spelling that survives 100 TB.
    // The ORACLE keeps TPC-DS's eight-subquery form, so the gate also
    // proves the two spellings equivalent.
    "tpcds_q88_bucket_counts" -> Q((s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("tpcds88_sales")
      val buckets = (0 until 8).map { b =>
        val (lo, hi) = (b * 6 + 1, b * 6 + 6)
        s"COUNT(CASE WHEN l_quantity BETWEEN $lo AND $hi THEN 1 END) AS cnt_b${b + 1}"
      }.mkString(",\n              |  ")
      s.sql(s"""SELECT
              |  $buckets
              |FROM tpcds88_sales
              |WHERE l_discount BETWEEN 0.02 AND 0.08""".stripMargin)
    }, Some {
      val subs = (0 until 8).map { b =>
        val (lo, hi) = (b * 6 + 1, b * 6 + 6)
        s"""(SELECT count(*) AS cnt_b${b + 1} FROM lineitem
           |  WHERE l_discount BETWEEN 0.02 AND 0.08
           |    AND l_quantity BETWEEN $lo AND $hi) s${b + 1}""".stripMargin
      }.mkString(" CROSS JOIN\n")
      val cols = (1 to 8).map(b => s"cnt_b$b").mkString(", ")
      s"""SELECT $cols FROM
         |$subs""".stripMargin
    }, bench = true),

    // q34 shape: ticket-size buckets — orders whose item count lands in
    // a band (HAVING on a grouped count), joined BACK to the customer
    // dimension. The group-by runs on (o_orderkey, o_custkey) so the
    // having-filtered result is already tiny before the dim join;
    // filters reach the fact scan.
    "tpcds_q34_ticket_buckets" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds34_sales")
      T(s, dir, "customer").createOrReplaceTempView("tpcds34_customer")
      s.sql("""WITH t AS (
              |  SELECT o_orderkey, o_custkey, count(*) AS cnt
              |  FROM tpcds34_sales
              |  WHERE o_orderpriority <> '1-URGENT'
              |  GROUP BY o_orderkey, o_custkey
              |  HAVING count(*) BETWEEN 5 AND 7)
              |SELECT c_custkey, c_name, o_orderkey, cnt
              |FROM t JOIN tpcds34_customer ON o_custkey = c_custkey
              |ORDER BY c_custkey, o_orderkey""".stripMargin)
    }, Some("""WITH t AS (
             |  SELECT o_orderkey, o_custkey, count(*) AS cnt
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderpriority <> '1-URGENT'
             |  GROUP BY o_orderkey, o_custkey
             |  HAVING count(*) BETWEEN 5 AND 7)
             |SELECT c_custkey, c_name, o_orderkey, cnt
             |FROM t JOIN customer ON o_custkey = c_custkey
             |ORDER BY c_custkey, o_orderkey""".stripMargin), bench = true),

    // q87 shape: chained EXCEPT count — customers seen in channel 0 but
    // in NEITHER of the other two (channels derived from l_linenumber
    // like q97/q38). Spark plans EXCEPT as left-anti joins over
    // distincts on one composite key, so both anti-joins co-locate on
    // the same exchange — the set-difference twin of q38's INTERSECT.
    // q87 shape: store-only (customer, month) cells — TPC-DS's chained
    // EXCEPT over three per-channel DISTINCT sets (the EXCEPT lowering
    // stays proven by u3_except). Same fused answer as q38: one
    // (customer, month) aggregate with per-channel presence flags;
    // "(A EXCEPT B) EXCEPT C" ⟺ flag₀ ∧ ¬flag₁ ∧ ¬flag₂ — three fact
    // scans and two anti-joins become one scan, one exchange, no joins.
    //
    // The channel key mixes the ORDER key in — `(orderkey + linenumber)
    // % 3`, not the bare line number (q38/q97 keep that): store-only
    // demands EVERY line of the cell share one residue, and per-order
    // linenumbers are 1..n sequences, so any cell with an order of 3+
    // lines — and under bare %3 any order at all, since line 1 always
    // exists — can never qualify (measured: the bare-%3 population is
    // 0 on the sf1+ stress corpora — the q65 scale-degeneracy, here a
    // corpus artifact). Adding the orderkey rotates the residue per
    // order, so cells whose orders are all short stay store-only at a
    // corpus-invariant rate: 388 cells at driver sf0.01 (was 275 under
    // bare %3), nonzero at every stress sf.
    "tpcds_q87_channel_except" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds87_sales")
      s.sql("""SELECT count(*) AS store_only_custmons FROM (
              |  SELECT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
              |  FROM tpcds87_sales
              |  GROUP BY o_custkey, CAST(month(o_orderdate) AS INT)
              |  HAVING max(CASE WHEN CAST((l_orderkey + l_linenumber) % 3 AS INT) = 0
              |      THEN 1 ELSE 0 END) = 1
              |    AND max(CASE WHEN CAST((l_orderkey + l_linenumber) % 3 AS INT) = 1
              |      THEN 1 ELSE 0 END) = 0
              |    AND max(CASE WHEN CAST((l_orderkey + l_linenumber) % 3 AS INT) = 2
              |      THEN 1 ELSE 0 END) = 0)""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, o_orderdate, l_orderkey, l_linenumber
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT count(*) AS store_only_custmons FROM (
             |  SELECT DISTINCT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST((l_orderkey + l_linenumber) % 3 AS INT) = 0
             |  EXCEPT
             |  SELECT DISTINCT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST((l_orderkey + l_linenumber) % 3 AS INT) = 1
             |  EXCEPT
             |  SELECT DISTINCT o_custkey, CAST(month(o_orderdate) AS INT) AS mon
             |  FROM sales WHERE CAST((l_orderkey + l_linenumber) % 3 AS INT) = 2)""".stripMargin), bench = true),

    // q1 shape: customers whose total returns exceed 1.2× their state's
    // average — the correlated-scalar-subquery-vs-group-average filter,
    // spelled as the aggregate⋈per-group-stats join both engines plan
    // identically (the state stats frame is |nation|-sized → broadcast).
    // Returns derive from l_returnflag='R'; the filter compares through
    // doubles cast ONCE from decimal-exact sums (the q74 doctrine), with
    // multiplication instead of division so no engine ever divides.
    "tpcds_q1_returns_above_avg" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("tpcds1_sales")
      // The customer-returns frame feeds both the state stats and the
      // probe side; a CTE would inline twice and re-scan the fact, and
      // a window PARTITION BY state over this CUSTOMER-grain frame
      // would concentrate a corpus-scaled frame into |state| partitions
      // (the anti-pattern the broadcast join avoids). So: compute the
      // frame ONCE, localCheckpoint it (customer-grain, ~1000× smaller
      // than the fact), and keep the broadcast-stats join shape.
      s.sql("""SELECT o_custkey, n_name,
              |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ret_d
              |FROM tpcds1_sales WHERE l_returnflag = 'R'
              |GROUP BY o_custkey, n_name""".stripMargin)
        .localCheckpoint(true)
        .createOrReplaceTempView("tpcds1_ctr")
      s.sql("""WITH st AS (
              |  SELECT n_name, SUM(ret_d) AS sum_d, count(*) AS cnt
              |  FROM tpcds1_ctr GROUP BY n_name)
              |SELECT c.o_custkey AS c_custkey, c.n_name,
              |  CAST(c.ret_d AS DOUBLE) AS total_returns
              |FROM tpcds1_ctr c JOIN st s ON c.n_name = s.n_name
              |WHERE CAST(c.ret_d AS DOUBLE) * s.cnt * 10.0
              |    > CAST(s.sum_d AS DOUBLE) * 12.0
              |ORDER BY total_returns DESC, c_custkey
              |LIMIT 100""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, n_name, l_extendedprice, l_returnflag
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey),
             |ctr AS (
             |  SELECT o_custkey, n_name,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ret_d
             |  FROM sales WHERE l_returnflag = 'R'
             |  GROUP BY o_custkey, n_name),
             |st AS (
             |  SELECT n_name, SUM(ret_d) AS sum_d, count(*) AS cnt
             |  FROM ctr GROUP BY n_name)
             |SELECT c.o_custkey AS c_custkey, c.n_name,
             |  CAST(c.ret_d AS DOUBLE) AS total_returns
             |FROM ctr c JOIN st s ON c.n_name = s.n_name
             |WHERE CAST(c.ret_d AS DOUBLE) * s.cnt * 10.0
             |    > CAST(s.sum_d AS DOUBLE) * 12.0
             |ORDER BY total_returns DESC, c_custkey
             |LIMIT 100""".stripMargin), bench = true),

    // q6 shape: count, per state, the sold items priced above their
    // category's average retail price — the other correlated-average
    // classic: the threshold side is the |category|-sized stats frame
    // (6 rows — broadcast), the probe side the dimension, and only the
    // surviving partkeys (a semi-join-sized set) ever touch the fact.
    // The driver corpus prices uniformly in [900,1000], so TPC-DS's
    // 1.2 multiplier keeps nothing; 1.04 keeps the upper tail (~12% of
    // parts) — the multiplier is corpus-fitted, the shape is q6's.
    "tpcds_q6_price_above_avg" -> Q((s, dir) => {
      T(s, dir, "part").createOrReplaceTempView("tpcds6_part")
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("tpcds6_sales")
      s.sql("""WITH p AS (
              |  SELECT p_partkey,
              |    element_at(split(p_type, ' '), 1) AS category,
              |    CAST(p_retailprice AS DECIMAL(18,2)) AS price_d
              |  FROM tpcds6_part),
              |cat AS (
              |  SELECT category, SUM(price_d) AS sum_d, count(*) AS cnt
              |  FROM p GROUP BY category),
              |qual AS (
              |  SELECT p_partkey FROM p JOIN cat ON p.category = cat.category
              |  WHERE CAST(price_d AS DOUBLE) * cnt * 100.0
              |      > CAST(sum_d AS DOUBLE) * 104.0)
              |SELECT n_name, count(*) AS cnt
              |FROM tpcds6_sales JOIN qual ON l_partkey = qual.p_partkey
              |GROUP BY n_name
              |HAVING count(*) >= 10
              |ORDER BY cnt, n_name""".stripMargin)
    }, Some("""WITH p AS (
             |  SELECT p_partkey, string_split(p_type, ' ')[1] AS category,
             |    CAST(p_retailprice AS DECIMAL(18,2)) AS price_d
             |  FROM part),
             |cat AS (
             |  SELECT category, SUM(price_d) AS sum_d, count(*) AS cnt
             |  FROM p GROUP BY category),
             |qual AS (
             |  SELECT p_partkey FROM p JOIN cat ON p.category = cat.category
             |  WHERE CAST(price_d AS DOUBLE) * cnt * 100.0
             |      > CAST(sum_d AS DOUBLE) * 104.0),
             |sales AS (
             |  SELECT l_partkey, n_name
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey)
             |SELECT n_name, count(*) AS cnt
             |FROM sales JOIN qual ON l_partkey = qual.p_partkey
             |GROUP BY n_name
             |HAVING count(*) >= 10
             |ORDER BY cnt, n_name""".stripMargin), bench = true),

    // q65 shape: brands selling below their state's average brand
    // revenue — the avg-of-aggregates self-join (aggregate once,
    // re-aggregate the aggregate, join the two levels). The state-stats
    // side is |nation|-sized → broadcast; the ONE divide for the
    // reported average happens on decimal-exact doubles, and the filter
    // multiplies instead (no divide in any predicate). Sums route
    // through scale-0 micro-unit integers (the q36/q22 routing): the
    // state-level SUM of DECIMAL(18,6) crosses 2^53 unscaled at sf10
    // (caught by the stress corpus — 305 rows, value hash off by the
    // DuckDB two-step decimal→double rounding, the exact 2c8a935
    // signature), while int→double of the DECIMAL(38,0) micro-units
    // rounds once, identically on both engines. TPC-DS's 0.1
    // multiplier (and any fixed sub-average fraction) DEGENERATES with
    // scale: per-brand revenue concentrates toward the state mean as
    // row counts grow (0.9×avg already keeps 0 of 625 brands at the
    // sf1 stress corpus), so the gate uses strictly-below-average —
    // the only threshold whose selectivity (~half the brands) is
    // scale-invariant. Same lesson as the winnow df-cap (STRESS_r11).
    "tpcds_q65_low_brands" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds65_sales")
      // Oracle keeps the aggregate⋈state-stats join; the engine derives
      // the state sums as windows PARTITION BY state over the TINY
      // (state, brand) frame (the q39 doctrine — safe precisely because
      // the windowed frame is ≤|state×brand| rows, never corpus-sized),
      // so the twice-referenced CTE stops re-scanning the fact. One
      // fact scan, zero joins.
      s.sql("""WITH sb AS (
              |  SELECT n_name, p_brand,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
              |  FROM tpcds65_sales GROUP BY n_name, p_brand),
              |w AS (
              |  SELECT n_name, p_brand, rev_u,
              |    SUM(rev_u) OVER (PARTITION BY n_name) AS sum_u,
              |    count(*) OVER (PARTITION BY n_name) AS cnt
              |  FROM sb)
              |SELECT n_name, p_brand,
              |  CAST(rev_u AS DOUBLE) / 1000000.0 AS brand_rev,
              |  CAST(sum_u AS DOUBLE) / 1000000.0 / cnt AS state_avg
              |FROM w
              |WHERE CAST(rev_u AS DOUBLE) * cnt
              |    < CAST(sum_u AS DOUBLE)
              |ORDER BY n_name, p_brand""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT n_name, p_brand, l_extendedprice, l_discount
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN part ON l_partkey = p_partkey),
             |sb AS (
             |  SELECT n_name, p_brand,
             |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
             |  FROM sales GROUP BY n_name, p_brand),
             |sa AS (
             |  SELECT n_name, SUM(rev_u) AS sum_u, count(*) AS cnt
             |  FROM sb GROUP BY n_name)
             |SELECT sb.n_name, sb.p_brand,
             |  CAST(sb.rev_u AS DOUBLE) / 1000000.0 AS brand_rev,
             |  CAST(sa.sum_u AS DOUBLE) / 1000000.0 / sa.cnt AS state_avg
             |FROM sb JOIN sa ON sb.n_name = sa.n_name
             |WHERE CAST(sb.rev_u AS DOUBLE) * sa.cnt
             |    < CAST(sa.sum_u AS DOUBLE)
             |ORDER BY sb.n_name, sb.p_brand""".stripMargin), bench = true),

    // q31 shape: states where the web channel grew faster quarter-over-
    // quarter than the store channel — per-(state, channel, quarter)
    // sums pivoted by conditional aggregation (ONE pass, no self-join —
    // the spelling that replaces q31's six-way self-join at scale),
    // then the growth comparison cross-multiplied on doubles cast once
    // from decimal-exact sums: no divide in the predicate, the two
    // reported ratios divide once each. Sums are scale-0 micro-unit
    // integers (the q36 routing — the quarter sums sit within one
    // order of 2^53 unscaled at sf10, where plain DECIMAL(18,6)
    // double-rounds in DuckDB; the 1e6 scaling cancels in the ratios).
    "tpcds_q31_growth_compare" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("tpcds31_sales")
      s.sql("""WITH a AS (
              |  SELECT n_name,
              |    CAST(l_linenumber % 2 AS INT) AS chan,
              |    CAST(quarter(o_orderdate) AS INT) AS qtr,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
              |  FROM tpcds31_sales
              |  WHERE CAST(quarter(o_orderdate) AS INT) IN (1, 2)
              |  GROUP BY n_name, CAST(l_linenumber % 2 AS INT),
              |    CAST(quarter(o_orderdate) AS INT)),
              |p AS (
              |  SELECT n_name,
              |    SUM(CASE WHEN chan = 1 AND qtr = 1 THEN rev_u END) AS web1,
              |    SUM(CASE WHEN chan = 1 AND qtr = 2 THEN rev_u END) AS web2,
              |    SUM(CASE WHEN chan = 0 AND qtr = 1 THEN rev_u END) AS store1,
              |    SUM(CASE WHEN chan = 0 AND qtr = 2 THEN rev_u END) AS store2
              |  FROM a GROUP BY n_name)
              |SELECT n_name,
              |  CAST(web2 AS DOUBLE) / CAST(web1 AS DOUBLE) AS web_growth,
              |  CAST(store2 AS DOUBLE) / CAST(store1 AS DOUBLE) AS store_growth
              |FROM p
              |WHERE web1 IS NOT NULL AND web2 IS NOT NULL
              |  AND store1 IS NOT NULL AND store2 IS NOT NULL
              |  AND CAST(web2 AS DOUBLE) * CAST(store1 AS DOUBLE)
              |    > CAST(store2 AS DOUBLE) * CAST(web1 AS DOUBLE)
              |ORDER BY n_name""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT n_name, l_linenumber, o_orderdate,
             |    l_extendedprice, l_discount
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey),
             |a AS (
             |  SELECT n_name,
             |    CAST(l_linenumber % 2 AS INT) AS chan,
             |    CAST(quarter(o_orderdate) AS INT) AS qtr,
             |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
             |  FROM sales
             |  WHERE CAST(quarter(o_orderdate) AS INT) IN (1, 2)
             |  GROUP BY n_name, CAST(l_linenumber % 2 AS INT),
             |    CAST(quarter(o_orderdate) AS INT)),
             |p AS (
             |  SELECT n_name,
             |    SUM(CASE WHEN chan = 1 AND qtr = 1 THEN rev_u END) AS web1,
             |    SUM(CASE WHEN chan = 1 AND qtr = 2 THEN rev_u END) AS web2,
             |    SUM(CASE WHEN chan = 0 AND qtr = 1 THEN rev_u END) AS store1,
             |    SUM(CASE WHEN chan = 0 AND qtr = 2 THEN rev_u END) AS store2
             |  FROM a GROUP BY n_name)
             |SELECT n_name,
             |  CAST(web2 AS DOUBLE) / CAST(web1 AS DOUBLE) AS web_growth,
             |  CAST(store2 AS DOUBLE) / CAST(store1 AS DOUBLE) AS store_growth
             |FROM p
             |WHERE web1 IS NOT NULL AND web2 IS NOT NULL
             |  AND store1 IS NOT NULL AND store2 IS NOT NULL
             |  AND CAST(web2 AS DOUBLE) * CAST(store1 AS DOUBLE)
             |    > CAST(store2 AS DOUBLE) * CAST(web1 AS DOUBLE)
             |ORDER BY n_name""".stripMargin), bench = true),

    // q23 shape: total sales restricted to FREQUENT items (sold >35
    // times — the HAVING-count semi-join) bought by BEST customers
    // (spend above half the max spend — the scalar-aggregate-threshold
    // semi-join). Both reducing sets are aggregates of the fact itself;
    // the max-spend scalar is a 1-row aggregate broadcast (never an
    // empty-over() window). The two IN's plan as semi-joins whose build
    // sides are already tiny before the final scan.
    "tpcds_q23_frequent_best" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds23_sales")
      // The spend frame feeds both the max-spend scalar and the
      // best-customer probe — a CTE would inline twice and re-scan the
      // fact, so it is computed ONCE and localCheckpointed
      // (customer-grain). The freq reducer and the final semi-joined
      // sum are different grains of the fact and keep their own scans;
      // a (customer, item)-grain collapse would NOT help here — in
      // this corpus a customer rarely repeats an item, so that frame
      // is ~line-sized and materializing it costs a fact-write to save
      // a fact-read.
      s.sql("""SELECT o_custkey,
              |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp_d
              |FROM tpcds23_sales GROUP BY o_custkey""".stripMargin)
        .localCheckpoint(true)
        .createOrReplaceTempView("tpcds23_spend")
      s.sql("""WITH freq AS (
              |  SELECT l_partkey FROM tpcds23_sales
              |  GROUP BY l_partkey HAVING count(*) > 35),
              |mx AS (SELECT MAX(sp_d) AS max_d FROM tpcds23_spend),
              |best AS (
              |  SELECT o_custkey FROM tpcds23_spend CROSS JOIN mx
              |  WHERE CAST(sp_d AS DOUBLE) * 2.0 > CAST(max_d AS DOUBLE))
              |SELECT
              |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
              |    AS total_sales,
              |  count(*) AS n_rows
              |FROM tpcds23_sales
              |WHERE l_partkey IN (SELECT l_partkey FROM freq)
              |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT l_partkey, o_custkey, l_extendedprice
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |freq AS (
             |  SELECT l_partkey FROM sales
             |  GROUP BY l_partkey HAVING count(*) > 35),
             |spend AS (
             |  SELECT o_custkey,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp_d
             |  FROM sales GROUP BY o_custkey),
             |mx AS (SELECT MAX(sp_d) AS max_d FROM spend),
             |best AS (
             |  SELECT o_custkey FROM spend CROSS JOIN mx
             |  WHERE CAST(sp_d AS DOUBLE) * 2.0 > CAST(max_d AS DOUBLE))
             |SELECT
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS total_sales,
             |  count(*) AS n_rows
             |FROM sales
             |WHERE l_partkey IN (SELECT l_partkey FROM freq)
             |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin), bench = true),

    // q35 shape: demographic rollup of customers active in the store
    // channel AND (web OR catalog) — the OR-of-IN-subqueries that
    // Catalyst can NOT lower to plain semi-joins: each IN inside the
    // disjunction becomes an ExistenceJoin (a semi-join emitting an
    // exists-flag column the filter then combines), the one join
    // variant no other gate exercises. The three channel key sets are
    // distinct aggregates of the fact; the demographic side is the
    // customer dimension. Plan-guarded: ExistenceJoin present, no
    // cartesian.
    "tpcds_q35_or_exists_demo" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds35_sales")
      T(s, dir, "customer")
        .join(T(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("tpcds35_cust")
      s.sql("""WITH cust AS (
              |  SELECT c_custkey, n_name, c_mktsegment, c_acctbal
              |  FROM tpcds35_cust
              |  WHERE c_custkey IN (SELECT o_custkey FROM tpcds35_sales
              |      WHERE CAST(l_linenumber % 3 AS INT) = 0)
              |    AND (c_custkey IN (SELECT o_custkey FROM tpcds35_sales
              |        WHERE CAST(l_linenumber % 3 AS INT) = 1)
              |      OR c_custkey IN (SELECT o_custkey FROM tpcds35_sales
              |        WHERE CAST(l_linenumber % 3 AS INT) = 2)))
              |SELECT n_name, c_mktsegment, count(*) AS cnt,
              |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              |    AS sum_bal,
              |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              |    AS max_bal
              |FROM cust GROUP BY n_name, c_mktsegment
              |ORDER BY n_name, c_mktsegment""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, l_linenumber
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |cust AS (
             |  SELECT c_custkey, n_name, c_mktsegment, c_acctbal
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey
             |  WHERE c_custkey IN (SELECT o_custkey FROM sales
             |      WHERE CAST(l_linenumber % 3 AS INT) = 0)
             |    AND (c_custkey IN (SELECT o_custkey FROM sales
             |        WHERE CAST(l_linenumber % 3 AS INT) = 1)
             |      OR c_custkey IN (SELECT o_custkey FROM sales
             |        WHERE CAST(l_linenumber % 3 AS INT) = 2)))
             |SELECT n_name, c_mktsegment, count(*) AS cnt,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_bal,
             |  CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             |    AS max_bal
             |FROM cust GROUP BY n_name, c_mktsegment
             |ORDER BY n_name, c_mktsegment""".stripMargin), bench = true),

    // q93 shape: net sales after returns. The oracle keeps the
    // aggregate-before-join spelling (sold and returned sides each
    // aggregated to (order, part) grain, LEFT joined 1:1); both sides
    // are slices of the SAME fact at the SAME grain, so the engine
    // fuses them into one conditional aggregation (the q17 doctrine) —
    // the left join's "sold side only" becomes `qty IS NOT NULL`, the
    // missing-returns coalesce stays. One fact scan, one exchange, no
    // join. Quantities stay DECIMAL(18,2)-exact through subtract and
    // re-sum; the top-100 orders by the double cast ONCE from the exact
    // net (identical on both engines) with a custkey tiebreak.
    "tpcds_q93_net_after_returns" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds93_sales")
      s.sql("""WITH g AS (
              |  SELECT l_orderkey, l_partkey, o_custkey,
              |    SUM(CASE WHEN l_returnflag <> 'R'
              |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS qty,
              |    SUM(CASE WHEN l_returnflag = 'R'
              |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS ret_qty
              |  FROM tpcds93_sales
              |  GROUP BY l_orderkey, l_partkey, o_custkey),
              |net AS (
              |  SELECT o_custkey,
              |    SUM(qty - coalesce(ret_qty,
              |      CAST(0 AS DECIMAL(18,2)))) AS net_qty
              |  FROM g WHERE qty IS NOT NULL
              |  GROUP BY o_custkey)
              |SELECT o_custkey, CAST(net_qty AS DOUBLE) AS net_qty
              |FROM net
              |ORDER BY net_qty DESC, o_custkey
              |LIMIT 100""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT l_orderkey, l_partkey, o_custkey, l_quantity,
             |    l_returnflag
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sold AS (
             |  SELECT l_orderkey, l_partkey, o_custkey,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
             |  FROM sales WHERE l_returnflag <> 'R'
             |  GROUP BY l_orderkey, l_partkey, o_custkey),
             |ret AS (
             |  SELECT l_orderkey, l_partkey,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS ret_qty
             |  FROM sales WHERE l_returnflag = 'R'
             |  GROUP BY l_orderkey, l_partkey),
             |net AS (
             |  SELECT o_custkey,
             |    SUM(sold.qty - coalesce(ret.ret_qty,
             |      CAST(0 AS DECIMAL(18,2)))) AS net_qty
             |  FROM sold LEFT JOIN ret
             |    ON sold.l_orderkey = ret.l_orderkey
             |    AND sold.l_partkey = ret.l_partkey
             |  GROUP BY o_custkey)
             |SELECT o_custkey, CAST(net_qty AS DOUBLE) AS net_qty
             |FROM net
             |ORDER BY net_qty DESC, o_custkey
             |LIMIT 100""".stripMargin), bench = true),

    // q49 shape: worst-return items per channel under TWO rankings
    // (return ratio by quantity AND by amount), keeping items in either
    // top-10 — the dual-rank union. Both windows share ONE partition
    // spec (channel) so Catalyst plans one exchange with two sorts; the
    // rank<=10 disjunction keeps the filter above the window (the OR
    // defeats WindowGroupLimit inference, but the windowed frame is the
    // per-channel ITEM aggregate — dimension-sized, not corpus-sized).
    // Ratios divide once on decimal-exact sums; rank order is the ratio
    // with a partkey tiebreak, so ranks are total and deterministic.
    "tpcds_q49_return_ranks" -> Q((s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("tpcds49_sales")
      s.sql("""WITH r AS (
              |  SELECT
              |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
              |    l_partkey,
              |    SUM(CASE WHEN l_returnflag = 'R'
              |      THEN CAST(l_quantity AS DECIMAL(18,2))
              |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_qty,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tot_qty,
              |    SUM(CASE WHEN l_returnflag = 'R'
              |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
              |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_amt,
              |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot_amt
              |  FROM tpcds49_sales
              |  GROUP BY CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |    WHEN 1 THEN 'store' ELSE 'catalog' END, l_partkey),
              |rk AS (
              |  SELECT channel, l_partkey,
              |    CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE)
              |      AS qty_ratio,
              |    CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE)
              |      AS amt_ratio,
              |    CAST(rank() OVER (PARTITION BY channel
              |      ORDER BY CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE)
              |        DESC, l_partkey) AS INT) AS qty_rank,
              |    CAST(rank() OVER (PARTITION BY channel
              |      ORDER BY CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE)
              |        DESC, l_partkey) AS INT) AS amt_rank
              |  FROM r)
              |SELECT channel, l_partkey, qty_ratio, amt_ratio,
              |  qty_rank, amt_rank
              |FROM rk WHERE qty_rank <= 10 OR amt_rank <= 10
              |ORDER BY channel, l_partkey""".stripMargin)
    }, Some("""WITH r AS (
             |  SELECT
             |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
             |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
             |    l_partkey,
             |    SUM(CASE WHEN l_returnflag = 'R'
             |      THEN CAST(l_quantity AS DECIMAL(18,2))
             |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_qty,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS tot_qty,
             |    SUM(CASE WHEN l_returnflag = 'R'
             |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
             |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_amt,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot_amt
             |  FROM lineitem
             |  GROUP BY CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
             |    WHEN 1 THEN 'store' ELSE 'catalog' END, l_partkey),
             |rk AS (
             |  SELECT channel, l_partkey,
             |    CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE)
             |      AS qty_ratio,
             |    CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE)
             |      AS amt_ratio,
             |    CAST(rank() OVER (PARTITION BY channel
             |      ORDER BY CAST(ret_qty AS DOUBLE) / CAST(tot_qty AS DOUBLE)
             |        DESC, l_partkey) AS INT) AS qty_rank,
             |    CAST(rank() OVER (PARTITION BY channel
             |      ORDER BY CAST(ret_amt AS DOUBLE) / CAST(tot_amt AS DOUBLE)
             |        DESC, l_partkey) AS INT) AS amt_rank
             |  FROM r)
             |SELECT channel, l_partkey, qty_ratio, amt_ratio,
             |  qty_rank, amt_rank
             |FROM rk WHERE qty_rank <= 10 OR amt_rank <= 10
             |ORDER BY channel, l_partkey""".stripMargin), bench = true),

    // q39 shape: coefficient-of-variation screen over consecutive
    // periods — TPC-DS's inventory-volatility query re-derived over
    // (brand, ship month). stddev_samp is NOT summed as doubles
    // (partial-aggregation order would make it run-dependent): both
    // engines aggregate the EXACT moments — count, SUM(qty) and
    // SUM(qty*qty) as decimals (DECIMAL(18,2)^2 = scale-4 exact) — and
    // the variance/cov come from one fixed-shape double expression over
    // those exact operands, so the doubles are bit-identical across
    // engines and runs. The volatility threshold is scale-invariant by
    // the q65 doctrine: a month qualifies when its cov is strictly above
    // the brand's own pooled cov (~half the months, at every sf), never
    // a fixed constant that drifts empty as per-cell samples grow.
    //
    // TPC-DS spells this as TWO aggregate CTEs joined plus a
    // consecutive-period SELF-JOIN — the oracle keeps that spelling, and
    // Spark would inline the shared CTE into every reference (no
    // physical CTE reuse), scanning the fact 4×. The engine instead
    // derives BOTH from one (brand, month) moment frame: the brand's
    // pooled moments are window sums PARTITION BY brand (the frame is
    // |brand×month| ≈ 300 rows), and the month-pairing is lead() over
    // the same partition — months are densely ordered, so "self-join on
    // mon+1 among qualifying months" ⟺ "lead row qualifies and is
    // exactly mon+1" (the q47 lag/lead doctrine). One fact scan, zero
    // joins, both windows behind one brand exchange — all plan-guarded.
    // greatest(var, 0) guards the 1-ulp negative a double subtraction of
    // equal exact moments can produce.
    "tpcds_q39_monthly_cov" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds39_sales")
      s.sql("""WITH m AS (
              |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
              |    count(*) AS n,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s1,
              |    SUM(CAST(l_quantity AS DECIMAL(18,2)) *
              |      CAST(l_quantity AS DECIMAL(18,2))) AS s2
              |  FROM tpcds39_sales
              |  GROUP BY p_brand, month(l_shipdate)),
              |w AS (
              |  SELECT p_brand, mon, n, s1, s2,
              |    SUM(n)  OVER (PARTITION BY p_brand) AS nb,
              |    SUM(s1) OVER (PARTITION BY p_brand) AS b1,
              |    SUM(s2) OVER (PARTITION BY p_brand) AS b2
              |  FROM m),
              |cv AS (
              |  SELECT p_brand, mon,
              |    sqrt(greatest((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
              |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
              |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 0.0)) /
              |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS cov,
              |    CASE WHEN nb >= 24 THEN
              |      sqrt(greatest((CAST(nb AS DOUBLE) * CAST(b2 AS DOUBLE) -
              |          CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)) /
              |        (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)), 0.0)) /
              |        (CAST(b1 AS DOUBLE) / CAST(nb AS DOUBLE))
              |    END AS cov_brand
              |  FROM w WHERE n >= 5),
              |p AS (
              |  SELECT p_brand, mon, cov, cov_brand,
              |    (cov_brand IS NOT NULL AND cov > cov_brand) AS qual,
              |    lead(mon)  OVER (PARTITION BY p_brand ORDER BY mon) AS mon2,
              |    lead(cov)  OVER (PARTITION BY p_brand ORDER BY mon) AS cov2,
              |    lead(cov_brand IS NOT NULL AND cov > cov_brand)
              |      OVER (PARTITION BY p_brand ORDER BY mon) AS qual2
              |  FROM cv)
              |SELECT p_brand, mon AS mon1, mon2, cov AS cov1, cov2, cov_brand
              |FROM p
              |WHERE qual AND qual2 AND mon2 = mon + 1
              |ORDER BY p_brand, mon""".stripMargin)
    }, Some("""WITH m AS (
             |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mon,
             |    count(*) AS n,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s1,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2)) *
             |      CAST(l_quantity AS DECIMAL(18,2))) AS s2
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY p_brand, month(l_shipdate)),
             |cv AS (
             |  SELECT p_brand, mon,
             |    sqrt(greatest((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
             |        CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
             |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 0.0)) /
             |      (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS cov
             |  FROM m WHERE n >= 5),
             |b AS (
             |  SELECT p_brand, SUM(n) AS nb,
             |    SUM(s1) AS b1, SUM(s2) AS b2
             |  FROM m GROUP BY p_brand),
             |bc AS (
             |  SELECT p_brand,
             |    sqrt(greatest((CAST(nb AS DOUBLE) * CAST(b2 AS DOUBLE) -
             |        CAST(b1 AS DOUBLE) * CAST(b1 AS DOUBLE)) /
             |      (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)), 0.0)) /
             |      (CAST(b1 AS DOUBLE) / CAST(nb AS DOUBLE)) AS cov_brand
             |  FROM b WHERE nb >= 24),
             |q AS (
             |  SELECT cv.p_brand, cv.mon, cv.cov, bc.cov_brand
             |  FROM cv JOIN bc ON cv.p_brand = bc.p_brand
             |  WHERE cv.cov > bc.cov_brand)
             |SELECT x.p_brand, x.mon AS mon1, y.mon AS mon2,
             |  x.cov AS cov1, y.cov AS cov2, x.cov_brand
             |FROM q x JOIN q y
             |  ON x.p_brand = y.p_brand AND y.mon = x.mon + 1
             |ORDER BY x.p_brand, x.mon""".stripMargin), bench = true),

    // q14 shape: cross-channel INTERSECT feeding a downstream rollup —
    // items sold in ALL THREE channels (two set-intersections over
    // per-channel distinct item sets), then a (channel, category)
    // ROLLUP of revenue restricted to those items, kept above an
    // average-revenue scalar. Unlike q38 (whose intersect IS the
    // answer), the intersect result here is an upstream reducer: it
    // lowers to distinct aggregates + LeftSemi joins, the item set
    // semi-joins into the rollup input, and the 1-row average broadcasts
    // into the rollup filter — intersect → semi-join → scalar → Expand.
    //
    // The line-grain frame is referenced FIVE times (3 intersect
    // branches + the average + the rollup); Spark inlines multi-ref
    // CTEs (no physical reuse — probed, ~5 fact scans), so the engine
    // first collapses the fact ONCE to (channel, category, item) grain
    // — every downstream consumer is expressible at that grain — and
    // eagerly localCheckpoints that ~3·|part|-row frame (the
    // PageRank/Triangles iteration idiom). The fact is scanned once;
    // the intersect/scalar/rollup plan reads the checkpointed frame.
    // At 100 TB the checkpoint is ~1000× smaller than the fact.
    // Revenue stays scale-0 micro-unit DECIMAL(38,0) until ONE
    // single-step cast to DOUBLE (exact past 2^53 in both engines, the
    // q98 doctrine), so the scalar compare is deterministic.
    "tpcds_q14_intersect_rollup" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .createOrReplaceTempView("tpcds14_sales")
      s.sql("""SELECT channel, category, l_partkey,
              |  SUM(rev_u) AS rev_u, count(*) AS n_lines
              |FROM (
              |  SELECT element_at(split(p_type, ' '), 1) AS category,
              |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
              |    l_partkey,
              |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
              |  FROM tpcds14_sales)
              |GROUP BY channel, category, l_partkey""".stripMargin)
        .localCheckpoint(true)
        .createOrReplaceTempView("tpcds14_ci")
      s.sql("""WITH xitems AS (
              |  SELECT l_partkey FROM tpcds14_ci WHERE channel = 'web'
              |  INTERSECT
              |  SELECT l_partkey FROM tpcds14_ci WHERE channel = 'store'
              |  INTERSECT
              |  SELECT l_partkey FROM tpcds14_ci WHERE channel = 'catalog'),
              |avgscalar AS (
              |  SELECT CAST(SUM(rev_u) AS DOUBLE) / 1000000.0 / count(*)
              |    AS avg_item_rev
              |  FROM (SELECT channel, l_partkey, SUM(rev_u) AS rev_u
              |        FROM tpcds14_ci GROUP BY channel, l_partkey) t),
              |r AS (
              |  SELECT channel, category,
              |    SUM(rev_u) AS rev_u, SUM(n_lines) AS n_lines
              |  FROM tpcds14_ci
              |  WHERE l_partkey IN (SELECT l_partkey FROM xitems)
              |  GROUP BY ROLLUP (channel, category))
              |SELECT channel, category,
              |  CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue, n_lines
              |FROM r
              |WHERE CAST(rev_u AS DOUBLE) / 1000000.0 >
              |  (SELECT avg_item_rev FROM avgscalar)
              |ORDER BY channel NULLS FIRST, category NULLS FIRST""".stripMargin)
    }, Some("""WITH base AS (
             |  SELECT string_split(p_type, ' ')[1] AS category,
             |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
             |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel,
             |    l_partkey,
             |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |xitems AS (
             |  SELECT l_partkey FROM base WHERE channel = 'web'
             |  INTERSECT
             |  SELECT l_partkey FROM base WHERE channel = 'store'
             |  INTERSECT
             |  SELECT l_partkey FROM base WHERE channel = 'catalog'),
             |avgscalar AS (
             |  SELECT CAST(SUM(rev_u) AS DOUBLE) / 1000000.0 / count(*)
             |    AS avg_item_rev
             |  FROM (SELECT channel, l_partkey, SUM(rev_u) AS rev_u
             |        FROM base GROUP BY channel, l_partkey) t),
             |r AS (
             |  SELECT channel, category,
             |    SUM(rev_u) AS rev_u, count(*) AS n_lines
             |  FROM base
             |  WHERE l_partkey IN (SELECT l_partkey FROM xitems)
             |  GROUP BY ROLLUP (channel, category))
             |SELECT channel, category,
             |  CAST(rev_u AS DOUBLE) / 1000000.0 AS revenue, n_lines
             |FROM r
             |WHERE CAST(rev_u AS DOUBLE) / 1000000.0 >
             |  (SELECT avg_item_rev FROM avgscalar)
             |ORDER BY channel NULLS FIRST, category NULLS FIRST""".stripMargin), bench = true),

    // q17 shape: the buy → return → re-buy funnel — three slices of the
    // SAME fact (store sale, store return, catalog re-purchase) chained
    // on a composite customer key. TPC-DS (and the oracle, verbatim)
    // spells it as three per-slice aggregates inner-joined on that key;
    // Spark would inline the shared line-grain CTE into each slice and
    // scan the fact three times. All three slices share ONE grouping key,
    // so the engine fuses them into a single conditional aggregation —
    // SUM(CASE) per slice at (customer, bucket) grain, then "chain
    // exists" ⟺ all three slice counts > 0 (exactly the 3-way inner
    // join's survivors, the q88 fused-slices doctrine). One fact scan,
    // one exchange, zero joins between slices — plan-guarded. The chain
    // key's item axis is a FIXED 100-bucket hash of partkey, not partkey
    // itself: lines-per-customer is corpus-invariant while |part| grows
    // with sf, so a raw-partkey chain empties at scale (the q65
    // degeneracy, pre-empted) — the fixed bucket space keeps
    // per-customer hit rates, and so chain selectivity, constant at
    // every sf.
    "tpcds_q17_buy_return_rebuy" -> Q((s, dir) => {
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .createOrReplaceTempView("tpcds17_sales")
      s.sql("""WITH sales AS (
              |  SELECT o_custkey, CAST(l_partkey % 100 AS INT) AS part_bucket,
              |    l_quantity, l_returnflag,
              |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
              |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel
              |  FROM tpcds17_sales),
              |g AS (
              |  SELECT o_custkey, part_bucket,
              |    SUM(CASE WHEN channel = 'store' AND l_returnflag <> 'R'
              |      THEN 1 ELSE 0 END) AS n_s,
              |    SUM(CASE WHEN channel = 'store' AND l_returnflag <> 'R'
              |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS q_s,
              |    SUM(CASE WHEN channel = 'store' AND l_returnflag = 'R'
              |      THEN 1 ELSE 0 END) AS n_r,
              |    SUM(CASE WHEN channel = 'store' AND l_returnflag = 'R'
              |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS q_r,
              |    SUM(CASE WHEN channel = 'catalog'
              |      THEN 1 ELSE 0 END) AS n_c,
              |    SUM(CASE WHEN channel = 'catalog'
              |      THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS q_c
              |  FROM sales GROUP BY o_custkey, part_bucket),
              |chain AS (
              |  SELECT part_bucket, n_s, q_s, n_r, q_r, n_c, q_c
              |  FROM g WHERE n_s > 0 AND n_r > 0 AND n_c > 0)
              |SELECT part_bucket, count(*) AS n_chains,
              |  CAST(SUM(n_s) AS BIGINT) AS store_lines,
              |  CAST(SUM(q_s) AS DOUBLE) / CAST(SUM(n_s) AS DOUBLE) AS avg_store_qty,
              |  CAST(SUM(n_r) AS BIGINT) AS return_lines,
              |  CAST(SUM(q_r) AS DOUBLE) / CAST(SUM(n_r) AS DOUBLE) AS avg_return_qty,
              |  CAST(SUM(n_c) AS BIGINT) AS catalog_lines,
              |  CAST(SUM(q_c) AS DOUBLE) / CAST(SUM(n_c) AS DOUBLE) AS avg_catalog_qty
              |FROM chain GROUP BY part_bucket
              |ORDER BY part_bucket""".stripMargin)
    }, Some("""WITH sales AS (
             |  SELECT o_custkey, CAST(l_partkey % 100 AS INT) AS part_bucket,
             |    l_quantity, l_returnflag,
             |    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'web'
             |      WHEN 1 THEN 'store' ELSE 'catalog' END AS channel
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |st AS (
             |  SELECT o_custkey, part_bucket, count(*) AS n_s,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_s
             |  FROM sales WHERE channel = 'store' AND l_returnflag <> 'R'
             |  GROUP BY o_custkey, part_bucket),
             |sr AS (
             |  SELECT o_custkey, part_bucket, count(*) AS n_r,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_r
             |  FROM sales WHERE channel = 'store' AND l_returnflag = 'R'
             |  GROUP BY o_custkey, part_bucket),
             |cs AS (
             |  SELECT o_custkey, part_bucket, count(*) AS n_c,
             |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q_c
             |  FROM sales WHERE channel = 'catalog'
             |  GROUP BY o_custkey, part_bucket),
             |chain AS (
             |  SELECT st.part_bucket, st.n_s, st.q_s, sr.n_r, sr.q_r,
             |    cs.n_c, cs.q_c
             |  FROM st
             |  JOIN sr ON st.o_custkey = sr.o_custkey
             |    AND st.part_bucket = sr.part_bucket
             |  JOIN cs ON st.o_custkey = cs.o_custkey
             |    AND st.part_bucket = cs.part_bucket)
             |SELECT part_bucket, count(*) AS n_chains,
             |  CAST(SUM(n_s) AS BIGINT) AS store_lines,
             |  CAST(SUM(q_s) AS DOUBLE) / CAST(SUM(n_s) AS DOUBLE) AS avg_store_qty,
             |  CAST(SUM(n_r) AS BIGINT) AS return_lines,
             |  CAST(SUM(q_r) AS DOUBLE) / CAST(SUM(n_r) AS DOUBLE) AS avg_return_qty,
             |  CAST(SUM(n_c) AS BIGINT) AS catalog_lines,
             |  CAST(SUM(q_c) AS DOUBLE) / CAST(SUM(n_c) AS DOUBLE) AS avg_catalog_qty
             |FROM chain GROUP BY part_bucket
             |ORDER BY part_bucket""".stripMargin), bench = true),

    // q92 shape: "excess discount" — a CORRELATED scalar subquery in the
    // WHERE clause (a line qualifies when its discount amount exceeds
    // 1.3× the average discount amount of ITS OWN part). Unlike
    // q1/q6/q65, which hand-spell the above-average screen as an
    // aggregate CTE + join, this gate keeps TPC-DS's correlated-subquery
    // spelling VERBATIM in both engines and proves Catalyst's
    // decorrelation (DecorrelateInnerQuery + RewriteCorrelatedScalar-
    // Subquery) plans the same thing the hand spelling would: one
    // per-part aggregate of the fact, equi-joined back on l_partkey —
    // never a per-row re-scan (the plan guard rejects any nested-loop).
    // The threshold is one fixed-shape double expression over exact
    // decimal moments (sum as DECIMAL(38,0) micro-units, single-step
    // cast, the q98 doctrine), so both engines compare bit-identical
    // doubles; the part dimension joins AFTER the screen, on the
    // surviving ~thousandth of the fact.
    "tpcds_q92_excess_discount" -> Q((s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("tpcds92_lineitem")
      T(s, dir, "part").createOrReplaceTempView("tpcds92_part")
      s.sql("""WITH d AS (
              |  SELECT l_partkey,
              |    CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))
              |      * 1000000 AS DECIMAL(38,0)) AS disc_u
              |  FROM tpcds92_lineitem),
              |e AS (
              |  SELECT l_partkey, disc_u FROM d s
              |  WHERE CAST(disc_u AS DOUBLE) >
              |    1.3 * (SELECT CAST(SUM(disc_u) AS DOUBLE) / count(*)
              |           FROM d x WHERE x.l_partkey = s.l_partkey))
              |SELECT p_brand, count(*) AS n_excess,
              |  CAST(SUM(disc_u) AS DOUBLE) / 1000000.0 AS excess_amt
              |FROM e JOIN tpcds92_part ON l_partkey = p_partkey
              |GROUP BY p_brand
              |ORDER BY p_brand""".stripMargin)
    }, Some("""WITH d AS (
             |  SELECT l_partkey,
             |    CAST(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))
             |      * 1000000 AS DECIMAL(38,0)) AS disc_u
             |  FROM lineitem),
             |e AS (
             |  SELECT l_partkey, disc_u FROM d s
             |  WHERE CAST(disc_u AS DOUBLE) >
             |    1.3 * (SELECT CAST(SUM(disc_u) AS DOUBLE) / count(*)
             |           FROM d x WHERE x.l_partkey = s.l_partkey))
             |SELECT p_brand, count(*) AS n_excess,
             |  CAST(SUM(disc_u) AS DOUBLE) / 1000000.0 AS excess_amt
             |FROM e JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin), bench = true),

    // q95 shape: orders shipped by TWO-PLUS distinct suppliers that also
    // had a return — TPC-DS spells both screens as EXISTS over a
    // SELF-JOIN of the fact (ws1 ⋈ ws2 on order, different warehouse;
    // plus a returns probe). At 100 TB that's two shuffled semi-joins of
    // the fact against itself. The engine replaces both with ONE
    // map-side-combinable aggregate at order grain: "≥2 distinct
    // suppliers" ⟺ min(suppkey) ≠ max(suppkey) — min/max carry partials
    // and never Expand, unlike count(DISTINCT); "any return" is a
    // max(CASE). One exchange on l_orderkey, the fact scanned ONCE
    // (plan-guarded), then the order-grain frame joins orders for the
    // priority rollup. The DuckDB oracle keeps the EXISTS spelling —
    // line-level EXISTS and order-level qualification coincide exactly
    // (every line of a ≥2-supplier order has a different-supplier
    // sibling), which the hash compare proves.
    "tpcds_q95_multi_supplier_returned" -> Q((s, dir) => {
      T(s, dir, "lineitem").createOrReplaceTempView("tpcds95_lineitem")
      T(s, dir, "orders").createOrReplaceTempView("tpcds95_orders")
      s.sql("""WITH agg AS (
              |  SELECT l_orderkey,
              |    min(l_suppkey) AS s_min, max(l_suppkey) AS s_max,
              |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              |      AS has_ret,
              |    count(*) AS n_lines,
              |    SUM(CAST(CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0))) AS rev_u
              |  FROM tpcds95_lineitem
              |  GROUP BY l_orderkey),
              |q AS (
              |  SELECT l_orderkey, n_lines, rev_u FROM agg
              |  WHERE s_min <> s_max AND has_ret = 1)
              |SELECT o_orderpriority, count(*) AS n_orders,
              |  CAST(SUM(n_lines) AS BIGINT) AS total_lines,
              |  CAST(SUM(rev_u) AS DOUBLE) / 1000000.0 AS revenue
              |FROM q JOIN tpcds95_orders ON l_orderkey = o_orderkey
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    }, Some("""WITH lines AS (
             |  SELECT l_orderkey,
             |    CAST(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,6)) * 1000000 AS DECIMAL(38,0)) AS rev_u
             |  FROM lineitem l1
             |  WHERE EXISTS (SELECT 1 FROM lineitem l2
             |                WHERE l2.l_orderkey = l1.l_orderkey
             |                  AND l2.l_suppkey <> l1.l_suppkey)
             |    AND EXISTS (SELECT 1 FROM lineitem l3
             |                WHERE l3.l_orderkey = l1.l_orderkey
             |                  AND l3.l_returnflag = 'R')),
             |q AS (
             |  SELECT l_orderkey, count(*) AS n_lines, SUM(rev_u) AS rev_u
             |  FROM lines GROUP BY l_orderkey)
             |SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(SUM(n_lines) AS BIGINT) AS total_lines,
             |  CAST(SUM(rev_u) AS DOUBLE) / 1000000.0 AS revenue
             |FROM q JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin), bench = true))
}
