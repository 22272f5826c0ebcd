package graft.queries

import QueryUtil._

/** TPC-H composite-shape completion (SURVEY.md §2.B "delegated SQL
  * surface"): the remaining canonical TPC-H query SHAPES expressible over
  * the driver fixture, adapted where the fixture omits a table or column
  * (no partsupp, no c_phone, no l_commitdate/l_receiptdate — the
  * adaptations keep every JOIN/subquery/aggregation structure and swap
  * only the missing selection column; each entry documents its swap).
  *
  * With CoreQueriesA/D this completes ALL 22 TPC-H shapes: Q1-Q22.
  * Q11/Q16/Q20 are partsupp-pivoted and the fixture ships no partsupp —
  * they run over a deterministic derived partsupp (PartsuppCte: seeded
  * integer arithmetic over part x {0..3}, the identical CTE text
  * evaluated by both engines), preserving every join/subquery structure.
  * Q9's supplycost is replaced by a retail-price proxy which preserves
  * the 5-way join + profit-by-nation-and-year structure.
  *
  * Every query is a single SQL text run through BOTH Catalyst and the
  * DuckDB oracle (sqlQ) — the exact-decimal money discipline
  * (CAST ... DECIMAL(14,2)/(4,2), final CAST AS DOUBLE) keeps distributed
  * sum order from drifting the hash, and `CAST(year(..) AS BIGINT)`
  * aligns Spark's INT year() with DuckDB's BIGINT.
  *
  * Scale notes (100 TB): all queries are fact-side shuffle joins on their
  * natural keys with dimension sides small enough for AQE to broadcast;
  * the EXISTS/NOT EXISTS pairs plan as one semi + one anti join over the
  * same shuffle (PlanSpec pins q21's shape); nothing materializes an
  * unbounded intermediate.
  */
object CoreQueriesF {

  /** One string serves both engines — the query and its oracle cannot
    * drift apart (same contract as CoreQueriesD.sqlQ).
    */
  private def sqlQ(name: String, tables: Seq[String], sql: String): Q =
    Q(name, (s, dir) => views(s, dir, tables: _*).sql(sql), Some(sql))

  /** Exact-decimal line revenue: extendedprice * (1 - discount). */
  private val Rev =
    "CAST(l_extendedprice AS DECIMAL(14,2)) * " +
      "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val all: Seq[Q] = Seq(
    // Q7 volume shipping: bi-directional nation-pair revenue by year —
    // the classic disjunctive join filter ((A,B) OR (B,A)) over a 5-way
    // star. Nations 3/8 have suppliers at every fixture SF.
    sqlQ(
      "q7_volume_shipping",
      Seq("supplier", "lineitem", "orders", "customer", "nation"),
      "SELECT supp_nation, cust_nation, l_year, " +
        "CAST(sum(volume) AS DOUBLE) AS revenue " +
        "FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        s"CAST(year(l_shipdate) AS BIGINT) AS l_year, $Rev AS volume " +
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN customer ON c_custkey = o_custkey " +
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
        "WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8') " +
        "OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')) shipping " +
        "GROUP BY supp_nation, cust_nation, l_year " +
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
    // Q8 market share: one nation's share of a region's import volume by
    // year — conditional-sum ratio over a 7-way join (two roles for
    // nation). The ratio divides two exact decimal sums as doubles, which
    // both engines compute identically (decimal DIVISION scale rules
    // differ between engines; double division does not).
    sqlQ(
      "q8_market_share",
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
      "SELECT o_year, " +
        "CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume " +
        "ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) / " +
        "CAST(sum(volume) AS DOUBLE) AS mkt_share " +
        "FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"$Rev AS volume, n2.n_name AS nation " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
        "JOIN region ON n1.n_regionkey = r_regionkey " +
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
        "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') all_nations " +
        "GROUP BY o_year ORDER BY o_year"
    ),
    // Q9 product-type profit by nation and year. Fixture has no partsupp,
    // so ps_supplycost is proxied by 10% of p_retailprice per unit — the
    // part-name LIKE filter, the 5-way join, and the profit =
    // revenue - cost aggregation structure are Q9's. The two sums stay
    // exact decimals until a final double subtraction.
    sqlQ(
      "q9_product_profit",
      Seq("part", "supplier", "lineitem", "orders", "nation"),
      "SELECT nation, o_year, " +
        "CAST(sum(rev) AS DOUBLE) - CAST(sum(cost) AS DOUBLE) AS sum_profit " +
        "FROM (SELECT n_name AS nation, " +
        "CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
        s"$Rev AS rev, " +
        "CAST(p_retailprice AS DECIMAL(14,2)) * " +
        "CAST(l_quantity AS DECIMAL(14,2)) * " +
        "CAST(0.1 AS DECIMAL(4,2)) AS cost " +
        "FROM part JOIN lineitem ON p_partkey = l_partkey " +
        "JOIN supplier ON s_suppkey = l_suppkey " +
        "JOIN orders ON o_orderkey = l_orderkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE p_name LIKE '%widget%') profit " +
        "GROUP BY nation, o_year ORDER BY nation, o_year"
    ),
    // Q10 returned-item reporting: top-20 customers by lost revenue in a
    // quarter — group-by over a 4-way join with a returnflag selection.
    // ORDER BY revenue DESC then the grouped unique key keeps the LIMIT
    // deterministic across engines.
    sqlQ(
      "q10_returned_items",
      Seq("customer", "orders", "lineitem", "nation"),
      s"SELECT c_custkey, c_name, CAST(sum($Rev) AS DOUBLE) AS revenue, " +
        "c_acctbal, n_name " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' AND l_returnflag = 'R' " +
        "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    // Q15 top supplier: the view-based max-revenue lookup, expressed as a
    // CTE referenced twice (once joined, once under max()) — equality on
    // the EXACT decimal sum, cast to double only for output, so the
    // max-match cannot be lost to FP noise in either engine.
    sqlQ(
      "q15_top_supplier",
      Seq("supplier", "lineitem"),
      "WITH revenue AS (" +
        s"SELECT l_suppkey AS supplier_no, sum($Rev) AS total_rev " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
        "SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue " +
        "FROM supplier JOIN revenue ON s_suppkey = supplier_no " +
        "WHERE total_rev = (SELECT max(total_rev) FROM revenue) " +
        "ORDER BY s_suppkey"
    ),
    // Q17 small-quantity-order revenue: the correlated 20%-of-average
    // quantity threshold per part. p_container doesn't exist -> p_size
    // carries the second selection. The correlated average is computed as
    // exact-decimal sum / exact count, THEN scaled in double — identical
    // in both engines where a native double avg() could drift with
    // accumulation order.
    sqlQ(
      "q17_small_qty",
      Seq("lineitem", "part"),
      "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) " +
        "/ 7.0 AS avg_yearly " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE p_brand = 'Brand#23' AND p_size < 15 " +
        "AND l_quantity < (SELECT 0.2 * " +
        "(CAST(sum(CAST(l2.l_quantity AS DECIMAL(14,2))) AS DOUBLE) / count(*)) " +
        "FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"
    ),
    // Q19 discounted revenue: the classic disjunction of three
    // brand/size/quantity envelopes that exercises OR-predicate planning
    // (each disjunct references both join sides). Brand#34 doesn't exist
    // in the 25-brand fixture -> Brand#24.
    sqlQ(
      "q19_disjunctive",
      Seq("lineitem", "part"),
      s"SELECT CAST(sum($Rev) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN part ON p_partkey = l_partkey " +
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 " +
        "AND l_quantity >= 1 AND l_quantity <= 21) " +
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 " +
        "AND l_quantity >= 10 AND l_quantity <= 30) " +
        "OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 25 " +
        "AND l_quantity >= 20 AND l_quantity <= 40)"
    ),
    // Q21 suppliers who kept orders waiting: the EXISTS + NOT EXISTS pair
    // over the same fact. No commit/receipt dates in the fixture ->
    // "late" = shipped more than 60 days after the order date; the
    // multi-supplier-order EXISTS and sole-late-supplier NOT EXISTS
    // structure (one semi + one anti join) is Q21's.
    sqlQ(
      "q21_waiting_supplier",
      Seq("supplier", "lineitem", "orders", "nation"),
      "SELECT s_name, count(*) AS numwait " +
        "FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey " +
        "JOIN orders ON o_orderkey = l1.l_orderkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE o_orderstatus = 'F' " +
        "AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 " +
        "WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
        "WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey " +
        "AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
    ),
    // Q22 global sales opportunity: above-average-balance customers gone
    // quiet, counted by country code. No c_phone -> nationkey % 10 is the
    // "country code"; every fixture customer has orders -> the anti join
    // keeps Q22's NOT EXISTS but scopes it to RECENT orders (none since
    // 2000-07-01), which preserves "has balance, stopped buying".
    sqlQ(
      "q22_global_sales",
      Seq("customer", "orders"),
      "SELECT cntrycode, count(*) AS numcust, " +
        "CAST(sum(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS totacctbal " +
        "FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey " +
        "FROM customer WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5) " +
        "AND c_acctbal > (SELECT " +
        "CAST(sum(CAST(c2.c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / count(*) " +
        "FROM customer c2 WHERE c2.c_acctbal > 0.0 " +
        "AND c2.c_nationkey % 10 IN (1, 2, 3, 4, 5))) custsale " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "AND o_orderdate >= TIMESTAMP '2000-07-01') " +
        "GROUP BY cntrycode ORDER BY cntrycode"
    ),
    // Recursive CTE (Spark 4's WITH RECURSIVE): generate the full month
    // series of the order-date domain and count orders per month INCLUDING
    // empty months — the gap-filling calendar pattern a LEFT JOIN alone
    // cannot express. The recursion is driver-bounded (79 rows), then the
    // join fans out distributed.
    sqlQ(
      "q_recursive_months",
      Seq("orders"),
      "WITH RECURSIVE months(m) AS (" +
        "SELECT TIMESTAMP '1995-01-01' " +
        "UNION ALL " +
        "SELECT m + INTERVAL 1 MONTH FROM months " +
        "WHERE m < TIMESTAMP '2001-07-01') " +
        "SELECT m, count(o_orderkey) AS n_orders " +
        "FROM months LEFT JOIN orders " +
        "ON date_trunc('month', o_orderdate) = m " +
        "GROUP BY m ORDER BY m"
    ),
    // Correlated LATERAL subquery with ORDER BY + LIMIT: per-customer
    // top-2 orders — the per-group-top-N shape expressed as the SQL
    // standard's lateral join (the window-function version is q_topk's
    // family; both must exist for SQL-surface parity).
    sqlQ(
      "q_lateral_topn",
      Seq("customer", "orders"),
      "SELECT c_custkey, o_orderkey, o_totalprice " +
        "FROM customer, LATERAL (" +
        "SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_custkey = c_custkey " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top_orders " +
        "WHERE c_custkey < 20 " +
        "ORDER BY c_custkey, o_totalprice DESC, o_orderkey"
    ),
    // Q11 important stock: value of each part's stock held by one
    // nation's suppliers, kept only above a fraction of the nation's
    // total — the partsupp pivot + HAVING-over-global-scalar shape.
    // partsupp comes from PartsuppCte (see its doc); NATION_3 has
    // suppliers at every fixture SF; fraction 0.001 plays the role of
    // TPC-H's 0.0001/SF. Money discipline: per-row DECIMAL(18,2) * INT
    // products sum exactly, per-part sums re-sum exactly for the global
    // threshold, and only the final comparison/output casts to DOUBLE.
    sqlQ(
      "q11_important_stock",
      Seq("part", "supplier", "nation"),
      s"WITH $PartsuppCte, natps AS (" +
        "SELECT ps_partkey, CAST(ps_supplycost AS DECIMAL(18,2)) * ps_availqty AS v " +
        "FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_3'), " +
        "grp AS (SELECT ps_partkey, sum(v) AS vdec FROM natps GROUP BY ps_partkey) " +
        "SELECT ps_partkey, CAST(vdec AS DOUBLE) AS stock_value " +
        "FROM grp " +
        "WHERE CAST(vdec AS DOUBLE) > " +
        "(SELECT CAST(sum(vdec) AS DOUBLE) * 0.001 FROM grp) " +
        "ORDER BY stock_value DESC, ps_partkey"
    ),
    // Q16 part/supplier relationship: distinct supplier count per
    // (brand, type, size) with a NOT IN supplier exclusion. No s_comment
    // in the fixture -> the "Customer Complaints" exclusion becomes
    // s_acctbal < 0 (same NOT IN + subquery shape; empty set at sf0.001
    // is still exercised — NOT IN over an empty set keeps all rows in
    // both engines). Single-word p_type -> '<> PROMO' replaces the
    // 'MEDIUM POLISHED%' NOT LIKE.
    sqlQ(
      "q16_part_supplier",
      Seq("part", "supplier"),
      s"WITH $PartsuppCte " +
        "SELECT p_brand, p_type, p_size, " +
        "count(DISTINCT ps_suppkey) AS supplier_cnt " +
        "FROM partsupp JOIN part ON p_partkey = ps_partkey " +
        "WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO' " +
        "AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45) " +
        "AND ps_suppkey NOT IN " +
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
    // Q20 potential part promotion: suppliers of 'small%' parts whose
    // stock exceeds half of what they actually shipped 1996-1999 — the
    // nested IN + correlated scalar aggregate shape (the four-year window
    // replaces TPC-H's one year so the derived-partsupp pair coverage
    // yields rows at every fixture SF, 1/3/3). No s_address -> output is
    // s_name alone (unique, total order). The correlated sum uses the
    // exact-decimal quantity discipline; an empty correlated group yields
    // NULL, and `>` NULL filters the row identically in both engines.
    sqlQ(
      "q20_potential_promo",
      Seq("part", "supplier", "nation", "lineitem"),
      s"WITH $PartsuppCte " +
        "SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_3' AND s_suppkey IN (" +
        "SELECT ps_suppkey FROM partsupp " +
        "WHERE ps_partkey IN " +
        "(SELECT p_partkey FROM part WHERE p_name LIKE 'small%') " +
        "AND ps_availqty > (" +
        "SELECT CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / 2 " +
        "FROM lineitem " +
        "WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey " +
        "AND l_shipdate >= TIMESTAMP '1996-01-01' " +
        "AND l_shipdate < TIMESTAMP '2000-01-01')) " +
        "ORDER BY s_name"
    )
  )

  /** Deterministic partsupp derivation — the fixture ships no partsupp
    * table, so Q11/Q16/Q20 derive one from part x {0,1,2,3} with seeded
    * integer arithmetic (no rand): 4 suppliers per part, availqty in
    * [1, 9999], supplycost in [1.00, 1000.99]. Pure integer `%` and one
    * double division make the CTE bit-identical in Spark and DuckDB (the
    * SAME text runs in both), and (ps_partkey, ps_suppkey) is unique
    * because 13*{1,2,3} mod S is never 0 for the fixture supplier counts
    * (10/100/1000). Keys are 0-based to match the fixture's s_suppkey.
    */
  // def, not val: referenced from `all` above during object init
  private def PartsuppCte: String =
    "partsupp AS (" +
      "SELECT p_partkey AS ps_partkey, " +
      "(p_partkey * 7 + i * 13) % (SELECT count(*) FROM supplier) AS ps_suppkey, " +
      "CAST((p_partkey * 31 + i * 17) % 9999 + 1 AS INT) AS ps_availqty, " +
      "((p_partkey * 53 + i * 29) % 100000 + 100) / CAST(100 AS DOUBLE) AS ps_supplycost " +
      "FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i))"
}
