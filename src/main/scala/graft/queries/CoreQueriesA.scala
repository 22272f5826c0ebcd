package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import QueryUtil._

/** Core relational surface, part A: scans/values, projection+filter,
  * aggregation (incl. cube/rollup/grouping sets/distinct), joins of every
  * type the reference exposes (SURVEY.md §2.A A4 + §2.B "Joins" row —
  * delegation point crates/engine/src/lib.rs:54-57). All quantities flow
  * through exact decimal arithmetic and cast to double at the end so the
  * DuckDB oracle hash-matches bit-for-bit (see QueryUtil.dec2).
  *
  * Scale notes (100 TB thinking): every aggregation here is a map-side
  * partial + final hash agg (Spark does this automatically for algebraic
  * aggs); the star joins broadcast the dimension side explicitly so the
  * fact scan never shuffles; AQE re-plans skew at runtime.
  */
object CoreQueriesA {

  private def one = lit(1).cast(DecimalType(4, 2))
  private def ts(s: String) = to_timestamp(lit(s))

  val all: Seq[Q] = Seq(
    // ----- scans / constant select ---------------------------------------
    // Reference: constant SELECT without FROM (crates/igloo/src/main.rs:43).
    Q(
      "q_values",
      (s, _) => s.sql("SELECT 42 AS answer, 'Hello Igloo' AS greeting"),
      Some("SELECT 42 AS answer, 'Hello Igloo' AS greeting")
    ),
    // Reference: Parquet scan (crates/engine/src/operators/parquet_scan.rs).
    // Min/max/count over the fact table; Catalyst answers min/max of
    // l_orderkey from parquet footer stats when possible.
    Q(
      "q_scan_agg",
      (s, dir) =>
        t(s, dir, "lineitem").agg(
          count(lit(1)).as("n_rows"),
          min($"l_orderkey").as("min_key"),
          max($"l_orderkey").as("max_key"),
          min($"l_shipdate").as("min_ship"),
          max($"l_shipdate").as("max_ship")
        ),
      Some(
        "SELECT count(*) AS n_rows, min(l_orderkey) AS min_key, " +
          "max(l_orderkey) AS max_key, min(l_shipdate) AS min_ship, " +
          "max(l_shipdate) AS max_ship FROM lineitem"
      )
    ),
    // ----- projection + filter (reference operators/{projection,filter}.rs)
    Q(
      "q_filter_project",
      (s, dir) =>
        t(s, dir, "customer")
          .filter($"c_acctbal" > 1000 && $"c_nationkey" < 10)
          .select(
            $"c_custkey",
            $"c_name",
            $"c_nationkey",
            $"c_acctbal",
            upper($"c_mktsegment").as("segment")
          )
          .orderBy($"c_custkey"),
      Some(
        "SELECT c_custkey, c_name, c_nationkey, c_acctbal, " +
          "upper(c_mktsegment) AS segment FROM customer " +
          "WHERE c_acctbal > 1000 AND c_nationkey < 10 ORDER BY c_custkey"
      )
    ),
    // TPC-H Q6 shape: tight filter + single global agg; filters push to
    // the parquet scan (verify via .explain PushedFilters).
    Q(
      "q6_filter_agg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            $"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1997-01-01")
              && $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24
          )
          .agg(
            asDouble(sum(dec2($"l_extendedprice") * pct($"l_discount")))
              .as("revenue"),
            count(lit(1)).as("n")
          ),
      Some(
        "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * " +
          "CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue, " +
          "count(*) AS n FROM lineitem " +
          "WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
          "AND l_shipdate < TIMESTAMP '1997-01-01' " +
          "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
      ),
      bench = true
    ),
    // ----- aggregation ----------------------------------------------------
    // TPC-H Q1 shape: the canonical partial+final hash aggregation.
    Q(
      "q1_agg",
      (s, dir) => {
        val disc1 = one - pct($"l_discount")
        val tax1 = one + pct($"l_tax")
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= ts("2000-09-02"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            asDouble(sum(dec2($"l_extendedprice"))).as("sum_base_price"),
            asDouble(sum(dec2($"l_extendedprice") * disc1)).as("sum_disc_price"),
            asDouble(sum(dec2($"l_extendedprice") * disc1 * tax1)).as("sum_charge"),
            (asDouble(sum(dec2($"l_quantity"))) / count(lit(1))).as("avg_qty"),
            (asDouble(sum(dec2($"l_extendedprice"))) / count(lit(1))).as("avg_price"),
            (asDouble(sum(pct($"l_discount"))) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_qty, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) AS avg_price, " +
          "CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc, " +
          "count(*) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
      ),
      bench = true
    ),
    // DISTINCT aggregates (exact; the HLL variant is q_agg_hll).
    Q(
      "q_agg_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            count_distinct($"l_suppkey").as("n_supp"),
            count_distinct($"l_partkey").as("n_part"),
            asDouble(sum_distinct(dec2($"l_quantity"))).as("sum_distinct_qty"),
            count(lit(1)).as("n")
          )
          .orderBy($"l_returnflag"),
      Some(
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, " +
          "count(DISTINCT l_partkey) AS n_part, " +
          "CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_distinct_qty, " +
          "count(*) AS n FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      )
    ),
    // CUBE — grouping-set expansion happens in a single shuffle in Spark.
    Q(
      "q_agg_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum(dec2($"l_quantity"))).as("qty"),
            grouping($"l_returnflag").cast("int").as("g_rf"),
            grouping($"l_linestatus").cast("int").as("g_ls")
          )
          .orderBy(
            $"g_rf",
            $"g_ls",
            $"l_returnflag".asc_nulls_first,
            $"l_linestatus".asc_nulls_first
          ),
      Some(
        "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty, " +
          "CAST(grouping(l_returnflag) AS INT) AS g_rf, " +
          "CAST(grouping(l_linestatus) AS INT) AS g_ls " +
          "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
          "ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"
      ),
      bench = true
    ),
    // DISTINCT under CUBE — rides PreAggExpand's grain-extension path:
    // the pre-aggregate reduces to distinct (returnflag, suppkey) pairs
    // before the per-set replication, and count(DISTINCT) re-runs
    // verbatim above the Expand. The DuckDB oracle computes the naive
    // plan, so hash equality proves the extension exact.
    Q(
      "q_agg_cube_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube($"l_returnflag")
          .agg(
            count_distinct($"l_suppkey").as("nd_supp"),
            asDouble(sum(dec2($"l_quantity"))).as("qty"),
            count(lit(1)).as("n"),
            grouping($"l_returnflag").cast("int").as("g_rf")
          )
          .orderBy($"g_rf", $"l_returnflag".asc_nulls_first),
      Some(
        "SELECT l_returnflag, count(DISTINCT l_suppkey) AS nd_supp, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS qty, " +
          "count(*) AS n, CAST(grouping(l_returnflag) AS INT) AS g_rf " +
          "FROM lineitem GROUP BY CUBE (l_returnflag) " +
          "ORDER BY g_rf, l_returnflag ASC NULLS FIRST"
      )
    ),
    // FILTERed DISTINCT under CUBE — rides PreAggExpand with the grain
    // further extended by the predicate's column: the pre-aggregate
    // reduces to distinct (returnflag, suppkey, quantity) combinations,
    // and both the filter and the distinct re-run verbatim above the
    // Expand. Oracle = DuckDB's naive plan, so hash equality proves the
    // predicate-column extension exact.
    Q(
      "q_agg_cube_filtered_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube($"l_returnflag")
          .agg(
            expr("count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 25)")
              .as("nd_supp_hi"),
            count_distinct($"l_suppkey").as("nd_supp"),
            count(lit(1)).as("n"),
            grouping($"l_returnflag").cast("int").as("g_rf")
          )
          .orderBy($"g_rf", $"l_returnflag".asc_nulls_first),
      Some(
        "SELECT l_returnflag, " +
          "count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 25) AS nd_supp_hi, " +
          "count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n, " +
          "CAST(grouping(l_returnflag) AS INT) AS g_rf " +
          "FROM lineitem GROUP BY CUBE (l_returnflag) " +
          "ORDER BY g_rf, l_returnflag ASC NULLS FIRST"
      )
    ),
    Q(
      "q_agg_rollup",
      (s, dir) =>
        t(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            asDouble(sum(dec2($"o_totalprice"))).as("total"),
            grouping($"o_orderstatus").cast("int").as("g_st"),
            grouping($"o_orderpriority").cast("int").as("g_pr")
          )
          .orderBy(
            $"g_st",
            $"g_pr",
            $"o_orderstatus".asc_nulls_first,
            $"o_orderpriority".asc_nulls_first
          ),
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
          "CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total, " +
          "CAST(grouping(o_orderstatus) AS INT) AS g_st, " +
          "CAST(grouping(o_orderpriority) AS INT) AS g_pr " +
          "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
          "ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"
      )
    ),
    Q(
      "q_agg_grouping_sets",
      (s, dir) =>
        views(s, dir, "orders").sql(
          "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
            "CAST(grouping(o_orderstatus) AS INT) AS g_st, " +
            "CAST(grouping(o_orderpriority) AS INT) AS g_pr " +
            "FROM orders " +
            "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
            "ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST, " +
            "o_orderpriority ASC NULLS FIRST"
        ),
      Some(
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, " +
          "CAST(grouping(o_orderstatus) AS INT) AS g_st, " +
          "CAST(grouping(o_orderpriority) AS INT) AS g_pr " +
          "FROM orders " +
          "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
          "ORDER BY g_st, g_pr, o_orderstatus ASC NULLS FIRST, " +
          "o_orderpriority ASC NULLS FIRST"
      )
    ),
    // HLL sketch (approx_count_distinct). Sketches differ across engines,
    // so no DuckDB oracle; AggregateSpec asserts the 2% relative-error
    // contract against the exact count.
    Q(
      "q_agg_hll",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            approx_count_distinct($"l_partkey").as("approx_parts"),
            count_distinct($"l_partkey").as("exact_parts")
          )
          .orderBy($"l_returnflag"),
      None
    ),
    // ----- joins -----------------------------------------------------------
    // TPC-H Q3 shape: dimension filter -> broadcast -> fact agg -> top-k.
    Q(
      "q3_join_agg",
      (s, dir) => {
        // r21: exact key-uniqueness facts (memoized per file set) let the
        // UnscaledDecimalSums proof carry through the unique-key joins —
        // the revenue sum runs in codegen'd long space instead of
        // per-row BigDecimal math. Results are bit-identical (the rewrite
        // only fires under a proven overflow bound); oracle-hash-gated.
        graft.plans.KeyUniqueness.ensure(s, s"$dir/orders.parquet",
          Seq("o_orderkey"))
        graft.plans.KeyUniqueness.ensure(s, s"$dir/customer.parquet",
          Seq("c_custkey"))
        val c = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = t(s, dir, "orders").filter($"o_orderdate" < ts("1998-03-15"))
        val l = t(s, dir, "lineitem").filter($"l_shipdate" > ts("1998-03-15"))
        // 100 TB note: broadcast ONLY the filtered customer dimension; the
        // orders side stays fact-sized (the date filter keeps most rows), so
        // orders⋈lineitem must remain a shuffle join — AQE picks the
        // strategy at runtime from the post-filter sizes.
        l.join(o.join(broadcast(c), $"o_custkey" === $"c_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(
            asDouble(sum(dec2($"l_extendedprice") * (one - pct($"l_discount"))))
              .as("revenue")
          )
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(
        "SELECT l_orderkey, o_orderdate, o_orderpriority, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
          "FROM customer JOIN orders ON c_custkey = o_custkey " +
          "JOIN lineitem ON l_orderkey = o_orderkey " +
          "WHERE c_mktsegment = 'BUILDING' " +
          "AND o_orderdate < TIMESTAMP '1998-03-15' " +
          "AND l_shipdate > TIMESTAMP '1998-03-15' " +
          "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
          "ORDER BY revenue DESC, l_orderkey LIMIT 10"
      ),
      bench = true
    ),
    // TPC-H Q5 shape: 5-way star join; only the tiny dims force-broadcast.
    Q(
      "q5_join_multi",
      (s, dir) => {
        // r21: same unique-key proofs as q3 — every dim key in this
        // 5-join star is a proven-unique column, so the revenue sum's
        // overflow bound (lineitem footer rows) survives all five joins
        // and the sum runs in long space
        graft.plans.KeyUniqueness.ensure(s, s"$dir/orders.parquet",
          Seq("o_orderkey"))
        graft.plans.KeyUniqueness.ensure(s, s"$dir/customer.parquet",
          Seq("c_custkey"))
        graft.plans.KeyUniqueness.ensure(s, s"$dir/supplier.parquet",
          Seq("s_suppkey"))
        graft.plans.KeyUniqueness.ensure(s, s"$dir/nation.parquet",
          Seq("n_nationkey"))
        graft.plans.KeyUniqueness.ensure(s, s"$dir/region.parquet",
          Seq("r_regionkey"))
        val r = t(s, dir, "region").filter($"r_name" === "ASIA")
        val n = t(s, dir, "nation")
        val c = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        val o = t(s, dir, "orders").filter(
          $"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1997-01-01")
        )
        val l = t(s, dir, "lineitem")
        // 100 TB note: customer (~150M rows at 100×) and supplier (~10M) are
        // far beyond broadcast limits — leave their join strategy to AQE
        // (shuffle join, or broadcast if runtime stats say they fit).
        // Only the genuinely tiny nation/region dims are forced broadcast.
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(
            sup,
            $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey"
          )
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(
            asDouble(sum(dec2($"l_extendedprice") * (one - pct($"l_discount"))))
              .as("revenue")
          )
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(
        "SELECT n_name, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "JOIN region ON n_regionkey = r_regionkey " +
          "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
          "AND o_orderdate < TIMESTAMP '1997-01-01' " +
          "GROUP BY n_name ORDER BY revenue DESC, n_name"
      ),
      bench = true
    ),
    // LEFT OUTER: preserved-side rows with no match -> NULL aggregates.
    Q(
      "q_join_left",
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders"),
            $"c_custkey" === $"o_custkey",
            "left"
          )
          .groupBy($"c_custkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            asDouble(sum(dec2($"o_totalprice"))).as("total_spend")
          )
          .orderBy($"c_custkey"),
      Some(
        "SELECT c_custkey, count(o_orderkey) AS n_orders, " +
          "CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend " +
          "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
          "GROUP BY c_custkey ORDER BY c_custkey"
      )
    ),
    // RIGHT OUTER (the reference's HashJoinExec declares but never emits
    // right/full null-extension — hash_join.rs:174-213; we do it right).
    Q(
      "q_join_right",
      (s, dir) =>
        t(s, dir, "orders")
          .join(
            t(s, dir, "customer"),
            $"o_custkey" === $"c_custkey",
            "right"
          )
          .groupBy($"c_nationkey")
          .agg(
            count($"o_orderkey").as("n_orders"),
            count(lit(1)).as("n_rows")
          )
          .orderBy($"c_nationkey"),
      Some(
        "SELECT c_nationkey, count(o_orderkey) AS n_orders, count(*) AS n_rows " +
          "FROM orders RIGHT JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY c_nationkey ORDER BY c_nationkey"
      )
    ),
    // FULL OUTER over two aggregated sides with partially-overlapping keys.
    Q(
      "q_join_full",
      (s, dir) => {
        val cn = t(s, dir, "customer")
          .filter($"c_acctbal" > 9000)
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_cust"))
        val sn = t(s, dir, "supplier")
          .filter($"s_acctbal" > 5000)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("n_supp"))
        cn.join(sn, $"c_nationkey" === $"s_nationkey", "full")
          .select(
            coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
            $"n_cust",
            $"n_supp"
          )
          .orderBy($"nationkey")
      },
      Some(
        "SELECT coalesce(cn.c_nationkey, sn.s_nationkey) AS nationkey, n_cust, n_supp " +
          "FROM (SELECT c_nationkey, count(*) AS n_cust FROM customer " +
          "WHERE c_acctbal > 9000 GROUP BY c_nationkey) cn " +
          "FULL JOIN (SELECT s_nationkey, count(*) AS n_supp FROM supplier " +
          "WHERE s_acctbal > 5000 GROUP BY s_nationkey) sn " +
          "ON cn.c_nationkey = sn.s_nationkey ORDER BY nationkey"
      )
    ),
    // LEFT SEMI (EXISTS).
    Q(
      "q_join_semi",
      (s, dir) => {
        val hot = t(s, dir, "orders").filter(
          $"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 300000
        )
        t(s, dir, "customer")
          .join(hot, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name FROM customer WHERE EXISTS (" +
          "SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
          "AND o_orderpriority = '1-URGENT' AND o_totalprice > 300000) " +
          "ORDER BY c_custkey"
      )
    ),
    // LEFT ANTI (NOT EXISTS).
    Q(
      "q_join_anti",
      (s, dir) => {
        val hot = t(s, dir, "orders").filter(
          $"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 300000
        )
        t(s, dir, "customer")
          .join(hot, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey")
          .orderBy($"c_custkey")
      },
      Some(
        "SELECT c_custkey FROM customer WHERE NOT EXISTS (" +
          "SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
          "AND o_orderpriority = '1-URGENT' AND o_totalprice > 300000) " +
          "ORDER BY c_custkey"
      )
    ),
    // CROSS JOIN (both sides tiny; legitimate nested-loop).
    Q(
      "q_join_cross",
      (s, dir) =>
        t(s, dir, "region")
          .crossJoin(t(s, dir, "nation"))
          .select($"r_name", $"n_name")
          .orderBy($"r_name", $"n_name"),
      Some(
        "SELECT r_name, n_name FROM region CROSS JOIN nation " +
          "ORDER BY r_name, n_name"
      )
    ),
    // Eager aggregation (plans.EagerAggJoin): the partial aggregate is
    // pushed BELOW the join, so the join processes |supplier-key grain|
    // lineitem rows instead of all of them. Opt-in conf enabled in a
    // CHILD session only (house pattern of q_mv_rewrite) — every other
    // join query keeps measuring the stock plan. The DuckDB oracle
    // computes the naive join-then-aggregate, so hash equality proves
    // the multiplicity weighting exact.
    Q(
      "q_join_eager_agg",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.graft.optimizer.eagerAggJoin", "true")
        // mirror the caller's AQE choice: the plan-audit session turns
        // AQE off so executedPlan is inspectable, and a child session
        // would otherwise silently revert to the default
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_nationkey")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n"),
            count_distinct($"l_returnflag").as("nd_flag"),
            asDouble(min(dec2($"l_extendedprice"))).as("mn_price")
          )
          .orderBy($"s_nationkey")
      },
      Some(
        "SELECT s_nationkey, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "count(*) AS n, count(DISTINCT l_returnflag) AS nd_flag, " +
          "CAST(min(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS mn_price " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_nationkey ORDER BY s_nationkey"
      )
    ),
    // Eager aggregation with measures on BOTH join sides (r19): the
    // fact side pre-aggregates as before, and the dim-side sum/count/avg
    // re-aggregate WEIGHTED by the fact pre-aggregate's per-grain row
    // count (Yan & Larson's full algebra). The DuckDB oracle computes
    // the naive join-then-aggregate, so hash equality proves the
    // dim-side weighting exact.
    Q(
      "q_join_eager_agg_bilateral",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.graft.optimizer.eagerAggJoin", "true")
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_nationkey")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            asDouble(sum(dec2($"s_acctbal"))).as("sum_bal"),
            count($"s_acctbal").as("n_bal"),
            count(lit(1)).as("n"),
            asDouble(min(dec2($"s_acctbal"))).as("mn_bal")
          )
          .orderBy($"s_nationkey")
      },
      Some(
        "SELECT s_nationkey, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal, " +
          "count(s_acctbal) AS n_bal, count(*) AS n, " +
          "CAST(min(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS mn_bal " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_nationkey ORDER BY s_nationkey"
      )
    ),
    // The SHUFFLE-regime eager aggregation — the winning regime the
    // probe measures at 2x, now regression-gated per round (r19):
    // broadcast is disabled in the child session, so the plan MUST keep
    // the grain pre-aggregate feeding a shuffle join (PlanShapes pins
    // minAggFedJoins/maxShuffleJoins; a rule regression that drops the
    // pre-aggregate or re-broadcasts fails the audit, not just a probe).
    // Carries a dim-side weighted sum so the full r19 algebra sits in
    // the gated shape.
    Q(
      "q_join_eager_agg_shuffle",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.graft.optimizer.eagerAggJoin", "true")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_nationkey")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            asDouble(sum(dec2($"s_acctbal"))).as("sum_bal"),
            count(lit(1)).as("n")
          )
          .orderBy($"s_nationkey")
      },
      Some(
        "SELECT s_nationkey, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS sum_bal, " +
          "count(*) AS n " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_nationkey ORDER BY s_nationkey"
      )
    ),
    // AUTO-armed eager aggregation (r19): no optimizer conf is set —
    // the default `auto` mode consults StatsCatalog's harvested row
    // count + per-column NDV sketches and fires by itself once the
    // grain-NDV/fact-rows ratio clears the threshold and the dim side
    // is not broadcast-sized (broadcast disabled here = the 100 TB
    // shuffle regime; the size floor lowered to fixture scale). The
    // plan pin lives in EagerAggJoinSpec; hash equality vs DuckDB's
    // naive plan proves the auto-fired rewrite exact.
    Q(
      "q_join_eager_agg_auto",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // SESSION-scoped analyze (r20): the statistics are visible only
        // to this child session, so building this query can never
        // change any other query's plan in the same JVM (the r19 global
        // analyze made plan pins order-dependent)
        graft.plans.StatsCatalog.analyzeScoped(s2, s"$dir/lineitem.parquet")
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_nationkey")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n")
          )
          .orderBy($"s_nationkey")
      },
      Some(
        "SELECT s_nationkey, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "count(*) AS n " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_nationkey ORDER BY s_nationkey"
      )
    ),
    // AUTO-armed CASCADE through a 2-level star (r20): no eagerAggJoin
    // conf — the default `auto` derives cardinality THROUGH the level-1
    // rewrite (StatsCatalog.estimatePlan: a planted pre-aggregate's rows
    // ~= its grain NDV, an inner equi-join's ~= |l|*|r|/max(key NDV)),
    // so BOTH joins end up fed by grain pre-aggregates from harvested
    // statistics alone — the plan the reference would need its backend's
    // full CBO for. Plan-pinned at minAggFedJoins=2 (PlanShapes); hash
    // equality vs DuckDB's naive plan proves the cascade exact.
    Q(
      "q_join_eager_agg_cascade",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        s2.conf.set("spark.graft.optimizer.eagerAggJoin.minRows", "1000")
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        graft.plans.StatsCatalog.analyzeScoped(s2, s"$dir/lineitem.parquet")
        graft.plans.StatsCatalog.analyzeScoped(s2, s"$dir/supplier.parquet")
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .join(t(s2, dir, "nation"), $"s_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n")
          )
          .orderBy($"n_name")
      },
      Some(
        "SELECT n_name, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "count(*) AS n " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey " +
          "GROUP BY n_name ORDER BY n_name"
      )
    ),
    // FILTERed dim-side aggregates under eager aggregation (r20): the
    // weighted algebra carries the FILTER onto the re-aggregation —
    // dim-side predicates (s_acctbal > 1000) pass through the join,
    // fact-side ones (l_quantity > 25) join the grain so the predicate
    // re-evaluates identically above it. Hash equality vs DuckDB's
    // naive FILTER plan proves both directions exact.
    Q(
      "q_join_eager_agg_filtered",
      (s, dir) => {
        val s2 = s.newSession()
        s2.conf.set("spark.graft.optimizer.eagerAggJoin", "true")
        s2.conf.set("spark.sql.adaptive.enabled",
          s.conf.get("spark.sql.adaptive.enabled", "true"))
        t(s2, dir, "lineitem")
          .join(t(s2, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_nationkey")
          .agg(
            asDouble(sum(dec2($"l_quantity"))).as("sum_qty"),
            expr("CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) " +
              "FILTER (WHERE s_acctbal > 1000.0) AS DOUBLE)")
              .as("sum_bal_hi"),
            expr("count(s_acctbal) FILTER (WHERE l_quantity > 25)")
              .as("n_bal_hiq"),
            count(lit(1)).as("n")
          )
          .orderBy($"s_nationkey")
      },
      Some(
        "SELECT s_nationkey, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty, " +
          "CAST(sum(CAST(s_acctbal AS DECIMAL(14,2))) " +
          "FILTER (WHERE s_acctbal > 1000.0) AS DOUBLE) AS sum_bal_hi, " +
          "count(s_acctbal) FILTER (WHERE l_quantity > 25) AS n_bal_hiq, " +
          "count(*) AS n " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "GROUP BY s_nationkey ORDER BY s_nationkey"
      )
    ),
    // Theta join: equi on region + range predicate -> within-region pairs.
    Q(
      "q_join_theta",
      (s, dir) => {
        val base = t(s, dir, "nation")
        val n1 = base.select(
          $"n_nationkey".as("k1"),
          $"n_name".as("nation_a"),
          $"n_regionkey".as("rk1")
        )
        val n2 = base.select(
          $"n_nationkey".as("k2"),
          $"n_name".as("nation_b"),
          $"n_regionkey".as("rk2")
        )
        n1.join(n2, $"rk1" === $"rk2" && $"k1" < $"k2")
          .select($"nation_a", $"nation_b")
          .orderBy($"nation_a", $"nation_b")
      },
      Some(
        "SELECT n1.n_name AS nation_a, n2.n_name AS nation_b " +
          "FROM nation n1 JOIN nation n2 " +
          "ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey " +
          "ORDER BY nation_a, nation_b"
      )
    )
  )
}
