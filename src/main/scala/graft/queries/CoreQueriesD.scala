package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Aggregators
import QueryUtil._

/** Core relational surface, part D: the remaining §2.B rows — generator
  * (UDTF) surface, map construct/access, typed UDAF, exact percentiles,
  * distribution window functions, and session windows (the batch twin of
  * streaming session state).
  */
object CoreQueriesD {

  /** A query whose Spark side IS the oracle SQL run through Catalyst: ONE
    * string serves both engines, so the benchmarked query and its oracle
    * can never drift apart.
    */
  private def sqlQ(name: String, tables: Seq[String], sql: String): Q =
    Q(name, (s, dir) => views(s, dir, tables: _*).sql(sql), Some(sql))

  val all: Seq[Q] = Seq(
    // ----- generator / UDTF surface (explode == DataFusion unnest) ---------
    Q(
      "q_explode_words",
      (s, dir) =>
        t(s, dir, "part")
          .select(explode(split($"p_name", " ")).as("w"))
          .groupBy($"w")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"w")
          .limit(20),
      Some(
        "SELECT w, count(*) AS n FROM (SELECT unnest(string_split(p_name, ' ')) AS w " +
          "FROM part) GROUP BY w ORDER BY n DESC, w LIMIT 20"
      )
    ),
    // posexplode: position-aware generator.
    Q(
      "q_explode_pos",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 50)
          .select($"p_partkey", posexplode(split($"p_name", " ")))
          .withColumnRenamed("pos", "word_idx")
          .withColumnRenamed("col", "w")
          .select($"p_partkey", $"word_idx".cast("bigint").as("word_idx"), $"w")
          .orderBy($"p_partkey", $"word_idx"),
      Some(
        "SELECT p_partkey, CAST(idx - 1 AS BIGINT) AS word_idx, w " +
          "FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w, " +
          "generate_subscripts(string_split(p_name, ' '), 1) AS idx FROM part " +
          "WHERE p_partkey < 50) ORDER BY p_partkey, word_idx"
      )
    ),
    // ----- higher-order array functions -------------------------------------
    // transform/filter/aggregate lambdas run inside codegen — the idiom
    // this engine prefers over UDFs for per-element array work (the same
    // machinery TextOps.shingles uses). DuckDB mirrors each lambda.
    Q(
      "q_fn_higher_order",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 200)
          .select(
            $"p_partkey",
            aggregate(
              sequence(lit(1), $"p_size"),
              lit(0L),
              (acc, x) => acc + x
            ).as("size_triangle"),
            size(filter(sequence(lit(1), $"p_size"), x => x % 2 === 0))
              .cast("bigint")
              .as("n_even"),
            array_join(
              transform(sequence(lit(1), lit(3)), i => concat(lit("p"), i)),
              ","
            ).as("tags")
          )
          .orderBy($"p_partkey"),
      Some(
        "SELECT p_partkey, " +
          "CAST(p_size AS BIGINT) * (p_size + 1) // 2 AS size_triangle, " +
          "CAST(p_size // 2 AS BIGINT) AS n_even, " +
          "'p1,p2,p3' AS tags " +
          "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"
      )
    ),
    // ----- interval arithmetic ---------------------------------------------
    Q(
      "q_fn_interval",
      (s, dir) =>
        t(s, dir, "orders")
          .filter($"o_orderkey" < 400)
          .select(
            $"o_orderkey",
            ($"o_orderdate" + expr("INTERVAL 90 DAY")).as("due_ts"),
            add_months($"o_orderdate".cast("date"), 3).as("plus_3m"),
            ($"o_orderdate".cast("date") - expr("INTERVAL 1 WEEK"))
              .cast("date")
              .as("week_before")
          )
          .orderBy($"o_orderkey"),
      Some(
        "SELECT o_orderkey, o_orderdate + INTERVAL 90 DAY AS due_ts, " +
          "CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m, " +
          "CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 WEEK AS DATE) AS week_before " +
          "FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey"
      )
    ),
    // ----- map construct + access ------------------------------------------
    // The MAP is built and accessed in Spark (MapType exercise); the oracle
    // checks the extracted VALUES, which DuckDB computes directly.
    Q(
      "q_fn_map",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 200)
          .select(
            $"p_partkey",
            map_from_arrays(
              array(lit("size"), lit("double_size")),
              array($"p_size".cast("long"), ($"p_size" * 2).cast("long"))
            ).as("m")
          )
          .select(
            $"p_partkey",
            element_at($"m", "size").as("size_v"),
            element_at($"m", "double_size").as("dsize_v"),
            size(map_keys($"m")).cast("bigint").as("n_keys")
          )
          .orderBy($"p_partkey"),
      Some(
        "SELECT p_partkey, CAST(p_size AS BIGINT) AS size_v, " +
          "CAST(p_size * 2 AS BIGINT) AS dsize_v, CAST(2 AS BIGINT) AS n_keys " +
          "FROM part WHERE p_partkey < 200 ORDER BY p_partkey"
      )
    ),
    // ----- composite TPC-H shapes ------------------------------------------
    // Q13 shape: two-level aggregation — per-customer order counts, then
    // the distribution of those counts. Both levels are hash aggs; the
    // second input is already tiny (one row per customer).
    Q(
      "q13_count_dist",
      (s, dir) =>
        t(s, dir, "customer")
          .join(
            t(s, dir, "orders"),
            $"c_custkey" === $"o_custkey",
            "left"
          )
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc),
      Some(
        "SELECT c_count, count(*) AS custdist FROM (" +
          "SELECT c_custkey, count(o_orderkey) AS c_count " +
          "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
          "GROUP BY c_custkey) " +
          "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
      )
    ),
    // Q18 shape: IN-subquery over a GROUPED fact — orders whose total
    // quantity exceeds a threshold. The subquery becomes a semi join on
    // the aggregated keys, not a fact-side re-scan per row.
    sqlQ(
      "q18_large_orders",
      Seq("orders", "lineitem"),
      "SELECT o_orderkey, o_orderdate, o_totalprice, " +
        "CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS total_qty " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE o_orderkey IN (" +
        "  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey " +
        "  HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 150) " +
        "GROUP BY o_orderkey, o_orderdate, o_totalprice " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    // Q2 shape: correlated min-per-group — suppliers holding the minimum
    // account balance of their nation. Catalyst decorrelates to an agg +
    // join; no per-row re-scan survives in the plan.
    sqlQ(
      "q2_min_per_group",
      Seq("supplier", "nation"),
      "SELECT n_name, s_name, s_acctbal FROM supplier JOIN nation " +
        "ON s_nationkey = n_nationkey " +
        "WHERE s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2 " +
        "WHERE s2.s_nationkey = supplier.s_nationkey) " +
        "ORDER BY n_name, s_name"
    ),
    // Q4 shape: EXISTS-subquery count by priority — orders with at least
    // one line shipped after the order date. Catalyst plans the EXISTS as
    // a left-semi join on l_orderkey (one shuffle, no per-row re-scan).
    sqlQ(
      "q4_priority_count",
      Seq("orders", "lineitem"),
      "SELECT o_orderpriority, count(*) AS order_count FROM orders " +
        "WHERE EXISTS (SELECT 1 FROM lineitem " +
        "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    // Q12 shape: conditional aggregation over a fact-dim join — high- vs
    // low-priority line counts per return flag in a ship-date year. The
    // CASE sums fold map-side; integer sums stay exact (CAST for DuckDB's
    // HUGEINT widening).
    sqlQ(
      "q12_priority_lines",
      Seq("orders", "lineitem"),
      "SELECT l_returnflag, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') " +
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    // Q14 shape: ratio of conditional revenue — promo share of revenue in
    // a ship-date window. Revenue sums run in exact DECIMAL (order-proof)
    // with ONE double conversion for the final ratio.
    sqlQ(
      "q14_promo_share",
      Seq("lineitem", "part"),
      "SELECT round(100.0 * " +
        "CAST(sum(CASE WHEN p_type = 'PROMO' THEN " +
        "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) " +
        "ELSE 0 END) AS DOUBLE) / " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), " +
        "6) AS promo_revenue " +
        "FROM lineitem JOIN part ON l_partkey = p_partkey " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
    ),
    // ----- pivot / unpivot --------------------------------------------------
    // Pivot with EXPLICIT value list (no extra distinct-scan pass, and the
    // output schema is static — the only form that scales); empty cells
    // coalesced to 0 to match SQL conditional aggregation.
    Q(
      "q_pivot",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(
            $"o_orderpriority",
            coalesce($"F", lit(0L)).as("F"),
            coalesce($"O", lit(0L)).as("O"),
            coalesce($"P", lit(0L)).as("P")
          )
          .orderBy($"o_orderpriority"),
      Some(
        "SELECT o_orderpriority, " +
          "count(*) FILTER (WHERE o_orderstatus = 'F') AS F, " +
          "count(*) FILTER (WHERE o_orderstatus = 'O') AS O, " +
          "count(*) FILTER (WHERE o_orderstatus = 'P') AS P " +
          "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
      )
    ),
    Q(
      "q_unpivot",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 100)
          .select(
            $"p_partkey",
            $"p_size".cast("double").as("size"),
            $"p_retailprice".as("price")
          )
          .unpivot(
            Array($"p_partkey"),
            Array($"size", $"price"),
            "metric",
            "value"
          )
          .orderBy($"p_partkey", $"metric"),
      Some(
        "SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value " +
          "FROM part WHERE p_partkey < 100 " +
          "UNION ALL " +
          "SELECT p_partkey, 'price' AS metric, p_retailprice AS value " +
          "FROM part WHERE p_partkey < 100 " +
          "ORDER BY p_partkey, metric"
      )
    ),
    // ----- typed UDAF (Aggregator) -----------------------------------------
    // Exact integer-scaled weighted average: distributed merge order cannot
    // perturb the result, so the oracle reproduces it digit-for-digit with
    // the same scaling in SQL.
    Q(
      "q_udaf_wavg",
      (s, dir) => {
        val wavg = udaf(Aggregators.weightedAvg)
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(wavg($"l_extendedprice", $"l_quantity").as("wavg_price"))
          .orderBy($"l_returnflag")
      },
      Some(
        "SELECT l_returnflag, " +
          "CAST(sum((CAST(round(l_extendedprice * 1000000) AS BIGINT) * " +
          "CAST(round(l_quantity * 1000000) AS BIGINT)) // 1000000) AS DOUBLE) / " +
          "CAST(sum(CAST(round(l_quantity * 1000000) AS BIGINT)) AS DOUBLE) AS wavg_price " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      )
    ),
    // ----- exact percentiles -----------------------------------------------
    Q(
      "q_agg_percentile",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            round(percentile_approx($"o_totalprice", lit(0.5), lit(1000000)), 6)
              .as("p50_approx"),
            round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90")
          )
          .select($"o_orderstatus", $"p50", $"p90")
          .orderBy($"o_orderstatus"),
      Some(
        "SELECT o_orderstatus, " +
          "round(quantile_cont(o_totalprice, 0.5), 6) AS p50, " +
          "round(quantile_cont(o_totalprice, 0.9), 6) AS p90 " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
      )
    ),
    // ----- distribution window functions -----------------------------------
    Q(
      "q_win_dist",
      (s, dir) => {
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
        t(s, dir, "customer")
          .filter($"c_custkey" < 300)
          .select(
            $"c_nationkey",
            $"c_custkey",
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd")
          )
          .orderBy($"c_nationkey", $"c_custkey")
      },
      Some(
        "SELECT c_nationkey, c_custkey, " +
          "round(percent_rank() OVER w, 6) AS pr, " +
          "round(cume_dist() OVER w, 6) AS cd " +
          "FROM customer WHERE c_custkey < 300 WINDOW w AS " +
          "(PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) " +
          "ORDER BY c_nationkey, c_custkey"
      )
    ),
    // ----- as-of join -------------------------------------------------------
    // Spark has no native ASOF JOIN; operators.AsOfJoin composes it from a
    // union + one keyed window pass (one shuffle, sort-merge cost profile).
    // The oracle is DuckDB's NATIVE ASOF JOIN — equality shows the
    // composition reproduces the real operator's semantics, including the
    // inclusive (<=) tie rule. Both sides compare at micros precision.
    Q(
      "q_asof_join",
      (s, dir) => {
        val ev = events(s, dir)
        val clicks = ev
          .filter($"event_type" === "click")
          .select($"event_id", $"user_id", $"ts")
        val purchases = ev
          .filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"value")
        graft.operators.AsOfJoin
          .asofBackward(
            clicks,
            purchases,
            key = "user_id",
            leftTs = "ts",
            rightTs = "ts",
            rightVals = Map("ts" -> "last_purchase_ts", "value" -> "last_purchase_value")
          )
          .select(
            $"event_id",
            $"user_id",
            $"ts",
            $"last_purchase_ts",
            $"last_purchase_value"
          )
          .orderBy($"event_id")
      },
      Some(
        """WITH l AS (
          |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |  FROM events WHERE event_type = 'click'
          |), r AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
          |  FROM events WHERE event_type = 'purchase'
          |)
          |SELECT l.event_id, l.user_id, l.ts,
          |       r.ts AS last_purchase_ts, r.value AS last_purchase_value
          |FROM l ASOF LEFT JOIN r
          |  ON l.user_id = r.user_id AND l.ts >= r.ts
          |ORDER BY l.event_id""".stripMargin
      ),
      bench = true
    ),
    // ----- range (epsilon) join ---------------------------------------------
    // Pure non-equi time-distance join, rewritten to a bucketed hash join
    // (operators.RangeJoin) — the oracle does the naive inequality join,
    // so equality proves the bucketing rewrite is exact.
    Q(
      "q_range_join",
      (s, dir) => {
        val ev = events(s, dir)
        val errors = ev
          .filter($"event_type" === "error")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev
          .filter($"event_type" === "click")
          .select($"ts".as("click_ts"))
        graft.operators.RangeJoin
          .epsilonCount(errors, clicks, "ts", "click_ts", 5L * 60 * 1000000)
          .select($"event_id", $"user_id", $"n_matches")
          .orderBy($"event_id")
      },
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |  FROM events WHERE event_type = 'error'
          |), c AS (
          |  SELECT CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'click'
          |)
          |SELECT e.event_id, e.user_id, count(c.ts) AS n_matches
          |FROM e LEFT JOIN c
          |  ON c.ts BETWEEN e.ts - INTERVAL 5 MINUTE AND e.ts + INTERVAL 5 MINUTE
          |GROUP BY e.event_id, e.user_id
          |ORDER BY e.event_id""".stripMargin
      ),
      bench = true
    ),
    // ----- session windows (batch twin of streaming session state) ---------
    // Spark: built-in session_window (30-min gap merge). DuckDB has no
    // session windows — the oracle derives identical sessions with the
    // classic gaps-and-islands rewrite (lag + cumulative boundary count),
    // which doubles as documentation of the semantics.
    Q(
      "q_events_sessions",
      (s, dir) =>
        events(s, dir)
          .groupBy(session_window($"ts", "30 minutes"), $"user_id")
          .agg(count(lit(1)).as("n_events"))
          .select(
            $"user_id",
            $"session_window.start".as("session_start"),
            $"n_events"
          )
          .filter($"n_events" >= 3)
          .orderBy($"user_id", $"session_start"),
      Some(
        """WITH e AS (
          |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
          |), marked AS (
          |  SELECT user_id, ts,
          |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
          |                   > INTERVAL 30 MINUTE THEN 1
          |              WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
          |              ELSE 0 END AS new_session
          |  FROM e
          |), sessions AS (
          |  SELECT user_id, ts,
          |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          |  FROM marked
          |)
          |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
          |FROM sessions GROUP BY user_id, sid
          |HAVING count(*) >= 3
          |ORDER BY user_id, session_start""".stripMargin
      )
    )
  )
}
