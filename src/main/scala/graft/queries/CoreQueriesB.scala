package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QueryUtil._

/** Core relational surface, part B: window functions, sort/limit/top-k,
  * set operations, subqueries (SURVEY.md §2.B rows "Window functions",
  * "Sort / limit / top-k", "Set ops", "Subqueries" — all delegated by the
  * reference through crates/engine/src/lib.rs:54-57).
  *
  * Every window is partitioned (no global `Window.orderBy` over the fact
  * table — a single-partition window cannot scale), and every ordering is
  * made total with a unique tie-break key so results are deterministic and
  * oracle-hashable.
  */
object CoreQueriesB {

  val all: Seq[Q] = Seq(
    // ----- window: ranking family ----------------------------------------
    Q(
      "q_win_rank",
      (s, dir) => {
        val w = Window
          .partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey")
        t(s, dir, "customer")
          .select(
            $"c_nationkey",
            $"c_custkey",
            $"c_acctbal",
            row_number().over(w).cast("bigint").as("rn"),
            rank().over(w).cast("bigint").as("rnk"),
            dense_rank().over(w).cast("bigint").as("drnk")
          )
          .filter($"rn" <= 5)
          .orderBy($"c_nationkey", $"rn")
      },
      Some(
        "SELECT * FROM (SELECT c_nationkey, c_custkey, c_acctbal, " +
          "CAST(row_number() OVER w AS BIGINT) AS rn, " +
          "CAST(rank() OVER w AS BIGINT) AS rnk, " +
          "CAST(dense_rank() OVER w AS BIGINT) AS drnk " +
          "FROM customer WINDOW w AS " +
          "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)) " +
          "WHERE rn <= 5 ORDER BY c_nationkey, rn"
      ),
      bench = true
    ),
    // ----- window: lag/lead ------------------------------------------------
    Q(
      "q_win_lag",
      (s, dir) => {
        val w = Window
          .partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .filter($"o_custkey" < 200)
          .select(
            $"o_custkey",
            $"o_orderkey",
            $"o_totalprice",
            lag($"o_totalprice", 1).over(w).as("prev_price"),
            lead($"o_totalprice", 1).over(w).as("next_price")
          )
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
          "lag(o_totalprice, 1) OVER w AS prev_price, " +
          "lead(o_totalprice, 1) OVER w AS next_price " +
          "FROM orders WHERE o_custkey < 200 WINDOW w AS " +
          "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
          "ORDER BY o_custkey, o_orderkey"
      )
    ),
    // ----- window: first/last/nth over an explicit full frame --------------
    Q(
      "q_win_first_last",
      (s, dir) => {
        val w = Window
          .partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter($"o_custkey" < 100)
          .select(
            $"o_custkey",
            $"o_orderkey",
            first($"o_totalprice").over(w).as("first_price"),
            last($"o_totalprice").over(w).as("last_price"),
            nth_value($"o_totalprice", 2).over(w).as("second_price")
          )
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, " +
          "first_value(o_totalprice) OVER w AS first_price, " +
          "last_value(o_totalprice) OVER w AS last_price, " +
          "nth_value(o_totalprice, 2) OVER w AS second_price " +
          "FROM orders WHERE o_custkey < 100 WINDOW w AS " +
          "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
          "ORDER BY o_custkey, o_orderkey"
      )
    ),
    // ----- window: running aggregate (ROWS frame) ---------------------------
    // NOTE: l_linenumber is NOT unique within l_orderkey in this synthetic
    // data, so the ROWS frame orders by (l_linenumber, l_quantity): rows
    // tied on both contribute equal amounts, making the prefix sums
    // well-defined regardless of tie order. Output rows are then totally
    // ordered by (l_orderkey, running_n) — running_n is unique in-partition.
    Q(
      "q_win_running",
      (s, dir) => {
        val w = Window
          .partitionBy($"l_orderkey")
          .orderBy($"l_linenumber", $"l_quantity")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .filter($"l_orderkey" < 500)
          .select(
            $"l_orderkey",
            $"l_linenumber",
            asDouble(sum(dec2($"l_quantity")).over(w)).as("running_qty"),
            count(lit(1)).over(w).as("running_n")
          )
          .orderBy($"l_orderkey", $"running_n")
      },
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) OVER w AS DOUBLE) AS running_qty, " +
          "count(*) OVER w AS running_n " +
          "FROM lineitem WHERE l_orderkey < 500 WINDOW w AS " +
          "(PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "ORDER BY l_orderkey, running_n"
      )
    ),
    // ----- window: ntile ----------------------------------------------------
    Q(
      "q_win_ntile",
      (s, dir) => {
        val w = Window
          .partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey")
        t(s, dir, "customer")
          .select(
            $"c_nationkey",
            $"c_custkey",
            ntile(4).over(w).cast("bigint").as("quartile")
          )
          .orderBy($"c_nationkey", $"quartile", $"c_custkey")
      },
      Some(
        "SELECT c_nationkey, c_custkey, CAST(ntile(4) OVER " +
          "(PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) " +
          "AS BIGINT) AS quartile FROM customer " +
          "ORDER BY c_nationkey, quartile, c_custkey"
      )
    ),
    // ----- window: RANGE frame (value-based, deterministic under ties) -----
    // RANGE frames are peer-inclusive so the windowed values are
    // deterministic; the OUTPUT ordering lists every column because
    // (l_orderkey, l_linenumber) is not a unique key in this data — any
    // remaining ties are fully identical rows.
    Q(
      "q_win_range",
      (s, dir) =>
        views(s, dir, "lineitem").sql(
          "SELECT l_orderkey, l_linenumber, l_quantity, " +
            "count(*) OVER w AS n_in_range, " +
            "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) OVER w AS DOUBLE) AS qty_in_range " +
            "FROM lineitem WHERE l_orderkey < 300 WINDOW w AS " +
            "(PARTITION BY l_returnflag ORDER BY l_quantity " +
            "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) " +
            "ORDER BY l_orderkey, l_linenumber, l_quantity, n_in_range, qty_in_range"
        ),
      Some(
        "SELECT l_orderkey, l_linenumber, l_quantity, " +
          "count(*) OVER w AS n_in_range, " +
          "CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) OVER w AS DOUBLE) AS qty_in_range " +
          "FROM lineitem WHERE l_orderkey < 300 WINDOW w AS " +
          "(PARTITION BY l_returnflag ORDER BY l_quantity " +
          "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) " +
          "ORDER BY l_orderkey, l_linenumber, l_quantity, n_in_range, qty_in_range"
      )
    ),
    // ----- sort / limit / top-k (plans as TakeOrderedAndProject) -----------
    Q(
      "q_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(25),
      Some(
        "SELECT o_orderkey, o_totalprice FROM orders " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 25"
      ),
      bench = true
    ),
    // Null ordering: NULLS FIRST/LAST made explicit on both engines
    // (reference exercises NULLS FIRST at crates/engine/src/lib.rs:205).
    Q(
      "q_sort_nulls",
      (s, dir) =>
        t(s, dir, "orders")
          .filter($"o_orderkey" < 200)
          .select(
            nullif($"o_orderstatus", lit("F")).as("status_or_null"),
            $"o_orderkey"
          )
          .orderBy($"status_or_null".asc_nulls_first, $"o_orderkey"),
      Some(
        "SELECT nullif(o_orderstatus, 'F') AS status_or_null, o_orderkey " +
          "FROM orders WHERE o_orderkey < 200 " +
          "ORDER BY status_or_null ASC NULLS FIRST, o_orderkey"
      )
    ),
    // ----- set operations ----------------------------------------------------
    Q(
      "q_union_all",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter($"c_custkey" < 50)
          .select($"c_custkey".as("key"), lit("customer").as("src"))
        val sup = t(s, dir, "supplier")
          .filter($"s_suppkey" < 50)
          .select($"s_suppkey".as("key"), lit("supplier").as("src"))
        c.union(sup).orderBy($"src", $"key")
      },
      Some(
        "SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_custkey < 50 " +
          "UNION ALL " +
          "SELECT s_suppkey AS key, 'supplier' AS src FROM supplier WHERE s_suppkey < 50 " +
          "ORDER BY src, key"
      )
    ),
    Q(
      "q_union_distinct",
      (s, dir) => {
        val c = t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        val sup = t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
        c.union(sup).distinct().orderBy($"nationkey")
      },
      Some(
        "SELECT c_nationkey AS nationkey FROM customer " +
          "UNION " +
          "SELECT s_nationkey AS nationkey FROM supplier " +
          "ORDER BY nationkey"
      )
    ),
    Q(
      "q_intersect",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .filter($"c_acctbal" > 9500)
          .select($"c_custkey".as("key"))
        val o = t(s, dir, "orders").select($"o_custkey".as("key"))
        c.intersect(o).orderBy($"key")
      },
      Some(
        "SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9500 " +
          "INTERSECT SELECT o_custkey AS key FROM orders ORDER BY key"
      )
    ),
    Q(
      "q_except",
      (s, dir) => {
        val p = t(s, dir, "part")
          .filter($"p_size" > 40)
          .select($"p_partkey".as("key"))
        val l = t(s, dir, "lineitem")
          .filter($"l_quantity" > 47)
          .select($"l_partkey".as("key"))
        p.except(l).orderBy($"key")
      },
      Some(
        "SELECT p_partkey AS key FROM part WHERE p_size > 40 " +
          "EXCEPT SELECT l_partkey AS key FROM lineitem WHERE l_quantity > 47 " +
          "ORDER BY key"
      )
    ),
    // ----- subqueries (Catalyst decorrelates; SURVEY.md §2.B "Subqueries") --
    Q(
      "q_subq_scalar",
      (s, dir) =>
        views(s, dir, "part").sql(
          "SELECT p_partkey, p_retailprice FROM part WHERE p_retailprice > " +
            "(SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) FROM part) " +
            "ORDER BY p_partkey"
        ),
      Some(
        "SELECT p_partkey, p_retailprice FROM part WHERE p_retailprice > " +
          "(SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(14,2))) AS DOUBLE) / count(*) FROM part) " +
          "ORDER BY p_partkey"
      )
    ),
    Q(
      "q_subq_in",
      (s, dir) =>
        views(s, dir, "supplier", "nation").sql(
          "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN " +
            "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2) " +
            "ORDER BY s_suppkey"
        ),
      Some(
        "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey IN " +
          "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2) " +
          "ORDER BY s_suppkey"
      )
    ),
    // NOT IN without nulls: plans as a null-aware anti join, non-empty.
    Q(
      "q_subq_not_in",
      (s, dir) =>
        views(s, dir, "customer", "nation").sql(
          "SELECT c_custkey FROM customer WHERE c_nationkey NOT IN " +
            "(SELECT n_nationkey FROM nation WHERE n_regionkey = 0) " +
            "ORDER BY c_custkey LIMIT 500"
        ),
      Some(
        "SELECT c_custkey FROM customer WHERE c_nationkey NOT IN " +
          "(SELECT n_nationkey FROM nation WHERE n_regionkey = 0) " +
          "ORDER BY c_custkey LIMIT 500"
      )
    ),
    // NOT IN whose subquery CONTAINS a NULL: three-valued logic makes the
    // predicate never-true, so the correct answer is EMPTY. An engine that
    // compiles NOT IN to a plain (non-null-aware) anti join returns rows
    // here and fails the oracle — the empty result is the whole point.
    Q(
      "q_subq_not_in_null",
      (s, dir) =>
        views(s, dir, "customer", "nation").sql(
          "SELECT c_custkey FROM customer WHERE c_nationkey NOT IN " +
            "(SELECT nullif(n_nationkey, 3) FROM nation) ORDER BY c_custkey"
        ),
      Some(
        "SELECT c_custkey FROM customer WHERE c_nationkey NOT IN " +
          "(SELECT nullif(n_nationkey, 3) FROM nation) ORDER BY c_custkey"
      )
    ),
    // Correlated EXISTS with an inner predicate referencing the outer row.
    Q(
      "q_subq_exists",
      (s, dir) =>
        views(s, dir, "customer", "orders").sql(
          "SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS " +
            "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
            "AND o.o_totalprice > c.c_acctbal * 40) " +
            "ORDER BY c_custkey"
        ),
      Some(
        "SELECT c_custkey, c_acctbal FROM customer c WHERE EXISTS " +
          "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > c.c_acctbal * 40) " +
          "ORDER BY c_custkey"
      )
    ),
    // Correlated scalar subquery in the SELECT list.
    Q(
      "q_subq_scalar_correlated",
      (s, dir) =>
        views(s, dir, "nation", "supplier").sql(
          "SELECT n_nationkey, n_name, " +
            "(SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers " +
            "FROM nation n ORDER BY n_nationkey"
        ),
      Some(
        "SELECT n_nationkey, n_name, " +
          "(SELECT count(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_suppliers " +
          "FROM nation n ORDER BY n_nationkey"
      )
    )
  )
}
