package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Core relational surface, part E: statistical aggregates, bitwise
  * aggregates, ordered string aggregation, and argmin/argmax — the long
  * tail of the delegated aggregate surface (SURVEY §2.B "Aggregation").
  *
  * corr/stddev accumulate in floating point with engine-specific merge
  * trees, so those columns are rounded to the precision both engines
  * agree on; everything else is exact integer/string work.
  */
object CoreQueriesE {

  val all: Seq[Q] = Seq(
    // ----- statistical aggregates ------------------------------------------
    Q(
      "q_agg_stats",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"),
            round(stddev_samp($"l_extendedprice"), 4).as("sd_price"),
            round(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd")
          )
          .orderBy($"l_returnflag"),
      Some(
        "SELECT l_returnflag, " +
          "round(corr(l_quantity, l_extendedprice), 6) AS corr_qp, " +
          "round(stddev_samp(l_extendedprice), 4) AS sd_price, " +
          "round(covar_samp(l_quantity, l_discount), 6) AS cov_qd " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      )
    ),
    // ----- bitwise aggregates (exact integer work) -------------------------
    Q(
      "q_agg_bits",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            expr("bit_and(l_suppkey)").as("band"),
            expr("bit_or(l_suppkey)").as("bor"),
            expr("bit_xor(l_suppkey)").as("bxor")
          )
          .orderBy($"l_returnflag"),
      Some(
        "SELECT l_returnflag, bit_and(l_suppkey) AS band, " +
          "bit_or(l_suppkey) AS bor, bit_xor(l_suppkey) AS bxor " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
      )
    ),
    // ----- ordered string aggregation --------------------------------------
    // collect_list order is nondeterministic under parallelism — sorting
    // the array before joining makes the result well-defined (DuckDB's
    // string_agg ORDER BY is the same contract).
    Q(
      "q_agg_listagg",
      (s, dir) =>
        t(s, dir, "nation")
          .groupBy($"n_regionkey")
          .agg(
            array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
            count(lit(1)).as("n")
          )
          .orderBy($"n_regionkey"),
      Some(
        "SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
          "count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"
      )
    ),
    // ----- argmin / argmax --------------------------------------------------
    // Well-defined here because max(o_totalprice) is unique per group in
    // this dataset (verified); with ties both engines pick arbitrarily.
    Q(
      "q_agg_argmax",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy($"o_orderstatus")
          .agg(
            max_by($"o_orderkey", $"o_totalprice").as("priciest_order"),
            min_by($"o_orderkey", $"o_totalprice").as("cheapest_order"),
            round(max($"o_totalprice"), 2).as("max_price")
          )
          .orderBy($"o_orderstatus"),
      Some(
        "SELECT o_orderstatus, arg_max(o_orderkey, o_totalprice) AS priciest_order, " +
          "arg_min(o_orderkey, o_totalprice) AS cheapest_order, " +
          "round(max(o_totalprice), 2) AS max_price " +
          "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
      )
    )
  )
}
