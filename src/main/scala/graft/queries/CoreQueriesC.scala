package graft.queries

import org.apache.spark.sql.functions._
import QueryUtil._

/** Core relational surface, part C: the scalar-function battery and the
  * UDF surface (SURVEY.md §2.B "Scalar fns" / "UDF surface"; reference UDF
  * registration at crates/engine/src/lib.rs:136-144).
  *
  * Functions are chosen so Spark and DuckDB agree bit-for-bit: no libm
  * transcendentals whose last bits differ across runtimes (exp/ln), no
  * double->int casts (Spark truncates, DuckDB rounds — we make the floor
  * explicit), integer-ish outputs cast to BIGINT on both engines.
  */
object CoreQueriesC {

  val all: Seq[Q] = Seq(
    Q(
      "q_fn_string",
      (s, dir) =>
        t(s, dir, "customer")
          .filter($"c_custkey" < 200)
          .select(
            $"c_custkey",
            upper($"c_name").as("uname"),
            lower($"c_name").as("lname"),
            substring($"c_name", 1, 8).as("prefix"),
            length($"c_name").cast("bigint").as("name_len"),
            concat($"c_name", lit("|"), $"c_mktsegment").as("tagged"),
            trim(concat(lit("  "), $"c_mktsegment", lit("  "))).as("trimmed"),
            lpad($"c_mktsegment", 14, "*").as("padded"),
            regexp_replace($"c_name", "Customer#", "C-").as("renamed"),
            reverse($"c_mktsegment").as("rev"),
            split_part($"c_name", lit("#"), lit(2)).as("cust_num")
          )
          .orderBy($"c_custkey"),
      Some(
        "SELECT c_custkey, upper(c_name) AS uname, lower(c_name) AS lname, " +
          "substring(c_name, 1, 8) AS prefix, " +
          "CAST(length(c_name) AS BIGINT) AS name_len, " +
          "concat(c_name, '|', c_mktsegment) AS tagged, " +
          "trim('  ' || c_mktsegment || '  ') AS trimmed, " +
          "lpad(c_mktsegment, 14, '*') AS padded, " +
          "regexp_replace(c_name, 'Customer#', 'C-') AS renamed, " +
          "reverse(c_mktsegment) AS rev, " +
          "split_part(c_name, '#', 2) AS cust_num " +
          "FROM customer WHERE c_custkey < 200 ORDER BY c_custkey"
      )
    ),
    Q(
      "q_fn_math",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter($"l_orderkey" < 100)
          .select(
            $"l_orderkey",
            $"l_linenumber",
            abs($"l_extendedprice" - 5000.0).as("abs_diff"),
            floor($"l_extendedprice").cast("bigint").as("floor_price"),
            ceil($"l_extendedprice").cast("bigint").as("ceil_price"),
            round($"l_extendedprice" / 3.0, 2).as("third_rounded"),
            sqrt($"l_quantity").as("sqrt_qty"),
            ($"l_orderkey" % 7).cast("bigint").as("key_mod7"),
            greatest($"l_discount", $"l_tax").as("max_rate"),
            least($"l_discount", $"l_tax").as("min_rate"),
            signum($"l_extendedprice" - 5000.0).cast("int").as("diff_sign")
          )
          // (l_orderkey, l_linenumber) is not unique in this data — order
          // by every output column so ties are fully identical rows.
          .orderBy(
            $"l_orderkey",
            $"l_linenumber",
            $"abs_diff",
            $"sqrt_qty",
            $"max_rate",
            $"min_rate"
          ),
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "abs(l_extendedprice - 5000.0) AS abs_diff, " +
          "CAST(floor(l_extendedprice) AS BIGINT) AS floor_price, " +
          "CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price, " +
          "round(l_extendedprice / 3.0, 2) AS third_rounded, " +
          "sqrt(l_quantity) AS sqrt_qty, " +
          "CAST(l_orderkey % 7 AS BIGINT) AS key_mod7, " +
          "greatest(l_discount, l_tax) AS max_rate, " +
          "least(l_discount, l_tax) AS min_rate, " +
          "CAST(sign(l_extendedprice - 5000.0) AS INT) AS diff_sign " +
          "FROM lineitem WHERE l_orderkey < 100 " +
          "ORDER BY l_orderkey, l_linenumber, abs_diff, sqrt_qty, max_rate, min_rate"
      )
    ),
    Q(
      "q_fn_date",
      (s, dir) =>
        t(s, dir, "orders")
          .filter($"o_orderkey" < 500)
          .select(
            $"o_orderkey",
            year($"o_orderdate").cast("bigint").as("yr"),
            quarter($"o_orderdate").cast("bigint").as("qtr"),
            month($"o_orderdate").cast("bigint").as("mon"),
            dayofmonth($"o_orderdate").cast("bigint").as("dom"),
            date_trunc("month", $"o_orderdate").as("month_start"),
            $"o_orderdate".cast("date").as("order_date"),
            datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
              .cast("bigint")
              .as("days_since_epoch_start"),
            last_day($"o_orderdate".cast("date")).as("month_end"),
            date_add($"o_orderdate".cast("date"), 30).as("due_date")
          )
          .orderBy($"o_orderkey"),
      Some(
        "SELECT o_orderkey, " +
          "CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr, " +
          "CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr, " +
          "CAST(extract(month FROM o_orderdate) AS BIGINT) AS mon, " +
          "CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom, " +
          "date_trunc('month', o_orderdate) AS month_start, " +
          "CAST(o_orderdate AS DATE) AS order_date, " +
          "CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start, " +
          "last_day(CAST(o_orderdate AS DATE)) AS month_end, " +
          "CAST(o_orderdate AS DATE) + 30 AS due_date " +
          "FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"
      )
    ),
    Q(
      "q_fn_cond",
      (s, dir) =>
        t(s, dir, "orders")
          .select(
            when($"o_totalprice" < 100000, "low")
              .when($"o_totalprice" < 300000, "mid")
              .otherwise("high")
              .as("bucket"),
            coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status2")
          )
          .groupBy($"bucket", $"status2")
          .agg(count(lit(1)).as("n"))
          .orderBy($"bucket", $"status2"),
      Some(
        "SELECT CASE WHEN o_totalprice < 100000 THEN 'low' " +
          "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS bucket, " +
          "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2, " +
          "count(*) AS n FROM orders GROUP BY 1, 2 ORDER BY bucket, status2"
      )
    ),
    Q(
      "q_fn_cast",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 300)
          .select(
            $"p_partkey",
            $"p_partkey".cast("string").as("key_str"),
            $"p_size".cast("double").as("size_d"),
            floor($"p_retailprice").cast("bigint").as("price_floor"),
            ($"p_size" > 25).as("is_large"),
            lit("42").cast("bigint").as("const_int")
          )
          .orderBy($"p_partkey"),
      Some(
        "SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS key_str, " +
          "CAST(p_size AS DOUBLE) AS size_d, " +
          "CAST(floor(p_retailprice) AS BIGINT) AS price_floor, " +
          "p_size > 25 AS is_large, " +
          "CAST('42' AS BIGINT) AS const_int " +
          "FROM part WHERE p_partkey < 300 ORDER BY p_partkey"
      )
    ),
    Q(
      "q_fn_regexp",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 300)
          .select(
            $"p_partkey",
            regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
            regexp_replace($"p_name", "[aeiou]", "*").as("devoweled"),
            $"p_name".rlike("ring|bolt").as("is_hardware")
          )
          .orderBy($"p_partkey"),
      Some(
        "SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word, " +
          "regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled, " +
          "regexp_matches(p_name, 'ring|bolt') AS is_hardware " +
          "FROM part WHERE p_partkey < 300 ORDER BY p_partkey"
      )
    ),
    // JSON extraction over the events.props column (FIXTURES.md B).
    Q(
      "q_fn_json",
      (s, dir) =>
        t(s, dir, "events")
          .select(
            $"event_type",
            get_json_object($"props", "$.k").cast("bigint").as("k")
          )
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum($"k").as("sum_k"),
            min($"k").as("min_k"),
            max($"k").as("max_k")
          )
          .orderBy($"event_type"),
      Some(
        // DuckDB's sum(BIGINT) widens to HUGEINT; cast back to BIGINT to
        // match Spark's long-typed sum in the driver's schema compare.
        "SELECT event_type, count(*) AS n, " +
          "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
          "min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k, " +
          "max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k " +
          "FROM events GROUP BY event_type ORDER BY event_type"
      )
    ),
    // Array construct/access (SURVEY.md §2.B scalar row: array constructors
    // + accessors). DuckDB list functions mirror each operation.
    Q(
      "q_fn_array",
      (s, dir) =>
        t(s, dir, "part")
          .filter($"p_partkey" < 300)
          .select(
            $"p_partkey",
            size(split($"p_name", " ")).cast("bigint").as("n_words"),
            element_at(split($"p_name", " "), 1).as("first_word"),
            array_contains(split($"p_name", " "), "red").as("has_red"),
            array_join(array_sort(split($"p_name", " ")), "-").as("sorted_words")
          )
          .orderBy($"p_partkey"),
      Some(
        "SELECT p_partkey, " +
          "CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words, " +
          "string_split(p_name, ' ')[1] AS first_word, " +
          "list_contains(string_split(p_name, ' '), 'red') AS has_red, " +
          "array_to_string(list_sort(string_split(p_name, ' ')), '-') AS sorted_words " +
          "FROM part WHERE p_partkey < 300 ORDER BY p_partkey"
      )
    ),
    // Struct construct + field access, flattened back to scalars.
    Q(
      "q_fn_struct",
      (s, dir) =>
        t(s, dir, "supplier")
          .select(
            struct($"s_suppkey".as("k"), $"s_name".as("nm")).as("sup")
          )
          .select(
            $"sup.k".as("supplier_key"),
            $"sup.nm".as("supplier_name")
          )
          .orderBy($"supplier_key"),
      Some(
        "SELECT (sup).k AS supplier_key, (sup).nm AS supplier_name FROM " +
          "(SELECT struct_pack(k := s_suppkey, nm := s_name) AS sup FROM supplier) " +
          "ORDER BY supplier_key"
      )
    ),
    // The reference's one UDF: capitalize == full uppercase
    // (crates/engine/src/lib.rs:89), null-preserving (:85-86). Resolved to
    // Spark's native codegen'd Upper via graft.functions.Functions.
    Q(
      "q_udf_capitalize",
      (s, dir) => {
        graft.functions.Functions.register(s)
        t(s, dir, "documents")
          .select(
            $"doc_id",
            expr("capitalize(substring(text, 1, 24))").as("capitalized_text")
          )
          .orderBy($"doc_id")
      },
      Some(
        "SELECT doc_id, upper(substring(text, 1, 24)) AS capitalized_text " +
          "FROM documents ORDER BY doc_id"
      )
    )
  )
}
