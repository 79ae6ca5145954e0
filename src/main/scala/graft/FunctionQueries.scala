package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Q._
import graft.QuerySpec.sql

/** Scalar function bundles: string / date / math / array / json +
  * the nested build-flatten round-trip (SURVEY.md §2.2, A7/A10 heritage).
  *
  * Cross-engine notes (Spark vs DuckDB oracle):
  *  - integer-returning functions are cast to BIGINT on both sides
  *    (Spark year() is INT, DuckDB extract() is BIGINT — hashes differ);
  *  - float outputs only through IEEE-deterministic ops (+,-,*,/,sqrt,
  *    floor, ceil, abs) or exact DECIMAL/integer paths;
  *  - array-valued outputs are reduced to scalars (parquet list compare
  *    is representation-sensitive).
  */
object FunctionQueries {

  def specs: Seq[QuerySpec] = Seq(

    sql("q_str_funcs")(
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_brand) AS brand_lower,
        |  substr(p_name, 1, 5) AS name_pfx,
        |  concat(p_brand, '/', p_type) AS brand_type,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  trim(concat(' ', p_name, ' ')) AS name_trim,
        |  replace(p_name, ' ', '_') AS name_us,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          length(col("p_name")).cast(LongType).as("name_len"),
          trim(concat(lit(" "), col("p_name"), lit(" "))).as("name_trim"),
          regexp_replace(col("p_name"), " ", "_").as("name_us"),
          element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy("p_partkey")
    },

    // Unix-seconds heritage (notebook.ipynb:197): timestamps round-trip
    // through epoch seconds; dates are midnight so the trip is exact.
    sql("q_date_funcs")(
      """SELECT o_orderkey,
        |  CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS mon,
        |  CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
        |  CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
        |    AS days_since,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT))
        |       AS TIMESTAMP) AS ts_roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mon"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType))
            .cast(LongType).as("days_since"),
          last_day(col("o_orderdate")).as("month_end"),
          timestamp_seconds(unix_timestamp(col("o_orderdate")))
            .as("ts_roundtrip"))
        .orderBy("o_orderkey")
    },

    sql("q_math_funcs")(
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  abs(l_discount - 0.05) AS abs_disc,
        |  floor(l_extendedprice / 100) AS price_floor,
        |  ceil(l_extendedprice / 100) AS price_ceil,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_quantity * l_quantity AS qty_sq,
        |  CASE WHEN l_discount > 0.05 THEN l_extendedprice * 0.9
        |       ELSE l_extendedprice END AS adj_price,
        |  CAST(sign(l_tax - 0.02) AS DOUBLE) AS tax_sign
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"),
          abs(col("l_discount") - 0.05).as("abs_disc"),
          floor(col("l_extendedprice") / 100).cast(DoubleType)
            .as("price_floor"),
          ceil(col("l_extendedprice") / 100).cast(DoubleType)
            .as("price_ceil"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"),
          when(col("l_discount") > 0.05, col("l_extendedprice") * 0.9)
            .otherwise(col("l_extendedprice")).as("adj_price"),
          signum(col("l_tax") - 0.02).cast(DoubleType).as("tax_sign"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")
    },

    // Higher-order array functions over the embedding column. The dot/
    // norm math uses integer quantization (floor(x*1e6) → BIGINT) so the
    // fold is exact and order-independent — same scheme as the
    // similarity-search operators in TextQueries.
    sql("q_array_funcs")(
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  embedding[1] AS first_val,
        |  embedding[len(embedding)] AS last_val,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
        |       * CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
        |    AS BIGINT) AS qnorm_sq,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)
        |    AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val qx = "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
      t(s, dir, "embeddings").select(
          col("vec_id"), col("label"),
          size(col("embedding")).cast(LongType).as("dim"),
          element_at(col("embedding"), 1).as("first_val"),
          element_at(col("embedding"), size(col("embedding")))
            .as("last_val"),
          expr(s"""aggregate(embedding, CAST(0 AS BIGINT),
                   (acc, x) -> acc + $qx * $qx)""").as("qnorm_sq"),
          expr("CAST(size(filter(embedding, x -> x > CAST(0 AS FLOAT)))" +
            " AS BIGINT)").as("n_pos"))
        .orderBy("vec_id")
    },

    // JSON field extraction from events.props (A2/A3 NDJSON heritage).
    sql("q_json_funcs")(
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events").select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
        .orderBy("event_id")
    },

    // VariantType twin of q_json_funcs (Spark 4 semi-structured path):
    // parse_json shreds the JSON ONCE into the binary variant encoding
    // and every variant_get is an O(path) binary probe — at 100 TB the
    // string form re-parses the JSON text per extraction, the variant
    // form amortizes it (and the parquet variant shredding spec pushes
    // typed subcolumns to the scan). The oracle sees only the extracted
    // values, which align with DuckDB's JSON functions.
    sql("q_variant_funcs")(
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) < 50
        |    AS is_small
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val v = parse_json(col("props"))
      t(s, dir, "events").select(
          col("event_id"),
          variant_get(v, "$.k", "bigint").as("k_val"),
          variant_get(v, "$.k", "string").as("k_str"),
          (variant_get(v, "$.k", "bigint") < 50).as("is_small"))
        .orderBy("event_id")
    },

    // Nested build → flatten round-trip (A7/A10): collect_list per key,
    // sort for stable element order, explode back out.
    sql("q_collect_explode")(
      """WITH g AS (SELECT user_id, list_sort(list(value)) AS vs
        |           FROM events GROUP BY user_id)
        |SELECT user_id, unnest(vs) AS value FROM g
        |ORDER BY user_id, value""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(sort_array(collect_list(col("value"))).as("vs"))
        .select(col("user_id"), explode(col("vs")).as("value"))
        .orderBy("user_id", "value")
    }
  )
}
