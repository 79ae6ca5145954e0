package graft

import org.apache.spark.sql.functions._

import graft.Q._
import graft.QuerySpec.sql

/** Second batch of the §2.2 relational surface: set-op ALL variants,
  * full outer join, explicit grouping sets, RANGE window frames, cross
  * join, and correlated scalar subqueries (Catalyst decorrelation).
  */
object RelationalQueries2 {

  def specs: Seq[QuerySpec] = Seq(

    // Bag semantics: duplicates preserved per multiplicity.
    sql("q_set_intersect_all")(
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(
          t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    sql("q_set_except_all")(
      """SELECT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .exceptAll(
          t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")
    },

    // Full outer join; keys COALESCEd so no nullable sort columns.
    sql("q_join_full")(
      """SELECT COALESCE(c.c_custkey, -1) AS ck,
        |       COALESCE(o.o_custkey, -1) AS ok,
        |       COALESCE(o.o_orderkey, -1) AS okey
        |FROM customer c
        |FULL OUTER JOIN (SELECT * FROM orders
        |                 WHERE o_totalprice > 520000) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY ck, ok, okey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 520000)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), lit(-1L)).as("ck"),
          coalesce(col("o_custkey"), lit(-1L)).as("ok"),
          coalesce(col("o_orderkey"), lit(-1L)).as("okey"))
        .orderBy("ck", "ok", "okey")
    },

    // Explicit GROUPING SETS (beyond rollup/cube) + grouping_id.
    sql("q_agg_grouping_sets")(
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       GROUPING_ID(l_returnflag, l_linestatus) AS gid,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())
        |ORDER BY rf, ls, gid""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"))
        .orderBy("rf", "ls", "gid")
    },

    // RANGE window frame over integer event-time seconds: running sum of
    // the trailing hour per user (frame bounds by VALUE, not row count).
    sql("q_window_range")(
      """SELECT event_id, user_id, ts_s,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |    PARTITION BY user_id ORDER BY ts_s
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS hour_sum
        |FROM (SELECT event_id, user_id,
        |        CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("ts_s"), col("value"))
      val w = Window.partitionBy("user_id").orderBy("ts_s")
        .rangeBetween(-3600L, Window.currentRow)
      ev.withColumn("hour_sum",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
        .select("event_id", "user_id", "ts_s", "hour_sum")
        .orderBy("event_id")
    },

    // Cross join (tiny × tiny — the only place a cartesian is sane).
    sql("q_join_cross")(
      """SELECT r.r_regionkey AS rk, n.n_nationkey AS nk
        |FROM region r CROSS JOIN nation n
        |ORDER BY rk, nk""".stripMargin) { (s, dir) =>
      t(s, dir, "region").select(col("r_regionkey").as("rk"))
        .crossJoin(t(s, dir, "nation").select(col("n_nationkey").as("nk")))
        .orderBy("rk", "nk")
    },

    // Tumbling event-time windows — the batch twin of the streaming
    // windowed agg (streaming/Streams.windowedAgg); hour buckets align
    // to the unix epoch in both engines.
    sql("q_window_tumbling")(
      """SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP)
        |         AS window_start,
        |       event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |         AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // LATERAL correlated table subquery (per-row derived table). The
    // join is spelled LEFT ... ON TRUE with a COALESCE because the
    // engines disagree on the comma-join corner: for a customer with
    // zero orders the scalar-aggregate lateral still yields one row in
    // Spark (correct ungrouped-aggregate semantics) but DuckDB's
    // decorrelation drops it (first diverges at sf0.1, where one such
    // customer exists). The explicit LEFT form pins identical
    // keep-all-rows semantics on both.
    sql("q_lateral")(
      """SELECT c.c_custkey, COALESCE(t.top_price, 0e0) AS top_price
        |FROM customer c
        |LEFT JOIN LATERAL (SELECT max(o_totalprice) AS top_price
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey) t ON TRUE
        |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_cust_lat")
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_lat")
      s.sql(
        """SELECT c.c_custkey, COALESCE(t.top_price, 0e0) AS top_price
          |FROM graft_cust_lat c
          |LEFT JOIN LATERAL (SELECT max(o_totalprice) AS top_price
          |         FROM graft_ord_lat o
          |         WHERE o.o_custkey = c.c_custkey) t ON TRUE
          |ORDER BY c.c_custkey""".stripMargin)
    },

    // Struct-typed columns: build, field access, nested reshaping.
    sql("q_struct_funcs")(
      """SELECT event_id,
        |  ({'ty': event_type, 'uid': user_id}).ty AS ty,
        |  ({'ty': event_type, 'uid': user_id}).uid AS uid,
        |  ({'outer': {'inner': value}}).outer.inner AS nested_v
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val st = struct(col("event_type").as("ty"), col("user_id")
        .as("uid"))
      t(s, dir, "events").select(
          col("event_id"),
          st.getField("ty").as("ty"),
          st.getField("uid").as("uid"),
          struct(struct(col("value").as("inner")).as("outer"))
            .getField("outer").getField("inner").as("nested_v"))
        .orderBy("event_id")
    },

    // Correlated EXISTS subquery (decorrelates to a semi-join).
    sql("q_exists_correlated")(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("graft_cust_ex")
      t(s, dir, "orders").createOrReplaceTempView("graft_ord_ex")
      s.sql(
        """SELECT c_custkey, c_name FROM graft_cust_ex c
          |WHERE EXISTS (SELECT 1 FROM graft_ord_ex o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 400000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // Map-typed columns: construct, extract by key, cardinality.
    // (DuckDB map extraction yields a single-element list — [1] unwraps
    // it to Spark's scalar element_at semantics.)
    sql("q_map_funcs")(
      """SELECT event_id,
        |  map(['t','u'], [event_type, CAST(user_id AS VARCHAR)])['t'][1]
        |    AS t_val,
        |  map(['t','u'], [event_type, CAST(user_id AS VARCHAR)])['u'][1]
        |    AS u_val,
        |  CAST(cardinality(map(['t','u'],
        |    [event_type, CAST(user_id AS VARCHAR)])) AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val m = map_from_arrays(
        array(lit("t"), lit("u")),
        array(col("event_type"), col("user_id").cast("string")))
      t(s, dir, "events").select(
          col("event_id"),
          element_at(m, "t").as("t_val"),
          element_at(m, "u").as("u_val"),
          size(m).cast("bigint").as("n_keys"))
        .orderBy("event_id")
    },

    // UNPIVOT/melt — wide metrics to (key, metric, value) rows, the
    // inverse of q_agg_pivot.
    sql("q_unpivot")(
      """SELECT l_orderkey, l_linenumber, metric, value
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |        l_extendedprice, l_discount FROM lineitem)
        |UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice,
        |                              l_discount))
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount")),
            "metric", "value")
          .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    },

    // Window distribution functions: percent_rank and cume_dist are
    // integer-ratio doubles — IEEE-identical across engines.
    sql("q_window_dist")(
      """SELECT c_custkey, c_mktsegment,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer").select(
          col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy("c_custkey")
    },

    // Date arithmetic: day offsets, clamped month addition, day-of-week
    // (aligned: DuckDB dow is 0-based Sunday, Spark dayofweek 1-based),
    // ISO week of year.
    sql("q_date_arith")(
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(extract(dow FROM o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(extract(week FROM o_orderdate) AS BIGINT) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val d = to_date(col("o_orderdate"))
      t(s, dir, "orders").select(
          col("o_orderkey"),
          date_add(d, 30).as("plus30"),
          add_months(d, 3).as("plus3m"),
          dayofweek(d).cast("bigint").as("dow"),
          weekofyear(d).cast("bigint").as("iso_week"))
        .orderBy("o_orderkey")
    },

    // Time-series resampling to hourly bins with forward fill — the gap
    // filling step of a training-feature pipeline. Bin ids divide in
    // doubles in BOTH engines (identical IEEE division+floor), and the
    // hour bin is insensitive to DuckDB's fractional seconds.
    sql("q_resample_ffill")(
      """WITH b AS (SELECT user_id,
        |    CAST(floor(epoch(ts)/3600) AS BIGINT) AS bin,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |span AS (SELECT user_id, min(bin) lo, max(bin) hi FROM b
        |         GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(lo, hi+1)) AS bin
        |         FROM span),
        |j AS (SELECT g.user_id, g.bin, b.v FROM grid g
        |      LEFT JOIN b USING (user_id, bin))
        |SELECT user_id, bin,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND
        |    CURRENT ROW) AS v_ffill
        |FROM j ORDER BY user_id, bin""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val b = t(s, dir, "events").filter(col("user_id") < 50)
        .groupBy(col("user_id"),
          floor(unix_timestamp(col("ts")) / 3600).cast("bigint")
            .as("bin"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("v"))
      val span = b.groupBy("user_id")
        .agg(min("bin").as("lo"), max("bin").as("hi"))
      val grid = span.select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("bin"))
      val w = Window.partitionBy("user_id").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(b, Seq("user_id", "bin"), "left")
        .withColumn("v_ffill", last(col("v"), ignoreNulls = true).over(w))
        .select("user_id", "bin", "v_ffill")
        .orderBy("user_id", "bin")
    },

    // Skew-salted join, oracle-checked against the plain join — the
    // salt must be invisible in the result (row-identical semantics).
    sql("q_join_salted")(
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
      val orders = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      graft.ops.Relational.saltedJoin(orders, cust, "o_custkey",
          salts = 8)
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("o_orderkey")
    },

    // Approximate distinct via HLL sketch (DataSketches agg; no
    // cross-engine oracle — rows-only; the exact twin is
    // q_agg_distinct).
    QuerySpec.rowsOnly("q_hll_sketch") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey")))
          .as("approx_parts"))
        .orderBy("l_returnflag")
    },

    // Hand-rolled HyperLogLog with a fully cross-engine computation —
    // the oracle-checked twin of q_hll_sketch. All sketch state is
    // integer-exact: md5-derived 60-bit hash, register = low 6 bits,
    // rank = leading-zero count via length(bin(w)) (string bit-length,
    // no libm), harmonic sum scaled by 2^55 so every register
    // contributes an exact BIGINT (max 64 * 2^55 = 2^61, no overflow;
    // DuckDB's HUGEINT sum is cast back). The one floating-point step
    // is the final alpha*m^2*2^55/S expression — identical IEEE ops
    // over identical operands on both engines. Plan shape: two
    // hash aggregations (row -> register, register -> group), i.e. the
    // mergeable-sketch shape where the shuffle carries at most
    // m=64 cells per group, never rows.
    sql("q_hll_md5")(
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(('0x' || substr(md5(concat('h|',
        |      CAST(l_partkey AS VARCHAR))), 1, 15)) AS BIGINT) % 64
        |      AS reg,
        |    CAST(('0x' || substr(md5(concat('h|',
        |      CAST(l_partkey AS VARCHAR))), 1, 15)) AS BIGINT) // 64
        |      AS w
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, reg,
        |        max(CASE WHEN w = 0 THEN 55
        |                 ELSE 55 - length(bin(w)) END) AS mr
        |      FROM b GROUP BY 1, 2),
        |agg AS (SELECT l_returnflag,
        |          count(*) AS regs_used,
        |          CAST(sum(CAST(1 AS BIGINT) << CAST(55 - mr AS INT))
        |            AS BIGINT) AS s_used
        |        FROM r GROUP BY 1),
        |ex AS (SELECT l_returnflag,
        |         count(DISTINCT l_partkey) AS exact_parts
        |       FROM lineitem GROUP BY 1)
        |SELECT a.l_returnflag, e.exact_parts, a.regs_used,
        |  a.s_used + (64 - a.regs_used) * 36028797018963968
        |    AS harmonic_s,
        |  ((CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE))
        |    * CAST(36028797018963968.0 AS DOUBLE))
        |    / CAST(a.s_used + (64 - a.regs_used) * 36028797018963968
        |           AS DOUBLE) AS hll_est
        |FROM agg a JOIN ex e USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val h = expr("CAST(conv(substr(md5(concat('h|', " +
        "CAST(l_partkey AS STRING))), 1, 15), 16, 10) AS BIGINT)")
      val regs = li
        .select(col("l_returnflag"), (h % 64).as("reg"),
          shiftrightunsigned(h, 6).as("w"))
        .groupBy("l_returnflag", "reg")
        .agg(max(when(col("w") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("w"))).cast("long")))
          .as("mr"))
      val agg = regs.groupBy("l_returnflag")
        .agg(count(lit(1)).as("regs_used"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - mr AS INT))"))
            .as("s_used"))
        .withColumn("harmonic_s", col("s_used") +
          (lit(64L) - col("regs_used")) * lit(36028797018963968L))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      agg.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("exact_parts"),
          col("regs_used"), col("harmonic_s"),
          ((lit(0.709) * lit(4096.0) * lit(36028797018963968.0))
            / col("harmonic_s").cast("double")).as("hll_est"))
        .orderBy("l_returnflag")
    },

    // One-pass per-column profiling (non-null + exact distinct counts).
    sql("q_profile")(
      """SELECT 'event_type' AS col_name, count(event_type) AS n_nonnull,
        |       count(DISTINCT event_type) AS n_distinct FROM events
        |UNION ALL
        |SELECT 'user_id', count(user_id), count(DISTINCT user_id)
        |FROM events
        |UNION ALL
        |SELECT 'value', count(value), count(DISTINCT value) FROM events
        |ORDER BY col_name""".stripMargin) { (s, dir) =>
      graft.ops.Relational.profile(t(s, dir, "events"),
          Seq("event_type", "user_id", "value"))
        .orderBy("col_name")
    },

    // first/last/nth value window functions with explicit full frames
    // (deterministic: window order (ts, event_id) is unique per user).
    sql("q_window_firstlast")(
      """SELECT event_id, user_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "events").select(
          col("event_id"), col("user_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(wFull).as("last_v"),
          nth_value(col("value"), 2).over(w).as("second_v"))
        .orderBy("event_id")
    },

    // Positional zip-join (A11, logger/main.py:98 zip(observations,
    // predicted_actions)): 1:1 by row position under a deterministic
    // total order on each side.
    sql("q_zip_position")(
      """WITH a AS (SELECT event_id AS view_id,
        |    row_number() OVER (ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'view'),
        |b AS (SELECT event_id AS click_id,
        |    row_number() OVER (ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'click')
        |SELECT rn, view_id, click_id FROM a JOIN b USING (rn)
        |ORDER BY rn""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      // Global row numbers via partition-parallel zipIndex, not an
      // unpartitioned window (which would collapse each side to one
      // task — the round-1 scale-killer here).
      def ranked(kind: String, outCol: String) =
        graft.ops.Relational.zipIndex(
            ev.filter(col("event_type") === kind)
              .select(col("event_id").as(outCol)),
            Seq(col(outCol)), "__i")
          .select(col(outCol), (col("__i") + 1L).as("rn"))
      ranked("view", "view_id").join(ranked("click", "click_id"), "rn")
        .select("rn", "view_id", "click_id")
        .orderBy("rn")
    },

    // Forward as-of join: each click attaches the EARLIEST purchase
    // at-or-after it (mirror of q_join_asof's backward retrieval).
    sql("q_join_asof_fwd")(
      """WITH q AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |     f AS (SELECT user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |     j AS (SELECT q.event_id, q.user_id, q.ts,
        |                  f.value AS asof_value,
        |                  row_number() OVER (PARTITION BY q.event_id
        |                    ORDER BY f.ts ASC, f.value DESC) AS rn
        |           FROM q JOIN f
        |             ON f.user_id = q.user_id AND f.ts >= q.ts)
        |SELECT event_id, user_id, ts, asof_value FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      graft.ops.Relational.asofJoin(clicks, purchases, "user_id", "ts",
          "ts", Seq("value"), direction = "forward")
        .filter(col("asof_value").isNotNull)
        .select("event_id", "user_id", "ts", "asof_value")
        .orderBy("event_id")
    },

    // Nearest as-of join: each click attaches the temporally CLOSEST
    // purchase in either direction (merge_asof direction='nearest'),
    // composed from one backward and one forward pass of the same
    // union+window machinery — still no range-join pair blowup; ties
    // at whole-second granularity resolve backward.
    sql("q_join_asof_nearest")(
      """WITH q AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'click'),
        |     f AS (SELECT user_id, ts AS fts, value FROM events
        |           WHERE event_type = 'purchase'),
        |     b AS (SELECT q.event_id, f.fts, f.value,
        |             row_number() OVER (PARTITION BY q.event_id
        |               ORDER BY f.fts DESC, f.value DESC) AS rn
        |           FROM q JOIN f ON f.user_id = q.user_id
        |             AND f.fts <= q.ts),
        |     bw AS (SELECT event_id, fts, value FROM b WHERE rn = 1),
        |     fo AS (SELECT q.event_id, f.fts, f.value,
        |             row_number() OVER (PARTITION BY q.event_id
        |               ORDER BY f.fts ASC, f.value DESC) AS rn
        |           FROM q JOIN f ON f.user_id = q.user_id
        |             AND f.fts >= q.ts),
        |     fw AS (SELECT event_id, fts, value FROM fo WHERE rn = 1)
        |SELECT q.event_id, q.user_id, q.ts,
        |  CASE WHEN bw.fts IS NOT NULL AND (fw.fts IS NULL OR
        |         floor(epoch(q.ts)) - floor(epoch(bw.fts)) <=
        |         floor(epoch(fw.fts)) - floor(epoch(q.ts)))
        |       THEN bw.value ELSE fw.value END AS nearest_value,
        |  CASE WHEN bw.fts IS NOT NULL AND (fw.fts IS NULL OR
        |         floor(epoch(q.ts)) - floor(epoch(bw.fts)) <=
        |         floor(epoch(fw.fts)) - floor(epoch(q.ts)))
        |       THEN 'backward' ELSE 'forward' END AS side
        |FROM q LEFT JOIN bw USING (event_id) LEFT JOIN fw USING (event_id)
        |WHERE bw.fts IS NOT NULL OR fw.fts IS NOT NULL
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("fts"), col("value"))
      def pass(direction: String) =
        graft.ops.Relational.asofJoin(clicks, purchases, "user_id", "ts",
          "fts", Seq("fts", "value"), direction = direction)
      val bw = pass("backward").select(col("event_id"),
        col("asof_fts").as("b_fts"), col("asof_value").as("b_v"))
      val fw = pass("forward").select(col("event_id"),
        col("asof_fts").as("f_fts"), col("asof_value").as("f_v"))
      def sec(c: org.apache.spark.sql.Column) =
        floor(unix_timestamp(c).cast("double"))
      val takeBw = col("b_fts").isNotNull && (col("f_fts").isNull ||
        sec(col("ts")) - sec(col("b_fts")) <=
          sec(col("f_fts")) - sec(col("ts")))
      clicks.join(bw, Seq("event_id"), "left")
        .join(fw, Seq("event_id"), "left")
        .filter(col("b_fts").isNotNull || col("f_fts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(takeBw, col("b_v")).otherwise(col("f_v"))
            .as("nearest_value"),
          when(takeBw, lit("backward")).otherwise(lit("forward"))
            .as("side"))
        .orderBy("event_id")
    },

    // Weekly cohort retention: users bucketed by first-activity week,
    // counted per subsequent active week. Week arithmetic stays exact:
    // both timestamps are week-truncated, so the epoch difference is an
    // integer multiple of 604800.
    sql("q_cohort")(
      """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) cohort
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) w
        |  FROM events)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        |       CAST((epoch(w) - epoch(cohort))/604800 AS BIGINT)
        |         AS week_n,
        |       count(*) AS n
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, week_n""".stripMargin) {
      (s, dir) =>
        val ev = t(s, dir, "events")
        val f = ev.groupBy("user_id")
          .agg(min(date_trunc("week", col("ts"))).as("cohort"))
        val act = ev.select(col("user_id"),
          date_trunc("week", col("ts")).as("w")).distinct()
        act.join(f, "user_id")
          .groupBy(col("cohort"),
            ((unix_timestamp(col("w")) - unix_timestamp(col("cohort")))
              / 604800L).cast("bigint").as("week_n"))
          .agg(count(lit(1)).as("n"))
          .orderBy("cohort", "week_n")
    },

    // Sliding event-time windows (1h window, 30m slide): every event
    // lands in exactly two overlapping windows.
    sql("q_window_sliding")(
      """SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type,
        |       count(*) AS n
        |FROM (SELECT event_type, ts,
        |        unnest([time_bucket(INTERVAL '30 minutes', ts),
        |          time_bucket(INTERVAL '30 minutes', ts)
        |            - INTERVAL '30 minutes']) AS ws
        |      FROM events)
        |WHERE ts >= ws AND ts < ws + INTERVAL '1 hour'
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) {
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n"))
          .orderBy("window_start", "event_type")
    },

    // Ordered funnel: users whose first view precedes their first click
    // precedes their first purchase (conditional-min event sequencing).
    sql("q_funnel")(
      """WITH m AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        |  FROM events GROUP BY user_id)
        |SELECT user_id FROM m
        |WHERE t_view IS NOT NULL AND t_click IS NOT NULL
        |  AND t_buy IS NOT NULL AND t_view < t_click AND t_click < t_buy
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts")))
            .as("t_click"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("t_buy"))
        .filter(col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_buy").isNotNull && col("t_view") < col("t_click") &&
          col("t_click") < col("t_buy"))
        .select("user_id")
        .orderBy("user_id")
    },

    // Correlated scalar subquery — Catalyst decorrelates to an aggregate
    // + join; exact MAX so both engines agree bit-for-bit.
    sql("q_subquery_scalar")(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      o.as("o").createOrReplaceTempView("graft_orders_sq")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM graft_orders_sq o
          |WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
          |                      FROM graft_orders_sq o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Deterministic stratified sampling (training-data curation):
    // hash-gated per-stratum rates, reproducible across engines and
    // partitionings — the map-side zero-shuffle sampler.
    sql("q_sample_stratified")(
      """SELECT event_id, event_type FROM events
        |WHERE ((event_id * 48271 + 7) % 2147483647) % 1000 <
        |  CASE event_type WHEN 'purchase' THEN 1000 WHEN 'error' THEN 500
        |    WHEN 'signup' THEN 250 WHEN 'click' THEN 100
        |    WHEN 'view' THEN 50 ELSE 0 END
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.ops.Relational.sampleStratifiedHash(
          t(s, dir, "events").select("event_id", "event_type"),
          "event_id", "event_type",
          Map("purchase" -> 1000, "error" -> 500, "signup" -> 250,
            "click" -> 100, "view" -> 50),
          seed = 7L)
        .orderBy("event_id")
    },

    // Deterministic 80/10/10 train/val/test split of the document
    // corpus (hash-gated like q_sample_stratified: membership is a pure
    // function of doc_id, stable as the corpus grows), summarized per
    // split × language. Zero-shuffle assignment; one aggregate.
    sql("q_train_split")(
      """WITH s AS (SELECT lang, n_chars,
        |    CASE WHEN ((doc_id * 48271 + 11) % 2147483647) % 1000 < 800
        |         THEN 'train'
        |         WHEN ((doc_id * 48271 + 11) % 2147483647) % 1000 < 900
        |         THEN 'val' ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM s GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin) { (s, dir) =>
      graft.ops.Relational.hashSplit(
          t(s, dir, "documents"), "doc_id", seed = 11L,
          Seq("train" -> 800, "val" -> 100, "test" -> 100))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("bigint").as("total_chars"))
        .orderBy("split", "lang")
    },

    // Quota sampling: exactly 5 documents per source, picked by a
    // deterministic md5 shuffle of the id (stable as the corpus grows;
    // both engines hash identically) — the fixed-budget-per-domain
    // curation op, complementing q_sample_stratified's rate form.
    sql("q_sample_pergroup")(
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.ops.Relational.sampleNPerGroup(
          t(s, dir, "documents").select("doc_id", "source", "lang"),
          "source", "doc_id", n = 5)
        .orderBy("doc_id")
    }
  )
}
