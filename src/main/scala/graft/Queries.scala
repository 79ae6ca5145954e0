package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One driver-checkable query: a Spark implementation plus (where
  * SQL-expressible) an equivalent ANSI SQL string the driver runs in
  * DuckDB over the same parquet tables (SURVEY.md §2.2 / §5).
  *
  * Determinism contract for oracle queries:
  *  - every query ends in ORDER BY over a unique key set;
  *  - no nullable sort keys (DuckDB defaults NULLS LAST, Spark NULLS
  *    FIRST — we sidestep rather than annotate);
  *  - double aggregation goes through exact DECIMAL or integer
  *    quantization so sums are order-independent and bit-equal across
  *    engines; plain double arithmetic (+,*,/ ,sqrt) is IEEE-754 and
  *    matches bit-for-bit.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def sql(name: String)(oracle: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))
  def rowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}

/** Shared helpers for query implementations. */
object Q {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.io.Tables.table(s, dir, name)

  /** Exact, order-independent SUM of a 2-decimal double column: cast to
    * DECIMAL first (exact add), surface as DOUBLE. Mirrored in oracle SQL
    * as CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def sumD2(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact, order-independent SUM of a COMPUTED double product,
    * quantized to 4 decimals via FLOOR: floor of an identical IEEE
    * double is bit-equal cross-engine, whereas CAST(product AS
    * DECIMAL(18,4)) tie-rounds differently in Spark (shortest string
    * repr) vs DuckDB (full binary value) — the divergence the gen-sf30
    * sweep surfaced in q_agg_hash at 180M rows (2 tie rows × 1e-4).
    * Accumulates in DECIMAL(38,0) (never BIGINT: non-ANSI Spark wraps
    * silently). Oracle mirror:
    * CAST(SUM(CAST(FLOOR(x*10000) AS DECIMAL(38,0))) AS DOUBLE)/10000.
    */
  def sumFloorQ4(c: Column): Column =
    (sum(floor(c * 10000).cast(DecimalType(38, 0))).cast(DoubleType)
      / 10000)
}

object Queries {
  /** Ordered list — order is presentation-only, the driver maps by name. */
  def all: Seq[QuerySpec] =
    RelationalQueries.specs ++ RelationalQueries2.specs ++
      FunctionQueries.specs ++
      StatsQueries.specs ++
      FeatureQueries.specs ++ TextQueries.specs ++ MlQueries.specs ++
      MultimodalQueries.specs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
