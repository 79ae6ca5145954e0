package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName ...] — trailing names restrict
    // the dump (dev loop); the driver passes exactly two.
    // "--sql-only" as the sole trailing arg writes oracle_sql.json and
    // exits without starting Spark (sweep tooling derives its query
    // list from this instead of a stale prior run's output).
    val sfDir = args(0)
    val outDir = args(1)
    val trailing = args.drop(2)
    val sqlOnly = trailing.contains("--sql-only")
    if (sqlOnly && trailing.length > 1) {
      // Mixed --sql-only + query names used to be silently treated as a
      // (never-matching) name filter; fail fast instead (ADVICE r9).
      System.err.println(
        "usage: Verify <sfDir> <outDir> [--sql-only | queryName ...]")
      sys.exit(2)
    }
    val only = if (sqlOnly) Set.empty[String] else trailing.toSet
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def writeOracleJson(): Unit = {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    if (sqlOnly) {
      new java.io.File(outDir).mkdirs()
      writeOracleJson()
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Same recommended config the bench runs (Sessions.tuned); results
    // are partitioning-independent (deterministic ORDER BY, hash gates).
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", Sessions.tempWarehouse())
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Schema-drift canary (r9: driver testdata changed timestamp encoding
    // between rounds and three queries silently vanished from the
    // report). One readable line per drifted column, up front, before
    // any query obscures the root cause.
    val drift = try graft.io.Tables.schemaDrift(spark, sfDir)
                catch { case e: Throwable => Seq(s"canary error: $e") }
    drift.foreach(d => System.err.println(s"[verify] SCHEMA DRIFT: $d"))
    // Persist the canary next to errors.json so a testdata change is
    // visible in the round artifacts without reading logs ([] when clean).
    Files.writeString(Paths.get(s"$outDir/drift.json"),
      drift.map(q).mkString("[", ",", "]"))
    // A query that throws must be LOUD, not a silently-shrinking report:
    // record every failure in errors.json (the driver can surface it) and
    // exit nonzero. r9's three analysis-broken queries "vanished" from
    // CORRECTNESS precisely because this used to stderr-log and move on.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg.linesIterator.take(3).mkString(" | ")
      }
    }
    writeOracleJson()
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Loud summary, but rc stays 0: the driver still compares the
    // queries that DID dump, and errors.json carries the failure list.
    if (failures.nonEmpty)
      System.err.println(
        s"[verify] ${failures.size} FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
