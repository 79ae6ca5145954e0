package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Optional comma-separated query-name subset — the scaling-slope
    // harness benches the expensive queries alone at sf >= 1.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Fast mode (scaling-slope runs at sf >= 1): one warm + one timed
    // execution instead of 2 warm + 3 timed. Slope conclusions are
    // about 10x-vs-100x growth, not +/-5% noise, and five executions
    // of a minutes-long query would dominate the wall-clock budget.
    val fast = sys.env.get("SPARK_GRAFT_FAST").contains("1")
    // The documented recommended config (Sessions.tuned): AQE +
    // coalesce/skew handling, 64 MB broadcast threshold, zstd — bench
    // what we tell users to deploy.
    val spark = Sessions.tuned(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.warehouse.dir", Sessions.tempWarehouse())
        .config("spark.ui.enabled", "false"), Sessions.shuffleParts(cpus.toInt, sfDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Prime the shared machinery (shuffle service, parquet footers,
    // catalog) once; per-query warming happens inline below.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
    }
    // Compact the heap after the warm pass builds every cache — a full
    // GC landing inside a timed window otherwise charges multi-second
    // pauses to whichever query was running.
    System.gc()
    // Host-speed calibration probe: a fixed CPU-bound job whose cost is
    // independent of the query suite. BENCH_r05 recorded 75 s where the
    // same code measured 47-53 s in calm windows — uniform ~1.3-3x
    // drift from neighbor CPU steal on the shared VM. Reporting the
    // probe's median alongside the total lets any round's number be
    // read RELATIVE to measured host speed (total/calib is comparable
    // across rounds; total alone is not). Sampled both before and after
    // the timed loop so a degradation window landing mid-run still
    // moves the scalar.
    def probeOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id % 7)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // IO calibration probe (VERDICT r16 item 6): the CPU probe above
    // under-tracks this host's IO variance — r16's normalized totals
    // (393/486) BRACKETED the record on unchanged code because
    // degraded windows slow parquet reads more than arithmetic. A
    // fixed full-scan of the sf dir's lineitem (sum over every column
    // family: ints, doubles, strings, timestamp — nothing prunable)
    // measures bytes-off-disk + parquet decode at the same scale the
    // suite reads, so total can be read against BOTH scalars. Unlike
    // the CPU probe this one is sampled ONLY AFTER the timed loop
    // (warm + 6, median-of-6): pre-loop full-scans of the suite's
    // largest table would leave every lineitem column chunk
    // page-cache-hot before the first timed query — a confound the
    // r13-r16 records don't carry (ADVICE r17; the r17 record DID
    // pre-scan, noted in SURVEY's round history). Post-loop sampling
    // still reads host IO speed in the run's window — and the suite's
    // own warm pass has the table cache-resident by then either way,
    // so the probe tracks decode + page-cache bandwidth, the same
    // regime the timed queries run in.
    def probeIoOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("sum(l_orderkey + l_partkey + l_suppkey)",
          "sum(l_quantity + l_extendedprice + l_discount + l_tax)",
          "sum(length(l_returnflag) + length(l_linestatus))",
          // modulo before summing: a raw sum of epoch-micros overflows
          // BIGINT past ~5M rows under ANSI mode; the mod keeps the
          // full timestamp decode in the scan with a bounded sum
          "sum(unix_micros(cast(l_shipdate as timestamp)) % 1000000007)",
          "count(*)")
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    probeOnce() // warm the probe's generated code
    val calibPre = Array.fill(3)(probeOnce())
    // Median-of-3 timed passes: single measurements on a shared VM
    // showed ±20-25% noise (GC, neighbor steal); the median discards
    // both a hiccup pass and a suspiciously-hot one, so consecutive
    // bench runs land within a few percent of each other.
    // A throwing query must not masquerade as a fast one (r9: three
    // analysis-broken queries "benched" at 0.05 s and the total quietly
    // improved) — record it in `failed` and surface the list in the
    // summary JSON + the exit code.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeOnce(name: String,
        fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => failed += name }
      (System.nanoTime() - t0) / 1e9
    }
    // Fixed (sorted-name) order, and each query re-warms IMMEDIATELY
    // before its timed runs: Spark's generated-class cache holds ~100
    // entries, so once the suite outgrew it the global warm pass
    // stopped protecting expensive-codegen queries (the PQ codebook
    // LUTs take seconds to recompile) — their "timed" runs silently
    // became cold-compile measurements that scaled with suite size,
    // not query cost. Warm-then-time per query measures steady state
    // independent of how many other queries the suite carries.
    val results = selected.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        if (fast) name -> timeOnce(name, fn)
        else {
          timeOnce(name, fn) // re-warm: codegen + caches hot for THIS query
          val ts = Array(timeOnce(name, fn), timeOnce(name, fn),
            timeOnce(name, fn)).sorted
          name -> ts(1)
        }
    }
    val calibAll = (calibPre ++ Array.fill(3)(probeOnce())).sorted
    val calib = (calibAll(2) + calibAll(3)) / 2.0 // median of 6
    probeIoOnce() // warm the IO probe's generated code (post-loop only)
    val calibIoAll = Array.fill(6)(probeIoOnce()).sorted
    val calibIo = (calibIoAll(2) + calibIoAll(3)) / 2.0 // median of 6
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failJson = failed.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","calib":$calib,"calib_io":$calibIo,"failures":$failJson,"queries":$qs,"sf":"$sfDir"}"""
    // The driver captures only a ~2000-char TAIL of stdout; the full
    // per-query blob is >4 KB so its leading "total" field falls off
    // the window (BENCH r01-r03 all parsed:null). Persist the full blob
    // to a file, print it for humans, then print a SHORT summary line
    // LAST so the total always lands inside any tail window.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/bench_out.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Archive the full per-query map per ROUND (VERDICT r18 item 2):
    // BENCH_rN captures only a ~2000-char stdout tail (~60 of 158
    // queries, alphabetical end), so round-over-round comparison was
    // blind to the early alphabet unless bench_out.json happened to
    // survive. The round tag comes from SPARK_GRAFT_ROUND when set;
    // otherwise it is inferred as max(existing BENCH_r*.json) + 1 —
    // the driver benches BEFORE writing this round's BENCH file, so
    // the inference names the CURRENT round. Committed per round, the
    // sweeps/ history lets any verdict diff all queries, not a tail.
    val roundTag = sys.env.get("SPARK_GRAFT_ROUND").map("r" + _)
      .getOrElse {
        val pat = "BENCH_r(\\d+)\\.json".r
        val last = Option(new java.io.File("/root/repo").list())
          .toSeq.flatten
          .collect { case pat(n) => n.toInt }
          .foldLeft(0)(math.max)
        "r" + (last + 1)
      }
    val sweepDir = java.nio.file.Paths.get("/root/repo/sweeps")
    java.nio.file.Files.createDirectories(sweepDir)
    java.nio.file.Files.write(
      sweepDir.resolve(s"bench_per_query_$roundTag.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    println(full)
    println(s"""{"metric":"total","value":$total,"unit":"sec","calib":$calib,"calib_io":$calibIo,"n_queries":${results.size},"failures":$failJson,"sf":"$sfDir","per_query":"bench_out.json"}""")
    System.out.flush()
    if (failed.nonEmpty) sys.exit(1)
  }
}
