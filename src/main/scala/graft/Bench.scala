package graft
import org.apache.spark.sql.SparkSession

/** Record-file parsing for the bench regression tripwire — extracted
  * from the inline tail of [[Bench]] so a SPEC can run the exact
  * production parser over the two committed record files
  * (BENCH_RECORD.json, BENCH_RECORD_organic1.json) and fail the suite
  * the moment a format drift would silently disarm the guard. Round
  * 13's re-base wrote records with `json.dump(indent=0)` (a space
  * after every colon) and the then-whitespace-intolerant regexes
  * matched nothing: the driver bench ran with the tripwire INACTIVE
  * and per-key regressions were only recoverable by offline judge
  * work. Both patterns are now `\s*`-tolerant on BOTH sides of the
  * colon, values may be integers or decimals, and the per-key parse
  * is BOUNDED to the `"queries"` object (pretty-printed records put
  * `"value"` after `"queries"`, which the unbounded scan would have
  * swallowed as a bench key).
  */
object BenchRecords {
  private val sfPat = """"sf"\s*:\s*"([^"]+)"""".r
  private val pairPat = """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)""".r

  def sfOf(rec: String): Option[String] =
    sfPat.findFirstMatchIn(rec).map(_.group(1))

  /** The per-key seconds map of a record/bench JSON blob: pairs inside
    * the `"queries"{...}` object only. Empty map when no queries
    * object exists — callers treat that as "no record". The closing
    * brace is found by DEPTH tracking (string-aware), not first-'}' —
    * a nested value inside "queries" must not silently truncate the
    * map and quietly weaken the tripwire (round-14 advisor finding).
    */
  def queriesOf(rec: String): Map[String, Double] = {
    val start = rec.indexOf("\"queries\"")
    if (start < 0) return Map.empty
    val open = rec.indexOf('{', start)
    if (open < 0) return Map.empty
    var i = open
    var depth = 0
    var inStr = false
    var close = -1
    while (i < rec.length && close < 0) {
      val c = rec.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    val body = rec.substring(open, if (close < 0) rec.length else close)
    pairPat.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch every table once so codegen/classloading/IO setup
    // isn't billed to whichever query happens to run first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    // JIT-warm the md5/HOF hot loops shared by every hashing query —
    // otherwise whichever LSH/fingerprint key runs first is billed the
    // JVM's interpretation phase for all of them (observed 3-5×)
    locally {
      import org.apache.spark.sql.functions._
      spark.range(200000).select(
        md5(concat(lit("w|"), col("id"))).substr(1, 5).as("h"),
        aggregate(transform(sequence(lit(0), lit(9)), i => col("id") + i),
          lit(0L), (a, v) => a + v).as("s"))
        .agg(count(col("h")), sum(col("s"))).collect()
    }
    // Two full passes in deterministic key order; report the per-key
    // MINIMUM. The host VM's effective CPU swings 2-4x run-to-run
    // (BASELINE.md), so a single sample measures host weather, not
    // engine cost. Caches are cleared after every key so each
    // measurement is self-contained (a key's internal persist works;
    // nothing leaks into the next key or the next pass).
    // optional local-iteration filter (comma-separated keys); the
    // driver never sets it -> full registry
    val keep: String => Boolean = sys.env.get("SPARK_GRAFT_BENCH_KEYS") match {
      case Some(ks) if ks.nonEmpty => ks.split(',').map(_.trim).toSet
      case _ => _ => true
    }
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.filter(kv => keep(kv._1)).sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): under count() Catalyst prunes every
        // aggregate expression that isn't a group key (a clamped sum, a
        // median join feeding only output columns), so keys were billed
        // for group-key derivation only. noop executes the full plan —
        // the same work the Verify parquet dump pays.
        // SPARK_GRAFT_BENCH_MODE=count reproduces the legacy (pruned)
        // measurement for apples-to-apples history comparison only.
        // A key that throws is recorded as -1 (failure marker), NEVER as
        // its elapsed time — a query a regression breaks must not
        // "improve" the bench total by failing fast.
        val ok =
          try {
            if (sys.env.get("SPARK_GRAFT_BENCH_MODE").contains("count"))
              fn(spark, sfDir).count()
            else fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        name -> (if (ok) dt else -1.0)
      }
    val p1 = pass().toMap
    // min of the two passes; a pass that failed (-1) never wins unless
    // both failed, in which case the key stays marked -1
    val results = pass().map { case (k, t2) =>
      k -> (if (p1(k) < 0 || t2 < 0) math.max(p1(k), t2) else math.min(p1(k), t2))
    }
    val failed = results.filter(_._2 < 0).map(_._1)
    def s3(v: Double): String = "%.3f".formatLocal(java.util.Locale.US, v)
    // failed keys are excluded from the total and listed explicitly
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Full per-key map goes to a FILE (and an early log line): the
    // driver captures only the last ~2000 chars of stdout, and a
    // 100-key JSON line is ~4 KB — round 1's summary line was
    // decapitated mid-line and recorded as unparseable. The FINAL
    // stdout line is therefore a compact summary (slowest keys
    // detailed, remainder rolled up) sized to survive tail capture.
    val full = results.map { case (k, v) => s"\"$k\":${s3(v)}" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$full,"failed":$failedJson,"sf":"$sfDir","passes":2,"agg":"min"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    println(fullLine)
    // Regression tripwire: compare each key's min against the committed
    // BENCH_RECORD.json — a snapshot of a known-good full run in the
    // SAME config (two-pass min, noop sink, same sf) — and emit a
    // ratio table sorted worst-first. Same-window comparison is the
    // only way a real 3x regression can't hide inside the host's 2-4x
    // run-to-run swings: the record is fixed, so a key whose ratio
    // stands out against the OTHER keys' shared host factor is the
    // regression. Table goes to BENCH_RATIOS.json + stderr (stderr so
    // the driver's stdout tail capture still ends on the summary line).
    try {
      // candidate records: the sf0.1 record plus the organic ×10-scale
      // record (where the saturation cliffs live) — whichever matches
      // this run's sf dir guards it
      val candidates = Seq("BENCH_RECORD.json", "BENCH_RECORD_organic1.json")
      val present = candidates.map(java.nio.file.Paths.get(_))
        .filter(java.nio.file.Files.exists(_))
      val recOpt = present
        .map(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        .find(rec => BenchRecords.sfOf(rec).contains(sfDir))
      // a silent tripwire is worse than none: say when this run's sf
      // has no committed record guarding it (and when a candidate file
      // is missing entirely)
      if (recOpt.isEmpty)
        System.err.println(s"[bench] tripwire INACTIVE: no record matches sf=$sfDir " +
          s"(present: ${present.mkString(", ")}; candidates: ${candidates.mkString(", ")})")
      recOpt.foreach { rec =>
        {
          val recMap = BenchRecords.queriesOf(rec)
          // coverage self-check: a record that guards much less than
          // the run's key set means the parse (or the record) decayed —
          // say so loudly instead of silently comparing a subset
          if (recMap.size * 10 < results.size * 9)
            System.err.println(s"[bench] tripwire WEAK: record covers ${recMap.size} " +
              s"of ${results.size} run keys — re-base or check record parse")
          val ratios = results.collect {
            case (k, v) if v > 0 && recMap.get(k).exists(_ > 0) =>
              (k, v / recMap(k), v, recMap(k))
          }.sortBy(-_._2)
          val newKeys = results.collect { case (k, v) if v >= 0 && !recMap.contains(k) => k }
          val table = ratios.map { case (k, r, cur, old) =>
            s"""{"key":"$k","ratio":${s3(r)},"cur":${s3(cur)},"rec":${s3(old)}}"""
          }.mkString("[", ",", "]")
          val med = if (ratios.nonEmpty) ratios.map(_._2).sorted.apply(ratios.size / 2) else 1.0
          java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_RATIOS.json"),
            (s"""{"median_ratio":${s3(med)},"n_compared":${ratios.size},"new_keys":${newKeys.map("\"" + _ + "\"").mkString("[", ",", "]")},"ratios":$table}""" + "\n")
              .getBytes("UTF-8"))
          System.err.println(s"[bench] tripwire: median ratio ${s3(med)} over ${ratios.size} keys vs record; worst 8:")
          ratios.take(8).foreach { case (k, r, cur, old) =>
            System.err.println(s"[bench]   ${s3(r)}x  $k  ${s3(cur)}s vs ${s3(old)}s" +
              (if (r > 3.0 * med) "  <-- investigate (>3x the shared host factor)" else ""))
          }
        }
      }
    } catch { case e: Throwable => System.err.println(s"[bench] tripwire skipped: ${e.getMessage}") }
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    var restN = 0
    var restSec = 0.0
    var len = 0
    results.sortBy(-_._2).foreach { case (k, v) =>
      val e = s"\"$k\":${s3(v)}"
      if (len + e.length <= 1100) { entries += e; len += e.length + 1 }
      else { restN += 1; restSec += v }
    }
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":${entries.mkString("{", ",", "}")},"rest_keys":$restN,"rest_sec":${s3(restSec)},"n_keys":${results.size},"failed":$failedJson,"sf":"$sfDir","passes":2,"agg":"min","detail":"BENCH_FULL.json"}""")
    spark.stop()
  }
}
