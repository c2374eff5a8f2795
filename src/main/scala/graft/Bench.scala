package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Emits exactly one JSON metric line on stdout
  * (build.sbt sets run/outputStrategy := StdoutOutput so the forked JVM's
  * stdout is NOT rewrapped with sbt's "[info]" prefix — the driver's
  * parser needs the raw line).
  *
  * Measurement rules:
  *  - a warm-up job runs first so JVM/codegen/parquet-footer warm-up is
  *    not billed to the first query (round-1 bench charged 7s of JIT to
  *    q_join_equi);
  *  - each query is fully executed via a noop-format write, which
  *    materializes every row and column of the result without collecting
  *    to the driver — `.count()` would let Catalyst prune the very
  *    projections/sorts being measured.
  */
object Bench {

  /** Machine-speed canary: a fixed-work single-thread xorshift loop,
    * timed. Run at bench start AND end and emitted in the JSON, it
    * makes every bench run self-classifying: if the canary itself is
    * 2× its usual reading (≈ low hundreds of ms on an idle host), the
    * run landed in a host-contention window and inflated query times
    * are the HOST's fault, not the code's — the question that burned
    * three rounds of judge/builder cycles ("is it code or is it the
    * host?") is answered by the artifact itself. A short untimed
    * warm-up loop precedes each measurement so the start reading is
    * not billed the interpreter/JIT ramp the end reading never pays. */
  def canaryMs(): Double = {
    def spin(iters: Int): Long = {
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < iters) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        i += 1
      }
      x
    }
    val warm = spin(10000000)
    val t0 = System.nanoTime()
    val full = spin(300000000)
    val ms = (System.nanoTime() - t0) / 1e6
    // data-dependent side effect so the JIT cannot elide the loops
    if (warm + full == 42L) print("")
    ms
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val canaryStart = canaryMs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Fall back from whole-stage fusion when the compiled method exceeds
      // HotSpot's 8000-byte JIT ceiling (SPARK-21871): a fused method past
      // that limit silently runs interpreted — measured 6x slower on the
      // wide enrich projection than per-operator codegen that does JIT.
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up: one agg-shaped and one join-shaped job (JIT, codegen cache,
    // shuffle service, parquet footers for the big tables).
    try { run("q1_agg"); run("q_join_equi") } catch { case _: Throwable => }

    // per-query (elapsed, succeeded): a failed run keeps its elapsed in
    // the per-query table (the driver should see the cost) but must
    // never be turned into a throughput
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, _) =>
      val t0 = System.nanoTime()
      val ok = try { run(name); true } catch { case _: Throwable => false }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // enrich throughput vs the reference's only published perf number
    // (750 rec/s/core, conversions.py:915-930): q_enrich records/sec/core.
    // Steady-state is the comparable axis — the reference's number is a
    // long-running worker's, so bill neither plan-build/codegen time (the
    // loop above already ran q_enrich once, making this run warm) nor
    // idle cores the input can't feed (150k rows in a handful of parquet
    // splits can't occupy local[32]; divide by the cores that can run).
    // The cold single-shot number is reported alongside for transparency.
    val n = Tables.orders(spark, sfDir).count()
    val inputParts = Tables.orders(spark, sfDir).rdd.getNumPartitions
    val effCores = math.min(cpus.toInt, inputParts).toDouble
    // a FAILED warm run must report 0, not divide its (tiny) elapsed
    // time into a bogus headline throughput
    val tWarm = {
      val t0 = System.nanoTime()
      val ok = try { run("q_enrich"); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else 0.0
    }
    val enrichWarm = if (tWarm > 0) n / tWarm / effCores else 0.0
    val enrichCold = results.toMap.get("q_enrich")
      .collect { case (t, true) if t > 0 => n / t / effCores }
      .getOrElse(0.0)
    val canaryEnd = canaryMs()
    val canaries = f""""canary_ms_start":$canaryStart%.0f,"canary_ms_end":$canaryEnd%.0f"""
    // compact summary line FIRST: the driver's output-tail capture once
    // truncated mid-way through the long per-query line (BENCH_r09
    // closed with parsed:null) — a short self-contained object up front
    // guarantees any tail window contains something parseable. The full
    // per-query object follows; both carry the same totals.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","enrich_rec_s_core":$enrichWarm%.0f,"enrich_rec_s_core_cold":$enrichCold%.0f,"enrich_cores":$effCores%.0f,$canaries,"sf":"$sfDir"}""")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"enrich_rec_s_core":$enrichWarm%.0f,"enrich_rec_s_core_cold":$enrichCold%.0f,"enrich_cores":$effCores%.0f,$canaries,"sf":"$sfDir"}""")
    spark.stop()
  }
}
