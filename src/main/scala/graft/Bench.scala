package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    // ERROR, not WARN: each per-query GraftSession re-registers the function
    // surface, and Spark logs a WARN per replaced function — thousands of stderr
    // lines that sbt interleaves into the captured output and push the final
    // summary line out of the driver's 2000-char tail (BENCH_r3–r6 `parsed:
    // null` all show a tail of SimpleFunctionRegistry WARNs, not the summary).
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session (codegen, file listing, shuffle service) outside the timings.
    try {
      spark.sql("select count(*) c from range(1000)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => }
    // One cold run (janino codegen compiles, parquet footer/file-listing cache, JDBC
    // pool spin-up, manifest deploy — one-time costs a long-lived service never
    // re-pays per query), then THREE warm runs — interleaved round-robin across
    // queries — reported as the per-query MEDIAN. The shared-JVM run co-schedules
    // queries against GC/JIT, and a single warm sample can read 3× its isolated
    // latency (r3's q9: 1.80 s benched vs 0.64 s isolated); queries whose spread
    // still exceeds their median after interleaving are re-run isolated and
    // flagged "noisy". The max-min spread across the warm runs is disclosed so
    // round-over-round comparisons can tell regression from noise.
    // A failed run must NOT contribute a plausible-looking timing (r5 lesson: 8
    // analysis-time failures appeared as 0.05-0.23 s "medians" and masked a real
    // regression) — failures return the error message and are excluded from every
    // total, surfacing in an "errors" map instead.
    // Timed action: the noop sink (guide §1.4), switched at the START of opt
    // round 16 so every r16 A/B shares one methodology. count() let Catalyst
    // prune columns and drop final sorts, so map-heavy queries were timed on a
    // filter/agg skeleton; the noop write materializes EVERY column of EVERY
    // row and discards it — the honest full-computation time. (r15 kept
    // count() only for r14-comparability; the re-baseline table lives in
    // OPTIMIZATION_r16.md. The "timed_action" stamp below discloses the switch.)
    def once(fn: (SparkSession, String) => DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    val warmRuns = 3
    // ---- self-adjudication (round-14 #1): three same-binary r13 runs disagreed
    // 3-50x on isolated suite totals while warm co-scheduled medians agreed to
    // ±9% — the end-of-run isolated phase is exposed to environment throttling
    // the interleaved medians average out, and the perf gate could not tell a
    // real regression from a hot box. So the bench now measures ITSELF:
    //  - a fixed SENTINEL (tpch_q6: one scan+filter+agg, sub-second, plan
    //    unchanged for 10 rounds) is re-timed (median of 3) between every
    //    phase; a phase whose bracketing sentinel readings drift >2x from the
    //    session MIN (the settled floor, retro-stamped at emit) is stamped
    //    `contaminated` — comparisons must skip it (BENCH_TREND rule);
    //  - the environment is recorded (loadavg at start/end, cgroup cpu quota,
    //    actual driver heap) so a 8g-vs-90g or busy-box run is visible;
    //  - the driver heap default is PINNED in build.sbt (32g); a run that
    //    overrides it gets `driver_mem_pinned:false` stamped here.
    val sentinelFn = SparkEntry.queries("tpch_q6")
    // steady-state the sentinel's plan before the baseline reading: a
    // JIT-warming session-start reading sits ~2x above the settled value and
    // would halve the contamination rule's sensitivity for the whole run.
    // (Known cost: tpch_q6's own COLD reading is sacrificed — it enters the
    // cold pass pre-warmed. One scan-agg query out of the 27 first-of-family
    // entries the cold-start adjudication tracks; accepted.)
    (1 to 3).foreach(_ => once(sentinelFn))
    // SPARK_GRAFT_SYNTH_STALL=<label>: burn every core for the duration of
    // that labeled sentinel reading — a proof harness for the contamination
    // stamp (r15 #2: the rule must demonstrably catch the r14-style throttled
    // phase). The driver never sets it.
    val synthStall = sys.env.get("SPARK_GRAFT_SYNTH_STALL")
    def sentinelRead(label: String): Double = {
      val burn = new java.util.concurrent.atomic.AtomicBoolean(
        synthStall.contains(label))
      val burners = if (burn.get) (1 to Runtime.getRuntime.availableProcessors)
        .map { _ =>
          val t = new Thread(() => {
            var x = 1.0
            while (burn.get) { x = math.sqrt(x + 1.0) }
          })
          t.setDaemon(true); t.start(); t
        } else Nil
      try {
        val ws = Seq.fill(3)(once(sentinelFn)).collect { case Right(w) => w }
        if (ws.isEmpty) -1.0 else ws.sorted.apply(ws.size / 2)
      } finally { burn.set(false); burners.foreach(_.join(2000)) }
    }
    val sentinelReads = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    sentinelReads += ("start" -> sentinelRead("start"))
    def readSys(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").trim)
      catch { case _: Throwable => None }
    val loadStart = readSys("/proc/loadavg").map(_.split(" ").take(3).mkString(" "))
      .getOrElse("?")
    val cpuQuota = readSys("/sys/fs/cgroup/cpu.max")
      .orElse(readSys("/sys/fs/cgroup/cpu/cpu.cfs_quota_us")).getOrElse("?")
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    // Xmx32g reports ~30.8-34.4e9 depending on GC survivor accounting
    val memPinned = heapGb > 28.0 && heapGb < 35.0
    // SPARK_GRAFT_ONLY=d4_ngram_jaccard,d2_dedup_minhash narrows the run for
    // iterating on one query's plan; the driver never sets it (full suite).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (k, _) => names(k) }
      // the tpch_qN_translit_<dialect> entries are correctness probes whose
      // Spark side is byte-identical to tpch_qN's (already timed as tpch_qN
      // AND tpch_qN_unparse) — timing the same plan a third and fourth time
      // adds wall with zero information, so the full suite skips them
      case None => SparkEntry.queries.filter(!_._1.contains("_translit"))
    }
    val qseq = selected.toSeq
    // Cold pass first (codegen + file-listing + deploy costs), then warm runs
    // INTERLEAVED round-robin across queries — three back-to-back runs of the
    // same query share one GC/JIT window, so a single co-scheduling stall
    // poisoned all three samples and medians carried 5-7 s spreads (r6: p7, d8).
    // Round-robin decorrelates the samples: a stall hits one sample of many
    // queries instead of every sample of one.
    val colds: Map[String, Either[String, Double]] =
      qseq.map { case (n, fn) => n -> once(fn) }.toMap
    sentinelReads += ("after_cold" -> sentinelRead("after_cold"))
    val warmSamples = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ListBuffer[Either[String, Double]]]
    for (_ <- 0 until warmRuns; (n, fn) <- qseq) {
      warmSamples.getOrElseUpdate(n,
        scala.collection.mutable.ListBuffer.empty) += once(fn)
    }
    sentinelReads += ("after_warm" -> sentinelRead("after_warm"))
    // Drop accumulated storage memory before the isolated reruns: interleaving
    // keeps ~every query's persisted frames resident at once (sequential runs
    // let the ContextCleaner reclaim between queries), and measuring the rerun
    // under that pressure is what the rerun exists to avoid.
    spark.catalog.clearCache()
    def median(ws: Seq[Double]): Double = ws.sorted.apply(ws.size / 2)
    // First-pass stats for every query whose warm runs ALL succeeded — a failed
    // cold run alone no longer drops the query from the timing maps (it was
    // genuinely succeeding warm; losing it hid round-over-round comparisons).
    val firstPass = qseq.flatMap { case (name, _) =>
      val warms = warmSamples(name).toList
      if (warms.forall(_.isRight)) {
        val ws = warms.collect { case Right(w) => w }
        Some((name, median(ws), ws.max - ws.min))
      } else None
    }
    // A query whose spread exceeds BOTH its median and an absolute floor is
    // re-run ISOLATED (nothing else co-scheduled, cache cleared) and the
    // isolated median replaces the suite number; the query is flagged "noisy"
    // so the judge knows which timings came from the rerun. The floor matters:
    // interleaved samples are separated by full suite passes, so sub-second
    // queries routinely show spread > median from scheduling alone — without it
    // the whole suite re-runs (r7 first cut: 103/125 flagged). The rerun set is
    // capped at the 12 worst spreads to bound the phase; a genuine regression
    // is by definition near the top of that order.
    val candidates = firstPass.collect {
      case (name, med, spread) if spread > med && spread > 0.75 => (name, spread) }
    val noisy = candidates.sortBy(-_._2).take(12).map(_._1).toSet
    val isolated: Map[String, (Double, Double)] = noisy.toSeq.sorted.map { name =>
      val fn = selected(name)
      spark.catalog.clearCache()
      val ws = Seq.fill(warmRuns)(once(fn)).collect { case Right(w) => w }
      if (ws.size == warmRuns) name -> (median(ws), ws.max - ws.min)
      else name -> (firstPass.find(_._1 == name).get._2,
        firstPass.find(_._1 == name).get._3)
    }.toMap
    sentinelReads += ("after_noisy" -> sentinelRead("after_noisy"))
    val timed: Seq[(String, Option[Double], Double, Double)] =
      firstPass.map { case (name, med, spread) =>
        val (m, sp) = isolated.getOrElse(name, (med, spread))
        (name, colds(name).toOption, m, sp)
      }
    val errors: Seq[(String, String)] = qseq.collect {
      case (name, _) if colds(name).isLeft || warmSamples(name).exists(_.isLeft) =>
        (name, (colds(name).left.toSeq ++
          warmSamples(name).flatMap(_.left.toSeq)).head)
    }
    val coldTotal = timed.flatMap(_._2).sum
    val qs = timed.map { case (k, _, med, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val spreads = timed.map { case (k, _, _, sp) =>
      s"\"" + k + "\":" + f"$sp%.3f" }.mkString("{", ",", "}")
    val total = timed.map(_._3).sum
    // Planning parity (BASELINE.md): warm manifest->plan latency per TPC-H query —
    // deploy once, then time analysis+optimization only (no execution), mirroring
    // the reference's transform_sql benchmark (wren-core/benchmarks/src/tpch/run.rs).
    val planningMs: Double = try {
      val session = GraftEngine.deployOnDir(spark, queries.TpcH.manifest, sfDir)
      val sqls = queries.TpcH.oracles.values.toSeq
      sqls.foreach(sql => session.query(sql).queryExecution.optimizedPlan) // warm
      val t0 = System.nanoTime()
      sqls.foreach(sql => session.query(sql).queryExecution.optimizedPlan)
      (System.nanoTime() - t0) / 1e6 / sqls.size
    } catch { case _: Throwable => -1.0 }
    val planningStr = "%.2f".formatLocal(java.util.Locale.ROOT, planningMs)
    // Isolated sub-benches (round-9 verdict #3, widened per round-11 #4): the
    // co-scheduled warm median moves with SUITE SIZE (r8→r9: q21 0.66→1.34 s
    // with an unchanged, plan-guarded plan, purely from 27 added entries
    // sharing one JVM's GC/cache; r10→r11 the same ±30% swing rotated through
    // suite_pipeline → suite_dedup/multimodal) — so round-over-round
    // comparison of the heavy suites needs numbers taken with nothing else
    // co-scheduled: the suite alone, sequential, cache cleared and the JVM
    // GC-settled first, median of the same warm-run count. Per-query isolated
    // medians land in bench_full.json (`isolated_queries`) so a single hot
    // entry (r11: d11_incremental_neardup, 7.0 s co-scheduled) can be
    // adjudicated without a judge re-derivation.
    val isolatedQueryMeds = scala.collection.mutable.Map.empty[String, Double]
    def isolatedTotal(pick: String => Boolean): Double = {
      spark.catalog.clearCache()
      // settle the JVM before the comparator phase: the suite leaves the heap
      // full of old-gen garbage and a first-touch measurement would pay the
      // collection (first cut measured 2x the fresh-JVM values from exactly
      // this; the co-scheduled medians were unaffected)
      System.gc()
      Thread.sleep(2000)
      val tq = SparkEntry.queries.toSeq.filter(t => pick(t._1)).sortBy(_._1)
      tq.foreach { case (_, fn) => once(fn) } // warm pass outside the timing
      tq.map { case (n, fn) =>
        val ws = Seq.fill(warmRuns)(once(fn)).collect { case Right(w) => w }
        val med = if (ws.isEmpty) 0.0 else ws.sorted.apply(ws.size / 2)
        isolatedQueryMeds(n) = med
        med
      }.sum
    }
    val tpchIsolatedTotal: Double = if (only.isEmpty) {
      val v = isolatedTotal(k => k.startsWith("tpch_") && !k.contains("_unparse") &&
        !k.contains("_translit"))
      sentinelReads += ("after_iso_tpch" -> sentinelRead("after_iso_tpch"))
      v
    } else -1.0
    // the three suites whose co-scheduled totals have swung ±30% between
    // rounds without a code change — one isolated comparator each; the
    // sentinel brackets each so a throttled phase is individually stamped
    def isolatedSuite(name: String, pick: String => Boolean): (String, Double) = {
      val v = isolatedTotal(pick)
      sentinelReads += (s"after_iso_$name" -> sentinelRead(s"after_iso_$name"))
      name -> v
    }
    val isolatedSuites: Seq[(String, Double)] = if (only.isEmpty) Seq(
      isolatedSuite("dedup", k => k.head == 'd' && !k.startsWith("tpch")),
      isolatedSuite("pipeline", _.head == 'p'),
      isolatedSuite("multimodal", _.startsWith("mm")),
      // round 13: the graph/ER family's iterative queries (checkpointed
      // power-iteration rounds) co-schedule badly (er1 9.2 s co-scheduled vs
      // 1.7 s isolated in its first round) — isolated from day one
      isolatedSuite("graph_er", k => k.startsWith("er") || k.startsWith("g")))
    else Nil
    // the baseline is the MIN of all session readings, retro-stamped at emit
    // (r15 #2: the session-start reading still carries ~2.5x of JIT residue
    // even after its warmups — r14's builder/driver runs disagreed 2x on warm
    // totals yet both stamped clean because the >2x-of-start threshold
    // tolerated phases at ~5x the settled sentinel). A phase is contaminated
    // when EITHER bracketing reading drifts >2x from that settled floor
    // (throttling before a phase poisons it as surely as throttling during
    // it), or when either bracketing reading FAILED (non-positive — a failed
    // reading is missing evidence, not evidence of cleanliness).
    val settledSentinel: Double = {
      val ok = sentinelReads.map(_._2).filter(_ > 0)
      if (ok.isEmpty) -1.0 else ok.min
    }
    val contaminated: Seq[String] = {
      if (settledSentinel <= 0) Seq("all:sentinel_failed")
      else (1 until sentinelReads.size).collect {
        case i if sentinelReads(i)._2 > 2 * settledSentinel ||
            sentinelReads(i - 1)._2 > 2 * settledSentinel ||
            sentinelReads(i)._2 <= 0 || sentinelReads(i - 1)._2 <= 0 =>
          sentinelReads(i)._1.stripPrefix("after_")
      }
    }
    val loadEnd = readSys("/proc/loadavg").map(_.split(" ").take(3).mkString(" "))
      .getOrElse("?")
    val isolatedSuitesJson = isolatedSuites.map { case (k, v) =>
      s"\"" + k + "\":" + "%.3f".formatLocal(java.util.Locale.ROOT, v)
    }.mkString("{", ",", "}")
    val tpchIsoStr = "%.3f".formatLocal(java.util.Locale.ROOT, tpchIsolatedTotal)
    def f3(d: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errorsJson = errors.map { case (k, msg) => s"\"$k\":${jstr(msg)}" }
      .mkString("{", ",", "}")
    // Compact stdout line must stay under the driver's ~1.8 KB tail budget even
    // in a many-failure round — names only; full messages live in bench_full.json.
    val errorNamesJson = errors.map(e => jstr(e._1)).mkString("[", ",", "]")
    // Streaming HARNESSES measure an end-to-end micro-pipeline (MemoryStream →
    // checkpointed query → temp-dir sink), so their wall time is dominated by
    // checkpoint/commit-log I/O, not operator cost — r9's mm8 "regression"
    // adjudicated to exactly this (its compactIndexAt=64 threshold can never
    // fire on a 2-batch fixture; spread 2.3 s on a 4.9 s median). Disclosed as
    // a class so round-over-round comparison discounts them like `noisy`.
    val harnessClass = Seq("w1_shard_manifest", "w2_stream_manifest",
      "mm8_stream_media_dedup").filter(selected.contains)
    val harnessJson = harnessClass.sorted.map(jstr).mkString("[", ",", "]")
    val noisyJson = noisy.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    // The driver's BENCH capture keeps only the LAST 2000 chars of output, and sbt
    // appends "[success] Total time: ..." (~75 chars) after us — so the one
    // parseable summary line must be LAST and comfortably under ~1.8 KB. A map of
    // all 123 per-query medians is ~2.6 KB and can never survive (r3/r4:
    // `parsed: null`). Stdout therefore carries per-query medians only for the
    // TPC-H suite (the set BASELINE.md compares) plus one total per query family;
    // the full per-query medians/cold/spread detail goes to bench_full.json.
    val sentinelJson = sentinelReads.map { case (k, v) =>
      s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val contaminatedJson = contaminated.map(jstr).mkString("[", ",", "]")
    val envJson = s"""{"loadavg_start":${jstr(loadStart)},""" +
      s""""loadavg_end":${jstr(loadEnd)},"cpu_quota":${jstr(cpuQuota)},""" +
      s""""heap_gb":${f3(heapGb)},"cpus":${Runtime.getRuntime.availableProcessors}}"""
    // sentinel-relative per-query medians (median ÷ settled sentinel): box
    // speed cancels, so builder/driver/judge runs on differently-loaded hosts
    // compare apples-to-apples (BENCH_TREND's cross-run rule reads these)
    val sentinelRelJson =
      if (settledSentinel <= 0) "{}"
      else timed.map { case (k, _, med, _) =>
        s"\"" + k + "\":" + f3(med / settledSentinel) }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""planning_ms_per_query":$planningStr,"timing":"warm_median_of_$warmRuns",""" +
      s""""timed_action":"noop",""" +
      s""""sentinel":"tpch_q6","sentinel_sec":$sentinelJson,""" +
      s""""sentinel_settled_sec":${f3(settledSentinel)},""" +
      s""""sentinel_relative":$sentinelRelJson,""" +
      s""""contaminated_phases":$contaminatedJson,""" +
      s""""driver_mem_pinned":$memPinned,"env":$envJson,""" +
      s""""tpch_isolated_total":$tpchIsoStr,"isolated_suites":$isolatedSuitesJson,""" +
      s""""isolated_queries":${isolatedQueryMeds.toSeq.sortBy(_._1).map { case (k, v) =>
        s"\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")},""" +
      s""""warm_total_sec":$total,"cold_total_sec":$coldTotal,""" +
      s""""queries_cold_sec":${timed.collect { case (k, Some(c), _, _) => s"\"" + k + "\":" + f3(c) }.mkString("{", ",", "}")},""" +
      s""""queries_spread_sec":$spreads,"noisy_isolated_rerun":$noisyJson,""" +
      s""""errors":$errorsJson,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        full.getBytes("UTF-8"))
    } catch { case _: Throwable => }
    // The 27 *_unparse cross-engine entries re-run existing source queries; in
    // the COMPACT line they fold into one family total (22 individual
    // tpch_qN_unparse entries would push the line past the driver's ~1.8 KB
    // tail budget — per-query medians stay in bench_full.json).
    def family(name: String): String =
      if (name.endsWith("_unparse") || name.endsWith("_postgres") ||
        name.endsWith("_trino") || name.endsWith("_redshift") ||
        name.contains("_translit")) "suite_unparse"
      else if (name.startsWith("tpch_")) "tpch"
      else if (name.startsWith("mm")) "suite_multimodal"
      else if (name.startsWith("er") || name.startsWith("g")) "suite_graph_er"
      else name.head match {
        case 'm' => "suite_semantic"   case 'q' => "suite_relational"
        case 'd' => "suite_dedup"      case 'e' => "suite_events"
        case 'f' => "suite_functions"  case 's' => "suite_ann"
        case 't' => "suite_text"       case 'p' => "suite_pipeline"
        case _   => "suite_other"
      }
    val tpchPairs: Seq[(String, Double)] = timed.toSeq.collect {
      case (k, _, med, _) if k.startsWith("tpch_") && !k.endsWith("_unparse") &&
          !k.contains("_translit") => (k, med)
    }.sortBy(_._1)
    val familyPairs: Seq[(String, Double)] = timed.toSeq
      .filterNot(t => t._1.startsWith("tpch_") && !t._1.endsWith("_unparse") &&
        !t._1.contains("_translit"))
      .groupBy(t => family(t._1)).toSeq.sortBy(_._1)
      .map { case (fam, ts) => (fam, ts.map(_._3).sum) }
    val compactPairs = tpchPairs ++ familyPairs
    val qsCompact = compactPairs.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // sentinel-relative medians PROMOTED into the compact line (r15 verdict #2:
    // absolute seconds are not comparable across runs on a burst-throttled
    // host; the full map already lives in bench_full.json). Emitted as a
    // VALUES ARRAY aligned 1:1 with the `queries` map's key order — a keyed
    // map of all 34 entries (~730 chars) would blow the driver's 2000-char
    // tail budget, the array (~240 chars) fits with room for a noisy round.
    val relCompact =
      if (settledSentinel <= 0) "[]"
      else compactPairs.map(p =>
        "%.2f".formatLocal(java.util.Locale.ROOT, p._2 / settledSentinel))
        .mkString("[", ",", "]")
    val compact = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""planning_ms_per_query":$planningStr,"timing":"warm_median_of_$warmRuns",""" +
      s""""timed_action":"noop","sentinel_start_sec":${f3(sentinelReads.head._2)},""" +
      s""""sentinel_settled_sec":${f3(settledSentinel)},""" +
      s""""sentinel_relative_of_queries":$relCompact,""" +
      s""""contaminated_phases":$contaminatedJson,"driver_mem_pinned":$memPinned,""" +
      s""""load":${jstr(s"$loadStart -> $loadEnd")},""" +
      s""""tpch_isolated_total":$tpchIsoStr,"isolated_suites":$isolatedSuitesJson,""" +
      s""""warm_total_sec":${f3(total)},"cold_total_sec":${f3(coldTotal)},""" +
      s""""detail":"bench_full.json","errors":$errorNamesJson,"noisy":$noisyJson,""" +
      s""""streaming_harness":$harnessJson,""" +
      s""""sf":"$sfDir","queries":$qsCompact}"""
    // Also to a fixed path the driver (or a human) can read whole, immune to
    // stdout tail-capture and sbt's own trailer lines.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_summary.json"),
        compact.getBytes("UTF-8"))
    } catch { case _: Throwable => }
    // Print the summary LAST — after spark.stop()'s shutdown chatter — and flush,
    // so it is the final line this JVM writes to stdout.
    spark.stop()
    println(compact)
    System.out.flush()
  }
}
