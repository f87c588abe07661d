package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every declared query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line of per-query seconds.
  *
  * Queries are forced through the `noop` sink so the full plan executes
  * (a bare `count()` would let Catalyst prune projections and skip work a
  * real consumer would pay for).
  *
  * Robustness (the harness runs this under a hard wall-clock `timeout`,
  * and the host shows sporadic multi-minute freezes):
  *   - a per-query watchdog cancels any query running past
  *     `SPARK_GRAFT_QUERY_TIMEOUT` (default 150 s) via its job group, so
  *     one pathological query cannot eat the whole budget;
  *   - a JVM shutdown hook prints the partial results line if the
  *     process is killed (SIGTERM) before the normal print — a timed-out
  *     run still yields a parseable benchmark line;
  *   - statistical outliers (freeze-inflated timings) get inline re-runs
  *     and keep the better time; honest regressions reproduce. The JSON
  *     line carries the evidence: a `reruns` object with per-triggered-
  *     query {first, runs, sec, why} (reruns get a bounded grace budget
  *     PAST the soft deadline so defense never silently shuts off for
  *     the last-timed queries), and a `shuffle` object with per-query
  *     shuffle read/write bytes — the noise-immune plan signal;
  *   - every completed timing is appended to a history file
  *     (`.bench_history.jsonl`, override via SPARK_GRAFT_BENCH_HISTORY)
  *     the moment it finishes, so even a SIGKILL leaves the measurements
  *     on disk; the next run reads the history and times never-measured
  *     queries FIRST, then the rest cheapest-first — a deadline skip
  *     always lands on the queries we already have numbers for, and
  *     repeated freeze-afflicted runs converge on full coverage.
  */
object Bench {

  @volatile private var sfDirForLine = ""
  @volatile private var filteredRun = false
  private val done = new ConcurrentLinkedQueue[(String, Double)]()
  private val printed = new AtomicBoolean(false)

  /** Rerun evidence for the official record (round-10 verdict: two
    * entries stood at 3-5x their history-best and the record could not
    * say whether the defense ran, froze, or was deadline-skipped).
    * Keyed by query; present iff the outlier rule TRIGGERED for it.
    * `first` = first-pass seconds, `runs` = inline reruns executed,
    * `sec` = what the record kept, `why` ∈ defended (a rerun beat the
    * threshold), still-outlier (all reruns also above threshold — an
    * honest regression or a repeatedly-frozen host, but now with the
    * evidence inline), rerun-failed (a rerun crashed/was cancelled),
    * deadline (grace budget exhausted before any rerun could run).
    */
  private val rerunNotes =
    new TrieMap[String, (Double, Int, Double, String)]()

  /** Per-query task-metric telemetry (round-10/11 verdict asks): wall
    * time on a freeze-prone host is the weakest scale signal. Per query
    * the record carries the noise-immune plan/pressure signals:
    *   - `r`/`w`     shuffle read/write bytes (plan shape — a lost
    *                 broadcast or widened exchange is visible here);
    *   - `spill`     memory+disk spill bytes (execution-memory pressure
    *                 — the signal round 11 lacked when the
    *                 c2_containment_best warm-session outlier could not
    *                 be explained from the line alone);
    *   - `peak`      max per-task peakExecutionMemory (how close the
    *                 heaviest task ran to its execution-memory share);
    *   - `in`        input bytes read (a cached-intermediate recompute
    *                 re-reads its source — extra `in` + extra `tasks`
    *                 is the recompute fingerprint);
    *   - `tasks`     completed task count (same purpose).
    * Filled by [[GroupTelemetryListener]], attributed via the per-query
    * job group.
    */
  private final case class Tel(r: Long = 0, w: Long = 0, spill: Long = 0,
      peak: Long = 0, in: Long = 0, tasks: Long = 0,
      srows: Long = 0, sbytes: Long = 0)
  private val queryTel = new TrieMap[String, Tel]()

  /** Streaming STATE-SIZE telemetry (round-13 verdict ask #7): at 100 TB
    * unbounded state growth is the streaming failure mode, and wall time
    * cannot see it. Per bench query the record carries the MAX across
    * all micro-batches (and lifecycles — restart queries run two) of the
    * summed per-operator state rows and state memory bytes, read off the
    * StreamingQueryProgress events that fire while the query's builder
    * runs. Batch queries report 0/0. Under the RocksDB provider
    * memoryUsedBytes is the provider's own accounting; rows are
    * provider-independent.
    */
  private final class StateTelemetryListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    @volatile private var maxRows = 0L
    @volatile private var maxBytes = 0L
    def reset(): Unit = { maxRows = 0L; maxBytes = 0L }
    def snapshot: (Long, Long) = (maxRows, maxBytes)
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val ops = e.progress.stateOperators
      if (ops.nonEmpty) synchronized {
        maxRows = math.max(maxRows, ops.map(_.numRowsTotal).sum)
        maxBytes = math.max(maxBytes, ops.map(_.memoryUsedBytes).sum)
      }
    }
  }

  /** Accumulates task metrics per job group off task-end events (task
    * metrics there are reliably populated, unlike StageInfo.taskMetrics
    * which depends on event-log settings). Stage→group attribution
    * comes from job-start properties.
    */
  private final class GroupTelemetryListener extends SparkListener {
    private val stageGroup = new TrieMap[Int, String]()
    private val acc = new TrieMap[String, Tel]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val g = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .getOrElse("")
      js.stageIds.foreach(id => stageGroup.put(id, g))
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      for (g <- stageGroup.get(te.stageId); m <- Option(te.taskMetrics)) {
        val cur = acc.getOrElse(g, Tel())
        acc.put(g, Tel(
          r = cur.r + m.shuffleReadMetrics.totalBytesRead,
          w = cur.w + m.shuffleWriteMetrics.bytesWritten,
          spill = cur.spill + m.memoryBytesSpilled + m.diskBytesSpilled,
          peak = math.max(cur.peak, m.peakExecutionMemory),
          in = cur.in + m.inputMetrics.bytesRead,
          tasks = cur.tasks + 1))
      }
    // NOTE: the stage→group mapping is kept for the JVM's lifetime —
    // stage RETRIES do not re-announce their ids via a new JobStart, so
    // dropping the mapping on stage completion would lose the retry's
    // shuffle metrics. Stage ids are app-unique and the entries are two
    // words each; a full bench leaves a few thousand, which is noise.
    def reset(group: String): Unit = acc.remove(group)
    def tel(group: String): Tel = acc.getOrElse(group, Tel())
  }

  private def emitLine(): Unit = if (printed.compareAndSet(false, true)) {
    val results = {
      import scala.jdk.CollectionConverters._
      done.asScala.toSeq
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Self-defense evidence: every query whose outlier rule triggered
    // carries its first-pass time, rerun count, and outcome INLINE in
    // the official record — an entry standing >2x history-best is now
    // explainable from the line alone.
    val rr = rerunNotes.toSeq.sortBy(_._1).map { case (k, (first, runs, sec, why)) =>
      "\"" + k + f"""\":{"first":$first%.3f,"runs":$runs,"sec":$sec%.3f,"why":"$why"}"""
    }.mkString("{", ",", "}")
    // Noise-immune plan/pressure telemetry per query: shuffle bytes,
    // spill bytes, peak task execution memory, input bytes, task count.
    val sh = queryTel.toSeq.sortBy(_._1).map { case (k, t) =>
      "\"" + k + "\":{\"r\":" + t.r + ",\"w\":" + t.w +
        ",\"spill\":" + t.spill + ",\"peak\":" + t.peak +
        ",\"in\":" + t.in + ",\"tasks\":" + t.tasks +
        ",\"srows\":" + t.srows + ",\"sbytes\":" + t.sbytes + "}"
    }.mkString("{", ",", "}")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"reruns":$rr,"shuffle":$sh,"sf":"$sfDirForLine"}"""
    println(line)
    System.out.flush()
    // The stdout line is NOT guaranteed last under sbt (a trailing
    // "[success] ..." line follows it), so a mechanical consumer can't
    // just take the tail — mirror the line to a dedicated file
    // (SPARK_GRAFT_BENCH_OUT, default bench_line.json) that holds
    // exactly the one JSON line.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_line.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] bench-out write failed: ${e.getMessage}")
    }
    // Full-fidelity COMMITTED metrics artifact (round-12 verdict #3: the
    // driver's BENCH_r*.json capture truncates the stdout tail, so the
    // durable record kept {spill,peak,tasks} for only ~20/159 queries).
    // One JSON object, one line per query — {sec, r, w, spill, peak, in,
    // tasks} for EVERY completed query — written only by UNFILTERED runs
    // (a SPARK_GRAFT_ONLY dev subset must not overwrite the full record).
    if (!filteredRun) {
      val secs = results.toMap
      val rows = results.map(_._1).sorted.map { k =>
        val t = queryTel.getOrElse(k, Tel())
        "  \"" + k + f"""\": {"sec":${secs(k)}%.3f,"r":${t.r},"w":${t.w}""" +
          s""","spill":${t.spill},"peak":${t.peak},"in":${t.in},"tasks":${t.tasks}""" +
          s""","srows":${t.srows},"sbytes":${t.sbytes}}"""
      }
      val metricsPath =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_METRICS", "BENCH_METRICS.json")
      val doc =
        f"""{"sf":"$sfDirForLine","total_sec":$total%.3f,"n_queries":${results.size},"queries":{""" +
          "\n" + rows.mkString(",\n") + "\n}}\n"
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(metricsPath), doc)
      catch { case e: Exception =>
        System.err.println(s"[bench] metrics write failed: ${e.getMessage}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val queryTimeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "150").toLong
    sfDirForLine = sfDir
    Runtime.getRuntime.addShutdownHook(new Thread(() => emitLine()))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // static conf, set at session build: b8_bucketed_join persists
      // bucketed tables into the session catalog
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (classloading, codegen compiler, shuffle machinery)
    // so the first timed query doesn't absorb JVM startup.
    spark.range(100000).selectExpr("sum(id)", "count(distinct id % 7)").collect()
    // Warm the streaming stack too (microbatch planner, state store,
    // memory sink): the c5_stream_* queries would otherwise be charged
    // this one-time classloading in their first timing.
    val warmDir = java.nio.file.Files.createTempDirectory("bench-stream-warm")
    try {
      spark.range(2).toDF("v").write.mode("overwrite").parquet(warmDir.toString)
      val q = spark.readStream.schema("v LONG").parquet(warmDir.toString)
        .groupBy("v").count()
        .writeStream.format("memory").queryName("bench_stream_warm")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      // A wedged warmup must not leave a live streaming query (and its
      // microbatch thread) running under the timed passes.
      if (!q.awaitTermination(60000L)) q.stop()
    } catch { case e: Exception =>
      System.err.println(s"[bench] stream warmup failed: ${e.getMessage}")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(warmDir.toFile)
    }

    val watchdog = new java.util.Timer("bench-watchdog", true)

    val shuffleListener = new GroupTelemetryListener
    spark.sparkContext.addSparkListener(shuffleListener)
    val stateListener = new StateTelemetryListener
    spark.streams.addListener(stateListener)

    // Optional dev filter: SPARK_GRAFT_ONLY=<regex> times a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    filteredRun = only.isDefined
    val selectedNames = SparkEntry.queries.keySet
      .filter(n => only.forall(_.findFirstIn(n).isDefined))

    // Build one-time layouts (bucketed tables, partitioned copies, the
    // ANN index) BEFORE any timing: a fresh bench JVM would otherwise
    // charge the first b8/ann timing with a layout WRITE, conflating a
    // one-time ingest decision with the steady-state query cost the 2x
    // perf gate should see. Warmup time is reported on stderr, never in
    // the JSON line. Only warmups some SELECTED query reads run (a
    // filtered dev run must not pay an ANN index build it never uses),
    // and each runs under the same per-query watchdog as a timed query —
    // a host freeze parking on an unbounded warmup would otherwise hang
    // the bench before the first timing exists.
    SparkEntry.warmups
      .filter(w => selectedNames.exists(w.appliesTo))
      .foreach { w =>
        val group = s"bench-warmup-${w.name}"
        spark.sparkContext.setJobGroup(group, w.name, interruptOnCancel = true)
        val cancel = new java.util.TimerTask {
          def run(): Unit = {
            System.err.println(
              s"[bench] warmup ${w.name} exceeded ${queryTimeoutSec}s — cancelling")
            spark.sparkContext.cancelJobGroup(group)
          }
        }
        watchdog.schedule(cancel, queryTimeoutSec * 1000L)
        val t0 = System.nanoTime()
        try {
          w.run(spark, sfDir)
          System.err.println(
            f"[bench] warmup ${w.name}%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s (untimed)")
        } catch { case e: Exception =>
          // A failed/cancelled warmup is not fatal: the owning query
          // builds its own layout inline (idempotent), just inside its
          // timing.
          System.err.println(s"[bench] warmup ${w.name} failed: ${e.getMessage}")
        } finally {
          cancel.cancel()
          spark.sparkContext.clearJobGroup()
        }
      }

    // Some(seconds) iff the query ran to completion. A query that did
    // NOT complete (watchdog-cancelled mid-run, or crashed) returns None
    // and is recorded NOWHERE — not in the JSON line, not in history:
    // elapsed-time-at-cancellation is not a timing, and recording it
    // once let 150 s ceiling artifacts stand in the official record as
    // if the queries *took* 150 s.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      // Operators persist() reused intermediates; drop them between timed
      // runs so every measurement starts cold and reruns can't cheat.
      spark.catalog.clearCache()
      val group = s"bench-$name"
      // Zero this query's telemetry counters: reruns reuse the group, and
      // the recorded bytes must describe ONE run of the plan. Drain the
      // async listener bus FIRST — straggler task-end events from a
      // watchdog-cancelled previous run of the same group would
      // otherwise land after the reset and contaminate this run's bytes.
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      shuffleListener.reset(group)
      stateListener.reset()
      spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
      val cancelled = new AtomicBoolean(false)
      val cancel = new java.util.TimerTask {
        def run(): Unit = {
          System.err.println(s"[bench] $name exceeded ${queryTimeoutSec}s — cancelling")
          cancelled.set(true)
          spark.sparkContext.cancelJobGroup(group)
        }
      }
      watchdog.schedule(cancel, queryTimeoutSec * 1000L)
      val t0 = System.nanoTime()
      val completed =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          if (!cancelled.get)
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        } finally {
          cancel.cancel()
          spark.sparkContext.clearJobGroup()
        }
      // completed is checked FIRST: if save() finished, the timing is an
      // honest measurement of a completed run even when the watchdog
      // fired concurrently (the rare race where cancelJobGroup lands
      // just after the last job finishes) — discard only cancelled runs
      // that did NOT complete.
      if (completed) {
        // Elapsed is captured BEFORE the listener-bus drain: the drain
        // waits for queued events and must not inflate the timing the
        // record exists to defend.
        val sec = (System.nanoTime() - t0) / 1e9
        // Bytes are a property of the plan, not the run — any completed
        // run's numbers are authoritative, so last-completed-wins. Drain
        // the (async) listener bus first so trailing task-end events land.
        org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
        val (srows, sbytes) = stateListener.snapshot
        queryTel.put(name,
          shuffleListener.tel(group).copy(srows = srows, sbytes = sbytes))
        Some(sec)
      } else {
        System.err.println(s"[bench] $name NOT recorded (" +
          (if (cancelled.get) "watchdog-cancelled" else "failed") + ")")
        None
      }
    }

    // Global soft deadline: once elapsed wall time passes it, remaining
    // queries are skipped (recorded at 0 s would lie — they are simply
    // absent) so a freeze-riddled run still finishes inside the harness's
    // hard timeout and prints a parseable line.
    val deadlineSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "1500").toLong
    // Outlier-defense grace: reruns alone may run past the soft deadline
    // up to this much extra wall clock. Round 10's record kept two 3-5x
    // freeze artifacts precisely because defense silently shut off with
    // the deadline — the queries timed LAST are the ones whose reruns
    // need the budget. The harness's hard timeout still bounds the run.
    val rerunGraceSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_GRACE", "240").toLong
    val benchStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9
    def pastDeadline: Boolean = elapsedSec > deadlineSec
    def pastRerunBudget: Boolean = elapsedSec > deadlineSec + rerunGraceSec

    // Cross-run timing history: best (minimum) observed seconds per query.
    // Best-of-history is the right aggregate here — the noise source is
    // one-sided (external host freezes only ever inflate a timing).
    val historyPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", ".bench_history.jsonl"))
    val historyLine = """\{"q":"([^"]+)","sec":([0-9.]+)\}""".r
    val history: Map[String, Double] =
      if (!java.nio.file.Files.exists(historyPath)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(historyPath).asScala.toSeq
          .collect { case historyLine(q, s) => (q, s.toDouble) }
          .groupMapReduce(_._1)(_._2)(math.min)
      }
    def recordHistory(name: String, sec: Double): Unit =
      try java.nio.file.Files.writeString(
        historyPath,
        f"""{"q":"$name","sec":$sec%.3f}""" + "\n",
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Exception =>
        System.err.println(s"[bench] history append failed: ${e.getMessage}")
      }

    // Order: never-measured queries first (coverage accrues across runs
    // even when every run hits a bad window), then cheapest-first (a
    // deadline skip drops only the most-expensive, already-known tail).
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => selectedNames(n) }
      .sortBy { case (n, _) => history.get(n).map(t => (1, t, n)).getOrElse((0, 0.0, n)) }
    // The host shows sporadic multi-minute freezes that park on whatever
    // query is running (observed repeatedly: a 2-4 s query charged 60-400 s
    // while system load stays idle). Min-of-runs on statistical outliers
    // removes that noise; honest regressions reproduce on every re-run and
    // keep their time. Outlier rule: > max(2× the query's own cross-run
    // history best, 1 s) — the run median is itself freeze-inflatable (an
    // inflated median once let 17-30 s artifacts stand), and the 1 s floor
    // keeps sub-second jitter from triggering reruns while still defending
    // 1-3 s queries (the round-9 record kept a 9.27 s b8 artifact because
    // the old 3×-with-4 s-floor rule gave up after ONE rerun that was
    // itself freeze-inflated). Up to TWO reruns, INLINE, the moment the
    // outlier is detected — a deferred rerun pass was starved whenever a
    // freeze-riddled first pass ate the whole deadline, which is exactly
    // the run that needs reruns most (round-5 official bench).
    val firstPass = selected.flatMap { case (name, fn) =>
      if (pastDeadline) {
        System.err.println(s"[bench] $name skipped (past ${deadlineSec}s deadline)")
        None
      } else {
        run(name, fn).map { first =>
          System.err.println(f"[bench] $name%-22s $first%8.2f s")
          recordHistory(name, first)
          var sec = first
          val threshold = history.get(name).map(b => math.max(2 * b, 1.0))
          // Inline reruns: allowed up to rerunGraceSec PAST the soft
          // deadline (defense for the last-timed queries must not
          // silently shut off with it), and every trigger leaves its
          // evidence in rerunNotes for the official record.
          var reruns = 0
          var why = ""
          while (threshold.exists(sec > _) && reruns < 2 && why.isEmpty) {
            if (pastRerunBudget) why = "deadline"
            else {
              reruns += 1
              run(name, fn) match {
                case Some(again) =>
                  System.err.println(
                    f"[bench] $name%-22s $again%8.2f s (inline outlier rerun $reruns; first $first%.2f)")
                  recordHistory(name, again)
                  sec = math.min(sec, again)
                case None => why = "rerun-failed"
              }
            }
          }
          if (threshold.exists(first > _)) {
            if (why.isEmpty)
              why = if (threshold.exists(sec > _)) "still-outlier" else "defended"
            rerunNotes.put(name, (first, reruns, sec, why))
          }
          done.add(name -> sec)
          (name, fn, sec)
        }
      }
    }
    // Residual pass for queries with no history yet: their outlier
    // threshold is median×4 of this run, which only exists after the full
    // pass. Known queries were already corrected inline above.
    if (firstPass.nonEmpty) {
      val med = firstPass.map(_._3).sorted.apply(firstPass.length / 2)
      firstPass.foreach { case (name, fn, sec) =>
        if (!history.contains(name) && sec > math.max(4.0, 4 * med)) {
          if (pastRerunBudget)
            rerunNotes.put(name, (sec, 0, sec, "deadline"))
          else run(name, fn) match {
            case Some(again) =>
              System.err.println(f"[bench] $name%-22s $again%8.2f s (outlier rerun; first $sec%.2f)")
              done.removeIf(_._1 == name)
              done.add(name -> math.min(sec, again))
              recordHistory(name, again)
              rerunNotes.put(name, (sec, 1, math.min(sec, again),
                if (again < sec) "defended" else "still-outlier"))
            case None =>
              rerunNotes.put(name, (sec, 1, sec, "rerun-failed"))
          }
        }
      }
    }
    emitLine()
    spark.stop()
  }
}
