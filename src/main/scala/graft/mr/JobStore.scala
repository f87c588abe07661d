package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Job lifecycle registry — the library-API analog of the reference's
  * master job table + HTTP gateway surface:
  *  - launch validation: mapper/reducer > 0, non-empty input
  *    (`/root/reference/src/tmapreduce/master.cc:530-535`);
  *  - result fetch by (job_id, token) with exact-match auth
  *    (`master.cc:685-699`, `job.h:93`);
  *  - finished results expire after a TTL
  *    (`JOB_RESULT_TIMEOUT_SECOND=3600`, `master.h:27`; scanner
  *    `master.cc:449-463`).
  *
  * The Raft/etcd/brpc machinery around this table is deliberately dropped
  * (SURVEY.md §7.6): Spark's driver is the single coordinator.
  *
  * Clock is injectable so TTL behavior is unit-testable (SURVEY.md §7.7-6).
  */
final class JobStore(
    clock: () => Long = () => System.currentTimeMillis(),
    ttlMillis: Long = JobStore.DefaultTtlMillis) {

  import JobStore._

  private val nextId = new AtomicLong(0L)
  private val jobs = new ConcurrentHashMap[Long, JobState]()
  // Executor threads by job id, for cancel(): the job-group kill only
  // reaches stages already submitted, so cancel() also interrupts the
  // executor thread — covering the window before the thread has set its
  // job group (or submitted its first Spark job).
  private val threads = new ConcurrentHashMap[Long, Thread]()

  /** Validate + run a job of a registered type; returns the job id once
    * the job has completed (synchronous form).
    * Mirrors handle_launch (`master.cc:527-559`): validation errors are
    * surfaced to the caller, nothing is registered for an invalid launch.
    */
  def launch(
      spark: SparkSession,
      spec: JobSpec,
      input: Dataset[(String, String)]): Either[String, Long] =
    validate(spark, spec, input).map { fns =>
      val id = register(spec)
      execute(spark, id, spec, input, fns)
      id
    }

  /** Async form — the reference's actual surface: `/launch` returns a job
    * id immediately and clients poll `/getresult`
    * (`gateway.cc:66-184`, example client polls every 2 s,
    * `word_count_client.cc:54-57`). The Spark action runs on a daemon
    * thread; status transitions Running → Finished/Failed.
    */
  def launchAsync(
      spark: SparkSession,
      spec: JobSpec,
      input: Dataset[(String, String)]): Either[String, Long] =
    validate(spark, spec, input).map { fns =>
      val id = register(spec)
      val t = new Thread(() => execute(spark, id, spec, input, fns),
        s"graft-job-$id")
      t.setDaemon(true)
      threads.put(id, t)
      t.start()
      id
    }

  private def validate(
      spark: SparkSession,
      spec: JobSpec,
      input: Dataset[(String, String)]): Either[String, JobTypeRegistry.MapReduceFn] =
    if (spec.mappers <= 0 || spec.reducers <= 0)
      Left("mapper_num and reducer_num must be > 0") // master.cc:530-532
    else JobTypeRegistry.lookup(spec.jobType) match {
      case None => Left(s"unknown job type: ${spec.jobType}") // no capable worker
      case Some(fns) =>
        if (input.isEmpty) Left("input kvs must be non-empty") // master.cc:533-535
        else Right(fns)
    }

  private def register(spec: JobSpec): Long = {
    val id = nextId.getAndIncrement()
    jobs.put(id, JobState(spec, Running, None, None))
    id
  }

  private def execute(
      spark: SparkSession,
      id: Long,
      spec: JobSpec,
      input: Dataset[(String, String)],
      fns: JobTypeRegistry.MapReduceFn): Unit =
    try {
      // Tag every Spark job this MR job spawns with a per-id group so
      // cancel() can kill the in-flight stages (the analog of the
      // reference unassigning a subjob from its worker, master.cc:571-583
      // — except Spark's cancellation is terminal, not a requeue).
      spark.sparkContext.setJobGroup(jobGroup(id),
        s"graft job $id: ${spec.name}", interruptOnCancel = true)
      // A cancel that landed before this thread got here transitioned the
      // state already — do not run work for a terminal job. (A cancel
      // landing AFTER this check is covered by the group kill for
      // submitted stages and the thread interrupt for the gap between.)
      if (Option(jobs.get(id)).exists(_.status != Running)) return
      val out = MRJob
        .run(spark, input, fns.mapFn, fns.reduceFn, spec.mappers,
          spec.reducers, fns.combineFn)
        .collect()
      finishIfRunning(id, _.copy(status = Finished, result = Some(out),
        finishedAt = Some(clock())))
    } catch {
      case e: Exception =>
        // A cancelled job's collect() dies with a SparkException (or the
        // interrupt) here; finishIfRunning leaves the Cancelled state in
        // place — only a still-Running job transitions to Failed.
        finishIfRunning(id, _.copy(status = Failed(e.getMessage),
          finishedAt = Some(clock())))
    } finally {
      // Close the cancel gap: cancel()'s group kill only reaches Spark
      // jobs already submitted when it fires, so a job this thread
      // submitted AFTER the kill (but before observing the interrupt)
      // escapes it and would run to completion holding executor slots.
      // Re-issue the group cancel while the group tag is still set — the
      // status check is race-free because Cancelled is terminal.
      if (Option(jobs.get(id)).exists(_.status == Cancelled))
        spark.sparkContext.cancelJobGroup(jobGroup(id))
      spark.sparkContext.clearJobGroup()
      threads.remove(id)
      Thread.interrupted() // clear a late interrupt; the thread is done
    }

  /** Terminal-state transition guard: Running is the only non-terminal
    * status, so Finished/Failed/Cancelled can never clobber each other
    * regardless of how the executor thread and cancel() interleave.
    */
  private def finishIfRunning(id: Long, f: JobState => JobState): Unit =
    jobs.computeIfPresent(id, (_, st) => if (st.status == Running) f(st) else st)

  /** Cancel a running job: token-authenticated like getResult, kills the
    * in-flight Spark stages via the job group, and lands the job in the
    * terminal Cancelled state (TTL-evicted like any finished job). A job
    * already in a terminal state is not cancellable — mirrors the
    * reference's guard that only an unfinished subjob can be cancelled
    * (`master.cc:571-583`).
    */
  def cancel(spark: SparkSession, id: Long, token: String): Either[String, Unit] = {
    evictExpired() // same sweep as getResult: a TTL-expired job is GONE
    Option(jobs.get(id)) match {
      case None => Left(s"no such job: $id")
      case Some(st) if st.spec.token != token => Left("wrong token")
      case _ =>
        var transitioned = false
        jobs.computeIfPresent(id, (_, st) =>
          if (st.status == Running) {
            transitioned = true
            st.copy(status = Cancelled, result = None, finishedAt = Some(clock()))
          } else st)
        if (transitioned) {
          // Kill already-submitted stages via the group, and interrupt
          // the executor thread for the pre-submission window (a group
          // cancel only reaches jobs that exist when it fires).
          spark.sparkContext.cancelJobGroup(jobGroup(id))
          Option(threads.get(id)).foreach(_.interrupt())
          Right(())
        } else Left("job not running")
    }
  }

  /** Token-authenticated result fetch; mirrors handle_get_result guards
    * in order: exists → token → finished (`master.cc:685-699`).
    */
  def getResult(id: Long, token: String): Either[String, Seq[String]] = {
    evictExpired()
    Option(jobs.get(id)) match {
      case None => Left(s"no such job: $id")
      case Some(st) if st.spec.token != token => Left("wrong token")
      case Some(JobState(_, Finished, Some(res), _)) => Right(res.toSeq)
      case Some(JobState(_, Failed(msg), _, _)) => Left(s"job failed: $msg")
      // Cancelled and Running both answer with the reference's
      // not-finished error shape (master.cc:694-696): a cancelled job
      // simply never finishes.
      case Some(_) => Left("job not finished")
    }
  }

  def status(id: Long): Option[JobStatus] = Option(jobs.get(id)).map(_.status)

  /** Drop finished/failed jobs older than the TTL; returns eviction count
    * (the BGScaner sweep, `master.cc:449-463` + `master.cc:701-710`).
    */
  def evictExpired(): Int = {
    val now = clock()
    var n = 0
    jobs.forEach { (id, st) =>
      if (st.finishedAt.exists(t => now - t >= ttlMillis)) {
        jobs.remove(id); n += 1
      }
    }
    n
  }
}

object JobStore {
  val DefaultTtlMillis: Long = 3600L * 1000L // JOB_RESULT_TIMEOUT_SECOND, master.h:27

  /** Spark job-group tag for one MR job's stages. */
  def jobGroup(id: Long): String = s"graft-job-$id"

  final case class JobSpec(
      name: String,
      jobType: String,
      token: String,
      mappers: Int = 2,
      reducers: Int = 2)

  sealed trait JobStatus
  case object Running extends JobStatus
  case object Finished extends JobStatus
  case object Cancelled extends JobStatus
  final case class Failed(message: String) extends JobStatus

  private final case class JobState(
      spec: JobSpec,
      status: JobStatus,
      result: Option[Array[String]],
      finishedAt: Option[Long])
}
