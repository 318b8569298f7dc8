package graft.api

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** The reference's multi-stage progress surface
  * (geospatial_merger/processors/progress_tracker.py:12-136) re-expressed
  * for the engine: same process lifecycle (create → staged updates →
  * completed), same stage vocabulary (upload / validation / processing /
  * merging / completed), same completion rules (error ⇒ completed;
  * progress ≥ 100 at stage ≥ 4 ⇒ completed), same unknown-process
  * semantics — but percent comes from the ENGINE, not hand-placed
  * checkpoints: [[trackStage]] attaches a `SparkListener` for the span of
  * an action and converts real task completions into monotone percent
  * updates. State lives in a driver-side concurrent map (the Mongo
  * transport is out of scope by design, SURVEY.md §6); the
  * `processing_time_seconds` the reference returns everywhere is stamped
  * on [[complete]].
  */
object ProgressTracker {

  /** progress_tracker.py:67-73 stage vocabulary. */
  val stageNames: Map[Int, String] = Map(
    0 -> "upload", 1 -> "validation", 2 -> "processing", 3 -> "merging", 4 -> "completed")

  final case class Status(
      processId: String,
      stage: String,
      progress: Int,
      total: Int,
      message: String,
      createdAt: String,
      updatedAt: String,
      previewData: Seq[String],
      error: Option[String],
      completed: Boolean,
      processingTimeSeconds: Option[Double],
      // monotonic clock for processing_time_seconds (wall-clock strings
      // are for display; elapsed time must not jump with NTP)
      private[api] val createdNanos: Long)

  private val statuses = TrieMap.empty[String, Status]
  // per-process (stage, message, progress) event log — what the
  // reference's Mongo collection accumulates as update_one calls; bounded
  // so a chatty listener can't grow the driver unboundedly
  private val histories = TrieMap.empty[String, scala.collection.mutable.ArrayBuffer[(String, String, Int)]]
  private val MaxHistory = 10000

  /** Emission-ordered (stage, message, progress) events for a process. */
  def history(processId: String): Seq[(String, String, Int)] =
    histories.get(processId).map(h => h.synchronized(h.toSeq)).getOrElse(Nil)

  private def record(processId: String, stage: String, message: String, progress: Int): Unit = {
    val h = histories.getOrElseUpdate(processId,
      scala.collection.mutable.ArrayBuffer.empty[(String, String, Int)])
    h.synchronized { if (h.size < MaxHistory) h += ((stage, message, progress)); () }
  }

  private def nowIso: String = java.time.LocalDateTime.now().toString

  /** create_process(): fresh id with the reference's initial status. */
  def createProcess(): String = {
    val id = java.util.UUID.randomUUID().toString
    statuses(id) = Status(id, "upload", 0, 100, "Initializing...",
      nowIso, nowIso, Nil, None, completed = false, None, System.nanoTime())
    id
  }

  /** update(): stage index → name ("unknown" off-range, like the
    * reference), error or terminal progress flips `completed`.
    */
  def update(processId: String, stage: Int, progress: Int, message: String,
      previewData: Seq[String] = Nil, error: Option[String] = None): Unit = {
    record(processId, stageNames.getOrElse(stage, "unknown"), message, progress)
    statuses.updateWith(processId)(_.map { s =>
      s.copy(
        stage = stageNames.getOrElse(stage, "unknown"),
        progress = progress,
        message = message,
        updatedAt = nowIso,
        previewData = if (previewData.nonEmpty) previewData else s.previewData,
        error = error.orElse(s.error),
        completed = s.completed || error.isDefined || (progress >= 100 && stage >= 4))
    })
    ()
  }

  /** Terminal update: stage `completed`, 100%, processing_time_seconds
    * stamped from process creation (the field every reference response
    * carries).
    */
  def complete(processId: String, message: String = "Completed"): Unit = {
    record(processId, stageNames(4), message, 100)
    statuses.updateWith(processId)(_.map { s =>
      s.copy(stage = stageNames(4), progress = 100, message = message,
        updatedAt = nowIso, completed = true,
        processingTimeSeconds = Some((System.nanoTime() - s.createdNanos) / 1e9))
    })
    ()
  }

  /** get_status(): mirrors the reference's not-found payload. */
  def getStatus(processId: String): Status =
    statuses.getOrElse(processId,
      Status(processId, "unknown", 0, 100, "Process not found",
        nowIso, nowIso, Nil, Some("Invalid process ID"), completed = false,
        None, System.nanoTime()))

  /** cleanup_old_processes(hours): drop stale records. */
  def cleanupOldProcesses(hours: Int = 24): Int = {
    val cutoff = System.nanoTime() - hours.toLong * 3600L * 1000000000L
    val old = statuses.collect { case (id, s) if s.createdNanos < cutoff => id }
    old.foreach { id => statuses.remove(id); histories.remove(id) }
    old.size
  }

  /** Run `body` with a listener converting the Spark jobs it triggers into
    * percent updates for `stage`. Percent = completed/known tasks, clamped
    * monotone (new stages grow the denominator mid-run — raw ratios would
    * tick backwards). The listener is scoped to the call: attached before,
    * detached after, final 100% emitted on success.
    *
    * Two sharp edges the scoping handles:
    * - the span runs under a unique JOB GROUP, and only stages of jobs in
    *   that group are counted — a shared SparkContext (concurrent pipeline
    *   runs, parallel test suites) would otherwise feed foreign task
    *   events into this span's percent;
    * - listener events arrive ASYNC on the bus thread, so a straggler
    *   task-end can land after `body` returns; every emission goes through
    *   one lock-serialized monotone gate, and the terminal update sets
    *   lastPct=100 inside it, so a late event can never regress a
    *   completed span (the bug: 100% then 87%).
    *
    * Denominator discipline: a job's stages are REGISTERED at job start
    * (group-scoped) but only counted into the total when actually
    * submitted — shuffle-reused stages are skipped by the scheduler and
    * would otherwise inflate the denominator so 100% is never reached.
    *
    * This is the honest version of the reference's hand-placed checkpoint
    * percents (batch loops updating every N rows): the engine already
    * knows its task graph, so progress reflects actual execution.
    */
  def trackStage[T](spark: SparkSession, processId: String, stage: Int,
      message: String)(body: => T): T = {
    val lock = new Object
    var totalTasks = 0L
    var doneTasks = 0L
    var lastPct = 0
    val group = s"graft-progress-$processId-${java.util.UUID.randomUUID()}"
    val pending = scala.collection.mutable.Map.empty[Int, Int] // stageId -> numTasks
    val active = scala.collection.mutable.Set.empty[Int]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == group) lock.synchronized {
          j.stageInfos.foreach(si => pending.getOrElseUpdate(si.stageId, si.numTasks))
          ()
        }
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        lock.synchronized {
          pending.remove(s.stageInfo.stageId).foreach { _ =>
            active += s.stageInfo.stageId
            totalTasks += s.stageInfo.numTasks
          }
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = lock.synchronized {
        if (active.contains(t.stageId)) {
          doneTasks += 1
          val pct = math.min(99, (doneTasks * 100 / math.max(totalTasks, 1L)).toInt)
          if (pct > lastPct) {
            lastPct = pct
            update(processId, stage, pct, message)
          }
        }
      }
    }
    update(processId, stage, 0, message)
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(group, s"graft progress stage $stage", interruptOnCancel = false)
    try {
      val out = body
      lock.synchronized {
        lastPct = 100
        update(processId, stage, 100, message)
      }
      out
    } catch {
      case e: Throwable =>
        lock.synchronized {
          val reached = lastPct
          lastPct = 100 // terminal for this span: no straggler may re-emit
          update(processId, stage, reached, message, error = Some(e.getMessage))
        }
        throw e
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
