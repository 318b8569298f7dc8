package graft.io

/** Per-JVM scratch root for queries that must materialize an on-disk
  * artifact INSIDE their timed region (private inverted-index segments,
  * packed-corpus shards, tokenizer artifacts) and then return a frame
  * that lazily READS it — eager deletion (the
  * [[graft.queries.HealthQueries]] withTempCsvDir discipline) would
  * yank files out from under the returned plan, so these live until JVM
  * exit instead: every dir is allocated under ONE root registered with a
  * shutdown hook, and the whole root is removed when the registry /
  * bench / verify JVM ends. Repeated invocations within one JVM still
  * accumulate (bounded by the run), but nothing survives the run — the
  * residue standard VERDICT r15 #3 set for the CSV fixtures, extended to
  * every per-run artifact.
  */
object Scratch {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the shutdown-cleaned root. */
  def dir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(root, prefix).toString

  /** A STABLE path under the shutdown-cleaned root: the same name maps to
    * the same path for the JVM's lifetime (unlike [[dir]], which mints a
    * fresh dir per call). For session-scoped build-once-read-many
    * artifacts — the shared ANN/text indexes — whose ensure-built marker
    * logic needs path stability across invocations. NOT created here:
    * builders own creation (a Spark write creates its own output dir);
    * concurrency across JVMs is free because each JVM has its own root
    * (stronger isolation than the applicationId-suffixed /tmp paths this
    * replaced, which leaked ~4 MB per session forever).
    */
  def stableDir(name: String): String = root.resolve(name).toString

  /** Best-effort recursive delete, shared by every cleanup path (the
    * shutdown hook, eager fixture cleanup, spec teardowns): closes the
    * walk stream and swallows NonFatal failures — a cleanup error must
    * never mask the exception that made the cleanup run (the OS tmp
    * reaper backs this up anyway). Fatal errors (OOM, VM faults)
    * propagate, and a swallowed InterruptedException re-sets the
    * thread's interrupt flag: the eager-cleanup path runs on every
    * fixture build, not just at JVM shutdown, so eating a pending
    * interrupt here would silently cancel a caller's cancellation.
    */
  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    try {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    } catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
      case scala.util.control.NonFatal(_) => ()
    }
  }
}
