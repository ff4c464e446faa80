package graft.engine

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Durable store backend: the same FSM semantics as [[InMemoryJobStore]],
  * persisted as an append-only JSON-lines transition log ([[JobLog]] codec),
  * replayed on open.
  *
  * This is the second Store backend (the reference ships two — JDBC and
  * Datomic — exercised by one shared protocol suite,
  * test/overseer/store_test.clj; ours is driven by the same
  * JobStoreBehaviors trait). Event-sourcing matches the Spark design note
  * in SURVEY.md §7: the log is the source of truth, the in-memory map is
  * the snapshot view, and the same log could be replayed into DataFrames
  * (`StoreViews`) or the streaming FSM (`FsmStream.transitions`) unchanged.
  * Single-writer by design — one process owns the log; for a multi-process
  * pool over the same log see [[SharedLogJobStore]].
  */
final class LogBackedJobStore(dir: String) extends JobStore {

  private val inner = new InMemoryJobStore
  private val logPath: Path = Paths.get(dir, "joblog.jsonl")
  private var writer: BufferedWriter = _
  private val lock = new Object

  private def append(line: String): Unit = lock.synchronized {
    writer.write(line); writer.newLine(); writer.flush()
  }

  // -- Store protocol ------------------------------------------------------

  override def install(): String = lock.synchronized {
    Files.createDirectories(Paths.get(dir))
    val existed = Files.exists(logPath)
    if (existed) {
      inner.install()
      val lines = Files.readAllLines(logPath).asScala.filter(_.nonEmpty).toSeq
      var torn = false
      lines.zipWithIndex.foreach { case (line, i) =>
        if (!torn) {
          try JobLog.replay(line, inner)
          catch {
            // a malformed FINAL line is a torn append from a crash — drop
            // it and truncate, so the reopened writer does not continue
            // writing onto the partial record. Malformed lines anywhere
            // else are real corruption and must fail loudly.
            case e: Exception if i == lines.size - 1 =>
              System.err.println(
                s"[logstore] dropping torn final log line (${e.getClass.getSimpleName})")
              torn = true
            case e: Exception =>
              throw new IllegalStateException(s"corrupt log line ${i + 1}: ${e.getMessage}", e)
          }
        }
      }
      if (torn) {
        val good = lines.dropRight(1)
        Files.write(logPath,
          (if (good.isEmpty) "" else good.mkString("", "\n", "\n"))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    } else {
      inner.install()
      Files.createFile(logPath)
    }
    writer = new BufferedWriter(new FileWriter(logPath.toFile, true))
    ":ok"
  }

  override def transactGraph(g: JobGraph): JobGraph = lock.synchronized {
    val before = inner.snapshotJobs.map(_.id).toSet
    val out = inner.transactGraph(g)
    val fresh = g.jobs.filterNot(j => before.contains(j.id))
    val freshIds = fresh.map(_.id).toSet
    append(JobLog.encodeTransact(fresh, g.deps.filter(d => freshIds.contains(d.jobId))))
    out
  }

  override def jobInfo(id: String): Option[Job] = inner.jobInfo(id)

  override def reserveJob(id: String): Option[Job] = lock.synchronized {
    val r = inner.reserveJob(id)
    if (r.isDefined) append(JobLog.encode("reserve", "id" -> id))
    r
  }

  override def finishJob(id: String): Unit = lock.synchronized {
    inner.finishJob(id); append(JobLog.encode("finish", "id" -> id))
  }

  override def failJob(id: String, failure: Option[String]): Unit = lock.synchronized {
    inner.failJob(id, failure)
    append(JobLog.encode("fail", Seq("id" -> id) ++ failure.map("failure" -> _): _*))
  }

  override def heartbeatJob(id: String): Unit = lock.synchronized {
    inner.heartbeatJob(id)
    inner.jobInfo(id).flatMap(_.heartbeat).foreach(h =>
      append(JobLog.encode("heartbeat", "id" -> id, "at" -> h.toString)))
  }

  override def abortJob(id: String): Unit = lock.synchronized {
    inner.abortJob(id); append(JobLog.encode("abort", "id" -> id))
  }

  override def resetJob(id: String): Option[Job] = lock.synchronized {
    val r = inner.resetJob(id)
    if (r.isDefined) append(JobLog.encode("reset", "id" -> id))
    r
  }

  override def jobsReady(limit: Int): Set[String] = inner.jobsReady(limit)
  override def jobsDead(threshold: Long, limit: Int): Set[String] = inner.jobsDead(threshold, limit)
  override def updateJob(id: String, pred: Job => Boolean, f: Job => Job): Option[Job] =
    inner.updateJob(id, pred, f) // non-durable escape hatch (used by tests)
  override def snapshotJobs: Seq[Job] = inner.snapshotJobs
  override def snapshotDeps: Seq[Dep] = inner.snapshotDeps

  def close(): Unit = lock.synchronized(if (writer != null) writer.close())
}
