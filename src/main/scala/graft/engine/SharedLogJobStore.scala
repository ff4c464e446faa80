package graft.engine

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** Multi-PROCESS store backend over one shared append-only transition log —
  * the embedded-filesystem analogue of the reference's production story
  * (doc/guide/Concepts.md "Worker": a masterless pool of worker processes
  * whose ONLY coordination point is a shared store with optimistic
  * transitions; its adapter is a SQL server, ours is a file when no server
  * is available).
  *
  * Protocol: every operation takes an exclusive OS file lock
  * ([[java.nio.channels.FileChannel#lock()]] — advisory, cross-process),
  * catches up by replaying log lines appended by other processes since its
  * last position, applies the transition to its in-memory snapshot (where
  * the FSM's CAS predicates run against now-current state), appends the
  * transition line, flushes, and releases. Exactly-once therefore holds
  * ACROSS OS PROCESSES: two workers racing to reserve the same job
  * serialize on the file lock, the loser replays the winner's `reserve`
  * line before its own predicate runs, and its CAS fails with None —
  * the same resolution the JDBC backend gets from
  * `UPDATE ... WHERE lock_version = ?` (store/jdbc.clj:62-87), moved to
  * the filesystem. [[MultiProcessPoolSpec]] proves it with two forked JVMs.
  *
  * Scale note: lock-per-transition serializes the pool on one file, which
  * is the right trade for its role — an embedded, zero-dependency way to
  * run a small multi-process pool (the store traffic of a pipeline DAG is
  * tiny; the heavy lifting happens inside handlers as Spark jobs). A big
  * pool should use [[JdbcJobStore]] against a database server.
  */
final class SharedLogJobStore(dir: String) extends JobStore with AutoCloseable {

  private val inner = new InMemoryJobStore
  private val logPath  = Paths.get(dir, "joblog.jsonl")
  private val lockPath = Paths.get(dir, "joblog.lck")
  private var pos = 0L // bytes of complete lines already replayed into `inner`
  // FileChannel locks are held per-JVM: a second in-process instance locking
  // the same file would hit OverlappingFileLockException, so instances in
  // one JVM additionally serialize on a per-path monitor.
  private val monitor = SharedLogJobStore.monitorFor(lockPath.toAbsolutePath.toString)

  override def install(): String = {
    Files.createDirectories(Paths.get(dir))
    inner.install()
    monitor.synchronized {
      if (!Files.exists(logPath)) {
        try Files.createFile(logPath)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
    }
    withFileLock(catchUp())
    ":ok"
  }

  private def withFileLock[A](body: => A): A = monitor.synchronized {
    val raf = new RandomAccessFile(lockPath.toFile, "rw")
    try {
      val fl = raf.getChannel.lock()
      try body finally fl.release()
    } finally raf.close()
  }

  /** Replay every COMPLETE line appended since our last position. A trailing
    * fragment without a newline is a torn write from a crashed process —
    * left un-replayed until a later appender terminates it; if that yields
    * a malformed line it is skipped with a warning (appends happen under
    * the exclusive lock, so torn writes are the only malformed source). */
  private def catchUp(): Unit = {
    val raf = new RandomAccessFile(logPath.toFile, "r")
    try {
      val len = raf.length()
      if (len > pos) {
        raf.seek(pos)
        val buf = new Array[Byte]((len - pos).toInt)
        raf.readFully(buf)
        val lastNl = buf.lastIndexOf('\n'.toByte)
        if (lastNl >= 0) {
          new String(buf, 0, lastNl + 1, UTF_8).split("\n").filter(_.nonEmpty).foreach { line =>
            try JobLog.replay(line, inner)
            catch {
              case e: Exception =>
                System.err.println(
                  s"[sharedlog] skipping torn log line (${e.getClass.getSimpleName})")
            }
          }
          pos += lastNl + 1
        }
      }
    } finally raf.close()
  }

  /** Append one transition line and advance our own position past it (we
    * just applied it locally; replaying it back would double-apply). Must
    * hold the file lock. If the file does not end in a newline (a crashed
    * process's torn write), terminate the fragment first so this line
    * stays parseable. */
  private def append(line: String): Unit = {
    val raf = new RandomAccessFile(logPath.toFile, "rw")
    try {
      val len = raf.length()
      if (len > pos) { // catchUp left bytes behind ⇒ a torn, newline-less
        raf.seek(len - 1) // fragment; terminate it so our line stays parseable
        if (raf.readByte() != '\n'.toByte) raf.write('\n'.toInt)
      }
      raf.seek(raf.length())
      raf.write((line + "\n").getBytes(UTF_8))
      raf.getFD.sync()
      // everything now on disk is either replayed (complete lines before
      // `pos`), healed garbage (the fragment, never a complete line), or the
      // line we just applied locally — skip it all
      pos = raf.length()
    } finally raf.close()
  }

  private def mutate[A](op: => (A, Option[String])): A = withFileLock {
    catchUp()
    val (result, line) = op
    line.foreach(append)
    result
  }

  private def fresh[A](read: => A): A = { withFileLock(catchUp()); read }

  // -- Store protocol ------------------------------------------------------

  override def transactGraph(g: JobGraph): JobGraph = mutate {
    val before = inner.snapshotJobs.map(_.id).toSet
    val out = inner.transactGraph(g)
    val freshJobs = g.jobs.filterNot(j => before.contains(j.id))
    val freshIds = freshJobs.map(_.id).toSet
    if (freshJobs.isEmpty) (out, None)
    else (out, Some(JobLog.encodeTransact(freshJobs,
      g.deps.filter(d => freshIds.contains(d.jobId)))))
  }

  override def jobInfo(id: String): Option[Job] = fresh(inner.jobInfo(id))

  override def reserveJob(id: String): Option[Job] = mutate {
    val r = inner.reserveJob(id)
    (r, r.map(_ => JobLog.encode("reserve", "id" -> id)))
  }

  override def finishJob(id: String): Unit = mutate {
    inner.finishJob(id); ((), Some(JobLog.encode("finish", "id" -> id)))
  }

  override def failJob(id: String, failure: Option[String]): Unit = mutate {
    inner.failJob(id, failure)
    ((), Some(JobLog.encode("fail", Seq("id" -> id) ++ failure.map("failure" -> _): _*)))
  }

  override def heartbeatJob(id: String): Unit = mutate {
    inner.heartbeatJob(id)
    ((), inner.jobInfo(id).flatMap(_.heartbeat).map(h =>
      JobLog.encode("heartbeat", "id" -> id, "at" -> h.toString)))
  }

  override def abortJob(id: String): Unit = mutate {
    inner.abortJob(id); ((), Some(JobLog.encode("abort", "id" -> id)))
  }

  override def resetJob(id: String): Option[Job] = mutate {
    val r = inner.resetJob(id)
    (r, r.map(_ => JobLog.encode("reset", "id" -> id)))
  }

  override def jobsReady(limit: Int): Set[String] = fresh(inner.jobsReady(limit))
  override def jobsDead(threshold: Long, limit: Int): Set[String] =
    fresh(inner.jobsDead(threshold, limit))
  override def snapshotJobs: Seq[Job] = fresh(inner.snapshotJobs)
  override def snapshotDeps: Seq[Dep] = fresh(inner.snapshotDeps)

  /** Arbitrary-function update is not log-encodable; like
    * [[LogBackedJobStore.updateJob]] this is the single-process escape
    * hatch (tests) — the FSM ops above are the durable surface. */
  override def updateJob(id: String, pred: Job => Boolean, f: Job => Job): Option[Job] =
    fresh(inner.updateJob(id, pred, f))

  override def close(): Unit = ()
}

object SharedLogJobStore {
  private val monitors = new ConcurrentHashMap[String, Object]()
  private def monitorFor(path: String): Object =
    monitors.computeIfAbsent(path, _ => new Object)
}
