package graft.engine

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Durable store backend: the same FSM semantics as [[InMemoryJobStore]],
  * persisted as an append-only JSON-lines transition log, replayed on open.
  *
  * This is the second Store backend (the reference ships two — JDBC and
  * Datomic — exercised by one shared protocol suite,
  * test/overseer/store_test.clj; ours is driven by the same
  * JobStoreBehaviors trait). Event-sourcing matches the Spark design note
  * in SURVEY.md §7: the log is the source of truth, the in-memory map is
  * the snapshot view, and the same log could be replayed into DataFrames
  * (`StoreViews`) or the streaming FSM (`FsmStream.transitions`) unchanged.
  * Single-writer by design — the store is the pipeline's one coordination
  * point (reference doc/guide/Concepts.md).
  */
final class LogBackedJobStore(dir: String) extends JobStore {

  private val inner = new InMemoryJobStore
  private val logPath: Path = Paths.get(dir, "joblog.jsonl")
  private var writer: BufferedWriter = _
  private val lock = new Object

  // -- log encoding: one JSON object per line ------------------------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def jstr(s: String) = "\"" + esc(s) + "\""
  private def field(k: String, v: Option[String]): String =
    v.map(x => s"${jstr(k)}:${jstr(x)}").getOrElse(s"${jstr(k)}:null")

  private def append(kind: String, fields: (String, String)*): Unit = lock.synchronized {
    val body = (Seq("op" -> kind) ++ fields)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    writer.write(body); writer.newLine(); writer.flush()
  }

  // crude but dependency-free field extraction (log is machine-written)
  private def extract(line: String, key: String): Option[String] = {
    val k = "\"" + key + "\":"
    val i = line.indexOf(k)
    if (i < 0) None
    else {
      val rest = line.substring(i + k.length)
      if (rest.startsWith("null")) None
      else {
        val sb = new StringBuilder
        var j = 1 // skip opening quote
        var done = false
        while (!done && j < rest.length) {
          rest.charAt(j) match {
            case '\\' =>
              rest.charAt(j + 1) match {
                case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
                case 'u' => sb += Integer.parseInt(rest.substring(j + 2, j + 6), 16).toChar; j += 4
                case c => sb += c
              }
              j += 2
            case '"' => done = true
            case c => sb += c; j += 1
          }
        }
        Some(sb.toString)
      }
    }
  }

  // record/unit separators for packing multiple jobs/deps into one line
  private val RS = '\u001e' // record separator
  private val US = '\u001f'

  private def replay(line: String): Unit = {
    val op = extract(line, "op").get
    op match {
      case "transact" =>
        val jobs = extract(line, "jobs").get.split(RS).filter(_.nonEmpty).map { rec =>
          val parts = rec.split(US).padTo(3, "")
          Job(parts(0), parts(1), args = if (parts(2).isEmpty) None else Some(parts(2)))
        }
        val deps = extract(line, "deps").get.split(RS).filter(_.nonEmpty).map { rec =>
          val parts = rec.split(US)
          Dep(parts(0), parts(1))
        }
        inner.transactGraph(JobGraph(jobs.toSeq, deps.toSeq))
      case "reserve"   => inner.reserveJob(extract(line, "id").get)
      case "finish"    => inner.finishJob(extract(line, "id").get)
      case "fail"      => inner.failJob(extract(line, "id").get, extract(line, "failure"))
      case "heartbeat" =>
        val id = extract(line, "id").get
        val at = extract(line, "at").get.toLong
        inner.updateJob(id, _ => true, _.copy(heartbeat = Some(at)))
      case "abort"     => inner.abortJob(extract(line, "id").get)
      case "reset"     => inner.resetJob(extract(line, "id").get)
      case other       => throw new IllegalStateException(s"unknown log op $other")
    }
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
          try replay(line)
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
    append("transact",
      "jobs" -> fresh.map(j => s"${j.id}$US${j.jobType}$US${j.args.getOrElse("")}")
        .mkString(RS.toString),
      "deps" -> g.deps.filter(d => freshIds.contains(d.jobId))
        .map(d => s"${d.jobId}$US${d.depId}").mkString(RS.toString))
    out
  }

  override def jobInfo(id: String): Option[Job] = inner.jobInfo(id)

  override def reserveJob(id: String): Option[Job] = lock.synchronized {
    val r = inner.reserveJob(id)
    if (r.isDefined) append("reserve", "id" -> id)
    r
  }

  override def finishJob(id: String): Unit = lock.synchronized {
    inner.finishJob(id); append("finish", "id" -> id)
  }

  override def failJob(id: String, failure: Option[String]): Unit = lock.synchronized {
    inner.failJob(id, failure)
    append("fail", Seq("id" -> id) ++ failure.map("failure" -> _): _*)
  }

  override def heartbeatJob(id: String): Unit = lock.synchronized {
    inner.heartbeatJob(id)
    inner.jobInfo(id).flatMap(_.heartbeat).foreach(h =>
      append("heartbeat", "id" -> id, "at" -> h.toString))
  }

  override def abortJob(id: String): Unit = lock.synchronized {
    inner.abortJob(id); append("abort", "id" -> id)
  }

  override def resetJob(id: String): Option[Job] = lock.synchronized {
    val r = inner.resetJob(id)
    if (r.isDefined) append("reset", "id" -> id)
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
