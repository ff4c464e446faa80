package graft.engine

/** Line codec for the append-only job-transition log shared by
  * [[LogBackedJobStore]] (single-process durable backend) and
  * [[SharedLogJobStore]] (multi-process backend): one JSON object per line,
  * one line per FSM transition, replayable in order into an
  * [[InMemoryJobStore]]. Keeping the codec in one place means the two
  * backends are interchangeable on the same log file.
  */
private[engine] object JobLog {

  // record/unit separators for packing multiple jobs/deps into one line
  val RS = '\u001e'
  val US = '\u001f'

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def jstr(s: String) = "\"" + esc(s) + "\""

  /** Encode one transition as a single log line (no trailing newline). */
  def encode(kind: String, fields: (String, String)*): String =
    (Seq("op" -> kind) ++ fields)
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")

  def encodeTransact(fresh: Seq[Job], deps: Seq[Dep]): String =
    encode("transact",
      "jobs" -> fresh.map(j => s"${j.id}$US${j.jobType}$US${j.args.getOrElse("")}")
        .mkString(RS.toString),
      "deps" -> deps.map(d => s"${d.jobId}$US${d.depId}").mkString(RS.toString))

  // crude but dependency-free field extraction (log is machine-written)
  def extract(line: String, key: String): Option[String] = {
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

  /** Apply one logged transition to the snapshot state. */
  def replay(line: String, inner: InMemoryJobStore): Unit = {
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
}
