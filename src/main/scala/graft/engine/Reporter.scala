package graft.engine

import scala.collection.concurrent.TrieMap

/** Error-reporting surface (§2C′): the reference logs every handler
  * failure and ships non-suppressed ones to Sentry with job id/type and
  * only the serializable parts of the exception context attached
  * (errors.clj:94-108, filter-serializable errors.clj:20-34). Here the
  * sink is pluggable; the suppression and context-sanitizing rules are
  * the engine's.
  */
trait Reporter {
  def report(job: Job, e: Throwable, context: Map[String, Any]): Unit
}

object Reporter {

  /** Drop context values that would not survive serialization to a
    * reporting backend (the reference drops non-JSON-serializable k/vs —
    * filter-serializable, errors.clj:20-34; asserted errors_test.clj:15-19). */
  def filterSerializable(context: Map[String, Any]): Map[String, Any] =
    context.filter {
      case (_, _: String | _: java.lang.Number | _: java.lang.Boolean | null) => true
      case (_, v: Seq[_]) => v.forall(x => filterSerializable(Map("x" -> x)).nonEmpty)
      case (_, v: Map[_, _]) =>
        v.forall { case (k2, v2) => k2.isInstanceOf[String] &&
          filterSerializable(Map("x" -> v2)).nonEmpty }
      case _ => false
    }

  /** Decide-and-dispatch: abort-silent / fault carry `suppress` and are
    * never shipped; everything else goes to the sink with sanitized
    * context (errors.clj:94-108). Returns true if shipped. */
  def dispatch(sink: Reporter, job: Job, e: Throwable, context: Map[String, Any]): Boolean = {
    val suppressed = e match {
      case s: OverseerSignal => s.suppress
      case _ => false
    }
    if (!suppressed) {
      sink.report(job, e,
        filterSerializable(context) ++ Map("job/id" -> job.id, "job/type" -> job.jobType))
      true
    } else false
  }

  /** In-memory sink for tests / local runs. */
  final class Recording extends Reporter {
    val reports = new TrieMap[String, (Throwable, Map[String, Any])]()
    override def report(job: Job, e: Throwable, context: Map[String, Any]): Unit =
      reports.put(job.id, (e, context))
  }

  /** Stderr sink — the zero-dependency default for a DSN-configured
    * reporter (the reference ships failures to Sentry when the config
    * carries `:sentry {:dsn}`, errors.clj:90-98; this library has no
    * network deps, so the built-in scheme logs). */
  final class Logging(dsn: String) extends Reporter {
    override def report(job: Job, e: Throwable, context: Map[String, Any]): Unit =
      System.err.println(s"[graft-reporter $dsn] job=${job.id} type=${job.jobType} error=$e context=$context")
  }

  // -- DSN dispatch ----------------------------------------------------------
  // The reference builds its Sentry sink from the configured DSN string
  // (config.clj:20-21 `sentry-dsn`, consumed by ->job-exception-handler,
  // errors.clj:90-98). Here the DSN's URI scheme picks a registered factory
  // so embedders can plug real backends (and tests a Recording sink)
  // without the engine depending on any client library.

  private val schemes = TrieMap[String, String => Reporter](
    "log" -> (dsn => new Logging(dsn)))

  /** Register a factory for a DSN scheme (e.g. `sentry` → a real client). */
  def registerScheme(scheme: String, factory: String => Reporter): Unit =
    schemes.put(scheme, factory)

  /** Build a reporter from a configured DSN: dispatch on the URI scheme,
    * falling back to the logging sink for unknown schemes (a misconfigured
    * DSN should never make error reporting itself throw). */
  def forDsn(dsn: String): Reporter = {
    val scheme = dsn.takeWhile(_ != ':')
    schemes.get(scheme).map(_(dsn)).getOrElse(new Logging(dsn))
  }
}
