package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Config-driven construction — the reference's api.clj:25-48 story:
  * a parsed config map alone is enough to build the store (per-adapter
  * dispatch), install it, and start a draining worker; bad or missing
  * adapters fail with the reference's assertion messages
  * (config.clj:41-44,54-59).
  */
class ConfigSpec extends AnyFunSuite {

  private def derbyUrl(): String =
    s"jdbc:derby:memory:graftcfg${System.nanoTime()};create=true"

  test("fromMap parses the reference config.yml shape with defaults") {
    val cfg = GraftConfig.fromMap(Map(
      "store" -> Map("adapter" -> "jdbc", "config" -> Map("url" -> "jdbc:derby:memory:x;create=true")),
      "detector-sleep-time" -> 123,
      "heartbeat" -> Map("tolerance" -> 7)))
    assert(cfg.store.adapter == "jdbc")
    assert(cfg.store.options("url").startsWith("jdbc:derby:"))
    assert(cfg.detectorSleepMs == 123L)
    assert(cfg.sleepMs == 10000L)          // default, config.clj:65-66
    assert(cfg.heartbeatSleepMs == 60000L) // default, config.clj:68-69
    assert(cfg.heartbeatTolerance == 7)
  }

  test("bare-string JDBC config is accepted as the URL (config.clj:18)") {
    val cfg = GraftConfig.fromMap(Map(
      "store" -> Map("adapter" -> "h2", "config" -> "jdbc:derby:memory:y;create=true")))
    assert(cfg.store.options == Map("url" -> "jdbc:derby:memory:y;create=true"))
  }

  test("missing adapter fails with the reference's assertion message") {
    val e = intercept[IllegalArgumentException](GraftConfig.fromMap(Map.empty))
    assert(e.getMessage.contains("Store adapter is required"))
  }

  test("jdbc adapter without a url fails with the reference's assertion message") {
    val cfg = GraftConfig(StoreConfig("mysql"))
    val e = intercept[IllegalArgumentException](Graft.store(cfg))
    assert(e.getMessage.contains("Valid JDBC adapter and config are required"))
  }

  test("unknown adapter fails loudly") {
    val e = intercept[IllegalArgumentException](
      Graft.store(GraftConfig(StoreConfig("datomic"))))
    assert(e.getMessage.contains("Unknown store adapter datomic"))
  }

  test("adapter dispatch: memory, log, jdbc") {
    assert(Graft.store(GraftConfig(StoreConfig("memory"))).isInstanceOf[InMemoryJobStore])
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-log").toString
    assert(Graft.store(GraftConfig(StoreConfig("log", Map("dir" -> dir))))
      .isInstanceOf[LogBackedJobStore])
    val jdbc = Graft.store(GraftConfig(StoreConfig("jdbc", Map("url" -> derbyUrl()))))
    assert(jdbc.isInstanceOf[JdbcJobStore])
    jdbc.asInstanceOf[JdbcJobStore].close()
  }

  test("a worker built purely from config drains a DAG (api.clj start)") {
    val cfg = GraftConfig.fromMap(Map(
      "store" -> Map("adapter" -> "derby", "config" -> Map("url" -> derbyUrl())),
      "detector-sleep-time" -> 5,
      "sleep-time" -> 5))
    val store = Graft.store(cfg)
    store.install()
    val adjacency = Map(
      "extract" -> Seq.empty[String],
      "transform" -> Seq("extract"),
      "load" -> Seq("transform"))
    val runs = new ConcurrentHashMap[String, AtomicInteger]()
    val handlers = adjacency.keys.map { t =>
      t -> Handler { j => runs.computeIfAbsent(j.jobType, _ => new AtomicInteger).incrementAndGet(); () }
    }.toMap
    Graft.validateGraphHandlers(handlers, adjacency)
    store.transactGraph(Graft.jobGraph(adjacency))
    val worker = Graft.start(cfg, store, handlers)
    try {
      val deadline = System.currentTimeMillis() + 20000
      while (System.currentTimeMillis() < deadline &&
             !store.snapshotJobs.forall(_.status == JobStatus.Finished)) Thread.sleep(20)
    } finally worker.stop()
    assert(store.snapshotJobs.forall(_.status == JobStatus.Finished))
    assert(adjacency.keys.forall(t => runs.get(t).get() == 1))
    store.asInstanceOf[JdbcJobStore].close()
  }

  test("validateGraphHandlers reports the missing types") {
    val adjacency = Map("a" -> Seq.empty[String], "b" -> Seq("a"))
    val handlers = Map("a" -> Handler(_ => ()))
    val e = intercept[IllegalArgumentException](Graft.validateGraphHandlers(handlers, adjacency))
    assert(e.getMessage.contains("missing handlers b"))
  }

  test("control-flow signals carry the reference statuses") {
    assert(intercept[AbortJob](Graft.abort("x")).status == JobStatus.Aborted)
    assert(intercept[AbortJob](Graft.abortSilent("x")).suppress)
    assert(intercept[TransientFault](Graft.fault("x")).status == JobStatus.Unstarted)
  }
}
