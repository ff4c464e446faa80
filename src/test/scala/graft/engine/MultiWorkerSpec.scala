package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentHashMap

/** Masterless worker pool semantics: several workers over ONE store, never
  * talking to each other (reference doc/guide/Concepts.md "Worker") — the
  * CAS reserve guarantees each job executes exactly once even when every
  * worker sees it ready simultaneously. */
class MultiWorkerSpec extends AnyFunSuite {

  test("4 concurrent workers: every job runs exactly once, DAG order holds") {
    val store = new InMemoryJobStore; store.install()
    // two independent chains + a diamond, 20 jobs total
    val adj: Map[String, Seq[String]] =
      (1 until 8).map(i => s"a$i" -> Seq(s"a${i - 1}")).toMap ++
      (1 until 8).map(i => s"b$i" -> Seq(s"b${i - 1}")).toMap ++
      Map("a0" -> Seq.empty, "b0" -> Seq.empty,
          "d1" -> Seq("a0"), "d2" -> Seq("a0"), "d3" -> Seq("d1", "d2"),
          "top" -> Seq.empty)
    val g = JobGraph.jobGraph(adj)
    store.transactGraph(g)

    val runs = new ConcurrentHashMap[String, AtomicInteger]()
    val order = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val handlers = adj.keys.map { t =>
      t -> Handler { j =>
        runs.computeIfAbsent(j.jobType, _ => new AtomicInteger).incrementAndGet()
        order.add(j.jobType)
        Thread.sleep(1) // widen the race window
        t
      }
    }.toMap

    val workers = (1 to 4).map(i =>
      new Worker(store, handlers,
        WorkerConfig(detectorSleepMs = 5, sleepMs = 5, seed = Some(100L + i))).start())
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (System.currentTimeMillis() < deadline &&
             !store.snapshotJobs.forall(_.status == JobStatus.Finished)) Thread.sleep(20)
    } finally workers.foreach(_.stop())

    assert(store.snapshotJobs.forall(_.status == JobStatus.Finished),
      s"not drained: ${store.snapshotJobs.filterNot(_.status == JobStatus.Finished).map(j => j.jobType -> j.status)}")
    // exactly-once: the CAS reserve admitted each job a single time
    adj.keys.foreach { t =>
      assert(runs.get(t).get() == 1, s"$t ran ${runs.get(t).get()} times")
    }
    // dependency order: every chain link ran after its parent
    val pos = {
      import scala.jdk.CollectionConverters._
      order.asScala.zipWithIndex.toMap
    }
    adj.foreach { case (child, parents) =>
      parents.foreach(p => assert(pos(p) < pos(child), s"$p !< $child in $order"))
    }
  }

  test("two workers with disjoint handler sets split the graph by type") {
    val store = new InMemoryJobStore; store.install()
    val g = JobGraph.jobGraph(Map("alpha" -> Seq.empty, "beta" -> Seq("alpha")))
    store.transactGraph(g)
    val ranBy = new ConcurrentHashMap[String, String]()
    def h(worker: String) = Handler { j => ranBy.put(j.jobType, worker); () }
    val w1 = new Worker(store, Map("alpha" -> h("w1")),
      WorkerConfig(detectorSleepMs = 5, sleepMs = 5, seed = Some(1))).start()
    val w2 = new Worker(store, Map("beta" -> h("w2")),
      WorkerConfig(detectorSleepMs = 5, sleepMs = 5, seed = Some(2))).start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
             !store.snapshotJobs.forall(_.status == JobStatus.Finished)) Thread.sleep(20)
    } finally { w1.stop(); w2.stop() }
    assert(ranBy.get("alpha") == "w1" && ranBy.get("beta") == "w2")
  }
}
