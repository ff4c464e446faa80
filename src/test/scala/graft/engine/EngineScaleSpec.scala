package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Engine throughput shape: deep chains (sequential frontier of 1) and wide
  * fan-outs (all-ready frontier) both drain completely with bounded
  * per-job overhead — the two extreme DAG geometries a large pipeline hits. */
class EngineScaleSpec extends AnyFunSuite {

  test("a 500-deep chain drains in order") {
    val store = new InMemoryJobStore; store.install()
    val adj = (1 until 500).map(i => s"s$i" -> Seq(s"s${i - 1}")).toMap + ("s0" -> Seq.empty)
    store.transactGraph(JobGraph.jobGraph(adj))
    val handlers = adj.keys.map(t => t -> Handler(_ => t)).toMap
    val t0 = System.nanoTime()
    val ran = new Worker(store, handlers, WorkerConfig(seed = Some(7))).runUntilIdle()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(ran.size == 500)
    assert(store.snapshotJobs.forall(_.status == JobStatus.Finished))
    assert(secs < 30, f"chain drain took $secs%.1f s")
  }

  test("a 1000-wide fan-in drains and the barrier job runs last") {
    val store = new InMemoryJobStore; store.install()
    val wide = (0 until 1000).map(i => s"w$i" -> Seq.empty[String]).toMap
    val adj = wide + ("barrier" -> (0 until 1000).map(i => s"w$i"))
    store.transactGraph(JobGraph.jobGraph(adj))
    val handlers = adj.keys.map(t => t -> Handler(_ => t)).toMap
    val t0 = System.nanoTime()
    val ran = new Worker(store, handlers, WorkerConfig(seed = Some(7))).runUntilIdle()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(ran.size == 1001)
    val typeOf = store.snapshotJobs.map(j => j.id -> j.jobType).toMap
    assert(typeOf(ran.last) == "barrier")
    assert(store.snapshotJobs.forall(_.status == JobStatus.Finished))
    assert(secs < 60, f"fan-in drain took $secs%.1f s")
  }

  test("abort of a 300-node subtree cascades in one call") {
    val store = new InMemoryJobStore; store.install()
    // binary tree: node i depends on i/2
    val adj = (1 until 300).map(i => s"n$i" ->
      (if (i == 1) Seq.empty[String] else Seq(s"n${i / 2}"))).toMap
    store.transactGraph(JobGraph.jobGraph(adj))
    val id = store.snapshotJobs.map(j => j.jobType -> j.id).toMap
    store.abortJob(id("n1"))
    assert(store.snapshotJobs.forall(_.status == JobStatus.Aborted))
    assert(store.jobsReady().isEmpty)
  }
}
