package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Error reporting semantics (§2C′: errors.clj:20-34, 94-108;
  * errors_test.clj:15-19). */
class ReporterSpec extends AnyFunSuite {

  def fixture(h: Handler): (InMemoryJobStore, Reporter.Recording, Worker, String) = {
    val store = new InMemoryJobStore; store.install()
    val g = JobGraph.jobGraph(Map("work" -> Seq.empty))
    store.transactGraph(g)
    val sink = new Reporter.Recording
    (store, sink,
      new Worker(store, Map("work" -> h), WorkerConfig(seed = Some(7)), Some(sink)),
      g.jobs.head.id)
  }

  test("plain exceptions are reported with job context attached") {
    val (_, sink, w, id) = fixture(Handler(_ => throw new Exception("boom")))
    w.runUntilIdle()
    val (e, ctx) = sink.reports(id)
    assert(e.getMessage == "boom")
    assert(ctx("job/id") == id && ctx("job/type") == "work")
  }

  test("abort-silent and fault are suppressed; loud abort is reported") {
    val (_, s1, w1, id1) = fixture(Handler(_ => throw AbortJob("quiet", silent = true)))
    w1.runUntilIdle()
    assert(!s1.reports.contains(id1))

    val (_, s2, w2, id2) = fixture(Handler(_ => throw TransientFault("later")))
    w2.detectOnce(); w2.tick()
    assert(!s2.reports.contains(id2)) // fault always suppressed

    val (_, s3, w3, id3) = fixture(Handler(_ => throw AbortJob("loud")))
    w3.runUntilIdle()
    assert(s3.reports.contains(id3))
  }

  test("filter-serializable drops opaque values, keeps JSON-shaped ones") {
    val in = Map[String, Any](
      "s" -> "str", "i" -> 42, "d" -> 1.5, "b" -> true, "n" -> null,
      "bad" -> new Object, "thread" -> Thread.currentThread(),
      "seq" -> Seq(1, 2), "badseq" -> Seq(new Object),
      "map" -> Map("k" -> "v"))
    val out = Reporter.filterSerializable(in)
    assert(out.keySet == Set("s", "i", "d", "b", "n", "seq", "map"))
  }
}
