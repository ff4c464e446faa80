package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Graph construction & validation (SURVEY.md §2A; fixtures FIXTURES.md §A.2). */
class GraphSpec extends AnyFunSuite {

  val diamond = Map(
    "result1" -> Seq("start"),
    "result2" -> Seq("start"),
    "finish"  -> Seq("result1", "result2"))

  test("jobGraph builds one unstarted job per type with edges at parents") {
    val g = JobGraph.jobGraph(diamond)
    assert(g.jobs.map(_.jobType).toSet == Set("start", "result1", "result2", "finish"))
    assert(g.jobs.forall(_.status == JobStatus.Unstarted))
    assert(g.deps.size == 4)
    val id = g.jobs.map(j => j.jobType -> j.id).toMap
    assert(g.deps.toSet == Set(
      Dep(id("result1"), id("start")), Dep(id("result2"), id("start")),
      Dep(id("finish"), id("result1")), Dep(id("finish"), id("result2"))))
  }

  test("jobGraph broadcasts the same args to every node (core_test.clj:64-74)") {
    val args = Some("""{"org/id":123}""")
    val g = JobGraph.jobGraph(Map("process" -> Seq("start"), "finish" -> Seq("process")), args)
    assert(g.jobs.size == 3)
    assert(g.jobs.forall(_.args == args))
  }

  test("squuid embeds unix seconds in the high 32 bits (core.clj:8-20)") {
    val before = System.currentTimeMillis() / 1000
    val id     = Squuid()
    val after  = System.currentTimeMillis() / 1000
    assert(Squuid.seconds(id) >= before && Squuid.seconds(id) <= after)
    assert(Squuid() != id)
  }

  test("valid-job / valid-graph (core.clj:31-39)") {
    assert(JobValidation.validJob(Job("id1", "t")))
    assert(!JobValidation.validJob(Job("", "t")))
    assert(!JobValidation.validJob(Job("id1", "t", status = "bogus")))
    val good = JobGraph.jobGraph(diamond)
    assert(good.isValid)
    assert(!JobGraph(good.jobs, good.deps :+ Dep("nope", good.jobs.head.id)).isValid)
    assert(!JobGraph(good.jobs :+ good.jobs.head, good.deps).isValid) // dup id
  }

  test("missing-handlers = graph types minus handler keys (core.clj:73-79)") {
    assert(JobGraph.missingHandlers(Set("start", "result1"), diamond) ==
      Set("result2", "finish"))
    assert(JobGraph.missingHandlers(Set("start", "result1", "result2", "finish"), diamond).isEmpty)
  }

  test("dependents: chain, fan-in, disconnected, cycle-safe (jdbc_test.clj:62-75)") {
    val chain = Seq(Dep("j1", "j0"), Dep("j2", "j1"))
    assert(JobGraph.dependents(chain, Set("j0")) == Set("j1", "j2"))
    assert(JobGraph.dependents(chain, Set("j2")) == Set.empty)
    // disconnected node → empty closure (datomic_test.clj:79-87)
    assert(JobGraph.dependents(chain, Set("lonely")) == Set.empty)
    // cycle does not loop forever
    val cyc = Seq(Dep("a", "b"), Dep("b", "a"))
    assert(JobGraph.dependents(cyc, Set("a")) == Set("b"))
  }
}
