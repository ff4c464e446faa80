package graft.engine

import graft.SparkTestBase

/** The 7-configuration readiness truth table
  * (test/overseer/store/datomic_test.clj:14-64), asserted against BOTH the
  * driver-side store and the distributed DataFrame anti-join (StoreViews),
  * which must agree. */
class ReadinessSpec extends SparkTestBase {

  def buildMatrix(): (InMemoryJobStore, Map[String, String]) = {
    val s = new InMemoryJobStore; s.install()
    def j(n: String) = Job(n, s"type-$n")
    // 1 ready (no deps) / 2 started / 3 blocked by unstarted 1? no—use docs:
    //   j1 unstarted no deps            → ready
    //   j2 started                      → not ready
    //   j3 unstarted ← j2 (unstarted parent started) → blocked
    //   j4 finished                     → not ready
    //   j5 unstarted ← j4 (finished)    → ready
    //   j6 unstarted ← {j3 unstarted, j4 finished} → blocked
    //   j7 aborted                      → not ready
    //   j8 unstarted ← j9 failed        → blocked
    val jobs = (1 to 9).map(i => j(s"j$i"))
    val deps = Seq(Dep("j3", "j2"), Dep("j5", "j4"), Dep("j6", "j3"), Dep("j6", "j4"),
                   Dep("j8", "j9"))
    s.transactGraph(JobGraph(jobs, deps))
    s.reserveJob("j2")
    s.reserveJob("j4"); s.finishJob("j4")
    s.abortJob("j7")
    s.reserveJob("j9"); s.failJob("j9", None)
    (s, jobs.map(x => x.id -> x.jobType).toMap)
  }

  test("readiness matrix: store agrees with the truth table") {
    val (s, _) = buildMatrix()
    assert(s.jobsReady() == Set("j1", "j5"))
  }

  test("readiness matrix: DataFrame anti-join agrees with the store") {
    val (s, _) = buildMatrix()
    val jobs = StoreViews.jobsDF(spark, s).toDF()
    val deps = StoreViews.depsDF(spark, s).toDF()
    val ready = StoreViews.jobsReady(jobs, deps)
      .select("id").collect().map(_.getString(0)).toSet
    assert(ready == s.jobsReady())
  }

  test("jobs-dead DataFrame filter agrees with the store") {
    val (s, _) = buildMatrix()
    val now = System.currentTimeMillis() / 1000
    s.updateJob("j2", _ => true, _.copy(heartbeat = Some(now - 1000)))
    val jobs = StoreViews.jobsDF(spark, s).toDF()
    val deadDF = StoreViews.jobsDead(jobs, now - 100)
      .select("id").collect().map(_.getString(0)).toSet
    assert(deadDF == s.jobsDead(now - 100))
    assert(deadDF == Set("j2"))
  }

  test("dependents fixpoint DataFrame agrees with driver BFS on the diamond + chain") {
    val s = new InMemoryJobStore; s.install()
    val g = JobGraph.jobGraph(Map(
      "b" -> Seq("a"), "c" -> Seq("a"), "d" -> Seq("b", "c"), "e" -> Seq("d")))
    s.transactGraph(g)
    val id = g.jobs.map(j => j.jobType -> j.id).toMap
    val deps = StoreViews.depsDF(spark, s).toDF()
    val got = StoreViews.dependents(spark, deps, Seq(id("a")))
      .collect().map(_.getString(0)).toSet
    assert(got == JobGraph.dependents(s.snapshotDeps, Set(id("a"))))
    assert(got == Set(id("b"), id("c"), id("d"), id("e")))
  }

  test("abort cascade DataFrame marks exactly the closure (store_test.clj:106-124)") {
    val s = new InMemoryJobStore; s.install()
    val g = JobGraph.jobGraph(Map("j1" -> Seq("j0"), "j2" -> Seq("j1"), "x" -> Seq.empty))
    s.transactGraph(g)
    val id = g.jobs.map(j => j.jobType -> j.id).toMap
    val jobs = StoreViews.jobsDF(spark, s).toDF()
    val deps = StoreViews.depsDF(spark, s).toDF()
    val after = StoreViews.abortCascade(spark, jobs, deps, id("j1"))
      .select("id", "status").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(after(id("j1")) == JobStatus.Aborted)
    assert(after(id("j2")) == JobStatus.Aborted)
    assert(after(id("j0")) == JobStatus.Unstarted)
    assert(after(id("x")) == JobStatus.Unstarted)
  }
}
