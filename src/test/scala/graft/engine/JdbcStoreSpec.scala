package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** The JDBC backend through the same store-agnostic protocol suite as the
  * other two backends, plus what only this backend can do: several store
  * INSTANCES — each owning its own connection, standing in for separate
  * worker processes — coordinating through one shared database, with every
  * race resolved by the SQL-level optimistic CAS rather than a JVM lock
  * (reference store/jdbc.clj + test/overseer/store/jdbc_test.clj:42-60).
  *
  * Embedded Derby is single-JVM by nature, so "multi-process" here means
  * multi-connection against one shared database — the exact SQL a MySQL URL
  * would run across real processes.
  */
class JdbcStoreSpec extends AnyFunSuite with JobStoreBehaviors {

  private val n = new AtomicLong(0)
  private def freshUrl(): String =
    s"jdbc:derby:memory:graftstore${System.nanoTime()}_${n.incrementAndGet()};create=true"

  override def freshStore(): JobStore = {
    val s = new JdbcJobStore(freshUrl()); s.install(); s
  }

  storeProtocol()

  test("install is not idempotent (schema already exists)") {
    val url = freshUrl()
    val s = new JdbcJobStore(url)
    assert(s.install() == ":ok")
    intercept[IllegalArgumentException](s.install())
    s.close()
  }

  test("two connections, one database: reserve CAS admits exactly one racer per job") {
    val url = freshUrl()
    val s1 = new JdbcJobStore(url); s1.install()
    val s2 = new JdbcJobStore(url) // second "process": no install, shared schema
    try {
      val ids = (1 to 20).map(_ => Squuid())
      s1.transactGraph(JobGraph(ids.map(Job(_, "t")), Seq.empty))
      // both connections see the same ready set
      assert(s2.jobsReady() == ids.toSet)

      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val winners = new ConcurrentHashMap[String, AtomicInteger]()
      def racer(s: JdbcJobStore) = new Runnable {
        def run(): Unit = {
          start.await()
          ids.foreach { id =>
            if (s.reserveJob(id).isDefined)
              winners.computeIfAbsent(id, _ => new AtomicInteger).incrementAndGet()
          }
        }
      }
      pool.submit(racer(s1)); pool.submit(racer(s2))
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      // every job reserved exactly once across both connections
      assert(winners.size() == ids.size)
      ids.foreach(id => assert(winners.get(id).get() == 1, s"$id double-reserved"))
      assert(s1.jobsWithStatus(JobStatus.Started) == ids.toSet)
    } finally { s1.close(); s2.close() }
  }

  test("optimistic lock across connections: stale writer loses (jdbc_test.clj:42-60)") {
    val url = freshUrl()
    val s1 = new JdbcJobStore(url); s1.install()
    val s2 = new JdbcJobStore(url)
    try {
      val id = Squuid()
      s1.transactGraph(JobGraph.simpleGraph(Job(id, "t")))
      val v0 = s1.jobInfo(id).get.lockVersion
      // connection 2 writes first; connection 1's update conditioned on the
      // version it read beforehand must fail at the database
      assert(s2.updateJob(id, _.lockVersion == v0, _.copy(args = Some("from-s2"))).isDefined)
      assert(s1.updateJob(id, _.lockVersion == v0, _.copy(args = Some("from-s1"))).isEmpty)
      val j = s1.jobInfo(id).get
      assert(j.args.contains("from-s2") && j.lockVersion == v0 + 1)
    } finally { s1.close(); s2.close() }
  }

  test("durability: a reopened connection sees committed state (on-disk database)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    val dbUrl = s"jdbc:derby:$dir/store;create=true"
    val id = Squuid()
    val s1 = new JdbcJobStore(dbUrl); s1.install()
    s1.transactGraph(JobGraph.simpleGraph(Job(id, "t", args = Some("""{"k":1}"""))))
    s1.reserveJob(id); s1.finishJob(id)
    s1.close()
    val s2 = new JdbcJobStore(s"jdbc:derby:$dir/store")
    try {
      val j = s2.jobInfo(id).get
      assert(j.status == JobStatus.Finished && j.args.contains("""{"k":1}"""))
    } finally s2.close()
  }

  test("readyJobs hydrates in one round-trip and honors the limit") {
    val s = freshStore()
    val g = JobGraph.jobGraph(Map("a" -> Seq.empty, "b" -> Seq.empty, "c" -> Seq("a")))
    s.transactGraph(g)
    val ready = s.readyJobs()
    assert(ready.map(_.jobType).toSet == Set("a", "b"))
    assert(ready.forall(_.status == JobStatus.Unstarted))
    assert(s.readyJobs(limit = 1).size == 1)
  }
}
