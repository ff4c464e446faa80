package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** THE multi-process e2e: two real OS processes (forked JVMs running
  * [[PoolDemo]]) drain one DAG through a [[SharedLogJobStore]] they share
  * only via the filesystem — the reference's deployment story
  * (doc/guide/Concepts.md "Worker": masterless worker processes whose only
  * coordination point is the store) with actual process isolation, not
  * threads or connections standing in for it. Asserts pool-wide
  * exactly-once execution and that both processes did real work. */
class MultiProcessPoolSpec extends AnyFunSuite {

  private def classpathOf(cls: Class[_]): String =
    Paths.get(cls.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  test("two forked JVMs drain one shared store, each job exactly once pool-wide") {
    val dir = Files.createTempDirectory("pool-e2e").toString
    val seed = new SharedLogJobStore(dir)
    seed.install()
    val jobs = (1 to 200).map(_ => Job(Squuid(), "work"))
    seed.transactGraph(JobGraph.simpleGraph(jobs: _*))
    seed.close()

    // PoolDemo needs only the engine classes + the Scala library — no Spark
    val cp = Seq(classpathOf(classOf[Job]), classpathOf(classOf[List[_]]))
      .mkString(File.pathSeparator)
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    def fork(tag: String): (Process, String) = {
      val out = s"$dir/ran-$tag.txt"
      val pb = new ProcessBuilder(java, "-cp", cp, "graft.engine.PoolDemo",
        dir, out, "90000")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new File(s"$dir/proc-$tag.log"))
      (pb.start(), out)
    }
    val (p1, out1) = fork("a")
    val (p2, out2) = fork("b")
    assert(p1.waitFor() == 0, s"process a failed: ${slurp(s"$dir/proc-a.log")}")
    assert(p2.waitFor() == 0, s"process b failed: ${slurp(s"$dir/proc-b.log")}")

    val ranA = Files.readAllLines(Paths.get(out1)).asScala.filter(_.nonEmpty).toSeq
    val ranB = Files.readAllLines(Paths.get(out2)).asScala.filter(_.nonEmpty).toSeq
    val all = ranA ++ ranB
    // exactly-once pool-wide: no job ran in both processes, none ran twice
    assert(all.distinct.size == all.size,
      s"duplicate executions: ${all.groupBy(identity).filter(_._2.size > 1).keys}")
    assert(all.toSet == jobs.map(_.id).toSet, "every job ran exactly once")
    // both processes genuinely participated (200 jobs x 5 ms >> JVM start skew)
    assert(ranA.nonEmpty, "process a ran no jobs")
    assert(ranB.nonEmpty, "process b ran no jobs")

    // and the store agrees: a late reader replays everything as finished
    val check = new SharedLogJobStore(dir)
    check.install()
    assert(check.snapshotJobs.forall(_.status == JobStatus.Finished))
    check.close()
  }

  private def slurp(path: String): String =
    try new String(Files.readAllBytes(Paths.get(path))) catch { case _: Exception => "<no log>" }
}
