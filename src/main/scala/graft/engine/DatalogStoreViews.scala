package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.Datalog._

/** The store's query surface evaluated through the datalog rule engine —
  * the reference's actual second declarative backend, not a demo query.
  *
  * The reference expresses `dependent?`, `jobs-ready'` and liveness as
  * datalog rules against its fact store (store/datomic.clj:89-133:
  * `dependent?` is a recursive rule, `jobs-ready'` is negation over a
  * `blocked?` rule with a not= status guard). [[StoreViews]] hand-writes
  * the equivalent DataFrame plans; this object compiles the reference's
  * RULES through [[graft.plans.Datalog]] against the same store snapshot
  * frames, so both of the reference's store query languages (the SQL-ish
  * hand plan and the rule surface) run on Spark and must agree — the
  * agreement is asserted by ReadinessSpec's truth table
  * (test/overseer/store/datomic_test.clj:14-64 mirror) running through
  * BOTH paths, and by DatalogStoreSpec asserting the compiled plan shape
  * (join + left_anti) matches the hand-written one.
  *
  * Scale shape: identical to StoreViews by construction — the negation
  * rule compiles to exactly the semi/anti-join pair jobsReady declares by
  * hand; the recursive dependents rule runs the semi-naive delta loop
  * (work per round ∝ new facts). No extra shuffles are introduced by the
  * rule indirection: bind() is projection/filter, unification is a hash
  * equi-join.
  */
object DatalogStoreViews {

  /** jobs-ready' as the reference writes it (datomic.clj:105-117):
    *   blocked(j) ← dep(j, d) ∧ job(d, s) ∧ s ≠ finished
    *   ready(j)   ← job(j, unstarted) ∧ ¬blocked(j)
    */
  private[engine] val readyProgram = Program(Seq(
    Rule(Atom("blocked", Seq(V("j"))),
      Seq(Atom("dep", Seq(V("j"), V("d"))),
        Atom("job", Seq(V("d"), V("s")))),
      Seq(Guard("!=", V("s"), C(JobStatus.Finished)))),
    Rule(Atom("ready", Seq(V("j"))),
      Seq(Atom("job", Seq(V("j"), C(JobStatus.Unstarted))),
        Atom("blocked", Seq(V("j")), negated = true)))))

  /** dependent? closure (datomic.clj:93-96 doubling rule shape):
    *   dep*(x, a) ← edge(x, a)
    *   dep*(x, a) ← dep*(x, b) ∧ dep*(b, a)
    */
  private[engine] val dependentsProgram = Program(Seq(
    Rule(Atom("reach", Seq(V("x"), V("a"))),
      Seq(Atom("edge", Seq(V("x"), V("a")))),
      Seq()),
    Rule(Atom("reach", Seq(V("x"), V("a"))),
      Seq(Atom("reach", Seq(V("x"), V("b"))),
        Atom("reach", Seq(V("b"), V("a")))))))

  /** §2B `jobs-ready` through the rule engine. Same schema as
    * StoreViews.jobsReady restricted to the id column. */
  def jobsReady(jobs: DataFrame, deps: DataFrame): DataFrame = {
    val jobRel = jobs.select(col("id"), col("status"))
    val depRel = deps.select(col("jobId"), col("depId"))
    readyProgram.run(Map("job" -> jobRel, "dep" -> depRel), "ready")
      .select(col("_p0").as("id"))
  }

  /** §2B `jobs-dead` as a guard-only rule: dead(j) ← job_hb(j, h) ∧ h < t.
    * Only started jobs carry a live heartbeat obligation, as in
    * StoreViews.jobsDead. */
  def jobsDead(jobs: DataFrame, threshold: Long): DataFrame = {
    val hb = jobs.filter(col("status") === JobStatus.Started)
      .select(col("id"), coalesce(col("heartbeat"), lit(0L)).as("h"))
    Program(Seq(
      Rule(Atom("dead", Seq(V("j"))),
        Seq(Atom("job_hb", Seq(V("j"), V("h")))),
        Seq(Guard("<", V("h"), C(threshold))))))
      .run(Map("job_hb" -> hb), "dead")
      .select(col("_p0").as("id"))
  }

  /** §2D row 6 `dependents` through the recursive rule: all jobs whose
    * closure reaches any of `rootIds`. Matches StoreViews.dependents
    * (roots excluded from the result). */
  def dependents(spark: SparkSession, deps: DataFrame,
                 rootIds: Seq[String]): DataFrame = {
    import spark.implicits._
    // edge(x, a): x depends on a. reach(x, a) = x transitively depends
    // on a; dependents of the roots = { x : reach(x, root) } ∖ roots.
    val edges = deps.select(col("jobId"), col("depId"))
    val closure = dependentsProgram.run(Map("edge" -> edges), "reach")
    val roots = rootIds.toDF("r")
    closure.join(broadcast(roots), closure("_p1") === col("r"), "left_semi")
      .select(col("_p0").as("id"))
      .join(broadcast(roots), col("id") === col("r"), "left_anti")
      .distinct()
  }
}
