package graft.engine

/** A concrete job graph: node set + dependency edges.
  *
  * The reference represents this as a Loom digraph whose nodes are Job maps
  * (src/overseer/core.clj:34-39). We use the same relational encoding its
  * JDBC store uses (store/jdbc.clj:146-150): a job table and an edge table —
  * which is also exactly the two-Dataset form the Spark views expose.
  */
final case class JobGraph(jobs: Seq[Job], deps: Seq[Dep]) {
  def jobIds: Set[String] = jobs.map(_.id).toSet
  def isValid: Boolean    = JobValidation.validGraph(this)
}

object JobGraph {

  /** Build a concrete graph from an abstract type-adjacency map
    * (`jobType -> its dependency types`; edges point at parents) plus shared
    * args attached to EVERY node. One squuid per type, every job `unstarted`.
    * Reference: src/overseer/core.clj:41-71 (re-exported api.clj:50-72);
    * args-broadcast asserted in test/overseer/core_test.clj:64-74.
    */
  def jobGraph(adjacency: Map[String, Seq[String]], args: Option[String] = None): JobGraph = {
    // Every type mentioned anywhere (as child or parent) becomes a node.
    val allTypes = adjacency.keySet ++ adjacency.values.flatten
    val now      = System.currentTimeMillis() / 1000L
    val idByType = allTypes.map(t => t -> Squuid()).toMap
    val jobs = allTypes.toSeq.sorted.map { t =>
      Job(id = idByType(t), jobType = t, status = JobStatus.Unstarted,
          args = args, createdAt = now, updatedAt = now)
    }
    val deps = for {
      (child, parents) <- adjacency.toSeq
      parent           <- parents
    } yield Dep(jobId = idByType(child), depId = idByType(parent))
    JobGraph(jobs, deps)
  }

  /** Edge-free graph of the given jobs (reference: api.clj:74-77). */
  def simpleGraph(jobs: Job*): JobGraph = JobGraph(jobs, Nil)

  /** Graph node types with no registered handler — set difference
    * (reference: core.clj:73-79, asserted wrapper api.clj:79-85). */
  def missingHandlers(handlerTypes: Set[String],
                      adjacency: Map[String, Seq[String]]): Set[String] =
    (adjacency.keySet ++ adjacency.values.flatten) -- handlerTypes

  /** Transitive dependents of `roots` over `deps` (children, grandchildren …)
    * — cycle-safe BFS with a visited set, reference jdbc.clj:101-113.
    * Driver-side form; the DataFrame fixpoint lives in StoreViews. */
  def dependents(deps: Seq[Dep], roots: Set[String]): Set[String] = {
    val children = deps.groupBy(_.depId).map { case (k, v) => k -> v.map(_.jobId).toSet }
    var visited  = Set.empty[String]
    var frontier = roots
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(children.getOrElse(_, Set.empty)) -- visited -- roots
      visited ++= next
      frontier = next
    }
    visited
  }
}
