package graft.engine

/** Handler = the user's unit of computation for one job type.
  *
  * The reference accepts either a bare function `job → any` or a map
  * `{:pre-process, :process (required), :post-process}`
  * (src/overseer/executor.clj:12-39). We model the map form directly; the
  * bare-function form is `Handler(f)`.
  *
  * Stage semantics (asserted in test/overseer/executor_test.clj:41-54):
  * `pre(job)`; `res = process(job)`; `post(job, res)` — post receives
  * process's return value and its own return value is the handler result.
  */
final case class Handler(
    preProcess: Job => Unit = _ => (),
    process: Job => Any,
    postProcess: (Job, Any) => Any = (_, r) => r) {

  def invoke(job: Job): Any = {
    preProcess(job)
    val res = process(job)
    postProcess(job, res)
  }
}

object Handler {
  def apply(f: Job => Any): Handler = Handler(process = f)

  /** Handler stages addressable by a harness. */
  val Pre  = "pre-process"
  val Proc = "process"
  val Post = "post-process"

  /** Ring-middleware-style wrapper of one handler stage (default: process).
    * A missing stage is treated as the identity function so harnesses
    * compose uniformly. Reference: api.clj:120-183; behavior matrix
    * test/overseer/api_test.clj:19-86.
    */
  def harness(h: Handler, stage: String = Proc)(wrap: (Job => Any) => (Job => Any)): Handler =
    stage match {
      case Pre  => h.copy(preProcess = j => { wrap(jj => { h.preProcess(jj); () })(j); () })
      case Proc => h.copy(process = wrap(h.process))
      case Post =>
        // post is binary; the harness wraps it with the process result closed over
        h.copy(postProcess = (j, r) => wrap(jj => h.postProcess(jj, r))(j))
      case other => throw new IllegalArgumentException(s"unknown handler stage: $other")
    }
}
