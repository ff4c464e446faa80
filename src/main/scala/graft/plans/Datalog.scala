package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A minimal datalog engine compiled to DataFrame plans — the
  * query-language-diversity analog of the reference's second declarative
  * backend (store/datomic.clj:89-133 expresses dependents / readiness /
  * liveness as datalog rules; here the SAME rule shapes evaluate against
  * ANY DataFrame relations, so the rule surface runs distributed on
  * Spark instead of against a fact store).
  *
  * Supported: conjunctive rule bodies over positional relations,
  * constants and repeated variables in atoms, comparison guards
  * (<, <=, >, >=, =, !=), STRATIFIED negation (`not` body atoms), and
  * recursion — including the reference's NON-LINEAR doubling form of
  * transitive closure, which semi-naive evaluation turns into
  * O(log diameter) rounds (the GraphOps hop-doubling discipline, derived
  * here from the rule shape instead of hand-written).
  *
  * Evaluation is textbook stratified semi-naive:
  *  - strata: every IDB relation gets the smallest stratum such that
  *    positive same-stratum recursion is allowed and negated
  *    dependencies are STRICTLY lower; a negation cycle fails loudly.
  *  - within a stratum: non-recursive contributions seed the relations,
  *    then rounds fire each rule once per recursive-atom position with
  *    that position bound to the last DELTA and the rest to the full
  *    relation — new facts are anti-joined against the accumulated set,
  *    so work per round is proportional to what is NEW, not to what is
  *    known (the property that makes fixpoints survive 100 TB closures).
  *  - every round localCheckpoints the DELTA (lazily — the convergence
  *    probe's count() is the materializing action, so the round costs one
  *    job per changed head, not three); the accumulated frame is a union
  *    of those checkpointed deltas, compacted every few rounds. Without
  *    checkpointing, Catalyst analysis of the growing self-referential
  *    plan goes exponential (the q21 lesson, SURVEY §5).
  *
  * Relations are POSITIONAL (columns _p0.._pN), matching datalog's
  * tuple view; atoms bind positions to variables, which become join
  * keys by NAME — exactly Datomic's unification semantics, compiled to
  * hash equi-joins + left-anti joins that Catalyst plans like any other.
  */
object Datalog {

  /** One monitor per SparkSession guarding the recursive-stratum conf
    * clamp (see run()). Weak keys: a stopped session's monitor must not
    * pin the session in memory. */
  private val clampMonitors =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, AnyRef]()
  private def clampMonitor(s: org.apache.spark.sql.SparkSession): AnyRef =
    clampMonitors.synchronized {
      val m = clampMonitors.get(s)
      if (m != null) m
      else { val n = new AnyRef; clampMonitors.put(s, n); n }
    }

  sealed trait Term
  final case class V(name: String) extends Term
  final case class C(value: Any) extends Term

  /** One atom: `rel(terms...)`; `negated` only legal in bodies. */
  final case class Atom(rel: String, terms: Seq[Term],
                        negated: Boolean = false)

  /** Comparison guard over bound variables/constants. */
  final case class Guard(op: String, left: Term, right: Term)

  final case class Rule(head: Atom, body: Seq[Atom],
                        guards: Seq[Guard] = Nil)

  final case class Program(rules: Seq[Rule]) {

    private val idb: Set[String] = rules.map(_.head.rel).toSet

    /** Stratum per IDB relation (Ullman's iterated assignment).
      * Fails on recursion through negation. */
    private[plans] def strata: Map[String, Int] = {
      var s = idb.map(_ -> 0).toMap
      var changed = true
      var guard = 0
      while (changed) {
        changed = false
        guard += 1
        require(guard <= idb.size * idb.size + 2,
          "negation cycle: program is not stratifiable")
        rules.foreach { r =>
          val h = r.head.rel
          r.body.filter(a => idb.contains(a.rel)).foreach { a =>
            val need = if (a.negated) s(a.rel) + 1 else s(a.rel)
            if (s(h) < need) { s = s.updated(h, need); changed = true }
          }
        }
      }
      s
    }

    /** Bind one atom against its relation frame: constants filter,
      * repeated variables unify, output = one column per variable. */
    private def bind(df: DataFrame, atom: Atom): DataFrame = {
      require(df.columns.length == atom.terms.length,
        s"${atom.rel}: arity ${atom.terms.length} vs ${df.columns.length}")
      var out = df.toDF(df.columns.indices.map(i => s"_p$i"): _*)
      atom.terms.zipWithIndex.foreach {
        case (C(v), i) => out = out.filter(col(s"_p$i") === lit(v))
        case _         => ()
      }
      val varPos = atom.terms.zipWithIndex.collect { case (V(n), i) => (n, i) }
      varPos.groupBy(_._1).valuesIterator.filter(_.size > 1).foreach { ps =>
        ps.map(_._2).sliding(2).foreach { w =>
          out = out.filter(col(s"_p${w(0)}") === col(s"_p${w(1)}"))
        }
      }
      val proj = varPos.map(_._1).distinct.map { n =>
        col(s"_p${varPos.find(_._1 == n).get._2}").as(n)
      }
      out.select(proj: _*)
    }

    private def guardCol(vars: Set[String], g: Guard): Column = {
      def side(t: Term): Column = t match {
        case V(n) => require(vars.contains(n), s"guard on unbound var $n")
          col(n)
        case C(v) => lit(v)
      }
      val (l, r) = (side(g.left), side(g.right))
      g.op match {
        case "<" => l < r;   case "<=" => l <= r
        case ">" => l > r;   case ">=" => l >= r
        case "=" => l === r; case "!="  => l =!= r
        case other => throw new IllegalArgumentException(s"guard op $other")
      }
    }

    /** Evaluate one rule with positive IDB atom number `deltaPos`
      * (index into the rule's positive same-stratum atoms) bound to the
      * delta frame; -1 = all full (non-recursive firing). */
    private def fire(rule: Rule, rels: Map[String, DataFrame],
                     recursive: Set[String], deltaPos: Int,
                     delta: Map[String, DataFrame]): DataFrame = {
      val positives = rule.body.filterNot(_.negated)
      var recSeen = -1
      var acc: DataFrame = null
      positives.foreach { a =>
        val isRec = recursive.contains(a.rel)
        if (isRec) recSeen += 1
        val src = if (isRec && recSeen == deltaPos) delta(a.rel)
                  else rels(a.rel)
        val f = bind(src, a)
        acc =
          if (acc == null) f
          else {
            val shared = acc.columns.intersect(f.columns).toSeq
            require(shared.nonEmpty,
              s"rule for ${rule.head.rel}: cartesian body (no shared vars)")
            acc.join(f, shared)
          }
      }
      val bound = acc.columns.toSet
      rule.guards.foreach { g => acc = acc.filter(guardCol(bound, g)) }
      rule.body.filter(_.negated).foreach { a =>
        val f = bind(rels(a.rel), a)
        val shared = acc.columns.intersect(f.columns).toSeq
        require(shared.nonEmpty,
          s"rule for ${rule.head.rel}: unsafe negation (no shared vars)")
        acc = acc.join(f.select(shared.map(col): _*).distinct(),
          shared, "left_anti")
      }
      val proj = rule.head.terms.zipWithIndex.map {
        case (V(n), i) =>
          require(bound.contains(n), s"head var $n unbound"); col(n).as(s"_p$i")
        case (C(v), i) => lit(v).as(s"_p$i")
      }
      // RAW projection — the caller dedups ONCE per head per round (one
      // distinct + one anti-join instead of one per firing)
      acc.select(proj: _*)
    }

    /** Run the program over extensional relations `edb`; returns the
      * fixpoint of `target` (positional columns _p0.._pN).
      *
      * `materializeSeeds = false` skips the per-stratum seed checkpoint so
      * the full compiled plan stays visible to Catalyst — ONLY sound for
      * non-recursive programs (plan-shape introspection, tiny inputs);
      * recursive strata always checkpoint their deltas regardless. */
    def run(edb: Map[String, DataFrame], target: String,
            materializeSeeds: Boolean = true): DataFrame = {
      require(idb.contains(target) || edb.contains(target),
        s"unknown relation $target")
      val layer = strata
      var rels: Map[String, DataFrame] = edb
      layer.values.toSeq.distinct.sorted.foreach { st =>
        val stratumRels = idb.filter(layer(_) == st)
        val stratumRules = rules.filter(r => stratumRels.contains(r.head.rel))
        val recursive = stratumRels.filter { rel =>
          stratumRules.exists(_.body.exists(a => !a.negated && a.rel == rel))
        }
        // ——— the fixpoint driver (Flink delta-iteration discipline) ———
        //
        // The accumulated relation ("solution set") is NEVER re-shuffled
        // or re-materialized: it lives as the Vector of per-round DELTA
        // legs, each localCheckpointed at one FIXED hash width N on the
        // tuple columns. checkpoint preserves outputPartitioning, so the
        // per-round novelty check — the new facts anti-joined leg by leg
        // — is exchange-free: both sides are co-partitioned, and the
        // shuffle_hash hint makes each probe a partition-local hash
        // build of one delta-sized leg. Per-round shuffle volume is
        // therefore ∝ NEW facts only (the distinct), while the solution
        // set costs local probes — the r12 shape re-shuffled the whole
        // closure every round, which went superlinear at the 100× leg
        // (429 s at 64 g, OOM at 32 g; this shape measured 340 s — the
        // remaining per-round cost is the partition-LOCAL leg probes,
        // CPU not network; BASELINE.md has the full ledger).
        //
        // Rounds plan STATICALLY (AQE off, restored after): round
        // queries are short and fixed-shape, and adaptive replanning
        // measured ~0.25 s/round of pure latency — while AQE's runtime
        // coalescing would also break the fixed-width co-partitioning
        // this whole design rests on. N is sized once from the EDB
        // relations the recursive rules read (≈ expansion 16 ×
        // edb / 500k rows per partition, floor 4, cap 4096), so leg
        // hash maps stay bounded at any closure size.
        // a program can derive facts purely from constant rules (empty
        // EDB map) — fall back to the active session instead of NPE-ing
        // on an empty relation map
        val spark = rels.values.headOption.map(_.sparkSession)
          .getOrElse(org.apache.spark.sql.SparkSession.active)
        val isRec = recursive.nonEmpty
        // Recursive strata clamp SESSION-GLOBAL SQL confs for the
        // duration of the fixpoint. Conf writes are visible to every
        // query on the session, so two interleaved clamped sections
        // would each save the other's clamp as "previous" and leave the
        // session clamped after both restore — the clamp is therefore
        // serialized on a per-session monitor. JVM monitors are
        // reentrant, so a nested run() on the same thread composes: the
        // inner save/restore round-trips back to the outer clamp and the
        // outermost restores the true originals. Residual (documented):
        // queries fired on the same session from OTHER threads while a
        // fixpoint is in flight plan under the clamp — single-writer-
        // session semantics.
        def withClamp[T](body: => T): T =
          if (!isRec) body
          else clampMonitor(spark).synchronized {
            val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
            val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            val edbRefs = stratumRules
              .flatMap(_.body.filterNot(_.negated).map(_.rel))
              .distinct.filterNot(idb.contains).filter(rels.contains)
            val edbRows = edbRefs.map(rels(_).count()).sum
            val n = math.min(4096L, math.max(4L, edbRows * 16 / 500000L))
            spark.conf.set("spark.sql.shuffle.partitions", n.toString)
            try body
            finally {
              spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
              spark.conf.set("spark.sql.shuffle.partitions", prevParts)
            }
          }
        var full = Map.empty[String, DataFrame]
        var delta = Map.empty[String, DataFrame]
        var legs = Map.empty[String, Vector[DataFrame]]
        withClamp {
          // seed: fire every rule with recursive atoms bound to EMPTY —
          // i.e. only firings that need no same-stratum fact yet
          var seeds = Map.empty[String, Seq[DataFrame]]
          stratumRules.foreach { r =>
            val usesRec = r.body.exists(a =>
              !a.negated && recursive.contains(a.rel))
            if (!usesRec) {
              val f = fire(r, rels, Set.empty, -1, Map.empty)
              seeds = seeds.updated(r.head.rel,
                seeds.getOrElse(r.head.rel, Nil) :+ f)
            }
          }
          full = seeds.map { case (k, fs) =>
            val merged = fs.reduceLeft(_.unionByName(_)).distinct()
            k -> (if (materializeSeeds || recursive.contains(k))
                    merged.localCheckpoint()
                  else merged)
          }
          legs = full.map { case (k, v) => k -> Vector(v) }
          delta = full
          var changed = full.nonEmpty && isRec
          val trace = sys.env.contains("GRAFT_DL_TRACE")
          var round = 0
          while (changed) {
            round += 1
            val t0 = System.nanoTime()
            val avail = rels ++ full
            // RAW firings per head; dedup + leg-wise anti ONCE per head
            var raw = Map.empty[String, Seq[DataFrame]]
            stratumRules.foreach { r =>
              val recPositions = r.body.filter(a =>
                !a.negated && recursive.contains(a.rel))
              recPositions.indices.foreach { pos =>
                // every source must exist: a same-stratum rel with no
                // seed yet (no base-rule facts) is empty — skip firings
                // that read it outside the delta slot
                if (delta.contains(recPositions(pos).rel) &&
                    r.body.forall(a => avail.contains(a.rel))) {
                  val f = fire(r, avail, recursive.toSet, pos, delta)
                  raw = raw.updated(r.head.rel,
                    raw.getOrElse(r.head.rel, Nil) :+ f)
                }
              }
            }
            val next = raw.map { case (k, fs) =>
              val merged = fs.reduceLeft(_.unionByName(_)).distinct()
              val keys = merged.columns.toSeq
              // exchange-free novelty check: chained co-partitioned
              // anti-joins, one delta-sized hash build per leg
              k -> legs.getOrElse(k, Vector.empty).foldLeft(merged)(
                (acc, leg) => acc.join(leg.hint("shuffle_hash"),
                  keys, "left_anti"))
            }
            // lazy checkpoint: count() both materializes it and probes
            // convergence — one Spark job, not checkpoint-then-count
            val counted = next.map { case (k, v) =>
              (k, v.localCheckpoint(false)) }.map { case (k, v) =>
              (k, v, v.count()) }.filter(_._3 > 0)
            if (trace) System.err.println(
              f"[datalog] round $round%2d: " +
                s"delta=${counted.map(_._3).sum} " +
                f"${(System.nanoTime() - t0) / 1e9}%.2f s")
            if (counted.isEmpty) changed = false
            else {
              counted.foreach { case (rel, d, _) =>
                var ls = legs.getOrElse(rel, Vector.empty) :+ d
                // bound plan width & per-round probe count on DEEP
                // fixpoints: at 32 legs fold the solution set back into
                // ONE co-partitioned leg (repartition on the tuple
                // columns at the same fixed width, so co-partitioning
                // survives). Measured: compacting more eagerly (every 8)
                // cost MORE than the chained probes it saved — the
                // probe-side hash builds are cheap, re-materializing the
                // closure is not
                if (ls.size >= 32) {
                  val merged = ls.reduceLeft(_.unionByName(_))
                  val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
                  ls = Vector(merged
                    .repartition(n, merged.columns.map(col).toIndexedSeq: _*)
                    .localCheckpoint())
                }
                legs = legs.updated(rel, ls)
                full = full.updated(rel,
                  if (ls.size == 1) ls.head
                  else full.get(rel).map(_.unionByName(d)).getOrElse(d))
              }
              delta = counted.map(c => c._1 -> c._2).toMap
            }
          }
        }
        // defined-but-EMPTY relations must still exist (a later stratum
        // may bind or negate them; run(target) may name them): type each
        // one by firing a rule whose sources are all available and
        // taking limit(0) — plan-only, never executed, schema-exact.
        // Resolution iterates so chains of empty predicates type each
        // other; only a recursive clique with no base rule anywhere is
        // untypeable, and that is rejected loudly.
        var templates = Map.empty[String, DataFrame]
        var missing = stratumRels.filterNot(full.contains)
        var progress = true
        while (missing.nonEmpty && progress) {
          progress = false
          missing.foreach { rel =>
            val avail = rels ++ full ++ templates
            stratumRules.find(r => r.head.rel == rel &&
                r.body.forall(a => avail.contains(a.rel))).foreach { r =>
              templates = templates.updated(rel,
                fire(r, avail, Set.empty, -1, Map.empty).limit(0))
              progress = true
            }
          }
          missing = stratumRels.filterNot(r =>
            full.contains(r) || templates.contains(r))
        }
        require(missing.isEmpty,
          s"predicates $missing have no base rule anywhere in their " +
            "recursive clique: empty by construction but untypeable")
        rels = rels ++ full ++ templates
      }
      rels(target)
    }
  }
}
