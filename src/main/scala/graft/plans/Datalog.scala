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
  *  - every round localCheckpoints the accumulated frame: without it
  *    Catalyst analysis of the growing self-referential plan goes
  *    exponential (the q21 lesson, SURVEY §5).
  *
  * Relations are POSITIONAL (columns _p0.._pN), matching datalog's
  * tuple view; atoms bind positions to variables, which become join
  * keys by NAME — exactly Datomic's unification semantics, compiled to
  * hash equi-joins + left-anti joins that Catalyst plans like any other.
  */
object Datalog {

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
      * fixpoint of `target` (positional columns _p0.._pN). */
    def run(edb: Map[String, DataFrame], target: String): DataFrame = {
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
        // seed: fire every rule with recursive atoms bound to EMPTY —
        // i.e. only firings that need no same-stratum fact yet
        var full = Map.empty[String, DataFrame]
        var delta = Map.empty[String, DataFrame]
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
          k -> fs.reduceLeft(_.unionByName(_)).distinct().localCheckpoint()
        }
        delta = full
        // semi-naive rounds
        var changed = full.nonEmpty && recursive.nonEmpty
        while (changed) {
          val avail = rels ++ full
          // RAW firings gathered per head; dedup + anti-join ONCE per head
          var raw = Map.empty[String, Seq[DataFrame]]
          stratumRules.foreach { r =>
            val recPositions = r.body.filter(a =>
              !a.negated && recursive.contains(a.rel))
            recPositions.indices.foreach { pos =>
              if (delta.contains(recPositions(pos).rel)) {
                val f = fire(r, avail, recursive.toSet, pos, delta)
                raw = raw.updated(r.head.rel,
                  raw.getOrElse(r.head.rel, Nil) :+ f)
              }
            }
          }
          var next = raw.map { case (k, fs) =>
            val merged = fs.reduceLeft(_.unionByName(_)).distinct()
            k -> full.get(k)
              .map(merged.join(_, merged.columns.toSeq, "left_anti"))
              .getOrElse(merged)
          }
          next = next.map { case (k, v) => k -> v.localCheckpoint() }
            .filter(_._2.count() > 0)
          if (next.isEmpty) changed = false
          else {
            next.foreach { case (rel, d) =>
              val merged = full.get(rel)
                .map(_.unionByName(d)).getOrElse(d).localCheckpoint()
              full = full.updated(rel, merged)
            }
            delta = next
          }
        }
        rels = rels ++ full
      }
      rels(target)
    }
  }
}
