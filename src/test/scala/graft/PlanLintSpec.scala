package graft

import graft.queries.Queries
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Automated scale-antipattern lint over EVERY registered query's
  * physical plan: the mistakes that are invisible at test SF and
  * fatal at 100 TB must not re-enter the suite silently.
  *
  *  - An unpartitioned WindowExec drags the whole input through ONE
  *    partition (the t5 bug class, fixed round 7 — this pins it).
  *  - CartesianProduct / BroadcastNestedLoopJoin are quadratic; the
  *    few places that use them deliberately (bounded brute-force
  *    baselines, the density-probed dense verification path) are
  *    whitelisted BY NAME so a new one fails review here first.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deliberate quadratic plans, each bounded by design:
  //  - s1: brute-force ANN baseline (1-row query side)
  //  - s2/s3: LSH/IVF probe joins a 1-row query vector by broadcast
  //  - d7/d3-family: the adaptive DENSE path verifies all pairs via
  //    BNLJ only when the density probe says the prefix filter would
  //    degenerate anyway (sf0.001's flat vocabulary triggers it)
  //  - q16: recursive-CTE loop internals (driver-bounded recursion)
  //  - t5: its BNLJ sides are groupBy(bucket) aggregates over the
  //    token-LENGTH domain (≤ distinct lengths / bucket width rows),
  //    bounded by the value domain, not the corpus — the two-level
  //    cumulative-distribution design
  //  - s17: the PCA-reduced brute-force top-k — same 1-row-query-side
  //    broadcast shape as s1 (the filter on the unique vec_id bounds
  //    the build side at one row, but that's not aggregate-provable)
  //  - s18: the recall audit's TRUTH stage is deliberately
  //    panel × corpus — a fixed nQueries-row broadcast side (bounded
  //    by the literal `vec_id < 32` filter, not aggregate-provable),
  //    the same shape as s1 widened from one query to the panel
  private val mayNestedLoop = Set(
    "s1_ann_brute", "s2_ann_lsh", "s3_ann_ivf", "s6_ann_quantized", "s17_pca_topk",
    "s18_recall_audit",
    // s19's build side is the one query row (literal vec_id filter,
    // not aggregate-provable) — the s1 shape on the signature table
    "s19_binary_rerank",
    // s21 is s6's one-query-row broadcast with a label pre-filter on
    // the probe side — same literal vec_id build row
    "s21_filtered_ann",
    // s23's vector leg IS s1 (brute cosine, one-query-row broadcast
    // bounded by the literal vec_id filter); the fusion above it is
    // a union of two LIMIT-bounded lists
    "s23_rrf_fusion",
    "q16_recursive_cte",
    "t5_length_quantiles",
    "d3_dedup_minhash", "d7_ngram_jaccard", "d8_dup_clusters", "d9_keep_canonical",
    // t20 pairs PER-SOURCE KMV sketches (src_a < src_b): both sides
    // are one row per source — tens of rows at any corpus size, by
    // the definition of a data mix — so the nested loop is over
    // metadata, not data
    "t20_kmv_overlap")

  /** A nested-loop join whose BROADCAST side is a grand aggregate
    * (no grouping keys → provably ≤ 1 row) is linear, not quadratic:
    * the scalar-subquery / corpus-stats / totals-row shape. The walk
    * descends ONLY through row-preserving unary nodes to the first
    * structural node and requires THAT to be the groupless aggregate
    * — `plan.exists` over the whole subtree would let a grand
    * aggregate buried under a join whitelist an arbitrarily large
    * build side.
    */
  private def boundIsOneRow(j: BroadcastNestedLoopJoinExec): Boolean = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution._
    @scala.annotation.tailrec
    def descend(p: SparkPlan): SparkPlan = p match {
      case n @ (_: ProjectExec | _: FilterExec | _: SortExec |
                _: WholeStageCodegenExec | _: InputAdapter |
                _: exchange.BroadcastExchangeExec | _: exchange.ShuffleExchangeExec |
                _: exchange.ReusedExchangeExec) =>
        n.children.headOption match { case Some(c) => descend(c); case None => n }
      case other => other
    }
    val build = j.buildSide match { case BuildLeft => j.left; case BuildRight => j.right }
    descend(build) match {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        h.groupingExpressions.isEmpty
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        s.groupingExpressions.isEmpty
      case _ => false
    }
  }

  /** Global SortExec nodes NOT on the root "presentation spine": a
    * global sort mid-plan is a full range-shuffle + sort that no
    * downstream operator asked for (the s6 bug class, round 8 — an
    * operator's cosmetic orderBy inherited by a pipeline that
    * immediately re-shuffles). The spine walk descends from the root
    * through row-preserving wrappers and limits; sorts found there
    * order the final output and are fine.
    */
  private def interiorGlobalSorts(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SortExec] = {
    import org.apache.spark.sql.execution._
    def spine(p: SparkPlan, acc: Set[SortExec]): Set[SortExec] = p match {
      case s: SortExec if s.global => spine(s.child, acc + s)
      // NOT ShuffleExchangeExec: an exchange destroys ordering, so a
      // sort below one is wasted work, never presentation — the
      // orderBy-then-repartition shape must be flagged, not allowed
      case n @ (_: ProjectExec | _: FilterExec | _: WholeStageCodegenExec |
                _: InputAdapter | _: CollectLimitExec | _: GlobalLimitExec |
                _: LocalLimitExec) =>
        n.children.headOption.map(spine(_, acc)).getOrElse(acc)
      case _ => acc
    }
    val allowed = spine(plan, Set.empty)
    plan.collect { case s: SortExec if s.global && !allowed(s) => s }
  }

  test("interior-sort detector fires on the s6 bug shape and not on presentation sorts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (1 to 10).toDF("x")
    // interior: a global sort feeding a downstream stage (the old
    // quantizeInt8 orderBy inherited by s6's pipeline). The aggregate
    // is order-SENSITIVE so EliminateSorts must keep the sort — for
    // order-insensitive consumers the optimizer already deletes it,
    // which is fine: either way no interior sort survives to physical.
    val bad = base.orderBy("x").groupBy(($"x" % 2).as("p")).agg(collect_list($"x").as("s"))
    assert(interiorGlobalSorts(bad.queryExecution.sparkPlan).nonEmpty)
    // presentation: final orderBy (possibly under a projection) is fine
    val good = base.groupBy(($"x" % 2).as("p")).agg(sum($"x").as("s")).orderBy("p").select($"s")
    assert(interiorGlobalSorts(good.queryExecution.sparkPlan).isEmpty)
    // a sort immediately re-shuffled away is wasted, not presentation
    val wasted = base.orderBy("x").repartition(4)
    assert(interiorGlobalSorts(wasted.queryExecution.sparkPlan).nonEmpty)
  }

  /** Salt-shaped explodes (explode of an all-literal int array — the
    * dim-replication half of a salted join) that are NOT fed by a
    * semi-join-filtered input replicate the ENTIRE dim saltFactor-fold:
    * at 100 TB a ×8 replication of a fact-sized dim is a multi-hundred-TB
    * shuffle (the round-8 q26 bug class). A targeted salted join filters
    * the dim to the heavy-hitter keys first (broadcast LeftSemi), so the
    * explode's subtree must contain a semi join.
    */
  private def fullDimSaltExplodes(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.GenerateExec] = {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Explode, Literal}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.GenerateExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    plan.collect {
      case g: GenerateExec if (g.generator match {
            case Explode(CreateArray(elems, _)) => elems.nonEmpty && elems.forall(_.isInstanceOf[Literal])
            case _ => false
          }) && !g.child.exists {
            case j: BroadcastHashJoinExec => j.joinType == LeftSemi
            case j: ShuffledHashJoinExec  => j.joinType == LeftSemi
            case j: SortMergeJoinExec     => j.joinType == LeftSemi
            case _ => false
          } => g
    }
  }

  /** A global window whose input is LIMIT-bounded along a row-
    * preserving spine orders a constant-size frame (the RRF rank over
    * a top-k list): bounded by the literal limit, not the corpus —
    * structurally provable, so no name whitelist. The descent stops
    * at the first non-row-preserving node; a join or aggregate ABOVE
    * the limit could re-grow the input and is NOT excused.
    */
  private def boundedByLimit(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    @scala.annotation.tailrec
    def walk(n: SparkPlan): Boolean = n match {
      case _: GlobalLimitExec | _: CollectLimitExec | _: TakeOrderedAndProjectExec => true
      case u @ (_: ProjectExec | _: FilterExec | _: SortExec |
                _: WholeStageCodegenExec | _: InputAdapter |
                _: exchange.ShuffleExchangeExec | _: exchange.ReusedExchangeExec) =>
        u.children.headOption match {
          case Some(c) => walk(c)
          case None => false
        }
      case _ => false
    }
    walk(p)
  }

  test("no registered query plans an unpartitioned window or stray quadratic join") {
    val offenders = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, (fn, _)) =>
      val plan = fn(spark, TestSpark.sfDir).queryExecution.sparkPlan
      val unpartitionedWindows = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !boundedByLimit(w.child) => w
      }
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      val bnlj = plan.collect {
        case j: BroadcastNestedLoopJoinExec if !boundIsOneRow(j) => j
      }
      val interiorSorts = interiorGlobalSorts(plan)
      val saltExplodes = fullDimSaltExplodes(plan)
      val problems =
        (if (unpartitionedWindows.nonEmpty) Seq(s"$name: unpartitioned WindowExec") else Nil) ++
        (if (cartesian.nonEmpty && !mayNestedLoop(name)) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (bnlj.nonEmpty && !mayNestedLoop(name)) Seq(s"$name: BroadcastNestedLoopJoin") else Nil) ++
        (if (interiorSorts.nonEmpty) Seq(s"$name: interior global Sort (${interiorSorts.head.sortOrder.mkString(",")})") else Nil) ++
        (if (saltExplodes.nonEmpty) Seq(s"$name: full-dim salt replication (explode not fed by a semi join)") else Nil)
      problems
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
