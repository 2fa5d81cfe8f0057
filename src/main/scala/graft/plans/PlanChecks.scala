package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project, ResolvedHint, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Physical-plan auditing: the properties we design for at 100 TB —
 * filters pushed to the scan, dimensions broadcast, partial aggregation
 * before the exchange, no accidental cartesian products — extracted
 * from the executed plan so specs can assert them instead of eyeballing
 * `.explain` output.
 *
 * Works over the plan's string rendering (stable across AQE wrapping;
 * no `private[sql]` APIs).
 */
object PlanChecks {

  final case class Audit(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      broadcastHashJoins: Int,
      sortMergeJoins: Int,
      shuffledHashJoins: Int,
      nestedLoopJoins: Int,
      hashAggregates: Int,
      windows: Int,
      sorts: Int,
      pushedFilters: Seq[String],
      readSchemas: Seq[String],
      hasTakeOrderedAndProject: Boolean) {
    def joins: Int = broadcastHashJoins + sortMergeJoins + shuffledHashJoins
  }

  def audit(df: DataFrame): Audit = {
    // An EXECUTED AdaptiveSparkPlanExec renders "== Final Plan ==" AND
    // "== Initial Plan ==" sections — counting the whole string would
    // tally every exchange twice (observed when auditing a memoized
    // DataFrame another suite had already collected). Keep only the
    // final section; an unexecuted plan has no such marker.
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    def count(token: String): Int =
      plan.sliding(token.length).count(_ == token)
    Audit(
      shuffleExchanges = count("Exchange hashpartitioning") +
        count("Exchange rangepartitioning"),
      broadcastExchanges = count("BroadcastExchange"),
      broadcastHashJoins = count("BroadcastHashJoin"),
      sortMergeJoins = count("SortMergeJoin"),
      shuffledHashJoins = count("ShuffledHashJoin"),
      nestedLoopJoins = count("BroadcastNestedLoopJoin") + count("CartesianProduct"),
      hashAggregates = count("HashAggregate"),
      // "Window [" is the window exec's rendering; WindowGroupLimit (a
      // bound, not a window computation) intentionally not counted
      windows = count("Window ["),
      sorts = count("Sort ["),
      pushedFilters = "PushedFilters: \\[([^\\]]*)\\]".r
        .findAllMatchIn(plan).map(_.group(1)).filter(_.nonEmpty).toSeq,
      readSchemas = "ReadSchema: ([^\\n]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq,
      hasTakeOrderedAndProject = plan.contains("TakeOrderedAndProject"))
  }

  /**
   * Forced-broadcast audit: a `broadcast()` hint overrides AQE's size
   * check, so a hint over a table that grows with the data turns into a
   * driver OOM at 100× instead of a graceful shuffle-join fallback.
   *
   * A hinted subtree is acceptable only if it is bounded by
   * construction: a group-less (single-row) aggregate, or a scan
   * limited to fixed-size dimension tables (`allowed`). Everything else
   * is returned as a violation.
   */
  def forcedBroadcastViolations(
      df: DataFrame,
      allowed: Set[String] = Set("region", "nation")): Seq[String] = {
    // a "single-row" exemption holds only when the group-less Aggregate
    // IS the hinted subtree (modulo aliasing/projection/filter wrappers)
    // — an Aggregate buried under a join would wrongly bless
    // broadcast(bigTable.join(scalarAgg))
    @annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case pr: Project       => unwrap(pr.child)
      case f: Filter         => unwrap(f.child)
      case s: SubqueryAlias  => unwrap(s.child)
      case other             => other
    }
    val hinted = df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }
    hinted.flatMap { h =>
      val singleRow = unwrap(h.child) match {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _            => false
      }
      if (singleRow) None
      else {
        // leaves are bounded only when provably so: an allowlisted
        // fixed-size dimension scan or an in-memory LocalRelation.
        // Unknown leaf kinds (DSv2 scans, streaming sources) are NOT
        // presumed bounded — they flag as violations.
        val bad = h.child.collectLeaves().flatMap {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation =>
              val p = fs.location.rootPaths.mkString(",")
              if (allowed.exists(t => p.contains(s"$t.parquet"))) None
              else Some(p)
            case other => Some(other.toString)
          }
          case _: LocalRelation                          => None
          case leaf if leaf.nodeName == "OneRowRelation" => None
          case leaf => Some(s"unvetted leaf kind: ${leaf.nodeName}")
        }
        if (bad.isEmpty) None
        else Some(s"forced broadcast over scale-growing input: ${bad.mkString("; ")}")
      }
    }
  }
}
