package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
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
      pushedFilters: Seq[String],
      readSchemas: Seq[String],
      hasTakeOrderedAndProject: Boolean) {
    def joins: Int = broadcastHashJoins + sortMergeJoins + shuffledHashJoins
  }

  def audit(df: DataFrame): Audit = {
    val plan = df.queryExecution.executedPlan.toString
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
    val hinted = df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h
    }
    hinted.flatMap { h =>
      val singleRow = h.child.collectFirst {
        case a: Aggregate if a.groupingExpressions.isEmpty => a
      }.isDefined
      if (singleRow) None
      else {
        val scanned = h.child.collectLeaves().map {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.mkString(",")
            case other                => other.toString
          }
          case leaf => leaf.nodeName
        }
        val bad = scanned.filterNot(p =>
          allowed.exists(t => p.contains(s"$t.parquet")) || !p.contains(".parquet"))
        if (bad.isEmpty) None
        else Some(s"forced broadcast over scale-growing input: ${bad.mkString("; ")}")
      }
    }
  }
}
