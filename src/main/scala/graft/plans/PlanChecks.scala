package graft.plans

import org.apache.spark.sql.DataFrame

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
}
