package graft

import org.apache.spark.sql.SparkSession

/**
 * SQL view catalog: expose the engine to a SQL-ONLY consumer. The
 * reference has no SQL layer at all (SURVEY.md §2.5); here every base
 * table and every operator in [[SparkEntry.queries]] can be registered
 * as a temp view, after which the whole surface is plain `spark.sql`:
 *
 * {{{
 *   graft.Views.registerTables(spark, dir)
 *   graft.Views.register(spark, dir, Seq("q173_dup_spectrum"))
 *   spark.sql("SELECT * FROM q173_dup_spectrum WHERE n_copies > 1")
 * }}}
 *
 * A temp view stores the operator's LOGICAL plan, not results — SQL
 * over a view composes into one Catalyst plan, so filters written
 * against the view participate in pushdown/pruning exactly as the
 * DataFrame form would (spec-asserted).
 *
 * Registration cost: views are lazy, but operators backed by a stored
 * artifact (ANN indexes, LSH band tables, the bigram LM) BUILD that
 * artifact when their plan is constructed — the same one-time cost
 * their programmatic use pays, memoized per corpus by `ModelCache`.
 * That is why [[register]] takes an explicit name list and
 * [[registerAll]] is the opt-in convenience for sessions that want
 * the full catalog warm.
 */
object Views {

  /** Fixture/base tables as temp views (the names every oracle SQL
    * uses — so any oracle query in [[SparkEntry.oracleSql]] also runs
    * verbatim through `spark.sql` after this). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    import graft.model.Tables
    Seq(
      "region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "documents" -> Tables.documents _,
      "embeddings" -> Tables.embeddings _, "events" -> Tables.events _
    ).foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
  }

  /** Register the named operators as temp views (names = query ids,
    * already valid SQL identifiers). Unknown names throw — a silent
    * skip would surface later as a confusing missing-view error. */
  def register(spark: SparkSession, dir: String, names: Seq[String]): Unit =
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(
          s"unknown graft operator: $name (${SparkEntry.queries.size} available)"))
      fn(spark, dir).createOrReplaceTempView(name)
    }

  /** The full catalog — every operator as a view. Builds every stored
    * artifact for the corpus up front (see class doc). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, SparkEntry.queries.keys.toSeq)
}
