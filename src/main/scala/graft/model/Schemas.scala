package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Typed views of the fixture tables — `Dataset[T]` with case-class
 * encoders for the code paths where compile-time field checks matter
 * (SURVEY.md §7 module 1). `DataFrame` stays the default for the
 * dynamic-schema operators; these are the typed entry points.
 */
object Schemas {

  final case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: Timestamp)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  final case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String, ts_ns: Long)

  final case class Document(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .withColumn("l_shipdate", org.apache.spark.sql.functions.col("l_shipdate").cast("timestamp"))
      .as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .withColumn("o_orderdate", org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp"))
      .as[Order]
  }

  def customer(spark: SparkSession, dir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, dir).as[Customer]
  }

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).as[Embedding]
  }
}
