package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

import graft.Tables

/** A line item row for the typed API surface (schema: FIXTURES.md §B). */
case class LineItem(l_orderkey: Long, l_quantity: Double,
    l_extendedprice: Double, l_returnflag: String)

/** Typed-aggregation buffer: exact integer cents + row count. */
case class SumCount(sum: Long, n: Long)

/** The `Dataset[T]` typed API surface: case-class Encoders, typed lambda
  * filter/map, `groupByKey` + a custom typed `Aggregator` — the
  * compile-time-checked path the DataFrame API trades away.
  *
  * Engineering note (why the rest of the engine is column-based): typed
  * lambdas are OPAQUE to Catalyst — the `filter(_.l_quantity >= 10)` below
  * cannot be pushed to the parquet scan and the map's cents arithmetic
  * can't fold into codegen'd expressions. Type safety is worth that at
  * validated boundaries (the V1 ingest gate uses `as[EnrichedDoc]`); hot
  * paths stay declarative. This query exists to exercise the boundary and
  * prove the two APIs agree bit-for-bit (the oracle is the SQL form).
  */
object TypedApi {

  private val sumCents: Aggregator[(String, Long), SumCount, SumCount] =
    new Aggregator[(String, Long), SumCount, SumCount] {
      override def zero: SumCount = SumCount(0L, 0L)
      override def reduce(b: SumCount, a: (String, Long)): SumCount =
        SumCount(b.sum + a._2, b.n + 1L)
      override def merge(b1: SumCount, b2: SumCount): SumCount =
        SumCount(b1.sum + b2.sum, b1.n + b2.n)
      override def finish(r: SumCount): SumCount = r
      override def bufferEncoder: Encoder[SumCount] = Encoders.product[SumCount]
      override def outputEncoder: Encoder[SumCount] = Encoders.product[SumCount]
    }

  def dsTypedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[LineItem] = Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_returnflag")
      .as[LineItem]
    ds.filter(_.l_quantity >= 10.0)
      .map(li => (li.l_returnflag, math.round(li.l_extendedprice * 100)))
      .groupByKey(_._1)
      .agg(sumCents.toColumn.name("sc"))
      .map { case (flag, sc) => (flag, sc.n, sc.sum / 100.0) }
      .toDF("l_returnflag", "n_items", "sum_price")
      .orderBy("l_returnflag")
  }

  val dsTypedAggSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_price
      |FROM lineitem WHERE l_quantity >= 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_typed_agg" -> (dsTypedAgg _))

  val oracles: Map[String, String] = Map(
    "ds_typed_agg" -> dsTypedAggSql)
}
