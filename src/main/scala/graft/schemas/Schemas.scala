package graft.schemas

import org.apache.spark.sql.types._

/** Explicit input schemas for the reference's three CSV sources
  * (/root/reference/dags/spark/etl.py:33-48, 73-94, 129-155).
  *
  * Binding is POSITIONAL: the CSV headers are CamelCase
  * (`ISIN,Mnemonic,...`) while these fields are snake_case; with
  * `header=true` + an explicit schema Spark skips the header row and binds
  * by position (SURVEY.md §1.3, decision D4).
  *
  * All fields are declared nullable (decision D2): the reference declares
  * nullable=False but the data genuinely contains nulls (Eurex FUT rows
  * have empty strike/put_or_call/generation) and Spark's CSV reader
  * relaxes to nullable anyway — we encode reality.
  */
object Schemas {

  /** Xetra cash-market minute bars (etl.py:33-48). */
  val xetra: StructType = StructType(Seq(
    StructField("isin", StringType),
    StructField("mnemonic", StringType),
    StructField("security_description", StringType),
    StructField("security_type", StringType),
    StructField("currency", StringType),
    StructField("security_id", StringType),
    StructField("trading_date", DateType),
    StructField("trading_time", StringType),
    StructField("start_price", DoubleType),
    StructField("max_price", DoubleType),
    StructField("min_price", DoubleType),
    StructField("end_price", DoubleType),
    StructField("traded_volume", LongType),
    StructField("number_of_trades", LongType)))

  /** Eurex derivative minute bars (etl.py:73-94). */
  val eurex: StructType = StructType(Seq(
    StructField("isin", StringType),
    StructField("market_segment", StringType),
    StructField("underlying_symbol", StringType),
    StructField("underlying_isin", StringType),
    StructField("currency", StringType),
    StructField("security_type", StringType),
    StructField("maturity_string", StringType),
    StructField("strike_price", DoubleType),
    StructField("put_or_call", StringType),
    StructField("mleg", StringType),
    StructField("contract_generation_number", IntegerType),
    StructField("security_id", StringType),
    StructField("trading_date", DateType),
    StructField("trading_time", StringType),
    StructField("start_price", DoubleType),
    StructField("max_price", DoubleType),
    StructField("min_price", DoubleType),
    StructField("end_price", DoubleType),
    StructField("number_of_contracts", LongType),
    StructField("number_of_trades", LongType)))

  /** Eurex product-specification dimension, 25 columns (etl.py:129-155). */
  val dimension: StructType = StructType(Seq(
    StructField("market_segment", StringType),
    StructField("product_name", StringType),
    StructField("product_isin", StringType),
    StructField("product_line", StringType),
    StructField("product_type", StringType),
    StructField("product_type_symbol", StringType),
    StructField("liquidity_class", StringType),
    StructField("trading_environment", StringType),
    StructField("partition", StringType),
    StructField("currency", StringType),
    StructField("us_approval_type", StringType),
    StructField("settlement_type", StringType),
    StructField("contract_size", LongType),
    StructField("tick_size", DoubleType),
    StructField("tick_value", DoubleType),
    StructField("max_order_qty_tsl", LongType),
    StructField("max_tes_qty_tsl", LongType),
    StructField("max_future_spread_qty_tsl", LongType),
    StructField("max_market_order_qty", LongType),
    StructField("position_limit", LongType),
    StructField("pre_trade_limits", StringType),
    StructField("underlying", StringType),
    StructField("underlying_isin", StringType),
    StructField("underlying_name", StringType),
    StructField("underlying_category", StringType)))
}
