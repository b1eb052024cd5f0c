package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Financial scalar operators from the reference, as native column
  * expressions (no UDFs — all codegen'd).
  */
object Finance {

  val SecondsPerYear: Double = 365.25 * 24 * 3600

  /** Compounded APY from a per-second rate compounded `periods` times/year:
    * (1 + r/periods)^periods − 1 (market_state_by_hour.sql:21-24;
    * protocol_data_warehouse.py:118-122). */
  def apyCompounded(apr: Column, periods: Column): Column =
    pow(lit(1.0) + apr / periods, periods) - 1.0

  /** Simple APR from a 1e18-scaled per-second rate
    * (protocol_data_lake.py:1583-1587). */
  def aprFromRatePerSecond(rate1e18: Column): Column =
    rate1e18 / lit(1e18) * lit(SecondsPerYear)

  /** Compound-v2-style block-rate APY: ((rate/1e18*blocksPerDay + 1)^365 − 1)
    * (protocol_data_lake.py:1462-1467). */
  def apyFromBlockRate(ratePerBlock1e18: Column, blocksPerDay: Column): Column =
    pow(ratePerBlock1e18 / lit(1e18) * blocksPerDay + lit(1.0), lit(365.0)) - 1.0

  /** Vesting clamp: amount vested by time t of a stream [start, stop] with
    * total `deposit`: deposit * max(min(t,stop)−start, 0)/(stop−start)
    * (data_lake.py:1709). */
  def vestedAmount(t: Column, start: Column, stop: Column, deposit: Column): Column =
    deposit * greatest(least(t, stop) - start, lit(0.0)) / (stop - start)

  /** Price impact of a quote: 1 − (received/sent normalized)
    * (protocol_data_lake.py:949,1035). */
  def priceImpact(fromAmountUsd: Column, toAmountUsd: Column): Column =
    lit(1.0) - toAmountUsd / fromAmountUsd
}
