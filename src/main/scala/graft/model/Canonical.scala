package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type canonicalization — the engine's type system, mirroring the
  * reference's `standardise_types` (aave_data/resources/helpers.py:663-693):
  *
  *   - string columns stay StringType;
  *   - integer columns → nullable LongType;
  *   - float columns → nullable DoubleType (uint256 on-chain values are
  *     carried as doubles after decimal scaling — helpers.py:228-229);
  *   - timestamps → TimestampType, session timezone pinned to UTC;
  *   - any string column whose values are 0x-hex addresses → lowercase.
  */
object Canonical {

  private val addrPattern = "^0[xX][0-9a-fA-F]{6,}$"

  def lowercaseAddress(c: Column): Column =
    when(c.rlike(addrPattern), lower(c)).otherwise(c)

  /** Apply the standardise_types rules to every column of `df`. */
  def standardise(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: IntegerType | _: ShortType | _: ByteType => col(f.name).cast(LongType).as(f.name)
        case _: FloatType | _: DecimalType               => col(f.name).cast(DoubleType).as(f.name)
        case _: StringType => lowercaseAddress(col(f.name)).as(f.name)
        case _             => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Decimal scaling for raw uint256 values: x / 10^decimals
    * (reference: raw/10**decimals everywhere, e.g. data_lake.py:995). */
  def scaleDecimals(raw: Column, decimals: Column): Column =
    raw / pow(lit(10.0), decimals)

  /** Ray (1e27 fixed-point) → double (helpers.py:789-795). */
  def fromRay(c: Column): Column = c / lit(1e27)

  /** Basis points → fraction (helpers.py:758-766). */
  def fromBps(c: Column): Column = c / lit(1e4)
}
