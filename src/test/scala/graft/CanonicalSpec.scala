package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Canonical

/** Twin of the reference's standardise_types dtype test
  * (tests/test_helpers.py:555-597). */
class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("standardise: int→long, float→double, addresses lowercased") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1, 2.5f, "0xC02AAA39b223FE8D0A0e5C4F27eAD9083C756Cc2", "plain"))),
      StructType(Seq(
        StructField("i", IntegerType), StructField("f", FloatType),
        StructField("addr", StringType), StructField("s", StringType))))
    val got = Canonical.standardise(df)
    assert(got.schema("i").dataType == LongType)
    assert(got.schema("f").dataType == DoubleType)
    val r = got.head()
    assert(r.getAs[String]("addr") == "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2")
    assert(r.getAs[String]("s") == "plain") // non-address strings untouched
  }

  test("ray/bps/decimal scaling") {
    val r = Seq((2.5e27, 150.0, 123456.0, 6.0)).toDF("ray", "bps", "raw", "dec")
      .select(Canonical.fromRay($"ray"), Canonical.fromBps($"bps"),
        Canonical.scaleDecimals($"raw", $"dec")).head()
    assert(math.abs(r.getDouble(0) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.015) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.123456) < 1e-12)
  }
}
