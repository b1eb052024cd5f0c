package graft

import org.apache.spark.sql.{Row}
import org.apache.spark.sql.types._
import graft.sources.{CsvSource, FixtureSource, WarehouseSource, Retry}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S9 CsvSource: header + declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val f = dir.resolve("seed.csv")
    java.nio.file.Files.writeString(f,
      "chain,contract_address,internal_external\n" +
      "ethereum,0xAbC,aave_internal\n" +
      "polygon,0xDeF,aave_external\n")
    val schema = StructType(Seq(
      StructField("chain", StringType), StructField("contract_address", StringType),
      StructField("internal_external", StringType)))
    val got = CsvSource.read(spark, f.toString, schema)
    assert(got.schema == schema)
    assert(got.count() == 2)
  }

  test("S1-S11 FixtureSource: declared schema reaches the frame") {
    val schema = StructType(Seq(
      StructField("market", StringType), StructField("block_height", LongType)))
    val src = FixtureSource("blocks", schema,
      Seq(Row("ethereum_v3", 19000000L), Row("polygon_v3", 52000000L)))
    val got = src.fetch(spark)
    assert(got.schema == schema && got.count() == 2)
  }

  test("S12 WarehouseSource: partition filter prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wh").toString
    Seq(("2024-01-01", "ethereum_v3", 1.0), ("2024-01-02", "ethereum_v3", 2.0),
        ("2024-01-01", "polygon_v3", 3.0))
      .toDF("date", "market", "v")
      .write.mode("overwrite").partitionBy("date", "market").parquet(dir)
    val got = WarehouseSource.read(spark, dir,
      Map("date" -> "2024-01-01", "market" -> "ethereum_v3"))
    assert(got.count() == 1 && got.head().getAs[Double]("v") == 1.0)
    // partition pruning proof: only one of three partition dirs is scanned
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("polygon"), plan.take(500))
  }

  test("Retry backs off and succeeds after transient failures") {
    var calls = 0
    val got = Retry.withBackoff(maxRetries = 5, initialDelayMs = 1, jitterMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      42
    }
    assert(got == 42 && calls == 3)
  }

  test("JsonLinesSource: explicit schema, corrupt lines quarantined with the RAW line, trailing-garbage quirk pinned") {
    import org.apache.spark.sql.functions._
    import graft.sources.JsonLinesSource
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2, "name": "beta", "extra_field_not_in_schema": true}""",
      """{"id": 3, "name": }""",                    // malformed mid-value
      """totally not json""",                       // not JSON at all
      """{"id": 4}{"id": 99}""")                    // trailing second object
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "part-0.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = new StructType().add("id", "long").add("name", "string")
    val df = JsonLinesSource.read(spark, tmp, schema)
    val good = df.filter(col("_corrupt_record").isNull)
      .select("id", "name").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // Spark's Jackson parser takes the FIRST valid JSON value per line and
    // tolerates trailing garbage: line 5 is a GOOD row (id=4), not corrupt.
    // Fields outside the declared schema are dropped (line 2); missing
    // declared fields read as null (line 5's name).
    assert(good == Set((1L, Some("alpha")), (2L, Some("beta")), (4L, None)), good)
    // corrupt rows: every declared column null, the raw line preserved
    // verbatim for replay
    val bad = df.filter(col("_corrupt_record").isNotNull)
      .select("id", "name", "_corrupt_record").collect()
    assert(bad.length == 2)
    assert(bad.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(bad.map(_.getString(2)).toSet ==
      Set("""{"id": 3, "name": }""", "totally not json"))
  }
}
