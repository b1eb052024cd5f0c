package graft

/** Local smoke runner for the driver's entry contract: runs
  * `SparkEntry.entry` (flagship query at sf0.001) and prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
