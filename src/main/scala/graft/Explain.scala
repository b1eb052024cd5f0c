package graft

/** Plan auditor: prints the formatted physical plan of the named queries
  * (or all) at the given sf dir — used to verify pushdown, pruning,
  * broadcast choices and whole-stage codegen coverage per SURVEY §4.
  *
  * Usage: MAIN=graft.Explain tools/run_verify.sh <sfDir> [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local()
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
