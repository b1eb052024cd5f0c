package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the `Aggregator`/UDAF rung of the
  * custom-operator ladder): numerically stable streaming mean/variance.
  *
  * Welford/Chan parallel form: each partition folds its rows into
  * (n, mean, M2) in one pass, partial states merge associatively with the
  * pairwise update — no Σx² catastrophic cancellation, map-side partial
  * aggregation like any built-in. This is what a custom metric that can't
  * be composed from built-ins should look like: typed state, two code
  * paths (reduce + merge), zero driver involvement.
  */
object Stats {

  final case class MeanVar(n: Long, mean: Double, m2: Double)

  /** Final result: (mean, sample stddev). */
  final case class MeanStd(mean: Double, stddev: Double)

  object WelfordAggregator extends Aggregator[Double, MeanVar, MeanStd] {
    override def zero: MeanVar = MeanVar(0L, 0.0, 0.0)

    override def reduce(s: MeanVar, x: Double): MeanVar = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MeanVar(n, mean, s.m2 + d * (x - mean))
    }

    override def merge(a: MeanVar, b: MeanVar): MeanVar = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MeanVar(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }

    override def finish(s: MeanVar): MeanStd =
      MeanStd(s.mean,
        if (s.n < 2) 0.0 else math.sqrt(s.m2 / (s.n - 1)))

    override def bufferEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
    override def outputEncoder: Encoder[MeanStd] = Encoders.product[MeanStd]
  }

  /** Column form: `welford(col)` → struct(mean, stddev). */
  def welford(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(WelfordAggregator).apply(c)
}
