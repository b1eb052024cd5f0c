package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interpolation operators — the reference fits models per group and
  * evaluates them over sweep grids:
  *
  *   - piecewise-linear `np.interp` over list columns
  *     (aave_data/assets/protocol/protocol_data_warehouse.py:377-384);
  *   - natural cubic spline fit + eval per day group
  *     (protocol_data_warehouse.py:537-564).
  *
  * Both are implemented over COLLECTED array columns: the group key in the
  * reference is `block_day` (≤ thousands of groups, ~100 points each), so
  * `groupBy.agg(collect_list)` keeps every group tiny regardless of total
  * data scale — the arrays never exceed the sweep-grid size. Linear interp
  * is pure Catalyst expressions (codegen'd); the spline solver is a Scala
  * UDF over arrays (tridiagonal solve is inherently sequential per group,
  * but each evaluation is O(grid) on a ≤100-element array).
  */
object Interp {

  /** np.interp equivalent as a pure Catalyst expression: for each query
    * point q in `qs`, linearly interpolate over sorted knots (`xs`, `ys`).
    * Clamps outside the knot range (numpy's default behavior).
    * All three args are array<double> columns; xs must be ascending.
    */
  def linearInterp(qs: Column, xs: Column, ys: Column): Column = {
    transform(qs, q => {
      val n = size(xs)
      // index of first knot >= q (1-based); 0 if none
      val idxGe = coalesce(
        array_position(transform(xs, x => x >= q), lit(true)), lit(0L))
      val below = q <= element_at(xs, 1)
      val above = idxGe === 0L
      val i  = idxGe // right knot index
      val x0 = element_at(xs, (i - 1).cast("int"))
      val x1 = element_at(xs, i.cast("int"))
      val y0 = element_at(ys, (i - 1).cast("int"))
      val y1 = element_at(ys, i.cast("int"))
      when(below, element_at(ys, 1))
        .when(above, element_at(ys, n))
        .when(x1 === x0, y1)
        .otherwise(y0 + (y1 - y0) * (q - x0) / (x1 - x0))
    })
  }

  /** Natural cubic spline: fit on knots (xs, ys), evaluate at qs.
    * Scala implementation of the standard tridiagonal natural-spline solve
    * (second derivative = 0 at both ends), matching scipy
    * `CubicSpline(..., bc_type='natural')`. Clamps evaluation outside the
    * knot range to the boundary segment (linear extension of the end cubic).
    */
  def splineEval(xs: Array[Double], ys: Array[Double], qs: Array[Double]): Array[Double] = {
    val n = xs.length
    require(n >= 2, "spline needs >= 2 knots")
    if (n == 2) return qs.map { q =>
      val t = (q - xs(0)) / (xs(1) - xs(0))
      ys(0) + t * (ys(1) - ys(0))
    }
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // Solve for second derivatives m(0..n-1), m(0)=m(n-1)=0 (natural BC)
    val alpha = Array.tabulate(n)(i =>
      if (i == 0 || i == n - 1) 0.0
      else 3.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1)))
    val l = new Array[Double](n); val mu = new Array[Double](n); val z = new Array[Double](n)
    l(0) = 1.0; mu(0) = 0.0; z(0) = 0.0
    var i = 1
    while (i < n - 1) {
      l(i) = 2.0 * (xs(i + 1) - xs(i - 1)) - h(i - 1) * mu(i - 1)
      mu(i) = h(i) / l(i)
      z(i) = (alpha(i) - h(i - 1) * z(i - 1)) / l(i)
      i += 1
    }
    l(n - 1) = 1.0; z(n - 1) = 0.0
    val c = new Array[Double](n); val b = new Array[Double](n - 1); val d = new Array[Double](n - 1)
    c(n - 1) = 0.0
    var j = n - 2
    while (j >= 0) {
      c(j) = z(j) - mu(j) * c(j + 1)
      b(j) = (ys(j + 1) - ys(j)) / h(j) - h(j) * (c(j + 1) + 2.0 * c(j)) / 3.0
      d(j) = (c(j + 1) - c(j)) / (3.0 * h(j))
      j -= 1
    }
    qs.map { q =>
      // segment index: last i with xs(i) <= q, clamped to [0, n-2]
      var s = java.util.Arrays.binarySearch(xs, q)
      if (s < 0) s = -s - 2
      if (s < 0) s = 0
      if (s > n - 2) s = n - 2
      val dx = q - xs(s)
      ys(s) + b(s) * dx + c(s) * dx * dx + d(s) * dx * dx * dx
    }
  }

  /** Column form of splineEval: three array<double> columns → array<double>. */
  val splineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((xs: Seq[Double], ys: Seq[Double], qs: Seq[Double]) =>
      splineEval(xs.toArray, ys.toArray, qs.toArray).toSeq)
}
