package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interpolation operators — the reference fits models per group and
  * evaluates them over sweep grids:
  *
  *   - piecewise-linear `np.interp` over list columns
  *     (aave_data/assets/protocol/protocol_data_warehouse.py:377-384);
  *   - cubic spline fit + eval per day group (scipy default not-a-knot BC)
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

  /** Cubic spline: fit on knots (xs, ys), evaluate at qs. `bcType` selects
    * the boundary condition:
    *
    *   - `"not-a-knot"` (default) — third-derivative continuity at the
    *     second and second-to-last knots, matching scipy
    *     `CubicSpline(x, y)`'s default `bc_type='not-a-knot'` (the variant
    *     the reference uses in protocol_data_warehouse.py:537-564). With 3
    *     knots this degenerates (both conditions coincide), so — like
    *     scipy — a single parabola through the 3 points is returned.
    *   - `"natural"` — second derivative = 0 at both ends
    *     (`bc_type='natural'`).
    *
    * Evaluation outside the knot range extrapolates with the boundary
    * cubic (scipy's `extrapolate=True` default) — this matters: the
    * shortfall sweep grid reaches 5e8, far past the fitted curve's knots,
    * where the boundary condition dominates the result.
    */
  def splineEval(xs: Array[Double], ys: Array[Double], qs: Array[Double],
                 bcType: String = "not-a-knot"): Array[Double] = {
    val n = xs.length
    require(n >= 2, "spline needs >= 2 knots")
    if (n == 2) return qs.map { q =>
      val t = (q - xs(0)) / (xs(1) - xs(0))
      ys(0) + t * (ys(1) - ys(0))
    }
    if (n == 3 && bcType == "not-a-knot") {
      // scipy: 3 knots + not-a-knot = the unique parabola through the points
      val (x0, x1, x2) = (xs(0), xs(1), xs(2))
      return qs.map { q =>
        ys(0) * (q - x1) * (q - x2) / ((x0 - x1) * (x0 - x2)) +
        ys(1) * (q - x0) * (q - x2) / ((x1 - x0) * (x1 - x2)) +
        ys(2) * (q - x0) * (q - x1) / ((x2 - x0) * (x2 - x1))
      }
    }
    val h = Array.tabulate(n - 1)(i => xs(i + 1) - xs(i))
    // Solve A*m = r for second derivatives m(0..n-1). Interior rows are the
    // standard continuity equations; the first/last rows encode the boundary
    // condition. Dense Gaussian elimination with partial pivoting — groups
    // are tiny (≤ sweep-grid size, ~100 knots), so O(n³) per group is noise
    // next to the shuffle that built the group.
    val a = Array.fill(n, n)(0.0)
    val r = new Array[Double](n)
    var i = 1
    while (i < n - 1) {
      a(i)(i - 1) = h(i - 1)
      a(i)(i) = 2.0 * (h(i - 1) + h(i))
      a(i)(i + 1) = h(i)
      r(i) = 6.0 * ((ys(i + 1) - ys(i)) / h(i) - (ys(i) - ys(i - 1)) / h(i - 1))
      i += 1
    }
    bcType match {
      case "natural" =>
        a(0)(0) = 1.0; r(0) = 0.0
        a(n - 1)(n - 1) = 1.0; r(n - 1) = 0.0
      case "not-a-knot" =>
        // d''' continuous at x1:  h1*(m1-m0) = h0*(m2-m1)
        a(0)(0) = -h(1); a(0)(1) = h(0) + h(1); a(0)(2) = -h(0); r(0) = 0.0
        // d''' continuous at x_{n-2}:  h_{n-2}*(m_{n-2}-m_{n-3}) = h_{n-3}*(m_{n-1}-m_{n-2})
        a(n - 1)(n - 3) = -h(n - 2)
        a(n - 1)(n - 2) = h(n - 3) + h(n - 2)
        a(n - 1)(n - 1) = -h(n - 3)
        r(n - 1) = 0.0
      case other => throw new IllegalArgumentException(s"unknown bcType: $other")
    }
    val m = solveDense(a, r)
    val c = Array.tabulate(n)(k => m(k) / 2.0)
    val b = Array.tabulate(n - 1)(k =>
      (ys(k + 1) - ys(k)) / h(k) - h(k) * (m(k + 1) + 2.0 * m(k)) / 6.0)
    val d = Array.tabulate(n - 1)(k => (m(k + 1) - m(k)) / (6.0 * h(k)))
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

  /** In-place Gaussian elimination with partial pivoting; mutates `a`/`r`. */
  private def solveDense(a: Array[Array[Double]], r: Array[Double]): Array[Double] = {
    val n = r.length
    var col = 0
    while (col < n) {
      var p = col
      var row = col + 1
      while (row < n) { if (math.abs(a(row)(col)) > math.abs(a(p)(col))) p = row; row += 1 }
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
                      val tr = r(p); r(p) = r(col); r(col) = tr }
      require(a(col)(col) != 0.0, "singular spline system (duplicate knots?)")
      row = col + 1
      while (row < n) {
        val f = a(row)(col) / a(col)(col)
        if (f != 0.0) {
          var k = col
          while (k < n) { a(row)(k) -= f * a(col)(k); k += 1 }
          r(row) -= f * r(col)
        }
        row += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var row = n - 1
    while (row >= 0) {
      var s = r(row)
      var k = row + 1
      while (k < n) { s -= a(row)(k) * x(k); k += 1 }
      x(row) = s / a(row)(row)
      row -= 1
    }
    x
  }

  /** Column form of splineEval: three array<double> columns → array<double>.
    * Not-a-knot boundary (the scipy default the reference relies on). */
  val splineUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((xs: Seq[Double], ys: Seq[Double], qs: Seq[Double]) =>
      splineEval(xs.toArray, ys.toArray, qs.toArray).toSeq)
}
