package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expressions for the embedding hot path (SURVEY §2.10 /
  * custom-operator ladder rung (b)): a dot product or cosine over
  * `array<double>` pairs evaluated per candidate pair is the innermost
  * loop of similarity search and near-dup scoring. The built-in
  * composition (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` + two norm
  * passes) allocates an intermediate array and walks both inputs three
  * times per row; these expressions are one allocation-free loop, fully
  * inside whole-stage codegen (`doGenCode` below), with an interpreted
  * `nullSafeEval` twin for non-codegen paths.
  *
  * Element access uses `ArrayData.getDouble`: embedding arrays are
  * expected element-non-null (null elements read as 0-ish garbage, same
  * contract as Spark's own `list_*` vector functions).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkArrayDoublePair(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Shared input check: both children must be array<double> (call sites
    * cast float embeddings explicitly — no silent implicit cast here). */
  private[expressions] def checkArrayDoublePair(name: String, left: Expression,
                                                right: Expression): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (array<double>, array<double>) inputs, got (${l.sql}, ${r.sql})")
    }
}

/** Intersection size of two SORTED array<bigint> inputs — the innermost
  * loop of set-overlap (Jaccard) verification: every candidate pair from
  * a blocking stage funnels through this count, so at corpus scale it
  * runs orders of magnitude more often than any per-document expression.
  * A single primitive merge pass, no allocation, whole-stage-codegen'd —
  * replaces a Scala UDF whose per-row cost was dominated by boxing the
  * two Seq[Long] arguments. Inputs MUST be ascending-sorted and distinct
  * (the word-hash prep is `sort_array(array_distinct(...))`); element
  * nulls are not expected (word hashes are non-null by construction).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>) inputs, got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_inter"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements(); val lb = y.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < la && j < lb) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $la = $a.numElements();
         |final int $lb = $b.numElements();
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $la && $j < $lb) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass: dot, |a|², |b|² accumulated together;
  * 0.0 when either norm is 0 (the guarded-division convention the rest of
  * the engine uses). Arithmetic is ordered exactly like the composed form
  * it replaces — `dot / (sqrt(na) * sqrt(nb))`, sequential element sums —
  * so rounded outputs are bit-identical to the r1 oracle-checked results.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkArrayDoublePair(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // full norms: elements past the common prefix still count toward each
    // side's magnitude (matches norm(a)*norm(b) of the composed form)
    var j = n
    while (j < x.numElements()) { val v = x.getDouble(j); na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getDouble(j); nb += v * v; j += 1 }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val v = ctx.freshName("v")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double ${v}x = $a.getDouble($i);
         |  final double ${v}y = $b.getDouble($i);
         |  $dot += ${v}x * ${v}y; $na += ${v}x * ${v}x; $nb += ${v}y * ${v}y;
         |}
         |for (int $i = $n; $i < $a.numElements(); $i++) {
         |  final double ${v}a = $a.getDouble($i); $na += ${v}a * ${v}a;
         |}
         |for (int $i = $n; $i < $b.numElements(); $i++) {
         |  final double ${v}b = $b.getDouble($i); $nb += ${v}b * ${v}b;
         |}
         |final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multi-probe IVF assignment as a NATIVE expression: the `nProbe`
  * nearest seed centroids by cosine distance (ties → lowest list id),
  * as 1-based list ids in ascending-distance order — the map-side
  * assignment that runs once per vector on EVERY index build, append,
  * member scan and probe (the ingest hot path: at 100 TB this is the
  * single most-executed piece of vector math in the engine). Replaces a
  * Scala UDF whose per-row cost was dominated by boxing the
  * `Seq[Double]` argument and result; here the element loop reads
  * `ArrayData` directly and the generated code calls the compiled
  * kernel through a bound reference — no conversion, no iterator break,
  * whole-stage codegen keeps fusing the surrounding projection.
  *
  * Math is ORDER-IDENTICAL to the UDF it replaces (dot over the common
  * prefix, full query norm, cosine = 0 on zero denom, dist = 1 - cos,
  * lexicographic (dist, id) ranking): every hash-gated ANN query must
  * stay bit-identical across the swap. The centroid table rides along
  * as a bound literal (driver-sized: nLists × dim), exactly like the
  * broadcast the UDF closed over.
  */
case class IvfAssign(child: Expression, seeds: Array[Array[Double]],
                     seedNorms: Array[Double], nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(seeds.nonEmpty && seeds.length == seedNorms.length && nProbe >= 1,
    "IvfAssign needs non-empty centroids and nProbe >= 1")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_assign"

  /** The compiled kernel, shared by interpreted eval and codegen. */
  def assign(v: ArrayData): ArrayData = {
    val len = v.numElements()
    var nx = 0.0
    var i = 0
    while (i < len) { val x = v.getDouble(i); nx += x * x; i += 1 }
    nx = math.sqrt(nx)
    val m = math.min(nProbe, seeds.length)
    val bestD = new Array[Double](m)
    val bestId = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < seeds.length) {
      val cv = seeds(c)
      var dot = 0.0
      val n = math.min(len, cv.length)
      var j = 0
      while (j < n) { dot += v.getDouble(j) * cv(j); j += 1 }
      val denom = nx * seedNorms(c)
      val cos = if (denom == 0.0) 0.0 else dot / denom
      val d = 1.0 - cos
      // insertion into the sorted top-m. Candidates scan in ascending id
      // and the shift comparison is STRICT, so on equal distance the
      // earlier (lower) id stays ahead and a boundary tie never evicts —
      // identical to sortBy((dist, 1-based id)).take(m). Comparisons go
      // through Double.compare, the TOTAL order Scala's sortBy uses:
      // primitive </> are always false against NaN, which would let a
      // NaN distance (cos of an Inf/NaN vector) squat in a top-m slot
      // and corrupt the ordering; under total order NaN ranks greater
      // than +Infinity, exactly as the replaced UDF ranked it.
      if (filled < m) {
        var pos = filled
        while (pos > 0 && java.lang.Double.compare(bestD(pos - 1), d) > 0) {
          bestD(pos) = bestD(pos - 1); bestId(pos) = bestId(pos - 1); pos -= 1
        }
        bestD(pos) = d; bestId(pos) = c + 1
        filled += 1
      } else if (java.lang.Double.compare(d, bestD(m - 1)) < 0) {
        var pos = m - 1
        while (pos > 0 && java.lang.Double.compare(bestD(pos - 1), d) > 0) {
          bestD(pos) = bestD(pos - 1); bestId(pos) = bestId(pos - 1); pos -= 1
        }
        bestD(pos) = d; bestId(pos) = c + 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestId)
  }

  override protected def nullSafeEval(a: Any): Any =
    assign(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfAssign", this, classOf[IvfAssign].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.assign($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization code assignment as a NATIVE expression — the
  * squared-L2 argmin of a sub-vector over its subspace codebook (ties →
  * lowest code), the map-side kernel of every [[graft.functions.Similarity.pqTrain]]
  * Lloyd step and of PQ encoding at index-build time. Replaces the boxed
  * `udf((sub, sv) => pqNearest(...))` whose per-row cost was dominated by
  * materializing `Seq[Double]` (the same shape [[IvfAssign]] eliminated
  * for IVF assignment): here the distance loop reads `ArrayData`
  * directly and whole-stage codegen keeps the surrounding projection
  * fused. Math is ORDER-IDENTICAL to the replaced `pqNearest` — strict
  * `<` comparison seeded at Double.MaxValue, first-best-wins on ties —
  * so trained codebooks (and every s8/s9 hash gate downstream) are
  * bit-identical across the swap. The full m-subspace codebook rides
  * along as a bound literal (m·k·(dim/m) doubles — one vector's worth
  * per codeword, driver-sized like the broadcast the UDF closed over).
  */
case class PqAssign(left: Expression, right: Expression,
                    books: Array[Array[Array[Double]]])
    extends BinaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "PqAssign needs a non-empty codebook per subspace")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int subspace, array<double> sub-vector), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_assign"

  /** The compiled kernel, shared by interpreted eval and codegen. */
  def assign(sub: Int, sv: ArrayData): Int = {
    val book = books(sub)
    val len = sv.numElements()
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < book.length) {
      val cv = book(c); var d = 0.0; var i = 0
      val n = math.min(cv.length, len)
      while (i < n) { val t = sv.getDouble(i) - cv(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    assign(a.asInstanceOf[Int], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAssign", this, classOf[PqAssign].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ref.assign($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Full PQ encoding as ONE native expression: all `m` sub-codes of a
  * vector (`array<int>`, values in [0, k)) in a single pass — no
  * per-subspace `slice` allocation, no boxed `Seq[Double]`. This is the
  * PQ twin of [[IvfAssign]] for the ENCODE hot path: at index-build
  * time every corpus vector runs through it exactly once, so at 100 TB
  * it is the most-executed PQ kernel in the engine. Per subspace the
  * distance loop is the same strict-`<`/Double.MaxValue argmin as
  * [[PqAssign]] (ties → lowest code), reading the sub-vector in place
  * via an element offset — bit-identical codes to the sliced UDF form
  * it replaces (s8/s9 hash gates must not move). */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "PqEncode needs a non-empty codebook per subspace")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  /** The compiled kernel, shared by interpreted eval and codegen. */
  def encode(v: ArrayData): ArrayData = {
    val m = books.length
    val dsub = books(0)(0).length
    val len = v.numElements()
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * dsub
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < book.length) {
        val cv = book(c); var d = 0.0; var i = 0
        // matches slice-then-argmin: the slice clamps at the vector end,
        // so the comparison loop runs over min(dsub, len - off) elements
        val n = math.min(cv.length, math.max(0, len - off))
        while (i < n) { val t = v.getDouble(off + i) - cv(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
