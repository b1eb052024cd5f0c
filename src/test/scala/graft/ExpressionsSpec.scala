package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Native Catalyst vector expressions: value equivalence with the
  * composed built-in form, codegen path, SQL registration, null/edge
  * semantics. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("DotProduct/CosineSimilarity match the composed HOF form bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(16)(rnd.nextDouble() * 2 - 1),
      Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      Similarity.dot($"a", $"b").as("d"),
      Similarity.cosine($"a", $"b").as("c"),
      hofDot($"a", $"b").as("hd"),
      (hofDot($"a", $"b") / (sqrt(hofDot($"a", $"a")) * sqrt(hofDot($"b", $"b")))).as("hc"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2), "dot mismatch")
      assert(r.getDouble(1) == r.getDouble(3), "cosine mismatch")
    }
  }

  test("cosine edge semantics: zero vector -> 0.0, null input -> null, length mismatch") {
    val df = Seq(
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 2.0))),           // zero norm
      (None, Some(Seq(1.0, 2.0))),                          // null input
      (Some(Seq(3.0, 4.0)), Some(Seq(1.0, 0.0, 99.0))))    // unequal length
      .toDF("a", "b")
    val rows = df.select(Similarity.cosine($"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 0.0)
    assert(rows(1).isNullAt(0))
    // dot over common prefix (3*1), norms over FULL arrays: 5 * sqrt(1+99²)
    val want = 3.0 / (5.0 * math.sqrt(1.0 + 99.0 * 99.0))
    assert(math.abs(rows(2).getDouble(0) - want) < 1e-15)
  }

  test("graft_dot / graft_cosine are registered SQL functions (SparkSessionExtensions)") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "       graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("SQL text-function surface ≡ Scala Text API on real docs") {
    import graft.functions.Text
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
    docs.createOrReplaceTempView("__tfdocs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_normalize(text) AS n, graft_langid(text) AS l,
                graft_tokens_ws(text) AS tw, graft_tokens_bpe(text) AS tb,
                graft_stopword_ratio(text) AS sr, graft_mean_word_len(text) AS mw,
                graft_quality(text) AS q, graft_fingerprint(text) AS fp
         FROM __tfdocs""").orderBy("doc_id").collect()
    val viaApi = docs.select(col("doc_id"),
        Text.normalize(col("text")).as("n"), Text.langId(col("text")).as("l"),
        Text.tokenCountWs(col("text")).as("tw"), Text.tokenCountBpe(col("text")).as("tb"),
        Text.stopwordRatio(col("text")).as("sr"), Text.meanWordLen(col("text")).as("mw"),
        Text.qualityScore(col("text")).as("q"), Text.fingerprintMd5(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(viaSql.length == 50)
    viaSql.zip(viaApi).foreach { case (a, b) => assert(a == b) }
    spark.catalog.dropTempView("__tfdocs")
  }

  test("expression evaluates inside whole-stage codegen (no fallback)") {
    val df = spark.range(1000)
      .select(array((0 until 8).map(i => (col("id") + i).cast("double")): _*).as("v"))
      .select(Similarity.cosine($"v", $"v").as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` marks operators fused into a WholeStageCodegen stage — the
    // projection evaluating graft_cosine must carry it (no fallback)
    assert(plan.contains("*(1) Project [graft_cosine"), plan)
    // self-cosine of any non-zero vector is exactly 1 up to fp rounding
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("SortedIntersectCount: merge-count semantics, codegen, SQL registration") {
    // exact values on hand-built sorted arrays
    val r = spark.sql(
      "SELECT graft_sorted_inter(array(1L, 3L, 5L, 7L), array(3L, 4L, 5L, 9L)) AS n, " +
      "       graft_sorted_inter(array(1L, 2L), array(3L, 4L)) AS z, " +
      "       graft_sorted_inter(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS e").head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 0 && r.getInt(2) == 0)
    // agrees with array_intersect on distinct sorted inputs, inside codegen
    val df = spark.range(500).select(
      sort_array(array_distinct(array($"id" % 7, $"id" % 11, $"id" % 13))).as("a"),
      sort_array(array_distinct(array($"id" % 5, $"id" % 7, $"id" % 17))).as("b"))
    val got = df.select(
      expr("graft_sorted_inter(a, b)").as("fast"),
      size(array_intersect($"a", $"b")).as("ref"))
    assert(got.filter($"fast" =!= $"ref").count() == 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sorted_inter"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("ScalaUDF"), plan)
  }

  test("IvfAssign: matches the boxed-UDF math bit-for-bit, ties -> lowest id, codegen fused") {
    import org.apache.spark.sql.GraftColumns.{column => asCol, expression => asExpr}
    val rnd = new scala.util.Random(11)
    val dim = 8
    val seeds = Array.fill(6)(Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    def normOf(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    val norms = seeds.map(normOf)
    // the UDF this expression replaced — reference semantics
    def rankRef(x: Array[Double], nProbe: Int): Seq[Int] = {
      val nx = normOf(x)
      seeds.indices.map { c =>
        val cv = seeds(c)
        var dot = 0.0
        val n = math.min(x.length, cv.length)
        var j = 0
        while (j < n) { dot += x(j) * cv(j); j += 1 }
        val denom = nx * norms(c)
        (1.0 - (if (denom == 0.0) 0.0 else dot / denom), c + 1)
      }.sortBy(identity).take(math.min(nProbe, seeds.length)).map(_._2)
    }
    val vecs = Seq.fill(200)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) ++
      Seq(Seq.fill(dim)(0.0)) ++                 // zero vector: all cos = 0, pure id tie-break
      Seq(Seq.fill(dim)(Double.PositiveInfinity), // NaN distances: total order
        Double.NaN +: Seq.fill(dim - 1)(1.0)) ++  //   must rank them LAST (sortBy semantics)
      seeds.toSeq.map(_.toSeq)                   // exact centroid hits
    val df = vecs.toDF("v")
    for (nProbe <- Seq(1, 3, 6, 9)) {
      val expr = graft.expressions.IvfAssign(asExpr(col("v")), seeds, norms, nProbe)
      val got = df.select(asCol(expr).as("ids"))
        .collect().map(_.getSeq[Int](0).toSeq)
      val want = vecs.map(v => rankRef(v.toArray, nProbe))
      assert(got.toSeq == want, s"nProbe=$nProbe diverged from UDF semantics")
    }
    // zero vector: every cosine is 0 (zero denom), so ranking is id order
    val z = df.filter(aggregate($"v", lit(0.0), (a, x) => a + abs(x)) === 0.0)
      .select(asCol(graft.expressions.IvfAssign(asExpr(col("v")), seeds, norms, 3)))
      .head().getSeq[Int](0)
    assert(z == Seq(1, 2, 3), s"tie-break should be ascending list id: $z")
    // plan purity: fused into WholeStageCodegen, no ScalaUDF anywhere
    // (range-based input — a local Seq would constant-fold to a
    // LocalTableScan before the plan ever shows the projection)
    val planDf = spark.range(100)
      .select(array((0 until dim).map(i => (col("id") + i).cast("double")): _*).as("v"))
      .select(asCol(
        graft.expressions.IvfAssign(asExpr(col("v")), seeds, norms, 2)).as("ids"))
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_ivf_assign"), plan)
    assert(!plan.contains("ScalaUDF") && !plan.toLowerCase.contains("batchevalpython"), plan)
  }

  test("PqAssign/PqEncode: bit-identical to the pqNearest reference kernel, codegen fused") {
    import org.apache.spark.sql.GraftColumns.{column => asCol, expression => asExpr}
    import graft.functions.Similarity
    val rnd = new scala.util.Random(13)
    val m = 4; val k = 5; val dsub = 3; val dim = m * dsub
    val books = Array.fill(m, k)(Array.fill(dsub)(rnd.nextDouble() * 2 - 1))
    // duplicated codeword in subspace 0: ties must pick the LOWEST code
    books(0)(3) = books(0)(1).clone()
    val vecs = Seq.fill(200)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) ++
      Seq(Seq.fill(dim)(0.0)) ++
      Seq(books(0)(1).toSeq ++ Seq.fill(dim - dsub)(0.5)) // exact codeword hit → tie with code 3
    // PqAssign on pre-sliced sub-vectors ≡ pqNearest per (sub, slice)
    val subRows = for (v <- vecs; s <- 0 until m)
      yield (s, v.slice(s * dsub, (s + 1) * dsub))
    val subDf = subRows.toDF("sub", "sv")
    val gotAssign = subDf.select(asCol(graft.expressions.PqAssign(
        asExpr(col("sub")), asExpr(col("sv")), books)).as("code"))
      .collect().map(_.getInt(0)).toSeq
    val wantAssign = subRows.map { case (s, sv) =>
      Similarity.pqNearest(books(s), sv.toArray) }
    assert(gotAssign == wantAssign)
    // PqEncode on full vectors ≡ the sliced UDF form it replaced
    val gotEnc = vecs.toDF("v")
      .select(asCol(graft.expressions.PqEncode(asExpr(col("v")), books)).as("codes"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val wantEnc = vecs.map(v => (0 until m).map(s =>
      Similarity.pqNearest(books(s), v.slice(s * dsub, (s + 1) * dsub).toArray)).toSeq)
    assert(gotEnc == wantEnc)
    // the exact-codeword tie row picked code 1, not its duplicate 3
    assert(gotEnc.last.head == 1, gotEnc.last)
    // plan purity: fused, no ScalaUDF left in the PQ path
    val planDf = spark.range(100)
      .select(array((0 until dim).map(i => (col("id") + i).cast("double")): _*).as("v"))
      .select(asCol(graft.expressions.PqEncode(asExpr(col("v")), books)).as("codes"))
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_pq_encode"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
