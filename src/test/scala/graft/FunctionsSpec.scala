package graft

import org.apache.spark.sql.functions._
import graft.functions.{Abi, Finance, Interp, Text}

/** Golden-value tests for the scalar function families — the ScalaTest twin
  * of the reference's helper unit tests (tests/test_helpers.py idiom).
  */
class AbiSpec extends SparkSpec {
  import spark.implicits._

  test("decodeUint256 roundtrips small and large values") {
    // 1 ETH = 10^18 wei and a uint128-scale value — both beyond exact Long
    // path would overflow naive conv(); reference stores uint256 as float64
    // (helpers.py:228-229) so Double equality semantics match.
    val blobs = Seq(
      "0x" + "0" * 63 + "1",                                    // 1
      "0x" + "0" * 49 + "de0b6b3a7640000",                      // 1e18
      "0x" + "0" * 32 + "ffffffffffffffffffffffffffffffff")     // 2^128-1
    val df = blobs.toDF("blob").select(Abi.decodeUint256($"blob").as("v"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(got(1) == 1e18)
    assert(math.abs(got(2) - math.pow(2, 128)) / math.pow(2, 128) < 1e-12)
  }

  test("decodeAddress extracts low 20 bytes lowercase") {
    val blob = "0x" + "0" * 24 + "C02AAA39B223FE8D0A0E5C4F27EAD9083C756CC2"
    val got = Seq(blob).toDF("blob")
      .select(Abi.decodeAddress(lower($"blob"))).head.getString(0)
    assert(got == "0xc02aaa39b223fe8d0a0e5c4f27ead9083c756cc2")
  }

  test("decodeScaled divides by 10^decimals") {
    val blob = "0x" + "0" * 49 + "de0b6b3a7640000" // 1e18
    val got = Seq(blob).toDF("blob")
      .select(Abi.decodeScaled($"blob", 0, lit(18))).head.getDouble(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
}

class FinanceSpec extends SparkSpec {
  import spark.implicits._

  test("apyCompounded matches (1+r/n)^n - 1") {
    val got = Seq(0.05).toDF("r")
      .select(Finance.apyCompounded($"r", lit(365.0))).head.getDouble(0)
    assert(math.abs(got - (math.pow(1 + 0.05 / 365, 365) - 1)) < 1e-15)
  }

  test("vestedAmount clamps to [0, deposit]") {
    val df = Seq((0.0, 10.0, 20.0, 100.0), (15.0, 10.0, 20.0, 100.0),
                 (25.0, 10.0, 20.0, 100.0)).toDF("t", "start", "stop", "dep")
    val got = df.select(Finance.vestedAmount($"t", $"start", $"stop", $"dep"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 50.0, 100.0))
  }
}

class InterpSpec extends SparkSpec {
  import spark.implicits._

  test("splineEval passes through all knots exactly") {
    val xs = Array(0.0, 1.0, 2.5, 4.0, 7.0)
    val ys = Array(1.0, 3.0, 2.0, 5.0, 4.0)
    val got = Interp.splineEval(xs, ys, xs)
    xs.indices.foreach(i => assert(math.abs(got(i) - ys(i)) < 1e-12,
      s"knot $i: ${got(i)} vs ${ys(i)}"))
  }

  test("splineEval on linear data reproduces the line") {
    val xs = Array(0.0, 1.0, 2.0, 3.0)
    val ys = xs.map(2.0 * _ + 1.0)
    val qs = Array(0.5, 1.5, 2.7)
    val got = Interp.splineEval(xs, ys, qs)
    qs.indices.foreach(i => assert(math.abs(got(i) - (2.0 * qs(i) + 1.0)) < 1e-10))
  }

  test("splineEval natural boundary: second derivative ~0 at ends") {
    val xs = (0 to 10).map(_.toDouble).toArray
    val ys = xs.map(x => math.sin(x))
    val h = 1e-4
    val ends = Seq(xs.head + h, xs.last - h)
    val d2 = ends.map { x =>
      val Array(a, b, c) = Interp.splineEval(xs, ys, Array(x - h, x, x + h), "natural")
      (a - 2 * b + c) / (h * h)
    }
    d2.foreach(v => assert(math.abs(v) < 1e-2, s"d2=$v"))
  }

  test("not-a-knot spline reproduces any single cubic exactly, incl. extrapolation") {
    // A not-a-knot spline through >= 4 samples of one cubic IS that cubic
    // (natural BC would flatten the ends) — scipy CubicSpline's default.
    def f(x: Double) = 2.0 * x * x * x - 3.0 * x * x + 0.5 * x - 5.0
    val xs = Array(0.0, 1.0, 2.5, 4.0, 7.0, 9.0)
    val ys = xs.map(f)
    val qs = Array(-3.0, 0.4, 3.3, 6.9, 15.0, 500.0) // inside + far extrapolation
    val got = Interp.splineEval(xs, ys, qs)
    qs.indices.foreach { i =>
      val want = f(qs(i))
      assert(math.abs(got(i) - want) <= 1e-8 * math.max(1.0, math.abs(want)),
        s"q=${qs(i)}: ${got(i)} vs $want")
    }
  }

  test("not-a-knot spline with 3 knots is the parabola through them (scipy degenerate case)") {
    def f(x: Double) = 1.5 * x * x - 2.0 * x + 3.0
    val xs = Array(0.0, 2.0, 5.0)
    val got = Interp.splineEval(xs, xs.map(f), Array(1.0, 4.0, -2.0, 10.0))
    Array(1.0, 4.0, -2.0, 10.0).zip(got).foreach { case (q, g) =>
      assert(math.abs(g - f(q)) < 1e-10, s"q=$q: $g vs ${f(q)}")
    }
  }

  test("not-a-knot spline passes through irregular knots exactly") {
    val xs = Array(0.0, 1.0, 2.5, 4.0, 7.0)
    val ys = Array(1.0, 3.0, 2.0, 5.0, 4.0)
    val got = Interp.splineEval(xs, ys, xs)
    xs.indices.foreach(i => assert(math.abs(got(i) - ys(i)) < 1e-10))
  }

  test("linearInterp matches np.interp semantics incl. clamping") {
    val df = Seq(1).toDF("i").select(
      Interp.linearInterp(
        array(lit(-1.0), lit(0.5), lit(1.5), lit(3.0), lit(99.0)),
        array(lit(0.0), lit(1.0), lit(2.0)),
        array(lit(10.0), lit(20.0), lit(40.0))).as("v"))
    val got = df.head.getSeq[Double](0)
    assert(got == Seq(10.0, 15.0, 30.0, 40.0, 40.0))
  }
}

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("packSequences: start-based greedy packing per group") {
    // budget 10, tokens 4 each: start offsets 0,4,8,12 -> packs 0,0,0,1
    val df = Seq(("a", 1L, 4L), ("a", 2L, 4L), ("a", 3L, 4L), ("a", 4L, 4L),
                 ("b", 1L, 25L), ("b", 2L, 1L)) // oversized doc starts pack 0; next starts pack 2
      .toDF("lang", "doc_id", "n_tokens")
    val got = Text.packSequences(df, "lang", "doc_id", "n_tokens", budget = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got(("a", 1L)) == 0L && got(("a", 2L)) == 0L && got(("a", 3L)) == 0L)
    assert(got(("a", 4L)) == 1L)
    assert(got(("b", 1L)) == 0L && got(("b", 2L)) == 2L)
  }

  test("packSequencesScalable matches the window form on random multi-partition input") {
    val rnd = new scala.util.Random(42)
    val rows = for (g <- Seq("a", "b", "c"); i <- 1L to 200L)
      yield (g, i, rnd.nextInt(30).toLong + 1L)
    val df = rows.toDF("lang", "doc_id", "n_tokens").repartition(7)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.select($"lang", $"doc_id", $"pack_id")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val windowed = asMap(Text.packSequences(df, "lang", "doc_id", "n_tokens", 100L))
    // more partitions than groups — the point of the scalable form
    val scanned = asMap(Text.packSequencesScalable(df, "lang", "doc_id", "n_tokens", 100L,
      numPartitions = 11))
    assert(scanned == windowed)
    assert(scanned.values.max > 10, "packing actually advanced across partitions")
  }

  test("packSequencesAuto: many-group seam — forms agree, routing picks the right one") {
    val rnd = new scala.util.Random(7)
    // MANY groups (500, far above the probe threshold), few rows each —
    // the adversarial shape for the prefix-scan form's offset collect
    val rows = for (g <- 1 to 500; i <- 1L to 4L)
      yield (s"g$g", i, rnd.nextInt(30).toLong + 1L)
    val df = rows.toDF("lang", "doc_id", "n_tokens").repartition(13)
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.select($"lang", $"doc_id", $"pack_id")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val windowed = asMap(Text.packSequences(df, "lang", "doc_id", "n_tokens", 10L))
    // the seam: scalable ≡ window on the many-group frame too
    val scanned = asMap(Text.packSequencesScalable(df, "lang", "doc_id", "n_tokens", 10L,
      numPartitions = 13))
    assert(scanned == windowed)
    // auto routes many-groups to the WINDOW form (observable: plan has a
    // Window node; the prefix-scan form is an RDD scan with none)...
    val manyAuto = Text.packSequencesAuto(df, "lang", "doc_id", "n_tokens", 10L,
      groupThreshold = 64)
    assert(manyAuto.queryExecution.executedPlan.toString.contains("Window"),
      "many groups should route to the window form")
    assert(asMap(manyAuto) == windowed)
    // ...and few-groups to the prefix-scan form
    val few = rows.filter(_._1.stripPrefix("g").toInt <= 3)
      .toDF("lang", "doc_id", "n_tokens").repartition(13)
    val fewAuto = Text.packSequencesAuto(few, "lang", "doc_id", "n_tokens", 10L,
      groupThreshold = 64)
    assert(!fewAuto.queryExecution.executedPlan.toString.contains("Window"),
      "few groups should route to the prefix-scan form")
    assert(asMap(fewAuto) == asMap(Text.packSequences(few, "lang", "doc_id", "n_tokens", 10L)))
  }

  test("bm25TopK: hand-computed Okapi scores, rank order, tie-break") {
    // corpus: d1 "cat dog cat" (dl 3), d2 "dog fish" (dl 2),
    // d3 "bird bird bird fish" (dl 4); query {cat, fish}; N=3, avgdl=3.
    // idf(cat)=ln(1+2.5/1.5), idf(fish)=ln(1+1.5/2.5); k1=1.2, b=0.75.
    val docs = Seq((1L, "cat dog cat"), (2L, "dog fish"),
                   (3L, "bird bird bird fish")).toDF("doc_id", "text")
    val got = Text.bm25TopK(docs, "text", "doc_id",
        Seq("cat", "fish"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, 1.34864, 1L, 1),    // ln(8/3)*2*2.2/(2+1.2*1.0)
      (2L, 0.544215, 1L, 2),   // ln(1.6)*2.2/(1+1.2*0.75)
      (3L, 0.413603, 1L, 3)))  // ln(1.6)*2.2/(1+1.2*1.25)
    // doc without any query term never appears
    assert(!got.exists(_._1 == 4L))
    // k truncates: top-1 only keeps the best-scoring doc
    val top1 = Text.bm25TopK(docs, "text", "doc_id", Seq("cat", "fish"), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top1 == Seq(1L))
    // multi-term doc accumulates: query {dog, fish} hits d2 on both terms
    val both = Text.bm25TopK(docs, "text", "doc_id", Seq("dog", "fish"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(both(2L) == 2L && both(1L) == 1L && both(3L) == 1L)
  }

  test("hybridRerank: cosine lifts a lexically-worse candidate; alpha extremes collapse to each signal") {
    import graft.functions.Similarity
    // d1 dominates lexically (score 4 vs 1) but is orthogonal to the
    // query vector; d2 is weak lexically but aligned.
    val cands = Seq((1L, 4.0), (2L, 1.0)).toDF("doc_id", "score")
    val emb = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 0.0)), (9L, Seq(1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val q = Seq(1.0, 0.0)
    def ranks(alpha: Double): Seq[Long] =
      Similarity.hybridRerank(cands, "score", "doc_id", emb, "vec_id",
        "embedding", q, k = 10, alpha = alpha)
        .orderBy($"rank").collect().map(_.getLong(0)).toSeq
    // blended: d1 = 0.5*1 + 0.5*0 = 0.5; d2 = 0.5*0.25 + 0.5*1 = 0.625
    assert(ranks(0.5) == Seq(2L, 1L))
    // pure lexical (alpha 1): candidate order wins
    assert(ranks(1.0) == Seq(1L, 2L))
    // pure vector (alpha 0): cosine wins
    assert(ranks(0.0) == Seq(2L, 1L))
    // candidates without an embedding row are dropped; non-candidates never appear
    assert(!ranks(0.5).contains(9L))
    val got = Similarity.hybridRerank(cands, "score", "doc_id", emb, "vec_id",
      "embedding", q, k = 10, alpha = 0.5).collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(3))).toSeq ==
      Seq((2L, 0.625), (1L, 0.5)))
  }

  test("hybridRerank: non-positive max score fails loudly instead of NULLing/inverting the blend") {
    import graft.functions.Similarity
    val emb = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    for (bad <- Seq(Seq((1L, 0.0), (2L, 0.0)), Seq((1L, -2.0), (2L, -1.0)))) {
      val ex = intercept[Exception] {
        Similarity.hybridRerank(bad.toDF("doc_id", "score"), "score", "doc_id",
          emb, "vec_id", "embedding", Seq(1.0, 0.0), k = 5).collect()
      }
      assert(ex.getMessage.contains("must be > 0"), s"got: ${ex.getMessage}")
    }
    // empty candidate frame stays an empty result, not an error
    val empty = Similarity.hybridRerank(
      Seq.empty[(Long, Double)].toDF("doc_id", "score"), "score", "doc_id",
      emb, "vec_id", "embedding", Seq(1.0, 0.0), k = 5)
    assert(empty.count() == 0L)
  }

  test("hashSampleFilter: deterministic, partition-invariant, ~rate fraction") {
    val ids = (1L to 2000L).toDF("id")
    val kept = ids.filter(Text.hashSampleFilter($"id", 0.125))
      .as[Long].collect().toSet
    // repeatable under different partitioning
    val kept2 = ids.repartition(7).filter(Text.hashSampleFilter($"id", 0.125))
      .as[Long].collect().toSet
    assert(kept == kept2)
    assert(kept.size > 150 && kept.size < 350, s"got ${kept.size} of 2000")
  }

  test("deterministicSplit: group-coherent, ~declared fractions, stable under growth") {
    val docs = (1L to 4000L).map(i => (i, s"grp${i % 1000}")).toDF("id", "grp")
    val fracs = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val split = docs.withColumn("s", Text.deterministicSplit($"grp", fracs))
    // leakage-safety is structural: every group maps to exactly one split
    val perGroup = split.groupBy($"grp")
      .agg(countDistinct($"s").as("n")).agg(max($"n")).as[Long].head()
    assert(perGroup == 1L)
    // fractions land near declared (md5 is uniform; 1000 groups, ±5% abs)
    val shares = split.groupBy($"s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    assert(math.abs(shares("train") - 0.8) < 0.05, shares.toString)
    assert(math.abs(shares("val") - 0.1) < 0.05, shares.toString)
    // growth-stability: a doc's split never changes when the corpus doubles
    val first = split.filter($"id" <= 2000).select($"id", $"s")
    val rerun = docs.filter($"id" <= 2000)
      .withColumn("s2", Text.deterministicSplit($"grp", fracs))
    assert(first.join(rerun, "id").filter($"s" =!= $"s2").count() == 0)
  }

  test("deterministicSplit rejects bad fractions") {
    assertThrows[IllegalArgumentException](
      Text.deterministicSplit($"g", Seq(("a", 0.5), ("b", 0.4))))
    assertThrows[IllegalArgumentException](
      Text.deterministicSplit($"g", Seq(("a", 1.5), ("b", -0.5))))
    // sub-1/65536 split would be silently empty -> rejected, like
    // hashSampleFilter's representability rule
    assertThrows[IllegalArgumentException](
      Text.deterministicSplit($"g",
        Seq(("a", 1e-5), ("b", 1e-5), ("c", 1 - 2e-5))))
  }

  test("deterministicSplit fails loudly on NULL group keys (no silent last-split dump)") {
    val docs = Seq((1L, "k1"), (2L, null.asInstanceOf[String]))
      .toDF("id", "grp")
    val ex = intercept[Exception] {
      docs.withColumn("s", Text.deterministicSplit($"grp",
        Seq(("train", 0.5), ("test", 0.5)))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("leakage-safe")), msgs(ex).toString)
  }

  test("bpeTrain: textbook merge trace on the low/lower/lowest corpus") {
    // words: low×3, lower×1, lowest×1. Pair counts: (l,o)=5, (o,w)=5,
    // (w,e)=2, (e,r)=1, (e,s)=1, (s,t)=1 — first merge is the (freq desc,
    // left asc) tie-break (l,o); then (lo,w)=5, (low,e)=2, and at freq 1
    // the (lowe,r)/(lowe,s) tie resolves right-asc to (lowe,r).
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val got = Text.bpeTrain(docs, "text", merges = 4)
      .orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L),
      (3, "low", "e", 2L), (4, "lowe", "r", 1L)), got.toString)
  }

  test("bpeEncode replays trained merges; encoding the training corpus matches the trace") {
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val merges = Text.bpeTrain(docs, "text", merges = 4)
      .orderBy("rank").select($"left", $"right").as[(String, String)].collect().toSeq
    val toks = docs.select(Text.bpeEncode($"text", merges).as("t"))
      .as[Seq[String]].collect().toSeq
    // after (l,o)(lo,w)(low,e)(lowe,r): low→[low], lower→[lower],
    // lowest→[lowe,s,t]
    assert(toks == Seq(
      Seq("low", "low", "low"), Seq("lower", "lowe", "s", "t")), toks.toString)
    // zero merges = plain character tokenization
    val chars = docs.select(Text.bpeEncode($"text", Nil).as("t"))
      .as[Seq[String]].head()
    assert(chars == "lowlowlow".map(_.toString))
    // NULL text encodes to an empty token array, not an NPE
    val n = Seq(Option.empty[String], Some("low")).toDF("text")
      .select(Text.bpeEncode($"text", merges).as("t"))
      .as[Seq[String]].collect().toSeq
    assert(n == Seq(Seq.empty, Seq("low")))
  }

  test("bpeTrain: stops early when no pairs remain; merges must be positive") {
    val singles = Seq("a b a b", "c a").toDF("text")
    assert(Text.bpeTrain(singles, "text", merges = 3).count() == 0L)
    assertThrows[IllegalArgumentException](Text.bpeTrain(singles, "text", 0))
  }

  test("psiByCategory: NULL category on both sides is ONE matched row, not drift") {
    import graft.functions.Stats
    val mix = Seq(Some("en"), Some("en"), None, None).map(Tuple1(_)).toDF("lang")
    val rows = Stats.psiByCategory(mix, mix, "lang").collect()
    assert(rows.length == 2, rows.mkString(";"))
    val total = rows.map(r => math.abs(r.getDouble(5))).sum
    assert(total < 1e-12, s"identical mixes incl. NULL must give PSI 0, got $total")
  }

  test("psiByCategory: identical mixes give ~0, a known shift gives the closed form") {
    import graft.functions.Stats
    val ref = Seq.fill(60)("en").map(Tuple1(_)).toDF("lang")
      .union(Seq.fill(40)("fr").map(Tuple1(_)).toDF("lang"))
    val same = Stats.psiByCategory(ref, ref, "lang")
      .agg(sum(abs(col("psi_contrib")))).as[Double].head()
    assert(same < 1e-12, s"identical mixes must give PSI 0, got $same")
    // shifted candidate: en 80 / fr 20 vs ref 60/40 — closed-form check
    val cand = Seq.fill(80)("en").map(Tuple1(_)).toDF("lang")
      .union(Seq.fill(20)("fr").map(Tuple1(_)).toDF("lang"))
    val got = Stats.psiByCategory(ref, cand, "lang")
      .select(col("lang"), col("psi_contrib")).as[(String, Double)]
      .collect().toMap
    def share(n: Long) = (n + 0.5) / (100.0 + 0.5 * 2)
    def contrib(r: Long, c: Long) =
      (share(c) - share(r)) * math.log(share(c) / share(r))
    assert(math.abs(got("en") - contrib(60, 80)) < 1e-12)
    assert(math.abs(got("fr") - contrib(40, 20)) < 1e-12)
  }

  test("psiByCategory: one-sided category stays finite via smoothing") {
    import graft.functions.Stats
    val ref = Seq("en", "en", "fr").map(Tuple1(_)).toDF("lang")
    val cand = Seq("en", "de").map(Tuple1(_)).toDF("lang")  // fr missing, de new
    val rows = Stats.psiByCategory(ref, cand, "lang").collect()
    assert(rows.length == 3)
    assert(rows.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
  }

  test("hashSampleFilter edge rates: 1.0 keeps all, sub-resolution rejected") {
    val ids = (1L to 500L).toDF("id")
    // rate = 1 must keep EVERY row (the old 2-hex-char cut clamped to "ff"
    // and silently dropped the ff bucket)
    assert(ids.filter(Text.hashSampleFilter($"id", 1.0)).count() == 500L)
    // a rate below 1/256 is representable now (4 hex chars of resolution)
    val tiny = ids.filter(Text.hashSampleFilter($"id", 1.0 / 1024)).count()
    assert(tiny < 10, s"~0.1% of 500 expected, got $tiny")
    // below the 1/65536 floor the predicate cannot represent the rate
    assertThrows[IllegalArgumentException](Text.hashSampleFilter($"id", 1e-6))
  }

  test("hashSampleCapFilter: keep-all at or under cap, ~cap slice above, nested slices") {
    val ids = (1L to 10000L).toDF("id")
    // n <= target: the slice IS the corpus
    assert(ids.filter(Text.hashSampleCapFilter($"id", 10000L, 10000L)).count() == 10000L)
    assert(ids.filter(Text.hashSampleCapFilter($"id", 10000L, 20000L)).count() == 10000L)
    // n > target: expected slice size ~= target (floor+1 keeps it >= target
    // in expectation), independent of how much bigger n gets
    val k2 = ids.filter(Text.hashSampleCapFilter($"id", 10000L, 2000L))
      .as[Long].collect().toSet
    assert(k2.size > 1600 && k2.size < 2500, s"got ${k2.size} of 10000, want ~2000")
    // determinism + monotone nesting: a smaller cap's slice is contained in
    // a larger cap's (cuts are prefixes of the same md5 ordering) — the
    // property that makes incremental re-verification stable across SFs
    val k500 = ids.filter(Text.hashSampleCapFilter($"id", 10000L, 500L))
      .as[Long].collect().toSet
    assert(k500.subsetOf(k2), "smaller cap slice must nest inside larger")
    // stable under repartitioning (pure function of the id)
    val k2b = ids.repartition(13).filter(Text.hashSampleCapFilter($"id", 10000L, 2000L))
      .as[Long].collect().toSet
    assert(k2 == k2b)
  }

  test("token counts") {
    val df = Seq("Hello, world! 42 times").toDF("t")
    val r = df.select(
      Text.tokenCountWs($"t"), Text.tokenCountBpe($"t")).head
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 times -> 6 BPE-ish pieces
    assert(r.getInt(1) == 6)
  }

  test("normalize strips punctuation and collapses whitespace") {
    val got = Seq("  The QUICK—brown,   fox!! ").toDF("t")
      .select(Text.normalize($"t")).head.getString(0)
    assert(got == "the quick brown fox")
  }

  test("stopwordRatio and punctRatio on known string") {
    val r = Seq("the cat is on a mat").toDF("t")
      .select(Text.stopwordRatio($"t"), Text.punctRatio($"t")).head
    // stopwords: the, is, on, a -> 4/6
    assert(math.abs(r.getDouble(0) - 4.0 / 6.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("langId votes markers with deterministic priority") {
    val df = Seq(
      "the cat and the dog is that for with",
      "le chat est dans la maison pour que",
      "el gato es una para como por del",
      "xyzzy qwerty").toDF("t")
    val got = df.select(Text.langId($"t")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "fr", "es", "und"))
  }

  test("fingerprintMd5 is stable under formatting noise") {
    val df = Seq(("a", "Hello,  World!"), ("b", "hello world")).toDF("id", "t")
    val fps = df.select(Text.fingerprintMd5($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("stratified hash sampling: per-stratum predicates compose, rates hold") {
    val docs = Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val keep = when($"lang" === "en", Text.hashSampleFilter($"doc_id", 0.5))
      .otherwise(Text.hashSampleFilter($"doc_id", 0.125))
    val sampled = docs.filter(keep)
    val enTotal = docs.filter($"lang" === "en").count().toDouble
    val enKept = sampled.filter($"lang" === "en").count().toDouble
    val otherTotal = docs.filter($"lang" =!= "en").count().toDouble
    val otherKept = sampled.filter($"lang" =!= "en").count().toDouble
    assert(math.abs(enKept / enTotal - 0.5) < 0.15, s"en rate ${enKept / enTotal}")
    assert(math.abs(otherKept / otherTotal - 0.125) < 0.1,
      s"other rate ${otherKept / otherTotal}")
    // determinism: same predicate, different partitioning, same ids
    val again = docs.repartition(7).filter(keep)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select($"doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tf-idf top terms on a handcrafted corpus") {
    // 3 docs; "apple" only in doc 0 -> idf ln(3), "common" in all -> idf 0
    val docs = Seq(
      (0L, "apple apple common"),
      (1L, "banana common"),
      (2L, "cherry common")).toDF("doc_id", "text")
    val tf = docs
      .select($"doc_id", explode(split(Text.normalize($"text"), " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", round($"tf" * log($"n_docs" / $"df"), 6))
    val top = scored.filter($"doc_id" === 0)
      .orderBy($"score".desc, $"term".asc).collect()
    assert(top.head.getAs[String]("term") == "apple")
    assert(math.abs(top.head.getAs[Double]("score") - 2 * math.log(3.0)) < 1e-5)
    val common = scored.filter($"term" === "common").select($"score").collect()
    assert(common.forall(_.getDouble(0) == 0.0), "df == N terms carry zero weight")
  }

  test("winnowFingerprints: density bound, shared-substring guarantee, edge sizes") {
    import graft.functions.Text
    val k = 5; val w = 4
    val shared = "jumps over the lazy dog" // 23 chars >= w + k - 1
    val s1 = s"the quick brown fox $shared near the river bank today"
    val s2 = s"completely different opening text here $shared then diverges again entirely"
    val df = Seq((1L, s1), (2L, s2), (3L, s1), (4L, "abc"), (5L, "abcde"))
      .toDF("id", "s")
    val fps = df.select($"id", Text.winnowFingerprints(k, w)($"s").as("f"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getString(1))))
      .toMap
    // determinism: identical text -> identical selection
    assert(fps(1L) == fps(3L))
    // density: positions strictly increasing, consecutive gaps <= w, first <= w
    val pos = fps(1L).map(_._1)
    assert(pos.head <= w && pos.sliding(2).forall {
      case Seq(a, b) => b > a && b - a <= w; case _ => true })
    // guarantee: a shared substring of length >= w + k - 1 shares a fingerprint
    assert(fps(1L).map(_._2).toSet.intersect(fps(2L).map(_._2).toSet).nonEmpty)
    // shorter than k: nothing; exactly k (single gram, short window): one fp at pos 1
    assert(fps(4L).isEmpty)
    assert(fps(5L).map(_._1) == Seq(1))
  }

  test("robustOutliers: MAD flags a spike the spike itself can't hide; MAD=0 guarded") {
    // 9 values near 10 plus one wild spike: the spike inflates mean/stddev
    // (a z-screen would need ~3σ of its OWN inflation) but not median/MAD.
    val g = Seq.tabulate(9)(i => ("g", 9.0 + i * 0.25)) :+ (("g", 1000.0))
    // constant group: MAD = 0 -> robust_z null, nothing flagged
    val c = Seq(("c", 5.0), ("c", 5.0), ("c", 5.0))
    val got = graft.functions.Stats.robustOutliers(
      (g ++ c).toDF("grp", "x"), Seq("grp"), "x", k = 3.0)
    assert(got.filter($"is_outlier").select("x").as[Double].collect().toSeq == Seq(1000.0))
    val gRow = got.filter($"grp" === "g").select("med", "mad").head
    assert(gRow.getDouble(0) == 10.125 && gRow.getDouble(1) == 0.625) // hand-computed
    val cRows = got.filter($"grp" === "c")
    assert(cRows.filter($"robust_z".isNotNull || $"is_outlier").count() == 0)
  }

  test("chunkWindows: coverage, overlap, clipped tail, short-doc single chunk") {
    val doc = (1 to 95).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "just three words"), (3L, "")).toDF("doc_id", "t")
    val got = Text.chunkWindows(df, "t", "doc_id", width = 40, stride = 30)
      .orderBy($"doc_id", $"chunk_id").collect()
    // 95 words @ 40/30 -> 1 + ceil(55/30) = 3 chunks: [1..40],[31..70],[61..95]
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1, 40), (1, 31, 40), (2, 61, 35)))
    assert(d1(2).getString(4).endsWith("w95"), "tail chunk reaches doc end")
    assert(d1(0).getString(4).startsWith("w1 ") && d1(1).getString(4).startsWith("w31 "))
    // consecutive chunks overlap by width - stride = 10 words
    assert(d1(0).getString(4).split(" ").drop(30).toSeq ==
      d1(1).getString(4).split(" ").take(10).toSeq)
    val d2r = got.filter(_.getLong(0) == 2L)
    assert(d2r.length == 1 && d2r(0).getInt(3) == 3 &&
      d2r(0).getString(4) == "just three words")
    assert(got.count(_.getLong(0) == 3L) == 1, "empty doc still yields one chunk")
  }

  test("piiCounts/piiRedact: all three classes, replace-all, clean text untouched") {
    val s = "mail a@b.org and c.d+e@f.co.uk call +1-415-555-0123 " +
      "or +44-207-946-0958 from 10.0.3.25 and 192.168.1.1"
    val df = Seq(s, "no pii here at all").toDF("t")
    val (ne, np, ni) = Text.piiCounts($"t")
    val rows = df.select(ne, np, ni, Text.piiRedact($"t")).collect()
    assert(rows(0).getInt(0) == 2 && rows(0).getInt(1) == 2 && rows(0).getInt(2) == 2)
    assert(rows(0).getString(3) ==
      "mail [EMAIL] and [EMAIL] call [PHONE] or [PHONE] from [IP] and [IP]")
    assert(rows(1).getInt(0) == 0 && rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0)
    assert(rows(1).getString(3) == "no pii here at all")
  }

  test("piiRedact is idempotent (placeholders match no pattern)") {
    val df = Seq("x a@b.org +1-415-555-0123 1.2.3.4").toDF("t")
    val once = df.select(Text.piiRedact($"t").as("t"))
    val twice = once.select(Text.piiRedact($"t").as("t"))
    assert(once.head.getString(0) == twice.head.getString(0))
  }

  test("normalizeUrl strips scheme/www/query/fragment/trailing slash; domain extract") {
    val cases = Seq(
      "https://www.Site3.ORG/Articles/9?utm=x#top" -> "site3.org/articles/9",
      "http://sub.site.org/a/b/" -> "sub.site.org/a/b",
      "ftp://www.x.co" -> "x.co",
      "site.org/p" -> "site.org/p", // already schemeless
      "https://www.site.org/" -> "site.org")
    val got = cases.map(_._1).toDF("u")
      .select(Text.normalizeUrl($"u")).collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
    val dom = Seq("src12.site3.org", "x.co", "deep.sub.example.com")
      .toDF("h").select(Text.registrableDomain($"h"))
      .collect().map(_.getString(0))
    assert(dom.toSeq == Seq("site3.org", "x.co", "example.com"))
  }

  test("pageRankStep iterates: two fed-back steps match the hand-rolled power method") {
    import graft.functions.Graph
    // 1→2, 2→3, 3→1, 1→3 : out_deg(1)=2, out_deg(2)=1, out_deg(3)=1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L)
    // reference: exact same recurrence with per-step 6-decimal rounding
    var ref = nodes.map(_ -> 1.0 / 3).toMap
    val deg = Map(1L -> 2.0, 2L -> 1.0, 3L -> 1.0)
    val in = Map(1L -> Seq(3L), 2L -> Seq(1L), 3L -> Seq(2L, 1L))
    (1 to 2).foreach { _ =>
      ref = nodes.map { v =>
        val mass = in(v).map(u => ref(u) / deg(u)).sum
        v -> math.floor((0.15 / 3 + 0.85 * mass) * 1e6 + 0.5) / 1e6
      }.toMap
    }
    val step1 = Graph.pageRankStep(edges, "src", "dst")
    val step2 = Graph.pageRankStep(edges, "src", "dst", ranks = Some(step1))
    val got = step2.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach { v =>
      assert(math.abs(got(v) - ref(v)) < 2e-6, s"node $v: ${got(v)} vs ${ref(v)}")
    }
  }

  test("pageRank loop driver == composed pageRankStep, across checkpoint cadences") {
    import graft.functions.Graph
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    var stepped = Graph.pageRankStep(edges, "src", "dst")
    (2 to 5).foreach { _ =>
      stepped = Graph.pageRankStep(edges, "src", "dst", ranks = Some(stepped))
    }
    val want = stepped.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // cadence 1 checkpoints every round; cadence 4 leaves rounds 1-3 and 5
    // lazy — both must produce the identical fixpoint
    Seq(1, 4).foreach { every =>
      val got = Graph.pageRank(edges, "src", "dst", iters = 5, checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == want, s"checkpointEvery=$every: $got vs $want")
    }
  }

  test("pageRank tol stops early once the rank delta converges") {
    import graft.functions.Graph
    // symmetric 2-cycle converges almost immediately; iters=50 with a
    // loose tol must stop far earlier AND still return the fixpoint
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val t0 = System.nanoTime()
    val got = Graph.pageRank(edges, "src", "dst", iters = 50,
      tol = 1e-7, checkpointEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.5, 2L -> 0.5))
    // not a timing assertion — just a sanity ceiling that 50 full rounds
    // of jobs did not run (they would take far longer than 60 s here)
    assert((System.nanoTime() - t0) / 1e9 < 60.0)
  }

  test("kmeansTrain: quantization MSE is monotone non-increasing in iters (strict Lloyd)") {
    import graft.functions.Similarity
    // three planted blobs + noise, ids interleaved so first-k seeding is bad
    val rnd = new scala.util.Random(7)
    val centers = Seq(Array(5.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 5.0))
    val pts = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, Seq(c(0) + rnd.nextGaussian(), c(1) + rnd.nextGaussian(),
        c(2) + rnd.nextGaussian()))
    }
    val df = pts.toDF("vec_id", "embedding")
    val costs = (0 to 3).map { iters =>
      Similarity.kmeansCost(df, "embedding",
        Similarity.kmeansTrain(df, "vec_id", "embedding", k = 3, iters = iters))
    }
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"Lloyd MSE went UP: $costs")
    }
    // and training actually helps the initial seeding
    assert(costs.last < costs.head, s"training never improved MSE: $costs")
  }

  test("kmeansTrain: md5-rank seeding starts no worse than first-k-by-id") {
    import graft.functions.Similarity
    // Ids ordered by blob (0-29 = blob A, 30-59 = B, 60-89 = C): first-k
    // seeding draws every seed from blob A; the md5 rank is independent of
    // id locality, so its k seeds spread across blobs and the k-means
    // objective of the UNTRAINED seeds (iters = 0) must already be tighter.
    val rnd = new scala.util.Random(11)
    val centers = Seq(Array(5.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 5.0))
    val pts = (0 until 90).map { i =>
      val c = centers(i / 30)
      (i.toLong, Seq(c(0) + rnd.nextGaussian(), c(1) + rnd.nextGaussian(),
        c(2) + rnd.nextGaussian()))
    }
    val df = pts.toDF("vec_id", "embedding")
    val hashSeeded = Similarity.kmeansCost(df, "embedding",
      Similarity.kmeansTrain(df, "vec_id", "embedding", k = 3, iters = 0))
    val firstK = df.orderBy($"vec_id").limit(3)
      .select($"embedding".cast("array<double>")).collect()
      .zipWithIndex.map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](0)) }
      .toSeq.toDF("list_id", "centroid")
    val firstKSeeded = Similarity.kmeansCost(df, "embedding", firstK)
    assert(hashSeeded <= firstKSeeded,
      s"md5-rank seeding ($hashSeeded) worse than first-k ($firstKSeeded)")
  }

  test("logisticRegression: log-loss strictly decreases across gradient steps") {
    import graft.functions.Similarity
    // linearly separable-ish: y = 1 iff x1 + x2 > 0
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val x = Seq(rnd.nextGaussian(), rnd.nextGaussian(), rnd.nextGaussian())
      (i.toLong, x, if (x(0) + x(1) > 0) 0 else 1) // label 0 -> y=1 convention below
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val y = when($"label" === 0, 1.0).otherwise(0.0)
    val losses = (0 to 3).map { iters =>
      val w = Similarity.logisticRegression(df, "embedding", y, dim = 3,
        w0 = _ => 0.0, lr = 0.5, iters = iters)
        .orderBy($"dim").collect().map(_.getDouble(1)).toSeq
      Similarity.logisticLoss(df, "embedding", y, w)
    }
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"log-loss did not descend: $losses")
    }
  }
}
