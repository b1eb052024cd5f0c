package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Finance, Interp}
import graft.operators.Relational

/** Property tests for invariants the reference encodes implicitly
  * (SURVEY §5 port strategy). Driver-side generators; Spark evaluates.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // deterministic seeded generator loop (the offline cache has no
  // scalatest+scalacheck bridge; plain FunSuite + seeded Random keeps the
  // property idiom reproducible)
  private val rnd = new scala.util.Random(42)
  private def trials(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("melt row count = measures × wide rows; values survive the unpivot") {
    trials(8) {
      val nMeasures = 1 + rnd.nextInt(8)
      val nRows = 1 + rnd.nextInt(20)
      val measures = (1 to nMeasures).map(i => s"m$i")
      val df = (1 to nRows).map(i => (i.toLong, i * 1.5)).toDF("id", "m1")
        .select(col("id") +: measures.map(m => (col("m1") * 1.0).as(m)): _*)
      val long = Relational.melt(df, Seq("id"), measures)
      assert(long.count() == nMeasures.toLong * nRows)
    }
  }

  test("vested + unvested = deposit for any stream point (data_lake.py:1709-1712)") {
    trials(10) {
      val t = rnd.nextDouble() * 100.0
      val dur = 1.0 + rnd.nextDouble() * 49.0
      val dep = 0.1 + rnd.nextDouble() * 1e6
      val start = 10.0; val stop = start + dur
      val r = Seq((t, start, stop, dep)).toDF("t", "start", "stop", "dep")
        .select(
          Finance.vestedAmount($"t", $"start", $"stop", $"dep").as("vested"),
          ($"dep" - Finance.vestedAmount($"t", $"start", $"stop", $"dep")).as("unvested"))
        .head()
      val vested = r.getDouble(0)
      assert(vested >= -1e-9 && vested <= dep + 1e-9)
      assert(math.abs(vested + r.getDouble(1) - dep) < 1e-6)
    }
  }

  test("dedupKeepLast is idempotent (O2)") {
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 2, 3.0), ("b", 1, 4.0))
      .toDF("k", "seq", "v")
    val once = Relational.dedupKeepLast(df, Seq("k"), Seq("seq"))
    val twice = Relational.dedupKeepLast(once, Seq("k"), Seq("seq"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("jaccard is symmetric, bounded [0,1], and 1 iff equal sets") {
    val alphabet = Seq("a", "b", "c", "d", "e", "f")
    trials(10) {
      val xs = List.fill(8)(alphabet(rnd.nextInt(alphabet.length)))
      val ys = List.fill(8)(alphabet(rnd.nextInt(alphabet.length)))
      val df = Seq((xs.distinct, ys.distinct)).toDF("x", "y")
      val r = df.select(
        Dedup.jaccardWords($"x", $"y"), Dedup.jaccardWords($"y", $"x")).head()
      val (j1, j2) = (r.getDouble(0), r.getDouble(1))
      assert(math.abs(j1 - j2) < 1e-12)
      assert(j1 >= 0.0 && j1 <= 1.0)
      if (xs.distinct.toSet == ys.distinct.toSet && xs.nonEmpty)
        assert(math.abs(j1 - 1.0) < 1e-12)
    }
  }

  test("connectedComponents agrees with local union-find on random graphs") {
    trials(3) {
      // small n keeps the propagation round count (graph diameter) low —
      // each distributed round is a fixed-latency job on the test session
      val n = 12
      val edges = Seq.fill(rnd.nextInt(14))(
        (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
      // local union-find ground truth
      val parent = Array.tabulate(n + 1)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (1 to n).map { v =>
        // min vertex id in component == fully-compressed root (roots carry min by construction)
        var r = find(v); v.toLong -> r.toLong
      }.toMap
      val got = Dedup.connectedComponents(
        (1L to n.toLong).toDF("id"), "id",
        edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"edges=$edges")
    }
  }

  test("spline interpolates exactly at knots for random curves") {
    trials(20) {
      val ys = Array.fill(6)(rnd.nextDouble() * 200.0 - 100.0)
      val xs = Array(0.0, 1.0, 2.0, 3.0, 4.0, 5.0)
      val got = Interp.splineEval(xs, ys, xs)
      xs.indices.foreach(i => assert(math.abs(got(i) - ys(i)) < 1e-9))
    }
  }

  test("sharedSpans is partition-invariant and symmetric-free (id_a < id_b)") {
    import graft.functions.Dedup
    val docs = Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.sharedSpans(d, "text", "doc_id", n = 6, maxDocsPerGram = 8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    val a = run(docs)
    val b = run(docs.repartition(7))
    assert(a == b, "span set must not depend on input partitioning")
    assert(a.forall { case (ia, ib, _, _, w) => ia < ib && w >= 6 })
  }

  test("c1 pipeline manifest is partition-invariant") {
    val base = TrainingQueries.queries("c1_corpus_pipeline")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    // rebuild over a repartitioned copy of the corpus via a temp view? The
    // query reads from the sf dir directly, so instead pin determinism
    // across two independent executions (fresh plans, same result).
    val again = TrainingQueries.queries("c1_corpus_pipeline")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(base.nonEmpty && base == again)
  }

  test("snapshotDiff: applying the diff to `before` reconstructs `after` (random tables)") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      def table(ids: Seq[Long]) =
        ids.map(i => (i, s"s${rnd.nextInt(3)}", rnd.nextInt(5).toDouble))
          .toDF("id", "state", "v")
      val before = table(rnd.shuffle((1L to 40L).toList).take(25))
      val after = table(rnd.shuffle((1L to 40L).toList).take(25))
      val diff = Relational.snapshotDiff(before, after, Seq("id"), Seq("state", "v"))
      // reconstruction: after == (unchanged ∪ changed ∪ added keys of the
      // diff, each taking `after`'s row) and removed keys vanish
      val keysBy = diff.groupBy($"diff_status").agg(collect_set($"id").as("ids"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
          .withDefaultValue(Set.empty[Long])
      val afterIds = after.select($"id").as[Long].collect().toSet
      val beforeIds = before.select($"id").as[Long].collect().toSet
      assert(keysBy("added") == afterIds -- beforeIds, s"trial $trial added")
      assert(keysBy("removed") == beforeIds -- afterIds, s"trial $trial removed")
      assert(keysBy("added") ++ keysBy("removed") ++ keysBy("changed") ++
        keysBy("unchanged") == afterIds ++ beforeIds, s"trial $trial partition")
      // self-diff: everything unchanged
      val self = Relational.snapshotDiff(after, after, Seq("id"), Seq("state", "v"))
      assert(self.filter($"diff_status" =!= "unchanged").count() == 0, s"trial $trial self")
    }
  }

  test("psiByCategory: every contribution is non-negative; zero iff shares equal") {
    import graft.functions.Stats
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      def mix() = (1 to 50).map(_ => s"c${rnd.nextInt(4)}").map(Tuple1(_)).toDF("c")
      val rows = Stats.psiByCategory(mix(), mix(), "c")
        .select($"psi_contrib", $"share_ref", $"share_cand")
        .as[(Double, Double, Double)].collect()
      rows.foreach { case (psi, sr, sc) =>
        // (p−q)·ln(p/q) ≥ 0 for all p,q > 0 — both factors share a sign
        assert(psi >= -1e-15, s"trial $trial: negative contribution $psi")
        if (math.abs(sr - sc) < 1e-15) assert(math.abs(psi) < 1e-15)
        else assert(psi > 0, s"trial $trial: unequal shares must contribute")
      }
    }
  }

  test("unionPadded output column set = union of inputs; row count = sum") {
    val a = Seq((1L, 1.0)).toDF("id", "x")
    val b = Seq((2L, 2.0), (3L, 3.0)).toDF("id", "y")
    val c = Seq((4L, 4.0)).toDF("id", "z")
    val got = Relational.unionPadded(Seq(a, b, c))
    assert(got.columns.toSet == Set("id", "x", "y", "z"))
    assert(got.count() == 4)
  }
}

class RunnerSpec extends SparkSpec {
  import spark.implicits._
  import graft.runner.Runner

  private val rnd = new scala.util.Random(42)
  private def trials(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("idempotent partition re-run replaces only its own partition") {
    val out = java.nio.file.Files.createTempDirectory("graft_runner").toString
    val job = Runner.Job("balances", out)((s, p) => {
      import s.implicits._
      val mult = p.asInstanceOf[Runner.DailyByMarket].market.length.toDouble
      Seq(("0xtok", 100.0 * mult)).toDF("token", "balance")
    })
    Runner.backfill(spark, job, Seq(
      Runner.DailyByMarket("2024-01-01", "ethereum_v3"),
      Runner.DailyByMarket("2024-01-01", "polygon_v3"),
      Runner.DailyByMarket("2024-01-02", "ethereum_v3")))
    assert(spark.read.parquet(out).count() == 3)
    // re-run one partition; others untouched, no duplicates
    Runner.run(spark, job, Runner.DailyByMarket("2024-01-01", "ethereum_v3"))
    val got = spark.read.parquet(out)
    assert(got.count() == 3)
    assert(got.select("date").distinct().count() == 2)
  }

  test("append-only job accumulates snapshots") {
    val out = java.nio.file.Files.createTempDirectory("graft_runner2").toString
    val job = Runner.Job("liquidity_depth", out, appendOnly = true)((s, _) => {
      import s.implicits._
      Seq((1e6, 0.99e6)).toDF("from_usd", "to_usd")
    })
    Runner.run(spark, job, Runner.Daily("2024-01-01"))
    Runner.run(spark, job, Runner.Daily("2024-01-01"))
    assert(spark.read.parquet(out).count() == 2)
  }

  test("Welford UDAF is partition-invariant and matches built-in avg/stddev_samp") {
    trials(4) {
      val n = 100 + rnd.nextInt(400)
      val xs = Seq.fill(n)(rnd.nextDouble() * 1e5)
      for (parts <- Seq(1, 3, 8)) {
        val df = xs.toDF("x").repartition(parts)
        val got = df.agg(graft.functions.Stats.welford($"x").as("w"))
          .select($"w.mean", $"w.stddev").head()
        val want = df.agg(avg($"x"), stddev_samp($"x")).head()
        assert(math.abs(got.getDouble(0) - want.getDouble(0)) < 1e-6 * 1e5)
        assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-6 * 1e5,
          s"parts=$parts stddev ${got.getDouble(1)} vs ${want.getDouble(1)}")
      }
    }
  }

  test("minhash LSH recall vs exhaustive join on planted near-dup families") {
    // Statistical guarantee behind the rows-only d2 check: at threshold
    // 0.5 with 16 bands × 4 rows, a true pair at J=0.7 is a candidate with
    // p = 1-(1-0.7^4)^16 ≈ 0.99 — near-total recall over a planted corpus.
    val vocab = Vector.tabulate(80)(i => s"tok$i")
    val base = Seq.tabulate(10)(_ => Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (0 until 60).map { i =>
      val words = base(i % base.size).split(" ").toSeq
      val mutated = words.map(w => if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(vocab.size)) else w)
      (i.toLong, mutated.mkString(" "))
    }.toDF("doc_id", "text")
    val exhaustive = Dedup.nearDupJaccardBlocked(
        docs.withColumn("all", lit(1)), "text", "doc_id", Seq("all"), threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.nearDupMinhashLsh(docs, "text", "doc_id",
        n = 1, k = 64, bands = 16, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exhaustive), "verify step guarantees precision 1.0")
    val recall = if (exhaustive.isEmpty) 1.0 else lsh.size.toDouble / exhaustive.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exhaustive.size})")
  }

  private def pqMse(vecs: Array[Array[Double]], bk: Array[Array[Array[Double]]]): Double = {
    val m = bk.length; val dsub = bk(0)(0).length
    vecs.map { v =>
      (0 until m).map { s =>
        val sv = v.slice(s * dsub, (s + 1) * dsub)
        bk(s).map(cw => sv.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum).min
      }.sum
    }.sum / vecs.length
  }

  test("pqTrain: quantization MSE is monotone non-increasing in Lloyd iterations") {
    import graft.functions.Similarity
    // clustered corpus: 8 centers + noise, so Lloyd has real structure
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextDouble() * 4 - 2))
    val vecs = Array.tabulate(160) { i =>
      centers(i % 8).map(_ + rnd.nextGaussian() * 0.3)
    }
    val df = vecs.toSeq.map(v => (vecs.indexOf(v).toLong, v.toSeq)).toDF("vec_id", "embedding")
    val mses = (0 to 3).map { iters =>
      pqMse(vecs, Similarity.pqTrain(df, "vec_id", "embedding", m = 4, k = 8, iters = iters))
    }
    mses.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev + 1e-9, s"MSE rose across an iteration: $mses")
    }
    assert(mses.last < mses.head, s"training never improved on the seeds: $mses")
  }

  test("pqTrain: md5-rank seeding starts no worse than first-k-by-id") {
    import graft.functions.Similarity
    // Ids ordered by blob (block layout): first-k draws every seed from
    // the first blob, while the md5 rank spreads seeds over all blobs, so
    // the UNTRAINED (iters = 0) codebooks must already quantize at least
    // as tightly — the kmeansTrain seed-quality property, PQ edition.
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextDouble() * 4 - 2))
    val vecs = Array.tabulate(160) { i =>
      centers(i / 20).map(_ + rnd.nextGaussian() * 0.3) // block-ordered ids
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val m = 4; val k = 8; val dsub = 16 / m
    val hashBooks = Similarity.pqTrain(df, "vec_id", "embedding", m, k, iters = 0)
    // first-k-by-id seed books, built exactly as pqTrain seeds them
    val firstK = vecs.take(k)
    val firstBooks = Array.tabulate(m, k)((s, c) =>
      firstK(c % firstK.length).slice(s * dsub, (s + 1) * dsub))
    assert(pqMse(vecs, hashBooks) <= pqMse(vecs, firstBooks) + 1e-9,
      s"md5-rank PQ seeds (${pqMse(vecs, hashBooks)}) worse than first-k (${pqMse(vecs, firstBooks)})")
  }

  test("pqTopKAdc: top-k recall vs exact cosine on clustered unit-ish vectors") {
    import graft.functions.Similarity
    val centers = Array.fill(6)(Array.fill(16)(rnd.nextDouble() * 2 - 1))
    val vecs = Array.tabulate(120) { i =>
      val raw = centers(i % 6).map(_ + rnd.nextGaussian() * 0.15)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n) // unit norm: ADC's L2 ranking ~ cosine ranking
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toSeq.toDF("vec_id", "embedding")
    val books = Similarity.pqTrain(df, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", books)
    val q = vecs(0)
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val exactTop = vecs.zipWithIndex.map { case (v, i) => (cos(q, v), i.toLong) }
      .sortBy { case (c, i) => (-c, i) }.take(10).map(_._2).toSet
    val adcTop = Similarity.pqTopKAdc(codes, "vec_id", q.toSeq, books, k = 10)
      .select($"vec_id").as[Long].collect().toSet
    val recall = exactTop.count(adcTop.contains).toDouble / exactTop.size
    assert(recall >= 0.6, s"ADC recall $recall (${exactTop.intersect(adcTop).size}/10)")
    assert(adcTop.contains(0L), "self must survive quantization into the top-10")
  }

  test("simhash pigeonhole chunk blocking is lossless vs the naive all-pairs join") {
    // The chunk join is a pure candidate FILTER: by pigeonhole, any pair
    // within Hamming radius r agrees exactly on one of the r+1 signature
    // chunks, so the blocked pair set must EQUAL the naive quadratic
    // join's — on planted near-dup families and on unrelated docs alike.
    trials(3) {
      val vocab = Vector.tabulate(60)(i => s"word$i")
      val base = Seq.tabulate(6)(_ =>
        Seq.fill(30)(vocab(rnd.nextInt(vocab.size))))
      val docs = (0 until 50).map { i =>
        val words = base(i % base.size)
        val mutated = words.map(w =>
          if (rnd.nextInt(12) == 0) vocab(rnd.nextInt(vocab.size)) else w)
        (i.toLong, if (i % 2 == 0) "en" else "fr", mutated.mkString(" "))
      }.toDF("doc_id", "lang", "text")
      val naive = {
        val sigs = docs.select($"doc_id", $"lang", Dedup.simHash($"text").as("sig"))
        sigs.as("a").join(sigs.as("b"),
            col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
          .withColumn("h", Dedup.hamming64(col("a.sig"), col("b.sig")))
          .filter($"h" <= 8)
          .select(col("a.doc_id"), col("b.doc_id"), $"h")
          .as[(Long, Long, Int)].collect().toSet
      }
      val blocked = Dedup.simhashNearDup(docs, "text", "doc_id",
          radius = 8, blockCols = Seq("lang"))
        .as[(Long, Long, Int)].collect().toSet
      assert(blocked == naive,
        s"blocked=${blocked.size} naive=${naive.size} diff=${(blocked diff naive) ++ (naive diff blocked)}")
      assert(naive.nonEmpty, "planted families must produce at least one pair")
    }
  }

  test("scd2 reconstructs the log: intervals tile, versions match state-at-time") {
    trials(6) {
      val nKeys = 1 + rnd.nextInt(4)
      val states = Seq("A", "B", "C")
      val log = (1 to nKeys).flatMap { k =>
        (1 to 2 + rnd.nextInt(10)).map(t =>
          (k.toLong, t.toLong, states(rnd.nextInt(states.length))))
      }
      val df = log.toDF("id", "ts", "state")
      val scd = Relational.scd2(df, Seq("id"), Seq("ts"), Seq("state"))
        .select($"id", $"state", $"valid_from", $"valid_to", $"is_current")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getBoolean(4)))
      // exactly one current version per key; intervals tile without overlap
      val byKey = scd.groupBy(_._1)
      byKey.foreach { case (_, vs) =>
        assert(vs.count(_._5) == 1, "exactly one open version per key")
        val sorted = vs.sortBy(_._3)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._4 == b._3, "valid_to chains to next valid_from")
          case _ =>
        }
      }
      // state-at-time: for every original log row, the version covering its
      // ts must carry the state of the latest change <= ts
      log.foreach { case (id, ts, _) =>
        val covering = scd.filter(v => v._1 == id && v._3 <= ts && ts < v._4)
        assert(covering.length == 1, s"exactly one version covers ($id, $ts)")
        val lastChange = log.filter(l => l._1 == id && l._2 <= ts).maxBy(_._2)
        assert(covering.head._2 == lastChange._3)
      }
    }
  }

  test("globalRowIds: contiguous 1..N, order-consistent, partition-invariant") {
    trials(4) {
      val n = 50 + rnd.nextInt(200)
      val rows = (1 to n).map(i => (i.toLong, rnd.nextInt(40).toDouble))
      val df = rows.toDF("k", "v").repartition(1 + rnd.nextInt(8))
      val got = Relational.globalRowIds(df, Seq($"v".asc, $"k".asc))
        .select($"k", $"v", $"row_id").collect()
      assert(got.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq, "ids are 1..N")
      val inOrder = got.sortBy(_.getLong(2))
        .map(r => (r.getDouble(1), r.getLong(0)))
      assert(inOrder.toSeq == inOrder.sortBy(identity).toSeq, "ids follow the total order")
    }
  }

  test("hashSampleFilter keeps a rate-proportional, re-run-stable subset") {
    val ids = (1L to 4000L).toDF("id")
    for (rate <- Seq(0.1, 0.5, 1.0)) {
      val kept = ids.filter(graft.functions.Text.hashSampleFilter($"id", rate))
        .as[Long].collect().toSet
      val kept2 = ids.filter(graft.functions.Text.hashSampleFilter($"id", rate))
        .as[Long].collect().toSet
      assert(kept == kept2, "deterministic across runs")
      if (rate == 1.0) assert(kept.size == 4000, "rate 1.0 keeps everything")
      else {
        val share = kept.size / 4000.0
        assert(math.abs(share - rate) < 0.05, s"rate=$rate share=$share")
      }
    }
    // monotone: a doc sampled at rate r stays sampled at any higher rate
    val at01 = ids.filter(graft.functions.Text.hashSampleFilter($"id", 0.1))
      .as[Long].collect().toSet
    val at05 = ids.filter(graft.functions.Text.hashSampleFilter($"id", 0.5))
      .as[Long].collect().toSet
    assert(at01.subsetOf(at05), "sampling is monotone in rate")
  }

  test("randomProjection: deterministic, and JL-preserves pairwise distance ranks") {
    import graft.functions.Similarity
    val dim = 64; val outDim = 16; val n = 40
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }
    val df = vecs.toDF("id", "v")
    def proj(): Map[Long, Seq[Double]] =
      Similarity.randomProjection(df, "id", "v", dim, outDim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p1 = proj()
    assert(p1 == proj(), "projection is a pure function of the input")
    // JL distortion: with outDim=16 the per-pair bound is loose, so assert
    // the AGGREGATE property a blocking/clustering consumer relies on —
    // squared distances are preserved on average (E[|Px-Py|²] = |x-y|²)
    // and no pair collapses to zero or explodes.
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val orig = vecs.map { case (id, v) => id -> v.map(_.toDouble).toSeq }.toMap
    val ratios = for {
      i <- 0L until n.toLong; j <- (i + 1) until n.toLong
    } yield d2(p1(i), p1(j)) / d2(orig(i), orig(j))
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.25, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.05 && r < 5.0),
      s"pairwise distortion bounded: min=${ratios.min} max=${ratios.max}")
  }

  test("topKPairsAgg: equals deduped window top-k; invariant to partitioning") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, posexplode, row_number}
    trials(6) {
      val n = 50 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(5)
      // coarse score grid + small id range force ties AND exact duplicates
      val rows = Seq.fill(n)((rnd.nextInt(8).toLong,
        math.floor(rnd.nextDouble() * 20) / 20.0, rnd.nextInt(40).toLong))
      val df = rows.toDF("g", "score", "id")
      def run(parts: Int): Set[(Long, Long, Double, Int)] =
        df.repartition(parts)
          .groupBy(col("g"))
          .agg(graft.functions.Similarity.topKPairsAgg(col("score"), col("id"), k).as("t"))
          .select(col("g"), posexplode(col("t")).as(Seq("r", "e")))
          .select(col("g"), col("e.id"), col("e.score"), (col("r") + 1).cast("int"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
      val expected = df.dropDuplicates("g", "score", "id")
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
        .select(col("g"), col("id"), col("score"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val one = run(1)
      assert(one == expected, s"agg != window reference (n=$n k=$k)")
      assert(run(7) == one, s"partitioning changed the result (n=$n k=$k)")
    }
  }

  test("chunkWindows: full word coverage, stride spacing, exact reconstruction") {
    trials(6) {
      val width = 5 + rnd.nextInt(40)
      val stride = 1 + rnd.nextInt(width) // stride <= width, no gaps
      val n = 1 + rnd.nextInt(150)
      val words = (1 to n).map(i => s"w$i")
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "t")
      val chunks = graft.functions.Text.chunkWindows(df, "t", "doc_id", width, stride)
        .orderBy("chunk_id")
        .select("chunk_id", "start_word", "n_words", "chunk_text").collect()
      val expected = 1 + math.ceil(math.max(0, n - width) / stride.toDouble).toInt
      assert(chunks.length == expected, s"n=$n w=$width s=$stride")
      // every word covered; chunk i starts at i*stride + 1; union reconstructs
      val covered = chunks.flatMap { r =>
        assert(r.getInt(1) == r.getInt(0) * stride + 1)
        assert(r.getString(3).split(" ").length == r.getInt(2))
        (r.getInt(1) until r.getInt(1) + r.getInt(2))
      }.toSet
      assert(covered == (1 to n).toSet, s"coverage gap: n=$n w=$width s=$stride")
    }
  }

  test("mixture weights rebalance: weighted actual shares land on the target recipe") {
    // resampling each lang with weight w_l = target_l / actual_l turns the
    // realized mix into the target mix: sum_l actual_l·w_l = 1 and each
    // lang's weighted share = target_l. Checked over the real sf corpus
    // through the harness query itself.
    val q = TrainingQueries.queries("t19_mixture_weights")(spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    val weightedShares = rows.map(r =>
      r.getAs[String]("lang") ->
        r.getAs[Double]("actual_share") * r.getAs[Double]("weight")).toMap
    rows.foreach { r =>
      val target = r.getAs[Double]("target_share")
      assert(math.abs(weightedShares(r.getAs[String]("lang")) - target) < 1e-4,
        s"weighted share of ${r.getAs[String]("lang")} hits its target")
    }
  }

  test("histogram quantile partials: deterministic error bound + exact partition-merge (k11)") {
    import graft.functions.Stats
    trials(6) {
      val n = 50 + rnd.nextInt(400)
      val nBins = 64 + rnd.nextInt(200)
      val (lo, hi) = (0.0, 1000.0)
      // clustered values stress empty-bin gaps between bracketing ranks
      val vals = (1 to n).map(_ =>
        if (rnd.nextBoolean()) rnd.nextDouble() * 1000.0
        else 300.0 + rnd.nextDouble() * 10.0)
      val df = vals.zipWithIndex
        .map { case (v, i) => (s"part${i % 5}", v) }.toDF("pk", "v")
      val partials = Stats.histogramPartials(df, "v", "pk", lo, hi, nBins)
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
      val got = Stats.histogramQuantiles(partials, ps, lo, hi, nBins)
        .collect().map(r => r.getAs[Double]("p") ->
          (r.getAs[Double]("est"), r.getAs[Double]("err_bound"))).toMap
      val sorted = vals.sorted
      ps.foreach { p =>
        val pos = p * (n - 1)
        val (k, frac) = (math.floor(pos).toInt, pos - math.floor(pos))
        val exact = sorted(k) + frac *
          (sorted(math.min(k + 1, n - 1)) - sorted(k))
        val (est, bound) = got(p)
        assert(math.abs(est - exact) <= bound + 1e-9,
          s"p=$p est=$est exact=$exact bound=$bound n=$n bins=$nBins")
      }
      // partials merge by addition: 5-partition histogram == 1-partition
      val one = Stats.histogramPartials(
          df.withColumn("pk", lit("all")), "v", "pk", lo, hi, nBins)
        .select($"bin", $"bin_n".as("n1"))
      val merged = partials.groupBy($"bin").agg(sum($"bin_n").as("nm"))
      assert(merged.join(one, Seq("bin"), "full")
        .filter($"nm".isNull || $"n1".isNull || $"nm" =!= $"n1")
        .count() == 0)
    }
  }

  test("exact quantiles via sort+rank == built-in percentile, global + grouped (a11/k11)") {
    import graft.functions.Stats
    import org.apache.spark.sql.functions._
    val ps = Seq("q25" -> 0.25, "q50" -> 0.5, "q90" -> 0.9, "q100" -> 1.0)
    trials(5) {
      val n = 30 + rnd.nextInt(300)
      // half the values snapped to a 10-point grid: heavy ties stress the
      // no-tie-break determinism claim (the k-th order statistic is a pure
      // function of the multiset); planted nulls must be ignored like the
      // built-in; group "g9" has exactly one row (frac paths degenerate)
      val rows = (1 to n).map { i =>
        val v: java.lang.Double =
          if (rnd.nextInt(10) == 0) null
          else if (rnd.nextBoolean()) rnd.nextInt(10).toDouble
          else rnd.nextDouble() * 100.0
        (if (i % 7 == 0) null else s"g${i % 4}", v)
      } :+ (("g9", java.lang.Double.valueOf(42.0)))
      val df = rows.toDF("g", "v")
      // global: bit-equal to the built-in aggregate
      val gotG = Stats.exactQuantiles(df, "v", ps).collect().head
      val expG = df.agg(expr(
        "percentile(v, array(0.25D, 0.5D, 0.9D, 1.0D))").as("e")).collect()
        .head.getSeq[Double](0)
      ps.map(_._1).zipWithIndex.foreach { case (name, i) =>
        assert(gotG.getAs[Double](name) == expG(i), s"global $name")
      }
      // grouped (null group key included): bit-equal per group + count
      val gotByG = Stats.exactQuantilesByGroup(df, "v", Seq("g"), ps,
        countCol = Some("n_rows")).collect()
        .map(r => Option(r.getAs[String]("g")) -> r).toMap
      val expByG = df.filter($"v".isNotNull).groupBy($"g")
        .agg(expr("percentile(v, array(0.25D, 0.5D, 0.9D, 1.0D))").as("e"),
          count(lit(1)).as("n"))
        .collect().map(r => Option(r.getAs[String]("g")) ->
          (r.getSeq[Double](1), r.getAs[Long]("n"))).toMap
      assert(gotByG.keySet == expByG.keySet, "same groups")
      expByG.foreach { case (g, (es, cnt)) =>
        val got = gotByG(g)
        ps.map(_._1).zipWithIndex.foreach { case (name, i) =>
          assert(got.getAs[Double](name) == es(i), s"group $g $name")
        }
        assert(got.getAs[Long]("n_rows") == cnt, s"group $g count")
      }
    }
    // empty input: one all-null row, like the built-in returning null
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    val r = Stats.exactQuantiles(empty, "v", Seq("q50" -> 0.5)).collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("heavy-hitter partials: < k rows per period, pigeonhole envelope, subset merge, planted hitter found (k14)") {
    import graft.functions.Stats
    import org.apache.spark.sql.functions._
    val k = 10
    val rnd = new scala.util.Random(23)
    // Zipf-ish synthetic: key i appears ~1000/i times, across 4 periods,
    // plus one PLANTED hitter spread thin over every period (never the
    // per-period max, but its total clears the global bound)
    val rows = (for {
      key <- 1 to 40
      rep <- 1 to (1000 / key)
    } yield (s"p${rnd.nextInt(4)}", s"key_$key")) ++
      (for (p <- 0 until 4; _ <- 1 to 260) yield (s"p$p", "planted"))
    val df = rows.toDF("period", "key")
    val partials = Stats.heavyHitterPartials(df, "key", "period", k)
    // space bound: strictly fewer than k keys per period
    val perPeriod = partials.groupBy($"period").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(perPeriod.nonEmpty && perPeriod.forall(_ < k), perPeriod.toSeq)
    val statsAll = df.groupBy($"period").agg(count(lit(1)).as("n_rows"))
    val merged = Stats.heavyHittersMerged(partials, statsAll, "key", k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = df.groupBy($"key").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val bound = statsAll.agg(sum(floor($"n_rows" / k)).cast("long"))
      .head().getLong(0)
    // envelope: est <= true <= est + bound, for every reported key
    merged.foreach { case (w, (est, b)) =>
      assert(b == bound)
      assert(est <= exact(w) && exact(w) <= est + b, s"$w est=$est exact=${exact(w)} b=$b")
    }
    // completeness: everything above the bound is reported — including
    // the planted thin-spread hitter
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(merged.contains(w), s"missed heavy key $w (exact=${exact(w)}, bound=$bound)")
    }
    assert(exact("planted") > bound && merged.contains("planted"))
    // subset merge == direct summary over the subset (pure function of
    // each period's multiset — no order dependence)
    val sub = Seq("p0", "p2")
    val mergedSub = Stats.heavyHittersMerged(
        partials.filter($"period".isin(sub: _*)),
        statsAll.filter($"period".isin(sub: _*)), "key", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val directSub = Stats.heavyHittersMerged(
        Stats.heavyHitterPartials(df.filter($"period".isin(sub: _*)), "key", "period", k),
        df.filter($"period".isin(sub: _*)).groupBy($"period")
          .agg(count(lit(1)).as("n_rows")), "key", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mergedSub == directSub)
  }

  test("heavy-hitter partials keep a NULL period's keys (null-safe threshold join)") {
    import graft.functions.Stats
    import org.apache.spark.sql.functions._
    // one NULL-period group: 30 of 40 rows are key "hot" → clears k=3
    val rows = Seq.fill(30)((null: String, "hot")) ++
      (1 to 10).map(i => (null: String, s"cold_$i")) ++
      Seq.fill(20)(("p1", "hot"))
    val df = rows.toDF("period", "key")
    val partials = Stats.heavyHitterPartials(df, "key", "period", 3)
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
    // pre-fix, the equi-join dropped the whole null period; now "hot"
    // must surface in BOTH periods with its exact per-period counts
    assert(partials.contains((None, "hot", 30L)), partials.toSeq)
    assert(partials.contains((Some("p1"), "hot", 20L)), partials.toSeq)
    // and the space bound still holds within the null period
    assert(partials.count(_._1.isEmpty) < 3)
  }

  test("sqrtFloorBinds: bounded count below the Int clamp, exact count above it") {
    import graft.functions.Similarity
    val df = (1 to 10).map(i => (i.toLong, Seq(i.toDouble))).toDF("id", "v")
    // small cap: 10 rows > cap 4 → binds, via the limit(5) path
    assert(Similarity.sqrtFloorBinds(df, 4L, sys.error("exactN must not be forced")))
    // cap >= Int.MaxValue (nLists >= 46341): the limit() clamp can never
    // exceed cap — must consult exactN instead of silently returning false
    assert(!Similarity.sqrtFloorBinds(df, Int.MaxValue.toLong, 10L))
    assert(Similarity.sqrtFloorBinds(df, Int.MaxValue.toLong, Int.MaxValue.toLong + 5L))
  }
}
