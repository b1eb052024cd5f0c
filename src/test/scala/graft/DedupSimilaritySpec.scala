package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Similarity}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),          // near dup of 1
    (4L, "completely different content about spark and scala"),
    (5L, "THE  quick   brown fox jumps over the lazy dog!!")      // normalized dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val got = Dedup.exact(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // 1,2,5 collapse; 3 and 4 stay
    assert(got.length == 3)
    assert(got.head.getLong(0) == 1L && got.head.getLong(1) == 3L)
  }

  test("incrementalExact: corpus-seen dropped, within-batch first id wins, novel kept") {
    val existing = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely different content about spark and scala")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (20L, "THE  quick   brown fox jumps over the lazy dog!!"), // seen (normalized)
      (21L, "a genuinely novel document body"),
      (22L, "a genuinely  NOVEL document body"),                 // batch dup of 21
      (23L, "another novel one")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, existing, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(21L, 23L))
    // idempotent: re-ingesting the survivors against corpus ∪ batch yields nothing
    val again = Dedup.incrementalExact(
      batch.filter($"doc_id".isin(21L, 23L)), existing.union(batch), "text", "doc_id")
    assert(again.count() == 0)
  }

  test("minhash signatures are equal for identical text, close for near-dups") {
    val sigs = docs.select($"doc_id", Dedup.minHashSignature($"text", n = 2, k = 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 64.0
    val agree14 = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b } / 64.0
    assert(agree13 > 0.5, s"near-dup signature agreement $agree13")
    assert(agree14 < 0.3, s"unrelated signature agreement $agree14")
  }

  test("nearDupMinhashLsh finds planted near-duplicates, not unrelated docs") {
    val pairs = Dedup.nearDupMinhashLsh(docs, "text", "doc_id", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("incrementalNearDup ≡ full rebuild restricted to new docs (incl. at-rest index)") {
    // existing corpus = docs 1-3; new batch = 4-6 (5 ~ near-dup of 1;
    // 6 exact-dup of 4): expect new-existing pairs (1,5)(2,5)(3,5) and
    // the new-new pair (4,6); NO existing-existing pairs (1,2) etc.
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different content about spark and scala"),
      (5L, "the quick brown fox jumps over the very lazy dog"),
      (6L, "completely different content about spark and scala")
    ).toDF("doc_id", "text")
    val exist = corpus.filter($"doc_id" <= 3L)
    val batch = corpus.filter($"doc_id" > 3L)
    val (bandsDf, shinglesDf) = Dedup.nearDupIndexTables(exist, "text", "doc_id")
    // at-rest round trip, partitioned by band — the production layout
    val tmp = java.nio.file.Files.createTempDirectory("graft_d15").toString
    bandsDf.write.partitionBy("band").parquet(s"$tmp/bands")
    shinglesDf.write.parquet(s"$tmp/shingles")
    val inc = Dedup.incrementalNearDup(batch, "text", "doc_id",
        spark.read.parquet(s"$tmp/bands"), spark.read.parquet(s"$tmp/shingles"),
        threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val full = Dedup.nearDupMinhashLsh(corpus, "text", "doc_id", threshold = 0.5)
      .filter($"id_a" > 3L || $"id_b" > 3L)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.map(p => (p._1, p._2)).contains((4L, 6L)), "new-new pair found")
    assert(inc.exists(p => p._2 == 5L && p._1 <= 3L), "new-existing pair found")
    assert(!inc.exists(p => p._1 <= 3L && p._2 <= 3L), "no existing-existing pairs")
  }

  test("linkBestMatch: best right match per left row, ids may collide across tables") {
    // left ids deliberately REUSE right-side id values (1, 2) — linkage
    // must keep the tables' id spaces separate, unlike self-dedup
    val leftT = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // near-dups in right
      (2L, "completely different content about spark and scala"),
      (3L, "nothing like anything else at all here zzz qqq")) // no match
      .toDF("doc_id", "text")
    val rightT = Seq(
      (1L, "entirely unrelated text about databases and engines"),
      (2L, "the quick brown fox jumps over the very lazy dog"),  // best for left 1
      (5L, "the quick brown fox leaps over the lazy dog"),
      (9L, "completely different content about spark and scala")) // exact for left 2
      .toDF("doc_id", "text")
    val got = Dedup.linkBestMatch(leftT, rightT, "text", "doc_id", threshold = 0.5)
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toMap
    assert(got.get(2L).contains(9L), got.toString)  // exact dup wins
    assert(got.get(1L).exists(r => r == 2L || r == 5L), got.toString)
    assert(!got.contains(3L), "no-match left row absent")
    // one row per left id (best match, not the pair graph)
    val rows = Dedup.linkBestMatch(leftT, rightT, "text", "doc_id", threshold = 0.3)
      .groupBy($"left_id").count().agg(max($"count")).as[Long].head()
    assert(rows == 1L)
    // AT-REST: persist the right feed's index tables, probe from disk —
    // must equal the in-memory linkage exactly (pairs AND jaccard)
    val tmp = java.nio.file.Files.createTempDirectory("graft_d16_spec").toString
    val (rb, rw) = Dedup.nearDupIndexTables(rightT, "text", "doc_id")
    rb.write.mode("overwrite").partitionBy("band").parquet(s"$tmp/bands")
    rw.write.mode("overwrite").parquet(s"$tmp/shingles")
    val atRest = Dedup.linkBestMatchAgainstIndex(
        Dedup.signedCorpus(leftT, "text", "doc_id"),
        spark.read.parquet(s"$tmp/bands"), spark.read.parquet(s"$tmp/shingles"),
        threshold = 0.5)
      .select($"left_id", $"right_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val inMem = Dedup.linkBestMatch(leftT, rightT, "text", "doc_id", threshold = 0.5)
      .select($"left_id", $"right_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(atRest == inMem, s"atRest=$atRest inMem=$inMem")
  }

  test("lshPairsFrom fails fast on a k-mismatched signed relation") {
    val signed = Dedup.signedCorpus(docs, "text", "doc_id", k = 32)
    val err = intercept[Exception](
      Dedup.lshPairsFrom(signed, k = 64).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("sign and band parameters must match")),
      msgs(err).mkString(" | "))
  }

  test("simHash: identical text -> hamming 0; unrelated -> large hamming") {
    val sigs = docs.select($"doc_id", Dedup.simHash($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(5L)) == 0)   // normalization-invariant
    assert(ham(sigs(1L), sigs(3L)) <= 16)  // near dup: close
    assert(ham(sigs(1L), sigs(4L)) > 16)   // unrelated: far
  }

  test("jaccardWords exact values") {
    val got = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(Dedup.jaccardWords($"x", $"y")).head.getDouble(0)
    assert(math.abs(got - 0.5) < 1e-12)
  }

  test("connectedComponents: chain, triangle, isolated vertex; partition-invariant") {
    val vertices = (1L to 9L).toDF("doc_id")
    // chain 1-2-3-4 (diameter 3), triangle 5-6-7, isolated 8, 9
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                   5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L)
    Seq(1, 5).foreach { nPart =>
      val got = Dedup.connectedComponents(
        vertices.repartition(nPart), "doc_id",
        edges.repartition(nPart), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"nPart=$nPart: $got")
    }
  }

  test("sharedSpans: planted interior span found maximal with exact offsets; boilerplate gram cap") {
    import spark.implicits._
    // 12 shared words planted at word 5 of doc 1 and word 3 of doc 2;
    // n=4 grams → expected island = 12-4+1 = 9 grams → span_words = 12
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    def filler(p: String, k: Int) = (1 to k).map(i => s"$p$i").mkString(" ")
    val d1 = s"${filler("aa", 5)} $shared ${filler("bb", 6)}"
    val d2 = s"${filler("cc", 3)} $shared ${filler("dd", 4)}"
    val docs2 = Seq((1L, d1), (2L, d2), (3L, filler("ee", 20))).toDF("doc_id", "text")
    val got = Dedup.sharedSpans(docs2, "text", "doc_id", n = 4, maxDocsPerGram = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 5L, 3L, 12L)), s"got ${got.toSeq}")
    // a gram shared by MORE than maxDocsPerGram docs is boilerplate: capped out
    val many = (1L to 10L).map(i => (i, s"x$i ${filler("common", 6)} y$i")).toDF("doc_id", "text")
    val capped = Dedup.sharedSpans(many, "text", "doc_id", n = 4, maxDocsPerGram = 4)
    assert(capped.count() == 0, "grams in >cap docs must not generate pairs")
    val uncapped = Dedup.sharedSpans(many, "text", "doc_id", n = 4, maxDocsPerGram = 10)
    assert(uncapped.count() == 45, "10 docs sharing one span -> all 45 pairs when under cap")
    // occurrence cap: a gram repeated P times in each of 2 docs fans out
    // P² join rows even under the distinct-doc cap — bounded separately
    val loop = (1 to 20).map(_ => "w1 w2 w3 w4").mkString(" ")
    val repetitive = Seq((1L, loop), (2L, loop)).toDF("doc_id", "text")
    val occCapped = Dedup.sharedSpans(repetitive, "text", "doc_id",
      n = 4, maxDocsPerGram = 8, maxRowsPerGram = 32)
    assert(occCapped.count() == 0,
      "40-occurrence grams must be dropped at maxRowsPerGram=32")
    val occOpen = Dedup.sharedSpans(repetitive, "text", "doc_id",
      n = 4, maxDocsPerGram = 8, maxRowsPerGram = 10000)
    assert(occOpen.count() > 0, "raising the occurrence cap restores the spans")
  }

  test("jaccardAllPairsAbove == provably-exact prefix filter (size/early-exit pruning lossless)") {
    val docs = Tables.t(spark, sfDir, "documents")
    Seq(0.4, 0.8).foreach { t =>
      val fast = Dedup.jaccardAllPairsAbove(docs, "text", "doc_id", t, ngram = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exact = Dedup.nearDupPrefixFilter(docs, "text", "doc_id", t, ngram = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == exact, s"threshold $t: twin diverges from PPJoin")
    }
  }

  test("embeddingEdgesAbove == thresholded all-pairs join (exact edge oracle)") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val t = 0.2
    val fast = Dedup.embeddingEdgesAbove(emb, "vec_id", "embedding", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v = emb.select($"vec_id".cast("long").as("id"),
      $"embedding".cast("array<double>").as("e"))
    val brute = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        round(Similarity.cosine(col("a.e"), col("b.e")), 6).as("c"))
      .filter($"c" >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == brute)
  }

  test("connectedComponentsLocal matches the distributed form (incl. empty edges)") {
    val vertices = (1L to 9L).toDF("doc_id")
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("id_a", "id_b")
    val dist = Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = Dedup.connectedComponentsLocal(vertices, "doc_id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    val noEdges = Dedup.connectedComponentsLocal(vertices, "doc_id",
      edges.limit(0), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noEdges == (1L to 9L).map(i => i -> i).toMap)
  }

  test("concurrent pipelines never mutate the caller's AQE conf (isolated child sessions)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    val vertices = (1L to 9L).toDF("doc_id")
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 7L), (7L, 5L))
      .toDF("id_a", "id_b")
    // d2-shaped and d6-shaped pipelines on the SAME SparkSession, racing:
    // with the old session-conf mutation one pipeline could observe (or
    // clobber) the other's AQE toggle; with per-call child sessions the
    // caller conf must read unchanged at every sample point.
    val fLsh = Future(Dedup.nearDupMinhashLsh(docs, "text", "doc_id", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet)
    val fCc = Future(Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    var samples = List.empty[String]
    while (!(fLsh.isCompleted && fCc.isCompleted)) {
      samples ::= spark.conf.get(key)
      Thread.sleep(20)
    }
    val pairs = Await.result(fLsh, 2.minutes)
    val cc = Await.result(fCc, 2.minutes)
    assert(samples.forall(_ == before), s"caller AQE conf flickered: ${samples.distinct}")
    assert(spark.conf.get(key) == before)
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("connectedComponents throws instead of returning split components") {
    // a 6-chain has diameter 5 — maxIter = 2 cannot converge; silently
    // returning would split the component into multiple cluster labels
    val vertices = (1L to 6L).toDF("doc_id")
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    assertThrows[IllegalStateException](
      Dedup.connectedComponents(vertices, "doc_id", edges, "id_a", "id_b", maxIter = 2))
  }

  test("retain keeps one best-scored doc per cluster, id tie-break") {
    val scored = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 2L), (5L, 7L))
      .toDF("doc_id", "n_tokens")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.retain(scored, "doc_id", clusters, "n_tokens")
      .select($"cluster_id", $"doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster 1: docs 2 and 3 tie at 9 tokens -> lower id 2 wins
    assert(got == Map(1L -> 2L, 4L -> 5L))
  }

  test("nearDupJaccardBlocked: exact jaccard via hashed word merge, block-bounded") {
    val d = Seq(
      (1L, "en", "web", "the quick brown fox jumps over dogs"),
      (2L, "en", "web", "the quick brown fox jumps over cats"),  // 6/8 = 0.75 vs 1
      (3L, "en", "book", "the quick brown fox jumps over dogs"), // identical text, other block
      (4L, "en", "web", "completely different words entirely here"))
      .toDF("doc_id", "lang", "source", "text")
    val got = Dedup.nearDupJaccardBlocked(d, "text", "doc_id",
      Seq("lang", "source"), threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.75))) // 3 blocked away, 4 below threshold
  }

  test("paragraphDedup: first corpus-wide chunk occurrence wins, docs reassembled") {
    val docs = Seq(
      (1L, "a b c d e f"),   // owns both its chunks
      (2L, "a b c x y z"),   // first chunk already seen in doc 1
      (3L, "a b c d e f"),   // entirely seen -> nothing survives
      (4L, "p q r s"))       // partial tail chunk "s"
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, "text", "doc_id", chunkSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got == Map(
      1L -> ((2L, 2L, Some("a b c d e f"))),
      2L -> ((2L, 1L, Some("x y z"))),
      3L -> ((2L, 0L, None)),
      4L -> ((2L, 2L, Some("p q r s")))))
  }

  test("capBlocks drops only over-full blocks, keeps the rest bit-identical") {
    val d = (1L to 20L).map(i => (i, if (i <= 15) "hot" else "cold", s"doc $i"))
      .toDF("doc_id", "blk", "text")
    val capped = Dedup.capBlocks(d, Seq("blk"), maxBlockSize = 10)
    assert(capped.filter($"blk" === "hot").count() == 0, "hot block fully dropped")
    assert(capped.filter($"blk" === "cold").count() == 5, "cold block untouched")
    val noop = Dedup.capBlocks(d, Seq("blk"), maxBlockSize = 15)
    assert(noop.count() == 20, "cap at the max block size drops nothing")
  }

  test("nearDupPrefixFilter matches the exhaustive all-pairs join exactly") {
    // Randomized corpus with planted near-dup families + noise docs; the
    // prefix-filtered join must return EXACTLY the exhaustive join's pairs
    // (the AllPairs prefix theorem promises no recall loss at any t).
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    val base = Seq.tabulate(8)(f => Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (0 until 40).map { i =>
      val fam = base(i % base.size)
      val words = fam.split(" ").toSeq
      // mutate 0-2 words so families straddle the threshold
      val mutated = words.zipWithIndex.map { case (w, j) =>
        if (rnd.nextInt(10) < 2 && j < 2) vocab(rnd.nextInt(vocab.size)) else w }
      (i.toLong, mutated.mkString(" "))
    }.toDF("doc_id", "text")
    // 0.75 exercises the integral-t·n boundary (12 tokens × 0.75 = 9): the
    // epsilon-guarded ceil must keep exact-boundary pairs (Jaccard == t).
    for (t <- Seq(0.5, 0.6, 0.7, 0.75, 0.8, 0.9)) {
      val got = Dedup.nearDupPrefixFilter(docs, "text", "doc_id", threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val exhaustive = Dedup.nearDupJaccardBlocked(
          docs.withColumn("all", lit(1)), "text", "doc_id", Seq("all"), threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == exhaustive,
        s"t=$t: prefix-filter ${got.size} pairs vs exhaustive ${exhaustive.size}")
    }
  }

  test("semanticDedup recovers planted clusters end-to-end") {
    val rnd = new scala.util.Random(11)
    val dim = 16
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val cents = Array.fill(5)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val planted = scala.collection.mutable.Map[Int, Set[Long]]()
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])]()
    var id = 0L
    for (c <- 0 until 5) {
      val members = (0 until 3 + rnd.nextInt(3)).map { _ =>
        val v = unit(cents(c).map(x => x + rnd.nextGaussian() * 0.02))
        rows += ((id, v.map(_.toFloat).toSeq)); id += 1; id - 1
      }
      planted(c) = members.toSet
    }
    val singletons = (0 until 10).map { _ =>
      rows += ((id, unit(Array.fill(dim)(rnd.nextGaussian())).map(_.toFloat).toSeq))
      id += 1; id - 1
    }.toSet
    val df = rows.toSeq.toDF("vec_id", "embedding")
    // nProbe == nLists makes the IVF probe exhaustive -> recall 1, so the
    // blocked pipeline must recover the planted partition EXACTLY (0.02
    // noise keeps within-cluster cosine ~0.999; cross-cluster stays well
    // under the 0.9 threshold for this seed).
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.9, k = 5, nLists = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val gotPartition = byCluster.values.filter(_.size > 1).toSet
    assert(gotPartition == planted.values.toSet,
      s"clusters $gotPartition != planted ${planted.values.toSet}")
    // singletons are their own cluster and kept
    val singleRows = got.filter(r => singletons(r._1))
    assert(singleRows.forall(r => r._3 == 1L && r._4), "singletons must be kept, size 1")
    // exactly one representative per cluster: the lowest id, sizes consistent
    got.groupBy(_._2).foreach { case (_, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1 && kept.head._1 == members.map(_._1).min)
      assert(members.forall(_._3 == members.length))
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantize/dequantize roundtrip within half a quantization step") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(20)(Seq.fill(32)(rnd.nextDouble() * 10 - 5)) :+
      Seq.fill(8)(3.14) // constant vector edge case (scale guard)
    val df = vecs.toDF("v")
    val got = df.select($"v",
      Similarity.dequantizeInt8(Similarity.quantizeInt8($"v")).as("rt"),
      Similarity.quantizeInt8($"v").getField("scale").as("scale")).collect()
    got.foreach { r =>
      val v = r.getSeq[Double](0); val rt = r.getSeq[Double](1)
      val tol = r.getDouble(2) / 2 + 1e-12
      v.zip(rt).foreach { case (a, b) =>
        assert(math.abs(a - b) <= tol, s"$a vs $b (tol $tol)") }
    }
  }

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(2.0, 4.0)),
      (Seq(1.0, 0.0), Seq(0.0, 3.0)),
      (Seq(1.0, 1.0), Seq(-1.0, -1.0))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("topKBrute returns self as rank-1 on the corpus") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val top = Similarity.topKBrute(emb, "vec_id", "embedding", q, k = 5).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
    // scores non-increasing
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("topKBatch agrees with topKBrute per query") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val batch = Similarity.topKBatch(emb, queries, "vec_id", "embedding", "query_id", k = 5)
      .collect().groupBy(_.getLong(0))
    (0L to 1L).foreach { qid =>
      val q = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
      val brute = Similarity.topKBrute(emb, "vec_id", "embedding", q, k = 5)
        .collect().map(_.getLong(0)).toSeq
      val got = batch(qid).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
      assert(got == brute, s"query $qid: $got vs $brute")
    }
  }

  test("groupCentroids: element-wise mean per group, order preserved") {
    val df = Seq((0, Seq(1.0f, 2.0f)), (0, Seq(3.0f, 6.0f)), (1, Seq(10.0f, 20.0f)))
      .toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) == Seq(2.0, 4.0))
    assert(got(1) == Seq(10.0, 20.0))
  }

  test("IVF index partitions the corpus; probe finds self as top-1") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
    // every vector lands in exactly one list
    assert(index.count() == emb.count())
    assert(index.select("list_id").distinct().count() <= 8)
    val q = emb.filter($"vec_id" === 11)
      .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val got = Similarity.topKIvf(index, "vec_id", "embedding", q, k = 3, nProbe = 4)
      .collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(0) == 11L, s"self must rank first, got ${got.head}")
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("ivfIndex assignment is the true argmin over seed centroids") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
    // brute-force check: for each vector, cosine to its assigned seed is
    // the max over all seeds (ties -> lowest list_id); seeds are the 8
    // vectors of smallest md5(id) rank (round-10 hash-rank seeding)
    val seeds = emb.orderBy(md5($"vec_id".cast("string")), $"vec_id").limit(8)
      .select($"embedding".cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 0.0 else dot / (na * nb)
    }
    index.select($"vec_id", $"embedding".cast("array<double>"), $"list_id")
      .collect().take(50).foreach { r =>
        val v = r.getSeq[Double](1)
        val assigned = r.getInt(2)
        val best = seeds.zipWithIndex
          .map { case (c, i) => (1.0 - cos(v, c), i + 1) }.min
        assert(assigned == best._2,
          s"vec ${r.getLong(0)}: assigned $assigned, argmin ${best._2}")
      }
  }

  test("LSH probe recall: top-1 (self) survives bucketing") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 7)
      .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val got = Similarity.topKLsh(emb, "vec_id", "embedding", q, k = 3,
      dim = 64, bits = 16, hammingRadius = 4).collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(0) == 7L, "self must be in its own bucket at radius 0")
  }

  test("kCenterGreedy covers planted far clusters and is partition-invariant") {
    // 3 tight blobs far apart + the seed's blob first: the k=3 coreset
    // must contain exactly one exemplar per blob (diversity), regardless
    // of input partitioning (determinism).
    val rnd = new scala.util.Random(13)
    val centers = Seq(Array(0.0, 0.0), Array(100.0, 0.0), Array(0.0, 100.0))
    val pts = (0 until 30).map { i =>
      val c = centers(i % 3)
      (i.toLong, Seq(c(0) + rnd.nextGaussian() * 0.1, c(1) + rnd.nextGaussian() * 0.1))
    }
    val df = pts.toDF("vec_id", "embedding")
    def blobOf(id: Long) = (id % 3).toInt
    Seq(1, 7).foreach { nPart =>
      val got = Similarity.kCenterGreedy(df.repartition(nPart), "vec_id", "embedding", k = 3)
        .orderBy($"rank").collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(x => blobOf(x._2)).toSet == Set(0, 1, 2),
        s"nPart=$nPart: coreset $got does not cover all blobs")
      assert(got.head._2 == 0L && got.head._3 == 0.0, "seed = lowest id at dist 0")
      assert(got(1)._3 > got(2)._3, "selection distances strictly shrink on spread blobs")
    }
  }

  test("topKLshBatch matches per-query topKLsh for every query in the batch") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val batch = Similarity.topKLshBatch(emb, queries, "vec_id", "embedding",
      "query_id", k = 5, dim = 64, bits = 16, hammingRadius = 5)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq)
      .toMap
    (0L until 3L).foreach { qid =>
      val q = emb.filter($"vec_id" === qid)
        .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
      val single = Similarity.topKLsh(emb, "vec_id", "embedding", q, k = 5,
        dim = 64, bits = 16, hammingRadius = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"query $qid: batch/single divergence")
    }
  }

  test("PQ/ADC: deterministic books, code range, Lloyd monotone, self-query recall") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val m = 8; val kCodes = 16
    val seedBooks = Similarity.pqTrain(emb, "vec_id", "embedding", m, kCodes, iters = 0)
    val books  = Similarity.pqTrain(emb, "vec_id", "embedding", m, kCodes, iters = 2)
    val books2 = Similarity.pqTrain(emb, "vec_id", "embedding", m, kCodes, iters = 2)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq, "deterministic")
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    assert(codes.select(explode($"codes").as("c"))
      .filter($"c" < 0 || $"c" >= kCodes).count() == 0)
    // Lloyd is monotone in quantization MSE: trained books reconstruct the
    // corpus at least as well as the raw seed codebooks
    val vecs = emb.select($"vec_id", $"embedding".cast("array<double>"))
      .collect().map(r => r.getSeq[Double](1).toArray)
    def mse(bk: Array[Array[Array[Double]]]): Double = {
      val dsub = bk(0)(0).length
      vecs.map { v =>
        (0 until m).map { s =>
          val sv = v.slice(s * dsub, (s + 1) * dsub)
          bk(s).map(cw => sv.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum).min
        }.sum
      }.sum / vecs.length
    }
    assert(mse(books) <= mse(seedBooks) + 1e-9,
      s"trained ${mse(books)} vs seeds ${mse(seedBooks)}")
    // self-query: querying with vector 0 must put id 0 in the ADC top-10
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val top = Similarity.pqTopKAdc(codes, "vec_id", q, books, k = 10)
      .select("vec_id").as[Long].collect()
    assert(top.contains(0L), s"self not in ADC top-10: ${top.mkString(",")}")
  }

  test("knnGraphBlocked: recall vs exact graph, exact cosines, no corpus broadcast") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
      .select($"id", $"nbr_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val exactEdges = exact.map(r => (r._1, r._2)).toSet
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    val blocked = Similarity.knnGraphBlocked(emb, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 8)
      .select($"id", $"nbr_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    // every vector still gets k neighbours; scores are EXACT cosines (the
    // approximation is only in which candidates were considered)
    assert(blocked.length == exactEdges.size)
    blocked.foreach { case (id, nbr, c) =>
      exactCos.get((id, nbr)).foreach(e => assert(math.abs(c - e) < 1e-9)) }
    val hits = exactEdges.count(e => blocked.exists(b => (b._1, b._2) == e))
    val recall = hits.toDouble / exactEdges.size
    assert(recall >= 0.7, s"IVF kNN recall $recall ($hits/${exactEdges.size})")
    // Lloyd-trained centroids + multiple assignment (the s7 harness
    // config, scaled to this corpus): recall must beat the plain config —
    // this is the knob pair the operator exists to expose.
    val trained = Similarity.knnGraphBlocked(emb, "vec_id", "embedding",
        k = 3, nLists = 16, nProbe = 4, trainIters = 2, memberAssign = 3)
      .select($"id", $"nbr_id").as[(Long, Long)].collect().toSet
    val tHits = exactEdges.count(trained.contains)
    val tRecall = tHits.toDouble / exactEdges.size
    assert(tRecall >= 0.85,
      s"trained multi-assign kNN recall $tRecall ($tHits/${exactEdges.size})")
  }

  test("chooseProbeBudget: maximal within budget, skew-aware, floor") {
    // uniform occupancy, 64 lists: fraction = p*m/64, budget 0.4 -> the
    // product must be the max <= 25.6 and the estimate must respect it
    val uniform = Array.fill(64)(100L)
    val (p, m, frac) = Similarity.chooseProbeBudget(uniform, 0.4,
      maxProbe = 32, maxAssign = 4)
    assert(frac <= 0.4, s"estimate $frac over budget")
    assert(p * m == 25, s"not maximal: p=$p m=$m (${p * m})")
    assert(p >= m, "ties must prefer probe fan-out over index multiplication")
    // one hot list holding half the corpus: sum(c^2) quadruples vs
    // uniform, so the same budget must buy a smaller probe product
    val skewed = Array.fill(64)(50L); skewed(0) = 3250L
    val (ps, ms, fracS) = Similarity.chooseProbeBudget(skewed, 0.4,
      maxProbe = 32, maxAssign = 4)
    assert(fracS <= 0.4)
    assert(ps * ms < p * m, s"skew ignored: uniform ${p * m}, skewed ${ps * ms}")
    // budget below the minimum configuration: fall to the (1,1) floor
    val (pf, mf, _) = Similarity.chooseProbeBudget(uniform, 1e-9,
      maxProbe = 32, maxAssign = 4)
    assert((pf, mf) == (1, 1))
  }

  test("knnGraphBlockedAuto: bounded candidates still deliver recall, exact cosines") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val exact = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
      .select($"id", $"nbr_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    val exactEdges = exact.map(r => (r._1, r._2)).toSet
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    val auto = Similarity.knnGraphBlockedAuto(emb, "vec_id", "embedding",
        k = 3, nLists = 16, trainIters = 2, maxCandidateFraction = 0.4)
      .select($"id", $"nbr_id", $"cosine")
      .as[(Long, Long, Double)].collect()
    // full k per vector, candidate scores are EXACT cosines
    assert(auto.length == exactEdges.size)
    auto.foreach { case (id, nbr, c) =>
      exactCos.get((id, nbr)).foreach(e => assert(math.abs(c - e) < 1e-9)) }
    val recall = exactEdges.count(e => auto.exists(b => (b._1, b._2) == e))
      .toDouble / exactEdges.size
    // structureless corpus at 0.4x all-pairs: the budget must still buy
    // useful recall (sf0.1 measures 0.81-0.84; this corpus is smaller)
    assert(recall >= 0.7, s"auto kNN recall $recall under 0.4 budget")
  }

  test("embeddingNearDupBlocked: top-pair recall vs exact all-pairs baseline") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val exactPairs = Dedup.embeddingTopPairs(emb, "vec_id", "embedding", k = 50)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.embeddingNearDupBlocked(emb, "vec_id", "embedding",
        k = 50, nLists = 16, nProbe = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(blocked.size == 50)
    val hits = exactPairs.count(blocked.contains)
    val recall = hits.toDouble / exactPairs.size
    // near-dup pairs have cosine ≈ 1 → both endpoints probe near-identical
    // list sets, so pair recall sits far above the kNN recall floor
    assert(recall >= 0.85, s"blocked near-dup recall $recall ($hits/${exactPairs.size})")
  }

  test("embeddingNearDupBlocked: heap funnel ≡ legacy dropDuplicates funnel (pair-for-pair), negative id fails loudly") {
    // Integral ids route through the packed bounded-heap funnel; string
    // ids keep the legacy dropDuplicates+orderBy funnel. Fixed-width ids
    // (100..) make string order == numeric order, so the two paths must
    // agree TUPLE-FOR-TUPLE including the (cosine desc, id_a, id_b) tie
    // order and the k-th-boundary cut.
    val rnd = new scala.util.Random(7)
    val emb = (0 until 300).map { i =>
      (100L + i, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val viaHeap = Similarity.embeddingNearDupBlocked(emb, "vec_id", "embedding",
        k = 40, nLists = 6, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaLegacy = Similarity.embeddingNearDupBlocked(
        emb.withColumn("vec_id", $"vec_id".cast("string")), "vec_id", "embedding",
        k = 40, nLists = 6, nProbe = 2)
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong, r.getDouble(2))).toSeq
    assert(viaHeap.size == 40)
    assert(viaHeap == viaLegacy)
    // ids outside [0, 2^31) cannot pack — loud failure, not wrong order
    val bad = Seq((-1L, Seq.fill(16)(0.5f)), (5L, Seq.fill(16)(0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.embeddingNearDupBlocked(bad, "vec_id", "embedding", k = 5).collect()
    }
    assert(e.getMessage != null)
  }

  test("rrfFuse: hand-computed reciprocal-rank scores, one-list members, tie-break, k-cut") {
    // lex: (1,r1) (2,r2) (3,r3); vec: (2,r1) (4,r2) (3,r3)
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1), (4L, 2), (3L, 3)).toDF("doc_id", "rank")
    val got = Similarity.rrfFuse(lex, vec, "doc_id", k = 10, c0 = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2),
        r.getBoolean(3), r.getInt(4)))
    def rr(r: Int) = 1.0 / (60 + r)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // doc2 in both lists (r2+r1), doc3 in both (r3+r3), doc1/doc4 single-list
    assert(got.toSeq == Seq(
      (2L, r6(rr(2) + rr(1)), true, true, 1),
      (3L, r6(rr(3) + rr(3)), true, true, 2),
      (1L, r6(rr(1)), true, false, 3),
      (4L, r6(rr(2)), false, true, 4)))
    // equal-rrf tie breaks by id; k cuts after ordering
    val a = Seq((7L, 1), (9L, 2)).toDF("doc_id", "rank")
    val b = Seq((9L, 1), (7L, 2)).toDF("doc_id", "rank")
    val tied = Similarity.rrfFuse(a, b, "doc_id", k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(7L))
  }

  test("IVF-PQ probe: results come only from probed lists; self-query recall") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val index = Similarity.ivfIndex(emb, "vec_id", "embedding")
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head.getSeq[Double](0)
    val got = Similarity.topKIvfPq(index, codes, "vec_id", "embedding", q, books,
      k = 10, nProbe = 4)
    val ids = got.select("vec_id").as[Long].collect().toSeq
    assert(ids.size == 10 && ids.contains(0L), s"self not recalled: $ids")
    // containment: every result id belongs to one of the probed lists —
    // compare against the full-corpus ADC ranking restricted the same way
    val full = Similarity.pqTopKAdc(codes, "vec_id", q, books, k = 500)
      .select($"vec_id", $"adc_dist").as[(Long, Double)].collect().toMap
    val dists = got.select($"vec_id", $"adc_dist").as[(Long, Double)].collect()
    dists.foreach { case (id, d) => assert(full(id) == d, "ADC scores agree") }
  }
}
