package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Prune, Similarity, Text}

/** Training-data pipeline operators over the `documents` and `embeddings`
  * corpus tables: deduplication, text analysis, similarity search, and
  * multimodal-column plumbing. Oracle-expressible ops carry DuckDB twins;
  * signature-based ops (MinHash/SimHash/LSH — engine-specific hashes) are
  * rows-only checked and verified by ScalaTest invariants instead.
  */
object TrainingQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Absolute row cap for the O(N²)/O(N·k) EXACT-verification twins inside
    * the hash-gated sketch/ANN queries (d2, d5, d13, s2, s5, s7). Each
    * twin verifies its pipeline's contract on a deterministic
    * [[graft.functions.Text.hashSampleCapFilter]] slice of at most ~this
    * many rows, so twin cost is O(cap²) INDEPENDENT of corpus size — the
    * gate survives any SF while the production path still runs on the
    * full corpus. At the driver's gate/bench scales (500 docs at sf0.01,
    * 2000 embeddings at sf0.1) the cap keeps the whole corpus, so the
    * contract there is byte-identical to the unsampled form; only the
    * 5000-doc sf0.1 documents table (and anything bigger) actually
    * samples. The DuckDB oracles rebuild the identical slice via
    * [[twinSampleSql]]. */
  private val TwinSampleCap = 2000L

  /** Per-application scratch dir for the write-path gate queries
    * (s14/s16/k5/k6/k7/k8): the applicationId suffix isolates concurrent
    * runs/users (round-9 ADVICE item) while staying deterministic within
    * a run, and every registered dir is recursively REMOVED by one JVM
    * shutdown hook — without it each bench/gate/plan-audit run leaks six
    * parquet-filled directories into java.io.tmpdir until the disk fills. */
  private[graft] object Scratch {
    private val dirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    private lazy val hookInstalled: Unit =
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.forEach(p => rm(new java.io.File(p)))))
    private def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    def dir(s: SparkSession, tag: String): String = {
      hookInstalled
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_" +
        s.sparkContext.applicationId
      dirs.add(path)
      path
    }
  }

  /** d15's shared at-rest round trip: write the band table partitioned by
    * band + the shingle table, read both back, probe with the batch (the
    * gated query and its production-only bench variant differ only in
    * whether a rebuild twin is also run). */
  private def d15WriteAndProbe(s: SparkSession, tmp: String,
                               bandsDf: DataFrame, shinglesDf: DataFrame,
                               batch: DataFrame): DataFrame = {
    bandsDf.write.mode("overwrite").partitionBy("band").parquet(s"$tmp/bands")
    shinglesDf.write.mode("overwrite").parquet(s"$tmp/shingles")
    Dedup.incrementalNearDup(batch, "text", "doc_id",
      s.read.parquet(s"$tmp/bands"), s.read.parquet(s"$tmp/shingles"),
      threshold = 0.4)
  }

  /** Driver-side corpus count + matching sample predicate — ONE metadata
    * count action per gate query at build time (parquet row-group counts,
    * no data scan). */
  private def twinSample(df: DataFrame, idCol: String): (Long, DataFrame) = {
    val n = df.count()
    (n, df.filter(Text.hashSampleCapFilter(col(idCol), n, TwinSampleCap)))
  }

  /** The DuckDB form of [[graft.functions.Text.hashSampleCapFilter]] over
    * `table`: same short-circuit, same floor/clamp arithmetic (verified
    * cut-for-cut against the Scala formula), so oracle and engine slice
    * identically at every SF. */
  private def twinSampleSql(table: String, idCol: String): String =
    s"(SELECT count(*) FROM $table) <= $TwinSampleCap OR " +
      s"substr(md5(CAST($idCol AS VARCHAR)), 1, 4) < " +
      s"(SELECT printf('%04x', least(65535, CAST(floor(65536.0 * $TwinSampleCap.0 " +
      s"/ count(*)) AS BIGINT) + 1)) FROM $table)"

  /** Word-4-gram shingles of every document — shared by the
    * decontamination pair (t11 exact join, t22 bloom pre-filter). */
  private def shingles4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", split(Text.normalize($"text"), " ").as("words"))
      .filter(size($"words") >= 4)
      .select($"doc_id", explode(transform(sequence(lit(0), size($"words") - 4),
        i => concat_ws(" ", element_at($"words", i + 1), element_at($"words", i + 2),
          element_at($"words", i + 3), element_at($"words", i + 4)))).as("shingle"))
  }

  /** Shared verdict harness for the PQ family (s8/s9): exact squared-L2
    * top-10 payload (the q·q + v·v − 2·v·q expansion folds identically in
    * DuckDB's list_dot_product) plus the (self-hit, non-negative,
    * error ≤ 2.5) verdicts over whichever ADC result `got` carries. */
  private def adcVerdicts(s: SparkSession, emb: DataFrame, got: DataFrame,
                          q: Seq[Double], selfCol: String): DataFrame = {
    import s.implicits._
    val qLit = array(q.map(lit): _*)
    def l2sq(v: org.apache.spark.sql.Column) =
      round((Similarity.dot(qLit, qLit) + Similarity.dot(v, v))
        - lit(2.0) * Similarity.dot(v, qLit), 6)
    val exactAll = emb.select($"vec_id",
      l2sq($"embedding".cast("array<double>")).as("l2sq"))
    val exactTop = exactAll.orderBy($"l2sq".asc, $"vec_id".asc).limit(10)
    val stats = got.join(exactAll, "vec_id")
      .agg(max(abs($"adc_dist" - $"l2sq")).as("max_err"),
           min($"adc_dist").as("min_adc"),
           sum(when($"vec_id" === 0, 1L).otherwise(0L)).as("n_self"))
    exactTop.crossJoin(broadcast(stats))
      .select($"vec_id", $"l2sq",
        ($"n_self" === 1L).as(selfCol),
        ($"min_adc" >= 0.0).as("adc_nonneg"),
        ($"max_err" <= 2.5).as("adc_err_ok"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- deduplication -----------------------------------------------------

    // D1: exact dedup by content fingerprint (hash-groupBy, one shuffle)
    "d1_exact_dedup" -> ((s, dir) => {
      import s.implicits._
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select($"doc_id", $"dup_count")
    }),

    // D2: MinHash+LSH near-dup pairs, verified in the signature's own
    // bigram-shingle space, HASH-GATED via the a13/a20 bound-verdict
    // pattern (round 9): the DRIVER-CHECKED output is one row of
    // deterministic exact columns (doc count + the exact bigram-Jaccard
    // ≥ 0.4 pair count, which DuckDB recomputes independently) plus two
    // in-plan contract verdicts against an oracle that emits `true` —
    // precision_ok (every LSH-found pair is in the exact pair set; the
    // shingle-space verification makes this structural) and recall_ok
    // (LSH finds ≥ 70% of the exact pairs; measured 1.0 at sf0.01 and
    // sf0.1 — detection probability at 16 bands × 4 rows is ≥ 0.89 for
    // pairs above Jaccard 0.6, and the corpus's true pairs sit well
    // above that).
    // SF-PROOF TWIN (round 10): the exact all-pairs twin — and both
    // verdicts — run on a deterministic ≤~TwinSampleCap hash slice
    // (keep-all at gate SF, where the slice IS the corpus), so the twin
    // stays O(cap²) at any corpus size; the LSH production path always
    // sees the full corpus. Both verdict counters come from ONE full
    // outer join (found-in-slice vs exact-in-slice), which also removes
    // the old double evaluation of the twin (count + hit-join).
    // reuseSignatures: the plan references the signature relation
    // several times — persisting it tokenizes/hashes the corpus ONCE.
    "d2_minhash_lsh_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val found = Dedup.nearDupMinhashLsh(docs, "text", "doc_id",
        n = 2, k = 64, bands = 16, threshold = 0.4, reuseSignatures = true)
      val (_, samp) = twinSample(docs, "doc_id")
      val exact = Dedup.jaccardAllPairsAbove(samp, "text", "doc_id",
        threshold = 0.4, ngram = 2)
      // LSH pairs restricted to the slice (both endpoints sampled): the
      // slice id set is ≤ ~cap rows by construction, so broadcast.
      val sampIds = samp.select($"doc_id")
      val foundS = found.select($"id_a", $"id_b")
        .join(broadcast(sampIds.select($"doc_id".as("id_a"))), Seq("id_a"))
        .join(broadcast(sampIds.select($"doc_id".as("id_b"))), Seq("id_b"))
      val stats = foundS.withColumn("__f", lit(1))
        .join(exact.select($"id_a", $"id_b").withColumn("__e", lit(1)),
          Seq("id_a", "id_b"), "full")
        .agg(count($"__f").as("n_found"), count($"__e").as("n_exact"),
          count(when($"__f".isNotNull && $"__e".isNotNull, 1)).as("n_hit"))
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(stats))
        .select($"n_docs", $"n_exact".as("n_exact_pairs"),
          ($"n_hit" === $"n_found").as("precision_ok"),
          ($"n_exact" === 0 || $"n_hit" >= $"n_exact" * lit(0.7)).as("recall_ok"))
    }),

    // D3: SimHash within-language Hamming≤8 near-dup pairs, candidates via
    // pigeonhole chunk blocking (9 disjoint signature chunks: a pair within
    // radius 8 must agree exactly on at least one chunk). HASH-GATED
    // (round 9): the blocking's losslessness claim — same pairs as the
    // naive per-language all-pairs Hamming join — is now an IN-PLAN
    // verdict per language (`pairs_match_naive`: per-lang pair counts are
    // equal; the blocked set is structurally ⊆ the naive set since every
    // blocked pair already passed the Hamming filter, so count equality
    // ⇒ set equality) against an oracle emitting `true` per language
    // with deterministic per-lang doc counts as payload. The naive twin
    // is the verdict harness; the production path is the blocked
    // pipeline alone.
    // SF-PROOF SLICE (round 13 — the sf10 campaign's find): the naive
    // Hamming twin below is a per-language ALL-PAIRS join; at sf10 (200k
    // en docs → 2e10 hamming evals) d3 alone took 28 of the gate's 126
    // minutes. Same seam as d4/d5/d16: BOTH sides run on the md5-capped
    // slice (keep-all at gate SF via the count short-circuit), so twin
    // cost is O(cap²) at any corpus size; the full-corpus blocked path
    // stays benched via productionOnly.
    "d3_simhash_neardup" -> ((s, dir) => {
      import s.implicits._
      val all = t(s, dir, "documents")
      val (_, docs) = twinSample(all, "doc_id")
      val blocked = Dedup.simhashNearDup(docs, "text", "doc_id",
        radius = 8, blockCols = Seq("lang"))
      val sigs = docs.select($"doc_id".as("id"), $"lang", Dedup.simHash($"text").as("sig"))
      val naive = sigs.as("a").join(sigs.as("b"),
          col("a.lang") === col("b.lang") && col("a.id") < col("b.id") &&
            Dedup.hamming64(col("a.sig"), col("b.sig")) <= 8)
        .groupBy(col("a.lang").as("lang")).agg(count(lit(1)).as("n_naive"))
      val blockedPerLang = blocked
        .join(docs.select($"doc_id".as("id_a"), $"lang"), "id_a")
        .groupBy($"lang").agg(count(lit(1)).as("n_blocked"))
      docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        .join(naive, Seq("lang"), "left")
        .join(blockedPerLang, Seq("lang"), "left")
        .select($"lang", $"n_docs",
          (coalesce($"n_blocked", lit(0L)) === coalesce($"n_naive", lit(0L)))
            .as("pairs_match_naive"))
    }),

    // D4: blocked exhaustive n-gram(1) Jaccard near-dup pairs — the
    // quadratic baseline bounded by the (lang, source) blocking key;
    // fully oracle-expressible with DuckDB list functions.
    // SF-PROOF SLICE (round 11, same seam as d9): ≥0.8 word-set Jaccard is
    // quadratic-DENSE on this corpus (30-word vocab — at sf1 the full
    // blocked answer is 3.9M pairs and grows as N²), so the whole
    // word-set-pair family (d4 pairs, d6 clusters, d7 retention, d8
    // triangles — triangles are CUBIC in the near-clique blocks) gates on
    // the hash-sampled slice. Keep-all at gate SF via the count
    // short-circuit.
    "d4_jaccard_blocked" -> ((s, dir) => {
      Dedup.nearDupJaccardBlocked(twinSample(t(s, dir, "documents"), "doc_id")._2,
        "text", "doc_id", blockCols = Seq("lang", "source"), threshold = 0.8)
    }),

    // D5: embedding-cosine near-dup via IVF multi-probe blocking
    // (candidates share a probed inverted list — self-join on list_id, no
    // driver collect of the corpus; survivors score exact cosine, global
    // top-50). HASH-GATED (round 9): payload = the EXACT top-50 pairs
    // (deterministic: round-6 cosine with id tie-break; DuckDB recomputes
    // them from all-pairs), verdict = recall_ok (the IVF path finds ≥ 40
    // of the exact 50; measured 47/50 at sf0.01 and 50/50 at sf0.1;
    // precision is structural — survivors carry exact cosine).
    // SF-PROOF TWIN (round 10): the all-pairs exact twin and the recall
    // contract run on the deterministic ≤~TwinSampleCap hash slice
    // (keep-all through sf0.1, where embeddings ≤ cap — identical to the
    // unsampled form there). Above the cap the pipeline runs TWICE: once
    // on the slice (recall contract vs the slice-exact twin, O(cap²))
    // and once on the full corpus — the production run, pinned by
    // full_pipeline_ok (it still yields its complete top-50). Both slice
    // counters come from one full outer join (single twin evaluation).
    "d5_embedding_neardup" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val (nVec, samp) = twinSample(emb, "vec_id")
      val annS = Similarity.embeddingNearDupBlocked(samp,
        "vec_id", "embedding", k = 50, nLists = 16, nProbe = 4)
      val exact = Dedup.embeddingTopPairs(samp, "vec_id", "embedding", k = 50)
      val stats = annS.select($"id_a", $"id_b").withColumn("__f", lit(1))
        .join(exact.select($"id_a", $"id_b").withColumn("__e", lit(1)),
          Seq("id_a", "id_b"), "full")
        .agg(count(when($"__f".isNotNull && $"__e".isNotNull, 1)).as("n_hit"),
          count($"__f").as("n_ann_s"))
      val withFull =
        if (nVec <= TwinSampleCap)
          // slice == corpus: the slice run IS the production run — derive
          // the verdict from the same one-row aggregate, no second pass
          stats.withColumn("__full_ok", $"n_ann_s" === 50L)
        else
          // Full-corpus production run (coverage verdict only — the
          // recall contract lives on the slice): sqrt(N)-floored lists
          // keep the per-list self-join sub-quadratic (round 11; the
          // fixed 16-list form scored ~all pairs at 20k vectors, 39 s).
          stats.crossJoin(broadcast(
            Similarity.embeddingNearDupBlocked(emb, "vec_id", "embedding",
                k = 50,
                nLists = math.max(16,
                  math.ceil(math.sqrt(nVec.toDouble)).toInt),
                nProbe = 4)
              .agg((count(lit(1)) === 50L).as("__full_ok"))))
      exact.crossJoin(broadcast(withFull))
        .select($"id_a", $"id_b", $"cosine", ($"n_hit" >= 40L).as("recall_ok"),
          $"__full_ok".as("full_pipeline_ok"))
    }),

    // ---- text analysis -----------------------------------------------------

    // T1: token counting + quality metrics (whitespace + BPE-ish counts,
    // punct/stopword ratios, mean word length, composite quality score)
    "t1_text_metrics" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          Text.tokenCountWs($"text").cast("long").as("n_tokens_ws"),
          Text.tokenCountBpe($"text").cast("long").as("n_tokens_bpe"),
          round(Text.punctRatio($"text"), 6).as("punct_ratio"),
          round(Text.stopwordRatio($"text"), 6).as("stopword_ratio"),
          round(Text.meanWordLen($"text"), 6).as("mean_word_len"),
          Text.qualityScore($"text").as("quality"))
    }),

    // T2: document fingerprinting (md5 of normalized text — rolling-hash
    // class; dedup key of D1)
    "t2_fingerprint" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", Text.fingerprintMd5($"text").as("fingerprint"))
    }),

    // T3: language ID by marker-stopword voting, deterministic priority
    // tie-break (en > fr > es > de > zh)
    "t3_langid" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id", $"lang".as("true_lang"), Text.langId($"text").as("pred_lang"))
    }),

    // ---- similarity search -------------------------------------------------

    // S1: brute-force cosine top-10 for a batch of query vectors (the first
    // 3 embeddings by vec_id), ranked on round-6 cosine for cross-engine
    // rank stability.
    "s1_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
      Similarity.topKBatch(emb, queries, "vec_id", "embedding", "query_id", k = 10)
    }),

    // S2: LSH-bucketed ANN probe (hyperplane signatures, hamming ≤ 6
    // multi-probe over 16 bits ≈ 23% of buckets touched) — the scale path
    // for S1. HASH-GATED (round 9): payload = the exact top-10 per query
    // (same deterministic shape as s1), verdicts = self_hit_ok (every
    // query's own vector survives its LSH probe — hamming(sig, sig) = 0,
    // structural) and recall_ok (min per-query overlap with the exact
    // top-10 ≥ 2/10; measured 4–8/10 on this deliberately structureless
    // corpus — hyperplane LSH tracks cosine, and a clustered real corpus
    // probes far better at the same radius). Exact twin = verdict
    // harness; production = the bucketed probe alone.
    // SF-PROOF TWIN (round 10): the exact-top-k twin (a full-corpus
    // scan) and the recall contract run on the deterministic
    // ≤~TwinSampleCap hash slice — keep-all through sf0.1, so identical
    // there. self_hit_ok always comes from the PRODUCTION probe over the
    // full corpus (queries are taken from the full table, so above the
    // cap the probe runs once per side: slice for recall, full for
    // self-hit — the twin scan stays O(cap) forever).
    "s2_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
      val (nVec, samp) = twinSample(emb, "vec_id")
      val lsh = Similarity.topKLshBatch(emb, queries, "vec_id", "embedding",
        "query_id", k = 10, dim = 64, bits = 16, hammingRadius = 6)
      val lshS =
        if (nVec <= TwinSampleCap) lsh
        else Similarity.topKLshBatch(samp, queries, "vec_id", "embedding",
          "query_id", k = 10, dim = 64, bits = 16, hammingRadius = 6)
      val exact = Similarity.topKBatch(samp, queries, "vec_id", "embedding",
        "query_id", k = 10)
      val perQ = lshS.select($"query_id", $"vec_id")
        .join(exact.select($"query_id", $"vec_id"), Seq("query_id", "vec_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hit"))
      val minRec = queries.select($"query_id")
        .join(perQ, Seq("query_id"), "left")
        .agg(min(coalesce($"n_hit", lit(0L))).as("min_hit"))
      val selfHits = lsh.filter($"query_id" === $"vec_id")
        .agg(count(lit(1)).as("n_self"))
      exact.crossJoin(broadcast(minRec)).crossJoin(broadcast(selfHits))
        .select($"query_id", $"vec_id", $"cosine", $"rank",
          ($"min_hit" >= 2L).as("recall_ok"), ($"n_self" === 3L).as("self_hit_ok"))
    }),

    // S3: embedding stats — norm + per-label centroid distance (zip_with /
    // aggregate arithmetic over array<float> at scale, no UDF)
    "s3_embedding_norms" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"vec_id",
          round(Similarity.norm($"embedding".cast("array<double>")), 6).as("l2_norm"),
          round(element_at($"embedding", 1).cast("double"), 6).as("first_dim"))
    }),

    // S4: per-label centroid components — the distributed element-wise
    // array mean ((label, pos, value) triples, one shuffle; never collects
    // vectors). Long format for the cross-engine hash compare.
    "s4_label_centroids" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "embeddings")
        .select($"label".cast("long").as("label"),
          posexplode($"embedding".cast("array<double>")).as(Seq("pos0", "v")))
        .groupBy($"label", ($"pos0" + 1).cast("long").as("pos"))
        .agg(round(avg($"v"), 6).as("mean_v"))
    }),

    // ---- multimodal plumbing ----------------------------------------------

    // M1: opaque binary payload column + typed metadata — the image/audio
    // pattern: binary blob, byte length, content hash, head-bytes sample.
    // (Real decode is stubbed — see functions/Multimodal.scala; the schema,
    // batching and fingerprint plumbing are real and oracle-checked.)
    // T4: deterministic hash sampling — reproducible corpus downsampling
    // (pure function of doc_id: stable across runs/engines/partitionings,
    // unlike df.sample's RNG). 12.5% = first md5 hex byte < 0x20.
    "t4_hash_sample" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter(Text.hashSampleFilter($"doc_id", 0.125))
        .select($"doc_id", $"lang", $"source")
    }),

    // T5: greedy sequence packing — assign docs to fixed token-budget packs
    // per language (the context-window packing step of an LLM data
    // pipeline). pack_id = floor(tokens-before-this-doc / budget).
    // Routed through packSequencesAuto (round-13): the corpus has ~5
    // languages, so the gate now exercises the distributed prefix-scan
    // form — the one a few-huge-groups 100 TB corpus would actually run —
    // against the same window-form oracle (outputs are identical by
    // construction; FunctionsSpec pins both regimes).
    "t5_sequence_pack" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang",
          Text.tokenCountWs($"text").cast("long").as("n_tokens"))
      Text.packSequencesAuto(docs, "lang", "doc_id", "n_tokens", budget = 2048L)
    }),

    // D6: dedup CLUSTERS — connected components over the blocked-Jaccard
    // near-dup pair graph (the post-pair step a dedup pipeline actually
    // keys retention decisions on). cluster_id = min doc_id in component.
    // Oracle: DuckDB recursive-CTE min-label closure over the same pairs.
    "d6_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      // Sliced with the d4 family (see d4): the pair graph is dense at
      // scale and the oracle's recursive closure is edge×iteration bound.
      val docs = twinSample(t(s, dir, "documents"), "doc_id")._2
      val edges = Dedup.nearDupJaccardBlocked(docs, "text", "doc_id",
        blockCols = Seq("lang", "source"), threshold = 0.8)
        .select($"id_a", $"id_b")
      Dedup.connectedComponents(docs.select($"doc_id"), "doc_id",
        edges, "id_a", "id_b")
    }),

    // D7: dedup RETENTION — the decision the whole dedup pipeline exists
    // to make: per near-dup cluster keep ONE canonical doc (longest by
    // token count, id tie-break), and report how many it displaced.
    "d7_dedup_retain" -> ((s, dir) => {
      import s.implicits._
      // Sliced with the d4 family (see d4).
      val docs = twinSample(t(s, dir, "documents"), "doc_id")._2
      val edges = Dedup.nearDupJaccardBlocked(docs, "text", "doc_id",
        blockCols = Seq("lang", "source"), threshold = 0.8)
        .select($"id_a", $"id_b")
      val clusters = Dedup.connectedComponents(docs.select($"doc_id"), "doc_id",
        edges, "id_a", "id_b")
      val scored = docs.select($"doc_id",
        Text.tokenCountWs($"text").cast("long").as("n_tokens"))
      Dedup.retain(scored, "doc_id", clusters, "n_tokens")
        .select($"cluster_id", $"doc_id", $"n_tokens")
    }),

    // M2: video frame-sampling plumbing — n evenly-spaced frame offsets
    // per media row (the decode step stays stubbed; the explode/schedule
    // arithmetic is the real Spark-side work and is oracle-checked).
    "m2_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val vids = t(s, dir, "documents").select(
        $"doc_id".as("media_id"),
        struct(lit("video").as("media_type"),
          (($"doc_id" % 30 + 1) * 1000).cast("long").as("duration_ms")).as("meta"))
      graft.functions.Multimodal.sampleFrames(vids, "media_id", n = 4)
    }),

    // M4: 2-D image tile schedule — the ViT-patching twin of m2/m3: the
    // 224×224 grid covering each image with edge tiles clipped to the
    // bounds (widths/heights derived from doc_id so the geometry — and
    // hence the oracle — is deterministic). Pure per-row double explode
    // over metadata; the pixel crop stays behind DecodeStub.
    "m4_image_tiles" -> ((s, dir) => {
      import s.implicits._
      val imgs = t(s, dir, "documents").select(
        $"doc_id".as("media_id"),
        struct(lit("image").as("media_type"),
          (($"doc_id" % 7 + 1) * 150 + 37).cast("int").as("width"),
          (($"doc_id" % 5 + 1) * 120 + 53).cast("int").as("height")).as("meta"))
      graft.functions.Multimodal.tileImages(imgs, "media_id", 224, 224)
    }),

    // S7: all-vectors kNN graph (k=3) via IVF blocking — members
    // single-assigned, every vector probes its 8 nearest of 16 lists,
    // candidates join on list_id: no corpus collect/broadcast anywhere,
    // the widest stage is a bounded bucket join. The exact broadcast-heap
    // form (Similarity.knnGraph) is the recall oracle in SimilaritySpec
    // (~0.76 on this corpus — largely unclustered vectors put IVF on the
    // probe-fraction floor; real embedding corpora cluster much harder);
    // rows-only here (IVF assignment is engine-specific).
    "s7_knn_graph" -> ((s, dir) => {
      // COST-BOUNDED auto path (round 8): (nProbe, memberAssign) are
      // derived from the trained occupancy histogram under a hard
      // candidate budget of 0.4× all-pairs, instead of the round-7
      // hardcoded (16, 3) that sat at 0.75× — the guard against silent
      // brute-force-via-join degeneration. HASH-GATED (round 9): payload
      // = the EXACT kNN graph (deterministic round-6 cosine / id
      // tie-break ranking; DuckDB recomputes it), verdict = recall_ok
      // (the blocked graph recovers ≥ 70% of the exact edges; measured
      // 0.856 at sf0.01 / 0.835 at sf0.1 on this structureless corpus —
      // the IVF worst case; clustered corpora concentrate Σc² and buy
      // more recall at the same budget).
      // SF-PROOF TWIN (round 10): the O(N²) exact graph and the recall
      // contract live on the deterministic ≤~TwinSampleCap hash slice
      // (keep-all through sf0.1). Above the cap the blocked pipeline
      // runs on the slice for the recall contract AND on the full corpus
      // as the production run, pinned by full_edges_ok (every vector got
      // its complete k neighbours). Both slice counters ride one full
      // outer join — the twin is evaluated once for stats, once as the
      // payload (was twice + payload before).
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val (nVec, samp) = twinSample(emb, "vec_id")
      // mcpv = 800 = 0.4 × the 2000-vector gate corpus — same linear
      // budget contract as d13 (no-op at gate SF, linear above it).
      val annS = Similarity.knnGraphBlockedAuto(samp, "vec_id",
        "embedding", k = 3, nLists = 64, trainIters = 2,
        maxCandidateFraction = 0.4, maxCandidatesPerVector = 800L)
      val exact = Similarity.knnGraph(samp, "vec_id", "embedding", k = 3)
      val stats = annS.select($"id", $"nbr_id").withColumn("__f", lit(1))
        .join(exact.select($"id", $"nbr_id").withColumn("__e", lit(1)),
          Seq("id", "nbr_id"), "full")
        .agg(count(when($"__f".isNotNull && $"__e".isNotNull, 1)).as("n_hit"),
          count($"__e").as("n_exact"), count($"__f").as("n_ann_s"))
      val withFull =
        if (nVec <= TwinSampleCap)
          // slice == corpus: the slice run IS the production run
          stats.withColumn("__full_ok", $"n_ann_s" === lit(nVec * 3))
        else
          stats.crossJoin(broadcast(
            Similarity.knnGraphBlockedAuto(emb, "vec_id", "embedding",
                k = 3, nLists = 64, trainIters = 2,
                maxCandidateFraction = 0.4, maxCandidatesPerVector = 800L)
              .agg((count(lit(1)) === lit(nVec * 3)).as("__full_ok"))))
      exact.crossJoin(broadcast(withFull))
        .select($"id", $"nbr_id", $"cosine", $"rank",
          ($"n_hit" >= $"n_exact" * lit(0.7)).as("recall_ok"),
          $"__full_ok".as("full_edges_ok"))
    }),

    // S5: IVF ANN probe — the partition-pruned scale path for S1: only
    // nProbe of nLists inverted lists are scored (at 100 TB the lists are
    // the list_id-partitioned files of s16, so the probe is I/O-pruned
    // too). HASH-GATED (round 9): payload = the exact top-10 for the
    // query (deterministic, DuckDB recomputes), verdicts = self_hit_ok
    // (the query's own vector is found) and recall_ok (≥ 6/10 overlap
    // with exact). SF-PROOF TWIN (round 10): exact-top-k twin + recall
    // contract on the deterministic ≤~TwinSampleCap hash slice (keep-all
    // through sf0.1); self_hit_ok always from the full-corpus production
    // probe.
    "s5_ann_ivf" -> ((s, dir) => {
      // ROUND 10: trained centroids + centroid-routed probe. The round-9
      // form probed by each list's lowest-id member vector over UNTRAINED
      // first-k seeds, and its measured 10/10 recall was structural luck:
      // the query (vec_id 0) was itself seed 1, so its home list led the
      // probe order. The md5-rank seeding (this round) removed that
      // accident and exposed the real recall of an untrained rep-routed
      // probe (3-4/10 at sf0.1, measured). The production-shaped fix is
      // the standard IVF probe: 1 Lloyd iteration on the seeds and route
      // by CENTROID distance (topKIvfPruned — the same probe the
      // index-at-rest path s16 uses), measured 10/10 (sf0.01) and 9/10
      // (sf0.1) at nProbe = 8 of 16 against the recall_ok >= 6 bound.
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val (nVec, samp) = twinSample(emb, "vec_id")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      val ivf = Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, cents, k = 10, nProbe = 8)
      val ivfS =
        if (nVec <= TwinSampleCap) ivf
        else Similarity.topKIvfPruned(
          Similarity.ivfIndexWith(samp, "vec_id", "embedding", cents),
          "vec_id", "embedding", q, cents, k = 10, nProbe = 8)
      val exact = Similarity.topKBrute(samp, "vec_id", "embedding", q, k = 10)
      val nHit = ivfS.select($"vec_id")
        .join(exact.select($"vec_id"), "vec_id").agg(count(lit(1)).as("n_hit"))
      val selfHit = ivf.filter($"vec_id" === 0).agg(count(lit(1)).as("n_self"))
      exact.crossJoin(broadcast(nHit)).crossJoin(broadcast(selfHit))
        .select($"vec_id", $"cosine",
          ($"n_hit" >= 6L).as("recall_ok"), ($"n_self" === 1L).as("self_hit_ok"))
    }),

    // S8: product quantization + ADC probe — the memory-bound ANN scale
    // path (8 code bytes per 64-dim vector): distributed Lloyd per
    // subspace, map-side encode, query scored by m table lookups per
    // vector with NO vector data read at probe time. HASH-GATED
    // (round 9): payload = the exact squared-L2 top-10 (deterministic —
    // the q·q + v·v − 2·v·q expansion folds identically in DuckDB's
    // list_dot_product), verdicts = self_hit_adc (the query's own vector
    // survives ADC ranking — its ADC distance is just its own
    // quantization error), adc_nonneg (ADC distances are sums of squared
    // sub-distances, never negative) and adc_err_ok (max |ADC − exact|
    // over the ADC top-10 ≤ 2.5; measured ≤ 1.0 at both SFs on l2sq
    // values centered ~2 — the m=8/k=16 quantization error envelope).
    "s8_pq_adc" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val adc = Similarity.pqTopKAdc(codes, "vec_id", q, books, k = 10)
      adcVerdicts(s, emb, adc, q, "self_hit_adc")
    }),

    // S9: IVF-PQ probe — the billion-vector composition: IVF prunes which
    // rows (nProbe of 16 lists), PQ prunes what is read per row (8 code
    // bytes, no vectors). HASH-GATED (round 9) with the s8 pattern:
    // exact squared-L2 top-10 payload + self_found (the query's home
    // list is always probed and its code survives ADC ranking),
    // adc_nonneg, adc_err_ok (same ≤ 2.5 quantization-error envelope —
    // IVF pruning changes WHICH rows are scored, not how).
    "s9_ivfpq_adc" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding")
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
      val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val got = Similarity.topKIvfPq(index, codes, "vec_id", "embedding", q, books, k = 10)
      adcVerdicts(s, emb, got, q, "self_found")
    }),

    // D8: triangle enumeration over the near-dup pair graph — the classic
    // distributed graph pattern (two hash-joins over the ordered edge
    // list; a < b < c canonical form keeps each triangle counted once).
    // Triangles signal dup CLUSTERS denser than pairwise chains.
    "d8_triangle_count" -> ((s, dir) => {
      import s.implicits._
      // Sliced with the d4 family (see d4): triangle enumeration over the
      // near-clique blocks is CUBIC in block size — no engine escapes a
      // cubic-sized answer; the slice is what keeps the gate runnable.
      val e = Dedup.nearDupJaccardBlocked(
        twinSample(t(s, dir, "documents"), "doc_id")._2, "text", "doc_id",
        blockCols = Seq("lang", "source"), threshold = 0.8)
        .select($"id_a", $"id_b")
      val e1 = e.as("e1"); val e2 = e.as("e2"); val e3 = e.as("e3")
      e1.join(e2, col("e1.id_b") === col("e2.id_a"))
        .join(e3, col("e3.id_a") === col("e1.id_a") && col("e3.id_b") === col("e2.id_b"))
        .select(col("e1.id_a").as("id_a"), col("e1.id_b").as("id_b"),
                col("e2.id_b").as("id_c"))
    }),

    // T8: weighted deterministic sampling (Efraimidis–Spirakis keys):
    // key = u^(1/w) with u a pure hash of the id — longer documents are
    // proportionally likelier to survive, the whole draw is reproducible,
    // and the top-k-by-key runs fully parallel (per-partition heaps, no
    // global sort at scale). Ranked on the ROUNDED key for cross-engine
    // pow-ulp stability.
    "t8_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang",
          Text.tokenCountWs($"text").cast("long").as("n_tokens"))
        .filter($"n_tokens" > 0)
      // uniform in [0,1) from a 31-bit LCG of the id — identical integer
      // arithmetic on both engines (no float RNG state)
      val u = (($"doc_id" * 1103515245L + 12345L) % 2147483648L).cast("double") /
        lit(2147483648.0)
      val w = Window.partitionBy($"lang").orderBy($"sample_key".desc, $"doc_id".asc)
      docs
        .withColumn("sample_key", round(pow(u, lit(1.0) / $"n_tokens"), 6))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter($"rank" <= 20)
        .select($"doc_id", $"lang", $"n_tokens", $"sample_key", $"rank")
    }),

    // S6: one k-means Lloyd iteration — map-side nearest-centroid assignment
    // (Similarity.ivfIndex: broadcast seed centroids, zero shuffle) + the
    // distributed element-wise mean of S4. New centroids in long format for
    // the cross-engine hash compare; seeds = the 8 vectors of smallest
    // md5(vec_id) rank (round 10 — the oracle ranks by the same md5).
    "s6_kmeans_step" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfIndex(emb, "vec_id", "embedding", nLists = 8)
        .select($"list_id".cast("long").as("list_id"),
          posexplode($"embedding".cast("array<double>")).as(Seq("pos0", "v")))
        .groupBy($"list_id", ($"pos0" + 1).cast("long").as("pos"))
        .agg(round(avg($"v"), 6).as("mean_v"))
    }),

    // T6: stratified deterministic sampling — per-language rates (en 50%,
    // fr 25%, rest 12.5%) through the same md5-bucket predicate as T4, so
    // the mix is reproducible across runs/engines/partitionings.
    "t6_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val keep = when($"lang" === "en", Text.hashSampleFilter($"doc_id", 0.5))
        .when($"lang" === "fr", Text.hashSampleFilter($"doc_id", 0.25))
        .otherwise(Text.hashSampleFilter($"doc_id", 0.125))
      t(s, dir, "documents").filter(keep).select($"doc_id", $"lang", $"source")
    }),

    // T7: per-document top-3 TF-IDF terms — corpus statistics the quality/
    // filtering stage of a training pipeline keys on. Two aggregations
    // (term counts, document frequency) + a broadcast scalar (corpus size)
    // + one per-doc window; ranking is on the ROUNDED score so the rank is
    // stable across engines' last-ulp log differences.
    "t7_tfidf_top_terms" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val tf = Dedup.spread(docs)
        .select($"doc_id", explode(split(Text.normalize($"text"), " ")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy($"doc_id").orderBy($"score".desc, $"term".asc)
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", round($"tf" * log($"n_docs" / $"df"), 6))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter($"rank" <= 3)
        .select($"doc_id", $"term", $"score", $"rank")
    }),

    // T26: Okapi BM25 retrieval (round 11) — rank the corpus against a
    // bag of query terms (here: doc 0's own terms, the "more-like-this"
    // shape) and return the top 10. The lexical-retrieval primitive that
    // completes the t7 TF-IDF / t12 unigram-LM family; see
    // Text.bm25TopK for the one-scan / one-corpus-shuffle plan shape.
    "t26_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val qTerms = docs.filter($"doc_id" === 0)
        .select(Text.normalize($"text")).head().getString(0)
        .split(" ").filter(_.nonEmpty).distinct.toSeq
      Text.bm25TopK(docs, "text", "doc_id", qTerms, k = 10)
    }),

    // T27: BM25 INDEX-AT-REST probe (round 11) — the lexical twin of the
    // s16 IVF member-table gate: posting lists are WRITTEN partitioned by
    // term-hash bucket (Text.saveBm25Index), the probe reads them back
    // through a static `bucket IN (...)` partition filter
    // (Text.bm25TopKFromIndex — file-listing pruning, PersistSpec pins
    // the plan), and the gate asserts probe-from-disk ≡ the in-memory
    // t26 form row-for-row (roundtrip_ok). Payload = the probed top-10,
    // which the oracle recomputes from raw text.
    "t27_bm25_index_probe" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val qTerms = docs.filter($"doc_id" === 0)
        .select(Text.normalize($"text")).head().getString(0)
        .split(" ").filter(_.nonEmpty).distinct.toSeq
      val tmp = Scratch.dir(s, "t27_bm25")
      Text.saveBm25Index(docs, "text", "doc_id", tmp, nBuckets = 64)
      val fromDisk = Text.bm25TopKFromIndex(
        s.read.parquet(s"$tmp/postings"), s.read.parquet(s"$tmp/stats"),
        qTerms, k = 10)
      val inMem = Text.bm25TopK(docs, "text", "doc_id", qTerms, k = 10)
      // round-12 ADVICE fix: the two paths aggregate floats in different
      // orders, so equality is (doc_id, rank) identity + an epsilon on
      // the rounded score (≤ one rounding quantum), not exact-double join
      val rt = fromDisk.select($"doc_id", $"rank", $"score".as("__sd"))
        .join(inMem.select($"doc_id", $"rank", $"score".as("__sm")),
          Seq("doc_id", "rank"))
        .filter(abs($"__sd" - $"__sm") <= 2e-6)
        .agg(count(lit(1)).as("__n_rt"))
      val nMem = inMem.agg(count(lit(1)).as("__n_mem"))
      fromDisk.crossJoin(broadcast(rt)).crossJoin(broadcast(nMem))
        .select($"doc_id", $"score", $"n_terms_hit", $"rank",
          ($"__n_rt" === $"__n_mem").as("roundtrip_ok"))
    }),

    // T28: BM25 INDEX MAINTENANCE (round 12) — the s17/d15 incremental
    // posture for the lexical side (r11 verdict "do this" #3): the base
    // corpus (doc_id % 5 ≠ 4) is written as the bucket-partitioned
    // postings table, a NEW batch (% 5 = 4) is APPENDED bucket-aligned
    // against the PERSISTED modulus (base posting files never rewritten;
    // stats merged algebraically — Text.appendBm25Index), and deletions
    // (doc_id % 17 = 3) are probe-side dl-carrying tombstones: anti-join
    // retraction + exact in-plan (N, avgdl) adjustment. Verdicts:
    // maintained probe ≡ a fresh index over the survivors (scores to one
    // rounding quantum) and no tombstoned doc surfaces. Payload = the
    // maintained top-10, which DuckDB recomputes from the raw text of
    // the surviving corpus — a REAL hash gate on the maintained path.
    "t28_bm25_maintenance" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val qTerms = docs.filter($"doc_id" === 0)
        .select(Text.normalize($"text")).head().getString(0)
        .split(" ").filter(_.nonEmpty).distinct.toSeq
      val base = docs.filter($"doc_id" % 5 =!= 4)
      val batch = docs.filter($"doc_id" % 5 === 4)
      val dlCol = size(filter(split(Text.normalize($"text"), " "),
        w => w =!= "")).cast("double")
      val tomb = docs.filter($"doc_id" % 17 === 3)
        .select($"doc_id", dlCol.as("dl"))
      val tmp = Scratch.dir(s, "t28_bm25m")
      Text.saveBm25Index(base, "text", "doc_id", tmp, nBuckets = 64)
      Text.appendBm25Index(batch, "text", "doc_id", tmp)
      val live = Text.bm25TopKFromIndex(
        s.read.parquet(s"$tmp/postings"), s.read.parquet(s"$tmp/stats"),
        qTerms, k = 10, tombstones = Some(tomb))
      val rebuilt = Text.bm25TopK(docs.filter($"doc_id" % 17 =!= 3),
        "text", "doc_id", qTerms, k = 10)
      val eq = live.select($"doc_id", $"rank", $"score".as("__sl"))
        .join(rebuilt.select($"doc_id", $"rank", $"score".as("__sr")),
          Seq("doc_id", "rank"), "full")
        .agg((count(when($"__sl".isNull || $"__sr".isNull ||
          abs($"__sl" - $"__sr") > 2e-6, 1)) === 0).as("__eq"))
      val noTomb = live.join(tomb.select($"doc_id"), Seq("doc_id"))
        .agg((count(lit(1)) === 0).as("__nt"))
      live.crossJoin(broadcast(eq)).crossJoin(broadcast(noTomb))
        .select($"doc_id", $"score", $"n_terms_hit", $"rank",
          $"__eq".as("maintained_equals_rebuild"),
          $"__nt".as("tombstones_absent"))
    }),

    // S18: HYBRID retrieval (round 11) — the standard two-stage RAG /
    // eval-mining shape: a cheap BM25 lexical shortlist (top-100, t26's
    // machinery) re-ranked by embedding cosine against the query vector,
    // blended as 0.5·(bm25/max_bm25) + 0.5·cosine. The expensive vector
    // math touches only the 100-row candidate set — at 100 TB the
    // shortlist comes from the t27 at-rest postings and the re-rank is a
    // broadcast-sized join, so the full corpus is never scanned twice.
    "s18_hybrid_retrieval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qTerms = docs.filter($"doc_id" === 0)
        .select(Text.normalize($"text")).head().getString(0)
        .split(" ").filter(_.nonEmpty).distinct.toSeq
      val qVec = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val cands = Text.bm25TopK(docs, "text", "doc_id", qTerms, k = 100)
        .select($"doc_id", $"score".as("bm25"))
      Similarity.hybridRerank(cands, "bm25", "doc_id",
        emb, "vec_id", "embedding", qVec, k = 10, alpha = 0.5)
    }),

    // S19: AT-REST retrieval COMPOSED end-to-end (round 12, r11 verdict
    // "do this" #2 / "what's wrong" #1): s18's comment claimed the 100 TB
    // shape — this query EXECUTES it. The lexical shortlist comes from
    // the t27 bucket-partitioned postings ON DISK (static `bucket IN`
    // partition filter), the vector shortlist from the s16
    // list_id-partitioned member table ON DISK (static `list_id IN`
    // partition filter, centroid-table routed), and the two top-10 lists
    // fuse by reciprocal-rank (Similarity.rrfFuse — score-free, touches
    // only 2k rows). PersistSpec captures the composed plan and pins
    // partition filters on BOTH scans. Verdicts: the disk-composed fused
    // list ≡ the same composition over in-memory frames (rank identity +
    // rrf epsilon), and the member probe itself roundtrips. Payload =
    // the postings-probed lexical top-10 (DuckDB recomputes from raw
    // text — the at-rest lexical path stays a real hash gate).
    "s19_atrest_retrieval" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val qTerms = docs.filter($"doc_id" === 0)
        .select(Text.normalize($"text")).head().getString(0)
        .split(" ").filter(_.nonEmpty).distinct.toSeq
      val qVec = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val tmp = Scratch.dir(s, "s19_atrest")
      Text.saveBm25Index(docs, "text", "doc_id", s"$tmp/bm25", nBuckets = 64)
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      Similarity.saveIvfMemberTable(emb, "vec_id", "embedding", cents, s"$tmp/ivf")
      def ranked(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(graft.operators.Relational.onePartKey($"vec_id"))
            .orderBy($"cosine".desc, $"vec_id".asc)).cast("int"))
          .withColumnRenamed("vec_id", "doc_id")
      val lexD = Text.bm25TopKFromIndex(
        s.read.parquet(s"$tmp/bm25/postings"), s.read.parquet(s"$tmp/bm25/stats"),
        qTerms, k = 10)
      val vecD = ranked(Similarity.topKIvfPruned(s.read.parquet(s"$tmp/ivf"),
        "vec_id", "embedding", qVec, cents, k = 10))
      val fusedD = Similarity.rrfFuse(lexD, vecD, "doc_id", k = 10)
      val lexM = Text.bm25TopK(docs, "text", "doc_id", qTerms, k = 10)
      val vecM = ranked(Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", qVec, cents, k = 10))
      val fusedM = Similarity.rrfFuse(lexM, vecM, "doc_id", k = 10)
      val eq = fusedD.select($"doc_id", $"rank", $"rrf".as("__fd"))
        .join(fusedM.select($"doc_id", $"rank", $"rrf".as("__fm")),
          Seq("doc_id", "rank"), "full")
        .agg((count(when($"__fd".isNull || $"__fm".isNull ||
          abs($"__fd" - $"__fm") > 2e-6, 1)) === 0).as("__eq"))
      val vrt = vecD.select($"doc_id", $"cosine".as("__cd"))
        .join(vecM.select($"doc_id", $"cosine".as("__cm")), Seq("doc_id"), "full")
        .agg((count(when($"__cd".isNull || $"__cm".isNull ||
          abs($"__cd" - $"__cm") > 2e-6, 1)) === 0).as("__vrt"))
      lexD.crossJoin(broadcast(eq)).crossJoin(broadcast(vrt))
        .select($"doc_id", $"score", $"n_terms_hit", $"rank",
          $"__eq".as("fused_roundtrip_ok"),
          $"__vrt".as("member_probe_roundtrip_ok"))
    }),

    "m1_binary_metadata" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("payload", $"text".cast("binary"))
        .select(
          $"doc_id",
          length($"payload").cast("long").as("n_bytes"),
          sha2($"payload", 256).as("content_sha256"),
          lower(hex(substring($"text", 1, 8).cast("binary"))).as("head_bytes_hex"))
    }),

    // D9: EXACT similarity join via prefix filtering (AllPairs/PPJoin) —
    // no blocking key, no recall loss: provably the same pairs as the
    // quadratic all-pairs join (which is the oracle), but candidates come
    // from a rare-token-prefix inverted index. The global exact-dedup path
    // when LSH's probabilistic recall isn't acceptable.
    // SF-PROOF SLICE (round 11): the gated run samples the corpus through
    // the same hashSampleCapFilter seam as the d2/d5 twins (keep-all at
    // gate SF, where the slice IS the corpus). Unlike those, here the
    // PRODUCTION input is sliced, not just a verdict twin — because on
    // this corpus the TRUE answer is quadratic-dense: word-1-gram sets
    // draw from a ~30-word vocabulary, so any two long documents share
    // ≥ 0.8 of their word sets and the exact pair count itself grows as
    // N². No algorithm avoids emitting a quadratic output; bounding the
    // input is the only honest SF-proof form. (The full-corpus AllPairs
    // machinery at non-degenerate similarity is exercised by d2's
    // shingle-space twin, where pairs are sparse.)
    "d9_prefix_filter_pairs" -> ((s, dir) => {
      val (_, samp) = twinSample(t(s, dir, "documents"), "doc_id")
      Dedup.nearDupPrefixFilter(samp, "text", "doc_id",
        threshold = 0.8, reuseIndex = true)
    }),

    // D10: bounded edit-distance near-dup pairs — levenshtein on a 120-char
    // normalized prefix within (lang, source, length-band) blocks; the
    // cheap typo/OCR-noise detector exact Jaccard misses (word-set identical
    // ≠ character identical). Both engines implement classic unit-cost
    // Wagner–Fischer, so the oracle is exact.
    "d10_levenshtein_pairs" -> ((s, dir) => {
      import s.implicits._
      // Hot-block cap (Dedup.capBlocks): one dominant (lang, source,
      // len_band) key would turn this bounded block join quadratic; blocks
      // past the cap are dropped via broadcast anti-join (recall contract
      // documented on capBlocks — the cap sits far above any real block
      // here, so the sf output is unchanged and the oracle stays exact).
      // SF-PROOF SLICE (round 11): hash-sampled input like d9 — the
      // ORACLE's cost is block-quadratic full-DP levenshtein (DuckDB has
      // no banded early-exit), ~16M × O(120²) cells at sf1; the engine's
      // banded DP is fine but the gate must stay runnable at any SF.
      // Keep-all at gate SF via the cap's count short-circuit.
      val (_, d10samp) = twinSample(t(s, dir, "documents"), "doc_id")
      val prepared = Dedup.capBlocks(
        Dedup.spread(d10samp).select(
          $"doc_id", $"lang", $"source",
          substring(Text.normalize($"text"), 1, 120).as("head"))
          .withColumn("len_band", floor(length($"head") / 40)),
        blockCols = Seq("lang", "source", "len_band"), maxBlockSize = 10000)
      val a = prepared.as("a"); val b = prepared.as("b")
      a.join(b, col("a.lang") === col("b.lang") &&
          col("a.source") === col("b.source") &&
          col("a.len_band") === col("b.len_band") &&
          col("a.doc_id") < col("b.doc_id"))
        // 3-arg banded levenshtein: the DP early-exits past the threshold
        // (O(len·k) cells instead of O(len²)), returning -1 for pairs
        // beyond it — exact distances for every pair the filter keeps, so
        // the full-distance oracle is unchanged.
        .withColumn("distance", levenshtein(col("a.head"), col("b.head"), 20))
        .filter(col("distance") >= 0 && col("distance") <= 20)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("distance"))
    }),

    // T16: deterministic epoch shuffle — the reproducible global corpus
    // reordering a training run needs per epoch: order by a seeded hash
    // of the id (new seed = new permutation, same seed = same order on
    // any cluster/partitioning), with positions stamped by the
    // zipWithIndex ladder of o13 — a range-partitioned parallel sort,
    // never a single-partition row_number window.
    "t16_corpus_shuffle" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Relational.globalRowIds(
        t(s, dir, "documents").select($"doc_id", $"lang"),
        orderCols = Seq(md5(concat($"doc_id".cast("string"), lit("epoch1"))).asc,
          $"doc_id".asc),
        idName = "shuffle_pos")
        .select($"doc_id", $"lang", $"shuffle_pos")
    }),

    // D11: PARAGRAPH-level exact dedup (Dolma/C4 sub-document pass) —
    // 10-word chunks, first corpus-wide occurrence wins (doc id, then
    // position), docs reassembled from the survivors. Catches shared
    // boilerplate whole-doc dedup (d1) misses.
    "d11_paragraph_dedup" -> ((s, dir) => {
      Dedup.paragraphDedup(t(s, dir, "documents"), "text", "doc_id", chunkSize = 10)
    }),

    // T15: winnowing fingerprints (the MOSS sub-document fingerprint):
    // md5 char-8-grams, window-8 rightmost-min selection — any shared
    // substring of ≥ 15 chars between docs shares a fingerprint, with
    // selection density bounded by the window. One UDF pass per row
    // (monotonic deque, O(n)); the oracle reproduces the selection
    // declaratively as a per-window lexicographic argmin.
    "t15_winnowing" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          explode(Text.winnowFingerprints(8, 8)(Text.normalize($"text"))).as("f"))
        .select($"doc_id", $"f.pos".as("pos"), $"f.fp".as("fp"))
    }),

    // T9: corpus bigram statistics — top-5 word bigrams per language (the
    // n-gram LM / contamination-screen building block). Bigrams derive
    // per row (map-side), counts combine before the single shuffle, and
    // the top-k window runs over the aggregated (lang, bigram) table.
    "t9_bigram_topn" -> ((s, dir) => {
      import s.implicits._
      // words is MATERIALIZED by the first projection: referencing the
      // split expression inside the transform lambda would inline the
      // whole normalize+split regex pipeline once per bigram element.
      val bigrams = when(size($"words") >= 2,
          transform(sequence(lit(0), size($"words") - 2),
            i => concat_ws(" ", element_at($"words", i + 1), element_at($"words", i + 2))))
        .otherwise(array().cast("array<string>"))
      val counts = t(s, dir, "documents")
        .select($"lang", split(Text.normalize($"text"), " ").as("words"))
        .select($"lang", explode(bigrams).as("bigram"))
        .groupBy($"lang", $"bigram").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy($"lang")
        .orderBy($"cnt".desc, $"bigram".asc)
      counts.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"lang", $"bigram", $"cnt", $"rank")
    }),

    // T10: repetition quality signals (the Gopher-rule family): unique-word
    // ratio and the most-common-word share — the boilerplate/spam filter a
    // corpus pipeline runs before training. Distinct-count signals derive
    // map-side from the words array; the top-share needs the per-(doc,
    // word) count, one shuffle keyed by doc_id.
    "t10_repetition" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents")
        .select($"doc_id", split(Text.normalize($"text"), " ").as("words"))
      val flat = base.select($"doc_id", size($"words").as("n_words"),
        explode($"words").as("word"))
      flat.groupBy($"doc_id", $"n_words", $"word")
        .agg(count(lit(1)).as("cnt"))
        .groupBy($"doc_id", $"n_words")
        .agg(max($"cnt").as("max_cnt"), count(lit(1)).as("n_unique"))
        .select($"doc_id", $"n_words".cast("long").as("n_words"),
          $"n_unique",
          round($"n_unique" / $"n_words", 6).as("unique_ratio"),
          round($"max_cnt" / $"n_words", 6).as("top_word_share"))
    }),

    // T11: benchmark DECONTAMINATION — flag training docs sharing any
    // 4-gram with a held-out benchmark set (doc_id % 100 == 0 stands in
    // for the eval suite). The canonical pre-training leak check: shingle
    // both sides, distinct the (small) benchmark shingle set, one
    // broadcast-able semi-ish join on the shingle, count distinct hits
    // per train doc. Shingles join as strings here for oracle parity; at
    // 100 TB hash them first (xxhash64) so the exploded index is narrow.
    "t11_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val sh = shingles4(s, dir)
      val bench = sh.filter($"doc_id" % 100 === 0).select($"shingle").distinct()
      sh.filter($"doc_id" % 100 =!= 0)
        .join(bench, "shingle")
        .groupBy($"doc_id")
        .agg(countDistinct($"shingle").as("n_hits"))
    }),

    // T22: Bloom-sketch decontamination — the SCALE path for T11. The
    // benchmark's shingle set folds into a KB–MB bloom sketch (one
    // small-side aggregate, inlined as a literal), and the corpus side is
    // a map-side codegen'd probe + per-doc aggregate: NO shuffle of the
    // corpus shingles at all, vs T11's shingle-keyed join. Bloom gives no
    // false negatives, so `clean = true` is PROVEN uncontaminated; false
    // positives only send extra docs to the exact re-check (T11) — run
    // t22 as the 100 TB pre-filter, t11 on the flagged sliver.
    // HASH-GATED (round 9): the sketch's two contracts are now in-plan
    // verdicts against an oracle emitting `true` — no_false_neg (every
    // exactly-contaminated doc is bloom-flagged: bloom membership never
    // misses an inserted key, so a violation means the sketch itself is
    // broken) and fp_rate_ok (spuriously-flagged share of the clean docs
    // ≤ 5%; measured 0.8% at sf0.01 / 0.05% at sf0.1 under the
    // 24-bits/item sizing). Payload = deterministic doc/contamination
    // counts (DuckDB recomputes both via the exact 4-gram join). The
    // exact join is the verdict harness; at 100 TB t22 runs alone as the
    // pre-filter and t11 re-checks only the flagged sliver.
    "t22_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val sh = shingles4(s, dir)
      val bench = sh.filter($"doc_id" % 100 === 0).select($"shingle").distinct()
      // Size the sketch FROM THE DATA: a fixed nItems silently degrades
      // toward FP→1 the moment the benchmark outgrows the assumption,
      // turning the pre-filter vacuous (every doc flagged). The count is
      // one small-side job over the already-distinct benchmark shingles —
      // the side that is sublinear in corpus size by construction. The
      // budget is 24 bits/item, NOT the textbook 8–10: the unit of
      // decision is the DOC, which probes one shingle per position, so
      // doc-level FP ≈ shingles_per_doc × per-shingle FP. 24 bits/item
      // (k≈17 derived by Spark from the ratio) gives per-shingle FP
      // ≈ 1e-5 — docs of up to ~10^4 shingles stay under ~10% spurious
      // flagging, and the sketch is still KBs per million benchmark
      // shingles.
      val nBench = math.max(1L, bench.count())
      val bloom = Prune.bloomLiteral(bench, $"shingle",
        nItems = nBench, nBits = math.max(1024L, 24L * nBench))
      val corp = sh.filter($"doc_id" % 100 =!= 0)
      val flags = corp
        .groupBy($"doc_id")
        .agg(sum(when(Prune.mightContain(bloom, $"shingle"), 1L).otherwise(0L))
          .as("n_flagged"))
      val cont = corp.join(bench, "shingle").select($"doc_id").distinct()
        .withColumn("__cont", lit(1))
      flags.join(cont, Seq("doc_id"), "left")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce($"__cont", lit(0))).cast("long").as("n_contaminated"),
          sum(when($"__cont".isNotNull && $"n_flagged" === 0, 1L).otherwise(0L))
            .as("__n_fn"),
          sum(when($"__cont".isNull && $"n_flagged" > 0, 1L).otherwise(0L))
            .as("__n_fp"),
          sum(when($"__cont".isNull, 1L).otherwise(0L)).as("__n_clean"))
        .select($"n_docs", $"n_contaminated",
          ($"__n_fn" === 0L).as("no_false_neg"),
          ($"__n_clean" === 0L || $"__n_fp" <= $"__n_clean" * lit(0.05))
            .as("fp_rate_ok"))
    }),

    // T23: leakage-safe train/val/test split — assignment is a pure
    // function of the exact-dedup GROUP (Text.fingerprintMd5 of the
    // normalized text), not the doc, so duplicate documents can never
    // straddle train and eval (the group key is pluggable: feed d6's
    // near-dup cluster id for the stronger guarantee). 80/10/10 via
    // Text.deterministicSplit's md5-bucket cuts — reproducible across
    // runs, engines, partitionings, and corpus growth (a doc's split
    // never changes when new docs arrive). Map-side split label + one
    // groupBy; the oracle recomputes the same buckets in SQL.
    "t23_leakage_safe_split" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("grp", Text.fingerprintMd5($"text"))
        .withColumn("split", Text.deterministicSplit($"grp",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct($"grp").as("n_groups"))
    }),

    // T24: distribution drift between corpus snapshots — per-language
    // Population Stability Index (Stats.psiByCategory) comparing the
    // even-doc_id half (reference mix) against the odd half (candidate
    // batch): the monitor a production ingestion pipeline runs on every
    // batch before it joins the training mix. Two map-side-combined
    // groupBys collapse both corpora to |languages| rows; all share/PSI
    // arithmetic runs on that tiny table (Jeffreys 0.5 smoothing keeps
    // ln finite when a language appears on only one side). Deterministic:
    // identical double algebra on both engines, round(6/8).
    "t24_distribution_drift" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      graft.functions.Stats.psiByCategory(
          docs.filter($"doc_id" % 2 === 0),
          docs.filter($"doc_id" % 2 =!= 0), "lang")
        .select($"lang", $"n_ref", $"n_cand",
          round($"share_ref", 6).as("share_ref"),
          round($"share_cand", 6).as("share_cand"),
          round($"psi_contrib", 8).as("psi_contrib"))
    }),

    // D15: INCREMENTAL near-dup against the at-rest index — the daily-
    // ingest production shape: the existing corpus (doc_id % 4 != 0) is
    // signed ONCE into Dedup.nearDupIndexTables and written to disk
    // (bands partitioned BY BAND — the probe's join key); the new batch
    // (doc_id % 4 == 0) signs only itself and probes the loaded index.
    // HASH-GATED contract: the incremental result must EQUAL the full
    // batch rebuild (nearDupMinhashLsh over the whole corpus) restricted
    // to pairs touching the new batch — identical pair set AND identical
    // jaccard values — which holds by construction because hot buckets
    // are counted over index ∪ batch. Verdicts (matches_full_rebuild,
    // pairs_found) ride an oracle emitting `true`; payload = the split
    // sizes DuckDB recomputes.
    "d15_incremental_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val batchNew = docs.filter($"doc_id" % 4 === 0)
      val tmp = Scratch.dir(s, "d15_index")
      // ONE sign pass serves both the index build and the rebuild twin
      // (signedCorpus is materialized; the incremental probe still signs
      // the batch itself — that is its production contract)
      val signedAll = Dedup.signedCorpus(docs, "text", "doc_id")
      val (bandsDf, shinglesDf) =
        Dedup.nearDupIndexTablesFrom(signedAll.filter($"id" % 4 =!= 0))
      val inc = d15WriteAndProbe(s, tmp, bandsDf, shinglesDf, batchNew)
      val fullTouching = Dedup.lshPairsFrom(signedAll, threshold = 0.4)
        .filter($"id_a" % 4 === 0 || $"id_b" % 4 === 0)
      val stats = inc.select($"id_a", $"id_b", $"jaccard".as("j_inc"))
        .withColumn("__i", lit(1))
        .join(fullTouching.select($"id_a", $"id_b", $"jaccard".as("j_full"))
            .withColumn("__f", lit(1)),
          Seq("id_a", "id_b"), "full")
        .agg(count($"__i").as("n_inc"), count($"__f").as("n_full"),
          count(when($"__i".isNotNull && $"__f".isNotNull &&
            $"j_inc" === $"j_full", 1)).as("n_match"))
      docs.agg(count(lit(1)).as("n_docs"),
          count(when($"doc_id" % 4 === 0, 1)).as("n_new"))
        .crossJoin(broadcast(stats))
        .select($"n_docs", $"n_new",
          ($"n_inc" === $"n_full" && $"n_match" === $"n_full")
            .as("matches_full_rebuild"),
          ($"n_inc" > 0).as("pairs_found"))
    }),

    // D16: RECORD LINKAGE between two feeds (Dedup.linkBestMatch) — the
    // left third of the corpus (doc_id % 3 == 0) fuzzy-matched against
    // the rest: LSH-blocked candidates, exact shingle-Jaccard verify,
    // best-match-per-left assignment. HASH-GATED via the d2 pattern:
    // payload = the EXACT best matches for a deterministic ≤400-doc hash
    // slice of the left side (cross-join argmax DuckDB recomputes
    // independently in the same bigram-shingle space, same (jaccard desc,
    // right_id) tie-break); verdict = the production linkage restricted
    // to the slice picks the same right_id for ≥ 80% of slice docs that
    // HAVE an exact match (measured 100% at sf0.01/sf0.1 — best matches
    // sit far above the 0.4 threshold where LSH detection is ~certain).
    "d16_record_linkage" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val left = docs.filter($"doc_id" % 3 === 0)
      val right = docs.filter($"doc_id" % 3 =!= 0)
      // sign each side ONCE: the production linkage (linkBestMatchFrom)
      // and the exact twin both read the same materialized signed
      // relations
      val signedLeft = Dedup.signedCorpus(left, "text", "doc_id")
      val signedRight = Dedup.signedCorpus(right, "text", "doc_id")
      // materialized: referenced by BOTH verdicts below (exact-slice
      // agreement + at-rest equality) — without truncation each reference
      // re-runs the whole LSH linkage
      val linked = graft.functions.Ckpt.materialize(
        Dedup.linkBestMatchFrom(signedLeft, signedRight, threshold = 0.4))
      // AT-REST twin (d15's seam, linkage form): persist the right feed's
      // band/shingle tables (bands partitioned BY BAND — the probe's join
      // key), read them back, and probe from disk. Must EQUAL the
      // in-memory linkage exactly (same pair set, same jaccard) — holds by
      // construction (linkBestMatchAgainstIndex IS linkBestMatchFrom's
      // body); the verdict pins it against regressions in either path.
      val tmp = Scratch.dir(s, "d16_index")
      val (rBands, rShingles) = Dedup.nearDupIndexTablesFrom(signedRight)
      rBands.write.mode("overwrite").partitionBy("band").parquet(s"$tmp/bands")
      rShingles.write.mode("overwrite").parquet(s"$tmp/shingles")
      val atRest = Dedup.linkBestMatchAgainstIndex(signedLeft,
        s.read.parquet(s"$tmp/bands"), s.read.parquet(s"$tmp/shingles"),
        threshold = 0.4)
      val restEq = linked.select($"left_id", $"right_id", $"jaccard".as("j_m"))
        .withColumn("__m", lit(1))
        .join(atRest.select($"left_id", $"right_id", $"jaccard".as("j_r"))
            .withColumn("__r", lit(1)),
          Seq("left_id", "right_id"), "full")
        .agg(count($"__m").as("__n_mem"), count($"__r").as("__n_rest"),
          count(when($"__m".isNotNull && $"__r".isNotNull &&
            $"j_m" === $"j_r", 1)).as("__n_eq"))
      val nLeft = left.count()
      // twin scoring on the SORTED SHINGLE-HASH arrays (signedCorpus's
      // `words`, scored by the codegen'd primitive-long merge) — string
      // shingles + array_intersect cost ~20× more per pair and made this
      // twin the whole bench's top cost; the jaccard VALUES are identical
      // up to 2^-64 hash collisions (the same equivalence every
      // d2/d4/d9 oracle already rides)
      val sl = signedLeft
        .filter(Text.hashSampleCapFilter($"id", nLeft, 400L))
        .select($"id".as("left_id"), $"words".as("ga"))
      // filter the UNROUNDED jaccard (like verifyPairs and the oracle's
      // WHERE) — filtering the rounded value would admit pairs in
      // [threshold − 5e-7, threshold) that every other path drops.
      // Ckpt-materialized: the ≤400-row exact table is referenced twice
      // below (payload + agreement aggregate) and would otherwise re-run
      // the cross-join argmax — the gate's heaviest twin — twice.
      val exact = graft.functions.Ckpt.materialize(
        signedRight
        .select($"id".as("rid"), $"words".as("gb"))
        .crossJoin(broadcast(sl))
        .withColumn("__j", Dedup.jaccardSortedHashes($"ga", $"gb"))
        .filter($"__j" >= 0.4)
        // argmax over the ROUNDED value + rid tie-break — the exact order
        // the oracle's window uses (ordering by the unrounded value could
        // pick a different winner among 6-decimal ties)
        .withColumn("__rn", row_number().over(Window.partitionBy($"left_id")
          .orderBy(round($"__j", 6).desc, $"rid".asc)))
        .filter($"__rn" === 1)
        .select($"left_id", $"rid".as("right_id"), round($"__j", 6).as("jaccard")))
      val agree = exact.select($"left_id", $"right_id".as("__er"))
        .join(linked.select($"left_id", $"right_id".as("__lr")), Seq("left_id"), "left")
        .agg(count(lit(1)).as("__n_exact"),
          count(when($"__lr" === $"__er", 1)).as("__n_agree"))
      exact.crossJoin(broadcast(agree)).crossJoin(broadcast(restEq))
        .select($"left_id", $"right_id", $"jaccard",
          ($"__n_exact" === 0L || $"__n_agree" >= $"__n_exact" * lit(0.8))
            .as("agreement_ok"),
          ($"__n_mem" === $"__n_rest" && $"__n_eq" === $"__n_mem")
            .as("at_rest_matches_inmem"))
    }),

    // T25: BPE tokenizer training in-engine (Text.bpeTrain) — 8 merges
    // over the corpus's distinct-word frequency table (the sublinear
    // Sennrich form; the loop driver follows the kmeans/pageRank
    // discipline: one argmax row per round, Ckpt-truncated vocab).
    // HASH-GATED via the bound-verdict pattern: payload = distinct-word
    // count + the FIRST merge (the weighted char-bigram argmax, which
    // DuckDB recomputes independently with the same tie-break); verdicts
    // = exactly 8 merges, merge frequencies monotone non-increasing
    // (structural BPE property — see bpeTrain's doc), all merged pairs
    // distinct. Oracle emits `true` per verdict.
    "t25_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val merges = Text.bpeTrain(docs, "text", merges = 8)
      val w = Window.partitionBy(
        graft.operators.Relational.onePartKey($"rank")).orderBy($"rank")
      val verd = merges
        .withColumn("prev_f", lag($"freq", 1).over(w))
        .agg(count(lit(1)).as("__n"),
          count(when($"prev_f".isNotNull && $"freq" > $"prev_f", 1)).as("__up"),
          countDistinct($"left", $"right").as("__nd"))
      val nWords = docs
        .select(explode(split(Text.normalize($"text"), " ")).as("w"))
        .filter(length($"w") > 0)
        .agg(countDistinct($"w").as("n_words"))
      merges.filter($"rank" === 1)
        .select($"left".as("first_left"), $"right".as("first_right"),
          $"freq".as("first_freq"))
        .crossJoin(broadcast(verd)).crossJoin(broadcast(nWords))
        .select($"n_words", $"first_left", $"first_right", $"first_freq",
          ($"__n" === 8L).as("n_merges_ok"),
          ($"__up" === 0L).as("monotone_ok"),
          ($"__nd" === $"__n").as("pairs_distinct_ok"))
    }),

    // T12: unigram-LM scoring — the perplexity-proxy quality filter: score
    // each doc by its average per-word log-probability under the corpus's
    // own unigram model. Two aggregations (build the LM, score the docs)
    // joined on the word; the LM is broadcast-able for real vocabularies
    // (sublinear in corpus size), and the scalar total rides a cross join
    // of a 1-row aggregate, never a collect.
    "t12_unigram_logprob" -> ((s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"doc_id", explode(split(Text.normalize($"text"), " ")).as("word"))
      val lm = toks.groupBy($"word").agg(count(lit(1)).as("cnt"))
      val tot = lm.agg(sum($"cnt").as("total"))
      toks.join(broadcast(lm), "word")
        .crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"),
             round(sum(log($"cnt" / $"total")) / count(lit(1)), 4).as("avg_logprob"))
    }),

    // T14: exact-budget deterministic sampling — exactly N docs per source
    // (training-mix recipes specify COUNTS, not rates), chosen by md5-hash
    // rank so the subset is a pure function of doc ids: stable across
    // runs, engines, and partitionings, and refreshing the corpus only
    // swaps docs whose hash rank crosses the boundary. One shuffle on the
    // stratum key (rate-based twin: t4/t6).
    "t14_exact_sample" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"source")
        .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      t(s, dir, "documents")
        .withColumn("rn", row_number().over(w).cast("int"))
        .filter($"rn" <= 15)
        .select($"doc_id", $"source", $"rn")
    }),

    // T13: cleaning-rule chain with per-rule drop accounting (the C4/
    // Gopher filter observability report): each rule is a predicate
    // column, failures count per language in ONE aggregation pass, and a
    // doc survives iff no rule fires. The per-rule tallies are what a
    // pipeline operator actually watches — a silent rule firing on 40% of
    // a language is a bug signal, not a cleaning success.
    "t13_filter_stats" -> ((s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents").select($"doc_id", $"lang", $"text",
        Text.tokenCountWs($"text").as("n_words"),
        Text.stopwordRatio($"text").as("stop_ratio"),
        Text.meanWordLen($"text").as("mean_wl"))
      val rShort = $"n_words" < 20
      val rLongWord = $"mean_wl" > 4.75
      val rStopword = $"stop_ratio" < 0.05
      d.withColumn("f_short", rShort)
        .withColumn("f_long_word", rLongWord)
        .withColumn("f_stopword", rStopword)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"f_short", 1L).otherwise(0L)).as("n_fail_short"),
          sum(when($"f_long_word", 1L).otherwise(0L)).as("n_fail_long_word"),
          sum(when($"f_stopword", 1L).otherwise(0L)).as("n_fail_stopword"),
          sum(when(!$"f_short" && !$"f_long_word" && !$"f_stopword", 1L)
            .otherwise(0L)).as("n_pass"))
    }),

    // M3: audio chunk schedule — overlapping fixed-length windows (4 s
    // chunks every 3 s) over synthetic per-doc durations; the segmentation
    // arithmetic is oracle-checked, the decode stays behind DecodeStub.
    "m3_audio_chunks" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(
        $"doc_id".as("media_id"),
        struct(lit("audio").as("media_type"),
          (($"doc_id" % 45 + 5) * 731).cast("long").as("duration_ms")).as("meta"))
      graft.functions.Multimodal.chunkAudio(media, "media_id",
        chunkMs = 4000L, strideMs = 3000L)
    }),

    // T17: PII scan + redaction — the compliance scrub every training
    // corpus runs before tokenization. Synthetic PII is stitched onto the
    // corpus deterministically from doc_id (the raw tables carry none), so
    // the detector has real positives; patterns live in the Java∩RE2
    // regex subset so the DuckDB oracle runs the SAME pattern strings.
    // One codegen'd regexp pass per class — no UDF.
    "t17_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val raw = t(s, dir, "documents").select($"doc_id",
        concat($"text",
          when($"doc_id" % 3 === 0,
            concat(lit(" contact user"), $"doc_id".cast("string"),
              lit("@mail.example.com"))).otherwise(lit("")),
          when($"doc_id" % 5 === 0,
            concat(lit(" call +1-415-555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
          when($"doc_id" % 7 === 0,
            concat(lit(" from 10.0."), ($"doc_id" % 256).cast("string"),
              lit(".25"))).otherwise(lit(""))).as("raw"))
      val (ne, np, ni) = Text.piiCounts($"raw")
      raw.select($"doc_id", ne.as("n_emails"), np.as("n_phones"), ni.as("n_ips"),
          Text.piiRedact($"raw").as("redacted"))
        .withColumn("pii_free", $"n_emails" + $"n_phones" + $"n_ips" === 0)
    }),

    // T18: URL canonicalization + per-registrable-domain cap — the crawl
    // diversity guard (no site dominates the mix). URLs are synthesized
    // deterministically from (source, doc_id) with scheme/www/query noise;
    // the operator normalizes, extracts the registrable domain, and keeps
    // the top-3 docs per domain by n_chars (id tie-break). One shuffle on
    // the domain key; the normalize/extract chain is pure codegen.
    "t18_domain_cap" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"source", $"n_chars",
        concat(
          when($"doc_id" % 2 === 0, lit("https://")).otherwise(lit("http://")),
          when($"doc_id" % 3 === 0, lit("www.")).otherwise(lit("")),
          $"source", lit(".site"), ($"doc_id" % 7).cast("string"),
          lit(".org/articles/"), $"doc_id".cast("string"),
          lit("?utm_source=feed#top")).as("url"))
      val norm = docs.withColumn("url_norm", Text.normalizeUrl($"url"))
        .withColumn("domain", Text.registrableDomain(Text.urlHost($"url_norm")))
      val w = Window.partitionBy($"domain").orderBy($"n_chars".desc, $"doc_id".asc)
      norm.withColumn("rank", row_number().over(w).cast("int"))
        .filter($"rank" <= 3)
        .select($"doc_id", $"url_norm", $"domain", $"rank")
    }),

    // T19: source-mixture reweighting — per-language sampling weights that
    // move the corpus from its ACTUAL language shares to a TARGET recipe
    // (weight = target/actual; expected_docs = the recipe's count at a
    // 10k-doc budget). The whole op is one map-side-combinable aggregate;
    // the empty-partition window runs over the 5-row POST-aggregate table,
    // never the corpus.
    "t19_mixture_weights" -> ((s, dir) => {
      import s.implicits._
      val target = Seq(("en", 0.3), ("de", 0.2), ("es", 0.2), ("fr", 0.2),
        ("zh", 0.1)).toDF("lang", "target_share")
      val actual = t(s, dir, "documents")
        .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("actual_share",
          $"n_docs" / sum($"n_docs").over(Window.partitionBy(
            graft.operators.Relational.onePartKey($"n_docs"))))
      actual.join(broadcast(target), "lang")
        .select($"lang", $"n_docs",
          round($"actual_share", 6).as("actual_share"),
          $"target_share",
          round($"target_share" / $"actual_share", 6).as("weight"),
          round($"target_share" * 10000).cast("long").as("expected_docs"))
    }),

    // D12: INCREMENTAL exact dedup — the batch-ingest path: docs with
    // doc_id % 10 == 0 arrive as the "new batch" against the rest as the
    // indexed corpus; a new doc survives iff its content fingerprint is
    // unseen in the corpus AND it's the first (min id) holder within the
    // batch. Anti-join + min-groupBy, both keyed on the fingerprint.
    "d12_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Dedup.incrementalExact(
        docs.filter($"doc_id" % 10 === 0),
        docs.filter($"doc_id" % 10 =!= 0),
        "text", "doc_id")
    }),

    // T20: overlapping token-window chunking — the context-window splitter
    // (RAG indexing / long-doc training prep): 40-word windows every 30
    // words, final window clipped to the doc end. Map-side explode, zero
    // shuffle; the oracle reproduces the schedule with DuckDB list slices
    // (static range cap guarded in Verify, same pattern as t15/d11).
    "t20_chunk_windows" -> ((s, dir) => {
      Text.chunkWindows(t(s, dir, "documents"), "text", "doc_id",
        width = 40, stride = 30)
    }),

    // T21: PACK MANIFEST — the materialized form of t5's packing decision:
    // per (lang, pack), the concatenated window text, the ordered doc ids,
    // and each doc's token-offset boundary within the pack (what the
    // trainer needs to mask cross-document attention). Offsets are an
    // exclusive prefix sum inside the pack — one window over the same
    // (group, order) shuffle the pack assignment already made.
    "t21_pack_manifest" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .select($"doc_id", $"lang", $"text",
          Text.tokenCountWs($"text").cast("long").as("n_tokens"))
      val packed = Text.packSequences(docs, "lang", "doc_id", "n_tokens",
        budget = 2048L)
      val wPack = Window.partitionBy($"lang", $"pack_id").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      packed
        .withColumn("offset", coalesce(sum($"n_tokens").over(wPack), lit(0L)))
        .groupBy($"lang", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          sort_array(collect_list(struct($"doc_id", $"offset", $"text"))).as("__items"))
        // doc_ids/boundaries as comma-joined strings (a4_collect_list idiom):
        // the external oracle compare sorts cells in pandas, which cannot
        // hash array-valued cells — scalar columns only in checked outputs.
        .select($"lang", $"pack_id", $"n_docs", $"total_tokens",
          concat_ws(",", transform($"__items", x => x.getField("doc_id"))).as("doc_ids"),
          concat_ws(",", transform($"__items", x => x.getField("offset"))).as("boundaries"),
          concat_ws("\n\n", transform($"__items", x => x.getField("text"))).as("pack_text"))
    }),

    // S10: Johnson–Lindenstrauss random projection 64→16 dims — the cheap
    // front end before clustering/blocking at corpus scale. The ±1 sign
    // matrix derives from md5 parity (engine-independent), so the DuckDB
    // oracle recomputes the identical matrix and the check is exact;
    // the projection itself is map-side codegen'd Catalyst (zero shuffle).
    // Checked in LONG form (vec_id, pos, value) — posexplode is a narrow
    // generate, and the oracle compare requires scalar cells (see t21).
    "s10_random_projection" -> ((s, dir) => {
      import s.implicits._
      Similarity.randomProjection(t(s, dir, "embeddings"), "vec_id",
        "embedding", inDim = 64, outDim = 16)
        .select($"vec_id", posexplode($"proj").as(Seq("pos", "value")))
    }),

    // G1: one PageRank power-iteration step over a supplier→part-class
    // edge set — joins/aggs only (degrees: one src groupBy; contributions:
    // src-keyed join then dst-keyed partial-sum agg; N derived in-plan via
    // scalar-aggregate crossJoin, never a driver scalar).
    "g1_pagerank_step" -> ((s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "lineitem")
        .select($"l_suppkey".as("src"), ($"l_partkey" % 200).as("dst"))
        .distinct()
      graft.functions.Graph.pageRankStep(edges, "src", "dst", damping = 0.85)
    }),

    // D13: end-to-end semantic dedup (SemDeDup shape): blocked kNN-graph
    // edges ≥ 0.45 cosine → connected components → lowest-id
    // representative per cluster. HASH-GATED (round 9): payload = the
    // EXACT cluster assignment (exact thresholded edges → exact CC —
    // deterministic; DuckDB recomputes it with a recursive-CTE closure),
    // verdict = ann_agree_ok (≥ 95% of vectors land in the same cluster
    // under the ANN-blocked pipeline as under the exact graph; measured
    // 1.0 at sf0.01 and 0.9955 at sf0.1).
    // SF-PROOF TWIN (round 10): exact edges + exact CC + the agreement
    // contract run on the deterministic ≤~TwinSampleCap hash slice
    // (keep-all through sf0.1 — identical to the unsampled form there;
    // note cluster labels computed ON a slice are not comparable to
    // full-corpus labels restricted to it, since paths through unsampled
    // vectors can merge slice clusters — so above the cap the pipeline
    // runs a second time on the slice for the agreement verdict). The
    // full-corpus production run is always pinned by full_cover_ok
    // (every vector labeled exactly once — a cheap aggregate over the
    // pipeline's eagerly-checkpointed CC labels, so no recompute).
    "d13_semantic_dedup" -> ((s, dir) => {
      // lighter budget than s7: edge recall only needs the HIGH-cosine
      // pairs (threshold 0.45 is far above the corpus bulk). The 0.25×
      // all-pairs budget matches round 7's hand-picked (8, 2) candidate
      // volume — now derived from the occupancy histogram instead.
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      // maxCandidatesPerVector = 500 = 0.25 × the 2000-vector gate corpus:
      // at N ≤ 2000 the effective fraction is the same 0.25 (bit-identical
      // behavior at gate SF); above it the budget is LINEAR in N and the
      // sqrt(N) list floor keeps each probe sub-linear (round 11 — the sf1
      // bench measured the fraction-of-N² form at 71 s of 347 s total).
      val ann = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.45, k = 5, nLists = 64,
        trainIters = 2, maxCandidateFraction = 0.25,
        maxCandidatesPerVector = 500L)
      val (nVec, samp) = twinSample(emb, "vec_id")
      val annS =
        if (nVec <= TwinSampleCap) ann
        else Similarity.semanticDedup(samp, "vec_id", "embedding",
          threshold = 0.45, k = 5, nLists = 64,
          trainIters = 2, maxCandidateFraction = 0.25,
          maxCandidatesPerVector = 500L)
      val exactEdges = Dedup.embeddingEdgesAbove(samp, "vec_id", "embedding", 0.45)
      // exact twin CC runs the DRIVER-side union-find: the true edge set
      // is slice-bounded by construction (near-dup edges at a high
      // threshold over ≤ ~cap vectors), so a second distributed
      // pointer-jumping loop would spend its rounds on scheduling, not
      // work. The ANN pipeline's own CC (inside semanticDedup) stays
      // fully distributed.
      val exactCC = Dedup.connectedComponentsLocal(
        samp.select($"vec_id".cast("long").as("vec_id")), "vec_id",
        exactEdges.select($"id_a", $"id_b"), "id_a", "id_b")
      val sizes = exactCC.groupBy($"cluster_id")
        .agg(count(lit(1)).as("cluster_size"), min($"vec_id").as("__rep"))
      val exact = exactCC.join(sizes, Seq("cluster_id"))
        .select($"vec_id", $"cluster_id", $"cluster_size",
          ($"vec_id" === $"__rep").as("keep"))
      // LEFT join from the exact side: a vector the ANN pipeline dropped
      // (or never emitted) must count as DISAGREEMENT, not vanish from
      // the denominator — an inner join would let a row-dropping
      // regression sail through with agreement 1.0 over the survivors.
      val agree = exact.select($"vec_id", $"cluster_id")
        .join(annS.select($"vec_id", $"cluster_id".as("__ac")), Seq("vec_id"), "left")
        .agg(avg(when($"__ac".isNotNull && $"__ac" === $"cluster_id", 1.0)
          .otherwise(0.0)).as("__frac"))
      val cover = ann.agg((count(lit(1)) === lit(nVec) &&
        countDistinct($"vec_id") === lit(nVec)).as("__cover"))
      exact.crossJoin(broadcast(agree)).crossJoin(broadcast(cover))
        .select($"vec_id", $"cluster_id", $"cluster_size", $"keep",
          ($"__frac" >= 0.95).as("ann_agree_ok"),
          $"__cover".as("full_cover_ok"))
    }),

    // S11: one distributed logistic-regression gradient step — train a
    // quality/importance classifier in-engine (y = [label == 0], fixed
    // deterministic init, lr 0.1). Margin is a codegen'd dot against a
    // literal weight array; the only shuffle carries `dim` partial sums.
    "s11_logreg_step" -> ((s, dir) => {
      import s.implicits._
      Similarity.logisticGradientStep(t(s, dir, "embeddings"), "embedding",
        when($"label" === 0, 1.0).otherwise(0.0), dim = 64,
        w0 = j => ((j % 7) - 3) / 10.0, lr = 0.1)
    }),

    // G2: PageRank run THREE power iterations by the loop driver — the
    // multi-round face of g1, oracle-checked against DuckDB's unrolled
    // 3-step closure. Vertices/N/degrees are hoisted and materialized
    // once; per-round ranks round to 1e-6 on both engines, so the
    // iterated fixpoint is exactly hash-comparable.
    "g2_pagerank_iter" -> ((s, dir) => {
      import s.implicits._
      val edges = t(s, dir, "lineitem")
        .select($"l_suppkey".as("src"), ($"l_partkey" % 200).as("dst"))
        .distinct()
      graft.functions.Graph.pageRank(edges, "src", "dst", iters = 3)
    }),

    // S12: k-means TRAINED two strict-Lloyd rounds (Euclidean argmin +
    // mean update) by the loop driver — the multi-round face of s6,
    // oracle-checked against DuckDB's unrolled closure. Centroids round
    // to 1e-6 after every update on both engines, so Voronoi boundaries
    // cannot drift between engines across iterations; distances fold j
    // ascending on both, so assignment ties break identically. Output in
    // long form (list_id, pos, c) for the scalar-cell compare.
    "s12_kmeans_train" -> ((s, dir) => {
      import s.implicits._
      Similarity.kmeansTrain(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, roundTo = 6)
        .select($"list_id",
          posexplode($"centroid").as(Seq("pos0", "c")))
        .select($"list_id", ($"pos0" + 1).cast("long").as("pos"), $"c")
    }),

    // S13: logistic regression TRAINED three full-batch gradient steps by
    // the loop driver — the multi-round face of s11, oracle-checked
    // against DuckDB's unrolled closure. The update is branch-free, so
    // per-round weight rounding (1e-6, both engines) is sufficient to
    // keep the engines in lockstep; the corpus is scanned once per round
    // and only `dim` doubles ever reach the driver.
    "s13_logreg_train" -> ((s, dir) => {
      import s.implicits._
      Similarity.logisticRegression(t(s, dir, "embeddings"), "embedding",
        when($"label" === 0, 1.0).otherwise(0.0), dim = 64,
        w0 = j => ((j % 7) - 3) / 10.0, lr = 0.1, iters = 3, roundTo = 6)
    }),

    // S14: PERSISTABLE index artifacts — train IVF centroids + PQ
    // codebooks once, SAVE them as parquet tables, LOAD them back, and
    // probe through the loaded copies (the reference persists every
    // stage between jobs — bigquery_io_manager.py:191-228; a 100 TB
    // pipeline trains an index once and probes it many times, so the
    // save/load seam is a first-class operator, not test plumbing).
    // HASH-GATED: payload = the exact cosine top-10 (deterministic),
    // verdicts = ivf_roundtrip_ok / pq_roundtrip_ok (probing through the
    // loaded artifacts returns exactly the same rows as probing through
    // the inline-trained ones — id AND score equality via inner join).
    "s14_index_persist" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      // FIXED scratch location PER APPLICATION, overwritten per run — a
      // fresh createTempDirectory per invocation leaked a parquet-filled
      // dir on every gate/bench/plan-audit run, while a fully shared path
      // raced across concurrent runs/users (overwrite is delete-then-
      // write, so a concurrent reader could hit FileNotFound or another
      // run's centroids). applicationId is stable within a run and unique
      // across runs. Local-filesystem path is the gate posture only: in a
      // real deployment these artifact tables live at warehouse paths
      // (see PersistSpec / Similarity docs).
      val tmp = Scratch.dir(s, "s14_index")
      // build → save
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      cents.write.mode("overwrite").parquet(s"$tmp/ivf_centroids")
      val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
      Similarity.pqBooksToDf(s, books).write.mode("overwrite").parquet(s"$tmp/pq_books")
      // load → probe, against the inline-trained twins
      val ivfInline = Similarity.topKIvf(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, k = 10)
      val ivfLoaded = Similarity.topKIvf(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding",
          s.read.parquet(s"$tmp/ivf_centroids")),
        "vec_id", "embedding", q, k = 10)
      val books2 = Similarity.pqBooksFromDf(s.read.parquet(s"$tmp/pq_books"))
      val adcInline = Similarity.pqTopKAdc(
        Similarity.pqEncode(emb, "vec_id", "embedding", books), "vec_id", q, books, k = 10)
      val adcLoaded = Similarity.pqTopKAdc(
        Similarity.pqEncode(emb, "vec_id", "embedding", books2), "vec_id", q, books2, k = 10)
      // id join + epsilon score filter (round-12 ADVICE: exact-double
      // join keys can flake roundtrip verdicts)
      def sameRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
                   idc: String, sc: String) =
        a.select(col(idc), col(sc).as("__sa"))
          .join(b.select(col(idc), col(sc).as("__sb")), Seq(idc))
          .filter(abs($"__sa" - $"__sb") <= 2e-6)
          .agg(count(lit(1)).as("n"))
      val ivfOk = sameRows(ivfInline, ivfLoaded, "vec_id", "cosine")
        .select($"n".as("n_ivf"))
      val pqOk = sameRows(adcInline, adcLoaded, "vec_id", "adc_dist")
        .select($"n".as("n_pq"))
      val exact = Similarity.topKBrute(emb, "vec_id", "embedding", q, k = 10)
      exact.crossJoin(broadcast(ivfOk)).crossJoin(broadcast(pqOk))
        .select($"vec_id", $"cosine",
          ($"n_ivf" === 10L).as("ivf_roundtrip_ok"),
          ($"n_pq" === 10L).as("pq_roundtrip_ok"))
    }),

    // S15: k-center greedy coreset — diversity sampling for data
    // curation: pick 5 maximally-spread exemplars (farthest-point
    // traversal, squared-L2, lowest-id seed). Fully deterministic
    // (round-6 ranking, id tie-break, chosen ids excluded), so the
    // greedy TRACE itself is the oracle-checked payload: DuckDB unrolls
    // the same 4 selection steps and must reproduce rank, id, and
    // distance exactly.
    "s15_kcenter_coreset" -> ((s, dir) => {
      Similarity.kCenterGreedy(t(s, dir, "embeddings"), "vec_id", "embedding", k = 5)
    }),

    // S16: the INDEX-AT-REST probe — the documented 100 TB shape for the
    // whole IVF family made a gated path (round-9 verdict #2): the member
    // assignment is WRITTEN partitioned by list_id
    // (Similarity.saveIvfMemberTable), and the probe reads it back with a
    // STATIC `list_id IN (...)` predicate routed by the persisted centroid
    // table — partition pruning at the file listing, so only
    // nProbe/nLists of the files are ever opened (the scan's
    // PartitionFilters; PersistSpec captures the plan). HASH-GATED with
    // the s5/s14 pattern: payload = exact cosine top-10 on the twin
    // slice, verdicts = pruned_roundtrip_ok (probe-from-disk returns
    // exactly the in-memory rows — id AND score equality) and recall_ok
    // (≥ 6/10 overlap with exact on the slice). Same per-application
    // scratch-dir posture as s14.
    "s16_member_table_probe" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val tmp = Scratch.dir(s, "s16_member")
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      Similarity.saveIvfMemberTable(emb, "vec_id", "embedding", cents, tmp)
      val fromDisk = Similarity.topKIvfPruned(s.read.parquet(tmp),
        "vec_id", "embedding", q, cents, k = 10)
      val inMem = Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, cents, k = 10)
      // id-identity + epsilon on the rounded cosine (round-12 ADVICE: no
      // exact-double join keys in roundtrip verdicts)
      val rt = fromDisk.select($"vec_id", $"cosine".as("__cd"))
        .join(inMem.select($"vec_id", $"cosine".as("__cm")), Seq("vec_id"))
        .filter(abs($"__cd" - $"__cm") <= 2e-6)
        .agg(count(lit(1)).as("n_rt"))
      val (nVec, samp) = twinSample(emb, "vec_id")
      val prunedS =
        if (nVec <= TwinSampleCap) fromDisk
        else Similarity.topKIvfPruned(
          Similarity.ivfIndexWith(samp, "vec_id", "embedding", cents),
          "vec_id", "embedding", q, cents, k = 10)
      val exact = Similarity.topKBrute(samp, "vec_id", "embedding", q, k = 10)
      val nHit = prunedS.select($"vec_id")
        .join(exact.select($"vec_id"), "vec_id").agg(count(lit(1)).as("n_hit"))
      exact.crossJoin(broadcast(rt)).crossJoin(broadcast(nHit))
        .select($"vec_id", $"cosine",
          ($"n_rt" === 10L).as("pruned_roundtrip_ok"),
          ($"n_hit" >= 6L).as("recall_ok"))
    }),

    // S17: IVF INDEX MAINTENANCE (round 11) — the d15 incremental posture
    // for the vector side: the base corpus (vec_id % 5 ≠ 4) is written
    // as the list_id-partitioned member table, a NEW batch (% 5 = 4) is
    // APPENDED against the same frozen centroids (partition-aligned
    // files, base never rewritten), and deletions (vec_id % 17 = 3) are
    // a probe-side tombstone anti-join — retract without rewriting.
    // Verdicts: append+anti-join probe ≡ full rebuild over the survivors
    // with the same centroids (EXACT — assignment is a pure function of
    // vector and centroids), and no tombstoned id surfaces. Payload =
    // exact brute top-10 on the surviving twin slice (DuckDB recomputes).
    "s17_ivf_maintenance" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val base = emb.filter($"vec_id" % 5 =!= 4)
      val batch = emb.filter($"vec_id" % 5 === 4)
      val tomb = emb.filter($"vec_id" % 17 === 3).select($"vec_id")
      val tmp = Scratch.dir(s, "s17_ivf")
      val cents = Similarity.trainIvfCentroids(base, "vec_id", "embedding",
        nLists = 16, iters = 1)
      Similarity.saveIvfMemberTable(base, "vec_id", "embedding", cents, tmp)
      Similarity.appendIvfMemberTable(batch, "vec_id", "embedding", cents, tmp)
      val live = s.read.parquet(tmp).join(tomb, Seq("vec_id"), "left_anti")
      val probeLive = Similarity.topKIvfPruned(live, "vec_id", "embedding",
        q, cents, k = 10)
      val survivors = emb.join(tomb, Seq("vec_id"), "left_anti")
      val rebuild = Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(survivors, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, cents, k = 10)
      // full-outer on the id alone; score agreement is an epsilon filter
      // (round-12 ADVICE: exact-double join keys can flake the verdict)
      val eq = probeLive.select($"vec_id", $"cosine".as("__cl"))
        .join(rebuild.select($"vec_id", $"cosine".as("__cr")),
          Seq("vec_id"), "full")
        .agg((count(when($"__cl".isNull || $"__cr".isNull ||
          abs($"__cl" - $"__cr") > 2e-6, 1)) === 0).as("__eq"))
      val noTomb = probeLive.join(tomb, Seq("vec_id"))
        .agg((count(lit(1)) === 0).as("__nt"))
      val (_, samp) = twinSample(emb, "vec_id")
      val exact = Similarity.topKBrute(samp.join(tomb, Seq("vec_id"), "left_anti"),
        "vec_id", "embedding", q, k = 10)
      exact.crossJoin(broadcast(eq)).crossJoin(broadcast(noTomb))
        .select($"vec_id", $"cosine",
          $"__eq".as("incremental_equals_rebuild"),
          $"__nt".as("tombstones_absent"))
    }),

    // S20: LIVE ANN-INDEX INGEST in the gate (round 12) — the STREAMING
    // twin of s17's batch maintenance: the embedding corpus arrives as
    // three micro-batches (one file each) and
    // Streams.runIvfAppendAvailableNow assigns every batch against the
    // same frozen centroids, writing each under its own
    // batch_id=<n>/list_id=<m>/ partition tree (replayed batch
    // overwrites itself — exactly-once without a transaction log).
    // Verdicts: a probe over the STREAM-BUILT table read from disk ≡ the
    // single-shot batch-built index (EXACT — assignment is a pure
    // function of vector and centroids, epsilon only on the rounded
    // cosine join), and ingest is complete (member rows == corpus rows,
    // all distinct). Payload = exact brute top-10 on the twin slice
    // (DuckDB recomputes). The 100 TB shape: live ingest keeps the ANN
    // index fresh without ever rewriting base files; probes prune
    // list_id dirs inside every batch dir, so probe I/O stays
    // ~nProbe/nLists of the ingested total no matter how many batches
    // built it.
    "s20_live_index_ingest" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val tmp = Scratch.dir(s, "s20_ivf")
      val src = s"$tmp/src"; val idx = s"$tmp/idx"; val ckpt = s"$tmp/ckpt"
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      for (i <- 0 until 3)
        emb.filter($"vec_id" % 3 === i).coalesce(1)
          .write.mode("append").parquet(src)
      val schema = s.read.parquet(src).schema
      Streams.withGateStreamConfs(s) {
        Streams.runIvfAppendAvailableNow(
          Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1),
          "vec_id", "embedding", cents, idx, ckpt)
      }
      val live = s.read.parquet(idx)
      val probeLive = Similarity.topKIvfPruned(live, "vec_id", "embedding",
        q, cents, k = 10)
      val rebuild = Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, cents, k = 10)
      val eq = probeLive.select($"vec_id", $"cosine".as("__cl"))
        .join(rebuild.select($"vec_id", $"cosine".as("__cr")),
          Seq("vec_id"), "full")
        .agg((count(when($"__cl".isNull || $"__cr".isNull ||
          abs($"__cl" - $"__cr") > 2e-6, 1)) === 0).as("__eq"))
      val complete = live
        .agg(count(lit(1)).as("__ni"), countDistinct($"vec_id").as("__nd"))
        .crossJoin(emb.agg(count(lit(1)).as("__ne")))
        .select(($"__ni" === $"__ne" && $"__nd" === $"__ne").as("__cmp"))
      val (_, samp) = twinSample(emb, "vec_id")
      val exact = Similarity.topKBrute(samp, "vec_id", "embedding", q, k = 10)
      exact.crossJoin(broadcast(eq)).crossJoin(broadcast(complete))
        .select($"vec_id", $"cosine",
          $"__eq".as("streamed_equals_rebuild"),
          $"__cmp".as("ingest_complete"))
    }),

    // S21: INT8 QUANTIZED SHORTLIST → FULL-PRECISION RE-RANK (round 12 —
    // flips the quantizeInt8 row from spec-only to gate-checked): the
    // embedding-STORE scale pattern — score candidates on the 8×-smaller
    // quantized column, keep a shortlist, re-rank only the shortlist at
    // full precision. Verdicts, all in-plan: (a) the affine
    // reconstruction bound holds for EVERY element of EVERY corpus
    // vector (|v − dequant(v)| ≤ scale/2 — the quantizer's contract, a
    // hard invariant not a statistical one); (b) the re-ranked top-10
    // from a 64-deep quantized shortlist recalls ≥ 6 of the exact brute
    // top-10 (s16's threshold). Payload = exact brute top-10 on the twin
    // slice (DuckDB recomputes). Everything is deterministic arithmetic
    // — quantization, shortlist order, re-rank — so the gate is stable
    // on every corpus.
    "s21_int8_rerank" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val qLit = array(q.map(lit): _*)
      def rerankTop10(df: DataFrame): DataFrame = {
        val quant = df.select($"vec_id", $"embedding",
          Similarity.quantizeInt8($"embedding").as("qs"))
        quant
          .select($"vec_id", $"embedding",
            Similarity.cosine(Similarity.dequantizeInt8($"qs"), qLit).as("__qc"))
          .orderBy($"__qc".desc, $"vec_id".asc).limit(64)
          .select($"vec_id",
            round(Similarity.cosine($"embedding".cast("array<double>"), qLit), 6)
              .as("cosine"))
          .orderBy($"cosine".desc, $"vec_id".asc).limit(10)
      }
      val qok = emb.select($"embedding".cast("array<double>").as("__v"),
          Similarity.quantizeInt8($"embedding").as("qs"))
        .select(aggregate(
            zip_with($"__v", Similarity.dequantizeInt8($"qs"),
              (a, b) => abs(a - b)),
            lit(0.0), (acc, x) => greatest(acc, x)).as("__maxerr"),
          $"qs".getField("scale").as("__sc"))
        .agg((count(when($"__maxerr" > $"__sc" * 0.5 + lit(1e-9), 1)) === 0)
          .as("__qok"))
      val (nVec, samp) = twinSample(emb, "vec_id")
      val exact = Similarity.topKBrute(samp, "vec_id", "embedding", q, k = 10)
      val rr = if (nVec <= TwinSampleCap) rerankTop10(emb) else rerankTop10(samp)
      val nHit = rr.select($"vec_id")
        .join(exact.select($"vec_id"), "vec_id").agg(count(lit(1)).as("n_hit"))
      exact.crossJoin(broadcast(qok)).crossJoin(broadcast(nHit))
        .select($"vec_id", $"cosine",
          $"__qok".as("quant_bound_ok"),
          ($"n_hit" >= 6L).as("recall_ok"))
    }),

    // K5: the RANGE-SORTED LAYOUT + COMPACTION write path, driver-gated
    // (round-9 verdict #5 — these sinks were spec-only): orders is
    // written via Sinks.writeRangeSorted (repartitionByRange +
    // sortWithinPartitions on o_orderdate — the sorted-at-rest layout
    // that turns range predicates into parquet min/max file skipping),
    // read back, and the layout CONTRACT is verified in-plan: per-file
    // key ranges (input_file_name + per-file min/max — the data the
    // parquet footer stats summarize) must be pairwise disjoint, the
    // file count must be bounded by nRanges, and Sinks.compactTo must
    // round-trip every row. Payload = deterministic source aggregates
    // (row count + min/max key, recomputed by DuckDB from the source
    // table); verdicts asserted as literal `true` by the oracle. Same
    // per-application scratch-dir posture as s14/s16.
    "k5_range_layout" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "orders")
      val tmp = Scratch.dir(s, "k5_range")
      graft.sources.Sinks.writeRangeSorted(src, s"$tmp/ranged",
        Seq("o_orderdate"), nRanges = 8)
      graft.sources.Sinks.compactTo(s, s"$tmp/ranged", s"$tmp/compacted", Nil)
      val ranged = s.read.parquet(s"$tmp/ranged")
      val perFile = ranged
        .select($"o_orderdate", input_file_name().as("__f"))
        .groupBy($"__f")
        .agg(min($"o_orderdate").as("__mn"), max($"o_orderdate").as("__mx"))
      // 8 rows — the single-partition window is bounded by nRanges
      val w = Window.partitionBy(
        graft.operators.Relational.onePartKey($"__f"))
        .orderBy($"__mn", $"__mx", $"__f")
      val layout = perFile
        .withColumn("__prev_mx", lag($"__mx", 1).over(w))
        .agg(
          (sum(when($"__prev_mx".isNotNull && $"__mn" <= $"__prev_mx", 1)
            .otherwise(0)) === 0).as("__disj"),
          (count(lit(1)) >= 1L && count(lit(1)) <= 8L).as("__bounded"))
      val nCompact = s.read.parquet(s"$tmp/compacted")
        .agg(count(lit(1)).as("__nc"))
      ranged.agg(count(lit(1)).as("n_rows"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd").as("min_odate"),
          date_format(max($"o_orderdate"), "yyyy-MM-dd").as("max_odate"))
        .crossJoin(broadcast(layout)).crossJoin(broadcast(nCompact))
        .select($"n_rows", $"min_odate", $"max_odate",
          $"__disj".as("ranges_disjoint_ok"),
          $"__bounded".as("files_bounded_ok"),
          ($"__nc" === $"n_rows").as("compact_count_ok"))
    }),

    // K10: BUCKETED co-located join gate — the 100 TB shuffle eliminator
    // (SURVEY §4): both join sides are written once via
    // Sinks.writeBucketed (8 buckets on the join key, catalog-backed
    // saveAsTable into a per-application scratch DATABASE), and the join
    // of the two bucketed tables then requires NO exchange on either side
    // — the scan's bucket layout satisfies the join's distribution, so
    // the fact table never reshuffles for this key again. The no-shuffle
    // property is asserted IN-PLAN as a verdict: the SMJ-forced physical
    // plan string (broadcast disabled during planning, restored after)
    // must contain no Exchange operator; the oracle emits `true`, so a
    // regression to a shuffling plan fails the hash gate, not just a
    // spec. Payload = exact join aggregates (counts + integer-valued
    // quantity sums — order-independent in double) recomputed by DuckDB
    // from the raw tables.
    "k10_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      val db = "graft_k10_" +
        s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
      val loc = Scratch.dir(s, "k10_buck")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
      graft.sources.Sinks.writeBucketed(
        t(s, dir, "orders").select($"o_orderkey", $"o_orderpriority"),
        s"$db.b_orders", Seq("o_orderkey"), 8)
      graft.sources.Sinks.writeBucketed(
        t(s, dir, "lineitem")
          .select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
        s"$db.b_lineitem", Seq("o_orderkey"), 8)
      val joined = s.table(s"$db.b_orders")
        .join(s.table(s"$db.b_lineitem"), "o_orderkey")
      // plan the join with broadcast disabled so the bucket layout (not a
      // BroadcastExchange) is what satisfies the distribution; the verdict
      // is computed from THAT plan, the output aggregate replans freely
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val noShuffle =
        try {
          s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          !s.table(s"$db.b_orders")
            .join(s.table(s"$db.b_lineitem"), "o_orderkey")
            .queryExecution.executedPlan.toString.contains("Exchange")
        } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      val out = graft.functions.Ckpt.materialize(
        joined.groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            round(sum($"l_quantity"), 1).as("sum_qty"))
          .withColumn("no_shuffle_join", lit(noShuffle)))
      // result is materialized (one row per priority), so the scratch
      // DATABASE can be dropped here — the Scratch shutdown hook removes
      // only the LOCATION dir, and without the CASCADE repeated
      // verify/bench runs accumulate dangling catalog entries pointing at
      // deleted paths
      s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
      out
    }),

    // K7: Z-ORDERED layout gate — multi-dimensional file skipping, the
    // lakehouse complement of k5's single-key range layout: Morton-
    // interleaved rank buckets bound EVERY indexed dimension's per-file
    // extent, so predicates on any of the z-columns prune files (a
    // single-key sort leaves every other column spanning ~the full range
    // per file — measured 0.998 vs 0.297 normalized extent in SinksSpec).
    // Verdicts: avg normalized per-file extent ≤ 0.55 on BOTH dims (z
    // property; measured ~0.40/0.30 at sf0.001, sf0.01 and sf0.1), file
    // count bounded, and the write preserves every row. Payload =
    // deterministic source aggregates recomputed by DuckDB.
    "k7_zorder_layout" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "orders")
      val tmp = Scratch.dir(s, "k7_zorder")
      graft.sources.Sinks.writeZOrdered(src, s"$tmp/z",
        Seq("o_orderdate", "o_custkey"), nFiles = 16)
      val z = s.read.parquet(s"$tmp/z")
      val perFile = z.groupBy(input_file_name().as("__f"))
        .agg(min($"o_orderdate".cast("timestamp_ltz").cast("double")).as("dlo"),
          max($"o_orderdate".cast("timestamp_ltz").cast("double")).as("dhi"),
          min($"o_custkey").as("clo"), max($"o_custkey").as("chi"))
      val g = perFile.agg(min($"dlo").as("gdlo"), max($"dhi").as("gdhi"),
        min($"clo").as("gclo"), max($"chi").as("gchi"))
      val verdicts = perFile.crossJoin(broadcast(g))
        .agg(
          (avg(($"dhi" - $"dlo") / greatest($"gdhi" - $"gdlo", lit(1.0))) <= 0.55)
            .as("__date_bounded"),
          (avg(($"chi" - $"clo").cast("double") /
            greatest(($"gchi" - $"gclo").cast("double"), lit(1.0))) <= 0.55)
            .as("__cust_bounded"),
          (count(lit(1)) >= 2L && count(lit(1)) <= 16L).as("__files_ok"))
      val nZ = z.agg(count(lit(1)).as("__nz"))
      src.agg(count(lit(1)).as("n_rows"),
          date_format(min($"o_orderdate"), "yyyy-MM-dd").as("min_odate"),
          date_format(max($"o_orderdate"), "yyyy-MM-dd").as("max_odate"),
          min($"o_custkey").as("min_cust"), max($"o_custkey").as("max_cust"))
        .crossJoin(broadcast(verdicts)).crossJoin(broadcast(nZ))
        .select($"n_rows", $"min_odate", $"max_odate", $"min_cust", $"max_cust",
          $"__date_bounded".as("date_extent_bounded_ok"),
          $"__cust_bounded".as("cust_extent_bounded_ok"),
          $"__files_ok".as("files_bounded_ok"),
          ($"__nz" === $"n_rows").as("rows_preserved_ok"))
    }),

    // E13: the SQL-registered text surface exercised END TO END through
    // `spark.sql` — a dbt-style user's view of the library: the
    // GraftExtensions function registry (graft_langid / graft_tokens_ws /
    // graft_stopword_ratio / graft_fingerprint) must produce the exact
    // rows the Scala API produces (one implementation — the SQL builders
    // apply the same Column combinators), which the DuckDB oracle then
    // recomputes independently. Fails loudly if the extension is not
    // installed on the session — that IS the contract being gated.
    "e13_sql_text_surface" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("graft_e13_docs")
      s.sql("""SELECT doc_id,
                      graft_langid(text) AS pred_lang,
                      CAST(graft_tokens_ws(text) AS BIGINT) AS n_words,
                      round(graft_stopword_ratio(text), 6) AS stop_ratio,
                      graft_fingerprint(text) AS fp
               FROM graft_e13_docs""")
    }),

    // K8: PERSISTED mergeable sketches — k6's incremental-rollup pattern
    // for the aggregate that is NOT algebraic over raw values: distinct
    // counts. Each month's partition stores a fixed-size Datasketches HLL
    // binary (Spark 4's hll_sketch_agg); any cross-month distinct-count
    // rollup is hll_union_agg over the persisted sketches — never a
    // rescan, never a per-key shuffle. This is THE warehouse shape for
    // "distinct users per arbitrary date range" at 100 TB: sketch size is
    // O(2^lgK) per partition regardless of cardinality. Verdicts (oracle
    // emits `true`): the merged estimate lands within the sketch's error
    // bound of the EXACT distinct count (lgK=12 → rsd ≈ 1.6%, bound 6%),
    // and merging the persisted partials tracks the direct full-table
    // sketch within 3% (HLL union is NOT bit-identical to direct — the
    // union operator promotes through coupon/HLL mode and target-type
    // transitions, measured ~0.9% apart here — but both carry the same
    // statistical guarantee; the verdict pins that). Payload = exact
    // count, recomputed by DuckDB.
    "k8_sketch_partials" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "orders").select(
        date_format($"o_orderdate", "yyyy-MM").as("o_month"), $"o_custkey")
      val tmp = Scratch.dir(s, "k8_hll")
      graft.sources.Sinks.replaceTable(
        src.groupBy($"o_month").agg(hll_sketch_agg($"o_custkey", 12).as("hll")),
        tmp)
      val merged = s.read.parquet(tmp)
        .agg(hll_sketch_estimate(hll_union_agg($"hll")).as("m_est"))
      val direct = src.agg(
        hll_sketch_estimate(hll_sketch_agg($"o_custkey", 12)).as("d_est"),
        countDistinct($"o_custkey").as("exact_custs"))
      direct.crossJoin(broadcast(merged))
        .select($"exact_custs",
          (abs($"m_est" - $"exact_custs") <= $"exact_custs" * 0.06)
            .as("within_bound"),
          (abs($"m_est" - $"d_est") <= $"d_est" * 0.03).as("merge_close"))
    }),

    // K11: PERSISTED mergeable QUANTILE partials — completes the
    // non-algebraic-aggregate partial family (k6 = algebraic
    // count/sum/min/max, k8 = HLL distinct counts, k11 = percentiles).
    // Each month's partition stores a fixed-grid histogram
    // (Stats.histogramPartials — grid chosen a priori, so partials are
    // EXACTLY mergeable by integer addition); "p50/p90/p99 over an
    // arbitrary date range" is then a merge of ≤ nBins-row persisted
    // tables + a constant-size rank scan (Stats.histogramQuantiles),
    // never a rescan of the fact table. Unlike HLL the error contract
    // here is DETERMINISTIC: the true interpolated quantile provably
    // lies inside the bracketing-bin interval, so the gate asserts
    // |est − exact| ≤ err_bound as a hard invariant, for BOTH the
    // full-range merge and a 1995 sub-range merge (the arbitrary-range
    // story, exercised against partials read back from the K1 sink).
    // Third verdict: the merged at-rest histogram equals the direct
    // single-pass histogram bin-for-bin (integer counts — exact).
    // Payload = the EXACT quantiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, both interpolate at rank p·(n−1)), recomputed
    // independently by the oracle.
    "k11_quantile_partials" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Stats
      val (lo, hi, nBins) = (0.0, 600000.0, 4096)
      val src = t(s, dir, "orders").select(
        date_format($"o_orderdate", "yyyy-MM").as("o_month"), $"o_totalprice")
      val tmp = Scratch.dir(s, "k11_hist")
      graft.sources.Sinks.overwritePartitions(
        Stats.histogramPartials(src, "o_totalprice", "o_month", lo, hi, nBins)
          .repartition($"o_month"), tmp, Seq("o_month"))
      val atRest = s.read.parquet(tmp)
      val direct = Stats.histogramPartials(
          src.withColumn("__all", lit(1)), "o_totalprice", "__all", lo, hi, nBins)
        .select($"bin", $"bin_n".as("d_n"))
      val mergeOk = atRest.groupBy($"bin").agg(sum($"bin_n").as("m_n"))
        .join(direct, Seq("bin"), "full")
        .agg((count(when($"m_n".isNull || $"d_n".isNull ||
          $"m_n" =!= $"d_n", 1)) === 0).as("__mok"))
      def rangeRows(label: String,
                    monthFilter: org.apache.spark.sql.Column) = {
        val est = Stats.histogramQuantiles(
          atRest.filter(monthFilter), Seq(0.5, 0.9, 0.99), lo, hi, nBins)
        // Exact twin via the sort+rank form: the built-in percentile
        // aggregate merged a value→count map of ~15 M near-all-distinct
        // prices on ONE reducer per expression — 3 expressions × 2 range
        // labels = 180 s of single-core time at sf10 (campaign find #3).
        val exact = Stats.exactQuantiles(src.filter(monthFilter),
          "o_totalprice", Seq("e50" -> 0.5, "e90" -> 0.9, "e99" -> 0.99))
        val pick = when($"p" === 0.5, $"e50")
          .when($"p" === 0.9, $"e90").otherwise($"e99")
        est.crossJoin(broadcast(exact))
          .select(lit(label).as("range_label"), $"p",
            round(pick, 4).as("exact_q"),
            (abs($"est" - pick) <= $"err_bound" + lit(1e-9)).as("within_bound"))
      }
      rangeRows("full", lit(true))
        .unionAll(rangeRows("1995", $"o_month".between("1995-01", "1995-12")))
        .crossJoin(broadcast(mergeOk))
        .select($"range_label", $"p", $"exact_q", $"within_bound",
          $"__mok".as("merge_exact"))
    }),

    // K14: PERSISTED mergeable HEAVY-HITTER partials (round 12 — the
    // fourth member of the sketch family: k8 HLL distinct, k11 quantile
    // grids, k12 count-min point lookups, k14 top-k ENUMERATION — the
    // one question count-min cannot answer without knowing which keys to
    // probe). Per language, the exact word counts pruned to words above
    // N_lang/k are written through the K1 sink (< k rows per period
    // REGARDLESS of vocabulary size — the property that compacts 100 TB
    // of per-period facts into mergeable partials); merging any period
    // subset gives est with the DETERMINISTIC pigeonhole envelope
    // est ≤ true ≤ est + Σ⌊N_p/k⌋, and any word above that Σ bound
    // provably surfaces. Unlike Misra–Gries/SpaceSaving the summary is a
    // pure function of each period's multiset — no stream-order
    // dependence — so DuckDB recomputes the ENTIRE merged summary
    // hash-identically (kept set, est, bound, ranks), not just verdicts.
    // The period key coalesces NULL langs to a sentinel: a period
    // dropped by the equi-join would leak unpruned mass past the
    // completeness guarantee (null-planted corpus). Application: the
    // corpus stopword/contamination list, maintained incrementally.
    "k14_heavyhitter_partials" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Stats
      val k = 60
      // persisted: words feeds five consumers (partials write, stats
      // write, exact counts, both direct-twin recomputes) and the
      // normalize+explode over documents is the expensive part — one
      // materialization instead of five scans (Bench clears caches
      // between queries)
      val words = t(s, dir, "documents")
        .select(coalesce($"lang", lit("__null__")).as("lang"),
          explode(split(Text.normalize($"text"), " ")).as("word"))
        .filter(length($"word") > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tmp = Scratch.dir(s, "k14_hh")
      graft.sources.Sinks.overwritePartitions(
        Stats.heavyHitterPartials(words, "word", "lang", k)
          .repartition($"lang"), s"$tmp/partials", Seq("lang"))
      graft.sources.Sinks.replaceTable(
        words.groupBy($"lang").agg(count(lit(1)).as("n_rows")), s"$tmp/stats")
      val atRest = s.read.parquet(s"$tmp/partials")
      val stats = s.read.parquet(s"$tmp/stats")
      val merged = Stats.heavyHittersMerged(atRest, stats, "word", k)
      val exact = words.groupBy($"word").agg(count(lit(1)).as("exact"))
      // both bound directions, per reported word
      val boundOk = merged.join(exact, Seq("word"), "left")
        .agg((count(when($"exact".isNull || $"est" > $"exact" ||
          $"exact" > $"est" + $"err_bound", 1)) === 0).as("__bok"))
      // completeness: nothing above the global bound is missing
      val bound = stats.agg(sum(floor($"n_rows" / k)).cast("long").as("__b"))
      val missed = exact.crossJoin(broadcast(bound)).filter($"exact" > $"__b")
        .join(merged.select($"word"), Seq("word"), "left_anti")
        .agg((count(lit(1)) === 0).as("__comp"))
      // at-rest merge ≡ in-memory direct (integer sums — exact)
      val directM = Stats.heavyHittersMerged(
        Stats.heavyHitterPartials(words, "word", "lang", k),
        words.groupBy($"lang").agg(count(lit(1)).as("n_rows")), "word", k)
      val mEq = merged.select($"word", $"est".as("__e1"))
        .join(directM.select($"word", $"est".as("__e2")), Seq("word"), "full")
        .agg((count(when($"__e1".isNull || $"__e2".isNull ||
          $"__e1" =!= $"__e2", 1)) === 0).as("__meq"))
      val one = graft.operators.Relational.onePartKey($"word")
      merged.withColumn("rank", row_number().over(
          Window.partitionBy(one).orderBy($"est".desc, $"word".asc)))
        .filter($"rank" <= 20)
        .crossJoin(broadcast(boundOk)).crossJoin(broadcast(missed))
        .crossJoin(broadcast(mEq))
        .select($"word", $"est", $"err_bound", $"rank",
          $"__bok".as("bounds_hold"),
          $"__comp".as("complete_above_bound"),
          $"__meq".as("merged_eq_direct"))
    }),

    // K12: PERSISTED mergeable FREQUENCY partials — the heavy-hitter
    // member of the non-algebraic partial trio (k8 = HLL distinct, k11 =
    // histogram quantiles, k12 = count-min frequencies). Each month's
    // partition stores one count-min sketch binary; "top-key counts over
    // an arbitrary date range" is then a Stats.countMinUnion of ≤ #months
    // KB-sized binaries + O(1) probes — never a rescan. Unlike k8's HLL
    // union (statistical drift through mode promotions), CMS union is
    // counter-wise integer ADDITION under the shared (depth, width, seed),
    // so the gate asserts the merged-at-rest estimate EQUALS the
    // direct-over-the-range sketch per probed key (merged_eq_direct) on
    // top of the two CMS contracts (never_undercount — structural;
    // within_eps — overcount ≤ eps·N) for BOTH the full range and a 1995
    // sub-range. Payload = exact top-20 counts per range, recomputed by
    // DuckDB.
    "k12_countmin_partials" -> ((s, dir) => {
      import s.implicits._
      import graft.functions.Stats
      val eps = 1e-3
      val src = t(s, dir, "orders").select(
        date_format($"o_orderdate", "yyyy-MM").as("o_month"), $"o_custkey")
      val tmp = Scratch.dir(s, "k12_cms")
      graft.sources.Sinks.replaceTable(
        src.groupBy($"o_month")
          .agg(Stats.countMinSketchAgg($"o_custkey", eps).as("cms")), tmp)
      val atRest = s.read.parquet(tmp)
      def probeRows(label: String, mf: org.apache.spark.sql.Column) = {
        val mergedSk = atRest.filter(mf).agg(Stats.countMinUnion($"cms"))
          .head().getAs[Array[Byte]](0)
        val directSk = src.filter(mf).agg(Stats.countMinSketchAgg($"o_custkey", eps))
          .head().getAs[Array[Byte]](0)
        val bcM = s.sparkContext.broadcast(mergedSk)
        val bcD = s.sparkContext.broadcast(directSk)
        // deserialize once per executor (a20's discipline), not per row
        val estM = udf(new (Long => Long) with Serializable {
          @transient private lazy val cms = Stats.readCountMin(bcM.value)
          def apply(k: Long): Long = cms.estimateCount(k)
        })
        val estD = udf(new (Long => Long) with Serializable {
          @transient private lazy val cms = Stats.readCountMin(bcD.value)
          def apply(k: Long): Long = cms.estimateCount(k)
        })
        src.filter(mf).groupBy($"o_custkey").agg(count(lit(1)).as("exact"))
          .orderBy($"exact".desc, $"o_custkey".asc).limit(20)
          .withColumn("__m", estM($"o_custkey"))
          .withColumn("__d", estD($"o_custkey"))
          .crossJoin(broadcast(src.filter(mf).agg(count(lit(1)).as("__n"))))
          .select(lit(label).as("range_label"), $"o_custkey", $"exact",
            ($"__m" >= $"exact").as("never_undercount"),
            ($"__m" - $"exact" <= ceil($"__n" * lit(eps))).as("within_eps"),
            ($"__m" === $"__d").as("merged_eq_direct"))
      }
      probeRows("full", lit(true))
        .unionAll(probeRows("1995", $"o_month".between("1995-01", "1995-12")))
    }),

    // K13: JSON-LINES INGEST with corrupt-record quarantine (round 12 —
    // the format raw scraped corpora arrive in): the documents table is
    // round-tripped through JSONL and read back by
    // sources.JsonLinesSource with an EXPLICIT schema (inference would
    // be a second full pass over a 100 TB corpus) in PERMISSIVE mode —
    // three deliberately mangled lines (truncated object, stray log
    // line, two-objects-one-line) are planted in their own shard and
    // must surface as quarantine rows carrying the RAW line, never
    // killing the read (FAILFAST) or vanishing (DROPMALFORMED). Payload
    // = per-lang doc counts over the CLEAN rows + the corrupt count;
    // verdict = clean rows round-trip the parquet source exactly
    // (full-outer on doc_id, null-safe lang/text compare — on the nulls
    // corpus, Spark's writer omits null fields and the reader restores
    // them as null, which this verdict proves). DuckDB recomputes the
    // counts from the parquet table; the planted-corrupt count is the
    // literal 3.
    "k13_jsonl_ingest" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select($"doc_id", $"lang", $"text")
      val tmp = Scratch.dir(s, "k13_jsonl")
      val raw = s"$tmp/raw"
      docs.write.mode("overwrite").json(raw)
      // all three must be malformed IN the first JSON value: Spark's
      // Jackson parser takes the first valid value per line and tolerates
      // trailing garbage ({"a":1}{"b":2} parses as the FIRST object, not
      // a corrupt line — discovered by this gate's first run)
      val bad = Seq(
        """{"doc_id": 900000001, "lang": "en", "text": "truncated""",
        """not json at all - a stray upstream log line""",
        """{"doc_id": 900000002, "lang": }""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(raw, "corrupt-shard.json"),
        bad.mkString("\n").getBytes("UTF-8"))
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("lang", "string").add("text", "string")
      val in = graft.sources.JsonLinesSource.read(s, raw, schema)
      val good = in.filter($"_corrupt_record".isNull)
        .select($"doc_id", $"lang", $"text")
      // QUARANTINE AT REST: the bad rows (raw line preserved) land in
      // their own table for replay after the upstream fix. This is also
      // the only robust way to COUNT them — Spark rejects any query
      // whose pruned scan schema is the corrupt column alone
      // (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and a
      // count's pruning reduces to exactly that; the write references
      // every column, and the count runs on the parquet it produced.
      val quarantine = s"$tmp/quarantine"
      in.filter($"_corrupt_record".isNotNull)
        .write.mode("overwrite").parquet(quarantine)
      val nc = s.read.parquet(quarantine).agg(count(lit(1)).as("n_corrupt"))
      val eq = good.select($"doc_id".as("__i1"), $"lang".as("__l1"),
          $"text".as("__t1"))
        .join(docs.select($"doc_id".as("__i2"), $"lang".as("__l2"),
          $"text".as("__t2")), $"__i1" === $"__i2", "full")
        .agg((count(when($"__i1".isNull || $"__i2".isNull ||
          !($"__l1" <=> $"__l2") || !($"__t1" <=> $"__t2"), 1)) === 0)
          .as("__rt"))
      good.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(nc.select($"n_corrupt")))
        .crossJoin(broadcast(eq))
        .select($"lang", $"n_docs", $"n_corrupt", $"__rt".as("roundtrip_ok"))
    }),

    // D14: EXACT shared-span detection (Lee et al. 2021's exact-substring
    // dedup, relational form — see Dedup.sharedSpans): word-8-gram
    // inverted index → pair-informative hash cap (2..8 docs AND ≤32 total
    // occurrences, bounding the per-gram join fan-out on repetitive text)
    // → bucket self-join → maximal-run island merge. Fully deterministic,
    // so the WHOLE span table is hash-checked — no verdict weakening
    // needed; the DuckDB twin applies the identical caps.
    "d14_shared_spans" -> ((s, dir) => {
      import s.implicits._
      Dedup.sharedSpans(t(s, dir, "documents"), "text", "doc_id",
        n = 8, maxDocsPerGram = 8)
    }),

    // K6: INCREMENTAL re-aggregation over persisted partials — the other
    // half of the reference's daily-materialization story (delete-then-
    // append per partition, bigquery_io_manager.py:115-167) and the
    // 100 TB rollup shape: each period's partition stores ALGEBRAIC
    // partial aggregates (count / exact-cents sum / min / max) per
    // status, so any cross-period rollup is a merge of partials — never a
    // rescan of the fact table. Gate, in one plan: (a) write
    // month-partitioned partials through the K1
    // dynamic-partition-overwrite sink; (b) re-materialize the 3 most
    // recent months a second time (the idempotence contract K1
    // exists to provide); (c) merge the persisted partials into
    // per-status totals. Verdicts (oracle asserts literal `true`):
    // merge ≡ direct aggregation of the source — EXACT equality, the sum
    // is kept in integer cents so partial-merge order cannot perturb it —
    // and the double overwrite left the partial table unchanged. Payload
    // columns come from the MERGED side; DuckDB recomputes them straight
    // from `orders`, so a wrong merge fails the hash too.
    // Partition GRAIN and FILE hygiene (round-10 lesson, 43 s → ~2 s at
    // sf0.1): day-grain partitions over this table's multi-year span mean
    // ~2,400 partition dirs, and without clustering every shuffle task
    // writes a file into every dir it touches — the small-files explosion
    // that kills object-store warehouses. Month grain sizes the partition
    // count to the data (~80 dirs), and the repartition-by-partition-key
    // inside a dynamic overwrite yields exactly ONE file per partition
    // per write while staying fully parallel ACROSS partitions. Both are
    // the documented at-scale posture, now exercised by the gate.
    "k6_partial_agg_merge" -> ((s, dir) => {
      import s.implicits._
      val src = t(s, dir, "orders").select(
        date_format($"o_orderdate", "yyyy-MM").as("o_month"),
        $"o_orderstatus",
        $"o_totalprice",
        round($"o_totalprice" * 100).cast("long").as("price_cents"))
      val partial = src.groupBy($"o_month", $"o_orderstatus")
        .agg(count(lit(1)).as("p_n"), sum($"price_cents").as("p_cents"),
          min($"o_totalprice").as("p_min"), max($"o_totalprice").as("p_max"))
      val tmp = Scratch.dir(s, "k6_incr")
      graft.sources.Sinks.overwritePartitions(
        partial.repartition($"o_month"), tmp, Seq("o_month"))
      val n1 = s.read.parquet(tmp).count()
      // idempotent re-materialization of the 3 most recent months: only
      // those partitions are rewritten (dynamic overwrite), rest untouched
      val recentMonths = partial.select($"o_month").distinct()
        .orderBy($"o_month".desc).limit(3)
      graft.sources.Sinks.overwritePartitions(
        partial.join(broadcast(recentMonths), Seq("o_month"))
          .repartition($"o_month"), tmp, Seq("o_month"))
      val n2 = s.read.parquet(tmp).count()
      val merged = s.read.parquet(tmp)
        .groupBy($"o_orderstatus")
        .agg(sum($"p_n").as("m_n"), sum($"p_cents").as("m_cents"),
          min($"p_min").as("m_min"), max($"p_max").as("m_max"))
      val direct = src.groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("d_n"), sum($"price_cents").as("d_cents"),
          min($"o_totalprice").as("d_min"), max($"o_totalprice").as("d_max"))
      merged.join(direct, Seq("o_orderstatus"), "full")
        .select($"o_orderstatus",
          $"m_n".as("n_orders"),
          $"m_cents".as("sum_price_cents"),
          round($"m_min", 4).as("min_price"),
          round($"m_max", 4).as("max_price"),
          ($"m_n" <=> $"d_n" && $"m_cents" <=> $"d_cents" &&
            $"m_min" <=> $"d_min" && $"m_max" <=> $"d_max")
            .as("merge_matches_direct"),
          lit(n1 == n2).as("idempotent_overwrite_ok"))
    }),

    // C1: the END-TO-END corpus-prep pipeline — the composition a real
    // pretraining-data run executes, as ONE declarative plan: language-ID
    // (t3's marker voting) → quality filter (t13's three rules, pass
    // side) → exact dedup (keep smallest doc_id per canonical-text md5,
    // d1's fingerprint) → whitespace token count → greedy sequence
    // packing at a 2048-token budget (t5) → per-pack manifest (t21's
    // aggregate shape). Every stage is the library primitive the
    // standalone queries already gate, so the whole pipeline is
    // oracle-expressible: DuckDB recomputes all six stages and the
    // result hash must match exactly — no verdict weakening.
    // Shuffle ledger (the point of composing declaratively instead of
    // materializing between stages) — TWO exchanges total for a
    // six-stage pipeline (verified via graft.Explain): (1) on the dedup
    // fingerprint, where Spark additionally pushes a PARTIAL
    // WindowGroupLimit below the exchange so at most one candidate row
    // per fingerprint per input partition shuffles at all; (2) on
    // pred_lang for the packing window — and the manifest groupBy
    // (pred_lang, pack_id) reuses that very partitioning (hash on a
    // subset of the grouping keys satisfies ClusteredDistribution), so
    // the final aggregate needs NO exchange of its own. The langid +
    // quality-metric projection fuses into the scan's
    // whole-stage-codegen pass, and the quality filter runs before the
    // first exchange so dup/low-quality rows never shuffle.
    // At 100 TB the shape is identical with one swap: per-language
    // packing windows (5 huge groups = 5 tasks) become
    // Text.packSequencesScalable's distributed prefix scan (t20).
    // PLAN NOTE (round-10 tuning, 4.4 s → see PLANS.md): the naive
    // filter-then-window form evaluates the langid/quality expressions in
    // a FilterExec, and filter codegen has NO subexpression elimination —
    // `split(normalize(text))` re-runs ~25× per row and dominates. This
    // form computes every text metric ONCE in the scan-stage Project
    // (where CSE applies, like t3), folds the quality rules into a tiny
    // `__fail` flag, and moves the filter ABOVE the dedup window — which
    // Catalyst cannot push back down (the predicate isn't on the window's
    // partition key), so nothing is re-derived. Rejected rows do now
    // cross the fingerprint exchange, but as ~50-byte metadata rows (the
    // text never shuffles), a cost that stays negligible at 100 TB while
    // the regex work stays single-pass. The winner rule is IDENTICAL to
    // filter-then-dedup: ordering the window by (__fail ASC, doc_id ASC)
    // and keeping rn=1 ∧ ¬__fail selects exactly the minimum PASSING
    // doc_id of each fingerprint group (groups with no passing row rank a
    // failing row first, which the filter then drops).
    "c1_corpus_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val scored = docs.select($"doc_id",
        Text.langId($"text").as("pred_lang"),
        Text.tokenCountWs($"text").cast("long").as("n_tokens"),
        Text.fingerprintMd5($"text").as("__fp"),
        (Text.langId($"text") === "und" ||
          Text.tokenCountWs($"text").cast("long") < 20 ||
          Text.meanWordLen($"text") > 4.75 ||
          Text.stopwordRatio($"text") < 0.05).as("__fail"))
      val wFp = Window.partitionBy($"__fp")
        .orderBy($"__fail".asc, $"doc_id".asc)
      val deduped = scored
        .withColumn("__rn", row_number().over(wFp))
        .filter($"__rn" === 1 && !$"__fail")
        .select($"doc_id", $"pred_lang", $"n_tokens")
      val packed = Text.packSequences(deduped, "pred_lang", "doc_id",
        "n_tokens", budget = 2048L)
      packed.groupBy($"pred_lang", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("pack_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
    })
  )

  /** PRODUCTION-ONLY variants of the verdict-carrying gate queries — the
    * pipeline a user actually deploys, with the exact-twin/verdict harness
    * stripped. Two consumers: (1) Bench's SPARK_GRAFT_SPLIT mode times
    * these next to the gated forms, so bench movement is attributable to
    * harness weight vs plan changes without a diff pass (round-9 verdict
    * item 7); (2) they document the plain-API call for each capability.
    * Parameters match the gated twins exactly. */
  def productionOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d2_minhash_lsh_neardup" -> ((s, dir) =>
      Dedup.nearDupMinhashLsh(t(s, dir, "documents"), "text", "doc_id",
        n = 2, k = 64, bands = 16, threshold = 0.4, reuseSignatures = true)),
    "d3_simhash_neardup" -> ((s, dir) =>
      Dedup.simhashNearDup(t(s, dir, "documents"), "text", "doc_id",
        radius = 8, blockCols = Seq("lang"))),
    "d5_embedding_neardup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.embeddingNearDupBlocked(emb,
        "vec_id", "embedding", k = 50,
        nLists = math.max(16, math.ceil(math.sqrt(emb.count().toDouble)).toInt),
        nProbe = 4)
    }),
    "d13_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, k = 5, nLists = 64,
        trainIters = 2, maxCandidateFraction = 0.25,
        maxCandidatesPerVector = 500L)),
    "s2_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter($"vec_id" < 3)
        .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
      Similarity.topKLshBatch(emb, queries, "vec_id", "embedding",
        "query_id", k = 10, dim = 64, bits = 16, hammingRadius = 6)
    }),
    "s5_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter($"vec_id" === 0)
        .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
      val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
        nLists = 16, iters = 1)
      Similarity.topKIvfPruned(
        Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
        "vec_id", "embedding", q, cents, k = 10, nProbe = 8)
    }),
    "s7_knn_graph" -> ((s, dir) =>
      Similarity.knnGraphBlockedAuto(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 3, nLists = 64, trainIters = 2,
        maxCandidateFraction = 0.4, maxCandidatesPerVector = 800L)),
    // d15 production = build the index ONCE at rest, probe with the batch
    // — no rebuild twin (the gated form runs the rebuild it must equal)
    "d15_incremental_neardup" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val (bandsDf, shinglesDf) = Dedup.nearDupIndexTables(
        docs.filter($"doc_id" % 4 =!= 0), "text", "doc_id")
      d15WriteAndProbe(s, Scratch.dir(s, "d15_prod"), bandsDf, shinglesDf,
        docs.filter($"doc_id" % 4 === 0))
    }),
    "t22_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val sh = shingles4(s, dir)
      val bench = sh.filter($"doc_id" % 100 === 0).select($"shingle").distinct()
      val nBench = math.max(1L, bench.count())
      val bloom = Prune.bloomLiteral(bench, $"shingle",
        nItems = nBench, nBits = math.max(1024L, 24L * nBench))
      sh.filter($"doc_id" % 100 =!= 0)
        .groupBy($"doc_id")
        .agg(sum(when(Prune.mightContain(bloom, $"shingle"), 1L).otherwise(0L))
          .as("n_flagged"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // ---- round-9 bound-verdict oracles: deterministic exact columns the
    // oracle recomputes independently + contract verdicts it asserts as
    // literal `true` — an engine-side contract violation fails the hash.
    // Twin slice: the w CTE samples exactly as the engine side
    // (hashSampleCapFilter) — n_docs stays the FULL count.
    "d2_minhash_lsh_neardup" ->
      s"""WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ') AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")}),
         sh AS (
           SELECT doc_id,
                  list_distinct(CASE WHEN len(words) < 2 THEN [words[1]]
                    ELSE list_transform(range(1, len(words)),
                         i -> words[i] || ' ' || words[i+1]) END) AS gs
           FROM w),
         pairs AS (
           SELECT a.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
                 (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs))) >= 0.4)
         SELECT (SELECT count(*) FROM documents) AS n_docs,
                (SELECT count(*) FROM pairs) AS n_exact_pairs,
                true AS precision_ok, true AS recall_ok""",
    "d3_simhash_neardup" ->
      s"""SELECT lang, count(*) AS n_docs, true AS pairs_match_naive
         FROM documents WHERE ${twinSampleSql("documents", "doc_id")}
         GROUP BY lang""",
    "d16_record_linkage" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         sh AS (
           SELECT doc_id,
                  list_distinct(CASE WHEN len(words) < 2 THEN [words[1]]
                    ELSE list_transform(range(1, len(words)),
                         i -> words[i] || ' ' || words[i+1]) END) AS gs
           FROM w),
         lft AS (
           SELECT doc_id, gs FROM sh
           WHERE doc_id % 3 = 0 AND (
             (SELECT count(*) FROM documents WHERE doc_id % 3 = 0) <= 400 OR
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
               printf('%04x', least(65535, CAST(floor(65536.0 * 400.0 /
                 (SELECT count(*) FROM documents WHERE doc_id % 3 = 0)) AS BIGINT) + 1)))),
         rgt AS (SELECT doc_id, gs FROM sh WHERE doc_id % 3 <> 0),
         pairs AS (
           SELECT l.doc_id AS left_id, r.doc_id AS right_id,
                  round(CAST(len(list_intersect(l.gs, r.gs)) AS DOUBLE) /
                        (len(l.gs) + len(r.gs) - len(list_intersect(l.gs, r.gs))), 6) AS jaccard
           FROM lft l JOIN rgt r ON true
           WHERE CAST(len(list_intersect(l.gs, r.gs)) AS DOUBLE) /
                 (len(l.gs) + len(r.gs) - len(list_intersect(l.gs, r.gs))) >= 0.4)
         SELECT left_id, right_id, jaccard, true AS agreement_ok,
                true AS at_rest_matches_inmem FROM (
           SELECT *, row_number() OVER (PARTITION BY left_id
             ORDER BY jaccard DESC, right_id ASC) AS rn
           FROM pairs) WHERE rn = 1""",
    "d5_embedding_neardup" ->
      s"""WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
                           CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                     WHERE ${twinSampleSql("embeddings", "vec_id")}),
         p AS (
           SELECT a.id AS id_a, b.id AS id_b,
                  round(list_dot_product(a.e, b.e) /
                        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
           FROM v a JOIN v b ON a.id < b.id)
         SELECT id_a, id_b, cosine, true AS recall_ok, true AS full_pipeline_ok
         FROM p ORDER BY cosine DESC, id_a ASC, id_b ASC LIMIT 50""",
    "d13_semantic_dedup" ->
      s"""WITH RECURSIVE v AS (
           SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings
           WHERE ${twinSampleSql("embeddings", "vec_id")}),
         pairs AS (
           SELECT a.id AS id_a, b.id AS id_b FROM v a JOIN v b ON a.id < b.id
           WHERE round(list_dot_product(a.e, b.e) /
                       (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.45),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(node, label) AS (
           SELECT id, id FROM v
           UNION
           SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
         clusters AS (SELECT node AS vec_id, min(label) AS cluster_id
                      FROM reach GROUP BY node),
         sizes AS (SELECT cluster_id, count(*) AS cluster_size,
                          min(vec_id) AS rep
                   FROM clusters GROUP BY cluster_id)
         SELECT c.vec_id, c.cluster_id, s.cluster_size,
                c.vec_id = s.rep AS keep, true AS ann_agree_ok,
                true AS full_cover_ok
         FROM clusters c JOIN sizes s USING (cluster_id)""",
    "s2_ann_lsh" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_embedding
                    FROM embeddings WHERE vec_id < 3),
         samp AS (SELECT * FROM embeddings
                  WHERE ${twinSampleSql("embeddings", "vec_id")}),
         scored AS (
           SELECT q.query_id, e.vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.q_embedding AS DOUBLE[])) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(CAST(q.q_embedding AS DOUBLE[]), CAST(q.q_embedding AS DOUBLE[])))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT query_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank,
                true AS recall_ok, true AS self_hit_ok
         FROM scored
         QUALIFY rank <= 10""",
    "s5_ann_ivf" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         samp AS (SELECT * FROM embeddings
                  WHERE ${twinSampleSql("embeddings", "vec_id")}),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT vec_id, cosine, true AS recall_ok, true AS self_hit_ok
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "s7_knn_graph" ->
      s"""WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
                           CAST(embedding AS DOUBLE[]) AS e FROM embeddings
                     WHERE ${twinSampleSql("embeddings", "vec_id")}),
         p AS (
           SELECT a.id AS id, b.id AS nbr_id,
                  round(list_dot_product(a.e, b.e) /
                        (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
           FROM v a JOIN v b ON a.id <> b.id)
         SELECT id, nbr_id, cosine,
                CAST(row_number() OVER (PARTITION BY id ORDER BY cosine DESC, nbr_id ASC) AS INT) AS rank,
                true AS recall_ok, true AS full_edges_ok
         FROM p
         QUALIFY rank <= 3""",
    "s8_pq_adc" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         d AS (
           SELECT vec_id,
                  round(list_dot_product(q.qe, q.qe) + list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS l2sq
           FROM embeddings e CROSS JOIN q)
         SELECT vec_id, l2sq, true AS self_hit_adc, true AS adc_nonneg,
                true AS adc_err_ok
         FROM d ORDER BY l2sq ASC, vec_id ASC LIMIT 10""",
    "s14_index_persist" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM embeddings e CROSS JOIN q)
         SELECT vec_id, cosine, true AS ivf_roundtrip_ok, true AS pq_roundtrip_ok
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "s16_member_table_probe" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         samp AS (SELECT * FROM embeddings
                  WHERE ${twinSampleSql("embeddings", "vec_id")}),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT vec_id, cosine, true AS pruned_roundtrip_ok, true AS recall_ok
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "s17_ivf_maintenance" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         samp AS (SELECT * FROM embeddings
                  WHERE (${twinSampleSql("embeddings", "vec_id")})
                    AND vec_id % 17 <> 3),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT vec_id, cosine, true AS incremental_equals_rebuild,
                true AS tombstones_absent
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "s21_int8_rerank" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         samp AS (SELECT * FROM embeddings
                  WHERE (${twinSampleSql("embeddings", "vec_id")})),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT vec_id, cosine, true AS quant_bound_ok, true AS recall_ok
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "s20_live_index_ingest" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         samp AS (SELECT * FROM embeddings
                  WHERE (${twinSampleSql("embeddings", "vec_id")})),
         scored AS (
           SELECT vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(q.qe, q.qe))), 6) AS cosine
           FROM samp e CROSS JOIN q)
         SELECT vec_id, cosine, true AS streamed_equals_rebuild,
                true AS ingest_complete
         FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10""",
    "k5_range_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                strftime(min(o_orderdate), '%Y-%m-%d') AS min_odate,
                strftime(max(o_orderdate), '%Y-%m-%d') AS max_odate,
                true AS ranges_disjoint_ok,
                true AS files_bounded_ok,
                true AS compact_count_ok
         FROM orders""",
    "t25_bpe_merges" ->
      """WITH wrd AS (
           SELECT word, count(*) AS freq FROM (
             SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS word
             FROM documents)
           WHERE length(word) > 0 GROUP BY word),
         pos AS (
           SELECT word, freq, unnest(range(1, length(word))) AS i FROM wrd),
         pair AS (
           SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
                  sum(freq) AS f
           FROM pos GROUP BY 1, 2),
         top1 AS (
           SELECT l, r, CAST(f AS BIGINT) AS f FROM pair
           ORDER BY f DESC, l ASC, r ASC LIMIT 1)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM wrd) AS n_words,
                l AS first_left, r AS first_right, f AS first_freq,
                true AS n_merges_ok, true AS monotone_ok,
                true AS pairs_distinct_ok
         FROM top1""",
    "d15_incremental_neardup" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(CASE WHEN doc_id % 4 = 0 THEN 1 END) AS BIGINT) AS n_new,
                true AS matches_full_rebuild,
                true AS pairs_found
         FROM documents""",
    "k10_bucketed_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
                round(sum(l_quantity), 1) AS sum_qty,
                true AS no_shuffle_join
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         GROUP BY o_orderpriority""",
    "s15_kcenter_coreset" ->
      """WITH v AS (SELECT CAST(vec_id AS BIGINT) AS id,
                           CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         c1 AS (SELECT id, e FROM v ORDER BY id LIMIT 1),
         d1 AS (SELECT v.id, v.e,
                list_dot_product(c.e, c.e) + list_dot_product(v.e, v.e) - 2 * list_dot_product(v.e, c.e) AS d
                FROM v CROSS JOIN c1 c WHERE v.id <> c.id),
         c2 AS (SELECT id, e, round(d, 6) AS rd FROM d1
                ORDER BY round(d, 6) DESC, id ASC LIMIT 1),
         d2 AS (SELECT d1.id, d1.e,
                least(d1.d, list_dot_product(c.e, c.e) + list_dot_product(d1.e, d1.e) - 2 * list_dot_product(d1.e, c.e)) AS d
                FROM d1 CROSS JOIN c2 c WHERE d1.id <> c.id),
         c3 AS (SELECT id, e, round(d, 6) AS rd FROM d2
                ORDER BY round(d, 6) DESC, id ASC LIMIT 1),
         d3 AS (SELECT d2.id, d2.e,
                least(d2.d, list_dot_product(c.e, c.e) + list_dot_product(d2.e, d2.e) - 2 * list_dot_product(d2.e, c.e)) AS d
                FROM d2 CROSS JOIN c3 c WHERE d2.id <> c.id),
         c4 AS (SELECT id, e, round(d, 6) AS rd FROM d3
                ORDER BY round(d, 6) DESC, id ASC LIMIT 1),
         d4 AS (SELECT d3.id, d3.e,
                least(d3.d, list_dot_product(c.e, c.e) + list_dot_product(d3.e, d3.e) - 2 * list_dot_product(d3.e, c.e)) AS d
                FROM d3 CROSS JOIN c4 c WHERE d3.id <> c.id),
         c5 AS (SELECT id, round(d, 6) AS rd FROM d4
                ORDER BY round(d, 6) DESC, id ASC LIMIT 1)
         SELECT CAST(1 AS INT) AS rank, id, CAST(0.0 AS DOUBLE) AS dist FROM c1
         UNION ALL SELECT CAST(2 AS INT), id, rd FROM c2
         UNION ALL SELECT CAST(3 AS INT), id, rd FROM c3
         UNION ALL SELECT CAST(4 AS INT), id, rd FROM c4
         UNION ALL SELECT CAST(5 AS INT), id, rd FROM c5""",
    "s9_ivfpq_adc" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                    FROM embeddings WHERE vec_id = 0),
         d AS (
           SELECT vec_id,
                  round(list_dot_product(q.qe, q.qe) + list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                        - 2 * list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS l2sq
           FROM embeddings e CROSS JOIN q)
         SELECT vec_id, l2sq, true AS self_found, true AS adc_nonneg,
                true AS adc_err_ok
         FROM d ORDER BY l2sq ASC, vec_id ASC LIMIT 10""",
    "t22_bloom_decontaminate" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_transform(range(1, len(words) - 2),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
                       words[i+3])) AS shingle
           FROM w WHERE len(words) >= 4),
         bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
         corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
         cont AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b USING (shingle))
         SELECT (SELECT count(DISTINCT doc_id) FROM corp) AS n_docs,
                (SELECT count(*) FROM cont) AS n_contaminated,
                true AS no_false_neg, true AS fp_rate_ok""",
    "g2_pagerank_iter" ->
      """WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                           CAST(l_partkey % 200 AS BIGINT) AS dst
           FROM lineitem),
         v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         n AS (SELECT count(*) AS n FROM v),
         deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
         r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n.n AS rank FROM v, n),
         m1 AS (SELECT e.dst AS node, sum(r0.rank / deg.out_deg) AS im
                FROM e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
                GROUP BY e.dst),
         r1 AS (SELECT v.node,
                       round(CAST(0.15 AS DOUBLE) / n.n + 0.85 * coalesce(m1.im, 0), 6) AS rank
                FROM v LEFT JOIN m1 ON m1.node = v.node, n),
         m2 AS (SELECT e.dst AS node, sum(r1.rank / deg.out_deg) AS im
                FROM e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
                GROUP BY e.dst),
         r2 AS (SELECT v.node,
                       round(CAST(0.15 AS DOUBLE) / n.n + 0.85 * coalesce(m2.im, 0), 6) AS rank
                FROM v LEFT JOIN m2 ON m2.node = v.node, n),
         m3 AS (SELECT e.dst AS node, sum(r2.rank / deg.out_deg) AS im
                FROM e JOIN r2 ON r2.node = e.src JOIN deg ON deg.src = e.src
                GROUP BY e.dst),
         r3 AS (SELECT v.node,
                       round(CAST(0.15 AS DOUBLE) / n.n + 0.85 * coalesce(m3.im, 0), 6) AS rank
                FROM v LEFT JOIN m3 ON m3.node = v.node, n)
         SELECT node, rank FROM r3""",
    "s12_kmeans_train" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
         c0 AS (SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS list_id,
                       list_transform(x, e -> round(e, 6)) AS c
                FROM (SELECT vec_id, x FROM v
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
         d1 AS (SELECT v.vec_id, c0.list_id,
                       list_reduce(list_transform(range(64),
                         j -> (x[CAST(j AS INT) + 1] - c[CAST(j AS INT) + 1])
                                * (x[CAST(j AS INT) + 1] - c[CAST(j AS INT) + 1])),
                         (a, b) -> a + b) AS dist
                FROM v CROSS JOIN c0),
         a1 AS (SELECT vec_id, list_id FROM (
                  SELECT vec_id, list_id,
                         row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
                  FROM d1) WHERE rn = 1),
         p1 AS (SELECT a1.list_id, CAST(j AS BIGINT) + 1 AS pos,
                       round(avg(x[CAST(j AS INT) + 1]), 6) AS mv
                FROM a1 JOIN v USING (vec_id), range(64) t(j)
                GROUP BY a1.list_id, j),
         c1 AS (SELECT list_id, list(mv ORDER BY pos) AS c FROM p1 GROUP BY list_id),
         c1f AS (SELECT c0.list_id, coalesce(c1.c, c0.c) AS c
                 FROM c0 LEFT JOIN c1 USING (list_id)),
         d2 AS (SELECT v.vec_id, c1f.list_id,
                       list_reduce(list_transform(range(64),
                         j -> (x[CAST(j AS INT) + 1] - c[CAST(j AS INT) + 1])
                                * (x[CAST(j AS INT) + 1] - c[CAST(j AS INT) + 1])),
                         (a, b) -> a + b) AS dist
                FROM v CROSS JOIN c1f),
         a2 AS (SELECT vec_id, list_id FROM (
                  SELECT vec_id, list_id,
                         row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
                  FROM d2) WHERE rn = 1),
         p2 AS (SELECT a2.list_id, CAST(j AS BIGINT) + 1 AS pos,
                       round(avg(x[CAST(j AS INT) + 1]), 6) AS mv
                FROM a2 JOIN v USING (vec_id), range(64) t(j)
                GROUP BY a2.list_id, j),
         c2 AS (SELECT list_id, list(mv ORDER BY pos) AS c FROM p2 GROUP BY list_id),
         c2f AS (SELECT c1f.list_id, coalesce(c2.c, c1f.c) AS c
                 FROM c1f LEFT JOIN c2 USING (list_id))
         SELECT list_id, CAST(j AS BIGINT) + 1 AS pos, c[CAST(j AS INT) + 1] AS c
         FROM c2f, range(64) t(j)""",
    "s13_logreg_train" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
                           CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
                    FROM embeddings),
         xl AS (SELECT vec_id, y, CAST(j AS BIGINT) + 1 AS dim,
                        x[CAST(j AS INT) + 1] AS xj
                FROM e, range(64) t(j)),
         w0 AS (SELECT CAST(j AS BIGINT) + 1 AS dim,
                       CAST((CAST(j AS INT) % 7) - 3 AS DOUBLE) / 10.0 AS w
                FROM range(64) t(j)),
         m1 AS (SELECT xl.vec_id, any_value(xl.y) AS y, sum(w0.w * xl.xj) AS mg
                FROM xl JOIN w0 USING (dim) GROUP BY xl.vec_id),
         r1 AS (SELECT vec_id, 1.0 / (1.0 + exp(-mg)) - y AS r FROM m1),
         g1 AS (SELECT xl.dim, avg(r1.r * xl.xj) AS g
                FROM xl JOIN r1 USING (vec_id) GROUP BY xl.dim),
         w1 AS (SELECT w0.dim, round(w0.w - 0.1 * g1.g, 6) AS w
                FROM w0 JOIN g1 USING (dim)),
         m2 AS (SELECT xl.vec_id, any_value(xl.y) AS y, sum(w1.w * xl.xj) AS mg
                FROM xl JOIN w1 USING (dim) GROUP BY xl.vec_id),
         r2 AS (SELECT vec_id, 1.0 / (1.0 + exp(-mg)) - y AS r FROM m2),
         g2 AS (SELECT xl.dim, avg(r2.r * xl.xj) AS g
                FROM xl JOIN r2 USING (vec_id) GROUP BY xl.dim),
         w2 AS (SELECT w1.dim, round(w1.w - 0.1 * g2.g, 6) AS w
                FROM w1 JOIN g2 USING (dim)),
         m3 AS (SELECT xl.vec_id, any_value(xl.y) AS y, sum(w2.w * xl.xj) AS mg
                FROM xl JOIN w2 USING (dim) GROUP BY xl.vec_id),
         r3 AS (SELECT vec_id, 1.0 / (1.0 + exp(-mg)) - y AS r FROM m3),
         g3 AS (SELECT xl.dim, avg(r3.r * xl.xj) AS g
                FROM xl JOIN r3 USING (vec_id) GROUP BY xl.dim),
         w3 AS (SELECT w2.dim, round(w2.w - 0.1 * g3.g, 6) AS w
                FROM w2 JOIN g3 USING (dim))
         SELECT dim, w FROM w3""",
    "g1_pagerank_step" ->
      """WITH e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                           CAST(l_partkey % 200 AS BIGINT) AS dst
           FROM lineitem),
         v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         n AS (SELECT count(*) AS n FROM v),
         deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
         r0 AS (SELECT node, 1.0 / n.n AS rank FROM v, n),
         m AS (SELECT e.dst AS node, sum(r0.rank / deg.out_deg) AS in_mass
               FROM e JOIN r0 ON r0.node = e.src
                      JOIN deg ON deg.src = e.src
               GROUP BY e.dst)
         SELECT v.node AS node,
                round(0.15 / n.n + 0.85 * coalesce(m.in_mass, 0), 6) AS rank
         FROM v LEFT JOIN m ON m.node = v.node, n""",
    "s11_logreg_step" ->
      """WITH e AS (
           SELECT CAST(embedding AS DOUBLE[]) AS x,
                  CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
           FROM embeddings),
         s AS (
           SELECT x, y,
                  1.0 / (1.0 + exp(-(list_reduce(
                    list_transform(range(64), j ->
                      ((CAST(j AS INTEGER) % 7) - 3) / 10.0 * x[CAST(j AS INTEGER) + 1]),
                    (a, b) -> a + b)))) AS p
           FROM e),
         g AS (
           SELECT CAST(j + 1 AS BIGINT) AS dim,
                  ((CAST(j AS INTEGER) % 7) - 3) / 10.0 AS w0,
                  round(avg((p - y) * x[CAST(j AS INTEGER) + 1]), 6) AS grad
           FROM s, range(64) t(j)
           GROUP BY j)
         SELECT dim, grad, round(w0 - 0.1 * grad, 6) AS w_new FROM g""",
    "t17_pii_redact" ->
      """WITH raw AS (
           SELECT doc_id,
                  text ||
                  (CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END) ||
                  (CASE WHEN doc_id % 5 = 0 THEN ' call +1-415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END) ||
                  (CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.25' ELSE '' END) AS raw
           FROM documents),
         c AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
                  CAST(len(regexp_extract_all(raw, '\+\d{1,2}-\d{3}-\d{3}-\d{4}')) AS INTEGER) AS n_phones,
                  CAST(len(regexp_extract_all(raw, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
                  regexp_replace(regexp_replace(regexp_replace(raw,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                      '\+\d{1,2}-\d{3}-\d{3}-\d{4}', '[PHONE]', 'g'),
                      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
           FROM raw)
         SELECT doc_id, n_emails, n_phones, n_ips, redacted,
                (n_emails + n_phones + n_ips = 0) AS pii_free
         FROM c""",
    "t18_domain_cap" ->
      """WITH u AS (
           SELECT doc_id, n_chars,
                  (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END) ||
                  (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
                  source || '.site' || CAST(doc_id % 7 AS VARCHAR) ||
                  '.org/articles/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed#top' AS url
           FROM documents),
         n AS (
           SELECT doc_id, n_chars,
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url),
                      '^[a-z][a-z0-9+.-]*://', ''), '^www\.', ''), '[?#].*$', ''), '/$', '') AS url_norm
           FROM u),
         d AS (
           SELECT doc_id, n_chars, url_norm,
                  regexp_extract(regexp_extract(url_norm, '^([^/]+)', 1), '([^.]+\.[^.]+)$', 1) AS domain
           FROM n),
         r AS (
           SELECT doc_id, url_norm, domain,
                  CAST(row_number() OVER (PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank
           FROM d)
         SELECT doc_id, url_norm, domain, rank FROM r WHERE rank <= 3""",
    "t19_mixture_weights" ->
      """WITH a AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         t AS (SELECT * FROM (VALUES ('en', 0.3), ('de', 0.2), ('es', 0.2), ('fr', 0.2), ('zh', 0.1)) v(lang, target_share)),
         s AS (
           SELECT a.lang, a.n_docs,
                  CAST(a.n_docs AS DOUBLE) / (SELECT sum(n_docs) FROM a) AS actual_share,
                  CAST(t.target_share AS DOUBLE) AS target_share
           FROM a JOIN t USING (lang))
         SELECT lang, n_docs, round(actual_share, 6) AS actual_share, target_share,
                round(target_share / actual_share, 6) AS weight,
                CAST(round(target_share * 10000) AS BIGINT) AS expected_docs
         FROM s""",
    "d12_incremental_dedup" ->
      """WITH fp AS (
           SELECT doc_id,
                  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))) AS fingerprint
           FROM documents),
         batch AS (SELECT * FROM fp WHERE doc_id % 10 = 0),
         corpus AS (SELECT DISTINCT fingerprint FROM fp WHERE doc_id % 10 <> 0)
         SELECT min(doc_id) AS doc_id, fingerprint
         FROM batch
         WHERE fingerprint NOT IN (SELECT fingerprint FROM corpus)
         GROUP BY fingerprint""",
    "t20_chunk_windows" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         n AS (SELECT doc_id, words, len(words) AS n FROM w),
         c AS (SELECT doc_id, words, n,
                      CAST(1 + ceil(greatest(n - 40, 0) / 30.0) AS INTEGER) AS nc
               FROM n)
         SELECT doc_id,
                CAST(i AS INTEGER) AS chunk_id,
                CAST(i * 30 + 1 AS INTEGER) AS start_word,
                CAST(least(40, n - i * 30) AS INTEGER) AS n_words,
                array_to_string(words[(i * 30 + 1):(i * 30 + least(40, n - i * 30))], ' ') AS chunk_text
         FROM c, range(8) t(i) WHERE i < nc""",
    "t21_pack_manifest" ->
      """WITH d AS (
           SELECT doc_id, lang, text,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents),
         p AS (
           SELECT *, CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                     / 2048) AS BIGINT) AS pack_id
           FROM d),
         q AS (
           SELECT *, CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang, pack_id ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           FROM p)
         SELECT lang, pack_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                array_to_string(list(doc_id ORDER BY doc_id), ',') AS doc_ids,
                array_to_string(list(off ORDER BY doc_id), ',') AS boundaries,
                string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS pack_text
         FROM q GROUP BY lang, pack_id""",
    "s10_random_projection" ->
      """WITH m AS (
           SELECT j, list(CASE WHEN strpos('02468ace', substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) > 0
                               THEN 1.0 ELSE -1.0 END ORDER BY i) AS signs
           FROM range(64) t(i) CROSS JOIN range(16) u(j)
           GROUP BY j),
         p AS (
           SELECT e.vec_id, m.j,
                  round(list_reduce(list_transform(range(64), k -> CAST(e.embedding[k+1] AS DOUBLE) * m.signs[k+1]),
                                    (acc, x) -> acc + x) / sqrt(16.0), 6) AS v
           FROM embeddings e CROSS JOIN m)
         SELECT vec_id, CAST(j AS INTEGER) AS pos, v AS value FROM p""",
    "d9_prefix_filter_pairs" ->
      s"""WITH w AS (
           SELECT doc_id,
                  list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")})
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
                      (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))), 6) AS jaccard
         FROM w a JOIN w b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
               (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8""",
    "d10_levenshtein_pairs" ->
      s"""WITH p AS (
           SELECT doc_id, lang, source,
                  substr(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), 1, 120) AS head
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")}),
         q AS (SELECT *, CAST(floor(length(head) / 40) AS BIGINT) AS len_band FROM p)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(levenshtein(a.head, b.head) AS INTEGER) AS distance
         FROM q a JOIN q b
           ON a.lang = b.lang AND a.source = b.source
          AND a.len_band = b.len_band AND a.doc_id < b.doc_id
         WHERE levenshtein(a.head, b.head) <= 20""",
    "t9_bigram_topn" ->
      """WITH w AS (
           SELECT lang,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         bg AS (
           SELECT lang, unnest(list_transform(range(1, len(words)),
                  i -> words[i] || ' ' || words[i+1])) AS bigram
           FROM w),
         c AS (SELECT lang, bigram, count(*) AS cnt FROM bg GROUP BY lang, bigram),
         r AS (SELECT lang, bigram, cnt,
                      CAST(row_number() OVER (PARTITION BY lang
                           ORDER BY cnt DESC, bigram ASC) AS INTEGER) AS rank
               FROM c)
         SELECT lang, bigram, cnt, rank FROM r WHERE rank <= 5""",
    "t10_repetition" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         c AS (SELECT doc_id, len(words) AS n_words, unnest(words) AS word FROM w),
         g AS (SELECT doc_id, n_words, word, count(*) AS cnt
               FROM c GROUP BY doc_id, n_words, word)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                count(*) AS n_unique,
                round(count(*) * 1.0 / n_words, 6) AS unique_ratio,
                round(max(cnt) * 1.0 / n_words, 6) AS top_word_share
         FROM g GROUP BY doc_id, n_words""",
    "t11_decontaminate" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_transform(range(1, len(words) - 2),
                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
                       words[i+3])) AS shingle
           FROM w WHERE len(words) >= 4),
         bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0)
         SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hits
         FROM sh s JOIN bench b USING (shingle)
         WHERE s.doc_id % 100 <> 0
         GROUP BY s.doc_id""",
    "t12_unigram_logprob" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         c AS (SELECT doc_id, unnest(words) AS word FROM w),
         lm AS (SELECT word, count(*) AS cnt FROM c GROUP BY word),
         tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM lm)
         SELECT doc_id, count(*) AS n_words,
                round(sum(ln(cnt / total)) / count(*), 4) AS avg_logprob
         FROM c JOIN lm USING (word) CROSS JOIN tot
         GROUP BY doc_id""",
    "t14_exact_sample" ->
      """SELECT doc_id, source, rn FROM (
           SELECT doc_id, source,
                  CAST(row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rn
           FROM documents)
         WHERE rn <= 15""",
    "t16_corpus_shuffle" ->
      """SELECT doc_id, lang,
                row_number() OVER (
                  ORDER BY md5(CAST(doc_id AS VARCHAR) || 'epoch1'), doc_id) AS shuffle_pos
         FROM documents""",
    "d11_paragraph_dedup" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS w
           FROM documents WHERE trim(text) <> ''),
         n AS (SELECT doc_id, w, CAST(ceil(len(w) / 10.0) AS INTEGER) AS nc FROM d),
         c AS (SELECT doc_id, CAST(i AS INTEGER) AS idx,
                      array_to_string(w[CAST(i * 10 + 1 AS INTEGER) : CAST(i * 10 + 10 AS INTEGER)], ' ') AS chunk
               FROM n, range(20) t(i) WHERE i < nc),
         k AS (SELECT doc_id, idx, chunk,
                      row_number() OVER (PARTITION BY chunk
                                         ORDER BY doc_id, idx) AS rn
               FROM c)
         SELECT doc_id,
                count(*) AS n_chunks,
                count(*) FILTER (WHERE rn = 1) AS n_kept,
                CASE WHEN count(*) FILTER (WHERE rn = 1) = 0 THEN NULL
                     ELSE string_agg(chunk, ' ' ORDER BY idx) FILTER (WHERE rn = 1)
                END AS kept_text
         FROM k GROUP BY doc_id""",
    "t15_winnowing" ->
      """WITH d AS (
           SELECT doc_id,
                  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS s
           FROM documents),
         n AS (SELECT doc_id, s, length(s) - 8 + 1 AS ng FROM d WHERE length(s) >= 8),
         g AS (SELECT doc_id, ng, CAST(j AS INTEGER) AS j, md5(substr(s, CAST(j AS INTEGER), 8)) AS fp
               FROM n, range(1, 601) t(j) WHERE j <= ng),
         m AS (SELECT doc_id, ng, j,
                      min(fp || lpad(CAST(600 - j AS VARCHAR), 3, '0'))
                        OVER (PARTITION BY doc_id ORDER BY j
                              ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS key
               FROM g)
         SELECT DISTINCT doc_id, CAST(600 - CAST(right(key, 3) AS INTEGER) AS INTEGER) AS pos,
                left(key, 32) AS fp
         FROM m WHERE j >= least(8, ng)""",
    "t13_filter_stats" ->
      """WITH d AS (
           SELECT doc_id, lang,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
                  CASE WHEN len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE)
                            / len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) END AS stop_ratio,
                  CASE WHEN len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) = 0 THEN 0.0
                       ELSE CAST(list_sum(list_transform(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> length(x))) AS DOUBLE)
                            / len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) END AS mean_wl
           FROM documents),
         f AS (SELECT lang,
                      n_words < 20 AS f_short,
                      mean_wl > 4.75 AS f_long_word,
                      stop_ratio < 0.05 AS f_stopword
               FROM d)
         SELECT lang, count(*) AS n_docs,
                CAST(sum(CASE WHEN f_short THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_short,
                CAST(sum(CASE WHEN f_long_word THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_long_word,
                CAST(sum(CASE WHEN f_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_stopword,
                CAST(sum(CASE WHEN NOT f_short AND NOT f_long_word AND NOT f_stopword THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         FROM f GROUP BY lang""",
    "m3_audio_chunks" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
                  CAST((doc_id % 45 + 5) * 731 AS BIGINT) AS duration_ms
           FROM documents)
         SELECT media_id, duration_ms,
                CAST(i AS BIGINT) AS chunk_idx,
                CAST(i * 3000 AS BIGINT) AS start_ms,
                CAST(least(i * 3000 + 4000, duration_ms) AS BIGINT) AS end_ms
         FROM m, range(64) t(i)
         WHERE i * 3000 < duration_ms""",
    "d1_exact_dedup" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents
         GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')))""",
    "d4_jaccard_blocked" ->
      s"""WITH w AS (
           SELECT doc_id, lang, source,
                  list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")})
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
                      (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))), 6) AS jaccard
         FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
               (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8""",
    "t4_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'""",
    "t23_leakage_safe_split" ->
      """WITH g AS (
           SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))) AS grp
           FROM documents),
         s AS (
           SELECT grp,
                  CASE WHEN substr(md5(grp), 1, 4) < 'cccd' THEN 'train'
                       WHEN substr(md5(grp), 1, 4) < 'e666' THEN 'val'
                       ELSE 'test' END AS split
           FROM g)
         SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(count(DISTINCT grp) AS BIGINT) AS n_groups
         FROM s GROUP BY split""",
    "t24_distribution_drift" ->
      """WITH r AS (SELECT lang, count(*) AS n_ref FROM documents
                    WHERE doc_id % 2 = 0 GROUP BY lang),
         c AS (SELECT lang, count(*) AS n_cand FROM documents
               WHERE doc_id % 2 <> 0 GROUP BY lang),
         j AS (SELECT coalesce(r.lang, c.lang) AS lang,
                      CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                      CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand
               FROM r FULL JOIN c ON r.lang IS NOT DISTINCT FROM c.lang),
         t AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
                      CAST(sum(n_cand) AS DOUBLE) AS tc,
                      CAST(count(*) AS DOUBLE) AS k
               FROM j)
         SELECT lang, n_ref, n_cand,
                round((n_ref + 0.5) / (tr + 0.5 * k), 6) AS share_ref,
                round((n_cand + 0.5) / (tc + 0.5 * k), 6) AS share_cand,
                round(((n_cand + 0.5) / (tc + 0.5 * k) - (n_ref + 0.5) / (tr + 0.5 * k))
                      * ln(((n_cand + 0.5) / (tc + 0.5 * k)) / ((n_ref + 0.5) / (tr + 0.5 * k))), 8) AS psi_contrib
         FROM j, t""",
    "t5_sequence_pack" ->
      """WITH d AS (
           SELECT doc_id, lang,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents)
         SELECT doc_id, lang, n_tokens,
                CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                     / 2048) AS BIGINT) AS pack_id
         FROM d""",
    "d6_dedup_clusters" ->
      s"""WITH RECURSIVE w AS (
           SELECT doc_id, lang, source,
                  list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")}),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
                 (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(node, label) AS (
           SELECT doc_id, doc_id FROM w
           UNION
           SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node)
         SELECT node AS doc_id, min(label) AS cluster_id
         FROM reach GROUP BY node""",
    "t1_text_metrics" ->
      """WITH n AS (
           SELECT doc_id, text,
                  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm
           FROM documents),
         w AS (SELECT *, string_split(norm, ' ') AS words FROM n)
         SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens_bpe,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio,
           round(CASE WHEN len(words) = 0 THEN 0.0
                 ELSE CAST(len(list_filter(words, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE) / len(words) END, 6) AS stopword_ratio,
           round(CASE WHEN len(words) = 0 THEN 0.0
                 ELSE CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE) / len(words) END, 6) AS mean_word_len,
           round(least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.4
               + least((CASE WHEN len(words) = 0 THEN 0.0
                        ELSE CAST(len(list_filter(words, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE) / len(words) END) / 0.4, 1.0) * 0.4
               + greatest(1.0 - (CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0, 0.0) * 0.2, 6) AS quality
         FROM w""",
    "t2_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))) AS fingerprint
         FROM documents""",
    "t3_langid" ->
      """WITH w AS (
           SELECT doc_id, lang AS true_lang,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         s AS (SELECT doc_id, true_lang,
           len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','for','with'], x))) AS s_en,
           len(list_filter(words, x -> list_contains(['le','la','les','des','est','une','dans','pour','que'], x))) AS s_fr,
           len(list_filter(words, x -> list_contains(['el','los','las','es','una','para','como','por','del'], x))) AS s_es,
           len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für'], x))) AS s_de,
           len(list_filter(words, x -> list_contains(['的','是','了','在','我','有','他','这'], x))) AS s_zh
           FROM w)
         SELECT doc_id, true_lang,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 AND s_zh = 0 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS pred_lang
         FROM s""",
    "s1_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_embedding
                    FROM embeddings WHERE vec_id < 3),
         scored AS (
           SELECT q.query_id, e.vec_id,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(q.q_embedding AS DOUBLE[])) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(CAST(q.q_embedding AS DOUBLE[]), CAST(q.q_embedding AS DOUBLE[])))), 6) AS cosine
           FROM embeddings e CROSS JOIN q)
         SELECT query_id, vec_id, cosine,
                CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
         FROM scored
         QUALIFY rank <= 10""",
    "s3_embedding_norms" ->
      """SELECT vec_id,
         round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
         round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim
         FROM embeddings""",
    "s4_label_centroids" ->
      """SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
                round(avg(v), 6) AS mean_v
         FROM (SELECT label, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS pos
               FROM embeddings)
         GROUP BY label, pos""",
    "d7_dedup_retain" ->
      s"""WITH RECURSIVE w AS (
           SELECT doc_id, lang, source,
                  list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")}),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
                 (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION ALL SELECT id_b, id_a FROM pairs),
         reach(node, label) AS (
           SELECT doc_id, doc_id FROM w
           UNION
           SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
         clusters AS (
           SELECT node AS doc_id, min(label) AS cluster_id FROM reach GROUP BY node),
         scored AS (
           SELECT doc_id,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
           FROM documents)
         SELECT c.cluster_id, s.doc_id, s.n_tokens
         FROM scored s JOIN clusters c USING (doc_id)
         QUALIFY row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY s.n_tokens DESC, s.doc_id ASC) = 1""",
    "m2_frame_sample" ->
      """SELECT doc_id AS media_id,
                CAST((doc_id % 30 + 1) * 1000 AS BIGINT) AS duration_ms,
                CAST(((doc_id % 30 + 1) * 1000 * i) // 4 AS BIGINT) AS frame_ms
         FROM documents, range(4) t(i)""",
    "m4_image_tiles" ->
      """WITH m AS (
           SELECT doc_id AS media_id,
                  CAST((doc_id % 7 + 1) * 150 + 37 AS INTEGER) AS width,
                  CAST((doc_id % 5 + 1) * 120 + 53 AS INTEGER) AS height
           FROM documents),
         g AS (SELECT CAST(i AS INTEGER) AS i FROM range(10) t(i))
         SELECT media_id, width, height,
                gx.i AS tile_x, gy.i AS tile_y,
                gx.i * 224 AS x0, gy.i * 224 AS y0,
                least(224, width - gx.i * 224) AS tile_w,
                least(224, height - gy.i * 224) AS tile_h
         FROM m, g gx, g gy
         WHERE gx.i <= (width - 1) // 224 AND gy.i <= (height - 1) // 224""",
    "d8_triangle_count" ->
      s"""WITH w AS (
           SELECT doc_id, lang, source,
                  list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS words
           FROM documents
           WHERE ${twinSampleSql("documents", "doc_id")}),
         e AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM w a JOIN w b ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.words, b.words)) AS DOUBLE) /
                 (len(a.words) + len(b.words) - len(list_intersect(a.words, b.words))) >= 0.8)
         SELECT e1.id_a, e1.id_b, e2.id_b AS id_c
         FROM e e1
         JOIN e e2 ON e1.id_b = e2.id_a
         JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b""",
    "t8_weighted_sample" ->
      """WITH d AS (
           SELECT doc_id, lang,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents),
         k AS (
           SELECT doc_id, lang, n_tokens,
                  round(pow(CAST((doc_id * 1103515245 + 12345) % 2147483648 AS DOUBLE)
                            / 2147483648.0, 1.0 / n_tokens), 6) AS sample_key
           FROM d WHERE n_tokens > 0)
         SELECT doc_id, lang, n_tokens, sample_key,
                CAST(row_number() OVER (PARTITION BY lang
                       ORDER BY sample_key DESC, doc_id ASC) AS INT) AS rank
         FROM k
         QUALIFY rank <= 20""",
    "s6_kmeans_step" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         seeds AS (
           SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS list_id, v AS c
           FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
         scored AS (
           SELECT e.vec_id, e.v, s.list_id,
                  row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY (1.0 - list_cosine_similarity(e.v, s.c)) ASC,
                             s.list_id ASC) AS rn
           FROM e CROSS JOIN seeds s),
         assigned AS (SELECT list_id, v FROM scored WHERE rn = 1)
         SELECT CAST(list_id AS BIGINT) AS list_id, CAST(pos AS BIGINT) AS pos,
                round(avg(x), 6) AS mean_v
         FROM (SELECT list_id, unnest(v) AS x, generate_subscripts(v, 1) AS pos
               FROM assigned)
         GROUP BY list_id, pos""",
    "t6_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
               CASE WHEN lang = 'en' THEN '8000'
                    WHEN lang = 'fr' THEN '4000'
                    ELSE '2000' END""",
    "t7_tfidf_top_terms" ->
      """WITH words AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         tf AS (
           SELECT doc_id, term, count(*) AS tf
           FROM (SELECT doc_id, unnest(ws) AS term FROM words)
           WHERE term <> '' GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term,
                  round(tf.tf * ln(n.n_docs / dfreq.df), 6) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN n)
         SELECT doc_id, term, score,
                CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, term ASC) AS INT) AS rank
         FROM scored
         QUALIFY rank <= 3""",
    "t26_bm25_topk" ->
      """WITH norm AS (
           SELECT doc_id,
                  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
           FROM documents),
         q AS (SELECT list_distinct(ws) AS terms FROM norm WHERE doc_id = 0),
         base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM norm),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, dl, tm, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(ws) AS tm FROM base), q
           WHERE list_contains(q.terms, tm)
           GROUP BY doc_id, dl, tm),
         dft AS (SELECT tm, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM tf GROUP BY tm),
         sc AS (
           SELECT tf.doc_id,
                  round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6) AS score,
                  count(*) AS n_terms_hit
           FROM tf JOIN dft USING (tm) CROSS JOIN stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, score, n_terms_hit,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
         FROM sc
         QUALIFY rank <= 10""",
    "t27_bm25_index_probe" ->
      """WITH norm AS (
           SELECT doc_id,
                  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
           FROM documents),
         q AS (SELECT list_distinct(ws) AS terms FROM norm WHERE doc_id = 0),
         base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM norm),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, dl, tm, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(ws) AS tm FROM base), q
           WHERE list_contains(q.terms, tm)
           GROUP BY doc_id, dl, tm),
         dft AS (SELECT tm, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM tf GROUP BY tm),
         sc AS (
           SELECT tf.doc_id,
                  round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6) AS score,
                  count(*) AS n_terms_hit
           FROM tf JOIN dft USING (tm) CROSS JOIN stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, score, n_terms_hit,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
                TRUE AS roundtrip_ok
         FROM sc
         QUALIFY rank <= 10""",
    // t28: BM25 over the SURVIVING corpus (base ∪ appended batch minus
    // tombstones) recomputed from raw text — the maintained index path
    // must reproduce it bit-for-rounded-bit
    "t28_bm25_maintenance" ->
      """WITH norm AS (
           SELECT doc_id,
                  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
           FROM documents
           WHERE doc_id % 17 <> 3),
         q AS (SELECT list_distinct(ws) AS terms FROM norm WHERE doc_id = 0),
         base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM norm),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, dl, tm, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(ws) AS tm FROM base), q
           WHERE list_contains(q.terms, tm)
           GROUP BY doc_id, dl, tm),
         dft AS (SELECT tm, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM tf GROUP BY tm),
         sc AS (
           SELECT tf.doc_id,
                  round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6) AS score,
                  count(*) AS n_terms_hit
           FROM tf JOIN dft USING (tm) CROSS JOIN stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, score, n_terms_hit,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
                TRUE AS maintained_equals_rebuild,
                TRUE AS tombstones_absent
         FROM sc
         QUALIFY rank <= 10""",
    // s19: payload = the postings-probed lexical top-10 (same corpus math
    // as t26); the at-rest composition itself is pinned by the in-plan
    // roundtrip verdicts (TRUE here) + PersistSpec's partition-filter plan
    // capture
    "s19_atrest_retrieval" ->
      """WITH norm AS (
           SELECT doc_id,
                  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
           FROM documents),
         q AS (SELECT list_distinct(ws) AS terms FROM norm WHERE doc_id = 0),
         base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM norm),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, dl, tm, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(ws) AS tm FROM base), q
           WHERE list_contains(q.terms, tm)
           GROUP BY doc_id, dl, tm),
         dft AS (SELECT tm, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM tf GROUP BY tm),
         sc AS (
           SELECT tf.doc_id,
                  round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6) AS score,
                  count(*) AS n_terms_hit
           FROM tf JOIN dft USING (tm) CROSS JOIN stats s
           GROUP BY tf.doc_id)
         SELECT doc_id, score, n_terms_hit,
                CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
                TRUE AS fused_roundtrip_ok,
                TRUE AS member_probe_roundtrip_ok
         FROM sc
         QUALIFY rank <= 10""",
    "s18_hybrid_retrieval" ->
      """WITH norm AS (
           SELECT doc_id,
                  list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
           FROM documents),
         q AS (SELECT list_distinct(ws) AS terms FROM norm WHERE doc_id = 0),
         base AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl, ws FROM norm),
         stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM base),
         tf AS (
           SELECT doc_id, dl, tm, CAST(count(*) AS DOUBLE) AS tf
           FROM (SELECT doc_id, dl, unnest(ws) AS tm FROM base), q
           WHERE list_contains(q.terms, tm)
           GROUP BY doc_id, dl, tm),
         dft AS (SELECT tm, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
                 FROM tf GROUP BY tm),
         sc AS (
           SELECT tf.doc_id,
                  round(sum(ln(1 + (s.n - dft.df + 0.5) / (dft.df + 0.5))
                        * tf.tf * 2.2
                        / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 6) AS bm25
           FROM tf JOIN dft USING (tm) CROSS JOIN stats s
           GROUP BY tf.doc_id),
         cand AS (SELECT doc_id, bm25 FROM sc
                  ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
         mx AS (SELECT max(bm25) AS m FROM cand),
         qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id = 0),
         h AS (
           SELECT c.doc_id, c.bm25,
                  round(list_dot_product(CAST(e.embedding AS DOUBLE[]), v.qe) /
                        (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
                         sqrt(list_dot_product(v.qe, v.qe))), 6) AS cosine,
                  mx.m AS m
           FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id
           CROSS JOIN qv v CROSS JOIN mx)
         SELECT doc_id, bm25, cosine,
                round(0.5 * bm25 / m + 0.5 * cosine, 6) AS hybrid,
                CAST(row_number() OVER (
                  ORDER BY round(0.5 * bm25 / m + 0.5 * cosine, 6) DESC,
                           doc_id ASC) AS INT) AS rank
         FROM h
         QUALIFY rank <= 10""",
    "m1_binary_metadata" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         sha256(text) AS content_sha256,
         lower(to_hex(encode(substring(text, 1, 8)))) AS head_bytes_hex
         FROM documents""",
    "e13_sql_text_surface" ->
      """WITH w AS (
           SELECT doc_id, text,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         s AS (SELECT doc_id, text, words,
           len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','for','with'], x))) AS s_en,
           len(list_filter(words, x -> list_contains(['le','la','les','des','est','une','dans','pour','que'], x))) AS s_fr,
           len(list_filter(words, x -> list_contains(['el','los','las','es','una','para','como','por','del'], x))) AS s_es,
           len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für'], x))) AS s_de,
           len(list_filter(words, x -> list_contains(['的','是','了','在','我','有','他','这'], x))) AS s_zh
           FROM w)
         SELECT doc_id,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 AND s_zh = 0 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS pred_lang,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words,
           round(CASE WHEN len(words) = 0 THEN 0.0
                ELSE CAST(len(list_filter(words, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE)
                     / len(words) END, 6) AS stop_ratio,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
         FROM s""",
    "k8_sketch_partials" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
                true AS within_bound,
                true AS merge_close
         FROM orders""",
    // k11: the oracle recomputes the EXACT interpolated quantiles per
    // range (quantile_cont ≡ Spark percentile: rank p·(n−1), linear
    // interpolation); the verdict booleans assert the histogram-merge
    // estimates honored their deterministic error bounds
    "k11_quantile_partials" ->
      """WITH src AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS m, o_totalprice
           FROM orders),
         f AS (SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS q50,
                      round(quantile_cont(o_totalprice, 0.9), 4) AS q90,
                      round(quantile_cont(o_totalprice, 0.99), 4) AS q99
               FROM src),
         sub AS (SELECT round(quantile_cont(o_totalprice, 0.5), 4) AS q50,
                        round(quantile_cont(o_totalprice, 0.9), 4) AS q90,
                        round(quantile_cont(o_totalprice, 0.99), 4) AS q99
                 FROM src WHERE m BETWEEN '1995-01' AND '1995-12')
         SELECT 'full' AS range_label, CAST(0.5 AS DOUBLE) AS p,
                q50 AS exact_q, TRUE AS within_bound, TRUE AS merge_exact
         FROM f
         UNION ALL SELECT 'full', CAST(0.9 AS DOUBLE), q90, TRUE, TRUE FROM f
         UNION ALL SELECT 'full', CAST(0.99 AS DOUBLE), q99, TRUE, TRUE FROM f
         UNION ALL SELECT '1995', CAST(0.5 AS DOUBLE), q50, TRUE, TRUE FROM sub
         UNION ALL SELECT '1995', CAST(0.9 AS DOUBLE), q90, TRUE, TRUE FROM sub
         UNION ALL SELECT '1995', CAST(0.99 AS DOUBLE), q99, TRUE, TRUE FROM sub""",
    // k12: exact top-20 per range recomputed; the booleans assert the CMS
    // contracts and the exact merged==direct counter identity
    "k12_countmin_partials" ->
      """WITH src AS (
           SELECT strftime(o_orderdate, '%Y-%m') AS m, o_custkey FROM orders),
         tf AS (SELECT o_custkey, count(*) AS exact FROM src
                GROUP BY o_custkey ORDER BY exact DESC, o_custkey LIMIT 20),
         ts AS (SELECT o_custkey, count(*) AS exact FROM src
                WHERE m BETWEEN '1995-01' AND '1995-12'
                GROUP BY o_custkey ORDER BY exact DESC, o_custkey LIMIT 20)
         SELECT 'full' AS range_label, o_custkey, exact,
                true AS never_undercount, true AS within_eps,
                true AS merged_eq_direct
         FROM tf
         UNION ALL
         SELECT '1995', o_custkey, exact, true, true, true FROM ts""",
    "k13_jsonl_ingest" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(3 AS BIGINT) AS n_corrupt, true AS roundtrip_ok
         FROM documents GROUP BY lang""",
    "k14_heavyhitter_partials" ->
      """WITH w AS (
           SELECT coalesce(lang, '__null__') AS lang,
                  unnest(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS word
           FROM documents),
         wf AS (SELECT lang, word FROM w WHERE length(word) > 0),
         nl AS (SELECT lang, count(*) AS n FROM wf GROUP BY lang),
         per AS (SELECT lang, word, count(*) AS c FROM wf GROUP BY lang, word),
         kept AS (SELECT p.lang, p.word, p.c FROM per p JOIN nl USING (lang)
                  WHERE p.c * 60 > n),
         est AS (SELECT word, CAST(sum(c) AS BIGINT) AS est FROM kept GROUP BY word),
         b AS (SELECT CAST(sum(n // 60) AS BIGINT) AS err_bound FROM nl),
         r AS (SELECT word, est, (SELECT err_bound FROM b) AS err_bound,
                      CAST(row_number() OVER (ORDER BY est DESC, word ASC) AS INTEGER) AS rank
               FROM est)
         SELECT word, est, err_bound, rank, true AS bounds_hold,
                true AS complete_above_bound, true AS merged_eq_direct
         FROM r WHERE rank <= 20""",
    "k7_zorder_layout" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
                strftime(min(o_orderdate), '%Y-%m-%d') AS min_odate,
                strftime(max(o_orderdate), '%Y-%m-%d') AS max_odate,
                min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
                true AS date_extent_bounded_ok,
                true AS cust_extent_bounded_ok,
                true AS files_bounded_ok,
                true AS rows_preserved_ok
         FROM orders""",
    "d14_shared_spans" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words
           FROM documents),
         wf AS (SELECT doc_id, words FROM w WHERE len(words) >= 8),
         g AS (SELECT doc_id,
                      CAST(u['pos'] AS BIGINT) AS pos, u['h'] AS h
               FROM (SELECT doc_id,
                            unnest(list_transform(range(1, len(words) - 6),
                              i -> {'pos': i - 1,
                                    'h': md5(array_to_string(words[i:i+7], ' '))})) AS u
                     FROM wf)),
         hot AS (SELECT h FROM g GROUP BY h
                 HAVING count(DISTINCT doc_id) BETWEEN 2 AND 8
                    AND count(*) <= 32),
         gg AS (SELECT g.* FROM g JOIN hot USING (h)),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.pos AS pos_a, b.pos AS pos_b
               FROM gg a JOIN gg b ON a.h = b.h AND a.doc_id < b.doc_id),
         i AS (SELECT id_a, id_b, pos_a, pos_b, pos_a - pos_b AS diff,
                      pos_a - row_number() OVER (
                        PARTITION BY id_a, id_b, pos_a - pos_b
                        ORDER BY pos_a) AS isl
               FROM p)
         SELECT id_a, id_b,
                CAST(min(pos_a) AS BIGINT) AS start_a,
                CAST(min(pos_b) AS BIGINT) AS start_b,
                CAST(count(*) + 7 AS BIGINT) AS span_words
         FROM i GROUP BY id_a, id_b, diff, isl""",
    "k6_partial_agg_merge" ->
      """SELECT o_orderstatus,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                round(min(o_totalprice), 4) AS min_price,
                round(max(o_totalprice), 4) AS max_price,
                true AS merge_matches_direct,
                true AS idempotent_overwrite_ok
         FROM orders GROUP BY o_orderstatus""",
    "c1_corpus_pipeline" ->
      """WITH w AS (
           SELECT doc_id, text,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents),
         sc AS (SELECT doc_id, text, words, n_tokens,
           len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','for','with'], x))) AS s_en,
           len(list_filter(words, x -> list_contains(['le','la','les','des','est','une','dans','pour','que'], x))) AS s_fr,
           len(list_filter(words, x -> list_contains(['el','los','las','es','una','para','como','por','del'], x))) AS s_es,
           len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für'], x))) AS s_de,
           len(list_filter(words, x -> list_contains(['的','是','了','在','我','有','他','这'], x))) AS s_zh
           FROM w),
         l AS (SELECT doc_id, text, words, n_tokens,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 AND s_zh = 0 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS pred_lang
           FROM sc),
         q AS (SELECT doc_id, text, pred_lang, n_tokens,
           CASE WHEN len(words) = 0 THEN 0.0
                ELSE CAST(len(list_filter(words, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE)
                     / len(words) END AS stop_ratio,
           CASE WHEN len(words) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
                     / len(words) END AS mean_wl
           FROM l),
         kept AS (SELECT doc_id, text, pred_lang, n_tokens FROM q
                  WHERE pred_lang <> 'und' AND n_tokens >= 20
                    AND mean_wl <= 4.75 AND stop_ratio >= 0.05),
         dd AS (SELECT doc_id, pred_lang, n_tokens FROM kept
                QUALIFY row_number() OVER (
                  PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')))
                  ORDER BY doc_id) = 1),
         p AS (SELECT pred_lang, doc_id, n_tokens,
                 CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY pred_lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                      / 2048) AS BIGINT) AS pack_id
               FROM dd)
         SELECT pred_lang, pack_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM p GROUP BY pred_lang, pack_id"""
  )
}
