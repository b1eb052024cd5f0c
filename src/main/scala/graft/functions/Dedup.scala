package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB path:
  *
  *   - exact dedup = one hash-shuffle on the fingerprint;
  *   - MinHash+LSH = per-row signature (map-side, codegen'd array exprs),
  *     explode to (band, bandHash) buckets, self-join *within buckets only*
  *     (never all-pairs), then exact-Jaccard verify on the candidates;
  *   - SimHash = single 64-bit signature per doc, bucketed by pigeonhole
  *     signature chunks for Hamming-radius candidate generation (split the
  *     signature into radius+1 disjoint chunks: two signatures within the
  *     radius must agree EXACTLY on at least one chunk, so joining on
  *     (chunk_idx, chunk_value) is a lossless candidate filter).
  *
  * All signature math is Catalyst expressions (`transform`/`aggregate`/
  * `hash`/`xxhash64`) — no UDFs, fully whole-stage-codegen'd.
  */
object Dedup {

  /** Rebind `df` onto a fresh ISOLATED child session (`spark.newSession()`:
    * shared SparkContext + shared cache manager, private SQLConf) with AQE
    * disabled — so the eager materializations inside the dedup drivers run
    * AQE-free WITHOUT mutating the caller's session conf. AQE turns every
    * shuffle/broadcast stage into its own materialization job, each with
    * fresh per-stage planning and codegen — across a pipeline of many
    * small stages that fixed per-job cost dominates (measured 22 s vs
    * 2.5 s for the LSH pipeline at sf0.1), while runtime re-planning buys
    * nothing here: these pipelines manage skew explicitly (hot-bucket
    * removal, pre-partitioned edge lists) and their intermediates are
    * narrow id tables. Lazy return paths are left untouched — a caller
    * embedding them in a larger scan-heavy plan keeps AQE's benefits.
    *
    * Concurrency: safe. Each call gets its own session, so concurrent
    * pipelines on one SparkSession (d2 + d6 on different threads, a
    * multi-tenant notebook) never see each other's conf and the caller's
    * AQE setting is never touched (DedupSpec pins this). Persisted child
    * plans are matched by canonical form in the SHARED cache manager, so
    * a cache filled through the isolated session serves the caller too.
    */
  private def noAqe(df: DataFrame): DataFrame = {
    val iso = df.sparkSession.newSession()
    iso.conf.set("spark.sql.adaptive.enabled", "false")
    // The materializations that run on this child session are narrow
    // id/pair tables by design (signature fills, verified-pair
    // checkpoints, CC label frontiers). With AQE off, every shuffle
    // stage schedules the FULL static partition count regardless of
    // size — at the caller's default that is mostly empty tasks whose
    // fixed cost (scheduling, codegen reuse checks) dominates these
    // many-small-job pipelines and amplifies machine jitter (round-8
    // verdict: 2–3× run-to-run variance on d2/d3/d4). Pin a smaller
    // count proportional to the cluster: parallelism/4 keeps every core
    // busy at test scale and still yields thousands of partitions on a
    // real cluster; the caller's own lazy plan keeps the caller's conf.
    val narrow = math.max(8, iso.sparkContext.defaultParallelism / 4)
    iso.conf.set("spark.sql.shuffle.partitions", narrow.toString)
    org.apache.spark.sql.GraftColumns.rebind(df, iso)
  }

  /** Eagerly localCheckpoint `df` with AQE scoped off on an isolated child
    * session (see [[noAqe]]), returning the materialized result REBOUND to
    * the caller's session — downstream composition stays single-session
    * and the checkpointed LogicalRDD carries no trace of the child. */
  private def checkpointNoAqe(df: DataFrame): DataFrame = {
    val caller = df.sparkSession
    org.apache.spark.sql.GraftColumns.rebind(
      noAqe(df).transform(Ckpt.materialize), caller)
  }

  /** Fan a narrow input out to the session's default parallelism before
    * CPU-heavy per-row work (signature hashing). A small parquet file scans
    * as ONE split, which would serialize the signature pass on one core; a
    * genuinely large input already has >= defaultParallelism splits and
    * passes through untouched — so this costs nothing at 100 TB (where the
    * scan is thousands of splits) and unlocks all cores at test scale.
    * getNumPartitions is a driver-side plan property, not a job. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Exact dedup: keep the smallest `idCol` row per canonical-text group.
    * One shuffle on the md5 fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // spread() matters here too: the fingerprint is md5 of the NORMALIZED
    // text, and the two normalization regex passes run in the projection
    // BEFORE the groupBy shuffle — on a single-split input that whole
    // pass would run on one core.
    val fp = Text.fingerprintMd5(col(textCol))
    spread(df).withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__fp")
  }

  /** INCREMENTAL exact dedup — the batch-ingest path: a new batch is
    * deduped (a) against the EXISTING corpus (drop any doc whose content
    * fingerprint is already indexed) and (b) within itself (first id per
    * fingerprint wins, deterministic). Production dedup is always
    * incremental — re-clustering 100 TB per daily batch is not a plan; at
    * scale the existing side is just the (fingerprint) index table,
    * re-read from its sink, and both steps are fingerprint-keyed shuffles
    * (the anti-join and the min-groupBy co-partition — one exchange each
    * side). Returns the surviving new docs as (idCol, fingerprint).
    */
  def incrementalExact(newDocs: DataFrame, existing: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    val fp = Text.fingerprintMd5(col(textCol))
    val existingFps = spread(existing).select(fp.as("fingerprint")).distinct()
    val batch = spread(newDocs).select(col(idCol), fp.as("fingerprint"))
    val unseen = batch.join(existingFps, Seq("fingerprint"), "left_anti")
    unseen
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("fingerprint"))
  }

  /** MinHash signature: array of `k` 32-bit min-hashes over word n-gram
    * shingles (murmur3 with seed = permutation index).
    *
    * Implemented as a one-pass UDF over the materialized shingle array:
    * the pure-expression form (`k × array_min(transform(shingles, hash))`)
    * inlines the shingle derivation k times — k redundant normalize/split/
    * ngram passes per row, which dominates at corpus scale. The UDF sees
    * the shingles once and hashes each exactly twice (double hashing
    * derives all k permutations), the optimal work for this signature.
    */
  def minHashSignature(text: Column, n: Int = 2, k: Int = 64): Column =
    minhashUdf(n, k)(split(Text.normalize(text), " "))

  /** The n-gram shingle set of a document as Catalyst columns — the EXACT
    * token universe [[minhashUdf]] signs (same truncation rule: a doc
    * shorter than `n` words contributes its whole word sequence as one
    * shingle), for verification / exact-twin paths that must measure
    * Jaccard in the signature's own space. */
  def shingleTokens(text: Column, n: Int): Column = {
    val w = split(Text.normalize(text), " ")
    if (n == 1) w
    else transform(sequence(lit(0), greatest(size(w) - lit(n), lit(0))),
      i => concat_ws(" ", slice(w, i + 1, lit(n))))
  }

  /** Builds shingles AND the signature in one row pass: the Catalyst
    * ngram form (sequence+transform+slice+concat_ws) costs more than the
    * whole rest of the near-dup pipeline at corpus scale. Single source
    * of truth for the shingle/signature math — [[minhashUdf]] and
    * [[sigWithShinglesUdf]] both delegate here, so the truncation rule
    * and hash seeds can never drift between the public signature API and
    * the fused LSH pipeline.
    *
    * Double hashing (Kirsch–Mitzenmacher): two murmur passes over each
    * shingle string, k permutations derived as h1 + i·h2 (mod 2³², h2
    * forced odd so the increment cycles the full ring) — 2 string hashes
    * per shingle instead of k; the same two passes pack into the 64-bit
    * shingle-identity hash, so the exact Jaccard set is nearly free. */
  private def sigAndShingles(words: Seq[String], n: Int, k: Int): (Array[Long], Array[Int]) = {
    val sig = Array.fill(k)(Int.MaxValue)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val w = words.toArray
    val m = math.max(w.length - (n - 1), 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var t = 0
      while (t < n && j + t < w.length) {
        if (t > 0) sb.append(' ')
        sb.append(w(j + t)); t += 1
      }
      val s = sb.toString
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x5bd1e995) | 1
      seen += (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var i = 0
      var h = h1
      while (i < k) {
        if (h < sig(i)) sig(i) = h
        h += h2
        i += 1
      }
      j += 1
    }
    val hs = seen.toArray
    java.util.Arrays.sort(hs)
    (hs, sig)
  }

  private def minhashUdf(n: Int, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((words: Seq[String]) => sigAndShingles(words, n, k)._2.toSeq)

  /** Single-pass shingle-hash set + minhash signature: tokenize ONCE,
    * and per shingle derive (a) a 64-bit identity hash for the exact
    * Jaccard set (two murmur passes packed — the same two passes the
    * minhash already needs, so the exact set is nearly free) and (b) the
    * k permutation updates. Replaces a Catalyst
    * sequence+transform+concat_ws+xxhash64 chain that re-built and
    * re-hashed every shingle string a second time — the dominant
    * map-side cost of the signature table at corpus scale (the same
    * reason [[minhashUdf]] exists). The 64-bit space makes collisions
    * ~2⁻⁶⁴ per shingle pair — immaterial next to the threshold; both the
    * LSH verify side and [[jaccardAllPairsAbove]] use THIS hash, so the
    * two sides measure Jaccard in an identical space. */
  private def sigWithShinglesUdf(n: Int, k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((words: Seq[String]) => {
      val (hs, sig) = sigAndShingles(words, n, k)
      (hs, sig.toSeq)
    })

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * `k/bands` consecutive signature slots. Explode the result and
    * group/join on (band_idx, band_hash) to get candidate buckets. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    // xxhash64 hashes the int-array slice NATIVELY (recursive hash over
    // elements) — the cast-to-array<string> + concat_ws form it replaces
    // built a string per band per row, 16× per doc, for no semantic gain.
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(slice(sig, b * rows + 1, rows)).as("band_hash"))
    }: _*)
  }

  /** The signed relation (id, words, sig) of a corpus — ONE tokenize +
    * minhash pass ([[sigWithShinglesUdf]]); the single implementation
    * every LSH path (batch [[nearDupMinhashLsh]], index build,
    * incremental probe) derives bands and verify arrays from, which is
    * what makes their results provably identical. */
  private def signedRelation(df: DataFrame, textCol: String, idCol: String,
                             n: Int, k: Int): DataFrame =
    spread(df)
      .select(col(idCol).as("id"),
        sigWithShinglesUdf(n, k)(split(Text.normalize(col(textCol)), " ")).as("__ws"))
      .select(col("id"), col("__ws._1").as("words"), col("__ws._2").as("sig"))

  /** Exploded (id, band, band_hash) rows of a signed relation. Fails FAST
    * (per-row size check inside codegen, no extra job) if the relation
    * was signed with a different k than the banding assumes: lshBands
    * would slice past (or short of) the signature, hashing empty/partial
    * slices to one shared value — half the bands collapse into a single
    * bucket the hot-bucket cap then silently discards. Guarded HERE so
    * every banding path (batch pairs, index build, incremental probe)
    * inherits the check. */
  private def bandRowsOf(signed: DataFrame, k: Int, bands: Int): DataFrame = {
    val checked = signed.withColumn("sig",
      when(size(col("sig")) === k, col("sig")).otherwise(raise_error(concat(
        lit("LSH banding: signature length "), size(col("sig")).cast("string"),
        lit(s" != k=$k — sign and band parameters must match")))))
    checked
      .select(col("id"), explode(lshBands(col("sig"), k, bands)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
  }

  /** Exact shingle-space Jaccard of two SORTED shingle-hash array columns
    * ([[signedCorpus]]'s `words` shape) — public so exact-twin harnesses
    * can score pairs with the same codegen'd primitive-long merge the
    * production verify uses, instead of boxed string-array set ops
    * (array_intersect on string shingles is ~20× slower per pair at
    * corpus document sizes — the d16 twin's original sin). */
  def jaccardSortedHashes(a: Column, b: Column): Column = jaccardOf(a, b)

  /** Exact shingle-space Jaccard of two sorted shingle-hash array columns
    * — the one formula every verify path shares (same-table pairs, the
    * two-table linkage join, the exact twins). */
  private def jaccardOf(a: Column, b: Column): Column = {
    val inter = sortedInter(a, b).cast("double")
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Shared LSH verification: exact shingle-space Jaccard over candidate
    * pairs, one shuffle per pair side to re-attach the sorted shingle-hash
    * arrays (ids travel through the candidate join, documents don't). The
    * SINGLE implementation both the batch and incremental paths call —
    * their equals-by-construction contract (d15) depends on it. */
  private def verifyPairs(cand: DataFrame, words: DataFrame,
                          threshold: Double): DataFrame =
    cand
      .join(words.withColumnRenamed("id", "id_a").withColumnRenamed("words", "words_a"), "id_a")
      .join(words.withColumnRenamed("id", "id_b").withColumnRenamed("words", "words_b"), "id_b")
      .withColumn("jaccard", jaccardOf(col("words_a"), col("words_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Candidate near-duplicate pairs via MinHash+LSH, verified with exact
    * word-set Jaccard ≥ `threshold`. Returns (id_a, id_b, jaccard) with
    * id_a < id_b. The self-join runs per bucket — shuffle is on band hash,
    * never a cross join.
    */
  def nearDupMinhashLsh(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5,
                        maxBucketSize: Int = 128,
                        reuseSignatures: Boolean = false): DataFrame = {
    // The plan references the signature relation four times (both join
    // sides + two word re-attaches); declaratively each reference re-scans
    // and re-hashes. `reuseSignatures` persists the signature table so the
    // corpus is tokenized/hashed ONCE — the right call on a cluster when
    // the token arrays fit the aggregate cache+disk; leave false to trade
    // recompute for zero storage (small corpora, memory-tight executors).
    // Verification happens in the SAME n-gram shingle space the minhash
    // signatures approximate (candidate recall is the LSH S-curve over
    // shingle Jaccard, so verifying in a different token space would make
    // the threshold semantics incoherent — rounds 1-8 verified on word
    // sets, which on dense shared-vocabulary corpora is nearly vacuous at
    // low thresholds). Shingle sets as sorted 64-bit hash arrays (the d4
    // trick): the verify join merge-counts primitive longs instead of
    // re-hashing boxed strings per candidate pair. One UDF pass builds
    // BOTH columns from one tokenization (see sigWithShinglesUdf).
    val withSig0 = signedRelation(df, textCol, idCol, n, k)
    val withSig =
      if (reuseSignatures) {
        val cached = withSig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Fill the cache EAGERLY: AQE materializes this plan's shuffle and
        // broadcast stages as concurrent jobs (bucket counts, both candidate
        // sides, both word re-attaches), and a lazily-persisted relation is
        // NOT deduplicated across jobs that start before the first fill
        // lands — every one of them would re-run the scan+tokenize+minhash
        // pass in parallel. One foreachPartition job pins the cache first.
        noAqe(cached).foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
        cached
      } else withSig0
    // Bucket join carries ONLY (id, band, band_hash): candidate pairs are
    // narrow ints during the widest part of the plan; the word arrays are
    // re-attached AFTER pair-dedup, so each doc's array is shuffled once per
    // surviving pair side, never once per bucket collision. At 100 TB this
    // is the difference between shuffling ids and shuffling documents.
    // Drop over-full buckets: a band hash shared by > maxBucketSize docs
    // carries no discriminative signal and would make the candidate join
    // quadratic in the bucket size (the classic LSH hot-bucket blowup —
    // on low-entropy corpora a single bucket can hold the whole corpus).
    // Hot buckets are found with a map-side-combinable groupBy count (the
    // hot list is tiny BY DEFINITION — it only holds keys with more than
    // maxBucketSize members) and removed with a broadcast anti-join; a
    // window count here would instead sort every bucket's rows inside the
    // shuffle just to read its size.
    val verified = lshPairsFrom(withSig, k, bands, threshold, maxBucketSize)
    if (!reuseSignatures) verified
    else {
      // Materialize the (small) verified pair set, then RELEASE the cached
      // signature table — otherwise it leaks into the session cache for
      // every call with reuseSignatures = true. AQE is scoped OFF for the
      // materialization (see noAqe).
      val out = checkpointNoAqe(verified)
      withSig.unpersist()
      out
    }
  }

  /** [[nearDupMinhashLsh]] from a PRE-SIGNED relation ((id, words, sig) —
    * [[signedCorpus]]'s shape): the band/hot-bucket/candidate/verify
    * pipeline without the tokenize+sign pass, for callers that already
    * hold signatures (an exact-twin harness sharing one sign pass across
    * the rebuild and the incremental probe — d15; a stored signature
    * table re-thresholded at a new jaccard cutoff without re-signing).
    * Identical algebra to the batch operator by construction — it IS the
    * batch operator's body. */
  def lshPairsFrom(signed: DataFrame, k: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5, maxBucketSize: Int = 128): DataFrame = {
    // k-mismatch fail-fast lives in bandRowsOf — every banding path shares it
    val bucketRows = bandRowsOf(signed, k, bands)
    val hot = bucketRows.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("band"), col("band_hash"))
    val buckets = bucketRows.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    val cand = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyPairs(cand, signed.select(col("id"), col("words")), threshold)
  }

  /** The materialized signed relation (id, words, sig) of a corpus — the
    * shareable artifact every LSH path derives from; sign ONCE, then feed
    * [[nearDupIndexTablesFrom]] and/or [[lshPairsFrom]]. */
  def signedCorpus(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 2, k: Int = 64): DataFrame =
    Ckpt.materialize(signedRelation(df, textCol, idCol, n, k))

  /** PARAGRAPH-level exact dedup (the Dolma/C4 sub-document pass): chunk
    * each doc into consecutive `chunkSize`-word "paragraphs", keep only
    * the FIRST corpus-wide occurrence of each chunk's content (ordered by
    * doc id, then chunk position), and reassemble what survives. Catches
    * the boilerplate exact-dedup misses — headers/footers shared across
    * otherwise-distinct documents — without near-dup machinery.
    *
    * Returns one row per non-empty doc: (doc_id, n_chunks, n_kept,
    * kept_text) with kept_text null when every chunk was seen earlier.
    *
    * Shape: two shuffles — a window rank partitioned BY CHUNK CONTENT
    * (first-occurrence flag; chunk groups are dup counts, so tiny), then
    * the per-doc reassembly groupBy. At corpus scale key the window on a
    * 128-bit chunk fingerprint instead of the string (same plan, ~5×
    * smaller shuffle rows) and drop reassembly if only the keep-list is
    * needed downstream.
    */
  def paragraphDedup(df: DataFrame, textCol: String, idCol: String,
                     chunkSize: Int = 10): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val chunks = spread(df)
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        split(Text.normalize(col(textCol)), " ").as("w"))
      .withColumn("nc", ceil(size(col("w")) / lit(chunkSize.toDouble)).cast("int"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => concat_ws(" ", slice(col("w"), i * chunkSize + 1, lit(chunkSize))))))
      .withColumnRenamed("pos", "idx")
      .withColumnRenamed("col", "chunk")
    val firstSeen = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("idx"))
    chunks.withColumn("__rn", row_number().over(firstSeen))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("__rn") === 1, 1)).as("n_kept"),
        sort_array(collect_list(when(col("__rn") === 1,
          struct(col("idx"), col("chunk"))))).as("__kept"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        when(col("n_kept") === 0, lit(null).cast("string"))
          .otherwise(concat_ws(" ",
            transform(col("__kept"), r => r.getField("chunk")))).as("kept_text"))
  }

  /** Drop rows belonging to over-full blocking groups — the hot-block
    * guard every quadratic-within-block pair generator needs at corpus
    * scale: one degenerate key (e.g. a dominant (lang, source) pair)
    * turns a "bounded" block join into O(N²). The hot list is found with
    * a map-side-combinable groupBy count and removed with a broadcast
    * anti-join (tiny BY DEFINITION — it only holds keys with more than
    * `maxBlockSize` members), the same shape as the LSH hot-bucket cap.
    *
    * RECALL CONTRACT: capping is not lossless — every pair inside a
    * dropped block is lost. Size the cap so only degenerate blocks
    * (boilerplate floods, empty-text classes) exceed it; pairs from such
    * blocks are near-worthless for dedup anyway (the block key itself
    * already marks them as one family).
    */
  def capBlocks(df: DataFrame, blockCols: Seq[String], maxBlockSize: Int): DataFrame = {
    require(maxBlockSize > 0, "maxBlockSize must be positive")
    val hot = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBlockSize)
      .select(blockCols.map(col): _*)
    df.join(broadcast(hot), blockCols, "left_anti")
  }

  /** Exact Jaccard over two pre-deduped word arrays. */
  def jaccardWords(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni   = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** SimHash: 64-bit signature — sign of the per-bit weighted sum of word
    * hashes. Expressed with aggregate over 64 bit positions.
    * Near-dup detection = hamming distance on signatures ≤ radius.
    */
  def simHash(text: Column): Column = simhashUdf(Text.wordSet(text))

  /** One 64-bit hash per word, 64 per-bit majority votes — single pass
    * (the expression form would rebuild the word array per bit). */
  private val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((words: Seq[String]) => {
      val votes = new Array[Int](64)
      words.foreach { w =>
        val h = scala.util.hashing.MurmurHash3.stringHash(w, 0x9747b28c).toLong << 32 |
          (scala.util.hashing.MurmurHash3.stringHash(w, 0x5bd1e995).toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      var sig = 0L
      var i = 0
      while (i < 64) { if (votes(i) > 0) sig |= 1L << i; i += 1 }
      sig
    })

  /** Hamming distance between two 64-bit signatures (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pigeonhole chunk keys over a 64-bit SimHash signature: split the
    * signature into `radius + 1` disjoint bit ranges and emit one
    * (chunk_idx, chunk_val) struct per range. Two signatures with Hamming
    * distance ≤ `radius` differ in at most `radius` bit positions, which
    * can dirty at most `radius` of the `radius + 1` chunks — so they agree
    * EXACTLY on at least one chunk (pigeonhole). Joining on (chunk_idx,
    * chunk_val) is therefore a LOSSLESS candidate filter for the
    * Hamming-radius near-dup join, with candidate volume proportional to
    * real collisions instead of the block's pair count.
    *
    * Pure bit arithmetic (shift + mask) — codegen'd, no UDF. Chunk widths
    * differ by at most one bit (64 = (radius+1)·base + rem; the first
    * `rem` chunks take the extra bit).
    */
  def simhashChunks(sig: Column, radius: Int): Column = {
    require(radius >= 0 && radius < 64, s"radius must be in [0, 64), got $radius")
    val nChunks = radius + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    array((0 until nChunks).map { i =>
      val width = base + (if (i < rem) 1 else 0)
      val start = i * base + math.min(i, rem)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(i).as("chunk_idx"),
        shiftrightunsigned(sig, start).bitwiseAND(lit(mask)).as("chunk_val"))
    }: _*)
  }

  /** SimHash near-duplicate pairs within Hamming `radius`, candidates
    * generated by pigeonhole chunk blocking ([[simhashChunks]]) instead of
    * an all-pairs self-join: each doc explodes to radius+1 narrow
    * (id, chunk_idx, chunk_val) rows, candidates join on the chunk key
    * (plus any `blockCols`, e.g. language), and survivors Hamming-verify.
    * The chunk filter is LOSSLESS (see [[simhashChunks]]) — output is
    * bit-identical to the naive quadratic join, but the widest stage
    * shuffles (radius+1)·N ids instead of materializing block² pairs: on a
    * monolingual 100 TB corpus that is the difference between a linear-ish
    * candidate join and a single O(N²) block.
    *
    * `maxBucketSize` (0 = unlimited) drops chunk buckets larger than the
    * cap via the same broadcast anti-join as [[nearDupMinhashLsh]]. A
    * bucket that hot means thousands of signatures share 7+ exact bits —
    * almost always a degenerate corpus artifact (empty/boilerplate docs
    * hashing to the same signature region). Capping is NOT lossless: a
    * pair is kept only if it still shares an under-cap chunk, so document
    * the recall contract when setting it.
    *
    * Returns (id_a, id_b, hamming) with id_a < id_b, one row per pair.
    */
  def simhashNearDup(df: DataFrame, textCol: String, idCol: String,
                     radius: Int = 8, blockCols: Seq[String] = Nil,
                     maxBucketSize: Int = 0): DataFrame = {
    val sigs = spread(df).select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ simHash(col(textCol)).as("sig"): _*)
    // Narrow bucket rows: the signature (one long) rides along so verify
    // needs no re-attach join — candidate rows stay (id, sig, chunk key).
    val buckets0 = sigs.select(
      (col("id") +: col("sig") +: blockCols.map(col)) :+
        explode(simhashChunks(col("sig"), radius)).as("ck"): _*)
      .select((col("id") +: col("sig") +: blockCols.map(col)) :+
        col("ck.chunk_idx").as("chunk_idx") :+ col("ck.chunk_val").as("chunk_val"): _*)
    val bucketKey = Seq("chunk_idx", "chunk_val") ++ blockCols
    val buckets =
      if (maxBucketSize <= 0) buckets0
      else {
        val hot = buckets0.groupBy(bucketKey.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucketSize)
          .select(bucketKey.map(col): _*)
        buckets0.join(broadcast(hot), bucketKey, "left_anti")
      }
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cond = (bucketKey.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a.id") < col("b.id"))).reduce(_ && _)
    // A near-dup pair agrees on SEVERAL chunks (hamming ≤ radius out of 64
    // dirties at most radius of radius+1 chunks — usually far fewer), so
    // the bucket join emits it once per shared chunk. Instead of a
    // dropDuplicates shuffle over the candidate set, keep a candidate only
    // when its bucket's chunk_idx is the FIRST chunk the two signatures
    // agree on — computable map-side from the two sigs riding the row, so
    // each pair survives exactly once and no dedup exchange exists in the
    // plan. (With maxBucketSize set, a pair whose first-matching chunk was
    // evicted is dropped even if a later matching chunk survived — part of
    // the cap's documented recall trade.)
    val nChunks = radius + 1
    val baseW = 64 / nChunks
    val remW = 64 % nChunks
    def chunkVal(sig: Column, i: Int): Column = {
      val width = baseW + (if (i < remW) 1 else 0)
      val start = i * baseW + math.min(i, remW)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      shiftrightunsigned(sig, start).bitwiseAND(lit(mask))
    }
    val firstMatch = (0 until nChunks).foldRight(lit(-1): Column) { (i, els) =>
      when(chunkVal(col("a.sig"), i) === chunkVal(col("b.sig"), i), lit(i)).otherwise(els)
    }
    a.join(b, cond)
      .filter(col("a.chunk_idx") === firstMatch)
      .withColumn("hamming", hamming64(col("a.sig"), col("b.sig")))
      .filter(col("hamming") <= radius)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-duplicate detection: the exact all-pairs
    * baseline — most-similar `k` pairs (or all pairs ≥ `threshold` when
    * set). One side broadcasts (ids + vectors), cosine is codegen'd
    * zip_with/aggregate. This exact form is the RECALL ORACLE for
    * `Similarity.embeddingNearDupBlocked` (the harness/scale path — IVF
    * multi-probe blocked, never collects the corpus); use it directly
    * only when one side fits the driver and exactness matters.
    */
  /** ALL pairs with round-6 cosine ≥ `threshold` — the exact EDGE oracle
    * for thresholded semantic-dedup graphs ([[graft.functions.Similarity.semanticDedup]]).
    * Same broadcast + mapPartitions shape as [[embeddingTopPairs]] but
    * with no top-k heap (edge sets are small by construction at any
    * sensible threshold: the bound is the true edge count, not N²), and
    * no `limit` — a huge-k TakeOrdered would preallocate its bounded
    * queue at k. Driver-bounded like every exact-oracle form here; the
    * scale path for the same edges is the IVF-blocked graph.
    */
  def embeddingEdgesAbove(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = spread(df).select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
    val all = vecs.collect().sortBy(_._1)
    def normOf(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val withNorms = all.map { case (id, v) => (id, v, normOf(v)) }
    val bc = spark.sparkContext.broadcast(withNorms)
    vecs.mapPartitions { rows =>
      val b = bc.value
      rows.flatMap { case (idA, vA) =>
        val nA = normOf(vA)
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = 0
        while (j < b.length) {
          val (idB, vB, nB) = b(j)
          if (idA < idB) {
            var s = 0.0; var i = 0; val n = math.min(vA.length, vB.length)
            while (i < n) { s += vA(i) * vB(i); i += 1 }
            val c = if (nA * nB == 0) 0.0 else s / (nA * nB)
            val cRounded = Math.round(c * 1e6) / 1e6
            if (cRounded >= threshold) out += ((idA, idB, cRounded))
          }
          j += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "cosine")
  }

  /** ALL pairs with n-gram-shingle Jaccard ≥ `threshold` — the exact PAIR
    * oracle for [[nearDupMinhashLsh]], measured in the signature's own
    * shingle space. Shingle sets are hashed once per doc to sorted 64-bit
    * arrays and broadcast; each of the N²/2 pairs costs one primitive
    * merge-count (no join, no shuffle, no pair-row materialization).
    * Driver-bounded (the hash-array table must fit the driver) — the
    * scale path is [[nearDupPrefixFilter]] with the same `ngram`, which
    * is provably lossless but pays its index shuffles; this form exists
    * so verdict queries can afford an exact twin in-plan.
    */
  /** EXACT shared-span detection — the cross-document exact-substring
    * dedup of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (arXiv:2107.06499), re-expressed relationally instead
    * of via their suffix array: any run of `n` consecutive shared words
    * is witnessed by a shared word-`n`-gram, so (1) build the gram
    * inverted index — one `posexplode` over [[Text.wordNgrams]], md5 per
    * gram, no UDF; (2) keep only PAIR-INFORMATIVE grams, present in 2 to
    * `maxDocsPerGram` distinct docs (a gram in every doc is boilerplate
    * carrying no pair signal — dropping it is the same hot-key cap as the
    * LSH hot buckets, and what bounds the self-join at corpus scale);
    * (3) self-join the surviving index on the hash (doc_a < doc_b); (4)
    * merge runs: within (pair, pos_a − pos_b) consecutive positions form
    * maximal islands via the pos − row_number() trick — one window, one
    * aggregate. A maximal island of R grams is a maximal shared span of
    * R + n − 1 words.
    *
    * Docs shorter than `n` normalized words are skipped (whole-doc
    * duplication is [[exact]]'s job). Everything is deterministic —
    * DuckDB recomputes the identical index, cap, and island merge, so
    * the d14 gate hash-checks the full output.
    *
    * Scale: shuffles are keyed on gram hash then (pair, diff) — both
    * fine-grained; the quadratic term is per-hash fan-out, bounded by
    * BOTH caps: `maxDocsPerGram` bounds distinct docs per gram and
    * `maxRowsPerGram` bounds TOTAL index rows per gram (a gram repeated
    * P times in each of two docs fans out P² join rows even at 2 docs —
    * repetitive/boilerplate text is exactly where that happens, and
    * such grams carry the least span signal), so a gram's join fan-out
    * is ≤ `maxRowsPerGram`² regardless of text shape. */
  def sharedSpans(df: DataFrame, textCol: String, idCol: String,
                  n: Int = 8, maxDocsPerGram: Int = 8,
                  maxRowsPerGram: Int = 32): DataFrame = {
    require(n >= 2, "n must be >= 2")
    require(maxDocsPerGram >= 2, "maxDocsPerGram must be >= 2")
    require(maxRowsPerGram >= maxDocsPerGram,
      "maxRowsPerGram must be >= maxDocsPerGram")
    val words = split(Text.normalize(col(textCol)), " ")
    // The gram index feeds THREE consumers (the informative-hash aggregate
    // and both sides of the pair self-join); without materialization the
    // scan + tokenize + md5 pass runs once per consumer (4 corpus passes
    // measured in the plan). Persist eagerly, d2's signature discipline.
    val grams = spread(df)
      .filter(size(words) >= n)
      .select(col(idCol).as("doc"),
        posexplode(Text.wordNgrams(col(textCol), n)).as(Seq("pos", "gram")))
      .select(col("doc"), col("pos"), md5(col("gram")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    noAqe(grams).foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    val informative = grams.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("__nd"), count(lit(1)).as("__nr"))
      .filter(col("__nd") >= 2 && col("__nd") <= maxDocsPerGram &&
        col("__nr") <= maxRowsPerGram)
      .select(col("h"))
    val idx = grams.join(informative, Seq("h"))
    val pairs = idx.as("a").join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    val diff = col("pos_a") - col("pos_b")
    val w = Window.partitionBy(col("id_a"), col("id_b"), col("__diff"))
      .orderBy(col("pos_a"))
    val spans = pairs.withColumn("__diff", diff)
      .withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"), col("__diff"), col("__isl"))
      .agg(min(col("pos_a")).cast("long").as("start_a"),
        min(col("pos_b")).cast("long").as("start_b"),
        (count(lit(1)) + (n - 1)).cast("long").as("span_words"))
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("span_words"))
    // materialize the (small) span table, release the gram cache
    val out = checkpointNoAqe(spans)
    grams.unpersist()
    out
  }

  def jaccardAllPairsAbove(df: DataFrame, textCol: String, idCol: String,
                           threshold: Double, ngram: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sets = spread(df)
      .select(col(idCol).cast("long").as("id"),
        sigWithShinglesUdf(ngram, 1)(split(Text.normalize(col(textCol)), " "))
          .getField("_1").as("hs"))
      .as[(Long, Array[Long])]
    val all = sets.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    sets.mapPartitions { rows =>
      val b = bc.value
      rows.flatMap { case (idA, hA) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var j = 0
        while (j < b.length) {
          val (idB, hB) = b(j)
          if (idA < idB) {
            val la = hA.length; val lb = hB.length
            // size filter: J ≤ min/max, so a length ratio below the
            // threshold can never qualify (exactness preserved)
            if (math.min(la, lb).toDouble >= threshold * math.max(la, lb)) {
              // merge-count with early exit: J ≥ t needs
              // inter ≥ t/(1+t)·(la+lb); once inter + the best-possible
              // remainder falls short, the pair is provably below
              // threshold and the rest of the merge is skipped — on the
              // far-below-threshold bulk (every pair but the true dups)
              // this halves the dominant inner-loop cost
              val required = math.ceil(threshold / (1 + threshold) * (la + lb) - 1e-9)
              var ia = 0; var ib = 0; var inter = 0
              var live = true
              while (live && ia < la && ib < lb) {
                val x = hA(ia); val y = hB(ib)
                if (x == y) { inter += 1; ia += 1; ib += 1 }
                else if (x < y) ia += 1
                else ib += 1
                if (inter + math.min(la - ia, lb - ib) < required) live = false
              }
              val union = la + lb - inter
              val jac = if (union == 0) 0.0 else inter.toDouble / union
              if (live && jac >= threshold)
                out += ((idA, idB, Math.round(jac * 1e6) / 1e6))
            }
          }
          j += 1
        }
        out
      }
    }.toDF("id_a", "id_b", "jaccard")
  }

  def embeddingTopPairs(df: DataFrame, idCol: String, vecCol: String,
                        k: Int = 50, threshold: Double = -1.0): DataFrame = {
    // A join would materialize N²/2 pair rows each carrying two vector
    // copies (~13 GB at 5k×64 dims). Instead: broadcast the (id, vec,
    // norm) table once per executor, stream the corpus through
    // mapPartitions, and keep a per-partition top-k — the global top-k is
    // the top-k of the per-partition winners, so only tasks×k candidate
    // rows ever shuffle. Same sequential dot/norm fold as DuckDB's
    // list_dot_product → numerically identical output. 137s → ~1s at
    // sf0.1. At corpus scale (broadcast side too big) block first with
    // Similarity.hyperplaneSignature / ivfIndex buckets.
    val spark = df.sparkSession
    import spark.implicits._
    // spread(): the all-pairs scoring below runs inside mapPartitions over
    // the corpus scan — a single-split input would serialize the whole
    // O(N²/2) dot-product pass on one core.
    val vecs = spread(df).select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
    val all = vecs.collect().sortBy(_._1)
    def normOf(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val withNorms = all.map { case (id, v) => (id, v, normOf(v)) }
    val bc = spark.sparkContext.broadcast(withNorms)
    // per-partition heap ranked by the FINAL output ordering (rounded
    // cosine desc, id_a asc, id_b asc) so the k-boundary is exact even
    // when raw cosines round to ties. PriorityQueue.max = worst element.
    val worstFirst: Ordering[(Double, Long, Long)] =
      Ordering.by { case (c, ia, ib) => (-c, ia, ib) }
    val candidates = vecs.mapPartitions { rows =>
      val b = bc.value
      val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Long)](worstFirst)
      rows.foreach { case (idA, vA) =>
        val nA = normOf(vA)
        var j = 0
        while (j < b.length) {
          val (idB, vB, nB) = b(j)
          if (idA < idB) {
            var s = 0.0; var i = 0; val n = math.min(vA.length, vB.length)
            while (i < n) { s += vA(i) * vB(i); i += 1 }
            val c = if (nA * nB == 0) 0.0 else s / (nA * nB)
            val cRounded = Math.round(c * 1e6) / 1e6
            if (cRounded >= threshold) {
              // Gate on the current worst BEFORE touching the heap: once the
              // heap is full, the overwhelming majority of pairs lose to the
              // kth-best and cost one primitive compare — an unconditional
              // enqueue+dequeue would box a tuple and churn the heap for
              // every one of the N²/2 pairs (the dominant cost of this pass).
              if (heap.size < k) heap.enqueue((cRounded, idA, idB))
              else {
                val w = heap.head
                val better = cRounded > w._1 ||
                  (cRounded == w._1 && (idA < w._2 || (idA == w._2 && idB < w._3)))
                if (better) { heap.dequeue(); heap.enqueue((cRounded, idA, idB)) }
              }
            }
          }
          j += 1
        }
      }
      heap.iterator.map { case (c, ia, ib) => (ia, ib, c) }
    }.toDF("id_a", "id_b", "cosine")
    candidates
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }

  /** Exhaustive n-gram Jaccard near-dup pairs within blocking groups —
    * the quadratic baseline, bounded by the blocking key so each group's
    * pair count stays small. Oracle-expressible in plain SQL.
    *
    * The word set is hashed ONCE per document to a sorted array of 64-bit
    * word hashes; each pair then costs a primitive merge-count instead of
    * `array_intersect`+`array_union` (which re-hash every boxed string on
    * every pair — the dominant cost, since pairs ≫ docs in any block).
    * 64-bit collisions are ~2⁻⁶⁴ per word pair — immaterial next to the
    * threshold.
    */
  def nearDupJaccardBlocked(df: DataFrame, textCol: String, idCol: String,
                            blockCols: Seq[String], threshold: Double): DataFrame = {
    val prepared = spread(df).select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        sort_array(array_distinct(
          transform(split(Text.normalize(col(textCol)), " "), w => xxhash64(w)))).as("wh"): _*)
    val a = prepared.as("a")
    val b = prepared.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockCond && col("a.id") < col("b.id"))
      .withColumn("__inter", sortedInter(col("a.wh"), col("b.wh")).cast("double"))
      .withColumn("__union", size(col("a.wh")) + size(col("b.wh")) - col("__inter"))
      .withColumn("jaccard",
        when(col("__union") === 0, lit(0.0)).otherwise(col("__inter") / col("__union")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact-Jaccard similarity join via PREFIX FILTERING (the AllPairs /
    * PPJoin family) — the scale path for EXACT near-dup pairs when no
    * blocking key exists. Every pair with word-set Jaccard ≥ `threshold`
    * is returned (no recall loss, unlike LSH), but the candidate join
    * touches only PREFIX tokens:
    *
    *   - order each doc's distinct tokens by ascending global document
    *     frequency (rarest first; ties by token) — one corpus-wide
    *     ordering, computed with a map-side-combinable groupBy;
    *   - a doc with n tokens exposes only its first n − ⌈t·n⌉ + 1 tokens:
    *     two sets with Jaccard ≥ t share ≥ ⌈t·max(|A|,|B|)⌉ tokens, so
    *     their rare-first prefixes must intersect (the smallest common
    *     token sits within both prefixes) — dropping the frequent-token
    *     tail is lossless;
    *   - candidates also pass the SIZE filter t·|A| ≤ |B| ≤ |A|/t before
    *     they materialize (join condition, not post-filter);
    *   - survivors verify with the same sorted-hash-array merge as the
    *     blocked variant.
    *
    * At corpus scale the explode carries ~(1−t)·corpus tokens (t = 0.8 →
    * 20%), shuffled once on token; frequent tokens land in the long tail
    * of every doc and never generate candidates — the classic hot-key
    * blowup of a naive token-inverted-index join is designed out.
    */
  def nearDupPrefixFilter(df: DataFrame, textCol: String, idCol: String,
                          threshold: Double,
                          reuseIndex: Boolean = false,
                          ngram: Int = 1): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    // `ngram` > 1 runs the whole AllPairs/PPJoin machinery over n-gram
    // shingle sets instead of word sets — the prefix/size/positional
    // theorems are set-generic, so exactness is preserved verbatim. This
    // is the exact-twin space for [[nearDupMinhashLsh]] (which signs and
    // verifies n-gram shingles).
    val docs = spread(df).select(col(idCol).as("id"),
      array_distinct(shingleTokens(col(textCol), ngram)).as("toks"))
    val tokens = docs.select(col("id"), explode(col("toks")).as("tok"))
    val tokenDf = tokens.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // Rare-first per-doc ordering: one shuffle on token to attach df, one
    // on id to rebuild the doc; sort_array on struct(df, tok) gives the
    // (df asc, tok asc) total order the prefix theorem needs.
    val ordered0 = tokens.join(tokenDf, "tok")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ranked"))
      .select(col("id"),
        transform(col("ranked"), r => r.getField("tok")).as("toks"),
        size(col("ranked")).as("n"))
    // The plan references the ranked index FOUR times (both candidate
    // sides + both verify re-attaches) — declaratively each reference
    // re-scans the corpus and re-runs the df-attach shuffle. `reuseIndex`
    // persists it so the corpus is scanned/tokenized once (same trade as
    // nearDupMinhashLsh's reuseSignatures).
    val ordered =
      if (reuseIndex) {
        val cached = ordered0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        noAqe(cached).foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
        cached
      } else ordered0
    // ceil/≤ with an epsilon guard: when t·n is mathematically integral the
    // nearest-double representation of t can land a hair ABOVE the exact
    // product, inflating ceil(n·t) by one — a one-token-short prefix (and an
    // over-tight size filter) that would drop exact-boundary pairs. The
    // 1e-9 nudge only ever LENGTHENS the prefix / LOOSENS the size filter
    // (recall-safe; the verify step keeps precision exact).
    val pref = ordered
      .withColumn("p",
        (col("n") - ceil(col("n") * lit(threshold) - lit(1e-9)) + 1).cast("int"))
      .select(col("id"), col("n"),
        posexplode(slice(col("toks"), lit(1), col("p"))).as(Seq("pos", "tok")))
    // POSITIONAL filter (the "pp" of PPJoin), applied in the join condition
    // so pruned candidates never reach the dedup/verify shuffles: common
    // elements appear in the SAME relative order in both ranked arrays, so
    // for the pair's FIRST common token (at 0-based prefix positions pa,
    // pb) the overlap is ≤ 1 + min(n_a − pa − 1, n_b − pb − 1), while
    // J ≥ t needs overlap ≥ t/(1+t)·(n_a+n_b). The bound only provably
    // holds for the first common token — which is exactly enough: a
    // qualifying pair always SURVIVES via that token's row (prefix theorem
    // puts it inside both prefixes), and any row the filter drops could
    // only re-emit a pair some other row already emits. Same epsilon
    // convention as the prefix/size bounds (loosen, never tighten).
    val minInter = ceil((col("a.n") + col("b.n")) * lit(threshold / (1 + threshold))
      - lit(1e-9))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("b.n") * lit(threshold) - lit(1e-9) <= col("a.n") &&
          col("a.n") * lit(threshold) - lit(1e-9) <= col("b.n") &&
          lit(1) + least(col("a.n") - col("a.pos") - 1,
            col("b.n") - col("b.pos") - 1) >= minInter)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // Verify arrays derive from the cached index, not the raw docs: the
    // ranked tokens are the same distinct set, so hash-then-sort gives the
    // identical sorted-hash array the raw-word path would.
    val words = ordered.select(col("id"),
      sort_array(transform(col("toks"), w => xxhash64(w))).as("wh"))
    val verified = cand
      .join(words.withColumnRenamed("id", "id_a").withColumnRenamed("wh", "wh_a"), "id_a")
      .join(words.withColumnRenamed("id", "id_b").withColumnRenamed("wh", "wh_b"), "id_b")
      .withColumn("__inter", sortedInter(col("wh_a"), col("wh_b")).cast("double"))
      .withColumn("__union", size(col("wh_a")) + size(col("wh_b")) - col("__inter"))
      .withColumn("jaccard",
        when(col("__union") === 0, lit(0.0)).otherwise(col("__inter") / col("__union")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    if (!reuseIndex) verified
    else {
      val out = checkpointNoAqe(verified)
      ordered.unpersist()
      out
    }
  }

  /** DRIVER-SIDE connected components — the exact-ORACLE twin of
    * [[connectedComponents]] for verdict harnesses whose edge list is
    * already driver-bounded (e.g. [[embeddingEdgesAbove]] output: true
    * near-dup edges, small by construction at any sensible threshold).
    * Union-find with path compression on the collected edges, min-member
    * labels broadcast back; vertices never leave the cluster — only the
    * edge list and the label map (≤ 2·|edges| entries) touch the driver.
    * Identical output contract to the distributed form: (idCol,
    * cluster_id = min id in component), isolated vertices label
    * themselves. Use the distributed pointer-jumping form for any
    * production-scale graph.
    */
  def connectedComponentsLocal(vertices: DataFrame, idCol: String,
                               edges: DataFrame, aCol: String,
                               bCol: String): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val es = edges.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .collect().map { r =>
        // Row.getLong on a NULL silently yields 0 — a null endpoint would
        // union into component 0 and corrupt every label downstream.
        require(!r.isNullAt(0) && !r.isNullAt(1),
          s"connectedComponentsLocal: NULL edge endpoint in ($aCol, $bCol)")
        (r.getLong(0), r.getLong(1))
      }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = parent.keys.toSeq.map(n => (n, find(n)))
    if (labels.isEmpty)
      vertices.select(col(idCol).cast("long").as(idCol),
        col(idCol).cast("long").as("cluster_id"))
    else {
      val lm = labels.toDF("__n", "cluster_id")
      vertices.select(col(idCol).cast("long").as(idCol))
        .join(broadcast(lm), col(idCol) === col("__n"), "left")
        .select(col(idCol),
          coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    }
  }

  /** Intersection size of two SORTED long arrays — the native codegen'd
    * [[graft.expressions.SortedIntersectCount]] merge pass (stays inside
    * whole-stage codegen; the Scala-UDF twin it replaced boxed both
    * Seq[Long] arguments per candidate pair). */
  private def sortedInter(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.GraftColumns.expression(a),
        org.apache.spark.sql.GraftColumns.expression(b)))

  /** Connected components over a near-dup pair graph — the clustering step
    * after any pair generator (keep one doc per component, or weight by
    * quality). Min-label propagation with POINTER JUMPING: each round every
    * connected vertex takes the smallest of (its label, its neighbours'
    * labels, its label's label). The shortcut term doubles the effective
    * propagation distance per round, so convergence is O(log diameter)
    * rounds instead of O(diameter) — the difference between 7 rounds and
    * 100+ on a pathological chain at corpus scale.
    *
    * Scale design:
    *   - only EDGE ENDPOINTS iterate. Isolated vertices (the overwhelming
    *     majority of a 100 TB corpus — most docs have no near-dup pair) are
    *     stitched back with one left join at the end, never shuffled
    *     through the loop;
    *   - one shuffle-aggregation per round: neighbour + self + shortcut
    *     messages are unioned and folded by a single groupBy-min. The
    *     convergence counter rides the same aggregate (max over the self
    *     message = previous label), so no extra compare-join or job;
    *   - the edge list is persisted pre-partitioned on `dst`, and each
    *     round's labels are eagerly localCheckpoint'ed: the checkpoint
    *     truncates the round's plan to a flat LogicalRDD leaf while
    *     preserving the aggregation's hash partitioning on vertex id for
    *     the next round's joins. (A persist here instead would keep the
    *     previous round inside its cachedPlan, and with 4 label references
    *     per round the plan TREE — analyzed plan, UI SparkPlanInfo walk —
    *     grows 4^rounds: the driver goes exponential long before the data
    *     does.)
    *
    * Returns (idCol, cluster_id) where cluster_id = min vertex id in the
    * component — deterministic, partition-order independent.
    */
  /** Retention — the final stage of the dedup pipeline (pairs → clusters →
    * KEEP ONE): one canonical row per cluster, chosen by descending
    * `scoreCol` with ascending id as the deterministic tie-break. One
    * shuffle on cluster_id (the same aggregate-free window-rank shape as
    * `Relational.topPerGroup`, so no row explosion at corpus scale).
    */
  def retain(docs: DataFrame, idCol: String,
             clusters: DataFrame, scoreCol: String): DataFrame = {
    val joined = docs.join(clusters, idCol)
    graft.operators.Relational.topPerGroup(joined, Seq("cluster_id"),
      Seq(col(scoreCol).desc, col(idCol).asc))
  }

  def connectedComponents(vertices: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Persist the (undirected) edge list: it is referenced EVERY round, and
    // without materialization each round would re-run the entire upstream
    // pair generator (e.g. the blocked-Jaccard self-join) through lineage.
    // Pre-partitioned on dst so the propagation join's edge side never
    // re-exchanges (InMemoryRelation preserves child outputPartitioning).
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .repartition(col("dst"))
      .persist(MEMORY_AND_DISK)
    // Fill the edge cache EAGERLY, with AQE still ON: this is the one job
    // that runs the caller's pair generator (e.g. a blocked-Jaccard
    // self-join — exactly where AQE's skew handling earns its keep at
    // corpus scale). Everything after iterates over tiny pre-partitioned
    // label tables, where AQE's per-stage materialization jobs only
    // multiply fixed per-job cost — so the loop runs with it scoped off.
    und.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    // The whole label loop runs on an ISOLATED AQE-off child session (see
    // noAqe): rebinding the persisted edge table moves only the plan
    // pointer — the shared cache manager serves the just-filled cache to
    // the child session by canonical-plan match.
    val undI = noAqe(und)
    // Labels for connected vertices only, SEEDED with min(v, min neighbour):
    // the same single shuffle a bare distinct() would cost, but it folds the
    // first propagation hop into initialization — one fewer loop round. The
    // eager localCheckpoint materializes the aggregation's hash partitioning
    // on __v as a flat LogicalRDD — the same shape every later round
    // produces. (Every endpoint appears as dst because `und` holds both
    // directions, so this covers all connected vertices.)
    var labels = undI.select(col("dst").as("__v"), col("src"))
      .groupBy(col("__v"))
      .agg(min(col("src")).as("__mn"))
      .select(col("__v"), least(col("__v"), col("__mn")).as("cluster_id"))
      .transform(Ckpt.materialize)
    // FRONTIER (delta) iteration: only vertices whose label changed last
    // round emit messages. Sound for min-label propagation because a
    // label is (re-)sent exactly the round after it changes, and round 1's
    // frontier is ALL connected vertices — so every vertex always folds in
    // every neighbour's latest label, just never redundantly. Late rounds
    // touch a collapsing frontier (at sf0.1: 4.1k → 1.1k → 65 → 2
    // vertices) instead of re-shuffling every edge message every round —
    // at corpus scale this is the difference between O(E) and O(frontier
    // edges) per round after the first.
    var frontier = labels
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // Messages (vertex, candidate label [, previous label]):
      //   self — every vertex keeps its label; carries `old` for the
      //          convergence counter (rides the same aggregate)
      //   nbr  — edges forward the label of a CHANGED dst to src
      //   shortcut (two-sided pointer jump, label[label[v]]):
      //     sc1 — v changed: resolve its NEW label's label
      //     sc2 — w changed: push w's new label to every v with label = w
      val self = labels.select(col("__v"), col("cluster_id").as("lbl"),
        col("cluster_id").as("old"))
      val oldType = self.schema("old").dataType
      val nbr = undI.join(frontier, col("dst") === col("__v"))
        .select(col("src").as("__v"), col("cluster_id").as("lbl"),
          lit(null).cast(oldType).as("old"))
      val sc1 = frontier.as("x")
        .join(labels.select(col("__v").as("j_v"), col("cluster_id").as("j_lbl")),
          col("x.cluster_id") === col("j_v"))
        .select(col("x.__v"), col("j_lbl").as("lbl"),
          lit(null).cast(oldType).as("old"))
      val sc2 = labels.as("x")
        .join(frontier.select(col("__v").as("j_v"), col("cluster_id").as("j_lbl")),
          col("x.cluster_id") === col("j_v"))
        .select(col("x.__v"), col("j_lbl").as("lbl"),
          lit(null).cast(oldType).as("old"))
      // Eager checkpoint = the round's single materializing job; the old
      // checkpointed RDD is dereferenced here and reclaimed by the
      // ContextCleaner once GC'd (bounded by maxIter tiny label tables).
      // The convergence counter rides the SAME job as an observed metric
      // (CollectMetrics evaluates during the checkpoint's materialization)
      // — no separate count job per round. coalesce: sum over an empty
      // step (no connected vertices) is null, which must read as 0.
      // no-arg Observation generates a unique name — CC may run several
      // times per session (d6 and d7 both call it), and observed-metric
      // names must not collide across live executions
      val obs = org.apache.spark.sql.Observation()
      val step = self.union(nbr).union(sc1).union(sc2)
        .groupBy(col("__v"))
        .agg(min(col("lbl")).as("cluster_id"), max(col("old")).as("__old"))
        .observe(obs,
          coalesce(sum(when(col("cluster_id") =!= col("__old"), 1L)
            .otherwise(0L)), lit(0L)).as("changed"))
        .transform(Ckpt.materialize)
      // The frontier is a narrow filter over the just-checkpointed step —
      // leave it LAZY: next round's three joins re-run a cheap in-memory
      // filter instead of paying a second materialization job per round.
      frontier = step.filter(col("cluster_id") =!= col("__old"))
        .select(col("__v"), col("cluster_id"))
      // metric delivery is listener-bus async — bounded wait on the
      // Observation's OWN future (no spawned thread: a Future wrapping the
      // blocking get would leak one permanently-parked global-EC thread
      // per timeout), with the old count() as the (never-expected)
      // fallback rather than a hang
      changed = {
        import scala.concurrent.Await
        import scala.concurrent.duration._
        try Await.result(obs.future, 30.seconds).getAs[Long]("changed")
        catch { case _: java.util.concurrent.TimeoutException => frontier.count() }
      }
      labels = step.select(col("__v"), col("cluster_id"))
      i += 1
      System.err.println(s"[connectedComponents] round $i: $changed labels changed")
    }
    if (changed > 0) {
      und.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds ($changed labels still " +
          "changing) — returning partially-propagated labels would silently split " +
          "components; raise maxIter (rounds needed ~ log2 of graph diameter)")
    }
    // Stitch isolated vertices back (their own id is their cluster), detach
    // from the iterative lineage (localCheckpoint materializes), then
    // release the edge cache so nothing leaks into the session cache for
    // long-lived sessions. Built on the CALLER's session — `labels` is a
    // checkpointed LogicalRDD by now, so no child-session state leaks into
    // the returned plan.
    val result = vertices.select(col(idCol))
      .join(labels.withColumnRenamed("__v", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .transform(Ckpt.materialize)
    und.unpersist()
    result
  }

  /** The persistable NEAR-DUP INDEX of a corpus — the at-rest form of
    * [[nearDupMinhashLsh]]'s in-flight state, for the daily-ingest shape
    * where the corpus is signed ONCE and every new batch probes it
    * (signing 100 TB per batch to dedup a 100 GB drop is the anti-pattern
    * this kills; same train-once/probe-many posture as the s14/s16 IVF
    * artifacts). Two tables: `bands` (id, band, band_hash) — write it
    * partitioned/bucketed by `band` so a probe joins band-aligned — and
    * `shingles` (id, words), the sorted shingle-hash arrays the verify
    * step merge-counts. Both derive from ONE tokenize+sign pass. */
  def nearDupIndexTables(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 2, k: Int = 64, bands: Int = 16
                        ): (DataFrame, DataFrame) =
    // materialized ([[signedCorpus]]): both returned tables derive from
    // one signed relation and are usually consumed by separate actions
    // (two table writes, or the probe's hot-count + candidate + verify
    // references) — without truncation each consumer re-signs the corpus
    nearDupIndexTablesFrom(signedCorpus(df, textCol, idCol, n, k), k, bands)

  /** [[nearDupIndexTables]] from a pre-signed relation ([[signedCorpus]]):
    * derive the two at-rest tables without re-signing. */
  def nearDupIndexTablesFrom(signed: DataFrame, k: Int = 64, bands: Int = 16
                            ): (DataFrame, DataFrame) =
    (bandRowsOf(signed, k, bands), signed.select(col("id"), col("words")))

  /** Incremental near-dup: sign ONLY the new batch, probe the persisted
    * index, and return every verified pair TOUCHING the batch — new-vs-
    * existing and new-vs-new — in [[nearDupMinhashLsh]]'s exact semantics
    * (pairs ordered id_a < id_b, same shingle-space verification, same
    * hot-bucket rule). Equivalence contract: the result equals the full
    * batch rebuild restricted to pairs with a new endpoint, BY
    * CONSTRUCTION — hot buckets are counted over index ∪ batch (i.e. the
    * same corpus the rebuild sees), not over the batch alone, which is
    * what makes the incremental path's candidate set identical rather
    * than approximately so (the d15 gate pins this in-plan). A
    * RE-DELIVERED id (already present in the index) is superseded by its
    * fresh batch signature — the retry-safe semantics a daily feed needs;
    * see the inline note.
    *
    * Scale shape: the batch is signed once (one UDF pass); the probe is
    * a band/band_hash equi-join against the band table (partition-
    * aligned when the index is stored partitioned by band); only the
    * surviving pairs' shingle arrays are re-attached (ids travel through
    * the wide part of the plan, documents don't — same discipline as the
    * batch operator). The occupancy count over index ∪ batch is one
    * map-side-combinable groupBy of the narrow band table.
    */
  def incrementalNearDup(newBatch: DataFrame, textCol: String, idCol: String,
                         indexBands: DataFrame, indexShingles: DataFrame,
                         n: Int = 2, k: Int = 64, bands: Int = 16,
                         threshold: Double = 0.5,
                         maxBucketSize: Int = 128): DataFrame = {
    val (newBands, newShingles) = nearDupIndexTables(newBatch, textCol, idCol, n, k, bands)
    // RE-DELIVERED ids (a retry lands a doc already in the index): the
    // fresh signature SUPERSEDES the indexed one — otherwise the union
    // below would carry the id twice and every candidate pair touching it
    // would multiply into duplicate (possibly contradictory, if the text
    // changed) output rows. The id set is batch-sized, ids only →
    // broadcast anti-join against both index tables.
    val newIds = broadcast(newShingles.select(col("id")).distinct())
    val idxBands = indexBands.select(col("id"), col("band"), col("band_hash"))
      .join(newIds, Seq("id"), "left_anti")
    val idxShingles = indexShingles.select(col("id"), col("words"))
      .join(newIds, Seq("id"), "left_anti")
    val allBands = idxBands.unionByName(newBands)
    val hot = allBands.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("band"), col("band_hash"))
    val probe = newBands.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    val target = allBands.join(broadcast(hot), Seq("band", "band_hash"), "left_anti")
    // orient every pair id_a < id_b; new-new collisions arrive in both
    // orientations and dedupe, new-existing in one
    val cand = probe.as("a").join(target.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyPairs(cand, idxShingles.unionByName(newShingles), threshold)
  }

  /** RECORD LINKAGE (fuzzy entity resolution) between TWO tables: for each
    * left row, the single best right match by exact shingle-space Jaccard
    * ≥ `threshold` — the reconcile-two-feeds primitive that self-dedup
    * ([[nearDupMinhashLsh]]) is not: ids need not be unique across tables,
    * every pair crosses the tables, and the result is a best-match
    * assignment (ties broken by right id for determinism), not a pair
    * graph. Returns (left_id, right_id, jaccard); left rows with no match
    * above threshold are absent (left-join the result to keep them).
    *
    * Shape: both sides sign once ([[signedCorpus]]); candidates come from
    * the LSH band join of left-bands × right-bands with the hot-bucket
    * cap counted over BOTH sides' rows (a band value flooded by either
    * side is non-discriminative); only surviving candidate ids re-attach
    * their shingle arrays; the best-match argmax is one window over the
    * candidate table (bounded by verified-pair count, not corpus size).
    */
  def linkBestMatch(left: DataFrame, right: DataFrame,
                    textCol: String, idCol: String,
                    n: Int = 2, k: Int = 64, bands: Int = 16,
                    threshold: Double = 0.5,
                    maxBucketSize: Int = 128): DataFrame =
    linkBestMatchFrom(signedCorpus(left, textCol, idCol, n, k),
      signedCorpus(right, textCol, idCol, n, k), k, bands, threshold, maxBucketSize)

  /** [[linkBestMatch]] from PRE-SIGNED relations ([[signedCorpus]]'s
    * shape) — the sign-once seam (mirrors lshPairsFrom /
    * nearDupIndexTablesFrom): callers that also need the signed sides
    * elsewhere (an exact-twin harness, a persisted index) sign each
    * corpus exactly once. */
  def linkBestMatchFrom(signedLeft: DataFrame, signedRight: DataFrame,
                        k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5,
                        maxBucketSize: Int = 128): DataFrame = {
    val (rb, rw) = nearDupIndexTablesFrom(signedRight, k, bands)
    linkBestMatchAgainstIndex(signedLeft, rb, rw, k, bands, threshold, maxBucketSize)
  }

  /** [[linkBestMatch]] against the right feed's AT-REST index — the daily
    * reconcile-two-feeds shape: the reference feed is signed ONCE into
    * [[nearDupIndexTables]] and persisted (bands partitioned BY BAND);
    * each day's batch signs only itself and probes the loaded tables, so
    * the reference corpus is never re-tokenized. Identical semantics to
    * the in-memory path BY CONSTRUCTION (same hot-bucket census over both
    * sides, same verify, same argmax — the d16 gate pins the equality):
    * this function IS [[linkBestMatchFrom]]'s body, the only difference
    * being where the right tables come from.
    *
    * Scale: the band probe is a partition-aligned equi-join when the
    * index is stored partitioned by `band`; only surviving candidate ids
    * re-attach shingle arrays (left's from the batch, right's from the
    * at-rest shingle table — an id-keyed join, never a corpus scan). */
  def linkBestMatchAgainstIndex(signedLeft: DataFrame,
                                rightBands: DataFrame, rightShingles: DataFrame,
                                k: Int = 64, bands: Int = 16,
                                threshold: Double = 0.5,
                                maxBucketSize: Int = 128): DataFrame = {
    val (lb, lw) = nearDupIndexTablesFrom(signedLeft, k, bands)
    val rb = rightBands.select(col("id"), col("band"), col("band_hash"))
    val rw = rightShingles.select(col("id"), col("words"))
    val hot = lb.unionByName(rb).groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("band"), col("band_hash"))
    val cand = lb.join(broadcast(hot), Seq("band", "band_hash"), "left_anti").as("a")
      .join(rb.join(broadcast(hot), Seq("band", "band_hash"), "left_anti").as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash"))
      .select(col("a.id").as("left_id"), col("b.id").as("right_id"))
      .dropDuplicates("left_id", "right_id")
    val verified = cand
      .join(lw.toDF("left_id", "words_a"), "left_id")
      .join(rw.toDF("right_id", "words_b"), "right_id")
      .withColumn("jaccard", jaccardOf(col("words_a"), col("words_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), round(col("jaccard"), 6).as("jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("left_id"))
      .orderBy(col("jaccard").desc, col("right_id").asc)
    verified.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
