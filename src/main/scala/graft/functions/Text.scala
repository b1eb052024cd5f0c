package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (codegen'd,
  * whole-stage-compatible) — no UDFs on the hot path, so these run at
  * 100 TB document scale without serialization overhead.
  */
object Text {

  /** Canonical text form used by fingerprint/dedup: lowercase, strip
    * non-alphanumerics to spaces, collapse whitespace, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + digits + punctuation marks counted
    * separately (a cheap proxy for subword tokenizers — the regex splits the
    * way GPT-style pre-tokenizers do at word/number/punct boundaries). */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct word list of the normalized text (the 1-gram shingle set). */
  def wordSet(text: Column): Column =
    array_distinct(split(normalize(text), " "))

  /** Sliding word n-grams of the normalized text, as an array of strings.
    * Built with sequence+transform (pure Catalyst, no UDF). */
  def wordNgrams(text: Column, n: Int): Column = {
    val words = split(normalize(text), " ")
    val k = size(words) - (n - 1)
    when(k <= 0, array(concat_ws(" ", words)))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Punctuation ratio: chars outside [A-Za-z0-9 whitespace] / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
        length(text).cast("double"))

  /** Ratio of tokens that are common-English stopwords — a standard quality
    * signal (natural prose ≈ 0.3–0.5; keyword spam ≈ 0). */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "this", "that", "be")

  def stopwordRatio(text: Column): Column = {
    val words = split(normalize(text), " ")
    when(size(words) === 0, lit(0.0)).otherwise(
      size(filter(words, w => w.isin(stopwords: _*))).cast("double") /
        size(words).cast("double"))
  }

  /** Mean word length of normalized words. */
  def meanWordLen(text: Column): Column = {
    val words = split(normalize(text), " ")
    when(size(words) === 0, lit(0.0)).otherwise(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(words).cast("double"))
  }

  /** Composite quality score in [0,1]: logistic mix of length, stopword
    * ratio and punctuation ratio. Deterministic; weights documented here are
    * the contract. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) / lit(0.4), lit(1.0))
    val punctPen  = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round(lenScore * 0.4 + stopScore * 0.4 + punctPen * 0.2, 6)
  }

  /** Language ID by marker-stopword voting over a handful of languages.
    * N-gram/stopword heuristic (fastText-style signal, pure SQL functions);
    * returns the language code with the most marker hits, 'und' if none.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "como", "por", "del"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这"))

  def langId(text: Column): Column = {
    val words = split(normalize(text), " ")
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(words, w => w.isin(markers: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the canonical text form — stable across
    * engines (DuckDB md5 matches), used for exact dedup at scale. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** 64-bit polynomial rolling-hash fingerprint over normalized words
    * (Rabin–Karp style; base 1000003). Pure Catalyst `aggregate` — no UDF. */
  def fingerprintRolling(text: Column): Column =
    aggregate(split(normalize(text), " "), lit(0L),
      (acc, w) => acc * lit(1000003L) + crc32(w).cast("long"))

  final case class WinnowFp(pos: Int, fp: String)

  /** WINNOWING document fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * scheme): md5 each of the doc's character `k`-grams, slide a window of
    * `w` consecutive gram hashes, and select each window's minimum hash —
    * rightmost position on ties. Guarantees: any substring match of length
    * ≥ w + k − 1 between two docs shares at least one selected
    * fingerprint, and consecutive selections are never more than w apart —
    * the bounded-density sub-document fingerprint that [[fingerprintMd5]]
    * (whole-doc) can't give.
    *
    * One pass per row: a monotonic deque makes the sliding min O(n) (ties
    * evicted on push, so the front is always the rightmost min). Docs
    * shorter than w grams yield their single all-grams window; shorter
    * than k, nothing. Hashes are md5 hex so an engine-independent oracle
    * can reproduce the selection by lexicographic argmin.
    */
  def winnowFingerprints(k: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    require(k > 0 && w > 0, "k and w must be positive")
    udf((s: String) => {
      if (s == null || s.length < k) Seq.empty[WinnowFp]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef"
        val n = s.length - k + 1
        val fps = new Array[String](n + 1) // 1-based gram positions
        var j = 1
        while (j <= n) {
          md.reset()
          val d = md.digest(s.substring(j - 1, j - 1 + k).getBytes("UTF-8"))
          val sb = new java.lang.StringBuilder(32)
          var b = 0
          while (b < d.length) {
            sb.append(hex.charAt((d(b) >> 4) & 0xf)); sb.append(hex.charAt(d(b) & 0xf))
            b += 1
          }
          fps(j) = sb.toString
          j += 1
        }
        val dq = new java.util.ArrayDeque[Int]()
        val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
        var p = 1
        while (p <= n) {
          // evict ties too: an equal LATER hash must win (rightmost-min)
          while (!dq.isEmpty && fps(dq.peekLast).compareTo(fps(p)) >= 0) dq.pollLast()
          dq.addLast(p)
          while (dq.peekFirst <= p - w) dq.pollFirst()
          if (p >= w) sel += dq.peekFirst
          p += 1
        }
        if (n < w) sel += dq.peekFirst // short doc: one window over all grams
        sel.toSeq.sorted.map(j2 => WinnowFp(j2, fps(j2)))
      }
    })
  }

  /** PII detector/redactor patterns. Written in the common subset of Java
    * regex (Spark) and RE2 (DuckDB, for the oracle): no backreferences, no
    * lookaround, `\d`/`\b` only — so the same pattern string drives both
    * engines. Pattern scope is the classic training-data scrub list:
    * emails, E.164-ish phone numbers, IPv4 addresses.
    */
  val piiEmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiPhoneRe: String = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
  val piiIpv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-class PII match counts — one codegen'd regexp pass per class, no
    * UDF. Order matters for redaction (emails contain no phone/IP shapes and
    * vice versa, so the classes here are disjoint and count independently).
    */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(piiEmailRe), lit(0))),
    size(regexp_extract_all(text, lit(piiPhoneRe), lit(0))),
    size(regexp_extract_all(text, lit(piiIpv4Re), lit(0))))

  /** Redact all three PII classes with typed placeholder tokens (the form
    * downstream tokenizers can keep as single units). Spark `regexp_replace`
    * is replace-ALL; the DuckDB oracle needs the explicit 'g' flag. */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, piiEmailRe, "[EMAIL]"),
        piiPhoneRe, "[PHONE]"),
      piiIpv4Re, "[IP]")

  /** Canonical URL form for dedup/cap keys: lowercase, strip scheme and a
    * leading www., strip query/fragment, strip one trailing slash. Pure
    * regexp_replace chain (codegen'd). */
  def normalizeUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", ""),
          "^www\\.", ""),
        "[?#].*$", ""),
      "/$", "")

  /** Host of a normalized URL (everything before the first '/'). */
  def urlHost(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^([^/]+)", 1)

  /** Registrable domain approximated as the last two host labels — the
    * per-site key a crawl pipeline caps on. (A full public-suffix list is a
    * lookup-table join; two labels is the deterministic engine-independent
    * core the oracle can reproduce.) */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Overlapping token-window chunking — the context-window splitter for
    * RAG indexing / long-doc training prep: fixed `width`-word windows
    * every `stride` words over the normalized text, the final window
    * clipped to the doc end (never empty, never past the end). Pure
    * Catalyst sequence→transform→explode — map-side, zero shuffle; the
    * chunk count per doc is 1 + ⌈max(0, n−width)/stride⌉ so a doc shorter
    * than one window still yields exactly one chunk.
    */
  def chunkWindows(df: org.apache.spark.sql.DataFrame, textCol: String,
                   idCol: String, width: Int, stride: Int
                  ): org.apache.spark.sql.DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width (gaps would drop words)")
    val words = split(normalize(col(textCol)), " ")
    val n = size(words)
    val nChunks = (lit(1) +
      ceil(greatest(n - width, lit(0)).cast("double") / stride)).cast("int")
    df.select(col(idCol), words.as("__w"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol),
        explode(transform(sequence(lit(0), col("__nc") - 1), i => struct(
          i.cast("int").as("chunk_id"),
          (i * stride + 1).cast("int").as("start_word"),
          least(lit(width), col("__n") - i * stride).cast("int").as("n_words")
        ))).as("__c"), col("__w"))
      .select(col(idCol),
        col("__c.chunk_id"), col("__c.start_word"), col("__c.n_words"),
        concat_ws(" ",
          slice(col("__w"), col("__c.start_word"), col("__c.n_words"))).as("chunk_text"))
  }

  /** Deterministic hash-sampling predicate: keep a row iff the md5 of its
    * id's string form falls below `rate` of the hex space (first two hex
    * chars < 256·rate). Unlike `df.sample()`, the decision is a pure
    * function of the id — stable across runs, engines, partitionings, and
    * incremental re-runs (a doc once sampled stays sampled), which is what
    * corpus downsampling needs for reproducible training mixes. */
  def hashSampleFilter(id: Column, rate: Double): Column = {
    require(rate > 0 && rate <= 1, "rate must be in (0, 1]")
    // 4 hex chars = 65536 buckets of resolution; ROUND (don't truncate) so
    // e.g. rate just under k/65536 still keeps ~rate of rows. rate == 1 (or
    // rounding to the full space) short-circuits to keep-all — a string
    // compare against the max bucket would wrongly drop the "ffff" bucket.
    val buckets = math.round(65536.0 * rate)
    if (buckets >= 65536L) lit(true)
    else {
      require(buckets > 0, s"rate $rate is below the representable minimum 1/65536")
      val cut = f"$buckets%04x"
      substring(md5(id.cast("string")), 1, 4) < lit(cut)
    }
  }

  /** [[hashSampleFilter]] with an absolute expected-size cap: keep a
    * deterministic ~`target`-row slice of an `n`-row corpus (keep-all
    * when n <= target, so at small scale the "sample" IS the corpus).
    * The cut is a pure function of (n, target) using only arithmetic an
    * external SQL engine reproduces bit-exactly — floor of a double
    * ratio, never round-half — so a DuckDB oracle can rebuild the same
    * slice from the same table:
    *   count(*) <= target OR substr(md5(CAST(id AS VARCHAR)), 1, 4) <
    *     printf('%04x', least(65535, CAST(floor(65536.0 * target /
    *       count(*)) AS BIGINT) + 1))
    * This is the seam that keeps O(N²) exact-verification twins
    * affordable at any SF: twin cost is O(target²) regardless of corpus
    * size while the production path still sees every row. floor+1 keeps
    * the expected sample size >= target (never a starved slice); the
    * 65535 clamp keeps the cut a 4-hex string (a 5-char "10000" would
    * break the lexicographic compare). */
  def hashSampleCapFilter(id: Column, n: Long, target: Long): Column = {
    require(target > 0, "target must be positive")
    require(n >= 0, "corpus size must be non-negative")
    if (n <= target) lit(true)
    else {
      val buckets =
        math.min(65535L, math.floor(65536.0 * target.toDouble / n.toDouble).toLong + 1L)
      substring(md5(id.cast("string")), 1, 4) < lit(f"$buckets%04x")
    }
  }

  /** Deterministic weighted split assignment — the train/val/test splitter
    * of a training-data pipeline, as a pure function of a GROUP key rather
    * than the row: every row sharing `groupKey` lands in the same split,
    * which is what makes the split LEAKAGE-SAFE (near-duplicate documents
    * must not straddle train and eval — group by a dedup fingerprint or
    * cluster id and the guarantee is structural, not statistical).
    * `fracs` are (label, fraction) in declared order, summing to 1;
    * assignment is by md5 bucket of the key's string form (same 4-hex
    * space as [[hashSampleFilter]]), so it is reproducible across runs,
    * engines, partitionings, and incremental re-runs — a doc's split
    * never changes when the corpus grows. */
  def deterministicSplit(groupKey: Column, fracs: Seq[(String, Double)]): Column = {
    require(fracs.nonEmpty && fracs.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    // NULL group keys fail LOUDLY: md5(null) is null, every bucket-vs-cut
    // compare would be null, and the chained when's otherwise-branch would
    // silently dump every null-keyed row in the LAST split — for a
    // leakage-safety primitive a null fingerprint/cluster id signals broken
    // upstream input, not "assign to test".
    val bucket = when(groupKey.isNull,
        raise_error(lit("deterministicSplit: NULL group key — a split keyed" +
          " on a null fingerprint/cluster id is not leakage-safe")))
      .otherwise(substring(md5(groupKey.cast("string")), 1, 4))
    // 65535 clamp: a cut of 65536 would format as 5-char "10000" and break
    // the 4-hex lexicographic compare (same guard as hashSampleCapFilter)
    val cutVals = fracs.scanLeft(0.0)(_ + _._2).tail.dropRight(1)
      .map(f => math.min(65535L, math.round(65536.0 * f)))
    // reject cuts that collapse to the same bucket (a sub-1/65536 split
    // would be silently EMPTY — same representability rule that makes
    // hashSampleFilter require(buckets > 0) rather than keep nothing)
    require(cutVals.headOption.forall(_ > 0) &&
        cutVals.zip(cutVals.drop(1)).forall { case (a, b) => a < b },
      s"split fractions below the 1/65536 bucket resolution: cuts $cutVals " +
        "must be strictly increasing and positive")
    val cuts = cutVals.map(v => f"$v%04x")
    // chained when: bucket < cut1 -> label1, < cut2 -> label2, ..., else last
    cuts.zip(fracs.map(_._1)).foldRight(lit(fracs.last._1)) {
      case ((cut, label), rest) => when(bucket < lit(cut), label).otherwise(rest)
    }
  }

  /** BPE TOKENIZER TRAINING in-engine (Sennrich et al. 2016's word-
    * frequency form): collapse the corpus to its DISTINCT-WORD frequency
    * table — vocabulary-sized, sublinear in corpus size, the step that
    * makes tokenizer training tractable at 100 TB — then iterate: count
    * adjacent symbol pairs weighted by word frequency, merge the globally
    * most frequent pair (ties broken (freq desc, left asc, right asc) for
    * cross-run determinism), rewrite the symbol sequences, repeat.
    * Returns the merge table (rank, left, right, freq) — the artifact a
    * tokenizer ships.
    *
    * Loop shape (the kmeansTrain/pageRank discipline): each round is one
    * map-side pair explode + one tiny groupBy over the vocab table, ONE
    * argmax row to the driver, and a lineage-truncating
    * [[graft.functions.Ckpt.materialize]] of the rewritten vocab.
    * Merge frequencies are monotone non-increasing by construction (a
    * pair born of a merge occurs at most as often as the merge did;
    * everything else was already ≤ the previous max) — the t25 gate
    * asserts this in-plan.
    */
  /** One BPE merge application: rewrite every leftmost-first,
    * non-overlapping (l, r) adjacency as the fused symbol. The SINGLE
    * rewrite rule — training ([[bpeTrain]]) and encoding ([[bpeEncode]])
    * both call it, which is what makes encode-the-training-corpus
    * reproduce training's final symbol sequences exactly. */
  private def bpeMergeOnce(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
               merges: Int): org.apache.spark.sql.DataFrame = {
    require(merges > 0, "must request at least one merge")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = Ckpt.materialize(
      df.select(explode(split(normalize(col(textCol)), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        // split on the empty pattern = character array, pure Catalyst
        .select(split(col("w"), "").as("syms"), col("freq")))
    val mergeRow = udf((syms: Seq[String], l: String, r: String) =>
      bpeMergeOnce(syms.toArray, l, r).toSeq)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < merges) {
      val top = vocab
        .select(posexplode(col("syms")).as(Seq("i", "l")), col("syms"), col("freq"))
        .filter(col("i") < size(col("syms")) - 1)
        .select(col("l"), element_at(col("syms"), col("i") + 2).as("r"), col("freq"))
        .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) rank = merges // every word is a single symbol: done
      else {
        val row = top.head
        val (l, r, f) = (row.getString(0), row.getString(1), row.getLong(2))
        picked += ((picked.size + 1, l, r, f))
        // old vocab's checkpoint blocks are reclaimed by the context
        // cleaner once this reference drops (unpersist() would be a no-op
        // on a checkpointed frame — it only releases .persist() entries)
        vocab = Ckpt.materialize(
          vocab.select(mergeRow(col("syms"), lit(l), lit(r)).as("syms"), col("freq")))
        rank += 1
      }
    }
    picked.toSeq.toDF("rank", "left", "right", "freq")
  }

  /** Apply a trained BPE merge table ([[bpeTrain]]'s output, collected to
    * rows ordered by rank) to a text column: tokenize each normalized
    * word into characters, then replay the merges in rank order —
    * leftmost-first, non-overlapping, exactly the rewrite rule training
    * used, so encoding the training corpus reproduces training's final
    * symbol sequences. Returns an array<string> token column. Pure
    * map-side: the merge list is a broadcast-sized literal closure
    * (tokenizers ship thousands of merges, not millions), no shuffle. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    // rank map + lowest-rank-pair loop, NOT a linear replay of the merge
    // table per word: replay is O(|merges| × word length) — 32k merges
    // means 32k passes per word, nearly all matching nothing. Applying
    // the lowest-rank pair present is equivalent (a merge's output symbol
    // cannot appear in any LOWER-rank pair — that pair was trained before
    // the symbol existed), and costs O(applied merges × word length).
    val rankOf: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val mergeArr = merges.toArray
    val enc = udf((s: String) => {
      if (s == null) Seq.empty[String]
      else s.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms: Array[String] = w.toCharArray.map(_.toString)
        var done = syms.length < 2
        while (!done) {
          var best = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val rk = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (rk < best) best = rk
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val (l, r) = mergeArr(best)
            syms = bpeMergeOnce(syms, l, r)
            done = syms.length < 2
          }
        }
        syms.toSeq
      }
    })
    enc(normalize(text))
  }

  /** Greedy sequence packing: assign documents to fixed token-budget packs
    * per group (the LLM-training step that concatenates documents into
    * context windows). Documents are walked in `orderCol` order; a doc
    * whose running total crosses the budget boundary starts/straddles the
    * next pack — pack_id = floor(tokens_before_this_doc / budget). One
    * window over (group, order): a single shuffle keyed by the group. */
  def packSequences(df: org.apache.spark.sql.DataFrame, groupCol: String,
                    orderCol: String, tokenCol: String, budget: Long
                   ): org.apache.spark.sql.DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("pack_id",
      floor(coalesce(sum(col(tokenCol)).over(w), lit(0L)) / budget))
  }

  /** [[packSequences]] for FEW, HUGE groups — the realistic corpus shape
    * (a handful of languages × billions of docs). The window form above
    * shuffles each group into ONE task, so 5 languages = 5 tasks no matter
    * the cluster size; this variant is the classic two-phase distributed
    * prefix scan:
    *
    *   1. range-partition by (group, order) and sort within partitions —
    *      every partition holds a contiguous slice of a group's order;
    *   2. pass 1 computes per-(partition, group) token totals (one number
    *      per group per partition — tiny);
    *   3. the driver prefix-scans those totals into per-partition start
    *      offsets (cost: partitions × groups, independent of row count);
    *   4. pass 2 re-walks each partition sequentially, seeding the running
    *      total from the broadcast offset.
    *
    * Output pack_ids are IDENTICAL to the window form (same global order,
    * same floor(tokens-before / budget)); the work per task is
    * rows/partitions instead of rows/groups. mapPartitions (ladder rung
    * (d)) is justified here: the per-partition walk is genuinely
    * sequential, and no Catalyst operator expresses a seeded running sum.
    */
  def packSequencesScalable(df: org.apache.spark.sql.DataFrame, groupCol: String,
                            orderCol: String, tokenCol: String, budget: Long,
                            numPartitions: Int = 0
                           ): org.apache.spark.sql.DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val arranged = df
      .repartitionByRange(n, col(groupCol), col(orderCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
    val schema = arranged.schema
    val gi = schema.fieldIndex(groupCol)
    val ti = schema.fieldIndex(tokenCol)
    // pass 1: (partition, group) -> token total; LinkedHashMap keeps group
    // first-seen order (not required for correctness, avoids re-sorting)
    val partSums = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r =>
        val g = r.get(gi)
        m.update(g, m.getOrElse(g, 0L) + r.getAs[Number](ti).longValue())
      }
      m.iterator.map { case (g, s) => (pid, g, s) }
    }.collect()
    val offsets: Map[(Int, Any), Long] = partSums
      .groupBy(_._2)
      .flatMap { case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._1).map { case (pid, _, s) =>
          val entry = ((pid, g), acc); acc += s; entry
        }
      }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = schema.add("pack_id", org.apache.spark.sql.types.LongType)
    val packed = arranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bc.value
      var curG: Any = null
      var run = 0L
      var started = false
      it.map { r =>
        val g = r.get(gi)
        if (!started || g != curG) {
          curG = g; run = off.getOrElse((pid, g), 0L); started = true
        }
        val packId = run / budget
        run += r.getAs[Number](ti).longValue()
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ packId)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }

  /** [[packSequences]] with the form CHOSEN by corpus shape — the d5
    * routing discipline applied to packing. The window form parallelizes
    * across groups (each group sorts in ONE task: right when groups are
    * many, a scale cliff when 5 languages hold 100 TB); the prefix-scan
    * form parallelizes within groups but collects a
    * (partitions × groups)-sized offset table (right for few huge groups,
    * a driver bomb for millions of tiny ones). The probe is a
    * LocalLimit-bounded distinct count that stops at `groupThreshold`+1 —
    * it never pays a full-corpus aggregate to decide. Output pack_ids are
    * IDENTICAL either way (FunctionsSpec pins both regimes). */
  def packSequencesAuto(df: org.apache.spark.sql.DataFrame, groupCol: String,
                        orderCol: String, tokenCol: String, budget: Long,
                        groupThreshold: Int = 64, numPartitions: Int = 0
                       ): org.apache.spark.sql.DataFrame = {
    require(groupThreshold > 0, "groupThreshold must be positive")
    val fewGroups = df.select(col(groupCol)).distinct()
      .limit(groupThreshold + 1).count() <= groupThreshold
    if (fewGroups)
      packSequencesScalable(df, groupCol, orderCol, tokenCol, budget, numPartitions)
    else packSequences(df, groupCol, orderCol, tokenCol, budget)
  }

  /** Okapi BM25 document retrieval: score every document against a bag of
    * query terms and return the top `k` — the lexical-retrieval primitive
    * (quality-filter seeding, "more-like-this" expansion, eval-set mining)
    * the corpus family's TF-IDF (t7) and unigram-LM (t12) operators imply
    * but don't expose as a ranked query.
    *
    *   idf(t)     = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   score(d)   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Plan shape (the 100 TB story): ONE corpus scan feeds everything —
    * doc length is computed map-side and carried THROUGH the explode as a
    * grouping column (no second scan, no dl join); the query-term filter
    * is a codegen'd `In` applied to generated rows BEFORE the only
    * corpus-sized shuffle (the (doc, term) tf aggregate, whose output is
    * bounded by matching docs × |query|); df and the (N, avgdl) stats are
    * |query|-row / 1-row aggregates that BROADCAST back. Top-k is
    * orderBy+limit (per-partition heaps + driver merge), with the rank
    * window bounded by k. At index-at-rest scale the tf aggregate is the
    * posting-list table — write it partitioned by term (the s16 posture)
    * and a query becomes partition-pruned I/O.
    */
  def bm25TopK(df: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    val terms = queryTerms.distinct
    val base = Dedup.spread(df).select(
        col(idCol).as("__id"),
        filter(split(normalize(col(textCol)), " "), w => w =!= "").as("__ws"))
      .select(col("__id"), col("__ws"),
        size(col("__ws")).cast("double").as("__dl"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val tf = base
      .select(col("__id"), col("__dl"), explode(col("__ws")).as("__t"))
      .filter(col("__t").isInCollection(terms))
      .groupBy(col("__id"), col("__dl"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dft = tf.groupBy(col("__t"))
      .agg(countDistinct(col("__id")).cast("double").as("__df"))
    val scored = tf.join(broadcast(dft), "__t")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("__tf") * lit(k1 + 1.0) /
        (col("__tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("__id"))
      .agg(round(sum(col("__s")), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("__id").asc)
      .limit(k)
    scored
      // onePartKey: same single partition (input is ≤ k rows post-limit,
      // so it's bounded), but a NON-FOLDABLE partition key keeps
      // WindowExec from logging the no-partition warning — a plain
      // lit(0) is stripped by EliminateWindowPartitions; real unbounded
      // single-partition windows should stand out in the logs.
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(graft.operators.Relational.onePartKey(col("__id")))
          .orderBy(col("score").desc, col("__id").asc)).cast("int"))
      .select(col("__id").as(idCol), col("score"), col("n_terms_hit"),
        col("rank"))
  }

  /** Write the BM25 posting lists AT REST, partitioned by a term hash
    * BUCKET — the lexical twin of the IVF member table
    * ([[graft.functions.Similarity.saveIvfMemberTable]]): one tokenize
    * scan + one (doc, term) aggregate, then a partitioned write. A query
    * touching `q` distinct terms opens at most `q` of the `nBuckets`
    * partition directories (partition pruning at the file listing — the
    * PersistSpec contract), instead of re-tokenizing the corpus per
    * query. Partitioning by RAW term would create one directory per
    * vocabulary entry (millions at real scale) — the hash bucket keeps
    * the directory count fixed while preserving the pruning.
    *
    * Layout: `<path>/postings` (bucket=…/ dirs; doc_id, dl, term, tf) and
    * `<path>/stats` (one row: n_docs, avgdl, n_buckets — the bucket
    * count is PERSISTED so a probe can never prune with the wrong modulus:
    * round-12 ADVICE fix; [[bm25TopKFromIndex]] derives it from here
    * instead of trusting a caller-supplied parameter). */
  def saveBm25Index(df: DataFrame, textCol: String, idCol: String,
                    path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val base = Dedup.spread(df).select(
        col(idCol).as("doc_id"),
        filter(split(normalize(col(textCol)), " "), w => w =!= "").as("__ws"))
      .select(col("doc_id"), col("__ws"),
        size(col("__ws")).cast("double").as("dl"))
    base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    base.agg(count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** INDEX MAINTENANCE (round 12): append a new document batch to an
    * at-rest BM25 index written by [[saveBm25Index]] — the t27 twin of
    * [[graft.functions.Similarity.appendIvfMemberTable]]. Bucket
    * assignment is a pure function of (term, n_buckets) and n_buckets is
    * read from the persisted stats table, so the batch's posting files
    * land INSIDE the existing `bucket=` directories (partition-aligned
    * `mode(append)`; base files are never rewritten) and append+probe is
    * EXACTLY a rebuild over base ∪ batch. The stats table is the only
    * thing rewritten, and its update is ALGEBRAIC — (N, Σdl) are
    * mergeable partials, so
    *   n' = n + n_batch,   avgdl' = (n·avgdl + Σdl_batch) / n'
    * needs one 1-row aggregate over the batch, never a base re-scan.
    * df(t) needs no maintenance at all: the probe recomputes it from the
    * probed postings (exact — see [[bm25TopKFromIndex]]).
    * Caller contract (same as the IVF twin): doc ids unique across
    * base ∪ batch. */
  def appendBm25Index(batch: DataFrame, textCol: String, idCol: String,
                      path: String): Unit = {
    val spark = batch.sparkSession
    val st = spark.read.parquet(s"$path/stats")
      .select(col("n_docs"), col("avgdl"), col("n_buckets")).head()
    val (n0, avgdl0, nb) = (st.getDouble(0), st.getDouble(1), st.getInt(2))
    val base = Dedup.spread(batch).select(
        col(idCol).as("doc_id"),
        filter(split(normalize(col(textCol)), " "), w => w =!= "").as("__ws"))
      .select(col("doc_id"), col("__ws"),
        size(col("__ws")).cast("double").as("dl"))
    base
      .select(col("doc_id"), col("dl"), explode(col("__ws")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(nb.toLong)))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/postings")
    val bs = base.agg(count(lit(1)).cast("double").as("nb_docs"),
      coalesce(sum(col("dl")), lit(0.0)).as("sdl")).head()
    val (nB, sdlB) = (bs.getDouble(0), bs.getDouble(1))
    import spark.implicits._
    // stats row was collected above, so overwriting the path we read is safe
    Seq((n0 + nB, (n0 * avgdl0 + sdlB) / (n0 + nB), nb))
      .toDF("n_docs", "avgdl", "n_buckets")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** BM25 top-k against an at-rest index written by [[saveBm25Index]]:
    * the query terms' buckets become a STATIC `bucket IN (<literals>)`
    * partition filter (bucket ids resolved by a |terms|-row Spark job so
    * the hash is engine-identical by construction; the modulus comes
    * from the PERSISTED stats row, so a probe can never prune with a
    * bucket count different from the one the index was written with —
    * round-12 ADVICE fix), df(t) is recomputed from the probed postings
    * (restricting to query terms keeps every doc of those terms, so df
    * is exact), and (N, avgdl) come from the stats table. Scores are
    * formula-identical to [[bm25TopK]].
    *
    * `tombstones` (round 12, the t28 maintenance posture — the lexical
    * twin of s17's anti-join deletes): a (doc_id, dl) frame of deleted
    * documents. Deleted docs are anti-joined out of the probed postings
    * BEFORE df is computed (so df is exact over the survivors), and the
    * corpus stats are adjusted ALGEBRAICALLY —
    *   n'     = n − |tomb|
    *   avgdl' = (n·avgdl − Σdl_tomb) / n'
    * — one eager aggregate over the (doc_id-deduped) tombstone table,
    * CDC-delete-sized by contract (the dl is carried BY the tombstone
    * row, the shape a CDC delete naturally has, so no index partition
    * outside the query's buckets is ever read). Tombstoning the whole
    * corpus fails loudly at call time (adjusted n would be 0).
    * With tombstones, probe ≡ a full [[saveBm25Index]] rebuild over the
    * surviving corpus (same formula, same df, algebraically-equal stats;
    * the t28 gate asserts it to 1e-6). */
  def bm25TopKFromIndex(postings: DataFrame, stats: DataFrame,
                        queryTerms: Seq[String], k: Int,
                        tombstones: Option[DataFrame] = None,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, "k must be positive")
    val terms = queryTerms.distinct
    val spark = postings.sparkSession
    import spark.implicits._
    val stRow = stats.select(col("n_docs"), col("avgdl"),
      col("n_buckets")).head()
    val (n0, avgdl0, nBuckets) =
      (stRow.getDouble(0), stRow.getDouble(1), stRow.getInt(2))
    val buckets = terms.toDF("__t")
      .select(pmod(xxhash64(col("__t")), lit(nBuckets.toLong)).as("__b"))
      .distinct().as[Long].collect().toSeq
    // survivors-adjusted stats. Round-12 ADVICE hardening: a duplicated
    // tombstone row would double-subtract its dl and over-decrement N
    // (skewing every surviving score), and tombstoning the whole corpus
    // would yield 0/0 → null avgdl → silently null scores. Dedup on
    // doc_id first, then fail loudly when the adjusted corpus is empty.
    // The guard is an EAGER driver-side aggregate, not an in-plan
    // raise_error: with every doc tombstoned the probe side is empty and
    // AQE's empty-relation propagation can eliminate the downstream join
    // before a planted error expression ever evaluates — an in-plan guard
    // is unreachable by construction on exactly the input it guards.
    // Cost: one job over the tombstone table, which is CDC-delete-sized
    // by contract (it rides the driver as a broadcast either way).
    val (nAdj, avgdlAdj) = tombstones match {
      case Some(tomb) =>
        val r = tomb.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
          .agg(count(lit(1)).cast("double"), coalesce(sum(col("dl")), lit(0.0)))
          .head()
        val (tc, tdl) = (r.getDouble(0), r.getDouble(1))
        require(n0 - tc > 0,
          s"bm25TopKFromIndex: tombstones cover the whole corpus (adjusted n_docs = ${n0 - tc})")
        (n0 - tc, (n0 * avgdl0 - tdl) / (n0 - tc))
      case None => (n0, avgdl0)
    }
    val probedAll = postings
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("term").isInCollection(terms))
    val probe = tombstones match {
      case Some(tomb) =>
        probedAll.join(broadcast(tomb.select(col("doc_id"))),
          Seq("doc_id"), "left_anti")
      case None => probedAll
    }
    val dft = probe.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).cast("double").as("__df"))
    val scored = probe.join(broadcast(dft), "term")
      .withColumn("__idf",
        log(lit(1.0) + (lit(nAdj) - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__s", col("__idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdlAdj))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__s")), 6).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    // onePartKey: bounded (≤ k rows) single partition without the
    // WindowExec no-partition warning — see bm25TopK / Relational.onePartKey.
    scored.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(graft.operators.Relational.onePartKey(col("doc_id")))
          .orderBy(col("score").desc, col("doc_id").asc)).cast("int"))
  }
}
