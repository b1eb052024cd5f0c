package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB path:
  *
  *   - exact dedup = one hash-shuffle on the fingerprint;
  *   - MinHash+LSH = per-row signature (map-side, codegen'd array exprs),
  *     explode to (band, bandHash) buckets, self-join *within buckets only*
  *     (never all-pairs), then exact-Jaccard verify on the candidates;
  *   - SimHash = single 64-bit signature per doc, bucketed by rotated
  *     prefixes for Hamming-radius candidate generation.
  *
  * All signature math is Catalyst expressions (`transform`/`aggregate`/
  * `hash`/`xxhash64`) — no UDFs, fully whole-stage-codegen'd.
  */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` row per canonical-text group.
    * One shuffle on the md5 fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = Text.fingerprintMd5(col(textCol))
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("__fp")
  }

  /** MinHash signature: array of `k` 32-bit min-hashes over word n-gram
    * shingles. Uses `hash(shingle, seed)` (murmur3) per permutation. */
  def minHashSignature(text: Column, n: Int = 2, k: Int = 64): Column = {
    val shingles = Text.wordNgrams(text, n)
    val sig = (0 until k).map { i =>
      array_min(transform(shingles, s => hash(s, lit(i))))
    }
    array(sig: _*)
  }

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * `k/bands` consecutive signature slots. Explode the result and
    * group/join on (band_idx, band_hash) to get candidate buckets. */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(concat_ws("_", slice(sig, b * rows + 1, rows).cast("array<string>")))
               .as("band_hash"))
    }: _*)
  }

  /** Candidate near-duplicate pairs via MinHash+LSH, verified with exact
    * word-set Jaccard ≥ `threshold`. Returns (id_a, id_b, jaccard) with
    * id_a < id_b. The self-join runs per bucket — shuffle is on band hash,
    * never a cross join.
    */
  def nearDupMinhashLsh(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      Text.wordSet(col(textCol)).as("words"),
      minHashSignature(col(textCol), n, k).as("sig"))
    val buckets = withSig
      .select(col("id"), col("words"), explode(lshBands(col("sig"), k, bands)).as("bk"))
      .select(col("id"), col("words"), col("bk.band"), col("bk.band_hash"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.words").as("words_a"), col("b.words").as("words_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("jaccard", jaccardWords(col("words_a"), col("words_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
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
  def simHash(text: Column): Column = {
    val words = Text.wordSet(text)
    val hashes = transform(words, w => xxhash64(w))
    // for each bit i: count of words with bit set vs total -> majority vote
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exhaustive n-gram Jaccard near-dup pairs within blocking groups —
    * the quadratic baseline, bounded by the blocking key so each group's
    * pair count stays small. Oracle-expressible in plain SQL.
    */
  def nearDupJaccardBlocked(df: DataFrame, textCol: String, idCol: String,
                            blockCols: Seq[String], threshold: Double): DataFrame = {
    val prepared = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+ Text.wordSet(col(textCol)).as("words"): _*)
    val a = prepared.as("a")
    val b = prepared.as("b")
    val blockCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockCond && col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccardWords(col("a.words"), col("b.words")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              round(col("jaccard"), 6).as("jaccard"))
  }
}
