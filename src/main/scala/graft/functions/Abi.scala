package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ABI hex-blob decoding — the reference's one genuine scalar-UDF family
  * (data_lake.py:979-984,1031-1034 decode `['uint256']` / address tuples
  * from event `data` blobs).
  *
  * Implemented as pure column expressions over hex strings:
  *   - a 32-byte ABI word at position `i` is chars [2+64i, 2+64(i+1)) after
  *     the 0x prefix;
  *   - uint256 words are decoded to Double (the reference deliberately uses
  *     float64 for uint256 — helpers.py:228-229), via conv() on 48-bit limbs
  *     to avoid Long overflow;
  *   - address words are the low 20 bytes of the word, 0x-prefixed lowercase.
  */
object Abi {

  /** The `i`-th 32-byte word (64 hex chars) of an 0x-prefixed blob. */
  def word(blob: Column, i: Int): Column =
    lower(substring(blob, 3 + 64 * i, 64))

  /** Decode word `i` as an EVM address: low 20 bytes, 0x-prefixed. */
  def decodeAddress(blob: Column, i: Int = 0): Column =
    concat(lit("0x"), substring(word(blob, i), 25, 40))

  /** Decode word `i` as uint256 → Double. Splits the 256-bit word into
    * 6 × 48-bit limbs (12 hex chars each, within Long range for conv), then
    * recombines with double math: Σ limb_j · 16^(12·(5−j)).
    */
  def decodeUint256(blob: Column, i: Int = 0): Column = {
    val w = word(blob, i)
    // 64 hex chars = 5 limbs of 12 + 1 limb of 4 (high-order first)
    val hi = conv(substring(w, 1, 4), 16, 10).cast("double") // 16 bits
    val limbs = (0 until 5).map { j =>
      conv(substring(w, 5 + 12 * j, 12), 16, 10).cast("double") *
        pow(lit(16.0), lit(12.0 * (4 - j)))
    }
    limbs.foldLeft(hi * math.pow(16.0, 60))(_ + _)
  }

  /** Decode word `i` as uint256 scaled by 10^decimals (the ubiquitous
    * raw/10**decimals idiom, e.g. data_lake.py:995). */
  def decodeScaled(blob: Column, i: Int, decimals: Column): Column =
    decodeUint256(blob, i) / pow(lit(10.0), decimals)
}
