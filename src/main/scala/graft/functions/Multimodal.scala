package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Images/audio/video are opaque `binary` columns plus a typed metadata
  * struct. All Spark-side plumbing — schema, partition-preserving batch
  * iteration, output shape — is real; only the codec calls are stubbed
  * (the decode libraries are not in this container) behind
  * `DecodeStub`, a deterministic fake with the exact signature a JNI/
  * jcodec-backed implementation would have. Swap `DecodeStub` for a real
  * codec and nothing else changes.
  *
  * Scale notes: decode runs inside `mapPartitions` so each task decodes
  * its own partition's blobs — no shuffle, no driver involvement; columnar
  * batches arrive pruned (only `payload` + id columns are read when the
  * caller selects them).
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),       // image|audio|video
    StructField("format", StringType),           // png|jpeg|wav|mp4|...
    StructField("width", IntegerType),           // px (images/video)
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),        // audio/video
    StructField("n_bytes", LongType)))

  /** Row schema of a multimodal dataset: id + payload + metadata. */
  def mediaSchema(idCol: String = "media_id"): StructType = StructType(Seq(
    StructField(idCol, LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** The codec seam. A real implementation calls the image/audio library;
    * this deterministic stub derives pseudo-features from the bytes so the
    * pipeline is testable end-to-end (same input → same output).
    */
  object DecodeStub {
    /** "Decode" an image payload to (width, height, meanLuma). */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 512); val ht = 64 + math.abs((h >> 9) % 512)
      val luma = if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0
      (w, ht, luma)
    }

    /** "Extract" a fixed-size feature vector from a payload (embedding
      * stand-in; real impl = vision/audio encoder). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        // deterministic bytes -> [0,1) folding, no RNG
        val b = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
        out(i) = ((b * 2654435761L + i * 40503L) % 1000L).toFloat / 1000f
        i += 1
      }
      out
    }

    /** "Sample" up to n frame offsets from a video payload. */
    def frameOffsets(durationMs: Long, n: Int): Array[Long] =
      if (durationMs <= 0 || n <= 0) Array.empty
      else Array.tabulate(n)(i => durationMs * i / n)
  }

  /** Decode + feature-extract over a media DataFrame, partition-local.
    * Output: (id, width, height, mean_luma, features[dim]).
    * Batch shape: one `Iterator[Row]` per partition — the Scala twin of a
    * pandas-batched UDF; rows stream through without materializing the
    * partition.
    */
  def decodeAndFeaturize(media: DataFrame, idCol: String, dim: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.empty[Byte])
          val (w, h, luma) = DecodeStub.decodeImage(bytes)
          Row(id, w, h, luma, DecodeStub.features(bytes, dim).toSeq)
        }
      }(enc)
  }

  /** Resize stub: emits the target dims + a deterministic content hash of
    * (payload, target) — plumbing for an image-resize stage. */
  def resizeStub(media: DataFrame, idCol: String, w: Int, h: Int): DataFrame =
    media.select(
      col(idCol),
      lit(w).as("target_w"), lit(h).as("target_h"),
      sha2(concat(col("payload"), lit(s"${w}x$h").cast("binary")), 256).as("resized_sha256"))

  /** Frame-sampling stub for video payloads: explode n deterministic frame
    * offsets per row. */
  def sampleFrames(media: DataFrame, idCol: String, n: Int): DataFrame =
    media.select(col(idCol), col("meta.duration_ms").as("duration_ms"))
      .withColumn("frame_ms",
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (col("duration_ms") * i / n).cast("long"))))
      .filter(col("duration_ms") > 0)

  /** Audio chunking schedule: overlapping fixed-length windows over each
    * payload's duration — the segmentation step before a speech/audio
    * encoder (the decode itself stays behind [[DecodeStub]]). A chunk
    * starts every `strideMs` (stride < chunk ⇒ overlap), the last chunk
    * is clipped to the payload end, and media shorter than one stride
    * still yield their single clipped chunk. Pure per-row explode — no
    * shuffle, schedule arithmetic is codegen'd, and at 100 TB the chunk
    * rows carry only (id, offsets): payload bytes are re-attached by the
    * decode step's partition-local join, never exploded.
    */
  /** 2-D tile schedule for image payloads: the non-overlapping `tileW` ×
    * `tileH` grid covering each image, edge tiles clipped to the image
    * bounds — the patching step in front of a ViT-style encoder (the
    * pixel crop itself stays behind [[DecodeStub]]; this is the schedule
    * the cropper and the downstream batch-shaper consume). The spatial
    * twin of [[chunkAudio]]: a pure per-row double explode over the
    * metadata, no shuffle, and the tile rows carry only (id, geometry) —
    * payload bytes are re-attached partition-locally at decode time.
    */
  def tileImages(media: DataFrame, idCol: String, tileW: Int, tileH: Int): DataFrame = {
    require(tileW > 0 && tileH > 0, "tileW and tileH must be positive")
    media.select(col(idCol), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .filter(col("width") > 0 && col("height") > 0)
      .withColumn("tile_x",
        explode(sequence(lit(0), floor((col("width") - 1) / tileW).cast("int"))))
      .withColumn("tile_y",
        explode(sequence(lit(0), floor((col("height") - 1) / tileH).cast("int"))))
      .select(col(idCol), col("width"), col("height"),
        col("tile_x"), col("tile_y"),
        (col("tile_x") * tileW).as("x0"),
        (col("tile_y") * tileH).as("y0"),
        least(lit(tileW), col("width") - col("tile_x") * tileW).as("tile_w"),
        least(lit(tileH), col("height") - col("tile_y") * tileH).as("tile_h"))
  }

  def chunkAudio(media: DataFrame, idCol: String,
                 chunkMs: Long, strideMs: Long): DataFrame = {
    require(chunkMs > 0 && strideMs > 0, "chunkMs and strideMs must be positive")
    media.select(col(idCol), col("meta.duration_ms").as("duration_ms"))
      .filter(col("duration_ms") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L),
          floor((col("duration_ms") - 1) / strideMs).cast("long"))))
      .select(col(idCol), col("duration_ms"),
        col("chunk_idx"),
        (col("chunk_idx") * strideMs).as("start_ms"),
        least(col("chunk_idx") * strideMs + chunkMs, col("duration_ms")).as("end_ms"))
  }
}
