package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — iterate on a subset
    // locally without paying the full 120-query dump (driver passes none)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val builder0 = SparkSession.builder()
    // Respect an EXTERNAL master (spark-submit --master spark://…): the
    // multi-process standalone campaign submits this same main; builder
    // .master() would silently override the cluster back to local mode.
    // Standalone defaults task.maxFailures=4, so the o23 retry gate works
    // there too; in self-managed local mode the ",2" enables it.
    val builder = if (sys.props.contains("spark.master")) builder0
      // maxFailures=2 (the ",2"): identical behavior unless a task fails —
      // needed by the o23 retry-determinism gate, whose injected
      // first-attempt failures must be retryable rather than job-fatal
      else builder0.master(s"local[$cpus,2]")
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (TypedImperativeAggregate buffers, e.g. the
      // bounded top-k heap) falls back to SORT-based aggregation after only
      // 128 distinct in-memory groups by default — which re-sorts the whole
      // candidate stream and defeats the point of a k-bounded buffer. Heap
      // states here are tiny (k entries), so let the hash map grow.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Reliable-checkpoint mode for multi-process runs: with a dir set,
    // Ckpt.materialize switches from localCheckpoint (blocks die with the
    // executor) to FS checkpoints that survive executor loss — the
    // documented cluster posture for every iterative loop driver.
    sys.env.get("SPARK_GRAFT_CKPT_DIR").foreach(spark.sparkContext.setCheckpointDir)
    new java.io.File(outDir).mkdirs()
    // Corpus-geometry guard for the two oracles with static range() caps
    // (DuckDB's range() can't take lateral column bounds): t15 enumerates
    // up to 600 char-8-grams per doc, d11 up to 20 word-chunks per doc. A
    // regenerated corpus with longer documents would make those oracles
    // silently drop rows and fail (or worse, truncate-and-pass) the hash
    // check — fail FAST here with an actionable message instead.
    locally {
      import org.apache.spark.sql.functions._
      val g = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(graft.functions.Text.normalize(col("text")).as("s"))
        .select(max(length(col("s"))).as("max_chars"),
          max(size(split(col("s"), " "))).as("max_words"))
        .head()
      val maxGrams = g.getInt(0) - 8 + 1
      val maxChunks = math.ceil(g.getInt(1) / 10.0).toInt
      require(maxGrams <= 600, s"t15 oracle caps grams at 600 but corpus has " +
        s"docs with $maxGrams 8-grams — raise the range() bound in t15_winnowing")
      require(maxChunks <= 20, s"d11 oracle caps chunks at 20 but corpus has " +
        s"docs with $maxChunks 10-word chunks — raise the range() bound in d11_paragraph_dedup")
      val maxWindows = 1 + math.ceil(math.max(g.getInt(1) - 40, 0) / 30.0).toInt
      require(maxWindows <= 8, s"t20 oracle caps windows at 8 but corpus has " +
        s"docs with $maxWindows 40/30 windows — raise the range() bound in t20_chunk_windows")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // The driver's oracle compare sorts cells in pandas, which cannot
        // hash array/map/struct cells (r7: s10/t21 errored on exactly
        // this). Fail FAST here on any non-scalar column in an
        // oracle-checked output instead of silently shipping a query the
        // gate will mark `err`. Rows-only (no_oracle) outputs are exempt —
        // the driver only counts their rows.
        if (SparkEntry.oracleSql.contains(name)) {
          import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
          val bad = df.schema.fields.collect {
            case f if f.dataType.isInstanceOf[ArrayType] ||
                      f.dataType.isInstanceOf[MapType] ||
                      f.dataType.isInstanceOf[StructType] =>
              s"${f.name}: ${f.dataType.simpleString}"
          }
          require(bad.isEmpty, s"oracle-checked query $name emits non-scalar " +
            s"column(s) ${bad.mkString(", ")} — the driver's pandas compare " +
            "cannot hash array cells; emit long-form rows or concat_ws strings")
        }
        // repartition(1), NOT coalesce(1): coalesce merges the FINAL stage
        // to one task, which drags every post-shuffle operator (sort-merge
        // joins, windows) into a single thread — at sf1 one such query ran
        // 7+ min on one core. repartition adds a tiny exchange so upstream
        // stages keep full parallelism and only the write is single-file.
        // SPARK_GRAFT_OUT_PARTS widens the WRITE side for big-SF campaigns
        // (skew-sf10's j15 emits a ~570 MB quadratic-on-the-hot-key result;
        // one writer task spent minutes encoding it). Default 1 keeps the
        // driver-contract layout byte-stable; tools/check.py globs the dir
        // either way.
        val outParts = sys.env.get("SPARK_GRAFT_OUT_PARTS")
          .map(_.toInt).getOrElse(1)
        df.repartition(outParts).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // NaN/Infinity guard (round 9): pandas/DuckDB disagree on NaN
        // ordering and equality semantics in the driver's sorted-cell
        // compare, so a NaN/Inf double in an oracle-checked output could
        // produce a confusing downstream hash mismatch — or an accidental
        // pass. Check the WRITTEN files (one cheap scan of an
        // already-small result); on violation DELETE the output before
        // rethrowing, so the driver records a clear "no spark output"
        // failure instead of comparing the poisoned parquet (the catch
        // below would otherwise swallow the error and leave the files).
        if (SparkEntry.oracleSql.contains(name)) {
          import org.apache.spark.sql.functions.{col, isnan, sum, when}
          import org.apache.spark.sql.types.{DoubleType, FloatType}
          // Rename to positional synthetic names first: selecting by
          // original name via col(c) would throw on duplicate column
          // names (possible after joins) or names containing dots,
          // misreporting the query as failed inside the guard itself.
          val written0 = spark.read.parquet(s"$outDir/$name")
          val written = written0.toDF(written0.columns.indices.map(i => s"_c$i"): _*)
          val dbls = written.schema.fields.zipWithIndex
            .filter { case (f, _) => f.dataType == DoubleType || f.dataType == FloatType }
            .map { case (f, i) => (f.name, written0.columns(i)) }.toSeq
          if (dbls.nonEmpty) {
            val counts = written.select(dbls.map { case (c, _) =>
              sum(when(isnan(col(c)) ||
                col(c) === Double.PositiveInfinity ||
                col(c) === Double.NegativeInfinity, 1).otherwise(0)).as(c) }: _*).head()
            val viol = dbls.zipWithIndex.collect {
              case ((_, orig), i) if !counts.isNullAt(i) && counts.getLong(i) > 0 =>
                s"$orig (${counts.getLong(i)} rows)"
            }
            if (viol.nonEmpty) {
              def rm(f: java.io.File): Unit = {
                Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
              }
              rm(new java.io.File(s"$outDir/$name"))
              throw new IllegalArgumentException(s"oracle-checked query $name " +
                s"emits NaN/Infinity in ${viol.mkString(", ")} — the " +
                "DuckDB/pandas compare semantics differ on these; guard or " +
                "round the expression (output deleted so the gate fails loudly)")
            }
          }
        }
        // Per-query wall time on stderr: the scale campaigns (sf1, sf10)
        // find their stragglers by grepping these lines — the driver
        // ignores stderr, so this is free diagnostics.
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      catch { case e: Throwable =>
        System.err.println(f"[verify] $name failed after ${(System.nanoTime() - t0) / 1e9}%.1f s: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
