package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (the `Aggregator`/UDAF rung of the
  * custom-operator ladder): numerically stable streaming mean/variance.
  *
  * Welford/Chan parallel form: each partition folds its rows into
  * (n, mean, M2) in one pass, partial states merge associatively with the
  * pairwise update — no Σx² catastrophic cancellation, map-side partial
  * aggregation like any built-in. This is what a custom metric that can't
  * be composed from built-ins should look like: typed state, two code
  * paths (reduce + merge), zero driver involvement.
  */
object Stats {

  final case class MeanVar(n: Long, mean: Double, m2: Double)

  /** Final result: (mean, sample stddev). */
  final case class MeanStd(mean: Double, stddev: Double)

  object WelfordAggregator extends Aggregator[Double, MeanVar, MeanStd] {
    override def zero: MeanVar = MeanVar(0L, 0.0, 0.0)

    override def reduce(s: MeanVar, x: Double): MeanVar = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MeanVar(n, mean, s.m2 + d * (x - mean))
    }

    override def merge(a: MeanVar, b: MeanVar): MeanVar = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MeanVar(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }

    override def finish(s: MeanVar): MeanStd =
      MeanStd(s.mean,
        if (s.n < 2) 0.0 else math.sqrt(s.m2 / (s.n - 1)))

    override def bufferEncoder: Encoder[MeanVar] = Encoders.product[MeanVar]
    override def outputEncoder: Encoder[MeanStd] = Encoders.product[MeanStd]
  }

  /** Column form: `welford(col)` → struct(mean, stddev). */
  def welford(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(WelfordAggregator).apply(c)

  /** Mergeable count-min sketch aggregate over a key column — the
    * frequency twin of the a13 HLL cardinality sketch: sublinear state
    * (depth × width counters), map-side partial aggregation, and LINEAR
    * merge (counter-wise sum), so per-partition/per-day sketches compose
    * exactly. Point lookups via [[readCountMin]] never undercount and
    * overcount by ≤ eps·N with probability ≥ confidence. Seed fixed →
    * bit-identical sketches across runs. */
  def countMinSketchAgg(c: org.apache.spark.sql.Column, eps: Double = 1e-4,
                        confidence: Double = 0.99, seed: Int = 42): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{count_min_sketch, lit}
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))
  }

  /** Deserialize a [[countMinSketchAgg]] result for driver/executor-side
    * probes (`estimateCount`) and merges (`mergeInPlace`). */
  def readCountMin(bytes: Array[Byte]): org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  /** UNION aggregate over serialized count-min sketches — the missing
    * piece that makes [[countMinSketchAgg]] partials PERSISTABLE (Spark
    * ships `count_min_sketch` but no `cms_union_agg` twin of
    * `hll_union_agg`): CMS counters are plain integers under the same
    * (depth, width, seed), so union is counter-wise ADDITION and a merge
    * of per-partition sketches is EXACTLY the sketch of the concatenated
    * input — estimates from merged-at-rest partials equal the
    * direct-over-everything sketch bit-for-bit (unlike HLL union's
    * mode-promotion drift, k8). Empty inputs fold to an empty byte array.
    * Requires every input sketch to share params — `mergeInPlace` throws
    * `IncompatibleMergeException` otherwise (fail loud, never mis-add). */
  object CountMinUnionAggregator
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    private def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val ca = readCountMin(a)
        ca.mergeInPlace(readCountMin(b))
        val bos = new java.io.ByteArrayOutputStream()
        ca.writeTo(bos)
        bos.toByteArray
      }
    override def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      union(buf, Option(in).getOrElse(Array.emptyByteArray))
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union(a, b)
    override def finish(s: Array[Byte]): Array[Byte] = s
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: `countMinUnion(sketchCol)` → merged sketch binary. */
  def countMinUnion(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(CountMinUnionAggregator).apply(c)

  /** Robust (median/MAD) outlier flagging per group — the heavy-tail-safe
    * twin of the z-score screen (w11): mean/stddev move with the outliers
    * they're supposed to find; the median and the median absolute
    * deviation don't. Flags rows with |x − median| > k · 1.4826 · MAD
    * (1.4826 scales MAD to σ under normality, so `k` reads like a z
    * threshold). Adds `med`, `mad`, `robust_z` (null when MAD = 0 — a
    * constant-majority group has no robust scale) and `is_outlier`.
    *
    * Shape: two grouped EXACT median passes + two broadcast joins of the
    * tiny per-group stat tables — the fact side never shuffles. The
    * median form is ROUTED by group count (the packSequencesAuto /
    * d5 discipline, via a LocalLimit-bounded distinct probe): with many
    * groups the built-in `percentile` aggregate parallelizes across
    * reducers and is right; with FEW HUGE groups that same aggregate
    * merges each group's whole value→count map on the one reducer owning
    * it (sf10 campaign: 3 return-flag groups over 60 M rows = all the
    * work on 3 tasks), so the few-group regime takes
    * [[exactQuantilesByGroup]]'s sort+rank form — bit-identical values.
    * One semantic corner on the few-group path: a group whose values are
    * ALL null is dropped rather than emitted with null med/mad.
    */
  def robustOutliers(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                     valueCol: String, k: Double = 3.0,
                     groupThreshold: Int = 64): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val gcols = groupCols.map(col)
    val fewGroups = df.select(gcols: _*).distinct()
      .limit(groupThreshold + 1).count() <= groupThreshold
    def groupedMedian(src: org.apache.spark.sql.DataFrame, vCol: org.apache.spark.sql.Column,
                      outName: String) =
      if (fewGroups)
        // helper materializes its ≤ groupThreshold rows as a literal
        // frame, so the nested med→mad→output lineage never replays the
        // sort+zip subtree (bounded driver traffic)
        exactQuantilesByGroup(src.select(gcols :+ vCol.as("__mv"): _*),
          "__mv", groupCols, Seq(outName -> 0.5))
      else src.groupBy(gcols: _*).agg(percentile(vCol, lit(0.5)).as(outName))
    val med = groupedMedian(df, col(valueCol), "med")
    val withMed = df.join(broadcast(med), groupCols)
    val mad = groupedMedian(withMed, abs(col(valueCol) - col("med")), "mad")
    withMed.join(broadcast(mad), groupCols)
      .withColumn("robust_z",
        when(col("mad") === 0, lit(null).cast("double"))
          .otherwise(abs(col(valueCol) - col("med")) / (lit(1.4826) * col("mad"))))
      .withColumn("is_outlier", coalesce(col("robust_z") > k, lit(false)))
  }

  /** Population Stability Index per category — the drift monitor a
    * production data pipeline runs between a reference corpus snapshot
    * and each new candidate batch (per-language mix shift, source-domain
    * shift, quality-bucket shift): PSI = Σ_cat (p_cand − p_ref) ·
    * ln(p_cand / p_ref), with the conventional reading ≤ 0.1 stable /
    * 0.1–0.25 drifting / > 0.25 shifted. Returns one row per category in
    * either side — `(cat, n_ref, n_cand, share_ref, share_cand,
    * psi_contrib)` — so the report attributes the total to categories;
    * sum `psi_contrib` for the headline number.
    *
    * Additive smoothing (`smooth`, default 0.5 — Jeffreys) keeps the log
    * finite when a category appears on only one side: shares are
    * (n + smooth) / (N + smooth·K) over the K categories of the UNION.
    * Shape: two map-side-combined groupBys collapse both corpora to
    * K-row tables; the join and share arithmetic run on K rows. Nothing
    * here ever shuffles the fact tables beyond the two aggregates.
    */
  /** Fixed-grid histogram PARTIALS — the exactly-mergeable quantile
    * sketch for persisted warehouse partitions. Each partition (month,
    * tenant, …) stores `(partCol, bin, bin_n)` rows over a grid FIXED a
    * priori (`[lo, hi)` split into `nBins` equal bins); because the grid
    * never depends on the data, partials from any set of partitions —
    * including ones written months apart — merge by integer addition
    * alone (`sum(bin_n)` per bin), so "p99 over an arbitrary date range"
    * is a merge of tiny persisted tables, never a rescan of the fact
    * table. This is the quantile sibling of the HLL partials (k8): HLL
    * covers distinct counts, this covers percentiles, both with O(grid)
    * state per partition regardless of row count. Values outside the
    * grid clamp into the edge bins (the deterministic-error contract in
    * [[histogramQuantiles]] holds only for in-range data — size the grid
    * from domain knowledge, not from the data).
    *
    * Shape: one projection + one map-side-combined groupBy; output is
    * ≤ nBins rows per partition value.
    */
  def histogramPartials(df: org.apache.spark.sql.DataFrame, valueCol: String,
                        partCol: String, lo: Double, hi: Double,
                        nBins: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(nBins > 0 && hi > lo, "need a non-empty grid")
    val width = (hi - lo) / nBins
    df.select(col(partCol),
        least(greatest(floor((col(valueCol) - lo) / width), lit(0)),
          lit(nBins - 1L)).cast("int").as("bin"))
      .groupBy(col(partCol), col("bin"))
      .agg(count(lit(1)).as("bin_n"))
  }

  /** Quantile estimates from merged [[histogramPartials]], with a
    * PROVABLE per-estimate error bound. For each requested fraction `p`
    * the continuous quantile (percentile_cont semantics: interpolated at
    * rank `p·(n−1)`, 0-indexed) lies between the order statistics at
    * 1-indexed ranks `k = ⌊p·(n−1)⌋+1` and `k+1`; those two values fall
    * in the first bins whose cumulative counts reach `k` and `k+1`
    * (`b1 ≤ b2`), so the true quantile is inside
    * `[lo + b1·w, lo + (b2+1)·w]`. The estimate is the midpoint of that
    * interval and `err_bound = (b2 − b1 + 1)·w/2` is a hard guarantee,
    * not a statistical one — `|est − quantile_cont(p)| ≤ err_bound`
    * always (for in-grid data). Returns one row per p:
    * `(p, est, err_bound)`.
    *
    * Shape: merge = one groupBy over ≤ nBins·P rows; the rank scan is a
    * window over the ≤ nBins merged rows (partitionBy(lit(0)) — bounded
    * by the FIXED grid size, so the single partition is a constant-size
    * table at any data scale, not a data-sized collapse).
    */
  def histogramQuantiles(partials: org.apache.spark.sql.DataFrame,
                         ps: Seq[Double], lo: Double, hi: Double,
                         nBins: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "p in [0,1]")
    val width = (hi - lo) / nBins
    val merged = partials.groupBy(col("bin")).agg(sum(col("bin_n")).as("n"))
    val one = graft.operators.Relational.onePartKey(col("bin"))
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(one).orderBy(col("bin"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(one)
    val cum = merged
      .withColumn("cum", sum(col("n")).over(w0))
      .withColumn("total", sum(col("n")).over(wAll))
    val aggCols = ps.zipWithIndex.flatMap { case (p, i) =>
      val k = floor(lit(p) * (col("total") - 1)) + 1
      Seq(
        min(when(col("cum") >= k, col("bin"))).as(s"__b1_$i"),
        min(when(col("cum") >= least(k + 1, col("total")), col("bin")))
          .as(s"__b2_$i"))
    }
    cum.agg(aggCols.head, aggCols.drop(1): _*)
      .select(explode(array(ps.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("p"), col(s"__b1_$i").as("b1"),
          col(s"__b2_$i").as("b2"))
      }: _*)).as("q"))
      .select(col("q.p").as("p"),
        (lit(lo) + (col("q.b1") + col("q.b2") + 1) * lit(width) / 2)
          .as("est"),
        ((col("q.b2") - col("q.b1") + 1) * lit(width) / 2).as("err_bound"))
  }

  def psiByCategory(ref: org.apache.spark.sql.DataFrame,
                    cand: org.apache.spark.sql.DataFrame,
                    catCol: String, smooth: Double = 0.5): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(smooth > 0, "smoothing must be positive (zero reintroduces ln(0))")
    val r = ref.groupBy(col(catCol)).agg(count(lit(1)).as("n_ref"))
      .withColumnRenamed(catCol, "__rc")
    val c = cand.groupBy(col(catCol)).agg(count(lit(1)).as("n_cand"))
      .withColumnRenamed(catCol, "__cc")
    // NULL-SAFE join key (<=>): a NULL category present on both sides must
    // be ONE matched row, not two one-sided rows each reporting the other
    // side absent — a plain full-outer equi-join never matches NULLs and
    // would report heavy two-way drift for an identical NULL-share mix.
    // Materialize the K-row table ONCE: it is referenced twice below
    // (output rows + totals), and without truncation each reference
    // re-aggregates BOTH corpora — 4 full scans instead of 2.
    val joined = Ckpt.materialize(
      r.join(c, col("__rc") <=> col("__cc"), "full")
        .select(coalesce(col("__rc"), col("__cc")).as(catCol),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand")))
    val totals = joined.agg(sum("n_ref").as("__tr"), sum("n_cand").as("__tc"),
      count(lit(1)).as("__k"))
    val sm = lit(smooth)
    joined.crossJoin(broadcast(totals))
      .withColumn("share_ref", (col("n_ref") + sm) / (col("__tr") + sm * col("__k")))
      .withColumn("share_cand", (col("n_cand") + sm) / (col("__tc") + sm * col("__k")))
      .withColumn("psi_contrib",
        (col("share_cand") - col("share_ref")) * log(col("share_cand") / col("share_ref")))
      .drop("__tr", "__tc", "__k")
  }

  /** MERGEABLE heavy-hitter partials (round 12 — the fourth member of
    * the persisted-sketch family after k8 HLL, k11 quantile grids, k12
    * count-min): per period, the EXACT per-key counts pruned to keys
    * whose count strictly exceeds N_period/k. Pigeonhole bounds both
    * directions deterministically — a pruned key contributed at most
    * ⌊N_p/k⌋ per period, so for any key the merged estimate satisfies
    * `est ≤ true ≤ est + Σ_p ⌊N_p/k⌋`, and any key with true total
    * above that Σ bound must surface in at least one period's summary
    * (if it were below threshold everywhere its total could not exceed
    * the bound). Space: a period's summary holds FEWER THAN k keys
    * (each kept key owns > N_p/k of N_p rows), independent of key
    * cardinality — the property that lets 100 TB of per-period facts
    * compact to k-row partials mergeable for any date range. Unlike
    * Misra–Gries/SpaceSaving, the summary is a pure function of the
    * period's multiset — no stream-order dependence, so rebuilds and
    * engine recomputes (the DuckDB oracle) are bit-identical.
    * Output: (partCol, key, cnt) — write through the K1 sink
    * partitioned by `partCol`; `n_rows` per period goes in a stats
    * table like k11's. */
  def heavyHitterPartials(df: org.apache.spark.sql.DataFrame, keyCol: String,
                          partCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k > 1, "k must be > 1")
    val per = df.groupBy(col(partCol), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
    // N_p comes from the per-key counts themselves (Σ cnt per period) —
    // a (periods × keys)-sized re-aggregate, NOT a second corpus scan;
    // the threshold join is broadcast-sized (one row per period).
    // The join is NULL-SAFE (<=>): a NULL period is a legal group for the
    // groupBy above, and an equi-join would silently drop every one of its
    // keys — violating the pigeonhole completeness envelope for callers
    // whose stats table still counts that period's rows (round-12 ADVICE).
    val n = per.groupBy(col(partCol)).agg(sum(col("cnt")).as("__n"))
      .withColumnRenamed(partCol, "__p")
    per.join(broadcast(n), col(partCol) <=> col("__p"))
      .filter(col("cnt") * k > col("__n"))
      .select(col(partCol), col(keyCol), col("cnt"))
  }

  /** Merge persisted heavy-hitter partials over any period subset: per
    * key, `est` = the sum of its kept per-period counts (a LOWER bound
    * on the true total) and `err_bound` = Σ over the selected periods
    * of ⌊N_p/k⌋ (the most the pruning could have hidden). Deterministic:
    * both columns are integer arithmetic over exact counts. */
  def heavyHittersMerged(partials: org.apache.spark.sql.DataFrame,
                         periodRows: org.apache.spark.sql.DataFrame,
                         keyCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val bound = periodRows.agg(
      sum(floor(col("n_rows") / k)).cast("long").as("err_bound"))
    partials.groupBy(col(keyCol)).agg(sum(col("cnt")).as("est"))
      .crossJoin(broadcast(bound))
  }

  /** EXACT continuous quantiles (Spark `percentile` / SQL
    * `percentile_cont` semantics: linear interpolation at 0-indexed rank
    * `p·(n−1)`) computed SCALABLY — a distributed range-partitioned sort
    * plus rank arithmetic touching only the ≤ 2·|ps| order statistics the
    * interpolation needs. The built-in exact `percentile` aggregate
    * instead buffers a value→count OpenHashMap and merges every map-side
    * partial on the ONE reducer of the final (single-group) aggregate —
    * O(distinct values) memory and single-threaded merge time on one
    * task, which is exactly the shape that cannot survive a 100× scale-up
    * (sf10 campaign: three such aggregates over 15 M near-all-distinct
    * `o_totalprice` values put 180 s of the k11 gate on one core; this
    * form is a parallel sort + two jobs). Ties need no tie-break key: the
    * k-th order statistic is a pure function of the value MULTISET, so
    * the result is deterministic (and retry-safe) even though tied rows
    * may swap ranks.
    *
    * Returns ONE row with a double column per `(name, p)` — null-valued
    * when the input is empty, matching the built-in aggregate. The
    * driver-side `count()` action is scalar-sized traffic (the rank
    * targets must be literals before the pick plan is built).
    *
    * Shape: one column-pruned count scan + one range sort (`orderBy`) +
    * `zipWithIndex` (per-partition offsets job) + a map-side-combined
    * 2·|ps|-row aggregate. No stage ever holds more than a partition of
    * values.
    */
  def exactQuantiles(df: org.apache.spark.sql.DataFrame, valueCol: String,
                     ps: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      "fractions must be in [0,1]")
    val spark = df.sparkSession
    val vals = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val n = vals.count()
    if (n == 0L)
      return spark.range(1).select(ps.map { case (name, _) =>
        lit(null).cast("double").as(name) }: _*)
    // persist across zipWithIndex's eager offsets job and the collect
    // below — without it the range sort executes twice (see zipRowIds)
    val sorted = vals.orderBy(col("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = graft.operators.Relational.zipRowIds(sorted, "__rk")
    // 1-indexed bracketing ranks + interpolation fraction per p
    val specs = ps.map { case (name, p) =>
      val r = p * (n - 1) // 0-indexed continuous rank
      val k1 = math.floor(r).toLong + 1
      (name, k1, math.min(k1 + 1, n), r - math.floor(r))
    }
    val needed = specs.flatMap(s => Seq(s._2, s._3)).distinct
    val aggs = specs.zipWithIndex.flatMap { case ((_, k1, k2, _), i) =>
      Seq(min(when(col("__rk") === k1, col("__v"))).as(s"__lo_$i"),
          min(when(col("__rk") === k2, col("__v"))).as(s"__hi_$i"))
    }
    val result = ranked.filter(col("__rk").isin(needed: _*))
      .agg(aggs.head, aggs.drop(1): _*)
      // Bit-identical to the built-in aggregate's interpolation:
      // (1−frac)·lo + frac·hi with the equal-keys short-circuit
      // (Percentile.getPercentile) — NOT lo + frac·(hi−lo), which can
      // differ in the last ulp.
      .select(specs.zipWithIndex.map { case ((name, _, _, frac), i) =>
        when(col(s"__hi_$i") === col(s"__lo_$i"), col(s"__lo_$i"))
          .otherwise(lit(1.0 - frac) * col(s"__lo_$i") +
            lit(frac) * col(s"__hi_$i"))
          .as(name) }: _*)
    // Materialize the ONE result row as a literal local frame: consumers
    // invariably crossJoin(broadcast(...)) this against a fact table, and
    // a lazy result would replay the whole sort+zip subtree inside every
    // downstream action (zipWithIndex's offsets job already executes it
    // once eagerly). One row of doubles is scalar-sized driver traffic.
    val out = spark.createDataFrame(
      java.util.Arrays.asList(result.collect(): _*), result.schema)
    sorted.unpersist()
    out
  }

  /** Grouped [[exactQuantiles]]: exact interpolated quantiles PER GROUP,
    * one distributed sort for the whole frame. The built-in grouped
    * `percentile` puts each group's entire value→count map on the single
    * reducer owning that group — with FEW HUGE groups (the common fact-
    * table shape: 3 return flags over 60 M lineitem rows) that is 3 tasks
    * doing all the work while the cluster idles. Here the frame is sorted
    * ONCE by (groups…, value) — a range sort whose parallelism is
    * independent of the group count — and each group's local ranks are
    * recovered from global `zipWithIndex` ids minus per-group offsets,
    * where the offsets come from a cumulative sum over the GROUP-COUNT
    * frame (G rows, one tiny single-partition window — bounded by the
    * number of groups, not the data). Rank targets are per-group COLUMNS
    * (groups differ in size), so everything after the sort is ordinary
    * map-side-combinable expression work.
    *
    * Returns one row per group: groupCols ++ a double column per
    * `(name, p)` ++ (optionally) the group row count as `countCol`.
    * NULL group keys are legal groups (sorted nulls-first, matching the
    * cumsum window's default) — the null-planted corpora exercise this.
    * NULL values are ignored like the built-in aggregate; the one
    * semantic difference: a group whose values are ALL null is ABSENT
    * from the output (the filter precedes the groupBy), where the
    * built-in emits the group with a null quantile.
    *
    * With `materialize` (the default) the G result rows are collected
    * into a literal frame and the sort cache released — right whenever G
    * is group-sized small (the few-huge-groups regime this function
    * exists for); pass false for adversarially many groups to keep the
    * result lazy (downstream actions then replay the sort+zip subtree).
    */
  def exactQuantilesByGroup(df: org.apache.spark.sql.DataFrame,
                            valueCol: String, groupCols: Seq[String],
                            ps: Seq[(String, Double)],
                            countCol: Option[String] = None,
                            materialize: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(groupCols.nonEmpty, "use exactQuantiles for the global form")
    require(ps.nonEmpty && ps.forall { case (_, p) => p >= 0 && p <= 1 },
      "fractions must be in [0,1]")
    val gs = groupCols.map(col)
    val vals = df.select(gs :+ col(valueCol).cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
    // persist across zipWithIndex's eager offsets job, the counts pass,
    // and the final action — without it the range sort executes once per
    // pass (see zipRowIds); only worth holding when we materialize and
    // can release it before returning
    val sorted = vals.orderBy(gs :+ col("__v"): _*)
    val held = if (materialize)
      Some(sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    else None
    val ranked = graft.operators.Relational.zipRowIds(
      held.getOrElse(sorted), "__rk")
    // Per-group (offset, size) WITHOUT a second pass over the sorted
    // frame: group sizes from one groupBy count (reading the cache when
    // held); offsets = cumulative sum of sizes in group order (G-row
    // window, nulls-first like the sort above).
    val counts = held.getOrElse(vals).groupBy(gs: _*).agg(count(lit(1)).as("__n"))
    val one = graft.operators.Relational.onePartKey(col("__n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(one)
      .orderBy(groupCols.map(c => col(c).asc_nulls_first): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("__off", coalesce(sum(col("__n")).over(w), lit(0L)))
    val joinCond = groupCols.map(c => ranked(c) <=> offsets(c)).reduce(_ && _)
    val local = ranked.join(offsets, joinCond)
      .select(Seq(col("__v"), (col("__rk") - col("__off")).as("__lr"), col("__n")) ++
        groupCols.map(c => offsets(c).as(c)): _*)
    val specCols = ps.zipWithIndex.map { case ((_, p), i) =>
      val r = lit(p) * (col("__n") - 1) // 0-indexed continuous rank, per group
      val k1 = floor(r).cast("long") + 1
      (i, k1, least(k1 + 1, col("__n")), r - floor(r))
    }
    val aggs = specCols.flatMap { case (i, k1, k2, frac) =>
      Seq(min(when(col("__lr") === k1, col("__v"))).as(s"__lo_$i"),
          min(when(col("__lr") === k2, col("__v"))).as(s"__hi_$i"),
          max(frac).as(s"__fr_$i")) // per-group constant
    } ++ countCol.map(c => max(col("__n")).as(c)).toSeq
    val result = local.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.drop(1): _*)
      // Same bit-identical interpolation form as [[exactQuantiles]].
      .select(gs ++ ps.zipWithIndex.map { case ((name, _), i) =>
        when(col(s"__hi_$i") === col(s"__lo_$i"), col(s"__lo_$i"))
          .otherwise((lit(1.0) - col(s"__fr_$i")) * col(s"__lo_$i") +
            col(s"__fr_$i") * col(s"__hi_$i"))
          .as(name) } ++ countCol.map(col).toSeq: _*)
    held match {
      case Some(cached) =>
        val out = df.sparkSession.createDataFrame(
          java.util.Arrays.asList(result.collect(): _*), result.schema)
        cached.unpersist()
        out
      case None => result
    }
  }
}
