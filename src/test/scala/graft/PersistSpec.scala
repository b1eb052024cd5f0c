package graft

import org.apache.spark.sql.functions._
import graft.functions.{Prune, Similarity}

/** Persistable index artifacts: trained IVF centroids, PQ codebooks and
  * bloom sketches survive a parquet round trip and probe IDENTICALLY to
  * their inline-trained twins (the reference persists every stage between
  * jobs; train-once / probe-many is the 100 TB posture). */
class PersistSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  test("IVF centroid table round-trips with hash-equal probe results") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 8, iters = 2)
    val path = tmp("ivf")
    cents.write.mode("overwrite").parquet(path)
    val inline = Similarity.topKIvf(
      Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
      "vec_id", "embedding", q, k = 5, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val loaded = Similarity.topKIvf(
      Similarity.ivfIndexWith(emb, "vec_id", "embedding", spark.read.parquet(path)),
      "vec_id", "embedding", q, k = 5, nLists = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == loaded)
  }

  test("PQ codebook table round-trips with hash-equal ADC results") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, k = 8, iters = 2)
    val path = tmp("pq")
    Similarity.pqBooksToDf(spark, books).write.mode("overwrite").parquet(path)
    val books2 = Similarity.pqBooksFromDf(spark.read.parquet(path))
    assert(books.length == books2.length)
    books.indices.foreach { s0 =>
      books(s0).indices.foreach { c =>
        assert(books(s0)(c).toSeq == books2(s0)(c).toSeq,
          s"codeword ($s0, $c) changed across the round trip")
      }
    }
    val inline = Similarity.pqTopKAdc(
      Similarity.pqEncode(emb, "vec_id", "embedding", books), "vec_id", q, books, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val loaded = Similarity.pqTopKAdc(
      Similarity.pqEncode(emb, "vec_id", "embedding", books2), "vec_id", q, books2, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inline == loaded)
  }

  test("bloom sketch round-trips with identical probe verdicts") {
    val hot = Tables.t(spark, sfDir, "customer").filter($"c_acctbal" > 9000)
      .select($"c_custkey")
    val bytes = Prune.bloomBytes(hot, $"c_custkey", nItems = 1000L, nBits = 16384L)
    val path = tmp("bloom")
    Prune.saveSketch(spark, path, bytes)
    val bytes2 = Prune.loadSketch(spark, path)
    assert(java.util.Arrays.equals(bytes, bytes2), "sketch bytes changed")
    val orders = Tables.t(spark, sfDir, "orders")
    val a = orders.filter(Prune.mightContain(lit(bytes), $"o_custkey"))
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val b = orders.filter(Prune.mightContain(lit(bytes2), $"o_custkey"))
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("knnGraphBlockedWith(saved centroids) == self-training knnGraphBlocked") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 8, iters = 2)
    val path = tmp("knn_cents")
    cents.write.mode("overwrite").parquet(path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"id", $"rank").collect().map(_.toSeq).toSeq
    val selfTrained = rows(Similarity.knnGraphBlocked(emb, "vec_id", "embedding",
      k = 3, nLists = 8, nProbe = 3, trainIters = 2))
    val loaded = rows(Similarity.knnGraphBlockedWith(emb, "vec_id", "embedding",
      k = 3, spark.read.parquet(path), nProbe = 3))
    assert(loaded == selfTrained)
  }

  test("s14 gate query: round-trip verdicts hold") {
    val row = SparkEntry.queries("s14_index_persist")(spark, sfDir).head()
    assert(row.getAs[Boolean]("ivf_roundtrip_ok"))
    assert(row.getAs[Boolean]("pq_roundtrip_ok"))
  }

  test("list_id-partitioned member table: probe-from-disk == in-memory and the scan is partition-pruned") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val path = tmp("member")
    Similarity.saveIvfMemberTable(emb, "vec_id", "embedding", cents, path)
    // on disk: one directory per list, nothing else
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("list_id=")).sorted.toSeq
    assert(dirs.nonEmpty && dirs.size <= 8, s"unexpected layout: $dirs")
    val fromDisk = Similarity.topKIvfPruned(spark.read.parquet(path),
      "vec_id", "embedding", q, cents, k = 5, nProbe = 3)
    val inMem = Similarity.topKIvfPruned(
      Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
      "vec_id", "embedding", q, cents, k = 5, nProbe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(fromDisk) == rows(inMem), "disk probe diverged from in-memory probe")
    // the Explain capture the round-9 verdict asked for: the list filter
    // must reach the scan as a PARTITION filter (file-listing pruning),
    // not a post-scan predicate
    val scan = fromDisk.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "list_id")),
      s"probe scan has no list_id partition filter: ${scan.partitionFilters}")
    val selected = scan.metadata.get("PartitionFilters")
    assert(selected.exists(_.contains("list_id")), s"PartitionFilters metadata: $selected")
    // and the pruning actually bit: the post-pruning listing holds <=
    // nProbe of the list directories (out of the 8 written)
    val touched = scan.selectedPartitions.partitionCount
    assert(touched <= 3, s"scan listed $touched list partitions, expected <= nProbe=3")
  }

  test("s16 gate query: pruned round-trip and recall verdicts hold") {
    val row = SparkEntry.queries("s16_member_table_probe")(spark, sfDir).head()
    assert(row.getAs[Boolean]("pruned_roundtrip_ok"))
    assert(row.getAs[Boolean]("recall_ok"))
  }

  test("bucket-partitioned BM25 postings: probe-from-disk == in-memory and the scan is partition-pruned") {
    import graft.functions.Text
    val docs = Tables.t(spark, sfDir, "documents")
    val qTerms = docs.filter($"doc_id" === 3)
      .select(Text.normalize($"text")).head().getString(0)
      .split(" ").filter(_.nonEmpty).distinct.toSeq
    val path = tmp("bm25")
    Text.saveBm25Index(docs, "text", "doc_id", path, nBuckets = 64)
    val dirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket=")).toSeq
    assert(dirs.nonEmpty && dirs.size <= 64, s"unexpected layout: $dirs")
    val fromDisk = Text.bm25TopKFromIndex(
      spark.read.parquet(s"$path/postings"), spark.read.parquet(s"$path/stats"),
      qTerms, k = 10)
    val inMem = Text.bm25TopK(docs, "text", "doc_id", qTerms, k = 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSeq
    assert(rows(fromDisk) == rows(inMem), "disk probe diverged from in-memory BM25")
    // the bucket filter must reach the scan as a PARTITION filter
    // (file-listing pruning), not a post-scan predicate. The probe plan
    // has exchanges (the tf/score aggregates), so AQE wraps it in an
    // AdaptiveSparkPlanExec LEAF — unwrap to the final physical plan
    // (resolved because rows() above already executed it).
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          leaves(r.child)
        case l => Seq(l)
      }
    val scan = leaves(fromDisk.queryExecution.executedPlan)
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "bucket")),
      s"probe scan has no bucket partition filter: ${scan.partitionFilters}")
    // pruning bit: at most |distinct query-term buckets| directories listed
    val touched = scan.selectedPartitions.partitionCount
    assert(touched <= qTerms.distinct.size,
      s"scan listed $touched bucket partitions for ${qTerms.distinct.size} terms")
  }

  test("IVF member-table maintenance: append is partition-aligned and base files survive; probe ≡ rebuild; tombstones vanish") {
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val base = emb.filter($"vec_id" % 3 =!= 2)
    val batch = emb.filter($"vec_id" % 3 === 2)
    val cents = Similarity.trainIvfCentroids(base, "vec_id", "embedding",
      nLists = 4, iters = 1)
    val path = tmp("ivfmaint")
    Similarity.saveIvfMemberTable(base, "vec_id", "embedding", cents, path)
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val before = files()
    Similarity.appendIvfMemberTable(batch, "vec_id", "embedding", cents, path)
    val after = files()
    // append adds files, never rewrites base files
    assert(before.subsetOf(after) && after.size > before.size,
      s"append rewrote base files: ${before.size} -> ${after.size}")
    // append ≡ rebuild (same centroids): the full member sets are equal
    val appended = spark.read.parquet(path)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect().toSet
    val rebuilt = Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"list_id").as[(Long, Int)].collect().toSet
    assert(appended == rebuilt, "appended member table != full rebuild")
    // tombstone anti-join: deleted ids never surface in a probe
    val tomb = emb.filter($"vec_id" % 7 === 1).select($"vec_id")
    val probed = Similarity.topKIvfPruned(
      spark.read.parquet(path).join(tomb, Seq("vec_id"), "left_anti"),
      "vec_id", "embedding", q, cents, k = 10, nProbe = 4)
      .select($"vec_id").as[Long].collect().toSet
    val tombIds = tomb.as[Long].collect().toSet
    assert(probed.nonEmpty && probed.intersect(tombIds).isEmpty,
      "tombstoned id surfaced in the probe")
    // gate verdicts hold
    val row = SparkEntry.queries("s17_ivf_maintenance")(spark, sfDir).head()
    assert(row.getAs[Boolean]("incremental_equals_rebuild"))
    assert(row.getAs[Boolean]("tombstones_absent"))
  }

  test("BM25 index maintenance: append is bucket-aligned and base files survive; tombstoned probe ≡ rebuild on survivors") {
    import graft.functions.Text
    val docs = Tables.t(spark, sfDir, "documents")
    val qTerms = docs.filter($"doc_id" === 3)
      .select(Text.normalize($"text")).head().getString(0)
      .split(" ").filter(_.nonEmpty).distinct.toSeq
    val base = docs.filter($"doc_id" % 3 =!= 2)
    val batch = docs.filter($"doc_id" % 3 === 2)
    val path = tmp("bm25maint")
    Text.saveBm25Index(base, "text", "doc_id", path, nBuckets = 32)
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/postings")).map(_.getPath)
        .filter(_.endsWith(".parquet")).toSet
    }
    val before = files()
    Text.appendBm25Index(batch, "text", "doc_id", path)
    val after = files()
    assert(before.subsetOf(after) && after.size > before.size,
      s"append rewrote base posting files: ${before.size} -> ${after.size}")
    // stats merged algebraically: N is exact, avgdl matches a full
    // recompute, and the persisted bucket modulus survives the append
    val st = spark.read.parquet(s"$path/stats")
      .select($"n_docs", $"avgdl", $"n_buckets").head()
    assert(st.getDouble(0) == docs.count().toDouble)
    val dlCol = org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.split(Text.normalize($"text"), " "),
        w => w =!= "")).cast("double")
    val fullAvg = docs.select(avg(dlCol)).head().getDouble(0)
    assert(math.abs(st.getDouble(1) - fullAvg) < 1e-9,
      s"merged avgdl ${st.getDouble(1)} != recomputed $fullAvg")
    assert(st.getInt(2) == 32)
    // tombstoned probe ≡ a fresh index over the survivors (exact stats
    // adjustment; scores compared to one rounding quantum)
    val tomb = docs.filter($"doc_id" % 7 === 1)
      .select($"doc_id", dlCol.as("dl"))
    val live = Text.bm25TopKFromIndex(
      spark.read.parquet(s"$path/postings"), spark.read.parquet(s"$path/stats"),
      qTerms, k = 10, tombstones = Some(tomb))
    val surv = docs.filter($"doc_id" % 7 =!= 1)
    val rebuilt = Text.bm25TopK(surv, "text", "doc_id", qTerms, k = 10)
    val lv = live.collect().map(r => r.getInt(3) -> (r.getLong(0), r.getDouble(1))).toMap
    val rb = rebuilt.collect().map(r => r.getInt(3) -> (r.getLong(0), r.getDouble(1))).toMap
    assert(lv.keySet == rb.keySet && lv.nonEmpty)
    lv.foreach { case (rk, (id, sc)) =>
      assert(rb(rk)._1 == id, s"rank $rk: doc $id != ${rb(rk)._1}")
      assert(math.abs(rb(rk)._2 - sc) <= 2e-6, s"rank $rk: score $sc != ${rb(rk)._2}")
    }
    val tombIds = tomb.select($"doc_id").as[Long].collect().toSet
    assert(lv.values.map(_._1).toSet.intersect(tombIds).isEmpty,
      "tombstoned doc surfaced in the probe")
  }

  test("bm25 tombstones: duplicate rows dedup'd, full-corpus tombstoning raises (round-12 ADVICE)") {
    import graft.functions.Text
    val docs = Seq((1L, "spark shuffles data"), (2L, "spark joins tables"),
      (3L, "ducks swim fast"), (4L, "spark caches frames"))
      .toDF("doc_id", "text")
    val path = tmp("bm25tombguard")
    Text.saveBm25Index(docs, "text", "doc_id", path, nBuckets = 8)
    val postings = spark.read.parquet(s"$path/postings")
    val stats = spark.read.parquet(s"$path/stats")
    val tombOnce = Seq((3L, 3.0)).toDF("doc_id", "dl")
    // a CDC feed can redeliver the same delete: the duplicated tombstone
    // must not double-subtract dl / over-decrement N
    val tombDup = tombOnce.union(tombOnce).union(tombOnce)
    def scores(t: org.apache.spark.sql.DataFrame) =
      Text.bm25TopKFromIndex(postings, stats, Seq("spark"), k = 10,
          tombstones = Some(t))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(scores(tombOnce) == scores(tombDup))
    // tombstoning every doc: loud in-plan failure, not null scores
    val tombAll = docs.select($"doc_id",
      lit(3.0).as("dl")).union(tombOnce)
    val ex = intercept[Exception] { scores(tombAll) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("tombstones cover the whole corpus")),
      msgs(ex).mkString("|"))
  }

  test("t28 gate query: maintained index ≡ rebuild on survivors; tombstones absent") {
    val rows = SparkEntry.queries("t28_bm25_maintenance")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("maintained_equals_rebuild")))
    assert(rows.forall(_.getAs[Boolean]("tombstones_absent")))
  }

  test("s19 at-rest composition: partition filters on BOTH the postings and member scans; verdicts hold") {
    import graft.functions.{Similarity, Text}
    val docs = Tables.t(spark, sfDir, "documents")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val qTerms = docs.filter($"doc_id" === 3)
      .select(Text.normalize($"text")).head().getString(0)
      .split(" ").filter(_.nonEmpty).distinct.toSeq
    val qVec = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val path = tmp("s19compose")
    Text.saveBm25Index(docs, "text", "doc_id", s"$path/bm25", nBuckets = 64)
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    Similarity.saveIvfMemberTable(emb, "vec_id", "embedding", cents, s"$path/ivf")
    val lexD = Text.bm25TopKFromIndex(
      spark.read.parquet(s"$path/bm25/postings"),
      spark.read.parquet(s"$path/bm25/stats"), qTerms, k = 10)
    val vecD = Similarity.topKIvfPruned(spark.read.parquet(s"$path/ivf"),
        "vec_id", "embedding", qVec, cents, k = 10, nProbe = 3)
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
          .orderBy($"cosine".desc, $"vec_id".asc)).cast("int"))
      .withColumnRenamed("vec_id", "doc_id")
    val fused = Similarity.rrfFuse(lexD, vecD, "doc_id", k = 10)
    assert(fused.count() > 0)
    // ONE executed plan, partition filters on BOTH at-rest scans
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves().flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          leaves(r.child)
        case l => Seq(l)
      }
    val scans = leaves(fused.queryExecution.executedPlan)
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    def pruned(colName: String, maxParts: Int): Unit = {
      val s = scans.filter(_.partitionFilters.exists(
        _.references.exists(_.name == colName)))
      assert(s.nonEmpty, s"no scan with a $colName partition filter (${scans.size} scans)")
      assert(s.forall(_.selectedPartitions.partitionCount <= maxParts),
        s"$colName scan listed ${s.map(_.selectedPartitions.partitionCount)} partitions")
    }
    pruned("bucket", qTerms.distinct.size)
    pruned("list_id", 3)
    // gate verdicts
    val rows = SparkEntry.queries("s19_atrest_retrieval")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("fused_roundtrip_ok")))
    assert(rows.forall(_.getAs[Boolean]("member_probe_roundtrip_ok")))
  }

  test("t26/t27 gate queries: ranked rows agree and the round-trip verdict holds") {
    val mem = SparkEntry.queries("t26_bm25_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSeq
    val disk = SparkEntry.queries("t27_bm25_index_probe")(spark, sfDir).collect()
    assert(disk.forall(_.getAs[Boolean]("roundtrip_ok")))
    assert(disk.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSeq == mem)
    assert(mem.map(_._4) == (1 to mem.size))
  }

  test("streamed IVF ingest: per-batch layout, probe pruned across batch dirs, batch replay idempotent, == batch build") {
    import graft.streaming.Streams
    val emb = Tables.t(spark, sfDir, "embeddings")
    val q = emb.filter($"vec_id" === 1)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val cents = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nLists = 8, iters = 1)
    val root = tmp("s20live")
    val src = s"$root/src"; val idx = s"$root/idx"; val ckpt = s"$root/ckpt"
    for (i <- 0 until 3)
      emb.filter($"vec_id" % 3 === i).coalesce(1)
        .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    Streams.runIvfAppendAvailableNow(
      Streams.parquetStream(spark, src, schema, maxFilesPerTrigger = 1),
      "vec_id", "embedding", cents, idx, ckpt)
    // layout: one batch_id dir per micro-batch, list_id dirs inside
    val bdirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(bdirs.size == 3, s"expected 3 batch dirs, got $bdirs")
    val inner = new java.io.File(s"$idx/${bdirs.head}").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("list_id="))
    assert(inner.nonEmpty, "no list_id dirs inside a batch dir")
    // streamed member assignment == single-shot batch build (exact)
    val live = spark.read.parquet(idx)
      .select($"vec_id", $"list_id".cast("int").as("list_id"))
    val built = Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents)
      .select($"vec_id", $"list_id")
    assert(live.count() == built.count() &&
      live.except(built).isEmpty && built.except(live).isEmpty,
      "streamed member table diverged from batch build")
    // crash-replay idempotence: re-materialize batch 1 (same rows, same
    // frozen centroids) exactly as the foreachBatch body would on replay
    // -> the member set must be unchanged (overwrite-own-partition)
    val b1ids = spark.read.parquet(idx).filter($"batch_id" === 1)
      .select($"vec_id")
    Similarity.ivfIndexWith(emb.join(b1ids, "vec_id"),
        "vec_id", "embedding", cents)
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$idx/batch_id=1")
    val replayed = spark.read.parquet(idx)
      .select($"vec_id", $"list_id".cast("int").as("list_id"))
    assert(replayed.count() == built.count() &&
      replayed.except(built).isEmpty, "batch replay changed the member set")
    // probe pruning bites ACROSS batch dirs: nProbe lists touched in each
    // of the 3 batch trees, never the full (3 x 8) partition matrix
    val probe = Similarity.topKIvfPruned(spark.read.parquet(idx),
      "vec_id", "embedding", q, cents, k = 5, nProbe = 3)
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in the probe plan"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "list_id")),
      s"probe scan has no list_id partition filter: ${scan.partitionFilters}")
    val touched = scan.selectedPartitions.partitionCount
    assert(touched <= 3 * 3, s"scan listed $touched partitions, expected <= 9")
    // and the probe result equals the in-memory probe
    val inMem = Similarity.topKIvfPruned(
      Similarity.ivfIndexWith(emb, "vec_id", "embedding", cents),
      "vec_id", "embedding", q, cents, k = 5, nProbe = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(probe) == rows(inMem), "streamed-index probe diverged")
  }
}
