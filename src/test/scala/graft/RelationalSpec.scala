package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wide = Seq(
    ("m1", 1L, 10.0, 100.0),
    ("m2", 2L, 20.0, 200.0)).toDF("market", "day", "balance", "price")

  test("melt: row count = measures × wide rows, values preserved") {
    val long = Relational.melt(wide, Seq("market", "day"), Seq("balance", "price"))
    assert(long.count() == 4)
    val m1 = long.filter($"market" === "m1").orderBy("measure")
      .select($"measure", $"value").as[(String, Double)].collect().toSeq
    assert(m1 == Seq(("balance", 10.0), ("price", 100.0)))
  }

  test("pivotAgg: deterministic <value>_<agg> names, multi-agg") {
    val long = Seq(("u1", "AAVE", 5.0), ("u1", "AAVE", 7.0), ("u1", "USDC", 1.0))
      .toDF("user", "sym", "amt")
    val got = Relational.pivotAgg(long, Seq("user"), "sym", Seq("AAVE", "USDC"),
      Seq("sum" -> sum($"amt"), "avg" -> avg($"amt")))
    assert(got.columns.toSet == Set("user", "AAVE_sum", "AAVE_avg", "USDC_sum", "USDC_avg"))
    val r = got.head
    assert(r.getDouble(r.fieldIndex("AAVE_sum")) == 12.0)
    assert(r.getDouble(r.fieldIndex("AAVE_avg")) == 6.0)
  }

  test("pivotAgg: single agg also gets suffixed names") {
    val long = Seq(("u1", "AAVE", 5.0)).toDF("user", "sym", "amt")
    val got = Relational.pivotAgg(long, Seq("user"), "sym", Seq("AAVE", "USDC"),
      Seq("sum" -> sum($"amt")))
    assert(got.columns.toSet == Set("user", "AAVE_sum", "USDC_sum"))
  }

  test("ffill carries last non-null forward within partition only") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None),
      ("b", 1, None), ("b", 2, Some(5.0))).toDF("k", "t", "v")
    val got = Relational.ffill(df, Seq("k"), Seq("t"), Seq("v"))
      .orderBy("k", "t").select($"v").collect().map(r => Option(r.get(0)))
    assert(got.toSeq == Seq(Some(10.0), Some(10.0), Some(10.0), None, Some(5.0)))
  }

  test("dedupKeepLast keeps the row with max order key per group") {
    val df = Seq(("k1", 1, "old"), ("k1", 3, "new"), ("k1", 2, "mid"), ("k2", 1, "only"))
      .toDF("k", "seq", "tag")
    val got = Relational.dedupKeepLast(df, Seq("k"), Seq("seq"))
      .orderBy("k").select($"tag").as[String].collect().toSeq
    assert(got == Seq("new", "only"))
  }

  test("unionPadded pads missing columns with the literal") {
    val a = Seq((1L, 2.0)).toDF("id", "x")
    val b = Seq((2L, 3.0)).toDF("id", "y")
    val got = Relational.unionPadded(Seq(a, b))
    assert(got.columns.toSeq == Seq("id", "x", "y"))
    val rows = got.orderBy("id").collect()
    assert(rows(0).getDouble(2) == 0.0 && rows(1).getDouble(1) == 0.0)
  }

  test("saltedJoin matches the plain join on a skewed key distribution") {
    // 90% of rows share one key — the classic straggler shape
    val big = (1L to 1000L).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("key", "id")
    val small = Seq(("hot", 1.0), ("k950", 2.0), ("nomatch", 3.0)).toDF("key", "w")
    val plain = big.join(small, Seq("key"), "inner")
    val salted = Relational.saltedJoin(big, small, Seq("key"), "id", nSalts = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    // left join keeps unmatched big rows exactly once despite the explode
    val saltedLeft = Relational.saltedJoin(big, small, Seq("key"), "id", 8, "left")
    assert(saltedLeft.count() == 1000L)
    // right/full outer would emit each unmatched small-side row once per
    // salt copy — rejected up front
    for (jt <- Seq("right", "full_outer", "full"))
      assertThrows[IllegalArgumentException](
        Relational.saltedJoin(big, small, Seq("key"), "id", 8, jt))
  }

  test("latestOnly keeps all rows tied at the max") {
    val df = Seq((1, "a"), (3, "b"), (3, "c")).toDF("ts", "v")
    val got = Relational.latestOnly(df, "ts").select($"v").as[String].collect().toSet
    assert(got == Set("b", "c"))
  }

  test("latestOnly plans as partial-agg + broadcast, never a global window") {
    // A Window.partitionBy() max would funnel EVERY row through one
    // partition — the 100 TB anti-pattern this operator must avoid.
    val df = Seq((1, "a"), (3, "b"), (3, "c")).toDF("ts", "v")
    val plan = Relational.latestOnly(df, "ts").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("safeDiv guards division by zero") {
    val got = Seq((1.0, 0.0), (6.0, 2.0)).toDF("x", "y")
      .select(Relational.safeDiv($"x", $"y")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 3.0))
  }

  test("upsert: update wins on key match, inserts new keys, keeps the rest") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "v")
    val updates = Seq((2L, "U", 99.0), (4L, "N", 40.0)).toDF("k", "status", "v")
    val got = Relational.upsert(base, updates, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(1L -> ("a", 10.0), 2L -> ("U", 99.0),
                      3L -> ("c", 30.0), 4L -> ("N", 40.0)))
  }

  test("applyCdc: latest change wins, deletes remove, inserts land, rest pass") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "v")
    val changes = Seq(
      // key 1: update then DELETE (delete is latest -> row removed)
      (1L, "x", 11.0, "U", 1L), (1L, "x", 12.0, "D", 2L),
      // key 2: two updates -> highest seq wins
      (2L, "u1", 21.0, "U", 1L), (2L, "u2", 22.0, "U", 5L),
      // key 4: delete then INSERT (insert is latest -> row lands)
      (4L, "n", 40.0, "D", 1L), (4L, "n", 41.0, "I", 3L))
      .toDF("k", "status", "v", "op", "seq")
    val got = Relational.applyCdc(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(2L -> ("u2", 22.0), 3L -> ("c", 30.0), 4L -> ("n", 41.0)))
  }

  test("applyCdc: a null op is an upsert, not a silent delete") {
    val base = Seq((1L, "a", 10.0)).toDF("k", "status", "v")
    val changes = Seq((1L, "x", 11.0, null.asInstanceOf[String], 1L),
                      (2L, "y", 20.0, null.asInstanceOf[String], 1L))
      .toDF("k", "status", "v", "op", "seq")
    val got = Relational.applyCdc(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(1L -> ("x", 11.0), 2L -> ("y", 20.0)))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.Sinks

  test("writeBucketed: co-located join plans with NO shuffle on either side") {
    val ords = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val cust = Tables.t(spark, sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name")
    Sinks.writeBucketed(ords, "b_orders", Seq("o_custkey"), 4)
    Sinks.writeBucketed(cust, "b_cust", Seq("o_custkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // bucket layout satisfies the join
      val want = ords.join(cust, "o_custkey").count()
      assert(j.count() == want && want > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeRowGroupBounded: bounded row groups vs the one-giant-group default") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dirB = java.nio.file.Files.createTempDirectory("graft_rgb").toString
    val dirD = java.nio.file.Files.createTempDirectory("graft_rgd").toString
    // ~12 MB uncompressed in ONE file: the layout the skew audit showed
    // blinds AQE's skew splitter (all rows in one row group => byte-range
    // map splits carry no cut points)
    val big = spark.range(0L, 300000L).select($"id",
      concat(lit("payload_"), md5($"id".cast("string"))).as("s")).coalesce(1)
    Sinks.writeRowGroupBounded(big, dirB, rowGroupBytes = 1L * 1024 * 1024)
    big.write.mode("overwrite").parquet(dirD)
    def groupsPerFile(dir: String): Seq[Int] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles.toSeq
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try r.getFooter.getBlocks.size finally r.close()
        }
    }
    assert(groupsPerFile(dirD).forall(_ == 1),
      "default 128 MB block size leaves this file as one giant row group")
    assert(groupsPerFile(dirB).exists(_ >= 4),
      "bounded write must split the same data into many row groups")
    assert(spark.read.parquet(dirB).count() == 300000L, "rows intact")
  }

  test("compactTo: many small files collapse to one per partition, rows intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    // simulate an append-only feed: 12 tiny appends across 2 partitions
    (1 to 12).foreach { i =>
      Seq((s"2024-01-0${i % 2 + 1}", i.toLong, i * 1.5)).toDF("date", "id", "v")
        .write.mode("append").partitionBy("date").parquet(src)
    }
    def dataFiles(p: String): Int = {
      val d = new java.io.File(p)
      if (!d.exists) 0
      else d.listFiles.map { f =>
        if (f.isDirectory) dataFiles(f.getPath)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      }.sum
    }
    assert(dataFiles(src) >= 12, "setup produced small files")
    Sinks.compactTo(spark, src, dst, Seq("date"))
    assert(dataFiles(dst) == 2, "one file per partition after compaction")
    val a = spark.read.parquet(src).orderBy("id").collect().toSeq
    val b = spark.read.parquet(dst).orderBy("id").collect().toSeq
    assert(a == b, "compaction preserves every row")
  }

  test("writeRangeSorted: per-file key ranges are disjoint and rows sorted in-file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rangesort").toString
    val li = Tables.t(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
    Sinks.writeRangeSorted(li, dir, Seq("l_orderkey"), nRanges = 5)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"l_orderkey").as("lo"), max($"l_orderkey").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(perFile.length >= 2, "range write should produce multiple files")
    // disjoint [lo, hi] intervals across files => parquet min/max stats can
    // prune whole files for any range/point predicate on the sort key
    val sorted = perFile.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2, s"overlapping ranges: $a vs $b")
      case _           =>
    }
    assert(spark.read.parquet(dir).count() == li.count())
    // in-file ordering: rows of one file are ascending on the sort key
    val oneFile = sorted.head._1
    val rows = spark.read.parquet(dir)
      .filter(input_file_name() === oneFile)
      .select($"l_orderkey").collect().map(_.getLong(0))
    assert(rows.sameElements(rows.sorted), "rows inside a file must be sorted")
  }

  test("writeZOrdered: EVERY indexed dim gets bounded per-file extent (vs single-key sort)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val sortedDir = java.nio.file.Files.createTempDirectory("graft_zorder_ref").toString
    val li = Tables.t(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    def avgRanges(d: String): (Double, Double, Int) = {
      val g = spark.read.parquet(d)
        .groupBy(input_file_name().as("f"))
        .agg(min($"l_orderkey").as("ko"), max($"l_orderkey").as("khi"),
          min($"l_partkey").as("po"), max($"l_partkey").as("phi"))
        .collect()
      val (kLo, kHi) = (g.map(_.getLong(1)).min, g.map(_.getLong(2)).max)
      val (pLo, pHi) = (g.map(_.getLong(3)).min, g.map(_.getLong(4)).max)
      val ak = g.map(r => (r.getLong(2) - r.getLong(1)).toDouble / math.max(1L, kHi - kLo)).sum / g.length
      val ap = g.map(r => (r.getLong(4) - r.getLong(3)).toDouble / math.max(1L, pHi - pLo)).sum / g.length
      (ak, ap, g.length)
    }
    Sinks.writeZOrdered(li, dir, Seq("l_orderkey", "l_partkey"), nFiles = 16)
    Sinks.writeRangeSorted(li, sortedDir, Seq("l_orderkey"), nRanges = 16)
    val (zk, zp, zn) = avgRanges(dir)
    val (sk, sp, _) = avgRanges(sortedDir)
    info(f"z-order: key=$zk%.3f part=$zp%.3f files=$zn; keysort: key=$sk%.3f part=$sp%.3f")
    assert(spark.read.parquet(dir).count() == li.count(), "zorder write must preserve rows")
    // the z-order contract: BOTH dims bounded well below full extent
    assert(zk < 0.55 && zp < 0.55, f"z-order extents not bounded: $zk%.3f / $zp%.3f")
    // and the single-key layout demonstrably lacks it on the second dim
    assert(sp > 0.9, f"reference layout should span ~full partkey range, got $sp%.3f")
  }

  test("K1 dynamic partition overwrite only replaces incoming partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val day1 = Seq(("2024-01-01", "ethereum", 1.0), ("2024-01-01", "polygon", 2.0))
      .toDF("date", "market", "v")
    Sinks.overwritePartitions(day1, dir, Seq("date", "market"))
    // re-materialize ONLY the ethereum partition with a new value
    val patch = Seq(("2024-01-01", "ethereum", 9.0)).toDF("date", "market", "v")
    Sinks.overwritePartitions(patch, dir, Seq("date", "market"))
    val got = spark.read.parquet(dir).select($"market", $"v")
      .as[(String, Double)].collect().toMap
    assert(got == Map("ethereum" -> 9.0, "polygon" -> 2.0))
  }

  test("K2 append-only accumulates (dedup is downstream's job)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink2").toString
    val snap = Seq((1, 10.0)).toDF("fetch", "v")
    Sinks.appendOnly(snap, dir)
    Sinks.appendOnly(snap, dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("globalRowIds matches the single-partition row_number window") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(50).toDouble))
      .toDF("k", "v").repartition(7) // multiple input partitions
    val got = Relational.globalRowIds(df, Seq($"v".desc, $"k".asc))
      .select($"k", $"row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy($"v".desc, $"k".asc)
    val want = df.select($"k", row_number().over(w).cast("long").as("rn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("snapshotDiff classifies all four statuses with per-column attribution") {
    val before = Seq(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("id", "state", "v")
    val after = Seq(
      (1L, "A", 10.0),   // unchanged
      (2L, "Z", 20.0),   // changed: state only
      (3L, "C", 33.0),   // changed: v only
      (5L, "E", 50.0))   // added; 4 removed
      .toDF("id", "state", "v")
    val got = Relational.snapshotDiff(before, after, Seq("id"), Seq("state", "v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getBoolean(2)),
          if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
    assert(got(1L) == (("unchanged", None, None)))
    assert(got(2L) == (("changed", Some(true), Some(false))))
    assert(got(3L) == (("changed", Some(false), Some(true))))
    assert(got(4L) == (("removed", None, None)))
    assert(got(5L) == (("added", None, None)))
  }

  test("snapshotDiff: null compare values are null-safe (null vs null = unchanged)") {
    val before = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "state")
    val after = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "state")
    val got = Relational.snapshotDiff(before, after, Seq("id"), Seq("state"))
      .select($"id", $"diff_status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("scd2 collapses a change log into validity intervals") {
    // entity 1: A(t1) A(t2) B(t4) A(t5) -> three versions (A re-opens);
    // entity 2: single state, null-tracked attr counts as a change vs null
    val log = Seq(
      (1L, 1L, "A"), (1L, 2L, "A"), (1L, 4L, "B"), (1L, 5L, "A"),
      (2L, 3L, null.asInstanceOf[String])
    ).toDF("id", "ts", "state")
    val got = Relational.scd2(log, Seq("id"), Seq("ts"), Seq("state"))
      .select($"id", $"state", $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "A", 1L, 4L, false),
      (1L, "B", 4L, 5L, false),
      (1L, "A", 5L, -1L, true),
      (2L, null, 3L, -1L, true)))
  }
}
