package graft

import org.apache.spark.sql.SparkSession

/** Local smoke harness mirroring the driver's t1 check: run
  * `SparkEntry.entry` on sf0.001 and require rows > 0. Pass a query name
  * as args(0) to print that query's formatted physical plan instead
  * (plan-inspection loop for shuffle/pushdown tuning).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_CPUS makes `time` mode comparable to Bench (which
    // honors the same variable); every other mode keeps the light
    // 4-thread default.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_SPLIT_BYTES", "4194304"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // ext mode: prove the config-driven extensions path resolves graft
    // functions with NO imperative registration (must be set before the
    // first session of the JVM is created)
    if (args.headOption.contains("ext"))
      builder.config("spark.sql.extensions", "graft.functions.GraftExtensions")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("ext")) {
      val c = spark.sql(
        "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
        .head().getDouble(0)
      println(s"[smoke] extensions cosine_sim=$c " +
        (if (math.abs(c - 1.0) < 1e-12) "OK" else "WRONG"))
      if (math.abs(c - 1.0) >= 1e-12) { spark.stop(); sys.exit(1) }
    } else if (args.headOption.contains("stream")) {
      // Drive the streaming surface end-to-end: events flow through the
      // stateful latest-state operator and the foreachBatch upsert sink.
      import spark.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      import graft.streaming.{ChangeLogStream, RawEvent}
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft_smoke").toString + "/state"
      val in = MemoryStream[RawEvent]
      val q = in.toDF().writeStream
        .foreachBatch(ChangeLogStream.upsertBatch(dir, Seq("user_id"), "event_id") _)
        .outputMode(OutputMode.Append).start()
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      in.addData(RawEvent(1, t(1), 1, "signup", 10, "{}"), RawEvent(2, t(2), 2, "signup", 7, "{}"))
      q.processAllAvailable()
      in.addData(RawEvent(3, t(3), 1, "click", 30, "{}"))
      q.processAllAvailable()
      q.stop()
      val state = spark.read.parquet(dir).orderBy("user_id")
        .select("user_id", "event_id", "value").collect().toSeq
      val ok = state.map(_.getLong(1)) == Seq(3L, 2L)
      println(s"[smoke] stream upsert state=$state " + (if (ok) "OK" else "WRONG"))
      if (!ok) { spark.stop(); sys.exit(1) }
    } else if (args.headOption.contains("topo")) {
      // Config-driven consumer topology — the reference's config.yaml
      // deployment shape (/root/reference/README.md:64-88: one topic,
      // a publication naming the subscribed tables, one sink) wired
      // end-to-end from a CONFIG FILE, no code: a Kafka-shaped
      // directory feed (key/value binary — byte-identical to what
      // spark.read.format("kafka") delivers), the publication filter
      // on the key's "schema.table" prefix (the subscriber contract),
      // and the full production sink (dead-letter + late tee + routing
      // + carry-forward + tombstone retention) behind one checkpoint.
      // Usage: runMain graft.Smoke topo [config] — with no config a
      // default is generated and a demo feed synthesized from sf0.001.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      spark.sparkContext.setLogLevel("ERROR")
      // with no config argument, synthesize a demo feed + config FILE
      // and fall through to the one file-driven parse path below (a
      // generated run exercises exactly the code a user-config run does)
      val configPath: String = args.lift(1).getOrElse {
        val base = java.nio.file.Files
          .createTempDirectory("graft_topo").toString
        // demo feed: the sf0.001 changelog as Kafka-shaped bytes,
        // routed to three logical tables (t0/t1/t2 by user id) — t2
        // is deliberately NOT published, to prove the filter prunes
        val ev = sources.Tables.events(spark, "/root/testdata/sf0.001")
          .withColumn("event_type",
            when(col("event_id") % 11 === 0, lit("error"))
              .otherwise(col("event_type")))
        val env = pipeline.Envelope.toCdcEventsToast(ev).toDF()
        val uid = split(col("key"), ":").getItem(1).cast("long")
        val routed = env
          .withColumn("tableName", concat(lit("t"), pmod(uid, lit(3))))
          .withColumn("key",
            concat(lit("public."), col("tableName"), lit(":"), uid))
        routed.select(col("key").cast("binary").as("key"),
            to_json(struct(routed.columns.map(col): _*)).cast("binary")
              .as("value"))
          .write.parquet(s"$base/feed")
        val cfg = Seq(
          s"feed.dir: $base/feed",
          "publication.name: demo_pub",
          "publication.tables: public.t0,public.t1",
          s"sink.dir: $base/sink",
          s"checkpoint.dir: $base/ckpt",
          "late.delay_minutes: 10",
          "sink.buckets: 4")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$base/config.yaml"),
          cfg.mkString("", "\n", "\n").getBytes)
        println(s"[smoke] topo: generated config at $base/config.yaml")
        s"$base/config.yaml"
      }
      // the SAME library path TopologySpec gates: parse → run → census
      val cfg = streaming.Topology.parse(configPath)
      streaming.Topology.run(spark, cfg)
      val c = streaming.Topology.census(spark, cfg)
      c.states.foreach { st =>
        println(s"[smoke] topo state ${st.table}: live=${st.live} " +
          s"tombstones=${st.tombstones}")
      }
      // conservation over the published subset: every consumed message
      // is dead, late, or logged into a published table's store
      val ok = c.states.forall(_.live > 0) && c.conserved
      println(s"[smoke] topo consumed=${c.consumed} dead=${c.dead} " +
        s"late=${c.late} logged=${c.logged} " + (if (ok) "OK" else "WRONG"))
      if (!ok) { spark.stop(); sys.exit(1) }
    } else if (args.headOption.contains("sql")) {
      // ad-hoc SQL against the attached corpus: runMain graft.Smoke sql "<query>" [sfDir]
      if (args.length < 2) {
        System.err.println("usage: graft.Smoke sql \"<query>\" [sfDir]")
        spark.stop(); sys.exit(2)
      }
      val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      GraftSession.attach(spark, sfDir)
      spark.sql(args(1)).show(20, truncate = false)
    } else if (args.headOption.contains("show")) {
      // result inspection: runMain graft.Smoke show <query> [sfDir]
      if (args.length < 2) {
        System.err.println("usage: graft.Smoke show <query> [sfDir]")
        spark.stop(); sys.exit(2)
      }
      val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      SparkEntry.queries(args(1))(spark, sfDir).show(100, truncate = false)
    } else if (args.headOption.contains("reuse")) {
      // Cache-reuse pricer (r12 verdict, stretch #7): the dedup family's
      // shared-postings reuse was documented prose in SKILL.md; this
      // mode turns it into numbers. Run <target> COLD (fresh CachePool),
      // then again AFTER <warmers> have populated the family
      // intermediates, and report Spark JOB COUNTS + wall seconds for
      // both. Job counts are plan properties — the persisted
      // intermediate's build jobs disappear from the warm run — so the
      // job delta is deterministic where wall time is co-tenant noisy;
      // read the delta first, the seconds second.
      // usage: runMain graft.Smoke reuse <target> <w1>[,<w2>...] [sfDir]
      if (args.length < 3) {
        System.err.println(
          "usage: graft.Smoke reuse <target> <w1>[,<w2>...] [sfDir]")
        spark.stop(); sys.exit(2)
      }
      spark.sparkContext.setLogLevel("ERROR")
      val sfDir = if (args.length > 3) args(3)
        else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
      sources.Tables.lineitem(spark, sfDir).limit(1).collect() // JVM warmup
      def measured(name: String, tag: String): (Int, Double) = {
        spark.sparkContext.setJobGroup(tag, tag)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        // the status store is fed by the ASYNC listener bus — a fixed
        // sleep can undercount under load; poll until two consecutive
        // reads agree (bounded at 10 s)
        def jobCount = spark.sparkContext.statusTracker
          .getJobIdsForGroup(tag).length
        var (prev, cur, waited) = (-1, jobCount, 0L)
        while (prev != cur && waited < 10000L) {
          Thread.sleep(250); waited += 250
          prev = cur; cur = jobCount
        }
        (cur, t)
      }
      CachePool.releaseAll()
      val (jCold, tCold) = measured(args(1), "reuse_cold")
      CachePool.releaseAll()
      args(2).split(',').foreach(w =>
        SparkEntry.queries(w)(spark, sfDir).count())
      val (jWarm, tWarm) = measured(args(1), "reuse_warm")
      println(f"[smoke] reuse ${args(1)}%s cold: jobs=$jCold%d time=$tCold%.3f s")
      println(f"[smoke] reuse ${args(1)}%s warm after ${args(2)}%s: " +
        f"jobs=$jWarm%d time=$tWarm%.3f s")
      println(s"[smoke] reuse job-delta=${jCold - jWarm} " +
        (if (jWarm < jCold) "REUSE-CONFIRMED" else "NO-REUSE"))
      CachePool.releaseAll()
    } else if (args.headOption.contains("time")) {
      // Isolation timing: runMain graft.Smoke time <q1>[,<q2>...] [sfDir]
      // Bench-identical protocol (warmup, min of two passes, adaptive
      // third) over ONLY the named queries in the given order, sharing
      // the CachePool — the tool for settling bench-order cache
      // effects: time a query alone, then prefixed by its family
      // siblings, and diff. SPARK_GRAFT_CPUS matches Bench's core count.
      if (args.length < 2) {
        System.err.println("usage: graft.Smoke time <q1>[,<q2>...] [sfDir]")
        spark.stop(); sys.exit(2)
      }
      spark.sparkContext.setLogLevel("ERROR")
      val sfDir = if (args.length > 2) args(2)
        else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      spark.range(1 << 20).selectExpr("sum(id)", "count(distinct id % 7)").collect()
      sources.Tables.lineitem(spark, sfDir).limit(1).collect()
      // The SAME load-calibration micro-task Bench runs (pure codegen
      // range sum): printed before the set and after EVERY timed query
      // (r16 verdict #4 — a single global probe pair over-corrected
      // shuffle-bound queries: one ÷7 calib ratio tagged an unchanged
      // query `<-- LOOK` on raw times that matched the idle anchors),
      // so each query is bracketed by its own pair of probes and
      // check_bench.py scales it by the BRACKET's min — the same
      // window-local rule the bench's calib_fams families use. A
      // `Smoke time` transcript is a first-class comparison artifact.
      def calibPass(): Double = {
        val t0 = System.nanoTime()
        spark.range(1L << 24).selectExpr("sum(id * 3)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      calibPass(); calibPass() // JIT-warm the probe task itself (Bench's rule)
      println(f"[time] calib ${math.round(calibPass() * 1000)}%d ms (before)")
      args(1).split(',').foreach { name =>
        def pass(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val m2 = math.min(pass(), pass())
        val t = if (m2 > 1.5) math.min(m2, pass()) else m2
        println(f"[time] $name%-28s ${t}%.3f s")
        println(f"[time] calib ${math.round(calibPass() * 1000)}%d ms (after)")
      }
      CachePool.releaseAll()
    } else if (args.headOption.contains("plan")) {
      // Batch plan dump: runMain graft.Smoke plan <q1>[,<q2>...] <outDir> [sfDir]
      // — one file per query with the formatted physical plan (the
      // optimization-round evidence artifact: plans/rNN/<q>_{before,after}.txt).
      if (args.length < 3) {
        System.err.println("usage: graft.Smoke plan <q1>[,...] <outDir> [sfDir]")
        spark.stop(); sys.exit(2)
      }
      spark.sparkContext.setLogLevel("ERROR")
      val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
      val outDir = java.nio.file.Paths.get(args(2))
      java.nio.file.Files.createDirectories(outDir)
      args(1).split(',').foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
        println(s"[plan] $name -> $outDir/$name.txt")
      }
      CachePool.releaseAll()
    } else if (args.nonEmpty) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      SparkEntry.queries(args(0))(spark, sfDir).explain("formatted")
    } else {
      val n = SparkEntry.entry(spark).count()
      println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))
      if (n == 0) { spark.stop(); sys.exit(1) }
    }
    spark.stop()
  }
}
