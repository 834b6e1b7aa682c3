package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.{Fixtures, SparkSpec}

/** End-to-end pipeline runs: the reference's integration scenarios
  * driven through the JSON DSL → compiler → sinks, in both batch and
  * streaming modes (integration_test.go:113-168 basic fan-out,
  * 185-276 stateful s2s).
  */
class PipelineCompilerSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Streaming file sources watch a directory; write the lines as one
    * file inside `path/`.
    */
  private def writeLines(path: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, "data.txt"), lines.mkString("\n").getBytes("UTF-8"))
  }

  private def basicConfig(input: String): String =
    s"""{
       |  "eventFolder": "builtin",
       |  "rules": {
       |    "searchConversation": {"source": "fileInput", "plugin": "aRule", "sink": "memOut"},
       |    "lengthCheck": {"source": "fileInput", "plugin": "lengthRule", "sink": "memOut"}
       |  },
       |  "states": {},
       |  "sources": {"fileInput": {"type": "File", "path": "$input"}},
       |  "sinks": {"memOut": {"type": "Memory"}}
       |}""".stripMargin

  test("batch: two-rule fan-out over a line file (basic integration scenario)") {
    import spark.implicits._
    val dir = tmpDir("graft_basic")
    writeLines(s"$dir/input", Seq("a", "ab"))
    val compiled = PipelineCompiler.compile(spark, basicConfig(s"$dir/input")).toOption.get
    PipelineCompiler.runBatch(compiled)
    // aRule: a→true, ab→false; lengthRule: a→true, ab→false
    val out = spark.table("memOut").as[Boolean].collect().toSeq
    out.count(identity) shouldBe 2
    out.length shouldBe 4
  }

  test("streaming: same pipeline via readStream + AvailableNow") {
    import spark.implicits._
    val dir = tmpDir("graft_basic_stream")
    writeLines(s"$dir/input", Seq("a", "ab"))
    val compiled = PipelineCompiler
      .compile(spark, basicConfig(s"$dir/input").replace("memOut", "memStream"), streaming = true)
      .toOption
      .get
    val queries = PipelineCompiler.startStreaming(compiled, s"$dir/ckpt")
    queries.foreach(_.awaitTermination(60000))
    val out = spark.table("memStream").as[Boolean].collect().toSeq
    out.count(identity) shouldBe 2
    out.length shouldBe 4
  }

  test("streaming: a failed later sink start stops the queries that DID start") {
    val dir = tmpDir("graft_partial_start")
    writeLines(s"$dir/input", Seq("a", "ab"))
    val compiled = PipelineCompiler
      .compile(spark, basicConfig(s"$dir/input").replace("memOut", "aaGood"), streaming = true)
      .toOption
      .get
    val goodDf = compiled.sinks("aaGood")
    // hand-build a two-sink Compiled whose SECOND sink cannot start:
    // insertion order makes aaGood start first, then zzBad throws
    val cfg = compiled.config.copy(sinks =
      compiled.config.sinks + ("zzBad" -> SinkConfig("Bogus", None)))
    val twoSink = compiled.copy(
      sinks = scala.collection.immutable.ListMap("aaGood" -> goodDf, "zzBad" -> goodDf),
      config = cfg)
    val before = spark.streams.active.map(_.id).toSet
    val e = intercept[RuntimeException] {
      PipelineCompiler.startStreaming(twoSink, s"$dir/ckpt", availableNow = false)
    }
    e.getMessage should include("zzBad")
    // the aaGood query that started before the failure is stopped, not leaked
    spark.streams.active.map(_.id).toSet shouldBe before
  }

  test("batch: structured CSV source bypasses decode (source format field)") {
    import spark.implicits._
    val dir = tmpDir("graft_csv")
    Files.createDirectories(Paths.get(s"$dir/input"))
    Files.write(Paths.get(s"$dir/input", "data.csv"), "Str\na\nab\n".getBytes("UTF-8"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"lengthCheck": {"source": "csvInput", "plugin": "lengthRule", "sink": "memCsv"}},
         |  "states": {},
         |  "sources": {"csvInput": {"type": "File", "path": "$dir/input", "format": "csv"}},
         |  "sinks": {"memCsv": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    val out = spark.table("memCsv").as[Boolean].collect().toSeq
    out.count(identity) shouldBe 1 // "a" passes length==1, "ab" fails
    out.length shouldBe 2
  }

  test("batch: ORC and JSON-lines sources run through the same generic format branch") {
    import spark.implicits._
    for (fmt <- Seq("orc", "json")) {
      val dir = tmpDir(s"graft_$fmt")
      Seq("a", "ab").toDF("Str").write.format(fmt).save(s"$dir/input")
      val config =
        s"""{
           |  "eventFolder": "builtin",
           |  "rules": {"lengthCheck": {"source": "in", "plugin": "lengthRule", "sink": "memFmt_$fmt"}},
           |  "states": {},
           |  "sources": {"in": {"type": "File", "path": "$dir/input", "format": "$fmt"}},
           |  "sinks": {"memFmt_$fmt": {"type": "Memory"}}
           |}""".stripMargin
      val compiled = PipelineCompiler.compile(spark, config).toOption.get
      PipelineCompiler.runBatch(compiled)
      val out = spark.table(s"memFmt_$fmt").as[Boolean].collect().toSeq
      withClue(s"format=$fmt: ") {
        out.count(identity) shouldBe 1
        out.length shouldBe 2
      }
    }
  }

  test("streaming: structured parquet source (schema seeded from a batch read)") {
    import spark.implicits._
    val dir = tmpDir("graft_pq")
    Seq("a", "ab", "c").toDF("Str").write.parquet(s"$dir/input")
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"lengthCheck": {"source": "pqInput", "plugin": "lengthRule", "sink": "memPq"}},
         |  "states": {},
         |  "sources": {"pqInput": {"type": "File", "path": "$dir/input", "format": "parquet"}},
         |  "sinks": {"memPq": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    PipelineCompiler.startStreaming(compiled, s"$dir/ckpt").foreach(_.awaitTermination(60000))
    val out = spark.table("memPq").as[Boolean].collect().toSeq
    out.count(identity) shouldBe 2 // "a", "c"
    out.length shouldBe 3
  }

  test("corpus rules chain through the pipeline DSL (quality → langId → dedup)") {
    import spark.implicits._
    val dir = tmpDir("graft_corpus_rules")
    val good = // 22 tokens, all bigrams distinct
      "the quick brown fox jumps over one lazy dog while two curious cats watch three birds fly past four tall green trees"
    val short = "too short"
    val repetitive = ("spam ham " * 15).trim // dup-bigram fraction ~1
    Seq(
      (1L, good),
      (2L, short), // dropped: too short
      (3L, repetitive), // dropped: repetitive
      (4L, good) // dropped: exact dup of 1 (post-normalization)
    ).toDF("doc_id", "text").write.parquet(s"$dir/input")
    // Rule-to-rule chaining via the source key: docs → gate → lid → dedup.
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "gate":  {"source": "docs", "plugin": "qualityFilter"},
         |    "lid":   {"source": "gate", "plugin": "langId"},
         |    "dedup": {"source": "lid", "plugin": "exactDedup", "sink": "memCurated"}
         |  },
         |  "states": {},
         |  "sources": {"docs": {"type": "File", "path": "$dir/input", "format": "parquet"}},
         |  "sinks": {"memCurated": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    val out = spark.table("memCurated").select("doc_id", "lang_pred").as[(Long, String)].collect()
    withClue(s"rows=${out.toSeq}; input=${spark.read.parquet(s"$dir/input").collect().toSeq}") {
      out.length shouldBe 1
    }
    out.head._1 shouldBe 1L // the one good, unique doc survives
    out.head._2 shouldBe "en" // "the" is an English indicator
  }

  test("corpus rules chain in STREAMING mode (stateful dedup via readStream)") {
    import spark.implicits._
    val dir = tmpDir("graft_corpus_stream")
    val good =
      "the quick brown fox jumps over one lazy dog while two curious cats watch three birds fly past four tall green trees"
    Seq(
      (1L, good),
      (2L, "too short"),
      (3L, ("spam ham " * 15).trim),
      (4L, good) // exact dup of 1
    ).toDF("doc_id", "text").write.parquet(s"$dir/input")
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "gate":  {"source": "docs", "plugin": "qualityFilter"},
         |    "lid":   {"source": "gate", "plugin": "langId"},
         |    "dedup": {"source": "lid", "plugin": "exactDedup", "sink": "memCuratedStream"}
         |  },
         |  "states": {},
         |  "sources": {"docs": {"type": "File", "path": "$dir/input", "format": "parquet"}},
         |  "sinks": {"memCuratedStream": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    val queries = PipelineCompiler.startStreaming(compiled, s"$dir/ckpt")
    queries.foreach(_.awaitTermination(60000))
    val out = spark.table("memCuratedStream").select("doc_id", "lang_pred").as[(Long, String)].collect()
    out.length shouldBe 1
    out.head._2 shouldBe "en"
  }

  test("nearDup rule merges banded-simhash clusters, keeps exact semantics vs a reference") {
    import spark.implicits._
    val a = "the quick brown fox jumps over one lazy dog while two curious cats watch three birds"
    val docs = Seq(
      (1L, a),
      (2L, a), // exact dup of 1 → always merged
      (3L, a + " x"), // near-dup: merged iff some 16-bit band survives the edit
      (4L, "completely different subject matter about databases shuffles partitions and executors at scale")
    )
    val df = docs.toDF("doc_id", "text")

    val kept = graft.rules.CorpusRules.NearDupRule(df).select("doc_id").as[Long].collect().toSeq.sorted

    // Independent reference mirroring the rule's contract: rows get a
    // 60-bit md5 text id, ids within Hamming distance 3 on simhash64
    // union-find together (banding guarantees those pairs are found;
    // the popcount verify rejects everything else), each component
    // keeps its min ID, and each kept id keeps its min doc_id (exact
    // dups share an id).
    import org.apache.spark.sql.functions.{col, conv, md5}
    val rows = df
      .select(
        col("doc_id"),
        conv(md5(col("text")).substr(1, 15), 16, 10).cast("long").as("ndid"),
        graft.expressions.TextHashExprs.simhash64(graft.operators.Dedup.tokens(col("text"))).as("s")
      )
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    val ids = rows.map(r => r._2 -> r._3).distinct
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for (Seq((idx, sx), (idy, sy)) <- ids.combinations(2).map(_.toSeq)) {
      if (java.lang.Long.bitCount(sx ^ sy) <= 3) {
        val (rx, ry) = (find(idx), find(idy))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
    }
    val keptIds = ids.map(_._1).filter(id => find(id) == id).toSet
    val expected = rows.filter(r => keptIds(r._2)).groupBy(_._2).values.map(_.map(_._1).min).toSeq.sorted
    kept shouldBe expected
    kept should contain(4L) // unrelated doc always survives
    kept.size should be <= 3 // docs 1 and 2 always collapse

    // Streaming tier: first arrival per exact signature (near-exact dedup).
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    mem.addData(docs: _*)
    val q = graft.rules.CorpusRules.NearDupRule
      .applyStreaming(mem.toDF.toDF("doc_id", "text"))
      .writeStream
      .format("memory")
      .queryName("nearDupStream")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table("nearDupStream").count() shouldBe rows.map(_._3).distinct.size
  }

  test("unknown source type compiles to a Left, not an exception") {
    val config =
      """{
        |  "eventFolder": "builtin",
        |  "rules": {"r": {"source": "in", "plugin": "aRule", "sink": "out"}},
        |  "states": {},
        |  "sources": {"in": {"type": "Carrier-Pigeon", "path": "/nope"}},
        |  "sinks": {"out": {"type": "Memory"}}
        |}""".stripMargin
    val res = PipelineCompiler.compile(spark, config)
    res.left.toOption.get should include("unknown source type")
  }

  test("batch Kafka source is rejected (streaming-only, like the reference)") {
    val config =
      """{
        |  "eventFolder": "builtin",
        |  "rules": {"r": {"source": "in", "plugin": "aRule", "sink": "out"}},
        |  "states": {},
        |  "sources": {"in": {"type": "Kafka", "path": "topic"}},
        |  "sinks": {"out": {"type": "Memory"}}
        |}""".stripMargin
    val res = PipelineCompiler.compile(spark, config, streaming = false)
    res.left.toOption.get should include("streaming-only")
  }

  test("Kafka option contract: OffsetNewest ↔ startingOffsets=latest, topic subscribe") {
    // reference input/kafka.go:36 — ConsumePartition(..., OffsetNewest):
    // a fresh pipeline tails new records, it never replays the topic.
    val parsed = PipelineConfig
      .parse(
        """{"sources": {"in": {"type": "Kafka",
          |  "kafka_config": {"broker": "broker1:9092", "topic": "events"}}}}""".stripMargin)
      .toOption.get
    val opts = PipelineCompiler.kafkaSourceOptions("in", parsed.sources("in"))
    opts("kafka.bootstrap.servers") shouldBe "broker1:9092"
    opts("startingOffsets") shouldBe "latest"
    opts("subscribe") shouldBe "events"
    opts should not contain key("assign")
  }

  test("Kafka option contract: kafka_config.partitions = N assigns exactly partitions 0..N-1") {
    // reference input/kafka.go:34-43 — createPartitionConsumers consumes
    // EXACTLY partitions 0..N-1 of the topic, so N maps to an explicit
    // assign list, not a parallelism hint.
    val parsed = PipelineConfig
      .parse(
        """{"sources": {"in": {"type": "Kafka",
          |  "kafka_config": {"broker": "b:9092", "topic": "t", "partitions": 3}}}}""".stripMargin)
      .toOption.get
    parsed.sources("in").kafkaPartitions shouldBe Some(3)
    val opts = PipelineCompiler.kafkaSourceOptions("in", parsed.sources("in"))
    opts("assign") shouldBe """{"t":[0,1,2]}"""
    opts should not contain key("subscribe")
  }

  test("Kafka option contract: max_offsets_per_trigger maps to maxOffsetsPerTrigger") {
    // the file-spool max_files_per_trigger's exact Kafka analogue: the
    // per-micro-batch offset cap a deep-topic subscribe or a restart
    // after downtime needs so the backlog is not planned as ONE batch.
    val parsed = PipelineConfig
      .parse(
        """{"sources": {"in": {"type": "Kafka", "max_offsets_per_trigger": 50000,
          |  "kafka_config": {"broker": "b:9092", "topic": "t"}}}}""".stripMargin)
      .toOption.get
    parsed.sources("in").maxOffsetsPerTrigger shouldBe Some(50000L)
    val opts = PipelineCompiler.kafkaSourceOptions("in", parsed.sources("in"))
    opts("maxOffsetsPerTrigger") shouldBe "50000"
    // absent knob -> no option row (Spark default: unbounded)
    val bare = PipelineConfig
      .parse("""{"sources": {"in": {"type": "Kafka",
               |  "kafka_config": {"broker": "b:9092", "topic": "t"}}}}""".stripMargin)
      .toOption.get
    PipelineCompiler.kafkaSourceOptions("in", bare.sources("in")) should not contain key(
      "maxOffsetsPerTrigger")
    // offset counts are per-topic totals, not file counts: values past
    // Int.MaxValue are legitimate and must survive as longs
    val big = PipelineConfig
      .parse(s"""{"sources": {"in": {"type": "Kafka", "max_offsets_per_trigger": ${1L << 33},
                |  "kafka_config": {"broker": "b:9092", "topic": "t"}}}}""".stripMargin)
      .toOption.get
    PipelineCompiler.kafkaSourceOptions("in", big.sources("in"))("maxOffsetsPerTrigger") shouldBe
      (1L << 33).toString
  }

  test("Kafka option contract: flat `path` is a topic fallback; missing broker fails loudly") {
    val flat = PipelineConfig
      .parse("""{"sources": {"in": {"type": "Kafka", "path": "fallback-topic",
               |  "kafka_config": {"broker": "b:9092"}}}}""".stripMargin)
      .toOption.get
    PipelineCompiler.kafkaSourceOptions("in", flat.sources("in"))("subscribe") shouldBe "fallback-topic"
    val noBroker = PipelineConfig
      .parse("""{"sources": {"in": {"type": "Kafka", "path": "t"}}}""")
      .toOption.get
    val e = intercept[RuntimeException] {
      PipelineCompiler.kafkaSourceOptions("in", noBroker.sources("in"))
    }
    e.getMessage should include("kafka_config.broker")
  }

  test("eventFolder loads the schema registry from JSON files (plugin-folder parity)") {
    import spark.implicits._
    val dir = tmpDir("graft_schema_folder")
    Files.createDirectories(Paths.get(s"$dir/schemas"))
    Files.write(
      Paths.get(s"$dir/schemas", "metric.json"),
      """{"name": "metric", "ddl": "metric STRING, value DOUBLE", "required": ["metric", "value"]}""".getBytes("UTF-8")
    )
    writeLines(s"$dir/input", Seq("""{"metric": "cpu", "value": 0.5}""", "not a metric"))
    val config =
      s"""{
         |  "eventFolder": "$dir/schemas",
         |  "rules": {"pass": {"source": "in", "plugin": "metricsOnly", "sink": "memSchema"}},
         |  "states": {},
         |  "sources": {"in": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memSchema": {"type": "Memory"}}
         |}""".stripMargin
    val rules = PipelineCompiler.builtinRules + ("metricsOnly" -> new graft.rules.Rule {
      val name = "metricsOnly"
      override val eventType: Option[String] = Some("metric")
      def apply(df: org.apache.spark.sql.DataFrame) = df.select("metric", "value")
    })
    val compiled = PipelineCompiler.compile(spark, config, rules = rules).toOption.get
    PipelineCompiler.runBatch(compiled)
    val out = spark.table("memSchema").as[(String, Double)].collect().toSeq
    out shouldBe Seq(("cpu", 0.5)) // the non-matching line is dropped by dispatch
  }

  test("batch: partitioned parquet sink (sink format + partition_by)") {
    import spark.implicits._
    val dir = tmpDir("graft_pq_sink")
    Files.createDirectories(Paths.get(s"$dir/input"))
    Files.write(Paths.get(s"$dir/input", "data.csv"), "Str,grp\na,x\nab,y\nc,x\n".getBytes("UTF-8"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"pass": {"source": "csvInput", "plugin": "passthrough", "sink": "pqOut"}},
         |  "states": {},
         |  "sources": {"csvInput": {"type": "File", "path": "$dir/input", "format": "csv"}},
         |  "sinks": {"pqOut": {"type": "File", "path": "$dir/out", "format": "parquet", "partition_by": ["grp"]}}
         |}""".stripMargin
    val rules = PipelineCompiler.builtinRules + ("passthrough" -> new graft.rules.Rule {
      val name = "passthrough"
      def apply(df: org.apache.spark.sql.DataFrame) = df
    })
    val compiled = PipelineCompiler.compile(spark, config, rules = rules).toOption.get
    PipelineCompiler.runBatch(compiled)
    // Hive-style partition layout + readable back with the partition column.
    Files.exists(Paths.get(s"$dir/out/grp=x")) shouldBe true
    val back = spark.read.parquet(s"$dir/out")
    back.count() shouldBe 3
    back
      .filter(org.apache.spark.sql.functions.col("grp") === "x")
      .select("Str")
      .as[String]
      .collect()
      .toSet shouldBe Set("a", "c")
  }

  test("streaming s2s golden: file source → stateful enrichment → file sink") {
    val dir = tmpDir("graft_s2s")
    writeLines(s"$dir/input", Seq(Fixtures.assumeRoleEvent, Fixtures.createUserEvent))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "s2sRule": {"source": "ctInput", "plugin": "cloudTrailS2SJoin", "state": "kv", "sink": "fileOut"}
         |  },
         |  "states": {"kv": {"type": "KV"}},
         |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"fileOut": {"type": "File", "path": "$dir/output"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    PipelineCompiler.startStreaming(compiled, s"$dir/ckpt").foreach(_.awaitTermination(120000))

    val out = spark.read.json(s"$dir/output")
    out.count() shouldBe 1
    val r = out.head()
    r.getAs[String]("Source") shouldBe "CloudTrail"
    r.getAs[String]("EventType") shouldBe "UserCreated"
    r.getAs[String]("Name") shouldBe "IAMUserCreated"
    r.getAs[Long]("Level") shouldBe graft.model.Level.Warn.toLong
    r.getAs[String]("EventId") shouldBe "dEXAMPLE-265a-41e0-9352-4401bEXAMPLE"
    r.getAs[String]("Entity") shouldBe "user/Bob" // resolved through streaming state
    r.getAs[String]("SourceIP") shouldBe "192.0.2.1"
    r.getAs[Long]("Occurrences") shouldBe 1L
  }

  test("max_files_per_trigger bounds streaming micro-batches (spool ingest throttle)") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_throttle")
    Files.createDirectories(Paths.get(s"$dir/input"))
    (0 until 4).foreach { i =>
      Files.write(Paths.get(s"$dir/input", f"f$i%02d.txt"), s"line-$i".getBytes("UTF-8"))
    }
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"len": {"source": "in", "plugin": "lengthRule", "sink": "out"}},
         |  "states": {},
         |  "sources": {"in": {"type": "File", "path": "$dir/input", "max_files_per_trigger": 1}},
         |  "sinks": {"out": {"type": "File", "path": "$dir/output"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    compiled.config.sources("in").maxFilesPerTrigger shouldBe Some(1)
    PipelineCompiler.startStreaming(compiled, s"$dir/ckpt").foreach(_.awaitTermination(120000))
    // 4 files at 1 file/trigger → 4 committed batches, and every record
    // still arrives exactly once
    val commits = new java.io.File(s"$dir/ckpt/out/commits").list().count(!_.startsWith("."))
    commits shouldBe 4
    spark.read.json(s"$dir/output").select(col("result")).count() shouldBe 4

    // present-but-invalid must be a config error (Left), never a
    // silent fall-back to unthrottled batches
    for (bad <- Seq("0", "-3", "\"4\"", "2.5")) {
      val msg = PipelineCompiler
        .compile(spark, config.replace("\"max_files_per_trigger\": 1", s""""max_files_per_trigger": $bad"""), streaming = true)
        .left.toOption.getOrElse("")
      withClue(s"value $bad: ") { msg should include("max_files_per_trigger") }
    }
  }

  test("stateStore knob: s2s golden is provider-parity; rocksdb is the default, hdfs opts out") {
    // Spark pins the provider into each query's offset-log metadata at
    // first start — the conf map inside offsets/0 is the evidence of
    // which provider the query ACTUALLY ran state on.
    def pinnedProvider(ckpt: String, sink: String): String = {
      val f = Paths.get(ckpt, sink, "offsets", "0")
      new String(Files.readAllBytes(f), "UTF-8")
    }
    def runOnce(dir: String, knob: String): String = {
      writeLines(s"$dir/input", Seq(Fixtures.assumeRoleEvent, Fixtures.createUserEvent))
      val config =
        s"""{
           |  "eventFolder": "builtin", $knob
           |  "rules": {
           |    "s2sRule": {"source": "ctInput", "plugin": "cloudTrailS2SJoin", "state": "kv", "sink": "fileOut"}
           |  },
           |  "states": {"kv": {"type": "KV"}},
           |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
           |  "sinks": {"fileOut": {"type": "File", "path": "$dir/output"}}
           |}""".stripMargin
      val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
      PipelineCompiler.startStreaming(compiled, s"$dir/ckpt").foreach(_.awaitTermination(120000))
      val out = spark.read.json(s"$dir/output")
      out.count() shouldBe 1
      val r = out.head()
      r.getAs[String]("Entity") shouldBe "user/Bob"
      r.getAs[String]("EventType") shouldBe "UserCreated"
      pinnedProvider(s"$dir/ckpt", "fileOut")
    }

    // default: RocksDB (disk-bounded state — the 100 TB posture)
    runOnce(tmpDir("graft_ss_default"), "") should include("RocksDBStateStoreProvider")
    // explicit opt-out: heap-backed provider, byte-same golden output
    runOnce(tmpDir("graft_ss_hdfs"), "\"stateStore\": \"hdfs\",") should
      include("HDFSBackedStateStoreProvider")
    // explicit rocksdb spelling accepted too
    runOnce(tmpDir("graft_ss_rocks"), "\"stateStore\": \"rocksdb\",") should
      include("RocksDBStateStoreProvider")
    // the session conf is restored after the start — the knob is
    // per-pipeline, not a sticky session mutation
    spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .getOrElse("") should include("RocksDB")

    // invalid values are config errors (Left), not runtime surprises
    PipelineCompiler.compile(
      spark,
      s"""{
         |  "eventFolder": "builtin", "stateStore": "bolt",
         |  "rules": {},
         |  "states": {}, "sources": {}, "sinks": {}
         |}""".stripMargin,
      streaming = true
    ).left.toOption.getOrElse("") should include("Invalid stateStore")
  }

  test("a restart keeps its ORIGINAL state-store provider, whatever the config now says") {
    // The docs (PipelineConfig.stateStore, BASELINE round-12) promise:
    // a query restarted from an existing checkpoint keeps the provider
    // it FIRST started under — Spark re-applies the offset-log's
    // pinned conf over the session's. Pin that: start under the
    // rocksdb default, restart the same checkpoint with an explicit
    // "stateStore": "hdfs", and the state must still resolve (a
    // provider flip would read an empty/incompatible store).
    val dir = tmpDir("graft_ss_sticky")
    writeLines(s"$dir/input", Seq(Fixtures.assumeRoleEvent))
    def config(knob: String) =
      s"""{
         |  "eventFolder": "builtin", $knob
         |  "rules": {
         |    "s2sRule": {"source": "ctInput", "plugin": "cloudTrailS2SJoin", "state": "kv", "sink": "fileOut"}
         |  },
         |  "states": {"kv": {"type": "KV"}},
         |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"fileOut": {"type": "File", "path": "$dir/output"}}
         |}""".stripMargin
    // run 1 (rocksdb default): AssumeRole builds state, no output
    val c1 = PipelineCompiler.compile(spark, config(""), streaming = true).toOption.get
    PipelineCompiler.startStreaming(c1, s"$dir/ckpt").foreach(_.awaitTermination(120000))
    // run 2 (config now says hdfs, same checkpoint): the probe must
    // resolve through run 1's ROCKSDB state — proof the pinned
    // provider won, since an HDFS store at this checkpoint would be
    // empty (or fail to read RocksDB files)
    Files.write(
      java.nio.file.Paths.get(s"$dir/input", "later.txt"),
      Fixtures.createUserEvent.getBytes("UTF-8"))
    val c2 = PipelineCompiler
      .compile(spark, config("\"stateStore\": \"hdfs\","), streaming = true).toOption.get
    PipelineCompiler.startStreaming(c2, s"$dir/ckpt").foreach(_.awaitTermination(120000))
    val out = spark.read.json(s"$dir/output")
      .filter(org.apache.spark.sql.functions.col("Entity").isNotNull)
    out.count() shouldBe 1
    out.head().getAs[String]("Entity") shouldBe "user/Bob"
    // and the state dir is RocksDB-shaped (sst/changelog files, not
    // the HDFS provider's plain delta/snapshot layout)
    val stateRoot = java.nio.file.Paths.get(s"$dir/ckpt/fileOut/state/0/0")
    val entries = Option(stateRoot.toFile.list()).map(_.toSeq).getOrElse(Nil)
    withClue(s"state dir entries: $entries ") {
      entries.exists(e => e.endsWith(".changelog") || e.endsWith(".zip") || e == "SSTs") shouldBe true
    }
  }

  test("state survives a pipeline restart (checkpointed KV persistence, SURVEY §7.4.5)") {
    val dir = tmpDir("graft_restart")
    writeLines(s"$dir/input", Seq(Fixtures.assumeRoleEvent))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "s2sRule": {"source": "ctInput", "plugin": "cloudTrailS2SJoin", "state": "kv", "sink": "fileOut"}
         |  },
         |  "states": {"kv": {"type": "KV"}},
         |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"fileOut": {"type": "File", "path": "$dir/output"}}
         |}""".stripMargin

    // Run 1: only the AssumeRole (build) event — state written, no output.
    val c1 = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    PipelineCompiler.startStreaming(c1, s"$dir/ckpt").foreach(_.awaitTermination(120000))

    // Run 2 (restart, same checkpoint): the CreateUser probe arrives in a
    // NEW file; it must resolve through state recovered from run 1 —
    // the reference's BoltDB file persistence (state/kv.go), upgraded
    // to exactly-once.
    Files.write(
      java.nio.file.Paths.get(s"$dir/input", "later.txt"),
      Fixtures.createUserEvent.getBytes("UTF-8")
    )
    val c2 = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    PipelineCompiler.startStreaming(c2, s"$dir/ckpt").foreach(_.awaitTermination(120000))

    val out = spark.read.json(s"$dir/output").filter(org.apache.spark.sql.functions.col("Entity").isNotNull)
    out.count() shouldBe 1
    out.head().getAs[String]("Entity") shouldBe "user/Bob" // resolved from recovered state
  }

  test("unclean kill mid-batch: restart from checkpoint is exactly-once (no loss, no duplicates)") {
    import spark.implicits._
    val dir = tmpDir("graft_fault")
    writeLines(s"$dir/input", Seq("x1", "x2", "x3", "x4"))
    val flag = s"$dir/fail_flag"
    graft.plugins.FaultInjectingRule.flagPath = flag
    Files.write(Paths.get(flag), Array.emptyByteArray)
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "faulty": {"source": "fileInput", "plugin": "graft.plugins.FaultInjectingRule", "sink": "fileOut"}
         |  },
         |  "states": {},
         |  "sources": {"fileInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"fileOut": {"type": "File", "path": "$dir/output"}}
         |}""".stripMargin

    // Attempt 1: the batch starts (offsets logged) and dies mid-flight.
    val c1 = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      PipelineCompiler.startStreaming(c1, s"$dir/ckpt").foreach(_.awaitTermination(120000))
    }
    // Nothing committed: the file sink's metadata log (the read path)
    // must have no batch entries from the failed attempt.
    val committed = Option(new java.io.File(s"$dir/output/_spark_metadata").list())
      .map(_.toSeq)
      .getOrElse(Nil)
    committed.count(!_.startsWith(".")) shouldBe 0

    // Attempt 2, same checkpoint, fault cleared: the batch replays.
    Files.delete(Paths.get(flag))
    val c2 = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    PipelineCompiler.startStreaming(c2, s"$dir/ckpt").foreach(_.awaitTermination(120000))

    // Exactly-once: every record once, none duplicated — the upgrade
    // over the reference's at-most-once delivery (SURVEY §2.6).
    val out = spark.read.json(s"$dir/output").select("result").as[String].collect().toSeq
    out.sorted shouldBe Seq("x1", "x2", "x3", "x4")
  }

  test("streaming agg golden through the compiler: 3 no-MFA events, interval flush, Occurrences=3") {
    val dir = tmpDir("graft_agg_stream")
    writeLines(s"$dir/input", Seq(Fixtures.createUserEvent, Fixtures.createUserEvent, Fixtures.createUserEvent))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "aggRule": {"source": "ctInput", "plugin": "cloudTrailNoMfaAgg", "state": "kv", "sink": "memAgg"}
         |  },
         |  "states": {"kv": {"type": "KV"}},
         |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memAgg": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config, streaming = true).toOption.get
    // Continuous trigger: the ProcessingTimeTimeout flush (2 s quiet
    // period) needs ticks after the data batch — AvailableNow would
    // terminate before the window flush fires.
    val queries = PipelineCompiler.startStreaming(compiled, s"$dir/ckpt", availableNow = false)
    try {
      val deadline = System.currentTimeMillis() + 60000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        rows = spark.table("memAgg").collect()
      }
      rows.length shouldBe 1
      rows.head.getAs[String]("Entity") shouldBe "role/AssumeNothing"
      rows.head.getAs[Int]("Occurrences") shouldBe 3
      rows.head.getAs[String]("EventType") shouldBe "NoMFA"
    } finally queries.foreach(_.stop())
  }

  test("batch s2s golden: identical result through the batch compiler") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_s2s_batch")
    writeLines(s"$dir/input", Seq(Fixtures.assumeRoleEvent, Fixtures.createUserEvent))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "s2sRule": {"source": "ctInput", "plugin": "cloudTrailS2SJoin", "sink": "memS2s"}
         |  },
         |  "states": {},
         |  "sources": {"ctInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memS2s": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    val r = spark.table("memS2s").head()
    r.getAs[String]("Entity") shouldBe "user/Bob"
    r.getAs[Int]("Occurrences") shouldBe 1
  }

  test("SQS-style queue sink posts one JSON message per record") {
    val dir = tmpDir("graft_sqs")
    writeLines(s"$dir/input", Seq("a", "ab"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"r": {"source": "in", "plugin": "aRule", "sink": "queue"}},
         |  "states": {},
         |  "sources": {"in": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"queue": {"type": "SQS", "path": "$dir/queue/messages"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    val msgs = scala.io.Source.fromFile(s"$dir/queue/messages").getLines().toSeq
    msgs.length shouldBe 2
    msgs.foreach(_ should include("result"))
  }

  test("QueueSink posts from executor tasks and matches the driver-collect golden bytes") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dir = tmpDir("graft_queue_exec")
    // Multi-partition batch: proves posting runs per-partition on
    // executors, not via a driver collect.
    val df = spark
      .range(0, 100, 1, numPartitions = 8)
      .select(col("id"), concat(lit("msg-"), col("id")).as("body"))
    val stats = QueueSink.post(df, s"$dir/q/messages")
    stats.partitionsPosted should be > 1L
    stats.messagesPosted shouldBe 100L
    // Golden: byte-identical to what the old driver-side
    // df.toJSON.collect() form wrote (one JSON line per record, in
    // partition order).
    val expected = df.toJSON.collect().mkString("", "\n", "\n")
    val actual = new String(
      Files.readAllBytes(Paths.get(s"$dir/q/messages")),
      java.nio.charset.StandardCharsets.UTF_8
    )
    actual shouldBe expected
    // Spool is cleaned up after the merge.
    Files.exists(Paths.get(s"$dir/q/messages.spool")) shouldBe false
  }

  test("QueueSink appends across posts and ignores stale spool debris") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_queue_stale")
    val queue = s"$dir/q/messages"
    // Plant debris simulating a crashed prior run: a committed part and
    // an orphaned task-attempt tmp. Neither may leak into the output.
    val spool = Paths.get(s"$queue.spool")
    Files.createDirectories(spool)
    Files.write(spool.resolve("part-00003"), "stale\n".getBytes("UTF-8"))
    Files.write(spool.resolve(".part-3-x.tmp"), "orphan\n".getBytes("UTF-8"))
    val df1 = spark.range(0, 3, 1, numPartitions = 2).select(col("id"))
    val df2 = spark.range(3, 5, 1, numPartitions = 2).select(col("id"))
    QueueSink.post(df1, queue)
    QueueSink.post(df2, queue) // second post appends (queue semantics)
    val lines = scala.io.Source.fromFile(queue).getLines().toSeq
    lines shouldBe Seq(0, 1, 2, 3, 4).map(i => s"""{"id":$i}""")
    Files.exists(spool) shouldBe false
  }

  test("QueueSink recovers a merge interrupted between delete and rename") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_queue_recover")
    val queue = s"$dir/q/messages"
    QueueSink.post(spark.range(0, 3, 1, numPartitions = 2).select(col("id")), queue)
    // Simulate the crash window: the merged tmp was fully written
    // (so its .done marker exists) and the old queue file deleted,
    // but the rename never happened. The tmp IS the complete
    // accumulated queue at that point.
    Files.move(Paths.get(queue), Paths.get(s"$queue.merge.tmp"))
    Files.write(Paths.get(s"$queue.merge.tmp.done"), Array.emptyByteArray)
    QueueSink.post(spark.range(3, 5, 1, numPartitions = 2).select(col("id")), queue)
    val lines = scala.io.Source.fromFile(queue).getLines().toSeq
    lines shouldBe Seq(0, 1, 2, 3, 4).map(i => s"""{"id":$i}""")
    // A stale tmp NEXT TO a surviving queue (crash mid-write, nothing
    // deleted) is the opposite case: it must be ignored/overwritten,
    // never merged.
    Files.write(Paths.get(s"$queue.merge.tmp"), "half-written garbage\n".getBytes("UTF-8"))
    QueueSink.post(spark.range(5, 6, 1, numPartitions = 1).select(col("id")), queue)
    val lines2 = scala.io.Source.fromFile(queue).getLines().toSeq
    lines2 shouldBe Seq(0, 1, 2, 3, 4, 5).map(i => s"""{"id":$i}""")
  }

  test("QueueSink discards a truncated FIRST-ever merge tmp (no completeness marker)") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("graft_queue_firstcrash")
    val queue = s"$dir/q/messages"
    // The very first merge ever crashed mid-write: no queue file was
    // ever created, and the tmp is truncated (mid-record). Before the
    // marker existed, "queue missing + tmp present" was wrongly read as
    // "complete" and the garbage was renamed into place permanently.
    Files.createDirectories(Paths.get(s"$dir/q"))
    Files.write(Paths.get(s"$queue.merge.tmp"), """{"id":99,"trunc""".getBytes("UTF-8"))
    QueueSink.post(spark.range(0, 2, 1, numPartitions = 2).select(col("id")), queue)
    val lines = scala.io.Source.fromFile(queue).getLines().toSeq
    lines shouldBe Seq(0, 1).map(i => s"""{"id":$i}""")
    Files.exists(Paths.get(s"$queue.merge.tmp")) shouldBe false
    // A marker orphaned AFTER a completed rename (crash between rename
    // and marker delete) must not bless the next run's tmp either —
    // mergeSpool clears it before writing. Normal appends continue.
    Files.write(Paths.get(s"$queue.merge.tmp.done"), Array.emptyByteArray)
    QueueSink.post(spark.range(2, 3, 1, numPartitions = 1).select(col("id")), queue)
    scala.io.Source.fromFile(queue).getLines().toSeq shouldBe
      Seq(0, 1, 2).map(i => s"""{"id":$i}""")
  }

  test("runtime-loaded rules: plugin by class name, object and class forms (plugin.Open parity)") {
    import spark.implicits._
    val dir = tmpDir("graft_runtime_rule")
    writeLines(s"$dir/input", Seq("a", "ab"))
    // Neither plugin is in builtinRules — they resolve via RuleLoader.
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "shout": {"source": "fileInput", "plugin": "graft.plugins.ShoutRule", "sink": "memShout"},
         |    "suffix": {"source": "fileInput", "plugin": "graft.plugins.SuffixRule", "sink": "memSuffix"}
         |  },
         |  "states": {},
         |  "sources": {"fileInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memShout": {"type": "Memory"}, "memSuffix": {"type": "Memory"}}
         |}""".stripMargin
    PipelineCompiler.builtinRules.keySet should not contain "graft.plugins.ShoutRule"
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    spark.table("memShout").as[String].collect().toSet shouldBe Set("A", "AB")
    spark.table("memSuffix").as[String].collect().toSet shouldBe Set("a!", "ab!")
  }

  test("a classpath class that is not a Rule fails validation, not compilation") {
    val dir = tmpDir("graft_notarule")
    writeLines(s"$dir/input", Seq("a"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"bad": {"source": "fileInput", "plugin": "graft.plugins.NotARule", "sink": "memBad"}},
         |  "states": {},
         |  "sources": {"fileInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memBad": {"type": "Memory"}}
         |}""".stripMargin
    val err = PipelineCompiler.compile(spark, config).left.toOption.get
    err should include("Invalid plugin for rule bad")
  }

  test("a plugin whose static initializer throws loads as an error, not a crash") {
    // ExceptionInInitializerError is a LinkageError (outside NonFatal):
    // RuleLoader must convert it to the reference's "Unable to load
    // plugin" Left instead of letting it escape compile/-checkRule.
    val direct = graft.rules.RuleLoader.load("graft.plugins.ExplodingInitRule", Map.empty)
    direct.isLeft shouldBe true
    direct.left.toOption.get should include("Unable to load plugin")

    val dir = tmpDir("graft_explodingrule")
    writeLines(s"$dir/input", Seq("a"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"bad": {"source": "fileInput", "plugin": "graft.plugins.ExplodingInitRule", "sink": "memBoom"}},
         |  "states": {},
         |  "sources": {"fileInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memBoom": {"type": "Memory"}}
         |}""".stripMargin
    val err = PipelineCompiler.compile(spark, config).left.toOption.get
    err should include("Invalid plugin for rule bad")
  }

  test("Kinesis source config is accepted and replays from a path") {
    import spark.implicits._
    val dir = tmpDir("graft_kinesis")
    writeLines(s"$dir/replay", Seq("a"))
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {"r": {"source": "in", "plugin": "aRule", "sink": "memKinesis"}},
         |  "states": {},
         |  "sources": {"in": {"type": "Kinesis", "path": "$dir/replay"}},
         |  "sinks": {"memKinesis": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    spark.table("memKinesis").as[Boolean].collect().toSeq shouldBe Seq(true)
  }

  test("fan-in: rule feeding another rule via the sink key") {
    import spark.implicits._
    val dir = tmpDir("graft_chain")
    writeLines(s"$dir/input", Seq("a", "b"))
    // aRule emits booleans into lengthRule? No — chain needs schema
    // compatibility; mirror the reference shape instead: a rule whose
    // sink is another rule (pipeline.go:387-391 pump).
    val config =
      s"""{
         |  "eventFolder": "builtin",
         |  "rules": {
         |    "first": {"source": "fileInput", "plugin": "aRule", "sink": "second"},
         |    "second": {"source": "fileInput", "plugin": "lengthRule", "sink": "memChain"}
         |  },
         |  "states": {},
         |  "sources": {"fileInput": {"type": "File", "path": "$dir/input"}},
         |  "sinks": {"memChain": {"type": "Memory"}}
         |}""".stripMargin
    val compiled = PipelineCompiler.compile(spark, config).toOption.get
    PipelineCompiler.runBatch(compiled)
    // second receives fileInput's 2 decoded lines AND first's 2 boolean
    // outputs (union-by-name with nulls) → 4 rows through lengthRule.
    spark.table("memChain").count() shouldBe 4
  }
}
