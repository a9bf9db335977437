package graft

import java.nio.file.Files

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MicroBatch

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("parseWindowMillis handles the reference's unit grammar") {
    assert(MicroBatch.parseWindowMillis("5 seconds") == 5000L)
    assert(MicroBatch.parseWindowMillis("1 minute") == 60000L)
    assert(MicroBatch.parseWindowMillis("2 hours") == 7200000L)
    intercept[IllegalArgumentException](MicroBatch.parseWindowMillis("5 fortnights"))
  }

  test("runBatch: skips empty batches, no metrics emitted") {
    var calls = 0
    var metrics = List.empty[MicroBatch.BatchMetrics]
    MicroBatch.runBatch(spark.emptyDataFrame, 0L,
      (_, _) => calls += 1, 3, StorageLevel.MEMORY_ONLY, m => metrics ::= m)
    assert(calls == 0 && metrics.isEmpty)
  }

  test("runBatch: retries with backoff then succeeds; metrics counted") {
    var attempts = 0
    var sleeps   = List.empty[Long]
    var metrics  = List.empty[MicroBatch.BatchMetrics]
    val df = Seq(1, 2, 3).toDF("v")
    MicroBatch.runBatch(df, 7L, (_, _) => {
      attempts += 1
      if (attempts < 3) throw new RuntimeException("flaky")
    }, batchMaxRetries = 3, StorageLevel.MEMORY_ONLY,
      m => metrics ::= m, sleepMs = ms => sleeps ::= ms)
    assert(attempts == 3)
    assert(sleeps.reverse == List(1000L, 2000L)) // min(attempt,5)s backoff
    assert(metrics.head.numRecords == 3L)
    assert(metrics.head.batchId == 7L)
    assert(metrics.head.attempts == 3)
  }

  test("runBatch: exhausted retries rethrow") {
    val df = Seq(1).toDF("v")
    intercept[RuntimeException] {
      MicroBatch.runBatch(df, 0L,
        (_, _) => throw new RuntimeException("always"),
        batchMaxRetries = 2, StorageLevel.MEMORY_ONLY, _ => (),
        sleepMs = _ => ())
    }
  }

  test("runBatch: rejects batchMaxRetries outside [0,100]") {
    val df = Seq(1).toDF("v")
    intercept[IllegalArgumentException] {
      MicroBatch.runBatch(df, 0L, (_, _) => (), 101,
        StorageLevel.MEMORY_ONLY, _ => ())
    }
  }

  test("forEachBatch end-to-end over a file stream of events") {
    val src = Files.createTempDirectory("graft_stream_src").toString
    val ckp = Files.createTempDirectory("graft_stream_ckp").toString
    // stage the events table as the streamed source
    val events = spark.read.parquet(s"${SparkFixture.sfDir}/events.parquet")
      .select($"event_id", $"event_type", $"value")
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(src)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    var metrics = List.empty[MicroBatch.BatchMetrics]
    val q = MicroBatch.forEachBatch(
      stream,
      (batch: Dataset[Row], _: Long) => { seen.addAndGet(batch.count()); () },
      windowSize = "1 seconds",
      checkpointLocation = ckp,
      onMetrics = m => metrics.synchronized { metrics ::= m })
    try q.processAllAvailable() finally q.stop()
    assert(seen.get() == events.count())
    assert(metrics.nonEmpty && metrics.map(_.numRecords).sum == events.count())
  }

  test("streaming incremental dedup accumulates the fingerprint store") {
    import graft.streaming.StreamDedup
    val store = Files.createTempDirectory("graft_dedup").toString + "/fps"
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text")
    val out1 = StreamDedup.dedupBatch(b1, "text", "doc_id", store)
    assert(out1.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L)) // within-batch dup collapses to the min id
    out1.unpersist()
    val b2 = Seq((4L, "beta"), (5L, "gamma"), (6L, "gamma"))
      .toDF("doc_id", "text")
    val out2 = StreamDedup.dedupBatch(b2, "text", "doc_id", store)
    assert(out2.select("doc_id").as[Long].collect().toSeq
      == Seq(5L)) // beta already in the store from batch 1
    out2.unpersist()
    // a replayed batch emits nothing new — the store absorbed it
    val replay = StreamDedup.dedupBatch(b2, "text", "doc_id", store)
    assert(replay.isEmpty)
    replay.unpersist()

    // --- store compaction: the maintenance op for the file-per-batch
    // append pattern — three appends (the replay's is empty) left
    // multiple files holding 3 distinct fingerprints.
    assert(spark.read.parquet(store).count() == 3L) // alpha/beta/gamma
    val r = StreamDedup.compactStore(spark, store)
    assert(r.filesAfter == 1 && r.filesBefore > 1)
    assert(r.distinctFps == 3L)
    assert(spark.read.parquet(store).count() == 3L)
    // the compacted store dedups identically: seen text still drops,
    // new text still emits
    val b3 = Seq((7L, "gamma"), (8L, "delta")).toDF("doc_id", "text")
    val out3 = StreamDedup.dedupBatch(b3, "text", "doc_id", store)
    assert(out3.select("doc_id").as[Long].collect().toSeq == Seq(8L))
    out3.unpersist()
    // compacting a missing store is a clean no-op
    assert(StreamDedup.compactStore(spark, store + "_nope")
      == StreamDedup.CompactResult(0, 0, 0L))
    // crash-window recovery: simulate a death between the two swap
    // renames (store gone, pre-swap copy at .compact-old) — both the
    // per-batch read path and a re-run compaction must restore it
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".compact-old")))
    assert(StreamDedup.loadStore(spark, store).count() == 4L) // +delta
    val b4 = Seq((9L, "gamma")).toDF("doc_id", "text")
    val out4 = StreamDedup.dedupBatch(b4, "text", "doc_id", store)
    assert(out4.isEmpty) // recovered store still knows gamma
    out4.unpersist()
    // empty-data store dir (only markers): compaction is a no-op, not
    // a schema-inference crash
    val emptyStore = Files.createTempDirectory("graft_empty").toString + "/fps"
    Files.createDirectories(java.nio.file.Paths.get(emptyStore))
    Files.write(java.nio.file.Paths.get(emptyStore, "_SUCCESS"),
      Array.emptyByteArray)
    val re = StreamDedup.compactStore(spark, emptyStore)
    assert(re.distinctFps == 0L && re.filesBefore == 0)
  }

  test("dedupStream end-to-end over a file stream") {
    import graft.streaming.StreamDedup
    val src = Files.createTempDirectory("graft_dstream_src").toString
    val ckp = Files.createTempDirectory("graft_dstream_ckp").toString
    val store = Files.createTempDirectory("graft_dstream_store")
      .toString + "/fps"
    Seq((10L, "aa"), (11L, "bb"), (12L, "aa"), (13L, "cc"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(src)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = StreamDedup.dedupStream(
      stream, "text", "doc_id", store, ckp) { (out, _) =>
      out.select("doc_id").as[Long].collect().foreach(emitted.add); ()
    }
    try q.processAllAvailable() finally q.stop()
    // one survivor per distinct text (10 or 12 for "aa" depending on
    // batch split; with a single batch the min id 10 wins)
    val got = emitted.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(got.length == 3)
    assert(got.toSet.subsetOf(Set(10L, 11L, 13L)) ||
      got.toSet.subsetOf(Set(12L, 11L, 13L)))
  }

  test("dedupStreamWithinWatermark drops time-local duplicates via the state store") {
    import graft.streaming.StreamDedup
    val src = Files.createTempDirectory("graft_wmdedup_src").toString
    val ckp = Files.createTempDirectory("graft_wmdedup_ckp").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // two files → two micro-batches (maxFilesPerTrigger=1): the batch-2
    // replay of "aa" (id 30) arrives within the 1h watermark of batch
    // 1's "aa" (id 10) and must drop; "cc" is new and emits
    Seq((10L, "aa", ts(0)), (11L, "bb", ts(1)), (12L, "aa", ts(2)))
      .toDF("doc_id", "text", "ts")
      .write.mode("overwrite").parquet(s"$src/f1")
    Seq((30L, "aa", ts(5)), (31L, "cc", ts(6)))
      .toDF("doc_id", "text", "ts")
      .write.mode("overwrite").parquet(s"$src/f2")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val out = StreamDedup.dedupStreamWithinWatermark(
      stream, "text", "ts", "1 hour")
    val name = "graft_wmdedup_out"
    val q = out.writeStream.outputMode("append")
      .option("checkpointLocation", ckp)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name).select($"doc_id").as[Long]
      .collect().toSet
    // one survivor per distinct text across BOTH batches: the state
    // store carried "aa" over the batch boundary
    assert(got.size == 3)
    assert(got.intersect(Set(10L, 12L, 30L)).size == 1) // one "aa"
    assert(got.contains(11L) && got.contains(31L))
  }

  test("nearDedupStream drops cross-batch near-duplicates via the band store") {
    import graft.streaming.StreamDedup
    val src = Files.createTempDirectory("graft_ndstream_src").toString
    val ckp = Files.createTempDirectory("graft_ndstream_ckp").toString
    val store = Files.createTempDirectory("graft_ndstream_store")
      .toString + "/bands"
    val base = "the quick brown fox jumps over the lazy dog " +
      "while seventeen astronauts calibrate their navigation arrays " +
      "before the long voyage home"
    Seq((1L, base),
        (2L, "completely different content describing spark engines " +
          "parquet manifests and shuffle partitions in great detail"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f1")
    // batch 2: doc 3 near-dups doc 1 (boilerplate tail — exact
    // fingerprints differ), doc 4 is novel
    Seq((3L, base + " boilerplate footer"),
        (4L, "entirely novel third document with unique words " +
          "appearing nowhere else in the corpus at all"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = StreamDedup.nearDedupStream(
      stream, "text", "doc_id", store, ckp) { (out, _) =>
      out.select("doc_id").as[Long].collect().foreach(emitted.add); ()
    }
    try q.processAllAvailable() finally q.stop()
    val got = emitted.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSet
    // 3 collides with 1's stored bands regardless of batch split
    assert(!got.contains(3L))
    assert(Set(1L, 2L, 4L).subsetOf(got))
    // the store holds band keys, not text
    val bandStore = StreamDedup.loadBandStore(spark, store)
    assert(bandStore.columns.toSeq == Seq("band"))
    val nBands = bandStore.count()
    assert(nBands > 0)
    // compactStore is schema-agnostic: the band store folds to
    // distinct keys in bounded files and dedups identically after
    val r = StreamDedup.compactStore(spark, store)
    assert(r.filesAfter == 1 && r.distinctFps == nBands)
    val after = StreamDedup.nearDedupBatch(
      Seq((9L, base + " another tiny suffix")).toDF("doc_id", "text"),
      "text", "doc_id", store)
    assert(after.isEmpty) // compacted store still knows doc 1's bands
    after.unpersist()
    // crash-window recovery mirrors the fingerprint store
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".compact-old")))
    assert(StreamDedup.loadBandStore(spark, store).count() == nBands)
  }

  test("event-time tumbling windows aggregate with watermark on a stream") {
    import graft.streaming.EventTime
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft_evt_src").toString
    val raw = spark.read.parquet(s"${SparkFixture.sfDir}/events.parquet")
    val events = raw
      .select(EventTime.asTimestamp(raw, "ts").as("ts"),
        $"event_type", $"value")
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(events.schema).parquet(src)
    val agg = EventTime.windowedAgg(stream, "ts", "1 hour",
      aggs = Seq(count(lit(1)).as("n")),
      groupBy = Seq($"event_type"),
      watermark = Some("10 minutes"))
    val name = "graft_evt_out"
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // batch equivalent must agree (closed windows only differ on the
    // tail; compare via the complete batch computation on total counts)
    val streamed = spark.sql(s"SELECT sum(n) FROM $name").collect().head
    val batch = EventTime.windowedAgg(events, "ts", "1 hour",
      aggs = Seq(count(lit(1)).as("n")), groupBy = Seq($"event_type"))
    assert(batch.count() > 0)
    // every append-mode emitted window row matches the batch result
    val emitted = spark.table(name)
      .select($"window.start", $"event_type", $"n")
    val joined = emitted.join(
      batch.select($"window.start".as("bs"), $"event_type".as("bt"),
        $"n".as("bn")),
      emitted("start") === col("bs") && emitted("event_type") === col("bt"))
    assert(joined.filter($"n" =!= $"bn").count() == 0)
    assert(streamed != null)
  }

  test("session windows group by activity gaps per key") {
    import graft.streaming.EventTime
    import org.apache.spark.sql.functions._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // user 1: two bursts separated by >5min; user 2: one burst
    val df = Seq(
      (1L, ts(0)), (1L, ts(2)), (1L, ts(20)), (1L, ts(21)),
      (2L, ts(5))).toDF("user_id", "ts")
    val sessions = EventTime.sessionAgg(df, "ts", "5 minutes",
      keys = Seq($"user_id"), aggs = Seq(count(lit(1)).as("n")))
    val perUser = sessions.groupBy("user_id").count().as[(Long, Long)]
      .collect().toMap
    assert(perUser(1L) == 2L) // the >5min gap splits the session
    assert(perUser(2L) == 1L)
    val sizes = sessions.filter($"user_id" === 1L)
      .select($"n").as[Long].collect().sorted.toSeq
    assert(sizes == Seq(2L, 2L))
  }

  test("sliding windows overlap: each event lands in window/slide buckets") {
    import graft.streaming.EventTime
    import org.apache.spark.sql.functions._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val df = Seq((new java.sql.Timestamp(base.getTime + 90000L), 1.0))
      .toDF("ts", "v")
    val agg = EventTime.windowedAgg(df, "ts", "2 minutes",
      aggs = Seq(count(lit(1)).as("n")), slide = Some("1 minute"))
    assert(agg.count() == 2) // a point event belongs to 2 overlapping windows
  }

  test("dedupWithinWatermark on batch falls back to dropDuplicates") {
    import graft.streaming.EventTime
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v")
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
    assert(EventTime.dedupWithinWatermark(df, Seq("id"), "ts", "1 minute")
      .count() == 2)
  }

  test("streaming near-dup filter drops repeated texts across batches") {
    import graft.streaming.EventTime
    val src = Files.createTempDirectory("graft_neardup_src").toString
    // two micro-batches; "alpha beta gamma" recurs in both, the second
    // batch also repeats it within itself
    Seq((1L, "alpha beta gamma"), (2L, "unrelated content here"))
      .toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .coalesce(1).write.parquet(s"$src/f1")
    Seq((3L, "alpha beta gamma"), (4L, "alpha beta gamma"),
      (5L, "fresh third document"))
      .toDF("doc_id", "text")
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val filtered = EventTime.nearDupFilterWithinWatermark(
      stream, "text", "ts", "1 hour")
    val q = filtered.writeStream.outputMode("append")
      .format("memory").queryName("graft_neardup_out").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("graft_neardup_out")
      .select($"text").as[String].collect().toSeq
    assert(kept.count(_ == "alpha beta gamma") == 1) // state spans batches
    assert(kept.toSet.size == 3)
    // batch fallback: plain dedup by signature
    val batchKept = EventTime.nearDupFilterWithinWatermark(
      Seq((1L, "x y z"), (2L, "x y z"), (3L, "other"))
        .toDF("doc_id", "text")
        .withColumn("ts",
          org.apache.spark.sql.functions.current_timestamp()),
      "text", "ts", "1 hour")
    assert(batchKept.count() == 2)
    assert(batchKept.columns.toSeq == Seq("doc_id", "text", "ts"))
  }

  test("mapGroupsWithState totals carry across micro-batches") {
    import graft.streaming.Stateful
    val src = Files.createTempDirectory("graft_state_src").toString
    val ckp = Files.createTempDirectory("graft_state_ckp").toString
    // two files => two micro-batches with maxFilesPerTrigger=1, both
    // containing the same keys, so state MUST survive the batch boundary
    Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/f1")
    Seq(("a", 10.0), ("b", 20.0), ("c", 5.0)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema("k STRING, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val q = Stateful.runningTotals(stream, "k", "v").toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckp)
      .format("memory").queryName("graft_state_out").start()
    try q.processAllAvailable() finally q.stop()
    // last update per key carries the cross-batch running totals
    val last = spark.table("graft_state_out")
      .groupBy($"key").agg(
        org.apache.spark.sql.functions.max($"count").as("count"),
        org.apache.spark.sql.functions.max($"sum").as("sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(last("a") == (2L, 11.0))
    assert(last("b") == (2L, 22.0))
    assert(last("c") == (1L, 5.0))
  }

  test("flatMapGroupsWithState emits each key exactly once over the stream") {
    import graft.streaming.Stateful
    val src = Files.createTempDirectory("graft_first_src").toString
    val ckp = Files.createTempDirectory("graft_first_ckp").toString
    Seq("a", "b").toDF("k").coalesce(1).write.parquet(s"$src/f1")
    Seq("a", "c", "b").toDF("k").coalesce(1).write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema("k STRING")
      .option("maxFilesPerTrigger", 1)
      .option("recursiveFileLookup", "true")
      .parquet(src)
    val q = Stateful.firstSeen(stream, "k").toDF("k")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckp)
      .format("memory").queryName("graft_first_out").start()
    try q.processAllAvailable() finally q.stop()
    val seen = spark.table("graft_first_out").as[String].collect().toSeq
    assert(seen.sorted == Seq("a", "b", "c")) // no second emission of a/b
  }

  test("kafka option mapping translates the Glue vocabulary (S7)") {
    val glue = Map(
      "connectionName"    -> "my-conn",          // job-side, dropped
      "classification"    -> "json",             // payload format, dropped
      "bootstrap.servers" -> "b-1:9092,b-2:9092",
      "topicName"         -> "clicks",
      "startingOffsets"   -> "earliest",
      "maxOffsetsPerTrigger" -> "10000",
      "pollTimeoutMs"     -> "1200",
      "security.protocol" -> "SASL_SSL",
      "kafka.fetch.min.bytes" -> "1",
      "numRetries"        -> "3")                // Glue retry knob, dropped
    val mapped = graft.streaming.StreamSources.kafkaOptions(glue)
    assert(mapped == Map(
      "kafka.bootstrap.servers" -> "b-1:9092,b-2:9092",
      "subscribe"               -> "clicks",
      "startingOffsets"         -> "earliest",
      "maxOffsetsPerTrigger"    -> "10000",
      "kafkaConsumer.pollTimeoutMs" -> "1200",
      "kafka.security.protocol" -> "SASL_SSL",
      "kafka.fetch.min.bytes"   -> "1"))
    // the two mandatory pieces are validated
    intercept[IllegalArgumentException] {
      graft.streaming.StreamSources.kafkaOptions(
        Map("topicName" -> "clicks"))
    }
    intercept[IllegalArgumentException] {
      graft.streaming.StreamSources.kafkaOptions(
        Map("bootstrap.servers" -> "b:9092"))
    }
  }

  test("fileStream constructs a schema'd streaming source") {
    val src = Files.createTempDirectory("graft_filestream").toString
    val events = spark.read.parquet(s"${SparkFixture.sfDir}/events.parquet")
      .select($"event_id", $"event_type")
    events.limit(10).write.mode("overwrite").parquet(src)
    val stream = graft.streaming.StreamSources.fileStream(
      spark, "parquet", src, events.schema)
    assert(stream.isStreaming)
    assert(stream.schema == events.schema)
  }

  test("sampleStream polls a memory sink and returns a bounded batch") {
    val src = Files.createTempDirectory("graft_sample_src").toString
    val events = spark.read.parquet(s"${SparkFixture.sfDir}/events.parquet")
      .select($"event_id", $"event_type")
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(events.schema).parquet(src)
    val sample = MicroBatch.sampleStream(spark, stream,
      windowSize = "1 seconds", pollingTimeMs = 30000, recordPollingLimit = 25)
    assert(sample.count() == 25)
    intercept[IllegalArgumentException] {
      MicroBatch.sampleStream(spark, stream, "10 seconds", pollingTimeMs = 5)
    }
  }

  test("intervalJoin (batch): exactly the in-bound pairs, prefixed schema") {
    import org.apache.spark.sql.functions._
    val l = Seq((1L, 100L), (1L, 200L), (2L, 100L)).toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val r = Seq((1L, 103L), (1L, 150L), (2L, 94L), (3L, 100L))
      .toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = graft.streaming.StreamJoins.intervalJoin(
      l, r, "k", "ts", "ts", "10 seconds", "5 seconds", "5 seconds")
    assert(out.columns.toSeq == Seq("l_k", "l_ts", "r_k", "r_ts"))
    val pairs = out.selectExpr(
      "l_k", "CAST(l_ts AS LONG)", "CAST(r_ts AS LONG)")
      .as[(Long, Long, Long)].collect().toSet
    // (1,100) matches r 103 (within +5) but not 150; (2,100) matches
    // r 94? 94 < 100-5 → no. (1,200) matches nothing.
    assert(pairs == Set((1L, 100L, 103L)))
  }

  test("intervalJoin (streams): matches arrive across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ls = MemoryStream[(Long, Long)]
    val rs = MemoryStream[(Long, Long)]
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .toDF("k", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val joined = graft.streaming.StreamJoins.intervalJoin(
      shape(ls.toDF()), shape(rs.toDF()),
      "k", "ts", "ts", "30 seconds", "5 seconds", "5 seconds")
    val dir = Files.createTempDirectory("graft_ssj").toString
    val q = joined.writeStream.format("memory")
      .queryName("graft_ssj_out")
      .option("checkpointLocation", s"$dir/ck").start()
    try {
      ls.addData((1L, 100L), (2L, 200L))
      q.processAllAvailable()
      assert(spark.table("graft_ssj_out").count() == 0) // no right side yet
      rs.addData((1L, 104L), (2L, 300L)) // second out of bound
      q.processAllAvailable()
      val got = spark.table("graft_ssj_out")
        .selectExpr("l_k", "CAST(r_ts AS LONG)")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 104L)))
    } finally q.stop()
  }

  test("semDedupStream: micro-batch ingestion over the committed band " +
      "family equals batch-mode ingest AND full-recompute semDedup") {
    import graft.ml.{IncrementalSemDedup, Similarity}
    import graft.streaming.StreamDedup
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft_sds_src").toString
    val ckp = Files.createTempDirectory("graft_sds_ckp").toString
    val store = Files.createTempDirectory("graft_sds_store")
      .toString + "/s"
    // v3 (batch 2) bridges v1 and v2 (batch 1) — the cross-batch
    // transitivity case; v4 is novel
    val b1 = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    val b2 = Seq(
      (3L, Array(0.7071f, 0.7071f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, -1.0f, 0.3f)))
    b1.toDF("id", "vec").coalesce(1).write.parquet(s"$src/f1")
    b2.toDF("id", "vec").coalesce(1).write.parquet(s"$src/f2")
    IncrementalSemDedup.initStore(spark, store, dim = 4,
      minCosine = 0.6, planesPerBand = 1, bands = 16)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = StreamDedup.semDedupStream(
      spark.readStream.schema("id LONG, vec ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(src),
      "id", "vec", store, ckp) { (out, _) =>
      out.select("id").as[Long].collect().foreach(emitted.add); ()
    }
    try q.processAllAvailable() finally q.stop()
    val got = emitted.toArray(Array.empty[java.lang.Long])
      .map(_.toLong).toSet
    // per-batch emissions: 1, 2 (batch 1 — nothing to collide with),
    // then 4 only (3 bridges into {1,2} and loses to min id 1)
    assert(got == Set(1L, 2L, 4L), s"stream emissions: $got")
    // the store's authoritative set == full-recompute over the union
    // (2 was demoted AFTER emission — the stated provisional contract)
    val fin = IncrementalSemDedup.survivors(spark, store)
      .as[Long].collect().toSet
    val full = Similarity.semDedup(
        (b1 ++ b2).toDF("id", "vec"), "id", "vec",
        dim = 4, minCosine = 0.6, planes = 1, bands = 16)
      .select($"id").as[Long].collect().toSet
    assert(fin == full && fin == Set(1L, 4L),
      s"stream store survivors $fin != full recompute $full")
  }
}
