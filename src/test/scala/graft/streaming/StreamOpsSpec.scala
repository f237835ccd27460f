package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming counterparts of the batch training-data operators (§2.9
  * extension): exact dedup on content hash during ingestion, watermark-
  * bounded dedup state, and the stream-stream interval join. Same column
  * transforms as the batch d01/q21 paths — only the source/sink change.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming exact dedup drops repeated content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val deduped = input.toDS().toDF("doc_id", "text")
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    input.addData(Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")))
    q.processAllAvailable()
    // later micro-batch re-sends known content plus one new doc: only the
    // new one survives (state remembers earlier batches)
    input.addData(Seq((4L, "beta"), (5L, "gamma")))
    q.processAllAvailable()
    val kept = spark.table("sdedup_out").select("doc_id")
      .as[Long].collect().toSet
    q.stop()
    assert(kept == Set(1L, 2L, 5L))
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = input.toDS().toDF("ts", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("text"))
    val q = deduped.writeStream.format("memory").queryName("sdedup_wm_out")
      .outputMode("append").start()
    // duplicate inside the watermark window -> dropped
    input.addData(Seq(
      (ts("2024-01-15 10:00:00"), "alpha"),
      (ts("2024-01-15 10:05:00"), "alpha")))
    q.processAllAvailable()
    // advance the watermark far past the first occurrences, then re-send:
    // state for "alpha" has expired, so the re-send is emitted again —
    // that's the contract that keeps dedup state bounded on an unbounded
    // stream (exact-forever dedup needs the batch d01/d06 path instead)
    input.addData(Seq((ts("2024-01-15 12:00:00"), "advance")))
    q.processAllAvailable()
    input.addData(Seq((ts("2024-01-15 12:01:00"), "alpha")))
    q.processAllAvailable()
    val emitted = spark.table("sdedup_wm_out").select("ts", "text")
      .as[(Timestamp, String)].collect().toSeq
    q.stop()
    assert(emitted.count(_._2 == "alpha") == 2,
      s"expected first occurrence + post-expiry re-emit, got $emitted")
    assert(!emitted.contains((ts("2024-01-15 10:05:00"), "alpha")))
  }

  test("streaming LSH candidates: a near-dup arriving in a LATER micro-" +
      "batch pairs against the original; disjoint content emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val distinct = "one two three four five six seven eight nine ten"
    val input = MemoryStream[(Long, String)]
    val cands = StreamDedup.lshCandidates(input.toDS().toDF("doc_id", "text"))
    val q = cands.writeStream.format("memory").queryName("slsh_out")
      .outputMode("append").start()
    input.addData(Seq((1L, base), (2L, distinct)))
    q.processAllAvailable()
    // batch 2: doc 3 is byte-identical to doc 1 (all 6 bands collide) and
    // doc 4 shares nothing — state from batch 1 must drive the pairing
    input.addData(Seq((3L, base), (4L, "ABC DEF GHI JKL MNO PQR STU VWX")))
    q.processAllAvailable()
    val out = spark.table("slsh_out")
      .as[StreamDedup.Candidate].collect().toSeq
    q.stop()
    assert(out.map(_.doc_id).toSet == Set(3L), s"unexpected candidates: $out")
    assert(out.forall(_.dup_of == 1L), s"owner must be the first-seen doc: $out")
    assert(out.size == 6, s"identical text must collide on all 6 bands: $out")
  }

  test("streaming LSH candidates: within-batch near-dups pair against the " +
      "lowest doc_id; the same transform runs in batch mode") {
    implicit val sqlCtx = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog again today"
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup.lshCandidates(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("slsh_wb_out")
      .outputMode("append").start()
    input.addData(Seq((7L, text), (5L, text), (9L, text)))
    q.processAllAvailable()
    val out = spark.table("slsh_wb_out")
      .as[StreamDedup.Candidate].collect().toSeq
    q.stop()
    assert(out.nonEmpty && out.forall(_.dup_of == 5L), s"$out")
    assert(out.map(_.doc_id).toSet == Set(7L, 9L), s"$out")
    // batch execution of the same function: state starts empty per group,
    // so within-batch pairing is the whole output — stream/batch parity
    val batch = StreamDedup.lshCandidates(
      Seq((7L, text), (5L, text), (9L, text)).toDF("doc_id", "text"))
      .collect().toSeq
    assert(batch.toSet == out.toSet,
      s"batch run must match the single-micro-batch stream: $batch vs $out")
    // a doc too short for a 3-shingle has no signature and never keys state
    val empty = StreamDedup.lshCandidates(
      Seq((1L, "ab cd"), (2L, "ab cd")).toDF("doc_id", "text")).collect()
    assert(empty.isEmpty, s"short docs must drop out: ${empty.toSeq}")
  }

  test("stream-stream interval join pairs purchases with recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDS().toDF("click_ts", "c_user")
      .withWatermark("click_ts", "1 hour")
    val p = purchases.toDS().toDF("purchase_ts", "p_user")
      .withWatermark("purchase_ts", "1 hour")
    // inner interval join: click within 30 minutes before the purchase;
    // both watermarks bound the buffered state on each side
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData(Seq(
      (ts("2024-01-15 10:00:00"), 1L),   // in range for the 10:20 purchase
      (ts("2024-01-15 09:00:00"), 2L)))  // too old for the 10:00 purchase
    purchases.addData(Seq(
      (ts("2024-01-15 10:20:00"), 1L),
      (ts("2024-01-15 10:00:00"), 2L)))
    q.processAllAvailable()
    val rows = spark.table("ssj_out")
      .select("p_user", "purchase_ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    q.stop()
    assert(rows == Set((1L, ts("2024-01-15 10:20:00"), ts("2024-01-15 10:00:00"))))
  }

  test("streaming decontamination: stream-static shingle join flags docs " +
      "overlapping the eval set; same transform runs in batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.functions.TextFns
    val evalShingles = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
      .select(lit(100L).as("bench_id"),
        explode(array_distinct(TextFns.shingles(col("text"), 3))).as("s"))
    val d1 = (1L, "alpha beta gamma delta xx yy")   // 2 shared shingles
    val d2 = (2L, "one two three four five")        // 0 shared
    val d3 = (3L, "beta gamma delta epsilon zeta qq") // 3 shared
    val input = MemoryStream[(Long, String)]
    val q = StreamDedup
      .decontaminate(input.toDS().toDF("doc_id", "text"), evalShingles)
      .writeStream.format("memory").queryName("sdecon_out")
      .outputMode("update").start()
    input.addData(Seq(d1, d2))
    q.processAllAvailable()
    input.addData(Seq(d3))
    q.processAllAvailable()
    // at-least-once replay: re-delivered rows must NOT double the counts
    // (the stateful triple-dedup before the aggregation absorbs them) —
    // without it doc 2 stays clean but doc 1 would jump from 2 to 4
    input.addData(Seq(d1, d3))
    q.processAllAvailable()
    // update mode re-emits a key when its count grows; keep the final value
    val streamed = spark.table("sdecon_out")
      .groupBy("doc_id", "bench_id").agg(max("n_shared").as("n_shared"))
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(streamed == Set((1L, 100L, 2L), (3L, 100L, 3L)), s"got $streamed")

    val batch = StreamDedup
      .decontaminate(Seq(d1, d2, d3).toDF("doc_id", "text"), evalShingles)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == streamed, s"stream/batch divergence: $batch vs $streamed")
  }

  test("streaming sequence packing continues each source's token total " +
      "across micro-batches; batch mode reproduces the w04 placement") {
    implicit val sqlCtx = spark.sqlContext
    // budget 10: doc 1 (4 tokens) fills 0..3 of pack 0; doc 2 (3) takes
    // 4..6; the NEXT BATCH's doc 3 (5 tokens) must start at offset 7 and
    // straddle into pack 1 — state carries the running total. srcB packs
    // independently.
    val rows1 = Seq(
      (1L, "srcA", "a b c d"), (2L, "srcA", "e f g"),
      (10L, "srcB", "x y z"))
    val rows2 = Seq((3L, "srcA", "h i j k l"), (11L, "srcB", "w v"))
    val input = MemoryStream[(Long, String, String)]
    val q = StreamPack.packStream(
      input.toDS().toDF("doc_id", "source", "text"), budget = 10L)
      .writeStream.format("memory").queryName("spack_out")
      .outputMode("append").start()
    input.addData(rows1)
    q.processAllAvailable()
    input.addData(rows2)
    q.processAllAvailable()
    val out = spark.table("spack_out").as[StreamPack.Packed]
      .collect().map(p => p.doc_id -> (p.pack_id, p.pack_offset)).toMap
    q.stop()
    assert(out(1L) == (0L, 0L) && out(2L) == (0L, 4L), s"$out")
    assert(out(3L) == (0L, 7L),
      s"batch-2 doc must continue from the stored total: $out")
    assert(out(10L) == (0L, 0L) && out(11L) == (0L, 3L), s"$out")
    // batch mode on the full set = the batch w04 formulation (single
    // window per source over doc_id order) at the same budget
    val all = (rows1 ++ rows2).toDF("doc_id", "source", "text")
    val batch = StreamPack.packStream(all, budget = 10L)
      .collect().map(p => p.doc_id -> (p.pack_id, p.pack_offset)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
    val naive = all.select(col("doc_id"), col("source"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .select(col("doc_id"), ((col("cum") - col("n")) / 10).cast("long").as("p"),
        (col("cum") - col("n")) % 10).as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(batch == naive, s"stream-fn batch run vs w04 window: $batch vs $naive")
  }

  test("streaming sequence packing: the running total survives a QUERY " +
      "RESTART via the checkpoint (the production recovery contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val packed = StreamPack.packStream(
      input.toDS().toDF("doc_id", "source", "text"), budget = 10L)
    val ckpt = java.nio.file.Files.createTempDirectory("spack_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("spack_out").toString
    def drain(): Unit = {
      val q = packed.writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(20000)
      q.stop()
    }
    input.addData(Seq((1L, "srcA", "a b c d"), (2L, "srcA", "e f g")))
    drain() // 7 tokens consumed, query STOPS
    input.addData(Seq((3L, "srcA", "h i j k l")))
    drain() // a NEW query instance must resume cum=7 from the checkpoint
    val out = spark.read.schema(
      org.apache.spark.sql.Encoders.product[StreamPack.Packed].schema)
      .parquet(outDir).as[StreamPack.Packed]
      .collect().map(p => p.doc_id -> (p.pack_id, p.pack_offset)).toMap
    assert(out(1L) == (0L, 0L) && out(2L) == (0L, 4L), s"$out")
    assert(out(3L) == (0L, 7L),
      s"restarted query lost the running total: $out")
  }

  test("packStreamExactlyOnce: a re-delivered document (at-least-once " +
      "replay) is dropped before the accumulator — later offsets unshifted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = StreamPack.packStreamExactlyOnce(
      input.toDS().toDF("doc_id", "source", "text"), budget = 10L)
      .writeStream.format("memory").queryName("spack_eo_out")
      .outputMode("append").start()
    input.addData(Seq((1L, "srcA", "a b c d"), (2L, "srcA", "e f g")))
    q.processAllAvailable()
    // the source replays doc 2 alongside the genuinely-new doc 3: raw
    // packStream would re-place doc 2 (cum 7 -> 10) and shift doc 3 to
    // offset 0 of pack 1; the dedup must keep doc 3 at offset 7
    input.addData(Seq((2L, "srcA", "e f g"), (3L, "srcA", "h i j k l")))
    q.processAllAvailable()
    val rows = spark.table("spack_eo_out").as[StreamPack.Packed].collect()
    q.stop()
    assert(rows.count(_.doc_id == 2L) == 1,
      s"replayed doc placed twice: ${rows.mkString(", ")}")
    val out = rows.map(p => p.doc_id -> (p.pack_id, p.pack_offset)).toMap
    assert(out(1L) == (0L, 0L) && out(2L) == (0L, 4L), s"$out")
    assert(out(3L) == (0L, 7L),
      s"replay shifted the later document's offset: $out")
  }

  test("streaming bottom-k sample: across micro-batches (with a replay) " +
      "the final membership equals batch w08 over the union — eviction, " +
      "idempotence, and stream/batch parity in one run") {
    implicit val sqlCtx = spark.sqlContext
    // two sources, ids split across batches; batch 2 REPLAYS id 11 and
    // delivers enough new ids that some batch-1 members must be evicted
    val b1 = (1L to 15L).map((_, "srcA")) ++ Seq((100L, "srcB"), (101L, "srcB"))
    val b2 = (16L to 30L).map((_, "srcA")) ++
      Seq((11L, "srcA"), (102L, "srcB"), (103L, "srcB"))
    val input = MemoryStream[(Long, String)]
    val q = StreamSample.sampleStream(
      input.toDS().toDF("doc_id", "source"), k = 5)
      .writeStream.format("memory").queryName("ssample_out")
      .outputMode("update").start()
    input.addData(b1)
    q.processAllAvailable()
    input.addData(b2)
    q.processAllAvailable()
    val rows = spark.table("ssample_out").as[StreamSample.Sample].collect()
    q.stop()
    // the latest emission per source carries the max deliveries counter
    val latest = rows.groupBy(_.source).map { case (s, rs) =>
      s -> rs.maxBy(_.n_delivered)
    }
    // replay accounting: srcA delivered 15 + 16 rows (one a replay)
    assert(latest("srcA").n_delivered == 31, latest("srcA").toString)
    // oracle: the batch single-window bottom-k over the DISTINCT union —
    // the same construction the w08 query ranks with (hashes computed
    // through the same public column API)
    val all = (b1 ++ b2).map(_._1).distinct
    val hashOf = all.toDF("doc_id")
      .select(col("doc_id"), graft.functions.TextFns
        .md5Hash32(col("doc_id").cast("string"), seed = 8).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expect(src: String, ids: Seq[Long]) = {
      val tagged = ids.map(id => (hashOf(id), id)).sorted.take(5)
      val got = latest(src)
      assert(got.doc_ids == tagged.map(_._2) && got.hashes == tagged.map(_._1),
        s"$src: got $got, want $tagged")
    }
    expect("srcA", all.filter(_ < 100L))
    expect("srcB", all.filter(_ >= 100L))
    // batch mode on the union reproduces the same membership (state
    // starts empty per group — the stream/batch parity contract)
    val batchRows = StreamSample.sampleStream(
      (b1 ++ b2).toDF("doc_id", "source"), k = 5)
      .collect().map(s => s.source -> s).toMap
    assert(batchRows("srcA").doc_ids == latest("srcA").doc_ids)
    assert(batchRows("srcB").doc_ids == latest("srcB").doc_ids)
  }

  test("streaming bottom-k sample: the sketch state survives a QUERY " +
      "RESTART via the checkpoint (the production recovery contract)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sampled = StreamSample.sampleStream(
      input.toDS().toDF("doc_id", "source"), k = 3)
    val ckpt = java.nio.file.Files.createTempDirectory("ssample_ckpt").toString
    // mapGroupsWithState forces Update mode, which file sinks reject —
    // collect the per-batch revision rows through foreachBatch instead
    val emitted = new scala.collection.mutable.ArrayBuffer[StreamSample.Sample]
    def drain(): Unit = {
      val q = sampled.writeStream
        .foreachBatch { (batch: Dataset[StreamSample.Sample], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(20000)
      q.stop()
    }
    input.addData((1L to 8L).map((_, "srcA")))
    drain() // 8 delivered, query STOPS
    input.addData((9L to 16L).map((_, "srcA")))
    drain() // a NEW query instance must resume the k-set from the checkpoint
    val last = emitted.maxBy(_.n_delivered)
    assert(last.n_delivered == 16,
      s"restarted query lost the deliveries counter: $emitted")
    val hashOf16 = (1L to 16L).toDF("doc_id")
      .select(col("doc_id"), graft.functions.TextFns
        .md5Hash32(col("doc_id").cast("string"), seed = 8).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(3)
    assert(last.doc_ids == hashOf16.map(_._2).toSeq,
      s"restarted query lost the bottom-k membership: $last vs $hashOf16")
  }
}
