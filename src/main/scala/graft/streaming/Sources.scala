package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Streaming source/sink wiring — the reference's Kafka topology
  * (`src/spark/transaction_processor.py:154-216`,
  * `src/config/kafka_config.yml`) mapped to Structured Streaming.
  *
  * Kafka itself is not running in this environment; the Kafka builders
  * return fully-configured readers/writers (exercised to the point of
  * plan construction in tests), and file/memory sources drive the same
  * stages end-to-end for executable coverage.
  */
object Sources {

  /** S1: Kafka streaming source — subscribe from earliest
    * (`transaction_processor.py:154-160`). */
  def kafkaReader(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()

  /** S2: Kafka streaming sink — checkpointed, append mode, 10 s
    * processing-time trigger (`transaction_processor.py:187-205`,
    * `spark_config.yml:46-47`). */
  def kafkaWriter(df: DataFrame, brokers: String, topic: String,
                  checkpoint: String): DataStreamWriter[Row] =
    StreamPipeline.kafkaSinkShape(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("10 seconds"))

  /** S3: console debug sink — complete mode, untruncated, 10 s
    * processing-time trigger, exactly the reference's debugging output
    * (`transaction_processor.py:200-205`, `spark_config.yml:46-47`).
    * The reference points this at its windowed AGGREGATION, where
    * complete mode is legal; for a row-level stream pass
    * `mode = "append"` — Spark rejects complete without an
    * aggregation at start(). */
  def consoleWriter(df: DataFrame,
                    mode: String = "complete"): DataStreamWriter[Row] =
    df.writeStream
      .format("console")
      .option("truncate", "false")
      .outputMode(mode)
      .trigger(Trigger.ProcessingTime("10 seconds"))

  /** S9: the alerts-route predicate for the banking.alerts topic
    * (`kafka_config.yml:25`): transactions that need operator
    * attention — failed ones and large ones (the enrich stage's
    * large_* categories). */
  val isAlert: org.apache.spark.sql.Column =
    col("status") === "failed" || col("transaction_category").startsWith("large_")

  /** File-based streaming source over a directory of JSON transaction
    * files — same schema path as the Kafka value column. */
  def jsonDirReader(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(graft.pipeline.Schemas.transactionSchema)
      .json(dir)

  /** S8: one-pass dual-sink via foreachBatch — valid records to the
    * main sink, invalid to the dead-letter sink (parquet dirs standing
    * in for the banking.processed / banking.deadletter topics,
    * `kafka_config.yml:24,29`). Both branch writes go through
    * [[writeBatchIdempotent]]: a crash between the writes and the
    * checkpoint's offset commit replays the batch, and a plain append
    * would land every row twice. */
  def dualSinkQuery(parsed: DataFrame, mainDir: String, deadDir: String,
                    checkpoint: String): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Pin the micro-batch so the two branch writes share one source
        // scan instead of each re-reading and re-parsing the batch.
        batch.persist()
        try {
          val (valid, dead) = StreamPipeline.deadLetterSplit(batch)
          writeBatchIdempotent(valid, mainDir, batchId)
          writeBatchIdempotent(dead, deadDir, batchId)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** S8+S9: one-pass triple routing via foreachBatch — valid records
    * to the main sink, invalid to dead-letter, alerts (failed/large,
    * a subset of the enriched stream like the reference's
    * banking.alerts topic) to the alerts sink. One source scan feeds
    * all three branches. */
  def routedSinkQuery(parsed: DataFrame, mainDir: String, deadDir: String,
                      alertDir: String, checkpoint: String): StreamingQuery =
    parsed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // One source scan feeds all three branches: persist the batch,
        // else each .write re-reads and re-parses the source. All
        // three writes are idempotent under crash-replay (see
        // dualSinkQuery).
        batch.persist()
        try {
          val (valid, dead) = StreamPipeline.deadLetterSplit(batch)
          val enriched = StreamPipeline.enrich(valid)
          writeBatchIdempotent(enriched, mainDir, batchId)
          writeBatchIdempotent(dead, deadDir, batchId)
          writeBatchIdempotent(enriched.filter(isAlert), alertDir, batchId)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** S8 retry loop: the reference's `banking.retry` topic
    * (`src/config/kafka_config.yml:28-30`) re-expressed as a file-source
    * feedback loop — the one Kafka topology piece that was previously
    * missing. Retryable failures (well-formed record, unknown account —
    * see [[StreamPipeline.isRetryableFailure]]) are parked in `retryDir`
    * with `retry_count + 1`; the SAME query's source is the fresh stream
    * UNIONed with a stream over `retryDir`, so parked records re-enter
    * on the next trigger exactly like a consumer subscribed to
    * input+retry topics. `maxRetries` bounds the loop: a record that
    * never heals dead-letters after its last re-ingestion, so the
    * feedback converges. The empty-park guard matters: writing an empty
    * file per trigger would make the file source see "new data" forever
    * and the loop would never quiesce. */
  def retryLoopQuery(fresh: DataFrame, retryDir: String, mainDir: String,
                     deadDir: String, checkpoint: String,
                     maxRetries: Int = 3): StreamingQuery = {
    val spark = fresh.sparkSession
    // Hadoop FileSystem, not java.io.File: the retry dir must be
    // creatable on WHATEVER filesystem the path names (HDFS/S3/local);
    // a driver-local mkdirs on an object-store URI creates garbage and
    // the parquet source then fails at start.
    val retryPath = new org.apache.hadoop.fs.Path(retryDir)
    retryPath.getFileSystem(spark.sessionState.newHadoopConf())
      .mkdirs(retryPath)
    val retrySchema = graft.pipeline.Schemas.transactionSchema
      .add("retry_count", org.apache.spark.sql.types.IntegerType)
    // Glob over per-batch SUBDIRECTORIES: each trigger parks its
    // retryables under batch_<id>/, written with overwrite, so a
    // crash-replay of batch N REPLACES its own park instead of
    // appending a second copy that would re-ingest independently and
    // amplify duplicates through the feedback loop. main/dead writes
    // are idempotent the usual way.
    val retries = spark.readStream.schema(retrySchema)
      .parquet(s"$retryDir/batch_*")
    fresh.withColumn("retry_count", lit(0))
      .unionByName(retries)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val (valid, retry, dead) = StreamPipeline.retrySplit(batch, maxRetries)
          writeBatchIdempotent(valid, mainDir, batchId)
          writeBatchIdempotent(dead, deadDir, batchId)
          val parked = retry
            .withColumn("retry_count", (col("retry_count") + 1).cast("int"))
            .drop("is_valid", "validation_result")
          // empty-park guard: an empty per-trigger write would make the
          // file source see "new data" forever and never quiesce
          if (!parked.isEmpty)
            parked.write.mode("overwrite").parquet(s"$retryDir/batch_$batchId")
        } finally { batch.unpersist(); () }
      }
      .start()
  }

  /** Streaming near-duplicate dedup — the streaming end-game of the
    * two-stage MinHash index: each micro-batch of documents is LSH-
    * checked against the persisted shingle index, near-dups are
    * dropped, and the surviving documents are appended to BOTH the
    * clean sink and the index, so every later batch dedups against
    * them. Within a batch the lower doc_id survives; against the index
    * the indexed document always survives.
    *
    * Per-trigger cost: |batch| hashing + a band-key join against the
    * index's stored signatures (never a corpus re-hash — see
    * [[graft.llm.Dedup.minhashLshPairsIncremental]]). Cold start: a
    * missing index means the first batch dedups within itself and its
    * survivors CREATE the index. Exactly-once: both sinks partition by
    * micro_batch_id with dynamic partition overwrite, so a crash-replay of
    * batch N replaces its own partitions — clean sink and index can
    * never diverge across a retry. */
  def nearDupDedupQuery(docs: DataFrame, indexPath: String, cleanDir: String,
                        checkpoint: String,
                        threshold: Double = 0.8): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.persist()
        try {
          val pairs = graft.llm.Dedup
            .minhashLshPairsIncremental(spark, indexPath, batch)
            .filter(col("jaccard") >= threshold)
          // batch doc x is a dup iff some partner p is indexed (not in
          // the batch) or is an earlier batch doc (p < x)
          val partners = pairs.select(col("doc_a").as("x"), col("doc_b").as("p"))
            .union(pairs.select(col("doc_b").as("x"), col("doc_a").as("p")))
          val ids = batch.select(col("doc_id"))
          val dupIds = partners
            .join(ids.withColumnRenamed("doc_id", "x"), Seq("x"), "left_semi")
            .join(ids.select(col("doc_id").as("p")).withColumn("in_batch", lit(true)),
              Seq("p"), "left")
            .filter(!coalesce(col("in_batch"), lit(false)) || col("p") < col("x"))
            .select(col("x").as("doc_id")).distinct()
          // eager localCheckpoint: the index append below must not
          // re-run a lineage that READS indexPath while writing to it
          val clean = batch.join(dupIds, Seq("doc_id"), "left_anti")
            .localCheckpoint()
          writeBatchIdempotent(clean, cleanDir, batchId)
          graft.llm.Dedup.appendShingleIndexForBatch(clean, indexPath, batchId)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Streaming SEMANTIC dedup — [[nearDupDedupQuery]]'s shape in
    * embedding space: each micro-batch of (vec_id, embedding) rows is
    * sign-LSH-checked against the persisted vector index
    * ([[graft.llm.Similarity.writeLshIndex]] layout), near-dups
    * (cosine ≥ threshold) are dropped, and survivors append to BOTH
    * the clean sink and the index so every later batch dedups against
    * them. Within a batch the lower vec_id survives; against the
    * index the indexed vector always survives. NULL embeddings have
    * no geometry, can never be dups, and pass through.
    *
    * Per-trigger cost: |batch| hashing (at the index's STORED width)
    * + one band join against stored buckets — the corpus is never
    * re-hashed. Cold start: the first batch dedups within itself and
    * its survivors create the index at the batch-adaptive width,
    * which the index then pins for every later batch. Exactly-once:
    * both sinks partition by micro-batch with dynamic partition
    * overwrite ([[writeBatchIdempotent]] / batch_id partitions), so a
    * crash-replay of batch N replaces its own partitions. */
  def semanticDedupQuery(emb: DataFrame, indexPath: String, cleanDir: String,
                         checkpoint: String,
                         threshold: Double = 0.9,
                         multiProbe: Boolean = false): StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.persist()
        try {
          // ONE width per trigger, resolved before the dedup and passed
          // to the append too: recomputing after the dedup would size
          // from the survivor count and could pin a cold-start index
          // narrower than the width the dedup actually probed at
          val np = graft.llm.Similarity
            .resolveIndexWidth(spark, indexPath, batch)
          // directed pairs: vec_a is always a batch member; the probe
          // ring (when on) fans out the batch side only — recall lift
          // at |batch|-proportional extra cost, never a corpus expand
          val pairs = graft.llm.Similarity
            .lshPairsIncremental(spark, indexPath, batch, threshold, np,
              multiProbe)
          val dupIds = pairs
            .join(batch.select(col("vec_id").as("vec_b"))
                .withColumn("in_batch", lit(true)),
              Seq("vec_b"), "left")
            .filter(!coalesce(col("in_batch"), lit(false)) ||
              col("vec_b") < col("vec_a"))
            .select(col("vec_a").as("vec_id")).distinct()
          // eager localCheckpoint: the index append below must not
          // re-run a lineage that READS indexPath while writing to it
          val clean = batch.join(dupIds, Seq("vec_id"), "left_anti")
            .localCheckpoint()
          writeBatchIdempotent(clean, cleanDir, batchId)
          graft.llm.Similarity.appendLshIndexForBatch(
            clean, indexPath, batchId, np)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Streaming WEB FIRST MILE (round 11, VERDICT r10 task 4) — URL
    * mirror dedup maintained incrementally, the crawl-side twin of
    * [[semanticDedupQuery]]: each micro-batch of documents parses its
    * URLs with the native [[graft.functions.UrlParts]] state machine
    * and collapses (registrable domain, normalized path) mirrors
    * against a PERSISTED key index — a page keeps iff its key is
    * absent from prior batches' index AND it is the min doc_id for
    * the key within its batch, which under monotone-id arrival
    * reproduces the batch [[graft.llm.Curate.urlDedup]] keep verdict
    * exactly (minus the corpus-global n_copies a streaming artifact
    * cannot know — the curation-ledger schema caveat). Per-trigger
    * cost: |batch| map-only parsing + one key join against stored
    * state; no pair expansion at any mirror density. Exactly-once:
    * verdicts land via [[writeBatchIdempotent]]; novel keys append
    * into batch_id partitions read back with the `batch_id <
    * currentBatch` replay filter; the state root's write lease makes
    * appends and [[compactUrlState]] mutually exclusive. */
  def urlDedupQuery(docs: DataFrame, statePath: String, outDir: String,
                    checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        graft.functions.GraftFunctions.registerAll(spark)
        batch.persist()
        try {
          // acquire INSIDE the try (ADVICE r11): a lease-conflict
          // require must reach the finally's unpersist, or the failed
          // trigger leaks the persisted batch in the executor cache
          // for the lifetime of the stopped query
          graft.llm.Similarity.acquireIndexLease(
            spark, statePath, s"append:$batchId")
          val parsed = batch.filter(col("doc_id").isNotNull)
            .withColumn("u",
              call_function("url_parts", expr(graft.llm.Curate.UrlGenSql)))
            .select(col("doc_id"), col("u.domain").as("domain"),
              col("u.path").as("path"))
          val p = new org.apache.hadoop.fs.Path(statePath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          val seen =
            if (hasData)
              spark.read.parquet(statePath)
                .filter(col("batch_id") < lit(batchId))
                .select("domain", "path")
            else Seq.empty[(String, String)].toDF("domain", "path")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("domain", "path")
          val verdict = parsed
            .withColumn("first_in_batch",
              col("doc_id") === min(col("doc_id")).over(w))
            .join(seen.withColumn("indexed", lit(true)),
              Seq("domain", "path"), "left")
            .withColumn("keep",
              col("first_in_batch") && !coalesce(col("indexed"), lit(false)))
            .select("doc_id", "domain", "path", "keep")
            .localCheckpoint()
          val novel = parsed.select("domain", "path").distinct()
            .join(seen, Seq("domain", "path"), "left_anti")
            .localCheckpoint() // sever the statePath read before writing it
          writeBatchIdempotent(verdict, outDir, batchId)
          novel.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statePath)
          graft.llm.Similarity.releaseIndexLease(spark, statePath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Small-files maintenance for the URL-key state: same contract as
    * [[compactPackState]] (quiesced stream only, lease-enforced). */
  def compactUrlState(spark: SparkSession, statePath: String): Unit = {
    graft.llm.Similarity.acquireIndexLease(spark, statePath, "compact")
    graft.llm.Similarity.compactBatchPartitionsLocked(spark, statePath)
    graft.llm.Similarity.releaseIndexLease(spark, statePath)
  }

  /** Streaming CURATION LEDGER (round 10, VERDICT r9 task 7) — the
    * cross-modal keep/drop artifact
    * ([[graft.llm.Multimodal.curationLedger]]) maintained
    * incrementally: a new document's verdict lands without
    * recomputing the corpus. Canonicality, the only corpus-relative
    * part of the ledger, is resolved against three persisted
    * fingerprint indexes under `statePath` (text md5 / image
    * perceptual hash / audio PCM fingerprint — video's slideshow flag
    * is document-local); per-trigger cost is |batch| decode+hash work
    * plus three fingerprint joins against stored state. A document
    * keeps a modality iff its fingerprint is absent from the index
    * AND it is the min doc_id for that fingerprint within its batch —
    * under the ledger's monotone-id arrival order this reproduces the
    * batch verdict exactly ([[graft.llm.Multimodal.curationLedger]]
    * semantics minus the corpus-global copy COUNT, which an
    * incremental artifact cannot know ahead of future arrivals — the
    * one declared schema difference). Exactly-once: ledger rows land
    * via [[writeBatchIdempotent]]; each index appends only fingerprints
    * NOVEL relative to previous batches into batch_id partitions with
    * dynamic overwrite, so a crash-replay of batch N reproduces its
    * own partitions byte-identically. Eager localCheckpoints stop the
    * index appends from re-running lineage that reads the same paths. */
  def curationLedgerQuery(docs: DataFrame, statePath: String,
                          ledgerDir: String,
                          checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.persist()
        try {
          // Lease FIRST among the try's work, before any state read or
          // output write: a crashed compactor (mid-swap, lease still
          // naming 'compact') must fail this trigger loudly BEFORE a
          // half-swapped index could be read as empty and wrong
          // verdicts written. Inside the try (ADVICE r11) so the
          // conflict failure still reaches the finally's unpersist.
          // The trigger's own crash-replay reclaims its same-holder
          // lease.
          graft.llm.Similarity.acquireIndexLease(
            spark, statePath, s"append:$batchId")
          val (ledger, novels) = ledgerVerdictForBatch(batch, statePath, batchId)
          writeBatchIdempotent(ledger, ledgerDir, batchId)
          writeLedgerNovels(novels, statePath, batchId)
          // released only on success: a failed trigger leaves the
          // lease naming this batch, so a CONFLICTING writer (the
          // compactor) fails loudly while the replay goes through
          graft.llm.Similarity.releaseIndexLease(spark, statePath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** The per-batch half of [[curationLedgerQuery]], extracted (round
    * 12) so the streaming shard writer ([[trainingShardsQuery]]) can
    * resolve the SAME incremental keep/drop verdicts against its own
    * state root: returns the batch's ledger verdict frame plus the
    * per-modality NOVEL fingerprints to append ((sub-dir, frame)
    * pairs — written by [[writeLedgerNovels]] under the caller's
    * lease). Both returned frames are eagerly localCheckpointed: the
    * caller writes INTO the same state paths this computation reads. */
  private[streaming] def ledgerVerdictForBatch(
      batch: DataFrame, statePath: String, batchId: Long)
    : (DataFrame, Seq[(String, DataFrame)]) = {
        val spark = batch.sparkSession
        import spark.implicits._
        {
          val base = batch.filter(col("doc_id").isNotNull)

          // "seen" = indexed by a PRIOR batch only. The filter on the
          // batch_id partition column is the replay-safety boundary
          // (ADVICE r10): a crash after batch N's novel-fingerprint
          // write but before the checkpoint commit leaves N's own
          // partition on disk, and an unfiltered read on replay would
          // see N's fingerprints as already-indexed, flipping every
          // keep verdict in the batch to false before the idempotent
          // ledger overwrite makes the wrong verdicts permanent.
          // Partition pruning makes the filter free.
          def seenFps(sub: String): DataFrame = {
            val p = new org.apache.hadoop.fs.Path(s"$statePath/$sub")
            val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            // explicit partition-dir check, not bare existence: the
            // index dir may hold only dot-entries (compaction staging
            // remnants) and schema inference over zero files throws
            val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
              s.isDirectory && s.getPath.getName.startsWith("batch_id="))
            if (hasData)
              spark.read.parquet(p.toString)
                .filter(col("batch_id") < lit(batchId)).select("fp")
            else Seq.empty[String].toDF("fp")
          }
          // keep(fp-grain) = first holder of the fingerprint: absent
          // from the index AND min doc_id within the batch (the same
          // min-id rule the batch ledger's window applies corpus-wide)
          def modalVerdict(cur: DataFrame, sub: String,
                           keepName: String): (DataFrame, DataFrame) = {
            val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
            val seen = seenFps(sub)
            val verdict = cur
              .withColumn("first_in_batch",
                col("doc_id") === min(col("doc_id")).over(w))
              .join(seen.withColumn("indexed", lit(true)), Seq("fp"), "left")
              .withColumn(keepName,
                col("first_in_batch") && !coalesce(col("indexed"), lit(false)))
              .drop("first_in_batch", "indexed")
            val novel = cur.select("fp").distinct()
              .join(seen, Seq("fp"), "left_anti")
            (verdict, novel)
          }

          val (text, textNovel) = modalVerdict(
            base.select(col("doc_id"), md5(col("text")).as("fp")),
            "text", "text_keep")
          val (image, imageNovel) = modalVerdict(
            graft.llm.Multimodal.imageHashes(base).toDF()
              .select(col("doc_id"),
                format_string("%04x%04x%04x%04x",
                  col("b3"), col("b2"), col("b1"), col("b0")).as("fp")),
            "image", "image_keep")
          val (audio, audioNovel) = modalVerdict(
            graft.llm.Multimodal.audioFpRows(base)
              .select(col("doc_id"), col("audio_fp").as("fp"),
                col("max_silence_run")),
            "audio", "audio_keep")
          val video = graft.llm.Multimodal.frameDedup(base, ordered = false)
            .select(col("doc_id"), col("is_slideshow"))

          // same composition rule as the batch ledger: absent image
          // verdict (hash-ineligible) never blocks the keep
          val ledger = text.select(col("doc_id"), col("text_keep"))
            .join(audio.select(col("doc_id"), col("audio_keep"),
              col("max_silence_run")), "doc_id")
            .join(video, "doc_id")
            .join(image.select(col("doc_id"), col("image_keep")),
              Seq("doc_id"), "left")
            .select(col("doc_id"), col("text_keep"), col("image_keep"),
              col("audio_keep"), col("max_silence_run"), col("is_slideshow"),
              (col("text_keep") && coalesce(col("image_keep"), lit(true)) &&
                col("audio_keep") && !col("is_slideshow")).as("keep"))
            .localCheckpoint()
          val novels = Seq("text" -> textNovel, "image" -> imageNovel,
            "audio" -> audioNovel).map { case (sub, df) =>
            sub -> df.localCheckpoint() // sever the read of statePath/sub
          }
          (ledger, novels)
        }
  }

  /** Append the batch's novel fingerprints into their per-modality
    * batch_id partitions — dynamic overwrite, so a crash-replay of
    * batch N reproduces its own partitions byte-identically. Caller
    * must hold the state root's write lease. */
  private def writeLedgerNovels(novels: Seq[(String, DataFrame)],
                                statePath: String, batchId: Long): Unit =
    novels.foreach { case (sub, df) =>
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(s"$statePath/$sub")
    }

  /** Small-files maintenance for the streaming curation ledger's three
    * fingerprint indexes (round 11, VERDICT r10 task 3): fold every
    * per-trigger `batch_id=N` partition under `statePath/{text,image,
    * audio}` into the bulk `batch_id=-1` partition — the
    * [[graft.llm.Dedup.compactShingleIndex]] remedy applied to the two
    * remaining accumulating states. Read-back identical (compaction
    * moves rows, never changes them; -1 still passes the replay filter
    * `batch_id < currentBatch`). Run only against a QUIESCED stream
    * whose last batch committed — enforced fail-loud by the shared
    * write lease at the state root, which the per-trigger appends also
    * take. */
  def compactCurationState(spark: SparkSession, statePath: String): Unit = {
    graft.llm.Similarity.acquireIndexLease(spark, statePath, "compact")
    Seq("text", "image", "audio").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$statePath/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        graft.llm.Similarity.compactBatchPartitionsLocked(spark, p.toString)
    }
    graft.llm.Similarity.releaseIndexLease(spark, statePath)
  }

  /** Streaming TRAINING-SHARD WRITER (round 12, VERDICT r11 task 5) —
    * the capstone composition maintained incrementally: each
    * micro-batch of documents resolves its cross-modal keep/drop
    * verdicts against the persisted fingerprint indexes
    * ([[ledgerVerdictForBatch]] — the curation-ledger state machinery
    * verbatim), applies the SAME document-local quality gate as the
    * batch capstone ([[graft.llm.Curate.qualityKept]] — stateless, no
    * index needed), packs the survivors against per-language
    * survivor-token bases carried as batch deltas under
    * `statePath/pack` (the [[packSequencesQuery]] recipe), and lands
    * the per-(lang, seq_id) PARTIAL sequence summaries
    * ([[graft.llm.Curate.shardSummary]] — the one shared shard/sort-key
    * definition) under `micro_batch_id=N/shard=M` partitions.
    *
    * The artifact's read contract is
    * [[graft.llm.Curate.readTrainingShards]]: a sequence spanning a
    * trigger boundary has one partial row per touching batch, merged
    * associatively at read time — under monotone-id arrival the merged
    * rows are IDENTICAL to a batch [[graft.llm.Curate.writeTrainingShards]]
    * over everything streamed (unit-asserted, including crash replay).
    * Exactly-once: summaries land via [[writeBatchIdempotent]]; the
    * fingerprint and pack states append batch_id partitions read back
    * with the `batch_id < currentBatch` replay filter; all four state
    * dirs share the one write lease at the state root, mutually
    * exclusive with [[compactShardState]]. */
  /** Occupancy bound of the streamed shard/pack state (round 13,
    * VERDICT r12 task 6): when a trigger finds MORE than this many
    * per-batch partial partitions, it folds the prior batches into
    * the `-1` base partition before doing its own work — so a
    * months-long stream's read-side merge cost (`readTrainingShards`
    * groups over every partial; the pack-base read sums every delta)
    * is bounded by K + triggers-since-compaction instead of growing
    * with stream lifetime. The WHEN contract the maintenance-only
    * compactor lacked. */
  val ShardPartialMaxPartitions = 8

  /** Associative pre-merge of per-batch partial sequence summaries —
    * the [[graft.llm.Curate.readTrainingShards]] read-time aggregate
    * applied at compaction time. Sound because the merge is
    * associative: reading (compacted base + later partials) groups to
    * exactly what reading all partials would. */
  private def mergeShardPartials(df: DataFrame): DataFrame =
    df.groupBy("lang", "seq_id", "shard", "sort_key")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("first_doc")).as("first_doc"),
        max(col("last_doc")).as("last_doc"))

  /** Per-lang sum of pack token deltas — linear-sketch merge, same
    * soundness argument. */
  private def mergePackDeltas(df: DataFrame): DataFrame =
    df.groupBy("lang").agg(sum(col("batch_tokens")).as("batch_tokens"))

  /** The occupancy trigger itself. MUST run with the state lease held
    * and `currentBatchId` = the trigger's own (uncommitted) batch id:
    * only ids < it fold, because folding the current batch's partition
    * into -1 would double-count it on crash-replay (the replayed
    * dynamic overwrite re-creates the partition BESIDE its copy
    * inside -1) — the packSequencesQuery replay-safety rule extended
    * to compaction. */
  private[graft] def maybeCompactShardPartials(
      spark: SparkSession, shardDir: String, packPath: String,
      currentBatchId: Long,
      maxPartials: Int = ShardPartialMaxPartitions): Unit = {
    def nPartitions(path: String, prefix: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(s =>
        s.isDirectory && s.getPath.getName.startsWith(prefix))
    }
    if (nPartitions(shardDir, "micro_batch_id=") > maxPartials)
      graft.llm.Similarity.compactPartitionsLocked(spark, shardDir,
        partitionCol = "micro_batch_id", extraPartitions = Seq("shard"),
        merge = mergeShardPartials, uptoExclusive = currentBatchId)
    if (nPartitions(packPath, "batch_id=") > maxPartials)
      graft.llm.Similarity.compactPartitionsLocked(spark, packPath,
        merge = mergePackDeltas, uptoExclusive = currentBatchId)
  }

  def trainingShardsQuery(docs: DataFrame, statePath: String,
                          shardDir: String, checkpoint: String,
                          shards: Int = graft.llm.Curate.NumShards,
                          maxPartials: Int = ShardPartialMaxPartitions)
    : StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        batch.persist()
        try {
          // lease FIRST inside the try (see curationLedgerQuery)
          graft.llm.Similarity.acquireIndexLease(
            spark, statePath, s"append:$batchId")
          // occupancy-triggered fold of PRIOR batches' partials (the
          // round-13 growth bound); holds the lease this trigger owns
          maybeCompactShardPartials(spark, shardDir, s"$statePath/pack",
            batchId, maxPartials)
          val (ledger, novels) = ledgerVerdictForBatch(batch, statePath, batchId)
          val survivors = batch
            .join(ledger.filter(col("keep")).select("doc_id"),
              Seq("doc_id"), "left_semi")
            .join(graft.llm.Curate.qualityKept(batch).select("doc_id"),
              Seq("doc_id"), "left_semi")
          val packPath = s"$statePath/pack"
          val p = new org.apache.hadoop.fs.Path(packPath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          // bases sum PRIOR batches' survivor-token deltas only — the
          // packSequencesQuery replay-safety rule: batch N's own delta
          // must not shift its replayed packing
          val bases =
            if (hasData)
              spark.read.parquet(packPath)
                .filter(col("batch_id") < lit(batchId)).groupBy("lang")
                .agg(sum(col("batch_tokens")).as("base_tokens"))
            else Seq.empty[(String, Long)].toDF("lang", "base_tokens")
          // eager localCheckpoint: the delta write below must not
          // re-run a lineage that READS packPath while writing to it
          val packed = graft.llm.Curate.packBatchWithBases(survivors, bases)
            .localCheckpoint()
          writeBatchIdempotent(
            graft.llm.Curate.shardSummary(packed, shards),
            shardDir, batchId, extraPartitions = Seq("shard"))
          writeLedgerNovels(novels, statePath, batchId)
          packed.groupBy("lang")
            .agg(sum(col("n_tokens")).as("batch_tokens"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(packPath)
          // released only on success (fail-loud conflict semantics)
          graft.llm.Similarity.releaseIndexLease(spark, statePath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Streaming POSITIONAL POSTINGS INDEX maintenance (round 12) — the
    * standing-retrieval-workload half of
    * [[graft.llm.Retrieval.writePostingsIndex]] kept fresh by the
    * ingest stream instead of rebuilt: each micro-batch tokenizes its
    * own documents (map-only posexplode — a document's postings never
    * depend on any other document, so there is NO cross-batch state
    * read and no replay filter to need) and appends (term, doc_id,
    * pos) rows into a `batch_id=N` partition with dynamic overwrite,
    * so a crash-replay of batch N replaces its own partition instead
    * of duplicating postings. Appends and [[compactPostingsState]]
    * are mutually exclusive via the shared write lease. Probes
    * ([[graft.llm.Retrieval.phraseSearchFromParquetIndex]]) run the
    * same anchor-count plan as every other postings source; the term
    * filter prunes at the scan. */
  def postingsIndexQuery(docs: DataFrame, statePath: String,
                         checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.persist()
        try {
          graft.llm.Similarity.acquireIndexLease(
            spark, statePath, s"append:$batchId")
          batch.filter(col("doc_id").isNotNull)
            .select(col("doc_id"),
              posexplode(graft.llm.TextPrep.wordsCol))
            .toDF("doc_id", "pos", "term")
            .select(col("term"), col("doc_id"), col("pos"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statePath)
          graft.llm.Similarity.releaseIndexLease(spark, statePath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Small-files maintenance for the streamed postings index — the
    * generic batch-partition fold, lease-enforced like every
    * compactor here. Quiesced-stream-only. */
  def compactPostingsState(spark: SparkSession, statePath: String): Unit = {
    graft.llm.Similarity.acquireIndexLease(spark, statePath, "compact")
    graft.llm.Similarity.compactBatchPartitionsLocked(spark, statePath)
    graft.llm.Similarity.releaseIndexLease(spark, statePath)
  }

  /** Small-files maintenance for the shard writer's four state dirs
    * (three fingerprint indexes + the pack deltas) — the
    * [[compactCurationState]] sweep plus `pack`, under the one shared
    * lease. Quiesced-stream-only, like every compactor here. */
  def compactShardState(spark: SparkSession, statePath: String): Unit = {
    graft.llm.Similarity.acquireIndexLease(spark, statePath, "compact")
    Seq("text", "image", "audio", "pack").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$statePath/$sub")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        graft.llm.Similarity.compactBatchPartitionsLocked(spark, p.toString)
    }
    graft.llm.Similarity.releaseIndexLease(spark, statePath)
  }

  /** Streaming SEQUENCE PACKING — the concat-and-cut training-batch
    * assignment ([[graft.llm.Curate.packSequences]]) maintained
    * incrementally: documents arriving in id order get packed into
    * fixed-capacity sequences WITHOUT re-windowing the corpus. The
    * only cross-batch state is one token total per language, stored
    * as per-batch DELTAS (the linear-sketch recipe of [[cmsSinkQuery]]:
    * read-time total = sum over batch partitions, so a crash-replay of
    * batch N overwrites its own delta and the state can never
    * double-count). Per-trigger cost: one bounded within-batch window
    * + one lang-cardinality join; streamed output is row-identical to
    * a batch repack of everything streamed (unit-asserted). State
    * reads grow with trigger count until compacted — the same
    * small-files trade as the LSH index, and the same remedy applies. */
  def packSequencesQuery(docs: DataFrame, statePath: String,
                         packedDir: String,
                         checkpoint: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        batch.persist()
        try {
          // lease FIRST inside the try (see curationLedgerQuery): a
          // crashed compactor must fail this trigger before bases
          // could read half-swapped state, and the conflict failure
          // must still reach the finally's unpersist (ADVICE r11);
          // the trigger's own replay reclaims its holder string
          graft.llm.Similarity.acquireIndexLease(
            spark, statePath, s"append:$batchId")
          val p = new org.apache.hadoop.fs.Path(statePath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // Bases sum PRIOR batches' deltas only (ADVICE r10): batch
          // N's own delta partition survives a crash-before-commit,
          // and an unfiltered sum on replay would start N's packing at
          // cum_before shifted by N's own token mass — wrong
          // seq_id/n_seqs_spanned overlapping batch N+1. The delta
          // WRITE is idempotent; the read must not double-count it.
          // Partition-dir check, not bare existence: the dir may hold
          // only the lease dot-file on a first-trigger replay.
          val hasData = fs.exists(p) && fs.listStatus(p).exists(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          val bases =
            if (hasData)
              spark.read.parquet(statePath)
                .filter(col("batch_id") < lit(batchId)).groupBy("lang")
                .agg(sum(col("batch_tokens")).as("base_tokens"))
            else Seq.empty[(String, Long)].toDF("lang", "base_tokens")
          // eager localCheckpoint: the delta write below must not
          // re-run a lineage that READS statePath while writing to it
          val packed = graft.llm.Curate.packBatchWithBases(batch, bases)
            .localCheckpoint()
          writeBatchIdempotent(packed, packedDir, batchId)
          packed.groupBy("lang")
            .agg(sum(col("n_tokens")).as("batch_tokens"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statePath)
          // released only on success (fail-loud conflict semantics)
          graft.llm.Similarity.releaseIndexLease(spark, statePath)
        } finally { batch.unpersist(); () }
      }
      .start()

  /** Small-files maintenance for the pack-state deltas (round 11,
    * VERDICT r10 task 3): per-trigger `batch_id=N` delta partitions
    * fold into the bulk `batch_id=-1` partition. The state's
    * read-time contract (total = SUM over partitions) is preserved —
    * compaction moves delta rows without merging or changing them —
    * and -1 still passes the replay filter. Quiesced-stream-only,
    * enforced fail-loud by the shared lease the delta writes take. */
  def compactPackState(spark: SparkSession, statePath: String): Unit = {
    graft.llm.Similarity.acquireIndexLease(spark, statePath, "compact")
    graft.llm.Similarity.compactBatchPartitionsLocked(spark, statePath)
    graft.llm.Similarity.releaseIndexLease(spark, statePath)
  }

  /** The idempotent-replay write used by every exactly-once file sink
    * here: each micro-batch lands in its own `micro_batch_id=N`
    * partition with DYNAMIC partition overwrite, so re-running a batch
    * after a crash REPLACES its partition instead of appending
    * duplicates. File sinks are append-only by default; this is the
    * standard foreachBatch recipe for at-least-once → effectively-once
    * when the write itself must be the transaction boundary.
    *
    * The partition column is `micro_batch_id`, NOT `batch_id`: the
    * transaction schema declares a DOMAIN `batch_id` string field
    * (Schemas.scala), and naming the engine column the same would
    * silently overwrite the source value with the micro-batch number
    * for every record routed through this sink. */
  def writeBatchIdempotent(batch: DataFrame, outDir: String, batchId: Long,
                           extraPartitions: Seq[String] = Nil): Unit =
    batch.withColumn("micro_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("micro_batch_id" +: extraPartitions: _*)
      .parquet(outDir)

  /** Generic exactly-once-style parquet sink: any stream →
    * [[writeBatchIdempotent]] per micro-batch. Checkpoint tracks the
    * source offsets; the batch-id-partitioned layout makes the data
    * write idempotent under replay of the last uncommitted batch. */
  def idempotentSinkQuery(df: DataFrame, outDir: String,
                          checkpoint: String): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, outDir, batchId)
      }
      .start()

  /** Streaming sketch maintenance: each micro-batch aggregates its own
    * Count–Min sketch (one Depth×Width counter row per batch, whatever
    * the batch size) into a `micro_batch_id`-partitioned layout via
    * [[writeBatchIdempotent]] — replay-safe like every sink here, and
    * with NO read-modify-write on shared state: CMS is a linear
    * sketch, so the corpus sketch is recovered by element-wise sum at
    * read time ([[readCmsSketch]]), bit-identical to one batch build
    * over the union of all batches. */
  def cmsSinkQuery(docs: DataFrame, sketchDir: String,
                   checkpoint: String): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.functions.GraftFunctions.registerAll(batch.sparkSession)
        val sk = batch
          .select(explode(graft.llm.TextPrep.wordsCol).as("word"))
          .agg(call_function("cms_build", col("word")).as("sk"))
        writeBatchIdempotent(sk, sketchDir, batchId)
      }
      .start()
  }

  /** Streaming ANN ingestion: each micro-batch of new vectors is
    * assigned to the PERSISTED centroid set (fitted once by
    * [[graft.llm.Similarity.fitCentroids]], broadcast per batch — no
    * refit) and appended to a `micro_batch_id`/`centroid_id`-partitioned
    * index layout through [[writeBatchIdempotent]]. Probes prune on
    * the centroid_id partition the same way the bucketed batch index
    * does; replaying a crashed batch replaces exactly its own
    * partitions. The index grows append-only; centroid REFIT is an
    * offline concern (re-run the fit, rewrite the index), matching how
    * production IVF deployments separate ingest from retrain. */
  def ivfIngestQuery(vectors: DataFrame, centroidsPath: String,
                     indexDir: String, checkpoint: String): StreamingQuery = {
    // The centroid set is FIXED for the query's lifetime (refit is an
    // offline rewrite) — read and cache it once here, not per trigger:
    // a 10 s trigger would otherwise re-list and re-decode the parquet
    // footers forever on the hot path.
    val centroids = vectors.sparkSession.read.parquet(centroidsPath).cache()
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val assigned = graft.llm.Similarity.assignToFixedCentroids(batch, centroids)
        writeBatchIdempotent(assigned, indexDir, batchId, Seq("centroid_id"))
      }
      .start()
  }

  /** Element-wise sum of every per-batch sketch → the corpus sketch
    * (single `sk` array row, same shape `cms_query` probes). */
  def readCmsSketch(spark: SparkSession, sketchDir: String): DataFrame =
    spark.read.parquet(sketchDir)
      .select(posexplode(col("sk")).as(Seq("pos", "c")))
      .groupBy("pos").agg(sum(col("c")).as("c"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("sk"))

  /** S7: partitioned warehouse sink layout
    * (`spark_config.yml:50-69` — transactions by year/month/day). */
  def writeWarehouse(df: DataFrame, path: String): Unit =
    df.withColumn("year", year(col("event_time")))
      .withColumn("month", month(col("event_time")))
      .withColumn("day", dayofmonth(col("event_time")))
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(path)

  /** S7 CATALOG variant: the reference declares this same y/m/d layout
    * as a Hive-metastore table (`spark_config.yml:25`
    * `catalogImplementation: hive` + `:50-69` table spec); here the
    * identical `saveAsTable` + `partitionBy` writer registers it in the
    * session catalog, so partition listing (`SHOW PARTITIONS` /
    * `Catalog.listTables`) and metadata-level partition pruning go
    * through the catalog instead of directory listing. The catalog
    * implementation (in-memory in this sandbox, hive+metastore-URI in
    * production) is a session config switch, not a code change — the
    * writer API and on-disk layout are identical. At 100 TB the catalog
    * route is what makes partition pruning METADATA-only: the planner
    * asks the (external) catalog for matching partitions instead of
    * walking a multi-million-object store listing. */
  def writeWarehouseTable(df: DataFrame, table: String): Unit =
    df.withColumn("year", year(col("event_time")))
      .withColumn("month", month(col("event_time")))
      .withColumn("day", dayofmonth(col("event_time")))
      // append, like the path variant: a warehouse load ADDS the new
      // partitions (saveAsTable still creates the table on first call);
      // overwrite mode would drop the table and wipe every previously
      // loaded day on each incremental load
      .write.mode("append")
      .format("parquet")
      .partitionBy("year", "month", "day")
      .saveAsTable(table)

  /** Bucketed warehouse table: co-locates rows by join key so repeated
    * fact-fact joins on that key need NO shuffle at read time (both
    * sides' bucketing lines up → SortMergeJoin without exchanges).
    * This is the 100 TB answer to "every reconciliation join reshuffles
    * the fact table"; `bucketBy` requires a catalog table, not a bare
    * path. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** S7: the transaction_summary warehouse table — (year, month)
    * partitioning per `spark_config.yml:64-69`, fed by the windowed
    * aggregate (window_start drives the partition columns). */
  def writeSummaryTable(aggregated: DataFrame, path: String): Unit =
    aggregated.withColumn("year", year(col("window_start")))
      .withColumn("month", month(col("window_start")))
      .write.mode("append")
      .partitionBy("year", "month")
      .parquet(path)
}
