package graft.streaming

import graft.Q
import graft.cdc.{Cdc, CdcQueries}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A parsed change event as carried through keyed streaming state. */
final case class ChangeRow(
    key: Long, scn: Long, xid: String, op: String,
    id: Option[Long], cents: Option[Long], typ: Option[String])

/** Current materialized state for one key. */
final case class KeyState(
    scn: Long, xid: String, id: Long, cents: Long, typ: String,
    deleted: Boolean)

/** One output row of the incremental materialization. Deletes surface
  * as explicit tombstone emissions (`deleted = true`, sentinel payload)
  * rather than silence, so a downstream collapse-to-last-emission is
  * delete-safe under ANY micro-batch split: the tombstone carries the
  * delete's scn and outranks every earlier emission of the key. */
final case class SnapshotRow(
    key: Long, id: Long, cents: Long, `type`: String, last_scn: Long,
    deleted: Boolean)

/** One SCD2 version row emitted by the incremental history builder.
  * Downstream sinks upsert on (key, valid_from): an open version
  * (valid_to = -1) is later re-emitted closed when the next event on
  * the key arrives. */
final case class ScdRow(
    key: Long, valid_from: Long, valid_to: Long,
    id: Long, cents: Long, `type`: String, is_current: Boolean)

/** Structured Streaming re-expression of the reference pipeline's
  * streaming half (OpenLogReplicator -> Kafka -> ksqlDB / JDBC sink).
  *
  * Every query here executes a REAL streaming query — file source ->
  * transforms -> sink — run to completion on the bounded test feed, so
  * the driver's DuckDB oracle can verify the final result exactly; the
  * incremental multi-batch behavior (state transitions, late updates,
  * upserts over batches) is pinned by StreamingSpec with MemoryStream.
  *
  * Scale design: watermarks bound all state; the materialization state
  * is per-key O(1) (one KeyState, not the event history) managed by
  * flatMapGroupsWithState — on a cluster this backs onto the RocksDB
  * state store and the only shuffle is the groupByKey hash exchange.
  */
object Streams {


  /** Files the bounded file-source feeds admit per micro-batch — the
    * trigger-size knob a real deployment tunes to feed volume (the
    * reference sizes Connect `tasks.max`/topic partitions the same
    * way; README.md "Sink Connector"). Default 1: the registry rows
    * and cross-batch specs deliberately force EVERY staged file into
    * its own micro-batch to exercise genuine multi-batch state
    * transitions. Scale runs set `SPARK_GRAFT_FILES_PER_TRIGGER`
    * higher so batch count tracks operator cost instead of file
    * count — correctness is unaffected BY CONSTRUCTION: every
    * streaming row's result is proven batch-split independent (its
    * oracle recomputes from scratch; the =1 multi-batch path stays
    * spec-pinned). */
  private[graft] def filesPerTrigger: String = {
    val v = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_TRIGGER", "1")
    require(v.forall(_.isDigit) && v.toLong >= 1,
      s"SPARK_GRAFT_FILES_PER_TRIGGER must be a positive integer, got: $v")
    v
  }

  /** State-store partition count for the bounded in-memory runs — a
    * fixed property of a streaming checkpoint, so on a cluster it is
    * sized ONCE to executor count / feed volume, never inherited from
    * the batch shuffle setting. Default 4 fits the bounded test
    * feeds; scale runs set `SPARK_GRAFT_STATE_PARTITIONS` so stateful
    * micro-batches don't pay hundreds of near-empty state-store
    * partition commits per trigger. */
  private[graft] def statePartitions: String = {
    val v = sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "4")
    require(v.forall(_.isDigit) && v.toLong >= 1,
      s"SPARK_GRAFT_STATE_PARTITIONS must be a positive integer, got: $v")
    v
  }

  /** State-store provider for the bounded runs — `hdfs` (Spark's
    * default heap-backed provider) or `rocksdb`
    * (RocksDBStateStoreProvider + changelog checkpointing). The heap
    * provider keeps EVERY key of every state partition in executor
    * heap — measured state-VOLUME-bound on the unbounded-dedup rows
    * (cdc_stream_dedup ~600 s at sf30) and the first thing to fall
    * over at 100 TB; RocksDB spills state off-heap to local SSD and
    * checkpoints per-batch CHANGELOGS instead of full snapshots,
    * which is what a 24/7 deployment of the reference's Kafka →
    * exactly-once-sink shape runs. Default stays `hdfs` so the tiny
    * bounded test feeds don't pay RocksDB's per-partition open cost;
    * scale runs set `SPARK_GRAFT_STATE_PROVIDER=rocksdb` (A/B'd in
    * BENCH_DETAIL — see SURVEY §14). */
  private[graft] def stateProviderConfs: Seq[(String, String)] =
    sys.props.get("graft.state.provider") // spec override (env is fixed per JVM)
      .orElse(sys.env.get("SPARK_GRAFT_STATE_PROVIDER"))
      .getOrElse("hdfs") match {
      case "rocksdb" => Seq(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
          "true")
      case "hdfs" => Seq.empty
      case other => throw new IllegalArgumentException(
        "graft.state.provider / SPARK_GRAFT_STATE_PROVIDER must be hdfs " +
          s"or rocksdb, got: $other")
    }

  /** Runs a bounded streaming DataFrame to completion into a
    * file-backed sink and returns the sink contents. Synchronized on
    * the session: the shuffle-partition override below mutates shared
    * session conf, so concurrent callers must not interleave.
    *
    * File-backed, NOT the memory sink: the memory sink holds every
    * emitted row in DRIVER memory — at 100× the ingest feed alone
    * blew `spark.driver.maxResultSize` (measured: 28 tasks,
    * 1.05 GiB serialized). Each micro-batch instead lands in a temp
    * parquet directory straight from the executors via foreachBatch —
    * append/update modes accumulate per-batch emissions exactly as
    * the memory sink did, complete mode replaces (the memory-sink
    * contract) — and the result is an ordinary distributed parquet
    * read, so driver memory stays O(1) in feed size. This mirrors the
    * scd2 design note: output belongs in the sink, never on the
    * driver. */
  def runBounded(sdf: DataFrame, mode: String): DataFrame = {
    val spark = sdf.sparkSession
    val d = java.nio.file.Files.createTempDirectory("graft_bounded_sink")
    registerSinkCleanup(d)
    val dir = d.toString
    spark.synchronized {
      // stateful operators pay a per-partition-per-batch state-store
      // cost; for the bounded test feeds a handful of state partitions
      // beats the batch-tuned setting (on a real cluster this is sized
      // to executor count, and is a fixed property of the checkpoint)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
      // provider is a fixed property of a checkpoint; the bounded runs
      // use fresh checkpoints per call, so it is safe to swap per run
      val prevProv = stateProviderConfs.map { case (k, _) =>
        k -> spark.conf.getOption(k) }
      stateProviderConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val q = sdf.writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            // one OVERWRITTEN subdirectory per batchId: if Spark retries
            // a micro-batch after a partial write, the re-run replaces
            // the subdir instead of appending duplicates (the memory
            // sink deduped re-adds by batchId; plain parquet append
            // would not). Subdir names avoid k=v so no partition
            // discovery kicks in.
            batch.write.mode("overwrite").parquet(s"$dir/b$id")
          }
          .outputMode(mode).start()
        try q.processAllAvailable() finally q.stop()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        prevProv.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
    // an all-empty feed writes no files at all; preserve the
    // memory-sink behavior of returning an empty, correctly-typed DF.
    // append/update accumulate every batch's emissions (read all
    // subdirs); complete REPLACES per batch (read only the last one).
    val subdirs = {
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          p.getFileName.toString.startsWith("b")).toVector
      } finally s.close()
    }
    val toRead =
      if (mode == "complete" && subdirs.nonEmpty)
        Seq(subdirs.maxBy(p => p.getFileName.toString.drop(1).toLong))
      else subdirs
    if (toRead.nonEmpty)
      spark.read.schema(sdf.schema).parquet(toRead.map(_.toString): _*)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sdf.schema)
  }

  /** Bounded-sink temp dirs pending deletion; one JVM shutdown hook
    * removes them RECURSIVELY (File.deleteOnExit silently never deletes
    * a non-empty directory, so every runBounded call used to leak its
    * parquet dir for the machine's lifetime). */
  private val sinkDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val sinkCleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      sinkDirs.forEach { p =>
        try {
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(p)
          val all = try walk.iterator().asScala.toVector finally walk.close()
          all.sortBy(-_.getNameCount)
            .foreach(f => java.nio.file.Files.deleteIfExists(f))
        } catch { case _: java.io.IOException => () } // best-effort at exit
      }
    }))
  private def registerSinkCleanup(p: java.nio.file.Path): Unit = {
    sinkCleanupHook
    sinkDirs.add(p)
  }

  /** One staged stream directory per (session, source dir), reused
    * across calls and cleaned up on JVM exit. */
  private val streamDirs =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** File-source stream over the events table (the bounded feed is one
    * parquet file -> one micro-batch; in production this is a directory
    * of arriving files or a Kafka source — the transform chain is
    * identical). */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // the stream path doesn't touch Tables, so install the graft_*
    // functions here too (idempotent)
    graft.functions.Native.install(s)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // the file source wants a directory of arriving files; expose the
    // (read-only) test table through a temp dir via symlinks — one per
    // (session, dir), not per call. The table may be a single file (the
    // driver's layout) OR a Spark-written DIRECTORY of part files; a
    // directory must be symlinked file-by-file, because the file stream
    // source does not recurse into a nested directory and would
    // silently stream ZERO rows through a dir-shaped symlink.
    val streamDir = streamDirs.computeIfAbsent((s, dir), { _ =>
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
      d.toFile.deleteOnExit()
      val src = java.nio.file.Paths.get(s"$dir/events.parquet")
      val files =
        if (java.nio.file.Files.isDirectory(src))
          graft.sources.Formats.listDir(src)
            .filter(_.getFileName.toString.endsWith(".parquet"))
        else Seq(src)
      require(files.nonEmpty, s"$src contains no parquet files to stream")
      files.zipWithIndex.foreach { case (p, i) =>
        val link = d.resolve(f"events_$i%05d.parquet")
        java.nio.file.Files.createSymbolicLink(link, p)
        link.toFile.deleteOnExit()
      }
      d.toString
    })
    graft.sources.Tables.normalizeTs(
      s.readStream.schema(schema).parquet(streamDir))
  }

  /** Incremental changelog materialization: per-key keyed state holds
    * only the latest (scn, xid)-winning event; each batch emits the
    * keys it changed (update semantics, like the reference's upsert
    * sink). Deletes clear the key. */
  def materializeStream(parsed: Dataset[ChangeRow]): Dataset[SnapshotRow] = {
    import parsed.sparkSession.implicits._
    parsed
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, SnapshotRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, events: Iterator[ChangeRow], state: GroupState[KeyState]) =>
          var cur = state.getOption.orNull
          events.foreach { e =>
            val newer = cur == null || e.scn > cur.scn ||
              (e.scn == cur.scn && e.xid > cur.xid)
            if (newer) {
              cur =
                if (e.op == "d") KeyState(e.scn, e.xid, -1, -1, "", deleted = true)
                else KeyState(e.scn, e.xid, e.id.getOrElse(-1L),
                  e.cents.getOrElse(-1L), e.typ.getOrElse(""), deleted = false)
            }
          }
          if (cur == null) Iterator.empty
          else {
            state.update(cur)
            if (cur.deleted)
              Iterator.single(SnapshotRow(key, -1, -1, "", cur.scn, deleted = true))
            else
              Iterator.single(SnapshotRow(key, cur.id, cur.cents, cur.typ, cur.scn,
                deleted = false))
          }
      }
  }

  /** The upsert a real sink applies to the materialization's update
    * stream, as a batch collapse over the accumulated emissions: last
    * emission per key wins (max last_scn — a key's emissions are
    * monotone in scn), and keys whose last emission is a tombstone are
    * absent. Batch-count-independent BY CONSTRUCTION: a delete in a
    * later micro-batch than the key's last live emission still emits (a
    * tombstone), so it participates in — and wins — the collapse. */
  def collapseSnapshots(updates: DataFrame): DataFrame =
    updates
      .groupBy("key")
      .agg(max(struct(col("last_scn"), col("id"), col("cents"),
        col("type"), col("deleted"))).as("v"))
      .filter(!col("v.deleted"))
      .select(col("key"), col("v.id"), col("v.cents"), col("v.type"),
        col("v.last_scn"))

  /** Incremental SCD2 history: per-key keyed state holds only the OPEN
    * version; each arriving event closes it (emitting the closed row)
    * and opens a new one (emitted with valid_to = -1, re-emitted closed
    * when superseded — an upsert on (key, valid_from)). State is O(1)
    * per key regardless of history length, which is what makes SCD2
    * viable as a streaming operator at 100 TB: the full history lives
    * in the sink, never in the state store. Events are sorted by
    * (scn, xid) within each batch; stale events (scn at or below the
    * open version) are dropped, mirroring the at-least-once dedup the
    * batch operator gets from its window. */
  def scd2Stream(parsed: Dataset[ChangeRow]): Dataset[ScdRow] = {
    import parsed.sparkSession.implicits._
    parsed
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, ScdRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, events: Iterator[ChangeRow], state: GroupState[KeyState]) =>
          val sorted = events.toSeq.sortBy(e => (e.scn, e.xid))
          var out = List.empty[ScdRow]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            val newer = cur == null || e.scn > cur.scn ||
              (e.scn == cur.scn && e.xid > cur.xid)
            if (newer) {
              if (cur != null && !cur.deleted)
                out ::= ScdRow(key, cur.scn, e.scn, cur.id, cur.cents, cur.typ,
                  is_current = false)
              cur =
                if (e.op == "d") KeyState(e.scn, e.xid, -1, -1, "", deleted = true)
                else KeyState(e.scn, e.xid, e.id.getOrElse(-1L),
                  e.cents.getOrElse(-1L), e.typ.getOrElse(""), deleted = false)
            }
          }
          if (cur == null) Iterator.empty
          else {
            state.update(cur)
            if (!cur.deleted)
              out ::= ScdRow(key, cur.scn, -1L, cur.id, cur.cents, cur.typ,
                is_current = true)
            out.reverse.iterator
          }
      }
  }

  /** SCD2 audit history built incrementally (see [[scd2Stream]]); the
    * memory sink keeps EVERY emission, so the result is collapsed to
    * the LAST emission per (key, valid_from) — the upsert a real sink
    * applies. A version closes at most once and a closed row carries
    * valid_to > -1 > the open sentinel, so max-by-valid_to IS
    * emission order, making the row independent of how the bounded
    * feed splits into micro-batches. Multi-batch close-then-reopen
    * upsert behavior is pinned by StreamingSpec.
    *
    * (key, valid_from) is a sound version identity here because the
    * feed guarantees unique (key, scn) — scn = event_id, globally
    * unique, asserted by CdcSpec. A source that can emit two events
    * with one (key, scn) and different xid would need xid (or a version
    * ordinal) folded into the emitted row and this collapse key. */
  val cdcStreamScd2: Q = Q(
    "cdc_stream_scd2",
    (s, dir) => {
      val out = scd2Stream(parsedStream(s, dir)).toDF()
      runBounded(out, "update")
        .groupBy("key", "valid_from")
        .agg(max(struct(col("valid_to"), col("id"), col("cents"),
          col("type"), col("is_current"))).as("v"))
        .select(col("key"), col("valid_from"), col("v.valid_to"),
          col("v.id"), col("v.cents"), col("v.type"), col("v.is_current"))
        .orderBy("key", "valid_from")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql}), p AS (${CdcQueries.parsedSql}),
            |v AS (
            |  SELECT *, lead(scn) OVER
            |    (PARTITION BY key ORDER BY scn ASC, xid ASC) AS next_scn
            |  FROM p)
            |SELECT key, scn AS valid_from,
            |  coalesce(next_scn, -1) AS valid_to,
            |  after_id AS id, after_cents AS cents, after_type AS type,
            |  next_scn IS NULL AS is_current
            |FROM v WHERE op <> 'd'
            |ORDER BY key, valid_from""".stripMargin))

  /** Typed parse of the streaming OLR feed. */
  def parsedStream(s: SparkSession, dir: String): Dataset[ChangeRow] = {
    import s.implicits._
    Cdc.parse(CdcQueries.feedFrom(eventsStream(s, dir)), col("json"))
      .select(col("key"), col("scn"), col("xid"), col("op"),
        when(col("op") === "d", col("before.id")).otherwise(col("after.id")).as("id"),
        when(col("op") === "d", col("before.cents")).otherwise(col("after.cents")).as("cents"),
        when(col("op") === "d", col("before.type")).otherwise(col("after.type")).as("typ"))
      .as[ChangeRow]
  }

  /** stream ingest: file-source feed -> from_json parse, append sink.
    * Verified against the same oracle as the batch cdc_parse. */
  val cdcStreamIngest: Q = Q(
    "cdc_stream_ingest",
    (s, dir) => {
      val parsed = CdcQueries.flatten(
        Cdc.parse(CdcQueries.feedFrom(eventsStream(s, dir)), col("json")))
      runBounded(parsed, "append").orderBy("scn")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql})
            |${CdcQueries.parsedSql}
            |ORDER BY scn""".stripMargin))

  /** incremental materialization via keyed state (see
    * materializeStream); final snapshot equals the batch
    * cdc_materialize result. */
  val cdcStreamMaterialize: Q = Q(
    "cdc_stream_materialize",
    (s, dir) => {
      val out = materializeStream(parsedStream(s, dir)).toDF()
      // the memory sink appends every batch's updates; collapseSnapshots
      // applies the sink-side upsert (last emission per key, tombstones
      // filtered) — delete-safe under any batch split because deletes
      // emit tombstones (StreamingSpec drives insert-then-delete across
      // two forced micro-batches through this exact collapse)
      collapseSnapshots(runBounded(out, "update")).orderBy("key")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql}), p AS (${CdcQueries.parsedSql}),
            |ranked AS (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY key ORDER BY scn DESC, xid DESC) AS rn
            |  FROM p)
            |SELECT key, after_id AS id, after_cents AS cents,
            |  after_type AS type, scn AS last_scn
            |FROM ranked WHERE rn = 1 AND op <> 'd'
            |ORDER BY key""".stripMargin))

  /** Upsert/delete semantics onto a bucketed parquet table via
    * foreachBatch -> [[graft.sinks.ParquetUpsert]]: each batch merges
    * the latest event per key into ONLY the hash buckets it touches
    * (partition-pruned read, dynamic-partition-overwrite write), so
    * per-batch cost is O(batch + touched buckets), not O(table) — the
    * idempotent merge the reference sink does with insert.mode=upsert /
    * delete.enabled=true, made lake-scale. Tombstones stay in the
    * target so later batches cannot resurrect a deleted key with an
    * older scn. */
  val cdcUpsertSink: Q = Q(
    "cdc_upsert_sink",
    (s, dir) => {
      val target = java.nio.file.Files
        .createTempDirectory("graft_upsert").toString + "/tbl"
      val events = parsedStream(s, dir).toDF()
      val q = events.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.sinks.ParquetUpsert.applyBatch(batch, target)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(target)
        .filter(col("op") =!= "d")
        .select(col("key"), col("id"), col("cents"), col("typ").as("type"),
          col("scn").as("last_scn"))
        .orderBy("key")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql}), p AS (${CdcQueries.parsedSql}),
            |ranked AS (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY key ORDER BY scn DESC, xid DESC) AS rn
            |  FROM p)
            |SELECT key, after_id AS id, after_cents AS cents,
            |  after_type AS type, scn AS last_scn
            |FROM ranked WHERE rn = 1 AND op <> 'd'
            |ORDER BY key""".stripMargin))

  /** The reference's ACTUAL terminal stage, end to end: change stream
    * -> foreachBatch -> JDBC MERGE upserts/deletes into a relational
    * target (insert.mode=upsert, pk.mode=record_key,
    * delete.enabled=true — reference README.md:787-795), read back via
    * the Spark JDBC source. Embedded Derby stands in for Postgres; the
    * sink code is target-agnostic. Final table must equal the batch
    * cdc_materialize snapshot. */
  val cdcJdbcUpsert: Q = Q(
    "cdc_jdbc_upsert",
    (s, dir) => {
      import graft.sinks.JdbcUpsert
      val url = JdbcUpsert.memUrl()
      JdbcUpsert.ensureTable(url, "snapshot")
      val q = parsedStream(s, dir).toDF().writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          JdbcUpsert.applyBatch(batch, url, "snapshot")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      JdbcUpsert.readBack(s, url, "snapshot").orderBy("key")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql}), p AS (${CdcQueries.parsedSql}),
            |ranked AS (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY key ORDER BY scn DESC, xid DESC) AS rn
            |  FROM p)
            |SELECT key, after_id AS id, after_cents AS cents,
            |  after_type AS type, scn AS last_scn
            |FROM ranked WHERE rn = 1 AND op <> 'd'
            |ORDER BY key""".stripMargin))

  /** Streaming at-least-once -> exactly-once: the WHOLE feed is
    * redelivered in a later micro-batch (two staged copies,
    * maxFilesPerTrigger=1 forces them into separate batches) and
    * stateful dropDuplicates on (key, scn) must drop every replay using
    * only its state store — the reference consumers' dedup-by-(key,scn)
    * guarantee, incremental. State here is unbounded to pin exact
    * semantics on the bounded feed regardless of event-time order;
    * [[cdcStreamDedupWm]] is the production form that bounds it with
    * a watermark. */
  /** Stages the whole events table TWICE (the at-least-once
    * redelivery), FILE-BY-FILE: the source table may be a single file
    * (the driver's layout) or a Spark-written DIRECTORY of part
    * files, and the file stream source does not recurse into a
    * dir-shaped symlink — it would silently stream ZERO rows (the
    * eventsStream lesson; the 10x/30x scale runs hit exactly this
    * here: 0.24 s rows-free "passes"). Returns the parsed flattened
    * change stream over the staged replay feed. */
  private def parsedReplayFeed(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    val staged = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val srcFiles =
      if (java.nio.file.Files.isDirectory(src))
        graft.sources.Formats.listDir(src)
          .filter(_.getFileName.toString.endsWith(".parquet"))
      else Seq(src)
    require(srcFiles.nonEmpty, s"$src contains no parquet files to stream")
    Seq("a", "b").foreach { copy =>
      srcFiles.zipWithIndex.foreach { case (p, i) =>
        val link = staged.resolve(f"events_${copy}_$i%05d.parquet")
        java.nio.file.Files.createSymbolicLink(link, p)
        link.toFile.deleteOnExit()
      }
    }
    staged.toFile.deleteOnExit()
    val stream = graft.sources.Tables.normalizeTs(
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(staged.toString))
    CdcQueries.flatten(Cdc.parse(CdcQueries.feedFrom(stream), col("json")))
  }

  val cdcStreamDedup: Q = Q(
    "cdc_stream_dedup",
    (s, dir) => runBounded(
      parsedReplayFeed(s, dir).dropDuplicates("key", "scn"), "append")
      .orderBy("scn"),
    Some(s"""WITH feed AS (${CdcQueries.feedSql})
            |${CdcQueries.parsedSql}
            |ORDER BY scn""".stripMargin))

  /** The production form of cdc_stream_dedup: state bounded by a
    * watermark. `dropDuplicatesWithinWatermark` guarantees a replay
    * arriving within the delay of the original is dropped, and evicts
    * a key's state once the watermark passes its event time + delay —
    * O(watermark-window) state on an unbounded feed, where the plain
    * row's dropDuplicates state grows forever (its doc comment's
    * documented trade, now implemented). The delay here is sized past
    * the bounded feed's whole event-time span, so on the test feed
    * nothing is ever late or evicted mid-run and the result is the
    * exact distinct set the oracle computes — on a real deployment the
    * delay is the redelivery SLA (hours), and replays older than it
    * are dropped as late rather than deduplicated by state. The
    * eviction/replay semantics under a TIGHT watermark are pinned by
    * StreamingSpec ("watermark-bounded dedup drops replays inside the
    * delay window"). */
  val cdcStreamDedupWm: Q = Q(
    "cdc_stream_dedup_wm",
    (s, dir) => runBounded(
      parsedReplayFeed(s, dir)
        .withColumn("event_ts", timestamp_micros(col("tm")))
        .withWatermark("event_ts", "3650 days")
        .dropDuplicatesWithinWatermark("key", "scn")
        .drop("event_ts"),
      "append").orderBy("scn"),
    Some(s"""WITH feed AS (${CdcQueries.feedSql})
            |${CdcQueries.parsedSql}
            |ORDER BY scn""".stripMargin))

  /** auto.evolve sink semantics: a second wave of data arrives with a
    * new column; the target table grows the column, old rows read as
    * NULL (mergeSchema + unionByName-compatible layout). */
  val cdcSchemaEvolve: Q = Q(
    "cdc_schema_evolve",
    (s, dir) => {
      val target = java.nio.file.Files
        .createTempDirectory("graft_evolve").toString + "/tbl"
      val e = graft.sources.Tables(s, dir).events
        .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      e.filter(col("event_id") % 2 === 0)
        .select("event_id", "user_id", "event_type")
        .write.mode("overwrite").parquet(target)
      e.filter(col("event_id") % 2 === 1)
        .select("event_id", "user_id", "event_type", "cents")
        .write.mode("append").parquet(target)
      s.read.option("mergeSchema", "true").parquet(target)
        // pre-evolution rows surface the new column as NULL; coalesce
        // for the oracle's sake (hash compare shouldn't see NULLs)
        .withColumn("cents", coalesce(col("cents"), lit(-1L)))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, -1 AS cents
           |FROM events WHERE event_id % 2 = 0
           |UNION ALL
           |SELECT event_id, user_id, event_type,
           |  CAST(round(value * 100) AS BIGINT) AS cents
           |FROM events WHERE event_id % 2 = 1
           |ORDER BY event_id""".stripMargin))

  /** tumbling-window aggregation, incremental with watermark.
    *
    * Output mode here (and in the hopping/session rows) is `complete` —
    * a HARNESS choice, not the scale shape: the bounded feed never
    * advances the watermark past its own last window, and complete mode
    * is what flushes final windows into a DuckDB-comparable answer. The
    * production shape is `append` + watermark eviction — closed windows
    * emit exactly once and leave the state store — demonstrated by
    * StreamingSpec ("append mode + watermark"), where a
    * watermark-advancing sentinel closes the windows and state shrinks
    * to the open window only. */
  val qStreamTumbling: Q = Q(
    "q_stream_tumbling",
    (s, dir) => {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
      runBounded(agg, "complete").orderBy("window_start_us", "event_type")
    },
    Some("""SELECT CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS BIGINT) * 3600000000 AS window_start_us,
           |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin))

  /** hopping (sliding) window aggregation, incremental with watermark —
    * the ksqlDB HOPPING window; each event updates two window states. */
  val qStreamHopping: Q = Q(
    "q_stream_hopping",
    (s, dir) => {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("event_type"), col("n"), col("sum_value"))
      runBounded(agg, "complete").orderBy("window_start_us", "event_type")
    },
    Some("""WITH e AS (
           |  SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
           |  FROM events),
           |x AS (
           |  SELECT event_type, value,
           |    ((us // 1800000000) - k) * 1800000000 AS window_start_us
           |  FROM e, unnest([0, 1]) AS t(k))
           |SELECT window_start_us, event_type, count(*) AS n,
           |  round(sum(value), 2) AS sum_value
           |FROM x GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin))

  /** streaming session windows (30-minute gap) per user. */
  val qStreamSession: Q = Q(
    "q_stream_session",
    (s, dir) => {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"), col("session_value"))
      runBounded(agg, "complete").orderBy("user_id", "start_us")
    },
    // session_window ends are exclusive: a gap of EXACTLY 30 min starts
    // a new session, hence >= (not >) in the oracle's gap predicate.
    Some("""WITH e AS (
           |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
           |  FROM events),
           |g AS (
           |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
           |      THEN 1 ELSE 0 END AS new_sess
           |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id
           |    ORDER BY us ASC, event_id ASC) AS prev_us FROM e)),
           |sess AS (
           |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
           |    ORDER BY us ASC, event_id ASC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           |  FROM g)
           |SELECT user_id, min(us) AS start_us,
           |  max(us) + 1800000000 AS end_us,
           |  count(*) AS n_events, round(sum(value), 2) AS session_value
           |FROM sess GROUP BY user_id, session_id
           |ORDER BY user_id, start_us""".stripMargin))

  /** stream-stream interval join: purchases within 30 minutes after a
    * click by the same user; watermarks bound both join states. */
  val qStreamJoin: Q = Q(
    "q_stream_join",
    (s, dir) => {
      val ev = eventsStream(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("click_id"))
        .withWatermark("c_ts", "1 hour")
      val buys = eventsStream(s, dir).filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("b_ts", "1 hour")
      val joined = clicks.join(buys,
        expr("c_user = b_user AND b_ts >= c_ts AND b_ts <= c_ts + interval 30 minutes"))
        .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
          (unix_micros(col("b_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
      runBounded(joined, "append").orderBy("user_id", "click_id", "purchase_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
           |  FROM events)
           |SELECT c.user_id AS user_id, c.event_id AS click_id,
           |  b.event_id AS purchase_id, b.us - c.us AS lag_us
           |FROM e c JOIN e b
           |  ON c.user_id = b.user_id AND c.event_type = 'click'
           |  AND b.event_type = 'purchase'
           |  AND b.us >= c.us AND b.us <= c.us + 1800000000
           |ORDER BY user_id, click_id, purchase_id""".stripMargin))

  /** stream-static enrichment: the change stream joined to a broadcast
    * dimension (the streaming face of cdc_snapshot_join). Stream-static
    * joins are stateless — each micro-batch probes the broadcast table,
    * no watermark, no state store. */
  val cdcStreamEnrich: Q = Q(
    "cdc_stream_enrich",
    (s, dir) => {
      val cust = broadcast(graft.sources.Tables(s, dir).customer
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")))
      val enriched = parsedStream(s, dir).toDF()
        .filter(col("op") =!= "d")
        .join(cust, col("key") === col("c_custkey"))
        .select(col("scn"), col("key"), col("cents"), col("typ").as("type"),
          col("c_name"), col("c_nationkey"))
      runBounded(enriched, "append").orderBy("scn")
    },
    Some(s"""WITH feed AS (${CdcQueries.feedSql}), p AS (${CdcQueries.parsedSql})
            |SELECT scn, key, after_cents AS cents, after_type AS type,
            |  c_name, c_nationkey
            |FROM p JOIN customer ON key = c_custkey
            |WHERE op <> 'd'
            |ORDER BY scn""".stripMargin))

  /** Streaming multi-table routing, terminal stage: ONE multiplexed
    * change stream fanned out inside each micro-batch into N per-table
    * bucketed lake tables ([[graft.sinks.ParquetUpsert]] per table) —
    * the reference's actual deployment shape (OLR {owner, table} filter
    * -> per-table topic -> sink table.name.format, reference
    * OpenLogReplicator.json:32-39,48 + README.md:784,791), end to end.
    *
    * Scale notes: the feed is parsed once (the batch Catalyst plan the
    * stream reuses); inside foreachBatch the parsed batch is persisted
    * once and each table's slice feeds its own upsert target, so the N
    * filters scan the cached batch, never the source; per-table cost is
    * the usual O(slice + touched buckets). The table list is derived
    * from the batch itself (a ≤N-row distinct collect — metadata), so
    * new tables appearing in the feed create their targets on arrival. */
  val cdcStreamRoute: Q = Q(
    "cdc_stream_route",
    (s, dir) => {
      import graft.cdc.Router
      val root = graft.sources.Formats.scratchDir("graft_route_lake")
      val routed = Router.parseRouted(
          Router.routedFeedFrom(eventsStream(s, dir)), col("json"))
        .select(col("tbl"), col("key"), col("scn"), col("xid"), col("op"),
          when(col("op") === "d", col("before.id")).otherwise(col("after.id")).as("id"),
          when(col("op") === "d", col("before.cents")).otherwise(col("after.cents")).as("cents"),
          when(col("op") === "d", col("before.type")).otherwise(col("after.type")).as("typ"))
      val q = routed.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.cdc.Router.applyRoutedBatch(batch, root)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      // discover tables through the same Hadoop FileSystem the sink
      // writes with — a java.io.File listing would see nothing on an
      // object store even though the lake is right there
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val hfs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      val fs = hfs.listStatus(rootPath).filter(_.isDirectory)
        .map(_.getPath.getName).sorted
      fs.map { t =>
        s.read.parquet(s"$root/$t")
          .filter(col("op") =!= "d")
          .select(lit(t).as("tbl"), col("key"), col("id"), col("cents"),
            col("typ").as("type"), col("scn").as("last_scn"))
      }.reduce(_.unionByName(_)).orderBy("tbl", "key")
    },
    Some(s"""WITH feed AS (${graft.cdc.Router.routedFeedSql}), p AS (
            |  SELECT
            |    CAST(json_extract(json, '$$.scn') AS BIGINT) AS scn,
            |    json_extract_string(json, '$$.xid') AS xid,
            |    json_extract_string(json, '$$.op') AS op,
            |    json_extract_string(json, '$$.table') AS tbl,
            |    CAST(json_extract(json, '$$.key') AS BIGINT) AS key,
            |    CAST(json_extract(json, '$$.after.id') AS BIGINT) AS after_id,
            |    CAST(json_extract(json, '$$.after.cents') AS BIGINT) AS after_cents,
            |    json_extract_string(json, '$$.after.type') AS after_type
            |  FROM feed),
            |ranked AS (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY tbl, key ORDER BY scn DESC, xid DESC) AS rn
            |  FROM p)
            |SELECT tbl, key, after_id AS id, after_cents AS cents,
            |  after_type AS type, scn AS last_scn
            |FROM ranked WHERE rn = 1 AND op <> 'd'
            |ORDER BY tbl, key""".stripMargin))

  /** Incrementally-maintained grouped aggregate over the change stream
    * — the ksqlDB `CREATE TABLE AS SELECT sum(...), count(*) GROUP BY`
    * materialized table, as a REAL streaming query. Contributions are
    * computed map-side from the full-image rows
    * ([[graft.cdc.ChangelogAgg.contributions]]); Structured Streaming's
    * stateful aggregation keeps ONE running row per GROUP (not per key
    * — state cardinality is #groups however large the table), and each
    * micro-batch emits the groups it changed (update mode). The memory
    * sink keeps every emission, so the result collapses to the latest
    * emission per group: `n_contrib` (contributions absorbed so far)
    * strictly increases every time any event touches the group, making
    * it a sound emission ordinal under ANY batch split — which the
    * registry row itself exercises by forcing the feed into two
    * micro-batches. Delta additivity makes the result independent of
    * how events split across batches; the oracle computes the same
    * aggregate via the materialized snapshot. */
  val cdcStreamChangelogAgg: Q = Q(
    "cdc_stream_changelog_agg",
    (s, dir) => {
      import graft.cdc.ChangelogAgg
      // the staged feed is the full-image WIRE (both payloads per
      // event, like OLR with supplemental logging) — the stream parses
      // bytes and goes straight to map-side deltas; no window anywhere
      val staged = ChangelogAgg.stagedFullFeed(s, dir)
      val schema = s.read.parquet(staged).schema
      val stream = ChangelogAgg.fullImageColumns(Cdc.parse(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(staged),
        col("json")))
      val agg = ChangelogAgg.contributions(stream)
        .groupBy("type")
        .agg(sum("d_cents").as("sum_cents"),
          sum("d_rows").as("live_rows"),
          count(lit(1)).as("n_contrib"))
      runBounded(agg, "update")
        .groupBy("type")
        .agg(max_by(struct(col("sum_cents"), col("live_rows")),
          col("n_contrib")).as("v"))
        .select(col("type"), col("v.sum_cents").as("sum_cents"),
          col("v.live_rows").as("live_rows"))
        .filter(col("live_rows") > 0)
        .orderBy("type")
    },
    Some(graft.cdc.ChangelogAgg.snapshotAggSql))

  /** One staged routed-feed directory per (session, source dir) — TWO
    * parquet files so `maxFilesPerTrigger=1` forces the pipeline row
    * through two genuine micro-batches. */
  private val pipelineStreamDirs =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The WHOLE reference topology as ONE live streaming query — the
    * deployed shape end to end (OLR multiplexed JSON feed -> parse ->
    * per-{owner,table} routing -> upsert-materialized tables + the
    * ksqlDB-style maintained aggregates over them; reference
    * OpenLogReplicator.json:32-39,48 + README.md "Connector
    * Configuration"). Every stage existed as its own registry row;
    * this row is the proof they COMPOSE live:
    *
    *   staged feed (2 files -> 2 forced micro-batches)
    *     -> [[graft.cdc.Router.parseRouted]]   (the ONE from_json)
    *     -> foreachBatch: [[graft.cdc.Router.foreachTableSlice]]
    *          (persisted batch, bounded-pool per-table fan-out)
    *        -> [[graft.sinks.ParquetUpsert.applyBatchWithDeltas]]
    *             (bucket-scoped lake merge, returns live-state deltas)
    *        -> [[graft.cdc.ChangelogAgg.mergeDeltaTable]]
    *             (running per-group aggregate table per table)
    *
    * Scale: per micro-batch the cost is O(batch + touched buckets) per
    * table plus a #groups-row aggregate fold — nothing rescans the
    * lake or the feed; the deltas telescope across ANY batch split
    * (post − prior over touched buckets, untouched keys cancel), so
    * the final aggregate table provably equals the composed snapshot
    * aggregate the DuckDB oracle computes from scratch. PipelineSpec
    * pins the cross-batch maintenance (group-moving update, delete,
    * mid-stream table discovery) and the single parse. */
  /** Start the composed CDC topology (parse once -> per-table fan-out
    * -> bucket-scoped lake upserts + maintained aggregate tables) over
    * the staged feed directory. The caller owns the query lifecycle;
    * `checkpoint` = a DURABLE location makes the run restartable — the
    * deployed shape (the reference's pipeline survives connector
    * restarts on Kafka Connect offset durability; README.md
    * "Verification"). PipelineSpec proves stop-after-batch-1 /
    * restart / finish equals the uninterrupted run. */
  private[graft] def startCdcTopology(
      s: SparkSession, staged: String, lakeRoot: String, aggRoot: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.cdc.{ChangelogAgg, Router}
    val schema = s.read.parquet(staged).schema
    val feed = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(staged)
    val routed = Router.parseRouted(feed, col("json"))
      .select(col("tbl"), col("key"), col("scn"), col("xid"), col("op"),
        when(col("op") === "d", col("before.id")).otherwise(col("after.id")).as("id"),
        when(col("op") === "d", col("before.cents")).otherwise(col("after.cents")).as("cents"),
        when(col("op") === "d", col("before.type")).otherwise(col("after.type")).as("typ"))
    val writer = routed.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Router.foreachTableSlice(batch, parallelism = 4) { (t, slice) =>
          val delta = graft.sinks.ParquetUpsert
            .applyBatchWithDeltas(slice, s"$lakeRoot/$t")
          ChangelogAgg.mergeDeltaTable(delta, s"$aggRoot/$t")
        }
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** The topology's queryable output: every maintained aggregate table
    * under `aggRoot`, labeled and filtered to live groups. */
  private[graft] def cdcTopologyResult(s: SparkSession, aggRoot: String): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(aggRoot)
    val hfs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tables = hfs.listStatus(rootPath).filter(_.isDirectory)
      .map(_.getPath.getName).sorted
    tables.map { t =>
      s.read.parquet(s"$aggRoot/$t")
        .select(lit(t).as("tbl"), col("type"),
          col("d_cents").as("sum_cents"), col("d_rows").as("live_rows"))
    }.reduce(_.unionByName(_))
      .filter(col("live_rows") > 0)
      .orderBy("tbl", "type")
  }

  val pipelineCdcStream: Q = Q(
    "pipeline_cdc_stream",
    (s, dir) => {
      import graft.cdc.Router
      val staged = pipelineStreamDirs.computeIfAbsent(
        (s.sparkContext.applicationId, dir), { _ =>
          val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_feed")
          graft.sources.Formats.deleteRecursivelyOnExit(tmp)
          val p = tmp.toString + "/feed"
          Router.routedFeed(s, dir).repartition(2)
            .write.mode("overwrite").parquet(p)
          p
        })
      val lakeRoot = graft.sources.Formats.scratchDir("graft_pipe_lake")
      val aggRoot = graft.sources.Formats.scratchDir("graft_pipe_agg")
      val q = startCdcTopology(s, staged, lakeRoot, aggRoot)
      try q.processAllAvailable() finally q.stop()
      cdcTopologyResult(s, aggRoot)
    },
    Some(s"""WITH feed AS (${graft.cdc.Router.routedFeedSql}), p AS (
            |  SELECT
            |    CAST(json_extract(json, '$$.scn') AS BIGINT) AS scn,
            |    json_extract_string(json, '$$.xid') AS xid,
            |    json_extract_string(json, '$$.op') AS op,
            |    json_extract_string(json, '$$.table') AS tbl,
            |    CAST(json_extract(json, '$$.key') AS BIGINT) AS key,
            |    CAST(json_extract(json, '$$.after.cents') AS BIGINT) AS after_cents,
            |    json_extract_string(json, '$$.after.type') AS after_type
            |  FROM feed),
            |ranked AS (
            |  SELECT *, row_number() OVER
            |    (PARTITION BY tbl, key ORDER BY scn DESC, xid DESC) AS rn
            |  FROM p)
            |SELECT tbl, after_type AS type,
            |  CAST(sum(after_cents) AS BIGINT) AS sum_cents,
            |  count(*) AS live_rows
            |FROM ranked WHERE rn = 1 AND op <> 'd'
            |GROUP BY 1, 2
            |ORDER BY tbl, type""".stripMargin))

  /** Live top-K leaderboard: the custom graft_topk aggregate
    * (TypedImperativeAggregate) running INSIDE Structured Streaming's
    * stateful aggregation — state per group is the K-bounded heap
    * buffer itself (serialized into the state store via the
    * aggregate's own serialize/deserialize), so a group's state stays
    * O(K) however many events stream through it. Update mode emits a
    * group's refreshed top-K whenever a batch touches it; the memory
    * sink keeps every emission, so the result collapses to the latest
    * per group ranked by `n_seen` (events absorbed — strictly
    * increasing per emission, same ordinal argument as
    * cdc_stream_changelog_agg). The bounded feed's final leaderboard
    * must equal the batch window-rank oracle. */
  val qStreamTopk: Q = Q(
    "q_stream_topk",
    (s, dir) => {
      val ev = eventsStream(s, dir)
        .select((col("user_id") % 10).as("grp"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
          col("event_id"))
      val agg = ev.groupBy("grp")
        .agg(expr("graft_topk(cents, event_id, 3)").as("top"),
          count(lit(1)).as("n_seen"))
      runBounded(agg, "update")
        .groupBy("grp")
        .agg(max_by(col("top"), col("n_seen")).as("top"))
        .select(col("grp"), posexplode(col("top")))
        .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
          col("col.v").as("cents"), col("col.id").as("event_id"))
        .orderBy("grp", "rank")
    },
    Some("""WITH e AS (
           |  SELECT user_id % 10 AS grp,
           |    CAST(round(value * 100) AS BIGINT) AS cents, event_id
           |  FROM events),
           |r AS (
           |  SELECT *, row_number() OVER
           |    (PARTITION BY grp ORDER BY cents DESC, event_id DESC) AS rank
           |  FROM e)
           |SELECT grp, rank, cents, event_id FROM r WHERE rank <= 3
           |ORDER BY grp, rank""".stripMargin))

  /** Streaming count-min sketch — q_approx_topk's sketch maintained
    * INCREMENTALLY over the event stream: the d×w cell counts are an
    * ordinary streaming aggregation (one state row per touched cell,
    * ≤ d·w rows of state TOTAL regardless of stream length — the
    * whole point of a sketch as streaming state, vs per-key counts
    * whose state grows with the key domain). Cells update per
    * micro-batch; counts are monotone, so the final sketch is the
    * max emitted per cell. The verdict output mirrors the batch row:
    * exact top-10 keys (from the completed table — the oracle side's
    * ground truth) with the CMS one-sided-error and εN-bound booleans,
    * which hash-match as constants. */
  val qStreamApproxTopk: Q = {
    import graft.operators.Cms
    Q(
      "q_stream_approx_topk",
      (s, dir) => {
        // geometry shared with the batch twin by construction (Cms)
        val buckets = Cms.buckets("user_id")
        val cellsAgg = eventsStream(s, dir)
          .select(explode(expr(buckets)).as("c"))
          .groupBy(col("c.r").as("r"), col("c.b").as("b"))
          .agg(count(lit(1)).as("cell_n"))
        val cells = runBounded(cellsAgg, "update")
          .groupBy("r", "b").agg(max("cell_n").as("cell_n"))
        val ev = graft.sources.Tables(s, dir).events.select(col("user_id"))
        val totals = ev.agg(count(lit(1)).as("total_n"))
        val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
          .orderBy(col("exact_n").desc, col("user_id")).limit(10)
        top.select(col("user_id"), col("exact_n"),
            explode(expr(buckets)).as("c"))
          .select(col("user_id"), col("exact_n"),
            col("c.r").as("r"), col("c.b").as("b"))
          .join(broadcast(cells), Seq("r", "b"))
          .groupBy("user_id", "exact_n")
          .agg(min("cell_n").as("est_n"))
          .crossJoin(broadcast(totals))
          .select(col("user_id"), col("exact_n"),
            (col("est_n") >= col("exact_n")).as("est_ge_exact"),
            (col("est_n") <= col("exact_n")
              + lit(Cms.EpsMul) * col("total_n") / lit(Cms.W.toLong))
              .as("within_eps"))
          .orderBy(col("exact_n").desc, col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS exact_n,
             |  true AS est_ge_exact, true AS within_eps
             |FROM events GROUP BY user_id
             |ORDER BY exact_n DESC, user_id LIMIT 10""".stripMargin))
  }

  val all: Seq[Q] = Seq(cdcStreamIngest, cdcStreamMaterialize, cdcUpsertSink,
    cdcJdbcUpsert, cdcStreamDedup, cdcStreamDedupWm, cdcSchemaEvolve, qStreamTumbling,
    qStreamHopping, qStreamSession, qStreamJoin, cdcStreamEnrich,
    cdcStreamScd2, cdcStreamRoute, cdcStreamChangelogAgg, qStreamTopk,
    qStreamApproxTopk, pipelineCdcStream)
}
