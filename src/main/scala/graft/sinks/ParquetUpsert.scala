package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert/delete merge onto a parquet-backed table, the file-sink face
  * of the reference's upsert semantics (insert.mode=upsert,
  * delete.enabled=true — reference README.md:787-795) for targets that
  * are data-lake tables rather than JDBC databases.
  *
  * Scale design — the whole point of this component: the target is
  * hash-partitioned into `bucket = pmod(hash(key), B)` directories, and
  * each micro-batch rewrites ONLY the buckets its keys fall into:
  *
  *  1. the existing-state read is partition-pruned to the touched
  *     buckets (the `bucket IN (...)` filter never opens the other
  *     directories);
  *  2. the merge (latest event per key by (scn, xid)) runs over
  *     |touched buckets| of data, not the whole table;
  *  3. the write uses dynamic partition overwrite, which replaces only
  *     the partition directories present in the output.
  *
  * Per-batch cost is therefore O(batch + touched-buckets), independent
  * of total table size — at 100 TB with B sized so a bucket is a few
  * GB, a micro-batch touching k distinct buckets rewrites k buckets,
  * not 100 TB. The only driver-side collect is the distinct bucket-id
  * list (≤ B small integers — metadata, not data). Tombstones (op='d')
  * are kept in the target so a late, older event can never resurrect a
  * deleted key; readers filter them out.
  *
  * ParquetUpsertSpec pins the contract that a batch leaves untouched
  * buckets' files physically unwritten.
  */
object ParquetUpsert {

  /** The bucket count is a physical property of the TABLE, not of any
    * one writer/reader call: a lookup hashed with a different B than
    * the writer used silently prunes to the wrong directory. So the
    * first applyBatch persists B in a `_graft_buckets` metadata file
    * (underscore-prefixed — invisible to the parquet reader) and every
    * later call, writer or reader, derives B from the table itself;
    * the `numBuckets` argument only seeds a brand-new table. */
  private def metaPath(target: String) =
    new org.apache.hadoop.fs.Path(target, "_graft_buckets")

  def bucketCount(sp: org.apache.spark.sql.SparkSession, target: String): Option[Int] = {
    val p = metaPath(target)
    val fs = p.getFileSystem(sp.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(fs.open(p)))
      val line = try in.readLine() finally in.close()
      if (line == null || line.trim.isEmpty)
        sys.error(s"$target/_graft_buckets is empty or truncated — " +
          "table metadata is corrupt; restore it or rebucket the table")
      Some(line.trim.toInt)
    }
  }

  /** Crash-atomic metadata write: the content lands under a temp name
    * and is renamed into place, so a reader can never observe a
    * half-written file — it sees either the old metadata or the new. */
  private def writeBucketCount(sp: org.apache.spark.sql.SparkSession,
                               target: String, n: Int): Unit = {
    val p = metaPath(target)
    val fs = p.getFileSystem(sp.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(target, s"._graft_buckets.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$n\n".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      sys.error(s"could not commit $target/_graft_buckets")
    }
  }

  /** The shared merge core: prune-read the existing state, merge the
    * batch, expose both sides plus the commit that writes the result.
    * `merged` is localCheckpointed (safe to read after commit replaces
    * the underlying files); `existing` is a LAZY view over the files
    * commit() overwrites — anything derived from it must materialize
    * before commit() runs. */
  private final case class MergedBatch(
      existing: DataFrame, merged: DataFrame, commit: () => Unit)

  private def mergeBatch(batch: DataFrame, target: String,
                         numBuckets: Int): MergedBatch = {
    val sp = batch.sparkSession
    val b = bucketCount(sp, target).getOrElse(numBuckets)
    val bucketed = batch.withColumn(
      "bucket", pmod(hash(col("key")), lit(b)))
    val touched = bucketed.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    // first batch bootstraps from empty ONLY when the target doesn't
    // exist; a corrupt/unreadable lake table must fail loud — merging
    // against a silently-empty "existing" would truncate every
    // untouched key in the touched buckets on the next overwrite
    val existing = graft.sources.Tables
      .readOrEmpty(sp, target, bucketed.schema)
      .filter(col("bucket").isin(touched.map(Int.box): _*))
    val w = Window.partitionBy("key").orderBy(col("scn").desc, col("xid").desc)
    val merged = existing.unionByName(bucketed)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    // materialize before the overwrite — the plan reads the same files
    // the write is about to replace
    val out = merged.localCheckpoint(true)
    MergedBatch(existing, out, () => {
      // metadata BEFORE the first data write: a crash between the two then
      // leaves a metadata file with no data (harmless — the next batch just
      // follows it), never data whose bucket count is unrecorded
      if (bucketCount(sp, target).isEmpty) writeBucketCount(sp, target, b)
      writeDynamic(out, target)
    })
  }

  /** Merge one micro-batch of parsed change rows (columns key, scn,
    * xid, op, id, cents, typ) into the bucketed parquet target.
    * The checkpointed merge is released as soon as the commit lands —
    * a long-running stream would otherwise pin one batch's worth of
    * storage blocks per micro-batch until driver GC, starving
    * execution memory over thousands of batches. */
  def applyBatch(batch: DataFrame, target: String, numBuckets: Int = 16): Unit = {
    val m = mergeBatch(batch, target, numBuckets)
    try m.commit() finally { m.merged.unpersist(false); () }
  }

  /** [[applyBatch]] that ALSO returns the batch's per-group live-state
    * delta — the aggregate-maintenance feed of the streaming pipeline
    * (see [[graft.cdc.ChangelogAgg]]): for each payload `typ`,
    * `post(touched buckets) − prior(touched buckets)` over live
    * (non-tombstone) rows, as rows `(type, d_cents, d_rows)`. Keys the
    * batch did not touch appear identically in prior and post and
    * cancel, so the delta needs no per-key bookkeeping; summing deltas
    * over any micro-batch split telescopes to exactly the snapshot
    * aggregate. Cost on top of the merge: ONE extra aggregate over the
    * already-pruned touched buckets, materialized to a handful of
    * group rows before the overwrite invalidates the prior view. */
  def applyBatchWithDeltas(batch: DataFrame, target: String,
                           numBuckets: Int = 16): DataFrame = {
    val m = mergeBatch(batch, target, numBuckets)
    def live(df: DataFrame, sign: Int): DataFrame =
      df.filter(col("op") =!= "d")
        .groupBy(col("typ").as("type"))
        .agg((sum("cents") * sign).as("d_cents"),
          (count(lit(1)) * sign).as("d_rows"))
    // prior reads the very files commit() replaces — pin it first
    val prior = live(m.existing, -1).localCheckpoint(true)
    m.commit()
    // reduce to the #groups-row delta eagerly so the batch-sized merge
    // and the prior snapshot can be released NOW instead of lingering
    // per micro-batch until driver GC (the returned frame pins only a
    // handful of group rows)
    val delta = live(m.merged, 1).unionByName(prior).localCheckpoint(true)
    m.merged.unpersist(false)
    prior.unpersist(false)
    delta
  }

  /** Re-hash the whole table into `newB` buckets — the lever for a table
    * that outgrew its creation-time bucket count (a few-GB bucket at
    * sf0.1 is a few-TB bucket at 100 TB). One full rewrite by design;
    * afterwards every reader/writer derives `newB` from the metadata as
    * usual. Crash stance is fail-loud: the metadata file is removed
    * before the rewrite and re-written after it, so a crash mid-rebucket
    * leaves a table whose pointLookup/applyBatch error out loudly rather
    * than silently pruning against the wrong layout. */
  def rebucket(sp: org.apache.spark.sql.SparkSession, target: String,
               newB: Int): Unit = {
    val oldB = bucketCount(sp, target).getOrElse(sys.error(
      s"$target has no _graft_buckets metadata — not a ParquetUpsert table"))
    if (oldB == newB) return
    val all = sp.read.parquet(target).drop("bucket")
      .withColumn("bucket", pmod(hash(col("key")), lit(newB)))
      .localCheckpoint(true)
    val newDirs = all.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val root = new org.apache.hadoop.fs.Path(target)
    val fs = root.getFileSystem(sp.sparkContext.hadoopConfiguration)
    fs.delete(metaPath(target), false)
    writeDynamic(all, target)
    // drop old-layout directories the new hashing left unused (dynamic
    // overwrite only replaces partitions present in its output)
    (0 until oldB).filterNot(newDirs).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"bucket=$b"), true)
    }
    writeBucketCount(sp, target, newB)
    all.unpersist(false); ()
  }

  /** Tombstone compaction: once every replica/consumer has passed
    * `upToScn`, delete tombstones at or below it can no longer be
    * needed to fence late events — rewrite ONLY the buckets that hold
    * such tombstones, dropping them. Buckets left completely empty have
    * their directories removed (dynamic overwrite cannot replace a
    * partition with nothing). Like the merge itself, cost is
    * O(affected buckets), never O(table). */
  def compact(sp: org.apache.spark.sql.SparkSession, target: String,
              upToScn: Long): Unit = {
    val full = sp.read.parquet(target)
    val oldTomb = col("op") === "d" && col("scn") <= upToScn
    val affected = full.filter(oldTomb)
      .select("bucket").distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return
    val kept = full
      .filter(col("bucket").isin(affected.map(Int.box): _*))
      .filter(!oldTomb)
      .localCheckpoint(true)
    val keptBuckets = kept.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (keptBuckets.nonEmpty) writeDynamic(kept, target)
    val root = new org.apache.hadoop.fs.Path(target)
    val fs = root.getFileSystem(sp.sparkContext.hadoopConfiguration)
    affected.filterNot(keptBuckets).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"bucket=$b"), true)
    }
    kept.unpersist(false); ()
  }

  /** ksqlDB-style "pull query": the current state of ONE key, served
    * from the lake table. The bucket predicate is computed driver-side
    * from the same hash — and, crucially, the same bucket count, read
    * from the table's metadata file — the writer used, so the scan
    * partition-prunes to a single `bucket=N` directory — at 100 TB the
    * lookup opens a few-GB bucket, not the table. Tombstoned keys
    * correctly return no row. Pruning and writer/reader bucket-count
    * agreement are spec-pinned (ParquetUpsertSpec). */
  def pointLookup(sp: org.apache.spark.sql.SparkSession, target: String,
                  key: Long): DataFrame = {
    val b = bucketCount(sp, target).getOrElse(sys.error(
      s"$target has no _graft_buckets metadata — not a ParquetUpsert table"))
    sp.read.parquet(target)
      .filter(col("bucket") === pmod(hash(lit(key)), lit(b)))
      .filter(col("key") === key && col("op") =!= "d")
      .drop("bucket")
  }

  /** The key's `bucket=N` directory under the writer's layout: the SAME
    * hash the writer used (`pmod(hash(col("key")), lit(b))` — Murmur3
    * seed 42), evaluated driver-side through the identical Catalyst
    * expression so writer and reader can never disagree. */
  private def bucketFor(key: Long, b: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = Murmur3Hash(Seq(Literal(key)), 42).eval().asInstanceOf[Int]
    val m = h % b
    if (m < 0) m + b else m
  }

  /** Batched pull query: the current state of MANY keys in ONE scan —
    * the shape a pull-query server runs for a 1000-key batch (N
    * single-key [[pointLookup]]s would plan N scans). The partition
    * filter is `bucket IN (the keys' distinct buckets)`, computed
    * driver-side from the writer-recorded bucket count, so the scan
    * opens only the touched `bucket=N` directories — at 100 TB a
    * 1000-key batch opens ≤1000 few-GB trees, never the table — with
    * the `key IN (...)` residual applied inside them. Same
    * tombstone-hiding contract as pointLookup. */
  def pointLookupMany(sp: org.apache.spark.sql.SparkSession, target: String,
                      keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "pointLookupMany needs at least one key")
    val b = bucketCount(sp, target).getOrElse(sys.error(
      s"$target has no _graft_buckets metadata — not a ParquetUpsert table"))
    val buckets = keys.map(bucketFor(_, b)).distinct
    sp.read.parquet(target)
      .filter(col("bucket").isin(buckets.map(Int.box): _*))
      .filter(col("key").isin(keys.map(Long.box): _*) && col("op") =!= "d")
      .drop("bucket")
  }

  /** Dynamic partition overwrite as a PER-WRITER option, not a session
    * conf mutation: concurrent upserts to different tables (the routed
    * fan-out runs per-table merges on a thread pool) must not race on
    * session state — a lost restore would silently flip a sibling's
    * overwrite to static mode and truncate its whole target. */
  private def writeDynamic(out: DataFrame, target: String): Unit =
    out.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(target)
}
