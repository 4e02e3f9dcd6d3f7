package graft.operators

import graft.Q
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-item features produced by the (stubbed) decoder in
  * mm_feature_extract. */
final case class MmFeatures(
    doc_id: Long, n_bytes: Long, byte_hash: Long,
    min_byte: Int, max_byte: Int, mean_byte: Long)

/** Multimodal-column plumbing: media arrive as opaque `binary` columns
  * with typed metadata. This container has no image/audio codecs, so
  * the binary payload is derived deterministically from `documents.text`
  * (pure ASCII -> byte values == code points, which is what lets the
  * DuckDB oracles verify byte-level results exactly), and the DECODE
  * step in mm_feature_extract is a clearly-marked deterministic stub.
  * Everything around the stub — schema, batch shape, partition-parallel
  * execution — is the real 100 TB design: metadata extraction is a
  * map-only scan; feature extraction is mapPartitions with bounded
  * batches (the shape a vectorized decoder/model wants) and never
  * collects to the driver.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents

  /** typed metadata over a binary column: byte length, sha-256,
    * magic-bytes sniff. */
  val mmBinaryMeta: Q = Q(
    "mm_binary_meta",
    (s, dir) => docs(s, dir)
      .withColumn("bin", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("bin")).as("n_bytes"),
        sha2(col("bin"), 256).as("sha"),
        hex(expr("substr(bin, 1, 4)")).as("magic"),
        expr("CASE WHEN substr(text, 1, 1) BETWEEN 'a' AND 'z' THEN 'text/plain' " +
          "WHEN substr(text, 1, 1) BETWEEN '0' AND '9' THEN 'digits' " +
          "ELSE 'other' END").as("sniffed_type")),
    Some("""SELECT doc_id,
           |  octet_length(encode(text)) AS n_bytes,
           |  sha256(text) AS sha,
           |  hex(encode(substring(text, 1, 4))) AS magic,
           |  CASE WHEN substring(text, 1, 1) BETWEEN 'a' AND 'z' THEN 'text/plain'
           |       WHEN substring(text, 1, 1) BETWEEN '0' AND '9' THEN 'digits'
           |       ELSE 'other' END AS sniffed_type
           |FROM documents""".stripMargin))

  /** frame/window sampling of a byte stream: 32-byte frames at stride
    * 16, each fingerprinted. posexplode of a computed frame array —
    * map-only, the explode factor is len/stride. */
  val mmFrameSample: Q = Q(
    "mm_frame_sample",
    (s, dir) => docs(s, dir)
      .filter(length(col("text")) >= 32)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, CAST(floor((length(text) - 32) / 16) AS INT)), " +
            "i -> sha2(CAST(substr(text, i*16 + 1, 32) AS BINARY), 256))")))
      .select(col("doc_id"), col("pos").as("frame_idx"), col("col").as("frame_sha")),
    Some("""WITH f AS (
           |  SELECT doc_id, text,
           |    unnest(range(0, (length(text) - 32) // 16 + 1)) AS i
           |  FROM documents WHERE length(text) >= 32
           |)
           |SELECT doc_id, i AS frame_idx,
           |  sha256(substring(text, CAST(i*16 + 1 AS BIGINT), 32)) AS frame_sha
           |FROM f""".stripMargin))

  /** batched feature extraction over (id, bytes) via mapPartitions.
    * The decoder is STUBBED with deterministic byte statistics (no
    * codecs in this container); a real deployment swaps `decodeBatch`
    * for a vectorized image/audio decoder, keeping the batch shape:
    * partitions stream through fixed-size batches, features come back
    * columnar per batch, nothing touches the driver. */
  val mmFeatureExtract: Q = Q(
    "mm_feature_extract",
    (s, dir) => {
      import s.implicits._
      val batchSize = 64
      docs(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("bytes"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.grouped(batchSize).flatMap { batch => decodeBatch(batch) }
        }
        .toDF()
    },
    Some(s"""WITH m AS (
            |  SELECT doc_id, text, [ord(c) FOR c IN string_split(text, '')] AS os
            |  FROM documents
            |)
            |SELECT doc_id,
            |  CAST(len(os) AS BIGINT) AS n_bytes,
            |  ${duckCharHash("text")} AS byte_hash,
            |  list_min(os) AS min_byte,
            |  list_max(os) AS max_byte,
            |  CAST(list_sum(os) AS BIGINT) // len(os) AS mean_byte
            |FROM m""".stripMargin))

  /** STUB decoder: deterministic byte statistics standing in for a real
    * vectorized decode (text is ASCII, so byte_hash equals the
    * code-point hash the oracle computes). */
  private def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MmFeatures] =
    batch.map { case (id, bytes) =>
      var h = 0L
      var sum = 0L
      var mn = 255
      var mx = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        h = (h * 31 + b) % P1
        sum += b
        if (b < mn) mn = b
        if (b > mx) mx = b
        i += 1
      }
      MmFeatures(id, bytes.length.toLong, h, mn, mx,
        if (bytes.length == 0) 0L else sum / bytes.length)
    }

  /** content-addressed dedup of binary media: group by sha-256 of the
    * payload (a 32-byte shuffle key regardless of media size — the only
    * viable dedup key when items are megabytes), keep the min doc_id.
    * The multimodal face of dedup_exact_norm. */
  val mmDedup: Q = Q(
    "mm_dedup",
    (s, dir) => docs(s, dir)
      .withColumn("sha", sha2(col("text").cast("binary"), 256))
      .groupBy("sha")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id"),
    Some("""SELECT min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM documents GROUP BY sha256(text)
           |ORDER BY keep_id""".stripMargin))

  val all: Seq[Q] = Seq(mmBinaryMeta, mmFrameSample, mmFeatureExtract, mmDedup)
}
