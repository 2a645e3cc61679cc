package graft.analytics

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaDecode, MediaRecord}
import Tables._

/**
 * Multimodal-column operators: media as opaque `binary` payloads with
 * typed metadata, joined against the embedding modality. m01 is pure
 * built-in expressions (oracle-checked); m02 exercises the typed
 * decode/feature-extract path ([[graft.multimodal.MediaDecode]] — the
 * codec is a documented stub, the Spark plumbing is real).
 *
 * Scale notes (100 TB): payload work is narrow per-row map (decode
 * parallelism = input partitioning, no shuffle); the metadata join keys
 * on the id with the small side broadcast.
 */
object Multimodal {

  // ---------------------------------------------------------------- m01
  // Payload metadata + cross-modal join: byte length and fake header of
  // the text-as-bytes payload, joined to the embedding's exact norm².
  private val m01 = QueryDef(
    "m01_payload_metadata",
    (s, dir) => {
      val d = docs(s, dir).select(
        col("doc_id"),
        col("lang"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        hex(substring(col("text"), 1, 8).cast("binary")).as("header_hex"))
      val e = embs(s, dir)
        .withColumn("qv", expr(quantizeExpr("embedding")))
        .select(col("vec_id"), expr(dotExpr("qv", "qv")).as("emb_norm2"))
      d.join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_bytes"), col("header_hex"), col("emb_norm2"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, lang,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      hex(encode(substr(text, 1, 8))) AS header_hex,
      ${dotSql(quantizeSql("embedding"), quantizeSql("embedding"))} AS emb_norm2
    FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"""))

  // ---------------------------------------------------------------- m02
  // Decode / feature-extract over binary payloads via the typed batched
  // mapPartitions path. No oracle (the decode stub is Scala-side); the
  // driver records a rows-only check.
  private val m02 = QueryDef(
    "m02_media_features",
    (s, dir) => {
      import s.implicits._
      val records = docs(s, dir)
        .select(
          col("doc_id").as("media_id"),
          expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("kind"),
          col("text").cast("binary").as("payload"))
        .as[MediaRecord]
      MediaDecode.features(records)
        .toDF()
        .orderBy(col("media_id"))
    },
    None)

  // ---------------------------------------------------------------- m03
  // Frame sampling over binary payloads: treat the payload as fixed-width
  // 32-byte frames (64 hex chars), sample every 4th frame, and fingerprint
  // each sampled frame — the video frame-sample plumbing (stride, index,
  // per-frame feature) with a deterministic "decoder" (hex slices) instead
  // of a codec. Narrow per-row explode: no shuffle until the final sort;
  // at 100 TB decode parallelism is the input partitioning.
  private val m03 = QueryDef(
    "m03_frame_sample",
    (s, dir) => {
      // hex payload materialized in its own projection — referenced from
      // inside the per-frame lambda, so it must not re-encode per frame
      val hexed = docs(s, dir)
        .select(col("doc_id").as("media_id"), hex(col("text").cast("binary")).as("ph"))
        .withColumn("n_frames", expr("length(ph) DIV 64"))
        .filter(col("n_frames") >= 1)
      hexed
        .select(col("media_id"), col("ph"),
          explode(expr("sequence(0L, n_frames - 1, 4L)")).as("frame_idx"))
        .withColumn("frame", expr("substring(ph, CAST(frame_idx * 64 + 1 AS INT), 64)"))
        .select(col("media_id"), col("frame_idx"),
          expr(strHashExpr("frame")).as("frame_hash"))
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some(s"""WITH ph AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS ph FROM documents),
    nf AS (SELECT media_id, ph, CAST(length(ph) // 64 AS BIGINT) AS n_frames
           FROM ph WHERE length(ph) >= 64),
    ix AS (SELECT media_id, ph, unnest(range(0, n_frames, 4)) AS frame_idx FROM nf),
    fr AS (SELECT media_id, frame_idx,
             substring(ph, CAST(frame_idx * 64 + 1 AS INT), 64) AS frame
           FROM ix)
    SELECT media_id, frame_idx, ${strHashSql("frame")} AS frame_hash
    FROM fr ORDER BY media_id, frame_idx"""))

  // ---------------------------------------------------------------- m04
  // Resize: nearest-neighbor downsample of every payload to a fixed
  // 16-byte thumbnail (sample position i ← floor(i·len/16)) plus its
  // fingerprint — the image-resize plumbing shape (fixed output geometry
  // from variable input geometry) with byte sampling standing in for a
  // pixel kernel. Pure per-row projection: no shuffle, no UDF.
  private def resizeConcat(floorDiv: String): String =
    (0 until 16).map { i =>
      s"substring(ph, CAST((($i * n_bytes) $floorDiv 16) * 2 + 1 AS INT), 2)"
    }.mkString(" || ")

  private val m04 = QueryDef(
    "m04_resize_thumbnail",
    (s, dir) => {
      val hexed = docs(s, dir)
        .select(col("doc_id").as("media_id"), hex(col("text").cast("binary")).as("ph"))
        .withColumn("n_bytes", expr("length(ph) DIV 2"))
        .filter(col("n_bytes") >= 16)
      hexed
        .withColumn("thumb_hex", expr(resizeConcat("DIV")))
        .select(col("media_id"), col("thumb_hex"),
          expr(strHashExpr("thumb_hex")).as("thumb_hash"))
        .orderBy(col("media_id"))
    },
    Some(s"""WITH ph AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS ph,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    r AS (SELECT media_id, ${resizeConcat("//")} AS thumb_hex
          FROM ph WHERE n_bytes >= 16)
    SELECT media_id, thumb_hex, ${strHashSql("thumb_hex")} AS thumb_hash
    FROM r ORDER BY media_id"""))

  val defs: Seq[QueryDef] = Seq(m01, m02, m03, m04)
}
