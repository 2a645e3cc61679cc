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

  val defs: Seq[QueryDef] = Seq(m01, m02)
}
