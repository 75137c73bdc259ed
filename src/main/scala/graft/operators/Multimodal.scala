package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads modeled as opaque
  * `binary` columns bundled with typed metadata structs, plus
  * decode / feature-extract / frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * DETERMINISTIC FAKE (byte statistics standing in for pixel
  * statistics) — but the Spark plumbing is real: binary columns,
  * nested struct schema, partition-batched `mapPartitions` with a
  * typed Encoder (the Scala analog of Python's mapInPandas batch
  * shape), and explode of sampled frames. Swapping the fake for a JNI
  * or Pandas-UDF codec changes one function, not the plan.
  */
object Multimodal {

  /** Media row shape used by the typed decode stage. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      byte_sum: Long, first_byte: Int, frames_sampled: Int)

  /** Bundle text + embedding + metadata into one multimodal struct
    * column and read typed fields back out (schema-evolution select).
    * The payload binary stands in for an encoded image/audio blob. */
  def pack(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val e = t(spark, dir, "embeddings")
    d.join(e, d("doc_id") === e("vec_id"))
      .withColumn("media", struct(
        struct(col("lang"), col("source"), col("n_chars")).as("meta"),
        encode(col("text"), "utf-8").as("payload"),
        col("embedding")))
      .select(col("doc_id"),
        col("media.meta.lang").as("lang"),
        col("media.meta.source").as("source"),
        length(col("media.payload")).cast("long").as("payload_bytes"),
        size(col("media.embedding")).cast("long").as("emb_dim"))
      .orderBy(col("doc_id"))
  }

  val packSql: String =
    """SELECT doc_id, lang, source,
      | cast(octet_length(encode(text)) as bigint) AS payload_bytes,
      | cast(len(embedding) as bigint) AS emb_dim
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin

  /** Decode / feature-extract over binary payloads via typed
    * mapPartitions — batch-per-partition, the distributed shape a real
    * codec UDF needs. The "decode" is byte statistics (see header). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .select(col("doc_id"),
        // deterministic fake modality from the id
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        // stub decode: real impl would parse the codec here (???)
        val sum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xFF))
        val frames = bytes.indices.count(_ % 32 == 0) // every 32nd byte = one "frame"
        MediaFeatures(r.doc_id, r.media_type, bytes.length.toLong, sum,
          if (bytes.nonEmpty) bytes(0) & 0xFF else -1, frames)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Frame sampling: every 32nd byte of the payload as a "frame",
    * exploded to one row per frame with its offset — the plan shape of
    * video frame extraction (explode + narrow transforms, no shuffle
    * until the downstream aggregation). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("payload", encode(col("text"), "utf-8"))
      .withColumn("frame_off", explode(expr(
        "sequence(1, greatest(length(payload), 1), 32)")))
      .select(col("doc_id"), col("frame_off").cast("long").as("frame_off"),
        expr("cast(substring(payload, frame_off, 1) as string)").as("frame_byte"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        concat_ws("", collect_list(col("frame_byte"))).as("frame_digest"))
      .select(col("doc_id"), col("n_frames"), length(col("frame_digest")).cast("long").as("digest_len"))
      .orderBy(col("doc_id"))

  val frameSampleSql: String =
    """SELECT doc_id,
      | cast(greatest(ceil(octet_length(encode(text)) / 32.0), 1) as bigint) AS n_frames,
      | cast(greatest(ceil(octet_length(encode(text)) / 32.0), 1) as bigint) AS digest_len
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("mm_pack_struct", pack, Some(packSql)),
    GQuery("mm_decode_features", decodeFeatures, None),
    GQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
  )
}
