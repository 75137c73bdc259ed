package graft.operators

import graft.GQuery
import graft.util._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads modeled as opaque
  * `binary` columns bundled with typed metadata structs, plus
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The decode stage is a REAL image codec: payloads are binary PPM
  * (P6) images (graft.functions.Ppm — header parse, bounds checks,
  * pixel statistics, 2× box-filter downsample), generated
  * deterministically from the document text since the container ships
  * no camera data. The Spark plumbing is the production shape: binary
  * columns, nested struct schema, partition-batched `mapPartitions`
  * with a typed Encoder (the Scala analog of Python's mapInPandas
  * batch shape), and explode of sampled frames. Swapping PPM for a
  * JPEG/PNG JNI codec changes the two Ppm functions, not the plan.
  */
object Multimodal {

  import graft.functions.{Ppm, Wav}

  /** Media row shape used by the typed decode stage. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Raw codec accumulations per media row — the ONLY engine-side
    * (non-relational) stage of the decode entries: integer channel /
    * amplitude sums straight out of the byte plane, plus the actually
    * downsampled dims. Image fields are -1 for audio rows and vice
    * versa (one wide row beats a union of per-modality tables — the
    * downstream filter prunes by media_type). Everything DOWNSTREAM
    * of these sums (micro-unit means, Rec.601 luma, the floor-halved
    * dim law, ordering) is relational and replays in DuckDB from the
    * sidecar. */
  case class MediaRawSums(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long,
      half_width: Int, half_height: Int,
      sample_rate: Int, n_samples: Int, sum_abs: Long, zero_crossings: Long)

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

  /** WebDataset-style BYTE-BUDGET shard plan for media blobs: training
    * loaders stream sequential tar shards of roughly fixed byte size,
    * so the plan assigns each blob, in deterministic (source, doc_id)
    * order, to shard = exclusive-prefix-bytes div budget — byte-offset
    * sharding, the streaming-writer semantic (a shard absorbs the blob
    * that crosses its boundary). Prefix sums run per SOURCE (the
    * WebDataset convention of sharding within a collection), so the
    * window is bounded by the largest source, not the corpus — the
    * same per-group discipline as `text_pack_sequences`; a global
    * ordering would be the one-task sort this repo bans. All-integer
    * arithmetic ⇒ fully oracle-checked. The 2 KiB budget is sized so
    * the oracle fixture (≈7 KB/source at sf0.01) yields 3–4 shards per
    * source — the boundary-absorption semantic is exercised, not just
    * shard 0. */
  def shardByBytes(spark: SparkSession, dir: String): DataFrame = {
    val budget = 2048L
    t(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        octet_length(encode(col("text"), "utf-8")).cast("long").as("nbytes"))
      .withColumn("shard",
        expr(s"coalesce(sum(nbytes) over (partition by source order by doc_id rows between unbounded preceding and 1 preceding), 0L) div $budget"))
      .groupBy(col("source"), col("shard"))
      .agg(count(lit(1)).as("n_blobs"), sum(col("nbytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("shard"))
  }

  val shardByBytesSql: String =
    """WITH blobs AS (
      | SELECT source, doc_id,
      |  cast(octet_length(encode(text)) as bigint) AS nbytes
      | FROM documents),
      |planned AS (
      | SELECT source, doc_id, nbytes,
      |  cast(coalesce(sum(nbytes) OVER (PARTITION BY source ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS shard
      | FROM blobs)
      |SELECT source, shard, count(*) AS n_blobs,
      | cast(sum(nbytes) as bigint) AS shard_bytes,
      | min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM planned GROUP BY source, shard ORDER BY source, shard""".stripMargin

  /** The media ingest stage: one media payload per document — a real
    * PPM image for image/video docs, a real RIFF/WAV clip for audio
    * docs (both deterministic from the text), typed for mapPartitions. */
  def mediaTable(spark: SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, mt, text) =>
        val payload =
          if (mt == "audio") Wav.encode(Wav.synth(text))
          else Ppm.encode(Ppm.synth(text))
        MediaRow(id, mt, payload)
      })
  }

  /** Decode / feature-extract / resize over binary payloads via typed
    * mapPartitions — batch-per-partition, the distributed shape a real
    * codec needs (each partition decodes its media locally; nothing
    * wide ever shuffles). The codec is chosen by CONTAINER DETECTION
    * (RIFF magic vs PPM magic), not by trusting the metadata column:
    * images get header parse + channel sums + a real 2× box
    * downsample, audio gets chunk walk + amplitude accumulations.
    *
    * Hash-green discipline (the `mm_scene_cuts` pattern): the codec
    * emits RAW INTEGER SUMS to a sidecar; every stat column is a
    * committed truncating division in micro-units computed
    * relationally from those sums, so DuckDB replays the whole
    * feature stage and only the byte-plane loops stay engine-side.
    * Micro-mean bounds: sums ≤ 255·n_px, so sum·10⁶ fits int64 to
    * ~3.6e10 px/image (and 32768·10⁶-scale for audio) — answer-safe
    * for any decodable frame. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = mediaTable(spark, dir).mapPartitions { rows =>
      rows.map { r =>
        val isRiff = r.payload.length >= 4 && r.payload(0) == 'R' &&
          r.payload(1) == 'I' && r.payload(2) == 'F' && r.payload(3) == 'F'
        if (isRiff) {
          val a = Wav.decode(r.payload)
          var sumAbs = 0L; var zc = 0L; var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i)
            sumAbs += math.abs(s.toInt)
            if (i > 0 && ((s >= 0) != (a.samples(i - 1) >= 0))) zc += 1
            i += 1
          }
          MediaRawSums(r.doc_id, r.media_type, r.payload.length.toLong,
            -1, -1, -1L, -1L, -1L, -1, -1,
            a.sampleRate, a.samples.length, sumAbs, zc)
        } else {
          val img = Ppm.decode(r.payload)
          var sr = 0L; var sg = 0L; var sb = 0L; var i = 0
          while (i < img.pixels.length) {
            sr += img.pixels(i) & 0xFF
            sg += img.pixels(i + 1) & 0xFF
            sb += img.pixels(i + 2) & 0xFF
            i += 3
          }
          val half = Ppm.downsample2x(img) // the resize stage, for real
          MediaRawSums(r.doc_id, r.media_type, r.payload.length.toLong,
            img.width, img.height, sr, sg, sb,
            half.width, half.height,
            -1, -1, -1L, -1L)
        }
      }
    }.toDF()
    graft.util.oracleSidecar("media_raw_sums", raw)
    def chanMicro(sum: String): org.apache.spark.sql.Column = expr(
      s"CASE WHEN width > 0 THEN $sum * 1000000 div " +
        "(cast(width as bigint) * height) ELSE -1 END")
    raw.select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("width"), col("height"),
        chanMicro("sum_r").as("mean_r_micro"),
        chanMicro("sum_g").as("mean_g_micro"),
        chanMicro("sum_b").as("mean_b_micro"),
        // Rec.601 luma in micro-units: 0.299·ΣR/n·10⁶ = 299000·ΣR/n
        expr("CASE WHEN width > 0 THEN " +
          "(299 * sum_r + 587 * sum_g + 114 * sum_b) * 1000 div " +
          "(cast(width as bigint) * height) ELSE -1 END")
          .as("mean_luma_micro"),
        col("half_width"), col("half_height"),
        col("sample_rate"), col("n_samples"),
        expr("CASE WHEN n_samples > 0 THEN sum_abs * 1000000 div n_samples " +
          "ELSE -1 END").as("mean_abs_micro"),
        col("zero_crossings"))
      .orderBy(col("doc_id"))
  }

  lazy val decodeFeaturesSql: String =
    s"""WITH raw AS (
       | SELECT * FROM read_parquet('${oracleSidecarGlob("media_raw_sums")}'))
       |SELECT doc_id, media_type, n_bytes, width, height,
       | cast(CASE WHEN width > 0 THEN sum_r * 1000000
       |   // (cast(width as bigint) * height) ELSE -1 END as bigint)
       |   AS mean_r_micro,
       | cast(CASE WHEN width > 0 THEN sum_g * 1000000
       |   // (cast(width as bigint) * height) ELSE -1 END as bigint)
       |   AS mean_g_micro,
       | cast(CASE WHEN width > 0 THEN sum_b * 1000000
       |   // (cast(width as bigint) * height) ELSE -1 END as bigint)
       |   AS mean_b_micro,
       | cast(CASE WHEN width > 0 THEN
       |   (299 * sum_r + 587 * sum_g + 114 * sum_b) * 1000
       |   // (cast(width as bigint) * height) ELSE -1 END as bigint)
       |   AS mean_luma_micro,
       | -- the floor-halving law of the 2x box downsample: the engine
       | -- reports dims from the ACTUAL resized image; this recompute
       | -- catches a codec that halves differently
       | cast(CASE WHEN width > 0 THEN greatest(width // 2, 1)
       |   ELSE -1 END as int) AS half_width,
       | cast(CASE WHEN width > 0 THEN greatest(height // 2, 1)
       |   ELSE -1 END as int) AS half_height,
       | sample_rate, n_samples,
       | cast(CASE WHEN n_samples > 0 THEN sum_abs * 1000000 // n_samples
       |   ELSE -1 END as bigint) AS mean_abs_micro,
       | zero_crossings
       |FROM raw ORDER BY doc_id""".stripMargin

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

  /** Audio framing: 20 ms (160-sample @ 8 kHz) windows per clip with
    * per-frame energy — the audio twin of video frame sampling (the
    * shape feeding any downstream acoustic model). Decode + frame
    * locally in mapPartitions; the codec emits one row per frame
    * with the RAW integer sum of squares, so no explode is needed
    * and the stage stays token-linear and partition-local.
    *
    * Hash-green discipline: the per-frame integer accumulations go
    * to a sidecar; DuckDB recomputes the committed truncating mean
    * (Σs² div len) AND the per-clip n_samples as Σ len over the
    * doc — a real cross-check of the codec's sample total against
    * its own frame partition. Σs² ≤ 32768²·len — int64-safe to
    * ~8.6e9 samples/frame. */
  case class AudioFrameRaw(doc_id: Long, n_samples: Int, frame_idx: Long,
      sumsq: Long, flen: Int)

  def audioFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 160
    val raw = mediaTable(spark, dir)
      .filter(_.media_type == "audio")
      .mapPartitions(_.flatMap { r =>
        val a = Wav.decode(r.payload)
        a.samples.grouped(frameLen).zipWithIndex.map { case (frame, idx) =>
          var ss = 0L; var i = 0
          while (i < frame.length) {
            val s = frame(i).toLong; ss += s * s; i += 1
          }
          AudioFrameRaw(r.doc_id, a.samples.length, idx.toLong, ss, frame.length)
        }
      })
      .toDF()
    graft.util.oracleSidecar("audio_frame_raw",
      raw.select(col("doc_id"), col("frame_idx"), col("sumsq"), col("flen")))
    raw.select(col("doc_id"), col("n_samples").cast("long").as("n_samples"),
        col("frame_idx"), expr("sumsq div flen").as("energy_mean_sq"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  lazy val audioFramesSql: String =
    s"""WITH f AS (
       | SELECT doc_id, frame_idx, sumsq, flen
       | FROM read_parquet('${oracleSidecarGlob("audio_frame_raw")}'))
       |SELECT doc_id,
       | cast(sum(flen) OVER (PARTITION BY doc_id) as bigint) AS n_samples,
       | frame_idx, cast(sumsq // flen as bigint) AS energy_mean_sq
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Image near-dup detection by perceptual hash — the image half of
    * the dedup story (byte-identical re-encodes are caught by exact
    * hashing; dHash catches resized/re-rendered copies). Each image
    * decodes locally in mapPartitions to a 9×8 mean-luma grid whose
    * row-wise gradient signs form a 64-bit dHash; candidate pairs come
    * from the same 4×16-bit pigeonhole banding as `dedup_simhash`
    * (hamming ≤ 3 ⇒ some chunk equal) and are verified with
    * `bit_count(xor)`. Index is (doc_id, 64-bit hash) — a few longs
    * per image regardless of payload size, so the join side never
    * carries pixels. Sketch → rows-only; spec asserts the hamming
    * bound and that identical-payload images collide at hamming 0. */
  case class ImgHash(doc_id: Long, dhash: Long)

  /** 64-bit dHash of a PPM payload: 9×8 mean-luma grid, one bit per
    * row-wise gradient sign. Pure — exposed for the property spec
    * (equal payloads ⇒ equal hash; resilient to small luma jitter). */
  def dhashOf(payload: Array[Byte]): Long = {
    val img = Ppm.decode(payload)
    val (gw, gh) = (9, 8)
    var h = 0L; var bit = 0
    var prev = 0.0
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        val x0 = gx * img.width / gw
        val x1 = math.max((gx + 1) * img.width / gw, x0 + 1)
        val y0 = gy * img.height / gh
        val y1 = math.max((gy + 1) * img.height / gh, y0 + 1)
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < img.height) {
          var x = x0
          while (x < x1 && x < img.width) {
            val p = (y * img.width + x) * 3
            s += 0.299 * (img.pixels(p) & 0xFF) +
              0.587 * (img.pixels(p + 1) & 0xFF) +
              0.114 * (img.pixels(p + 2) & 0xFF)
            n += 1; x += 1
          }
          y += 1
        }
        val luma = if (n > 0) s / n else 0.0
        if (gx > 0) { // 8 gradient bits per row of 9 cells
          if (luma > prev) h |= (1L << bit)
          bit += 1
        }
        prev = luma
        gx += 1
      }
      gy += 1
    }
    h
  }

  def imageDhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = mediaTable(spark, dir)
      .filter(_.media_type != "audio")
      .mapPartitions(_.map(r => ImgHash(r.doc_id, dhashOf(r.payload)))).toDF()
    // hash-green since round 10: the codec-derived dhash values (the
    // only non-relational stage) go to a sidecar; DuckDB replays the
    // 4×16-bit pigeonhole banding and the bit_count(xor) ≤ 3 verify
    graft.util.oracleSidecar("dhash_sigs", hashes)
    val banded = hashes.select(col("doc_id"), col("dhash"), posexplode(array(
        (0 until 4).map(c => shiftright(col("dhash"), c * 16).bitwiseAND(0xFFFF)): _*))
      .as(Seq("chunk", "chunk_val"))).cache()
    val l = banded.select(col("doc_id").as("a_id"), col("dhash").as("ha"), col("chunk"), col("chunk_val"))
    val r = banded.select(col("doc_id").as("b_id"), col("dhash").as("hb"), col("chunk"), col("chunk_val"))
    l.join(r, Seq("chunk", "chunk_val")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", bit_count(expr("ha ^ hb")).cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val imageDhashPairsSql: String =
    s"""WITH sh AS (SELECT doc_id, dhash FROM read_parquet('${graft.util.oracleSidecarGlob("dhash_sigs")}')),
       | bands AS (SELECT doc_id, dhash, c, (dhash >> (c * 16)) & 65535 AS cv
       |  FROM sh, (SELECT unnest(range(0, 4)) AS c) chunks),
       | cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |   a.dhash AS ha, b.dhash AS hb
       |  FROM bands a JOIN bands b
       |   ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT a_id, b_id, cast(bit_count(xor(ha, hb)) as bigint) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 3
       |ORDER BY a_id, b_id""".stripMargin

  /** Scene-cut threshold on consecutive-frame mean-luma deltas, in
    * milli-luma units (8 luma levels). */
  val sceneCutMilli = 8000L

  /** Per-frame integer mean luma of every "video" payload — the codec
    * half of [[sceneCuts]], exposed for the sidecar and the spec. The
    * video container is a concatenation of P6 frames (one per 8-token
    * chunk of the source text); the walker repeatedly decodes the
    * frame at the cursor and advances by its exact encoded length — a
    * genuine container walk (header parse + pixel-plane skip), the
    * shape an MP4 demuxer has. Luma is all-integer: Rec.601 in
    * thousandths, (299·ΣR + 587·ΣG + 114·ΣB) div pixels. */
  private[graft] def videoFrameLumas(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val payload = text.split(" ").grouped(8)
          .flatMap(c => Ppm.encode(Ppm.synth(c.mkString(" ")))).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var off = 0
        var idx = 0L
        while (off < payload.length) {
          val img = Ppm.decode(
            java.util.Arrays.copyOfRange(payload, off, payload.length))
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i < img.pixels.length) {
            r += img.pixels(i) & 0xFF; g += img.pixels(i + 1) & 0xFF
            b += img.pixels(i + 2) & 0xFF
            i += 3
          }
          val lumaMilli =
            (299L * r + 587L * g + 114L * b) / (img.width * img.height)
          out += ((id, idx, lumaMilli))
          off += s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".length +
            img.pixels.length
          idx += 1
        }
        out
      })
      .toDF("doc_id", "frame_idx", "luma_milli")
  }

  /** Video scene segmentation: a cut wherever the mean-luma delta
    * between consecutive frames exceeds [[sceneCutMilli]] — the
    * classic histogram/intensity-difference detector, run as a lag
    * window over the decoded frame table (one shuffle on doc_id, then
    * partition-local). Only the per-frame lumas are codec output; the
    * detection itself is relational, published as a sidecar, and
    * DuckDB replays lag + threshold + rollup from it ⇒ hash-checked
    * end to end. At 100 TB frames decode partition-local (the demux
    * walk never shuffles pixel data) and the lag window moves only
    * (doc_id, frame_idx, luma) rows. */
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val f = videoFrameLumas(spark, dir)
    oracleSidecar("video_frame_lumas", f)
    f.withColumn("delta", col("luma_milli") - lag(col("luma_milli"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("frame_idx"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when(abs(col("delta")) > sceneCutMilli, 1L).otherwise(0L))
          .cast("long").as("n_cuts"),
        coalesce(min(when(abs(col("delta")) > sceneCutMilli, col("frame_idx"))),
          lit(-1L)).cast("long").as("first_cut"),
        expr("sum(luma_milli) div count(1)").cast("long").as("mean_luma_milli"))
      .orderBy(col("doc_id"))
  }

  val sceneCutsSql: String =
    s"""WITH d AS (
       | SELECT doc_id, frame_idx, luma_milli,
       |  luma_milli - lag(luma_milli) OVER (PARTITION BY doc_id
       |    ORDER BY frame_idx) AS delta
       | FROM read_parquet('${oracleSidecarGlob("video_frame_lumas")}'))
       |SELECT doc_id, cast(count(*) as bigint) AS n_frames,
       | cast(sum(CASE WHEN abs(delta) > $sceneCutMilli THEN 1 ELSE 0 END)
       |   as bigint) AS n_cuts,
       | cast(coalesce(min(CASE WHEN abs(delta) > $sceneCutMilli
       |   THEN frame_idx END), -1) as bigint) AS first_cut,
       | cast(sum(luma_milli) // count(*) as bigint) AS mean_luma_milli
       |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** VAD energy threshold in integer mean-|sample| units: silence
    * chunks (amplitude >> 8, mean ≈ 64) vs speech (mean ≈ 16384). */
  val vadEnergyFloor = 1000L

  /** Per-frame integer energies of every "audio" recording — the
    * codec half of [[audioSegments]]. A recording is synthesized per
    * 8-token chunk with deterministic speech/silence alternation
    * (silence = amplitude >> 8, decided by the chunk hash's low bit),
    * concatenated into ONE WAV, encoded, and decoded back through the
    * real RIFF codec before framing — so the energies come off the
    * same byte path a recorded file would. Energy is all-integer:
    * Σ|sample| div frame length over 160-sample (20 ms @ 8 kHz)
    * frames. */
  private[graft] def audioFrameEnergies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val samples = text.split(" ").grouped(8).flatMap { cArr =>
          val c = cArr.mkString(" ")
          val a = Wav.synth(c)
          if ((scala.util.hashing.MurmurHash3.stringHash(c) & 1) == 0)
            a.samples.map(s => (s >> 8).toShort)
          else a.samples
        }.toArray
        val audio = Wav.decode(Wav.encode(Wav.Audio(8000, samples)))
        audio.samples.grouped(160).zipWithIndex.map { case (fr, i) =>
          (id, i.toLong, fr.foldLeft(0L)((acc, s) => acc + math.abs(s.toInt)) / fr.length)
        }
      })
      .toDF("doc_id", "frame_idx", "energy")
  }

  /** Voice-activity segmentation — the audio twin of [[sceneCuts]]:
    * frames above [[vadEnergyFloor]] are speech, and maximal runs of
    * consecutive speech frames become segments via the islands
    * grouping constant (frame_idx − row_number over speech frames).
    * Only the frame-energy table is codec output (sidecar); the
    * thresholding and run-length rollup are relational and DuckDB
    * replays them ⇒ hash-checked end to end. The speech-data pipeline
    * shape: decode partition-local, segment bounds from a lag-free
    * window, per-recording segment stats out. */
  def audioSegments(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: both `speech` and `tot` reference the frame
    // table, and without the barrier the codec decode (the expensive
    // mapPartitions stage) executes twice — the r12 sim_mutual_nn
    // defect class, caught by the Round13Spec physical plan gate.
    // The checkpointed relation is 3 integers per frame.
    val f = audioFrameEnergies(spark, dir).localCheckpoint(true)
    oracleSidecar("audio_frame_energies", f)
    val speech = f.filter(col("energy") > vadEnergyFloor)
      .withColumn("grp", col("frame_idx") - row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("frame_idx"))))
    val segs = speech.groupBy(col("doc_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    val tot = f.groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    tot.join(
        segs.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_segments"), max(col("len")).as("longest"),
            sum(col("len")).as("speech_frames")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames").cast("long").as("n_frames"),
        coalesce(col("n_segments"), lit(0L)).cast("long").as("n_segments"),
        coalesce(col("longest"), lit(0L)).cast("long").as("longest"),
        coalesce(col("speech_frames"), lit(0L)).cast("long").as("speech_frames"))
      .orderBy(col("doc_id"))
  }

  val audioSegmentsSql: String =
    s"""WITH f AS (
       | SELECT doc_id, frame_idx, energy
       | FROM read_parquet('${oracleSidecarGlob("audio_frame_energies")}')),
       |speech AS (
       | SELECT doc_id, frame_idx,
       |  frame_idx - row_number() OVER (PARTITION BY doc_id
       |    ORDER BY frame_idx) AS grp
       | FROM f WHERE energy > $vadEnergyFloor),
       |segs AS (
       | SELECT doc_id, grp, count(*) AS len FROM speech GROUP BY 1, 2),
       |per_doc AS (
       | SELECT doc_id, count(*) AS n_segments, max(len) AS longest,
       |  sum(len) AS speech_frames
       | FROM segs GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_frames FROM f GROUP BY doc_id)
       |SELECT t.doc_id, cast(t.n_frames as bigint) AS n_frames,
       | cast(coalesce(p.n_segments, 0) as bigint) AS n_segments,
       | cast(coalesce(p.longest, 0) as bigint) AS longest,
       | cast(coalesce(p.speech_frames, 0) as bigint) AS speech_frames
       |FROM tot t LEFT JOIN per_doc p USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  /** PATCH TILING — the ViT/patch-embedding preprocessing shape: each
    * image decodes once (partition-local, the only codec stage) into a
    * 2×2 quadrant grid of tiles whose mean luma is computed in EXACT
    * integer milli-units (299R+587G+114B per pixel, floor-divided by
    * the tile's pixel count), and the per-image report is the tile
    * CONTRAST (max−min tile luma) — the flat-vs-structured signal a
    * vision-data pipeline filters on (a zero-contrast image carries no
    * patch information). The (doc_id, tile, luma) table is the codec
    * sidecar; thresholding and the contrast rollup replay relationally
    * in DuckDB ⇒ hash-checked end to end. Scale: decode is
    * partition-local mapPartitions over payload bytes; everything
    * after is an answer-bounded keyed aggregation (4 rows per image). */
  case class TileLuma(doc_id: Long, tile_row: Int, tile_col: Int, luma_milli: Long)

  private[graft] def imageTileLumas(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type != "audio") // PPM payloads: image + video
      .mapPartitions(_.flatMap { r =>
        val img = Ppm.decode(r.payload)
        val (w, h) = (img.width, img.height)
        for (tr <- 0 to 1; tc <- 0 to 1) yield {
          val (x0, x1) = (tc * w / 2, if (tc == 0) w / 2 else w)
          val (y0, y1) = (tr * h / 2, if (tr == 0) h / 2 else h)
          var sum = 0L; var n = 0L
          for (y <- y0 until y1; x <- x0 until x1) {
            val p = (y * w + x) * 3
            val rr = img.pixels(p) & 0xff
            val gg = img.pixels(p + 1) & 0xff
            val bb = img.pixels(p + 2) & 0xff
            sum += 299L * rr + 587L * gg + 114L * bb
            n += 1
          }
          TileLuma(r.doc_id, tr, tc, if (n == 0) 0L else sum / n)
        }
      }).toDF()
  }

  def imageTiles(spark: SparkSession, dir: String): DataFrame = {
    val tiles = imageTileLumas(spark, dir)
    oracleSidecar("image_tile_lumas", tiles)
    tiles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tiles"),
        min(col("luma_milli")).as("min_luma"),
        max(col("luma_milli")).as("max_luma"))
      .select(col("doc_id"), col("n_tiles"),
        col("min_luma"), col("max_luma"),
        (col("max_luma") - col("min_luma")).as("contrast_milli"),
        (col("max_luma") - col("min_luma") >= 10000L).cast("long").as("structured"))
      .orderBy(col("doc_id"))
  }

  val imageTilesSql: String =
    s"""WITH t AS (
       | SELECT doc_id, tile_row, tile_col, luma_milli
       | FROM read_parquet('${oracleSidecarGlob("image_tile_lumas")}'))
       |SELECT doc_id, cast(count(*) as bigint) AS n_tiles,
       | cast(min(luma_milli) as bigint) AS min_luma,
       | cast(max(luma_milli) as bigint) AS max_luma,
       | cast(max(luma_milli) - min(luma_milli) as bigint) AS contrast_milli,
       | cast(CASE WHEN max(luma_milli) - min(luma_milli) >= 10000
       |      THEN 1 ELSE 0 END as bigint) AS structured
       |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin

  case class PhashCell(doc_id: Long, gy: Int, gx: Int, luma_milli: Long)

  /** 8×8 mean-luma grid per visual payload — the pHash input plane
    * (one decode pass in mapPartitions, integer luma in milli-units,
    * same 299/587/114 weights as the tile decoder). */
  private[graft] def phashGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type != "audio")
      .mapPartitions(_.flatMap { r =>
        val img = Ppm.decode(r.payload)
        val (w, h) = (img.width, img.height)
        for (gy <- 0 until 8; gx <- 0 until 8) yield {
          val x0 = gx * w / 8; val x1 = math.max((gx + 1) * w / 8, x0 + 1)
          val y0 = gy * h / 8; val y1 = math.max((gy + 1) * h / 8, y0 + 1)
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val p = (y * w + x) * 3
              sum += 299L * (img.pixels(p) & 0xff) +
                587L * (img.pixels(p + 1) & 0xff) +
                114L * (img.pixels(p + 2) & 0xff)
              n += 1; x += 1
            }
            y += 1
          }
          PhashCell(r.doc_id, gy, gx, if (n == 0) 0L else sum / n)
        }
      }).toDF()
  }

  /** Fixed-point DCT-II basis, C(u, x) = round(10⁴·cos(π(2x+1)u/16))
    * — ONE table committed by construction (generated once in the JVM
    * and embedded verbatim in the oracle SQL, so both engines multiply
    * the identical integers; no runtime cos anywhere in a plan). */
  private[graft] val dctBasis: Seq[(Int, Int, Long)] =
    for (u <- 0 until 8; x <- 0 until 8)
      yield (u, x, math.round(10000.0 * math.cos(math.Pi * (2 * x + 1) * u / 16)))

  /** PERCEPTUAL HASH (pHash, the DCT variant — Zauner '10; the
    * classic ImageHash/pHash.org algorithm) — the frequency-domain
    * complement to [[imageDhashPairs]]' gradient dHash: dHash keys on
    * local gradients (robust to re-encode), pHash keys on the
    * image's low-frequency STRUCTURE (robust to blur/resize/small
    * crops). Per visual payload: 8×8 mean-luma grid → 2-D DCT-II via
    * the committed fixed-point basis — coef(u,v) = Σ L(gy,gx)·
    * C(u,gy)·C(v,gx), all int64 (≤ 64·255000·10⁴·10⁴ ≈ 1.6e15) — →
    * the 63 AC coefficients threshold at their LOWER MEDIAN (rank 32
    * under a (coef,u,v) total order) → one bit each, packed into an
    * int64 at position u·8+v−1 (the sign bit is never touched).
    *
    * Scale shape: decode is per-row CPU at scan; the DCT is a
    * broadcast join against the 64-row basis (4096 intermediate rows
    * per image, aggregated per (doc,u,v)); median and packing are
    * per-image windows — embarrassingly parallel end to end, index
    * output is (doc_id, one long). Hash-green: the grid (the only
    * codec-derived stage) is the sidecar; DuckDB replays the DCT from
    * the same basis literals, the median rank, and the bit packing. */
  def imagePhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = phashGrid(spark, dir)
    oracleSidecar("phash_grid", g)
    val cu = spark.createDataFrame(dctBasis).toDF("u", "gy", "cu")
    val cv = spark.createDataFrame(dctBasis).toDF("v", "gx", "cv")
    val coefs = g.join(broadcast(cu), Seq("gy")).join(broadcast(cv), Seq("gx"))
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(sum(col("luma_milli") * col("cu") * col("cv")).as("coef"))
      .filter(!(col("u") === 0 && col("v") === 0)) // drop DC
    val wMed = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("coef"), col("u"), col("v"))
    val med = coefs.withColumn("rk", row_number().over(wMed))
      .filter(col("rk") === 32)
      .select(col("doc_id"), col("coef").as("med"))
    coefs.join(med, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("coef") > col("med"),
          expr("shiftleft(1L, cast(u * 8 + v - 1 as int))"))
          .otherwise(0L)).as("phash"),
        sum(when(col("coef") > col("med"), 1L).otherwise(0L)).as("n_pos"))
      .orderBy(col("doc_id"))
  }

  lazy val imagePhashSql: String = {
    val basisRows = dctBasis.map { case (u, x, c) => s"($u, $x, $c)" }
      .mkString(", ")
    s"""WITH g AS (SELECT doc_id, gy, gx, luma_milli
       |  FROM read_parquet('${oracleSidecarGlob("phash_grid")}')),
       | basis(u, x, c) AS (VALUES $basisRows),
       | coefs AS (
       |  SELECT g.doc_id, cu.u, cv.u AS v,
       |   sum(g.luma_milli * cu.c * cv.c) AS coef
       |  FROM g JOIN basis cu ON cu.x = g.gy
       |         JOIN basis cv ON cv.x = g.gx
       |  GROUP BY 1, 2, 3
       |  HAVING NOT (cu.u = 0 AND cv.u = 0)),
       | med AS (
       |  SELECT doc_id, coef AS med FROM (
       |   SELECT doc_id, coef, row_number() OVER (PARTITION BY doc_id
       |     ORDER BY coef, u, v) AS rk FROM coefs)
       |  WHERE rk = 32)
       |SELECT c.doc_id,
       | cast(sum(CASE WHEN c.coef > m.med
       |   THEN (1::BIGINT << (c.u * 8 + c.v - 1)) ELSE 0 END) as bigint)
       |   AS phash,
       | cast(sum(CASE WHEN c.coef > m.med THEN 1 ELSE 0 END) as bigint)
       |   AS n_pos
       |FROM coefs c JOIN med m USING (doc_id)
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
  }

  /** CLIPPING DETECTION — the audio-QA gate beside VAD: a recording
    * whose samples ride the int16 rails was over-driven at capture
    * and is useless for acoustic training however good its
    * transcript. Per clip, from the real RIFF decode: samples at or
    * beyond ±30000, their share in basis points, and the LONGEST
    * consecutive clipped run (sustained saturation ⇒ hard clipping;
    * isolated rail hits can be legitimate peaks) — the run computed
    * in the same partition-local pass as the decode, O(1) state per
    * clip. The per-clip numbers are codec output → sidecar; the
    * flag thresholds (> 900 bp clipped OR a run ≥ 4 — set to split
    * this fixture's loud synthetic clips ~1:3; production audio
    * flags at far lower bp) and rollup replay relationally. */
  case class ClipStats(doc_id: Long, n_samples: Long, n_clipped: Long,
      max_run: Long)

  private[graft] def audioClipStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type == "audio")
      .mapPartitions(_.map { r =>
        val a = Wav.decode(r.payload)
        var clipped = 0L; var run = 0L; var maxRun = 0L
        for (s <- a.samples) {
          if (s >= 30000 || s <= -30000) {
            clipped += 1; run += 1; if (run > maxRun) maxRun = run
          } else run = 0
        }
        ClipStats(r.doc_id, a.samples.length.toLong, clipped, maxRun)
      }).toDF()
  }

  def audioClipping(spark: SparkSession, dir: String): DataFrame = {
    val stats = audioClipStats(spark, dir)
    oracleSidecar("audio_clip_stats", stats)
    stats
      .withColumn("clip_bp", expr("n_clipped * 10000 div n_samples"))
      .select(col("doc_id"), col("n_samples"), col("n_clipped"),
        col("max_run"), col("clip_bp"),
        (col("clip_bp") > 900 || col("max_run") >= 4).cast("long").as("flagged"))
      .orderBy(col("doc_id"))
  }

  val audioClippingSql: String =
    s"""WITH s AS (
       | SELECT doc_id, n_samples, n_clipped, max_run
       | FROM read_parquet('${oracleSidecarGlob("audio_clip_stats")}'))
       |SELECT doc_id, n_samples, n_clipped, max_run,
       | n_clipped * 10000 // n_samples AS clip_bp,
       | cast(CASE WHEN n_clipped * 10000 // n_samples > 900 OR max_run >= 4
       |      THEN 1 ELSE 0 END as bigint) AS flagged
       |FROM s ORDER BY doc_id""".stripMargin

  /** SILENCE TRIM — the sox/ffmpeg `silenceremove` shape every ASR
    * pipeline runs before training: per clip, the first and last
    * frame above the VAD energy floor bound the kept region; leading
    * and trailing silence outside it is dropped. Where
    * [[audioSegments]] needs the islands window (interior runs), trim
    * boundaries are just per-key CONDITIONAL MIN/MAX — one map-side-
    * partial aggregation, no window at all, answer-bounded at one row
    * per clip. Fully-silent clips keep 0 frames (boundaries −1). Only
    * the frame-energy table is codec output (sidecar); the
    * thresholding and boundary arithmetic replay relationally in
    * DuckDB ⇒ hash-checked end to end. */
  def silenceTrim(spark: SparkSession, dir: String): DataFrame = {
    val f = audioFrameEnergies(spark, dir)
    oracleSidecar("audio_frame_energies_trim", f)
    f.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("energy") > vadEnergyFloor, col("frame_idx"))).as("fv"),
        max(when(col("energy") > vadEnergyFloor, col("frame_idx"))).as("lv"))
      .select(col("doc_id"), col("n_frames"),
        coalesce(col("fv"), lit(-1L)).as("first_voiced"),
        coalesce(col("lv"), lit(-1L)).as("last_voiced"),
        coalesce(col("lv") - col("fv") + 1, lit(0L)).as("kept_frames"),
        expr("(n_frames - coalesce(lv - fv + 1, 0L)) * 10000 div n_frames")
          .as("trim_share_bp"))
      .orderBy(col("doc_id"))
  }

  val silenceTrimSql: String =
    s"""WITH f AS (
       | SELECT doc_id, frame_idx, energy
       | FROM read_parquet('${oracleSidecarGlob("audio_frame_energies_trim")}')),
       |b AS (
       | SELECT doc_id, cast(count(*) as bigint) AS n_frames,
       |  min(CASE WHEN energy > $vadEnergyFloor THEN frame_idx END) AS fv,
       |  max(CASE WHEN energy > $vadEnergyFloor THEN frame_idx END) AS lv
       | FROM f GROUP BY doc_id)
       |SELECT doc_id, n_frames,
       | cast(coalesce(fv, -1) as bigint) AS first_voiced,
       | cast(coalesce(lv, -1) as bigint) AS last_voiced,
       | cast(coalesce(lv - fv + 1, 0) as bigint) AS kept_frames,
       | cast((n_frames - coalesce(lv - fv + 1, 0)) * 10000
       |   // n_frames as bigint) AS trim_share_bp
       |FROM b ORDER BY doc_id""".stripMargin

  /** Voiced / unvoiced / silence frame classification by zero-crossing
    * rate + energy — the second classic short-time audio feature
    * beside [[audioSegments]]' energy VAD: voiced speech is periodic
    * (high energy, LOW crossing rate), fricatives are noise-like
    * (HIGH crossing rate), silence is low energy. The per-frame ZCR
    * (count of sign changes across the frame's samples — exact
    * integers off the real RIFF codec round-trip) and energy land in
    * an oracle sidecar, so the entire classification + per-doc rollup
    * replays relationally in DuckDB; the codec/feature extraction is
    * the only typed `mapPartitions` (binary decode — no Catalyst
    * expression applies), per-row-group work at scan speed. */
  private[graft] def audioFrameZcr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val samples = text.split(" ").grouped(8).flatMap { cArr =>
          val c = cArr.mkString(" ")
          val a = Wav.synth(c)
          if ((scala.util.hashing.MurmurHash3.stringHash(c) & 1) == 0)
            a.samples.map(s => (s >> 8).toShort)
          else a.samples
        }.toArray
        val audio = Wav.decode(Wav.encode(Wav.Audio(8000, samples)))
        audio.samples.grouped(160).zipWithIndex.map { case (fr, i) =>
          var zc = 0L
          var j = 1
          while (j < fr.length) {
            if ((fr(j) >= 0) != (fr(j - 1) >= 0)) zc += 1
            j += 1
          }
          (id, i.toLong, zc,
            fr.foldLeft(0L)((acc, s) => acc + math.abs(s.toInt)) / fr.length)
        }
      })
      .toDF("doc_id", "frame_idx", "zcr", "energy")
  }

  /** ZCR band separating periodic (voiced) from noise-like frames at
    * 8 kHz / 20 ms: > 40 crossings ≈ > 2 kHz dominant energy. */
  val zcrFricativeFloor = 40L

  def audioZcr(spark: SparkSession, dir: String): DataFrame = {
    val f = audioFrameZcr(spark, dir)
    oracleSidecar("audio_frame_zcr", f)
    f.withColumn("cls",
        when(col("energy") <= vadEnergyFloor, lit("silence"))
          .when(col("zcr") > zcrFricativeFloor, lit("unvoiced"))
          .otherwise(lit("voiced")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when(col("cls") === "voiced", 1L).otherwise(0L)).cast("long").as("n_voiced"),
        sum(when(col("cls") === "unvoiced", 1L).otherwise(0L)).cast("long").as("n_unvoiced"),
        sum(when(col("cls") === "silence", 1L).otherwise(0L)).cast("long").as("n_silence"),
        max(col("zcr")).cast("long").as("max_zcr"))
      .orderBy(col("doc_id"))
  }

  val audioZcrSql: String =
    s"""WITH f AS (
       | SELECT doc_id, frame_idx, zcr, energy,
       |  CASE WHEN energy <= $vadEnergyFloor THEN 'silence'
       |       WHEN zcr > $zcrFricativeFloor THEN 'unvoiced'
       |       ELSE 'voiced' END AS cls
       | FROM read_parquet('${oracleSidecarGlob("audio_frame_zcr")}'))
       |SELECT doc_id, cast(count(*) as bigint) AS n_frames,
       | cast(sum(CASE WHEN cls = 'voiced' THEN 1 ELSE 0 END) as bigint) AS n_voiced,
       | cast(sum(CASE WHEN cls = 'unvoiced' THEN 1 ELSE 0 END) as bigint) AS n_unvoiced,
       | cast(sum(CASE WHEN cls = 'silence' THEN 1 ELSE 0 END) as bigint) AS n_silence,
       | cast(max(zcr) as bigint) AS max_zcr
       |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  case class HistBin(doc_id: Long, bin: Int, pix: Long)

  /** Per-pixel 8-bin luma histogram, counted INSIDE the decode loop —
    * only the 8 (doc, bin, count) rows ever leave the partition (the
    * [[sceneCuts]] codec-output discipline: per-pixel rows would be
    * w·h× the payload). Bin = luma_milli·8 div 255001 ∈ [0, 7]. */
  private[graft] def imageHistBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type != "audio")
      .mapPartitions(_.flatMap { r =>
        val img = Ppm.decode(r.payload)
        val counts = new Array[Long](8)
        var p = 0
        while (p < img.width * img.height * 3) {
          val luma = 299L * (img.pixels(p) & 0xff) +
            587L * (img.pixels(p + 1) & 0xff) +
            114L * (img.pixels(p + 2) & 0xff)
          counts((luma * 8 / 255001L).toInt) += 1
          p += 3
        }
        (0 until 8).map(b => HistBin(r.doc_id, b, counts(b)))
      }).toDF()
  }

  /** EXPOSURE / TONAL-DISTRIBUTION AUDIT per image — the luma
    * histogram every ingest pipeline computes before training on
    * pixels (under/over-exposure gates, flat-image culls): per-pixel
    * Rec.601 luma from the REAL PPM decode binned 8-ways
    * partition-locally, then pure relational semantics — dominant
    * bin (packed-argmax under the (count, smaller-bin) total order),
    * basis-point shares of the darkest and brightest bins, and a
    * flatness flag (no bin above 25%). The binned counts are the
    * codec-output sidecar; DuckDB replays every derived column. */
  def imageHistogram(spark: SparkSession, dir: String): DataFrame = {
    val bins = imageHistBins(spark, dir)
    oracleSidecar("image_hist_bins", bins)
    bins.groupBy(col("doc_id"))
      .agg(sum(col("pix")).as("n_pixels"),
        max(col("pix") * 10 + (lit(7) - col("bin"))).as("dom_key"),
        sum(when(col("bin") === 0, col("pix")).otherwise(0L)).as("dark"),
        sum(when(col("bin") === 7, col("pix")).otherwise(0L)).as("bright"),
        max(col("pix")).as("max_pix"))
      .select(col("doc_id"), col("n_pixels"),
        (lit(7L) - pmod(col("dom_key"), lit(10L))).as("dominant_bin"),
        expr("(dom_key div 10) * 10000 div n_pixels")
          .as("dominant_share_bp"),
        expr("dark * 10000 div n_pixels").as("dark_share_bp"),
        expr("bright * 10000 div n_pixels").as("bright_share_bp"),
        (expr("max_pix * 10000 div n_pixels") < 2500L).cast("long")
          .as("flat"))
      .orderBy(col("doc_id"))
  }

  val imageHistogramSql: String =
    s"""WITH b AS (
       | SELECT doc_id, bin, pix
       | FROM read_parquet('${oracleSidecarGlob("image_hist_bins")}')),
       |agg AS (
       | SELECT doc_id, cast(sum(pix) as bigint) AS n_pixels,
       |  cast(max(pix * 10 + (7 - bin)) as bigint) AS dom_key,
       |  cast(sum(CASE WHEN bin = 0 THEN pix ELSE 0 END) as bigint) AS dark,
       |  cast(sum(CASE WHEN bin = 7 THEN pix ELSE 0 END) as bigint)
       |    AS bright,
       |  cast(max(pix) as bigint) AS max_pix
       | FROM b GROUP BY doc_id)
       |SELECT doc_id, n_pixels,
       | cast(7 - dom_key % 10 as bigint) AS dominant_bin,
       | cast((dom_key // 10) * 10000 // n_pixels as bigint)
       |   AS dominant_share_bp,
       | cast(dark * 10000 // n_pixels as bigint) AS dark_share_bp,
       | cast(bright * 10000 // n_pixels as bigint) AS bright_share_bp,
       | cast(CASE WHEN max_pix * 10000 // n_pixels < 2500
       |   THEN 1 ELSE 0 END as bigint) AS flat
       |FROM agg ORDER BY doc_id""".stripMargin

  case class BandFrame(doc_id: Long, frame_idx: Long,
      lo_energy: Long, hi_energy: Long)

  /** One-level HAAR band split per 160-sample frame — the first rung
    * of the filterbank ladder every audio featurizer climbs (the
    * QMF/wavelet decomposition in its simplest integer form): for
    * each sample pair, low = (s₂ᵢ+s₂ᵢ₊₁) div 2 (truncating toward
    * zero — Scala `/` on the JVM side only; the values never cross an
    * engine boundary), high = (s₂ᵢ−s₂ᵢ₊₁) div 2; per-frame mean
    * square of each band in integer units. Low-band energy tracks
    * the envelope, high-band energy the sample-to-sample roughness
    * (a zero-crossing-free noisiness proxy). Codec-output sidecar;
    * every derived column replays in DuckDB. */
  private[graft] def audioBandFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .filter(_.media_type == "audio")
      .mapPartitions(_.flatMap { r =>
        val a = Wav.decode(r.payload)
        a.samples.grouped(160).zipWithIndex.map { case (fr, i) =>
          var lo = 0L; var hi = 0L; var j = 0
          while (j + 1 < fr.length) {
            val l = (fr(j).toLong + fr(j + 1)) / 2
            val h = (fr(j).toLong - fr(j + 1)) / 2
            lo += l * l; hi += h * h
            j += 2
          }
          val nPairs = math.max(1L, fr.length / 2)
          BandFrame(r.doc_id, i.toLong, lo / nPairs, hi / nPairs)
        }
      }).toDF()
  }

  /** PER-CLIP BAND-ENERGY PROFILE over the Haar split: share of each
    * frame's energy in the high band (bp, committed truncating
    * division on non-negative operands), rough-frame share (high
    * band dominant), and the clip-level band ratio — the integer
    * skeleton of a spectral-balance audit. */
  def audioHaarBands(spark: SparkSession, dir: String): DataFrame = {
    val frames = audioBandFrames(spark, dir)
    oracleSidecar("audio_band_frames", frames)
    frames
      .withColumn("hi_share_bp", expr(
        "CASE WHEN lo_energy + hi_energy > 0 " +
          "THEN hi_energy * 10000 div (lo_energy + hi_energy) ELSE 0 END"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("lo_energy")).as("lo_total"),
        sum(col("hi_energy")).as("hi_total"),
        sum((col("hi_share_bp") > 5000L).cast("long")).as("rough_frames"),
        max(col("hi_share_bp")).as("max_hi_share_bp"))
      .withColumn("clip_hi_share_bp", expr(
        "CASE WHEN lo_total + hi_total > 0 " +
          "THEN hi_total * 10000 div (lo_total + hi_total) ELSE 0 END"))
      .withColumn("rough_share_bp", expr("rough_frames * 10000 div n_frames"))
      .select(col("doc_id"), col("n_frames"), col("lo_total"),
        col("hi_total"), col("clip_hi_share_bp"), col("rough_frames"),
        col("rough_share_bp"), col("max_hi_share_bp"))
      .orderBy(col("doc_id"))
  }

  val audioHaarBandsSql: String =
    s"""WITH f AS (
       | SELECT doc_id, frame_idx, lo_energy, hi_energy,
       |  CASE WHEN lo_energy + hi_energy > 0
       |   THEN hi_energy * 10000 // (lo_energy + hi_energy) ELSE 0 END
       |   AS hi_share_bp
       | FROM read_parquet('${oracleSidecarGlob("audio_band_frames")}'))
       |SELECT doc_id, cast(count(*) as bigint) AS n_frames,
       | cast(sum(lo_energy) as bigint) AS lo_total,
       | cast(sum(hi_energy) as bigint) AS hi_total,
       | cast(CASE WHEN sum(lo_energy) + sum(hi_energy) > 0
       |  THEN cast(sum(hi_energy) as hugeint) * 10000
       |       // (sum(lo_energy) + sum(hi_energy)) ELSE 0 END as bigint)
       |  AS clip_hi_share_bp,
       | cast(sum(CASE WHEN hi_share_bp > 5000 THEN 1 ELSE 0 END) as bigint)
       |  AS rough_frames,
       | cast(sum(CASE WHEN hi_share_bp > 5000 THEN 1 ELSE 0 END) * 10000
       |  // count(*) as bigint) AS rough_share_bp,
       | cast(max(hi_share_bp) as bigint) AS max_hi_share_bp
       |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[GQuery] = Seq(
    GQuery("mm_audio_haar_bands", audioHaarBands, Some(audioHaarBandsSql)),
    GQuery("mm_image_histogram", imageHistogram, Some(imageHistogramSql)),
    GQuery("mm_image_tiles", imageTiles, Some(imageTilesSql)),
    GQuery("mm_audio_clipping", audioClipping, Some(audioClippingSql)),
    GQuery("mm_silence_trim", silenceTrim, Some(silenceTrimSql)),
    GQuery("mm_audio_zcr", audioZcr, Some(audioZcrSql)),
    GQuery("mm_audio_segments", audioSegments, Some(audioSegmentsSql)),
    GQuery("mm_scene_cuts", sceneCuts, Some(sceneCutsSql)),
    GQuery("mm_image_dhash_pairs", imageDhashPairs, Some(imageDhashPairsSql)),
    GQuery("mm_image_phash", imagePhash, Some(imagePhashSql)),
    GQuery("mm_audio_frames", audioFrames, Some(audioFramesSql)),
    GQuery("mm_pack_struct", pack, Some(packSql)),
    GQuery("mm_shard_bybytes", shardByBytes, Some(shardByBytesSql)),
    GQuery("mm_decode_features", decodeFeatures, Some(decodeFeaturesSql)),
    GQuery("mm_frame_sample", frameSample, Some(frameSampleSql)),
  )
}
