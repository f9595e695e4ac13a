package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Q

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/video
  * as opaque BINARY payloads with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * The decode step is a DETERMINISTIC FAKE (clearly marked below): real
  * codecs aren't in this container. Everything around it — schema, typed
  * Dataset plumbing, per-partition batched processing, partition-count
  * preservation — is real and tested. Swapping in a real decoder means
  * replacing only the body of [[fakeDecode]].
  *
  * Scale notes: all three stages are `mapPartitions` (the sanctioned
  * last-resort for genuinely imperative per-row byte work, SURVEY.md §4) —
  * narrow transformations, no shuffle; a 100 TB media corpus streams
  * split-by-split. Feature extraction keeps a single 256-int histogram
  * buffer per partition batch, not per row.
  */
object Multimodal {

  /** One media row: payload + the typed metadata a real pipeline carries. */
  final case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])

  final case class DecodedMedia(
      media_id: Long,
      modality: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
  )

  final case class MediaFeatures(
      media_id: Long,
      entropy: Double,
      coll_impurity: Long,
      mean_byte: Double,
      nonzero_buckets: Int,
  )

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  final case class ResizedMedia(
      media_id: Long,
      out_w: Int,
      out_h: Int,
      resized_len: Int,
      resized_bytes: Array[Byte],
  )

  /** Synthesize a media table from `documents` (text bytes stand in for an
    * encoded payload; modality assigned round-robin for coverage).
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
      )
      .as[MediaRow]
  }

  /** FAKE DECODE — deterministic stand-in for an image/audio/video decoder.
    * Derives plausible dimensions from the payload alone so tests are
    * reproducible. A real implementation would parse the container format
    * here (and ONLY here).
    */
  def fakeDecode(row: MediaRow): DecodedMedia = {
    val len = row.payload.length
    DecodedMedia(
      media_id = row.media_id,
      modality = row.modality,
      byte_len = len,
      width = 16 * (1 + (len % 40)),
      height = 9 * (1 + (len % 40)),
      n_frames = if (row.modality == "video") 1 + len / 64 else 1,
    )
  }

  /** Decode stage: batched per-partition map (iterator-to-iterator — never
    * materializes a partition).
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(fakeDecode))
  }

  /** Feature extraction: byte histogram → entropy / collision impurity /
    * mean / occupancy. `coll_impurity` = n² − Σc² (c = per-byte-value
    * count) is the integer-exact surrogate for entropy: it is the
    * (unnormalized) collision probability complement — 0 iff one byte value
    * dominates entirely, maximal for a uniform histogram, and monotone in
    * collision (Rényi-2) entropy −log₂(Σp²). Shannon entropy's float log₂
    * is NOT bit-stable across engines, so the gate checks the impurity and
    * entropy stays an advisory column (spec-asserted against the impurity).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val hist = new Array[Long](256)
      var sum = 0L
      row.payload.foreach { b => val u = b & 0xff; hist(u) += 1; sum += u }
      val n = row.payload.length.toDouble
      var entropy = 0.0
      var sumSq = 0L
      var nonzero = 0
      hist.foreach { c =>
        if (c > 0) {
          nonzero += 1
          sumSq += c * c
          val p = c / n
          entropy -= p * math.log(p) / math.log(2)
        }
      }
      val len = row.payload.length.toLong
      MediaFeatures(row.media_id, entropy, len * len - sumSq,
        if (n == 0) 0.0 else sum / n, nonzero)
    })
  }

  /** Resize stage: integer pixel decimation to a target width — the fake
    * analog keeps every `stride`-th payload byte (stride = width/targetW),
    * so output geometry AND payload length are deterministic functions of
    * the input (a real implementation would decimate decoded pixel rows
    * here, same shape). Narrow mapPartitions, no shuffle; m03's oracle
    * recomputes the output geometry in SQL.
    */
  def resize(media: Dataset[MediaRow], targetW: Int = 64): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { row =>
      val dec = fakeDecode(row)
      val stride = math.max(1, dec.width / targetW)
      val out = Array.range(0, row.payload.length, stride).map(row.payload)
      ResizedMedia(row.media_id, dec.width / stride, dec.height / stride,
        out.length, out)
    })
  }

  /** Frame sampling: every `stride`-th fixed-size block of a "video"
    * payload becomes a frame row (the explode-shaped stage of a real
    * video pipeline).
    */
  def sampleFrames(media: Dataset[MediaRow], blockSize: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions(_.flatMap { row =>
      row.payload.grouped(blockSize).zipWithIndex.collect {
        case (block, idx) if idx % stride == 0 => Frame(row.media_id, idx, block)
      }
    })
  }

  /** m01 — payload metadata stats (oracle-backed: byte length + hex prefix
    * are engine-portable; decode/entropy are not SQL-expressible).
    */
  def m01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).toDF()
      .select(
        $"media_id",
        $"modality",
        length($"payload").as("byte_len"),
        // both engines slice BYTES (substring on binary), not characters —
        // a character slice would diverge on multi-byte UTF-8
        lower(hex(substring($"payload", 1, 8))).as("head_hex"),
      )
      .orderBy($"media_id")
  }

  val m01Oracle: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  octet_length(encode(text)) AS byte_len,
      |  lower(substring(hex(encode(text)), 1, 16)) AS head_hex
      |FROM documents ORDER BY media_id""".stripMargin

  /** m02 — decode + features + frame counts, joined back on media_id: the
    * full multimodal pipeline, every gated column deterministic and
    * recomputed by the DuckDB oracle (payloads are the documents' ASCII
    * bytes, so the byte histogram is expressible as SQL over characters).
    * The feature stage's entropy column is deliberately NOT in the gated
    * output — cross-engine float log₂ isn't bit-stable; its integer-exact
    * surrogate `coll_impurity` is gated instead and MultimodalSpec pins
    * entropy against the impurity (both zero together, rank-consistent).
    */
  def m02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir)
    val decoded = decode(media).toDF()
    val features = extractFeatures(media).toDF()
    val frameCounts = sampleFrames(media).groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled_frames"))
    decoded
      .join(features, Seq("media_id"))
      .join(frameCounts, Seq("media_id"), "left")
      .select($"media_id", $"modality", $"byte_len", $"width", $"height",
        $"n_frames", $"coll_impurity", $"mean_byte", $"nonzero_buckets",
        coalesce($"n_sampled_frames", lit(0L)).as("n_sampled_frames"))
      .orderBy($"media_id")
  }

  val m02Oracle: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  octet_length(encode(text)) AS byte_len,
      |  text FROM documents),
      |ch AS (SELECT media_id,
      |  unnest(list_transform(range(1, length(text) + 1),
      |    i -> substring(text, i, 1))) AS c FROM m),
      |cc AS (SELECT media_id, c, count(*) AS cnt FROM ch GROUP BY media_id, c),
      |hist AS (SELECT media_id,
      |  SUM(cnt * cnt) AS sum_sq,
      |  SUM(ascii(c) * cnt) AS byte_sum,
      |  count(*) AS nonzero_buckets
      |  FROM cc GROUP BY media_id)
      |SELECT m.media_id, modality, byte_len,
      |  16 * (1 + byte_len % 40) AS width,
      |  9 * (1 + byte_len % 40) AS height,
      |  CASE WHEN modality = 'video' THEN 1 + byte_len // 64 ELSE 1 END AS n_frames,
      |  CAST(CAST(byte_len AS BIGINT) * byte_len - COALESCE(sum_sq, 0) AS BIGINT) AS coll_impurity,
      |  CASE WHEN byte_len = 0 THEN 0.0
      |       ELSE CAST(byte_sum AS DOUBLE) / byte_len END AS mean_byte,
      |  COALESCE(nonzero_buckets, 0) AS nonzero_buckets,
      |  CASE WHEN modality = 'video'
      |       THEN CAST(ceil(ceil(byte_len / 64.0) / 4.0) AS BIGINT)
      |       ELSE 0 END AS n_sampled_frames
      |FROM m LEFT JOIN hist ON m.media_id = hist.media_id
      |ORDER BY m.media_id""".stripMargin

  /** m03 — the hash-checked core of m02: every deterministic column of the
    * decode → features → frame-sample pipeline recomputed by the DuckDB
    * oracle (payloads are the documents' ASCII bytes, so byte sums /
    * distinct-byte counts are expressible as SQL over characters). Only
    * entropy stays rows-only in m02 — cross-engine float log2 isn't
    * bit-stable. This pins the mapPartitions stages' arithmetic, not just
    * their row counts.
    */
  def m03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir)
    val decoded = decode(media).toDF()
    val features = extractFeatures(media).toDF()
      .select($"media_id", $"mean_byte", $"nonzero_buckets")
    val resized = resize(media).toDF()
      .select($"media_id", $"out_w", $"out_h", $"resized_len")
    val frameCounts = sampleFrames(media).groupBy("media_id")
      .agg(count(lit(1)).as("n_sampled_frames"))
    decoded
      .join(features, Seq("media_id"))
      .join(resized, Seq("media_id"))
      .join(frameCounts, Seq("media_id"), "left")
      .select($"media_id", $"modality", $"byte_len", $"width", $"height",
        $"n_frames",
        coalesce($"n_sampled_frames", lit(0L)).as("n_sampled_frames"),
        $"mean_byte", $"nonzero_buckets",
        $"out_w", $"out_h", $"resized_len")
      .orderBy($"media_id")
  }

  val m03Oracle: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image'
      |       WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS modality,
      |  octet_length(encode(text)) AS byte_len,
      |  text FROM documents),
      |g AS (SELECT *,
      |  16 * (1 + byte_len % 40) AS width,
      |  9 * (1 + byte_len % 40) AS height,
      |  greatest((16 * (1 + byte_len % 40)) // 64, 1) AS stride FROM m)
      |SELECT media_id, modality, byte_len, width, height,
      |  CASE WHEN modality = 'video' THEN 1 + byte_len // 64 ELSE 1 END AS n_frames,
      |  CASE WHEN modality = 'video'
      |       THEN CAST(ceil(ceil(byte_len / 64.0) / 4.0) AS BIGINT)
      |       ELSE 0 END AS n_sampled_frames,
      |  CASE WHEN byte_len = 0 THEN 0.0
      |       ELSE CAST(list_sum(list_transform(range(1, length(text) + 1),
      |              i -> ascii(substring(text, i, 1)))) AS DOUBLE) / byte_len
      |       END AS mean_byte,
      |  len(list_distinct(list_transform(range(1, length(text) + 1),
      |    i -> substring(text, i, 1)))) AS nonzero_buckets,
      |  width // stride AS out_w,
      |  height // stride AS out_h,
      |  (byte_len + stride - 1) // stride AS resized_len
      |FROM g ORDER BY media_id""".stripMargin

  /** m04 — cross-video duplicated-FRAME detection (t14's move at frame
    * granularity): sampled frames hash to 128-bit keys, a frame seen in
    * ≥2 distinct videos is boilerplate (shared intro/outro/test-pattern —
    * the signal video-corpus curation drops or downweights), and each
    * video reports its boilerplate fraction. Consumes [[sampleFrames]]'s
    * output, so the whole frame pipeline (block slicing, stride sampling)
    * sits inside the gate.
    *
    * Scale shape: the frame pass is narrow; only (media_id, 16-byte hash)
    * rows reach the two aggregations and the semi-join — raw frames never
    * cross an exchange. The DuckDB oracle re-slices every sampled frame
    * positionally from the payload text and re-derives the same hashes.
    */
  def m04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, dir)
    // one hash row per DISTINCT (video, frame content): a frame repeated
    // inside one video is not cross-video boilerplate
    val keyed = graft.util.Eager.cached(sampleFrames(media).toDF()
      .select($"media_id", md5($"frame_bytes").as("fh"))
      .distinct())
    val dupFrames = keyed.groupBy($"fh").agg(count(lit(1)).as("nm"))
      .filter($"nm" >= 2).select($"fh")
    val perVideo = keyed.groupBy($"media_id").agg(count(lit(1)).as("n_distinct_frames"))
    val dupPerVideo = keyed.join(dupFrames, Seq("fh"), "left_semi")
      .groupBy($"media_id").agg(count(lit(1)).as("n_dup_frames"))
    media.toDF().filter($"modality" === "video").select($"media_id")
      .join(perVideo, Seq("media_id"), "left")
      .join(dupPerVideo, Seq("media_id"), "left")
      .select($"media_id",
        coalesce($"n_distinct_frames", lit(0L)).as("n_distinct_frames"),
        coalesce($"n_dup_frames", lit(0L)).as("n_dup_frames"),
        (coalesce($"n_dup_frames", lit(0L)).cast("double") /
          when($"n_distinct_frames" =!= 0, $"n_distinct_frames")).as("boilerplate_ratio"))
      .orderBy($"media_id")
  }

  val m04Oracle: String =
    """WITH m AS (SELECT doc_id AS media_id, text, octet_length(encode(text)) AS byte_len
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (SELECT media_id, substring(text, CAST(j * 256 + 1 AS INT), 64) AS frame
      |  FROM (SELECT media_id, text,
      |          unnest(range(0, CAST(ceil(ceil(byte_len / 64.0) / 4.0) AS BIGINT))) AS j
      |        FROM m WHERE byte_len > 0)),
      |g AS (SELECT DISTINCT media_id, md5(frame) AS fh FROM fr),
      |pervid AS (SELECT media_id, COUNT(*) AS n_distinct_frames FROM g GROUP BY 1),
      |dup AS (SELECT fh FROM (SELECT fh, COUNT(*) AS nm FROM g GROUP BY 1) WHERE nm >= 2),
      |dupvid AS (SELECT media_id, COUNT(*) AS n_dup_frames FROM g JOIN dup USING (fh) GROUP BY 1)
      |SELECT m.media_id,
      |  COALESCE(n_distinct_frames, 0) AS n_distinct_frames,
      |  COALESCE(n_dup_frames, 0) AS n_dup_frames,
      |  CAST(COALESCE(n_dup_frames, 0) AS DOUBLE) / NULLIF(n_distinct_frames, 0)
      |    AS boilerplate_ratio
      |FROM m LEFT JOIN pervid USING (media_id) LEFT JOIN dupvid USING (media_id)
      |ORDER BY m.media_id""".stripMargin

  /** Hamming radius / chunk geometry for m05: 6 chunks × 10 bits over the
    * 60-bit signature — pigeonhole-lossless for radius ≤ 5 (cf. d08's
    * 4 × 16 over 64 bits at radius 3).
    */
  val PHashRadius = 5
  val PHashChunks = 6

  /** 60-bit perceptual signature of a full frame: bit i set iff byte i's
    * value is ≥ the frame's mean over the 60 signature bytes (the exact
    * integer compare 60·vᵢ ≥ Σv — no division, no float). This is the
    * block-threshold aHash recipe on the stub decode's byte plane; a real
    * decoder swaps in DCT coefficients with the IDENTICAL downstream
    * banding/verify pipeline. Top 4 bits stay clear, so the signed-shift
    * hazard at bit 63 never arises in either engine.
    */
  private[ops] def frameSig(block: Array[Byte]): Long = {
    var total = 0
    var i = 0
    while (i < 60) { total += block(i) & 0xFF; i += 1 }
    var sig = 0L
    i = 0
    while (i < 60) {
      if (60 * (block(i) & 0xFF) >= total) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** m05 — PERCEPTUAL frame near-dup across videos: m04 collapses
    * byte-identical frames; this catches the re-encoded / slightly-edited
    * boilerplate exact hashing misses (the pHash step of every video-dedup
    * pipeline). Signatures per distinct (video, sig), then the d08 recipe:
    * chunk banding for candidates (a pair within radius 5 differs in ≤ 5
    * of 6 chunks, so at least one chunk matches — lossless), exact
    * `bit_count(xor)` verify on survivors, per-video-pair counts.
    *
    * The oracle is the exact all-pairs hamming scan at the same radius, so
    * the hash match PROVES the banding dropped nothing — the same
    * guarantee-by-gate d08 establishes for SimHash text signatures,
    * re-established here on the multimodal plane. Scale shape: quadratic
    * work only inside shared chunk buckets; the verify is one integer
    * xor/popcount per candidate; nothing frame-cardinality is ever
    * driver-side.
    */
  def m05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sigs = graft.util.Eager.cached(
      sampleFrames(mediaTable(s, dir))
        .filter(_.frame_bytes.length == 64) // tail fragments carry no stable plane
        .map(f => (f.media_id, frameSig(f.frame_bytes)))
        .toDF("media_id", "sig")
        .distinct())
    val chunked = sigs.select($"media_id", $"sig",
      posexplode(array((0 until PHashChunks).map(c =>
        shiftright($"sig", 10 * c).bitwiseAND(lit(1023L))): _*)).as(Seq("chunk", "key")))
    val cands = chunked.alias("x")
      .join(chunked.alias("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("media_a"), col("x.sig").as("sa"),
        col("y.media_id").as("media_b"), col("y.sig").as("sb"))
      .distinct()
    cands
      .filter(bit_count($"sa".bitwiseXOR($"sb")) <= PHashRadius)
      .groupBy($"media_a", $"media_b")
      .agg(count(lit(1)).as("n_near_frames"))
      .orderBy($"media_a", $"media_b")
  }

  /** Exact all-pairs hamming scan at the same radius — the banding-
    * losslessness oracle (d08 posture).
    */
  val m05Oracle: String =
    s"""WITH m AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
       |fr AS (SELECT media_id, j, substring(text, CAST(j * 256 + 1 AS INT), 64) AS frame
       |  FROM (SELECT media_id, text,
       |          unnest(range(0, CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT))) AS j
       |        FROM m WHERE octet_length(encode(text)) > 0)),
       |f64 AS (SELECT media_id, j, frame FROM fr WHERE length(frame) = 64),
       |by AS (SELECT media_id, j, i - 1 AS bit,
       |         ascii(substring(frame, CAST(i AS INT), 1)) AS v
       |       FROM f64, (SELECT unnest(range(1, 61)) AS i)),
       |tt AS (SELECT media_id, j, SUM(v) AS total FROM by GROUP BY 1, 2),
       |sig AS (SELECT DISTINCT media_id,
       |          CAST(SUM(CASE WHEN 60 * v >= total
       |                        THEN CAST(1 AS BIGINT) << CAST(bit AS INT)
       |                        ELSE 0 END) AS BIGINT) AS sig
       |        FROM by JOIN tt USING (media_id, j) GROUP BY media_id, j)
       |SELECT a.media_id AS media_a, b.media_id AS media_b,
       |  COUNT(*) AS n_near_frames
       |FROM sig a JOIN sig b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.sig, b.sig)) <= $PHashRadius
       |GROUP BY 1, 2 ORDER BY media_a, media_b""".stripMargin

  /** m06 — CROSS-MODAL ALIGNMENT AUDIT (the CLIP-score filtering shape,
    * LAION-style): a paired image-text corpus is only as good as its
    * pairing, so production pipelines score every (caption, image) pair
    * with a cross-modal similarity and drop pairs whose true partner does
    * not beat a mismatched control. Here the paired corpus comes from the
    * deterministic planted near-duplicates [[Similarity.plantNearDups]]
    * already gated by d05/d07 (caption k ↔ its planted variant
    * k + PlantOffset ≈ the aligned pair at cos ≈ 0.99); each caption is
    * also scored against the NEXT caption's image (cyclic shift) — the
    * standard shuffled-negative control — and the audit reports whether
    * the true image wins. A real CLIP encoder slots in exactly where
    * plantNearDups provides vectors; everything downstream (the pairing
    * joins, the margin audit) is the production plan.
    *
    * Scale shape: captions are |corpus|/10; the decoy assignment is ONE
    * lead() window over the caption ids (global ordering of an already
    * 10×-reduced relation — at true scale this becomes a per-shard cyclic
    * shift, same semantics); scoring is three hash joins on pair keys +
    * the codegen'd cosine. Nothing quadratic anywhere.
    *
    * Oracle: the d05-form exact SQL (ordered sums mirror the expression's
    * sequential fold) over the same planted relation, with the same
    * lead-with-wraparound decoy assignment.
    */
  def m06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    val aug = graft.util.Eager.cached(
      Similarity.plantNearDups(Tables.embeddings(s, dir)))
    val capIds = aug
      .filter($"vec_id" < Similarity.PlantOffset && $"vec_id" % 10 === 0)
      .select($"vec_id".as("cap_id"))
    val ord = org.apache.spark.sql.expressions.Window.orderBy($"cap_id")
    val whole = org.apache.spark.sql.expressions.Window
      .orderBy($"cap_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pairs = capIds
      .withColumn("decoy_cap",
        coalesce(lead($"cap_id", 1).over(ord), min($"cap_id").over(whole)))
    pairs
      .join(aug.select($"vec_id".as("cap_id"), $"embedding".as("ec")), Seq("cap_id"))
      .join(aug.select(($"vec_id" - Similarity.PlantOffset).as("cap_id"),
        $"embedding".as("et")).filter($"cap_id" >= 0), Seq("cap_id"))
      .join(aug.select(($"vec_id" - Similarity.PlantOffset).as("decoy_cap"),
        $"embedding".as("ed")).filter($"decoy_cap" >= 0), Seq("decoy_cap"))
      .select($"cap_id",
        Similarity.cosine($"ec", $"et").as("true_cos"),
        Similarity.cosine($"ec", $"ed").as("decoy_cos"))
      .withColumn("aligned", $"true_cos" > $"decoy_cos")
      .orderBy($"cap_id")
  }

  val m06Oracle: String =
    """WITH base AS (SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding,1) AS i
      |              FROM embeddings),
      |v AS (SELECT vec_id, e, i FROM base
      |      UNION ALL
      |      SELECT vec_id + 100000 AS vec_id,
      |             CASE WHEN i = 1 THEN CAST(0 AS FLOAT) ELSE e END AS e, i
      |      FROM base WHERE vec_id % 10 = 0),
      |caps AS (SELECT DISTINCT vec_id AS cap_id FROM v
      |         WHERE vec_id < 100000 AND vec_id % 10 = 0),
      |p AS (SELECT cap_id,
      |        COALESCE(LEAD(cap_id) OVER (ORDER BY cap_id),
      |                 MIN(cap_id) OVER ()) AS decoy_cap
      |      FROM caps),
      |norms AS (SELECT vec_id, SUM(CAST(e AS DOUBLE)*CAST(e AS DOUBLE) ORDER BY i) AS n2
      |          FROM v GROUP BY vec_id),
      |td AS (SELECT p.cap_id,
      |         SUM(CAST(x.e AS DOUBLE) * CAST(y.e AS DOUBLE) ORDER BY x.i) AS dot
      |       FROM p JOIN v x ON x.vec_id = p.cap_id
      |              JOIN v y ON y.vec_id = p.cap_id + 100000 AND y.i = x.i
      |       GROUP BY 1),
      |dd AS (SELECT p.cap_id,
      |         SUM(CAST(x.e AS DOUBLE) * CAST(y.e AS DOUBLE) ORDER BY x.i) AS dot
      |       FROM p JOIN v x ON x.vec_id = p.cap_id
      |              JOIN v y ON y.vec_id = p.decoy_cap + 100000 AND y.i = x.i
      |       GROUP BY 1),
      |cos AS (SELECT p.cap_id,
      |          td.dot / (sqrt(nc.n2) * sqrt(nt.n2)) AS true_cos,
      |          dd.dot / (sqrt(nc.n2) * sqrt(nd.n2)) AS decoy_cos
      |        FROM p
      |          JOIN td ON td.cap_id = p.cap_id
      |          JOIN dd ON dd.cap_id = p.cap_id
      |          JOIN norms nc ON nc.vec_id = p.cap_id
      |          JOIN norms nt ON nt.vec_id = p.cap_id + 100000
      |          JOIN norms nd ON nd.vec_id = p.decoy_cap + 100000)
      |SELECT cap_id, true_cos, decoy_cos, true_cos > decoy_cos AS aligned
      |FROM cos ORDER BY cap_id""".stripMargin

  def all: Seq[Q] = Seq(
    Q("m01_multimodal_meta", m01, Some(m01Oracle)),
    Q("m02_multimodal_pipeline", m02, Some(m02Oracle)),
    Q("m03_decode_meta_parity", m03, Some(m03Oracle)),
    Q("m04_frame_dedup", m04, Some(m04Oracle)),
    Q("m05_frame_neardup_phash", m05, Some(m05Oracle)),
    Q("m06_crossmodal_alignment", m06, Some(m06Oracle)),
  )
}
