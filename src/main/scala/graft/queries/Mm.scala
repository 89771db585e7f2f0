package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.Det
import graft.multimodal.{ImageCodec, Media, VideoCodec}
import graft.text.UrlOps

/** Multimodal oracle queries — the codec → perceptual-hash → blocked pair
  * join chain under the same cross-engine gate as text dedup.
  *
  * DuckDB cannot decode a PNG, so the fixture is constructed to make the
  * hash PREDICTABLE: each document row becomes a synthetic 8×8 black/white
  * PNG whose pixel grid IS a 62-bit seed derived from `doc_id` by keyed-LCG
  * arithmetic both engines share ([[graft.functions.Det]]). For an 8×8
  * image, [[ImageCodec.aHash]]'s 8×8 mean-luminance grid is the pixel grid
  * itself and the mean sits strictly between black and white cells (the
  * seed is capped at 62 bits so the image is never all-white), hence
  * `aHash(png(seed)) == seed` EXACTLY — the Spark side must round-trip
  * real bytes through the real codec to reproduce what the oracle computes
  * arithmetically. Groups of 5 consecutive doc_ids share a base pattern
  * with ≤ 1 flipped bit per member (pairwise hamming ≤ 2), giving a dense
  * near-dup pair set; cross-group hamming is ~32.
  *
  * The pair join is [[Media.imageNearDupPairs]] — the d9 8-chunk blocked
  * self-join (pigeonhole recall to hamming 7, hot-chunk guarded), never a
  * cross product; the oracle may use the naive quadratic form because
  * blocking is exact at hamming ≤ 6.
  *
  * The AUDIO twin (`m2`) plays the same trick through the other real JDK
  * codec: each doc becomes a 16-bit PCM WAV whose 64-slice energy envelope
  * encodes an independent seed (different LCG key), and
  * [[graft.multimodal.AudioCodec.aHash]]'s band-RMS mean threshold
  * reproduces it exactly — see [[wavOf]] for the dyadic-exactness argument.
  */
object Mm {

  private val GroupSize = 5
  /** Flip-bit position per group member (0 = unflipped base). */
  private val FlipBit = Map(1 -> 13, 2 -> 26, 3 -> 39, 4 -> 52)
  private val MaxDist = 6
  /** Distinct LCG keys so the image, audio and video fixtures draw
    * independent seed patterns from the same doc_ids. */
  private val ImageKey = 7L
  private val AudioKey = 11L
  private val VideoKey = 13L
  /** Frames per synthetic MJPEG-AVI; the video signature XORs all of them,
    * so the oracle (and recall) depend on every frame being parsed. */
  private val VideoNFrames = 4
  private val VideoFps = 4

  /** Deterministic 62-bit seed column from an id column: 8 LCG-derived
    * bytes (top byte capped to 6 bits — no BIGINT overflow on the shift,
    * and the image can never be all-white), one flipped bit per group
    * member. The m4/m5 pair fixture reuses it keyed on the REPOST id. */
  private def seedColOf(id: Column, key: Long) = {
    val g = floor(id / GroupSize).cast("long")
    val bytes = (0 until 8).map { j =>
      val b = floor(Det.frac(g * 8 + j, key) * 256).cast("long")
      shiftleft(if (j == 7) b % 64 else b, 8 * j)
    }
    val base = bytes.reduce(_ + _) // disjoint bit lanes: + is OR
    val m = (id % GroupSize).cast("int")
    val flip = FlipBit.foldLeft(lit(0L)) { case (acc, (mm, bit)) =>
      when(m === mm, lit(1L << bit)).otherwise(acc)
    }
    base.bitwiseXOR(flip)
  }
  private def seedCol(key: Long) = seedColOf(col("doc_id"), key)

  /** doc_id → seeded synthetic media bytes via `enc`, the codec batch
    * shape shared by the PNG and WAV fixtures. */
  private def mediaFrame(s: SparkSession, dir: String, key: Long)
                        (enc: Long => Array[Byte]): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", seedCol(key).as("seed"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, seed) => (id, enc(seed)) }
      }.toDF("media_id", "content")
  }

  /** Real 8×8 PNG whose pixel grid encodes `seed` (bit i = pixel
    * (i%8, i/8), white = set) — `ImageCodec.aHash` of it equals `seed`. */
  private[graft] def pngOf(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < 64) {
      img.setRGB(i % 8, i / 8,
        if (((seed >> i) & 1L) == 1L) 0xFFFFFF else 0x000000)
      i += 1
    }
    ImageCodec.encodePng(img)
  }

  /** Real 16-bit PCM mono WAV whose band-energy envelope encodes `seed`:
    * 64 time slices × 32 samples, slice i at constant amplitude 16384/32768
    * (= 0.5, bit set) or 4096/32768 (= 0.125, clear). Every value in the
    * RMS chain is an exact power-of-two dyadic (counts are powers of two),
    * so [[AudioCodec.embedding]] yields exactly 0.0 / −0.75 per band and
    * [[AudioCodec.aHash]]'s mean threshold separates them exactly:
    * `aHash(wav(seed)) == seed`, the audio twin of the PNG round-trip. */
  private[graft] def wavOf(seed: Long): Array[Byte] = {
    val perSlice = 32
    val n = 64 * perSlice
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v: Int = if (((seed >> (i / perSlice)) & 1L) == 1L) 16384 else 4096
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // canonical 44-byte RIFF/WAVE header: PCM, mono, 8 kHz, 16-bit LE
    val out = new java.io.ByteArrayOutputStream(44 + data.length)
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + data.length)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16); le16(1); le16(1)
    le32(8000); le32(16000); le16(2); le16(16)
    out.write("data".getBytes("US-ASCII")); le32(data.length); out.write(data)
    out.toByteArray
  }

  // ---- m4/m5 cross-modal pair fixture ------------------------------------
  /** Image seeds keyed on the REPOST id (doc_id with its low bit cleared):
    * consecutive doc pairs (2k, 2k+1) carry byte-identical PNGs, giving
    * the (url, image) pair-dedup geometry m5 curates. Distinct LCG key so
    * the pair corpus is independent of m1's. */
  private val PairImageKey = 17L
  /** Caption-noise LCG key: per doc, `doc_id % 8` bit flips at LCG-drawn
    * positions < 62 turn the declared caption hash away from the image —
    * alignment quality varies smoothly across docs (XOR composition makes
    * position collisions harmless and identical in both engines). */
  private val CapNoiseKey = 19L
  /** Alignment funnel threshold (bits of hash disagreement tolerated). */
  private val AlignMaxDist = 3
  /** Per-domain keep cap of the m5 curation funnel (binds at every SF:
    * ~36 aligned docs/domain at sf0.001, ~357 at sf0.1 pre-dedup). */
  private val PairDomainCap = 12
  /** m6 retrieval depth (nearest images per caption within MaxDist). */
  private val RetrK = 3

  private def repostId = col("doc_id") - (col("doc_id") % 2)

  /** doc_id → repost-seeded PNG bytes (the m1 codec batch shape). */
  private def pairMediaFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", seedColOf(repostId, PairImageKey).as("seed"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, seed) => (id, pngOf(seed)) }
      }.toDF("media_id", "content")
  }

  /** The shared m4/m5 alignment frame: (doc_id, ahash, cap_hash, hamming,
    * score_ppm, aligned). The image leg round-trips REAL bytes through the
    * REAL codec (PNG encode → ImageIO decode → aHash — the m1 bar); the
    * caption leg synthesizes a caption STRING carrying the declared hash
    * and parses it back (the string round-trip is Spark-side realism; the
    * oracle computes the hash arithmetically, as in m1). Alignment =
    * 64 − hamming(ahash, caption hash), reported in exact ppm. */
  /** The caption leg alone: (doc_id, cap_hash) — the caption STRING is
    * synthesized carrying the declared hash and parsed back (Spark-side
    * realism; the hash itself is LCG arithmetic both engines share).
    * Feeds [[clipAlignFrame]] (m4/m5) and the m6 retrieval queries. */
  private def capHashFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "documents").select(
      ($"doc_id" +:
        seedColOf(repostId, PairImageKey).as("cseed") +:
        ($"doc_id" % 8).cast("int").as("nb") +:
        (0 until 8).map { i =>
          floor(Det.frac($"doc_id" * 8L + i, CapNoiseKey) * 62.0)
            .cast("int").as(s"p$i")
        }): _*)
    val maskSql = (0 until 8).map { i =>
      s"(CASE WHEN $i < nb THEN shiftleft(CAST(1 AS BIGINT), p$i) " +
        "ELSE CAST(0 AS BIGINT) END)"
    }.reduce((a, b) => s"($a ^ $b)")
    val caps = base.selectExpr("doc_id",
      s"concat('photo of item ', CAST((cseed ^ $maskSql) AS STRING)) " +
        "AS caption")
    caps.select($"doc_id",
      substring_index($"caption", " ", -1).cast("long").as("cap_hash"))
  }

  private def clipAlignFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = Media.imageHashes(pairMediaFrame(s, dir))
    val parsed = capHashFrame(s, dir)
    hashes.join(parsed, $"media_id" === $"doc_id")
      .select($"doc_id", $"ahash", $"cap_hash")
      .withColumn("hamming",
        expr("CAST(bit_count(ahash ^ cap_hash) AS INT)"))
      .withColumn("score_ppm",
        expr("CAST(((64 - hamming) * 1000000) div 64 AS BIGINT)"))
      .withColumn("aligned", $"hamming" <= AlignMaxDist)
  }

  /** m5's raw pair-URL synthesis (the t22 technique, utm-only params so
    * every repost pair canonicalizes to ONE url): scheme/www/host case and
    * tracking junk vary per doc; host and path derive from doc_id div 2,
    * so a repost pair shares its canonical URL AND its image bytes. */
  private def pairUrlCol: Column = {
    val half = expr("doc_id div 2")
    val site = concat(lit("site"), (half % 7).cast("string"))
    concat(
      when(col("doc_id") % 2 === 0, "https://").otherwise("HTTP://"),
      when(col("doc_id") % 3 === 0, "www.")
        .when(col("doc_id") % 3 === 1, "WWW.").otherwise(""),
      when(col("doc_id") % 2 === 0, upper(site)).otherwise(site),
      lit(".Example.COM"),
      concat(lit("/item/"), half.cast("string"),
        when(col("doc_id") % 5 === 0, "/").otherwise("")),
      when(col("doc_id") % 4 === 0, "?utm_source=pair")
        .when(col("doc_id") % 4 === 1, "")
        .when(col("doc_id") % 4 === 2, "?utm_medium=m")
        .otherwise("?utm_campaign=x"))
  }

  /** Per-frame seed column for the VIDEO fixture: frame `f` of group `g`
    * draws its 8 bytes at LCG indices `g*32 + f*8 + j` (disjoint from the
    * image/audio streams by key). The member flip lands on frame 0 only, so
    * the XOR-of-frames video signature differs within a group by exactly
    * the one flipped bit — same pair geometry as m1/m2. */
  private def videoSeedCol(f: Int) = {
    val g = floor(col("doc_id") / GroupSize).cast("long")
    val bytes = (0 until 8).map { j =>
      val b = floor(Det.frac(g * 32 + (f * 8 + j), VideoKey) * 256).cast("long")
      shiftleft(if (j == 7) b % 64 else b, 8 * j)
    }
    val base = bytes.reduce(_ + _)
    if (f > 0) base
    else {
      val m = (col("doc_id") % GroupSize).cast("int")
      val flip = FlipBit.foldLeft(lit(0L)) { case (acc, (mm, bit)) =>
        when(m === mm, lit(1L << bit)).otherwise(acc)
      }
      base.bitwiseXOR(flip)
    }
  }

  /** doc_id → seeded synthetic MJPEG-AVI bytes ([[aviOf]] over the per-frame
    * seeds), the video twin of [[mediaFrame]]. */
  private def videoMediaFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id",
        array((0 until VideoNFrames).map(videoSeedCol): _*).as("seeds"))
      .as[(Long, Seq[Long])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, seeds) => (id, aviOf(seeds)) }
      }.toDF("media_id", "content")
  }

  /** 64×64 frame whose 8×8-pixel cells encode `seed` (cell i = bit i, white
    * = set). Cells align exactly with JPEG's 8×8 DCT blocks, so every block
    * is uniform (DC-only) and survives the LOSSY encode within a few counts
    * of 0/255 — [[ImageCodec.aHash]]'s 8×8 grid over the decoded frame is
    * the cell grid and its mean threshold still separates the two classes
    * exactly: `aHash(jpegRoundTrip(frameOf(seed))) == seed`. */
  private[graft] def frameOf(seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val gfx = img.createGraphics()
    var c = 0
    while (c < 64) {
      gfx.setColor(if (((seed >> c) & 1L) == 1L) java.awt.Color.WHITE
        else java.awt.Color.BLACK)
      gfx.fillRect((c % 8) * 8, (c / 8) * 8, 8, 8)
      c += 1
    }
    gfx.dispose()
    img
  }

  /** Real MJPEG-AVI (RIFF container, one JPEG per frame) over the per-frame
    * seed grids — [[VideoCodec.parse]]'s writer dual produces it, so the
    * query decodes actual container + codec bytes. */
  private[graft] def aviOf(seeds: Seq[Long]): Array[Byte] =
    VideoCodec.encodeAvi(seeds.map(frameOf), VideoFps)

  /** Host-side twin of [[seedCol]] (specs verify the query against it). */
  private[graft] def seedHost(docId: Long, key: Long = ImageKey): Long = {
    val g = docId / GroupSize
    val raw = (0 until 8).map { j =>
      val b = math.floor(Det.fracHost(g * 8 + j, key) * 256).toLong
      (if (j == 7) b % 64 else b) << (8 * j)
    }.sum
    raw ^ FlipBit.get((docId % GroupSize).toInt).map(1L << _).getOrElse(0L)
  }
  private[graft] def audioSeedHost(docId: Long): Long = seedHost(docId, AudioKey)

  /** Host-side twin of [[videoSeedCol]]. */
  private[graft] def videoSeedHost(docId: Long, f: Int): Long = {
    val g = docId / GroupSize
    val raw = (0 until 8).map { j =>
      val b = math.floor(
        Det.fracHost(g * 32 + (f * 8 + j), VideoKey) * 256).toLong
      (if (j == 7) b % 64 else b) << (8 * j)
    }.sum
    if (f > 0) raw
    else raw ^ FlipBit.get((docId % GroupSize).toInt).map(1L << _).getOrElse(0L)
  }
  /** XOR-of-frame-hashes video signature the query must reproduce. */
  private[graft] def videoSigHost(docId: Long): Long =
    (0 until VideoNFrames).map(videoSeedHost(docId, _)).reduce(_ ^ _)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- image near-dup: PNG encode → ImageIO decode → aHash → 8-chunk
    // blocked hamming self-join (the full multimodal dedup chain) ---------
    "m1_image_neardup" -> ((s, dir) => {
      val hashes = Media.imageHashes(mediaFrame(s, dir, ImageKey)(pngOf))
        .localCheckpoint()
      Media.imageNearDupPairs(hashes, MaxDist)
        .orderBy(col("a_id"), col("b_id"))
    }),
    // ---- audio near-dup: WAV encode → javax.sound decode → band-RMS
    // aHash → the same blocked hamming self-join -------------------------
    "m2_audio_neardup" -> ((s, dir) => {
      val hashes = Media.audioHashes(mediaFrame(s, dir, AudioKey)(wavOf))
        .localCheckpoint()
      Media.audioNearDupPairs(hashes, MaxDist)
        .orderBy(col("a_id"), col("b_id"))
    }),
    // ---- video near-dup: MJPEG-AVI encode → RIFF parse + per-frame JPEG
    // decode → per-frame aHash → XOR-of-frames signature → the same
    // blocked hamming self-join (the full video dedup chain: container,
    // LOSSY codec, frame sampling, frame→video aggregation) --------------
    "m3_video_neardup" -> ((s, dir) => {
      val frames = Media.videoFrames(videoMediaFrame(s, dir), VideoFps.toDouble)
      val frameHashes = Media.imageHashes(
        frames.select(col("media_id"), col("frame_content").as("content")))
      val sigs = frameHashes.groupBy("media_id")
        .agg(expr("bit_xor(ahash)").as("ahash"))
        .localCheckpoint()
      Media.imageNearDupPairs(sigs, MaxDist)
        .orderBy(col("a_id"), col("b_id"))
    }),

    // ---- m4: image–text pair alignment scoring (LAION/DataComp-style) ----
    // The first cross-modal curation surface: every (caption, image) pair
    // gets a deterministic alignment score — here the bit-agreement
    // between the REAL decoded perceptual hash (PNG → ImageIO → aHash,
    // the m1 bar) and the hash the caption DECLARES (parsed back out of a
    // synthesized caption string) — the fixture's stand-in for a CLIP
    // score, exact in both engines. 100 TB shape: two map-only legs
    // (codec batch + string parse) and one doc_id equi-join; no shuffle
    // beyond the join, no pair blowup.
    "m4_clip_align" -> ((s, dir) => {
      clipAlignFrame(s, dir)
        .select(col("doc_id"), col("ahash"), col("cap_hash"),
          col("hamming"), col("score_ppm"), col("aligned"))
        .orderBy(col("doc_id"))
    }),

    // ---- m5: cross-modal pair curation funnel ----------------------------
    // The DataComp recipe over m4's scored pairs: (1) alignment threshold
    // (hamming ≤ AlignMaxDist); (2) pair-level EXACT dedup on
    // (canonical url, image hash) keeping the min doc_id — reposts of
    // the same image at the same page collapse (the fixture builds them:
    // repost pairs share bytes AND canonical URL through the tracking
    // junk); (3) per-domain cap in quality order (score desc, doc_id) —
    // composition control so no site dominates the curated pair set.
    // 100 TB shape: the m4 legs + two WindowGroupLimit top-k passes on
    // hash-shuffled keys (canon_url+ahash, then domain) — no corpus
    // sort, no driver state (the t22 shape with the image leg joined in).
    "m5_pair_curation" -> ((s, dir) => {
      import s.implicits._
      val scored = clipAlignFrame(s, dir).filter($"aligned")
      val urls = t(s, dir, "documents")
        .select($"doc_id", pairUrlCol.as("url"))
        .select($"doc_id",
          UrlOps.canonicalize($"url").as("canon_url"),
          UrlOps.canonicalHost($"url").as("domain"))
      val dedup = scored.join(urls, Seq("doc_id"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy($"canon_url", $"ahash").orderBy($"doc_id")))
        .filter($"__rn" === 1).drop("__rn")
      dedup
        .withColumn("__rk", row_number().over(
          Window.partitionBy($"domain")
            .orderBy($"score_ppm".desc, $"doc_id")))
        .filter($"__rk" <= PairDomainCap)
        .select($"domain", $"doc_id", $"canon_url", $"ahash", $"score_ppm")
        .orderBy($"domain", $"doc_id")
    }),

    // ---- m6: cross-modal retrieval (caption → image hamming top-k) -------
    // The retrieval surface over the pair fixture: every caption's
    // declared hash queries the WHOLE image corpus (real decode leg) for
    // its k nearest perceptual hashes within hamming ≤ MaxDist —
    // text→image search in hash space, the cross-modal twin of the
    // e-pack's embedding ANN. Spark side: [[Media.hammingTopK]] — the
    // asymmetric 8-chunk pigeonhole join (recall exact at ≤ 7),
    // hot-chunk guarded both sides, then ONE WindowGroupLimit top-k per
    // caption; the oracle may use the naive quadratic form because
    // blocking is exact at this radius. 100 TB shape: one shuffle on
    // (chunk, value) + one top-k — no cross product, no corpus sort.
    "m6_crossmodal_topk" -> ((s, dir) => {
      import s.implicits._
      val imgs = Media.imageHashes(pairMediaFrame(s, dir))
        .select($"media_id".as("item_id"), $"ahash".as("ihash"))
        .localCheckpoint()
      val caps = capHashFrame(s, dir)
        .select($"doc_id".as("query_id"), $"cap_hash".as("qhash"))
      Media.hammingTopK(caps, imgs, MaxDist, RetrK, label = "m6")
        .select($"query_id".as("cap_id"), $"item_id".as("img_id"),
          $"hamming", $"rank")
        .orderBy($"cap_id", $"rank")
    }))

  /** Arithmetic DuckDB twin of the full codec chain for one seed key: the
    * oracle never decodes media — the fixtures guarantee `hash == seed`, so
    * pairs reduce to INT64 arithmetic the LCG shares across engines. */
  /** 8 LCG bytes at indices `idxExpr(j)` composed into a 62-bit seed —
    * the SQL twin of [[seedCol]]/[[videoSeedCol]]'s byte lanes. */
  private def seedBytesSql(key: Long, idxExpr: Int => String): String =
    (0 until 8).map { j =>
      val b = s"CAST(floor(${Det.fracSql(idxExpr(j), key)} * 256) AS BIGINT)"
      val capped = if (j == 7) s"($b % 64)" else b
      if (j == 0) capped else s"($capped << ${8 * j})"
    }.mkString(" + ")

  private def flipSql: String = FlipBit.toSeq.sortBy(_._1)
    .map { case (m, bit) => s"WHEN $m THEN ${1L << bit}" }
    .mkString("CASE m ", " ", " ELSE 0 END")

  /** Hamming-pair query over a per-doc `seed` expression in (g, m) — the
    * shared outer shape of all three media oracles. The oracle may use the
    * naive quadratic join because 8-chunk blocking is exact at hamming ≤ 6. */
  private def pairsOverSeedSql(seedExpr: String): String =
    s"""WITH ids AS (
       |  SELECT doc_id, doc_id // $GroupSize AS g,
       |    doc_id % $GroupSize AS m
       |  FROM documents),
       |seeds AS (
       |  SELECT doc_id, $seedExpr AS seed FROM ids)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.seed, b.seed)) AS INTEGER) AS hamming
       |FROM seeds a JOIN seeds b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.seed, b.seed)) <= $MaxDist
       |ORDER BY a_id, b_id""".stripMargin

  private def pairOracleSql(key: Long): String =
    pairsOverSeedSql(
      s"xor(${seedBytesSql(key, j => s"(g * 8 + $j)")}, $flipSql)")

  /** Video twin: signature = XOR over the [[VideoNFrames]] per-frame seeds
    * (flip on frame 0 only) — pure INT64 arithmetic standing in for the
    * container parse + per-frame JPEG decode + hash + XOR the Spark side
    * must execute for real. */
  private def videoPairOracleSql: String = {
    val frameSeeds = (0 until VideoNFrames).map { f =>
      val bytes = seedBytesSql(VideoKey, j => s"(g * 32 + ${f * 8 + j})")
      if (f > 0) s"($bytes)" else s"xor($bytes, $flipSql)"
    }
    pairsOverSeedSql(frameSeeds.reduce((a, b) => s"xor($a, $b)"))
  }

  /** The m4/m5 arithmetic CTE prefix — seed/noise/alignment as INT64
    * arithmetic (the fixture guarantees `ahash == seed(repost)`, so the
    * oracle never decodes; the Spark side must). Ends at `pal`
    * (doc_id, ahash, cap_hash, hamming, score_ppm, aligned). */
  private def pairAlignOracleCtes: String = {
    val seed = s"xor(${seedBytesSql(PairImageKey, j => s"(g * 8 + $j)")}, " +
      s"$flipSql)"
    val mask = (0 until 8).map { i =>
      val p = s"CAST(floor(${Det.fracSql(s"(doc_id * 8 + $i)",
        CapNoiseKey)} * 62) AS INTEGER)"
      s"(CASE WHEN $i < (doc_id % 8) THEN (CAST(1 AS BIGINT) << $p) " +
        "ELSE CAST(0 AS BIGINT) END)"
    }.reduce((a, b) => s"xor($a, $b)")
    s"""pids AS (
       |  SELECT doc_id, (doc_id - (doc_id % 2)) // $GroupSize AS g,
       |    (doc_id - (doc_id % 2)) % $GroupSize AS m
       |  FROM documents),
       |pseeds AS (
       |  SELECT doc_id, $seed AS ahash FROM pids),
       |pnoise AS (
       |  SELECT doc_id, $mask AS mask FROM documents),
       |praw AS (
       |  SELECT s.doc_id, s.ahash, xor(s.ahash, n.mask) AS cap_hash
       |  FROM pseeds s JOIN pnoise n USING (doc_id)),
       |pham AS (
       |  SELECT doc_id, ahash, cap_hash,
       |    CAST(bit_count(xor(ahash, cap_hash)) AS INTEGER) AS hamming
       |  FROM praw),
       |pal AS (
       |  SELECT doc_id, ahash, cap_hash, hamming,
       |    CAST(((64 - hamming) * 1000000) // 64 AS BIGINT) AS score_ppm,
       |    (hamming <= $AlignMaxDist) AS aligned
       |  FROM pham)""".stripMargin
  }

  /** SQL twin of [[pairUrlCol]]. */
  private def pairUrlSql: String = {
    val site = s"('site' || CAST((doc_id // 2) % 7 AS VARCHAR))"
    s"""((CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END) ||
       |  (CASE WHEN doc_id % 3 = 0 THEN 'www.'
       |        WHEN doc_id % 3 = 1 THEN 'WWW.' ELSE '' END) ||
       |  (CASE WHEN doc_id % 2 = 0 THEN upper($site) ELSE $site END) ||
       |  '.Example.COM' || '/item/' || CAST((doc_id // 2) AS VARCHAR) ||
       |  (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
       |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=pair'
       |        WHEN doc_id % 4 = 1 THEN ''
       |        WHEN doc_id % 4 = 2 THEN '?utm_medium=m'
       |        ELSE '?utm_campaign=x' END))""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "m1_image_neardup" -> pairOracleSql(ImageKey),
    "m2_audio_neardup" -> pairOracleSql(AudioKey),
    "m3_video_neardup" -> videoPairOracleSql,

    "m4_clip_align" ->
      s"""WITH $pairAlignOracleCtes
         |SELECT doc_id, ahash, cap_hash, hamming, score_ppm, aligned
         |FROM pal ORDER BY doc_id""".stripMargin,

    "m5_pair_curation" ->
      s"""WITH $pairAlignOracleCtes,
         |purls AS (SELECT doc_id, $pairUrlSql AS url FROM documents),
         |pfull AS (
         |  SELECT p.doc_id, p.ahash, p.score_ppm,
         |    ${UrlOps.canonicalizeSql("url")} AS canon_url,
         |    ${UrlOps.canonicalHostSql("url")} AS domain
         |  FROM pal p JOIN purls USING (doc_id)
         |  WHERE p.aligned),
         |pdd AS (
         |  SELECT domain, doc_id, canon_url, ahash, score_ppm FROM (
         |    SELECT *, row_number() OVER
         |      (PARTITION BY canon_url, ahash ORDER BY doc_id) AS rn
         |    FROM pfull) WHERE rn = 1)
         |SELECT domain, doc_id, canon_url, ahash, score_ppm FROM (
         |  SELECT *, row_number() OVER
         |    (PARTITION BY domain ORDER BY score_ppm DESC, doc_id) AS rk
         |  FROM pdd) WHERE rk <= $PairDomainCap
         |ORDER BY domain, doc_id""".stripMargin,

    "m6_crossmodal_topk" ->
      s"""WITH $pairAlignOracleCtes,
         |rcand AS (
         |  SELECT c.doc_id AS cap_id, i.doc_id AS img_id,
         |    CAST(bit_count(xor(c.cap_hash, i.ahash)) AS INTEGER)
         |      AS hamming
         |  FROM pal c JOIN pseeds i
         |    ON bit_count(xor(c.cap_hash, i.ahash)) <= $MaxDist)
         |SELECT cap_id, img_id, hamming, rank FROM (
         |  SELECT *, CAST(row_number() OVER
         |    (PARTITION BY cap_id ORDER BY hamming, img_id) AS INTEGER)
         |    AS rank
         |  FROM rcand) WHERE rank <= $RetrK
         |ORDER BY cap_id, rank""".stripMargin)
}
