package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.Det
import graft.multimodal.{ImageCodec, Media}

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
  */
object Mm {

  private val GroupSize = 5
  /** Flip-bit position per group member (0 = unflipped base). */
  private val FlipBit = Map(1 -> 13, 2 -> 26, 3 -> 39, 4 -> 52)
  private val MaxDist = 6

  /** Deterministic 62-bit seed column from doc_id: 8 LCG-derived bytes
    * (top byte capped to 6 bits — no BIGINT overflow on the shift, and the
    * image can never be all-white), one flipped bit per group member. */
  private def seedCol = {
    val g = floor(col("doc_id") / GroupSize).cast("long")
    val bytes = (0 until 8).map { j =>
      val b = floor(Det.frac(g * 8 + j, 7L) * 256).cast("long")
      shiftleft(if (j == 7) b % 64 else b, 8 * j)
    }
    val base = bytes.reduce(_ + _) // disjoint bit lanes: + is OR
    val m = (col("doc_id") % GroupSize).cast("int")
    val flip = FlipBit.foldLeft(lit(0L)) { case (acc, (mm, bit)) =>
      when(m === mm, lit(1L << bit)).otherwise(acc)
    }
    base.bitwiseXOR(flip)
  }

  /** doc_id → real PNG bytes whose pixel grid encodes the seed (bit i of
    * the seed = pixel (i%8, i/8), white = set). */
  private def pngFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism)
      .select($"doc_id", seedCol.as("seed"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, seed) => (id, pngOf(seed)) }
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

  /** Host-side twin of [[seedCol]] (specs verify the query against it). */
  private[graft] def seedHost(docId: Long): Long = {
    val g = docId / GroupSize
    val raw = (0 until 8).map { j =>
      val b = math.floor(Det.fracHost(g * 8 + j, 7L) * 256).toLong
      (if (j == 7) b % 64 else b) << (8 * j)
    }.sum
    raw ^ FlipBit.get((docId % GroupSize).toInt).map(1L << _).getOrElse(0L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- image near-dup: PNG encode → ImageIO decode → aHash → 8-chunk
    // blocked hamming self-join (the full multimodal dedup chain) ---------
    "m1_image_neardup" -> ((s, dir) => {
      val hashes = Media.imageHashes(pngFrame(s, dir)).localCheckpoint()
      Media.imageNearDupPairs(hashes, MaxDist)
        .orderBy(col("a_id"), col("b_id"))
    }))

  def oracles: Map[String, String] = {
    val byteTerms = (0 until 8).map { j =>
      val b = s"CAST(floor(${Det.fracSql(s"(g * 8 + $j)", 7L)} * 256) AS BIGINT)"
      val capped = if (j == 7) s"($b % 64)" else b
      if (j == 0) capped else s"($capped << ${8 * j})"
    }.mkString(" + ")
    val flip = FlipBit.toSeq.sortBy(_._1)
      .map { case (m, bit) => s"WHEN $m THEN ${1L << bit}" }
      .mkString("CASE m ", " ", " ELSE 0 END")
    Map(
      "m1_image_neardup" ->
        s"""WITH ids AS (
           |  SELECT doc_id, doc_id // $GroupSize AS g,
           |    doc_id % $GroupSize AS m
           |  FROM documents),
           |seeds AS (
           |  SELECT doc_id, xor($byteTerms, $flip) AS seed FROM ids)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  CAST(bit_count(xor(a.seed, b.seed)) AS INTEGER) AS hamming
           |FROM seeds a JOIN seeds b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.seed, b.seed)) <= $MaxDist
           |ORDER BY a_id, b_id""".stripMargin)
  }
}
