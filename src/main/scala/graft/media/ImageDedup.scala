package graft.media

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection over an image corpus —
  * the visual-dedup stage of a multimodal training pipeline (the text
  * analogue is dedup_simhash): decode → difference hash (dHash) →
  * banded Hamming-LSH candidates → exact Hamming verify.
  *
  * The hash is the standard 64-bit dHash (Krawetz): integer
  * box-average the decoded pixels' luma onto a 9×8 grid, then bit
  * (gy,gx) = 1 iff gray(gy,gx) > gray(gy,gx+1) — horizontal gradient
  * signs, invariant to global brightness/contrast shifts. The 64 bits
  * split into four 16-bit bands; images sharing any band become
  * candidate pairs (the dedup_minhash band-bucket pattern, including
  * Dedup.bucketCapSplit's over-cap spanning star so a degenerate
  * bucket emits O(bucket) anchor pairs instead of O(bucket²)), and
  * every candidate is verified with the exact 64-bit Hamming
  * distance. All-pairs comparison never happens at any stage.
  *
  * Scale shape: decode+hash is the payload-heavy embarrassingly
  * parallel map stage (no shuffle; at 100 TB executors stream archive
  * bytes through at I/O speed and emit 20-byte signature rows); the
  * LSH join shuffles only (band, bucket, id) triples; the verify join
  * moves four ints per side per candidate.
  *
  * Correctness/oracle: payloads are the deterministic content-keyed
  * synthetic PNGs (MediaOps.syntheticPng with seed 0 — same bytes in,
  * same image, so byte-identical documents yield Hamming-0 pairs).
  * The Spark side runs the REAL encode→decode round trip through the
  * JDK PNG codec; because PNG is lossless, the decoded pixel matrix
  * equals the generator's arithmetic on the text bytes, which is what
  * the DuckDB oracle recomputes analytically — pixel bytes from the
  * BLOB hex, integer luma, integer box averages, gradient bits, band
  * buckets, the capped pair join, and the Hamming sum. A codec bug
  * that perturbs any pixel flips hash bits and turns the row red.
  *
  * Reference scope note: cc-pyspark has no image operators; this is a
  * beyond-reference training-pipeline component (SURVEY §2 multimodal
  * family).
  */
object ImageDedup {

  private val GridX = 9 // 9 columns -> 8 horizontal gradients per row
  private val GridY = 8
  private val BandBits = 16 // 64 hash bits -> 4 bands
  private val MaxBucket = 64 // same pair-join cap as the text LSH family
  private val DupThreshold = 8 // <=8/64 differing gradient signs

  /** 64-bit dHash of a decoded image as four 16-bit band ints
    * (band m = bits [16m, 16m+16), bit k = gy*8+gx). Integer-only:
    * luma = (77r + 150g + 29b) >> 8, box mean = sum / count floored —
    * every step replays exactly in 64-bit SQL arithmetic.
    */
  private[media] def dhashBands(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val g = Array.ofDim[Int](GridY, GridX)
    var gy = 0
    while (gy < GridY) {
      var gx = 0
      while (gx < GridX) {
        val x0 = gx * w / GridX; val x1 = (gx + 1) * w / GridX
        val y0 = gy * h / GridY; val y1 = (gy + 1) * h / GridY
        var sum = 0L; var cnt = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
            cnt += 1
            x += 1
          }
          y += 1
        }
        g(gy)(gx) = if (cnt == 0) 0 else (sum / cnt).toInt
        gx += 1
      }
      gy += 1
    }
    val bands = new Array[Int](64 / BandBits)
    gy = 0
    while (gy < GridY) {
      var gx = 0
      while (gx < GridX - 1) {
        val k = gy * (GridX - 1) + gx
        if (g(gy)(gx) > g(gy)(gx + 1)) bands(k / BandBits) |= 1 << (k % BandBits)
        gx += 1
      }
      gy += 1
    }
    bands
  }

  /** (media_id, 4 band ints) from any (media_id, payload) image table:
    * JDK decode → dHash, one map stage. Undecodable payloads drop
    * (resizeImages' contract). The CLI entry point.
    */
  def hashPayloads(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, payload) =>
          val img = try {
            javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          } catch { case _: Exception => null }
          if (img == null) Iterator.empty
          else Iterator.single((id, dhashBands(img)))
        }
      }
      .toDF("media_id", "bands")
  }

  /** (media_id, 4 band ints) for every non-empty document's
    * content-keyed PNG: encode → JDK decode → dHash, one map stage.
    */
  private def hashedImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, text) =>
          val png = MediaOps.syntheticPng(0, text)
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          (id, dhashBands(img))
        }
      }
      .toDF("media_id", "bands")
  }

  /** Candidate pairs from band-bucket collisions (the dedup family's
    * capped split: under-cap buckets self-join, over-cap buckets emit
    * a min-id spanning star), then exact Hamming verify. Emits EVERY
    * verified candidate with its distance and the `is_dup` decision so
    * the LSH precision is visible in the output (and the row set stays
    * non-empty on corpora with no near-dups).
    */
  /** Band/verify over a (media_id, bands) signature table — callers
    * persist `hashed` (24 bytes/image; it feeds three consumers while
    * the recompute is the full decode — the OPPOSITE economics from
    * minHashDedup's no-persist shingles, which are ~10× their text).
    */
  def pairsFromHashes(hashed: DataFrame): DataFrame = {
    val banded = hashed.select(col("media_id").as("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bucket")))
    val pairs = graft.dedup.Dedup.candidatePairs(banded)
    val h1 = hashed.select(col("media_id").as("media_a"), col("bands").as("b1"))
    val h2 = hashed.select(col("media_id").as("media_b"), col("bands").as("b2"))
    pairs.select(col("id1").as("media_a"), col("id2").as("media_b"))
      .join(h1, "media_a").join(h2, "media_b")
      .select(col("media_a"), col("media_b"),
        aggregate(
          zip_with(col("b1"), col("b2"), (x, y) => bit_count(x.bitwiseXOR(y))),
          lit(0), (acc, v) => acc + v.cast("int")).as("hamming"))
      .withColumn("is_dup", col("hamming") <= DupThreshold)
  }

  def dhashPairs(s: SparkSession, dir: String): DataFrame = {
    // At corpus scale 10B images persist as ~240 GB spillable
    // cluster-wide vs re-decoding the archive bytes twice more.
    val hashed = hashedImages(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairsFromHashes(hashed)
  }

  /** Pairs → summary cluster row (shared by the query and the CLI). */
  def clusterSummary(dupPairs: DataFrame): DataFrame =
    graft.dedup.Dedup.connectedComponents(dupPairs)
      .groupBy(col("label")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"),
        coalesce(sum(col("sz")), lit(0L)).as("n_imgs_in_clusters"),
        coalesce(sum(col("sz")) - count(lit(1)), lit(0L)).as("n_imgs_to_drop"),
        coalesce(max(col("sz")), lit(0L)).as("largest_cluster"))

  /** Full analytic replay: the synthetic pixel formula (byte b at
    * (x, y) = text_bytes[(x + 32·y) mod n]; rgb = (b, (31b) mod 256,
    * 0)) substitutes for the lossless PNG round trip, then luma, box
    * means, gradient bits, band buckets, the 64-cap pair join with the
    * spanning star, and the Hamming sum — byte-for-byte the kernel's
    * integer arithmetic.
    */
  /** Shared replay CTE chain ending at `ham(media_a, media_b, hamming)`
    * — the analytic pixel/hash/banding/pair pipeline both image-dedup
    * oracles read.
    */
  private val phashCtes = s"""imgs AS (
        SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n,
               hex(CAST(text AS BLOB)) AS hx
        FROM documents WHERE text IS NOT NULL AND length(text) > 0),
      px AS (SELECT media_id, n, hx, unnest(range(0, 768)) AS p FROM imgs),
      gr AS (SELECT media_id, p % 32 AS x, p // 32 AS y,
               (77 * bv + 150 * ((bv * 31) % 256)) // 256 AS gray
        FROM (SELECT media_id, p,
                CAST(('0x' || substr(hx, CAST(2 * (p % n) + 1 AS INT), 2)) AS INT) AS bv
              FROM px)),
      cell AS (SELECT media_id, (9 * x + 8) // 32 AS gx, y // 3 AS gy, gray FROM gr),
      gavg AS (SELECT media_id, gy, gx, CAST(SUM(gray) // COUNT(*) AS BIGINT) AS g
        FROM cell GROUP BY media_id, gy, gx),
      bits AS (SELECT a.media_id, a.gy * 8 + a.gx AS k
        FROM gavg a JOIN gavg b
          ON a.media_id = b.media_id AND a.gy = b.gy AND b.gx = a.gx + 1
        WHERE a.g > b.g),
      bm AS (SELECT media_id, k // 16 AS band, CAST(SUM(1 << (k % 16)) AS INT) AS bucket
        FROM bits GROUP BY media_id, k // 16),
      band AS (SELECT i.media_id, mb.band, COALESCE(bm.bucket, 0) AS bucket
        FROM imgs i CROSS JOIN (SELECT unnest(range(0, 4)) AS band) mb
        LEFT JOIN bm ON bm.media_id = i.media_id AND bm.band = mb.band),
      bw AS (SELECT band, bucket, COUNT(*) AS w, MIN(media_id) AS anchor
        FROM band GROUP BY band, bucket),
      sm AS (SELECT band.media_id, band.band, band.bucket
        FROM band JOIN bw USING (band, bucket) WHERE bw.w <= $MaxBucket),
      pf AS (SELECT a.media_id AS id1, b.media_id AS id2
        FROM sm a JOIN sm b ON a.band = b.band AND a.bucket = b.bucket
          AND a.media_id < b.media_id),
      ps AS (SELECT bw.anchor AS id1, band.media_id AS id2
        FROM band JOIN bw USING (band, bucket)
        WHERE bw.w > $MaxBucket AND band.media_id <> bw.anchor),
      pairs AS (SELECT DISTINCT id1, id2
        FROM (SELECT * FROM pf UNION ALL SELECT * FROM ps)),
      ham AS (SELECT p.id1 AS media_a, p.id2 AS media_b,
               CAST(SUM(bit_count(xor(a.bucket, b.bucket))) AS INT) AS hamming
        FROM pairs p
        JOIN band a ON a.media_id = p.id1
        JOIN band b ON b.media_id = p.id2 AND b.band = a.band
        GROUP BY p.id1, p.id2)"""

  val imageDedupPhash: QueryDef = QueryDef(
    "image_dedup_phash",
    (s, dir) => dhashPairs(s, dir),
    Some(s"""WITH $phashCtes
      SELECT media_a, media_b, hamming, hamming <= $DupThreshold AS is_dup FROM ham"""))

  /** Visual duplicate CLUSTERS: the is_dup pairs feed the same capped
    * min-label-fixpoint connected components as the text dedup family
    * (Dedup.connectedComponents — 10 keyed join+agg rounds with the
    * join-free convergence check, no windows), summarized to one row.
    * The keep-one-per-cluster drop count is the number a curation run
    * budgets against.
    */
  val imageDedupClusters: QueryDef = QueryDef(
    "image_dedup_clusters",
    (s, dir) => clusterSummary(dhashPairs(s, dir).filter(col("is_dup"))
      .select(col("media_a").as("id1"), col("media_b").as("id2"))),
    Some(s"""WITH RECURSIVE $phashCtes,
      dups AS (SELECT media_a, media_b FROM ham WHERE hamming <= $DupThreshold),
      edges AS (SELECT media_a AS a, media_b AS b FROM dups
                UNION ALL SELECT media_b, media_a FROM dups),
      nodes AS (SELECT DISTINCT a AS node FROM edges),
      cc(iter, node, label) AS (
        SELECT 0, node, node FROM nodes
        UNION ALL
        SELECT c.iter + 1, c.node,
          least(c.label, coalesce((SELECT MIN(c2.label) FROM cc c2
                                   JOIN edges e ON e.a = c2.node
                                   WHERE e.b = c.node), c.label))
        FROM cc c WHERE c.iter < 10
      ),
      labels AS (SELECT node, label FROM cc WHERE iter = 10),
      clusters AS (SELECT label, COUNT(*) AS sz FROM labels GROUP BY label)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_imgs_in_clusters,
             CAST(COALESCE(SUM(sz) - COUNT(*), 0) AS BIGINT) AS n_imgs_to_drop,
             CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS largest_cluster
      FROM clusters"""))

  val all: Seq[QueryDef] = Seq(imageDedupPhash, imageDedupClusters)
}
