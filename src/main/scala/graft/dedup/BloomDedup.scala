package graft.dedup

import graft.QueryDef
import graft.operators.Curation
import graft.util.{HadoopConfs, Tables}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame}

/** EXACT incremental dedup with a Bloom prefilter — the cross-crawl
  * operating mode at 100 TB. Deduplicating crawl N+1 against crawls 1..N
  * with a plain join shuffles the entire historical digest set on every
  * run; the standard fix is a Bloom filter over the indexed digests,
  * built once and shipped to every task, so the overwhelmingly-novel new
  * batch short-circuits in its scan stage and only bloom-positive
  * candidates (true dups + the fpp tail) reach the verification join.
  * Bloom filters have no false negatives, and the verification join
  * removes the false positives — the final result is bit-identical to
  * the plain exact join, which is why the registered query is
  * oracle-checkable even though a probabilistic structure sits in the
  * plan.
  *
  * Sizing at scale: the filter is O(1.2 bytes × expectedItems) at 1% fpp
  * driver-side; a 3-billion-chunk index at 3% is ~2.7 GB — past broadcast
  * comfort, at which point you either shard the filter by digest prefix
  * (one per probe partition) or accept a higher fpp: accuracy never
  * degrades, only the verification-join traffic does.
  *
  * The probe compiles to Spark's own codegen'd `BloomFilterMightContain`
  * — the same expression `InjectRuntimeFilter` plans for runtime
  * row-level filters — with the pre-built filter embedded as a binary
  * literal, so the whole prefilter stays inside whole-stage codegen (no
  * UDF, no broadcast variable lookup per row).
  */
object BloomDedup {

  /** `might_contain(bloom, key)` over a pre-serialized filter; `key`
    * must be LongType (use `xxhash64`), matching the long-hash probe
    * contract of Spark's runtime bloom filters.
    */
  def bloomMightContain(bloomBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expression(key)))

  /** One pass over `keys` (a LongType column) → serialized Bloom filter.
    * Overestimate `expectedItems` when cardinality is unknown: an
    * oversized filter wastes bits, an undersized one only raises fpp
    * (more verification traffic, never wrong results).
    */
  def buildBloom(keys: DataFrame, keyCol: String,
                 expectedItems: Long, fpp: Double): Array[Byte] = {
    // zero keys (an empty indexed crawl / shard): stat.bloomFilter's
    // aggregation yields a null-buffer filter that NPEs on serialize —
    // an explicit empty filter rejects everything, which is correct
    val bf =
      if (keys.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(math.max(expectedItems, 1L), fpp)
      else keys.stat.bloomFilter(keyCol, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Rows of `batchChunks` whose chunk exists in `indexChunks`, exactly.
    * Plan shape: bloom prefilter in the batch scan stage → left-semi
    * verification join on the 128-bit digest. Both inputs must carry a
    * `chunk` column.
    */
  def dupChunksAgainst(batchChunks: DataFrame, indexChunks: DataFrame,
                       expectedItems: Long = 1L << 18,
                       fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(
      indexChunks.select(xxhash64(col("chunk")).as("k")), "k", expectedItems, fpp)
    batchChunks
      .filter(bloomMightContain(bloom, xxhash64(col("chunk"))))
      .withColumn("h", md5(col("chunk").cast("binary")))
      .join(indexChunks.select(md5(col("chunk").cast("binary")).as("h")),
        Seq("h"), "left_semi")
  }

  /** Registered query: split `documents` deterministically into an
    * "indexed crawl" (doc_id % 10 < 7) and a "new batch" (the rest) —
    * arithmetic split so DuckDB reproduces it bit-identically — then
    * account, per source, how much of the new batch's chunk mass already
    * exists in the index. Totals come straight off the batch scan
    * (map-side partial agg, no join); only bloom-positive chunks enter
    * the verification join. The oracle is the bloom-free plain join: the
    * two must agree exactly.
    */
  val bloomIncremental: QueryDef = QueryDef(
    "dedup_bloom_incremental",
    (s, dir) => {
      val chunked = Curation.tokenChunks(Tables(s, dir, "documents"))
      val indexed = chunked.filter(col("doc_id") % 10 < 7)
      val batch = chunked.filter(col("doc_id") % 10 >= 7)
      val tot = batch.groupBy(col("source")).agg(count(lit(1)).as("n_chunks"))
      val dupAgg = dupChunksAgainst(batch, indexed)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_dup_chunks"),
          countDistinct(col("doc_id")).as("n_contaminated_docs"))
      tot.join(dupAgg, Seq("source"), "left")
        .select(col("source"), col("n_chunks"),
          coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
          coalesce(col("n_contaminated_docs"), lit(0L)).as("n_contaminated_docs"))
    },
    Some("""WITH d AS (SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      c AS (SELECT doc_id, source, array_to_string(toks[s+1:s+20], ' ') AS chunk
            FROM d, unnest(generate_series(0, greatest(len(toks)-1, 0), 20)) AS t(s)),
      idx AS (SELECT DISTINCT chunk FROM c WHERE doc_id % 10 < 7),
      b AS (SELECT * FROM c WHERE doc_id % 10 >= 7),
      tot AS (SELECT source, COUNT(*) AS n_chunks FROM b GROUP BY source),
      dup AS (SELECT source, COUNT(*) AS n_dup_chunks,
                COUNT(DISTINCT doc_id) AS n_contaminated_docs
              FROM b WHERE chunk IN (SELECT chunk FROM idx) GROUP BY source)
      SELECT tot.source, tot.n_chunks,
        COALESCE(dup.n_dup_chunks, 0) AS n_dup_chunks,
        COALESCE(dup.n_contaminated_docs, 0) AS n_contaminated_docs
      FROM tot LEFT JOIN dup USING (source)"""))

  /** Persisted exact-digest index: `digests/` parquet (distinct 128-bit
    * chunk digests, the verification side) plus `bloom.bin` (the
    * prefilter, small enough to load driver-side in O(filter bytes)).
    * Build once per crawl; probing a new batch never re-reads indexed
    * text — the third member of the incremental-index family next to
    * [[Dedup.saveMinHashIndex]] and the IVF index.
    */
  /** Schema/hash-family contract of the digest index. The probe
    * RE-COMPUTES chunking + digest + bloom key on the new batch, so any
    * change to the 20-token chunker, the md5 digest, or the xxhash64
    * bloom key silently empties the dup set against an old index (the
    * MinHash-index failure class — see Dedup.MinHashHashFamily). Bump
    * when any of the three changes; the probe fails loudly on mismatch.
    */
  private[graft] val DigestIndexScheme = "tok20-md5-xxbloom-v1"

  private def digestMetaPath(indexDir: String) =
    new Path(s"$indexDir/_graft_digest_meta")

  def saveDigestIndex(docs: DataFrame, indexDir: String,
                      expectedItems: Long = 1L << 20,
                      fpp: Double = 0.01): Unit = {
    val chunks = Curation.tokenChunks(docs)
      .select(md5(col("chunk").cast("binary")).as("h"),
        xxhash64(col("chunk")).as("k"))
      .dropDuplicates("h")
    chunks.select(col("h")).write.mode("overwrite").parquet(s"$indexDir/digests")
    // second pass over the (already deduped, digest-only) projection —
    // cheap relative to the text scan above, and keeps build single-API
    val bytes = buildBloom(
      docs.sparkSession.read.parquet(s"$indexDir/digests")
        .select(xxhash64(col("h")).as("k")), "k", expectedItems, fpp)
    val fs = new Path(indexDir).getFileSystem(HadoopConfs.get)
    val out = fs.create(new Path(s"$indexDir/bloom.bin"), true)
    try out.write(bytes) finally out.close()
    val mout = fs.create(digestMetaPath(indexDir), true)
    try mout.write(DigestIndexScheme.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally mout.close()
  }

  /** Probe a saved digest index: returns the new batch's duplicated
    * chunk rows (doc_id, source, h), exactly. The bloom prunes in the
    * batch scan; the surviving candidates (tiny) broadcast against the
    * digest parquet, so the historical index is scanned once
    * column-pruned and never shuffled.
    */
  def dedupAgainstDigestIndex(newDocs: DataFrame, indexDir: String): DataFrame = {
    val spark = newDocs.sparkSession
    val fs = new Path(indexDir).getFileSystem(HadoopConfs.get)
    if (!fs.exists(digestMetaPath(indexDir)))
      throw new IllegalStateException(
        s"digest index at $indexDir has no _graft_digest_meta marker (built by " +
          s"an older binary); probing across chunking/digest schemes silently " +
          s"returns zero dups — rebuild with saveDigestIndex")
    val metaIn = fs.open(digestMetaPath(indexDir))
    val scheme =
      try scala.io.Source.fromInputStream(metaIn, "UTF-8").mkString
      finally metaIn.close()
    if (scheme != DigestIndexScheme)
      throw new IllegalStateException(
        s"digest index at $indexDir was built with scheme '$scheme' but this " +
          s"binary probes with '$DigestIndexScheme' — rebuild the index")
    val in = fs.open(new Path(s"$indexDir/bloom.bin"))
    val bytes =
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
          .foreach(n => bos.write(buf, 0, n))
        bos.toByteArray
      } finally in.close()
    val idx = spark.read.parquet(s"$indexDir/digests")
    Curation.tokenChunks(newDocs)
      .withColumn("h", md5(col("chunk").cast("binary")))
      .filter(bloomMightContain(bytes, xxhash64(col("h"))))
      .join(idx, Seq("h"), "left_semi")
      .select(col("doc_id"), col("source"), col("h"))
  }

  val all: Seq[QueryDef] = Seq(bloomIncremental)
}
