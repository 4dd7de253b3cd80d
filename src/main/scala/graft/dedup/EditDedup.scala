package graft.dedup

import graft.QueryDef
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Edit-distance near-dup verification — the EXACT confirmation stage a
  * fuzzy-dedup pipeline runs after candidate generation (MinHash/SimHash
  * band buckets propose, Levenshtein disposes). Both engines implement
  * the same unit-cost edit distance, so unlike Jaccard-over-shingles the
  * verdict is integer-exact and fully oracle-checkable.
  *
  * Scale shape: candidates come from a BLOCKING key (32-char prefix ×
  * 20-char length bucket), so the self-join is a keyed equi-join whose
  * per-block fan-out is bounded by near-identical openings — never
  * all-pairs. On a templated corpus where one prefix block could
  * explode, the key extends with more prefix or routes through the
  * shared capped bucket split (dedup/Dedup.scala bucketCapSplit), the
  * same discipline every dedup family member here follows. The O(len²)
  * DP per surviving pair runs only on the blocked candidates.
  * Relative distance is reported in ppm via integer arithmetic
  * (bit-exact across engines; the 5% acceptance threshold is the
  * conventional near-dup bar).
  */
object EditDedup {

  val editDistancePairs: QueryDef = QueryDef(
    "dedup_edit_distance",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          substring(col("text"), 1, 32).as("pfx"),
          // `div`, not `/`: Column./ is floating-point division
          expr("CAST(length(text) AS BIGINT) div 20").as("lb"))
      val a = d.select(col("doc_id").as("a_id"), col("text").as("a_text"),
        col("pfx"), col("lb"))
      val b = d.select(col("doc_id").as("b_id"), col("text").as("b_text"),
        col("pfx"), col("lb"))
      a.join(b, Seq("pfx", "lb"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_text"), col("b_text")).cast("long").as("dist"),
          greatest(length(col("a_text")), length(col("b_text")))
            .cast("long").as("max_len"))
        .withColumn("rel_ppm",
          expr("dist * 1000000 DIV greatest(max_len, 1)"))
        .filter(col("rel_ppm") <= 50000)
        .select(col("a_id"), col("b_id"), col("dist"), col("rel_ppm"))
    },
    Some("""WITH d AS (
        SELECT doc_id, text, substr(text, 1, 32) AS pfx,
          CAST(length(text) // 20 AS BIGINT) AS lb
        FROM documents),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
          CAST(greatest(length(a.text), length(b.text)) AS BIGINT) AS max_len
        FROM d a JOIN d b ON a.pfx = b.pfx AND a.lb = b.lb
          AND a.doc_id < b.doc_id)
      SELECT a_id, b_id, dist,
        CAST(dist * 1000000 // greatest(max_len, 1) AS BIGINT) AS rel_ppm
      FROM pairs
      WHERE dist * 1000000 // greatest(max_len, 1) <= 50000"""))

  val all: Seq[QueryDef] = Seq(editDistancePairs)
}
