package graft.vector

import graft.QueryDef
import graft.dedup.Dedup
import graft.functions.{FeatureHashEmbed, FnvHashes}
import graft.util.Tables
import org.apache.spark.sql.functions._

/** The corpus→vector "embed" stage as a registered operator: documents
  * in, unit-L2 vectors out, zero shuffles. The encoder is the
  * deterministic hashing-trick kernel (FeatureHashKernel) — in
  * production the same plan runs a learned encoder behind the identical
  * (doc_id, array<double>) contract; everything downstream (ANN,
  * semantic dedup, k-means, PCA) is encoder-agnostic.
  *
  * Scale shape: ONE map stage over the documents scan — tokenize, FNV
  * hash, fold, normalize inside a single whole-stage-codegen'd native
  * expression chain. No aggregation, no exchange; at 100 TB this is
  * I/O-bound and embarrassingly parallel.
  *
  * Oracle: full static replay — per-token FNV-1a as the HUGEINT
  * list_reduce fold (the LSH dedup stack), signed-count accumulation by
  * dimension, exact-integer L2 normalize. Every double is an exact
  * integer pushed through one IEEE sqrt and one IEEE divide, so the
  * vectors match bit-for-bit with no rounding contract needed.
  *
  * Output shape: the registered query posexplodes the vector to scalar
  * (doc_id, dim, value) rows — the driver's pandas comparator cannot
  * hash array-typed columns (CORRECTNESS_r10's one red row), so every
  * oracled query keeps its final projection scalar (enforced by
  * OutputShapeSpec). Downstream consumers use the array-valued
  * featureEmbed column directly; the explode exists only at the gate.
  */
object FeatureEmbed {

  private val Dim = 64

  val textFeatureEmbed: QueryDef = QueryDef(
    "text_feature_embed",
    (s, dir) => Tables(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(FeatureHashEmbed.featureEmbed(
          FnvHashes.fnvTokenHashes(col("text")), Dim)))
      .select(col("doc_id"), col("pos").cast("long").as("dim"),
        col("col").as("value")),
    Some(s"""WITH d0 AS (
        SELECT doc_id, regexp_extract_all(${Dedup.asciiLower("text")}, '[a-z0-9]+') AS tk
        FROM documents WHERE text IS NOT NULL),
      tok AS (SELECT doc_id, i AS tpos, tk[i] AS t
              FROM d0, unnest(generate_series(1, len(tk))) AS g(i)),
      thu AS (SELECT doc_id, tpos,
          ${Dedup.fnvU("list_transform(range(1, length(t)+1), ci -> ascii(t[ci]))")} AS u
          FROM tok),
      th0 AS (SELECT doc_id, tpos, ${Dedup.SignedU} AS h FROM thu),
      acc AS (SELECT doc_id, ((h % $Dim) + $Dim) % $Dim AS dm,
              SUM(CASE WHEN h < 0 THEN -1 ELSE 1 END) AS c
              FROM th0 GROUP BY doc_id, ((h % $Dim) + $Dim) % $Dim),
      grid AS (SELECT doc_id, unnest(range(0, $Dim)) AS dm FROM d0),
      af AS (SELECT grid.doc_id, grid.dm,
              CAST(COALESCE(acc.c, 0) AS DOUBLE) AS c
             FROM grid LEFT JOIN acc
               ON acc.doc_id = grid.doc_id AND acc.dm = grid.dm),
      nr AS (SELECT doc_id, sqrt(SUM(c * c)) AS nv FROM af GROUP BY doc_id)
      SELECT af.doc_id, CAST(af.dm AS BIGINT) AS dim,
             CASE WHEN nv > 0 THEN af.c / nv ELSE 0.0 END AS value
      FROM af JOIN nr ON nr.doc_id = af.doc_id"""))

  val all: Seq[QueryDef] = Seq(textFeatureEmbed)
}
