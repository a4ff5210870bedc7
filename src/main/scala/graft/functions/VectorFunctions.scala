package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` columns, built from Spark's
  * higher-order functions (`zip_with` / `aggregate` / `transform`) so the
  * whole computation stays inside whole-stage codegen — no Scala UDF, no
  * serialization boundary in the hot path.
  *
  * Mirrors the reference's dense-vector semantics (cosine kNN over a
  * 1024-dim `dense_vector`, `/root/reference/backend/process/
  * elasticsearch_index.py:261-277`); dimensionality is a parameter here,
  * fixtures use 64 (FIXTURES.md §A).
  *
  * All accumulation is done in DOUBLE, left-to-right over the array, which
  * matches DuckDB's `list_dot_product` on `DOUBLE[]` — that keeps the
  * DuckDB oracle bit-compatible with the Spark plan.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> for stable accumulation. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Per-group centroid components: (group, pos, c, n_vecs) — the
    * index-build primitive behind IVF cell centers / class prototypes.
    * Components are 6-dp-rounded then summed as DECIMAL, so the mean is
    * EXACT and partition-order-free (a plain double `avg` sums in
    * shuffle arrival order — unreproducible across engines or even
    * runs). One posexplode + one partial-aggregated groupBy. */
  def centroidComponents(embs: org.apache.spark.sql.DataFrame,
      groupCol: String, vecCol: String): org.apache.spark.sql.DataFrame =
    embs
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos"))
      .agg(
        sum(round(col("v").cast("double"), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 10))).as("s"),
        count(lit(1)).as("n_vecs"))
      .select(col(groupCol), col("pos"),
        round(col("s").cast("double") / col("n_vecs"), 6).as("c"),
        col("n_vecs"))

  /** Per-group centroid as an array column (group, centroid, n_vecs). */
  def centroids(embs: org.apache.spark.sql.DataFrame, groupCol: String,
      vecCol: String): org.apache.spark.sql.DataFrame =
    centroidComponents(embs, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(
        transform(sort_array(collect_list(struct(col("pos"), col("c")))),
          p => p.getField("c")).as("centroid"),
        max(col("n_vecs")).as("n_vecs"))

  /** Dot product: sum_i a_i * b_i, double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity in [-1, 1]; 0.0 when either vector has zero norm.
    * Backed by the native codegen expression [[CosineSimilarityExpr]]
    * (primitive float loop inside whole-stage codegen); numerically
    * identical to the HOF composition [[cosineHof]]. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftext.CosineSimilarityExpr.cosineFast(a, b)

  /** Reference HOF formulation of cosine (kept for cross-checking the
    * native expression; same left-to-right double accumulation). */
  def cosineHof(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Squared euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Embedding-dimension guard (reference enforces dims==1024 at index and
    * query time, `elasticsearch_index.py:263-265`). */
  def hasDim(v: Column, dim: Int): Column = size(v) === dim

  /** Lenient parse of a stringified vector `'{-0.07,0.12,...}'` (the
    * reference stores embeddings as TEXT in the RDB and re-parses,
    * `backend/utils/schema.py:14`, `elasticsearch_index.py:84-111`).
    * Empty / null strings yield an empty array.
    */
  def parseVectorString(c: Column): Column = {
    val stripped = regexp_replace(c, "[\\[\\]{}\\s]", "")
    when(c.isNull || stripped === "", array().cast("array<float>"))
      .otherwise(transform(split(stripped, ","), _.cast("float")))
  }

  /** Random-hyperplane LSH signature: sign bits of `nBits` fixed seeded
    * projections, packed into a long. Buckets embeddings so ANN search
    * touches one bucket instead of the full table — the 100 TB scale path
    * (an IVF-style partition prune; brute force stays the correctness
    * baseline). Hyperplanes are deterministic from (seed, bit, dim).
    */
  def lshSignature(v: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val planes = Hyperplanes.planes(dim, nBits, seed)
    // Each plane is a single array LITERAL (one tree node), and the dot
    // product is a zip_with/aggregate fold — the whole signature is ~8
    // small expressions instead of dim*nBits inlined multiplies, which
    // kept the plan under the whole-stage-codegen size limit. The fold is
    // left-to-right like the hand-rolled sum (0.0+x == x exactly), so
    // sign decisions — and the DuckDB oracle — are unchanged.
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val proj = aggregate(
        zip_with(v, typedLit(plane.toSeq), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, t) => acc + t)
      when(proj > 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}

/** Deterministic pseudo-random hyperplanes shared by the LSH signature
  * expression and any driver-side query planning. Values derived from
  * MD5 — portable and stable across JVMs.
  */
object Hyperplanes {
  def planes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { j =>
        val h  = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$seed:$b:$j".getBytes("UTF-8"))
        val u  = java.nio.ByteBuffer.wrap(h).getInt(0)
        u.toDouble / Int.MaxValue.toDouble // roughly uniform in [-1, 1]
      }
    }
}
