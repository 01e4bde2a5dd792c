package graft

import org.apache.spark.sql.Column

/** Public facade for graft's custom Catalyst expressions (implemented under
  * org.apache.spark.sql.graft for access to private[sql] plumbing). */
package object plans {
  object DotProduct {
    /** Codegen'd dot product of two ArrayType(DoubleType) columns. */
    def dot(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.GraftExprs.dot(a, b)
    /** Codegen'd squared Euclidean distance of two double-array columns
      * (same left-fold order as the aggregate/zip_with HOF idiom). */
    def sqDist(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.GraftExprs.sqDist(a, b)
    /** Codegen'd dot product of two ArrayType(FloatType) columns,
      * accumulated in double — bit-identical to dot() over the widened
      * arrays, without materializing them. */
    def fdot(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.GraftExprs.fdot(a, b)
  }

  object Bloom {
    /** Fixed-size Bloom filter aggregate over xxhash64(child). */
    def agg(child: Column, estimatedItems: Long, numBits: Long): Column =
      org.apache.spark.sql.graft.GraftExprs
        .bloomAgg(child, estimatedItems, numBits)
    /** might_contain probe of a constant serialized filter. */
    def mightContain(bloomBytes: Column, value: Column): Column =
      org.apache.spark.sql.graft.GraftExprs.mightContain(bloomBytes, value)
    /** A one-row/one-column aggregate as a scalar-subquery expression —
      * the plan-literal-free way to ship a built filter to its probe. */
    def scalarOf(df: org.apache.spark.sql.DataFrame): Column =
      org.apache.spark.sql.graft.GraftExprs.scalarSubquery(df)
  }

  object SortedIntersect {
    /** |a ∩ b| of sorted distinct string arrays (codegen'd merge walk). */
    def size(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.SortedIntersect.size(a, b)
    /** |a ∩ b| of sorted distinct BIGINT arrays — the digest variant. */
    def sizeLong(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.SortedIntersect.sizeLong(a, b)
  }

  object Sketch {
    /** HLL register-array aggregate over 52-bit md5-derived hashes. */
    def hll(hash: Column, p: Int): Column =
      org.apache.spark.sql.graft.SketchExprs.hll(hash, p)
    /** Count–min counter-array aggregate over d per-item hashes with a
      * per-row weight (combine-then-sketch: feed (item, count) rows). */
    def cms(hashes: Column, weight: Column, d: Int, w: Int): Column =
      org.apache.spark.sql.graft.SketchExprs.cms(hashes, weight, d, w)
    /** k-minimum-values (bottom-k theta) aggregate. */
    def kmv(hash: Column, k: Int): Column =
      org.apache.spark.sql.graft.SketchExprs.kmv(hash, k)
  }

  object ZOrder {
    /** Morton/Z-order bit-interleave of two non-negative long columns
      * (codegen'd; x → even bits, y → odd bits). */
    def interleave(x: Column, y: Column): Column =
      org.apache.spark.sql.graft.ZOrderExprs.interleave(x, y)
  }

  object Materialized {
    /** Pin an expensive column as a once-per-row materialization point:
      * the optimizer will neither inline it into consumers nor substitute
      * it into predicates pushed below its Project. */
    def once(c: Column): Column =
      org.apache.spark.sql.graft.MaterializedFacade.materializeOnce(c)
  }
}
