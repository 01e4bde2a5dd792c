package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB shape:
  *
  *  - exact: group on a cryptographic digest of the (normalized) content —
  *    the shuffle ships 32-byte keys + ids, never the documents.
  *  - MinHash+LSH: per-doc signature (narrow map, kernel tier, no shuffle)
  *    → band keys → the ONLY shuffle is the band-bucket self-join on
  *    (band, key) — candidates are then verified with exact Jaccard.
  *    Pairwise compare never materializes beyond hash-bucket collisions.
  *  - SimHash: 64-bit signature; banding on 4×16-bit chunks finds all pairs
  *    within Hamming distance 3 (pigeonhole: ≤3 differing bits leave ≥1 of
  *    4 chunks intact); verify with bit_count(xor)≤3.
  *  - blocked exact Jaccard: the small-scale oracle baseline (quadratic in
  *    block size — bench-only; MinHash is the scale path).
  *
  * All hashing is deterministic (splitmix64 over a polynomial string hash),
  * no dependency on Spark's internal hash or RNG.
  */
object Dedup extends Serializable {

  // ---- deterministic hashing ----
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def hashString(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    splitmix64(h)
  }

  /** Word w-shingles of a whitespace-tokenized text. */
  def shingles(text: String, w: Int): Array[Long] = {
    val toks = text.split("\\s+")
    if (toks.length < w) Array(hashString(toks.mkString(" ")))
    else Array.tabulate(toks.length - w + 1) { i =>
      hashString(toks.slice(i, i + w).mkString(" "))
    }
  }

  /** k-permutation MinHash signature over shingle hashes. */
  def minhashSignature(sh: Array[Long], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < k) {
        val h = splitmix64(sh(i) ^ splitmix64(j + 1L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over token hashes. */
  def simhash64(text: String): Long = {
    val counts = new Array[Int](64)
    text.split("\\s+").foreach { t =>
      val h = hashString(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  final case class DocSig(doc_id: Long, sig: Array[Long])
  final case class DocSim(doc_id: Long, simhash: Long)

  /** MinHash signatures for a documents table (kernel tier: narrow map). */
  def minhashSignatures(docs: Dataset[(Long, String)], w: Int, k: Int)
      : Dataset[DocSig] = {
    import docs.sparkSession.implicits._
    docs.map { case (id, text) => DocSig(id, minhashSignature(shingles(text, w), k)) }
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k),
    * self-join on (band, bandKey). Returns distinct (a,b), a<b. */
  def lshCandidates(sigs: Dataset[DocSig], bands: Int, rowsPerBand: Int)
      : DataFrame = {
    import sigs.sparkSession.implicits._
    val banded = sigs.flatMap { ds =>
      (0 until bands).iterator.map { b =>
        val slice = ds.sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        val key = slice.foldLeft(17L)((acc, x) => splitmix64(acc ^ x))
        (ds.doc_id, b, key)
      }
    }.toDF("doc_id", "band", "key")
    val l = banded.select(col("doc_id").as("a"), col("band"), col("key"))
    val r = banded.select(col("doc_id").as("b"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact word-set Jaccard between two token-array columns (column tier). */
  def wordSetJaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    size(array_intersect(ad, bd)).cast("double") /
      size(array_union(ad, bd)).cast("double")
  }

  /** Exact shingle Jaccard computed in the kernel tier. */
  def shingleJaccard(t1: String, t2: String, w: Int): Double = {
    val s1 = shingles(t1, w).toSet
    val s2 = shingles(t2, w).toSet
    if (s1.isEmpty && s2.isEmpty) 1.0
    else s1.intersect(s2).size.toDouble / s1.union(s2).size.toDouble
  }

  /** Full MinHash-LSH near-dup pipeline: signatures → banded bucket join →
    * exact-Jaccard verification join (ships only candidate texts). */
  def minhashNearDups(s: SparkSession, docs: DataFrame, w: Int, k: Int,
                      bands: Int, threshold: Double): DataFrame = {
    import s.implicits._
    val typed = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
    val sigs = minhashSignatures(typed, w, k)
    val cand = lshCandidates(sigs, bands, k / bands)
    val txt = docs.select(col("doc_id"), col("text"))
    val withTexts = cand
      .join(txt.select(col("doc_id").as("a"), col("text").as("ta")), Seq("a"))
      .join(txt.select(col("doc_id").as("b"), col("text").as("tb")), Seq("b"))
      .as[(Long, Long, String, String)]
    withTexts.map { case (b, a, ta, tb) =>
      (a, b, Dedup.shingleJaccard(ta, tb, w))
    }.toDF("a", "b", "jaccard")
      .where(col("jaccard") >= threshold)
      .orderBy("a", "b")
  }

  /** SimHash near-dup: signature → 4×16-bit chunk banding → verify
    * Hamming ≤ maxDist. Finds ALL pairs with distance ≤ 3 (pigeonhole). */
  def simhashNearDups(s: SparkSession, docs: DataFrame, maxDist: Int)
      : DataFrame = {
    import s.implicits._
    val sigs = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => DocSim(id, simhash64(t)) }
    val banded = sigs.flatMap { ds =>
      (0 until 4).iterator.map(b => (ds.doc_id, ds.simhash, b, (ds.simhash >>> (16 * b)) & 0xFFFFL))
    }.toDF("doc_id", "sim", "band", "key")
    val l = banded.select(col("doc_id").as("a"), col("sim").as("sim_a"),
      col("band"), col("key"))
    val r = banded.select(col("doc_id").as("b"), col("sim").as("sim_b"),
      col("band"), col("key"))
    l.join(r, Seq("band", "key")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
      .orderBy("a", "b")
  }
}
