package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The remote-filesystem fingerprint cache contract (round-14 ask #1):
  * `LlmPipeline.fileSig` derives the table signature through the Hadoop
  * FileSystem API, so scheme-qualified URIs — the shape every s3a/hdfs
  * deployment hands in — get the same cached-fingerprint path as bare
  * local paths. Pinned here with `file:` URIs (RawLocalFileSystem, the
  * prescribed non-local fake: same code path as any remote scheme —
  * Path.getFileSystem + recursive listStatus — without needing a
  * cluster):
  *
  *  (a) unchanged listing → identical signature → cache HIT (the
  *      by-name corpus pass is never evaluated twice),
  *  (b) a rewrite → new part-file names → new signature → recompute,
  *  (c) unreachable filesystem / missing path → None (honest bypass).
  */
class FileSigSpec extends SparkSpec {

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  test("scheme-qualified file: URI gets a stable signature that changes " +
    "on rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sig_")
    val uri = s"file://$tmp/documents.parquet"
    writeDocs(uri, Seq((1L, "alpha"), (2L, "beta")))
    val sig1 = LlmPipeline.fileSig(spark, uri)
    assert(sig1.isDefined, "file: URI must produce a signature")
    assert(sig1.get.contains("file:"), "signature paths are qualified")
    assert(LlmPipeline.fileSig(spark, uri) == sig1,
      "unchanged listing must resign identically")
    writeDocs(uri, Seq((1L, "alpha"), (2L, "gamma")))
    val sig2 = LlmPipeline.fileSig(spark, uri)
    assert(sig2.isDefined && sig2 != sig1,
      "a rewrite must change the signature (fresh part-file names)")
  }

  test("fingerprintCached: cache hit on unchanged listing (corpus pass " +
    "not re-evaluated), key change on rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigc_")
    val uri = s"file://$tmp/documents.parquet"
    writeDocs(uri, Seq((1L, "alpha"), (2L, "beta")))
    def corpus = spark.read.parquet(uri)
    val fp1 = LlmPipeline.fingerprintCached(spark, uri,
      Seq("doc_id", "text"))(corpus)
    assert(fp1._1 == 2L, "fingerprint counts the corpus")
    // unchanged listing: the by-name build must NOT run again
    val fp1b = LlmPipeline.fingerprintCached(spark, uri,
      Seq("doc_id", "text"))(sys.error("cache miss: corpus re-scanned"))
    assert(fp1b == fp1)
    // rewrite with different content: new signature, honest recompute
    writeDocs(uri, Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val fp2 = LlmPipeline.fingerprintCached(spark, uri,
      Seq("doc_id", "text"))(corpus)
    assert(fp2._1 == 3L && fp2 != fp1,
      "rewritten table must produce a fresh fingerprint")
  }

  test("missing path and unreachable scheme degrade to None (the " +
    "bypass-and-hash path), never a degenerate signature") {
    assert(LlmPipeline.fileSig(spark,
      "/nonexistent/graft/no_such_table.parquet").isEmpty)
    // unroutable LITERAL address (not a hostname): wildcard DNS
    // resolvers would otherwise answer anything and stall the test in
    // Hadoop's ipc connect-retry loop
    assert(LlmPipeline.fileSig(spark,
      "hdfs://127.0.0.1:1/t.parquet").isEmpty)
  }

  test("docKey serves artifact keys for scheme-qualified table dirs " +
    "(the end-to-end consumer of the Hadoop signature)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigd_")
    val uri = s"file://$tmp"
    graft.Tables.documents(spark, sf).coalesce(1)
      .write.mode("overwrite").parquet(s"$uri/documents.parquet")
    val k1 = LlmPipeline.docKey(spark, uri, "tok_bpe", "m8")
    // same CONTENT under a different path: fingerprint (and thus the
    // artifact key) must agree — two paths holding identical data
    // share artifacts by design
    val k0 = LlmPipeline.docKey(spark, sf, "tok_bpe", "m8")
    assert(k1 == k0, s"content-derived keys must agree: $k1 vs $k0")
  }
}
