package graft.queries

import graft.SparkSpec
import graft.sinks.ArtifactStore
import org.apache.spark.sql.functions._

/** Committed index artifacts: the restart contract. Serve entries'
  * oracles already gate load==build at the RESULT level (driver gate);
  * this spec pins the artifact CONTENT level — a reloaded artifact is
  * byte/row-identical to an independent rebuild — plus the commit
  * protocol's hygiene (no temp dirs left behind; absent artifacts are
  * built exactly once and then only read). */
class IndexArtifactSpec extends SparkSpec {

  private def listStore(): Seq[String] = {
    val dir = new java.io.File(ArtifactStore.root)
    if (!dir.exists()) Seq.empty
    else dir.listFiles().map(_.getName).toSeq
  }

  test("commit protocol: artifact appears whole under its key, no temp " +
    "dirs survive a commit") {
    import spark.implicits._
    val name = "spec_probe_v1"
    ArtifactStore.remove(spark, name)
    ArtifactStore.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), name)
    assert(ArtifactStore.exists(spark, name))
    assert(!listStore().exists(_.startsWith(s".tmp_$name")),
      "temp dir left behind")
    val re = ArtifactStore.load(spark, name).orderBy("k").collect()
    assert(re.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // immutable keys: a second commit of the same key leaves the
    // artifact readable and drops the loser's temp dir
    ArtifactStore.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), name)
    assert(ArtifactStore.load(spark, name).count() == 2)
    assert(!listStore().exists(_.startsWith(s".tmp_$name")))
    ArtifactStore.remove(spark, name)
  }

  test("every artifact family reloads content-identical to an " +
    "independent rebuild (PQ books, IVF centroids, SQ8 stats, LSH " +
    "bands, contamination Bloom)") {
    // run the build entries (each commits), then diff the committed
    // parquet against a fresh build-side DataFrame
    def diffEmpty(a: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    val pqBuilt = LlmPipeline.idxPqBuild(spark, sf)
    val pqName = LlmPipeline.embKey(spark, sf, "pq_books", "m16_k16_u2")
    assert(diffEmpty(ArtifactStore.load(spark, pqName), pqBuilt))

    val ivfBuilt = LlmPipeline.idxIvfBuild(spark, sf)
    val ivfName = LlmPipeline.embKey(spark, sf, "ivf_cents", "k8_u2")
    assert(diffEmpty(ArtifactStore.load(spark, ivfName), ivfBuilt))

    val sq8Built = LlmPipeline.idxSq8Build(spark, sf)
    val sq8Name = LlmPipeline.embKey(spark, sf, "sq8_stats", "b255")
    assert(diffEmpty(ArtifactStore.load(spark, sq8Name), sq8Built))

    val lshBuilt = LlmPipeline.idxLshBuild(spark, sf)
    val lshName = LlmPipeline.docKey(spark, sf, "lsh_bands", "w3_k64_b32_md5")
    assert(diffEmpty(ArtifactStore.load(spark, lshName), lshBuilt))

    LlmPipeline.idxBloomBuild(spark, sf)
    val blName = LlmPipeline.docKey(spark, sf, "contam_bloom", "g5")
    // the Bloom bitset itself must survive the round-trip byte-for-byte
    val persisted = ArtifactStore.load(spark, blName).head()
    val rebuilt = LlmPipeline.idxBloomServe(spark, sf) // load path
    assert(rebuilt.count() > 0)
    assert(persisted.getAs[Long]("bits") ==
      8L * persisted.getAs[Long]("items"))
    assert(persisted.getAs[Array[Byte]]("bf").nonEmpty)
  }

  test("tokenizer artifacts reload content-identical to an independent " +
    "rebuild (BPE merge table, WordPiece piece vocab, Unigram model)") {
    def diffEmpty(a: org.apache.spark.sql.DataFrame,
                  b: org.apache.spark.sql.DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    val bpeBuilt = LlmPipeline.tokBpeBuild(spark, sf)
    val bpeName = LlmPipeline.docKey(spark, sf, "bpe_merges", "m8")
    assert(diffEmpty(ArtifactStore.load(spark, bpeName), bpeBuilt))

    val wpBuilt = LlmPipeline.tokWpBuild(spark, sf)
    val wpName = LlmPipeline.docKey(spark, sf, "wp_pieces", "m8")
    assert(diffEmpty(ArtifactStore.load(spark, wpName), wpBuilt))

    val uniBuilt = LlmPipeline.tokUniBuild(spark, sf)
    val uniName =
      LlmPipeline.docKey(spark, sf, "uni_pieces", "s128_p6_w16_r2")
    assert(diffEmpty(ArtifactStore.load(spark, uniName), uniBuilt))
  }

  test("tokenizer serve entries answer from the loaded artifact and " +
    "match the corpus-width family query") {
    val a = LlmPipeline.tokBpeServe(spark, sf).collect().toSeq
    val b = LlmPipeline.textBpeEncode(spark, sf).collect().toSeq
    assert(a == b)
    val c = LlmPipeline.tokWpServe(spark, sf).collect().toSeq
    val d = LlmPipeline.textWordpieceCorpus(spark, sf).collect().toSeq
    assert(c == d)
    val e = LlmPipeline.tokUniServe(spark, sf).collect().toSeq
    val f = LlmPipeline.textUnigramCorpus(spark, sf).collect().toSeq
    assert(e == f)
  }

  test("serve entries answer from the loaded artifact: serving after a " +
    "simulated restart (artifact present, caches irrelevant) matches " +
    "the family query") {
    // idx_sq8_serve vs ann_sq8 — same query, one through the artifact
    val a = LlmPipeline.idxSq8Serve(spark, sf).collect().toSeq
    val b = LlmPipeline.annSq8(spark, sf).collect().toSeq
    assert(a == b)
    // idx_ivf_serve vs ann_ivf_kmeans
    val c = LlmPipeline.idxIvfServe(spark, sf).collect().toSeq
    val d = LlmPipeline.annIvfKmeans(spark, sf).collect().toSeq
    assert(c == d)
    // idx_lsh_serve vs dedup_minhash_lsh (probe of the stored index ==
    // the inline mining pipeline)
    val e = LlmPipeline.idxLshServe(spark, sf).collect().toSeq
    val f = LlmPipeline.dedupMinhashLsh(spark, sf).collect().toSeq
    assert(e == f)
  }

  test("idx_ivf_append: base centroids/postings commit once, the append " +
    "is an immutable delta segment, and a rerun re-commits nothing") {
    val (cut, centsKey, postKey, segKey) =
      LlmPipeline.ivfAppendKeys(spark, sf)
    Seq(centsKey, postKey, segKey).foreach(ArtifactStore.remove(spark, _))
    val first = LlmPipeline.idxIvfAppend(spark, sf).collect().toSeq
    Seq(centsKey, postKey, segKey).foreach(k =>
      assert(ArtifactStore.exists(spark, k), s"missing $k"))
    // segment contains exactly the appended ids; base postings none
    val segIds = ArtifactStore.load(spark, segKey)
      .select("vec_id").collect().map(_.getLong(0))
    assert(segIds.nonEmpty && segIds.forall(_ >= cut),
      "segment must hold only appended vectors")
    assert(ArtifactStore.load(spark, postKey)
      .select(max(col("vec_id"))).head().getLong(0) < cut,
      "base postings must hold only base vectors")
    // serve semantics: rerun reads committed artifacts, identical
    // result — witnessed by the part-file listing (fresh names per
    // Spark job), not mtimes (1s granularity; round-14 ADVICE)
    def parts = Seq(centsKey, postKey, segKey)
      .map(k => graft.SparkSpec.partListing(spark, k))
    val before = parts
    val second = LlmPipeline.idxIvfAppend(spark, sf).collect().toSeq
    assert(second == first)
    assert(parts == before, "append rerun re-committed an artifact")
    // the union serves the whole corpus exactly once
    assert(first.map(_.getLong(0)).distinct.length == first.length)
    assert(first.count(_.getBoolean(3)) == segIds.length)
  }

  test("idx_ivf_compact: compacted content equals base ∪ segments, and " +
    "post-compaction serving reads ONE artifact (base/segment removal " +
    "does not break it)") {
    val (_, centsKey, postKey, segKey) =
      LlmPipeline.ivfAppendKeys(spark, sf)
    val compKey = LlmPipeline.ivfCompactKey(spark, sf)
    ArtifactStore.remove(spark, compKey)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cid", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val first = LlmPipeline.idxIvfCompact(spark, sf)
    val got = rows(first)
    // union-equality against the committed parts it folded
    val want = rows(ArtifactStore.load(spark, postKey)) ++
      rows(ArtifactStore.load(spark, segKey))
    assert(got == want, "compacted content must equal base ∪ segments")
    // LSM read-path collapse: with the compacted artifact committed,
    // serving must touch NOTHING else — remove base + segment + even
    // the centroids and the entry still serves, without rebuilding them
    Seq(centsKey, postKey, segKey)
      .foreach(ArtifactStore.remove(spark, _))
    val served = rows(LlmPipeline.idxIvfCompact(spark, sf))
    assert(served == got, "post-compaction serve must read the artifact")
    assert(!ArtifactStore.exists(spark, postKey) &&
      !ArtifactStore.exists(spark, segKey) &&
      !ArtifactStore.exists(spark, centsKey),
      "serving after compaction rebuilt a pre-compaction artifact — " +
        "the read path did not collapse to one artifact")
    // restore the append family for later suites (cheap rebuild at sf)
    LlmPipeline.idxIvfAppend(spark, sf).count()
  }

  test("idx_ivf_compact: N segments fold to the same content as one " +
    "(compaction is a pure re-commit)") {
    val (cut, _, postKey, segKey) = LlmPipeline.ivfAppendKeys(spark, sf)
    LlmPipeline.idxIvfAppend(spark, sf).count() // ensure parts exist
    val postB = ArtifactStore.load(spark, postKey)
    val seg = ArtifactStore.load(spark, segKey)
    val mid = (cut + seg.agg(max(col("vec_id"))).head().getLong(0)) / 2
    val halves = Seq(seg.where(col("vec_id") <= mid),
      seg.where(col("vec_id") > mid))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "cid", "dist").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(rows(LlmPipeline.foldPostings(postB, halves)) ==
      rows(LlmPipeline.foldPostings(postB, Seq(seg))),
      "a 2-segment fold must equal the 1-segment fold")
    // overlap safety: folding a segment with ITSELF changes nothing
    assert(rows(LlmPipeline.foldPostings(postB, Seq(seg, seg))) ==
      rows(LlmPipeline.foldPostings(postB, Seq(seg))),
      "overlapping segments must fold to one row per vector")
  }

  test("idx_ivf_retract: takedown filters the committed postings and " +
    "NEVER retrains — centroids and postings untouched") {
    val (_, centsKey, postKey, segKey) =
      LlmPipeline.ivfAppendKeys(spark, sf)
    LlmPipeline.idxIvfAppend(spark, sf).count() // ensure family exists
    def parts = Seq(centsKey, postKey, segKey)
      .map(k => graft.SparkSpec.partListing(spark, k))
    val before = parts
    val got = LlmPipeline.idxIvfRetract(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(parts == before,
      "retraction touched a committed artifact — a takedown must be a " +
        "pure read-side predicate")
    val appended = LlmPipeline.idxIvfAppend(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == appended.filterNot(_._1 % 13 == 5),
      "retracted postings must equal the append output minus the slice")
    assert(got.size < appended.size, "the slice must be non-empty")
  }

  test("idx_ivf_drift: boundary both ways — uniform delta serves, " +
    "collapsed delta retrains, small-sample noise floor holds") {
    import spark.implicits._
    def postings(n: Int, cidOf: Int => Int, idBase: Long) =
      (0 until n).map(i =>
        (idBase + i, cidOf(i), 1000.0 + i % 7)).toDF("vec_id", "cid", "dist")
    val base = postings(4000, _ % 8, 0L)
    def decision(delta: org.apache.spark.sql.DataFrame) =
      LlmPipeline.ivfDriftFrom(spark, base, delta).collect()
        .find(_.getString(0) == "decision").get
    // identical shares at large n: TV = 0, threshold floors at 0.1
    val serve = decision(postings(2000, _ % 8, 100000L))
    assert(serve.getString(8) == "serve" && serve.getLong(6) == 0L)
    assert(serve.getLong(7) == 100000L,
      s"large-n threshold must floor at 0.1: ${serve.getLong(7)}")
    // a new content cluster: all delta mass on one cell → TV = 0.875
    val retrain = decision(postings(2000, _ => 0, 200000L))
    assert(retrain.getString(8) == "retrain" &&
      retrain.getLong(6) == 875000L, s"collapsed delta: $retrain")
    // small sample: threshold lifts to 0.75·√(8/50) = 0.3, so the
    // multinomial noise of a 50-vector uniform delta cannot retrain
    val small = decision(postings(50, _ % 8, 300000L))
    assert(small.getLong(7) == 300000L &&
      small.getString(8) == "serve", s"noise floor: $small")
    assert(LlmPipeline.ivfDriftThresholdMicro(8L, 50L) == 300000L)
    // degenerate sides (r15 ADVICE): no division runs — empty delta
    // short-circuits to one 'serve' decision row, empty base retrains
    val empty = Seq.empty[(Long, Int, Double)].toDF("vec_id", "cid", "dist")
    val ed = LlmPipeline.ivfDriftFrom(spark, base, empty).collect()
    assert(ed.length == 1 && ed.head.getString(0) == "decision" &&
      ed.head.getString(8) == "serve" && ed.head.getLong(6) == 0L,
      s"empty delta: ${ed.toSeq}")
    val eb = LlmPipeline.ivfDriftFrom(spark, empty,
      postings(50, _ % 8, 400000L)).collect()
    assert(eb.length == 1 && eb.head.getString(8) == "retrain",
      s"empty base postings must retrain: ${eb.toSeq}")
  }

  test("idx_ivf_retrain: commits the successor family on the serve " +
    "entries' keys, leaves the append family untouched, and the " +
    "migration report covers every vector") {
    val s = spark
    val (_, centsKeyOld, postKeyOld, segKey) =
      LlmPipeline.ivfAppendKeys(s, sf)
    LlmPipeline.idxIvfAppend(s, sf).count() // stage the append family
    val oldKeys = Seq(centsKeyOld, postKeyOld, segKey)
    def oldParts = oldKeys.map(k => graft.SparkSpec.partListing(s, k))
    val before = oldParts
    val report = LlmPipeline.idxIvfRetrain(s, sf).collect()
    assert(oldParts == before,
      "the retrain event touched the append family — it must read it, " +
        "never rewrite it")
    // the migration report accounts for the whole corpus, and the
    // refreshed quantizer fits at least as well in total
    val n = report.map(_.getAs[Long]("n")).sum
    assert(n == graft.Tables.embeddings(s, sf).count(),
      s"migration rows must cover every vector: $n")
    assert(report.map(_.getAs[Long]("err_new")).sum <=
      report.map(_.getAs[Long]("err_old")).sum,
      "retraining on the full corpus must not worsen total quantization error")
    // succession: the committed centroids ARE the build/serve family's
    // key, so idx_ivf_serve picks up the refreshed quantizer with no
    // rebuild — and serving needs NOTHING from the append family
    ArtifactStore.resetTouched()
    LlmPipeline.idxIvfServe(s, sf).count()
    val servedRoots = ArtifactStore.touchedKeys
    assert(oldKeys.forall(k => !servedRoots.contains(k)),
      "post-retrain serving consulted the superseded append family — " +
        "it is GC-dead once the retrain report is read")
  }

  test("the control loop CLOSES for the index: a drifted delta " +
    "retrains, and the monitor re-anchored on the retrained " +
    "(grown-corpus) postings serves the next grown-distributed append") {
    import spark.implicits._
    def postings(n: Int, cidOf: Int => Int, idBase: Long) =
      (0 until n).map(i =>
        (idBase + i, cidOf(i), 1000.0 + i % 7)).toDF("vec_id", "cid", "dist")
    def decision(base: org.apache.spark.sql.DataFrame,
                 delta: org.apache.spark.sql.DataFrame) =
      LlmPipeline.ivfDriftFrom(spark, base, delta).collect()
        .find(_.getString(0) == "decision").get
    val base = postings(4000, _ % 8, 0L)
    // pre-retrain: a new content cluster lands all its mass on cell 0
    val delta1 = postings(2000, _ => 0, 100000L)
    assert(decision(base, delta1).getString(8) == "retrain")
    // actuation (what idx_ivf_retrain commits): the refreshed
    // quantizer's postings cover base ∪ delta — cell shares re-anchor
    // on the grown corpus (cell 0 now carries 2500/6000)
    val grown = base.unionByName(delta1)
    // post-retrain: the next append drawn from the GROWN distribution
    // (same shares at a tenth the size: 250 on cell 0, 50 elsewhere)
    val delta2 = postings(600, i => if (i < 250) 0 else 1 + i % 7, 200000L)
    val post = decision(grown, delta2)
    assert(post.getString(8) == "serve",
      s"the retrained postings must serve a grown-distributed append: $post")
    assert(post.getLong(6) == 0L,
      "identical cell shares must give exactly zero TV")
    // while the STALE base postings would still (correctly) page on it:
    // TV = ½(|250/600 − ⅛| + 7·|50/600 − ⅛|) ≈ 0.29 over floor 0.1
    val stale = decision(base, delta2)
    assert(stale.getString(8) == "retrain", s"stale profile: $stale")
  }

  test("foldPostings prefers the newest segment deterministically when " +
    "the immutability contract is violated (last-writer-wins)") {
    import spark.implicits._
    val base = Seq((1L, 0, 10.0), (2L, 1, 20.0)).toDF("vec_id", "cid", "dist")
    // a stale segment and its same-size rewrite disagree on vec_id 2
    val stale = Seq((2L, 1, 20.0), (3L, 2, 30.0)).toDF("vec_id", "cid", "dist")
    val rewrite = Seq((2L, 5, 99.0), (3L, 2, 30.0)).toDF("vec_id", "cid", "dist")
    val folded = LlmPipeline.foldPostings(base, Seq(stale, rewrite))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    assert(folded(2L) == ((5, 99.0)),
      "the LAST listed segment must win for a rewritten vec_id")
    assert(folded(1L) == ((0, 10.0)) && folded(3L) == ((2, 30.0)))
  }

  test("segment discovery for the fold is COMMIT-time-ordered: a later " +
    "commit whose fingerprint name sorts FIRST still wins (name order " +
    "would hand the conflict to the stale segment)") {
    val s = spark
    import s.implicits._
    val privRoot = java.nio.file.Files
      .createTempDirectory("graft_seg_order").toString
    sys.props.put("graft.artifact.dir", privRoot)
    try {
      // stale committed first under a name that sorts LAST; the
      // rewrite lands second under a name that sorts FIRST
      val stale = Seq((2L, 1, 20.0), (3L, 2, 30.0))
        .toDF("vec_id", "cid", "dist")
      val rewrite = Seq((2L, 5, 99.0), (3L, 2, 30.0))
        .toDF("vec_id", "cid", "dist")
      ArtifactStore.commit(stale, "ord_seg_n99_hzz")
      Thread.sleep(1100) // HDFS-API mtime granularity is 1s on some FS
      ArtifactStore.commit(rewrite, "ord_seg_n100_haa")
      assert(ArtifactStore.list(s, "ord_seg_").head == "ord_seg_n100_haa",
        "fixture must make name order disagree with commit order")
      val byTime = ArtifactStore.listByCommitTime(s, "ord_seg_")
      assert(byTime == Seq("ord_seg_n99_hzz", "ord_seg_n100_haa"))
      val base = Seq((1L, 0, 10.0)).toDF("vec_id", "cid", "dist")
      val folded = LlmPipeline.foldPostings(base,
          byTime.map(ArtifactStore.load(s, _)))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(folded(2L) == 5,
        "the later-committed rewrite must win regardless of name order")
    } finally {
      sys.props.remove("graft.artifact.dir")
      ArtifactStore.resetTouched()
    }
  }
}
