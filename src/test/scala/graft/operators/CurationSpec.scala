package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "totally different words with no overlap at all here"),
    (5L, "")
  ).toDF("doc_id", "text")

  // ---------------- decontamination ----------------

  test("decontamination flags docs sharing an n-gram with the benchmark") {
    val bench = docs.filter($"doc_id" === 1L)
    val train = docs.filter($"doc_id" =!= 1L)
    val bad = Curation.contaminatedIds(train, bench, "text", "doc_id", n = 5)
      .as[Long].collect().toSet
    assert(bad == Set(2L)) // only the duplicate shares 5-grams
    val kept = Curation.decontaminate(train, bench, "text", "doc_id", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("decontamination with n longer than every doc flags nothing") {
    val bench = docs.filter($"doc_id" === 1L)
    val bad = Curation.contaminatedIds(docs, bench, "text", "doc_id", n = 50)
    assert(bad.count() == 0)
  }

  // ---------------- per-key top-K ----------------

  test("two-phase topKPerKey equals the plain window answer") {
    val rows = (1 to 200).map(i => (i.toLong, s"k${i % 5}", (i * 37 % 100).toDouble))
    val df = rows.toDF("id", "key", "score")
    val expected = df
      .withColumn("rk", row_number().over(
        Window.partitionBy($"key").orderBy($"score".desc, $"id")))
      .filter($"rk" <= 7).select("id").as[Long].collect().toSet
    val got = Curation.topKPerKey(df, "key", Seq($"score".desc, $"id"), k = 7, salts = 4)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("topKPerKey keeps all rows when k exceeds the group size") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).toDF("id", "key", "score")
    assert(Curation.topKPerKey(df, "key", Seq($"score".desc, $"id"), k = 10).count() == 3)
  }

  // ---------------- chunking ----------------

  test("chunk covers every word with the declared size/stride geometry") {
    val d = Seq((1L, (1 to 80).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = Curation.chunk(d, "text", "doc_id", size = 32, stride = 24)
      .orderBy("chunk_ix")
      .collect()
    // 80 words, stride 24 -> chunk starts at 0, 24, 48, 72
    assert(chunks.length == 4)
    assert(chunks.map(_.getAs[Int]("n_words")).toSeq == Seq(32, 32, 32, 8))
    val first = chunks.head.getAs[String]("chunk_text").split(" ")
    assert(first.head == "w1" && first.last == "w32")
    val last = chunks.last.getAs[String]("chunk_text").split(" ")
    assert(last.head == "w73" && last.last == "w80")
  }

  test("chunk of a short doc is a single full-coverage chunk; empty docs drop") {
    val d = Seq((1L, "a b c"), (2L, "")).toDF("doc_id", "text")
    val chunks = Curation.chunk(d, "text", "doc_id", size = 32, stride = 24).collect()
    assert(chunks.length == 1)
    assert(chunks.head.getAs[Long]("id") == 1L)
    assert(chunks.head.getAs[Int]("n_words") == 3)
    assert(chunks.head.getAs[String]("chunk_text") == "a b c")
  }

  // ---------------- sequence packing ----------------

  test("packSequences cuts the concatenated stream exactly every budget tokens") {
    val d = (1 to 20).map(i => (i.toLong, 10L)).toDF("doc_id", "nt")
    val packed = Curation.packSequences(d, "doc_id", $"nt", budget = 25, buckets = 1)
      .orderBy("id").collect()
    // One bucket, docs of 10 tokens: starts 0,10,20,30,... pack = start/25
    val expected = (0 until 20).map(i => (i * 10L / 25, i * 10L % 25))
    assert(packed.map(r => (r.getAs[Long]("pack_ix"), r.getAs[Long]("pack_off"))).toSeq
      == expected)
  }

  test("packSequences buckets partition the corpus and pack independently") {
    val d = (1 to 100).map(i => (i.toLong, 5L)).toDF("doc_id", "nt")
    val packed = Curation.packSequences(d, "doc_id", $"nt", budget = 50, buckets = 4)
    assert(packed.select("bucket").distinct().count() == 4)
    assert(packed.count() == 100)
    // within each bucket offsets restart from 0 in id order
    val firstPerBucket = packed.withColumn("rk",
        row_number().over(Window.partitionBy($"bucket").orderBy($"id")))
      .filter($"rk" === 1)
    assert(firstPerBucket.filter($"pack_ix" =!= 0 || $"pack_off" =!= 0).count() == 0)
  }

  // ---------------- semantic dedup ----------------

  test("semanticDedup finds planted within-cell duplicates and no cross-noise pairs") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 40).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))
    }
    // plant exact duplicates of vectors 1 and 2 under ids 101, 102
    val planted = base.take(2).map { case (id, v) => (id + 100, v) }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Curation.semanticDedup(df, threshold = 0.999, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L), (2L, 102L)))
  }

  test("splitCells re-quantizes oversized cells under adversarially collapsed embeddings") {
    // Every vector crowds into a narrow cone around e0 (norm-dominant first
    // component, small jitter elsewhere) so the flat quantizer collapses: with
    // nlist=4 most of the corpus lands in one or two hot cells.
    val rnd = new scala.util.Random(11)
    val df = (1 to 240).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.05f)
      v(0) = 1.0f + rnd.nextGaussian().toFloat * 0.01f
      (i.toLong, v)
    }.toDF("vec_id", "embedding").select($"vec_id".alias("id"), $"embedding".alias("v"))

    val flat = Curation.splitCells(df, nlist = 4, lloydIters = 0,
      maxCellSize = 0, depth = 0)
    val flatMax = flat.groupBy("cid").count().agg(max("count")).head().getLong(0)
    assert(flatMax > 60, s"fixture must collapse the flat quantizer (max cell $flatMax)")

    val split = Curation.splitCells(df, nlist = 4, lloydIters = 0,
      maxCellSize = 60, depth = 4)
    assert(split.count() == 240) // re-split is a partition, not a filter
    val sizes = split.groupBy("cid").count().collect().map(_.getLong(1))
    assert(sizes.max <= 60, s"oversized cell survived the re-split: max ${sizes.max}")
  }

  test("semanticDedup with a cell cap still finds planted duplicates") {
    // Identical vectors share an argmax at EVERY split level, so planted exact
    // duplicates stay co-located no matter how deep the re-split goes.
    val rnd = new scala.util.Random(13)
    val base = (1 to 120).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.05f)
      v(0) = 1.0f
      (i.toLong, v)
    }
    val planted = base.take(3).map { case (id, v) => (id + 1000, v) }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Curation.semanticDedup(df, threshold = 0.9999, nlist = 4,
        maxCellSize = 30, maxSplitDepth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 1001L), (2L, 1002L), (3L, 1003L)).subsetOf(pairs))
  }

  // ---------------- incremental dedup ----------------

  test("incrementalDedup drops index hits and within-batch duplicates") {
    val newDocs = Seq(
      (10L, "alpha beta gamma"), // fingerprint in the index -> dropped
      (11L, "fresh new content"),
      (12L, "fresh new content"), // within-batch dup of 11 -> dropped
      (13L, "another doc")
    ).toDF("doc_id", "text")
    val index = Seq("alpha beta gamma").toDF("t")
      .select(TextAnalysis.fingerprint($"t").alias("fp"))
    val kept = Curation.incrementalDedup(newDocs, index, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L))
  }

  test("incrementalDedupBloom equals the exact path on a larger randomized batch") {
    val rnd = new scala.util.Random(7)
    def sentence(i: Int) = s"document body $i " + rnd.alphanumeric.take(20).mkString
    val corpus = (1 to 300).map(i => (i.toLong, sentence(i)))
    val batch = // 100 overlapping with the index, 100 fresh, plus in-batch dups
      corpus.take(100).map { case (id, t) => (id + 10000, t) } ++
        (301 to 400).map(i => (i.toLong, sentence(i))) ++
        Seq((20001L, "batch dup body"), (20002L, "batch dup body"))
    val newDocs = batch.toDF("doc_id", "text")
    val index = corpus.take(200).map(_._2).toDF("t")
      .select(TextAnalysis.fingerprint($"t").alias("fp"))
    val exact = Curation.incrementalDedup(newDocs, index, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // a high fpp forces real false positives through the resolving join
    for (fpp <- Seq(0.3, 0.01)) {
      val bloomed = Curation.incrementalDedupBloom(
          newDocs, index, "text", "doc_id", fpp = fpp)
        .select("doc_id").as[Long].collect().sorted
      assert(bloomed.sameElements(exact), s"fpp=$fpp diverged from exact path")
    }
  }

  // ---------------- data selection ----------------

  test("seedAffinityScores rank seed-like documents above unrelated ones") {
    val seed = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "the dog sat on the rug")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on a chair"), // shares bigrams with the seed
      (2L, "quantum flux capacitors emit tachyon bursts"), // none
      (3L, "the cat sat on the mat today") // nearly the seed itself
    ).toDF("doc_id", "text")
    val out = Curation.seedAffinityScores(corpus, seed, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L)._2 > out(1L)._2 && out(1L)._2 > out(2L)._2)
    assert(out(2L)._2 == 0L)
    assert(out(1L)._1 == 5L) // 6 words -> 5 bigrams, all distinct
  }

  test("seedLmSurprisal ranks gibberish above seed-like text (per-gram mean)") {
    val seed = (1 to 30).map(i =>
      (1000L + i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // in-distribution
      (2L, "zxqv wpln kjhg bnmr tyu qsd fgh jkl poi"), // gibberish: all grams OOV
      (3L, "the quick brown fox sat under a green tree")) // shared head, novel tail
      .toDF("id", "text")
    val got = Curation.seedLmSurprisal(corpus, seed, "text", "id",
      n = 2, buckets = 1 << 20)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("surprisal_q").toDouble / r.getAs[Long]("n_grams"))).toMap
    assert(got(1) < got(2), s"seed-like must beat gibberish: $got")
    assert(got(1) < got(3) && got(3) < got(2),
      s"partially-novel text must land between: $got")
    // OOV grams cost ~log2(V) bits under add-one smoothing
    assert(got(2) >= 19.0, s"fully-OOV mean surprisal should be ~20, got ${got(2)}")
  }

  // ---------------- weighted mixing ----------------

  test("weightedMix keeps rate-proportional nested samples per key") {
    val rows = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("id", "key")
    def sample(ra: Double, rb: Double): Set[Long] =
      Curation.weightedMix(df, "key", "id",
        Seq(("a", ra), ("b", rb)).toDF("key", "rate"))
        .select("id").as[Long].collect().toSet
    val s1 = sample(0.3, 0.8)
    val aKept = s1.count(_ % 2 == 0) / 1000.0
    val bKept = s1.count(_ % 2 == 1) / 1000.0
    assert(math.abs(aKept - 0.3) < 0.08, f"rate-a off: $aKept%.2f")
    assert(math.abs(bKept - 0.8) < 0.08, f"rate-b off: $bKept%.2f")
    // raising a rate strictly grows the sample (nested property), and reruns agree
    assert(s1.subsetOf(sample(0.5, 0.9)))
    assert(sample(0.3, 0.8) == s1)
  }

  test("temperatureMix downsamples the head domain to ~scale*sqrt(n) and keeps tails whole") {
    // head: 1600 docs; tails: 4 domains of 100 docs each
    val rows = (1 to 2000).map { i =>
      (i.toLong, if (i <= 1600) "head" else s"tail${i % 4}")
    }
    val df = rows.toDF("id", "domain")
    val kept = Curation.temperatureMix(df, "domain", "id", scale = 8.0)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("domain")))
    // tail rate = min(1, 8/sqrt(100)) = 0.8; head rate = 8/sqrt(1600) = 0.2
    val headKept = kept.count(_._2 == "head") / 1600.0
    val tailKept = kept.count(_._2 != "head") / 400.0
    assert(math.abs(headKept - 0.2) < 0.05, f"head rate off: $headKept%.2f")
    assert(math.abs(tailKept - 0.8) < 0.08, f"tail rate off: $tailKept%.2f")
    // a domain small enough to cap at rate 1.0 survives whole
    val tiny = (1 to 20).map(i => (10000L + i, "tiny")).toDF("id", "domain")
    val both = df.union(tiny)
    val keptTiny = Curation.temperatureMix(both, "domain", "id", scale = 8.0)
      .filter($"domain" === "tiny").count()
    assert(keptTiny == 20, s"tiny domain must cap at rate 1.0, kept $keptTiny/20")
  }

  // ---------------- connected components ----------------

  /** Reference union-find, for checking the distributed star algorithm. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  // exercise BOTH execution paths: the driver union-find fast path (default) and
  // the distributed star rounds (localSolveMax = 0 forces them)
  private def ccResult(edges: Seq[(Long, Long)], localSolveMax: Long = 1000000L): Map[Long, Long] =
    Curation.connectedComponents(edges.toDF("id_a", "id_b"), localSolveMax = localSolveMax)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("connectedComponents matches union-find on a random graph (both paths)") {
    val rnd = new scala.util.Random(11)
    // sparse random graph over non-contiguous ids -> many components
    val edges = Seq.fill(120)((rnd.nextInt(100) * 7L + 3, rnd.nextInt(100) * 7L + 3))
      .filter { case (a, b) => a != b }
    assert(ccResult(edges) == unionFind(edges))
    assert(ccResult(edges, localSolveMax = 0) == unionFind(edges),
      "distributed star rounds must agree with the local fast path")
  }

  test("connectedComponents collapses a long chain (worst case for propagation)") {
    val chain = (0L until 60L).map(i => (i, i + 1))
    for (cap <- Seq(1000000L, 0L)) {
      val got = ccResult(chain, localSolveMax = cap)
      assert(got.keySet == (0L to 60L).toSet)
      assert(got.values.toSet == Set(0L))
    }
  }

  test("connectedComponents handles duplicate, reversed, and self edges") {
    val edges = Seq((5L, 2L), (2L, 5L), (5L, 5L), (2L, 5L), (9L, 9L), (7L, 8L))
    // 9's only edge is a self loop -> it never appears in a pair with another node
    assert(ccResult(edges) == Map(2L -> 2L, 5L -> 2L, 7L -> 7L, 8L -> 7L))
  }

  test("connectedComponents of an empty pair set is empty") {
    assert(ccResult(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("connectedComponents(reliable = true) iterates through a reliable checkpoint dir") {
    // Before any dir is set (setCheckpointDir is one-way), the reliable path must
    // fail fast instead of dying mid-iteration on the first checkpoint().
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Curation.connectedComponents(Seq((1L, 2L)).toDF("a", "b"),
          reliable = true, localSolveMax = 0)
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val edges = ((0L until 20L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
        .toDF("id_a", "id_b")
      // localSolveMax = 0: the reliable-checkpoint behavior belongs to the
      // DISTRIBUTED star rounds; the small-graph fast path never checkpoints
      val got = Curation.connectedComponents(edges, reliable = true, localSolveMax = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == ((0L to 20L).map(_ -> 0L) ++ Seq(100L -> 100L, 101L -> 100L)).toMap)
      // the reliable path must actually have written RDD checkpoint data
      val written = dir.toFile.listFiles
      assert(written != null && written.nonEmpty)
    } finally {
      val del = java.nio.file.Files.walk(dir)
      try del.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally del.close()
    }
  }

  test("connectedComponents works over string ids (lexicographic minimum labels)") {
    val pairs = Seq(("docB", "docA"), ("docC", "docB"), ("x", "y"))
      .toDF("id_a", "id_b")
    for (cap <- Seq(1000000L, 0L)) {
      val comp = Curation.connectedComponents(pairs, localSolveMax = cap)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(comp == Map("docA" -> "docA", "docB" -> "docA", "docC" -> "docA",
        "x" -> "x", "y" -> "x"))
    }
  }

  // ---------------- line-level boilerplate dedup ----------------

  test("dedupLines drops cross-document boilerplate lines and rebuilds text in order") {
    val d = Seq(
      (1L, "unique first line\nsubscribe now\nunique last line"),
      (2L, "another doc body\nsubscribe now"),
      (3L, "subscribe now\nthird doc text\nmore third doc"),
      (4L, "subscribe now") // all-boilerplate doc drops out entirely
    ).toDF("doc_id", "text")
    val out = Curation.dedupLines(d, "text", "doc_id", minDocFreq = 3)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out(0).getAs[String]("cleaned") == "unique first line\nunique last line")
    assert(out(0).getAs[Long]("n_lines") == 2L)
    assert(out(1).getAs[String]("cleaned") == "another doc body")
    assert(out(2).getAs[String]("cleaned") == "third doc text\nmore third doc")
  }

  test("dedupLines counts a line repeated within one doc once toward doc frequency") {
    val d = Seq(
      (1L, "dup line\ndup line\nbody one"),
      (2L, "body two")
    ).toDF("doc_id", "text")
    // "dup line" appears twice in doc 1 but in only ONE document -> kept at df>=2
    val out = Curation.dedupLines(d, "text", "doc_id", minDocFreq = 2)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("cleaned") == "dup line\ndup line\nbody one")
  }

  // ---------------- PII redaction ----------------

  test("redactPii replaces emails, IPs, and phones and counts each type") {
    val d = Seq(
      (1L, "mail me at jane.doe+x@mail.example.org from 192.168.0.1 or 555-1234"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.net and ips 10.0.0.1 8.8.8.8")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(d, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_emails") == 1)
    assert(out(0).getAs[Int]("n_ips") == 1)
    assert(out(0).getAs[Int]("n_phones") == 1)
    assert(out(0).getAs[String]("redacted")
      == "mail me at <EMAIL> from <IP> or <PHONE>")
    assert(out(1).getAs[String]("redacted") == "no pii here at all")
    assert(out(2).getAs[Int]("n_emails") == 2 && out(2).getAs[Int]("n_ips") == 2)
  }

  test("curriculum bins at the boundaries and the schedule key is id-stable") {
    val d = Seq((1L, 10.0), (2L, 32.0), (3L, 55.9), (4L, 56.0), (5L, 99.0))
      .toDF("doc_id", "difficulty")
    val out = Curation.curriculum(d, col("difficulty"), "doc_id", Seq(32.0, 56.0, 76.0))
      .orderBy("doc_id").collect()
    // boundary values land in the HIGHER bin (>=), just below stays lower
    assert(out.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1, 1, 2, 3))
    val again = Curation.curriculum(d, col("difficulty"), "doc_id", Seq(32.0, 56.0, 76.0))
      .orderBy("doc_id").collect().map(_.getAs[Long]("sched")).toSeq
    assert(out.map(_.getAs[Long]("sched")).toSeq == again, "sched key must be deterministic")
    assert(intercept[IllegalArgumentException] {
      Curation.curriculum(d, col("difficulty"), "doc_id", Seq(56.0, 32.0))
    }.getMessage.contains("ascending"))
  }

  test("embedding decontamination drops exact and near benchmark copies, keeps the rest") {
    def unit(seed: Int): Seq[Float] = {
      // deterministic pseudo-random unit vector (no Math.random in tests either)
      val raw = (0 until 8).map(j => math.sin(seed * 31 + j * 7).toFloat)
      val n = math.sqrt(raw.map(x => x * x).sum).toFloat
      raw.map(_ / n)
    }
    def nudge(v: Seq[Float]): Seq[Float] = { // tiny rotation: cosine stays ~0.999
      val m = v.updated(0, v.head + 0.01f)
      val n = math.sqrt(m.map(x => x * x).sum).toFloat
      m.map(_ / n)
    }
    val bench = Seq((100L, unit(1)), (101L, unit(2))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, unit(1)),        // exact copy of bench 100
      (2L, nudge(unit(2))), // near copy of bench 101
      (3L, unit(9)), (4L, unit(17)), (5L, unit(23))
    ).toDF("vec_id", "embedding")
    val kept = Curation.decontaminateByEmbedding(corpus, bench, threshold = 0.95, dim = 8)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(!kept.contains(1L), "exact benchmark copy must be dropped")
    assert(!kept.contains(2L), "near benchmark copy must be dropped")
    assert(kept.nonEmpty && kept.forall(Seq(3L, 4L, 5L).contains),
      s"unrelated vectors should survive, got $kept")
  }

  test("quality classifier votes separate seed-like classes and ignore shared vocab") {
    val seedPos = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the quick red fox runs past the sleeping dog")
    ).toDF("doc_id", "text")
    val seedNeg = Seq(
      (201L, "der schnelle braune fuchs springt gern hoch"),
      (202L, "der schnelle rote fuchs rennt sehr weit")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),    // positive-seed vocabulary
      (2L, "der schnelle braune fuchs springt"), // negative-seed vocabulary
      (3L, "zz1 zz2 zz3 zz4")                    // vocabulary unseen by either seed
    ).toDF("doc_id", "text")
    val out = Curation.qualityClassifierScores(
        corpus, seedPos, seedNeg, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2, s"pos-vocab doc must score positive: $out")
    assert(out(2L)._1 < 0 && !out(2L)._2, s"neg-vocab doc must score negative: $out")
    assert(out(3L)._1 == 0 && !out(3L)._2, s"unseen vocab is all zero votes: $out")
  }

  // ---------------- leakage-safe splits ----------------

  test("leakageSafeSplit keeps every near-dup pair in one split and covers all docs") {
    // Edges 1~2, 2~6 form cluster {1,2,6}; 3~4 forms {3,4}; 5 and 7 are singletons.
    val corpus = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(corpus, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), "every doc gets a split")
    // Transitive closure: 1 and 6 were never paired directly but share a split.
    assert(Set(out(1L), out(2L), out(6L)).size == 1, s"cluster {1,2,6} split apart: $out")
    assert(out(3L) == out(4L), s"cluster {3,4} split apart: $out")
    assert(out(5L)._1 == 5L && out(7L)._1 == 7L, "singletons are their own component")
    assert(out.values.forall { case (_, s) => Set("train", "val", "test")(s) })
  }

  test("leakageSafeSplitIncremental pins prior docs, adopts for newcomers, flags merges") {
    // Round 1: cluster {10, 12} plus singletons 20, 30.
    val docs1 = Seq(10L, 12L, 20L, 30L).toDF("doc_id")
    val pairs1 = Seq((10L, 12L)).toDF("id_a", "id_b")
    val r1 = Curation.leakageSafeSplit(docs1, pairs1, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val prior = r1.toSeq.toDF("doc_id", "split")

    // Round 2: doc 3 (SMALLER id — re-keys the component minimum) joins {10,12};
    // doc 99 arrives unrelated; and an edge 20~30 merges two prior singletons.
    val docs2 = Seq(3L, 10L, 12L, 20L, 30L, 99L).toDF("doc_id")
    val pairs2 = Seq((10L, 12L), (3L, 10L), (20L, 30L)).toDF("id_a", "id_b")
    val r2 = Curation.leakageSafeSplitIncremental(docs2, pairs2, "doc_id", prior)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap

    // Prior docs never move, even though doc 3 re-keyed their component to 3.
    assert(r2(10L)._1 == r1(10L) && r2(12L)._1 == r1(12L), s"prior docs moved: $r2")
    // The newcomer adopts the cluster's prior split instead of re-hashing.
    assert(r2(3L)._1 == r1(10L), s"newcomer must adopt the cluster split: $r2")
    assert(!r2(3L)._2 && !r2(10L)._2, "a clean adoption is not a conflict")
    // The merged singletons keep their own prior splits; conflict flagged iff
    // they disagreed in round 1.
    assert(r2(20L)._1 == r1(20L) && r2(30L)._1 == r1(30L))
    assert(r2(20L)._2 == (r1(20L) != r1(30L)) && r2(30L)._2 == r2(20L)._2,
      s"merge conflict flag wrong: r1=$r1 r2=$r2")
    // The unrelated newcomer gets the plain (fresh-hash) assignment.
    val freshOf99 = Curation.leakageSafeSplit(docs2, pairs2, "doc_id")
      .filter($"doc_id" === 99L).select("split").head.getString(0)
    assert(r2(99L)._1 == freshOf99 && !r2(99L)._2)
  }

  test("leakageSafeSplitIncremental threads custom weights into fresh assignments") {
    // docs 100-139 are fresh singletons; with the caller's 1:1 a/b scheme their
    // labels must come from THAT scheme, not the default train/val/test buckets
    // (the masked bug: the inner fresh-split call dropped the weights).
    val corpus = (Seq(1L) ++ (100L until 140L)).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val prior = Seq((1L, "train")).toDF("doc_id", "split")
    val out = Curation.leakageSafeSplitIncremental(corpus, pairs, "doc_id", prior,
        weights = Seq(("a", 1), ("b", 1)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "train", "prior doc keeps its prior label verbatim")
    val freshLabels = (out - 1L).values.toSet
    assert(freshLabels.subsetOf(Set("a", "b")) && freshLabels.size == 2,
      s"fresh docs must use the caller's scheme (both sides at n=40): $freshLabels")
  }

  test("leakageSafeSplit buckets match the t6 md5 scheme and respect custom weights") {
    val corpus = (0L until 400L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Curation.leakageSafeSplit(corpus, noPairs, "doc_id",
        weights = Seq(("train", 1), ("eval", 1)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // Independent reimplementation of the bucket rule (md5 of the decimal id,
    // first 15 hex chars, mod total-weight).
    def bucket(id: Long, total: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % total).toInt
    }
    out.foreach { case (id, s) =>
      val expect = if (bucket(id, 2) < 1) "train" else "eval"
      assert(s == expect, s"doc $id: got $s, md5 bucket says $expect")
    }
    val frac = out.values.count(_ == "train").toDouble / out.size
    assert(frac > 0.35 && frac < 0.65, s"1:1 weights should split near half, got $frac")
  }

  // ---------------- embedding-space curation ----------------

  /** Plain-Scala replica of the deterministic quantizer: md5(id)-ordered seeds,
    * argmax by (cosine desc, cid desc) — the independent model both new
    * embedding-curation tests compare against.
    */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < a.length) {
      ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i); bb += b(i).toDouble * b(i)
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  private lazy val protoVecs: Seq[(Long, Array[Float])] = (1L to 40L).map { i =>
    val rnd = new scala.util.Random(i * 7919)
    (i, Array.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** (id → (cid, cosine-to-centroid)) under the plain-Scala quantizer. */
  private def expectedCells(nlist: Int): Map[Long, (Int, Double)] = {
    val seeds = protoVecs.sortBy(v => md5Hex(v._1.toString)).take(nlist)
      .zipWithIndex.map { case ((_, v), i) => (i + 1, v) }
    protoVecs.map { case (id, v) =>
      val best = seeds.map { case (cid, c) => (cosine(v, c), cid) }.max
      id -> (best._2, best._1)
    }.toMap
  }

  test("prototypicalityPrune keeps exactly the per-cell least-prototypical tail") {
    val df = protoVecs.toDF("vec_id", "embedding")
    val kept = Curation.prototypicalityPrune(df, fraction = 0.5, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val cells = expectedCells(4)
    val expect = cells.toSeq.groupBy(_._2._1).flatMap { case (cid, members) =>
      val ranked = members.sortBy { case (id, (_, cos)) => (-cos, id) }
      val n = ranked.size
      ranked.zipWithIndex.drop(math.floor(n * 0.5).toInt)
        .map { case ((id, _), ix) => (id, cid, ix + 1, n.toLong) }
    }.toSet
    assert(kept.toSet == expect,
      s"kept rows must equal the independent recompute;\n got ${kept.sortBy(_._1).mkString(",")}\n exp ${expect.toSeq.sortBy(_._1).mkString(",")}")
    // law: every cell keeps n - floor(n/2) rows
    val byCell = kept.groupBy(_._2)
    byCell.foreach { case (cid, rows) =>
      val n = rows.head._4
      assert(rows.size == n - n / 2, s"cell $cid: ${rows.size} kept of $n")
    }
  }

  test("prototypicalityPrune at fraction 0 keeps everything, rejects fraction 1") {
    val df = protoVecs.toDF("vec_id", "embedding")
    assert(Curation.prototypicalityPrune(df, fraction = 0.0, nlist = 4).count() == 40)
    intercept[IllegalArgumentException] {
      Curation.prototypicalityPrune(df, fraction = 1.0, nlist = 4)
    }
  }

  test("clusterBalancedSample caps every cell at k, picking the md5-first members") {
    val df = protoVecs.toDF("vec_id", "embedding")
    val kept = Curation.clusterBalancedSample(df, perCluster = 3, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val cells = expectedCells(4)
    val expect = cells.toSeq.groupBy(_._2._1).flatMap { case (cid, members) =>
      members.map(_._1).sortBy(id => (md5Hex(id.toString), id)).take(3)
        .map(id => (id, cid))
    }.toSet
    assert(kept.toSet == expect,
      s"capped sample must equal the independent md5-order recompute: got ${kept.sortBy(_._1).mkString(",")}")
    // determinism: a second run returns the identical set
    val again = Curation.clusterBalancedSample(df, perCluster = 3, nlist = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == kept.toSet)
  }

  // ---------------- token-budget mixing ----------------

  /** Replica of the corpus md5 unit hash (Dedup.md5Hash60 % 1e6 / 1e6). */
  private def md5Unit(s: String): Double =
    (java.lang.Long.parseLong(md5Hex(s).take(15), 16) % 1000000L).toDouble / 1000000.0

  test("tokenBudgetMix: every doc appears floor(rate) times plus the md5-gated fractional epoch") {
    // domain a: 4 docs x 100 tokens (w=3) -> T_a = 2400*3/4 = 1800, rate 4.5
    // domain b: 10 docs x 100 tokens (w=1) -> T_b = 600, rate 0.6
    val rows = (1L to 4L).map(i => (i, "a", 100L)) ++
      (11L to 20L).map(i => (i, "b", 100L))
    val df = rows.toDF("doc_id", "domain", "toks")
    val weights = Seq(("a", 3.0), ("b", 1.0)).toDF("domain", "w")
    val out = Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        weights, budget = 2400L)
      .select("doc_id", "domain", "epoch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    rows.foreach { case (id, dom, _) =>
      val rate = if (dom == "a") 4.5 else 0.6
      val fe = math.floor(rate).toInt
      val expectEpochs =
        (0 until fe) ++ (if (md5Unit(s"$id:$fe") < rate - fe) Seq(fe) else Nil)
      assert(byId.getOrElse(id, Nil) == expectEpochs,
        s"doc $id ($dom): got ${byId.getOrElse(id, Nil)}, want $expectEpochs")
    }
    // the upsampled domain really repeats: every a-doc has at least epochs 0..3
    assert((1L to 4L).forall(id => byId(id).take(4) == (0 until 4)))
  }

  test("tokenBudgetMix: maxEpochs caps repetition at an exact integer rate (no fractional epoch)") {
    val df = (1L to 4L).map(i => (i, "a", 100L)).toDF("doc_id", "domain", "toks")
    val weights = Seq(("a", 1.0)).toDF("domain", "w")
    // uncapped rate would be 10000/400 = 25; cap 2.0 -> exactly 2 epochs per doc
    val out = Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        weights, budget = 10000L, maxEpochs = 2.0)
      .select("doc_id", "epoch")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.length == 8 && out.groupBy(_._1).forall { case (_, es) =>
      es.map(_._2).sorted.toSeq == Seq(0, 1)
    }, s"cap=2 must yield exactly epochs {0,1} per doc: ${out.sortBy(x => (x._1, x._2)).mkString(",")}")
  }

  test("tokenBudgetMix rejects a non-positive weight table") {
    val df = Seq((1L, "a", 10L)).toDF("doc_id", "domain", "toks")
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        Seq(("a", 0.0)).toDF("domain", "w"), budget = 100L)
    }
  }

  test("tokenBudgetMix names misconfigurations instead of emitting garbage epochs") {
    val df = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("doc_id", "domain", "toks")
    // a NEGATIVE weight would yield rate < 0 and epoch = -1 rows; sums > 0
    val eNeg = intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        Seq(("a", -1.0), ("b", 3.0)).toDF("domain", "w"), budget = 100L)
    }
    assert(eNeg.getMessage.contains("must be > 0"), eNeg.getMessage)
    // a zero-token domain would divide to Infinity -> silent maxEpochs upsample
    val zeroToks = Seq((1L, "a", 0L), (2L, "b", 10L)).toDF("doc_id", "domain", "toks")
    val eZero = intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(zeroToks, "domain", "doc_id", "toks",
        Seq(("a", 1.0), ("b", 1.0)).toDF("domain", "w"), budget = 100L)
    }
    assert(eZero.getMessage.contains("has no tokens"), eZero.getMessage)
    // all-NULL tokens collapse through least() the same way — same refusal
    val nullToks = Seq((1L, "a", null.asInstanceOf[java.lang.Long]),
      (2L, "b", java.lang.Long.valueOf(10L))).toDF("doc_id", "domain", "toks")
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(nullToks, "domain", "doc_id", "toks",
        Seq(("a", 1.0), ("b", 1.0)).toDF("domain", "w"), budget = 100L)
    }
    // an EMPTY weight table refuses with the operator's message, not an NPE
    val eEmpty = intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        Seq.empty[(String, Double)].toDF("domain", "w"), budget = 100L)
    }
    assert(eEmpty.getMessage.contains("empty"), eEmpty.getMessage)
    // a single-column weight table refuses loudly, not with a MatchError
    intercept[IllegalArgumentException] {
      Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
        Seq("a").toDF("domain"), budget = 100L)
    }
  }

  test("snapshotDiff: added/removed/changed by key, unchanged dropped, nulls safe") {
    val old = Seq(
      (1L, Some("a"), "en"), (2L, Some("b"), "en"), (3L, None, "de"),
      (4L, Some("d"), "fr")).toDF("doc_id", "text", "lang")
    val cur = Seq(
      (1L, Some("a"), "en"),      // unchanged -> dropped
      (2L, Some("B!"), "en"),     // changed text
      (3L, None, "en"),           // changed lang, null text compares safely
      (5L, Some("e"), "it")       // added
    ).toDF("doc_id", "text", "lang") // 4L removed
    val got = Curation.snapshotDiff(old, cur, "doc_id", Seq("text", "lang"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === Seq((2L, "changed"), (3L, "changed"), (4L, "removed"),
      (5L, "added")))
  }

  test("snapshotDiff digest path ≡ value-compare path on randomized snapshots") {
    val rnd = new scala.util.Random(11)
    val base = (1L to 400L).map(i =>
      (i, if (rnd.nextInt(20) == 0) null
          else rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString,
        s"l${rnd.nextInt(3)}"))
    val next = base.filter(_ => rnd.nextInt(10) != 0) // drops
      .map { case (i, t, l) => // mutations
        if (rnd.nextInt(8) == 0) (i, if (t == null) "x" else null, l)
        else if (rnd.nextInt(8) == 0) (i, t, l + "'")
        else (i, t, l)
      } ++ (900L to 920L).map(i => (i, "new", "l0")) // adds
    val o = base.toDF("doc_id", "text", "lang")
    val c = next.toDF("doc_id", "text", "lang")
    val byDigest = Curation.snapshotDiff(o, c, "doc_id", Seq("text", "lang"),
      digest = true).as[(Long, String)].collect().sorted.toSeq
    val byValue = Curation.snapshotDiff(o, c, "doc_id", Seq("text", "lang"),
      digest = false).as[(Long, String)].collect().sorted.toSeq
    assert(byDigest === byValue)
    assert(byDigest.count(_._2 == "added") === 21)
  }
}
