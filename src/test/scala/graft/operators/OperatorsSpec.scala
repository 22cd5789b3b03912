package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
    (3L, "The quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup
    (4L, "Der schnelle braune Fuchs springt und der Hund ist nicht da und das ist gut"),
    (5L, "le chat est sur la table et les livres sont dans la maison"),
    (6L, "completely different content about databases and distributed query engines today"),
    (7L, "")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per normalized text") {
    val kept = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L)) // near-dup is NOT an exact dup
  }

  test("minhash LSH finds the planted near-dup pair") {
    val pairs = Dedup.minHashNearDup(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("simhash: identical docs at hamming 0") {
    val pairs = Dedup.simHashNearDup(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("minhash: native one-pass signature is bit-identical to the exploded pipeline") {
    val composed = Dedup
      .minHashSignatures(Dedup.shingles(docs, "text", "doc_id", n = 3), k = 32)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector).toMap
    val native = Dedup.minHashSignaturesNative(docs, "text", "doc_id", n = 3, k = 32)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector).toMap
    assert(native == composed)
  }

  test("shingle hash sets: native fused array equals the exploded hash pipeline") {
    val composed = Dedup.shingles(docs, "text", "doc_id", n = 3)
      .select($"id", xxhash64($"shingle").as("h"))
      .groupBy($"id").agg(sort_array(collect_list($"h")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val native = Dedup.shingleHashSets(docs, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(native == composed) // same doc set (empty-shingle docs dropped), same hashes
  }

  test("window hashes: native rolling array equals the HOF slice+concat formulation") {
    val staged = docs.select($"doc_id", Dedup.wordsArray($"text").as("w"))
    val hof = staged.select($"doc_id",
      when(size($"w") >= 5,
        transform(sequence(lit(0), size($"w") - 5),
          i => xxhash64(concat_ws(" ", slice($"w", i + 1, lit(5))))))
        .otherwise(array().cast("array<bigint>")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    val spark2 = docs.sparkSession
    val native = staged.select($"doc_id", org.apache.spark.sql.graft.Bridge.column(
        graft.functions.WindowHashes(
          org.apache.spark.sql.graft.Bridge.toExpression(spark2, $"w"), 5)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(native == hof)
  }

  test("simhash: native one-pass signature is bit-identical to the exploded pipeline") {
    val composed = Dedup
      .simHash(Dedup.shingles(docs, "text", "doc_id"), bits = 60, hash = Dedup.md5Hash60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simHashSignaturesNative(docs, "text", "doc_id", n = 3, bits = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed) // same doc set (short docs dropped) and same signatures
    assert(!native.contains(7L)) // empty doc has no shingles in either form
    val pairs = Dedup.simHashNearDupNative(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
  }

  test("ngram jaccard: exact pair scores 1.0") {
    val pairs = Dedup.ngramJaccardNearDup(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.get((1L, 3L)).exists(j => j > 0.5 && j < 1.0))
  }

  test("token count and language id") {
    val out = docs.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 == 14)
    assert(out(7L)._1 == 0)
    assert(out(1L)._2 == "en")
    assert(out(4L)._2 == "de")
    assert(out(5L)._2 == "fr")
    assert(out(7L)._2 == "unknown")
  }

  test("bm25 ranks term-dense short docs first and drops no-match docs") {
    val d = Seq(
      (1L, "spark spark spark"),                    // dense in the query term
      (2L, "spark and a lot of other words here making this document longer"),
      (3L, "nothing relevant at all"),
      (4L, "spark once")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(d, "text", "doc_id", terms = Seq("spark"), k = 10)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L, 4L)) // doc 3 filtered (score 0)
    assert(out.head.getLong(0) == 1L) // highest tf, shortest doc
    val scores = out.map(_.getDouble(out.head.fieldIndex("score")))
    assert(scores.sorted.reverse.toSeq == scores.toSeq)
  }

  test("repetition scores: dup fractions and top-gram share, hand-computed") {
    val d = Seq(
      (1L, "a b a b a b"),  // g2 = [a b, b a, a b, b a, a b]: 5 grams, 2 distinct
      (2L, "w1 w2 w3 w4 w5"), // all grams unique
      (3L, "x"), // too short for any 2-gram
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScores(d, "text", "doc_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(1L) == ((5L, 0.6, 0.5, 0.6))) // dup2 3/5, dup3 2/4, top "a b" 3/5
    assert(out(2L) == ((4L, 0.0, 0.0, 0.25)))
    assert(out(3L) == ((0L, 0.0, 0.0, 0.0)))
    assert(out(4L) == ((0L, 0.0, 0.0, 0.0)))
  }

  test("native langId is bit-identical to the composed formulation") {
    // adversarial inputs: adjacent repeated stopwords (non-overlapping count),
    // mixed case, ties between languages, CJK short-circuit, empty text
    val texts = Seq(
      "the the the and and of it", "The THE is in that it",
      "der die und le la les", "le la et el los es", "que que",
      "中文 text the and of", "", "no stopwords here at all",
      "es es es una", "a the b the c the d")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = df.select($"id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = df.select($"id", TextAnalysis.langIdComposed($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("funnel enforces strict step ordering per user") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val e = Seq(
      // user 1 completes A->B->C in order
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 11:00:00"), "B"),
      (1L, ts("2024-01-01 12:00:00"), "C"),
      // user 2 did B before A — B must not count; then B again after A does
      (2L, ts("2024-01-01 09:00:00"), "B"),
      (2L, ts("2024-01-01 10:00:00"), "A"),
      (2L, ts("2024-01-01 10:30:00"), "B"),
      // user 3 only did A
      (3L, ts("2024-01-01 08:00:00"), "A")
    ).toDF("user_id", "t", "event_type")
    val f = EventOps.funnel(e, Seq("A", "B", "C")).orderBy("user_id").collect()
    assert(f.length == 3)
    assert(f(0).getTimestamp(3) != null, "user 1 completes all steps")
    assert(f(1).getTimestamp(2) == ts("2024-01-01 10:30:00"),
      "user 2's pre-A 'B' event is ignored; post-A one counts")
    assert(f(1).isNullAt(3) && f(2).isNullAt(2), "partial funnels keep nulls")
    val counts = EventOps.funnelCounts(EventOps.funnel(e, Seq("A", "B", "C")), 3)
      .orderBy("step").collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(3L, 2L, 1L))
  }

  test("BPE-ish tokenizer splits contractions, digits, and punctuation") {
    val n = Seq("I can't wait, it's 2024!").toDF("text")
      .select(TextAnalysis.bpeTokenCount($"text")).head.getLong(0)
    // I | can | 't | wait | , | it | 's | 2024 | !
    assert(n == 9L, s"got $n")
    val empty = Seq("").toDF("text").select(TextAnalysis.bpeTokenCount($"text")).head.getLong(0)
    assert(empty == 0L)
  }

  test("fingerprint is case/punctuation-insensitive") {
    val fps = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other"))
      .toDF("id", "t")
      .select(TextAnalysis.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("quality score lands in [0,1] and penalizes junk") {
    val q = Seq(
      (1L, "A well formed paragraph of reasonable length. " * 10),
      (2L, "!!!!!!....;;;;;"),
      (3L, "")).toDF("id", "t")
      .select($"id", TextAnalysis.qualityScore($"t").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L) && q(2L) > q(3L))
  }

  test("c4LineFilter applies line and document rules") {
    val good = "this is a well formed sentence with enough words."
    val docs = Seq(
      (1L, s"$good\n$good\n$good\nclick here\ntiny.\nplease enable javascript now ok."),
      (2L, s"$good\n$good\nshort doc."),                  // only 2 kept lines -> doc dropped
      (3L, s"$good\n$good\n$good\nlorem ipsum filler."),  // placeholder text -> doc dropped
      (4L, s"$good\n$good\n$good\nvar f = function() { return 1; };") // code -> dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilter(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.map(_._1).toSet == Set(1L))
    val (_, nLines, nKept, cleaned) = out.head
    assert(nLines == 6 && nKept == 3) // junk lines each trip one rule
    assert(cleaned == Seq(good, good, good).mkString("\n"))
  }

  test("topNgramsBounded equals the exact top-K, including the fallback path") {
    val rnd = new scala.util.Random(11)
    // 40 docs share a planted boilerplate trigram; the rest is random noise
    val docs = (1 to 120).map { i =>
      val noise = Seq.fill(12)(s"w${rnd.nextInt(400)}").mkString(" ")
      val text = if (i <= 40) s"subscribe our newsletter $noise" else noise
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val exact = Dedup.shingles(docs, "text", "doc_id", n = 3)
      .groupBy($"shingle").agg(count(lit(1)).as("n_docs"))
      .orderBy($"n_docs".desc, $"shingle").limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(exact.head._1 == "subscribe our newsletter" && exact.head._2 == 40L)
    // plenty of counters: the sketch guarantee holds, no fallback
    val sketched = Dedup.topNgramsBounded(docs, "text", "doc_id",
        n = 3, topK = 5, counters = 512)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketched.sameElements(exact))
    // starved counters: the runtime guarantee check must trigger the exact fallback
    val starved = Dedup.topNgramsBounded(docs, "text", "doc_id",
        n = 3, topK = 5, counters = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(starved.sameElements(exact))
  }

  test("htmlToText strips script/style/tags and decodes entities once") {
    val html = """<html><head><style>p { color: red; }</style>
      |<script>if (a < b) { alert("x&y"); }</script></head>
      |<body><!-- c --><h1>Title</h1><p>Tom &amp; Jerry &lt;b&gt; &amp;lt; &quot;q&quot;</p>
      |</body></html>""".stripMargin
    val got = Seq(Tuple1(html)).toDF("h")
      .select(TextAnalysis.htmlToText($"h")).head().getString(0)
    assert(got == """Title Tom & Jerry <b> &lt; "q"""")
  }

  private lazy val vecs = {
    // deterministic small vector set: v2 = v1 (dup), v3 close to v1, v4 orthogonal-ish
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.98f, 0.05f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks by cosine with deterministic tie-break") {
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 1), vecs, k = 3)
      .orderBy("rk").collect().map(_.getLong(1))
    assert(top.head == 2L) // exact duplicate first
    assert(top(1) == 3L)   // then the near vector
  }

  test("hard negatives: different-label top-k, near-dups excluded as label noise") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),  // anchor, label 0
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1),  // different label, identical vector
                                                //   (cos 1.0 >= 0.95) — excluded
      (3L, Array(0.9f, 0.45f, 0.0f, 0.0f), 1), // cos ~0.89 — best legitimate negative
      (4L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),  // cos 0 — second
      (5L, Array(0.8f, 0.6f, 0.0f, 0.0f), 0)   // same label — never a negative
    ).toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(
        labeled.filter($"vec_id" === 1), labeled, k = 2)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(negs === Seq((1L, 3L, 1), (1L, 4L, 2)))
  }

  test("cosine near-dup finds dup + near pair at 0.9") {
    val pairs = Similarity.cosineNearDup(vecs, threshold = 0.9, dim = 4, planes = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L))
  }

  test("IVF top-k finds the planted neighbors against the real embeddings") {
    val all = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val queries = all.filter($"vec_id" % 20 === 0)
    val exact = Similarity.bruteForceTopK(queries, all, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, all, k = 5, dim = 64, nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.3, f"IVF recall@5 too low: $recall%.2f")
  }

  test("PQ top-k ranks an exact duplicate first and tracks brute force") {
    // toy set: the duplicate of the query encodes to identical codes, so its ADC
    // score is the query's own quantized self-similarity — the top rank
    val top = Similarity.pqTopK(vecs.filter($"vec_id" === 1), vecs, k = 3,
      dim = 4, m = 2, ksub = 4)
      .orderBy("rk").collect().map(_.getLong(1))
    assert(top.head == 2L)
    // real embeddings: recall floor vs brute force (quantization is lossy; 32×
    // compression at dim=64/m=8 still has to keep most of the neighborhood)
    val all = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val queries = all.filter($"vec_id" % 20 === 0)
    val exact = Similarity.bruteForceTopK(queries, all, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(queries, all, k = 5, dim = 64, m = 8, ksub = 32,
      lloydIters = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & exact).size.toDouble / exact.size
    // the synthetic embeddings are near-isotropic noise — the hardest case for a
    // quantizer; random top-5 would recall ~1%, PQ holds well above that
    assert(recall >= 0.2, f"PQ recall@5 too low: $recall%.2f")
  }

  test("IVFPQ with exact rerank tracks brute force at least as well as raw PQ") {
    val all = spark.read.parquet(s"${graft.TestSpark.sfDir}/embeddings.parquet")
    val queries = all.filter($"vec_id" % 20 === 0)
    val exact = Similarity.bruteForceTopK(queries, all, k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(queries, all, k = 5, dim = 64,
      nlist = 8, nprobe = 4, m = 8, ksub = 32, rerank = 48, pqLloydIters = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivfpq & exact).size.toDouble / exact.size
    assert(recall >= 0.25, f"IVFPQ recall@5 too low: $recall%.2f")
  }

  test("multimodal payload + stub decode preserve batch shape") {
    val withP = Multimodal.attachFakePayload(docs.filter($"doc_id" <= 3), "text")
    val feats = Multimodal.decodeFeatures(withP).collect()
    assert(feats.length == 3)
    val f = feats.head
    assert(f.getAs[Int]("n_bytes") == 128)
    assert(f.getAs[Double]("byte_mean") > 0)
    // identical text -> identical features
    val byId = feats.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("byte_mean")).toMap
    assert(byId(1L) == byId(2L))
    // fake payloads are not decodable images: image fields stay null
    assert(feats.forall(_.isNullAt(f.fieldIndex("width"))))
  }

  test("real PNG decode: ImageIO roundtrips the generated uniform image exactly") {
    val feats = Multimodal.decodeFeatures(
        Multimodal.attachImagePayload(docs.select($"doc_id"), "doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- 1L to 7L) {
      val r = feats(id)
      assert(r.getAs[Int]("width") == 4 + (id % 13).toInt)
      assert(r.getAs[Int]("height") == 3 + (id % 7).toInt)
      val g = ((id * 37) % 256).toInt
      assert(r.getAs[Int]("px_min") == g && r.getAs[Int]("px_max") == g)
      assert(r.getAs[Double]("px_mean") == g.toDouble) // uniform + lossless = exact
    }
  }

  test("real JPEG decode: golden roundtrip through the same decode path") {
    // JPEG DCT quantization shifts a uniform gray deterministically but not
    // SQL-predictably — golden-test it against a direct ImageIO roundtrip instead.
    val cases = Seq((16, 8, 100, 11L), (9, 5, 200, 12L), (24, 24, 7, 13L))
    val rows = cases.map { case (w, h, g, id) =>
      (id, "jpeg", Multimodal.encodeUniformImage(w, h, g, "jpeg"))
    }.toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct($"media_format".as("format"),
        length($"payload").as("n_bytes")))
    val feats = Multimodal.decodeFeatures(rows)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((w, h, g, id) <- cases) {
      val r = feats(id)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      val expected = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(Multimodal.encodeUniformImage(w, h, g, "jpeg")))
        val samples = for (y <- 0 until h; x <- 0 until w) yield img.getRaster.getSample(x, y, 0)
        (samples.sum.toDouble / samples.size, samples.min, samples.max)
      }
      assert(r.getAs[Double]("px_mean") == expected._1)
      assert(r.getAs[Int]("px_min") == expected._2 && r.getAs[Int]("px_max") == expected._3)
      assert(math.abs(r.getAs[Double]("px_mean") - g) <= 4.0, "quantization drift bound")
    }
  }

  test("real WAV decode: RIFF/PCM roundtrip recovers rate and exact sample stats") {
    val feats = Multimodal.decodeFeatures(
        Multimodal.attachAudioPayload(docs.select($"doc_id"), "doc_id"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    for (id <- 1L to 7L) {
      val r = feats(id)
      val n = 50 + (id % 50).toInt
      val samples = (0 until n).map(i => ((id + 7 * i) % 256).toInt)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Int]("n_samples") == n)
      assert(r.getAs[Int]("sample_min") == samples.min)
      assert(r.getAs[Int]("sample_max") == samples.max)
      assert(r.getAs[Double]("sample_mean") == samples.sum.toDouble / n)
    }
    // corrupt payload (truncated header) survives as a null-decode row
    assert(Multimodal.decodeWavPcm8("RIFFxxxx".getBytes).isEmpty)
  }

  test("real AVI video decode: container roundtrip recovers fps and exact frame stats") {
    // direct codec roundtrip: encode three distinct PNG frames, walk them back out
    val frames = (0 until 3).map(f => Multimodal.encodeUniformImage(5, 4, 50 + f * 60, "png"))
    val avi = Multimodal.encodeAviFrames(frames, 5, 4, fps = 10)
    val Some((fps, out)) = Multimodal.decodeAviFrames(avi)
    assert(fps == 10.0 && out.size == 3)
    assert(out.zip(frames).forall { case (a, b) => a.sameElements(b) },
      "frame chunks must round-trip byte-exact")

    // end-to-end explode shape over the deterministic payloads
    val rows = Multimodal.extractFrames(
        Multimodal.attachVideoPayload(docs.select($"doc_id"), "doc_id"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_no")) -> r).toMap
    for (id <- 1L to 7L) {
      val n = 3 + (id % 4).toInt
      assert(rows.keys.count(_._1 == id) == n, s"doc $id must emit $n frames")
      for (f <- 0 until n) {
        val r = rows((id, f))
        val g = ((id * 31 + f * 17) % 256).toInt
        assert(r.getAs[Double]("fps") == 10.0)
        assert(r.getAs[Int]("width") == 4 + (id % 6).toInt)
        assert(r.getAs[Int]("height") == 3 + (id % 5).toInt)
        assert(r.getAs[Double]("px_mean") == g.toDouble)
        assert(r.getAs[Int]("px_min") == g && r.getAs[Int]("px_max") == g)
      }
    }

    // corrupt containers contribute zero rows (not a crash, not null rows)
    assert(Multimodal.decodeAviFrames("RIFFxxxxAVI".getBytes).isEmpty)
    assert(Multimodal.decodeAviFrames(Array.fill[Byte](64)(7)).isEmpty)
  }

  test("duplicateSpans finds and merges exact repeated substrings across documents") {
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ") // 10-word duplicated run
    val d = Seq(
      (1L, s"one two three $shared four five six"),        // span at words [3, 13)
      (2L, s"$shared completely different trailing words"), // span at words [0, 10)
      (3L, "nothing here repeats at all ten eleven twelve"),
      // two ADJACENT duplicated runs in one doc must merge into one span
      (4L, s"$shared $shared")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "text", "doc_id", window = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans((1L, 3, 13)) && spans((2L, 0, 10)), spans.toString)
    assert(spans.exists { case (id, s, e) => id == 4L && s == 0 && e == 20 },
      s"doc 4's back-to-back duplicated runs must merge: $spans")
    assert(!spans.exists(_._1 == 3L), "unique text must produce no spans")
    // within-corpus uniqueness respected: doc 1's unique words stay out of spans
    assert(spans.count(_._1 == 1L) == 1)
  }

  test("bounded posting-list collect nulls out hot shingles instead of buffering them") {
    // 'the quick brown' appears in docs 1,2,3 (df=3): with maxDocFreq=2 every pair
    // sharing ONLY capped shingles must disappear, while pairs that also share
    // rarer shingles survive through those.
    val sh = Dedup.shingles(docs, "text", "doc_id", n = 3)
    val capped = Dedup.pairJaccard(sh, maxDocFreq = 1)
    assert(capped.count() == 0) // every shared shingle has df >= 2: all capped away
    val uncapped = Dedup.pairJaccard(sh, maxDocFreq = 1000)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(uncapped.contains((1L, 2L)))
  }

  test("profiler: one-pass stats with nulls, exact decimal mean, edge-clamped bins") {
    val d = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, null), (null, "a"))
      .toDF("x", "s")
    val p = Profiler.profile(d, Seq("x", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p("x").getAs[Long]("n_rows") == 4 && p("x").getAs[Long]("n_nulls") == 1)
    assert(p("x").getAs[Long]("n_distinct") == 3)
    assert(p("x").getAs[String]("min_value") == "1" && p("x").getAs[String]("max_value") == "3")
    assert(p("x").getAs[Double]("mean_value") == 2.0)
    assert(p("s").getAs[Long]("n_nulls") == 1 && p("s").isNullAt(p("s").fieldIndex("mean_value")))
    val h = Profiler.histogram(
        Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0).toDF("v"), "v", 0.0, 30.0, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // -5 clamps into bin 1; 10.0 starts bin 2; 99 clamps into bin 3
    assert(h == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("exact dedup with null ids keeps an original row, preferring non-null ids") {
    val d = Seq(
      (java.lang.Long.valueOf(5L), "same text here"),
      (null.asInstanceOf[java.lang.Long], "same text here"),
      (null.asInstanceOf[java.lang.Long], "only null ids")
    ).toDF("doc_id", "text")
    val kept = Dedup.exact(d, "text", "doc_id").collect()
    assert(kept.length == 2)
    val byText = kept.map(r => r.getString(1) -> r).toMap
    assert(byText("same text here").getLong(0) == 5L) // non-null id wins the group
    assert(byText("only null ids").isNullAt(0)) // the original row, not an all-null row
  }

  test("perceptual dHash groups textured images and tolerates a one-pixel edit") {
    // groupMod 101: ids 2 and 204 render identical PNGs; 103 is the same texture
    // with one pixel perturbed (odd id); 3 is an unrelated texture
    val ids = Seq(2L, 204L, 103L, 3L).toDF("doc_id")
    val sig = Multimodal.perceptualHash(
      Multimodal.attachTexturedImagePayload(ids, "doc_id"))
    assert(sig.count() == 4, "every payload must decode to a hash")
    val pairs = Dedup.hammingNearDup(sig, bits = 64, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val matched = pairs.map(p => (p._1, p._2)).toSet
    assert(matched == Set((2L, 103L), (2L, 204L), (103L, 204L)),
      s"same-texture trio must pair up, unrelated id 3 must not: $pairs")
    assert(pairs.collect { case (2L, 204L, hd) => hd }.head == 0,
      "identical renders hash identically")
    assert(pairs.forall(_._3 <= 2), s"one-pixel edit flips at most two bits: $pairs")
  }

  test("audio fingerprint groups textured waveforms and tolerates a one-sample edit") {
    val ids = Seq(2L, 204L, 103L, 3L).toDF("doc_id") // same trio construction as dHash
    val sig = Multimodal.audioFingerprint(
      Multimodal.attachTexturedAudioPayload(ids, "doc_id"))
    assert(sig.count() == 4)
    val pairs = Dedup.hammingNearDup(sig, bits = 64, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((2L, 103L), (2L, 204L), (103L, 204L)),
      s"same-waveform trio must pair up, unrelated id 3 must not: $pairs")
    assert(pairs.forall(_._3 <= 2), s"one-sample edit flips at most two bits: $pairs")
  }

  test("videoNearDup pairs full copies, single-frame edits, clips — not unrelated videos") {
    // group 2 mod 101: ids 2 and 204 render identical 4-frame videos; 103 is the
    // same sequence with one pixel edited in ONE frame (odd id); 810 ≡ 2 (mod 101)
    // and ≡ 0 (mod 5) — a 2-frame CLIP of the same group; 3 is an unrelated group.
    val ids = Seq(2L, 204L, 103L, 810L, 3L).toDF("doc_id")
    val fh = Multimodal.videoFrameHashes(
      Multimodal.attachTexturedVideoPayload(ids, "doc_id"))
    val counts = fh.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(2L -> 4L, 204L -> 4L, 103L -> 4L, 810L -> 2L, 3L -> 4L),
      s"every frame must decode to a hash: $counts")
    val rows = Dedup.videoNearDup(fh, bits = 64, maxHamming = 3, minMatchFrac = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val pairs = rows.map(p => (p._1, p._2)).toSet
    assert(pairs == Set((2L, 103L), (2L, 204L), (2L, 810L),
        (103L, 204L), (103L, 810L), (204L, 810L)),
      s"group-2 family must fully pair, unrelated id 3 must not: ${rows.mkString(",")}")
    // identical copies: all 4 frames match both ways
    val full = rows.find(p => p._1 == 2L && p._2 == 204L).get
    assert((full._3, full._4, full._5, full._6) == ((4L, 4L, 4L, 4L)))
    // the clip: containment is total on the clip side, half on the source side
    val clip = rows.find(p => p._1 == 2L && p._2 == 810L).get
    assert((clip._3, clip._4, clip._5, clip._6) == ((2L, 2L, 4L, 2L)),
      s"clip containment must be 2/2 vs 2/4: $clip")
  }

  test("containmentNearDup flags excerpt-in-document pairs that Jaccard misses") {
    val long1 = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, long1),
      (2L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10-word prefix excerpt of 1
      (3L, (1 to 40).map(i => s"v$i").mkString(" "))  // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentNearDup(d, "text", "doc_id", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every contiguous 3-gram of the excerpt appears in doc 1: containment 1.0;
    // the reverse direction (8 of 38 shingles) and the unrelated doc stay silent
    assert(out.toSeq == Seq((2L, 1L, 1.0)), s"got ${out.toSeq}")
    val jac = Dedup.pairJaccardFromSets(
        Dedup.shingleHashSets(d, "text", "doc_id", 3))
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .select("jaccard").head.getDouble(0)
    assert(jac < 0.5, s"the pair must be invisible to symmetric Jaccard, J=$jac")
  }

  test("appendIvfPq adds vectors without retraining: batch-split invariant, old results stable") {
    import spark.implicits._
    def vec(seed: Int): Seq[Float] =
      (0 until 16).map(j => Similarity.planeComponent(seed, j).toFloat)
    val corpusA = (1 to 100).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val batchB = (201 to 240).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val work = java.nio.file.Files.createTempDirectory("graft_ivfpq_add_").toString
    try {
      val index = Similarity.buildIvfPq(corpusA, dim = 16, nlist = 8, m = 4, ksub = 8)
      Similarity.saveIvfPq(index, s"$work/one")
      Similarity.saveIvfPq(index, s"$work/two")
      val queries = (301 to 310).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      val before = Similarity.ivfPqQuery(
          Similarity.loadIvfPq(spark, s"$work/one"), queries, k = 3, nprobe = 8, rerank = 140)
        .collect().map(_.toString).sorted.toSeq

      // one-shot append vs the same batch split in two: identical indexes
      Similarity.appendIvfPq(spark, s"$work/one", batchB)
      Similarity.appendIvfPq(spark, s"$work/two", batchB.filter($"vec_id" < 221L))
      Similarity.appendIvfPq(spark, s"$work/two", batchB.filter($"vec_id" >= 221L))
      def results(p: String) = Similarity.ivfPqQuery(
          Similarity.loadIvfPq(spark, p), queries, k = 3, nprobe = 8, rerank = 140)
        .collect().map(_.toString).sorted.toSeq
      val one = results(s"$work/one")
      assert(one == results(s"$work/two"), "append must be batch-split invariant")

      // an appended vector is findable: query a near-copy of a B vector
      val probe = Seq((9001L, vec(230))).toDF("vec_id", "embedding")
      val top = Similarity.ivfPqQuery(
          Similarity.loadIvfPq(spark, s"$work/one"), probe, k = 1, nprobe = 8, rerank = 20)
        .head
      assert(top.getAs[Long]("neighbor_id") == 230L,
        s"self-match must surface the appended vector, got $top")

      // probing every cell (nprobe = nlist = 8) makes results depend only on the
      // exact-rerank shortlist, so old queries change ONLY where an appended
      // vector genuinely out-ranks an old neighbor — verify against brute force
      // rerank=140 >= |corpus| makes the shortlist the whole probed set, so the
      // exact-rerank IS brute force — equality is deterministic, not a recall bet
      val exact = Similarity.bruteForceTopK(queries, corpusA.union(batchB), k = 3)
        .withColumn("cos", round(col("cos"), 6))
        .collect().map(_.toString).sorted.toSeq
      assert(one == exact,
        s"full-probe appended index must equal brute force:\n$one\nvs\n$exact")
      assert(before != one, "sanity: the append did change some neighbor lists")
    } finally graft.util.Fs.deleteTree(java.nio.file.Paths.get(work))
  }
}
