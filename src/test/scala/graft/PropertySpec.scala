package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.mdl._
import graft.operators.{Dedup, TextAnalysis}

/** Property-based invariants (SURVEY §5 test plan, item 4): the reference's
  * count-invariance golden test (model.slt:40-44) generalized over random data, plus
  * idempotence/bounds laws for the pipeline operators and the type mapper's
  * total-function guarantee. Generators are driven with fixed seeds so failures
  * reproduce exactly.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(20), Seed(i.toLong))
        .foreach(a => try f(a) catch {
          case e: Throwable => throw new AssertionError(s"failed for seed=$i sample=$a", e)
        })
    }

  private val genRows = for {
    n <- Gen.choose(1, 40)
    custIds <- Gen.listOfN(n, Gen.choose(0L, 12L))
  } yield custIds

  test("property: to-one calculated field never changes the host model's row count") {
    forSamples(genRows, 8) { custIds =>
      val orders = custIds.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toDF("o_orderkey", "o_custkey")
      val customers = (0L to 9L).map(c => (c, s"SEG_${c % 3}")).toDF("c_custkey", "c_mktsegment")
      orders.createOrReplaceTempView("p_orders")
      customers.createOrReplaceTempView("p_customers")
      val m = Manifest(
        catalog = "g", schema = "s",
        models = List(
          Model("mo", tableReference = Some(TableReference(table = "p_orders")),
            primaryKey = Some("o_orderkey"),
            columns = List(
              Column("o_orderkey", "bigint"), Column("o_custkey", "bigint"),
              Column("cust", "mc", relationship = Some("oc")),
              Column("seg", "varchar", isCalculated = true,
                expression = Some("\"cust\".\"c_mktsegment\"")))),
          Model("mc", tableReference = Some(TableReference(table = "p_customers")),
            primaryKey = Some("c_custkey"),
            columns = List(Column("c_custkey", "bigint"), Column("c_mktsegment", "varchar")))),
        relationships = List(
          Relationship("oc", List("mo", "mc"), JoinType.ManyToOne,
            "\"mo\".\"o_custkey\" = \"mc\".\"c_custkey\"")))
      val sess = GraftEngine.deploy(spark, m, new graft.planner.CatalogResolver)
      val modelCount = sess.query("SELECT count(*) FROM mo").head.getLong(0)
      assert(modelCount == custIds.size.toLong)
    }
  }

  private val genDoc = Gen.listOf(Gen.oneOf(
    "the", "quick", "brown", "Fox!", "jumps,", "OVER", "lazy", "dog.", "42"))
    .map(_.mkString(" "))

  test("property: exact dedup is idempotent and fingerprint ignores case/punct") {
    forSamples(Gen.listOfN(12, genDoc), 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exact(df, "text", "doc_id")
      val twice = Dedup.exact(once, "text", "doc_id")
      assert(once.count() == twice.count())
      // fingerprints of the survivors are unique
      val fps = once.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
      assert(fps.distinct.length == fps.length)
    }
  }

  test("property: BPE is lossless and the native kernels agree with the driver encode") {
    import graft.functions.Bpe
    // a 4-letter alphabet makes merge-dense tables (every pair repeats) — the
    // regime where greedy-rank order and replace bugs would surface
    val genWord = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val genCorpus = Gen.listOfN(10, Gen.listOf(genWord).map(_.mkString(" ")))
    forSamples(genCorpus, 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val merges = Bpe.learnMergesFromCorpus(df, "text", k = 12)
      val ranks = Bpe.ranksOf(merges)
      val rows = df.select(col("id"),
        TextAnalysis.bpeTokenCount(col("text"), merges).alias("n"),
        TextAnalysis.bpeTokens(col("text"), merges).alias("t"))
        .orderBy("id").collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        val words = texts(i).split("\\s+").filter(_.nonEmpty)
        val expect = words.flatMap(w => Bpe.encodeWord(w, ranks))
        assert(r.getAs[Long]("n") == expect.length.toLong, s"count for '${texts(i)}'")
        assert(r.getAs[String]("t") == expect.mkString(" "), s"tokens for '${texts(i)}'")
        // lossless: stripping token boundaries restores the word stream
        assert(r.getAs[String]("t").replace(" ", "") == words.mkString(""))
      }
    }
  }

  test("property: pairwise jaccard lands in [0,1] and is symmetric by construction") {
    forSamples(Gen.listOfN(8, genDoc), 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sh = Dedup.shingles(df, "text", "doc_id", n = 2)
      val pairs = Dedup.pairJaccard(sh).collect()
      pairs.foreach { r =>
        val j = r.getAs[Double]("jaccard")
        assert(j >= 0.0 && j <= 1.0)
        assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"), "canonical pair order")
      }
    }
  }

  test("property: prefix-filtered jaccard join equals the uncapped all-pairs join") {
    // The 9-word vocabulary makes hot shingles (high document frequency) the norm —
    // exactly the regime where the prefix filter prunes hardest; equality against
    // the uncapped inverted-index join checks the no-lost-pair theorem end to end.
    forSamples(Gen.listOfN(10, genDoc), 6) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sh = Dedup.shingles(df, "text", "doc_id", n = 2)
      Seq(0.3, 0.5, 0.9).foreach { t =>
        val exact = Dedup.pairJaccard(sh, maxDocFreq = 100000)
          .filter(col("jaccard") >= t)
          .collect()
          .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
          .toSet
        Seq("prefix", "capped", "auto").foreach { strat =>
          val got = Dedup.ngramJaccardNearDup(df, "text", "doc_id", n = 2,
              threshold = t, maxDocFreq = 100000, strategy = strat)
            .collect()
            .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("jaccard")))
            .toSet
          assert(got == exact, s"threshold $t strategy $strat")
        }
      }
    }
  }

  test("property: containment pairs equal the brute-force directed set computation") {
    forSamples(Gen.listOfN(8, genDoc), 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sets = Dedup.shingleHashSets(df, "text", "doc_id", 3)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      Seq(0.5, 0.9).foreach { t =>
        val expect = (for {
          (a, sa) <- sets; (b, sb) <- sets if a != b
          c = math.rint(sa.intersect(sb).size.toDouble / sa.size * 1e6) / 1e6 if c >= t
        } yield (a, b, c)).toSet
        Seq("capped", "prefix", "auto").foreach { strat =>
          val got = Dedup.containmentNearDup(df, "text", "doc_id", threshold = t,
              maxDocFreq = 100000, strategy = strat)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
          assert(got == expect, s"threshold $t strategy $strat: $got vs $expect")
        }
      }
    }
  }

  test("property: df-skew probe routes boilerplate-heavy SMALL corpora to prefix") {
    // Every doc shares one boilerplate block, so its shingles' document frequency
    // equals the corpus size; doc 0 IS the boilerplate, so C(0→b) = 1.0 for every
    // other doc and EVERY witnessing shingle is hot. A capped index at
    // maxDocFreq = 4 truncates exactly those postings (BoundedSortedCollect nulls
    // over-cap lists), so a capped run provably loses the pairs — equality of the
    // "auto" run with brute force is therefore only reachable through the
    // max(__df) probe routing to the prefix path, corpus size notwithstanding.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = (0L until 12L).map { i =>
      if (i == 0) (i, boiler)
      else (i, s"$boiler unique tail number $i alpha$i beta$i gamma$i")
    }
    val df = corpus.toDF("doc_id", "text")
    val sets = Dedup.shingleHashSets(df, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val t = 0.9
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      c = math.rint(sa.intersect(sb).size.toDouble / sa.size * 1e6) / 1e6 if c >= t
    } yield (a, b, c)).toSet
    assert(expect.size >= 11, s"fixture must plant containment pairs, got $expect")
    def run(strat: String) = Dedup.containmentNearDup(df, "text", "doc_id",
        threshold = t, maxDocFreq = 4, strategy = strat)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run("capped") != expect,
      "the capped index at this cap must lose the hot-shingle pairs — otherwise this law proves nothing")
    assert(run("prefix") == expect, "prefix is exact at any df by theorem")
    assert(run("auto") == expect, "auto must probe max(__df) and route to prefix")
  }

  test("property: swapping classifier seed classes negates every score") {
    forSamples(Gen.zip(Gen.listOfN(4, genDoc), Gen.listOfN(4, genDoc), Gen.listOfN(6, genDoc)), 4) {
      case (pos, neg, corpus) =>
        def df(ts: List[String], off: Long) =
          ts.zipWithIndex.map { case (t, i) => (off + i, t) }.toDF("doc_id", "text")
        val (p, n, c) = (df(pos, 100), df(neg, 200), df(corpus, 0))
        def scores(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
          graft.operators.Curation.qualityClassifierScores(c, a, b, "text", "doc_id")
            .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        val fwd = scores(p, n)
        val rev = scores(n, p)
        assert(fwd.keySet == rev.keySet)
        fwd.foreach { case (id, (ng, s)) =>
          assert(rev(id) == ((ng, -s)), s"doc $id: $s must negate, got ${rev(id)._2}")
        }
    }
  }

  test("property: connected components are a valid partition refinement of the edges") {
    val genEdges = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L))).map(_.filter(e => e._1 != e._2))
    forSamples(genEdges, 6) { edges =>
      if (edges.nonEmpty) {
        // localSolveMax = 0 pins the DISTRIBUTED star rounds (the default would
        // short-circuit these small graphs to driver union-find)
        val comp = graft.operators.Curation
          .connectedComponents(edges.toDF("a", "b"), localSolveMax = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // every endpoint is labeled; each label is the component's own minimum
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(comp.keySet == nodes)
        comp.groupBy(_._2).foreach { case (label, members) =>
          assert(members.keys.min == label, s"label $label is not the member minimum")
        }
        // both endpoints of every edge share a label (no edge crosses components)
        edges.foreach { case (a, b) => assert(comp(a) == comp(b), s"edge ($a,$b) split") }
        // idempotence: running CC over the star edges reproduces the same labels
        val stars = comp.toSeq.filter { case (id, c) => id != c }
        if (stars.nonEmpty) {
          val again = graft.operators.Curation
            .connectedComponents(stars.toDF("a", "b"), localSolveMax = 0)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(again == comp.filter { case (id, c) =>
            stars.exists(e => e._1 == id || e._2 == id) })
        }
      }
    }
  }

  test("property: leakage-safe split never separates connected docs and covers the corpus") {
    val genCase = for {
      edges <- Gen.listOfN(20,
        Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L))).map(_.filter(e => e._1 != e._2))
      extra <- Gen.listOfN(10, Gen.choose(26L, 40L)) // docs with no edges at all
    } yield (edges, extra)
    forSamples(genCase, 6) { case (edges, extra) =>
      val ids = (edges.flatMap(e => Seq(e._1, e._2)) ++ extra).distinct
      if (ids.nonEmpty) {
        val out = graft.operators.Curation
          .leakageSafeSplit(ids.toDF("doc_id"), edges.toDF("a", "b"), "doc_id")
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        // total: every doc (paired or not) gets exactly one assignment
        assert(out.keySet == ids.toSet)
        // no edge straddles splits, even transitively: same component -> same split
        edges.foreach { case (a, b) =>
          assert(out(a)._2 == out(b)._2, s"edge ($a,$b) crosses splits") }
        out.groupBy(_._2._1).foreach { case (comp, members) =>
          assert(members.values.map(_._2).toSet.size == 1,
            s"component $comp spans multiple splits")
        }
        // stability: a doc's split depends only on its component, so re-running
        // with MORE unrelated singleton docs never moves existing assignments
        val grown = (ids ++ Seq(90L, 91L, 92L)).distinct
        val again = graft.operators.Curation
          .leakageSafeSplit(grown.toDF("doc_id"), edges.toDF("a", "b"), "doc_id")
          .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
        ids.foreach(id => assert(again(id) == out(id)._2, s"doc $id moved on growth"))
      }
    }
  }

  test("property: tokenBudgetMix multiplicity equals the per-domain rate law exactly") {
    import graft.operators.Curation
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def md5Unit(s: String): Double =
      (java.lang.Long.parseLong(md5Hex(s).take(15), 16) % 1000000L).toDouble / 1e6
    val genCase = for {
      nDom <- Gen.choose(1, 4)
      docs <- Gen.listOfN(12, Gen.zip(Gen.choose(0, nDom - 1), Gen.choose(1L, 500L)))
      ws <- Gen.listOfN(nDom, Gen.choose(1, 5)) // integer weights: Σw exact
      budget <- Gen.choose(1000L, 50000L)
    } yield (nDom, docs, ws, budget)
    forSamples(genCase, 10) { case (nDom, docRows, ws, budget) =>
      val df = docRows.zipWithIndex
        .map { case ((d, t), i) => (i.toLong, s"dom$d", t) }
        .toDF("doc_id", "domain", "toks")
      val weights = ws.zipWithIndex.map { case (w, d) => (s"dom$d", w.toDouble) }
        .toDF("domain", "w")
      val maxE = 6.0
      val out = Curation.tokenBudgetMix(df, "domain", "doc_id", "toks",
          weights, budget, maxEpochs = maxE)
        .select("doc_id", "epoch")
        .collect().map(r => (r.getLong(0), r.getInt(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      // Σw sums the whole weight TABLE (domains without docs still dilute the
      // budget — a declared-but-empty domain is configuration, not data)
      val totW = ws.sum.toDouble
      val domToks = docRows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      docRows.zipWithIndex.foreach { case ((d, _), i) =>
        val rate = math.min(maxE,
          budget.toDouble * ws(d) / totW / domToks(d).toDouble)
        val fe = math.floor(rate).toInt
        val expect = (0 until fe) ++
          (if (md5Unit(s"$i:$fe") < rate - fe) Seq(fe) else Nil)
        assert(out.getOrElse(i.toLong, Nil) == expect,
          s"doc $i dom$d rate=$rate: got ${out.getOrElse(i.toLong, Nil)}, want $expect")
      }
    }
  }

  test("property: the type mapper is total (never throws, unknown -> StringType)") {
    val genType = Gen.oneOf(
      Gen.oneOf("int", "bigint", "varchar", "double", "decimal(10,2)", "date",
        "timestamp", "array<int>", "struct<a int, b varchar>", "map"),
      Gen.alphaNumStr)
    forSamples(genType, 40) { t =>
      val dt = TypeMapper.toSpark(t) // must not throw
      assert(dt != null)
    }
  }

  test("property: chrono pattern translation is total over supported tokens + literals") {
    import graft.functions.ChronoFormat
    val tokens = Seq("%Y", "%y", "%m", "%d", "%e", "%a", "%A", "%b", "%B", "%h", "%j",
      "%H", "%k", "%I", "%l", "%p", "%M", "%S", "%f", "%3f", "%6f", "%.f", "%z", "%:z",
      "%D", "%F", "%T", "%R", "%%", "%n", "%t", "%-d", "%-m", "%0d", "%0H")
    val genFmt = Gen.listOf(Gen.oneOf(
      Gen.oneOf(tokens),
      Gen.oneOf(Seq(" ", "-", ":", "/", ".", "T", "at ", "o'clock", "week", "100")))
    ).map(_.mkString)
    forSamples(genFmt, 60) { fmt =>
      val pattern = ChronoFormat.toJavaPattern(fmt) // must not throw
      // the pattern must round-trip through Spark's formatter without error
      val out = spark.sql(
        s"SELECT date_format(timestamp '2024-03-05 14:07:09.123456', '${pattern.replace("'", "''")}')")
        .head.getString(0)
      assert(out != null)
    }
  }

  test("property: composed curation pipeline equals its sequentially-materialized stages") {
    import org.apache.spark.sql.DataFrame
    import graft.operators.Curation
    // The p7 composition law: chaining the five stages as ONE lazy plan (with
    // persisted branch points, exactly like queries/Pipeline's p7) must produce the
    // same survivors as materializing every stage to storage before the next — the
    // invariant that catches future fusion/persist/pushdown bugs in the composition.
    def stages(d: DataFrame, mat: DataFrame => DataFrame): Set[Long] = {
      val bench = d.filter(col("doc_id") % 20 === 0)
      val kept1 = mat(Dedup.exact(d.filter(col("doc_id") % 20 =!= 0), "text", "doc_id"))
      val pairs = mat(Dedup.minHashNearDup(kept1, "text", "doc_id",
        n = 3, k = 32, bands = 16, threshold = 0.7).select(col("id_a"), col("id_b")))
      val members = mat(graft.operators.Curation.connectedComponents(pairs)
        .filter(col("id") =!= col("component")).select(col("id").alias("doc_id")))
      val kept2 = mat(kept1.join(members, Seq("doc_id"), "left_anti"))
      val gated = mat(Curation.decontaminate(kept2, bench, "text", "doc_id", n = 13)
        .select(col("doc_id"),
          TextAnalysis.langId(col("text")).alias("lang_pred"),
          TextAnalysis.qualityScore(col("text")).alias("quality")))
      gated.filter(col("lang_pred") === "en" && col("quality") >= 0.4)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu"
    forSamples(Gen.listOfN(24, genDoc), 4) { texts0 =>
      // plant the structure every stage needs to fire: a bench doc (id % 20 == 0)
      // sharing a 13-gram with a train doc, an exact-dup pair, and a near-dup pair
      val long = (texts0(1) + " " + filler).trim
      val texts = texts0.zipWithIndex.map { case (t, i) =>
        i match {
          case 7 => long
          case 20 => long
          case 13 => texts0(14)
          case 9 => (texts0(11) + " tail").trim
          case _ => t
        }
      }
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .filter(_._2.nonEmpty).toDF("doc_id", "text")
      val composed = stages(d, identity) // one lazy plan, like p7
      val sequential = stages(d, _.localCheckpoint(true)) // hard barrier per stage
      assert(composed == sequential,
        s"composition diverged: composed-only=${(composed -- sequential).take(5)} " +
          s"sequential-only=${(sequential -- composed).take(5)}")
    }
  }

  test("property: quality score is always in [0,1]") {
    forSamples(genDoc, 10) { text =>
      val s = Seq(text).toDF("text")
        .select(TextAnalysis.qualityScore(col("text"))).head.getDouble(0)
      assert(s >= 0.0 && s <= 1.0, s"score $s for '$text'")
    }
  }

  // random tagged event streams over few keys/timestamps so collisions (same-instant
  // rows, ties, empty sides) are generated often
  private val genEvents = for {
    nl <- Gen.choose(0, 15); nr <- Gen.choose(0, 15)
    l <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))
    r <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 20L)))
  } yield (l, r)

  test("property: asofJoin equals the brute-force argmax on random event sets") {
    forSamples(genEvents, 10) { case (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "ts")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t, i * 1.5) }
        .toDF("tie", "k", "ts", "v")
      val got = graft.operators.EventOps
        .asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie")
        .select("id", "asof_ts", "asof_v").collect()
        .map(x => (x.getLong(0), Option(x.get(1)), Option(x.get(2)))).toSet
      val rr = r.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t, i * 1.5) }
      val expect = l.zipWithIndex.map { case ((k, t), i) =>
        val best = rr.filter(x => x._2 == k && x._3 <= t)
          .sortBy(x => (x._3, x._1)).lastOption
        (i.toLong, best.map(_._3: Any), best.map(_._4: Any))
      }.toSet
      assert(got == expect, s"asof diverged\n got=$got\n exp=$expect")
    }
  }

  test("property: rangeJoin equals the brute-force interval filter on random event sets") {
    forSamples(genEvents, 10) { case (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("id", "k", "ts")
      val right = r.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t) }
        .toDF("tie", "k", "ts")
      for ((lo, hi) <- Seq((-5L, 5L), (0L, 3L), (-7L, 0L), (2L, 2L))) {
        val got = graft.operators.EventOps
          .rangeJoin(left, right, Seq("k"), "ts", "ts", lo, hi)
          .select("id", "r_tie").collect()
          .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
        val rr = r.zipWithIndex.map { case ((k, t), i) => (i.toLong + 1000, k, t) }
        val expect = (for {
          ((lk, lt), li) <- l.zipWithIndex
          (tie, rk, rt) <- rr
          if lk == rk && rt >= lt + lo && rt <= lt + hi
        } yield (li.toLong, tie)).sorted
        assert(got == expect, s"range[$lo,$hi] diverged\n got=$got\n exp=$expect")
      }
    }
  }

  test("property: blocked fuzzy pairs equal the brute-force share-a-key + distance filter") {
    // token mode, uncapped: the operator must find EXACTLY the pairs that share
    // >= 1 token AND sit within the distance bound — the blocking completeness
    // theorem, checked against a plain-Scala all-pairs oracle. The tight vocab
    // makes shared tokens the norm and near-miss distances common.
    val genName = Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, Gen.oneOf(
      "acme", "acm", "steel", "stele", "mills", "mill", "inc", "co")).map(_.mkString(" ")))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    forSamples(Gen.listOfN(10, genName), 6) { names =>
      val df = names.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "name")
      for (maxDist <- Seq(1, 3)) {
        val got = graft.operators.EntityResolution
          .blockedFuzzyPairs(df, "name", "id", maxDist = maxDist,
            maxBlock = 100000, blocking = "token")
          .select("id_a", "id_b", "dist").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val expect = (for {
          (a, i) <- names.zipWithIndex
          (b, j) <- names.zipWithIndex
          if i < j
          if a.split(" ").toSet.intersect(b.split(" ").toSet).nonEmpty
          d = lev(a, b)
          if d <= maxDist
        } yield (i.toLong, j.toLong, d)).toSet
        assert(got == expect, s"maxDist=$maxDist\n got=$got\n exp=$expect")
      }
    }
  }

  test("property: hard negatives equal the brute-force different-label ranking") {
    // plain-Scala replica: same double accumulation order as the native cosine
    // kernel, same (cos desc, id) tie-break, same NaN-drops-row semantics
    // (a zero vector's cosine is NaN; `NaN < cut` is false in both)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val genVec = Gen.listOfN(4, Gen.choose(-5, 5)).map(_.map(_.toFloat).toArray)
    forSamples(Gen.listOfN(12, Gen.zip(genVec, Gen.choose(0, 2))), 5) { rows =>
      val df = rows.zipWithIndex.map { case ((v, l), i) => (i.toLong, v, l) }
        .toDF("vec_id", "embedding", "label")
      val got = graft.operators.Similarity
        .hardNegatives(df.filter($"vec_id" < 3), df, k = 3, excludeCos = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val expect = (for {
        ((qv, ql), qi) <- rows.zipWithIndex.take(3)
        ranked = rows.zipWithIndex
          .filter { case ((_, l), _) => l != ql }
          .map { case ((v, _), i) => (i.toLong, cos(qv, v)) }
          .filter { case (_, c) => c < 0.9 } // NaN fails too, as in the operator
          .sortBy { case (i, c) => (-c, i) }
          .take(3)
        ((ni, _), rk) <- ranked.zipWithIndex
      } yield (qi.toLong, ni, rk + 1)).toSet
      assert(got == expect)
    }
  }
}
