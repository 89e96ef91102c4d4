package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("n-gram occurrence counting is literal, not regex") {
    import spark.implicits._
    // "c.h" as a regex would also match "cxh"/"czh"; the langid scorer
    // must count literal substring occurrences (string_split parity).
    val df = Seq((1L, "c.h cxh czh c.h")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.literalOccurrences(col("text"), "c.h").as("n"))
      .collect().head.getInt(0)
    assert(n == 2)
  }

  test("langid picks planted language and falls back to 'und'") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is happy"), // en lexicon hits
      (2L, "der hund und die katze ist da"), // de lexicon hits
      (3L, "zzz qqq 12345")                  // nothing
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langid(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "und")
  }

  test("vocab stats count document frequency, not term frequency") {
    import spark.implicits._
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabStats(df, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 1L), ("c", 1L))) // 'a a' counts once for doc 1
  }

  test("length quantiles use exact integer ranks (no float ceil drift)") {
    import spark.implicits._
    // doc k has k tokens, k = 1..10: p50 -> 5, p90 -> 9, p99 -> 10
    val docs = (1 to 10).map(k => (k.toLong, Seq.fill(k)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val df = TextAnalysis.lengthQuantiles(docs)
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("p50" -> 5, "p90" -> 9, "p99" -> 10))
    // the cumulative distribution must never plan a GLOBAL-order
    // window (single-partition funnel); every window is partitioned
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      df.queryExecution.sparkPlan.toString.take(2000))
  }

  test("grouped quantiles use exact integer ranks per group, partitioned windows only") {
    import spark.implicits._
    // group a: docs of 1..10 tokens (p50=5, p90=9); group b: all 3 tokens
    val docs = ((1 to 10).map(k => ("a", Seq.fill(k)("w").mkString(" "))) ++
      Seq(("b", "w w w"), ("b", "w w w"))).toDF("source", "text")
    val df = TextAnalysis.groupedLengthQuantiles(docs)
    val got = df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(got == Map(("a", "p50") -> 5, ("a", "p90") -> 9,
      ("b", "p50") -> 3, ("b", "p90") -> 3))
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("tfidf ranks corpus-distinctive terms first, per document") {
    import spark.implicits._
    // 'rare' appears only in doc 1 (idf = ln 3); 'com' in all three
    // (idf = 0, never ranks above a positive score)
    val docs = Seq(
      (1L, "com com rare"),
      (2L, "com mid"),
      (3L, "com mid")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, perDoc = 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq.sorted
    val ln3 = BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln15 = BigDecimal(math.log(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, "rare", ln3), (2L, "mid", ln15), (3L, "mid", ln15)))
    // every window in the plan is partitioned (no global rank)
    val wins = TextAnalysis.tfidfTopTerms(docs).queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty))
  }

  test("bpeTrain learns the hand-derived merge table and stops when dry") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b a b"), (3L, "c a b"))
      .toDF("doc_id", "text")
    // round 1: (a,b) appears 5x -> merge; round 2: (a_b,a_b) 2x ->
    // merge; round 3: every pair is a singleton -> dry stop even
    // though more rounds were allowed
    val learned = TextAnalysis.bpeTrain(docs, merges = 10)
    assert(learned == Seq((("a", "b"), 5L), (("a_b", "a_b"), 2L)))
  }

  test("mergeAdjacent is greedy left-to-right: a merged token cannot re-merge") {
    import spark.implicits._
    val got = Seq(Tuple1(Seq("x", "x", "x"))).toDF("toks")
      .select(TextAnalysis.mergeAdjacent(col("toks"), "x", "x").as("m"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("x_x", "x"))
  }

  test("mergeAdjacentAll (linear string encoding) == fold of mergeAdjacent") {
    import spark.implicits._
    // overlap-heavy shapes: same-token runs (x,x), chained rules where
    // a later rule consumes an earlier rule's output, pairs straddling
    // a just-merged token, single/empty docs, rule tokens with '_'
    val docs = Seq(
      Seq("x", "x", "x"), Seq("x", "x", "x", "x"),
      Seq("a", "b", "b", "a", "b"), Seq("a", "a", "b"),
      Seq("a", "b", "a", "b", "c"), Seq("c"), Seq.empty[String],
      Seq("a_b", "a_b", "a"), Seq("b", "a", "b", "a"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val rules = Seq(("x", "x"), ("a", "b"), ("a_b", "a_b"), ("a_b_a_b", "c"))
    val viaFold = rules.foldLeft(col("toks")) {
      case (acc, (a, b)) => TextAnalysis.mergeAdjacent(acc, a, b)
    }
    val rows = docs.select(col("id"), viaFold.as("f"),
      TextAnalysis.mergeAdjacentAll(col("toks"), rules).as("g"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id=${r.getLong(0)}: fold=${r.getSeq[String](1)} linear=${r.getSeq[String](2)}")
    }
  }

  test("bpeApply segments with the learned rules: corpus shrinks, learned pairs vanish") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b a b"), (3L, "c a b"))
      .toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrain(docs, merges = 10).map(_._1)
    val applied = TextAnalysis.bpeApply(docs, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // hand-derivation: (a,b) then (a_b,a_b)
    assert(applied(1L) == Seq("a_b_a_b", "c"))
    assert(applied(2L) == Seq("a_b_a_b"))
    assert(applied(3L) == Seq("c", "a_b"))
    // token count strictly shrinks and no learned pair survives
    val before = docs.select(explode(graft.functions.CrossHash.tokens(col("text")))).count()
    val after = TextAnalysis.bpeApply(docs, rules)
      .select(explode(col("toks"))).count()
    assert(after < before)
  }

  test("bpeApplyStats matches a pure-Scala greedy-fold reference on a randomized corpus") {
    import spark.implicits._
    // tiny alphabet so merges chain and re-merge across rules
    val rnd = new scala.util.Random(42)
    val docs = (1L to 60L).map { id =>
      val n = rnd.nextInt(13)
      (id, Seq.fill(n)("abc".charAt(rnd.nextInt(3)).toString).mkString(" "))
    }.toDF("doc_id", "text")
    val rules = TextAnalysis.bpeTrain(docs, merges = 8).map(_._1)
    assert(rules.nonEmpty)
    def refApply(toks: Seq[String]): Seq[String] =
      rules.foldLeft(toks) { case (ts, (a, b)) =>
        ts.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ s"${a}_$b"
          else acc :+ x
        }
      }
    val want = docs.collect().map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
      (r.getLong(0), toks.size, refApply(toks).size)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.bpeApplyStats(docs, rules)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == want)
  }

  test("KMV sketch: exact below k, estimate within 30% above it") {
    import spark.implicits._
    // 'small' source: 10 distinct tokens (< k=64) -> exact path;
    // 'big' source: 2000 distinct tokens -> sketch path
    val small = (1L to 5L).map(i =>
      (i, s"tok${i * 2} tok${i * 2 + 1}", "small"))
    val big = (100L to 149L).map(i =>
      (i, (0 until 40).map(j => s"w${(i - 100) * 40 + j}").mkString(" "), "big"))
    val docs = (small ++ big).toDF("doc_id", "text", "source")
    val got = TextAnalysis.kmvCardinality(docs, k = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(got("small") == ((10L, 10.0))) // exact path below k
    val (exact, est) = got("big")
    assert(exact == 2000L)
    assert(math.abs(est - exact.toDouble) / exact < 0.30,
      s"KMV estimate $est too far from exact $exact")
  }

  test("trained classifier separates the labeled classes on the held-out split") {
    import spark.implicits._
    // en docs: stopword-rich running text; others: stopword-free
    val docs = (0L until 50L).map { id =>
      if (id % 2 == 0)
        (id, "the cat and the dog is in a house of wonder to behold", "en")
      else
        (id, "gato perro casa calle cielo mar tierra fuego agua luz", "es")
    }.toDF("doc_id", "text", "lang")
    val w = TextAnalysis.fitDocClassifier(docs, iters = 60, lr = 2.0)
    val scored = TextAnalysis.classifierScores(docs, w)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val (pos, neg) = scored.partition(_._1 == 1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // perfect separation on this linearly-separable fixture
    assert(pos.map(_._2).min > neg.map(_._2).max,
      s"classifier failed to separate: $scored")
  }

  test("gopher rules flag each failure mode independently") {
    import spark.implicits._
    // 25 varied tokens (passes all); 5 tokens (fails only word count);
    // 25 copies of a 24-letter word (fails mean word length, stopwords,
    // repetition); 25 copies of "dup" (fails stopwords + repetition)
    val sane = ("the quick brown fox jumps over the lazy dog and runs far " +
      "away into deep dark woods where owls hoot all night long very loud")
    val short = "the and big cat dog"
    val long = Seq.fill(25)("pneumonoultramicroscopic").mkString(" ")
    val rep = Seq.fill(25)("dup").mkString(" ")
    val docs = Seq(
      (1L, sane, "s1"), (2L, short, "s1"), (3L, long, "s2"), (4L, rep, "s2")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // s1: sane passes everything; short fails only word count
    assert(got("s1") == ((2L, 1L, 2L, 2L, 2L, 2L, 1L)))
    // s2: both pass word count + alpha; long fails wordlen; both fail
    // stopwords and repetition (a single distinct trigram each)
    assert(got("s2") == ((2L, 2L, 1L, 2L, 0L, 0L, 0L)))
  }

  test("bpePairs ranking is total-ordered (count desc, then lexicographic)") {
    import spark.implicits._
    val docs = Seq((1L, "b c"), (2L, "a b"), (3L, "a b b c")).toDF("doc_id", "text")
    val rows = TextAnalysis.bpePairs(docs, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a", "b", 2L), ("b", "c", 2L), ("b", "b", 1L)))
  }

  test("kmv source overlap: exact when sketches hold the vocab, close when saturated") {
    import spark.implicits._
    def doc(id: Long, src: String, lo: Int, hi: Int) =
      (id, (lo to hi).map(i => f"w$i%03d").mkString(" "), src)
    // small vocabularies (<= k = 64): the merged sketch IS the union,
    // every estimate exact
    val small = Seq(doc(1, "a", 1, 30), doc(2, "b", 20, 50))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.kmvSourceOverlap(small).head()
    assert((r.getString(0), r.getString(1)) == (("a", "b")))
    assert(r.getDouble(2) == 30.0 && r.getDouble(3) == 31.0)
    assert(r.getDouble(4) == 50.0, s"union must be exact: ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 11.0 / 50.0) < 1e-6)
    // saturated sketches (vocab 400 >> k): estimates within sketch
    // error (~1/sqrt(k) ~ 12.5%) of the truth
    val big = Seq(doc(1, "a", 1, 400), doc(2, "b", 201, 600))
      .toDF("doc_id", "text", "source")
    val s = TextAnalysis.kmvSourceOverlap(big).head()
    assert(math.abs(s.getDouble(4) - 600.0) / 600.0 < 0.25,
      s"union est ${s.getDouble(4)} vs 600")
    assert(math.abs(s.getDouble(5) - 200.0 / 600.0) < 0.15,
      s"jaccard est ${s.getDouble(5)} vs ${200.0 / 600.0}")
  }

  test("zipfFit recovers the planted power-law exponent") {
    import spark.implicits._
    // plant freq(rank i) = round(3000 / i^1.2): the ln-ln regression
    // over the exact head must recover alpha ~ 1.2
    val words = (1 to 40).flatMap { i =>
      val n = math.round(3000.0 / math.pow(i, 1.2)).toInt
      Seq.fill(n)(f"w$i%02d")
    }
    // spread over docs so the token counts survive the per-doc split
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, id) => (id.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, topN = 40).head()
    val (nTokens, nVocab, alpha) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nVocab == 40L)
    assert(nTokens == words.size.toLong)
    assert(math.abs(alpha - 1.2) < 0.02,
      s"planted exponent 1.2, fitted $alpha")
    // a flat corpus (every token equally frequent) fits alpha ~ 0
    val flat = (1 to 30).flatMap(i => Seq.fill(100)(s"f$i"))
    val flatDocs = flat.grouped(50).zipWithIndex
      .map { case (g, id) => (id.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val a0 = TextAnalysis.zipfFit(flatDocs, topN = 30).head().getDouble(2)
    assert(math.abs(a0) < 1e-9, s"flat corpus must fit alpha 0, got $a0")
  }

  test("OOV rate: frequency-truncated vocab with deterministic tie-break") {
    import spark.implicits._
    // freq: a=3, b=2, c=2, d=1 — vocab of 2 is {a, b} (c ties b, term
    // order keeps b); source y holds the c and d outliers
    val docs = Seq(
      (1L, "a a b c", "x"),
      (2L, "a b c d", "y")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.oovStats(docs, vocabSize = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("x", 4L, 1L, 250000L),  // c is OOV
      ("y", 4L, 2L, 500000L))) // c and d are OOV
  }

  test("sampled BPE trainer reproduces full-corpus head merges on Zipfian text (r12 ask #2)") {
    // The t16 contract: a bounded content-addressed sample learns the
    // merge table the full corpus would, so the trainer stays
    // corpus-size-flat at 100 TB. On the flat synthetic vocabulary
    // this is UNPROVABLE (all pairs equally likely, head ranking is
    // sampling noise — overlap was 1/20, NOTES.md r12); on Zipfian
    // text — the distribution real corpora follow — the head pairs
    // are separated by the rank-frequency law and a 1/10 sample must
    // reproduce them.
    val docs = graft.fixtures.TestFixtures.zipfDocs(spark) // 2400 docs
    docs.persist()
    try {
      val merges = 20
      // budget >= corpus -> modulus 1: the SAME harness trains on all
      // docs, so the comparison isolates sampling, not code paths
      val full = TextAnalysis.bpeTrainSampled(docs, merges, budgetDocs = 1000000L).map(_._1)
      val sampled = TextAnalysis.bpeTrainSampled(docs, merges, budgetDocs = 240L).map(_._1)
      assert(full.size == merges && sampled.size == merges)
      val overlap = full.toSet intersect sampled.toSet
      assert(overlap.size >= 15,
        s"sampled trainer reproduced only ${overlap.size}/$merges head merges:\n" +
          s"full   : $full\nsampled: $sampled")
      assert(full.take(5) == sampled.take(5),
        s"first five merges must agree in ORDER (the head of the table):\n" +
          s"full   : ${full.take(5)}\nsampled: ${sampled.take(5)}")
    } finally { docs.unpersist(); () }
  }
}
