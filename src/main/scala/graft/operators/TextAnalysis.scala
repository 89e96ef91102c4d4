package graft.operators

import graft.functions.CrossHash._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: token stats, quality scoring, language
  * ID, fingerprinting. All pure per-row expressions (narrow, codegen,
  * no shuffle) with exact DuckDB oracle equivalents.
  */
object TextAnalysis {

  /** Tiny per-language lexicons for the n-gram/stopword language-ID
    * heuristic. Deterministic and mirrored into the oracle SQL.
    */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "y"))

  val stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is")

  /** BPE-ish subword pattern: letter runs, digit runs, single
    * punctuation — the usual pre-tokenizer shape, identical regex
    * semantics in Spark (Java regex) and DuckDB (RE2) for this
    * pattern.
    */
  val subtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      size(regexp_extract_all(col("text"), lit(subtokenPattern), lit(0))).as("n_subtokens"),
      length(col("text")).as("len"))
      .orderBy("doc_id")

  private def ratio(num: Column, den: Column): Column =
    num.cast("double") / den.cast("double")

  /** Quality score: 0.4 * min(1, tokens/20) + 0.3 * stopword-ratio +
    * 0.3 * alphabetic-char-ratio, rounded to 6 decimals. The exact
    * arithmetic shape is mirrored in the oracle.
    */
  def qualityCol(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val stopRatio = ratio(size(filter(t, w => w.isin(stopwords: _*))), size(t))
    val alphaRatio = ratio(length(regexp_replace(text, "[^a-z]", "")), length(text))
    round(lit(0.4) * least(lit(1.0), nTok / lit(20.0)) +
      lit(0.3) * stopRatio + lit(0.3) * alphaRatio, 6)
  }

  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), qualityCol(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Flesch–Kincaid-style READABILITY grade per document — the
    * complexity signal curation pipelines bin on (too-simple and
    * too-garbled text both get filtered before training). Words are
    * the shared tokenizer's tokens; sentences count `[.!?]`
    * terminators (min 1 so fragments still grade); the syllable
    * proxy counts VOWEL GROUPS (`[aeiou]+` runs — the standard
    * cheap estimator, exact enough for binning). The grade is the
    * published FK formula: 0.39·(words/sentence) +
    * 11.8·(syllables/word) − 15.59. Pure narrow column work — one
    * codegen'd projection, no shuffle; grading 100 TB is map-only.
    */
  def readability(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nWords = size(t).cast("long")
    val nSent = greatest(lit(1L), (size(split(col("text"), "[.!?]")) - 1).cast("long"))
    val nSyl = (size(split(col("text"), "[aeiou]+")) - 1).cast("long")
    docs.select(col("doc_id"), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyl.as("n_syllables"),
        when(nWords > 0,
          round(lit(0.39) * nWords.cast("double") / nSent.cast("double") +
            lit(11.8) * nSyl.cast("double") / nWords.cast("double") - lit(15.59), 6))
          .otherwise(lit(null)).as("fk_grade"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[readability]] — identical regex/count
    * semantics (both engines keep trailing empty splits, so
    * `len(parts) - 1` is the occurrence count on each side).
    */
  val sqlReadability: String =
    s"""SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CASE WHEN n_words > 0 THEN
       |    round(0.39 * n_words / n_sentences + 11.8 * n_syllables / n_words - 15.59, 6)
       |  END AS fk_grade
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(${graft.functions.CrossHash.sqlTokens("text")}) AS BIGINT) AS n_words,
       |    CAST(greatest(1, len(regexp_split_to_array(text, '[.!?]')) - 1) AS BIGINT) AS n_sentences,
       |    CAST(len(regexp_split_to_array(text, '[aeiou]+')) - 1 AS BIGINT) AS n_syllables
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Character n-gram profiles per language (the n-gram half of the
    * language-ID heuristic; literal substrings so occurrence counting
    * is identical in Spark and DuckDB).
    */
  val charNgrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing", "er"),
    "de" -> Seq("ch", "ei", "sch", "en"),
    "fr" -> Seq("ou", "le", "eau", "es"),
    "es" -> Seq("ll", "os", "ción", "ar"))

  /** LITERAL occurrence count of `g` in a text column. Pattern.quote
    * matters: Spark's split() takes a REGEX while the oracle's
    * string_split is literal — an n-gram containing a metachar (e.g.
    * "c.h") would silently change scoring semantics without it.
    */
  private[graft] def literalOccurrences(text: Column, g: String): Column =
    size(split(text, java.util.regex.Pattern.quote(g))) - lit(1)

  /** Language ID: score = 10 * distinct-lexicon hits + total char
    * n-gram occurrences; argmax with a fixed precedence
    * (en > de > fr > es); all-zero -> 'und'.
    */
  def langid(docs: DataFrame): DataFrame = {
    val dt = distinctTokens(col("text"))
    def ngramCount(g: String): Column = literalOccurrences(col("text"), g)
    val scores = lexicons.map { case (lang, words) =>
      val wordScore = size(array_intersect(dt, typedLit(words))) * lit(10)
      val ngScore = charNgrams.toMap.apply(lang).map(ngramCount).reduce(_ + _)
      lang -> (wordScore + ngScore)
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    val pred =
      when(en >= de && en >= fr && en >= es && en > 0, "en")
        .when(de >= fr && de >= es && de > 0, "de")
        .when(fr >= es && fr > 0, "fr")
        .when(es > 0, "es")
        .otherwise("und")
    docs.select(col("doc_id"), pred.as("pred_lang")).orderBy("doc_id")
  }

  /** Document fingerprint: min rolling hash over word 5-gram shingles
    * (winnowing-style); docs shorter than 5 tokens -> -1.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprintFast(col("text"), 5).as("fp"))
      .orderBy("doc_id")

  // ------------------------------------------------------------ oracle SQL

  /** The same quality formula over DuckDB (bound to `documents`). */
  def sqlQuality: String = {
    val t = sqlTokens("text")
    val stop = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, $t AS t, text FROM documents)
       |SELECT doc_id,
       |  round(0.4 * least(1.0, len(t)::DOUBLE / 20.0)
       |      + 0.3 * (len(list_filter(t, w -> w IN ($stop)))::DOUBLE / len(t)::DOUBLE)
       |      + 0.3 * (len(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE / len(text)::DOUBLE), 6) AS quality
       |FROM tok ORDER BY doc_id""".stripMargin
  }

  /** Exact token-count quantiles of the corpus — the standard length-
    * distribution report a curation pipeline runs before filtering.
    *
    * Quantiles are expressed as rationals (num/den) and resolved with
    * INTEGER arithmetic over the cumulative distribution of DISTINCT
    * lengths: p(q) = min len whose cumulative count `cum` satisfies
    * `cum * den >= n * num` (exactly ceil(q*n) without ever touching
    * floats — 0.9*500 in doubles is 450.0000...03, whose ceil is off
    * by one). Scale shape: everything row-scale is a groupBy count;
    * the cumulative distribution over DISTINCT lengths builds
    * two-level — per-range-bucket totals, cross-bucket prefix sums
    * via a (tiny) inequality join, then a PARTITIONED running-sum
    * window within each bucket — so no stage ever funnels through a
    * single task the way a global ORDER BY window would. This is how
    * an EXACT quantile stays feasible at 100 TB — approx_percentile
    * trades that exactness away and could never hash-match an oracle.
    */
  def lengthQuantiles(docs: DataFrame,
      qs: Seq[(Int, Int)] = Seq(50 -> 100, 90 -> 100, 99 -> 100)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(size(tokens(col("text"))).as("len"))
    val freq = lens.groupBy("len").agg(count(lit(1)).as("c"))
    // level 1: range buckets of 1024 adjacent lengths; totals per bucket
    val bucketed = freq.withColumn("bucket", (col("len") / lit(1024)).cast("long"))
    val bTotals = bucketed.groupBy("bucket").agg(sum("c").as("bc"))
    // level 2: prefix sum ACROSS buckets — an inequality join over the
    // bucket-totals frame (|buckets| = |distinct lens|/1024, metadata
    // scale), distributed instead of a global-order window
    val bPrefix = bTotals.as("x")
      .join(bTotals.as("y"), col("y.bucket") < col("x.bucket"), "left")
      .groupBy(col("x.bucket").as("bucket"))
      .agg(coalesce(sum(col("y.bc")), lit(0L)).as("pre"))
    // level 3: running sum WITHIN each bucket (partitioned window)
    val inBucket = Window.partitionBy("bucket").orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.withColumn("inb", sum("c").over(inBucket))
      .join(bPrefix, "bucket")
      .withColumn("cum", col("pre") + col("inb"))
    val total = lens.agg(count(lit(1)).as("n"))
    val withN = cum.crossJoin(broadcast(total))
    // r16: all quantiles from ONE pass — the per-quantile
    // filter+agg arms each re-ran the whole tokenize→freq→cum
    // pipeline (12 parquet scans for 3 quantiles in the measured
    // plan; union arms share nothing). One conditional-min aggregate
    // computes every rank cut in a single pipeline (4 scans), and
    // stack() unpivots the 1-row result to the same (q, len) rows.
    // min(when(cond, len)) over all rows ≡ filter(cond).agg(min):
    // both yield null when no row qualifies (empty corpus).
    val aggs = qs.map { case (num, den) =>
      min(when(col("cum") * den >= col("n") * num, col("len"))).as(s"l_${num}_$den") }
    val one = withN.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${qs.size}, " +
      qs.map { case (num, den) => s"'p$num', l_${num}_$den" }.mkString(", ") +
      ") as (q, len)"
    one.select(expr(stackExpr)).orderBy("q")
  }

  /** Per-group exact token-length quantiles — the per-source
    * thresholds a quality filter derives ("keep docs above this
    * source's p50") where a single global quantile would let a
    * verbose source drown a terse one. Same exact integer-rank rule
    * as [[lengthQuantiles]] (`cum * den >= n * num`, no float ceil
    * drift), but the cumulative distribution partitions naturally by
    * the group key: every window is `partitionBy(group)`, and the
    * windowed frame holds one row per DISTINCT length per group
    * (bounded by max document length — metadata-scale however many
    * documents a group has). No global window, no t5-style bucket
    * trick needed.
    */
  def groupedLengthQuantiles(docs: DataFrame, group: String = "source",
      qs: Seq[(Int, Int)] = Seq(50 -> 100, 90 -> 100)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = docs.select(col(group), size(tokens(col("text"))).as("len"))
    val freq = lens.groupBy(group, "len").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(group).orderBy("len")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = freq.withColumn("cum", sum("c").over(w))
    val totals = lens.groupBy(group).agg(count(lit(1)).as("n"))
    val j = cum.join(totals, group)
    qs.map { case (num, den) =>
      j.filter(col("cum") * den >= col("n") * num)
        .groupBy(group).agg(min("len").as("len"))
        .select(col(group), lit(s"p$num").as("q"), col("len"))
    }.reduce(_ unionByName _).orderBy(group, "q")
  }

  /** DuckDB oracle for [[groupedLengthQuantiles]]. */
  def sqlGroupedLengthQuantiles(group: String = "source",
      qs: Seq[(Int, Int)] = Seq(50 -> 100, 90 -> 100)): String = {
    val arms = qs.map { case (num, den) =>
      s"""SELECT $group, 'p$num' AS q, min(len) AS len
         |FROM cum JOIN tot USING ($group) WHERE cum * $den >= n * $num GROUP BY $group"""
        .stripMargin
    }.mkString("", "\nUNION ALL\n", "")
    s"""WITH lens AS (SELECT $group, CAST(len(${sqlTokens("text")}) AS INTEGER) AS len FROM documents),
       |freq AS (SELECT $group, len, count(*) AS c FROM lens GROUP BY $group, len),
       |cum AS (SELECT $group, len, sum(c) OVER (PARTITION BY $group ORDER BY len) AS cum FROM freq),
       |tot AS (SELECT $group, count(*) AS n FROM lens GROUP BY $group)
       |$arms ORDER BY $group, q""".stripMargin
  }

  /** Top-k vocabulary terms by document frequency — the corpus
    * report behind stopword discovery and the df-ascending token
    * order that similarity prefix filters use on Zipf corpora. One
    * shuffle keyed by term (map-side combine collapses each
    * partition's postings first); top-k via TakeOrderedAndProject.
    */
  def vocabStats(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(distinctTokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(k)

  /** DuckDB oracle for [[vocabStats]]. */
  def sqlVocabStats(k: Int = 20): String =
    s"""SELECT term, count(*) AS df
       |FROM (SELECT doc_id, unnest(${sqlDistinctTokens("text")}) AS term FROM documents)
       |GROUP BY term ORDER BY df DESC, term LIMIT $k""".stripMargin

  /** Top TF-IDF terms per document — the per-doc keyword extraction
    * behind topic tagging and relevance filtering. `score = tf *
    * ln(N / df)`, ranked per doc (rounded BEFORE ranking so the tie
    * order is engine-independent).
    *
    * Scale shape: three shuffles, each keyed — (doc_id, term) for tf,
    * term for the df window, doc_id for the rank window — all
    * partitioned, never global. df deliberately comes from a window
    * over the term partition rather than a groupBy+join: the vocab of
    * a 100 TB web corpus is billions of (noisy) terms, far past
    * broadcast range, and the window reuses the term shuffle the join
    * would have needed anyway. N folds in as a broadcast 1-row
    * aggregate.
    */
  def tfidfTopTerms(docs: DataFrame, perDoc: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val wTerm = Window.partitionBy("term")
    val wDoc = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rk", row_number().over(wDoc).cast("long"))
      .filter(col("rk") <= perDoc)
      .select("doc_id", "term", "score", "rk")
  }

  /** LM-lite SURPRISAL score per document — the unigram stand-in for
    * the perplexity filtering real pipelines run (CCNet, Gopher
    * rules): mean over the doc's tokens of `-ln(C(t) / T)` with
    * `C(t)` the corpus count of token `t` and `T` the corpus token
    * total. Low = made of common words, high = rare/noisy vocabulary.
    *
    * Cross-engine exactness: double addition is order-sensitive, so
    * each doc's per-token `ln C(t)` terms fold over the SORTED count
    * list (ascending) — a fixed association both engines reproduce;
    * the corpus constants fold in once at the end.
    *
    * Scale shape: one token shuffle for corpus counts, a term-keyed
    * join back (billions of terms — never broadcast), and a bounded
    * per-doc sort (list length = the doc's token count). The window
    * reuses the term partitioning like [[tfidfTopTerms]].
    */
  def surprisal(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val wTerm = Window.partitionBy("term")
    val withC = tok.withColumn("c", count(lit(1)).over(wTerm))
    val totals = tok.agg(count(lit(1)).as("t_total"))
    withC
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("c"))).as("cs"), count(lit(1)).as("n_tok"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"),
        round(
          log(col("t_total").cast("double")) -
            aggregate(col("cs"), lit(0.0),
              (s, c) => s + log(c.cast("double"))) / col("n_tok").cast("double"),
          6).as("surprisal"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[surprisal]]. */
  def sqlSurprisal: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |wc AS (SELECT doc_id, term, count(*) OVER (PARTITION BY term) AS c FROM tok),
       |agg AS (
       |  SELECT doc_id, list_sort(list(c)) AS cs, count(*) AS n_tok
       |  FROM wc GROUP BY doc_id),
       |t AS (SELECT count(*) AS t_total FROM tok)
       |SELECT doc_id,
       |  round(ln(t_total::DOUBLE) -
       |    list_reduce(list_prepend(0.0, [ln(c::DOUBLE) for c in cs]), (s, v) -> s + v)
       |      / n_tok::DOUBLE, 6) AS surprisal
       |FROM agg, t ORDER BY doc_id""".stripMargin

  /** Per-document cross-entropy under a corpus BIGRAM language model
    * with add-one smoothing — the conditional upgrade of
    * [[surprisal]]'s unigram score and the shape of the
    * perplexity-filter signal CCNet/Gopher pipelines compute with a
    * trained LM: `H(doc) = -(1/n) Σ ln((c(w1,w2)+1) / (c(w1)+V))`
    * over the doc's adjacent token pairs, `c` corpus counts, `V` the
    * corpus vocabulary size. Rare CONTINUATIONS score high even when
    * every token is individually common — the fluency signal a
    * unigram model cannot see.
    *
    * Cross-engine exactness: the two ln-sums each fold over a SORTED
    * count list (the [[surprisal]] trick), a fixed association both
    * engines reproduce; the two sums stay separate until the final
    * subtraction.
    *
    * Scale shape: one token shuffle for unigram counts, one
    * pair-window shuffle for bigram counts, a term-keyed join back
    * (model tables can hold billions of terms — never broadcast;
    * only the 1-row vocab total broadcasts), bounded per-doc sorts.
    */
  def bigramCrossEntropy(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val uni = tok.groupBy("term").agg(count(lit(1)).as("c1"))
    val bg = docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val withC12 = bg.withColumn("c12",
      count(lit(1)).over(Window.partitionBy("w1", "w2")))
    val joined = withC12.join(uni, col("w1") === col("term")).drop("term")
    val vocab = tok.agg(countDistinct(col("term")).as("v"))
    joined.groupBy("doc_id")
      .agg(sort_array(collect_list(col("c1"))).as("c1s"),
        sort_array(collect_list(col("c12"))).as("c12s"),
        count(lit(1)).as("n_bg"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("n_bg"),
        round(
          (aggregate(col("c1s"), lit(0.0),
            (s, c) => s + log((c + col("v")).cast("double"))) -
            aggregate(col("c12s"), lit(0.0),
              (s, c) => s + log((c + lit(1L)).cast("double"))))
            / col("n_bg").cast("double"),
          6).as("xent"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[bigramCrossEntropy]]. */
  def sqlBigramCrossEntropy: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |uni AS (SELECT term, count(*) AS c1 FROM tok GROUP BY term),
       |tt AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents),
       |bg AS (SELECT doc_id,
       |    unnest([t[i] for i in range(1, len(t))]) AS w1,
       |    unnest([t[i+1] for i in range(1, len(t))]) AS w2
       |  FROM tt WHERE len(t) >= 2),
       |bgc AS (SELECT doc_id, w1, count(*) OVER (PARTITION BY w1, w2) AS c12 FROM bg),
       |j AS (SELECT doc_id, c12, c1 FROM bgc JOIN uni ON bgc.w1 = uni.term),
       |agg AS (SELECT doc_id, list_sort(list(c1)) AS c1s,
       |    list_sort(list(c12)) AS c12s, count(*) AS n_bg
       |  FROM j GROUP BY doc_id),
       |vv AS (SELECT count(DISTINCT term) AS v FROM tok)
       |SELECT doc_id, n_bg,
       |  round((list_reduce(list_prepend(0.0, [ln((c + v)::DOUBLE) for c in c1s]), (s, x) -> s + x)
       |       - list_reduce(list_prepend(0.0, [ln((c + 1)::DOUBLE) for c in c12s]), (s, x) -> s + x))
       |      / n_bg::DOUBLE, 6) AS xent
       |FROM agg, vv ORDER BY doc_id""".stripMargin

  /** Adjacent-token pair frequencies — the statistic a BPE tokenizer
    * trainer recomputes every merge round (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units").
    * One narrow zip+explode and one count aggregate (map-side
    * combined): the 100 TB cost is a single shuffle of pair keys,
    * never of documents. Ties in the ranking are broken
    * lexicographically so the result is total-ordered.
    */
  def bpePairs(docs: DataFrame, k: Int = 50): DataFrame = {
    val toks = tokens(col("text"))
    docs.filter(size(toks) >= 2)
      .select(explode(adjacentPairs(toks)).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b"))
      .limit(k)
  }

  /** DuckDB oracle for [[bpePairs]]. */
  def sqlBpePairs(k: Int = 50): String =
    s"""WITH f AS (SELECT ${sqlTokens("text")} AS toks FROM documents),
       |p AS (SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS pr
       |      FROM f WHERE len(toks) >= 2)
       |SELECT pr[1] AS a, pr[2] AS b, COUNT(*) AS n FROM p GROUP BY 1, 2
       |ORDER BY n DESC, a, b LIMIT $k""".stripMargin

  /** `[(t1,t2), (t2,t3), ...]` as an array of `{a, b}` structs. */
  private def adjacentPairs(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))

  /** Greedy left-to-right merge of every adjacent `(a, b)` occurrence
    * into `a_b` — one pure array fold per row, no shuffle. The fold
    * is the textbook BPE application rule: a just-merged token can't
    * immediately re-merge as the left half ("x x x" with pair (x,x)
    * yields ["x_x", "x"]).
    */
  private[graft] def mergeAdjacent(toks: Column, a: String, b: String): Column =
    aggregate(toks, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat_ws("_", element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** The whole rule TABLE applied in one linear pass per rule —
    * replaces a fold of [[mergeAdjacent]] calls on hot paths
    * (optimization r16, guide §1.2 "per-task work"). [[mergeAdjacent]]
    * is an `aggregate` HOF whose accumulator is REBUILT (array copy)
    * per element: O(|toks|²) work and garbage per document per rule —
    * measured as the dominant cost of t16's corpus-wide apply. This
    * form uses the exact wrapped-token string encoding the DuckDB
    * oracle replays ([[sqlBpeApplyStats]]): tokens joined with double
    * spaces and space-wrapped, each rule one literal
    * `replace(s, ' a  b ', ' a_b ')` — non-overlapping left-to-right,
    * so a just-merged token can't re-match as the left half within
    * the same rule, and later rules see merged tokens like any other
    * (the same greedy non-reentrant semantics as the fold; spaces
    * can't occur inside tokens, so the encoding is collision-free).
    * Each rule is now O(|doc|) string scanning with no per-element
    * allocation. TextAnalysisSpec pins equality against the fold on
    * overlap-heavy cases.
    */
  private[graft] def mergeAdjacentAll(toks: Column, rules: Seq[(String, String)]): Column = {
    val wrapped = concat(lit(" "), array_join(toks, "  "), lit(" "))
    val folded = rules.foldLeft(wrapped) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" ${a}_$b "))
    }
    filter(split(folded, " "), t => length(t) > lit(0))
  }


  /** Train `merges` BPE merge rules over the corpus: each round finds
    * the globally most frequent adjacent pair (one aggregate; ties
    * broken lexicographically, so the learned table is deterministic
    * at any parallelism) and rewrites the token arrays with
    * [[mergeAdjacent]]. Driver traffic is ONE ROW per round; the
    * token state stays distributed and persisted across rounds
    * (re-derived, never re-read from source). Returns the learned
    * rules with the pair count each was chosen at.
    */
  def bpeTrain(docs: DataFrame, merges: Int): Seq[((String, String), Long)] = {
    import org.apache.spark.storage.StorageLevel
    var cur = docs.select(tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
    cur.persist(StorageLevel.MEMORY_AND_DISK)
    // r16: ONE action per round instead of two — the top-pair
    // aggregate over the freshly-persisted state both caches it (the
    // state is a single column, so the aggregate's scan fills the
    // cache completely) and returns the next rule; the separate
    // materializing count() is gone. The learned sequence is
    // unchanged: each rule is still chosen from the fully-rewritten
    // predecessor state.
    def topPair(df: DataFrame): Array[org.apache.spark.sql.Row] =
      df.select(explode(adjacentPairs(col("toks"))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(1).collect()
    val learned = scala.collection.mutable.ListBuffer.empty[((String, String), Long)]
    try {
      var top = topPair(cur)
      var round = 0
      while (round < merges && top.nonEmpty && top.head.getLong(2) >= 2) {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        learned += (((a, b), n))
        round += 1
        if (round == merges) {
          // the just-learned rule is the last one: the rewritten state
          // would only feed a topPair whose result the loop exit
          // discards — skip the final corpus rewrite + aggregate
          // outright (ADVICE r16 low; one full pass per training call)
          top = Array.empty
        } else {
          // single-rule application via the linear string encoding —
          // same semantics as mergeAdjacent (see mergeAdjacentAll).
          // NOTE (r16): binding the rule from a broadcast 1-row frame
          // (to make every round's generated code identical and save
          // ~20 codegen compiles) was TRIED and REVERTED: the
          // crossJoin's BroadcastExchange nests an AdaptiveSparkPlanExec
          // under each round's persisted lineage, and AQE's per-update
          // plan-description strings then grow superlinearly with
          // rounds — the exact blowup bpeTrainSampled's scaladoc
          // documents (reproduced: driver OOM in explainString at 20
          // rounds). Literal rules keep every round's plan a flat
          // project over the cached state.
          val next = cur.select(mergeAdjacentAll(col("toks"), Seq((a, b))).as("toks"))
          next.persist(StorageLevel.MEMORY_AND_DISK)
          top = topPair(next) // materializes next's cache in the same job
          cur.unpersist()
          cur = next
        }
      }
    } finally cur.unpersist()
    learned.toList
  }

  /** [[bpeTrain]] on a BOUNDED deterministic sample — the scale-safe
    * trainer shape. Tokenizer training is universally sample-based
    * (BPE/SentencePiece vocabularies are learned from a few hundred
    * thousand documents regardless of corpus size): running the
    * 20-round aggregate+rewrite loop over 100 TB would be ~40 full
    * corpus passes for a merge table a bounded sample learns
    * identically. The sample is content-addressed
    * ([[Sampling.hashSample]] over the text hash, modulus derived
    * from the corpus count), so the selected docs — and therefore the
    * learned table and its dynamic oracle — are deterministic at any
    * parallelism and across reruns. The sample is also repartitioned
    * to a small fixed width and the training loop runs under a small
    * shuffle-partition count: at 1000 executors the loop collapses
    * onto a handful of tasks instead of scheduling the full scan
    * width 40 times (the 2 jobs/round are scheduling-dominated at
    * sample scale — measured 7.5 s → ~4 s at sf0.1 from the width cut
    * alone), while [[bpeApply]] stays corpus-wide and map-only.
    */
  def bpeTrainSampled(docs: DataFrame, merges: Int,
      budgetDocs: Long): Seq[((String, String), Long)] = {
    val n = docs.count()
    val m = math.max(1L, n / budgetDocs).toInt
    // localCheckpoint (not bare repartition) so the training rounds
    // build on a FLAT LogicalRDD: a shuffle left inside the cached
    // lineage nests an AdaptiveSparkPlanExec under each round's
    // InMemoryRelation, and the per-round plan-description strings
    // then grow superlinearly with rounds (measured: OOM'd an 8 GB
    // driver at 20 rounds before any data pressure). The checkpoint
    // also truncates the wide sampling scan, so each round schedules
    // 4 tasks, not the source corpus's scan width.
    val sample = Sampling.hashSample(docs, col("text"), m)
      .repartition(4).localCheckpoint()
    val spark = docs.sparkSession
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "4") // per-round agg reduces a handful of pairs
    try bpeTrain(sample, merges)
    finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
      sample.unpersist(); ()
    }
  }

  /** Apply a learned merge table ([[bpeTrain]]'s output order) to a
    * document set: the rules fold left-to-right in learning order —
    * exactly how a trained BPE tokenizer segments at inference.
    * Pure narrow column work (one array fold per rule), no shuffle:
    * tokenizing 100 TB with a learned vocabulary is map-only.
    * Returns (doc_id, toks).
    */
  def bpeApply(docs: DataFrame, rules: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
      mergeAdjacentAll(tokens(col("text")), rules).as("toks"))

  /** Per-document segmentation report of a trained BPE vocabulary:
    * base token count and the count after applying the learned merge
    * table ([[bpeApply]]) — the compression a tokenizer-training run
    * checks before freezing a vocab. Map-only at any scale.
    */
  def bpeApplyStats(docs: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val base = tokens(col("text"))
    docs.select(col("doc_id"), size(base).as("n_base"),
      size(mergeAdjacentAll(base, rules)).as("n_merged"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[bpeApplyStats]], replaying the FITTED merge
    * table (s17-style dynamic oracle: the learned rules are embedded
    * as literals; the iterative training itself is not SQL, but a
    * fitted merge table's application is). The greedy left-to-right
    * non-reentrant fold of [[mergeAdjacent]] is reproduced with
    * string `replace`: tokens are each WRAPPED in single spaces and
    * concatenated (`' a  b  c '` — double space between tokens), so
    * the pattern `' a  b '` consumes exactly one adjacent pair and
    * the scan resumes at the next token's own wrap — a just-merged
    * token can't re-match as the left half within the same rule, and
    * later rules see merged tokens (`a_b`) like any other. Spaces
    * can never occur INSIDE a token (the tokenizer splits on space),
    * so the encoding is collision-free for any corpus.
    */
  def sqlBpeApplyStats(rules: Seq[(String, String)]): String = {
    def esc(s: String) = s.replace("'", "''")
    val base = s"' ' || array_to_string(${sqlTokens("text")}, '  ') || ' '"
    val folded = rules.foldLeft(base) { case (e, (a, b)) =>
      s"replace($e, ' ${esc(a)}  ${esc(b)} ', ' ${esc(a)}_${esc(b)} ')"
    }
    s"""SELECT doc_id,
       |  CAST(len(${sqlTokens("text")}) AS INTEGER) AS n_base,
       |  CAST(len(list_filter(string_split($folded, ' '), t -> len(t) > 0)) AS INTEGER) AS n_merged
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** CROSS-SOURCE vocabulary overlap matrix from MERGED KMV sketches
    * — the pairwise leakage/overlap audit two data sources get before
    * being mixed, at sketch cost instead of a vocabulary-scale join
    * per pair: KMV sketches are mergeable (the k smallest of the
    * UNION of two k-min sets IS the union's KMV sketch, Beyer et al.
    * SIGMOD'07), so each source is sketched ONCE and every pairwise
    * union/intersection estimate is arithmetic over two k-element
    * arrays. `|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)` by
    * inclusion-exclusion, and when BOTH sources' vocabularies fit
    * inside their sketches the merged set is exact and so is the
    * estimate. Returns `(src_a, src_b, est_a, est_b, est_union,
    * jaccard_est)` for every unordered source pair.
    *
    * Scale shape: one vocabulary-scale distinct + per-source bounded
    * top-k (the t19 plan); the pair stage joins #sources² rows of
    * k-element arrays — metadata-scale (a mix has tens of sources) —
    * with the merge itself a per-row array op. The corpus is never
    * joined against itself.
    */
  def kmvSourceOverlap(docs: DataFrame, k: Int = 64): DataFrame = {
    import graft.functions.CrossHash
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("source"), explode(CrossHash.distinctTokens(col("text"))).as("w"))
      .select(col("source"),
        ((CrossHash.charFold(col("w")) * lit(KmvA)) % lit(CrossHash.P)).as("h"))
      .distinct()
    val sk = tok
      .withColumn("rn", row_number().over(Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("source")
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n_small"))
    def est(hs: Column, nSmall: Column): Column =
      when(nSmall < k, nSmall.cast("double"))
        .otherwise(lit(((k - 1).toLong * CrossHash.P).toDouble) /
          element_at(hs, k).cast("double"))
    val a = sk.select(col("source").as("src_a"), col("hs").as("ha"), col("n_small").as("na"))
    val b = sk.select(col("source").as("src_b"), col("hs").as("hb"), col("n_small").as("nb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("merged", slice(array_sort(array_distinct(concat(col("ha"), col("hb")))),
        1, k))
      .withColumn("nm", size(col("merged")))
      .select(col("src_a"), col("src_b"),
        round(est(col("ha"), col("na")), 6).as("est_a"),
        round(est(col("hb"), col("nb")), 6).as("est_b"),
        round(est(col("merged"), col("nm")), 6).as("est_union"),
        round(
          greatest(lit(0.0),
            est(col("ha"), col("na")) + est(col("hb"), col("nb")) -
              est(col("merged"), col("nm"))) / est(col("merged"), col("nm")),
          6).as("jaccard_est"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB oracle for [[kmvSourceOverlap]]. */
  def sqlKmvSourceOverlap(k: Int = 64): String = {
    import graft.functions.CrossHash
    val cap = ((k - 1).toLong * CrossHash.P).toDouble
    def est(hs: String, n: String) =
      s"CASE WHEN $n < $k THEN CAST($n AS DOUBLE) ELSE $cap / CAST($hs[$k] AS DOUBLE) END"
    val eu = est("merged", "nm")
    val ea = est("ha", "na")
    val eb = est("hb", "nb")
    s"""WITH tok AS (
       |  SELECT DISTINCT source, CAST((${CrossHash.sqlCharFold("w")} * $KmvA) % ${CrossHash.P} AS BIGINT) AS h
       |  FROM (SELECT source, unnest(${CrossHash.sqlDistinctTokens("text")}) AS w FROM documents)),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM tok),
       |sk AS (SELECT source, list_sort(list(h)) AS hs, COUNT(*) AS n_small
       |       FROM r WHERE rn <= $k GROUP BY source),
       |p AS (SELECT a.source AS src_a, b.source AS src_b,
       |        a.hs AS ha, a.n_small AS na, b.hs AS hb, b.n_small AS nb,
       |        list_sort(list_distinct(a.hs || b.hs))[1:$k] AS merged
       |      FROM sk a JOIN sk b ON a.source < b.source),
       |q AS (SELECT *, len(merged) AS nm FROM p)
       |SELECT src_a, src_b,
       |  round($ea, 6) AS est_a, round($eb, 6) AS est_b,
       |  round($eu, 6) AS est_union,
       |  round(greatest(0.0, $ea + $eb - $eu) / $eu, 6) AS jaccard_est
       |FROM q ORDER BY src_a, src_b""".stripMargin
  }

  /** KMV (K-minimum-values) distinct-cardinality sketch per source:
    * the k smallest distinct token hashes estimate the vocabulary as
    * `(k-1) * P / h_k` (Bar-Yossef et al., "Counting distinct
    * elements in a data stream") — the sketch family a 100 TB profile
    * pass runs instead of exact COUNT(DISTINCT). Unlike HLL, KMV over
    * a DETERMINISTIC hash is exactly replayable in SQL, so the gate
    * hash-checks the sketch itself, not a tolerance band. The exact
    * count rides along for the audit.
    *
    * Scale shape: dedup to (source, hash) is a vocabulary-scale
    * shuffle (never document-scale); the min-k is a bounded-rank
    * window that Spark rewrites to WindowGroupLimit — per-partition
    * partial top-k before the shuffle — so the sketch state per group
    * is k values end-to-end, the same property that makes KMV
    * mergeable across executors.
    */
  /** Multiplier for KMV's uniformizing round: charFold is a
    * polynomial rolling hash, so SHORT tokens land clustered at
    * small values — fine for equality, fatal for an estimator that
    * reads the k-th minimum as a uniform order statistic. One
    * multiplicative round `(h * A) mod P` (A invertible mod the
    * prime P) is a bijection that spreads any value set
    * pseudo-uniformly over [0, P); products stay under 2^63 (h &lt; P
    * ~ 1e9, A ~ 1e9 -> &lt; 1e18) so BOTH engines compute it exactly,
    * with no overflow wrap to disagree on.
    */
  private val KmvA = 961748927L

  def kmvCardinality(docs: DataFrame, k: Int = 64): DataFrame = {
    import graft.functions.CrossHash
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("source"), explode(CrossHash.distinctTokens(col("text"))).as("w"))
      .select(col("source"),
        ((CrossHash.charFold(col("w")) * lit(KmvA)) % lit(CrossHash.P)).as("h"))
      .distinct()
    val exact = tok.groupBy("source").agg(count(lit(1)).as("n_exact"))
    val mink = tok
      .withColumn("rn", row_number().over(Window.partitionBy("source").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("source").agg(max("h").as("kth_hash"), count(lit(1)).as("n_small"))
    exact.join(mink, "source")
      .select(col("source"), col("n_exact"), col("kth_hash"),
        when(col("n_small") < k, col("n_exact").cast("double"))
          .otherwise(round(
            lit(((k - 1).toLong * CrossHash.P).toDouble) / col("kth_hash").cast("double"), 6))
          .as("est"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[kmvCardinality]]. */
  def sqlKmvCardinality(k: Int = 64): String = {
    import graft.functions.CrossHash
    s"""WITH tok AS (
       |  SELECT DISTINCT source, CAST((${CrossHash.sqlCharFold("w")} * $KmvA) % ${CrossHash.P} AS BIGINT) AS h
       |  FROM (SELECT source, unnest(${CrossHash.sqlDistinctTokens("text")}) AS w FROM documents)),
       |ex AS (SELECT source, COUNT(*) AS n_exact FROM tok GROUP BY source),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM tok),
       |km AS (SELECT source, MAX(h) AS kth_hash, COUNT(*) AS n_small
       |       FROM r WHERE rn <= $k GROUP BY source)
       |SELECT ex.source, ex.n_exact, km.kth_hash,
       |  CASE WHEN km.n_small < $k THEN CAST(ex.n_exact AS DOUBLE)
       |       ELSE round(CAST(${(k - 1).toLong * CrossHash.P} AS DOUBLE) / CAST(km.kth_hash AS DOUBLE), 6)
       |  END AS est
       |FROM ex JOIN km ON ex.source = km.source ORDER BY ex.source""".stripMargin
  }

  /** Zipf power-law fit of the token frequency distribution — the
    * corpus-health diagnostic a scraped-text pipeline reads before
    * trusting quality filters tuned on natural language: natural text
    * follows freq ∝ rank^(-alpha) with alpha ≈ 1 (Zipf's law), while
    * machine-generated spam, templated boilerplate, and synthetic
    * corpora flatten (alpha → 0) or collapse to a few tokens (alpha
    * large). Fits ln(freq) on ln(rank) over the top `topN` tokens by
    * closed-form least squares — no iteration, no solver.
    *
    * Scale shape: ONE vocabulary-scale groupBy (map-side combined;
    * token counts, never documents); the ranked head is a bounded
    * top-k (WindowGroupLimit after an orderBy+limit), and the fit is
    * a single aggregate over topN rows. Determinism: the rank order
    * ties on (count desc, token), the regression sums run over ≤topN
    * doubles, and the emitted alpha/intercept round at 1e-6 — far
    * above double summation noise at this term count.
    */
  /** Vocabulary-coverage / OOV-rate audit: fit a frequency-truncated
    * vocabulary (top `vocabSize` terms by corpus frequency, ties by
    * term) and report each source's out-of-vocabulary token rate in
    * exact integer ppm — the coverage check run before freezing a
    * tokenizer vocab, and the domain-shift signal between corpus
    * slices (a source whose OOV rate spikes is the one the vocab
    * under-serves).
    *
    * Scale shape: the vocab is one term-keyed shuffle (map-side
    * combined) + a TakeOrdered(V) — V is the bounded knob, so the
    * result broadcasts; the scoring pass is then a narrow scan with
    * a broadcast-hash membership join, output bounded by |sources|.
    * No float touches the compare (rate is integer ppm).
    */
  def oovStats(docs: DataFrame, vocabSize: Int = 500): DataFrame = {
    val toks = docs.select(col("source"), explode(tokens(col("text"))).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("(1000000L * n_oov) div n_tokens"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[oovStats]] (tok is MATERIALIZED — referenced
    * by both the vocab fit and the scoring join).
    */
  def sqlOovStats(vocabSize: Int = 500): String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT source, unnest(${sqlTokens("text")}) AS term FROM documents),
       |v AS MATERIALIZED (
       |  SELECT term FROM tok GROUP BY term
       |  ORDER BY COUNT(*) DESC, term LIMIT $vocabSize)
       |SELECT source, COUNT(*) AS n_tokens,
       |  SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
       |  ((1000000 * SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)) // COUNT(*))::BIGINT AS oov_ppm
       |FROM tok LEFT JOIN v ON tok.term = v.term
       |GROUP BY source ORDER BY source""".stripMargin

  def zipfFit(docs: DataFrame, topN: Int = 200): DataFrame = {
    import graft.functions.CrossHash
    val cnt = docs.select(explode(CrossHash.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
    val totals = cnt.agg(sum("n").cast("long").as("n_tokens"),
      count(lit(1)).as("n_vocab"))
    // ranks WITHOUT a window: the head is <= topN rows, so pack it
    // into one array, comparator-sort it (count desc, token asc), and
    // posexplode — rank = position. Keeps the plan free of the
    // unpartitioned-WindowExec shape PlanLintSpec bans (a global
    // window serializes on one task; here the bounded sort happens
    // inside a single 200-element array instead).
    val cmp = (a: Column, b: Column) =>
      when(a.getField("n") =!= b.getField("n"),
        when(a.getField("n") > b.getField("n"), lit(-1)).otherwise(lit(1)))
        .otherwise(when(a.getField("t") < b.getField("t"), lit(-1))
          .when(a.getField("t") > b.getField("t"), lit(1)).otherwise(lit(0)))
    val top = cnt.orderBy(desc("n"), col("t")).limit(topN)
      .agg(collect_list(struct(col("n"), col("t"))).as("rs"))
      .select(posexplode(array_sort(col("rs"), cmp)).as(Seq("p", "s")))
      .select(log((col("p") + 1).cast("double")).as("x"),
        log(col("s.n").cast("double")).as("y"))
    val s = top.agg(count(lit(1)).cast("double").as("m"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val slope = (col("m") * col("sxy") - col("sx") * col("sy")) /
      (col("m") * col("sxx") - col("sx") * col("sx"))
    totals.crossJoin(
      s.select(round(-slope, 6).as("alpha"),
        round((col("sy") - slope * col("sx")) / col("m"), 6).as("intercept")))
  }

  /** DuckDB oracle for [[zipfFit]]. */
  def sqlZipfFit(topN: Int = 200): String = {
    import graft.functions.CrossHash
    s"""WITH tok AS (SELECT unnest(${CrossHash.sqlTokens("text")}) AS t FROM documents),
       |cnt AS (SELECT t, count(*)::BIGINT AS n FROM tok GROUP BY 1),
       |top AS (SELECT ln(row_number() OVER (ORDER BY n DESC, t)) AS x, ln(n) AS y
       |        FROM cnt ORDER BY n DESC, t LIMIT $topN),
       |s AS (SELECT count(*)::DOUBLE AS m, sum(x) AS sx, sum(y) AS sy,
       |             sum(x*y) AS sxy, sum(x*x) AS sxx FROM top)
       |SELECT (SELECT sum(n) FROM cnt)::BIGINT AS n_tokens,
       |  (SELECT count(*) FROM cnt)::BIGINT AS n_vocab,
       |  round(-(m*sxy - sx*sy)/(m*sxx - sx*sx), 6) AS alpha,
       |  round((sy - ((m*sxy - sx*sy)/(m*sxx - sx*sx))*sx)/m, 6) AS intercept
       |FROM s""".stripMargin
  }

  /** Surface features for the trained document classifier — the
    * fastText-style signal set a CCNet/GPT-3-style quality or
    * language filter distills into a linear scorer. Every feature is
    * a ratio of integer counts (or a min with a constant), so Spark
    * and DuckDB compute bit-identical doubles; the SQL mirrors are in
    * [[sqlClassifierScores]]. Order matters: the fitted weight vector
    * is positional over this sequence.
    */
  private def classifierFeatures: Seq[Column] = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("double")
    Seq(
      least(lit(1.0), nTok / lit(20.0)),
      when(size(t) > 0, size(filter(t, w => w.isin(stopwords: _*))).cast("double") / nTok)
        .otherwise(lit(0.0)),
      // guarded like its siblings: an empty document must score 0.0,
      // not NaN (0.0/0.0), which would break the cross-engine compare
      when(length(col("text")) > 0,
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text")).cast("double"))
        .otherwise(lit(0.0)),
      when(size(t) > 0, size(array_distinct(t)).cast("double") / nTok).otherwise(lit(0.0)),
      when(size(t) > 0, length(array_join(t, "")).cast("double") / nTok / lit(10.0))
        .otherwise(lit(0.0)))
  }

  /** Train a logistic-regression classifier (label: `lang = 'en'`)
    * on the `doc_id % 5 < 4` split by full-batch gradient descent —
    * the distributed shape of fastText-as-quality-filter training
    * (CCNet; GPT-3's Wikipedia-vs-CommonCrawl classifier): each of
    * the fixed `iters` rounds is ONE `treeAggregate` over the
    * persisted feature vectors accumulating the d+1-dim gradient —
    * at 1000 executors that moves O(partitions × d) doubles per
    * round, never rows, and the feature pass itself is narrow
    * codegen'd column work. Returns `[bias, w1..wd]`.
    */
  def fitDocClassifier(docs: DataFrame, iters: Int = 40, lr: Double = 2.0): Array[Double] = {
    val sp = org.apache.spark.sql.graft.Shim.classic(docs.sparkSession)
    import sp.implicits._
    val feats = docs.filter(col("doc_id") % 5 < 4)
      .select((col("lang") === "en").cast("double").as("y"),
        array(classifierFeatures: _*).as("x"))
      .as[(Double, Seq[Double])].rdd
      .map { case (y, x) => (y, x.toArray) }
    feats.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = classifierFeatures.size
      val w = new Array[Double](d + 1)
      var it = 0
      while (it < iters) {
        val (grad, n) = feats.treeAggregate((new Array[Double](d + 1), 0L))(
          seqOp = { case ((g, c), (y, x)) =>
            var z = w(0)
            var i = 0
            while (i < d) { z += w(i + 1) * x(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-z))
            val err = p - y
            g(0) += err
            i = 0
            while (i < d) { g(i + 1) += err * x(i); i += 1 }
            (g, c + 1L)
          },
          combOp = { case ((g1, c1), (g2, c2)) =>
            var i = 0
            while (i < g1.length) { g1(i) += g2(i); i += 1 }
            (g1, c1 + c2)
          })
        var i = 0
        while (i < w.length) { w(i) -= lr * grad(i) / n; i += 1 }
        it += 1
      }
      w
    } finally { feats.unpersist(); () }
  }

  /** Score the HELD-OUT split (`doc_id % 5 = 4`) with a fitted
    * classifier: one narrow pass emitting the raw logit (monotone in
    * the class probability — reported instead of sigmoid so the
    * cross-engine compare never depends on `exp` rounding). The
    * logit fold is strictly left-to-right so the oracle replays the
    * identical double arithmetic from the identical weight literals.
    */
  def classifierScores(docs: DataFrame, w: Array[Double]): DataFrame = {
    val logit = classifierFeatures.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, i)) => acc + lit(w(i + 1)) * f
    }
    docs.filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), (col("lang") === "en").cast("int").as("label"),
        round(logit, 6).as("logit"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[classifierScores]] with the fitted weights
    * embedded as shortest-round-trip literals (s17-style dynamic
    * oracle — training is iterative Scala, a fitted linear scorer is
    * SQL). Feature arithmetic and fold order mirror
    * [[classifierFeatures]]/[[classifierScores]] exactly.
    */
  def sqlClassifierScores(w: Array[Double]): String = {
    def d(x: Double): String = java.lang.Double.toString(x)
    val stop = stopwords.map(s => s"'$s'").mkString(", ")
    val fs = Seq(
      "least(1.0, len(t)::DOUBLE / 20.0)",
      s"CASE WHEN len(t) > 0 THEN len(list_filter(t, w -> w IN ($stop)))::DOUBLE / len(t)::DOUBLE ELSE 0.0 END",
      "CASE WHEN len(text) > 0 THEN len(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE / len(text)::DOUBLE ELSE 0.0 END",
      "CASE WHEN len(t) > 0 THEN len(list_distinct(t))::DOUBLE / len(t)::DOUBLE ELSE 0.0 END",
      "CASE WHEN len(t) > 0 THEN len(array_to_string(t, ''))::DOUBLE / len(t)::DOUBLE / 10.0 ELSE 0.0 END")
    val logit = fs.zipWithIndex.foldLeft(d(w(0))) {
      case (acc, (f, i)) => s"($acc + ${d(w(i + 1))} * $f)"
    }
    s"""WITH tok AS (SELECT doc_id, lang, text, ${sqlTokens("text")} AS t FROM documents)
       |SELECT doc_id, CAST(lang = 'en' AS INT) AS label, round($logit, 6) AS logit
       |FROM tok WHERE doc_id % 5 = 4 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for [[tfidfTopTerms]] (over `documents`, reported
    * for `doc_id < limitDocs` — the corpus-wide scores are unchanged
    * by the reporting filter).
    */
  def sqlTfidfTopTerms(perDoc: Int = 3, limitDocs: Long = 40): String =
    s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |x AS (SELECT doc_id, term,
       |  round(tf * ln(n_docs / count(*) OVER (PARTITION BY term)), 6) AS score
       |  FROM tf, n),
       |r AS (SELECT doc_id, term, score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term)::BIGINT AS rk
       |  FROM x)
       |SELECT doc_id, term, score, rk FROM r
       |WHERE rk <= $perDoc AND doc_id < $limitDocs
       |ORDER BY doc_id, rk""".stripMargin

  /** DuckDB oracle for [[lengthQuantiles]]. */
  def sqlLengthQuantiles(qs: Seq[(Int, Int)] = Seq(50 -> 100, 90 -> 100, 99 -> 100)): String = {
    val arms = qs.map { case (num, den) =>
      s"SELECT 'p$num' AS q, min(len) AS len FROM cum, t WHERE cum * $den >= n * $num"
    }.mkString("\n|", "\n|UNION ALL\n|", "\n|")
    s"""WITH lens AS (SELECT CAST(len(${sqlTokens("text")}) AS INTEGER) AS len FROM documents),
       |freq AS (SELECT len, count(*) AS c FROM lens GROUP BY len),
       |cum AS (SELECT len, sum(c) OVER (ORDER BY len) AS cum FROM freq),
       |t AS (SELECT count(*) AS n FROM lens)$arms ORDER BY q""".stripMargin
  }

  /** Per-document n-gram repetition (boilerplate) signal: the share
    * of n-gram OCCURRENCES that are repeats of an earlier n-gram in
    * the same document — Gopher-style "repetitive text" quality rule.
    * Narrow and codegen'd (one pass per doc, no shuffle but the final
    * presentation sort); at 100 TB this is a pure map stage.
    */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(
      col("doc_id"),
      greatest(size(tokens(col("text"))) - lit(n - 1), lit(0)).as("n_ngrams"),
      size(shinglesFast(col("text"), n)).as("n_uniq"))
      .withColumn("rep_ratio",
        when(col("n_ngrams") > 0,
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_ngrams").cast("double"), 6))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")

  /** Pipeline retention funnel: how many documents survive each
    * successive filter stage of a C4-style cleaning pass —
    *   1. `n_total`    all documents;
    *   2. `n_len`      + token count in [20, 1000];
    *   3. `n_quality`  + type/token ratio >= 0.3 (t7's repetition
    *                     rule inverted: mostly-repeated docs drop);
    *   4. `n_canonical`+ the doc is its exact-hash group's canonical
    *                     keeper (min doc_id per charFold) — the
    *                     post-exact-dedup survivor count.
    * One narrow pass computes the flags, the canonical test is a
    * window partitioned by content hash (parallel per group), and the
    * funnel is a single global aggregate of partial sums — no stage
    * shuffles the corpus more than once at any scale.
    */
  def retentionFunnel(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = tokens(col("text"))
    val flagged = docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq"),
      charFold(col("text")).as("h"))
      .withColumn("len_ok", col("n_tokens") >= 20 && col("n_tokens") <= 1000)
      .withColumn("qual_ok",
        col("len_ok") && col("n_uniq") >= col("n_tokens") * lit(0.3))
      .withColumn("canon_ok",
        col("qual_ok") &&
          col("doc_id") === min("doc_id").over(Window.partitionBy("h")))
    flagged.agg(
      count(lit(1)).as("n_total"),
      sum(col("len_ok").cast("long")).as("n_len"),
      sum(col("qual_ok").cast("long")).as("n_quality"),
      sum(col("canon_ok").cast("long")).as("n_canonical"))
  }

  /** DuckDB oracle for [[retentionFunnel]]. */
  def sqlRetentionFunnel: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    len(${sqlTokens("text")}) AS n_tokens,
       |    len(${sqlDistinctTokens("text")}) AS n_uniq,
       |    ${sqlCharFold("text")} AS h
       |  FROM documents),
       |g AS (SELECT *,
       |  (n_tokens >= 20 AND n_tokens <= 1000) AS len_ok,
       |  (n_tokens >= 20 AND n_tokens <= 1000 AND n_uniq >= n_tokens * 0.3) AS qual_ok,
       |  (doc_id = min(doc_id) OVER (PARTITION BY h)) AS is_canon
       |  FROM f)
       |SELECT count(*)::BIGINT AS n_total,
       |  sum(len_ok::BIGINT)::BIGINT AS n_len,
       |  sum(qual_ok::BIGINT)::BIGINT AS n_quality,
       |  sum((qual_ok AND is_canon)::BIGINT)::BIGINT AS n_canonical
       |FROM g""".stripMargin

  /** DuckDB oracle for [[repetitionStats]] (n=3). */
  def sqlRepetitionStats: String =
    s"""WITH tok AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents),
       |s AS (SELECT doc_id,
       |  CAST(greatest(len(t) - 2, 0) AS INTEGER) AS n_ngrams,
       |  CAST(len(${sqlShinglesOf("t", 3)}) AS INTEGER) AS n_uniq FROM tok)
       |SELECT doc_id, n_ngrams, n_uniq,
       |  CASE WHEN n_ngrams > 0
       |       THEN round(1 - n_uniq::DOUBLE / n_ngrams, 6) ELSE 0.0 END AS rep_ratio
       |FROM s ORDER BY doc_id""".stripMargin

  /** Gopher-style quality-rule audit (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", table A1): per SOURCE, how many documents pass each
    * individual rule and all of them together —
    *   - `n_words_ok`   token count in [20, 1000] (fixture-scaled
    *                    bounds; Gopher uses [50, 100k]);
    *   - `n_wordlen_ok` mean word length in [3, 10] characters;
    *   - `n_alpha_ok`   ≥ 80% of words contain a letter;
    *   - `n_stop_ok`    ≥ 2 stopword occurrences;
    *   - `n_rep_ok`     duplicate 3-gram occurrence share ≤ 50%
    *                    (the t7 repetition signal as a gate);
    *   - `n_pass`       every rule at once.
    * Thresholds compare in INTEGER arithmetic (`3·n ≤ Σlen ≤ 10·n`,
    * `5·alpha ≥ 4·n`, `2·uniq ≥ n`) so no float rounding can ever
    * disagree between engines at a boundary.
    *
    * Scale shape: one narrow codegen'd pass computes every flag, then
    * ONE groupBy(source) aggregate — a single shuffle of one row per
    * (partition, source) after partial aggregation, at any corpus
    * size.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t).cast("long")
    val sumLen = aggregate(t, lit(0L), (a, w) => a + length(w).cast("long"))
    val nAlpha = size(filter(t, w => w.rlike("[a-zA-Z]"))).cast("long")
    val nStop = size(filter(t, w => w.isin(stopwords: _*))).cast("long")
    val nGrams = greatest(nTok - lit(2), lit(0L))
    val nUniq = size(shinglesFast(col("text"), 3)).cast("long")
    val wordsOk = nTok >= 20L && nTok <= 1000L
    val wordlenOk = nTok > 0L && sumLen >= nTok * 3L && sumLen <= nTok * 10L
    val alphaOk = nTok > 0L && nAlpha * 5L >= nTok * 4L
    val stopOk = nStop >= 2L
    val repOk = nGrams === 0L || nUniq * 2L >= nGrams
    def cnt(c: Column, name: String) =
      sum(when(c, 1L).otherwise(0L)).as(name)
    docs
      .select(col("source"), wordsOk.as("w"), wordlenOk.as("l"),
        alphaOk.as("a"), stopOk.as("s"), repOk.as("r"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        cnt(col("w"), "n_words_ok"), cnt(col("l"), "n_wordlen_ok"),
        cnt(col("a"), "n_alpha_ok"), cnt(col("s"), "n_stop_ok"),
        cnt(col("r"), "n_rep_ok"),
        cnt(col("w") && col("l") && col("a") && col("s") && col("r"), "n_pass"))
      .orderBy("source")
  }

  /** DuckDB oracle for [[gopherRules]] — same integer-arithmetic
    * thresholds over the same whitespace tokens.
    */
  def sqlGopherRules: String = {
    val stopList = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT source, ${sqlTokens("text")} AS t, text FROM documents),
       |m AS (SELECT source,
       |  len(t)::BIGINT AS n_tok,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(t, w -> len(w)::BIGINT)), (a, b) -> a + b) AS sum_len,
       |  len(list_filter(t, w -> regexp_matches(w, '[a-zA-Z]')))::BIGINT AS n_alpha,
       |  len(list_filter(t, w -> list_contains([$stopList], w)))::BIGINT AS n_stop,
       |  greatest(len(t) - 2, 0)::BIGINT AS n_grams,
       |  len(${sqlShinglesOf("t", 3)})::BIGINT AS n_uniq
       |  FROM tok),
       |f AS (SELECT source,
       |  (n_tok >= 20 AND n_tok <= 1000) AS w,
       |  (n_tok > 0 AND sum_len >= n_tok * 3 AND sum_len <= n_tok * 10) AS l,
       |  (n_tok > 0 AND n_alpha * 5 >= n_tok * 4) AS a,
       |  (n_stop >= 2) AS s,
       |  (n_grams = 0 OR n_uniq * 2 >= n_grams) AS r
       |  FROM m)
       |SELECT source, count(*)::BIGINT AS n_docs,
       |  sum(w::BIGINT)::BIGINT AS n_words_ok,
       |  sum(l::BIGINT)::BIGINT AS n_wordlen_ok,
       |  sum(a::BIGINT)::BIGINT AS n_alpha_ok,
       |  sum(s::BIGINT)::BIGINT AS n_stop_ok,
       |  sum(r::BIGINT)::BIGINT AS n_rep_ok,
       |  sum((w AND l AND a AND s AND r)::BIGINT)::BIGINT AS n_pass
       |FROM f GROUP BY source ORDER BY source""".stripMargin
  }

  def sqlLangid: String = {
    val dt = sqlDistinctTokens("text")
    def score(lang: String, words: Seq[String]) = {
      val wordScore = s"len(list_intersect(dt, [${words.map(w => s"'$w'").mkString(", ")}])) * 10"
      val ngScore = charNgrams.toMap.apply(lang)
        .map(g => s"(len(string_split(text, '$g')) - 1)").mkString(" + ")
      s"($wordScore + $ngScore)"
    }
    val Seq(en, de, fr, es) = lexicons.map(l => score(l._1, l._2))
    s"""WITH tok AS (SELECT doc_id, text, $dt AS dt FROM documents),
       |sc AS (SELECT doc_id, $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es FROM tok)
       |SELECT doc_id,
       |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
       |       WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
       |       WHEN s_es > 0 THEN 'es'
       |       ELSE 'und' END AS pred_lang
       |FROM sc ORDER BY doc_id""".stripMargin
  }
}
