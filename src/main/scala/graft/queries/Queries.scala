package graft.queries

import graft.fixtures.TestFixtures
import graft.functions.CrossHash
import graft.functions.VectorFunctions
import graft.operators.{Chunking, Clustering, Dedup, EventAnalytics, PipelineAudit, Multimodal, Packing, Pii, Profile, RangeJoin, Sampling, Search, Similarity, SkewUtils, Skyline, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-facing query inventory: every entry pairs a Spark
  * implementation with an exactly-equivalent DuckDB oracle SQL (same
  * column names, same deterministic ORDER BY, arithmetic written so
  * both engines produce identical values — decimals for sums, shared
  * fold order for doubles, cross-engine hashes for dedup).
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Model fitted by the last s17_pca_topk run — published so the
    * oracle dump (which Verify writes AFTER running every query) can
    * embed the exact components the dumped parquet was projected
    * with. Eigenvectors can't be re-derived in SQL, but a fitted
    * projection is just k literal dot products.
    */
  @volatile private[graft] var s17Model: Option[graft.operators.Pca.PcaModel] = None

  /** Merge table learned by the last t16_bpe_apply run (same
    * fitted-model-embed contract as [[s17Model]]).
    */
  @volatile private[graft] var t16Rules: Option[Seq[(String, String)]] = None

  /** Weights fitted by the last t17_classifier run. */
  @volatile private[graft] var t17Weights: Option[Array[Double]] = None

  /** Integer keep-thresholds derived by the last d28_temperature_mix
    * run (same fitted-literal-embed contract as [[s17Model]]: the
    * per-domain probabilities are driver-computed doubles, so both
    * engines must compare the content hash against the SAME frozen
    * integers).
    */
  @volatile private[graft] var d28Thresholds: Option[Map[String, Long]] = None

  /** Blocking resolution chosen by the last s22_knn_graph run
    * ([[graft.operators.Similarity.autoPlanes]] of the corpus size) —
    * the oracle must replay the SAME resolution.
    */
  @volatile private[graft] var s22Planes: Option[Int] = None

  /** Oracles only known after a query has run (s17's fitted-model
    * embed). Empty until the corresponding query executes, which
    * matches the driver flow: Verify runs queries, then dumps SQL.
    */
  def dynamicOracles: Map[String, String] =
    s17Model.map(m =>
      "s17_pca_topk" -> graft.operators.Pca.sqlReducedTopK(m, 7L, 10)).toMap ++
      t16Rules.map(r =>
        "t16_bpe_apply" -> TextAnalysis.sqlBpeApplyStats(r)).toMap ++
      t17Weights.map(w =>
        "t17_classifier" -> TextAnalysis.sqlClassifierScores(w)).toMap ++
      d28Thresholds.map(t =>
        "d28_temperature_mix" -> Sampling.sqlTemperatureAudit(t)).toMap ++
      s22Planes.map(p =>
        "s22_knn_graph" -> graft.operators.Similarity.sqlKnnGraph(3, p)).toMap

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Location for a persisted index derived from `$sfDir/$table
    * .parquet`. The path carries a size+mtime stamp of the source
    * parquet, so a regenerated fixture can never silently probe a
    * stale index; the root is configurable (graft.index.root),
    * defaulting to the JVM temp dir — never a checkout-layout
    * absolute path.
    */
  private def stampedIndexPath(spark: SparkSession, sfDir: String,
      table: String, suffix: String): String = {
    val srcPath = new org.apache.hadoop.fs.Path(s"$sfDir/$table.parquet")
    val fs = srcPath.getFileSystem(spark.sessionState.newHadoopConf())
    val leaves =
      if (fs.getFileStatus(srcPath).isDirectory) fs.listStatus(srcPath).toSeq
      else Seq(fs.getFileStatus(srcPath))
    val stamp = java.lang.Long.toHexString(
      leaves.map(st => st.getLen * 1315423911L ^ st.getModificationTime).sum)
    val root = sys.props.getOrElse("graft.index.root",
      new java.io.File(sys.props("java.io.tmpdir"), "graft_corpus_index").getPath)
    s"$root/${new org.apache.hadoop.fs.Path(sfDir).getName.replace(".", "_")}" +
      s"_${table}_${stamp}_$suffix"
  }

  private def dec2(c: String) = col(c).cast("decimal(18,2)")

  /** Shared staging for the streaming-ingest gate trio (st2/st4/st5):
    * the corpus staged ONCE per scale factor as four files (one per
    * micro-batch), plus a FIXED per-format table dir under the
    * fixture root, deleted before each run — deterministic rebuild,
    * no tmpdir leak, and the sink genuinely re-streams every run
    * instead of no-op replaying its own old marks.
    */
  /** Files per micro-batch for the stateful streaming replays. The
    * registered/bench form is the constant default; the system
    * property exists ONLY so `graft.tools.StreamAB` can A/B trigger
    * granularity inside one JVM (box-speed variance across separate
    * runs was larger than the effect being measured, NOTES r14).
    *
    * Default 2 (r13 verdict ask #2): the 4-file replays still cross
    * multiple micro-batches — watermark advancement, state eviction,
    * and no-data timeout batches all still exercise — at ~60% of the
    * per-trigger fixed cost (interleaved medians, NOTES r14: st7
    * 7.2->4.2 s, st11 7.5->5.0 s, st12 5.5->3.4 s on RocksDB+
    * changelog). Peak buffered state doubles (watermark advances
    * every 2 files) — still watermark-bounded, and trigger sizing is
    * exactly the knob a production job tunes.
    */
  private def filesPerTrigger: String =
    graft.streaming.EventStreams.filesPerTrigger

  private def stagedDocStream(spark: SparkSession, sf: String,
      tag: String): (DataFrame, String) = {
    val docs = t(spark, sf, "documents")
    val stage = TestFixtures.docsStreamDir(spark, sf)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val loc = s"${TestFixtures.root(sf)}/stream_ingest_$tag"
    val fs = new org.apache.hadoop.fs.Path(loc)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(loc), true)
    (stream, loc)
  }

  // ================================================================ core SQL

  val core: Map[String, (Q, String)] = Map(
    "q1_pricing_summary" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            // decimal sums are exact; the final cast to double is one
            // correctly-rounded conversion, identical in both engines
            // (decimal outputs hash-mismatch at the driver layer)
            sum(dec2("l_quantity")).cast("double").as("sum_qty"),
            sum(dec2("l_extendedprice")).cast("double").as("sum_base"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc"),
            round(sum(dec2("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q2_filter_in" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem")
          .filter(col("l_quantity") > 45 && col("l_returnflag").isin("A", "N") &&
            (col("l_discount") < 0.02 || col("l_tax") > 0.07) && col("l_shipdate").isNotNull)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
          .orderBy("l_orderkey", "l_linenumber").limit(100)
      },
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag IN ('A', 'N')
        |  AND (l_discount < 0.02 OR l_tax > 0.07) AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    "q3_segment_revenue" -> ((
      (spark: SparkSession, sf: String) => {
        val li = t(spark, sf, "lineitem"); val o = t(spark, sf, "orders"); val c = t(spark, sf, "customer")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("c_mktsegment")
      },
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q4_region_balance" -> ((
      (spark: SparkSession, sf: String) => {
        val c = t(spark, sf, "customer"); val n = t(spark, sf, "nation"); val r = t(spark, sf, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_cust"), sum(dec2("c_acctbal")).cast("double").as("tot_bal"))
          .orderBy("r_name")
      },
      """SELECT r_name, COUNT(*) AS n_cust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS tot_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    "q5_cte_reagg" -> ((
      (spark: SparkSession, sf: String) => {
        val o = t(spark, sf, "orders"); val c = t(spark, sf, "customer")
        val stats = o.filter(col("o_orderstatus").isin("O", "F"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), sum(dec2("o_totalprice")).as("tot"))
        val big = stats.filter(col("n_orders") >= 2)
        big.join(c, big("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_cust"),
            sum(col("n_orders")).as("n_orders"),
            round(sum(col("tot")).cast("double") / sum(col("n_orders")), 4).as("avg_price"),
            count(when(col("n_orders") > 3, 1)).as("heavy"))
          .orderBy("c_mktsegment")
      },
      """WITH order_stats AS (
        |  SELECT o_custkey, COUNT(*) AS n_orders, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |  FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY o_custkey
        |), big AS (SELECT * FROM order_stats WHERE n_orders >= 2)
        |SELECT c_mktsegment,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(b.n_orders) AS BIGINT) AS n_orders,
        |  ROUND(CAST(SUM(b.tot) AS DOUBLE) / SUM(b.n_orders), 4) AS avg_price,
        |  COUNT(CASE WHEN b.n_orders > 3 THEN 1 END) AS heavy
        |FROM big b JOIN customer c ON b.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    "q6_topk_orders" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)
      },
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    "q7_distinct_agg" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem").groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "q8_setops" -> ((
      (spark: SparkSession, sf: String) => {
        val a = t(spark, sf, "customer").select(col("c_nationkey").as("k")).distinct()
        val b = t(spark, sf, "supplier").select(col("s_nationkey").as("k")).distinct()
        a.except(b).withColumn("op", lit("except"))
          .unionAll(a.intersect(b).withColumn("op", lit("intersect")))
          .orderBy("op", "k")
      },
      """SELECT k, 'except' AS op FROM
        |  (SELECT DISTINCT c_nationkey AS k FROM customer EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT k, 'intersect' AS op FROM
        |  (SELECT DISTINCT c_nationkey AS k FROM customer INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
        |ORDER BY op, k""".stripMargin)),

    // bag-semantics set ops (EXCEPT ALL / INTERSECT ALL keep
    // multiplicities — a different operator from q8's distinct
    // forms); aggregated afterward so the oracle rows stay compact
    "q42_setops_all" -> ((
      (spark: SparkSession, sf: String) => {
        val o = t(spark, sf, "orders")
        val a = o.filter(col("o_custkey") % 10 === 1).select(col("o_orderpriority").as("p"))
        val b = o.filter(col("o_custkey") % 10 === 2).select(col("o_orderpriority").as("p"))
        a.exceptAll(b).groupBy("p").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all"))
          .unionByName(a.intersectAll(b).groupBy("p").agg(count(lit(1)).as("n"))
            .withColumn("op", lit("intersect_all")))
          .orderBy("op", "p")
      },
      """WITH a AS (SELECT o_orderpriority AS p FROM orders WHERE o_custkey % 10 = 1),
        |     b AS (SELECT o_orderpriority AS p FROM orders WHERE o_custkey % 10 = 2)
        |SELECT p, n, 'except_all' AS op FROM
        |  (SELECT p, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY p)
        |UNION ALL
        |SELECT p, n, 'intersect_all' AS op FROM
        |  (SELECT p, COUNT(*) AS n FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY p)
        |ORDER BY op, p""".stripMargin)),

    // LATERAL correlated subquery join (top-2 customers per nation):
    // Catalyst decorrelates the per-row ORDER BY/LIMIT subquery into
    // a window-ranked join — one shuffle, never a per-row re-scan
    "q43_lateral" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "nation").createOrReplaceTempView("q43_nation")
        t(spark, sf, "customer").createOrReplaceTempView("q43_customer")
        spark.sql(
          """SELECT n.n_name, l.c_name, l.c_acctbal
            |FROM q43_nation n,
            | LATERAL (SELECT c_name, c_acctbal FROM q43_customer c
            |          WHERE c.c_nationkey = n.n_nationkey
            |          ORDER BY c_acctbal DESC, c_name LIMIT 2) l
            |ORDER BY n.n_name, l.c_acctbal DESC, l.c_name""".stripMargin)
      },
      """SELECT n.n_name, l.c_name, l.c_acctbal
        |FROM nation n,
        | LATERAL (SELECT c_name, c_acctbal FROM customer c
        |          WHERE c.c_nationkey = n.n_nationkey
        |          ORDER BY c_acctbal DESC, c_name LIMIT 2) l
        |ORDER BY n.n_name, l.c_acctbal DESC, l.c_name""".stripMargin)),

    // ordered string aggregation: ANSI LISTAGG ... WITHIN GROUP in
    // Spark, the equivalent ordered string_agg in DuckDB — the
    // deterministic ORDER BY inside the aggregate is the point
    "q44_listagg" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "nation").createOrReplaceTempView("q44_nation")
        spark.sql(
          """SELECT n_regionkey,
            |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
            |FROM q44_nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
      },
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    "q9_window_rank" -> ((
      (spark: SparkSession, sf: String) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(spark, sf, "orders")
          .withColumn("rn", row_number().over(w))
          .withColumn("run_tot", sum(dec2("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "run_tot")
          .orderBy("o_custkey", "rn")
      },
      """SELECT o_custkey, rn, o_orderkey, run_tot FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER w AS INTEGER) AS rn,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (w ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_tot
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    "q10_subquery_avg" -> ((
      (spark: SparkSession, sf: String) => {
        val o = t(spark, sf, "orders")
        val avgP = o.agg((sum(dec2("o_totalprice")).cast("double") / count(lit(1))).as("ap"))
        o.crossJoin(broadcast(avgP))
          .filter(col("o_totalprice") > col("ap"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), min("o_orderkey").as("first_key"))
          .orderBy("o_orderstatus")
      },
      """SELECT o_orderstatus, COUNT(*) AS n, MIN(o_orderkey) AS first_key
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    "q11_string_funcs" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "documents").select(
          col("doc_id"),
          upper(substring(col("source"), 1, 3)).as("src3"),
          regexp_extract(col("source"), "src([0-9]+)", 1).cast("int").as("src_num"),
          length(col("text")).as("len"),
          substring(regexp_replace(col("text"), "data", "DATA"), 1, 40).as("replaced"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, upper(substr(source, 1, 3)) AS src3,
        |  CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INT) AS src_num,
        |  CAST(len(text) AS INTEGER) AS len,
        |  substr(regexp_replace(text, 'data', 'DATA', 'g'), 1, 40) AS replaced
        |FROM documents ORDER BY doc_id""".stripMargin)),

    "q12_json_extract" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.events(spark, sf)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
          .groupBy("event_type")
          .agg(sum("k").as("sum_k"), count(when(col("k") > 50, 1)).as("n_big"), count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      """SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(CASE WHEN k > 50 THEN 1 END) AS n_big, COUNT(*) AS n
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "q13_hourly_events" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.events(spark, sf)
          // the hour bucket goes out as a formatted string: timestamp
          // columns (like decimals) hash differently across the
          // driver's two readers even when values are equal
          .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec2("value")).cast("double").as("sv"))
          .orderBy("h", "event_type")
      },
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)),

    // pivot (wide aggregation): daily event counts, one column per
    // event type. The value list is EXPLICIT, so Spark skips the
    // distinct-values discovery pass and plans ONE aggregate — same
    // single-shuffle shape as any groupBy at any scale; the oracle
    // spells the equivalent portable CASE aggregation
    "q25_pivot" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.events(spark, sf)
          .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("d"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("d")
      },
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin)),

    "q14_sessionize" -> ((
      (spark: SparkSession, sf: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val gapUs = 1800L * 1000000L
        val x = TestFixtures.events(spark, sf)
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("ns",
            when(col("prev").isNull ||
              unix_micros(col("ts").cast("timestamp")) - unix_micros(col("prev")) > gapUs, 1).otherwise(0))
          .withColumn("sid", sum(col("ns"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        x.groupBy("user_id", "sid").agg(count(lit(1)).as("n_events"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"), max("n_events").as("max_len"), sum("n_events").as("n_events"))
          .orderBy("user_id")
      },
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g AS (SELECT user_id, sid, COUNT(*) AS n_events FROM s GROUP BY user_id, sid)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_len, CAST(SUM(n_events) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // range join via timeline bucketing: events inside the 2h window
    // after each sampled purchase — a grid-cell equi-join, never a
    // BroadcastNestedLoopJoin (both sides stay shuffle-joinable at
    // any scale)
    "q24_range_join" -> ((
      (spark: SparkSession, sf: String) => {
        val ev = TestFixtures.events(spark, sf)
        val w = 2L * 3600 * 1000000
        val intervals = ev
          .filter(col("event_type") === "purchase" && col("user_id") % 199 === 0)
          .select(col("event_id").as("interval_id"),
            unix_micros(col("ts").cast("timestamp")).as("lo"),
            (unix_micros(col("ts").cast("timestamp")) + lit(w)).as("hi"))
        val points = ev.select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("t"))
        RangeJoin.pointInInterval(intervals, points, bucketWidth = w)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct("event_id").as("n_events"),
            countDistinct("interval_id").as("n_intervals"))
      },
      """WITH iv AS (
        |  SELECT event_id AS interval_id, epoch_us(ts) AS lo, epoch_us(ts) + 7200000000 AS hi
        |  FROM events WHERE event_type = 'purchase' AND user_id % 199 = 0),
        |pt AS (SELECT event_id, epoch_us(ts) AS t FROM events)
        |SELECT count(*) AS n_pairs, count(DISTINCT event_id) AS n_events,
        |  count(DISTINCT interval_id) AS n_intervals
        |FROM iv JOIN pt ON t BETWEEN lo AND hi""".stripMargin)),

    // ordered conversion funnel: first-signup -> purchase within 7
    // days, strict ordering (user-keyed aggregates + co-partitioned
    // join; no global windows)
    "q27_ordered_funnel" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.orderedFunnel(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlOrderedFunnel())),

    // weekly cohort retention matrix (first-event cohort x activity
    // week offset)
    "q28_cohort_retention" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.cohortRetention(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlCohortRetention())),

    // salted skew join through the oracle gate: identical rows to the
    // plain equi-join (only the shuffle distribution changes), proven
    // value-for-value against the unsalted SQL. TARGETED: only the
    // heavy-hitter keys (orders with >= 5 line items — a real subset
    // at every SF) are salted; the dim rows replicated are exactly
    // the hot ones, never the full orders table.
    "q26_salted_join" -> ((
      (spark: SparkSession, sf: String) =>
        SkewUtils.saltedJoinTargeted(
          t(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
          t(spark, sf, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
          "l_orderkey", saltFactor = 8, minCount = 5L)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    "q19_asof_join" -> ((
      (spark: SparkSession, sf: String) => {
        val ev = TestFixtures.events(spark, sf)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts")
        graft.operators.AsOfJoin.joinPrior(purchases, clicks, "user_id", "ts")
          .select(col("event_id"), col("user_id"),
            (unix_micros(col("ts").cast("timestamp")) - unix_micros(col("asof_ts"))).as("gap_us"))
          .orderBy("event_id")
      },
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin)),

    "q16_recursive_cte" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "nation").createOrReplaceTempView("nation_v")
        spark.sql(
          """WITH RECURSIVE r(n) AS (
            |  SELECT 0 UNION ALL SELECT n + 5 FROM r WHERE n < 20
            |)
            |SELECT r.n, count(*) AS n_nations
            |FROM r JOIN nation_v ON nation_v.n_nationkey >= r.n AND nation_v.n_nationkey < r.n + 5
            |GROUP BY r.n ORDER BY r.n""".stripMargin)
      },
      """WITH RECURSIVE r(n) AS (
        |  SELECT 0 UNION ALL SELECT n + 5 FROM r WHERE n < 20
        |)
        |SELECT r.n, COUNT(*) AS n_nations
        |FROM r JOIN nation ON nation.n_nationkey >= r.n AND nation.n_nationkey < r.n + 5
        |GROUP BY r.n ORDER BY r.n""".stripMargin)),

    "q17_rollup" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("q"))
          .orderBy("rf", "ls")
      },
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)),

    // full cube (all 2^k grouping sets in the one Expand pass Spark
    // plans for grouping analytics)
    // correlated EXISTS / NOT EXISTS — planned as semi/anti joins
    // (never a per-row subquery loop); customers split by whether a
    // big order exists
    "q32_exists" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "customer").createOrReplaceTempView("q32_customer")
        t(spark, sf, "orders").createOrReplaceTempView("q32_orders")
        spark.sql(
          """SELECT c_mktsegment,
            |  count(CASE WHEN EXISTS (
            |    SELECT 1 FROM q32_orders o
            |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) THEN 1 END) AS n_big,
            |  count(CASE WHEN NOT EXISTS (
            |    SELECT 1 FROM q32_orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS n_none
            |FROM q32_customer c
            |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      """SELECT c_mktsegment,
        |  count(CASE WHEN EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) THEN 1 END) AS n_big,
        |  count(CASE WHEN NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS n_none
        |FROM customer c
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // running aggregate with an explicit window frame (ROWS UNBOUNDED
    // PRECEDING): per-customer ordered cumulative sum — partitioned
    // window, never a global sort
    // order-independent exact statistics: corr/stddev/covar derived
    // from DECIMAL power sums (one map-side-combinable aggregate, no
    // second pass), so the result is bit-identical at any parallelism
    // — the only double arithmetic is the shared closed-form tail
    "q34_stats_agg" -> ((
      (spark: SparkSession, sf: String) => {
        val x = dec2("l_quantity"); val y = dec2("l_extendedprice")
        val s = t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
          count(lit(1)).cast("double").as("n"),
          sum(x).cast("double").as("sx"),
          sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"))
        val n = col("n"); val sx = col("sx"); val sy = col("sy")
        val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
        // round(,6) on every float output (r16 correctness fix, both
        // sides consistently): the raw-moment sums are exact DECIMAL,
        // but once they exceed 2^53 scaled units the decimal->double
        // CAST itself rounds, and Java's correctly-rounded
        // BigDecimal.doubleValue and DuckDB's scaled-integer division
        // can land one ULP apart — observed on regenerated sf0.001
        // data (corr -0.020151421273443604 vs ...36). Same precision
        // contract as every sibling float query (q5/q11/d3/...).
        s.select(col("l_returnflag"),
          round((n * sxy - sx * sy) /
            sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("corr_qty_price"),
          round(sqrt((n * sxx - sx * sx) / (n * (n - lit(1)))), 6).as("stddev_qty"),
          round((n * sxy - sx * sy) / (n * n), 6).as("covar_pop_qp"))
          .orderBy("l_returnflag")
      },
      """WITH s AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS corr_qty_price,
        |  round(sqrt((n*sxx - sx*sx) / (n*(n-1))), 6) AS stddev_qty,
        |  round((n*sxy - sx*sy) / (n*n), 6) AS covar_pop_qp
        |FROM s ORDER BY l_returnflag""".stripMargin)),

    // FULL OUTER join of two pre-aggregated sides (null-padded both
    // ways); aggregates first, so the shuffled join inputs are
    // key-cardinality-sized, not table-sized
    "q35_outer_join" -> ((
      (spark: SparkSession, sf: String) => {
        val c = t(spark, sf, "customer")
          .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("custs"))
        val s = t(spark, sf, "supplier").filter(col("s_acctbal") < 0)
          .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("supps"))
        c.join(s, col("nk_c") === col("nk_s"), "full_outer")
          .select(coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
            coalesce(col("custs"), lit(0L)).as("custs"),
            coalesce(col("supps"), lit(0L)).as("supps"))
          .orderBy("nationkey")
      },
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS custs FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk, COUNT(*) AS supps FROM supplier
        |           WHERE s_acctbal < 0 GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey, COALESCE(custs, 0) AS custs,
        |  COALESCE(supps, 0) AS supps
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nationkey""".stripMargin)),

    // navigation window functions (lag/lead/first_value/ntile) over a
    // unique sort key — one shuffle on the partition key, in-partition
    // sort only
    "q36_window_nav" -> ((
      (spark: SparkSession, sf: String) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        val tp = dec2("o_totalprice")
        t(spark, sf, "orders").filter(col("o_custkey") % 100 === 7)
          .select(col("o_custkey"), col("o_orderkey"),
            tp.cast("double").as("price"),
            lag(tp, 1).over(w).cast("double").as("prev_price"),
            lead(tp, 1).over(w).cast("double").as("next_price"),
            first(tp).over(w).cast("double").as("first_price"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_price,
        |  CAST(LEAD(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS next_price,
        |  CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS first_price,
        |  NTILE(4) OVER w AS quartile
        |FROM orders WHERE o_custkey % 100 = 7
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // time-interval RANGE frame: per event, trailing-1-hour stats for
    // the same user. The frame keys on integer MICROSECONDS
    // (unix_micros/epoch_us) so both engines bound the frame with
    // exact integer compares — interval literals would route through
    // each engine's own calendar arithmetic. One shuffle on user_id;
    // the running frame is a single sort-based window pass.
    "q45_range_interval" -> ((
      (spark: SparkSession, sf: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L)
        t(spark, sf, "events").filter(col("user_id") % 50 === 7)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_hr"),
            min(col("value")).over(w).as("min_hr"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_hr,
        |  min(value) OVER w AS min_hr
        |FROM events WHERE user_id % 50 = 7
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)),

    // forward-fill (LOCF): carry each user's last observed purchase
    // amount onto every later event — last_value IGNORE NULLS over a
    // running ROWS frame, null before the first observation. The
    // observed value passes through unchanged (no float arithmetic),
    // so the fill is bit-exact across engines. The time-series gap
    // repair every feature pipeline needs; one user-keyed window.
    "q46_forward_fill" -> ((
      (spark: SparkSession, sf: String) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(spark, sf, "events").filter(col("user_id") % 50 === 3)
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .select(col("user_id"), col("event_id"), col("event_type"),
            last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
              .over(w).as("last_purchase"))
          .orderBy("user_id", "event_id")
      },
      """SELECT user_id, event_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER w AS last_purchase
        |FROM events WHERE user_id % 50 = 3
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin)),

    // fixed-width histogram via shared floor arithmetic (identical
    // IEEE ops in both engines — no engine-internal width_bucket
    // variance); narrow map + one aggregate
    "q37_histogram" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem")
          .groupBy(floor(col("l_extendedprice") / 10000.0).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("l_extendedprice")).cast("double").as("total"))
          .orderBy("bucket")
      },
      """SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // UNPIVOT (wide metrics -> long metric/value rows) via stack() on
    // an aggregated base: the expensive part happens once, the
    // reshape is a narrow projection
    "q38_unpivot" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem").groupBy("l_returnflag").agg(
          sum(dec2("l_quantity")).cast("double").as("sum_qty"),
          sum(dec2("l_extendedprice")).cast("double").as("sum_price"),
          count(lit(1)).cast("double").as("cnt"))
          .selectExpr("l_returnflag",
            "stack(3, 'cnt', cnt, 'sum_price', sum_price, 'sum_qty', sum_qty) AS (metric, value)")
          .orderBy("l_returnflag", "metric")
      },
      """WITH a AS (SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(COUNT(*) AS DOUBLE) AS cnt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM a
        |UNION ALL SELECT l_returnflag, 'cnt', cnt FROM a
        |ORDER BY l_returnflag, metric""".stripMargin)),

    // calendar gap-fill: a generated month spine LEFT-joined against
    // sparse aggregates (missing months surface as explicit zeros) —
    // the spine is rows-not-data, broadcast regardless of table size
    "q39_series_fill" -> ((
      (spark: SparkSession, sf: String) => {
        val m = spark.range(1, 13).select(col("id").as("mon"))
        val o = t(spark, sf, "orders")
          .filter(year(col("o_orderdate")) === 1995 &&
            col("o_orderpriority") === "1-URGENT")
          .groupBy(month(col("o_orderdate")).cast("long").as("mon_o"))
          .agg(count(lit(1)).as("n"))
        m.join(o, col("mon") === col("mon_o"), "left")
          .select(col("mon"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("mon")
      },
      """WITH m AS (SELECT unnest(generate_series(1, 12)) AS mon),
        |     o AS (SELECT EXTRACT(month FROM o_orderdate) AS mon, COUNT(*) AS n
        |           FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |             AND o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT m.mon, COALESCE(o.n, 0) AS n FROM m LEFT JOIN o ON m.mon = o.mon
        |ORDER BY m.mon""".stripMargin)),

    // correlated scalar subquery in the SELECT list — Catalyst
    // decorrelates it into ONE left outer join against the
    // pre-aggregated inner side (never a per-row probe); empty inner
    // groups surface as NULL in both engines. Known Catalyst shape:
    // the inner aggregate runs over ALL of lineitem even though only
    // the filtered orderkeys are consumed — when the outer filter is
    // this selective, hand-written pipelines should semi-join the
    // inner side by the outer keys first (one extra broadcast) before
    // aggregating; the registration keeps the SQL-surface form
    "q40_scalar_subquery" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "orders").createOrReplaceTempView("q40_orders")
        t(spark, sf, "lineitem").createOrReplaceTempView("q40_lineitem")
        spark.sql(
          """SELECT o_orderkey,
            |  (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            |   FROM q40_lineitem WHERE l_orderkey = o_orderkey) AS max_price
            |FROM q40_orders WHERE o_custkey % 500 = 7 ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey,
        |  (SELECT CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |   FROM lineitem WHERE l_orderkey = o_orderkey) AS max_price
        |FROM orders WHERE o_custkey % 500 = 7 ORDER BY o_orderkey""".stripMargin)),

    // date arithmetic across a join: day-count differences sum
    // EXACTLY as integers, so the only double op is the final
    // average division (shared op order with the oracle)
    "q41_date_arith" -> ((
      (spark: SparkSession, sf: String) => {
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
        t(spark, sf, "lineitem").join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(month(col("l_shipdate")).cast("long").as("mon"))
          .agg(count(lit(1)).as("n"),
            (sum(datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
              .cast("double") / count(lit(1)).cast("double")).as("avg_lag"))
          .orderBy("mon")
      },
      """SELECT EXTRACT(month FROM l_shipdate) AS mon, COUNT(*) AS n,
        |  CAST(SUM(DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_lag
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "q33_running_sum" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "orders").createOrReplaceTempView("q33_orders")
        spark.sql(
          """SELECT o_custkey, o_orderkey,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
            |FROM q33_orders WHERE o_custkey % 100 = 7
            |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run
        |FROM orders WHERE o_custkey % 100 = 7
        |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // explicit GROUPING SETS (the general form cube/rollup sugar
    // over): one shuffle expands the set list, no per-set re-scan
    "q31_grouping_sets" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem").createOrReplaceTempView("q31_lineitem")
        spark.sql(
          """SELECT coalesce(l_returnflag, 'ALL') AS rf,
            |  coalesce(l_linestatus, 'ALL') AS sm,
            |  COUNT(*) AS n,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM q31_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
            |ORDER BY rf, sm""".stripMargin)
      },
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS sm,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY rf, sm""".stripMargin)),

    "q29_cube" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("q"))
          .orderBy("rf", "ls")
      },
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin)),

    "q18_semi_anti" -> ((
      (spark: SparkSession, sf: String) => {
        val c = t(spark, sf, "customer"); val o = t(spark, sf, "orders")
        val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
        val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders"))
        withO.unionAll(withoutO).select("kind", "n").orderBy("kind")
      },
      """SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY kind""".stripMargin)),

    "q15_array_agg" -> ((
      (spark: SparkSession, sf: String) => {
        t(spark, sf, "lineitem").groupBy("l_returnflag")
          .agg(
            concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
        |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))
  )

  // ================================================================ glue engine

  val glue: Map[String, (Q, String)] = Map(
    "g1_glue_prune" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT l_linestatus, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM glue.default.lineitem_part WHERE l_returnflag = 'A'
            |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
      },
      """SELECT l_linestatus, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    "g2_glue_join" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT o.o_orderpriority, count(*) AS n
            |FROM glue.default.lineitem_part l
            |JOIN glue.default.orders_flat o ON l.l_orderkey = o.o_orderkey
            |WHERE l.l_returnflag = 'R'
            |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    "g3_glue_view" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        eng.setupFor("SELECT * FROM glue.default.orders_flat")
        spark.sql(
          """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
            |FROM GLUE__default_orders_flat GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      """SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    "g4_proj_date" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT event_type, count(*) AS n FROM glue.default.events_by_day
            |WHERE dt = '2024-01-02' GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE strftime(ts, '%Y-%m-%d') = '2024-01-02'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "g5_proj_enum" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT source, count(*) AS n, sum(n_chars) AS chars FROM glue.default.docs_by_lang
            |WHERE lang = 'fr' GROUP BY source ORDER BY source""".stripMargin)
      },
      """SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents
        |WHERE lang = 'fr' GROUP BY source ORDER BY source""".stripMargin)),

    "g6_iceberg_latest" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).tableDF("default", "iceberg_lineitem")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "g7_iceberg_travel" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).tableDF("default", "iceberg_lineitem", versionOffset = 1)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_orderkey % 2 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // incremental snapshot read: only the rows ADDED between the two
    // fixture snapshots (snapshot 2 appended the odd-orderkey file) —
    // the scan plans just the delta files, cost proportional to the
    // append, not the table
    "g22_iceberg_incremental" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf)
          .tableDFIncremental("default", "iceberg_lineitem", fromOffset = 1)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_orderkey % 2 = 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Delta incremental read — the third leg of the g22/g33
    // symmetry: the file-set diff between v0 (even file only) and v1
    // (+ odd file) plans EXACTLY the added file from cached log
    // state; cost is the delta, not the table
    "g36_delta_incremental" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf)
          .tableDFIncremental("default", "delta_lineitem", fromOffset = 2, toOffset = 1)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_orderkey % 2 = 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Delta-log table (beyond-reference: the reference's classifier
    // declares DELTA but can never return it): latest version = v2,
    // whose log REMOVED the even-orderkey file — the live set is odds
    // only, resolved from checkpoint+tail replay, never a file walk
    "g25_delta_read" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT l_returnflag, count(*) AS n,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM glue.default.delta_lineitem
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_orderkey % 2 = 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Delta WRITE path through the oracle gate: write orders evens as
    // commit 0, append the odds as commit 1, read the table back —
    // proves the self-written log (metaData, adds, stats, atomic
    // rename) round-trips through the reader exactly
    "g31_delta_write" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_write_rt"
        // rebuild from scratch each run: the query must be a pure
        // function of the source, not of prior runs
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_write_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_write_rt")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_write_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Delta RESTORE through the oracle gate: write evens, append
    // odds, delete the low half, then RESTORE to the pre-delete
    // version — the latest read must equal the full table again (the
    // oracle over ALL orders proves the rollback, not a time-travel
    // read). History stays intact; pure metadata commit.
    "g37_delta_restore" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_restore_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_restore_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_restore_rt")
        eng.deleteDeltaWhere("default", "delta_restore_rt",
          col("o_orderpriority") < "3-MEDIUM")
        eng.restoreDeltaTable("default", "delta_restore_rt", 1)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_restore_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Delta SHALLOW CLONE through the oracle gate: write evens,
    // append odds, delete the low priorities, CLONE (zero-copy: v0
    // references the source's live files by absolute path), then
    // append urgent-evens ONLY to the clone — the combined read must
    // show the clone evolving independently while the source is
    // untouched, proving both the borrowed-file read and isolation
    "g46_delta_clone" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_clone_src"
        val cloneLoc = s"${TestFixtures.root(sf)}/delta_clone_rt"
        val fs = new org.apache.hadoop.fs.Path(cloneLoc)
          .getFileSystem(spark.sessionState.newHadoopConf())
        fs.delete(new org.apache.hadoop.fs.Path(cloneLoc), true)
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_clone_src", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_clone_src")
        eng.deleteDeltaWhere("default", "delta_clone_src",
          col("o_orderpriority") < "3-MEDIUM")
        eng.cloneDeltaTable("default", "delta_clone_src", "delta_clone_rt", cloneLoc)
        eng.appendDeltaTable(
          o.filter(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 2 === 0),
          "default", "delta_clone_rt")
        eng.query(
          """SELECT tbl, o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM (
            |  SELECT 'src' AS tbl, * FROM glue.default.delta_clone_src
            |  UNION ALL
            |  SELECT 'clone' AS tbl, * FROM glue.default.delta_clone_rt)
            |GROUP BY tbl, o_orderpriority ORDER BY tbl, o_orderpriority""".stripMargin)
      },
      """SELECT tbl, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM (
        |  SELECT 'src' AS tbl, o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderpriority >= '3-MEDIUM'
        |  UNION ALL
        |  SELECT 'clone' AS tbl, o_orderpriority, o_totalprice FROM orders
        |  WHERE o_orderpriority >= '3-MEDIUM'
        |     OR (o_orderpriority = '1-URGENT' AND o_orderkey % 2 = 0))
        |GROUP BY tbl, o_orderpriority ORDER BY tbl, o_orderpriority""".stripMargin)),

    // Delta MERGE (upsert) through the oracle gate — the CDC
    // primitive every incremental pipeline runs: write the even
    // orders, then merge ONE source batch that both UPDATES (every
    // 10th key re-priced to priority 9-MERGED) and INSERTS (all odd
    // keys). Stats-surgical copy-on-write: only files whose key
    // bounds intersect the source span rewrite; the read-back proves
    // replaced rows replaced exactly once and inserts landed.
    "g47_delta_merge" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_merge_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_merge_rt", loc)
        val src = o.filter(col("o_orderkey") % 2 === 1)
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_orderpriority", lit("9-MERGED")))
        eng.mergeDelta("default", "delta_merge_rt", src, "o_orderkey")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_merge_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """WITH m AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN '9-MERGED'
        |              ELSE o_orderpriority END AS o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Row-level UPDATE ... SET through the oracle gate: write evens
    // then odds (two commits, so several files), UPDATE the low keys'
    // priority in place — the same stats-surgical copy-on-write as
    // the Delta delete (provably unaffected files keep their physical
    // file). A string SET keeps the compare float-free.
    "g48_delta_update" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_update_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_update_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_update_rt")
        eng.updateDeltaWhere("default", "delta_update_rt",
          col("o_orderkey") < 500, Map("o_orderpriority" -> lit("0-TOUCHED")))
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_update_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT CASE WHEN o_orderkey < 500 THEN '0-TOUCHED'
        |            ELSE o_orderpriority END AS o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Delta DELETION-VECTOR delete through the oracle gate: the
    // merge-on-read path (positions sidecar + descriptor re-add, ZERO
    // data files rewritten — the fn require()s that every run), so
    // Delta carries both delete shapes like real Delta; the read
    // anti-joins the DV before the aggregate the oracle replays
    "g51_delta_dv" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_dv_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_dv_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_dv_rt")
        val before = eng.files("default", "delta_dv_rt").map(_.path).toSet
        eng.deleteDeltaWhereMor("default", "delta_dv_rt",
          col("o_orderpriority") < "3-MEDIUM")
        require(eng.files("default", "delta_dv_rt").map(_.path).toSet == before,
          "deletion-vector delete must not rewrite any data file")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_dv_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Delta CHANGE-DATA-FEED read through the oracle gate: net
    // row-level diff between the initial write and the post-DV-delete
    // head — inserts are the appended rows still alive, deletes the
    // exact DV'd positions read back out of the unchanged data files
    "g52_delta_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_cdf_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_cdf_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_cdf_rt")
        eng.deleteDeltaWhereMor("default", "delta_cdf_rt",
          col("o_orderpriority") < "3-MEDIUM")
        eng.deltaChanges("default", "delta_cdf_rt", 2, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 0 AND o_orderpriority < '3-MEDIUM'
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 1 AND o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Iceberg CHANGELOG scan through the oracle gate — the g52 twin:
    // net row-level diff between the initial snapshot and the
    // post-MOR-delete head, position-delete deltas read back out of
    // the unchanged data files
    "g53_iceberg_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_cdf_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_cdf_rt", loc)
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1), "default", "ice_cdf_rt")
        eng.deleteIcebergWhere("default", "ice_cdf_rt",
          col("o_orderpriority") < "3-MEDIUM")
        eng.icebergChanges("default", "ice_cdf_rt", 2, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 0 AND o_orderpriority < '3-MEDIUM'
        |GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 1 AND o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Iceberg CHANGELOG over a MERGE snapshot (r12 verdict ask #3):
    // the range crosses an EQUALITY-delete delta — the case g53's
    // first cut refused. Liveness is evaluated at both snapshots with
    // the scan path's own sequence-scoped delete application: inserts
    // are the merge batch (same-sequence data survives its own eq
    // delete), deletes are the prior snapshot's rows the merge keys
    // killed.
    "g54_iceberg_merge_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_mcdf_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_mcdf_rt", loc)
        val src = o.filter(col("o_orderkey") % 2 === 1)
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_orderpriority", lit("9-MERGED")))
        eng.mergeIceberg("default", "ice_mcdf_rt", src, "o_orderkey")
        eng.icebergChanges("default", "ice_mcdf_rt", 1, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """WITH ins AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT '9-MERGED' AS o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |del AS (
        |  SELECT o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM ins GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM del GROUP BY o_orderpriority)
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Iceberg HIDDEN PARTITIONING through the oracle gate: the table
    // is bucket[8]-partitioned on o_orderkey (spec transform, no
    // user-visible partition column), and the IN probe prunes the
    // file listing to the named keys' buckets via the spec's Murmur3
    // bucket hash before planning — at 100 TB an equality probe scans
    // 1/N of the table. The aggregate over the surviving rows is what
    // the oracle hashes; IcebergWriterSpec separately proves the
    // files-scanned count.
    "g55_iceberg_bucket_prune" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_bucket_rt"
        eng.writeIcebergTableBucketed(o, "default", "ice_bucket_rt", loc, "o_orderkey", 8)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_bucket_rt
            |WHERE o_orderkey IN (1, 7, 32, 4033, 65)
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey IN (1, 7, 32, 4033, 65)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Delta COLUMN MAPPING through the oracle gate: rename a column
    // as a metadata-only commit (zero files rewritten), append MORE
    // data under the new logical name (written back under the fixed
    // physical name), and aggregate through the rename — the oracle
    // sees one consistent logical schema across both file
    // generations.
    "g57_delta_rename" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_ren_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_ren_rt", loc)
        eng.renameDeltaColumn("default", "delta_ren_rt", "o_orderpriority", "priority")
        eng.appendDeltaTable(
          o.filter(col("o_orderkey") % 2 === 1).withColumnRenamed("o_orderpriority", "priority"),
          "default", "delta_ren_rt")
        eng.query(
          """SELECT priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_ren_rt
            |WHERE priority >= '3-MEDIUM'
            |GROUP BY priority ORDER BY priority""".stripMargin)
      },
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY priority""".stripMargin)),

    // Delta DROP COLUMN + re-add through the oracle gate: the column
    // leaves the schema metadata-only (zero files rewritten), then a
    // later append re-introduces the NAME — which must bind to a
    // FRESH physical column, so the pre-drop rows read NULL instead
    // of resurrecting the bytes still sitting in their files.
    "g58_delta_drop" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_drop_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_drop_rt", loc)
        eng.dropDeltaColumn("default", "delta_drop_rt", "o_orderpriority")
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority"), "default", "delta_drop_rt")
        eng.query(
          """SELECT coalesce(o_orderpriority, '(dropped)') AS priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_drop_rt
            |GROUP BY 1 ORDER BY priority""".stripMargin)
      },
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(dropped)'
        |            ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // Iceberg COLUMN RENAME through the oracle gate — the field-id
    // twin of Delta's g57: rename is a metadata-only commit (ids are
    // the identity, names are display; zero files rewritten), a later
    // append arrives under the NEW logical name and is written back
    // under the fixed physical name, and the aggregate reads one
    // consistent logical schema across both file generations.
    "g59_iceberg_rename" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_ren_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_ren_rt", loc)
        eng.renameIcebergColumn("default", "ice_ren_rt", "o_orderpriority", "priority")
        eng.appendIcebergTable(
          o.filter(col("o_orderkey") % 2 === 1).withColumnRenamed("o_orderpriority", "priority"),
          "default", "ice_ren_rt")
        eng.query(
          """SELECT priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_ren_rt
            |WHERE priority >= '3-MEDIUM'
            |GROUP BY priority ORDER BY priority""".stripMargin)
      },
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY priority""".stripMargin)),

    // Iceberg DROP COLUMN + re-add through the oracle gate — the
    // field-id twin of Delta's g58: the drop retires the field id
    // metadata-only, and the re-added NAME binds to a FRESH id and
    // physical column, so pre-drop rows read NULL instead of
    // resurrecting the bytes still sitting in their files.
    "g60_iceberg_drop" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_drop_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_drop_rt", loc)
        eng.dropIcebergColumn("default", "ice_drop_rt", "o_orderpriority")
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority"),
          "default", "ice_drop_rt", evolve = true)
        eng.query(
          """SELECT coalesce(o_orderpriority, '(dropped)') AS priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_drop_rt
            |GROUP BY 1 ORDER BY priority""".stripMargin)
      },
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(dropped)'
        |            ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // Iceberg WRITE-AUDIT-PUBLISH through the oracle gate — snapshot
    // refs (spec v2): the odd half stages on an `audit` BRANCH whose
    // snapshot is invisible to every main reader, the audit gate
    // validates the staged state (and that main is untouched), and
    // the fast-forward publish makes it visible atomically with zero
    // data movement. The final aggregate must see both halves.
    "g64_iceberg_wap" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_wap_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_wap_rt", loc)
        val mainBefore = eng.tableDF("default", "ice_wap_rt").count()
        eng.appendIcebergBranch(o.filter(col("o_orderkey") % 2 === 1),
          "default", "ice_wap_rt", "audit")
        // the AUDIT gate: staged state is complete, main is untouched
        val staged = eng.icebergBranchDF("default", "ice_wap_rt", "audit")
        require(staged.count() == o.count(),
          "audit: branch head must hold the full would-be-published state")
        require(eng.tableDF("default", "ice_wap_rt").count() == mainBefore,
          "audit: main must not see staged rows before publish")
        eng.publishIcebergBranch("default", "ice_wap_rt", "audit")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_wap_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg SNAPSHOT TAGS through the oracle gate — the immutable
    // named ref (the `v1-training-cut` a data pipeline audits
    // against): tag the even-half state, keep writing (main moves,
    // the tag does not), and aggregate the TAGGED read — it must see
    // exactly the state at tag time, not the later appends.
    "g65_iceberg_tag" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_tag_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_tag_rt", loc)
        eng.tagIcebergSnapshot("default", "ice_tag_rt", "v1_cut")
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1),
          "default", "ice_tag_rt")
        require(eng.tableDF("default", "ice_tag_rt").count() == o.count(),
          "main must see both halves after the append")
        eng.icebergTagDF("default", "ice_tag_rt", "v1_cut")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg CHANGELOG over a PARTITIONED MOR table (verdict r13
    // #4): the merge's equality-delete delta forces the GENERAL
    // liveness-diff path on a table whose data files don't hold the
    // partition column — the change legs attach partition values from
    // the manifest partition records (a tiny broadcast keyed on file
    // path), so grouping the changelog BY the partition column is
    // exactly what a wrong attachment would hash-break.
    "g66_iceberg_part_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_pcdf_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_pcdf_rt", loc, partitionBy = Seq("o_orderpriority"))
        val src = o.filter(col("o_orderkey") % 2 === 1)
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
        eng.mergeIceberg("default", "ice_pcdf_rt", src, "o_orderkey")
        eng.icebergChanges("default", "ice_pcdf_rt", 1, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """WITH ins AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |del AS (
        |  SELECT o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM ins GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM del GROUP BY o_orderpriority)
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Delta CDC over a PARTITIONED table with deletion vectors (r14
    // verdict ask #4, the g66 recipe for Delta): the DV delta forces
    // the row-level leg on a table whose data files don't hold the
    // partition column — the changelog attaches partition values from
    // the log's add-action records, and grouping BY that column is
    // exactly what a wrong (or silently dropped) attachment would
    // hash-break.
    "g68_delta_part_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_pcdf_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "delta_pcdf_rt", loc, partitionBy = Seq("o_orderpriority"))
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1),
          "default", "delta_pcdf_rt")
        eng.deleteDeltaWhereMor("default", "delta_pcdf_rt",
          col("o_orderkey") % 10 === 0)
        eng.deltaChanges("default", "delta_pcdf_rt", 2, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """SELECT * FROM (
        |  SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0
        |  GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 10 <> 0
        |  GROUP BY o_orderpriority)
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // The REVIVED-positions leg of the partitioned Delta changelog:
    // a RESTORE rolls the DV back, so the range's net row-level diff
    // is pure un-deletes — inserts read out of the unchanged data
    // files at the revived positions, partition values attached from
    // the log (g68's other half; no file is added or removed in the
    // whole range)
    "g69_delta_restore_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_rcdf_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "delta_rcdf_rt", loc, partitionBy = Seq("o_orderpriority"))
        eng.deleteDeltaWhereMor("default", "delta_rcdf_rt",
          col("o_orderkey") % 10 === 0)
        eng.restoreDeltaTable("default", "delta_rcdf_rt", 1)
        eng.deltaChanges("default", "delta_rcdf_rt", 1, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0
        |GROUP BY o_orderpriority
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Delta CDC ACROSS A COLUMN RENAME (r15 verdict ask #2): the
    // changelog range straddles a g57-style rename — the DV'd files
    // were written BEFORE it under their birth physical names, the
    // appended files AFTER it under the new logical name, and the
    // row-level delete leg must project physical -> logical with the
    // mapping read at `to` (sound because Delta physical names are
    // fixed at column birth; a rename moves only the logical name).
    // Grouping BY the renamed column is what a wrong projection
    // would hash-break.
    "g70_delta_rename_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_rencdf_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "delta_rencdf_rt", loc)
        eng.deleteDeltaWhereMor("default", "delta_rencdf_rt",
          col("o_orderkey") % 10 === 0)
        eng.renameDeltaColumn("default", "delta_rencdf_rt", "o_orderpriority", "priority")
        eng.appendDeltaTable(
          o.filter(col("o_orderkey") % 2 === 1).withColumnRenamed("o_orderpriority", "priority"),
          "default", "delta_rencdf_rt")
        eng.deltaChanges("default", "delta_rencdf_rt", 3, 0)
          .groupBy(col("_change_type").as("change_type"), col("priority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "priority")
      },
      """SELECT * FROM (
        |  SELECT 'delete' AS change_type, o_orderpriority AS priority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0
        |  GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'insert' AS change_type, o_orderpriority AS priority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  GROUP BY o_orderpriority)
        |ORDER BY change_type, priority""".stripMargin)),

    // Iceberg CDC ACROSS A COLUMN RENAME — the g59 twin of g70 (r15
    // verdict ask #2): position deletes land before the rename,
    // the append after it, and the changelog's row-level leg reads
    // the pre-rename files' physical columns and projects them to
    // the post-rename logical schema via the field-id mapping at
    // `to` (field ids are the identity; names are display).
    "g71_iceberg_rename_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_rencdf_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_rencdf_rt", loc)
        eng.deleteIcebergWhere("default", "ice_rencdf_rt",
          col("o_orderkey") % 10 === 0)
        eng.renameIcebergColumn("default", "ice_rencdf_rt", "o_orderpriority", "priority")
        eng.appendIcebergTable(
          o.filter(col("o_orderkey") % 2 === 1).withColumnRenamed("o_orderpriority", "priority"),
          "default", "ice_rencdf_rt")
        eng.icebergChanges("default", "ice_rencdf_rt", 3, 0)
          .groupBy(col("_change_type").as("change_type"), col("priority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "priority")
      },
      """SELECT * FROM (
        |  SELECT 'delete' AS change_type, o_orderpriority AS priority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0
        |  GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'insert' AS change_type, o_orderpriority AS priority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  GROUP BY o_orderpriority)
        |ORDER BY change_type, priority""".stripMargin)),

    // Iceberg CDC ACROSS A PARTITION-SPEC EVOLUTION (r15 verdict ask
    // #3, g61 x g66): the changelog range crosses an evolution that
    // ADDS truncate[1000] to an identity-partitioned spec, so the
    // range mixes file generations whose manifest partition records
    // differ in shape — pre-evolution files carry only the identity
    // key, post-evolution files both fields. The row-level delete leg
    // attaches partition values for PRE-evolution files from their
    // manifest records (no raise: a record lacking a later-adopted
    // key is unknown, not drift), the insert leg reads post-evolution
    // files whose appends kept BOTH spec dimensions, and grouping BY
    // the identity key is what any wrong attachment would hash-break.
    "g72_iceberg_evo_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_evocdf_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_evocdf_rt", loc, partitionBy = Seq("o_orderpriority"))
        eng.evolveIcebergPartitionSpec("default", "ice_evocdf_rt",
          "o_orderkey", "truncate[1000]")
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1),
          "default", "ice_evocdf_rt")
        eng.deleteIcebergWhere("default", "ice_evocdf_rt",
          col("o_orderkey") % 3 === 0)
        eng.icebergChanges("default", "ice_evocdf_rt", 3, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """SELECT * FROM (
        |  SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0
        |  GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_orderkey % 3 <> 0
        |  GROUP BY o_orderpriority)
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Hudi CHANGELOG between instants (completes the CDC row of the
    // format matrix: Delta g52, Iceberg g53/g54/g66): COW rewrites
    // whole file groups, so the net row-level diff is a content
    // exceptAll over the TOUCHED slices only — updates surface as
    // delete(old)+insert(new), carried-over rows cancel exactly,
    // untouched groups never scan.
    "g67_hudi_changes" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_cdf_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_cdf_rt", loc)
        val src = o.filter(col("o_orderkey") % 2 === 1)
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
        eng.upsertHudi("default", "hudi_cdf_rt", src, "o_orderkey")
        eng.hudiChanges("default", "hudi_cdf_rt", 1, 0)
          .groupBy(col("_change_type").as("change_type"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(dec2("o_totalprice")).cast("double").as("tp"))
          .orderBy("change_type", "o_orderpriority")
      },
      """WITH ins AS (
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |del AS (
        |  SELECT o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 = 0)
        |SELECT * FROM (
        |  SELECT 'insert' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM ins GROUP BY o_orderpriority
        |  UNION ALL
        |  SELECT 'delete' AS change_type, o_orderpriority, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |  FROM del GROUP BY o_orderpriority)
        |ORDER BY change_type, o_orderpriority""".stripMargin)),

    // Hudi COLUMN RENAME through the oracle gate — completes the
    // rename row of the evolution matrix (Delta g57, Iceberg g59):
    // a metadata-only schema instant renames the field in the
    // TIMELINE schema (the reader's authority), the physical-name
    // annotation keeps binding to what the slices hold, and the
    // post-rename append arrives under the new logical name.
    "g62_hudi_rename" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_ren_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_ren_rt", loc)
        eng.renameHudiColumn("default", "hudi_ren_rt", "o_orderpriority", "priority")
        eng.appendHudiTable(
          o.filter(col("o_orderkey") % 2 === 1).withColumnRenamed("o_orderpriority", "priority"),
          "default", "hudi_ren_rt")
        eng.query(
          """SELECT priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_ren_rt
            |WHERE priority >= '3-MEDIUM'
            |GROUP BY priority ORDER BY priority""".stripMargin)
      },
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY priority""".stripMargin)),

    // Hudi DROP COLUMN + re-add through the oracle gate — completes
    // the drop row of the matrix (Delta g58, Iceberg g60): the drop
    // is a metadata-only schema instant, the re-added NAME binds to a
    // FRESH physical column via the retired ledger, so pre-drop rows
    // read NULL instead of resurrecting slice bytes.
    "g63_hudi_drop" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_drop_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_drop_rt", loc)
        eng.dropHudiColumn("default", "hudi_drop_rt", "o_orderpriority")
        eng.appendHudiTable(o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority"),
          "default", "hudi_drop_rt", evolve = true)
        eng.query(
          """SELECT coalesce(o_orderpriority, '(dropped)') AS priority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_drop_rt
            |GROUP BY 1 ORDER BY priority""".stripMargin)
      },
      """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '(dropped)'
        |            ELSE o_orderpriority END AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // Iceberg PARTITION-SPEC EVOLUTION through the oracle gate —
    // the layout feature the format exists for: the table starts
    // unpartitioned, adopts truncate[1000] hidden partitioning as a
    // METADATA-ONLY commit (zero files rewritten), and the next
    // append lands partitioned. The range query reads pre-evolution
    // files unconditionally (they carry no spec value — keep-on-
    // unknown is sound) while pruning post-evolution files to the
    // overlapping key windows; the aggregate must see both
    // generations as one table.
    "g61_iceberg_spec_evolution" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_specevo_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0),
          "default", "ice_specevo_rt", loc)
        eng.evolveIcebergPartitionSpec("default", "ice_specevo_rt",
          "o_orderkey", "truncate[1000]")
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1),
          "default", "ice_specevo_rt")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_specevo_rt
            |WHERE o_orderkey BETWEEN 2500 AND 4200
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey BETWEEN 2500 AND 4200
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg truncate[W] hidden partitioning through the oracle
    // gate — the ORDER-PRESERVING transform: a BETWEEN range on the
    // source column prunes to the overlapping 1000-wide key windows
    // before planning (bucket hashing can never serve a range). The
    // aggregate over the surviving rows is what the oracle hashes;
    // IcebergWriterSpec proves the files-scanned counts.
    "g56_iceberg_truncate_prune" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_trunc_rt"
        eng.writeIcebergTableTruncated(o, "default", "ice_trunc_rt", loc, "o_orderkey", 1000)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_trunc_rt
            |WHERE o_orderkey BETWEEN 2500 AND 4200
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderkey BETWEEN 2500 AND 4200
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi row-level DELETE through the oracle gate — completes the
    // delete row of the format matrix (Delta CoW, Iceberg MOR, Hudi
    // CoW replacecommit): write evens, append odds, delete the low
    // priorities; footer-proven-unaffected groups keep their files
    "g50_hudi_delete" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_delete_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_delete_rt", loc)
        eng.appendHudiTable(o.filter(col("o_orderkey") % 2 === 1), "default", "hudi_delete_rt")
        eng.deleteHudiWhere("default", "hudi_delete_rt",
          col("o_orderpriority") < "3-MEDIUM")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_delete_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg ONE-SNAPSHOT MERGE through the oracle gate — the g47
    // twin, completing the upsert trio (Delta MERGE g47, Hudi upsert
    // g34): the source batch's data files and the equality delete
    // over its keys publish at the SAME sequence number, so the
    // strict-scoping reader sees updates and inserts atomically with
    // zero data files rewritten.
    "g49_iceberg_merge" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_merge_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_merge_rt", loc)
        val src = o.filter(col("o_orderkey") % 2 === 1)
          .unionByName(o.filter(col("o_orderkey") % 10 === 0)
            .withColumn("o_orderpriority", lit("9-MERGED")))
        eng.mergeIceberg("default", "ice_merge_rt", src, "o_orderkey")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_merge_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """WITH m AS (
        |  SELECT CASE WHEN o_orderkey % 10 = 0 THEN '9-MERGED'
        |              ELSE o_orderpriority END AS o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderpriority, o_totalprice FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM m GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg ROLLBACK through the oracle gate (the g37 twin): write
    // evens, append odds, MOR-delete the low priorities, then roll
    // back to the pre-delete snapshot — the latest read must equal
    // the full table again, through a snapshot whose manifest-list is
    // literally the target's (zero manifests rewritten)
    "g38_iceberg_rollback" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_rollback_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_rollback_rt", loc)
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1), "default", "ice_rollback_rt")
        eng.deleteIcebergWhere("default", "ice_rollback_rt",
          col("o_orderpriority") < "3-MEDIUM")
        eng.rollbackIcebergTable("default", "ice_rollback_rt", 1)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_rollback_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg WRITE path through the oracle gate (the g31 mirror):
    // write evens as snapshot 1, append odds as snapshot 2, read back
    "g32_iceberg_write" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_write_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_write_rt", loc)
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1), "default", "ice_write_rt")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_write_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi COPY-ON-WRITE (beyond-reference like DELTA): live set =
    // latest file slice per file group from the .hoodie timeline —
    // the upserted group's stale version and the replaced group are
    // both on disk but never read
    "g30_hudi_read" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT l_returnflag, count(*) AS n,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM glue.default.hudi_lineitem
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Hudi WRITE path through the oracle gate (the g31/g32 mirror,
    // completing the lakehouse write trio): write evens as instant 1,
    // append odds as instant 2, then COW-UPSERT the low keys to
    // zero — the replacecommit retires only key-intersecting file
    // groups; the read must see exactly the post-upsert state
    "g34_hudi_write" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_write_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_write_rt", loc)
        eng.appendHudiTable(o.filter(col("o_orderkey") % 2 === 1), "default", "hudi_write_rt")
        eng.upsertHudi("default", "hudi_write_rt",
          o.filter(col("o_orderkey") < 100).withColumn("o_totalprice", lit(0.0)),
          "o_orderkey")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_write_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(CASE WHEN o_orderkey < 100 THEN 0.0 ELSE o_totalprice END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ADDITIVE SCHEMA EVOLUTION through the oracle gate: v0 writes
    // two columns, v1 appends a batch carrying a third — the merged
    // read must surface the new column with nulls for v0's rows
    // (spec-proven since r9; this makes the contract hash-checked in
    // CORRECTNESS too). The oracle derives the same union in SQL.
    "g40_delta_evolution" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders")
        val loc = s"${TestFixtures.root(sf)}/delta_evo_rt"
        eng.writeDeltaTable(
          o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_orderpriority"),
          "default", "delta_evo_rt", loc)
        eng.appendDeltaTable(
          o.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_orderpriority"),
              dec2("o_totalprice").cast("double").as("price")),
          "default", "delta_evo_rt")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  count(price) AS n_priced,
            |  CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_evo_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_priced,
        |  CAST(SUM(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Delta VACUUM through the oracle gate: the delete rewrite
    // strands the pre-delete files logically; vacuum with a 1-version
    // horizon physically deletes them (require() proves files really
    // went), and the CURRENT read must be byte-identical to before —
    // retention must never touch the live version's data.
    "g41_delta_vacuum" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/delta_vacuum_rt"
        eng.writeDeltaTable(o.filter(col("o_orderkey") % 2 === 0), "default", "delta_vacuum_rt", loc)
        eng.appendDeltaTable(o.filter(col("o_orderkey") % 2 === 1), "default", "delta_vacuum_rt")
        eng.deleteDeltaWhere("default", "delta_vacuum_rt",
          col("o_orderpriority") < "3-MEDIUM")
        val deleted = eng.vacuumDeltaTable("default", "delta_vacuum_rt", retainVersions = 1)
        require(deleted.nonEmpty, "vacuum deleted nothing — the delete rewrite left no strays?")
        eng.invalidateTable("default", "delta_vacuum_rt")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.delta_vacuum_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Iceberg snapshot EXPIRE through the oracle gate (the g41 twin):
    // three snapshots (append, append, MOR delete); a 1-snapshot
    // horizon drops the older metadata JSONs, unreachable manifests
    // and unreferenced data files, while the retained snapshot's
    // MOR-merged read stays exact — delete files referenced by the
    // live snapshot must survive expiry.
    "g42_iceberg_expire" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_expire_rt"
        eng.writeIcebergTable(o.filter(col("o_orderkey") % 2 === 0), "default", "ice_expire_rt", loc)
        eng.appendIcebergTable(o.filter(col("o_orderkey") % 2 === 1), "default", "ice_expire_rt")
        eng.deleteIcebergWhere("default", "ice_expire_rt",
          col("o_orderpriority") < "3-MEDIUM")
        val deleted = eng.expireIcebergSnapshots("default", "ice_expire_rt", retainVersions = 1)
        require(deleted.nonEmpty, "expire deleted nothing — no snapshots beyond the horizon?")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_expire_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority >= '3-MEDIUM'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi CLEAN through the oracle gate (completing the retention
    // trio): the clustering replacecommit retires every original file
    // group; clean with a 1-instant horizon physically deletes the
    // retired slices, and the post-clean read is still the FULL table
    // — clustering is layout-only, clean must only take what the
    // live slices no longer reference.
    "g43_hudi_clean" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_clean_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_clean_rt", loc)
        eng.appendHudiTable(o.filter(col("o_orderkey") % 2 === 1), "default", "hudi_clean_rt")
        eng.compactHudiTable("default", "hudi_clean_rt")
        val deleted = eng.cleanHudiTable("default", "hudi_clean_rt", retainInstants = 1)
        require(deleted.nonEmpty, "clean deleted nothing — clustering retired no groups?")
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_clean_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi ROLLBACK through the oracle gate (completing the g37/g38
    // trio): write evens, append odds, upsert the low keys to zero,
    // then roll back to the pre-upsert instant — the latest read must
    // Iceberg ADDITIVE schema evolution through the oracle gate (the
    // g40 Delta contract, Iceberg twin): the evolved append carries a
    // new trailing BIGINT column, positional field ids stay stable,
    // the commit publishes the evolved schema, and rows from
    // pre-evolution files surface the new column as nulls
    "g44_iceberg_evolution" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders")
        val loc = s"${TestFixtures.root(sf)}/ice_evo_rt"
        eng.writeIcebergTable(
          o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_orderpriority"),
          "default", "ice_evo_rt", loc)
        eng.appendIcebergTable(
          o.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_orderpriority"),
              (dec2("o_totalprice") * 100).cast("long").as("price_cents")),
          "default", "ice_evo_rt", evolve = true)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  count(price_cents) AS n_priced,
            |  sum(price_cents) AS cents
            |FROM glue.default.ice_evo_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_priced,
        |  CAST(SUM(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi ADDITIVE schema evolution — completes the evolution
    // matrix (Delta g40, Iceberg g44): the evolved append records
    // its schema in the commit's extraMetadata (where real Hudi
    // keeps it), the reader resolves columns from the TIMELINE
    // schema instead of one sampled slice, and pre-evolution slices
    // surface the new column as nulls
    "g45_hudi_evolution" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders")
        val loc = s"${TestFixtures.root(sf)}/hudi_evo_rt"
        eng.writeHudiTable(
          o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_orderpriority"),
          "default", "hudi_evo_rt", loc)
        eng.appendHudiTable(
          o.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_orderpriority"),
              (dec2("o_totalprice") * 100).cast("long").as("price_cents")),
          "default", "hudi_evo_rt", evolve = true)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  count(price_cents) AS n_priced,
            |  sum(price_cents) AS cents
            |FROM glue.default.hudi_evo_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  COUNT(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_priced,
        |  CAST(SUM(CASE WHEN o_orderkey % 2 = 1
        |    THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) END) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // equal the untouched table, with the rewritten file group
    // re-pointed at its OLD slice (not just new groups dropped)
    "g39_hudi_rollback" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/hudi_rollback_rt"
        eng.writeHudiTable(o.filter(col("o_orderkey") % 2 === 0), "default", "hudi_rollback_rt", loc)
        eng.appendHudiTable(o.filter(col("o_orderkey") % 2 === 1), "default", "hudi_rollback_rt")
        eng.upsertHudi("default", "hudi_rollback_rt",
          o.filter(col("o_orderkey") < 100).withColumn("o_totalprice", lit(0.0)),
          "o_orderkey")
        eng.rollbackHudiTable("default", "hudi_rollback_rt", 1)
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.hudi_rollback_rt
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // partitioned Iceberg WRITE through the oracle gate: identity
    // values live in each data_file's manifest partition record, and
    // the filtered read must both prune to the matching partition and
    // return exactly the oracle's rows
    "g35_iceberg_partitioned" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        val loc = s"${TestFixtures.root(sf)}/ice_part_rt"
        eng.writeIcebergTable(o, "default", "ice_part_rt", loc,
          partitionBy = Seq("o_orderpriority"))
        eng.query(
          """SELECT o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
            |FROM glue.default.ice_part_rt
            |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
            |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hudi incremental read (the g22 Iceberg mirror): only the file
    // slices that are live at the newer instant and absent at the
    // older one — here replacecommit 003's fg3 (the odd rows); the
    // file-set diff is driver-side timeline metadata and the scan
    // plans just the delta, cost proportional to the change
    "g33_hudi_incremental" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf)
          .tableDFIncremental("default", "hudi_lineitem", fromOffset = 1)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem WHERE l_orderkey % 2 = 1
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Iceberg v2 MERGE-ON-READ: the scan subtracts live position
    // deletes (anti-join on _metadata file/row-index) and equality
    // deletes (null-safe anti-join on the declared columns) — no data
    // rewrite anywhere, cost proportional to the delete set
    "g29_iceberg_mor" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT l_returnflag, count(*) AS n,
            |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM glue.default.iceberg_lineitem_mor
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS pos
        |  FROM lineitem)
        |SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM r WHERE pos >= 10 AND l_returnflag <> 'A'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // metadata-only COUNT(*): footer record counts over the LIVE file
    // set (here the Delta v2 set, so the remove is honored) — no Spark
    // job, no data pages; a 100 TB count in listing time
    "g28_count_meta" -> ((
      (spark: SparkSession, sf: String) => {
        val n = TestFixtures.engineFor(spark, sf).countRows("default", "delta_lineitem")
        val sp = org.apache.spark.sql.graft.Shim.classic(spark)
        import sp.implicits._
        Seq(n).toDF("n")
      },
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_orderkey % 2 = 1")),

    // Delta time travel: versionOffset=1 -> v1, BEFORE the remove —
    // both parity files live
    "g26_delta_time_travel" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf)
          .tableDF("default", "delta_lineitem", versionOffset = 1)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum(dec2("l_quantity")).cast("double").as("q"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // partitioned Delta: partition values exist ONLY in the log's
    // partitionValues maps (no key=value path segments, no column in
    // the data files) — the filter prunes to one file from metadata
    "g27_delta_prune" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
            |FROM glue.default.delta_events WHERE event_type = 'click'""".stripMargin)
      },
      """SELECT COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |FROM events WHERE event_type = 'click'""".stripMargin)),

    // identity-partitioned Iceberg: partition values come from the
    // manifests' data_file.partition records, so the filter prunes to
    // one data file without touching the filesystem (the reference
    // never prunes Iceberg)
    "g16_iceberg_prune" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
            |FROM glue.default.iceberg_events WHERE event_type = 'click'""".stripMargin)
      },
      """SELECT COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |FROM events WHERE event_type = 'click'""".stripMargin)),

    "g8_glue_empty" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          "SELECT count(*) AS n FROM glue.default.empty_tbl")
      },
      "SELECT COUNT(*) AS n FROM lineitem WHERE false")),

    "g10_proj_integer" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
            |FROM glue.default.events_by_month WHERE m = 1
            |GROUP BY event_type ORDER BY event_type""".stripMargin)
      },
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events WHERE date_part('month', ts) = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    "g11_csv_source" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
            |FROM glue.default.orders_csv GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      """SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ORC source (same listing/pruning machinery, OrcFileFormat leaf;
    // the oracle reads the parquet original of the same rows)
    "g15_orc_source" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT o_orderpriority, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
            |FROM glue.default.orders_orc GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      """SELECT o_orderpriority, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Avro source — the reference reads Avro only for Iceberg
    // manifests (via DuckDB's read_avro); here classification=avro
    // data tables work too, schema from the writer schema
    "g17_avro_source" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
            |FROM glue.default.orders_avro GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      """SELECT o_orderstatus, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Hive-partitioned Avro through the FileFormat read path: the
    // partition key is a REAL typed column and the st='F' conjunct
    // prunes the listing to one partition's files before any read.
    "g19_avro_partitioned" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT st, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
            |FROM glue.default.orders_avro_part WHERE st = 'F' GROUP BY st""".stripMargin)
      },
      """SELECT o_orderstatus AS st, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
        |FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderstatus""".stripMargin)),

    "g12_json_source" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT n_regionkey, count(*) AS n FROM glue.default.nation_json
            |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
      },
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n FROM nation
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    // XML source (Spark 4 native XML; rowTag from the Glue parameter)
    "g18_xml_source" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """SELECT n_regionkey, count(*) AS n FROM glue.default.nation_xml
            |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
      },
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, COUNT(*) AS n FROM nation
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)),

    "g13_cte_glue" -> ((
      (spark: SparkSession, sf: String) => {
        TestFixtures.engineFor(spark, sf).query(
          """WITH af AS (
            |  SELECT l_orderkey, l_quantity FROM glue.default.lineitem_part
            |  WHERE l_returnflag = 'A')
            |SELECT o.o_orderpriority, count(*) AS n,
            |  CAST(sum(CAST(af.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM af JOIN glue.default.orders_flat o ON af.l_orderkey = o.o_orderkey
            |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin)
      },
      """WITH af AS (
        |  SELECT l_orderkey, l_quantity FROM lineitem WHERE l_returnflag = 'A')
        |SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(af.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM af JOIN orders o ON af.l_orderkey = o.o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // size-aware small-file compaction, then query the compacted
    // table through the glue path — proves the rewrite preserves
    // rows, partition layout, and pruning
    "g14_compact" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        eng.compactTable("default", "lineitem_part", "lineitem_compacted_q",
          s"${TestFixtures.root(sf)}/lineitem_compacted_q")
        eng.query(
          """SELECT l_returnflag, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
            |FROM glue.default.lineitem_compacted_q
            |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // clustered (range-sorted) compaction: rewrite orders clustered
    // by o_orderkey, then answer a selective range query through the
    // glue path — proves the clustered rewrite preserves rows while
    // giving the data-skipping layout (file-count assertions live in
    // FileSkipSpec; the oracle checks values)
    "g20_compact_clustered" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        // 2 MB target: a handful of clustered files at any test SF
        // (sf0.01 orders ≈ 0.3 MB, sf1 ≈ 21 MB; a KB-scale target
        // at sf1 exploded into thousands of files — the file-count
        // behavior itself is covered in FileSkipSpec)
        eng.compactTable("default", "orders_flat", "orders_clustered_q",
          s"${TestFixtures.root(sf)}/orders_clustered_q",
          targetFileBytes = 2L * 1024 * 1024, clusterBy = Seq("o_orderkey"))
        eng.query(
          """SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p
            |FROM glue.default.orders_clustered_q
            |WHERE o_orderkey BETWEEN 100 AND 120 ORDER BY o_orderkey""".stripMargin)
      },
      """SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 120 ORDER BY o_orderkey""".stripMargin)),

    // the READ side of clustered compaction: a selective range query
    // over the once-built clustered orders layout (fixture
    // orders_clustered_skip). The fn also PROVES the skip every run:
    // it executes a probe with AQE off and requires the scan's
    // numFiles metric to be below the table's file count — planner-
    // time footer-range skipping regressing would fail the query, not
    // just slow it. The ratio is printed for the bench log.
    "g21_skip_clustered" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val sql =
          """SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p
            |FROM glue.default.orders_clustered_skip
            |WHERE o_orderkey BETWEEN 3000 AND 3500 ORDER BY o_orderkey""".stripMargin
        val dir = new java.io.File(s"${TestFixtures.root(sf)}/orders_clustered_skip")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
          else Seq(f)
        val total = walk(dir).count(_.getName.endsWith(".parquet"))
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          val probe = eng.query(sql)
          // collect() (not count()) — count plans a separate query and
          // would leave THIS plan's metrics untouched
          probe.collect()
          val scans = probe.queryExecution.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec => s
          }
          val scanned = scans.head.metrics("numFiles").value
          require(total <= 1 || scanned < total,
            s"file skipping regressed on the clustered layout: scanned $scanned of $total files")
          println(s"[g21] scanned $scanned of $total clustered files")
        } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        eng.query(sql)
      },
      """SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p
        |FROM orders WHERE o_orderkey BETWEEN 3000 AND 3500 ORDER BY o_orderkey""".stripMargin)),

    // z-order layout: one Morton-curve rewrite makes file skipping
    // work on EVERY clustered dimension — proven here on
    // o_totalprice, the dimension a plain clusterBy(o_orderkey...)
    // sort would NOT serve (double stats are one-sided/NaN-safe, so
    // the probes are upper-bound predicates -> min-side proofs)
    "g23_skip_zorder" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val sql =
          """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS p
            |FROM glue.default.orders_zorder_skip
            |WHERE o_totalprice < 50000 AND o_custkey < 100
            |ORDER BY o_orderkey""".stripMargin
        val dir = new java.io.File(s"${TestFixtures.root(sf)}/orders_zorder_skip")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
          else Seq(f)
        val total = walk(dir).count(_.getName.endsWith(".parquet"))
        val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try {
          // each dimension must prune ALONE — that is z-order's
          // claim. With F files the curve pins ~log2(F) leading
          // bits, alternating dimensions; the second dimension
          // (o_custkey) only gets a pinned bit once F >= 4, so its
          // requirement is gated on that
          Seq("o_totalprice < 50000" -> 2, "o_custkey < 100" -> 4).foreach {
            case (pred, minFiles) =>
              val probe = eng.query(
                s"SELECT o_orderkey FROM glue.default.orders_zorder_skip WHERE $pred")
              probe.collect()
              val scanned = probe.queryExecution.executedPlan.collect {
                case s: org.apache.spark.sql.execution.FileSourceScanExec => s
              }.head.metrics("numFiles").value
              require(total < minFiles || scanned < total,
                s"z-order skipping regressed on [$pred]: scanned $scanned of $total files")
              println(s"[g23] $pred: scanned $scanned of $total z-ordered files")
          }
        } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
        eng.query(sql)
      },
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS p
        |FROM orders WHERE o_totalprice < 50000 AND o_custkey < 100
        |ORDER BY o_orderkey""".stripMargin)),

    // the graft_* SQL functions through the glue SQL path: signature
    // primitives callable from plain SQL over a catalog table, each
    // verified against its DuckDB fragment twin
    "g24_sql_functions" -> ((
      (spark: SparkSession, sf: String) => {
        graft.functions.SqlFunctions.register(spark)
        TestFixtures.engineFor(spark, sf).query(
          """SELECT doc_id, graft_charfold(text) AS cf,
            |  size(graft_tokens(text)) AS n_tok,
            |  graft_simhash(text) AS sh
            |FROM glue.default.docs_by_lang
            |WHERE lang = 'en' AND doc_id < 200 ORDER BY doc_id""".stripMargin)
      },
      s"""WITH tok AS (SELECT doc_id, lang, text, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |hs AS (SELECT doc_id, lang, text, ${CrossHash.sqlTokenHashesOf("t")} AS hs, t FROM tok)
         |SELECT doc_id, ${CrossHash.sqlCharFold("text")} AS cf,
         |  CAST(len(t) AS INTEGER) AS n_tok, ${CrossHash.sqlSimhashOf("hs")} AS sh
         |FROM hs WHERE lang = 'en' AND doc_id < 200 ORDER BY doc_id""".stripMargin)),

    "g9_listing_view" -> ((
      (spark: SparkSession, sf: String) => {
        val eng = TestFixtures.engineFor(spark, sf)
        val view = eng.registerListing("default", "lineitem_part")
        // also exercise the files-variable parity surface
        eng.setFilesVariable("default", "lineitem_part",
          Seq(col("l_returnflag") === "A"))
        spark.sql(
          s"""SELECT DISTINCT l_returnflag, l_linestatus FROM $view
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      },
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )

  // ================================================================ pipeline ops

  import CrossHash._

  private def docTokCte(alias: String = "tok"): String =
    s"WITH $alias AS (SELECT doc_id, ${sqlTokens("text")} AS t FROM documents)"

  val pipeline: Map[String, (Q, String)] = Map(
    "d1_dedup_exact" -> ((
      (spark: SparkSession, sf: String) => Dedup.exactStats(t(spark, sf, "documents")),
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_uniq, MIN(doc_id) AS first_doc
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    "d2_minhash_sig" -> ((
      (spark: SparkSession, sf: String) => Dedup.minhashSignatures(t(spark, sf, "documents")),
      s"""${docTokCte()},
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |hs AS (SELECT doc_id, list_transform(s, w -> ${sqlCharFold("w")}) AS hs FROM sh)
         |SELECT doc_id, array_to_string(${sqlMinhashSigOf("hs")}, ',') AS sig
         |FROM hs ORDER BY doc_id""".stripMargin)),

    "d3_dedup_minhash" -> ((
      (spark: SparkSession, sf: String) => Dedup.minhashPairs(t(spark, sf, "documents"), 0.8),
      s"""${docTokCte()},
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT a, b, round(jac, 6) AS jac FROM p WHERE jac >= 0.8 ORDER BY a, b""".stripMargin)),

    "d4_simhash_sig" -> ((
      (spark: SparkSession, sf: String) => Dedup.simhashSignatures(t(spark, sf, "documents")),
      s"""${docTokCte()},
         |hs AS (SELECT doc_id, ${sqlTokenHashesOf("t")} AS hs FROM tok)
         |SELECT doc_id, ${sqlSimhashOf("hs")} AS sim FROM hs ORDER BY doc_id""".stripMargin)),

    "d5_dedup_simhash" -> ((
      (spark: SparkSession, sf: String) => Dedup.simhashPairs(t(spark, sf, "documents"), 3),
      s"""${docTokCte()},
         |hs AS (SELECT doc_id, ${sqlTokenHashesOf("t")} AS hs FROM tok),
         |sig AS (SELECT doc_id, ${sqlSimhashOf("hs")} AS sim FROM hs)
         |SELECT a.doc_id AS a, b.doc_id AS b, CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY a, b""".stripMargin)),

    "d6_dedup_embedding" -> ((
      (spark: SparkSession, sf: String) => Dedup.embeddingPairs(t(spark, sf, "embeddings"), 0.4),
      s"""WITH e AS (SELECT vec_id, label, embedding, ${VectorFunctions.sqlNorm("embedding")} AS nrm FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |    ${VectorFunctions.sqlDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT a, b, round(cos, 6) AS cos FROM p WHERE cos >= 0.4 ORDER BY a, b""".stripMargin)),

    "d7_ngram_jaccard" -> ((
      (spark: SparkSession, sf: String) => Dedup.ngramJaccardPairs(t(spark, sf, "documents"), 2, 0.5),
      s"""${docTokCte()},
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 2)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |SELECT a, b, round(jac, 6) AS jac FROM p WHERE jac >= 0.5 ORDER BY a, b""".stripMargin)),

    // duplicate clusters = connected components over the d3 pair graph;
    // the oracle re-derives the pairs quadratically, then propagates
    // min-labels downhill with a recursive CTE (see
    // Dedup.connectedComponents scaladoc for the termination argument)
    "d8_dup_clusters" -> ((
      (spark: SparkSession, sf: String) => Dedup.duplicateClusters(t(spark, sf, "documents"), 0.8),
      s"""WITH RECURSIVE
         |tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8),
         |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node WHERE r.lbl < e.dst)
         |SELECT node AS doc_id, MIN(lbl) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin)),

    // the keep decision: every doc (singletons included) joins its
    // cluster; survivor = longest text, ties to smallest doc_id
    "d9_keep_canonical" -> ((
      (spark: SparkSession, sf: String) => Dedup.canonicalKeep(t(spark, sf, "documents"), 0.8),
      s"""WITH RECURSIVE
         |tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8),
         |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b AS src, a AS dst FROM p),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |reach(node, lbl) AS (
         |  SELECT node, node FROM n
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node WHERE r.lbl < e.dst),
         |cc AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
         |lab AS (
         |  SELECT d.doc_id, CAST(len(d.text) AS INTEGER) AS len,
         |    coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN cc USING (doc_id)),
         |r AS (
         |  SELECT cluster_id, doc_id, len,
         |    row_number() OVER (PARTITION BY cluster_id ORDER BY len DESC, doc_id) AS rn,
         |    CAST(count(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS n_members
         |  FROM lab)
         |SELECT cluster_id, doc_id AS keep_doc, n_members, len AS max_len
         |FROM r WHERE rn = 1 ORDER BY cluster_id""".stripMargin)),

    // incremental (new-batch-vs-corpus) dedup: fresh = every 5th doc;
    // the oracle is the quadratic join restricted to pairs with a
    // fresh member
    "d11_dedup_incremental" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        // daily-ingest shape: the corpus side comes from the PERSISTED
        // prefix index (built once per corpus, reused across batches);
        // only the fresh batch is shingled here.
        val idx = stampedIndexPath(spark, sf, "documents", "n3_t080")
        Dedup.ensureCorpusIndex(docs.filter(col("doc_id") % 5 =!= 0), idx, 3, 0.8)
        Dedup.incrementalPairsIndexed(spark, idx, docs.filter(col("doc_id") % 5 === 0))
      },
      s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
         |SELECT a, b, round(jac, 6) AS jac FROM p WHERE jac >= 0.8 ORDER BY a, b""".stripMargin)),

    // benchmark decontamination: corpus docs leaking eval-set 5-grams.
    // The "benchmark" is a deterministic slice (doc_id % 37 = 3) so
    // both engines derive it identically; the eval gram set broadcasts
    // (real eval sets are tiny next to a training corpus).
    "d12_decontaminate" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        Dedup.decontaminate(
          docs.filter(col("doc_id") % 37 =!= 3),
          docs.filter(col("doc_id") % 37 === 3), 5)
      },
      s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 5)} AS s FROM tok),
         |eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 3),
         |hits AS (
         |  SELECT doc_id, g FROM (
         |    SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 3)
         |  WHERE g IN (SELECT g FROM eg))
         |SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // the full curation funnel end-to-end, per-source audit of every
    // stage: quality gate (t2's score) -> near-dup drop (d3's exact
    // Jaccard>=0.8 pairs, keep the smaller doc_id) -> benchmark
    // decontamination (d12's 5-gram hit) -> per-source token budget
    // (d21's content-hash slice). One registered query a user can
    // point at a corpus to get the drop-off at each gate — the report
    // every training-data pipeline reviews before a run. Every stage
    // reuses the already-oracle-proven operator; the funnel composes
    // them with left-anti joins (never materializing intermediate
    // corpora) and the audit is five small per-source aggregates
    // joined broadcast-style.
    "p4_curation_funnel" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        val corpus = docs.filter(col("doc_id") % 37 =!= 3)
        val evalD = docs.filter(col("doc_id") % 37 === 3)
        val q = corpus.filter(TextAnalysis.qualityCol(col("text")) >= 0.655)
        val dropB = Dedup.minhashPairs(q.select(col("doc_id"), col("text")), 0.8)
          .select(col("b").as("doc_id")).distinct()
        // r16: dd / clean / toks are each consumed by several funnel
        // stages below (dd: contam + clean + its own count; clean: the
        // token pass + its count; toks: limits + kept) — unpersisted,
        // every consumer re-ran the whole upstream pipeline INCLUDING
        // the near-dup pair mining (~6 evaluations of the most
        // expensive subtree in one query). Lazy persist() makes each
        // stage compute once; the bench's between-query sweep drops
        // the blocks (guide §5: cache only what is reused and costly).
        val dd = q.join(dropB, Seq("doc_id"), "left_anti").persist()
        val evalGrams = evalD
          .select(explode(CrossHash.shinglesFast(col("text"), 5)).as("g")).distinct()
        val contam = dd
          .select(col("doc_id"), explode(CrossHash.shinglesFast(col("text"), 5)).as("g"))
          .join(broadcast(evalGrams), "g").select("doc_id").distinct()
        val clean = dd.join(contam, Seq("doc_id"), "left_anti").persist()
        val toks = clean.select(col("source"),
          size(CrossHash.tokens(col("text"))).cast("long").as("tok"),
          (CrossHash.charFold(col("text")) % 10000L).as("bucket")).persist()
        val lims = toks.groupBy("source").agg(sum("tok").as("total"))
          .select(col("source"),
            least(lit(10000L), expr("(500L * 10000L) div total")).as("lim"))
        val kept = toks.join(broadcast(lims), "source")
          .filter(col("bucket") < col("lim"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_kept"), sum("tok").as("tokens_kept"))
        val fIn = corpus.groupBy("source").agg(count(lit(1)).as("n_in"))
        val fQ = q.groupBy("source").agg(count(lit(1)).as("n_q"))
        val fD = dd.groupBy("source").agg(count(lit(1)).as("n_dedup"))
        val fC = clean.groupBy("source").agg(count(lit(1)).as("n_clean"))
        fIn.join(fQ, Seq("source"), "left")
          .join(fD, Seq("source"), "left")
          .join(fC, Seq("source"), "left")
          .join(lims, Seq("source"), "left")
          .join(kept, Seq("source"), "left")
          .select(col("source"), col("n_in"),
            coalesce(col("n_q"), lit(0L)).as("n_q"),
            coalesce(col("n_dedup"), lit(0L)).as("n_dedup"),
            coalesce(col("n_clean"), lit(0L)).as("n_clean"),
            coalesce(col("lim"), lit(10000L)).as("lim"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
          .orderBy("source")
      },
      {
        val stop = TextAnalysis.stopwords.map(s => s"'$s'").mkString(", ")
        s"""WITH corpus AS (SELECT doc_id, source, text, ${sqlTokens("text")} AS t
           |    FROM documents WHERE doc_id % 37 <> 3),
           |q AS (SELECT doc_id, source, text, t FROM corpus
           |  WHERE round(0.4 * least(1.0, len(t)::DOUBLE / 20.0)
           |      + 0.3 * (len(list_filter(t, w -> w IN ($stop)))::DOUBLE / len(t)::DOUBLE)
           |      + 0.3 * (len(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE / len(text)::DOUBLE), 6)
           |    >= 0.655),
           |sh3 AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM q),
           |dropb AS (SELECT DISTINCT b.doc_id AS doc_id
           |  FROM sh3 a JOIN sh3 b ON a.doc_id < b.doc_id
           |  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8),
           |dd AS (SELECT * FROM q WHERE doc_id NOT IN (SELECT doc_id FROM dropb)),
           |evtok AS (SELECT ${sqlTokens("text")} AS t FROM documents WHERE doc_id % 37 = 3),
           |eg AS (SELECT DISTINCT unnest(${sqlShinglesOf("t", 5)}) AS g FROM evtok),
           |contam AS (SELECT DISTINCT doc_id FROM (
           |    SELECT doc_id, unnest(${sqlShinglesOf("t", 5)}) AS g FROM dd)
           |  WHERE g IN (SELECT g FROM eg)),
           |clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           |toks AS (SELECT source, len(t)::BIGINT AS tok,
           |    ${graft.functions.CrossHash.sqlCharFold("text")} % 10000 AS bucket FROM clean),
           |lims AS (SELECT source,
           |    CAST(least(10000, (500 * 10000) // sum(tok)) AS BIGINT) AS lim
           |  FROM toks GROUP BY source),
           |kept AS (SELECT t.source, count(*) AS n_kept, CAST(sum(t.tok) AS BIGINT) AS tokens_kept
           |  FROM toks t JOIN lims USING (source) WHERE t.bucket < lim GROUP BY t.source),
           |fin AS (SELECT source, count(*) AS n_in FROM corpus GROUP BY source),
           |fq AS (SELECT source, count(*) AS n_q FROM q GROUP BY source),
           |fd AS (SELECT source, count(*) AS n_dedup FROM dd GROUP BY source),
           |fc AS (SELECT source, count(*) AS n_clean FROM clean GROUP BY source)
           |SELECT fin.source, n_in,
           |  coalesce(n_q, 0)::BIGINT AS n_q,
           |  coalesce(n_dedup, 0)::BIGINT AS n_dedup,
           |  coalesce(n_clean, 0)::BIGINT AS n_clean,
           |  coalesce(lim, 10000)::BIGINT AS lim,
           |  coalesce(n_kept, 0)::BIGINT AS n_kept,
           |  coalesce(tokens_kept, 0)::BIGINT AS tokens_kept
           |FROM fin LEFT JOIN fq USING (source) LEFT JOIN fd USING (source)
           |  LEFT JOIN fc USING (source) LEFT JOIN lims USING (source)
           |  LEFT JOIN kept USING (source)
           |ORDER BY fin.source""".stripMargin
      })),

    // the streaming-ingest trio composed end-to-end in batch mode
    // (EventStreams.nearDupIngest + searchIngest semantics): a fresh
    // batch (every 5th doc) is near-dup-filtered against the persisted
    // corpus prefix index AND itself (drop policy: fresh side goes;
    // fresh-fresh keeps the smaller id), survivors are APPENDED to the
    // persisted search index under one batch token (replay-idempotent),
    // and a BM25 probe over base+appended postings returns the top-k —
    // proving new docs are searchable and dropped near-dups are not
    "p3_ingest_pipeline" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val fresh = docs.filter(col("doc_id") % 5 === 0)
        val dupIdx = stampedIndexPath(spark, sf, "documents", "n3_t080")
        Dedup.ensureCorpusIndex(corpus, dupIdx, 3, 0.8)
        val drops = Dedup.incrementalPairsIndexed(spark, dupIdx, fresh)
          .select(
            when(col("a") % 5 === 0 && col("b") % 5 === 0, col("b"))
              .when(col("a") % 5 === 0, col("a"))
              .otherwise(col("b")).as("doc_id"))
          .distinct()
        val survivors = fresh.join(drops, Seq("doc_id"), "left_anti")
        val sIdx = stampedIndexPath(spark, sf, "documents", "p3_bm25_b16")
        Search.ensureSearchIndex(corpus, sIdx)
        Search.appendSearchIndex(survivors, sIdx, batchToken = "p3")
        Search.bm25Indexed(spark, sIdx, Seq("spark", "vector", "merge"), 10)
      },
      s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b,
         |    len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS jac
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
         |drops AS (
         |  SELECT DISTINCT CASE WHEN a % 5 = 0 AND b % 5 = 0 THEN b
         |                       WHEN a % 5 = 0 THEN a ELSE b END AS doc_id
         |  FROM p WHERE jac >= 0.8),
         |keep AS (
         |  SELECT doc_id, t FROM tok
         |  WHERE doc_id % 5 <> 0
         |     OR doc_id NOT IN (SELECT doc_id FROM drops)),
         |dl AS (SELECT doc_id, len(t) AS dl FROM keep),
         |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS term FROM keep)
         |  WHERE term IN ('spark', 'vector', 'merge') GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |c AS (
         |  SELECT tf.doc_id,
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${Search.K1 + 1}) /
         |      (tf + ${Search.K1} * (${1 - Search.B} + ${Search.B} * dl / avgdl)) AS contrib
         |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats)
         |SELECT doc_id, round(sum(contrib), 6) AS score
         |FROM c GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // the capstone composition: raw corpus -> exact-dedup canonical
    // -> decontaminated -> length-gated, with the final token yield —
    // one corpus scan, two shuffles, however many stages
    "p2_pipeline_audit" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        PipelineAudit.cleanCorpusAudit(
          docs.filter(col("doc_id") % 37 =!= 3),
          docs.filter(col("doc_id") % 37 === 3))
      },
      PipelineAudit.sqlCleanCorpusAudit("doc_id % 37 = 3"))),

    // content-defined chunk dedup (FastCDC at token granularity):
    // how much of the corpus is repeated boilerplate at sub-document
    // chunks — granularity neither d1 (whole-doc) nor d3/d7
    // (pairwise) addresses
    "d18_chunk_dedup" -> ((
      (spark: SparkSession, sf: String) =>
        Chunking.chunkDedupStats(t(spark, sf, "documents")),
      Chunking.sqlChunkDedupStats())),

    // FUZZY decontamination: corpus docs near-duplicating any eval
    // doc (paraphrase-leak detection the exact-gram d12 misses); the
    // small eval set is the prefix index, the corpus probes it
    "d17_decontaminate_fuzzy" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        Dedup.decontaminateFuzzy(
          docs.filter(col("doc_id") % 37 =!= 3),
          docs.filter(col("doc_id") % 37 === 3), n = 3, threshold = 0.6)
      },
      s"""${docTokCte()},
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 3)} AS s FROM tok),
         |p AS (
         |  SELECT c.doc_id AS doc_id,
         |    round(len(list_intersect(c.s, e.s))::DOUBLE / len(list_distinct(c.s || e.s)), 6) AS jac
         |  FROM sh c JOIN sh e ON c.doc_id % 37 <> 3 AND e.doc_id % 37 = 3)
         |SELECT doc_id, count(*) AS n_matches, max(jac) AS max_jac
         |FROM p WHERE jac >= 0.6 GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // decontamination via bloom prefilter + exact verify join — the
    // beyond-broadcast eval-set plan; same oracle as d12 because the
    // verify join removes every bloom false positive
    "d16_decontaminate_bloom" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        Dedup.decontaminateBloom(
          docs.filter(col("doc_id") % 37 =!= 3),
          docs.filter(col("doc_id") % 37 === 3), 5)
      },
      s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 5)} AS s FROM tok),
         |eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 3),
         |hits AS (
         |  SELECT doc_id, g FROM (
         |    SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 3)
         |  WHERE g IN (SELECT g FROM eg))
         |SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // per-doc n-gram repetition ratio (boilerplate / repetitive-text
    // quality rule)
    "t7_repetition" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.repetitionStats(t(spark, sf, "documents"), 3),
      TextAnalysis.sqlRepetitionStats)),

    // C4-style cleaning-pass retention funnel (length -> repetition
    // quality -> exact-dedup canonical survivor counts)
    "t9_retention_funnel" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.retentionFunnel(t(spark, sf, "documents")),
      TextAnalysis.sqlRetentionFunnel)),

    // sequence packing: global token prefix sum (two-level
    // distributed), docs laid out into 512-token training sequences
    "p1_pack_sequences" -> ((
      (spark: SparkSession, sf: String) => Packing.packSequences(t(spark, sf, "documents"), 512),
      Packing.sqlPackSequences(512))),

    // deterministic weighted interleave (stride scheduling) across
    // sources — the data-ORDERING step after domain mixing: exact
    // integer virtual times, total tie-break, TakeOrdered prefix
    "p5_interleave" -> ((
      (spark: SparkSession, sf: String) =>
        Packing.interleaveByWeight(t(spark, sf, "documents")),
      Packing.sqlInterleaveByWeight())),

    // PII scrub pass. The synthetic corpus carries no PII, so the
    // query derives a deterministic contact line on every third doc
    // (same derivation in both engines) — counts are then 0/1 per
    // class and the redacted fingerprint differs iff something was
    // scrubbed.
    "t8_pii" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents").withColumn("text",
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("text"), lit(" reach user"), col("doc_id"),
              lit("@example.com ip 10.0."), pmod(col("doc_id"), lit(256)),
              lit(".7 tel 555-123-"),
              format_string("%04d", pmod(col("doc_id"), lit(10000)))))
            .otherwise(col("text")))
        Pii.piiStats(docs)
      },
      Pii.sqlPiiStats(
        "(CASE WHEN doc_id % 3 = 0 THEN text || ' reach user' || doc_id || '@example.com ip 10.0.' || (doc_id % 256) || '.7 tel 555-123-' || printf('%04d', doc_id % 10000) ELSE text END)"))),

    // exact-n per-language stratified sample by content hash
    "d13_stratified" -> ((
      (spark: SparkSession, sf: String) => Sampling.stratifiedSample(t(spark, sf, "documents"), "lang", 50),
      Sampling.sqlStratifiedSample("lang", 50))),

    // content-hash deterministic sampling (audit shape: per-stratum counts)
    "d10_sample_hash" -> ((
      (spark: SparkSession, sf: String) => Sampling.sampleAudit(t(spark, sf, "documents"), 20),
      Sampling.sqlSampleAudit(20))),

    // domain-mixture sampling: per-source keep rates (0.25/0.5/0.75/
    // 1.0 cycling over the 20 sources; src19 deliberately absent ->
    // dropped), content-addressed so the mix is engine-reproducible
    // quality-curriculum selection: the n highest-quality docs per
    // source (select-the-best-p%-per-domain after dedup) — pure-map
    // scoring + per-source window rank, ties on the rounded score
    // break by doc_id so both engines rank identically
    "d20_quality_topk" -> ((
      (spark: SparkSession, sf: String) =>
        Sampling.topQualityPerSource(t(spark, sf, "documents"), n = 25),
      Sampling.sqlTopQualityPerSource(n = 25))),

    // token-budget domain mixing: each source capped at a token
    // budget via an integer-exact content-hash keep fraction — the
    // mixture-rebalancing step of a training-data pipeline
    // C4-style exact line dedup at sub-document granularity: each
    // distinct 8-token pseudo-sentence keeps only its globally-first
    // occurrence — one shuffle on the line text, one join back,
    // cost O(lines) never pairs
    "d22_line_dedup" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.lineDedupStats(t(spark, sf, "documents")),
      Dedup.sqlLineDedupStats())),

    // directed near-containment pairs: excerpt/quote mining — the
    // asymmetric overlap Jaccard misses when the container dwarfs
    // the containee; containee-side prefix filter, exact two-pointer
    // verification
    "d24_containment" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.containmentPairs(t(spark, sf, "documents")),
      Dedup.sqlContainmentPairs())),

    // exact Levenshtein near-dup pairs (Ed-Join family): the
    // position-aware dedup predicate Jaccard/MinHash can't express —
    // complete tiered word-gram prefix filter, banded-DP verification
    "d26_edit_pairs" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.editDistancePairs(t(spark, sf, "documents")),
      Dedup.sqlEditDistancePairs())),

    // cross-document duplicated n-gram coverage (Lee et al. 2021's
    // exact-substring analysis signal): the share of each doc's
    // 5-gram occurrences shared with another document — sliding, so
    // shared spans register at ANY alignment, unlike d22's fixed
    // windows. hashGrams=true is the 100 TB shuffle shape
    // (spec-proven equal).
    "d23_dup_ngrams" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.dupNgramCoverage(t(spark, sf, "documents")),
      Dedup.sqlDupNgramCoverage())),

    // the localization d23's ratio can't give: the longest contiguous
    // cross-document duplicated token span per doc (ExactSubstr's
    // carve target) via the gaps-and-islands window over duplicated
    // shingle positions
    "d25_max_dup_span" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.maxDupSpan(t(spark, sf, "documents")),
      Dedup.sqlMaxDupSpan())),

    // the REWRITE half of exact-substring dedup (Lee et al. 2021):
    // remove every cross-doc duplicated run of >= 12 tokens and
    // hash-check the carved text itself (cross-engine fingerprint),
    // not just the span signal d25 reports
    "d27_span_carve" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.carveDupSpans(t(spark, sf, "documents")),
      Dedup.sqlCarveDupSpans())),

    "d21_token_budget" -> ((
      (spark: SparkSession, sf: String) =>
        Sampling.tokenBudgetSample(t(spark, sf, "documents"), budgetTokens = 2000L),
      Sampling.sqlTokenBudgetSample(budgetTokens = 2000L))),

    // per-ROW weighted deterministic sampling (keep prob ~ length,
    // content-addressed like d10/d14)
    "d19_weighted_sample" -> ((
      (spark: SparkSession, sf: String) =>
        Sampling.weightedAudit(t(spark, sf, "documents")),
      Sampling.sqlWeightedAudit())),

    // content-addressed train/val/test split: no document migrates
    // between splits across re-shards or re-ingests (leakage guard)
    "d15_split_audit" -> ((
      (spark: SparkSession, sf: String) =>
        Sampling.splitAudit(t(spark, sf, "documents")),
      Sampling.sqlSplitAudit())),

    "d14_domain_mix" -> {
      val rates = (0 until 19).map(i => s"src$i" -> ((i % 4) + 1) * 0.25).toMap
      val fn = (spark: SparkSession, sf: String) =>
        Sampling.mixtureAudit(t(spark, sf, "documents"), rates)
      (fn, Sampling.sqlMixtureAudit(rates))
    },

    // skyline / Pareto front (EDBT'23 Spark-SQL skyline integration;
    // two-phase local-front + bounded global merge — the quadratic
    // NOT EXISTS form is oracle-only): parts where nothing is both
    // cheaper and bigger
    // one-pass column profile (nulls / exact distincts / numeric
    // ranges) — the data-quality audit before a table is trained on
    "q22_profile" -> ((
      (spark: SparkSession, sf: String) =>
        Profile.profileTable(t(spark, sf, "lineitem"),
          Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag", "l_shipdate")),
      Profile.sqlProfileTable("lineitem",
        Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag", "l_shipdate"),
        Set("l_orderkey", "l_quantity", "l_discount")))),

    // per-source profile: the audit that catches one feed going bad
    // inside a healthy table
    "q30_profile_grouped" -> ((
      (spark: SparkSession, sf: String) =>
        Profile.profileGrouped(t(spark, sf, "documents"), "lang",
          Seq("doc_id", "n_chars", "source")),
      Profile.sqlProfileGrouped("lang", "documents",
        Seq("doc_id", "n_chars", "source"), Set("doc_id", "n_chars")))),

    "q21_skyline" -> ((
      (spark: SparkSession, sf: String) =>
        Skyline.skyline(t(spark, sf, "part"), "p_partkey",
          Seq("p_retailprice" -> false, "p_size" -> true))
          .select("p_partkey", "p_retailprice", "p_size"),
      Skyline.sqlSkyline("part", "p_partkey",
        Seq("p_retailprice" -> false, "p_size" -> true),
        Seq("p_partkey", "p_retailprice", "p_size")))),

    // symmetric int8 embedding quantization (truncation-exact in
    // both engines; see Similarity.quantizeInt8). Presentation only
    // here: the code array rides through to_json so the driver's
    // pandas comparator can sort it, and the vec_id sort lives in the
    // registration, not the operator (s6 reuses the operator sortless).
    "s5_quantize_int8" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.quantizeInt8(t(spark, sf, "embeddings"))
          .select(col("vec_id"), col("scale"), to_json(col("q")).as("q"))
          .orderBy("vec_id"),
      Similarity.sqlQuantizeInt8)),

    // quantized ANN serving: top-k by INTEGER dot product of int8
    // codes (exact oracle by construction)
    "s6_ann_quantized" -> ((
      (spark: SparkSession, sf: String) => Similarity.quantizedTopK(t(spark, sf, "embeddings"), 0L, 10),
      Similarity.sqlQuantizedTopK(0L, 10))),

    // ANN against the PERSISTED index (built once per corpus, like
    // d11's prefix index): the query vector is fetched by id, then
    // quantized + bucketed driver-side, and the probe reads only the
    // query's bucket partition of the pre-quantized lists — the
    // serving shape, no per-query corpus scan (vs s1–s3/s6 which
    // quantize or bucket the whole table per query)
    "s7_ann_indexed" -> ((
      (spark: SparkSession, sf: String) => {
        val emb = t(spark, sf, "embeddings")
        val idx = stampedIndexPath(spark, sf, "embeddings", "ann_p4_int8")
        Similarity.ensureAnnIndex(emb, idx)
        val qvec = emb.filter(col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0)
        Similarity.queryAnnIndex(spark, idx, qvec, 10, excludeVecId = 0L)
      },
      Similarity.sqlAnnIndexed(0L, 10))),

    // bulk kNN join against the same persisted index: every 100th
    // vector is a query, top-5 each — one bucket equi-join + a
    // partitioned window, never a per-query job
    "s8_ann_search_batch" -> ((
      (spark: SparkSession, sf: String) => {
        val emb = t(spark, sf, "embeddings")
        val idx = stampedIndexPath(spark, sf, "embeddings", "ann_p4_int8")
        Similarity.ensureAnnIndex(emb, idx)
        Similarity.annSearchBatch(spark, idx, emb.filter(col("vec_id") % 100 === 0L), 5)
          .orderBy("query_id", "rn")
      },
      Similarity.sqlAnnSearchBatch(100L, 5))),

    // embedding near-dup pairs from an index alone — the bucketed
    // replacement for d6's label-blocked quadratic. Mining cost is
    // per-bucket quadratic (4 planes = 16 buckets), so the registered
    // query mines a DOMAIN SHARD index (labels 0-1), the shape a real
    // pipeline uses: one shard index per domain, mined independently;
    // for one giant shard you raise the plane count instead.
    "s9_ann_near_dup" -> ((
      (spark: SparkSession, sf: String) => {
        val emb = t(spark, sf, "embeddings").filter(col("label") <= 1)
        val idx = stampedIndexPath(spark, sf, "embeddings", "ann_p4_int8_lab01")
        Similarity.ensureAnnIndex(emb, idx)
        Similarity.annNearDupPairs(spark, idx, 0.35).orderBy("a", "b")
      },
      Similarity.sqlAnnNearDupPairs(0.35, "WHERE label <= 1"))),

    // k-means seeded assignment audit: pure-map argmin against the
    // deterministic seed centroids (first k by vec_id), per-cluster
    // population + distance envelope; the iterative Lloyd path is
    // spec-tested (centroid means cannot oracle exactly)
    "s12_kmeans_assign" -> ((
      (spark: SparkSession, sf: String) =>
        Clustering.assignAudit(t(spark, sf, "embeddings"), 8),
      Clustering.sqlAssignAudit(8))),

    // SemDeDup-style semantic dedup: deterministic seeded clustering,
    // then within-cluster cosine pairs mark every vector with a
    // smaller-id neighbor >= threshold as a duplicate — quadratic
    // only within clusters, never across the corpus
    // PCA-reduced exact top-k (the OPQ-lite scale path: one-pass
    // distributed moment accumulation, driver-side d×d Jacobi, then
    // map-only projection — see operators.Pca). Eigenvectors aren't
    // derivable in DuckDB, so the FITTED model (plain driver arrays)
    // is embedded as literals in the oracle — the same
    // embed-as-literal trick s14's ADC table uses; the slot below
    // publishes the model the run actually used, and
    // SparkEntry.oracleSql picks it up after Verify's query pass.
    "s17_pca_topk" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.operators.Pca
        import graft.functions.VectorFunctions
        val emb = t(spark, sf, "embeddings")
        val model = Pca.fit(emb, "embedding", k = 32)
        s17Model = Some(model)
        // stay in double end-to-end: the oracle replays the identical
        // fold over the identical literals, so round(...,6) is exact
        val reduced = Pca.transform(emb, "embedding", model)
          .select(col("vec_id"), col("pca").as("r"))
        val qe = reduced.filter(col("vec_id") === 7).select(col("r").as("qe"))
        reduced.filter(col("vec_id") =!= 7).crossJoin(broadcast(qe))
          .select(col("vec_id"),
            round(VectorFunctions.cosine(col("r"), col("qe")), 6).as("cos"))
          .orderBy(desc("cos"), col("vec_id")).limit(10)
      },
      null)),

    "s16_semantic_dedup" -> ((
      (spark: SparkSession, sf: String) =>
        Dedup.semanticDedup(t(spark, sf, "embeddings"), k = 16, threshold = 0.4),
      s"""WITH seeds AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, embedding AS ce
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |d AS (
         |  SELECT e.vec_id, s.cluster, ${Clustering.sqlDistSq("e.embedding", "s.ce")} AS dist
         |  FROM embeddings e CROSS JOIN seeds s),
         |a AS (
         |  SELECT vec_id, cluster,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
         |  FROM d),
         |asn AS (
         |  SELECT e.vec_id, e.embedding, a.cluster
         |  FROM embeddings e JOIN a ON a.vec_id = e.vec_id AND a.rn = 1),
         |drp AS (
         |  SELECT DISTINCT y.vec_id
         |  FROM asn x JOIN asn y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
         |  WHERE ${VectorFunctions.sqlCosine("x.embedding", "y.embedding")} >= 0.4)
         |SELECT v.vec_id, CAST(v.cluster AS INTEGER) AS cluster,
         |  (v.vec_id IN (SELECT vec_id FROM drp)) AS is_dup
         |FROM asn v ORDER BY vec_id""".stripMargin)),

    // product quantization: 64 floats -> one packed code word (pure
    // map, codebooks as literals); seeded codebooks make the encode
    // an exact pure function of the corpus
    "s13_pq_encode" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.pqEncode(t(spark, sf, "embeddings")),
      Similarity.sqlPqEncode())),

    // asymmetric-distance PQ top-k: the serving shape — m table
    // lookups + an add per row over the compressed corpus
    "s14_pq_topk" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.pqTopK(t(spark, sf, "embeddings"), 0L, 10),
      Similarity.sqlPqTopK(0L, 10))),

    // IVF-PQ (the FAISS serving composition): coarse-cell probe +
    // ADC rank over the cell's codes
    "s15_ivfpq_topk" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.ivfPqTopK(t(spark, sf, "embeddings"), 0L, 10),
      Similarity.sqlIvfPqTopK(0L, 10))),

    // multiprobe LSH (the recall knob): query bucket + hamming-1
    // flips, still 1+planes of 2^planes buckets scanned
    "s10_ann_multiprobe" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.lshTopKMultiprobe(t(spark, sf, "embeddings"), 0L, 5),
      s"""WITH eb AS (SELECT vec_id, embedding, ${Similarity.sqlBucketId("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qe, bucket AS qb FROM eb WHERE vec_id = 0)
         |SELECT e.vec_id, round(${VectorFunctions.sqlDot("e.embedding", "qe")} / (${VectorFunctions.sqlNorm("e.embedding")} * ${VectorFunctions.sqlNorm("qe")}), 6) AS cos
         |FROM eb e, q
         |WHERE (e.bucket = q.qb OR xor(e.bucket, q.qb) IN (${(0 until Similarity.LshPlanes).map(1L << _).mkString(", ")})) AND e.vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin)),

    "s1_ann_brute" -> ((
      (spark: SparkSession, sf: String) => Similarity.bruteForceTopK(t(spark, sf, "embeddings"), 0L, 10),
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0)
         |SELECT e.vec_id, round(${VectorFunctions.sqlDot("e.embedding", "qe")} / (${VectorFunctions.sqlNorm("e.embedding")} * ${VectorFunctions.sqlNorm("qe")}), 6) AS cos
         |FROM e, q ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    "s2_ann_lsh" -> ((
      (spark: SparkSession, sf: String) => Similarity.lshTopK(t(spark, sf, "embeddings"), 0L, 5),
      s"""WITH eb AS (SELECT vec_id, embedding, ${Similarity.sqlBucketId("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qe, bucket AS qb FROM eb WHERE vec_id = 0)
         |SELECT e.vec_id, round(${VectorFunctions.sqlDot("e.embedding", "qe")} / (${VectorFunctions.sqlNorm("e.embedding")} * ${VectorFunctions.sqlNorm("qe")}), 6) AS cos
         |FROM eb e, q WHERE e.bucket = q.qb AND e.vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin)),

    // k-NN GRAPH construction: per-vector top-3 neighbor edges under
    // LSH-bucket blocking (one bucket-keyed shuffle, per-bucket pair
    // generation, source-partitioned rank window — never global);
    // the oracle replays the identical blocking + rank semantics
    "s22_knn_graph" -> ((
      (spark: SparkSession, sf: String) => {
        // blocking resolution scales with the corpus (one count-
        // aggregate job): expected bucket occupancy stays <= ~320, so
        // the per-bucket quadratic stays bounded instead of squaring
        // with corpus growth (sf3 measured: 48 s at fixed 6 planes,
        // 8.4 s auto at 8). Floor keeps sf<=1 at the prior 6 planes.
        val emb = t(spark, sf, "embeddings")
        val p = Similarity.autoPlanes(emb.count())
        s22Planes = Some(p)
        Similarity.knnGraph(emb, 3, p)
      },
      Similarity.sqlKnnGraph())),

    // ANN recall audit: recall@10 of the one-bucket LSH probe and
    // the hamming-1 multiprobe vs the exact brute top-k, over a
    // fixed 32-query panel — the index-quality report a deployment
    // runs before trusting an approximate index; the plain-vs-probe
    // delta IS the one-hyperplane recovery
    "s18_recall_audit" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.recallAudit(t(spark, sf, "embeddings")),
      Similarity.sqlRecallAudit())),

    // 1-bit binary-signature cascade: Hamming prefilter over 8-byte
    // packed sign words (2 xor+popcount per candidate, signatures are
    // 32x less I/O than the float vectors), exact cosine rerank over
    // the 50-vector shortlist only
    "s19_binary_rerank" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.binaryTopK(t(spark, sf, "embeddings"), 0L, 10),
      Similarity.sqlBinaryTopK(0L, 10))),

    // filtered vector search: top-k under a metadata predicate with
    // PRE-filter semantics (post-filtering an unfiltered top-k loses
    // results under selective predicates); exact int8 integer scores
    "s21_filtered_ann" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.filteredTopK(t(spark, sf, "embeddings"), 0L, Seq(2, 5)),
      Similarity.sqlFilteredTopK(0L, Seq(2, 5)))),

    // MMR diversity re-rank over the int8 shortlist: greedy
    // lam*rel - div*maxsim selection in exact integer arithmetic —
    // the anti-near-duplicate retrieval move; unrolled-stage oracle
    // replays the greedy with the identical tie-break
    "s20_mmr_rerank" -> ((
      (spark: SparkSession, sf: String) =>
        Similarity.mmrRerank(t(spark, sf, "embeddings"), 0L),
      Similarity.sqlMmrRerank(0L))),

    // deterministic seed-vector coarse quantizer -> exactly
    // replicable in DuckDB (mean-centroid ivfTopK stays recall-tested
    // in DedupSpec)
    "s3_ann_ivf" -> ((
      (spark: SparkSession, sf: String) => Similarity.ivfTopKSeeded(t(spark, sf, "embeddings"), 0L, 10),
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |seeds AS (SELECT label, min(vec_id) AS seed_id FROM embeddings GROUP BY label),
         |sv AS (SELECT s.label, e.embedding AS se FROM seeds s JOIN embeddings e ON e.vec_id = s.seed_id),
         |probed AS (
         |  SELECT sv.label FROM sv, q
         |  ORDER BY round(${VectorFunctions.sqlDot("se", "qe")} / (${VectorFunctions.sqlNorm("se")} * ${VectorFunctions.sqlNorm("qe")}), 6) DESC, sv.label
         |  LIMIT 2)
         |SELECT e.vec_id, round(${VectorFunctions.sqlDot("e.embedding", "qe")} / (${VectorFunctions.sqlNorm("e.embedding")} * ${VectorFunctions.sqlNorm("qe")}), 6) AS cos
         |FROM embeddings e JOIN probed USING (label), q
         |WHERE e.vec_id <> 0
         |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // BM25 lexical top-k (bag-of-terms query over the corpus)
    "s4_bm25" -> ((
      (spark: SparkSession, sf: String) =>
        Search.bm25TopK(t(spark, sf, "documents"), Seq("spark", "vector", "merge"), 10),
      Search.sqlBm25TopK(Seq("spark", "vector", "merge"), 10))),

    // HYBRID retrieval: reciprocal-rank fusion of the BM25 lexical
    // list and the cosine vector list (SIGIR'09) — the standard
    // score-scale-free combiner a RAG/retrieval pipeline runs over
    // its two indexes; each system contributes its bounded top-20,
    // fusion is a union of 40 rows
    "s23_rrf_fusion" -> ((
      (spark: SparkSession, sf: String) =>
        Search.rrfFusion(t(spark, sf, "documents"), t(spark, sf, "embeddings"),
          Seq("spark", "vector", "merge"), 0L, 10),
      Search.sqlRrfFusion(Seq("spark", "vector", "merge"), 0L, 10))),

    // BM25 against the PERSISTED inverted index (the third member of
    // the index trio: d11 corpus prefix index, s7 ANN index, s11
    // search index): term buckets computed driver-side, the scan
    // reads only those bucket partitions, corpus constants come from
    // sidecar stats — a point read per query instead of s4's
    // tokenize-the-corpus
    "s11_bm25_indexed" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        val idx = stampedIndexPath(spark, sf, "documents", "bm25_b16")
        Search.ensureSearchIndex(docs, idx)
        Search.bm25Indexed(spark, idx, Seq("spark", "vector", "merge"), 10)
      },
      Search.sqlBm25TopK(Seq("spark", "vector", "merge"), 10))),

    "t1_token_stats" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.tokenStats(t(spark, sf, "documents")),
      s"""SELECT doc_id, CAST(len(${sqlTokens("text")}) AS INTEGER) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.subtokenPattern}')) AS INTEGER) AS n_subtokens,
         |  CAST(len(text) AS INTEGER) AS len
         |FROM documents ORDER BY doc_id""".stripMargin)),

    // LM-lite surprisal scoring (the unigram stand-in for perplexity
    // filtering): per-doc mean -ln(corpus frequency), folded over the
    // sorted count list so both engines sum identically
    "t12_surprisal" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.surprisal(t(spark, sf, "documents")),
      TextAnalysis.sqlSurprisal)),

    // conditional (bigram, add-one-smoothed) cross-entropy — the
    // fluency signal unigram surprisal can't see: rare CONTINUATIONS
    // of common words score high; same sorted-fold determinism
    "t15_bigram_xent" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.bigramCrossEntropy(t(spark, sf, "documents")),
      TextAnalysis.sqlBigramCrossEntropy)),

    // the BPE-trainer inner statistic: adjacent-pair frequencies in
    // one zip+explode+count (the full merge loop is bpeTrain,
    // spec-tested — each round is exactly this query plus a narrow
    // array fold)
    "t13_bpe_pairs" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.bpePairs(t(spark, sf, "documents")),
      TextAnalysis.sqlBpePairs())),

    "t2_quality" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.quality(t(spark, sf, "documents")),
      TextAnalysis.sqlQuality)),

    // Gopher-rule audit (Rae et al. 2021): per-source pass counts for
    // each individual quality rule and their conjunction — integer-
    // arithmetic thresholds, one narrow pass + one tiny aggregate
    "t14_gopher_rules" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.gopherRules(t(spark, sf, "documents")),
      TextAnalysis.sqlGopherRules)),

    // STRUCTURED STREAMING in the driver gate: q13's aggregation run
    // through the REAL incremental path — file streaming source →
    // watermarked tumbling-window aggregate → memory sink, driven to
    // completion. Complete output mode re-emits every window at the
    // final trigger, so the bounded replay's answer IS the batch
    // answer and the DuckDB oracle applies unchanged.
    // stream-STATIC enrichment — the most common streaming pattern:
    // the live click stream broadcast-left-joined per micro-batch to
    // the item dimension (no state: the dim rides the plan as a
    // broadcast), then a Complete-mode revenue aggregate per brand.
    // Dim misses keep their rows under UNKNOWN, proving the left
    // semantics end to end; cents stay exact integers.
    "st13_stream_enrich" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val part = t(spark, sf, "part").select(col("p_partkey"), col("p_brand"))
        val stream = EventStreams.eventsFileStream(spark, sf)
          .filter(get_json_object(col("props"), "$.k").cast("long").isNotNull)
          .withColumn("p_partkey", get_json_object(col("props"), "$.k").cast("long"))
        val enriched = EventStreams.enrich(stream, part, "p_partkey")
          .withColumn("p_brand", coalesce(col("p_brand"), lit("UNKNOWN")))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), sum((dec2("value") * 100).cast("long")).as("cents"))
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(enriched, "st13_mem",
            org.apache.spark.sql.streaming.OutputMode.Complete()))
        res.orderBy("p_brand")
      },
      """SELECT COALESCE(p_brand, 'UNKNOWN') AS p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |FROM events LEFT JOIN part
        |  ON p_partkey = CAST(json_extract_string(props, '$.k') AS BIGINT)
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)),

    "st1_stream_hourly" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.hourlyCounts(EventStreams.eventsFileStream(spark, sf)),
            "st1_mem", org.apache.spark.sql.streaming.OutputMode.Complete()))
        res.select(
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"), col("n"), col("sv").cast("double").as("sv"))
          .orderBy("h", "event_type")
      },
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin)),

    // STATEFUL streaming (mapGroupsWithState) in the driver gate:
    // per-user cumulative profiles over four real micro-batches.
    // Every accumulator is order-insensitive, so the stream's answer
    // is the batch answer however the files split; update-mode memory
    // sink keeps every per-batch emission, and the final state per
    // user is the row with the largest (strictly increasing) count.
    "st3_stream_profile" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val sp = org.apache.spark.sql.graft.Shim.classic(spark)
        import sp.implicits._
        val ev = EventStreams.eventsFileStream(spark, sf)
          .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
            (dec2("value") * 100).cast("long").as("cents"))
          .as[EventStreams.CentEvent]
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.userProfiles(ev).toDF(),
            "st3_mem", org.apache.spark.sql.streaming.OutputMode.Update()))
        res.groupBy("user_id")
          .agg(max_by(
            struct(col("n_events"), col("sum_cents"), col("first_us"), col("last_us")),
            col("n_events")).as("s"))
          .select(col("user_id"), col("s.n_events").as("n_events"),
            col("s.sum_cents").as("sum_cents"),
            col("s.first_us").as("first_us"), col("s.last_us").as("last_us"))
          .orderBy("user_id")
      },
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |  MIN(epoch_us(ts)) AS first_us, MAX(epoch_us(ts)) AS last_us
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Streaming EXACTLY-ONCE Delta ingest in the driver gate: the
    // documents corpus staged as four files, streamed one file per
    // micro-batch through the idempotent txn sink (four Delta
    // versions), then read back through the engine's Delta log
    // resolver and aggregated — source offsets, per-batch commits,
    // and the lakehouse read path all on the oracle-checked path.
    // streaming benchmark decontamination: live corpus micro-batches
    // probed against the static eval-benchmark shingle set (d12's
    // semantics on the ingest path) — stream-static broadcast join,
    // update-mode aggregate, four real micro-batches
    "st6_stream_decontam" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val docs = t(spark, sf, "documents")
        val evalGrams = docs.filter(col("doc_id") % 37 === 3)
          .select(explode(CrossHash.shinglesFast(col("text"), 5)).as("g")).distinct()
        val stage = TestFixtures.docsStreamDir(spark, sf)
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
          .filter(col("doc_id") % 37 =!= 3)
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.decontamStream(stream, evalGrams),
            "st6_mem", org.apache.spark.sql.streaming.OutputMode.Update()))
        res.groupBy("doc_id").agg(max(col("n_hits")).as("n_hits"))
          .orderBy("doc_id")
      },
      s"""WITH tok AS (SELECT doc_id, ${CrossHash.sqlTokens("text")} AS t FROM documents),
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 5)} AS s FROM tok),
         |eg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 3),
         |hits AS (
         |  SELECT doc_id, g FROM (
         |    SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 3)
         |  WHERE g IN (SELECT g FROM eg))
         |SELECT doc_id, count(*) AS n_hits FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    "st2_stream_ingest" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val (stream, loc) = stagedDocStream(spark, sf, "delta")
        val q = EventStreams.deltaIngest(stream, loc, appId = "st2")
        try q.processAllAvailable() finally q.stop()
        val resolver = new graft.listing.DeltaLogResolver(spark)
        spark.read.parquet(resolver.dataFilesDetailed(loc).map(_.path): _*)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      """SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // the ICEBERG twin of st2: same staged four-file stream, each
    // micro-batch one append snapshot (exactly-once via the snapshot
    // summary's txn mark), read back through the manifest resolver
    "st4_stream_iceberg" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val (stream, loc) = stagedDocStream(spark, sf, "iceberg")
        val q = EventStreams.icebergIngest(stream, loc, appId = "st4")
        try q.processAllAvailable() finally q.stop()
        val conf = org.apache.spark.sql.graft.Shim.classic(spark)
          .sparkContext.hadoopConfiguration
        val resolver = new graft.listing.IcebergSnapshotResolver(conf)
        spark.read.parquet(resolver.dataFilesDetailed(loc).map(_.path): _*)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang")
      },
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // the HUDI leg of the streaming-ingest trio: per-micro-batch
    // completed instants with the txn mark in extraMetadata, read
    // back through the timeline resolver (latest file slices)
    "st5_stream_hudi" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val (stream, loc) = stagedDocStream(spark, sf, "hudi")
        val q = EventStreams.hudiIngest(stream, loc, appId = "st5")
        try q.processAllAvailable() finally q.stop()
        val conf = org.apache.spark.sql.graft.Shim.classic(spark)
          .sparkContext.hadoopConfiguration
        val resolver = new graft.listing.HudiTimelineResolver(conf)
        spark.read.parquet(resolver.dataFilesDetailed(loc).map(_.path): _*)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "source")
      },
      """SELECT lang, source, COUNT(*) AS n_docs
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // Streaming ingest STAGED ON AN ICEBERG BRANCH — the quarantine
    // pattern: main serves the curated half while the stream's
    // micro-batches commit exactly-once onto an `staging` branch no
    // main reader can see; the audit gate validates the staged state
    // and the fast-forward publish flips it live atomically. The
    // final aggregate must equal the full corpus.
    "st15_stream_branch_wap" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val eng = TestFixtures.engineFor(spark, sf)
        val docs = t(spark, sf, "documents")
        val (stream, loc) = stagedDocStream(spark, sf, "wap")
        // main = the already-curated half; the stream stages the rest
        eng.writeIcebergTable(docs.filter(col("doc_id") % 2 === 0),
          "default", "stream_wap_rt", loc)
        val q = EventStreams.icebergIngestBranch(
          stream.filter(col("doc_id") % 2 === 1), loc, "staging", appId = "st15")
        try q.processAllAvailable() finally q.stop()
        // AUDIT: branch head = full corpus; main untouched by staging
        require(eng.icebergBranchDF("default", "stream_wap_rt", "staging")
          .count() == docs.count(), "audit: staged head must hold the full corpus")
        require(eng.tableDF("default", "stream_wap_rt").count() ==
          docs.filter(col("doc_id") % 2 === 0).count(),
          "audit: main must not see staged micro-batches")
        eng.publishIcebergBranch("default", "stream_wap_rt", "staging")
        eng.query(
          """SELECT lang, count(*) AS n_docs, sum(n_chars) AS sum_chars
            |FROM glue.default.stream_wap_rt
            |GROUP BY lang ORDER BY lang""".stripMargin)
      },
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // STREAM-STREAM interval join in the driver gate: purchases
    // joined to the same user's views in the preceding hour, two
    // watermarked sides over a TIME-ORDERED four-file replay (see
    // eventsStreamTimeOrderedDir — arrival tracks event time, so the
    // 1h watermark never drops a legitimate row and join state is
    // genuinely evicted as the replay advances). The joined pairs
    // land append-mode in the sink; the per-user rollup below is
    // batch work over the sink table.
    "st7_stream_join" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val stage = TestFixtures.eventsStreamTimeOrderedDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
        // registered on the ROCKSDB state store (the suite's largest
        // streaming state: two-sided join buffers) so the gate proves
        // the spillable production backend end-to-end, not just the
        // in-memory default — StreamingSpec proves backend parity,
        // this makes the hash-checked query itself run on it
        val res = EventStreams.withRocksDbStateStore(spark)(
          EventStreams.withStatePartitions(spark, 8)(
            EventStreams.runToCompletion(
              EventStreams.viewPurchaseJoin(stream),
              "st7_mem", org.apache.spark.sql.streaming.OutputMode.Append())))
        res.groupBy(col("p_user").as("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("p_id")).as("n_purchases"),
            sum((col("p_value").cast("decimal(18,2)") * 100).cast("long")).as("sum_cents"))
          .orderBy("user_id")
      },
      """SELECT p.user_id, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT p.event_id) AS n_purchases,
        |  CAST(SUM(CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id AND v.event_type = 'view'
        | AND p.event_type = 'purchase'
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin)),

    // NATIVE session windows through the gate (q14's semantics via
    // session_window + watermark instead of mapGroupsWithState):
    // append mode emits one final row per merged session; the
    // punctuation sentinel (user -1, filtered below) pushes the
    // watermark past the last real session so the bounded replay
    // flushes everything.
    "st8_session_window" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val stage = TestFixtures.eventsStreamSessionDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.sessionWindows(stream),
            "st8_mem", org.apache.spark.sql.streaming.OutputMode.Append()))
        res.filter(col("user_id") =!= -1)
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("n_events"), col("sum_cents"))
          .orderBy("user_id", "session_start")
      },
      """WITH o AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |  FROM o)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // STREAMING DEDUP through the gate: every event arrives twice
    // (the at-least-once-delivery corpus) and
    // dropDuplicatesWithinWatermark must restore the original
    // cardinality — state per key is bounded by the watermark
    // horizon, the production shape for dedup over an unbounded
    // stream. Duplicates are bit-identical, so the surviving row is
    // deterministic whichever copy arrives first; the single-batch
    // replay keeps every duplicate inside the horizon.
    "st10_stream_dedup" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val stage = TestFixtures.eventsStreamDupDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema).parquet(stage)
        val res = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.dedupStream(stream, "event_id"),
            "st10_mem", org.apache.spark.sql.streaming.OutputMode.Append()))
        res.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            sum((col("value").cast("decimal(18,2)") * 100).cast("long")).as("cents"))
          .orderBy("event_type")
      },
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT event_id) AS n_ids,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // CHAINED stateful aggregation: 10-min sub-window counts
    // re-aggregated into hourly stats inside ONE streaming query
    // (Spark 4 multi-stateful-operator append mode, watermark
    // propagated via window_time); the sentinel flushes both levels
    // and its own never-closed windows contribute nothing
    "st12_stream_chained_agg" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val stage = TestFixtures.eventsStreamSessionDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
        // RocksDB state store (r12 verdict ask #5): two stateful
        // stages in one query is the next-largest state holder after
        // st7/st11 — the gate proves the spillable backend on the
        // multi-stateful-operator shape, not just the in-memory default
        val res = EventStreams.withRocksDbStateStore(spark)(
          EventStreams.withStatePartitions(spark, 8)(
            EventStreams.runToCompletion(
              EventStreams.windowedThenHourly(stream),
              "st12_mem", org.apache.spark.sql.streaming.OutputMode.Append())))
        res.select(
          date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("n_windows"), col("total_events"), col("max_sub"))
          .orderBy("hour_start")
      },
      """WITH sub AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS w,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT strftime(date_trunc('hour', w), '%Y-%m-%d %H:%M:%S') AS hour_start,
        |  COUNT(*) AS n_windows, SUM(n_events)::BIGINT AS total_events,
        |  MAX(n_events)::BIGINT AS max_sub
        |FROM sub GROUP BY 1 ORDER BY hour_start""".stripMargin)),

    // LEFT OUTER stream-stream interval join: unattributed purchases
    // must SURFACE (null-augmented on state expiry) instead of
    // silently dropping — per-side punctuation sentinels flush the
    // bounded replay's tail; the aggregate separates matched pairs
    // from unmatched purchases per user
    "st11_stream_outer_join" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val stage = TestFixtures.eventsStreamOuterDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
        // RocksDB state store (r12 verdict ask #5): the outer join is
        // the suite's largest surviving state (expired-row emission
        // keys both sides' buffers), so its registered form runs on
        // the spillable production backend like st7's
        val res = EventStreams.withRocksDbStateStore(spark)(
          EventStreams.withStatePartitions(spark, 8)(
            EventStreams.runToCompletion(
              EventStreams.viewPurchaseJoinOuter(stream),
              "st11_mem", org.apache.spark.sql.streaming.OutputMode.Append())))
        res.filter(col("p_user") >= 0)
          .groupBy(col("p_user").as("user_id"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("p_id")).as("n_purchases"),
            sum(when(col("v_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
            sum((col("p_value").cast("decimal(18,2)") * 100).cast("long")).as("sum_cents"))
          .orderBy("user_id")
      },
      """SELECT p.user_id, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT p.event_id) AS n_purchases,
        |  CAST(SUM(CASE WHEN v.event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
        |  CAST(SUM(CAST(CAST(p.value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = p.user_id
        | AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin)),

    // CUSTOM-STATE funnel with EVENT-TIME TIMEOUT through the gate:
    // flatMapGroupsWithState is the one stateful-streaming API shape
    // the join/window/session operators can't express — zero-or-more
    // emissions per invocation (one purchase converts every pending
    // view in its 1 h window) and state that fires WITHOUT data
    // (abandoned views emit when the watermark passes their window,
    // via no-data micro-batches). Runs on RocksDB like st7/st11/st12;
    // per-side sentinels flush the bounded replay's tail.
    "st14_funnel_timeout" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val sp = org.apache.spark.sql.graft.Shim.classic(spark)
        import sp.implicits._
        val stage = TestFixtures.eventsStreamOuterDir(spark, sf)
        val schema = spark.read.parquet(stage).schema
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
          .as[EventStreams.Event]
        val res = EventStreams.withRocksDbStateStore(spark)(
          EventStreams.withStatePartitions(spark, 8)(
            EventStreams.runToCompletion(
              EventStreams.funnelTimeout(stream).toDF(),
              "st14_mem", org.apache.spark.sql.streaming.OutputMode.Append())))
        res.filter(col("user_id") >= 0)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_views"),
            sum(when(col("outcome") === "converted", 1L).otherwise(0L)).as("n_converted"),
            sum(when(col("outcome") === "abandoned", 1L).otherwise(0L)).as("n_abandoned"),
            sum(when(col("outcome") === "converted", col("latency_us")).otherwise(0L))
              .as("latency_us"))
          .orderBy("user_id")
      },
      """WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
        |p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT v.user_id, v.event_id, v.ts AS vts, MIN(p.ts) AS pts
        |  FROM v LEFT JOIN p ON p.user_id = v.user_id
        |    AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
        |  GROUP BY 1, 2, 3)
        |SELECT user_id, COUNT(*) AS n_views,
        |  CAST(SUM(CASE WHEN pts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |  CAST(SUM(CASE WHEN pts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
        |  CAST(COALESCE(SUM(epoch_us(pts) - epoch_us(vts)), 0) AS BIGINT) AS latency_us
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // COUNT-MIN SKETCH heavy hitters over the event stream: the
    // streaming state is the 4x64 CMS grid — O(1) in key cardinality
    // (exact per-key streaming counts need unbounded state; at 100 TB
    // the sketch is the only bounded-state shape) — built with the
    // cross-engine hash so the oracle recomputes the IDENTICAL grid
    // in SQL, then audited against exact batch counts: est >= n
    // always (CMS never undercounts), top 25 by estimate. Cells are
    // sums, so partition/micro-batch/cluster partials merge by
    // addition — map-side combine IS the sketch merge.
    "st9_cms_heavy" -> ((
      (spark: SparkSession, sf: String) => {
        import graft.streaming.EventStreams
        val cells = EventStreams.withStatePartitions(spark, 8)(
          EventStreams.runToCompletion(
            EventStreams.cmsCells(EventStreams.eventsFileStream(spark, sf)),
            "st9_mem", org.apache.spark.sql.streaming.OutputMode.Complete()))
        val exact = t(spark, sf, "events")
          .groupBy(col("user_id").cast("string").as("k"))
          .agg(count(lit(1)).as("n"))
        val probes = exact.select(col("k"), col("n"),
            explode(sequence(lit(0), lit(3))).as("i"))
          .withColumn("j", pmod(
            graft.functions.CrossHash.charFold(
              concat(col("k"), lit("#"), col("i").cast("string"))),
            lit(64L)))
        probes.join(broadcast(cells), Seq("i", "j"))
          .groupBy("k", "n").agg(min(col("c")).as("est"))
          .orderBy(desc("est"), col("k")).limit(25)
          .select(col("k").as("user_id"), col("n"), col("est"))
      },
      s"""WITH items AS (
        |  SELECT user_id::VARCHAR AS k, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1),
        |probes AS (
        |  SELECT k, n, i,
        |    ${graft.streaming.EventStreams.sqlCmsCell("k", "i::VARCHAR")} AS j
        |  FROM items CROSS JOIN (SELECT unnest(range(4)) AS i)),
        |cells AS (SELECT i, j, sum(n)::BIGINT AS c FROM probes GROUP BY 1, 2),
        |est AS (
        |  SELECT p.k, p.n, min(c.c) AS est
        |  FROM probes p JOIN cells c ON p.i = c.i AND p.j = c.j
        |  GROUP BY 1, 2)
        |SELECT k AS user_id, n, est FROM est
        |ORDER BY est DESC, k LIMIT 25""".stripMargin)),

    // KMV distinct-cardinality sketch per source — the sketch the
    // 100 TB profile pass runs instead of exact COUNT(DISTINCT);
    // deterministic hash makes the sketch itself hash-checkable.
    // TEMPERATURE-smoothed domain mixture (α-sampling, the GPT-3/
    // LLaMA data-mix rule): per-domain keep probabilities DERIVED
    // from the corpus counts (w_i ∝ n_i^0.5), frozen driver-side as
    // integer content-hash thresholds; the dynamic oracle embeds the
    // identical literals so the audit — including the kept counts the
    // thresholds induce — is hash-exact with no float boundary.
    "d28_temperature_mix" -> ((
      (spark: SparkSession, sf: String) => {
        val (thr, audit) = Sampling.temperatureSample(
          t(spark, sf, "documents"), alpha = 0.5, targetDocs = 200L)
        d28Thresholds = Some(thr)
        audit
      },
      null)),

    // Zipf power-law fit of the vocabulary (closed-form least squares
    // over the top-200 rank/frequency pairs): the corpus-health
    // signal that separates natural text (alpha ~ 1) from templated
    // or synthetic corpora (flat) before quality filters are trusted
    "t18_zipf_fit" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.zipfFit(t(spark, sf, "documents")),
      TextAnalysis.sqlZipfFit())),

    // pairwise cross-source vocabulary overlap from MERGED KMV
    // sketches (sketches merge: k-min of the union of k-min sets):
    // each source sketched once, every pair estimated from two
    // k-element arrays — the leakage audit at sketch cost, never a
    // vocabulary join per pair
    "t20_kmv_overlap" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.kmvSourceOverlap(t(spark, sf, "documents")),
      TextAnalysis.sqlKmvSourceOverlap())),

    "t19_kmv_cardinality" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.kmvCardinality(t(spark, sf, "documents")),
      TextAnalysis.sqlKmvCardinality())),

    // PageRank over the bipartite user<->item view graph in exact
    // BIGINT fixed-point (1e-12 units): every per-iteration op is
    // integer arithmetic, so shuffle order can never perturb the
    // result and the unrolled-CTE oracle is bit-exact.
    "q47_pagerank" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.pageRank(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlPageRank())),

    // single-source BFS over the same bipartite view graph: frontier
    // expansion, one keyed join + min-agg per round, all-integer hop
    // distribution against an unrolled-CTE oracle
    "q48_bfs_hops" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.bfsHops(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlBfsHops())),

    // weighted single-source shortest paths (bounded Bellman-Ford)
    // over the bipartite view graph — the weighted completion of
    // q48's BFS: integer edge weights derived from the endpoints (no
    // float on any comparison path), DELTA relaxation so each round
    // joins only the improving frontier, per-round persist keeps
    // plans flat; unrolled-CTE oracle
    "q55_shortest_path" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.shortestPaths(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlShortestPaths())),

    // sequential-pattern (funnel-regex) match over per-user event
    // journeys: one user-keyed shuffle, shuffle-order-proof sequence
    // assembly, regex funnels incl. the no-intervening-error variant
    "q52_sequence_match" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.sequenceMatch(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlSequenceMatch)),

    // HITS hubs/authorities on the bipartite view graph — the
    // asymmetric two-sided centrality; exact integer fixed point,
    // L1-normalized per round, unrolled-CTE oracle
    "q51_hits" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.hits(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlHits())),

    // community detection by synchronous label propagation over the
    // bipartite view graph — deterministic min-label tie-break, the
    // per-node argmax packed into one BIGINT max so each round is a
    // join + two keyed aggregates; unrolled-CTE oracle, exact compare
    "q53_label_prop" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.labelProp(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlLabelProp())),

    // k-core peeling trace: per-round survivor counts of the
    // degree>=k induced-subgraph fixpoint iteration — the cohesion
    // profile next to triangles/communities; unrolled MATERIALIZED
    // stage oracle
    "q54_k_core" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.kCoreTrace(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlKCoreTrace())),

    // Markov next-event transition matrix: one user-keyed lag window,
    // then a types²-bounded aggregate; probabilities as exact integer
    // ppm so no float division sits on the compare
    "q49_transitions" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.transitionMatrix(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlTransitionMatrix)),

    // triangle/wedge counts over the item-transition graph via degree
    // orientation (each triangle generated exactly once, wedge fan-out
    // O(sqrt m) per node however skewed the hubs) — the clustering-
    // coefficient graph-health signal, all-integer
    "q50_triangles" -> ((
      (spark: SparkSession, sf: String) =>
        EventAnalytics.triangleStats(TestFixtures.events(spark, sf)),
      EventAnalytics.sqlTriangleStats)),

    "t3_langid" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.langid(t(spark, sf, "documents")),
      TextAnalysis.sqlLangid)),

    "t4_fingerprint" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.fingerprint(t(spark, sf, "documents")),
      s"""${docTokCte()},
         |sh AS (SELECT doc_id, ${sqlShinglesOf("t", 5)} AS s FROM tok)
         |SELECT doc_id, coalesce(list_min(list_transform(s, w -> ${sqlCharFold("w")})), -1) AS fp
         |FROM sh ORDER BY doc_id""".stripMargin)),

    // exact corpus length quantiles (integer-rank arithmetic over the
    // distinct-length cumulative distribution; no float ceil)
    "t5_length_quantiles" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.lengthQuantiles(t(spark, sf, "documents")),
      TextAnalysis.sqlLengthQuantiles())),

    // FULL BPE training (t13 is one frequency round; this is the
    // loop): learn 20 merge rules from a BOUNDED deterministic
    // hash-sample of the corpus (content-addressed, ~1k docs at this
    // fixture scale; tokenizer training is sample-based at any real
    // scale — the r11 full-corpus trainer was the board's one
    // 100 TB scale-killer), then re-tokenize the WHOLE corpus with
    // the learned table (map-only) and report per-doc compression.
    // Oracle is dynamic (the fitted merge table embedded as
    // literals, s17-style); the greedy fold is replayed in SQL via
    // the wrapped-token replace encoding.
    "t16_bpe_apply" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        val rules = TextAnalysis.bpeTrainSampled(docs, merges = 20,
          budgetDocs = 1000).map(_._1)
        t16Rules = Some(rules)
        TextAnalysis.bpeApplyStats(docs, rules)
      },
      null)),

    // TRAINED quality/language classifier (CCNet / GPT-3-style
    // distilled linear filter): logistic regression fitted by
    // distributed full-batch gradient descent on the 4/5 train
    // split, scored on the held-out 1/5. Oracle is dynamic: the
    // fitted weights embedded as literals over bit-exact ratio
    // features; the reported score is the raw logit so the compare
    // never depends on exp() rounding.
    "t17_classifier" -> ((
      (spark: SparkSession, sf: String) => {
        val docs = t(spark, sf, "documents")
        val w = TextAnalysis.fitDocClassifier(docs)
        t17Weights = Some(w)
        TextAnalysis.classifierScores(docs, w)
      },
      null)),

    // top-k vocabulary by document frequency
    "t6_vocab_df" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.vocabStats(t(spark, sf, "documents")),
      TextAnalysis.sqlVocabStats())),

    // vocabulary coverage: top-500 frequency-truncated vocab, per-
    // source OOV rate in exact ppm — one term shuffle + TakeOrdered
    // for the vocab, broadcast membership join for the scoring pass
    "t22_oov_rate" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.oovStats(t(spark, sf, "documents")),
      TextAnalysis.sqlOovStats())),

    // Flesch-Kincaid readability grade per doc: words/sentences/
    // vowel-group syllable proxy, map-only at any scale
    "t23_readability" -> ((
      (spark: SparkSession, sf: String) => TextAnalysis.readability(t(spark, sf, "documents")),
      TextAnalysis.sqlReadability)),

    // per-source exact length quantiles (the quality-filter
    // thresholds): partitioned CDF, no global window
    "t11_grouped_quantiles" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.groupedLengthQuantiles(t(spark, sf, "documents")),
      TextAnalysis.sqlGroupedLengthQuantiles())),

    // per-doc keyword extraction: top-3 TF-IDF terms, corpus-wide
    // scores, reported for the first 40 docs
    "t10_tfidf" -> ((
      (spark: SparkSession, sf: String) =>
        TextAnalysis.tfidfTopTerms(t(spark, sf, "documents"))
          .filter(col("doc_id") < 40)
          .orderBy("doc_id", "rk"),
      TextAnalysis.sqlTfidfTopTerms())),

    "m1_media_meta" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageMeta(spark.read.parquet(TestFixtures.mediaImages(spark, sf))),
      Multimodal.sqlImageMeta)),

    "m2_frame_sample" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.frameSample(spark.read.parquet(TestFixtures.mediaVideo(spark, sf))),
      Multimodal.sqlFrameSample)),

    "m3_audio_meta" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.audioMeta(spark.read.parquet(TestFixtures.mediaAudio(spark, sf))),
      Multimodal.sqlAudioMeta)),

    // real PNG pixel decode (JDK zlib inflate + the five-filter
    // scanline reconstruction) -> per-channel sums: the
    // feature-extraction primitive an image curation pipeline
    // filters on; PNG half of the fixture only (JPEG is lossy, so
    // its pixels are not oracle-reconstructible)
    "m5_image_stats" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageStats(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0)),
      Multimodal.sqlImageStats)),

    // nearest-neighbor RESIZE over real decoded PNG pixels (the
    // vision-pipeline normalization step): map-only, exact integer
    // sampling grid mirrored in the oracle. Registered EXPLODED to
    // one (doc_id, i, rgb) row per grid cell — a list-valued column
    // crashes the pandas oracle harness's sort; imageResize keeps
    // the array-thumb API for callers.
    "m6_image_resize" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageResize(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0))
          .select(col("doc_id"), posexplode(col("thumb")).as(Seq("i", "rgb")))
          .orderBy("doc_id", "i"),
      Multimodal.sqlImageResizeRows())),

    // PERCEPTUAL image fingerprint (dHash) over real decoded PNG
    // pixels: 9x8 nearest-neighbor grayscale grid, one bit per
    // adjacent-cell comparison — the image-dedup prefilter; the
    // oracle refolds the same bits from the fixture's analytic
    // pixels, so the decode+downsample+hash chain is hash-exact
    "m12_image_dhash" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageDHash(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0))
          .orderBy("doc_id"),
      Multimodal.sqlImageDHash)),

    // exact 16-bin luminance histogram over every decoded PNG pixel —
    // the exposure/contrast curation profile; narrow decode + 16 local
    // counters per image, <=16 output rows each
    "m15_image_histogram" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageLumaHistogram(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0)),
      Multimodal.sqlImageLumaHistogram())),

    // integer Sobel edge energy over real decoded PNG pixels — the
    // sharpness/structure curation feature: BT.601 grayscale, 3x3
    // Sobel pair, L1 magnitude (exact integer end to end), per-image
    // energy + strong-edge count; the oracle inlines the 8 shifted
    // neighbor grays closed-form (no self-join)
    "m19_image_sobel" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageSobel(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0)),
      Multimodal.sqlImageSobel())),

    // frequency-domain perceptual hash (pHash): 16x16 grid -> exact
    // Q12 integer DCT-II -> median-threshold bits over the 63 non-DC
    // low frequencies; the oracle replays the full transform in SQL
    // against the frozen cosine basis
    "m18_image_phash" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imagePHash(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0)),
      Multimodal.sqlImagePHash)),

    // perceptual image DEDUP: group by exact dHash (near-identical
    // predicate), one 16-byte-key shuffle, output bounded by distinct
    // hashes — the scale-safe alternative to Hamming pair joins over
    // perceptually clustered corpora
    "m13_image_dedup" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.imageDedupGroups(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 0)),
      Multimodal.sqlImageDedupGroups)),

    // full baseline JPEG decode over the OTHER half of the image
    // fixture (odd doc_ids): huffman + libjpeg-exact IDCT + fancy
    // chroma upsample. JPEG is lossy, so the analytic pixels can't
    // hash-match exactly; instead the query proves decode FIDELITY —
    // per-channel decoded sums within a measured bound (worst
    // observed 2.42/px, bound 8/px; a zeroed or garbage decode sits
    // >100/px) of the analytic sums, both computed with exact
    // integer arithmetic. Bit-exactness of the decoder itself is
    // spec-proven against ImageIO (MultimodalSpec).
    "m7_jpeg_fidelity" -> ((
      (spark: SparkSession, sf: String) => {
        val decoded = Multimodal.jpegStats(
          spark.read.parquet(TestFixtures.mediaImages(spark, sf))
            .filter(col("doc_id") % 2 === 1))
        val analytic = t(spark, sf, "documents")
          .filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"),
            (lit(16) + col("doc_id") % 32).cast("int").as("aw"),
            (lit(8) + col("doc_id") % 16).cast("int").as("ah"))
          .withColumn("x", explode(sequence(lit(0L), col("aw") - 1)))
          .withColumn("y", explode(sequence(lit(0L), col("ah") - 1)))
          .withColumn("rgb", (col("doc_id") * 31 + col("x") * 7 + col("y")) % 16777216)
          .groupBy("doc_id")
          .agg(max("aw").as("aw"), max("ah").as("ah"),
            sum(col("rgb") / 65536 cast "long").as("ar"),
            sum((col("rgb") / 256 cast "long") % 256).as("ag"),
            sum(col("rgb") % 256).as("ab"))
        decoded.join(analytic, "doc_id")
          .select(col("doc_id"), col("width"), col("height"),
            (col("width") === col("aw") && col("height") === col("ah") &&
              abs(col("sum_r") - col("ar")) <= lit(8L) * col("aw") * col("ah") &&
              abs(col("sum_g") - col("ag")) <= lit(8L) * col("aw") * col("ah") &&
              abs(col("sum_b") - col("ab")) <= lit(8L) * col("aw") * col("ah"))
              .as("fidelity_ok"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, CAST(16 + doc_id % 32 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 16 AS INTEGER) AS height, TRUE AS fidelity_ok
        |FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""".stripMargin)),

    // REAL GIF pixel decode (LZW + palette) fidelity: per-frame
    // channel sums from graft's own decoder (bit-exact vs ImageIO,
    // spec-proven) EXACTLY equal to the analytic generation-time
    // pixels — fixture frames carry < 256 distinct colors, so the
    // writer's palette is lossless (spec measures 0.00/px deviation)
    "m8_gif_fidelity" -> ((
      (spark: SparkSession, sf: String) => {
        val decoded = Multimodal.gifPixelStats(
          spark.read.parquet(TestFixtures.mediaVideo(spark, sf)))
        val analytic = t(spark, sf, "documents")
          .select(col("doc_id"),
            (lit(10) + col("doc_id") % 8).cast("int").as("aw"),
            (lit(8) + col("doc_id") % 4).cast("int").as("ah"),
            (lit(2) + col("doc_id") % 6).as("nf"))
          .withColumn("frame", explode(sequence(lit(0L), col("nf") - 1)))
          .withColumn("frame", col("frame").cast("int"))
          .withColumn("x", explode(sequence(lit(0L), col("aw").cast("long") - 1)))
          .withColumn("y", explode(sequence(lit(0L), col("ah").cast("long") - 1)))
          .withColumn("rgb",
            (col("doc_id") * 31 + col("frame") * 13 + col("x") * 7 + col("y")) % 16777216)
          .groupBy("doc_id", "frame")
          .agg(max("aw").as("aw"), max("ah").as("ah"),
            sum((col("rgb") / 65536).cast("long")).as("ar"),
            sum((col("rgb") / 256).cast("long") % 256).as("ag"),
            sum(col("rgb") % 256).as("ab"))
        decoded.join(analytic, Seq("doc_id", "frame"))
          .select(col("doc_id"), col("frame"), col("width"), col("height"),
            (col("width") === col("aw") && col("height") === col("ah") &&
              col("sum_r") === col("ar") && col("sum_g") === col("ag") &&
              col("sum_b") === col("ab")).as("fidelity_ok"))
          .orderBy("doc_id", "frame")
      },
      """SELECT doc_id, CAST(unnest(range(0, 2 + doc_id % 6)) AS INTEGER) AS frame,
        |  CAST(10 + doc_id % 8 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 4 AS INTEGER) AS height, TRUE AS fidelity_ok
        |FROM documents ORDER BY doc_id, frame""".stripMargin)),

    // JPEG decode-coverage audit over a MIXED-encoder corpus (3/4
    // baseline, 1/4 progressive by construction): per SOF class, how
    // many docs the pixel decoder decoded vs degraded-to-empty. With
    // the r12 progressive (SOF2) decoder both classes fully decode —
    // the oracle asserts ZERO degraded rows in either class, so any
    // decoder regression (or a corpus drifting toward arithmetic/
    // hierarchical encoders) breaks the hash.
    "m9_jpeg_coverage" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.jpegCoverage(
          spark.read.parquet(TestFixtures.mediaJpegMix(spark, sf))),
      """SELECT 'baseline' AS kind, count(*) AS n_docs, count(*) AS n_decoded,
        |  0::BIGINT AS n_degraded
        |FROM documents WHERE doc_id % 4 <> 3
        |UNION ALL
        |SELECT 'progressive' AS kind, count(*) AS n_docs, count(*) AS n_decoded,
        |  0::BIGINT AS n_degraded
        |FROM documents WHERE doc_id % 4 = 3
        |ORDER BY kind""".stripMargin)),

    // VIDEO container metadata: walk a real AVI's RIFF header chunks
    // (avih dims/frame-count/frame-period, strh codec fourcc) without
    // touching frame payloads — the filter row a video pipeline
    // computes before spending decode on anything. All fields derive
    // from doc_id at generation time, so the oracle recomputes them
    // arithmetically and the hash proves the byte walk.
    "m10_video_meta" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.aviMeta(
          spark.read.parquet(TestFixtures.mediaAvi(spark, sf))),
      """SELECT doc_id,
        |  CAST(16 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS height,
        |  CAST(3 + doc_id % 5 AS INTEGER) AS n_frames,
        |  CAST(20000 * (1 + doc_id % 4) AS INTEGER) AS us_per_frame,
        |  CAST((3 + doc_id % 5) * 20 * (1 + doc_id % 4) AS BIGINT) AS duration_ms,
        |  'MJPG' AS codec
        |FROM documents ORDER BY doc_id""".stripMargin)),

    // VIDEO frame-sample + full pixel decode: every 2nd MJPEG frame
    // out of the AVI movi list through the baseline JPEG entropy
    // decoder, per-frame channel sums cross-checked against the
    // generation-time analytic sums (within JPEG's lossy tolerance,
    // the m7 bound). This is the end-to-end video path — container
    // walk, frame sampling, codec decode, feature row — fused in one
    // narrow pass.
    "m11_video_frames" -> ((
      (spark: SparkSession, sf: String) => {
        val decoded = Multimodal.aviFrameStats(
          spark.read.parquet(TestFixtures.mediaAvi(spark, sf)), stride = 2)
        val analytic = t(spark, sf, "documents")
          .select(col("doc_id"),
            (lit(16) + col("doc_id") % 16).cast("int").as("aw"),
            (lit(8) + col("doc_id") % 8).cast("int").as("ah"),
            (lit(3) + col("doc_id") % 5).as("nf"))
          .withColumn("frame", explode(sequence(lit(0L), col("nf") - 1, lit(2L))))
          .withColumn("frame", col("frame").cast("int"))
          .withColumn("x", explode(sequence(lit(0L), col("aw").cast("long") - 1)))
          .withColumn("y", explode(sequence(lit(0L), col("ah").cast("long") - 1)))
          .withColumn("rgb",
            (col("doc_id") * 31 + col("frame") * 13 + col("x") * 7 + col("y")) % 16777216)
          .groupBy("doc_id", "frame")
          .agg(max("aw").as("aw"), max("ah").as("ah"),
            sum((col("rgb") / 65536).cast("long")).as("ar"),
            sum((col("rgb") / 256).cast("long") % 256).as("ag"),
            sum(col("rgb") % 256).as("ab"))
        decoded.join(analytic, Seq("doc_id", "frame"))
          .select(col("doc_id"), col("frame"), col("width"), col("height"),
            (col("width") === col("aw") && col("height") === col("ah") &&
              abs(col("sum_r") - col("ar")) <= lit(8L) * col("aw") * col("ah") &&
              abs(col("sum_g") - col("ag")) <= lit(8L) * col("aw") * col("ah") &&
              abs(col("sum_b") - col("ab")) <= lit(8L) * col("aw") * col("ah"))
              .as("fidelity_ok"))
          .orderBy("doc_id", "frame")
      },
      """SELECT doc_id, CAST(unnest(range(0, 3 + doc_id % 5, 2)) AS INTEGER) AS frame,
        |  CAST(16 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS height, TRUE AS fidelity_ok
        |FROM documents ORDER BY doc_id, frame""".stripMargin)),

    // windowed PCM energy: one streaming byte pass per file (O(1)
    // memory, no samples array), exact integer arithmetic — the
    // loudness feature an audio curation pipeline filters on
    "m4_audio_energy" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.audioEnergy(spark.read.parquet(TestFixtures.mediaAudio(spark, sf))),
      Multimodal.sqlAudioEnergy())),

    // integer PCM autocorrelation at lags 1..4: the periodicity
    // (voiced/tonal vs noise) feature, exact BIGINT lag products over
    // the sign-extended samples — no FFT, no floats, hash-exact
    "m14_audio_autocorr" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.audioAutocorr(spark.read.parquet(TestFixtures.mediaAudio(spark, sf))),
      Multimodal.sqlAudioAutocorr)),

    // silence profile per clip (silent-sample count + longest silent
    // run from the real PCM decode) — the trim/dead-air curation
    // filter; gaps-and-islands oracle over the analytic sample series
    "m16_audio_silence" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.audioSilence(spark.read.parquet(TestFixtures.mediaAudio(spark, sf))),
      Multimodal.sqlAudioSilence())),

    // scene-cut detection over REAL decoded GIF frames: consecutive-
    // frame L1 distance on exact integer channel sums, cuts above a
    // fixed threshold — the shot-segmentation signal frame-sampling
    // reads; doc-partitioned lag window, lag-delta replay oracle
    "m17_scene_cuts" -> ((
      (spark: SparkSession, sf: String) =>
        Multimodal.videoSceneCuts(spark.read.parquet(TestFixtures.mediaVideo(spark, sf))),
      Multimodal.sqlVideoSceneCuts()))
  )

  val all: Map[String, (Q, String)] = core ++ glue ++ pipeline
}
