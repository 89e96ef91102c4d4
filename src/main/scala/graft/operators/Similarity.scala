package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *    baseline. One broadcast of the query vector, one pass, one
  *    small top-k sort. Fine at any row count that a full scan is
  *    fine at.
  *  - [[lshTopK]]: the scale path — random-hyperplane LSH buckets.
  *    Hyperplane weights are INTEGER-valued pseudo-random constants
  *    (w(j,d) = ((j*131 + d*7919) mod 1009) - 504), so the bucket id
  *    of a vector is a deterministic fold both Spark and DuckDB
  *    compute identically — the oracle replicates bucketing exactly.
  *    At scale the bucket id becomes a partitioning key: a query
  *    probes one bucket (or a few), never the full corpus.
  */
object Similarity {

  val LshPlanes = 4

  /** Integer hyperplane weight for plane j, dimension d (1-based d). */
  def planeWeight(j: Int, d: Int): Long = ((j * 131L + d * 7919L) % 1009L) - 504L

  /** Dot of an embedding with integer plane j (double fold, same
    * order as the DuckDB fragment). The weight is computed from the
    * element INDEX, so the projection is correct for any embedding
    * dimension — a fixed-length weight literal would null-pad
    * mismatched vectors and silently route everything to bucket 0.
    */
  private def planeDot(emb: org.apache.spark.sql.Column, j: Int) = {
    val indexed = zip_with(emb, sequence(lit(1), size(emb)),
      (x, d) => x.cast("double") *
        ((lit(j * 131L) + d.cast("long") * lit(7919L)) % lit(1009L) - lit(504L)).cast("double"))
    aggregate(indexed, lit(0.0), (s, v) => s + v)
  }

  /** LSH bucket id = sum of 2^j over planes with positive projection.
    * `planes` is the resolution knob: 2^planes buckets, so pair-
    * mining cost (per-bucket quadratic) drops 4x per extra plane
    * while probe recall for a given similarity falls — pick it per
    * index at build time (it is pinned in the index meta).
    */
  def bucketId(emb: org.apache.spark.sql.Column,
      planes: Int = LshPlanes): org.apache.spark.sql.Column =
    (0 until planes).map { j =>
      when(planeDot(emb, j) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB fragment for the same bucket id over a bound list column. */
  def sqlBucketId(e: String, planes: Int = LshPlanes): String =
    (0 until planes).map { j =>
      val dot = s"list_reduce(list_prepend(0.0, [$e[d]::DOUBLE * ((($j*131 + d*7919) % 1009) - 504)::DOUBLE for d in range(1, len($e) + 1)]), (s, v) -> s + v)"
      s"(CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Exact cosine top-k neighbors of `queryVecId` (excluded itself). */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-style ANN: "train" coarse centroids (here: the mean vector
    * per `label` partition — at scale, k-means iterations as Spark
    * jobs), assign the query to its nearest `nprobe` centroids, and
    * exact-rank only those partitions. The inverted lists are just a
    * partitioning of the table by centroid id — on a cluster, a
    * bucketed/partitioned layout so a probe touches 1/nlist of the
    * data.
    */
  def ivfTopK(emb: DataFrame, queryVecId: Long, k: Int, nprobe: Int = 2): DataFrame = {
    val dims = 64
    // centroid per label: avg of each dimension (exact enough for
    // routing; routing quality is tested by recall, not by equality)
    val byDim = emb.select(col("label"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy("label", "d").agg(avg(col("x")).as("c"))
    val centroids = byDim.groupBy("label")
      .agg(array_sort(collect_list(struct(col("d"), col("c")))).as("dc"))
      .select(col("label"), transform(col("dc"), s => s.getField("c")).as("centroid"))
    val q = emb.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    val probed = centroids.crossJoin(broadcast(q))
      .select(col("label"),
        round(cosineFast(col("centroid").cast(s"array<float>"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("label")).limit(nprobe)
      .select("label")
    emb.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF with a deterministic coarse quantizer: the "centroid" of
    * each inverted list (= label partition) is a SEED VECTOR — the
    * member with the smallest vec_id — rather than a float mean, so
    * routing is exactly reproducible across engines (seed-point
    * quantizers are the standard k-means init; routing quality is
    * equivalent at nprobe>=2). Query flow is identical to [[ivfTopK]]:
    * rank seeds by cosine, probe the top `nprobe` lists, exact-rank
    * only those partitions. At scale the label is a partitioning key,
    * so a probe touches nprobe/nlist of the data.
    */
  def ivfTopKSeeded(emb: DataFrame, queryVecId: Long, k: Int, nprobe: Int = 2): DataFrame = {
    val seeds = emb.groupBy("label").agg(min("vec_id").as("seed_id"))
    val sv = seeds.join(
      emb.select(col("vec_id").as("seed_id"), col("embedding").as("se")), "seed_id")
    val q = emb.filter(col("vec_id") === queryVecId).select(col("embedding").as("qe"))
    // Probe ranking is rounded to 6dp (like the final cosine) BEFORE
    // the ORDER BY ... LIMIT nprobe: a near-tie between two engines'
    // float paths must not flip which partitions get probed.
    val probed = sv.crossJoin(broadcast(q))
      .select(col("label"), round(cosineFast(col("se"), col("qe")), 6).as("sim"))
      .orderBy(col("sim").desc, col("label")).limit(nprobe)
      .select("label")
    emb.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN via LSH: candidates = vectors in the query's bucket; rank
    * candidates by exact cosine, keep top-k. (Single-probe — the
    * oracle query; [[lshTopKMultiprobe]] is the recall knob.)
    */
  def lshTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val withBucket = emb.withColumn("bucket", bucketId(col("embedding")))
    val q = withBucket.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), col("bucket"))
    withBucket.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(q), Seq("bucket"))
      .select(col("vec_id"), round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** k-NN GRAPH construction — per-vector top-k neighbor edges, the
    * building block of graph-based semantic clustering and of
    * SemDeDup-style connectivity dedup. Blocking is the LSH bucket
    * (the same single-probe semantics as [[lshTopK]] — and the
    * ORACLE's definition too: the graph is "top-k by cosine among
    * same-bucket peers", so approximate recall is part of the
    * contract, not a hash mismatch). Cost shape at 100 TB: ONE
    * bucket-keyed shuffle, per-bucket quadratic pair generation (the
    * standard LSH trade — `planes` is the resolution knob: +1 plane
    * quarters the per-bucket volume), and the rank window partitions
    * by source vector, never globally. Edges: (src, rank, dst, cos).
    *
    * `planes` defaults HIGHER than the single-probe queries' (6 vs
    * 4): an all-pairs graph pays the per-bucket quadratic once per
    * BUCKET MEMBER, not once per query, so occupancy must be held
    * down as the corpus grows — measured: 4 planes at a 20k corpus is
    * ~25M candidate pairs (17-30 s), 6 planes is ~1.6M (sub-5 s). At
    * production scale pick planes ≈ log4(n / target-bucket-size).
    */
  /** Blocking resolution for [[knnGraph]] as a function of corpus
    * size: the smallest plane count holding expected bucket occupancy
    * at or under ~320 vectors, floored at the 20k-corpus sweet spot
    * (LshPlanes + 2 = 6). This is the scale path made automatic —
    * bucket-quadratic work stays bounded as the corpus grows instead
    * of squaring (measured at sf3 / 60k vectors: 6 planes 48 s, 8
    * planes 8.4 s, 10 planes 4.7 s, with 180000 / 179994 / 179637
    * edges — resolution costs only the tail where a bucket thins
    * below k+1 members). The registered query derives this from one
    * count and the oracle replays the SAME resolution through the
    * dynamic-oracle slot.
    */
  def autoPlanes(n: Long): Int =
    math.max(LshPlanes + 2,
      math.ceil(math.log(math.max(1L, n) / 320.0) / math.log(2.0)).toInt)

  def knnGraph(emb: DataFrame, k: Int = 3, planes: Int = LshPlanes + 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = emb.withColumn("bucket", bucketId(col("embedding"), planes))
      .select(col("bucket"), col("vec_id"), col("embedding"))
    val l = b.select(col("bucket"), col("vec_id").as("src"), col("embedding").as("se"))
    val r = b.select(col("bucket"), col("vec_id").as("dst"), col("embedding").as("de"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    l.join(r, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), round(cosineFast(col("se"), col("de")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("cos"))
      .orderBy("src", "rank")
  }

  /** DuckDB oracle for [[knnGraph]] — the same bucket blocking, pair
    * cosine, and per-source rank window.
    */
  def sqlKnnGraph(k: Int = 3, planes: Int = LshPlanes + 2): String =
    s"""WITH eb AS (SELECT vec_id, embedding, ${sqlBucketId("embedding", planes)} AS bucket
       |            FROM embeddings),
       |p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |        round(${sqlDot("a.embedding", "b.embedding")} /
       |          (${sqlNorm("a.embedding")} * ${sqlNorm("b.embedding")}), 6) AS cos
       |      FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |r AS (SELECT src, dst, cos,
       |        ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM p)
       |SELECT src, CAST(rk AS INTEGER) AS rank, dst, cos
       |FROM r WHERE rk <= $k ORDER BY src, rank""".stripMargin

  /** Multiprobe LSH (Lv et al., VLDB'07 shape): additionally scan the
    * buckets at hamming distance 1 from the query's bucket — flip each
    * plane bit once. A near neighbor that landed on the wrong side of
    * ONE hyperplane is recovered, at the cost of probing 1+LshPlanes
    * of the 2^LshPlanes buckets instead of one. At scale each probe is
    * still a partition-local lookup on the bucket key; the probe list
    * stays a broadcast of (1+LshPlanes) rows.
    */
  def lshTopKMultiprobe(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val withBucket = emb.withColumn("bucket", bucketId(col("embedding")))
    val q = withBucket.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), col("bucket"))
    val flips = array((lit(0L) +: (0 until LshPlanes).map(j => lit(1L << j))): _*)
    val probes = q
      .select(col("qe"), col("bucket"), explode(flips).as("flip"))
      .select(col("qe"), col("bucket").bitwiseXOR(col("flip")).as("bucket"))
    withBucket.filter(col("vec_id") =!= queryVecId)
      .join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"), round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN RECALL AUDIT: for a fixed panel of query vectors
    * (`vec_id < nQueries` — a deterministic, scale-invariant panel:
    * audit cost is O(panel × corpus), never corpus-quadratic),
    * measure recall@k of the plain one-bucket LSH probe AND the
    * hamming-1 multiprobe against the exact brute-force top-k. The
    * measurement every ANN deployment runs before trusting an index:
    * the plain-vs-multiprobe delta IS the documented recovery of
    * neighbors that crossed one hyperplane ([[lshTopKMultiprobe]]).
    *
    * All three rankings use the same rounded-cosine (cos DESC,
    * vec_id) order the s1/s2 gate queries already prove
    * cross-engine-exact, so the top-k SETS — and therefore the
    * recall — are deterministic, not just the scores.
    *
    * Scale: the panel broadcasts (nQueries rows); truth is one
    * codegen'd scan × panel with a per-query WindowGroupLimit; the
    * probe sides touch only the probed buckets. One small shuffle
    * per ranking.
    */
  def recallAudit(emb: DataFrame, nQueries: Int = 32, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r16: withBucket feeds the query slice + all three candidate
    // scans (truth/lsh/multiprobe) — unpersisted, the per-row LSH
    // projection re-ran 4×; truth (a crossJoin + per-query window)
    // feeds BOTH recall semi-joins. Lazy persists: one projection
    // pass, one ground-truth evaluation (guide §5).
    val withBucket = emb.select(col("vec_id"), col("embedding"),
      bucketId(col("embedding")).cast("long").as("bucket"))
      .persist()
    val queries = withBucket.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket").as("qb"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    def topkIds(cand: DataFrame): DataFrame =
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("query_id", "vec_id")
    def scored(joined: DataFrame): DataFrame =
      joined.filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
    val truth = topkIds(scored(withBucket.crossJoin(broadcast(queries)))).persist()
    val lsh = topkIds(scored(
      withBucket.join(broadcast(queries), col("bucket") === col("qb"))))
    val flips = array((lit(0L) +: (0 until LshPlanes).map(j => lit(1L << j))): _*)
    val probes = queries
      .select(col("query_id"), col("qe"), col("qb"), explode(flips).as("flip"))
      .select(col("query_id"), col("qe"),
        col("qb").bitwiseXOR(col("flip")).as("bucket"))
    val mp = topkIds(scored(withBucket.join(broadcast(probes), Seq("bucket"))))
    val hitsL = truth.join(lsh, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits_lsh"))
    val hitsM = truth.join(mp, Seq("query_id", "vec_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits_probe"))
    queries.select("query_id")
      .join(hitsL, Seq("query_id"), "left")
      .join(hitsM, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits_lsh"), lit(0L)).as("hits_lsh"),
        coalesce(col("hits_probe"), lit(0L)).as("hits_probe"),
        round(coalesce(col("hits_lsh"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_lsh"),
        round(coalesce(col("hits_probe"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("recall_probe"))
      .orderBy("query_id")
  }

  /** DuckDB oracle for [[recallAudit]]. */
  def sqlRecallAudit(nQueries: Int = 32, k: Int = 10,
      planes: Int = LshPlanes): String = {
    import graft.functions.VectorFunctions.{sqlDot, sqlNorm}
    val cos = s"round(${sqlDot("e.embedding", "q.qe")} / (${sqlNorm("e.embedding")} * ${sqlNorm("q.qe")}), 6)"
    val flipList = (0 until planes).map(1L << _).mkString(", ")
    s"""WITH eb AS (SELECT vec_id, embedding, ${sqlBucketId("embedding", planes)} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket AS qb FROM eb WHERE vec_id < $nQueries),
       |truth AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY $cos DESC, e.vec_id) AS rn
       |  FROM eb e, q WHERE e.vec_id <> q.query_id) WHERE rn <= $k),
       |lsh AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY $cos DESC, e.vec_id) AS rn
       |  FROM eb e, q WHERE e.vec_id <> q.query_id AND e.bucket = q.qb) WHERE rn <= $k),
       |mp AS (SELECT query_id, vec_id FROM (
       |  SELECT q.query_id, e.vec_id,
       |    row_number() OVER (PARTITION BY q.query_id ORDER BY $cos DESC, e.vec_id) AS rn
       |  FROM eb e, q WHERE e.vec_id <> q.query_id
       |    AND (e.bucket = q.qb OR xor(e.bucket::BIGINT, q.qb::BIGINT) IN ($flipList))) WHERE rn <= $k),
       |hl AS (SELECT t.query_id, count(*) AS hits_lsh FROM truth t
       |  JOIN lsh USING (query_id, vec_id) GROUP BY 1),
       |hm AS (SELECT t.query_id, count(*) AS hits_probe FROM truth t
       |  JOIN mp USING (query_id, vec_id) GROUP BY 1)
       |SELECT q.query_id,
       |  coalesce(hits_lsh, 0)::BIGINT AS hits_lsh,
       |  coalesce(hits_probe, 0)::BIGINT AS hits_probe,
       |  round(coalesce(hits_lsh, 0)::DOUBLE / $k, 6) AS recall_lsh,
       |  round(coalesce(hits_probe, 0)::DOUBLE / $k, 6) AS recall_probe
       |FROM q LEFT JOIN hl ON q.query_id = hl.query_id
       |  LEFT JOIN hm ON q.query_id = hm.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  /** Symmetric int8 quantization of an embedding column — the
    * standard 4× memory cut before ANN serving (each vector scaled by
    * its own max-abs into [-127, 127]). Narrow per-row transform; at
    * 100 TB this is a pure map stage over the embedding table.
    *
    * Cross-engine exactness: the scale and products are computed in
    * DOUBLE on both engines (identical IEEE operations on identical
    * float inputs) and quantized by TRUNCATION toward zero — unlike
    * `round()`, truncation has no tie-breaking rule to drift between
    * engines. All-zero vectors quantize to zeros (scale guard).
    */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val x = col("embedding")
    // No ordering here: this is a pure map stage. Presentation order
    // belongs to callers (the s5 registration sorts; s6's top-k
    // pipeline must NOT inherit a full-table sort before its filter).
    emb.select(
      col("vec_id"),
      round(qScaleCol(x), 6).as("scale"),
      qCodesCol(x).as("q"))
  }

  /** Max-abs scale of a vector column, in DOUBLE. */
  private def qScaleCol(x: org.apache.spark.sql.Column) =
    array_max(transform(x, v => abs(v.cast("double"))))

  /** Int8 code list of a vector column: truncation toward zero,
    * all-zero vectors to zeros (shared by [[quantizeInt8]] and the
    * index writer so stored codes can never drift from the ad-hoc
    * quantization path).
    */
  private def qCodesCol(x: org.apache.spark.sql.Column) = {
    val scale = qScaleCol(x)
    when(scale === 0d, transform(x, _ => lit(0)))
      .otherwise(transform(x, v => (v.cast("double") * lit(127.0) / scale).cast("int")))
  }

  /** Brute-force top-k over the int8-quantized vectors, scored by the
    * INTEGER dot product of quantized codes — how a quantized ANN
    * serving tier actually ranks (no dequantization in the hot loop;
    * the scale factors cancel only approximately, which IS the
    * accepted quantization error). Integer arithmetic makes the
    * oracle exact by construction — no float fold-order or rounding
    * caveats at all. Same scale shape as [[bruteForceTopK]]: 1-row
    * query side broadcast, TakeOrdered top-k.
    */
  def quantizedTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = quantizeInt8(emb)
    val qv = q.filter(col("vec_id") === queryVecId).select(col("q").as("qq"))
    val dotInt = {
      val prods = zip_with(col("q"), col("qq"), (a, b) => a.cast("long") * b.cast("long"))
      aggregate(prods, lit(0L), (acc, v) => acc + v)
    }
    q.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), dotInt.as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[quantizedTopK]]. */
  def sqlQuantizedTopK(queryVecId: Long, k: Int): String =
    s"""WITH s AS (SELECT vec_id,
       |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
       |  embedding FROM embeddings),
       |qz AS (SELECT vec_id,
       |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
       |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
       |  END AS q FROM s),
       |qv AS (SELECT q AS qq FROM qz WHERE vec_id = $queryVecId)
       |SELECT vec_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |    [q[i]::BIGINT * qq[i]::BIGINT for i in range(1, len(q) + 1)]),
       |    (s, v) -> s + v) AS score
       |FROM qz, qv WHERE vec_id <> $queryVecId
       |ORDER BY score DESC, vec_id LIMIT $k""".stripMargin

  /** FILTERED vector search: top-k by the quantized integer dot among
    * vectors satisfying a metadata predicate — PRE-filter semantics,
    * which is what a filtered vector query means (post-filtering an
    * unfiltered top-k returns fewer than k, possibly zero, matches
    * under a selective predicate). The label filter lands in the scan
    * (plain predicate pushdown — per-vector max-abs quantization is
    * independent of the corpus, so filtering first changes nothing),
    * scoring stays the exact int8 dot, and the plan is the same
    * broadcast + TakeOrdered as [[quantizedTopK]]. At 100 TB the same
    * shape runs over a label-partitioned index layout so the filter
    * prunes partitions before any vector is read (the s3/s7 layout).
    */
  def filteredTopK(emb: DataFrame, queryVecId: Long, labels: Seq[Int],
      k: Int = 10): DataFrame = {
    require(labels.nonEmpty, "filtered search needs at least one admitted label")
    val qv = quantizeInt8(emb.filter(col("vec_id") === queryVecId))
      .select(col("q").as("qq"))
    val cand = quantizeInt8(
      emb.filter(col("label").isin(labels.map(Int.box): _*))
        .filter(col("vec_id") =!= queryVecId))
    val dotInt = {
      val prods = zip_with(col("q"), col("qq"), (a, b) => a.cast("long") * b.cast("long"))
      aggregate(prods, lit(0L), (acc, v) => acc + v)
    }
    cand.crossJoin(broadcast(qv))
      .select(col("vec_id"), dotInt.as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** DuckDB oracle for [[filteredTopK]]. */
  def sqlFilteredTopK(queryVecId: Long, labels: Seq[Int], k: Int = 10): String =
    s"""WITH s AS (SELECT vec_id, label,
       |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
       |  embedding FROM embeddings),
       |qz AS (SELECT vec_id, label,
       |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
       |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
       |  END AS q FROM s),
       |qv AS (SELECT q AS qq FROM qz WHERE vec_id = $queryVecId)
       |SELECT vec_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |    [q[i]::BIGINT * qq[i]::BIGINT for i in range(1, len(q) + 1)]),
       |    (s, v) -> s + v) AS score
       |FROM qz, qv
       |WHERE vec_id <> $queryVecId AND label IN (${labels.mkString(", ")})
       |ORDER BY score DESC, vec_id LIMIT $k""".stripMargin

  /** MMR (Maximal Marginal Relevance, Carbonell & Goldstein 1998)
    * diversity re-rank: from the `shortlist` most query-relevant
    * vectors, greedily select `k` maximizing
    * `lamNum*rel(d) - divNum*max_{s in selected} sim(d, s)` — the
    * standard retrieval/training-data move against near-duplicate
    * result sets (top-k alone returns k copies of the same
    * neighborhood; MMR trades a little relevance for coverage).
    * Relevance and similarity are INTEGER dot products of the int8
    * codes ([[quantizeInt8]]), so every score — and the greedy's
    * every tie-break (smallest vec_id) — is exact cross-engine.
    *
    * Scale shape: the shortlist is the distributed part (brute
    * integer scoring + TakeOrdered, or any ANN probe upstream); the
    * greedy itself runs driver-side over the BOUNDED shortlist —
    * re-ranking always operates on a bounded candidate set, that is
    * its contract (20 rows here; a deployment's 1k-candidate re-rank
    * is still driver-trivial). Nothing unbounded ever leaves the
    * executors.
    */
  def mmrRerank(emb: DataFrame, queryVecId: Long, shortlist: Int = 20,
      k: Int = 5, lamNum: Long = 7L, divNum: Long = 3L): DataFrame = {
    val q = quantizeInt8(emb)
    val qv = q.filter(col("vec_id") === queryVecId).select(col("q").as("qq"))
    val dotInt = {
      val prods = zip_with(col("q"), col("qq"), (a, b) => a.cast("long") * b.cast("long"))
      aggregate(prods, lit(0L), (acc, v) => acc + v)
    }
    val cands = q.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"), col("q"), dotInt.as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(shortlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toArray, r.getLong(2)))
    def dot(a: Array[Int], b: Array[Int]): Long = {
      var s = 0L; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toLong * b(i); i += 1 }
      s
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Int], Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val scored = remaining.map { case (id, codes, rel) =>
        val maxSim = if (selected.isEmpty) 0L
          else selected.iterator.map(s => dot(codes, s._2)).max
        (id, codes, lamNum * rel - divNum * maxSim)
      }
      val best = scored.minBy { case (id, _, m) => (-m, id) }
      selected += best
      remaining.filterInPlace(_._1 != best._1)
    }
    val sp = org.apache.spark.sql.graft.Shim.classic(emb.sparkSession)
    import sp.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, _, score), i) => (i + 1, id, score) }
      .toDF("rank", "vec_id", "score")
  }

  /** DuckDB oracle for [[mmrRerank]] — the greedy unrolled to `k`
    * selection stages over the same integer arithmetic (stage i picks
    * its row by `ORDER BY score DESC, vec_id LIMIT 1`, the exact
    * tie-break of the driver-side greedy).
    */
  def sqlMmrRerank(queryVecId: Long, shortlist: Int = 20, k: Int = 5,
      lamNum: Long = 7L, divNum: Long = 3L): String = {
    def dot(a: String, b: String) =
      s"list_reduce(list_prepend(0::BIGINT, [$a[i]::BIGINT * $b[i]::BIGINT " +
        s"for i in range(1, len($a) + 1)]), (s, v) -> s + v)"
    val base =
      s"""WITH s AS (SELECT vec_id,
         |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
         |  embedding FROM embeddings),
         |qz AS (SELECT vec_id,
         |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
         |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
         |  END AS q FROM s),
         |qv AS (SELECT q AS qq FROM qz WHERE vec_id = $queryVecId),
         |cand AS MATERIALIZED (SELECT vec_id, q, ${dot("q", "qq")} AS rel
         |  FROM qz, qv WHERE vec_id <> $queryVecId
         |  ORDER BY rel DESC, vec_id LIMIT $shortlist),
         |sel1 AS MATERIALIZED (SELECT vec_id, q, $lamNum * rel AS score
         |  FROM cand ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    val stages = (2 to k).map { i =>
      val prev = (1 until i).map(j => s"SELECT vec_id, q FROM sel$j").mkString(" UNION ALL ")
      s"""sel$i AS MATERIALIZED (
         |  SELECT c.vec_id, c.q,
         |    $lamNum * c.rel - $divNum *
         |      (SELECT MAX(${dot("c.q", "p.q")}) FROM ($prev) p) AS score
         |  FROM cand c
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM ($prev) u)
         |  ORDER BY score DESC, c.vec_id LIMIT 1)""".stripMargin
    }
    val out = (1 to k).map(i => s"SELECT $i AS rank, vec_id, score FROM sel$i")
      .mkString("\nUNION ALL\n")
    (base +: stages).mkString(",\n") + s"\n$out\nORDER BY rank"
  }

  /** DuckDB oracle for [[quantizeInt8]] — the code list is projected
    * through to_json (same `[1,2,3]` text both engines) because the
    * driver's pandas comparator sorts result frames before hashing
    * and raw array cells are unhashable there.
    */
  def sqlQuantizeInt8: String =
    """WITH s AS (SELECT vec_id,
      |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
      |  embedding FROM embeddings)
      |SELECT vec_id, round(sc, 6) AS scale,
      |  to_json(CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
      |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
      |  END)::VARCHAR AS q
      |FROM s ORDER BY vec_id""".stripMargin

  /** One 32-dim half of the SIGN (1-bit) quantization of a vector
    * column, packed MSB-first into a non-negative BIGINT by the
    * fold `acc*2 + (v >= 0)` — the accumulate order is part of the
    * contract so any engine can replay the exact word. `off` is the
    * 1-based start dimension (1 or 33 for 64-dim vectors). Packing
    * in two 32-bit halves keeps every intermediate far from the
    * signed-64 edge cases that differ across engines.
    */
  private def binHalfCol(x: org.apache.spark.sql.Column, off: Int) =
    aggregate(slice(x, off, 32), lit(0L),
      (acc, v) => acc * 2L + when(v >= 0f, 1L).otherwise(0L))

  /** DuckDB fragment for [[binHalfCol]] over a bound list column. */
  def sqlBinHalf(e: String, off: Int): String =
    s"list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform($e[$off:${off + 31}], " +
      s"v -> (CASE WHEN v >= 0 THEN 1 ELSE 0 END)::BIGINT)), " +
      s"(acc, b) -> acc * 2 + b)"

  /** Binary-signature ANN: 1-bit sign quantization (64 dims → 8
    * bytes, two packed 32-bit words) ranked by Hamming distance as
    * the PREFILTER, exact cosine over the shortlist as the RERANK —
    * the two-stage serving shape binary embeddings (BQ/"matryoshka"
    * tails) run in production. Output: top-`k` of the `shortlist`-
    * sized Hamming shortlist by exact cosine, with the Hamming
    * distance carried through for audit.
    *
    * Scale shape: the prefilter scan reads ONLY the 8-byte
    * signatures — 32× less I/O than the float32 vectors and 8× less
    * than int8 codes — and scores each with two XOR+popcount ops
    * (codegen'd integer work, no float lane at all); TakeOrdered
    * keeps the shortlist bound driver-free. Only the `shortlist`
    * winners' full vectors are touched for the exact rerank, so the
    * float cost is O(shortlist), independent of corpus size. Both
    * stages are deterministic (Hamming and id break every tie), so
    * the whole cascade hash-checks.
    */
  def binaryTopK(emb: DataFrame, queryVecId: Long, k: Int,
      shortlist: Int = 50): DataFrame = {
    val sigs = emb.select(col("vec_id"), col("embedding"),
      binHalfCol(col("embedding"), 1).as("lo"),
      binHalfCol(col("embedding"), 33).as("hi"))
    val q = sigs.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"), col("lo").as("qlo"), col("hi").as("qhi"))
    val ham = (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
      bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("int")
    sigs.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"), col("qe"), ham.as("ham"))
      .orderBy(col("ham"), col("vec_id")).limit(shortlist)
      .select(col("vec_id"), col("ham"),
        round(cosineFast(col("embedding"), col("qe")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(k)
  }

  /** DuckDB oracle for [[binaryTopK]]. */
  def sqlBinaryTopK(queryVecId: Long, k: Int, shortlist: Int = 50): String = {
    import graft.functions.VectorFunctions.{sqlDot, sqlNorm}
    s"""WITH sg AS (SELECT vec_id, embedding,
       |  ${sqlBinHalf("embedding", 1)} AS lo,
       |  ${sqlBinHalf("embedding", 33)} AS hi FROM embeddings),
       |q AS (SELECT embedding AS qe, lo AS qlo, hi AS qhi FROM sg
       |      WHERE vec_id = $queryVecId),
       |short AS (SELECT vec_id, embedding, qe,
       |    (bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)))::INTEGER AS ham
       |  FROM sg, q WHERE vec_id <> $queryVecId
       |  ORDER BY ham, vec_id LIMIT $shortlist)
       |SELECT vec_id, ham,
       |  round(${sqlDot("embedding", "qe")} /
       |    (${sqlNorm("embedding")} * ${sqlNorm("qe")}), 6) AS cos
       |FROM short ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin
  }

  // -------------------------------------------- persisted ANN index

  /** Persisted ANN index — the serving-shaped layout s1–s3 lack
    * (those recompute their quantizer with a full scan per query; at
    * 100 TB that is a corpus scan per lookup). The IVF "inverted
    * list" layout: `<path>/lists` holds `(vec_id, scale, q)` int8
    * codes DIRECTORY-PARTITIONED by the LSH `bucket` id
    * ([[bucketId]] — deterministic integer hyperplanes, so the
    * bucketing is exactly replicable by the oracle and by driver-side
    * query prep). A probe filters on the partition column, so Spark's
    * static partition pruning reads ONLY the probed lists —
    * nprobe/2^planes of the index, independent of corpus size — and
    * ranks int8 codes (4× less IO than raw floats) by integer dot.
    * `<path>/_graft_ann_meta.json` pins the plane count; probing an
    * index built with different planes is rejected rather than
    * silently routed wrong. Valid for an immutable corpus — rebuild
    * on corpus rewrite, the same contract as [[Dedup.writeCorpusIndex]].
    */
  def writeAnnIndex(emb: DataFrame, path: String,
      planes: Int = LshPlanes): Unit = {
    require(planes >= 1 && planes <= 16, s"planes out of range: $planes")
    // a REBUILD must not leave previously appended batch dirs (or the
    // compacted-token manifest) behind — stale vectors would keep
    // surfacing in probes. Meta deleted FIRST and rewritten LAST: a
    // crash mid-rebuild must read as absent (so ensure* heals it),
    // never as a valid meta over deleted lists.
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(annHadoopConf(emb.sparkSession))
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_ann_meta.json")
    fs.delete(p, false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/lists"), true)
    IndexBatches.clearManifest(fs, path)
    writeAnnBatch(emb, path, AnnBaseBatch, planes)
    val out = fs.create(p, true)
    try out.write(
      s"""{"planes": $planes, "quant": "int8-sym-trunc", "layout": 2}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  private def annHadoopConf(spark: org.apache.spark.sql.SparkSession) =
    org.apache.spark.sql.graft.Shim.classic(spark).sparkContext.hadoopConfiguration

  /** Like the corpus index, every lists write lands under its own
    * `batch=<token>` directory, making appends idempotent per token
    * (see [[appendAnnIndex]]). Both `batch` and `bucket` are
    * discovered partition columns, so a probe's bucket filter prunes
    * directories across ALL batches.
    */
  private val AnnBaseBatch = IndexBatches.Base

  private def writeAnnBatch(emb: DataFrame, path: String, token: String,
      planes: Int): Unit =
    emb.select(
        col("vec_id"),
        round(qScaleCol(col("embedding")), 6).as("scale"),
        qCodesCol(col("embedding")).as("q"),
        bucketId(col("embedding"), planes).as("bucket"))
      // hash-cluster by bucket so each bucket directory gets ~one
      // file (a fragmented list defeats the probe's point-read shape)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/lists/batch=$token")

  /** Extend the index with a fresh vector batch: one quantize+bucket
    * pass over the batch, written under `batch=<batchToken>`.
    * Re-calling with the SAME token (streaming replay) overwrites
    * rather than duplicates; the default random token gives plain
    * at-least-once appends. Beyond `maxAppendBatches` appended dirs,
    * batches tier-compact into one (the base corpus is never
    * rewritten — each compaction costs what arrived since the last
    * one, the shape that survives a 100 TB base with small daily
    * batches). Crash between write and delete leaves duplicate rows,
    * healed by the next compaction's dropDuplicates, never lost
    * vectors.
    */
  def appendAnnIndex(fresh: DataFrame, path: String,
      batchToken: String = java.util.UUID.randomUUID().toString,
      maxAppendBatches: Int = 8): Unit = {
    IndexBatches.requireValidToken(batchToken)
    val spark = fresh.sparkSession
    val planes = readAnnMeta(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(annHadoopConf(spark))
    // replayed batch whose dir a compaction already folded away: the
    // rows are in a compact dir; re-appending would duplicate them
    if (IndexBatches.compactedTokens(fs, path).contains(batchToken)) return
    writeAnnBatch(fresh, path, batchToken, planes)
    IndexBatches.compactionPlan(fs, new org.apache.hadoop.fs.Path(s"$path/lists"),
        maxAppendBatches).foreach { case (dirs, token) =>
      // merged replacement is written BEFORE the manifest and deletes
      // (the read is lazy — the fresh token never collides with an
      // input). basePath: the inputs are themselves batch= partition
      // dirs with bucket= children — without it discovery sees
      // "conflicting directory structures"
      spark.read.option("basePath", s"$path/lists")
        .parquet(dirs.map(_.toString): _*)
        .select("vec_id", "scale", "q", "bucket").dropDuplicates("vec_id")
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/lists/batch=$token")
      IndexBatches.recordCompacted(fs, path, dirs.map(_.getName.stripPrefix("batch=")))
      dirs.foreach(p => fs.delete(p, true))
    }
  }

  /** Build the ANN index iff its meta marker is absent (the
    * rebuild-if-missing entry point query wiring uses).
    */
  def ensureAnnIndex(emb: DataFrame, path: String,
      planes: Int = LshPlanes): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_ann_meta.json")
    val fs = p.getFileSystem(annHadoopConf(emb.sparkSession))
    val usable = fs.exists(p) &&
      // corrupt meta or an older on-disk layout: rebuild rather than
      // fail every probe forever
      (try { readAnnMeta(emb.sparkSession, path); true }
       catch { case _: IllegalStateException => false })
    if (!usable) writeAnnIndex(emb, path, planes)
  }

  private def readAnnMeta(spark: org.apache.spark.sql.SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_graft_ann_meta.json")
    val fs = p.getFileSystem(annHadoopConf(spark))
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // meta without the stamp predates versioning: sniff the dir shape
    // (see Dedup.readIndexMeta for the rationale)
    val layout = """"layout":\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
      .getOrElse(
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/lists/batch=$AnnBaseBatch"))) 2
        else 1)
    if (layout != 2) throw new IllegalStateException(
      s"ANN index at $path uses layout $layout; this library reads layout 2 — " +
        "rebuild with writeAnnIndex")
    """"planes":\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"malformed ANN index meta at $p: $txt"))
  }

  /** Driver-side replica of [[bucketId]] for ONE query vector: the
    * same IEEE double multiply-adds in the same (array-order) fold,
    * so the computed bucket is bit-identical to what the index writer
    * computed in Spark for the same vector.
    */
  def bucketOf(vec: Seq[Float], planes: Int = LshPlanes): Long =
    (0 until planes).map { j =>
      var s = 0.0
      var i = 0
      while (i < vec.length) { s += vec(i).toDouble * planeWeight(j, i + 1).toDouble; i += 1 }
      if (s > 0) 1L << j else 0L
    }.sum

  /** Driver-side replica of [[quantizeInt8]]'s code list for one
    * query vector (max-abs DOUBLE scale, truncation toward zero —
    * exactly the operations the stored codes went through).
    */
  def quantizeVec(vec: Seq[Float]): Array[Int] = {
    val scale = vec.foldLeft(0.0)((m, v) => math.max(m, math.abs(v.toDouble)))
    if (scale == 0.0) Array.fill(vec.length)(0)
    else vec.map(v => (v.toDouble * 127.0 / scale).toInt).toArray
  }

  /** Probe the persisted index: quantize + bucket the query VECTOR on
    * the driver (pure arithmetic, no corpus access), then rank ONLY
    * the probed bucket lists by integer dot product. `multiprobe`
    * additionally probes the hamming-1 buckets (the recall knob, as
    * in [[lshTopKMultiprobe]] — still 1+planes of 2^planes lists).
    * The plan this produces is the one a serving tier wants: a
    * partition-pruned scan of pre-quantized codes, a codegen'd map,
    * and a TakeOrdered(k) — no join, no shuffle, no full-table read.
    */
  def queryAnnIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      vec: Seq[Float], k: Int, multiprobe: Boolean = false,
      excludeVecId: Long = Long.MinValue): DataFrame = {
    val planes = readAnnMeta(spark, path)
    val qb = bucketOf(vec, planes)
    val buckets: Seq[Long] =
      if (multiprobe) qb +: (0 until planes).map(j => qb ^ (1L << j)) else Seq(qb)
    val qq = quantizeVec(vec).toSeq
    val dotInt = aggregate(
      zip_with(col("q"), typedLit(qq), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    spark.read.parquet(s"$path/lists")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("vec_id") =!= excludeVecId)
      .select(col("vec_id"), dotInt.as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Top-k neighbors for a whole BATCH of query vectors against the
    * persisted index — the bulk shape (kNN join) a pipeline runs,
    * where per-vector [[queryAnnIndex]] jobs would be a job per row.
    * The query batch is quantized+bucketed in-plan and broadcast; the
    * bucket equi-join lets dynamic partition pruning skip index
    * buckets no query probes, and the per-query top-k is a
    * PARTITIONED window (rank-limit pushdown keeps it partial), so
    * nothing in the plan is global: index-side work stays
    * proportional to probed buckets × queries per bucket at any
    * corpus size.
    */
  def annSearchBatch(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int): DataFrame = {
    val planes = readAnnMeta(spark, path)
    val qz = queries.select(col("vec_id").as("query_id"),
      qCodesCol(col("embedding")).as("qq"),
      bucketId(col("embedding"), planes).as("bucket"))
    val dotInt = aggregate(
      zip_with(col("q"), col("qq"), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val scored = spark.read.parquet(s"$path/lists")
      .join(broadcast(qz), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), dotInt.as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** All near-duplicate vector PAIRS from the persisted index — the
    * embedding analog of the minhash pair generators, and the plan
    * that replaces d6's label-blocked quadratic blocking at scale:
    * candidates come only from LSH bucket collisions (plus the
    * hamming-1 flips when `multiprobe`, recovering neighbors that
    * crossed ONE hyperplane), scored by the cosine of the stored int8
    * codes (integer dots + IEEE sqrt/div — deterministic across
    * engines). The self-join shuffles on the bucket id, so work is
    * per-bucket-quadratic, never corpus-quadratic; `distinct`
    * collapses pairs found via both sides' flips.
    */
  def annNearDupPairs(spark: org.apache.spark.sql.SparkSession, path: String,
      minCos: Double, multiprobe: Boolean = true): DataFrame = {
    val planes = readAnnMeta(spark, path)
    def norm(c: org.apache.spark.sql.Column) = sqrt(aggregate(
      zip_with(c, c, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double"))
    // norms computed ONCE per vector before the join — inside the
    // per-pair projection they would re-aggregate dim elements per
    // candidate, O(pairs x dim) wasted in the quadratic inner loop
    val lists = spark.read.parquet(s"$path/lists")
      .select(col("vec_id"), col("q"), col("bucket"), norm(col("q")).as("nrm"))
    val flips =
      if (multiprobe) array((lit(0L) +: (0 until planes).map(j => lit(1L << j))): _*)
      else array(lit(0L))
    val a = lists
      .select(col("bucket").cast("long").as("b0"), col("vec_id").as("a"), col("q").as("qa"),
        col("nrm").as("na"), explode(flips).as("flip"))
      .select(col("b0").bitwiseXOR(col("flip")).as("bucket"), col("a"), col("qa"), col("na"))
    val b = lists.select(col("bucket").cast("long").as("bucket"),
      col("vec_id").as("b"), col("q").as("qb"), col("nrm").as("nb"))
    val dot = aggregate(
      zip_with(col("qa"), col("qb"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(dot.cast("double") / (col("na") * col("nb")), 6).as("qcos"))
      .filter(col("qcos") >= minCos)
      .distinct()
  }

  /** DuckDB oracle for [[annNearDupPairs]] (multiprobe form);
    * `where` restricts the corpus like the registration's shard
    * filter (e.g. `"WHERE label <= 1"`).
    */
  def sqlAnnNearDupPairs(minCos: Double, where: String = "",
      planes: Int = LshPlanes): String =
    s"""WITH s AS (SELECT vec_id,
       |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
       |  embedding FROM embeddings $where),
       |qz AS (SELECT vec_id,
       |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
       |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
       |  END AS q,
       |  ${sqlBucketId("embedding", planes)} AS bucket FROM s),
       |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
       |  round(list_reduce(list_prepend(0::BIGINT,
       |      [a.q[i]::BIGINT * b.q[i]::BIGINT for i in range(1, len(a.q) + 1)]),
       |      (s, v) -> s + v)::DOUBLE
       |    / (sqrt(list_reduce(list_prepend(0::BIGINT,
       |        [a.q[i]::BIGINT * a.q[i]::BIGINT for i in range(1, len(a.q) + 1)]),
       |        (s, v) -> s + v)::DOUBLE)
       |     * sqrt(list_reduce(list_prepend(0::BIGINT,
       |        [b.q[i]::BIGINT * b.q[i]::BIGINT for i in range(1, len(b.q) + 1)]),
       |        (s, v) -> s + v)::DOUBLE)), 6) AS qcos
       |  FROM qz a JOIN qz b
       |  ON (a.bucket = b.bucket OR xor(a.bucket, b.bucket) IN (${(0 until planes).map(1L << _).mkString(", ")}))
       |    AND a.vec_id < b.vec_id)
       |SELECT a, b, qcos FROM p WHERE qcos >= $minCos ORDER BY a, b""".stripMargin

  /** DuckDB oracle for [[annSearchBatch]] where the query batch is
    * `vec_id % queryMod = 0` of the embeddings table.
    */
  def sqlAnnSearchBatch(queryMod: Long, k: Int): String =
    s"""WITH s AS (SELECT vec_id,
       |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
       |  embedding FROM embeddings),
       |qz AS (SELECT vec_id,
       |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
       |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
       |  END AS q,
       |  ${sqlBucketId("embedding")} AS bucket FROM s),
       |qs AS (SELECT vec_id AS query_id, q AS qq, bucket FROM qz WHERE vec_id % $queryMod = 0),
       |sc AS (SELECT qs.query_id, e.vec_id,
       |  list_reduce(list_prepend(0::BIGINT,
       |    [e.q[i]::BIGINT * qs.qq[i]::BIGINT for i in range(1, len(e.q) + 1)]),
       |    (s, v) -> s + v) AS score
       |  FROM qz e JOIN qs ON e.bucket = qs.bucket AND e.vec_id <> qs.query_id),
       |r AS (SELECT query_id, vec_id, score,
       |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
       |  FROM sc)
       |SELECT query_id, vec_id, score, CAST(rn AS INTEGER) AS rn
       |FROM r WHERE rn <= $k ORDER BY query_id, rn""".stripMargin

  /** DuckDB oracle for a single-probe [[queryAnnIndex]] whose query
    * vector is row `queryVecId` of the embeddings table: quantize
    * everything, keep the query's bucket, rank by integer dot.
    */
  def sqlAnnIndexed(queryVecId: Long, k: Int): String =
    s"""WITH s AS (SELECT vec_id,
       |  list_max(list_transform(embedding, v -> abs(v::DOUBLE))) AS sc,
       |  embedding FROM embeddings),
       |qz AS (SELECT vec_id,
       |  CASE WHEN sc = 0 THEN list_transform(embedding, v -> 0)
       |       ELSE list_transform(embedding, v -> trunc(v::DOUBLE * 127.0 / sc)::INTEGER)
       |  END AS q,
       |  ${sqlBucketId("embedding")} AS bucket FROM s),
       |qv AS (SELECT q AS qq, bucket AS qb FROM qz WHERE vec_id = $queryVecId)
       |SELECT vec_id, list_reduce(list_prepend(0::BIGINT,
       |    [q[i]::BIGINT * qq[i]::BIGINT for i in range(1, len(q) + 1)]),
       |    (s, v) -> s + v) AS score
       |FROM qz, qv WHERE bucket = qb AND vec_id <> $queryVecId
       |ORDER BY score DESC, vec_id LIMIT $k""".stripMargin

  // ------------------------------------------------- product quantization

  /** PQ subspace count (64-dim embeddings → 16-dim subvectors). */
  val PqM = 4

  /** PQ codebook size per subspace. Deliberately small: codebooks
    * are SEEDED (subvectors of the k smallest vec_ids — the same
    * deterministic-seed trick as s3's IVF and s12's k-means), which
    * keeps every code assignment an exact pure function of the
    * corpus that the DuckDB oracle replicates bit-for-bit. A
    * production index would k-means-train the codebooks
    * ([[Clustering.kmeans]] per subspace) and store 256 centroids;
    * the plan shapes below are identical.
    */
  val PqK = 8

  /** Seeded codebooks: `[m][k][d/m]` floats, collected driver-side
    * (k rows — metadata scale).
    */
  def pqCodebooks(emb: DataFrame, m: Int = PqM, k: Int = PqK): Seq[Seq[Seq[Float]]] = {
    val seeds = emb.orderBy("vec_id").limit(k).select("embedding")
      .collect().map(_.getSeq[Float](0).toSeq).toSeq
    val d = seeds.head.size
    require(d % m == 0, s"dim $d not divisible into $m subspaces")
    val ds = d / m
    (0 until m).map(j => seeds.map(v => v.slice(j * ds, (j + 1) * ds)))
  }

  /** TRAINED codebooks: per-subspace k-means from the seeded
    * codebooks — the production path ([[pqCodebooks]] stays the
    * oracle-exact default). One corpus scan per Lloyd round updates
    * ALL m subspace codebooks jointly: each row assigns each of its m
    * subvectors to that subspace's nearest centroid (pure map, the
    * m×k×(d/m) codebook literal rides along), and a single partial
    * aggregate keyed by (subspace, cluster, dim) — ≤ k·d rows after
    * map-side combine — yields every new centroid at once. m separate
    * [[Clustering.kmeans]] runs would scan the corpus m× per round
    * for the same result. Empty clusters keep their previous
    * centroid. The input projection is persisted for the loop.
    */
  def pqCodebooksTrained(emb: DataFrame, m: Int = PqM, k: Int = PqK,
      iters: Int = 5): Seq[Seq[Seq[Float]]] = {
    var books = pqCodebooks(emb, m, k)
    val ds = books.head.head.size
    val input = emb.select(col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var it = 0
      while (it < iters) {
        val assigns = (0 until m).map { j =>
          val sub = slice(col("embedding"), j * ds + 1, ds)
          val dists = array(books(j).map(c => Clustering.distSq(sub, typedLit(c))): _*)
          struct(lit(j).as("j"),
            (array_position(dists, array_min(dists)) - 1L).cast("int").as("cluster"),
            sub.as("sv"))
        }
        val rows = input
          .select(explode(array(assigns: _*)).as("a"))
          .select(col("a.j"), col("a.cluster"), posexplode(col("a.sv")).as(Seq("pos", "v")))
          .groupBy("j", "cluster", "pos").agg(avg(col("v")).as("mean"))
          .collect() // k·d rows — metadata scale
        val byJC = rows.groupBy(r => (r.getInt(0), r.getInt(1)))
        books = books.zipWithIndex.map { case (cents, j) =>
          cents.indices.map { c =>
            byJC.get((j, c))
              .map(_.sortBy(_.getInt(2)).map(_.getDouble(3).toFloat).toSeq)
              .getOrElse(cents(c))
          }
        }
        it += 1
      }
      books
    } finally input.unpersist(blocking = false)
  }

  /** Same double fold as [[Clustering.distSq]], driver-side (for the
    * query→centroid lookup tables).
    */
  private def distSqScalar(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  private def pqCodeCols(books: Seq[Seq[Seq[Float]]]) = {
    val ds = books.head.head.size
    books.zipWithIndex.map { case (cents, j) =>
      val sub = slice(col("embedding"), j * ds + 1, ds)
      val dists = array(cents.map(c => Clustering.distSq(sub, typedLit(c))): _*)
      (array_position(dists, array_min(dists)) - 1L).as(s"__c$j")
    }
  }

  /** PQ-encode the corpus: 64 floats → one packed code word
    * (`sum_j code_j * k^j`) — a 64× compression. Pure map: the
    * codebooks ride along as literals, assignment is an argmin per
    * subspace (ties to the lowest code, both engines), nothing
    * shuffles.
    */
  def pqEncode(emb: DataFrame, m: Int = PqM, k: Int = PqK,
      trained: Boolean = false, trainIters: Int = 5): DataFrame = {
    val books = if (trained) pqCodebooksTrained(emb, m, k, trainIters)
                else pqCodebooks(emb, m, k)
    emb.select(col("vec_id") +: pqCodeCols(books): _*)
      .select(col("vec_id"),
        (0 until m).map(j => col(s"__c$j") * lit(math.pow(k, j).toLong)).reduce(_ + _).as("pq"))
      .orderBy("vec_id")
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query is NOT
    * quantized — its exact distance to every centroid of every
    * subspace is a tiny `m×k` lookup table computed driver-side
    * (same IEEE fold as the in-plan encoder) and shipped as a
    * literal; each row's approximate distance is m table lookups and
    * an add. This is the PQ serving shape: the corpus is m bytes per
    * vector, the per-row work is O(m), and the scan stays a pure
    * map into TakeOrdered.
    */
  def pqTopK(emb: DataFrame, queryVecId: Long, topK: Int,
      m: Int = PqM, k: Int = PqK,
      trained: Boolean = false, trainIters: Int = 5): DataFrame =
    pqTopKOver(emb, emb, queryVecId, topK, m, k, trained, trainIters)

  /** IVF-PQ: the FAISS serving composition — restrict to the query's
    * coarse cell (here the LSH bucket, the same coarse quantizer the
    * persisted index partitions by), then rank the survivors by ADC
    * over their PQ codes. At scale the bucket filter is partition
    * pruning on the index layout and the ADC pass touches only the
    * probed cell's m-byte codes: I/O ∝ cell size, compute O(m)/row.
    */
  def ivfPqTopK(emb: DataFrame, queryVecId: Long, topK: Int,
      m: Int = PqM, k: Int = PqK,
      trained: Boolean = false, trainIters: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") === queryVecId)
      .select("embedding").head().getSeq[Float](0)
    val qb = bucketOf(q)
    pqTopKOver(
      emb.filter(bucketId(col("embedding")) === qb), emb, queryVecId, topK, m, k,
      trained, trainIters)
  }

  /** [[pqTopK]] generalized: rank `candidates` by ADC while seeding
    * codebooks and fetching the query from `corpus` (so a cell
    * restriction never changes code identities).
    */
  private def pqTopKOver(candidates: DataFrame, corpus: DataFrame,
      queryVecId: Long, topK: Int, m: Int, k: Int,
      trained: Boolean = false, trainIters: Int = 5): DataFrame = {
    val books = if (trained) pqCodebooksTrained(corpus, m, k, trainIters)
                else pqCodebooks(corpus, m, k)
    val ds = books.head.head.size
    val q = corpus.filter(col("vec_id") === queryVecId)
      .select("embedding").head().getSeq[Float](0).toSeq
    val qd: Seq[Seq[Double]] = books.zipWithIndex.map { case (cents, j) =>
      cents.map(c => distSqScalar(q.slice(j * ds, (j + 1) * ds), c))
    }
    candidates.select(col("vec_id") +: pqCodeCols(books): _*)
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        round((0 until m).map(j =>
          element_at(typedLit(qd(j)), col(s"__c$j").cast("int") + 1)).reduce(_ + _), 6)
          .as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(topK)
  }

  /** DuckDB oracle for [[ivfPqTopK]]. */
  def sqlIvfPqTopK(queryVecId: Long, topK: Int, m: Int = PqM, k: Int = PqK): String = {
    val ds = 64 / m
    s"""WITH ${sqlPqCommon(m, k)},
       |q AS (SELECT embedding AS qe, ${sqlBucketId("embedding")} AS qb
       |  FROM embeddings WHERE vec_id = $queryVecId),
       |cell AS (SELECT vec_id FROM embeddings, q
       |  WHERE ${sqlBucketId("embedding")} = qb),
       |qd AS (
       |  SELECT j, c, ${Clustering.sqlDistSq(s"list_slice(qe, j * $ds + 1, (j + 1) * $ds)", "ce")} AS qdist
       |  FROM sub, q)
       |SELECT vec_id,
       |  round(list_reduce(list_prepend(0.0, list(qdist ORDER BY qd.j)), (s, v) -> s + v), 6) AS adist
       |FROM codes JOIN qd ON qd.j = codes.j AND qd.c = codes.code
       |WHERE vec_id IN (SELECT vec_id FROM cell) AND vec_id <> $queryVecId
       |GROUP BY vec_id ORDER BY adist, vec_id LIMIT $topK""".stripMargin
  }

  private def sqlPqCommon(m: Int, k: Int): String = {
    val ds = 64 / m
    s"""seeds AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS se
       |  FROM embeddings ORDER BY vec_id LIMIT $k),
       |sub AS (
       |  SELECT c, j, list_slice(se, j * $ds + 1, (j + 1) * $ds) AS ce
       |  FROM seeds, range(0, $m) r(j)),
       |esub AS (
       |  SELECT vec_id, j, list_slice(embedding, j * $ds + 1, (j + 1) * $ds) AS ev
       |  FROM embeddings, range(0, $m) r(j)),
       |dd AS (
       |  SELECT vec_id, j, c, ${Clustering.sqlDistSq("ev", "ce")} AS dist
       |  FROM esub JOIN sub USING (j)),
       |codes AS (
       |  SELECT vec_id, j, c AS code FROM (
       |    SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn
       |    FROM dd) WHERE rn = 1)""".stripMargin
  }

  /** DuckDB oracle for [[pqEncode]]. */
  def sqlPqEncode(m: Int = PqM, k: Int = PqK): String =
    s"""WITH ${sqlPqCommon(m, k)}
       |SELECT vec_id, CAST(sum(code * ([${(0 until m).map(j => math.pow(k, j).toLong).mkString(", ")}])[j + 1]) AS BIGINT) AS pq
       |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** DuckDB oracle for [[pqTopK]]. */
  def sqlPqTopK(queryVecId: Long, topK: Int, m: Int = PqM, k: Int = PqK): String = {
    val ds = 64 / m
    s"""WITH ${sqlPqCommon(m, k)},
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryVecId),
       |qd AS (
       |  SELECT j, c, ${Clustering.sqlDistSq(s"list_slice(qe, j * $ds + 1, (j + 1) * $ds)", "ce")} AS qdist
       |  FROM sub, q)
       |SELECT vec_id,
       |  -- ordered fold, not sum(): double addition is not associative
       |  -- and Spark adds the m lookups in subspace order (0.0 + x is
       |  -- exact, so the prepend changes nothing)
       |  round(list_reduce(list_prepend(0.0, list(qdist ORDER BY qd.j)), (s, v) -> s + v), 6) AS adist
       |FROM codes JOIN qd ON qd.j = codes.j AND qd.c = codes.code
       |WHERE vec_id <> $queryVecId
       |GROUP BY vec_id ORDER BY adist, vec_id LIMIT $topK""".stripMargin
  }
}
