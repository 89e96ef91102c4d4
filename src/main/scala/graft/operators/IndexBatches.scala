package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared lifecycle for on-disk indexes laid out as
  * `<table>/batch=<token>` partition directories (the corpus prefix
  * index and the ANN index): reserved-token validation, append-dir
  * listing, the compacted-token manifest that keeps same-token
  * replay idempotent ACROSS compactions, and two-tier compaction
  * selection.
  *
  * Replay contract: an append token is idempotent forever. Before a
  * compaction folds its directory away, replay means "overwrite my
  * own batch= dir"; after, the token is recorded in
  * `_graft_compacted_tokens` and a replayed append is a no-op (the
  * rows already live in a compact dir — re-appending them would
  * duplicate, which for these indexes multiplies verified results,
  * not just candidates).
  *
  * Tiering: plain append dirs merge into a `compact-` dir once they
  * exceed the threshold; the compact dirs themselves merge only when
  * THEY exceed it. Each row is therefore rewritten O(levels) times
  * (batch → compact → compact-of-compacts), not once per compaction
  * cycle — the write-amplification shape that survives an unbounded
  * micro-batch stream.
  *
  * Concurrency contract: SINGLE WRITER per index (the streaming
  * ingest's foreachBatch already serializes within one query).
  * Concurrent appenders with distinct tokens are safe with each
  * other but can race a concurrent compaction's manifest rewrite or
  * dir deletes; coordinate multiple writers externally, exactly as
  * for any filesystem table without a transaction log. A reader
  * overlapping the write-then-delete window can briefly see a row in
  * both its batch dir and the new compact dir — duplicate rows, the
  * same at-least-once artifact a crash leaves, healed by the next
  * compaction's dropDuplicates.
  */
private[operators] object IndexBatches {
  val Base = "base"
  private val CompactPrefix = "compact-"
  private val ManifestName = "_graft_compacted_tokens"

  def requireValidToken(token: String): Unit =
    require(token.nonEmpty && token != Base && !token.startsWith(CompactPrefix),
      s"reserved batch token: $token")

  /** `batch=` dirs under `tableDir`, base excluded. */
  def appendDirs(fs: FileSystem, tableDir: Path): Seq[Path] =
    if (!fs.exists(tableDir)) Nil
    else fs.listStatus(tableDir).toSeq.filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("batch=") && p.getName != s"batch=$Base")

  /** Tokens already folded into a compact dir. The manifest keeps
    * every folded token forever (~40 bytes each, read driver-side per
    * append): only the caller knows the stream's replayable window,
    * so nothing here can prune safely. When a streaming checkpoint is
    * discarded — no batch before it can ever replay — the caller may
    * delete the manifest along with it.
    */
  def compactedTokens(fs: FileSystem, indexPath: String): Set[String] = {
    val p = new Path(s"$indexPath/$ManifestName")
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Record input tokens of a finished merge (compact tokens are
    * reserved and can never be replayed, so only plain tokens are
    * kept — their constituents are already listed).
    */
  def recordCompacted(fs: FileSystem, indexPath: String, tokens: Seq[String]): Unit = {
    val all = compactedTokens(fs, indexPath) ++
      tokens.filterNot(_.startsWith(CompactPrefix))
    val out = fs.create(new Path(s"$indexPath/$ManifestName"), true)
    try out.write(all.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  def clearManifest(fs: FileSystem, indexPath: String): Unit =
    fs.delete(new Path(s"$indexPath/$ManifestName"), false)

  /** The dirs to merge and the fresh compact token, or None when no
    * tier exceeds `maxAppendBatches`.
    */
  def compactionPlan(fs: FileSystem, tableDir: Path,
      maxAppendBatches: Int): Option[(Seq[Path], String)] = {
    val all = appendDirs(fs, tableDir)
    val (compacts, plain) = all.partition(_.getName.startsWith(s"batch=$CompactPrefix"))
    val tier =
      if (plain.size > maxAppendBatches) Some(plain)
      else if (compacts.size > maxAppendBatches) Some(compacts)
      else None
    tier.map { dirs =>
      // the token must not collide with any existing dir: merge reads
      // are lazy, so writing into an input dir would corrupt it
      var token = s"$CompactPrefix${System.currentTimeMillis()}"
      while (all.exists(_.getName == s"batch=$token")) token += "x"
      (dirs, token)
    }
  }
}
