package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained LEAKAGE-SAFE train/val split — the `q_split_leakage_safe`
  * assignment served as a STORED, INCREMENTALLY-MAINTAINED artifact, the
  * way a training pipeline actually consumes it: build once from the
  * initial corpus, then each ingest batch gets its sides assigned against
  * the store WITHOUT re-clustering the corpus.
  *
  * Why a store at all: the batch split clusters near-duplicates
  * (connected components over exact-Jaccard edges) and hashes each
  * cluster REP to a side, so no near-dup pair straddles the train/val
  * boundary. Re-running that on corpus+batch at every ingest is a corpus
  * recompute — and worse, re-clustering can MERGE old clusters and flip
  * the side of documents a model has already trained on. This store
  * freezes every assignment at write time (a doc's side is immutable —
  * exposure cannot be retracted) and assigns new docs by NEAR-DUP
  * MATCHING against the stored corpus index:
  *
  *  - a batch component matching corpus docs of ONE side inherits it
  *    (rep = the minimum matched rep — stable, since matched reps are
  *    themselves frozen);
  *  - a component matching CONFLICTING sides (or any quarantined doc) is
  *    QUARANTINED — excluded from both sets. This is the only sound
  *    answer: the new doc is near-dup-linked to both a train and a val
  *    document, so either side would leak. The no-straddle invariant
  *    holds inductively over ingest order: among docs sided train/val,
  *    no DIRECT near-dup pair ever crosses the boundary (the spec pins
  *    it by re-deriving pairs from scratch after ingests);
  *  - an unmatched component is brand-new: rep = its minimum doc_id,
  *    side = the same sha256(rep) mod 10 hash the batch split uses.
  *
  * Storage follows the [[MinHashIndex]] pattern it composes with:
  * {{{
  *   root/index/                  the MinHash/LSH corpus index (candidates
  *                                for ingest matching; batches fold in)
  *   root/segments/seg-<token>/   immutable assignment segments
  *                                (doc_id, rep, side)
  *   root/_commits/<token>        segment commit markers
  * }}}
  * An ingest writes its segment dir, CREATES its marker (the atomic
  * commit), then folds the batch into the index keyed by the same token —
  * so a replayed token is a structural no-op at every crash point
  * (marker present → the segment is served; foldOnce already keys on the
  * token). Readers union committed segments only. Single writer per
  * store, same contract as the index it wraps.
  *
  * 100 TB shape: the build pays the corpus clustering once (swap the
  * exact-Jaccard candidate generator for the banded-LSH one at scale —
  * the assignment algebra is identical); every ingest costs the
  * increment's signatures + one broadcast band join against the stored
  * index + a batch-sized component fold. The corpus TEXT is never
  * re-read; the ASSIGNMENT table is scanned twice per ingest (the
  * id-collision guard's semi-join and the matched-rep lookup — both
  * with the churn-sized side broadcast, so the big side never
  * shuffles, and both column-pruned to 1–3 narrow columns). At corpus
  * sizes where even that scan matters, lay the segments out bucketed
  * by hash(doc_id) so both probes prune to the batch's buckets — the
  * algebra here is layout-agnostic.
  */
object SplitStore {

  final case class Store(root: String)

  private val SideHashMod = 10
  private val TrainBuckets = 8 // sha(rep) mod 10 < 8 -> train (80/20)

  /** The side a brand-new cluster rep hashes to — EXACTLY the batch
    * split's formula, so a store built from a corpus equals
    * `q_split_leakage_safe` on that corpus row-for-row.
    */
  private def hashedSide(rep: org.apache.spark.sql.Column) =
    when(
      conv(substring(sha2(rep.cast("string"), 256), 1, 4), 16, 10)
        .cast("bigint") % SideHashMod < TrainBuckets,
      "train").otherwise("val")

  private def segmentsDir(root: String) = Paths.get(root, "segments")
  private def commitsDir(root: String) = Paths.get(root, "_commits")
  private def indexRoot(root: String) = Paths.get(root, "index").toString
  private def ledgerFile(root: String) = Paths.get(root, "_ledger")

  /** Whether `root` holds a split store at all — the `_commits`
    * directory is the store's existence witness (shared by [[compact]]'s
    * refusal and the maintenance gauge, so the two faces agree on what
    * "no store here" means).
    */
  def isStore(root: String): Boolean = Files.exists(commitsDir(root))

  /** The replay-guard LEDGER: every ingest token whose segment a
    * compaction has folded away, one per line. Without it the guard
    * history would have to ride in the compaction markers' supersedes
    * lists TRANSITIVELY (every marker carrying every token ever — the
    * pre-r16 format, still read for compatibility), making marker parse
    * cost grow with ingest history. With the ledger, a live compaction
    * marker carries only the tokens IT folded (bounded by segments since
    * the previous compaction); the ledger grows O(distinct tokens ever)
    * in bytes — the irreducible replay-guard history — but is a single
    * file read, consulted only by the ingest replay guard.
    */
  private def readLedger(root: String): Set[String] = {
    val p = ledgerFile(root)
    if (!Files.exists(p)) Set.empty
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSet
  }

  /** Rewrite the ledger via tmp + atomic move (crash-safe: a torn write
    * never clobbers the previous ledger; a crash after the move but
    * before the compaction marker just records still-live tokens, which
    * the guard would answer true for anyway).
    */
  private def writeLedger(root: String, tokens: Set[String]): Unit = {
    val tmp = Paths.get(root, s"_ledger.tmp-${System.nanoTime()}")
    Files.write(tmp,
      tokens.toSeq.sorted.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ledgerFile(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def markerNames(root: String): Seq[String] = {
    val d = commitsDir(root)
    if (!Files.exists(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Tokens a compaction marker declares superseded ([[compact]]): the
    * marker CONTENT carries the list, so readers exclude a folded-away
    * segment from the moment the compaction commits — cleanup of the old
    * markers and dirs can then crash at any point without double-serving
    * a row.
    */
  private def supersededOf(root: String): Set[String] =
    // only compaction markers carry a supersedes list, and "compact-"
    // is a reserved prefix (ingest refuses it), so plain ingest markers
    // are never opened. A marker's list names the tokens IT folded
    // (bounded by segments since the previous compaction — the full
    // replay-guard history lives in the ledger), so the parse cost per
    // read is O(live segments), genuinely independent of ingest history;
    // pre-ledger stores' transitive lists still parse correctly.
    markerNames(root).filter(_.startsWith("compact-")).flatMap { t =>
      val content = new String(
        Files.readAllBytes(commitsDir(root).resolve(t)),
        StandardCharsets.UTF_8)
      if (content.startsWith("supersedes:"))
        content.stripPrefix("supersedes:").split(",").filter(_.nonEmpty)
      else Array.empty[String]
    }.toSet

  /** The tokens whose segments readers serve: committed and not folded
    * into a later compaction segment.
    */
  private def committedTokens(root: String): Seq[String] = {
    val superseded = supersededOf(root)
    markerNames(root).filterNot(superseded)
  }

  /** Live segment count — the read-amplification gauge [[compact]]
    * folds back to 1 (every [[assignments]] read unions this many
    * listings, and each ingest pays it twice); metadata-only.
    */
  def liveSegments(root: String): Int = committedTokens(root).length

  /** Whether an ingest token has EVER committed — directly (its marker
    * file exists), through a live compaction marker's supersedes list
    * (the crash window between a compaction's commit and its ledger-era
    * cleanup, plus pre-ledger stores whose markers carried the history
    * transitively), or through the ledger (tokens whose segments some
    * compaction folded away). The replay guard must answer true for all
    * three, or a replayed pre-compaction token would re-ingest instead
    * of no-opping.
    */
  private def isCommitted(root: String, token: String): Boolean =
    markerNames(root).contains(token) ||
      supersededOf(root).contains(token) ||
      readLedger(root).contains(token)
  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Build the store from the initial corpus: cluster it exactly as the
    * batch split does (exact-Jaccard edges at `minJ`, min-label
    * components, sha-hashed sides), write the base segment, and
    * materialize the corpus MinHash index future ingests match against.
    */
  def build(doc: DataFrame, root: String, minJ: Double = 0.5): Store = {
    require(!Files.exists(commitsDir(root)),
      s"split store already exists at $root — ingest into it instead")
    val spark = doc.sparkSession
    import spark.implicits._
    val pairs = graft.engine.PersistScope.pinEager(
      graft.queries.DedupQueries.jaccardPairs(doc, minJ)
        .select($"doc_a", $"doc_b"))
    val edges = pairs
      .union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      .toDF("src", "dst")
    val labels = graft.engine.PersistScope
      .track(graft.queries.DedupQueries.minLabelPropagation(edges))
      .withColumnRenamed("node", "doc_id")
    val assigned = doc.select($"doc_id")
      .join(labels, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("rep"))
      .select($"doc_id", $"rep", hashedSide($"rep").as("side"))
    MinHashIndex.materialize(doc, indexRoot(root)): Unit
    commitSegment(spark, root, assigned, token = "base")
    Store(root)
  }

  /** Every committed assignment: (doc_id, rep, side) with
    * side ∈ train | val | quarantine. Immutable rows — segments are
    * append-only by construction.
    */
  def assignments(spark: SparkSession, store: Store): DataFrame = {
    val segs = committedTokens(store.root)
      .map(t => segmentsDir(store.root).resolve(s"seg-$t").toString)
    require(segs.nonEmpty, s"split store at ${store.root} has no segments")
    segs.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** Assign sides to one ingest batch against the stored corpus and
    * commit them as a new segment; the batch then folds into the corpus
    * index so LATER ingests match against it. Returns the batch's
    * assignments. Idempotent per `token` (replay returns the committed
    * segment). Batch doc_ids must be NEW — re-assigning an existing doc
    * would break the immutability the leakage contract rests on, so
    * collisions fail loudly.
    */
  def ingest(
      spark: SparkSession,
      store: Store,
      batch: DataFrame,
      token: String,
      minJ: Double = 0.5): DataFrame =
    ingestWithFaults(spark, store, batch, token, minJ, MinHashIndex.NoFaults)

  private[graft] def ingestWithFaults(
      spark: SparkSession,
      store: Store,
      batch: DataFrame,
      token: String,
      minJ: Double,
      fault: MinHashIndex.FaultInjector): DataFrame = {
    import spark.implicits._
    require(token.nonEmpty && token.matches("[A-Za-z0-9_-]+"),
      s"ingest token '$token' must be a filename-safe identifier")
    require(!token.startsWith("compact-"),
      s"ingest token '$token' uses the reserved compaction prefix — " +
        "'compact-' names are how readers tell a supersede-list marker " +
        "from an ingest marker")
    val segPath = segmentsDir(store.root).resolve(s"seg-$token").toString
    if (isCommitted(store.root, token)) {
      // replay: already committed. FIRST heal the crash window between
      // the segment commit and the index fold — foldOnce is token-keyed
      // idempotent (marker-skip when the fold already ran), so replaying
      // it either no-ops or completes the fold a crash orphaned; without
      // this, a batch could stay assigned but absent from the corpus
      // index, and a later near-dup of its docs would hash a fresh side
      // instead of inheriting — the leakage the store exists to prevent.
      MinHashIndex.foldOnce(batch,
        MinHashIndex.StoredIndex(indexRoot(store.root)), token): Unit
      // the segment itself may have been folded into a compaction
      // segment since — answer from the live assignment set in that
      // case (same rows: assignments are frozen)
      return if (Files.exists(Paths.get(segPath)))
        spark.read.parquet(segPath)
      else assignments(spark, store)
        .join(batch.select($"doc_id"), Seq("doc_id"), "left_semi")
    }
    val corpus = graft.engine.PersistScope.pinEager(
      assignments(spark, store))
    val batchIdsDf = batch.select($"doc_id")
    require(
      corpus.join(batchIdsDf, Seq("doc_id"), "left_semi").isEmpty,
      "ingest batch re-uses already-assigned doc_ids — assignments are " +
        "immutable (a doc's side cannot be retracted once exposed)")

    // one candidate pass: banded-LSH against the stored index + exact
    // verification — yields BOTH batch-batch and batch-corpus pairs
    val pairs = graft.engine.PersistScope.pinEager(
      graft.queries.DedupQueries.incrementalPairs(
        spark, batch, MinHashIndex.StoredIndex(indexRoot(store.root)), minJ)
        .select($"doc_a", $"doc_b"))
    val batchIds = graft.engine.PersistScope.pinEager(
      batchIdsDf.select($"doc_id".as("bid")))
    // classify pair ends via broadcast joins on the batch-id frame
    // (batch-sized — broadcasts; never a shuffle of the pairs)
    val tagged = pairs
      .join(broadcast(batchIds), $"doc_a" === $"bid", "left")
      .withColumnRenamed("bid", "a_b")
      .join(broadcast(batchIds.withColumnRenamed("bid", "bid2")),
        $"doc_b" === $"bid2", "left")
      .select($"doc_a", $"doc_b",
        $"a_b".isNotNull.as("a_in"), $"bid2".isNotNull.as("b_in"))
    val bb = tagged.filter($"a_in" && $"b_in").select($"doc_a", $"doc_b")
    val edges = bb.union(bb.select($"doc_b", $"doc_a")).toDF("src", "dst")
    val labels = graft.engine.PersistScope
      .track(graft.queries.DedupQueries.minLabelPropagation(edges))
      .withColumnRenamed("node", "doc_id")
    val comps = graft.engine.PersistScope.pinEager(
      batch.select($"doc_id")
        .join(labels, Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"label", $"doc_id").as("comp")))
    // batch-corpus matches, folded to the component grain
    val cross = tagged.filter($"a_in" =!= $"b_in")
      .select(
        when($"a_in", $"doc_a").otherwise($"doc_b").as("doc_id"),
        when($"a_in", $"doc_b").otherwise($"doc_a").as("corp_doc"))
    val compMatches = comps
      .join(cross, Seq("doc_id"))
      .join(corpus.select($"doc_id".as("corp_doc"), $"rep".as("c_rep"),
        $"side".as("c_side")), Seq("corp_doc"))
      .groupBy($"comp")
      .agg(
        min($"c_rep").as("m_rep"),
        countDistinct($"c_side").as("n_sides"),
        min($"c_side").as("m_side"),
        max(($"c_side" === "quarantine").cast("int")).as("m_quar"))
    val compAssign = comps.select($"comp").distinct()
      .join(compMatches, Seq("comp"), "left")
      .select(
        $"comp",
        coalesce($"m_rep", $"comp").as("rep"),
        when($"m_rep".isNull, hashedSide($"comp"))
          .when($"n_sides" > 1 || $"m_quar" === 1, "quarantine")
          .otherwise($"m_side").as("side"))
    val assigned = comps.join(compAssign, Seq("comp"))
      .select($"doc_id", $"rep", $"side")
    commitSegment(spark, store.root, assigned, token)
    fault("segment-committed")
    // fold AFTER the commit: a crash between them replays into a
    // marker-skip that re-runs the idempotent (token-keyed) fold —
    // the replay branch above heals exactly this window
    MinHashIndex.foldOnce(batch,
      MinHashIndex.StoredIndex(indexRoot(store.root)), token): Unit
    spark.read.parquet(segPath)
  }

  private def commitSegment(
      spark: SparkSession, root: String, assigned: DataFrame,
      token: String): Unit = {
    val segPath = segmentsDir(root).resolve(s"seg-$token").toString
    assigned.write.mode("overwrite").parquet(segPath)
    Files.createDirectories(commitsDir(root))
    Files.write(commitsDir(root).resolve(token),
      "committed".getBytes(StandardCharsets.UTF_8)): Unit
  }

  /** OFFLINE maintenance: fold every live segment into one coalesced
    * `seg-compact-<n>` segment, so [[assignments]] goes back to a single
    * scan no matter how many ingests have landed (each ingest adds a
    * segment dir — a store fed hourly for a year would otherwise union
    * ~9k listings per read). Same single-writer contract as [[ingest]]:
    * quiesce writers for the duration; readers only need to stay clear
    * of the post-commit old-segment removal (the usual delete-under-
    * reader caveat).
    *
    * Crash safety, per window:
    *  - before the marker lands, the new segment dir is uncommitted and
    *    invisible; the next compact removes such orphans (writers are
    *    quiesced, so an unmarked segment dir can only be a crashed
    *    compaction or crashed pre-marker ingest — either replays);
    *  - the marker CREATE is the single commit point: its content names
    *    the superseded tokens, so readers exclude them immediately;
    *  - cleanup of superseded markers/dirs can crash anywhere — the
    *    next compact (or any later one) finishes it, and readers are
    *    correct throughout because exclusion rides on the live marker's
    *    content, not on the cleanup.
    * Replays of pre-compaction ingest tokens stay no-ops: the guard
    * consults the supersedes lists, not just marker existence.
    */
  def compact(spark: SparkSession, store: Store, nFiles: Int = 8): Unit =
    compactWithFaults(spark, store, nFiles, MinHashIndex.NoFaults)

  private[graft] def compactWithFaults(
      spark: SparkSession, store: Store, nFiles: Int,
      fault: MinHashIndex.FaultInjector): Unit = {
    require(nFiles > 0)
    val root = store.root
    // a root that is not a split store must refuse, not no-op happily —
    // a mistyped path would otherwise report success having done nothing
    require(Files.exists(commitsDir(root)),
      s"$root is not a split store (no _commits directory)")
    // finish any crashed predecessor: drop markers+dirs a live
    // compaction marker superseded, then unmarked (invisible) orphan dirs
    val superseded = supersededOf(root)
    superseded.foreach { t =>
      Files.deleteIfExists(commitsDir(root).resolve(t))
      deleteRecursively(segmentsDir(root).resolve(s"seg-$t").toFile)
    }
    val marked = markerNames(root).toSet
    Option(segmentsDir(root).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("seg-") &&
        !marked(f.getName.stripPrefix("seg-")))
      .foreach(deleteRecursively)
    // stale ledger tmps: a crash between a predecessor's tmp write and
    // its atomic move orphans `_ledger.tmp-*` at the root forever (the
    // segment sweep above only covers the segments dir). Writers are
    // quiesced here, so any tmp ledger is a crashed predecessor's.
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("_ledger.tmp-"))
      .foreach(f => f.delete(): Unit)
    fault("recovered")
    val live = committedTokens(root)
    if (live.size <= 1) return // already one segment: nothing to fold
    val n = (marked ++ superseded ++ readLedger(root)).flatMap { t =>
      if (t.startsWith("compact-")) t.stripPrefix("compact-").toLongOption
      else None
    }.foldLeft(0L)(math.max) + 1
    val token = s"compact-$n"
    val segPath = segmentsDir(root).resolve(s"seg-$token").toString
    assignments(spark, store).coalesce(nFiles)
      .write.mode("overwrite").parquet(segPath)
    fault("merged-written")
    // move the folded tokens' committed-ness into the LEDGER before the
    // marker commit: compacting a compaction marker deletes the previous
    // supersedes list, and the ledger must already hold that history (its
    // own folded tokens AND everything the folded markers had superseded)
    // or a pre-compaction token's replay would re-ingest instead of
    // no-opping. Writing it early is safe: ledger entries for still-live
    // tokens answer the same true the marker would.
    writeLedger(root, readLedger(root) ++ live ++ superseded)
    fault("ledger-written")
    // the single commit point: marker content = the DIRECTLY folded
    // tokens only (bounded by segments since the last compaction — the
    // transitive history lives in the ledger)
    Files.write(commitsDir(root).resolve(token),
      s"supersedes:${live.sorted.mkString(",")}"
        .getBytes(StandardCharsets.UTF_8)): Unit
    fault("committed")
    live.foreach { t =>
      Files.deleteIfExists(commitsDir(root).resolve(t))
      deleteRecursively(segmentsDir(root).resolve(s"seg-$t").toFile)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
