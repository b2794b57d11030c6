package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Crash-safe COMMIT protocol for the persisted index family (the
 * MinHash band index and the banded ANN index — both "a few tables
 * under one root"). Before r10, `minhashIndexAppend`/`annIndexAppend`
 * wrote new files straight into live partition directories: purely
 * additive, but a writer crash BETWEEN the two table writes (sigs
 * landed, bands didn't — or mid-move generally) left partial state
 * visible to the next probe, and a blind re-run then duplicated rows.
 *
 * The fix is a versioned file MANIFEST, the open-table-format idea
 * (Iceberg/Delta snapshot lists) at the smallest size that closes the
 * gap:
 *  - `<root>/_manifest/v<seq>.txt` lists every committed data file
 *    (path relative to the root, one per line). The underscore prefix
 *    keeps Spark's own directory scans from ever reading it as data.
 *  - READERS resolve the highest committed version and open exactly
 *    those files (`readTable`) — an uncommitted file in a live
 *    directory is invisible, so any crash before the manifest flip
 *    leaves every probe ≡ pre-append, byte for byte. An index with no
 *    manifest (pre-r10 layout) falls back to directory listing
 *    unchanged.
 *  - WRITERS stage the batch under `<root>/_staging/<uuid>/`, MOVE the
 *    finished files into the live tree (per-file rename — metadata
 *    ops), then flip visibility with ONE manifest commit: the next
 *    version is written to a dot-temp file and renamed into place.
 *    Crash before the flip → orphan files only (an [[orphans]] sweep
 *    lists them for cleanup); crash after → the append is complete.
 *  - FENCING: the rename targets a version-numbered name, so on HDFS
 *    (rename never overwrites) a losing concurrent committer fails,
 *    re-reads the new head, and retries with disjoint file additions.
 *    On a raw local FS the existence check narrows but cannot close
 *    the race (java rename replaces); an object-store deployment
 *    should back this with a conditional-put, exactly as Delta's
 *    LogStore does. Single-writer-per-index remains the documented
 *    deployment shape; the manifest's job is CRASH atomicity.
 *
 * The flat tombstone table stays OUTSIDE the manifest on purpose: its
 * rows are semantically idempotent (mask/stats deduplicate), so a
 * torn tombstone append can at worst re-deliver a delete — the one
 * write here that is safe to re-run blindly.
 */
object IndexManifest {

  private def manifestDir(root: String): String =
    root.stripSuffix("/") + "/_manifest"
  private[operators] def stagingRoot(root: String): String =
    root.stripSuffix("/") + "/_staging"

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".txt"))
      name.stripPrefix("v").stripSuffix(".txt").toLongOption
    else None

  /** Highest committed (version, files) — None for a pre-manifest
    * index. Files are root-relative. */
  def read(spark: SparkSession, root: String): Option[(Long, Seq[String])] = {
    val vs = versionPaths(spark, root)
    if (vs.isEmpty) None
    else {
      val (v, p) = vs.maxBy(_._1)
      Some((v, readVersionFile(spark, root, p)))
    }
  }

  /** Every committed version at this root, ascending — the time-travel
    * axis. Empty for a pre-manifest index. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    versionPaths(spark, root).map(_._1).sorted

  /** The file list a SPECIFIC committed version names — None if that
    * version was never committed (or its manifest was vacuumed). */
  def readAt(spark: SparkSession, root: String,
      version: Long): Option[Seq[String]] =
    versionPaths(spark, root).find(_._1 == version)
      .map { case (_, p) => readVersionFile(spark, root, p) }

  private def versionPaths(spark: SparkSession,
      root: String): Seq[(Long, Path)] = {
    val fs = fsOf(spark, root)
    val dir = new Path(manifestDir(root))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath.getName).map(_ -> s.getPath))
  }

  private def readVersionFile(spark: SparkSession, root: String,
      p: Path): Seq[String] = {
    val fs = fsOf(spark, root)
    val in = fs.open(p)
    val body = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Commit `currentFiles ++ added` as the next version; returns it.
    *
    * FENCING (r11): the old fence was check-then-act
    * (`!fs.exists(target) && fs.rename(tmp, target)`) — on a local FS
    * (and most object stores) rename OVERWRITES, so two concurrent
    * committers could both "win" one version and silently drop one
    * commit's files from the manifest. The claim is now
    * `fs.create(v<seq>.claim, overwrite=false)` — atomic
    * create-if-absent on both local FS and HDFS — and only the claim
    * winner renames its content into `v<seq>.txt` (readers only ever
    * see `.txt`, which appears complete-or-not-at-all via rename). A
    * loser waits for the winner's `.txt` to land, then retries on the
    * new head, so its files are re-added on top of the winner's list
    * instead of clobbering it. A claim whose `.txt` never appears
    * (claimer crashed mid-flip) fails the retry loop LOUDLY, naming
    * the stale claim file — never a silent drop. */
  def commit(spark: SparkSession, root: String, added: Seq[String]): Long =
    advance(spark, root, _ ++ added, "commit")

  /** The shared claim-then-rename protocol behind [[commit]] and
    * [[replace]]: `nextFiles` maps the head version's file list to the
    * next version's. */
  private def advance(spark: SparkSession, root: String,
      nextFiles: Seq[String] => Seq[String], op: String): Long = {
    val fs = fsOf(spark, root)
    val dir = new Path(manifestDir(root))
    fs.mkdirs(dir)
    var attempt = 0
    var lastClaim: Path = null
    while (attempt < 20) {
      val (prev, files) = read(spark, root).getOrElse((-1L, Seq.empty))
      val next = prev + 1
      val target = new Path(dir, f"v$next%019d.txt")
      val claim = new Path(dir, f".v$next%019d.claim")
      lastClaim = claim
      val claimed =
        try { fs.create(claim, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (claimed) {
        val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, false)
        try out.write((nextFiles(files).mkString("\n") + "\n")
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        require(fs.rename(tmp, target),
          s"IndexManifest.$op: rename to $target failed after claim")
        fs.delete(claim, false)
        return next
      }
      // lost the claim: wait for the winner's version file to appear
      // so the retry builds on TOP of it (bounded — a crashed claimer
      // must surface as an error, not an infinite spin)
      var waits = 0
      while (!fs.exists(target) && waits < 50) { Thread.sleep(100); waits += 1 }
      attempt += 1
    }
    throw new IllegalStateException(
      s"IndexManifest.$op: could not claim a version after $attempt " +
        s"attempts at $root — if no committer is live, a crashed commit " +
        s"left a stale claim file ($lastClaim): remove it and retry")
  }

  /**
   * Commit `files` as the next version, REPLACING the previous file
   * list instead of appending to it — the publish primitive for
   * whole-snapshot flips (stream_cdc's versioned state snapshots,
   * vacuum/compact destinations): the new version names only the new
   * snapshot's files, readers resolve the head atomically through the
   * same claim+rename protocol as [[commit]], and the superseded
   * version's files become [[orphans]] for a later sweep. Unlike
   * [[snapshot]]'s old delete-then-recommit shape there is NO window
   * where the manifest is absent (a reader during that window fell
   * back to raw directory listing — mixed versions).
   */
  def replace(spark: SparkSession, root: String, files: Seq[String]): Long =
    advance(spark, root, _ => files, "replace")

  /** Recursive data files under root/subdir, root-relative, hidden
    * (`_`/`.`) names skipped — Spark's own visibility rule. */
  def listDataFiles(spark: SparkSession, root: String,
      subdir: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val base = new Path(
      if (subdir.isEmpty) root.stripSuffix("/")
      else root.stripSuffix("/") + "/" + subdir)
    if (!fs.exists(base)) return Seq.empty
    val rootUri = new Path(root.stripSuffix("/")).toUri.getPath
    val out = Seq.newBuilder[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet")) out +=
          s.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      }
    }
    walk(base)
    out.result()
  }

  /** Snapshot the CURRENT directory contents of `subdirs` as the next
    * committed version — for overwrite builds (v0) and for external
    * rewrites (vacuum/compact destinations). */
  def snapshot(spark: SparkSession, root: String,
      subdirs: Seq[String]): Long =
    // REPLACE the file list in one atomic version flip — the pre-r11
    // shape (delete manifest history, then re-commit) left a window
    // where no manifest existed and readers fell back to raw directory
    // listing, seeing mixed committed/uncommitted state
    replace(spark, root, subdirs.flatMap(listDataFiles(spark, root, _)))

  /**
   * Open `root/subdir` through the manifest when one exists — only
   * committed files are visible — else by directory listing (legacy
   * pre-manifest index). `basePath` keeps partition-directory columns
   * (band=…/bucket=…) alive on the explicit-file read, so partition
   * pruning and the numFiles metrics behave exactly as before.
   */
  def readTable(spark: SparkSession, root: String, subdir: String): DataFrame =
    readTableFiles(spark, root, subdir, read(spark, root).map(_._2))

  /**
   * TIME-TRAVEL read: open `root/subdir` as a PINNED committed version
   * — the reproducibility primitive (re-run last week's dedup audit
   * against exactly the index it probed; diff a probe across two index
   * versions). Versions stay readable until an [[orphans]] sweep with
   * the default retention reclaims files the head no longer references
   * — retain history by sweeping with `retainVersions > 1`, exactly
   * the Iceberg/Delta snapshot-expiry trade-off. Fails loudly on a
   * never-committed (or expired) version.
   */
  def readTableAt(spark: SparkSession, root: String, subdir: String,
      version: Long): DataFrame =
    readTableFiles(spark, root, subdir,
      Some(readAt(spark, root, version).getOrElse(throw new IllegalStateException(
        s"IndexManifest.readTableAt: version $version was never committed " +
          s"at $root (committed: ${versions(spark, root).mkString(", ")})"))))

  private def readTableFiles(spark: SparkSession, root: String,
      subdir: String, committed: Option[Seq[String]]): DataFrame = {
    val dir =
      if (subdir.isEmpty) root.stripSuffix("/")
      else root.stripSuffix("/") + "/" + subdir
    committed match {
      case Some(files) =>
        // subdir "" = the root IS the (single-table) index — the flat
        // IVF/PQ/SQ8 layouts; every committed file belongs to it
        val mine = files.filter(f => subdir.isEmpty || f.startsWith(subdir + "/"))
          .map(root.stripSuffix("/") + "/" + _)
        if (mine.isEmpty) {
          // A manifest exists but lists NO files for this table: the
          // committed state IS empty. Falling back to a raw directory
          // listing here would leak a crashed append's
          // promoted-but-uncommitted files to probes — the exact
          // invariant the manifest exists to hold. Use any live files
          // footer-only for the schema (lit(false) constant-folds the
          // scan away) and return zero rows; with no live files either
          // there is no schema to honor, so fail loudly rather than
          // guess one.
          val live = listDataFiles(spark, root, subdir)
          if (live.nonEmpty)
            spark.read.option("basePath", dir)
              .parquet(live.map(root.stripSuffix("/") + "/" + _): _*)
              .where(org.apache.spark.sql.functions.lit(false))
          else throw new IllegalStateException(
            s"IndexManifest.readTable: manifest at $root commits zero " +
              s"files for '$subdir' and no data files exist to infer a " +
              s"schema from — the committed table is empty; supply the " +
              s"schema at the call site if an empty frame is expected")
        }
        else spark.read.option("basePath", dir).parquet(mine: _*)
      case None => spark.read.parquet(dir)
    }
  }

  /**
   * MOVE every data file under `stagingDir` (which mirrors the index
   * layout) into the live tree and return the moved root-relative
   * paths — the pre-commit half of an append. Parquet part names
   * carry UUIDs, so collisions don't occur; a crash mid-move leaves
   * some files live-but-uncommitted (invisible to readers) and the
   * rest staged.
   */
  def promoteStaged(spark: SparkSession, root: String,
      stagingDir: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val stagedBase = new Path(stagingDir)
    val stagedUri = stagedBase.toUri.getPath
    val moved = Seq.newBuilder[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (s.isDirectory) walk(s.getPath)
        else if (n.endsWith(".parquet")) {
          val rel = s.getPath.toUri.getPath.stripPrefix(stagedUri)
            .stripPrefix("/")
          val dest = new Path(root.stripSuffix("/") + "/" + rel)
          fs.mkdirs(dest.getParent)
          require(fs.rename(s.getPath, dest),
            s"IndexManifest: failed to promote staged file $rel")
          moved += rel
        }
      }
    }
    walk(stagedBase)
    fs.delete(stagedBase, true)
    moved.result()
  }

  /** Live-tree data files NOT referenced by any of the newest
    * `retainVersions` manifests — crashed-append debris plus files only
    * older versions name; safe to delete any time at the cost of
    * time-travel past the retention horizon (`retainVersions = 1`
    * keeps only the head — the pre-r11 behavior). */
  def orphans(spark: SparkSession, root: String, subdirs: Seq[String],
      retainVersions: Int = 1): Seq[String] = {
    require(retainVersions >= 1, "retainVersions must be >= 1")
    val retained = versions(spark, root).takeRight(retainVersions)
    if (retained.isEmpty) Seq.empty
    else {
      val committed = retained
        .flatMap(v => readAt(spark, root, v).getOrElse(Seq.empty)).toSet
      subdirs.flatMap(listDataFiles(spark, root, _))
        .filterNot(committed)
    }
  }
}
