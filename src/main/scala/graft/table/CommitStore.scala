package graft.table

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}

/** The commit protocol behind every table/index mutation — the ONLY
  * place the engine relies on storage atomicity. Data files are
  * immutable once written; what makes a write visible is a pointer
  * update or a directory swap, and those two primitives are this
  * interface.
  *
  * [[LocalCommitStore]] implements them with POSIX atomic rename, which
  * holds on a local filesystem and on HDFS. S3-class object stores have
  * no atomic rename — a production object-store implementation would
  * use a conditional put (`If-Match` on the pointer object's ETag) for
  * [[putPointer]] and a manifest-log commit (append a manifest naming
  * the new file set, pointer = last committed manifest) instead of
  * [[swapDir]]; the engine code above this interface is unchanged.
  * README §commit-protocol documents the variant.
  *
  * Tests inject a failing store to pin the crash-window contract: a
  * crash BEFORE the pointer/swap primitive leaves the table serving the
  * old version (orphan data is invisible and vacuumable); the primitive
  * itself is all-or-nothing.
  */
trait CommitStore extends Serializable {

  /** Atomically publish `content` at `path`: readers see the old
    * content or the new, never a torn write. */
  def putPointer(path: Path, content: String): Unit

  /** The current pointer content, if the pointer exists. */
  def readPointer(path: Path): Option[String]

  /** Atomically-as-possible replace directory `target` with the staged
    * directory `staged`. Local impl is two renames (old → trash,
    * staged → target) + trash delete — the not-fully-atomic window is
    * between the renames and is healed by [[healSwap]] on next access.
    * An object-store impl replaces this with a manifest commit. */
  def swapDir(staged: Path, target: Path): Unit

  /** Recover from a crash inside [[swapDir]]'s rename window: if
    * `target` is missing but its trash twin exists, restore it.
    * Returns true if a heal happened. */
  def healSwap(target: Path): Boolean

  /** Heal every interrupted [[swapDir]] under `dir`: the dir itself
    * (via [[healSwap]]) plus its DIRECT children — a swap target inside
    * a partitioned table (e.g. `term_bucket=N`) leaves its trash twin
    * as a sibling, which partition discovery would otherwise pick up as
    * a garbage partition. Trash whose twin exists is a completed swap's
    * leftover and is deleted; trash whose twin is missing is restored.
    * Called from read entry points ([[graft.Tables.loadPath]],
    * [[ParquetCatalog.table]]/`listTables`) so recovery is automatic,
    * not manual. Cost: one directory listing — metadata-scale. Returns
    * the number of heals/cleanups. Default no-op for stores whose
    * swap primitive has no crash window (manifest-log commit). */
  def healSwapsUnder(dir: Path): Int = 0

  /** Recursive delete (vacuum / trash cleanup). */
  def deleteRecursive(path: Path): Unit
}

/** Manifest-log implementation — the object-store commit protocol
  * (S3-class stores have no atomic rename), emulated on a local
  * filesystem so the whole engine can run and be crash-tested against
  * it.
  *
  * Protocol (per pointer path / swap target `X`):
  *  - an append-only manifest log lives in the hidden dir `.X.mlog/`:
  *    files `m00000000`, `m00000001`, … — committed state = the
  *    HIGHEST manifest. Appending uses genuinely conditional primitives
  *    (`link(2)` for manifest files, `open(O_CREAT|O_EXCL)` claim
  *    markers for version dirs — the local stand-ins for a conditional
  *    put / `If-None-Match`; NOT `rename(2)`, which silently replaces
  *    on POSIX): two racing committers cannot both win one sequence
  *    number.
  *  - [[swapDir]] never renames live data: the staged dir is promoted
  *    to an immutable version under `.X.versions/` (on a real object
  *    store the staged write targets that immutable name directly),
  *    then ONE manifest append commits it. A crash anywhere leaves the
  *    previous version fully serving — there is no torn window to heal.
  *  - read view: `X` itself is a SYMLINK to the committed version
  *    (local stand-in for "readers resolve the manifest"), flipped
  *    atomically after the commit; [[healSwap]] realigns a link that a
  *    crash left behind the manifest head, and read paths invoke it via
  *    [[healSwapsUnder]].
  *
  * The auxiliary dirs are dot-prefixed so Spark/Hadoop file listing and
  * partition discovery never see them (a visible `term_bucket=3.versions`
  * sibling would read as a phantom partition value). */
object ManifestCommitStore extends CommitStore {

  private def mlogOf(path: Path): Path =
    path.resolveSibling("." + path.getFileName.toString + ".mlog")
  private def versionsOf(target: Path): Path =
    target.resolveSibling("." + target.getFileName.toString + ".versions")
  private def vname(seq: Int): String = f"v$seq%08d"

  private def lastManifest(mlog: Path): Option[Path] =
    if (!Files.isDirectory(mlog)) None
    else {
      val s = Files.list(mlog)
      try {
        var best: Path = null
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("m") &&
              (best == null ||
                n.compareTo(best.getFileName.toString) > 0)) best = p
        }
        Option(best)
      } finally s.close()
    }

  private def nextSeq(mlog: Path): Int =
    lastManifest(mlog)
      .map(_.getFileName.toString.stripPrefix("m").toInt + 1).getOrElse(0)

  /** Append `content` as the next manifest. The CAS is a HARD LINK to
    * the fully-written temp file: `link(2)` fails with EEXIST when the
    * name is taken (unlike `rename(2)`, which silently replaces — a
    * move here would let two racing committers both claim one sequence
    * number and lose a manifest). The content is complete before the
    * name appears, so a concurrent reader never sees a torn manifest.
    * On a lost race, retry with the next sequence number. */
  override def putPointer(path: Path, content: String): Unit = {
    val mlog = mlogOf(path)
    Files.createDirectories(mlog)
    val tmp = Files.createTempFile(mlog, ".stage", "")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    var seq = nextSeq(mlog)
    var committed = false
    var attempts = 0
    while (!committed) {
      committed = linkIfAbsent(mlog.resolve("m" + f"$seq%08d"), tmp)
      if (!committed) {
        seq += 1; attempts += 1
        require(attempts < (1 << 20), s"manifest CAS livelock at $path")
      }
    }
    Files.delete(tmp) // the committed name keeps the inode alive
  }

  /** The conditional-put primitive (local stand-in for If-None-Match):
    * true iff `dst` did not exist and now carries `src`'s content. */
  private[table] def linkIfAbsent(dst: Path, src: Path): Boolean =
    try { Files.createLink(dst, src); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  /** Claim a name with `open(O_CREAT|O_EXCL)` semantics — the
    * conditional primitive for names that will hold a DIRECTORY (hard
    * links can't target dirs): true iff this caller created the claim. */
  private[table] def claimIfAbsent(claim: Path): Boolean =
    try { Files.createFile(claim); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }

  override def readPointer(path: Path): Option[String] =
    lastManifest(mlogOf(path)).map(p =>
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))

  override def swapDir(staged: Path, target: Path): Unit = {
    val versions = versionsOf(target)
    Files.createDirectories(versions)
    healSwap(target) // finish any crashed adoption/flip before committing
    // one-time adoption of a pre-store plain directory: commit it as a
    // version FIRST (manifest before move — heal can then always finish)
    if (Files.isDirectory(target) && !Files.isSymbolicLink(target) &&
        readPointer(target).isEmpty) {
      val v0 = vname(0)
      putPointer(target, v0)
      claimIfAbsent(versions.resolve(claimName(0)))
      Files.move(target, versions.resolve(v0))
      relink(target, versions.resolve(v0))
    }
    // promote the staged dir to the next immutable version. The name is
    // claimed FIRST via a create-exclusive marker file (rename alone
    // would silently replace a racing committer's version on POSIX);
    // once claimed the name is uniquely ours and the move cannot race.
    // Claim markers persist so a vacuumed version's number is never
    // reused (nextVersionSeq counts them).
    var seq = math.max(nextVersionSeq(versions), 1)
    var promoted: Path = null
    while (promoted == null) {
      if (claimIfAbsent(versions.resolve(claimName(seq)))) {
        val dst = versions.resolve(vname(seq))
        Files.move(staged, dst, StandardCopyOption.ATOMIC_MOVE)
        promoted = dst
      } else seq += 1
    }
    val prev = readPointer(target)
    putPointer(target, promoted.getFileName.toString) // THE commit
    relink(target, promoted)                          // read view
    // vacuum superseded versions (crash before this leaves inspectable,
    // never-serving orphans)
    prev.filter(_ != promoted.getFileName.toString)
      .foreach(v => deleteRecursive(versions.resolve(v)))
  }

  private def claimName(seq: Int): String = "." + vname(seq) + ".claim"

  private def nextVersionSeq(versions: Path): Int = {
    val s = Files.list(versions)
    try {
      var mx = -1
      val it = s.iterator()
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        // count claim markers too: a vacuumed version leaves its claim
        // behind, and its sequence number must never be reissued
        val core =
          if (n.startsWith(".") && n.endsWith(".claim"))
            n.stripPrefix(".").stripSuffix(".claim")
          else n
        if (core.startsWith("v") && core.drop(1).forall(_.isDigit))
          mx = math.max(mx, core.stripPrefix("v").toInt)
      }
      mx + 1
    } finally s.close()
  }

  private def relink(target: Path, dst: Path): Unit = {
    val tmp = Files.createTempFile(dst.getParent, ".lnk", "")
    Files.delete(tmp) // need the unique name, not the file
    Files.createSymbolicLink(tmp, dst.toAbsolutePath)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Realign the read view with the manifest head (crash between commit
    * and link flip, or an unfinished adoption). */
  override def healSwap(target: Path): Boolean =
    readPointer(target) match {
      case Some(v) =>
        val want = versionsOf(target).resolve(v).toAbsolutePath
        if (Files.isDirectory(target) && !Files.isSymbolicLink(target)) {
          // adoption committed but the plain dir never moved
          if (!Files.exists(want)) Files.move(target, want)
          relink(target, want); true
        } else if (!Files.isSymbolicLink(target) ||
            Files.readSymbolicLink(target) != want) {
          if (Files.exists(want)) { relink(target, want); true }
          else false // manifest names a vacuumed version: nothing to do
        } else false
      case None => false
    }

  override def healSwapsUnder(dir: Path): Int = {
    var acted = if (healSwap(dir)) 1 else 0
    if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      val targets = try {
        val b = Seq.newBuilder[Path]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith(".") && n.endsWith(".mlog"))
            b += dir.resolve(n.stripPrefix(".").stripSuffix(".mlog"))
        }
        b.result()
      } finally s.close()
      targets.foreach(t => if (healSwap(t)) acted += 1)
    }
    acted
  }

  override def deleteRecursive(path: Path): Unit = {
    // a symlinked target deletes as just the link (walk doesn't follow);
    // dropping a protocol-managed path must also drop its manifest log
    // and version store, or a later re-create would resolve the STALE
    // manifest and adopt the old data. No-ops for plain paths.
    LocalCommitStore.deleteRecursive(path)
    LocalCommitStore.deleteRecursive(mlogOf(path))
    LocalCommitStore.deleteRecursive(versionsOf(path))
  }
}

/** POSIX-rename implementation — correct on local FS and HDFS. */
object LocalCommitStore extends CommitStore {

  private def trashOf(target: Path): Path =
    target.resolveSibling(target.getFileName.toString + "__old")

  override def putPointer(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def readPointer(path: Path): Option[String] =
    if (!Files.exists(path)) None
    else Some(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  override def swapDir(staged: Path, target: Path): Unit = {
    val trash = trashOf(target)
    if (Files.exists(trash)) deleteRecursive(trash) // stale from a crash
    if (Files.exists(target)) Files.move(target, trash)
    Files.move(staged, target)
    if (Files.exists(trash)) deleteRecursive(trash)
  }

  override def healSwap(target: Path): Boolean = {
    val trash = trashOf(target)
    if (!Files.exists(target) && Files.exists(trash)) {
      Files.move(trash, target); true
    } else false
  }

  override def healSwapsUnder(dir: Path): Int = {
    var acted = if (healSwap(dir)) 1 else 0
    if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      val trashes = try {
        val b = Seq.newBuilder[Path]
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith("__old")) b += p
        }
        b.result()
      } finally s.close()
      trashes.foreach { trash =>
        val name = trash.getFileName.toString
        val twin = trash.resolveSibling(name.dropRight("__old".length))
        if (!Files.exists(twin)) Files.move(trash, twin)
        else deleteRecursive(trash) // completed swap, crash before cleanup
        acted += 1
      }
    }
    acted
  }

  override def deleteRecursive(path: Path): Unit = {
    if (Files.exists(path)) {
      val s = Files.walk(path)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().forEachRemaining(p => Files.delete(p))
      finally s.close()
    }
  }
}
