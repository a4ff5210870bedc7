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
