package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The filesystem-atomicity seam of the snapshot commit protocol (the
  * Delta LogStore idea): [[Snapshot]]'s version CAS is "publish the
  * `_commit.v<N>` marker iff no other writer has" — and WHAT makes that
  * publish atomic is a property of the storage system, not of the
  * protocol. This trait isolates the assumption so deployments can swap
  * the primitive:
  *
  *   - [[CommitStore.AtomicCreate]] (the default) relies on
  *     `FileSystem.create(path, overwrite = false)` being an atomic
  *     create-if-absent. TRUE on HDFS and ABFS (and on any single-JVM
  *     posture, where [[Snapshot]]'s per-table lock already serializes
  *     writers before the store is reached). NOT TRUE on S3-family
  *     stores — S3A's `create(false)` is a non-atomic exists-then-write,
  *     so two processes can both "win" and one commit is silently lost —
  *     and not true of RawLocalFileSystem across processes either.
  *   - [[CommitStore.InMemoryCas]] shows the object-store answer: an
  *     EXTERNAL strongly-consistent arbiter (Delta runs DynamoDB; any
  *     putIfAbsent table works) decides the version claim, and only the
  *     arbiter's winner writes the marker file — the file write itself
  *     then needs no atomicity at all. This impl's arbiter is an
  *     in-process map, i.e. the single-driver posture
  *     (S3SingleDriverLogStore); a multi-driver deployment keeps the
  *     same shape and swaps the map for a real external table.
  *
  * Belt and braces: whichever store is plugged in, [[Snapshot]] reads
  * the marker BACK after a claimed win and treats foreign content as a
  * lost race — a non-atomic store that lets two writers through is
  * detected loudly (the stomped writer rebases or aborts) instead of
  * silently dropping a commit. The read-back narrows but cannot close
  * the two-blind-writers window, which is why the contract demands a
  * genuinely conditional primitive.
  */
trait CommitStore {

  /** Publish `payload` at `path` iff no commit exists there yet.
    * Returns true iff THIS call won the claim. Implementations must
    * make the claim decision atomic across every writer that could
    * target `path`; after a true return the payload must be readable
    * at `path`.
    */
  def putIfAbsent(fs: FileSystem, path: Path, payload: Array[Byte]): Boolean
}

object CommitStore {

  /** Exclusive-create store: atomic wherever the filesystem's
    * `create(overwrite = false)` is a true conditional create (HDFS,
    * ABFS; plus any single-JVM use — the per-table commit lock
    * serializes same-process writers before this runs). Do NOT use
    * across processes on S3A or RawLocalFileSystem; plug a
    * conditional-write store instead.
    */
  object AtomicCreate extends CommitStore {
    override def putIfAbsent(fs: FileSystem, path: Path,
                             payload: Array[Byte]): Boolean = {
      val created =
        try Some(fs.create(path, false)) // overwrite = false: the CAS
        catch {
          case e: java.io.IOException =>
            if (fs.exists(path)) None // lost the claim
            else throw e // a real I/O error, not a race
        }
      created match {
        case None => false
        case Some(out) =>
          // the claim is OURS once the create succeeds; a content-write
          // failure is repaired in place (never misread as a lost race,
          // which would re-commit the delta on top of our own version)
          try { try out.write(payload) finally out.close() }
          catch {
            case e: java.io.IOException =>
              try {
                val o2 = fs.create(path, true)
                try o2.write(payload) finally o2.close()
              } catch {
                case e2: java.io.IOException =>
                  e2.addSuppressed(e)
                  throw new java.io.IOException(
                    s"commit marker $path was created but its content " +
                      "could not be written; delete the marker to roll " +
                      "back", e2)
              }
          }
          true
      }
    }
  }

  /** External-CAS store for filesystems with no atomic create: a
    * strongly-consistent side table arbitrates the claim, the winner
    * then writes the marker with a plain (blind) PUT. The arbiter here
    * is an in-process set — correct for every writer that shares this
    * instance (the single-driver object-store posture); a cross-driver
    * deployment swaps the set for an external conditional-write table
    * and keeps everything else.
    */
  final class InMemoryCas extends CommitStore {
    private val claimed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    override def putIfAbsent(fs: FileSystem, path: Path,
                             payload: Array[Byte]): Boolean = {
      val key = path.toUri.toString
      if (!claimed.add(key)) false // another writer holds the claim
      else if (fs.exists(path)) false // marker predates this arbiter
      else {
        val out = fs.create(path, true) // blind PUT — the CAS already ran
        try out.write(payload) finally out.close()
        true
      }
    }
  }
}
