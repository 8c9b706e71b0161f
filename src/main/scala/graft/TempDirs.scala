package graft

import java.nio.file.{Files, LinkOption, Path, Paths}

/** Temp-directory lifecycle for the library's streaming staging dirs.
  *
  * The file-stream sources stage symlinks + sentinel files under
  * `graft-stream-*` temp dirs, cached for the life of the JVM (re-creating
  * them per query would leak a dir per invocation — see
  * StreamingQueries.stagedDir). Two mechanisms keep the disk clean:
  *
  *   - a shutdown hook deletes every dir THIS JVM created (normal exits);
  *   - a one-time mark-and-sweep at first use removes `graft-stream-*`
  *     orphans left by CRASHED runs — anything older than an hour cannot
  *     belong to a live Verify/Bench cycle (staging dirs are only ever read
  *     by the JVM that created them, within seconds of creation).
  *
  * The sweep deliberately matches only the `graft-stream` / `graft-staged`
  * prefixes (file-stream staging and batch staged artifacts respectively —
  * truthful names, so a reader never infers a streaming dependency from a
  * batch index stage): test fixtures also use `graft-*` temp names, and a
  * long-lived interactive sbt session's warehouse dir must never be swept
  * out from under it.
  */
object TempDirs {

  private val SweepPrefixes = Seq("graft-stream", "graft-staged")
  private val OrphanAgeSeconds = 3600L

  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private lazy val init: Unit = {
    try sweepOrphans() catch { case _: Exception => () }
    sys.addShutdownHook {
      created.forEach(p => try deleteRecursively(p) catch { case _: Exception => () })
    }
    ()
  }

  /** Create a tracked temp dir; deleted on JVM exit. `prefix` must start
    * with one of [[SweepPrefixes]] so crashed-run leftovers are sweepable
    * too. */
  def create(prefix: String): Path = {
    require(SweepPrefixes.exists(prefix.startsWith),
      s"prefix $prefix not sweepable")
    init
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  /** Refresh a dir's mtime — long-lived JVMs touch their cached staging
    * dirs on every use so a SIBLING JVM's orphan sweep (which spares
    * anything younger than [[OrphanAgeSeconds]]) never classifies an
    * actively-used dir as stale. */
  def touch(p: Path): Unit =
    try Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.from(java.time.Instant.now()))
    catch { case _: Exception => () }

  /** Recursive delete (symlinks removed, never followed); shared by the
    * bench harnesses for prompt cleanup of multi-GB fixtures — the shutdown
    * hook and sweep remain the backstop. */
  def delete(p: Path): Unit = deleteRecursively(p)

  private[graft] def sweepOrphans(): Unit = {
    val cutoff = java.time.Instant.now().minusSeconds(OrphanAgeSeconds)
    val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
    val s = Files.list(tmp)
    try s.iterator().forEachRemaining { p =>
      val stale = SweepPrefixes.exists(p.getFileName.toString.startsWith) &&
        Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS) &&
        !created.contains(p) &&
        Files.getLastModifiedTime(p).toInstant.isBefore(cutoff)
      if (stale) try deleteRecursively(p) catch { case _: Exception => () }
    } finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
