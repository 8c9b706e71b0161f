package graft.queries

/** JVM-lifetime staging dirs for catalog queries that must run against real
  * FILES: the streaming entries stage symlinks + sentinels for the file
  * stream source, and `mm_ingest` stages raster payloads for the binaryFile
  * source. Built ONCE per (kind, corpus dir) and reused for the life of the
  * JVM — Bench runs every query 3× and Verify re-runs per scale factor, so
  * an uncached createTempDirectory would leak a directory (and pay the
  * staging Spark job) on every invocation. Lifecycle beyond the JVM:
  * [[graft.TempDirs]] deletes these on shutdown and sweeps crashed-run
  * orphans at first use.
  *
  * `kind` must start with "stream" (file-stream source staging) or
  * "staged" (batch staged artifacts — manifests, index postings, code
  * tables) — [[graft.TempDirs]] sweeps exactly the `graft-stream*` /
  * `graft-staged*` temp-name namespaces (its crash-orphan backstop), so
  * every staged dir is created inside one of them, and a batch artifact
  * never wears a misleading stream- name.
  */
object Staging {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** Staging-cache key for dirs derived from one corpus table: the corpus
    * dir PLUS the source file's (mtime, size), so a regenerated corpus in
    * a long-lived JVM rebuilds the stage instead of serving yesterday's
    * materialized copy — a staged COPY must carry its provenance in the
    * cache key (superseded stages age out via the TempDirs orphan
    * sweep). */
  def provenanceKey(dir: String, table: String): String = {
    val p = java.nio.file.Paths.get(s"$dir/$table.parquet")
    // the TABLE NAME is part of the key: two tables staged under one kind
    // with coincidentally equal (mtime, size) must never collide
    s"$dir:$table:${java.nio.file.Files.getLastModifiedTime(p).toMillis}:${java.nio.file.Files.size(p)}"
  }

  /** Get-or-build the staged dir for (kind, key). Self-healing compute (not
    * computeIfAbsent): if a sibling JVM's orphan sweep deleted a cached dir
    * (possible only after this JVM sat idle past the sweep age), rebuild
    * instead of handing out a dangling path; on every live hit the dir is
    * touched so an ACTIVE session's staging can never age into sweep
    * eligibility. */
  def dir(kind: String, key: String)(
      build: java.nio.file.Path => Unit): java.nio.file.Path = {
    // enforce the sweep-namespace invariant documented above: a dir outside
    // graft-stream*/graft-staged* would be invisible to the crash-orphan
    // sweep and leak across crashed JVMs forever
    require(kind.startsWith("stream") || kind.startsWith("staged"),
      s"Staging kind '$kind' must start with \"stream\" or \"staged\" so " +
        "TempDirs' orphan sweep covers the staged dir")
    cache.compute(s"$kind:$key", (_, existing) => {
      if (existing != null && java.nio.file.Files.isDirectory(existing)) {
        graft.TempDirs.touch(existing)
        existing
      } else {
        val p = graft.TempDirs.create(s"graft-$kind")
        build(p)
        p
      }
    })
  }
}
