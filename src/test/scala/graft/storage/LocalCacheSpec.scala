package graft.storage

import org.scalatest.funsuite.AnyFunSuite

/** The process-scoped materialization cache: stable keyed paths, age
  * sweep (orphan-GC discipline on the cache root), and root placement
  * under the system temp dir with the pid in the name (so a crashed
  * process's root is identifiable and a different pid never collides). */
class LocalCacheSpec extends AnyFunSuite {

  test("same key resolves to the same directory; different keys differ") {
    val a1 = LocalCache.dir("spec|alpha")
    val a2 = LocalCache.dir("spec|alpha")
    val b = LocalCache.dir("spec|beta")
    assert(a1 == a2)
    assert(a1 != b)
    assert(new java.io.File(a1).isDirectory)
    assert(a1.contains(s"graft_cache_${ProcessHandle.current().pid()}"))
  }

  test("sweep expires aged entries (recursively) and keeps fresh ones") {
    val oldDir = new java.io.File(LocalCache.dir("spec|sweep-old"))
    val freshDir = new java.io.File(LocalCache.dir("spec|sweep-fresh"))
    // give the old entry nested content, then age it
    val nested = new java.io.File(oldDir, "part-0000/inner.bin")
    nested.getParentFile.mkdirs()
    java.nio.file.Files.write(nested.toPath, Array[Byte](1, 2, 3))
    assert(oldDir.setLastModified(System.currentTimeMillis() - 86400000L))
    val expired = LocalCache.sweep(maxAgeMs = 3600000L)
    assert(expired >= 1)
    assert(!oldDir.exists, "aged entry must be deleted recursively")
    assert(freshDir.exists, "fresh entry must survive the sweep")
    // a swept key is re-creatable (callers overwrite-write)
    assert(new java.io.File(LocalCache.dir("spec|sweep-old")).isDirectory)
  }

  test("dataVersion excludes named directories: side-channel writes do not bump it") {
    val base = java.nio.file.Files.createTempDirectory("graft-dv").toFile
    def write(rel: String, bytes: Int): Unit = {
      val f = new java.io.File(base, rel)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](bytes)(7))
    }
    write("acme/prod/logs/part-0.parquet", 16)
    val excl = Set("_system", "attribute_stats")
    val v0 = LocalCache.dataVersion(base.toString, excl)
    // writes under EXCLUDED dirs (self-monitoring, demand stats) are
    // invisible to the fingerprint — the serving shell's own flushes
    // must not invalidate its result cache (ADVICE r8 #3)
    write("_system/_monitoring/logs/part-0.parquet", 64)
    write("acme/prod/attribute_stats/part-0.parquet", 32)
    assert(LocalCache.dataVersion(base.toString, excl) == v0,
      "excluded-dir writes must not change the fingerprint")
    // …but the UNSCOPED fingerprint does see them,
    assert(LocalCache.dataVersion(base.toString) != v0)
    // and a write to a served signal table bumps the scoped one
    write("acme/prod/logs/part-1.parquet", 16)
    assert(LocalCache.dataVersion(base.toString, excl) != v0)
  }
}
