package graft.sources

/** JVM-lifetime scratch directories for queries that must build a fresh
  * on-disk structure per invocation (the incremental-index anchor queries:
  * incremental maintenance IS the measured semantics, so they cannot reuse
  * a fingerprinted store). Every directory handed out here is deleted
  * recursively by one shared shutdown hook, so repeated bench/verify runs
  * in one JVM leave /tmp exactly as they found it instead of leaking an
  * index copy per run.
  */
object Scratch {
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var p = roots.poll()
      while (p != null) { deleteRecursively(p); p = roots.poll() }
    }, "graft-scratch-cleanup"))

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.delete(f) catch { case _: Exception => () })
      } finally walk.close()
    }
  }

  /** A fresh temp directory, registered for deletion at JVM exit. */
  def tempDir(prefix: String): String = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(p)
    p.toString
  }
}
