package graft.engine

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Harness-managed scratch directories for queries with filesystem side
  * effects (the persisted-index operators write parquet as part of the
  * computation under test).
  *
  * Paths are keyed by (application id, purpose), NOT freshly random per
  * invocation: a bench/verify rep re-running the same query overwrites its
  * own index instead of accumulating one full copy per rep under /tmp. The
  * whole per-app root is deleted by a JVM shutdown hook, so nothing
  * outlives the run. */
object Scratch {
  private val hooked = scala.collection.mutable.Set.empty[Path]

  /** `<java.io.tmpdir>/graft-scratch-<appId>/<purpose>` — created, stable
    * within the app, deleted (whole root, recursively) at JVM exit. */
  def dir(s: SparkSession, purpose: String): String = {
    val root = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-scratch-${s.sparkContext.applicationId}")
    synchronized {
      if (hooked.add(root))
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(root)))
    }
    val d = root.resolve(purpose)
    Files.createDirectories(d)
    d.toString
  }

  private def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      // close the listing stream BEFORE deleting the directory: an open
      // handle leaks an fd per level and can fail the parent delete on
      // non-POSIX filesystems
      val children = {
        val st = Files.list(p)
        try st.toArray(new Array[Path](_)) finally st.close()
      }
      children.foreach(deleteRec)
    }
    Files.deleteIfExists(p)
  }
}
