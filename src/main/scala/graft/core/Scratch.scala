package graft.core

/** Session-scoped scratch space. Every temp dir the engine, Verify,
  * Bench, or the specs create hangs off ONE per-JVM root that a
  * shutdown hook removes, so repeated runs leave no net /tmp growth
  * (pre-r7 each invocation accreted its own `/tmp/graft_*` dir — dozens
  * per `sbt test`). Operators that can clean eagerly (the streaming
  * sources/checkpoints) still do via [[remove]]; the hook is the
  * backstop for everything else.
  */
object Scratch {

  /** The per-JVM root, created lazily under `java.io.tmpdir`. */
  lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft_session_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => remove(r)))
    r
  }

  /** Fresh unique directory under the session root. */
  def dir(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, tag)

  /** Recursive delete; missing paths are a no-op. */
  def remove(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
