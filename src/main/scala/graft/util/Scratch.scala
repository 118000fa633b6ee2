package graft.util

import java.io.File

/** Per-run scratch directories for query fixtures: paths carry a per-JVM token so
  * concurrent harness runs never clobber each other, and every registered directory
  * is recursively deleted at JVM exit so repeated runs don't accumulate corpus-sized
  * copies under the temp root. Each JVM deletes only its OWN token's directories —
  * concurrent runs are untouched.
  */
object Scratch {

  /** Per-JVM run token for scratch paths (concurrent harness runs never collide). */
  val runToken: String = java.util.UUID.randomUUID().toString.take(8)

  private val registered = scala.collection.mutable.Set.empty[String]

  /** Register `path` for recursive deletion at JVM exit; returns it for chaining. */
  def deleteOnExit(path: String): String = synchronized {
    if (registered.add(path)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(new File(path))))
    }
    path
  }

  private def delete(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(delete)
    f.delete()
    ()
  }
}
