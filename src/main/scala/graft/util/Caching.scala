package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped lifecycle for the caches graft operators create internally (LSH band scans,
  * shingle explodes, normalized-vector scans). Operators persist through
  * [[Caching.persist]] instead of bare `DataFrame.persist()`; callers bracket
  * materialization with [[Caching.withCached]]:
  *
  * {{{
  * val result = Caching.withCached {
  *   Dedup.minhashLshPairs(docs, "doc_id", "text", 0.8).collect()
  * }
  * }}}
  *
  * Every cache an operator registered inside the bracket is unpersisted on exit
  * (including on exception) — exactly the operator's caches, not the whole session
  * (`clearCache()` evicts unrelated user caches too). The value must be MATERIALIZED
  * inside the bracket (collect/count/write): a lazy plan returned out of the bracket
  * would recompute its unpersisted intermediates from scratch.
  *
  * Scopes nest (inner brackets release only their own registrations) and are
  * per-thread — concurrent driver threads each see their own stack. Persists that
  * happen OUTSIDE any bracket land in a session-global registry released by
  * [[Caching.releaseAll]], so interactive use never leaks unboundedly either.
  */
object Caching {

  private val scopes = new ThreadLocal[ArrayBuffer[ArrayBuffer[DataFrame]]] {
    override def initialValue(): ArrayBuffer[ArrayBuffer[DataFrame]] = ArrayBuffer.empty
  }

  private val unscoped = ArrayBuffer.empty[DataFrame]

  /** Persist `df` and register it with the innermost active [[withCached]] scope on
    * this thread (or the global registry when no scope is active).
    */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val persisted = df.persist(level)
    val stack = scopes.get()
    if (stack.nonEmpty) stack.last += persisted
    else unscoped.synchronized { unscoped += persisted }
    persisted
  }

  /** Run `body`; unpersist every cache registered (via [[persist]]) during it. */
  def withCached[A](body: => A): A = {
    val stack = scopes.get()
    val frame = ArrayBuffer.empty[DataFrame]
    stack += frame
    try body
    finally {
      stack.remove(stack.length - 1)
      release(frame)
    }
  }

  /** Unpersist every cache registered outside any [[withCached]] bracket. */
  def releaseAll(): Unit = unscoped.synchronized {
    release(unscoped)
    unscoped.clear()
  }

  private def release(frames: ArrayBuffer[DataFrame]): Unit =
    frames.foreach { df =>
      // release must never mask the body's result/exception (e.g. a stopped session)
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }

  /** `df.scopedPersist()` sugar for operator internals (import Caching.CacheSyntax). */
  implicit class CacheSyntax(private val df: DataFrame) extends AnyVal {
    def scopedPersist(): DataFrame = Caching.persist(df)
    def scopedPersist(level: StorageLevel): DataFrame = Caching.persist(df, level)
  }
}
