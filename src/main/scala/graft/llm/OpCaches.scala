package graft.llm

import org.apache.spark.sql.DataFrame

/** Bounds operator cache growth: each operator registers the subplans it
  * persisted under a stable key, and the previous invocation's entries for
  * that key are unpersisted. The returned DataFrames are lazy, so the
  * CURRENT call's caches must outlive the call — but the previous call's
  * are dead weight that would otherwise pin executor storage for the
  * application lifetime. */
private[graft] object OpCaches {
  private val held = scala.collection.concurrent.TrieMap.empty[String, Seq[DataFrame]]

  def track(key: String, dfs: Seq[DataFrame]): Unit =
    held.put(key, dfs).foreach(_.foreach { df =>
      try df.unpersist(false) catch { case _: Throwable => () }
    })
}
