package graft.store

import graft.engine.Engine
import graft.model.Model
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A dedicated small store exercising the PIPE lifecycle end-to-end for the
  * `lql_pipe` correctness entry (kept separate from [[EventStore]] so the
  * pipe's destination partition doesn't disturb SHOW PARTITIONS oracles).
  *
  * Build sequence — deliberately TWO ingest batches per partition with the
  * pipe created in between, so it verifies both the streaming source's
  * incremental file discovery and the (part, seq) high-water mark across
  * appends:
  *   1. ingest half the error events through [[Store.write]] (no seq given
  *      — the store generates it);
  *   2. `CREATE PIPE p1 FROM {name=error} WHERE msg CONTAINS 'k=1'` and
  *      drain the stream;
  *   3. ingest the second half, drain again, stop.
  * The entry then reads `{logrange.pipe=p1}` back through a normal SELECT.
  */
object PipeStore {

  val Version = "v4" // round 6: catalog-driven PipeWorker build path

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Engine]

  def engine(spark: SparkSession, sfDir: String): Engine = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    // same regeneration-proof cache key (and root-keyed in-JVM memo) as
    // EventStore — see EventStore.dataFingerprint
    val root = s"/tmp/graft/pipestore-$Version-${EventStore.dataFingerprint(sfDir)}-$name"
    cache.getOrElseUpdate(root, {
      EventStore.dropStaleSiblings(root, s"pipestore-$Version-", name)
      val store = new Store(spark, root)
      val eng = new Engine(store)
      val marker = new java.io.File(s"$root/_BUILT")
      if (!marker.exists()) {
        val dir = new java.io.File(root)
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
        build(spark, sfDir, eng)
        marker.getParentFile.mkdirs()
        marker.createNewFile()
      }
      eng
    })
  }

  private def build(spark: SparkSession, sfDir: String, eng: Engine): Unit = {
    val rows = EventStore.mappedRows(spark, sfDir)
      .where(col("part").endsWith("name=error"))
      .cache()

    def ingest(half: Int): Unit =
      (0 to 3).foreach { h =>
        val tags = Map("host" -> s"host$h", "name" -> "error")
        val line = Model.tagLine(tags)
        val ev = rows
          .where(col("part") === line && pmod(col("seq"), lit(2)) === half)
          .select(col("ts"), col("msg"), col("fields"))
        eng.store.write(tags, Map.empty, ev)
      }

    ingest(0)
    eng.execute("CREATE PIPE p1 FROM {name=error} WHERE msg CONTAINS 'k=1'")
    eng.pipes.processAllAvailable()
    ingest(1)
    eng.pipes.processAllAvailable()
    eng.pipes.stopAll()
    rows.unpersist()
  }
}
