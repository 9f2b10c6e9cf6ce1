package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.TaskAttemptID
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String
import graft.model.Model

/** Vectorized batch-scan reader for the graft-store connector: wraps
  * Spark's own [[VectorizedParquetRecordReader]] (the engine behind every
  * built-in parquet scan), so batch reads decode column chunks into
  * ColumnVectors page-at-a-time — dictionary-aware, SIMD-friendly, and
  * feeding whole-stage codegen through the columnar-to-row boundary —
  * instead of materializing one InternalRow per record through parquet-mr
  * record assembly (~100x fewer per-row virtual calls on wide scans).
  *
  * Only BATCH scans use this path: their partitions are always whole
  * files, so no per-row seq filtering is needed. Streaming micro-batches
  * carry (lo, hi] cursor bounds and keep the row materializer
  * ([[GraftRowReadSupport]]).
  *
  * The constant `part` column (one value per file) joins the batch as a
  * [[ConstantColumnVector]] at its readSchema ordinal — no per-row work.
  * Pushed ts bounds become a parquet FilterPredicate (row-group/page
  * statistics skipping; Spark re-applies the exact bound as a residual
  * filter, so skipping can only drop data the predicate excludes).
  */
final class GraftColumnarReader(p: GraftInputPartition, baseConf: Configuration,
    columns: Array[String], tsLo: Long, tsHi: Long)
    extends PartitionReader[ColumnarBatch] {

  require(p.loSeq <= -1L && p.hiSeq == Long.MaxValue,
    s"columnar reads are whole-file only, got seq bounds (${p.loSeq}, ${p.hiSeq}]")

  private val BatchSize = 4096
  private val pruned = StructType(columns.filter(_ != "part").map(Model.schema(_)))

  private val reader: VectorizedParquetRecordReader = {
    val conf = new Configuration(baseConf)
    // the key SpecificParquetRecordReaderBase reads the catalyst schema
    // from (ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA — private, but
    // its value is stable public wire format)
    conf.set("org.apache.spark.sql.parquet.row.requested_schema", pruned.json)
    // what ParquetFileFormat sets before handing a split to this reader
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    // the parquet-interpretation SQLConf keys were mirrored from the LIVE
    // session into baseConf at plan time (seedSessionConfs — the schema
    // converter reads them from the hadoop conf with NO defaults, exactly
    // as ParquetFileFormat seeds them before every built-in scan)
    if (tsLo != Long.MinValue || tsHi != Long.MaxValue) {
      val tsCol = FilterApi.longColumn("ts")
      val pred = (tsLo != Long.MinValue, tsHi != Long.MaxValue) match {
        case (true, true) =>
          FilterApi.and(FilterApi.gtEq(tsCol, java.lang.Long.valueOf(tsLo)),
            FilterApi.ltEq(tsCol, java.lang.Long.valueOf(tsHi)))
        case (true, false) => FilterApi.gtEq(tsCol, java.lang.Long.valueOf(tsLo))
        case _ => FilterApi.ltEq(tsCol, java.lang.Long.valueOf(tsHi))
      }
      ParquetInputFormat.setFilterPredicate(conf, pred)
    }
    // rebase modes are the RESOLVED per-file values (not the session's
    // *.RebaseModeInRead, which still needs footer-metadata resolution):
    // store chunks are always written by this engine on Spark >= 3, whose
    // writer metadata resolves to CORRECTED unconditionally
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", /* useOffHeap = */ false,
      BatchSize)
    val path = new Path(p.file)
    val len = path.getFileSystem(conf).getFileStatus(path).getLen
    // the old-API split class: Spark's reader base casts to mapred.FileSplit
    // (which subclasses the mapreduce one)
    r.initialize(
      new org.apache.hadoop.mapred.FileSplit(path, 0, len, Array.empty[String]),
      new TaskAttemptContextImpl(conf, new TaskAttemptID()))
    r.initBatch(new StructType(), InternalRow.empty)
    r.enableReturningBatches()
    r
  }

  private val inner: ColumnarBatch = reader.resultBatch()

  // readSchema-ordered vectors: data columns from the inner batch, `part`
  // as a constant vector
  private val out: ColumnarBatch = {
    val prunedIdx = pruned.fieldNames.zipWithIndex.toMap
    val partVec = new ConstantColumnVector(BatchSize, StringType)
    partVec.setUtf8String(UTF8String.fromString(p.part))
    val vectors: Array[ColumnVector] = columns.map {
      case "part" => partVec: ColumnVector
      case c => inner.column(prunedIdx(c))
    }
    new ColumnarBatch(vectors)
  }

  override def next(): Boolean = reader.nextKeyValue()

  override def get(): ColumnarBatch = {
    out.setNumRows(inner.numRows())
    out
  }

  override def close(): Unit = reader.close()
}

object GraftColumnarReader {
  /** Mirror the session's parquet-interpretation SQLConf values into a
    * hadoop conf at PLAN time — the live session is not reachable from
    * executor-side readers, and pinning these to constants would silently
    * diverge from session behavior on conf changes or Spark upgrades.
    * Same key set ParquetFileFormat seeds before every built-in scan. */
  def seedSessionConfs(base: Configuration,
      spark: org.apache.spark.sql.SparkSession): Configuration = {
    val conf = new Configuration(base)
    val sql = spark.sessionState.conf
    conf.setBoolean("spark.sql.parquet.binaryAsString", sql.isParquetBinaryAsString)
    conf.setBoolean("spark.sql.parquet.int96AsTimestamp", sql.isParquetINT96AsTimestamp)
    conf.setBoolean("spark.sql.caseSensitive", sql.caseSensitiveAnalysis)
    conf.setBoolean("spark.sql.parquet.inferTimestampNTZ.enabled",
      sql.parquetInferTimestampNTZEnabled)
    conf.setBoolean("spark.sql.legacy.parquet.nanosAsLong",
      sql.legacyParquetNanosAsLong)
    conf.setBoolean("spark.sql.parquet.fieldId.read.enabled",
      sql.parquetFieldIdReadEnabled)
    conf.setBoolean("spark.sql.parquet.fieldId.read.ignoreMissing",
      sql.ignoreMissingParquetFieldId)
    conf
  }
}
