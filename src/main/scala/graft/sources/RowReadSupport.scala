package graft.sources

import org.apache.parquet.hadoop.api.{InitContext, ReadSupport}
import org.apache.parquet.hadoop.api.ReadSupport.ReadContext
import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordMaterializer}
import org.apache.parquet.schema.{GroupType, MessageType, Type}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** parquet-mr ReadSupport materializing graft LogEvent rows STRAIGHT to
  * Spark [[InternalRow]] — no intermediate `Group` assembly, no per-field
  * boxing/lookup by name, and dictionary-encoded string columns decode
  * each dictionary entry to a [[UTF8String]] once per page instead of
  * once per row (msg/fields values repeat heavily in log data, so this is
  * the hot path of the public connector's scan).
  *
  * The projection is decided in [[init]] from the file's OWN schema
  * (field presence and repetition levels vary per file with the
  * nullability of the ingested DataFrame), which also removes the extra
  * footer open the previous Group-based reader needed before building
  * its reader.
  *
  * Filter-only columns (`seq` for cursor ranges, `ts` for pushed time
  * bounds) are materialized into side channels ([[lastSeq]]/[[lastTs]]),
  * not row slots, so the emitted row always matches the DSv2 readSchema
  * exactly.
  */
final class GraftRowReadSupport(outCols: Array[String], part: String,
    needSeq: Boolean, needTs: Boolean) extends ReadSupport[InternalRow] {

  /** Side channels for the reader's record-level filters; valid for the
    * most recently materialized record. */
  @volatile var lastSeq: Long = -1L
  @volatile var lastTs: Long = Long.MinValue

  private val partUtf8 = UTF8String.fromString(part)

  private def wanted(name: String): Boolean =
    (outCols.contains(name) && name != "part") ||
      (name == "seq" && needSeq) || (name == "ts" && needTs)

  override def init(ctx: InitContext): ReadContext = {
    val fileSchema = ctx.getFileSchema
    val keep = new java.util.ArrayList[Type]()
    fileSchema.getFields.forEach(f => if (wanted(f.getName)) keep.add(f))
    new ReadContext(new MessageType(fileSchema.getName, keep))
  }

  override def prepareForRead(conf: org.apache.hadoop.conf.Configuration,
      keyValueMetaData: java.util.Map[String, String], fileSchema: MessageType,
      readContext: ReadContext): RecordMaterializer[InternalRow] =
    new RowMaterializer(readContext.getRequestedSchema)

  private final class RowMaterializer(requested: MessageType)
      extends RecordMaterializer[InternalRow] {

    private val nFields = outCols.length
    private val slotOf: Map[String, Int] = outCols.zipWithIndex.toMap
    private var values: Array[Any] = new Array[Any](nFields)

    // a LONG column writing into an optional row slot and/or side channel
    private final class LongConv(slot: Int, isSeq: Boolean, isTs: Boolean)
        extends PrimitiveConverter {
      override def addLong(v: Long): Unit = {
        if (slot >= 0) values(slot) = v
        if (isSeq) lastSeq = v
        if (isTs) lastTs = v
      }
    }

    // a STRING column with per-page dictionary decode
    private final class StrConv(set: UTF8String => Unit)
        extends PrimitiveConverter {
      private var dict: Array[UTF8String] = _
      override def hasDictionarySupport: Boolean = true
      override def setDictionary(d: org.apache.parquet.column.Dictionary): Unit = {
        dict = new Array[UTF8String](d.getMaxId + 1)
        var i = 0
        while (i < dict.length) {
          dict(i) = UTF8String.fromBytes(d.decodeToBinary(i).getBytes)
          i += 1
        }
      }
      override def addValueFromDictionary(id: Int): Unit = set(dict(id))
      override def addBinary(b: Binary): Unit =
        set(UTF8String.fromBytes(b.getBytes))
    }

    // map<string,string> assembled as parquet's key_value repeated group
    private final class MapConv(slot: Int, mapType: GroupType)
        extends GroupConverter {
      private val keys = new scala.collection.mutable.ArrayBuffer[Any](8)
      private val vals = new scala.collection.mutable.ArrayBuffer[Any](8)
      private var curKey: UTF8String = _
      private var curVal: UTF8String = _
      private val kvConv: GroupConverter = new GroupConverter {
        private val kConv = new StrConv(s => curKey = s)
        private val vConv = new StrConv(s => curVal = s)
        override def getConverter(i: Int): Converter = if (i == 0) kConv else vConv
        override def start(): Unit = { curKey = null; curVal = null }
        override def end(): Unit = { keys += curKey; vals += curVal }
      }
      override def getConverter(i: Int): Converter = kvConv
      override def start(): Unit = { keys.clear(); vals.clear() }
      override def end(): Unit =
        values(slot) = new ArrayBasedMapData(
          new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray))
    }

    private val root: GroupConverter = new GroupConverter {
      private val converters: Array[Converter] = {
        val out = new Array[Converter](requested.getFieldCount)
        var i = 0
        while (i < requested.getFieldCount) {
          val f = requested.getType(i)
          val slot = slotOf.getOrElse(f.getName, -1)
          out(i) = f.getName match {
            case "ts" => new LongConv(slot, isSeq = false, isTs = needTs)
            case "seq" => new LongConv(slot, isSeq = needSeq, isTs = false)
            case "msg" => new StrConv(s => values(slot) = s)
            case "fields" => new MapConv(slot, f.asGroupType())
            case other => throw new IllegalArgumentException(
              s"graft-store: unexpected parquet field $other")
          }
          i += 1
        }
        out
      }
      override def getConverter(i: Int): Converter = converters(i)
      override def start(): Unit = {
        values = new Array[Any](nFields)
        slotOf.get("part").foreach(s => values(s) = partUtf8)
      }
      override def end(): Unit = ()
    }

    override def getCurrentRecord: InternalRow = new GenericInternalRow(values)
    override def getRootConverter: GroupConverter = root
  }
}
