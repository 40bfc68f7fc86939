package org.apache.spark.sql.graftbridge

import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Bridge into Spark's parquet OUTPUT path (`private[sql]`/
  * `private[spark]` surface): the graft snapshot DSv2 writer delegates
  * the actual parquet encoding to [[ParquetOutputWriter]] — the same
  * writer `df.write.parquet` uses — configured exactly the way
  * FileFormatWriter would (session SQL entries copied into the hadoop
  * conf, the catalyst schema registered with [[ParquetWriteSupport]]).
  * The connector owns file placement and per-file statistics; Spark's
  * writer owns the bytes.
  */
object ParquetWriteDelegate {

  /** Driver-side: the serializable hadoop conf a writer task needs —
    * session SQL entries (timestamp mode, legacy format flags) plus the
    * write-support class and schema.
    */
  def writeConf(spark: SparkSession, schema: StructType)
      : SerializableConfiguration = {
    val conf = spark.sessionState.newHadoopConf()
    val sqlConf = spark.sessionState.conf
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set("parquet.write.support.class",
      classOf[ParquetWriteSupport].getName)
    conf.set("parquet.compression", sqlConf.parquetCompressionCodec)
    // ParquetWriteSupport.init ASSERTS these two are present (the same
    // prep ParquetFileFormat.prepareWrite does before any task runs)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(org.apache.spark.sql.internal.SQLConf
      .PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    // ...and the schema-converter's boolean knobs, which it reads with
    // String.valueOf fallbacks that don't parse as booleans when unset
    Seq(org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      org.apache.spark.sql.internal.SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED,
      org.apache.spark.sql.internal.SQLConf.LEGACY_PARQUET_NANOS_AS_LONG,
      org.apache.spark.sql.internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => conf.set(e.key, sqlConf.getConf(e).toString))
    new SerializableConfiguration(conf)
  }

  /** Executor-side: an open parquet writer at `path`. */
  def openWriter(conf: SerializableConfiguration, path: String,
                 partitionId: Int, taskId: Long): ParquetRowWriter = {
    val c = new org.apache.hadoop.conf.Configuration(conf.value)
    val attempt = new TaskAttemptID(
      new TaskID(new org.apache.hadoop.mapreduce.JobID("graft", 0),
        TaskType.MAP, partitionId), taskId.toInt)
    new ParquetRowWriter(
      new ParquetOutputWriter(path, new TaskAttemptContextImpl(c, attempt)))
  }

  /** Thin public wrapper (ParquetOutputWriter is private[sql]). */
  final class ParquetRowWriter private[graftbridge] (
      w: ParquetOutputWriter) {
    def write(row: InternalRow): Unit = w.write(row)
    def close(): Unit = w.close()
  }
}
