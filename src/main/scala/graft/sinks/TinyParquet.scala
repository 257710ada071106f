package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser

/** Driver-side writer for CONTROL-PLANE-sized MQ frames (resolved-ts
  * watermarks, bootstrap handshakes: one short row per routing
  * partition). Writing these through a Spark job costs a full
  * plan + task launch + commit round trip per micro-batch — measured
  * 115-190 ms each on local[32], pure fixed cost for ≤dozens of rows.
  * A direct ParquetWriter appends the same rows in single-digit ms
  * through the same Hadoop FS layer (so any Spark-readable sink URI
  * works), preserving the rows-first/control-second visibility order:
  * the caller writes it strictly after the row job commits.
  *
  * Schema matches the Spark-written control frames field-for-field
  * (optional int64/int64/binary-UTF8/binary-UTF8), so readers see one
  * consistent shape per file either way. */
object TinyParquet {

  private val schema = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional int64 _partition;
      |  optional int64 _commit_ts;
      |  optional binary _kind (UTF8);
      |  optional binary _value (UTF8);
      |}""".stripMargin)

  /** Append one control-frame file of (_partition, _commit_ts, _kind,
    * _value) rows under `dir`. Returns false when the direct write is
    * not possible (caller falls back to the Spark-job write). */
  def writeControlFrames(hadoopConf: Configuration, dir: String,
                         rows: Seq[(Long, Long, String, String)]): Boolean =
    try {
      val conf = new Configuration(hadoopConf)
      GroupWriteSupport.setSchema(schema, conf)
      val file = new Path(dir,
        s"part-ctrl-${java.util.UUID.randomUUID()}.snappy.parquet")
      val writer = ExampleParquetWriter.builder(
          org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(file, conf))
        .withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
      try {
        val f = new SimpleGroupFactory(schema)
        rows.foreach { case (p, ts, kind, value) =>
          val g = f.newGroup()
          g.add("_partition", p)
          g.add("_commit_ts", ts)
          g.add("_kind", kind)
          g.add("_value", value)
          writer.write(g)
        }
      } finally writer.close()
      true
    } catch { case _: Throwable => false }
}
