package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Per-message payload compression (SURVEY §2.7; reference
  * pkg/compression/compress.go — codecs none/snappy/lz4 — wired by
  * `large-message-handle-compression`, pkg/config/large_message.go:33).
  *
  * Spark ships the same codec natives for shuffle/parquet
  * (snappy-java, lz4-java, zstd-jni), so message-level compression
  * reuses them — no new dependencies. zstd is supported beyond the
  * reference's list because the storage sinks already speak it.
  * LZ4 uses the FRAME format (self-describing, like the reference's
  * pierrec/lz4 reader); snappy the raw block format (klauspost
  * snappy); zstd frames carry their content size.
  *
  * Codec work is opaque byte shuffling with no codegen value, so the
  * columnar forms are plain UDFs over binary columns.
  */
object Compression {

  val None = "none"
  val Snappy = "snappy"
  val Lz4 = "lz4"
  val Zstd = "zstd"

  def supported(cc: String): Boolean =
    cc == None || cc == Snappy || cc == Lz4 || cc == Zstd

  /** Compress one payload under the named codec
    * (compress.go `Encode`). */
  def encode(cc: String, data: Array[Byte]): Array[Byte] = cc match {
    case None => data
    case Snappy => org.xerial.snappy.Snappy.compress(data)
    case Lz4 =>
      val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      try out.write(data) finally out.close()
      bos.toByteArray
    case Zstd => com.github.luben.zstd.Zstd.compress(data)
    case other => sys.error(s"unsupported compression codec: $other")
  }

  /** Decompress one payload (compress.go `Decode`). */
  def decode(cc: String, data: Array[Byte]): Array[Byte] = cc match {
    case None => data
    case Snappy => org.xerial.snappy.Snappy.uncompress(data)
    case Lz4 =>
      val in = new net.jpountz.lz4.LZ4FrameInputStream(
        new java.io.ByteArrayInputStream(data))
      try in.readAllBytes() finally in.close()
    case Zstd =>
      val size = com.github.luben.zstd.Zstd.getFrameContentSize(data)
      require(size >= 0 && size <= Int.MaxValue, s"bad zstd frame size $size")
      com.github.luben.zstd.Zstd.decompress(data, size.toInt)
    case other => sys.error(s"unsupported compression codec: $other")
  }

  /** Columnar compress of a binary column. */
  def compressCol(cc: String)(c: Column): Column = {
    require(supported(cc), s"unsupported compression codec: $cc")
    if (cc == None) c
    else udf((b: Array[Byte]) => if (b == null) null else encode(cc, b)).apply(c)
  }

  /** Columnar decompress of a binary column. */
  def decompressCol(cc: String)(c: Column): Column = {
    require(supported(cc), s"unsupported compression codec: $cc")
    if (cc == None) c
    else udf((b: Array[Byte]) => if (b == null) null else decode(cc, b)).apply(c)
  }
}
