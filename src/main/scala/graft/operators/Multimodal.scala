package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): [[FakeDecoder]] derives deterministic "dimensions"
  * from the byte stream. Everything around it — schema, batch
  * iteration shape, partition sizing, null handling — is the real
  * production plumbing a decoder plugs into.
  */
object Multimodal {

  /** Output schema of the decode stage. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("magic", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec. A real implementation replaces only this object. */
  object FakeDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = {
      val n = bytes.length
      (n % 640, (n * 7) % 480, n / 1000 + 1)
    }
  }

  /** Attach a binary payload column (here derived from text — stands
    * in for reading real media blobs from object storage). */
  def withBlob(docs: DataFrame): DataFrame =
    docs.withColumn("blob", encode(col("text"), "UTF-8"))

  /** Batch decode via mapPartitions: one decoder instance per
    * partition (the expensive init a real codec needs), iterator-in /
    * iterator-out so Spark's spill and fetch pipelining apply. This is
    * the genuine per-partition-imperative case (SURVEY §7 preference
    * (d)) — the decode itself cannot be a Column expression. */
  def decodeBatch(spark: SparkSession, docsWithBlob: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaMetaSchema)
    docsWithBlob.select(col("doc_id"), col("blob"))
      .mapPartitions { it =>
        // per-partition decoder init would go here
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val magic = bytes.take(4).map(b => f"$b%02X").mkString
          val (w, h, f) = FakeDecoder.decode(bytes)
          Row(id, bytes.length, magic, w, h, f)
        }
      }(enc)
  }

  /** Frame sampling plan (expression-only): evenly-spaced frame
    * indices over the fake-decoded frame count, ≤4 samples per doc —
    * the index plan a video pipeline hands to the decoder. */
  def frameSamplePlan(meta: DataFrame, maxSamples: Int = 4): DataFrame = {
    val step = greatest(lit(1L),
      (col("n_frames") - pmod(col("n_frames"), lit(maxSamples.toLong))) / lit(maxSamples.toLong))
      .cast("long")
    meta.select(col("doc_id"), col("n_frames"),
      sequence(lit(0L), col("n_frames") - 1, step).as("frame_indices"),
      // canonical string rendering (engine-portable join for the oracle)
      concat_ws(",", sequence(lit(0L), col("n_frames") - 1, step)).as("frame_plan"))
  }

  /** Resize plan (expression-only): scale fake dims to fit a bounding
    * box preserving aspect via integer arithmetic (floor), the
    * batch-shape computation a real resize kernel consumes. */
  def resizePlan(meta: DataFrame, maxDim: Int = 64): DataFrame =
    meta.select(col("doc_id"), col("width"), col("height"),
      when(col("width") <= maxDim, col("width"))
        .otherwise(lit(maxDim)).cast("long").as("out_width"),
      when(col("width") <= maxDim, col("height"))
        .otherwise((col("height") * maxDim - pmod(col("height") * maxDim, col("width"))) / col("width"))
        .cast("long").as("out_height"))

  /** STUB feature extraction over byte batches (mapPartitions, one
    * "model" per partition): 4 deterministic long-valued features per
    * blob — stands in for an embedding/classifier forward pass. */
  def featureExtractBatch(docsWithBlob: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(LongType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    docsWithBlob.select(col("doc_id"), col("blob"))
      .mapPartitions { it =>
        // per-partition model init would go here
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val feats = Array.tabulate(4) { j =>
            bytes.indices.filter(_ % 4 == j).map(i => bytes(i).toLong & 0xff).sum
          }
          Row(r.getLong(0), feats.toSeq)
        }
      }(enc)
  }

  /** Expression-only metadata path (no decode needed): byte length +
    * magic prefix — engine-portable, used by the oracle-checked query.
    */
  def blobMeta(docsWithBlob: DataFrame): DataFrame =
    docsWithBlob.select(
      col("doc_id"),
      length(col("blob")).cast("long").as("n_bytes"),
      hex(substring(col("blob"), 1, 4)).as("magic"),
      (length(col("blob")) % 640).cast("long").as("width"),
      (length(col("blob")) * 7 % 480).cast("long").as("height"),
      ((length(col("blob")) - pmod(length(col("blob")), lit(1000))) / lit(1000))
        .cast("long").plus(1L).as("n_frames"))
}
