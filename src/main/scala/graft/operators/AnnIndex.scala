package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent ANN index — the build-once / serve-many production
  * shape (the reference trains its vector index once and serves reads
  * from it; here the same split falls out of parquet).
  *
  * Training state is control-plane-sized by definition (IVF coarse
  * centroids: k·dim floats; PQ codebook: ksub·dim floats) and lands
  * in two single-file parquet tables. The coded corpus is the
  * data-plane: one row per vector carrying its cell and PQ codes,
  * written `partitionBy("cell")` so a query probing nprobe cells
  * reads ONLY those directories — storage partition pruning is the
  * inverted-list seek of a native ANN engine, and it holds at any
  * corpus size because parquet partition discovery never scans file
  * contents.
  *
  * Floats round-trip parquet bit-exactly, so a loaded index answers
  * queries identically to the just-trained one (spec-pinned).
  */
object AnnIndex {

  /** Driver-side model state: coarse quantizer + PQ codebook. */
  case class Model(centroids: Array[(Long, Seq[Float])],
                   codebook: Array[(Long, Seq[Float])], m: Int)

  /** Train both quantizers in-engine (bit-reproducible micro-domain
    * k-means — see [[Similarity.kmeansFit]] / [[Similarity.pqTrain]]). */
  def build(emb: DataFrame, k: Int, m: Int, ksub: Int, iters: Int): Model =
    Model(Similarity.kmeansFit(emb, k, iters),
      Similarity.pqTrain(emb, m, ksub, iters), m)

  /** Write model + cell-partitioned coded corpus under `dir`. The
    * coded-corpus write is the only data-scale pass: one inline
    * cell/codes projection over the scan, then the partitioned write
    * (one shuffle-free file set per cell directory). */
  def save(spark: SparkSession, model: Model, emb: DataFrame, dir: String): Unit = {
    import spark.implicits._
    model.centroids.toSeq.toDF("centroid_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    model.codebook.toSeq.toDF("code_id", "embedding")
      .withColumn("m", lit(model.m))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
    val coded = Similarity.pqCodesWide(emb, model.codebook, model.m)
      .withColumn("cell", Similarity.nearestCellExpr(model.centroids,
        Similarity.dot(col("embedding"), col("embedding"))))
    val codeCols = (0 until model.m).map(s => col(s"__c$s"))
    coded
      .select(col("vec_id"), col("cell"), array(codeCols: _*).as("codes"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/coded")
  }

  /** Load the model state back (two control-plane-sized reads). */
  def load(spark: SparkSession, dir: String): Model = {
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val cbRows = spark.read.parquet(s"$dir/codebook").collect()
    val m = cbRows.head.getAs[Int]("m")
    val cb = cbRows.map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    Model(cents, cb, m)
  }

  /** The coded corpus restricted to a probe set of cells — reads only
    * those cell directories (partition pruning; spec asserts the
    * pruned input-file set). The partition column comes back
    * directory-inferred (int) — cast restores the written long. */
  def codedCells(spark: SparkSession, dir: String, cells: Seq[Long]): DataFrame =
    spark.read.parquet(s"$dir/coded")
      .filter(col("cell").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
}
