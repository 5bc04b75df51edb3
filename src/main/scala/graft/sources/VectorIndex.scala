package graft.sources

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index + warm ANN serving path — the
  * vector-retrieval member of the serving triad (geo pyramid, text
  * index, vector index): coarse-quantize the corpus ONCE, persist the
  * vectors cell-clustered with their norms precomputed, and answer
  * top-k queries as literal-pruned scans of the probed cells.
  *
  * Layout: `vectors` carries (vec_id, cell, embedding, nrm) —
  * range-partitioned and sorted by cell, so a request's
  * `cell IN (probed…)` predicate prunes files and row groups via
  * parquet min/max stats (scan fraction ≈ probes/k of the corpus, the
  * IVF contract); `centroids` is the k-row quantizer. A request
  * handler resolves the probed cells first (k-row work against the
  * centroid table — the two-step a production ANN service does) and
  * then issues the pruned vector scan; both steps are prepared here
  * into one cached plan per query.
  *
  * Exactness: norms persist as the identical doubles the batch path
  * computes (floats/doubles round-trip parquet exactly), the scoring
  * chain is the same `round(cosinePre, 6)` — the served ranking shares
  * the batch `q_ivf_search` oracle, proving the index round trip
  * lossless.
  */
object VectorIndex {

  /** Build + persist the index: cell assignments from the first-k
    * coarse quantizer (the deterministic `ivfAssign` contract),
    * vectors cell-clustered with norms, centroids with norms.
    */
  def save(embs: DataFrame, path: String, k: Int, dims: Int,
           idCol: String = "vec_id", embCol: String = "embedding"): String = {
    val assign = Similarity.ivfAssign(embs, k, dims, idCol, embCol)
      .select(col(idCol), col("cell"))
    embs.join(assign, idCol)
      .select(col(idCol).as("vec_id"), col("cell"), col(embCol).as("embedding"),
        Similarity.norm(col(embCol), dims).as("nrm"))
      .repartitionByRange(col("cell"))
      .sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/vectors")
    embs.filter(col(idCol) < k)
      .select(col(idCol).as("cent_id"), col(embCol).as("cent_emb"),
        Similarity.norm(col(embCol), dims).as("cent_nrm"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    path
  }

  /** Fold a new embedding batch INTO the index against the FROZEN
    * persisted quantizer — the online half of the vector-index
    * lifecycle (same LSM-flavored contract as the dedup index): cell
    * assignment is one broadcast of the k persisted centroids + a
    * per-row argmax over the BATCH, and the write is new parquet files
    * sorted within the batch. Ranges overlap across appends, so the
    * probed-cell pruning weakens until [[compact]] restores the
    * range-clustered layout; answers are unchanged either way, and a
    * batch appended against the frozen quantizer lands in exactly the
    * cells a full rebuild would give it (the spec proves
    * append-then-serve ≡ rebuild-then-serve row for row).
    */
  def append(embs: DataFrame, path: String, dims: Int,
             idCol: String = "vec_id", embCol: String = "embedding"): String = {
    val spark = embs.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cent_id"), col("cent_emb"))
    val assign = Similarity.ivfAssignWith(embs, cents, dims, idCol, embCol)
      .select(col(idCol), col("cell"))
    embs.join(assign, idCol)
      .select(col(idCol).as("vec_id"), col("cell"), col(embCol).as("embedding"),
        Similarity.norm(col(embCol), dims).as("nrm"))
      .sortWithinPartitions("cell")
      .write.mode("append").option("compression", "zstd")
      .parquet(s"$path/vectors")
    path
  }

  /** Re-cluster the vector table back into its probe-optimal
    * cell-range layout after a run of appends; staged swap so a
    * compaction never serves partial state.
    */
  def compact(spark: SparkSession, path: String): String = {
    val tmp = path + ".compact"
    spark.read.parquet(s"$path/vectors")
      .repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/vectors")
    spark.read.parquet(s"$path/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/centroids")
    StagedSwap.swap(path, tmp)
    path
  }

  /** Prepare the warm serving plan for one query vector (looked up by
    * id, as the oracle does; a production handler receives the vector
    * in the request). The two driver-side collects — the query row and
    * the probed cell ids — are the request-time k-row work; the
    * returned plan is the literal-pruned scan + top-k, fully lazy.
    */
  def annServe(spark: SparkSession, path: String, queryVecId: Long,
               probes: Int, topK: Int, dims: Int): DataFrame = {
    val vectors = spark.read.parquet(s"$path/vectors")
    val cents = spark.read.parquet(s"$path/centroids")
    val q = vectors.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).collect().head
    val qEmb = q.getSeq[Float](0)
    val qNrm = q.getDouble(1)
    val probed = cents
      .select(col("cent_id").as("cell"),
        round(Similarity.cosinePre(col("cent_emb"), typedlit(qEmb),
          col("cent_nrm"), lit(qNrm), dims), 6).as("qcos"))
      .orderBy(col("qcos").desc, col("cell"))
      .limit(probes)
      .collect().map(_.getAs[Long]("cell")).toSeq
    vectors
      .filter(col("cell").isInCollection(probed) && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("cell"),
        round(Similarity.cosinePre(col("embedding"), typedlit(qEmb),
          col("nrm"), lit(qNrm), dims), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }
}
