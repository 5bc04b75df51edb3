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
           idCol: String = "vec_id", embCol: String = "embedding",
           metaCols: Seq[String] = Nil): String = {
    val assign = Similarity.ivfAssign(embs, k, dims, idCol, embCol)
      .select(col(idCol), col("cell"))
    embs.join(assign, idCol)
      .select(Seq(col(idCol).as("vec_id"), col("cell"), col(embCol).as("embedding"),
        Similarity.norm(col(embCol), dims).as("nrm")) ++ metaCols.map(col): _*)
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
  /** Refuse an append whose metadata columns differ from what the
    * persisted table already carries: parquet appends with a drifted
    * schema don't fail — the mismatched files silently read back with
    * missing/NULL metadata and filtered serving starts dropping rows.
    * Failing loudly here keeps the metaCols contract append-safe.
    */
  private def requireSameMeta(spark: SparkSession, table: String,
                              base: Set[String], metaCols: Seq[String]): Unit = {
    val existing = spark.read.parquet(table).schema.fieldNames
      .filterNot(base.contains).toSeq.sorted
    require(existing == metaCols.sorted,
      s"index table $table carries metadata columns [${existing.mkString(",")}] " +
        s"but this append supplies [${metaCols.sorted.mkString(",")}]; pass the same " +
        "metaCols the index was saved with, or rebuild the index")
  }

  def append(embs: DataFrame, path: String, dims: Int,
             idCol: String = "vec_id", embCol: String = "embedding",
             metaCols: Seq[String] = Nil): String = {
    val spark = embs.sparkSession
    requireSameMeta(spark, s"$path/vectors",
      Set("vec_id", "cell", "embedding", "nrm"), metaCols)
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cent_id"), col("cent_emb"))
    val assign = Similarity.ivfAssignWith(embs, cents, dims, idCol, embCol)
      .select(col(idCol), col("cell"))
    embs.join(assign, idCol)
      .select(Seq(col(idCol).as("vec_id"), col("cell"), col(embCol).as("embedding"),
        Similarity.norm(col(embCol), dims).as("nrm")) ++ metaCols.map(col): _*)
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
    dropTombstoned(spark, path, spark.read.parquet(s"$path/vectors"))
      .repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$tmp/vectors")
    spark.read.parquet(s"$path/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/centroids")
    // a backfilled BQ code table must shed its tombstoned rows in the
    // SAME swap — clearing the tombstones while stale codes survive
    // would resurrect deleted ids on the bqServe path
    if (new java.io.File(s"$path/bqcodes").exists)
      dropTombstoned(spark, path, spark.read.parquet(s"$path/bqcodes"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(s"$tmp/bqcodes")
    StagedSwap.swap(path, tmp)
    path
  }

  /** Build + persist the IVF+PQ index — the ACTUAL 100 TB serving
    * layout: what scans at request time is the `codes` table
    * (m·log₂k BITS per vector, cell-clustered for probe pruning), not
    * floats; raw embeddings persist alongside but are read back only
    * for the |shortlist| exact re-rank rows. Quantizers (trained
    * coarse k-means + the m subspace codebooks) are k-row tables.
    * Everything round-trips the exact micro lattice, so
    * [[pqServe]]'s ranking is bit-identical to the batch
    * [[Similarity.ivfpqSearch]] and shares its oracle.
    */
  def savePq(embs: DataFrame, path: String, kCoarse: Int, coarseIters: Int,
             m: Int, k: Int, iters: Int, dims: Int,
             idCol: String = "vec_id", embCol: String = "embedding",
             metaCols: Seq[String] = Nil): String = {
    val coarse = Similarity.centroidsAsVectors(
      Similarity.kmeansTrain(embs, kCoarse, coarseIters, dims, idCol, embCol))
    val assign = Similarity.ivfAssignWith(embs, coarse, dims, idCol, embCol)
      .select(col(idCol).as("vec_id"), col("cell"))
    val (sve, pcents) = Similarity.pqFit(embs, m, k, iters, dims, idCol, embCol)
    // metadata rides the CODES table (m small dictionary-encoded values
    // per vector) so a filtered request prunes before ADC without ever
    // touching the raw-vector table
    val codesMeta =
      if (metaCols.isEmpty) Similarity.assignCodes(sve, pcents, k, dims / m).join(assign, "vec_id")
      else Similarity.assignCodes(sve, pcents, k, dims / m).join(assign, "vec_id")
        .join(embs.select((col(idCol).as("vec_id") +: metaCols.map(col)): _*), "vec_id")
    codesMeta
      .select(Seq(col("vec_id"), col("cell"), col("sub"), col("code")) ++ metaCols.map(col): _*)
      .repartitionByRange(col("cell"))
      .sortWithinPartitions("cell", "vec_id", "sub")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/codes")
    pcents.coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    embs.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .join(assign, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
      .repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/vectors")
    coarse.coalesce(1).write.mode("overwrite").parquet(s"$path/coarse")
    path
  }

  /** Fold an embedding batch INTO the PQ index with BOTH quantizers
    * frozen (persisted coarse k-means + subspace codebooks) — the
    * online half of the PQ lifecycle: cell assignment and code
    * encoding are broadcast-quantizer per-row maps over the BATCH, and
    * the writes are cell-sorted-within-batch appends (same LSM
    * contract as the other indexes; [[compactPq]] restores the range
    * layout). Codes written here are bit-identical to
    * [[Similarity.pqEncodeWith]]'s frozen-codebook batch encoding
    * (the spec proves it), so append-then-serve stays on the exact
    * lattice.
    */
  def appendPq(embs: DataFrame, path: String, m: Int, k: Int, dims: Int,
               idCol: String = "vec_id", embCol: String = "embedding",
               metaCols: Seq[String] = Nil): String = {
    val spark = embs.sparkSession
    requireSameMeta(spark, s"$path/codes",
      Set("vec_id", "cell", "sub", "code"), metaCols)
    val coarse = spark.read.parquet(s"$path/coarse")
    val codebook = spark.read.parquet(s"$path/codebook")
    val assign = Similarity.ivfAssignWith(embs, coarse, dims, idCol, embCol)
      .select(col(idCol).as("vec_id"), col("cell"))
    val encoded = Similarity.assignCodes(
        Similarity.subVectors(embs, m, dims, idCol, embCol), codebook, k, dims / m)
      .join(assign, "vec_id")
    (if (metaCols.isEmpty) encoded
     else encoded.join(embs.select((col(idCol).as("vec_id") +: metaCols.map(col)): _*), "vec_id"))
      .select(Seq(col("vec_id"), col("cell"), col("sub"), col("code")) ++ metaCols.map(col): _*)
      .sortWithinPartitions("cell", "vec_id", "sub")
      .write.mode("append").option("compression", "zstd")
      .parquet(s"$path/codes")
    embs.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
      .join(assign, "vec_id")
      .select(col("vec_id"), col("cell"), col("embedding"))
      .sortWithinPartitions("cell")
      .write.mode("append").option("compression", "zstd")
      .parquet(s"$path/vectors")
    path
  }

  /** Re-cluster the PQ index's code and vector tables back into their
    * probe-optimal cell-range layout (staged swap; quantizers copied
    * unchanged).
    */
  def compactPq(spark: SparkSession, path: String): String = {
    val tmp = path + ".compact"
    dropTombstoned(spark, path, spark.read.parquet(s"$path/codes"))
      .repartitionByRange(col("cell")).sortWithinPartitions("cell", "vec_id", "sub")
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$tmp/codes")
    dropTombstoned(spark, path, spark.read.parquet(s"$path/vectors"))
      .repartitionByRange(col("cell")).sortWithinPartitions("cell")
      .write.mode("overwrite").option("compression", "zstd").parquet(s"$tmp/vectors")
    spark.read.parquet(s"$path/codebook").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/codebook")
    spark.read.parquet(s"$path/coarse").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/coarse")
    StagedSwap.swap(path, tmp)
    path
  }

  /** Warm IVF+PQ (IVFADC) serving plan: probed-cell-pruned scan of the
    * CODE table, ADC against the broadcast m·k LUT, exact micro² L2
    * re-rank of the shortlist read back from the raw-vector table —
    * the same three stages as the batch [[Similarity.ivfpqSearch]]
    * with the train/encode work amortized into [[savePq]]. All
    * arithmetic stays on the exact integer lattice, so the served
    * top-k is row-identical to the batch query (shared oracle).
    */
  def pqServe(spark: SparkSession, path: String, queryVecId: Long,
              probes: Int, m: Int, shortlist: Int, topK: Int, dims: Int): DataFrame = {
    val subDims = dims / m
    val codes = dropTombstoned(spark, path, spark.read.parquet(s"$path/codes"))
    val codebook = spark.read.parquet(s"$path/codebook")
    val vectors = spark.read.parquet(s"$path/vectors")
    val coarse = spark.read.parquet(s"$path/coarse")
    val q = vectors.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), Similarity.norm(col("embedding"), dims).as("nrm"))
      .collect().head
    val qEmb = q.getSeq[Float](0)
    val qNrm = q.getDouble(1)
    val probed = coarse
      .select(col("cent_id").as("cell"),
        round(Similarity.cosinePre(col("cent_emb"), typedlit(qEmb),
          Similarity.norm(col("cent_emb"), dims), lit(qNrm), dims), 6).as("qcos"))
      .orderBy(col("qcos").desc, col("cell"))
      .limit(probes)
      .collect().map(_.getAs[Long]("cell")).toSeq
    // query subvectors via the SAME projection the batch path uses —
    // micro rounding stays inside Spark expressions (no driver math)
    val qs = Similarity.subVectors(
        vectors.filter(col("vec_id") === queryVecId), m, dims, "vec_id", "embedding")
      .select(col("sub"), col("sv").as("qv"), col("nn").as("qn"))
    val lut = codebook.join(broadcast(qs), "sub")
      .select(col("sub"), col("cent_id").as("code"),
        (col("qn") + col("cn") - lit(2.0) * Similarity.dot(col("qv"), col("cv"), subDims))
          .cast("long").as("d2q"))
    val adc = codes
      .filter(col("cell").isInCollection(probed) && col("vec_id") =!= queryVecId)
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("d2q")).as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(shortlist)
    val sveC = Similarity.subVectors(
      vectors.join(broadcast(adc.select(col("vec_id"))), "vec_id"),
      m, dims, "vec_id", "embedding")
    sveC.join(broadcast(qs), "sub")
      .select(col("vec_id"),
        (col("nn") + col("qn") - lit(2.0) * Similarity.dot(col("sv"), col("qv"), subDims))
          .as("pd2"))
      .groupBy(col("vec_id"))
      .agg(sum(col("pd2")).cast("long").as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(topK)
  }

  /** [[pqServe]] with a metadata predicate over columns the codes table
    * was saved with (`savePq(..., metaCols)`): the predicate joins the
    * probed-cell pruning IN THE CODES SCAN, so non-matching vectors are
    * gone before the ADC aggregation and the whole shortlist is spent
    * on matching rows — the filtered-search contract on the bits-not-
    * floats layout, raw vectors still touched only for the re-rank.
    * With identical parameters the ranking is row-identical to the
    * batch [[Similarity.ivfpqSearchFiltered]] (shared oracle).
    */
  def pqServeFiltered(spark: SparkSession, path: String, pred: org.apache.spark.sql.Column,
                      queryVecId: Long, probes: Int, m: Int, shortlist: Int,
                      topK: Int, dims: Int): DataFrame = {
    val subDims = dims / m
    val codes = dropTombstoned(spark, path, spark.read.parquet(s"$path/codes"))
    val codebook = spark.read.parquet(s"$path/codebook")
    val vectors = spark.read.parquet(s"$path/vectors")
    val coarse = spark.read.parquet(s"$path/coarse")
    val q = vectors.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), Similarity.norm(col("embedding"), dims).as("nrm"))
      .collect().head
    val qEmb = q.getSeq[Float](0)
    val qNrm = q.getDouble(1)
    val probed = coarse
      .select(col("cent_id").as("cell"),
        round(Similarity.cosinePre(col("cent_emb"), typedlit(qEmb),
          Similarity.norm(col("cent_emb"), dims), lit(qNrm), dims), 6).as("qcos"))
      .orderBy(col("qcos").desc, col("cell"))
      .limit(probes)
      .collect().map(_.getAs[Long]("cell")).toSeq
    val qs = Similarity.subVectors(
        vectors.filter(col("vec_id") === queryVecId), m, dims, "vec_id", "embedding")
      .select(col("sub"), col("sv").as("qv"), col("nn").as("qn"))
    val lut = codebook.join(broadcast(qs), "sub")
      .select(col("sub"), col("cent_id").as("code"),
        (col("qn") + col("cn") - lit(2.0) * Similarity.dot(col("qv"), col("cv"), subDims))
          .cast("long").as("d2q"))
    val adc = codes
      .filter(col("cell").isInCollection(probed) && col("vec_id") =!= queryVecId && pred)
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("vec_id"))
      .agg(sum(col("d2q")).as("adc_d2"))
      .orderBy(col("adc_d2"), col("vec_id"))
      .limit(shortlist)
    val sveC = Similarity.subVectors(
      vectors.join(broadcast(adc.select(col("vec_id"))), "vec_id"),
      m, dims, "vec_id", "embedding")
    sveC.join(broadcast(qs), "sub")
      .select(col("vec_id"),
        (col("nn") + col("qn") - lit(2.0) * Similarity.dot(col("sv"), col("qv"), subDims))
          .as("pd2"))
      .groupBy(col("vec_id"))
      .agg(sum(col("pd2")).cast("long").as("d2"))
      .orderBy(col("d2"), col("vec_id"))
      .limit(topK)
  }

  /** Prepare the warm serving plan for one query vector (looked up by
    * id, as the oracle does; a production handler receives the vector
    * in the request). The two driver-side collects — the query row and
    * the probed cell ids — are the request-time k-row work; the
    * returned plan is the literal-pruned scan + top-k, fully lazy.
    */
  /** Build + persist the binary-quantized serving layout — the 1-bit
    * end of the served ladder next to [[save]] (float) and [[savePq]]
    * (m·log₂k bits): a `bqcodes` table of ⌈dims/32⌉ packed sign words
    * per vector (8 bytes/vector at dims=64 — the request-time scan is
    * 32× smaller than the float corpus) plus the float `vectors` table
    * read back only for the |shortlist| exact re-rank rows.
    */
  def saveBq(embs: DataFrame, path: String, dims: Int,
             idCol: String = "vec_id", embCol: String = "embedding"): String = {
    Similarity.bqEncode(embs, dims, idCol, embCol)
      .withColumnRenamed(idCol, "vec_id")
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/bqcodes")
    embs.select(col(idCol).as("vec_id"), col(embCol).as("embedding"),
        Similarity.norm(col(embCol), dims).as("nrm"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/vectors")
    path
  }

  /** Derive + persist packed sign-word codes for an EXISTING index dir
    * (one whose `vectors` table [[save]] or [[saveBq]] wrote): lets an
    * IVF index serve the BQ plan too — the codes ride alongside, and
    * [[bqServe]] needs only (vec_id, embedding, nrm) from the float
    * table it already has. One scan of the vectors table, map-only.
    */
  def addBqCodes(spark: SparkSession, path: String, dims: Int): String = {
    Similarity.bqEncode(spark.read.parquet(s"$path/vectors"), dims)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/bqcodes")
    path
  }

  /** Serve a binary-quantized search from the persisted layout:
    * popcount-Hamming shortlist over the 8-byte codes scan, exact
    * cosine re-rank over the shortlist only — row-identical to the
    * batch [[Similarity.bqSearch]] with the same parameters (shared
    * oracle). The request plan touches: the codes scan (bounded
    * TakeOrderedAndProject), |shortlist| rows of the float table via a
    * broadcast join, one query row.
    */
  def bqServe(spark: SparkSession, path: String, queryVecId: Long,
              shortlist: Int, topK: Int, dims: Int): DataFrame = {
    val codes = dropTombstoned(spark, path, spark.read.parquet(s"$path/bqcodes"))
    val vectors = spark.read.parquet(s"$path/vectors")
    val qWords = codes.filter(col("vec_id") === queryVecId)
      .collect().head.getSeq[Long](1)
    val q = vectors.filter(col("vec_id") === queryVecId)
      .select(col("embedding"), col("nrm")).collect().head
    val qEmb = q.getSeq[Float](0)
    val qNrm = q.getDouble(1)
    val ham = codes.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        Similarity.bqHamming(col("bq"), typedlit(qWords), dims).as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(shortlist)
    broadcast(ham)
      .join(vectors, Seq("vec_id"))
      .select(col("vec_id"), col("hamming"),
        round(Similarity.cosinePre(col("embedding"), typedlit(qEmb),
          col("nrm"), lit(qNrm), dims), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Tombstone delete — the fourth quarter of the index lifecycle
    * (build / append / delete / compact), the LSM contract: a delete
    * batch is an O(|batch|) append to a side `tombstones` table (the
    * main tables are NEVER rewritten at delete time); every serving
    * path anti-joins the (small, broadcast) tombstone set out of its
    * scan; [[compact]] / [[compactPq]] physically drop the rows and
    * clear the tombstones with the same staged swap. Contract: a
    * tombstoned id never surfaces in any serving answer, before or
    * after compaction (spec'd); the tombstone suppresses the id even
    * if re-appended — compact first to genuinely re-add one.
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): String = {
    import spark.implicits._
    ids.toDF("vec_id").write.mode("append").parquet(s"$path/tombstones")
    path
  }

  private def dropTombstoned(spark: SparkSession, path: String,
                             df: DataFrame): DataFrame =
    if (new java.io.File(s"$path/tombstones").exists)
      df.join(broadcast(spark.read.parquet(s"$path/tombstones").distinct()),
        Seq("vec_id"), "left_anti")
    else df

  /** Fraction of stored vectors that are tombstoned (0 with no
    * tombstones) — the compaction-pressure signal. Tombstoned ids that
    * were never members ([[delete]] appends raw ids unchecked) are
    * excluded via a semi-join, so the ratio can't exceed 1.0 or trigger
    * spurious [[compactIfStale]] rewrites (r9 advice).
    */
  def deadFraction(spark: SparkSession, path: String): Double =
    if (!new java.io.File(s"$path/tombstones").exists) 0.0
    else {
      val table = if (new java.io.File(s"$path/vectors").exists) "vectors" else "codes"
      val members = spark.read.parquet(s"$path/$table").select(col("vec_id"))
      val total = members.count()
      if (total == 0L) 0.0
      else members.join(
          broadcast(spark.read.parquet(s"$path/tombstones").distinct()),
          Seq("vec_id"), "left_semi").count().toDouble / total
    }

  /** Policy-driven compaction: compact only when the dead fraction
    * crosses `maxDead` — trickle deletes amortize into occasional
    * rewrites. Uses [[compactPq]] when the index is a codes layout.
    * Returns whether it compacted.
    */
  def compactIfStale(spark: SparkSession, path: String, maxDead: Double = 0.2): Boolean = {
    val stale = deadFraction(spark, path) > maxDead
    if (stale) {
      if (new java.io.File(s"$path/codes").exists) compactPq(spark, path)
      else compact(spark, path)
      ()
    }
    stale
  }

  def annServe(spark: SparkSession, path: String, queryVecId: Long,
               probes: Int, topK: Int, dims: Int): DataFrame = {
    val vectors = dropTombstoned(spark, path, spark.read.parquet(s"$path/vectors"))
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

  /** [[annServe]] with a metadata predicate over columns the index was
    * saved with (`save(..., metaCols)`): the predicate joins the
    * `cell IN (probed…)` pruning in the SAME vectors scan — both reach
    * parquet PushedFilters, so the request reads only probed-cell rows
    * that pass the filter. The caller oversearches (raises `probes`)
    * exactly as in [[graft.operators.Similarity.ivfSearchFiltered]];
    * with identical parameters the served ranking is row-identical to
    * that batch operator (shared oracle — the metadata round-trips the
    * index losslessly).
    */
  def annServeFiltered(spark: SparkSession, path: String, pred: org.apache.spark.sql.Column,
                       queryVecId: Long, probes: Int, topK: Int, dims: Int): DataFrame = {
    val vectors = dropTombstoned(spark, path, spark.read.parquet(s"$path/vectors"))
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
      .filter(col("cell").isInCollection(probed) && col("vec_id") =!= queryVecId && pred)
      .select(col("vec_id"), col("cell"),
        round(Similarity.cosinePre(col("embedding"), typedlit(qEmb),
          col("nrm"), lit(qNrm), dims), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }
}
