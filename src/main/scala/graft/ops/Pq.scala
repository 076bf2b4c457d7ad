package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Product quantization (PQ) over the persisted IVF index — the
  * compressed ANN face a 100 TB serving tier actually scans.
  *
  * The vector is split into `m` contiguous subvectors of `dsub = d/m`
  * dims; each subspace gets its own KMeans codebook of `ksub` centroids;
  * a vector is stored as `m` one-byte codes. Against the int8 face
  * (a05: 1 byte per DIMENSION) this is 1 byte per SUBSPACE — for the
  * 64-dim corpus at m=4, 4 bytes/vector vs 64 (int8) vs 256 (float32):
  * a probed cell reads 64× fewer vector bytes than the float face.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact, and per query the driver precomputes two m·ksub lookup
  * tables — dot(q_sub, centroid) and ‖centroid‖² — so scoring a stored
  * vector is m table lookups, no arithmetic on decoded vectors:
  *
  *   cos_adc(q, x) = Σ_sub dot(q_sub, c[sub][code]) /
  *                   (‖q‖ · sqrt(Σ_sub ‖c[sub][code]‖²))
  *
  * i.e. the exact cosine between q and x's PQ RECONSTRUCTION. Both
  * lookup sums run in fixed sub=0..m−1 order inside a codegen'd native
  * expression ([[graft.functions.PqLookupSum]]), so the float math is
  * deterministic and the DuckDB oracle replays it from the dumped
  * codebooks + codes.
  *
  * Scale shape: the codebook fit is m KMeans fits over ONE pass each
  * (at 100 TB: over a deterministic hash sample — `fitSampleRate`;
  * codebooks are a property of the distribution, not the corpus);
  * encode is a row-local projection (no shuffle) written in the same
  * cluster= partition layout as the base index, so probes prune
  * identically; a probe reads nprobe/k of the corpus at m bytes per
  * vector.
  */
object Pq {

  /** Fitted codebooks: `codebooks(sub)(code)` is a `dsub`-dim centroid. */
  final case class Model(m: Int, ksub: Int, dsub: Int,
      codebooks: Array[Array[Array[Double]]]) {

    /** Flattened [sub][code][j] layout consumed by the native encode. */
    def flat: Array[Double] = {
      val out = new Array[Double](m * ksub * dsub)
      var i = 0
      for (sub <- 0 until m; code <- 0 until ksub; j <- 0 until dsub) {
        out(i) = codebooks(sub)(code)(j); i += 1
      }
      out
    }

    /** Per-(sub, code) dot(q_sub, centroid) — the ADC numerator LUT. */
    def lutDot(q: Array[Double]): Array[Double] = {
      require(q.length == m * dsub,
        s"query dim ${q.length} != m·dsub = ${m * dsub}")
      val out = new Array[Double](m * ksub)
      for (sub <- 0 until m; code <- 0 until ksub) {
        var s = 0.0
        var j = 0
        while (j < dsub) {
          s += q(sub * dsub + j) * codebooks(sub)(code)(j); j += 1
        }
        out(sub * ksub + code) = s
      }
      out
    }

    /** Per-(sub, code) ‖centroid‖² — the reconstruction-norm LUT. */
    def lutN2: Array[Double] = {
      val out = new Array[Double](m * ksub)
      for (sub <- 0 until m; code <- 0 until ksub) {
        var s = 0.0
        var j = 0
        while (j < dsub) {
          val c = codebooks(sub)(code)(j); s += c * c; j += 1
        }
        out(sub * ksub + code) = s
      }
      out
    }
  }

  /** Fit per-subspace KMeans codebooks. One pass per subspace over
    * `df` (optionally a deterministic hash sample — at corpus scale the
    * codebooks are fit on a sample by construction, like every
    * published PQ build). Seeds differ per subspace so identical
    * subspace distributions don't produce identical codebooks.
    */
  def fitCodebooks(df: DataFrame, idCol: String, vecCol: String, m: Int,
      ksub: Int, seed: Long = 42L, fitSampleRate: Double = 1.0): Model = {
    require(m > 0 && ksub > 1 && ksub <= 256,
      s"need m > 0 and 1 < ksub <= 256 (byte codes), got m=$m ksub=$ksub")
    val src0 = if (fitSampleRate < 1.0)
      Sampling.hashSample(df, idCol, fitSampleRate) else df
    val src = src0.select(col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
    val d = src.select(size(col("__v"))).head().getInt(0)
    require(d % m == 0, s"vector dim $d not divisible by m=$m")
    val dsub = d / m
    val books = (0 until m).map { sub =>
      val feats = src.select(array_to_vector(
        slice(col("__v"), sub * dsub + 1, dsub)).as("__features"))
      val model = new KMeans().setK(ksub).setSeed(seed + sub)
        .setFeaturesCol("__features").setPredictionCol("__c").fit(feats)
      require(model.clusterCenters.length == ksub,
        s"subspace $sub collapsed to ${model.clusterCenters.length} centroids" +
          s" (< ksub=$ksub): corpus has too few distinct subvectors")
      model.clusterCenters.map(_.toArray)
    }.toArray
    Model(m, ksub, dsub, books)
  }

  /** Codebooks as data: (sub, code, centroid array<double>) — the dump
    * the oracle replays ADC from.
    */
  def codebookRows(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    (for (sub <- 0 until model.m; code <- 0 until model.ksub)
      yield (sub, code, model.codebooks(sub)(code).toSeq))
      .toDF("sub", "code", "centroid")
  }

  /** Reload a persisted codebook dump into a [[Model]]. Driver-bounded:
    * m·ksub rows.
    */
  def readCodebooks(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(s"$path/pq_codebooks")
      .orderBy("sub", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * ksub, s"codebook dump at $path is ragged")
    val books = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach(r => books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    Model(m, ksub, books(0)(0).length, books.map(_.toArray))
  }

  /** (id, codes array<byte>, cluster) under a FROZEN model — shared by
    * the initial build and any append path so the encode rule cannot
    * drift. Zero-norm vectors are excluded (the family's "no zero-norm
    * vector enters a top-k" rule: their cosine is undefined).
    */
  def encodeRows(assigned: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    assigned
      .select(col(idCol), v.as("__v"), col("cluster"))
      .where(array_max(transform(col("__v"), x => abs(x))) > 0)
      .select(col(idCol),
        GraftFunctions.pqEncode(col("__v"),
          typedLit(model.flat.toSeq), model.m, model.ksub).as("codes"),
        col("cluster"))
  }

  /** Fit + encode the PQ face of a persisted IVF index: codebooks to
    * `path/pq_codebooks` (data — the oracle's replay source), codes to
    * `path/assigned_pq` in the identical cluster= layout (probes prune
    * the same partitions). Build-once via marker, matching
    * [[Ivf.quantizeAssigned]]'s discipline; the marker carries the
    * params so a stale face with different m/ksub cannot satisfy a
    * request.
    */
  def pqAssign(spark: SparkSession, path: String, idCol: String,
      vecCol: String, m: Int = 4, ksub: Int = 16, seed: Long = 42L,
      fitSampleRate: Double = 1.0): Unit = {
    GraftFunctions.register(spark)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_PQ_OK_${vecCol}_m${m}_k$ksub")
    if (fs.exists(marker)) return
    // one PQ face per index path: a face built with different params
    // must not be silently overwritten while its marker survives
    // (readers would mix old marker with new codes) — same stale-
    // artifact discipline as Ivf.buildPersistent
    val stale = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$path/_PQ_OK_${vecCol}_*"))
    require(stale == null || stale.isEmpty,
      s"index at $path already holds a PQ face with different parameters " +
        s"(${stale.map(_.getPath.getName).mkString(", ")}) — delete the " +
        "face (pq_codebooks/, assigned_pq/, marker) to rebuild with " +
        s"m=$m ksub=$ksub")
    val assigned = spark.read.parquet(s"$path/assigned")
    val model = fitCodebooks(assigned, idCol, vecCol, m, ksub, seed,
      fitSampleRate)
    codebookRows(spark, model).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/pq_codebooks")
    encodeRows(assigned, idCol, vecCol, model)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/assigned_pq")
    fs.create(marker, true).close()
  }

  /** [[Ivf.topK]] over the PQ face: identical probe-cell selection
    * (shared [[Ivf.probeCells]] — the three faces cannot drift), but
    * the per-cell scan reads `assigned_pq` (m bytes per vector) and
    * ranks by ADC cosine via two lookup-table literals. The scan plan
    * is scan → codegen'd projection → TakeOrderedAndProject; the only
    * vector arithmetic anywhere is the driver-side m·ksub LUT build.
    */
  def topKPq(spark: SparkSession, path: String, query: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4,
      roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(spark)
    val centroids = Ivf.readIndex(spark, path).centroids
    val qvec = Ivf.queryVecOf(query, vecCol)
    val probes = Ivf.probeCells(centroids, qvec, nprobe)
    val model = readCodebooks(spark, path)
    val qnorm = math.sqrt(qvec.map(x => x * x).sum)
    require(qnorm > 0, "zero-norm query has no cosine neighbors")
    val dotLut = typedLit(model.lutDot(qvec).toSeq)
    val n2Lut = typedLit(model.lutN2.toSeq)
    val n2Sum = GraftFunctions.pqLookupSum(col("codes"), n2Lut, model.ksub)
    spark.read.parquet(s"$path/assigned_pq")
      .where(col("cluster").isInCollection(probes))
      .select(col(idCol),
        round(when(n2Sum > 0,
          GraftFunctions.pqLookupSum(col("codes"), dotLut, model.ksub) /
            (lit(qnorm) * sqrt(n2Sum))), roundTo).as("cos_adc"))
      .where(col("cos_adc").isNotNull)
      .orderBy(col("cos_adc").desc, col(idCol))
      .limit(k)
  }

  /** Batched multi-query probe over the PQ face — a06's exact plan
    * shape (plan-time probes via the SHARED [[Ivf.batchProbe]], static
    * partition pruning, broadcast (query, cell) pairs, keyed-window
    * rank), reading `assigned_pq` (m bytes per vector). Each broadcast
    * query row carries its own dot-LUT (m·ksub doubles — the per-query
    * driver precompute); the query-independent ‖c‖² LUT rides once as
    * a literal. Because cell selection is batchProbe, an agreement
    * report against the float face measures exactly the PQ
    * reconstruction effect, never probe drift — a09's methodology.
    * Zero-norm queries score NULL everywhere and rank nothing.
    */
  def topKPqBatch(spark: SparkSession, path: String, index: Ivf.Index,
      queries: DataFrame, qidCol: String, vecCol: String, idCol: String,
      k: Int, nprobe: Int = 4, roundTo: Int = 6): DataFrame = {
    GraftFunctions.register(spark)
    val (qdf, allCells, qidOut) =
      Ivf.batchProbe(index, queries, qidCol, vecCol, idCol, nprobe)
    val model = readCodebooks(spark, path)
    // extend the (query, cell) broadcast rows with the per-query ADC
    // precompute: dot-LUT + query norm (O(Q·nprobe·m·ksub) driver
    // state — thousands of queries are trivial)
    val rows = qdf.collect().toSeq.map { r =>
      val vec = r.getSeq[Double](1).toArray
      org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(
        model.lutDot(vec).toSeq, math.sqrt(vec.map(x => x * x).sum)))
    }
    val schema = qdf.schema
      .add("lut_dot", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))
      .add("qnorm", org.apache.spark.sql.types.DoubleType)
    val qlut = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    val n2Lut = typedLit(model.lutN2.toSeq)
    val n2Sum = GraftFunctions.pqLookupSum(col("codes"), n2Lut, model.ksub)
    Ivf.rankTopK(
      spark.read.parquet(s"$path/assigned_pq")
        .where(col("cluster").isInCollection(allCells))
        .join(broadcast(qlut), "cluster")
        .select(col(qidOut), col(idCol),
          round(when(n2Sum > 0 && col("qnorm") > 0,
            GraftFunctions.pqLookupSum(col("codes"), col("lut_dot"), model.ksub) /
              (col("qnorm") * sqrt(n2Sum))), roundTo).as("cos_sim"))
        .where(col("cos_sim").isNotNull),
      qidOut, idCol, k)
  }
}
