package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 E2/E3 — similarity search over the embedding column
  * (embeddings fixture: 64-dim list<float>, TESTDATA.md).
  *
  * All vector math is pure Catalyst higher-order functions (`zip_with` +
  * `aggregate`) — no UDF, so the dot products stay inside whole-stage codegen
  * and the DuckDB oracle can mirror the exact same left-fold arithmetic
  * (identical IEEE operation order ⇒ bit-identical doubles, no rounding
  * fudge needed).
  *
  * Scale path (100 TB): brute-force top-k is O(N) per probe with a
  * TakeOrderedAndProject (no shuffle of the corpus); the IVF variant (e9)
  * bounds each probe to one cluster — centroids broadcast, cluster
  * assignment is a map-side argmax, and the corpus would be written
  * partitioned by cluster id so a probe prunes to one partition.
  */
object Similarity {
  import Tables.load

  /** Left-fold double dot product of two float vectors (codegen-friendly
    * higher-order-function composition — kept as the reference semantics the
    * native expression must match bit-for-bit, see VectorExpressionSpec). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Composed-operator cosine (option (a) of the custom-op preference order). */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Hot-path cosine: the fused native Catalyst expression (same IEEE
    * operation order as [[cosineComposed]], single pass, zero allocation).
    * Requires VectorExpressions.register(spark) — done at the top of each
    * query below. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** 8 deterministic random hyperplanes for cosine LSH (e09b): coefficients
    * derived from md5 in [-1, 1] with 3 decimals, computed once here and
    * embedded as literals in BOTH the Spark plan and the DuckDB oracle —
    * identical doubles by construction. */
  private[graft] val planes: Seq[Seq[Double]] = {
    def h(sd: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(sd.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    (0 until 8).map(j => (0 until 64).map(i => ((h(s"plane${j}_$i") % 2001) - 1000) / 1000.0))
  }

  /** Signed-projection bucket id: bit j = sign(v · plane_j). */
  private def bucketCol(v: Column): Column =
    planes.zipWithIndex.map { case (w, j) =>
      val warr = array(w.map(lit): _*)
      when(dot(v, warr) > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _)

  private def planeSqlArr(w: Seq[Double]): String =
    w.map(x => f"$x%.17g").mkString("[", ", ", "]::DOUBLE[]")

  private def bucketSql(v: String): String =
    planes.zipWithIndex.map { case (w, j) =>
      s"(CASE WHEN ${dotSql(v, planeSqlArr(w))} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("CAST((", " + ", ") AS BIGINT)")

  /** DuckDB twin of [[dot]] — identical fold order. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 64), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE)), (acc, v) -> acc + v)"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Deterministic sampled seeds for IVF training: the k corpus vectors with
    * the smallest md5-derived key of vec_id — an unbiased-but-reproducible
    * sample (no RNG state, identical on every run and engine). */
  def sampledSeeds(emb: DataFrame, k: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      md5(col("vec_id").cast(StringType)).as("__key"))
      .orderBy(col("__key"), col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("embedding"))

  /** Lloyd's k-means over cosine assignment, pure DataFrame ops: assign each
    * vector to its argmax-cosine centroid (broadcast centroids, map-side),
    * recompute each centroid as the element-wise mean of its members
    * (posexplode → groupBy(cid, dim) → reassemble). Centroids are tiny
    * (k × dim), so every iteration is one corpus pass + one k·dim-sized
    * aggregate — the standard shape at any scale; k-means|| seeding would
    * replace sampledSeeds on a real 100 TB corpus. Returns (cid, cemb). */
  def kmeansCentroids(spark: SparkSession, emb: DataFrame, k: Int,
                      iters: Int): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    var cents = sampledSeeds(emb, k)
      // graft_pin(0): the input is the k sampled seeds (bounded, k rows), so
      // the single-partition window is deliberate — the pinned constant
      // survives folding and keeps the WindowExec warning out of the log
      .select(row_number().over(Window
          .partitionBy(graft.functions.PinnedKey.pin(lit(0)))
          .orderBy(col("vec_id")))
        .cast(LongType).as("cid"),
        col("embedding").as("cemb"))
    (0 until iters).foreach { _ =>
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosine(col("embedding"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      cents = assigned
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"),
          transform(col("dm"), e => e.getField("m").cast(FloatType)).as("cemb"))
    }
    cents
  }

  /** Assign every corpus vector to its nearest centroid (argmax cosine). */
  def ivfAssign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2 brute-force cosine top-k: probe = vec 0, scan the corpus, keep 10.
    // Plan: broadcast 1-row probe → map-side cosine → TakeOrderedAndProject.
    "e06_cosine_topk" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id"), col("label"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    },
    // E2/E4 hybrid retrieval — reciprocal-rank fusion of the lexical and
    // dense rankers (the standard two-tower retrieval composition: BM25
    // top-20 from e40's shared pipeline ⊕ cosine top-20 from e06's, fused
    // by RRF score Σ 1/(60 + rank)). Exactness: ranks are integers with
    // full (score, id) tie-breaks; each reciprocal is one IEEE division
    // CAST to DECIMAL(28,12) (deterministic round), so the two-system sum
    // is exact decimal addition — order-free — and casts to DOUBLE once.
    // Scale: both rankers are top-k heaps over their own bounded
    // pipelines; the fusion joins two 20-row lists. The rank windows run
    // over those bounded lists under graft_pin (deliberate single
    // partition).
    "e76_hybrid_rrf" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val pin = graft.functions.PinnedKey.pin(lit(0))
      val dec = (c: Column) => c.cast(DecimalType(28, 12))
      val zero = lit(java.math.BigDecimal.ZERO).cast(DecimalType(28, 12))
      val lex = graft.Extensions.bm25Scores(s, d)
        .withColumn("lex_rank", row_number().over(
          Window.partitionBy(pin).orderBy(col("score").desc, col("doc_id"))))
        .filter(col("lex_rank") <= 20)
        .select(col("doc_id"), col("lex_rank").cast(LongType).as("lex_rank"))
      val emb = load(s, d, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb"))
      val dense = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(probe))
        .select(col("vec_id").as("doc_id"),
          cosine(col("embedding"), col("probe_emb")).as("cs"))
        .withColumn("dense_rank", row_number().over(
          Window.partitionBy(pin).orderBy(col("cs").desc, col("doc_id"))))
        .filter(col("dense_rank") <= 20)
        .select(col("doc_id"), col("dense_rank").cast(LongType).as("dense_rank"))
      lex.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
          (coalesce(dec(lit(1.0) / (col("lex_rank") + lit(60.0))), zero)
            + coalesce(dec(lit(1.0) / (col("dense_rank") + lit(60.0))), zero))
            .cast(DoubleType).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },
    // E3 similarity self-join: all pairs above threshold, label-blocked to
    // bound the pair count (at 100 TB: LSH/IVF buckets replace the label).
    "e07_cosine_selfjoin" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val sm = load(s, d, "embeddings").filter(col("vec_id") % 10 === 0)
      val a = sm.select(col("vec_id").as("v1"), col("label"),
        col("embedding").as("e1"))
      val b = sm.select(col("vec_id").as("v2"), col("label").as("label2"),
        col("embedding").as("e2"))
      a.join(b, col("label") === col("label2") && col("v1") < col("v2"))
        .select(col("label"), col("v1"), col("v2"),
          cosine(col("e1"), col("e2")).as("cos_sim"))
        .filter(col("cos_sim") > 0.2)
        .orderBy("label", "v1", "v2")
    },
    // E2/training prep — hard-negative mining: for the probe, the top-k most
    // similar vectors whose LABEL DIFFERS — the contrastive-training sampler
    // (the highest-scoring wrong answers are the most informative negatives).
    // Same 100 TB shape as e06: broadcast 1-row probe, label filter fused
    // into the scan, TakeOrderedAndProject — no corpus shuffle; with an IVF
    // layout the scan prunes to the probe's top clusters first (e09d).
    "e37_hard_negatives" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_emb"), col("label").as("probe_label"))
      emb.crossJoin(broadcast(probe))
        .filter(col("label") =!= col("probe_label"))
        .select(col("vec_id"), col("label"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(10)
    },
    // E2/E1 embedding near-dup report: per-label pair stats at the near-dup
    // threshold (this corpus has no >0.9 dups; 0.25 keeps the report real).
    "e08_embedding_neardup" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val sm = load(s, d, "embeddings").filter(col("vec_id") % 10 === 0)
      val a = sm.select(col("vec_id").as("v1"), col("label"), col("embedding").as("e1"))
      val b = sm.select(col("vec_id").as("v2"), col("label").as("label2"), col("embedding").as("e2"))
      a.join(b, col("label") === col("label2") && col("v1") < col("v2"))
        .select(col("label"), cosine(col("e1"), col("e2")).as("cs"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("cs") > 0.25, 1L).otherwise(0L)).as("n_neardup"),
          max(col("cs")).as("max_cos"))
        .orderBy("label")
    },
    // E2 scale path #2 — cosine LSH: 8 random-hyperplane sign bits bucket
    // the corpus (256 buckets, map-side, no shuffle of vectors); the probe
    // (vec 42) scans only its own bucket. With the corpus written
    // partitioned by bucket this is a 1/256 read per probe.
    "e09b_ann_lsh" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
        .withColumn("bucket", bucketCol(col("embedding")))
      val probe = emb.filter(col("vec_id") === 42)
        .select(col("bucket").as("probe_bucket"), col("embedding").as("probe_emb"))
      emb.join(broadcast(probe), col("bucket") === col("probe_bucket"))
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), col("bucket"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    },
    // E2 scale path #3 — IVF with the index MATERIALIZED: cluster assignment
    // written partitionBy(cid), probe reads exactly one partition directory
    // (PartitionFilters prune the rest) — the end-to-end layout SCALE.md
    // describes, executed.
    "e09c_ann_ivf_partitioned" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val tag = d.replaceAll("[^A-Za-z0-9.]", "_")
      val idxPath = s"${operators.ArtifactRoot.resolve(s)}/graft_$tag/e09c_ivf_index"
      val emb = load(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosine(col("embedding"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
        .write.mode("overwrite").partitionBy("cid").parquet(idxPath)
      val index = s.read.parquet(idxPath)
      val probe = index.filter(col("vec_id") === 42)
        .select(col("cid").as("probe_cid"), col("embedding").as("probe_emb"))
      index.join(broadcast(probe), col("cid") === col("probe_cid"))
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), col("cid").cast(IntegerType).as("cid"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    },
    // E2 scale path — IVF: 8 seed centroids (vec 0..7, broadcast), map-side
    // argmax assignment, probe (vec 42) searches only its own cluster.
    "e09_ann_ivf" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("label"), col("embedding"), col("cid"),
          cosine(col("embedding"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("embedding"), col("cid"))
      val probe = assigned.filter(col("vec_id") === 42)
        .select(col("cid").as("probe_cid"), col("embedding").as("probe_emb"))
      assigned.join(broadcast(probe), col("cid") === col("probe_cid"))
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), col("cid"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    },
    // E2 scale path — multi-probe IVF: recall's standard lever. The probe
    // searches its top-2 centroids' clusters instead of only the nearest
    // (IVF's recall loss concentrates on vectors near cluster boundaries);
    // cost is nprobe/k of the corpus, still pruned, centroid ranking still
    // a broadcast-only map-side computation.
    "e09d_ann_multiprobe" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosine(col("embedding"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      val probeVec = emb.filter(col("vec_id") === 42)
        .select(col("embedding").as("probe_emb"))
      // rank ALL centroids against the probe vector; keep nprobe=2 (the
      // 8-row window is a broadcast-side computation, not a corpus shuffle)
      val probeCids = probeVec.crossJoin(broadcast(cents))
        .select(col("probe_emb"), col("cid"),
          cosine(col("probe_emb"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(
          // bounded input: 1 probe × k centroids — the pinned constant
          // partition is deliberate (and survives constant folding, which a
          // bare lit(0) would not)
          Window.partitionBy(graft.functions.PinnedKey.pin(lit(0)))
            .orderBy(col("csim").desc, col("cid").asc)))
        .filter(col("rn") <= 2)
        .select(col("cid").as("probe_cid"), col("probe_emb"))
      assigned.join(broadcast(probeCids), col("cid") === col("probe_cid"))
        .filter(col("vec_id") =!= 42)
        .select(col("vec_id"), col("cid"),
          cosine(col("embedding"), col("probe_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id").asc)
        .limit(5)
    },
    // E2 k-means (Lloyd) — the IVF centroid trainer, oracle-gated end to
    // end: init = vecs 0..7, one exact integer assignment, one mean update,
    // one reassignment against the updated means. Integer quantization
    // (round(x·100)) makes round 1 pure integer math; the mean is one IEEE
    // division per dim of an exact integer sum (order-free), and round-2
    // distances are left-fold doubles with a FIXED fold order — so both
    // engines compute bit-identical values with no rounding fudge. Each
    // iteration is one corpus pass with broadcast centroids (k×64) plus a
    // k×64-sized aggregate: the canonical distributed k-means shape, and
    // exactly what [[kmeansCentroids]] runs in float space for AnnRecallSpec.
    "e30_kmeans" -> { (s, d) =>
      val qv = load(s, d, "embeddings").select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) * 100).cast(LongType)).as("q"))
      val cents0 = qv.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
      val d2Int = aggregate(
        zip_with(col("q"), col("cq"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cid").asc)
      val a1 = qv.crossJoin(broadcast(cents0))
        .select(col("vec_id"), col("q"), col("cid"), d2Int.as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("q"), col("cid"))
      val cents1 = a1
        .select(col("cid"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("m", col("sx").cast(DoubleType) / col("n"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), transform(col("dm"), e => e.getField("m")).as("cm"))
      val d2Dbl = aggregate(
        zip_with(col("q"), col("cm"),
          (a, b) => (a.cast(DoubleType) - b) * (a.cast(DoubleType) - b)),
        lit(0.0), (acc, v) => acc + v)
      qv.crossJoin(broadcast(cents1))
        .select(col("vec_id"), col("cid"), d2Dbl.as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"), sum(col("vec_id")).as("sum_vec_id"),
          min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
        .orderBy("cid")
    },
    // E2 product quantization — the memory-side ANN compression: each
    // vector splits into 4×16-dim subvectors, each coded as its nearest of
    // 4 codewords (codebook = vecs 0..3, integer-quantized), and the probe
    // searches in ADC form: distance tables from the probe's EXACT
    // subvectors to every codeword (4×4 ints, broadcast), candidate
    // distance = sum of 4 table lookups. 64 floats become 4 small codes per
    // vector — the 16× scan-byte compression that makes billion-scale ANN
    // serveable; all distances exact integer math, bit-identical on both
    // engines.
    "e31_pq_ann" -> { (s, d) =>
      val qv = load(s, d, "embeddings").select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) * 100).cast(LongType)).as("q"))
      val chunks = qv.select(col("vec_id"), explode(array(
        (0 until 4).map(j => struct(lit(j).as("chunk"),
          slice(col("q"), j * 16 + 1, 16).as("sub"))): _*)).as("cs"))
        .select(col("vec_id"), col("cs.chunk").as("chunk"), col("cs.sub").as("sub"))
      val codebook = chunks.filter(col("vec_id") < 4)
        .select(col("chunk"), col("vec_id").as("code"), col("sub").as("cw"))
      val d2 = aggregate(
        zip_with(col("sub"), col("cw"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
      val w = Window.partitionBy(col("vec_id"), col("chunk"))
        .orderBy(col("d2").asc, col("code").asc)
      val codes = chunks.join(broadcast(codebook), "chunk")
        .select(col("vec_id"), col("chunk"), col("code"), d2.as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("chunk"), col("code"))
      val ptab = chunks.filter(col("vec_id") === 42)
        .select(col("chunk"), col("sub").as("psub"))
        .join(codebook, "chunk")
        .select(col("chunk"), col("code"),
          aggregate(zip_with(col("psub"), col("cw"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, v) => acc + v).as("pd2"))
      codes.join(broadcast(ptab), Seq("chunk", "code"))
        .filter(col("vec_id") =!= 42)
        .groupBy(col("vec_id"))
        .agg(sum(col("pd2")).as("adc_d2"))
        .orderBy(col("adc_d2").asc, col("vec_id").asc)
        .limit(10)
    },
    // E1+E2 — semantic dedup (the SemDeDup recipe): cluster the embedding
    // space (centroids = vecs 0..7, one exact integer-quantized assignment,
    // the e30 round-1 math), then WITHIN each cluster drop every vector
    // whose cosine to a lower-id member is ≥ 0.25 — semantically-redundant
    // documents that text-level MinHash (e03) never pairs. The cluster is
    // the scale move: pairwise work is cluster-local (shuffle on cid), and
    // a real corpus raises k so cluster sizes stay bounded — pairs per
    // cluster ≈ (N/k)², never N². Raise k as √N, not linearly: brute-force
    // assignment costs N·k, so k ∝ N trades the pairwise quadratic for an
    // assignment quadratic (measured — the 1x/3x/10x sizing triple in
    // SCALE.md; k ∝ √N balances both terms at N^1.5, and beyond that the
    // assignment itself gets indexed, the IvfIndex path). Assignment
    // distances are pure integer math; pair cosines are the fixed-fold
    // doubles both engines share.
    "e48_semantic_dedup" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val qv = load(s, d, "embeddings").select(col("vec_id"), col("embedding"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) * 100).cast(LongType)).as("q"))
      val cents = qv.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
      val d2Int = aggregate(
        zip_with(col("q"), col("cq"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, v) => acc + v)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2").asc, col("cid").asc)
      val assigned = qv.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"), d2Int.as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("cid"), col("vec_id"), col("embedding"))
      val a = assigned.select(col("cid"), col("vec_id").as("v1"),
        col("embedding").as("e1"))
      val b = assigned.select(col("cid"), col("vec_id").as("v2"),
        col("embedding").as("e2"))
      val dropped = a.join(b, Seq("cid"))
        .filter(col("v1") < col("v2") &&
          cosine(col("e1"), col("e2")) >= 0.25)
        .select(col("cid"), col("v2")).distinct()
      val mem = assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
      val drc = dropped.groupBy(col("cid")).agg(count(lit(1)).as("n_dropped"))
      mem.join(broadcast(drc), Seq("cid"), "left")
        .select(col("cid"), col("n_members"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_members") - coalesce(col("n_dropped"), lit(0L))).as("n_kept"))
        .orderBy("cid")
    },
    // E2 scale path — int8 symmetric quantization of the embedding column
    // (per-vector max-abs scale, the standard PTQ recipe): 4× less scan
    // bytes and an INTEGER dot product in the hot loop; the float scales
    // re-enter only once per (probe, candidate) to dequantize the score.
    // Ranking is by the integer qdot (probe scale is a shared positive
    // factor; candidate scales vary — qdot is the quantized-space score),
    // all exact integer math, bit-identical across engines.
    "e23_vector_quantize" -> { (s, d) =>
      val emb = load(s, d, "embeddings")
      val sc = array_max(transform(col("embedding"), x => abs(x.cast(DoubleType))))
      val qv = emb.select(col("vec_id"), col("label"), sc.as("scale"),
        transform(col("embedding"),
          x => round(x.cast(DoubleType) * 127 / sc).cast(LongType)).as("q"))
      val probe = qv.filter(col("vec_id") === 0)
        .select(col("q").as("pq"), col("scale").as("pscale"))
      val qdot = aggregate(zip_with(col("q"), col("pq"), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
      qv.filter(col("vec_id") =!= 0).crossJoin(broadcast(probe))
        .select(col("vec_id"), col("label"), qdot.as("qdot"),
          (qdot.cast(DoubleType) * (col("scale") / 127) * (col("pscale") / 127))
            .as("approx_dot"))
        .orderBy(col("qdot").desc, col("vec_id").asc)
        .limit(10)
    },
    // E2-audit — embedding-space density outliers: each point's 3rd-
    // nearest-neighbor cosine within its label block (or its FARTHEST
    // available neighbor when the block has fewer than 4 sampled members
    // — a near-singleton block is the most suspicious case of all and
    // must not vanish from the report); the 15 most isolated points
    // (lowest kNN similarity) are the mislabeled/garbage vector
    // candidates every embedding pipeline reviews. Same audit-slice
    // economics as e58: the pairwise pass runs on the %10 sample
    // (label-blocked, never all-pairs corpus-wide); per-point top-3 is a
    // WindowGroupLimit heap keyed by the point. Cosines come from the
    // fused graft_cosine expression — bit-identical cross-engine, so no
    // rounding is needed anywhere.
    "e61_knn_outliers" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val sm = load(s, d, "embeddings").filter(col("vec_id") % 10 === 0)
      val a = sm.select(col("vec_id").as("v1"), col("label"),
        col("embedding").as("e1"))
      val b = sm.select(col("vec_id").as("v2"), col("label").as("label2"),
        col("embedding").as("e2"))
      val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("v1"))
      val w = wp.orderBy(col("cs").desc, col("v2"))
      a.join(b, col("label") === col("label2") && col("v1") =!= col("v2"))
        .select(col("v1"), col("label"), col("v2"),
          cosine(col("e1"), col("e2")).as("cs"))
        .withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(wp))
        .filter(col("rn") === least(lit(3), col("nn")))
        .select(col("v1").as("vec_id"), col("label"), col("cs").as("knn3_cos"))
        .orderBy(col("knn3_cos").asc, col("vec_id")).limit(15)
    },
    // E2-audit — matryoshka truncation evaluation: how much of the
    // full-dimension (64) cosine top-10 does the 16-dim PREFIX cosine
    // retrieve? The measurement behind MRL-style dimension-truncated
    // serving: if overlap@10 holds, the index can store (and the first
    // probe pass can scan) a quarter of the bytes. Output is ALL-INTEGER
    // (overlap counts + top-1 ids); ranks come from the shared
    // bit-identical cosine fold so no float crosses the engine boundary.
    // Scale: this is the audit form (3 probes × full scan, two ranks per
    // probe); production serving uses the truncated ANN index (e09c) with
    // this query as its periodic honesty check.
    "e85_mrl_overlap" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val probes = emb.filter(col("vec_id").isin(0L, 17L, 42L))
        .select(col("vec_id").as("probe_id"), col("embedding").as("p"))
      val scored = emb.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosine(col("embedding"), col("p")).as("cs_full"),
          cosine(slice(col("embedding"), 1, 16), slice(col("p"), 1, 16))
            .as("cs_pre"))
      val wf = Window.partitionBy(col("probe_id"))
        .orderBy(col("cs_full").desc, col("vec_id"))
      val wp = Window.partitionBy(col("probe_id"))
        .orderBy(col("cs_pre").desc, col("vec_id"))
      scored
        .withColumn("rf", row_number().over(wf))
        .withColumn("rp", row_number().over(wp))
        .groupBy(col("probe_id"))
        .agg(max(when(col("rf") === 1, col("vec_id"))).as("top1_full"),
          max(when(col("rp") === 1, col("vec_id"))).as("top1_prefix"),
          sum(when(col("rf") <= 10 && col("rp") <= 10, 1L).otherwise(0L))
            .as("n_overlap10"))
        .orderBy("probe_id")
    },
    // E2-audit — per-label embedding diversity via the centroid trick:
    // mean pairwise cosine within a label = (‖Σv̂‖² − Σ‖v̂‖²) / n(n−1)
    // over UNIT-normalized vectors — the redundancy/collapse health
    // metric (a label whose mean pairwise similarity approaches 1 is a
    // degenerate cluster; near 0, a diffuse one), computed WITHOUT any
    // pairwise join. Determinism: each normalized component rounds once
    // into DECIMAL(18,9); per-dim sums, their squares, and the per-row
    // norm terms then add EXACTLY (order-free on any partitioning), with
    // one IEEE division at the end. Scale: one explode (64 rows/vector)
    // + two map-side-combined label-keyed aggregates — linear in the
    // corpus where the naive form is quadratic per label.
    "e86_label_diversity" -> { (s, d) =>
      val emb = load(s, d, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      val comps = emb
        .select(col("vec_id"), col("label"), col("nrm"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("label"), col("dim"),
          (col("x").cast(DoubleType) / col("nrm"))
            .cast(DecimalType(18, 9)).as("c"))
      val perDim = comps.groupBy(col("label"), col("dim"))
        .agg(sum(col("c")).as("sd"))
        .groupBy(col("label"))
        .agg(sum((col("sd").cast(DoubleType) * col("sd").cast(DoubleType))
          .cast(DecimalType(28, 9))).as("s1"))
      val perRow = comps.groupBy(col("label"), col("vec_id"))
        .agg(sum((col("c") * col("c")).cast(DecimalType(38, 18))).as("r2"))
        .groupBy(col("label"))
        .agg(sum(col("r2").cast(DecimalType(28, 9))).as("s2"),
          count(lit(1)).as("n"))
      perDim.join(perRow, "label")
        .select(col("label"), col("n"),
          round((col("s1") - col("s2")).cast(DoubleType)
            / (col("n") * (col("n") - 1)).cast(DoubleType), 6)
            .as("mean_pairwise_cos"))
        .orderBy("label")
    },
    // E2/calibration — ANN recall audit: the e58 LSH-honesty gate
    // transplanted to the vector side. For every probe (vec_id % 37 = 1,
    // the AnnRecallSpec sample), exact brute-force cosine top-10 is the
    // truth; the IVF layout (8 seed centroids, argmax-cosine assignment —
    // the e09 family's index) answers the same probes at nprobe ∈ {1,2,4};
    // the report carries per-nprobe candidate volume, hit count, and
    // recall@10 — the measured recall/cost curve the nprobe knob buys,
    // which is what an ANN deployment tunes against instead of trusting
    // the index. Determinism: every ranking orders by the shared
    // bit-identical cosine fold with full (sim, id) tie-breaks, and the
    // reported aggregates are integer counts plus ONE rounded division.
    // Scale: this is the bounded AUDIT form — a sampled probe set × one
    // corpus scan for truth (the e06 broadcast shape), and the sweep
    // re-reads only probed clusters (nprobe/k of the corpus per probe
    // row); production runs it on a sampled slice per corpus snapshot,
    // exactly like the e58/e63 LSH calibration family.
    "e111_ann_recall" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val probes = emb.filter(col("vec_id") % 37 === 1)
        .select(col("vec_id").as("pid"), col("embedding").as("pemb"))
      val wt = Window.partitionBy(col("pid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      val truth = emb.crossJoin(broadcast(probes))
        .filter(col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id"),
          cosine(col("embedding"), col("pemb")).as("sim"))
        .withColumn("rn", row_number().over(wt)).filter(col("rn") <= 10)
        .select(col("pid"), col("vec_id"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
      val wa = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("cid").asc)
      val assigned = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("cid"),
          cosine(col("embedding"), col("cemb")).as("csim"))
        .withColumn("rn", row_number().over(wa)).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("cid"))
      val wp = Window.partitionBy(col("pid"))
        .orderBy(col("csim").desc, col("cid").asc)
      val prank = probes.crossJoin(broadcast(cents))
        .select(col("pid"), col("pemb"), col("cid"),
          cosine(col("pemb"), col("cemb")).as("csim"))
        .withColumn("prank", row_number().over(wp))
        .select(col("pid"), col("pemb"), col("cid"), col("prank"))
      val np = s.range(1)
        .select(explode(array(lit(1), lit(2), lit(4))).as("nprobe"))
      // probe set stays tiny (|probes| × Σnprobe rows), so it broadcasts
      // and the corpus side never shuffles — the e09d economics per sweep
      // point
      val psets = prank.join(broadcast(np), col("prank") <= col("nprobe"))
        .select(col("nprobe"), col("pid"), col("pemb"), col("cid"))
      val cand = assigned.join(broadcast(psets), "cid")
        .filter(col("vec_id") =!= col("pid"))
        .select(col("nprobe"), col("pid"), col("vec_id"),
          cosine(col("embedding"), col("pemb")).as("sim"))
      val wiv = Window.partitionBy(col("nprobe"), col("pid"))
        .orderBy(col("sim").desc, col("vec_id").asc)
      val ivTop = cand.withColumn("rn", row_number().over(wiv))
        .filter(col("rn") <= 10)
        .select(col("nprobe"), col("pid"), col("vec_id"))
      val nCand = cand.groupBy(col("nprobe")).agg(count(lit(1)).as("n_cand_rows"))
      val hits = ivTop.join(truth, Seq("pid", "vec_id"))
        .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
      np.join(broadcast(nCand), Seq("nprobe"), "left")
        .join(broadcast(hits), Seq("nprobe"), "left")
        .crossJoin(broadcast(probes.agg(count(lit(1)).as("n_probes"))))
        .select(col("nprobe").cast(LongType).as("nprobe"), col("n_probes"),
          coalesce(col("n_cand_rows"), lit(0L)).as("n_cand_rows"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast(DoubleType)
            / (col("n_probes") * 10), 6).as("recall_at_10"))
        .orderBy("nprobe")
    },
    // E2/mining — margin-based bitext mining (the Artetxe & Schwenk
    // ratio criterion, the operator behind CCMatrix-class parallel-corpus
    // mining): treating label 1 and label 2 as the two languages, each
    // source vector's best cross-language neighbor is accepted when its
    // cosine stands out from BOTH local neighborhoods —
    // margin(x,y) = 2k·cos(x,y) / (Σ_{z∈NNk(x,Y)} cos(x,z) +
    // Σ_{z∈NNk(y,X)} cos(z,y)) ≥ 1.10, k=4. Plain absolute-threshold
    // mining drowns in hubness (a few "central" vectors are everyone's
    // best match); the margin denominator is exactly the hubness
    // correction. Determinism: cosines snap once to micro-units
    // (round(cos·10⁶) as LONG — one IEEE multiply + one round of the
    // shared bit-identical fold), every neighborhood is row_number-picked
    // with full (c6, id) tie-breaks, neighborhood masses are exact
    // integer sums, and the accept decision is all-integer:
    // 800·c6 ≥ 110·(sx+sy). The reported margin is one IEEE division,
    // rounded. Scale: X×Y is per-language-PAIR work — the production form
    // broadcasts the smaller language (or prunes through the e09 IVF
    // buckets) per pair, never materializing the all-language cross
    // product; both windows partition by one endpoint, so the shuffle is
    // |pairs| rows of 24 bytes, not vectors.
    "e114_bitext_margin" -> { (s, d) =>
      graft.functions.VectorExpressions.register(s)
      val emb = load(s, d, "embeddings")
      val xs = emb.filter(col("label") === 1)
        .select(col("vec_id").as("x_id"), col("embedding").as("xe"))
      val ys = emb.filter(col("label") === 2)
        .select(col("vec_id").as("y_id"), col("embedding").as("ye"))
      val p = xs.crossJoin(broadcast(ys))
        .select(col("x_id"), col("y_id"),
          round(cosine(col("xe"), col("ye")) * 1e6)
            .cast(LongType).as("c6"))
      bitextMargin(p)
    },
    // E2/mining — e114's PRODUCTION form: the identical margin arithmetic
    // routed through the e09 IVF buckets. Every vector of both languages
    // gets the e09 map-side argmax assignment (8 seed centroids, broadcast,
    // deterministic (csim, cid) tie-break); candidate pairs are
    // BUCKET-LOCAL (x and y assigned to the same centroid), generated by
    // broadcasting the smaller language's bucketed side — so the scored
    // set is Σ_c |X_c|·|Y_c| instead of |X|·|Y|, and the margin
    // denominators are the NN-4 masses WITHIN the surfaced candidates
    // (the standard IVF approximation: far neighborhoods contribute ~0 to
    // the hubness mass). Same integer accept rule as e114; the oracle twin
    // recomputes the identical restricted candidate set, so the gate tests
    // the bucketed pipeline itself, not a lossy "subset of e114" claim —
    // the dense-vs-bucketed pairing the Jaccard family has in e04/e04b.
    // Scale: with k centroids the scored set is ~N²/k; operated at the
    // e48 discipline (k ∝ √N, the ScaleProbe e114b_k_sqrt curve) total
    // work rides N^1.5 where e114 is N² — and each language pair stays an
    // independent broadcast-pruned unit.
    "e114b_bitext_bucketed" -> { (s, d) => e114Bucketed(8)(s, d) }
  )

  /** Shared margin arithmetic of e114/e114b over a scored candidate frame
    * (x_id, y_id, c6): Artetxe & Schwenk ratio margin with k=4
    * neighborhood masses, all-integer accept (800·c6 ≥ 110·(sx+sy)),
    * reported cosine/margin as the final rounded divisions. */
  private def bitextMargin(p: DataFrame): DataFrame = {
    val wx = Window.partitionBy(col("x_id"))
      .orderBy(col("c6").desc, col("y_id").asc)
    val wy = Window.partitionBy(col("y_id"))
      .orderBy(col("c6").desc, col("x_id").asc)
    val r = p.withColumn("rx", row_number().over(wx))
      .withColumn("ry", row_number().over(wy))
      .localCheckpoint() // one scoring pass feeds fwd best + both NN masses
    val sx = r.filter(col("rx") <= 4).groupBy(col("x_id"))
      .agg(sum(col("c6")).as("sx"))
    val sy = r.filter(col("ry") <= 4).groupBy(col("y_id"))
      .agg(sum(col("c6")).as("sy"))
    r.filter(col("rx") === 1)
      .join(sx, "x_id").join(sy, "y_id")
      .filter(lit(800L) * col("c6") >= lit(110L) * (col("sx") + col("sy")))
      .select(col("x_id"), col("y_id"),
        round(col("c6").cast(DoubleType) / 1e6, 6).as("cos_sim"),
        round((lit(8L) * col("c6")).cast(DoubleType)
          / (col("sx") + col("sy")).cast(DoubleType), 6).as("margin"))
      .orderBy("x_id")
  }

  /** e114b with a parameterized centroid count — the ScaleProbe dial that
    * shows the √N sizing turning the bitext miner subquadratic (seeds
    * vec_id < k are replica-0 ids, present at every probe scale). */
  private[graft] def e114Bucketed(k: Int)(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val emb = load(s, d, "embeddings")
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cid").asc)
    val assigned = emb.filter(col("label").isin(1, 2))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cemb")).as("csim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"))
    val xs = assigned.filter(col("label") === 1)
      .select(col("cid"), col("vec_id").as("x_id"), col("embedding").as("xe"))
    val ys = assigned.filter(col("label") === 2)
      .select(col("cid"), col("vec_id").as("y_id"), col("embedding").as("ye"))
    // bucket-local candidates: the SMALLER language broadcasts (measured
    // on the raw table — one grouped count, control-plane — not assumed
    // from the label: broadcasting a fixed side would OOM whenever that
    // label happens to be the larger corpus), and the larger side never
    // shuffles — the per-language-pair economics the e114 comment names
    // as the production path. Output is label-oriented (x = label 1)
    // either way.
    val sizes = emb.filter(col("label").isin(1, 2))
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Number]("label").intValue ->
        r.getLong(r.fieldIndex("n"))).toMap
    val joined =
      if (sizes.getOrElse(2, 0L) <= sizes.getOrElse(1, 0L))
        xs.join(broadcast(ys), "cid")
      else ys.join(broadcast(xs), "cid")
    val p = joined.select(col("x_id"), col("y_id"),
      round(cosine(col("xe"), col("ye")) * 1e6).cast(LongType).as("c6"))
    bitextMargin(p)
  }

  val oracleSql: Map[String, String] = Map(
    // both rankers re-derived verbatim (e40's shared BM25 CTE + e06's
    // cosine fold); the RRF reciprocals round through DECIMAL(28,12) so
    // the fusion sum is order-free and bit-identical
    "e76_hybrid_rrf" ->
      s"""WITH ${graft.Extensions.bm25ScoresSql},
         |lexr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS lex_rank
         |         FROM bm25),
         |lex AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= 20),
         |probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
         |dcos AS (SELECT vec_id AS doc_id, ${cosSql("embedding", "p")} AS cs
         |         FROM embeddings, probe WHERE vec_id <> 0),
         |denser AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cs DESC, doc_id) AS dense_rank
         |           FROM dcos),
         |dense AS (SELECT doc_id, dense_rank FROM denser WHERE dense_rank <= 20)
         |SELECT coalesce(lex.doc_id, dense.doc_id) AS doc_id,
         |  lex.lex_rank, dense.dense_rank,
         |  CAST(coalesce(CAST(1.0::DOUBLE / (lex.lex_rank + 60.0) AS DECIMAL(28,12)),
         |                0::DECIMAL(28,12))
         |     + coalesce(CAST(1.0::DOUBLE / (dense.dense_rank + 60.0) AS DECIMAL(28,12)),
         |                0::DECIMAL(28,12)) AS DOUBLE) AS rrf
         |FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    "e06_cosine_topk" ->
      s"""WITH probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${cosSql("embedding", "p")} AS cos_sim
         |FROM embeddings, probe WHERE vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "e37_hard_negatives" ->
      s"""WITH probe AS (SELECT embedding AS p, label AS pl FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, ${cosSql("embedding", "p")} AS cos_sim
         |FROM embeddings, probe WHERE label <> pl
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "e07_cosine_selfjoin" ->
      s"""WITH sm AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0)
         |SELECT a.label AS label, a.vec_id AS v1, b.vec_id AS v2,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos_sim
         |FROM sm a JOIN sm b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} > 0.2
         |ORDER BY label, v1, v2""".stripMargin,
    "e08_embedding_neardup" ->
      s"""WITH sm AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0),
         |p AS (SELECT a.label AS label, ${cosSql("a.embedding", "b.embedding")} AS cs
         |      FROM sm a JOIN sm b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT label, COUNT(*) AS n_pairs,
         |  SUM(CASE WHEN cs > 0.25 THEN 1 ELSE 0 END)::BIGINT AS n_neardup,
         |  MAX(cs) AS max_cos
         |FROM p GROUP BY label ORDER BY label""".stripMargin,
    "e09b_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |probe AS (SELECT bucket AS probe_bucket, embedding AS probe_emb FROM b WHERE vec_id = 42)
         |SELECT vec_id, bucket, ${cosSql("embedding", "probe_emb")} AS cos_sim
         |FROM b JOIN probe ON bucket = probe_bucket
         |WHERE vec_id <> 42
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin,
    "e09c_ann_ivf_partitioned" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
         |sims AS (SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cemb")} AS csim
         |  FROM embeddings e, cents c),
         |assigned AS (SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |    FROM sims) WHERE rn = 1),
         |probe AS (SELECT cid AS probe_cid, embedding AS probe_emb FROM assigned WHERE vec_id = 42)
         |SELECT a.vec_id, CAST(a.cid AS INT) AS cid, ${cosSql("a.embedding", "probe_emb")} AS cos_sim
         |FROM assigned a JOIN probe ON a.cid = probe_cid
         |WHERE a.vec_id <> 42
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin,
    "e09_ann_ivf" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
         |sims AS (SELECT e.vec_id, e.label, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cemb")} AS csim
         |  FROM embeddings e, cents c),
         |assigned AS (SELECT vec_id, label, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |    FROM sims) WHERE rn = 1),
         |probe AS (SELECT cid AS probe_cid, embedding AS probe_emb FROM assigned WHERE vec_id = 42)
         |SELECT a.vec_id, a.cid, ${cosSql("a.embedding", "probe_emb")} AS cos_sim
         |FROM assigned a JOIN probe ON a.cid = probe_cid
         |WHERE a.vec_id <> 42
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin,
    "e09d_ann_multiprobe" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
         |sims AS (SELECT e.vec_id, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cemb")} AS csim
         |  FROM embeddings e, cents c),
         |assigned AS (SELECT vec_id, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |    FROM sims) WHERE rn = 1),
         |pv AS (SELECT embedding AS probe_emb FROM embeddings WHERE vec_id = 42),
         |pc AS (SELECT cid, probe_emb FROM (
         |    SELECT c.cid, p.probe_emb,
         |      ROW_NUMBER() OVER (ORDER BY ${cosSql("p.probe_emb", "c.cemb")} DESC, c.cid ASC) AS rn
         |    FROM cents c, pv p) WHERE rn <= 2)
         |SELECT a.vec_id, a.cid, ${cosSql("a.embedding", "probe_emb")} AS cos_sim
         |FROM assigned a JOIN pc ON a.cid = pc.cid
         |WHERE a.vec_id <> 42
         |ORDER BY cos_sim DESC, vec_id ASC LIMIT 5""".stripMargin,
    "e30_kmeans" -> {
      val di = "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 64), i -> (v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i]))), (acc, x) -> acc + x)"
      val dd = "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 64), i -> (v.q[i]::DOUBLE - c.cm[i]) * (v.q[i]::DOUBLE - c.cm[i]))), (acc, x) -> acc + x)"
      s"""WITH qv AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(x::DOUBLE * 100) AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < 8),
         |a1 AS (SELECT vec_id, q, cid FROM (
         |    SELECT v.vec_id, v.q, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY $di ASC, c.cid ASC) AS rn
         |    FROM qv v, c0 c) WHERE rn = 1),
         |cm AS (SELECT cid, list(m ORDER BY dim) AS cm FROM (
         |    SELECT cid, dim, SUM(x)::DOUBLE / COUNT(*) AS m FROM (
         |      SELECT cid, unnest(generate_series(1, len(q))) AS dim, unnest(q) AS x FROM a1)
         |    GROUP BY cid, dim) GROUP BY cid),
         |a2 AS (SELECT vec_id, cid, d2 FROM (
         |    SELECT v.vec_id, c.cid, $dd AS d2,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY $dd ASC, c.cid ASC) AS rn
         |    FROM qv v, cm c) WHERE rn = 1)
         |SELECT cid, COUNT(*)::BIGINT AS n_members, SUM(vec_id)::BIGINT AS sum_vec_id,
         |  MIN(d2) AS min_d2, MAX(d2) AS max_d2
         |FROM a2 GROUP BY cid ORDER BY cid""".stripMargin
    },
    "e31_pq_ann" -> {
      val dc = "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 16), i -> (c.sub[i] - b.cw[i]) * (c.sub[i] - b.cw[i]))), (acc, x) -> acc + x)"
      val dp = "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 16), i -> (p.sub[i] - b.cw[i]) * (p.sub[i] - b.cw[i]))), (acc, x) -> acc + x)"
      s"""WITH qv AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(x::DOUBLE * 100) AS BIGINT)) AS q
         |  FROM embeddings),
         |ch AS (SELECT vec_id, chunk, q[chunk * 16 + 1 : chunk * 16 + 16] AS sub
         |  FROM qv, (SELECT unnest(generate_series(0, 3)) AS chunk)),
         |cb AS (SELECT chunk, vec_id AS code, sub AS cw FROM ch WHERE vec_id < 4),
         |codes AS (SELECT vec_id, chunk, code FROM (
         |    SELECT c.vec_id, c.chunk, b.code,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, c.chunk ORDER BY $dc ASC, b.code ASC) AS rn
         |    FROM ch c JOIN cb b USING (chunk)) WHERE rn = 1),
         |ptab AS (SELECT b.chunk, b.code, $dp AS pd2
         |  FROM (SELECT chunk, sub FROM ch WHERE vec_id = 42) p JOIN cb b USING (chunk))
         |SELECT vec_id, SUM(pd2)::BIGINT AS adc_d2
         |FROM codes JOIN ptab USING (chunk, code)
         |WHERE vec_id <> 42
         |GROUP BY vec_id ORDER BY adc_d2 ASC, vec_id ASC LIMIT 10""".stripMargin
    },
    "e48_semantic_dedup" -> {
      val di = "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 64), i -> (v.q[i] - c.cq[i]) * (v.q[i] - c.cq[i]))), (acc, x) -> acc + x)"
      s"""WITH qv AS (SELECT vec_id, embedding,
         |    list_transform(embedding, x -> CAST(round(x::DOUBLE * 100) AS BIGINT)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, q AS cq FROM qv WHERE vec_id < 8),
         |a1 AS (SELECT cid, vec_id, embedding FROM (
         |    SELECT v.vec_id, v.embedding, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY $di ASC, c.cid ASC) AS rn
         |    FROM qv v, c0 c) WHERE rn = 1),
         |dr AS (SELECT DISTINCT a.cid, b.vec_id AS v2
         |       FROM a1 a JOIN a1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |       WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.25),
         |mem AS (SELECT cid, count(*) AS n_members FROM a1 GROUP BY cid),
         |drc AS (SELECT cid, count(*) AS n_dropped FROM dr GROUP BY cid)
         |SELECT mem.cid, n_members, coalesce(n_dropped, 0) AS n_dropped,
         |  n_members - coalesce(n_dropped, 0) AS n_kept
         |FROM mem LEFT JOIN drc USING (cid) ORDER BY cid""".stripMargin
    },
    "e23_vector_quantize" -> {
      val qdotSql =
        "list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, 64), i -> q[i] * pq[i])), (acc, v) -> acc + v)"
      s"""WITH qv AS (
         |  SELECT vec_id, label,
         |    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale,
         |    list_transform(embedding, x -> CAST(round(x::DOUBLE * 127
         |      / list_max(list_transform(embedding, y -> abs(y::DOUBLE)))) AS BIGINT)) AS q
         |  FROM embeddings),
         |probe AS (SELECT q AS pq, scale AS pscale FROM qv WHERE vec_id = 0)
         |SELECT vec_id, label,
         |  $qdotSql AS qdot,
         |  ($qdotSql)::DOUBLE * (scale / 127) * (pscale / 127) AS approx_dot
         |FROM qv, probe WHERE vec_id <> 0
         |ORDER BY qdot DESC, vec_id ASC LIMIT 10""".stripMargin
    },
    "e61_knn_outliers" ->
      s"""WITH sm AS (SELECT vec_id, label, embedding FROM embeddings
         |            WHERE vec_id % 10 = 0),
         |p AS (SELECT a.vec_id AS v1, a.label, b.vec_id AS v2,
         |        ${cosSql("a.embedding", "b.embedding")} AS cs
         |      FROM sm a JOIN sm b
         |        ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
         |        ORDER BY cs DESC, v2) AS rn,
         |        COUNT(*) OVER (PARTITION BY v1) AS nn FROM p)
         |SELECT v1 AS vec_id, label, cs AS knn3_cos FROM r
         |WHERE rn = least(3, nn)
         |ORDER BY knn3_cos ASC, vec_id LIMIT 15""".stripMargin,
    // 16-dim prefix cosine re-derived with the same ascending fold the
    // sliced graft_cosine uses — bit-identical ranks, all-integer output
    "e85_mrl_overlap" -> {
      def dotN(a: String, b: String, n: Int): String =
        s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(" +
          s"generate_series(1, $n), i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE))," +
          s" (acc, v) -> acc + v)"
      def cosN(a: String, b: String, n: Int): String =
        s"(${dotN(a, b, n)} / (sqrt(${dotN(a, a, n)}) * sqrt(${dotN(b, b, n)})))"
      s"""WITH pr AS (SELECT vec_id AS probe_id, embedding AS p
         |            FROM embeddings WHERE vec_id IN (0, 17, 42)),
         |s AS (SELECT probe_id, e.vec_id,
         |        ${cosN("e.embedding", "p", 64)} AS cs_full,
         |        ${cosN("e.embedding", "p", 16)} AS cs_pre
         |      FROM embeddings e, pr WHERE e.vec_id <> probe_id),
         |r AS (SELECT *,
         |        ROW_NUMBER() OVER (PARTITION BY probe_id
         |          ORDER BY cs_full DESC, vec_id) AS rf,
         |        ROW_NUMBER() OVER (PARTITION BY probe_id
         |          ORDER BY cs_pre DESC, vec_id) AS rp FROM s)
         |SELECT probe_id,
         |  max(CASE WHEN rf = 1 THEN vec_id END) AS top1_full,
         |  max(CASE WHEN rp = 1 THEN vec_id END) AS top1_prefix,
         |  sum(CASE WHEN rf <= 10 AND rp <= 10 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_overlap10
         |FROM r GROUP BY probe_id ORDER BY probe_id""".stripMargin
    },
    // the same centroid-trick algebra in exact decimals: per-component
    // normalized values round ONCE into DECIMAL(18,9), every later sum is
    // exact and order-free, one IEEE division at the end
    "e86_label_diversity" ->
      s"""WITH e AS (SELECT vec_id, label, embedding,
         |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings),
         |c AS (SELECT vec_id, label, i.i AS dim,
         |        CAST(embedding[i.i]::DOUBLE / nrm AS DECIMAL(18,9)) AS c
         |      FROM e, UNNEST(generate_series(1, 64)) AS i(i)),
         |pd AS (SELECT label, dim, sum(c) AS sd FROM c GROUP BY label, dim),
         |s1 AS (SELECT label,
         |         sum(CAST(sd::DOUBLE * sd::DOUBLE AS DECIMAL(28,9))) AS s1
         |       FROM pd GROUP BY label),
         |pr AS (SELECT label, vec_id, sum(CAST(c * c AS DECIMAL(38,18))) AS r2
         |       FROM c GROUP BY label, vec_id),
         |s2 AS (SELECT label, sum(CAST(r2 AS DECIMAL(28,9))) AS s2,
         |         count(*) AS n FROM pr GROUP BY label)
         |SELECT s1.label, n,
         |  round((s1.s1 - s2.s2)::DOUBLE / (n * (n - 1))::DOUBLE, 6)
         |    AS mean_pairwise_cos
         |FROM s1 JOIN s2 USING (label) ORDER BY s1.label""".stripMargin,
    // identical pipeline in SQL: same probes, same seed centroids, same
    // cosine fold, same (sim, id) tie-breaks — the recall aggregate is
    // integer counts plus one rounded division
    "e111_ann_recall" ->
      s"""WITH probes AS (SELECT vec_id AS pid, embedding AS pemb
         |                FROM embeddings WHERE vec_id % 37 = 1),
         |tr AS (SELECT pid, vec_id FROM (
         |    SELECT p.pid, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY p.pid
         |        ORDER BY ${cosSql("e.embedding", "p.pemb")} DESC, e.vec_id ASC) AS rn
         |    FROM embeddings e, probes p WHERE e.vec_id <> p.pid) WHERE rn <= 10),
         |cents AS (SELECT vec_id AS cid, embedding AS cemb
         |          FROM embeddings WHERE vec_id < 8),
         |assigned AS (SELECT vec_id, embedding, cid FROM (
         |    SELECT e.vec_id, e.embedding, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cemb")} DESC, c.cid ASC) AS rn
         |    FROM embeddings e, cents c) WHERE rn = 1),
         |prank AS (SELECT pid, pemb, cid,
         |    ROW_NUMBER() OVER (PARTITION BY pid
         |      ORDER BY ${cosSql("p.pemb", "c.cemb")} DESC, c.cid ASC) AS prank
         |  FROM probes p, cents c),
         |np AS (SELECT * FROM (VALUES (1), (2), (4)) AS t(nprobe)),
         |psets AS (SELECT n.nprobe, k.pid, k.pemb, k.cid
         |          FROM prank k JOIN np n ON k.prank <= n.nprobe),
         |cand AS (SELECT ps.nprobe, ps.pid, a.vec_id,
         |    ${cosSql("a.embedding", "ps.pemb")} AS sim
         |  FROM assigned a JOIN psets ps ON a.cid = ps.cid
         |  WHERE a.vec_id <> ps.pid),
         |ivtop AS (SELECT nprobe, pid, vec_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY nprobe, pid
         |      ORDER BY sim DESC, vec_id ASC) AS rn FROM cand) WHERE rn <= 10),
         |ncand AS (SELECT nprobe, COUNT(*) AS n_cand_rows FROM cand GROUP BY nprobe),
         |hits AS (SELECT i.nprobe, COUNT(*) AS n_hits FROM ivtop i
         |         JOIN tr t ON t.pid = i.pid AND t.vec_id = i.vec_id
         |         GROUP BY i.nprobe),
         |nprb AS (SELECT COUNT(*) AS n_probes FROM probes)
         |SELECT np.nprobe::BIGINT AS nprobe, nprb.n_probes::BIGINT AS n_probes,
         |  COALESCE(ncand.n_cand_rows, 0)::BIGINT AS n_cand_rows,
         |  COALESCE(hits.n_hits, 0)::BIGINT AS n_hits,
         |  ROUND(COALESCE(hits.n_hits, 0)::DOUBLE / (nprb.n_probes * 10), 6)
         |    AS recall_at_10
         |FROM np CROSS JOIN nprb
         |LEFT JOIN ncand ON ncand.nprobe = np.nprobe
         |LEFT JOIN hits ON hits.nprobe = np.nprobe
         |ORDER BY np.nprobe""".stripMargin,
    // identical pipeline in SQL: same micro-unit cosine snap, same
    // (c6, id) tie-broken neighborhoods, same all-integer accept
    "e114_bitext_margin" ->
      s"""WITH x AS (SELECT vec_id AS x_id, embedding AS xe FROM embeddings WHERE label = 1),
         |y AS (SELECT vec_id AS y_id, embedding AS ye FROM embeddings WHERE label = 2),
         |p AS (SELECT x_id, y_id,
         |        CAST(round(${cosSql("xe", "ye")} * 1e6, 0) AS BIGINT) AS c6
         |      FROM x, y),
         |r AS (SELECT *,
         |        ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY c6 DESC, y_id ASC) AS rx,
         |        ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY c6 DESC, x_id ASC) AS ry
         |      FROM p),
         |sx AS (SELECT x_id, SUM(c6) AS sx FROM r WHERE rx <= 4 GROUP BY x_id),
         |sy AS (SELECT y_id, SUM(c6) AS sy FROM r WHERE ry <= 4 GROUP BY y_id)
         |SELECT r.x_id, r.y_id,
         |  round(c6 / 1000000.0, 6) AS cos_sim,
         |  round((8 * c6)::DOUBLE / (sx + sy)::DOUBLE, 6) AS margin
         |FROM r JOIN sx USING (x_id) JOIN sy USING (y_id)
         |WHERE rx = 1 AND 800 * c6 >= 110 * (sx + sy)
         |ORDER BY r.x_id""".stripMargin,
    // identical restricted pipeline: e09's argmax bucket assignment over
    // both languages, bucket-local candidate products, then the same
    // margin CTEs as e114 over the surfaced set only
    "e114b_bitext_bucketed" ->
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
         |sims AS (SELECT e.vec_id, e.label, e.embedding, c.cid,
         |    ${cosSql("e.embedding", "c.cemb")} AS csim
         |  FROM embeddings e, cents c WHERE e.label IN (1, 2)),
         |assigned AS (SELECT vec_id, label, embedding, cid FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
         |    FROM sims) WHERE rn = 1),
         |x AS (SELECT cid, vec_id AS x_id, embedding AS xe FROM assigned WHERE label = 1),
         |y AS (SELECT cid, vec_id AS y_id, embedding AS ye FROM assigned WHERE label = 2),
         |p AS (SELECT x_id, y_id,
         |        CAST(round(${cosSql("xe", "ye")} * 1e6, 0) AS BIGINT) AS c6
         |      FROM x JOIN y USING (cid)),
         |r AS (SELECT *,
         |        ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY c6 DESC, y_id ASC) AS rx,
         |        ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY c6 DESC, x_id ASC) AS ry
         |      FROM p),
         |sx AS (SELECT x_id, SUM(c6) AS sx FROM r WHERE rx <= 4 GROUP BY x_id),
         |sy AS (SELECT y_id, SUM(c6) AS sy FROM r WHERE ry <= 4 GROUP BY y_id)
         |SELECT r.x_id, r.y_id,
         |  round(c6 / 1000000.0, 6) AS cos_sim,
         |  round((8 * c6)::DOUBLE / (sx + sy)::DOUBLE, 6) AS margin
         |FROM r JOIN sx USING (x_id) JOIN sy USING (y_id)
         |WHERE rx = 1 AND 800 * c6 >= 110 * (sx + sy)
         |ORDER BY r.x_id""".stripMargin
  )
}
