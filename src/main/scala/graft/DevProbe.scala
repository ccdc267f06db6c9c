package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage decomposition probe for optimization work: times named
  * sub-stages of hot queries (noop-materialized) so wall-clock attributes to
  * stages instead of whole queries. Not part of the driver contract. */
object DevProbe {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Counts Spark jobs/stages/tasks launched inside a block — tells a
    * many-tiny-jobs overhead profile apart from a genuinely expensive one. */
  private final class Counter extends org.apache.spark.scheduler.SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
    override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
    }
  }
  private def counted[A](spark: SparkSession, name: String)(f: => A): A = {
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    val r = t(name)(f)
    // listener bus is async; give it a beat to drain before reading
    Thread.sleep(300)
    spark.sparkContext.removeSparkListener(c)
    println(s"[probe]   jobs=${c.jobs.get} stages=${c.stages.get} tasks=${c.tasks.get}")
    r
  }
  private def mat(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "e113"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_MIN_PART_SIZE", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the codepath once end-to-end at the smallest SF
    val warm = "/root/testdata/sf0.001"
    what match {
      case "e113" =>
        mat(SparkEntry.queries("e113_leakage_safe_split")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          val sh = t("shingleSets3+ckpt") {
            Extensions.shingleSets3(spark, d).localCheckpoint()
          }
          val verified = t("exactShinglePairs+ckpt") {
            Extensions.exactShinglePairs(spark, sh).localCheckpoint()
          }
          t("CC.run") {
            val (comp, rounds) = operators.ConnectedComponents.run(
              Tables.load(spark, d, "documents")
                .select(col("doc_id").as("node")), verified)
            mat(comp)
            println(s"[probe]   rounds=$rounds verified=${verified.count()}")
          }
          t("full e113") {
            mat(SparkEntry.queries("e113_leakage_safe_split")(spark, d))
          }
          t("full e113b") {
            mat(SparkEntry.queries("e113b_leakage_split_lsh")(spark, d))
          }
          t("full e113c") {
            mat(SparkEntry.queries("e113c_lsh_recall")(spark, d))
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "e21" =>
        mat(SparkEntry.queries("e21_dedup_components")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          t("full e21") {
            mat(SparkEntry.queries("e21_dedup_components")(spark, d))
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "e55x" =>
        import org.apache.spark.sql.types.{IntegerType, LongType}
        mat(SparkEntry.queries("e55_jaccard_prefix")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          val base = t("base+ckpt") {
            Tables.load(spark, d, "documents")
              .filter(col("doc_id") % 2 === 0)
              .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
              .filter(size(col("tk")) >= 2)
              .select(col("doc_id"), col("lang"),
                array_distinct(transform(sequence(lit(0), size(col("tk")) - 2),
                  j => (Extensions.tokenHash(concat(element_at(col("tk"), j + 1), lit(" "),
                    element_at(col("tk"), j + 2))) - lit(2147483648L))
                    .cast(IntegerType))).as("bg"))
              .localCheckpoint()
          }
          val post = base.select(col("doc_id"), col("lang"), explode(col("bg")).as("h"))
          val dfc = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
          val pre = post.join(dfc, "h")
            .groupBy(col("doc_id"), col("lang"))
            .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("srt"))
            .select(col("doc_id"), col("lang"),
              explode(expr("slice(transform(srt, x -> x.h), 1," +
                " size(srt) - cast(ceil(0.5 * size(srt)) as int) + 1)")).as("h"))
          val cand = t("cand+ckpt") {
            pre.as("x").join(pre.as("y"),
                col("x.lang") === col("y.lang") && col("x.h") === col("y.h") &&
                  col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
              .localCheckpoint()
          }
          println(s"[probe]   cand=${cand.count()}")
          val sizes = base.select(col("doc_id"), size(col("bg")).as("n"))
          val candF = t("candF+ckpt") {
            cand
              .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
              .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
              .filter(col("n1") * 2 >= col("n2") && col("n2") * 2 >= col("n1"))
              .localCheckpoint()
          }
          val s1 = base.select(col("doc_id").as("d1"), col("lang"), col("bg").as("bg1"))
          val s2 = base.select(col("doc_id").as("d2"), col("bg").as("bg2"))
          t("verify") {
            mat(candF.join(s1, "d1").repartition(32, col("d2")).join(s2, "d2")
              .withColumn("n_common", functions.SealedEval.seal(
                size(array_intersect(col("bg1"), col("bg2")))))
              .withColumn("jaccard", col("n_common").cast("double")
                / (col("n1") + col("n2") - col("n_common")))
              .filter(col("jaccard") >= 0.5)
              .select("lang", "d1", "d2", "jaccard")
              .orderBy("lang", "d1", "d2"))
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "e113bx" =>
        mat(SparkEntry.queries("e113b_leakage_split_lsh")(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          println(s"--- pass $i ---")
          val sets = counted(spark, "sets+ckpt") {
            Extensions.shingleSets3(spark, d).localCheckpoint()
          }
          val verified = counted(spark, "lshVerifiedPairs+ckpt") {
            Extensions.lshVerifiedPairs(sets).localCheckpoint()
          }
          counted(spark, "CC+report") {
            val (comp, rounds) = operators.ConnectedComponents.run(
              Tables.load(spark, d, "documents")
                .select(col("doc_id").as("node")), verified)
            mat(comp)
            println(s"[probe]   rounds=$rounds")
          }
          spark.catalog.clearCache()
          System.gc()
        }
      case "e113cAB" =>
        // Alternating same-JVM A/B: sequential vs overlapped (two driver
        // threads) materialization of e113c's independent pair stages —
        // eliminates host drift between variants.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        mat(SparkEntry.queries("e113c_lsh_recall")(spark, warm))
        spark.catalog.clearCache()
        (1 to 3).foreach { i =>
          t(s"seq pass$i") {
            val sets = Extensions.shingleSets3(spark, d).localCheckpoint()
            val e1 = Extensions.exactShinglePairs(spark, sets).localCheckpoint()
            val e2 = Extensions.lshVerifiedPairs(sets).localCheckpoint()
            println(s"[probe]   n=${e1.count()}/${e2.count()}")
          }
          spark.catalog.clearCache(); System.gc()
          t(s"par pass$i") {
            val sets = Extensions.shingleSets3(spark, d).localCheckpoint()
            val f1 = Future(Extensions.exactShinglePairs(spark, sets).localCheckpoint())
            val f2 = Future(Extensions.lshVerifiedPairs(sets).localCheckpoint())
            val e1 = Await.result(f1, Duration.Inf)
            val e2 = Await.result(f2, Duration.Inf)
            println(s"[probe]   n=${e1.count()}/${e2.count()}")
          }
          spark.catalog.clearCache(); System.gc()
        }
      case "hash" =>
        // md5-hex-conv chain vs raw xxhash64 on the same token stream:
        // how much of the shingle builds is the cross-engine hash itself
        val tok = Tables.load(spark, d, "documents")
          .select(explode(split(col("text"), " ")).as("t"))
          .localCheckpoint()
        println(s"[probe] tokens=${tok.count()}")
        (1 to 3).foreach { i =>
          t(s"md5-conv chain p$i") {
            mat(tok.select(conv(substring(md5(col("t")), 1, 8), 16, 10)
              .cast("long").as("h")).agg(sum(pmod(col("h"), lit(1000000007L)))))
          }
          t(s"xxhash64 p$i") {
            mat(tok.select(xxhash64(col("t")).as("h")).agg(sum(pmod(col("h"), lit(1000000007L)))))
          }
        }
      case q =>
        mat(SparkEntry.queries(q)(spark, warm))
        spark.catalog.clearCache()
        (1 to 2).foreach { i =>
          counted(spark, s"full $q pass$i") { mat(SparkEntry.queries(q)(spark, d)) }
          spark.catalog.clearCache()
          System.gc()
        }
    }
    spark.stop()
  }
}
