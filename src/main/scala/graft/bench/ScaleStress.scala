package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScaleStress {
  def t[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STRESS $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")

    // 10x duplicate-heavy corpus, staged as a documents.parquet dir so the
    // real q35 runs unmodified against it
    val dir = "/tmp/stress_sf"
    (0 until 10).map(k => docs.withColumn("doc_id", col("doc_id") + lit(k * 1000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    t("q35 on 50k docs, 10 exact copies each") {
      println("  pairs=" + graft.SparkEntry.queries("q35_jaccard_pairs")(spark, dir).count())
    }
    t("q35 on the plain 5k-doc corpus") {
      println("  pairs=" + graft.SparkEntry.queries("q35_jaccard_pairs")(spark, "/root/testdata/sf0.1").count())
    }
    t("q36 LSH on 50k docs, 10 exact copies each") {
      println("  pairs=" + graft.SparkEntry.queries("q36_minhash_lsh")(spark, dir).count())
    }
    t("q36 LSH on the plain 5k-doc corpus") {
      println("  pairs=" + graft.SparkEntry.queries("q36_minhash_lsh")(spark, "/root/testdata/sf0.1").count())
    }

    // hot-shingle skew: every doc gets the same viral preamble prepended, so
    // its shingles occur in ALL 5k docs — the worst case for the shared-
    // shingle candidate join (a naive plan quadratically explodes on the hot
    // keys; AQE skew-split plus the per-doc-distinct fanout cap must hold it
    // to output-proportional work)
    val skewDir = "/tmp/stress_skew"
    docs.withColumn("text",
      concat(lit("breaking update please share this post now "), col("text")))
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    t("q35 on 5k docs sharing a viral preamble (hot shingles)") {
      println("  pairs=" + graft.SparkEntry.queries("q35_jaccard_pairs")(spark, skewDir).count())
    }

    // block-partitioned exact cosine (q38): inherent O(n²) kernel work must
    // grow with the PAIR count (4x rows -> 16x pairs) while per-task memory
    // stays two row-blocks and the driver materializes nothing — the scaling
    // evidence for the no-collect rewrite (a driver-broadcast plan hits its
    // memory ceiling here instead)
    val vecDir = "/tmp/stress_vec"
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    (0 until 4).map(k => emb.withColumn("vec_id", col("vec_id") + lit(k * 1000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$vecDir/embeddings.parquet")
    t("q38 exact cosine, 2k vectors (baseline)") {
      println("  pairs=" + graft.SparkEntry.queries("q38_cosine_neardup")(spark, "/root/testdata/sf0.1").count())
    }
    t("q38 exact cosine, 8k vectors (16x pair work)") {
      println("  pairs=" + graft.SparkEntry.queries("q38_cosine_neardup")(spark, vecDir).count())
    }
    spark.stop()
  }
}
