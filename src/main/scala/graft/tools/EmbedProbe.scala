package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: where does dd_embed_near spend its seconds? Times each
  * sub-frame of the query independently (noop-materialized).
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("embed-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"EMBEDPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
      val planted = {
        val asDouble = transform(col("embedding"), x => x.cast("double"))
        val perturbed = transform(col("embedding"), (x, i) =>
          x.cast("double") +
            (pmod(col("vec_id") * 31 + (i + lit(1)), lit(11)) - 5) / lit(1000.0))
        e.select(col("vec_id"), asDouble.as("embedding"))
          .unionAll(e.select(col("vec_id"), perturbed.as("embedding"))
            .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      }
      val p = time("planted.localCheckpoint")(planted.localCheckpoint(true))
      val bucketed = p.select(col("vec_id"),
        posexplode(Similarity.hyperplaneBuckets(col("embedding"), 6, 8)))
        .toDF("vec_id", "tbl", "bucket")
      time("bucketed.noop")(noop(bucketed))
      val cand = time("boundedSelfJoinPairs construct+tiers")(
        Dedup.boundedSelfJoinPairs(bucketed, Seq("tbl", "bucket"), "vec_id",
          Dedup.BlockBounds(megaCap = Int.MaxValue)).toDF("id_a", "id_b"))
      time("cand.noop")(noop(cand))
      val vecs = p.select(col("vec_id"), col("embedding"))
      val verified = cand
        .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
        .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          Similarity.cosineQuantized(col("e_a"), col("e_b")).as("cosine"))
        .filter(col("cosine") >= 0.95)
      val candM = cand.localCheckpoint(true)
      println("EMBEDPROBE cand rows=" + candM.count())
      val joined = candM
        .join(vecs.select(col("vec_id").as("id_a"), col("embedding").as("e_a")), "id_a")
        .join(vecs.select(col("vec_id").as("id_b"), col("embedding").as("e_b")), "id_b")
      time("join-only.noop")(noop(joined))
      time("join+cosine-nofilter.noop")(noop(joined.select(col("id_a"), col("id_b"),
        Similarity.cosineQuantized(col("e_a"), col("e_b")).as("cosine"))))
      time("join+cosine+filter.noop")(noop(joined.select(col("id_a"), col("id_b"),
        Similarity.cosineQuantized(col("e_a"), col("e_b")).as("cosine"))
        .filter(col("cosine") >= 0.95)))
      time("verify.noop")(noop(verified))
      time("full query again (count)")(
        println("rows=" + Dedup.embeddingNearDupPairs(p, tables = 6, planes = 8,
          threshold = 0.95, quantized = true,
          bounds = Dedup.BlockBounds(megaCap = Int.MaxValue)).count()))
    }
    spark.stop()
  }
}
