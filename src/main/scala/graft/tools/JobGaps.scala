package graft.tools

import graft.jobs.ResolveJob
import graft.sources.DocCorpus
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: per-job wall clock + inter-job driver gaps for one
  * resolve — separates executor-parallel time from driver-serial time
  * (planning, scheduling, collect-side work) to direct scaling work.
  */
object JobGaps {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(4)
    val n = args.lift(1).map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = ResolveJob.Config(
      blocking = graft.blocking.Blocking.Config(salts = math.max(4, cores)),
      numberEntities = false,
      broadcastFeatures = Some(false))
    // warmup
    ResolveJob.run(spark, DocCorpus.synthetic(spark, 2000, seed = 7L).toDF(), cfg)
      .entities.write.mode("overwrite").format("noop").save()

    val events = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, String)]()
    val starts = scala.collection.mutable.Map[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.synchronized {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          starts(j.jobId) = (j.time, desc); ()
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.get(j.jobId).foreach { case (s, d) =>
            events += ((j.jobId, s, j.time, d)) }
          ()
        }
    })
    val t0 = System.currentTimeMillis()
    val r = ResolveJob.run(spark, DocCorpus.synthetic(spark, n).toDF(), cfg)
    r.assignments.count()
    val tMid = System.currentTimeMillis()
    graft.util.Confs.withJobDesc(spark)("entities_write") {
      r.entities.write.mode("overwrite").format("noop").save()
    }
    val t1 = System.currentTimeMillis()
    println(f"[phase] resolve=${(tMid - t0) / 1000.0}%.1fs entities_write=${(t1 - tMid) / 1000.0}%.1fs")
    Thread.sleep(500) // let the listener bus drain

    val sorted = events.sortBy(_._1).toSeq
    val busy = sorted.map(e => e._3 - e._2).sum
    val wall = t1 - t0
    println(f"[jobs] n=${sorted.size} wall=${wall / 1000.0}%.1fs busy=${busy / 1000.0}%.1fs gaps=${(wall - busy) / 1000.0}%.1fs")
    // every job in id order — diffable across parallelism levels to
    // spot the jobs that do NOT shrink with cores (the serial set)
    sorted.foreach { case (id, s, e, d) =>
      println(f"  [job $id%3d] ${(e - s) / 1000.0}%6.2fs  $d")
    }
    // per-description totals
    sorted.groupBy(_._4).map { case (d, es) =>
      (d, es.map(e => e._3 - e._2).sum, es.size)
    }.toSeq.sortBy(-_._2).foreach { case (d, t, n) =>
      println(f"  [desc] ${t / 1000.0}%7.2fs  n=$n%-3d ${if (d.isEmpty) "(none)" else d}")
    }
    val gaps = sorted.sliding(2).collect {
      case Seq((i1, _, e1, _), (i2, s2, _, _)) if s2 > e1 => (i1, i2, s2 - e1)
    }.toSeq.sortBy(-_._3)
    gaps.take(12).foreach { case (a, b, g) =>
      println(f"  [gap $a%3d->$b%3d] ${g / 1000.0}%6.2fs")
    }
    spark.stop()
  }
}
