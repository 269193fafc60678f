package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object JobProbe {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2) { // warm
      val t0 = System.nanoTime()
      SparkEntry.queries(qname)(spark, d).count()
      Checkpoints.releaseScoped()
      println(f"$qname warm$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = jobs.getOrDefault(j.jobId, 0L)
        println(f"[job ${j.jobId}] ${(j.time - st)}%d ms")
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(qname)(spark, d).count()
    println(f"$qname instrumented ${(System.nanoTime()-t0)/1e9}%.3f s")
    spark.stop()
  }
}
