package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r15 measurement probe: run a named registry query twice (warm +
  * timed) with a job-duration listener, printing per-job wall times and
  * the total vs sum-of-jobs gap (= driver / streaming-engine overhead).
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names = args(0).split(",")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = starts.get(je.jobId)
        if (st != null) lines.add(
          f"JOB ${je.jobId}%4d ${(System.nanoTime() - st._1) / 1e9}%7.3f s  ${st._2.take(80)}")
      }
    })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // warm
      Thread.sleep(300)
      lines.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(s"==== $name total ${f"$total%.3f"} s")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
