package graft.tools

import scala.jdk.CollectionConverters._

/** Dev probe: run one registry query repeatedly in a single JVM and
  * print per-run wall time, GC time delta, and scheduler-side task time
  * totals, to localize cross-run degradation (GC? scheduler? stalls?).
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q_ann_join_sweep"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 6
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    @volatile var taskTime = 0L   // ms, executorRunTime
    @volatile var cpuTime = 0L    // ns, executorCpuTime
    @volatile var gcTaskTime = 0L // ms, jvmGCTime across tasks
    @volatile var nTasks = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            taskTime += m.executorRunTime
            cpuTime += m.executorCpuTime
            gcTaskTime += m.jvmGCTime
            nTasks += 1
          }
        }
      })

    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).count() // warmup
    (1 to n).foreach { i =>
      System.gc(); Thread.sleep(100)
      taskTime = 0; cpuTime = 0; gcTaskTime = 0; nTasks = 0
      val g0 = gcMs
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val dgc = gcMs - g0
      println(f"RUN $i%2d  wall=$dt%7.2fs  gc=${dgc / 1e3}%6.2fs  " +
        f"taskRun=${taskTime / 1e3}%8.2fs  taskCpu=${cpuTime / 1e9}%8.2fs  " +
        f"taskGc=${gcTaskTime / 1e3}%6.2fs  tasks=$nTasks%5d")
    }
    spark.stop()
  }
}
