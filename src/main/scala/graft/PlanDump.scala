package graft

/** Dump `.explain("formatted")` for named registry queries to files —
  * the optimization-round audit trail (plans/r15/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // r16 (r15 verdict "what's wrong" #1): Materialize.pin truncates
      // lineage, so the final frame of a pinned query explains as a
      // `Scan ExistingRDD` stub. Capture the plan of every frame the
      // query pins (the real operator trees) alongside the final plan.
      val pinned = scala.collection.mutable.ArrayBuffer.empty[String]
      graft.core.Materialize.planSink = Some(p => pinned += p)
      val df = try fn(spark, dir)
               finally graft.core.Materialize.planSink = None
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val full = (pinned.zipWithIndex.map { case (p, i) =>
        s"== Pinned subplan ${i + 1}/${pinned.size} (input to Materialize.pin) ==\n$p"
      } :+ s"== Final returned frame ==\n$txt").mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $name ($suffix, ${pinned.size} pinned subplans)")
    }
    spark.stop()
  }
}
