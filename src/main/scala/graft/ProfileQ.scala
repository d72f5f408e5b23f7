package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-query empirical profiler (optimization guide §1): runs the named
  * inventory queries once untimed (warm-up: fixture builds, codegen,
  * caches — the long-lived-cluster steady state), then once timed with a
  * listener attached, and prints a per-job breakdown: wall span, task
  * time, shuffle read/write bytes, spill, and the driver-side gap
  * between jobs (planning / metadata / single-threaded driver work —
  * guide §7.3's "nothing is running" time).
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileQ t19_classifier_train v15_hybrid_dense"
  */
object ProfileQ {

  private final class Rec {
    var start = 0L
    var end = 0L
    var desc = ""
    var nTasks = 0
    var taskTime = 0L      // ms summed across tasks
    var gcTime = 0L
    var shufRead = 0L
    var shufWrite = 0L
    var input = 0L
    var spill = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.newSession(cpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Rec]()
    @volatile var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (collecting) {
        val r = new Rec
        r.start = e.time
        val stageName = e.stageInfos.lastOption.map(_.name).getOrElse("")
        r.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("") + " | " + stageName
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (collecting) {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = if (collecting) {
        // attribute to the most recent unfinished job (stage->job mapping
        // is good enough via active job scan)
        val m = e.taskMetrics
        if (m != null) {
          // find job containing this stage: approximate by latest started job
          val it = jobs.entrySet().iterator()
          var best: Rec = null
          var bestStart = -1L
          while (it.hasNext) {
            val r = it.next().getValue
            if (r.end == 0L && r.start >= bestStart) { best = r; bestStart = r.start }
          }
          if (best != null) {
            best.synchronized {
              best.nTasks += 1
              best.taskTime += m.executorRunTime
              best.gcTime += m.jvmGCTime
              best.shufRead += m.shuffleReadMetrics.totalBytesRead
              best.shufWrite += m.shuffleWriteMetrics.bytesWritten
              best.input += m.inputMetrics.bytesRead
              best.spill += m.memoryBytesSpilled
            }
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm-up (fixtures, codegen, caches)
      fn(spark, sfDir).count()
      // second untimed run so the profiled run sees steady state
      fn(spark, sfDir).count()
      jobs.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(200) // let listener drain
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1)
      }
      println(f"== $name wall=$wall%.3f s, jobs=${recs.size}")
      var prevEnd = -1L
      var gapTotal = 0L
      recs.foreach { case (id, r) =>
        val gap = if (prevEnd > 0) r.start - prevEnd else 0L
        gapTotal += math.max(0L, gap)
        prevEnd = math.max(prevEnd, r.end)
        val span = (r.end - r.start) / 1000.0
        println(f"  job $id%3d span=$span%7.3f s gapBefore=${gap / 1000.0}%6.3f s " +
          f"tasks=${r.nTasks}%4d taskTime=${r.taskTime / 1000.0}%8.2f s gc=${r.gcTime / 1000.0}%5.2f " +
          f"in=${r.input / 1e6}%8.1fMB sr=${r.shufRead / 1e6}%7.1fMB sw=${r.shufWrite / 1e6}%7.1fMB " +
          f"spill=${r.spill / 1e6}%6.1fMB ${r.desc.take(110)}")
      }
      val spanSum = recs.map(r => r._2.end - r._2.start).sum / 1000.0
      println(f"  -- jobSpanSum=$spanSum%.3f s, interJobGapSum=${gapTotal / 1000.0}%.3f s " +
        f"(wall - spans - gaps = driver pre/post ${wall - spanSum - gapTotal / 1000.0}%.3f s)")
      if (sys.env.contains("GRAFT_PROFILE_PLAN")) {
        // per-operator runtime metrics of the LAST executed plan (the
        // SQL-tab view): run once more and walk the executed tree,
        // descending into adaptive stages and reused/subquery trees.
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan.execute().count()
        import org.apache.spark.sql.execution._
        import org.apache.spark.sql.execution.adaptive._
        val seen = new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]()
        def walk(p: SparkPlan, depth: Int): Unit = {
          if (seen.containsKey(p)) return
          seen.put(p, true)
          val m = p.metrics
          def v(k: String): String = m.get(k).map(_.value.toString).getOrElse("")
          val interesting = Seq(
            "numOutputRows" -> "rows",
            "time to build hash map total" -> "build",
            "scan time total" -> "scan",
            "shuffle bytes written total" -> "sw",
            "time in aggregation build total" -> "aggT").flatMap {
            case (k, lbl) => m.get(k).map(s => s"$lbl=${s.value}")
          }
          val extra = m.collect {
            case (k, s) if k.contains("Time") || k.endsWith("time") => s"$k=${s.value}"
          }.take(3)
          println("    " + ("  " * depth) + p.nodeName +
            (if (interesting.nonEmpty || extra.nonEmpty)
              s" [${(interesting ++ extra).mkString(", ")}]" else ""))
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case s: QueryStageExec => Seq(s.plan)
            case r: exchange.ReusedExchangeExec => Seq(r.child)
            case _ => p.children
          }
          val subs = p.subqueries
          (kids ++ subs).foreach(walk(_, depth + 1))
        }
        walk(df.queryExecution.executedPlan, 0)
      }
    }
    spark.stop()
  }
}
