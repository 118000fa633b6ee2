package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Times individual named queries for local per-query iteration, reporting the
  * Spark job count and summed executor task time alongside wall time — the gap
  * between wall and task time is scheduler/launch overhead, which is what
  * actually dominates many-small-job operators at smoke scale.
  */
object TimeOne {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("timeone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (sys.env.contains("TIMEONE_TRACE")) {
          val names = j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
          println(s"  JOB ${j.jobId} stages=${j.stageInfos.size} $names")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    val dir = a(0)
    val names = a.drop(1)
    for (n <- names) {
      jobs.set(0); stages.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; give the bus a beat before reading
      Thread.sleep(300)
      println(f"TIMING $n%s $sec%.3f s rows=$cnt jobs=${jobs.get} stages=${stages.get} taskSec=${taskMs.get / 1e3}%.2f")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
