package tmpdrive
import org.apache.spark.sql.SparkSession
object PlanAuditAll {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    var n_clean = 0
    for ((n, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(s, dir).queryExecution.executedPlan.toString
        val suspects = plan.linesIterator.filter(l =>
          l.contains("Filter ") &&
          Seq("md5(","sha1(","sha2(","xxhash","split(","transform(","aggregate(",
              "array_sort","sort_array","zip_with","sequence(").exists(l.contains))
          .toList
        if (suspects.nonEmpty) {
          println(s"==== $n: ${suspects.size}")
          suspects.foreach(l => println("  " + l.trim.take(220)))
        } else n_clean += 1
      } catch { case e: Throwable => println(s"==== $n: ERR ${String.valueOf(e.getMessage).take(80)}") }
    }
    println(s"clean: $n_clean")
    s.stop()
  }
}
