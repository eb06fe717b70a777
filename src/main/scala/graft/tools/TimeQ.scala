package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.build(32, "timeq")
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (name <- args) {
      val q = graft.SparkEntry.queries(name)
      // cold
      var t0 = System.nanoTime(); q(s, dir).collect(); val c = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); q(s, dir).collect(); val w1 = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); q(s, dir).collect(); val w2 = (System.nanoTime()-t0)/1e9
      println(f"[timeq] $name cold=$c%.2f warm=${math.min(w1,w2)}%.2f")
    }
    s.stop()
  }
}
