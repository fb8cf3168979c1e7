package graft.tools
object Smoke {
  def main(args: Array[String]): Unit = {
    val s = graft.util.SparkUtil.newLocalSession("smoke", "4")
    println("ENTRY_ROWS=" + graft.SparkEntry.entry(s).count())
    s.stop()
  }
}
