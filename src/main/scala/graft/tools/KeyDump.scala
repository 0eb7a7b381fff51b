package graft.tools
object KeyDump {
  def main(args: Array[String]): Unit = {
    val qk = graft.SparkEntry.queries.keySet.toSeq.sorted
    val ok = graft.SparkEntry.oracleSql.keySet.toSeq.sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      (qk.mkString("\n") + "\n---\n" + ok.mkString("\n") + "\n" +
       s"nq=${qk.size} no=${ok.size}\n" +
       graft.SparkEntry.oracleSql.toSeq.sortBy(_._1).map{case(k,v)=>k+":"+v.hashCode}.mkString("\n")
      ).getBytes("UTF-8"))
    println("dumped")
  }
}
