package graft
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.dedup.directVerifyDocs", "0") // force blob path
    val df = SparkEntry.queries("q_dedup_ngram")(spark, "/root/testdata/sf0.01")
    df.collect() // execute THIS QueryExecution so AQE finalizes and codegen stages collapse
    val txt = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val spans = "codegen id : (\\d+)".r.findAllMatchIn(txt).map(_.group(1)).toSeq.distinct
    println(s"[cgcheck] codegen spans: ${spans.size}")
    txt.linesIterator.filter(l => l.contains("Generate") && l.contains("codegen"))
      .foreach(l => println("[cgcheck] " + l.trim))
    // also write the forced-blob plan for the round dump
    java.nio.file.Files.write(java.nio.file.Paths.get("plans/r18/q_dedup_ngram_blob_after.txt"),
      ("# q_dedup_ngram — blob path forced (directVerifyDocs=0), r18 HEAD, sf0.01, local[4]\n" + txt).getBytes("UTF-8"))
    println("[cgcheck] rows ok")
    spark.stop()
  }
}
