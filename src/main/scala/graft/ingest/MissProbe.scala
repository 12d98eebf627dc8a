package graft.ingest
object MissProbe {
  def main(a: Array[String]): Unit = {
    val f = a(0); val pageNo = a(1).toInt
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      BinaryIngest.defaultDocsDir, f))
    val pd = PdfLattice.pageDicts(data)(pageNo - 1)
    val content = PdfLattice.pageContent(data, pd)
    val (texts, boxes) = PdfLattice.interpret(content)
    boxes.filter(b => b.w <= 2 && b.h > 4).sortBy(_.x)
      .filter(b => b.x > 80 && b.x < 220)
      .foreach(b => println(f"MISSP vrule x=${b.x}%.1f y=[${b.y}%.1f,${b.y + b.h}%.1f] shade=${b.shade}"))
    boxes.filter(b => b.shade).take(20)
      .foreach(b => println(f"MISSP shadebox x=${b.x}%.1f y=${b.y}%.1f w=${b.w}%.1f h=${b.h}%.1f"))
  }
}
