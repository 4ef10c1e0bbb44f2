package graft

/** Standalone probe: does the tokenize+code path scale with threads on this
  * box, outside Spark? Used to attribute build-scaling limits (CPU vs
  * memory bandwidth vs framework overhead). Not part of the engine.
  */
object TokScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 8
    val an = graft.text.Analyzer()
    val bodies = (0 until 64).map(i => graft.fixtures.PagesGen.bodyFor(i.toLong))
    // warm
    bodies.foreach(b => graft.core.DocTokenizer.index(an, "", Seq(("1", b))))
    val perThread = 400
    val t0 = System.nanoTime()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        val cache = new graft.core.DocTokenizer.CodeCache(an)
        var i = 0
        while (i < perThread) {
          val b = bodies((t * perThread + i) % bodies.length)
          graft.core.DocTokenizer.indexGrouped(an, "Name=x\nSource=web\n", Seq(("1", b)), cache)
          i += 1
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$n threads: ${n * perThread} docs in $sec%.2fs = ${n * perThread / sec}%.0f docs/s")
  }
}
