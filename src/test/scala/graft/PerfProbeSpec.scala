package graft
import org.scalatest.funsuite.AnyFunSuite
class PerfProbeSpec extends AnyFunSuite {
  test("single-thread kernel throughput") {
    // warmup
    graft.extract.ReferenceScorer.mentions(0 until 2000)
    val t0 = System.nanoTime()
    val m = graft.extract.ReferenceScorer.mentions(2000 until 12000)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"PROBE files/sec=${10000 / dt}%.0f mentions=${m.size} sec=$dt%.2f")
    // corpus gen only
    val t1 = System.nanoTime()
    (12000 until 22000).foreach(i => graft.core.CorpusGen.file(i.toLong))
    println(f"PROBE gen-only files/sec=${10000 / ((System.nanoTime()-t1)/1e9)}%.0f")
    // gen+tokenize only
    val t2 = System.nanoTime()
    (22000 until 32000).foreach { i =>
      val f = graft.core.CorpusGen.file(i.toLong).source
      graft.extract.Tokenizer.sentences(f.repo + "/" + f.path, f.content)
    }
    println(f"PROBE gen+tok files/sec=${10000 / ((System.nanoTime()-t2)/1e9)}%.0f")
    // per-file fast path (the hot production entry — shared pools)
    val w = graft.kernel.Weights.default
    val t3 = System.nanoTime()
    var nm = 0
    (32000 until 42000).foreach { i =>
      val f = graft.core.CorpusGen.file(i.toLong).source
      nm += graft.kernel.TriaffineScorer.mentionsForFile(
        graft.extract.Tokenizer.sentences(f.repo + "/" + f.path, f.content),
        w).size
    }
    println(f"PROBE fastpath files/sec=${10000 / ((System.nanoTime()-t3)/1e9)}%.0f mentions=$nm")
  }
}
