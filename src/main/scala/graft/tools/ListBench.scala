package graft.tools
import org.apache.hadoop.fs.Path
import org.apache.hadoop.conf.Configuration

/** Scratch dev probe: cost of recursive listings on the demo stores. */
object ListBench {
  def main(args: Array[String]): Unit = {
    val conf = new Configuration()
    args.foreach { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        var n = 0
        val it = fs.listFiles(p, true)
        while (it.hasNext) { it.next(); n += 1 }
        println(f"$dir rep$i listFiles(rec) n=$n ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        var n = 0
        def walk(d: Path): Unit = fs.listStatus(d).foreach { st =>
          if (st.isDirectory) walk(st.getPath) else n += 1
        }
        walk(p)
        println(f"$dir rep$i listStatus-walk n=$n ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      }
    }
  }
}
