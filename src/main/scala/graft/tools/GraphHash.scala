package graft.tools

/** Scratch harness (r17): checksum of an in-memory HNSW graph built over
  * deterministic vectors — run against two source trees to prove the
  * primitive buildGraph rewrite is bit-identical to the boxed r16 one.
  * No Spark session needed. Usage: runMain graft.tools.GraphHash [n] [dim]
  */
object GraphHash {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(3000)
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val rnd = new scala.util.Random(42)
    // ids deliberately non-contiguous and out of order
    val vecs = (0 until n).map { i =>
      ((i.toLong * 2654435761L) % 1000003L, Array.fill(dim)(rnd.nextFloat()))
    }
    val t0 = System.nanoTime()
    val dump = graft.operators.HnswIndex.buildGraphDump(vecs, 16, 64)
    val secs = (System.nanoTime() - t0) / 1e9
    val md = java.security.MessageDigest.getInstance("SHA-256")
    dump.foreach { case (id, lvl, nbrs) =>
      md.update(s"$id:$lvl:${nbrs.map(_.mkString(",")).mkString(";")}\n"
        .getBytes("UTF-8"))
    }
    val hex = md.digest().map("%02x".format(_)).mkString
    println(f"GRAPHHASH n=$n dim=$dim nodes=${dump.size} secs=$secs%.3f sha=$hex")
  }
}
