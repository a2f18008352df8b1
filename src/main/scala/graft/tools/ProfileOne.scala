package graft.tools

import graft.analytics.Catalog
import graft.core.Engine

/** Run one catalog entry N times against an SF dir with wall timing —
  * the harness for decomposing a single headliner's cost (pair with
  * GRAFT_PROF=1 to see the per-phase breakdown from [[graft.core.Prof]]).
  *
  * Usage: runMain graft.tools.ProfileOne <name> [sfDir] [passes]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileOne <entry> [sfDir] [passes]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Engine.session("profile-one", master = Some("local[32]"))
    val q = Catalog.queries(name)
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name pass $i: $sec%.2f s ($n rows)")
    }
    spark.stop()
  }
}
