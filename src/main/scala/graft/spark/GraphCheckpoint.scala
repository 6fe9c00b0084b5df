package graft.spark

import org.apache.spark.SparkContext

/** Shared checkpoint-dir policy for GraphX Pregel runs (connected
  * components in `kg.Canonicalize` and `ops.Dedup.connectedKeepers`).
  *
  * Pregel honors `spark.graphx.pregel.checkpointInterval` (read from
  * the SparkContext conf at context creation): every N iterations the
  * graph RDDs checkpoint, truncating an otherwise iteration-deep
  * lineage — on a billion-edge graph an executor loss late in CC would
  * replay every prior iteration. Checkpointing needs a directory; this
  * provides a LOCAL-MODE-ONLY temp fallback when the caller hasn't set
  * a durable one (kg.Main sets `<outDir>/_checkpoints`). On a cluster
  * a driver-local path is invisible to executors (each would write its
  * checkpoint parts to its own disk and the driver's listing would
  * come back empty mid-CC), so this fails fast with instructions
  * instead of half-checkpointing into a broken state.
  *
  * SIDE EFFECT: when the fallback fires, the SparkContext's global
  * checkpoint dir is set for the rest of the context's life (any later
  * checkpoint of any RDD lands there). The temp dir (and the rdd-*
  * checkpoint data GraphX writes into it) is removed by a JVM shutdown
  * hook, so repeated local runs/tests don't accumulate checkpoint
  * litter under java.io.tmpdir.
  */
object GraphCheckpoint {
  def ensureDir(sc: SparkContext): Unit = synchronized {
    if (sc.getConf.getInt("spark.graphx.pregel.checkpointInterval", -1) > 0 &&
        sc.getCheckpointDir.isEmpty) {
      require(sc.isLocal,
        "spark.graphx.pregel.checkpointInterval is set but no checkpoint " +
          "dir is: call sc.setCheckpointDir with a SHARED path (kg.Main " +
          "sets <outDir>/_checkpoints) before running connected components " +
          "on a cluster")
      val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(dir)))
      sc.setCheckpointDir(dir.toString)
    }
  }

  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      }
      // NonFatal, not just IOException: Files.walk wraps iteration
      // failures in UncheckedIOException (a RuntimeException), e.g.
      // when Spark's own shutdown hooks remove rdd-* dirs mid-walk
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort at JVM exit
}
