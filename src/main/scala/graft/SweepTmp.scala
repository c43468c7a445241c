package graft

/** Temp-dir hygiene for the scale-sweep mains: each sweep materializes a
  * 10×/100× scaled parquet copy of its input tables, and before this helper
  * those directories accumulated under /tmp across runs (gigabytes per
  * sweep). The enforcement gates in every sweep THROW after the artifact is
  * printed, so a `finally` would have to thread through each main's tail —
  * a JVM shutdown hook deletes the directory on both the green and the
  * tripped exit path instead.
  */
object SweepTmp {

  /** Create a temp directory that is recursively deleted on JVM exit. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(p.toFile)))
    p.toString
  }

  private def delete(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delete)
    f.delete(); ()
  }
}
