package graft

/** Single configuration point for every scratch/staging root the
  * engine writes (stream sinks + checkpoints, connected-components
  * iteration spill, MapReduce text staging, storage round-trip dirs).
  *
  * One knob: `SPARK_GRAFT_SCRATCH` env var, falling back to the
  * `graft.scratch.root` JVM property, defaulting to `/tmp` — so the
  * out-of-the-box layout (`/tmp/graft_*`) is unchanged, and a cluster
  * deployment points all of it at a fast local disk (or per-executor
  * mount) with one setting instead of a source edit per site.
  */
object Scratch {
  lazy val root: String =
    sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse(sys.props.get("graft.scratch.root"))
      .getOrElse("/tmp")

  /** `<root>/<parts...>` as a Path; parent dirs NOT created (callers
    * own their create/wipe semantics). */
  def path(parts: String*): java.nio.file.Path =
    java.nio.file.Paths.get(root, parts: _*)

  /** This JVM's scratch namespace token. The landed-artifact stores
    * name their roots with per-JVM AtomicInteger counters — unique
    * WITHIN a JVM, but every JVM counts from 0, so two concurrent
    * processes (e.g. a test suite and a Verify run) would otherwise
    * both claim `<store>/s0` for DIFFERENT datasets and overwrite
    * each other mid-read (observed: three pair-store queries
    * mismatching only when run concurrently with the suite). */
  val processTag: String = s"jvm${ProcessHandle.current().pid()}"

  /** `<root>/<head>/<processTag>/<rest...>` — a store path no other
    * process can collide with. */
  def processScoped(head: String, rest: String*): java.nio.file.Path =
    java.nio.file.Paths.get(root, (head +: processTag +: rest): _*)
}
