package graft.core

/** The reference engine's single record type — both fields strings
  * (`/root/reference/mr/worker.go:24-27`); applications encode numbers
  * as strings (`mrapps/wc.go:43`).
  */
final case class KV(key: String, value: String)

/** The reference's "query": a Map/Reduce function pair, loaded there from
  * a Go `.so` plugin (`/root/reference/main/mrworker.go:34-51`); here a
  * plain Scala trait with a registry by name.
  *
  * Contract (SURVEY.md §2.4): `reduce` receives the COMPLETE value list
  * for its key and need not be commutative/associative (the indexer sorts
  * and joins the whole list). Per-key value order is unspecified; output
  * files are sorted by key ascending (byte-wise, like Go's string `<`).
  */
trait MRApp extends Serializable {
  def name: String
  def map(file: String, contents: String): Seq[KV]
  def reduce(key: String, values: Seq[String]): String
}

object MRApp {
  /** Registry replacing the reference's `.so` plugin loading. */
  def byName(name: String): MRApp = name match {
    case "wc"      => graft.apps.WordCount
    case "indexer" => graft.apps.Indexer
    case "nocrash" => graft.apps.NoCrash
    case other     => throw new IllegalArgumentException(s"unknown app: $other")
  }
}
