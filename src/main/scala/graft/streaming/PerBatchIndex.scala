package graft.streaming

/** The per-trigger index-resolution discipline shared by every
  * disk-index door (text dedup, admission, image dedup): a durable
  * index dir is RE-RESOLVED on every micro-batch, so a delete-log
  * append (the takedown lifecycle) or a refresh landing between
  * triggers is honored by the very next batch without a restart — a
  * run-start plan would keep the file listing (and so the
  * pre-takedown index) frozen for the life of the query. The
  * re-resolve costs a per-trigger table lookup, never an index
  * rebuild. Without a dir, the corpus-built index materializes once
  * and every batch serves from it.
  */
private[streaming] object PerBatchIndex {
  def resolver[T](indexDir: Option[String], load: String => T,
                  build: => T): () => T =
    indexDir match {
      case Some(d) => () => load(d)
      case None    => val built = build; () => built
    }
}
