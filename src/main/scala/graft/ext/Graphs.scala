package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared edge-list plumbing for the traversal operators ([[Bfs]],
  * [[Walks]]) — the symmetrize-dedup-materialize idiom they all start
  * from. [[Components]]/[[LabelProp]] keep their own (measured,
  * semantically distinct) variants; this helper exists so the NEWER
  * frontier operators cannot drift apart on the self-loop filter or
  * the checkpoint discipline.
  */
object Graphs {

  /** Undirected edge list as (srcName, dstName) LONG columns, both
    * directions, self-loops dropped, deduped, and localCheckpoint-
    * materialized — the frame is re-joined every traversal round, and
    * the upstream (often an expensive pair computation) must not
    * replan per round. One pass via explode, not union: AQE does not
    * reuse sibling stages, so a union would evaluate the upstream
    * twice. */
  def symmetrized(edges: DataFrame, srcCol: String, dstCol: String,
      srcName: String = "src", dstName: String = "dst"): DataFrame =
    edges
      .select(explode(array(
        struct(col(srcCol).cast("long").as(srcName),
          col(dstCol).cast("long").as(dstName)),
        struct(col(dstCol).cast("long").as(srcName),
          col(srcCol).cast("long").as(dstName))))
        .as("e"))
      .select(col(s"e.$srcName"), col(s"e.$dstName"))
      .where(col(srcName) =!= col(dstName))
      .distinct()
      .localCheckpoint()
}
