package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Graphviz topology dump — the reference's stream-graph
  * visualization (deva/core/compute/graph.py:358 renders the node
  * graph via networkx/Graphviz). Here the dataflow graph IS the
  * Catalyst plan, so the dump walks the analyzed logical plan (the
  * user-facing operator topology, before optimizer rewrites) and
  * emits plain DOT — no library, renderable with any graphviz.
  *
  * Edges point data-flow-wise (child → parent, rankdir=BT) so the
  * picture reads bottom-up like deva's source-to-sink graphs.
  */
object PlanDot {

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def label(p: LogicalPlan, maxLen: Int): String = {
    val s = p.simpleString(10).replaceAll("\\s+", " ").trim
    if (s.length <= maxLen) s else s.take(maxLen - 1) + "…"
  }

  def dot(df: DataFrame, title: String = "flow", maxLabel: Int = 80): String = {
    val sb = new StringBuilder
    sb ++= s"""digraph "${escape(title)}" {\n"""
    sb ++= "  rankdir=BT;\n  node [shape=box, fontname=monospace, fontsize=10];\n"
    var n = 0
    def walk(p: LogicalPlan): Int = {
      val id = n
      n += 1
      sb ++= s"""  n$id [label="${escape(label(p, maxLabel))}"];\n"""
      p.children.foreach { c =>
        val cid = walk(c)
        sb ++= s"  n$cid -> n$id;\n"
      }
      id
    }
    walk(df.queryExecution.analyzed)
    sb ++= "}\n"
    sb.toString
  }

  def write(df: DataFrame, path: String, title: String = "flow"): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), dot(df, title))
}
