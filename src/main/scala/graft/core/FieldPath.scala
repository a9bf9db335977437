package graft.core

/** Dotted-path addressing for nested fields.
  *
  * The reference addresses nested nodes with dotted paths and backtick
  * quoting (awsglue/transforms/drop_nulls.py:22 `RecordUtils.quoteName`;
  * apply_mapping / select_fields / drop_fields all take such paths).
  * This is the one shared parser + renderer used by every field
  * transform, so quoting semantics stay consistent.
  */
object FieldPath {

  /** Parse `a.b` / `` `a.b`.c `` into segments. Backticks protect
    * embedded dots; they are not part of the segment name.
    */
  def parse(path: String): Seq[String] = {
    val out    = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb     = new StringBuilder
    var quoted = false
    path.foreach {
      case '`'               => quoted = !quoted
      case '.' if !quoted    => out += sb.result(); sb.clear()
      case c                 => sb += c
    }
    out += sb.result()
    out.toSeq
  }

  def quote(seg: String): String =
    if (seg.exists(c => c == '.' || c == '`')) "`" + seg.replace("`", "``") + "`"
    else seg

  def render(segs: Seq[String]): String = segs.map(quote).mkString(".")

  /** A trie of field paths; used to reconstruct nested projections. */
  final case class Node(
      children: scala.collection.mutable.LinkedHashMap[String, Node] =
        scala.collection.mutable.LinkedHashMap.empty,
      var leaf: Boolean = false)

  def trie(paths: Seq[Seq[String]]): Node = {
    val root = Node()
    paths.foreach { p =>
      var cur = root
      p.foreach { seg =>
        cur = cur.children.getOrElseUpdate(seg, Node())
      }
      cur.leaf = true
    }
    root
  }
}
