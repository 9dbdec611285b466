package graft.ddl

import scala.collection.mutable
import scala.util.matching.Regex

/** Feldera program DDL → schema model (SURVEY §1.2, §3.1; reference
  * grammar: docs.feldera.com/docs/sql/grammar.md — CREATE TABLE :59-131,
  * CREATE VIEW :295-319; runtime model
  * crates/feldera-types/src/program_schema.rs:209 Relation / :293 Field).
  *
  * Spark-first split: the TABLE side (columns, PRIMARY KEY, LATENESS,
  * connector properties) is parsed here into [[Program]]; VIEW bodies are
  * standard SQL handed to Catalyst untouched — we do not re-implement a
  * query parser, only the Feldera-specific DDL envelope.
  */
object Ddl {

  final case class ColumnDef(
      name: String,
      sqlType: String,
      notNull: Boolean,
      primaryKey: Boolean,
      lateness: Option[String])     // e.g. "INTERVAL 10 MINUTES"

  final case class TableDef(
      name: String,
      columns: Seq[ColumnDef],
      properties: Map[String, String]) {
    def primaryKey: Seq[String] = columns.filter(_.primaryKey).map(_.name)
    def materialized: Boolean =
      properties.get("materialized").contains("true")
    def appendOnly: Boolean =
      properties.get("append_only").contains("true")
  }

  final case class ViewDef(
      name: String,
      sql: String,
      kind: ViewKind)

  sealed trait ViewKind
  case object LocalView extends ViewKind         // not an output
  case object OutputView extends ViewKind
  case object MaterializedView extends ViewKind  // ad-hoc queryable

  final case class Program(tables: Seq[TableDef], views: Seq[ViewDef])

  private val tableRe: Regex =
    """(?is)CREATE\s+TABLE\s+(\w+)\s*\((.*?)\)\s*(?:WITH\s*\((.*?)\))?\s*$""".r
  private val viewRe: Regex =
    """(?is)CREATE\s+(LOCAL\s+|MATERIALIZED\s+)?VIEW\s+(\w+)\s+AS\s+(.*)$""".r
  private val colRe: Regex =
    """(?is)^(\w+)\s+(.+?)(\s+NOT\s+NULL)?(\s+PRIMARY\s+KEY)?(\s+LATENESS\s+(INTERVAL\s+[^,]+))?$""".r

  /** Split a program text into statements on top-level semicolons. */
  private[ddl] def statements(program: String): Seq[String] = {
    val out = mutable.Buffer[String]()
    val sb = new StringBuilder
    var depth = 0
    var inQuote = false
    program.foreach {
      case '\'' => inQuote = !inQuote; sb += '\''
      case '(' if !inQuote => depth += 1; sb += '('
      case ')' if !inQuote => depth -= 1; sb += ')'
      case ';' if !inQuote && depth == 0 =>
        if (sb.toString.trim.nonEmpty) out += sb.toString.trim
        sb.clear()
      case c => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  /** Split column list on top-level commas. */
  private def splitColumns(s: String): Seq[String] = {
    val out = mutable.Buffer[String]()
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case '<' => depth += 1; sb += '<'
      case '>' => depth -= 1; sb += '>'
      case ',' if depth == 0 =>
        out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    if (sb.toString.trim.nonEmpty) out += sb.toString.trim
    out.toSeq
  }

  def parseColumn(s: String): ColumnDef = s.trim match {
    case colRe(name, tpe, notNull, pk, _, lateness) =>
      ColumnDef(name.toLowerCase, tpe.trim,
        notNull != null || pk != null, pk != null,
        Option(lateness).map(_.trim))
    case other =>
      throw new IllegalArgumentException(s"cannot parse column: $other")
  }

  private def parseProps(s: String): Map[String, String] =
    if (s == null || s.trim.isEmpty) Map.empty
    else s.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2).map(_.trim.stripPrefix("'")
        .stripSuffix("'"))
      k -> v
    }.toMap

  def parse(program: String): Program = {
    val tables = mutable.Buffer[TableDef]()
    val views = mutable.Buffer[ViewDef]()
    statements(program).foreach {
      case tableRe(name, cols, props) =>
        tables += TableDef(name.toLowerCase,
          splitColumns(cols).filterNot(c =>
            c.toUpperCase.startsWith("PRIMARY KEY")).map(parseColumn),
          parseProps(props))
      case viewRe(kind, name, sql) =>
        val k = Option(kind).map(_.trim.toUpperCase) match {
          case Some("LOCAL") => LocalView
          case Some("MATERIALIZED") => MaterializedView
          case _ => OutputView
        }
        views += ViewDef(name.toLowerCase, sql.trim, k)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported statement: ${other.take(60)}")
    }
    Program(tables.toSeq, views.toSeq)
  }
}
