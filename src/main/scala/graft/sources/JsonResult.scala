package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S4 — the reference's JSON result shape (lib.rs:841-843):
  * `{<group-key-json>: {"$$sum(col)": {data: […], window_starts: […],
  * window_ends: […]}}}` with the group key itself serialized as a JSON-object
  * STRING (GroupKey serializer, lib.rs:102-109) and aggregate keys in the
  * `$$agg(col)` form (lib.rs:801-813).
  *
  * Our canonical output is tidy rows (one row per group × window — the shape
  * every downstream Spark consumer wants); this shaper exists only for
  * droppable reference compatibility. The per-group array assembly is a
  * `collect_list` over the window rows sorted by `w_start` — one extra
  * shuffle, used only at the API edge where result cardinality is already
  * group-sized.
  */
object JsonResult {

  def aggregateKey(aggName: String, column: String): String = s"$$$$$aggName($column)"

  /** One JSON document for the whole result, reference-shaped. Collects to
    * the driver deliberately: this runs AFTER aggregation, on group-sized
    * results (the reference returns the same payload over RESP), never on
    * raw data. */
  def toReferenceJson(windowed: DataFrame, groupCols: Seq[String],
                      selects: Seq[graft.ir.Select],
                      postSelects: Seq[graft.ir.PostSelect] = Nil): String = {
    val rows = windowed
      .orderBy((groupCols.map(graft.compile.Compiler.colRef) :+ col("w_start")): _*)
      .collect()
    val grouped = rows.groupBy(r =>
      groupCols.map(g => g -> Option(r.getAs[Any](g)).map(_.toString)).toMap)
    def esc(s: String): String =
      s.flatMap {
        case '"'              => "\\\""
        case '\\'             => "\\\\"
        case '\n'             => "\\n"
        case '\r'             => "\\r"
        case '\t'             => "\\t"
        case ch if ch < 0x20  => f"\\u${ch.toInt}%04x"
        case ch               => ch.toString
      }
    val entries = grouped.toSeq.sortBy(_._1.toSeq.sortBy(_._1).mkString).map {
      case (key, rs) =>
        val keyJson = "{" + key.toSeq.sortBy(_._1).map { case (k, v) =>
          s""""${esc(k)}":${v.map(x => s""""${esc(x)}"""").getOrElse("null")}"""
        }.mkString(",") + "}"
        val starts = rs.map(_.getAs[Long]("w_start")).mkString("[", ",", "]")
        val ends = rs.map(_.getAs[Long]("w_end")).mkString("[", ",", "]")
        val aggs = (selects.map { sel =>
          val data = rs.map { r =>
            Option(r.getAs[Any](sel.key)).map(_.toString).getOrElse("null")
          }.mkString("[", ",", "]")
          s""""${esc(aggregateKey(sel.agg.name,
              sel.expr.flatMap(_ => sel.alias).getOrElse(sel.column)))}":""" +
            s"""{"data":$data,"window_starts":$starts,"window_ends":$ends}"""
        } ++ postSelects.map { p =>
          // post-aggregate expressions render under `$$expr(<alias>)` —
          // no reference analog exists (the reference has no arithmetic
          // over aggregates), so the alias names the series
          val data = rs.map { r =>
            Option(r.getAs[Any](p.alias)).map(_.toString).getOrElse("null")
          }.mkString("[", ",", "]")
          s""""${esc(aggregateKey("expr", p.alias))}":""" +
            s"""{"data":$data,"window_starts":$starts,"window_ends":$ends}"""
        }).mkString(",")
        s""""${esc(keyJson)}":{$aggs}"""
    }
    "{" + entries.mkString(",") + "}"
  }
}
