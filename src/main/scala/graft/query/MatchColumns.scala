package graft.query

/** `--match_columns` string front: `"title * 10 || body"` →
  * column→weight map (reference syntax: legs joined with `||`, optional
  * `* <number>` weight per leg, default weight 1 — parsed by the grammar
  * in lib/grn_ecmascript.lemon via grn_expr, exercised throughout
  * test/command/suite/select/match_columns/). Index-prefixed forms
  * (`Idx.col`) reduce to the column name: this engine has one index per
  * column set, so the prefix carries no extra information. */
object MatchColumns {

  def parse(spec: String): Map[String, Double] = {
    require(spec.trim.nonEmpty, "match_columns must not be empty")
    spec.split("\\|\\|").map { leg0 =>
      val leg = leg0.trim
      require(leg.nonEmpty, s"empty match_columns leg in <$spec>")
      leg.split("\\*") match {
        case Array(col) => colName(col) -> 1.0
        case Array(col, w) =>
          val weight = try w.trim.toDouble catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"match_columns weight '${w.trim}' is not a number in <$spec>")
          }
          colName(col) -> weight
        case _ => throw new IllegalArgumentException(
          s"match_columns leg '$leg' has more than one '*' in <$spec>")
      }
    }.toMap
  }

  private def colName(raw: String): String = {
    val c = raw.trim
    require(c.nonEmpty && c.forall(ch =>
      Character.isLetterOrDigit(ch) || ch == '_' || ch == '.'),
      s"invalid match_columns column name '$c'")
    // Idx.col → col (see scaladoc)
    c.substring(c.lastIndexOf('.') + 1)
  }
}
