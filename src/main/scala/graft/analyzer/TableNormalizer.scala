package graft.analyzer

import org.apache.spark.sql.{DataFrame, Encoders}

/** NormalizerTable — user-supplied substitution rules applied by a greedy
  * LEFTMOST-LONGEST scan, the reference's table-driven normalizer
  * (/root/reference/lib/normalizer.c:5833-5959, registered at :6470):
  * `grn_pat_scan` walks the input finding non-overlapping pat-trie key
  * matches (longest key wins at each position), each matched span is
  * replaced by its rule's normalized value, and unmatched text copies
  * through verbatim. The reference's optional index-column indirection
  * (several source rows sharing a normalized value via an inverted index,
  * normalizer.c:5886-5920) collapses here to the rules map itself.
  *
  * Keys compare as raw character sequences (the reference scans the
  * original bytes — a NormalizerTable table has no implicit normalizer),
  * so matching is case-sensitive.
  */
object TableNormalizer {

  /** compiled rule set: keys grouped by first char, longest first — the
    * scan probes only keys that can start at the current position */
  final class Rules private[TableNormalizer] (
      private[TableNormalizer] val byFirst: Map[Char, Array[(String, String)]],
      val maxKeyLen: Int,
      private[TableNormalizer] val keyNormalizer: Option[String => String])
    extends Serializable

  /** `keyNormalizer` mirrors a PAT table that carries its own normalizer
    * (the reference's overlap.test: a NFKC130-normalized Normalizations
    * table matches "ⅡⅡ" as "iii"+"i" → "31"): rule keys are normalized at
    * compile time and the scanned input at normalize time, so matching
    * happens in the table's normalized space. (Divergence note: for
    * UNMATCHED spans the reference copies the original bytes while this
    * copies the normalized ones — observable only when a key normalizer is
    * configured AND text falls outside every rule.) */
  def compile(rules: Seq[(String, String)],
      keyNormalizer: Option[String => String] = None): Rules = {
    val norm = keyNormalizer.getOrElse(identity[String] _)
    val clean = rules.map { case (k, v) => (norm(k), v) }.filter(_._1.nonEmpty)
    new Rules(
      clean.groupBy(_._1.charAt(0))
        .map { case (c, rs) =>
          c -> rs.distinct.sortBy(-_._1.length).toArray
        },
      if (clean.isEmpty) 0 else clean.map(_._1.length).max,
      keyNormalizer)
  }

  def normalize(raw: String, rules: Rules): String = {
    val s = rules.keyNormalizer.fold(raw)(_(raw))
    if (rules.maxKeyLen == 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      var replaced = false
      rules.byFirst.get(c) match {
        case Some(cands) =>
          var k = 0
          while (!replaced && k < cands.length) {
            val (key, value) = cands(k)
            if (s.startsWith(key, i)) {
              out.append(value)
              i += key.length
              replaced = true
            }
            k += 1
          }
        case None =>
      }
      if (!replaced) { out.append(c); i += 1 }
    }
    out.toString
  }

  /** spec-string form for manifest round-trip / `byName`:
    * `NormalizerTable(key1=>value1,key2=>value2)`. Keys and values may not
    * contain `,` or `=>` (use the programmatic API for those). */
  def parseSpecArgs(args: String): Rules =
    compile(args.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { kv =>
      val p = kv.indexOf("=>")
      require(p > 0, s"bad NormalizerTable rule (want key=>value): $kv")
      (kv.substring(0, p), kv.substring(p + 2))
    })

  /** DataFrame op: table-normalize a text column in one distributed pass
    * (rules ride the closure — rule tables are small by construction). */
  def normalizeColumn(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    val compiled = compile(rules)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(docs(idCol).cast("long"), docs(textCol).cast("string"))
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), normalize(r.getString(1), compiled)))
      }(enc)
      .toDF(idCol, "normalized")
  }
}
