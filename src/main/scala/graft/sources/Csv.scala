package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CSV dialect sniffing (the `csv.Sniffer` job, done as Column work) —
  * bulk tabular corpus drops arrive as "CSV" in four dialects per
  * thousand files: comma/semicolon/tab/pipe delimited, quoted or not,
  * with or without a header row. A distributed ingest can't ask a
  * human per file; it has to INFER the dialect from the bytes and then
  * hand the parse to the declared-schema reader with the right
  * options. The inference here is the classic consistency argument:
  *
  *   - QUOTED REGIONS ARE MASKED FIRST (`"..."` → one sentinel char),
  *     because a quoted field legally contains the delimiter — the
  *     naive per-line count would over-count exactly on the files
  *     where quoting matters most;
  *   - a candidate delimiter (`,` `;` TAB `|`) is VIABLE when every
  *     non-empty line has the SAME masked count of it, and that count
  *     is positive — ragged counts mean "that char is data, not
  *     structure";
  *   - among viable candidates the highest per-line count wins (a
  *     `;`-delimited file full of prose commas has consistent `,`
  *     counts of 0 on many lines — the positive-count rule kills it;
  *     ties break toward `,` first, the web's prior);
  *   - HEADER DETECTION is the numericness flip: if the second line
  *     has strictly more numeric fields than the first, the first line
  *     is labels (`csv.Sniffer.has_header`'s vote, reduced to the
  *     two-line core).
  *
  * Pure Column folds over one `split` — zero shuffle, linear in
  * payload size, embarrassingly parallel at 100 TB. */
object Csv {

  /** Candidate delimiters in tie-break priority order. */
  val Candidates: Seq[(String, String)] =
    Seq("," -> ",", ";" -> ";", "\t" -> "\t", "|" -> "\\|")

  private val Numeric = "^-?[0-9]+(\\.[0-9]+)?$"

  /** Sniff one payload: `struct(delimiter, has_header, n_cols, n_rows)`.
    * `delimiter` is empty when no candidate is viable (single-column
    * files have no delimiter evidence — the caller's policy decision).
    *
    * EXPRESSION-TREE DISCIPLINE: every heavy subexpression (the masked
    * line array, the per-candidate count arrays, the winning candidate)
    * is bound ONCE and re-referenced only through lambda variables — a
    * `foldLeft` of `when`s whose accumulator appears on both branches,
    * consumed by several output fields, duplicates the lambda-bearing
    * subtree `O(2^candidates x fields)` times and pins the Catalyst
    * ANALYZER (measured: >10 min resolving one such query; this shape
    * resolves in milliseconds). The pack-once idiom: compute into a
    * 1-element array, `transform` over it, emit the struct inside the
    * lambda. */
  def sniff(payload: Column): Column = {
    val lines = filter(split(payload, "\r?\n"), l => length(l) > 0)
    val masked = transform(lines,
      l => regexp_replace(l, "\"[^\"]*\"", ""))
    // one struct per candidate, each embedding its count array exactly
    // once; viability folded into the count (-1 = not viable)
    val cand = (m: Column) => array(Candidates.map { case (d, dRegex) =>
      element_at(transform(
        array(transform(m,
          l => (size(split(l, dRegex)) - 1).cast("long"))),
        counts => {
          val first = element_at(counts, 1)
          val viable = size(counts) > 0 && first > 0 &&
            forall(counts, c => c === first)
          struct(when(viable, first).otherwise(lit(-1L)).as("count"),
            lit(d).as("delim"))
        }), 1)
    }: _*)
    // pack (masked, n_lines) once; everything downstream is lambda refs
    element_at(transform(
      array(struct(masked.as("m"), size(lines).cast("long").as("nl"))),
      p => {
        val m = p.getField("m")
        val best = aggregate(cand(m),
          struct(lit(-1L).as("count"), lit("").as("delim")),
          (acc, c) => when(c.getField("count") > acc.getField("count"),
            c).otherwise(acc))
        // bind the winner once more for the multi-field output
        element_at(transform(array(best), b => {
          val delim = b.getField("delim")
          val cnt = b.getField("count")
          // numericness flip between the first two masked lines; the
          // split pattern is the CHOSEN delimiter — `|` regex-escaped
          val delimRegex =
            when(delim === "|", lit("\\|")).otherwise(delim)
          val nNumeric = (l: Column) => size(filter(
            call_function("split", l, delimRegex),
            f => f.rlike(Numeric)))
          val hasHeader = p.getField("nl") >= 2 && cnt > 0 &&
            nNumeric(element_at(m, 2)) > nNumeric(element_at(m, 1))
          struct(
            delim.as("delimiter"),
            hasHeader.cast("long").as("has_header"),
            when(cnt >= 0, cnt + 1).otherwise(lit(1L)).as("n_cols"),
            p.getField("nl").as("n_rows"))
        }), 1)
      }), 1)
  }
}
