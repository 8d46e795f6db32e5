package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown-document structure ops — the md side of the corpus bridge
  * whose html side is [[Html.toMarkdown]]. Curated/github-style corpora
  * carry per-document metadata as YAML FRONTMATTER (`---` fenced
  * key: value block before the body); a pipeline wants it split off and
  * parsed so the body never carries metadata tokens into training and
  * the metadata becomes real columns. */
object Markdown {

  /** Split a document into `struct(meta map<string,string>, body)`.
    * The frontmatter block is the leading `---\n…\n---` fence (absent →
    * empty map, body = whole text). Inside, each `key: value` line
    * contributes one map entry (value trimmed, inline `[a, b]` lists
    * kept as their raw string — callers split; nested YAML is out of
    * scope for a corpus scanner and such lines are skipped, not
    * misparsed). Two anchored regex scans + one line fold — pure
    * map-side Column work. */
  def frontmatter(text: Column): Column = {
    val block = regexp_extract(text, "(?s)^---\n(.*?)\n---(?:\n|$)", 1)
    val body = when(length(block) > 0,
      regexp_replace(text, "(?s)^---\n.*?\n---\n?", ""))
      .otherwise(text)
    val entries = transform(
      filter(split(block, "\n"),
        l => l.rlike("^[A-Za-z_][A-Za-z0-9_]*:")),
      l => struct(
        regexp_extract(l, "^([A-Za-z_][A-Za-z0-9_]*):", 1).as("key"),
        btrim(regexp_extract(l, "^[A-Za-z_][A-Za-z0-9_]*:\\s*(.*)$", 1))
          .as("value")))
    struct(map_from_entries(entries).as("meta"), body.as("body"))
  }

  /** An inline `[a, b, c]` YAML list value as an array of trimmed
    * strings; a non-list value becomes a 1-element array (YAML's
    * scalar-or-list duality, resolved the way a tag column wants it). */
  def inlineList(value: Column): Column =
    when(value.rlike("^\\[.*\\]$"),
      transform(split(regexp_replace(value, "^\\[|\\]$", ""), ","),
        v => btrim(v)))
      .otherwise(array(btrim(value)))
}
