package graft.text

/** THE engine-wide text tokenizer, as one shared SQL expression.
  *
  * Every text/dedup operator that composes with another (shingles,
  * windows, suffix ranks, BPE words, entropy, language markers) MUST
  * tokenize identically, or cross-operator equivalence claims —
  * probe ≡ one-shot, excision ∘ detection, funnel-bit parity — break
  * silently. Fourteen call sites used to carry this string literal
  * verbatim; this constant makes the invariant structural. Semantics:
  * lower-case, split on any non-`[a-z]` run (DIGITS ARE SEPARATORS —
  * "s0 s1" collapses to two copies of "s"), drop empties. The DuckDB
  * oracles express the same fold as
  * `list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')`.
  */
object Tok {
  /** Tokenize an arbitrary string column (SQL-expression string; use
    * inside `expr(...)` or string-interpolated SQL fragments). */
  def alphaToksOf(column: String): String =
    s"filter(split(lower($column), '[^a-z]+'), x -> x != '')"

  /** Tokenize a column named `text`. */
  val alphaToks: String = alphaToksOf("text")
}
