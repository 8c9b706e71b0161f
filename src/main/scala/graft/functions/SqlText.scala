package graft.functions

/** Portability helper for GENERATED oracle SQL that embeds caller-provided
  * strings: one definition of "quote a string literal" shared by every
  * generator (blocklist IN-lists, expectation-rule ids/descriptions), so a
  * value containing an apostrophe (a source named "o'reilly", a rule
  * described as "shipper's cutoff") quotes correctly everywhere instead of
  * silently corrupting one generated oracle while the Spark side keeps
  * working — the bug class a per-call-site `.replace` invites back the
  * first time a new generator forgets it.
  */
object SqlText {

  /** `raw` as a SQL string literal: embedded single quotes doubled (the
    * ANSI escape, identical in Spark SQL and DuckDB), wrapped in quotes. */
  def lit(raw: String): String = "'" + raw.replace("'", "''") + "'"
}
