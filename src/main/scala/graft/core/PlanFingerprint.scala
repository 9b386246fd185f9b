package graft.core

import org.apache.spark.sql.DataFrame

/** Physical-plan SHAPE fingerprint, for round-over-round drift
  * detection in the bench artifact: a plan regression (a new
  * Exchange, a lost pushdown, a broadcast turned shuffle) should be
  * as diffable as a timing regression. `PlanHygieneSpec` guards known
  * pathologies; the fingerprint catches *drift* — any change in the
  * executed plan's operator structure flips the hash, and the bench
  * artifact records one hash per query (`plans` map), so
  * `SelfCheck` can diff two rounds' artifacts without re-running
  * anything.
  *
  * The hash must be stable across runs of the same code/conf, so
  * [[normalize]] strips every run-variant token — expression ids,
  * codegen/plan ids, object addresses, absolute paths (side-dump
  * dirs are run-scoped), and all numeric literals (row-count and
  * size statistics vary with data) — keeping operator names and tree
  * structure. Two different plans can in principle collide after
  * numeric erasure, but operator-structure changes (the thing worth
  * flagging) always survive it.
  */
object PlanFingerprint {

  def normalize(plan: String): String = plan
    // JVM lambda runtime identities: Lambda$123/0x00007f... varies
    // per JVM (and per classloading order within one)
    .replaceAll("Lambda\\$\\d+/(0x)?[0-9a-fA-F]+", "Lambda@x")
    .replaceAll("@[0-9a-fA-F]{4,}", "@x")
    .replaceAll("file:[^\\s,\\])]+", "file:x")
    .replaceAll("(?:/[A-Za-z0-9_.\\-]+){2,}", "/x")
    .replaceAll("#\\d+[A-Za-z]*", "#x")
    .replaceAll("\\d+", "N")
    // collapse uniform numeric lists (partition-pruning IN lists, isin
    // literals): their LENGTH is data/run-dependent — e.g. the adaptive
    // prober's probed-cell union varies with convergence — and length
    // is not plan SHAPE
    .replaceAll("\\(N(?:,\\s*N)*\\)", "(N..)")
    .replaceAll("\\[N(?:,\\s*N)*\\]", "[N..]")

  /** 12-hex-char digest of the normalized EXECUTED plan (post-AQE
    * when the df has run, which is when Bench calls this). */
  def of(df: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalize(df.queryExecution.executedPlan.toString)
      .getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }
}
