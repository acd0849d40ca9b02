package graft.tools

import graft.SparkEntry

/** The ONE place probe query lists come from (round-15 VERDICT item 1:
  * the r15 ratio table silently lost q39_json_extract because its list
  * was assembled by external CSV plumbing whose name filter dropped a
  * row without erroring). Rules:
  *
  *  - `all` resolves to EVERY gate query, read directly from
  *    [[SparkEntry.queries]] — structurally complete by construction,
  *    no file or shell step in between;
  *  - an explicit CSV is validated name by name: an unknown name is an
  *    ERROR (the old `filter(contains)` silently dropped typos and
  *    renamed queries);
  *  - callers report `requested` vs `measured + errored` counts so a
  *    row lost anywhere downstream breaks parity loudly instead of
  *    shrinking the table.
  */
object ProbeQueries {

  /** Resolve a probe's query-list argument. `all` → the full gate
    * surface (sorted for stable output); otherwise a validated CSV.
    */
  def resolve(arg: String): Seq[String] = arg match {
    case "all" => SparkEntry.queries.keys.toSeq.sorted
    case csv =>
      val names = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(names.nonEmpty, "probe query list is empty")
      val unknown = names.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty,
        s"unknown gate queries: ${unknown.mkString(", ")} — names must " +
          "match SparkEntry.queries exactly (pass 'all' for every query)")
      names
  }

  /** The selected (name → query) map for a resolved list — total by
    * construction ([[resolve]] validated every name).
    */
  def select(names: Seq[String]): Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    names.map(n => n -> SparkEntry.queries(n)).toMap

  /** The parity self-check every probe prints and enforces: each
    * requested query must be accounted for as measured or errored —
    * anything else means a measurement artifact lost rows.
    */
  def parityLine(requested: Seq[String], measured: Iterable[String],
                 errored: Iterable[String]): String = {
    val missing = requested.toSet -- measured.toSet -- errored.toSet
    require(missing.isEmpty,
      s"probe parity violation: ${missing.mkString(", ")} neither " +
        "measured nor errored — the query list lost rows")
    s""""requested":${requested.size},"measured":${measured.size},""" +
      s""""errored":${errored.size},"parity":"OK""""
  }
}
