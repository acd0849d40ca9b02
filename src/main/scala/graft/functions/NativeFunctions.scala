package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** One place for the "is the native expression available here?" check the
  * Column-level helpers use to route between a codegen expression (when
  * [[graft.GraftExtensions]] is installed) and the kernel-UDF fallback.
  * Column helpers have no DataFrame in scope, so this consults the ACTIVE
  * session — always the session the returned Column is about to be
  * analyzed in for the engine's driver-side construction paths.
  */
object NativeFunctions {
  def registered(name: String): Boolean =
    SparkSession.getActiveSession.exists(registered(_, name))

  /** Prefer this overload anywhere a DataFrame is in scope: the check
    * must consult the session the returned plan will be ANALYZED in, and
    * in a multi-session app that is the frame's own session, not
    * whichever one happens to be active.
    */
  def registered(spark: SparkSession, name: String): Boolean =
    spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(name))

  /** Null-tolerant routing: the given session's registry when one is in
    * scope, else the active session's — the single spelling every routed
    * Column helper shares.
    */
  def route(spark: SparkSession, name: String): Boolean =
    if (spark != null) registered(spark, name) else registered(name)
}
