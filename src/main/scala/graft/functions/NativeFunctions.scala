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
    SparkSession.getActiveSession.exists(
      _.sessionState.functionRegistry.functionExists(FunctionIdentifier(name)))
}
