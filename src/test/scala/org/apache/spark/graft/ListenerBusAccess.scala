package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Test-only accessor for `SparkContext.listenerBus` (private[spark]).
  *
  * PlanQualitySpec's catalog-wide window sweep captures EVERY executed
  * plan of a query — including the plans of `localCheckpoint`
  * materialization jobs, which the final `queryExecution.executedPlan`
  * truncates away — via a `QueryExecutionListener`. Listener delivery
  * is asynchronous (events ride the shared LiveListenerBus), so the
  * sweep must drain the bus before reading its capture buffer; the
  * drain call is `private[spark]`, hence this shim lives in an
  * `org.apache.spark` subpackage. Test classpath only — never shipped.
  */
object ListenerBusAccess {
  /** Block until all posted listener events have been delivered
    * (bounded by LiveListenerBus's own internal timeout).
    */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
