package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Access to `private[spark]` status APIs (same approach as the sql-side
  * `graftbridge.Bridge`): the app status store lists ALL jobs including
  * those submitted under job groups, which the public StatusTracker's
  * `getJobIdsForGroup(null)` excludes.
  */
object CoreBridge {
  /** (jobId, status, jobGroup-or-null) for every job the app has run. */
  def jobs(sc: SparkContext): Seq[(Int, String, String)] =
    sc.statusStore.jobsList(null).map(j =>
      (j.jobId, j.status.toString, j.jobGroup.orNull)).toSeq
}
