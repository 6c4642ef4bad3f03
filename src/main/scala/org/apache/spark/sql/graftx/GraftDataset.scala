package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into the package-private Dataset factory: turning a custom
  * LogicalPlan node into a DataFrame requires `Dataset.ofRows`, which is
  * `private[sql]` — this object lives under `org.apache.spark.sql` solely
  * to re-export it to the graft operator layer (the same bridge shape
  * every Spark extension library ships). */
object GraftDataset {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
