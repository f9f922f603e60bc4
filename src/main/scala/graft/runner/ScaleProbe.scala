package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Lake}
import graft.ops.Stats
import graft.views.ViewContext

/** Scale probe for the view pipeline: measures how the deep spine views
  * (ews_studentEarlyWarningFact, chrab_chronicAbsenteeismAttendanceFact)
  * behave when the endpoint data is replicated `k`× — the same
  * measured-not-asserted scaling evidence the Dedup operators document.
  *
  * Replication multiplies STUDENTS (each replica gets a distinct
  * studentUniqueId suffix) while keeping the school set fixed, which is
  * exactly how a real district lake grows: the hot school's key weight
  * grows k×, so this probe exercises the skew path, not just volume.
  * Alongside the timings it prints [[Stats.keySkew]] for the spine join
  * key at both scales — the data-driven input to a salting decision.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... runMain graft.runner.ScaleProbe [k]`.
  * Measured results are recorded in the StudentEarlyWarningFact scaladoc.
  */
object ScaleProbe {

  /** q27-shaped endpoint frames derived from the sf tables, replicated
    * `k`× by student. */
  private def endpoints(
      spark: SparkSession, dir: String, k: Int): Map[String, DataFrame] = {
    val lake = Lake(spark, dir)
    val replicas = spark.range(k.toLong).select(col("id").as("replica"))
    val cust = lake.customer
      .select(col("c_custkey"), col("c_nationkey"))
      .crossJoin(broadcast(replicas))
      .select(col("c_custkey"), col("c_nationkey"),
        concat_ws("-", col("c_custkey"), col("replica")).as("studentId"))

    val ssa = cust.select(
      struct(col("c_nationkey").cast("long").as("schoolId")).as("schoolReference"),
      struct(lit(1995L).as("schoolYear")).as("schoolYearTypeReference"),
      struct(col("studentId").as("studentUniqueId")).as("studentReference"),
      lit("1995-01-05").as("entryDate"),
      when(col("c_custkey") % 10 === 0, "1995-01-20")
        .otherwise(lit(null).cast("string")).as("exitWithdrawDate"))

    val jan = lake.orders
      .filter(col("o_orderdate").between("1995-01-01", "1995-01-31"))
    val cal = jan.select(col("o_orderdate").cast("string").as("date")).distinct()
      .crossJoin(lake.nation.select(col("n_nationkey")))
      .select(
        struct(
          col("n_nationkey").cast("long").as("schoolId"),
          lit(1995L).as("schoolYear")).as("calendarReference"),
        col("date"),
        array(struct(
          when(dayofmonth(to_date(col("date"))) % 5 =!= 0,
            "uri://ed-fi.org/CalendarEventDescriptor#Instructional day")
            .otherwise("uri://ed-fi.org/CalendarEventDescriptor#Holiday")
            .as("calendarEventDescriptor"))).as("calendarEvents"))

    val att = jan.join(cust, col("o_custkey") === col("c_custkey"))
      .select(
        struct(col("c_nationkey").cast("long").as("schoolId")).as("schoolReference"),
        struct(col("studentId").as("studentUniqueId")).as("studentReference"),
        col("o_orderdate").cast("string").as("eventDate"),
        concat(lit("uri://ed-fi.org/AttendanceEventCategoryDescriptor#"),
          element_at(
            array(lit("In Attendance"), lit("Tardy"),
              lit("Excused Absence"), lit("Unexcused Absence")),
            (col("o_orderkey") % 4 + 1).cast("int")))
          .as("attendanceEventCategoryDescriptor"))

    Map(
      "studentSchoolAssociations" -> ssa,
      "calendarDates" -> cal,
      "studentSchoolAttendanceEvents" -> att)
  }

  private def runView(
      spark: SparkSession, dir: String, k: Int, view: String): (Double, Long) = {
    val eps = endpoints(spark, dir, k)
    lazy val ctx: ViewContext = ViewContext(
      spark,
      endpoint = n => eps.getOrElse(n, spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.core.EndpointCatalog.schema(n))),
      view = n => AmtRegistry.byName(n).build(ctx))
    val t0 = System.nanoTime()
    val rows = ctx.view(view).count()
    ((System.nanoTime() - t0) / 1e9, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val k = if (args.nonEmpty) args(0).toInt else 10
    val cpus = GraftSession.defaultParallelism
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scale-probe"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("ews_studentEarlyWarningFact", "chrab_chronicAbsenteeismAttendanceFact")
      .foreach { view =>
        val (w1, r1) = runView(spark, sfDir, 1, view)   // warm plan paths
        val (t1, _) = runView(spark, sfDir, 1, view)
        val (tk, rk) = runView(spark, sfDir, k, view)
        println(f"""{"view":"$view","rows_1x":$r1,"t_1x":$t1%.2f,"rows_${k}x":$rk,"t_${k}x":$tk%.2f,"factor":${tk / t1}%.2f,"warm":$w1%.2f}""")
      }

    // spine-key skew at kx: the hot school's share under the bare key vs
    // the (schoolId, schoolYear)-composite key the spine actually uses
    val enr = endpoints(spark, sfDir, k)("studentSchoolAssociations")
      .select(col("schoolReference.schoolId").as("schoolId"),
        col("schoolYearTypeReference.schoolYear").as("schoolYear"))
    Stats.keySkew(enr, "schoolId", topN = 3).show(false)
    spark.stop()
  }
}
