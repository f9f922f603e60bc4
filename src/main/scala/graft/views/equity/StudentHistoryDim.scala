package graft.views.equity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, OrderedAgg}
import graft.views.{AmtView, ViewContext}

/** AMT equity.StudentHistoryDim — reference
  * parquet/amt/equity/student_history_dim/main.py:37-399: the deepest
  * view-on-view node (6 dependencies, SURVEY §3.3), resolved through the
  * pipeline's shared memoized registry (§7.4.8).
  *
  * Per current student-school: enrollment history (ordered school list),
  * attendance rate from the chronic-absenteeism fact
  * (100·(enrolled−absent)/enrolled), referral count from the discipline
  * dim, and an ordered grade summary from grades ⋈ studentSectionDim.
  * All three aggregations shuffle on StudentSchoolKey/StudentKey — the
  * same key the final joins use, so Catalyst reuses the partitioning.
  *
  * Ordering note: the reference relies on pandas stable sort + groupby
  * order (SURVEY §7.4.3); here the sort keys are encoded into the
  * aggregation (descending via numeric negation, '' dates last). */
object StudentHistoryDim extends AmtView {
  val name = "equity_studentHistoryDim"
  val collection = "equity"
  val outputColumns = Seq(
    "StudentKey", "StudentSchoolKey", "GradeSummary", "CurrentSchoolKey",
    "AttendanceRate", "ReferralsAndSuspensions", "EnrollmentHistory")
  val endpointDeps = Seq("grades")
  override val viewDeps = Seq(
    "chrab_chronicAbsenteeismAttendanceFact", "schoolDim", "studentSchoolDim",
    "studentSectionDim", "allStudentSchoolDim", "equity_studentDisciplineActionDim")

  /** Descending sort key for yyyyMMdd strings inside stringAgg: negate the
    * numeric form; '' (and null) sort last. */
  private def descDateKey(c: Column): Column =
    -coalesce(when(c === "", null).otherwise(c).cast("long"), lit(-1L))

  def build(ctx: ViewContext): DataFrame = {
    // --- enrollment history per student (main.py:65-117)
    val enrollment = ctx.view("allStudentSchoolDim")
      .join(ctx.view("schoolDim").select("SchoolKey", "SchoolName"),
        Seq("SchoolKey"), "inner")
      .select(col("StudentKey"), col("IsEnrolled"),
        DateKeys.dateKey(col("ExitWithdrawDate")).as("exitKey"),
        when(col("ExitWithdrawDate") =!= "",
          concat(col("SchoolName"), lit(" "), col("ExitWithdrawDate")))
          .otherwise(col("SchoolName")).as("historyLine"))
      .distinct()
      .groupBy("StudentKey")
      .agg(OrderedAgg.stringAgg(col("historyLine"), " \n",
        -col("IsEnrolled"), descDateKey(col("exitKey"))).as("EnrollmentHistory"))

    // --- attendance rate per student-school (main.py:137-178)
    val attendance = ctx.view("chrab_chronicAbsenteeismAttendanceFact")
      .groupBy("StudentSchoolKey")
      .agg(
        count(lit(1)).as("daysEnrolled"),
        sum(col("ReportedAsAbsentFromHomeRoom")).as("daysAbsent"))
      .select(col("StudentSchoolKey"),
        (lit(100.0) * (col("daysEnrolled") - col("daysAbsent")) / col("daysEnrolled"))
          .as("AttendanceRate"))

    // --- referrals & suspensions per student-school (main.py:192-200)
    val discipline = ctx.view("equity_studentDisciplineActionDim")
      .groupBy("StudentSchoolKey")
      .agg(count(lit(1)).as("ReferralsAndSuspensions"))

    // --- ordered grade summary per student-school (main.py:248-311)
    val grades = ctx.endpoint("grades").select(
      col("studentSectionAssociationReference.studentUniqueId").as("studentKey"),
      col("studentSectionAssociationReference.schoolId").cast("string").as("schoolKey"),
      col("studentSectionAssociationReference.localCourseCode").as("localCourseCode"),
      col("studentSectionAssociationReference.schoolYear").cast("string").as("schoolYear"),
      col("studentSectionAssociationReference.sectionIdentifier").as("sectionIdentifier"),
      col("studentSectionAssociationReference.sessionName").as("sessionName"),
      DateKeys.dateKey(col("studentSectionAssociationReference.beginDate")).as("startKey"),
      col("numericGradeEarned"))
      .withColumn("StudentSectionKey",
        concat_ws("-", col("studentKey"), col("schoolKey"), col("localCourseCode"),
          col("schoolYear"), col("sectionIdentifier"), col("sessionName"),
          col("startKey")))

    val gradeSummary = grades
      .join(ctx.view("studentSectionDim")
        .select("StudentSectionKey", "StudentSchoolKey", "CourseTitle"),
        Seq("StudentSectionKey"), "inner")
      .withColumn("gradeLine",
        concat(col("CourseTitle"), lit(": "), col("numericGradeEarned").cast("string")))
      .groupBy("StudentSchoolKey")
      .agg(OrderedAgg.stringAgg(col("gradeLine"), "\n ",
        descDateKey(col("startKey"))).as("GradeSummary"))

    ctx.view("studentSchoolDim")
      .select(col("StudentKey"), col("StudentSchoolKey"),
        col("SchoolKey").as("CurrentSchoolKey"))
      .join(enrollment, Seq("StudentKey"), "inner")
      .join(attendance, Seq("StudentSchoolKey"), "left")
      .join(discipline, Seq("StudentSchoolKey"), "left")
      .join(gradeSummary, Seq("StudentSchoolKey"), "left")
      .na.fill(100.0, Seq("AttendanceRate"))
      .na.fill(0L, Seq("ReferralsAndSuspensions"))
      .na.fill("", Seq("GradeSummary"))
      .select(outputColumns.map(col): _*)
  }
}
