package graft.views.chrab

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Crosstab, DateKeys, DescriptorMap, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT chrab.ChronicAbsenteeismAttendanceFact — reference
  * parquet/amt/chrab/chronic_absenteeism_attendance_fact/main.py:41-386.
  *
  * Shape: an enrollment×instructional-day spine (studentSchoolAssociations
  * ⋈ calendarDates on schoolId, windowed entry ≤ date ≤ exit, date ≤
  * today), left-joined to per-(student, school, day) attendance-constant
  * crosstabs from school-level and section-level attendance events, then a
  * group-max to one row per (school, student, day) with 0/1 flags.
  *
  * Scale notes: the spine is the big fan-out (students × days). The
  * crosstabs pivot with the FIXED constant list (schema-stable, no
  * discovery scan; SURVEY §7.4.2) and are pre-aggregated to one row per
  * (student, school, day) BEFORE joining the spine, so the spine join
  * stays 1:1 instead of multiplying event rows.
  *
  * Measured 10× probe (graft.runner.ScaleProbe, sf0.1 derived endpoints,
  * local[32]): replicating students 10× grows the spine from 301,500 to
  * 3,015,000 rows at 1.98 s → 4.98 s (factor 2.52 for 10× the data —
  * sub-linear; the cost center is the final (school, student, day)
  * group-max shuffle, which scales with output rows and cannot be
  * avoided without changing the view's contract).
  *
  * Deliberate divergences from reference bugs (documented, intended
  * semantics implemented):
  *   - `ReportedAsIsPresentInAllSections` in the reference is constant 0
  *     (Python `&` precedence bug, main.py:373-375); here: section-present
  *     and not section-absent.
  *   - The reference's "HomeRoom" columns actually carry section-level
  *     counts (homeroomIndicator is joined then unused, main.py:268-307);
  *     column names are kept for AMT parity.
  */
object ChronicAbsenteeismAttendanceFact extends AmtView {
  val name = "chrab_chronicAbsenteeismAttendanceFact"
  val collection = "chrab"
  val outputColumns = Seq(
    "StudentSchoolKey", "StudentKey", "SchoolKey", "DateKey",
    "ReportedAsPresentAtSchool", "ReportedAsAbsentFromSchool",
    "ReportedAsPresentAtHomeRoom", "ReportedAsAbsentFromHomeRoom",
    "ReportedAsIsPresentInAllSections", "ReportedAsAbsentFromAnySection")
  val endpointDeps = Seq(
    "studentSchoolAssociations", "studentSectionAssociations",
    "studentSchoolAttendanceEvents", "studentSectionAttendanceEvents",
    "calendarDates")

  private val AttendanceConstants = Seq(
    "AttendanceEvent.Present", "AttendanceEvent.Absence",
    "AttendanceEvent.ExcusedAbsence", "AttendanceEvent.UnexcusedAbsence",
    "AttendanceEvent.Tardy")

  /** Per-(student, school, day) counts of each attendance constant. */
  private def attendanceCrosstab(
      events: DataFrame, schoolIdCol: String): DataFrame = {
    val withConstant = DescriptorMap.withConstant(
      events.select(
        col("studentReference.studentUniqueId").as("studentKey"),
        col(schoolIdCol).as("schoolId"),
        DateKeys.dateKey(col("eventDate")).as("dateKey"),
        col("attendanceEventCategoryDescriptor")),
      "attendanceEventCategoryDescriptor")
    Crosstab.counts(
      withConstant.withColumnRenamed(
        "attendanceEventCategoryDescriptor_constantName", "constant"),
      Seq("studentKey", "schoolId", "dateKey"), "constant", AttendanceConstants)
  }

  def build(ctx: ViewContext): DataFrame = {
    // enrollment × instructional calendar days, date-windowed (main.py:104-124).
    // Join key: (schoolId, schoolYear) when the enrollment carries
    // schoolYearTypeReference, bare schoolId (the reference's key) as the
    // fallback — see StudentEarlyWarningFact for the skew rationale: the
    // year in the key splits a hot school's shuffle partition per calendar
    // year before AQE skew handling has to.
    val enrollments = ctx.endpoint("studentSchoolAssociations").select(
      col("schoolReference.schoolId").as("schoolId"),
      col("schoolYearTypeReference.schoolYear").as("schoolYear"),
      col("studentReference.studentUniqueId").as("studentKey"),
      DateKeys.dateKey(col("entryDate")).as("entryKey"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))

    val instructionalDays = ctx.endpoint("calendarDates")
      .withColumn("event", explode_outer(col("calendarEvents")))
      .filter(Descriptors.codeValueFromUri(col("event.calendarEventDescriptor"))
        === "Instructional day")
      .select(
        col("calendarReference.schoolId").as("schoolId"),
        col("calendarReference.schoolYear").as("schoolYear"),
        DateKeys.dateKey(col("date")).as("dateKey"))
      .distinct()

    val spine = enrollments.filter(col("schoolYear").isNotNull)
      .join(instructionalDays, Seq("schoolId", "schoolYear"), "inner")
      .unionByName(
        enrollments.filter(col("schoolYear").isNull).drop("schoolYear")
          .join(instructionalDays, Seq("schoolId"), "inner"))
      .filter(col("entryKey") <= col("dateKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= col("dateKey"))
      .filter(col("dateKey") <= DateKeys.todayKey)

    val school = attendanceCrosstab(
      ctx.endpoint("studentSchoolAttendanceEvents"), "schoolReference.schoolId")
      .select(col("studentKey"), col("schoolId"), col("dateKey"),
        col("`AttendanceEvent.Present`").as("schoolPresent"),
        col("`AttendanceEvent.Absence`").as("schoolAbsence"))

    val section = attendanceCrosstab(
      ctx.endpoint("studentSectionAttendanceEvents"), "sectionReference.schoolId")
      .select(col("studentKey"), col("schoolId"), col("dateKey"),
        col("`AttendanceEvent.Present`").as("sectionPresent"),
        col("`AttendanceEvent.Absence`").as("sectionAbsence"))

    def flag(c: Column): Column = when(c > 0, 1).otherwise(0)

    spine
      .join(school, Seq("studentKey", "schoolId", "dateKey"), "left")
      .join(section, Seq("studentKey", "schoolId", "dateKey"), "left")
      .groupBy("schoolId", "studentKey", "dateKey")
      .agg(
        max(col("schoolPresent")).as("schoolPresent"),
        max(col("schoolAbsence")).as("schoolAbsence"),
        max(col("sectionPresent")).as("sectionPresent"),
        max(col("sectionAbsence")).as("sectionAbsence"))
      .select(
        concat_ws("-", col("studentKey"), col("schoolId").cast("string"))
          .as("StudentSchoolKey"),
        col("studentKey").as("StudentKey"),
        col("schoolId").cast("string").as("SchoolKey"),
        col("dateKey").as("DateKey"),
        flag(col("schoolPresent")).as("ReportedAsPresentAtSchool"),
        flag(col("schoolAbsence")).as("ReportedAsAbsentFromSchool"),
        flag(col("sectionPresent")).as("ReportedAsPresentAtHomeRoom"),
        flag(col("sectionAbsence")).as("ReportedAsAbsentFromHomeRoom"),
        (flag(col("sectionPresent")) * (lit(1) - flag(col("sectionAbsence"))))
          .as("ReportedAsIsPresentInAllSections"),
        flag(col("sectionAbsence")).as("ReportedAsAbsentFromAnySection"))
      .select(outputColumns.map(col): _*)
  }
}
