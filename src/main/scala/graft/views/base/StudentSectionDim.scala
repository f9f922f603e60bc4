package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors, OrderedAgg}
import graft.views.{AmtView, ViewContext}

/** AMT StudentSectionDim — reference
  * parquet/amt/base/student_section_dim/main.py:39-399.
  *
  * Enrollment rows joined through the href-id chain
  * section → courseOffering → course → academicSubjectDescriptor, plus a
  * per-section teacher list aggregated from staffSectionAssociations ⋈
  * staffs (', '.join, main.py:274). The reference's join order relies on
  * pandas row order for the teacher list; we make it deterministic by
  * sorting on teacher name (A7 ordered string-agg, SURVEY §7.4.3).
  */
object StudentSectionDim extends AmtView {
  val name = "studentSectionDim"
  val collection = "base"
  val outputColumns = Seq(
    "StudentSectionKey", "StudentSchoolKey", "StudentKey", "SectionKey",
    "LocalCourseCode", "Subject", "CourseTitle", "TeacherName",
    "StudentSectionStartDateKey", "StudentSectionEndDateKey",
    "SchoolKey", "SchoolYear")
  val endpointDeps = Seq(
    "academicSubjectDescriptors", "studentSectionAssociations", "staffs",
    "staffSectionAssociations", "courses", "courseOfferings", "sections")

  def build(ctx: ViewContext): DataFrame = {
    val ssa = ctx.endpoint("studentSectionAssociations").select(
      col("studentReference.studentUniqueId").as("StudentKey"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("sectionReferenceId"),
      col("sectionReference.schoolId").cast("string").as("SchoolKey"),
      col("sectionReference.localCourseCode").as("LocalCourseCode"),
      col("sectionReference.schoolYear").cast("string").as("SchoolYear"),
      col("sectionReference.sectionIdentifier").as("SectionIdentifier"),
      col("sectionReference.sessionName").as("SessionName"),
      DateKeys.dateKey(col("beginDate")).as("StudentSectionStartDateKey"),
      DateKeys.dateKey(col("endDate")).as("StudentSectionEndDateKey"))

    val sections = ctx.endpoint("sections").select(
      col("id").as("sectionReferenceId"),
      Descriptors.idFromHref(col("courseOfferingReference.link.href"))
        .as("courseOfferingReferenceId"))

    val courseOfferings = ctx.endpoint("courseOfferings").select(
      col("id").as("courseOfferingReferenceId"),
      Descriptors.idFromHref(col("courseReference.link.href")).as("courseReferenceId"))

    val courses = ctx.endpoint("courses").select(
      col("id").as("courseReferenceId"),
      Descriptors.codeValueFromUri(col("academicSubjectDescriptor"))
        .as("academicSubjectDescriptorCodeValue"),
      col("courseTitle").as("CourseTitle"))

    val subjects = ctx.endpoint("academicSubjectDescriptors").select(
      col("codeValue").as("academicSubjectDescriptorCodeValue"),
      col("description").as("Subject"))

    // teacher list per section (main.py:236-287)
    val staffAssoc = ctx.endpoint("staffSectionAssociations").select(
      Descriptors.idFromHref(col("staffReference.link.href")).as("staffReferenceId"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("sectionReferenceId"))
    val staff = ctx.endpoint("staffs").select(
      col("id").as("staffReferenceId"),
      concat(col("firstName"), lit(" "), col("lastSurname")).as("teacher"))
    val teachers = staffAssoc.join(staff, Seq("staffReferenceId"), "inner")
      .groupBy("sectionReferenceId")
      .agg(OrderedAgg.stringAgg(col("teacher"), ", ", col("teacher")).as("TeacherName"))

    ssa
      .join(sections, Seq("sectionReferenceId"), "inner")
      .join(teachers, Seq("sectionReferenceId"), "left")
      .join(broadcast(courseOfferings), Seq("courseOfferingReferenceId"), "inner")
      .join(broadcast(courses), Seq("courseReferenceId"), "inner")
      .join(broadcast(subjects), Seq("academicSubjectDescriptorCodeValue"), "inner")
      .withColumn("TeacherName", coalesce(col("TeacherName"), lit("")))
      .select(
        concat_ws("-", col("StudentKey"), col("SchoolKey"), col("LocalCourseCode"),
          col("SchoolYear"), col("SectionIdentifier"), col("SessionName"),
          col("StudentSectionStartDateKey")).as("StudentSectionKey"),
        concat_ws("-", col("StudentKey"), col("SchoolKey")).as("StudentSchoolKey"),
        col("StudentKey"),
        concat_ws("-", col("SchoolKey"), col("LocalCourseCode"), col("SchoolYear"),
          col("SectionIdentifier"), col("SessionName")).as("SectionKey"),
        col("LocalCourseCode"), col("Subject"), col("CourseTitle"),
        col("TeacherName"), col("StudentSectionStartDateKey"),
        col("StudentSectionEndDateKey"), col("SchoolKey"), col("SchoolYear"))
      .select(outputColumns.map(col): _*)
  }
}
