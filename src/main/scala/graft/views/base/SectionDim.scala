package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Descriptors
import graft.views.{AmtView, ViewContext}

/** AMT SectionDim — reference parquet/amt/base/section_dim/main.py:40-360.
  *
  * sections ⋈ courseOfferings ⋈ courses (href-id chain, inner) with left
  * lookups: sessions (term), schools (LEA key), and three descriptor
  * tables matched on the FULL namespace#codeValue URI (unlike the code
  * value joins elsewhere — the reference builds namespaceWithCodeValue for
  * these, main.py:61-99). Composite Description/SectionName/SessionKey
  * string columns with '' null-fills before concatenation. */
object SectionDim extends AmtView {
  val name = "sectionDim"
  val collection = "base"
  val outputColumns = Seq(
    "SchoolKey", "SectionKey", "Description", "SectionName", "SessionName",
    "LocalCourseCode", "SchoolYear", "EducationalEnvironmentDescriptor",
    "LocalEducationAgencyKey", "CourseTitle", "SessionKey")
  val endpointDeps = Seq(
    "academicSubjectDescriptors", "educationalEnvironmentDescriptors",
    "termDescriptors", "courses", "courseOfferings", "schools", "sections",
    "sessions")

  private def descriptorByUri(df: DataFrame, as: String): DataFrame =
    df.select(
      concat(col("namespace"), lit("#"), col("codeValue")).as(s"${as}Uri"),
      col("description").as(s"${as}Description"))

  def build(ctx: ViewContext): DataFrame = {
    val sections = ctx.endpoint("sections").select(
      col("sectionIdentifier"),
      col("courseOfferingReference.schoolId").as("schoolId"),
      col("courseOfferingReference.localCourseCode").as("localCourseCode"),
      col("courseOfferingReference.schoolYear").as("schoolYear"),
      col("courseOfferingReference.sessionName").as("sessionName"),
      col("educationalEnvironmentDescriptor").as("envUri"),
      Descriptors.idFromHref(col("courseOfferingReference.link.href"))
        .as("courseOfferingReferenceId"))

    val offerings = ctx.endpoint("courseOfferings").select(
      col("id").as("courseOfferingReferenceId"),
      Descriptors.idFromHref(col("courseReference.link.href")).as("courseReferenceId"),
      Descriptors.idFromHref(col("sessionReference.link.href")).as("sessionReferenceId"))

    val courses = ctx.endpoint("courses").select(
      col("id").as("courseReferenceId"),
      col("courseTitle"),
      col("academicSubjectDescriptor").as("subjectUri"))

    val sessions = ctx.endpoint("sessions").select(
      col("id").as("sessionReferenceId"),
      col("termDescriptor").as("termUri"))

    val schools = ctx.endpoint("schools").select(
      col("schoolId"),
      col("localEducationAgencyReference.localEducationAgencyId").as("leaId"))

    val subjects = descriptorByUri(ctx.endpoint("academicSubjectDescriptors"), "subject")
    val terms = descriptorByUri(ctx.endpoint("termDescriptors"), "term")
    val envs = descriptorByUri(ctx.endpoint("educationalEnvironmentDescriptors"), "env")

    def blank(c: String): org.apache.spark.sql.Column = coalesce(col(c), lit(""))
    val schoolKey = col("schoolId").cast("string")
    val yearKey = col("schoolYear").cast("string")

    sections
      .join(offerings, Seq("courseOfferingReferenceId"), "inner")
      .join(broadcast(courses), Seq("courseReferenceId"), "inner")
      .join(broadcast(sessions), Seq("sessionReferenceId"), "left")
      .join(broadcast(schools), Seq("schoolId"), "left")
      .join(broadcast(subjects), Seq("subjectUri"), "left")
      .join(broadcast(terms), Seq("termUri"), "left")
      .join(broadcast(envs), Seq("envUri"), "left")
      .select(
        schoolKey.as("SchoolKey"),
        concat_ws("-", schoolKey, col("localCourseCode"), yearKey,
          col("sectionIdentifier"), col("sessionName")).as("SectionKey"),
        concat(blank("subjectDescription"), lit("-("), blank("localCourseCode"),
          lit(")-"), blank("courseTitle"), lit("-"), blank("termDescription"))
          .as("Description"),
        concat(blank("localCourseCode"), lit("-"), blank("sessionName"))
          .as("SectionName"),
        col("sessionName").as("SessionName"),
        col("localCourseCode").as("LocalCourseCode"),
        yearKey.as("SchoolYear"),
        blank("envDescription").as("EducationalEnvironmentDescriptor"),
        coalesce(col("leaId").cast("string"), lit("")).as("LocalEducationAgencyKey"),
        col("courseTitle").as("CourseTitle"),
        concat_ws("-", schoolKey, yearKey, col("sessionName")).as("SessionKey"))
      .select(outputColumns.map(col): _*)
  }
}
