package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT StaffSectionDim — reference
  * parquet/amt/base/staff_section_dim/main.py:40-236.
  *
  * Active staff-section assignments (endDate strictly after today,
  * main.py:74-77 — '' endDate does NOT pass the string compare, matching
  * the reference) inner-joined to staff attributes. Race collapse: more
  * than one race → 'Multiracial', none → 'Unknown', else the first race's
  * code value (main.py:153-169; expressed directly on the races array
  * instead of explode+count+dedup — same result, no shuffle).
  */
object StaffSectionDim extends AmtView {
  val name = "staffSectionDim"
  val collection = "base"
  val outputColumns = Seq(
    "StaffSectionKey", "UserKey", "SchoolKey", "SectionKey",
    "PersonalTitlePrefix", "StaffFirstName", "StaffMiddleName",
    "StaffLastName", "ElectronicMailAddress", "Sex", "BirthDate", "Race",
    "HispanicLatinoEthnicity", "HighestCompletedLevelOfEducation",
    "YearsOfPriorProfessionalExperience", "YearsOfPriorTeachingExperience",
    "HighlyQualifiedTeacher", "LoginId")
  val endpointDeps = Seq("staffSectionAssociations", "staffs")

  def build(ctx: ViewContext): DataFrame = {
    val ssa = ctx.endpoint("staffSectionAssociations")
      .select(
        col("staffReference.staffUniqueId").as("staffUniqueId"),
        col("sectionReference.schoolId").as("schoolId"),
        col("sectionReference.localCourseCode").as("localCourseCode"),
        col("sectionReference.schoolYear").as("sectionSchoolYear"),
        col("sectionReference.sectionIdentifier").as("sectionIdentifier"),
        col("sectionReference.sessionName").as("sessionName"),
        DateKeys.dateKey(col("endDate")).as("endDateKey"))
      .filter(col("endDateKey") > DateKeys.todayKey)

    val race = when(size(col("races")) > 1, lit("Multiracial"))
      .when(size(col("races")) === 1,
        Descriptors.codeValueFromUri(col("races").getItem(0).getField("raceDescriptor")))
      .otherwise(lit("Unknown"))

    val staff = ctx.endpoint("staffs")
      // one row per electronic mail, staff without mails kept (main.py:105-125)
      .withColumn("mail", explode_outer(col("electronicMails")))
      .select(
        col("staffUniqueId"), col("personalTitlePrefix"),
        col("firstName"), col("middleName"), col("lastSurname"),
        coalesce(col("mail.electronicMailAddress"), lit("")).as("electronicMailAddress"),
        Descriptors.codeValueFromUri(col("sexDescriptor")).as("sex"),
        col("birthDate"),
        race.as("race"),
        coalesce(col("hispanicLatinoEthnicity").cast("int"), lit(0))
          .as("hispanicLatinoEthnicity"),
        Descriptors.codeValueFromUri(col("highestCompletedLevelOfEducationDescriptor"))
          .as("highestCompletedLevelOfEducation"),
        col("yearsOfPriorProfessionalExperience"),
        col("yearsOfPriorTeachingExperience"),
        coalesce(col("highlyQualifiedTeacher").cast("int"), lit(0))
          .as("highlyQualifiedTeacher"),
        coalesce(col("loginId"), lit("")).as("loginId"))

    val schoolKey = col("schoolId").cast("string")
    ssa.join(staff, Seq("staffUniqueId"), "inner")
      .select(
        concat_ws("-", col("staffUniqueId"), schoolKey, col("localCourseCode"),
          col("sectionSchoolYear").cast("string"), col("sectionIdentifier"),
          col("sessionName")).as("StaffSectionKey"),
        col("staffUniqueId").as("UserKey"),
        schoolKey.as("SchoolKey"),
        concat_ws("-", schoolKey, col("localCourseCode"),
          col("sectionSchoolYear").cast("string"), col("sectionIdentifier"),
          col("sessionName")).as("SectionKey"),
        col("personalTitlePrefix").as("PersonalTitlePrefix"),
        col("firstName").as("StaffFirstName"),
        col("middleName").as("StaffMiddleName"),
        col("lastSurname").as("StaffLastName"),
        col("electronicMailAddress").as("ElectronicMailAddress"),
        col("sex").as("Sex"),
        col("birthDate").as("BirthDate"),
        col("race").as("Race"),
        col("hispanicLatinoEthnicity").as("HispanicLatinoEthnicity"),
        col("highestCompletedLevelOfEducation").as("HighestCompletedLevelOfEducation"),
        col("yearsOfPriorProfessionalExperience").as("YearsOfPriorProfessionalExperience"),
        col("yearsOfPriorTeachingExperience").as("YearsOfPriorTeachingExperience"),
        col("highlyQualifiedTeacher").as("HighlyQualifiedTeacher"),
        col("loginId").as("LoginId"))
      .select(outputColumns.map(col): _*)
  }
}
