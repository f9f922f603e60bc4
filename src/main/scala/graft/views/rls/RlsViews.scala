package graft.views.rls

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, DescriptorMap, Descriptors}
import graft.views.{AmtView, ViewContext}

/** RLS (row-level security) scope list — reference
  * parquet/amt/rls/rls_staff_classification_descriptor_scope_list/main.py:
  * 24-64: the AuthorizationScope.* rows of the descriptor-constant map. */
object RlsStaffClassificationDescriptorScopeList extends AmtView {
  val name = "rls_staffClassificationDescriptorScopeList"
  val collection = "rls"
  val outputColumns = Seq("AuthorizationScopeName", "CodeValue")
  val endpointDeps = Seq.empty

  def build(ctx: ViewContext): DataFrame =
    DescriptorMap.dataFrame(ctx.spark)
      .filter(col("constantName").startsWith("AuthorizationScope."))
      .select(
        col("constantName").as("AuthorizationScopeName"),
        col("codeValue").as("CodeValue"))
}

/** RLS user authorization — reference
  * parquet/amt/rls/rls_user_authorization/main.py:34-285.
  *
  * Staff ed-org assignments restricted to AuthorizationScope.* roles,
  * left-joined to the staff's section assignments. Permission columns are
  * scope-conditional (the reference's `.loc[mask] =` cascade →
  * when/otherwise): District/School scopes grant 'ALL' sections;
  * Section scope grants the specific section (id and 5-part key);
  * District additionally carries its org id. Section-scope rows require a
  * currently-active section assignment (endDate ≥ today). */
object RlsUserAuthorization extends AmtView {
  val name = "rls_userAuthorization"
  val collection = "rls"
  val outputColumns = Seq(
    "UserKey", "UserScope", "StudentPermission", "SectionPermission",
    "SectionKeyPermission", "SchoolPermission", "DistrictId")
  val endpointDeps = Seq(
    "staffEducationOrganizationAssignmentAssociations", "staffSectionAssociations")

  def build(ctx: ViewContext): DataFrame = {
    val assignments = DescriptorMap.withConstant(
      ctx.endpoint("staffEducationOrganizationAssignmentAssociations").select(
        col("staffReference.staffUniqueId").as("UserKey"),
        Descriptors.idFromHref(col("staffReference.link.href")).as("staffReferenceId"),
        col("staffClassificationDescriptor"),
        col("educationOrganizationReference.educationOrganizationId").as("edOrgId")),
      "staffClassificationDescriptor")
      .withColumnRenamed("staffClassificationDescriptor_constantName", "UserScope")
      .filter(col("UserScope").startsWith("AuthorizationScope."))

    val sections = ctx.endpoint("staffSectionAssociations").select(
      Descriptors.idFromHref(col("staffReference.link.href")).as("staffReferenceId"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("sectionReferenceId"),
      DateKeys.dateKey(col("endDate")).as("sectionEndKey"),
      concat_ws("-",
        col("sectionReference.schoolId").cast("string"),
        col("sectionReference.localCourseCode"),
        col("sectionReference.schoolYear").cast("string"),
        col("sectionReference.sectionIdentifier"),
        col("sectionReference.sessionName")).as("sectionKey"))
      .distinct()

    val districtOrSchool = col("UserScope").isin(
      "AuthorizationScope.District", "AuthorizationScope.School")
    val isSection = col("UserScope") === "AuthorizationScope.Section"

    assignments
      .join(sections, Seq("staffReferenceId"), "left")
      .filter(districtOrSchool ||
        (col("sectionEndKey") >= DateKeys.todayKey && col("sectionReferenceId").isNotNull))
      .select(
        col("UserKey"),
        col("UserScope"),
        lit("ALL").as("StudentPermission"),
        when(districtOrSchool, "ALL")
          .when(isSection, col("sectionReferenceId")).otherwise("")
          .as("SectionPermission"),
        when(districtOrSchool, "ALL")
          .when(isSection, col("sectionKey")).otherwise("")
          .as("SectionKeyPermission"),
        when(col("UserScope") === "AuthorizationScope.District", "ALL")
          .otherwise(col("edOrgId").cast("string")).as("SchoolPermission"),
        when(col("UserScope") === "AuthorizationScope.District",
          col("edOrgId").cast("string")).otherwise("").as("DistrictId"))
      .na.fill("", Seq("SectionPermission", "SectionKeyPermission", "DistrictId"))
      .distinct()
      .select(outputColumns.map(col): _*)
  }
}

/** RLS user dimension — reference parquet/amt/rls/rls_user_dim/main.py:
  * 26-99: staff joined to their exploded e-mails, kept only when the mail
  * type maps to the Email.Work constant. */
object RlsUserDim extends AmtView {
  val name = "rls_userDim"
  val collection = "rls"
  val outputColumns = Seq("UserKey", "UserEmail")
  val endpointDeps = Seq("staffs")

  def build(ctx: ViewContext): DataFrame = {
    val mails = ctx.endpoint("staffs")
      .withColumn("mail", explode(col("electronicMails")))
      .select(
        col("staffUniqueId").as("UserKey"),
        col("mail.electronicMailAddress").as("UserEmail"),
        col("mail.electronicMailTypeDescriptor").as("mailType"))
    DescriptorMap.withConstant(mails, "mailType")
      .filter(coalesce(col("mailType_constantName").contains("Email.Work"), lit(false)))
      .select(outputColumns.map(col): _*)
  }
}

/** RLS user→student authorization — reference
  * parquet/amt/rls/rls_user_student_data_authorization/main.py:36-422:
  * which staff member may see which student, as the union of three scope
  * paths (O2): District staff reach every enrolled student of their LEA's
  * schools, School staff every enrolled student of their school, Section
  * staff the students of their active sections. Active filters use the
  * reference's open-ended sentinel for missing end dates. */
object RlsUserStudentDataAuthorization extends AmtView {
  val name = "rls_userStudentDataAuthorization"
  val collection = "rls"
  val outputColumns = Seq("UserKey", "StudentKey")
  val endpointDeps = Seq(
    "staffEducationOrganizationAssignmentAssociations",
    "studentSchoolAssociations", "schools", "studentSectionAssociations",
    "staffSectionAssociations")

  def build(ctx: ViewContext): DataFrame = {
    val assignments = DescriptorMap.withConstant(
      ctx.endpoint("staffEducationOrganizationAssignmentAssociations").select(
        col("staffReference.staffUniqueId").as("UserKey"),
        col("staffClassificationDescriptor"),
        col("educationOrganizationReference.educationOrganizationId").as("edOrgId"),
        DateKeys.dateKey(col("endDate")).as("endKey")),
      "staffClassificationDescriptor")
      .withColumnRenamed("staffClassificationDescriptor_constantName", "scope")
      .filter(col("endKey") === "" || col("endKey") >= DateKeys.todayKey)

    val enrolled = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("StudentKey"),
      col("schoolReference.schoolId").as("schoolId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)
      .select("StudentKey", "schoolId")

    val schools = ctx.endpoint("schools").select(
      col("schoolId"),
      col("localEducationAgencyReference.localEducationAgencyId").as("leaId"))

    val district = assignments
      .filter(col("scope") === "AuthorizationScope.District")
      .join(broadcast(schools), col("edOrgId") === col("leaId"), "inner")
      .join(enrolled, Seq("schoolId"), "inner")
      .select("UserKey", "StudentKey")

    val school = assignments
      .filter(col("scope") === "AuthorizationScope.School")
      .join(enrolled, col("edOrgId") === col("schoolId"), "inner")
      .select("UserKey", "StudentKey")

    val staffSections = ctx.endpoint("staffSectionAssociations").select(
      col("staffReference.staffUniqueId").as("UserKey"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("sectionReferenceId"))
      .distinct()
    val studentSections = ctx.endpoint("studentSectionAssociations").select(
      col("studentReference.studentUniqueId").as("StudentKey"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("sectionReferenceId"),
      DateKeys.dateKey(col("endDate")).as("sectionEndKey"))
      .filter(col("sectionEndKey") === "" || col("sectionEndKey") >= DateKeys.todayKey)
    val section = staffSections
      .join(studentSections, Seq("sectionReferenceId"), "inner")
      .select("UserKey", "StudentKey")

    district.unionByName(school).unionByName(section)
      .distinct()
      .select(outputColumns.map(col): _*)
  }
}

/** RLS student-section authorization — reference
  * parquet/amt/rls/rls_student_data_authorization/main.py:29-89: enrollment
  * spans per student-section with the section id recovered from the API
  * href. BeginDate/EndDate stay dates; the *Key columns are yyyyMMdd. */
object RlsStudentDataAuthorization extends AmtView {
  val name = "rls_studentDataAuthorization"
  val collection = "rls"
  val outputColumns = Seq(
    "StudentKey", "SchoolKey", "SectionId", "BeginDate", "EndDate",
    "BeginDateKey", "EndDateKey")
  val endpointDeps = Seq("studentSectionAssociations")

  def build(ctx: ViewContext): DataFrame =
    ctx.endpoint("studentSectionAssociations").select(
      col("studentReference.studentUniqueId").as("StudentKey"),
      col("sectionReference.schoolId").cast("string").as("SchoolKey"),
      Descriptors.idFromHref(col("sectionReference.link.href")).as("SectionId"),
      try_to_date(col("beginDate")).as("BeginDate"),
      try_to_date(col("endDate")).as("EndDate"),
      DateKeys.dateKey(col("beginDate")).as("BeginDateKey"),
      DateKeys.dateKey(col("endDate")).as("EndDateKey"))
      .select(outputColumns.map(col): _*)
}
