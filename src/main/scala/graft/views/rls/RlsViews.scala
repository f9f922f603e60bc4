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
