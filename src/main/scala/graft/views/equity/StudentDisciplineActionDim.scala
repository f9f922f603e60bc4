package graft.views.equity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DateKeys, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT equity.StudentDisciplineActionDim — reference
  * parquet/amt/equity/student_discipline_action_dim/main.py:33-241.
  *
  * disciplineActions with its two arrays exploded (disciplines for the
  * descriptor, staffs for the assigning user), joined to the descriptor
  * description and restricted to currently-enrolled students. The
  * reference normalizes the two arrays separately and left-merges them
  * back on the action key (so actions × disciplines × staffs fan out) —
  * two explodes on one pass give the same product. */
object StudentDisciplineActionDim extends AmtView {
  val name = "equity_studentDisciplineActionDim"
  val collection = "equity"
  val outputColumns = Seq(
    "StudentDisciplineActionKey", "StudentSchoolKey", "DisciplineDateKey",
    "StudentKey", "SchoolKey", "DisciplineActionDescription", "UserKey")
  val endpointDeps = Seq(
    "disciplineActions", "disciplineDescriptors", "studentSchoolAssociations")

  def build(ctx: ViewContext): DataFrame = {
    val actions = ctx.endpoint("disciplineActions")
      .withColumn("discipline", explode_outer(col("disciplines")))
      .withColumn("staff", explode_outer(col("staffs")))
      .select(
        col("disciplineActionIdentifier"),
        DateKeys.dateKey(col("disciplineDate")).as("disciplineDateKey"),
        col("studentReference.studentUniqueId").as("studentUniqueId"),
        Descriptors.codeValueFromUri(col("discipline.disciplineDescriptor"))
          .as("disciplineCode"),
        coalesce(col("staff.staffReference.staffUniqueId"), lit("")).as("UserKey"))

    val descriptors = ctx.endpoint("disciplineDescriptors").select(
      col("codeValue").as("disciplineCode"),
      col("description").as("DisciplineActionDescription"))

    val enrolled = ctx.endpoint("studentSchoolAssociations").select(
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      col("schoolReference.schoolId").as("schoolId"),
      DateKeys.dateKey(col("exitWithdrawDate")).as("exitKey"))
      .filter(col("exitKey") === "" || col("exitKey") >= DateKeys.todayKey)

    val studentKey = col("studentUniqueId")
    val schoolKey = col("schoolId").cast("string")

    actions
      .join(broadcast(descriptors), Seq("disciplineCode"), "left")
      .join(enrolled, Seq("studentUniqueId"), "inner")
      .select(
        concat_ws("-", col("disciplineActionIdentifier"),
          col("disciplineDateKey"), studentKey, schoolKey)
          .as("StudentDisciplineActionKey"),
        concat_ws("-", studentKey, schoolKey).as("StudentSchoolKey"),
        col("disciplineDateKey").as("DisciplineDateKey"),
        studentKey.as("StudentKey"),
        schoolKey.as("SchoolKey"),
        col("DisciplineActionDescription"),
        col("UserKey"))
      .select(outputColumns.map(col): _*)
  }
}
