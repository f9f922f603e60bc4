package graft.views.base

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DescriptorMap, Descriptors}
import graft.views.{AmtView, ViewContext}

/** AMT ContactPersonDim — reference
  * parquet/amt/base/contact_person_dim/main.py:56-541 (the largest base
  * view): one row per (parent, student) association decorated with the
  * parent's typed addresses, phones and emails.
  *
  * Shape: studentParentAssociations ⋈(inner, parentUniqueId) parents, then
  * a left join per contact-channel type — Home/Physical/Mailing/Work/
  * Temporary address (main.py:186-278), Home/Mobile/Work phone
  * (main.py:322-368), Work/Personal email (main.py:416-449). Type
  * membership is the descriptor-constant lookup (`Address.Home` …); the
  * personal-email filter also accepts a lowercase code value containing
  * 'personal' (main.py:420 — `key_1` is the pandas merge-key column for
  * the lowered code value). Every per-type join keys on the parent id, so
  * after the first shuffle all nine reuse the same hash partitioning; the
  * per-type frames fan out rows when a parent has several addresses of one
  * type or several periods per address (main.py:151-159), which is
  * intentional reference parity, not a bug here.
  *
  * Semantics preserved from the reference:
  *   - Address string = street[, apt], city state zip (main.py:167-183),
  *     built AFTER ''-filling the parts.
  *   - The address-period endDate filter (main.py:161-165) is dead code
  *     there — jsonNormalize subsets to meta+recordMeta (pandasWrapper
  *     .py:76-79), and only beginDate is requested — so no date filter
  *     here either.
  *   - PrimaryEmailAddress: main.py:455-462 assigns 'Work' then
  *     unconditionally overwrites with the personal-indicator apply, so
  *     the observable output is 'Personal' when the personal email is
  *     flagged primary, else 'Not specified'.
  *   - ContactHomeAddress/PostalCode are NOT in the ''-fill list
  *     (main.py:500-506): they stay null when the parent has no home
  *     address.
  */
object ContactPersonDim extends AmtView {
  val name = "contactPersonDim"
  val collection = "base"
  val outputColumns = Seq(
    "UniqueKey", "ContactPersonKey", "StudentKey", "ContactFirstName",
    "ContactLastName", "RelationshipToStudent", "ContactHomeAddress",
    "ContactPhysicalAddress", "ContactMailingAddress", "ContactWorkAddress",
    "ContactTemporaryAddress", "HomePhoneNumber", "MobilePhoneNumber",
    "WorkPhoneNumber", "PrimaryEmailAddress", "PersonalEmailAddress",
    "WorkEmailAddress", "IsPrimaryContact", "StudentLivesWith",
    "IsEmergencyContact", "ContactPriority", "ContactRestrictions",
    "PostalCode")
  val endpointDeps = Seq("studentParentAssociations", "parents")

  def build(ctx: ViewContext): DataFrame = {
    val parents = ctx.endpoint("parents")

    val spa = ctx.endpoint("studentParentAssociations").select(
      col("parentReference.parentUniqueId").as("parentUniqueId"),
      col("studentReference.studentUniqueId").as("studentUniqueId"),
      col("primaryContactStatus"), col("livesWith"),
      col("emergencyContactStatus"), col("contactPriority"),
      col("contactRestrictions"),
      Descriptors.codeValueFromUri(col("relationDescriptor")).as("relation"))

    // --- addresses: explode, constant-tag, ''-fill parts, build the string,
    // then period fan-out on (id, raw type descriptor) (main.py:105-183)
    val addr0 = parents.select(col("id"), explode(col("addresses")).as("a"))
      .select(
        col("id"), col("a.addressTypeDescriptor").as("addressType"),
        coalesce(col("a.streetNumberName"), lit("")).as("street"),
        coalesce(col("a.apartmentRoomSuiteNumber"), lit("")).as("apt"),
        coalesce(col("a.city"), lit("")).as("city"),
        coalesce(Descriptors.codeValueFromUri(col("a.stateAbbreviationDescriptor")), lit(""))
          .as("state"),
        coalesce(col("a.postalCode"), lit("")).as("postalCode"))
    val addrTagged = DescriptorMap.withConstant(
      addr0.withColumnRenamed("addressType", "addressTypeDescriptor"),
      "addressTypeDescriptor")
      .withColumn("Address",
        concat(
          when(col("apt") =!= "", concat(col("street"), lit(", "), col("apt")))
            .otherwise(col("street")),
          lit(", "), col("city"), lit(" "), col("state"), lit(" "),
          col("postalCode")))
    val periods = parents.select(
      col("id"), explode(col("addresses")).as("a"))
      .select(col("id"), col("a.addressTypeDescriptor").as("addressTypeDescriptor"),
        explode(col("a.periods")).as("p"))
      .select(col("id"), col("addressTypeDescriptor"), col("p.beginDate").as("beginDate"))
    val addr = addrTagged.join(
      periods, Seq("id", "addressTypeDescriptor"), "left")

    def addrOfType(constant: String, outCol: String, extra: Seq[(String, String)] = Nil): DataFrame = {
      val base = addr
        .filter(coalesce(col("addressTypeDescriptor_constantName"), lit(""))
          .contains(constant))
      base.select((col("id") +: col("Address").as(outCol) +:
        extra.map { case (src, dst) => col(src).as(dst) }): _*)
    }

    // --- telephones: explode, constant-tag, one frame per type (main.py:300-338)
    val phones = DescriptorMap.withConstant(
      parents.select(col("id"), explode(col("telephones")).as("t"))
        .select(col("id"),
          coalesce(col("t.telephoneNumber"), lit("")).as("telephoneNumber"),
          col("t.telephoneNumberTypeDescriptor").as("telephoneNumberTypeDescriptor")),
      "telephoneNumberTypeDescriptor")
    def phoneOfType(constant: String, outCol: String): DataFrame =
      phones.filter(coalesce(col("telephoneNumberTypeDescriptor_constantName"), lit(""))
        .contains(constant))
        .select(col("id"), col("telephoneNumber").as(outCol))

    // --- emails: explode, constant-tag; personal also matches a lowered
    // code value containing 'personal' (main.py:416-423)
    val mails = DescriptorMap.withConstant(
      parents.select(col("id"), explode(col("electronicMails")).as("m"))
        .select(col("id"),
          coalesce(col("m.electronicMailAddress"), lit("")).as("electronicMailAddress"),
          col("m.electronicMailTypeDescriptor").as("electronicMailTypeDescriptor"),
          col("m.primaryEmailAddressIndicator").as("primaryInd")),
      "electronicMailTypeDescriptor")
    val mailConstant = coalesce(col("electronicMailTypeDescriptor_constantName"), lit(""))
    val workMail = mails.filter(mailConstant.contains("Email.Work"))
      .select(col("id"), col("electronicMailAddress").as("WorkEmailAddress"))
    val personalMail = mails.filter(
      mailConstant.contains("Email.Personal") ||
        lower(coalesce(Descriptors.codeValueFromUri(col("electronicMailTypeDescriptor")),
          lit(""))).contains("personal"))
      .select(col("id"),
        col("electronicMailAddress").as("PersonalEmailAddress"),
        col("primaryInd").as("personalPrimaryInd"))

    val base = spa.join(
      parents.select(col("id"), col("parentUniqueId"),
        col("firstName"), col("lastSurname")),
      Seq("parentUniqueId"), "inner")

    val joined = base
      .join(addrOfType("Address.Home", "ContactHomeAddress",
        Seq("postalCode" -> "homePostalCode")), Seq("id"), "left")
      .join(addrOfType("Address.Physical", "ContactPhysicalAddress"), Seq("id"), "left")
      .join(addrOfType("Address.Mailing", "ContactMailingAddress"), Seq("id"), "left")
      .join(addrOfType("Address.Work", "ContactWorkAddress"), Seq("id"), "left")
      .join(addrOfType("Address.Temporary", "ContactTemporaryAddress"), Seq("id"), "left")
      .join(phoneOfType("Telephone.Home", "HomePhoneNumber"), Seq("id"), "left")
      .join(phoneOfType("Telephone.Mobile", "MobilePhoneNumber"), Seq("id"), "left")
      .join(phoneOfType("Telephone.Work", "WorkPhoneNumber"), Seq("id"), "left")
      .join(workMail, Seq("id"), "left")
      .join(personalMail, Seq("id"), "left")

    def blank(c: String): org.apache.spark.sql.Column = coalesce(col(c), lit(""))

    joined.select(
      concat(col("parentUniqueId"), lit("-"), col("studentUniqueId")).as("UniqueKey"),
      col("parentUniqueId").as("ContactPersonKey"),
      col("studentUniqueId").as("StudentKey"),
      col("firstName").as("ContactFirstName"),
      col("lastSurname").as("ContactLastName"),
      col("relation").as("RelationshipToStudent"),
      col("ContactHomeAddress"),
      blank("ContactPhysicalAddress").as("ContactPhysicalAddress"),
      blank("ContactMailingAddress").as("ContactMailingAddress"),
      blank("ContactWorkAddress").as("ContactWorkAddress"),
      blank("ContactTemporaryAddress").as("ContactTemporaryAddress"),
      blank("HomePhoneNumber").as("HomePhoneNumber"),
      blank("MobilePhoneNumber").as("MobilePhoneNumber"),
      blank("WorkPhoneNumber").as("WorkPhoneNumber"),
      when(col("personalPrimaryInd") === true, "Personal").otherwise("Not specified")
        .as("PrimaryEmailAddress"),
      blank("PersonalEmailAddress").as("PersonalEmailAddress"),
      blank("WorkEmailAddress").as("WorkEmailAddress"),
      col("primaryContactStatus").cast("int").as("IsPrimaryContact"),
      coalesce(col("livesWith"), lit(false)).cast("int").as("StudentLivesWith"),
      col("emergencyContactStatus").cast("int").as("IsEmergencyContact"),
      coalesce(col("contactPriority").cast("int"), lit(0)).as("ContactPriority"),
      blank("contactRestrictions").as("ContactRestrictions"),
      col("homePostalCode").as("PostalCode"))
      .select(outputColumns.map(col): _*)
  }
}
