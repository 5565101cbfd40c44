package graft.model

import org.scalatest.funsuite.AnyFunSuite

class FtmModelSpec extends AnyFunSuite {

  test("is_a closure follows the inheritance chain") {
    assert(FtmModel.isA("Person", "LegalEntity"))
    assert(FtmModel.isA("Person", "Thing"))
    assert(FtmModel.isA("Company", "Organization"))
    assert(FtmModel.isA("Company", "Thing"))
    assert(!FtmModel.isA("Thing", "Person"))
    assert(!FtmModel.isA("Vessel", "LegalEntity"))
  }

  test("commonSchema narrows to the more specific schema") {
    assert(FtmModel.commonSchema("Person", "LegalEntity").contains("Person"))
    assert(FtmModel.commonSchema("LegalEntity", "Person").contains("Person"))
    assert(FtmModel.commonSchema("Thing", "Vessel").contains("Vessel"))
    assert(FtmModel.commonSchema("Company", "Company").contains("Company"))
  }

  test("commonSchema finds a common descendant for siblings") {
    // LegalEntity vs Organization: Organization is_a LegalEntity
    assert(FtmModel.commonSchema("LegalEntity", "Organization").contains("Organization"))
  }

  test("incompatible schemata have no common schema") {
    assert(FtmModel.commonSchema("Person", "Vessel").isEmpty)
    assert(FtmModel.commonSchema("Sanction", "Company").isEmpty)
  }

  test("edge schemata expose source/target props") {
    val own = FtmModel.schemata("Ownership")
    assert(own.isEdge && own.edgeSource.contains("owner") && own.edgeTarget.contains("asset"))
    assert(!FtmModel.schemata("Family").edgeDirected)
    assert(!FtmModel.schemata("Person").isEdge)
  }

  test("entityRefProps include inherited edge endpoints") {
    assert(FtmModel.entityRefProps("Ownership") == Set("owner", "asset"))
    assert(FtmModel.entityRefProps("Sanction") == Set("entity"))
  }

  test("descendants power schema-filter expansion") {
    assert(FtmModel.descendants("Organization").contains("Company"))
    assert(FtmModel.descendants("Thing").contains("Person"))
  }
}
