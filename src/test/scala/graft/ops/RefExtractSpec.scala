package graft.ops

class RefExtractSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("Ref / Fn::GetAtt / Fn::Sub at arbitrary depth (etl_cfn:200-242)") {
    val json =
      """{"Resources": {
           "Fn1": {"Properties": {"Env": {"Variables": {
             "T": {"Ref": "MyTable"},
             "Q": {"Fn::GetAtt": ["MyQueue", "Arn"]},
             "U": {"Fn::Sub": "https://${MyApi}.example/${stage}"}
           }}}},
           "Deep": [{"a": [{"b": {"Ref": "Nested"}}]}]
         }}"""
    assert(RefExtract.extract(json) ==
      Seq("MyApi", "MyQueue", "MyTable", "Nested", "stage"))
  }

  test("Fn::Sub skips dotted attribute refs (etl_cfn:214-217 regex)") {
    val json = """{"Fn::Sub": "${Plain} and ${Table.Arn}"}"""
    assert(RefExtract.extract(json) == Seq("Plain"))
  }

  test("Fn::GetAtt string form takes the logical id") {
    assert(RefExtract.extract("""{"Fn::GetAtt": "Bucket.Arn"}""") == Seq("Bucket"))
  }

  test("SFN Resource ARNs collected and cleaned (etl_aws:1117-1147,1138)") {
    val json =
      """{"StartAt": "S1", "States": {
           "S1": {"Resource": "arn:aws:states:::lambda:invoke:sync", "Next": "S2"},
           "S2": {"Resource": "arn:aws:lambda:r:1:function:f*"},
           "S3": {"Resource": "not-an-arn"}
         }}"""
    assert(RefExtract.extract(json) ==
      Seq("arn:aws:lambda:r:1:function:f", "arn:aws:states:::lambda:invoke"))
  }

  test("invalid / null JSON → empty") {
    assert(RefExtract.extract("{nope") == Seq.empty)
    assert(RefExtract.extract(null) == Seq.empty)
  }

  test("S24: YAML long-form template via the fallback parse (etl_cfn:169-183)") {
    val yaml =
      """Resources:
        |  Fn1:
        |    Properties:
        |      Env:
        |        T:
        |          Ref: MyTable
        |        Q:
        |          Fn::GetAtt: [MyQueue, Arn]
        |        U:
        |          Fn::Sub: "https://${MyApi}.example"
        |""".stripMargin
    assert(RefExtract.extract(yaml) == Seq("MyApi", "MyQueue", "MyTable"))
  }

  test("S24: short-form YAML tags degrade to empty (safe_load parity)") {
    // the reference's yaml.safe_load rejects !Ref constructors; so do we
    assert(RefExtract.extract("T: !Ref MyTable") == Seq.empty)
  }

  test("S24: scalar YAML bodies yield no refs") {
    assert(RefExtract.extract("just a sentence, not a template") == Seq.empty)
  }

  test("result is sorted distinct") {
    val json = """[{"Ref":"B"},{"Ref":"A"},{"Ref":"B"}]"""
    assert(RefExtract.extract(json) == Seq("A", "B"))
  }

  test("arn cleanup order: suffix keywords then trailing junk") {
    assert(RefExtract.cleanArn("arn:a:b:async") == "arn:a:b")
    assert(RefExtract.cleanArn("arn:a:b:sync") == "arn:a:b")
    assert(RefExtract.cleanArn("arn:a:b*") == "arn:a:b")
    assert(RefExtract.cleanArn("arn:a:b:") == "arn:a:b")
  }
}
