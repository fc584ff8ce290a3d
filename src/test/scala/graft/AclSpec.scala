package graft

/** Ported ACL write-filter tests (reference tests/acl_test.py) —
  * including the "nasty" new-vs-old filter evaluation. */
class AclSpec extends SparkSpec {

  val memberCols = Seq("name", "team.country.name", "team.name", "registration_code")

  test("acl-write filters inserts on own column") { // acl_test.py:39-50
    val env = freshEnv()
    env.view("member").delete()
    env.aclWrite += ("member" -> Seq("""(= registration_code "001")"""))
    val v = env.view("member", Seq("registration_code", "name"))
    val cnt = v.write(Seq(Seq("001", "Bob"), Seq("002", "Alice")))
    assert(cnt.filtered == 1)
    check(Seq(Seq("001", "Bob")), v.read())
  }

  test("acl-write filters inserts on relation") { // acl_test.py:52-60
    val env = freshEnv()
    env.view("member").delete()
    env.aclWrite += ("member" -> Seq("""(= team.name "Blue")"""))
    val cnt = env.view("member", memberCols).write(Seq(
      Seq("Bob", "Belgium", "Blue", "001"),
      Seq("Alice", "Belgium", "Red", "002")))
    assert(cnt.filtered == 1)
    check(Seq(Seq("001", "Bob")),
      env.view("member", Seq("registration_code", "name")).read())
  }

  test("acl-write filters updates against stored values") { // acl_test.py:62-78
    val env = freshEnv()
    env.aclWrite += ("member" -> Seq("""(= registration_code "001")"""))
    val v = env.view("member", Seq("registration_code", "name"))
    val cnt = v.write(Seq(Seq("001", "BOB"), Seq("002", "ALICE")))
    assert(cnt.filtered == 1)
    assert(rows(env.view("member", Seq("name")).read()).map(_.head).toSet ==
      Set("Alice", "BOB", "Trudy"))
  }

  test("acl-write relation filter on update") { // acl_test.py:80-96
    val env = freshEnv()
    env.aclWrite += ("member" -> Seq("""(= team.name "Blue")"""))
    val v = env.view("member", Seq("registration_code", "name"))
    v.write(Seq(Seq("001", "BOB"), Seq("002", "ALICE")))
    check(Seq(Seq("001", "BOB"), Seq("002", "Alice")),
      v.read(Seq("""(in registration_code "001" "002")""")))
  }

  test("nasty: filter column itself changes value") { // acl_test.py:97-107
    val env = freshEnv()
    env.aclWrite += ("member" -> Seq("""(= team.name "Blue")"""))
    val v = env.view("member",
      Seq("registration_code", "team.name", "team.country.name"))
    v.write(Seq(
      Seq("001", "Red", "Belgium"),  // Blue -> Red transition: new fails
      Seq("002", "Blue", "Belgium"))) // Red -> Blue transition: old fails
    check(Seq(Seq("001", "Blue", "Belgium"), Seq("002", "Red", "Belgium")),
      v.read(Seq("""(in registration_code "001" "002")""")))
  }
}
