package graft

/** Ported golden read tests (reference tests/read_test.py). */
class ReadSpec extends SparkSpec {

  test("filters") { // read_test.py:7-26
    val env = freshEnv()
    val v = env.view("team", Seq("name"))
    check(Seq(Seq("Blue")), v.read(Seq("""(= country.name "France")""")))
    check(Nil, v.read(Seq(
      """(= country.name "France")""", """(= country.name "Belgium")""")))
    check(Nil, v.read(Seq("(false)")))
    assert(rows(v.read(Seq("(true)"))).size == 3)
  }

  test("no fields defaults to table definition") { // read_test.py:29-34
    val env = freshEnv()
    check(Seq(Seq("Blue", "Belgium"), Seq("Blue", "France"), Seq("Red", "Belgium")),
      env.view("team").read())
  }

  test("o2m") { // read_test.py:37-42
    val env = freshEnv()
    check(Seq(Seq("Belgium", "Blue"), Seq("Belgium", "Red"),
        Seq("France", "Blue"), Seq("Holland", null)),
      env.view("country", Seq("name", "teams.name")).read())
  }

  test("args: positional, named, implicit, config, lists, objects") { // read_test.py:45-101
    val env = freshEnv()
    env.cfg += ("cfg_team" -> "Red")
    val v = env.view("team", Seq("name"))
    check(Seq(Seq("Blue"), Seq("Blue")),
      v.read(Seq("(= name {name})"), kwargs = Map("name" -> "Blue")))
    check(Seq(Seq("Red")), v.read(Seq("(= name {0})"), args = Seq("Red")))
    check(Seq(Seq("Blue"), Seq("Blue"), Seq("Red")),
      v.read(Seq("(or (= name {0}) (= name {1}))"), args = Seq("Red", "Blue")))
    check(Seq(Seq("Red")), v.read(Seq("(= name {})"), args = Seq("Red")))
    check(Seq(Seq("Blue"), Seq("Blue"), Seq("Red")),
      v.read(Seq("(or (= name {}) (= name {}))"), args = Seq("Red", "Blue")))
    check(Seq(Seq("Red")), v.read(Seq("(in name {cfg_team})")))
    check(Seq(Seq("Blue"), Seq("Blue"), Seq("Red")),
      v.read(Seq("(in name {names})"), kwargs = Map("names" -> Seq("Red", "Blue"))))
    check(Seq(Seq("Red")), v.read(Seq("(in name {data.name})"),
      kwargs = Map("data" -> Map("name" -> "Red"))))
  }

  test("limit and order") { // read_test.py:103-117
    val env = freshEnv()
    val v = env.view("country", Seq("name"))
    check(Seq(Seq("Belgium")), v.read(order = Seq(view.Order("name")), limit = Some(1)))
    check(Seq(Seq("Holland")),
      v.read(order = Seq(view.Order("name", "DESC")), limit = Some(1)))
    check(Seq(Seq("Belgium")),
      v.read(order = Seq(view.Order("name"), view.Order("name")), limit = Some(1)))
    check(Seq(Seq("Belgium")),
      v.read(order = Seq(view.Order("""(!= name "Belgium")""")), limit = Some(1)))
  }

  test("aliases as fields") { // read_test.py:120-141
    val env = freshEnv()
    env.aliases += ("type" -> "TYPE")
    check(Seq(Seq("France", "TYPE")),
      env.viewNamed("country", Seq("name" -> "name", "type" -> "{type}"))
        .read(Seq("""(= name "France")""")))
  }

  test("field expression evaluation") { // read_test.py:144-147
    val env = freshEnv()
    check(Seq(Seq(true), Seq(false), Seq(false)),
      env.view("country", Seq("""(= name "Belgium")""")).read())
  }

  test("aggregation") { // read_test.py:150-209
    val env = freshEnv()
    check(Seq(Seq(3L)), env.view("country", Seq("(count)")).read())
    check(Seq(Seq(3L)), env.view("country", Seq("(sum 1)")).read())
    check(Seq(Seq(1L)), env.view("country", Seq("(min 1)")).read())
    check(Seq(Seq(1L)), env.view("country", Seq("(max 1)")).read())
    check(Seq(Seq(2L)), env.view("country", Seq("(max (+ 1 1))")).read())
    // explicit groupby
    check(Seq(Seq("Blue", 2L), Seq("Red", 1L)),
      env.view("team", Seq("name", "(count)")).read(groupby = Seq("name")))
    // aggregate over all rows
    check(Seq(Seq("Red", 3L)), env.view("team", Seq("(max name)", "(count)")).read())
    // group on fk path not in select
    check(Seq(Seq("Red"), Seq("Blue")),
      env.view("team", Seq("(max name)"))
        .read(groupby = Seq("country.name"), order = Seq(view.Order("country.name"))))
    // auto-groupby
    check(Seq(Seq("Blue", 2L), Seq("Red", 1L)),
      env.view("team", Seq("name", "(count)")).read(order = Seq(view.Order("name"))))
    // group on expression via field name and via raw expression
    val vd = env.viewNamed("team",
      Seq("cnt" -> "(count)", "country_match" -> "(in country 1 2)"))
    rows(vd.read(groupby = Seq("country_match"))).foreach(r => assert(r.head == 3L))
    rows(vd.read(groupby = Seq("(in country 1 2)"))).foreach(r => assert(r.head == 3L))
    // group on several fields
    rows(env.view("team", Seq("(count)")).read(groupby = Seq("name", "country")))
      .foreach(r => assert(r.head == 1L))
  }

  test("cast") { // read_test.py:217-258
    val env = freshEnv()
    rows(env.view("country", Seq("(cast id (varchar))")).read())
      .foreach(r => assert(r.head.isInstanceOf[String]))
    rows(env.view("country", Seq("(cast id (float))")).read())
      .foreach(r => assert(r.head.isInstanceOf[Double]))
    rows(env.view("country", Seq("(cast id (bool))")).read())
      .foreach(r => assert(r.head.isInstanceOf[Boolean]))
    rows(env.view("member", Seq("(cast created_at (date))")).read())
      .foreach(r => assert(r.head.isInstanceOf[java.sql.Date]))
    rows(env.view("member", Seq("""(cast "1970-01-01" (timestamp))""")).read())
      .foreach(r => assert(r.head.isInstanceOf[java.time.LocalDateTime]))
  }

  test("like and ilike") { // read_test.py:261-273
    val env = freshEnv()
    val v = env.view("country", Seq("name"))
    check(Seq(Seq("Belgium"), Seq("France")), v.read(Seq("""(like name "%e%")""")))
    check(Seq(Seq("Holland")), v.read(Seq("""(ilike name "h%")""")))
    check(Seq(Seq("Holland")),
      v.read(Seq("(ilike name {prefix})"), kwargs = Map("prefix" -> "H%")))
  }

  test("distinct") { // read_test.py:331-335
    val env = freshEnv()
    val v = env.view("team", Seq("country.name"))
    assert(rows(v.read(distinct = true)).toSet == rows(v.read()).toSet)
    assert(rows(v.read(distinct = true)).size == 2)
  }

  test("one-row fetch") {
    val env = freshEnv()
    assert(env.view("team", Seq("name"))
      .readOne(Seq("""(= country.name "France")""")).map(_.getString(0))
      .contains("Blue"))
    assert(env.view("team", Seq("name"))
      .readOne(Seq("""(= country.name "Spain")""")).isEmpty)
  }

  test("limit/offset paging") {
    val env = freshEnv()
    val v = env.view("country", Seq("name"))
    check(Seq(Seq("France")),
      v.read(order = Seq(view.Order("name")), limit = Some(1), offset = Some(1)))
  }

  test("acl read filters") { // acl_test.py:22-37
    val env = freshEnv()
    env.aclRead += ("team" -> Seq("""(= country.name "Belgium")"""))
    check(Seq(Seq("Blue"), Seq("Red")), env.view("team", Seq("name")).read())
    check(Seq(Seq("Blue"), Seq("Blue"), Seq("Red")),
      env.view("team", Seq("name")).read(disableAcl = true))
  }
}
