package graft

/** Ported golden write tests (reference tests/write_test.py,
  * delete_test.py). */
class WriteSpec extends SparkSpec {

  test("no insert") { // write_test.py:10-21
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    v.write(Seq(Seq("Orange", "Holland"), Seq("Blue", "Belgium")), insert = false)
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "Belgium"), Seq("Blue", "France")),
      v.read())
  }

  test("no update") { // write_test.py:24-36
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    v.write(Seq(Seq("Orange", "Holland"), Seq("Blue", "Belgium")), update = false)
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "Belgium"),
      Seq("Blue", "France"), Seq("Orange", "Holland")), v.read())
  }

  test("no fields falls back to table definition") { // write_test.py:39-51
    val env = freshEnv()
    env.view("country").write(Seq(Seq("Italy")))
    check(Seq(Seq("Belgium"), Seq("Italy"), Seq("France"), Seq("Holland")),
      env.view("country").read())
  }

  test("simple purge") { // write_test.py:54-64
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val cnt = v.write(Seq(Seq("Orange", "Holland"), Seq("Blue", "France")),
      purge = true, insert = false, update = false)
    assert(cnt.deleted == 2)
    check(Seq(Seq("Blue", "France")), v.read())
  }

  test("filter purge") { // write_test.py:67-82
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val cnt = v.write(
      Seq(Seq("Red", "Belgium"), Seq("Blue", "France"), Seq("Purple", "France")),
      purge = true, filters = Seq("""(= country.name "Belgium")"""))
    assert(cnt.deleted == 1)
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "France")), v.read())
  }

  test("partial write preserves unmapped columns and ids") { // write_test.py:85-112
    val env = freshEnv()
    val fullView = env.view("member",
      Seq("name", "team.country.name", "team.name", "registration_code"))
    val nameView = env.view("member", Seq("id", "name"))
    val id2name = rows(nameView.read()).map(r => r.head -> r(1)).toMap

    env.view("member", Seq("name", "registration_code"))
      .write(Seq(Seq("Bob", "001")))

    val res = fullView.readOne(Seq("""(= name "Bob")""")).get
    assert(res.toSeq.forall(_ != null))
    rows(nameView.read()).foreach { r => assert(id2name(r.head) == r(1)) }
  }

  test("write by id") { // write_test.py:114-124
    val env = freshEnv()
    val v = env.view("country", Seq("id", "name"))
    val recordId = v.readOne(Seq("""(= name "Belgium")""")).get.getLong(0)
    v.write(Seq(Seq(recordId, "BELGIUM")))
    assert(v.readOne(Seq("""(= name "Belgium")""")).isEmpty)
    assert(v.readOne(Seq("""(= name "BELGIUM")""")).get.getLong(0) == recordId)
  }

  test("nullable fk") { // write_test.py:127-141
    val env = freshEnv()
    env.view("member", Seq("registration_code", "team.name", "team.country.name"))
      .write(Seq(Seq("test", null, null)))
    val res = env.view("member", Seq("team"))
      .readOne(Seq("""(= registration_code "test")""")).get
    assert(res.isNullAt(0))
  }

  test("purge filters") { // write_test.py:144-163
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    v.write(Seq(Seq("Red", "Belgium")), purge = true,
      filters = Seq("""(= country.name "Belgium")"""))
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "France")), v.read())

    v.write(Seq(Seq("Red", "Belgium")), purge = true,
      filters = Seq("""(!= country.name "Belgium")"""))
    check(Seq(Seq("Red", "Belgium")), v.read())
  }

  test("write filters count") { // write_test.py:166-190 shape
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val cnt = v.write(
      Seq(Seq("Yellow", "Belgium"), Seq("Magenta", "France")),
      filters = Seq("""(= country.name "Belgium")"""))
    assert(cnt.filtered == 1)
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "Belgium"), Seq("Blue", "France"),
      Seq("Yellow", "Belgium")), v.read())
  }

  test("null key rejected") { // write_test.py:276-291
    val env = freshEnv()
    for (bogus <- Seq(null, Long.box(0L), "", "0")) {
      intercept[Exception] {
        env.view("team", Seq("name", "country")).write(Seq(Seq("Pink", bogus)))
      }
      intercept[Exception] {
        env.view("team", Seq("name", "country.name")).write(Seq(Seq("Pink", bogus)))
      }
    }
  }

  test("unknown fk value raises") { // view.py:700-711
    val env = freshEnv()
    val e = intercept[IllegalArgumentException] {
      env.view("team", Seq("name", "country.name"))
        .write(Seq(Seq("Pink", "Narnia")))
    }
    assert(e.getMessage.contains("not known in table"))
  }

  test("write from maps and single map") { // view.py:398-416
    val env = freshEnv()
    env.view("country", Seq("name")).write(Seq(Map("name" -> "Italy")))
    env.view("country", Seq("name")).write(Map("name" -> "Spain"))
    assert(rows(env.view("country", Seq("name")).read()).size == 5)
  }

  test("write from DataFrame") {
    val env = freshEnv()
    val s = spark
    import s.implicits._
    val df = Seq(("Green", "Holland")).toDF("name", "country.name")
    env.view("team", Seq("name", "country.name")).write(df)
    assert(rows(env.view("team").read()).size == 4)
  }

  test("defaults applied on insert") { // base_test.py:51-52
    val env = freshEnv()
    val created = env.view("member", Seq("created_at"))
      .readOne(Seq("""(= registration_code "001")""")).get
    assert(!created.isNullAt(0))
  }

  test("missing key column rejected") { // write_test.py / view.py:451-467
    val env = freshEnv()
    val e = intercept[IllegalArgumentException] {
      env.view("team", Seq("name")).write(Seq(Seq("Pink")))
    }
    assert(e.getMessage.contains("key"))
  }

  test("delete by data") { // delete_test.py
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val n = v.delete(data = Seq(Seq("Blue", "Belgium")))
    assert(n == 1)
    check(Seq(Seq("Red", "Belgium"), Seq("Blue", "France")), v.read())
  }

  test("delete by data swap") {
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val n = v.delete(data = Seq(Seq("Blue", "Belgium")), swap = true)
    assert(n == 2)
    check(Seq(Seq("Blue", "Belgium")), v.read())
  }

  test("delete by filter with join") {
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val n = v.delete(filters = Seq("""(= country.name "Belgium")"""))
    assert(n == 2)
    check(Seq(Seq("Blue", "France")), v.read())
  }

  test("delete all") {
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    assert(v.delete() == 3)
    check(Nil, v.read())
  }

  test("fetch and save") { // base_test.py:172-178, view.py:714-727
    val env = freshEnv()
    env.save("country", Map("name" -> "Italy"))
    val rec = env.fetch("country", """(= name "Italy")""")
    assert(rec.isDefined && rec.get("name") == "Italy")
    assert(env.fetch("country", """(= name "Narnia")""").isEmpty)
  }

  test("seed values written at createTables") { // base_test.py:38-41
    val env = freshEnv(seedTeams = false)
    check(Seq(Seq("Belgium"), Seq("France"), Seq("Holland")),
      env.view("country", Seq("name")).read())
  }

  test("createTables is idempotent") { // init_test.py:4-6
    val env = freshEnv()
    env.createTables()
    check(Seq(Seq("Belgium"), Seq("France"), Seq("Holland")),
      env.view("country", Seq("name")).read())
    assert(rows(env.view("team").read()).size == 3)
  }

  test("surrogate ids deterministic across identical runs") {
    // two-phase id assignment (Write.assignIds) must give every key the
    // same id in two independent envs — id = maxId + rank in key order
    def idMap(): Map[Any, Any] = {
      val env = freshEnv()
      val batch = (1 to 97).map(i => Seq(f"team-$i%03d", "France"))
      env.view("team", Seq("name", "country.name")).write(batch)
      rows(env.view("team", Seq("name", "id")).read())
        .map(r => r.head -> r(1)).toMap
    }
    assert(idMap() == idMap())
  }

  test("maxId comes from the manifest, not a table scan") {
    val env = freshEnv()
    val before = env.warehouse.maxId("team")
    assert(before == 3L)
    // blow away the data files; the manifest alone must still answer
    val dir = new java.io.File(env.warehouse.root, "team")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    dir.listFiles().filter(_.getName.startsWith("snap-")).foreach(rm)
    assert(env.warehouse.maxId("team") == before)
  }

  test("ids monotone across writes, reset by delete-all") {
    val env = freshEnv()
    val v = env.view("country", Seq("name"))
    v.write(Seq(Seq("Italy")))
    v.write(Seq(Seq("Spain")))
    val ids = rows(env.view("country", Seq("name", "id")).read())
      .map(r => r.head.toString -> r(1).asInstanceOf[Long]).toMap
    assert(ids("Spain") > ids("Italy"))
    // reference semantics: max(id) of the live table seeds the next
    // insert, so delete-all restarts ids from 1
    env.view("country").delete()
    v.write(Seq(Seq("Portugal")))
    val fresh = rows(env.view("country", Seq("id")).read()).map(_.head)
    assert(fresh == Seq(1L))
  }

  test("writeResult counts update vs insert") {
    val env = freshEnv()
    val v = env.view("team", Seq("name", "country.name"))
    val cnt = v.write(Seq(Seq("Blue", "Belgium"), Seq("Pink", "Holland")))
    assert(cnt.filtered == 0 && cnt.deleted == 0)
    assert(rows(v.read()).size == 4)
  }

  test("runtime table registration with FK-dotted seed values") {
    // reference tests/utils_test.py:60-80 (ctx.register + create_table)
    import graft.schema.{ColType, ColumnDef, TableDef}
    import org.apache.spark.sql.types.LongType
    val env = freshEnv()
    val sponsor = TableDef.normalized("sponsor", Seq(
      ColumnDef("name", ColType.VarcharT),
      ColumnDef("country", ColType.M2O("country", "id", LongType)),
      ColumnDef("type", ColType.VarcharT)),
      key = Seq("name", "country"),
      values = Seq(Map("name" -> "ACME-2000", "country.name" -> "Belgium",
        "type" -> "gold")))
    val env2 = env.register(sponsor)
    check(Seq(Seq("ACME-2000", "Belgium", "gold")),
      env2.view("sponsor").read())
    // pre-existing data untouched; introspection sees the new table
    assert(rows(env2.view("team").read()).size == 3)
    val auto = Env.introspect(spark, env.warehouse.root)
    assert(auto.registry.has("sponsor"))
  }

  test("unicode round trip through writes and filters") {
    // reference tests/encoding_test.py
    val env = freshEnv()
    val v = env.view("country", Seq("name"))
    v.write(Seq(Seq("日本"), Seq("Corée")))
    assert(rows(v.read(Seq("""(= name "日本")"""))) == Seq(Seq("日本")))
    assert(rows(v.read(Seq(graft.view.FilterEq(Map("name" -> "Corée")))))
      == Seq(Seq("Corée")))
  }

  test("snapshot time travel: previous state readable within GC window") {
    val env = freshEnv(seedTeams = false)
    val v = env.view("country", Seq("name"))
    v.write(Seq(Seq("Italy")))
    v.write(Seq(Seq("Spain")))
    val snaps = env.warehouse.snapshots("country")
    assert(snaps.size >= 2, snaps.toString)
    // the previous snapshot still shows the pre-Spain state
    val prev = env.warehouse.readSnapshot("country", snaps(snaps.size - 2))
    assert(rows(prev.select("name")).map(_.head).toSet ==
      Set("Belgium", "France", "Holland", "Italy"))
    // current read sees both writes
    assert(rows(v.read()).map(_.head).toSet ==
      Set("Belgium", "France", "Holland", "Italy", "Spain"))
    intercept[IllegalArgumentException] {
      env.warehouse.readSnapshot("country", "snap-99999")
    }
  }

  test("schema migration: added column null-fills reads, realigns writes") {
    // reference add_columns semantics (tanker/context.py:609-632):
    // reopening a populated warehouse with a schema that has an extra
    // column must not lose data; old snapshots read the new column as
    // NULL, the next write realigns the stored layout.
    val v1 =
      """- table: gadget
        |  columns:
        |    name: varchar
        |    qty: integer
        |  key: [name]
        |""".stripMargin
    val v2 =
      """- table: gadget
        |  columns:
        |    name: varchar
        |    qty: integer
        |    note: varchar
        |  key: [name]
        |""".stripMargin
    val root = java.nio.file.Files.createTempDirectory("graft-mig-").toString
    val e1 = Env(spark, graft.schema.Registry.fromYaml(v1), root)
    e1.createTables()
    e1.view("gadget", Seq("name", "qty")).write(Seq(Seq("a", 1), Seq("b", 2)))

    val e2 = Env(spark, graft.schema.Registry.fromYaml(v2), root)
    e2.createTables() // idempotent: must NOT wipe the populated table
    check(Seq(Seq("a", 1, null), Seq("b", 2, null)),
      e2.view("gadget", Seq("name", "qty", "note")).read())

    // a write through the new schema: note lands, unmapped qty survives
    e2.view("gadget", Seq("name", "note")).write(Seq(Seq("a", "hello")))
    check(Seq(Seq("a", 1, "hello"), Seq("b", 2, null)),
      e2.view("gadget", Seq("name", "qty", "note")).read())

    // the persisted _SCHEMA.yaml now carries the migrated shape
    val auto = Env.introspect(spark, root)
    check(Seq(Seq("a", 1, "hello"), Seq("b", 2, null)),
      auto.view("gadget", Seq("name", "qty", "note")).read())
  }
}
