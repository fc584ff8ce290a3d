package graft

import graft.expr.{Parser, PyFormat, Strftime}

/** Expression language unit tests: parser shapes, param formatting
  * (tests/chunk_test.py), strftime translation, exists/in subqueries
  * (tests/expression_static_test.py behavior, asserted on results and
  * physical plan shape rather than SQL text), field-env aliases
  * (tests/expression_test.py:88-114). */
class ExprSpec extends SparkSpec {

  test("parser: nesting, strings, numbers, params") {
    import graft.expr.Ast._
    assert(Parser.parse("(= name \"x\")") ==
      Node(Seq(Word("="), Word("name"), Str("x"))))
    assert(Parser.parse("(+ 1 2.5)") == Node(Seq(Word("+"), Num(1L), Num(2.5))))
    assert(Parser.parse("{x.y!r:>5}").isInstanceOf[Param])
    val p = Parser.parse("{x.y!r:>5}").asInstanceOf[Param]
    assert(p.key == "x" && p.tail == Seq("y") &&
      p.conversion.contains("r") && p.fmtSpec.contains(">5"))
    intercept[IllegalArgumentException](Parser.parse("(= a b) extra"))
    intercept[IllegalArgumentException](Parser.parse("(= a"))
  }

  test("pyformat specs") { // tests/chunk_test.py:4-13
    assert(PyFormat.format(5, ">5") == "    5")
    assert(PyFormat.format("ab", "<4") == "ab  ")
    assert(PyFormat.format(3.14159, ".2f") == "3.14")
    assert(PyFormat.format(42, "06d") == "000042")
    assert(PyFormat.convert("x", "r") == "'x'")
  }

  test("strftime translation") {
    assert(Strftime.toJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Strftime.toJava("%H:%M:%S") == "HH:mm:ss")
    assert(Strftime.toJava("%Y-%m-%dT%H:%M:%S.%f") == "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
  }

  test("exists compiles to deterministic flag join (no monotonically_increasing_id)") {
    val env = freshEnv()
    val df = env.view("country", Seq("name")).read(Seq(
      "(exists (from team (select 1) (where (= country _parent.id))))"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("monotonically_increasing_id"), plan)
    check(Seq(Seq("Belgium"), Seq("France")), df)
  }

  test("not exists keeps unmatched parents") {
    val env = freshEnv()
    check(Seq(Seq("Holland")),
      env.view("country", Seq("name")).read(Seq(
        "(not (exists (from team (select 1) (where (= country _parent.id)))))")))
  }

  test("in-subquery") { // expression_static_test.py:156-167 behavior
    val env = freshEnv()
    check(Seq(Seq("Blue"), Seq("Red")),
      env.view("team", Seq("name")).read(Seq(
        """(in country (from country (select id) (where (= name "Belgium"))))""")))
  }

  test("exists sub-select with dotted joins inside") {
    // expression_static_test.py:133-153 behavior: the sub-select's own
    // WHERE walks FK paths (member -> team -> country)
    val env = freshEnv()
    check(Seq(Seq("Blue", 1L), Seq("Red", 3L)),
      env.viewNamed("team", Seq("name" -> "name", "id" -> "id")).read(
        Seq("""(exists (from member (select 1) (where (and (= team _parent.id) (= team.country.name "Belgium")))))"""),
        order = Seq(view.Order("id"))))
  }

  test("multi-level _parent: nested in-subqueries two scopes deep") {
    // tests/expression_static_test.py:112-127 (test_multi_parent):
    // countries having a team with a member whose name equals the
    // COUNTRY's name — the inner sub correlates with its grandparent.
    val env = freshEnv()
    env.view("member",
      Seq("name", "team.country.name", "team.name", "registration_code"))
      .write(Seq(Seq("France", "France", "Blue", "004")))
    check(Seq(Seq("France")),
      env.view("country", Seq("name")).read(Seq(
        """(in id (from team (select country) (where
          |  (in id (from member (select team) (where
          |    (and (= team _parent.id)
          |         (= name _parent._parent.name))))))))""".stripMargin)))
    // no member named after any country -> empty
    val env2 = freshEnv()
    check(Nil,
      env2.view("country", Seq("name")).read(Seq(
        """(in id (from team (select country) (where
          |  (in id (from member (select team) (where
          |    (and (= team _parent.id)
          |         (= name _parent._parent.name))))))))""".stripMargin)))
  }

  test("multi-level _parent: nested exists two scopes deep") {
    val env = freshEnv()
    // countries with a team whose member's registration_code equals
    // the country's own name-length... keep it simple: member name =
    // grandparent country name (same data as above, exists form)
    env.view("member",
      Seq("name", "team.country.name", "team.name", "registration_code"))
      .write(Seq(Seq("Belgium", "Belgium", "Red", "005")))
    check(Seq(Seq("Belgium")),
      env.view("country", Seq("name")).read(Seq(
        """(exists (from team (select 1) (where
          |  (and (= country _parent.id)
          |       (exists (from member (select 1) (where
          |         (and (= team _parent.id)
          |              (= name _parent._parent.name)))))))))""".stripMargin)))
  }

  test("multi-level _parent under not pulls up when r-independent; one-level is fine") {
    val env = freshEnv()
    // the negated sub references only the grandparent, so since round 8
    // it pulls up one scope and computes instead of raising
    val countries = rows(env.view("country", Seq("id", "name")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String]))
    val teams = rows(env.view("team", Seq("country")).read())
      .map(_.head.asInstanceOf[Long])
    val memberNames = rows(env.view("member", Seq("name")).read())
      .map(_.head.asInstanceOf[String]).toSet
    val exp = countries.collect {
      case (cid, cname) if teams.contains(cid) &&
        !memberNames.contains(cname) => Seq(cname)
    }
    check(exp, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (= name _parent._parent.name)))))))))""".stripMargin)))
    // nested one-level exists inside an exists needs no carry and works
    check(Seq(Seq("Belgium"), Seq("France")),
      env.view("country", Seq("name")).read(Seq(
        """(exists (from team (select 1) (where
          |  (and (= country _parent.id)
          |       (exists (from member (select 1) (where
          |         (= team _parent.id))))))))""".stripMargin)))
  }

  test("non-equi exists correlation via min/max reduction") {
    val env = freshEnv()
    // teams having a member with id greater than the team's own id
    // (every team: member ids 1-3 vs team ids 1-3 — Blue/Belgium id 1
    // has members Bob id 1... compute expected from data)
    val teams = rows(env.view("team", Seq("id", "name")).read())
      .map(r => r.head.asInstanceOf[Long] -> r(1)).toMap
    val memberTeams = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val expect = teams.collect {
      case (tid, name) if memberTeams.exists { case (mid, mt) => mt == tid && mid > tid } =>
        Seq(name)
    }.toSeq
    check(expect, env.view("team", Seq("name")).read(Seq(
      "(exists (from member (select 1) (where (and (= team _parent.id) (> id _parent.id)))))")))
    // NOT EXISTS over an empty equi-group must be TRUE (coalesce path):
    // Holland has no teams at all
    val got = rows(env.view("country", Seq("name")).read(Seq(
      "(not (exists (from team (select 1) (where (and (= country _parent.id) (> id _parent.id))))))")))
    assert(got.map(_.head).contains("Holland"), got.toString)
  }

  test("two-plus non-equi exists conjuncts: joint satisfaction via tuple carry") {
    val env = freshEnv()
    val teams = rows(env.view("team", Seq("id", "name", "country")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String],
        r(2).asInstanceOf[Long]))
    val members = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

    // equi group + two monotone conjuncts (skyline-pruned path):
    // a member of the team with id > team.id and id < team.country+2
    val exp1 = teams.collect {
      case (tid, name, ctry) if members.exists { case (mid, mt) =>
        mt == tid && mid > tid && mid < ctry + 2 } => Seq(name)
    }
    check(exp1, env.view("team", Seq("name")).read(Seq(
      """(exists (from member (select 1) (where
        |  (and (= team _parent.id) (> id _parent.id)
        |       (< id (+ _parent.country 2))))))""".stripMargin)))

    // no equi conjunct: global tuple set, still exact
    val exp2 = teams.collect {
      case (tid, name, ctry) if members.exists { case (mid, _) =>
        mid > tid && mid < ctry + 2 } => Seq(name)
    }
    check(exp2, env.view("team", Seq("name")).read(Seq(
      """(exists (from member (select 1) (where
        |  (and (> id _parent.id) (< id (+ _parent.country 2))))))""".stripMargin)))

    // non-monotone mix (!= blocks skyline pruning, plain distinct)
    val exp3 = teams.collect {
      case (tid, name, ctry) if members.exists { case (mid, mt) =>
        mt == tid && mid > tid && mid != ctry } => Seq(name)
    }
    check(exp3, env.view("team", Seq("name")).read(Seq(
      """(exists (from member (select 1) (where
        |  (and (= team _parent.id) (> id _parent.id)
        |       (!= id _parent.country)))))""".stripMargin)))

    // NOT EXISTS: an outer row with NO equi-group (Holland has no
    // teams) must come back — null tuple array reads EXISTS=false
    val countries = rows(env.view("country", Seq("id", "name")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String]))
    val exp4 = countries.collect {
      case (cid, cname) if !teams.exists { case (tid, tname, tctry) =>
        tctry == cid && tid >= cid && tname > cname } => Seq(cname)
    }
    check(exp4, env.view("country", Seq("name")).read(Seq(
      """(not (exists (from team (select 1) (where
        |  (and (= country _parent.id) (>= id _parent.id)
        |       (> name _parent.name))))))""".stripMargin)))
  }

  test("exists distributes over or: correlated disjuncts, carries, negation") {
    val env = freshEnv()
    val countries = rows(env.view("country", Seq("id", "name")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String]))
    val teams = rows(env.view("team", Seq("id", "name", "country")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String],
        r(2).asInstanceOf[Long]))
    val members = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

    // two level-1 correlated disjuncts (raised before round 8)
    val exp1 = teams.collect {
      case (tid, name, _) if members.exists { case (mid, mt) =>
        mt == tid || mid > tid * 7 } => Seq(name)
    }
    check(exp1, env.view("team", Seq("name")).read(Seq(
      """(exists (from member (select 1) (where
        |  (or (= team _parent.id) (> id (* _parent.id 7))))))""".stripMargin)))

    // a deep carry under or: the nested member-exists references
    // _parent._parent — the split makes it a bare conjunct, so the
    // standard carry hoisting applies per variant
    val exp2 = countries.collect {
      case (cid, cname) if teams.exists { case (tid, _, _) =>
        tid == cid || members.exists { case (mid, _) => mid == cid } } =>
        Seq(cname)
    }
    check(exp2, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (or (= id _parent.id)
        |      (exists (from member (select 1) (where
        |        (= id _parent._parent.id))))))))""".stripMargin)))

    // NOT EXISTS over a correlated or
    val exp3 = countries.collect {
      case (cid, cname) if !teams.exists { case (tid, _, tctry) =>
        tctry == cid || tid > cid } => Seq(cname)
    }
    check(exp3, env.view("country", Seq("name")).read(Seq(
      """(not (exists (from team (select 1) (where
        |  (or (= country _parent.id) (> id _parent.id))))))""".stripMargin)))
  }

  test("r-independent negated subquery conjuncts pull up one scope") {
    val env = freshEnv()
    val countries = rows(env.view("country", Seq("id", "name")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String]))
    val teams = rows(env.view("team", Seq("id", "name", "country")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String],
        r(2).asInstanceOf[Long]))
    val members = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

    // the NOT EXISTS references only the grandparent (country), never
    // the team sub it syntactically sits in -> evaluated at the outer
    // scope instead of needing a complement-set carry (raised pre-r8)
    val exp = countries.collect {
      case (cid, cname) if teams.exists { case (_, _, tc) => tc == cid } &&
        !members.exists { case (mid, _) => mid > cid * 20 } => Seq(cname)
    }
    check(exp, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (> id (* _parent._parent.id 20))))))))))""".stripMargin)))

    // referencing BOTH the sub and the grandparent (raised through
    // round 11): the negated sub hoists as a carried distinct-tuple
    // list tested at the outer scope — non-equi variant: a country
    // qualifies via a team NONE of whose members out-ids the country
    val exp2 = countries.collect {
      case (cid, cname) if teams.exists { case (tid, _, tc) =>
        tc == cid && !members.exists { case (mid, mt) =>
          mt == tid && mid > cid } } => Seq(cname)
    }
    check(exp2, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (> id _parent._parent.id))))))))))""".stripMargin)))

    // equi variant through notin — the complement-set shape proper: a
    // country qualifies via a team whose member-id set misses cid + 1
    val exp3 = countries.collect {
      case (cid, cname) if teams.exists { case (tid, _, tc) =>
        tc == cid && !members.exists { case (mid, mt) =>
          mt == tid && mid == cid + 1 } } => Seq(cname)
    }
    check(exp3, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (= id (+ _parent._parent.id 1)))))))))))""".stripMargin)))

    // the NOTIN spelling takes the same hoist: t.id ∉ {m.team | m.id
    // out-ids the country} ⟺ exp2's ¬∃ member shape
    val exp4 = exp2
    check(exp4, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (notin id (from member (select team) (where
        |         (> id _parent._parent.id))))))))""".stripMargin)))

    // round 12b: NON-equi correlation to the own parent inside the
    // negated dual-scope sub (raised through the first half of round
    // 12) — the compared member column rides the tuple as an extra
    // dim, the team value rides the carried __nrow struct
    val exp5 = countries.collect {
      case (cid, cname) if teams.exists { case (tid, _, tc) =>
        tc == cid && !members.exists { case (mid, _) =>
          mid > tid && mid == cid } } => Seq(cname)
    }
    check(exp5, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (> id _parent.id)
        |              (= id _parent._parent.id))))))))))""".stripMargin)))

    // mixed: equi AND non-equi own-parent correlation (the non-equi
    // parent side an expression) plus the outer comparison — the
    // equi pair stays a group key, the non-equi rides tuple + struct
    val exp6 = countries.collect {
      case (cid, cname) if teams.exists { case (tid, _, tc) =>
        tc == cid && !members.exists { case (mid, mt) =>
          mt == tid && mid > tid * 3 && mid > cid } } => Seq(cname)
    }
    check(exp6, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (> id (* _parent.id 3))
        |              (> id _parent._parent.id))))))))))""".stripMargin)))

    // correlation deeper than the grandparent from inside the negated
    // sub is supported since round 14 — correctness covered by the
    // dedicated "negated dual-scope correlation DEEPER than the
    // grandparent" test below
  }

  test("multi-non-equi exists matches brute force on a dense dominated cluster") {
    val env = freshEnv()
    // plant many members per team whose (id, id) tuples are mostly
    // dominated — skyline must prune without changing the answer
    val extra = (1 to 40).map(i =>
      Seq(s"m$i", "Belgium", if (i % 2 == 0) "Blue" else "Red", f"9$i%03d"))
    env.view("member",
      Seq("name", "team.country.name", "team.name", "registration_code"))
      .write(extra)
    val teams = rows(env.view("team", Seq("id", "name", "country")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[String],
        r(2).asInstanceOf[Long]))
    val members = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))
    val exp = teams.collect {
      case (tid, name, ctry) if members.exists { case (mid, mt) =>
        mt == tid && mid > tid * 3 && mid <= ctry * 20 } => Seq(name)
    }
    check(exp, env.view("team", Seq("name")).read(Seq(
      """(exists (from member (select 1) (where
        |  (and (= team _parent.id) (> id (* _parent.id 3))
        |       (<= id (* _parent.country 20))))))""".stripMargin)))
  }

  test("in-subquery with filter on sub columns") { // expression_static_test.py:156-167
    val env = freshEnv()
    check(Seq(Seq("Blue")),
      env.view("team", Seq("name")).read(Seq(
        """(in id (from member (select team) (where (= name "Bob"))))""")))
  }

  test("uncorrelated exists") {
    val env = freshEnv()
    // team table non-empty -> all countries pass
    assert(rows(env.view("country", Seq("name")).read(Seq(
      "(exists (from team (select 1)))"))).size == 3)
    // impossible sub-select -> nothing passes
    check(Nil, env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where (= name "Nope"))))""")))
  }

  test("field-env aliases usable in later expressions and filters") {
    // tests/expression_test.py:88-114: a view field name becomes a
    // macro usable in subsequent expressions; real columns shadow it
    val env = freshEnv()
    val v = env.viewNamed("member", Seq(
      "created_date" -> "(cast created_at (date))",
      "code" -> "registration_code"))
    val res = v.read(Seq("(isnot created_date null)"),
      order = Seq(view.Order("code")))
    assert(rows(res).size == 3)
  }

  test("unnest rejected outside select position") {
    val env = freshEnv()
    intercept[IllegalArgumentException] {
      env.view("country", Seq("name")).read(Seq("(= 1 (unnest id))"))
    }
  }

  test("user-extensible builtins") { // expression.py extensibility
    val env = freshEnv()
    env.builtins += ("char_length" ->
      ((as: Seq[org.apache.spark.sql.Column]) =>
        org.apache.spark.sql.functions.length(as.head)))
    check(Seq(Seq("Belgium"), Seq("Holland")),
      env.view("country", Seq("name")).read(Seq("(= (char_length name) 7)")))
  }

  test("dotted join dedup: one join per distinct path prefix") {
    val env = freshEnv()
    val df = env.view("member", Seq("team.name", "team.country.name"))
      .read(Seq("""(= team.name "Blue")"""))
    // two hops (team, country) referenced by two dotted paths ->
    // exactly 2 joins (Catalyst may tighten left->inner under the
    // null-filtering predicate; count joins of any type)
    val joins = "Join ".r.findAllIn(
      df.queryExecution.optimizedPlan.toString).size
    assert(joins == 2, df.queryExecution.optimizedPlan.toString)
  }

  test("remaining correlation limits raise pinned goldens") {
    // SURVEY §8's three documented expression-language limits, pinned
    // as exact raise contracts (r12 verdict #5): each shape must fail
    // LOUDLY with its documented message, never return a wrong answer.
    val env = freshEnv()
    def msg(q: String): String =
      intercept[UnsupportedOperationException] {
        env.view("country", Seq("name")).read(Seq(q)).collect()
      }.getMessage

    // 1. the negated dual-scope hoist combined with OTHER correlation
    //    (here a non-equi conjunct) in the same exists
    val m1 = msg(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (> id _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (> id _parent._parent.id))))))))))""".stripMargin)
    assert(m1 == "A negated dual-scope subquery cannot combine with " +
      "other carried or non-equi correlation in the same exists", m1)

    // 2. a subquery nested INSIDE a negated dual-scope sub that
    //    references scopes outside the negated sub
    val m2 = msg(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (not (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (> id _parent._parent.id)
        |              (exists (from member (select 1) (where
        |                (= id _parent._parent.id)))))))))))))""".stripMargin)
    assert(m2.startsWith("a subquery nested inside a negated dual-scope " +
      "subquery cannot reference outer scopes:"), m2)

    // 3. outer comparisons at MIXED depths inside one negated sub:
    //    the landing scope's HOF cannot resolve intermediate-frame
    //    columns, so the shape stays a loud raise
    val m3 = msg(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (not (exists (from member (select 1) (where
        |                (and (= id _parent.id)
        |                     (> id _parent._parent.id)
        |                     (> id _parent._parent._parent.id))))))))))))))"""
        .stripMargin)
    assert(m3.startsWith("outer comparisons in one negated subquery must " +
      "target a single outer scope"), m3)
  }

  test("negated dual-scope correlation DEEPER than the grandparent") {
    // round 14: the formerly-raising depth-3 shape — a NOT EXISTS
    // whose outer comparison targets the great-grandparent — now
    // decorrelates by nesting the collected _nts array through a
    // second flag frame. Oracle: ids are unique, so
    // ¬∃m2(m2.id = m.id ∧ m2.id > c.id) ⟺ m.id ≤ c.id, replayed
    // driver-side over the raw rows.
    val env = freshEnv()
    val got = rows(env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (not (exists (from member (select 1) (where
        |                (and (= id _parent.id)
        |                     (> id _parent._parent._parent.id))))))))))))))"""
        .stripMargin))).map(_.head.toString).sorted
    val countries = rows(env.view("country", Seq("id", "name")).read())
      .map(r => (r(0).toString.toLong, r(1).toString))
    val teams = rows(env.view("team", Seq("id", "country")).read())
      .map(r => (r(0).toString.toLong, r(1).toString.toLong))
    val members = rows(env.view("member", Seq("id", "team")).read())
      .map(r => (r(0).toString.toLong, r(1).toString.toLong))
    val expected = countries.collect { case (cid, cname)
      if teams.exists { case (tid, tc) => tc == cid &&
        members.exists { case (mid, mt) => mt == tid && mid <= cid } } =>
      cname }.sorted
    assert(got == expected, s"got=$got expected=$expected")

    // the same deep comparison written as notin (the hoist's other
    // entry shape) agrees
    val gotNotin = rows(env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (notin id (from member (select id) (where
        |                (> id _parent._parent._parent.id))))))))))))"""
        .stripMargin))).map(_.head.toString).sorted
    assert(gotNotin == expected, s"notin got=$gotNotin expected=$expected")

    // depth 4 — TWO deferral hops: the recursion, not a special case.
    // licensee(country, member) adds the fourth scope; the negated
    // sub equi-joins its own parent (li.member) and compares to the
    // great-great-grandparent country
    env.view("licensee",
      Seq("country.name", "member.registration_code")).write(Seq(
      Seq("Belgium", "001"), Seq("Belgium", "002"), Seq("France", "003")))
    val lis = rows(env.view("licensee", Seq("member")).read())
      .map(r => r.head.toString.toLong)
    val got4 = rows(env.view("country", Seq("name")).read(Seq(
      """(exists (from team (select 1) (where
        |  (and (= country _parent.id)
        |       (exists (from member (select 1) (where
        |         (and (= team _parent.id)
        |              (exists (from licensee (select 1) (where
        |                (and (= member _parent.id)
        |                     (not (exists (from member (select 1) (where
        |                       (and (= id _parent.member)
        |                            (> id _parent._parent._parent._parent.id)
        |                       )))))))))))))))))"""
        .stripMargin))).map(_.head.toString).sorted
    val expected4 = countries.collect { case (cid, cname)
      if teams.exists { case (tid, tc) => tc == cid &&
        members.exists { case (mid, mt) => mt == tid &&
          lis.exists(lm => lm == mid && !(lm > cid)) } } =>
      cname }.sorted
    assert(got4 == expected4, s"depth4 got=$got4 expected=$expected4")
  }
}
