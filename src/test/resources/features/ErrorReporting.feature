Feature: ErrorReporting

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {k: 1, s: 'x', ls: [1, 2]})-[:T {w: 1}]->(b:B {k: 2})
      """

  Scenario: Using a non-existent function
    When executing query:
      """
      MATCH (n:A) RETURN foo(n.k) AS x
      """
    Then a SyntaxError should be raised at compile time: UnknownFunction

  Scenario: Using rand in aggregations
    When executing query:
      """
      MATCH (n:A) RETURN count(rand()) AS x
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression

  Scenario: Supplying invalid hexadecimal literal
    When executing query:
      """
      RETURN 0x23G34 AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidNumberLiteral

  Scenario: Failing on incorrect unicode literal
    When executing query:
      """
      RETURN '\uH' AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidUnicodeLiteral

  Scenario: Failing when float value is too large
    When executing query:
      """
      RETURN 1.34E999 AS x
      """
    Then a SyntaxError should be raised at compile time: FloatingPointOverflow

  Scenario: Fail when asterisk operator is missing
    When executing query:
      """
      MATCH (a:A)-[r 1..2]->(b) RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidRelationshipPattern

  Scenario: Fail on negative bound
    When executing query:
      """
      MATCH (a:A)-[*-2..2]->(b) RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidRelationshipPattern

  Scenario: Failing when using a variable length relationship as a single relationship
    When executing query:
      """
      MATCH (a)-[r*1..2]->(b) MATCH (c)-[r]->(d) RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: VariableAlreadyBound

  Scenario: Failing when re-using a relationship in the same pattern
    When executing query:
      """
      MATCH (a)-[r]->(b)-[r]->(c) RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: VariableAlreadyBound

  Scenario: Failing when using a list as a node
    When executing query:
      """
      WITH [1, 2] AS l MATCH (l) RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: VariableTypeConflict

  Scenario: Fail at runtime when attempting to index with an Int into a Map
    When executing query:
      """
      WITH {a: 1} AS m RETURN m[0] AS x
      """
    Then a TypeError should be raised at runtime: MapElementAccessByNonString

  Scenario: Fail at runtime when attempting to index with a String into a Collection
    When executing query:
      """
      WITH [1, 2] AS l RETURN l['a'] AS x
      """
    Then a TypeError should be raised at runtime: ListElementAccessByNonInteger

  Scenario: Fail at runtime when trying to index into a list with a list
    When executing query:
      """
      WITH [1, 2] AS l RETURN l[[0]] AS x
      """
    Then a TypeError should be raised at runtime: ListElementAccessByNonInteger

  Scenario: Fail at compile time when attempting to index with a non-integer into a list
    When executing query:
      """
      WITH [1, 2] AS l RETURN l[1.5] AS x
      """
    Then a TypeError should be raised at compile time: ListElementAccessByNonInteger

  Scenario: Fail at runtime when trying to index something which is not a map or collection
    When executing query:
      """
      WITH 100 AS i RETURN i[0] AS x
      """
    Then a TypeError should be raised at runtime: InvalidElementAccess

  Scenario: Fail when using property access on primitive type
    When executing query:
      """
      WITH 1 AS n RETURN n.prop AS x
      """
    Then a TypeError should be raised at runtime: PropertyAccessOnNonMap

  Scenario: `properties()` failing on an integer literal
    When executing query:
      """
      RETURN properties(1) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `properties()` failing on a string literal
    When executing query:
      """
      RETURN properties('Cypher') AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `properties()` failing on a list of booleans
    When executing query:
      """
      RETURN properties([true, false]) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `labels()` failing on a path
    When executing query:
      """
      MATCH p = (n:A) RETURN labels(p) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `labels()` failing on invalid arguments
    When executing query:
      """
      RETURN labels(1) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `type()` failing on invalid arguments
    When executing query:
      """
      MATCH (n:A) RETURN type(n) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: Failing when using `length()` on a node
    When executing query:
      """
      MATCH (n:A) RETURN length(n) AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentType

  Scenario: `toInteger()` failing on invalid arguments
    When executing query:
      """
      RETURN toInteger([1]) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `toInteger()` failing on an entity
    When executing query:
      """
      MATCH (n:A) RETURN toInteger(n) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `toFloat()` failing on invalid arguments
    When executing query:
      """
      RETURN toFloat([1.0]) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `toString()` failing on an entity
    When executing query:
      """
      MATCH (n:A) RETURN toString(n) AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: `percentileCont()` failing on bad arguments
    When executing query:
      """
      MATCH (n:A) RETURN percentileCont(n.k, 'nope') AS x
      """
    Then a TypeError should be raised at runtime: NumberOutOfRange

  Scenario: `percentileDisc()` failing on bad arguments
    When executing query:
      """
      MATCH (n:A) RETURN percentileDisc(n.k, 'nope') AS x
      """
    Then a TypeError should be raised at runtime: NumberOutOfRange

  Scenario: Bad arguments for `range()`
    When executing query:
      """
      RETURN range('a', 'b') AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue

  Scenario: Failing when checking existence of a non-property and non-pattern
    When executing query:
      """
      MATCH (n:A) WHERE exists(n.k + 1) RETURN n.k AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidArgumentExpression

  Scenario: SKIP with an expression that depends on variables should fail
    When executing query:
      """
      MATCH (n:A) RETURN n.k AS k SKIP n.k
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression

  Scenario: LIMIT with an expression that depends on variables should fail
    When executing query:
      """
      MATCH (n:A) RETURN n.k AS k LIMIT n.k
      """
    Then a SyntaxError should be raised at compile time: NonConstantExpression

  Scenario: ORDER BY with a negative LIMIT should fail with a syntax exception
    When executing query:
      """
      MATCH (n:A) RETURN n.k AS k ORDER BY k LIMIT -1
      """
    Then a SyntaxError should be raised at compile time: NegativeIntegerArgument

  Scenario: Standalone call to unknown procedure should fail
    When executing query:
      """
      CALL foo.bar()
      """
    Then a ProcedureError should be raised at compile time: ProcedureNotFound

  Scenario: In-query call to procedure should fail
    When executing query:
      """
      CALL db.labels() YIELD label RETURN label
      """
    Then a ProcedureError should be raised at compile time: ProcedureNotFound

  Scenario: Failing when a node is used as a relationship
    When executing query:
      """
      MATCH (n:A) MATCH ()-[n]->() RETURN 1 AS x
      """
    Then a SyntaxError should be raised at compile time: VariableTypeConflict

  Scenario: Heterogeneous non-atomic list literals are rejected
    When executing query:
      """
      RETURN [{prop: 1}, 1] AS x
      """
    Then a TypeError should be raised at compile time: InvalidArgumentValue

  Scenario: Failing when integer literal is too large
    When executing query:
      """
      RETURN 99999999999999999999999999 AS x
      """
    Then a SyntaxError should be raised at compile time: IntegerOverflow

  Scenario: Failing when hexadecimal literal is too large
    When executing query:
      """
      RETURN 0xFFFFFFFFFFFFFFFFFF AS x
      """
    Then a SyntaxError should be raised at compile time: IntegerOverflow

  Scenario: Failing on a mix of UNION and UNION ALL
    When executing query:
      """
      RETURN 1 AS x UNION RETURN 2 AS x UNION ALL RETURN 3 AS x
      """
    Then a SyntaxError should be raised at compile time: InvalidClauseComposition

  Scenario: Failing on an invalid time-of-day literal
    When executing query:
      """
      RETURN time('123') AS x
      """
    Then a TypeError should be raised at runtime: InvalidArgumentValue
