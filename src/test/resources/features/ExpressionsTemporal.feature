Feature: ExpressionsTemporal

  Scenario: Case expression forms
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS v
      RETURN v,
             CASE v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS simple,
             CASE WHEN v % 2 = 0 THEN 'even' ELSE 'odd' END AS searched
      """
    Then the result should be, in any order:
      | v | simple | searched |
      | 1 | 'one'  | 'odd'    |
      | 2 | 'two'  | 'even'   |
      | 3 | 'many' | 'odd'    |
    And no side effects

  Scenario: Coalesce returns the first non-null argument
    Given an empty graph
    When executing query:
      """
      RETURN coalesce(null, null, 3, 4) AS c, coalesce(null) AS n
      """
    Then the result should be, in any order:
      | c | n    |
      | 3 | null |
    And no side effects

  Scenario: String predicates
    Given an empty graph
    When executing query:
      """
      WITH 'hello world' AS s
      RETURN s STARTS WITH 'hello' AS sw,
             s ENDS WITH 'world' AS ew,
             s CONTAINS 'lo wo' AS ct,
             s CONTAINS 'xyz' AS nc
      """
    Then the result should be, in any order:
      | sw   | ew   | ct   | nc    |
      | true | true | true | false |
    And no side effects

  Scenario: List comprehension with filter and map
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(1, 6) WHERE x % 2 = 0 | x * 10] AS r
      """
    Then the result should be, in any order:
      | r            |
      | [20, 40, 60] |
    And no side effects

  Scenario: Reduce folds left to right
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc * 10 + x) AS r
      """
    Then the result should be, in any order:
      | r   |
      | 123 |
    And no side effects

  Scenario: Date accessors
    Given an empty graph
    When executing query:
      """
      WITH date('2021-03-15') AS d
      RETURN d.year AS y, d.month AS m, d.day AS dom
      """
    Then the result should be, in any order:
      | y    | m | dom |
      | 2021 | 3 | 15  |
    And no side effects

  Scenario: Duration groups stay separate
    Given an empty graph
    When executing query:
      """
      WITH duration({hours: 26}) AS d
      RETURN d.days AS days, d.hours AS hours
      """
    Then the result should be, in any order:
      | days | hours |
      | 0    | 26    |
    And no side effects

  Scenario: Date plus month duration clamps the day
    Given an empty graph
    When executing query:
      """
      RETURN date('2020-01-31') + duration({months: 1}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2020-02-29' |
    And no side effects

  Scenario: Temporal instants of different types are never equal
    Given an empty graph
    When executing query:
      """
      RETURN date('2020-01-01') = localdatetime('2020-01-01T00:00:00') AS eq
      """
    Then the result should be, in any order:
      | eq    |
      | false |
    And no side effects

  Scenario: Null propagates through arithmetic and comparison
    Given an empty graph
    When executing query:
      """
      RETURN 1 + null AS a, null * 2 AS b, 1 < null AS c, null = null AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | null |
    And no side effects

  Scenario: Size of strings lists and pattern-filtered lists
    Given an empty graph
    When executing query:
      """
      RETURN size('hello') AS s, size([1, 2, 3]) AS l, size([]) AS e
      """
    Then the result should be, in any order:
      | s | l | e |
      | 5 | 3 | 0 |
    And no side effects

  Scenario: Type conversion functions
    Given an empty graph
    When executing query:
      """
      RETURN toInteger('42') AS i, toFloat('2.5') AS f,
             toString(7) AS s, toBoolean('true') AS b,
             toInteger('nope') AS bad
      """
    Then the result should be, in any order:
      | i  | f   | s   | b    | bad  |
      | 42 | 2.5 | '7' | true | null |
    And no side effects
