Feature: Parameters

  Scenario: Filter by an integer parameter
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      CREATE (:N {v: 2})
      CREATE (:N {v: 3})
      """
    And parameters are:
      | min | 2 |
    When executing query:
      """
      MATCH (n:N) WHERE n.v >= $min RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Return a string parameter
    Given an empty graph
    And parameters are:
      | greeting | 'hello' |
    When executing query:
      """
      RETURN $greeting AS g
      """
    Then the result should be, in any order:
      | g       |
      | 'hello' |
    And no side effects

  Scenario: Multiple parameters of mixed types
    Given an empty graph
    And parameters are:
      | count | 3       |
      | label | 'three' |
      | ok    | true    |
    When executing query:
      """
      RETURN $count + 1 AS c, $label AS l, NOT $ok AS o
      """
    Then the result should be, in any order:
      | c | l       | o     |
      | 4 | 'three' | false |
    And no side effects

  Scenario: Null parameter propagates
    Given an empty graph
    And parameters are:
      | nothing | null |
    When executing query:
      """
      RETURN $nothing AS x, $nothing IS NULL AS isnull
      """
    Then the result should be, in any order:
      | x    | isnull |
      | null | true   |
    And no side effects

  Scenario: List parameter unwinds
    Given an empty graph
    And parameters are:
      | xs | [1, 2, 3] |
    When executing query:
      """
      UNWIND $xs AS x RETURN x * 10 AS t
      """
    Then the result should be, in any order:
      | t  |
      | 10 |
      | 20 |
      | 30 |
    And no side effects

  Scenario: Float parameter in arithmetic
    Given an empty graph
    And parameters are:
      | rate | 2.5 |
    When executing query:
      """
      RETURN $rate * 4 AS r
      """
    Then the result should be, in any order:
      | r    |
      | 10.0 |
    And no side effects

  Scenario: Parameter compared against node property
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice', age: 30})
      CREATE (:Person {name: 'Bob', age: 25})
      """
    And parameters are:
      | name | 'Alice' |
    When executing query:
      """
      MATCH (p:Person) WHERE p.name = $name RETURN p.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 30  |
    And no side effects

  Scenario: Parameter inside a list literal
    Given an empty graph
    And parameters are:
      | x | 5 |
    When executing query:
      """
      RETURN [$x, $x + 1] AS pair
      """
    Then the result should be, in any order:
      | pair   |
      | [5, 6] |
    And no side effects

  Scenario: Parameter used in LIMIT-like slice bound
    Given an empty graph
    And parameters are:
      | upto | 2 |
    When executing query:
      """
      RETURN [1, 2, 3, 4][0..$upto] AS head
      """
    Then the result should be, in any order:
      | head   |
      | [1, 2] |
    And no side effects

  Scenario: Map parameter property access
    Given an empty graph
    And parameters are:
      | conf | {lo: 1, hi: 10} |
    When executing query:
      """
      RETURN $conf.lo AS lo, $conf.hi AS hi
      """
    Then the result should be, in any order:
      | lo | hi |
      | 1  | 10 |
    And no side effects

  Scenario: Parameter in a CASE expression
    Given an empty graph
    And parameters are:
      | mode | 'fast' |
    When executing query:
      """
      RETURN CASE $mode WHEN 'fast' THEN 1 ELSE 0 END AS m
      """
    Then the result should be, in any order:
      | m |
      | 1 |
    And no side effects

  Scenario: String parameter with STARTS WITH
    Given an empty graph
    And having executed:
      """
      CREATE (:W {s: 'alpha'})
      CREATE (:W {s: 'beta'})
      """
    And parameters are:
      | prefix | 'al' |
    When executing query:
      """
      MATCH (w:W) WHERE w.s STARTS WITH $prefix RETURN w.s AS s
      """
    Then the result should be, in any order:
      | s       |
      | 'alpha' |
    And no side effects

  Scenario: List parameter membership with IN
    Given an empty graph
    And having executed:
      """
      CREATE (:K {v: 1})
      CREATE (:K {v: 2})
      CREATE (:K {v: 5})
      """
    And parameters are:
      | allowed | [1, 5] |
    When executing query:
      """
      MATCH (k:K) WHERE k.v IN $allowed RETURN k.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 5 |
    And no side effects

  Scenario: Missing parameter raises a typed error
    Given an empty graph
    When executing query:
      """
      RETURN $absent AS a
      """
    Then a ParameterMissing should be raised at compile time: MissingParameter
    And no side effects

  Scenario Outline: Parameterized predicate over several bindings
    Given an empty graph
    And having executed:
      """
      CREATE (:M {k: 1})
      CREATE (:M {k: 2})
      CREATE (:M {k: 3})
      CREATE (:M {k: 4})
      """
    And parameters are:
      | limit | <limit> |
    When executing query:
      """
      MATCH (m:M) WHERE m.k <= $limit RETURN count(*) AS n
      """
    Then the result should be, in any order:
      | n   |
      | <n> |
    And no side effects

    Examples:
      | limit | n |
      | 1     | 1 |
      | 3     | 3 |
      | 9     | 4 |
