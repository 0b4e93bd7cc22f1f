Feature: Aggregation

  Scenario: Count all rows
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS cnt
      """
    Then the result should be, in any order:
      | cnt |
      | 3   |
    And no side effects

  Scenario: Count skips nulls, sum and avg over a group
    Given an empty graph
    And having executed:
      """
      CREATE (:N {g: 'a', v: 1}), (:N {g: 'a', v: 3}), (:N {g: 'b', v: 5}), (:N {g: 'b'})
      """
    When executing query:
      """
      MATCH (n:N)
      RETURN n.g AS g, count(n.v) AS cnt, sum(n.v) AS s, avg(n.v) AS a
      ORDER BY g
      """
    Then the result should be, in order:
      | g   | cnt | s | a   |
      | 'a' | 2   | 4 | 2.0 |
      | 'b' | 1   | 5 | 5.0 |
    And no side effects

  Scenario: Collect and DISTINCT
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(DISTINCT n.v) AS d
      """
    Then the result should be, in any order:
      | d |
      | 2 |
    And no side effects

  Scenario: min and max over strings
    Given an empty graph
    And having executed:
      """
      CREATE (:N {s: 'pear'}), (:N {s: 'apple'}), (:N {s: 'fig'})
      """
    When executing query:
      """
      MATCH (n:N) RETURN min(n.s) AS lo, max(n.s) AS hi
      """
    Then the result should be, in any order:
      | lo      | hi     |
      | 'apple' | 'pear' |
    And no side effects

  Scenario: Sum of no rows is zero
    Given an empty graph
    And having executed:
      """
      CREATE (:Unrelated)
      """
    When executing query:
      """
      MATCH (n:Missing) RETURN sum(n.v) AS s, count(n) AS c
      """
    Then the result should be, in any order:
      | s | c |
      | 0 | 0 |
    And no side effects

  Scenario: Aggregation with a WITH pipeline
    Given an empty graph
    And having executed:
      """
      CREATE (:N {g: 'a', v: 1}), (:N {g: 'a', v: 2}), (:N {g: 'b', v: 7})
      """
    When executing query:
      """
      MATCH (n:N) WITH n.g AS g, sum(n.v) AS s WHERE s > 2
      RETURN g, s ORDER BY g
      """
    Then the result should be, in order:
      | g   | s |
      | 'a' | 3 |
      | 'b' | 7 |
    And no side effects

  Scenario: Nested aggregation is a syntax error
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1})
      """
    When executing query:
      """
      MATCH (n:N) RETURN sum(count(n)) AS x
      """
    Then a SyntaxError should be raised at compile time: NestedAggregation
