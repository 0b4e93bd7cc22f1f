Feature: OptionalMatchWith

  Scenario: Optional match preserves the driving row
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {name: 'a'})
      CREATE (b:B {name: 'b'})
      CREATE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (n)
      OPTIONAL MATCH (n)-[:T]->(m)
      RETURN n.name AS n, m.name AS m
      """
    Then the result should be, in any order:
      | n   | m    |
      | 'a' | 'b'  |
      | 'b' | null |
    And no side effects

  Scenario: Optional match with a where filter that never matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})
      """
    When executing query:
      """
      MATCH (a:A)
      OPTIONAL MATCH (b:A) WHERE b.v > 100
      RETURN a.v AS av, b.v AS bv
      """
    Then the result should be, in any order:
      | av | bv   |
      | 1  | null |
    And no side effects

  Scenario: With filters between reads
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N)
      WITH n.v AS v
      WHERE v > 1
      RETURN v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: With aggregation then filter acts as having
    Given an empty graph
    And having executed:
      """
      CREATE (:D {g: 'x'}), (:D {g: 'x'}), (:D {g: 'y'})
      """
    When executing query:
      """
      MATCH (d:D)
      WITH d.g AS g, count(*) AS n
      WHERE n > 1
      RETURN g, n
      """
    Then the result should be, in any order:
      | g   | n |
      | 'x' | 2 |
    And no side effects

  Scenario: With order by limit picks the top rows before the next read
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 3}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N)
      WITH n.v AS v ORDER BY v DESC LIMIT 2
      RETURN v
      """
    Then the result should be, in order:
      | v |
      | 3 |
      | 2 |
    And no side effects

  Scenario: Distinct with
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 1}), (:N {v: 2})
      """
    When executing query:
      """
      MATCH (n:N)
      WITH DISTINCT n.v AS v
      RETURN v ORDER BY v
      """
    Then the result should be, in order:
      | v |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Skip and limit combine after order by
    Given an empty graph
    When executing query:
      """
      UNWIND [5, 3, 1, 4, 2] AS x
      RETURN x ORDER BY x SKIP 1 LIMIT 2
      """
    Then the result should be, in order:
      | x |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Union distinct removes duplicate rows across branches
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a UNION RETURN 1 AS a UNION RETURN 2 AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |
      | 2 |
    And no side effects

  Scenario: Union all keeps duplicate rows
    Given an empty graph
    When executing query:
      """
      RETURN 1 AS a UNION ALL RETURN 1 AS a
      """
    Then the result should be, in any order:
      | a |
      | 1 |
      | 1 |
    And no side effects
