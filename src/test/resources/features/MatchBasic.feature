Feature: MatchBasic

  Scenario: Match all nodes and return a property
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice'})
      CREATE (:Person {name: 'Bob'})
      CREATE (:Robot {name: 'R2'})
      """
    When executing query:
      """
      MATCH (n) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
      | 'Bob'   |
      | 'R2'    |
    And no side effects

  Scenario: Match nodes by label
    Given an empty graph
    And having executed:
      """
      CREATE (:Person {name: 'Alice'})
      CREATE (:Robot {name: 'R2'})
      """
    When executing query:
      """
      MATCH (n:Person) RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name    |
      | 'Alice' |
    And no side effects

  Scenario: Match a directed relationship
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})-[:R {w: 10}]->(b:B {v: 2})
      """
    When executing query:
      """
      MATCH (a)-[r:R]->(b) RETURN a.v AS av, r.w AS w, b.v AS bv
      """
    Then the result should be, in any order:
      | av | w  | bv |
      | 1  | 10 | 2  |
    And no side effects

  Scenario: Match with WHERE on property
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N {v: 3})
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v > 1 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
      | 3 |
    And no side effects

  Scenario: Match undirected counts both directions
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {v: 1})-[:R]->(b:N {v: 2})
      """
    When executing query:
      """
      MATCH (x:N)-[:R]-(y:N) RETURN x.v AS xv, y.v AS yv
      """
    Then the result should be, in any order:
      | xv | yv |
      | 1  | 2  |
      | 2  | 1  |
    And no side effects

  Scenario: Optional match returns null for non-matches
    Given an empty graph
    And having executed:
      """
      CREATE (a:A {v: 1})
      CREATE (b:A {v: 2})-[:R]->(:B {v: 9})
      """
    When executing query:
      """
      MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(x) RETURN a.v AS av, x.v AS xv
      """
    Then the result should be, in any order:
      | av | xv   |
      | 1  | null |
      | 2  | 9    |
    And no side effects

  Scenario: Match returns no rows on an empty graph
    Given an empty graph
    And having executed:
      """
      CREATE (:Unrelated)
      """
    When executing query:
      """
      MATCH (n:Missing) RETURN n.v AS v
      """
    Then the result should be empty
    And no side effects
