Feature: VarLengthPaths

  Scenario: Variable length expansion bounded
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'}), (c:N {name: 'c'})
      CREATE (a)-[:T]->(b), (b)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:T*1..2]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
      | 'c'  |
    And no side effects

  Scenario: Zero length includes the start node
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'})
      CREATE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:T*0..1]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
      | 'b'  |
    And no side effects

  Scenario: Relationship uniqueness prevents reusing an edge
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'})
      CREATE (a)-[:T]->(b), (b)-[:T]->(a)
      """
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[:T*2..2]->(x)
      RETURN x.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'a'  |
    And no side effects

  Scenario: Named path length and node extraction
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'})
      CREATE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH p = (a:N {name: 'a'})-[:T]->(b)
      RETURN length(p) AS len, [n IN nodes(p) | n.name] AS names
      """
    Then the result should be, in any order:
      | len | names      |
      | 1   | ['a', 'b'] |
    And no side effects

  Scenario: Undirected match sees both orientations
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'})
      CREATE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (x:N)-[:T]-(y:N)
      RETURN x.name AS x, y.name AS y
      """
    Then the result should be, in any order:
      | x   | y   |
      | 'a' | 'b' |
      | 'b' | 'a' |
    And no side effects

  Scenario: Var length collects relationship properties
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'}), (c:N {name: 'c'})
      CREATE (a)-[:T {w: 1}]->(b), (b)-[:T {w: 2}]->(c)
      """
    When executing query:
      """
      MATCH (a:N {name: 'a'})-[rs:T*2..2]->(c)
      RETURN [r IN rs | r.w] AS ws
      """
    Then the result should be, in any order:
      | ws     |
      | [1, 2] |
    And no side effects

  Scenario: Exists subquery as a filter
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:N {name: 'b'})
      CREATE (a)-[:T]->(b)
      """
    When executing query:
      """
      MATCH (n:N)
      WHERE NOT (n)-[:T]->()
      RETURN n.name AS name
      """
    Then the result should be, in any order:
      | name |
      | 'b'  |
    And no side effects

  Scenario: Pattern comprehension collects per source row
    Given an empty graph
    And having executed:
      """
      CREATE (a:N {name: 'a'}), (b:M {name: 'b'}), (c:M {name: 'c'})
      CREATE (a)-[:T]->(b), (a)-[:T]->(c)
      """
    When executing query:
      """
      MATCH (a:N)
      RETURN size([(a)-[:T]->(m) | m.name]) AS n
      """
    Then the result should be, in any order:
      | n |
      | 2 |
    And no side effects
