Feature: ComparisonOutline

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {i: 1, f: 1.5, s: 'a', b: true})
      CREATE (:N {i: 2, f: 2.5, s: 'b', b: false})
      CREATE (:N {i: 3})
      """

  Scenario Outline: Comparison operators over integer properties
    When executing query:
      """
      MATCH (n:N) WHERE n.i <op> 2 RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c        |
      | <expect> |
    And no side effects

    Examples:
      | op | expect |
      | =  | 1      |
      | <> | 2      |
      | <  | 1      |
      | <= | 2      |
      | >  | 1      |
      | >= | 2      |

  Scenario Outline: Ternary comparison against a missing property
    When executing query:
      """
      MATCH (n:N {i: 3}) RETURN n.f <op> <rhs> AS x
      """
    Then the result should be, in any order:
      | x    |
      | null |
    And no side effects

    Examples:
      | op | rhs   |
      | =  | 1.5   |
      | <> | 1.5   |
      | <  | 100.0 |
      | >= | 0.0   |

  Scenario Outline: String ordering is lexicographic
    When executing query:
      """
      RETURN <lhs> < <rhs> AS x
      """
    Then the result should be, in any order:
      | x        |
      | <expect> |
    And no side effects

    Examples:
      | lhs    | rhs    | expect |
      | 'a'    | 'b'    | true   |
      | 'b'    | 'a'    | false  |
      | 'abc'  | 'abd'  | true   |
      | 'abc'  | 'ab'   | false  |
      | ''     | 'a'    | true   |

  Scenario: Background fixture composes with the scenario's own fixture
    Given having executed:
      """
      CREATE (:N {i: 99})
      """
    When executing query:
      """
      MATCH (n:N) RETURN count(*) AS c
      """
    Then the result should be, in any order:
      | c |
      | 4 |
    And no side effects
