Feature: FunctionsOutline

  Scenario Outline: String functions over literals
    Given an empty graph
    When executing query:
      """
      RETURN <expr> AS x
      """
    Then the result should be, in any order:
      | x        |
      | <expect> |
    And no side effects

    Examples:
      | expr                     | expect  |
      | toUpper('abc')           | 'ABC'   |
      | toLower('ABC')           | 'abc'   |
      | reverse('abc')           | 'cba'   |
      | trim('  ab  ')           | 'ab'    |
      | substring('hello', 1, 3) | 'ell'   |
      | left('hello', 2)         | 'he'    |
      | right('hello', 2)        | 'lo'    |
      | replace('aba', 'a', 'c') | 'cbc'   |
      | size('hello')            | 5       |

  Scenario Outline: Numeric functions over literals
    Given an empty graph
    When executing query:
      """
      RETURN <expr> AS x
      """
    Then the result should be, in any order:
      | x        |
      | <expect> |
    And no side effects

    Examples:
      | expr            | expect |
      | abs(-3)         | 3      |
      | sign(-3)        | -1     |
      | toInteger('42') | 42     |
      | toFloat('2.5')  | 2.5    |
      | ceil(1.1)       | 2.0    |
      | floor(1.9)      | 1.0    |
      | round(1.5)      | 2.0    |

  Scenario Outline: Aggregates group per label over a shared fixture
    Given an empty graph
    And having executed:
      """
      CREATE (:G {k: 'x', v: 1})
      CREATE (:G {k: 'x', v: 2})
      CREATE (:G {k: 'y', v: 10})
      """
    When executing query:
      """
      MATCH (g:G) WITH g.k AS k, <agg> AS a
      WHERE k = '<key>' RETURN a
      """
    Then the result should be, in any order:
      | a        |
      | <expect> |
    And no side effects

    Examples:
      | agg        | key | expect |
      | sum(g.v)   | x   | 3      |
      | sum(g.v)   | y   | 10     |
      | count(g.v) | x   | 2      |
      | min(g.v)   | x   | 1      |
      | max(g.v)   | x   | 2      |
      | avg(g.v)   | y   | 10.0   |
