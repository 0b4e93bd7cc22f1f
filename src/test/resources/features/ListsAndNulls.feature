Feature: ListsAndNulls

  Scenario: UNWIND a literal list
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |
    And no side effects

  Scenario: List slicing and indexing
    Given an empty graph
    When executing query:
      """
      WITH [10, 20, 30, 40] AS l
      RETURN l[0] AS first, l[-1] AS last, l[1..3] AS mid
      """
    Then the result should be, in any order:
      | first | last | mid      |
      | 10    | 40   | [20, 30] |
    And no side effects

  Scenario: List comprehension with predicate and extraction
    Given an empty graph
    When executing query:
      """
      RETURN [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS l
      """
    Then the result should be, in any order:
      | l        |
      | [20, 40] |
    And no side effects

  Scenario: reduce over a list
    Given an empty graph
    When executing query:
      """
      RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS s
      """
    Then the result should be, in any order:
      | s |
      | 6 |
    And no side effects

  Scenario: null propagates through arithmetic
    Given an empty graph
    When executing query:
      """
      RETURN 1 + null AS a, null * 2 AS b, null = null AS c, null IS NULL AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | null | null | null | true |
    And no side effects

  Scenario: IN with null elements is ternary
    Given an empty graph
    When executing query:
      """
      RETURN 3 IN [1, 2, null] AS a, 1 IN [1, null] AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | true |
    And no side effects

  Scenario: size of lists and strings
    Given an empty graph
    When executing query:
      """
      RETURN size([1, 2, 3]) AS ls, size('hello') AS ss, size([]) AS es
      """
    Then the result should be, in any order:
      | ls | ss | es |
      | 3  | 5  | 0  |
    And no side effects

  Scenario: quantifiers over lists
    Given an empty graph
    When executing query:
      """
      WITH [2, 4, 6] AS l
      RETURN all(x IN l WHERE x % 2 = 0) AS a,
             any(x IN l WHERE x > 5) AS b,
             none(x IN l WHERE x > 10) AS c,
             single(x IN l WHERE x = 4) AS d
      """
    Then the result should be, in any order:
      | a    | b    | c    | d    |
      | true | true | true | true |
    And no side effects

  Scenario: CASE expression simple and searched
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x
      RETURN x,
             CASE x WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS simple,
             CASE WHEN x > 2 THEN 'big' ELSE 'small' END AS searched
      ORDER BY x
      """
    Then the result should be, in order:
      | x | simple | searched |
      | 1 | 'one'  | 'small'  |
      | 2 | 'two'  | 'small'  |
      | 3 | 'many' | 'big'    |
    And no side effects
