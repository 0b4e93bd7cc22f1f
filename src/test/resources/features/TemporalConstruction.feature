Feature: TemporalConstruction

  Scenario: Construct date from components
    Given an empty graph
    When executing query:
      """
      RETURN date({year: 2021, month: 7, day: 4}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2021-07-04' |
    And no side effects

  Scenario: Construct date from week components
    Given an empty graph
    When executing query:
      """
      RETURN date({year: 2015, week: 30, dayOfWeek: 2}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2015-07-21' |
    And no side effects

  Scenario: Construct date from ordinal day
    Given an empty graph
    When executing query:
      """
      RETURN date({year: 2015, ordinalDay: 202}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2015-07-21' |
    And no side effects

  Scenario: Select date components from another temporal
    Given an empty graph
    When executing query:
      """
      RETURN date({date: date('2020-03-15'), day: 5}) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2020-03-05' |
    And no side effects

  Scenario: Parse week ordinal and compact date strings
    Given an empty graph
    When executing query:
      """
      RETURN date('2015-W30-2') AS wk, date('2015-202') AS ord,
             date('20150721') AS cmp
      """
    Then the result should be, in any order:
      | wk           | ord          | cmp          |
      | '2015-07-21' | '2015-07-21' | '2015-07-21' |
    And no side effects

  Scenario: Truncate date to decade
    Given an empty graph
    When executing query:
      """
      RETURN date.truncate('decade', date('2017-03-15')) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2010-01-01' |
    And no side effects

  Scenario: Truncate to week year
    Given an empty graph
    When executing query:
      """
      RETURN date.truncate('weekYear', date('2017-01-01')) AS d
      """
    Then the result should be, in any order:
      | d            |
      | '2016-01-04' |
    And no side effects

  Scenario: Duration between dates
    Given an empty graph
    When executing query:
      """
      WITH duration.between(localdatetime('1995-01-01T00:00:00'),
                            localdatetime('1995-03-16T12:00:00')) AS d
      RETURN d.months AS m, d.days AS dd, d.hours AS h
      """
    Then the result should be, in any order:
      | m | dd | h  |
      | 2 | 15 | 12 |
    And no side effects

  Scenario: Duration accessors keep groups separate across scaling
    Given an empty graph
    When executing query:
      """
      WITH duration({days: 1, hours: 2}) * 2 AS d
      RETURN d.days AS days, d.hours AS hours
      """
    Then the result should be, in any order:
      | days | hours |
      | 2    | 4     |
    And no side effects
