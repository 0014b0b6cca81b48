from datavalidation_spark.rules.core import Rule, RuleSet  # noqa: F401
